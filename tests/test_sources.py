"""JSONL ingest seam: read_jsonl reconciliation + end-to-end
jsonl -> parquet -> validate (reference raw-JSON entry, source.go)."""

import json
import os

import pyarrow as pa

import ray
import ray.data as rd


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_jsonl_reconciles_schema(ray_session, tmp_path):
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import read_jsonl

    p = str(tmp_path / "a.jsonl")
    _write_jsonl(p, [
        {"conv_id": "conv_00000001", "turn_idx": 0, "role": "system",
         "text": "hi", "ts": "2023-11-14T22:13:20"},
        # missing role + extra key
        {"conv_id": "conv_00000001", "turn_idx": 1, "text": "yo",
         "debug": True, "ts": "2023-11-14T22:13:21"},
    ])
    ds = read_jsonl(p, transcript_schema())
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    # block arrival order is scheduler-dependent: pin it by turn_idx
    tab = pa.concat_tables(tabs).sort_by("turn_idx")
    assert tab["turn_idx"].type == pa.int32()
    assert tab["role"].to_pylist() == ["system", None]
    assert "debug" in tab.column_names  # policy enforced by validator
    assert tab["ts"].type == pa.timestamp("us")


def test_jsonl_to_parquet_then_validate(ray_session, tmp_path):
    from rayskema.pipelines.validate import ValidateConfig, validate
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import jsonl_to_parquet

    p = str(tmp_path / "in.jsonl")
    rows = []
    for t in range(3):
        rows.append({"conv_id": "conv_00000007", "turn_idx": t,
                     "role": ["system", "user", "assistant"][t],
                     "text": f"turn {t}",
                     "ts": f"2023-11-14T22:13:2{t}"})
    rows.append({"conv_id": "conv_00000007", "turn_idx": 3, "role": "alien",
                 "text": "bad role", "ts": "2023-11-14T22:13:29"})
    _write_jsonl(p, rows)
    out = str(tmp_path / "parquet")
    jsonl_to_parquet(p, transcript_schema(), out)
    res = validate(out, transcript_schema(),
                   config=ValidateConfig(buckets=4, with_profile=False))
    codes = dict(zip(res.violations["code"].to_pylist(),
                     res.violations["rule"].to_pylist()))
    assert codes.get("invalid_enum") == "role_enum"


def test_read_csv_reconciles_schema(ray_session, tmp_path):
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import read_csv

    p = str(tmp_path / "a.csv")
    with open(p, "w") as f:
        f.write("conv_id,turn_idx,role,text,extra\n")
        f.write("conv_00000001,0,system,hi,junk\n")
        f.write("conv_00000001,1,user,hello there,junk2\n")
    schema = transcript_schema()
    tabs = ray.get(read_csv(p, schema).to_arrow_refs())
    tab = pa.concat_tables([t for t in tabs if t.num_rows])
    declared = [c.name for c in schema.columns]
    # declared columns lead in order; missing ones are null; extras kept
    assert tab.column_names[:len(declared)] == declared
    assert "extra" in tab.column_names
    assert tab["conv_id"].to_pylist() == ["conv_00000001"] * 2
    assert tab["turn_idx"].to_pylist() == [0, 1]
    ts_field = [c for c in schema.columns if c.name == "ts"][0]
    assert tab["ts"].null_count == 2
    assert tab["ts"].type == ts_field.dtype


def test_csv_to_parquet_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import csv_to_parquet

    p = str(tmp_path / "b.csv")
    with open(p, "w") as f:
        f.write("conv_id,turn_idx,role,text\n")
        for i in range(50):
            f.write(f"conv_{i % 5:08d},{i // 5},user,row {i}\n")
    out = str(tmp_path / "pq")
    csv_to_parquet(p, transcript_schema(), out)
    got = pq.read_table(out)
    assert got.num_rows == 50
    assert set(c.name for c in transcript_schema().columns) <= \
        set(got.column_names)


def test_conv_ids_no_truncation_past_1e8():
    from rayskema.testgen import _conv_ids
    a = list(_conv_ids(2, 99999999))
    assert a == ["conv_099999999", "conv_100000000"]
    # sub-1e8 output unchanged (cached fixtures stay byte-identical)
    assert list(_conv_ids(2, 0)) == ["conv_00000000", "conv_00000001"]
    pre = list(_conv_ids(2, 99999998))
    post = list(_conv_ids(2, 100000000))
    assert len(set(pre + post)) == 4


def test_ipc_round_trip(ray_session, tmp_path):
    """write_ipc -> read_ipc round-trips both IPC flavors; column
    projection prunes; retried-style rewrite is idempotent."""
    from rayskema.sources.ipc import read_ipc, write_ipc

    tab = pa.table({
        "k": pa.array(range(100), type=pa.int64()),
        "s": pa.array([f"v{i}" for i in range(100)]),
        "x": pa.array([i * 0.5 for i in range(100)], type=pa.float64())})
    for fmt in ("file", "stream"):
        out = str(tmp_path / fmt)
        ds = rd.from_arrow(tab).repartition(4)
        n_files = write_ipc(ds, out, file_format=fmt)
        assert n_files >= 1
        back = read_ipc(out, file_format=fmt)
        got = pa.concat_tables(
            [pa.table(b) for b in
             back.iter_batches(batch_format="pyarrow")]) \
            .sort_by("k")
        assert got.equals(tab)
        # idempotent rewrite: same content -> same file set
        write_ipc(rd.from_arrow(tab).repartition(4), out,
                  file_format=fmt)
        import os
        assert len([f for f in os.listdir(out)
                    if f.endswith(".arrow")]) == n_files
        pruned = read_ipc(out, columns=["k"], file_format=fmt)
        assert pruned.schema().names == ["k"]


def test_write_parquet_partitioned_resumable(ray_session, tmp_path):
    """Hive layout, atomic per-partition commit, resume skips
    committed partitions (zero bytes moved for them), nulls land in
    __NULL__."""
    import os

    import pyarrow.parquet as pq

    from rayskema.sources.parquet_sink import (finished_partitions,
                                               write_parquet_partitioned)

    out = str(tmp_path / "parts")
    tab = pa.table({
        "src": pa.array(["a", "b", "a", None, "c", "b"]),
        "v": pa.array(range(6), type=pa.int64())})
    ds = rd.from_arrow(tab).repartition(3)
    res = {r["value"]: r["rows"] for r in write_parquet_partitioned(
        ds, out, "src", buckets=2).take_all()}
    assert res == {"a": 2, "b": 2, "c": 1, "__NULL__": 1}
    assert finished_partitions(out, "src") == {"a", "b", "c", "__NULL__"}
    back = pq.read_table(os.path.join(out, "src=a", "part.parquet"))
    assert sorted(back["v"].to_pylist()) == [0, 2]

    # simulate a failed partition: remove its marker, rerun
    os.remove(os.path.join(out, "src=b", "_SUCCESS"))
    mtime_a = os.path.getmtime(os.path.join(out, "src=a", "part.parquet"))
    res2 = {r["value"]: r["rows"] for r in write_parquet_partitioned(
        rd.from_arrow(tab).repartition(3), out, "src",
        buckets=2).take_all()}
    assert res2 == {"b": 2}                       # only the failed one
    assert os.path.getmtime(
        os.path.join(out, "src=a", "part.parquet")) == mtime_a


def test_ipc_duplicate_blocks_preserved(ray_session, tmp_path):
    """Byte-identical but DISTINCT blocks must both survive a
    write_ipc -> read_ipc round trip: names carry a block ordinal, so
    identical content cannot collapse two blocks into one file."""
    from rayskema.sources.ipc import read_ipc, write_ipc

    tab = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    # two blocks with IDENTICAL bytes (same rows, split evenly)
    ds = rd.from_arrow(pa.concat_tables([tab, tab])).repartition(2)
    out = str(tmp_path / "dups")
    n_files = write_ipc(ds, out)
    assert n_files == 2
    back = pa.concat_tables(
        [pa.table(b) for b in read_ipc(out)
         .iter_batches(batch_format="pyarrow")])
    assert back.num_rows == 4
    assert sorted(back["k"].to_pylist()) == [1, 1, 2, 2]


def test_partitioned_sink_null_sentinel_collision(ray_session, tmp_path):
    """A literal "__NULL__" string value and actual nulls render to
    the same partition directory; both row sets must survive (the
    exchange groups on the RENDERED key so one task owns the dir)."""
    import os

    import pyarrow.parquet as pq

    from rayskema.sources.parquet_sink import write_parquet_partitioned

    out = str(tmp_path / "collide")
    tab = pa.table({
        "src": pa.array(["__NULL__", None, "__NULL__", None, "a"]),
        "v": pa.array(range(5), type=pa.int64())})
    res = {r["value"]: r["rows"] for r in write_parquet_partitioned(
        rd.from_arrow(tab).repartition(3), out, "src",
        buckets=4).take_all()}
    assert res == {"__NULL__": 4, "a": 1}
    back = pq.read_table(os.path.join(out, "src=__NULL__",
                                      "part.parquet"))
    assert sorted(back["v"].to_pylist()) == [0, 1, 2, 3]


def test_source_driver_spi(ray_session, tmp_path):
    # reference SetJSONDriver / UseDefaultJSONDriver (source.go:73-88):
    # a registered driver replaces the raw reader the ingest seam uses;
    # restoring the default brings back ray.data.read_json
    from rayskema.schema import transcript_schema
    from rayskema.sources import spi
    from rayskema.sources.jsonl import read_jsonl

    p = str(tmp_path / "a.jsonl")
    _write_jsonl(p, [
        {"conv_id": "conv_00000001", "turn_idx": 0, "role": "user",
         "text": "hi", "ts": "2023-11-14T22:13:20"},
    ])
    calls = []

    def stamped(paths, **kw):
        calls.append(paths)
        ds = rd.read_json(paths, **kw)
        return ds.map_batches(
            lambda t: t.append_column(
                "via_custom", pa.array([True] * t.num_rows)),
            batch_format="pyarrow")

    assert spi.source_driver_names()["json"] == "ray.data"
    spi.register_source_driver("json", stamped, name="stamped")
    try:
        assert spi.source_driver_names()["json"] == "stamped"
        tab = pa.concat_tables(
            [t for t in ray.get(
                read_jsonl(p, transcript_schema()).to_arrow_refs())
             if t.num_rows])
        assert calls == [p]
        assert tab["via_custom"].to_pylist() == [True]
    finally:
        spi.use_default_source_driver("json")
    assert spi.source_driver_names()["json"] == "ray.data"
    tab = pa.concat_tables(
        [t for t in ray.get(
            read_jsonl(p, transcript_schema()).to_arrow_refs())
         if t.num_rows])
    assert "via_custom" not in tab.column_names
    # nil-guard parity: a None reader is ignored
    spi.register_source_driver("json", None)
    assert spi.source_driver_names()["json"] == "ray.data"
    # custom-only format registers and fully unregisters
    spi.register_source_driver("tsv", lambda paths: rd.read_csv(paths))
    assert "tsv" in spi.source_driver_names()
    spi.use_default_source_driver("tsv")
    assert "tsv" not in spi.source_driver_names()


def test_read_hive_partitions_pruned(ray_session, tmp_path):
    import ray.data as rd
    from rayskema.sources.parquet_sink import (read_hive_partitions,
                                               write_parquet_partitioned)
    tab = pa.table({
        "src": pa.array(["a", "a", "b", "c", None]),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    out = str(tmp_path / "hive")
    write_parquet_partitioned(rd.from_arrow(tab), out, "src",
                              buckets=2).materialize()
    # pruned read: only src=a listed/read
    got = read_hive_partitions(out, "src", values=["a"]) \
        .to_pandas().sort_values("v")
    assert got["v"].tolist() == [1, 2]
    assert set(got["src"]) == {"a"}
    # full read round-trips all rows incl. the NULL partition
    full = read_hive_partitions(out, "src").to_pandas()
    assert sorted(full["v"].tolist()) == [1, 2, 3, 4, 5]
    assert full["src"].isna().sum() == 1
    # a partition without _SUCCESS refuses to read
    import pytest
    os.remove(os.path.join(out, "src=b", "_SUCCESS"))
    with pytest.raises(RuntimeError):
        read_hive_partitions(out, "src")
    # ...but pruning past it is fine
    ok = read_hive_partitions(out, "src", values=["c"]).to_pandas()
    assert ok["v"].tolist() == [4]


def test_read_hive_partitions_null_value(ray_session, tmp_path):
    import ray.data as rd
    from rayskema.sources.parquet_sink import (read_hive_partitions,
                                               write_parquet_partitioned)
    tab = pa.table({"src": pa.array(["a", None]),
                    "v": pa.array([1, 2], pa.int64())})
    out = str(tmp_path / "hive2")
    write_parquet_partitioned(rd.from_arrow(tab), out, "src",
                              buckets=1).materialize()
    got = read_hive_partitions(out, "src", values=[None]).to_pandas()
    assert got["v"].tolist() == [2]
    assert got["src"].isna().all()


def test_orc_round_trip(ray_session, tmp_path):
    """write_orc -> read_orc round-trips values; column projection
    prunes at decode; retried-style rewrite is idempotent; ORC's
    ns-only timestamp comes back as timestamp[ns]."""
    import os

    from rayskema.sources.orc import read_orc, write_orc

    tab = pa.table({
        "k": pa.array(range(100), type=pa.int64()),
        "s": pa.array([f"v{i}" for i in range(100)]),
        "ts": pa.array([1_000_000 * i for i in range(100)],
                       type=pa.timestamp("us")),
        "x": pa.array([i * 0.5 for i in range(100)], type=pa.float64())})
    out = str(tmp_path / "orc")
    n_files = write_orc(rd.from_arrow(tab).repartition(4), out)
    assert n_files >= 1
    back = pa.concat_tables(
        [pa.table(b) for b in
         read_orc(out).iter_batches(batch_format="pyarrow")]) \
        .sort_by("k")
    assert back.schema.field("ts").type == pa.timestamp("ns")
    assert back.set_column(
        back.schema.get_field_index("ts"), "ts",
        back["ts"].cast(pa.timestamp("us"))).equals(tab)
    # idempotent rewrite: same content -> same file set
    write_orc(rd.from_arrow(tab).repartition(4), out)
    assert len([f for f in os.listdir(out)
                if f.endswith(".orc")]) == n_files
    pruned = read_orc(out, columns=["k"])
    assert pruned.schema().names == ["k"]
    assert pruned.count() == 100


def test_orc_duplicate_blocks_preserved(ray_session, tmp_path):
    """Byte-identical but DISTINCT blocks both survive the round trip
    (ordinal+hash naming, as write_ipc)."""
    from rayskema.sources.orc import read_orc, write_orc

    tab = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    ds = rd.from_arrow(pa.concat_tables([tab, tab])).repartition(2)
    out = str(tmp_path / "dups_orc")
    assert write_orc(ds, out) == 2
    back = pa.concat_tables(
        [pa.table(b) for b in read_orc(out)
         .iter_batches(batch_format="pyarrow")])
    assert sorted(back["k"].to_pylist()) == [1, 1, 2, 2]


def test_orc_source_driver_registered(ray_session, tmp_path):
    """'orc' and 'ipc' resolve through the SPI defaults."""
    from rayskema.sources.orc import write_orc
    from rayskema.sources.spi import (get_source_driver,
                                      source_driver_names)

    names = source_driver_names()
    assert names["orc"] == "rayskema" and names["ipc"] == "rayskema"
    tab = pa.table({"k": pa.array([3, 1, 2], type=pa.int64())})
    out = str(tmp_path / "spi_orc")
    write_orc(rd.from_arrow(tab), out)
    got = pa.concat_tables(
        [pa.table(b) for b in get_source_driver("orc")(out)
         .iter_batches(batch_format="pyarrow")])
    assert sorted(got["k"].to_pylist()) == [1, 2, 3]


def test_orc_stripe_split_read(ray_session, tmp_path):
    """split_stripes parallelizes WITHIN one big ORC file: footer-only
    planning, per-range decode, same rows + projection as the
    whole-file path."""
    import pyarrow.orc as porc

    from rayskema.sources.orc import read_orc

    tab = pa.table({
        "k": pa.array(range(50_000), type=pa.int64()),
        "s": pa.array([f"v{i % 97}" for i in range(50_000)])})
    p = str(tmp_path / "big.orc")
    porc.write_table(tab, p, stripe_size=64 * 1024)
    n_stripes = porc.ORCFile(p).nstripes
    assert n_stripes > 4          # the fixture really is multi-stripe

    ds = read_orc(p, split_stripes=2)
    got = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("k")
    assert got.equals(tab)

    pruned = read_orc(str(tmp_path), columns=["k"], split_stripes=3)
    assert pruned.schema().names == ["k"]
    assert pruned.count() == 50_000


def test_orc_projection_order_and_sidecar_files(ray_session, tmp_path):
    """ORC decodes projections in FILE order — the reader must return
    the REQUESTED order; sidecar files (_SUCCESS) in the directory are
    ignored by both read modes."""
    import pyarrow.orc as porc

    from rayskema.sources.orc import read_orc

    tab = pa.table({
        "a": pa.array(range(10), pa.int64()),
        "m": pa.array([f"x{i}" for i in range(10)]),
        "z": pa.array(range(10, 20), pa.int64())})
    d = str(tmp_path / "orcdir")
    import os
    os.makedirs(d)
    porc.write_table(tab, os.path.join(d, "part0.orc"))
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")
    got = pa.concat_tables(
        [pa.table(b) for b in read_orc(d, columns=["z", "a"])
         .iter_batches(batch_format="pyarrow")])
    assert got.column_names == ["z", "a"]
    got2 = pa.concat_tables(
        [pa.table(b) for b in
         read_orc(d, columns=["z", "a"], split_stripes=1)
         .iter_batches(batch_format="pyarrow")])
    assert got2.column_names == ["z", "a"]
    assert got2["z"].to_pylist() == list(range(10, 20))


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    from rayskema.schema import Column, TableSchema
    from rayskema.sources.jsonl import read_jsonl, write_jsonl

    tab = pa.table({
        "k": pa.array([3, 1, 2, 2, None], pa.int64()),
        "s": pa.array(["a", None, 'he "quoted"\n', "d", "e"]),
        "x": pa.array([1.5, 2.25, None, -0.5, 0.0], pa.float64()),
    })
    d = str(tmp_path / "jl")
    n = write_jsonl(rd.from_arrow(tab).repartition(3), d)
    assert n >= 1 and all(f.endswith(".jsonl") for f in os.listdir(d))
    sch = TableSchema(columns=(Column("k", pa.int64()),
                               Column("s", pa.string()),
                               Column("x", pa.float64())),
                      name="t")
    back = pa.concat_tables(
        [t for t in ray.get(read_jsonl(d, sch)
                            .to_arrow_refs()) if t.num_rows])
    back = back.select(["k", "s", "x"])
    want = tab.to_pylist()
    got = back.to_pylist()
    key = lambda r: (r["k"] is None, r["k"], r["s"] is None, r["s"])
    assert sorted(got, key=key) == sorted(want, key=key)


def test_write_jsonl_duplicate_blocks_not_collapsed(ray_session,
                                                    tmp_path):
    # byte-identical but distinct blocks must keep distinct files
    tab = pa.table({"k": pa.array([7, 7, 7, 7], pa.int64())})
    d = str(tmp_path / "dup")
    from rayskema.schema import Column, TableSchema
    from rayskema.sources.jsonl import read_jsonl, write_jsonl
    write_jsonl(rd.from_arrow(tab).repartition(4), d)
    sch = TableSchema(columns=(Column("k", pa.int64()),), name="t")
    back = pa.concat_tables(
        [t for t in ray.get(read_jsonl(d, sch)
                            .to_arrow_refs()) if t.num_rows])
    assert back.num_rows == 4


def test_write_jsonl_rejects_binary(ray_session, tmp_path):
    from rayskema.sources.jsonl import write_jsonl
    tab = pa.table({"b": pa.array([b"\x00\x01"], pa.binary())})
    import pytest as _pt
    with _pt.raises(Exception):      # TypeError surfaces via Ray task
        write_jsonl(rd.from_arrow(tab), str(tmp_path / "bin"))


def test_write_csv_roundtrip(ray_session, tmp_path):
    from rayskema.schema import Column, TableSchema
    from rayskema.sources.jsonl import read_csv, write_csv

    tab = pa.table({
        "k": pa.array([3, 1, 2, None], pa.int64()),
        "s": pa.array(['comma, "quote"', "b\nc", None, "d"]),
    })
    d = str(tmp_path / "csv")
    n = write_csv(rd.from_arrow(tab).repartition(2), d)
    assert n >= 1 and all(f.endswith(".csv") for f in os.listdir(d))
    sch = TableSchema(columns=(Column("k", pa.int64()),
                               Column("s", pa.string()),), name="t")
    back = pa.concat_tables(
        [t for t in ray.get(read_csv(d, sch)
                            .to_arrow_refs()) if t.num_rows])
    back = back.select(["k", "s"])
    key = lambda r: (r["k"] is None, r["k"], r["s"] is None, r["s"])
    # CSV has no null literal: a null string round-trips as ""
    # (documented write_csv contract); numeric nulls survive
    want = [{**r, "s": "" if r["s"] is None else r["s"]}
            for r in tab.to_pylist()]
    assert sorted(back.to_pylist(), key=key) == sorted(want, key=key)
