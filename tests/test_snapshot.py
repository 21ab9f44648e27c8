"""Snapshot table layout (sources/snapshot.py): manifest stats
pruning, atomic HEAD, append chains, time travel."""

import pyarrow as pa
import pytest

import ray
import ray.data as rd

from rayskema.sources.snapshot import (read_snapshot, snapshot_history,
                                       write_snapshot)


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)


def _table(lo, hi):
    n = hi - lo
    return pa.table({
        "k": pa.array(range(lo, hi), pa.int64()),
        "ts": pa.array([1_000_000 * i for i in range(lo, hi)],
                       type=pa.timestamp("us")),
        "s": pa.array([f"v{i}" for i in range(lo, hi)])})


def test_snapshot_roundtrip_and_prune(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    # 4 blocks of 25 rows each -> 4 files with disjoint k ranges
    ds = rd.from_arrow(_table(0, 100)).repartition(4)
    m = write_snapshot(ds, root, stats_cols=("k", "ts"))
    assert m["id"] == 1 and m["rows"] == 100 and len(m["files"]) == 4

    back = _collect(read_snapshot(root)).sort_by("k")
    assert back["k"].to_pylist() == list(range(100))

    # manifest prune: k >= 80 can only live in one file
    pruned = read_snapshot(root, filter=[("k", ">=", 80)])
    assert len(pruned.input_files()) == 1
    got = _collect(pruned)
    assert sorted(got["k"].to_pylist()) == list(range(80, 100))

    # timestamp predicate prunes through the µs-tagged stats
    import datetime
    t_pruned = read_snapshot(root, filter=[
        ("ts", "<", datetime.datetime(1970, 1, 1, 0, 0, 25))])
    assert len(t_pruned.input_files()) == 1
    assert _collect(t_pruned).num_rows == 25

    # conjunction that PROVES emptiness -> zero files, schema kept
    none = read_snapshot(root, filter=[("k", ">", 99)])
    assert none.count() == 0
    assert none.schema().names == ["k", "ts", "s"]


def test_snapshot_append_and_time_travel(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(_table(0, 50)).repartition(2), root,
                   stats_cols=("k",))
    m2 = write_snapshot(rd.from_arrow(_table(50, 100)).repartition(2),
                        root, stats_cols=("k",), mode="append")
    assert m2["id"] == 2 and m2["rows"] == 100

    assert _collect(read_snapshot(root)).num_rows == 100
    # time travel: snapshot 1 still reads its original 50 rows
    assert _collect(read_snapshot(root, snapshot=1)).num_rows == 50

    hist = snapshot_history(root)
    assert [(h["id"], h["rows"]) for h in hist] == [(1, 50), (2, 100)]
    assert hist[1]["parent"] == 1

    # overwrite starts fresh but leaves history readable
    write_snapshot(rd.from_arrow(_table(0, 10)), root,
                   stats_cols=("k",), mode="overwrite")
    assert _collect(read_snapshot(root)).num_rows == 10
    assert _collect(read_snapshot(root, snapshot=2)).num_rows == 100


def test_snapshot_allnull_stats_prune(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    tab = pa.table({"k": pa.array([None, None], pa.int64()),
                    "v": pa.array([1, 2], pa.int64())})
    write_snapshot(rd.from_arrow(tab), root, stats_cols=("k",))
    # every k is null: k == 1 can match no row, file prunes
    assert read_snapshot(root, filter=[("k", "==", 1)]).count() == 0
    # a column without stats never prunes
    assert read_snapshot(root, filter=[("v", "==", 1)]).count() == 1


def test_snapshot_column_projection(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(_table(0, 10)), root,
                   stats_cols=("k",))
    ds = read_snapshot(root, columns=["k"])
    assert ds.schema().names == ["k"]


def test_snapshot_bad_args(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_snapshot(root)
    write_snapshot(rd.from_arrow(_table(0, 5)), root)
    with pytest.raises(ValueError):
        read_snapshot(root, filter=[("k", "!=", 3)])
    with pytest.raises(ValueError):
        write_snapshot(rd.from_arrow(_table(0, 5)), root, mode="merge")


def test_snapshot_compaction(ray_session, tmp_path):
    root = str(tmp_path / "tbl")
    # three appends of 4 files each -> 12 fragments
    for lo in (0, 40, 80):
        write_snapshot(
            rd.from_arrow(_table(lo, lo + 40)).repartition(4),
            root, stats_cols=("k",),
            mode="overwrite" if lo == 0 else "append")
    from rayskema.sources.snapshot import compact_snapshot
    m = compact_snapshot(root, target_rows=60, order_by="k")
    assert m["rows"] == 120 and len(m["files"]) == 2
    back = _collect(read_snapshot(root)).sort_by("k")
    assert back["k"].to_pylist() == list(range(120))
    # re-clustered on k: a point lookup opens ONE file
    assert len(read_snapshot(
        root, filter=[("k", "==", 5)]).input_files()) == 1
    # the fragmented snapshot is still time-travelable
    assert _collect(read_snapshot(root, snapshot=3)).num_rows == 120
    assert snapshot_history(root)[-1]["id"] == 4


def test_snapshot_validated_commit(ray_session, tmp_path):
    """contract= turns the write into a commit gate: clean data
    flips HEAD and stamps the schema_hash; violating data removes its
    files and leaves HEAD (and history) untouched."""
    from rayskema.schema import Column, Range, TableSchema

    schema = TableSchema(columns=(
        Column("k", pa.int64(), nullable=False,
               constraints=(Range(min=0),)),
        Column("s", pa.string()),))
    root = str(tmp_path / "tbl")
    clean = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "s": pa.array(["a", "b", "c"])})
    m = write_snapshot(rd.from_arrow(clean), root,
                       stats_cols=("k",), contract=schema)
    assert m["schema_hash"] == schema.schema_hash()

    bad = pa.table({"k": pa.array([4, -1, None], pa.int64()),
                    "s": pa.array(["d", "e", "f"])})
    import os
    files_before = sorted(os.listdir(os.path.join(root, "data")))
    with pytest.raises(ValueError, match="snapshot rejected"):
        write_snapshot(rd.from_arrow(bad), root, stats_cols=("k",),
                       mode="append", contract=schema)
    # HEAD still 1, rejected files cleaned up, table reads clean data
    assert sorted(os.listdir(os.path.join(root, "data"))) == files_before
    assert snapshot_history(root)[-1]["id"] == 1
    assert _collect(read_snapshot(root)).num_rows == 3


def test_snapshot_changes(ray_session, tmp_path):
    from rayskema.sources.snapshot import (compact_snapshot,
                                           snapshot_changes)
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(_table(0, 50)).repartition(2), root,
                   stats_cols=("k",))
    write_snapshot(rd.from_arrow(_table(50, 80)).repartition(2), root,
                   stats_cols=("k",), mode="append")
    # append-only fast path never OPENS the shared files: prove it by
    # making snap-1's data unreadable before running the CDC
    import os
    m1 = {f["path"] for f in __import__("json").load(
        open(os.path.join(root, "manifests", "snap-000001.json")))
        ["files"]}
    for p in m1:
        os.rename(os.path.join(root, p), os.path.join(root, p) + ".cold")
    ch = snapshot_changes(root, from_snapshot=1, key_cols=("k",),
                          compare_cols=("s",))
    got = _collect(ch)
    for p in m1:
        os.rename(os.path.join(root, p) + ".cold", os.path.join(root, p))
    assert set(got["change"].to_pylist()) == {"added"}
    assert sorted(got["k"].to_pylist()) == list(range(50, 80))

    # compaction rewrites every file but changes no rows: empty CDC
    compact_snapshot(root, target_rows=100)
    ch2 = _collect(snapshot_changes(root, from_snapshot=2,
                                    key_cols=("k",),
                                    compare_cols=("s",)))
    assert ch2.num_rows == 0

    # an overwrite with edits: detect added/removed/changed
    t = _table(0, 80)
    import pyarrow.compute as pc
    s2 = pc.if_else(pc.equal(t["k"], 7), "EDITED", t["s"])
    edited = pa.table({"k": t["k"], "ts": t["ts"], "s": s2}) \
        .filter(pc.not_equal(t["k"], 3))           # drop one row
    extra = pa.table({"k": pa.array([999], pa.int64()),
                      "ts": pa.array([0], pa.timestamp("us")),
                      "s": pa.array(["new"])})
    write_snapshot(rd.from_arrow(pa.concat_tables([edited, extra])),
                   root, stats_cols=("k",), mode="overwrite")
    ch3 = _collect(snapshot_changes(root, from_snapshot=3,
                                    key_cols=("k",),
                                    compare_cols=("s",)))
    by = {r["k"]: r["change"] for r in ch3.to_pylist()}
    assert by == {3: "removed", 7: "changed", 999: "added"}


def test_snapshot_changes_identical(ray_session, tmp_path):
    from rayskema.sources.snapshot import snapshot_changes
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(_table(0, 10)), root)
    ch = snapshot_changes(root, from_snapshot=1, to_snapshot=1,
                          key_cols=("k",), compare_cols=("s",))
    assert ch.count() == 0
    assert ch.schema().names == ["k", "change"]


def test_cli_snapshot(ray_session, tmp_path, capsys):
    import json
    import os

    import pyarrow.parquet as pq

    from rayskema.__main__ import main

    src = str(tmp_path / "src.parquet")
    pq.write_table(_table(0, 30), src)
    src2 = str(tmp_path / "src2.parquet")
    pq.write_table(_table(30, 60), src2)
    root = str(tmp_path / "tbl")
    assert main(["snapshot", "--root", root, "--action", "write",
                 "--input", src, "--stats-cols", "k"]) == 0
    assert main(["snapshot", "--root", root, "--action", "write",
                 "--input", src2, "--mode", "append"]) == 0
    assert main(["snapshot", "--root", root, "--action",
                 "compact", "--target-rows", "100"]) == 0
    assert main(["snapshot", "--root", root, "--action",
                 "history"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    # last 3 history lines: ids 1..3, compacted rows = 60
    assert [h["id"] for h in lines[-3:]] == [1, 2, 3]
    assert lines[-1]["rows"] == 60
    out = str(tmp_path / "changes")
    assert main(["snapshot", "--root", root, "--action", "changes",
                 "--since", "1", "--keys", "k", "--compare", "s",
                 "--out", out]) == 0
    ch = pq.read_table(out)
    # snap1 (k 0..29) -> HEAD(3, compacted 0..59): 30 added keys
    assert set(ch["change"].to_pylist()) == {"added"}
    assert sorted(ch["k"].to_pylist()) == list(range(30, 60))
    # upsert via CLI: replace k=5, insert k=99
    up = str(tmp_path / "up.parquet")
    pq.write_table(pa.table({
        "k": pa.array([5, 99], pa.int64()),
        "ts": pa.array([0, 0], type=pa.timestamp("us")),
        "s": pa.array(["UP5", "UP99"])}), up)
    assert main(["snapshot", "--root", root, "--action", "upsert",
                 "--input", up, "--keys", "k"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["id"] == 4 and m["rows"] == 61
    back = _collect(read_snapshot(root)).sort_by("k")
    got = dict(zip(back["k"].to_pylist(), back["s"].to_pylist()))
    assert got[5] == "UP5" and got[99] == "UP99" and got[6] == "v6"


def test_snapshot_reject_never_deletes_committed_files(ray_session,
                                                       tmp_path):
    """Writing IDENTICAL data twice must not collide file names: a
    rejected second attempt cleans up ONLY its own files (the commit
    token), never the committed snapshot's."""
    from rayskema.schema import Column, Range, TableSchema

    tab = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(tab), root, stats_cols=("k",))
    strict = TableSchema(columns=(
        Column("k", pa.int64(), nullable=False,
               constraints=(Range(max=1),)),))
    with pytest.raises(ValueError, match="snapshot rejected"):
        write_snapshot(rd.from_arrow(tab), root, mode="append",
                       contract=strict)
    # snapshot 1 still fully readable (its files were not deleted)
    assert _collect(read_snapshot(root))["k"].to_pylist() == [1, 2, 3]


def test_snapshot_history_ignores_tmp_manifests(ray_session, tmp_path):
    import os
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(_table(0, 5)), root)
    junk = os.path.join(root, "manifests", "snap-000002.json.tmp-abc")
    with open(junk, "w") as f:
        f.write("{ partial")
    assert [h["id"] for h in snapshot_history(root)] == [1]


def test_snapshot_date_stats_prune(ray_session, tmp_path):
    import datetime
    root = str(tmp_path / "tbl")
    tab = pa.table({
        "d": pa.array([datetime.date(2024, 1, i + 1)
                       for i in range(20)], pa.date32()),
        "v": pa.array(range(20), pa.int64()),
        # unsupported stats type: must be skipped, not crash the
        # manifest JSON
        "b": pa.array([b"x"] * 20, pa.binary())})
    m = write_snapshot(rd.from_arrow(tab).repartition(2), root,
                       stats_cols=("d", "b"))
    assert all("b" not in f["stats"] for f in m["files"])
    pruned = read_snapshot(root, filter=[
        ("d", ">=", datetime.date(2024, 1, 15))])
    assert len(pruned.input_files()) == 1
    assert _collect(pruned).num_rows == 6


def test_snapshot_upsert_prunes_and_merges(ray_session, tmp_path):
    from rayskema.sources.snapshot import upsert_snapshot
    root = str(tmp_path / "up")
    # 4 files with disjoint k ranges (0-24, 25-49, 50-74, 75-99)
    base = rd.from_arrow(_table(0, 100)).repartition(4)
    write_snapshot(base, root, stats_cols=("k",))

    # updates touch k in {10, 110}: one replace, one insert — both
    # land in the FIRST file's range or beyond all ranges
    upd = rd.from_arrow(pa.table({
        "k": pa.array([10, 110], pa.int64()),
        "ts": pa.array([0, 0], type=pa.timestamp("us")),
        "s": pa.array(["NEW10", "NEW110"])}))
    m = upsert_snapshot(upd, root, "k")
    assert m["id"] == 2 and m["mode"] == "upsert"
    # k=110 is beyond every range but k=10 hits file 1: exactly one
    # of the four base files rewrites, three carry by reference
    assert m["files_rewritten"] == 1 and m["files_carried"] == 3
    assert m["rows"] == 101

    back = _collect(read_snapshot(root)).sort_by("k")
    got = dict(zip(back["k"].to_pylist(), back["s"].to_pylist()))
    assert got[10] == "NEW10" and got[110] == "NEW110"
    assert got[9] == "v9" and len(got) == 101

    # time travel: the parent snapshot still reads the old row
    old = _collect(read_snapshot(root, snapshot=1)).sort_by("k")
    old_map = dict(zip(old["k"].to_pylist(), old["s"].to_pylist()))
    assert old_map[10] == "v10" and 110 not in old_map

    # carried files are literally the same manifest entries (paths
    # unchanged -> bytes never rewritten)
    import json as _json
    import os as _os
    m1 = _json.load(open(_os.path.join(root, "manifests",
                                       "snap-000001.json")))
    p1 = {f["path"] for f in m1["files"]}
    p2 = {f["path"] for f in m["files"]}
    assert len(p1 & p2) == 3

    # empty update batch: no-op, HEAD unchanged
    m3 = upsert_snapshot(
        rd.from_arrow(_table(0, 0)), root, "k")
    assert m3["id"] == 2


def test_snapshot_upsert_contract_gate(ray_session, tmp_path):
    from rayskema.schema import Column, Range, TableSchema
    from rayskema.sources.snapshot import upsert_snapshot
    root = str(tmp_path / "upc")
    write_snapshot(rd.from_arrow(_table(0, 20)).repartition(2), root,
                   stats_cols=("k",))
    contract = TableSchema(columns=(
        Column("k", pa.int64(),
               constraints=(Range(max=50, rule="k_cap"),)),))
    bad = rd.from_arrow(pa.table({
        "k": pa.array([999], pa.int64()),
        "ts": pa.array([0], type=pa.timestamp("us")),
        "s": pa.array(["x"])}))
    with pytest.raises(ValueError, match="rejected"):
        upsert_snapshot(bad, root, "k", contract=contract)
    # HEAD unchanged, old content intact
    back = _collect(read_snapshot(root))
    assert back.num_rows == 20


def test_snapshot_delete_three_way_triage(ray_session, tmp_path):
    from rayskema.sources.snapshot import delete_snapshot
    root = str(tmp_path / "del")
    # 4 files with disjoint k ranges: 0-24 / 25-49 / 50-74 / 75-99
    write_snapshot(rd.from_arrow(_table(0, 100)).repartition(4), root,
                   stats_cols=("k",))
    # DELETE WHERE k >= 30 AND k < 60: file 1 carries (proven
    # unmatched), file 2 straddles at both edges? no — 25-49: rows
    # 30..49 match, 25..29 don't -> rewrite; 50-74: 50..59 match ->
    # rewrite; 75-99 carries
    m = delete_snapshot(root, [("k", ">=", 30), ("k", "<", 60)])
    assert m["mode"] == "delete"
    assert m["files_carried"] == 2
    assert m["files_rewritten"] == 2
    assert m["files_dropped"] == 0
    assert m["rows"] == 70
    back = _collect(read_snapshot(root)).sort_by("k")
    assert back["k"].to_pylist() == (list(range(0, 30))
                                     + list(range(60, 100)))
    # DELETE WHERE k >= 60: one file (75-99) is PROVEN all-match and
    # drops without a read; 60-74 of the rewritten file also goes
    m2 = delete_snapshot(root, [("k", ">=", 60)])
    assert m2["files_dropped"] >= 1 and m2["rows"] == 30
    back2 = _collect(read_snapshot(root)).sort_by("k")
    assert back2["k"].to_pylist() == list(range(0, 30))
    # time travel: the pre-delete snapshot still reads 100 rows
    assert _collect(read_snapshot(root, snapshot=1)).num_rows == 100
    # null-safe: predicate over an all-null stats column deletes
    # nothing but still commits
    import pyarrow as _pa
    root2 = str(tmp_path / "deln")
    t = _pa.table({"k": _pa.array([None, None], _pa.int64()),
                   "s": _pa.array(["a", "b"])})
    write_snapshot(rd.from_arrow(t), root2, stats_cols=("k",))
    m3 = delete_snapshot(root2, [("k", ">=", 0)])
    assert m3["rows"] == 2 and m3["files_carried"] == 1


def test_cli_snapshot_delete(ray_session, tmp_path, capsys):
    import json
    import pyarrow.parquet as pq
    from rayskema.__main__ import main
    src = str(tmp_path / "s.parquet")
    pq.write_table(_table(0, 40), src)
    root = str(tmp_path / "tbl")
    assert main(["snapshot", "--root", root, "--action", "write",
                 "--input", src, "--stats-cols", "k"]) == 0
    assert main(["snapshot", "--root", root, "--action", "delete",
                 "--where", "k,>=,35"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 35
    assert _collect(read_snapshot(root)).num_rows == 35


def test_snapshot_bloom_point_lookup_prune(ray_session, tmp_path):
    """Manifest Bloom filters prune equality lookups that min/max
    ranges cannot: two files with fully OVERLAPPING key ranges
    (even/odd interleave) — a point lookup opens only the file whose
    bloom contains the key."""
    from rayskema.sources.snapshot import upsert_snapshot
    root = str(tmp_path / "bl")
    evens = pa.table({
        "k": pa.array(list(range(0, 100, 2)), pa.int64()),
        "s": pa.array([f"e{i}" for i in range(50)])})
    odds = pa.table({
        "k": pa.array(list(range(1, 100, 2)), pa.int64()),
        "s": pa.array([f"o{i}" for i in range(50)])})
    ds = rd.from_arrow([evens, odds])
    write_snapshot(ds, root, stats_cols=("k",), bloom_cols=("k",))

    # ranges overlap completely: min/max alone keeps both files;
    # the bloom proves k=42 lives only in the even file
    hit = read_snapshot(root, filter=[("k", "==", 42)])
    assert len(hit.input_files()) == 1
    assert _collect(hit)["s"].to_pylist() == ["e21"]
    # absent key: bloom prunes EVERYTHING (no task launches)
    miss = read_snapshot(root, filter=[("k", "==", 1000)])
    assert miss.count() == 0
    # range predicates ignore the bloom (both files still read):
    # evens {90..98} + odds {91..99} = 10 rows
    rng = read_snapshot(root, filter=[("k", ">=", 90)])
    assert _collect(rng).num_rows == 10

    # string bloom column + DML thread-through: upsert preserves the
    # bloom config on rewritten files
    root2 = str(tmp_path / "bls")
    t = pa.table({
        "k": pa.array([f"conv-{i:03d}" for i in range(40)]),
        "v": pa.array(range(40), pa.int64())})
    write_snapshot(rd.from_arrow(t).repartition(2), root2,
                   stats_cols=("k",), bloom_cols=("k",))
    upd = rd.from_arrow(pa.table({
        "k": pa.array(["conv-005"]),
        "v": pa.array([999], pa.int64())}))
    m = upsert_snapshot(upd, root2, "k")
    assert m["bloom_cols"] == ["k"]
    one = read_snapshot(root2, filter=[("k", "==", "conv-005")])
    got = _collect(one)
    assert got["v"].to_pylist() == [999]
    none = read_snapshot(root2, filter=[("k", "==", "conv-999")])
    assert none.count() == 0


def test_snapshot_add_column_evolution(ray_session, tmp_path):
    """An append introducing a new column must surface it (nulls for
    old files) regardless of file order — Ray's bare read_parquet
    would silently keep only the first file's columns."""
    root = str(tmp_path / "evo")
    write_snapshot(rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())})), root, stats_cols=("k",))
    write_snapshot(rd.from_arrow(pa.table({
        "k": pa.array([3], pa.int64()),
        "lang": pa.array(["en"])})), root,
        stats_cols=("k",), mode="append")
    back = _collect(read_snapshot(root)).sort_by("k")
    assert back.column_names == ["k", "lang"]
    assert back["lang"].to_pylist() == [None, None, "en"]
    # projection onto the evolved column alone still works
    lang = _collect(read_snapshot(root, columns=["lang"]))
    assert sorted(lang["lang"].to_pylist(), key=str) == \
        [None, None, "en"]
    # the single-schema fast path is untouched (no footer reads):
    # snapshot 1 alone has one fingerprint
    one = _collect(read_snapshot(root, snapshot=1))
    assert one.column_names == ["k"]


def test_snapshot_branches_and_tags(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd
    from rayskema.sources.snapshot import (create_branch, create_tag,
                                           list_refs, read_snapshot,
                                           upsert_snapshot,
                                           write_snapshot)
    root = str(tmp_path / "tbl")
    base = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    m1 = write_snapshot(rd.from_arrow(base), root, stats_cols=("k",))
    create_tag(root, "v1")
    create_branch(root, "dev")
    # commits on dev: main must not observe them
    m2 = write_snapshot(
        rd.from_arrow(pa.table({"k": [4], "v": ["d"]})), root,
        stats_cols=("k",), mode="append", branch="dev")
    assert m2["parent"] == m1["id"] and m2["id"] != m1["id"]
    main_rows = read_snapshot(root).to_pandas()
    dev_rows = read_snapshot(root, ref="dev").to_pandas()
    assert sorted(main_rows["k"]) == [1, 2, 3]
    assert sorted(dev_rows["k"]) == [1, 2, 3, 4]
    # upsert on dev only
    upsert_snapshot(rd.from_arrow(pa.table({"k": [1], "v": ["A"]})),
                    root, "k", branch="dev")
    dev2 = read_snapshot(root, ref="dev").to_pandas() \
        .set_index("k")["v"].to_dict()
    assert dev2[1] == "A" and dev2[4] == "d"
    assert read_snapshot(root).to_pandas().set_index("k")["v"][1] == "a"
    # main keeps committing with globally-unique ids
    m3 = write_snapshot(
        rd.from_arrow(pa.table({"k": [9], "v": ["z"]})), root,
        stats_cols=("k",), mode="append")
    refs = list_refs(root)
    assert refs["tags"]["v1"] == m1["id"]
    assert refs["main"] == m3["id"]
    ids = {m1["id"], m2["id"], m3["id"], refs["branches"]["dev"]}
    assert len(ids) == 4          # no id collisions across branches
    # tag is immutable and readable by name
    tagged = read_snapshot(root, ref="v1").to_pandas()
    assert sorted(tagged["k"]) == [1, 2, 3]
    import pytest
    with pytest.raises(FileExistsError):
        create_tag(root, "v1")


def test_refs_guards(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from rayskema.sources.snapshot import (create_branch, create_tag,
                                           read_snapshot,
                                           write_snapshot)
    root = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(pa.table({"k": [1, 2]})), root)
    create_tag(root, "v1")
    # a DML commit cannot shadow a tag name with a branch
    with pytest.raises(FileExistsError):
        write_snapshot(rd.from_arrow(pa.table({"k": [9]})), root,
                       branch="v1")
    assert sorted(read_snapshot(root, ref="v1").to_pandas()["k"]) \
        == [1, 2]
    with pytest.raises(FileExistsError):
        create_branch(root, "v1")
    create_branch(root, "dev")
    with pytest.raises(FileExistsError):
        create_tag(root, "dev")
    # append to a nonexistent branch errors instead of silently
    # creating a fresh branch with only the new rows
    with pytest.raises(FileNotFoundError):
        write_snapshot(rd.from_arrow(pa.table({"k": [9]})), root,
                       branch="dve", mode="append")


def test_theilsen_nan_y_sql_parity(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rayskema.pipelines.relational import group_theilsen
    t = pa.table({"g": ["a"] * 3 + ["b"] * 3,
                  "x": pa.array([0.0, 1.0, 2.0] * 2),
                  "y": pa.array([1.0, float("nan"), 2.0,
                                 1.0, 2.0, 3.0])})
    out = group_theilsen(rd.from_arrow(t).repartition(2), "g", "x",
                         "y").to_pandas().set_index("g")
    con = duckdb.connect()
    con.register("t", t)       # arrow: NaN stays NaN, not NULL
    o = con.execute("""
        WITH e AS (SELECT g, x, y,
                          ROW_NUMBER() OVER (PARTITION BY g
                                             ORDER BY x) rn FROM t),
             p AS (SELECT a.g, CASE WHEN b.x <> a.x
                        THEN (b.y - a.y) / (b.x - a.x) END AS s
                   FROM e a JOIN e b ON a.g = b.g AND a.rn < b.rn)
        SELECT g, count(s) AS n_pairs, median(s) AS slope
        FROM p GROUP BY g ORDER BY g""").fetchdf().set_index("g")
    assert out.loc["a", "n_pairs"] == o.loc["a", "n_pairs"] == 3
    assert np.isnan(out.loc["a", "slope"]) == np.isnan(
        o.loc["a", "slope"])
    assert out.loc["b", "slope"] == o.loc["b", "slope"] == 1.0
