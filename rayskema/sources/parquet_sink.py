"""Resumable hive-partitioned Parquet sink for ANY dataset.

The validate pipeline has its own checkpointed sink
(``pipelines/checkpoint.py``); this is the generic form the brief's
output contract asks for — "write partitioned Parquet (one directory
per key range) so a failed run can skip finished partitions":

- one ``<by>=<value>/`` directory per distinct partition value (hive
  layout, readable back with ``read_parquet`` partition discovery);
- ALL of a value's rows are co-located in one bucket task by the
  repo-standard hash exchange, so each partition is written by exactly
  ONE task: data lands as ``part.parquet`` via write-tmp-then-rename
  and a ``_SUCCESS`` marker commits it — the partition either exists
  completely or not at all, under any retry;
- a resumed run lists the committed markers first and drops those
  partitions' rows BEFORE the exchange (broadcast membership filter),
  so finished partitions move zero bytes.

Scale notes: the driver holds O(partitions) marker names, never data;
partition count should be a grouping key's cardinality (source, date,
shard id — thousands), not a row id.  Values are rendered with ``str``
— keep partition keys to strings/ints without path separators.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..pipelines.relational import bucketed_map_groups, segment_starts


def _part_dir(out_dir: str, by: str, value) -> str:
    return os.path.join(out_dir, f"{by}={value}")


def finished_partitions(out_dir: str, by: str) -> set[str]:
    """String-rendered values of partitions already committed (their
    ``_SUCCESS`` marker exists)."""
    done: set[str] = set()
    prefix = f"{by}="
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
                os.path.join(out_dir, name, "_SUCCESS")):
            done.add(name[len(prefix):])
    return done


def write_parquet_partitioned(
    ds: "rd.Dataset", out_dir: str, by: str, *,
    resume: bool = True, buckets: int | None = None,
) -> "rd.Dataset":
    """Write ``ds`` under ``out_dir`` as one hive partition per
    distinct ``by`` value; returns ``(value, rows)`` for the
    partitions written THIS run (resumed-over partitions are absent).
    Rows with a null ``by`` land in ``<by>=__NULL__``."""
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, by) if resume else set()

    def _key_str(tab: pa.Table) -> pa.ChunkedArray:
        return pc.fill_null(pc.cast(tab[by], pa.string()), "__NULL__")

    src = ds
    if done:
        done_arr = pa.array(sorted(done), type=pa.string())

        def _drop_done(tab: pa.Table) -> pa.Table:
            hit = pc.is_in(_key_str(tab), value_set=done_arr)
            return tab.filter(pc.invert(hit))

        src = ds.map_batches(_drop_done, batch_format="pyarrow")

    def _stamp_key(tab: pa.Table) -> pa.Table:
        return tab.append_column("__k", _key_str(tab))

    def _write_bucket(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"value": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        tab = tab.sort_by([("__k", "ascending")])
        starts = np.flatnonzero(segment_starts(tab, ["__k"]))
        ends = np.append(starts[1:], tab.num_rows)
        keys = tab["__k"].take(pa.array(starts)).to_pylist()
        body = tab.drop_columns(["__k"])
        out_rows = []
        for val, s, e in zip(keys, starts, ends):
            pdir = _part_dir(out_dir, by, val)
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, f".part.tmp.{os.getpid()}")
            pq.write_table(body.slice(s, e - s), tmp)
            os.replace(tmp, os.path.join(pdir, "part.parquet"))
            with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
                f.write(str(e - s))
            out_rows.append((val, int(e - s)))
        return pa.table({
            "value": pa.array([v for v, _ in out_rows]),
            "rows": pa.array([n for _, n in out_rows],
                             type=pa.int64())})

    # Exchange on the RENDERED key string, not the raw column: a
    # literal "__NULL__" string value and actual nulls render to the
    # same partition directory, so they must land in the SAME bucket
    # task — grouping on the raw column could put them in different
    # tasks whose concurrent os.replace on <by>=__NULL__/part.parquet
    # silently drops one task's rows
    return bucketed_map_groups(
        src.map_batches(_stamp_key, batch_format="pyarrow"),
        ["__k"], _write_bucket, buckets=buckets, sort_within=False)


def read_hive_partitions(out_dir: str, by: str, *, values=None,
                         columns=None) -> "rd.Dataset":
    """Read back a :func:`write_parquet_partitioned` layout with
    PARTITION PRUNING: only directories whose ``<by>=<value>`` name
    matches ``values`` are listed and read — unmatched partitions'
    files never leave storage, the property the hive layout exists
    for.  ``values=None`` reads everything.  The partition column is
    re-materialized from the directory name as a string column
    (nulls arrive as the ``__NULL__`` sentinel directory and come
    back as NULL); combine with ``columns=`` so the scan is pruned on
    both axes.  Partitions without a ``_SUCCESS`` marker (interrupted
    writes) raise rather than silently return partial data."""
    want = None if values is None else {
        "__NULL__" if v is None else str(v) for v in values}
    dirs = []
    prefix = f"{by}="
    for name in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, name)
        if not (os.path.isdir(full) and name.startswith(prefix)):
            continue
        val = name[len(prefix):]
        if want is not None and val not in want:
            continue
        if not os.path.exists(os.path.join(full, "_SUCCESS")):
            raise RuntimeError(
                f"partition {name!r} has no _SUCCESS marker "
                "(interrupted write) — refusing partial data")
        dirs.append((val, full))
    if not dirs:
        return rd.from_arrow(pa.table({by: pa.array([], pa.string())}))

    def _with_part(val: str):
        def f(tab: pa.Table) -> pa.Table:
            # the files carry the original column too; the directory
            # name is authoritative (and survives columns= pruning)
            if by in tab.column_names:
                tab = tab.drop_columns([by])
            col = pa.nulls(tab.num_rows, pa.string()) \
                if val == "__NULL__" else pa.array(
                    [val] * tab.num_rows, pa.string())
            return tab.append_column(by, col)
        return f

    parts = []
    for val, full in dirs:
        ds = rd.read_parquet(full, columns=columns,
                             file_extensions=["parquet"])
        parts.append(ds.map_batches(_with_part(val),
                                    batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
