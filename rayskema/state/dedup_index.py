"""Persistent hash-partitioned key index for INCREMENTAL exact dedup.

The continual-ingest problem: at 100 TB the already-accepted corpus
cannot be rescanned (or re-shuffled) every time a new increment
arrives.  Instead its keys live in an on-disk index partitioned by the
repo-standard key hash (``bucket = composite_hash(keys) % P``, one
sorted parquet file of DISTINCT key tuples per bucket, plus a
``meta.json`` pinning ``P``/key columns/hash version).  Deduplicating
a new increment is then:

1. hash-partition the increment on the SAME rule (one bucketed
   exchange over the increment only — the index never moves);
2. each bucket task reads ONLY its matching index file (partition
   pruning: 1/P of the index per task) and anti-joins its rows
   against it (Acero ``left anti``, SQL NULL semantics: a null key
   never matches, so null-keyed rows always survive — the same answer
   ``NOT EXISTS`` gives);
3. with ``update=True`` the task merges its increment's fresh keys
   back into the bucket file (write-temp + atomic ``os.replace``), so
   the index is current for the next increment without any global
   rebuild.  One task owns one bucket file per run — no write races
   within a run; concurrent RUNS against one index are the caller's
   lock to take (single-writer per increment, the usual ingest-queue
   discipline).

Scale notes: the index is O(distinct keys) — for document pipelines
key on a fingerprint (e.g. ``md5_hex(text)``), not the text itself,
so a bucket file stays a few MB per billion documents per 4096
buckets.  Intra-increment duplicates are NOT collapsed here (both
rows survive if the key is new — ``NOT EXISTS`` semantics, exactly
SQL-oracle-checkable); compose with
:func:`rayskema.pipelines.relational.find_duplicates` or
:func:`rayskema.functions.dedup.exact_duplicates` when the increment
itself must be deduped.

Reference parity: the reference's uniqueness rule is a single-run,
in-memory check (``rules/rules.go:116-135``); the persistent
cross-run index is beyond-reference capability a 100 TB ingest loop
needs.
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..pipelines.relational import (bucketed_map_groups, composite_hash,
                                    segment_starts)

_META = "meta.json"
_HASH_VERSION = 1


def _bucket_path(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"keys-{b:05d}.parquet")


def _atomic_write(tab: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)


def _distinct_sorted(tab: pa.Table, key_cols: list[str]) -> pa.Table:
    """Distinct key tuples of a KEY-SORTED table (segment firsts)."""
    if tab.num_rows == 0:
        return tab.select(key_cols)
    firsts = np.flatnonzero(segment_starts(tab, key_cols))
    return tab.select(key_cols).take(pa.array(firsts))


def _own_bucket(tab: pa.Table, key_cols: list[str], buckets: int) -> int:
    """The bucket id this gather task owns — recomputed from the rows
    with the same hash rule the exchange used (and asserted uniform,
    so a hash-rule drift between build and lookup fails loudly instead
    of silently missing keys)."""
    b = (composite_hash(tab, key_cols) % np.uint64(buckets)).astype(np.int64)
    if b.min() != b.max():  # not an assert: must survive python -O
        raise RuntimeError("exchange/bucket rule drift: one gather task "
                           "received rows of multiple index buckets")
    return int(b[0])


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def build_key_index(
    ds, key_cols: Sequence[str], index_dir: str, *, buckets: int = 64,
) -> dict:
    """Build (overwrite) the index from ``ds``'s key columns.  Returns
    the meta dict; per-bucket files land under ``index_dir``.  One
    bucketed exchange over the keys, distinct-compressed map-side by
    the exchange's sort + segment firsts.  Any previous index in
    ``index_dir`` is removed FIRST (meta, then bucket files) — a
    rebuild whose data misses some bucket must not leave that bucket's
    stale keys behind, and leftovers from a different ``buckets`` count
    would be read under the wrong partitioning."""
    key_cols = list(key_cols)
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, _META)
    if os.path.exists(meta_path):
        os.remove(meta_path)  # invalidate before touching bucket files
    for name in os.listdir(index_dir):
        if name.startswith("keys-") and name.endswith(".parquet"):
            os.remove(os.path.join(index_dir, name))

    def _write_bucket(tab: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "n_keys": pa.array([], type=pa.int64())})
        if tab.num_rows == 0:
            return empty
        b = _own_bucket(tab, key_cols, buckets)
        keys = _distinct_sorted(tab, key_cols)
        _atomic_write(keys, _bucket_path(index_dir, b))
        return pa.table({"bucket": pa.array([b], type=pa.int64()),
                         "n_keys": pa.array([keys.num_rows],
                                            type=pa.int64())})

    manifest = bucketed_map_groups(
        ds.select_columns(key_cols), key_cols, _write_bucket,
        buckets=buckets, sort_within=True)
    import ray
    tabs = [t for t in ray.get(manifest.to_arrow_refs()) if t.num_rows]
    n_keys = int(sum(t["n_keys"].to_numpy().sum() for t in tabs)) \
        if tabs else 0
    meta = {"buckets": buckets, "key_cols": key_cols,
            "hash_version": _HASH_VERSION, "n_keys": n_keys}
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return meta


def dedup_against_index(ds, index_dir: str):
    """Rows of ``ds`` whose key tuple is NOT in the index (``NOT
    EXISTS`` semantics; intra-increment duplicates all survive).  Only
    the increment shuffles; each bucket task reads 1/P of the index.

    Pure read-only filter — safe under Ray task retry and lazy
    re-execution.  To make the next increment see this one's keys,
    persist/consume the survivors FIRST, then call
    :func:`update_key_index` (a fused filter-and-update inside one
    retryable task would re-read an index already containing its own
    keys after a retry and silently drop every survivor)."""
    meta = read_meta(index_dir)
    key_cols = list(meta["key_cols"])
    buckets = int(meta["buckets"])
    if meta.get("hash_version") != _HASH_VERSION:
        raise ValueError("index built with an incompatible hash version")

    def _filter_bucket(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab
        b = _own_bucket(tab, key_cols, buckets)
        path = _bucket_path(index_dir, b)
        seen = pq.read_table(path) if os.path.exists(path) else None
        if seen is not None and seen.num_rows:
            return tab.join(seen, keys=key_cols, join_type="left anti") \
                .select(tab.column_names)
        return tab

    return bucketed_map_groups(ds, key_cols, _filter_bucket,
                               buckets=buckets, sort_within=False)


def update_key_index(ds, index_dir: str) -> int:
    """Fold ``ds``'s key tuples into the index (atomic per-bucket
    replace); returns the number of keys newly added.  IDEMPOTENT —
    merging keys already present is a no-op, so a retried task
    converges to the same file content — which is why this is a
    separate pass and not a flag on :func:`dedup_against_index` (see
    there).  One bucketed exchange over the new keys only."""
    meta = read_meta(index_dir)
    key_cols = list(meta["key_cols"])
    buckets = int(meta["buckets"])
    if meta.get("hash_version") != _HASH_VERSION:
        raise ValueError("index built with an incompatible hash version")
    sort_keys = [(c, "ascending") for c in key_cols]

    def _merge_bucket(tab: pa.Table) -> pa.Table:
        empty = pa.table({"n_added": pa.array([], type=pa.int64())})
        if tab.num_rows == 0:
            return empty
        b = _own_bucket(tab, key_cols, buckets)
        path = _bucket_path(index_dir, b)
        fresh = _distinct_sorted(tab, key_cols)
        seen = pq.read_table(path) if os.path.exists(path) else None
        if seen is None or not seen.num_rows:
            merged = fresh
            added = fresh.num_rows
        else:
            merged = _distinct_sorted(
                pa.concat_tables([seen.cast(fresh.schema), fresh])
                .sort_by(sort_keys), key_cols)
            added = merged.num_rows - seen.num_rows
        _atomic_write(merged, path)
        return pa.table({"n_added": pa.array([added], type=pa.int64())})

    out = bucketed_map_groups(ds.select_columns(key_cols), key_cols,
                              _merge_bucket, buckets=buckets,
                              sort_within=True)
    import ray
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return int(sum(t["n_added"].to_numpy().sum() for t in tabs)) \
        if tabs else 0
