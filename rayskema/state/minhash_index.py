"""Persistent MinHash BAND index for INCREMENTAL near-duplicate
detection.

The continual-ingest problem, near-dup edition: at 100 TB the accepted
corpus cannot be re-shingled or re-shuffled each time a crawl
increment arrives.  The corpus's LSH state — one ``(band, band_key,
id)`` row per (document, band) — lives in an on-disk index partitioned
by the repo-standard hash of ``band_key`` (one sorted parquet file per
bucket plus a ``meta.json`` pinning the signature parameters, bucket
count and hash version).  Finding the increment's near-duplicates
against the corpus is then:

1. compute the increment's band rows with the PINNED parameters (the
   meta is the contract: a probe with drifted ``n_perm``/``bands``/
   shingle kind would silently miss collisions, so parameters are
   read from the meta, never passed);
2. hash-partition the increment's band rows on the same rule — one
   bucketed exchange over the increment only, the index never moves;
3. each bucket task reads ONLY its matching index file and joins on
   ``(band, band_key)`` → candidate pairs ``(id_new, id_old)``;
   degenerate everything-collides buckets are capped at ``max_group``
   index rows per (band, band_key) group (standard LSH practice,
   pinned in the meta);
4. with ``update=True`` the task merges its band rows into the bucket
   file (write-temp + atomic ``os.replace``) so the index is current
   for the next increment — single-writer per increment, the usual
   ingest-queue discipline.

Band collisions are CANDIDATES; precision comes from composing with
:func:`rayskema.functions.dedup.exact_shingle_jaccard_pairs` over the
union of corpus and increment (column-pruned to the candidate ids —
O(pairs), never the corpus).  Candidate recall is at least that of the
single-shot :func:`rayskema.functions.dedup.minhash_lsh_pairs` with
the same parameters: the index probe keeps EVERY band collision where
the single-shot path additionally prefilters on estimated signature
similarity.

Reference parity: the reference has no near-dup surface at all; this
is beyond-reference capability a 100 TB ingest loop needs (the
near-dup sibling of :mod:`rayskema.state.dedup_index`).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..pipelines.relational import (bucketed_map_groups, composite_hash,
                                    segment_starts)
from ..functions.dedup import (_MASK64, _hash64, char_shingle_hashes,
                               minhash_signature, word_shingle_hashes)

_META = "meta.json"
_HASH_VERSION = 1


def _bucket_path(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"bands-{b:05d}.parquet")


def _atomic_write(tab: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def band_rows(tab: pa.Table, text_col: str, id_col: str, *,
              n_perm: int, bands: int, shingle_k: int,
              shingles: str) -> pa.Table:
    """(band int32, band_key int64, id int64) rows for one batch —
    the exact banding of ``minhash_lsh_pairs`` (same shingle hashes,
    same signature fold, same band-key mix), factored out so index
    build and probe can never drift from each other."""
    rows_per_band = n_perm // bands
    arr = tab[text_col].combine_chunks()
    if shingles == "word3":
        rid, h = word_shingle_hashes(arr, k=3)
    else:
        rid, h = char_shingle_hashes(arr, k=shingle_k)
    sig = minhash_signature(rid, h, tab.num_rows, n_perm)
    ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
        zero_copy_only=False)
    parts = []
    for b in range(bands):
        bh = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
        key = np.zeros(len(ids), dtype=np.uint64)
        for j in range(rows_per_band):
            key = (key * np.uint64(0x100000001B3) + bh[:, j]) & _MASK64
        parts.append(pa.table({
            "band": pa.array(np.full(len(ids), b, dtype=np.int32)),
            "band_key": pa.array(_hash64(key ^ np.uint64(b + 1))
                                 .astype(np.int64)),
            "id": pa.array(ids)}))
    return pa.concat_tables(parts)


def _own_bucket(tab: pa.Table, buckets: int) -> int:
    b = (composite_hash(tab, ["band_key"]) % np.uint64(buckets)) \
        .astype(np.int64)
    if b.min() != b.max():
        raise RuntimeError("exchange/bucket rule drift: one gather "
                           "task received rows of multiple buckets")
    return int(b[0])


def _distinct_sorted(tab: pa.Table) -> pa.Table:
    tab = tab.select(["band", "band_key", "id"]).sort_by(
        [("band", "ascending"), ("band_key", "ascending"),
         ("id", "ascending")])
    if tab.num_rows == 0:
        return tab
    firsts = np.flatnonzero(
        segment_starts(tab, ["band", "band_key", "id"]))
    return tab.take(pa.array(firsts))


def build_minhash_index(
    ds: "rd.Dataset", text_col: str, id_col: str, index_dir: str, *,
    buckets: int = 64, n_perm: int = 64, bands: int = 16,
    shingle_k: int = 5, shingles: str = "char5",
    max_group: int = 1024,
) -> dict:
    """Build (overwrite) the band index from ``ds``.  One signature
    pass plus one bucketed exchange over the band rows; any previous
    index is removed first (meta invalidated before bucket files, so
    a partial rebuild can never be read under stale parameters)."""
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, _META)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    for name in os.listdir(index_dir):
        if name.startswith("bands-") and name.endswith(".parquet"):
            os.remove(os.path.join(index_dir, name))

    params = dict(n_perm=n_perm, bands=bands, shingle_k=shingle_k,
                  shingles=shingles)

    rows = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: band_rows(t, text_col, id_col, **params),
        batch_format="pyarrow")

    def _write_bucket(tab: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "n_rows": pa.array([], type=pa.int64())})
        if tab.num_rows == 0:
            return empty
        b = _own_bucket(tab, buckets)
        keys = _distinct_sorted(tab)
        _atomic_write(keys, _bucket_path(index_dir, b))
        return pa.table({"bucket": pa.array([b], type=pa.int64()),
                         "n_rows": pa.array([keys.num_rows],
                                            type=pa.int64())})

    manifest = bucketed_map_groups(rows, ["band_key"], _write_bucket,
                                   buckets=buckets, sort_within=False)
    tabs = [t for t in ray.get(manifest.to_arrow_refs()) if t.num_rows]
    n_rows = int(sum(t["n_rows"].to_numpy().sum() for t in tabs)) \
        if tabs else 0
    meta = {"buckets": buckets, "hash_version": _HASH_VERSION,
            "n_rows": n_rows, "text_col": text_col, "id_col": id_col,
            "max_group": max_group, **params}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def probe_minhash_index(
    ds: "rd.Dataset", text_col: str, id_col: str, index_dir: str, *,
    update: bool = False,
) -> "rd.Dataset":
    """Candidate near-dup pairs of an increment against the index:
    ``(id_new, id_old)`` distinct rows, one per band collision pair
    (deduped across bands).  Signature parameters come from the
    index's meta — never from the caller.  With ``update=True`` each
    bucket task also merges its increment rows into its index file
    (atomic replace; one task owns one file per run)."""
    meta = read_meta(index_dir)
    if meta["hash_version"] != _HASH_VERSION:
        raise RuntimeError("index built under a different hash version")
    buckets = meta["buckets"]
    max_group = meta.get("max_group", 1024)
    params = dict(n_perm=meta["n_perm"], bands=meta["bands"],
                  shingle_k=meta["shingle_k"],
                  shingles=meta["shingles"])

    rows = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: band_rows(t, text_col, id_col, **params),
        batch_format="pyarrow")

    def _probe_bucket(tab: pa.Table) -> pa.Table:
        empty = pa.table({"id_new": pa.array([], type=pa.int64()),
                          "id_old": pa.array([], type=pa.int64())})
        if tab.num_rows == 0:
            return empty
        b = _own_bucket(tab, buckets)
        path = _bucket_path(index_dir, b)
        inc = _distinct_sorted(tab)
        if not os.path.exists(path):
            if update:
                _atomic_write(inc, path)
            return empty
        idx = pq.read_table(path)
        # cap degenerate groups on the INDEX side BEFORE the join:
        # a (band, band_key) group with more than ``max_group`` index
        # rows (e.g. a band key every empty document shares) is
        # skipped entirely — the docstring/meta contract.  Capping
        # pre-join also bounds the join's output (increment rows x
        # max_group), where a post-join row-count cap would first
        # materialize the m x n blowup it is meant to prevent.
        # Dropped groups are surfaced, not silent: one warning line
        # per bucket task with the group count (worker log).
        idx = idx.sort_by([("band", "ascending"),
                           ("band_key", "ascending"),
                           ("id", "ascending")])
        igrp = np.cumsum(segment_starts(idx, ["band", "band_key"])) - 1
        isizes = np.bincount(igrp) if len(igrp) else \
            np.zeros(0, dtype=np.int64)
        n_dropped = int((isizes > max_group).sum())
        if n_dropped:
            import warnings
            warnings.warn(
                f"probe_minhash_index: bucket {b}: skipped "
                f"{n_dropped} degenerate (band, band_key) group(s) "
                f"with > {max_group} index rows (recall loss on "
                f"those keys)", RuntimeWarning, stacklevel=2)
            idx_j = idx.filter(pa.array(isizes[igrp] <= max_group))
        else:
            idx_j = idx
        # ... and symmetrically on the INCREMENT side: a degenerate
        # increment group (e.g. >max_group near-identical docs in one
        # crawl batch) would otherwise join every capped index group
        # uncapped, materializing the m x n blowup anyway
        inc_s = inc.sort_by([("band", "ascending"),
                             ("band_key", "ascending"),
                             ("id", "ascending")])
        ngrp = np.cumsum(segment_starts(inc_s,
                                        ["band", "band_key"])) - 1
        nsizes = np.bincount(ngrp) if len(ngrp) else \
            np.zeros(0, dtype=np.int64)
        n_dropped_inc = int((nsizes > max_group).sum())
        if n_dropped_inc:
            import warnings
            warnings.warn(
                f"probe_minhash_index: bucket {b}: skipped "
                f"{n_dropped_inc} degenerate (band, band_key) "
                f"increment group(s) with > {max_group} rows "
                f"(recall loss on those keys)", RuntimeWarning,
                stacklevel=2)
            inc_j = inc_s.filter(pa.array(nsizes[ngrp] <= max_group))
        else:
            inc_j = inc_s
        joined = inc_j.join(idx_j, keys=["band", "band_key"],
                            join_type="inner", right_suffix="_old")
        out = empty
        if joined.num_rows:
            joined = joined.sort_by(
                [("band", "ascending"), ("band_key", "ascending"),
                 ("id", "ascending"), ("id_old", "ascending")])
            kept = joined
            a = kept["id"].to_numpy(zero_copy_only=False)
            o = kept["id_old"].to_numpy(zero_copy_only=False)
            m = a != o
            a, o = a[m], o[m]
            order = np.lexsort((o, a))
            a, o = a[order], o[order]
            first = np.concatenate(
                [[True], (a[1:] != a[:-1]) | (o[1:] != o[:-1])]) \
                if len(a) else np.zeros(0, dtype=bool)
            out = pa.table({"id_new": pa.array(a[first]),
                            "id_old": pa.array(o[first])})
        if update:
            merged = _distinct_sorted(pa.concat_tables([idx, inc]))
            _atomic_write(merged, path)
        return out

    per_bucket = bucketed_map_groups(rows, ["band_key"], _probe_bucket,
                                     buckets=buckets,
                                     sort_within=False)

    # the same pair surfaces once per colliding band, and different
    # bands hash to different buckets — one small exchange makes the
    # pair list globally distinct
    def _distinct_pairs(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab
        tab = tab.sort_by([("id_new", "ascending"),
                           ("id_old", "ascending")])
        firsts = np.flatnonzero(
            segment_starts(tab, ["id_new", "id_old"]))
        return tab.take(pa.array(firsts))

    return bucketed_map_groups(per_bucket, ["id_new", "id_old"],
                               _distinct_pairs,
                               buckets=max(8, buckets // 8),
                               sort_within=False)
