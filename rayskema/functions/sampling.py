"""Seeded sampling (SURVEY §2.7 O3): the cheap pre-check every large
corpus run starts with — sample before you validate/drift-check.

Two modes:

- ``key`` given: CONTENT-keyed Bernoulli sampling — a row is kept iff
  ``hash(key, seed) < fraction * 2^64``.  Deterministic regardless of
  block layout, partitioning or cluster size (the property that matters
  at 100 TB, where the block structure of two runs never matches), and
  consistent across tables: the same key samples in or out everywhere,
  so sampled fact/dimension tables stay joinable.
- no ``key``: positional sampling via ``Dataset.random_sample`` with a
  fixed seed (deterministic for a fixed block layout only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..state.sketches import _hash64, hash_strings


def _md5_u32(key: "pa.Array", salt_b: bytes):
    """Per-row uint32 from the first 8 hex digits of ``md5(salt ||
    key)`` — THE content-hash primitive shared by :func:`hash_split`
    and :func:`mixture_sample`, bit-identical to the SQL oracle form
    ``substr(md5(salt || key), 1, 8)`` (fixed-width lowercase hex
    compares like the integer).  Returns ``(u, null_mask)``; null rows
    are left unhashed (callers route them to their SQL NULL branch)."""
    from . import binary_buffers

    offsets, mv, null_mask = binary_buffers(key)
    n = len(offsets) - 1
    u = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        if null_mask is not None and null_mask[i]:
            continue
        u[i] = int(hashlib.md5(
            salt_b + bytes(mv[offsets[i]:offsets[i + 1]]))
            .hexdigest()[:8], 16)
    return u, null_mask


def stratified_sample(ds: "rd.Dataset", group_col: str, id_col: str,
                      text_col: str, *, k: int = 5,
                      buckets: int | None = None) -> "rd.Dataset":
    """Deterministic k-per-group sample: ``(group, id, rank)`` — the
    ``k`` rows of each group with the smallest ``md5(text)`` (ties by
    ``id``).

    The balanced-strata companion to :func:`seeded_sample`: every
    stratum (language, source, ...) contributes exactly ``min(k, |g|)``
    rows regardless of its share of the corpus, and the choice is
    content-keyed — stable across block layouts, partition counts and
    cluster sizes, and reproducible by any SQL engine as
    ``row_number() OVER (PARTITION BY g
    ORDER BY md5(coalesce(text, '')), id) <= k``.
    One hash shuffle on the group key (the same bucketed top-k as
    ``topk_per_group``); batches carry only (group, id, fp).  Null text
    hashes ``md5('')`` (pair the SQL oracle with
    ``md5(coalesce(text, ''))``)."""
    from ..pipelines.relational import topk_per_group
    from . import md5_hex

    def _fp(tab: pa.Table) -> pa.Table:
        return pa.table({group_col: tab[group_col], id_col: tab[id_col],
                         "fp": md5_hex(tab[text_col])})

    stamped = ds.select_columns(
        list(dict.fromkeys([group_col, id_col, text_col]))).map_batches(
        _fp, batch_format="pyarrow")
    return topk_per_group(stamped, group_col, "fp", id_col, k=k,
                          descending=False, buckets=buckets)


def seeded_sample(ds: "rd.Dataset", fraction: float, seed: int = 0,
                  *, key: str | None = None) -> "rd.Dataset":
    """Deterministic sample of ``fraction`` of the rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if key is None:
        return ds.random_sample(fraction, seed=seed)
    if fraction >= 1.0:
        return ds     # keep everything (2^64 overflows uint64 below)
    threshold = np.uint64(int(fraction * 2.0**64))

    def _keep(t: pa.Table) -> pa.Table:
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(col, seed=seed)
        else:
            v = pc.cast(col, pa.int64(), safe=False).fill_null(0)\
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            h = _hash64(v ^ np.uint64(seed))
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(_keep, batch_format="pyarrow")


def hash_split(ds: "rd.Dataset", key_col: str,
               fractions: "dict[str, float]", *, salt: str = "",
               out_col: str = "split") -> "rd.Dataset":
    """Deterministic train/val/test split assignment: append
    ``out_col`` naming each row's split, chosen by content hash —
    ``u = int(md5(salt || key)[:8 hex], 16) / 2^32`` mapped onto the
    cumulative ``fractions`` intervals (dict order = interval order).

    Content-keyed like :func:`seeded_sample`: the assignment depends
    only on the key bytes, so it is identical across block layouts,
    cluster sizes and engines — any SQL engine reproduces it with
    ``substr(md5(key), 1, 8)`` compared against the same hex
    thresholds, and the same key lands in the same split in every
    table it appears in (fact/dim splits stay joinable).  Null keys
    go to the LAST split, matching the SQL CASE's ELSE branch
    (``md5(NULL)`` is NULL, so every comparison falls through).
    Stateless vectorized stage; hashing is the work (C-speed hashlib
    over zero-copy buffer slices)."""
    names = list(fractions)
    fracs = [float(fractions[n]) for n in names]
    if not names or any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fractions must be a non-empty mapping of "
                         "non-negative shares summing to 1")
    cum = np.cumsum(fracs)
    # integer thresholds over the 32-bit hash prefix; the last interval
    # absorbs rounding so every u is assigned
    bounds = np.array([int(round(c * 2**32)) for c in cum[:-1]],
                      dtype=np.uint64)
    names_arr = pa.array(names, type=pa.string())
    salt_b = salt.encode()

    def _assign(tab: pa.Table) -> pa.Table:
        key = pc.cast(tab[key_col], pa.string())
        u, null_mask = _md5_u32(key.combine_chunks(), salt_b)
        idx = np.searchsorted(bounds, u, side="right")
        if null_mask is not None:
            idx[null_mask] = len(names) - 1  # SQL CASE ELSE branch
        return tab.append_column(
            out_col, names_arr.take(pa.array(idx.astype(np.int64))))

    return ds.map_batches(_assign, batch_format="pyarrow")


def split_thresholds_hex(fractions: "dict[str, float]") -> "list[str]":
    """The 8-hex-digit thresholds :func:`hash_split` uses, for building
    the equivalent SQL CASE expression."""
    fracs = [float(v) for v in fractions.values()]
    cum = np.cumsum(fracs)
    return [format(int(round(c * 2**32)), "08x") for c in cum[:-1]]


def mixture_sample(
    ds: "rd.Dataset", group_col: str, key_col: str,
    rates: "dict[str, float]", *, default_rate: float = 1.0,
    salt: str = "", copy_col: str = "copy_idx",
) -> "rd.Dataset":
    """Deterministic source-mixture resampling — the data-MIXING stage
    of an LLM training pipeline (upsample curated sources, downsample
    bulk crawl): each row whose ``group_col`` has rate ``r`` is
    replicated ``floor(r)`` times, plus one more iff its content hash
    falls under ``frac(r)`` — so a source with rate 2.5 contributes
    every row twice and a deterministic half of its rows a third time,
    and rate 0.25 keeps a deterministic quarter.  Appends ``copy_col``
    (0-based epoch index per surviving row).

    Content-keyed like :func:`hash_split` and SQL-reproducible with the
    same primitive: ``u = substr(md5(salt || key), 1, 8)`` compared
    against the 8-hex-digit threshold ``format(int(frac(r) * 2^32),
    '08x')`` (fixed-width lowercase hex compares like the integer), and
    the copies unnested from ``generate_series(0, floor(r) - 1 +
    extra)``.  The same key draws the same verdict at any block
    layout, partition count or cluster size.  Null keys never take the
    fractional extra (SQL's NULL comparison falls through); groups
    absent from ``rates`` use ``default_rate``.  Stateless vectorized
    stage: replication is one ``np.repeat`` gather per batch — rows
    never pass through Python, and output size is bounded by
    ``ceil(max_rate)`` × the batch, which Ray re-splits downstream."""
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be non-negative")
    gnames = pa.array(list(rates), type=pa.string())
    gr = np.array([float(rates[g]) for g in rates], dtype=np.float64)
    salt_b = salt.encode()

    def _mix(tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        if n == 0:
            return tab.append_column(copy_col,
                                     pa.array([], type=pa.int64()))
        gi = pc.index_in(pc.cast(tab[group_col], pa.string()),
                         value_set=gnames)
        gi_np = gi.combine_chunks().fill_null(-1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.where(gi_np >= 0, gr[np.maximum(gi_np, 0)],
                        default_rate)
        whole = np.floor(rate)
        frac = rate - whole
        thr = np.floor(frac * 2.0**32).astype(np.uint64)
        key = pc.cast(tab[key_col], pa.string())
        u, null_mask = _md5_u32(key.combine_chunks(), salt_b)
        extra = u < thr
        if null_mask is not None:
            extra[null_mask] = False  # SQL NULL comparison: no extra
        copies = whole.astype(np.int64) + extra.astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), copies)
        starts = np.cumsum(copies) - copies
        copy_idx = (np.arange(len(idx), dtype=np.int64)
                    - np.repeat(starts, copies))
        out = tab.take(pa.array(idx))
        return out.append_column(copy_col, pa.array(copy_idx))

    return ds.map_batches(_mix, batch_format="pyarrow")


def weighted_sample(ds: "rd.Dataset", id_col: str, weight_col: str, *,
                    k: int, salt: str = "wrs") -> "rd.Dataset":
    """Deterministic weighted sample without replacement — A-Res
    (Efraimidis-Spirtsis): each row draws a content-keyed uniform
    ``u`` and the ``k`` rows with the smallest ``-ln(u)/w`` win, so a
    row's inclusion probability is proportional to its weight.
    Returns ``(id, w, score, rank)``, rank 1..k by (score, id).

    Content-keyed and SQL-mirrored like the rest of this module:
    ``u = (md5(salt || CAST(id AS VARCHAR))[:8 hex] + 1) / 2^32`` and
    the score is rounded half-away to 12 digits BEFORE ranking (ties
    then break on id), so the choice is bit-stable across block
    layouts, cluster sizes AND engines (ln differs in the last ulp
    between libms; the rounding absorbs it — the tfidf ranking uses
    the same trick).  Rows with null or non-positive weight are
    excluded (they can never win: w<=0 has no valid key).

    Scale shape: each block reduces to its own k best rows (one sort
    of k + block rows), the O(k x blocks) partials merge in a single
    final task — no shuffle of the corpus."""
    from . import round_half_away

    if k < 1:
        raise ValueError("k must be >= 1")
    salt_b = salt.encode()

    def _score(tab: pa.Table) -> pa.Table:
        ids = tab[id_col].combine_chunks()
        w = pc.cast(tab[weight_col], pa.float64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        u32, null_mask = _md5_u32(pc.cast(ids, pa.string()), salt_b)
        with np.errstate(divide="ignore", invalid="ignore"):
            u = (u32.astype(np.float64) + 1.0) / 4294967296.0
            score = round_half_away(-np.log(u) / w, 12)
        ok = np.isfinite(score) & (w > 0)
        if null_mask is not None:
            ok &= ~null_mask
        out = pa.table({
            id_col: ids, "w": pa.array(w),
            "score": pa.array(score)}).filter(pa.array(ok))
        return out.sort_by([("score", "ascending"),
                            (id_col, "ascending")]).slice(0, k)

    partials = ds.select_columns(
        list(dict.fromkeys([id_col, weight_col]))).map_batches(
        _score, batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("score", "ascending"),
                           (id_col, "ascending")]).slice(0, k)
        return tab.append_column(
            "rank", pa.array(np.arange(1, tab.num_rows + 1,
                                       dtype=np.int64)))

    return partials.repartition(1).map_batches(
        _final, batch_format="pyarrow")


@ray.remote(num_cpus=0.25)
def _ring_head(tab: "pa.Table", k: int) -> "pa.Table":
    return tab.slice(0, k)


def ring_neighbors(
    ds: "rd.Dataset", id_col: str, *, k: int = 2, salt: str = "",
) -> "rd.Dataset":
    """Deterministic NEGATIVE sampling for contrastive training: each
    row's ``k`` negatives are its successors on the content-keyed md5
    ring (sort by ``md5(salt || id)``, neighbors wrap past the end).
    Content-keyed means the pairing is identical across block
    layouts, cluster sizes and engines — SQL reproduces it with
    ``ROW_NUMBER() OVER (ORDER BY md5(id))`` modular joins — and
    approximately uniform (md5 order is independent of any data
    order), unlike "next row in file order" negatives that pair
    near-duplicates from the same shard.

    Distribution: one range-partitioned sort on the hex ring key;
    in-block successors are a vectorized shift, and the only
    cross-block data needed is each FOLLOWING block's first ``k``
    rows (plus the global head for the wrap) — O(blocks × k) rows
    through the driver, never the corpus.  Output
    ``(id, neighbor_id, ring_rank 1..k)``."""
    from . import md5_hex

    def _key(tab: "pa.Table") -> "pa.Table":
        sid = pc.cast(tab[id_col], pa.string())
        if salt:
            sid = pc.binary_join_element_wise(
                pa.array([salt] * tab.num_rows), sid, "")
        return pa.table({id_col: tab[id_col],
                         "__ring": md5_hex(sid)})

    s = ds.select_columns([id_col]).map_batches(
        _key, batch_format="pyarrow") \
        .sort(["__ring", id_col]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    heads = ray.get([_ring_head.remote(r, k) for r in refs])
    nonempty = [h for h in heads if h.num_rows]
    if not nonempty:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "ring_rank": pa.array([], pa.int64())}))
    # successor pool for block i = heads of blocks i+1.. then the
    # global head cycled (wrap); a ring smaller than k wraps several
    # times, and then every block is shorter than k so the heads hold
    # the ENTIRE ring — cycling them is cycling the ring
    head_rows = sum(h.num_rows for h in nonempty)
    wraps = -(-k // max(head_rows, 1)) + 1
    carries = []
    for i in range(len(refs)):
        pool = [heads[j] for j in range(i + 1, len(refs))] \
            + nonempty * wraps
        cat = pa.concat_tables(pool).slice(0, k)
        carries.append(cat)

    @ray.remote(num_cpus=0.5)
    def _emit(tab: "pa.Table", carry: "pa.Table",
              kk: int) -> "pa.Table":
        n = tab.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], tab.schema.field(id_col).type
                                 if id_col in tab.column_names
                                 else pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "ring_rank": pa.array([], pa.int64())})
        ids = tab[id_col]
        ext = pa.concat_arrays(
            [ids.combine_chunks(),
             carry[id_col].combine_chunks().cast(ids.type)])
        out_id, out_nb, out_rk = [], [], []
        for j in range(1, kk + 1):
            out_id.append(ids.combine_chunks())
            out_nb.append(ext.slice(j, n))
            out_rk.append(pa.array(np.full(n, j, dtype=np.int64)))
        return pa.table({
            id_col: pa.concat_arrays(out_id),
            "neighbor_id": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_nb]),
            "ring_rank": pa.concat_arrays(out_rk)})

    out_refs = [_emit.remote(r, c, k) for r, c in zip(refs, carries)]
    return rd.from_arrow_refs(out_refs)
