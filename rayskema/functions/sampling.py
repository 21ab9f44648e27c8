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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..state.sketches import _hash64, hash_strings


def stratified_sample(ds: "rd.Dataset", group_col: str, id_col: str,
                      text_col: str, *, k: int = 5,
                      buckets: int = 64) -> "rd.Dataset":
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
