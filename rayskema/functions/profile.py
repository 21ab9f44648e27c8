"""Per-column table profiling: one row per column with row/null counts,
exact distinct cardinality and min/max — the "column stats" surface of a
validation engine (reference analogue: goskema computes per-field
aggregates in-memory, e.g. UniqueBy's value map rules/rules.go:116-135;
here the same facts come from mergeable per-batch partials).

Scale shape: counts and min/max are embarrassingly mergeable map-side
partials (one tiny row per column per block — no data shuffle at all).
Exact distinct is inherently a shuffle of the distinct value set; values
are pre-deduplicated inside every batch before the exchange, so the
shuffled volume is bounded by per-block cardinality, not row count (a
low-cardinality column ships a handful of strings per block regardless
of table size).  For 100 TB-scale profiling where exactness is not
required, the HyperLogLog profile in the validate pipeline
(state/sketches.py) is the cheap alternative; this operator is the
exact form."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..plan import limit_arrow_threads
from ..pipelines.relational import bucketed_map_groups

_NUM_KINDS = (pa.types.is_integer, pa.types.is_floating,
              pa.types.is_decimal)


def _is_numeric(t: pa.DataType) -> bool:
    return any(k(t) for k in _NUM_KINDS)


def profile_columns(
    ds: "rd.Dataset", columns: Sequence[str], *, buckets: int = 16,
) -> pa.Table:
    """Profile ``columns`` of ``ds``: returns a table with one row per
    column — (col, n, n_null, n_distinct, min_num, max_num, min_str,
    max_str).  Numeric columns report min/max as float64 (min_str/
    max_str null); other columns report lexicographic (bytewise)
    min/max as strings.  ``n_distinct`` is EXACT and excludes nulls
    (SQL ``count(DISTINCT col)`` semantics)."""
    columns = list(columns)

    def _partials(tab: pa.Table) -> pa.Table:
        limit_arrow_threads()
        rows = {"col": [], "n": [], "n_null": [], "min_num": [],
                "max_num": [], "min_str": [], "max_str": []}
        for c in columns:
            arr = tab[c]
            rows["col"].append(c)
            rows["n"].append(tab.num_rows)
            rows["n_null"].append(arr.null_count)
            mn = mx = None
            if tab.num_rows > arr.null_count:
                mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if _is_numeric(arr.type):
                rows["min_num"].append(
                    None if mn is None else float(mn))
                rows["max_num"].append(
                    None if mx is None else float(mx))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(None if mn is None else str(mn))
                rows["max_str"].append(None if mx is None else str(mx))
        return pa.table({
            "col": pa.array(rows["col"], type=pa.string()),
            "n": pa.array(rows["n"], type=pa.int64()),
            "n_null": pa.array(rows["n_null"], type=pa.int64()),
            "min_num": pa.array(rows["min_num"], type=pa.float64()),
            "max_num": pa.array(rows["max_num"], type=pa.float64()),
            "min_str": pa.array(rows["min_str"], type=pa.string()),
            "max_str": pa.array(rows["max_str"], type=pa.string()),
        })

    def _distincts(tab: pa.Table) -> pa.Table:
        limit_arrow_threads()
        parts = []
        for c in columns:
            u = pc.unique(tab[c].combine_chunks())
            u = u.filter(pc.is_valid(u))
            parts.append(pa.table({
                "col": pa.array(np.full(len(u), c), type=pa.string()),
                "v": pc.cast(u, pa.string()),
            }))
        return pa.concat_tables(parts)

    src = ds.select_columns(columns)
    part_ds = src.map_batches(_partials, batch_format="pyarrow")
    dist_ds = src.map_batches(_distincts, batch_format="pyarrow")

    # per-(col,value)-bucket dedup, then a per-bucket per-col count —
    # the second reduce is over <= buckets x n_cols tiny rows
    def _count_bucket(tab: pa.Table) -> pa.Table:
        u = tab.group_by(["col", "v"]).aggregate([]).group_by(
            ["col"]).aggregate([("v", "count")])
        return u.rename_columns(["col", "nd"])

    dist_counts = bucketed_map_groups(dist_ds, ["col", "v"],
                                      _count_bucket, buckets=buckets,
                                      sort_within=False)

    stats_tabs = [t for t in ray.get(part_ds.to_arrow_refs())
                  if t.num_rows]
    dist_tabs = [t for t in ray.get(dist_counts.to_arrow_refs())
                 if t.num_rows]
    stats = pa.concat_tables(stats_tabs) if stats_tabs else _partials(
        pa.table({c: pa.array([], type=pa.string()) for c in columns}))
    merged = stats.group_by(["col"]).aggregate(
        [("n", "sum"), ("n_null", "sum"), ("min_num", "min"),
         ("max_num", "max"), ("min_str", "min"), ("max_str", "max")]
    ).rename_columns(["col", "n", "n_null", "min_num", "max_num",
                      "min_str", "max_str"])
    if dist_tabs:
        d = pa.concat_tables(dist_tabs).group_by(["col"]).aggregate(
            [("nd", "sum")]).rename_columns(["col", "n_distinct"])
    else:
        d = pa.table({"col": pa.array([], type=pa.string()),
                      "n_distinct": pa.array([], type=pa.int64())})
    nd = pc.index_in(merged["col"], value_set=d["col"])
    nd_vals = d["n_distinct"].take(nd) if d.num_rows else pa.nulls(
        merged.num_rows, type=pa.int64())
    out = merged.append_column(
        "n_distinct", pc.fill_null(pc.cast(nd_vals, pa.int64()), 0))
    return out.select(["col", "n", "n_null", "n_distinct", "min_num",
                       "max_num", "min_str", "max_str"]).sort_by("col")
