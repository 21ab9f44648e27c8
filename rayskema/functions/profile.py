"""Per-column table profiling: one row per column with row/null counts,
exact distinct cardinality and min/max — the "column stats" surface of a
validation engine (reference analogue: goskema computes per-field
aggregates in-memory, e.g. UniqueBy's value map rules/rules.go:116-135;
here the same facts come from mergeable per-batch partials).

Scale shape: ONE scan of the pruned columns.  Every block emits (a) one
tiny stats partial per column (counts + min/max — no shuffle cost to
speak of) and (b) its per-block-deduplicated distinct values, tagged
rows of one union schema; both ride a single (col, value) hash
exchange, so the shuffled volume is bounded by per-block cardinality,
never row count (a low-cardinality column ships a handful of strings
per block regardless of table size).  For 100 TB-scale profiling where
exactness is not required, the HyperLogLog profile in the validate
pipeline (state/sketches.py) is the cheap alternative; this operator is
the exact form."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..plan import limit_arrow_threads
from ..pipelines.relational import agg_named, bucketed_map_groups

_NUM_KINDS = (pa.types.is_integer, pa.types.is_floating,
              pa.types.is_decimal)


def _is_numeric(t: pa.DataType) -> bool:
    return any(k(t) for k in _NUM_KINDS)


def _empty_out() -> pa.Table:
    return pa.table({
        "col": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
        "n_null": pa.array([], type=pa.int64()),
        "min_num": pa.array([], type=pa.float64()),
        "max_num": pa.array([], type=pa.float64()),
        "min_str": pa.array([], type=pa.string()),
        "max_str": pa.array([], type=pa.string()),
    })


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
        parts = []
        for c in columns:
            arr = tab[c]
            mn = mx = None
            if tab.num_rows > arr.null_count:
                mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            numeric = _is_numeric(arr.type)
            # stats partial row ("s"): v is a fixed sentinel so all of
            # a column's partials co-locate in one bucket
            parts.append(pa.table({
                "col": pa.array([c], type=pa.string()),
                "kind": pa.array(["s"]),
                "v": pa.array([""]),
                "n": pa.array([tab.num_rows], type=pa.int64()),
                "n_null": pa.array([arr.null_count], type=pa.int64()),
                "min_num": pa.array(
                    [float(mn) if numeric and mn is not None else None],
                    type=pa.float64()),
                "max_num": pa.array(
                    [float(mx) if numeric and mx is not None else None],
                    type=pa.float64()),
                "min_str": pa.array(
                    [None if numeric or mn is None else str(mn)],
                    type=pa.string()),
                "max_str": pa.array(
                    [None if numeric or mx is None else str(mx)],
                    type=pa.string()),
            }))
            # distinct-value rows ("d"): deduped per block
            u = pc.unique(arr.combine_chunks())
            u = u.filter(pc.is_valid(u))
            k = len(u)
            parts.append(pa.table({
                "col": pa.array(np.full(k, c), type=pa.string()),
                "kind": pa.array(np.full(k, "d"), type=pa.string()),
                "v": pc.cast(u, pa.string()),
                "n": pa.nulls(k, type=pa.int64()),
                "n_null": pa.nulls(k, type=pa.int64()),
                "min_num": pa.nulls(k, type=pa.float64()),
                "max_num": pa.nulls(k, type=pa.float64()),
                "min_str": pa.nulls(k, type=pa.string()),
                "max_str": pa.nulls(k, type=pa.string()),
            }))
        return pa.concat_tables(parts)

    fused = ds.select_columns(columns).map_batches(
        _partials, batch_format="pyarrow")

    # one (col, v) hash exchange carries both kinds; each bucket task
    # dedup-counts its distinct slice and pre-merges its stats partials
    def _reduce_bucket(tab: pa.Table) -> pa.Table:
        limit_arrow_threads()
        if tab.num_rows == 0 or "kind" not in tab.column_names:
            return _empty_out()
        is_d = pc.equal(tab["kind"], "d")
        d = tab.filter(is_d)
        s = tab.filter(pc.invert(is_d))
        out = []
        if d.num_rows:
            nd = agg_named(
                d.select(["col", "v"]).group_by(["col", "v"])
                .aggregate([]), ["col"], [("v", "count")], ["n"])
            k = nd.num_rows
            out.append(pa.table({
                "col": nd["col"],
                "kind": pa.array(np.full(k, "d"), type=pa.string()),
                "v": pa.nulls(k, type=pa.string()),
                "n": pc.cast(nd["n"], pa.int64()),
                "n_null": pa.nulls(k, type=pa.int64()),
                "min_num": pa.nulls(k, type=pa.float64()),
                "max_num": pa.nulls(k, type=pa.float64()),
                "min_str": pa.nulls(k, type=pa.string()),
                "max_str": pa.nulls(k, type=pa.string()),
            }))
        if s.num_rows:
            m = agg_named(
                s, ["col"],
                [("n", "sum"), ("n_null", "sum"), ("min_num", "min"),
                 ("max_num", "max"), ("min_str", "min"),
                 ("max_str", "max")],
                ["n", "n_null", "min_num", "max_num", "min_str",
                 "max_str"])
            k = m.num_rows
            out.append(pa.table({
                "col": m["col"],
                "kind": pa.array(np.full(k, "s"), type=pa.string()),
                "v": pa.nulls(k, type=pa.string()),
                "n": m["n"], "n_null": m["n_null"],
                "min_num": m["min_num"], "max_num": m["max_num"],
                "min_str": m["min_str"], "max_str": m["max_str"],
            }))
        return pa.concat_tables(out) if out else _empty_out()

    reduced = bucketed_map_groups(fused, ["col", "v"], _reduce_bucket,
                                  buckets=buckets, sort_within=False)
    tabs = [t for t in ray.get(reduced.to_arrow_refs()) if t.num_rows
            and "kind" in t.column_names]
    if not tabs:
        both = _empty_out()
    else:
        both = pa.concat_tables(tabs)

    is_d = pc.equal(both["kind"], "d")
    d = both.filter(is_d)
    s = both.filter(pc.invert(is_d))
    merged = agg_named(
        s, ["col"],
        [("n", "sum"), ("n_null", "sum"), ("min_num", "min"),
         ("max_num", "max"), ("min_str", "min"), ("max_str", "max")],
        ["n", "n_null", "min_num", "max_num", "min_str", "max_str"])
    dist = agg_named(d, ["col"], [("n", "sum")], ["n_distinct"])
    nd_idx = pc.index_in(merged["col"], value_set=dist["col"])
    nd_vals = dist["n_distinct"].take(nd_idx) if dist.num_rows else \
        pa.nulls(merged.num_rows, type=pa.int64())
    out = merged.append_column(
        "n_distinct", pc.fill_null(pc.cast(nd_vals, pa.int64()), 0))
    return out.select(["col", "n", "n_null", "n_distinct", "min_num",
                       "max_num", "min_str", "max_str"]).sort_by("col")


def paired_moments_corr(
    ds: "rd.Dataset", x_col: str, y_col: str, *, scale_x: int = 1,
    scale_y: int = 1,
) -> pa.Table:
    """Exact distributed Pearson correlation of two numeric columns:
    one scan emitting per-block integer moment partials
    ``(n, sum_x, sum_y, sum_xx, sum_yy, sum_xy)``, merged driver-side
    with Python arbitrary-precision ints, one float expression at the
    end — so the result is bit-reproducible at any parallelism and by
    any SQL engine that evaluates the same closed form over exact
    sums (HUGEINT arithmetic in DuckDB).

    ``scale_x`` / ``scale_y`` convert decimal-valued doubles to exact
    integers (e.g. 100 for cents); values are rounded half-AWAY after
    scaling (SQL ROUND semantics, so an exact .5 rounds the same on
    both engines).  Rows where either side is null are dropped (SQL
    corr() semantics).  Returns a one-row table ``(n, corr)``."""
    from . import round_half_away

    def _partial(tab: pa.Table) -> pa.Table:
        x = tab[x_col]
        y = tab[y_col]
        keep = pc.and_(pc.is_valid(x), pc.is_valid(y))
        x = pc.filter(x, keep)
        y = pc.filter(y, keep)
        xv = round_half_away(
            pc.multiply(pc.cast(x, pa.float64()), float(scale_x))
            .to_numpy(zero_copy_only=False), 0).astype(np.int64)
        yv = round_half_away(
            pc.multiply(pc.cast(y, pa.float64()), float(scale_y))
            .to_numpy(zero_copy_only=False), 0).astype(np.int64)
        xo = xv.astype(object)  # arbitrary-precision products/sums
        yo = yv.astype(object)
        return pa.table({
            "n": pa.array([len(xv)], type=pa.int64()),
            "sx": pa.array([str(xo.sum() if len(xv) else 0)]),
            "sy": pa.array([str(yo.sum() if len(yv) else 0)]),
            "sxx": pa.array([str((xo * xo).sum() if len(xv) else 0)]),
            "syy": pa.array([str((yo * yo).sum() if len(yv) else 0)]),
            "sxy": pa.array([str((xo * yo).sum() if len(xv) else 0)]),
        })

    parts = ds.select_columns([x_col, y_col]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    syy = sum(int(p["syy"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    import math
    corr = (float("nan") if dx == 0 or dy == 0
            else float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))))
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "corr": pa.array([corr], type=pa.float64())})
