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
    ds: "rd.Dataset", columns: Sequence[str], *, buckets: int | None = None,
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


_LIMB_MASK = np.uint64(0xFFFFFFFF)
_SH32 = np.uint64(32)


def _abs_max(x: np.ndarray) -> int:
    """max(|x|) as a Python int (no int64 wrap on |int64.min|)."""
    return max(abs(int(x.max())), abs(int(x.min())))


def _exact_sum(x: np.ndarray) -> int:
    """Exact Σx over an int64 array as a Python int, vectorized.
    Tiered: (a) n·max|x| fits int64 → one native sum; (b) chunked
    summation — per-chunk int64 sums are provably exact at chunk
    length 2^63/max|x|, recombined with Python big-int arithmetic over
    the n/chunk partials; (c) magnitudes near 2^63 → 32-bit limb sums
    in uint64 (wrap-free for any block under 2^32 rows).  No
    object-dtype per-element arithmetic on any path."""
    n = len(x)
    if n == 0:
        return 0
    m = _abs_max(x)
    if n * m < 2 ** 63:
        return int(x.sum())
    k = (2 ** 63 - 1) // m
    if k >= 2:
        # per-chunk int64 sums are exact (|chunk sum| <= k*m < 2^63);
        # recurse on the ~n/k partials (next level either native-sums
        # or limb-reduces them — never a Python loop over elements)
        sums = np.add.reduceat(x, np.arange(0, n, k))
        return _exact_sum(sums)
    return _limb_sum(x)


def _limb_sum(x: np.ndarray) -> int:
    """Exact Σx for arbitrary int64 magnitudes: sign-separated 32-bit
    limb sums in uint64 (wrap-free under 2^32 rows), recombined once."""
    neg_u = (x < 0).astype(np.uint64)
    # abs(int64.min) wraps in int64 but the uint64 reinterpretation is
    # exactly |x|, so the full domain is covered
    a = np.abs(x).astype(np.uint64)
    total = 0
    for i, d in enumerate((a & _LIMB_MASK, a >> _SH32)):
        s_all = int(d.sum(dtype=np.uint64))
        s_neg = int((d * neg_u).sum(dtype=np.uint64))
        total += (s_all - 2 * s_neg) << (32 * i)
    return total


def _exact_dot(x: np.ndarray, y: np.ndarray) -> int:
    """Exact Σ x·y over int64 arrays as a Python int, vectorized.
    Tiered: (a) n·max|x|·max|y| fits int64 → one native dot (the
    common case for integer-cents data); (b) every PRODUCT fits int64
    → native multiply + chunked exact summation (:func:`_exact_sum`);
    (c) extreme magnitudes → each |x|·|y| decomposed into four
    base-2^32 digits via limb products (all uint64, carries propagated
    before summation, so no wrap anywhere), digit columns reduced as
    (total − 2·negative-sign-total) and recombined with Python big-int
    arithmetic ONCE per block."""
    if len(x) == 0:
        return 0
    mx, my = _abs_max(x), _abs_max(y)
    if len(x) * mx * my < 2 ** 63:
        return int(np.dot(x, y))
    if mx * my < 2 ** 63:
        return _exact_sum(x * y)
    neg_u = ((x < 0) ^ (y < 0)).astype(np.uint64)
    a = np.abs(x).astype(np.uint64)
    b = np.abs(y).astype(np.uint64)
    a_hi, a_lo = a >> _SH32, a & _LIMB_MASK
    b_hi, b_lo = b >> _SH32, b & _LIMB_MASK
    t0 = a_lo * b_lo                      # < 2^64
    t1 = a_hi * b_lo + a_lo * b_hi        # each < 2^63, sum < 2^64
    t2 = a_hi * b_hi                      # < 2^62
    d0 = t0 & _LIMB_MASK
    m = t1 + (t0 >> _SH32)                # < 2^64 (t1 < 2^64 - 2^33)
    d1 = m & _LIMB_MASK
    u = t2 + (m >> _SH32)                 # < 2^63
    total = 0
    for k, d in enumerate((d0, d1, u & _LIMB_MASK, u >> _SH32)):
        s_all = int(d.sum(dtype=np.uint64))
        s_neg = int((d * neg_u).sum(dtype=np.uint64))
        total += (s_all - 2 * s_neg) << (32 * k)
    return total


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
        # vectorized exact accumulation (32-bit limb decomposition);
        # arbitrary-precision arithmetic happens once per block, not
        # per element — the merge across block partials stays big-int
        return pa.table({
            "n": pa.array([len(xv)], type=pa.int64()),
            "sx": pa.array([str(_exact_sum(xv))]),
            "sy": pa.array([str(_exact_sum(yv))]),
            "sxx": pa.array([str(_exact_dot(xv, xv))]),
            "syy": pa.array([str(_exact_dot(yv, yv))]),
            "sxy": pa.array([str(_exact_dot(xv, yv))]),
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


def group_sigma_outliers(
    ds: "rd.Dataset", group_col: str, value_col: str, *, k: int = 3,
    scale: int = 1, out_col: str | None = None,
) -> "rd.Dataset":
    """Rows whose value lies more than ``k`` population standard
    deviations from its GROUP's mean — with an EXACT decision
    boundary, so the result is bit-identical to SQL's
    ``(v·n − s)² > k²·(n·ss − s²)`` predicate at any parallelism.

    The z-score test is never evaluated in floating point: one pruned
    scan emits per-(block, group) integer moment partials
    ``(n, Σv, Σv²)`` (vectorized 32-bit-limb exact sums — the
    ``paired_moments_corr`` machinery), the driver merges the
    O(groups × blocks) partials with Python big-int arithmetic and
    derives, per group, the largest/smallest NON-outlier integer value
    via ``isqrt`` (floor of an irrational bound computed exactly — no
    float ever touches the comparison).  The O(groups) threshold table
    broadcasts into a second filtering pass as two int64 lookups per
    row.  Driver state is O(groups × blocks) partial rows, never data.

    ``scale`` converts decimal-valued doubles to exact integers (100
    for cents) with half-AWAY rounding (SQL ROUND semantics).  Null
    values, NaN/±inf values (which have no integer image and would
    poison the exact sums) and null group keys are never outliers and
    never contribute to the moments (SQL comparison / join
    semantics).  A constant group (σ = 0) flags nothing — every
    value equals the mean — exactly as the SQL predicate does (the
    degenerate-σ clause only matters for near-constant groups, where
    the integer test still decides exactly).  Output: the input rows
    that are outliers, with the scaled integer value appended as
    ``out_col`` (default ``{value_col}_scaled``).

    Reference analogue: goskema's Range checks are static bounds
    (rules/rules.go); this is the data-derived robust-bound form a
    drift/quality pipeline needs."""
    import math

    from . import round_half_away

    out_col = out_col or f"{value_col}_scaled"

    def _scaled(col: pa.ChunkedArray | pa.Array) \
            -> tuple[np.ndarray, np.ndarray]:
        """(int64 values, usable-mask).  Unusable = null, or a
        non-finite float (NaN/inf would cast to int64 UB and poison
        the exact sums); masked positions hold 0."""
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False) \
            .astype(bool)
        if pa.types.is_integer(col.type) and scale == 1:
            v = pc.fill_null(pc.cast(col, pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return v, valid
        f = pc.multiply(pc.cast(col, pa.float64(), safe=False),
                        float(scale)).to_numpy(zero_copy_only=False)
        usable = valid & np.isfinite(f)
        f = np.where(usable, f, 0.0)
        return round_half_away(f, 0).astype(np.int64), usable

    def _partial(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[group_col]))
        v, usable = _scaled(tab[value_col])
        tab = tab.filter(pa.array(usable))
        v = v[usable]
        g = tab[group_col].to_numpy(zero_copy_only=False)
        # one exact-sum call per distinct group in the block (an
        # O(groups)-iteration loop, never per-row)
        uniq, inv = np.unique(g, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        rows = {"g": [], "n": [], "s": [], "ss": []}
        for i, gv in enumerate(uniq):
            seg = v[order[bounds[i]:bounds[i + 1]]]
            rows["g"].append(gv)
            rows["n"].append(len(seg))
            rows["s"].append(str(_exact_sum(seg)))
            rows["ss"].append(str(_exact_dot(seg, seg)))
        return pa.table({
            "g": pa.array(rows["g"], type=tab[group_col].type),
            "n": pa.array(rows["n"], type=pa.int64()),
            "s": pa.array(rows["s"]), "ss": pa.array(rows["ss"])})

    parts = ds.select_columns([group_col, value_col]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    stats: dict = {}
    for p in parts:
        n0, s0, ss0 = stats.get(p["g"], (0, 0, 0))
        stats[p["g"]] = (n0 + int(p["n"]), s0 + int(p["s"]),
                         ss0 + int(p["ss"]))

    i64_max, i64_min = 2 ** 63 - 1, -(2 ** 63)
    groups, hi_b, lo_b = [], [], []
    for gv, (n, s, ss) in stats.items():
        if n == 0:
            continue
        k2x = k * k * (n * ss - s * s)
        r = math.isqrt(k2x)
        # smallest upper outlier: v·n − s > 0 and (v·n − s)² > k²X;
        # cand+2 provably satisfies, so the window always resolves
        cand = (s + r) // n
        t_hi = next(v for v in range(cand - 2, cand + 4)
                    if v * n - s > 0 and (v * n - s) ** 2 > k2x)
        cand = (s - r) // n
        t_lo = next(v for v in range(cand + 2, cand - 4, -1)
                    if s - v * n > 0 and (s - v * n) ** 2 > k2x)
        groups.append(gv)
        # beyond-int64 bounds mean "no outlier on that side" for int64
        # values, so clamping preserves semantics exactly
        hi_b.append(min(t_hi - 1, i64_max))
        lo_b.append(max(t_lo + 1, i64_min))

    thresholds = ray.put((groups, np.array(hi_b, dtype=np.int64),
                          np.array(lo_b, dtype=np.int64)))

    def _filter(tab: pa.Table) -> pa.Table:
        gs, hi, lo = ray.get(thresholds)
        garr = pa.array(gs, type=tab[group_col].type)
        v, usable = _scaled(tab[value_col])
        idx = pc.index_in(tab[group_col], value_set=garr) \
            .to_numpy(zero_copy_only=False)
        found = ~np.isnan(idx) if idx.dtype.kind == "f" else \
            np.ones(len(idx), dtype=bool)
        pos = np.where(found, idx, 0).astype(np.int64)
        vhi = hi[pos]
        vlo = lo[pos]
        out = found & usable & ((v > vhi) | (v < vlo))
        tab = tab.append_column(out_col, pa.array(v, type=pa.int64()))
        return tab.filter(pa.array(out))

    return ds.map_batches(_filter, batch_format="pyarrow")


def group_mad(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    digits: int | None = 6, buckets: int | None = None,
) -> "rd.Dataset":
    """Median absolute deviation per group — the robust scale
    estimator quality filters reach for when k·σ is too
    outlier-sensitive: ``(group, median, mad)`` with
    ``mad = median(|x − median(x)|)``, both medians the interpolated
    (quantile_cont-0.5) form DuckDB's ``mad()`` evaluates, so
    ``round(·, digits)`` hash-matches SQL ``median()``/``mad()``.

    Two bucketed exchanges sharing the group key (medians need the
    group co-located — the σ-based :func:`group_sigma_outliers` is
    the single-pass alternative); between them the O(groups) median
    table broadcasts into a vectorized |x − med| map — never a
    per-group Python pass.  Nulls are excluded (SQL aggregate
    semantics); an empty group disappears."""
    from ..pipelines.relational import group_quantile_cont

    med = group_quantile_cont(ds, group_col, value_col, [0.5],
                              digits=None, buckets=buckets)
    med_rows = med.take_all()
    gvals = [r[group_col] for r in med_rows]
    mvals = np.array([r["value"] for r in med_rows], dtype=np.float64)
    med_ref = ray.put((gvals, mvals))

    def _absdev(tab: pa.Table) -> pa.Table:
        gs, ms = ray.get(med_ref)
        garr = pa.array(gs, type=tab[group_col].type)
        idx = pc.index_in(tab[group_col], value_set=garr) \
            .to_numpy(zero_copy_only=False)
        found = ~np.isnan(idx) if idx.dtype.kind == "f" else \
            np.ones(len(idx), dtype=bool)
        pos = np.where(found, idx, 0).astype(np.int64)
        v = pc.cast(tab[value_col], pa.float64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        dev = np.abs(v - ms[pos])
        keep = found & ~np.isnan(v)
        out = pa.table({
            group_col: tab[group_col],
            "dev": pa.array(dev)})
        return out.filter(pa.array(keep))

    devs = ds.select_columns([group_col, value_col]).map_batches(
        _absdev, batch_format="pyarrow")
    mad = group_quantile_cont(devs, group_col, "dev", [0.5],
                              digits=None, buckets=buckets)
    med_map = {g: m for g, m in zip(gvals, mvals)}

    def _shape(tab: pa.Table) -> pa.Table:
        gs = tab[group_col].to_pylist()
        med_col = np.array([med_map[g] for g in gs], dtype=np.float64)
        mad_col = pc.cast(tab["value"], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        if digits is not None:
            med_col = np.round(med_col, digits)
            mad_col = np.round(mad_col, digits)
        return pa.table({
            group_col: tab[group_col],
            "median": pa.array(med_col),
            "mad": pa.array(mad_col)})

    return mad.map_batches(_shape, batch_format="pyarrow")


def group_winsorize(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    lo_q: float = 0.01, hi_q: float = 0.99, out_col: str | None = None,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Winsorize ``value_col`` within each group: values below the
    group's ``lo_q`` exact rank quantile clip up to it, above ``hi_q``
    clip down — the standard heavy-tail taming step before
    scale-sensitive statistics.  Appends the clipped column as
    ``out_col`` (default ``{value_col}_wins``); null values stay null.

    Thresholds are the EXACT type-1 rank quantiles
    (:func:`~rayskema.pipelines.relational.group_quantiles` — SQL
    row_number/ceil reproducible), computed in one grouped exchange;
    the O(groups × 2) threshold table broadcasts into a vectorized
    clamp pass (two ``pc.min/max_element_wise`` kernels) — the data
    itself never shuffles.  Integer columns round-trip through
    float64 in the clamp (exact below 2^53 — fine for cents-scale
    data; the thresholds themselves are actual data values)."""
    from ..pipelines.relational import group_quantiles

    out_col = out_col or f"{value_col}_wins"
    if not (0.0 < lo_q <= hi_q <= 1.0):
        raise ValueError("need 0 < lo_q <= hi_q <= 1")

    qs = [lo_q] if lo_q == hi_q else [lo_q, hi_q]
    thr = group_quantiles(ds, group_col, value_col, qs,
                          buckets=buckets).take_all()
    lo_map: dict = {}
    hi_map: dict = {}
    for r in thr:
        if r["q"] == lo_q:
            lo_map[r[group_col]] = r["value"]
        if r["q"] == hi_q:
            hi_map[r[group_col]] = r["value"]
    groups = sorted(lo_map, key=repr)
    lo_arr = np.array([lo_map[g] for g in groups], dtype=np.float64)
    hi_arr = np.array([hi_map[g] for g in groups], dtype=np.float64)
    ref = ray.put((groups, lo_arr, hi_arr))

    def _clip(tab: pa.Table) -> pa.Table:
        gs, lo, hi = ray.get(ref)
        garr = pa.array(gs, type=tab[group_col].type)
        idx = pc.index_in(tab[group_col], value_set=garr) \
            .to_numpy(zero_copy_only=False)
        found = ~np.isnan(idx) if idx.dtype.kind == "f" else \
            np.ones(len(idx), dtype=bool)
        pos = np.where(found, idx, 0).astype(np.int64)
        v = tab[value_col]
        is_int = pa.types.is_integer(v.type)
        vf = pc.cast(v, pa.float64(), safe=False)
        clipped = pc.max_element_wise(
            pc.min_element_wise(vf, pa.array(hi_arr[pos]),
                                skip_nulls=False),
            pa.array(lo_arr[pos]), skip_nulls=False)
        # groups absent from the threshold table (all-null) pass through
        clipped = pc.if_else(pa.array(found), clipped, vf)
        if is_int:
            clipped = pc.cast(pc.round(clipped), v.type)
        return tab.append_column(out_col, clipped)

    return ds.map_batches(_clip, batch_format="pyarrow")


def fd_check(ds: "rd.Dataset", det_cols: Sequence[str],
             dep_col: str, *, buckets: int | None = None) -> pa.Table:
    """Functional-dependency profiling: does ``det_cols → dep_col``
    hold?  Returns one row ``(n_groups, n_violating, max_distinct)``
    — determinant groups, groups carrying >1 distinct dependent value
    (FD violations), and the worst group's distinct count.  SQL
    mirror: ``count(DISTINCT dep)`` per determinant group, reduced.
    NULL dependents count as one distinct value (SQL count(DISTINCT)
    ignores nulls — this uses the GROUP BY convention instead: null
    is a value; pre-filter if the SQL convention is wanted).

    One exchange: blocks pre-dedup their (det, dep) pairs, the hash
    exchange co-locates each determinant's pairs, and every bucket
    reduces straight to THREE scalars — the driver concatenates
    bucket partials, never rows."""
    det_cols = list(det_cols)
    cols = det_cols + [dep_col]

    def _pairs(tab: pa.Table) -> pa.Table:
        return tab.select(cols).group_by(cols).aggregate([])

    def _reduce(tab: pa.Table) -> pa.Table:
        tab = _pairs(tab)                     # cross-block dedup
        if not tab.num_rows:
            z = pa.array([0], pa.int64())
            return pa.table({"n_groups": z, "n_violating": z,
                             "max_distinct": z})
        tab = tab.sort_by([(c, "ascending") for c in cols])
        from ..pipelines.relational import segment_starts
        new_g = segment_starts(tab, det_cols)
        starts = np.flatnonzero(new_g)
        nd = np.diff(np.append(starts, tab.num_rows))
        return pa.table({
            "n_groups": pa.array([len(starts)], pa.int64()),
            "n_violating": pa.array([int((nd > 1).sum())], pa.int64()),
            "max_distinct": pa.array([int(nd.max())], pa.int64())})

    parts = bucketed_map_groups(
        ds.select_columns(cols).map_batches(
            _pairs, batch_format="pyarrow"),
        det_cols, _reduce, buckets=buckets, sort_within=False)
    acc = [r for r in parts.take_all()]
    return pa.table({
        "n_groups": pa.array([sum(r["n_groups"] for r in acc)],
                             pa.int64()),
        "n_violating": pa.array([sum(r["n_violating"] for r in acc)],
                                pa.int64()),
        "max_distinct": pa.array(
            [max((r["max_distinct"] for r in acc), default=0)],
            pa.int64())})


@ray.remote(num_cpus=0.5)
def _block_len(tab: pa.Table) -> int:
    return tab.num_rows


@ray.remote(num_cpus=0.5)
def _gini_partial(tab: pa.Table, offset: int) -> tuple:
    """(Σ i·x, Σ x, max x) over one sorted block, i global 1-based."""
    limit_arrow_threads()
    # an empty exchange block can arrive schema-less
    if "x" not in tab.column_names or not tab.num_rows:
        return (0, 0, 0)
    x = tab["x"].combine_chunks().to_numpy(zero_copy_only=False)
    i = np.arange(1, len(x) + 1, dtype=np.int64) + offset
    return (int((i * x).sum()), int(x.sum()), int(x.max()))


def key_skew_stats(ds: "rd.Dataset", key_cols: Sequence[str], *,
                   buckets: int | None = None) -> pa.Table:
    """KEY-SKEW diagnostics — the numbers that predict whether a
    shuffle on ``key_cols`` will hot-spot: one row ``(n_keys, n_rows,
    max_key_rows, top1_share_ppm, gini_ppm)``.  The Gini coefficient
    of the per-key row counts is computed EXACTLY in integer
    arithmetic (``gini = (2·Σi·x − (n+1)·Σx) / (n·Σx)`` over
    ascending-sorted counts, reported floor-scaled to ppm) — 0 means
    perfectly even keys, →1 means one key owns the table; the formula
    is tie-invariant, so no tie-break column is needed.

    Scale shape: per-key counts via one map-side-partial exchange;
    the counts table (|keys| rows) takes Ray Data's distributed range
    sort; the global rank ``i`` each sorted count needs is recovered
    WITHOUT moving data to the driver — block lengths come from tiny
    remote ``len`` tasks, offsets are a |blocks|-sized driver prefix
    sum, and each block reduces to three scalars in place (the
    zipWithIndex pattern; raw Ray tasks because a batch cannot know
    its global position).  int64 partials bound the exact range to
    Σi·x < 2^63 — beyond that the ppm answer saturates meaninglessly
    before the arithmetic does."""
    key_cols = list(key_cols)

    def _partial(tab: pa.Table) -> pa.Table:
        return agg_named(
            tab.select(key_cols).append_column(
                "_one", pa.array(np.ones(tab.num_rows, np.int64))),
            key_cols, [("_one", "sum")], ["x"])

    counts = bucketed_map_groups(
        ds.select_columns(key_cols).map_batches(
            _partial, batch_format="pyarrow"),
        key_cols,
        lambda t: agg_named(t, key_cols, [("x", "sum")], ["x"]),
        buckets=buckets, sort_within=False)

    s = counts.select_columns(["x"]).sort("x").materialize()
    refs = s.to_arrow_refs()
    lens = ray.get([_block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    parts = ray.get([_gini_partial.remote(r, int(off))
                     for r, off in zip(refs, offsets[:-1])])
    n = int(offsets[-1])
    s_ix = sum(p[0] for p in parts)
    s_x = sum(p[1] for p in parts)
    mx = max((p[2] for p in parts), default=0)
    gini = ((2 * s_ix - (n + 1) * s_x) * 1_000_000) // (n * s_x) \
        if n and s_x else None
    top1 = (mx * 1_000_000) // s_x if s_x else None
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "n_rows": pa.array([s_x], pa.int64()),
        "max_key_rows": pa.array([mx], pa.int64()),
        "top1_share_ppm": pa.array([top1], pa.int64()),
        "gini_ppm": pa.array([gini], pa.int64())})


_CHECKSUM_MOD = 1 << 61          # sums stay positive BIGINTs in SQL


def table_checksum(ds: "rd.Dataset", cols: Sequence[str]) -> pa.Table:
    """ORDER-INVARIANT table checksum — the replica-verification /
    did-the-copy-work primitive: one row ``(n_rows, checksum)`` where
    ``checksum = Σ md5_64(row) mod 2^61`` over a canonical ``'|'``
    -joined string serialization of ``cols`` (cast to VARCHAR; use
    non-null columns or COALESCE upstream — the serialization must be
    injective for the check to mean anything).  Addition commutes, so
    block order, partitioning and engine never matter; two tables
    with equal checksums and row counts are equal with
    2^-61-collision confidence per differing row.

    ``md5_64`` is the LOW 64 bits of the md5 digest little-endian —
    exactly DuckDB's ``md5_number_lower`` — so the SQL mirror is
    ``SUM(md5_number_lower(expr)) % 2^61``.  Per-block partials are
    exact Python ints; the driver adds |blocks| scalars."""
    import hashlib
    import struct
    cols = list(cols)

    def _partial(tab: pa.Table) -> pa.Table:
        parts = [pc.cast(tab[c], pa.string()) for c in cols]
        # last positional arg is the separator
        joined = pc.binary_join_element_wise(*parts, "|") \
            if len(parts) > 1 else parts[0]
        total = 0
        for s in joined.to_pylist():
            d = hashlib.md5(s.encode("utf-8")).digest()
            total += struct.unpack("<Q", d[8:16])[0]
        return pa.table({
            "n_rows": pa.array([tab.num_rows], pa.int64()),
            "_sum_lo": pa.array([total % _CHECKSUM_MOD], pa.int64()),
            "_sum_hi": pa.array([total // _CHECKSUM_MOD], pa.int64())})

    acc_rows, acc = 0, 0
    for r in ds.map_batches(_partial, batch_format="pyarrow",
                            batch_size=None).take_all():
        acc_rows += r["n_rows"]
        acc += r["_sum_hi"] * _CHECKSUM_MOD + r["_sum_lo"]
    return pa.table({
        "n_rows": pa.array([acc_rows], pa.int64()),
        "checksum": pa.array([acc % _CHECKSUM_MOD], pa.int64())})


def first_digit_profile(ds: "rd.Dataset", col: str, *,
                        buckets: int | None = None) -> "rd.Dataset":
    """Benford first-digit profile — the fraud/synthetic-data smell
    test: one row per leading decimal digit of the POSITIVE int64
    column ``col`` with its count and its floor-scaled share in basis
    points (``bp = 10000·n // total``).  Digits are extracted through
    the decimal string rendering (exact — a float ``log10`` misreads
    powers of ten at the boundary), vectorized with Arrow string
    kernels.  Nulls and non-positive values are excluded.

    Scale shape: each block reduces to a ≤9-row partial, one tiny
    exchange sums them, and the ≤9-row result collapses to a single
    block for the total — nothing driver-side, nothing proportional
    to row count ever shuffles."""
    from ..pipelines.relational import agg_named, bucketed_map_groups

    def _partial(tab: pa.Table) -> pa.Table:
        x = tab[col]
        # fill_null(False): `x > 0` is NULL for null x, and pc.all
        # SKIPS nulls — without the fill a block whose only invalid
        # values are nulls would dodge the filter and emit a spurious
        # null-digit group
        mask = pc.fill_null(
            pc.and_(pc.is_valid(x), pc.greater(
                pc.cast(x, pa.int64()), pa.scalar(0, pa.int64()))),
            False)
        if tab.num_rows and not pc.all(mask).as_py():
            x = x.filter(mask)
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(pc.cast(x, pa.int64()), pa.string()), 0, 1),
            pa.int64())
        part = pa.table({
            "digit": d,
            "_one": pa.array(np.ones(len(d), np.int64))})
        return agg_named(part, ["digit"], [("_one", "sum")], ["n"])

    summed = bucketed_map_groups(
        ds.select_columns([col]).map_batches(
            _partial, batch_format="pyarrow"),
        ["digit"],
        lambda t: agg_named(t, ["digit"], [("n", "sum")], ["n"]),
        buckets=buckets, sort_within=False)

    def _bp(tab: pa.Table) -> pa.Table:
        n = tab["n"].to_numpy(zero_copy_only=False)
        total = int(n.sum())
        bp = (10_000 * n) // total if total else n
        return pa.table({"digit": tab["digit"], "n": tab["n"],
                         "bp": pa.array(bp, pa.int64())})

    # ≤9 rows: one block, one pass for the total
    return summed.repartition(1).map_batches(_bp,
                                             batch_format="pyarrow")


def group_outliers(
    ds: "rd.Dataset", group_cols: "Sequence[str]", val_col: str, *,
    z2_num: int = 2, z2_den: int = 1, scale: int = 1,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group z-score outlier counts in EXACT integer arithmetic:
    a row is an outlier when ``(x − μ_g)² > (z2_num/z2_den)·σ_g²``,
    decided without ever forming μ or σ as floats —

        ``(n·x − S)² · z2_den > z2_num · (n·SS − S²)``

    with per-group ``n, S = Σx, SS = Σx²`` exact integers.  The
    per-row test reduces to ``|n·x − S| > m`` where ``m`` is the
    integer threshold ``max{ m : m²·z2_den ≤ z2_num·(n·SS−S²) }`` —
    computed once per GROUP with Python big-int ``isqrt`` (no
    precision cliff), leaving the row-side compare pure int64.  So
    the engine's verdict is bit-identical to a SQL engine evaluating
    the same inequality in HUGEINT — no float tie can flip a row.

    Sibling of :func:`group_sigma_outliers` (which RETURNS the
    outlier rows, takes integer k only, and merges moment partials on
    the driver): this is the COUNT aggregate — z² is an arbitrary
    rational (``z2_num/z2_den``, e.g. 2/1 for k = √2, inexpressible
    there), and the stats ride the ordinary ``group_agg`` exchange,
    so a billion-group keyspace never lands on the driver.

    ``scale`` converts decimal doubles to exact integers (100 for
    cents) via half-away rounding, like ``paired_moments_corr``.
    Null values are ignored (SQL aggregate semantics).

    Shape: one stats exchange (group_agg partials), the tiny
    per-group stats table broadcast-joined back onto rows, one
    flag-count exchange.  Overflow contract (raises, never wraps):
    per group ``n·max(x²) < 2^63`` and ``n·max|x| + |S| < 2^63`` —
    holds to ~10^15 rows for single-digit-scaled metrics; raise
    ``scale`` only as magnitudes allow.

    Returns ``(group_cols..., n, n_outliers)``.
    """
    from . import round_half_away
    from ..pipelines.relational import group_agg, hash_join

    group_cols = list(group_cols)

    def _prep(tab: pa.Table) -> pa.Table:
        x = tab[val_col]
        keep = pc.is_valid(x)
        tab = tab.filter(keep)
        xv = round_half_away(
            pc.multiply(pc.cast(tab[val_col], pa.float64()),
                        float(scale))
            .to_numpy(zero_copy_only=False), 0).astype(np.int64)
        if len(xv) and int(np.abs(xv).max()) >= 3_037_000_499:
            raise OverflowError(
                "group_outliers: |x| too large — x² exceeds int64; "
                "lower `scale`")
        cols = {c: tab[c] for c in group_cols}
        cols["_x"] = pa.array(xv)
        cols["_xx"] = pa.array(xv * xv)
        return pa.table(cols)

    prepped = ds.select_columns(group_cols + [val_col]).map_batches(
        _prep, batch_format="pyarrow").materialize()

    stats = group_agg(prepped, group_cols,
                      [("_x", "count", "n"), ("_x", "sum", "s1"),
                       ("_xx", "sum", "s2"), ("_x", "min", "lo"),
                       ("_x", "max", "hi")],
                      buckets=buckets)

    def _thresholds(tab: pa.Table) -> pa.Table:
        n = tab["n"].to_pylist()
        s1 = tab["s1"].to_pylist()
        s2 = tab["s2"].to_pylist()
        lo = tab["lo"].to_pylist()
        hi = tab["hi"].to_pylist()
        import math
        ms = []
        for ni, si, ssi, l, h in zip(n, s1, s2, lo, hi):
            # group_agg integer sums ride decimal128 partials —
            # coerce to Python ints for the big-int threshold math
            ni, si, ssi, l, h = (int(ni), int(si), int(ssi),
                                 int(l), int(h))
            amax = max(abs(l), abs(h))
            if ni * amax * amax >= 2 ** 63 \
                    or ni * amax + abs(si) >= 2 ** 63:
                raise OverflowError(
                    "group_outliers: per-group moment bound exceeded "
                    "— int64 stats would have wrapped")
            v = z2_num * (ni * ssi - si * si)       # Python big ints
            # largest m with m²·z2_den <= v  (outlier ⇔ |d| > m)
            m = math.isqrt(v // z2_den) if v >= 0 else -1
            while m * m * z2_den > v:
                m -= 1
            while (m + 1) * (m + 1) * z2_den <= v:
                m += 1
            ms.append(m)
        out = {c: tab[c] for c in group_cols}
        out["n"] = pc.cast(tab["n"], pa.int64())
        # safe: the per-group bound above guarantees |S| < 2^63
        out["s1"] = pc.cast(tab["s1"], pa.int64())
        out["_m"] = pa.array(ms, pa.int64())
        return pa.table(out)

    thr = stats.map_batches(_thresholds, batch_format="pyarrow")
    joined = hash_join(prepped, thr, on=group_cols, broadcast="auto")

    def _flag_partial(tab: pa.Table) -> pa.Table:
        x = tab["_x"].combine_chunks().to_numpy(zero_copy_only=False)
        n = tab["n"].combine_chunks().to_numpy(zero_copy_only=False)
        s1 = tab["s1"].combine_chunks().to_numpy(zero_copy_only=False)
        m = tab["_m"].combine_chunks().to_numpy(zero_copy_only=False)
        d = n * x - s1
        f = (np.abs(d) > m).astype(np.int64)
        cols = {c: tab[c] for c in group_cols}
        cols["f"] = pa.array(f)
        part = pa.table(cols)
        return agg_named(part, group_cols, [("f", "sum")], ["f"])

    flags = bucketed_map_groups(
        joined.map_batches(_flag_partial, batch_format="pyarrow"),
        group_cols,
        lambda t: agg_named(t, group_cols, [("f", "sum")], ["f"]),
        buckets=buckets, sort_within=False)
    out = hash_join(stats.select_columns(group_cols + ["n"]), flags,
                    on=group_cols, broadcast="auto")
    return out.map_batches(
        lambda t: pa.table({**{c: t[c] for c in group_cols},
                            "n": t["n"],
                            "n_outliers": pc.cast(t["f"], pa.int64())}),
        batch_format="pyarrow")


def crosstab_deviation(
    ds: "rd.Dataset", row_col: str, col_col: str, *,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Independence-test profile of a two-way contingency table: for
    every observed ``(row, col)`` cell emit the EXACT integer
    statistics

        (row, col, o, row_n, col_n, n, dev_num, dev_den)

    where ``o`` is the cell count, ``row_n``/``col_n`` the margins,
    ``n`` the grand total, and the signed independence deviation is
    the exact rational ``dev_num / dev_den = (o·n − row_n·col_n) /
    (n·row_n·col_n)`` — the chi-square cell contribution is
    ``dev_num² / (dev_den·…)`` downstream, and Σ o·dev keeps every
    comparison in integers (no float χ² summation order to disagree
    about).  Rows with a null key on either side are dropped (SQL
    GROUP BY would keep a NULL class; mirror the WHERE).

    Scale shape: ONE exchange on the composite key builds the cell
    counts; margins reduce FROM the cells (vocabulary-sized — two
    tiny exchanges) and ride back as ``broadcast="auto"`` joins, so
    the fact table is read once.  Overflow: requires
    ``n·row_n·col_n < 2^63`` (checked) — at 100 TB pre-bucket the
    fact stream by time/shard first or scale counts down.
    """
    from ..pipelines.relational import group_agg, hash_join

    def _drop_nulls(tab: pa.Table) -> pa.Table:
        return tab.filter(pc.and_(pc.is_valid(tab[row_col]),
                                  pc.is_valid(tab[col_col])))

    src = ds.select_columns([row_col, col_col]).map_batches(
        _drop_nulls, batch_format="pyarrow")

    def _cell_partial(tab: pa.Table) -> pa.Table:
        g = tab.group_by([row_col, col_col]).aggregate(
            [([], "count_all")])
        return pa.table({row_col: g[row_col], col_col: g[col_col],
                         "o": pc.cast(g["count_all"], pa.int64())})

    cells = group_agg(
        src.map_batches(_cell_partial, batch_format="pyarrow"),
        [row_col, col_col], [("o", "sum", "o")],
        buckets=buckets).materialize()

    rows = group_agg(cells, [row_col], [("o", "sum", "row_n")],
                     buckets=buckets)
    cols = group_agg(cells, [col_col], [("o", "sum", "col_n")],
                     buckets=buckets)
    n = sum(r["o"] for r in cells.select_columns(["o"]).take_all())

    out = hash_join(cells, rows, on=row_col, broadcast="auto")
    out = hash_join(out, cols, on=col_col, broadcast="auto")

    def _dev(tab: pa.Table) -> pa.Table:
        o = tab["o"].combine_chunks().to_numpy(zero_copy_only=False)
        rn = tab["row_n"].combine_chunks().to_numpy(
            zero_copy_only=False)
        cn = tab["col_n"].combine_chunks().to_numpy(
            zero_copy_only=False)
        if len(o):
            worst = int(n) * int(rn.max()) * int(cn.max())
            if worst > 2**63 - 1:
                raise OverflowError(
                    "crosstab_deviation: n·row_n·col_n exceeds "
                    "int64 — pre-aggregate or rescale")
        num = o * np.int64(n) - rn * cn
        den = np.int64(n) * rn * cn
        return pa.table({
            row_col: tab[row_col], col_col: tab[col_col],
            "o": tab["o"], "row_n": tab["row_n"],
            "col_n": tab["col_n"],
            "n": pa.array(np.full(len(o), n, dtype=np.int64)),
            "dev_num": pa.array(num.astype(np.int64)),
            "dev_den": pa.array(den.astype(np.int64))})

    return out.map_batches(_dev, batch_format="pyarrow")


def value_shape_profile(
    ds: "rd.Dataset", cols: "Sequence[str]", *,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Value-SHAPE distribution per string column (format/pattern
    discovery, the data-prep profiling step): every byte maps
    ``A-Z → 'A'``, ``a-z → 'a'``, ``0-9 → '9'`` (others kept), and
    the profile counts each column's distinct shapes — ``'O'`` and
    ``'F'`` collapse to shape ``A``, ``'1-URGENT'`` to ``9-AAAAAA``,
    so format drift (a lowercase id, a stray space) surfaces as a
    new shape row.  Output: ``(column, shape, n)``.

    The byte substitution is one vectorized pass over the flat Arrow
    buffer (length-preserving, so offsets are reused zero-copy);
    counts pre-aggregate per batch and ONE exchange on
    (column, shape) finishes — never more than the distinct-shape
    table moves.  Multibyte UTF-8 passes through untouched (lead/
    continuation bytes are outside the mapped ASCII ranges)."""
    from ..pipelines.relational import agg_named, bucketed_map_groups

    cols = list(cols)

    def _shapes(tab: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            arr = pc.cast(pc.fill_null(tab[c], ""), pa.string())
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            buf = pc.cast(arr, pa.large_binary())
            bufs = buf.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64,
                                    count=len(buf) + 1,
                                    offset=buf.offset * 8)
            data = np.frombuffer(bufs[2], dtype=np.uint8) \
                if bufs[2] is not None else np.empty(0, np.uint8)
            data = data[offsets[0]:offsets[-1]].copy()
            upper = (data >= 65) & (data <= 90)
            lower = (data >= 97) & (data <= 122)
            digit = (data >= 48) & (data <= 57)
            data[upper] = ord("A")
            data[lower] = ord("a")
            data[digit] = ord("9")
            rel = (offsets - offsets[0]).astype(np.int64)
            shaped = pa.Array.from_buffers(
                pa.large_utf8(), len(buf),
                [None, pa.py_buffer(rel.tobytes()),
                 pa.py_buffer(data.tobytes())])
            parts.append(agg_named(
                pa.table({"column": pa.array([c] * len(buf),
                                             pa.string()),
                          "shape": pc.cast(shaped, pa.string()),
                          "__one": np.ones(len(buf), np.int64)}),
                ["column", "shape"], [("__one", "sum")], ["n"]))
        return pa.concat_tables(parts)

    return bucketed_map_groups(
        ds.select_columns(cols).map_batches(
            _shapes, batch_format="pyarrow"),
        ["column", "shape"],
        lambda t: agg_named(t, ["column", "shape"],
                            [("n", "sum")], ["n"]),
        buckets=buckets, sort_within=False)
