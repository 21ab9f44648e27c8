"""Distribution-drift metrics over merged sketch profiles.

PSI (population stability index) over categorical histograms and a KS
statistic over t-digest CDFs — the north rule's drift checks. The
reference has no drift analogue (its aggregates are exact in-memory,
SURVEY §2.6 A6); thresholds follow FIXTURES.md §4: PSI < 0.2,
KS < 0.1.
"""

from __future__ import annotations

import numpy as np

from ..state.sketches import ColumnProfile, TDigest


def psi(expected: dict, observed: dict, epsilon: float = 1e-6) -> float:
    """PSI between two categorical count dicts. Buckets = union of keys;
    zero counts are floored at ``epsilon`` probability (standard
    practice so log terms stay finite)."""
    keys = sorted(set(expected) | set(observed))
    e_total = max(1, sum(expected.values()))
    o_total = max(1, sum(observed.values()))
    val = 0.0
    for k in keys:
        e = max(expected.get(k, 0) / e_total, epsilon)
        o = max(observed.get(k, 0) / o_total, epsilon)
        val += (o - e) * np.log(o / e)
    return float(val)


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic: max |CDF_a - CDF_b| evaluated
    on a merged quantile grid from both digests."""
    if a.total_weight == 0 or b.total_weight == 0:
        return 0.0
    qs = np.linspace(0.001, 0.999, n_points)
    grid = np.unique(np.concatenate([a.quantile(qs), b.quantile(qs)]))
    return float(np.max(np.abs(a.cdf(grid) - b.cdf(grid))))


def exact_median_i64(ds, col: str, *, window_cap: int = 5_000_000) -> int:
    """EXACT distributed median of a numeric/timestamp column without
    materializing it on the driver:

    1. one ``map_batches`` pass folds every batch into a t-digest
       partial (mergeable, tiny);
    2. the merged digest brackets the median: ``[q(0.49), q(0.51)]``;
    3. a second pruned pass counts rows below the window and collects
       ONLY the in-window values (~2% of rows by digest accuracy,
       hard-capped at ``window_cap``), from which the exact median
       (numpy convention: mean of the two middle values for even n)
       is computed.

    This is the scale path for the PSI cutoff: the driver holds one
    digest and one narrow window, never the column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    def _to_i64(t):
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.astype("datetime64[us]").astype(np.int64)
        return np.asarray(v, dtype=np.float64)

    def digest_partial(t):
        td = TDigest()
        v = _to_i64(t)
        td.update(v[~np.isnan(v)])
        return pa.table({"d": pa.array([td.to_bytes()])})

    merged = TDigest()
    for t in ray.get(ds.map_batches(
            digest_partial, batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows and "d" in t.column_names:
            for b in t["d"].to_pylist():
                merged.merge(TDigest.from_bytes(b))
    n_total = int(merged.total_weight)
    # t-digest is least accurate at mid-quantiles: bracket generously
    # (10% of rows; still bounded driver memory)
    lo, hi = merged.quantile(np.array([0.45, 0.55]))

    def window_partial(t, _lo=lo, _hi=hi, _cap=window_cap):
        v = _to_i64(t)
        v = v[~np.isnan(v)]
        below = int((v < _lo).sum())
        win = v[(v >= _lo) & (v <= _hi)]
        if len(win) > _cap:   # fail in the TASK, before shipping
            raise ValueError(
                "median window exceeds window_cap within one block; "
                "raise window_cap or narrow the quantile bracket")
        return pa.table({"below": pa.array([below]),
                         "win": pa.array([win.astype(np.int64)],
                                         type=pa.list_(pa.int64()))})

    below = 0
    wins = []
    total_win = 0
    for t in ray.get(ds.map_batches(
            window_partial, batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows and "below" in t.column_names:
            below += sum(t["below"].to_pylist())
            for w in t["win"]:
                a = np.asarray(w.values)
                total_win += len(a)
                if total_win > window_cap:
                    raise ValueError(
                        "median window exceeds window_cap; raise it or "
                        "narrow the quantile bracket")
                wins.append(a)
    win = np.sort(np.concatenate(wins)) if wins else np.array([], np.int64)
    mid = (n_total - 1) / 2
    i0, i1 = int(np.floor(mid)) - below, int(np.ceil(mid)) - below
    if i0 < 0 or i1 >= len(win):
        # the digest's mid-quantile estimate missed the true median
        # (possible under extreme duplication): both middle ranks must
        # land inside the collected window — never index blindly
        raise ValueError(
            "median ranks fall outside the digest window; widen the "
            "quantile bracket")
    return int((win[i0] + win[i1]) / 2)


def exact_ks_discrete(ds, value_col: str, group_col: str, group_a: str):
    """EXACT two-sample KS statistic of ``value_col`` between the rows
    where ``group_col == group_a`` (side A) and the rest (side B):
    max over the value domain of |ECDF_A(v) - ECDF_B(v)|.  Null values
    are excluded from both samples.

    Valid for DISCRETE / bounded-cardinality value columns: every block
    pre-aggregates to (value, count_a, count_b) partials, so the reduce
    volume is bounded by the distinct-value count, never the row count
    (the partial+final pattern).  The final cumsum runs on the driver
    over the merged value domain — use the t-digest
    :func:`ks_statistic` for continuous/high-cardinality columns where
    the domain itself is too large to collect.

    Returns (ks: float, n_a: int, n_b: int)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..pipelines.relational import agg_named

    def _partial(tab: pa.Table) -> pa.Table:
        keep = pc.is_valid(tab[value_col])
        tab = tab.filter(keep) if tab.num_rows else tab
        is_a = pc.equal(tab[group_col], group_a)
        t = pa.table({
            "v": tab[value_col],
            "ca": pc.cast(pc.fill_null(is_a, False), pa.int64()),
            "cb": pc.cast(pc.fill_null(pc.invert(is_a), False),
                          pa.int64()),
        })
        return agg_named(t, ["v"], [("ca", "sum"), ("cb", "sum")],
                         ["ca", "cb"])

    tabs = [t for t in ray.get(
        ds.select_columns([value_col, group_col]).map_batches(
            _partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not tabs:
        return 0.0, 0, 0
    merged = agg_named(pa.concat_tables(tabs), ["v"],
                       [("ca", "sum"), ("cb", "sum")], ["ca", "cb"])
    merged = merged.sort_by([("v", "ascending")])
    ca = merged["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = merged["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        return 0.0, n_a, n_b
    fa = np.cumsum(ca).astype(np.float64) / n_a
    fb = np.cumsum(cb).astype(np.float64) / n_b
    return float(np.max(np.abs(fa - fb))), n_a, n_b


def drift_report(baseline: ColumnProfile, observed: ColumnProfile,
                 rules) -> list[dict]:
    """Evaluate every DriftRule; returns one record per rule with the
    metric value and pass/fail."""
    out = []
    for rule in rules:
        if rule.kind == "psi":
            value = psi(baseline.value_counts.get(rule.column, {}),
                        observed.value_counts.get(rule.column, {}))
        elif rule.kind == "ks":
            base_td = baseline.tdigests.get(rule.column, TDigest())
            obs_td = observed.tdigests.get(rule.column, TDigest())
            value = ks_statistic(base_td, obs_td)
        else:
            raise ValueError(f"unknown drift kind {rule.kind!r}")
        out.append({
            "rule": rule.rule, "column": rule.column, "kind": rule.kind,
            "value": value, "threshold": rule.threshold,
            "passed": value < rule.threshold,
        })
    return out


def ab_ztest_exact(ds, variant_col: str, converted_col: str):
    """Two-proportion A/B z-test with NO floating point: the squared
    pooled z-statistic is a RATIONAL function of the four counts —

        z² = (c_a·n_b − c_b·n_a)² · N
             ─────────────────────────────────
             n_a·n_b·(c_a+c_b)·(N − c_a − c_b)

    — so it is computed exactly in arbitrary-precision ints and
    reported floor-scaled to ppm (``z2_ppm``; compare against
    3.8416e6 for the two-sided 5% level).  ``variant_col`` must be
    int 0/1 (0 = A); ``converted_col`` int 0/1.  Degenerate splits
    (either arm empty, all-or-none conversions pooled) yield NULL.

    Scale shape: the only distributed work is four counter partials
    per block (no exchange at all); the exact big-int arithmetic
    happens once on the driver's four scalars.

    Returns a one-row table
    ``(n_a, n_b, conv_a, conv_b, z2_ppm)``."""
    import pyarrow as pa

    def _partial(tab: "pa.Table") -> "pa.Table":
        v = tab[variant_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = tab[converted_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if ((v != 0) & (v != 1)).any() or ((c != 0) & (c != 1)).any():
            raise ValueError("variant/converted must be 0/1")
        b = v == 1
        return pa.table({
            "n_a": pa.array([int((~b).sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "conv_a": pa.array([int(c[~b].sum())], pa.int64()),
            "conv_b": pa.array([int(c[b].sum())], pa.int64())})

    acc = {"n_a": 0, "n_b": 0, "conv_a": 0, "conv_b": 0}
    for r in ds.select_columns([variant_col, converted_col]) \
            .map_batches(_partial, batch_format="pyarrow").take_all():
        for k in acc:
            acc[k] += r[k]
    n_a, n_b = acc["n_a"], acc["n_b"]
    c_a, c_b = acc["conv_a"], acc["conv_b"]
    n = n_a + n_b
    conv = c_a + c_b
    den = n_a * n_b * conv * (n - conv)
    z2_ppm = ((c_a * n_b - c_b * n_a) ** 2 * n * 1_000_000) // den \
        if den else None
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "conv_a": pa.array([c_a], pa.int64()),
        "conv_b": pa.array([c_b], pa.int64()),
        "z2_ppm": pa.array([z2_ppm], pa.int64())})
