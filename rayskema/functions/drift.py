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
