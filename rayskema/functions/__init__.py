"""Operator-family helpers shared across functions modules."""

from __future__ import annotations

import numpy as np


def round_half_away(values, digits: int = 4):
    """Round half AWAY from zero (SQL semantics — DuckDB/ANSI ROUND),
    not numpy/Python's half-to-even: oracle-compared floats must round
    identically on both sides (e.g. 157/160 = 0.98125 -> 0.9813, where
    round() gives 0.9812)."""
    v = np.asarray(values, dtype=np.float64)
    s = 10.0 ** digits
    return np.sign(v) * np.floor(np.abs(v) * s + 0.5) / s
