"""Iterative model fitting over Datasets (beyond the closed-form
OLS/Theil-Sen family): distributed optimizers whose every round is a
map-side partial + an exact driver fold, engineered for bit-identical
results under ANY block layout.

Determinism contract: floating-point addition is not associative, so a
naive per-block ``float`` gradient sum would change with partitioning
(and with Ray's scheduling order).  Every per-row contribution is
therefore QUANTIZED to an integer (``round(g_i · 2^quant_bits)``)
before summation — integer addition is associative, so the fold is
layout-independent, and the weight update (computed on the de-scaled
integer) is a pure function of the previous weights.  The weights a
256-node run produces are bit-identical to a single-core run.

Scale shape per iteration: weights broadcast once (``ray.put``), one
streaming pass emits an O(d) integer partial per block, the driver
folds O(blocks) partials with Python ints (no overflow at any corpus
size).  T iterations = T passes; no shuffle anywhere.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_gradient_rows(X: np.ndarray, y: np.ndarray,
                         w: np.ndarray, quant: int) -> np.ndarray:
    """Per-row quantized gradient contributions, summed: int64 vector
    of length d+1 (features then bias).  Shared verbatim by the
    distributed pass and the single-node replica so the two can only
    differ if the DATA differs."""
    z = X @ w[:-1] + w[-1]
    err = _sigmoid(z) - y                       # in (-1, 1)
    g = np.concatenate([err[:, None] * X, err[:, None]], axis=1)
    return np.rint(g * float(quant)).astype(np.int64).sum(axis=0)


def logistic_regression_gd(
    ds: "rd.Dataset", feature_cols: Sequence[str], label_col: str, *,
    iters: int = 20, lr: float = 0.5, quant_bits: int = 24,
) -> dict:
    """Full-batch gradient-descent logistic regression.  Returns
    ``{"w": np.ndarray(d+1), "n": int, "losses_q": list[int]}`` —
    ``losses_q`` is the per-iteration quantized total log-loss (also
    an exact integer fold), so convergence is itself deterministic
    evidence.

    Features must be pre-bounded by the caller (clip/scale inside the
    projection): per-row quantized magnitudes are ``<= |x|·2^quant_bits``
    and a block's int64 partial must not overflow — bounded features
    at the default 2^24 leave ~2^39 rows of headroom per block, far
    above any block size; the DRIVER fold is Python-int exact at any
    corpus size."""
    feature_cols = list(feature_cols)
    d = len(feature_cols)
    quant = 1 << quant_bits
    w = np.zeros(d + 1, dtype=np.float64)

    proj = ds.select_columns(feature_cols + [label_col]).materialize()
    n = proj.count()
    if n == 0:
        raise ValueError("empty input")

    losses_q: list[int] = []
    for _ in range(iters):
        wref = ray.put(w.copy())

        def _partial(tab: pa.Table, _w=wref) -> pa.Table:
            wv = ray.get(_w)
            X = np.column_stack([
                pc.cast(tab[c], pa.float64()).to_numpy(
                    zero_copy_only=False) for c in feature_cols])
            y = pc.cast(tab[label_col], pa.float64()).to_numpy(
                zero_copy_only=False)
            gq = logreg_gradient_rows(X, y, wv, quant)
            z = X @ wv[:-1] + wv[-1]
            # per-row quantized log-loss, same associativity argument
            ll = np.logaddexp(0.0, z) - y * z
            lq = np.rint(ll * float(quant)).astype(np.int64).sum()
            return pa.table({
                "g": pa.array([[int(v) for v in gq]],
                              type=pa.list_(pa.int64(), d + 1)),
                "loss_q": pa.array([int(lq)], type=pa.int64())})

        parts = [t for t in ray.get(
            proj.map_batches(_partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        g_total = [0] * (d + 1)
        loss_total = 0
        for t in parts:
            for row in t["g"].to_pylist():
                for j, v in enumerate(row):
                    g_total[j] += v
            loss_total += sum(t["loss_q"].to_pylist())
        losses_q.append(loss_total)
        g = np.array(g_total, dtype=np.float64) / quant
        w = w - lr * g / n
    return {"w": w, "n": n, "losses_q": losses_q}


def logistic_regression_local(X: np.ndarray, y: np.ndarray, *,
                              iters: int = 20, lr: float = 0.5,
                              quant_bits: int = 24) -> dict:
    """Single-node replica of :func:`logistic_regression_gd` — same
    per-row quantization, same fold, same update — for verdict
    checks.  Equality with the distributed result is exact, not
    approximate."""
    quant = 1 << quant_bits
    d = X.shape[1]
    w = np.zeros(d + 1, dtype=np.float64)
    n = len(y)
    losses_q: list[int] = []
    for _ in range(iters):
        gq = logreg_gradient_rows(X, y, w, quant)
        z = X @ w[:-1] + w[-1]
        ll = np.logaddexp(0.0, z) - y * z
        losses_q.append(int(np.rint(ll * float(quant))
                            .astype(np.int64).sum()))
        w = w - lr * (gq.astype(np.float64) / quant) / n
    return {"w": w, "n": n, "losses_q": losses_q}


def ridge_moments(X: np.ndarray, y: np.ndarray,
                  quant: int) -> dict[str, int]:
    """Quantized sufficient statistics for 2-feature ridge: per-row
    ``round_half_away(value · quant)`` int64s, summed — shared by the
    distributed fold and the local replica."""
    from . import round_half_away

    qx = round_half_away(X * float(quant), 0).astype(np.int64)
    qy = round_half_away(y * float(quant), 0).astype(np.int64)
    return {
        "n": int(len(y)),
        "s1": int(qx[:, 0].sum()), "s2": int(qx[:, 1].sum()),
        "m11": int((qx[:, 0] * qx[:, 0]).sum()),
        "m12": int((qx[:, 0] * qx[:, 1]).sum()),
        "m22": int((qx[:, 1] * qx[:, 1]).sum()),
        "v1": int((qx[:, 0] * qy).sum()),
        "v2": int((qx[:, 1] * qy).sum()),
        "vy": int(qy.sum()),
    }


_MOMENT_KEYS = ("n", "s1", "s2", "m11", "m12", "m22", "v1", "v2",
                "vy")


def _ridge_solve(m: dict[str, int], quant: int,
                 l2: float) -> np.ndarray:
    """(w1, w2, bias) from exact integer moments — one deterministic
    3×3 float solve on the de-scaled normal equations (bias
    unpenalized)."""
    q2 = float(quant) * float(quant)
    n = float(m["n"])
    A = np.array([
        [m["m11"] / q2 + l2, m["m12"] / q2, m["s1"] / float(quant)],
        [m["m12"] / q2, m["m22"] / q2 + l2, m["s2"] / float(quant)],
        [m["s1"] / float(quant), m["s2"] / float(quant), n],
    ], dtype=np.float64)
    b = np.array([m["v1"] / q2, m["v2"] / q2,
                  m["vy"] / float(quant)], dtype=np.float64)
    return np.linalg.solve(A, b)


def ridge_regression(
    ds: "rd.Dataset", feature_cols: Sequence[str], label_col: str, *,
    l2: float = 1.0, quant_bits: int = 16,
) -> dict:
    """Closed-form 2-feature ridge regression over a Dataset: ONE
    streaming pass folds per-block integer-quantized sufficient
    statistics (products bounded by ``2^(2·quant_bits)`` per row —
    int64-safe for any realistic block, Python-int exact on the
    driver), then a single deterministic 3×3 solve.  The moments are
    plain integer sums a SQL oracle reproduces term-for-term; the
    weights are a pure function of those integers, so a 256-node run
    and a laptop run return bit-identical coefficients.

    Features/label must be pre-bounded (|value| ≲ 1) by the caller's
    projection.  Returns ``{"w": (3,) ndarray, "moments": dict}``."""
    feature_cols = list(feature_cols)
    if len(feature_cols) != 2:
        raise ValueError("ridge_regression expects exactly 2 features")
    quant = 1 << quant_bits

    def _partial(tab: pa.Table) -> pa.Table:
        X = np.column_stack([
            pc.cast(tab[c], pa.float64()).to_numpy(
                zero_copy_only=False) for c in feature_cols])
        y = pc.cast(tab[label_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        m = ridge_moments(X, y, quant)
        return pa.table({k: pa.array([m[k]], pa.int64())
                         for k in _MOMENT_KEYS})

    total = {k: 0 for k in _MOMENT_KEYS}
    for t in ray.get(ds.select_columns(feature_cols + [label_col])
                     .map_batches(_partial, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows == 0 or "n" not in t.column_names:
            continue
        for k in _MOMENT_KEYS:
            total[k] += int(sum(t[k].to_pylist()))
    return {"w": _ridge_solve(total, quant, l2), "moments": total}
