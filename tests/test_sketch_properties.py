"""Property-based tests (hypothesis) for the sketch/hash layer —
merge associativity and path equivalence are what checkpoint resume and
salting correctness rest on (SURVEY §7.4.4)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rayskema.state.sketches import (
    CountMin, HyperLogLog, TDigest, hash_strings,
)

texts = st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=200)


@settings(max_examples=30, deadline=None)
@given(texts)
def test_hash_strings_deterministic_and_order_independent(vals):
    h1 = hash_strings(pa.array(vals, type=pa.string()))
    h2 = hash_strings(pa.array(vals, type=pa.string()))
    assert (h1 == h2).all()
    # per-row hash depends only on the row's value, not its neighbors
    perm = np.random.default_rng(0).permutation(len(vals))
    hp = hash_strings(pa.array([vals[i] for i in perm], type=pa.string()))
    assert (hp == h1[perm]).all()


@settings(max_examples=20, deadline=None)
@given(texts)
def test_hash_dict_path_equals_direct(vals):
    # force the dictionary fast path by repeating values past the gate
    reps = (65536 // max(1, len(vals))) + 2
    big = vals * reps
    hb = hash_strings(pa.array(big, type=pa.string()))
    hd = hash_strings(pa.array(vals, type=pa.string()))
    assert (hb[:len(vals)] == hd).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(st.text(min_size=1, max_size=12),
                         min_size=1, max_size=50),
                min_size=2, max_size=5))
def test_hll_merge_associative(parts):
    def sketch(chunks):
        h = HyperLogLog(p=10)
        for c in chunks:
            h.update_strings(pa.array(c, type=pa.string()))
        return h

    left = sketch(parts)
    # merge in reverse order
    rev = HyperLogLog(p=10)
    for c in reversed(parts):
        one = HyperLogLog(p=10)
        one.update_strings(pa.array(c, type=pa.string()))
        rev.merge(one)
    assert (left.registers == rev.registers).all()
    # round-trip
    rt = HyperLogLog.from_bytes(left.to_bytes())
    assert (rt.registers == left.registers).all()


def test_hll_accuracy():
    h = HyperLogLog(p=14)
    vals = pa.array([f"key_{i}" for i in range(50000)])
    h.update_strings(vals)
    est = h.estimate()
    assert abs(est - 50000) / 50000 < 0.05


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=10, max_size=500))
def test_tdigest_quantiles_bounded(vals):
    td = TDigest()
    td.update(np.array(vals))
    arr = np.sort(np.array(vals))
    for q in (0.1, 0.5, 0.9):
        got = float(td.quantile(q))
        assert arr[0] - 1e-6 <= got <= arr[-1] + 1e-6


def test_tdigest_merge_close_to_whole():
    rng = np.random.default_rng(1)
    data = rng.lognormal(3, 1, size=40000)
    whole = TDigest()
    whole.update(data)
    merged = TDigest()
    for chunk in np.array_split(data, 13):
        part = TDigest()
        part.update(chunk)
        merged.merge(part)
    qs = np.linspace(0.05, 0.95, 19)
    a, b = whole.quantile(qs), merged.quantile(qs)
    # merge-order perturbation must stay far below the KS drift
    # threshold (0.1) used by the pipeline
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-9)
    assert rel.max() < 0.05


def test_countmin_overestimates_only():
    cm = CountMin(w=512, d=4)
    vals = ["a"] * 100 + ["b"] * 5 + [f"x{i}" for i in range(200)]
    cm.update_strings(pa.array(vals, type=pa.string()))
    assert cm.query_string("a") >= 100
    assert cm.query_string("b") >= 5
    m = CountMin.from_bytes(cm.to_bytes())
    assert m.query_string("a") == cm.query_string("a")


# ---------------------------------------------------------------------------
# interval matcher (relational.match_overlapping_intervals)
# ---------------------------------------------------------------------------

_iv = st.tuples(st.integers(0, 6), st.integers(-50, 50),
                st.integers(0, 40))
_ivs = st.lists(_iv, min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_ivs, _ivs)
def test_match_overlapping_intervals_vs_bruteforce(lraw, rraw):
    """The rank-space candidate-window matcher returns exactly the
    brute-force pair set for arbitrary keys/starts/durations
    (including empty sides, ties, zero-length and nested
    intervals)."""
    from rayskema.pipelines.relational import match_overlapping_intervals
    lc = np.array([k for k, _, _ in lraw], dtype=np.int64)
    ls = np.array([s for _, s, _ in lraw], dtype=np.int64)
    le = np.array([s + d for _, s, d in lraw], dtype=np.int64)
    rc = np.array([k for k, _, _ in rraw], dtype=np.int64)
    rs = np.array([s for _, s, _ in rraw], dtype=np.int64)
    re_ = np.array([s + d for _, s, d in rraw], dtype=np.int64)
    lidx, ridx = match_overlapping_intervals(lc, ls, le, rc, rs, re_)
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    want = sorted(
        (i, j)
        for i in range(len(lraw)) for j in range(len(rraw))
        if lc[i] == rc[j] and ls[i] <= re_[j] and rs[j] <= le[i])
    assert got == want
