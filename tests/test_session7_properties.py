"""Property-based tests (hypothesis) for the session-7 operators:
each distributed result is compared against an independent brute-force
reference on randomized small inputs — the invariants the oracle
queries check once at sf0.01 are exercised here across many shapes
(empty groups, ties, nulls, single elements, adversarial overlaps)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray
import ray.data as rd


def _collect(ds):
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


intervals = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100),
              st.integers(0, 40)),
    min_size=1, max_size=60)


@settings(max_examples=20, deadline=None)
@given(intervals)
def test_interval_union_matches_brute(ray_session, ivs):
    from rayskema.pipelines.relational import interval_union_length

    t = pa.table({
        "k": pa.array([k for k, _, _ in ivs], pa.int64()),
        "s": pa.array([s for _, s, _ in ivs], pa.int64()),
        "e": pa.array([s + ln for _, s, ln in ivs], pa.int64())})
    out = _collect(interval_union_length(
        rd.from_arrow(t).repartition(3), "k", "s", "e", buckets=2))
    got = {k: (a, n) for k, a, n in
           zip(out["k"].to_pylist(), out["active"].to_pylist(),
               out["n_intervals"].to_pylist())}

    want = {}
    for key in {k for k, _, _ in ivs}:
        spans = sorted((s, s + ln) for k, s, ln in ivs if k == key)
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[key] = (sum(e - s for s, e in merged), len(merged))
    assert got == want


runs = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)),
                min_size=1, max_size=50)


@settings(max_examples=20, deadline=None)
@given(runs)
def test_scd2_matches_brute(ray_session, rows):
    from rayskema.pipelines.relational import scd2_intervals

    import datetime as dt
    T = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    t = pa.table({
        "k": pa.array([k for k, _ in rows], pa.int64()),
        "v": pa.array([str(v) for _, v in rows], pa.string()),
        "ts": pa.array([T(i) for i in range(len(rows))],
                       pa.timestamp("us")),
        "id": pa.array(range(len(rows)), pa.int64())})
    out = _collect(scd2_intervals(
        rd.from_arrow(t).repartition(3), "k", "v", "ts",
        tiebreak=["id"], buckets=2))
    got = sorted(zip(out["k"].to_pylist(), out["version"].to_pylist(),
                     out["v"].to_pylist(),
                     out["valid_from"].to_pylist(),
                     out["valid_to"].to_pylist()))

    want = []
    for key in sorted({k for k, _ in rows}):
        seq = [(T(i), str(v)) for i, (k, v) in enumerate(rows)
               if k == key]
        runs_ = []
        for ts, v in seq:
            if runs_ and runs_[-1][1] == v:
                continue
            runs_.append([ts, v])
        for i, (ts, v) in enumerate(runs_):
            nxt = runs_[i + 1][0] if i + 1 < len(runs_) else None
            want.append((key, i + 1, v, ts, nxt))
    assert got == sorted(want)


pairs2 = st.lists(st.tuples(st.integers(0, 60), st.integers(1, 30)),
                  min_size=2, max_size=80)


@settings(max_examples=15, deadline=None)
@given(pairs2)
def test_wasserstein_and_ks_match_brute(ray_session, vals):
    from rayskema.pipelines.relational import ks_exact, wasserstein_1d

    qv = [q for q, _ in vals]
    side = ["a" if w % 2 == 0 else "b" for _, w in vals]
    if "a" not in side or "b" not in side:
        side[0], side[-1] = "a", "b"
    t = pa.table({"qv": pa.array(qv, pa.int64()),
                  "side": pa.array(side)})
    ds = rd.from_arrow(t).repartition(3)
    w1 = wasserstein_1d(ds, "qv", "side", buckets=2)
    ks = ks_exact(ds, "qv", "side", buckets=2)

    a = sorted(q for q, s in zip(qv, side) if s == "a")
    b = sorted(q for q, s in zip(qv, side) if s == "b")
    na, nb = len(a), len(b)
    grid = sorted(set(qv))
    w1_want = 0
    ks_want, ks_at = 0, None
    for i, v in enumerate(grid):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = abs(ca * nb - cb * na)
        if d > ks_want:
            ks_want, ks_at = d, v
        if i + 1 < len(grid):
            w1_want += d * (grid[i + 1] - v)
    if ks_want == 0:
        ks_at = grid[0]
    assert (w1["w1_num"], w1["n_a"], w1["n_b"]) == (w1_want, na, nb)
    assert (ks["ks_num"], ks["n_a"], ks["n_b"]) == (ks_want, na, nb)
    assert ks["at_value"] == ks_at


texts7 = st.lists(
    st.text(alphabet="ab X", min_size=0, max_size=20),
    min_size=1, max_size=30)


@settings(max_examples=15, deadline=None)
@given(texts7)
def test_fingerprint_clusters_match_brute(ray_session, txts):
    import re

    from rayskema.functions.dedup import fingerprint_clusters

    t = pa.table({"doc_id": pa.array(range(len(txts)), pa.int64()),
                  "text": pa.array(txts, pa.string())})
    out = _collect(fingerprint_clusters(
        rd.from_arrow(t).repartition(3), "text", "doc_id", buckets=2))
    got = {} if out is None else {
        fp: (n, m) for fp, n, m in
        zip(out["fingerprint"].to_pylist(),
            out["n_members"].to_pylist(),
            out["min_doc_id"].to_pylist())}

    fps = {}
    for i, s in enumerate(txts):
        fp = " ".join(sorted(set(re.findall(r"[a-z0-9]+", s.lower()))))
        fps.setdefault(fp, []).append(i)
    want = {fp: (len(ids), min(ids)) for fp, ids in fps.items()
            if len(ids) > 1}
    assert got == want


stump_rows = st.lists(st.tuples(st.integers(0, 15), st.integers(0, 1)),
                      min_size=2, max_size=60)


@settings(max_examples=15, deadline=None)
@given(stump_rows)
def test_decision_stump_matches_brute(ray_session, rows):
    from rayskema.functions import round_half_away
    from rayskema.pipelines.relational import decision_stump

    qs = sorted({q for q, _ in rows})
    if len(qs) < 2:
        rows = rows + [(rows[0][0] + 1, 1)]
        qs = sorted({q for q, _ in rows})
    t = pa.table({"qv": pa.array([q for q, _ in rows], pa.int64()),
                  "y": pa.array([y for _, y in rows], pa.int64())})
    got = decision_stump(rd.from_arrow(t).repartition(3), "qv", "y",
                         buckets=2)

    def xlx(c):
        return float(c) * np.log(c) if c > 0 else 0.0

    best = None
    tp = sum(y for _, y in rows)
    tn = sum(1 - y for _, y in rows)
    for thr in qs[:-1]:
        p = sum(y for q, y in rows if q <= thr)
        ng = sum(1 - y for q, y in rows if q <= thr)
        rp, rn = tp - p, tn - ng
        score = (xlx(p + ng) - xlx(p) - xlx(ng)
                 + xlx(rp + rn) - xlx(rp) - xlx(rn))
        sq = int(round_half_away(score * 1_000_000, 0))
        cand = (sq, thr, p + ng, rp + rn)
        if best is None or (cand[0], cand[1]) < (best[0], best[1]):
            best = cand
    assert (got["score_q"], got["threshold"], got["n_left"],
            got["n_right"]) == best


texts_pmi = st.lists(
    st.text(alphabet="abc d", min_size=0, max_size=24),
    min_size=1, max_size=25)


@settings(max_examples=15, deadline=None)
@given(texts_pmi)
def test_pmi_bigrams_match_brute(ray_session, txts):
    import math
    import re
    from collections import Counter

    from rayskema.functions import round_half_away
    from rayskema.functions.textstats import pmi_bigrams

    t = pa.table({"text": pa.array(txts, pa.string())})
    out = _collect(pmi_bigrams(
        rd.from_arrow(t).repartition(3), "text", min_count=1))
    got = {} if out is None else {
        (a, b): (np_, na, nb, p) for a, b, np_, na, nb, p in
        zip(out["tok_a"].to_pylist(), out["tok_b"].to_pylist(),
            out["n_pair"].to_pylist(), out["n_a"].to_pylist(),
            out["n_b"].to_pylist(), out["pmi"].to_pylist())}

    uni = Counter()
    big = Counter()
    for s in txts:
        toks = re.findall(r"[a-z0-9]+", s.lower())
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    T = sum(uni.values())
    N = sum(big.values())
    want = {}
    for (x, y), c in big.items():
        ratio = (float(c) * T * T) / (float(N) * uni[x] * uni[y])
        want[(x, y)] = (c, uni[x], uni[y],
                        float(round_half_away(math.log(ratio), 6)))
    assert got == want


snm_texts = st.lists(
    st.text(alphabet="abcXY 12", min_size=0, max_size=16),
    min_size=1, max_size=25)


@settings(max_examples=15, deadline=None)
@given(snm_texts)
def test_sorted_neighborhood_matches_brute(ray_session, txts):
    import re

    from rayskema.functions import round_half_away
    from rayskema.functions.dedup import sorted_neighborhood_pairs

    t = pa.table({"doc_id": pa.array(range(len(txts)), pa.int64()),
                  "text": pa.array(txts, pa.string())})
    out = _collect(sorted_neighborhood_pairs(
        rd.from_arrow(t).repartition(3), "doc_id", "text",
        key_len=6, window=3, threshold=0.0, span=2, buckets=2))
    got = sorted(zip(out["id_a"].to_pylist(),
                     out["id_b"].to_pylist(),
                     out["jaccard"].to_pylist())) \
        if out is not None else []

    norm = {i: re.sub(r"[^a-z0-9]", "", s.lower())
            for i, s in enumerate(txts)}
    keep = [(norm[i][:6], i) for i in norm if norm[i]]
    keep.sort()
    want = []
    for a in range(len(keep)):
        for b in range(a + 1, min(a + 3, len(keep))):
            ia, ib = keep[a][1], keep[b][1]
            sa, sb = set(norm[ia]), set(norm[ib])
            j = float(round_half_away(
                len(sa & sb) / len(sa | sb), 6))
            want.append((ia, ib, j))
    assert got == sorted(want)


# E2LSH eps-pair candidates: precision is an INVARIANT (every emitted
# pair is exact-verified inside its bucket), and the pair list is a
# deterministic function of the data — layout cannot change it.
eps_vecs = st.lists(
    st.tuples(st.integers(-8, 8), st.integers(-8, 8),
              st.integers(-8, 8)),
    min_size=2, max_size=40, unique=True)


@settings(max_examples=15, deadline=None)
@given(eps_vecs)
def test_eps_lsh_precision_and_subset(ray_session, pts):
    from rayskema.functions.similarity import (eps_neighbor_pairs,
                                               eps_neighbor_pairs_lsh)
    X = np.array(pts, dtype=np.float64)
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    eps = 3.0

    def pairset(d):
        tab = _collect(d)
        if tab is None:
            return set()
        return set(zip(tab["id_a"].to_pylist(),
                       tab["id_b"].to_pylist()))

    lsh = pairset(eps_neighbor_pairs_lsh(
        rd.from_arrow(t).repartition(3), "embedding", "vec_id",
        eps=eps))
    exact = pairset(eps_neighbor_pairs(
        rd.from_arrow(t).repartition(3), "embedding", "vec_id",
        eps=eps))
    # precision 1.0: every LSH pair is a true eps-pair
    assert lsh <= exact
    for a, b in lsh:
        assert a < b
    # layout independence
    lsh2 = pairset(eps_neighbor_pairs_lsh(
        rd.from_arrow(t).repartition(1), "embedding", "vec_id",
        eps=eps))
    assert lsh2 == lsh
