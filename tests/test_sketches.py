"""Sketch correctness: accuracy envelopes, merge associativity,
serialization round-trips (checkpoint lineage requires byte-stable
serialize/merge, SURVEY §7.4.4)."""

import numpy as np
import pyarrow as pa

from rayskema.state.sketches import (
    ColumnProfile, CountMin, HyperLogLog, TDigest, hash_strings,
)


def test_hash_strings_deterministic_and_offset_invariant():
    a = hash_strings(["abc", "abc", "xyz", ""])
    assert a[0] == a[1] and a[0] != a[2]
    # same values at different buffer offsets hash identically
    chunked = pa.chunked_array([["zz", "abc"], ["xyz", ""]])
    b = hash_strings(chunked)
    assert b[1] == a[0] and b[2] == a[2] and b[3] == a[3]
    # sliced array (nonzero arr.offset)
    sliced = pa.array(["pad", "abc", "xyz"]).slice(1)
    c = hash_strings(sliced)
    assert c[0] == a[0] and c[1] == a[2]


def test_hash_strings_seed_changes_hash():
    a = hash_strings(["abc"], seed=0)
    b = hash_strings(["abc"], seed=1)
    assert a[0] != b[0]


def test_hll_accuracy_and_merge():
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.update_strings([f"a{i}" for i in range(5000)])
    h2.update_strings([f"a{i}" for i in range(2500, 7500)])
    est = h1.merge(h2).estimate()
    assert abs(est - 7500) / 7500 < 0.05
    rt = HyperLogLog.from_bytes(h1.to_bytes())
    assert rt.estimate() == h1.estimate()


def test_tdigest_quantiles_and_merge_associativity():
    rng = np.random.RandomState(7)
    data = rng.normal(size=30000)
    parts = np.array_split(data, 10)
    tds = []
    for p in parts:
        td = TDigest()
        td.update(p)
        tds.append(td)
    # merge left-to-right vs pairwise-tree: quantiles must agree closely
    left = TDigest()
    for td in tds:
        left.merge(TDigest.from_bytes(td.to_bytes()))
    import functools
    tree = functools.reduce(
        lambda a, b: a.merge(b),
        [TDigest.from_bytes(t.to_bytes()) for t in tds])
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(data, q)
        assert abs(left.quantile(q) - exact) < 0.05
        assert abs(left.quantile(q) - tree.quantile(q)) < 0.02


def test_countmin_frequencies():
    cm = CountMin(w=1024, d=4)
    vals = ["hot"] * 1000 + [f"cold{i}" for i in range(200)]
    cm.update_strings(vals)
    assert cm.query_string("hot") >= 1000          # never undercounts
    assert cm.query_string("hot") < 1100
    other = CountMin(w=1024, d=4)
    other.update_strings(["hot"] * 50)
    cm.merge(other)
    assert cm.query_string("hot") >= 1050


def test_profile_merge_and_roundtrip():
    p1 = ColumnProfile.empty(["role"], ["len"])
    p2 = ColumnProfile.empty(["role"], ["len"])
    p1.value_counts["role"] = {"user": 3}
    p2.value_counts["role"] = {"user": 1, "tool": 2}
    p1.tdigests["len"].update(np.array([1.0, 2.0]))
    p2.tdigests["len"].update(np.array([3.0, 4.0]))
    p1.row_count, p2.row_count = 5, 3
    merged = ColumnProfile.from_bytes(p1.to_bytes()).merge(p2)
    assert merged.value_counts["role"] == {"user": 4, "tool": 2}
    assert merged.row_count == 8
    assert merged.tdigests["len"].total_weight == 4


def test_approx_top_tokens(ray_session):
    """Heavy hitters from CMS + per-block candidates: matches the
    exact top-k set on a skewed vocabulary, never underestimates,
    parallelism-independent merge."""
    import pyarrow as pa
    import ray.data as rd

    from rayskema.functions.textstats import approx_top_tokens

    # zipf-ish: token_i appears (50 - i) times
    docs = []
    for i in range(40):
        docs.extend([f"tok{i:02d}"] * (50 - i))
    import numpy as np
    rng = np.random.default_rng(3)
    rng.shuffle(docs)
    texts = [" ".join(docs[j:j + 37]) for j in range(0, len(docs), 37)]
    tab = pa.table({"text": pa.array(texts)})
    exact = {f"tok{i:02d}": 50 - i for i in range(40)}
    for parts in (1, 6):
        out = approx_top_tokens(
            rd.from_arrow(tab).repartition(parts), "text", k=10)
        toks = out["token"].to_pylist()
        ests = out["n_approx"].to_pylist()
        assert toks == [f"tok{i:02d}" for i in range(10)], (parts, toks)
        for t, e in zip(toks, ests):
            assert e >= exact[t]


def test_kmv_exact_below_k_and_approx_above():
    import numpy as np
    from rayskema.state.sketches import KMV, _hash64
    rng = np.random.default_rng(4)
    small = _hash64(np.arange(500, dtype=np.uint64))
    s = KMV(4096)
    s.update_hashes(small)
    s.update_hashes(small)          # idempotent
    assert s.estimate() == 500.0
    assert s.theta == 1.0
    big_a = _hash64(rng.integers(0, 10**12, 120_000).astype(np.uint64))
    big_b = _hash64(rng.integers(5 * 10**11, 15 * 10**11,
                                 120_000).astype(np.uint64))
    a, b = KMV(4096), KMV(4096)
    a.update_hashes(big_a)
    b.update_hashes(big_b)
    na = len(np.unique(big_a))
    assert abs(a.estimate() - na) / na < 0.05
    u = KMV.from_bytes(a.to_bytes()).merge(b)
    nu = len(np.union1d(big_a, big_b))
    assert abs(u.estimate() - nu) / nu < 0.05
    ni = len(np.intersect1d(big_a, big_b))
    est_i = KMV.intersection_estimate(a, b)
    assert abs(est_i - ni) <= max(0.15 * ni, 50)
    # merge order independence (bit-stable)
    u2 = KMV.from_bytes(b.to_bytes()).merge(a)
    assert u2.estimate() == u.estimate()


def test_spacesaving_guarantees_and_merge():
    import collections
    import numpy as np
    from rayskema.state.sketches import SpaceSaving
    rng = np.random.default_rng(1)
    stream = [f"i{int(v)}" for v in rng.zipf(1.5, 100_000) if v < 5000]
    exact = collections.Counter(stream)
    parts = np.array_split(np.array(stream), 7)
    merged = None
    for p in parts:
        u, c = np.unique(p, return_counts=True)
        s = SpaceSaving(64)
        s.update_aggregated(list(u), c)
        merged = s if merged is None else merged.merge(s)
    # mergeable-summary guarantee: overestimate bounded by err,
    # never an underestimate
    for it, c, e in merged.top(20):
        assert c >= exact[it]
        assert c - exact[it] <= e
    # true heavy hitters survive
    want = [t[0] for t in exact.most_common(5)]
    got15 = {t[0] for t in merged.top(15)}
    assert set(want) <= got15
    # below-k exactness
    s = SpaceSaving(64)
    u, c = np.unique(np.array(["a"] * 5 + ["b"] * 3 + ["c"]),
                     return_counts=True)
    s.update_aggregated(list(u), c)
    assert s.top(3) == [("a", 5, 0), ("b", 3, 0), ("c", 1, 0)]
    b = SpaceSaving.from_bytes(s.to_bytes())
    assert b.top(3) == s.top(3)
