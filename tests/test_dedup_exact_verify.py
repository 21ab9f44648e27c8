"""Caps on pair-verification loops (degenerate corpora must complete in
bounded work) and exactness of the candidate-verification operators."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayskema.functions import round_half_away
from rayskema.functions.dedup import (
    charset_jaccard_pairs, exact_shingle_jaccard_pairs,
    minhash_near_dup_pairs, simhash_near_dup_pairs, simhash_pairs,
)
from rayskema.functions.similarity import (
    embedding_near_dup_pairs, embedding_near_dup_pairs_exact,
)


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_round_half_away_matches_sql():
    assert float(round_half_away(157 / 160, 4)) == 0.9813
    assert float(round_half_away(0.98135, 4)) == 0.9814
    assert float(round_half_away(-0.98125, 4)) == -0.9813
    assert float(round_half_away(2.5, 0)) == 3.0


def test_simhash_degenerate_corpus_bounded(ray_session):
    # 20k identical short docs: every block bucket is one giant group;
    # above max_group the verification degrades to O(m) STAR pairing
    # against the representative — bounded work, connectivity kept
    n = 20_000
    ds = _docs(["tiny doc"] * n)
    out = simhash_pairs(ds, "text", "doc_id", max_group=256)
    rows = out.take_all()
    assert len(rows) == n - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in rows)


def test_embedding_degenerate_corpus_bounded(ray_session):
    n, d = 10_000, 16
    vecs = np.tile(np.arange(1, d + 1, dtype=np.float64), (n, 1))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel()), d),
    }))
    out = embedding_near_dup_pairs(ds, "embedding", "vec_id",
                                   cosine_threshold=0.9, max_group=256)
    rows = out.take_all()
    assert len(rows) == n - 1                      # star pairing
    assert all(r["id_a"] == 0 for r in rows)


def test_sample_fraction_one_keeps_all(ray_session):
    from rayskema.functions.sampling import seeded_sample
    tab = pa.table({"doc_id": pa.array(range(100), type=pa.int64())})
    out = seeded_sample(rd.from_arrow(tab), 1.0, seed=1, key="doc_id")
    assert out.count() == 100


def test_charset_tiling_matches_untiled(ray_session):
    rng = np.random.default_rng(3)
    alphabet = "abcdefghijklmnop"
    texts = ["".join(rng.choice(list(alphabet), size=rng.integers(3, 10)))
             for _ in range(60)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(60), type=pa.int64()),
        "text": pa.array(texts),
        "g": pa.array(["x"] * 60),
    }))
    small = charset_jaccard_pairs(ds, "text", "doc_id", ["g"],
                                  threshold=0.6, tile=7).take_all()
    big = charset_jaccard_pairs(ds, "text", "doc_id", ["g"],
                                threshold=0.6, tile=512).take_all()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(small, key=key) == sorted(big, key=key)
    assert len(big) > 0


def _py_char5_jaccard(a: str, b: str) -> float:
    sa = {a[i:i + 5] for i in range(max(len(a) - 4, 1))}
    sb = {b[i:i + 5] for i in range(max(len(b) - 4, 1))}
    return len(sa & sb) / len(sa | sb)


def test_minhash_near_dup_exact_values(ray_session):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "idle")
    texts = [base, near] + [f"unrelated document number {i} with words {i}"
                            for i in range(30)]
    tab = minhash_near_dup_pairs(_docs(texts), "text", "doc_id",
                                 jaccard_threshold=0.5)
    rows = {(tab["id_a"][i].as_py(), tab["id_b"][i].as_py()):
            tab["jaccard"][i].as_py() for i in range(tab.num_rows)}
    assert (0, 1) in rows
    expect = float(round_half_away(_py_char5_jaccard(base, near), 4))
    assert rows[(0, 1)] == expect


def _py_word3_jaccard(a: str, b: str) -> float:
    def s(t):
        toks = t.lower().split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    sa, sb = s(a), s(b)
    return len(sa & sb) / len(sa | sb)


def test_simhash_near_dup_exact_values(ray_session):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("zeta", "zeta2")
    texts = [base, near] + [f"totally different text {i} here now ok {i}"
                            for i in range(20)]
    # this pair's simhash hamming is 11 (word-jaccard 0.45 — blocking
    # is tuned for >=0.8 near-dups); widen the pre-prune to reach it
    tab = simhash_near_dup_pairs(_docs(texts), "text", "doc_id",
                                 jaccard_threshold=0.3, max_hamming=16)
    got = {(tab["id_a"][i].as_py(), tab["id_b"][i].as_py()):
           tab["jaccard"][i].as_py() for i in range(tab.num_rows)}
    assert (0, 1) in got
    assert got[(0, 1)] == float(round_half_away(
        _py_word3_jaccard(base, near), 4))


def test_exact_shingle_jaccard_direct(ray_session):
    texts = ["abcdefgh", "abcdefgx", "zzzz"]
    cand = pa.table({"id_a": pa.array([0, 0], type=pa.int64()),
                     "id_b": pa.array([1, 2], type=pa.int64())})
    tab = exact_shingle_jaccard_pairs(_docs(texts), cand, "text", "doc_id",
                                      kind="char5", threshold=0.0)
    got = {(tab["id_a"][i].as_py(), tab["id_b"][i].as_py()):
           tab["jaccard"][i].as_py() for i in range(tab.num_rows)}
    assert got[(0, 1)] == float(round_half_away(
        _py_char5_jaccard(texts[0], texts[1]), 4))
    assert got[(0, 2)] == 0.0


def test_embedding_exact_pairs_match_numpy(ray_session):
    rng = np.random.default_rng(9)
    n, d = 120, 8
    m = rng.standard_normal((n, d))
    m[7] = m[3] + rng.standard_normal(d) * 0.01   # planted near-dup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel()), d),
    }))
    tab = embedding_near_dup_pairs_exact(ds, "embedding", "vec_id",
                                         cosine_threshold=0.6)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    ia, ib = np.nonzero(np.triu(cos >= 0.6, k=1))
    want = {(int(a), int(b)): float(round_half_away(cos[a, b], 4))
            for a, b in zip(ia, ib)}
    got = {(tab["id_a"][i].as_py(), tab["id_b"][i].as_py()):
           tab["cosine"][i].as_py() for i in range(tab.num_rows)}
    assert got == want
    assert (3, 7) in got


def test_snm_window_semantics(ray_session):
    """Sorted-neighborhood pairing: with key 'skey'=norm prefix, sort
    order is by normalized text; window=3 pairs each row with the next
    2 only, across any span boundary, each pair exactly once."""
    from rayskema.functions.dedup import sorted_neighborhood_pairs
    import ray

    # norms sort as: aaa1(id0) aaa2(id3) aab(id1) zzz(id2); empty drops
    ds = _docs(["AAA 1!", "aab", "zzz", "aaa?2", "  .,  "])
    out = pa.concat_tables([t for t in ray.get(
        sorted_neighborhood_pairs(
            ds, "doc_id", "text", key_len=4, window=3,
            threshold=0.0, span=2, buckets=3).to_arrow_refs())
        if t.num_rows])
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    # sort order ids: [0, 3, 1, 2] -> d=1 pairs (0,3)(3,1)(1,2),
    # d=2 pairs (0,1)(3,2)
    assert got == [(0, 1), (0, 3), (1, 2), (3, 1), (3, 2)]


def test_snm_layout_and_span_independent(ray_session):
    """Same pairs regardless of block layout and span size (the
    overlap-copy ownership rule must not duplicate or drop boundary
    pairs)."""
    from rayskema.functions.dedup import sorted_neighborhood_pairs
    import ray

    texts = [f"doc {i % 7} common text body {i}" for i in range(101)]
    outs = []
    for nparts, span in ((1, 8192), (13, 4), (5, 16)):
        ds = _docs(texts)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = pa.concat_tables([t for t in ray.get(
            sorted_neighborhood_pairs(
                ds, "doc_id", "text", key_len=10, window=4,
                threshold=0.0, span=span, buckets=4).to_arrow_refs())
            if t.num_rows])
        outs.append(sorted(zip(out["id_a"].to_pylist(),
                               out["id_b"].to_pylist(),
                               out["jaccard"].to_pylist())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 100 + 99 + 98          # n*(w-1) minus tail


def test_containment_asymmetric_pair(ray_session):
    """A short doc fully quoted inside a long one: containment
    short->long is 1.0 while Jaccard is far below threshold — the
    directed pair appears exactly once, in the right direction."""
    import ray

    from rayskema.functions.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    long_doc = ("intro words here " + quote
                + " and many more unrelated trailing tokens "
                + "one two three four five six seven eight nine ten")
    ds = _docs([quote, long_doc, "totally different content words"])
    out = containment_pairs(ds, "text", "doc_id", threshold=0.9,
                            buckets=3)
    rows = list(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                    out["containment"].to_pylist()))
    assert rows == [(0, 1, 1.0)]


def test_containment_prefix_filter_complete(ray_session):
    """Prefix-filtered candidates reproduce the exhaustive all-pairs
    result exactly (recall 1.0) on a corpus with hot shared shingles,
    regardless of block layout."""
    import numpy as np
    import ray

    from rayskema.functions.dedup import (_row_shingle_sets,
                                          containment_pairs)

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base + f" tail {i % 4} {i % 3}" for i in range(40)]
    texts += ["the quick brown fox jumps", "unrelated stuff entirely"]
    ds = _docs(texts)

    sets = _row_shingle_sets(pa.array(texts), "word3")
    want = []
    for i, sa in enumerate(sets):
        for j, sb in enumerate(sets):
            if i == j:
                continue
            inter = len(np.intersect1d(sa, sb))
            c = inter / max(len(sa), 1)
            if c >= 0.8:
                want.append((i, j))
    for nparts in (1, 6):
        d = ds.repartition(nparts) if nparts > 1 else ds
        out = containment_pairs(d, "text", "doc_id", threshold=0.8,
                                buckets=4)
        got = sorted(zip(out["id_a"].to_pylist(),
                         out["id_b"].to_pylist()))
        assert got == sorted(want)
        assert len(got) > 0


def test_containment_identical_docs_both_directions(ray_session):
    """Identical documents contain each other: both directed rows
    appear with containment 1.0, and candidates survive dedup across
    multiple shared shingles."""
    from rayskema.functions.dedup import containment_pairs

    text = "one two three four five six seven eight nine ten"
    ds = _docs([text, text, "something else entirely here now"])
    out = containment_pairs(ds, "text", "doc_id", threshold=0.99,
                            buckets=2)
    rows = sorted(zip(out["id_a"].to_pylist(),
                      out["id_b"].to_pylist(),
                      out["containment"].to_pylist()))
    assert rows == [(0, 1, 1.0), (1, 0, 1.0)]
