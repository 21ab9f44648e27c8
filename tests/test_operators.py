"""Unit/e2e tests for the operator suite (relational checks, dedup,
similarity, text stats, multimodal plumbing, contract round-trip).

Reference test-strategy analogue: per-operator unit tests
(/root/reference/dsl/*_test.go) on tiny in-memory tables."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)


# ---------------------------------------------------------------------------
# relational
# ---------------------------------------------------------------------------

def test_find_duplicates(ray_session):
    from rayskema.pipelines.relational import find_duplicates
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "b", "c", "c", "c"], "v": [1, 1, 2, 3, 3, 3]}))
    out = _collect(find_duplicates(ds, ["k", "v"], buckets=4)).sort_by("k")
    assert out["k"].to_pylist() == ["a", "c"]
    assert out["n"].to_pylist() == [2, 3]


def test_monotonic_violations(ray_session):
    from rayskema.pipelines.relational import monotonic_violations
    ds = rd.from_arrow(pa.table({
        "g": ["x", "x", "x", "y", "y"],
        "o": [0, 1, 2, 0, 1],
        "v": [1.0, 3.0, 2.0, 5.0, 7.0],
        "id": [10, 11, 12, 20, 21]}))
    out = _collect(monotonic_violations(ds, "g", "o", "v", ["id"], buckets=2))
    assert out["id"].to_pylist() == [12]
    assert out["prev_value"].to_pylist() == [3.0]


def test_distinct_count(ray_session):
    from rayskema.pipelines.relational import distinct_count
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 2, 2], "v": ["a", "a", "b", "c", "c"]}))
    out = _collect(distinct_count(ds, "g", "v", buckets=2)).sort_by("g")
    assert out["g"].to_pylist() == [1, 2]
    assert out["n_distinct"].to_pylist() == [2, 1]


def test_distinct_count_null_semantics(ray_session):
    # SQL count(DISTINCT v): nulls don't count, but an all-null group
    # stays in the output with 0
    from rayskema.pipelines.relational import distinct_count
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 2, 3],
        "v": ["a", None, "b", None, "c"]}))
    out = _collect(distinct_count(ds, "g", "v", buckets=2)).sort_by("g")
    assert out["g"].to_pylist() == [1, 2, 3]
    assert out["n_distinct"].to_pylist() == [2, 0, 1]


def test_ref_violations_broadcast(ray_session):
    from rayskema.pipelines.relational import ref_violations
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3], "fk": ["a", "zz", "b"]}))
    valid = ray.put(pa.array(["a", "b"]))
    out = _collect(ref_violations(ds, "fk", valid, ["id"]))
    assert out["id"].to_pylist() == [2]
    assert out["code"].to_pylist() == ["conflict"]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_duplicates_first_wins(ray_session):
    from rayskema.functions.dedup import exact_duplicates
    ds = rd.from_arrow(pa.table({
        "id": [5, 3, 9, 1], "k": ["x", "x", "x", "y"]}))
    out = _collect(exact_duplicates(ds, ["k"], "id", buckets=2)).sort_by("id")
    assert out["id"].to_pylist() == [5, 9]
    assert out["keeper"].to_pylist() == [3, 3]


def test_minhash_finds_near_dups(ray_session):
    from rayskema.functions.dedup import minhash_lsh_pairs
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy")
    other = "completely different content about ray data pipelines " * 10
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "text": [base, near, other]}))
    out = _collect(minhash_lsh_pairs(ds, "text", "doc_id",
                                     jaccard_threshold=0.5, buckets=4))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_finds_near_dups(ray_session):
    from rayskema.functions.dedup import simhash_pairs
    # one changed token out of 200 distinct => small hamming distance;
    # blocking guarantees detection for hamming <= n_blocks - 1
    base = " ".join(f"word{i:03d}" for i in range(200))
    near = base.replace("word100", "changed")
    other = " ".join(f"other{i:03d}" for i in range(200))
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "text": [base, near, other]}))
    out = _collect(simhash_pairs(ds, "text", "doc_id", max_hamming=4,
                                 buckets=4))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_ngram_jaccard_near_dups(ray_session):
    from rayskema.functions.dedup import ngram_jaccard_near_dup_pairs
    # word-shingle Jaccard is order-sensitive at the 3-gram level but
    # tolerant of a small edit; an unrelated vocabulary never pairs
    base = " ".join(f"word{i:03d}" for i in range(100))
    near = base.replace("word050", "changed")   # 3 of 98 shingles differ
    other = " ".join(f"other{i:03d}" for i in range(100))
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "text": [base, near, other]}))
    out = ngram_jaccard_near_dup_pairs(ds, "text", "doc_id",
                                       jaccard_threshold=0.8, buckets=4)
    assert out["id_a"].to_pylist() == [1]
    assert out["id_b"].to_pylist() == [2]
    # true word-3-gram jaccard: 95 shared / 101 union
    assert abs(out["jaccard"].to_pylist()[0] - 95 / 101) < 1e-3


def test_ngram_jaccard_whitespace_padding(ray_session):
    # regression: split-regex edge artifacts must not create phantom
    # shingles — '  a b c ' and 'a b c' are word-identical (jaccard 1)
    from rayskema.functions.dedup import (
        ngram_jaccard_near_dup_pairs, word_shingle_hashes)
    rid, h = word_shingle_hashes(pa.array(["  a b c ", "a b c"]))
    assert set(h[rid == 0]) == set(h[rid == 1])
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["  a b c ", "a b c"]}))
    out = ngram_jaccard_near_dup_pairs(ds, "text", "doc_id",
                                       jaccard_threshold=0.9, buckets=2)
    assert out["id_a"].to_pylist() == [1]
    assert out["jaccard"].to_pylist() == [1.0]


def test_charset_jaccard_exact(ray_session):
    from rayskema.functions.dedup import charset_jaccard_pairs
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["abc", "abcd", "xyz"],
        "g": ["g1", "g1", "g1"]}))
    out = _collect(charset_jaccard_pairs(ds, "text", "doc_id", ["g"],
                                         threshold=0.7, buckets=2))
    assert out["id_a"].to_pylist() == [1]
    assert out["id_b"].to_pylist() == [2]
    assert out["jaccard"].to_pylist() == [0.75]  # |{abc}|/|{abcd}|


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def _vec_table(n=50, d=16, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[1] = m[0] + 0.01 * rng.standard_normal(d).astype(np.float32)  # near-dup
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array(list(m), type=pa.list_(pa.float32(), d)),
    })


def test_knn_brute_exact(ray_session):
    from rayskema.functions.similarity import knn_cosine_brute
    tab = _vec_table()
    ds = rd.from_arrow(tab)
    out = knn_cosine_brute(ds, "embedding", "vec_id", [0], k=3)
    rows = out.to_pylist()
    assert rows[0]["neighbor_id"] == 0 and rows[0]["rank"] == 1
    assert rows[1]["neighbor_id"] == 1  # planted near-dup is rank 2
    # verify against numpy ground truth
    m = np.stack([np.array(v) for v in tab["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(-(m @ m[0]))[:3]
    assert [r["neighbor_id"] for r in rows] == order.tolist()


def test_embedding_near_dups(ray_session):
    from rayskema.functions.similarity import embedding_near_dup_pairs
    ds = rd.from_arrow(_vec_table())
    out = _collect(embedding_near_dup_pairs(
        ds, "embedding", "vec_id", cosine_threshold=0.99, buckets=4))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 1) in pairs


# ---------------------------------------------------------------------------
# textstats
# ---------------------------------------------------------------------------

def test_token_and_quality_stats(ray_session):
    from rayskema.functions.textstats import quality_stats, token_stats
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["hello world 42!", "  a  bb  "]}))
    t = _collect(token_stats(ds, "text", "doc_id")).sort_by("doc_id")
    assert t["n_tokens"].to_pylist() == [3, 2]
    q = _collect(quality_stats(ds, "text", "doc_id")).sort_by("doc_id")
    assert q["n_alpha"].to_pylist() == [10, 3]
    assert q["n_digit"].to_pylist() == [2, 0]
    assert q["n_punct"].to_pylist() == [1, 0]
    assert q["max_word_len"].to_pylist() == [5, 2]


def test_fingerprints(ray_session):
    import hashlib
    from rayskema.functions.textstats import fingerprint_md5, fingerprint_rolling
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["abc"]}))
    fp = _collect(fingerprint_md5(ds, "text", "doc_id"))
    assert fp["fp"].to_pylist() == [hashlib.md5(b"abc").hexdigest()]
    fr = _collect(fingerprint_rolling(ds, "text", "doc_id"))
    assert len(fr["fp64"].to_pylist()) == 1


def test_lang_id_markers(ray_session):
    from rayskema.functions.textstats import lang_id
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the cat is in the house and it is lazy",
                 "el gato que esta en la casa de los perros",
                 "zzz qqq www"]}))
    out = _collect(lang_id(ds, "text", "doc_id")).sort_by("doc_id")
    assert out["pred_lang"].to_pylist() == ["en", "es", "und"]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_decode_stage_requires_decoder():
    from rayskema.stages.multimodal import DecodeStage, sniff_decode
    with pytest.raises(NotImplementedError):
        DecodeStage("payload", ["id"], decoder=None)
    # compressed formats need external codec libraries
    with pytest.raises(NotImplementedError):
        sniff_decode(b"\xff\xd8\xff\xe0JFIF-ish")
    with pytest.raises(ValueError):
        sniff_decode(b"????unknown")


def test_decode_features_fake(ray_session):
    from rayskema.stages.multimodal import decode_features
    ds = rd.from_arrow(pa.table({
        "id": [1, 2], "payload": [b"\x00" * 100, b"\xff" * 100]}))
    out = _collect(decode_features(ds, "payload", ["id"], fake=True,
                                   concurrency=(1, 2))).sort_by("id")
    assert out["height"].to_pylist() == [8, 8]
    means = out["channel_mean"].to_pylist()
    assert means[0] == [0.0, 0.0, 0.0]
    assert means[1] == [255.0, 255.0, 255.0]


def test_frame_sample_stage():
    from rayskema.stages.multimodal import FrameSampleStage
    stage = FrameSampleStage("payload", ["id"], frame_bytes=10, stride=2)
    tab = pa.table({"id": [7], "payload": [bytes(range(100)) * 1]})
    out = stage(tab)
    assert out["frame_idx"].to_pylist() == [0, 2, 4, 6, 8]
    assert out["frame"].to_pylist()[0] == bytes(range(10))


# ---------------------------------------------------------------------------
# contract round-trip
# ---------------------------------------------------------------------------

def test_contract_roundtrip(tmp_path):
    from rayskema.contract import load_contract, save_contract
    from rayskema.schema import transcript_schema
    s = transcript_schema()
    p = str(tmp_path / "contract.json")
    save_contract(s, p)
    s2 = load_contract(p)
    assert s2 == s
    assert s2.schema_hash() == s.schema_hash()


# ---------------------------------------------------------------------------
# top-k / windows / as-of join
# ---------------------------------------------------------------------------

def test_topk_per_group(ray_session):
    from rayskema.pipelines.relational import topk_per_group
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 1, 2],
        "v": [10.0, 30.0, 20.0, 30.0, 5.0],
        "id": [100, 101, 102, 103, 200]}))
    out = _collect(topk_per_group(ds, "g", "v", "id", k=2, buckets=2))
    out = out.sort_by([("g", "ascending"), ("rank", "ascending")])
    # ties on v=30 broken by ascending id: 101 then 103
    assert out["id"].to_pylist() == [101, 103, 200]
    assert out["rank"].to_pylist() == [1, 2, 1]


def test_windowed_agg(ray_session):
    from rayskema.pipelines.relational import windowed_agg
    ts = pa.array([0, 3_600_000_000, 90_000_000_000],
                  type=pa.timestamp("us"))  # two in day 0, one in day 1
    ds = rd.from_arrow(pa.table({
        "ts": ts, "g": ["a", "a", "a"], "v": [1.0, 5.0, 2.0]}))
    out = _collect(windowed_agg(ds, "ts", ["g"], "v")).sort_by(
        [("window_start", "ascending")])
    assert out["n"].to_pylist() == [2, 1]
    assert out["min_value"].to_pylist() == [1.0, 2.0]
    assert out["max_value"].to_pylist() == [5.0, 2.0]


def test_asof_join(ray_session):
    from rayskema.pipelines.relational import asof_join
    left = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([100, 300, 100], type=pa.timestamp("us")),
        "eid": pa.array([10, 11, 20], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "rts": pa.array([50, 200, 500], type=pa.timestamp("us"))}))
    out = _collect(asof_join(
        left, right, key="k", left_key="uid", left_ts="ts",
        right_ts="rts", left_id="eid", value_col="rts",
        buckets=2)).sort_by([("lid", "ascending")])
    # eid 10: latest rts<=100 is 50; eid 11: 200; eid 20: none (dropped)
    assert out["lid"].to_pylist() == [10, 11]
    vals = pa.compute.cast(out["asof_value"], pa.int64()).to_pylist()
    assert vals == [50, 200]


def test_exact_ks_discrete(ray_session):
    from rayskema.functions.drift import exact_ks_discrete
    # A = {1, 2}, B = {2, 3}: ECDFs diverge most at v=1 (0.5 vs 0.0)
    # and v=2 (1.0 vs 0.5) -> KS = 0.5; null value excluded
    tab = pa.table({
        "v": pa.array([1, 2, 2, 3, None], type=pa.int64()),
        "g": ["a", "a", "b", "b", "a"]})
    ks, n_a, n_b = exact_ks_discrete(
        rd.from_arrow(tab).repartition(2), "v", "g", "a")
    assert (ks, n_a, n_b) == (0.5, 2, 2)
    # identical samples -> 0
    ks2, _, _ = exact_ks_discrete(
        rd.from_arrow(pa.table({
            "v": pa.array([1, 2, 1, 2], type=pa.int64()),
            "g": ["a", "a", "b", "b"]})), "v", "g", "a")
    assert ks2 == 0.0


def test_profile_columns(ray_session):
    from rayskema.functions.profile import profile_columns
    tab = pa.table({
        "a": pa.array([1, 2, 2, None, 5], type=pa.int64()),
        "b": pa.array(["x", "y", None, "x", "z"]),
    })
    out = profile_columns(rd.from_arrow(tab).repartition(3),
                          ["a", "b"], buckets=4)
    assert out["col"].to_pylist() == ["a", "b"]
    assert out["n"].to_pylist() == [5, 5]
    assert out["n_null"].to_pylist() == [1, 1]
    assert out["n_distinct"].to_pylist() == [3, 3]  # nulls excluded
    assert out["min_num"].to_pylist() == [1.0, None]
    assert out["max_num"].to_pylist() == [5.0, None]
    assert out["min_str"].to_pylist() == [None, "x"]
    assert out["max_str"].to_pylist() == [None, "z"]


def test_session_windows(ray_session):
    from rayskema.pipelines.relational import session_windows
    ds = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([0, 10, 10, 21, 5, 100],
                       type=pa.timestamp("us"))}))
    out = _collect(session_windows(
        ds, key="uid", ts_col="ts", gap_us=10, buckets=2)).sort_by(
            [("uid", "ascending"), ("session_idx", "ascending")])
    # uid 1: 0,10 (gap 10 == threshold stays), tie 10, then 21 (gap 11
    # > 10 -> new session). uid 2: numbering restarts at 1; 5 -> 100
    # is a boundary.
    assert out["uid"].to_pylist() == [1, 1, 2, 2]
    assert out["session_idx"].to_pylist() == [1, 2, 1, 2]
    assert [t.timestamp() * 1e6 for t in
            out["session_start"].to_pylist()] == [0, 21, 5, 100]
    assert out["n_events"].to_pylist() == [3, 1, 1, 1]


def test_range_count_join(ray_session):
    from rayskema.pipelines.relational import range_count_join
    left = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([100, 300, 100, 100], type=pa.timestamp("us")),
        "oid": pa.array([10, 11, 20, 30], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "rts": pa.array([100, 149, 150, 99, 100],
                        type=pa.timestamp("us"))}))
    out = _collect(range_count_join(
        left, right, key="k", left_key="uid", left_ts="ts",
        right_ts="rts", left_id="oid", span_us=50,
        buckets=2)).sort_by([("lid", "ascending")])
    assert out["lid"].to_pylist() == [10, 11, 20, 30]
    # oid 10: rts in [100,150) -> {100,149}; start inclusive, end
    # exclusive (150 excluded). oid 11: none in [300,350).
    # oid 20: [100,150) -> {100} (99 before start). oid 30: key 3 has
    # no right rows at all but the left row is still emitted.
    assert out["n_matches"].to_pylist() == [2, 0, 1, 0]


def test_range_count_join_duplicate_left_ids(ray_session):
    # regression: repeated left_id values must pair each start marker
    # with ITS end marker, not a neighbor's
    from rayskema.pipelines.relational import range_count_join
    left = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([0, 100], type=pa.timestamp("us")),
        "oid": pa.array([7, 7], type=pa.int64())}))   # same id twice
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], type=pa.int64()),
        "rts": pa.array([5, 10, 105], type=pa.timestamp("us"))}))
    out = _collect(range_count_join(
        left, right, key="k", left_key="uid", left_ts="ts",
        right_ts="rts", left_id="oid", span_us=50,
        buckets=2)).sort_by([("n_matches", "ascending")])
    # interval [0,50) -> {5,10} = 2; [100,150) -> {105} = 1
    assert out["n_matches"].to_pylist() == [1, 2]
    assert out["lid"].to_pylist() == [7, 7]


def test_session_windows_null_ts(ray_session):
    from rayskema.pipelines.relational import session_windows
    ds = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([0, None, 100], type=pa.timestamp("us"))}))
    out = _collect(session_windows(
        ds, key="uid", ts_col="ts", gap_us=10, buckets=2)).sort_by(
            [("session_idx", "ascending")])
    # null row dropped; remaining rows split into two sessions
    assert out["session_idx"].to_pylist() == [1, 2]
    assert out["n_events"].to_pylist() == [1, 1]


def test_i18n_render():
    from rayskema.i18n import render
    v = pa.table({
        "conv_id": ["c1", "c2"], "turn_idx": [0, 1],
        "path": ["/role", "/x"], "code": ["invalid_enum", "business_rule"],
        "rule": ["r", "r"], "message": ["value not in enum", "custom"],
        "params": ["", ""]})
    ja = render(v, "ja")
    assert ja["message"].to_pylist() == ["列挙値ではありません", "業務ルール違反"]
    # en keeps engine messages; codes never change
    assert render(v, "en")["message"].to_pylist()[0] == "value not in enum"
    assert ja["code"].to_pylist() == v["code"].to_pylist()


def test_diff_snapshots(ray_session):
    from rayskema.pipelines.relational import diff_snapshots
    old = rd.from_arrow(pa.table({
        "k": [1, 2, 3], "v": ["a", "b", "c"]}))
    new = rd.from_arrow(pa.table({
        "k": [2, 3, 4], "v": ["b", "CHANGED", "d"]}))
    out = _collect(diff_snapshots(old, new, ["k"], ["v"],
                                  buckets=2)).sort_by("k")
    assert list(zip(out["k"].to_pylist(), out["change"].to_pylist())) == [
        (1, "removed"), (3, "changed"), (4, "added")]


def test_knn_ivf_high_recall(ray_session):
    from rayskema.functions.similarity import knn_cosine_brute, knn_cosine_ivf
    tab = _vec_table(n=200)
    ds = rd.from_arrow(tab)
    exact = knn_cosine_brute(ds, "embedding", "vec_id", [0, 7], k=5)
    approx = knn_cosine_ivf(ds, "embedding", "vec_id", [0, 7], k=5,
                            n_clusters=8, n_probe=4)
    ex = set(zip(exact["query_id"].to_pylist(),
                 exact["neighbor_id"].to_pylist()))
    ap = set(zip(approx["query_id"].to_pylist(),
                 approx["neighbor_id"].to_pylist()))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5
    # the planted near-dup must be found for query 0
    assert (0, 1) in ap


def test_sequence_violations(ray_session):
    from rayskema.pipelines.relational import sequence_violations
    ds = rd.from_arrow(pa.table({
        "g": ["u1", "u1", "u1", "u1", "u2", "u2", "u3"],
        "o": [0, 1, 2, 3, 0, 1, 0],
        "v": ["start", "work", "work", "stop", "work", None, "start"],
        "id": [1, 2, 3, 4, 5, 6, 7]}))
    out = _collect(sequence_violations(
        ds, "g", ["o"], "v", ["id"],
        allowed_first=("start",),
        allowed_after={"stop": ()},  # nothing may follow a stop
        no_repeat=True, buckets=2)).sort_by([("id", "ascending"),
                                             ("code", "ascending")])
    rows = list(zip(out["id"].to_pylist(), out["code"].to_pylist()))
    # id=3: work repeats; id=5: u2 starts with 'work'; null at id=6
    # never matches; u3 starts legally
    assert rows == [(3, "sequence_repeat"), (5, "sequence_start")]
    # transitions: stop -> anything is illegal
    ds2 = rd.from_arrow(pa.table({
        "g": ["a", "a", "a"], "o": [0, 1, 2],
        "v": ["start", "stop", "start"], "id": [1, 2, 3]}))
    out2 = _collect(sequence_violations(
        ds2, "g", ["o"], "v", ["id"],
        allowed_after={"stop": ()}, buckets=2))
    assert out2["id"].to_pylist() == [3]
    assert out2["code"].to_pylist() == ["sequence_transition"]
    assert out2["prev_value"].to_pylist() == ["stop"]


def test_repetition_stats(ray_session):
    from rayskema.functions.textstats import repetition_stats
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3],
        "text": ["a b\na b\nc", "x y x x", ""]}))
    out = _collect(repetition_stats(ds, "text", "id")).sort_by("id")
    assert out["n_lines"].to_pylist() == [3, 1, 1]
    assert out["n_dup_lines"].to_pylist() == [1, 0, 0]
    assert out["dup_line_frac"].to_pylist() == [0.3333, 0.0, 0.0]
    # doc1: tokens a,b,a,b,c -> top 'a' 2/5; doc2: x 3/4; doc3 empty
    assert out["top_word_frac"].to_pylist() == [0.4, 0.75, 0.0]


def test_top_k_tokens(ray_session):
    from rayskema.functions.textstats import top_k_tokens
    ds = rd.from_arrow(pa.table({
        "text": ["b a a", "c b a", "  ", None]}))
    out = _collect(top_k_tokens(ds, "text", k=2, buckets=2))
    assert out["token"].to_pylist() == ["a", "b"]
    assert out["n"].to_pylist() == [3, 2]


def test_near_dup_clusters(ray_session):
    from rayskema.functions.dedup import near_dup_clusters
    # supply the pair graph directly: {1,2,3} chained, {7,9} paired
    pairs = pa.table({"id_a": [1, 2, 7], "id_b": [2, 3, 9],
                      "jaccard": [1.0, 1.0, 1.0]})
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 5, 7, 9], "text": ["x"] * 6}))
    out = _collect(near_dup_clusters(
        ds, "text", "doc_id", pairs=pairs)).sort_by("doc_id")
    assert out["rep_id"].to_pylist() == [1, 1, 1, 5, 7, 7]
    assert out["keep"].to_pylist() == [True, False, False, True, True,
                                       False]


def test_scrub_text(ray_session):
    from rayskema.functions.textstats import scrub_text
    ds = rd.from_arrow(pa.table({
        "id": [1, 2],
        "text": ["mail a@b.co and https://x.io/z num 12345678",
                 "clean text"]}))
    out = _collect(scrub_text(ds, "text", "id")).sort_by("id")
    assert out["text_clean"].to_pylist() == [
        "mail <EMAIL> and <URL> num <NUM>", "clean text"]
    assert out["n_redactions"].to_pylist() == [3, 0]


def test_stratified_sample(ray_session):
    from rayskema.functions.sampling import stratified_sample
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 4 + ["b"] * 2,
        "id": [1, 2, 3, 4, 5, 6],
        "text": ["t1", "t2", "t3", "t4", "t5", "t6"]}))
    out = _collect(stratified_sample(ds, "g", "id", "text", k=2,
                                     buckets=2))
    # exactly k per group (2 for a, 2 for b), ranks 1..k, deterministic
    import collections
    cnt = collections.Counter(out["g"].to_pylist())
    assert cnt == {"a": 2, "b": 2}
    assert sorted(out["rank"].to_pylist()) == [1, 1, 2, 2]
    again = _collect(stratified_sample(ds, "g", "id", "text", k=2,
                                       buckets=2))
    assert out.sort_by("id").equals(again.sort_by("id"))


def test_group_quantiles(ray_session):
    from rayskema.pipelines.relational import group_quantiles
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": [4.0, 1.0, 3.0, 2.0, 10.0, None, 30.0]}))
    out = _collect(group_quantiles(ds, "g", "v", [0.5, 1.0], buckets=2))
    rows = {(r["g"], r["q"]): r["value"]
            for r in out.to_pylist()}
    # a: sorted [1,2,3,4]; p50 rank ceil(0.5*4)=2 -> 2.0; max -> 4.0
    # b: nulls excluded, sorted [10,30]; p50 -> 10.0; max -> 30.0
    assert rows == {("a", 0.5): 2.0, ("a", 1.0): 4.0,
                    ("b", 0.5): 10.0, ("b", 1.0): 30.0}


def test_kmeans_distributed_matches_local(ray_session):
    from rayskema.functions.similarity import (_init_hash, _matrix,
                                               kmeans_assign, kmeans_fit)
    rng = np.random.default_rng(3)
    # two well-separated blobs
    m = np.concatenate([rng.normal(0, 0.1, (40, 4)),
                        rng.normal(5, 0.1, (40, 4))])
    ids = np.arange(80)
    tab = pa.table({"id": ids, "vec": pa.array(list(m.astype(np.float32)),
                                               type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tab)
    c, hist = kmeans_fit(ds, "vec", id_col="id", n_clusters=2, iters=5,
                         seed=1)
    assert all(hist[i + 1] <= hist[i] * (1 + 1e-9)
               for i in range(len(hist) - 1))
    out = _collect(kmeans_assign(ds, "vec", "id", c)).sort_by("id")
    cl = out["cluster"].to_numpy(zero_copy_only=False)
    # the two blobs land in two distinct pure clusters
    assert len(set(cl[:40])) == 1 and len(set(cl[40:])) == 1
    assert cl[0] != cl[-1]
    # local reference with the identical content-keyed init
    mm = _matrix(tab["vec"])
    ref_c = mm[np.argsort(_init_hash(ids, 1))[:2]].copy()
    for _ in range(len(hist)):
        d2 = ((mm[:, None, :] - ref_c[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for cc in range(2):
            if (a == cc).any():
                ref_c[cc] = mm[a == cc].mean(axis=0)
    assert np.allclose(ref_c, c, atol=1e-9)
    # streaming-input mode (no mid-pipeline materialization): the
    # pruned scan is re-executed per iteration, same centroids
    c2, _ = kmeans_fit(ds, "vec", id_col="id", n_clusters=2, iters=5,
                       seed=1, materialize_input=False)
    assert np.allclose(c2, c, atol=1e-12)


def test_assemble_sequences(ray_session):
    from rayskema.pipelines.relational import assemble_sequences
    ds = rd.from_arrow(pa.table({
        "g": ["u1", "u1", "u1", "u2", "u2"],
        "o": [2, 0, 1, 1, 0],
        "v": ["c", "a", None, "y", "x"]}))
    out = _collect(assemble_sequences(ds, "g", ["o"], "v",
                                      buckets=2)).sort_by("g")
    assert out["g"].to_pylist() == ["u1", "u2"]
    # nulls skipped (string_agg semantics), order restored by o
    assert out["seq"].to_pylist() == ["a|c", "x|y"]
    assert out["n"].to_pylist() == [2, 2]


def test_group_histogram(ray_session):
    from rayskema.pipelines.relational import group_histogram
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "v": [-5.0, 15.0, 999.0, 5.0, None]}))
    out = _collect(group_histogram(ds, "g", "v", lo=0.0, hi=100.0,
                                   n_bins=10, buckets=2))
    rows = {(r["g"], r["bin"]): r["n"] for r in out.to_pylist()}
    # -5 clamps to bin 0, 15 -> bin 1, 999 clamps to bin 9; null dropped
    assert rows == {("a", 0): 1, ("a", 1): 1, ("a", 9): 1, ("b", 0): 1}


def test_contamination_flags(ray_session):
    from rayskema.functions.dedup import contamination_flags
    corpus = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "text": ["benchmark q1", "clean doc", "benchmark q1", "other"]}))
    probes = rd.from_arrow(pa.table({
        "id": [100], "text": ["benchmark q1"]}))
    out = _collect(contamination_flags(corpus, probes, "text", "id",
                                       buckets=4)).sort_by("id")
    # both copies of the probe text flagged, nothing else
    assert out["id"].to_pylist() == [1, 3]


def test_hash_join_all_types_vs_duckdb(ray_session):
    import duckdb
    from rayskema.pipelines.relational import hash_join

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 120
    lk = rng.integers(0, 80, n_l).astype("int64")
    lk_obj = lk.astype(object)
    lk_obj[::37] = None                       # null keys never match
    ltab = pa.table({
        "k": pa.array(lk_obj, type=pa.int64()),
        "lv": pa.array(rng.integers(0, 1000, n_l), type=pa.int64()),
    })
    rk = rng.integers(40, 140, n_r).astype("int64")  # partial overlap
    rk_obj = rk.astype(object)
    rk_obj[::29] = None
    rtab = pa.table({
        "rk": pa.array(rk_obj, type=pa.int64()),
        "rv": pa.array([f"s{i % 13}" for i in range(n_r)]),
    })
    con = duckdb.connect()
    con.register("l", ltab)
    con.register("r", rtab)
    sql = {
        "inner": "SELECT k, lv, rv FROM l JOIN r ON k = rk",
        "left_outer": "SELECT k, lv, rv FROM l LEFT JOIN r ON k = rk",
        "full_outer": "SELECT coalesce(k, rk) AS k, lv, rv "
                      "FROM l FULL JOIN r ON k = rk",
        "left_semi": "SELECT k, lv FROM l SEMI JOIN r ON k = rk",
        "left_anti": "SELECT k, lv FROM l ANTI JOIN r ON k = rk",
    }
    for how, q in sql.items():
        want = con.execute(q).arrow()
        strategies = [False] if how == "full_outer" else [False, True]
        for bc in strategies:
            got = _collect(hash_join(
                rd.from_arrow(ltab), rd.from_arrow(rtab),
                on="k", right_on="rk", how=how, broadcast=bc, buckets=8))
            assert got.num_rows == want.num_rows, (how, bc)
            cols = sorted(got.column_names)
            assert cols == sorted(want.column_names), (how, bc)
            a = got.select(cols).sort_by([(c, "ascending") for c in cols])
            b = pa.table({c: want[c].cast(got.schema.field(c).type)
                          for c in cols}).sort_by(
                [(c, "ascending") for c in cols])
            assert a.equals(b), (how, bc)


def test_hash_join_collision_rename_and_composite(ray_session):
    from rayskema.pipelines.relational import hash_join
    l = rd.from_arrow(pa.table({
        "a": [1, 1, 2], "b": ["x", "y", "x"], "v": [10, 20, 30]}))
    r = rd.from_arrow(pa.table({
        "a": [1, 2, 2], "b": ["x", "x", "z"], "v": [7, 8, 9]}))
    out = _collect(hash_join(l, r, on=["a", "b"], how="inner",
                             buckets=4)).sort_by("v")
    # composite key (a, b): matches (1,x) and (2,x); right v renamed v_r
    assert out.column_names == ["a", "b", "v", "v_r"]
    assert out["v"].to_pylist() == [10, 30]
    assert out["v_r"].to_pylist() == [7, 8]


def test_common_substring_pairs_vs_brute(ray_session):
    from rayskema.functions.dedup import common_substring_pairs
    rng = np.random.default_rng(11)
    alphabet = list("abcdef ")
    texts = ["".join(rng.choice(alphabet, 60)) for _ in range(40)]
    shared = "THE-SHARED-CHUNK-XYZ"            # 20 chars > k
    texts[3] = texts[3][:10] + shared + texts[3][30:]
    texts[17] = shared + texts[17][20:]
    texts[29] = texts[29][:40] + shared        # suffix position
    texts.append("shrt")                       # below k: contributes nothing
    tab = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    k = 12
    # brute-force ground truth over all k-substring pairs
    wins = {}
    for i, t in enumerate(texts):
        for p in range(len(t) - k + 1):
            wins.setdefault(t[p:p + k], set()).add(i)
    want = set()
    for docs in wins.values():
        ds_ = sorted(docs)
        for x in range(len(ds_)):
            for y in range(x + 1, len(ds_)):
                want.add((ds_[x], ds_[y]))
    got = _collect(common_substring_pairs(
        rd.from_arrow(tab), "text", "doc_id", k=k, buckets=4))
    got_pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    assert got_pairs == want
    assert {(3, 17), (3, 29), (17, 29)} <= got_pairs


def test_common_substring_pairs_sample_mod(ray_session):
    from rayskema.functions.dedup import common_substring_pairs
    # two identical long docs share EVERY window: even aggressive
    # sampling (1/8 of windows kept) must still pair them
    t = "the quick brown fox jumps over the lazy dog " * 4
    tab = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array([t, t, "completely different text "
                                      "with no overlap at all zzz"])})
    got = _collect(common_substring_pairs(
        rd.from_arrow(tab), "text", "doc_id", k=16, buckets=2,
        sample_mod=8))
    assert set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist())) \
        == {(1, 2)}


def test_pivot_counts_vs_duckdb(ray_session):
    import duckdb
    from rayskema.pipelines.relational import pivot_counts
    rng = np.random.default_rng(3)
    cats = ["a", "b", "c", "weird", None]
    g = rng.integers(0, 12, 500).astype(object)
    g[::61] = None                      # null group is its own group
    tab = pa.table({
        "g": pa.array(g, type=pa.int64()),
        "cat": pa.array([cats[i] for i in rng.integers(0, 5, 500)]),
    })
    out = _collect(pivot_counts(rd.from_arrow(tab), "g", "cat",
                                ["a", "b"], buckets=4))
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute("""
        SELECT g, count(*) FILTER (cat = 'a') AS n_a,
               count(*) FILTER (cat = 'b') AS n_b,
               count(*) FILTER (cat IS NULL OR cat NOT IN ('a','b'))
                   AS n_other
        FROM t GROUP BY g""").arrow()
    a = out.sort_by([("g", "ascending")]).to_pydict()
    b = pa.table({c: want[c].cast(out.schema.field(c).type)
                  for c in out.column_names}).sort_by(
        [("g", "ascending")]).to_pydict()
    assert a == b


def test_group_agg_vs_duckdb(ray_session):
    import duckdb
    from rayskema.pipelines.relational import group_agg
    rng = np.random.default_rng(11)
    g = rng.integers(0, 23, 400).astype(object)
    g[::37] = None                      # null group is its own group
    v = rng.integers(0, 1000, 400).astype(object)
    v[::17] = None                      # nulls skipped by sum/count
    tab = pa.table({
        "g": pa.array(g, type=pa.int64()),
        "v": pa.array(v, type=pa.int64()),
        "w": pa.array(rng.integers(1, 50, 400), type=pa.int64()),
    })
    out = _collect(group_agg(
        rd.from_arrow(tab), ["g"],
        [("v", "sum", "sum_v"), ("v", "count", "n_v"),
         ("v", "mean", "avg_v"), ("w", "min", "min_w"),
         ("w", "max", "max_w"), ("*", "count_all", "n_rows")],
        buckets=4))
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute("""
        SELECT g, CAST(sum(v) AS BIGINT) AS sum_v, count(v) AS n_v,
               CAST(sum(v) AS DOUBLE) / count(v) AS avg_v,
               min(w) AS min_w, max(w) AS max_w, count(*) AS n_rows
        FROM t GROUP BY g""").arrow()
    a = out.sort_by([("g", "ascending")]).to_pydict()
    b = pa.table({c: want[c].cast(out.schema.field(c).type)
                  for c in out.column_names}).sort_by(
        [("g", "ascending")]).to_pydict()
    assert a == b


def test_group_running(ray_session):
    from rayskema.pipelines.relational import group_running
    ds = rd.from_arrow(pa.table({
        "g": ["x", "x", "x", "y", "y", "z"],
        "o": [2, 0, 1, 1, 0, 0],
        "v": [30, 10, 20, 5, 7, 9],
    }))
    out = _collect(group_running(ds, "g", ["o"], "v", buckets=4))
    out = out.sort_by([("g", "ascending"), ("o", "ascending")])
    assert out["row_number"].to_pylist() == [1, 2, 3, 1, 2, 1]
    assert out["running_sum"].to_pylist() == [10.0, 30.0, 60.0,
                                              7.0, 12.0, 9.0]
    assert out["lag"].to_pylist() == [None, 10, 20, None, 7, None]


def test_chunk_documents(ray_session):
    from rayskema.functions.chunking import chunk_documents
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["abcdefghij", "", None, "αβγδε"],  # codepoints, not bytes
    }))
    out = _collect(chunk_documents(ds, "text", "doc_id", size=4))
    out = out.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    assert out["doc_id"].to_pylist() == [1, 1, 1, 2, 4, 4]
    assert out["chunk_idx"].to_pylist() == [0, 1, 2, 0, 0, 1]
    assert out["char_start"].to_pylist() == [0, 4, 8, 0, 0, 4]
    assert out["chunk"].to_pylist() == ["abcd", "efgh", "ij", "",
                                        "αβγδ", "ε"]
    # overlapping windows: stride < size
    ov = _collect(chunk_documents(ds, "text", "doc_id", size=4, stride=2))
    ov = ov.filter(pa.compute.equal(ov["doc_id"], 1)).sort_by(
        [("chunk_idx", "ascending")])
    assert ov["chunk"].to_pylist() == ["abcd", "cdef", "efgh", "ghij", "ij"]
    assert ov["char_start"].to_pylist() == [0, 2, 4, 6, 8]


def test_pack_bins(ray_session):
    from rayskema.pipelines.relational import pack_bins
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 5 + ["b"] * 2,
        "i": [0, 1, 2, 3, 4, 0, 1],
        "w": [60, 50, 10, 100, 5, 120, 1],
    }))
    out = _collect(pack_bins(ds, "g", ["i"], "w", budget=100, buckets=4))
    out = out.sort_by([("g", "ascending"), ("i", "ascending")])
    # group a exclusive prefix sums: 0, 60, 110, 120, 220
    assert out["bin"].to_pylist() == [0, 0, 1, 1, 2, 0, 1]
    assert out["bin_offset"].to_pylist() == [0, 60, 10, 20, 20, 0, 20]


def test_group_running_null_numeric_key(ray_session):
    # null int64 partition keys must form ONE group (to_numpy turns
    # them into NaN; NaN != NaN must not split every row)
    from rayskema.pipelines.relational import group_running
    ds = rd.from_arrow(pa.table({
        "g": pa.array([None, None, None, 7], type=pa.int64()),
        "o": [1, 2, 3, 1],
        "v": [10, 20, 30, 5],
    }))
    out = _collect(group_running(ds, "g", ["o"], "v", buckets=4))
    out = out.sort_by([("g", "ascending"), ("o", "ascending")])
    byg = {}
    for g, rn, rs, lg in zip(out["g"].to_pylist(),
                             out["row_number"].to_pylist(),
                             out["running_sum"].to_pylist(),
                             out["lag"].to_pylist()):
        byg.setdefault(g, []).append((rn, rs, lg))
    assert byg[None] == [(1, 10.0, None), (2, 30.0, 10), (3, 60.0, 20)]
    assert byg[7] == [(1, 5.0, None)]


def test_pack_bins_null_numeric_key(ray_session):
    from rayskema.pipelines.relational import pack_bins
    ds = rd.from_arrow(pa.table({
        "g": pa.array([None, None, 3], type=pa.int64()),
        "i": [0, 1, 0],
        "w": [100, 60, 10],
    }))
    out = _collect(pack_bins(ds, "g", ["i"], "w", budget=100, buckets=4))
    got = {(g, i): b for g, i, b in zip(out["g"].to_pylist(),
                                        out["i"].to_pylist(),
                                        out["bin"].to_pylist())}
    assert got == {(None, 0): 0, (None, 1): 1, (3, 0): 0}


def test_group_agg_on_group_column(ray_session):
    # count(g) ... GROUP BY g is legal SQL; must not double-select g
    from rayskema.pipelines.relational import group_agg
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", None], "v": [1, 2, 3]}))
    out = _collect(group_agg(ds, ["g"], [("g", "count", "n_g"),
                                         ("v", "sum", "s")], buckets=2))
    out = out.sort_by([("g", "ascending")])
    assert out["g"].to_pylist() == ["a", None]
    assert out["n_g"].to_pylist() == [2, 0]
    assert out["s"].to_pylist() == [3, 3]


def test_tfidf_top_terms(ray_session):
    import math
    from rayskema.functions.textstats import tfidf_top_terms
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["apple banana apple", "banana cherry", "cherry cherry date"],
    }))
    out = _collect(tfidf_top_terms(ds, "text", "doc_id", k=2, buckets=4))
    rows = {(d, r): (t, tf, s) for d, t, tf, s, r in zip(
        out["doc_id"].to_pylist(), out["term"].to_pylist(),
        out["tf"].to_pylist(), out["score"].to_pylist(),
        out["rank"].to_pylist())}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert rows[(1, 1)][0] == "apple" and rows[(1, 1)][1] == 2
    assert rows[(1, 1)][2] == round(2 * math.log(3.0), 6)
    assert rows[(1, 2)][0] == "banana"
    # doc 3: cherry tf=2 df=2 -> 2*ln(1.5); date tf=1 df=1 -> ln(3)
    assert rows[(3, 1)][0] == "date"
    assert rows[(3, 2)][0] == "cherry"


def test_group_rolling(ray_session):
    from rayskema.pipelines.relational import group_rolling
    ds = rd.from_arrow(pa.table({
        "g": ["x", "x", "x", "x", "y", "z"],
        "o": [3, 0, 1, 2, 0, 0],
        "v": [40, 10, 20, 30, 7, None],
    }))
    out = _collect(group_rolling(ds, "g", ["o"], "v", window=3, buckets=4))
    out = out.sort_by([("g", "ascending"), ("o", "ascending")])
    # x frames: [10], [10,20], [10,20,30], [20,30,40]
    assert out["rolling_sum"].to_pylist() == [10, 30, 60, 90, 7, 0]
    assert out["rolling_n"].to_pylist() == [1, 2, 3, 3, 1, 1]
    assert out["rolling_mean"].to_pylist() == [10.0, 15.0, 20.0, 30.0,
                                               7.0, 0.0]
    with pytest.raises(ValueError):
        group_rolling(ds, "g", ["o"], "v", window=0)


def test_group_rank(ray_session):
    from rayskema.pipelines.relational import group_rank
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7],
        "g": ["x", "x", "x", "x", "y", "y", "z"],
        "v": [5.0, 9.0, 5.0, None, 3.0, 3.0, 4.0],
    }))
    out = _collect(group_rank(ds, "g", "v", descending=True,
                              keep_cols=["id"], buckets=4))
    out = out.sort_by([("id", "ascending")])
    # x desc: 9 -> rank 1; 5,5 -> rank 2 (dense 2); null last -> rank 4
    assert out["rank"].to_pylist() == [2, 1, 2, 4, 1, 1, 1]
    assert out["dense_rank"].to_pylist() == [2, 1, 2, 3, 1, 1, 1]
    pct = out["percent_rank"].to_pylist()
    assert pct[0] == pytest.approx(1 / 3) and pct[1] == 0.0
    assert pct[3] == 1.0
    assert pct[4] == 0.0 and pct[5] == 0.0  # two-row tie group
    assert pct[6] == 0.0  # single-row group


def test_group_ntile(ray_session):
    from rayskema.pipelines.relational import group_ntile
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        "g": ["x"] * 7 + ["y", "y", "z"],
        "v": [70, 60, 50, 40, 30, 20, 10, 2, 1, 9],
    }))
    out = _collect(group_ntile(ds, "g", ["v", "id"], 3,
                               descending=True, buckets=4))
    out = out.sort_by([("g", "ascending"), ("v", "descending")])
    # x: 7 rows into 3 tiles -> sizes 3,2,2 (larger buckets first)
    assert out["tile"].to_pylist() == [1, 1, 1, 2, 2, 3, 3,
                                       1, 2,  # y: 2 rows, 3 tiles
                                       1]     # z: single row
    with pytest.raises(ValueError):
        group_ntile(ds, "g", ["v"], 0)


def test_json_scalar_and_stage(ray_session):
    from rayskema.functions.jsoncol import json_scalar, with_json_field
    vals = pa.array(['{"k": 69}', '{"k": "s"}', '{"x": 1}', None,
                     'broken', '{"k": {"nested": 1}}', '{"k": null}',
                     '{"k": 99999999999999999999}',
                     '{"meta": {"k": 1}, "k": 2}',
                     '{"a": "see \\"k\\": 5 here"}'])
    got = json_scalar(vals, "k", pa.int64()).to_pylist()
    assert got == [69, None, None, None, None, None, None, None, 2,
                   None]
    # python fallback agrees with the regex fast path
    assert got == json_scalar(vals, "k", pa.int64(),
                              mode="python").to_pylist()
    with pytest.raises(ValueError):
        json_scalar(vals, 'k"', pa.int64())
    ds = rd.from_arrow(pa.table({"props": vals}))
    out = _collect(with_json_field(ds, "props", "k", out_col="k"))
    assert sorted(x for x in out["k"].to_pylist() if x) == [2, 69]


def test_explode(ray_session):
    from rayskema.pipelines.relational import explode
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "xs": [[10, 20], [], None, [30]],
    }))
    out = _collect(explode(ds, "xs", ["id"]))
    out = out.sort_by([("id", "ascending"), ("pos", "ascending")])
    assert out["id"].to_pylist() == [1, 1, 4]
    assert out["pos"].to_pylist() == [1, 2, 1]
    assert out["val"].to_pylist() == [10, 20, 30]
    out0 = _collect(explode(ds, "xs", ["id"], one_based=False))
    assert sorted(out0["pos"].to_pylist()) == [0, 0, 1]


def test_byte_entropy(ray_session):
    import math
    from rayskema.functions.textstats import byte_entropy
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["aab", "", None, "abcd"],
    }))
    out = _collect(byte_entropy(ds, "text", "doc_id"))
    out = out.sort_by([("doc_id", "ascending")])
    assert out["doc_id"].to_pylist() == [1, 2, 4]  # null emits no row
    e = out["entropy"].to_pylist()
    p, q = 2 / 3, 1 / 3
    assert e[0] == pytest.approx(-(p * math.log(p) + q * math.log(q)),
                                 abs=1e-6)
    assert e[1] == 0.0
    assert e[2] == pytest.approx(math.log(4), abs=1e-6)


def test_group_latest(ray_session):
    from rayskema.pipelines.relational import group_latest
    ds = rd.from_arrow(pa.table({
        "g": ["x", "x", "y", "y", "z"],
        "ts": [5, 9, 1, 1, 2],
        "id": [1, 2, 3, 4, 5],
        "v": ["a", "b", "c", "d", "e"],
    }))
    out = _collect(group_latest(ds, "g", ["ts", "id"], buckets=4))
    out = out.sort_by([("g", "ascending")])
    assert out["id"].to_pylist() == [2, 4, 5]  # ties on ts broken by id
    assert out["v"].to_pylist() == ["b", "d", "e"]
    lo = _collect(group_latest(ds, "g", ["ts", "id"], descending=False,
                               buckets=4)).sort_by([("g", "ascending")])
    assert lo["id"].to_pylist() == [1, 3, 5]


def test_paired_moments_corr(ray_session):
    import numpy as np
    from rayskema.functions.profile import paired_moments_corr
    rng = np.random.default_rng(7)
    x = rng.integers(0, 100, 500)
    y = 3 * x + rng.integers(-10, 10, 500)
    ds = rd.from_arrow(pa.table({
        "x": x.astype(float), "y": y.astype(float)})).repartition(5)
    out = paired_moments_corr(ds, "x", "y")
    assert out["n"].to_pylist() == [500]
    expect = float(np.corrcoef(x, y)[0, 1])
    assert out["corr"].to_pylist()[0] == pytest.approx(expect, abs=1e-12)
    # null rows dropped (SQL corr semantics)
    ds2 = rd.from_arrow(pa.table({"x": [1.0, 2.0, None, 3.0],
                                  "y": [2.0, 4.0, 5.0, None]}))
    out2 = paired_moments_corr(ds2, "x", "y")
    assert out2["n"].to_pylist() == [2] and \
        out2["corr"].to_pylist()[0] == pytest.approx(1.0)
    # degenerate (zero variance) -> NaN
    ds3 = rd.from_arrow(pa.table({"x": [1.0, 1.0], "y": [2.0, 3.0]}))
    import math
    assert math.isnan(paired_moments_corr(ds3, "x", "y")["corr"]
                      .to_pylist()[0])


def test_exact_limb_accumulators():
    """The vectorized limb accumulators equal Python big-int math over
    the full int64 domain (incl. extremes where products need 126
    bits), and beat the object-dtype path they replaced."""
    import numpy as np
    from rayskema.functions.profile import _exact_dot, _exact_sum
    rng = np.random.default_rng(11)
    lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    x = rng.integers(lo, hi, 4000, endpoint=True)
    y = rng.integers(lo, hi, 4000, endpoint=True)
    # splice in the extremes
    x[:4] = [lo, hi, lo, 0]
    y[:4] = [lo, hi, hi, lo]
    ref_sum = sum(int(v) for v in x)
    ref_dot = sum(int(a) * int(b) for a, b in zip(x, y))
    assert _exact_sum(x) == ref_sum
    assert _exact_dot(x, y) == ref_dot
    assert _exact_dot(x, x) == sum(int(a) * int(a) for a in x)
    assert _exact_sum(np.array([], dtype=np.int64)) == 0
    assert _exact_dot(np.array([], dtype=np.int64),
                      np.array([], dtype=np.int64)) == 0
    # micro speed check vs the object-dtype path (>=10x expected; 3x
    # asserted to stay robust on noisy CI hosts)
    import time
    big_x = rng.integers(-10**9, 10**9, 400_000)
    big_y = rng.integers(-10**9, 10**9, 400_000)
    t0 = time.perf_counter()
    got = _exact_dot(big_x, big_y)
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = int((big_x.astype(object) * big_y.astype(object)).sum())
    t_obj = time.perf_counter() - t0
    assert got == ref
    assert t_vec < t_obj / 3


def test_lm_trigram_score(ray_session):
    import math
    from rayskema.functions.textstats import lm_trigram_score
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["ababa", "ab", None, "xyz"],
    }))
    out = _collect(lm_trigram_score(ds, "text", "doc_id", buckets=2))
    out = out.sort_by([("doc_id", "ascending")])
    # trigrams: doc1: aba, bab, aba; doc4: xyz -> counts aba=2 bab=1
    # xyz=1, total=4
    assert out["doc_id"].to_pylist() == [1, 4]  # short/null docs drop
    assert out["n_tri"].to_pylist() == [3, 1]
    s1 = (2 * math.log(2 / 4) + math.log(1 / 4)) / 3
    s4 = math.log(1 / 4)
    got = out["lm_score"].to_pylist()
    assert got[0] == pytest.approx(s1, abs=1e-6)
    assert got[1] == pytest.approx(s4, abs=1e-6)


def test_group_rollup(ray_session):
    from rayskema.pipelines.relational import group_rollup
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "x", "y", "y"],
        "b": ["p", "p", "q", "p", None],
        "v": [1, 2, 4, 8, 16]}))
    out = _collect(group_rollup(
        ds, ["a", "b"],
        [("v", "sum", "s"), ("v", "count_all", "n"),
         ("v", "mean", "m")], buckets=2))
    rows = {(r["a"], r["b"], r["grouping_level"]):
            (r["s"], r["n"], r["m"]) for r in out.to_pylist()}
    assert len(rows) == len(out)
    # level 0: finest (data NULL in b is its own group, like SQL)
    assert rows[("x", "p", 0)] == (3, 2, 1.5)
    assert rows[("x", "q", 0)] == (4, 1, 4.0)
    assert rows[("y", "p", 0)] == (8, 1, 8.0)
    assert rows[("y", None, 0)] == (16, 1, 16.0)
    # level 1: b rolled away
    assert rows[("x", None, 1)] == (7, 3, 7 / 3)
    assert rows[("y", None, 1)] == (24, 2, 12.0)
    # level 2: grand total
    assert rows[(None, None, 2)] == (31, 5, 6.2)
    assert len(rows) == 7


def test_group_rollup_parallelism_invariant(ray_session):
    from rayskema.pipelines.relational import group_rollup
    rng = np.random.default_rng(7)
    tab = pa.table({
        "a": rng.integers(0, 5, 400),
        "b": rng.integers(0, 3, 400),
        "v": rng.integers(-100, 100, 400)})
    ref = None
    for nblocks, buckets in ((1, 1), (8, 3), (32, 16)):
        ds = rd.from_arrow(tab).repartition(nblocks)
        out = _collect(group_rollup(
            ds, ["a", "b"], [("v", "sum", "s"), ("v", "min", "lo"),
                             ("v", "max", "hi")], buckets=buckets))
        got = sorted((tuple(sorted(r.items(), key=lambda kv: kv[0]))
                      for r in out.to_pylist()), key=str)
        if ref is None:
            ref = got
        assert got == ref


def test_incremental_dedup_index(ray_session, tmp_path):
    from rayskema.state.dedup_index import (build_key_index,
                                            dedup_against_index)
    idx = str(tmp_path / "idx")
    old = rd.from_arrow(pa.table({
        "k1": [1, 1, 2, 2, 3, None],
        "k2": ["a", "a", "b", "c", "a", "z"]}))
    meta = build_key_index(old, ["k1", "k2"], idx, buckets=4)
    assert meta["n_keys"] == 5  # (1,a)(2,b)(2,c)(3,a)(None,z)
    new = rd.from_arrow(pa.table({
        "k1": [1, 2, 4, 4, None, None],
        "k2": ["a", "b", "x", "x", "z", None],
        "v": [10, 20, 30, 31, 40, 50]}))
    out = _collect(dedup_against_index(new, idx))
    rows = sorted(out.to_pylist(), key=lambda r: r["v"])
    # (1,a)/(2,b) seen -> dropped; (4,x) twice (both survive: NOT
    # EXISTS, intra-increment dups kept); null keys never match
    assert [r["v"] for r in rows] == [30, 31, 40, 50]
    # fold the increment's keys in (separate idempotent pass): rerun
    # drops (4,x) both times; null-keyed rows STILL survive (null
    # never matches, SQL NOT EXISTS)
    from rayskema.state.dedup_index import update_key_index
    added = update_key_index(rd.from_arrow(out.select(["k1", "k2"])), idx)
    assert added >= 1  # (4,x) is genuinely new
    assert update_key_index(
        rd.from_arrow(out.select(["k1", "k2"])), idx) == 0  # idempotent
    out2 = _collect(dedup_against_index(new, idx))
    assert sorted(r["v"] for r in out2.to_pylist()) == [40, 50]


def test_key_index_rebuild_clears_stale_buckets(ray_session, tmp_path):
    from rayskema.state.dedup_index import (build_key_index,
                                            dedup_against_index)
    idx = str(tmp_path / "idx")
    build_key_index(rd.from_arrow(pa.table(
        {"k": [1, 2, 3, 4, 5, 6]})), ["k"], idx, buckets=4)
    # rebuild over a smaller corpus (different bucket count too):
    # buckets the new data misses must not keep their old keys
    build_key_index(rd.from_arrow(pa.table({"k": [1]})), ["k"], idx,
                    buckets=3)
    out = _collect(dedup_against_index(
        rd.from_arrow(pa.table({"k": [2, 3, 4, 5, 6]})), idx))
    assert sorted(out["k"].to_pylist()) == [2, 3, 4, 5, 6]


def test_incremental_dedup_parallelism_invariant(ray_session, tmp_path):
    from rayskema.state.dedup_index import (build_key_index,
                                            dedup_against_index)
    rng = np.random.default_rng(3)
    old = pa.table({"u": rng.integers(0, 50, 300),
                    "t": rng.integers(0, 4, 300)})
    new = pa.table({"u": rng.integers(0, 80, 200),
                    "t": rng.integers(0, 4, 200),
                    "i": np.arange(200)})
    expect = None
    for nblocks, buckets in ((1, 2), (16, 8)):
        idx = str(tmp_path / f"idx{nblocks}")
        build_key_index(rd.from_arrow(old).repartition(nblocks),
                        ["u", "t"], idx, buckets=buckets)
        out = _collect(dedup_against_index(
            rd.from_arrow(new).repartition(nblocks), idx))
        got = sorted(out["i"].to_pylist())
        if expect is None:
            old_set = set(zip(old["u"].to_pylist(), old["t"].to_pylist()))
            expect = sorted(
                i for u, t, i in zip(new["u"].to_pylist(),
                                     new["t"].to_pylist(),
                                     new["i"].to_pylist())
                if (u, t) not in old_set)
        assert got == expect


def test_mixture_sample(ray_session):
    import hashlib
    from rayskema.functions.sampling import mixture_sample
    tab = pa.table({"src": ["a"] * 10 + ["b"] * 10 + ["c"] * 4,
                    "k": [str(i) for i in range(24)]})
    out = _collect(mixture_sample(
        rd.from_arrow(tab).repartition(3), "src", "k",
        {"a": 2.5, "b": 0.4, "c": 0.0}, salt="s"))

    def u(key):
        return int(hashlib.md5(b"s" + key.encode()).hexdigest()[:8], 16)

    got = {}
    for r in out.to_pylist():
        got.setdefault(r["k"], []).append(r["copy_idx"])
    for i in range(24):
        k, src = str(i), tab["src"][i].as_py()
        rate = {"a": 2.5, "b": 0.4, "c": 0.0}[src]
        n = int(rate) + (1 if u(k) < (rate % 1) * 2**32 else 0)
        assert sorted(got.get(k, [])) == list(range(n)), (k, src)
    # rate a=2.5: every 'a' row appears at least twice
    assert all(len(got[str(i)]) >= 2 for i in range(10))


def test_mixture_sample_default_and_null(ray_session):
    from rayskema.functions.sampling import mixture_sample
    tab = pa.table({"src": ["x", "y"], "k": ["q", None]})
    out = _collect(mixture_sample(
        rd.from_arrow(tab), "src", "k", {"y": 1.9}, default_rate=1.0))
    rows = sorted(out.to_pylist(), key=str)
    # x: unlisted -> default 1.0 (one copy); y: null key takes floor
    # only (SQL NULL comparison falls through)
    assert len([r for r in rows if r["src"] == "x"]) == 1
    assert len([r for r in rows if r["src"] == "y"]) == 1


def test_group_cube(ray_session):
    from rayskema.pipelines.relational import group_cube
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "y"],
        "b": ["p", "q", "p"],
        "v": [1, 2, 4]}))
    out = _collect(group_cube(ds, ["a", "b"],
                              [("v", "sum", "s")], buckets=2))
    rows = {(r["a"], r["b"], r["grouping_id"]): r["s"]
            for r in out.to_pylist()}
    # level 0 emits only OBSERVED combos: (x,p),(x,q),(y,p) — no (y,q)
    assert len(rows) == len(out) == 3 + 2 + 2 + 1
    # gid bitmask MSB-first: bit for `a` = 2, bit for `b` = 1
    assert rows[("x", "p", 0)] == 1 and rows[("y", "p", 0)] == 4
    assert rows[("x", None, 1)] == 3 and rows[("y", None, 1)] == 4
    assert rows[(None, "p", 2)] == 5 and rows[(None, "q", 2)] == 2
    assert rows[(None, None, 3)] == 7


def test_group_grouping_sets(ray_session):
    from rayskema.pipelines.relational import group_grouping_sets
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 4]}))
    out = _collect(group_grouping_sets(
        ds, ["a", "b"], [("a",), (), ("a", "b")],
        [("v", "sum", "s")], buckets=2))
    rows = {(r["a"], r["b"], r["grouping_id"]): r["s"]
            for r in out.to_pylist()}
    assert rows[("x", None, 1)] == 3 and rows[("y", None, 1)] == 4
    assert rows[(None, None, 3)] == 7
    assert rows[("x", "p", 0)] == 1 and len(rows) == 6
    with pytest.raises(ValueError):
        group_grouping_sets(ds, ["a"], [("a",), ("a",)],
                            [("v", "sum", "s")])


def test_grouping_sets_empty_input_grand_total(ray_session):
    from rayskema.pipelines.relational import group_cube, group_rollup
    empty = rd.from_arrow(pa.table({
        "a": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64())}))
    # SQL GROUP BY ROLLUP/CUBE over zero rows emits the grand-total
    # set: count 0, sum NULL
    for op, id_col in ((group_rollup, "grouping_level"),
                       (group_cube, "grouping_id")):
        out = _collect(op(empty, ["a"],
                          [("v", "sum", "s"), ("v", "count_all", "n"),
                           ("v", "mean", "m")], buckets=2))
        rows = out.to_pylist()
        assert len(rows) == 1, (op, rows)
        r = rows[0]
        assert r["a"] is None and r[id_col] == 1
        assert r["n"] == 0 and r["s"] is None and r["m"] is None


def test_broadcast_join_empty_right(ray_session):
    from rayskema.pipelines.relational import hash_join
    left = rd.from_arrow(pa.table({"k": [1, 2], "x": ["a", "b"]}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([], type=pa.int64()),
        "y": pa.array([], type=pa.string())}))
    assert _collect(hash_join(left, right, on=["k"], how="inner",
                              broadcast=True)).num_rows == 0
    anti = _collect(hash_join(left, right, on=["k"], how="left_anti",
                              broadcast=True))
    assert sorted(anti["k"].to_pylist()) == [1, 2]
    # a right side whose rows are all filtered away (0-row 0-column
    # blocks from Ray) must behave identically
    filtered = rd.from_arrow(pa.table({"k": [9], "y": ["z"]})) \
        .map_batches(lambda t: t.filter(pa.array([False])),
                     batch_format="pyarrow")
    assert _collect(hash_join(left, filtered, on=["k"], how="inner",
                              broadcast=True)).num_rows == 0


def test_group_share(ray_session):
    from rayskema.pipelines.relational import group_share
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "b", "c"],
        "v": [1, 3, None, 0, 0, -2]}))
    out = _collect(group_share(ds, ["g"], "v", buckets=2)).sort_by(
        [("g", "ascending"), ("v", "ascending")])
    rows = out.to_pylist()
    by = {}
    for r in rows:
        by.setdefault(r["g"], []).append(r["share"])
    assert by["a"] == [0.25, 0.75, None]      # null v -> null share
    assert by["b"] == [None, None]            # zero total -> SQL NULL
    assert by["c"] == [1.0]                   # negative total still 1


def test_group_agg_variance(ray_session):
    from rayskema.pipelines.relational import group_agg
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "b", "d"],
        "v": [2, 4, 6, 5, None, None]}))
    out = _collect(group_agg(ds, ["g"], [
        ("v", "count", "n"),
        ("v", "var_pop", "vp"), ("v", "var_samp", "vs"),
        ("v", "stddev_pop", "sp"), ("v", "stddev_samp", "ss")],
        buckets=2))
    by = {r["g"]: r for r in out.to_pylist()}
    a = by["a"]
    assert a["n"] == 3 and abs(a["vp"] - 8 / 3) < 1e-12
    assert a["vs"] == 4.0 and a["ss"] == 2.0
    assert abs(a["sp"] - (8 / 3) ** 0.5) < 1e-12
    b = by["b"]                      # one non-null value
    assert b["n"] == 1 and b["vp"] == 0.0 and b["sp"] == 0.0
    assert b["vs"] is None and b["ss"] is None     # n<2 -> SQL NULL
    d = by["d"]                      # all-null group
    assert d["n"] == 0 and d["vp"] is None and d["ss"] is None


def test_group_agg_variance_large_magnitude(ray_session):
    # partials past 2^53 (Σv² = 8e18) must flow through the decimal
    # accumulation and unsafe float casts, not crash on a safe cast
    from rayskema.pipelines.relational import group_agg
    vals = [2_000_000_000, 2_000_000_000, 0]
    ds = rd.from_arrow(pa.table({"g": ["a"] * 3, "v": vals}))
    out = _collect(group_agg(ds, ["g"], [("v", "var_pop", "vp")],
                             buckets=1)).to_pylist()
    ss, s, n = float(sum(v * v for v in vals)), float(sum(vals)), 3.0
    assert out[0]["vp"] == (ss - s * s / n) / n


def test_group_agg_variance_overflow_raises(ray_session):
    from rayskema.pipelines.relational import group_agg
    big = 4_000_000_000                       # square leaves int64
    ds = rd.from_arrow(pa.table({"g": ["a"], "v": [big]}))
    with pytest.raises(Exception, match="[Oo]verflow"):
        _collect(group_agg(ds, ["g"], [("v", "var_pop", "vp")],
                           buckets=1))


def test_approx_distinct_count(ray_session):
    from rayskema.pipelines.relational import (approx_distinct_count,
                                               distinct_count)
    import pandas as pd
    rows = []
    for g, card in (("a", 400), ("b", 37), (None, 5)):
        for i in range(card):
            for _ in range(2):                     # duplicates
                rows.append({"g": g, "v": f"{g}-{i}"})
    rows.append({"g": "a", "v": None})             # null value ignored
    rows.append({"g": "z", "v": None})             # all-null group -> 0
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(6)
    out = {r["g"]: r["n_approx"] for r in _collect(
        approx_distinct_count(ds, "g", "v", buckets=3)).to_pylist()}
    exact = {r["g"]: r["n_distinct"] for r in _collect(
        distinct_count(ds, "g", "v")).to_pylist()}
    assert set(out) == {"a", "b", "z", None}
    assert out["z"] == 0 and exact["z"] == 0
    for g, e in exact.items():
        assert abs(out[g] - e) <= max(1, 0.05 * e), (g, out[g], e)
    # parallelism-independence: merged registers are a max over the
    # group's value hashes — bucket/block layout cannot change them
    out1 = {r["g"]: r["n_approx"] for r in _collect(
        approx_distinct_count(ds.repartition(1), "g", "v",
                              buckets=1)).to_pylist()}
    assert out1 == out


def test_approx_group_quantiles(ray_session):
    from rayskema.pipelines.relational import approx_group_quantiles
    import pandas as pd
    rows = []
    for g, n in (("a", 2000), ("b", 101)):
        for i in range(n):
            rows.append({"g": g, "v": float(i)})
    rows.append({"g": "c", "v": None})             # all-null group
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = _collect(approx_group_quantiles(
        ds, "g", "v", [0.1, 0.5, 0.9], buckets=2)).to_pylist()
    by = {(r["g"], r["q"]): r["value_est"] for r in out}
    assert len(by) == 9
    for q in (0.1, 0.5, 0.9):                      # rank error ≲ 2%
        assert abs(by[("a", q)] - q * 1999) <= 0.02 * 2000
        assert abs(by[("b", q)] - q * 100) <= max(2, 0.05 * 101)
        assert by[("c", q)] is None


def test_group_sigma_outliers_exact(ray_session):
    """Exact integer decision boundary: reference z-score predicate in
    Python bigints, constant group flags every off-mean value, nulls
    (value or group) never flag, result parallelism-independent."""
    import math

    from rayskema.functions.profile import group_sigma_outliers

    rng = np.random.default_rng(7)
    vals = np.round(rng.exponential(50.0, size=4000), 2)
    g = np.array(["a", "b", "c", "d"])[np.arange(4000) % 4]
    tab = pa.table({
        "id": pa.array(np.arange(4000), type=pa.int64()),
        "g": pa.array(g),
        "v": pa.array(vals, type=pa.float64())})
    # inject a constant group, a null value and a null group key
    extra = pa.table({
        "id": pa.array([9001, 9002, 9003, 9004, 9005], type=pa.int64()),
        "g": pa.array(["k", "k", "k", None, "a"]),
        "v": pa.array([5.0, 5.0, 7.25, 1e6, None], type=pa.float64())})
    tab = pa.concat_tables([tab, extra])

    # reference: exact predicate over python ints
    cents = {}
    for gv, v in zip(tab["g"].to_pylist(), tab["v"].to_pylist()):
        if gv is None or v is None:
            continue
        c = int(math.floor(abs(v) * 100 + 0.5)) * (1 if v >= 0 else -1)
        cents.setdefault(gv, []).append(c)
    expect = set()
    for gv, v, i in zip(tab["g"].to_pylist(), tab["v"].to_pylist(),
                        tab["id"].to_pylist()):
        if gv is None or v is None:
            continue
        cs = cents[gv]
        n, s = len(cs), sum(cs)
        ss = sum(c * c for c in cs)
        c = int(math.floor(abs(v) * 100 + 0.5)) * (1 if v >= 0 else -1)
        d = c * n - s
        if d * d > 9 * (n * ss - s * s) and d != 0:
            expect.add(i)
    assert expect, "fixture must produce outliers"
    # the near-constant group: 7.25 is >3 sigma from the {5, 5, 7.25}
    # mean only if the exact predicate says so — mirror it, don't guess
    assert (9003 in expect) == (450 * 450 > 9 * (3 * 1025625
                                                 - 1725 * 1725))

    for parallelism in (1, 7):
        ds = rd.from_arrow(tab).repartition(parallelism)
        out = group_sigma_outliers(ds, "g", "v", k=3, scale=100,
                                   out_col="v_c")
        got = {r["id"] for r in out.take_all()}
        assert got == expect, (parallelism, got ^ expect)


def test_linear_quality_filter(ray_session):
    """Integer linear scoring matches a local reference computation;
    weights validate; empty/whitespace docs score via zeroed features."""
    import re

    from rayskema.functions.textstats import (QUALITY_FEATURES,
                                              linear_quality_filter)

    texts = ["alpha beta 12. gamma!", "", "   ", "x" * 30,
             "one two three, four five; 99 88"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    w = (1, 2, -5, -1, -2, 3, -4)

    def ref_score(t: str) -> int:
        words = re.findall(r"\S+", t)
        f = (len(t),
             len(re.findall(r"[A-Za-z]", t)),
             len(re.findall(r"[0-9]", t)),
             t.count(" "),
             len(re.findall(r"[.,;:!?]", t)),
             len(words),
             max((len(x) for x in words), default=0))
        return sum(wi * fi for wi, fi in zip(w, f))

    expect = {i: ref_score(t) for i, t in enumerate(texts)}
    out = linear_quality_filter(
        rd.from_arrow(tab).repartition(3), "text", "doc_id",
        weights=w, threshold=-10**9)
    got = {r["doc_id"]: r["score"] for r in out.take_all()}
    assert got == expect

    kept = linear_quality_filter(rd.from_arrow(tab), "text", "doc_id",
                                 weights=w, threshold=20)
    assert {r["doc_id"] for r in kept.take_all()} == \
        {i for i, s in expect.items() if s >= 20}

    try:
        linear_quality_filter(rd.from_arrow(tab), "text", "doc_id",
                              weights=(1, 2))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert str(len(QUALITY_FEATURES)) in str(e)


def test_quantile_bucket_assign(ray_session):
    """Type-1 rank thresholds over a value histogram; null values get
    null buckets; threshold ties collapse buckets; int values never
    detour through float; parallelism-independent."""
    from rayskema.pipelines.relational import quantile_bucket_assign

    # 10 valid values 1..10 -> q=0.3 thr=3, q=0.6 thr=6, q=0.9 thr=9
    tab = pa.table({
        "id": pa.array(range(12), type=pa.int64()),
        "v": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, None, None],
                      type=pa.int64())})
    for parts in (1, 5):
        ds = rd.from_arrow(tab).repartition(parts)
        out = {r["id"]: r["bucket"] for r in quantile_bucket_assign(
            ds, "v", [0.3, 0.6, 0.9]).take_all()}
        # bucket = #{thr : v > thr}
        expect = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 2, 7: 2,
                  8: 2, 9: 3, 10: None, 11: None}
        assert out == expect, (parts, out)

    # all-equal values: every threshold is the same value, bucket 0
    eq = pa.table({"id": pa.array(range(4), type=pa.int64()),
                   "v": pa.array([7.5] * 4, type=pa.float64())})
    out = quantile_bucket_assign(rd.from_arrow(eq), "v",
                                 [0.25, 0.5, 0.75]).take_all()
    assert all(r["bucket"] == 0 for r in out)


def test_group_concat(ray_session):
    """Ordered string_agg: order_cols drive the join order, null
    values are skipped, an all-null group yields SQL NULL, result is
    parallelism-independent."""
    from rayskema.pipelines.relational import group_concat

    tab = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", "c", "c"]),
        "o": pa.array([3, 1, 2, 2, 1, 1, 2], type=pa.int64()),
        "v": pa.array(["z", "x", None, "q", "p", None, None])})
    for parts in (1, 4):
        ds = rd.from_arrow(tab).repartition(parts)
        out = {r["g"]: r["s"] for r in group_concat(
            ds, "g", "v", ["o"], sep="|", out_col="s",
            buckets=2).take_all()}
        assert out == {"a": "x|z", "b": "p|q", "c": None}, (parts, out)


def test_dedup_tokens_within_doc(ray_session):
    """First-occurrence token dedup preserves order; empty/whitespace/
    null docs yield NULL text and 0 kept; parallelism-independent."""
    from rayskema.functions.dedup import dedup_tokens_within_doc

    tab = pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(["b a b c a b", "x", "", "   ", None])})
    for parts in (1, 3):
        ds = rd.from_arrow(tab).repartition(parts)
        out = {r["doc_id"]: (r["text_dedup"], r["n_kept"])
               for r in dedup_tokens_within_doc(
                   ds, "text", "doc_id").take_all()}
        assert out == {0: ("b a c", 3), 1: ("x", 1), 2: (None, 0),
                       3: (None, 0), 4: (None, 0)}, (parts, out)


def test_group_sigma_outliers_int_nulls_and_nan(ray_session):
    """Review regressions: an integer value column WITH nulls must not
    crash the filter pass, and a non-null NaN float must neither
    poison the exact moments nor be emitted as an outlier."""
    from rayskema.functions.profile import group_sigma_outliers

    # int64 with nulls, scale=1 (the previously-crashing path);
    # one extreme among 20 constants clears 3 sigma (max z=(n-1)/sqrt n)
    n = 22
    iv = [1] * (n - 2) + [None, 1000]
    tab = pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "g": pa.array(["a"] * n),
        "v": pa.array(iv, type=pa.int64())})
    out = group_sigma_outliers(rd.from_arrow(tab), "g", "v", k=3)
    assert {r["id"] for r in out.take_all()} == {n - 1}

    # a NaN float: excluded from the moments AND from the output
    fv = [1.0] * (n - 2) + [float("nan"), 1000.0]
    fl = pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "g": pa.array(["a"] * n),
        "v": pa.array(fv, type=pa.float64())})
    out = group_sigma_outliers(rd.from_arrow(fl), "g", "v", k=3,
                               scale=100)
    assert {r["id"] for r in out.take_all()} == {n - 1}


def test_quantize_embeddings(ray_session):
    """Per-vector symmetric quantization: codes reconstruct within
    scale/2 per element, zero vectors quantize to zeros with scale 0,
    list and flattened layouts agree, bits validates."""
    from rayskema.functions.similarity import quantize_embeddings

    vecs = [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0],
            [-2.0, 2.0, 1.0, -1.0], None, []]
    tab = pa.table({
        "vec_id": pa.array(range(5), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tab).repartition(2)
    rows = quantize_embeddings(ds, "embedding", "vec_id").take_all()
    by_id = {r["vec_id"]: r for r in rows}
    assert [c for c in by_id[0]["codes"]] == [127, -64, 32, 0]
    assert list(by_id[1]["codes"]) == [0, 0, 0, 0]
    assert by_id[1]["scale"] == 0.0
    # a null vector stays NULL; a trailing-empty vector is empty
    assert by_id[3]["codes"] is None and by_id[3]["scale"] is None
    assert list(by_id[4]["codes"]) == [] and by_id[4]["scale"] == 0.0
    for r in rows:
        s = r["scale"]
        orig = vecs[r["vec_id"]]
        if s:
            for c, x in zip(r["codes"], orig):
                assert abs(c * s - x) <= s / 2 + 1e-12
    flat = quantize_embeddings(ds, "embedding", "vec_id",
                               flatten=True).take_all()
    assert len(flat) == 12  # null/empty vectors emit no rows
    got = {(r["vec_id"], r["dim"]): r["code"] for r in flat}
    assert got[(0, 0)] == 127 and got[(2, 1)] == 127

    try:
        quantize_embeddings(ds, "embedding", "vec_id", bits=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_group_quantile_cont(ray_session):
    """Interpolated quantiles: endpoints, midpoint interpolation,
    single-value groups, null exclusion."""
    from rayskema.pipelines.relational import group_quantile_cont

    tab = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] + ["c", "c"]),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 7.0, None, 5.0],
                      type=pa.float64())})
    out = {(r["g"], r["q"]): r["value"] for r in group_quantile_cont(
        rd.from_arrow(tab).repartition(3), "g", "v",
        [0.0, 0.5, 1.0], buckets=2).take_all()}
    assert out[("a", 0.0)] == 10.0 and out[("a", 1.0)] == 40.0
    assert out[("a", 0.5)] == 25.0          # 20 + 0.5*(30-20)
    assert out[("b", 0.5)] == 7.0           # single value, every q
    assert out[("c", 0.5)] == 5.0           # null excluded


def test_group_mad(ray_session):
    """median + MAD per group: interpolated medians (even-n average),
    null exclusion, parallelism-independent."""
    from rayskema.functions.profile import group_mad

    tab = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 4),
        "v": pa.array([1.0, 3.0, 5.0, 7.0, 100.0,
                       10.0, 20.0, None, 30.0], type=pa.float64())})
    # a: median 5, |dev| = [4,2,0,2,95] -> mad 2
    # b: values [10,20,30] median 20, devs [10,0,10] -> mad 10
    for parts in (1, 4):
        out = {r["g"]: (r["median"], r["mad"]) for r in group_mad(
            rd.from_arrow(tab).repartition(parts), "g", "v",
            buckets=2).take_all()}
        assert out == {"a": (5.0, 2.0), "b": (20.0, 10.0)}, (parts, out)


def test_group_rolling_time(ray_session):
    """RANGE-frame semantics: inclusive width bound, timestamp peers
    share the frame end, all-null frames sum to NULL, null ts rows
    dropped, parallelism-independent."""
    from rayskema.pipelines.relational import group_rolling_time

    tab = pa.table({
        "g": pa.array(["a"] * 6 + ["b"] * 2),
        "ts": pa.array([0, 50, 100, 100, 161, None, 0, 10],
                       type=pa.int64()),
        "v": pa.array([1, 2, 4, 8, 16, 99, None, 32], type=pa.int64())})
    for parts in (1, 3):
        rows = group_rolling_time(
            rd.from_arrow(tab).repartition(parts), "g", "ts", "v",
            width=100, buckets=2).take_all()
        got = {(r["g"], r["ts"], r["v"]): (r["w_sum"], r["w_n"])
               for r in rows}
        # a@0: [0] -> 1; a@50: [0,50] -> 3; a@100 peers: [0..100] both
        # frames end at the last peer -> 1+2+4+8=15; a@161: [61..161]
        # -> 4+8+16=28
        assert got[("a", 0, 1)] == (1, 1)
        assert got[("a", 50, 2)] == (3, 2)
        assert got[("a", 100, 4)] == (15, 4)
        assert got[("a", 100, 8)] == (15, 4)
        assert got[("a", 161, 16)] == (28, 3)
        # b@0 has only a null value in frame -> NULL sum, 0 count
        assert got[("b", 0, None)] == (None, 0)
        assert got[("b", 10, 32)] == (32, 1)
        assert len(rows) == 7  # the null-ts row is dropped


def test_group_winsorize(ray_session):
    """Clamp at exact rank quantiles; nulls stay null; integer dtype
    round-trips; parallelism-independent."""
    from rayskema.functions.profile import group_winsorize

    tab = pa.table({
        "g": pa.array(["a"] * 10 + ["b"] * 3),
        "v": pa.array(list(range(1, 11)) + [5, None, 100],
                      type=pa.int64())})
    for parts in (1, 4):
        rows = group_winsorize(
            rd.from_arrow(tab).repartition(parts), "g", "v",
            lo_q=0.2, hi_q=0.8, buckets=2).take_all()
        a = sorted(r["v_wins"] for r in rows if r["g"] == "a")
        # a thresholds: rank ceil(.2*10)=2 -> 2, ceil(.8*10)=8 -> 8
        assert a == [2, 2, 3, 4, 5, 6, 7, 8, 8, 8], (parts, a)
        b = {r["v"]: r["v_wins"] for r in rows if r["g"] == "b"}
        assert b[None] is None
        assert b[100] == 100  # b thresholds from {5,100}: hi=100
        assert all(r["v_wins"] is not None for r in rows
                   if r["v"] is not None)


def test_quantile_bucket_assign_decimal_rank(ray_session):
    """Regression: q=0.07 over 100 rows must use rank 7 (decimal
    semantics, as SQL parses the literal) — float ceil(0.07*100)
    would overshoot to 8."""
    from rayskema.pipelines.relational import quantile_bucket_assign

    tab = pa.table({"v": pa.array(range(1, 101), type=pa.int64())})
    out = quantile_bucket_assign(rd.from_arrow(tab), "v",
                                 [0.07]).take_all()
    # threshold = 7 -> values 1..7 are bucket 0, 8..100 bucket 1
    b = {r["v"]: r["bucket"] for r in out}
    assert b[7] == 0 and b[8] == 1


def test_asof_join_forward(ray_session):
    """direction='forward': nearest right row AT OR AFTER each left
    row (ties inclusive); no-match rows drop; backward unchanged."""
    from rayskema.pipelines.relational import asof_join

    left = rd.from_arrow(pa.table({
        "lk": pa.array([1, 1, 1, 2], type=pa.int64()),
        "lts": pa.array([100, 205, 300, 50], type=pa.timestamp("us")),
        "lid": pa.array([10, 11, 12, 13], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "rts": pa.array([205, 250, 40], type=pa.timestamp("us")),
        "v": pa.array([205, 250, 40], type=pa.timestamp("us"))}))
    out = {r["lid"]: r["asof_value"] for r in asof_join(
        left, right, key="k", left_key="lk", left_ts="lts",
        right_ts="rts", left_id="lid", value_col="v",
        direction="forward", buckets=2).take_all()}
    import datetime
    us = lambda x: datetime.datetime(1970, 1, 1) \
        + datetime.timedelta(microseconds=x)
    # lid 10 (ts100) -> 205; lid 11 (ts205) -> 205 (tie inclusive);
    # lid 12 (ts300) -> no later right row, dropped;
    # lid 13 (ts50, key2) -> right has only ts40 (< 50), dropped
    assert out == {10: us(205), 11: us(205)}, out


def test_cooccurrence_pairs(ray_session):
    """Basket pairs: per-group dedup (a pair counts once per basket),
    unordered a<b, top-k deterministic tie-break, degenerate-basket
    guard raises."""
    from rayskema.pipelines.relational import cooccurrence_pairs

    tab = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2, 3, 3, 3], type=pa.int64()),
        "i": pa.array([10, 20, 30, 10, 10, 20, 10, 20, 40],
                      type=pa.int64())})
    for parts in (1, 3):
        rows = cooccurrence_pairs(
            rd.from_arrow(tab).repartition(parts), "g", "i", k=10,
            buckets=2).take_all()
        got = {(r["item_a"], r["item_b"]): r["n"] for r in rows}
        # (10,20) in baskets 1,2,3; duplicate item 10 in basket 1
        # counts once
        assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1,
                       (10, 40): 1, (20, 40): 1}, (parts, got)

    big = pa.table({
        "g": pa.array([1] * 50, type=pa.int64()),
        "i": pa.array(range(50), type=pa.int64())})
    try:
        cooccurrence_pairs(rd.from_arrow(big), "g", "i",
                           max_group=10).take_all()
        raise AssertionError("expected failure")
    except Exception as e:
        assert "max_group" in str(e)


def test_group_window_rank_ties_vs_duckdb(ray_session):
    # tie semantics: duplicate order keys share rank/dense_rank/
    # percent_rank and cume_dist counts through the tie-run END;
    # order-dependent outputs (lead/ntile) are tie-free here because
    # (g, o) sorting inside the operator matches DuckDB's sort when the
    # VALUE ties too (all tied rows carry the same v)
    import duckdb
    from rayskema.pipelines.relational import group_window_rank

    g = ["a"] * 7 + ["b"] * 3 + ["c"]          # sizes 7, 3, 1
    o = [1, 1, 1, 2, 5, 5, 9, 1, 1, 2, 4]     # heavy ties
    v = [float(x * 10) for x in o]             # value tied with order key
    tab = pa.table({"g": g, "o": o, "v": v})
    out = _collect(group_window_rank(
        rd.from_arrow(tab), "g", ["o"], "v", ntile_n=3, buckets=2))
    mine = out.to_pandas().sort_values(
        list(out.column_names)).reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", tab)
    theirs = con.execute("""
        SELECT g, o, v,
               rank() OVER w AS "rank",
               dense_rank() OVER w AS dense_rank,
               percent_rank() OVER w AS percent_rank,
               cume_dist() OVER w AS cume_dist,
               ntile(3) OVER w AS ntile,
               lead(v) OVER w AS lead,
               first_value(v) OVER w AS first_value,
               last_value(v) OVER (PARTITION BY g ORDER BY o
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS last_value
        FROM t WINDOW w AS (PARTITION BY g ORDER BY o)
    """).fetchdf()[list(out.column_names)].sort_values(
        list(out.column_names)).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)
    # single-row group: percent_rank 0.0 (the SQL 0/0 convention)
    c_row = mine[mine.g == "c"].iloc[0]
    assert c_row["percent_rank"] == 0.0 and c_row["cume_dist"] == 1.0
    assert c_row["rank"] == 1 and pd.isna(c_row["lead"])


def test_group_window_rank_ntile_small_groups(ray_session):
    # n < k: each row its own tile (SQL NTILE), and k=1 puts all in 1
    from rayskema.pipelines.relational import group_window_rank
    tab = pa.table({"g": ["a", "a", "b"], "o": [2, 1, 1],
                    "v": [1.0, 2.0, 3.0]})
    out = _collect(group_window_rank(
        rd.from_arrow(tab), "g", ["o"], "v", ntile_n=5,
        buckets=1)).sort_by([("g", "ascending"), ("o", "ascending")])
    assert out["ntile"].to_pylist() == [1, 2, 1]
    out1 = _collect(group_window_rank(
        rd.from_arrow(tab), "g", ["o"], "v", ntile_n=1,
        buckets=1))
    assert set(out1["ntile"].to_pylist()) == {1}


def test_unpivot_nulls_and_promotion(ray_session):
    from rayskema.pipelines.relational import unpivot
    tab = pa.table({"id": [1, 2], "a": pa.array([10, None], pa.int64()),
                    "b": [1.5, 2.5]})
    out = _collect(unpivot(rd.from_arrow(tab), ["id"], ["a", "b"]))
    # mixed int64/float64 promotes to float64; nulls kept by default
    assert out["value"].type == pa.float64()
    assert out.num_rows == 4
    got = sorted(zip(out["id"].to_pylist(), out["measure"].to_pylist(),
                     out["value"].to_pylist()))
    assert got == [(1, "a", 10.0), (1, "b", 1.5),
                   (2, "a", None), (2, "b", 2.5)]
    out2 = _collect(unpivot(rd.from_arrow(tab), ["id"], ["a", "b"],
                            include_nulls=False))
    assert out2.num_rows == 3  # SQL UNPIVOT EXCLUDE NULLS


def test_dataset_set_op_null_equality(ray_session):
    # SQL EXCEPT/INTERSECT: nulls compare EQUAL, output is distinct
    from rayskema.pipelines.relational import dataset_set_op
    left = rd.from_arrow(pa.table(
        {"k": pa.array([1, 1, None, 3], pa.int64())}))
    right = rd.from_arrow(pa.table(
        {"k": pa.array([None, 3, 4], pa.int64())}))
    exc = _collect(dataset_set_op(left, right, ["k"], op="except",
                                  buckets=2))
    assert exc["k"].to_pylist() == [1]
    inter = _collect(dataset_set_op(left, right, ["k"], op="intersect",
                                    buckets=2)).sort_by("k")
    assert inter["k"].to_pylist() == [3, None]


def test_interval_concurrency_exclusive_ends(ray_session):
    from rayskema.pipelines.relational import interval_concurrency
    # g=a: [0,10) [10,20) back-to-back -> never concurrent;
    # g=b: [0,10) [5,15) [9,12) -> 3 open at t=9; null span skipped
    tab = pa.table({
        "g": ["a", "a", "b", "b", "b", "b"],
        "s": pa.array([0, 10, 0, 5, 9, None], pa.int64()),
        "e": pa.array([10, 20, 10, 15, 12, 99], pa.int64())})
    out = _collect(interval_concurrency(
        rd.from_arrow(tab), "g", "s", "e", buckets=2)).sort_by("g")
    assert out["g"].to_pylist() == ["a", "b"]
    assert out["max_concurrent"].to_pylist() == [1, 3]


def test_dataset_set_op_union_distinct(ray_session):
    from rayskema.pipelines.relational import dataset_set_op
    left = rd.from_arrow(pa.table(
        {"k": pa.array([1, 1, None], pa.int64())}))
    right = rd.from_arrow(pa.table(
        {"k": pa.array([None, 2, 2], pa.int64())}))
    out = _collect(dataset_set_op(left, right, ["k"], op="union",
                                  buckets=2)).sort_by("k")
    assert out["k"].to_pylist() == [1, 2, None]


def test_hamming_pairs_exact_vs_bruteforce(ray_session):
    # recall/precision 1.0 vs a local brute force over random strings
    # with heavy shared prefixes (the interleaved-class worst case)
    from rayskema.functions.dedup import hamming_pairs
    rng = np.random.default_rng(7)
    base = [f"PRE{int(x):06d}" for x in rng.integers(0, 300, 80)]
    base += ["", "", "x", "xy", "xz"]      # empties + shorties
    ids = list(range(len(base)))
    tab = pa.table({"id": pa.array(ids, pa.int64()), "s": base})
    out = _collect(hamming_pairs(
        rd.from_arrow(tab), "s", "id", max_hamming=1, buckets=3))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                  out["hamming"].to_pylist()))
    want = set()
    for i in range(len(base)):
        for j in range(i + 1, len(base)):
            a, b = base[i], base[j]
            if len(a) != len(b):
                continue
            d = sum(x != y for x, y in zip(a, b))
            if d <= 1:
                want.add((i, j, d))
    assert got == want
    assert any(h == 0 for _, _, h in got)    # exact dups included
    assert (base.index("") + 0, base.index("") + 1, 0) in got  # empty pair


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def test_edit_distance_pairs_exact_vs_bruteforce(ray_session):
    # recall/precision 1.0 vs local Levenshtein over a small alphabet
    # (dense ed<=1 neighborhoods: substitutions, indels, empties,
    # exact dups, nulls) across block boundaries
    from rayskema.functions.dedup import edit_distance_pairs
    rng = np.random.default_rng(11)
    base = ["".join("abc"[k] for k in rng.integers(0, 3, L))
            for L in rng.integers(0, 6, 150)]
    base += ["", "", "a", None, "ab", "ba", "abc", "abcd"]
    strs = base
    ids = list(range(len(strs)))
    tab = pa.table({"id": pa.array(ids, pa.int64()),
                    "s": pa.array(strs, pa.string())})
    out = _collect(edit_distance_pairs(
        rd.from_arrow(tab).repartition(5), "s", "id", buckets=3))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                  out["edit"].to_pylist()))
    want = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            a, b = strs[i], strs[j]
            if a is None or b is None or abs(len(a) - len(b)) > 1:
                continue
            d = _levenshtein(a, b)
            if d <= 1:
                want.add((i, j, d))
    assert got == want
    assert any(e == 0 for _, _, e in got)            # exact dups
    ia, iab = strs.index("a"), strs.index("ab")
    assert (ia, iab, 1) in got                       # an indel pair


def test_edit_distance_pairs_shapes(ray_session):
    from rayskema.functions.dedup import edit_distance_pairs
    tab = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "s": ["kitten", "sitten", "kitte", "kittens", "axbyc"]})
    out = _collect(edit_distance_pairs(
        rd.from_arrow(tab), "s", "id", buckets=1))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    # substitution (1,2); deletion (1,3); insertion (1,4);
    # sitten/kitte is ed 2; kitte/kittens differs by 2 in length;
    # axbyc unrelated
    assert pairs == {(1, 2), (1, 3), (1, 4)}


def test_group_path_ngrams(ray_session):
    # windows never straddle groups; groups shorter than n emit
    # nothing; NULL is a countable state (no IS NOT NULL shortcut)
    from rayskema.pipelines.relational import group_path_ngrams
    tab = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 1, 2, 1], pa.int64()),
        "v": pa.array(["a", "b", None, "b", "a", "b", "a"]),
    })
    out = _collect(group_path_ngrams(
        rd.from_arrow(tab).repartition(3), "g", ["o"], "v", n=3,
        buckets=2))
    got = {(r["v1"], r["v2"], r["v3"]): r["n"]
           for r in out.to_pylist()}
    # g=1 windows: (a,b,NULL), (b,NULL,b); g=2 too short; g=3 too
    assert got == {("a", "b", None): 1, ("b", None, "b"): 1}


def test_group_outliers_vs_bruteforce(ray_session):
    # exact integer verdicts vs a big-int brute force: negatives,
    # constant groups (zero variance), single-row groups, nulls,
    # and a boundary value sitting exactly ON the threshold
    from rayskema.functions.profile import group_outliers
    rng = np.random.default_rng(5)
    g = rng.integers(0, 6, 500)
    x = rng.integers(-1000, 1000, 500)
    g = np.concatenate([g, [7, 7, 7, 8]])
    x = np.concatenate([x, [42, 42, 42, -3]])
    tab = pa.table({"g": pa.array(g, pa.int64()),
                    "x": pa.array(list(x) ,pa.float64())})
    ds = rd.from_arrow(tab).repartition(5)
    out = _collect(group_outliers(ds, ["g"], "x", z2_num=2, z2_den=1,
                                  buckets=3))
    got = {r["g"]: (r["n"], r["n_outliers"]) for r in out.to_pylist()}
    want = {}
    for gv in np.unique(g):
        xs = [int(v) for v in x[g == gv]]
        n, s1, s2 = len(xs), sum(xs), sum(v * v for v in xs)
        v2 = 2 * (n * s2 - s1 * s1)
        flags = sum(1 for v in xs
                    if (n * v - s1) * (n * v - s1) * 1 > v2)
        want[int(gv)] = (n, flags)
    assert got == want
    assert got[7] == (3, 0) and got[8] == (1, 0)   # zero-variance


def test_mmr_select_vs_local_greedy(ray_session):
    # distributed per-block argmax + driver reduce must equal the
    # plain sequential greedy on the same integer arithmetic,
    # including id tie-breaks and a k larger than the corpus
    from rayskema.functions.similarity import mmr_select
    rng = np.random.default_rng(3)
    n, d = 40, 6
    m = rng.normal(0, 0.5, (n, d)).astype(np.float32)
    m[7] = m[3]                      # exact duplicate -> tie paths
    tab = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(list(m.astype(np.float64)),
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tab).repartition(5)
    out = mmr_select(ds, "embedding", "vec_id", k=50, quant=64,
                     rel_num=1, div_num=2).to_pylist()
    q = np.floor(m.astype(np.float64) * 64).astype(np.int64)
    rel = (q * q).sum(axis=1)
    sel, want = [], []
    for step in range(1, n + 1):
        best = None
        for i in range(n):
            if i in sel:
                continue
            s = int(rel[i])
            if sel:
                s -= 2 * int(max(q[i] @ q[j] for j in sel))
            if best is None or s > best[1] or (s == best[1]
                                               and i < best[0]):
                best = (i, s)
        sel.append(best[0])
        want.append({"step": step, "vec_id": best[0],
                     "score": best[1]})
    assert out == want               # k=50 > n=40: stops at n picks


def test_group_autocorr_random_vs_brute(ray_session):
    # 1200 rows / 40 groups / duplicate-free order keys, lag in {1,3}:
    # the reduceat segmentation must agree with a per-group Python
    # brute force everywhere (seeded — deterministic)
    from rayskema.pipelines.relational import group_autocorr
    rng = np.random.default_rng(7)
    n = 1200
    g = rng.integers(0, 40, n)
    o = rng.permutation(n).astype(np.int64)
    v = rng.integers(-500, 500, n).astype(np.int64)
    null_at = rng.random(n) < 0.05
    vals = [None if m else int(x) for x, m in zip(v, null_at)]
    tab = pa.table({"g": pa.array(g, pa.int64()),
                    "o": pa.array(o), "v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(tab).repartition(5)
    for lag in (1, 3):
        out = _collect(group_autocorr(ds, "g", ["o"], "v", lag=lag,
                                      buckets=3))
        got = {r["g"]: (r["n_pairs"], r["s_a"], r["s_b"], r["s_ab"],
                        r["s_aa"], r["s_bb"]) for r in out.to_pylist()}
        want = {}
        for gv in np.unique(g):
            rows = sorted((int(oo), vv) for oo, vv, gg, m
                          in zip(o, vals, g, null_at)
                          if gg == gv and not m)
            seq = [vv for _, vv in rows]
            pairs = [(seq[i], seq[i - lag])
                     for i in range(lag, len(seq))]
            if pairs:
                want[int(gv)] = (
                    len(pairs), sum(a for a, _ in pairs),
                    sum(b for _, b in pairs),
                    sum(a * b for a, b in pairs),
                    sum(a * a for a, _ in pairs),
                    sum(b * b for _, b in pairs))
        assert got == want, f"lag={lag}"


def test_sequence_pattern_flags(ray_session):
    from rayskema.pipelines.relational import sequence_pattern_flags
    tab = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "o": pa.array([2, 1, 3, 1, 2, 1, 2], pa.int64()),
        "tok": pa.array(["b", "a", "c", "x", "y", None, None])})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(sequence_pattern_flags(
        ds, "g", "tok", ["o"],
        patterns={"starts_a": "^a", "has_bc": "bc"}, buckets=2))
    got = {r["g"]: (r["seq"], r["starts_a"], r["has_bc"])
           for r in out.to_pylist()}
    # order col reorders group 1 to a,b,c; group 3 is all-null ->
    # NULL sequence and NULL flags (SQL string_agg semantics)
    assert got == {1: ("abc", True, True),
                   2: ("xy", False, False),
                   3: (None, None, None)}


def test_interpolate_by_group_rationals(ray_session):
    from rayskema.pipelines.relational import interpolate_by_group
    tab = pa.table({
        "g": pa.array(list("aaaaaa" "bb" "c")),
        "o": pa.array([1, 2, 3, 4, 5, 6, 1, 2, 1], pa.int64()),
        "v": pa.array([None, 10, None, None, 40, None,
                       None, None, 7], pa.int64())})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(interpolate_by_group(ds, "g", ["o"], "v",
                                        buckets=2))
    got = {(r["g"], r["o"]): (r["interp_num"], r["interp_den"])
           for r in out.to_pylist()}
    assert got == {
        ("a", 1): (None, None),          # leading null: no left arm
        ("a", 2): (10, 1),
        ("a", 3): (60, 3),               # 10 + 30·(1/3) = 20
        ("a", 4): (90, 3),               # 10 + 30·(2/3) = 30
        ("a", 5): (40, 1),
        ("a", 6): (None, None),          # trailing null
        ("b", 1): (None, None),          # all-null group
        ("b", 2): (None, None),
        ("c", 1): (7, 1)}


def test_crosstab_deviation_exact_rationals(ray_session):
    from rayskema.functions.profile import crosstab_deviation
    tab = pa.table({"r": pa.array(["a", "a", "a", "b", "b", None]),
                    "c": pa.array(["x", "x", "y", "x", "y", "x"])})
    out = _collect(crosstab_deviation(
        rd.from_arrow(tab).repartition(3), "r", "c", buckets=2))
    got = {(r["r"], r["c"]): (r["o"], r["row_n"], r["col_n"], r["n"],
                              r["dev_num"], r["dev_den"])
           for r in out.to_pylist()}
    # null row key drops; n=5; cell (a,x): dev = (2*5-3*3)/(5*3*3)
    assert got == {("a", "x"): (2, 3, 3, 5, 1, 45),
                   ("a", "y"): (1, 3, 2, 5, -1, 30),
                   ("b", "x"): (1, 2, 3, 5, -1, 30),
                   ("b", "y"): (1, 2, 2, 5, 1, 20)}
    # sanity: Σ(o·n − row_n·col_n) = n² − (Σrow)(Σcol) = 0 whenever
    # every (row, col) combination is observed
    assert sum(r["dev_num"] for r in out.to_pylist()) == 0


def test_group_autocorr_lag_pairs_exact(ray_session):
    from rayskema.pipelines.relational import group_autocorr
    tab = pa.table({
        "g": pa.array(list("aaaab" "ccc")),
        "o": pa.array([1, 2, 3, 4, 1, 1, 2, 3], pa.int64()),
        "v": pa.array([1, 2, 4, 8, 5, 3, None, 7], pa.int64())})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(group_autocorr(ds, "g", ["o"], "v", lag=1,
                                  buckets=2))
    got = {r["g"]: (r["n_pairs"], r["s_a"], r["s_b"], r["s_ab"],
                    r["s_aa"], r["s_bb"]) for r in out.to_pylist()}
    # "b" has one row (no pair); "c"'s null row drops before pairing,
    # so its surviving values 3,7 become adjacent
    assert got == {"a": (3, 14, 7, 42, 84, 21),
                   "c": (1, 7, 3, 21, 49, 9)}
    out2 = _collect(group_autocorr(ds, "g", ["o"], "v", lag=2,
                                   buckets=2))
    got2 = {r["g"]: (r["n_pairs"], r["s_a"], r["s_b"], r["s_ab"],
                     r["s_aa"], r["s_bb"]) for r in out2.to_pylist()}
    assert got2 == {"a": (2, 12, 3, 20, 80, 5)}


def test_association_rules_exact_integer_stats(ray_session):
    # baskets: g1={A,B,C} g2={A,B} g3={A,B} g4={A,C} g5={B}; N=5
    # supports A=4 B=4 C=2; pairs (A,B)=3 (A,C)=2 (B,C)=1
    from rayskema.pipelines.relational import association_rules
    rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
            (3, "A"), (3, "B"), (4, "A"), (4, "C"), (5, "B"),
            (2, "A"),            # duplicate item in a basket: once
            (None, "X"), (6, None)]   # null keys drop entirely
    tab = pa.table({"g": pa.array([g for g, _ in rows], pa.int64()),
                    "i": pa.array([i for _, i in rows])})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(association_rules(
        ds, "g", "i", min_pair_support=2, conf_num=3, conf_den=5,
        buckets=2))
    got = {(r["ant"], r["cons"]): (r["n_ab"], r["n_ant"], r["n_cons"],
                                   r["n_groups"])
           for r in out.to_pylist()}
    # conf >= 3/5 keeps A->B (3/4), B->A (3/4), C->A (2/2);
    # A->C (2/4) fails 2*5 >= 4*3; (B,C)=1 below min support
    assert got == {("A", "B"): (3, 4, 4, 5),
                   ("B", "A"): (3, 4, 4, 5),
                   ("C", "A"): (2, 2, 4, 5)}
    # threshold 1/2 admits A->C on the exact boundary (2*2 == 4*1)
    out2 = _collect(association_rules(
        ds, "g", "i", min_pair_support=2, conf_num=1, conf_den=2,
        buckets=2))
    assert sorted((r["ant"], r["cons"]) for r in out2.to_pylist()) \
        == [("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")]


def test_association_rules_random_vs_brute(ray_session):
    # 150 baskets / 12 items, seeded: supports, confidence filtering
    # and the direction expansion must match a set-based brute force
    from rayskema.pipelines.relational import association_rules
    from itertools import combinations
    rng = np.random.default_rng(11)
    g = rng.integers(0, 150, 900)
    i = rng.integers(0, 12, 900)
    tab = pa.table({"g": pa.array(g, pa.int64()),
                    "i": pa.array(i, pa.int64())})
    ds = rd.from_arrow(tab).repartition(4)
    out = _collect(association_rules(ds, "g", "i",
                                     min_pair_support=3, conf_num=2,
                                     conf_den=5, buckets=3))
    got = {(r["ant"], r["cons"]): (r["n_ab"], r["n_ant"], r["n_cons"],
                                   r["n_groups"])
           for r in out.to_pylist()}
    baskets = {}
    for gg, ii in zip(g, i):
        baskets.setdefault(int(gg), set()).add(int(ii))
    ng = len(baskets)
    isup, pair = {}, {}
    for items in baskets.values():
        for it in items:
            isup[it] = isup.get(it, 0) + 1
        for a, b in combinations(sorted(items), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    want = {}
    for (a, b), nab in pair.items():
        if nab < 3:
            continue
        for ant, cons in ((a, b), (b, a)):
            if nab * 5 >= isup[ant] * 2:
                want[(ant, cons)] = (nab, isup[ant], isup[cons], ng)
    assert got == want
    assert want  # the seed must actually produce rules


def test_kcore_peels_path_keeps_clique(ray_session):
    # K5 clique (0-4) + a path 4-5-6-7-8: the path needs one peel
    # round per tail vertex (degree cascades), the clique survives
    # k=3; a second run with k=5 peels EVERYTHING (empty core must
    # keep flowing through the per-round joins without schema loss)
    from rayskema.functions.graph import kcore
    cl = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(4, 5), (5, 6), (6, 7), (7, 8)]
    tab = pa.table({"src": pa.array([a for a, _ in cl + path],
                                    pa.int64()),
                    "dst": pa.array([b for _, b in cl + path],
                                    pa.int64())})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(kcore(ds, "src", "dst", k=3, rounds=6, buckets=2))
    got = dict(zip(out["v"].to_pylist(), out["deg"].to_pylist()))
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # synchronous-rounds contract: after only 2 rounds the path has
    # peeled two tail vertices (8 then 7), not yet 6 and 5
    out2 = _collect(kcore(ds, "src", "dst", k=2, rounds=2, buckets=2))
    assert sorted(out2["v"].to_pylist()) == [0, 1, 2, 3, 4, 5, 6]
    empty = _collect(kcore(ds, "src", "dst", k=5, rounds=4, buckets=2))
    assert empty.num_rows == 0


def test_bfs_hops_directed_chain_and_frontier_rounds(ray_session):
    # directed chain 0->1->2->3->4 plus a back edge 4->0 and an
    # isolated pair 10->11: sources are {v % 5 == 0} = {0, 10}.
    # Hop distances follow edge direction only; vertex 11 is reached
    # from 10 in one hop; nothing reaches 10 itself except d0.
    from rayskema.functions.graph import bfs_hops
    e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (10, 11)]
    tab = pa.table({"src": pa.array([a for a, _ in e], pa.int64()),
                    "dst": pa.array([b for _, b in e], pa.int64())})
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(bfs_hops(ds, "src", "dst", source_mod=5, rounds=6,
                            buckets=2))
    got = dict(zip(out["v"].to_pylist(), out["d"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 10: 0, 11: 1}
    # fixed-round contract: after 2 rounds the chain is known only
    # to depth 2 — vertices 3 and 4 are still unreached and dropped
    out2 = _collect(bfs_hops(ds, "src", "dst", source_mod=5, rounds=2,
                             buckets=2))
    got2 = dict(zip(out2["v"].to_pylist(), out2["d"].to_pylist()))
    assert got2 == {0: 0, 1: 1, 2: 2, 10: 0, 11: 1}
    # rounds=0: just the seeded sources
    out0 = _collect(bfs_hops(ds, "src", "dst", source_mod=5, rounds=0,
                             buckets=2))
    got0 = dict(zip(out0["v"].to_pylist(), out0["d"].to_pylist()))
    assert got0 == {0: 0, 10: 0}
    # no sources at all (no vertex divisible by 97 — note 0 % m == 0,
    # so the graph must not contain vertex 0): empty result must flow
    # through every round without schema loss
    tab2 = pa.table({"src": pa.array([1, 2], pa.int64()),
                     "dst": pa.array([2, 3], pa.int64())})
    none = _collect(bfs_hops(rd.from_arrow(tab2), "src", "dst",
                             source_mod=97, rounds=3, buckets=2))
    assert none.num_rows == 0


def test_impute_by_group_strategies(ray_session):
    from rayskema.pipelines.relational import impute_by_group
    tab = pa.table({
        "g": pa.array(["a", "a", "a", "a", "b", "b", "c"],),
        "id": pa.array(range(7), pa.int64()),
        "v": pa.array([5, 5, 9, None, -3, None, None], pa.int64()),
    })
    ds = rd.from_arrow(tab).repartition(3)
    out = _collect(impute_by_group(ds, ["g"], "v", strategy="mode",
                                   buckets=2))
    got = {r["id"]: (r["v"], r["imputed"]) for r in out.to_pylist()}
    assert got[3] == (5, True)            # mode of {5,5,9}
    assert got[5] == (-3, True)
    assert got[6] == (None, False)        # all-null group: no fill
    assert got[0] == (5, False)
    # floor-mean: (-3)//1 = -3; a: (5+5+9)//3 = 6; and floor on a
    # negative mean: d group {-3, -4} -> -7//2 = -4 (floors, not
    # truncates)
    tab2 = pa.table({
        "g": pa.array(["d", "d", "d"]),
        "id": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([-3, -4, None], pa.int64())})
    out2 = _collect(impute_by_group(
        rd.from_arrow(tab2), ["g"], "v", strategy="mean_floor",
        buckets=1))
    got2 = {r["id"]: r["v"] for r in out2.to_pylist()}
    assert got2[2] == -4


def test_funnel_within_window_semantics(ray_session):
    from rayskema.pipelines.relational import funnel_within

    def t(sec):
        return sec * 1_000_000

    rows = [
        # u1: click 5s after view (inside 10s), purchase 8s after
        # click -> converted
        (1, t(0), "view"), (1, t(5), "click"), (1, t(13), "purchase"),
        # u2: click outside the window -> not converted, t2 null
        (2, t(0), "view"), (2, t(11), "click"), (2, t(12), "purchase"),
        # u3: anchor = EARLIEST view; click within window of it even
        # though a later view exists; purchase exactly AT the bound
        # (inclusive)
        (3, t(0), "view"), (3, t(20), "view"), (3, t(9), "click"),
        (3, t(19), "purchase"),
        # u4: click at the SAME ts as view -> strict '>' rejects it
        (4, t(0), "view"), (4, t(0), "click"),
        # u5: null ts never matches; no view at all
        (5, None, "view"), (5, t(1), "click"),
    ]
    tab = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "et": pa.array([r[2] for r in rows]),
    })
    out = _collect(funnel_within(
        rd.from_arrow(tab).repartition(3), "u", "ts", "et",
        ["view", "click", "purchase"], within_us=t(10), buckets=2))
    got = {r["u"]: (r["converted"], r["t1"], r["t2"], r["t3"])
           for r in out.to_pylist()}
    import datetime as dt

    def ep(sec):
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sec)

    assert got[1] == (True, ep(0), ep(5), ep(13))
    assert got[2] == (False, ep(0), None, None)
    assert got[3] == (True, ep(0), ep(9), ep(19))
    assert got[4] == (False, ep(0), None, None)
    assert got[5] == (False, None, None, None)


def test_label_propagation_vs_local_sync(ray_session):
    # distributed majority vote must equal a local synchronous LPA
    # simulation exactly (count-desc, label-asc tie-breaks), on a
    # random graph plus a deterministic two-cliques-and-a-bridge
    from rayskema.functions.graph import label_propagation
    rng = np.random.default_rng(9)
    e = set()
    for _ in range(60):
        a, b = int(rng.integers(0, 25)), int(rng.integers(0, 25))
        if a != b:
            e.add((min(a, b), max(a, b)))
    for c in ([30, 31, 32], [40, 41, 42]):      # two triangles
        for i in range(3):
            e.add((c[i], c[(i + 1) % 3]) if c[i] < c[(i + 1) % 3]
                  else (c[(i + 1) % 3], c[i]))
    e.add((32, 40))                             # bridge
    edges = sorted(e)
    tab = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64())})
    rounds = 3
    out = _collect(label_propagation(
        rd.from_arrow(tab).repartition(4), "src", "dst",
        rounds=rounds, buckets=3))
    got = dict(zip(out["v"].to_pylist(), out["lab"].to_pylist()))
    # local synchronous reference
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            cnt = {}
            for u in nbrs[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = new
    assert got == lab


def test_edit_distance2_pairs_exact_vs_bruteforce(ray_session):
    # PassJoin radius-2 join: recall/precision 1.0 vs local
    # Levenshtein — small alphabet (dense neighborhoods), lengths 0-12
    # (tiny-block path + partition path), nulls, dup strings, across
    # block boundaries
    from rayskema.functions.dedup import edit_distance2_pairs
    rng = np.random.default_rng(7)
    strs = ["".join("abc"[k] for k in rng.integers(0, 3, L))
            for L in rng.integers(0, 13, 220)]
    strs += ["", "", "a", None, "ab", "ba", "abc", "abcd", "aaaa",
             "aaaaaaaaaaaa"]
    ids = list(range(len(strs)))
    tab = pa.table({"id": pa.array(ids, pa.int64()),
                    "s": pa.array(strs, pa.string())})
    out = _collect(edit_distance2_pairs(
        rd.from_arrow(tab).repartition(5), "s", "id", buckets=3))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                  out["edit"].to_pylist()))
    want = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            a, b = strs[i], strs[j]
            if a is None or b is None or abs(len(a) - len(b)) > 2:
                continue
            d = _levenshtein(a, b)
            if d <= 2:
                want.add((i, j, d))
    assert got == want
    assert any(e == 2 for _, _, e in got)            # radius-2 pairs
    assert any(e == 0 for _, _, e in got)            # exact dups


def test_edit_distance2_pairs_shapes(ray_session):
    from rayskema.functions.dedup import edit_distance2_pairs
    tab = pa.table({"id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                    "s": ["kitten", "sitting", "kitte", "kit",
                          "mitten", "xyzzy"]})
    out = _collect(edit_distance2_pairs(
        rd.from_arrow(tab), "s", "id", buckets=1))
    got = {(a, b): e for a, b, e in zip(out["id_a"].to_pylist(),
                                        out["id_b"].to_pylist(),
                                        out["edit"].to_pylist())}
    # kitten/kitte del=1; kitten/mitten sub=1; kitte/kit ed=2;
    # kitte/mitten ed=2; kitten/kit ed=3 (out); sitting far from all
    assert got == {(1, 3): 1, (1, 5): 1, (3, 4): 2, (3, 5): 2}


def test_group_ols_vs_numpy(ray_session):
    from rayskema.pipelines.relational import group_ols
    rng = np.random.default_rng(3)
    g = rng.choice(["a", "b"], 200).tolist() + ["c", "c", "d"]
    x = rng.integers(0, 50, 200).tolist() + [7, 7, 9]   # c: constant x
    y = rng.integers(0, 1000, 200).tolist() + [1, 2, 3]
    x[5] = None
    y[6] = None
    tab = pa.table({"g": pa.array(g), "x": pa.array(x, pa.float64()),
                    "y": pa.array(y, pa.float64())})
    out = _collect(group_ols(rd.from_arrow(tab).repartition(4),
                             "g", "x", "y", buckets=2)).sort_by("g")
    rows = {r["g"]: r for r in out.to_pylist()}
    for grp in ("a", "b"):
        xs = np.array([xi for gi, xi, yi in zip(g, x, y)
                       if gi == grp and xi is not None
                       and yi is not None], dtype=np.float64)
        ys = np.array([yi for gi, xi, yi in zip(g, x, y)
                       if gi == grp and xi is not None
                       and yi is not None], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert rows[grp]["n"] == len(xs)
        assert abs(rows[grp]["slope"] - slope) < 1e-9
        assert abs(rows[grp]["intercept"] - intercept) < 1e-9
    # constant-x group: denominator 0 -> SQL NULL, n still counted
    assert rows["c"]["slope"] is None
    assert rows["c"]["intercept"] is None
    assert rows["c"]["n"] == 2
    # single-point group: also degenerate (n*sxx == sx*sx)
    assert rows["d"]["slope"] is None


def test_hopping_window_distinct_vs_brute(ray_session):
    from rayskema.pipelines.relational import hopping_window_distinct
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 100, 300)
    users = rng.integers(0, 9, 300)
    tab = pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "u": pa.array(users, pa.int64())})
    out = _collect(hopping_window_distinct(
        rd.from_arrow(tab).repartition(5), "ts", "u",
        size_us=30, hop_us=10, buckets=3))
    ws_us = out["window_start"].cast(pa.int64()).to_pylist()
    got = dict(zip(ws_us, out["n_distinct"].to_pylist()))
    want = {}
    for w in range(-20, 100, 10):
        s = {u for t, u in zip(ts, users) if w <= t < w + 30}
        if s:
            want[w] = len(s)
    assert got == want


def test_resample_fill_gaps_and_negative_epochs(ray_session):
    import pytest
    from rayskema.pipelines.relational import resample_fill
    # group "a": buckets 0 and 3 occupied -> 1,2 zero-filled;
    # group "b": one pre-1970 ts floors to bucket -1 (not 0)
    us = [5, 8, 35, -3, None]
    grp = ["a", "a", "a", "b", "b"]
    tab = pa.table({
        "g": pa.array(grp),
        "ts": pa.array(us, pa.timestamp("us"))})
    out = _collect(resample_fill(
        rd.from_arrow(tab).repartition(3), ["g"], "ts", every_us=10,
        buckets=2)).sort_by([("g", "ascending"),
                             ("bucket_us", "ascending")])
    rows = list(zip(out["g"].to_pylist(), out["bucket_us"].to_pylist(),
                    out["n"].to_pylist()))
    assert rows == [("a", 0, 2), ("a", 10, 0), ("a", 20, 0),
                    ("a", 30, 1), ("b", -10, 1)]
    with pytest.raises(Exception, match="max_fill"):
        _collect(resample_fill(
            rd.from_arrow(pa.table({
                "g": ["x", "x"],
                "ts": pa.array([0, 10_000_000_000],
                               pa.timestamp("us"))})),
            ["g"], "ts", every_us=10, buckets=1, max_fill=1000))


def test_bm25_scores_vs_local(ray_session):
    # parity with a straight-line local BM25 (Okapi-plus idf), with
    # empty / null / no-match docs in the corpus counting toward N
    # and avgdl but never emitting rows
    import math, re
    from rayskema.functions.textstats import bm25_scores
    docs = ["the query engine", "merge merge sort", "",
            None, "no hits here", "stream query merge",
            "query Query QUERY!"]
    ids = list(range(len(docs)))
    terms = ["query", "merge", "stream"]
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = _collect(bm25_scores(
        rd.from_arrow(tab).repartition(3), "text", "doc_id",
        terms)).sort_by("doc_id")

    toks = [re.findall(r"[a-z0-9]+", (d or "").lower()) for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    k1, b = 1.2, 0.75
    want = {}
    for t in sorted(set(terms)):
        df = sum(t in tk for tk in toks)
        idf = math.log((N - df + 0.5) / (df + 0.5) + 1)
        for i, tk in enumerate(toks):
            tf = tk.count(t)
            if not tf:
                continue
            c = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl))
            su, nt = want.get(i, (0, 0))
            want[i] = (su + int(math.floor(abs(c) * 1e6 + 0.5)), nt + 1)
    assert out["doc_id"].to_pylist() == sorted(want)
    for i, su, nt in zip(out["doc_id"].to_pylist(),
                         out["score_u"].to_pylist(),
                         out["n_terms"].to_pylist()):
        assert (su, nt) == want[i]
    # repeated-term doc scores saturate sublinearly: tf=3 'query'
    # scores < 3x the tf=1 doc
    row = {i: s for i, (s, _) in want.items()}
    assert row[6] < 3 * row[0]


def test_hamming_pairs_distance_bound(ray_session):
    from rayskema.functions.dedup import hamming_pairs
    tab = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                    "s": ["abcd", "abce", "abXY"]})
    out = _collect(hamming_pairs(
        rd.from_arrow(tab), "s", "id", max_hamming=1, buckets=1))
    assert set(zip(out["id_a"].to_pylist(),
                   out["id_b"].to_pylist())) == {(1, 2)}
    out2 = _collect(hamming_pairs(
        rd.from_arrow(tab), "s", "id", max_hamming=2, buckets=1))
    assert set(zip(out2["id_a"].to_pylist(), out2["id_b"].to_pylist(),
                   out2["hamming"].to_pylist())) == {(1, 2, 1),
                                                     (1, 3, 2),
                                                     (2, 3, 2)}


def test_regex_extract_columns(ray_session):
    from rayskema.functions.textstats import regex_extract_columns
    tab = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                    "s": ["a-1", "bb-22", "nope", None]})
    out = _collect(regex_extract_columns(
        rd.from_arrow(tab), "s", r"^(?P<k>[a-z]+)-(?P<v>[0-9]+)$",
        ["id"])).sort_by("id")
    assert out["k"].to_pylist() == ["a", "bb", None, None]
    assert out["v"].to_pylist() == ["1", "22", None, None]
    out2 = _collect(regex_extract_columns(
        rd.from_arrow(tab), "s", r"^(?P<k>[a-z]+)-(?P<v>[0-9]+)$",
        ["id"], no_match="")).sort_by("id")
    # no_match fills true non-matches only; NULL input stays NULL
    # (DuckDB regexp_extract(NULL, ...) is NULL)
    assert out2["k"].to_pylist() == ["a", "bb", "", None]
    with pytest.raises(ValueError, match="named groups"):
        regex_extract_columns(rd.from_arrow(tab), "s", "[a-z]+")


def test_join_many_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    from rayskema.pipelines.relational import join_many
    a = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": ["a", "b", "c", "d"]})
    b = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": [10.0, 20.0, 30.0]})      # name collision -> v_r
    c = pa.table({"k": pa.array([2, 3, 9], pa.int64()),
                  "w": [True, False, True]})
    out = _collect(join_many(
        [rd.from_arrow(a), rd.from_arrow(b), rd.from_arrow(c)],
        "k", hows=["inner", "left_outer"], buckets=2))
    con = duckdb.connect()
    con.register("a", a); con.register("b", b); con.register("c", c)
    want = con.execute("""
        SELECT a.k, a.v, b.v AS v_r, c.w
        FROM a JOIN b USING (k) LEFT JOIN c USING (k)
    """).fetchdf()
    mine = out.to_pandas()[list(want.columns)] \
        .sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    # null keys never match (inner drops them)
    a2 = pa.table({"k": pa.array([1, None], pa.int64()), "x": [1, 2]})
    b2 = pa.table({"k": pa.array([1, None], pa.int64()), "y": [3, 4]})
    out2 = _collect(join_many([rd.from_arrow(a2), rd.from_arrow(b2)],
                              "k", buckets=1))
    assert out2.num_rows == 1 and out2["k"].to_pylist() == [1]


def test_hamming_pairs_empty_and_null_rows(ray_session):
    # trailing empty/null rows: no reduceat crash; nulls never pair
    # (SQL mismatches(NULL, x) is NULL); empty-empty pairs at dist 0
    from rayskema.functions.dedup import hamming_pairs
    tab = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "s": ["ab", "ab", None, "", ""]})
    out = _collect(hamming_pairs(
        rd.from_arrow(tab), "s", "id", max_hamming=1, buckets=1))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                  out["hamming"].to_pylist()))
    assert got == {(1, 2, 0), (4, 5, 0)}


def test_regex_extract_null_input_stays_null(ray_session):
    # DuckDB: regexp_extract(NULL, ...) is NULL; '' only for a real
    # non-match under the empty-string convention
    from rayskema.functions.textstats import regex_extract_columns
    tab = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                    "s": ["a-1", None, "nope"]})
    out = _collect(regex_extract_columns(
        rd.from_arrow(tab), "s", r"^(?P<k>[a-z])-(?P<v>[0-9])$",
        ["id"], no_match="")).sort_by("id")
    assert out["k"].to_pylist() == ["a", None, ""]


def test_round4_ops_parallelism_independent(ray_session):
    # results must be identical across block layouts and bucket counts
    # (the cluster-size-independence contract every exchange relies on)
    import pandas as pd
    from rayskema.pipelines.relational import (
        dataset_set_op, group_window_rank, interval_concurrency,
        join_many, unpivot)
    from rayskema.functions.dedup import hamming_pairs
    rng = np.random.default_rng(3)
    n = 400
    tab = pa.table({
        "g": pa.array(rng.integers(0, 7, n), pa.int64()),
        "o": pa.array(rng.integers(0, 50, n), pa.int64()),
        "v": rng.normal(size=n),
        "s": [f"w{int(x):04d}" for x in rng.integers(0, 120, n)],
        "id": pa.array(np.arange(n), pa.int64()),
    })

    def canon(t: pa.Table) -> "pd.DataFrame":
        df = t.to_pandas()[sorted(t.column_names)]
        return df.sort_values(by=list(df.columns)) \
            .reset_index(drop=True)

    def runs(make):
        outs = []
        for blocks, buckets in ((1, 1), (7, 5)):
            ds = rd.from_arrow(tab).repartition(blocks)
            outs.append(canon(_collect(make(ds, buckets))))
        return outs

    for make in (
        lambda ds, b: group_window_rank(ds, "g", ["o", "id"], "v",
                                        ntile_n=3, buckets=b),
        lambda ds, b: interval_concurrency(ds, "g", "o", "id",
                                           buckets=b),
        lambda ds, b: unpivot(ds.select_columns(["id", "o", "v"]),
                              ["id"], ["o", "v"]),
        lambda ds, b: hamming_pairs(ds, "s", "id", max_hamming=1,
                                    buckets=b),
        lambda ds, b: dataset_set_op(
            ds.select_columns(["g"]),
            rd.from_arrow(tab.select(["o"])).map_batches(
                lambda t: pa.table({"g": t["o"]}),
                batch_format="pyarrow"),
            ["g"], op="except", buckets=b),
        lambda ds, b: join_many(
            [ds.select_columns(["id", "g"]),
             ds.select_columns(["id", "o"]),
             ds.select_columns(["id", "v"])], "id", buckets=b),
    ):
        a, b = runs(make)
        pd.testing.assert_frame_equal(a, b)


def test_asof_join_tolerance(ray_session):
    from rayskema.pipelines.relational import asof_join
    left = rd.from_arrow(pa.table({
        "uid": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([100, 200, 300], pa.timestamp("us"))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "rts": pa.array([90, 205], pa.timestamp("us"))}))
    # backward, tol 15us: uid1 matches 90 (gap 10); uid2's nearest is
    # 90 (gap 110 > 15) -> dropped, NOT matched to a farther row;
    # uid3 matches 205 (gap 95 > 15) -> dropped
    out = _collect(asof_join(
        left, right, key="k", left_key="k", left_ts="ts",
        right_ts="rts", left_id="uid", value_col="rts",
        tolerance_us=15, buckets=1))
    assert out.column(0).to_pylist() == [1]
    # forward, tol 10us: uid2 -> 205 (gap 5); uid1 nearest fwd is 205
    # (gap 105) dropped; uid3 has no forward row
    outf = _collect(asof_join(
        left, right, key="k", left_key="k", left_ts="ts",
        right_ts="rts", left_id="uid", value_col="rts",
        direction="forward", tolerance_us=10, buckets=1))
    assert outf.column(0).to_pylist() == [2]


def test_weighted_sample_properties(ray_session):
    # layout-independent, proportional-ish to weight, w<=0/null excluded
    import collections
    from rayskema.functions.sampling import weighted_sample
    n = 300
    w = np.where(np.arange(n) % 3 == 0, 100.0, 1.0)
    w[5] = 0.0
    tab = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                    "w": pa.array(w)})
    outs = []
    for blocks in (1, 9):
        out = _collect(weighted_sample(
            rd.from_arrow(tab).repartition(blocks), "id", "w", k=30))
        outs.append(sorted(zip(out["id"].to_pylist(),
                               out["rank"].to_pylist())))
    assert outs[0] == outs[1]               # layout-independent
    ids = [i for i, _ in outs[0]]
    assert 5 not in ids                      # zero weight never wins
    heavy = sum(1 for i in ids if i % 3 == 0)
    assert heavy >= 20                       # heavy rows dominate


def test_group_corr_exact_and_degenerate(ray_session):
    from rayskema.pipelines.relational import group_corr
    tab = pa.table({
        "g": ["a"] * 4 + ["b"] * 2 + ["c"],
        "x": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 9.0]),
        "y": pa.array([2.0, 4.0, 6.0, 8.0, 1.0, 2.0, 7.0])})
    out = _collect(group_corr(rd.from_arrow(tab), "g", "x", "y",
                              buckets=2)).sort_by("g")
    rows = {out["g"][i].as_py(): i for i in range(out.num_rows)}
    # perfect linear group: corr exactly 1.0
    assert out["corr"][rows["a"]].as_py() == 1.0
    # constant-x group: corr NULL (zero variance)
    assert out["corr"][rows["b"]].as_py() is None
    assert out["covar_pop"][rows["b"]].as_py() == 0.0
    # single-row group: covar_samp and corr NULL, covar_pop 0
    assert out["covar_samp"][rows["c"]].as_py() is None
    assert out["corr"][rows["c"]].as_py() is None
    assert out["n"].to_pylist() == [4, 2, 1]


def test_hopping_window_agg(ray_session):
    from rayskema.pipelines.relational import hopping_window_agg
    # size 10, hop 5 -> each event in 2 windows; negative ts floors
    tab = pa.table({
        "ts": pa.array([0, 4, 5, 12, -3], pa.timestamp("us")),
        "g": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = _collect(hopping_window_agg(
        rd.from_arrow(tab), "ts", ["g"], "v", size_us=10, hop_us=5,
        buckets=1)).sort_by("window_start")
    ws = [int(x.value) for x in out["window_start"]]
    n = out["n"].to_pylist()
    got = dict(zip(ws, n))
    # event@-3 -> windows -5, -10; 0,4 -> 0,-5; 5 -> 5,0; 12 -> 10,5
    assert got == {-10: 1, -5: 3, 0: 3, 5: 2, 10: 1}
    with pytest.raises(ValueError):
        hopping_window_agg(rd.from_arrow(tab), "ts", ["g"], "v",
                           size_us=7, hop_us=5)


def test_triangle_stats(ray_session):
    from rayskema.functions.graph import triangle_stats
    rng = np.random.default_rng(7)
    pairs = set()
    for _ in range(400):
        a, b = rng.integers(0, 60, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    pairs = sorted(pairs)
    tab = pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                    "b": pa.array([p[1] for p in pairs], pa.int64())})
    out = triangle_stats(rd.from_arrow(tab).repartition(5),
                         "a", "b", buckets=4).to_pydict()
    # brute-force census on the driver
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(len(adj[a] & adj[b]) for a, b in pairs) // 3
    wed = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert out["n_edges"] == [len(pairs)]
    assert out["n_wedges"] == [wed]
    assert out["n_triangles"] == [tri]
    assert out["transitivity"] == [3.0 * tri / wed]


def test_triangle_stats_degenerate(ray_session):
    from rayskema.functions.graph import triangle_stats
    # a single edge: no wedges, no triangles, transitivity NULL
    tab = pa.table({"a": pa.array([1], pa.int64()),
                    "b": pa.array([2], pa.int64())})
    out = triangle_stats(rd.from_arrow(tab), "a", "b",
                         buckets=2).to_pydict()
    assert out["n_edges"] == [1]
    assert out["n_wedges"] == [0]
    assert out["n_triangles"] == [0]
    assert out["transitivity"] == [None]


def test_pagerank_integer(ray_session):
    from rayskema.functions.graph import pagerank
    rng = np.random.default_rng(11)
    pairs = set()
    for _ in range(300):
        a, b = rng.integers(0, 40, 2)
        if a != b:
            pairs.add((int(a), int(b)))
    pairs = sorted(pairs)
    tab = pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                    "dst": pa.array([p[1] for p in pairs], pa.int64())})
    out = _collect(pagerank(rd.from_arrow(tab).repartition(5),
                            iterations=4, buckets=4)).sort_by("v")
    # driver-side reference: the exact same integer recurrence
    verts = sorted({v for p in pairs for v in p})
    outdeg = {}
    for a, _ in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    r = {v: 1_000_000 for v in verts}
    base = (1_000_000 * 15) // 100
    for _ in range(4):
        nxt = {v: base for v in verts}
        for a, b in pairs:
            nxt[b] += (r[a] * 85) // (100 * outdeg[a])
        r = nxt
    assert out["v"].to_pylist() == verts
    assert out["r"].to_pylist() == [r[v] for v in verts]
    # mass never exceeds the initial total (dangling mass is dropped)
    assert sum(r.values()) <= 1_000_000 * len(verts)


def test_pagerank_sink_vertex(ray_session):
    from rayskema.functions.graph import pagerank
    # 1 -> 2 -> 3; 3 is dangling (its mass drops each iteration)
    tab = pa.table({"src": pa.array([1, 2], pa.int64()),
                    "dst": pa.array([2, 3], pa.int64())})
    out = _collect(pagerank(rd.from_arrow(tab),
                            iterations=2, buckets=2)).sort_by("v")
    s, base = 1_000_000, 150_000
    r1 = {1: base, 2: base + (s * 85) // 100, 3: base + (s * 85) // 100}
    r2 = {1: base, 2: base + (r1[1] * 85) // 100,
          3: base + (r1[2] * 85) // 100}
    assert out["v"].to_pylist() == [1, 2, 3]
    assert out["r"].to_pylist() == [r2[1], r2[2], r2[3]]


def test_skyline_2d(ray_session):
    from rayskema.pipelines.relational import skyline
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1000, 500).astype(np.int64)
    y = rng.integers(0, 1000, 500).astype(np.int64)
    tab = pa.table({"id": pa.array(np.arange(500)),
                    "x": pa.array(x), "y": pa.array(y)})
    out = _collect(skyline(rd.from_arrow(tab).repartition(7),
                           minimize=["x"], maximize=["y"]))
    # brute-force reference
    keep = []
    for i in range(500):
        dom = ((x <= x[i]) & (y >= y[i]) &
               ((x < x[i]) | (y > y[i]))).any()
        if not dom:
            keep.append(i)
    assert sorted(out["id"].to_pylist()) == keep
    # frontier rows carry their original dims through untouched
    got = dict(zip(out["id"].to_pylist(), out["x"].to_pylist()))
    for i in keep:
        assert got[i] == x[i]


def test_skyline_duplicates_and_chunking(ray_session):
    from rayskema.pipelines.relational import skyline
    # identical points never dominate each other: both copies stay;
    # chunk=2 exercises the cross-chunk frontier accumulation
    tab = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "x": pa.array([1, 1, 2, 3, 0], pa.int64()),
                    "y": pa.array([5, 5, 9, 1, 0], pa.int64())})
    out = _collect(skyline(rd.from_arrow(tab), minimize=["x"],
                           maximize=["y"], chunk=2))
    assert sorted(out["id"].to_pylist()) == [1, 2, 3, 5]
    with pytest.raises(ValueError):
        skyline(rd.from_arrow(tab))


def test_skyline_three_dims_and_nulls(ray_session):
    from rayskema.pipelines.relational import skyline
    rng = np.random.default_rng(9)
    m = 200
    a = rng.integers(0, 8, m).astype(np.int64)
    b = rng.integers(0, 8, m).astype(np.int64)
    c = rng.integers(0, 8, m).astype(np.int64)
    tab = pa.table({"id": pa.array(np.arange(m)), "a": pa.array(a),
                    "b": pa.array(b), "c": pa.array(c)})
    out = _collect(skyline(rd.from_arrow(tab).repartition(3),
                           minimize=["a", "b"], maximize=["c"]))
    keep = [i for i in range(m)
            if not ((a <= a[i]) & (b <= b[i]) & (c >= c[i]) &
                    ((a < a[i]) | (b < b[i]) | (c > c[i]))).any()]
    assert sorted(out["id"].to_pylist()) == keep
    bad = pa.table({"x": pa.array([1.0, float("nan")]),
                    "y": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception):
        _collect(skyline(rd.from_arrow(bad), minimize=["x", "y"]))


def test_group_transitions(ray_session):
    from rayskema.pipelines.relational import group_transitions
    tab = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "o": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
        "v": ["a", "b", "a", "b", "a", "a"]})
    out = _collect(group_transitions(
        rd.from_arrow(tab).repartition(4), "g", ["o"], "v",
        buckets=2)).to_pydict()
    got = {(f, t): n for f, t, n in
           zip(out["from_v"], out["to_v"], out["n"])}
    # g1: a->b, b->a; g2: b->a; g3: no pairs
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_group_transitions_null_state(ray_session):
    from rayskema.pipelines.relational import group_transitions
    tab = pa.table({
        "g": pa.array([1, 1, 1], pa.int64()),
        "o": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array(["a", None, "a"], pa.string())})
    out = _collect(group_transitions(rd.from_arrow(tab), "g", ["o"],
                                     "v", buckets=1)).to_pydict()
    got = {(f, t): n for f, t, n in
           zip(out["from_v"], out["to_v"], out["n"])}
    assert got == {("a", None): 1, (None, "a"): 1}


def test_morton_interleave_reference():
    from rayskema.functions.layout import morton_interleave

    def ref(x, y, bits):
        k = 0
        for i in range(bits):
            k |= ((x >> i) & 1) << (2 * i + 1)
            k |= ((y >> i) & 1) << (2 * i)
        return k

    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, 100)
    y = rng.integers(0, 256, 100)
    got = morton_interleave([x, y], 8)
    assert got.tolist() == [ref(int(a), int(b), 8)
                            for a, b in zip(x, y)]
    # key is monotone in each dim with the other held fixed
    assert morton_interleave([np.array([3]), np.array([7])], 4)[0] < \
        morton_interleave([np.array([3]), np.array([8])], 4)[0]
    with pytest.raises(ValueError):
        morton_interleave([x], 8)
    with pytest.raises(ValueError):
        morton_interleave([x, np.array([-1] * 100)], 8)
    with pytest.raises(ValueError):
        morton_interleave([x, y, x, y], 16)  # 64 bits > int64


def test_zorder_sort_clusters(ray_session):
    from rayskema.functions.layout import zorder_sort
    rng = np.random.default_rng(2)
    n = 4000
    tab = pa.table({"x": pa.array(rng.integers(0, 1024, n).astype(np.int64)),
                    "y": pa.array(rng.integers(0, 1024, n).astype(np.int64))})
    out = zorder_sort(rd.from_arrow(tab).repartition(8), ["x", "y"],
                      bits=10).materialize()
    import ray as _ray
    blocks = [b for b in _ray.get(out.to_arrow_refs()) if b.num_rows]
    # sorted: block key ranges are non-overlapping and ordered
    los = [b["zkey"][0].as_py() for b in blocks]
    his = [b["zkey"][-1].as_py() for b in blocks]
    order = np.argsort(los)
    for i, j in zip(order, order[1:]):
        assert his[i] <= los[j]
    # the clustering property, checked on FIXED row-position chunks of
    # the sorted stream (Ray's block layout varies with CPU count): a
    # contiguous 1/16 segment of the Morton curve has per-dim spreads
    # whose product stays far below the global 1024x1024 envelope
    whole = pa.concat_tables(b for b in blocks)
    whole = whole.take(pa.array(np.argsort(
        whole["zkey"].to_numpy(zero_copy_only=False), kind="stable")))
    step = whole.num_rows // 16
    prods = []
    for lo in range(0, step * 16, step):
        ch = whole.slice(lo, step)
        xs = ch["x"].to_numpy(zero_copy_only=False)
        ys = ch["y"].to_numpy(zero_copy_only=False)
        prods.append((xs.max() - xs.min()) * (ys.max() - ys.min()))
    # a few chunks may straddle a quadrant boundary (wide envelope);
    # the MEAN stays far below the ~1024^2 a random split would give
    assert np.mean(prods) < 1024 * 1024 / 2


def test_group_weighted_median(ray_session):
    from rayskema.pipelines.relational import group_weighted_median
    rng = np.random.default_rng(4)
    g = rng.integers(0, 5, 300).astype(np.int64)
    v = rng.integers(0, 50, 300).astype(np.int64)
    w = rng.integers(0, 9, 300).astype(np.int64)   # includes zeros
    tab = pa.table({"g": pa.array(g), "v": pa.array(v),
                    "w": pa.array(w)})
    out = _collect(group_weighted_median(
        rd.from_arrow(tab).repartition(6), ["g"], "v", "w",
        buckets=3)).to_pydict()
    got = dict(zip(out["g"], out["wmedian"]))
    for gr in np.unique(g):
        vv, ww = v[g == gr], w[g == gr]
        order = np.argsort(vv, kind="stable")
        cw = np.cumsum(ww[order])
        exp = int(vv[order][np.flatnonzero(2 * cw >= cw[-1])[0]])
        assert got[int(gr)] == exp, gr


def test_group_weighted_median_edges(ray_session):
    from rayskema.pipelines.relational import group_weighted_median
    tab = pa.table({
        "g": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "v": pa.array([10, 20, 7, 1, 2], pa.int64()),
        "w": pa.array([1, 1, 5, 0, 0], pa.int64())})
    out = _collect(group_weighted_median(
        rd.from_arrow(tab), ["g"], "v", "w", buckets=2)).to_pydict()
    got = dict(zip(out["g"], out["wmedian"]))
    # even total: LOWER middle; zero-weight group: NULL
    assert got == {1: 10, 2: 7, 3: None}
    bad = pa.table({"g": [1], "v": [1], "w": [1.5]})
    with pytest.raises(Exception):
        _collect(group_weighted_median(rd.from_arrow(bad), ["g"],
                                       "v", "w"))


def test_merge_views(ray_session):
    from rayskema.pipelines.relational import group_agg, merge_views
    rng = np.random.default_rng(6)
    k = rng.integers(0, 7, 400).astype(np.int64)
    v = rng.integers(1, 100, 400).astype(np.int64)
    tab = pa.table({"k": pa.array(k), "v": pa.array(v)})
    cut = k % 3 == 0                        # "late" slice
    base = rd.from_arrow(tab.filter(pa.array(~cut))).repartition(4)
    late = rd.from_arrow(tab.filter(pa.array(cut))).repartition(2)
    spec = [("v", "sum", "s"), ("v", "count_all", "n"),
            ("v", "max", "mx")]
    merged = _collect(merge_views(
        group_agg(base, ["k"], spec, buckets=2),
        group_agg(late, ["k"], spec, buckets=2),
        ["k"], [("s", "sum"), ("n", "sum"), ("mx", "max")],
        buckets=2)).sort_by("k").to_pydict()
    full = _collect(group_agg(rd.from_arrow(tab), ["k"], spec,
                              buckets=2)).sort_by("k").to_pydict()
    assert merged == full
    with pytest.raises(ValueError):
        merge_views(base, late, ["k"], [("v", "mean")])


def test_merge_views_disjoint_keys(ray_session):
    from rayskema.pipelines.relational import merge_views
    view = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "s": pa.array([5], pa.int64())}))
    delta = rd.from_arrow(pa.table({"k": pa.array([2], pa.int64()),
                                    "s": pa.array([7], pa.int64())}))
    out = _collect(merge_views(view, delta, ["k"], [("s", "sum")],
                               buckets=1)).sort_by("k").to_pydict()
    assert out == {"k": [1, 2], "s": [5, 7]}


def test_apply_cdc(ray_session):
    from rayskema.pipelines.relational import apply_cdc
    tab = pa.table({
        "k1": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "k2": ["a", "a", "a", "a", "b", "a", "a"],
        "seq": pa.array([1, 3, 2, 1, 1, 2, 1], pa.int64()),
        "op": ["upsert", "upsert", "delete",
               "delete", "upsert", "delete", "upsert"],
        "payload": pa.array([10, 30, 20, 40, 50, 60, 70], pa.int64())})
    out = _collect(apply_cdc(rd.from_arrow(tab).repartition(4),
                             ["k1", "k2"], ["seq"], "op",
                             buckets=2)).sort_by("payload").to_pydict()
    # (1,a): seq3 upsert wins; (2,a): delete wins -> gone;
    # (2,b): upsert stays; (3,a): seq2 delete wins -> gone
    assert out["payload"] == [30, 50]
    assert "op" not in out


def test_apply_cdc_null_op_and_empty(ray_session):
    from rayskema.pipelines.relational import apply_cdc
    tab = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "seq": pa.array([1, 1], pa.int64()),
        "op": pa.array([None, "delete"], pa.string()),
        "v": pa.array([5, 6], pa.int64())})
    out = _collect(apply_cdc(rd.from_arrow(tab), ["k"], ["seq"],
                             "op", buckets=1)).to_pydict()
    assert out["v"] == [5]          # NULL op is not a tombstone


def test_build_vocab(ray_session):
    from rayskema.functions.textstats import build_vocab
    docs = ["b b b a a c", "a b", "d", "a b c"]
    tab = pa.table({"text": pa.array(docs)})
    out = _collect(build_vocab(rd.from_arrow(tab).repartition(3),
                               "text", min_count=2,
                               buckets=2)).sort_by("id").to_pydict()
    # counts: b=5 a=4 c=2 d=1; d falls below min_count
    assert out["token"] == ["b", "a", "c"]
    assert out["n"] == [5, 4, 2]
    assert out["id"] == [0, 1, 2]
    # tie-break: equal counts order by token ascending
    tab2 = pa.table({"text": pa.array(["z y", "z y"])})
    out2 = _collect(build_vocab(rd.from_arrow(tab2), "text",
                                min_count=2)).sort_by("id").to_pydict()
    assert out2["token"] == ["y", "z"]


def test_encode_with_vocab(ray_session):
    from rayskema.functions.textstats import build_vocab, \
        encode_with_vocab
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a zz", "b b", "   "])})
    ds = rd.from_arrow(docs).repartition(2)
    vocab = build_vocab(ds, "text", min_count=2)   # a:2->id1, b:3->id0
    out = _collect(encode_with_vocab(ds, "doc_id", "text",
                                     vocab)).sort_by("doc_id")
    o = out.to_pydict()
    # doc1: tokens a,b,a,zz -> ids 1,0,1,OOV
    assert o["n_tok"] == [4, 2, 0]
    assert o["n_oov"] == [1, 0, 0]
    assert o["sum_id"] == [2, 0, 0]
    assert o["sum_id2"] == [2, 0, 0]


def test_topn_other(ray_session):
    from rayskema.pipelines.relational import topn_other
    keys = ["a"] * 5 + ["b"] * 4 + ["c"] * 3 + ["d"] * 2 + ["e"]
    tab = pa.table({"k": pa.array(keys),
                    "v": pa.array([10] * len(keys), pa.int64())})
    out = _collect(topn_other(rd.from_arrow(tab).repartition(4),
                              "k", "v", n=2,
                              buckets=2)).sort_by("k").to_pydict()
    assert dict(zip(out["k"], out["v"])) == \
        {"a": 50, "b": 40, "__other__": 60}
    # n >= cardinality: no other row
    out2 = _collect(topn_other(rd.from_arrow(tab), "k", "v", n=9,
                               buckets=2)).to_pydict()
    assert "__other__" not in out2["k"] and len(out2["k"]) == 5


def test_topn_other_tie_break(ray_session):
    from rayskema.pipelines.relational import topn_other
    tab = pa.table({"k": pa.array(["x", "y", "z"]),
                    "v": pa.array([5, 5, 5], pa.int64())})
    out = _collect(topn_other(rd.from_arrow(tab), "k", "v", n=2,
                              buckets=3)).sort_by("k").to_pydict()
    # ties broken by key ascending: x,y kept; z -> other
    assert dict(zip(out["k"], out["v"])) == \
        {"x": 5, "y": 5, "__other__": 5}


def test_fd_check(ray_session):
    from rayskema.functions.profile import fd_check
    tab = pa.table({
        "det": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "dep": ["a", "a", "b", "c", "c", "d"]})
    out = fd_check(rd.from_arrow(tab).repartition(3), ["det"], "dep",
                   buckets=2).to_pydict()
    # det=1 has two deps (violation); 2 and 3 hold
    assert out["n_groups"] == [3]
    assert out["n_violating"] == [1]
    assert out["max_distinct"] == [2]
    # FD that holds
    ok = fd_check(rd.from_arrow(pa.table({
        "det": pa.array([1, 1, 2], pa.int64()),
        "dep": ["x", "x", "y"]})), ["det"], "dep",
        buckets=1).to_pydict()
    assert ok["n_violating"] == [0]


def test_key_skew_stats(ray_session):
    from rayskema.functions.profile import key_skew_stats
    # keys: a x6, b x3, c x1  -> sorted counts [1,3,6]
    keys = ["a"] * 6 + ["b"] * 3 + ["c"]
    tab = pa.table({"k": pa.array(keys)})
    out = key_skew_stats(rd.from_arrow(tab).repartition(4), ["k"],
                         buckets=2).to_pydict()
    n, sx = 3, 10
    six = 1 * 1 + 2 * 3 + 3 * 6            # ranks ascending
    gini = ((2 * six - (n + 1) * sx) * 1_000_000) // (n * sx)
    assert out["n_keys"] == [3]
    assert out["n_rows"] == [10]
    assert out["max_key_rows"] == [6]
    assert out["top1_share_ppm"] == [600_000]
    assert out["gini_ppm"] == [gini]


def test_key_skew_stats_uniform(ray_session):
    from rayskema.functions.profile import key_skew_stats
    tab = pa.table({"k": pa.array(list("abcd") * 5)})
    out = key_skew_stats(rd.from_arrow(tab), ["k"],
                         buckets=2).to_pydict()
    assert out["gini_ppm"] == [0]           # perfectly even keys
    assert out["top1_share_ppm"] == [250_000]


def test_late_arrivals(ray_session):
    from rayskema.pipelines.relational import late_arrivals
    # arrival order 1..6; event times (us): 100, 50, 90, 200, 10, 210
    tab = pa.table({
        "seq": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([100, 50, 90, 200, 10, 210],
                       pa.timestamp("us")),
        "g": ["a", "a", "b", "a", "b", "a"]})
    out = late_arrivals(rd.from_arrow(tab).repartition(3), "seq",
                        "ts", "g", lateness_us=30)
    got = {r["g"]: (r["n_events"], r["n_late"])
           for r in out.to_pylist()}
    # hwm before each: -,100,100,100,200,200 ; late if ts+30 < hwm:
    # 50+30<100 late(a), 90+30>=100 ok, 10+30<200 late(b)
    assert got == {"a": (4, 1), "b": (2, 1)}


def test_late_arrivals_first_never_late(ray_session):
    from rayskema.pipelines.relational import late_arrivals
    tab = pa.table({"seq": pa.array([1], pa.int64()),
                    "ts": pa.array([5], pa.timestamp("us")),
                    "g": ["x"]})
    out = late_arrivals(rd.from_arrow(tab), "seq", "ts", "g",
                        lateness_us=0).to_pydict()
    assert out["n_late"] == [0]


def test_table_checksum(ray_session):
    import hashlib
    import struct
    from rayskema.functions.profile import table_checksum
    tab = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                    "b": ["x", "y", "z"]})
    out = table_checksum(rd.from_arrow(tab).repartition(3),
                         ["a", "b"]).to_pydict()
    exp = sum(struct.unpack(
        "<Q", hashlib.md5(f"{i}|{s}".encode()).digest()[8:16])[0]
        for i, s in [(1, "x"), (2, "y"), (3, "z")]) % (1 << 61)
    assert out == {"n_rows": [3], "checksum": [exp]}
    # order/partitioning invariance
    perm = tab.take(pa.array([2, 0, 1]))
    out2 = table_checksum(rd.from_arrow(perm).repartition(2),
                          ["a", "b"]).to_pydict()
    assert out2 == out
    # sensitivity: one changed cell changes the sum
    tweaked = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                        "b": ["x", "y", "w"]})
    assert table_checksum(rd.from_arrow(tweaked), ["a", "b"]) \
        .to_pydict() != out


def test_group_rolling_time_centered(ray_session):
    from rayskema.pipelines.relational import group_rolling_time
    tab = pa.table({
        "g": ["a"] * 5,
        "ts": pa.array([0, 10, 20, 30, 100], pa.timestamp("us")),
        "v": pa.array([1, 2, 4, 8, 16], pa.int64())})
    out = _collect(group_rolling_time(
        rd.from_arrow(tab), "g", "ts", "v", width=10, following=10,
        buckets=1)).sort_by("ts").to_pydict()
    # +-10us inclusive frames: [1+2, 1+2+4, 2+4+8, 4+8, 16]
    assert out["w_sum"] == [3, 7, 14, 12, 16]
    assert out["w_n"] == [2, 3, 3, 2, 1]
    with pytest.raises(ValueError):
        group_rolling_time(rd.from_arrow(tab), "g", "ts", "v",
                           width=10, following=-1)


def test_pca_fit_project(ray_session):
    from rayskema.functions.similarity import (_matrix, pca_fit,
                                               pca_project)
    rng = np.random.default_rng(8)
    # anisotropic 6-d cloud: variance concentrated on two axes
    base = rng.normal(size=(400, 6)) * np.array([5, 3, 1, 1, .5, .1])
    mix = rng.normal(size=(6, 6))
    m = base @ mix + rng.normal(size=6) * 10
    tab = pa.table({
        "id": pa.array(np.arange(400), pa.int64()),
        "v": pa.array([r.astype(np.float32) for r in m],
                      pa.list_(pa.float32()))})
    ds = rd.from_arrow(tab).repartition(5)
    mean, comps, ratio = pca_fit(ds, "v", k=3)
    m64 = _matrix(tab["v"])
    assert np.allclose(mean, m64.mean(axis=0), rtol=1e-9)
    cov = np.cov(m64, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(ratio, evals[:3] / evals.sum(), rtol=1e-8)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # deterministic across a different partitioning (summation order
    # differs only at float roundoff; sign convention pins the rest)
    _, comps2, _ = pca_fit(rd.from_arrow(tab).repartition(2), "v", k=3)
    assert np.allclose(comps, comps2, atol=1e-9)
    # projection variance along axis i equals eigenvalue i
    p = _matrix(pa.concat_tables([t for t in __import__("ray").get(
        pca_project(ds, "v", "id", mean, comps).to_arrow_refs())
        if t.num_rows])["pc"])
    assert np.allclose(np.sort(p.var(axis=0, ddof=1))[::-1],
                       evals[:3], rtol=1e-8)


def test_group_cusum(ray_session):
    from rayskema.pipelines.relational import group_cusum
    tab = pa.table({
        "g": ["a"] * 6 + ["b"] * 2,
        "o": pa.array([1, 2, 3, 4, 5, 6, 1, 2], pa.int64()),
        "v": pa.array([3, 1, 9, 9, 0, 2, 7, 0], pa.int64())})
    out = _collect(group_cusum(rd.from_arrow(tab).repartition(3),
                               "g", ["o"], "v", drift=4, threshold=5,
                               buckets=2)).sort_by([("g", "ascending"),
                                                    ("o", "ascending")])
    o = out.to_pydict()
    # reference recurrence S = max(0, S + v - 4)
    ref = []
    for grp in ("a", "b"):
        s = 0
        for v in [r for g, r in zip(tab["g"].to_pylist(),
                                    tab["v"].to_pylist()) if g == grp]:
            s = max(0, s + v - 4)
            ref.append(s)
    assert o["cusum"] == ref
    assert o["alarm"] == [s > 5 for s in ref]
    bad = pa.table({"g": ["x"], "o": pa.array([1], pa.int64()),
                    "v": pa.array([1.5])})
    with pytest.raises(Exception):
        _collect(group_cusum(rd.from_arrow(bad), "g", ["o"], "v",
                             drift=0, threshold=1))


def test_ab_ztest_exact(ray_session):
    import math
    from rayskema.functions.drift import ab_ztest_exact
    rng = np.random.default_rng(12)
    v = rng.integers(0, 2, 2000).astype(np.int64)
    c = ((rng.random(2000) < np.where(v == 1, 0.30, 0.22))
         .astype(np.int64))
    tab = pa.table({"v": pa.array(v), "c": pa.array(c)})
    out = ab_ztest_exact(rd.from_arrow(tab).repartition(5), "v",
                         "c").to_pydict()
    n_a, n_b = out["n_a"][0], out["n_b"][0]
    c_a, c_b = out["conv_a"][0], out["conv_b"][0]
    assert n_a + n_b == 2000 and c_a + c_b == int(c.sum())
    # float reference z²
    p1, p2 = c_a / n_a, c_b / n_b
    p = (c_a + c_b) / 2000
    z2 = (p1 - p2) ** 2 / (p * (1 - p) * (1 / n_a + 1 / n_b))
    assert math.isclose(out["z2_ppm"][0] / 1e6, z2, rel_tol=1e-4)


def test_ab_ztest_degenerate(ray_session):
    from rayskema.functions.drift import ab_ztest_exact
    tab = pa.table({"v": pa.array([0, 0], pa.int64()),
                    "c": pa.array([1, 0], pa.int64())})
    out = ab_ztest_exact(rd.from_arrow(tab), "v", "c").to_pydict()
    assert out["z2_ppm"] == [None]          # arm B empty


def test_group_rolling_ols(ray_session):
    from rayskema.pipelines.relational import group_rolling_ols
    rng = np.random.default_rng(13)
    g = np.repeat([1, 2], 50)
    o = np.tile(np.arange(50), 2).astype(np.int64)
    x = rng.integers(0, 100, 100).astype(np.int64)
    y = rng.integers(0, 100, 100).astype(np.int64)
    tab = pa.table({"g": pa.array(g), "o": pa.array(o),
                    "x": pa.array(x), "y": pa.array(y)})
    out = _collect(group_rolling_ols(
        rd.from_arrow(tab).repartition(4), "g", ["o"], "x", "y",
        window=7, buckets=2)).sort_by([("g", "ascending"),
                                       ("o", "ascending")]).to_pydict()
    for i, (gr, oo) in enumerate(zip(out["g"], out["o"])):
        sel = (g == gr) & (o <= oo) & (o > oo - 7)
        xs, ys = x[sel], y[sel]
        nn = len(xs)
        num = nn * (xs * ys).sum() - xs.sum() * ys.sum()
        den = nn * (xs * xs).sum() - xs.sum() ** 2
        assert out["ols_num"][i] == num
        assert out["ols_den"][i] == den
    # den=0 on a 1-row frame
    one = pa.table({"g": [1], "o": pa.array([0], pa.int64()),
                    "x": pa.array([5], pa.int64()),
                    "y": pa.array([9], pa.int64())})
    od = _collect(group_rolling_ols(rd.from_arrow(one), "g", ["o"],
                                    "x", "y", window=3)).to_pydict()
    assert od["ols_den"] == [0]


def test_line_dedup(ray_session):
    from rayskema.functions.dedup import line_dedup
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha\nbeta\ngamma",
                          "beta\ndelta",          # beta seen in doc 1
                          "alpha\nbeta"])})       # fully duplicated
    out = _collect(line_dedup(rd.from_arrow(docs).repartition(2),
                              "doc_id", "text",
                              buckets=2)).sort_by("doc_id")
    o = dict(zip(out["doc_id"].to_pylist(),
                 out["text_deduped"].to_pylist()))
    # doc 3 vanishes: every line already seen earlier
    assert o == {1: "alpha\nbeta\ngamma", 2: "delta"}


def test_line_dedup_position_tiebreak(ray_session):
    from rayskema.functions.dedup import line_dedup
    docs = pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["x\nx\ny"])})   # same line twice in one doc
    out = _collect(line_dedup(rd.from_arrow(docs), "doc_id", "text",
                              buckets=1)).to_pydict()
    assert out["text_deduped"] == ["x\ny"]   # first position wins


def test_late_arrivals_null_ts_dropped(ray_session):
    from rayskema.pipelines.relational import late_arrivals
    # a null ts must not poison the running max for later rows
    tab = pa.table({
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([100, None, 50, 40], pa.timestamp("us")),
        "g": ["a", "a", "a", "a"]})
    out = late_arrivals(rd.from_arrow(tab), "seq", "ts", "g",
                        lateness_us=10).to_pydict()
    # rows 50 and 40 are late vs hwm 100; the null row is dropped
    assert out["n_events"] == [3]
    assert out["n_late"] == [2]


def test_skyline_unsigned_maximize(ray_session):
    from rayskema.pipelines.relational import skyline
    tab = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "x": pa.array([1, 1], pa.int64()),
                    "y": pa.array([0, 250], pa.uint8())})
    out = _collect(skyline(rd.from_arrow(tab), minimize=["x"],
                           maximize=["y"])).to_pydict()
    assert out["id"] == [2]       # 250 dominates 0, no unsigned wrap


def test_line_dedup_reserved_id_col(ray_session):
    from rayskema.functions.dedup import line_dedup
    docs = pa.table({"__pos": pa.array([1], pa.int64()),
                     "text": ["a"]})
    with pytest.raises(ValueError):
        line_dedup(rd.from_arrow(docs), "__pos", "text")


def test_pca_fit_k_validation(ray_session):
    from rayskema.functions.similarity import pca_fit
    tab = pa.table({"v": pa.array([[1.0, 2.0], [3.0, 4.0],
                                   [5.0, 7.0]],
                                  pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        pca_fit(rd.from_arrow(tab), "v", k=5)
    with pytest.raises(ValueError):
        pca_fit(rd.from_arrow(tab), "v", k=0)


def test_pareto_cut(ray_session):
    from rayskema.pipelines.relational import pareto_cut
    # totals: a=50 b=30 c=15 d=5 (T=100); 80% cut keeps a,b (cum 80)
    rows = [("a", 50), ("b", 30), ("c", 15), ("d", 5)]
    keys = [k for k, n in rows for _ in range(n)]
    tab = pa.table({"k": pa.array(keys),
                    "v": pa.array([1] * len(keys), pa.int64())})
    out = _collect(pareto_cut(rd.from_arrow(tab).repartition(5),
                              ["k"], "v", numer=8, denom=10,
                              buckets=2)).sort_by("cum").to_pydict()
    assert out["k"] == ["a", "b"]
    assert out["v"] == [50, 30]
    assert out["cum"] == [50, 80]
    # the crossing row is INCLUDED: 81% needs c too
    out2 = _collect(pareto_cut(rd.from_arrow(tab), ["k"], "v",
                               numer=81, denom=100,
                               buckets=2)).sort_by("cum").to_pydict()
    assert out2["k"] == ["a", "b", "c"]
    # numer == denom keeps everything
    out3 = _collect(pareto_cut(rd.from_arrow(tab), ["k"], "v",
                               numer=1, denom=1)).to_pydict()
    assert sorted(out3["k"]) == ["a", "b", "c", "d"]
    with pytest.raises(ValueError):
        pareto_cut(rd.from_arrow(tab), ["k"], "v", numer=0, denom=1)


def test_group_islands(ray_session):
    from rayskema.pipelines.relational import group_islands
    tab = pa.table({
        "g": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([3, 4, 4, 7, 8, 10, 13], pa.int64())})
    out = _collect(group_islands(rd.from_arrow(tab).repartition(3),
                                 "g", "v", max_gap=1, buckets=2)) \
        .sort_by([("g", "ascending"), ("island_start", "ascending")])
    o = out.to_pydict()
    # g1: [3,4] and [7,8] (dup 4 collapses); g2: [10], [13]
    assert o["g"] == [1, 1, 2, 2]
    assert o["island_start"] == [3, 7, 10, 13]
    assert o["island_end"] == [4, 8, 10, 13]
    assert o["n_values"] == [2, 2, 1, 1]
    # a wider gap tolerance merges islands
    o2 = _collect(group_islands(rd.from_arrow(tab), "g", "v",
                                max_gap=3, buckets=1)) \
        .sort_by([("g", "ascending"),
                  ("island_start", "ascending")]).to_pydict()
    assert o2["g"] == [1, 2]
    assert o2["n_values"] == [4, 2]


def test_broadcast_join_right_side_with_stale_empty_blocks(ray_session):
    from rayskema.pipelines.relational import hash_join
    # Ray's Project can pass ZERO-ROW blocks through select_columns
    # UN-projected, so the right side's dataset-level schema lies; the
    # join must trust a non-empty block instead (regression for the
    # parts_q2_shape KeyError)
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": ["a", "b", "c"]}))
    wide = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "keep": pa.array([10, 20, 0, 0], pa.int64()),
        "extra": ["x", "y", "z", "w"]})
    import pyarrow.compute as _pc
    right = rd.from_arrow(wide).repartition(4).map_batches(
        lambda t: t.filter(_pc.greater(t["keep"], 0)),
        batch_format="pyarrow").select_columns(["k", "keep"])
    out = _collect(hash_join(left, right, on="k",
                             broadcast=True)).sort_by("k").to_pydict()
    assert out["k"] == [1, 2]
    assert out["keep"] == [10, 20]
    assert "extra" not in out


def test_token_cooccurrence(ray_session):
    from rayskema.functions.textstats import token_cooccurrence
    docs = pa.table({"text": pa.array([
        "a b a rare b", "b a", "a a"])})
    # counts: a=5 b=3 rare=1 -> vocab [a:0, b:1]; rare is OOV but
    # holds its position (a..b at distance 2 through it)
    out = _collect(token_cooccurrence(
        rd.from_arrow(docs).repartition(2), "text", window=2,
        vocab_size=2, min_count=2, buckets=2)).to_pydict()
    got = {(a, b): n for a, b, n in
           zip(out["tok_a"], out["tok_b"], out["n_pair"])}
    # doc1 pairs (w<=2): (a,b)d1,(b,a)d1,(a,rare)skip,(rare,b)skip,
    #   (a,a)d2,(b,rare)skip,(a,b via rare)d2 -> a-b x3, a-a x1
    # doc2: (b,a) -> a-b; doc3: (a,a)
    assert got == {("a", "b"): 4, ("a", "a"): 2}


def test_bpe_pair_counts(ray_session):
    from collections import Counter
    from rayskema.functions.textstats import bpe_pair_counts
    docs = ["abab cd", "abc  x", "a"]
    tab = pa.table({"text": pa.array(docs)})
    out = _collect(bpe_pair_counts(rd.from_arrow(tab).repartition(2),
                                   "text", k=3)).to_pydict()
    ref = Counter()
    for d in docs:
        for w in d.split():
            for i in range(len(w) - 1):
                ref[w[i:i + 2]] += 1
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(out["pair"], out["n"])) == exp


def test_cross_join(ray_session):
    from rayskema.pipelines.relational import cross_join
    left = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3], pa.int64()), "x": ["p", "q", "r"]}))
    right = rd.from_arrow(pa.table({
        "b": pa.array([10, 20], pa.int64()),
        "x": ["s", "t"]}))                      # name collision
    out = _collect(cross_join(left.repartition(2), right)) \
        .sort_by([("a", "ascending"), ("b", "ascending")]).to_pydict()
    assert len(out["a"]) == 6
    assert out["a"] == [1, 1, 2, 2, 3, 3]
    assert out["b"] == [10, 20, 10, 20, 10, 20]
    assert out["x"] == ["p", "p", "q", "q", "r", "r"]
    assert out["x_r"] == ["s", "t", "s", "t", "s", "t"]
    with pytest.raises(ValueError):
        cross_join(left, right, max_right_rows=1)


def test_pivot_sum(ray_session):
    from rayskema.pipelines.relational import pivot_sum
    tab = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, None], pa.int64()),
        "c": pa.array(["x", "y", "z", "x", None, "x"], pa.string()),
        "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64())})
    out = _collect(pivot_sum(rd.from_arrow(tab).repartition(3),
                             "g", "c", "v", ["x", "y"],
                             buckets=2)).to_pydict()
    got = {g: (a, b, o) for g, a, b, o in
           zip(out["g"], out["s_x"], out["s_y"], out["s_other"])}
    # z and null categories fold into other; null group is a group
    assert got == {1: (10, 20, 30), 2: (40, 0, 50),
                   None: (60, 0, 0)}
    with pytest.raises(Exception):
        _collect(pivot_sum(rd.from_arrow(pa.table({
            "g": [1], "c": ["x"], "v": [1.5]})), "g", "c", "v",
            ["x"]))


def test_group_time_weighted(ray_session):
    """Exact TWAP terms: segment products, duration, tie ordering via
    the tiebreak column, null ts/value exclusion, <2-row groups
    dropped."""
    from rayskema.pipelines.relational import group_time_weighted
    ts = pa.array([0, 10, 30, 0, 5, None, 100],
                  type=pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "ts": ts,
        "v": pa.array([5, 7, 9, 2, None, 4, 1], pa.int64())}))
    out = _collect(group_time_weighted(
        ds, "g", "ts", "v", tiebreak_cols=["id"], buckets=4)) \
        .sort_by("g")
    # g=1: 5*10 + 7*20 = 190, dur 30, 2 segs
    # g=2: null ts row and null v row excluded -> only ts=0 left -> dropped
    # g=3: single row -> dropped
    assert out["g"].to_pylist() == [1]
    assert out["twap_num"].to_pylist() == [190]
    assert out["dur_us"].to_pylist() == [30]
    assert out["n_seg"].to_pylist() == [2]


def test_group_time_weighted_tie_order(ray_session):
    """Timestamp ties resolve by the tiebreak column: the tied pair
    contributes a 0-length segment regardless of input order."""
    from rayskema.pipelines.relational import group_time_weighted
    tab = pa.table({
        "g": pa.array([1, 1, 1], pa.int64()),
        "id": pa.array([2, 1, 3], pa.int64()),
        "ts": pa.array([5, 5, 8], type=pa.timestamp("us")),
        "v": pa.array([100, 3, 9], pa.int64())})
    out = _collect(group_time_weighted(
        rd.from_arrow(tab), "g", "ts", "v", tiebreak_cols=["id"],
        buckets=2))
    # order by (ts, id): (5,id1,v3) (5,id2,v100) (8,id3): 3*0 + 100*3
    assert out["twap_num"].to_pylist() == [300]
    assert out["n_seg"].to_pylist() == [2]


def test_interval_overlap_join(ray_session):
    """Closed-interval overlap semantics within a key: touching
    endpoints match, disjoint don't, keys never cross, null bounds
    and null keys drop."""
    from rayskema.pipelines.relational import interval_overlap_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, None], pa.int64()),
        "lid": pa.array([10, 11, 12, 13], pa.int64()),
        "ls": pa.array([0, 100, 0, 0], type=pa.timestamp("us")),
        "le": pa.array([10, 200, 50, 50], type=pa.timestamp("us"))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "rid": pa.array([20, 21, 22, 23], pa.int64()),
        "rs": pa.array([10, 50, 60, None], type=pa.timestamp("us")),
        "re": pa.array([30, 99, 70, 80], type=pa.timestamp("us"))}))
    out = _collect(interval_overlap_join(
        left, right, key="k", l_start="ls", l_end="le",
        r_start="rs", r_end="re", l_cols=["lid"], r_cols=["rid"],
        buckets=4))
    pairs = sorted(zip(out["lid"].to_pylist(), out["rid"].to_pylist()))
    # lid10 [0,10] touches rid20 [10,30]; lid11 [100,200] misses both
    # (rid21 ends 99); k=2: lid12 [0,50] misses rid22 [60,70]; null
    # bound rid23 and null-key lid13 drop
    assert pairs == [(10, 20)]


def test_interval_overlap_join_dense(ray_session):
    """Cross-check against a brute-force O(n²) reference on a dense
    random-ish grid (deterministic arithmetic fixture)."""
    from rayskema.pipelines.relational import interval_overlap_join
    n = 120
    ks = [(i * 7) % 5 for i in range(n)]
    ss = [(i * 37) % 400 for i in range(n)]
    ls = [(i * 13) % 60 + 1 for i in range(n)]
    left = pa.table({
        "k": pa.array(ks, pa.int64()),
        "lid": pa.array(range(n), pa.int64()),
        "ls": pa.array(ss, type=pa.timestamp("us")),
        "le": pa.array([s + d for s, d in zip(ss, ls)],
                       type=pa.timestamp("us"))})
    ks2 = [(i * 11) % 5 for i in range(n)]
    ss2 = [(i * 53) % 400 for i in range(n)]
    ls2 = [(i * 17) % 80 + 1 for i in range(n)]
    right = pa.table({
        "k": pa.array(ks2, pa.int64()),
        "rid": pa.array(range(1000, 1000 + n), pa.int64()),
        "rs": pa.array(ss2, type=pa.timestamp("us")),
        "re": pa.array([s + d for s, d in zip(ss2, ls2)],
                       type=pa.timestamp("us"))})
    le_i = [s + d for s, d in zip(ss, ls)]
    re_i = [s + d for s, d in zip(ss2, ls2)]
    expect = sorted(
        (li, 1000 + ri)
        for li in range(n) for ri in range(n)
        if ks[li] == ks2[ri] and ss[li] <= re_i[ri]
        and ss2[ri] <= le_i[li])
    out = _collect(interval_overlap_join(
        rd.from_arrow(left).repartition(3),
        rd.from_arrow(right).repartition(2),
        key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
        l_cols=["lid"], r_cols=["rid"], buckets=4))
    got = sorted(zip(out["lid"].to_pylist(), out["rid"].to_pylist()))
    assert got == expect


def test_first_digit_profile(ray_session):
    """Digit extraction is string-exact (powers of ten stay digit 1),
    zero/negative/null excluded, bp floor-scaled."""
    from rayskema.functions.profile import first_digit_profile
    vals = [1000, 1, 19, 999, 2, 20, 0, -5, None, 3]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})) \
        .repartition(3)
    out = _collect(first_digit_profile(ds, "x")).sort_by("digit")
    assert out["digit"].to_pylist() == [1, 2, 3, 9]
    # 1000, 1, 19 -> 1; 2, 20 -> 2; 3 -> 3; 999 -> 9; total 7
    assert out["n"].to_pylist() == [3, 2, 1, 1]
    assert out["bp"].to_pylist() == [30000 // 7, 20000 // 7,
                                     10000 // 7, 10000 // 7]


def test_first_digit_profile_null_only_block(ray_session):
    """A block whose only invalid values are NULLS must not emit a
    null-digit group (the x>0 mask is null there; fill_null(False))."""
    from rayskema.functions.profile import first_digit_profile
    ds = rd.from_arrow(pa.table(
        {"x": pa.array([5, None, 42, None], pa.int64())}))
    out = _collect(first_digit_profile(ds, "x")).sort_by("digit")
    assert out["digit"].to_pylist() == [4, 5]
    assert out["n"].to_pylist() == [1, 1]
    assert out["bp"].to_pylist() == [5000, 5000]


# ---------------------------------------------------------------------------
# global (partition-free) window ranking + rank fusion + survival
# ---------------------------------------------------------------------------

def test_global_rank_vs_duckdb(ray_session):
    import duckdb
    from rayskema.pipelines.relational import global_rank
    rng = np.random.default_rng(11)
    n = 20_000
    t = pa.table({"id": np.arange(n),
                  "v": rng.integers(0, 137, n),
                  "w": rng.integers(0, 3, n)})
    out = global_rank(rd.from_arrow(t).repartition(23), ["v", "w"],
                      descending=[True, False], tiebreak="id")
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    o = con.execute(
        "SELECT ROW_NUMBER() OVER (ORDER BY v DESC, w, id) rn,"
        "       RANK() OVER (ORDER BY v DESC, w) rk,"
        "       DENSE_RANK() OVER (ORDER BY v DESC, w) dr "
        "FROM t ORDER BY id").fetchdf()
    assert (df["row_number"].values == o["rn"].values).all()
    assert (df["rank"].values == o["rk"].values).all()
    assert (df["dense_rank"].values == o["dr"].values).all()


def test_global_rank_single_run_straddles_all_blocks(ray_session):
    # one giant tie run crossing every sort block: rank must stay 1
    from rayskema.pipelines.relational import global_rank
    n = 5_000
    t = pa.table({"id": np.arange(n), "v": np.zeros(n, np.int64)})
    out = global_rank(rd.from_arrow(t).repartition(17), "v",
                      tiebreak="id").to_pandas()
    assert (out["rank"] == 1).all()
    assert (out["dense_rank"] == 1).all()
    assert sorted(out["row_number"]) == list(range(1, n + 1))


def test_global_rank_nulls_and_parallelism_independence(ray_session):
    from rayskema.pipelines.relational import global_rank
    vals = pa.array([None, 3, 1, None, 2, 3, 1, None], pa.int64())
    t = pa.table({"id": np.arange(8), "v": vals})
    ranks = []
    for parts in (1, 3, 8):
        out = global_rank(rd.from_arrow(t).repartition(parts), "v",
                          tiebreak="id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        ranks.append((tuple(out["rank"]), tuple(out["dense_rank"]),
                      tuple(out["row_number"])))
    assert ranks[0] == ranks[1] == ranks[2]
    # nulls sort last ascending and tie with each other
    out = ranks[0]
    by_id = dict(zip(range(8), out[0]))
    assert by_id[0] == by_id[3] == by_id[7] == 6  # the null run
    assert by_id[2] == by_id[6] == 1              # value 1


def test_rrf_fuse_matches_manual(ray_session):
    from rayskema.pipelines.relational import rrf_fuse
    rng = np.random.default_rng(5)
    n = 3_000
    a = rng.integers(0, 50, n)
    b = rng.integers(0, 9, n)
    t = pa.table({"id": np.arange(n), "a": a, "b": b})
    out = rrf_fuse(rd.from_arrow(t).repartition(11), "id",
                   [("a", True), ("b", False)]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # manual reference ranks (SQL RANK ties)
    import pandas as pd
    ra = pd.Series(-a).rank(method="min").astype(np.int64).values
    rb = pd.Series(b).rank(method="min").astype(np.int64).values
    assert (out["rank_a"].values == ra).all()
    assert (out["rank_b"].values == rb).all()
    expect = 1.0 / (60 + ra) + 1.0 / (60 + rb)
    assert (out["rrf"].values == expect).all()


def test_km_risk_table(ray_session):
    from rayskema.pipelines.relational import km_risk_table
    t = pa.table({
        "d": pa.array([2, 2, 5, 5, 5, 7, 9, 9, None], pa.int64()),
        "ev": pa.array([True, False, True, True, None, False, True,
                        False, True])})
    out = km_risk_table(rd.from_arrow(t).repartition(4), "d", "ev")
    assert out["d"].to_pylist() == [2, 5, 7, 9]
    assert out["n_death"].to_pylist() == [1, 2, 0, 1]
    # null event flag counts as censored; null duration dropped
    assert out["n_censored"].to_pylist() == [1, 1, 1, 1]
    assert out["n_at_risk"].to_pylist() == [8, 6, 3, 2]


def test_cdc_chunks_reconstruct_and_dedup(ray_session):
    from rayskema.functions.dedup import cdc_chunks, cdc_dedup_stats
    rng = np.random.default_rng(9)
    base = "".join(chr(97 + c) for c in rng.integers(0, 24, 4000))
    docs = [base, "PREFIX-" + base, base + "-SUFFIX", "tiny", ""]
    t = pa.table({"doc_id": np.arange(len(docs)), "text": docs})
    ds = rd.from_arrow(t).repartition(3)
    chunks = cdc_chunks(ds, "doc_id", "text").to_pandas()
    # chunk lengths reconstruct each doc's byte length
    got = chunks.groupby("doc_id")["chunk_len"].sum().to_dict()
    assert got == {i: len(d.encode()) for i, d in enumerate(docs)}
    # shift resistance: the shared middle chunks between base and
    # PREFIX-base dedupe (most chunk hashes overlap)
    h0 = set(chunks[chunks.doc_id == 0]["chunk_hash"])
    h1 = set(chunks[chunks.doc_id == 1]["chunk_hash"])
    assert len(h0 & h1) >= max(1, len(h0) - 2)
    stats = cdc_dedup_stats(ds, "doc_id", "text")
    assert stats["total_bytes"][0].as_py() == sum(
        len(d.encode()) for d in docs)
    assert stats["dup_bytes_saved"][0].as_py() > len(base.encode())
    assert stats["n_distinct"][0].as_py() < stats["n_chunks"][0].as_py()


def test_cdc_chunks_parallelism_independent(ray_session):
    from rayskema.functions.dedup import cdc_chunks
    rng = np.random.default_rng(13)
    docs = ["".join(chr(97 + c) for c in rng.integers(0, 26, int(L)))
            for L in rng.integers(0, 600, 40)]
    t = pa.table({"doc_id": np.arange(40), "text": docs})
    outs = []
    for parts in (1, 7):
        df = cdc_chunks(rd.from_arrow(t).repartition(parts),
                        "doc_id", "text", batch_size=8).to_pandas() \
            .sort_values(["doc_id", "chunk_ord"]).reset_index(drop=True)
        outs.append(df[["doc_id", "chunk_ord", "chunk_hash",
                        "chunk_len"]].values.tolist())
    assert outs[0] == outs[1]


def test_theta_set_overlap_exact_below_k(ray_session):
    from rayskema.pipelines.relational import theta_set_overlap
    rng = np.random.default_rng(21)
    rows = []
    sets = {"a": set(rng.integers(0, 400, 300).tolist()),
            "b": set(rng.integers(200, 600, 300).tolist()),
            "c": set(rng.integers(0, 100, 80).tolist())}
    for g, vs in sets.items():
        for v in vs:
            rows.append((g, int(v)))
    t = pa.table({"g": [r[0] for r in rows],
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    out = theta_set_overlap(rd.from_arrow(t).repartition(5),
                            "g", "v", k=4096).to_pandas()
    for _, r in out.iterrows():
        A, B = sets[r["group_a"]], sets[r["group_b"]]
        assert r["est_a"] == len(A) and r["est_b"] == len(B)
        assert r["est_union"] == len(A | B)
        assert r["est_intersect"] == len(A & B)
    assert len(out) == 3


def test_pq_roundtrip_and_adc(ray_session):
    from rayskema.functions.similarity import (pq_encode, pq_fit,
                                               pq_mse, pq_topk_adc,
                                               _pq_codes_matrix)
    rng = np.random.default_rng(3)
    n, d = 2000, 32
    # clustered data so PQ has structure to exploit
    centers = rng.normal(size=(10, d)) * 5
    X = centers[rng.integers(0, 10, n)] + rng.normal(size=(n, d))
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": [row.tolist() for row in X]})
    ds = rd.from_arrow(t).repartition(6)
    books = pq_fit(ds, "embedding", id_col="vec_id", m=4,
                   n_centroids=64)
    assert books.shape == (4, 64, 8)
    codes = pq_encode(ds, "embedding", "vec_id", books).materialize()
    cm = _pq_codes_matrix(
        pa.concat_tables(ray.get(codes.to_arrow_refs())), "pq_code", 4)
    assert cm.shape == (n, 4) and cm.max() < 64
    # reconstruction beats the one-centroid baseline decisively
    base = pq_fit(ds, "embedding", id_col="vec_id", m=1, n_centroids=1)
    assert pq_mse(ds, "embedding", books) < 0.5 * pq_mse(
        ds, "embedding", base)
    # ADC shortlist k=100 recovers most of the exact-L2 top-5
    Q = X[:3]
    short = pq_topk_adc(codes, "vec_id", books, Q, k=100)
    recalls = []
    for q in range(3):
        d2 = ((X - Q[q]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        got = {i for i, _ in short[q]}
        recalls.append(len(exact & got))
        assert len(exact & got) >= 3
    assert np.mean(recalls) >= 4
    # deterministic fit at a different partitioning
    books2 = pq_fit(rd.from_arrow(t).repartition(2), "embedding",
                    id_col="vec_id", m=4, n_centroids=64)
    assert np.array_equal(books, books2)


def test_dbscan_matches_reference(ray_session):
    from rayskema.functions.similarity import dbscan
    rng = np.random.default_rng(17)
    # two dense blobs + sparse noise
    A = rng.normal(0, 0.3, (40, 4))
    B = rng.normal(5, 0.3, (35, 4))
    N = rng.uniform(-10, 15, (12, 4))
    X = np.vstack([A, B, N])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    eps, mp = 1.0, 4
    out = dbscan(rd.from_arrow(t).repartition(5), "embedding",
                 "vec_id", eps=eps, min_pts=mp).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # reference (same deterministic border rule)
    d2 = (X * X).sum(1)[:, None] - 2 * (X @ X.T) + (X * X).sum(1)[None]
    adj = d2 <= eps * eps + 1e-12
    core = adj.sum(1) >= mp
    parent = np.arange(len(X))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a in np.flatnonzero(core):
        for b in np.flatnonzero(adj[a] & core):
            if b > a:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots = {}
    for a in np.flatnonzero(core):
        roots.setdefault(find(a), []).append(a)
    rep = {r: min(v) for r, v in roots.items()}
    for i in range(len(X)):
        row = out.iloc[i]
        if core[i]:
            assert row["is_core"] and row["cluster"] == rep[find(i)]
        else:
            nb = np.flatnonzero(adj[i] & core)
            want = min(rep[find(j)] for j in nb) if len(nb) else -1
            assert not row["is_core"] and row["cluster"] == want
    # both blobs form clusters, noise labeled -1
    assert out[out.vec_id < 40]["cluster"].nunique() == 1
    assert out[(out.vec_id >= 40) & (out.vec_id < 75)][
        "cluster"].nunique() == 1
    assert (out[out.vec_id >= 75]["cluster"] == -1).any()


def test_global_quantiles_disc_convention(ray_session):
    import duckdb
    from rayskema.pipelines.relational import global_quantiles
    rng = np.random.default_rng(31)
    for n in (1, 4, 5, 997):
        vals = rng.normal(size=n).round(3)
        t = pa.table({"v": np.concatenate([vals, [np.nan]])})
        t = pa.table({"v": pa.array(list(vals) + [None], pa.float64())})
        out = global_quantiles(
            rd.from_arrow(t).repartition(min(7, n + 1)), "v",
            [0.0, 0.1, 0.5, 0.9, 1.0])
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        o = con.execute(
            "WITH q AS (SELECT quantile_disc(v, [0.0,0.1,0.5,0.9,1.0])"
            " vals FROM t WHERE v IS NOT NULL) "
            "SELECT unnest(vals) FROM q").fetchall()
        assert out["value"].to_pylist() == [r[0] for r in o], n


def test_rank_sum_u_vs_scipy_formula(ray_session):
    from rayskema.pipelines.relational import rank_sum_u
    rng = np.random.default_rng(8)
    a = rng.integers(0, 40, 300)          # heavy ties
    b = rng.integers(10, 50, 200)
    t = pa.table({
        "g": ["a"] * 300 + ["b"] * 200,
        "v": pa.array(np.concatenate([a, b]), pa.int64())})
    out = rank_sum_u(rd.from_arrow(t).repartition(9), "g", "v",
                     ["a", "b"]).to_pandas().set_index("g")
    # reference: midranks via scipy-style average ranking
    import pandas as pd
    allv = np.concatenate([a, b])
    mid = pd.Series(allv).rank(method="average").values
    r_a2 = int(round(2 * mid[:300].sum()))
    r_b2 = int(round(2 * mid[300:].sum()))
    assert out.loc["a", "r2_sum"] == r_a2
    assert out.loc["b", "r2_sum"] == r_b2
    assert out.loc["a", "u2"] == r_a2 - 300 * 301
    # U_a + U_b = n_a * n_b (Mann-Whitney identity)
    assert out.loc["a", "u2"] + out.loc["b", "u2"] == 2 * 300 * 200


def test_approx_top_k_per_group_exact_below_k(ray_session):
    from rayskema.pipelines.relational import approx_top_k_per_group
    rng = np.random.default_rng(6)
    groups = rng.choice(["g1", "g2", "g3"], 5000)
    items = np.array([f"t{v}" for v in rng.zipf(1.6, 5000) % 40])
    t = pa.table({"g": groups, "it": items})
    out = approx_top_k_per_group(
        rd.from_arrow(t).repartition(8), "g", "it",
        n_top=3, k_track=256).to_pandas()
    import collections
    for g in ("g1", "g2", "g3"):
        cnt = collections.Counter(items[groups == g].tolist())
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = out[out.g == g].sort_values(
            ["est_count", "item"], ascending=[False, True])
        assert list(zip(got["item"], got["est_count"])) == want
        assert (got["err"] == 0).all()


def test_bpe_train_matches_reference(ray_session):
    import collections
    from rayskema.functions.textstats import bpe_train
    rng = np.random.default_rng(5)
    words = ["hello", "world", "help", "hell", "lower", "lowest",
             "newer", "wider", "new", "the", "then", "than", "aaa"]
    docs = [" ".join(rng.choice(words, rng.integers(1, 25)))
            for _ in range(150)] + ["", "   "]
    t = pa.table({"text": docs})
    out = bpe_train(rd.from_arrow(t).repartition(6), "text",
                    n_merges=10)
    mine = list(zip(out["rank"].to_pylist(), out["sym_a"].to_pylist(),
                    out["sym_b"].to_pylist(),
                    out["new_id"].to_pylist(),
                    out["weight"].to_pylist()))
    wc = collections.Counter(w for d in docs for w in d.split() if w)
    pieces = {w: list(w.encode()) for w in wc}
    want, nid = [], 256
    for r in range(10):
        stats = collections.Counter()
        for w, c in wc.items():
            p = pieces[w]
            for i in range(len(p) - 1):
                stats[(p[i], p[i + 1])] += c
        if not stats:
            break
        best = min(stats, key=lambda k: (-stats[k],
                                         k[0] * (1 << 20) + k[1]))
        want.append((r + 1, best[0], best[1], nid, stats[best]))
        for w in pieces:
            p = pieces[w]
            q, i = [], 0
            while i < len(p):
                if i + 1 < len(p) and (p[i], p[i + 1]) == best:
                    q.append(nid)
                    i += 2
                else:
                    q.append(p[i])
                    i += 1
            pieces[w] = q
        nid += 1
    assert mine == want
    # overlap semantics: 'aaa' merges greedily left (one merge per
    # occurrence of the winning (a, a) pair)
    assert len(mine) == 10


def test_ivfpq_routing_and_recall(ray_session):
    from rayskema.functions.similarity import (ivfpq_build,
                                               ivfpq_search)
    rng = np.random.default_rng(19)
    centers = rng.normal(size=(6, 16)) * 4
    X = centers[rng.integers(0, 6, 1500)] + rng.normal(
        size=(1500, 16)) * 0.5
    t = pa.table({"vec_id": np.arange(1500),
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(5)
    coarse, books, codes = ivfpq_build(ds, "embedding", "vec_id",
                                       n_lists=8, m=4, n_centroids=32)
    codes = codes.materialize()
    assert coarse.shape == (8, 16) and books.shape == (4, 32, 4)
    tab = pa.concat_tables(
        [b for b in ray.get(codes.to_arrow_refs()) if b.num_rows])
    assert tab.num_rows == 1500
    assert tab["list_id"].to_numpy(zero_copy_only=False).max() < 8
    Q = X[:4]
    short = ivfpq_search(codes, "vec_id", coarse, books, Q, k=60,
                         nprobe=4)
    for q in range(4):
        d2 = ((X - Q[q]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        got = {i for i, _ in short[q]}
        assert len(exact & got) >= 3
    # deterministic build at another partitioning
    c2, b2, _ = ivfpq_build(rd.from_arrow(t).repartition(2),
                            "embedding", "vec_id", n_lists=8, m=4,
                            n_centroids=32)
    assert np.array_equal(coarse, c2) and np.array_equal(books, b2)


def test_review_fix_regressions(ray_session):
    """Round-4 session-6 review findings, pinned as tests."""
    import duckdb
    from rayskema.functions.dedup import cdc_chunks
    from rayskema.functions.similarity import dbscan
    from rayskema.pipelines.relational import (global_quantiles,
                                               global_rank)
    # 1. CDC on a tiny trailing batch (buffer < window) must not crash
    t = pa.table({"doc_id": [0, 1], "text": ["abc", ""]})
    out = cdc_chunks(rd.from_arrow(t), "doc_id", "text").to_pandas()
    assert out["chunk_len"].sum() == 3
    # 2. quantile positions use the decimal's exact rational (0.2 of
    #    5 rows is row 0, not row 1 as float 0.2*5 would give)
    t5 = pa.table({"v": pa.array([0, 1, 2, 3, 4], pa.int64())})
    g = global_quantiles(rd.from_arrow(t5).repartition(2), "v",
                         [0.2, 0.4, 0.8])
    con = duckdb.connect()
    con.register("t5", t5.to_pandas())
    o = con.execute("WITH q AS (SELECT quantile_disc(v, [0.2,0.4,0.8])"
                    " vals FROM t5) SELECT unnest(vals) FROM q") \
        .fetchall()
    assert g["value"].to_pylist() == [r[0] for r in o]
    # 3. NaNs form ONE tie run in global_rank (SQL semantics)
    tn = pa.table({"id": np.arange(6), "v": pa.array(
        [1.0, float("nan"), 2.0, float("nan"), float("nan"), 1.0])})
    r = global_rank(rd.from_arrow(tn).repartition(6), "v",
                    tiebreak="id").to_pandas().sort_values("id")
    nan_ranks = r[r["id"].isin([1, 3, 4])]["rank"].tolist()
    assert nan_ranks[0] == nan_ranks[1] == nan_ranks[2]
    assert r[r["id"].isin([1, 3, 4])]["dense_rank"].nunique() == 1
    # 4. dbscan min_pts=1: an isolated point is its own core cluster
    ti = pa.table({"vec_id": np.arange(3, dtype=np.int64),
                   "embedding": [[0.0, 0.0], [0.1, 0.0],
                                 [50.0, 50.0]]})
    d = dbscan(rd.from_arrow(ti), "embedding", "vec_id", eps=1.0,
               min_pts=1).to_pandas().sort_values("vec_id")
    assert d["is_core"].all()
    assert d["cluster"].tolist() == [0, 0, 2]


def test_group_theilsen(ray_session):
    from rayskema.pipelines.relational import group_theilsen
    rng = np.random.default_rng(23)
    rows = []
    for g, n in (("a", 2), ("b", 7), ("c", 1), ("d", 40)):
        xs = rng.choice(1000, n, replace=False).astype(float)
        ys = 3.0 * xs + rng.normal(0, 5, n)
        if g == "d":
            ys[0] += 1e6            # wild outlier barely moves T-S
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    rows.append(("e", 5.0, 1.0))
    rows.append(("e", 5.0, 9.0))    # only pair has dx=0 -> NULL slope
    t = pa.table({"g": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "y": [r[2] for r in rows]})
    out = group_theilsen(rd.from_arrow(t).repartition(4), "g", "x",
                         "y").to_pandas().set_index("g")
    for g in ("a", "b", "d"):
        sub = [(x, y) for gg, x, y in rows if gg == g]
        slopes = [(y2 - y1) / (x2 - x1)
                  for i, (x1, y1) in enumerate(sub)
                  for (x2, y2) in sub[i + 1:] if x2 != x1]
        assert out.loc[g, "slope"] == np.median(slopes)
        assert out.loc[g, "n_pairs"] == len(slopes)
    assert abs(out.loc["d", "slope"] - 3.0) < 1.0
    assert out.loc["c", "n_pairs"] == 0 and np.isnan(out.loc["c", "slope"])
    assert np.isnan(out.loc["e", "slope"])


def test_pagerank_weighted_personalized(ray_session):
    from rayskema.functions.graph import pagerank
    # star: seeds {0}; vertex 2 gets 3x vertex 3's weight from 0
    t = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                  "dst": pa.array([2, 3, 0], pa.int64()),
                  "w": pa.array([3, 1, 5], pa.int64())})
    ds = rd.from_arrow(t)
    out = pagerank(ds, iterations=3, weight_col="w",
                   seeds=[0]).to_pandas().set_index("v")["r"]
    # manual replication of the integer recurrence
    scale, num, den = 1_000_000, 85, 100
    verts = [0, 1, 2, 3]
    base = (scale * (den - num) * 4) // (den * 1)
    r = {v: scale for v in verts}
    wsum = {0: 4, 1: 5}
    for _ in range(3):
        contrib = {v: 0 for v in verts}
        for s, d, w in [(0, 2, 3), (0, 3, 1), (1, 0, 5)]:
            contrib[d] += (r[s] * num * w) // (den * wsum[s])
        r = {v: contrib[v] + (base if v == 0 else 0) for v in verts}
    assert out.to_dict() == r
    # unweighted unseeded default path unchanged (regression guard)
    out2 = pagerank(ds.select_columns(["src", "dst"]),
                    iterations=2).to_pandas()
    assert len(out2) == 4 and (out2["r"] > 0).all()


def test_global_rank_randomized_duckdb_parity(ray_session):
    """Randomized brute-force parity (the session-5 pattern): random
    dtypes, null rates, NaNs, tie densities and partition counts vs
    DuckDB window functions."""
    import duckdb
    rng = np.random.default_rng(77)
    from rayskema.pipelines.relational import global_rank
    for trial in range(8):
        n = int(rng.integers(1, 400))
        parts = int(rng.integers(1, 12))
        kind = rng.choice(["int", "float", "str"])
        nulls = rng.random() < 0.5
        desc = bool(rng.integers(0, 2))
        if kind == "int":
            v = rng.integers(0, max(2, n // 4), n).astype("int64")
            arr = pa.array(v, pa.int64())
        elif kind == "float":
            v = np.round(rng.normal(size=n), 1)
            if rng.random() < 0.5:
                v[rng.random(n) < 0.15] = np.nan
            arr = pa.array(v, pa.float64())
        else:
            v = rng.choice(list("abcde"), n)
            arr = pa.array(v, pa.string())
        if nulls and n:
            mask = rng.random(n) < 0.2
            arr = pa.array(
                [None if m else x for m, x in zip(mask,
                                                  arr.to_pylist())],
                arr.type)
        t = pa.table({"id": np.arange(n, dtype=np.int64), "v": arr})
        out = global_rank(rd.from_arrow(t).repartition(parts), "v",
                          descending=desc, tiebreak="id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        con = duckdb.connect()
        # register ARROW, not pandas: to_pandas() would fold NaN into
        # NULL and the oracle would never see a true NaN
        con.register("t", t)
        direction = "DESC" if desc else "ASC"
        nul = "NULLS FIRST" if desc else "NULLS LAST"
        o = con.execute(
            f"SELECT ROW_NUMBER() OVER (ORDER BY v {direction} {nul},"
            f" id) rn, RANK() OVER (ORDER BY v {direction} {nul}) rk,"
            f" DENSE_RANK() OVER (ORDER BY v {direction} {nul}) dr "
            f"FROM t ORDER BY id").fetchdf()
        ctx = f"trial {trial}: n={n} parts={parts} {kind} desc={desc}"
        assert (out["row_number"].values == o["rn"].values).all(), ctx
        assert (out["rank"].values == o["rk"].values).all(), ctx
        assert (out["dense_rank"].values == o["dr"].values).all(), ctx


def test_hopping_window_quantile(ray_session):
    from rayskema.pipelines.relational import hopping_window_quantile
    rng = np.random.default_rng(12)
    n = 4000
    ts = rng.integers(0, 10 * 3600 * 1_000_000, n)
    t = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "g": rng.choice(["a", "b"], n),
        "v": rng.normal(50, 10, n)})
    size, hop = 4 * 3600 * 1_000_000, 2 * 3600 * 1_000_000
    out = hopping_window_quantile(
        rd.from_arrow(t).repartition(6), "ts", "g", "v",
        size_us=size, hop_us=hop, qs=[0.5]).to_pandas()
    # reference: every event in exactly size/hop windows; p50 within
    # a generous exact band
    df = t.to_pandas()
    df["us"] = ts
    checked = 0
    for (w, g), sub in out.groupby(["window_start", "g"]):
        m = (df["g"] == g) & (df["us"] >= w) & (df["us"] < w + size)
        vals = np.sort(df.loc[m, "v"].values)
        if len(vals) < 10:
            continue
        lo, hi = np.quantile(vals, [0.3, 0.7])
        est = sub[sub["q"] == 0.5]["value_est"].iloc[0]
        assert lo <= est <= hi, (w, g, est, lo, hi)
        checked += 1
    assert checked >= 5
    # partitioning robustness: t-digest merges are NOT bit-stable
    # across block layouts, but the key set must match exactly and
    # every estimate must stay close to its other-layout twin
    out2 = hopping_window_quantile(
        rd.from_arrow(t).repartition(2), "ts", "g", "v",
        size_us=size, hop_us=hop, qs=[0.5]).to_pandas()
    a = out.sort_values(["window_start", "g", "q"]).reset_index(
        drop=True)
    b = out2.sort_values(["window_start", "g", "q"]).reset_index(
        drop=True)
    assert (a["window_start"] == b["window_start"]).all()
    assert (a["g"] == b["g"]).all()
    assert np.allclose(a["value_est"], b["value_est"], rtol=0.1)


def test_bpe_encode_matches_python_apply(ray_session):
    from rayskema.functions.textstats import bpe_encode, bpe_train
    rng = np.random.default_rng(5)
    words = ["banana", "bandana", "ananas", "aaa", "ab"]
    docs = [" ".join(rng.choice(words, rng.integers(1, 20)))
            for _ in range(80)] + ["", "   "]
    t = pa.table({"doc_id": np.arange(len(docs)), "text": docs})
    ds = rd.from_arrow(t).repartition(5)
    merges_tab = bpe_train(ds, "text", n_merges=8)
    merges = list(zip(merges_tab["sym_a"].to_pylist(),
                      merges_tab["sym_b"].to_pylist(),
                      merges_tab["new_id"].to_pylist()))
    out = bpe_encode(ds, "doc_id", "text", merges_tab).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def py_encode(text):
        ids = []
        for word in text.split():
            p = list(word.encode())
            for a, b, nid in merges:
                q, i = [], 0
                while i < len(p):
                    if i + 1 < len(p) and p[i] == a and p[i+1] == b:
                        q.append(nid); i += 2
                    else:
                        q.append(p[i]); i += 1
                p = q
            ids.extend(p)
        return ids

    for i, d in enumerate(docs):
        ids = py_encode(d)
        row = out.iloc[i]
        assert row["n_tokens"] == len(ids), i
        assert row["id_sum"] == sum(ids), i
        assert row["id_sq_sum"] == sum(x * x for x in ids), i
    # merges compress: total tokens < total bytes
    total_bytes = sum(len(w.encode()) for d in docs for w in d.split())
    assert out["n_tokens"].sum() < total_bytes


def test_ring_neighbors(ray_session):
    import duckdb
    from rayskema.functions.sampling import ring_neighbors
    for n, parts, k in ((1, 1, 2), (7, 5, 3), (300, 11, 2)):
        t = pa.table({"id": np.arange(n, dtype=np.int64)})
        out = ring_neighbors(rd.from_arrow(t).repartition(parts),
                             "id", k=k).to_pandas()
        con = duckdb.connect()
        con.register("t", t)
        o = con.execute(f"""
            WITH r AS (SELECT id, md5(CAST(id AS VARCHAR)) h FROM t),
                 o AS (SELECT id,
                              ROW_NUMBER() OVER (ORDER BY h, id) rn,
                              count(*) OVER () n FROM r)
            SELECT a.id, b.id AS neighbor_id, js.j AS ring_rank
            FROM o a, (SELECT unnest(range(1, {k + 1})) j) js
            JOIN o b ON b.rn = ((a.rn - 1 + js.j) % a.n) + 1
            """).fetchdf()
        mine = set(map(tuple,
                       out[["id", "neighbor_id",
                            "ring_rank"]].values.tolist()))
        want = set(map(tuple, o.values.tolist()))
        assert mine == want, (n, parts, k)
        # every row gets exactly k negatives, none of them itself
        # (except the degenerate n=1 ring)
        assert len(out) == n * k
        if n > 1:
            assert (out["id"] != out["neighbor_id"]).all()


def test_theta_set_overlap_above_k_accuracy(ray_session):
    from rayskema.pipelines.relational import theta_set_overlap
    rng = np.random.default_rng(41)
    a = rng.integers(0, 60_000, 40_000)
    b = np.concatenate([a[:20_000],
                        rng.integers(60_000, 120_000, 20_000)])
    t = pa.table({
        "g": ["a"] * len(a) + ["b"] * len(b),
        "v": pa.array(np.concatenate([a, b]), pa.int64())})
    out = theta_set_overlap(rd.from_arrow(t).repartition(10),
                            "g", "v", k=2048).to_pandas().iloc[0]
    ea = len(np.unique(a))
    eb = len(np.unique(b))
    eu = len(np.union1d(a, b))
    ei = len(np.intersect1d(a, b))
    assert abs(out["est_a"] - ea) / ea < 0.1
    assert abs(out["est_b"] - eb) / eb < 0.1
    assert abs(out["est_union"] - eu) / eu < 0.1
    assert abs(out["est_intersect"] - ei) / ei < 0.15
    # estimates are layout-independent (hash-based, merge-order free)
    out2 = theta_set_overlap(rd.from_arrow(t).repartition(3),
                             "g", "v", k=2048).to_pandas().iloc[0]
    assert (out[["est_a", "est_b", "est_union", "est_intersect"]]
            == out2[["est_a", "est_b", "est_union",
                     "est_intersect"]]).all()


def test_hopping_window_distinct_approx(ray_session):
    from rayskema.pipelines.relational import (
        hopping_window_distinct_approx)
    rng = np.random.default_rng(14)
    n = 6000
    ts = rng.integers(0, 8 * 3600 * 1_000_000, n)
    t = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "g": rng.choice(["a", "b"], n),
        "u": pa.array(rng.integers(0, 800, n), pa.int64())})
    size, hop = 4 * 3600 * 1_000_000, 2 * 3600 * 1_000_000
    out = hopping_window_distinct_approx(
        rd.from_arrow(t).repartition(7), "ts", "g", "u",
        size_us=size, hop_us=hop).to_pandas()
    df = t.to_pandas()
    df["us"] = ts
    for _, r in out.iterrows():
        m = (df["g"] == r["g"]) & (df["us"] >= r["window_start"]) \
            & (df["us"] < r["window_start"] + size)
        exact = df.loc[m, "u"].nunique()
        assert abs(r["n_approx"] - exact) <= max(3, 0.05 * exact)
    # bit-stable across layouts (register-wise max is order-free)
    out2 = hopping_window_distinct_approx(
        rd.from_arrow(t).repartition(2), "ts", "g", "u",
        size_us=size, hop_us=hop).to_pandas()
    a = out.sort_values(["window_start", "g"]).reset_index(drop=True)
    b = out2.sort_values(["window_start", "g"]).reset_index(drop=True)
    assert (a["n_approx"] == b["n_approx"]).all()


def test_bfs_hops_weighted_bellman_ford(ray_session):
    from rayskema.functions.graph import bfs_hops
    # path 0 -w2-> 1 -w3-> 2; shortcut 0 -w10-> 2; isolated 5->6
    t = pa.table({"src": pa.array([0, 1, 0, 5], pa.int64()),
                  "dst": pa.array([1, 2, 2, 6], pa.int64()),
                  "w": pa.array([2, 3, 10, 4], pa.int64())})
    out = bfs_hops(rd.from_arrow(t), source_mod=5, rounds=4,
                   weight_col="w").to_pandas().set_index("v")["d"]
    # sources: v % 5 == 0 -> {0, 5}
    assert out.to_dict() == {0: 0, 1: 2, 2: 5, 5: 0, 6: 4}
    # unweighted default unchanged
    out2 = bfs_hops(rd.from_arrow(t.select(["src", "dst"])),
                    source_mod=5, rounds=4).to_pandas() \
        .set_index("v")["d"]
    assert out2.to_dict() == {0: 0, 1: 1, 2: 1, 5: 0, 6: 1}
    import pytest
    with pytest.raises(Exception):
        bfs_hops(rd.from_arrow(pa.table({
            "src": pa.array([0], pa.int64()),
            "dst": pa.array([1], pa.int64()),
            "w": pa.array([-1], pa.int64())})),
            source_mod=1, rounds=1, weight_col="w").take_all()


def test_pmi_bigrams_exact_counts(ray_session):
    """PMI over a corpus small enough to count by hand: bigram and
    unigram counts are exact, pmi matches the closed form, and the
    result is block-layout independent."""
    import math

    import ray
    import ray.data as rd

    from rayskema.functions import round_half_away
    from rayskema.functions.textstats import pmi_bigrams

    texts = (["hot dog"] * 6 + ["hot day"] * 2 + ["dog day"] * 2
             + ["hot", "dog!"])
    expect_T = 22          # 10 two-token docs + 2 singles
    expect_N = 10

    for nparts in (1, 5):
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = pa.concat_tables([t for t in ray.get(
            pmi_bigrams(ds, "text", min_count=2).to_arrow_refs())
            if t.num_rows])
        rows = {(a, b): (np_, na, nb, p) for a, b, np_, na, nb, p in
                zip(out["tok_a"].to_pylist(), out["tok_b"].to_pylist(),
                    out["n_pair"].to_pylist(), out["n_a"].to_pylist(),
                    out["n_b"].to_pylist(), out["pmi"].to_pylist())}
        assert set(rows) == {("hot", "dog"), ("hot", "day"),
                             ("dog", "day")}
        n_pair, n_a, n_b, pmi = rows[("hot", "dog")]
        assert (n_pair, n_a, n_b) == (6, 9, 9)
        want = float(round_half_away(
            math.log((6.0 * expect_T * expect_T)
                     / (float(expect_N) * 9.0 * 9.0)), 6))
        assert pmi == want


def test_dbscan_local_path_matches_distributed(ray_session):
    """The adaptive single-task DBSCAN labeling must equal the
    distributed stage pipeline bit-for-bit (clusters, core flags,
    noise) on a mixed core/border/noise corpus; likewise the local
    connected-components path vs the hash-to-min rounds."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayskema.functions.dedup import connected_components
    from rayskema.functions.similarity import dbscan

    rng = np.random.default_rng(11)
    blob_a = rng.normal(0.0, 0.3, (40, 4))
    blob_b = rng.normal(4.0, 0.3, (30, 4))
    stray = rng.normal(8.0, 3.0, (15, 4))
    X = np.concatenate([blob_a, blob_b, stray])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array(list(X.astype(np.float32)))})

    def run(local_max_bytes):
        out = dbscan(rd.from_arrow(t).repartition(4), "embedding",
                     "vec_id", eps=1.0, min_pts=5,
                     local_max_bytes=local_max_bytes).take_all()
        return sorted((r["vec_id"], r["cluster"], r["is_core"])
                      for r in out)

    assert run(0) == run(None)          # big path == local path

    edges = pa.table({
        "id_a": pa.array([1, 2, 7, 9, 100], type=pa.int64()),
        "id_b": pa.array([2, 3, 9, 11, 101], type=pa.int64())})
    a = {(r["node"], r["rep"]) for r in connected_components(
        edges, local_max_bytes=1 << 30).take_all()}
    b = {(r["node"], r["rep"]) for r in connected_components(
        edges, local_max_bytes=0).take_all()}
    assert a == b
    assert a == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7), (11, 7),
                 (100, 100), (101, 100)}


def test_minhash_index_incremental_equals_single_shot(ray_session):
    """Building the band index on half the corpus and probing the
    other half must surface every cross near-dup pair the single-shot
    banding surfaces; a second probe after update=True finds pairs
    against the merged (corpus + first increment) index."""
    import tempfile

    import numpy as np
    import ray
    import ray.data as rd

    from rayskema.state.minhash_index import (build_minhash_index,
                                              probe_minhash_index,
                                              read_meta)

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts, ids = [], []
    for i in range(30):
        # pairs (2i, 2i+1) are near-identical; distinct across i
        body = base + f"variant {i} " * 3
        texts += [body, body + "tail"]
        ids += [2 * i, 2 * i + 1]
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    corpus = rd.from_arrow(t.filter(
        pa.array([i % 2 == 0 for i in ids])))
    inc = rd.from_arrow(t.filter(
        pa.array([i % 2 == 1 for i in ids])))

    with tempfile.TemporaryDirectory() as idx:
        meta = build_minhash_index(corpus, "text", "doc_id", idx,
                                   buckets=8)
        assert read_meta(idx)["n_rows"] == meta["n_rows"] > 0
        cands = pa.concat_tables([c for c in ray.get(
            probe_minhash_index(inc, "text", "doc_id", idx,
                                update=True).to_arrow_refs())
            if c.num_rows])
        got = set(zip(cands["id_new"].to_pylist(),
                      cands["id_old"].to_pylist()))
        # every constructed near-identical pair must be a candidate
        for i in range(30):
            assert (2 * i + 1, 2 * i) in got
        # probe an exact copy of an increment doc: after update=True
        # the index knows the increment, so the copy collides with
        # BOTH halves of its pair
        probe2 = rd.from_arrow(pa.table({
            "doc_id": pa.array([999], type=pa.int64()),
            "text": pa.array([texts[1]])}))
        c2 = pa.concat_tables([c for c in ray.get(
            probe_minhash_index(probe2, "text", "doc_id", idx)
            .to_arrow_refs()) if c.num_rows])
        got2 = set(zip(c2["id_new"].to_pylist(),
                       c2["id_old"].to_pylist()))
        assert (999, 0) in got2 and (999, 1) in got2


def test_logreg_layout_independent_and_learns(ray_session):
    """Distributed logistic GD: bit-identical weights across block
    layouts (integer-quantized gradient fold), exact equality with
    the single-node replica, and loss decreases on separable data."""
    import numpy as np
    import ray.data as rd

    from rayskema.functions.fit import (logistic_regression_gd,
                                        logistic_regression_local)

    rng = np.random.default_rng(3)
    n = 4000
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    y = (x1 + 0.5 * x2 + rng.normal(0, 0.2, n) > 0).astype(np.float64)
    t = pa.table({"x1": pa.array(x1), "x2": pa.array(x2),
                  "y": pa.array(y)})

    fits = []
    for nparts in (1, 7, 31):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        fits.append(logistic_regression_gd(
            ds, ["x1", "x2"], "y", iters=10, lr=1.0))
    assert np.array_equal(fits[0]["w"], fits[1]["w"])
    assert np.array_equal(fits[0]["w"], fits[2]["w"])
    assert fits[0]["losses_q"] == fits[1]["losses_q"] \
        == fits[2]["losses_q"]

    ref = logistic_regression_local(
        np.column_stack([x1, x2]), y, iters=10, lr=1.0)
    assert np.array_equal(fits[0]["w"], ref["w"])
    assert fits[0]["losses_q"] == ref["losses_q"]
    assert fits[0]["losses_q"][-1] < fits[0]["losses_q"][0]
    assert fits[0]["w"][0] > 0          # learned the true direction


def test_naive_bayes_separable_and_layout_independent(ray_session):
    """NB on a cleanly separable corpus recovers every label; scores
    are identical across block layouts (integer-quantized folds)."""
    import ray
    import ray.data as rd

    from rayskema.functions.textstats import naive_bayes_classify

    spam = [f"buy cheap pills now offer {i}" for i in range(20)]
    ham = [f"meeting notes agenda quarterly review {i}"
           for i in range(20)]
    t = pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": pa.array(spam + ham),
        "label": pa.array(["spam"] * 20 + ["ham"] * 20)})

    outs = []
    for nparts in (1, 8):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = pa.concat_tables([b for b in ray.get(
            naive_bayes_classify(ds, "text", "doc_id", "label",
                                 buckets=4).to_arrow_refs())
            if b.num_rows])
        outs.append(sorted(zip(out["doc_id"].to_pylist(),
                               out["pred"].to_pylist(),
                               out["score_q"].to_pylist())))
    assert outs[0] == outs[1]
    for i, pred, _ in outs[0]:
        assert pred == ("spam" if i < 20 else "ham")


def test_global_pack_matches_window_sum(ray_session):
    """global_pack equals the SQL running-sum assignment on a corpus
    forcing cross-block bins (tiny budget), identical across layouts,
    and handles null weights/order keys without row duplication."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayskema.pipelines.relational import global_pack

    rng = np.random.default_rng(5)
    n = 500
    w = rng.integers(1, 50, n)
    key = rng.integers(0, 9, n)          # heavy ties across blocks
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "k": pa.array(key.astype(np.int64)),
                  "w": pa.array(w.astype(np.int64))})

    order = np.lexsort((np.arange(n), key))
    excl = np.cumsum(w[order]) - w[order]
    want = {int(t["id"][i].as_py()): (int(e // 64), int(e % 64))
            for i, e in zip(order, excl)}

    for nparts in (1, 11):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = pa.concat_tables([b for b in ray.get(
            global_pack(ds, ["k", "id"], "w", budget=64)
            .to_arrow_refs()) if b.num_rows])
        got = {i: (b, o) for i, b, o in
               zip(out["id"].to_pylist(), out["bin"].to_pylist(),
                   out["bin_offset"].to_pylist())}
        assert got == want


def test_kl_divergence_layout_independent(ray_session):
    """KL pair sums are exact integer folds: identical across block
    layouts and bucket counts, zero only for identical distributions."""
    import ray.data as rd

    from rayskema.functions.textstats import kl_divergence_by_group

    texts = (["alpha beta gamma"] * 5 + ["alpha beta delta"] * 5
             + ["alpha beta gamma"] * 5)
    grp = ["p"] * 5 + ["q"] * 5 + ["r"] * 5
    t = pa.table({"text": pa.array(texts), "g": pa.array(grp)})
    outs = []
    for nparts, b in ((1, 2), (6, 4)):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = kl_divergence_by_group(ds, "text", "g", buckets=b)
        outs.append(sorted(zip(out["src"].to_pylist(),
                               out["dst"].to_pylist(),
                               out["kl_q"].to_pylist())))
    assert outs[0] == outs[1]
    d = dict(((a, b), v) for a, b, v in outs[0])
    assert d[("p", "r")] == 0 and d[("r", "p")] == 0   # same dist
    assert d[("p", "q")] > 0 and d[("q", "p")] > 0


def test_mine_fds_exact_and_layout_independent(ray_session):
    """G3 violation counts: a constructed exact FD holds, a near-FD's
    violation count is the known minimum row removal, identical
    across layouts; nulls group as values."""
    import ray.data as rd

    from rayskema.functions.infer import mine_fds

    # b = a // 2 exactly; c breaks it for 3 rows; d has a null group
    a = list(range(20)) * 3
    b = [x // 2 for x in a]
    c = list(b)
    c[0] = 99
    c[20] = 99          # a=0 appears 3x: two say 0, one says 99 -> 1 viol... (a=0 rows are idx 0,20,40)
    d = [None if x % 5 == 0 else x % 3 for x in a]
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64()),
                  "c": pa.array(c, pa.int64()),
                  "d": pa.array(d, pa.int64())})
    outs = []
    for nparts in (1, 9):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = mine_fds(ds, ["a", "b", "c", "d"], min_conf=0.99,
                       buckets=4)
        outs.append(sorted(zip(out["lhs"].to_pylist(),
                               out["rhs"].to_pylist(),
                               out["violations"].to_pylist(),
                               out["holds"].to_pylist())))
    assert outs[0] == outs[1]
    res = {(l, r): (v, h) for l, r, v, h in outs[0]}
    assert res[("a", "b")] == (0, True)
    # a=0 rows: c values (99, 0, 0) -> 1 removal; others 0
    assert res[("a", "c")][0] == 1
    assert res[("a", "c")][1] is False      # 1 > 0.01 * 60
    assert res[("b", "a")][0] > 0           # b maps to two a values


def test_scd2_runs_and_null_values(ray_session):
    """SCD2: runs collapse, null values form their own run
    (null-safe equality), valid_to chains to the next run, versions
    are per-key ordinals; identical across layouts."""
    import datetime as dt

    import ray
    import ray.data as rd

    from rayskema.pipelines.relational import scd2_intervals

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, "a", T(0), 100), (1, "a", T(1), 101), (1, "b", T(2), 102),
        (1, None, T(3), 103), (1, None, T(4), 104), (1, "a", T(5), 105),
        (2, "x", T(0), 200),
    ]
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "id": pa.array([r[3] for r in rows], pa.int64())})

    outs = []
    for nparts in (1, 4):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        out = pa.concat_tables([b for b in ray.get(
            scd2_intervals(ds, "k", "v", "ts", tiebreak=["id"],
                           buckets=2).to_arrow_refs())
            if b.num_rows])
        outs.append(sorted(
            zip(out["k"].to_pylist(), out["version"].to_pylist(),
                out["v"].to_pylist(), out["valid_from"].to_pylist(),
                out["valid_to"].to_pylist()),
            key=lambda r: (r[0], r[1])))
    assert outs[0] == outs[1]
    assert outs[0] == [
        (1, 1, "a", T(0), T(2)), (1, 2, "b", T(2), T(3)),
        (1, 3, None, T(3), T(5)), (1, 4, "a", T(5), None),
        (2, 1, "x", T(0), None)]


def test_ridge_layout_independent_and_accurate(ray_session):
    """Ridge moments fold exactly (layout-independent) and the solve
    recovers known coefficients on clean linear data."""
    import numpy as np
    import ray.data as rd

    from rayskema.functions.fit import ridge_regression

    rng = np.random.default_rng(8)
    n = 3000
    x1 = rng.uniform(0, 1, n)
    x2 = rng.uniform(0, 1, n)
    y = 0.6 * x1 - 0.3 * x2 + 0.2
    t = pa.table({"x1": pa.array(x1), "x2": pa.array(x2),
                  "y": pa.array(y)})
    fits = []
    for nparts in (1, 13):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        fits.append(ridge_regression(ds, ["x1", "x2"], "y", l2=0.001))
    assert fits[0]["moments"] == fits[1]["moments"]
    assert np.array_equal(fits[0]["w"], fits[1]["w"])
    w = fits[0]["w"]
    assert abs(w[0] - 0.6) < 0.02 and abs(w[1] + 0.3) < 0.02 \
        and abs(w[2] - 0.2) < 0.02


def test_wasserstein_1d_exact(ray_session):
    """W1 numerator on hand-checkable distributions, identical
    across layouts; zero for identical distributions."""
    import ray.data as rd

    from rayskema.pipelines.relational import wasserstein_1d

    # a: {0:2, 10:2}; b: {0:2, 20:2} -> N=2x... na=4? use 2 rows each
    qv = [0, 10, 0, 20, 0, 10, 0, 20]
    side = ["a", "a", "b", "b", "a", "a", "b", "b"]
    t = pa.table({"qv": pa.array(qv, pa.int64()),
                  "side": pa.array(side)})
    # F_a steps: val 0 cum 2/4, val 10 cum 4/4; F_b: 0->2/4, 20->4/4
    # gaps: [0,10): |2*4-2*4|*10=0; [10,20): |4*4-2*4|*10=80
    want = 80
    for nparts in (1, 5):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        r = wasserstein_1d(ds, "qv", "side", buckets=2)
        assert (r["w1_num"], r["n_a"], r["n_b"]) == (want, 4, 4)

    ident = pa.table({"qv": pa.array([1, 2, 1, 2], pa.int64()),
                      "side": pa.array(["a", "a", "b", "b"])})
    r = wasserstein_1d(rd.from_arrow(ident), "qv", "side", buckets=2)
    assert r["w1_num"] == 0


def test_decision_stump_exact(ray_session):
    """Stump finds the known best threshold on a separable-by-
    threshold corpus, identical across layouts; ties go to the
    smaller threshold."""
    import numpy as np
    import ray.data as rd

    from rayskema.pipelines.relational import decision_stump

    # qv <= 10 -> mostly positive; qv > 10 -> mostly negative
    qv = [1, 5, 10, 11, 20, 30] * 50
    y = [1, 1, 1, 0, 0, 0] * 50
    # noise that doesn't move the optimum
    qv += [5, 20]
    y += [0, 1]
    t = pa.table({"qv": pa.array(qv, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    outs = []
    for nparts in (1, 7):
        ds = rd.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        outs.append(decision_stump(ds, "qv", "y", buckets=2))
    assert outs[0] == outs[1]
    assert outs[0]["threshold"] == 10
    assert outs[0]["n_left"] == 151 and outs[0]["n_right"] == 151


def test_global_rank_parquet_backed_nan_ties(ray_session, tmp_path):
    """Parquet-backed global ranking with NaN keys and heavy ties:
    deterministic and self-consistent (row_number unique and aligned
    with rank runs) — the shape the file-metadata sizing sees."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from rayskema.pipelines import relational as R

    rng = np.random.default_rng(17)
    n = 2000
    keys = rng.integers(0, 40, n).astype(np.float64)
    keys[rng.integers(0, n, 25)] = np.nan
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "k": pa.array(keys)})
    p = str(tmp_path / "rank_in.parquet")
    pq.write_table(t, p)

    def run():
        ds = rd.read_parquet(p)
        out = pa.concat_tables([b for b in ray.get(
            R.global_rank(ds, "k", descending=True, tiebreak="id")
            .to_arrow_refs()) if b.num_rows])
        return sorted(zip(out["id"].to_pylist(),
                          out["row_number"].to_pylist(),
                          out["rank"].to_pylist(),
                          out["dense_rank"].to_pylist()))

    a, b = run(), run()
    assert a == b
    assert len(a) == n
    assert sorted(r[1] for r in a) == list(range(1, n + 1))


def test_eps_neighbor_pairs_lsh_matches_exact(ray_session):
    """E2LSH candidate pairs exact-verify to the same set as the
    brute eps-ball at the default parameters (recall ~1 at eps)."""
    from rayskema.functions.similarity import (eps_neighbor_pairs,
                                               eps_neighbor_pairs_lsh)
    rng = np.random.default_rng(41)
    X = np.vstack([rng.normal(0, 0.3, (60, 4)),
                   rng.normal(4, 0.3, (50, 4)),
                   rng.uniform(-3, 7, (30, 4))])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(5)

    def pairset(d):
        tabs = [b for b in ray.get(d.to_arrow_refs()) if b.num_rows]
        if not tabs:
            return set()
        full = pa.concat_tables(tabs)
        return set(zip(full["id_a"].to_pylist(),
                       full["id_b"].to_pylist()))

    exact = pairset(eps_neighbor_pairs(ds, "embedding", "vec_id",
                                       eps=0.9))
    lsh = pairset(eps_neighbor_pairs_lsh(ds, "embedding", "vec_id",
                                         eps=0.9))
    assert lsh == exact
    assert all(a < b for a, b in lsh)
    # layout independence
    lsh2 = pairset(eps_neighbor_pairs_lsh(
        rd.from_arrow(t).repartition(2), "embedding", "vec_id",
        eps=0.9))
    assert lsh2 == lsh


def test_dbscan_lsh_mode_never_packs_corpus(ray_session,
                                            monkeypatch):
    """method="lsh" must label identically to the exact path WITHOUT
    ever assembling the corpus matrix (_pack_corpus is the exact
    path's broadcast; in LSH mode it must not be called)."""
    from rayskema.functions import similarity as S
    rng = np.random.default_rng(29)
    X = np.vstack([rng.normal(0, 0.3, (50, 4)),
                   rng.normal(5, 0.3, (45, 4)),
                   rng.uniform(-8, 12, (15, 4))])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(4)
    exact = S.dbscan(ds, "embedding", "vec_id", eps=1.0,
                     min_pts=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    class _Poison:
        def remote(self, *a, **k):
            raise AssertionError("corpus matrix packed in LSH mode")

    monkeypatch.setattr(S, "_pack_corpus", _Poison())
    lsh = S.dbscan(ds, "embedding", "vec_id", eps=1.0, min_pts=4,
                   method="lsh").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert lsh.equals(exact)
    import pytest
    with pytest.raises(Exception):
        S.dbscan(ds, "embedding", "vec_id", eps=1.0, min_pts=4,
                 method="exact").take_all()


def test_dbscan_candidates_injection(ray_session):
    """A precomputed exact-verified pair list short-circuits the
    candidate stage entirely and yields the same labeling."""
    from rayskema.functions.similarity import (dbscan,
                                               eps_neighbor_pairs)
    rng = np.random.default_rng(31)
    X = np.vstack([rng.normal(0, 0.4, (40, 3)),
                   rng.uniform(-6, 6, (20, 3))])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(3)
    pairs = eps_neighbor_pairs(ds, "embedding", "vec_id",
                               eps=1.1).materialize()
    base = dbscan(ds, "embedding", "vec_id", eps=1.1,
                  min_pts=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    inj = dbscan(ds, "embedding", "vec_id", eps=1.1, min_pts=5,
                 candidates=pairs).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert inj.equals(base)


def test_group_centroid_cosine_matches_brute(ray_session):
    """Exact quantized-integer centroid cosine per group: equals the
    brute reference computed with Python ints, independent of block
    layout, and omits groups missing a split half."""
    import math

    from rayskema.functions import round_half_away
    from rayskema.functions.similarity import group_centroid_cosine
    rng = np.random.default_rng(47)
    n, d = 120, 6
    X = rng.normal(0, 1, (n, d))
    g = rng.integers(0, 4, n)
    sp = rng.integers(0, 2, n)
    # group 3 gets only split-0 rows -> omitted from the output
    sp[g == 3] = 0
    t = pa.table({"grp": pa.array(g.astype(np.int64)),
                  "sp": pa.array(sp.astype(np.int64)),
                  "vec": [r.tolist() for r in X]})

    def brute():
        Q = round_half_away(X * 10_000, 0).astype(np.int64)
        out = {}
        for gk in sorted(set(g.tolist())):
            a = Q[(g == gk) & (sp == 0)].sum(axis=0)
            b = Q[(g == gk) & (sp == 1)].sum(axis=0)
            if not ((g == gk) & (sp == 1)).any():
                continue
            dot = sum(int(x) * int(y) for x, y in zip(a, b))
            n0 = sum(int(x) * int(x) for x in a)
            n1 = sum(int(y) * int(y) for y in b)
            c = float(dot) / (math.sqrt(float(n0))
                              * math.sqrt(float(n1)))
            out[gk] = float(round_half_away(np.array([c]), 6)[0])
        return out

    want = brute()
    for parts in (1, 5):
        got = group_centroid_cosine(
            rd.from_arrow(t).repartition(parts), "vec", "grp", "sp")
        res = dict(zip(got["grp"].to_pylist(),
                       got["cosine6"].to_pylist()))
        assert res == want
    assert 3 not in want


def test_dbscan_lsh_big_path_matches_local(ray_session):
    """Force the fully-distributed DBSCAN path (local_max_bytes=0:
    degree exchange + core-core components + border joins) under LSH
    candidates and pin it to the adaptive single-task path's labels —
    both with the exact candidate stage and with E2LSH."""
    from rayskema.functions.similarity import dbscan
    rng = np.random.default_rng(53)
    X = np.vstack([rng.normal(0, 0.3, (45, 4)),
                   rng.normal(4, 0.3, (40, 4)),
                   rng.uniform(-6, 9, (15, 4))])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(4)

    def run(**kw):
        return dbscan(ds, "embedding", "vec_id", eps=0.95,
                      min_pts=5, **kw).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)

    base = run()                                   # exact, local path
    for kw in ({"local_max_bytes": 0},             # exact, big path
               {"method": "lsh"},                  # lsh, local path
               {"method": "lsh", "local_max_bytes": 0}):  # lsh, big
        assert run(**kw).equals(base), kw
