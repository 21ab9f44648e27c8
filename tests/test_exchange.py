"""Adaptive hash-exchange tests: bucket count is sized from the
materialized input bytes so no gather task ever concatenates more than
~target_bucket_bytes, and oversize inputs fall back to the streaming
sort exchange — the 100 TB-safety contract of bucketed_map_groups."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from rayskema.pipelines import relational as rel


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def _make_ds(n_rows: int, payload: int) -> rd.Dataset:
    rng = np.random.default_rng(3)
    tab = pa.table({
        "k": pa.array(rng.integers(0, 5000, n_rows)),
        "v": pa.array(np.ones(n_rows, dtype=np.int64)),
        "pad": pa.array(["x" * payload] * n_rows),
    })
    return rd.from_arrow(tab).repartition(8)


def _make_sum_fn():
    """Bucket fn recording the gathered bytes next to per-key sums.
    Built as a closure so cloudpickle ships it by VALUE (a module-level
    function in a test file is pickled by reference, which Ray workers
    cannot import)."""

    def _sum_fn(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64()),
                             "gathered": pa.array([], type=pa.int64())})
        g = tab.group_by(["k"]).aggregate([("v", "sum")])
        return pa.table({
            "k": g["k"], "s": g["v_sum"],
            "gathered": pa.array(np.full(g.num_rows, tab.nbytes)),
        })

    return _sum_fn


def test_auto_buckets_bound_gather_bytes(ray_session):
    target = 64 << 10  # 64 KiB per bucket
    ds = _make_ds(6000, payload=64)  # ~0.5 MB of payload
    out = _collect(rel.bucketed_map_groups(
        ds, ["k"], _make_sum_fn(), target_bucket_bytes=target))
    # correctness: every key sums to its row count
    expect = _collect(ds).group_by(["k"]).aggregate([("v", "sum")])
    got = out.group_by(["k"]).aggregate([("s", "sum")]).sort_by("k")
    expect = expect.sort_by("k")
    assert got["k"].to_pylist() == expect["k"].to_pylist()
    assert got["s_sum"].to_pylist() == expect["v_sum"].to_pylist()
    # scale contract: no gather held more than a few x target (hash
    # imbalance allowance) and more than one bucket was used
    max_gathered = pc.max(out["gathered"]).as_py()
    assert max_gathered <= 3 * target, max_gathered
    n_buckets = len(set(out["gathered"].to_pylist()))
    assert n_buckets > 1


def test_auto_fallback_to_sort_exchange(ray_session, monkeypatch):
    """When the adaptive bucket count exceeds the manual exchange's
    object-count budget, the sort exchange takes over transparently
    (same results, no driver-side refs)."""
    monkeypatch.setattr(rel, "MANUAL_EXCHANGE_MAX_BUCKETS", 4)
    ds = _make_ds(4000, payload=64)
    out = rel.bucketed_map_groups(
        ds, ["k"], _make_sum_fn(), target_bucket_bytes=16 << 10)
    tab = _collect(out)
    expect = _collect(ds).group_by(["k"]).aggregate([("v", "sum")])
    got = tab.group_by(["k"]).aggregate([("s", "sum")]).sort_by("k")
    expect = expect.sort_by("k")
    assert got["s_sum"].to_pylist() == expect["v_sum"].to_pylist()
    # the sort path ran with > MANUAL_EXCHANGE_MAX_BUCKETS buckets
    assert len(set(tab["gathered"].to_pylist())) > 4


def test_explicit_buckets_still_honored(ray_session):
    ds = _make_ds(500, payload=8)
    out = _collect(rel.bucketed_map_groups(ds, ["k"], _make_sum_fn(), buckets=3))
    # exactly <=3 gather calls (some may be empty and dropped)
    assert len(set(out["gathered"].to_pylist())) <= 3
    assert int(pc.sum(out["s"]).as_py()) == 500


def test_local_topk_caps_hot_group():
    """Map-side combine: a block where one group holds 1000 of 1100
    rows contributes only k rows per group to the shuffle."""
    rng = np.random.default_rng(5)
    tab = pa.table({
        "g": pa.array(np.concatenate([np.zeros(1000, dtype=np.int64),
                                      rng.integers(1, 51, 100)])),
        "v": pa.array(rng.integers(0, 10**6, 1100)),
        "id": pa.array(np.arange(1100, dtype=np.int64)),
    })
    out = rel.local_topk_table(tab, "g", "v", "id", k=3, descending=True)
    per_group = out.group_by(["g"]).aggregate([("id", "count")])
    assert max(per_group["id_count"].to_pylist()) <= 3
    # the hot group's survivors are its true top-3
    hot = out.filter(pc.equal(out["g"], 0))
    v = tab.filter(pc.equal(tab["g"], 0))["v"].to_pylist()
    assert sorted(hot["v"].to_pylist(), reverse=True) == \
        sorted(v, reverse=True)[:3]


def test_skewed_group_ops_stay_correct(ray_session):
    """One key holding 50% of all rows: group_agg (partial-aggregated)
    and topk_per_group (map-side combined) both stay exact — the hot
    key moves O(blocks) / O(blocks*k) rows through the shuffle, never
    its full row count."""
    rng = np.random.default_rng(9)
    n = 40_000
    g = np.where(np.arange(n) % 2 == 0, 7,
                 rng.integers(100, 400, n)).astype(np.int64)
    v = rng.integers(0, 10**6, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "g": g, "v": v, "id": np.arange(n, dtype=np.int64)
    })).repartition(16)
    agg = _collect(rel.group_agg(ds, ["g"], [("v", "sum", "s"),
                                             ("v", "count_all", "n")]))
    hot = agg.filter(pc.equal(agg["g"], 7))
    assert hot["n"].to_pylist() == [int((g == 7).sum())]
    assert hot["s"].to_pylist() == [int(v[g == 7].sum())]
    topk = _collect(rel.topk_per_group(ds, "g", "v", "id", k=2))
    hot_top = topk.filter(pc.equal(topk["g"], 7)).sort_by("rank")
    expect = np.lexsort((np.arange(n)[g == 7], -v[g == 7]))[:2]
    assert hot_top["id"].to_pylist() == \
        list(np.arange(n)[g == 7][expect])


def test_empty_and_single_bucket_paths(ray_session):
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64()),
        "pad": pa.array([], type=pa.string())}))
    out = _collect(rel.bucketed_map_groups(empty, ["k"], _make_sum_fn()))
    assert out is None or out.num_rows == 0
    one = rd.from_arrow(pa.table({
        "k": pa.array([7, 7, 8], type=pa.int64()),
        "v": pa.array([1, 1, 1], type=pa.int64()),
        "pad": pa.array(["a", "b", "c"])}))
    t = _collect(rel.bucketed_map_groups(one, ["k"], _make_sum_fn(), buckets=1))
    assert sorted(t["k"].to_pylist()) == [7, 8]


def test_sort_exchange_adaptive_buckets(ray_session):
    """Explicit exchange='sort' with buckets=None sizes the exchange
    from the data (same adaptive contract as the manual path) instead
    of a hardcoded 64."""
    R = rel
    tab = pa.table({
        "k": pa.array(np.arange(5000) % 7, type=pa.int64()),
        "v": pa.array(np.arange(5000), type=pa.int64())})
    ds = rd.from_arrow(tab)

    def _count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return R.agg_named(t, ["k"], [("v", "count")], ["n"])

    out_tabs = [t for t in ray.get(
        R.bucketed_map_groups(ds, ["k"], _count, exchange="sort")
        .to_arrow_refs()) if t.num_rows]
    merged = pa.concat_tables(out_tabs).sort_by("k")
    assert merged["k"].to_pylist() == list(range(7))
    assert all(n in (714, 715) for n in merged["n"].to_pylist())


def test_hash_join_schemaless_empty_sides(ray_session):
    """A lazy chain that drops every row can lose its schema entirely
    (Dataset.schema() -> None); hash_join must resolve such joins
    without crashing: empty-left passthrough for left-preserving
    types, empty/identity for the empty-right cases."""
    R = rel
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([10, 20, 30], type=pa.int64())}))

    # an aggregated-then-filtered-to-nothing chain loses its schema
    agged = R.group_agg(left, ["k"], [("v", "sum", "s")], buckets=2)
    void = agged.map_batches(
        lambda t: t.filter(pc.greater(t["s"], 10**9)),
        batch_format="pyarrow")
    void = R.group_agg(void, ["k"], [("s", "sum", "s")], buckets=2)
    assert void.schema() is None

    # schema-less right: inner/semi -> empty, anti -> left unchanged
    for how, expect in (("inner", 0), ("left_semi", 0), ("left_anti", 3)):
        out = R.hash_join(left, void, on=["k"], how=how, broadcast=False)
        assert out.count() == expect, how
    # left_outer with an unknowable right schema raises clearly
    try:
        R.hash_join(left, void, on=["k"], how="left_outer")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no schema" in str(e)

    # schema-less left: left-preserving joins pass the empty through
    for how in ("inner", "left_semi", "left_anti", "left_outer"):
        out = R.hash_join(void, left, on=["k"], how=how)
        assert out.count() == 0, how


def test_hash_join_auto_broadcast(ray_session, monkeypatch):
    """broadcast='auto' picks broadcast for a small right side and the
    bucketed exchange above the threshold — identical results either
    way; full_outer always buckets."""
    R = rel
    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(200) % 10, type=pa.int64()),
        "v": pa.array(np.arange(200), type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(10), type=pa.int64()),
        "name": pa.array([f"n{i}" for i in range(10)])}))

    want = sorted(
        (r["k"], r["v"], r["name"]) for r in R.hash_join(
            left, right, on=["k"], how="inner",
            broadcast=True).take_all())

    got_auto = sorted(
        (r["k"], r["v"], r["name"]) for r in R.hash_join(
            left, right, on=["k"], how="inner",
            broadcast="auto").take_all())
    assert got_auto == want

    # force the bucketed decision by shrinking the threshold
    monkeypatch.setattr(R, "AUTO_BROADCAST_MAX_BYTES", 1)
    got_bucketed = sorted(
        (r["k"], r["v"], r["name"]) for r in R.hash_join(
            left, right, on=["k"], how="inner",
            broadcast="auto", buckets=4).take_all())
    assert got_bucketed == want

    try:
        R.hash_join(left, right, on=["k"], broadcast="yes")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "auto" in str(e)


def test_hash_join_bloom_prefilter(ray_session):
    """Bloom-prefiltered bucketed join equals the plain join for
    inner and semi; invalid combinations raise."""
    R = rel
    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(5000) % 500, type=pa.int64()),
        "v": pa.array(np.arange(5000), type=pa.int64())})) \
        .repartition(4)
    right = rd.from_arrow(pa.table({
        "k": pa.array([3, 77, 250], type=pa.int64()),
        "w": pa.array([30, 770, 2500], type=pa.int64())}))

    for how in ("inner", "left_semi"):
        plain = sorted(tuple(sorted(r.items())) for r in R.hash_join(
            left, right, on=["k"], how=how, buckets=4).take_all())
        pre = sorted(tuple(sorted(r.items())) for r in R.hash_join(
            left, right, on=["k"], how=how, buckets=4,
            prefilter="bloom").take_all())
        assert pre == plain, how
        assert len(plain) == 30

    try:
        R.hash_join(left, right, on=["k"], how="left_anti",
                    prefilter="bloom")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "left-preserving" in str(e)
    # pointless under broadcast: silently ignored, results unchanged
    out = R.hash_join(left, right, on=["k"], how="inner",
                      broadcast=True, prefilter="bloom")
    assert out.count() == 30


def test_hash_join_bloom_prefilter_cross_type(ray_session):
    """Regression: the bloom must hash the CAST right keys (what the
    exchange compares) — a string right key joined to an int left key
    must keep its true matches."""
    R = rel
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "ks": pa.array(["2", "4"], type=pa.string()),
        "w": pa.array([200, 400], type=pa.int64())}))
    out = sorted((r["k"], r["w"]) for r in R.hash_join(
        left, right, on=["k"], right_on=["ks"], how="inner",
        buckets=2, prefilter="bloom").take_all())
    assert out == [(2, 200), (4, 400)]


def test_group_winsorize_equal_quantiles(ray_session):
    """Regression: lo_q == hi_q clamps every value to that single
    quantile instead of raising."""
    from rayskema.functions.profile import group_winsorize

    tab = pa.table({"g": pa.array(["a"] * 4),
                    "v": pa.array([1, 2, 3, 4], type=pa.int64())})
    rows = group_winsorize(rd.from_arrow(tab), "g", "v",
                           lo_q=0.5, hi_q=0.5, buckets=1).take_all()
    # type-1 median of [1,2,3,4] is 2 -> everything clamps to 2
    assert sorted(r["v_wins"] for r in rows) == [2, 2, 2, 2]


def test_group_rolling_time_float_values(ray_session):
    """Regression: float value columns keep float sums (no silent
    int64 truncation)."""
    from rayskema.pipelines.relational import group_rolling_time

    tab = pa.table({
        "g": pa.array(["a", "a"]),
        "ts": pa.array([0, 5], type=pa.int64()),
        "v": pa.array([1.5, 2.25], type=pa.float64())})
    rows = group_rolling_time(rd.from_arrow(tab), "g", "ts", "v",
                              width=10, buckets=1).take_all()
    got = {r["ts"]: r["w_sum"] for r in rows}
    assert got == {0: 1.5, 5: 3.75}


def test_hash_join_skew_auto(ray_session):
    """skew='auto': a key holding 50% of left rows is detected by the
    sketch pass and joined via the broadcast side-path; results equal
    the plain bucketed join for every left-preserving type."""
    R = rel
    n = 4000
    k = np.where(np.arange(n) % 2 == 0, 7,
                 np.arange(n) % 100 + 100).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(k),
        "v": pa.array(np.arange(n), type=pa.int64())})) \
        .repartition(5)
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 100, 101, 999], type=pa.int64()),
        "w": pa.array(["hot", "a", "b", "unmatched"])}))

    hot, total = R.detect_hot_keys(left, ["k"])
    assert total == n and len(hot) >= 1

    for how in ("inner", "left_semi", "left_anti", "left_outer"):
        plain = sorted(tuple(sorted(r.items())) for r in R.hash_join(
            left, right, on=["k"], how=how, buckets=4).take_all())
        skewed = sorted(tuple(sorted(r.items())) for r in R.hash_join(
            left, right, on=["k"], how=how, buckets=4,
            skew="auto").take_all())
        assert skewed == plain, how

    try:
        R.hash_join(left, right, on=["k"], how="full_outer",
                    skew="auto")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "left-preserving" in str(e)
