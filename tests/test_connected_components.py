"""Distributed connected-components tests — the scale-safe cluster
path for near_dup_clusters: the driver holds only per-round change
counts, so a duplicate-heavy corpus (pairs ≈ rows) cannot OOM it."""
import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from rayskema.functions.dedup import connected_components, near_dup_clusters


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table(
        {"node": pa.array([], type=pa.int64()),
         "rep": pa.array([], type=pa.int64())})


def _local_cc(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    nodes = np.unique(np.concatenate([a, b]))
    parent = {int(n): int(n) for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a, b):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {int(n): find(int(n)) for n in nodes}


def test_cc_chains_and_cliques(ray_session):
    """pairs ≈ rows stress shape: long chains (worst case for naive
    min-propagation — pointer jumping must keep rounds logarithmic)
    plus a clique and singleton pairs."""
    edges_a, edges_b = [], []
    # 40 chains of length 50: node ids interleaved so chain order is
    # not ascending (reps must still be the global min of each chain)
    for c in range(40):
        ids = np.arange(c, c + 50 * 1000, 1000, dtype=np.int64)
        rng = np.random.default_rng(c)
        perm = rng.permutation(ids)
        edges_a.extend(perm[:-1])
        edges_b.extend(perm[1:])
    # one clique on high ids
    clique = np.arange(10**6, 10**6 + 20, dtype=np.int64)
    for i in range(len(clique)):
        for j in range(i + 1, len(clique)):
            edges_a.append(clique[i])
            edges_b.append(clique[j])
    a = np.array(edges_a, dtype=np.int64)
    b = np.array(edges_b, dtype=np.int64)
    pairs = rd.from_arrow(pa.table({"id_a": a, "id_b": b})).repartition(6)
    out = _collect(connected_components(pairs, max_rounds=20))
    got = dict(zip(out["node"].to_pylist(), out["rep"].to_pylist()))
    expect = _local_cc(a, b)
    assert got == expect


def test_cc_empty_and_self_loops(ray_session):
    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64())}))
    out = _collect(connected_components(empty))
    assert out.num_rows == 0
    loops = rd.from_arrow(pa.table({"id_a": [3, 5], "id_b": [3, 5]}))
    out = _collect(connected_components(loops))
    got = dict(zip(out["node"].to_pylist(), out["rep"].to_pylist()))
    assert got == {3: 3, 5: 5}


def test_near_dup_clusters_modes_agree(ray_session):
    """driver union-find and distributed CC produce the identical
    verdict over the same pair graph."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(30), type=pa.int64()),
        "text": ["t%d" % i for i in range(30)]}))
    pairs = pa.table({
        "id_a": pa.array([0, 1, 5, 6, 20], type=pa.int64()),
        "id_b": pa.array([1, 2, 6, 7, 25], type=pa.int64())})
    drv = _collect(near_dup_clusters(
        ds, "text", "doc_id", pairs=pairs, mode="driver")).sort_by("doc_id")
    dist = _collect(near_dup_clusters(
        ds, "text", "doc_id", pairs=pairs,
        mode="distributed")).sort_by("doc_id")
    assert drv["rep_id"].to_pylist() == dist["rep_id"].to_pylist()
    assert drv["keep"].to_pylist() == dist["keep"].to_pylist()
    reps = dict(zip(drv["doc_id"].to_pylist(), drv["rep_id"].to_pylist()))
    assert reps[2] == 0 and reps[7] == 5 and reps[25] == 20
    assert reps[10] == 10  # untouched doc is its own rep


def test_cc_survives_block_splitting(ray_session):
    """Ray dynamically splits blocks at target_max_block_size; a
    severed owner group must NOT produce batch-local minima (the
    emit step runs inside the gather where groups are complete).
    Regression: with a tiny block size a 4000-edge star used to
    converge to multiple reps for one component."""
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 4096  # force aggressive splitting
        n = 4000
        # one big star (all -> 0) + a long chain, both single-rep
        star_a = np.zeros(n, dtype=np.int64)
        star_b = np.arange(1, n + 1, dtype=np.int64)
        chain_a = np.arange(10_000, 10_500, dtype=np.int64)
        chain_b = chain_a + 1
        pairs = rd.from_arrow(pa.table({
            "id_a": pa.array(np.concatenate([star_a, chain_a])),
            "id_b": pa.array(np.concatenate([star_b, chain_b]))}))
        out = _collect(connected_components(pairs, buckets=4))
        got = dict(zip(out["node"].to_pylist(), out["rep"].to_pylist()))
        assert len(got) == (n + 1) + 501
        assert all(got[v] == 0 for v in range(n + 1))
        assert all(got[v] == 10_000 for v in range(10_000, 10_501))
    finally:
        ctx.target_max_block_size = old


def test_near_dup_clusters_rejects_unknown_mode(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": ["a", "b"]}))
    pairs = pa.table({"id_a": pa.array([0], type=pa.int64()),
                      "id_b": pa.array([1], type=pa.int64())})
    import pytest
    with pytest.raises(ValueError, match="mode"):
        near_dup_clusters(ds, "text", "doc_id", pairs=pairs,
                          mode="distribued")


def test_near_dup_clusters_keep_by(ray_session):
    """keep_by picks the score-maximizing member per cluster (ties ->
    smallest id); null scores lose; singletons keep themselves; the
    driver and distributed solvers agree."""
    import pyarrow as pa
    import ray.data as rd

    from rayskema.functions.dedup import near_dup_clusters

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array(["x"] * 6),
        "score": pa.array([1.0, 9.0, 9.0, None, 3.0, 7.0],
                          type=pa.float64())}))
    # clusters: {1,2,3} and {4,5}; 6 is a singleton
    pairs = pa.table({"id_a": pa.array([1, 2, 4], type=pa.int64()),
                      "id_b": pa.array([2, 3, 5], type=pa.int64())})
    for mode in ("driver", "distributed"):
        out = {r["doc_id"]: (r["rep_id"], r["keep"])
               for r in near_dup_clusters(
                   ds, "text", "doc_id", pairs=pairs, mode=mode,
                   keep_by="score").take_all()}
        # cluster {1,2,3}: 2 and 3 tie at 9.0 -> 2 wins; rep stays 1
        # cluster {4,5}: 4 has null score -> 5 wins
        assert out == {1: (1, False), 2: (1, True), 3: (1, False),
                       4: (4, False), 5: (4, True), 6: (6, True)}, \
            (mode, out)
