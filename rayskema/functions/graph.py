"""Graph analytics over distributed edge lists.

The reference has no graph operators; these are the graph-shaped
companions to the dedup module's :func:`~rayskema.functions.dedup.
connected_components` — the analytics a curation pipeline runs over
similarity / co-occurrence graphs (triangle density distinguishes
template-spam clusters from organic near-dup neighborhoods).

Both operators follow the repo's two motifs: vectorized per-block
work, hash exchanges only where a key's rows must co-locate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                    hash_join, segment_starts)


def pagerank(
    edges: "rd.Dataset", src_col: str = "src", dst_col: str = "dst", *,
    iterations: int = 5, scale: int = 1_000_000,
    damping_num: int = 85, damping_den: int = 100,
    weight_col: str | None = None, seeds: "list | None" = None,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Deterministic INTEGER PageRank over a directed edge list:
    ``iterations`` synchronous power iterations in fixed-point
    micro-units so the result is exactly reproducible (and exactly
    SQL-mirrorable — no float summation order to disagree about).

    Semantics (every division is a floor over non-negatives):

    - vertices = DISTINCT(src ∪ dst); ``r0(v) = scale``
    - ``r_{i+1}(v) = (scale·(den−num))//den
      + Σ_{(u,v)∈E} (r_i(u)·num) // (den·outdeg(u))``
    - dangling mass (outdeg 0) is dropped, the classic simplification;
      total mass therefore shrinks slightly per step, which is fine
      for RANKING (the use here) and keeps the recurrence local.

    Scale design: ``outdeg`` and the per-iteration contribution sums
    are one bucketed exchange each; the edge⋈outdeg join is computed
    ONCE and reused across all iterations (it is the |E|-sized
    invariant; ranks are the |V|-sized iterate).  The rank join takes
    ``broadcast="auto"`` — a small vertex set rides the object store,
    a huge one falls back to the bucketed exchange.  The driver holds
    no per-vertex data; each iterate is a materialized |V| dataset.
    Overflow headroom: max rank ≤ |V|·scale, so contributions fit
    int64 while ``|V|·scale·damping_num < 2^63`` (raise ``scale`` only
    for small graphs).

    ``weight_col`` (int64 edge weights > 0) turns the uniform split
    into a weight-proportional one: contribution =
    ``(r·num·w) // (den·Σw_u)`` — same floor-exact arithmetic, so the
    SQL mirror still matches bit-for-bit.  ``seeds`` switches to
    PERSONALIZED PageRank: the teleport mass concentrates on the seed
    set — ``base(v∈S) = (scale·(den−num)·|V|) // (den·|S|)``, 0
    elsewhere (total teleport mass unchanged) — the
    random-walk-with-restart proximity score used for
    recommendations; ``r0`` stays uniform ``scale``.

    Returns a Dataset ``(v, r)`` after the final iteration.
    """
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(cols)

    def _vert_partial(tab: pa.Table) -> pa.Table:
        v = pa.chunked_array([tab[src_col].combine_chunks(),
                              tab[dst_col].combine_chunks()])
        return pa.table({"v": v.combine_chunks().unique()})

    verts = bucketed_map_groups(
        edges.map_batches(_vert_partial, batch_format="pyarrow"),
        ["v"], lambda t: t.group_by(["v"]).aggregate([]),
        buckets=buckets, sort_within=False).materialize()

    def _deg_partial(tab: pa.Table) -> pa.Table:
        if weight_col is None:
            vc = tab[src_col].combine_chunks().value_counts()
            return pa.table({
                "v": vc.field("values"),
                "dg": pc.cast(vc.field("counts"), pa.int64())})
        w = pc.cast(tab[weight_col], pa.int64())
        if w.null_count:
            raise ValueError("pagerank: edge weights must not be null")
        if tab.num_rows and (pc.min(w).as_py() or 0) <= 0:
            raise ValueError("pagerank: edge weights must be > 0")
        part = pa.table({"v": tab[src_col], "dg": w})
        return agg_named(part, ["v"], [("dg", "sum")], ["dg"])

    outdeg = bucketed_map_groups(
        edges.map_batches(_deg_partial, batch_format="pyarrow"),
        ["v"], lambda t: agg_named(t, ["v"], [("dg", "sum")], ["dg"]),
        buckets=buckets, sort_within=False)

    # |E|-sized invariant, joined once and reused every iteration.
    e_deg = hash_join(edges, outdeg, on=src_col, right_on="v",
                      broadcast="auto").materialize()

    if seeds is None:
        base = (scale * (damping_den - damping_num)) // damping_den
        seed_arr = None
    else:
        seed_set = sorted(set(seeds))
        if not seed_set:
            raise ValueError("pagerank: seeds must be non-empty")
        seed_arr = pa.array(seed_set)
        n_verts = verts.count()
        # teleport conservation: every seed must BE a vertex and the
        # divisor is the DEDUPED seed count — duplicate or absent
        # seeds would silently shrink total teleport mass
        n_found = verts.map_batches(
            lambda t, _s=seed_arr: pa.table({"n": pa.array(
                [pc.sum(pc.cast(pc.is_in(t["v"], value_set=_s),
                                pa.int64())).as_py() or 0])}),
            batch_format="pyarrow").sum("n")
        if n_found != len(seed_set):
            raise ValueError(
                f"pagerank: {len(seed_set) - n_found} seed(s) are "
                "not vertices of the edge list")
        base = (scale * (damping_den - damping_num) * n_verts) \
            // (damping_den * len(seed_set))
    ranks = verts.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, scale, dtype=np.int64))),
        batch_format="pyarrow").materialize()

    num, den = damping_num, damping_den
    for _ in range(iterations):
        j = hash_join(e_deg, ranks, on=src_col, right_on="v",
                      broadcast="auto", suffix="_rk")

        def _contrib(tab: pa.Table) -> pa.Table:
            r = tab["r"].combine_chunks().to_numpy(zero_copy_only=False)
            dg = tab["dg"].combine_chunks().to_numpy(zero_copy_only=False)
            if weight_col is None:
                w = 1
                wmax = 1
            else:
                w = pc.cast(tab[weight_col], pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                wmax = int(w.max()) if len(w) else 1
            if len(r) and int(r.max()) > (2**63 - 1) // (num * wmax):
                raise OverflowError(
                    "pagerank: rank*damping_num*weight exceeds int64 "
                    "— lower `scale` for this vertex count")
            c = (r * num * w) // (den * dg)
            part = pa.table({"v": tab[dst_col], "c": pa.array(c)})
            return agg_named(part, ["v"], [("c", "sum")], ["c"])

        contrib = bucketed_map_groups(
            j.map_batches(_contrib, batch_format="pyarrow"),
            ["v"], lambda t: agg_named(t, ["v"], [("c", "sum")], ["c"]),
            buckets=buckets, sort_within=False)

        nxt = hash_join(verts, contrib, on="v", how="left_outer",
                        broadcast="auto")

        def _apply(tab: pa.Table) -> pa.Table:
            c = pc.fill_null(pc.cast(tab["c"], pa.int64()), 0)
            if seed_arr is None:
                return pa.table({"v": tab["v"],
                                 "r": pc.add_checked(c, base)})
            b = pc.if_else(
                pc.is_in(tab["v"], value_set=seed_arr),
                pa.scalar(base, pa.int64()),
                pa.scalar(0, pa.int64()))
            return pa.table({"v": tab["v"],
                             "r": pc.add_checked(c, b)})

        ranks = nxt.map_batches(_apply,
                                batch_format="pyarrow").materialize()
    return ranks


def kcore(
    edges: "rd.Dataset", src_col: str = "src", dst_col: str = "dst", *,
    k: int, rounds: int = 6, buckets: int | None = None,
) -> "rd.Dataset":
    """Synchronous k-core peeling over an UNDIRECTED edge list:
    ``rounds`` rounds of "drop every vertex whose degree among
    surviving vertices is < k", applied simultaneously each round.

    The contract is ``rounds`` SYNCHRONOUS rounds, not "until
    fixpoint" — that makes the result deterministic and exactly
    SQL-mirrorable (one unrolled CTE per round, like ``pagerank``)
    at ANY dataset, converged or not; peeling is monotone, so once
    the true k-core is reached further rounds are no-ops.

    Input must be DISTINCT undirected pairs with ``src != dst`` (one
    row per edge, either orientation); it is symmetrized internally,
    which keeps per-batch work local — no global dedup pass.

    Scale shape per round: two semi-joins of the (2|E|)-sized
    symmetric edge list against the alive set (``broadcast="auto"``:
    a small vertex set rides the object store once, a huge one falls
    back to the bucketed exchange) and one degree exchange.  The
    driver holds no per-vertex data; the alive iterate is a
    materialized |V|-sized dataset.

    Returns ``(v, deg)`` for vertices alive after the last round;
    ``deg`` is the degree that round filtered on (counted over the
    previous round's survivors).
    """
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    edges = edges.select_columns([src_col, dst_col])

    def _sym(tab: pa.Table) -> pa.Table:
        a = pa.chunked_array([tab[src_col].combine_chunks(),
                              tab[dst_col].combine_chunks()])
        b = pa.chunked_array([tab[dst_col].combine_chunks(),
                              tab[src_col].combine_chunks()])
        return pa.table({"a": a.combine_chunks(),
                         "b": b.combine_chunks()})

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    def _vert_partial(tab: pa.Table) -> pa.Table:
        return pa.table({"v": tab["a"].combine_chunks().unique()})

    alive = bucketed_map_groups(
        sym.map_batches(_vert_partial, batch_format="pyarrow"),
        ["v"], lambda t: t.group_by(["v"]).aggregate([]),
        buckets=buckets, sort_within=False).materialize()

    def _deg_partial(tab: pa.Table) -> pa.Table:
        vc = tab["a"].combine_chunks().value_counts()
        return pa.table({"v": vc.field("values"),
                         "deg": pc.cast(vc.field("counts"), pa.int64())})

    for _ in range(rounds):
        av = alive.select_columns(["v"])
        e1 = hash_join(sym, av, on="a", right_on="v",
                       how="left_semi", broadcast="auto")
        e2 = hash_join(e1, av, on="b", right_on="v",
                       how="left_semi", broadcast="auto")
        deg = bucketed_map_groups(
            e2.map_batches(_deg_partial, batch_format="pyarrow"),
            ["v"], lambda t: agg_named(t, ["v"], [("deg", "sum")],
                                       ["deg"]),
            buckets=buckets, sort_within=False)
        alive = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["deg"], pa.scalar(k, pa.int64()))),
            batch_format="pyarrow").materialize()
    return alive


def label_propagation(
    edges: "rd.Dataset", src_col: str = "src", dst_col: str = "dst", *,
    rounds: int = 4, buckets: int | None = None,
) -> "rd.Dataset":
    """Deterministic SYNCHRONOUS label propagation over an undirected
    edge list (community detection): labels start as the vertex id;
    each round EVERY vertex simultaneously adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label;
    isolated vertices keep their label.  Like :func:`kcore`, the
    contract is a fixed number of synchronous rounds — classic async
    LPA is schedule-dependent (and sync LPA can oscillate on
    bipartite structure), but a fixed-round synchronous sweep is a
    pure function of the input, exactly mirrorable by one unrolled
    CTE per round.

    Input: distinct undirected pairs with ``src != dst`` (one row per
    edge, either orientation); symmetrized internally.

    Scale shape per round: one broadcast-auto join of the symmetric
    edge list against the O(|V|) label iterate, block-local
    ``(vertex, label) -> count`` partials, ONE hash exchange on the
    vertex (complete groups make the majority vote exact), and a
    left-outer join back onto the vertex set for isolated vertices.
    The driver holds no per-vertex data.

    Returns ``(v, lab)`` after the final round."""
    edges = edges.select_columns([src_col, dst_col])

    def _sym(tab: pa.Table) -> pa.Table:
        a = pa.chunked_array([tab[src_col].combine_chunks(),
                              tab[dst_col].combine_chunks()])
        b = pa.chunked_array([tab[dst_col].combine_chunks(),
                              tab[src_col].combine_chunks()])
        return pa.table({"a": a.combine_chunks(),
                         "b": b.combine_chunks()})

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    def _vert_partial(tab: pa.Table) -> pa.Table:
        return pa.table({"v": tab["a"].combine_chunks().unique()})

    verts = bucketed_map_groups(
        sym.map_batches(_vert_partial, batch_format="pyarrow"),
        ["v"], lambda t: t.group_by(["v"]).aggregate([]),
        buckets=buckets, sort_within=False).materialize()

    labels = verts.map_batches(
        lambda t: pa.table({"v": t["v"],
                            "lab": pc.cast(t["v"], pa.int64())}),
        batch_format="pyarrow").materialize()

    def _count_partial(tab: pa.Table) -> pa.Table:
        part = pa.table({
            "v": tab["b"], "lab": tab["lab"],
            "__one": pa.array(np.ones(tab.num_rows, dtype=np.int64))})
        return agg_named(part, ["v", "lab"], [("__one", "sum")], ["c"])

    def _majority(tab: pa.Table) -> pa.Table:
        tab = agg_named(tab, ["v", "lab"], [("c", "sum")], ["c"])
        tab = tab.sort_by([("v", "ascending"), ("c", "descending"),
                           ("lab", "ascending")])
        firsts = np.flatnonzero(segment_starts(tab, ["v"]))
        take = pa.array(firsts)
        return pa.table({"v": tab["v"].take(take),
                         "lab_new": tab["lab"].take(take)})

    for _ in range(rounds):
        msgs = hash_join(sym, labels, on="a", right_on="v",
                         broadcast="auto")
        votes = bucketed_map_groups(
            msgs.map_batches(_count_partial, batch_format="pyarrow"),
            ["v"], _majority, buckets=buckets, sort_within=False)
        j = hash_join(labels, votes, on="v", how="left_outer",
                      broadcast="auto")
        labels = j.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "lab": pc.coalesce(pc.cast(t["lab_new"], pa.int64()),
                                   t["lab"])}),
            batch_format="pyarrow").materialize()
    return labels


def triangle_stats(
    edges: "rd.Dataset", a_col: str = "a", b_col: str = "b", *,
    buckets: int | None = None, max_group: int = 10_000_000,
) -> pa.Table:
    """Exact triangle census of an undirected simple graph given as a
    DISTINCT canonical edge list (``a < b``, no self-loops): one row
    ``(n_edges, n_wedges, n_triangles, transitivity)`` where
    ``n_wedges = Σ_v C(deg(v), 2)`` (open + closed paths of length 2)
    and ``transitivity = 3·triangles / wedges`` (the global clustering
    coefficient).

    The algorithm is the degree-oriented wedge count (Cohen's
    MapReduce triangle scheme; also Schank–Wagner's forward
    algorithm): orient every edge from its lower-``(deg, id)``
    endpoint to the higher, so each vertex's OUT-degree is
    ``O(√(2m))`` regardless of its raw degree — a celebrity vertex
    generates almost no wedges; its low-degree neighbors generate
    them instead.  Wedges (pairs of out-neighbors) are emitted per
    source vertex and closed by matching against the edge set.

    Exchanges: degree count (on vertex), two degree joins (``deg``
    is |V| rows ≤ edges — ``hash_join(broadcast="auto")`` broadcasts
    a small vertex set, buckets a huge one), wedge generation (on
    source), wedge↔edge match (on the pair).  Every stage's partial
    is pre-aggregated in-block; the driver holds five scalars.
    Wedge chunks stream through the dedup module's bounded pair
    templates, so peak residency is O(chunk) even on dense
    neighborhoods; an out-neighborhood larger than ``max_group``
    raises (it would mean ≫10¹³ wedges on a simple graph).

    Returns a driver-side one-row table (the result is five numbers,
    not a dataset)."""
    from .dedup import _group_pair_chunks

    edges = edges.select_columns([a_col, b_col])

    # --- degrees: one exchange on the vertex ----------------------
    def _deg_partial(tab: pa.Table) -> pa.Table:
        v = pa.chunked_array([tab[a_col].combine_chunks(),
                              tab[b_col].combine_chunks()])
        vc = v.combine_chunks().value_counts()
        return pa.table({"v": vc.field("values"),
                         "deg": pc.cast(vc.field("counts"), pa.int64())})

    deg = bucketed_map_groups(
        edges.map_batches(_deg_partial, batch_format="pyarrow"),
        ["v"], lambda t: agg_named(t, ["v"], [("deg", "sum")], ["deg"]),
        buckets=buckets, sort_within=False)

    # --- n_edges and n_wedges = Σ C(deg, 2): tiny driver partials --
    def _wedge_partial(tab: pa.Table) -> pa.Table:
        d = tab["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "n_vertices": pa.array([tab.num_rows], pa.int64()),
            "n_wedges": pa.array([int((d * (d - 1) // 2).sum())],
                                 pa.int64())})

    deg_mat = deg.materialize()   # reused: wedge partials + two joins
    wparts = deg_mat.map_batches(_wedge_partial,
                                 batch_format="pyarrow").take_all()
    n_wedges = sum(r["n_wedges"] for r in wparts)
    n_edges = edges.count()

    # --- orientation: src = lower (deg, id) endpoint ---------------
    j1 = hash_join(edges, deg_mat, on=a_col, right_on="v",
                   broadcast="auto", suffix="_a")
    j1 = j1.map_batches(lambda t: t.rename_columns(
        [{"deg": "deg_a"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")
    j2 = hash_join(j1, deg_mat, on=b_col, right_on="v",
                   broadcast="auto", suffix="_b")

    def _orient(tab: pa.Table) -> pa.Table:
        da = tab["deg_a"].combine_chunks().to_numpy(zero_copy_only=False)
        db = tab["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        a = tab[a_col].combine_chunks()
        b = tab[b_col].combine_chunks()
        an = a.to_numpy(zero_copy_only=False)
        bn = b.to_numpy(zero_copy_only=False)
        # lower (deg, id) wins; ids are distinct so ties break on id
        a_first = (da < db) | ((da == db) & (an < bn))
        src = pc.if_else(pa.array(a_first), a, b)
        dst = pc.if_else(pa.array(a_first), b, a)
        return pa.table({"src": src, "dst": dst})

    oriented = j2.map_batches(_orient, batch_format="pyarrow")

    # --- wedges: pairs of out-neighbors per source -----------------
    def _wedges(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("src", "ascending"), ("dst", "ascending")])
        if not tab.num_rows:
            t = tab["dst"].type
            return pa.table({"wa": pa.array([], t), "wb": pa.array([], t),
                             "n_w": pa.array([], pa.int64())})
        new = segment_starts(tab, ["src"])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.append(firsts, tab.num_rows))
        dst = tab["dst"].combine_chunks()
        partials = []
        for ia, ib in _group_pair_chunks(counts, firsts,
                                         max_group=max_group):
            chunk = pa.table({
                "wa": dst.take(pa.array(ia)),   # dst sorted per src,
                "wb": dst.take(pa.array(ib)),   # so wa < wb holds
                "__one": pa.array(np.ones(len(ia), dtype=np.int64))})
            partials.append(agg_named(chunk, ["wa", "wb"],
                                      [("__one", "sum")], ["n_w"]))
        if not partials:
            t = dst.type
            return pa.table({"wa": pa.array([], t), "wb": pa.array([], t),
                             "n_w": pa.array([], pa.int64())})
        return agg_named(pa.concat_tables(partials), ["wa", "wb"],
                         [("n_w", "sum")], ["n_w"])

    wedges = bucketed_map_groups(oriented, ["src"], _wedges,
                                 buckets=buckets, sort_within=False)

    # --- close wedges against the edge set: one pair exchange ------
    def _tag(is_edge: int):
        def fn(tab: pa.Table) -> pa.Table:
            first = tab.column_names[0]
            return pa.table({
                "wa": tab[0], "wb": tab[1],
                "n_w": (pa.nulls(tab.num_rows, pa.int64())
                        if is_edge else tab["n_w"]),
                "is_edge": pa.array(
                    np.full(tab.num_rows, is_edge, dtype=np.int8)),
            }) if first else tab
        return fn

    tagged = wedges.map_batches(_tag(0), batch_format="pyarrow").union(
        edges.map_batches(_tag(1), batch_format="pyarrow"))

    def _close(tab: pa.Table) -> pa.Table:
        if not tab.num_rows:
            return pa.table({"n_tri": pa.array([0], pa.int64())})
        tab = tab.sort_by([("wa", "ascending"), ("wb", "ascending")])
        new = segment_starts(tab, ["wa", "wb"])
        seg = np.cumsum(new) - 1
        is_e = tab["is_edge"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        nw = pc.fill_null(tab["n_w"], 0).combine_chunks().to_numpy(
            zero_copy_only=False)
        n_seg = int(seg[-1]) + 1
        has_edge = np.bincount(seg, weights=is_e,
                               minlength=n_seg) > 0
        w_sum = np.bincount(seg, weights=nw, minlength=n_seg)
        tri = int(w_sum[has_edge].sum())
        return pa.table({"n_tri": pa.array([tri], pa.int64())})

    closed = bucketed_map_groups(tagged, ["wa", "wb"], _close,
                                 buckets=buckets, sort_within=False)
    n_tri = sum(r["n_tri"] for r in closed.take_all())
    trans = (3.0 * float(n_tri) / float(n_wedges)) if n_wedges else None
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "transitivity": pa.array([trans], pa.float64()),
    })


def bfs_hops(
    edges: "rd.Dataset", src_col: str = "src", dst_col: str = "dst", *,
    source_mod: int, rounds: int, inf: int = 1_000_000_000,
    weight_col: str | None = None,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Synchronous multi-source BFS hop distances over a DIRECTED
    edge list: ``rounds`` min-plus iterations of
    ``d(v) <- min(d(v), min_{(u,v) in E} d(u) + 1)`` applied
    simultaneously each round, from the deterministic source set
    ``{v : v % source_mod == 0}``.

    Like :func:`kcore`/:func:`label_propagation`, the contract is a
    FIXED round count, not "until fixpoint": the result is exactly
    reproducible and exactly SQL-mirrorable by one unrolled CTE per
    round at any scale (min-plus iteration is monotone, so rounds
    past convergence are no-ops; ``rounds`` bounds the reported
    hop radius).

    Unreached vertices carry the ``inf`` sentinel internally (never
    NULL — NULL arithmetic would diverge between engines) and are
    dropped from the output.  The contribution join each round takes
    ONLY the rows with ``d < inf`` — exact frontier pruning, since a
    ``d(u) = inf`` neighbor can never win the min; early rounds
    therefore ship the small reached set, not all of |V|.

    Scale shape per round: one ``broadcast="auto"`` join of the edge
    list against the reached set and one min-exchange on ``dst``; the
    driver holds no per-vertex data, the distance iterate is a
    materialized |V|-sized dataset.

    ``weight_col`` (int64 weights ≥ 0) turns the recurrence into
    synchronous Bellman–Ford — weighted single/multi-source shortest
    paths ``d(v) ← min(d(v), min d(u) + w(u,v))`` — with the same
    fixed-round, frontier-pruned, unrolled-CTE-mirrorable contract
    (non-negative weights keep min-plus monotone per round).

    Returns ``(v, d)`` for vertices with ``d < inf`` after the last
    round.
    """
    if rounds < 0:
        raise ValueError("bfs_hops: rounds must be >= 0")
    if source_mod < 1:
        raise ValueError("bfs_hops: source_mod must be >= 1")
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(cols)
    if weight_col is not None:
        def _wcheck(tab: pa.Table) -> pa.Table:
            w = pc.cast(tab[weight_col], pa.int64())
            if w.null_count:
                raise ValueError("bfs_hops: weights must not be null")
            if tab.num_rows and (pc.min(w).as_py() or 0) < 0:
                raise ValueError("bfs_hops: weights must be >= 0 "
                                 "(min-plus monotonicity)")
            return tab
        edges = edges.map_batches(_wcheck, batch_format="pyarrow")

    def _vert_partial(tab: pa.Table) -> pa.Table:
        v = pa.chunked_array([tab[src_col].combine_chunks(),
                              tab[dst_col].combine_chunks()])
        return pa.table({"v": v.combine_chunks().unique()})

    verts = bucketed_map_groups(
        edges.map_batches(_vert_partial, batch_format="pyarrow"),
        ["v"], lambda t: t.group_by(["v"]).aggregate([]),
        buckets=buckets, sort_within=False)

    def _seed(tab: pa.Table) -> pa.Table:
        v = tab["v"].combine_chunks().to_numpy(zero_copy_only=False)
        d = np.where(v % source_mod == 0, 0, inf).astype(np.int64)
        return pa.table({"v": tab["v"], "d": pa.array(d)})

    dist = verts.map_batches(_seed, batch_format="pyarrow").materialize()
    dsch = dist.schema(fetch_if_missing=False)
    if dsch is None:
        return dist          # empty graph: nothing to search
    vtype = dsch.base_schema.field("v").type
    # schema anchor for the contribution exchange: with NO reached
    # frontier (legal — e.g. zero sources this round) the contrib
    # dataset would otherwise be empty AND schema-less, and the
    # left_outer join below could not resolve its right-hand columns
    contrib_seed = rd.from_arrow(pa.table(
        {"v": pa.array([], vtype), "c": pa.array([], pa.int64())}))

    for _ in range(rounds):
        frontier = dist.map_batches(
            lambda t: t.filter(pc.less(t["d"], pa.scalar(inf, pa.int64()))),
            batch_format="pyarrow")
        j = hash_join(edges, frontier, on=src_col, right_on="v",
                      broadcast="auto")

        def _contrib(tab: pa.Table) -> pa.Table:
            step = (pa.scalar(1, pa.int64()) if weight_col is None
                    else pc.cast(tab[weight_col], pa.int64()))
            part = pa.table({"v": tab[dst_col],
                             "c": pc.add(tab["d"], step)})
            return agg_named(part, ["v"], [("c", "min")], ["c"])

        contrib = bucketed_map_groups(
            j.map_batches(_contrib, batch_format="pyarrow"),
            ["v"], lambda t: agg_named(t, ["v"], [("c", "min")], ["c"]),
            buckets=buckets, sort_within=False).union(contrib_seed)

        nxt = hash_join(dist, contrib, on="v", how="left_outer",
                        broadcast="auto")

        def _apply(tab: pa.Table) -> pa.Table:
            c = pc.fill_null(pc.cast(tab["c"], pa.int64()),
                             pa.scalar(inf, pa.int64()))
            return pa.table({"v": tab["v"],
                             "d": pc.min_element_wise(tab["d"], c)})

        dist = nxt.map_batches(_apply,
                               batch_format="pyarrow").materialize()

    return dist.map_batches(
        lambda t: t.filter(pc.less(t["d"], pa.scalar(inf, pa.int64()))),
        batch_format="pyarrow")


def link_prediction(
    edges: "rd.Dataset", *, min_common: int = 2,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Common-neighbor link prediction over a canonical undirected
    DISTINCT edge list ``(a, b)`` with ``a < b``: for every NON-edge
    vertex pair at distance 2, the common-neighbor count and the
    Adamic–Adar score

        ``AA(x, y) = Σ_{w ∈ N(x) ∩ N(y)} 1 / ln(deg(w))``

    with each middle-node term integer-quantized
    (``round_half_away(10^9 / ln(deg)) ``) before summation so the
    score is an exact int64 fold (a middle node always has
    ``deg ≥ 2``, so ``ln`` never vanishes).  Output: ``(x, y,
    common, aa_q)`` for pairs with ``common ≥ min_common``.

    Distribution: degrees fold from per-block partials and broadcast
    once (the degree table is O(vertices) — the same small-side
    assumption every AA formulation needs); wedge expansion groups by
    MIDDLE node (cost Σ deg², the triangle-census bound — orient or
    cap upstream if a celebrity vertex dominates); one pair exchange
    sums the per-wedge terms; existing edges leave via one anti-join.
    """
    import ray

    from . import round_half_away

    edges = edges.materialize()

    def _ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["a"].combine_chunks(), t["b"].combine_chunks()])})

    deg_parts: dict[int, int] = {}
    for t in ray.get(edges.map_batches(_ends, batch_format="pyarrow")
                     .map_batches(
            lambda tb: agg_named(
                tb.append_column("__one", pa.array(
                    np.ones(tb.num_rows, np.int64))),
                ["node"], [("__one", "sum")], ["d"]),
            batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows == 0 or "node" not in t.column_names:
            continue
        for nd, d in zip(t["node"].to_pylist(), t["d"].to_pylist()):
            deg_parts[nd] = deg_parts.get(nd, 0) + int(d)
    nodes = np.array(sorted(deg_parts), dtype=np.int64)
    degs = np.array([deg_parts[n] for n in nodes], dtype=np.int64)
    aa_q = np.where(
        degs >= 2,
        round_half_away(1e9 / np.log(degs.astype(np.float64)), 0),
        0).astype(np.int64)
    dref = ray.put((nodes, aa_q))

    def _dir(t: pa.Table) -> pa.Table:
        return pa.table({
            "mid": pa.concat_arrays([t["a"].combine_chunks(),
                                     t["b"].combine_chunks()]),
            "leaf": pa.concat_arrays([t["b"].combine_chunks(),
                                      t["a"].combine_chunks()])})

    def _wedges(tab: pa.Table, _d=dref) -> pa.Table:
        empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "common": pa.array([], pa.int64()),
                          "aa_q": pa.array([], pa.int64())})
        if tab.num_rows == 0:
            return empty
        nodes_v, aa_v = ray.get(_d)
        tab = tab.sort_by([("mid", "ascending"), ("leaf", "ascending")])
        new = segment_starts(tab, ["mid"])
        seg = np.cumsum(new) - 1
        counts = np.bincount(seg)
        firsts = np.flatnonzero(new)
        mid = tab["mid"].combine_chunks().to_numpy(
            zero_copy_only=False)
        leaf = tab["leaf"].combine_chunks().to_numpy(
            zero_copy_only=False)
        mid_aa = aa_v[np.searchsorted(nodes_v, mid[firsts])]
        out_x, out_y, out_a = [], [], []
        for g in np.flatnonzero(counts > 1):
            s, e = firsts[g], firsts[g] + counts[g]
            ls = leaf[s:e]
            ia, ib = np.triu_indices(len(ls), k=1)
            out_x.append(ls[ia])
            out_y.append(ls[ib])
            out_a.append(np.full(len(ia), mid_aa[g], np.int64))
        if not out_x:
            return empty
        x = np.concatenate(out_x)
        y = np.concatenate(out_y)
        return pa.table({
            "x": pa.array(x), "y": pa.array(y),
            "common": pa.array(np.ones(len(x), np.int64)),
            "aa_q": pa.array(np.concatenate(out_a))})

    wedges = bucketed_map_groups(
        edges.map_batches(_dir, batch_format="pyarrow"), ["mid"],
        _wedges, buckets=buckets, sort_within=False)
    summed = bucketed_map_groups(
        wedges, ["x", "y"],
        lambda t: agg_named(t, ["x", "y"],
                            [("common", "sum"), ("aa_q", "sum")],
                            ["common", "aa_q"]),
        buckets=buckets, sort_within=False)
    non_edges = hash_join(summed, edges, on=["x", "y"],
                          right_on=["a", "b"], how="left_anti",
                          broadcast="auto", buckets=buckets)
    return non_edges.map_batches(
        lambda t: t.filter(pc.greater_equal(t["common"], min_common)),
        batch_format="pyarrow")
