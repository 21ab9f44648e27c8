"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put``; every ``map_batches`` task computes a numpy matmul of
its batch against the broadcast matrix and emits only its local top-k
candidates, so the shuffle/merge moves O(n_queries * k * n_blocks)
rows, never the corpus.  The driver-side final merge is tiny.

Scale path: LSH-bucketed variant (random-hyperplane signs) that
restricts the matmul to rows sharing a hash bucket with the query —
same broadcast pattern, corpus scanned once, candidate sets bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a fixed-width list<float> column,
    zero-copy from the flat values buffer where possible."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    d = len(flat) // n
    return flat.to_numpy(zero_copy_only=False).astype(
        np.float64).reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_cosine_brute(
    ds: "rd.Dataset", vec_col: str, id_col: str,
    query_ids: list, *, k: int = 5,
) -> pa.Table:
    """Exact cosine top-k for each query id (queries are corpus rows,
    fetched once and broadcast).  Returns (query_id, neighbor_id, rank,
    score) — rank 1..k by descending cosine, ties broken by ascending
    neighbor id; the query row itself is included (rank 1, score 1)."""
    qset = pa.array(query_ids, type=pa.int64())
    q_tab_ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=qset)),
        batch_format="pyarrow")
    q_tab = pa.concat_tables(ray.get(q_tab_ds.to_arrow_refs()))
    q_tab = q_tab.sort_by([(id_col, "ascending")])
    qm = _normalize(_matrix(q_tab[vec_col]))
    qids = q_tab[id_col].to_numpy(zero_copy_only=False)
    q_ref = ray.put((qids, qm))

    def _topk(batch: pa.Table) -> pa.Table:
        # stateless task: q_ref resolves zero-copy from the object
        # store per task (no actor spawn — seconds on this hardware)
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        qids, qm = ray.get(q_ref)
        m = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = qm @ m.T                          # (nq, nb)
        nb = scores.shape[1]
        kk = min(k, nb)
        # local top-k per query (argpartition, then exact sort later)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        nq = len(qids)
        out_q = np.repeat(qids, kk)
        out_n = ids[part.ravel()]
        out_s = scores[np.repeat(np.arange(nq), kk), part.ravel()]
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _topk, batch_format="pyarrow")
    tab = pa.concat_tables(ray.get(cand.to_arrow_refs()))
    # final merge (tiny): global top-k per query, deterministic ordering
    tab = tab.sort_by([("query_id", "ascending"), ("score", "descending"),
                       ("neighbor_id", "ascending")])
    q = tab["query_id"].to_numpy(zero_copy_only=False)
    new = np.zeros(len(q), dtype=bool)
    if len(q):
        new[0] = True
        new[1:] = q[1:] != q[:-1]
    pos = np.arange(len(q)) - np.repeat(
        np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(q))))
    keep = pos < k
    tab = tab.filter(pa.array(keep))
    tab = tab.append_column("rank", pa.array((pos[keep] + 1).astype(np.int64)))
    return tab.select(["query_id", "neighbor_id", "rank", "score"])


def knn_cosine_lsh(
    ds: "rd.Dataset", vec_col: str, id_col: str,
    query_ids: list, *, k: int = 5, n_planes: int = 12, n_tables: int = 4,
    seed: int = 7,
) -> pa.Table:
    """Approximate cosine top-k: random-hyperplane LSH. A corpus row is
    a candidate for a query iff they share a signature in ANY of the
    ``n_tables`` hash tables; candidates are scored exactly.  Same
    broadcast + local-top-k merge shape as the brute-force baseline, but
    each batch scores only its bucket-colliding rows (the 100 TB path:
    candidate count per query is ~corpus/2^n_planes per table)."""
    qset = pa.array(query_ids, type=pa.int64())
    q_ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=qset)),
        batch_format="pyarrow")
    q_tab = pa.concat_tables(ray.get(q_ds.to_arrow_refs()))
    q_tab = q_tab.sort_by([(id_col, "ascending")])
    qm = _normalize(_matrix(q_tab[vec_col]))
    qids = q_tab[id_col].to_numpy(zero_copy_only=False)
    d = qm.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, d))
    powers = 1 << np.arange(n_planes)

    def _sig(m: np.ndarray) -> np.ndarray:
        """(n, n_tables) int signatures."""
        out = np.empty((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            out[:, t] = ((m @ planes[t].T) > 0) @ powers
        return out

    qsig = _sig(qm)
    q_ref = ray.put((qids, qm, qsig))

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        qids, qm, qsig = ray.get(q_ref)
        m = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = _sig(m)
        out_q, out_n, out_s = [], [], []
        # collide per table: (nq, nb) any-table signature match
        cand = np.zeros((len(qids), len(ids)), dtype=bool)
        for t in range(planes.shape[0]):
            cand |= qsig[:, t][:, None] == sig[:, t][None, :]
        for qi in range(len(qids)):
            sel = np.flatnonzero(cand[qi])
            if len(sel) == 0:
                continue
            sc = m[sel] @ qm[qi]
            kk = min(k, len(sel))
            part = np.argpartition(-sc, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_n.append(ids[sel[part]])
            out_s.append(sc[part])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n),
                                    type=pa.int64()),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _topk, batch_format="pyarrow")
    tab = pa.concat_tables(ray.get(cand.to_arrow_refs()))
    tab = tab.sort_by([("query_id", "ascending"), ("score", "descending"),
                       ("neighbor_id", "ascending")])
    q = tab["query_id"].to_numpy(zero_copy_only=False)
    new = np.zeros(len(q), dtype=bool)
    if len(q):
        new[0] = True
        new[1:] = q[1:] != q[:-1]
    pos = np.arange(len(q)) - np.repeat(
        np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(q))))
    keep = pos < k
    tab = tab.filter(pa.array(keep))
    tab = tab.append_column("rank", pa.array((pos[keep] + 1).astype(np.int64)))
    return tab.select(["query_id", "neighbor_id", "rank", "score"])


def embedding_near_dup_pairs(
    ds: "rd.Dataset", vec_col: str, id_col: str, *,
    cosine_threshold: float = 0.95, n_planes: int = 10, n_tables: int = 6,
    seed: int = 11, buckets: int | None = None, max_group: int = 1024,
) -> "rd.Dataset":
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    banding (shuffle on (table, signature)), exact cosine verification
    inside buckets.  Returns (id_a, id_b, cosine).

    Approximate-recall operator (the 100 TB path): only pairs that
    collide in some hash table are scored.  ``max_group`` caps a
    degenerate signature bucket (e.g. many zero vectors) so
    verification never goes O(m^2) on one group; such pairs almost
    surely collide in another, smaller bucket.  For the exact,
    oracle-checkable variant see
    :func:`embedding_near_dup_pairs_exact`."""
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        segment_starts)

    probe = ds.take_batch(1, batch_format="pyarrow")
    d = len(probe[vec_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, d))
    powers = 1 << np.arange(n_planes)

    def _sigs(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({
                "tbl": pa.array([], type=pa.int32()),
                "sig": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "vec": pa.array([], type=pa.list_(pa.float64(), d)),
            })
        m = _normalize(_matrix(tab[vec_col]))
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        # zero-copy fixed-size-list column from the flat values buffer
        # (never a Python list of rows)
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), type=pa.float64()), d)
        parts = []
        for t in range(n_tables):
            sig = ((m @ planes[t].T) > 0) @ powers
            parts.append(pa.table({
                "tbl": pa.array(np.full(len(ids), t, dtype=np.int32)),
                "sig": pa.array(sig.astype(np.int64)),
                id_col: pa.array(ids),
                "vec": vec_arr,
            }))
        return pa.concat_tables(parts)

    sig_ds = ds.select_columns([id_col, vec_col]).map_batches(
        _sigs, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("tbl", "ascending"), ("sig", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["tbl", "sig"])
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id)
        firsts = np.flatnonzero(new)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        m = np.asarray(tab["vec"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)).reshape(len(ids), -1 if len(ids) else 0)
        # per-size pair templates (star pairing for groups beyond
        # max_group) + row-wise dot products over bounded pair chunks
        # — no per-group Python work, no m x m matmuls, and no
        # unbounded candidate materialization.  The smaller chunk size
        # (vs the signature compares) bounds the fancy-index gather of
        # two dim-wide float rows per pair
        from .dedup import _group_pair_chunks
        out_a, out_b, out_c = [], [], []
        for a_i, b_i in _group_pair_chunks(counts, firsts, max_group,
                                           chunk=1 << 18):
            cos = np.einsum("ij,ij->i", m[a_i], m[b_i])
            keep = cos >= cosine_threshold
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_c.append(cos[keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "cosine": pa.array(np.concatenate(out_c)),
        })

    pairs = bucketed_map_groups(sig_ds, ["sig"], _pairs, buckets=buckets,
                                sort_within=False)

    def _dedup(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("cosine", "max")], ["cosine"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


@ray.remote(num_cpus=1)
def _pack_corpus(id_col: str, vec_col: str, *tabs: "pa.Table",
                 normalize: bool = True):
    """Assemble the (ids, matrix) broadcast in a worker — the O(n·d)
    corpus never transits the driver heap (module-level remote:
    defined once, not re-exported per call).  ``normalize=True`` for
    the cosine paths; ``False`` keeps raw vectors (Euclidean eps)."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:  # empty corpus: scoring loop sees 0 ids, emits 0
        return (np.empty(0, dtype=np.int64),
                np.empty((0, 1), dtype=np.float64))
    full = pa.concat_tables(tabs)
    ids = full[id_col].to_numpy(zero_copy_only=False)
    m = _matrix(full[vec_col])
    return ids, (_normalize(m) if normalize else m)


def embedding_near_dup_pairs_exact(
    ds: "rd.Dataset", vec_col: str, id_col: str, *,
    cosine_threshold: float = 0.4, round_digits: int = 4,
    col_tile: int = 16384,
) -> pa.Table:
    """EXACT all-pairs cosine near-duplicates: the normalized corpus is
    assembled ONCE in a worker task (its output ref is the broadcast —
    the O(n·d) matrix never transits the driver heap) and every
    ``map_batches`` task scores its rows against the full matrix (pairs
    emitted only where id_a < id_b, so each unordered pair is produced
    exactly once).  Returns (id_a, id_b, cosine) sorted, cosine rounded.

    Compute is O(n^2/tasks) and the broadcast is O(n*d) — exact
    verification for corpora whose embedding table fits the object
    store (~millions of vectors); above that, use the LSH variant
    (:func:`embedding_near_dup_pairs`) to generate candidates and this
    pattern on the candidate subset."""
    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    if not refs:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    corpus_ref = _pack_corpus.remote(id_col, vec_col, *refs)

    def _pairs_fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        from . import round_half_away
        all_ids_, all_m_ = ray.get(corpus_ref)
        bm = _normalize(_matrix(batch[vec_col]))
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        out_a, out_b, out_c = [], [], []
        # tile the corpus dimension: memory per tile is
        # nb x col_tile x 8B, never nb x n (a dense (batch, corpus)
        # matrix would be GBs at 1M vectors)
        for c0 in range(0, len(all_ids_), col_tile):
            cm = all_m_[c0:c0 + col_tile]
            cids = all_ids_[c0:c0 + col_tile]
            cos = bm @ cm.T
            ia, ib = np.nonzero(
                (cos >= cosine_threshold)
                & (bids[:, None] < cids[None, :]))
            if len(ia):
                out_a.append(bids[ia])
                out_b.append(cids[ib])
                out_c.append(cos[ia, ib])
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "cosine": pa.array(round_half_away(
                np.concatenate(out_c), round_digits),
                type=pa.float64()),
        })

    out = ds.select_columns([id_col, vec_col]).map_batches(
        _pairs_fn, batch_format="pyarrow")
    otabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tab = pa.concat_tables(otabs) if otabs else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "cosine": pa.array([], type=pa.float64())})
    return tab.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant: coarse k-means quantizer + probed search
# ---------------------------------------------------------------------------

def ivf_train(ds: "rd.Dataset", vec_col: str, *, n_clusters: int = 16,
              sample_rows: int = 4096, iters: int = 8,
              seed: int = 5) -> np.ndarray:
    """Train the coarse quantizer on a bounded sample (driver-side
    Lloyd iterations over <=sample_rows vectors; deterministic seeded
    init).  At 100 TB the sample is a limit() over the stream — the
    corpus is never materialized."""
    sample = ds.select_columns([vec_col]).limit(sample_rows)
    tabs = [t for t in ray.get(sample.to_arrow_refs()) if t.num_rows]
    m = _normalize(np.concatenate([_matrix(t[vec_col]) for t in tabs]))
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=min(n_clusters, len(m)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def _init_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """Content-keyed init ranking: 64-bit hash of (id, seed).  Rows with
    the k smallest hashes seed the centroids — deterministic regardless
    of block layout, partition count or cluster size (a ``limit()``
    sample is NOT: block order varies run to run)."""
    from ..state.sketches import _hash64
    return _hash64(ids.astype(np.uint64)
                   ^ np.uint64((seed * 0x9E3779B97F4A7C15)
                               & 0xFFFFFFFFFFFFFFFF))


def kmeans_fit(
    ds: "rd.Dataset", vec_col: str, *, id_col: str | None = None,
    n_clusters: int = 8, iters: int = 10, seed: int = 7,
    tol: float = 1e-6, materialize_input: bool = True,
) -> tuple[np.ndarray, list[float]]:
    """Distributed Lloyd's k-means over the WHOLE embedding column
    (unlike :func:`ivf_train`, which fits a coarse quantizer on a
    bounded sample).  Returns (centroids ``(k, d)``, per-iteration
    inertia history).

    Scale shape: each iteration broadcasts the centroids via
    ``ray.put`` and every batch emits one pre-aggregated partial of
    (per-cluster vector sum, count, sse) — k rows per block — so the
    driver reduce is O(k*d*blocks), never the corpus.
    ``materialize_input`` picks how the multi-pass input is served:

    - ``True`` (default): the projected vector column is materialized
      ONCE into the (spill-backed) object store and every iteration
      reads the cached blocks — right when the (n, d) column fits the
      cluster's aggregate store;
    - ``False``: every iteration re-executes the pruned scan from the
      source (column-projected parquet read) — the vector column never
      sits fully in the object store, trading ``iters`` re-reads for
      bounded memory.  The scale path when the embedding column alone
      outgrows the store.

    With ``id_col`` the seeded init is layout-independent
    (k-smallest-hash merge) — under ``materialize_input=False`` it also
    keeps the init independent of re-execution block order; without it
    the init falls back to a ``limit()`` sample, which depends on block
    completion order — pass ``id_col`` when reproducibility across runs
    matters.  Partials are summed in block order, so the float reduce
    is reproducible for a fixed block layout.
    """
    cols = [vec_col] if id_col is None else [id_col, vec_col]
    proj = ds.select_columns(cols)
    if materialize_input:
        proj = proj.materialize()
    if id_col is not None:
        # layout-independent seeded init: per-batch k-smallest-hash
        # candidates, tiny driver merge
        def _cand(tab: pa.Table) -> pa.Table:
            ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            h = _init_hash(ids, seed)
            sel = np.argsort(h)[:min(n_clusters, len(h))]
            # keep uint64 end-to-end: an int64 cast would wrap hashes
            # >= 2^63 negative and reorder the driver-side merge sort
            return pa.table({"h": pa.array(h[sel], type=pa.uint64()),
                             "vec": tab[vec_col].take(pa.array(sel))})

        cands = pa.concat_tables(
            [t for t in ray.get(proj.map_batches(
                _cand, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows]).sort_by([("h", "ascending")])
        centroids = _matrix(cands["vec"])[:n_clusters].copy()
    else:
        sample = proj.limit(max(4096, n_clusters * 64))
        tabs = [t for t in ray.get(sample.to_arrow_refs()) if t.num_rows]
        sm = np.concatenate([_matrix(t[vec_col]) for t in tabs])
        rng = np.random.default_rng(seed)
        centroids = sm[rng.choice(len(sm), size=min(n_clusters, len(sm)),
                                  replace=False)].copy()
    d = centroids.shape[1]
    history: list[float] = []
    for _ in range(iters):
        cref = ray.put(centroids)

        def _partial(tab: pa.Table, _c=cref) -> pa.Table:
            c = ray.get(_c)
            m = _matrix(tab[vec_col])
            if not len(m):
                return pa.table({
                    "cluster": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "sse": pa.array([], type=pa.float64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64()))})
            # squared L2 via the expansion: |x|^2 - 2 x.c + |c|^2
            d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) \
                + (c * c).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            sse_row = d2[np.arange(len(m)), assign]
            kk = len(c)
            counts = np.bincount(assign, minlength=kk)
            sse = np.bincount(assign, weights=sse_row, minlength=kk)
            # per-cluster vector sums via a segment reduce (stable sort
            # keeps row order inside each cluster, so the float sum
            # order matches the scatter it replaces); np.add.at is a
            # ~10x-slower element-at-a-time scatter on big blocks
            vsum = np.zeros((kk, c.shape[1]))
            order = np.argsort(assign, kind="stable")
            sa = assign[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(sa)) + 1])
            vsum[sa[starts]] = np.add.reduceat(m[order], starts, axis=0)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "sse": pa.array(sse),
                "vsum": pa.array(list(vsum)),
            })

        parts = [t for t in ray.get(
            proj.map_batches(_partial,
                             batch_format="pyarrow").to_arrow_refs())
            if t.num_rows]
        agg_n = np.zeros(len(centroids), dtype=np.int64)
        agg_sse = 0.0
        agg_sum = np.zeros((len(centroids), d))
        for t in parts:
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            agg_n[cl] += t["n"].to_numpy(zero_copy_only=False)
            agg_sse += float(np.sum(t["sse"].to_numpy(
                zero_copy_only=False)))
            agg_sum[cl] += np.stack(
                t["vsum"].to_numpy(zero_copy_only=False))
        history.append(agg_sse)
        nz = agg_n > 0
        new_c = centroids.copy()
        new_c[nz] = agg_sum[nz] / agg_n[nz, None]
        shift = float(np.abs(new_c - centroids).max())
        centroids = new_c
        if shift < tol:
            break
    return centroids, history


def kmeans_assign(
    ds: "rd.Dataset", vec_col: str, id_col: str,
    centroids: np.ndarray,
) -> "rd.Dataset":
    """Stamp each row with its nearest centroid: ``(id, cluster,
    distance)``.  Centroids are broadcast once; one streaming pass."""
    cref = ray.put(centroids)

    def _assign(tab: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _matrix(tab[vec_col])
        if not len(m):
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "distance": pa.array([], type=pa.float64())})
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) \
            + (c * c).sum(axis=1)[None, :]
        assign = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(m)), assign], 0.0))
        return pa.table({
            id_col: tab[id_col],
            "cluster": pa.array(assign.astype(np.int64)),
            "distance": pa.array(dist),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        _assign, batch_format="pyarrow")


def knn_cosine_ivf(
    ds: "rd.Dataset", vec_col: str, id_col: str, query_ids: list, *,
    k: int = 5, centroids: np.ndarray | None = None, n_probe: int = 4,
    n_clusters: int = 16,
) -> pa.Table:
    """Approximate cosine top-k via IVF: rows are scored only when their
    nearest centroid is among the query's ``n_probe`` probed cells.
    Same broadcast + per-batch local-top-k + tiny driver merge shape as
    the brute-force baseline; the matmul per batch shrinks to the
    probed fraction (~n_probe/n_clusters of the corpus)."""
    if centroids is None:
        centroids = ivf_train(ds, vec_col, n_clusters=n_clusters)
    qset = pa.array(query_ids, type=pa.int64())
    q_ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=qset)),
        batch_format="pyarrow")
    q_tab = pa.concat_tables(ray.get(q_ds.to_arrow_refs()))
    q_tab = q_tab.sort_by([(id_col, "ascending")])
    qm = _normalize(_matrix(q_tab[vec_col]))
    qids = q_tab[id_col].to_numpy(zero_copy_only=False)
    # per-query probed cells
    qcells = np.argsort(-(qm @ centroids.T), axis=1)[:, :n_probe]
    q_ref = ray.put((qids, qm, qcells, centroids))

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        qids, qm, qcells, cents = ray.get(q_ref)
        m = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cell = np.argmax(m @ cents.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            sel = np.flatnonzero(np.isin(cell, qcells[qi]))
            if not len(sel):
                continue
            sc = m[sel] @ qm[qi]
            kk = min(k, len(sel))
            part = np.argpartition(-sc, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_n.append(ids[sel[part]])
            out_s.append(sc[part])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n),
                                    type=pa.int64()),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _topk, batch_format="pyarrow")
    tab = pa.concat_tables(ray.get(cand.to_arrow_refs()))
    tab = tab.sort_by([("query_id", "ascending"), ("score", "descending"),
                       ("neighbor_id", "ascending")])
    q = tab["query_id"].to_numpy(zero_copy_only=False)
    new = np.zeros(len(q), dtype=bool)
    if len(q):
        new[0] = True
        new[1:] = q[1:] != q[:-1]
    pos = np.arange(len(q)) - np.repeat(
        np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(q))))
    keep = pos < k
    tab = tab.filter(pa.array(keep))
    tab = tab.append_column("rank", pa.array((pos[keep] + 1).astype(np.int64)))
    return tab.select(["query_id", "neighbor_id", "rank", "score"])


def quantize_embeddings(
    ds: "rd.Dataset", vec_col: str, id_col: str, *, bits: int = 8,
    flatten: bool = False,
) -> "rd.Dataset":
    """Symmetric per-vector integer quantization of an embedding
    column — the memory-compression stage in front of a large-scale
    ANN index (4x smaller than float32 at 8 bits, dot products stay
    SIMD-friendly).  Each vector scales by its own max-|x| so the
    code range is fully used: ``code = round(x / max|x| · (2^(b-1)-1))``
    (half-AWAY, SQL ROUND semantics), ``scale = max|x| / (2^(b-1)-1)``
    reconstructs ``x ≈ code · scale``.

    Embarrassingly parallel — one vectorized pass over the flat
    values buffer (no per-vector Python): the per-vector max comes
    from one ``np.maximum.reduceat``; an all-zero vector quantizes to
    all-zero codes with scale 0.  Output ``(id, codes list<int8>,
    scale)`` or, with ``flatten=True``, the exploded
    ``(id, dim, code, scale)`` rows (dim is 0-based) for engines that
    compare flat tables."""
    if not 2 <= bits <= 8:
        raise ValueError("bits must be in [2, 8]")
    qmax = float(2 ** (bits - 1) - 1)

    def _quant(tab: pa.Table) -> pa.Table:
        from . import round_half_away

        n = tab.num_rows
        col = tab[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if n == 0:
            empty_codes = pa.array([], type=pa.list_(pa.int8()))
            if flatten:
                return pa.table({
                    id_col: pa.array([], type=tab[id_col].type),
                    "dim": pa.array([], type=pa.int64()),
                    "code": pa.array([], type=pa.int8()),
                    "scale": pa.array([], type=pa.float64())})
            return pa.table({
                id_col: tab[id_col], "codes": empty_codes,
                "scale": pa.array([], type=pa.float64())})
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # rebuild offsets from per-row VALID lengths: flatten() emits
        # only non-null rows' values, and raw col.offsets would both
        # misalign against that and put a trailing-empty row's start
        # out of reduceat's range
        valid_row = col.is_valid().to_numpy(zero_copy_only=False) \
            .astype(bool)
        lens = pc.list_value_length(col).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.where(valid_row, lens, 0)
        offs = np.concatenate([[0], np.cumsum(lens)])
        starts = offs[:-1]
        mx = np.zeros(n, dtype=np.float64)
        nz = lens > 0
        if nz.any():
            mx[nz] = np.maximum.reduceat(np.abs(flat), starts[nz])
        denom = np.where(mx > 0, mx, 1.0)
        codes = round_half_away(
            flat / np.repeat(denom, lens) * qmax, 0).astype(np.int8)
        scale = np.where(mx > 0, mx / qmax, 0.0)
        if flatten:
            # null/empty vectors emit no rows (SQL UNNEST semantics)
            dims = np.arange(len(flat), dtype=np.int64) \
                - np.repeat(starts, lens)
            return pa.table({
                id_col: tab[id_col].take(pa.array(
                    np.repeat(np.arange(n), lens))),
                "dim": pa.array(dims),
                "code": pa.array(codes),
                "scale": pa.array(np.repeat(scale, lens))})
        # a null input vector stays NULL (codes and scale)
        off_mask = np.concatenate([~valid_row, [False]])
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32(), mask=off_mask),
            pa.array(codes))
        return pa.table({
            id_col: tab[id_col], "codes": lists,
            "scale": pa.array(scale, mask=~valid_row)})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _quant, batch_format="pyarrow")


def pca_fit(ds: "rd.Dataset", vec_col: str, *, k: int,
            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA fit over an embedding column: returns
    ``(mean, components, explained_ratio)`` — the top-``k`` principal
    axes (rows of ``components``, descending eigenvalue order) of the
    sample covariance, and each axis's share of total variance.

    Scale shape: every block reduces to the exact moment partials
    ``(n, Σx, ΣxᵀX)`` — O(d²) floats per block regardless of rows —
    and the driver merges |blocks| partials and eigendecomposes the
    d×d covariance locally (d is the embedding width; the n×d corpus
    never moves).  Signs are normalized (each component's
    largest-|coefficient| entry is positive) so the fit is
    deterministic up to eigenvalue ties.  The whitening /
    dim-reduction step is then a broadcast matmul inside
    ``map_batches`` (see :func:`pca_project`)."""
    def _partial(tab: pa.Table) -> pa.Table:
        m = _matrix(tab[vec_col])
        if m.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "ss": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0)],
                          pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel()],
                           pa.list_(pa.float64()))})

    rows = ds.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    rows = [r for r in rows if r["n"]]
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = len(s)
    ss = np.sum([np.asarray(r["ss"]) for r in rows],
                axis=0).reshape(d, d)
    if n < 2:
        raise ValueError("pca_fit needs >= 2 rows")
    if not 1 <= k <= d:
        raise ValueError(f"k={k} outside [1, d={d}]")
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # (k, d)
    top = np.abs(comps).argmax(axis=1)
    flip = np.sign(comps[np.arange(len(comps)), top])
    comps = comps * flip[:, None]
    total = float(np.clip(evals.sum(), 1e-300, None))
    return mean, comps, evals[order] / total


def pca_project(ds: "rd.Dataset", vec_col: str, id_col: str,
                mean: np.ndarray, components: np.ndarray,
                *, out_col: str = "pc") -> "rd.Dataset":
    """Project every row onto the fitted axes: one broadcast matmul
    per batch (``(X - mean) @ componentsᵀ``), no exchange; output
    ``(id, pc list<double>)``."""
    import ray
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    def _proj(tab: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        m = _matrix(tab[vec_col])
        p = (m - mu[None, :]) @ c.T if m.size else \
            np.zeros((0, c.shape[0]))
        return pa.table({id_col: tab[id_col],
                         out_col: pa.array(list(p),
                                           pa.list_(pa.float64()))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _proj, batch_format="pyarrow")


def mmr_select(
    ds: "rd.Dataset", vec_col: str, id_col: str, *,
    k: int = 8, quant: int = 64, rel_num: int = 1, div_num: int = 2,
) -> pa.Table:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998) in EXACT INTEGER arithmetic: pick ``k`` rows that
    are individually strong but mutually diverse —

    - vectors quantize once as ``q = floor(v * quant)`` per component
      (float32 * power-of-two is exact, so engine and SQL agree
      bit-for-bit);
    - relevance(c) = q(c)·q(c) (integer squared norm);
    - step score(c) = rel_num·relevance(c)
      − div_num·max_{s∈selected} q(c)·q(s), argmax with ties broken
      by ascending id; step 1 has no diversity term.

    The greedy argmax is inherently sequential in k, but each step is
    ONE distributed pass: the ≤k selected vectors broadcast via
    ``ray.put``, every block emits its local best row, the driver
    reduces the per-block winners (O(blocks) rows, never the corpus).
    The quantized corpus is materialized once and re-scanned k times.

    Returns a pa.Table ``(step, vec_id, score)`` — step 1..k (fewer
    if the corpus runs out).  Overflow headroom: |q·q| ≤
    dim·(quant·max|v|)², keep ``quant`` modest for large dims."""
    def _quant(tab: pa.Table) -> pa.Table:
        m = _matrix(tab[vec_col])
        q = np.floor(m * quant).astype(np.int64)
        rel = (q * q).sum(axis=1)
        return pa.table({
            "vec_id": pc.cast(tab[id_col], pa.int64()),
            "q": pa.array(list(q), pa.list_(pa.int64())),
            "rel": pa.array(rel)})

    qds = ds.select_columns([id_col, vec_col]).map_batches(
        _quant, batch_format="pyarrow").materialize()

    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    out_steps, out_ids, out_scores = [], [], []
    for step in range(1, k + 1):
        ref = ray.put((np.array(sel_ids, dtype=np.int64),
                       np.stack(sel_vecs) if sel_vecs else None))

        def _best(tab: pa.Table, _ref=ref) -> pa.Table:
            ids_sel, mat_sel = ray.get(_ref)
            ids = tab["vec_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            rel = tab["rel"].combine_chunks().to_numpy(
                zero_copy_only=False)
            q = _matrix(tab["q"]).astype(np.int64)
            keep = ~np.isin(ids, ids_sel)
            if not keep.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.int64()),
                                 "q": pa.array([], pa.list_(pa.int64()))})
            score = rel_num * rel
            if mat_sel is not None:
                score = score - div_num * (q @ mat_sel.T).max(axis=1)
            # argmax over the non-selected rows, ties by ascending id
            # — drop masked rows BEFORE sorting (an int64-min
            # sentinel would wrap under negation and sort first)
            cand = np.flatnonzero(keep)
            order = np.lexsort((ids[cand], -score[cand]))
            b = cand[order[0]]
            return pa.table({
                "vec_id": pa.array([ids[b]], pa.int64()),
                "score": pa.array([int(score[b])], pa.int64()),
                "q": pa.array([q[b]], pa.list_(pa.int64()))})

        tabs = [t for t in ray.get(
            qds.map_batches(_best,
                            batch_format="pyarrow").to_arrow_refs())
            if t.num_rows]
        if not tabs:                   # corpus exhausted before k
            break
        winners = pa.concat_tables(tabs)
        ws = winners["score"].to_numpy(zero_copy_only=False)
        wi = winners["vec_id"].to_numpy(zero_copy_only=False)
        b = int(np.lexsort((wi, -ws))[0])
        sel_ids.append(int(wi[b]))
        sel_vecs.append(np.asarray(winners["q"][b].as_py(),
                                   dtype=np.int64))
        out_steps.append(step)
        out_ids.append(int(wi[b]))
        out_scores.append(int(ws[b]))
    return pa.table({"step": pa.array(out_steps, pa.int64()),
                     "vec_id": pa.array(out_ids, pa.int64()),
                     "score": pa.array(out_scores, pa.int64())})


# ---------------------------------------------------------------------------
# Product quantization: the memory side of ANN at 10^12 vectors
# ---------------------------------------------------------------------------

def pq_fit(
    ds: "rd.Dataset", vec_col: str, *, id_col: str,
    m: int = 8, n_centroids: int = 16, iters: int = 20,
    sample_size: int = 16_384, seed: int = 7,
) -> np.ndarray:
    """Fit product-quantization codebooks (Jégou et al. 2011): split
    ``d`` dims into ``m`` subspaces and k-means each subspace to
    ``n_centroids`` codewords.  Returns ``(m, n_centroids, d//m)``.

    Codebooks are fit on a DETERMINISTIC content-keyed sample (the
    ``sample_size`` smallest id hashes — layout-independent, per-block
    partial top-k then a tiny driver merge), the standard PQ practice:
    codebook quality saturates long before the corpus is exhausted,
    and the full corpus is touched only by the single-pass
    :func:`pq_encode`.  The per-subspace Lloyd runs locally on the
    sample (vectorized numpy; deterministic seeded init), so the fit
    is bit-reproducible at any parallelism."""
    from .dedup import _hash64  # seeded splitmix over ids

    def _cand(tab: pa.Table) -> pa.Table:
        ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        h = _hash64(ids.astype(np.uint64)
                    ^ np.uint64(seed * 0x9E3779B97F4A7C15
                                & 0xFFFFFFFFFFFFFFFF))
        sel = np.argsort(h)[:min(sample_size, len(h))]
        return pa.table({"h": pa.array(h[sel], type=pa.uint64()),
                         "vec": tab[vec_col].take(pa.array(sel))})

    tabs = [t for t in ray.get(
        ds.select_columns([id_col, vec_col]).map_batches(
            _cand, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not tabs:
        raise ValueError("pq_fit: empty input")
    cand = pa.concat_tables(tabs).sort_by([("h", "ascending")])
    X = _matrix(cand["vec"])[:sample_size]
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_centroids, dsub))
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        k = min(n_centroids, len(S))
        C = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            newC = C.copy()
            for c in range(k):          # k tiny (16–256)
                mask = a == c
                if mask.any():
                    newC[c] = S[mask].mean(axis=0)
            if np.abs(newC - C).max() < 1e-9:
                C = newC
                break
            C = newC
        books[j, :k] = C
        if k < n_centroids:             # degenerate small sample: pad
            books[j, k:] = C[0]
    return books


def _pq_codes_matrix(tab: pa.Table, code_col: str, m: int) -> np.ndarray:
    """(n, m) uint8 code matrix, zero-copy from the flat binary
    buffer (every code is exactly m bytes)."""
    from .dedup import _utf8_buffers
    codes = tab[code_col]
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    _offsets, data = _utf8_buffers(codes)
    return data.reshape(-1, m)


def pq_encode(
    ds: "rd.Dataset", vec_col: str, id_col: str,
    codebooks: np.ndarray, *, code_col: str = "pq_code",
) -> "rd.Dataset":
    """One-pass PQ encoding: ``(id, pq_code)`` with the code an
    ``m``-byte binary (one codeword index per subspace) — a 64-dim
    float32 vector compresses 32× to 8 bytes.  The codebooks ride the
    object store ONCE (``ray.put``); each batch is an argmin over
    ``m`` small matmuls, no shuffle."""
    m, k, dsub = codebooks.shape
    cref = ray.put(codebooks)

    def _enc(tab: pa.Table, _c=cref) -> pa.Table:
        books = ray.get(_c)
        X = _matrix(tab[vec_col])
        n = len(X)
        out = np.zeros((n, m), dtype=np.uint8)
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            C = books[j]
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C * C).sum(1)[None, :]
            out[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: tab[id_col],
            "pq_code": pa.array([r.tobytes() for r in out],
                                type=pa.binary())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _enc, batch_format="pyarrow")


def pq_mse(ds: "rd.Dataset", vec_col: str,
           codebooks: np.ndarray) -> float:
    """Mean squared reconstruction error of the PQ code over the
    corpus — per-block scalar partials, driver folds O(blocks)."""
    m, k, dsub = codebooks.shape
    cref = ray.put(codebooks)

    def _p(tab: pa.Table, _c=cref) -> pa.Table:
        books = ray.get(_c)
        X = _matrix(tab[vec_col])
        sse = 0.0
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            C = books[j]
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C * C).sum(1)[None, :]
            sse += float(np.maximum(d2.min(axis=1), 0.0).sum())
        return pa.table({"sse": pa.array([sse]),
                         "n": pa.array([len(X)], pa.int64())})

    parts = [t for t in ray.get(
        ds.select_columns([vec_col]).map_batches(
            _p, batch_format="pyarrow").to_arrow_refs()) if t.num_rows]
    tot = sum(t["sse"][0].as_py() for t in parts)
    n = sum(t["n"][0].as_py() for t in parts)
    return tot / max(n, 1)


def pq_topk_adc(
    codes: "rd.Dataset", id_col: str, codebooks: np.ndarray,
    queries: np.ndarray, *, k: int = 5, code_col: str = "pq_code",
) -> dict[int, list[tuple]]:
    """Asymmetric-distance top-k over PQ codes: per query, a
    ``(m, n_centroids)`` lookup table of exact query-subvector →
    codeword squared distances is built ONCE on the driver and
    broadcast; scoring a code is ``m`` table lookups — no float
    vector is ever read again.  Each batch emits its local top-k per
    query; the driver merges O(n_queries · k · blocks) rows.
    Returns {query_index: [(id, approx_d2), ...]}."""
    m, nc, dsub = codebooks.shape
    nq, d = queries.shape
    lut = np.zeros((nq, m, nc))
    for j in range(m):
        Qs = queries[:, j * dsub:(j + 1) * dsub]
        C = codebooks[j]
        lut[:, j, :] = (Qs * Qs).sum(1)[:, None] - 2.0 * (Qs @ C.T) \
            + (C * C).sum(1)[None, :]
    lref = ray.put(lut)

    def _score(tab: pa.Table, _l=lref) -> pa.Table:
        L = ray.get(_l)
        cm = _pq_codes_matrix(tab, code_col, m)
        ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        qi, oi, dd = [], [], []
        cols = np.arange(m)
        for q in range(len(L)):
            s = L[q][cols[None, :], cm].sum(axis=1)
            top = np.argsort(s, kind="stable")[:k]
            qi.extend([q] * len(top))
            oi.extend(ids[top].tolist())
            dd.extend(s[top].tolist())
        return pa.table({"q": pa.array(qi, pa.int64()),
                         "id": pa.array(oi, pa.int64()),
                         "d2": pa.array(dd, pa.float64())})

    parts = [t for t in ray.get(codes.map_batches(
        _score, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    out: dict[int, list] = {q: [] for q in range(nq)}
    if parts:
        allp = pa.concat_tables(parts)
        qs = allp["q"].to_numpy(zero_copy_only=False)
        ids = allp["id"].to_numpy(zero_copy_only=False)
        d2 = allp["d2"].to_numpy(zero_copy_only=False)
        for q in range(nq):
            mask = qs == q
            order = np.lexsort((ids[mask], d2[mask]))[:k]
            out[q] = list(zip(ids[mask][order].tolist(),
                              d2[mask][order].tolist()))
    return out


# ---------------------------------------------------------------------------
# Density clustering (DBSCAN) composed from the engine's primitives
# ---------------------------------------------------------------------------

def eps_neighbor_pairs(
    ds: "rd.Dataset", vec_col: str, id_col: str, *, eps: float,
) -> "rd.Dataset":
    """EXACT Euclidean eps-ball pairs ``(id_a < id_b, dist ≤ eps)``:
    the corpus matrix is assembled once in a worker task and
    broadcast; every batch scores its rows against it (same pattern
    as :func:`embedding_near_dup_pairs_exact`).  O(n²/tasks) compute —
    the verification-scale path; for web-scale candidate generation
    use the LSH variant over normalized vectors (L2² = 2−2·cos)."""
    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})
    if not refs:
        return rd.from_arrow(empty)
    corpus_ref = _pack_corpus.remote(id_col, vec_col, *refs,
                                     normalize=False)
    e2 = float(eps) * float(eps)

    def _pairs_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids_all, M = ray.get(corpus_ref)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        X = _matrix(batch[vec_col])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ M.T) \
            + (M * M).sum(1)[None, :]
        hit = d2 <= e2 + 1e-12
        li, gi = np.nonzero(hit)
        a, b = ids[li], ids_all[gi]
        keep = a < b
        return pa.table({"id_a": pa.array(a[keep]),
                         "id_b": pa.array(b[keep])})

    return ds.map_batches(_pairs_fn, batch_format="pyarrow")


def eps_neighbor_pairs_lsh(
    ds: "rd.Dataset", vec_col: str, id_col: str, *, eps: float,
    n_hashes: int = 2, n_tables: int = 8, w_factor: float = 4.0,
    seed: int = 23, buckets: int | None = None,
    max_group: int = 4096,
) -> "rd.Dataset":
    """Approximate Euclidean eps-ball pairs ``(id_a < id_b)`` via
    p-stable LSH (E2LSH, Datar et al. 2004): per table a key is the
    concatenation of ``n_hashes`` quantized projections
    ``⌊(a·x + b) / w⌋`` with Gaussian ``a``, uniform offset ``b`` and
    bucket width ``w = w_factor · eps``; rows sharing a key in ANY
    table are candidates, exact-verified (``d² ≤ eps²``) inside the
    bucket.  Precision 1.0 by construction; per-pair recall at
    distance eps is ``1 − (1 − p^n_hashes)^n_tables`` with
    ``p = P[⌊·⌋ collision] ≈ 0.84`` at ``w = 4·eps`` — ≥ 0.9999 at
    the defaults.

    This is the 100 TB candidate path for :func:`dbscan`: the corpus
    matrix is NEVER packed into a worker or broadcast (contrast
    :func:`eps_neighbor_pairs`, the exact verification-scale twin) —
    band rows shuffle by key, pair generation is bucket-local with
    ``max_group``-capped degenerate buckets, and a second small
    exchange makes the pair list globally distinct."""
    from ..pipelines.relational import bucketed_map_groups
    from .dedup import _group_pair_chunks

    empty_pairs = pa.table({"id_a": pa.array([], type=pa.int64()),
                            "id_b": pa.array([], type=pa.int64())})
    try:
        probe = ds.take_batch(1, batch_format="pyarrow")
    except ValueError:
        # empty corpus: same contract as the exact path's
        # `if not refs` guard — no pairs, not an error
        return rd.from_arrow(empty_pairs)
    d = len(probe[vec_col][0])
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n_tables, n_hashes, d))
    w = float(w_factor) * float(eps)
    B = rng.uniform(0.0, w, size=(n_tables, n_hashes))
    # per-(table, hash) odd multipliers fold the quantized tuple into
    # one int64 key (wraparound mix; spurious cross-tuple collisions
    # only add candidates, which the exact verify removes)
    mix = (rng.integers(1, 1 << 62, size=(n_tables, n_hashes),
                        dtype=np.int64) | 1)
    e2 = float(eps) * float(eps)

    def _keys(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({
                "tbl": pa.array([], type=pa.int32()),
                "key": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "vec": pa.array([], type=pa.list_(pa.float64(), d)),
            })
        m = _matrix(tab[vec_col]).astype(np.float64, copy=False)
        ids = pc.cast(tab[id_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), type=pa.float64()), d)
        parts = []
        for t in range(n_tables):
            u = np.floor((m @ A[t].T + B[t]) / w).astype(np.int64)
            key = (u * mix[t]).sum(axis=1, dtype=np.int64)
            parts.append(pa.table({
                "tbl": pa.array(np.full(len(ids), t, dtype=np.int32)),
                "key": pa.array(key),
                id_col: pa.array(ids),
                "vec": vec_arr,
            }))
        return pa.concat_tables(parts)

    key_ds = ds.select_columns([id_col, vec_col]).map_batches(
        _keys, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if tab.num_rows == 0:
            return empty
        tab = tab.sort_by([("tbl", "ascending"), ("key", "ascending"),
                           (id_col, "ascending")])
        from ..pipelines.relational import segment_starts
        new = segment_starts(tab, ["tbl", "key"])
        counts = np.bincount(np.cumsum(new) - 1)
        firsts = np.flatnonzero(new)
        ids = tab[id_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        m = np.asarray(tab["vec"].combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)) \
            .reshape(len(ids), -1 if len(ids) else 0)
        out_a, out_b = [], []
        for a_i, b_i in _group_pair_chunks(counts, firsts, max_group,
                                           chunk=1 << 18):
            diff = m[a_i] - m[b_i]
            d2 = np.einsum("ij,ij->i", diff, diff)
            keep = (d2 <= e2 + 1e-12) & (ids[a_i] != ids[b_i])
            a, b = ids[a_i[keep]], ids[b_i[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64))})

    pairs = bucketed_map_groups(key_ds, ["key"], _pairs,
                                buckets=buckets, sort_within=False)

    def _distinct(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab
        tab = tab.sort_by([("id_a", "ascending"),
                           ("id_b", "ascending")])
        from ..pipelines.relational import segment_starts
        firsts = np.flatnonzero(segment_starts(tab, ["id_a", "id_b"]))
        return tab.take(pa.array(firsts))

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _distinct,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


@ray.remote(num_cpus=1)
def _dbscan_local_labels(min_pts: int, *tabs: pa.Table) -> pa.Table:
    """Single-task DBSCAN labeling over a small eps-ball pair list:
    (node, cluster, core) for every node APPEARING in a pair — the
    deterministic rule of the distributed path (cluster = component
    minimum core id; border joins its minimum neighboring core's
    cluster; else noise -1).  Vectorized throughout."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    from .dedup import _cc_local

    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return pa.table({"node": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "core": pa.array([], pa.bool_())})
    tab = pa.concat_tables(tabs)
    a = pc.cast(tab["id_a"], pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(tab["id_b"], pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    deg = (np.bincount(ia, minlength=len(nodes))
           + np.bincount(ib, minlength=len(nodes)))
    core = deg + 1 >= min_pts          # a point counts itself
    cluster = np.full(len(nodes), -1, dtype=np.int64)

    cc_m = core[ia] & core[ib]
    if cc_m.any():
        cc = _cc_local("id_a", "id_b", pa.table(
            {"id_a": pa.array(nodes[ia[cc_m]]),
             "id_b": pa.array(nodes[ib[cc_m]])}))
        cn = cc["node"].to_numpy(zero_copy_only=False)
        cr = cc["rep"].to_numpy(zero_copy_only=False)
        cluster[np.searchsorted(nodes, cn)] = cr
    # isolated cores: their own singleton cluster
    iso = core & (cluster < 0)
    cluster[iso] = nodes[iso]
    # border: non-core with >= 1 core neighbor -> min neighboring
    # core's cluster (evaluate both edge directions)
    na = np.concatenate([ia, ib])
    nb = np.concatenate([ib, ia])
    bm = ~core[na] & core[nb]
    if bm.any():
        bmin = np.full(len(nodes), np.iinfo(np.int64).max,
                       dtype=np.int64)
        np.minimum.at(bmin, na[bm], cluster[nb[bm]])
        hit = bmin != np.iinfo(np.int64).max
        cluster[hit] = bmin[hit]
    return pa.table({"node": pa.array(nodes),
                     "cluster": pa.array(cluster),
                     "core": pa.array(core)})


def dbscan(
    ds: "rd.Dataset", vec_col: str, id_col: str, *,
    eps: float, min_pts: int = 4, buckets: int | None = None,
    local_max_bytes: int | None = None,
    method: str = "exact", candidates: "rd.Dataset | None" = None,
    lsh_params: dict | None = None,
) -> "rd.Dataset":
    """Distributed DBSCAN over an embedding column: returns
    ``(id, cluster, is_core)`` — cluster is the component's minimum
    core id, ``-1`` for noise.  Composed ENTIRELY from the engine's
    own primitives, each with its documented scale shape:

    1. eps-ball edge list — pluggable candidate stage:
       ``method="exact"`` (default) uses :func:`eps_neighbor_pairs`
       (exact O(n²/tasks), packs + broadcasts the corpus matrix —
       the parity/verification path), ``method="lsh"`` uses
       :func:`eps_neighbor_pairs_lsh` (p-stable E2LSH banding,
       ``lsh_params`` forwarded — the corpus-scale path: no matrix
       pack, no broadcast), or pass ``candidates=`` directly — a
       precomputed Dataset of exact-verified ``(id_a, id_b)``
       eps-pairs (``id_a < id_b``, distinct),
    2. per-node degree via one ``group_agg`` exchange (a point counts
       itself, sklearn's ``min_samples`` convention) → core mask,
    3. core–core edges → ``connected_components`` (hash-to-min,
       O(log n) rounds) → cluster reps; an isolated core is its own
       singleton cluster,
    4. border points (non-core with a core neighbor) join to the
       MINIMUM neighboring core's cluster — deterministic where
       sklearn's is scan-order-dependent,
    5. everything else is noise.

    Driver state: O(1) — membership never leaves the cluster."""
    from ..pipelines.relational import group_agg, hash_join
    from .dedup import connected_components

    # UDF projection, NOT select_columns: Ray's Project can report the
    # UNPROJECTED schema for a dataset with empty blocks while
    # delivering projected blocks — the bucketed join would then
    # demand a column the blocks legitimately lack
    ids_only = ds.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")
    if candidates is not None:
        pairs = candidates.materialize()
    elif method == "lsh":
        pairs = eps_neighbor_pairs_lsh(
            ds, vec_col, id_col, eps=eps,
            **(lsh_params or {})).materialize()
    elif method == "exact":
        pairs = eps_neighbor_pairs(ds, vec_col, id_col,
                                   eps=eps).materialize()
    else:
        raise ValueError(f"unknown dbscan method {method!r}")

    # Adaptive small-graph path (same policy as connected_components):
    # the materialized eps-ball pair list already tells us its size —
    # when it fits one worker heap, degrees + core mask + components +
    # border assignment collapse into ONE task over the pair list, and
    # the corpus is touched by a single broadcast-labeling pass.  The
    # big path below (one exchange per stage) is untouched for graphs
    # that don't fit.
    from .dedup import LOCAL_CC_MAX_BYTES
    if local_max_bytes is None:
        local_max_bytes = LOCAL_CC_MAX_BYTES // 4
    if (pairs.size_bytes() or 0) <= local_max_bytes:
        prefs = list(pairs.to_arrow_refs())
        lab_ref = _dbscan_local_labels.remote(min_pts, *prefs) \
            if prefs else None
        lab_tab = ray.get(lab_ref) if lab_ref is not None else \
            pa.table({"node": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64()),
                      "core": pa.array([], pa.bool_())})
        lref = ray.put(lab_tab)

        def _attach(t: pa.Table, _l=lref) -> pa.Table:
            lab = ray.get(_l)
            nodes = lab["node"].to_numpy(zero_copy_only=False)
            clus = lab["cluster"].to_numpy(zero_copy_only=False)
            corem = lab["core"].to_numpy(zero_copy_only=False)
            ids = pc.cast(t[id_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(nodes, ids).clip(
                max=max(len(nodes) - 1, 0))
            hit = (nodes[pos] == ids) if len(nodes) else \
                np.zeros(len(ids), dtype=bool)
            # a point absent from the pair list is noise — unless
            # min_pts <= 1, where every point is core and an isolated
            # one is its own singleton cluster
            miss_cluster = ids if min_pts <= 1 else \
                np.full(len(ids), -1, dtype=np.int64)
            cluster = np.where(hit, clus[pos] if len(nodes) else -1,
                               miss_cluster)
            is_core = np.where(hit, corem[pos] if len(nodes) else
                               False, min_pts <= 1)
            return pa.table({id_col: t[id_col],
                             "cluster": pa.array(
                                 cluster.astype(np.int64)),
                             "is_core": pa.array(
                                 is_core.astype(bool))})

        return ids_only.map_batches(_attach, batch_format="pyarrow")

    if min_pts <= 1:
        # every point's neighborhood contains itself, so every point
        # is core — including isolated points that never appear in
        # the pair table and would otherwise have no degree row
        core = ids_only.map_batches(
            lambda t: pa.table({"node": t[id_col]}),
            batch_format="pyarrow").materialize()
        deg = None
    else:
        deg = None  # assigned below

    if min_pts > 1:
        ends = pairs.map_batches(
            lambda t: pa.table({
                "node": pa.concat_arrays([
                    t["id_a"].combine_chunks(),
                    t["id_b"].combine_chunks()])}),
            batch_format="pyarrow")
        deg = group_agg(ends, ["node"], [("node", "count_all", "n")],
                        buckets=buckets)
        core = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                pc.add(t["n"], 1), min_pts)).select(["node"]),
            batch_format="pyarrow").materialize()

    # 3. core-core components
    cc_edges = hash_join(
        hash_join(pairs, core, on=["id_a"], right_on=["node"],
                  how="left_semi", broadcast="auto", buckets=buckets),
        core, on=["id_b"], right_on=["node"], how="left_semi",
        broadcast="auto", buckets=buckets)
    # materialized so connected_components can SEE the edge list's
    # size and take its single-task path for small graphs (the core
    # subgraph is never larger than `pairs`, which is materialized
    # above anyway)
    comp = connected_components(cc_edges.materialize(),
                                buckets=buckets)  # node, rep
    # isolated cores: no core neighbor -> their own singleton cluster
    comp_nodes = comp.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow")
    iso = hash_join(core, comp_nodes, on=["node"],
                    how="left_anti", broadcast="auto",
                    buckets=buckets) \
        .map_batches(lambda t: pa.table({"node": t["node"],
                                         "rep": t["node"]}),
                     batch_format="pyarrow")
    core_lab = comp.union(iso).materialize()

    # 4. border points: non-core endpoint adjacent to a core endpoint
    def _directed(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["id_a"].combine_chunks(),
                                      t["id_b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["id_b"].combine_chunks(),
                                     t["id_a"].combine_chunks()])})

    if min_pts <= 1:
        # every point is core; the border stage would union an empty
        # (possibly schema-less) table and poison the join schema
        labeled = core_lab
    else:
        adj = pairs.map_batches(_directed, batch_format="pyarrow")
        adj_core = hash_join(adj, core_lab, on=["nbr"],
                             right_on=["node"], how="inner",
                             broadcast="auto", buckets=buckets)
        nbr_rep = adj_core.map_batches(
            lambda t: pa.table({"node": t["node"], "rep": t["rep"]}),
            batch_format="pyarrow")
        border = hash_join(nbr_rep, core, on=["node"],
                           how="left_anti", broadcast="auto",
                           buckets=buckets)
        border_lab = group_agg(border, ["node"],
                               [("rep", "min", "rep")],
                               buckets=buckets)
        labeled = core_lab.union(border_lab)
    labeled = labeled.materialize()
    out = hash_join(ids_only, labeled, on=[id_col],
                    right_on=["node"], how="left_outer",
                    broadcast="auto", buckets=buckets)
    core_set = hash_join(
        ids_only, core, on=[id_col], right_on=["node"],
        how="left_semi", broadcast="auto", buckets=buckets) \
        .materialize()

    cref = ray.put(np.sort(np.concatenate(
        [pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
         for t in ray.get(core_set.to_arrow_refs())]
        or [np.empty(0, dtype=np.int64)])))

    def _final(t: pa.Table, _c=cref) -> pa.Table:
        cores = ray.get(_c)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(cores, ids).clip(max=max(len(cores)-1, 0))
        is_core = (cores[pos] == ids) if len(cores) else \
            np.zeros(len(ids), dtype=bool)
        rep = pc.fill_null(pc.cast(t["rep"], pa.int64()), -1)
        return pa.table({id_col: t[id_col],
                         "cluster": rep,
                         "is_core": pa.array(is_core)})

    return out.map_batches(_final, batch_format="pyarrow")


def ivfpq_build(
    ds: "rd.Dataset", vec_col: str, id_col: str, *,
    n_lists: int = 16, m: int = 8, n_centroids: int = 64,
    sample_size: int = 16_384, seed: int = 7,
):
    """IVF-PQ index (Jégou et al. 2011, the billion-vector layout):
    a coarse L2 quantizer routes each vector to one of ``n_lists``
    inverted lists and PQ encodes the RESIDUAL (vector − list
    centroid) — residual magnitudes are a fraction of vector
    magnitudes, so the same code budget quantizes much finer.

    Returns ``(coarse (n_lists, d), codebooks (m, k, d//m),
    codes Dataset (id, list_id, pq_code))``.  Both trainings ride the
    deterministic content-keyed sample (:func:`pq_fit`); the corpus
    is touched by ONE routing+encode pass, no shuffle — at query time
    only the probed lists' codes are scored."""
    coarse = pq_fit(ds, vec_col, id_col=id_col, m=1,
                    n_centroids=n_lists, sample_size=sample_size,
                    seed=seed)[0]                     # (n_lists, d)
    cref = ray.put(coarse)

    def _residual(tab: pa.Table, _c=cref) -> pa.Table:
        C = ray.get(_c)
        X = _matrix(tab[vec_col])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) \
            + (C * C).sum(1)[None, :]
        lid = np.argmin(d2, axis=1)
        R = X - C[lid]
        return pa.table({
            id_col: tab[id_col],
            "list_id": pa.array(lid.astype(np.int64)),
            "resvec": pa.array(list(R))})

    resid = ds.select_columns([id_col, vec_col]).map_batches(
        _residual, batch_format="pyarrow").materialize()
    books = pq_fit(resid, "resvec", id_col=id_col, m=m,
                   n_centroids=n_centroids, sample_size=sample_size,
                   seed=seed)
    mm, k, dsub = books.shape
    bref = ray.put(books)

    def _enc(tab: pa.Table, _b=bref) -> pa.Table:
        B = ray.get(_b)
        R = _matrix(tab["resvec"])
        n = len(R)
        out = np.zeros((n, mm), dtype=np.uint8)
        for j in range(mm):
            S = R[:, j * dsub:(j + 1) * dsub]
            C = B[j]
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C * C).sum(1)[None, :]
            out[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: tab[id_col],
            "list_id": tab["list_id"],
            "pq_code": pa.array([r.tobytes() for r in out],
                                type=pa.binary())})

    codes = resid.map_batches(_enc, batch_format="pyarrow")
    return coarse, books, codes


def ivfpq_search(
    codes: "rd.Dataset", id_col: str, coarse: np.ndarray,
    codebooks: np.ndarray, queries: np.ndarray, *,
    k: int = 10, nprobe: int = 4, code_col: str = "pq_code",
) -> dict[int, list[tuple]]:
    """Probed asymmetric search over an IVF-PQ index: per query, the
    ``nprobe`` nearest coarse lists are selected on the driver and a
    residual ADC lookup table is built per (query, probed list) —
    ``(nq, nprobe, m, n_centroids)`` floats, tiny and broadcast once.
    Each batch scores ONLY its rows whose ``list_id`` is probed by
    some query (m table lookups per scored code) and emits local
    top-k; the driver merges O(nq·k·blocks) rows.  Returns
    ``{query_index: [(id, approx_d2), ...]}``."""
    m, nc, dsub = codebooks.shape
    nq = len(queries)
    cd = (queries * queries).sum(1)[:, None] \
        - 2.0 * (queries @ coarse.T) \
        + (coarse * coarse).sum(1)[None, :]
    probe = np.argsort(cd, axis=1, kind="stable")[:, :nprobe]
    luts = np.zeros((nq, nprobe, m, nc))
    for q in range(nq):
        for pi, lid in enumerate(probe[q]):
            r = queries[q] - coarse[lid]
            for j in range(m):
                rj = r[j * dsub:(j + 1) * dsub]
                C = codebooks[j]
                luts[q, pi, j, :] = (rj * rj).sum() - 2.0 * (C @ rj) \
                    + (C * C).sum(1)
    bref = ray.put((probe, luts))

    def _score(tab: pa.Table, _b=bref) -> pa.Table:
        probe, luts = ray.get(_b)
        lid = tab["list_id"].to_numpy(zero_copy_only=False)
        cm = _pq_codes_matrix(tab, code_col, m)
        ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        cols = np.arange(m)
        qi, oi, dd = [], [], []
        for q in range(len(probe)):
            for pi, pl in enumerate(probe[q]):
                sel = np.flatnonzero(lid == pl)
                if not len(sel):
                    continue
                s = luts[q, pi][cols[None, :], cm[sel]].sum(axis=1)
                kk = min(k, len(sel))
                top = np.argpartition(s, kk - 1)[:kk]
                qi.extend([q] * kk)
                oi.extend(ids[sel[top]].tolist())
                dd.extend(s[top].tolist())
        return pa.table({"q": pa.array(qi, pa.int64()),
                         "id": pa.array(oi, pa.int64()),
                         "d2": pa.array(dd, pa.float64())})

    parts = [t for t in ray.get(codes.map_batches(
        _score, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    out: dict[int, list] = {q: [] for q in range(nq)}
    if parts:
        allp = pa.concat_tables(parts)
        qs = allp["q"].to_numpy(zero_copy_only=False)
        ids = allp["id"].to_numpy(zero_copy_only=False)
        d2 = allp["d2"].to_numpy(zero_copy_only=False)
        for q in range(nq):
            mask = qs == q
            order = np.lexsort((ids[mask], d2[mask]))[:k]
            out[q] = list(zip(ids[mask][order].tolist(),
                              d2[mask][order].tolist()))
    return out


def group_centroid_cosine(
    ds: "rd.Dataset", vec_col: str, group_col: str, split_col: str, *,
    quant: int = 10_000,
) -> pa.Table:
    """Per-group cosine between the CENTROIDS of the two halves of a
    split column (values 0/1) — the representation-drift measure for
    comparing two ingestion waves / snapshots of an embedding corpus
    per class.  Exact and layout-independent: each component is
    quantized once (round-half-away at ``quant``, matching SQL
    ``round(val·quant)``), per-(group, split, dim) INTEGER sums fold
    as per-block partials (int64 on the wire, arbitrary-precision
    Python ints on the driver — no float ever crosses blocks), and
    cosine is evaluated once per group from the exact sums.  Cosine
    is scale-invariant, so the SUM vector stands in for the MEAN
    vector and row counts cancel.

    Scale shape: one streaming pass, no shuffle — the driver holds
    O(blocks · groups · 2) partial rows of d int64s.  Returns
    ``(group, cosine6)`` sorted by group; groups missing either
    split half are omitted."""
    import math

    from ..functions import round_half_away

    def _partial(tab: pa.Table) -> pa.Table:
        d = len(tab[vec_col][0]) if tab.num_rows else 0
        if tab.num_rows == 0:
            return pa.table({
                "g": pa.array([], pa.int64()),
                "sp": pa.array([], pa.int64()),
                "svec": pa.array([], pa.list_(pa.int64()))})
        g = pc.cast(tab[group_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        sp = pc.cast(tab[split_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        X = _matrix(tab[vec_col])
        Q = round_half_away(X * float(quant), 0).astype(np.int64)
        keys = g * 2 + sp
        uk, inv = np.unique(keys, return_inverse=True)
        S = np.zeros((len(uk), Q.shape[1]), np.int64)
        np.add.at(S, inv, Q)
        return pa.table({
            "g": pa.array(uk // 2),
            "sp": pa.array(uk % 2),
            "svec": pa.array(list(S))})

    acc: dict[tuple[int, int], list] = {}
    for t in ray.get(ds.select_columns(
            [group_col, split_col, vec_col]).map_batches(
            _partial, batch_format="pyarrow").to_arrow_refs()):
        for r in range(t.num_rows):
            key = (int(t["g"][r].as_py()), int(t["sp"][r].as_py()))
            vec = [int(v) for v in t["svec"][r].as_py()]
            if key in acc:
                acc[key] = [a + b for a, b in zip(acc[key], vec)]
            else:
                acc[key] = vec
    groups, cos6 = [], []
    for gk in sorted({g for g, _ in acc}):
        a, b = acc.get((gk, 0)), acc.get((gk, 1))
        if a is None or b is None:
            continue
        dot = sum(x * y for x, y in zip(a, b))
        n0 = sum(x * x for x in a)
        n1 = sum(y * y for y in b)
        if n0 <= 0 or n1 <= 0:
            continue
        c = float(dot) / (math.sqrt(float(n0)) * math.sqrt(float(n1)))
        groups.append(gk)
        cos6.append(float(round_half_away(np.array([c]), 6)[0]))
    return pa.table({group_col: pa.array(groups, pa.int64()),
                     "cosine6": pa.array(cos6, pa.float64())})


def kcenter_coreset(
    ds: "rd.Dataset", vec_col: str, id_col: str, *, k: int = 16,
) -> dict:
    """Greedy k-center (farthest-first traversal, Gonzalez 1985):
    pick the smallest-id vector, then k−1 times the point FARTHEST
    from the chosen set (ties to the smallest id) — the classic
    2-approximation coverage coreset for diverse subset selection.

    Deterministic by construction: each round broadcasts the chosen
    centers once, every block reports its champion ``(min-dist²,
    id)`` under the exact same float ops, and the driver folds
    O(blocks) champions with the value-then-id rule — block layout
    cannot change any comparison.  Returns ``{"ids": [int], "radius2":
    [float]}`` (``radius2[t]`` = the squared distance that step's
    winner had to the previous centers).

    Scale shape: k streaming passes, centers matrix O(k·d) broadcast,
    no shuffle — the embedding column never moves."""
    import ray

    proj = ds.select_columns([id_col, vec_col]).materialize()

    def _champion(tab: pa.Table, _c) -> pa.Table:
        C = ray.get(_c)
        X = _matrix(tab[vec_col])
        ids = pc.cast(tab[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) \
            + (C * C).sum(1)[None, :]
        mind = d2.min(axis=1)
        best = np.lexsort((ids, -mind))[0]
        return pa.table({"d2": pa.array([float(mind[best])]),
                         "bid": pa.array([int(ids[best])],
                                         pa.int64()),
                         "bvec": pa.array([X[best].tolist()])})

    # seed: smallest id
    seed = None
    for t in ray.get(proj.map_batches(
            lambda tb: pa.table({"m": pa.array(
                [int(pc.min(pc.cast(tb[id_col], pa.int64())).as_py())
                 if tb.num_rows else np.iinfo(np.int64).max],
                pa.int64())}),
            batch_format="pyarrow").to_arrow_refs()):
        for v in t["m"].to_pylist():
            seed = v if seed is None else min(seed, v)
    if seed is None or seed == np.iinfo(np.int64).max:
        raise ValueError("empty input")
    chosen = [int(seed)]
    radius2 = [0.0]

    def _vec_of(ids_needed):
        sel_ref = ray.put(pa.array(sorted(ids_needed), pa.int64()))

        def _sel(tb: pa.Table) -> pa.Table:
            keep = pc.is_in(pc.cast(tb[id_col], pa.int64()),
                            value_set=ray.get(sel_ref))
            return tb.filter(keep)

        tabs = [t for t in ray.get(proj.map_batches(
            _sel, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows]
        tab = pa.concat_tables(tabs)
        order = np.argsort(pc.cast(tab[id_col], pa.int64())
                           .to_numpy(zero_copy_only=False))
        return _matrix(tab[vec_col])[order], sorted(ids_needed)

    # centers matrix grows incrementally: each round's champion pass
    # returns the winner's VECTOR alongside (d2, id), so no per-round
    # corpus re-scan is needed to fetch it — k streaming passes
    # total, not 2k.  Row order of M is selection order; every d2
    # column is computed independently and min() is order-invariant,
    # so the floats match the sorted-matrix formulation exactly.
    M = _vec_of(chosen)[0]
    while len(chosen) < k:
        cref = ray.put(M)
        best_d, best_id, best_vec = -1.0, None, None
        for t in ray.get(proj.map_batches(
                lambda tb, _c=cref: _champion(tb, _c),
                batch_format="pyarrow").to_arrow_refs()):
            if t.num_rows == 0 or "d2" not in t.column_names:
                continue
            for d2v, bid, bv in zip(t["d2"].to_pylist(),
                                    t["bid"].to_pylist(),
                                    t["bvec"].to_pylist()):
                if d2v > best_d or (d2v == best_d
                                    and (best_id is None
                                         or bid < best_id)):
                    best_d, best_id, best_vec = d2v, bid, bv
        if best_d <= 1e-12 and int(best_id) in set(chosen):
            # k exceeds the number of distinct points: every
            # remaining candidate sits at distance 0 from the chosen
            # set and the champion rule re-selects an already-chosen
            # id — stop instead of emitting duplicate centers
            break
        chosen.append(int(best_id))
        radius2.append(float(best_d))
        M = np.vstack([M, np.asarray(best_vec, dtype=np.float64)])
    return {"ids": chosen, "radius2": radius2}
