"""Deduplication operators for large-scale text corpora.

Beyond the reference's exact ``UniqueBy`` (``rules/rules.go:104-137``),
these are the near-dup family a 100 TB training-data pipeline needs.
All are built on the same two Ray Data motifs:

1. a full-width ``map_batches`` pass computing per-row signatures
   (hashes / sketches) — vectorized numpy over Arrow buffers, no Python
   row loops in the signature path;
2. ONE hash shuffle on the signature (``bucketed_map_groups``) to
   co-locate candidates, then vectorized verification inside buckets.

Candidate verification (pairwise Jaccard/hamming) runs only within
buckets, so cost is sum of bucket^2, not corpus^2 — the LSH banding
threshold controls bucket sizes.  At 10^12 rows the band buckets are
additionally salted by ``% buckets`` exactly like every other grouped
op in this engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                    group_agg, segment_starts)
from ..state.sketches import _hash64, hash_strings

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# Exact dedup (first-wins by id)
# ---------------------------------------------------------------------------

def exact_duplicates(ds: "rd.Dataset", key_cols, id_col: str,
                     *, buckets: int | None = None) -> "rd.Dataset":
    """Rows that duplicate an earlier row (smaller ``id_col``) with the
    same key tuple: (id, keeper, key...).  Hash-partition on the key,
    first-wins inside each bucket — the distributed form of the
    reference's first-wins map (``rules/rules.go:116-135``)."""
    key_cols = list(key_cols)

    def _dups(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending") for c in key_cols]
                          + [(id_col, "ascending")])
        new = segment_starts(tab, key_cols)
        firsts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        dup_idx = np.flatnonzero(~new)
        keeper_idx = firsts[seg_id[dup_idx]]
        out = {id_col: tab[id_col].take(pa.array(dup_idx)),
               "keeper": tab[id_col].take(pa.array(keeper_idx))}
        for c in key_cols:
            out[c] = tab[c].take(pa.array(dup_idx))
        return pa.table(out)

    return bucketed_map_groups(ds.select_columns(key_cols + [id_col]),
                               key_cols, _dups, buckets=buckets,
                               sort_within=False)


# ---------------------------------------------------------------------------
# Signatures (shared by MinHash / SimHash / n-gram Jaccard)
# ---------------------------------------------------------------------------

def _utf8_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, flat byte buffer) of a string array, zero-copy."""
    arr = pc.cast(arr, pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1,
                            offset=arr.offset * 8)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    # slice to this array's bytes so offsets can be used relative to 0
    data = data[offsets[0]: offsets[-1]]
    offsets = offsets - offsets[0]
    return offsets, data


def char_shingle_hashes(arr: pa.Array, k: int = 5):
    """Per-row sets of hashed character k-shingles, fully vectorized:
    returns (row_ids int64, shingle_hashes uint64) flattened across the
    batch — one rolling polynomial hash over the flat UTF-8 buffer.

    A row shorter than ``k`` contributes ONE shingle: the hash of its
    entire byte content (an empty row hashes the empty sequence — a
    fixed sentinel independent of neighboring rows in the batch, so
    signatures are deterministic across block boundaries)."""
    if arr.null_count:
        arr = pc.fill_null(arr, "")   # null offsets may span junk bytes
    offsets, data = _utf8_buffers(arr)
    n = len(offsets) - 1
    starts = offsets[:-1]
    ends = offsets[1:]
    lens = ends - starts
    n_sh = np.maximum(lens - (k - 1), 1)  # short rows contribute 1 shingle
    row_ids = np.repeat(np.arange(n, dtype=np.int64), n_sh)
    # shingle start positions within the flat buffer
    base = np.repeat(starts, n_sh)
    local = np.arange(len(row_ids), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_sh)[:-1]]), n_sh)
    pos = base + local
    flat = data.astype(np.uint64)
    # polynomial hash of data[pos:pos+k], truncated at the row end:
    # positions past a row's last byte contribute nothing (prime^0
    # style zero byte), never a neighboring row's data
    h = np.zeros(len(pos), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    row_end = np.repeat(ends, n_sh)
    for j in range(k):
        in_row = pos + j < row_end
        p = np.clip(pos + j, 0, max(len(flat) - 1, 0))
        byte = flat[p] if len(flat) else np.zeros(len(p), dtype=np.uint64)
        h = (h * prime + np.where(in_row, byte, np.uint64(0))) & _MASK64
    return row_ids, _hash64(h)


def word_shingle_hashes(arr: pa.Array, k: int = 3):
    """Per-row hashed word k-shingles: tokenizes via Arrow regex split,
    hashes tokens vectorized, then combines k consecutive token hashes.

    Empty tokens (regex-split artifacts at leading/trailing/duplicated
    whitespace) are dropped BEFORE shingling, matching the
    ``\\S+``-extraction tokenization of the exact verifier
    (``_row_shingle_sets``) and the SQL oracle — otherwise a
    whitespace-padded document grows phantom edge shingles and its
    MinHash estimate diverges from the true word-shingle Jaccard."""
    tokens = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=r"\s+")
    flat = pc.list_flatten(tokens)
    raw_counts = pc.list_value_length(tokens).fill_null(0)\
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(raw_counts)
    flat = flat.combine_chunks() if isinstance(
        flat, pa.ChunkedArray) else flat
    keep = np.asarray(pc.not_equal(flat, "").fill_null(False))
    row_of = np.repeat(np.arange(n, dtype=np.int64), raw_counts)[keep]
    th = hash_strings(flat.filter(pa.array(keep)))
    tok_counts = np.bincount(row_of, minlength=n).astype(np.int64)
    n_sh = np.maximum(tok_counts - (k - 1), np.minimum(tok_counts, 1))
    row_ids = np.repeat(np.arange(n, dtype=np.int64), n_sh)
    tok_starts = np.concatenate([[0], np.cumsum(tok_counts)[:-1]])
    base = np.repeat(tok_starts, n_sh)
    local = np.arange(len(row_ids), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_sh)[:-1]]), n_sh)
    pos = base + local
    h = np.zeros(len(pos), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    tok_ends = tok_starts + tok_counts
    row_end = np.repeat(tok_ends, n_sh)
    for j in range(k):
        p = np.minimum(pos + j, np.maximum(row_end - 1, 0))
        h = (h * prime + (th[p] if len(th) else np.uint64(0))) & _MASK64
    return row_ids, _hash64(h)


def minhash_signature(row_ids: np.ndarray, hashes: np.ndarray, n_rows: int,
                      n_perm: int = 64) -> np.ndarray:
    """(n_rows, n_perm) uint64 MinHash matrix via the standard universal
    a*x+b trick — one vectorized pass per permutation."""
    rng = np.random.default_rng(0xD00D)
    a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
    sig = np.full((n_rows, n_perm), _MASK64, dtype=np.uint64)
    for p in range(n_perm):
        hp = (hashes * a[p] + b[p]) & _MASK64
        np.minimum.at(sig[:, p], row_ids, hp)
    return sig


def simhash64(row_ids: np.ndarray, hashes: np.ndarray,
              n_rows: int) -> np.ndarray:
    """64-bit SimHash per row: sign of per-bit vote sums over feature
    hashes (Charikar 2002), vectorized with bincount per bit."""
    votes = np.zeros((n_rows, 64), dtype=np.int64)
    for bit in range(64):
        b = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        votes[:, bit] += np.bincount(row_ids, weights=2 * b - 1,
                                     minlength=n_rows).astype(np.int64)
    out = np.zeros(n_rows, dtype=np.uint64)
    for bit in range(64):
        out |= (votes[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
    return out


def _group_pair_chunks(counts: np.ndarray, firsts: np.ndarray,
                       max_group: int, chunk: int = 1 << 21):
    """Yield global row-index pair chunks (A, B) for all within-group
    combinations, vectorized PER GROUP SIZE: every group of size s
    shares one triu index template, so the Python iteration count is
    O(distinct sizes x size-class chunks), never once per group.

    Streaming contract: at most ~``chunk`` pairs are materialized per
    yield, bounding candidate-pair memory at O(chunk) no matter how
    many groups a bucket holds (a bucket of 10k near-max groups would
    otherwise expand to billions of resident index entries before any
    verification ran).  Groups larger than ``max_group`` get the star
    pairing against their first (smallest-key) row — O(s) rows,
    preserves cluster connectivity."""
    for s in np.unique(counts):
        if s < 2:
            continue
        base = firsts[counts == s]
        s = int(s)
        per = s - 1 if s > max_group else s * (s - 1) // 2
        if per > chunk:
            # one group's pair count alone exceeds the budget: emit
            # row-BANDS of the triangle, one group at a time, never
            # materializing the full O(s^2) template (s=1e6 would be
            # a ~8 TB triu allocation) — resident stays O(chunk + s)
            if s > max_group:
                ia0 = np.zeros(s - 1, dtype=np.int64)
                ib0 = np.arange(1, s, dtype=np.int64)
                for b in base:
                    for t in range(0, per, chunk):
                        yield b + ia0[t:t + chunk], b + ib0[t:t + chunk]
                continue
            cnts = np.arange(s - 1, 0, -1, dtype=np.int64)
            cum = np.cumsum(cnts)
            ends = np.unique(np.searchsorted(
                cum, np.arange(chunk, int(cum[-1]) + chunk, chunk),
                side="left") + 1)
            r0 = 0
            for r1 in ends:
                r1 = int(min(r1, s - 1))
                if r1 <= r0:
                    continue
                band = cnts[r0:r1]
                tot = int(band.sum())
                ia = np.repeat(np.arange(r0, r1, dtype=np.int64), band)
                pre = np.concatenate(
                    [[0], np.cumsum(band)[:-1]]).astype(np.int64)
                ib = (np.arange(tot, dtype=np.int64)
                      - np.repeat(pre, band) + ia + 1)
                for b in base:
                    yield b + ia, b + ib
                r0 = r1
            continue
        if s > max_group:
            ia = np.zeros(s - 1, dtype=np.int64)
            ib = np.arange(1, s, dtype=np.int64)
        else:
            ia, ib = np.triu_indices(s, k=1)
        gstep = max(1, chunk // per)
        for g in range(0, len(base), gstep):
            bs = base[g:g + gstep]
            yield ((bs[:, None] + ia[None, :]).ravel(),
                   (bs[:, None] + ib[None, :]).ravel())


_POPCOUNT16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                       dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table."""
    m = np.uint64(0xFFFF)
    return (_POPCOUNT16[(x & m).astype(np.int64)].astype(np.int64)
            + _POPCOUNT16[((x >> np.uint64(16)) & m).astype(np.int64)]
            + _POPCOUNT16[((x >> np.uint64(32)) & m).astype(np.int64)]
            + _POPCOUNT16[((x >> np.uint64(48)) & m).astype(np.int64)])


# ---------------------------------------------------------------------------
# MinHash + LSH banding pipeline
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    n_perm: int = 64, bands: int = 16, shingle_k: int = 5,
    jaccard_threshold: float = 0.5, buckets: int | None = None,
    max_group: int = 1024, shingles: str = "char5",
) -> "rd.Dataset":
    """Near-duplicate pairs by MinHash+LSH: per-batch signatures →
    flat_map to (band, band_hash, id, sig) rows → shuffle on the band
    bucket → pairwise signature-Jaccard verification inside buckets →
    distinct pairs (id_a < id_b) with the estimated Jaccard.

    Returns columns (id_a, id_b, jaccard_est).

    Banding theory: the LSH similarity threshold is ~(1/bands)^(bands/n_perm)
    — (16 bands x 4 rows) targets ~0.5; pick (8 x 8) for ~0.77.

    ``max_group`` caps candidate-group size (standard LSH practice): a
    band bucket larger than this is a degenerate "everything collides"
    bucket (low-entropy corpus); its pairs are skipped rather than
    paying O(m^2) verification.  Pairs that similar almost surely share
    another, smaller bucket.

    ``shingles`` selects the feature set the MinHash runs over:
    ``"char5"`` (character ``shingle_k``-grams over UTF-8 bytes) or
    ``"word3"`` (word 3-grams of the lowercased tokenized text).
    """
    rows_per_band = n_perm // bands

    def _sigs(tab: pa.Table) -> pa.Table:
        arr = tab[text_col].combine_chunks()
        if shingles == "word3":
            rid, h = word_shingle_hashes(arr, k=3)
        else:
            rid, h = char_shingle_hashes(arr, k=shingle_k)
        sig = minhash_signature(rid, h, tab.num_rows, n_perm)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        # one output row per (row, band): band bucket key + full signature
        band_rows = []
        for b in range(bands):
            bh = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            key = np.zeros(len(ids), dtype=np.uint64)
            for j in range(rows_per_band):
                key = (key * np.uint64(0x100000001B3) + bh[:, j]) & _MASK64
            band_rows.append(pa.table({
                "band": pa.array(np.full(len(ids), b, dtype=np.int32)),
                "band_key": pa.array(_hash64(key ^ np.uint64(b + 1))
                                     .astype(np.int64)),
                id_col: pa.array(ids),
                "sig": pa.array(list(sig.astype(np.int64)),
                                type=pa.list_(pa.int64(), n_perm)),
            }))
        return pa.concat_tables(band_rows)

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        _sigs, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        # bucket sorted by (band, band_key): candidate groups are
        # contiguous runs of equal (band, band_key).  Pair emission is
        # per-size templated (_group_pair_chunks) and the signature
        # compare runs over bounded pair chunks — no per-group Python
        # work, no unbounded candidate materialization
        tab = tab.sort_by([("band", "ascending"), ("band_key", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["band", "band_key"])
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id) if len(seg_id) else \
            np.zeros(0, dtype=np.int64)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sigs = np.asarray(tab["sig"].combine_chunks().flatten()
                          .to_numpy(zero_copy_only=False)
                          ).reshape(max(len(ids), 1), -1)
        out_a, out_b, out_j = [], [], []
        for a_i, b_i in _group_pair_chunks(counts, np.flatnonzero(new),
                                           max_group):
            eq = (sigs[a_i] == sigs[b_i]).mean(axis=1)
            keep = eq >= jaccard_threshold
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_j.append(eq[keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "jaccard_est": pa.array([], type=pa.float64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "jaccard_est": pa.array(np.concatenate(out_j)),
        })

    pairs = bucketed_map_groups(sig_ds, ["band_key"], _pairs,
                                buckets=buckets, sort_within=False)

    # same pair can surface from multiple bands: distinct on (id_a, id_b)
    def _dedup_pairs(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("jaccard_est", "max")], ["jaccard_est"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup_pairs,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


# ---------------------------------------------------------------------------
# SimHash near-dup pipeline
# ---------------------------------------------------------------------------

def hamming_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    max_hamming: int = 1, buckets: int | None = None,
    max_group: int | None = None,
) -> "rd.Dataset":
    """EXACT near-dup pairs by string Hamming distance:
    ``(id_a, id_b, hamming)`` for every equal-length pair within
    ``max_hamming`` byte substitutions (``id_a < id_b``; distance 0 =
    exact duplicates included).  Unequal-length strings never pair
    (Hamming is undefined across lengths).

    Blocking is the pigeonhole partition over INTERLEAVED byte
    positions: position class ``i`` holds bytes at offsets ``≡ i mod
    (d+1)``.  ``d`` substitutions touch at most ``d`` classes, so any
    in-distance pair agrees exactly on ≥1 class — candidate recall is
    1.0 by construction, and the per-class verify is an exact byte
    compare, so the OUTPUT is exact (PassJoin's guarantee with
    interleaved rather than contiguous segments: sequential-ID data
    shares long constant prefixes, which would make contiguous
    segment 0 one global bucket; interleaving puts low-order —
    high-entropy — positions into every class).

    Scale shape: each row emits d+1 (class-hash, id, text) rows — the
    only shuffle is that exchange plus the final distinct on the pair
    key; candidate pairs stream in bounded chunks (shared triu
    templates, O(chunk) resident) and verification is one vectorized
    gather + ``add.reduceat`` per chunk.  Class-hash collisions only
    ADD candidates (verification is exact).  ``max_group=None`` keeps
    the exact contract on any group size; set a cap only when
    star-pairing recall loss is acceptable for degenerate key
    distributions (then connectivity survives, completeness does
    not)."""
    n_seg = max_hamming + 1

    def _classes(tab: pa.Table) -> pa.Table:
        # SQL comparison semantics: a NULL string matches nothing
        # (mismatches(NULL, x) is NULL) — drop null rows up front so
        # they never pair as empty strings
        tab = tab.filter(pc.is_valid(tab[text_col]))
        arr = tab[text_col].combine_chunks()
        n = tab.num_rows
        offsets, data = _utf8_buffers(arr)
        lens = np.diff(offsets)
        total = int(offsets[-1])
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            offsets[:-1], lens)
        max_rank = int(intra.max() // n_seg) + 1 if total else 1
        powt = np.empty(max_rank + 1, dtype=np.uint64)
        powt[0] = 1
        P = np.uint64(1099511628211)
        with np.errstate(over="ignore"):   # uint64 wrap is the point
            for k in range(1, max_rank + 1):
                powt[k] = powt[k - 1] * P
        ids = tab[id_col].combine_chunks()
        parts = []
        for i in range(n_seg):
            m = (intra % n_seg) == i
            # class-i bytes stay row-major under the mask, so each
            # row's class span is contiguous: polynomial-hash it with
            # one reduceat over the per-row class counts
            contrib = ((data[m].astype(np.uint64)
                        + np.uint64(0x9E3779B9))
                       * powt[(intra[m] // n_seg)])
            cnt = np.bincount(row[m], minlength=n)
            starts = np.concatenate(
                [[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
            if contrib.size:
                # sentinel pad: a trailing zero-count row makes
                # starts[-1] == len(contrib), which reduceat rejects;
                # the appended 0 keeps every start in bounds and only
                # pads the final segment's sum by 0
                h = np.add.reduceat(
                    np.append(contrib, np.uint64(0)), starts)
                h[cnt == 0] = 0  # reduceat start==next-start quirk
            else:
                h = np.zeros(n, dtype=np.uint64)
            # tag mixing MUST diffuse before combining: h differs by
            # small deltas for adjacent bytes, so `h ^ tag` aliases
            # systematically (h^4 == (h+1)^5 for even h — class 0 of
            # "ab" collided with class 1).  A golden-ratio multiply
            # pushes the tag far from any byte-level h delta.
            tag = (lens.astype(np.uint64) * np.uint64(n_seg)
                   + np.uint64(i)) * np.uint64(0x9E3779B97F4A7C15)
            key = _hash64(h + tag)
            parts.append(pa.table({
                "block_key": pa.array(key.astype(np.int64)),
                id_col: ids,
                text_col: arr,
            }))
        return pa.concat_tables(parts)

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        _classes, batch_format="pyarrow")
    cap = (1 << 62) if max_group is None else max_group

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("block_key", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["block_key"])
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        offsets, data = _utf8_buffers(tab[text_col].combine_chunks())
        lens = np.diff(offsets)
        out_a, out_b, out_h = [], [], []
        for a_i, b_i in _group_pair_chunks(counts, np.flatnonzero(new),
                                           cap):
            la = lens[a_i]
            eq = la == lens[b_i]
            a_i, b_i, L = a_i[eq], b_i[eq], la[eq]
            if not len(a_i):
                continue
            tot = int(L.sum())
            pre = np.concatenate([[0], np.cumsum(L)[:-1]]).astype(
                np.int64)
            intra = np.arange(tot, dtype=np.int64) - np.repeat(pre, L)
            ia = np.repeat(offsets[:-1][a_i], L) + intra
            ib = np.repeat(offsets[:-1][b_i], L) + intra
            if tot:
                # sentinel pad: trailing empty-string pairs put
                # pre[-1] == tot, out of reduceat's range
                neq = (data[ia] != data[ib]).astype(np.int64)
                ham = np.add.reduceat(np.append(neq, 0), pre)
                ham[L == 0] = 0  # start==next-start quirk
            else:
                ham = np.zeros(len(a_i), dtype=np.int64)
            # a block-key collision can merge one doc's class rows
            # into a single group — never pair a row with itself
            # (matches the oracle's strict id_a < id_b)
            keep = (ham <= max_hamming) & (ids[a_i] != ids[b_i])
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
        })

    pairs = bucketed_map_groups(sig_ds, ["block_key"], _pairs,
                                buckets=buckets, sort_within=False)

    def _dedup_pairs(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("hamming", "min")], ["hamming"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup_pairs,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


def edit_distance_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    buckets: int | None = None, max_group: int | None = None,
) -> "rd.Dataset":
    """EXACT near-dup pairs by byte Levenshtein distance ≤ 1:
    ``(id_a, id_b, edit)`` for every pair within one insertion,
    deletion or substitution (``id_a < id_b``; distance 0 = exact
    duplicates included) — the indel-capable complement of
    ``hamming_pairs``.

    Blocking is the 1-DELETION NEIGHBORHOOD (the SymSpell / FastSS
    scheme): each string emits a signature for itself plus one per
    single-byte deletion, each a polynomial hash tagged with the
    RESULT length.  ``ed(a,b) ≤ 1`` implies a shared signature —
    equal strings share the full-string signature; a substitution
    pair shares the delete-at-``i`` signature; an insertion pair
    shares (longer's delete-at-``i``) = (shorter's full) — so
    candidate recall is 1.0 by construction.  All ``L+1`` deletion
    hashes of a row come from ONE prefix-sum pass: with
    ``h(s) = Σ (s[i]+C)·P^i`` (mod 2^64, P odd hence invertible),
    ``h(s minus byte j) = pref_j + (h(s) − pref_{j+1})·P⁻¹``.

    Verification is exact and vectorized: equal-length candidates
    use the Hamming byte-compare (``ed ≤ 1`` ⟺ ``hamming ≤ 1`` at
    equal length — one indel changes length, two cost 2);
    length-±1 candidates use the one-gap test ``lcp + lcs ≥
    len(shorter)`` via two masked ``minimum.reduceat`` sweeps.
    Signature-hash collisions only ADD candidates.

    Scale shape: each row emits ``L+2`` signature rows, so this is
    built for SHORT KEYS (names, titles, codes — the SymSpell
    regime), not multi-KiB documents (use MinHash/SimHash there).
    The only shuffles are the signature exchange and the final
    pair-distinct; candidate pairs stream in bounded chunks.
    Distances are byte-level (equals character Levenshtein on
    ASCII; on multi-byte UTF-8 a one-character edit may cost >1
    byte edit and fall outside the radius — documented contract).

    No reference analogue: ``UniqueBy`` (``rules/rules.go:104``) is
    exact-key only; this extends it to the fuzzy-key join an LLM
    curation pipeline needs."""
    C = np.uint64(0x9E3779B9)
    P = np.uint64(1099511628211)
    PINV = np.uint64(pow(1099511628211, -1, 1 << 64))
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _sigs(tab: pa.Table) -> pa.Table:
        # SQL comparison semantics: NULL pairs with nothing
        tab = tab.filter(pc.is_valid(tab[text_col]))
        arr = tab[text_col].combine_chunks()
        n = tab.num_rows
        ids = tab[id_col].combine_chunks()
        offsets, data = _utf8_buffers(arr)
        lens = np.diff(offsets)
        total = int(offsets[-1])
        row_starts = offsets[:-1]
        # per-byte polynomial terms with ROW-LOCAL exponents, then one
        # global cumsum; per-row prefixes are differences of cps —
        # uint64 wrap arithmetic throughout
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            row_starts, lens)
        max_rank = int(intra.max()) + 1 if total else 1
        powt = np.empty(max_rank + 1, dtype=np.uint64)
        powt[0] = 1
        with np.errstate(over="ignore"):   # uint64 wrap is the point
            for k in range(1, max_rank + 1):
                powt[k] = powt[k - 1] * P
        terms = (data.astype(np.uint64) + C) * powt[intra]
        cps = np.concatenate(
            [np.zeros(1, np.uint64), np.cumsum(terms, dtype=np.uint64)])
        base = np.repeat(cps[row_starts], lens)
        h_tot_row = cps[offsets[1:]] - cps[row_starts]
        # full-string signatures (result length = L)
        key_full = _hash64(h_tot_row
                           + lens.astype(np.uint64) * GOLD).astype(np.int64)
        parts = [pa.table({"block_key": pa.array(key_full),
                           id_col: ids, text_col: arr})]
        if total:
            g = np.arange(total, dtype=np.int64)
            pref_j = cps[g] - base
            pref_j1 = cps[g + 1] - base
            h_tot_g = np.repeat(h_tot_row, lens)
            h_del = pref_j + (h_tot_g - pref_j1) * PINV
            tag = (np.repeat(lens, lens).astype(np.uint64)
                   - np.uint64(1)) * GOLD
            key_del = _hash64(h_del + tag).astype(np.int64)
            ridx = np.repeat(np.arange(n, dtype=np.int64), lens)
            parts.append(pa.table({
                "block_key": pa.array(key_del),
                id_col: ids.take(pa.array(ridx)),
                text_col: arr.take(pa.array(ridx))}))
        return pa.concat_tables(parts)

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        _sigs, batch_format="pyarrow")
    cap = (1 << 62) if max_group is None else max_group

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("block_key", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["block_key"])
        counts = np.bincount(np.cumsum(new) - 1)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        offsets, data = _utf8_buffers(tab[text_col].combine_chunks())
        lens = np.diff(offsets)
        out_a, out_b, out_e = [], [], []

        def _emit(a_i, b_i, ed):
            keep = ids[a_i] != ids[b_i]
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_e.append(ed[keep])

        for a_i, b_i in _group_pair_chunks(counts, np.flatnonzero(new),
                                           cap):
            la, lb = lens[a_i], lens[b_i]
            # --- equal length: hamming byte compare, keep ham <= 1
            eq = la == lb
            ai, bi, L = a_i[eq], b_i[eq], la[eq]
            if len(ai):
                tot = int(L.sum())
                pre = np.concatenate([[0], np.cumsum(L)[:-1]]).astype(
                    np.int64)
                pos = np.arange(tot, dtype=np.int64) - np.repeat(pre, L)
                ia = np.repeat(offsets[:-1][ai], L) + pos
                ib = np.repeat(offsets[:-1][bi], L) + pos
                if tot:
                    neq = (data[ia] != data[ib]).astype(np.int64)
                    ham = np.add.reduceat(np.append(neq, 0), pre)
                    ham[L == 0] = 0
                else:
                    ham = np.zeros(len(ai), dtype=np.int64)
                k = ham <= 1
                _emit(ai[k], bi[k], ham[k])
            # --- length ±1: one-gap test lcp + lcs >= len(shorter)
            d1 = np.abs(la - lb) == 1
            ai, bi = a_i[d1], b_i[d1]
            if len(ai):
                swap = lens[ai] > lens[bi]
                sh = np.where(swap, bi, ai)   # shorter row index
                lg = np.where(swap, ai, bi)   # longer row index
                Ls = lens[sh]
                tot = int(Ls.sum())
                pre = np.concatenate([[0], np.cumsum(Ls)[:-1]]).astype(
                    np.int64)
                if tot:
                    pos = np.arange(tot, dtype=np.int64) - np.repeat(
                        pre, Ls)
                    is_ = np.repeat(offsets[:-1][sh], Ls) + pos
                    il_ = np.repeat(offsets[:-1][lg], Ls) + pos
                    neq = data[is_] != data[il_]
                    big = np.repeat(Ls, Ls)
                    # sentinel must be LARGE: minimum.reduceat's final
                    # segment runs to the end of the appended array
                    sent = np.int64(1) << np.int64(62)
                    lcp = np.minimum.reduceat(
                        np.append(np.where(neq, pos, big), sent), pre)
                    # suffix sweep: short read backwards from its end,
                    # long backwards from ITS end (one byte further)
                    is2 = np.repeat(offsets[1:][sh], Ls) - 1 - pos
                    il2 = np.repeat(offsets[1:][lg], Ls) - 1 - pos
                    neq2 = data[is2] != data[il2]
                    lcs = np.minimum.reduceat(
                        np.append(np.where(neq2, pos, big), sent), pre)
                    lcp[Ls == 0] = 0
                    lcs[Ls == 0] = 0
                else:
                    lcp = np.zeros(len(ai), dtype=np.int64)
                    lcs = lcp
                k = (lcp + lcs) >= Ls
                _emit(ai[k], bi[k], np.ones(int(k.sum()), dtype=np.int64))
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "edit": pa.array([], type=pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "edit": pa.array(np.concatenate(out_e).astype(np.int64)),
        })

    pairs = bucketed_map_groups(sig_ds, ["block_key"], _pairs,
                                buckets=buckets, sort_within=False)

    def _dedup_pairs(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("edit", "min")], ["edit"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup_pairs,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


def _bipartite_pair_chunks(counts0: np.ndarray, counts1: np.ndarray,
                           firsts0: np.ndarray, firsts1: np.ndarray,
                           chunk: int = 1 << 21):
    """Yield global row-index pair chunks (A, B) for the CROSS PRODUCT
    of each block's index rows x probe rows, templated per
    (n_index, n_probe) size class exactly like ``_group_pair_chunks``
    — the Python iteration count is O(distinct size classes), not
    O(blocks).  At most ~``chunk`` pairs are resident per yield."""
    if not len(counts0):
        return
    cls = counts0.astype(np.int64) * (int(counts1.max()) + 1) + counts1
    for c in np.unique(cls):
        sel = cls == c
        s0 = int(counts0[sel][0])
        s1 = int(counts1[sel][0])
        if s0 == 0 or s1 == 0:
            continue
        per = s0 * s1
        b0 = firsts0[sel]
        b1 = firsts1[sel]
        if per > chunk:
            # one block's cross product alone exceeds the budget:
            # emit index-row bands, never materializing the full
            # template
            rows_per = max(1, chunk // s1)
            ib0 = np.arange(s1, dtype=np.int64)
            for f0, f1 in zip(b0, b1):
                for r in range(0, s0, rows_per):
                    rr = np.arange(r, min(r + rows_per, s0),
                                   dtype=np.int64)
                    yield (f0 + np.repeat(rr, s1),
                           f1 + np.tile(ib0, len(rr)))
            continue
        ia = np.repeat(np.arange(s0, dtype=np.int64), s1)
        ib = np.tile(np.arange(s1, dtype=np.int64), s0)
        gstep = max(1, chunk // per)
        for g in range(0, len(b0), gstep):
            yield ((b0[g:g + gstep, None] + ia[None, :]).ravel(),
                   (b1[g:g + gstep, None] + ib[None, :]).ravel())


def _banded_lev(a_i: np.ndarray, b_i: np.ndarray, offsets: np.ndarray,
                data: np.ndarray, lens: np.ndarray, t: int) -> np.ndarray:
    """Exact byte Levenshtein for candidate pairs, Ukkonen-banded at
    threshold ``t``: distances > t saturate to t+1.  Vectorized over
    PAIRS — the loops are over string position i (<= max length) and
    the 2t+1 band cells; every inner op is a flat numpy gather/min
    over all pairs at once.  Callers must pre-filter ``|len diff| <=
    t`` (the final band cell assumes it)."""
    m = lens[a_i].astype(np.int64)
    n = lens[b_i].astype(np.int64)
    P = len(a_i)
    W = 2 * t + 1
    INF = np.int16(t + 1)
    res = np.full(P, INF, dtype=np.int16)
    zero = m == 0
    res[zero] = np.minimum(n[zero], np.int64(INF)).astype(np.int16)
    if P == 0:
        return res.astype(np.int64)
    band = np.full((P, W), INF, dtype=np.int16)
    for k in range(t, W):                  # row 0: D[0][j] = j
        j = k - t
        band[:, k] = np.where(j <= n, np.int16(j), INF)
    offA = offsets[:-1][a_i].astype(np.int64)
    offB = offsets[:-1][b_i].astype(np.int64)
    last = max(0, len(data) - 1)
    infc = np.full(P, INF, dtype=np.int16)
    for i in range(1, int(m.max()) + 1):
        act = i <= m
        cur = np.empty((P, W), dtype=np.int16)
        ca = data[np.minimum(offA + (i - 1), last)] if len(data) \
            else np.zeros(P, dtype=np.uint8)
        for k in range(W):
            j = i + k - t                  # scalar: band is diagonal
            if j < 0:
                cur[:, k] = INF
                continue
            up = (band[:, k + 1] + np.int16(1)) if k + 1 < W else infc
            if j >= 1:
                cb = data[np.minimum(offB + (j - 1), last)] if len(data) \
                    else np.zeros(P, dtype=np.uint8)
                cell = np.minimum(
                    band[:, k] + (ca != cb).astype(np.int16), up)
            else:
                cell = np.minimum(
                    np.full(P, min(i, int(INF)), dtype=np.int16), up)
            if k >= 1:
                cell = np.minimum(cell, cur[:, k - 1] + np.int16(1))
            cur[:, k] = np.where(j <= n, np.minimum(cell, INF), INF)
        band = np.where(act[:, None], cur, band)
        hit = m == i
        if hit.any():
            res[hit] = band[hit, (n - m)[hit] + t]
    return res.astype(np.int64)


def edit_distance2_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    buckets: int | None = None, chunk: int = 1 << 21,
) -> "rd.Dataset":
    """EXACT near-dup pairs by byte Levenshtein distance <= 2:
    ``(id_a, id_b, edit)`` for every pair within two insertions,
    deletions or substitutions (``id_a < id_b``; distance 0/1
    included) — the radius-2 extension of ``edit_distance_pairs``.

    Blocking is the Pass-Join partition scheme (Li, Deng, Wang, Feng,
    "PASS-JOIN: a partition-based method for similarity joins",
    VLDB 2011): each string partitions into tau+1 = 3 even segments;
    if ``ed(a,b) <= 2`` then (pigeonhole) at least one segment of the
    SHORTER string is untouched by any edit and appears EXACTLY in
    the longer one, shifted by at most the net indels around it.  The
    shorter side indexes its 3 segments keyed by (segment bytes, i,
    own length L); the longer side probes, for each candidate index
    length L' in [L-2, L], the substrings at the multi-match-aware
    window of start positions [max(p_i - i, p_i + D - (2-i)),
    min(p_i + i, p_i + D + (2-i))] (D = length gap) — <= 12 probe +
    3 index signatures per row, each an O(1) substring hash off one
    prefix-sum pass.  Candidate recall is 1.0 by the Pass-Join
    selection lemma; hash collisions only ADD candidates.

    Strings shorter than 3 bytes cannot be cut into 3 non-empty
    segments, so every string of length <= 4 additionally lands in
    one shared "tiny" block (pairs whose shorter side is < 3 bytes
    have a longer side <= 4, so the tiny block covers exactly the
    pairs the partition scheme cannot).

    Verification is EXACT: a vectorized Ukkonen band-5 DP
    (``_banded_lev``) over each candidate chunk — loops run over
    byte position and the 5 band cells, never over pairs.

    Scale shape: ~15 signature rows per input row (vs L+1 for the
    radius-1 join), one signature exchange, bounded candidate chunks
    (``chunk``), one pair-distinct exchange.  Built for SHORT KEYS
    (names, titles, codes); byte-level distances (see
    ``edit_distance_pairs`` for the UTF-8 contract).

    No reference analogue: extends ``UniqueBy``
    (``rules/rules.go:104``) to the fuzzy-key regime."""
    TAU = 2
    C = np.uint64(0x9E3779B9)
    P = np.uint64(1099511628211)
    PINV = np.uint64(pow(1099511628211, -1, 1 << 64))
    G1 = np.uint64(0x9E3779B97F4A7C15)
    G2 = np.uint64(0xC2B2AE3D27D4EB4F)
    TINY_KEY = np.int64(-0x1D2E3F4A5B6C7D8E)

    def _part(L: np.ndarray, i: int):
        """Even-partition segment (start, len) arrays for lengths L."""
        base = L // 3
        rem = L % 3
        li = base + (i + rem >= 3).astype(L.dtype)
        pi = i * base + np.maximum(0, i + rem - 3)
        return pi, li

    def _sigs(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[text_col]))
        arr = tab[text_col].combine_chunks()
        n = tab.num_rows
        ids = tab[id_col].combine_chunks()
        offsets, data = _utf8_buffers(arr)
        lens = np.diff(offsets).astype(np.int64)
        total = int(offsets[-1])
        row_starts = offsets[:-1].astype(np.int64)
        # rolling polynomial prefix hashes with ROW-LOCAL exponents:
        # h(s[a:b)) = (cps[start+b] - cps[start+a]) * PINV^a
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            row_starts, lens)
        max_rank = int(intra.max()) + 1 if total else 1
        powt = np.empty(max_rank + 1, dtype=np.uint64)
        pinvt = np.empty(max_rank + 1, dtype=np.uint64)
        powt[0] = pinvt[0] = 1
        with np.errstate(over="ignore"):
            for k in range(1, max_rank + 1):
                powt[k] = powt[k - 1] * P
                pinvt[k] = pinvt[k - 1] * PINV
            terms = (data.astype(np.uint64) + C) * powt[intra]
            cps = np.concatenate(
                [np.zeros(1, np.uint64),
                 np.cumsum(terms, dtype=np.uint64)])

            def _sub_hash(ridx: np.ndarray, a: np.ndarray,
                          ln: np.ndarray) -> np.ndarray:
                s = row_starts[ridx]
                return ((cps[s + a + ln] - cps[s + a]) * pinvt[a]
                        + ln.astype(np.uint64) * G2)

            keys, rows, roles = [], [], []
            ridx_all = np.arange(n, dtype=np.int64)
            # --- index signatures: own 3 segments, keyed by own L
            big = np.flatnonzero(lens >= 3)
            for i in range(TAU + 1):
                pi, li = _part(lens[big], i)
                h = _sub_hash(big, pi, li) + np.uint64(i) * G1 \
                    + lens[big].astype(np.uint64) * C
                keys.append(_hash64(h).astype(np.int64))
                rows.append(big)
                roles.append(np.zeros(len(big), dtype=np.int8))
            # --- probe signatures: for each index length L' = L - D
            for D in range(TAU + 1):
                Lp = lens - D
                ok0 = Lp >= 3
                for i in range(TAU + 1):
                    lo = max(-i, D - (TAU - i))
                    hi = min(i, D + (TAU - i))
                    for s in range(lo, hi + 1):
                        pi, li = _part(Lp, i)
                        p = pi + s
                        ok = ok0 & (p >= 0) & (p + li <= lens)
                        r = ridx_all[ok]
                        if not len(r):
                            continue
                        h = _sub_hash(r, p[ok], li[ok]) \
                            + np.uint64(i) * G1 \
                            + Lp[ok].astype(np.uint64) * C
                        keys.append(_hash64(h).astype(np.int64))
                        rows.append(r)
                        roles.append(np.ones(len(r), dtype=np.int8))
            # --- tiny block: both roles for every string of len <= 4
            tiny = np.flatnonzero(lens <= TAU * 2)
            for role in (0, 1):
                keys.append(np.full(len(tiny), TINY_KEY, dtype=np.int64))
                rows.append(tiny)
                roles.append(np.full(len(tiny), role, dtype=np.int8))
        kk = np.concatenate(keys) if keys else np.empty(0, np.int64)
        rr = np.concatenate(rows) if rows else np.empty(0, np.int64)
        ro = np.concatenate(roles) if roles else np.empty(0, np.int8)
        # drop duplicate (key, row, role) sigs (repeated substrings in
        # one row, e.g. "aaaa") — exact lexsort dedup, no hash merge
        order = np.lexsort((ro, rr, kk))
        kk, rr, ro = kk[order], rr[order], ro[order]
        keep = np.ones(len(kk), dtype=bool)
        keep[1:] = ((kk[1:] != kk[:-1]) | (rr[1:] != rr[:-1])
                    | (ro[1:] != ro[:-1]))
        kk, rr, ro = kk[keep], rr[keep], ro[keep]
        take = pa.array(rr)
        return pa.table({"block_key": pa.array(kk),
                         "role": pa.array(ro, type=pa.int8()),
                         id_col: ids.take(take),
                         text_col: arr.take(take)})

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        _sigs, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("block_key", "ascending"),
                           ("role", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["block_key"])
        block_of = np.cumsum(new) - 1
        n_blocks = int(block_of[-1]) + 1 if len(block_of) else 0
        roles = tab["role"].combine_chunks().to_numpy(
            zero_copy_only=False)
        counts1 = np.bincount(block_of, weights=roles,
                              minlength=n_blocks).astype(np.int64)
        counts = np.bincount(block_of, minlength=n_blocks)
        counts0 = counts - counts1
        firsts = np.flatnonzero(new)
        firsts0 = firsts
        firsts1 = firsts + counts0
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        offsets, data = _utf8_buffers(tab[text_col].combine_chunks())
        lens = np.diff(offsets).astype(np.int64)
        out_a, out_b, out_e = [], [], []
        for a_i, b_i in _bipartite_pair_chunks(counts0, counts1,
                                               firsts0, firsts1, chunk):
            keep = (ids[a_i] != ids[b_i]) \
                & (np.abs(lens[a_i] - lens[b_i]) <= TAU)
            a_i, b_i = a_i[keep], b_i[keep]
            if not len(a_i):
                continue
            # same pair via several segments: verify each once
            u = np.unique(np.stack([a_i, b_i]), axis=1)
            a_i, b_i = u[0], u[1]
            ed = _banded_lev(a_i, b_i, offsets, data, lens, TAU)
            k = ed <= TAU
            ia, ib = ids[a_i[k]], ids[b_i[k]]
            sw = ia > ib
            out_a.append(np.where(sw, ib, ia))
            out_b.append(np.where(sw, ia, ib))
            out_e.append(ed[k])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "edit": pa.array([], type=pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "edit": pa.array(np.concatenate(out_e).astype(np.int64)),
        })

    pairs = bucketed_map_groups(sig_ds, ["block_key"], _pairs,
                                buckets=buckets, sort_within=False)

    def _dedup_pairs(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("edit", "min")], ["edit"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup_pairs,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


def simhash_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    max_hamming: int = 3, n_blocks: int = 4, buckets: int | None = None,
    max_group: int = 1024,
) -> "rd.Dataset":
    """Near-dup pairs by 64-bit SimHash: block-permutation blocking (any
    pair within hamming distance d < n_blocks shares at least one exact
    16-bit block), verify hamming inside candidate groups.
    Returns (id_a, id_b, hamming).

    ``max_group`` caps candidate-group size: a degenerate block value
    shared by more than this many rows (e.g. near-empty docs all
    hashing block 0) would cost O(m^2) verification; such groups are
    skipped — a pair within hamming <= d shares another block with
    overwhelming probability."""
    bits = 64 // n_blocks

    def _sigs(tab: pa.Table) -> pa.Table:
        arr = tab[text_col].combine_chunks()
        rid, h = word_shingle_hashes(arr, k=1)
        sh = simhash64(rid, h, tab.num_rows)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        parts = []
        for b in range(n_blocks):
            block = (sh >> np.uint64(b * bits)) & np.uint64((1 << bits) - 1)
            parts.append(pa.table({
                "block": pa.array(np.full(len(ids), b, dtype=np.int32)),
                "block_key": pa.array(block.astype(np.int64)),
                id_col: pa.array(ids),
                "simhash": pa.array(sh.astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        _sigs, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("block", "ascending"), ("block_key", "ascending"),
                           (id_col, "ascending")])
        new = segment_starts(tab, ["block", "block_key"])
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sh = tab["simhash"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        # per-size pair templates + vectorized popcount over bounded
        # pair chunks — no per-group Python work, no unbounded pair
        # materialization; giant groups (degenerate block values)
        # star-pair inside the helper
        out_a, out_b, out_h = [], [], []
        for a_i, b_i in _group_pair_chunks(counts, np.flatnonzero(new),
                                           max_group):
            ham = _popcount64(sh[a_i] ^ sh[b_i])
            keep = ham <= max_hamming
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "hamming": pa.array(np.concatenate(out_h)),
        })

    pairs = bucketed_map_groups(sig_ds, ["block_key"], _pairs,
                                buckets=buckets, sort_within=False)

    def _dedup_pairs(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["id_a", "id_b"],
                         [("hamming", "min")], ["hamming"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], _dedup_pairs,
                               buckets=(None if buckets is None
                                        else max(8, buckets // 8)),
                               sort_within=False)


# ---------------------------------------------------------------------------
# Character-set Jaccard within groups (exact; DuckDB-oracle-compatible:
# jaccard(s1, s2) over distinct character sets)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Exact candidate verification (shared by the MinHash / SimHash near-dup
# pipelines): LSH produces CANDIDATE pairs; the exact pass recomputes the
# true shingle-set Jaccard for just the involved documents, so the final
# output has precision 1.0 by construction and is SQL-oracle-checkable.
# ---------------------------------------------------------------------------

def _row_shingle_sets(arr: pa.Array, kind: str) -> list[np.ndarray]:
    """Per-row sorted unique shingle-hash sets.

    kind="char5": distinct character 5-shingles over UTF-8 bytes (a row
    shorter than 5 contributes its whole text; empty rows the empty
    sequence) — matches the SQL set
    ``list_distinct(list_transform(generate_series(1, greatest(len-4,1)),
    i -> substr(text, i, 5)))``.

    kind="word3": distinct word 3-grams of the lowercased
    whitespace-tokenized text (fewer than 3 tokens => one shingle of all
    tokens) — matches
    ``list_distinct(list_transform(generate_series(1, greatest(n-2,1)),
    i -> array_to_string(list_slice(tokens, i, i+2), ' ')))`` with
    ``tokens = regexp_extract_all(lower(text), '\\S+')``.

    Runs only over candidate documents (bounded by the LSH pair count),
    so the small per-row python loop in the word path is off the corpus
    hot path."""
    if kind == "char5":
        rid, h = char_shingle_hashes(arr, k=5)
        order = np.lexsort((h, rid))
        rid, h = rid[order], h[order]
        out: list[np.ndarray] = []
        bounds = np.searchsorted(rid, np.arange(len(arr) + 1))
        for i in range(len(arr)):
            out.append(np.unique(h[bounds[i]:bounds[i + 1]]))
        return out
    if kind == "word3":
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=r"\s+")
        flat = toks.flatten() if isinstance(toks, pa.Array) else \
            pc.list_flatten(toks)
        th = hash_strings(flat.combine_chunks() if isinstance(
            flat, pa.ChunkedArray) else flat)
        nonempty = np.asarray(pc.not_equal(flat, "").fill_null(False))
        counts = pc.list_value_length(toks).fill_null(0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        prime = np.uint64(0x100000001B3)
        out = []
        for i in range(len(arr)):
            h_i = th[starts[i]:starts[i] + counts[i]][
                nonempty[starts[i]:starts[i] + counts[i]]]
            n = len(h_i)
            if n >= 3:
                combo = (h_i[:-2] * prime + h_i[1:-1]) * prime + h_i[2:]
            else:
                c = np.uint64(0)
                for v in h_i:
                    c = c * prime + v
                combo = np.array([c], dtype=np.uint64)
            out.append(np.unique(_hash64(combo & _MASK64)))
        return out
    raise ValueError(f"unknown shingle kind: {kind}")


def exact_shingle_jaccard_pairs(
    ds: "rd.Dataset", candidates: "rd.Dataset | pa.Table",
    text_col: str, id_col: str, *, kind: str = "char5",
    threshold: float = 0.5, round_digits: int = 4,
) -> pa.Table:
    """Exact shingle-set Jaccard for candidate pairs: one column-pruned
    scan extracts shingle sets for ONLY the documents named by the
    candidate pairs (a broadcast semi-join — involved docs are O(pairs),
    never the corpus), then each pair's true Jaccard is computed and
    filtered at ``threshold``.  Returns (id_a, id_b, jaccard) sorted by
    (id_a, id_b), jaccard rounded to ``round_digits``."""
    import ray

    if isinstance(candidates, rd.Dataset):
        ctabs = [t for t in ray.get(candidates.to_arrow_refs())
                 if t.num_rows]
        cand = pa.concat_tables(ctabs) if ctabs else pa.table(
            {"id_a": pa.array([], type=pa.int64()),
             "id_b": pa.array([], type=pa.int64())})
    else:
        cand = candidates
    a = cand["id_a"].to_numpy(zero_copy_only=False)
    b = cand["id_b"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    involved = np.unique(np.concatenate([a, b]))
    inv_set = ray.put(pa.array(involved, type=pa.int64()))

    def _extract(tab: pa.Table) -> pa.Table:
        sel = tab.filter(pc.is_in(tab[id_col], value_set=ray.get(inv_set)))
        if sel.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "sh": pa.array([], type=pa.list_(pa.uint64()))})
        sets = _row_shingle_sets(sel[text_col].combine_chunks(), kind)
        return pa.table({
            id_col: sel[id_col],
            "sh": pa.array([s for s in sets], type=pa.list_(pa.uint64())),
        })

    stabs = [t for t in ray.get(
        ds.select_columns([id_col, text_col]).map_batches(
            _extract, batch_format="pyarrow").to_arrow_refs()) if t.num_rows]
    sets_tab = pa.concat_tables(stabs) if stabs else pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "sh": pa.array([], type=pa.list_(pa.uint64()))})

    # vectorized pair canonicalization + dedup: (lo, hi) sorted rows
    # (lexsort + adjacent-diff mask — ~2x np.unique(axis=0), which
    # sorts void-dtype row views)
    lo = np.minimum(a, b).astype(np.int64)
    hi = np.maximum(a, b).astype(np.int64)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    first = np.concatenate([[True], (lo[1:] != lo[:-1]) |
                            (hi[1:] != hi[:-1])]) if len(lo) else \
        np.zeros(0, dtype=bool)
    pairs = np.stack([lo[first], hi[first]], axis=1)

    # verify in PARALLEL tasks, not a driver loop: contiguous chunks of
    # the sorted pair list (concat of chunk outputs stays globally
    # sorted); each task semi-joins the broadcast sets table down to
    # the docs its chunk names, so per-task memory is O(chunk), and the
    # per-pair intersect runs in the worker
    chunk = max(20_000, -(-len(pairs) // 64))
    n_chunks = -(-len(pairs) // chunk)
    if n_chunks <= 1:
        parts = [_verify_pair_chunk(pairs, sets_tab, id_col,
                                    threshold, round_digits)]
    else:
        sets_ref = ray.put(sets_tab)
        parts = ray.get([
            _verify_pair_chunk_task.remote(
                pairs[i * chunk:(i + 1) * chunk], sets_ref, id_col,
                threshold, round_digits)
            for i in range(n_chunks)])
    return pa.concat_tables(parts)


def _verify_pair_chunk(pairs: np.ndarray, sets_tab: pa.Table,
                       id_col: str, threshold: float,
                       round_digits: int) -> pa.Table:
    """Exact-Jaccard verify one chunk of canonical (lo, hi) pairs
    against the shingle-sets table (filtered to the chunk's docs).

    Two exact (no recall loss) vectorized prefilters run before any
    per-pair work: pairs naming a doc with no set are dropped, and the
    size-ratio upper bound J <= min(|A|,|B|)/max(|A|,|B|) eliminates
    pairs that cannot reach the threshold — on shared-vocabulary
    corpora this kills the large majority of LSH/simhash false
    candidates for free.  Survivors are intersected via binary search
    into the (sorted-unique) smaller... larger set."""
    from . import round_half_away

    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    if len(pairs) == 0:
        return empty
    need = np.unique(pairs.ravel())
    sel = sets_tab.filter(pc.is_in(
        sets_tab[id_col], value_set=pa.array(need, type=pa.int64())))
    if sel.num_rows == 0:
        return empty
    ids = sel[id_col].to_numpy(zero_copy_only=False)
    sh = sel["sh"].combine_chunks()
    flat = np.asarray(sh.values)
    offs = np.asarray(sh.offsets).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    starts_s = offs[:-1][order]
    lens_s = (offs[1:] - offs[:-1])[order]

    # vectorized id -> set-row resolution (both docs must have a set)
    plo = np.searchsorted(ids_s, pairs[:, 0]).clip(0, len(ids_s) - 1)
    phi = np.searchsorted(ids_s, pairs[:, 1]).clip(0, len(ids_s) - 1)
    valid = (ids_s[plo] == pairs[:, 0]) & (ids_s[phi] == pairs[:, 1])
    la, lb = lens_s[plo], lens_s[phi]
    # size-ratio upper bound (exact): inter <= min, union >= max
    ub = np.minimum(la, lb) / np.maximum(np.maximum(la, lb), 1)
    survivors = np.flatnonzero(valid & (ub >= threshold))

    out_a, out_b, out_j = [], [], []
    for i in survivors:
        sa = flat[starts_s[plo[i]]:starts_s[plo[i]] + la[i]]
        sb = flat[starts_s[phi[i]]:starts_s[phi[i]] + lb[i]]
        if len(sa) > len(sb):
            sa, sb = sb, sa
        pos = np.searchsorted(sb, sa).clip(0, len(sb) - 1)
        inter = int(np.count_nonzero(sb[pos] == sa)) if len(sb) else 0
        union = int(la[i]) + int(lb[i]) - inter
        j = inter / max(union, 1)
        if j >= threshold:
            out_a.append(int(pairs[i, 0]))
            out_b.append(int(pairs[i, 1]))
            out_j.append(float(round_half_away(j, round_digits)))
    return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                     "id_b": pa.array(out_b, type=pa.int64()),
                     "jaccard": pa.array(out_j, type=pa.float64())})


@ray.remote(num_cpus=1)
def _verify_pair_chunk_task(pairs, sets_tab, id_col, threshold,
                            round_digits) -> pa.Table:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    return _verify_pair_chunk(pairs, sets_tab, id_col, threshold,
                              round_digits)


def minhash_near_dup_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    jaccard_threshold: float = 0.5, **lsh_kwargs,
) -> pa.Table:
    """MinHash+LSH candidates + exact char-5-shingle verification over
    UTF-8 BYTE shingles: (id_a, id_b, jaccard) with the TRUE Jaccard,
    filtered at ``jaccard_threshold``.

    Precision is 1.0 by construction.  Recall is PROBABILISTIC, not
    guaranteed: the banding recall at the threshold (1-(1-t^r)^b;
    ~1.0 for near-identical pairs, lower for pairs sitting exactly at
    the threshold) times the chance the 64-perm signature estimate
    clears the candidate floor — a 2.4-sigma margin below the
    threshold (sigma = sqrt(t(1-t)/n_perm)).  A wider margin costs
    candidate volume quadratically on shared-vocabulary corpora
    (measured at sf0.1: floor 0.35 -> 29k candidates, 0.25 -> 383k).
    The SQL-oracle equality asserted by the driver holds for the test
    corpora (all qualifying pairs >= 0.9 true Jaccard), not
    universally.  Byte shingles equal character shingles only for
    ASCII text (multibyte codepoints share lead/continuation bytes)."""
    n_perm = lsh_kwargs.get("n_perm", 64)
    sigma = (jaccard_threshold * (1 - jaccard_threshold) / n_perm) ** 0.5
    est_floor = max(0.0, jaccard_threshold - 2.4 * sigma)
    cands = minhash_lsh_pairs(ds, text_col, id_col,
                              jaccard_threshold=est_floor, **lsh_kwargs)
    return exact_shingle_jaccard_pairs(
        ds, cands, text_col, id_col, kind="char5",
        threshold=jaccard_threshold)


def ngram_jaccard_near_dup_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    jaccard_threshold: float = 0.6, **lsh_kwargs,
) -> pa.Table:
    """Word n-gram Jaccard near-duplicates: MinHash+LSH candidate
    generation over WORD 3-gram shingles, exact word-3-gram Jaccard
    verification — the n-gram-Jaccard member of the dedup family
    (exact / MinHash / SimHash / n-gram Jaccard / embedding-cosine).

    Precision is 1.0 by construction (every emitted pair carries its
    TRUE word-3-shingle Jaccard >= ``jaccard_threshold``).  Recall is
    the LSH banding recall at the candidate floor — the same 2.4-sigma
    margin construction as :func:`minhash_near_dup_pairs`, evaluated on
    word-shingle signatures instead of char shingles.  Word shingles
    make the score tokenization-aware (reordered / partially rewritten
    documents score by shared phrases, not shared bytes), at ~20x fewer
    features per document than char-5 shingles."""
    n_perm = lsh_kwargs.get("n_perm", 64)
    sigma = (jaccard_threshold * (1 - jaccard_threshold) / n_perm) ** 0.5
    est_floor = max(0.0, jaccard_threshold - 2.4 * sigma)
    cands = minhash_lsh_pairs(ds, text_col, id_col, shingles="word3",
                              jaccard_threshold=est_floor, **lsh_kwargs)
    return exact_shingle_jaccard_pairs(
        ds, cands, text_col, id_col, kind="word3",
        threshold=jaccard_threshold)


def contamination_flags(
    corpus: "rd.Dataset", probes: "rd.Dataset", text_col: str,
    id_col: str, *, bits_log2: int = 20, n_hashes: int = 4,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Train/eval decontamination: ids of corpus rows whose ``text``
    EXACTLY matches any probe row's text (benchmark contamination
    check).  Returns a Dataset of ``(id,)``.

    Scale shape: the probe set is reduced to a Bloom filter (2^bits
    bits; 2^20 = 128 KiB regardless of probe count) built from
    per-block partial bitmaps OR-merged on the driver and broadcast
    ONCE via ``ray.put`` — the corpus is filtered locally to candidate
    rows (true matches + the Bloom false-positive rate), and only the
    candidates shuffle.  The exact pass co-locates candidates with
    probe texts by hash bucket and compares TEXT (not hashes), so the
    result is exact even under 64-bit hash collisions."""
    mask_bits = (1 << bits_log2) - 1

    def _positions(h: np.ndarray) -> np.ndarray:
        # n_hashes derived positions per key: h1 + i*h2 (Kirsch-
        # Mitzenmacher double hashing)
        h2 = _hash64(h)
        return np.stack([(h + np.uint64(i) * h2).astype(np.uint64)
                         & np.uint64(mask_bits)
                         for i in range(n_hashes)])

    words = 1 << max(0, bits_log2 - 6)

    def _partial_bloom(tab: pa.Table) -> pa.Table:
        h = hash_strings(tab[text_col].combine_chunks())
        bm = np.zeros(words, dtype=np.uint64)
        pos = _positions(h).ravel()
        np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bloom": pa.array([bm.tobytes()],
                                           type=pa.large_binary())})

    parts = [t for t in ray.get(
        probes.select_columns([text_col]).map_batches(
            _partial_bloom, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    bloom = np.zeros(words, dtype=np.uint64)
    for t in parts:
        for chunk in t["bloom"].to_pylist():
            bloom |= np.frombuffer(chunk, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def _candidates(tab: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        h = hash_strings(tab[text_col].combine_chunks())
        pos = _positions(h)
        hit = np.ones(len(h), dtype=bool)
        for i in range(n_hashes):
            hit &= (bm[(pos[i] >> np.uint64(6)).astype(np.int64)]
                    >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
        return pa.table({
            id_col: pc.cast(tab[id_col], pa.int64()).filter(
                pa.array(hit)),
            "h": pa.array(h[hit].astype(np.int64)),
            text_col: tab[text_col].filter(pa.array(hit)),
            "is_probe": pa.array(np.zeros(int(hit.sum()), dtype=bool)),
        })

    cands = corpus.select_columns([id_col, text_col]).map_batches(
        _candidates, batch_format="pyarrow")

    def _probe_side(tab: pa.Table) -> pa.Table:
        h = hash_strings(tab[text_col].combine_chunks())
        # explicit marker column — a null corpus id must NOT make a
        # row count as a probe
        return pa.table({
            id_col: pa.nulls(tab.num_rows, type=pa.int64()),
            "h": pa.array(h.astype(np.int64)),
            text_col: tab[text_col],
            "is_probe": pa.array(np.ones(tab.num_rows, dtype=bool)),
        })

    probe_side = probes.select_columns([text_col]).map_batches(
        _probe_side, batch_format="pyarrow")

    def _verify(tab: pa.Table) -> pa.Table:
        is_probe = np.asarray(tab["is_probe"].combine_chunks(),
                              dtype=bool)
        ptexts = tab[text_col].filter(pa.array(is_probe)).combine_chunks()
        crows = tab.filter(pa.array(~is_probe))
        if crows.num_rows == 0 or len(ptexts) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        hit = pc.is_in(crows[text_col], value_set=ptexts)
        return pa.table({id_col: crows[id_col].filter(hit)})

    return bucketed_map_groups(cands.union(probe_side), ["h"], _verify,
                               buckets=buckets, sort_within=False)


def window_hashes(arr: pa.Array, k: int):
    """All byte-window hashes of length ``k`` per row, deduplicated
    per row keeping the FIRST occurrence position: returns
    (row_ids int64, positions int64, hashes uint64), rows shorter than
    ``k`` contribute nothing.  One prefix-sum rolling hash over the
    flat UTF-8 buffer — no Python loop over rows or windows."""
    from ..state.sketches import _hash_flat_segments

    if arr.null_count:
        arr = pc.fill_null(arr, "")
    offsets, data = _utf8_buffers(arr)
    n = len(offsets) - 1
    starts, ends = offsets[:-1], offsets[1:]
    n_w = np.maximum(ends - starts - (k - 1), 0)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), n_w)
    if len(row_ids) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z.astype(np.uint64)
    base = np.repeat(starts, n_w)
    excl = np.concatenate([[0], np.cumsum(n_w)[:-1]])
    local = np.arange(len(row_ids), dtype=np.int64) - np.repeat(excl, n_w)
    pos = base + local
    h = _hash64(_hash_flat_segments(data, pos, pos + k))
    # per-row distinct hashes, first position wins: sort by
    # (row, hash, pos) and keep the first of each (row, hash) run
    order = np.lexsort((local, h, row_ids))
    r_s, h_s, l_s = row_ids[order], h[order], local[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    return r_s[first], l_s[first], h_s[first]


def common_substring_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *, k: int = 32,
    buckets: int | None = None, max_group: int = 1024, sample_mod: int = 1,
) -> "rd.Dataset":
    """Exact substring-duplication detection: document pairs sharing at
    least one identical ``k``-byte substring (the operator behind
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022 — hashed fixed-length windows instead of a suffix array,
    the shape that distributes).  Returns distinct (id_a, id_b) with
    id_a < id_b.

    Pipeline: one ``map_batches`` pass rolls a prefix-sum hash over
    every k-byte window (deduped per doc, first position kept), ONE
    hash shuffle on the window hash co-locates candidates, and each
    candidate pair is verified EXACTLY by comparing the actual k bytes
    at the two recorded positions — both docs emitted the same hash
    from their own window, so verification is a vectorized equality of
    two (n_pairs, k) byte matrices, no containment search.  A 64-bit
    collision can only create a candidate (killed by the verify), not
    a false positive; a missed true pair would need every shared
    window of the pair to collide with a different same-doc substring
    (~2^-64 per window — documented, not defended).

    ``sample_mod`` > 1 keeps only windows with hash % mod == 0 (a
    deterministic 1/mod winnowing for the 100 TB path: row
    amplification drops from ~len(text) to ~len(text)/mod; recall for
    pairs sharing m windows becomes 1-(1-1/mod)^m).  ``max_group``
    star-pairs degenerate groups (a window shared by thousands of docs
    — boilerplate headers) instead of paying O(m^2); at default 1 the
    sf-test corpora never hit it, preserving SQL-oracle equality.
    Byte windows equal character windows only for ASCII text.
    """

    def _wins(tab: pa.Table) -> pa.Table:
        rid, pos, h = window_hashes(tab[text_col].combine_chunks(), k)
        if sample_mod > 1:
            keep = (h % np.uint64(sample_mod)) == 0
            rid, pos, h = rid[keep], pos[keep], h[keep]
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "win": pa.array(h.astype(np.int64)),
            id_col: pa.array(ids[rid]),
            "pos": pa.array(pos.astype(np.int64)),
        })

    wins = ds.select_columns([id_col, text_col]).map_batches(
        _wins, batch_format="pyarrow")

    def _pairs(tab: pa.Table) -> pa.Table:
        # each (window, doc) row is globally unique by construction
        # (hashes dedup per row, a doc's text lives in exactly one
        # batch), so groups are sets of distinct docs already.  Pair
        # emission is vectorized PER GROUP SIZE, not per group: all
        # groups of size s share one triu index template, so the
        # Python loop runs once per distinct size (a handful), never
        # once per group (tens of thousands on dup-heavy corpora)
        tab = tab.sort_by([("win", "ascending"), (id_col, "ascending")])
        new = segment_starts(tab, ["win"])
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id) if len(seg_id) else \
            np.zeros(0, dtype=np.int64)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = tab["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        chunks = list(_group_pair_chunks(counts, np.flatnonzero(new),
                                         max_group))
        if not chunks:
            return pa.table({
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "pos_a": pa.array([], type=pa.int64()),
                "pos_b": pa.array([], type=pa.int64())})
        A = np.concatenate([c[0] for c in chunks])
        B = np.concatenate([c[1] for c in chunks])
        return pa.table({
            "id_a": pa.array(ids[A].astype(np.int64)),
            "id_b": pa.array(ids[B].astype(np.int64)),
            "pos_a": pa.array(pos[A].astype(np.int64)),
            "pos_b": pa.array(pos[B].astype(np.int64)),
        })

    cand = bucketed_map_groups(wins, ["win"], _pairs, buckets=buckets,
                               sort_within=False)

    # candidates are O(pairs) — tiny next to the corpus — so dedup on
    # the driver (lexsort, the exact_shingle_jaccard_pairs pattern)
    # instead of paying a second shuffle.  One witness per distinct
    # pair is enough for the verify, but it must be a CONSISTENT
    # (pos_a, pos_b) from ONE shared window (min(pos_a), min(pos_b)
    # could mix two windows): keep the lexicographically-first row
    ctabs = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not ctabs:
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64())}))
    call = pa.concat_tables(ctabs)
    _a = call["id_a"].to_numpy(zero_copy_only=False)
    _b = call["id_b"].to_numpy(zero_copy_only=False)
    _pa = call["pos_a"].to_numpy(zero_copy_only=False)
    _pb = call["pos_b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((_pb, _pa, _b, _a))
    a_s, b_s = _a[order], _b[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    keep = order[first]
    call = pa.table({
        "id_a": pa.array(_a[keep]), "id_b": pa.array(_b[keep]),
        "pos_a": pa.array(_pa[keep]), "pos_b": pa.array(_pb[keep])})
    # distributed exact verify: the corpus text is NEVER gathered — the
    # driver holds only the O(pairs) candidates and O(pairs x k) window
    # bytes.  A (doc, pos, slot) request table (two rows per pair) is
    # broadcast ONCE via ray.put; each corpus batch slices the k-byte
    # windows for the requests whose doc lives in that batch (doc ids
    # are unique, so every request matches exactly one batch), and only
    # those tiny windows come back.
    n_pairs = call.num_rows
    a = call["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = call["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    pa_ = call["pos_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    pb_ = call["pos_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    req_ref = ray.put(pa.table({
        id_col: pa.array(np.concatenate([a, b])),
        "pos": pa.array(np.concatenate([pa_, pb_])),
        "slot": pa.array(np.arange(2 * n_pairs, dtype=np.int64)),
    }))
    span = np.arange(k, dtype=np.int64)[None, :]

    def _extract(tab: pa.Table) -> pa.Table:
        req = ray.get(req_ref)
        row_of = pc.index_in(req[id_col],
                             value_set=tab[id_col].combine_chunks())
        have = pc.is_valid(row_of)
        sel = req.filter(have)
        if sel.num_rows == 0:
            return pa.table({
                "slot": pa.array([], type=pa.int64()),
                "win": pa.array([], type=pa.list_(pa.uint8(), k))})
        rows = row_of.filter(have).to_numpy(
            zero_copy_only=False).astype(np.int64)
        toffs, tdata = _utf8_buffers(pc.cast(
            tab[text_col].combine_chunks(), pa.large_binary()))
        start = toffs[:-1][rows] + sel["pos"].to_numpy(
            zero_copy_only=False)
        start = start.clip(0, max(len(tdata) - k, 0))
        win = tdata[start[:, None] + span]
        return pa.table({
            "slot": sel["slot"],
            "win": pa.FixedSizeListArray.from_arrays(
                pa.array(win.ravel(), type=pa.uint8()), k)})

    wtabs = [t for t in ray.get(
        ds.select_columns([id_col, text_col]).map_batches(
            _extract, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    wins = np.zeros((2 * n_pairs, k), dtype=np.uint8)
    got = np.zeros(2 * n_pairs, dtype=bool)
    if wtabs:
        wt = pa.concat_tables(wtabs)
        slots = wt["slot"].to_numpy(zero_copy_only=False)
        mat = np.asarray(wt["win"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)).reshape(-1, k)
        wins[slots] = mat
        got[slots] = True
    ok = (got[:n_pairs] & got[n_pairs:]
          & (wins[:n_pairs] == wins[n_pairs:]).all(axis=1))
    out = pa.table({"id_a": pa.array(a[ok]), "id_b": pa.array(b[ok])})
    return rd.from_arrow(out.sort_by([("id_a", "ascending"),
                                      ("id_b", "ascending")]))


LOCAL_CC_MAX_BYTES = 128 << 20


def _cc_local(id_a: str, id_b: str, *tabs: pa.Table) -> pa.Table:
    """Single-task connected components: vectorized edge-min +
    pointer-jumping label compression (O(log n) vectorized rounds,
    no per-edge Python).  Same contract as the distributed rounds:
    (node, rep) with rep = component minimum."""
    tabs = [t for t in tabs if t.num_rows]
    tab = pa.concat_tables(tabs)
    a = pc.cast(tab[id_a], pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(tab[id_b], pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lab.copy()
        m = np.minimum(lab[ia], lab[ib])
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        while True:
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, before):
            break
    return pa.table({"node": pa.array(nodes),
                     "rep": pa.array(nodes[lab])})


@ray.remote(num_cpus=1)
def _cc_local_task(id_a, id_b, *tabs) -> pa.Table:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    return _cc_local(id_a, id_b, *tabs)


def connected_components(
    pairs: "rd.Dataset | pa.Table", *, id_a: str = "id_a",
    id_b: str = "id_b", max_rounds: int = 64, buckets=None,
    local_max_bytes: int = LOCAL_CC_MAX_BYTES,
) -> "rd.Dataset":
    """Distributed connected components over an edge list: returns a
    ``(node, rep)`` Dataset covering every node that appears in an
    edge, with ``rep`` = the component's minimum node id.

    Hash-to-min (Rastogi et al. 2013, "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds"): the state is cluster-membership
    rows ``(owner, member)``; each round every owner group sends its
    whole member set to the group minimum and the minimum to every
    member, REWIRING the graph toward a star per component — that
    rewiring is what makes chain-shaped components converge in
    O(log n) rounds where plain label propagation needs O(diameter).

    Built entirely from the repo's bucketed hash exchange: ONE keyed
    exchange per round whose group function both canonicalizes the
    state (dedupe + sort per owner) and emits the round's messages —
    the two outputs share a table distinguished by a ``tag`` column.
    Group-min correctness requires COMPLETE owner groups, which only
    the inside of ``bucketed_map_groups``'s gather guarantees: Ray
    dynamically splits output blocks at ``target_max_block_size``, so
    a bare ``map_batches`` over the exchange's OUTPUT may see an owner
    group severed mid-block (observed: a 500-row group split across 28
    batches) and would compute batch-local minima, permanently severing
    components near convergence.  A tiny per-round (row-count,
    set-checksum) aggregate is the convergence signal (row-hash sums
    are order-independent, hence split-safe).  The driver holds two
    scalars per round, never a node or an edge — a duplicate-heavy
    corpus with O(corpus) near-dup edges cannot OOM it (the weakness
    of a driver-side union-find).  Peak skew: the final star's owner
    group is the component size; one component's rows always share a
    bucket.

    Adaptive small-graph path: when the edge list's size is ALREADY
    KNOWN without executing anything (a driver-side Table, or a
    materialized Dataset) and is at most ``local_max_bytes``
    (default 128 MiB), the rounds collapse into ONE remote task doing
    vectorized edge-min + pointer-jumping — the O(log n) exchange
    rounds each cost a full shuffle of fixed latency, which dominates
    wall time for the small-to-medium graphs the big path's first
    rounds would reduce to anyway.  An unmeasured streaming Dataset
    never takes this path (nothing is materialized just to decide).
    """
    if isinstance(pairs, pa.Table):
        if pairs.nbytes <= local_max_bytes:
            if pairs.num_rows == 0:
                return rd.from_arrow(pa.table(
                    {"node": pa.array([], type=pa.int64()),
                     "rep": pa.array([], type=pa.int64())}))
            return rd.from_arrow(ray.get(
                _cc_local_task.remote(id_a, id_b, pairs)))
        pairs = rd.from_arrow(pairs)
    else:
        try:
            from ray.data.dataset import MaterializedDataset
            is_mat = isinstance(pairs, MaterializedDataset)
        except ImportError:       # pragma: no cover - old ray layout
            is_mat = False
        if is_mat and (pairs.size_bytes() or 0) <= local_max_bytes:
            refs = list(pairs.to_arrow_refs())
            if not refs or pairs.count() == 0:
                return rd.from_arrow(pa.table(
                    {"node": pa.array([], type=pa.int64()),
                     "rep": pa.array([], type=pa.int64())}))
            # refs pass straight through to the task (no driver copy)
            return rd.from_arrow(ray.get(
                _cc_local_task.remote(id_a, id_b, *refs)))

    # init: every edge contributes both directions plus self rows, so
    # each endpoint's group contains itself (hash-to-min's C(v) ⊇ {v})
    def _init(tab: pa.Table) -> pa.Table:
        a = pc.cast(tab[id_a], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(tab[id_b], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "owner": pa.array(np.concatenate([a, b, a, b]),
                              type=pa.int64()),
            "member": pa.array(np.concatenate([b, a, a, b]),
                               type=pa.int64())})

    state = pairs.map_batches(_init, batch_format="pyarrow")

    _EMPTY = pa.table({"owner": pa.array([], type=pa.int64()),
                       "member": pa.array([], type=pa.int64())})

    def _dedup(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return _EMPTY
        tab = tab.sort_by([("owner", "ascending"),
                           ("member", "ascending")])
        o = tab["owner"].to_numpy(zero_copy_only=False)
        m = tab["member"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(o), dtype=bool)
        keep[1:] = (o[1:] != o[:-1]) | (m[1:] != m[:-1])
        return pa.table({"owner": pa.array(o[keep], type=pa.int64()),
                         "member": pa.array(m[keep], type=pa.int64())})

    def _chk(tab: pa.Table) -> pa.Table:
        """Order-independent set checksum partial: sum of mixed 64-bit
        row hashes (as a decimal string — block partials are summed
        with Python ints on the driver, O(blocks))."""
        o = tab["owner"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = tab["member"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _hash64(o * np.uint64(0x9E3779B97F4A7C15) ^ _hash64(m))
        return pa.table({
            "cnt": pa.array([tab.num_rows], type=pa.int64()),
            "chk": pa.array([str(int(h.sum(dtype=np.uint64)))]),
        })

    _EMPTY_TAGGED = pa.table({
        "owner": pa.array([], type=pa.int64()),
        "member": pa.array([], type=pa.int64()),
        "tag": pa.array([], type=pa.uint8())})

    def _dedup_emit(tab: pa.Table) -> pa.Table:
        """One bucket's round step, inside the gather (complete owner
        groups guaranteed): canonicalize (tag=0) AND emit the round's
        messages (tag=1, min → every member and every member → min).
        Fused so group minima are computed where group completeness
        holds — a bare map_batches over the exchange output sees
        dynamically-split blocks and would sever components."""
        tab = _dedup(tab)
        if tab.num_rows == 0:
            return _EMPTY_TAGGED
        o = tab["owner"].to_numpy(zero_copy_only=False)
        m = tab["member"].to_numpy(zero_copy_only=False)
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        seg = np.cumsum(new) - 1
        # members are ascending within each owner group (dedupe sorted)
        mins = m[np.flatnonzero(new)][seg]
        n_canon, n_msg = len(o), 2 * len(m)
        return pa.table({
            "owner": pa.array(
                np.concatenate([o, mins, m]), type=pa.int64()),
            "member": pa.array(
                np.concatenate([m, m, mins]), type=pa.int64()),
            "tag": pa.array(np.concatenate([
                np.zeros(n_canon, dtype=np.uint8),
                np.ones(n_msg, dtype=np.uint8)]))})

    def _take_tag(tag: int):
        def _f(tab: pa.Table) -> pa.Table:
            keep = tab.filter(pc.equal(tab["tag"], tag))
            return keep.drop_columns(["tag"])
        return _f

    prev = None
    for _ in range(max_rounds):
        both = bucketed_map_groups(state, ["owner"], _dedup_emit,
                                   buckets=buckets,
                                   sort_within=False).materialize()
        canon = both.map_batches(_take_tag(0), batch_format="pyarrow")
        parts = [t for t in ray.get(
            canon.map_batches(_chk, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        cnt = sum(int(c) for t in parts for c in t["cnt"].to_pylist())
        chk = sum(int(c) for t in parts for c in t["chk"].to_pylist())
        if (cnt, chk) == prev:
            # converged: every non-rep's group is {rep}, the rep's
            # group is its component — extract rep(v) = min owner
            # over rows with member = v
            def _as_node(tab: pa.Table) -> pa.Table:
                return pa.table({"node": tab["member"],
                                 "rep": tab["owner"]})

            def _min_rep(tab: pa.Table) -> pa.Table:
                if tab.num_rows == 0:
                    return pa.table(
                        {"node": pa.array([], type=pa.int64()),
                         "rep": pa.array([], type=pa.int64())})
                return agg_named(tab, ["node"], [("rep", "min")],
                                 ["rep"])

            return bucketed_map_groups(
                canon.map_batches(_as_node, batch_format="pyarrow"),
                ["node"], _min_rep, buckets=buckets, sort_within=False)
        prev = (cnt, chk)
        state = both.map_batches(_take_tag(1), batch_format="pyarrow")
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds")


def near_dup_clusters(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    jaccard_threshold: float = 0.5,
    pairs: "pa.Table | rd.Dataset | None" = None, mode: str = "auto",
    keep_by: str | None = None,
    **lsh_kwargs,
) -> "rd.Dataset":
    """Near-duplicate CLUSTERS and the keep/drop verdict per document:
    ``(id, rep_id, keep)`` for every input row.

    Connected components over the exact-verified near-dup pair graph
    (:func:`minhash_near_dup_pairs` unless ``pairs`` is supplied);
    ``rep_id`` = the smallest id in the component (first-wins, matching
    the reference's ``UniqueBy`` first-dup semantics,
    ``rules/rules.go:116-135``); ``keep`` = (id == rep_id).  Filtering
    on ``keep`` yields the deduplicated corpus.

    ``keep_by``: name of a numeric column of ``ds`` — the curation
    "keep the best duplicate" policy: within each cluster the kept row
    maximizes that column (ties → smallest id) instead of first-wins;
    ``rep_id`` stays the min-id cluster label either way.  Scores are
    fetched for the O(affected) pair-graph nodes only (one pruned
    membership-filtered pass — the corpus never ships scores for
    untouched rows); a null score loses to any non-null one.

    ``mode`` picks the component solver:

    - ``"distributed"``: :func:`connected_components` — iterative
      min-label propagation over the bucketed hash exchange; the
      driver never holds an edge, so duplicate-heavy web corpora
      (30-50%% near-dup rates ⇒ O(corpus) edges) are safe.
    - ``"driver"``: union-find over the pair table on the driver —
      cheapest when pairs<<rows genuinely holds (one pass, no rounds).
    - ``"auto"`` (default): ``"driver"`` for a small in-memory pair
      TABLE (< 2M edges), ``"distributed"`` for a pair Dataset or a
      larger table.

    Either way the final node→rep map is O(affected nodes); the
    verdict stamp over the corpus is a broadcast ``index_in`` lookup
    per batch — the corpus itself is never shuffled.
    """
    if pairs is None:
        pairs = minhash_near_dup_pairs(
            ds, text_col, id_col, jaccard_threshold=jaccard_threshold,
            **lsh_kwargs)
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(
            f"near_dup_clusters mode must be 'auto', 'driver' or "
            f"'distributed', got {mode!r}")
    if mode == "auto":
        mode = "driver" if (isinstance(pairs, pa.Table)
                            and pairs.num_rows < 2_000_000) \
            else "distributed"

    if mode == "distributed":
        cc = connected_components(pairs)
        cc_tabs = [t for t in ray.get(cc.to_arrow_refs()) if t.num_rows]
        if cc_tabs:
            cc_tab = pa.concat_tables(cc_tabs).combine_chunks()
            nodes_arr = cc_tab["node"].combine_chunks()
            reps_arr = cc_tab["rep"].combine_chunks()
        else:
            nodes_arr = pa.array([], type=pa.int64())
            reps_arr = pa.array([], type=pa.int64())
    else:
        if isinstance(pairs, rd.Dataset):
            ptabs = [t for t in ray.get(pairs.to_arrow_refs())
                     if t.num_rows]
            pairs = pa.concat_tables(ptabs) if ptabs else pa.table({
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64())})
        ia = pairs["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = pairs["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(np.concatenate([ia, ib]))
        parent = np.arange(len(nodes), dtype=np.int64)

        def _find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in zip(np.searchsorted(nodes, ia),
                        np.searchsorted(nodes, ib)):
            ra, rb = _find(a), _find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([_find(i) for i in range(len(nodes))],
                         dtype=np.int64)
        # rep of a component = its minimum member id; nodes is sorted,
        # so the first member hit per root is the minimum
        rep_min = np.full(len(nodes), np.iinfo(np.int64).max,
                          dtype=np.int64)
        np.minimum.at(rep_min, roots, nodes)
        rep_of_node = rep_min[roots]
        nodes_arr = pa.array(nodes, type=pa.int64())
        reps_arr = pa.array(rep_of_node, type=pa.int64())

    # the kept row per cluster: min id (first-wins) by default, or the
    # keep_by-maximizing member — derived over O(affected) nodes only
    if keep_by is not None and len(nodes_arr):
        nodes_np = nodes_arr.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        reps_np = reps_arr.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        node_ref = ray.put(nodes_arr)

        def _scores(tab: pa.Table) -> pa.Table:
            ids = pc.cast(tab[id_col], pa.int64())
            hit = pc.is_valid(pc.index_in(
                ids, value_set=ray.get(node_ref)))
            t = tab.filter(hit)
            return pa.table({
                "id": pc.cast(t[id_col], pa.int64()),
                "s": pc.cast(t[keep_by], pa.float64(), safe=False)})

        stabs = [t for t in ray.get(
            ds.select_columns([id_col, keep_by]).map_batches(
                _scores, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows]
        nsort = np.argsort(nodes_np)
        scores = np.full(len(nodes_np), -np.inf)
        if stabs:
            st = pa.concat_tables(stabs)
            sid = st["id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sv = st["s"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            sv = np.where(np.isnan(sv), -np.inf, sv)
            pos = nsort[np.searchsorted(nodes_np[nsort], sid)]
            scores[pos] = sv
        # winner per rep: max score, ties -> smallest id
        o = np.lexsort((nodes_np, -scores, reps_np))
        rs = reps_np[o]
        first = np.ones(len(rs), dtype=bool)
        first[1:] = rs[1:] != rs[:-1]
        win_rep = rs[first]
        win_id = nodes_np[o][first]
        winners = pa.array(
            win_id[np.searchsorted(win_rep, reps_np)], type=pa.int64())
    else:
        winners = reps_arr

    handle = ray.put((nodes_arr, reps_arr, winners))

    def _verdict(tab: pa.Table) -> pa.Table:
        node_arr, rep_arr, win_arr = ray.get(handle)
        ids = pc.cast(tab[id_col], pa.int64()).combine_chunks()
        idx = pc.index_in(ids, value_set=node_arr)
        if len(rep_arr):
            rep = pc.if_else(idx.is_valid(),
                             pc.take(rep_arr, idx.fill_null(0)), ids)
            win = pc.if_else(idx.is_valid(),
                             pc.take(win_arr, idx.fill_null(0)), ids)
        else:
            rep = ids
            win = ids
        return pa.table({
            id_col: tab[id_col],
            "rep_id": rep,
            "keep": pc.equal(pc.cast(win, pa.int64()), ids),
        })

    return ds.select_columns([id_col]).map_batches(
        _verdict, batch_format="pyarrow")


def simhash_near_dup_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    jaccard_threshold: float = 0.8, max_hamming: int | None = None,
    n_blocks: int = 8, **sim_kwargs,
) -> pa.Table:
    """SimHash block-collision candidates + exact word-3-gram
    verification: (id_a, id_b, jaccard) with the TRUE word-3-shingle
    Jaccard, filtered at ``jaccard_threshold``.  SimHash is the blocking
    stage — with 8 blocks of 8 bits, any pair within hamming distance 7
    is GUARANTEED to share a block (pigeonhole); the exact pass makes
    precision 1.0.  Recall is therefore guaranteed only for pairs whose
    simhashes differ in <= 7 bits (near-identical docs) and
    probabilistic for pairs at hamming 8..max_hamming — a true
    Jaccard-at-threshold pair with a spread-out simhash CAN be missed,
    so oracle equality is a property of the tested corpora, not a
    universal invariant.  ``max_hamming`` only PRE-prunes candidates
    (random pairs sit at hamming ~32) — precision comes from the exact
    verify.  The default (``None``) is DERIVED from the threshold so
    the pre-prune is consistent with the recall target: for cosine
    similarity s ~ 2t/(1+t) (binary bags of comparable size) each
    simhash bit flips with p = arccos(s)/pi, so qualifying pairs sit
    at hamming ~ 64p +- sqrt(64p(1-p)) and the cut is placed 2.4
    sigma above the mean (t=0.8 -> 17, t=0.5 -> 26).  On
    shared-vocabulary corpora candidate volume grows steeply with this
    knob (sf0.1: ham<=8 -> 46k pairs, <=12 -> 597k, <=16 -> 2.1M), so
    tighten it deliberately when cost matters more than
    at-threshold recall."""
    if max_hamming is None:
        t = jaccard_threshold
        p = float(np.arccos(2 * t / (1 + t)) / np.pi)
        max_hamming = int(np.ceil(64 * p + 2.4 * (64 * p * (1 - p)) ** 0.5))
    cands = simhash_pairs(ds, text_col, id_col, max_hamming=max_hamming,
                          n_blocks=n_blocks, **sim_kwargs)
    return exact_shingle_jaccard_pairs(
        ds, cands, text_col, id_col, kind="word3",
        threshold=jaccard_threshold)


# popcount lookup over uint8 (numpy<2 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def charset_jaccard_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, group_cols,
    *, threshold: float = 0.99, buckets: int | None = None, tile: int = 512,
) -> "rd.Dataset":
    """All pairs within each group whose byte-set Jaccard similarity is
    >= threshold: (id_a, id_b, jaccard).  Exact (not sketched);
    candidate scope is bounded by the grouping columns — the pattern for
    'verify candidates only within a blocking key'.

    The presence set is over UTF-8 BYTES (256-slot bitmap, packed to 32
    bytes/row).  For ASCII text this equals character-set Jaccard (the
    DuckDB ``jaccard()`` oracle); for multibyte text lead/continuation
    bytes are shared across codepoints and the score is a byte-level
    approximation.

    Pair scoring runs in ``tile``x``tile`` blocks (memory per tile pair
    = tile^2*32 bytes, ~8MB at the default), so a million-row group
    costs bounded memory — still O(m^2) compute, which is inherent to
    exact all-pairs; cap group size upstream if that is not acceptable."""
    group_cols = list(group_cols)

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending") for c in group_cols]
                          + [(id_col, "ascending")])
        new = segment_starts(tab, group_cols)
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id)
        firsts = np.flatnonzero(new)
        ids = tab[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        arr = tab[text_col].combine_chunks()
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        offsets, data = _utf8_buffers(arr)
        starts, ends = offsets[:-1], offsets[1:]
        # per-row byte-presence bitmap, packed to 32 bytes per row
        n = tab.num_rows
        present = np.zeros((n, 256), dtype=bool)
        row_of = np.repeat(np.arange(n), (ends - starts))
        present[row_of, data] = True
        sizes = present.sum(axis=1).astype(np.int64)
        words = np.packbits(present, axis=1)          # (n, 32) uint8
        out_a, out_b, out_j = [], [], []
        for g in np.flatnonzero(counts > 1):
            s, e = firsts[g], firsts[g] + counts[g]
            gw, gid, gsz = words[s:e], ids[s:e], sizes[s:e]
            m = e - s
            for ti in range(0, m, tile):
                wi = gw[ti:ti + tile]
                for tj in range(ti, m, tile):
                    wj = gw[tj:tj + tile]
                    inter = _POP8[wi[:, None, :] & wj[None, :, :]]\
                        .sum(axis=2, dtype=np.int64)
                    union = gsz[ti:ti + tile][:, None] \
                        + gsz[tj:tj + tile][None, :] - inter
                    jac = inter / np.maximum(union, 1)
                    if ti == tj:
                        ia, ib = np.triu_indices(len(wi), k=1)
                    else:
                        ia, ib = np.meshgrid(np.arange(len(wi)),
                                             np.arange(len(wj)),
                                             indexing="ij")
                        ia, ib = ia.ravel(), ib.ravel()
                    keep = jac[ia, ib] >= threshold
                    out_a.append(gid[ti + ia[keep]])
                    out_b.append(gid[tj + ib[keep]])
                    out_j.append(jac[ia, ib][keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "jaccard": pa.array(np.concatenate(out_j)),
        })

    return bucketed_map_groups(
        ds.select_columns(group_cols + [id_col, text_col]), group_cols,
        _pairs, buckets=buckets, sort_within=False)


def dedup_tokens_within_doc(
    ds: "rd.Dataset", text_col: str, id_col: str, *, sep: str = " ",
) -> "rd.Dataset":
    """Intra-document repeated-token removal (the C4/MassiveText-style
    within-doc cleanup, token granularity): each document keeps the
    FIRST
    occurrence of each whitespace token, rejoined with ``sep`` —
    ``(id, text_dedup, n_kept)``.

    Embarrassingly parallel (no shuffle) and fully vectorized per
    batch: one regex split, one flatten, one dictionary-encode of the
    flat token array, then the first-occurrence mask comes from a
    single ``np.unique`` over packed ``(doc, token-code)`` int64 keys
    and the documents reassemble through a zero-copy ListArray +
    ``binary_join`` — no per-document Python.  Null or token-less
    documents yield a NULL ``text_dedup`` and ``n_kept`` 0 (SQL
    string_agg semantics)."""

    def _dedup(tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], type=tab[id_col].type),
                "text_dedup": pa.array([], type=pa.string()),
                "n_kept": pa.array([], type=pa.int64())})
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(tab[text_col]), pattern=r"\s+")
        counts = pc.list_value_length(words).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words).combine_chunks()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        # drop the empty token a fully-whitespace/empty doc splits to
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
            .astype(bool)
        flat2 = flat.filter(pa.array(nonempty))
        doc2 = doc_idx[nonempty]
        enc = pc.dictionary_encode(flat2)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        key = (doc2 << np.int64(32)) | codes
        first_idx = np.unique(key, return_index=True)[1]
        kept = np.zeros(len(codes), dtype=bool)
        kept[first_idx] = True
        kept_counts = np.bincount(doc2[kept], minlength=n) \
            .astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(kept_counts)])
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), flat2.filter(pa.array(kept)))
        joined = pc.binary_join(lists, sep)
        out = pc.if_else(pa.array(kept_counts > 0), joined,
                         pa.nulls(n, type=pa.string()))
        return pa.table({
            id_col: tab[id_col],
            "text_dedup": out,
            "n_kept": pa.array(kept_counts)})

    return ds.select_columns([id_col, text_col]).map_batches(
        _dedup, batch_format="pyarrow")


def line_dedup(ds: "rd.Dataset", id_col: str, text_col: str, *,
               sep: str = "\n", buckets: int | None = None,
               out_col: str = "text_deduped") -> "rd.Dataset":
    """LINE-level corpus deduplication (the C4/CCNet pre-clean): split
    every document on ``sep``, keep only the globally FIRST occurrence
    of each distinct line (first = smallest ``(id, position)`` — the
    boilerplate/navigation killer), and reassemble each document from
    its surviving lines in original order.  A document whose every
    line was seen earlier vanishes (SQL string_agg-over-no-rows
    semantics); empty lines deduplicate like any other line.

    Scale shape: explode is per-batch (list offsets, no row loop);
    ONE hash exchange on the line value both dedups and filters —
    each bucket holds every occurrence of its lines, sorts once and
    takes segment starts; reassembly is the ordered
    :func:`~rayskema.pipelines.relational.group_concat` (a second
    exchange on the doc id).  Only (line, id, pos) occurrence rows
    ever move — never whole documents."""
    from ..pipelines.relational import (bucketed_map_groups,
                                        group_concat, segment_starts)
    if id_col in ("__line", "__pos"):
        raise ValueError("id_col collides with internal columns")

    def _explode(tab: pa.Table) -> pa.Table:
        lines = pc.split_pattern(pc.fill_null(tab[text_col], ""),
                                 pattern=sep)
        lens = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = tab[id_col].combine_chunks()
        flat = pc.list_flatten(lines)
        doc = ids.take(pa.array(np.repeat(np.arange(len(lens)), lens)))
        ends = np.cumsum(lens)
        pos = np.arange(int(ends[-1]) if len(ends) else 0) - \
            np.repeat(ends - lens, lens)
        return pa.table({"__line": flat, id_col: doc,
                         "__pos": pa.array(pos)})

    occ = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow")

    def _first(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab
        tab = tab.sort_by([("__line", "ascending"),
                           (id_col, "ascending"),
                           ("__pos", "ascending")])
        firsts = np.flatnonzero(segment_starts(tab, ["__line"]))
        return tab.take(pa.array(firsts))

    kept = bucketed_map_groups(occ, ["__line"], _first,
                               buckets=buckets, sort_within=False)
    return group_concat(kept, id_col, "__line", ["__pos"], sep=sep,
                        out_col=out_col, buckets=buckets)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — shift-resistant chunk-level dedup
# ---------------------------------------------------------------------------

_CDC_PRIME = np.uint64(1099511628211)
# modular inverse of the odd prime mod 2^64: prefix hashes become a
# cumsum of byte·inv^j, so ANY span's hash is two lookups + one
# multiply (the same rollback trick edit_distance_pairs uses)
_CDC_PRIME_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _cdc_spans(offsets: np.ndarray, data: np.ndarray,
               window: int, avg_size: int):
    """Vectorized CDC over a flat UTF-8 buffer: returns
    ``(doc_ids, chunk_starts, chunk_ends, chunk_hashes)`` — all global
    byte positions.  A chunk boundary falls AFTER byte ``p`` when the
    rolling polynomial hash of the ``window`` bytes ending at ``p``
    satisfies ``hash % avg_size == 0`` and the window lies entirely
    inside the document.  No min/max clamps: boundary decisions stay
    position-independent (insert a byte and only the two adjacent
    chunks change — the shift-resistance CDC exists for); expected
    chunk size is ``avg_size`` (geometric).

    Everything is prefix sums over the flat buffer: S[i] = Σ_{j<i}
    byte[j]·inv^j (uint64 wraparound), so the hash of span [a, b) is
    ``(S[b] − S[a]) · prime^(b−1)`` — the standard forward polynomial
    Σ byte[j]·prime^(b−1−j), position-independent, O(1) per span.
    Peak memory is ~3 uint64 arrays the size of the text buffer; size
    batches accordingly (512–2048 docs)."""
    n = len(offsets) - 1
    nb = len(data)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0, dtype=np.uint64)
    pows = np.ones(nb + 1, dtype=np.uint64)
    if nb:
        np.cumprod(np.full(nb, _CDC_PRIME, dtype=np.uint64),
                   out=pows[1:])
    inv_pows = np.ones(nb, dtype=np.uint64)
    if nb > 1:
        np.cumprod(np.full(nb - 1, _CDC_PRIME_INV, dtype=np.uint64),
                   out=inv_pows[1:])
    S = np.zeros(nb + 1, dtype=np.uint64)
    if nb:
        np.cumsum(data.astype(np.uint64) * inv_pows, out=S[1:])

    starts, ends = offsets[:-1], offsets[1:]
    # candidate boundary positions p (boundary after byte p): the
    # window [p-window+1, p+1) must fit in the doc and a boundary at
    # the doc's last byte is meaningless (the tail chunk ends anyway)
    if nb >= window:
        # only positions with a full window to their left are ever
        # boundary candidates — starting the range at window-1 also
        # keeps every fancy index non-negative (a tiny trailing batch
        # whose whole buffer is under `window` bytes has none at all)
        pos = np.arange(window - 1, nb, dtype=np.int64)
        doc_of = np.searchsorted(offsets, pos, side="right") - 1
        wh = ((S[pos + 1] - S[pos - window + 1])
              * pows[pos]) & _MASK64
        ok = ((pos - starts[doc_of] >= window - 1)
              & (pos < ends[doc_of] - 1)
              & (_hash64(wh) % np.uint64(avg_size) == 0))
        b = pos[ok]
        bd = doc_of[ok]
    else:
        b = np.empty(0, dtype=np.int64)
        bd = np.empty(0, dtype=np.int64)

    # chunk starts per doc = doc start + every boundary+1, in order
    cs = np.concatenate([starts, b + 1])
    cd = np.concatenate([np.arange(n, dtype=np.int64), bd])
    order = np.lexsort((cs, cd))
    cs, cd = cs[order], cd[order]
    nxt_same = np.empty(len(cs), dtype=bool)
    nxt_same[:-1] = cd[1:] == cd[:-1]
    nxt_same[-1] = False
    ce = np.where(nxt_same,
                  np.concatenate([cs[1:], np.array([0], np.int64)]),
                  ends[cd])
    ch = ((S[ce] - S[cs]) * pows[np.maximum(ce - 1, 0)]) & _MASK64
    return cd, cs, ce, _hash64(ch)


def cdc_chunks(
    ds: "rd.Dataset", id_col: str, text_col: str, *,
    window: int = 16, avg_size: int = 128,
    batch_size: int = 1024,
) -> "rd.Dataset":
    """Content-defined chunk table: one row per (document, chunk
    ordinal) with the chunk's 64-bit content hash and byte length —
    the storage/dedup shape (LBFS/rsync lineage): byte-identical runs
    land in byte-identical chunks even when surrounding bytes shift,
    which fixed-size blocking cannot do.  Null text chunks as empty.

    Fully vectorized per batch (prefix-sum rolling hashes over the
    flat UTF-8 buffer — no per-byte Python); embarrassingly parallel,
    NO shuffle: chunking each document needs only its own bytes.
    Downstream dedup (group by ``chunk_hash``) is where the one
    exchange happens."""
    def _f(tab: pa.Table) -> pa.Table:
        arr = tab[text_col].combine_chunks()
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        offsets, data = _utf8_buffers(arr)
        cd, cs, ce, ch = _cdc_spans(offsets, data, window, avg_size)
        # ordinal within doc: segment-reset arange
        first = np.concatenate([[True], cd[1:] != cd[:-1]]) \
            if len(cd) else np.empty(0, dtype=bool)
        idx = np.arange(len(cd), dtype=np.int64)
        ords = idx - np.maximum.accumulate(np.where(first, idx, 0)) \
            if len(cd) else idx
        return pa.table({
            id_col: tab[id_col].take(pa.array(cd)),
            "chunk_ord": pa.array(ords),
            "chunk_hash": pa.array(ch.view(np.int64)),
            "chunk_len": pa.array(ce - cs),
        })
    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def cdc_dedup_stats(
    ds: "rd.Dataset", id_col: str, text_col: str, *,
    window: int = 16, avg_size: int = 128,
    buckets: int | None = None,
) -> pa.Table:
    """Corpus-level CDC dedup profile: total chunks / bytes, distinct
    chunks / bytes, and the bytes a chunk-store would save
    (``Σ (copies−1)·len`` per distinct chunk).  One exchange on
    ``chunk_hash`` merges per-block (hash → count, len) partials; the
    grouped table reduces to per-block scalar partials and the driver
    folds O(blocks) rows — never O(chunks)."""
    chunks = cdc_chunks(ds, id_col, text_col, window=window,
                        avg_size=avg_size)
    grouped = group_agg(chunks, ["chunk_hash"],
                        [("chunk_len", "count_all", "n_copies"),
                         ("chunk_len", "min", "len")],
                        buckets=buckets)

    def _partial(tab: pa.Table) -> pa.Table:
        n = pc.cast(tab["n_copies"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ln = pc.cast(tab["len"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "n_chunks": pa.array([int(n.sum())], pa.int64()),
            "n_distinct": pa.array([len(n)], pa.int64()),
            "total_bytes": pa.array([int((n * ln).sum())], pa.int64()),
            "distinct_bytes": pa.array([int(ln.sum())], pa.int64()),
            "dup_bytes_saved": pa.array([int(((n - 1) * ln).sum())],
                                        pa.int64()),
        })

    parts = [t for t in ray.get(
        grouped.map_batches(_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({c: pa.array([0], pa.int64()) for c in
                         ("n_chunks", "n_distinct", "total_bytes",
                          "distinct_bytes", "dup_bytes_saved")})
    allp = pa.concat_tables(parts)
    return pa.table({c: pa.array([pc.sum(allp[c]).as_py() or 0],
                                 pa.int64())
                     for c in allp.column_names})


# ---------------------------------------------------------------------------
# Sorted-neighborhood (merge/purge) near-duplicate candidates
# ---------------------------------------------------------------------------

def sorted_neighborhood_pairs(
    ds: "rd.Dataset", id_col: str, text_col: str, *,
    key_len: int = 24, window: int = 3, threshold: float = 0.9,
    span: int = 8192, buckets: int | None = None,
) -> "rd.Dataset":
    """Sorted-neighborhood near-duplicate candidates — the merge/purge
    blocking of Hernandez & Stolfo (SIGMOD'95): normalize each text to
    its lowercase-alphanumeric form, SORT the corpus globally by the
    first ``key_len`` characters of that form (ties by id), and compare
    each row only to the ``window - 1`` rows that FOLLOW it in sort
    order.  Output: ``(id_a, id_b, jaccard)`` for candidate pairs whose
    character-set Jaccard similarity (over the normalized form, rounded
    to 6 decimals — the DuckDB ``jaccard()`` contract) reaches
    ``threshold``; ``id_a`` is the sort-earlier row.  Rows whose
    normalized form is empty are excluded up front.

    Complements the hash blockers (minhash/simhash/charset groups):
    candidate count is EXACTLY ``n * (window-1)`` regardless of key
    skew — a hot blocking key cannot blow up a group, because the
    window, not the key, bounds comparisons.

    Distribution: ONE range-partitioned sort (:func:`global_rank`'s
    TeraSort machinery — O(blocks) driver state) assigns consecutive
    row numbers over the non-empty rows; rows are then exchanged by
    ``rn // span`` with a ``window - 1`` overlap copy into the next
    span (each row ships at most twice), so pairing is a per-span
    vectorized shift — no join, no quadratic group.  Only
    ``(id, rn, mask)`` ever moves after the sort: the character set
    rides as ONE uint64 (36-bit alphabet), texts never pair.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    w1 = window - 1
    if span < w1:
        # the overlap copy reaches exactly ONE span forward; with
        # span >= window-1 every pair's left endpoint lies in the
        # right endpoint's span or the immediately previous one (the
        # copy region), but a smaller span would need copies to skip
        # ahead multiple spans and would silently lose pairs
        raise ValueError(f"span ({span}) must be >= window-1 ({w1})")
    from ..pipelines.relational import global_rank

    def _prep(tab: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]", replacement="").combine_chunks()
        keep = pc.not_equal(norm, "")
        tab2 = tab.filter(keep)
        norm = norm.filter(keep)
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        n = len(norm)
        if n == 0:
            return pa.table({
                id_col: pa.array([], tab[id_col].type),
                "skey": pa.array([], pa.string()),
                "mask": pa.array([], pa.uint64())})
        offsets, data = _utf8_buffers(norm)
        # 36-bit alphabet: 'a'..'z' -> 0..25, '0'..'9' -> 26..35
        bit = np.where(data >= 97, data - 97, data - 48 + 26)
        vals = np.uint64(1) << bit.astype(np.uint64)
        masks = np.bitwise_or.reduceat(vals, offsets[:-1])
        return pa.table({
            id_col: tab2[id_col],
            "skey": pc.utf8_slice_codeunits(norm, 0, key_len),
            "mask": pa.array(masks)})

    prepped = ds.select_columns([id_col, text_col]).map_batches(
        _prep, batch_format="pyarrow")
    ranked = global_rank(prepped, "skey", tiebreak=id_col,
                         kinds=("row_number",))

    def _route(tab: pa.Table) -> pa.Table:
        rn = tab["row_number"].combine_chunks().to_numpy(
            zero_copy_only=False) - 1          # 0-based
        own = rn // span
        body = pa.table({id_col: tab[id_col], "mask": tab["mask"],
                         "rn": pa.array(rn)})
        parts = [body.append_column("bkt", pa.array(own))]
        over = (rn % span) >= span - w1
        if over.any():
            sel = pa.array(over)
            parts.append(body.filter(sel).append_column(
                "bkt", pa.array(own[over] + 1)))
        return pa.concat_tables(parts)

    routed = ranked.map_batches(_route, batch_format="pyarrow")

    id_type = None
    sch = ds.schema(fetch_if_missing=False)
    if sch is not None:
        try:
            id_type = sch.base_schema.field(id_col).type
        except KeyError:
            pass
    empty_t = pa.table({
        "id_a": pa.array([], id_type or pa.int64()),
        "id_b": pa.array([], id_type or pa.int64()),
        "jaccard": pa.array([], pa.float64())})

    def _pairs(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return empty_t
        tab = tab.sort_by([("bkt", "ascending"), ("rn", "ascending")])
        bkt = tab["bkt"].combine_chunks().to_numpy(zero_copy_only=False)
        rn = tab["rn"].combine_chunks().to_numpy(zero_copy_only=False)
        masks = tab["mask"].combine_chunks().to_numpy(
            zero_copy_only=False)
        sizes = _popcount64(masks)
        ids = tab[id_col].combine_chunks()
        out = []
        n = tab.num_rows
        for d in range(1, window):
            if n <= d:
                break
            # same bucket segment, consecutive rns => index shift == rn
            # shift; the RIGHT endpoint must be OWNED by this bucket —
            # the left endpoint is then guaranteed present (same span,
            # or the forward overlap copy of the previous span), and
            # each pair is emitted exactly once (one owner per row)
            m = (bkt[:-d] == bkt[d:]) & (rn[d:] - rn[:-d] == d) \
                & (rn[d:] // span == bkt[d:])
            if not m.any():
                continue
            ia = np.flatnonzero(m)
            ib = ia + d
            inter = _popcount64(masks[ia] & masks[ib])
            union = sizes[ia] + sizes[ib] - inter
            from . import round_half_away
            jac = round_half_away(inter / np.maximum(union, 1), 6)
            keep = jac >= threshold
            if not keep.any():
                continue
            out.append(pa.table({
                "id_a": ids.take(pa.array(ia[keep])),
                "id_b": ids.take(pa.array(ib[keep])),
                "jaccard": pa.array(jac[keep])}))
        if not out:
            return empty_t
        return pa.concat_tables(out)

    return bucketed_map_groups(routed, ["bkt"], _pairs,
                               buckets=buckets, sort_within=False)


# ---------------------------------------------------------------------------
# Prefix-filtered containment join (asymmetric near-dup / quotation)
# ---------------------------------------------------------------------------

def _exploded_word3(tab: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(id, sh) rows: each document's DISTINCT word-3-gram shingle
    hashes (same semantics as ``_row_shingle_sets(kind="word3")``),
    vectorized — the per-row fold loop runs only for documents with
    fewer than 3 tokens."""
    arr = tab[text_col].combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=r"\s+")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    th = hash_strings(flat)
    nonempty = np.asarray(pc.not_equal(flat, "").fill_null(False))
    counts = pc.list_value_length(toks).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(counts)), counts)[nonempty]
    h = th[nonempty]
    n_eff = np.bincount(row_of, minlength=len(counts)).astype(np.int64)
    prime = np.uint64(0x100000001B3)
    rids, shs = [], []
    if len(h) >= 3:
        same = (row_of[:-2] == row_of[2:])
        if same.any():
            idx = np.flatnonzero(same)
            combo = (h[idx] * prime + h[idx + 1]) * prime + h[idx + 2]
            rids.append(row_of[idx])
            shs.append(_hash64(combo & _MASK64))
    short = np.flatnonzero(n_eff < 3)
    if len(short):
        starts = np.concatenate([[0], np.cumsum(n_eff)[:-1]])
        s_r, s_h = [], []
        for r in short:
            c = np.uint64(0)
            for v in h[starts[r]:starts[r] + n_eff[r]]:
                c = c * prime + v
            s_r.append(r)
            s_h.append(c)
        rids.append(np.asarray(s_r, dtype=np.int64))
        shs.append(_hash64(np.asarray(s_h, dtype=np.uint64) & _MASK64))
    if not rids:
        return pa.table({id_col: pa.array([], tab[id_col].type),
                         "sh": pa.array([], pa.uint64())})
    rid = np.concatenate(rids)
    sh = np.concatenate(shs)
    # per-doc distinct (a doc's shingles all sit in this batch)
    order = np.lexsort((sh, rid))
    rid, sh = rid[order], sh[order]
    first = np.concatenate([[True],
                            (rid[1:] != rid[:-1]) | (sh[1:] != sh[:-1])])
    rid, sh = rid[first], sh[first]
    return pa.table({id_col: tab[id_col].combine_chunks()
                     .take(pa.array(rid)),
                     "sh": pa.array(sh)})


def containment_pairs(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    threshold: float = 0.8, buckets: int | None = None,
) -> pa.Table:
    """Directed containment near-dup pairs: ``(id_a, id_b,
    containment)`` for every ordered pair with
    ``|S_a ∩ S_b| / |S_a| >= threshold`` over word-3-gram shingle
    sets — the asymmetric relation Jaccard blocking misses (a short
    document quoted inside a long one has high containment but low
    Jaccard, so MinHash-LSH candidates systematically skip it).

    Candidate generation is the PREFIX FILTER of the set-similarity-
    join family (PPJoin, Xiao et al. 2008), adapted to containment:
    order each document's shingles by ascending global document
    frequency; containment >= t needs an overlap of ceil(t·|A|)
    shingles, so A must share at least one of its
    ``|A| - floor(t·|A|) + 1`` RAREST shingles with B.  Only those
    prefix shingles emit A-side candidates; B-side emits everything.
    A corpus-hot shingle therefore generates candidates only against
    the (few) documents rare enough to hold it in their prefix — the
    skew cap LSH banding needs is structural here, with NO recall
    loss (the filter is exact).

    Distribution: per-batch vectorized shingle explode (distinct per
    doc), one exchange for document frequencies, one bucketed join of
    df onto the exploded rows, one exchange per document to mark
    prefixes, one exchange per shingle for candidate pairs (driver
    holds the O(candidates) dedup only), then the shared
    chunk-parallel exact verify computing BOTH directions of each
    candidate pair.  Returns an arrow table sorted by (id_a, id_b)."""
    import math
    from ..pipelines.relational import bucketed_map_groups, hash_join

    proj = ds.select_columns([id_col, text_col]).materialize()
    expl = proj.map_batches(
        lambda t: _exploded_word3(t, id_col, text_col),
        batch_format="pyarrow").materialize()

    df = bucketed_map_groups(
        expl.map_batches(
            lambda t: agg_named(
                t.append_column("__one",
                                pa.array(np.ones(t.num_rows, np.int64))),
                ["sh"], [("__one", "sum")], ["df"]),
            batch_format="pyarrow"),
        ["sh"],
        lambda t: agg_named(t, ["sh"], [("df", "sum")], ["df"]),
        buckets=buckets, sort_within=False)

    joined = hash_join(expl, df, on="sh", buckets=buckets)

    def _mark_prefix(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column("pref", pa.array([], pa.bool_()))
        tab = tab.sort_by([(id_col, "ascending"), ("df", "ascending"),
                           ("sh", "ascending")])
        new = segment_starts(tab, [id_col])
        seg = np.cumsum(new) - 1
        sizes = np.bincount(seg)
        pos_in_doc = np.arange(tab.num_rows) \
            - np.flatnonzero(new)[seg]
        n = sizes[seg]
        k = n - np.floor(threshold * n).astype(np.int64) + 1
        return tab.append_column("pref", pa.array(pos_in_doc < k))

    marked = bucketed_map_groups(joined, [id_col], _mark_prefix,
                                 buckets=buckets, sort_within=False)

    def _cands(tab: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if tab.num_rows == 0:
            return empty
        tab = tab.sort_by([("sh", "ascending")])
        new = segment_starts(tab, ["sh"])
        seg = np.cumsum(new) - 1
        counts = np.bincount(seg)
        firsts = np.flatnonzero(new)
        ids = tab[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        pref = tab["pref"].combine_chunks().to_numpy(
            zero_copy_only=False)
        out_a, out_b = [], []
        for g in np.flatnonzero(counts > 1):
            s, e = firsts[g], firsts[g] + counts[g]
            gids = ids[s:e]
            a_side = gids[pref[s:e]]
            if not len(a_side):
                continue
            ia, ib = np.meshgrid(a_side, gids, indexing="ij")
            m = ia != ib
            out_a.append(ia[m])
            out_b.append(ib[m])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # canonicalize + dedup within the bucket; global dedup happens
        # at the driver over the O(candidates) union
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        first = np.concatenate([[True], (lo[1:] != lo[:-1])
                                | (hi[1:] != hi[:-1])])
        return pa.table({"id_a": pa.array(lo[first]),
                         "id_b": pa.array(hi[first])})

    cand_tabs = [t for t in ray.get(
        bucketed_map_groups(marked, ["sh"], _cands, buckets=buckets,
                            sort_within=False).to_arrow_refs())
        if t.num_rows]
    if not cand_tabs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "containment": pa.array([], pa.float64())})
    cand = pa.concat_tables(cand_tabs)
    a = cand["id_a"].to_numpy(zero_copy_only=False)
    b = cand["id_b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    pairs = np.stack([a[first], b[first]], axis=1)

    sets_tab = pa.concat_tables([t for t in ray.get(
        proj.map_batches(
            lambda t: pa.table({
                id_col: t[id_col],
                "sh": pa.array(
                    [s for s in _row_shingle_sets(
                        t[text_col].combine_chunks()
                        if t.num_rows else pa.array([], pa.string()),
                        "word3")],
                    type=pa.list_(pa.uint64()))}),
            batch_format="pyarrow").to_arrow_refs()) if t.num_rows])

    chunk = max(20_000, -(-len(pairs) // 64))
    n_chunks = -(-len(pairs) // chunk)
    if n_chunks <= 1:
        parts = [_verify_containment_chunk(pairs, sets_tab, id_col,
                                           threshold)]
    else:
        sets_ref = ray.put(sets_tab)
        parts = ray.get([
            _verify_containment_chunk_task.remote(
                pairs[i * chunk:(i + 1) * chunk], sets_ref, id_col,
                threshold)
            for i in range(n_chunks)])
    out = pa.concat_tables(parts)
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _verify_containment_chunk(pairs: np.ndarray, sets_tab: pa.Table,
                              id_col: str,
                              threshold: float) -> pa.Table:
    """Exact containment for one chunk of canonical (lo, hi) pairs:
    emits BOTH directions that reach the threshold.  Size prefilter:
    containment(A→B) <= min(|A|,|B|)/|A|, so a pair where NEITHER
    direction's bound reaches the threshold is dropped before any
    intersection."""
    from . import round_half_away

    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "containment": pa.array([], type=pa.float64())})
    if len(pairs) == 0:
        return empty
    need = np.unique(pairs.ravel())
    sel = sets_tab.filter(pc.is_in(
        sets_tab[id_col], value_set=pa.array(need, type=pa.int64())))
    if sel.num_rows == 0:
        return empty
    ids = sel[id_col].to_numpy(zero_copy_only=False)
    sh = sel["sh"].combine_chunks()
    flat = np.asarray(sh.values)
    offs = np.asarray(sh.offsets).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    starts_s = offs[:-1][order]
    lens_s = (offs[1:] - offs[:-1])[order]

    plo = np.searchsorted(ids_s, pairs[:, 0]).clip(0, len(ids_s) - 1)
    phi = np.searchsorted(ids_s, pairs[:, 1]).clip(0, len(ids_s) - 1)
    valid = (ids_s[plo] == pairs[:, 0]) & (ids_s[phi] == pairs[:, 1])
    la, lb = lens_s[plo], lens_s[phi]
    # inter <= min(|A|,|B|); with both directions evaluated the only
    # pairs provably below threshold up front are those where even the
    # smaller side cannot reach it: min/min = 1, so just require
    # nonempty sets (word3 sets are never empty, but stay defensive)
    survivors = np.flatnonzero(valid & (np.minimum(la, lb) > 0))

    out_a, out_b, out_c = [], [], []
    for i in survivors:
        sa = flat[starts_s[plo[i]]:starts_s[plo[i]] + la[i]]
        sb = flat[starts_s[phi[i]]:starts_s[phi[i]] + lb[i]]
        small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
        pos = np.searchsorted(big, small).clip(0, len(big) - 1)
        inter = int(np.count_nonzero(big[pos] == small)) \
            if len(big) else 0
        ca = inter / max(int(la[i]), 1)
        cb = inter / max(int(lb[i]), 1)
        if ca >= threshold:
            out_a.append(int(pairs[i, 0]))
            out_b.append(int(pairs[i, 1]))
            out_c.append(float(round_half_away(ca, 4)))
        if cb >= threshold:
            out_a.append(int(pairs[i, 1]))
            out_b.append(int(pairs[i, 0]))
            out_c.append(float(round_half_away(cb, 4)))
    return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                     "id_b": pa.array(out_b, type=pa.int64()),
                     "containment": pa.array(out_c, type=pa.float64())})


@ray.remote(num_cpus=1)
def _verify_containment_chunk_task(pairs, sets_tab, id_col,
                                   threshold) -> pa.Table:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    return _verify_containment_chunk(pairs, sets_tab, id_col, threshold)


def fingerprint_clusters(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Key-collision clustering by TOKEN-SET fingerprint (the
    OpenRefine "fingerprint" method): each document keys on its
    sorted distinct ``[a-z0-9]+`` tokens joined by single spaces, and
    clusters are fingerprints shared by more than one document —
    template/boilerplate detection that exact-hash dedup misses
    (reordered or repeated words collapse to one key) at pure
    group-by cost (no pairs, no similarity).

    Output: ``(fingerprint, n_members, min_doc_id)`` for every
    colliding fingerprint.  One exchange on the fingerprint; the
    per-batch fingerprint build is Arrow sort + segment dedup +
    vectorized list rebuild — no per-row Python."""
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        segment_starts)

    def _fp(tab: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        pairs = pa.table({"d": pa.array(doc_of[ok]),
                          "t": flat.filter(pa.array(ok))}) \
            .sort_by([("d", "ascending"), ("t", "ascending")])
        if pairs.num_rows:
            keep = segment_starts(pairs, ["d", "t"])
            pairs = pairs.filter(pa.array(keep.astype(bool)))
        d = pairs["d"].combine_chunks().to_numpy(zero_copy_only=False)
        per_doc = np.bincount(d, minlength=tab.num_rows) \
            if len(d) else np.zeros(tab.num_rows, np.int64)
        offsets = np.concatenate([[0], np.cumsum(per_doc)]) \
            .astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets), pairs["t"].combine_chunks())
        fp = pc.binary_join(lst, " ")
        return pa.table({"fingerprint": fp, id_col: tab[id_col]})

    fps = ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow")

    def _clusters(tab: pa.Table) -> pa.Table:
        out = agg_named(tab, ["fingerprint"],
                        [([], "count_all"), (id_col, "min")],
                        ["n_members", "min_doc_id"])
        return out.filter(pc.greater(out["n_members"], 1))

    return bucketed_map_groups(fps, ["fingerprint"], _clusters,
                               buckets=buckets, sort_within=False)


def ngram_novelty(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct word-3-gram shingles that appear in NO other document —
    the memorization/boilerplate signal dual to containment (novelty
    1.0 = fully original text; 0.0 = every phrase seen elsewhere).
    Output: ``(id, n_shingles, n_unique, novelty)`` with novelty
    rounded half-away to 6 (``n_unique / n_shingles``; a document
    whose shingle set is empty is excluded — SQL inner-join
    semantics).

    Distribution: the vectorized shingle explode (distinct per doc),
    ONE exchange for document frequencies, one bucketed join of df=1
    flags back onto the exploded rows, and a per-document exchange
    folding two integers — no pair generation anywhere."""
    from . import round_half_away
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        hash_join)

    expl = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: _exploded_word3(t, id_col, text_col),
        batch_format="pyarrow").materialize()

    df = bucketed_map_groups(
        expl.map_batches(
            lambda t: agg_named(
                t.append_column("__one", pa.array(
                    np.ones(t.num_rows, np.int64))),
                ["sh"], [("__one", "sum")], ["df"]),
            batch_format="pyarrow"),
        ["sh"],
        lambda t: agg_named(t, ["sh"], [("df", "sum")], ["df"]),
        buckets=buckets, sort_within=False)

    joined = hash_join(expl, df, on="sh", buckets=buckets)

    def _fold(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_shingles": pa.array([], pa.int64()),
                             "n_unique": pa.array([], pa.int64())})
        uniq = pc.cast(pc.equal(tab["df"], 1), pa.int64())
        return agg_named(
            tab.append_column("__u", uniq).append_column(
                "__one", pa.array(np.ones(tab.num_rows, np.int64))),
            [id_col], [("__one", "sum"), ("__u", "sum")],
            ["n_shingles", "n_unique"])

    per_doc = bucketed_map_groups(joined, [id_col], _fold,
                                  buckets=buckets, sort_within=False)

    def _score(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column("novelty",
                                     pa.array([], pa.float64()))
        ns = tab["n_shingles"].combine_chunks().to_numpy(
            zero_copy_only=False)
        nu = tab["n_unique"].combine_chunks().to_numpy(
            zero_copy_only=False)
        nov = round_half_away(nu.astype(np.float64)
                              / ns.astype(np.float64), 6)
        return tab.append_column("novelty", pa.array(nov))

    return per_doc.map_batches(_score, batch_format="pyarrow")
