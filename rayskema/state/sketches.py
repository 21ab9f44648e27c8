"""Mergeable streaming sketches: HyperLogLog, t-digest, count-min.

The reference computes all aggregates exactly in memory (e.g. UniqueBy's
``map[string]int``, rules/rules.go:116-135) — viable in a single
process, not at 10^12 rows.  These sketches are the distributed
replacement (SURVEY §2.4 T6 / §2.6 A6-A7): each validator actor folds
its batches into per-batch partial states, partials are merged
associatively (any order) in a tiny reduce, and the merged state feeds
the drift / cardinality checks.

All three are standard public algorithms:
- HyperLogLog: Flajolet et al. 2007, with the small-range linear
  counting correction.
- t-digest: Dunning & Ertl, "Computing Extremely Accurate Quantiles
  Using t-Digests" (arXiv:1902.04023) — simplified scale-function k1
  merging variant; compression pinned so merge order cannot flip a KS
  verdict beyond tolerance (SURVEY §7.4.4).
- count-min: Cormode & Muthukrishnan 2005.

Pure Python + numpy; serialization via ``to_bytes``/``from_bytes``
(pickle of plain arrays) for checkpoint lineage.
"""

from __future__ import annotations

import pickle
import threading
from dataclasses import dataclass

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64(values: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit splitmix-style hash of a uint64 array."""
    x = values.astype(np.uint64, copy=True)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


# Reused scratch buffers for the segmented hash.  On this class of VM,
# FIRST-TOUCH page faults on fresh large allocations are ~40x the cost
# of the arithmetic (measured: np.multiply.accumulate over a fresh 88MB
# array = 2.4s cold vs 0.055s warm), so the hash works in bounded
# chunks over thread-local buffers that are allocated once per
# process/thread and reused for every subsequent batch.
_HASH_CHUNK_BYTES = 4 << 20
_scratch_tls = threading.local()


def _scratch(name: str, n: int) -> np.ndarray:
    bufs = getattr(_scratch_tls, "bufs", None)
    if bufs is None:
        bufs = _scratch_tls.bufs = {}
    buf = bufs.get(name)
    if buf is None or len(buf) < n:
        bufs[name] = buf = np.empty(n, dtype=np.uint64)
    return buf[:n]


_BASE = np.uint64(1099511628211)
_INV_BASE = np.uint64(pow(1099511628211, -1, 1 << 64))


def _hash_flat_segments(data: np.ndarray, starts: np.ndarray,
                        ends: np.ndarray) -> np.ndarray:
    """Polynomial hash of each contiguous byte segment
    ``data[starts[i]:ends[i]]``:  H(s..e) = sum_{j=s..e-1}
    byte[j]*base^(j-s) (mod 2^64), via prefix sums —
    (prefix[e]-prefix[s]) * inv_base^s.  The base-power shift cancels,
    so the result is independent of a segment's position in the buffer
    and the computation can be chunked at any row boundary."""
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    i = 0
    while i < n:
        j = int(np.searchsorted(ends, starts[i] + _HASH_CHUNK_BYTES,
                                side="right"))
        j = max(j, i + 1)
        s0 = int(starts[i])
        m = int(ends[j - 1]) - s0
        if m == 0:          # run of empty segments
            out[i:j] = np.uint64(0)
            i = j
            continue
        flat = _scratch("flat", m)
        np.copyto(flat, data[s0:s0 + m], casting="unsafe")
        powers = _scratch("pow", m)
        powers[1:].fill(_BASE)
        powers[0] = np.uint64(1)
        np.multiply.accumulate(powers, out=powers)
        inv_powers = _scratch("ipow", m + 1)
        inv_powers[1:].fill(_INV_BASE)
        inv_powers[0] = np.uint64(1)
        np.multiply.accumulate(inv_powers, out=inv_powers)
        flat *= powers      # terms, in place
        prefix = _scratch("prefix", m + 1)
        prefix[0] = np.uint64(0)
        np.cumsum(flat, out=prefix[1:])
        s_loc = starts[i:j] - s0
        e_loc = ends[i:j] - s0
        out[i:j] = (prefix[e_loc] - prefix[s_loc]) * inv_powers[s_loc]
        i = j
    return out


def _empty_string_hash(seed: int) -> np.uint64:
    # the general formula at length 0: seg=0, len=0 => _hash64(seed)
    return _hash64(np.array([seed], dtype=np.uint64))[0]


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a string array (pyarrow or numpy).

    Uses a polynomial rolling hash over UTF-8 bytes, computed with numpy
    over the flat Arrow buffer — no Python loop over rows.  Nulls hash
    like the empty string on every path (plain, dictionary, chunked).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(values, type=pa.string())
    if pa.types.is_dictionary(values.type):
        dh = hash_strings(values.dictionary, seed)
        idx = values.indices
        if idx.null_count:
            null_mask = np.asarray(idx.is_null())
            out = dh[idx.fill_null(0).to_numpy(zero_copy_only=False)]
            out[null_mask] = _empty_string_hash(seed)
            return out
        return dh[idx.to_numpy(zero_copy_only=False)]
    if values.null_count:
        values = pc.fill_null(values, "")
    # repeated-key fast path: hash each DISTINCT string once (the
    # dictionary encode is a C-speed hash table), then gather — keys
    # like conv_id repeat ~n_turns times, cutting the O(total bytes)
    # polynomial-hash work by the repetition factor
    if len(values) > 65536:
        enc = pc.dictionary_encode(values)
        if len(enc.dictionary) * 2 < len(values):
            dh = hash_strings(enc.dictionary, seed)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            return dh[idx]
    values = pc.cast(values, pa.large_binary())
    buffers = values.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64,
                            count=len(values) + 1, offset=values.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8) \
        if buffers[2] is not None else np.empty(0, dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    ends = offsets[1:].astype(np.int64)
    seg = _hash_flat_segments(data, starts, ends)
    # mix in length and seed so prefix-sharing strings diverge
    lengths = (ends - starts).astype(np.uint64)
    out = seg ^ (lengths * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(seed)
    return _hash64(out)


class HyperLogLog:
    """Distinct-count sketch. ``p`` registers bits => 2^p registers,
    standard error ≈ 1.04/sqrt(2^p). p=14 → ~0.8% error, 16 KiB."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) & _MASK64
        # rank = leading zeros of rest + 1, capped at 64-p+1
        lz = np.full(len(rest), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # count leading zeros via bit_length on the nonzero values
            restnz = rest[nz]
            bl = np.zeros(len(restnz), dtype=np.uint8)
            v = restnz.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                ge = v >= (np.uint64(1) << np.uint64(shift))
                bl[ge] += np.uint8(shift)
                v[ge] >>= np.uint64(shift)
            lz_nz = (np.uint8(63) - bl) + np.uint8(1)
            lz[nz] = np.minimum(lz_nz, np.uint8(64 - self.p + 1))
        np.maximum.at(self.registers, idx, lz)

    def update_strings(self, values, seed: int = 0) -> None:
        self.update_hashes(hash_strings(values, seed))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting small-range fix
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers), protocol=5)

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(b)
        s = cls(p)
        s.registers = regs
        return s


class TDigest:
    """Quantile sketch (merging t-digest, k1 scale function).

    Centroids kept sorted by mean; ``compress`` bounds their count.
    ``delta`` pinned at construction — merge order then perturbs
    quantiles well under the KS tolerance used by drift checks.
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self._buf_means.append(values)
        self._buf_weights.append(np.ones(len(values)))
        if sum(len(b) for b in self._buf_means) > 8 * self.delta:
            self._flush()

    def update_weighted(self, values: np.ndarray,
                        weights: np.ndarray) -> None:
        """Pre-aggregated update: ``values[i]`` occurs ``weights[i]``
        times.  For bounded-cardinality columns (e.g. byte lengths)
        this shrinks the flush sort from O(rows) to O(distinct) —
        measured 13x on the profiling stage."""
        values = np.asarray(values, dtype=np.float64)
        weights = np.asarray(weights, dtype=np.float64)
        keep = ~np.isnan(values) & (weights > 0)
        if not keep.any():
            return
        self._buf_means.append(values[keep])
        self._buf_weights.append(weights[keep])
        if sum(len(b) for b in self._buf_means) > 8 * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf_means:
            return
        means = np.concatenate([self.means] + self._buf_means)
        weights = np.concatenate([self.weights] + self._buf_weights)
        self._buf_means, self._buf_weights = [], []
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # k1 scale: k(q) = delta/(2*pi) * asin(2q-1); merge while k-span <= 1
        cum = np.cumsum(weights) - weights / 2.0
        q = cum / total
        k = (self.delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))
        # greedy grouping: new group when floor(k*2) changes (approx)
        group = np.floor((k - k[0]) * 2.0).astype(np.int64)
        # enforce monotone group ids
        group = np.maximum.accumulate(group)
        uniq, inv = np.unique(group, return_inverse=True)
        gw = np.bincount(inv, weights=weights)
        gm = np.bincount(inv, weights=weights * means) / gw
        self.means, self.weights = gm, gw

    def merge(self, other: "TDigest") -> "TDigest":
        other._flush()
        if len(other.means):
            self._buf_means.append(other.means.copy())
            self._buf_weights.append(other.weights.copy())
        self._flush()
        return self

    def quantile(self, q) -> np.ndarray:
        self._flush()
        if len(self.means) == 0:
            return np.full(np.shape(q) or (), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        cum /= self.weights.sum()
        return np.interp(q, cum, self.means)

    def cdf(self, x) -> np.ndarray:
        self._flush()
        if len(self.means) == 0:
            return np.full(np.shape(x) or (), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        cum /= self.weights.sum()
        return np.interp(x, self.means, cum, left=0.0, right=1.0)

    @property
    def total_weight(self) -> float:
        self._flush()
        return float(self.weights.sum())

    def to_bytes(self) -> bytes:
        self._flush()
        return pickle.dumps((self.delta, self.means, self.weights), protocol=5)

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, means, weights = pickle.loads(b)
        s = cls(delta)
        s.means, s.weights = means, weights
        return s


class CountMin:
    """Frequency sketch: d rows × w counters, point query = min over rows."""

    def __init__(self, w: int = 2048, d: int = 5):
        self.w, self.d = w, d
        self.table = np.zeros((d, w), dtype=np.int64)

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        for r in range(self.d):
            idx = (_hash64(hashes ^ np.uint64(r * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
                   % np.uint64(self.w)).astype(np.int64)
            np.add.at(self.table[r], idx, 1)

    def update_strings(self, values) -> None:
        self.update_hashes(hash_strings(values))

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized point estimates for raw 64-bit hashes (the same
        position derivation as update_hashes)."""
        est = np.full(len(hashes), np.iinfo(np.int64).max,
                      dtype=np.int64)
        h = hashes.astype(np.uint64)
        for r in range(self.d):
            idx = (_hash64(h ^ np.uint64(
                r * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
                % np.uint64(self.w)).astype(np.int64)
            est = np.minimum(est, self.table[r, idx])
        return est

    def query_string(self, value: str) -> int:
        return int(self.query_hashes(hash_strings([value]))[0])

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.w, self.d) == (other.w, other.d)
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.w, self.d, self.table), protocol=5)

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        w, d, t = pickle.loads(b)
        s = cls(w, d)
        s.table = t
        return s


@dataclass
class ColumnProfile:
    """The per-table sketch bundle emitted as per-batch partials and
    merged for drift/cardinality checks: exact counts for low-cardinality
    categorical columns (role), a t-digest per numeric profile column,
    an HLL for key cardinality, a count-min for heavy-hitter detection
    (hot-conversation salting)."""

    value_counts: dict
    tdigests: dict
    hll: HyperLogLog
    countmin: CountMin
    row_count: int = 0

    @classmethod
    def empty(cls, categorical: list[str], numeric: list[str],
              hll_p: int = 14, cm_w: int = 2048) -> "ColumnProfile":
        return cls(
            value_counts={c: {} for c in categorical},
            tdigests={c: TDigest() for c in numeric},
            hll=HyperLogLog(hll_p),
            countmin=CountMin(cm_w),
        )

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        for c, vc in other.value_counts.items():
            mine = self.value_counts.setdefault(c, {})
            for k, v in vc.items():
                mine[k] = mine.get(k, 0) + v
        for c, td in other.tdigests.items():
            if c in self.tdigests:
                self.tdigests[c].merge(td)
            else:
                self.tdigests[c] = td
        self.hll.merge(other.hll)
        self.countmin.merge(other.countmin)
        self.row_count += other.row_count
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "value_counts": self.value_counts,
                "tdigests": {c: t.to_bytes() for c, t in self.tdigests.items()},
                "hll": self.hll.to_bytes(),
                "countmin": self.countmin.to_bytes(),
                "row_count": self.row_count,
            },
            protocol=5,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnProfile":
        d = pickle.loads(b)
        return cls(
            value_counts=d["value_counts"],
            tdigests={c: TDigest.from_bytes(t) for c, t in d["tdigests"].items()},
            hll=HyperLogLog.from_bytes(d["hll"]),
            countmin=CountMin.from_bytes(d["countmin"]),
            row_count=d["row_count"],
        )


class KMV:
    """Bottom-k / KMV theta sketch (k minimum distinct hash values):
    the set-OPERATION sketch HyperLogLog cannot be — two KMVs support
    union (merge + trim) AND intersection (count shared hashes below
    the smaller theta), so pairwise overlap of 10^12-row sets costs
    ``8k`` bytes per set.  Deterministic: built from the same seeded
    value hashes as the HLL path, so estimates are bit-stable at any
    parallelism.  With fewer than ``k`` distinct values the sketch IS
    the exact hash set (estimates are exact).

    Estimator (Beyer et al. 2007 / DataSketches theta): with the
    k-th smallest normalized hash as θ, ``|A| ≈ (k−1)/θ``;
    ``|A∩B| ≈ |{h ∈ A_k ∩ B_k : h < θ_min}| / θ_min``."""

    __slots__ = ("k", "hashes")

    _SCALE = float(1 << 64)

    def __init__(self, k: int = 4096):
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)   # sorted, unique

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        self.hashes = np.unique(
            np.concatenate([self.hashes,
                            hashes.astype(np.uint64)]))[: self.k]

    def update_strings(self, values, seed: int = 0) -> None:
        self.update_hashes(hash_strings(values, seed=seed))

    def merge(self, other: "KMV") -> "KMV":
        assert self.k == other.k
        self.update_hashes(other.hashes)
        return self

    @property
    def theta(self) -> float:
        if len(self.hashes) < self.k:
            return 1.0
        # exclusive bound: hashes strictly below theta are retained
        return float(self.hashes[-1]) / self._SCALE

    def estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    @staticmethod
    def intersection_estimate(a: "KMV", b: "KMV") -> float:
        th = min(a.theta, b.theta)
        common = np.intersect1d(a.hashes, b.hashes,
                                assume_unique=True)
        if th >= 1.0:
            return float(len(common))
        bound = np.uint64(int(th * KMV._SCALE))
        return float((common < bound).sum()) / th

    def to_bytes(self) -> bytes:
        return np.uint64(self.k).tobytes() + self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "KMV":
        s = cls(int(np.frombuffer(b[:8], dtype=np.uint64)[0]))
        s.hashes = np.frombuffer(b[8:], dtype=np.uint64).copy()
        return s


class SpaceSaving:
    """SpaceSaving heavy-hitters summary (Metwally et al. 2005) over
    STRING items: at most ``k`` (item → count, overestimate-error)
    entries; any item with true frequency > N/k is guaranteed present,
    and every reported count overestimates truth by at most its
    recorded error.  Merge (Agarwal et al. 2012, mergeable summaries):
    sum counts/errors of shared items, offset absent items by the
    other side's minimum count, re-prune to k — the guarantee
    degrades to N/k of the COMBINED stream, which is what makes
    per-block partials sound.

    Vectorized build: a block's items are pre-aggregated with numpy
    (unique + bincount) before touching the dict, so the Python work
    is O(distinct per block), not O(rows)."""

    __slots__ = ("k", "counts", "errors")

    def __init__(self, k: int = 256):
        self.k = k
        self.counts: dict = {}
        self.errors: dict = {}

    def update_aggregated(self, items, counts: np.ndarray) -> None:
        """Feed (distinct item, count) pairs — the per-block shape.
        Eviction uses a lazily-invalidated min-heap, so a block with
        V distinct items costs O(V log k), not O(V·k) linear scans."""
        import heapq
        order = np.argsort(np.asarray(counts))[::-1]
        heap = [(c, it) for it, c in self.counts.items()]
        heapq.heapify(heap)
        for i in order:
            it = items[i]
            c = int(counts[i])
            if it in self.counts:
                self.counts[it] += c
                heapq.heappush(heap, (self.counts[it], it))
            elif len(self.counts) < self.k:
                self.counts[it] = c
                self.errors[it] = 0
                heapq.heappush(heap, (c, it))
            else:
                while self.counts.get(heap[0][1]) != heap[0][0]:
                    heapq.heappop(heap)   # stale entry
                m, m_it = heapq.heappop(heap)
                self.counts.pop(m_it)
                self.errors.pop(m_it)
                self.counts[it] = m + c
                self.errors[it] = m
                heapq.heappush(heap, (m + c, it))

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        assert self.k == other.k
        min_s = min(self.counts.values()) if len(self.counts) == self.k \
            else 0
        min_o = min(other.counts.values()) \
            if len(other.counts) == other.k else 0
        out_c, out_e = {}, {}
        for it, c in self.counts.items():
            oc = other.counts.get(it)
            if oc is not None:
                out_c[it] = c + oc
                out_e[it] = self.errors[it] + other.errors[it]
            else:
                out_c[it] = c + min_o
                out_e[it] = self.errors[it] + min_o
        for it, c in other.counts.items():
            if it not in self.counts:
                out_c[it] = c + min_s
                out_e[it] = other.errors[it] + min_s
        if len(out_c) > self.k:
            keep = sorted(out_c, key=lambda x: (-out_c[x], str(x)))[
                : self.k]
            out_c = {it: out_c[it] for it in keep}
            out_e = {it: out_e[it] for it in keep}
        self.counts, self.errors = out_c, out_e
        return self

    def top(self, n: int) -> list:
        """[(item, count, error)] by count desc, item asc (stable)."""
        order = sorted(self.counts,
                       key=lambda x: (-self.counts[x], str(x)))[:n]
        return [(it, self.counts[it], self.errors[it]) for it in order]

    def to_bytes(self) -> bytes:
        import pickle
        return pickle.dumps((self.k, self.counts, self.errors),
                            protocol=5)

    @classmethod
    def from_bytes(cls, b: bytes) -> "SpaceSaving":
        import pickle
        k, c, e = pickle.loads(b)
        s = cls(k)
        s.counts, s.errors = c, e
        return s
