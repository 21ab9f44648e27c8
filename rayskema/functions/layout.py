"""Data-layout operators: multi-dimensional clustering for scan
pruning.

The reference is a validation engine with no layout stage; these are
the write-side companions a 100 TB deployment needs — cluster a table
on TWO-OR-MORE dimensions at once (Z-order / Morton curve) so Parquet
row-group min/max stats prune range predicates on EITHER dimension,
not just the leading sort key.  A plain ``sort(date, user)`` prunes
``date`` ranges perfectly and ``user`` ranges not at all; the Morton
interleave bounds BOTH dims' spread within any key range.

Everything is integer bit arithmetic — deterministic, overflow-checked
and exactly SQL-mirrorable (the oracle is a generated shift-and-mask
expression), so layout decisions can be oracle-verified like any
other operator.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd


def morton_interleave(arrs: Sequence[np.ndarray], bits: int) -> np.ndarray:
    """Interleave ``bits`` low bits of each array into one Morton key.

    Bit layout matches the classic definition: output bit
    ``i*d + (d-1-j)`` is input ``j``'s bit ``i`` — dimension 0 owns
    the most significant bit of every group, so the key sorts first
    by the dims' joint high bits, recursively (the Z curve).  Values
    must already lie in ``[0, 2^bits)`` (pre-bucket with
    ``quantile_bucket_assign`` for distribution-robust ranks); out of
    range raises rather than silently aliasing distant points
    together.  ``bits * d`` must fit a signed int64 so the key stays
    a SQL BIGINT."""
    d = len(arrs)
    if d < 2:
        raise ValueError("morton interleave needs >= 2 dimensions")
    if bits * d > 63:
        raise ValueError(f"{bits} bits x {d} dims exceeds int64")
    out = np.zeros(len(arrs[0]), dtype=np.int64)
    for j, a in enumerate(arrs):
        a = np.asarray(a)
        if a.dtype.kind not in "iu":
            raise TypeError("morton dims must be integer arrays")
        if len(a) and (a.min() < 0 or a.max() >= (1 << bits)):
            raise ValueError(f"dim {j} outside [0, 2^{bits})")
        a = a.astype(np.int64)
        for i in range(bits):
            out |= ((a >> i) & 1) << (i * d + (d - 1 - j))
    return out


def morton_sql_expr(cols: Sequence[str], bits: int) -> str:
    """The exact SQL mirror of :func:`morton_interleave` — a generated
    shift-and-mask sum DuckDB (or any engine with ``>>``/``&``)
    evaluates bit-identically."""
    d = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * d + (d - 1 - j)})")
    return " + ".join(terms)


def zorder_key(
    ds: "rd.Dataset", cols: Sequence[str], *, bits: int = 16,
    key_col: str = "zkey",
) -> "rd.Dataset":
    """Append the Morton key of ``cols`` as ``key_col`` — a pure
    per-batch map, no exchange.  Null dims raise (a clustering key
    must be total)."""
    cols = list(cols)

    def _key(tab: pa.Table) -> pa.Table:
        arrs = []
        for c in cols:
            col = tab[c]
            if col.null_count:
                raise ValueError(f"zorder dim {c!r} contains nulls")
            arrs.append(col.combine_chunks().to_numpy(
                zero_copy_only=False))
        return tab.append_column(
            key_col, pa.array(morton_interleave(arrs, bits)))

    return ds.map_batches(_key, batch_format="pyarrow")


def zorder_sort(
    ds: "rd.Dataset", cols: Sequence[str], *, bits: int = 16,
    key_col: str = "zkey",
) -> "rd.Dataset":
    """Cluster the dataset on the Morton curve of ``cols``: append the
    key and range-sort on it (Ray Data's streaming sort — the one
    genuinely all-to-all step, which IS the clustering write).  Blocks
    of the result are contiguous key ranges, so every block's min/max
    envelope on EACH dim is bounded — the property Parquet row-group
    pruning consumes."""
    return zorder_key(ds, cols, bits=bits, key_col=key_col).sort(key_col)
