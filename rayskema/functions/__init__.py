"""Operator-family helpers shared across functions modules."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def binary_buffers(arr):
    """(offsets int64, flat data memoryview, null_mask) of a
    string/binary array, zero-copy.  Offsets are ABSOLUTE positions in
    the data buffer.  Callers must treat null slots as empty: the Arrow
    spec only requires monotonic offsets, so a null slot MAY span bytes
    (e.g. a validity bitmap applied over existing data) and those bytes
    are undefined."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1,
                            offset=arr.offset * 8)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    null_mask = np.asarray(arr.is_null()) if arr.null_count else None
    return offsets, mv, null_mask


def md5_hex(arr) -> pa.Array:
    """Lowercase-hex MD5 per row of a string/binary array (matches any
    SQL engine's ``md5()``).  Hashes zero-copy slices of the flat data
    buffer — no per-row Python string round-trip (hashing is the work;
    slicing is free).  Null slots hash ``md5("")`` regardless of their
    offset extent."""
    import hashlib

    offsets, mv, null_mask = binary_buffers(arr)
    empty = memoryview(b"")
    fps = [hashlib.md5(
        empty if null_mask is not None and null_mask[i]
        else mv[offsets[i]:offsets[i + 1]]).hexdigest()
        for i in range(len(offsets) - 1)]
    return pa.array(fps, type=pa.string())


def round_half_away(values, digits: int = 4):
    """Round half AWAY from zero (SQL semantics — DuckDB/ANSI ROUND),
    not numpy/Python's half-to-even: oracle-compared floats must round
    identically on both sides (e.g. 157/160 = 0.98125 -> 0.9813, where
    round() gives 0.9812)."""
    v = np.asarray(values, dtype=np.float64)
    s = 10.0 ** digits
    return np.sign(v) * np.floor(np.abs(v) * s + 0.5) / s


def decimal_from_float(arr, *, precision: int = 18, scale: int = 2) -> pa.Array:
    """Exact float → ``decimal128(precision, scale)`` conversion via
    integer sub-units: ``round_half_away(x·10^scale)`` (the repo's SQL
    ROUND convention, operating on the same binary double both engines
    hold) → int64 → unscaled decimal → ·10^-scale.  This sidesteps the
    engines' divergent native float→decimal casts (Arrow rounds on the
    binary value, DuckDB on the shortest decimal string), so the result
    equals DuckDB's ``CAST(round(x·10^s)/10^s AS DECIMAL(p,s))``
    bit-for-bit.  Reference NumberDecimal mode (types.go:12-20) made
    real over Arrow.  Nulls stay null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    from decimal import Decimal

    f = pc.cast(arr, pa.float64())
    valid = pc.is_valid(f)
    units = round_half_away(
        f.fill_null(0.0).to_numpy(zero_copy_only=False), 0
    ) if scale == 0 else round_half_away(
        pc.multiply(f.fill_null(0.0), float(10 ** scale))
        .to_numpy(zero_copy_only=False), 0)
    ints = pa.array(units.astype(np.int64), type=pa.int64())
    ints = pc.if_else(valid, ints, pa.nulls(len(ints), type=pa.int64()))
    wide = pc.cast(ints, pa.decimal128(30, 0))
    if scale:
        wide = pc.multiply(wide, pa.scalar(
            Decimal(1).scaleb(-scale), type=pa.decimal128(scale + 1, scale)))
    return pc.cast(wide, pa.decimal128(precision, scale))
