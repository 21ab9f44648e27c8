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
