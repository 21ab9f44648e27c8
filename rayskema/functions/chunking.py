"""Document chunking: split long texts into sliding character windows
— the context-window preparation step of an LLM training-data
pipeline (each document becomes ceil(len/stride) chunks of up to
``size`` codepoints starting every ``stride`` codepoints).

Embarrassingly parallel ``map_batches`` row expansion (a vectorized
``flat_map``): per batch the chunk counts, repeated ids and start
offsets are computed with numpy, and the text windows are cut with one
``pc.utf8_slice_codeunits`` kernel call per chunk ORDINAL (bounded by
the longest document in the batch, not the row count) — never a
Python loop over rows.  No shuffle; chunk rows stream straight to the
consumer, so output size being a multiple of input size only affects
block count, not driver memory.

Codepoint (not byte) offsets throughout, matching SQL
``substring``/``length`` semantics — multibyte text chunks identically
to the DuckDB oracle.

Reference scope note: goskema has no document operators; this extends
the streaming bounded-window idea (internal/stream/subtree.go:13-141 —
validate huge values in O(window) memory) to corpus preparation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def chunk_documents(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    size: int, stride: int | None = None,
) -> "rd.Dataset":
    """Sliding-window chunking: one output row per (doc, window).

    Output columns: ``(id, chunk_idx, char_start, chunk)`` where
    window ``j`` covers codepoints ``[j*stride, j*stride + size)`` and
    a document of length L yields ``floor((max(L,1)-1)/stride) + 1``
    windows (an empty document yields one empty chunk; a null text
    yields none).  ``stride`` defaults to ``size`` (disjoint chunks);
    ``stride < size`` overlaps them.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    stride_v = size if stride is None else stride
    if stride_v <= 0:
        raise ValueError("stride must be positive")

    def _chunk(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[text_col]))
        text = tab[text_col].combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_chunks = (np.maximum(lens, 1) - 1) // stride_v + 1
        max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
        ids = tab[id_col].combine_chunks()
        parts = []
        for j in range(max_chunks):
            mask = n_chunks > j
            idx = pa.array(np.flatnonzero(mask))
            start = j * stride_v
            sub = text.take(idx)
            parts.append(pa.table({
                id_col: ids.take(idx),
                "chunk_idx": pa.array(
                    np.full(len(idx), j, dtype=np.int64)),
                "char_start": pa.array(
                    np.full(len(idx), start, dtype=np.int64)),
                # utf8_slice_codeunits slices CODEPOINTS for utf8
                # arrays, matching SQL substring semantics
                "chunk": pc.utf8_slice_codeunits(
                    sub, start=start, stop=start + size),
            }))
        if not parts:
            # chunk keeps the input utf8 width (string vs large_string)
            # so empty/all-null blocks schema-match non-empty ones
            return pa.table({
                id_col: pa.array([], type=ids.type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "char_start": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=text.type),
            })
        return pa.concat_tables(parts)

    return ds.select_columns([id_col, text_col]).map_batches(
        _chunk, batch_format="pyarrow")
