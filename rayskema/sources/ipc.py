"""Arrow IPC (Feather v2 / stream) source + sink.

The reference's source SPI is pluggable byte readers
(``source.go:62-112``); on the columnar engine the equivalent seam is
per-format Dataset constructors.  Parquet stays the native substrate
(prunable row groups, statistics); IPC matters at the EDGES — it is the
zero-copy interchange format other Arrow-native systems hand us (Flight
dumps, DuckDB ``COPY TO (FORMAT ARROW)``, pandas feather) and the
cheapest spill format between co-located stages (no encode/decode, just
buffer maps).

``read_ipc`` wraps each file in a ``ray.data.read_binary_files`` task
and decodes RecordBatches with ``pyarrow.ipc`` — one task per file, so
a directory of shards parallelizes exactly like the parquet reads; the
optional ``columns`` projection prunes AFTER decode (IPC has no
row-group projection pushdown — use parquet when reads are narrow, and
this reader when the data already exists as IPC).

``write_ipc`` lands one ``.arrow`` file per block through a streaming
``Datasink`` (blocks flow with backpressure, never materialized) under
ordinal+content-hash names, so re-runs never interleave partial files
and retried write tasks republish the same names.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.ipc as pipc

import ray.data as rd


def read_ipc(path: str, *, columns: list[str] | None = None,
             file_format: str = "file") -> "rd.Dataset":
    """Read a directory of Arrow IPC files (or one file) as a Dataset.

    ``file_format``: ``"file"`` (Feather v2 / random-access, the
    default) or ``"stream"`` (the streaming wire format)."""
    if file_format not in ("file", "stream"):
        raise ValueError("file_format must be 'file' or 'stream'")

    raw = rd.read_binary_files(path)

    # Peek one file's schema up front (footer read, no data pages):
    # a read task whose batch carries no file bytes must still emit a
    # SCHEMA-CONSISTENT empty table — a column-less pa.table({}) would
    # break downstream schema unification/concat for sparse dirs
    empty = None
    probe = path
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path)
                       if not n.startswith("."))
        probe = os.path.join(path, names[0]) if names else None
    if probe is not None and os.path.isfile(probe):
        # memory-map the probe: open_file/open_stream reads only the
        # footer/first message for .schema — a multi-GB first shard
        # must not be slurped into the driver heap just for its schema
        with pa.memory_map(probe, "r") as mm:
            sch = (pipc.open_file(mm) if file_format == "file"
                   else pipc.open_stream(mm)).schema
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        empty = sch.empty_table()

    def _decode(batch: dict) -> list[pa.Table]:
        out = []
        for buf in batch["bytes"]:
            data = pa.py_buffer(buf)
            if file_format == "file":
                reader = pipc.open_file(data)
                tab = reader.read_all()
            else:
                reader = pipc.open_stream(data)
                tab = reader.read_all()
            if columns is not None:
                tab = tab.select(columns)
            out.append(tab)
        return out

    def _decode_batch(batch: dict) -> pa.Table:
        tabs = _decode(batch)
        if tabs:
            return pa.concat_tables(tabs)
        return empty if empty is not None else pa.table({})

    return raw.map_batches(_decode_batch, batch_format="numpy")


def write_ipc(ds: "rd.Dataset", out_dir: str, *,
              file_format: str = "file") -> int:
    """Write a Dataset as one IPC file per block under ``out_dir``;
    returns the number of files written.  File names carry a
    deterministic block ORDINAL plus the content hash: a retried
    block task rewrites the SAME file (idempotent, same ordinal +
    same content), while byte-identical but DISTINCT blocks keep
    distinct ordinals — a pure content-addressed name would collapse
    them into one file and silently lose rows on a write→read round
    trip.  Write into a fresh directory: files from an earlier run
    are not cleaned up and a later ``read_ipc`` would return the
    union."""
    if file_format not in ("file", "stream"):
        raise ValueError("file_format must be 'file' or 'stream'")
    from rayskema.sources._blocksink import write_block_files

    def _encode(tab: pa.Table) -> pa.Buffer:
        sink = pa.BufferOutputStream()
        if file_format == "file":
            with pipc.new_file(sink, tab.schema) as w:
                w.write_table(tab)
        else:
            with pipc.new_stream(sink, tab.schema) as w:
                w.write_table(tab)
        return sink.getvalue()

    return len(write_block_files(ds, out_dir, encode=_encode,
                                 ext="arrow"))
