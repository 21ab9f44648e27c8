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

``write_ipc`` lands one ``.arrow`` file per block via
``Dataset.write_datasink``-free map_batches append (simple, resumable
at the file level: blocks are written under task-unique names, so
re-runs never interleave partial files).
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
        return pa.concat_tables(tabs) if tabs else pa.table({})

    return raw.map_batches(_decode_batch, batch_format="numpy")


def write_ipc(ds: "rd.Dataset", out_dir: str, *,
              file_format: str = "file") -> int:
    """Write a Dataset as one IPC file per block under ``out_dir``;
    returns the number of DISTINCT files written.  Content-addressed
    names make retries idempotent and collapse byte-identical blocks
    into one file.  Write into a fresh directory: files from an
    earlier run with different content are not cleaned up and a later
    ``read_ipc`` would return the union."""
    if file_format not in ("file", "stream"):
        raise ValueError("file_format must be 'file' or 'stream'")
    os.makedirs(out_dir, exist_ok=True)

    def _write(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string())})
        sink = pa.BufferOutputStream()
        if file_format == "file":
            with pipc.new_file(sink, tab.schema) as w:
                w.write_table(tab)
        else:
            with pipc.new_stream(sink, tab.schema) as w:
                w.write_table(tab)
        buf = sink.getvalue()
        # content-addressed name: a retried task rewrites the SAME
        # file (idempotent), identical blocks collapse to one
        import hashlib
        name = os.path.join(
            out_dir,
            f"block-{hashlib.md5(buf).hexdigest()}.arrow")
        tmp = name + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, name)  # atomic publish
        return pa.table({"path": pa.array([name])})

    paths = ds.map_batches(_write, batch_format="pyarrow").take_all()
    return len({p["path"] for p in paths})
