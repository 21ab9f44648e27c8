"""Apache ORC source + sink.

The reference's source SPI is pluggable byte readers
(``source.go:62-112``); the Ray-Data analogue is per-format Dataset
constructors (see :mod:`rayskema.sources.spi`).  ORC is the columnar
interchange format of the Hive/Trino/Spark warehouse world — a 100 TB
corpus often *arrives* as ORC even when the pipeline's native substrate
is Parquet, so the engine reads it directly instead of demanding a
pre-conversion pass.

``read_orc`` wraps each file in a ``ray.data.read_binary_files`` task
and decodes with ``pyarrow.orc`` — one task per file, so a directory
of shards parallelizes exactly like the parquet reads.  Unlike the IPC
reader, the optional ``columns`` projection is pushed into the ORC
decoder itself (``ORCFile.read(columns=...)`` materializes only the
selected streams), so a narrow read of a wide table never allocates
the unused columns.

``write_orc`` lands one ``.orc`` file per block through a streaming
``Datasink`` (blocks flow with backpressure, never materialized) under
ordinal+content-hash names — the same idempotent naming contract as
:func:`rayskema.sources.ipc.write_ipc`: a retried block task rewrites
the SAME file, while byte-identical but DISTINCT blocks keep distinct
ordinals.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.orc as porc

import ray.data as rd


def read_orc(path: str, *, columns: list[str] | None = None,
             split_stripes: int | None = None) -> "rd.Dataset":
    """Read a directory of ORC files (or one file) as a Dataset.

    ``columns`` prunes at decode time (ORC stores columns as separate
    streams; unselected ones are never materialized).

    ``split_stripes=N`` switches from one-task-per-FILE to
    one-task-per-N-STRIPES: the driver reads only each file's footer
    (stripe count), and every task opens the file itself and decodes
    its stripe range — a single 100 GB ORC file parallelizes across
    the cluster instead of serializing into one task.  Requires the
    paths to be worker-readable (shared/cluster storage — the same
    assumption as any path-based read); the default whole-file mode
    ships bytes via ``read_binary_files`` and works anywhere the
    driver can list.

    ORC's timestamp type is nanosecond-resolution with no unit
    metadata, so a ``timestamp[us]`` column written by ``write_orc``
    reads back as ``timestamp[ns]`` — cast after the read when the
    downstream pipeline needs the original unit."""
    if split_stripes is not None:
        return _read_orc_stripes(path, columns, int(split_stripes))
    raw = rd.read_binary_files(path)

    # Peek one file's schema up front (footer read only): a read task
    # whose batch carries no file bytes must still emit a
    # SCHEMA-CONSISTENT empty table — a column-less pa.table({}) would
    # break downstream schema unification/concat for sparse dirs
    empty = None
    probe = path
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path)
                       if not n.startswith("."))
        probe = os.path.join(path, names[0]) if names else None
    if probe is not None and os.path.isfile(probe):
        # memory-map the probe: ORCFile reads only footer metadata for
        # .schema — a multi-GB first shard must not be slurped into
        # the driver heap just for its schema
        with pa.memory_map(probe, "r") as mm:
            sch = porc.ORCFile(mm).schema
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        empty = sch.empty_table()

    def _decode_batch(batch: dict) -> pa.Table:
        tabs = []
        for buf in batch["bytes"]:
            f = porc.ORCFile(pa.BufferReader(pa.py_buffer(buf)))
            tabs.append(f.read(columns=columns))
        if tabs:
            return pa.concat_tables(tabs)
        return empty if empty is not None else pa.table({})

    return raw.map_batches(_decode_batch, batch_format="numpy")


def _read_orc_stripes(path: str, columns: list[str] | None,
                      per_task: int) -> "rd.Dataset":
    """Stripe-range plan: footer-only driver pass, per-range decode
    tasks (see ``read_orc(split_stripes=...)``)."""
    if per_task < 1:
        raise ValueError("split_stripes must be >= 1")
    if os.path.isdir(path):
        files = sorted(os.path.join(path, n) for n in os.listdir(path)
                       if not n.startswith(".") and n.endswith(".orc"))
    else:
        files = [path]
    items, sch = [], None
    for fp in files:
        with pa.memory_map(fp, "r") as mm:
            f = porc.ORCFile(mm)
            n = f.nstripes
            if sch is None:
                sch = f.schema
        for s in range(0, n, per_task):
            items.append({"path": fp, "start": s,
                          "n": min(per_task, n - s)})
    if sch is not None and columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    empty = sch.empty_table() if sch is not None else pa.table({})
    if not items:
        return rd.from_arrow(empty)

    def _decode(batch: dict) -> pa.Table:
        tabs = []
        for p, s, n in zip(batch["path"], batch["start"], batch["n"]):
            f = porc.ORCFile(p)
            for i in range(int(s), int(s) + int(n)):
                rb = f.read_stripe(i, columns=columns)
                tabs.append(pa.Table.from_batches([rb]))
        return pa.concat_tables(tabs) if tabs else empty

    return rd.from_items(items).map_batches(
        _decode, batch_format="numpy")


def write_orc(ds: "rd.Dataset", out_dir: str) -> int:
    """Write a Dataset as one ORC file per block under ``out_dir``;
    returns the number of files written.  Ordinal+content-hash names
    (idempotent retries, no duplicate-block collapse — see
    ``write_ipc``).  Write into a fresh directory: files from an
    earlier run are not cleaned up and a later ``read_orc`` would
    return the union."""
    os.makedirs(out_dir, exist_ok=True)
    import hashlib

    from ray.data import Datasink
    from ray.data.block import BlockAccessor

    class _OrcSink(Datasink):
        """Streaming per-block sink: ``ctx.task_idx`` + the
        within-task block index give the deterministic ordinal a
        retried task reproduces exactly."""

        def __init__(self):
            self.files_written = 0

        def write(self, blocks, ctx) -> list[str]:
            out = []
            for j, block in enumerate(blocks):
                tab = BlockAccessor.for_block(block).to_arrow()
                if tab.num_rows == 0:
                    continue
                sink = pa.BufferOutputStream()
                porc.write_table(tab, sink)
                buf = sink.getvalue()
                name = os.path.join(
                    out_dir,
                    f"block-{ctx.task_idx:06d}-{j:04d}-"
                    f"{hashlib.md5(buf).hexdigest()[:16]}.orc")
                tmp = name + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "wb") as f:
                    f.write(buf)
                os.replace(tmp, name)  # atomic publish
                out.append(name)
            return out

        def on_write_complete(self, write_result) -> None:
            self.files_written = sum(
                len(p) for p in write_result.write_returns)

    sink = _OrcSink()
    ds.write_datasink(sink)
    return sink.files_written
