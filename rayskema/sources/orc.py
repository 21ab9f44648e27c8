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
    files = _orc_files(path)
    if not files:
        return rd.from_arrow(pa.table({}))
    # only .orc files ship to decode tasks — warehouse-exported dirs
    # carry _SUCCESS/sidecar files that would crash the decoder
    raw = rd.read_binary_files(files)

    # Peek one file's schema up front (footer read only): a read task
    # whose batch carries no file bytes must still emit a
    # SCHEMA-CONSISTENT empty table — a column-less pa.table({}) would
    # break downstream schema unification/concat for sparse dirs.
    # memory-map the probe: ORCFile reads only footer metadata for
    # .schema — a multi-GB first shard must not be slurped into the
    # driver heap just for its schema
    with pa.memory_map(files[0], "r") as mm:
        sch = porc.ORCFile(mm).schema
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    empty = sch.empty_table()

    def _decode_batch(batch: dict) -> pa.Table:
        tabs = []
        for buf in batch["bytes"]:
            f = porc.ORCFile(pa.BufferReader(pa.py_buffer(buf)))
            tab = f.read(columns=columns)
            if columns is not None:
                # ORC returns the projection in FILE order; callers
                # get the REQUESTED order
                tab = tab.select(columns)
            tabs.append(tab)
        if tabs:
            return pa.concat_tables(tabs)
        return empty

    return raw.map_batches(_decode_batch, batch_format="numpy")


def _orc_files(path: str) -> list[str]:
    """The .orc members of a file-or-directory path (sorted)."""
    if os.path.isdir(path):
        return sorted(os.path.join(path, n) for n in os.listdir(path)
                      if not n.startswith(".") and n.endswith(".orc"))
    return [path]


def _read_orc_stripes(path: str, columns: list[str] | None,
                      per_task: int) -> "rd.Dataset":
    """Stripe-range plan: footer-only driver pass, per-range decode
    tasks (see ``read_orc(split_stripes=...)``)."""
    if per_task < 1:
        raise ValueError("split_stripes must be >= 1")
    files = _orc_files(path)
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
                tab = pa.Table.from_batches([rb])
                if columns is not None:
                    # file order -> requested order (as read_orc)
                    tab = tab.select(columns)
                tabs.append(tab)
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
    from rayskema.sources._blocksink import write_block_files

    def _encode(tab: pa.Table) -> pa.Buffer:
        sink = pa.BufferOutputStream()
        porc.write_table(tab, sink)
        return sink.getvalue()

    return len(write_block_files(ds, out_dir, encode=_encode,
                                 ext="orc"))
