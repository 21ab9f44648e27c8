"""JSONL ingest seam (reference source SPI: ``JSONBytes``/``JSONReader``
drivers, source.go:62-112 — the raw-JSON entry into the engine).

The validation pipeline's native substrate is Parquet (columnar,
prunable, splittable).  Raw JSONL transcripts are ingested by a
conversion stage: ``read_jsonl`` wraps ``ray.data.read_json`` and
reconciles each batch to the declared schema (missing columns null,
declared order — full constraint checking happens in the validate
pipeline); ``jsonl_to_parquet`` lands the result as bucketed Parquet
shards that the (resumable, column-pruning) validate pipeline then
consumes.  This mirrors the reference's tokenize-then-validate split:
parse errors surface per file during conversion, constraint violations
during validation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..schema import TableSchema


def reconcile_to_schema(ds: "rd.Dataset", schema: TableSchema) -> "rd.Dataset":
    """Reconcile a raw-source Dataset to the declared columns: missing
    keys become nulls, extra keys are kept (the unknown-column policy
    is enforced later by the validator), declared dtypes are cast
    best-effort (uncastable values left as-is — the validator reports
    them via its checked-cast path when types still differ)."""

    def reconcile(batch: pa.Table, _s=schema) -> pa.Table:
        out = {}
        n = batch.num_rows
        for col in _s.columns:
            if col.name in batch.column_names:
                arr = batch[col.name]
                if arr.type != col.dtype:
                    try:
                        arr = pc.cast(arr, col.dtype)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        pass  # leave as-is; validator reports invalid_type
                out[col.name] = arr
            else:
                out[col.name] = pa.nulls(n, type=col.dtype)
        for name in batch.column_names:
            if name not in out:
                out[name] = batch[name]
        return pa.table(out)

    return ds.map_batches(reconcile, batch_format="pyarrow")


def read_jsonl(paths, schema: TableSchema) -> "rd.Dataset":
    """Dataset over JSONL files reconciled to the declared columns
    (see :func:`reconcile_to_schema`).  The raw reader resolves
    through the source-driver SPI (:mod:`rayskema.sources.spi`), so a
    deployment can swap the JSON engine like the reference's
    ``SetJSONDriver`` (source.go:73-81)."""
    from .spi import get_source_driver
    return reconcile_to_schema(get_source_driver("json")(paths), schema)


def read_csv(paths, schema: TableSchema, **read_kwargs) -> "rd.Dataset":
    """Dataset over CSV files reconciled to the declared columns — the
    same ingest seam as JSONL (reference source SPI, source.go:62-112)
    for the other ubiquitous text format.  ``read_kwargs`` pass through
    to the registered CSV driver (default ``ray.data.read_csv``:
    pyarrow CSV options — delimiter, header handling, column types)."""
    from .spi import get_source_driver
    return reconcile_to_schema(
        get_source_driver("csv")(paths, **read_kwargs), schema)


def write_jsonl(ds: "rd.Dataset", out_dir: str, *,
                token: str | None = None) -> int:
    """Write a Dataset as one JSONL file per non-empty block under
    ``out_dir`` (the export seam symmetric to :func:`read_jsonl`);
    returns the number of files written.  Naming / atomic-publish /
    retry-idempotency semantics come from the shared block sink
    (``sources/_blocksink.py``) — same contract as ``write_ipc`` and
    ``write_orc``.  Timestamps serialize as ISO-8601 strings (the
    RFC3339 codec on the read side decodes them); binary columns are
    not JSON-representable and raise up front."""
    from ._blocksink import write_block_files

    def _encode(tab: pa.Table) -> pa.Buffer:
        for f in tab.schema:
            if pa.types.is_binary(f.type) or pa.types.is_large_binary(
                    f.type) or pa.types.is_fixed_size_binary(f.type):
                raise TypeError(
                    f"write_jsonl: column {f.name!r} is binary — JSON "
                    "has no bytes type; encode it (base64/hex) first")
        s = tab.to_pandas().to_json(orient="records", lines=True,
                                    date_format="iso", date_unit="us")
        if s and not s.endswith("\n"):
            s += "\n"
        return pa.py_buffer(s.encode("utf-8"))

    return len(write_block_files(ds, out_dir, encode=_encode,
                                 ext="jsonl", token=token))


def write_csv(ds: "rd.Dataset", out_dir: str, *,
              token: str | None = None, **csv_kwargs) -> int:
    """Write a Dataset as one CSV file per non-empty block under
    ``out_dir`` (header row per file; pyarrow's CSV writer, so
    quoting/escaping follow RFC 4180); returns the number of files
    written.  Shares the block sink's atomic-publish contract.
    ``csv_kwargs`` pass through to ``pyarrow.csv.WriteOptions``.
    CSV has no null literal: a null STRING cell writes as an empty
    field and reads back as ``""`` (numeric nulls round-trip, since
    an empty field parses to null under a numeric dtype) — use
    ``write_jsonl`` when string nulls must survive."""
    from pyarrow import csv as pcsv

    from ._blocksink import write_block_files

    def _encode(tab: pa.Table) -> pa.Buffer:
        sink = pa.BufferOutputStream()
        opts = pcsv.WriteOptions(**csv_kwargs) if csv_kwargs else None
        pcsv.write_csv(tab, sink, write_options=opts)
        return sink.getvalue()

    return len(write_block_files(ds, out_dir, encode=_encode,
                                 ext="csv", token=token))


def csv_to_parquet(paths, schema: TableSchema, out_dir: str,
                   **write_kwargs) -> None:
    """Land CSV files as Parquet shards for the validate pipeline
    (one file per block — resumable output layout)."""
    read_csv(paths, schema).write_parquet(out_dir, **write_kwargs)


def jsonl_to_parquet(paths, schema: TableSchema, out_dir: str,
                     **write_kwargs) -> None:
    """Land JSONL transcripts as Parquet shards for the validate
    pipeline (one file per block — resumable output layout)."""
    read_jsonl(paths, schema).write_parquet(out_dir, **write_kwargs)
