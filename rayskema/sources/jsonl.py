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
