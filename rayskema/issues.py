"""Violation (issue) model.

Mirrors the reference's machine-readable error model (goskema
``errors.go:10-57``): one violation row = (path, code, rule, message,
params) with a reserved code vocabulary and a deterministic ordering
contract (reference sorts issues by object key / array index,
``dsl/object_core.go:99,145``; README.md:574).  Re-expressed for columnar
data: a violation row additionally carries the *key columns* of the row
it refers to (e.g. ``conv_id``, ``turn_idx`` for transcript tables), and
the determinism contract becomes a final
``sort(key_cols + [path, code])`` over the violations Dataset —
independent of block/partition order.

This module is pure Python + pyarrow; no Ray dependency.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import pyarrow as pa

# ---------------------------------------------------------------------------
# Reserved code vocabulary — exact parity with the reference
# (/root/reference/errors.go:10-36).
# ---------------------------------------------------------------------------

INVALID_TYPE = "invalid_type"
REQUIRED = "required"
UNKNOWN_KEY = "unknown_key"
DUPLICATE_KEY = "duplicate_key"
TOO_SMALL = "too_small"
TOO_BIG = "too_big"
TOO_SHORT = "too_short"
TOO_LONG = "too_long"
PATTERN = "pattern"
INVALID_ENUM = "invalid_enum"
INVALID_FORMAT = "invalid_format"
DISCRIMINATOR_MISSING = "discriminator_missing"
DISCRIMINATOR_UNKNOWN = "discriminator_unknown"
UNION_AMBIGUOUS = "union_ambiguous"
PARSE_ERROR = "parse_error"
OVERFLOW = "overflow"
TRUNCATED = "truncated"
# list-element duplicate (reference kubeopenapi/list.go:29 "duplicate_item")
DUPLICATE_ITEM = "duplicate_item"
# anyOf/oneOf: no branch matched (reference union_ambiguity.go:63-70)
NO_MATCH = "no_match"
# Domain codes (reference errors.go:29-36)
DOMAIN_RANGE = "domain_range"
AGGREGATE_VIOLATION = "aggregate_violation"
UNIQUENESS = "uniqueness"
BUSINESS_RULE = "business_rule"
CONFLICT = "conflict"
DEPENDENCY_UNAVAILABLE = "dependency_unavailable"

ALL_CODES = frozenset(
    {
        INVALID_TYPE, REQUIRED, UNKNOWN_KEY, DUPLICATE_KEY, TOO_SMALL,
        TOO_BIG, TOO_SHORT, TOO_LONG, PATTERN, INVALID_ENUM, INVALID_FORMAT,
        DISCRIMINATOR_MISSING, DISCRIMINATOR_UNKNOWN, UNION_AMBIGUOUS,
        PARSE_ERROR, OVERFLOW, TRUNCATED, DOMAIN_RANGE, AGGREGATE_VIOLATION,
        UNIQUENESS, BUSINESS_RULE, CONFLICT, DEPENDENCY_UNAVAILABLE,
    }
)


# ---------------------------------------------------------------------------
# JSON Pointer helpers (reference internal/engine/enforce.go:210-221,
# ref_pathref.go:51-69): '~' -> '~0', '/' -> '~1'.
# ---------------------------------------------------------------------------

def escape_pointer_token(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def column_path(col: str, *subpath: str) -> str:
    """Render the JSON-Pointer-style path for a column (and optional
    struct subfields): ``/text``, ``/meta/lang``."""
    parts = [escape_pointer_token(col)] + [escape_pointer_token(s) for s in subpath]
    return "/" + "/".join(parts)


# ---------------------------------------------------------------------------
# Canonical params formatting — determinism contract (reference formats
# floats with strconv.FormatFloat(f,'g',-1,64), dsl/primitives.go:1204).
# We pin: JSON with sorted keys, no whitespace, shortest-roundtrip floats
# (Python repr == shortest roundtrip for float64), ints as ints.
# ---------------------------------------------------------------------------

def canon_params(params: Mapping[str, Any] | None) -> str:
    if not params:
        return ""
    return json.dumps(params, sort_keys=True, separators=(",", ":"), default=str)


@dataclass(frozen=True)
class Issue:
    """One violation. ``key`` holds the values of the table's key columns
    for the offending row (empty tuple for schema-level issues)."""

    path: str
    code: str
    rule: str = ""
    message: str = ""
    params: Mapping[str, Any] = field(default_factory=dict)
    key: tuple = ()

    def __post_init__(self) -> None:
        if self.code not in ALL_CODES:
            raise ValueError(f"unknown issue code: {self.code!r}")


# Columns every violations table carries after the key columns.
VIOLATION_COLS = ["path", "code", "rule", "message", "params"]


def violations_schema(key_fields: Sequence[pa.Field]) -> pa.Schema:
    """Arrow schema of a violations table: nullable key columns (null for
    schema-level issues) followed by the violation columns."""
    fields = [pa.field(f.name, f.type, nullable=True) for f in key_fields]
    fields += [pa.field(c, pa.string(), nullable=False) for c in VIOLATION_COLS]
    return pa.schema(fields)


def empty_violations(key_fields: Sequence[pa.Field]) -> pa.Table:
    schema = violations_schema(key_fields)
    return schema.empty_table()


def violations_from_mask(
    batch: pa.Table,
    mask: pa.ChunkedArray | pa.Array,
    key_cols: Sequence[str],
    path: str,
    code: str,
    rule: str = "",
    message: str = "",
    params: str = "",
) -> pa.Table:
    """Build violation rows for every True position of ``mask`` over
    ``batch``, carrying that row's key column values. Vectorized: one
    ``filter`` per key column, constant columns for the rest."""
    import pyarrow.compute as pc

    mask = pc.fill_null(mask, False)
    n = pc.sum(mask).as_py() or 0
    key_fields = [batch.schema.field(k) for k in key_cols]
    if n == 0:
        return empty_violations(key_fields)
    arrays = [batch.column(k).filter(mask) for k in key_cols]
    for val in (path, code, rule, message, params):
        arrays.append(pa.array([val] * n, type=pa.string()))
    return pa.Table.from_arrays(arrays, schema=violations_schema(key_fields))


def schema_level_violation(
    key_fields: Sequence[pa.Field],
    path: str,
    code: str,
    rule: str = "",
    message: str = "",
    params: str = "",
) -> pa.Table:
    """A single violation row with null key columns (table/schema scope)."""
    arrays = [pa.nulls(1, type=f.type) for f in key_fields]
    for val in (path, code, rule, message, params):
        arrays.append(pa.array([val], type=pa.string()))
    return pa.Table.from_arrays(arrays, schema=violations_schema(key_fields))


def sort_violations(table: pa.Table, key_cols: Sequence[str]) -> pa.Table:
    """Deterministic ordering contract: key columns then path, code, rule,
    message, params (total order ⇒ byte-stable output under any
    parallelism). Nulls (schema-level issues) sort first."""
    keys = [(c, "ascending") for c in list(key_cols) + VIOLATION_COLS]
    import pyarrow.compute as pc

    indices = pc.sort_indices(
        table, sort_keys=keys, null_placement="at_start")
    return table.take(indices)
