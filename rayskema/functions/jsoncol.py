"""Vectorized scalar extraction from JSON string columns.

Training corpora carry metadata sidecars as JSON strings (the
``events.props`` shape).  goskema parses such payloads through its
token engine (reference ``internal/engine/engine.go:40-108``); the
columnar analogue extracts one scalar field across the whole batch.

Two paths per batch:

- **regex fast path** (default): one RE2-class ``pc.extract_regex``
  over the column pulls ``"key": <scalar>`` matches — zero Python per
  row.  Taken only for flat documents (no nested object/array
  values), where a top-level key match is unambiguous.
- **python fallback**: rows the regex could not resolve, rows
  containing any nested object/array (where a regex cannot tell the
  top-level key from a nested occurrence), and rows where the key
  substring occurs more than once (duplicate keys — JSON last-wins,
  but the regex would return the FIRST match) go through
  ``json.loads`` — only those rows pay the Python cost.
  ``mode="python"`` forces it everywhere.  Both paths produce
  identical results by construction: strict type map, int targets
  null outside ±(10^18-1).

Missing key, JSON null, or unparseable document all yield null.
"""
from __future__ import annotations

import json
import re
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd

_SCALAR_RE_TMPL = (
    r'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?'
    r'|"(?:[^"\\]*)"|true|false|null)'
)


def json_scalar(
    values: pa.ChunkedArray | pa.Array, key: str,
    value_type: pa.DataType, *, mode: str = "auto",
) -> pa.Array:
    """Extract ``key``'s scalar value from every JSON document in a
    string column.  Returns an array of ``value_type`` with nulls for
    missing/null/unextractable rows."""
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", key):
        raise ValueError("key must be a plain identifier (no regex "
                         "metacharacters / quotes)")
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    n = len(values)
    if mode == "python":
        return _python_path(values, key, value_type, np.arange(n))

    pattern = _SCALAR_RE_TMPL.format(key=re.escape(key))
    m = pc.extract_regex(values, pattern)
    raw = pc.struct_field(m, "v")
    # fall back to json.loads for (a) rows where the key exists but
    # the regex missed it (non-scalar / escaped value), (b) rows
    # containing ANY nested object/array — the regex cannot tell a
    # top-level key from the same key inside a nested value, and must
    # not silently return the wrong occurrence — and (c) rows where
    # the key substring occurs MORE THAN ONCE (duplicate keys:
    # json.loads is last-wins, the regex matches first)
    key_n = pc.count_substring(values, f'"{key}"')
    has_key = pc.greater(key_n, 0)
    dup_key = pc.greater(key_n, 1)
    nested = pc.match_substring_regex(values, r"[:,\[]\s*[\{\[]")
    # only the two-byte sequence backslash-quote can leave a raw '"'
    # inside a string value for the regex to mistake for the key (a
    # \\u0022 escape has no raw quote char); ordinary escapes like \\n
    # keep the fast path
    escaped = pc.match_substring(values, '\\"')
    need_py = pc.and_(
        has_key,
        pc.or_(pc.or_(pc.or_(pc.is_null(raw), nested), escaped),
               dup_key)) \
        .fill_null(False)
    out = _convert_raw(raw, value_type)
    py_idx = np.flatnonzero(np.asarray(need_py))
    if py_idx.size:
        patch = _python_path(values, key, value_type, py_idx)
        mask = np.zeros(n, dtype=bool)
        mask[py_idx] = True
        full = np.empty(n, dtype=object)
        pv = patch.to_pylist()
        for pos, val in zip(py_idx, pv):
            full[pos] = val
        out = pc.if_else(pa.array(mask), pa.array(list(full),
                                                  type=value_type), out)
    return out


def _convert_raw(raw: pa.Array, value_type: pa.DataType) -> pa.Array:
    """Matched JSON scalar text -> typed array (null for 'null' and
    for type-mismatched rows)."""
    raw = pc.if_else(pc.equal(raw, "null"), pa.nulls(len(raw),
                                                     type=pa.string()), raw)
    if pa.types.is_string(value_type) or pa.types.is_large_string(value_type):
        quoted = pc.match_substring_regex(raw, r'^"').fill_null(False)
        stripped = pc.utf8_replace_slice(
            pc.utf8_replace_slice(raw, 0, 1, ""), -1, 2**30, "")
        return pc.if_else(quoted, stripped,
                          pa.nulls(len(raw), type=pa.string()))
    numeric = pc.match_substring_regex(raw, r"^-?\d").fill_null(False)
    num_txt = pc.if_else(numeric, raw, pa.nulls(len(raw),
                                                type=pa.string()))
    if pa.types.is_boolean(value_type):
        return pc.if_else(
            pc.is_in(raw, value_set=pa.array(["true", "false"])),
            pc.equal(raw, "true"), pa.nulls(len(raw), type=pa.bool_()))
    if pa.types.is_integer(value_type):
        # only plain integer text maps to an integer target —
        # fractional / exponent / bool values are type mismatches;
        # magnitude capped at 18 digits so the batch-wide cast can
        # never raise on an out-of-int64-range value (such rows are
        # null, mirrored in the python path)
        plain = pc.match_substring_regex(
            num_txt, r"^-?\d{1,18}$").fill_null(False)
        return pc.cast(pc.if_else(plain, num_txt,
                                  pa.nulls(len(raw), type=pa.string())),
                       value_type)
    return pc.cast(num_txt, value_type)


def _python_path(values: pa.Array, key: str, value_type: pa.DataType,
                 idx: np.ndarray) -> pa.Array:
    out = []
    for i in idx:
        v = values[int(i)].as_py()
        try:
            doc = json.loads(v) if v is not None else None
        except (ValueError, TypeError):
            doc = None
        val = doc.get(key) if isinstance(doc, dict) else None
        if isinstance(val, (dict, list)):
            val = None
        # strict JSON-type -> Arrow-type map, matching the regex path:
        # bool<->bool, int->int/float, float->float, str->str; anything
        # else is a type mismatch -> null
        if val is not None:
            if pa.types.is_boolean(value_type):
                val = val if isinstance(val, bool) else None
            elif pa.types.is_integer(value_type):
                val = val if (isinstance(val, int)
                              and not isinstance(val, bool)
                              and -10**18 < val < 10**18) else None
            elif pa.types.is_floating(value_type):
                val = val if (isinstance(val, (int, float))
                              and not isinstance(val, bool)) else None
            elif (pa.types.is_string(value_type)
                  or pa.types.is_large_string(value_type)):
                val = val if isinstance(val, str) else None
        out.append(val)
    try:
        return pa.array(out, type=value_type)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        coerced = []
        for v in out:
            try:
                coerced.append(None if v is None else
                               pa.scalar(v).cast(value_type).as_py())
            except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError,
                    OverflowError):
                coerced.append(None)
        return pa.array(coerced, type=value_type)


def with_json_field(
    ds: "rd.Dataset", col: str, key: str, *, out_col: str,
    value_type: pa.DataType | None = None, mode: str = "auto",
) -> "rd.Dataset":
    """Append ``out_col`` = ``json_scalar(col, key)`` to every batch —
    a stateless vectorized ``map_batches`` stage (the regex compiles
    inside Arrow's kernel; no per-batch Python state to amortize)."""
    vt = value_type if value_type is not None else pa.int64()

    def _add(tab: pa.Table) -> pa.Table:
        return tab.append_column(
            out_col, json_scalar(tab[col], key, vt, mode=mode))

    return ds.map_batches(_add, batch_format="pyarrow")
