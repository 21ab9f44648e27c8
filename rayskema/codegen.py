"""Ahead-of-time schema compilation: render a :class:`TableSchema`
to a standalone Python module.

Reference analogue: ``goskema compile`` (``cmd/goskema/main.go:23-38``)
renders per-type validator source from the schema IR
(``internal/gen/render.go``) — generated code specialized to ONE
schema, with constants folded in, that calls back into the runtime's
small helpers (the reference's generated parsers call
``goskema.EnforceSource`` etc.).  This module is the same split for
the columnar engine:

- the declared schema is rendered as a **source literal** (no JSON /
  YAML parsing at runtime, diffable, reviewable, pinned by
  ``schema_hash`` in the header);
- the hot flat-column checks (NonNull / Regex / Enum / Range /
  LenBounds / ByteBounds) are rendered as **straight-line functions
  with every constant folded** — pattern strings pre-anchored, params
  JSON pre-rendered, the length kernel and range comparators chosen at
  generation time;
- everything the generator does not specialize (struct subpaths,
  unions, cross-field rules, contains/list-unique, map-key regex)
  falls back to the interpreted compiled plan at the SAME check index,
  so the generated ``validate_batch`` is bit-identical to
  ``ConstraintPlan.validate`` by construction (a property test in
  ``tests/test_codegen.py`` asserts it).

CLI: ``python -m rayskema gen --contract contract.json --out gen_orders.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import pyarrow as pa

from . import schema as _schema_mod
from .issues import canon_params, column_path
from .schema import (
    ByteBounds, Column, Enum, LenBounds, NonNull, Range, Regex,
    TableSchema,
)

# ---------------------------------------------------------------------------
# Literal renderers: value -> Python source.
# ---------------------------------------------------------------------------

_SIMPLE_DTYPES = {
    # names where str(dtype) == the pa constructor name
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "string", "large_string", "binary", "large_binary",
    "bool", "null",
}
_DTYPE_CTOR = {"bool": "bool_", "null": "null"}


def render_dtype(dt: pa.DataType) -> str:
    """Arrow type -> constructor source (``pa.`` prefixed)."""
    s = str(dt)
    if s in _SIMPLE_DTYPES:
        return f"pa.{_DTYPE_CTOR.get(s, s)}()"
    # Arrow's str() names differ from the pa constructor for floats
    if s == "double":
        return "pa.float64()"
    if s == "float":
        return "pa.float32()"
    if s == "halffloat":
        return "pa.float16()"
    # str(pa.date32()) is 'date32[day]' / str(pa.date64()) 'date64[ms]'
    if pa.types.is_date32(dt):
        return "pa.date32()"
    if pa.types.is_date64(dt):
        return "pa.date64()"
    if pa.types.is_time32(dt) or pa.types.is_time64(dt):
        bits = 32 if pa.types.is_time32(dt) else 64
        return f"pa.time{bits}({dt.unit!r})"
    if pa.types.is_timestamp(dt):
        tz = f", tz={dt.tz!r}" if dt.tz else ""
        return f"pa.timestamp({dt.unit!r}{tz})"
    if pa.types.is_decimal(dt):
        return f"pa.decimal128({dt.precision}, {dt.scale})"
    if pa.types.is_duration(dt):
        return f"pa.duration({dt.unit!r})"
    if pa.types.is_fixed_size_list(dt):
        return (f"pa.list_({render_dtype(dt.value_type)}, "
                f"{dt.list_size})")
    if pa.types.is_large_list(dt):
        return f"pa.large_list({render_dtype(dt.value_type)})"
    if pa.types.is_list(dt):
        return f"pa.list_({render_dtype(dt.value_type)})"
    if pa.types.is_map(dt):
        return (f"pa.map_({render_dtype(dt.key_type)}, "
                f"{render_dtype(dt.item_type)})")
    if pa.types.is_struct(dt):
        fields = ", ".join(
            f"({f.name!r}, {render_dtype(f.type)})" for f in dt)
        return f"pa.struct([{fields}])"
    raise NotImplementedError(f"cannot render dtype {dt!r} as source")


def render_value(v: Any) -> str:
    """Recursive Python-literal renderer for schema declarations."""
    if isinstance(v, pa.DataType):
        return render_dtype(v)
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        cls = type(v)
        if cls.__module__ != _schema_mod.__name__:
            raise NotImplementedError(
                f"cannot render non-schema dataclass {cls!r}")
        body = ", ".join(
            f"{f.name}={render_value(getattr(v, f.name))}"
            for f in dataclasses.fields(v))
        return f"_s.{cls.__name__}({body})"
    if isinstance(v, _schema_mod.Unknown):
        return f"_s.Unknown.{v.name}"
    if isinstance(v, tuple):
        inner = ", ".join(render_value(x) for x in v)
        return f"({inner},)" if len(v) == 1 else f"({inner})"
    if isinstance(v, list):
        return "[" + ", ".join(render_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{render_value(k)}: {render_value(x)}"
            for k, x in v.items()) + "}"
    if v is None or isinstance(v, (str, int, float, bool, bytes)):
        return repr(v)
    raise NotImplementedError(f"cannot render value {v!r} as source")


def render_schema(schema: TableSchema) -> str:
    cols = ",\n        ".join(render_value(c) for c in schema.columns)
    rules = ", ".join(render_value(r) for r in schema.rules)
    norms = ", ".join(render_value(n) for n in schema.normalizers)
    return (
        "SCHEMA = _s.TableSchema(\n"
        f"    columns=(\n        {cols},\n    ),\n"
        f"    key_columns={render_value(schema.key_columns)},\n"
        f"    unknown={render_value(schema.unknown)},\n"
        f"    rules=({rules}{',' if schema.rules else ''}),\n"
        f"    name={schema.name!r},\n"
        f"    normalizers=({norms}{',' if schema.normalizers else ''}),\n"
        ")"
    )


# ---------------------------------------------------------------------------
# Specialized check renderers (mirror plan._compile_constraint exactly;
# constants folded at generation time).
# ---------------------------------------------------------------------------

def _gen_check(idx: int, col: Column, c: Any) -> tuple[str, str] | None:
    """Return (module-level constants source, function source) for a
    constraint the generator specializes, or None for fallback."""
    fname = f"_check_{idx}"
    path = column_path(col.name)
    name = col.name

    if isinstance(c, NonNull):
        params = canon_params({"column": name})
        return "", (
            f"def {fname}(t):\n"
            f"    # {path} NonNull (required)\n"
            f"    return violations_from_mask(\n"
            f"        t, pc.is_null(t[{name!r}]), _KEY_COLS, {path!r},\n"
            f"        'required', {c.rule!r}, 'value is required', "
            f"{params!r})\n")

    if isinstance(c, Regex):
        pat = c.pattern if c.search else f"^(?:{c.pattern})$"
        params = canon_params({"pattern": c.pattern})
        return "", (
            f"def {fname}(t):\n"
            f"    # {path} Regex (pattern pre-anchored at gen time)\n"
            f"    m = pc.invert(pc.match_substring_regex(\n"
            f"        t[{name!r}], {pat!r}))\n"
            f"    return violations_from_mask(\n"
            f"        t, m, _KEY_COLS, {path!r}, 'pattern', {c.rule!r},\n"
            f"        'value does not match pattern', {params!r})\n")

    if isinstance(c, Enum):
        params = canon_params({"values": list(c.values)})
        const = (f"_ENUM_{idx} = pa.array("
                 f"{render_value(list(c.values))})\n")
        return const, (
            f"def {fname}(t):\n"
            f"    # {path} Enum (value set built once at import)\n"
            f"    m = pc.and_(pc.invert(pc.is_in(\n"
            f"        t[{name!r}], value_set=_ENUM_{idx})),\n"
            f"        pc.is_valid(t[{name!r}]))\n"
            f"    return violations_from_mask(\n"
            f"        t, m, _KEY_COLS, {path!r}, 'invalid_enum', "
            f"{c.rule!r},\n"
            f"        'value not in enum', {params!r})\n")

    if isinstance(c, Range):
        lo, hi = c.min, c.max
        lo_k = "pc.less_equal" if c.exclusive_min else "pc.less"
        hi_k = "pc.greater_equal" if c.exclusive_max else "pc.greater"
        plo = canon_params({"min": lo, "exclusive": c.exclusive_min})
        phi = canon_params({"max": hi, "exclusive": c.exclusive_max})
        body = [f"def {fname}(t):",
                f"    # {path} Range (comparators chosen at gen time)",
                f"    v = t[{name!r}]",
                "    out = []"]
        if lo is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, {lo_k}(v, {lo!r}), _KEY_COLS, {path!r},",
                f"        'too_small', {c.rule!r}, 'below minimum', "
                f"{plo!r}))"]
        if hi is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, {hi_k}(v, {hi!r}), _KEY_COLS, {path!r},",
                f"        'too_big', {c.rule!r}, 'above maximum', "
                f"{phi!r}))"]
        body += ["    return pa.concat_tables(out) if out else \\",
                 "        empty_violations("
                 "[t.schema.field(k) for k in _KEY_COLS])"]
        return "", "\n".join(body) + "\n"

    if isinstance(c, LenBounds):
        lo, hi = c.min_len, c.max_len
        is_list = (pa.types.is_list(col.dtype)
                   or pa.types.is_fixed_size_list(col.dtype)
                   or pa.types.is_large_list(col.dtype))
        kernel = "pc.list_value_length" if is_list else "pc.utf8_length"
        plo = canon_params({"min_len": lo})
        phi = canon_params({"max_len": hi})
        body = [f"def {fname}(t):",
                f"    # {path} LenBounds (length kernel chosen at gen"
                " time)",
                f"    ln = {kernel}(t[{name!r}])",
                "    out = []"]
        if lo is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, pc.less(ln, {lo!r}), _KEY_COLS, {path!r},",
                f"        'too_short', {c.rule!r}, 'too short', "
                f"{plo!r}))"]
        if hi is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, pc.greater(ln, {hi!r}), _KEY_COLS, "
                f"{path!r},",
                f"        'too_long', {c.rule!r}, 'too long', "
                f"{phi!r}))"]
        body += ["    return pa.concat_tables(out) if out else \\",
                 "        empty_violations("
                 "[t.schema.field(k) for k in _KEY_COLS])"]
        return "", "\n".join(body) + "\n"

    if isinstance(c, ByteBounds):
        lo, hi = c.min_bytes, c.max_bytes
        plo = canon_params({"min_bytes": lo})
        phi = canon_params({"max_bytes": hi})
        body = [f"def {fname}(t):",
                f"    # {path} ByteBounds (per-cell DoS guard)",
                f"    ln = pc.binary_length(t[{name!r}])",
                "    out = []"]
        if lo is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, pc.less(ln, {lo!r}), _KEY_COLS, {path!r},",
                f"        'too_short', {c.rule!r}, 'below byte bound', "
                f"{plo!r}))"]
        if hi is not None:
            body += [
                "    out.append(violations_from_mask(",
                f"        t, pc.greater(ln, {hi!r}), _KEY_COLS, "
                f"{path!r},",
                f"        'truncated', {c.rule!r}, 'exceeds byte "
                f"bound', {phi!r}))"]
        body += ["    return pa.concat_tables(out) if out else \\",
                 "        empty_violations("
                 "[t.schema.field(k) for k in _KEY_COLS])"]
        return "", "\n".join(body) + "\n"

    return None  # fallback to the interpreted compiled check


# ---------------------------------------------------------------------------
# Module assembly.
# ---------------------------------------------------------------------------

_HEADER = '''\
"""Code generated by `python -m rayskema gen`; DO NOT EDIT.

Schema: {name}  (schema_hash={shash})
Specialized checks: {n_gen} generated / {n_total} total (the rest run
the interpreted compiled plan at the same index — output is
bit-identical to ConstraintPlan.validate by construction).
"""
import pyarrow as pa
import pyarrow.compute as pc

from rayskema import schema as _s
from rayskema.issues import empty_violations, violations_from_mask
from rayskema.plan import ConstraintPlan

'''

_FOOTER = '''

_PLAN = ConstraintPlan(SCHEMA)
_CHECKS = list(_PLAN.checks)
# Load-time guards: the patches below overwrite interpreted checks by
# POSITIONAL index, which is only sound if the installed rayskema still
# builds the plan with the layout this module was generated against.
# A mismatch fails loudly here instead of silently swapping checks.
if len(_CHECKS) != {n_total}:
    raise ImportError(
        "generated validator is stale: ConstraintPlan built "
        f"{{len(_CHECKS)}} checks, module was generated for {n_total} "
        "— regenerate with `python -m rayskema gen`")
if SCHEMA.schema_hash() != {shash!r}:
    raise ImportError(
        "generated validator is stale: schema_hash mismatch "
        f"({{SCHEMA.schema_hash()!r}} != {shash!r}) "
        "— regenerate with `python -m rayskema gen`")
{patches}

def validate_batch(batch: pa.Table) -> pa.Table:
    """Fused per-batch validation (same contract as
    ConstraintPlan.validate: normalize + every check, violations
    concatenated in declaration order)."""
    from rayskema.plan import apply_normalizers, normalize_batch
    normalized, viols = normalize_batch(batch, SCHEMA)
    if SCHEMA.normalizers:
        normalized = apply_normalizers(normalized, SCHEMA.normalizers)
    out = [viols] if viols.num_rows else []
    for check in _CHECKS:
        v = check(normalized)
        if v.num_rows:
            out.append(v)
    if not out:
        return empty_violations(_PLAN.key_fields)
    return pa.concat_tables(out)


def validate_dataset(ds, **map_batches_kwargs):
    """Distributed validation: map the fused batch validator over a
    Ray Dataset (zero-copy Arrow batches)."""
    map_batches_kwargs.setdefault("batch_format", "pyarrow")
    return ds.map_batches(validate_batch, **map_batches_kwargs)


def make_plan(**kwargs) -> ConstraintPlan:
    """An interpreted plan over the same schema for callers needing
    fail_fast / max_issues options."""
    return ConstraintPlan(SCHEMA, **kwargs)
'''


def generate_module(schema: TableSchema) -> str:
    """Render the full generated-module source for ``schema``."""
    consts: list[str] = []
    funcs: list[str] = []
    patches: list[str] = []
    idx = 0
    for col in schema.columns:
        for c in col.constraints:
            gen = _gen_check(idx, col, c)
            if gen is not None:
                const, func = gen
                if const:
                    consts.append(const)
                funcs.append(func)
                patches.append(f"_CHECKS[{idx}] = _check_{idx}")
            idx += 1
    # cross-field / union rules follow columns in ConstraintPlan's
    # check order; the generator leaves them interpreted (same as the
    # reference's generated skeletons delegating to runtime helpers)
    n_total = idx + len(schema.rules_of(_schema_mod.CrossFieldRule)) \
        + len(schema.rules_of(_schema_mod.UnionRule))
    src = _HEADER.format(
        name=schema.name, shash=schema.schema_hash(),
        n_gen=len(patches), n_total=n_total)
    src += f"_KEY_COLS = {render_value(list(schema.key_columns))}\n\n"
    if consts:
        src += "".join(consts) + "\n"
    src += render_schema(schema) + "\n\n"
    src += "\n\n".join(funcs)
    src += _FOOTER.format(patches="\n".join(patches), n_total=n_total,
                          shash=schema.schema_hash())
    return src


def compile_schema(schema: TableSchema, out_path: str) -> str:
    """Write the generated module for ``schema`` to ``out_path``;
    returns the rendered source."""
    src = generate_module(schema)
    with open(out_path, "w") as f:
        f.write(src)
    return src
