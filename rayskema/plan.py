"""Constraint-plan compiler: TableSchema -> fused vectorized batch kernels.

The analogue of the reference's ``Build()`` step (goskema
``dsl/object_builder.go:178-201``) and its planned compiled engine
(``dsl/irconv/irconv.go`` -> ``internal/gen/render.go``, SURVEY §2.11
X10): compile the declarative schema ONCE into a list of closures
``fn(pa.Table) -> pa.Table`` (violation rows), each built purely from
``pyarrow.compute`` kernels — no Python row loops anywhere.  The
compiled plan lives inside each :class:`BatchValidator` actor
(``__init__`` compiles; ``__call__`` runs per batch), so regex
compilation, enum value-set construction and constant params strings
are amortized across every batch an actor sees.

Phase order mirrors the reference pipeline (``parse.go:13-42``,
``dsl/object_core.go:171-196``): type reconcile/coerce -> defaults ->
unknown-column policy -> per-column checks -> cross-field refinements.
Determinism does NOT depend on evaluation order: the final violations
sort (issues.sort_violations) is a total order.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .issues import (
    AGGREGATE_VIOLATION, DISCRIMINATOR_MISSING, DISCRIMINATOR_UNKNOWN,
    DUPLICATE_ITEM, INVALID_ENUM, INVALID_FORMAT, INVALID_TYPE, NO_MATCH,
    OVERFLOW, PATTERN, REQUIRED, TOO_BIG, TOO_LONG, TOO_SHORT, TOO_SMALL,
    TRUNCATED, UNION_AMBIGUOUS, UNKNOWN_KEY, canon_params, column_path,
    empty_violations, schema_level_violation, violations_from_mask,
    violations_schema,
)
from .schema import (
    AnyOf, ByteBounds, Column, Contains, CrossFieldRule, DriftRule, Enum,
    LenBounds, ListUnique, MapKeyRegex, NonNull, Normalizer, Range, Regex,
    StructField, TableSchema, TsFormat, UnionRule, Unknown,
)


def _expr_with_col(expr: Mapping[str, Any], col: str) -> dict:
    """Inject the target column name into a column-less predicate expr
    (recursively through and/or/not combinators)."""
    out = dict(expr)
    if out.get("op") in ("and", "or", "not"):
        out["args"] = tuple(_expr_with_col(a, col) for a in out["args"])
    elif "col" not in out:
        out["col"] = col
    return out

CheckFn = Callable[[pa.Table], pa.Table]


def limit_arrow_threads() -> None:
    """Pin pyarrow's internal thread pool to the task's CPU share.

    Ray sizes ``OMP_NUM_THREADS`` to the task's ``num_cpus`` but arrow's
    pool defaults to the PHYSICAL core count — with many concurrent
    1-CPU tasks each sort/join/kernel tries to fan out node-wide and the
    node thrashes (observed 25x slowdown on the bucket-checker stage).
    Idempotent per worker process.
    """
    import os

    want = max(1, int(float(os.environ.get("OMP_NUM_THREADS", "1"))))
    if pa.cpu_count() != want:
        pa.set_cpu_count(want)


# ---------------------------------------------------------------------------
# Declarative boolean expressions (CrossFieldRule.when/expect) -> masks.
# Vocabulary: {"op": ..., "col": ..., "value"/"values"/"pattern": ...} and
# combinators {"op": "and"/"or"/"not", "args": [...]}.  The reference
# analogue is rules.If/IfAll/IfAny + Eq/Ne/Lt/... (rules/rules.go:14-76).
# ---------------------------------------------------------------------------

_CMP = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less, "le": pc.less_equal,
        "gt": pc.greater, "ge": pc.greater_equal}


def compile_expr(expr: Mapping[str, Any]) -> Callable[[pa.Table], pa.ChunkedArray]:
    op = expr["op"]
    if op in _CMP:
        col, value, kernel = expr["col"], expr.get("value"), _CMP[op]
        other = expr.get("other_col")
        if other is not None:
            return lambda t: kernel(t[col], t[other])
        return lambda t: kernel(t[col], value)
    if op == "is_null":
        col = expr["col"]
        return lambda t: pc.is_null(t[col])
    if op == "not_null":
        col = expr["col"]
        return lambda t: pc.is_valid(t[col])
    if op == "in":
        col, values = expr["col"], expr["values"]
        vs = pa.array(list(values))
        return lambda t: pc.is_in(t[col], value_set=vs)
    if op == "regex":
        col, pat = expr["col"], f"^(?:{expr['pattern']})$"
        return lambda t: pc.match_substring_regex(t[col], pat)
    if op == "regex_search":
        col, pat = expr["col"], expr["pattern"]
        return lambda t: pc.match_substring_regex(t[col], pat)
    if op == "and":
        fns = [compile_expr(a) for a in expr["args"]]
        def _and(t, fns=fns):
            m = fns[0](t)
            for f in fns[1:]:
                m = pc.and_kleene(m, f(t))
            return m
        return _and
    if op == "or":
        fns = [compile_expr(a) for a in expr["args"]]
        def _or(t, fns=fns):
            m = fns[0](t)
            for f in fns[1:]:
                m = pc.or_kleene(m, f(t))
            return m
        return _or
    if op == "not":
        f = compile_expr(expr["args"][0])
        return lambda t: pc.invert(f(t))
    raise ValueError(f"unknown expr op: {op!r}")


# ---------------------------------------------------------------------------
# Per-column constraint compilers.  Each returns fn(batch)->violations.
# Null cells are skipped by value checks (NonNull owns nulls), matching
# the reference where type/format checks run on present values only.
# ---------------------------------------------------------------------------

def _compile_constraint(col: Column, c, key_cols: Sequence[str],
                        path: str | None = None) -> CheckFn:
    if isinstance(c, StructField):
        if c.constraint is None:
            # codec-only StructField (nested int-or-string): the
            # decode happens in _reconcile_struct; nothing to check
            def noop(t: pa.Table) -> pa.Table:
                return empty_violations(
                    [t.schema.field(k) for k in key_cols])
            return noop
        # nested subfield: compile the inner constraint against a view
        # table where the column is replaced by the child array
        # (pc.struct_field — zero-copy); the violation path is rebased
        # to /<col>/<sub...> (reference child-issue rebasing,
        # dsl/object_core.go:53-80)
        inner = _compile_constraint(
            col, c.constraint, key_cols,
            path=column_path(col.name, *c.path))
        subpath = tuple(c.path)
        name = col.name

        parent_gate = c.when_parent_valid

        def check(t: pa.Table) -> pa.Table:
            if parent_gate:
                # reference embedded.go:22-26: a null/absent outer
                # object is NOT an embedded-presence violation — the
                # outer field's own required rule owns that case
                t = t.filter(pc.is_valid(t[name]))
            child = t[name]
            if isinstance(child, pa.ChunkedArray):
                child = child.combine_chunks()
            for part in subpath:
                child = pc.struct_field(child, part)
            view = t.set_column(t.schema.get_field_index(name),
                                pa.field(name, child.type), child)
            return inner(view)

        return check
    if path is None:
        path = column_path(col.name)
    name = col.name

    if isinstance(c, NonNull):
        params = canon_params({"column": name})
        def check(t: pa.Table) -> pa.Table:
            return violations_from_mask(
                t, pc.is_null(t[name]), key_cols, path, REQUIRED, c.rule,
                "value is required", params)
        return check

    if isinstance(c, Regex):
        pat = c.pattern if c.search else f"^(?:{c.pattern})$"
        params = canon_params({"pattern": c.pattern})
        def check(t: pa.Table) -> pa.Table:
            m = pc.invert(pc.match_substring_regex(t[name], pat))
            return violations_from_mask(
                t, m, key_cols, path, PATTERN, c.rule,
                "value does not match pattern", params)
        return check

    if isinstance(c, Enum):
        vs = pa.array(list(c.values))
        params = canon_params({"values": list(c.values)})
        def check(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.invert(pc.is_in(t[name], value_set=vs)),
                        pc.is_valid(t[name]))
            return violations_from_mask(
                t, m, key_cols, path, INVALID_ENUM, c.rule,
                "value not in enum", params)
        return check

    if isinstance(c, LenBounds):
        lo, hi = c.min_len, c.max_len
        plo = canon_params({"min_len": lo})
        phi = canon_params({"max_len": hi})
        # strings => UTF-8 char length; list columns => element count
        # (reference array min/maxItems, dsl/array.go:45-48)
        is_list = pa.types.is_list(col.dtype) or \
            pa.types.is_fixed_size_list(col.dtype) or \
            pa.types.is_large_list(col.dtype)
        length_kernel = pc.list_value_length if is_list else pc.utf8_length
        def check(t: pa.Table) -> pa.Table:
            ln = length_kernel(t[name])
            out = []
            if lo is not None:
                out.append(violations_from_mask(
                    t, pc.less(ln, lo), key_cols, path, TOO_SHORT, c.rule,
                    "too short", plo))
            if hi is not None:
                out.append(violations_from_mask(
                    t, pc.greater(ln, hi), key_cols, path, TOO_LONG, c.rule,
                    "too long", phi))
            return pa.concat_tables(out) if out else empty_violations(
                [t.schema.field(k) for k in key_cols])
        return check

    if isinstance(c, ByteBounds):
        lo, hi = c.min_bytes, c.max_bytes
        plo = canon_params({"min_bytes": lo})
        phi = canon_params({"max_bytes": hi})
        def check(t: pa.Table) -> pa.Table:
            ln = pc.binary_length(t[name])
            out = []
            if lo is not None:
                out.append(violations_from_mask(
                    t, pc.less(ln, lo), key_cols, path, TOO_SHORT, c.rule,
                    "below byte bound", plo))
            if hi is not None:
                # over the DoS byte cap => truncated (reference MaxBytes
                # semantics, parse.go:155-167)
                out.append(violations_from_mask(
                    t, pc.greater(ln, hi), key_cols, path, TRUNCATED, c.rule,
                    "exceeds byte bound", phi))
            return pa.concat_tables(out) if out else empty_violations(
                [t.schema.field(k) for k in key_cols])
        return check

    if isinstance(c, Range):
        lo, hi = c.min, c.max
        lo_kernel = pc.less_equal if c.exclusive_min else pc.less
        hi_kernel = pc.greater_equal if c.exclusive_max else pc.greater
        plo = canon_params({"min": lo, "exclusive": c.exclusive_min})
        phi = canon_params({"max": hi, "exclusive": c.exclusive_max})
        def check(t: pa.Table) -> pa.Table:
            v = t[name]
            out = []
            if lo is not None:
                out.append(violations_from_mask(
                    t, lo_kernel(v, lo), key_cols, path, TOO_SMALL, c.rule,
                    "below minimum", plo))
            if hi is not None:
                out.append(violations_from_mask(
                    t, hi_kernel(v, hi), key_cols, path, TOO_BIG, c.rule,
                    "above maximum", phi))
            return pa.concat_tables(out) if out else empty_violations(
                [t.schema.field(k) for k in key_cols])
        return check

    if isinstance(c, MapKeyRegex):
        pat = c.pattern if c.search else f"^(?:{c.pattern})$"
        params = canon_params({"pattern": c.pattern})

        def check(t: pa.Table) -> pa.Table:
            arr = t[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # map<k,v> flattens to per-entry keys; segment-reduce "any
            # bad key" back to rows via the offsets
            keys = arr.keys
            bad_keys = pc.invert(pc.match_substring_regex(keys, pat))
            bad_np = np.asarray(pc.fill_null(bad_keys, True))
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
            starts = offsets[:-1] - offsets[0]
            n_entries = np.diff(offsets)
            row_bad = np.zeros(t.num_rows, dtype=bool)
            nz = n_entries > 0
            if bad_np.size and nz.any():
                cums = np.concatenate([[0], np.cumsum(bad_np)])
                ends = starts + n_entries
                row_bad[nz] = (cums[ends[nz]] - cums[starts[nz]]) > 0
            return violations_from_mask(
                t, pa.array(row_bad), key_cols, path, PATTERN, c.rule,
                "map key does not match pattern", params)

        return check

    if isinstance(c, AnyOf):
        # anyOf/oneOf ambiguity strategies (reference
        # union_ambiguity.go:46-75): vectorized per-branch masks,
        # summed to a match count per row
        preds = [compile_expr(_expr_with_col(b, name)) for b in c.branches]
        strategy = c.strategy
        pamb = canon_params({"branches": len(preds), "strategy": strategy})

        def check(t: pa.Table) -> pa.Table:
            counts = np.zeros(t.num_rows, dtype=np.int64)
            for p in preds:
                m = p(t)
                if isinstance(m, pa.ChunkedArray):
                    m = m.combine_chunks()
                counts += np.asarray(pc.fill_null(m, False))
            valid = np.asarray(pc.is_valid(
                t[name].combine_chunks() if isinstance(
                    t[name], pa.ChunkedArray) else t[name]))
            out = []
            if strategy == "error":
                out.append(violations_from_mask(
                    t, pa.array((counts > 1) & valid), key_cols, path,
                    UNION_AMBIGUOUS, c.rule,
                    "value matches more than one oneOf branch", pamb))
            out.append(violations_from_mask(
                t, pa.array((counts == 0) & valid), key_cols, path,
                NO_MATCH, c.rule, "value matches no branch", pamb))
            return pa.concat_tables(out)

        return check

    if isinstance(c, Contains):
        # element-count constraint on a list column (reference
        # kubeopenapi/contains.go:82-126): count matching elements per
        # row via one vectorized predicate over the flattened values +
        # a prefix-sum segment reduce — no per-row loop
        pred = compile_expr({**dict(c.predicate), "col": "_el"})
        lo, hi = c.min_contains, c.max_contains
        plo = canon_params({"min_contains": lo, "predicate": dict(c.predicate)})
        phi = canon_params({"max_contains": hi, "predicate": dict(c.predicate)})

        def check(t: pa.Table) -> pa.Table:
            arr = t[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = pc.list_value_length(arr).fill_null(0)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = arr.flatten()      # values of non-null rows, in order
            if len(flat):
                mask = pred(pa.table({"_el": flat}))
                m_np = np.asarray(pc.fill_null(
                    mask.combine_chunks() if isinstance(
                        mask, pa.ChunkedArray) else mask, False))
            else:
                m_np = np.zeros(0, dtype=bool)
            cums = np.concatenate([[0], np.cumsum(m_np)])
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            count = cums[starts + lens] - cums[starts]
            valid = ~np.asarray(arr.is_null())  # null lists are skipped
            out = []
            if lo is not None:
                out.append(violations_from_mask(
                    t, pa.array((count < lo) & valid), key_cols, path,
                    TOO_SHORT, c.rule,
                    "contains matched less than minContains", plo))
            if hi is not None:
                out.append(violations_from_mask(
                    t, pa.array((count > hi) & valid), key_cols, path,
                    TOO_LONG, c.rule,
                    "contains matched more than maxContains", phi))
            return pa.concat_tables(out) if out else empty_violations(
                [t.schema.field(k) for k in key_cols])

        return check

    if isinstance(c, ListUnique):
        # per-row element uniqueness on a list column (reference
        # x-kubernetes-list-type set/map, kubeopenapi/list.go:19-136):
        # hash elements (or the composite struct key), lexsort by
        # (row, hash), duplicates are adjacent equals within a row
        keys = tuple(c.keys)
        params = canon_params({"keys": list(keys)} if keys else {})

        def _element_hashes(flat: pa.Array) -> np.ndarray:
            from .state.sketches import _hash64, hash_strings
            if pa.types.is_string(flat.type) or \
                    pa.types.is_large_string(flat.type):
                return hash_strings(flat)
            if pa.types.is_floating(flat.type):
                v = flat.to_numpy(zero_copy_only=False)
                return _hash64(np.asarray(v, dtype=np.float64)
                               .view(np.uint64) + np.uint64(1))
            v = pc.cast(flat, pa.int64(), safe=False).fill_null(
                np.iinfo(np.int64).min).to_numpy(zero_copy_only=False)
            from .state.sketches import _hash64 as h64
            return h64(v.astype(np.uint64))

        def check(t: pa.Table) -> pa.Table:
            from .state.sketches import _hash64
            arr = t[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = pc.list_value_length(arr).fill_null(0)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = arr.flatten()
            if keys:
                h = np.zeros(len(flat), dtype=np.uint64)
                for k in keys:
                    h = _hash64(h ^ _element_hashes(
                        pc.struct_field(flat, k).combine_chunks()
                        if isinstance(pc.struct_field(flat, k),
                                      pa.ChunkedArray)
                        else pc.struct_field(flat, k)))
            else:
                h = _element_hashes(flat)
            row_ids = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
            order = np.lexsort((h, row_ids))
            rr, rh = row_ids[order], h[order]
            dup = np.zeros(len(rr), dtype=bool)
            if len(rr) > 1:
                dup[1:] = (rr[1:] == rr[:-1]) & (rh[1:] == rh[:-1])
            row_bad = np.zeros(t.num_rows, dtype=bool)
            row_bad[rr[dup]] = True
            return violations_from_mask(
                t, pa.array(row_bad), key_cols, path, DUPLICATE_ITEM,
                c.rule, "duplicate element in list", params)

        return check

    if isinstance(c, TsFormat):
        fmt = c.format
        params = canon_params({"format": fmt})
        def check(t: pa.Table) -> pa.Table:
            parsed = pc.strptime(t[name], format=fmt, unit="us",
                                 error_is_null=True)
            m = pc.and_(pc.is_null(parsed), pc.is_valid(t[name]))
            return violations_from_mask(
                t, m, key_cols, path, INVALID_FORMAT, c.rule,
                "timestamp does not parse", params)
        return check

    raise TypeError(f"unsupported constraint: {type(c).__name__}")


def compile_union_rule(rule: UnionRule, schema: TableSchema,
                       key_cols: Sequence[str]) -> CheckFn:
    """Discriminated union routing (reference dsl/union.go:17-52):
    per-variant constraint sets evaluated on the variant's row mask."""
    disc = rule.discriminator
    disc_path = column_path(disc)
    values = pa.array(sorted(rule.variants))
    variant_checks: dict[str, list[CheckFn]] = {}
    for value, pairs in rule.variants.items():
        checks = []
        for col_name, c in pairs:
            checks.append(_compile_constraint(
                schema.column(col_name), c, key_cols))
        variant_checks[value] = checks
    miss_params = canon_params({"discriminator": disc})
    unk_params = canon_params({"discriminator": disc,
                               "variants": sorted(rule.variants)})

    def check(t: pa.Table) -> pa.Table:
        out = []
        d = t[disc]
        out.append(violations_from_mask(
            t, pc.is_null(d), key_cols, disc_path, DISCRIMINATOR_MISSING,
            rule.rule, "discriminator value missing", miss_params))
        unknown = pc.and_(pc.invert(pc.is_in(d, value_set=values)),
                          pc.is_valid(d))
        out.append(violations_from_mask(
            t, unknown, key_cols, disc_path, DISCRIMINATOR_UNKNOWN,
            rule.rule, "discriminator value has no variant", unk_params))
        for value in sorted(variant_checks):
            mask = pc.fill_null(pc.equal(d, value), False)
            if not pc.any(mask).as_py():
                continue
            sub = t.filter(mask)
            for c in variant_checks[value]:
                v = c(sub)
                if v.num_rows:
                    out.append(v)
        out = [v for v in out if v.num_rows]
        if not out:
            return empty_violations([t.schema.field(k) for k in key_cols])
        return pa.concat_tables(out)

    return check


_NORMALIZE_KERNELS = {
    "utf8_trim": lambda a: pc.utf8_trim_whitespace(a),
    "utf8_lower": lambda a: pc.utf8_lower(a),
    "utf8_upper": lambda a: pc.utf8_upper(a),
    "nfc": lambda a: pc.utf8_normalize(a, form="NFC"),
}


def apply_normalizers(batch: pa.Table, normalizers) -> pa.Table:
    """Reference ApplyNormalize pass (pipeline.go:6-11): runs BEFORE
    constraint checks, vectorized Arrow kernels only."""
    for n in normalizers:
        if n.column not in batch.column_names:
            continue
        kern = _NORMALIZE_KERNELS[n.kind]
        idx = batch.schema.get_field_index(n.column)
        batch = batch.set_column(idx, batch.schema.field(idx),
                                 kern(batch[n.column]))
    return batch


def compile_cross_rule(rule: CrossFieldRule, key_cols: Sequence[str]) -> CheckFn:
    when = compile_expr(rule.when) if rule.when is not None else None
    expect = compile_expr(rule.expect)
    params = canon_params({"rule": rule.rule})
    path = ""  # table-scope refinement: reference Refine reports at object root
    def check(t: pa.Table) -> pa.Table:
        bad = pc.invert(pc.fill_null(expect(t), False))
        if when is not None:
            bad = pc.and_(bad, pc.fill_null(when(t), False))
        return violations_from_mask(
            t, bad, key_cols, path, rule.code, rule.rule,
            rule.message or "refinement failed", params)
    return check


# ---------------------------------------------------------------------------
# Batch normalization: coerce physical types (per-row overflow masks),
# inject defaults for absent columns, apply unknown-column policy.
# ---------------------------------------------------------------------------

# Presence bit flags — exact parity with the reference
# (/root/reference/presence.go:8-15).
PRESENCE_SEEN = 1
PRESENCE_WAS_NULL = 2
PRESENCE_DEFAULT_APPLIED = 4


def _reconcile_struct(
    arr, col: Column, n: int, with_presence: bool,
) -> tuple[pa.Array, dict[str, pa.Array], list[tuple], list[tuple]]:
    """Reconcile a wire struct column to the declared struct type,
    child by child (reference nested-object field loop,
    dsl/object_core.go:53-133, with subpath presence — the nested
    analogue of encode_preserve_union_typed_test.go's round-trip):

    - declared child present on the wire  -> CHECKED cast to declared
      child type (same round-trip contract as flat columns: rows that
      don't survive get ``overflow``/``invalid_type`` at the
      ``/col/child`` subpath and become null); presence SEEN
      (+WAS_NULL where the child value is null under a non-null
      parent);
    - declared child ABSENT from the wire struct type -> inject the
      ``StructField(path=(child,), default=...)`` constant where one is
      declared (presence DEFAULT_APPLIED) else a null child (bits 0);
    - wire children not declared are dropped (strip semantics).

    Presence keys are ``<col>/<child>`` (depth-1 subpaths).  Rows whose
    PARENT is null get bits 0 for every child (a subpath under a null
    object was never seen — presence.go semantics).

    Returns ``(new_array, presence, row_viols, schema_viols)`` where
    ``row_viols`` entries are ``(path, code, params, bad_mask,
    message)`` (the caller's ``cast_viols`` shape) and ``schema_viols``
    entries are ``(path, code, params, message)`` for children whose
    wire type cannot be cast at all."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    wire_names = ({f.name for f in arr.type}
                  if pa.types.is_struct(arr.type) else set())
    defaults = {c.path[0]: c.default for c in col.constraints
                if isinstance(c, StructField) and c.default is not None
                and len(c.path) == 1}
    # nested codecs (StructField.codec, depth-1): decode a string wire
    # child before the declared-type cast — reference
    # kubeopenapi/plan.go:18-28 int-or-string under nesting
    sub_codecs = {c.path[0]: c.codec for c in col.constraints
                  if isinstance(c, StructField) and c.codec is not None
                  and len(c.path) == 1}
    parent_valid = np.asarray(pc.is_valid(arr))
    children: list[pa.Array] = []
    presence: dict[str, pa.Array] = {}
    row_viols: list[tuple] = []
    schema_viols: list[tuple] = []
    for f in col.dtype:
        key = f"{col.name}/{f.name}"
        if f.name in wire_names:
            child = pc.struct_field(arr, f.name)
            if sub_codecs.get(f.name) == "int_or_string" and (
                    pa.types.is_string(child.type)
                    or pa.types.is_large_string(child.type)):
                parsed, bad = decode_number(child)
                if bad is not None and pc.any(bad).as_py():
                    row_viols.append((
                        column_path(col.name, f.name), INVALID_FORMAT,
                        canon_params({"codec": "int_or_string"}),
                        bad, "value does not parse as a number"))
                    parsed = pc.if_else(
                        bad, pa.nulls(n, type=parsed.type), parsed)
                child = parsed
            if child.type != f.type:
                casted, bad = _checked_cast(child, f.type)
                if casted is None:
                    schema_viols.append((
                        column_path(col.name, f.name), INVALID_TYPE,
                        canon_params({"from": str(child.type),
                                      "to": str(f.type)}),
                        "column type not coercible to declared type"))
                    child = pa.nulls(n, type=f.type)
                else:
                    if bad is not None and pc.any(bad).as_py():
                        code = (OVERFLOW if pa.types.is_integer(f.type)
                                else INVALID_TYPE)
                        row_viols.append((
                            column_path(col.name, f.name), code,
                            canon_params({"from": str(child.type),
                                          "to": str(f.type)}),
                            bad, "value does not fit declared type"))
                        casted = pc.if_else(
                            bad, pa.nulls(n, type=f.type), casted)
                    child = casted
            bits = parent_valid.astype(np.uint8) * PRESENCE_SEEN
            bits |= (np.asarray(pc.is_null(child)) & parent_valid)\
                .astype(np.uint8) * PRESENCE_WAS_NULL
        elif f.name in defaults:
            child = pa.nulls(n, type=f.type).fill_null(defaults[f.name])
            bits = parent_valid.astype(np.uint8) * PRESENCE_DEFAULT_APPLIED
        else:
            child = pa.nulls(n, type=f.type)
            bits = np.zeros(n, dtype=np.uint8)
        children.append(child.combine_chunks()
                        if isinstance(child, pa.ChunkedArray) else child)
        if with_presence:
            presence[key] = pa.array(bits)
    new = pa.StructArray.from_arrays(
        children, fields=list(col.dtype),
        mask=pa.array(~parent_valid))
    return new, presence, row_viols, schema_viols


def normalize_batch(
    batch: pa.Table, schema: TableSchema, *, with_presence: bool = False
) -> tuple[pa.Table, pa.Table]:
    """Returns (normalized batch with exactly the declared columns in
    declared order [+ passthrough extras], violations).

    - declared column missing  -> default injected (presence: default
      applied) or a schema-level `required` violation + null column;
    - physical type differs    -> checked cast; rows that cannot round-
      trip get `overflow`/`invalid_type` and become null;
    - extra columns            -> per unknown policy (`unknown_key` /
      strip / passthrough).

    ``with_presence=True`` appends a ``_presence_<col>`` uint8 column
    per declared column carrying the reference's presence bits
    (presence.go:8-15): SEEN=1 (column present in this file's schema),
    WAS_NULL=2 (value null on the wire), DEFAULT_APPLIED=4 — the
    tri-state Arrow alone cannot express (SURVEY §7.4.3).
    """
    key_cols = list(schema.key_columns)
    viols: list[pa.Table] = []
    key_fields = schema.key_fields()
    n = batch.num_rows
    declared = set(schema.column_names)
    out_cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    # cast violations are emitted AFTER all casts so their key columns
    # carry the declared (post-cast) types
    cast_viols: list[tuple] = []  # (path, code, params, bad_mask)

    presence: dict[str, pa.Array] = {}
    # column codecs: decode wire representation before type reconcile
    # (reference Decode direction, api.go:44-47); per-row parse
    # failures => invalid_format (codec/rfc3339.go:27-37).  Violations
    # are deferred to cast_viols so their key columns carry the
    # DECLARED (post-cast) types — emitting with wire-typed keys makes
    # the final concat_tables fail on mixed key schemas.
    for col in schema.columns:
        if col.codec == "rfc3339" and col.name in batch.column_names:
            arr = batch.column(col.name)
            if pa.types.is_string(arr.type) or \
                    pa.types.is_large_string(arr.type):
                parsed, bad = decode_rfc3339(arr, col.dtype)
                if pc.any(bad).as_py():
                    cast_viols.append((
                        column_path(col.name), INVALID_FORMAT,
                        canon_params({"codec": "rfc3339"}), bad,
                        "value does not parse as RFC3339"))
                idx = batch.schema.get_field_index(col.name)
                batch = batch.set_column(
                    idx, pa.field(col.name, parsed.type), parsed)
        elif col.codec == "int_or_string" and \
                col.name in batch.column_names:
            # reference kubeopenapi/plan.go:18-28: the int-or-string
            # plan accepts a number or a numeric string; string wire
            # columns decode here (non-numeric => invalid_format),
            # numeric wire columns fall through to the normal checked
            # cast
            arr = batch.column(col.name)
            if pa.types.is_string(arr.type) or \
                    pa.types.is_large_string(arr.type):
                parsed, bad = decode_number(arr)
                if pc.any(bad).as_py():
                    cast_viols.append((
                        column_path(col.name), INVALID_FORMAT,
                        canon_params({"codec": "int_or_string"}), bad,
                        "value does not parse as a number"))
                idx = batch.schema.get_field_index(col.name)
                batch = batch.set_column(
                    idx, pa.field(col.name, parsed.type), parsed)

    for col in schema.columns:
        if col.name not in batch.column_names:
            if col.default is not None:
                arr = pa.nulls(n, type=col.dtype).fill_null(col.default)
                presence[col.name] = pa.array(
                    np.full(n, PRESENCE_DEFAULT_APPLIED, dtype=np.uint8))
            else:
                arr = pa.nulls(n, type=col.dtype)
                presence[col.name] = pa.array(np.zeros(n, dtype=np.uint8))
                viols.append(schema_level_violation(
                    key_fields, column_path(col.name), REQUIRED, "schema",
                    "declared column absent from input",
                    canon_params({"column": col.name})))
            if with_presence and pa.types.is_struct(col.dtype):
                # child presence for absent struct columns: the whole
                # subtree is default-applied (column default) or never
                # seen — emitted ALWAYS so every batch, whatever its
                # wire schema, carries the same presence column set
                bits_val = (PRESENCE_DEFAULT_APPLIED
                            if col.default is not None else 0)
                for f in col.dtype:
                    presence[f"{col.name}/{f.name}"] = pa.array(
                        np.full(n, bits_val, dtype=np.uint8))
            out_cols[col.name] = arr
            continue
        arr = batch.column(col.name)
        if with_presence:
            wasnull = pc.is_null(arr).combine_chunks() \
                if isinstance(arr, pa.ChunkedArray) else pc.is_null(arr)
            pres = np.full(n, PRESENCE_SEEN, dtype=np.uint8)
            pres |= np.asarray(wasnull).astype(
                np.uint8) * PRESENCE_WAS_NULL
            presence[col.name] = pa.array(pres)
        if pa.types.is_struct(col.dtype) and pa.types.is_struct(arr.type) \
                and (arr.type != col.dtype or with_presence):
            # reconcile also when the wire type MATCHES and presence is
            # requested: child presence columns must appear on every
            # batch or batches from differently-evolved files produce
            # different schemas and concat fails downstream
            try:
                arr, sub_pres, sub_rows, sub_schema = _reconcile_struct(
                    arr, col, n, with_presence)
                presence.update(sub_pres)
                cast_viols.extend(sub_rows)
                for path, code, params, message in sub_schema:
                    viols.append(schema_level_violation(
                        key_fields, path, code, "schema", message,
                        params))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass  # fall through to the whole-column checked cast
        if arr.type != col.dtype:
            casted, bad = _checked_cast(arr, col.dtype)
            if casted is None:
                viols.append(schema_level_violation(
                    key_fields, column_path(col.name), INVALID_TYPE, "schema",
                    "column type not coercible to declared type",
                    canon_params({"from": str(arr.type), "to": str(col.dtype)})))
                casted = pa.nulls(n, type=col.dtype)
            elif bad is not None and pc.any(bad).as_py():
                # per-row overflow: value doesn't survive the round-trip
                code = OVERFLOW if pa.types.is_integer(col.dtype) else INVALID_TYPE
                cast_viols.append((
                    column_path(col.name), code,
                    canon_params({"from": str(arr.type), "to": str(col.dtype)}),
                    bad, "value does not fit declared type"))
                casted = pc.if_else(bad, pa.nulls(n, type=col.dtype), casted)
            arr = casted
        out_cols[col.name] = arr
        if with_presence and pa.types.is_struct(col.dtype):
            # schema-stability fill: any child whose presence the
            # reconcile path didn't populate (wire value wasn't a
            # struct, or reconcile fell through to the whole-column
            # cast) derives its bits from the FINAL declared-typed
            # column so every batch emits the full presence column set
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            pv = np.asarray(pc.is_valid(arr))
            for f in col.dtype:
                key = f"{col.name}/{f.name}"
                if key not in presence:
                    child = pc.struct_field(arr, f.name)
                    bits = pv.astype(np.uint8) * PRESENCE_SEEN
                    bits |= (np.asarray(pc.is_null(child)) & pv)\
                        .astype(np.uint8) * PRESENCE_WAS_NULL
                    presence[key] = pa.array(bits)

    if cast_viols and all(k in out_cols for k in key_cols):
        key_tab = pa.table({k: out_cols[k] for k in key_cols})
        for path, code, params, bad, message in cast_viols:
            viols.append(violations_from_mask(
                key_tab, bad, key_cols, path, code, "coerce",
                message, params))

    extras = [c for c in batch.column_names if c not in declared]
    if extras:
        if schema.unknown is Unknown.STRICT:
            for c in sorted(extras):  # sorted-key order, reference contract
                viols.append(schema_level_violation(
                    key_fields, column_path(c), UNKNOWN_KEY, "schema",
                    "undeclared column present", canon_params({"column": c})))
        elif schema.unknown is Unknown.PASSTHROUGH:
            for c in extras:
                out_cols[c] = batch.column(c)
        # STRIP: drop silently

    names = schema.column_names + [c for c in extras
                                   if schema.unknown is Unknown.PASSTHROUGH]
    normalized = pa.table({nm: out_cols[nm] for nm in names})
    if with_presence:
        for col in schema.columns:
            normalized = normalized.append_column(
                f"_presence_{col.name}", presence[col.name])
        # struct-subpath presence columns (_presence_<col>/<child>)
        for key in presence:
            if "/" in key:
                normalized = normalized.append_column(
                    f"_presence_{key}", presence[key])
    vtab = (pa.concat_tables(viols) if viols
            else empty_violations(key_fields))
    return normalized, vtab


# Strict RFC3339 (reference codec parity — Go time.RFC3339/RFC3339Nano
# rejects a space separator, a missing offset, and ±hhmm without the
# colon; all of those are invalid_format here too)
_RFC3339_PAT = (
    r"^(?P<date>\d{4}-\d{2}-\d{2})[Tt]"
    r"(?P<time>\d{2}:\d{2}:\d{2})"
    r"(?:\.(?P<frac>\d{1,9}))?"
    r"(?P<tz>[Zz]|[+-]\d{2}:\d{2})$"
)


def decode_rfc3339(arr, dtype: pa.DataType):
    """Fully vectorized RFC3339 parse (reference codec/rfc3339.go:
    12-70): supports fractional seconds (arrow strptime cannot) and
    'Z'/±hh[:]mm offsets.  Returns (timestamp array in ``dtype``,
    bad-row mask).  Nulls pass through as nulls (not bad)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ex = pc.extract_regex(arr, pattern=_RFC3339_PAT)
    matched = pc.is_valid(ex)
    bad = pc.and_(pc.invert(matched), pc.is_valid(arr))
    date = pc.struct_field(ex, "date")
    time_ = pc.struct_field(ex, "time")
    base_str = pc.binary_join_element_wise(
        pc.fill_null(date, "1970-01-01"), pc.fill_null(time_, "00:00:00"),
        "T")
    base = pc.strptime(base_str, format="%Y-%m-%dT%H:%M:%S", unit="us",
                       error_is_null=True)
    base_us = base.cast(pa.int64()).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    def _int_or_zero(strarr) -> np.ndarray:
        safe = pc.if_else(pc.equal(strarr, ""), "0", strarr)
        return pc.cast(pc.fill_null(safe, "0"), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)

    # fractional seconds -> microseconds (pad/truncate to 6 digits)
    frac = pc.fill_null(pc.struct_field(ex, "frac"), "")
    frac6 = pc.utf8_slice_codeunits(
        pc.binary_join_element_wise(frac, "000000", ""), 0, 6)
    micros = _int_or_zero(frac6)
    # offset: Z/empty => 0; ±hh[:]mm => signed minutes
    tz = pc.fill_null(pc.struct_field(ex, "tz"), "Z")
    tzn = pc.replace_substring(tz, ":", "")
    sign = pc.utf8_slice_codeunits(tzn, 0, 1)
    is_offset = pc.is_in(sign, value_set=pa.array(["+", "-"]))
    hh = _int_or_zero(pc.utf8_slice_codeunits(tzn, 1, 3))
    mm = _int_or_zero(pc.utf8_slice_codeunits(tzn, 3, 5))
    sgn = np.where(np.asarray(pc.equal(sign, "-")), -1, 1)
    offset_us = np.where(np.asarray(is_offset),
                         sgn * (hh * 60 + mm) * 60_000_000, 0)
    out_us = base_us + micros - offset_us  # local + frac -> UTC
    ok = pc.and_(matched, pc.is_valid(base))
    bad = pc.or_(bad, pc.and_(pc.invert(pc.is_valid(base)), matched))
    result = pc.if_else(ok, pa.array(out_us, type=pa.int64()),
                        pa.nulls(len(arr), type=pa.int64()))
    return pc.cast(result, dtype, safe=False), bad


# Kubernetes x-kubernetes-int-or-string (reference kubeopenapi/
# plan.go:18-28): goskema plans the field as NumberJSON()
# .CoerceFromString() — the value must be a JSON number or a string
# that parses as one.  JSON-number grammar (no leading +, no bare
# dot), matching what encoding/json's Number accepts.
_JSON_NUMBER_PAT = r"^-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?$"


def decode_number(arr):
    """Vectorized int-or-string decode: returns (float64 array, bad
    mask).  String values must parse as JSON numbers (reference
    NumberJSON().CoerceFromString(), kubeopenapi/plan.go:21); nulls
    pass through as nulls (not bad)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ok = pc.fill_null(
        pc.match_substring_regex(arr, pattern=_JSON_NUMBER_PAT), False)
    bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
    safe = pc.if_else(ok, arr, pa.nulls(len(arr), type=pa.string()))
    return pc.cast(safe, pa.float64(), safe=False), bad


def encode_canonical(batch: pa.Table, schema: TableSchema) -> pa.Table:
    """Re-encode codec columns to their canonical wire form (reference
    Encode direction with canonical UTC RFC3339, codec/rfc3339.go:
    126-129): timestamps render as UTC ISO-8601 with 'T' separator."""
    out = batch
    for col in schema.columns:
        if col.codec == "rfc3339" and col.name in out.column_names:
            arr = out[col.name]
            if pa.types.is_timestamp(arr.type):
                if arr.type.tz is None:
                    arr = pc.assume_timezone(arr, "UTC")
                # arrow strftime always appends .ffffff after %S; with a
                # literal Z this renders canonical UTC RFC3339 with
                # microsecond precision ("...:05.000000Z"), which
                # decode_rfc3339 round-trips exactly
                s = pc.strftime(arr, format="%Y-%m-%dT%H:%M:%SZ")
                idx = out.schema.get_field_index(col.name)
                out = out.set_column(idx, pa.field(col.name, pa.string()), s)
    return out


def encode_preserving(batch: pa.Table, schema: TableSchema) -> pa.Table:
    """Round-trip-faithful output (reference EncodePreservingObject,
    encode_preserve.go:11-28, incl. the nested round-trip of
    encode_preserve_union_typed_test.go): cells whose value exists only
    because a default was applied are restored to their wire state
    (absent => null), explicit nulls are kept; for struct columns the
    same rule applies PER CHILD via the ``_presence_<col>/<child>``
    subpath bits.  Presence columns are dropped.  Requires a batch
    produced by ``normalize_batch(with_presence=True)``."""
    n = batch.num_rows

    def _defaulted_mask(pres):
        return pc.equal(
            pc.bit_wise_and(pres, PRESENCE_DEFAULT_APPLIED),
            PRESENCE_DEFAULT_APPLIED)

    out = {}
    for col in schema.columns:
        pcol = f"_presence_{col.name}"
        arr = batch[col.name]
        if pa.types.is_struct(col.dtype):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            children = []
            for f in col.dtype:
                child = pc.struct_field(arr, f.name)
                key = f"_presence_{col.name}/{f.name}"
                if key in batch.column_names:
                    child = pc.if_else(
                        _defaulted_mask(batch[key]),
                        pa.nulls(n, type=f.type), child)
                children.append(
                    child.combine_chunks()
                    if isinstance(child, pa.ChunkedArray) else child)
            # pc.if_else has no struct kernel: a whole-column default
            # restore folds into the rebuild's null mask instead
            parent_null = np.asarray(pc.is_null(arr))
            if pcol in batch.column_names:
                parent_null = parent_null | np.asarray(
                    _defaulted_mask(batch[pcol]))
            out[col.name] = pa.StructArray.from_arrays(
                children, fields=list(col.dtype),
                mask=pa.array(parent_null))
            continue
        if pcol in batch.column_names:
            defaulted = _defaulted_mask(batch[pcol])
            arr = pc.if_else(defaulted, pa.nulls(n, type=col.dtype), arr)
        out[col.name] = arr
    return pa.table(out)


def _checked_cast(arr, target: pa.DataType):
    """Cast with per-row failure mask. Returns (casted|None, bad_mask|None)."""
    try:
        casted = pc.cast(arr, target, safe=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None, None
    # round-trip check for lossy numeric casts
    if (pa.types.is_integer(target) or pa.types.is_floating(target)) and (
            pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)):
        back = pc.cast(casted, arr.type, safe=False)
        bad = pc.and_(pc.not_equal(back, arr), pc.is_valid(arr))
        return casted, bad
    return casted, None


# ---------------------------------------------------------------------------
# The compiled plan + validator actor.
# ---------------------------------------------------------------------------

class ConstraintPlan:
    """Compiled, reusable per-batch validation plan.

    ``fail_fast``: stop at the first failing check per batch (reference
    FailFast flag, api.go:147-156; default collect-all per
    README.md:573).  ``max_issues``: cap collected violations per batch
    and append a ``truncated`` sentinel (reference maxIssues,
    internal/engine/json_dup_detect.go:53-61)."""

    def __init__(self, schema: TableSchema, *, fail_fast: bool = False,
                 max_issues: int | None = None):
        self.schema = schema
        self.fail_fast = fail_fast
        self.max_issues = max_issues
        self.key_cols = list(schema.key_columns)
        self.key_fields = schema.key_fields()
        self.checks: list[CheckFn] = []
        for col in schema.columns:
            for c in col.constraints:
                self.checks.append(_compile_constraint(col, c, self.key_cols))
        for rule in schema.rules_of(CrossFieldRule):
            self.checks.append(compile_cross_rule(rule, self.key_cols))
        for rule in schema.rules_of(UnionRule):
            self.checks.append(compile_union_rule(rule, schema, self.key_cols))
        drifts = schema.rules_of(DriftRule)
        self.profile_categorical = [d.column for d in drifts if d.kind == "psi"]
        self.profile_numeric = [d.column for d in drifts if d.kind == "ks"]
        self.wants_profile = bool(drifts)

    def validate(self, batch: pa.Table) -> pa.Table:
        """Normalize + run every compiled check; concat violation rows."""
        normalized, viols = normalize_batch(batch, self.schema)
        if self.schema.normalizers:
            normalized = apply_normalizers(normalized,
                                           self.schema.normalizers)
        out = [viols] if viols.num_rows else []
        for check in self.checks:
            v = check(normalized)
            if v.num_rows:
                out.append(v)
                if self.fail_fast:
                    break
        if not out:
            return empty_violations(self.key_fields)
        result = pa.concat_tables(out)
        if self.max_issues is not None and result.num_rows > self.max_issues:
            result = pa.concat_tables([
                result.slice(0, self.max_issues),
                schema_level_violation(
                    self.key_fields, "", TRUNCATED, "max_issues",
                    "issue collection truncated",
                    canon_params({"max_issues": self.max_issues})),
            ])
        return result

    def profile(self, batch: pa.Table):
        """Fold one batch into a fresh ColumnProfile partial (per-batch
        partial -> merged downstream; SURVEY §2.6 A6)."""
        from .state.sketches import ColumnProfile, hash_strings

        prof = ColumnProfile.empty(self.profile_categorical,
                                   self.profile_numeric)
        prof.row_count = batch.num_rows
        for c in self.profile_categorical:
            if c in batch.column_names:
                vc = pc.value_counts(batch[c])
                for entry in vc:
                    v = entry["values"].as_py()
                    if v is not None:
                        prof.value_counts[c][v] = (
                            prof.value_counts[c].get(v, 0)
                            + entry["counts"].as_py())
        for c in self.profile_numeric:
            if c == "text_len" and "text" in batch.column_names:
                vals = pc.binary_length(batch["text"])
            elif c in batch.column_names:
                vals = batch[c]
            else:
                continue
            arr = pc.cast(vals, pa.float64()).combine_chunks().to_numpy(
                zero_copy_only=False)
            finite = arr[~np.isnan(arr)]
            # bounded non-negative ints (byte lengths, turn indices):
            # pre-aggregate with bincount so the digest sorts O(distinct)
            # per batch instead of O(rows) — the profiling stage cost
            # 13x the validation itself before this
            if len(finite) and np.all(finite == np.floor(finite)) \
                    and finite.min() >= 0 and finite.max() < 1 << 20:
                counts = np.bincount(finite.astype(np.int64))
                nz = np.flatnonzero(counts)
                prof.tdigests[c].update_weighted(
                    nz.astype(np.float64), counts[nz])
            else:
                prof.tdigests[c].update(finite)
        if self.key_cols:
            k = batch[self.key_cols[0]]
            if pa.types.is_string(k.type) or pa.types.is_large_string(k.type):
                h = hash_strings(k)
            else:
                h = pc.cast(k, pa.uint64()).combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.uint64)
            prof.hll.update_hashes(h)
            prof.countmin.update_hashes(h)
        return prof


class BatchValidator:
    """Actor-pool stage: compiles the plan once per actor (__init__),
    validates per batch (__call__).  Output is a union-typed table:
    violation rows (kind='v', payload null) plus, when drift/profile
    sketches are enabled, ONE sketch-partial row per batch (kind='s',
    payload = pickled ColumnProfile) — a single pass over the input
    produces both, so 100 TB is scanned exactly once.
    """

    def __init__(self, schema: TableSchema, with_profile: bool | None = None,
                 *, fail_fast: bool = False, max_issues: int | None = None):
        self.plan = ConstraintPlan(schema, fail_fast=fail_fast,
                                   max_issues=max_issues)
        self.with_profile = (self.plan.wants_profile
                             if with_profile is None else with_profile)
        self.out_schema = combined_schema(schema)

    def __call__(self, batch: pa.Table) -> pa.Table:
        limit_arrow_threads()
        viols = self.plan.validate(batch)
        nv = viols.num_rows
        kinds = ["v"] * nv
        payloads: list[bytes | None] = [None] * nv
        tables = [viols]
        if self.with_profile and batch.num_rows:
            prof = self.plan.profile(batch)
            tables.append(empty_violations(self.plan.key_fields))
            # one sketch row: null keys, empty violation cols
            srow = schema_level_violation(self.plan.key_fields, "",
                                          AGGREGATE_VIOLATION, "", "", "")
            tables.append(srow)
            kinds.append("s")
            payloads.append(prof.to_bytes())
        combined = pa.concat_tables([t for t in tables if t.num_rows]) \
            if any(t.num_rows for t in tables) else viols
        combined = combined.append_column(
            "kind", pa.array(kinds, type=pa.string()))
        combined = combined.append_column(
            "payload", pa.array(payloads, type=pa.binary()))
        return combined.cast(self.out_schema)


def combined_schema(schema: TableSchema) -> pa.Schema:
    base = violations_schema(schema.key_fields())
    return base.append(pa.field("kind", pa.string())).append(
        pa.field("payload", pa.binary()))
