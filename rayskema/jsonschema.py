"""Standard JSON Schema export from a TableSchema.

Reference analogue: per-node ``JSONSchema()`` export
(``dsl/object_core.go:289-320``, ``jsonschema/schema.go:5-23``) with the
unknown-policy mapping from the reference README (Strict =>
``additionalProperties: false``; Strip/Passthrough => ``true``).  The
output is the interop format: any JSON-Schema/OpenAPI consumer can read
it, and :func:`rayskema.contract_openapi.import_openapi` re-imports it
(export -> import round-trips the supported constraint surface).
"""

from __future__ import annotations

import pyarrow as pa

from .schema import (
    AnyOf, ByteBounds, Column, Contains, Enum, LenBounds, ListUnique,
    MapKeyRegex, NonNull, Range, Regex, StructField, TableSchema, TsFormat,
    Unknown,
)


def _dtype_schema(t: pa.DataType) -> dict:
    if pa.types.is_boolean(t):
        return {"type": "boolean"}
    if pa.types.is_integer(t):
        return {"type": "integer"}
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return {"type": "number"}
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return {"type": "string", "format": "date-time"}
    if pa.types.is_struct(t):
        return {"type": "object",
                "properties": {t.field(i).name: _dtype_schema(t.field(i).type)
                               for i in range(t.num_fields)}}
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return {"type": "array", "items": _dtype_schema(t.value_type)}
    if pa.types.is_map(t):
        return {"type": "object",
                "additionalProperties": _dtype_schema(t.item_type)}
    return {"type": "string"}


def _pred_to_contains(pred: dict) -> dict:
    op = pred.get("op")
    if op == "eq":
        return {"const": pred.get("value")}
    if op == "in":
        return {"enum": list(pred.get("values", ()))}
    if op in ("regex", "regex_search"):
        return {"pattern": pred.get("pattern")}
    if op == "ge":
        return {"minimum": pred.get("value")}
    if op == "le":
        return {"maximum": pred.get("value")}
    if op == "and":
        out: dict = {}
        for a in pred.get("args", ()):  # e.g. ge+le bounds
            out.update(_pred_to_contains(dict(a)))
        return out
    return {}


def _apply_constraint(node: dict, c, is_list: bool) -> None:
    if isinstance(c, Regex):
        # a full-match constraint must stay full-match under JSON
        # Schema's search semantics => export with explicit anchors
        node["pattern"] = c.pattern if c.search else f"^(?:{c.pattern})$"
    elif isinstance(c, Enum):
        node["enum"] = list(c.values)
    elif isinstance(c, LenBounds):
        lo_k, hi_k = ("minItems", "maxItems") if is_list else \
            ("minLength", "maxLength")
        if c.min_len is not None:
            node[lo_k] = c.min_len
        if c.max_len is not None:
            node[hi_k] = c.max_len
    elif isinstance(c, ByteBounds):
        if c.max_bytes is not None:
            node["maxBytes"] = c.max_bytes      # extension (DoS cap)
        if c.min_bytes is not None:
            node["minBytes"] = c.min_bytes
    elif isinstance(c, Range):
        if c.min is not None:
            node["minimum"] = c.min
            if c.exclusive_min:
                node["exclusiveMinimum"] = True
        if c.max is not None:
            node["maximum"] = c.max
            if c.exclusive_max:
                node["exclusiveMaximum"] = True
    elif isinstance(c, TsFormat):
        node["format"] = "date-time"
    elif isinstance(c, Contains):
        cont = _pred_to_contains(dict(c.predicate))
        if cont:
            node["contains"] = cont
            if c.min_contains is not None:
                node["minContains"] = c.min_contains
            if c.max_contains is not None:
                node["maxContains"] = c.max_contains
    elif isinstance(c, ListUnique):
        if c.keys:
            node["x-kubernetes-list-type"] = "map"
            node["x-kubernetes-list-map-keys"] = list(c.keys)
        else:
            node["x-kubernetes-list-type"] = "set"
            node["uniqueItems"] = True
    elif isinstance(c, AnyOf):
        key = "oneOf" if c.strategy == "error" else "anyOf"
        node[key] = [_pred_to_contains(dict(b)) for b in c.branches]
    elif isinstance(c, MapKeyRegex):
        node["propertyNames"] = {
            "pattern": c.pattern if c.search else f"^(?:{c.pattern})$"}
    # NonNull is expressed via the parent's required list


def _column_schema(col: Column) -> dict:
    node = _dtype_schema(col.dtype)
    if col.codec == "rfc3339":
        node = {"type": "string", "format": "date-time"}
    if col.default is not None:
        node["default"] = col.default
    is_list = node.get("type") == "array"
    for c in col.constraints:
        if isinstance(c, StructField):
            # rebase onto the nested property node (one level per part)
            sub = node
            ok = True
            for part in c.path:
                props = sub.get("properties")
                if not isinstance(props, dict) or part not in props:
                    ok = False
                    break
                sub = props[part]
            if not ok:
                continue
            if isinstance(c.constraint, NonNull):
                parent = node
                for part in c.path[:-1]:
                    parent = parent["properties"][part]
                parent.setdefault("required", []).append(c.path[-1])
                parent["required"] = sorted(set(parent["required"]))
            elif c.constraint is not None:
                _apply_constraint(sub, c.constraint,
                                  sub.get("type") == "array")
        else:
            _apply_constraint(node, c, is_list)
    return node


def export_json_schema(schema: TableSchema, *, wrap: bool = False) -> dict:
    """TableSchema -> JSON Schema object node.  ``wrap=True`` nests the
    result under ``openAPIV3Schema`` (the CRD document shape the
    importer unwraps)."""
    required = sorted(c.name for c in schema.columns if not c.nullable)
    doc: dict = {
        "type": "object",
        "properties": {c.name: _column_schema(c) for c in schema.columns},
        "additionalProperties": schema.unknown is not Unknown.STRICT,
    }
    if required:
        doc["required"] = required
    if schema.unknown is Unknown.PASSTHROUGH:
        doc["x-kubernetes-preserve-unknown-fields"] = True
    return {"openAPIV3Schema": doc} if wrap else doc
