"""Schema contract export/import: TableSchema <-> JSON document.

Reference analogue: JSON Schema export per schema node
(``dsl/object_core.go:289-320``, ``jsonschema/schema.go:5-23``) and the
OpenAPI/CRD importer seam (``kubeopenapi/kubeopenapi.go:14-57``).  The
contract is the distribution format for a table's validation rules:
export it once, ship it, rebuild the identical TableSchema (same
``schema_hash``) anywhere.

Unknown-policy mapping follows the reference (README.md:171-176):
Strict => additionalColumns: false; Strip/Passthrough => true.
"""

from __future__ import annotations

import json
from dataclasses import asdict

import pyarrow as pa

from .schema import (
    AnyOf, ByteBounds, Column, Contains, ContiguousRule, CrossFieldRule,
    DriftRule, Enum, GroupCountRule, LenBounds, ListUnique, MapKeyRegex,
    MonotonicRule, NonNull, Normalizer, Range, RefIntegrityRule, Regex,
    StructField, TableSchema, TsFormat, UnionRule,
    UniqueRule, Unknown,
)

_CONSTRAINTS = {c.__name__: c for c in
                (NonNull, Regex, Enum, LenBounds, ByteBounds, Range,
                 TsFormat, MapKeyRegex, Contains, ListUnique, AnyOf)}
_RULES = {c.__name__: c for c in
          (ContiguousRule, CrossFieldRule, DriftRule, GroupCountRule,
           MonotonicRule, RefIntegrityRule, UniqueRule, UnionRule)}

_TYPES = {
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "bool": pa.bool_(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(),
}


def _dtype_name(t: pa.DataType):
    """Serialize a dtype: primitives by name, struct/list recursively."""
    if pa.types.is_struct(t):
        return {"struct": [{"name": t.field(i).name,
                            "dtype": _dtype_name(t.field(i).type)}
                           for i in range(t.num_fields)]}
    if pa.types.is_fixed_size_list(t):
        return {"fixed_size_list": _dtype_name(t.value_type),
                "size": t.list_size}
    if pa.types.is_list(t):
        return {"list": _dtype_name(t.value_type)}
    if pa.types.is_map(t):
        return {"map_key": _dtype_name(t.key_type),
                "map_value": _dtype_name(t.item_type)}
    s = str(t)
    if s not in _TYPES:
        raise ValueError(f"dtype not representable in contract: {s}")
    return s


def _dtype_from(d) -> pa.DataType:
    if isinstance(d, str):
        return _TYPES[d]
    if "struct" in d:
        return pa.struct([(f["name"], _dtype_from(f["dtype"]))
                          for f in d["struct"]])
    if "fixed_size_list" in d:
        return pa.list_(_dtype_from(d["fixed_size_list"]), d["size"])
    if "list" in d:
        return pa.list_(_dtype_from(d["list"]))
    if "map_key" in d:
        return pa.map_(_dtype_from(d["map_key"]),
                       _dtype_from(d["map_value"]))
    raise ValueError(f"bad dtype doc: {d!r}")


def export_contract(schema: TableSchema) -> dict:
    doc = {
        "contract_version": 1,
        "name": schema.name,
        "key_columns": list(schema.key_columns),
        "additionalColumns": schema.unknown is not Unknown.STRICT,
        "unknown": schema.unknown.value,
        "columns": [],
        "rules": [],
        "normalizers": [asdict(n) for n in schema.normalizers],
        "schema_hash": schema.schema_hash(),
    }
    for c in schema.columns:
        doc["columns"].append({
            "name": c.name,
            "dtype": _dtype_name(c.dtype),
            "nullable": c.nullable,
            "default": c.default,
            "codec": c.codec,
            "constraints": [_constraint_dict(k) for k in c.constraints],
        })
    for r in schema.rules:
        # "_type" is the discriminator; it must not collide with rule
        # fields (DriftRule has its own "kind" field)
        doc["rules"].append({"_type": type(r).__name__, **_rule_dict(r)})
    return doc


def _constraint_dict(k) -> dict:
    if isinstance(k, StructField):
        return {"_type": "StructField", "rule": k.rule,
                "path": list(k.path),
                "constraint": _constraint_dict(k.constraint)}
    return {"_type": type(k).__name__, **asdict(k)}


def _constraint_from(d: dict):
    d = dict(d)
    kind = d.pop("_type")
    if kind == "StructField":
        return StructField(rule=d.get("rule", ""),
                           path=tuple(d["path"]),
                           constraint=_constraint_from(d["constraint"]))
    cls = _CONSTRAINTS[kind]
    if "values" in d:
        d["values"] = tuple(d["values"])
    if "keys" in d:
        d["keys"] = tuple(d["keys"])
    if "branches" in d:
        d["branches"] = tuple(d["branches"])
    return cls(**d)


def _rule_dict(r) -> dict:
    if isinstance(r, UnionRule):
        return {
            "discriminator": r.discriminator,
            "rule": r.rule,
            "variants": {
                value: [{"column": col, "_type": type(c).__name__,
                         **asdict(c)} for col, c in pairs]
                for value, pairs in r.variants.items()
            },
        }
    d = asdict(r)
    for k, v in list(d.items()):
        if isinstance(v, tuple):
            d[k] = list(v)
    return d


def import_contract(doc: dict) -> TableSchema:
    if doc.get("contract_version") != 1:
        raise ValueError("unsupported contract_version")
    cols = []
    for c in doc["columns"]:
        constraints = [_constraint_from(k) for k in c.get("constraints", [])]
        cols.append(Column(c["name"], _dtype_from(c["dtype"]),
                           nullable=c.get("nullable", True),
                           default=c.get("default"),
                           constraints=tuple(constraints),
                           codec=c.get("codec")))
    rules = []
    for r in doc.get("rules", []):
        r = dict(r)
        cls = _RULES[r.pop("_type")]
        if cls is UnionRule:
            variants = {}
            for value, pairs in r["variants"].items():
                out = []
                for p in pairs:
                    p = dict(p)
                    col = p.pop("column")
                    ccls = _CONSTRAINTS[p.pop("_type")]
                    if "values" in p:
                        p["values"] = tuple(p["values"])
                    out.append((col, ccls(**p)))
                variants[value] = tuple(out)
            r["variants"] = variants
        for key in ("columns", "group_by"):
            if key in r and isinstance(r[key], list):
                r[key] = tuple(r[key])
        rules.append(cls(**r))
    return TableSchema(
        columns=tuple(cols),
        key_columns=tuple(doc.get("key_columns", ())),
        unknown=Unknown(doc.get("unknown", "strict")),
        rules=tuple(rules),
        name=doc.get("name", "table"),
        normalizers=tuple(Normalizer(**n)
                          for n in doc.get("normalizers", [])),
    )


def save_contract(schema: TableSchema, path: str) -> None:
    with open(path, "w") as f:
        json.dump(export_contract(schema), f, indent=2, sort_keys=True)


def load_contract(path: str) -> TableSchema:
    with open(path) as f:
        return import_contract(json.load(f))
