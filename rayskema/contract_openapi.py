"""OpenAPI v3 / Kubernetes CRD contract import (reference X8).

Maps an ``openAPIV3Schema`` document (or a full CRD manifest) onto a
:class:`rayskema.schema.TableSchema` so existing JSON-Schema/CRD
contracts can drive the Ray validation pipelines directly.  The
semantics mirror the reference importer:

- entry + CRD unwrapping: ``kubeopenapi/kubeopenapi.go:14-100``
  (direct ``openAPIV3Schema``, ``spec.versions[].schema`` preferring
  ``served=true``, legacy ``spec.validation``);
- local ``$defs``/``$ref`` resolution with shallow merge + cycle
  detection: ``kubeopenapi/refs.go:14-69``;
- unknown-field policy: ``x-kubernetes-preserve-unknown-fields`` =>
  PASSTHROUGH, ``additionalProperties: false`` => STRICT, otherwise
  STRIP (``kubeopenapi/kubeopenapi.go:146-163``);
- required => non-nullable column + ``required`` violations
  (``kubeopenapi/kubeopenapi.go:131-134``);
- string facets pattern/enum/min-maxLength, numeric minimum/maximum/
  exclusive*, array min-maxItems (``kubeopenapi/adapters.go``,
  ``patterns.go:14-207``);
- ``patternProperties``/``propertyNames.pattern`` on object-typed
  fields => :class:`MapKeyRegex` (multi-pattern = alternation: a key
  must match at least one, ``patterns.go:46-91``);
- ``x-kubernetes-list-type: set|map`` => :class:`ListUnique`
  (``kubeopenapi/list.go:19-136``);
- array ``contains``/``minContains``/``maxContains`` =>
  :class:`Contains` (``kubeopenapi/contains.go:15-126``);
- nested objects with ``properties`` => Arrow struct columns with
  :class:`StructField`-rebased constraints (child issue paths
  ``/field/sub``, like the reference's nested object adapters).

Unsupported constructs degrade with a warning (the reference's
``Diag`` channel), never silently.
"""

from __future__ import annotations

import copy
import json
from typing import Any

import pyarrow as pa

from .schema import (
    AnyOf, ByteBounds, Column, Contains, Enum, LenBounds, ListUnique,
    MapKeyRegex, NonNull, Range, Regex, StructField, TableSchema, Unknown,
)


class ImportDiag:
    """Non-fatal import warnings (reference Options Diag,
    ``kubeopenapi/options.go:54-64``)."""

    def __init__(self) -> None:
        self.warnings: list[str] = []

    def warn(self, msg: str) -> None:
        self.warnings.append(msg)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ImportDiag({self.warnings!r})"


def _unwrap(root: dict) -> dict:
    """Accept a direct schema, an ``{"openAPIV3Schema": ...}`` wrapper,
    or a full CRD manifest (kubeopenapi.go:60-100)."""
    if isinstance(root.get("openAPIV3Schema"), dict):
        return root["openAPIV3Schema"]
    spec = root.get("spec")
    if isinstance(spec, dict):
        first = None
        for v in spec.get("versions") or []:
            if not isinstance(v, dict):
                continue
            sch = v.get("schema")
            oas = sch.get("openAPIV3Schema") if isinstance(sch, dict) else None
            if isinstance(oas, dict):
                if v.get("served", True):
                    return oas
                first = first or oas
        if first is not None:
            return first
        val = spec.get("validation")
        if isinstance(val, dict) and isinstance(
                val.get("openAPIV3Schema"), dict):
            return val["openAPIV3Schema"]
    return root


def _resolve_refs(node: dict, defs: dict, diag: ImportDiag,
                  visited: set) -> dict:
    """Expand local ``#/$defs/*`` refs with shallow merge; cycles warn
    and stop (refs.go:33-69)."""
    if not isinstance(node, dict):
        return node
    ref = node.get("$ref")
    if isinstance(ref, str):
        if not ref.startswith("#/$defs/"):
            diag.warn(f"$ref {ref!r} not supported (local $defs only)")
            return node
        key = ref[len("#/$defs/"):]
        base = defs.get(key)
        if not isinstance(base, dict):
            diag.warn(f"$ref to unknown $defs/{key}")
            return node
        if key in visited:
            diag.warn(f"cyclic $ref at $defs/{key} (skipping expansion)")
            return node
        visited.add(key)
        merged = dict(_resolve_refs(copy.deepcopy(base), defs,
                                    diag, visited))
        visited.discard(key)
        for k, v in node.items():
            if k != "$ref":
                merged[k] = v
        node = merged
    for key in ("properties", "patternProperties"):
        pm = node.get(key)
        if isinstance(pm, dict):
            node[key] = {k: _resolve_refs(v, defs, diag, visited)
                         if isinstance(v, dict) else v
                         for k, v in pm.items()}
    for key in ("items", "contains", "additionalProperties"):
        if isinstance(node.get(key), dict):
            node[key] = _resolve_refs(node[key], defs, diag, visited)
    return node


def _int_or_string_number_schema(ps: dict, diag: ImportDiag,
                                 where: str) -> dict:
    """Rewrite an ``x-kubernetes-int-or-string`` property schema to
    its number-plan form: type number, numeric facets kept,
    STRING-FORM facets dropped WITH a warning.  The int-or-string
    plan decodes the wire value to float64 before any facet runs, so
    a ``pattern`` (e.g. the common ``^(\\d+|\\d+%)$`` of
    maxUnavailable) or a string-valued ``enum`` can never be checked
    post-decode — compiling them against the float64 column would
    crash every batch with a no-kernel Arrow error instead."""
    out = {k: v for k, v in ps.items()
           if k != "x-kubernetes-int-or-string"}
    out["type"] = "number"
    if isinstance(out.get("pattern"), str):
        diag.warn(f"{where}: int-or-string pattern facet dropped "
                  "(facets run on the decoded number, not the "
                  "string form)")
        del out["pattern"]
    enum = out.get("enum")
    if isinstance(enum, list) and any(
            not isinstance(v, (int, float)) or isinstance(v, bool)
            for v in enum):
        diag.warn(f"{where}: int-or-string enum with non-numeric "
                  "values dropped (facets run on the decoded "
                  "number)")
        del out["enum"]
    for facet in ("minLength", "maxLength"):
        if facet in out:
            diag.warn(f"{where}: int-or-string {facet} facet "
                      "dropped (string-form facet)")
            del out[facet]
    return out


def _unknown_policy(doc: dict, diag: ImportDiag) -> Unknown:
    if doc.get("x-kubernetes-preserve-unknown-fields") is True:
        return Unknown.PASSTHROUGH
    ap = doc.get("additionalProperties")
    if ap is False:
        return Unknown.STRICT
    if isinstance(ap, dict):
        diag.warn("additionalProperties as schema treated as strip")
    return Unknown.STRIP


_PRIMITIVES = {
    "string": pa.string(),
    "boolean": pa.bool_(),
    "integer": pa.int64(),
    "number": pa.float64(),
}


def _dtype_for(ps: dict, diag: ImportDiag, where: str) -> pa.DataType:
    """Arrow dtype for one property schema (adapters.go:9-44)."""
    if ps.get("x-kubernetes-int-or-string") is True:
        # top-level columns AND depth-1 struct fields get the REAL
        # int-or-string plan (float64 + "int_or_string" codec,
        # mirroring kubeopenapi/plan.go:18-28's
        # NumberJSON().CoerceFromString()) — both handled in
        # import_openapi before this function runs; only DEEPER
        # occurrences (depth ≥ 2 structs, array items, map values —
        # where neither a Column nor a depth-1 StructField codec can
        # attach) degrade to string here
        diag.warn(f"{where}: deeply-nested int-or-string kept as "
                  "string (codecs attach to columns and depth-1 "
                  "struct fields only)")
        return pa.string()
    t = ps.get("type")
    if t in _PRIMITIVES:
        if t == "string" and ps.get("format") == "date-time":
            return pa.string()   # validated via codec/format constraint
        return _PRIMITIVES[t]
    if t == "object":
        props = ps.get("properties")
        if isinstance(props, dict) and props:
            return pa.struct([
                pa.field(k, _dtype_for(v if isinstance(v, dict) else {},
                                       diag, f"{where}/{k}"))
                for k, v in sorted(props.items())])
        # map-shaped object: value type from patternProperties /
        # additionalProperties when uniform, else string
        vt = None
        pp = ps.get("patternProperties")
        if isinstance(pp, dict):
            types = {v.get("type") for v in pp.values()
                     if isinstance(v, dict)}
            if len(types) == 1:
                vt = _PRIMITIVES.get(next(iter(types)))
        if vt is None and isinstance(ps.get("additionalProperties"), dict):
            vt = _PRIMITIVES.get(ps["additionalProperties"].get("type"))
        if vt is None:
            diag.warn(f"{where}: object without properties as map<string,"
                      "string>")
            vt = pa.string()
        return pa.map_(pa.string(), vt)
    if t == "array":
        items = ps.get("items")
        if isinstance(items, dict):
            return pa.list_(_dtype_for(items, diag, f"{where}/items"))
        diag.warn(f"{where}: array without items as list<string>")
        return pa.list_(pa.string())
    if t is not None:
        diag.warn(f"{where}: unknown type {t!r} kept as string")
    else:
        diag.warn(f"{where}: untyped schema kept as string")
    return pa.string()


def _value_constraints(ps: dict, rule: str, diag: ImportDiag,
                       where: str) -> list:
    """Facet constraints for one (scalar/array) property schema."""
    out: list = []
    t = ps.get("type")
    if isinstance(ps.get("pattern"), str):
        out.append(Regex(pattern=ps["pattern"], rule=rule, search=True))
    if isinstance(ps.get("enum"), list):
        out.append(Enum(values=tuple(ps["enum"]), rule=rule))
    if t == "string":
        lo, hi = ps.get("minLength"), ps.get("maxLength")
        if lo is not None or hi is not None:
            out.append(LenBounds(min_len=lo, max_len=hi, rule=rule))
        if ps.get("maxBytes") is not None:  # extension: DoS byte cap
            out.append(ByteBounds(max_bytes=ps["maxBytes"], rule=rule))
    if t in ("integer", "number"):
        # exclusiveMinimum/Maximum: boolean (OpenAPI 3.0 — modifies
        # minimum/maximum) OR numeric (JSON Schema 2020-12 / OpenAPI
        # 3.1 — its own bound); intersection semantics when both given
        lo, hi = ps.get("minimum"), ps.get("maximum")
        exmin, exmax = ps.get("exclusiveMinimum"), ps.get("exclusiveMaximum")
        ex_lo, ex_hi = exmin is True, exmax is True
        if isinstance(exmin, (int, float)) and not isinstance(exmin, bool):
            if lo is None or exmin >= lo:
                lo, ex_lo = exmin, True
        if isinstance(exmax, (int, float)) and not isinstance(exmax, bool):
            if hi is None or exmax <= hi:
                hi, ex_hi = exmax, True
        if lo is not None or hi is not None:
            out.append(Range(min=lo, max=hi, exclusive_min=ex_lo,
                             exclusive_max=ex_hi, rule=rule))
    if t == "array":
        lo, hi = ps.get("minItems"), ps.get("maxItems")
        if lo is not None or hi is not None:
            out.append(LenBounds(min_len=lo, max_len=hi, rule=rule))
        lt = ps.get("x-kubernetes-list-type")
        if lt == "set" or ps.get("uniqueItems") is True:
            out.append(ListUnique(rule=rule + "_unique"))
        elif lt == "map":
            keys = tuple(ps.get("x-kubernetes-list-map-keys") or ())
            if keys:
                out.append(ListUnique(keys=keys, rule=rule + "_unique"))
            else:
                diag.warn(f"{where}: list-type map without list-map-keys")
        cont = ps.get("contains")
        if isinstance(cont, dict):
            pred = _contains_predicate(cont, diag, where)
            if pred is not None:
                out.append(Contains(
                    predicate=pred,
                    min_contains=ps.get("minContains",
                                        1 if "contains" in ps else None),
                    max_contains=ps.get("maxContains"), rule=rule))
    for comb, strat in (("oneOf", "error"), ("anyOf", "first_match")):
        branches = ps.get(comb)
        if isinstance(branches, list) and branches:
            # anyOf/oneOf ambiguity (reference union_ambiguity.go:12-75,
            # plan.go:195-222: oneOf => Error strategy)
            preds = []
            for b in branches:
                p = _contains_predicate(b, diag, f"{where}/{comb}") \
                    if isinstance(b, dict) else None
                if p is None:
                    p = {"op": "not_null"}   # reference fallback: accept
                preds.append(p)
            out.append(AnyOf(branches=tuple(preds), strategy=strat,
                             rule=f"{rule}_{comb.lower()}"))
    if t == "object":
        pats = []
        pn = ps.get("propertyNames")
        if isinstance(pn, dict) and isinstance(pn.get("pattern"), str):
            pats.append(pn["pattern"])
        pp = ps.get("patternProperties")
        if isinstance(pp, dict) and pp and not (
                isinstance(ps.get("properties"), dict)
                and ps["properties"]):
            # a key must match AT LEAST ONE pattern (patterns.go:46-91)
            pats.append("|".join(f"(?:{p})" for p in sorted(pp)))
        for p in pats:
            out.append(MapKeyRegex(pattern=p, rule=rule + "_keys", search=True))
    return out


def _contains_predicate(cont: dict, diag: ImportDiag, where: str):
    """contains schema -> element predicate expr (contains.go MVP:
    const/enum/type + numeric bounds)."""
    if "const" in cont:
        return {"op": "eq", "value": cont["const"]}
    if isinstance(cont.get("enum"), list):
        return {"op": "in", "values": tuple(cont["enum"])}
    if isinstance(cont.get("pattern"), str):
        return {"op": "regex_search", "pattern": cont["pattern"]}
    lo, hi = cont.get("minimum"), cont.get("maximum")
    if lo is not None and hi is not None:
        return {"op": "and", "args": ({"op": "ge", "value": lo},
                                      {"op": "le", "value": hi})}
    if lo is not None:
        return {"op": "ge", "value": lo}
    if hi is not None:
        return {"op": "le", "value": hi}
    diag.warn(f"{where}: contains schema not expressible "
              "(const/enum/pattern/bounds only); skipped")
    return None


_EMBEDDED_FIELDS = (
    # (sub-field, arrow type): reference embedded.go:50-74 requires
    # apiVersion:string, kind:string, metadata:object on every
    # embedded resource
    ("apiVersion", pa.string()),
    ("kind", pa.string()),
    ("metadata", pa.map_(pa.string(), pa.string())),
)


def _embedded_flag(ps: dict) -> str | None:
    """Where the x-kubernetes-embedded-resource flag sits: on the
    field itself or on array items (embedded.go:79-95)."""
    if ps.get("x-kubernetes-embedded-resource") is True:
        return "field"
    it = ps.get("items")
    if isinstance(it, dict) and \
            it.get("x-kubernetes-embedded-resource") is True:
        return "items"
    return None


def _inject_embedded_properties(ps: dict) -> dict:
    """Ensure an embedded-resource object schema declares
    apiVersion/kind/metadata properties so the Arrow dtype becomes a
    struct carrying them — the typed analogue of the reference's
    runtime map lookups (embedded.go:50-74)."""
    ps = dict(ps)
    props = dict(ps.get("properties") or {})
    props.setdefault("apiVersion", {"type": "string"})
    props.setdefault("kind", {"type": "string"})
    props.setdefault("metadata", {"type": "object"})
    ps["properties"] = props
    ps.setdefault("type", "object")
    return ps


def import_openapi(
    doc: dict | bytes | str, *,
    name: str = "table", key_columns: tuple = (),
    enable_embedded_checks: bool = False,
) -> tuple[TableSchema, ImportDiag]:
    """Compile an OpenAPI v3 / CRD schema into a TableSchema
    (reference ``kubeopenapi.Import``, kubeopenapi.go:14-57).

    Top-level ``properties`` become columns; ``required`` names become
    non-nullable columns with a ``required``-code NonNull constraint.
    Nested objects become struct columns whose facet constraints are
    rebased via :class:`StructField` (one level of nesting compiled;
    deeper levels contribute dtype only, with a warning)."""
    diag = ImportDiag()
    if isinstance(doc, (bytes, str)):
        try:
            # bytes go straight to json.loads, which auto-detects
            # UTF-8/16/32 per RFC 8259
            doc = json.loads(doc)
        except (json.JSONDecodeError, UnicodeDecodeError):
            # real-world CRD manifests are YAML; PyYAML is optional at
            # runtime so the JSON path never depends on it
            try:
                import yaml
            except ImportError as ex:     # pragma: no cover
                raise ValueError(
                    "import_openapi: document is not JSON and PyYAML "
                    "is unavailable for YAML parsing") from ex
            text = doc.decode("utf-8", errors="replace") \
                if isinstance(doc, bytes) else doc
            doc = yaml.safe_load(text)
    if not isinstance(doc, dict):
        raise TypeError("import_openapi: document must be a JSON/YAML "
                        "mapping")
    root = _unwrap(doc)
    defs = root.get("$defs") if isinstance(root.get("$defs"), dict) else {}
    # deep copy, NOT a json round-trip: YAML docs may carry non-JSON
    # scalars (dates) that json.dumps would reject
    root = _resolve_refs(copy.deepcopy(root), defs, diag, set())
    if root.get("type") not in (None, "object"):
        diag.warn(f"non-object root treated as object: {root.get('type')!r}")
    required = {r for r in root.get("required") or [] if isinstance(r, str)}
    unknown = _unknown_policy(root, diag)
    props = root.get("properties")
    if not isinstance(props, dict):
        props = {}
        diag.warn("schema has no properties")
    columns = []
    for pname in sorted(props):
        ps = props[pname] if isinstance(props[pname], dict) else {}
        if ps.get("x-kubernetes-int-or-string") is True:
            # the REAL int-or-string plan (kubeopenapi/plan.go:18-28):
            # float64 column + "int_or_string" codec — numeric wire
            # values cast through, numeric strings decode, any other
            # string is invalid_format; numeric facets then apply
            # (string-form facets are dropped with a warning)
            cons = list(_value_constraints(
                _int_or_string_number_schema(ps, diag, pname),
                pname, diag, pname))
            nullable = pname not in required
            if pname in required:
                cons.insert(0, NonNull(rule=f"{pname}_required"))
            columns.append(Column(pname, pa.float64(),
                                  nullable=nullable,
                                  default=ps.get("default"),
                                  constraints=tuple(cons),
                                  codec="int_or_string"))
            continue
        emb = _embedded_flag(ps) if enable_embedded_checks else None
        if emb == "field":
            ps = _inject_embedded_properties(ps)
        elif emb == "items":
            ps = {**ps, "items":
                  _inject_embedded_properties(ps["items"])}
            diag.warn(f"{pname}: embedded-resource on array items "
                      "typed (apiVersion/kind/metadata struct fields)"
                      "; per-element presence not enforced")
        # depth-1 nested int-or-string: the REAL plan under nesting
        # (kubeopenapi/plan.go:18-28) — rewrite the property to
        # "number" BEFORE _dtype_for / _value_constraints so the
        # child is declared float64 with number facets and no
        # degradation warning; the codec-only StructField appended
        # below makes plan._reconcile_struct decode a string wire
        # child (non-numeric => invalid_format at /<col>/<sub>).
        ios_subs = []
        if ps.get("type") == "object" and isinstance(
                ps.get("properties"), dict):
            newprops = {}
            for sub, sps in ps["properties"].items():
                if isinstance(sps, dict) and \
                        sps.get("x-kubernetes-int-or-string") is True:
                    ios_subs.append(sub)
                    newprops[sub] = _int_or_string_number_schema(
                        sps, diag, f"{pname}/{sub}")
                else:
                    newprops[sub] = sps
            if ios_subs:
                ps = {**ps, "properties": newprops}
        dtype = _dtype_for(ps, diag, pname)
        cons = list(_value_constraints(ps, pname, diag, pname))
        for sub in sorted(ios_subs):
            cons.append(StructField(
                path=(sub,), codec="int_or_string",
                rule=f"{pname}_{sub}_int_or_string"))
        if emb == "field":
            # presence checks for x-kubernetes-embedded-resource
            # (reference embedded.go:19-78): apiVersion/kind/metadata
            # required on the embedded object — required-code
            # violations at /field/apiVersion etc., matching the
            # reference's paths
            for sub, _t in _EMBEDDED_FIELDS:
                cons.append(StructField(
                    path=(sub,),
                    constraint=NonNull(
                        rule=f"{pname}_{sub}_embedded_required"),
                    rule=f"{pname}_{sub}_embedded_required",
                    when_parent_valid=True))
        # one level of nested-object facet constraints, path-rebased
        if ps.get("type") == "object" and isinstance(
                ps.get("properties"), dict):
            sub_required = {r for r in ps.get("required") or []
                            if isinstance(r, str)}
            for sub, sps in sorted(ps["properties"].items()):
                if not isinstance(sps, dict):
                    continue
                for c in _value_constraints(sps, f"{pname}_{sub}", diag,
                                            f"{pname}/{sub}"):
                    cons.append(StructField(path=(sub,), constraint=c,
                                            rule=c.rule))
                if sub in sub_required:
                    # OpenAPI nested `required` applies only WHEN the
                    # parent object is present: an absent optional
                    # parent must not fire its children's required
                    # checks (same gate the embedded-resource presence
                    # constraints use above)
                    cons.append(StructField(
                        path=(sub,),
                        constraint=NonNull(rule=f"{pname}_{sub}_required"),
                        rule=f"{pname}_{sub}_required",
                        when_parent_valid=True))
        nullable = pname not in required
        if pname in required:
            cons.insert(0, NonNull(rule=f"{pname}_required"))
        codec = None
        if ps.get("type") == "string" and ps.get("format") == "date-time":
            # RFC3339 string on the wire, timestamp declared — decoded
            # by the rfc3339 codec during normalize (invalid_format on
            # parse failure), like the reference codec/rfc3339.go
            codec = "rfc3339"
            dtype = pa.timestamp("us")
        columns.append(Column(pname, dtype, nullable=nullable,
                              default=ps.get("default"),
                              constraints=tuple(cons), codec=codec))
    schema = TableSchema(
        columns=tuple(columns),
        key_columns=tuple(k for k in key_columns
                          if k in {c.name for c in columns}),
        unknown=unknown,
        name=name,
    )
    return schema, diag
