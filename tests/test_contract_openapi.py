"""OpenAPI/CRD contract import (reference X8, kubeopenapi package) and
the list-column Contains/ListUnique constraints (M16)."""

import json
import os

import pyarrow as pa
import pytest

from rayskema.contract import export_contract, import_contract
from rayskema.contract_openapi import import_openapi
from rayskema.plan import ConstraintPlan
from rayskema.schema import (
    Column, Contains, ListUnique, TableSchema, Unknown,
)

_REF = "/root/reference/kubeopenapi/testdata"


def _codes(v: pa.Table) -> set:
    return set(zip(v["path"].to_pylist(), v["code"].to_pylist()))


def test_import_minimal_object():
    s, diag = import_openapi({
        "openAPIV3Schema": {
            "type": "object", "additionalProperties": False,
            "required": ["id"],
            "properties": {
                "id": {"type": "integer", "minimum": 0},
                "name": {"type": "string", "pattern": "^[a-z]+$",
                         "minLength": 2, "maxLength": 8},
                "kind": {"type": "string", "enum": ["a", "b"]},
            },
        }
    }, name="t", key_columns=("id",))
    assert s.unknown is Unknown.STRICT
    assert not diag.warnings
    id_col = s.column("id")
    assert not id_col.nullable
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({
        "id": pa.array([1, -5, None], type=pa.int64()),
        "kind": pa.array(["a", "z", "b"]),
        "name": pa.array(["ok", "BAD", "x"]),
    }))
    got = _codes(v)
    assert ("/id", "too_small") in got
    assert ("/id", "required") in got
    assert ("/kind", "invalid_enum") in got
    assert ("/name", "pattern") in got
    assert ("/name", "too_short") in got


def test_import_yaml_crd_manifest():
    # real CRDs ship as YAML manifests; the importer must sniff and
    # parse them identically to the JSON form
    yaml_doc = """
apiVersion: apiextensions.k8s.io/v1
kind: CustomResourceDefinition
spec:
  group: example.io
  versions:
    - name: v1
      served: true
      schema:
        openAPIV3Schema:
          type: object
          additionalProperties: false
          required: [id]
          properties:
            id:
              type: integer
              minimum: 0
            name:
              type: string
              pattern: "^[a-z]+$"
"""
    s, diag = import_openapi(yaml_doc, name="t", key_columns=("id",))
    assert s.unknown is Unknown.STRICT
    assert not diag.warnings
    assert not s.column("id").nullable
    json_equiv, _ = import_openapi(json.dumps({
        "openAPIV3Schema": {
            "type": "object", "additionalProperties": False,
            "required": ["id"],
            "properties": {
                "id": {"type": "integer", "minimum": 0},
                "name": {"type": "string", "pattern": "^[a-z]+$"},
            }}}), name="t", key_columns=("id",))
    assert export_contract(s) == export_contract(json_equiv)


def test_import_yaml_with_date_scalar():
    # regression: YAML parses unquoted dates to datetime.date; the
    # importer must not crash on them (the deep copy used to be a JSON
    # round-trip, which rejects date objects)
    s, diag = import_openapi("""
openAPIV3Schema:
  type: object
  properties:
    id: {type: integer}
    created:
      type: string
      example: 2024-01-01
""", name="t", key_columns=("id",))
    assert {c.name for c in s.columns} == {"id", "created"}


def test_import_utf16_json_bytes():
    doc = json.dumps({"openAPIV3Schema": {
        "type": "object",
        "properties": {"id": {"type": "integer"}}}}).encode("utf-16")
    s, _ = import_openapi(doc, name="t", key_columns=("id",))
    assert [c.name for c in s.columns] == ["id"]


def test_pattern_is_search_semantics():
    # JSON Schema pattern = unanchored search (Go MatchString)
    s, _ = import_openapi({
        "type": "object",
        "properties": {"v": {"type": "string", "pattern": "mid"}},
    })
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"v": pa.array(["xx mid yy", "nope"])}))
    assert v.num_rows == 1


def test_ref_resolution_and_cycle():
    s, diag = import_openapi({
        "type": "object",
        "$defs": {
            "port": {"type": "integer", "minimum": 1, "maximum": 65535},
            "loop": {"$ref": "#/$defs/loop"},
        },
        "properties": {
            "port": {"$ref": "#/$defs/port"},
            "bad": {"$ref": "#/$defs/missing"},
            "cyc": {"$ref": "#/$defs/loop"},
        },
    })
    assert s.column("port").dtype == pa.int64()
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({
        "bad": pa.array(["x", "y"]),
        "cyc": pa.array(["x", "y"]),
        "port": pa.array([80, 99999], type=pa.int64())}))
    assert ("/port", "too_big") in _codes(v)
    assert any("unknown $defs" in w for w in diag.warnings)
    assert any("cyclic" in w for w in diag.warnings)


def test_contains_and_min_max():
    s, _ = import_openapi({
        "type": "object",
        "properties": {
            "tags": {"type": "array", "items": {"type": "string"},
                     "contains": {"const": "x"},
                     "minContains": 1, "maxContains": 2},
        },
    })
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"tags": pa.array(
        [["x"], ["y"], ["x", "x", "x"], None],
        type=pa.list_(pa.string()))}))
    got = _codes(v)
    assert ("/tags", "too_short") in got
    assert ("/tags", "too_long") in got
    assert v.num_rows == 2   # null list is skipped


def test_list_unique_numeric_and_struct_keys():
    s = TableSchema(columns=(
        Column("ports", pa.list_(pa.int64()),
               constraints=(ListUnique(rule="ports_set"),)),
    ), unknown=Unknown.STRIP)
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"ports": pa.array(
        [[80, 443], [80, 80], []], type=pa.list_(pa.int64()))}))
    assert v.num_rows == 1 and v["code"][0].as_py() == "duplicate_item"


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference corpus absent")
def test_reference_alertmanager_alias_list_map():
    # receivers: x-kubernetes-list-type map keyed by name
    with open(os.path.join(_REF, "alertmanager_alias_schema.json")) as f:
        doc = json.load(f)
    s, diag = import_openapi(doc, name="alertmanager")
    col = s.column("receivers")
    assert any(isinstance(c, ListUnique) and c.keys == ("name",)
               for c in col.constraints)
    plan = ConstraintPlan(s)
    elem = pa.struct([pa.field("name", pa.string())])
    v = plan.validate(pa.table({"receivers": pa.array(
        [[{"name": "a"}, {"name": "b"}],
         [{"name": "a"}, {"name": "a"}]], type=pa.list_(elem))}))
    assert v.num_rows == 1
    assert v["code"][0].as_py() == "duplicate_item"


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference corpus absent")
def test_reference_servicemonitor_crd_unwrap():
    with open(os.path.join(_REF, "servicemonitor_crd_wrapped.json")) as f:
        doc = json.load(f)
    s, diag = import_openapi(doc, name="servicemonitor")
    assert s.unknown is Unknown.STRICT
    assert {c.name for c in s.columns} == {"labels", "targets",
                                           "sampleLimit"}
    # int-or-string imports as the real union plan (float64 +
    # "int_or_string" codec; kubeopenapi/plan.go:18-28), no warning
    assert s.column("sampleLimit").dtype == pa.float64()
    assert s.column("sampleLimit").codec == "int_or_string"
    assert not any("int-or-string" in w for w in diag.warnings)
    targets = s.column("targets")
    assert any(isinstance(c, ListUnique) for c in targets.constraints)
    from rayskema.plan import normalize_batch
    batch = pa.table({
        "labels": pa.array([[("k", "v")]],
                           type=pa.map_(pa.string(), pa.string())),
        "sampleLimit": pa.array(["10"]),
        "targets": pa.array([["t1", "t1"]], type=pa.list_(pa.string())),
    })
    norm, nviols = normalize_batch(batch, s)
    assert nviols.num_rows == 0
    assert norm["sampleLimit"].to_pylist() == [10.0]
    v = ConstraintPlan(s).validate(norm)
    assert ("/targets", "duplicate_item") in _codes(v)


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference corpus absent")
def test_reference_podmonitor_propertynames():
    with open(os.path.join(_REF, "podmonitor_propertynames_schema.json")) as f:
        doc = json.load(f)
    s, _ = import_openapi(doc, name="podmonitor")
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"labels": pa.array(
        [[("pm-ok", "1")], [("bad", "1")], None],
        type=pa.map_(pa.string(), pa.string()))}))
    got = _codes(v)
    assert ("/labels", "pattern") in got
    assert ("/labels", "required") in got   # labels is required


def test_contract_roundtrip_with_list_constraints():
    s = TableSchema(columns=(
        Column("doc_id", pa.int64(), nullable=False),
        Column("tags", pa.list_(pa.string()), constraints=(
            Contains(predicate={"op": "eq", "value": "x"},
                     min_contains=1, rule="has_x"),
            ListUnique(keys=("name",), rule="uniq"),
        )),
    ), key_columns=("doc_id",), unknown=Unknown.STRIP, name="t")
    s2 = import_contract(json.loads(json.dumps(export_contract(s))))
    assert s2.schema_hash() == s.schema_hash()
    tags = s2.column("tags")
    assert any(isinstance(c, Contains) for c in tags.constraints)
    assert any(isinstance(c, ListUnique) and c.keys == ("name",)
               for c in tags.constraints)


def test_anyof_oneof_ambiguity_strategies():
    from rayskema.schema import AnyOf
    # oneOf (error strategy): overlapping branches => union_ambiguous,
    # no branch => no_match (reference union_ambiguity.go:46-75)
    s, diag = import_openapi({
        "type": "object",
        "properties": {
            "v": {"type": "string",
                  "oneOf": [{"pattern": "^a"}, {"pattern": "b$"}]},
            "w": {"type": "string",
                  "anyOf": [{"const": "x"}, {"const": "y"}]},
        },
    })
    assert any(isinstance(c, AnyOf) and c.strategy == "error"
               for c in s.column("v").constraints)
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({
        "v": pa.array(["a--b", "a--", "--b", "zz", None]),
        "w": pa.array(["x", "z", "y", "x", "x"]),
    }))
    got = _codes(v)
    assert ("/v", "union_ambiguous") in got
    assert ("/v", "no_match") in got
    assert ("/w", "no_match") in got
    # exactly: v ambiguous x1, v no_match x1, w no_match x1
    assert v.num_rows == 3


def test_anyof_contract_and_jsonschema_roundtrip():
    import json as _json

    from rayskema.jsonschema import export_json_schema
    from rayskema.schema import AnyOf
    s = TableSchema(columns=(
        Column("v", pa.string(), constraints=(
            AnyOf(branches=({"op": "eq", "value": "a"},
                            {"op": "regex_search", "pattern": "b"}),
                  strategy="error", rule="v_oneof"),)),
    ), unknown=Unknown.STRIP, name="u")
    s2 = import_contract(_json.loads(_json.dumps(export_contract(s))))
    assert s2.schema_hash() == s.schema_hash()
    doc = export_json_schema(s)
    assert doc["properties"]["v"]["oneOf"] == [
        {"const": "a"}, {"pattern": "b"}]


def test_int_or_string_real_plan():
    """x-kubernetes-int-or-string imports as the REAL union plan
    (reference kubeopenapi/plan.go:18-28: NumberJSON()
    .CoerceFromString()): float64 column + "int_or_string" codec —
    numeric strings decode, non-numeric strings are invalid_format,
    and numeric facets apply to the decoded value."""
    from rayskema.plan import normalize_batch

    s, diag = import_openapi({
        "type": "object",
        "required": ["port"],
        "properties": {
            "port": {"x-kubernetes-int-or-string": True,
                     "minimum": 1, "maximum": 65535},
        },
    }, name="t")
    col = s.column("port")
    assert col.dtype == pa.float64()
    assert col.codec == "int_or_string"
    assert not col.nullable
    assert not any("int-or-string" in w for w in diag.warnings)

    # string wire column: numeric strings decode, junk is flagged
    batch = pa.table({"port": pa.array(["8080", "abc", None, "1e2"])})
    norm, viols = normalize_batch(batch, s)
    assert norm["port"].type == pa.float64()
    assert norm["port"].to_pylist() == [8080.0, None, None, 100.0]
    codes = {(r["path"], r["code"]) for r in viols.to_pylist()}
    assert ("/port", "invalid_format") in codes

    # numeric wire column: checked cast through, Range facet applies
    batch2 = pa.table({"port": pa.array([80, 70000], type=pa.int64())})
    norm2, v2 = normalize_batch(batch2, s)
    assert v2.num_rows == 0
    pv = ConstraintPlan(s).validate(norm2)
    got = _codes(pv)
    assert ("/port", "too_big") in got
    assert not any(c == "too_small" for _, c in got)


def test_embedded_resource_presence_object():
    """x-kubernetes-embedded-resource presence checks (reference
    kubeopenapi/embedded.go:19-78 and
    kubeopenapi_embedded_test.go object case): apiVersion/kind/
    metadata required on the embedded object; a null outer object is
    NOT an embedded violation (outer required owns that)."""
    s, diag = import_openapi({
        "type": "object",
        "properties": {
            "res": {"type": "object",
                    "x-kubernetes-embedded-resource": True},
        },
        "additionalProperties": False,
    }, name="t", enable_embedded_checks=True)
    dt = s.column("res").dtype
    assert pa.types.is_struct(dt)
    assert {f.name for f in dt} == {"apiVersion", "kind", "metadata"}

    good = {"apiVersion": "v1", "kind": "Pod", "metadata": []}
    bad = {"apiVersion": None, "kind": "Pod", "metadata": []}
    batch = pa.table({"res": pa.array(
        [good, bad, None], type=dt)})
    v = ConstraintPlan(s).validate(batch)
    got = _codes(v)
    assert ("/res/apiVersion", "required") in got
    # exactly one violation: the null outer object contributes none
    assert v.num_rows == 1


def test_embedded_resource_presence_array_items():
    """Array-of-embedded-resources (reference embedded.go:79-95,
    kubeopenapi_embedded_test.go array case): items get the typed
    apiVersion/kind/metadata struct fields; per-element presence is
    typed-only, surfaced as a diag warning."""
    s, diag = import_openapi({
        "type": "object",
        "properties": {
            "items": {"type": "array",
                      "items": {"type": "object",
                                "x-kubernetes-embedded-resource": True}},
        },
        "additionalProperties": False,
    }, name="t", enable_embedded_checks=True)
    dt = s.column("items").dtype
    assert pa.types.is_list(dt)
    assert pa.types.is_struct(dt.value_type)
    assert {f.name for f in dt.value_type} >= {"apiVersion", "kind",
                                               "metadata"}
    assert any("per-element presence" in w for w in diag.warnings)


def test_embedded_checks_disabled_by_default():
    """Without enable_embedded_checks the flag is inert (reference
    Options.EnableEmbeddedChecks default false)."""
    s, _ = import_openapi({
        "type": "object",
        "properties": {
            "res": {"type": "object",
                    "x-kubernetes-embedded-resource": True},
        },
    }, name="t")
    assert not any(
        getattr(c, "when_parent_valid", False)
        for c in s.column("res").constraints)


def test_nested_required_gated_on_parent_presence():
    # OpenAPI nested `required` applies only when the parent object is
    # present: omitting an OPTIONAL parent section must not fire its
    # children's required rules (review finding: the webhook denied
    # legal objects omitting optional spec sections)
    import pyarrow as pa
    from rayskema.plan import ConstraintPlan
    doc = {"openAPIV3Schema": {
        "type": "object",
        "properties": {
            "spec": {"type": "object",
                     "properties": {"replicas": {"type": "integer"}},
                     "required": ["replicas"]}}}}
    s, diag = import_openapi(doc, name="t")
    plan = ConstraintPlan(s)
    spec_t = s.column("spec").dtype
    tab = pa.table({"spec": pa.array(
        [None, {"replicas": None}, {"replicas": 3}], type=spec_t)})
    v = plan.validate(tab)
    codes = list(zip(v["path"].to_pylist(), v["code"].to_pylist()))
    # row 0 (absent parent): NO violation; row 1 (present, child null):
    # required fires
    assert ("/spec/replicas", "required") in codes
    assert len([c for c in codes if c[1] == "required"]) == 1


def test_nested_int_or_string_real_plan():
    """x-kubernetes-int-or-string on a NESTED struct field gets the
    same real union plan as a top-level column (reference
    kubeopenapi/plan.go:18-28 under nesting): the child is declared
    float64 with a depth-1 StructField codec, numeric AND
    numeric-string wire children both validate, non-numeric strings
    are invalid_format at /<col>/<sub>, numeric facets apply to the
    decoded value — and no degradation warning is emitted."""
    from rayskema.plan import normalize_batch

    s, diag = import_openapi({
        "type": "object",
        "properties": {
            "spec": {"type": "object",
                     "required": ["port"],
                     "properties": {
                         "port": {"x-kubernetes-int-or-string": True,
                                  "minimum": 1, "maximum": 65535},
                         "name": {"type": "string"},
                     }},
        },
    }, name="t")
    col = s.column("spec")
    assert col.dtype.field("port").type == pa.float64()
    from rayskema.schema import StructField
    assert any(isinstance(c, StructField) and c.path == ("port",)
               and c.codec == "int_or_string"
               for c in col.constraints)
    assert not any("int-or-string" in w for w in diag.warnings)

    # string wire child: numeric strings decode, junk flagged at the
    # subpath; numeric wire child falls through the normal cast
    wire = pa.table({"spec": pa.array(
        [{"port": "8080", "name": "a"},
         {"port": "abc", "name": "b"},
         {"port": "1e2", "name": "c"},
         None],
        type=pa.struct([pa.field("port", pa.string()),
                        pa.field("name", pa.string())]))})
    norm, viols = normalize_batch(wire, s)
    assert norm["spec"].type.field("port").type == pa.float64()
    ports = [r["port"] if r is not None else None
             for r in norm["spec"].to_pylist()]
    assert ports == [8080.0, None, 100.0, None]
    codes = {(r["path"], r["code"]) for r in viols.to_pylist()}
    assert ("/spec/port", "invalid_format") in codes

    # numeric wire child: no decode needed, facets apply post-cast
    wire2 = pa.table({"spec": pa.array(
        [{"port": 443, "name": "a"}, {"port": 99999, "name": "b"},
         {"port": None, "name": "c"}],
        type=pa.struct([pa.field("port", pa.int64()),
                        pa.field("name", pa.string())]))})
    norm2, viols2 = normalize_batch(wire2, s)
    assert [r["port"] for r in norm2["spec"].to_pylist()] == \
        [443.0, 99999.0, None]
    v = ConstraintPlan(s).validate(norm2)
    got = _codes(v)
    assert ("/spec/port", "too_big") in got       # 99999 > 65535
    assert ("/spec/port", "required") in got      # null under parent


def test_int_or_string_string_facets_dropped():
    """int-or-string with a string-form ``pattern`` (the common k8s
    maxUnavailable percent regex) must not compile a Regex against
    the float64 column — the facet is dropped with a warning at both
    the top level and nested depth-1, and validation runs."""
    from rayskema.plan import normalize_batch

    s, diag = import_openapi({
        "type": "object",
        "properties": {
            "maxUnavailable": {"x-kubernetes-int-or-string": True,
                               "pattern": r"^(\d+|\d+%)$"},
            "spec": {"type": "object",
                     "properties": {
                         "maxSurge": {
                             "x-kubernetes-int-or-string": True,
                             "pattern": r"^(\d+|\d+%)$",
                             "minimum": 0},
                     }},
        },
    }, name="t")
    assert sum("pattern facet dropped" in w
               for w in diag.warnings) == 2
    from rayskema.schema import Regex, StructField
    assert not any(isinstance(c, Regex)
                   for c in s.column("maxUnavailable").constraints)
    spec = s.column("spec")
    assert not any(isinstance(c, StructField)
                   and isinstance(c.constraint, Regex)
                   for c in spec.constraints)
    # numeric + numeric-string wire values validate without crashing
    batch = pa.table({
        "maxUnavailable": pa.array(["25", "3"]),
        "spec": pa.array(
            [{"maxSurge": 1}, {"maxSurge": 2}],
            type=pa.struct([pa.field("maxSurge", pa.int64())]))})
    norm, viols = normalize_batch(batch, s)
    assert viols.num_rows == 0
    v = ConstraintPlan(s).validate(norm)
    assert v.num_rows == 0
    assert norm["maxUnavailable"].to_pylist() == [25.0, 3.0]
