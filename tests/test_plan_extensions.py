"""Unit tests for plan extensions: discriminated unions (reference
dsl/union.go), fail-fast (api.go:147-156), maxIssues truncation
(internal/engine/json_dup_detect.go:53-61), normalizers
(pipeline.go:6-11)."""

import pyarrow as pa

from rayskema.plan import ConstraintPlan
from rayskema.schema import (
    Column, Enum, NonNull, Normalizer, Range, TableSchema, UnionRule,
    Unknown,
)


def _schema(**kw):
    defaults = dict(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("kind", pa.string()),
            Column("v", pa.float64()),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    defaults.update(kw)
    return TableSchema(**defaults)


def _batch(kinds, vs):
    return pa.table({
        "id": pa.array(range(len(kinds)), type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "v": pa.array(vs, type=pa.float64()),
    })


def test_union_routing():
    s = _schema(rules=(UnionRule(
        discriminator="kind",
        variants={"a": (("v", Range(max=10, rule="a_cap")),),
                  "b": (("v", Range(min=0, rule="b_floor")),)},
        rule="kind_union"),))
    plan = ConstraintPlan(s)
    out = plan.validate(_batch(["a", "a", "b", "zzz", None],
                               [5.0, 50.0, -1.0, 1.0, 1.0]))
    rows = sorted(
        (r["id"], r["code"], r["rule"]) for r in out.to_pylist())
    assert rows == [
        (1, "too_big", "a_cap"),
        (2, "too_small", "b_floor"),
        (3, "discriminator_unknown", "kind_union"),
        (4, "discriminator_missing", "kind_union"),
    ]


def test_fail_fast_stops_after_first_failing_check():
    s = _schema(columns=(
        Column("id", pa.int64(), nullable=False),
        Column("kind", pa.string(),
               constraints=(Enum(values=("a",), rule="kind_enum"),)),
        Column("v", pa.float64(),
               constraints=(Range(max=1, rule="v_cap"),)),
    ))
    batch = _batch(["x", "a"], [5.0, 9.0])
    collect = ConstraintPlan(s).validate(batch)
    fast = ConstraintPlan(s, fail_fast=True).validate(batch)
    assert collect.num_rows == 3   # 1 enum + 2 range
    assert fast.num_rows == 1      # stops after the enum check fails
    assert fast["code"].to_pylist() == ["invalid_enum"]


def test_max_issues_truncates_with_sentinel():
    s = _schema(columns=(
        Column("id", pa.int64(), nullable=False),
        Column("kind", pa.string()),
        Column("v", pa.float64(),
               constraints=(Range(max=0, rule="v_cap"),)),
    ))
    batch = _batch(["a"] * 10, [float(i + 1) for i in range(10)])
    out = ConstraintPlan(s, max_issues=3).validate(batch)
    assert out.num_rows == 4
    codes = out["code"].to_pylist()
    assert codes[:3] == ["too_big"] * 3
    assert codes[3] == "truncated"
    assert out["rule"].to_pylist()[3] == "max_issues"


def test_normalizers_run_before_checks():
    s = _schema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("kind", pa.string(),
                   constraints=(Enum(values=("a", "b"), rule="kind_enum"),)),
            Column("v", pa.float64()),
        ),
        normalizers=(Normalizer(column="kind", kind="utf8_trim"),
                     Normalizer(column="kind", kind="utf8_lower")),
    )
    out = ConstraintPlan(s).validate(_batch(["  A ", "b", "C!"], [0.0] * 3))
    # "  A " normalizes to "a" (passes); "C!" -> "c!" still fails
    assert out.num_rows == 1
    assert out["id"].to_pylist() == [2]


def test_union_contract_roundtrip():
    from rayskema.contract import export_contract, import_contract
    s = _schema(
        rules=(UnionRule(discriminator="kind",
                         variants={"a": (("v", NonNull(rule="v_req")),)},
                         rule="u"),),
        normalizers=(Normalizer(column="kind", kind="utf8_lower"),),
    )
    s2 = import_contract(export_contract(s))
    assert s2 == s
    assert s2.schema_hash() == s.schema_hash()


def test_struct_field_constraints():
    from rayskema.schema import Column, Enum, NonNull, StructField
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.float64())])
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("meta", meta_t, constraints=(
                StructField(path=("lang",),
                            constraint=Enum(values=("en", "fr"),
                                            rule="lang_enum")),
                StructField(path=("lang",),
                            constraint=NonNull(rule="lang_required")),
            )),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "meta": pa.array([{"lang": "en", "score": 1.0},
                          {"lang": "zz", "score": 2.0},
                          {"lang": None, "score": 3.0}], type=meta_t),
    })
    out = ConstraintPlan(s).validate(batch)
    rows = sorted((r["id"], r["path"], r["code"]) for r in out.to_pylist())
    assert rows == [(2, "/meta/lang", "invalid_enum"),
                    (3, "/meta/lang", "required")]


def test_struct_contract_roundtrip():
    from rayskema.contract import export_contract, import_contract
    from rayskema.schema import Column, Enum, StructField
    meta_t = pa.struct([("lang", pa.string()),
                        ("tags", pa.list_(pa.string()))])
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("meta", meta_t, constraints=(
                StructField(path=("lang",),
                            constraint=Enum(values=("en",), rule="r")),)),
            Column("emb", pa.list_(pa.float32(), 8)),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    s2 = import_contract(export_contract(s))
    assert s2 == s
    assert s2.schema_hash() == s.schema_hash()


def test_len_bounds_on_list_column():
    from rayskema.schema import Column, LenBounds
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("tags", pa.list_(pa.string()),
                   constraints=(LenBounds(min_len=1, max_len=3,
                                          rule="tags_len"),)),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "tags": pa.array([[], ["a"], ["a", "b", "c", "d"]],
                         type=pa.list_(pa.string())),
    })
    out = ConstraintPlan(s).validate(batch)
    rows = sorted((r["id"], r["code"]) for r in out.to_pylist())
    assert rows == [(1, "too_short"), (3, "too_long")]


def test_codec_violation_with_key_cast():
    """Codec violations must carry DECLARED-typed key columns even when
    the wire key needs casting (review finding: mixed key schemas
    crashed concat_tables)."""
    from rayskema.schema import Column
    s = TableSchema(columns=(
        Column("id", pa.int64(), nullable=False),
        Column("ts", pa.timestamp("us"), codec="rfc3339"),
    ), key_columns=("id",), unknown=Unknown.STRIP)
    wire = pa.table({
        "id": pa.array([1, 2], type=pa.int32()),  # wire narrower than declared
        "ts": pa.array(["2024-01-01T00:00:00Z", "junk"], type=pa.string()),
    })
    out = ConstraintPlan(s).validate(wire)
    assert out["id"].type == pa.int64()
    assert [(r["id"], r["code"]) for r in out.to_pylist()] == \
        [(2, "invalid_format")]


def test_rfc3339_fractional_and_offset():
    """Fractional seconds and ±hh:mm offsets are valid RFC3339; a space
    separator, a MISSING offset, and ±hhmm (no colon) are invalid —
    exactly what Go time.RFC3339/RFC3339Nano rejects (reference codec
    parity)."""
    from rayskema.plan import decode_rfc3339
    arr = pa.array(["2024-01-01T00:00:00.123Z",
                    "2024-06-07T08:09:10.123456+02:00",
                    "2024-06-07 08:09:10Z",        # space separator
                    "2024-06-07T08:09:10",         # missing offset
                    "2024-06-07T08:09:10+0200",    # offset without colon
                    None, "junk"])
    ts, bad = decode_rfc3339(arr, pa.timestamp("us"))
    vals = ts.to_pylist()
    assert vals[0].microsecond == 123000
    assert vals[1].hour == 6 and vals[1].microsecond == 123456  # UTC
    assert vals[5] is None
    assert bad.to_pylist() == [False, False, True, True, True, False, True]


def test_build_verdicts_numeric_key():
    """build_verdicts must hash non-string keys too (review finding)."""
    from rayskema.issues import violations_schema
    from rayskema.pipelines.validate import build_verdicts
    from rayskema.schema import Column
    s = TableSchema(columns=(Column("id", pa.int64(), nullable=False),),
                    key_columns=("id",), unknown=Unknown.STRIP)
    v = pa.table({
        "id": pa.array([1, 2, None], type=pa.int64()),
        "path": ["/x"] * 3, "code": ["required"] * 3, "rule": ["r"] * 3,
        "message": [""] * 3, "params": [""] * 3,
    }).cast(violations_schema(s.key_fields()))
    verd = build_verdicts(v, s, n_partitions=8)
    assert int(pa.compute.sum(verd["violation_count"]).as_py()) == 3


def test_map_key_regex():
    from rayskema.schema import Column, MapKeyRegex
    mt = pa.map_(pa.string(), pa.int64())
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("props", mt, constraints=(
                MapKeyRegex(pattern=r"[a-z_]+", rule="prop_keys"),)),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "props": pa.array([[("good_key", 1), ("also_ok", 2)],
                           [("BadKey", 3)],
                           []], type=mt),
    })
    out = ConstraintPlan(s).validate(batch)
    assert [(r["id"], r["code"], r["path"]) for r in out.to_pylist()] == \
        [(2, "pattern", "/props")]


def test_union_presence_carried_and_preserved():
    """Presence for variant-selected fields is retained through a
    union-routed schema, and preserve-mode drops default-applied
    values while keeping explicit ones (reference
    dsl/encode_preserve_union_typed_test.go: both tests' semantics at
    the columnar level)."""
    from rayskema.plan import (
        PRESENCE_DEFAULT_APPLIED, PRESENCE_SEEN, encode_preserving,
        normalize_batch,
    )
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("kind", pa.string()),
            Column("number", pa.string()),
            Column("active", pa.bool_(), default=True),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
        rules=(UnionRule(
            discriminator="kind",
            variants={"card": (("number", NonNull(rule="num_req")),)},
            rule="kind_union"),),
    )
    # wire batch LACKS 'active' (default applies) but carries the
    # union variant field 'number'
    batch = pa.table({
        "id": pa.array([0, 1], type=pa.int64()),
        "kind": pa.array(["card", "card"]),
        "number": pa.array(["n", None]),
    })
    norm, viols = normalize_batch(batch, s, with_presence=True)
    # variant field presence retained (reference: dm.Presence["/number"])
    pres = norm["_presence_number"].to_pylist()
    assert pres[0] == PRESENCE_SEEN
    assert pres[1] & PRESENCE_SEEN
    assert norm["_presence_active"].to_pylist() == [
        PRESENCE_DEFAULT_APPLIED] * 2
    # union routing still fires on the normalized batch
    plan = ConstraintPlan(s)
    out = plan.validate(batch)
    assert any(r["rule"] == "num_req" and r["id"] == 1
               for r in out.to_pylist())
    # preserve-mode: default-materialized 'active' returns to absent
    # (null), explicit 'number' values survive
    preserved = encode_preserving(norm, s)
    assert preserved["active"].to_pylist() == [None, None]
    assert preserved["number"].to_pylist() == ["n", None]
