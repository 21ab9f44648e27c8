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
