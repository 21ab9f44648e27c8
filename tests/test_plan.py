"""Unit tests for the vectorized constraint-plan compiler — the analogue
of the reference's per-operator unit tests (/root/reference/dsl/
primitives_test.go, zod_basics_test.go, object_refine_test.go).  Pure
pyarrow; no Ray session needed."""

import pyarrow as pa
import pytest

from rayskema.plan import BatchValidator, ConstraintPlan, normalize_batch
from rayskema.schema import (
    ByteBounds, Column, CrossFieldRule, Enum, LenBounds, NonNull, Range,
    Regex, TableSchema, TsFormat, Unknown,
)


def mini_schema(*constraint_sets, unknown=Unknown.STRICT, rules=()):
    cols = [Column("k", pa.string(), nullable=False)]
    for i, (dtype, cs) in enumerate(constraint_sets):
        cols.append(Column(f"v{i}", dtype, constraints=tuple(cs)))
    return TableSchema(columns=tuple(cols), key_columns=("k",),
                       unknown=unknown, rules=tuple(rules))


def codes_of(v):
    return sorted(zip(v["k"].to_pylist(), v["path"].to_pylist(),
                      v["code"].to_pylist()))


def test_non_null():
    s = mini_schema((pa.string(), [NonNull(rule="r")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b"], "v0": ["x", None]}))
    assert codes_of(v) == [("b", "/v0", "required")]


def test_regex_full_match():
    s = mini_schema((pa.string(), [Regex(pattern=r"[a-z]+", rule="r")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b", "c", "d"],
                                "v0": ["ok", "Nope", "ok2", None]}))
    # full-match anchoring: "ok2" fails; null skipped (NonNull owns nulls)
    assert codes_of(v) == [("b", "/v0", "pattern"), ("c", "/v0", "pattern")]


def test_enum():
    s = mini_schema((pa.string(), [Enum(values=("x", "y"), rule="r")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b", "c"],
                                "v0": ["x", "z", None]}))
    assert codes_of(v) == [("b", "/v0", "invalid_enum")]


def test_len_and_byte_bounds():
    s = mini_schema(
        (pa.string(), [LenBounds(min_len=2, max_len=4, rule="r"),
                       ByteBounds(min_bytes=1, max_bytes=6, rule="b")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({
        "k": ["a", "b", "c", "d"],
        # 'é'*4 is 4 chars but 8 bytes -> byte bound fires, len ok
        "v0": ["x", "okay!", "éééé", "ok"]}))
    got = codes_of(v)
    assert ("a", "/v0", "too_short") in got      # 1 char < 2
    assert ("b", "/v0", "too_long") in got       # 5 chars > 4
    assert ("c", "/v0", "truncated") in got      # 8 bytes > 6
    assert len(got) == 3


def test_range_inclusive_exclusive():
    s = mini_schema((pa.int64(), [Range(min=0, max=10, rule="r")]),
                    (pa.float64(), [Range(min=0, exclusive_min=True, rule="e")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b", "c"],
                                "v0": [-1, 5, 11],
                                "v1": [0.0, 1.0, -2.0]}))
    got = codes_of(v)
    assert ("a", "/v0", "too_small") in got
    assert ("c", "/v0", "too_big") in got
    assert ("a", "/v1", "too_small") in got      # exclusive min: 0.0 fails
    assert ("c", "/v1", "too_small") in got
    assert len(got) == 4


def test_ts_format():
    s = mini_schema((pa.string(), [TsFormat(format="%Y-%m-%d", rule="r")]))
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b", "c"],
                                "v0": ["2024-01-01", "not-a-date", None]}))
    assert codes_of(v) == [("b", "/v0", "invalid_format")]


def test_cross_field_rule():
    rule = CrossFieldRule(
        rule="ship_after_order",
        when={"op": "eq", "col": "v0", "value": "shipped"},
        expect={"op": "not_null", "col": "v1"})
    s = mini_schema((pa.string(), []), (pa.string(), []), rules=[rule])
    plan = ConstraintPlan(s)
    v = plan.validate(pa.table({"k": ["a", "b", "c"],
                                "v0": ["shipped", "shipped", "new"],
                                "v1": ["t", None, None]}))
    assert codes_of(v) == [("b", "", "business_rule")]


def test_normalize_missing_column_with_default():
    cols = (Column("k", pa.string(), nullable=False),
            Column("v", pa.string(), default="dflt"))
    s = TableSchema(columns=cols, key_columns=("k",))
    out, viols = normalize_batch(pa.table({"k": ["a"]}), s)
    assert out["v"].to_pylist() == ["dflt"]
    assert viols.num_rows == 0


def test_normalize_missing_required_column():
    cols = (Column("k", pa.string(), nullable=False),
            Column("v", pa.string()))
    s = TableSchema(columns=cols, key_columns=("k",))
    out, viols = normalize_batch(pa.table({"k": ["a"]}), s)
    assert out["v"].null_count == 1
    assert viols["code"].to_pylist() == ["required"]
    assert viols["path"].to_pylist() == ["/v"]


def test_normalize_unknown_policies():
    cols = (Column("k", pa.string(), nullable=False),)
    batch = pa.table({"k": ["a"], "extra": [1]})
    strict = TableSchema(columns=cols, key_columns=("k",),
                         unknown=Unknown.STRICT)
    out, viols = normalize_batch(batch, strict)
    assert viols["code"].to_pylist() == ["unknown_key"]
    assert out.column_names == ["k"]
    strip = TableSchema(columns=cols, key_columns=("k",),
                        unknown=Unknown.STRIP)
    out, viols = normalize_batch(batch, strip)
    assert viols.num_rows == 0 and out.column_names == ["k"]
    thru = TableSchema(columns=cols, key_columns=("k",),
                       unknown=Unknown.PASSTHROUGH)
    out, viols = normalize_batch(batch, thru)
    assert viols.num_rows == 0 and out.column_names == ["k", "extra"]


def test_normalize_overflow_cast():
    # reference width-checked projections: overflow code
    # (dsl/primitives.go:598-638)
    cols = (Column("k", pa.string(), nullable=False),
            Column("v", pa.int32()))
    s = TableSchema(columns=cols, key_columns=("k",))
    batch = pa.table({"k": ["a", "b"],
                      "v": pa.array([5, 2**31 + 5], type=pa.int64())})
    out, viols = normalize_batch(batch, s)
    assert out["v"].to_pylist() == [5, None]
    assert viols["code"].to_pylist() == ["overflow"]
    assert viols["k"].to_pylist() == ["b"]


def test_decimal_column_end_to_end():
    """Declared decimal128 column (reference NumberDecimal mode,
    types.go:12-20): checked cast from the wire's float64, Range
    constraint evaluated in decimal, values preserved exactly."""
    from decimal import Decimal
    cols = (Column("k", pa.string(), nullable=False),
            Column("price", pa.decimal128(18, 2),
                   constraints=(Range(min=0, max=100, rule="r"),)))
    s = TableSchema(columns=cols, key_columns=("k",))
    batch = pa.table({
        "k": ["a", "b", "c", "d"],
        "price": pa.array([1.25, 99.994, 100.01, -3.5],
                          type=pa.float64())})
    out, viols = normalize_batch(batch, s)
    assert out.schema.field("price").type == pa.decimal128(18, 2)
    assert out["price"].to_pylist() == [
        Decimal("1.25"), Decimal("99.99"), Decimal("100.01"),
        Decimal("-3.50")]
    plan = ConstraintPlan(s)
    v = plan.validate(batch)
    assert codes_of(v) == [("c", "/price", "too_big"),
                           ("d", "/price", "too_small")]


def test_decimal_from_float_matches_sql_round():
    from decimal import Decimal
    from rayskema.functions import decimal_from_float
    a = pa.array([1.005, 2.675, None, -2.5, 1e10 + 0.005])
    # every expectation below equals DuckDB's
    # CAST(round(x*100)/100 AS DECIMAL(18,2)) on the same doubles
    # (1e10+0.005 is 10000000000.004999... in binary -> .00)
    assert decimal_from_float(a).to_pylist() == [
        Decimal("1.00"), Decimal("2.68"), None, Decimal("-2.50"),
        Decimal("10000000000.00")]


def test_validator_emits_sketch_partial():
    s = mini_schema((pa.string(), []))
    v = BatchValidator(s, with_profile=True)
    out = v(pa.table({"k": ["a", "b"], "v0": ["x", "y"]}))
    kinds = out["kind"].to_pylist()
    assert kinds.count("s") == 1
    from rayskema.state.sketches import ColumnProfile
    payload = [p for p, k in zip(out["payload"].to_pylist(), kinds)
               if k == "s"][0]
    prof = ColumnProfile.from_bytes(payload)
    assert prof.row_count == 2
