"""Unit tests for the violation model (reference error-model contract:
/root/reference/api_error_model_test.go, errors.go)."""

import pyarrow as pa
import pytest

from rayskema.issues import (
    ALL_CODES, Issue, canon_params, column_path, escape_pointer_token,
    sort_violations, violations_from_mask, violations_schema,
)


def test_pointer_escaping():
    # reference: '~' -> '~0', '/' -> '~1' (enforce.go:210-221)
    assert escape_pointer_token("a~b/c") == "a~0b~1c"
    assert column_path("weird/col") == "/weird~1col"
    assert column_path("meta", "lang") == "/meta/lang"


def test_code_vocabulary_matches_reference():
    # exact parity with errors.go:10-36
    expected = {
        "invalid_type", "required", "unknown_key", "duplicate_key",
        "too_small", "too_big", "too_short", "too_long", "pattern",
        "invalid_enum", "invalid_format", "discriminator_missing",
        "discriminator_unknown", "union_ambiguous", "parse_error",
        "overflow", "truncated", "domain_range", "aggregate_violation",
        "uniqueness", "business_rule", "conflict", "dependency_unavailable",
    }
    assert ALL_CODES == frozenset(expected)


def test_issue_rejects_unknown_code():
    with pytest.raises(ValueError):
        Issue(path="/x", code="nope")


def test_canon_params_deterministic():
    a = canon_params({"b": 1, "a": 2.5})
    b = canon_params({"a": 2.5, "b": 1})
    assert a == b == '{"a":2.5,"b":1}'
    assert canon_params(None) == canon_params({}) == ""


def test_violations_from_mask_and_sort():
    batch = pa.table({
        "conv_id": ["c2", "c1", "c1"],
        "turn_idx": pa.array([0, 5, 1], type=pa.int32()),
        "x": [1, 2, 3],
    })
    mask = pa.array([True, True, False])
    v = violations_from_mask(batch, mask, ["conv_id", "turn_idx"],
                             "/x", "too_big", "r", "m", "p")
    assert v.num_rows == 2
    assert v.column_names == ["conv_id", "turn_idx", "path", "code", "rule",
                              "message", "params"]
    s = sort_violations(v, ["conv_id", "turn_idx"])
    assert s["conv_id"].to_pylist() == ["c1", "c2"]


def test_sort_order_is_total_and_stable():
    fields = [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32())]
    t = pa.table({
        "conv_id": ["b", None, "a", "a"],
        "turn_idx": pa.array([1, None, 2, 1], type=pa.int32()),
        "path": ["/x", "/y", "/x", "/x"],
        "code": ["pattern"] * 4,
        "rule": ["r"] * 4,
        "message": ["m"] * 4,
        "params": ["p"] * 4,
    }).cast(violations_schema(fields))
    s = sort_violations(t, ["conv_id", "turn_idx"])
    assert s["conv_id"].to_pylist() == [None, "a", "a", "b"]
    assert s["turn_idx"].to_pylist() == [None, 1, 2, 1]
