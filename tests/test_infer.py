"""Contract inference: facts correctness, tightest-contract
self-consistency (zero violations on the inferring data), and
violation on out-of-envelope values."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from rayskema.functions.infer import (
    contract_from_facts, infer_contract, infer_facts,
)
from rayskema.plan import ConstraintPlan
from rayskema.schema import Enum, LenBounds, NonNull, Range


def _tab() -> pa.Table:
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "status": pa.array(["O", "F", "O", "P", "O", "F"]),
        "price": pa.array([1.5, 2.0, 0.5, 9.75, 3.25, 2.0]),
        "note": pa.array(["aa", "bbbb", None, "cc", "dddddd", "e"]),
        "ts": pa.array(
            np.array([1, 2, 3, 4, 5, 6], dtype="datetime64[us]")),
    })


def _facts_row(facts: pa.Table, col: str) -> dict:
    rows = [r for r in facts.to_pylist() if r["col"] == col]
    assert len(rows) == 1
    return rows[0]


def test_infer_facts_values(ray_session):
    ds = rd.from_arrow(_tab()).repartition(3)
    facts = infer_facts(ds, enum_max=4)
    assert facts["col"].to_pylist() == sorted(
        ["id", "status", "price", "note", "ts"])
    rid = _facts_row(facts, "id")
    assert (rid["n"], rid["n_null"], rid["n_distinct"]) == (6, 0, 6)
    assert (rid["min_num"], rid["max_num"]) == (1.0, 6.0)
    st = _facts_row(facts, "status")
    assert st["n_distinct"] == 3
    assert st["enum_values"] == "F,O,P"
    assert (st["min_len"], st["max_len"]) == (1, 1)
    nt = _facts_row(facts, "note")
    assert nt["n_null"] == 1
    assert (nt["min_len"], nt["max_len"]) == (1, 6)
    # 5 distinct notes > enum_max=4 => no enum proposed
    assert nt["enum_values"] is None
    t = _facts_row(facts, "ts")
    # temporal min/max as epoch integers of the storage unit
    assert (t["min_num"], t["max_num"]) == (1.0, 6.0)


def test_inferred_contract_is_tightest_passing(ray_session):
    ds = rd.from_arrow(_tab()).repartition(2)
    schema = infer_contract(ds, key_columns=["id"], enum_max=4,
                            name="t")
    by_col = {c.name: c for c in schema.columns}
    assert not by_col["id"].nullable
    assert any(isinstance(k, Range) for k in by_col["id"].constraints)
    assert any(isinstance(k, Enum) and set(k.values) == {"O", "F", "P"}
               for k in by_col["status"].constraints)
    assert by_col["note"].nullable
    assert not any(isinstance(k, NonNull)
                   for k in by_col["note"].constraints)
    assert any(isinstance(k, LenBounds) and (k.min_len, k.max_len)
               == (1, 6) for k in by_col["note"].constraints)
    # self-consistency: zero violations on the data it was inferred from
    plan = ConstraintPlan(schema)
    assert plan.validate(_tab()).num_rows == 0


def test_inferred_contract_flags_out_of_envelope(ray_session):
    ds = rd.from_arrow(_tab())
    plan = ConstraintPlan(infer_contract(ds, key_columns=["id"],
                                         enum_max=4))
    bad = pa.table({
        "id": pa.array([7, 8, 9], type=pa.int64()),
        "status": pa.array(["O", "X", "F"]),        # unseen enum value
        "price": pa.array([2.0, 100.0, None]),      # above max; null
        "note": pa.array(["ok", "toolongnote", "x"]),  # above max_len
        "ts": pa.array(np.array([7, 8, 9], dtype="datetime64[us]")),
    })
    v = plan.validate(bad)
    codes = set(zip(v["path"].to_pylist(), v["code"].to_pylist()))
    assert ("/status", "invalid_enum") in codes
    assert ("/price", "too_big") in codes
    assert ("/price", "required") in codes
    assert ("/note", "too_long") in codes


def test_infer_comma_value_drops_enum(ray_session):
    t = pa.table({"k": pa.array(["a,b", "c", "a,b", "c"])})
    facts = infer_facts(rd.from_arrow(t), enum_max=4)
    r = _facts_row(facts, "k")
    assert r["enum_values"] is None          # "," would not round-trip
    schema = infer_contract(rd.from_arrow(t), enum_max=4)
    ks = schema.columns[0].constraints
    assert not any(isinstance(c, Enum) for c in ks)
    assert any(isinstance(c, LenBounds) for c in ks)


def test_infer_all_null_column(ray_session):
    t = pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "s": pa.array([None, None], type=pa.string()),
    })
    facts = infer_facts(rd.from_arrow(t))
    r = _facts_row(facts, "s")
    assert r["n_null"] == 2 and r["n_distinct"] == 0
    assert r["enum_values"] is None
    schema = infer_contract(rd.from_arrow(t))
    s_col = {c.name: c for c in schema.columns}["s"]
    assert s_col.nullable and s_col.constraints == ()
    assert ConstraintPlan(schema).validate(t).num_rows == 0


def test_contract_round_trips_through_export(ray_session, tmp_path):
    from rayskema.contract import load_contract, save_contract

    ds = rd.from_arrow(_tab())
    schema = infer_contract(ds, key_columns=["id"], enum_max=4,
                            name="rt")
    p = str(tmp_path / "c.json")
    save_contract(schema, p)
    assert load_contract(p).schema_hash() == schema.schema_hash()


def test_infer_all_empty_string_column(ray_session):
    # the one-value set {""} joins to "" — must decode to Enum(("",)),
    # not Enum(()) (whose null-typed is_in crashed validation)
    t = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "s": pa.array(["", ""])})
    schema = infer_contract(rd.from_arrow(t), enum_max=4)
    s_col = {c.name: c for c in schema.columns}["s"]
    enums = [c for c in s_col.constraints if isinstance(c, Enum)]
    assert enums and enums[0].values == ("",)
    assert ConstraintPlan(schema).validate(t).num_rows == 0


def test_infer_int64_beyond_float_exact(ray_session):
    # min/max ride through float64 in the facts; beyond 2^53 the cast
    # can round INWARD — the inferred Range must still admit the data
    t = pa.table({"k": pa.array([9007199254740995, 9007199254741000],
                                type=pa.int64())})
    schema = infer_contract(rd.from_arrow(t))
    assert ConstraintPlan(schema).validate(t).num_rows == 0
