"""Contract evolution / compatibility checker (rayskema/evolution.py).

Registry-style BACKWARD/FORWARD semantics with "reader" = contract;
see the module docstring for the data-centric definitions."""

import pyarrow as pa

from rayskema.evolution import (changes_table, compatibility,
                                diff_schemas)
from rayskema.schema import (ByteBounds, Column, Enum, LenBounds, Range,
                             Regex, TableSchema, Unknown, UniqueRule)


def _s(*cols, **kw):
    return TableSchema(columns=tuple(cols), **kw)


def test_identical_schemas_full():
    s = _s(Column("a", pa.int64(), nullable=False),
           key_columns=("a",))
    assert diff_schemas(s, s) == []
    assert compatibility([]) == "full"


def test_column_added_variants():
    old = _s(Column("a", pa.int64()))
    # nullable add: backward ok (reads as null); forward blocked only
    # under a STRICT old policy
    new = _s(Column("a", pa.int64()), Column("b", pa.string()))
    ch = diff_schemas(old, new)
    assert [c.change for c in ch] == ["column_added"]
    assert ch[0].backward_ok and not ch[0].forward_ok
    old_loose = _s(Column("a", pa.int64()), unknown=Unknown.STRIP)
    assert diff_schemas(old_loose, _s(
        Column("a", pa.int64()), Column("b", pa.string()),
        unknown=Unknown.STRIP))[0].forward_ok
    # required no-default add: backward broken
    new_req = _s(Column("a", pa.int64()),
                 Column("b", pa.string(), nullable=False))
    assert not diff_schemas(old, new_req)[0].backward_ok
    # required WITH default: backward ok (default fills old rows)
    new_def = _s(Column("a", pa.int64()),
                 Column("b", pa.string(), nullable=False, default="x"))
    assert diff_schemas(old, new_def)[0].backward_ok


def test_column_removed():
    old = _s(Column("a", pa.int64()),
             Column("b", pa.string(), nullable=False))
    new = _s(Column("a", pa.int64()))
    (ch,) = diff_schemas(old, new)
    assert ch.change == "column_removed"
    # new contract STRICT: old data's b is an unknown column
    assert not ch.backward_ok
    # b was required with no default: new data fails the old contract
    assert not ch.forward_ok
    new_loose = _s(Column("a", pa.int64()), unknown=Unknown.STRIP)
    assert diff_schemas(old, new_loose)[0].backward_ok


def test_type_promotion_lattice():
    cases = [
        (pa.int32(), pa.int64(), True, False),
        (pa.int64(), pa.int32(), False, True),
        (pa.uint16(), pa.int32(), True, False),
        (pa.uint32(), pa.int32(), False, False),
        (pa.int32(), pa.float64(), True, False),
        (pa.int64(), pa.float64(), False, False),
        (pa.float32(), pa.float64(), True, False),
        (pa.string(), pa.large_string(), True, False),
        (pa.string(), pa.int64(), False, False),
        (pa.decimal128(10, 2), pa.decimal128(12, 2), True, False),
        # more scale but FEWER integer digits (8 < 10): neither
        # direction is lossless
        (pa.decimal128(12, 2), pa.decimal128(12, 4), False, False),
        (pa.decimal128(12, 2), pa.decimal128(14, 4), True, False),
    ]
    for old_t, new_t, back, fwd in cases:
        (ch,) = diff_schemas(_s(Column("a", old_t)),
                             _s(Column("a", new_t)))
        assert ch.change == "type_changed"
        assert (ch.backward_ok, ch.forward_ok) == (back, fwd), \
            (old_t, new_t)


def test_nullability_and_enum():
    old = _s(Column("a", pa.string(),
                    constraints=(Enum(values=("x", "y")),)))
    grew = _s(Column("a", pa.string(),
                     constraints=(Enum(values=("x", "y", "z")),)))
    (ch,) = diff_schemas(old, grew)
    assert ch.backward_ok and not ch.forward_ok
    shrank = _s(Column("a", pa.string(),
                       constraints=(Enum(values=("x",)),)))
    (ch,) = diff_schemas(old, shrank)
    assert not ch.backward_ok and ch.forward_ok
    # nullable -> required breaks the corpus
    (ch,) = diff_schemas(_s(Column("a", pa.int64())),
                         _s(Column("a", pa.int64(), nullable=False)))
    assert ch.change == "nullability_tightened"
    assert not ch.backward_ok and ch.forward_ok


def test_bound_intervals():
    old = _s(Column("a", pa.int64(), constraints=(Range(min=0, max=10),)))
    loosened = _s(Column("a", pa.int64(),
                         constraints=(Range(min=-5, max=10),)))
    (ch,) = diff_schemas(old, loosened)
    assert ch.backward_ok and not ch.forward_ok
    tightened = _s(Column("a", pa.int64(),
                          constraints=(Range(min=0, max=10,
                                             exclusive_max=True),)))
    (ch,) = diff_schemas(old, tightened)
    assert not ch.backward_ok and ch.forward_ok
    # dropping the bound entirely = loosening to the universe
    (ch,) = diff_schemas(old, _s(Column("a", pa.int64())))
    assert ch.backward_ok and not ch.forward_ok
    # LenBounds/ByteBounds ride the same interval logic
    (ch,) = diff_schemas(
        _s(Column("s", pa.string(),
                  constraints=(LenBounds(max_len=10),))),
        _s(Column("s", pa.string(),
                  constraints=(LenBounds(max_len=20),))))
    assert ch.backward_ok and not ch.forward_ok
    (ch,) = diff_schemas(
        _s(Column("s", pa.string(),
                  constraints=(ByteBounds(max_bytes=100),))),
        _s(Column("s", pa.string(),
                  constraints=(ByteBounds(max_bytes=50),))))
    assert not ch.backward_ok and ch.forward_ok


def test_opaque_constraints_conservative():
    old = _s(Column("a", pa.string(),
                    constraints=(Regex(pattern="^x"),)))
    new = _s(Column("a", pa.string(),
                    constraints=(Regex(pattern="^y"),)))
    (ch,) = diff_schemas(old, new)
    # a rewritten regex adds one and removes one: both directions fail
    assert not ch.backward_ok and not ch.forward_ok
    # pure removal: backward fine, forward not
    (ch,) = diff_schemas(old, _s(Column("a", pa.string())))
    assert ch.backward_ok and not ch.forward_ok


def test_table_scope_changes():
    old = _s(Column("a", pa.int64()), Column("b", pa.int64()),
             key_columns=("a",))
    new = _s(Column("a", pa.int64()), Column("b", pa.int64()),
             key_columns=("a", "b"))
    (ch,) = diff_schemas(old, new)
    assert ch.change == "key_columns_changed"
    assert not ch.backward_ok and not ch.forward_ok
    # unique rule added: old corpus may contain duplicates
    with_rule = _s(Column("a", pa.int64()), Column("b", pa.int64()),
                   key_columns=("a",),
                   rules=(UniqueRule(columns=("a",)),))
    (ch,) = diff_schemas(old, with_rule)
    assert ch.change == "rule_added"
    assert not ch.backward_ok and ch.forward_ok
    # policy loosened: STRICT -> STRIP
    loose = _s(Column("a", pa.int64()), Column("b", pa.int64()),
               key_columns=("a",), unknown=Unknown.STRIP)
    (ch,) = diff_schemas(old, loose)
    assert ch.change == "unknown_policy_changed"
    assert ch.backward_ok and not ch.forward_ok


def test_compatibility_fold_and_table():
    old = _s(Column("a", pa.int32()),
             Column("b", pa.string(),
                    constraints=(Enum(values=("x", "y")),)))
    new = _s(Column("a", pa.int64()),
             Column("b", pa.string(),
                    constraints=(Enum(values=("x", "y", "z")),)))
    ch = diff_schemas(old, new)
    assert compatibility(ch) == "backward"
    tab = changes_table(ch)
    assert tab.column_names == ["path", "change", "detail",
                                "backward_ok", "forward_ok"]
    assert tab.num_rows == len(ch) == 2
    assert compatibility(diff_schemas(new, old)) == "forward"


def test_cli_diff(tmp_path, capsys):
    import json

    from rayskema.__main__ import main
    from rayskema.contract import save_contract

    old = _s(Column("a", pa.int32()), Column("b", pa.string()))
    new = _s(Column("a", pa.int64()), Column("b", pa.string()),
             Column("c", pa.float64()))
    po, pn = str(tmp_path / "old.json"), str(tmp_path / "new.json")
    save_contract(old, po)
    save_contract(new, pn)
    rc = main(["diff", "--old", po, "--new", pn])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0                       # backward-compatible changes
    assert lines[-1]["compatibility"] == "backward"
    assert {x["change"] for x in lines[:-1]} == {"column_added",
                                                 "type_changed"}
    # demanding FULL fails
    assert main(["diff", "--old", po, "--new", pn,
                 "--require", "full"]) == 1


def test_structfield_and_normalizer_changes_not_full():
    from rayskema.schema import Regex, StructField

    old = _s(Column("meta", pa.struct([("lang", pa.string())]),
                    constraints=(StructField(),)))
    new = _s(Column("meta", pa.struct([("lang", pa.string())])))
    (ch,) = diff_schemas(old, new)
    assert ch.change == "structfield_changed"
    assert ch.backward_ok and not ch.forward_ok   # pure removal
    assert compatibility(diff_schemas(old, new)) != "full"

    base = _s(Column("a", pa.int64()))
    with_norm = TableSchema(columns=(Column("a", pa.int64()),),
                            normalizers=(("trim",),))
    (ch,) = diff_schemas(base, with_norm)
    assert ch.change == "normalizers_changed"
    assert not ch.backward_ok and not ch.forward_ok
