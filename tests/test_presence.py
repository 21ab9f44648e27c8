"""Presence tri-state + preserve-mode round trip (reference
presence.go:8-15, encode_preserve.go:11-28; SURVEY §7.4.3)."""

import pyarrow as pa

from rayskema.plan import (
    PRESENCE_DEFAULT_APPLIED, PRESENCE_SEEN, PRESENCE_WAS_NULL,
    encode_preserving, normalize_batch,
)
from rayskema.schema import Column, TableSchema, Unknown


def _schema():
    return TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("a", pa.string()),
            Column("b", pa.string(), default="dflt"),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )


def test_presence_bits():
    batch = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "a": pa.array(["x", None], type=pa.string()),
        # column b absent from this shard => default applied
    })
    norm, _ = normalize_batch(batch, _schema(), with_presence=True)
    assert norm["b"].to_pylist() == ["dflt", "dflt"]
    assert norm["_presence_a"].to_pylist() == [
        PRESENCE_SEEN, PRESENCE_SEEN | PRESENCE_WAS_NULL]
    assert norm["_presence_b"].to_pylist() == [
        PRESENCE_DEFAULT_APPLIED, PRESENCE_DEFAULT_APPLIED]


def test_encode_preserving_round_trip():
    batch = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "a": pa.array(["x", None], type=pa.string()),
    })
    norm, _ = normalize_batch(batch, _schema(), with_presence=True)
    preserved = encode_preserving(norm, _schema())
    # defaults undone (b back to absent=null), explicit null in a kept
    assert preserved.column_names == ["id", "a", "b"]
    assert preserved["b"].to_pylist() == [None, None]
    assert preserved["a"].to_pylist() == ["x", None]


def test_preserve_keeps_explicit_value_over_default():
    batch = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "a": pa.array(["x"], type=pa.string()),
        "b": pa.array(["explicit"], type=pa.string()),
    })
    norm, _ = normalize_batch(batch, _schema(), with_presence=True)
    preserved = encode_preserving(norm, _schema())
    assert preserved["b"].to_pylist() == ["explicit"]


def test_rfc3339_codec_decode_and_canonical_encode():
    """Column codec (reference codec/rfc3339.go): string wire form
    decodes to timestamp during normalize; bad strings => invalid_format;
    canonical re-encode renders UTC RFC3339."""
    from rayskema.plan import encode_canonical
    from rayskema.schema import Column

    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("ts", pa.timestamp("us"), codec="rfc3339"),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array(["2024-01-02T03:04:05+00:00",
                        "2024-06-07T08:09:10",  # no offset: invalid
                        "not a time"],
                       type=pa.string()),
    })
    norm, viols = normalize_batch(batch, s)
    assert norm["ts"].type == pa.timestamp("us")
    assert norm["ts"].to_pylist()[1] is None
    assert norm["ts"].to_pylist()[2] is None
    codes = [(r["id"], r["code"]) for r in viols.to_pylist()]
    assert (2, "invalid_format") in codes
    assert (3, "invalid_format") in codes
    enc = encode_canonical(norm, s)
    assert enc["ts"].type == pa.string()
    assert enc["ts"].to_pylist()[0].startswith("2024-01-02T03:04:05")


def _struct_schema():
    from rayskema.schema import NonNull, Range, StructField
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.int64())])
    return TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("meta", meta_t, constraints=(
                StructField(path=("lang",), default="en"),
                StructField(path=("score",),
                            constraint=Range(min=0, rule="r")),
            )),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )


def test_struct_subfield_presence_and_default():
    """Nested presence + defaults (reference nested field loop
    dsl/object_core.go:53-133 / default application
    dsl/object_builder.go:70-91): a wire struct MISSING a declared
    child gets the StructField default injected with the subpath
    DEFAULT_APPLIED bit; children under a null parent carry bits 0."""
    wire_t = pa.struct([("score", pa.int64())])  # no "lang" child
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "meta": pa.array([{"score": 5}, {"score": None}, None],
                         type=wire_t),
    })
    s = _struct_schema()
    norm, viols = normalize_batch(batch, s, with_presence=True)
    assert norm["meta"].type == s.columns[1].dtype
    assert norm["meta"].to_pylist() == [
        {"lang": "en", "score": 5}, {"lang": "en", "score": None}, None]
    assert norm["_presence_meta/lang"].to_pylist() == [
        PRESENCE_DEFAULT_APPLIED, PRESENCE_DEFAULT_APPLIED, 0]
    assert norm["_presence_meta/score"].to_pylist() == [
        PRESENCE_SEEN, PRESENCE_SEEN | PRESENCE_WAS_NULL, 0]


def test_struct_preserve_round_trip():
    """The nested preserve round-trip (reference
    encode_preserve_union_typed_test.go shape): default-applied
    children return to absent (null), explicit values and explicit
    nulls survive, null parents stay null."""
    wire_t = pa.struct([("score", pa.int64())])
    batch = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "meta": pa.array([{"score": 5}, {"score": None}, None],
                         type=wire_t),
    })
    s = _struct_schema()
    norm, _ = normalize_batch(batch, s, with_presence=True)
    preserved = encode_preserving(norm, s)
    assert preserved["meta"].to_pylist() == [
        {"lang": None, "score": 5}, {"lang": None, "score": None}, None]
    # explicit wire value for the defaulted child is KEPT
    batch2 = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "meta": pa.array([{"lang": "fr", "score": 1}],
                         type=s.columns[1].dtype),
    })
    norm2, _ = normalize_batch(batch2, s, with_presence=True)
    pres2 = encode_preserving(norm2, s)
    assert pres2["meta"].to_pylist() == [{"lang": "fr", "score": 1}]


def test_struct_extra_wire_children_stripped():
    wire_t = pa.struct([("score", pa.int64()), ("junk", pa.string())])
    batch = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "meta": pa.array([{"score": 2, "junk": "x"}], type=wire_t),
    })
    s = _struct_schema()
    norm, _ = normalize_batch(batch, s, with_presence=False)
    assert norm["meta"].type == s.columns[1].dtype
    assert norm["meta"].to_pylist() == [{"lang": "en", "score": 2}]


def test_struct_presence_schema_stable_across_wire_variants():
    """Batches whose wire struct MATCHES the declared type must emit
    the same _presence_<col>/<child> columns as batches needing
    reconciliation, or concat across evolved files fails."""
    s = _struct_schema()
    declared_t = s.columns[1].dtype
    match = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "meta": pa.array([{"lang": "fr", "score": 3}], type=declared_t),
    })
    evolved = pa.table({
        "id": pa.array([2], type=pa.int64()),
        "meta": pa.array([{"score": 4}],
                         type=pa.struct([("score", pa.int64())])),
    })
    absent = pa.table({"id": pa.array([3], type=pa.int64())})
    norms = [normalize_batch(b, s, with_presence=True)[0]
             for b in (match, evolved, absent)]
    assert norms[0].schema == norms[1].schema == norms[2].schema
    merged = pa.concat_tables(norms)  # must not raise ArrowInvalid
    assert merged.num_rows == 3
    assert "_presence_meta/lang" in merged.column_names
    assert "_presence_meta/score" in merged.column_names


def test_struct_child_checked_cast_overflow():
    """A non-round-trippable wire child value must produce an overflow
    violation at the /col/child subpath and become null — same
    contract as flat columns, one nesting level down."""
    wire_t = pa.struct([("score", pa.int64()), ("extra", pa.string())])
    meta32 = pa.struct([("lang", pa.string()), ("score", pa.int32())])
    from rayskema.schema import StructField
    s = TableSchema(
        columns=(
            Column("id", pa.int64(), nullable=False),
            Column("meta", meta32, constraints=(
                StructField(path=("lang",), default="en"),)),
        ),
        key_columns=("id",), unknown=Unknown.STRIP,
    )
    big = (1 << 40) + 5
    batch = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "meta": pa.array([{"score": big, "extra": "x"},
                          {"score": 7, "extra": "y"}], type=wire_t),
    })
    norm, viols = normalize_batch(batch, s, with_presence=True)
    assert norm["meta"].to_pylist() == [
        {"lang": "en", "score": None}, {"lang": "en", "score": 7}]
    v = viols.to_pylist()
    assert any(r["code"] == "overflow" and r["path"] == "/meta/score"
               for r in v), v
