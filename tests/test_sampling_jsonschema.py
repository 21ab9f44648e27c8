"""Seeded sampling (O3) determinism and JSON Schema export round-trip."""

import json

import pyarrow as pa
import pytest

import ray.data as rd

from rayskema.contract_openapi import import_openapi
from rayskema.functions.sampling import seeded_sample
from rayskema.jsonschema import export_json_schema
from rayskema.schema import (
    Column, Contains, Enum, LenBounds, ListUnique, NonNull, Range, Regex,
    TableSchema, Unknown, transcript_schema,
)


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_seeded_sample_keyed_deterministic_across_layouts(ray_session):
    tab = pa.table({"doc_id": pa.array(range(2000), type=pa.int64()),
                    "text": pa.array([f"t{i}" for i in range(2000)])})
    a = _ids(seeded_sample(
        rd.from_arrow(tab).repartition(2), 0.25, seed=7, key="doc_id"))
    b = _ids(seeded_sample(
        rd.from_arrow(tab).repartition(13), 0.25, seed=7, key="doc_id"))
    assert a == b                      # layout-independent
    assert 0.15 < len(a) / 2000 < 0.35
    c = _ids(seeded_sample(
        rd.from_arrow(tab).repartition(2), 0.25, seed=8, key="doc_id"))
    assert a != c                      # seed changes the sample


def test_seeded_sample_positional_deterministic(ray_session):
    tab = pa.table({"doc_id": pa.array(range(1000), type=pa.int64())})
    ds = rd.from_arrow(tab).repartition(4)
    a = _ids(seeded_sample(ds, 0.2, seed=3))
    b = _ids(seeded_sample(ds, 0.2, seed=3))
    assert a == b


def test_json_schema_snapshot():
    # mirrors the reference's snapshot shape
    # (dsl/jsonschema_snapshot_test.go + object_core.go:289-320)
    s = TableSchema(columns=(
        Column("id", pa.int64(), nullable=False,
               constraints=(NonNull(rule="r"), Range(min=0, rule="r"))),
        Column("name", pa.string(),
               constraints=(Regex(pattern="[a-z]+", rule="r"),
                            LenBounds(min_len=1, max_len=8, rule="r"))),
        Column("kind", pa.string(),
               constraints=(Enum(values=("a", "b"), rule="r"),)),
        Column("tags", pa.list_(pa.string()),
               constraints=(LenBounds(min_len=1, max_len=3, rule="r"),
                            ListUnique(rule="r"))),
    ), key_columns=("id",), unknown=Unknown.STRICT, name="snap")
    got = export_json_schema(s)
    want = {
        "type": "object",
        "additionalProperties": False,
        "required": ["id"],
        "properties": {
            "id": {"type": "integer", "minimum": 0},
            "name": {"type": "string", "pattern": "^(?:[a-z]+)$",
                     "minLength": 1, "maxLength": 8},
            "kind": {"type": "string", "enum": ["a", "b"]},
            "tags": {"type": "array", "items": {"type": "string"},
                     "minItems": 1, "maxItems": 3,
                     "x-kubernetes-list-type": "set", "uniqueItems": True},
        },
    }
    assert json.loads(json.dumps(got)) == want


def test_json_schema_export_import_roundtrip():
    s = TableSchema(columns=(
        Column("id", pa.int64(), nullable=False,
               constraints=(NonNull(rule="id_required"),
                            Range(min=0, rule="id"))),
        Column("status", pa.string(),
               constraints=(Enum(values=("O", "F"), rule="status"),)),
        Column("tags", pa.list_(pa.string()),
               constraints=(Contains(predicate={"op": "eq", "value": "x"},
                                     min_contains=1, rule="tags"),
                            ListUnique(rule="tags"))),
    ), key_columns=("id",), unknown=Unknown.STRICT, name="rt")
    doc = export_json_schema(s, wrap=True)
    s2, diag = import_openapi(doc, name="rt", key_columns=("id",))
    assert not diag.warnings
    assert s2.column_names == s.column_names
    assert s2.unknown is Unknown.STRICT
    assert s2.column("id").dtype == pa.int64()
    assert not s2.column("id").nullable
    tags = s2.column("tags")
    assert any(isinstance(c, Contains) for c in tags.constraints)
    assert any(isinstance(c, ListUnique) for c in tags.constraints)
    st = s2.column("status")
    assert any(isinstance(c, Enum) and c.values == ("O", "F")
               for c in st.constraints)


def test_transcript_schema_exports_cleanly():
    doc = export_json_schema(transcript_schema())
    assert doc["required"] == ["conv_id", "role", "text", "ts", "turn_idx"]
    assert doc["properties"]["ts"] == {"type": "string",
                                       "format": "date-time"}
    assert doc["properties"]["conv_id"]["pattern"] == "^(?:conv_[0-9]{8})$"
    assert doc["properties"]["text"]["maxBytes"] == 4096


def test_hash_split(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rayskema.functions.sampling import hash_split

    ds = rd.from_arrow(pa.table({"id": [str(i) for i in range(2000)]}))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(ds, "id", fr).take_all()
    counts = {}
    assign = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assign[r["id"]] = r["split"]
    # shares approximate the requested fractions
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # layout-independent: same assignment under a different partitioning
    ds2 = rd.from_arrow(pa.table({"id": [str(i) for i in range(2000)]})) \
        .repartition(7)
    out2 = hash_split(ds2, "id", fr).take_all()
    assert all(assign[r["id"]] == r["split"] for r in out2)
    import pytest
    with pytest.raises(ValueError):
        hash_split(ds, "id", {"a": 0.5, "b": 0.4})
    # null keys take the LAST split (the SQL CASE ELSE branch)
    dsn = rd.from_arrow(pa.table({"id": ["a", None, "b"]}))
    outn = hash_split(dsn, "id", fr).take_all()
    assert [r["split"] for r in outn if r["id"] is None] == ["test"]
