"""Typed projection tests — mirrors the reference's bind_test.go /
reflect_utils key-resolution rules (rayskema tag > json tag > name,
'-' disables, defaults for absent columns, required absent raises)."""
from dataclasses import dataclass, field

import pyarrow as pa
import pytest

from rayskema.bind import bind_table, iter_bound, resolve_field_key


@dataclass
class Verdict:
    conv: str = field(metadata={"rayskema": "conv_id"})
    n: int = field(metadata={"json": "violation_count,omitempty"})
    ok: bool = True
    skipme: str = field(default="x", metadata={"json": "-"})


def test_key_resolution_priority():
    import dataclasses
    fs = {f.name: f for f in dataclasses.fields(Verdict)}
    assert resolve_field_key(fs["conv"]) == "conv_id"
    assert resolve_field_key(fs["n"]) == "violation_count"
    assert resolve_field_key(fs["ok"]) == "ok"
    assert resolve_field_key(fs["skipme"]) == "-"


def test_bind_table_rows_and_strip():
    tab = pa.table({
        "conv_id": ["a", "b"],
        "violation_count": pa.array([3, 0], type=pa.int64()),
        "ok": [False, True],
        "extra": ["ignored", "ignored"],
    })
    rows = bind_table(tab, Verdict)
    assert rows == [Verdict(conv="a", n=3, ok=False),
                    Verdict(conv="b", n=0, ok=True)]


def test_bind_default_for_absent_column_and_required_raises():
    tab = pa.table({"conv_id": ["a"],
                    "violation_count": pa.array([1], type=pa.int64())})
    rows = bind_table(tab, Verdict)
    assert rows[0].ok is True  # default kept

    @dataclass
    class Strict:
        conv_id: str
        missing_col: int

    with pytest.raises(KeyError):
        bind_table(tab, Strict)


def test_iter_bound_streams(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "conv_id": [f"c{i}" for i in range(10)],
        "violation_count": pa.array(range(10), type=pa.int64()),
        "ok": [True] * 10,
    }))
    rows = list(iter_bound(ds, Verdict, batch_size=3))
    assert len(rows) == 10
    assert {r.conv for r in rows} == {f"c{i}" for i in range(10)}


def test_disabled_field_without_default_rejected():
    import dataclasses
    import pytest

    @dataclasses.dataclass
    class Bad:
        a: str = dataclasses.field(metadata={"json": "-"})

    tab = pa.table({"a": ["x"]})
    with pytest.raises(TypeError, match="disabled with tag"):
        bind_table(tab, Bad)
