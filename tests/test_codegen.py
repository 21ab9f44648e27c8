"""Ahead-of-time compiled validator parity (reference `goskema
compile`, cmd/goskema/main.go:23-38 + internal/gen/render.go):
the generated module's validate_batch must be bit-identical to the
interpreted ConstraintPlan over the same schema."""
import importlib.util
import os
import subprocess
import sys

import pyarrow as pa
import pytest

from rayskema.codegen import compile_schema, generate_module, render_dtype
from rayskema.plan import ConstraintPlan
from rayskema.schema import (
    ByteBounds, Column, CrossFieldRule, Enum, LenBounds, NonNull, Range,
    Regex, StructField, TableSchema, Unknown, transcript_schema,
)


def _mixed_schema() -> TableSchema:
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.int64())])
    return TableSchema(
        columns=(
            Column("conv_id", pa.string(), nullable=False,
                   constraints=(NonNull(rule="nn"),
                                Regex(rule="fmt", pattern=r"c-\d+"))),
            Column("turn_idx", pa.int32(), constraints=(
                Range(rule="rng", min=0, max=1000),)),
            Column("role", pa.string(), constraints=(
                Enum(rule="enum", values=("user", "assistant", "tool")),
            )),
            Column("text", pa.string(), constraints=(
                LenBounds(rule="len", min_len=1, max_len=50),
                ByteBounds(rule="cap", max_bytes=55),
            )),
            Column("meta", meta_t, constraints=(
                StructField(path=("score",),
                            constraint=Range(rule="sub", min=0)),
            )),
        ),
        key_columns=("conv_id", "turn_idx"),
        unknown=Unknown.STRIP,
        rules=(CrossFieldRule(
            rule="xf", when={"op": "eq", "col": "role", "value": "tool"},
            expect={"op": "not_null", "col": "text"}),),
        name="mixed",
    )


def _bad_batch() -> pa.Table:
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.int64())])
    return pa.table({
        "conv_id": pa.array(["c-1", "zzz", None, "c-4", "c-5"]),
        "turn_idx": pa.array([0, -3, 2, 2000, 4], type=pa.int32()),
        "role": pa.array(["user", "robot", "tool", "assistant", "tool"]),
        "text": pa.array(["ok", "", "x" * 60, "fine", None]),
        "meta": pa.array(
            [{"lang": "en", "score": 1}, {"lang": "fr", "score": -2},
             None, {"lang": "de", "score": 3}, {"lang": "es", "score": 0}],
            type=meta_t),
    })


def _import_generated(path, name="genmod_test"):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generated_module_matches_interpreted(tmp_path):
    s = _mixed_schema()
    out = tmp_path / "gen_mixed.py"
    src = compile_schema(s, str(out))
    assert "DO NOT EDIT" in src
    mod = _import_generated(str(out))
    # the regenerated schema literal reconstructs the declaration
    assert mod.SCHEMA.schema_hash() == s.schema_hash()
    plan = ConstraintPlan(s)
    batch = _bad_batch()
    got = mod.validate_batch(batch)
    want = plan.validate(batch)
    assert got.equals(want), (got.to_pylist(), want.to_pylist())
    # every specialized family fired at least once in the fixture
    codes = set(got["code"].to_pylist())
    assert {"required", "pattern", "too_small", "too_big",
            "invalid_enum", "too_short", "too_long",
            "truncated"} <= codes


def test_generated_checks_are_specialized(tmp_path):
    """The hot flat checks are real generated source (constants
    folded), not delegation — and unsupported checks fall back."""
    s = _mixed_schema()
    src = generate_module(s)
    assert "def _check_0" in src            # NonNull generated
    assert "'^(?:c-\\\\d+)$'" in src or "c-\\\\d+" in src  # anchored pat
    assert "_ENUM_" in src                  # enum value set hoisted
    # StructField (index 6) stays interpreted: no generated fn for it
    assert "_CHECKS[6]" not in src


def test_generated_is_deterministic():
    s = _mixed_schema()
    assert generate_module(s) == generate_module(s)


def test_generated_validate_dataset(ray_session, tmp_path):
    import ray.data as rd
    s = _mixed_schema()
    out = tmp_path / "gen_ds.py"
    compile_schema(s, str(out))
    mod = _import_generated(str(out), "genmod_ds")
    ds = rd.from_arrow(_bad_batch())
    got = pa.concat_tables(
        [t for t in __import__("ray").get(
            mod.validate_dataset(ds).to_arrow_refs()) if t.num_rows])
    want = ConstraintPlan(s).validate(_bad_batch())
    assert got.num_rows == want.num_rows


def test_transcript_schema_generates(tmp_path):
    """The built-in flagship schema round-trips through codegen."""
    s = transcript_schema()
    out = tmp_path / "gen_transcript.py"
    compile_schema(s, str(out))
    mod = _import_generated(str(out), "genmod_transcript")
    assert mod.SCHEMA.schema_hash() == s.schema_hash()


def test_render_dtype_dates_and_floats():
    """str(pa.date32()) is 'date32[day]' — the renderer must still
    produce the bare constructor (regression: dates raised
    NotImplementedError)."""
    assert render_dtype(pa.date32()) == "pa.date32()"
    assert render_dtype(pa.date64()) == "pa.date64()"
    assert render_dtype(pa.float16()) == "pa.float16()"
    assert render_dtype(pa.float32()) == "pa.float32()"
    assert render_dtype(pa.float64()) == "pa.float64()"


def test_date_column_schema_generates(tmp_path):
    s = TableSchema(
        columns=(Column("k", pa.string(), nullable=False,
                        constraints=(NonNull(rule="nn"),)),
                 Column("d", pa.date32()),
                 Column("d64", pa.date64())),
        key_columns=("k",), unknown=Unknown.STRIP, name="dated")
    out = tmp_path / "gen_dated.py"
    compile_schema(s, str(out))
    mod = _import_generated(str(out), "genmod_dated")
    assert mod.SCHEMA.schema_hash() == s.schema_hash()


def test_stale_generated_module_fails_loudly(tmp_path):
    """The positional _CHECKS patches are guarded: a module generated
    against a different plan layout must refuse to import rather than
    silently swapping checks."""
    import re
    s = _mixed_schema()
    src = generate_module(s)
    tampered = re.sub(r"len\(_CHECKS\) != (\d+)",
                      lambda m: f"len(_CHECKS) != {int(m.group(1)) + 1}",
                      src, count=1)
    assert tampered != src
    out = tmp_path / "gen_stale.py"
    out.write_text(tampered)
    with pytest.raises(ImportError, match="stale"):
        _import_generated(str(out), "genmod_stale")


def test_cli_gen(tmp_path):
    out = tmp_path / "gen_cli.py"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "rayskema", "gen", "--out", str(out)],
        capture_output=True, text=True, cwd=repo_root)
    assert r.returncode == 0, r.stderr
    assert out.exists()
    import json
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["schema"] and info["schema_hash"]
