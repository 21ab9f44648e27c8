"""JSONL ingest seam: read_jsonl reconciliation + end-to-end
jsonl -> parquet -> validate (reference raw-JSON entry, source.go)."""

import json
import os

import pyarrow as pa

import ray


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_jsonl_reconciles_schema(ray_session, tmp_path):
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import read_jsonl

    p = str(tmp_path / "a.jsonl")
    _write_jsonl(p, [
        {"conv_id": "conv_00000001", "turn_idx": 0, "role": "system",
         "text": "hi", "ts": "2023-11-14T22:13:20"},
        # missing role + extra key
        {"conv_id": "conv_00000001", "turn_idx": 1, "text": "yo",
         "debug": True, "ts": "2023-11-14T22:13:21"},
    ])
    ds = read_jsonl(p, transcript_schema())
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tab = pa.concat_tables(tabs)
    assert tab["turn_idx"].type == pa.int32()
    assert tab["role"].to_pylist() == ["system", None]
    assert "debug" in tab.column_names  # policy enforced by validator
    assert tab["ts"].type == pa.timestamp("us")


def test_jsonl_to_parquet_then_validate(ray_session, tmp_path):
    from rayskema.pipelines.validate import ValidateConfig, validate
    from rayskema.schema import transcript_schema
    from rayskema.sources.jsonl import jsonl_to_parquet

    p = str(tmp_path / "in.jsonl")
    rows = []
    for t in range(3):
        rows.append({"conv_id": "conv_00000007", "turn_idx": t,
                     "role": ["system", "user", "assistant"][t],
                     "text": f"turn {t}",
                     "ts": f"2023-11-14T22:13:2{t}"})
    rows.append({"conv_id": "conv_00000007", "turn_idx": 3, "role": "alien",
                 "text": "bad role", "ts": "2023-11-14T22:13:29"})
    _write_jsonl(p, rows)
    out = str(tmp_path / "parquet")
    jsonl_to_parquet(p, transcript_schema(), out)
    res = validate(out, transcript_schema(),
                   config=ValidateConfig(buckets=4, with_profile=False))
    codes = dict(zip(res.violations["code"].to_pylist(),
                     res.violations["rule"].to_pylist()))
    assert codes.get("invalid_enum") == "role_enum"
