"""Checkpoint/resume: interrupted runs resume to byte-identical output.

Reference analogue: none (single-process library) — this is the north
rule's "resumable from per-partition checkpoints carrying lineage"
requirement; test strategy per SURVEY §5(d)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayskema.pipelines.checkpoint import run_checkpointed
from rayskema.pipelines.validate import ValidateConfig, validate
from rayskema.schema import transcript_schema
from rayskema.state.sketches import ColumnProfile


@pytest.fixture(scope="module")
def ckpt_env(ray_session, fixture_corrupt, tmp_path_factory):
    d = fixture_corrupt
    with open(os.path.join(d, "baseline_profile.bin"), "rb") as f:
        baseline = ColumnProfile.from_bytes(f.read())
    kwargs = dict(
        manifest_path=os.path.join(d, "conversations.parquet"),
        baseline_profile=baseline,
        config=ValidateConfig(buckets=8),
    )
    return d, kwargs, tmp_path_factory


def test_full_run_matches_direct_validate(ckpt_env):
    d, kwargs, tmpf = ckpt_env
    out = str(tmpf.mktemp("ckpt") / "full")
    res = run_checkpointed(os.path.join(d, "transcripts"),
                           transcript_schema(), out, **kwargs)
    assert res.run_manifest["complete"]
    direct = validate(os.path.join(d, "transcripts"), transcript_schema(),
                      **kwargs)
    got = pq.read_table(res.violations_path)
    assert got.equals(direct.violations)


def test_sort_shuffle_matches_manual(ckpt_env):
    d, kwargs, tmpf = ckpt_env
    out = str(tmpf.mktemp("ckpt") / "sort")
    sort_kwargs = dict(kwargs,
                       config=ValidateConfig(buckets=8, shuffle="sort"))
    res = run_checkpointed(os.path.join(d, "transcripts"),
                           transcript_schema(), out, **sort_kwargs)
    assert res.run_manifest["complete"]
    direct = validate(os.path.join(d, "transcripts"), transcript_schema(),
                      **kwargs)
    assert pq.read_table(res.violations_path).equals(direct.violations)


def test_interrupt_then_resume_identical(ckpt_env):
    d, kwargs, tmpf = ckpt_env
    out_a = str(tmpf.mktemp("ckpt") / "interrupted")
    out_b = str(tmpf.mktemp("ckpt") / "fresh")

    # interrupted: only 3 stage-1 partitions complete
    partial = run_checkpointed(os.path.join(d, "transcripts"),
                               transcript_schema(), out_a,
                               max_stage1_partitions=3, **kwargs)
    assert not partial.run_manifest["complete"]
    assert partial.run_manifest["stage1_done"] == 3
    n_manifests = len([f for f in os.listdir(os.path.join(out_a, "checkpoints"))
                       if f.startswith("p1-") and f.endswith(".json")])
    assert n_manifests == 3

    # resume: completes the rest, skipping finished partitions
    resumed = run_checkpointed(os.path.join(d, "transcripts"),
                               transcript_schema(), out_a, **kwargs)
    assert resumed.run_manifest["complete"]

    fresh = run_checkpointed(os.path.join(d, "transcripts"),
                             transcript_schema(), out_b, **kwargs)
    a = pq.read_table(resumed.violations_path)
    b = pq.read_table(fresh.violations_path)
    assert a.equals(b)
    assert a.num_rows > 0


def test_rerun_completed_is_noop(ckpt_env):
    d, kwargs, tmpf = ckpt_env
    out = str(tmpf.mktemp("ckpt") / "noop")
    first = run_checkpointed(os.path.join(d, "transcripts"),
                             transcript_schema(), out, **kwargs)
    # mutate nothing; rerun must produce identical run manifest + output
    again = run_checkpointed(os.path.join(d, "transcripts"),
                             transcript_schema(), out, **kwargs)
    assert again.run_manifest["complete"]
    assert first.run_manifest["n_violations"] == \
        again.run_manifest["n_violations"]


def test_manifest_lineage_fields(ckpt_env):
    d, kwargs, tmpf = ckpt_env
    out = str(tmpf.mktemp("ckpt") / "lineage")
    run_checkpointed(os.path.join(d, "transcripts"), transcript_schema(),
                     out, **kwargs)
    ck = os.path.join(out, "checkpoints")
    p1 = sorted(f for f in os.listdir(ck) if f.startswith("p1-"))
    with open(os.path.join(ck, p1[0])) as f:
        man = json.load(f)
    for field in ("input_file", "rows", "row_range", "schema_hash",
                  "violation_count", "sketch_b64", "wall_sec"):
        assert field in man, field
    assert man["complete"]


def test_resume_after_input_shrink_ignores_stale_partitions(ckpt_env):
    """Review finding: finalize must not merge stale partition outputs
    when the input file set shrinks between resumes."""
    import shutil

    d, kwargs, tmpf = ckpt_env
    src = os.path.join(d, "transcripts")
    work = str(tmpf.mktemp("shrink") / "in")
    shutil.copytree(src, work)
    out = str(tmpf.mktemp("shrink") / "ckpt")
    run_checkpointed(work, transcript_schema(), out, **kwargs)
    files = sorted(os.listdir(work))
    os.remove(os.path.join(work, files[-1]))
    resumed = run_checkpointed(work, transcript_schema(), out, **kwargs)
    fresh_dir = str(tmpf.mktemp("shrink") / "fresh")
    fresh = run_checkpointed(work, transcript_schema(), fresh_dir, **kwargs)
    a = pq.read_table(resumed.violations_path)
    b = pq.read_table(fresh.violations_path)
    assert a.equals(b)
