"""Hot-conversation salting (north rule "salted repartitioning"):
salted runs must produce byte-identical violations to unsalted runs —
the two-level reduce is a pure execution-strategy change."""

import os

import pyarrow.compute as pc
import pytest

from rayskema.pipelines.validate import ValidateConfig, validate
from rayskema.schema import transcript_schema
from rayskema.state.sketches import ColumnProfile


@pytest.fixture(scope="module")
def env(ray_session, fixture_corrupt):
    d = fixture_corrupt
    with open(os.path.join(d, "baseline_profile.bin"), "rb") as f:
        baseline = ColumnProfile.from_bytes(f.read())
    return d, dict(manifest_path=os.path.join(d, "conversations.parquet"),
                   baseline_profile=baseline)


def test_salted_equals_unsalted(env):
    d, kwargs = env
    plain = validate(os.path.join(d, "transcripts"), transcript_schema(),
                     config=ValidateConfig(buckets=8), **kwargs)
    # fixture's hot conversation has ~50x median turns; threshold 64
    # forces it (and only it) through the salted path
    salted = validate(os.path.join(d, "transcripts"), transcript_schema(),
                      config=ValidateConfig(buckets=8, salt_threshold=64),
                      **kwargs)
    assert salted.violations.equals(plain.violations)
    assert plain.violations.num_rows > 0


def test_salting_actually_splits(env):
    """The hot conversation must span multiple buckets under salting
    (otherwise the test above proves nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from rayskema.pipelines.validate import (
        _group_rule_columns, inspect_files, make_key_normalizer,
    )

    d, kwargs = env
    schema = transcript_schema()
    files = sorted(
        os.path.join(d, "transcripts", f)
        for f in os.listdir(os.path.join(d, "transcripts")))
    groups, _ = inspect_files(files, schema)
    man = pq.read_table(kwargs["manifest_path"])
    hot = man.filter(pc.greater(man["n_turns"], 64))["conv_id"]
    assert len(hot) >= 1
    hot_ref = ray.put(hot.combine_chunks())
    g = groups[0]
    cols = [c for c in _group_rule_columns(schema) if c in g.read_columns]
    ds = rd.read_parquet(g.files, columns=cols).map_batches(
        make_key_normalizer(schema, cols, 8, hot_ref=hot_ref, salt_span=64),
        batch_format="pyarrow")
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    full = pa.concat_tables(tabs)
    hot_id = hot[0].as_py()
    hot_rows = full.filter(pc.equal(full["conv_id"], hot_id))
    n_buckets = len(pc.unique(hot_rows["bucket"]))
    assert n_buckets > 1
    assert pc.all(hot_rows["salted"]).as_py()


def test_checkpointed_salted_equals_unsalted(env, tmp_path):
    """Salting works through the resumable runner too: identical final
    violations with and without salting."""
    from rayskema.pipelines.checkpoint import run_checkpointed
    import pyarrow.parquet as pq

    d, kwargs = env
    plain = run_checkpointed(
        os.path.join(d, "transcripts"), transcript_schema(),
        str(tmp_path / "plain"), config=ValidateConfig(buckets=8), **kwargs)
    salted = run_checkpointed(
        os.path.join(d, "transcripts"), transcript_schema(),
        str(tmp_path / "salted"),
        config=ValidateConfig(buckets=8, salt_threshold=64), **kwargs)
    a = pq.read_table(plain.violations_path)
    b = pq.read_table(salted.violations_path)
    assert a.equals(b)
    assert a.num_rows > 0
