"""Distributed violations-sort fallback: above driver_sort_limit the
sorted output is streamed to parquet and must byte-match the driver-sort
path on the same corpus."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from rayskema.pipelines.validate import ValidateConfig, validate
from rayskema.schema import transcript_schema
from rayskema.testgen import write_fixture


def _read_spill(spill_dir: str) -> pa.Table:
    files = sorted(os.path.join(spill_dir, f)
                   for f in os.listdir(spill_dir) if f.endswith(".parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_spill_path_matches_driver_sort(ray_session, tmp_path):
    fixture = str(tmp_path / "corpus")
    write_fixture(fixture, 4000, corrupt=True)
    schema = transcript_schema(with_drift=False)
    kwargs = dict(manifest_path=os.path.join(fixture,
                                             "conversations.parquet"))

    ref = validate(os.path.join(fixture, "transcripts"), schema,
                   config=ValidateConfig(buckets=8), **kwargs)
    assert ref.violations_path is None
    assert ref.violations.num_rows > 0

    spill_dir = str(tmp_path / "spill")
    res = validate(os.path.join(fixture, "transcripts"), schema,
                   config=ValidateConfig(buckets=8, driver_sort_limit=0,
                                         spill_dir=spill_dir), **kwargs)
    assert res.violations_path == spill_dir
    assert res.violations.num_rows == 0          # not on the driver
    assert res.metrics["n_violations"] == ref.violations.num_rows

    spilled = _read_spill(spill_dir)
    assert spilled.schema.names == ref.violations.schema.names
    assert spilled.num_rows == ref.violations.num_rows
    # identical rows in identical (byte-stable) order
    assert spilled.cast(ref.violations.schema).equals(ref.violations)
    # verdict counts agree between the two paths
    assert res.verdicts.equals(ref.verdicts)


def test_manual_exchange_matches_sort_shuffle(ray_session, tmp_path):
    from rayskema.pipelines.validate import ValidateConfig, validate
    from rayskema.schema import transcript_schema
    from rayskema.testgen import write_fixture

    fixture = str(tmp_path / "corpus2")
    write_fixture(fixture, 4000, corrupt=True)
    schema = transcript_schema(with_drift=False)
    kwargs = dict(manifest_path=os.path.join(fixture,
                                             "conversations.parquet"))
    a = validate(os.path.join(fixture, "transcripts"), schema,
                 config=ValidateConfig(buckets=8, shuffle="sort"), **kwargs)
    b = validate(os.path.join(fixture, "transcripts"), schema,
                 config=ValidateConfig(buckets=8, shuffle="manual"),
                 **kwargs)
    assert b.violations.equals(a.violations)
    assert b.verdicts.equals(a.verdicts)
