"""End-to-end pipeline tests over the synthetic transcript fixtures
(FIXTURES.md): golden violation match, clean-pass, drift detection,
text-equality invariant, determinism across parallelism."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from rayskema.pipelines.validate import (
    ValidateConfig, normalize_dataset, validate,
)
from rayskema.schema import transcript_schema
from rayskema.state.sketches import ColumnProfile


def load_profile(d):
    with open(os.path.join(d, "baseline_profile.bin"), "rb") as f:
        return ColumnProfile.from_bytes(f.read())


def run_validate(d, **cfg_kwargs):
    return validate(
        os.path.join(d, "transcripts"), transcript_schema(),
        manifest_path=os.path.join(d, "conversations.parquet"),
        baseline_profile=load_profile(d),
        config=ValidateConfig(**cfg_kwargs))


def test_clean_fixture_passes(ray_session, fixture_clean):
    res = run_validate(fixture_clean, buckets=8)
    assert res.violations.num_rows == 0
    assert all(d["passed"] for d in res.drift)
    assert res.passed
    assert bool(pc.all(res.verdicts["passed"]).as_py())
    # HLL distinct-conv estimate within 5%
    n_conv = pq.read_table(
        os.path.join(fixture_clean, "conversations.parquet")).num_rows
    est = res.metrics["distinct_keys_estimate"]
    assert abs(est - n_conv) / n_conv < 0.05


def test_corrupt_fixture_matches_golden(ray_session, fixture_corrupt):
    res = run_validate(fixture_corrupt, buckets=16)
    got = res.violations.select(["conv_id", "turn_idx", "path", "code",
                                 "rule"])
    exp = pq.read_table(
        os.path.join(fixture_corrupt, "violations_expected.parquet"))
    sort = [("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("path", "ascending"), ("code", "ascending"),
            ("rule", "ascending")]
    got = got.take(pc.sort_indices(got, sort_keys=sort,
                                   null_placement="at_start"))
    exp = exp.take(pc.sort_indices(exp, sort_keys=sort,
                                   null_placement="at_start"))
    assert got.num_rows == exp.num_rows
    got = got.cast(exp.schema)
    assert got.equals(exp), "violations differ from golden oracle"
    # drift must NOT fire from 2% corruption
    assert all(d["passed"] for d in res.drift)
    # partition verdicts reconcile with the violation rows
    assert not all(res.verdicts["passed"].to_pylist())
    assert (sum(res.verdicts["violation_count"].to_pylist())
            == res.violations.num_rows)


def test_chunked_fixture_matches_golden(ray_session, tmp_path):
    """The memory-bounded chunked fixture writer (large corpora are
    generated in disjoint conversation ranges) must produce a corpus
    whose validation output still equals its own golden expected file
    — specials once, mutations and manifests merged across chunks."""
    from rayskema.testgen import write_fixture

    d = str(tmp_path / "chunked")
    info = write_fixture(d, 30_000, corrupt=True, chunk_turns=10_000)
    assert info["rows"] >= 30_000
    shards = os.listdir(os.path.join(d, "transcripts"))
    assert any(s.endswith("-c02.parquet") for s in shards), shards
    assert shards.count("part-overflow.parquet") == 1  # specials once
    res = run_validate(d, buckets=16)
    got = res.violations.select(["conv_id", "turn_idx", "path", "code",
                                 "rule"])
    exp = pq.read_table(os.path.join(d, "violations_expected.parquet"))
    sort = [("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("path", "ascending"), ("code", "ascending"),
            ("rule", "ascending")]
    got = got.take(pc.sort_indices(got, sort_keys=sort,
                                   null_placement="at_start"))
    exp = exp.take(pc.sort_indices(exp, sort_keys=sort,
                                   null_placement="at_start"))
    assert got.num_rows == exp.num_rows
    assert got.cast(exp.schema).equals(exp)
    assert all(dr["passed"] for dr in res.drift)


def test_drifted_fixture_fails_drift(ray_session, fixture_drifted,
                                     fixture_clean):
    # validate DRIFTED data against the CLEAN baseline profile
    res = validate(
        os.path.join(fixture_drifted, "transcripts"), transcript_schema(),
        manifest_path=os.path.join(fixture_drifted, "conversations.parquet"),
        baseline_profile=load_profile(fixture_clean),
        config=ValidateConfig(buckets=8))
    failed = {d["rule"] for d in res.drift if not d["passed"]}
    assert "text_len_ks_drift" in failed
    assert "role_psi_drift" in failed
    codes = set(res.violations["code"].to_pylist())
    assert "aggregate_violation" in codes


def test_clean_other_seed_passes_drift(ray_session, fixture_clean,
                                       tmp_path):
    # FIXTURES.md §4: clean regeneration with a different seed must pass
    from rayskema.testgen import write_fixture

    d = str(tmp_path / "clean2")
    write_fixture(d, 8000, seed=1234)
    res = validate(
        os.path.join(d, "transcripts"), transcript_schema(),
        manifest_path=os.path.join(d, "conversations.parquet"),
        baseline_profile=load_profile(fixture_clean),
        config=ValidateConfig(buckets=8))
    assert all(dd["passed"] for dd in res.drift)


def test_text_equality_invariant(ray_session, fixture_clean):
    # canonical output reproduces every text byte-for-byte under stable
    # (conv_id, turn_idx) order (north rule invariant)
    from rayskema.testgen import gen_clean

    ds = normalize_dataset(os.path.join(fixture_clean, "transcripts"),
                           transcript_schema())
    out = pa.concat_tables(
        [t.select(["conv_id", "turn_idx", "text"])
         for t in __import__("ray").get(ds.to_arrow_refs())])
    out = out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ref = gen_clean(8000).select(["conv_id", "turn_idx", "text"])
    assert out.num_rows == ref.num_rows
    assert pc.all(pc.equal(out["text"], ref["text"])).as_py()


def test_determinism_across_parallelism(ray_session, fixture_corrupt):
    # identical violation bytes at different parallelism/bucketing
    r1 = run_validate(fixture_corrupt, buckets=4, batch_size=1024)
    # actor-pool variant: concurrency strictly below the session's CPU
    # count so the read stage isn't starved (pool reserves its CPUs)
    r2 = run_validate(fixture_corrupt, buckets=32, concurrency=2)
    b1 = r1.violations
    b2 = r2.violations
    assert b1.num_rows == b2.num_rows
    assert b1.equals(b2), "violation output not deterministic"
    # verdict partitioning is a config choice (4 vs 32 buckets); the
    # totals must still reconcile identically
    assert (sum(r1.verdicts["violation_count"].to_pylist())
            == sum(r2.verdicts["violation_count"].to_pylist())
            == b1.num_rows)


def test_validate_empty_input(ray_session, tmp_path):
    """No input files => empty passing result, not a crash."""
    from rayskema.pipelines.validate import ValidateConfig, validate
    from rayskema.schema import transcript_schema

    d = tmp_path / "empty"
    d.mkdir()
    res = validate(str(d), transcript_schema(),
                   config=ValidateConfig(buckets=4))
    assert res.violations.num_rows == 0
    assert res.passed


def test_curation_end_to_end(ray_session, tmp_path):
    """The full curation path a reference user runs: signal scoring ->
    keep policy -> resumable hive-partitioned output, end to end on a
    small corpus."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayskema.functions.dedup import exact_duplicates
    from rayskema.functions.textstats import lang_id, token_stats
    from rayskema.pipelines.relational import hash_join
    from rayskema.sources.parquet_sink import write_parquet_partitioned

    texts = ["the cat and the hat", "el gato y la casa",
             "the cat and the hat", "der hund und das haus",
             "zzz qqq xxx", "the dog in the fog"]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)})
    ds = rd.from_arrow(docs).repartition(2).materialize()

    toks = token_stats(ds, "text", "doc_id") \
        .select_columns(["doc_id", "n_tokens"])
    lang = lang_id(ds, "text", "doc_id") \
        .select_columns(["doc_id", "pred_lang"])
    dups = exact_duplicates(ds, ["text"], "doc_id", buckets=2) \
        .select_columns(["doc_id", "keeper"])
    card = hash_join(toks, lang, on=["doc_id"], how="inner", buckets=2)
    card = hash_join(card, dups, on=["doc_id"], how="left_outer",
                     buckets=2)
    kept = card.map_batches(
        lambda t: t.filter(pc.and_(
            pc.invert(pc.is_valid(t["keeper"])),
            pc.not_equal(t["pred_lang"], "und"))),
        batch_format="pyarrow").select_columns(
            ["doc_id", "n_tokens", "pred_lang"])

    out = str(tmp_path / "curated")
    res = {r["value"]: r["rows"] for r in write_parquet_partitioned(
        kept, out, "pred_lang", buckets=2).take_all()}
    # doc 2 is an exact dup of 0; doc 4 is language-unknown
    assert res == {"en": 2, "es": 1, "de": 1}
    got = pq.read_table(os.path.join(out, "pred_lang=en",
                                     "part.parquet"))
    assert sorted(got["doc_id"].to_pylist()) == [0, 5]
