"""Checkpointed, resumable validation runs.

North-rule requirement (BASELINE.json): "resumable from per-partition
checkpoints carrying lineage (input files, row ranges, sketch state)
and metrics".  The reference has no analogue (single-process library);
the design follows standard task-commit practice:

- **Stage 1** (batch-local checks + sketch partials): the unit of work
  is one input file.  Each completed file commits
  ``violations/p1-<id>.parquet`` (written to ``.tmp`` then renamed —
  idempotent under retry) and a manifest
  ``checkpoints/p1-<id>.json`` carrying lineage: input file, row
  count, schema hash, violation count, serialized sketch partial,
  wall time.  A resumed run skips files whose manifest is complete.
- **Stage 2** (conv_id-hash shuffle for cross-partition checks): the
  unit of work is one hash bucket.  Completed buckets are recorded in
  ``checkpoints/p2-<bucket>.json``; a resumed run filters the keys
  Dataset to the remaining buckets BEFORE the shuffle, so finished
  buckets move zero bytes.
- **Finalize**: merge sketch partials from the stage-1 manifests
  (associative, any order), evaluate drift, write the sorted global
  violations file, per-partition verdicts and ``run.json``.

Scale notes: one manifest per input file / bucket is tiny JSON on the
driver; at 10^12 rows the driver holds O(files + buckets) manifests,
not data.  Stage-1 files process in parallel inside ONE Ray Dataset
job (files → blocks), not one job per file.
"""

from __future__ import annotations

import base64
import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..issues import (
    AGGREGATE_VIOLATION, canon_params, column_path, empty_violations,
    schema_level_violation, sort_violations, violations_schema,
)
from ..plan import BatchValidator, combined_schema
from ..schema import DriftRule, TableSchema
from ..state.sketches import ColumnProfile
from .validate import (
    BucketChecker, ValidateConfig, build_verdicts, _discover,
    _group_rule_columns, has_group_rules, inspect_files,
    make_key_normalizer, merge_salt_partials,
)


def _atomic_write_parquet(tab: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _load_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            m = json.load(f)
        return m if m.get("complete") else None
    except (json.JSONDecodeError, OSError):
        return None  # torn write => redo


@dataclass
class RunResult:
    violations_path: str
    verdicts_path: str
    run_manifest: dict


def run_checkpointed(
    paths,
    schema: TableSchema,
    out_dir: str,
    *,
    manifest_path: str | None = None,
    baseline_profile: ColumnProfile | None = None,
    config: ValidateConfig | None = None,
    max_stage1_partitions: int | None = None,  # test hook: stop early
) -> RunResult:
    """Run (or resume) a checkpointed validation. Re-invoking with the
    same ``out_dir`` skips completed partitions; output is identical to
    an uninterrupted run (asserted by tests)."""
    import hashlib

    cfg = config or ValidateConfig()
    files = _discover(paths)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    viol_dir = os.path.join(out_dir, "violations")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(viol_dir, exist_ok=True)
    schema_hash = schema.schema_hash()
    # fingerprint of the WHOLE input set AND the partitioning config:
    # stage-2 (cross-partition) results depend on every file and on the
    # hash%buckets layout + salting, so its checkpoints are only valid
    # for the exact same input set and config — any add/remove/rewrite
    # or bucket-count change invalidates them
    input_sig = hashlib.sha256((";".join(
        f"{f}:{os.path.getsize(f)}:{os.stat(f).st_mtime_ns}"
        for f in sorted(files))
        + f";buckets={cfg.buckets};salt={cfg.salt_threshold}"
    ).encode()).hexdigest()[:16]

    # ---- stage 1: per-file batch-local checks + sketch partials ---------
    groups, file_viols = inspect_files(files, schema)
    read_cols = {}
    for g in groups:
        for f in g.files:
            read_cols[f] = g.read_columns
    todo = []
    for i, f in enumerate(sorted(files)):
        man = _load_manifest(os.path.join(ckpt_dir, f"p1-{i:05d}.json"))
        st = os.stat(f)
        # a file rewritten in place (same path, new size/mtime) must
        # NOT reuse its stage-1 checkpoint
        if man is not None and man.get("schema_hash") == schema_hash \
                and man.get("input_file") == f \
                and man.get("input_size") == st.st_size \
                and man.get("input_mtime_ns") == st.st_mtime_ns:
            continue
        todo.append((i, f))
    if max_stage1_partitions is not None:
        todo = todo[:max_stage1_partitions]

    if todo:
        _run_stage1(todo, read_cols, schema, cfg, ckpt_dir, viol_dir,
                    schema_hash)

    done_p1 = []
    for i, f in enumerate(sorted(files)):
        man = _load_manifest(os.path.join(ckpt_dir, f"p1-{i:05d}.json"))
        if man is not None:
            done_p1.append(man)
    stage1_complete = len(done_p1) == len(files)

    # ---- stage 2: bucketed cross-partition checks -----------------------
    def _p2_valid(b: int) -> bool:
        man = _load_manifest(os.path.join(ckpt_dir, f"p2-{b:05d}.json"))
        return man is not None and man.get("input_sig") == input_sig \
            and man.get("schema_hash") == schema_hash

    stage2_complete = True
    if has_group_rules(schema) and stage1_complete:
        remaining = [b for b in range(cfg.buckets) if not _p2_valid(b)]
        if remaining:
            _run_stage2(groups, schema, cfg, ckpt_dir, viol_dir,
                        manifest_path, remaining, schema_hash, input_sig)
        stage2_complete = all(_p2_valid(b) for b in range(cfg.buckets))
    elif has_group_rules(schema):
        stage2_complete = False

    if not (stage1_complete and stage2_complete):
        run_man = {
            "complete": False, "schema_hash": schema_hash,
            "stage1_done": len(done_p1), "stage1_total": len(files),
            "stage2_complete": stage2_complete,
        }
        _atomic_write_json(run_man, os.path.join(out_dir, "run.json"))
        return RunResult("", "", run_man)

    # ---- finalize -------------------------------------------------------
    profile = None
    for man in done_p1:
        if man.get("sketch_b64"):
            part = ColumnProfile.from_bytes(
                base64.b64decode(man["sketch_b64"]))
            profile = part if profile is None else profile.merge(part)

    key_fields = schema.key_fields()
    vtabs = [file_viols] if file_viols.num_rows else []
    partial_tabs = []
    # only the CURRENT run's partitions — never os.listdir the whole
    # dir: a shrunk input set or bucket count between resumes would
    # leave stale p1-/p2- outputs that must not be merged
    expected = [f"p1-{i:05d}.parquet" for i in range(len(files))] + \
               [f"p2-{b:05d}.parquet" for b in range(cfg.buckets)]
    for name in expected:
        path = os.path.join(viol_dir, name)
        if os.path.exists(path):
            t = pq.read_table(path)
            if not t.num_rows:
                continue
            t = t.cast(violations_schema(key_fields))
            is_partial = pc.equal(t["rule"], "__salt_partial__")
            if pc.any(is_partial).as_py():
                partial_tabs.append(t.filter(is_partial))
                t = t.filter(pc.invert(is_partial))
            if t.num_rows:
                vtabs.append(t)
    if partial_tabs:
        manifest = pq.read_table(manifest_path) if manifest_path and \
            os.path.exists(manifest_path) else None
        vtabs += merge_salt_partials(pa.concat_tables(partial_tabs),
                                     schema, manifest)

    drift = []
    drules = schema.rules_of(DriftRule)
    if drules and baseline_profile is not None and profile is not None:
        from ..functions.drift import drift_report
        drift = drift_report(baseline_profile, profile, drules)
        for d in drift:
            if not d["passed"]:
                vtabs.append(schema_level_violation(
                    key_fields, column_path(d["column"]),
                    AGGREGATE_VIOLATION, d["rule"],
                    f"distribution drift: {d['kind']} over threshold",
                    canon_params({"value": round(d["value"], 6),
                                  "threshold": d["threshold"],
                                  "kind": d["kind"]})))

    violations = pa.concat_tables(vtabs) if vtabs \
        else empty_violations(key_fields)
    violations = sort_violations(violations, schema.key_columns)
    vpath = os.path.join(out_dir, "violations.parquet")
    _atomic_write_parquet(violations, vpath)

    verdicts = build_verdicts(violations, schema, n_partitions=cfg.buckets)
    vdpath = os.path.join(out_dir, "verdicts.parquet")
    _atomic_write_parquet(verdicts, vdpath)

    run_man = {
        "complete": True, "schema_hash": schema_hash,
        "n_files": len(files), "buckets": cfg.buckets,
        "n_violations": violations.num_rows,
        "rows_validated": profile.row_count if profile else None,
        "drift": drift,
        "passed": violations.num_rows == 0,
    }
    _atomic_write_json(run_man, os.path.join(out_dir, "run.json"))
    return RunResult(vpath, vdpath, run_man)


def _run_stage1(todo, read_cols, schema, cfg, ckpt_dir, viol_dir,
                schema_hash) -> None:
    """One Ray Dataset job over all remaining files; per-file commit.

    Each file reads as its own dataset fragment carrying a partition id
    column, so violation rows and sketch partials can be committed per
    file after the single parallel pass."""
    out_schema = combined_schema(schema)

    @ray.remote(num_cpus=1)
    def _one_file(pid: int, path: str, cols) -> dict:
        t0 = time.time()
        st = os.stat(path)   # lineage BEFORE the read (no write race)
        tab = pq.read_table(path, columns=list(cols))
        validator = BatchValidator(schema)
        combined = validator(tab)
        is_v = pc.equal(combined["kind"], "v")
        viols = combined.filter(is_v).drop_columns(["kind", "payload"])
        sketch_b64 = ""
        spay = combined.filter(pc.equal(combined["kind"], "s"))["payload"]
        if len(spay):
            sketch_b64 = base64.b64encode(spay[0].as_py()).decode()
        _atomic_write_parquet(
            viols, os.path.join(viol_dir, f"p1-{pid:05d}.parquet"))
        man = {
            "complete": True, "partition": f"p1-{pid:05d}",
            "input_file": path, "rows": tab.num_rows,
            "input_size": st.st_size, "input_mtime_ns": st.st_mtime_ns,
            "row_range": [0, tab.num_rows],
            "schema_hash": schema_hash,
            "violation_count": viols.num_rows,
            "sketch_b64": sketch_b64,
            "wall_sec": round(time.time() - t0, 3),
        }
        _atomic_write_json(man, os.path.join(ckpt_dir, man["partition"] + ".json"))
        return man

    # files are independent tasks — Ray schedules them across the
    # cluster; block size within a file is bounded by row groups at
    # write time (TB-scale shards should be row-group-sized ~128MB)
    ray.get([_one_file.remote(pid, f, read_cols.get(f, []))
             for pid, f in todo])


def _run_stage2(groups, schema, cfg, ckpt_dir, viol_dir, manifest_path,
                remaining, schema_hash, input_sig) -> None:
    key_cols = _group_rule_columns(schema)
    from .validate import launch_manifest_split

    manifest = None
    manifest_ref = None
    if manifest_path and os.path.exists(manifest_path):
        # read+hash-split in a worker (driver-side first-touch page
        # faults cost seconds on this VM class); per-bucket
        # driver-owned task-return refs
        manifest_ref = launch_manifest_split(
            manifest_path, schema.key_columns[0], cfg.buckets)
        if cfg.salt_threshold:
            manifest = pq.read_table(manifest_path)
    hot_ref = None
    salt_span = 0
    if cfg.salt_threshold and manifest is not None \
            and "n_turns" in manifest.column_names:
        hot = manifest.filter(pc.greater(
            manifest["n_turns"], cfg.salt_threshold))[schema.key_columns[0]]
        if len(hot):
            hot_ref = ray.put(hot.combine_chunks())
            salt_span = cfg.salt_threshold
    parts = []
    for g in groups:
        cols = [c for c in key_cols if c in g.read_columns]
        if cols:
            parts.append(rd.read_parquet(g.files, columns=cols))
    if not parts:
        for b in remaining:
            _atomic_write_json({"complete": True, "bucket": b,
                                "schema_hash": schema_hash,
                                "input_sig": input_sig},
                               os.path.join(ckpt_dir, f"p2-{b:05d}.json"))
        return
    keys_ds = parts[0]
    for p in parts[1:]:
        keys_ds = keys_ds.union(p)
    keys_ds = keys_ds.map_batches(
        make_key_normalizer(schema, key_cols, cfg.buckets,
                            hot_ref=hot_ref, salt_span=salt_span),
        batch_format="pyarrow")
    remaining_set = set(remaining)
    rem_arr = pa.array(sorted(remaining_set), type=pa.int32())
    keys_ds = keys_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=rem_arr)),
        batch_format="pyarrow")
    checker = BucketChecker(schema, manifest_ref, salt_span=salt_span)

    def _commit(bucket: int, n_rows: int, viols: pa.Table) -> None:
        _atomic_write_parquet(
            viols, os.path.join(viol_dir, f"p2-{bucket:05d}.parquet"))
        _atomic_write_json(
            {"complete": True, "bucket": bucket,
             "rows": n_rows, "schema_hash": schema_hash,
             "input_sig": input_sig,
             "violation_count": viols.num_rows},
            os.path.join(ckpt_dir, f"p2-{bucket:05d}.json"))

    if cfg.shuffle == "manual":
        # manual split/gather hash exchange (same 2.35x-over-sort path
        # as validate(), via the shared split half); the per-bucket
        # task ALSO owns the bucket's commit: violations parquet +
        # manifest written atomically inside the task, so a killed run
        # resumes at bucket granularity
        from .validate import _exchange_bucket_parts

        @ray.remote(num_cpus=1)
        def _check_and_commit(bucket: int, _c, *parts_in: pa.Table) -> int:
            tabs = [p for p in parts_in if p.num_rows]
            if tabs:
                tab = pa.concat_tables(tabs)
                n_rows = tab.num_rows
                viols = _c(tab)
            else:
                n_rows = 0
                viols = empty_violations(schema.key_fields())
            _commit(bucket, n_rows, viols)
            return viols.num_rows

        parts_by_bucket = _exchange_bucket_parts(
            keys_ds.materialize(), cfg.buckets)
        ray.get([_check_and_commit.remote(b, checker, *parts_by_bucket[b])
                 for b in sorted(remaining_set)])
    else:
        # sort-shuffle fallback (cfg.shuffle="sort": bounds the
        # O(blocks x buckets) object count of the manual exchange)
        def check_bucket(tab: pa.Table, _c=checker) -> pa.Table:
            bucket = int(tab["bucket"][0].as_py())
            viols = _c(tab)
            _commit(bucket, tab.num_rows, viols)
            return viols.slice(0, 0)

        keys_ds.groupby("bucket").map_groups(
            check_bucket, batch_format="pyarrow").materialize()
    # under the sort shuffle, buckets with no rows never reach the
    # checker (manual-exchange tasks commit every remaining bucket
    # in-task, so this loop finds their manifests fresh and skips):
    # mark complete + clear stale output
    for b in remaining:
        p = os.path.join(ckpt_dir, f"p2-{b:05d}.json")
        man = _load_manifest(p)
        if man is None or man.get("input_sig") != input_sig:
            # bucket had no rows this run: clear any stale output from
            # a previous input set before committing the empty manifest
            _atomic_write_parquet(
                empty_violations(schema.key_fields()),
                os.path.join(viol_dir, f"p2-{b:05d}.parquet"))
            _atomic_write_json({"complete": True, "bucket": b, "rows": 0,
                                "schema_hash": schema_hash,
                                "input_sig": input_sig,
                                "violation_count": 0}, p)
