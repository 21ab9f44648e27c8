"""The end-to-end validation pipeline (Ray Data).

Physical plan (SURVEY §3.4 "Ray translation" + §7):

1. **Footer inspection** (driver, cheap): read each input file's Parquet
   schema; unknown/uncastable columns become schema-level violations
   (reference unknown-key policy, ``dsl/object_core.go:136-169``); files
   are grouped by physical schema so each group reads uniformly with
   column pruning (only declared columns leave storage).
2. **Pass 1 — full scan, no shuffle**: ``read_parquet(group, columns=…)
   → map_batches(BatchValidator, batch_format="pyarrow", concurrency=…)``
   over zero-copy Arrow batches.  One pass produces BOTH row/batch-local
   violation rows and per-batch sketch partials (union-typed output), so
   the 100 TB input is scanned once at full width.
3. **Pass 2 — keys-only scan + ONE shuffle**: re-read only the columns
   the table-scope rules need (``conv_id, turn_idx, ts`` — a few % of
   the bytes thanks to Parquet column pruning), add a
   ``bucket = hash64(conv_id) % P`` column, and run
   ``groupby("bucket").map_groups(BucketChecker)``.  Each group is a
   whole hash partition (NOT one conversation — per-conversation groups
   would mean millions of tiny Python calls), and the checker runs every
   conversation-scope rule vectorized with numpy over the
   partition-sorted arrays: duplicate (conv_id, turn_idx) keys
   (cross-shard, since hashing co-locates a conversation's rows),
   turn-idx contiguity, ts monotonicity, manifest referential
   integrity + declared-turn-count cross-check.  Hash partitioning on
   conv_id is the single physical partitioning shared by all of these
   (north rule).  The manifest is broadcast once via ``ray.put``.
4. **Reduce** (driver, tiny): merge sketch partials associatively,
   evaluate KS/PSI drift vs the baseline profile, build per-partition
   verdicts, final-sort violations (the byte-stable ordering contract,
   reference README.md:574).

Skew note: a hot conversation lands in one bucket, but a bucket holds
~(n_conv / P) conversations and the per-bucket work is vectorized, so a
50× hot conversation perturbs one bucket by a few MB.  For pathological
single-conversation skew raise ``ValidateConfig.buckets`` (the bucket
count is the salting knob: more buckets → smaller partitions).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..issues import (
    AGGREGATE_VIOLATION, CONFLICT, DUPLICATE_KEY, INVALID_TYPE, TOO_BIG,
    TOO_SMALL, UNKNOWN_KEY, canon_params, column_path, empty_violations,
    schema_level_violation, sort_violations, violations_schema,
)
from ..plan import BatchValidator, _checked_cast, combined_schema
from ..schema import (
    ContiguousRule, DriftRule, GroupCountRule, MonotonicRule,
    RefIntegrityRule, TableSchema, UniqueRule, Unknown,
)
from ..state.sketches import ColumnProfile, hash_strings


@dataclass
class ValidateConfig:
    batch_size: int | None = None        # None => whole blocks (zero-copy)
    concurrency: Any = None              # validator actor pool size (int|tuple)
    num_cpus: float = 1.0
    buckets: int = 64                    # hash partitions for pass 2
    with_profile: bool = True            # sketch partials + drift
    group_concurrency: Any = None
    concurrent_passes: bool = False      # overlap pass1/pass2 execution


@dataclass
class ValidationResult:
    violations: pa.Table                 # sorted by (key…, path, code, …)
    profile: ColumnProfile | None
    drift: list[dict]
    verdicts: pa.Table                   # per-partition pass/fail
    metrics: dict = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return self.violations.num_rows == 0 and all(
            d["passed"] for d in self.drift)


# ---------------------------------------------------------------------------
# Footer inspection / file grouping
# ---------------------------------------------------------------------------

@dataclass
class FileGroup:
    files: list
    read_columns: list
    n_rows: int = 0
    n_bytes: int = 0


def inspect_files(paths: Sequence[str], schema: TableSchema):
    """Group input files by physical schema; emit schema-level violations
    for undeclared columns (strict policy), deduped per column name.
    Footer-only reads: rows/bytes are collected for block sizing."""
    declared = set(schema.column_names)
    key_fields = schema.key_fields()
    groups: dict[tuple, FileGroup] = {}
    unknown_cols: dict[str, int] = {}
    for path in paths:
        meta = pq.read_metadata(path)
        fschema = meta.schema.to_arrow_schema()
        present = [c for c in schema.column_names if c in fschema.names]
        extras = [c for c in fschema.names if c not in declared]
        if extras and schema.unknown is Unknown.STRICT:
            for c in extras:
                unknown_cols[c] = unknown_cols.get(c, 0) + 1
        read_cols = present + (
            extras if schema.unknown is Unknown.PASSTHROUGH else [])
        sig = tuple((c, str(fschema.field(c).type)) for c in read_cols)
        g = groups.setdefault(sig, FileGroup(files=[], read_columns=read_cols))
        g.files.append(path)
        g.n_rows += meta.num_rows
        g.n_bytes += os.path.getsize(path)
    viols = [
        schema_level_violation(
            key_fields, column_path(c), UNKNOWN_KEY, "schema",
            "undeclared column present",
            canon_params({"column": c, "n_files": n}))
        for c, n in sorted(unknown_cols.items())
    ]
    vtab = pa.concat_tables(viols) if viols else empty_violations(key_fields)
    return list(groups.values()), vtab


# ---------------------------------------------------------------------------
# Pass 2: bucketed conversation-scope checks (vectorized per partition)
# ---------------------------------------------------------------------------

def _group_rule_columns(schema: TableSchema) -> list[str]:
    cols = list(schema.key_columns)
    for r in schema.rules:
        if isinstance(r, MonotonicRule):
            cols += [*r.group_by, r.order_by, r.column]
        elif isinstance(r, (ContiguousRule, GroupCountRule)):
            cols += [*r.group_by, getattr(r, "column", None) or ""]
        elif isinstance(r, (UniqueRule,)):
            cols += list(r.columns)
        elif isinstance(r, RefIntegrityRule):
            cols.append(r.column)
    seen, out = set(), []
    for c in cols:
        if c and c not in seen and c in set(schema.column_names):
            seen.add(c)
            out.append(c)
    return out


def has_group_rules(schema: TableSchema) -> bool:
    return any(isinstance(r, (UniqueRule, RefIntegrityRule, ContiguousRule,
                              MonotonicRule, GroupCountRule))
               for r in schema.rules)


class BucketChecker:
    """map_groups UDF over hash buckets: all conversation-scope checks,
    vectorized with numpy over the bucket sorted by (conv_id, turn_idx).

    Assumes hash partitioning on conv_id co-locates every row of a
    conversation (guaranteed by the bucket column), which is exactly the
    partitioning assumption the north rule names.
    """

    def __init__(self, schema: TableSchema, manifest_ref=None):
        self.schema = schema
        self.key_fields = schema.key_fields()
        self.key_cols = list(schema.key_columns)
        self.group_key = "conv_id" if "conv_id" in schema.column_names else \
            schema.key_columns[0]
        # keep the ObjectRef; resolve lazily INSIDE the task so the
        # manifest is broadcast once via the object store, not pickled
        # into every task (SURVEY §2.5 J2: broadcast small side)
        self._manifest_ref = manifest_ref
        self._manifest = None
        self.unique_rules = schema.rules_of(UniqueRule)
        self.contig_rules = schema.rules_of(ContiguousRule)
        self.mono_rules = schema.rules_of(MonotonicRule)
        self.ref_rules = schema.rules_of(RefIntegrityRule) \
            if manifest_ref is not None else []
        self.count_rules = schema.rules_of(GroupCountRule)

    @property
    def manifest(self):
        if self._manifest is None and self._manifest_ref is not None:
            ref = self._manifest_ref
            self._manifest = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref
        return self._manifest

    def __call__(self, tab: pa.Table) -> pa.Table:
        from ..plan import limit_arrow_threads
        limit_arrow_threads()
        gk = self.group_key
        if "bucket" in tab.column_names:
            tab = tab.drop_columns(["bucket"])
        tab = tab.filter(pc.is_valid(tab[gk]))
        if tab.num_rows == 0:
            return empty_violations(self.key_fields)
        order = [(gk, "ascending")]
        if "turn_idx" in tab.column_names:
            order.append(("turn_idx", "ascending"))
        tab = tab.sort_by(order)  # nulls sort last within the sort key

        conv = tab[gk].combine_chunks()
        conv_np = conv.to_numpy(zero_copy_only=False)
        n = len(conv_np)
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        new_conv[1:] = conv_np[1:] != conv_np[:-1]
        seg_starts = np.flatnonzero(new_conv)
        seg_ids = np.cumsum(new_conv) - 1          # row -> segment ordinal
        seg_convs = conv_np[seg_starts]
        n_seg = len(seg_starts)
        seg_bounds = np.append(seg_starts, n)

        turn = None
        turn_valid = None
        if "turn_idx" in tab.column_names:
            t = tab["turn_idx"].combine_chunks()
            turn_valid = ~np.asarray(t.is_null())
            turn = pc.cast(t, pa.int64()).fill_null(
                np.iinfo(np.int64).min).to_numpy(zero_copy_only=False)

        out: list[pa.Table] = []

        def emit_rows(convs, turns, path, code, rule, message, params):
            if len(convs) == 0:
                return
            arrays = {
                self.key_cols[0]: pa.array(convs, type=self.key_fields[0].type)}
            if len(self.key_cols) > 1:
                arrays[self.key_cols[1]] = pa.array(
                    turns, type=self.key_fields[1].type)
            m = len(convs)
            vt = pa.table({
                **arrays,
                "path": pa.array([path] * m), "code": pa.array([code] * m),
                "rule": pa.array([rule] * m),
                "message": pa.array([message] * m),
                "params": pa.array([params] * m),
            }).cast(violations_schema(self.key_fields))
            out.append(vt)

        # -- duplicates: adjacent equal (conv, turn) after sort ------------
        if turn is not None and self.unique_rules:
            rule = self.unique_rules[0]
            same = np.zeros(n, dtype=bool)
            same[1:] = (~new_conv[1:]) & (turn[1:] == turn[:-1]) \
                & turn_valid[1:] & turn_valid[:-1]
            first_dup = same & ~np.concatenate([[False], same[:-1]])
            idx = np.flatnonzero(first_dup)
            emit_rows(conv_np[idx], turn[idx], "", DUPLICATE_KEY, rule.rule,
                      "duplicate key tuple",
                      canon_params({"columns": list(rule.columns)}))
            dup_extra_per_seg = np.bincount(seg_ids[same], minlength=n_seg) \
                if same.any() else np.zeros(n_seg, dtype=np.int64)
        else:
            same = np.zeros(n, dtype=bool)
            dup_extra_per_seg = np.zeros(n_seg, dtype=np.int64)

        # -- per-conversation distinct-turn stats --------------------------
        if turn is not None:
            valid_per_seg = np.bincount(seg_ids[turn_valid], minlength=n_seg)
            distinct_per_seg = valid_per_seg - dup_extra_per_seg
            # sorted => per-seg min is first valid row; nulls (sentinel
            # int64 min) sort first in our fill, so use masked min/max
            big = np.iinfo(np.int64).max
            tmin = np.full(n, big)
            tmin[turn_valid] = turn[turn_valid]
            seg_min = np.minimum.reduceat(tmin, seg_starts)
            tmax = np.full(n, np.iinfo(np.int64).min)
            tmax[turn_valid] = turn[turn_valid]
            seg_max = np.maximum.reduceat(tmax, seg_starts)
            has_valid = valid_per_seg > 0

            for rule in self.contig_rules:
                bad = has_valid & (
                    (seg_min != 0) | (seg_max != distinct_per_seg - 1))
                idx = np.flatnonzero(bad)
                emit_rows(seg_convs[idx], [None] * len(idx),
                          column_path(rule.column), AGGREGATE_VIOLATION,
                          rule.rule, "index not contiguous from 0",
                          canon_params({"column": rule.column}))
            for rule in self.count_rules:
                if rule.min_count is not None:
                    idx = np.flatnonzero(distinct_per_seg < rule.min_count)
                    emit_rows(seg_convs[idx], [None] * len(idx), "",
                              AGGREGATE_VIOLATION, rule.rule,
                              "group too small",
                              canon_params({"min_count": rule.min_count}))
                if rule.max_count is not None:
                    idx = np.flatnonzero(distinct_per_seg > rule.max_count)
                    emit_rows(seg_convs[idx], [None] * len(idx), "",
                              AGGREGATE_VIOLATION, rule.rule,
                              "group too large",
                              canon_params({"max_count": rule.max_count}))

        # -- monotonicity (e.g. ts non-decreasing along turn order) --------
        for rule in self.mono_rules:
            if rule.column not in tab.column_names or turn is None:
                continue
            vals = tab[rule.column].combine_chunks()
            v_valid = ~np.asarray(vals.is_null())
            v = vals.to_numpy(zero_copy_only=False)
            if np.issubdtype(v.dtype, np.datetime64):
                v = v.astype("datetime64[us]").astype(np.int64)
            else:
                v = np.asarray(v, dtype=np.float64)
            prev_ok = np.zeros(n, dtype=bool)
            prev_ok[1:] = (~new_conv[1:]) & turn_valid[1:] & turn_valid[:-1] \
                & (turn[1:] != turn[:-1]) & v_valid[1:] & v_valid[:-1]
            bad = np.zeros(n, dtype=bool)
            bad[1:] = prev_ok[1:] & (v[1:] < v[:-1])
            idx = np.flatnonzero(bad)
            emit_rows(conv_np[idx], turn[idx], column_path(rule.column),
                      rule.code if hasattr(rule, "code") else "business_rule",
                      rule.rule, "value regressed within group",
                      canon_params({"order_by": rule.order_by}))

        # -- referential integrity + declared-count cross-check ------------
        # broadcast-manifest lookup via index_in (single-threaded hash
        # kernel) — NOT an Acero join: joins spin up arrow's global
        # thread pool per task, which oversubscribes the node when many
        # 1-CPU bucket tasks run concurrently (observed 25x slowdown)
        for rule in self.ref_rules:
            man = self.manifest
            seg_arr = pa.array(seg_convs, type=pa.string())
            pos = pc.index_in(seg_arr,
                              value_set=man[rule.column].combine_chunks())
            dmask = np.asarray(pc.is_null(pos))
            idx = np.flatnonzero(dmask)
            emit_rows(seg_convs[idx], [None] * len(idx),
                      column_path(rule.column),
                      CONFLICT, rule.rule, "key not present in manifest",
                      canon_params({"manifest": "conversations"}))
            if rule.check_counts and "n_turns" in man.column_names \
                    and turn is not None:
                declared = man["n_turns"].combine_chunks().take(
                    pos.fill_null(0)).to_numpy(zero_copy_only=False)
                observed = distinct_per_seg
                bad = (~dmask) & (declared != observed)
                idx = np.flatnonzero(bad)
                emit_rows(seg_convs[idx], [None] * len(idx),
                          column_path("turn_idx"), AGGREGATE_VIOLATION,
                          rule.count_rule, "observed turn count != declared",
                          canon_params({"declared_column": "n_turns"}))

        if not out:
            return empty_violations(self.key_fields)
        return pa.concat_tables(out)


# ---------------------------------------------------------------------------
# Normalization for the keys-only pass (casts without violation emission —
# pass 1 already reported coercion failures).
# ---------------------------------------------------------------------------

class KeyNormalizer:
    def __init__(self, schema: TableSchema, columns: list[str]):
        self.types = {c: schema.column(c).dtype for c in columns}
        self.columns = columns

    def __call__(self, tab: pa.Table) -> pa.Table:
        cols = {}
        n = tab.num_rows
        for c in self.columns:
            if c not in tab.column_names:
                cols[c] = pa.nulls(n, type=self.types[c])
                continue
            arr = tab.column(c)
            if arr.type != self.types[c]:
                casted, bad = _checked_cast(arr, self.types[c])
                if casted is None:
                    casted = pa.nulls(n, type=self.types[c])
                elif bad is not None:
                    casted = pc.if_else(
                        bad, pa.nulls(n, type=self.types[c]), casted)
                arr = casted
            cols[c] = arr
        out = pa.table(cols)
        bucket = hash_strings(out[self.columns[0]].combine_chunks()) if \
            pa.types.is_string(self.types[self.columns[0]]) else \
            pc.cast(out[self.columns[0]], pa.uint64(),
                    safe=False).combine_chunks().to_numpy(
                        zero_copy_only=False).astype(np.uint64)
        out = out.append_column(
            "bucket", pa.array((bucket % np.uint64(self._n_buckets))
                               .astype(np.int64)))
        return out

    _n_buckets: int = 64


def make_key_normalizer(schema: TableSchema, columns: list[str], buckets: int):
    kn = KeyNormalizer(schema, columns)
    kn._n_buckets = buckets
    return kn


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def _group_blocks(groups, *, max_block_bytes: int = 64 << 20) -> list[int]:
    """Per-group ``override_num_blocks``: target ~2 blocks per cluster
    CPU overall (amortizes per-task scheduling overhead — Ray's default
    splitting produced 0.8MB blocks and the sort spent 4x its compute in
    scheduling), but never let a block exceed ``max_block_bytes``
    compressed."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    total_rows = sum(g.n_rows for g in groups) or 1
    target = max(2 * cpus, sum(g.n_bytes for g in groups) // max_block_bytes)
    out = []
    for g in groups:
        nb = max(1, round(target * g.n_rows / total_rows),
                 g.n_bytes // max_block_bytes)
        out.append(nb)
    return out


def _discover(paths) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        if os.path.isdir(p):
            out += sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


def validate(
    paths,
    schema: TableSchema,
    *,
    manifest_path: str | None = None,
    baseline_profile: ColumnProfile | None = None,
    config: ValidateConfig | None = None,
) -> ValidationResult:
    """Run the full constraint suite. Returns sorted violations + drift
    report + per-partition verdicts + metrics."""
    import time as _time

    cfg = config or ValidateConfig()
    stage_t: dict = {}
    t0 = _time.perf_counter()
    files = _discover(paths)
    groups, file_viols = inspect_files(files, schema)
    stage_t["inspect"] = round(_time.perf_counter() - t0, 3)

    # ---- pass 1: full-width scan, batch-local checks + sketch partials --
    # One read per schema-group (per-group column pruning); each group is
    # validated by its own map stage and the SMALL outputs (violations +
    # sketch rows) are unioned afterwards.  Never union raw reads into a
    # fixed-size actor pool: a pool sized near the cluster CPU count
    # starves the other branch's read tasks and deadlocks the union.
    kwargs: dict = dict(
        batch_format="pyarrow", batch_size=cfg.batch_size,
        num_cpus=cfg.num_cpus,
    )
    if cfg.concurrency is not None:
        kwargs["concurrency"] = cfg.concurrency
        kwargs["fn_constructor_args"] = (schema,)
        kwargs["fn_constructor_kwargs"] = {"with_profile": cfg.with_profile}
        make = lambda ds: ds.map_batches(BatchValidator, **kwargs)  # noqa: E731
    else:
        # stateless-task variant: plan compiled once on the driver,
        # shipped in the (cloudpickled) closure — cheaper for small runs
        validator = BatchValidator(schema, with_profile=cfg.with_profile)

        def validate_batch(batch: pa.Table, _v=validator) -> pa.Table:
            return _v(batch)

        make = lambda ds: ds.map_batches(validate_batch, **kwargs)  # noqa: E731

    # dataset CONSTRUCTION stays on the main thread (read_parquet path
    # resolution does lazy imports that race across threads — Ray only
    # catches ModuleNotFoundError, a partially-initialized module raises
    # plain ImportError); only EXECUTION runs in the worker threads.
    nblocks = _group_blocks(groups)
    p1_outs = [make(rd.read_parquet(g.files, columns=g.read_columns,
                                    override_num_blocks=nb))
               for g, nb in zip(groups, nblocks)]

    def run_pass1():
        t0 = _time.perf_counter()
        combined = p1_outs[0]
        for part in p1_outs[1:]:
            combined = combined.union(part)
        mat = combined.materialize()  # violations + sketch rows only (small)
        tables = ray.get(mat.to_arrow_refs())
        tables = [t for t in tables if t.num_rows]
        big = pa.concat_tables(tables) if tables else \
            combined_schema(schema).empty_table()
        is_v = pc.equal(big["kind"], "v")
        vtabs = [big.filter(is_v).drop_columns(["kind", "payload"])]
        profile = None
        if cfg.with_profile:
            payloads = big.filter(pc.equal(big["kind"], "s"))["payload"]
            for chunk in payloads.chunks:
                for buf in chunk:
                    part = ColumnProfile.from_bytes(buf.as_py())
                    profile = part if profile is None else profile.merge(part)
        stage_t["pass1"] = round(_time.perf_counter() - t0, 3)
        return vtabs, profile

    p2_parts = []
    if has_group_rules(schema):
        key_cols = _group_rule_columns(schema)
        for g, nb in zip(groups, nblocks):
            cols = [c for c in key_cols if c in g.read_columns]
            if cols:
                p2_parts.append(rd.read_parquet(g.files, columns=cols,
                                                override_num_blocks=nb))

    def run_pass2():
        # keys-only scan + the ONE conv_id-hash shuffle
        t0 = _time.perf_counter()
        if not p2_parts:
            return []
        key_cols = _group_rule_columns(schema)
        manifest_ref = None
        if manifest_path and os.path.exists(manifest_path):
            manifest_ref = ray.put(pq.read_table(manifest_path))
        parts = p2_parts
        keys_ds = parts[0]
        for p in parts[1:]:
            keys_ds = keys_ds.union(p)
        keys_ds = keys_ds.map_batches(
            make_key_normalizer(schema, key_cols, cfg.buckets),
            batch_format="pyarrow", batch_size=cfg.batch_size)
        checker = BucketChecker(schema, manifest_ref)

        def check_bucket(tab: pa.Table, _c=checker) -> pa.Table:
            return _c(tab)

        grouped = keys_ds.groupby("bucket").map_groups(
            check_bucket, batch_format="pyarrow")
        gtabs = [t for t in ray.get(grouped.to_arrow_refs()) if t.num_rows]
        stage_t["pass2"] = round(_time.perf_counter() - t0, 3)
        return gtabs

    # The two passes are independent Dataset pipelines over different
    # column subsets; drive them CONCURRENTLY from two driver threads so
    # total wall is max(pass1, pass2), not the sum — the streaming
    # executor shares cluster resources between them.
    from concurrent.futures import ThreadPoolExecutor

    # pre-warm lazy imports Ray's read path does per-call: two threads
    # triggering the same first import race on the partially-initialized
    # module ("cannot import name HTTPFileSystem from fsspec...")
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        pass

    t0 = _time.perf_counter()
    if cfg.concurrent_passes:
        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(run_pass1)
            f2 = ex.submit(run_pass2)
            vtabs1, profile = f1.result()
            gtabs = f2.result()
    else:
        vtabs1, profile = run_pass1()
        gtabs = run_pass2()
    stage_t["pass1_pass2_wall"] = round(_time.perf_counter() - t0, 3)
    t0 = _time.perf_counter()

    viol_tabs = vtabs1
    if file_viols.num_rows:
        viol_tabs.append(file_viols)
    viol_tabs += gtabs

    # ---- drift ----------------------------------------------------------
    drift = []
    key_fields = schema.key_fields()
    drules = schema.rules_of(DriftRule)
    if drules and baseline_profile is not None and profile is not None:
        from ..functions.drift import drift_report
        drift = drift_report(baseline_profile, profile, drules)
        for d in drift:
            if not d["passed"]:
                viol_tabs.append(schema_level_violation(
                    key_fields, column_path(d["column"]),
                    AGGREGATE_VIOLATION, d["rule"],
                    f"distribution drift: {d['kind']} over threshold",
                    canon_params({"value": round(d["value"], 6),
                                  "threshold": d["threshold"],
                                  "kind": d["kind"]})))

    violations = pa.concat_tables(
        [t.cast(violations_schema(key_fields)) for t in viol_tabs]) \
        if viol_tabs else empty_violations(key_fields)
    violations = sort_violations(violations, schema.key_columns)

    verdicts = build_verdicts(violations, schema, n_partitions=cfg.buckets)
    stage_t["finalize"] = round(_time.perf_counter() - t0, 3)
    metrics = {
        "n_violations": violations.num_rows,
        "n_files": len(files),
        "rows_validated": profile.row_count if profile else None,
        "distinct_keys_estimate":
            round(profile.hll.estimate()) if profile else None,
        "stage_sec": stage_t,
    }
    return ValidationResult(violations=violations, profile=profile,
                            drift=drift, verdicts=verdicts, metrics=metrics)


def normalize_dataset(paths, schema: TableSchema,
                      config: ValidateConfig | None = None) -> "rd.Dataset":
    """Canonical pass-through output: the input normalized to the declared
    schema (casts applied, defaults injected, unknown-column policy
    applied), exactly the declared columns.  Text cells are never
    round-tripped through Python strings (Arrow kernels only), so the
    per-turn text-equality invariant holds byte-for-byte."""
    cfg = config or ValidateConfig()
    files = _discover(paths)
    groups, _ = inspect_files(files, schema)
    reads = [rd.read_parquet(g.files, columns=g.read_columns) for g in groups]
    ds = reads[0]
    for part in reads[1:]:
        ds = ds.union(part)

    from ..plan import apply_normalizers, normalize_batch

    def normalize(batch: pa.Table, _s=schema) -> pa.Table:
        out = normalize_batch(batch, _s)[0]
        return apply_normalizers(out, _s.normalizers)

    return ds.map_batches(normalize, batch_format="pyarrow",
                          batch_size=cfg.batch_size)


def build_verdicts(violations: pa.Table, schema: TableSchema,
                   n_partitions: int = 64) -> pa.Table:
    """Per-partition pass/fail: partition = hash(conv_id) % n_partitions
    (the same physical partitioning as the shuffle); schema-level
    violations (null key) land in partition -1."""
    key = schema.key_columns[0]
    if violations.num_rows:
        conv = violations[key].combine_chunks()
        valid = ~np.asarray(conv.is_null())
        h = hash_strings(conv) % np.uint64(n_partitions)
        part = np.where(valid, h.astype(np.int64), -1)
        counts = np.bincount(part + 1, minlength=n_partitions + 1)
    else:
        counts = np.zeros(n_partitions + 1, dtype=np.int64)
    pids = np.arange(-1, n_partitions)
    return pa.table({
        "partition": pa.array(pids, type=pa.int32()),
        "violation_count": pa.array(counts, type=pa.int64()),
        "passed": pa.array(counts == 0),
    })
