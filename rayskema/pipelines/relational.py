"""Generic relational check pipelines over arbitrary Parquet tables.

The transcript pipeline (``pipelines.validate``) is the flagship; these
are the same engine primitives exposed as reusable operators over any
table — the shapes a user of the reference library (goskema) runs today,
re-expressed Ray-Data-first:

- per-batch constraint checks (``check_constraints``): the compiled
  :class:`~rayskema.plan.ConstraintPlan` over ``map_batches`` with
  zero-copy Arrow batches (reference per-field checks,
  ``dsl/primitives.go``, ``dsl/object_core.go``);
- duplicate-key detection (``find_duplicates``): reference
  ``rules.UniqueBy`` (``rules/rules.go:104-137``) as a hash shuffle;
- referential integrity (``ref_violations``): reference context-rule
  existence lookups (``examples/context_order_inventory``) as a
  broadcast semi/anti join — the small side is ``ray.put`` ONCE and
  read inside every task, never re-shipped per batch;
- group-count bounds (``group_count_violations``): reference
  ``rules.AtLeastOne`` (``rules/rules.go:79-99``);
- per-group monotonicity (``monotonic_violations``): reference typed
  refinement rules (``dsl/typed_rules.go:56-132``).

Scale notes: every grouped op here uses the *bucketed* pattern — add a
``bucket = hash(key) % P`` column, ``groupby("bucket").map_groups`` and
run the per-group logic VECTORIZED over the whole bucket (numpy over
sorted arrays), never one Python call per key group.  P is the skew
knob: a bucket holds ~n_keys/P keys, so a hot key perturbs one bucket
only.  ``groupby().aggregate()`` paths pre-aggregate inside blocks
before the shuffle (Ray Data's partial+final aggregate).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..issues import CONFLICT, canon_params, column_path, violations_schema
from ..plan import ConstraintPlan
from ..schema import TableSchema
from ..state.sketches import hash_strings


# ---------------------------------------------------------------------------
# Bucketed grouping: the ONE shuffle pattern every grouped check shares.
# ---------------------------------------------------------------------------

def composite_hash(tab: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Vectorized 64-bit hash of a key-column tuple (mixing per column)."""
    h = np.zeros(tab.num_rows, dtype=np.uint64)
    for i, c in enumerate(key_cols):
        arr = tab[c]
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            hc = hash_strings(arr.combine_chunks(), seed=i)
        else:
            v = pc.cast(arr, pa.int64(), safe=False).fill_null(
                np.iinfo(np.int64).min).combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.uint64)
            from ..state.sketches import _hash64
            hc = _hash64(v ^ np.uint64((i + 1) * 0x9E3779B97F4A7C15
                                       & 0xFFFFFFFFFFFFFFFF))
        h = h * np.uint64(0x100000001B3) + hc
    return h


def _stamped_to_bucket(
        tab: pa.Table, buckets: int) -> tuple[pa.Table, np.ndarray]:
    """The ONE hash→bucket rule: convert a ``__h``-stamped block to
    (stamp-free table, bucket-id vector).  Zero-row blocks can bypass
    the stamping UDF entirely (Ray forms no batch from them), so
    ``__h`` may legitimately be absent on empties."""
    if tab.num_rows == 0:
        if "__h" in tab.column_names:
            tab = tab.drop_columns(["__h"])
        return tab, np.empty(0, dtype=np.int64)
    h = tab["__h"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.uint64)
    b = (h % np.uint64(buckets)).astype(np.int64)
    return tab.drop_columns(["__h"]), b


def _to_bucket_fn(buckets: int):
    """Batch fn converting a ``__h``-stamped block to a ``bucket``
    column (sort-exchange side of the hash→bucket rule)."""
    def _to_bucket(tab: pa.Table) -> pa.Table:
        tab, b = _stamped_to_bucket(tab, buckets)
        return tab.append_column(
            "bucket", pa.array(b) if len(b)
            else pa.array([], type=pa.int64()))
    return _to_bucket


def add_bucket(ds: "rd.Dataset", key_cols: Sequence[str],
               buckets: int) -> "rd.Dataset":
    key_cols = list(key_cols)

    def _stamp(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            # degenerate empty blocks (e.g. from an upstream map_groups
            # with no groups) may carry no schema; emit an empty
            # bucket-only block — groupby drops empty blocks anyway
            cols = {c: tab[c] for c in tab.column_names}
            cols["bucket"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        tab = tab.append_column("__h", pa.array(
            composite_hash(tab, key_cols).astype(np.int64)))
        tab, b = _stamped_to_bucket(tab, buckets)
        return tab.append_column("bucket", pa.array(b))

    return ds.map_batches(_stamp, batch_format="pyarrow")


def _stamp_hash(ds: "rd.Dataset", key_cols: Sequence[str]) -> "rd.Dataset":
    """Stamp the raw 64-bit key hash as ``__h`` (int64 bit pattern) —
    bucket assignment (``__h % P``) is deferred to the split task so P
    can be chosen AFTER the stamped size is known."""
    key_cols = list(key_cols)

    def _stamp(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            cols = {c: tab[c] for c in tab.column_names}
            cols["__h"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        h = composite_hash(tab, key_cols).astype(np.int64)
        return tab.append_column("__h", pa.array(h))

    return ds.map_batches(_stamp, batch_format="pyarrow")


@ray.remote(num_cpus=1)
def _split_bucket_parts_task(tab: pa.Table, buckets: int):
    """Map side of the manual hash exchange: split one ``__h``-stamped
    block into per-bucket sub-tables (one object per bucket via
    ``num_returns=buckets``); the stamp column is dropped here so
    gather tasks see clean tables."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    tab, b = _stamped_to_bucket(tab, buckets)
    if tab.num_rows == 0:
        empty = tab.slice(0, 0)
        return [empty] * buckets if buckets > 1 else empty
    order = np.argsort(b, kind="stable")
    sorted_tab = tab.take(pa.array(order))
    counts = np.bincount(b, minlength=buckets)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out = [sorted_tab.slice(offsets[i], counts[i]) for i in range(buckets)]
    return out if buckets > 1 else out[0]


@ray.remote(num_cpus=1)
def _apply_bucket_task(fn, key_cols, sort_within: bool, schema: pa.Schema,
                       *parts: pa.Table) -> pa.Table:
    """Reduce side of the manual exchange: gather one bucket's
    sub-tables (already stamp-free), restore the in-bucket contract
    (optional key sort) and run ``fn``.  An empty bucket still calls
    ``fn`` on an empty input built from the stamped schema, so every
    output block has ``fn``'s output schema."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    parts = [p for p in parts if p.num_rows]
    if parts:
        # input blocks may legitimately disagree on column width (e.g.
        # a shard carrying overflow-probe int64 turn_idx next to int32
        # shards) — promote to the common type like a sort shuffle would
        tab = pa.concat_tables(parts, promote_options="permissive")
    else:
        tab = schema.empty_table()
    if sort_within and tab.num_rows:
        tab = tab.sort_by([(c, "ascending") for c in key_cols])
    return fn(tab)


# Adaptive-exchange knobs.  TARGET_BUCKET_BYTES bounds what one gather
# task concatenates into its heap (plus fn's own working set);
# MANUAL_EXCHANGE_MAX_BUCKETS bounds the manual exchange's object count
# (O(blocks x buckets) refs) — above it the sort exchange takes over;
# SORT_EXCHANGE_MAX_BUCKETS only bounds degenerate bucket counts.
TARGET_BUCKET_BYTES = 256 << 20
MANUAL_EXCHANGE_MAX_BUCKETS = 256
SORT_EXCHANGE_MAX_BUCKETS = 1 << 16
# hash_join(broadcast="auto"): right sides at or under this
# materialized size join by broadcast (one worker-heap copy per task
# slot); larger sides take the bucketed exchange
AUTO_BROADCAST_MAX_BYTES = 64 << 20


# Parquet on-disk -> Arrow in-memory inflation used when sizing an
# exchange from file metadata alone (no execution).  Deliberately on
# the high side: overestimating bytes only adds buckets (smaller
# gathers), underestimating would overload gather heaps.
PARQUET_INFLATION = 4


def _estimate_input_bytes(ds: "rd.Dataset") -> int | None:
    """Byte estimate for an exchange WITHOUT executing the pipeline:
    sum of the datasource's file sizes (Parquet footer/file metadata
    Ray already holds) times :data:`PARQUET_INFLATION`.  Returns None
    when the dataset has no file-backed lineage (from_arrow / from
    items), where the caller falls back to materialize-based sizing.
    Upstream filters/projections make this an over-estimate — safe,
    it only raises the bucket count.  Row-EXPANDING lineage (pair
    generation, unpivot/explode, padded unions) makes it an
    UNDER-estimate: the exchange then gets fewer buckets than the
    expanded bytes warrant — callers shuffling an expanded
    intermediate should pass ``buckets=`` explicitly (the dedup
    pair stages do) rather than rely on the file-size default."""
    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    import os as _os
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        try:
            total += _os.path.getsize(p)
        except OSError:
            return None
    return total * PARQUET_INFLATION if total else None


def _auto_buckets(total_bytes: int, target: int) -> int:
    """Bucket count from materialized input bytes: enough buckets that
    one bucket's gather stays under ``target`` bytes, floored at the
    cluster CPU count (capped at the manual exchange's bucket ceiling
    so the floor alone never forces the sort fallback) — small inputs
    still use every core."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    floor = max(8, min(cpus, MANUAL_EXCHANGE_MAX_BUCKETS))
    need = -(-max(0, int(total_bytes)) // target)
    return max(floor, need)


def bucketed_map_groups(
    ds: "rd.Dataset",
    key_cols: Sequence[str],
    fn: Callable[[pa.Table], pa.Table],
    *,
    buckets: int | None = None,
    sort_within: bool = True,
    exchange: str = "manual",
    target_bucket_bytes: int | None = None,
) -> "rd.Dataset":
    """Hash-partition on ``key_cols`` and apply ``fn`` to each bucket
    (NOT each key group — buckets keep the Python-call count at P, the
    per-group logic stays vectorized).  ``fn`` sees the bucket sorted by
    ``key_cols`` with the helper columns dropped.

    ``buckets=None`` (the default) sizes the exchange from the DATA
    without executing it: input-file bytes (Parquet footer/file
    metadata Ray already holds) times :data:`PARQUET_INFLATION` give
    the estimate, P is derived so one bucket's bytes stay under
    ``target_bucket_bytes`` (default :data:`TARGET_BUCKET_BYTES`,
    floored at the cluster CPU count), and when the required P exceeds
    :data:`MANUAL_EXCHANGE_MAX_BUCKETS` the exchange auto-falls back
    to ``"sort"`` BEFORE anything is materialized — a 100 TB input
    reaches the streaming sort shuffle without ever being gathered
    into the object store just to be measured.  Only a dataset with no
    file-backed lineage (from_arrow etc., already object-store
    resident) is materialize-sized.  A fixed-64-bucket manual exchange
    at 100 TB would hand ~1.6 TB to each gather task; the adaptive
    default keeps gather heaps bounded no matter the input size.

    ``exchange`` picks the shuffle implementation:

    - ``"manual"`` (default): the explicit split/gather hash exchange —
      every stamped block is split ONCE into per-bucket sub-tables
      (``num_returns=buckets`` objects) and one gather task per bucket
      concats its slices and runs ``fn``.  This skips Ray's sort-based
      groupby entirely (no global sort-merge barrier); measured 2.35x
      over the sort shuffle on the flagship pass-2 at 24M rows, and it
      is the same pattern validate.py ships.
    - ``"sort"``: ``groupby("bucket").map_groups`` (Ray's sort-based
      shuffle) — fully streaming, no driver-side refs; the scale path.

    ``fn`` must tolerate an empty input table (it sees one when a
    bucket is empty); every operator in this module does.
    """
    key_cols = list(key_cols)
    target = target_bucket_bytes or TARGET_BUCKET_BYTES

    if buckets is None and exchange == "manual":
        # Pre-size from file metadata BEFORE any materialize: a 100 TB
        # input must reach the streaming sort exchange without ever
        # being gathered into the object store just to be measured.
        # (The manual exchange's own materialize below is its exchange
        # input, not a sizing step — and only runs once the estimate
        # says the input is small enough for the manual path at all.)
        est = _estimate_input_bytes(ds)
        if est is not None and _auto_buckets(est, target) \
                > MANUAL_EXCHANGE_MAX_BUCKETS:
            exchange = "sort"

    if exchange == "manual":
        stamped = _stamp_hash(ds, key_cols).materialize()
        if stamped.schema() is None:
            # fully-empty input whose lazy schema was lost upstream
            # (e.g. a filter dropped every row of a ref-backed
            # dataset): nothing to group — pass the empty dataset
            # through rather than crash
            return stamped
        schema = stamped.schema().base_schema
        out_schema = pa.schema([f for f in schema if f.name != "__h"])
        if buckets is None:
            buckets = _auto_buckets(stamped.size_bytes() or 0, target)
            if buckets > MANUAL_EXCHANGE_MAX_BUCKETS:
                buckets = min(buckets, SORT_EXCHANGE_MAX_BUCKETS)
                exchange = "sort"
        if exchange == "manual":
            refs = stamped.to_arrow_refs()
            if not refs:
                return rd.from_arrow(fn(out_schema.empty_table()))
            if buckets > 1:
                split = [_split_bucket_parts_task.options(
                    num_returns=buckets).remote(r, buckets) for r in refs]
            else:
                split = [[_split_bucket_parts_task.remote(r, buckets)]
                         for r in refs]
            out_refs = [_apply_bucket_task.remote(
                fn, key_cols, sort_within, out_schema,
                *[s[b] for s in split])
                for b in range(buckets)]
            return rd.from_arrow_refs(out_refs)

        # adaptive fallback: reuse the stamped materialization — one
        # cheap map converts the hash to a bucket id, then Ray's sort
        # shuffle streams the exchange
        bucketed = stamped.map_batches(
            _to_bucket_fn(buckets), batch_format="pyarrow")
    else:
        if buckets is None:
            # the adaptive sizing contract applies to BOTH exchanges:
            # a fixed bucket count on the explicit sort path would hand
            # each map_groups task total_bytes/64 of heap at scale.
            # Size from file metadata when the dataset has file-backed
            # lineage (no execution, fully streaming); only a dataset
            # with NO such lineage (from_arrow etc. — already in the
            # object store) falls back to materialize-based sizing.
            est = _estimate_input_bytes(ds)
            if est is not None:
                buckets = min(_auto_buckets(est, target),
                              SORT_EXCHANGE_MAX_BUCKETS)
                bucketed = add_bucket(ds, key_cols, buckets)
            else:
                stamped = _stamp_hash(ds, key_cols).materialize()
                if stamped.schema() is None:
                    return stamped
                buckets = min(
                    _auto_buckets(stamped.size_bytes() or 0, target),
                    SORT_EXCHANGE_MAX_BUCKETS)
                bucketed = stamped.map_batches(
                    _to_bucket_fn(buckets), batch_format="pyarrow")
        else:
            bucketed = add_bucket(ds, key_cols, buckets)

    def _apply(tab: pa.Table) -> pa.Table:
        tab = tab.drop_columns(["bucket"])
        if sort_within and tab.num_rows:
            tab = tab.sort_by([(c, "ascending") for c in key_cols])
        return fn(tab)

    return bucketed.groupby("bucket").map_groups(
        _apply, batch_format="pyarrow")


def agg_named(tab: pa.Table, keys: Sequence[str],
              spec: Sequence[tuple], names: Sequence[str]) -> pa.Table:
    """``group_by().aggregate()`` with the output bound by NAME:
    returns a table with columns ``keys + names`` (one per spec
    entry).  Arrow's emitted column layout (keys first vs aggregates
    first) has differed across pyarrow versions — selecting the
    emitted ``<col>_<fn>`` / ``count_all`` names instead of renaming
    by position keeps every aggregation site version-proof."""
    keys = list(keys)
    g = tab.group_by(keys).aggregate(list(spec))
    out = {k: g[k] for k in keys}
    for name, (c, fn) in zip(names, spec):
        out[name] = g["count_all" if fn == "count_all" else f"{c}_{fn}"]
    return pa.table(out)


def segment_starts(tab: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Boolean 'new group starts here' mask over a key-sorted table.

    SQL grouping semantics for nulls: adjacent nulls are ONE group (a
    numeric column's nulls arrive as NaN/NaT from to_numpy, where
    x != x would otherwise split every null row into its own group);
    null↔value transitions always start a segment."""
    n = tab.num_rows
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for c in key_cols:
        arr = tab[c].combine_chunks()
        valid = np.asarray(arr.is_valid())
        v = arr.to_numpy(zero_copy_only=False)
        both_valid = valid[1:] & valid[:-1]
        with np.errstate(invalid="ignore"):
            diff = (v[1:] != v[:-1]) & both_valid
        if v.dtype.kind == "f":
            # genuine NaN values (valid, not null) compare equal,
            # matching SQL GROUP BY's NaN handling
            diff &= ~(np.isnan(v[1:].astype(np.float64, copy=False))
                      & np.isnan(v[:-1].astype(np.float64, copy=False)))
        new[1:] |= diff | (valid[1:] != valid[:-1])
    return new


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------

def check_constraints(ds: "rd.Dataset", schema: TableSchema,
                      *, columns: Sequence[str] | None = None) -> "rd.Dataset":
    """Per-batch constraint evaluation: violations Dataset with columns
    (key..., path, code, rule, message, params)."""
    out_schema = violations_schema(schema.key_fields())

    # stateless-task form: the plan compiles ONCE on the driver and
    # ships in the (cloudpickled) closure — Ray's warm worker pool
    # runs it without actor spawn (a fresh actor process costs seconds
    # of imports + first-touch page faults on this hardware class; for
    # heavyweight per-actor state — models, codecs — use the actor
    # form, e.g. stages/multimodal.py)
    plan = ConstraintPlan(schema)

    def _check(batch: pa.Table, _p=plan) -> pa.Table:
        return _p.validate(batch).cast(out_schema)

    return ds.map_batches(_check, batch_format="pyarrow")


def find_duplicates(ds: "rd.Dataset", key_cols: Sequence[str],
                    *, buckets: int | None = None, min_count: int = 2) -> "rd.Dataset":
    """Key tuples appearing >= min_count times: (key..., n).  The
    cross-partition duplicate check (reference duplicate_key/uniqueness)
    as one hash shuffle; counting is vectorized per bucket."""
    key_cols = list(key_cols)

    def _dups(tab: pa.Table) -> pa.Table:
        new = segment_starts(tab, key_cols)
        seg_id = np.cumsum(new) - 1
        counts = np.bincount(seg_id)
        firsts = np.flatnonzero(new)
        keep = counts >= min_count
        idx = firsts[keep]
        out = {c: tab[c].take(pa.array(idx)) for c in key_cols}
        out["n"] = pa.array(counts[keep], type=pa.int64())
        return pa.table(out)

    return bucketed_map_groups(ds, key_cols, _dups, buckets=buckets)


def ref_violations(ds: "rd.Dataset", column: str, valid_keys_ref,
                   key_cols: Sequence[str], *, rule: str = "ref_integrity",
                   manifest_name: str = "manifest") -> "rd.Dataset":
    """Rows whose ``column`` is not in the broadcast key set => CONFLICT
    violations.  ``valid_keys_ref`` is a ``ray.put`` ObjectRef of a
    pyarrow Array (broadcast once; resolved lazily per actor)."""
    key_cols = list(key_cols)
    params = canon_params({"manifest": manifest_name})
    path = column_path(column)

    class _Anti:
        def __init__(self) -> None:
            keys = valid_keys_ref
            self.keys = ray.get(keys) if isinstance(keys, ray.ObjectRef) else keys

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..issues import violations_from_mask
            dangling = pc.and_(
                pc.invert(pc.is_in(batch[column], value_set=self.keys)),
                pc.is_valid(batch[column]))
            return violations_from_mask(
                batch, dangling, key_cols, path, CONFLICT, rule,
                "key not present in manifest", params)

    return ds.map_batches(_Anti, batch_format="pyarrow", concurrency=4)


def group_count_violations(ds: "rd.Dataset", group_cols: Sequence[str],
                           *, min_count: int | None = None,
                           max_count: int | None = None,
                           buckets: int | None = None) -> "rd.Dataset":
    """Groups whose row count is out of bounds: (group..., n).
    Pre-aggregates inside map_batches (partial counts) before the
    shuffle, so the exchange moves one row per (block, group), not one
    per input row."""
    group_cols = list(group_cols)

    def _partial(tab: pa.Table) -> pa.Table:
        return agg_named(tab, group_cols,
                         [(group_cols[0], "count")], ["n"])

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        new = segment_starts(tab, group_cols)
        seg_id = np.cumsum(new) - 1
        n = np.bincount(seg_id, weights=tab["n"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)).astype(np.int64)
        firsts = np.flatnonzero(new)
        bad = np.zeros(len(n), dtype=bool)
        if min_count is not None:
            bad |= n < min_count
        if max_count is not None:
            bad |= n > max_count
        idx = firsts[bad]
        out = {c: tab[c].take(pa.array(idx)) for c in group_cols}
        out["n"] = pa.array(n[bad], type=pa.int64())
        return pa.table(out)

    return bucketed_map_groups(partial, group_cols, _final)


def monotonic_violations(
    ds: "rd.Dataset", group_col: str, order_col: str, value_col: str,
    id_cols: Sequence[str], *, buckets: int | None = None,
) -> "rd.Dataset":
    """Rows where ``value_col`` regresses vs the previous row of the same
    group ordered by ``order_col``: (id..., prev_value, value).  One
    hash shuffle on the group key; the lag compare is numpy over the
    bucket-sorted arrays."""
    id_cols = list(id_cols)
    need = list(dict.fromkeys([group_col, order_col, value_col] + id_cols))

    def _mono(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending"), (order_col, "ascending")])
        new = segment_starts(tab, [group_col])
        v = tab[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.astype("datetime64[us]").astype(np.int64)
        n = len(v)
        bad = np.zeros(n, dtype=bool)
        if n > 1:
            bad[1:] = (~new[1:]) & (v[1:] < v[:-1])
        idx = pa.array(np.flatnonzero(bad))
        prev = pa.array(np.flatnonzero(bad) - 1)
        out = {c: tab[c].take(idx) for c in id_cols}
        out["prev_value"] = tab[value_col].take(prev)
        out["value"] = tab[value_col].take(idx)
        return pa.table(out)

    return bucketed_map_groups(ds.select_columns(need), [group_col], _mono,
                               buckets=buckets, sort_within=False)


def sequence_violations(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, id_cols: Sequence[str], *,
    allowed_first: Sequence[str] | None = None,
    allowed_after: dict[str, Sequence[str]] | None = None,
    no_repeat: bool = False,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Ordered-sequence rules over a categorical column, per group.

    The transcript role-sequence check of the north rule (and the
    reference's ordered typed-refinement rules, ``rules/rules.go:14-76``)
    generalized: within each ``group_col`` group ordered by
    ``order_cols``, emit one violation row ``(id..., prev_value, value,
    code)`` for:

    - ``no_repeat``: a value equal to its predecessor
      (code ``sequence_repeat``);
    - ``allowed_first``: a group's first value outside the set
      (code ``sequence_start``, ``prev_value`` null);
    - ``allowed_after``: a transition ``prev -> value`` where ``prev``
      is a key of the dict and ``value`` is not in its allowed set
      (code ``sequence_transition``).

    One hash shuffle on the group key; the lag compare and all rule
    masks are numpy/pc over the bucket-sorted arrays (no per-group
    Python).  Null values never match any rule (SQL lag semantics).
    """
    id_cols = list(id_cols)
    order_cols = list(order_cols)
    need = list(dict.fromkeys([group_col, *order_cols, value_col] + id_cols))
    # () means "no value may start a group" — only None disables the rule
    first_set = pa.array(sorted(allowed_first), type=pa.string()) \
        if allowed_first is not None else None
    after = {k: pa.array(sorted(v), type=pa.string())
             for k, v in sorted((allowed_after or {}).items())}

    def _seq(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending")
                           for c in [group_col, *order_cols]])
        n = tab.num_rows
        new = segment_starts(tab, [group_col])
        v = tab[value_col].combine_chunks()
        valid = ~np.asarray(v.is_null()) if v.null_count else \
            np.ones(n, dtype=bool)
        # per-bucket dictionary codes give exact string equality compares
        enc = v.dictionary_encode()
        code = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        prev_ok = np.zeros(n, dtype=bool)   # has a valid predecessor
        if n > 1:
            prev_ok[1:] = ~new[1:] & valid[1:] & valid[:-1]
        masks: list[tuple[np.ndarray, str]] = []
        if no_repeat and n > 1:
            rep = np.zeros(n, dtype=bool)
            rep[1:] = prev_ok[1:] & (code[1:] == code[:-1])
            masks.append((rep, "sequence_repeat"))
        if first_set is not None:
            in_first = np.asarray(pc.is_in(v, value_set=first_set)
                                  .fill_null(False))
            masks.append((new & valid & ~in_first, "sequence_start"))
        if after:
            trans = np.zeros(n, dtype=bool)
            for key, allowed in after.items():
                kidx = pc.index_in(pa.scalar(key), value_set=enc.dictionary)
                if not kidx.is_valid:
                    continue
                prev_is_key = np.zeros(n, dtype=bool)
                prev_is_key[1:] = prev_ok[1:] & (code[:-1] == kidx.as_py())
                ok = np.asarray(pc.is_in(v, value_set=allowed)
                                .fill_null(False))
                trans |= prev_is_key & ~ok
            masks.append((trans, "sequence_transition"))
        parts = []
        for mask, rule_code in masks:
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            cols = {c: tab[c].take(pa.array(idx)) for c in id_cols}
            if rule_code == "sequence_start":
                cols["prev_value"] = pa.nulls(len(idx), type=pa.string())
            else:
                cols["prev_value"] = v.take(pa.array(idx - 1))
            cols["value"] = v.take(pa.array(idx))
            cols["code"] = pa.array([rule_code] * len(idx),
                                    type=pa.string())
            parts.append(pa.table(cols))
        if not parts:
            return pa.table(
                {**{c: pa.chunked_array([], type=tab[c].type)
                    for c in id_cols},
                 "prev_value": pa.array([], type=pa.string()),
                 "value": pa.array([], type=pa.string()),
                 "code": pa.array([], type=pa.string())})
        return pa.concat_tables(parts)

    return bucketed_map_groups(ds.select_columns(need), [group_col], _seq,
                               buckets=buckets, sort_within=False)


def distinct_count(ds: "rd.Dataset", group_col: str, value_col: str,
                   *, buckets: int | None = None) -> "rd.Dataset":
    """Exact distinct values of ``value_col`` per ``group_col``:
    (group, n_distinct).  Pre-dedups (group, value) pairs inside each
    block before the shuffle (map-side combine), then counts distinct
    per bucket vectorized.  SQL ``count(DISTINCT v)`` null semantics:
    null values do not count, but a group with only null values stays
    in the output with 0 (the deduped (group, null) pair still rides
    the exchange as the group's marker)."""

    def _pairs(tab: pa.Table) -> pa.Table:
        return tab.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([])

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")

    def _count(tab: pa.Table) -> pa.Table:
        tab = tab.group_by([group_col, value_col]).aggregate([])
        tab = tab.sort_by([(group_col, "ascending")])
        new = segment_starts(tab, [group_col])
        seg_id = np.cumsum(new) - 1
        v = tab[value_col].combine_chunks()
        valid = np.asarray(v.is_valid()).astype(np.float64) \
            if v.null_count else np.ones(tab.num_rows)
        counts = np.bincount(seg_id, weights=valid).astype(np.int64)
        firsts = np.flatnonzero(new)
        return pa.table({
            group_col: tab[group_col].take(pa.array(firsts)),
            "n_distinct": pa.array(counts, type=pa.int64()),
        })

    return bucketed_map_groups(pairs, [group_col], _count,
                               buckets=buckets, sort_within=False)


def _grouped_sketch_partial(
    tab: pa.Table, group_col: str, value_prep, make_blob, blob_col: str,
) -> pa.Table:
    """Shared grouped-sketch block partial: one sketch blob per
    in-block group.  ``value_prep(tab) -> (data, valid)`` per-row
    arrays (vectorized once per block); ``make_blob(data_slice) ->
    bytes`` sees only the group's VALID rows (SQL aggregates ignore
    nulls) — a group whose rows are all null still emits a blob built
    from zero rows, so the group stays present (SQL ``GROUP BY``).
    A null group key is its own group."""
    gtype = tab.schema.field(group_col).type
    n = tab.num_rows
    if n == 0:
        return pa.table({group_col: pa.nulls(0, type=gtype),
                         blob_col: pa.array([], type=pa.binary())})
    data, valid = value_prep(tab)
    enc = pc.dictionary_encode(tab[group_col].combine_chunks())
    codes = enc.indices.fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(codes, kind="stable")
    sc, sd, sv = codes[order], data[order], valid[order]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    bounds = np.append(starts, n)
    take_idx, blobs = [], []
    for i, st in enumerate(starts):
        en = bounds[i + 1]
        take_idx.append(int(sc[st]) if sc[st] >= 0 else None)
        blobs.append(make_blob(sd[st:en][sv[st:en]]))
    gvals = enc.dictionary.take(pa.array(take_idx, type=pa.int64()))
    return pa.table({group_col: pc.cast(gvals, gtype),
                     blob_col: pa.array(blobs, type=pa.binary())})


def _merge_grouped_blobs(tab: pa.Table, group_col: str, blob_col: str,
                         from_bytes):
    """Shared grouped-sketch merge: sort the bucket by group, merge
    each group's blobs.  Returns ``(sorted_tab, starts, merged)``."""
    tab = tab.sort_by([(group_col, "ascending")])
    n = tab.num_rows
    starts = np.flatnonzero(segment_starts(tab, [group_col]))
    bounds = np.append(starts, n)
    blobs = tab[blob_col].to_pylist()
    merged = []
    for i, st in enumerate(starts):
        s = from_bytes(blobs[st])
        for j in range(st + 1, bounds[i + 1]):
            s.merge(from_bytes(blobs[j]))
        merged.append(s)
    return tab, starts, merged


def approx_distinct_count(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    p: int = 12, buckets: int | None = None,
    out_col: str = "n_approx",
) -> "rd.Dataset":
    """Approximate distinct values of ``value_col`` per ``group_col``
    via per-group HyperLogLog partials: ``(group, out_col)``.

    Scale shape: exact :func:`distinct_count` ships every unique
    (group, value) pair through the exchange — O(distinct pairs) —
    while this ships ONE 2^p-register sketch per (group, block),
    O(groups × blocks) bytes regardless of value cardinality: the
    right tool for web-scale values over modest group cardinality
    (distinct users per event type across 10^12 rows).  Standard
    error ≈ 1.04/√2^p (p=12 → ~1.6%, 4 KiB/sketch).

    Deterministic and parallelism-independent: the merged register
    array is the elementwise max over the seeded hashes of the
    group's values, which no block partitioning can change, so the
    estimate is bit-stable at any bucket/block count.  SQL
    ``count(DISTINCT v)`` null semantics: null values are excluded,
    and a group with only null values stays in the output with 0."""
    from ..state.sketches import HyperLogLog, _hash64, hash_strings

    def _prep(tab: pa.Table):
        v = tab[value_col].combine_chunks()
        valid = np.asarray(v.is_valid()) if v.null_count else \
            np.ones(len(v), dtype=bool)
        if pa.types.is_integer(v.type):
            data = _hash64(pc.cast(v, pa.int64()).fill_null(0)
                           .to_numpy(zero_copy_only=False)
                           .astype(np.uint64))
        else:
            data = hash_strings(pc.cast(v, pa.string()))
        return data, valid

    def _make(hashes: np.ndarray) -> bytes:
        h = HyperLogLog(p)
        h.update_hashes(hashes)
        return h.to_bytes()

    partial = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: _grouped_sketch_partial(t, group_col, _prep, _make,
                                          "__hll"),
        batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        gtype = tab.schema.field(group_col).type
        if tab.num_rows == 0:
            return pa.table({group_col: pa.nulls(0, type=gtype),
                             out_col: pa.array([], type=pa.int64())})
        tab, starts, merged = _merge_grouped_blobs(
            tab, group_col, "__hll", HyperLogLog.from_bytes)
        ests = [int(round(h.estimate())) for h in merged]
        return pa.table({
            group_col: tab[group_col].take(pa.array(starts)),
            out_col: pa.array(ests, type=pa.int64())})

    return bucketed_map_groups(partial, [group_col], _final,
                               buckets=buckets, sort_within=False)


def cooccurrence_pairs(
    ds: "rd.Dataset", group_col: str, item_col: str, *,
    k: int = 15, max_group: int = 10_000,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Market-basket co-occurrence: the top-``k`` unordered item pairs
    by the number of groups containing both — ``(item_a, item_b, n)``
    with ``item_a < item_b``, ties broken by (item_a, item_b).

    One hash exchange on the group key; inside each bucket items
    dedup per group (a basket counts a pair once), pairs expand from
    shared per-size-class triu templates (the dedup module's
    streaming pair generator — O(distinct sizes) Python iterations,
    ~2M pairs resident at a time) and PRE-AGGREGATE to distinct
    (a, b, count) rows before the second, tiny pair-key exchange.
    Groups larger than ``max_group`` raise rather than silently
    star-pair (a degenerate basket would distort counts) — filter
    them upstream."""
    from ..functions.dedup import _group_pair_chunks

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.and_(pc.is_valid(tab[group_col]),
                                 pc.is_valid(tab[item_col])))
        tab = tab.group_by([group_col, item_col]).aggregate([])
        tab = tab.sort_by([(group_col, "ascending"),
                           (item_col, "ascending")])
        if tab.num_rows == 0:
            t = tab[item_col].type
            return pa.table({
                "item_a": pa.array([], type=t),
                "item_b": pa.array([], type=t),
                "n": pa.array([], type=pa.int64())})
        new = segment_starts(tab, [group_col])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.append(firsts, tab.num_rows))
        if counts.max() > max_group:
            raise ValueError(
                f"a group holds {int(counts.max())} items "
                f"(> max_group={max_group}); filter degenerate "
                "baskets upstream")
        items = tab[item_col].combine_chunks()
        # aggregate EACH yielded chunk immediately: residency stays at
        # O(chunk) pair rows + O(distinct pairs) partials, honoring
        # the generator's streaming contract (collecting all chunks
        # first would re-materialize the full triu expansion)
        partials = []
        for ia, ib in _group_pair_chunks(counts, firsts,
                                         max_group=max_group):
            chunk = pa.table({
                "item_a": items.take(pa.array(ia)),
                "item_b": items.take(pa.array(ib)),
                "__one": pa.array(np.ones(len(ia), dtype=np.int64))})
            partials.append(agg_named(chunk, ["item_a", "item_b"],
                                      [("__one", "sum")], ["n"]))
        if not partials:
            t = tab[item_col].type
            return pa.table({
                "item_a": pa.array([], type=t),
                "item_b": pa.array([], type=t),
                "n": pa.array([], type=pa.int64())})
        merged = pa.concat_tables(partials)
        return agg_named(merged, ["item_a", "item_b"],
                         [("n", "sum")], ["n"])

    local = bucketed_map_groups(
        ds.select_columns([group_col, item_col]), [group_col], _pairs,
        buckets=buckets, sort_within=False)
    total = group_agg(local, ["item_a", "item_b"],
                      [("n", "sum", "n")], buckets=buckets)
    return total.sort(["n", "item_a", "item_b"],
                      descending=[True, False, False]).limit(k)


def association_rules(
    ds: "rd.Dataset", group_col: str, item_col: str, *,
    min_pair_support: int = 2, conf_num: int = 1, conf_den: int = 10,
    max_group: int = 10_000, buckets: int | None = None,
) -> "rd.Dataset":
    """Market-basket association rules ``ant -> cons`` with EXACT
    integer statistics: every directed rule whose pair support
    ``n_ab >= min_pair_support`` and whose confidence
    ``n_ab / n_ant >= conf_num / conf_den`` (decided by the integer
    cross-product ``n_ab * conf_den >= n_ant * conf_num`` — no float
    thresholds).  Output columns ``(ant, cons, n_ab, n_ant, n_cons,
    n_groups)``; confidence and lift are exact rationals of these
    four integers, so the caller (or the SQL oracle) derives them
    without any float-summation-order ambiguity.

    Scale shape — ONE basket-sized exchange: groups co-locate once on
    ``group_col`` and the bucket emits three partial families in one
    tagged table (pair counts from the streaming triu templates, item
    supports from the same per-group dedup, and one distinct-group
    count row per bucket).  Downstream exchanges move only distinct
    pairs / items; the item-support side of the two rule joins rides
    ``broadcast="auto"``.  Baskets larger than ``max_group`` raise,
    exactly like :func:`cooccurrence_pairs`."""
    from ..functions.dedup import _group_pair_chunks

    def _partials(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.and_(pc.is_valid(tab[group_col]),
                                 pc.is_valid(tab[item_col])))
        tab = tab.group_by([group_col, item_col]).aggregate([])
        tab = tab.sort_by([(group_col, "ascending"),
                           (item_col, "ascending")])
        t = tab[item_col].type
        if tab.num_rows == 0:
            return pa.table({
                "item_a": pa.array([], type=t),
                "item_b": pa.array([], type=t),
                "n": pa.array([], type=pa.int64()),
                "tag": pa.array([], type=pa.int8())})
        new = segment_starts(tab, [group_col])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.append(firsts, tab.num_rows))
        if counts.max() > max_group:
            raise ValueError(
                f"a group holds {int(counts.max())} items "
                f"(> max_group={max_group}); filter degenerate "
                "baskets upstream")
        items = tab[item_col].combine_chunks()
        parts = []
        for ia, ib in _group_pair_chunks(counts, firsts,
                                         max_group=max_group):
            chunk = pa.table({
                "item_a": items.take(pa.array(ia)),
                "item_b": items.take(pa.array(ib)),
                "__one": pa.array(np.ones(len(ia), dtype=np.int64))})
            parts.append(agg_named(chunk, ["item_a", "item_b"],
                                   [("__one", "sum")], ["n"]))
        pair = (agg_named(pa.concat_tables(parts),
                          ["item_a", "item_b"], [("n", "sum")], ["n"])
                if parts else pa.table({
                    "item_a": pa.array([], type=t),
                    "item_b": pa.array([], type=t),
                    "n": pa.array([], type=pa.int64())}))
        pair = pair.append_column(
            "tag", pa.array(np.zeros(pair.num_rows, dtype=np.int8)))
        # item supports: the (group, item) rows are already distinct
        vc = items.value_counts()
        isup = pa.table({
            "item_a": vc.field("values"),
            "item_b": pa.nulls(len(vc), type=t),
            "n": pc.cast(vc.field("counts"), pa.int64()),
            "tag": pa.array(np.ones(len(vc), dtype=np.int8))})
        # distinct groups seen by this bucket (groups never split)
        gcnt = pa.table({
            "item_a": pa.nulls(1, type=t),
            "item_b": pa.nulls(1, type=t),
            "n": pa.array([len(firsts)], pa.int64()),
            "tag": pa.array([2], pa.int8())})
        return pa.concat_tables([pair, isup, gcnt])

    local = bucketed_map_groups(
        ds.select_columns([group_col, item_col]), [group_col],
        _partials, buckets=buckets, sort_within=False).materialize()

    def _only(tag: int):
        def fn(tab: pa.Table) -> pa.Table:
            return tab.filter(pc.equal(tab["tag"],
                                       pa.scalar(tag, pa.int8())))
        return fn

    pairs = group_agg(
        local.map_batches(_only(0), batch_format="pyarrow")
        .select_columns(["item_a", "item_b", "n"]),
        ["item_a", "item_b"], [("n", "sum", "n_ab")],
        buckets=buckets).map_batches(
        lambda tab: tab.filter(pc.greater_equal(
            tab["n_ab"], pa.scalar(min_pair_support, pa.int64()))),
        batch_format="pyarrow")
    isup = group_agg(
        local.map_batches(_only(1), batch_format="pyarrow")
        .select_columns(["item_a", "n"]),
        ["item_a"], [("n", "sum", "ni")], buckets=buckets)
    n_groups = sum(
        r["n"] for r in local.map_batches(
            _only(2), batch_format="pyarrow")
        .select_columns(["n"]).take_all())

    def _sym(tab: pa.Table) -> pa.Table:
        ant = pa.chunked_array([tab["item_a"].combine_chunks(),
                                tab["item_b"].combine_chunks()])
        cons = pa.chunked_array([tab["item_b"].combine_chunks(),
                                 tab["item_a"].combine_chunks()])
        nab = pa.chunked_array([tab["n_ab"].combine_chunks()] * 2)
        return pa.table({"ant": ant.combine_chunks(),
                         "cons": cons.combine_chunks(),
                         "n_ab": nab.combine_chunks()})

    rules = pairs.map_batches(_sym, batch_format="pyarrow")
    rules = hash_join(rules, isup, on="ant", right_on="item_a",
                      broadcast="auto")
    rules = rules.map_batches(
        lambda tab: tab.rename_columns(
            [("n_ant" if c == "ni" else c) for c in tab.column_names]),
        batch_format="pyarrow")
    rules = hash_join(rules, isup, on="cons", right_on="item_a",
                      broadcast="auto")

    def _finish(tab: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply_checked(tab["n_ab"],
                                pa.scalar(conf_den, pa.int64())),
            pc.multiply_checked(tab["n_ant"],
                                pa.scalar(conf_num, pa.int64())))
        tab = tab.filter(keep)
        return pa.table({
            "ant": tab["ant"], "cons": tab["cons"],
            "n_ab": tab["n_ab"], "n_ant": tab["n_ant"],
            "n_cons": tab["ni"],
            "n_groups": pa.array(
                np.full(tab.num_rows, n_groups, dtype=np.int64))})

    return rules.map_batches(_finish, batch_format="pyarrow")


def group_agg_distinct(
    ds: "rd.Dataset", group_col: str,
    aggs: Sequence[tuple[str, str, str]],
    distinct_cols: Sequence[str], *, buckets: int | None = None,
) -> "rd.Dataset":
    """The full SQL reporting aggregate — ``GROUP BY g`` with plain
    aggregates AND ``count(DISTINCT col)`` columns (named
    ``n_distinct_<col>``): composes :func:`group_agg` with one
    :func:`distinct_count` per distinct column, joined back by
    BROADCAST on the O(groups) result.

    Scale shape: plain aggregates can pre-aggregate inside blocks but
    distinct counts cannot (a value seen in two blocks must count
    once), so each distinct column necessarily rides its own deduped
    (group, value) exchange — that is the exact-cardinality floor, not
    an implementation shortcut (HLL ``approx_distinct_count`` is the
    constant-size alternative).  The pruned input is scanned once per
    pass; with column-pruned parquet reads that beats materializing
    the widest projection."""
    base = group_agg(ds, [group_col], aggs, buckets=buckets)
    for col in distinct_cols:
        dc = distinct_count(ds, group_col, col, buckets=buckets) \
            .map_batches(
                lambda t, _c=col: pa.table({
                    group_col: t[group_col],
                    f"n_distinct_{_c}": t["n_distinct"]}),
                batch_format="pyarrow")
        base = hash_join(base, dc, on=[group_col], how="left_outer",
                         broadcast=True)
    return base


def group_quantile_cont(
    ds: "rd.Dataset", group_col: str, value_col: str,
    qs: Sequence[float], *, digits: int | None = 6,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Linearly-INTERPOLATED per-group quantiles — SQL
    ``quantile_cont`` / ``percentile_cont`` semantics: position
    ``q·(n−1)`` over the sorted non-null values, result
    ``lo + frac·(hi − lo)`` (the same expression DuckDB's
    interpolator evaluates, so rounding to ``digits`` on both engines
    hash-matches).  Output ``(group, q, value float64)``; a group
    with one value returns it for every q.

    Same scale shape as :func:`group_quantiles` (one hash shuffle on
    the group key, vectorized rank picks inside the bucket); use that
    exact rank-based form when bit-exactness without a rounding
    contract matters, and the t-digest
    :func:`approx_group_quantiles` when groups are too large to
    co-locate."""
    qs = [float(q) for q in qs]
    if not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")

    def _quant(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[value_col]))
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=tab[group_col].type),
                "q": pa.array([], type=pa.float64()),
                "value": pa.array([], type=pa.float64())})
        tab = tab.sort_by([(group_col, "ascending"),
                           (value_col, "ascending")])
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, tab.num_rows))
        v = pc.cast(tab[value_col], pa.float64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        parts = []
        for q in qs:
            pos = q * (counts - 1)
            lo = np.floor(pos).astype(np.int64)
            frac = pos - lo
            lo_v = v[starts + lo]
            hi_v = v[starts + np.minimum(lo + 1, counts - 1)]
            val = lo_v + frac * (hi_v - lo_v)
            if digits is not None:
                val = np.round(val, digits)
            parts.append(pa.table({
                group_col: tab[group_col].take(pa.array(starts)),
                "q": pa.array(np.full(len(starts), q)),
                "value": pa.array(val),
            }))
        return pa.concat_tables(parts)

    return bucketed_map_groups(
        ds.select_columns([group_col, value_col]), [group_col], _quant,
        buckets=buckets, sort_within=False)


def quantile_bucket_assign(
    ds: "rd.Dataset", value_col: str, qs: Sequence[float], *,
    out_col: str = "bucket", buckets: int | None = None,
) -> "rd.Dataset":
    """Assign every row a global quantile bucket of ``value_col`` —
    the balanced-shard / CCNet head-middle-tail partitioner: bucket
    ``b`` = number of thresholds the value EXCEEDS, so bucket 0 is the
    ≤-q₁ head and bucket ``len(qs)`` the top tail.

    EXACT at any scale when distinct(value) ≪ rows (lengths, scores,
    counts — the usual bucketing keys): global thresholds come from a
    VALUE-HISTOGRAM exchange, i.e. ``group_agg`` keyed on the value
    itself — map-side pre-aggregation means O(distinct × blocks) rows
    move, never row count — then the driver folds the sorted
    O(distinct) (value, count) rows into cumulative ranks and picks
    ``threshold_q`` = smallest value whose cumulative count reaches
    ``ceil(q·n)`` (the same type-1 rank semantics as
    :func:`group_quantiles`, reproducible in SQL via the
    row_number/ceil pattern).  Assignment is a broadcast
    ``searchsorted`` per batch — no second exchange.  For genuinely
    continuous high-cardinality doubles use
    :func:`approx_group_quantiles` thresholds instead (constant-size
    sketches; this function would ship the full value set).

    Null values get a NULL bucket (SQL comparison semantics).  Ties
    between thresholds collapse buckets exactly as SQL's
    ``count(thr < v)`` does."""
    qs = [float(q) for q in qs]
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")

    hist_in = ds.select_columns([value_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t[value_col])),
        batch_format="pyarrow")
    hist = group_agg(hist_in, [value_col],
                     [(value_col, "count_all", "__n")],
                     buckets=buckets).take_all()
    hist.sort(key=lambda r: r[value_col])
    counts = np.array([r["__n"] for r in hist], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    thr = []
    from fractions import Fraction
    for q in qs:
        if n == 0:
            break
        # exact ceil(q·n) with q read as its DECIMAL literal (what a
        # SQL engine does with `0.07`): float math.ceil(0.07 * 100)
        # overshoots to 8 where decimal arithmetic gives exactly 7
        fq = Fraction(repr(q))
        rank = max(1, -((-fq.numerator * n) // fq.denominator))
        thr.append(hist[int(np.searchsorted(cum, rank))][value_col])
    thr_ref = ray.put(np.sort(np.array(thr)))

    def _assign(tab: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        col = tab[value_col]
        valid = pc.is_valid(col)
        # int64 values stay int64 end to end (a float64 detour would
        # break exactness past 2^53); nulls masked via fill + if_else
        if pa.types.is_integer(col.type):
            v = pc.fill_null(pc.cast(col, pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            t = t.astype(np.int64)
        else:
            v = pc.fill_null(pc.cast(col, pa.float64(), safe=False),
                             float("nan")).to_numpy(zero_copy_only=False)
            t = t.astype(np.float64)
        b = np.searchsorted(t, v, side="left")
        return tab.append_column(out_col, pc.if_else(
            valid, pa.array(b.astype(np.int64)),
            pa.nulls(tab.num_rows, type=pa.int64())))

    return ds.map_batches(_assign, batch_format="pyarrow")


def approx_group_quantiles(
    ds: "rd.Dataset", group_col: str, value_col: str,
    qs: Sequence[float], *, delta: int = 200,
    buckets: int | None = None, out_col: str = "value_est",
) -> "rd.Dataset":
    """Approximate per-group quantiles via per-group t-digest
    partials: ``(group, q, out_col)`` — the ``percentile_approx``
    analogue of exact :func:`group_quantiles`.

    Scale shape: the exact operator ships every (group, value) row
    through the exchange and sorts within buckets; this ships one
    O(delta)-centroid digest per (group, block) — constant bytes per
    group regardless of row count, the 10^12-row path.  Error is a
    fraction of rank (tightest at the tails, k1 scale); t-digest
    merges are order-perturbed within that tolerance, so treat
    results as estimates, not reproducible bits (use
    :func:`group_quantiles` when exactness matters).  Null values are
    excluded; a null group is its own group; an all-null group yields
    null estimates."""
    from ..state.sketches import TDigest

    qs = [float(q) for q in qs]

    def _prep(tab: pa.Table):
        vals = pc.cast(tab[value_col].combine_chunks(), pa.float64()) \
            .to_numpy(zero_copy_only=False)     # nulls arrive as NaN
        return vals, ~np.isnan(vals)

    def _make(values: np.ndarray) -> bytes:
        d = TDigest(delta)
        d.update(values)
        return d.to_bytes()

    partial = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: _grouped_sketch_partial(t, group_col, _prep, _make,
                                          "__td"),
        batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        gtype = tab.schema.field(group_col).type
        if tab.num_rows == 0:
            return pa.table({group_col: pa.nulls(0, type=gtype),
                             "q": pa.array([], type=pa.float64()),
                             out_col: pa.array([], type=pa.float64())})
        tab, starts, merged = _merge_grouped_blobs(
            tab, group_col, "__td", TDigest.from_bytes)
        gidx, qout, vout = [], [], []
        for st, d in zip(starts, merged):
            est = d.quantile(np.asarray(qs))
            for q, v in zip(qs, np.atleast_1d(est)):
                gidx.append(int(st))
                qout.append(q)
                vout.append(None if np.isnan(v) else float(v))
        return pa.table({
            group_col: tab[group_col].take(pa.array(gidx, pa.int64())),
            "q": pa.array(qout, type=pa.float64()),
            out_col: pa.array(vout, type=pa.float64())})

    return bucketed_map_groups(partial, [group_col], _final,
                               buckets=buckets, sort_within=False)


def group_quantiles(
    ds: "rd.Dataset", group_col: str, value_col: str,
    qs: Sequence[float], *, buckets: int | None = None,
) -> "rd.Dataset":
    """EXACT per-group quantiles: ``(group, q, value)`` where value is
    the smallest element whose within-group rank reaches ``ceil(q*n)``
    (the rank-based "type 1" quantile — unambiguous, interpolation-free,
    reproducible by any SQL engine as
    ``row_number() = ceil(q * count(*))``).  Nulls are excluded.

    One hash shuffle on the group key; the within-group sort and rank
    picks are vectorized over the bucket (never per-group Python).  The
    reference computes aggregates exactly in-memory
    (``rules/rules.go:116-135``); this is the distributed exact path —
    the t-digest sketch in ``state/sketches.py`` is the approximate one.
    """
    qs = [float(q) for q in qs]
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")

    def _quant(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[value_col]))
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=tab[group_col].type),
                "q": pa.array([], type=pa.float64()),
                "value": pa.array([], type=tab[value_col].type)})
        tab = tab.sort_by([(group_col, "ascending"),
                           (value_col, "ascending")])
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, tab.num_rows))
        parts = []
        from fractions import Fraction
        for q in qs:
            # exact ceil(q·n) with q read as its decimal literal (SQL
            # parses `0.07` as DECIMAL; float 0.07·100 overshoots to
            # ceil 8).  Guard: a long-decimal q (huge denominator)
            # would overflow num·counts in int64 — fall back to the
            # float path there (indistinguishable at that precision).
            fq = Fraction(repr(float(q)))
            if fq.denominator <= 10 ** 6:
                ranks = -(np.int64(-fq.numerator) * counts
                          // np.int64(fq.denominator))
            else:
                ranks = np.ceil(q * counts).astype(np.int64)
            pos = starts + ranks - 1
            parts.append(pa.table({
                group_col: tab[group_col].take(pa.array(starts)),
                "q": pa.array(np.full(len(starts), q)),
                "value": tab[value_col].take(pa.array(pos)),
            }))
        return pa.concat_tables(parts)

    return bucketed_map_groups(
        ds.select_columns([group_col, value_col]), [group_col], _quant,
        buckets=buckets, sort_within=False)


def group_agg(
    ds: "rd.Dataset", group_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]], *, buckets: int | None = None,
) -> "rd.Dataset":
    """General multi-aggregate per group (the TPC-H Q1 shape):
    ``aggs`` is a list of ``(col, op, out_name)`` with op in
    ``sum | min | max | count | count_all | mean | var_pop | var_samp
    | stddev_pop | stddev_samp``; ``count`` counts non-null values
    (SQL ``count(col)``), ``count_all`` counts rows (``count(*)``;
    col is ignored), ``mean`` is ``sum/count`` computed from exact
    partials.

    Partial aggregation: each block reduces to one row per distinct
    group via Arrow's hash aggregation BEFORE the shuffle, so only
    O(groups) rows per block move; the final per-bucket merge re-sums
    (sum/count), re-mins/maxes, and derives means.  The reference
    computes aggregates exactly in-memory (``rules/rules.go:116-135``);
    this is the distributed exact path.

    The variance family ships (Σv², Σv, n) partials.  Integer columns
    stay EXACT and order-independent at any scale: each square goes
    through ``multiply_checked`` int64 (so |v| < ~3.04e9 or it raises,
    never wraps) and BOTH sums accumulate as decimal128(38, 0) —
    overflow-free to 10^38, far past any 10^12-row corpus — then cast
    to float64 once.  Float columns accumulate in float64 (the usual
    order caveat).  The end is ``(ss - s·s/n)/denom`` as ONE float
    expression, clamped at 0 against fp residue; SQL NULL when n = 0
    (pop) or n < 2 (samp).  Reproduce in SQL with the same closed form
    over HUGEINT sums cast to DOUBLE (the ``lineitem_corr`` pattern),
    not the engine's own ``var_pop`` (different summation algorithm).

    Float caveat: float sums depend on addition order; pre-scale to
    integer cents (and divide after) when exact cross-engine equality
    matters."""
    group_cols = list(group_cols)
    aggs = [(c, op, out) for (c, op, out) in aggs]
    ops_ok = {"sum", "min", "max", "count", "count_all", "mean",
              "var_pop", "var_samp", "stddev_pop", "stddev_samp"}
    for _, op, _ in aggs:
        if op not in ops_ok:
            raise ValueError(f"unknown agg op {op!r}")

    # distinct partials needed across all requested aggregates
    partials: list[tuple[str, str]] = []  # (col, arrow_fn); ("", count_all)
    seen = set()

    def _need(col: str, fn: str) -> None:
        if (col, fn) not in seen:
            seen.add((col, fn))
            partials.append((col, fn))

    var_ops = {"var_pop", "var_samp", "stddev_pop", "stddev_samp"}
    for col, op, _ in aggs:
        if op == "count_all":
            _need("", "count_all")
        elif op == "mean":
            _need(col, "sum")
            _need(col, "count")
        elif op in var_ops:
            _need(col, "sum_sq")
            _need(col, "sum_dec")
            _need(col, "count")
        else:
            _need(col, op)

    def _pname(col: str, fn: str) -> str:
        return f"__p_{fn}" if fn == "count_all" else f"__p_{col}_{fn}"

    in_cols = group_cols + sorted(
        {c for c, f in partials if c and c not in group_cols})

    def _partial(tab: pa.Table) -> pa.Table:
        spec = []
        for c, fn in partials:
            if fn == "sum_sq":
                sq = f"__sq_{c}"
                if sq not in tab.column_names:
                    v = tab[c]
                    if pa.types.is_integer(v.type):
                        # exact, order-independent: the per-element
                        # square is checked int64 (raises, never
                        # wraps), the accumulation decimal128
                        vv = pc.cast(v, pa.int64())
                        tab = tab.append_column(sq, pc.cast(
                            pc.multiply_checked(vv, vv),
                            pa.decimal128(38, 0)))
                    else:
                        vf = pc.cast(v, pa.float64())
                        tab = tab.append_column(sq, pc.multiply(vf, vf))
                spec.append((sq, "sum"))
            elif fn == "sum_dec":
                dc = f"__dec_{c}"
                if dc not in tab.column_names:
                    v = tab[c]
                    if pa.types.is_integer(v.type):
                        tab = tab.append_column(dc, pc.cast(
                            pc.cast(v, pa.int64()),
                            pa.decimal128(38, 0)))
                    else:
                        tab = tab.append_column(
                            dc, pc.cast(v, pa.float64()))
                spec.append((dc, "sum"))
            else:
                spec.append(([] if fn == "count_all" else c, fn))
        return agg_named(tab, group_cols, spec,
                         [_pname(c, fn) for c, fn in partials])

    partial = ds.select_columns(in_cols).map_batches(
        _partial, batch_format="pyarrow")

    merge_fn = {"sum": "sum", "min": "min", "max": "max",
                "count": "sum", "count_all": "sum", "sum_sq": "sum",
                "sum_dec": "sum"}

    def _final(tab: pa.Table) -> pa.Table:
        spec = [(_pname(c, fn), merge_fn[fn]) for c, fn in partials]
        g = agg_named(tab, group_cols, spec,
                      [_pname(c, fn) for c, fn in partials])
        out = {c: g[c] for c in group_cols}
        for col, op, name in aggs:
            if op == "count_all":
                out[name] = g[_pname("", "count_all")]
            elif op == "mean":
                cnt = g[_pname(col, "count")]
                # SQL AVG of an all-null group is NULL, not 0.0/0.0=NaN
                out[name] = pc.if_else(
                    pc.equal(cnt, 0),
                    pa.nulls(g.num_rows, type=pa.float64()),
                    pc.divide(pc.cast(g[_pname(col, "sum")], pa.float64(),
                                      safe=False),
                              pc.cast(cnt, pa.float64(), safe=False)))
            elif op in var_ops:
                # one float expression over exact partials, identical
                # op order to the documented SQL closed form:
                # (ss - s*s/n) / denom.  safe=False: the default safe
                # int64→float64 cast rejects |x| > 2^53 — the whole
                # point of the exact partials is surviving past that
                n_np = pc.cast(g[_pname(col, "count")], pa.float64(),
                               safe=False).to_numpy(zero_copy_only=False)
                s_np = pc.cast(g[_pname(col, "sum_dec")], pa.float64(),
                               safe=False).to_numpy(zero_copy_only=False)
                ss_np = pc.cast(g[_pname(col, "sum_sq")], pa.float64(),
                                safe=False).to_numpy(zero_copy_only=False)
                pop = op.endswith("_pop")
                denom = n_np if pop else n_np - 1.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    var = (ss_np - s_np * s_np / n_np) / denom
                    var = np.maximum(var, 0.0)   # fp residue clamp
                    if op.startswith("stddev"):
                        var = np.sqrt(var)
                valid = n_np >= (1.0 if pop else 2.0)
                out[name] = pa.array(
                    np.where(valid, var, np.nan), type=pa.float64(),
                    mask=~valid)
            else:
                out[name] = g[_pname(col, op)]
        return pa.table(out)

    return bucketed_map_groups(partial, group_cols, _final,
                               buckets=buckets, sort_within=False)


def group_corr(
    ds: "rd.Dataset", group_col: str, x_col: str, y_col: str, *,
    scale_x: int = 1, scale_y: int = 1, buckets: int | None = None,
) -> "rd.Dataset":
    """Exact per-group Pearson correlation + covariance:
    ``(group, n, covar_pop, covar_samp, corr)`` — the grouped
    companion to :func:`~rayskema.functions.profile.
    paired_moments_corr`.  Values pre-scale to integers
    (round-half-away, SQL ROUND parity), per-element cross products
    are CHECKED int64 (raise, never wrap), and the six moment
    partials ``(n, Σx, Σy, Σx², Σy², Σxy)`` accumulate as
    decimal128(38) through the block hash-agg and the ONE group
    exchange — exact and order-independent, so the final single
    float expression per statistic is bit-reproducible at any
    parallelism and by a SQL engine evaluating the same HUGEINT
    closed form:

        covar_pop  = DBL(n·Σxy − Σx·Σy) / DBL(n) / DBL(n)
        covar_samp = DBL(n·Σxy − Σx·Σy) / DBL(n) / DBL(n−1)
        corr = DBL(n·Σxy − Σx·Σy)
               / sqrt(DBL(n·Σx² − Σx·Σx) · DBL(n·Σy² − Σy·Σy))

    covariance is in SCALED units (divide by scale_x·scale_y for
    original units); corr is scale-invariant.  Rows with either side
    null are dropped (SQL corr semantics); a group with n<2 or a
    constant column yields SQL NULL for the undefined statistics."""
    from ..functions import round_half_away

    def _partial(tab: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(tab[x_col]), pc.is_valid(tab[y_col]))
        tab = tab.filter(keep)
        xv = pa.array(round_half_away(
            pc.multiply(pc.cast(tab[x_col], pa.float64()),
                        float(scale_x)).to_numpy(zero_copy_only=False),
            0).astype(np.int64))
        yv = pa.array(round_half_away(
            pc.multiply(pc.cast(tab[y_col], pa.float64()),
                        float(scale_y)).to_numpy(zero_copy_only=False),
            0).astype(np.int64))
        dec = pa.decimal128(38, 0)
        t = pa.table({
            group_col: tab[group_col],
            "_x": pc.cast(xv, dec),
            "_y": pc.cast(yv, dec),
            "_xx": pc.cast(pc.multiply_checked(xv, xv), dec),
            "_yy": pc.cast(pc.multiply_checked(yv, yv), dec),
            "_xy": pc.cast(pc.multiply_checked(xv, yv), dec),
        })
        return agg_named(
            t, [group_col],
            [([], "count_all"), ("_x", "sum"), ("_y", "sum"),
             ("_xx", "sum"), ("_yy", "sum"), ("_xy", "sum")],
            ["n", "sx", "sy", "sxx", "syy", "sxy"])

    partial = ds.select_columns(
        list(dict.fromkeys([group_col, x_col, y_col]))).map_batches(
        _partial, batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        g = agg_named(
            tab, [group_col],
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")],
            ["n", "sx", "sy", "sxx", "syy", "sxy"])
        import math
        n_l, cp_l, cs_l, r_l = [], [], [], []
        for i in range(g.num_rows):
            # O(groups) exact big-int closed form — groups, not rows
            n = int(g["n"][i].as_py())
            sx, sy, sxx, syy, sxy = (
                int(g[c][i].as_py()) for c in
                ("sx", "sy", "sxx", "syy", "sxy"))
            num = float(n * sxy - sx * sy)
            n_l.append(n)
            cp_l.append(num / float(n) / float(n) if n > 0 else None)
            cs_l.append(num / float(n) / float(n - 1) if n > 1
                        else None)
            vx = float(n * sxx - sx * sx)
            vy = float(n * syy - sy * sy)
            den = math.sqrt(vx * vy)
            r_l.append(num / den if n > 1 and den > 0 else None)
        return pa.table({
            group_col: g[group_col],
            "n": pa.array(n_l, type=pa.int64()),
            "covar_pop": pa.array(cp_l, type=pa.float64()),
            "covar_samp": pa.array(cs_l, type=pa.float64()),
            "corr": pa.array(r_l, type=pa.float64()),
        })

    return bucketed_map_groups(partial, [group_col], _final,
                               buckets=buckets, sort_within=False)


def group_ols(
    ds: "rd.Dataset", group_col: str, x_col: str, y_col: str, *,
    scale_x: int = 1, scale_y: int = 1, buckets: int | None = None,
) -> "rd.Dataset":
    """Exact per-group ordinary-least-squares fit ``y = slope·x +
    intercept``: ``(group, n, slope, intercept)`` — the grouped
    ``regr_slope/regr_intercept`` pair, sharing :func:`group_corr`'s
    exactness scheme: values pre-scale to integers, the five moment
    partials ``(n, Σx, Σy, Σx², Σxy)`` ride ONE group exchange as
    decimal128(38), and each statistic is a single float expression
    over exact big-int sums — bit-reproducible at any parallelism and
    by a SQL engine evaluating the same HUGEINT closed form:

        slope     = DBL(n·Σxy − Σx·Σy) / DBL(n·Σx² − Σx·Σx)
        intercept = (DBL(Σy) − slope·DBL(Σx)) / DBL(n)

    slope/intercept are in SCALED units.  Rows with either side null
    drop (SQL ``regr_*`` semantics); a constant-x or empty group
    yields SQL NULL for both statistics."""
    from ..functions import round_half_away

    def _partial(tab: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(tab[x_col]), pc.is_valid(tab[y_col]))
        tab = tab.filter(keep)
        xv = pa.array(round_half_away(
            pc.multiply(pc.cast(tab[x_col], pa.float64()),
                        float(scale_x)).to_numpy(zero_copy_only=False),
            0).astype(np.int64))
        yv = pa.array(round_half_away(
            pc.multiply(pc.cast(tab[y_col], pa.float64()),
                        float(scale_y)).to_numpy(zero_copy_only=False),
            0).astype(np.int64))
        dec = pa.decimal128(38, 0)
        t = pa.table({
            group_col: tab[group_col],
            "_x": pc.cast(xv, dec),
            "_y": pc.cast(yv, dec),
            "_xx": pc.cast(pc.multiply_checked(xv, xv), dec),
            "_xy": pc.cast(pc.multiply_checked(xv, yv), dec),
        })
        return agg_named(
            t, [group_col],
            [([], "count_all"), ("_x", "sum"), ("_y", "sum"),
             ("_xx", "sum"), ("_xy", "sum")],
            ["n", "sx", "sy", "sxx", "sxy"])

    partial = ds.select_columns(
        list(dict.fromkeys([group_col, x_col, y_col]))).map_batches(
        _partial, batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        g = agg_named(
            tab, [group_col],
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")],
            ["n", "sx", "sy", "sxx", "sxy"])
        n_l, sl_l, ic_l = [], [], []
        for i in range(g.num_rows):
            # O(groups) exact big-int closed form — groups, not rows
            n = int(g["n"][i].as_py())
            sx, sy, sxx, sxy = (int(g[c][i].as_py())
                                for c in ("sx", "sy", "sxx", "sxy"))
            den = float(n * sxx - sx * sx)
            n_l.append(n)
            if n == 0 or den == 0.0:
                sl_l.append(None)
                ic_l.append(None)
            else:
                slope = float(n * sxy - sx * sy) / den
                sl_l.append(slope)
                ic_l.append((float(sy) - slope * float(sx)) / float(n))
        return pa.table({
            group_col: g[group_col],
            "n": pa.array(n_l, type=pa.int64()),
            "slope": pa.array(sl_l, type=pa.float64()),
            "intercept": pa.array(ic_l, type=pa.float64()),
        })

    return bucketed_map_groups(partial, [group_col], _final,
                               buckets=buckets, sort_within=False)


def group_rollup(
    ds: "rd.Dataset", group_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]], *, buckets: int | None = None,
    level_col: str = "grouping_level",
) -> "rd.Dataset":
    """SQL ``GROUP BY ROLLUP(c1, .., cn)``: aggregate rows at every
    prefix level of ``group_cols`` in one pass — level 0 is the finest
    grouping, level k nulls out the LAST k key columns, level n is the
    grand total.  ``level_col`` counts rolled-away columns (identical
    to SQL ``GROUPING(c1)+..+GROUPING(cn)`` for a ROLLUP), which also
    disambiguates a rolled-up NULL from a data NULL.  ``aggs`` follows
    :func:`group_agg` — ``(col, op, out_name)`` with op in
    ``sum | min | max | count | count_all | mean``.

    Scale shape: each block first reduces to FINEST-level partials via
    Arrow hash aggregation (O(distinct groups) rows per block), then
    each partial row is replicated once per level with the rolled-up
    suffix nulled — the exchange therefore moves O(groups × (n+1))
    pre-aggregated rows, never raw rows — and ONE bucketed merge keyed
    on ``(keys.., level)`` finalizes every level together.  Coarse
    levels piggyback on the same shuffle instead of re-scanning the
    input n+1 times (what a UNION-of-GROUP-BYs plan would do)."""
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_rollup needs at least one group column")
    n = len(group_cols)
    # prefix masks: level k keeps the first n-k columns
    sets = [tuple(j < n - k for j in range(n)) for k in range(n + 1)]
    return _grouping_sets(ds, group_cols, aggs, sets,
                          level_values=list(range(n + 1)),
                          level_col=level_col, buckets=buckets)


def group_cube(
    ds: "rd.Dataset", group_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]], *, buckets: int | None = None,
    level_col: str = "grouping_id",
) -> "rd.Dataset":
    """SQL ``GROUP BY CUBE(c1, .., cn)``: one aggregate row set per
    SUBSET of ``group_cols`` (2^n sets), in the same one-exchange plan
    as :func:`group_rollup`.  ``level_col`` carries SQL's
    ``GROUPING_ID(c1, .., cn)`` bitmask — bit i (MSB-first, matching
    the SQL argument order) set iff ``c(i+1)`` is rolled away — which
    both names the subset and disambiguates rolled-up NULLs from data
    NULLs.  Keep n small: the replication factor is 2^n (n ≤ ~4 is the
    practical envelope, as in any engine's CUBE)."""
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cube needs at least one group column")
    n = len(group_cols)
    sets, ids = [], []
    for gid in range(2 ** n):
        # bit i of GROUPING_ID (MSB-first) set => column i rolled away
        sets.append(tuple(not (gid >> (n - 1 - j)) & 1
                          for j in range(n)))
        ids.append(gid)
    return _grouping_sets(ds, group_cols, aggs, sets, level_values=ids,
                          level_col=level_col, buckets=buckets)


def group_grouping_sets(
    ds: "rd.Dataset", group_cols: Sequence[str],
    sets: Sequence[Sequence[str]],
    aggs: Sequence[tuple[str, str, str]], *, buckets: int | None = None,
    level_col: str = "grouping_id",
) -> "rd.Dataset":
    """SQL ``GROUP BY GROUPING SETS (...)``: one aggregate row set per
    listed column subset, same one-exchange plan as
    :func:`group_rollup` / :func:`group_cube`.  Each entry of ``sets``
    names the columns KEPT in that set (order irrelevant; the empty
    tuple is the grand total); ``level_col`` carries the
    ``GROUPING_ID(group_cols...)`` bitmask of each set (bit i MSB-first
    set iff ``group_cols[i]`` is rolled away)."""
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_grouping_sets needs at least one group "
                         "column (same contract as rollup/cube)")
    n = len(group_cols)
    masks, ids, seen = [], [], set()
    for s in sets:
        sset = set(s)
        extra = sset - set(group_cols)
        if extra:
            raise ValueError(f"grouping set names non-key columns {extra}")
        keep = tuple(c in sset for c in group_cols)
        if keep in seen:
            raise ValueError(f"duplicate grouping set {tuple(s)!r}")
        seen.add(keep)
        masks.append(keep)
        ids.append(sum((not keep[j]) << (n - 1 - j) for j in range(n)))
    if not masks:
        raise ValueError("need at least one grouping set")
    return _grouping_sets(ds, group_cols, aggs, masks, level_values=ids,
                          level_col=level_col, buckets=buckets)


def _grouping_sets(
    ds: "rd.Dataset", group_cols: list, aggs, sets, *, level_values,
    level_col: str, buckets: int | None,
) -> "rd.Dataset":
    """Shared ROLLUP/CUBE plan: finest-level Arrow hash partials per
    block, one replicated row per grouping set (kept columns pass
    through, rolled columns nulled, ``level_col`` = the set's id), ONE
    bucketed merge keyed on ``(keys.., level)``."""
    if level_col in group_cols:
        raise ValueError(f"level_col {level_col!r} collides with a key")
    aggs = [(c, op, out) for (c, op, out) in aggs]
    ops_ok = {"sum", "min", "max", "count", "count_all", "mean"}
    for _, op, _ in aggs:
        if op not in ops_ok:
            raise ValueError(f"unknown agg op {op!r}")

    partials: list[tuple[str, str]] = []
    seen = set()

    def _need(col: str, fn: str) -> None:
        if (col, fn) not in seen:
            seen.add((col, fn))
            partials.append((col, fn))

    for col, op, _ in aggs:
        if op == "count_all":
            _need("", "count_all")
        elif op == "mean":
            _need(col, "sum")
            _need(col, "count")
        else:
            _need(col, op)

    def _pname(col: str, fn: str) -> str:
        return f"__p_{fn}" if fn == "count_all" else f"__p_{col}_{fn}"

    pnames = [_pname(c, fn) for c, fn in partials]
    in_cols = group_cols + sorted(
        {c for c, f in partials if c and c not in group_cols})

    def _partial(tab: pa.Table) -> pa.Table:
        spec = [([] if fn == "count_all" else c, fn) for c, fn in partials]
        g = agg_named(tab, group_cols, spec, pnames)
        # replicate once per grouping set, nulling the rolled columns;
        # the merge dedups within-set via (keys, level) grouping
        parts = []
        n = g.num_rows
        for keep, lid in zip(sets, level_values):
            cols: dict[str, pa.Array] = {}
            for j, c in enumerate(group_cols):
                cols[c] = g[c] if keep[j] else pa.nulls(
                    n, type=g.schema.field(c).type)
            cols[level_col] = pa.array(
                np.full(n, lid, dtype=np.int64))
            for pn in pnames:
                cols[pn] = g[pn]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    partial = ds.select_columns(in_cols).map_batches(
        _partial, batch_format="pyarrow")

    # SQL emits the all-rolled grouping set even over ZERO input rows
    # (grand total: counts 0, other aggregates NULL).  Seed each
    # all-rolled set with one NEUTRAL partial row — counts 0, every
    # other partial null — typed by running the partial fn over an
    # empty input: merged into non-empty data it changes nothing
    # (Arrow sum/min/max skip nulls, count += 0), and alone it yields
    # exactly the SQL row.
    rolled_ids = [lid for keep, lid in zip(sets, level_values)
                  if not any(keep)]
    if rolled_ids:
        in_schema = ds.schema().base_schema
        proto = _partial(pa.schema(
            [in_schema.field(c) for c in in_cols]).empty_table())
        cnt = {_pname(c, fn) for c, fn in partials
               if fn in ("count", "count_all")}
        m = len(rolled_ids)
        seed_cols = {}
        for f in proto.schema:
            if f.name == level_col:
                seed_cols[f.name] = pa.array(rolled_ids, type=f.type)
            elif f.name in cnt:
                seed_cols[f.name] = pa.array([0] * m, type=f.type)
            else:
                seed_cols[f.name] = pa.nulls(m, type=f.type)
        partial = partial.union(rd.from_arrow(pa.table(seed_cols)))

    merge_fn = {"sum": "sum", "min": "min", "max": "max",
                "count": "sum", "count_all": "sum"}
    merge_keys = group_cols + [level_col]

    def _final(tab: pa.Table) -> pa.Table:
        spec = [(_pname(c, fn), merge_fn[fn]) for c, fn in partials]
        g = agg_named(tab, merge_keys, spec, pnames)
        out = {c: g[c] for c in merge_keys}
        for col, op, name in aggs:
            if op == "count_all":
                out[name] = g[_pname("", "count_all")]
            elif op == "mean":
                cnt = g[_pname(col, "count")]
                out[name] = pc.if_else(
                    pc.equal(cnt, 0),
                    pa.nulls(g.num_rows, type=pa.float64()),
                    pc.divide(pc.cast(g[_pname(col, "sum")], pa.float64(),
                                      safe=False),
                              pc.cast(cnt, pa.float64(), safe=False)))
            else:
                out[name] = g[_pname(col, op)]
        return pa.table(out)

    return bucketed_map_groups(partial, merge_keys, _final,
                               buckets=buckets, sort_within=False)


def group_share(
    ds: "rd.Dataset", group_cols: Sequence[str], value_col: str, *,
    out_col: str = "share", round_digits: int = 6,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-row share of the group total — SQL ``v / sum(v) OVER
    (PARTITION BY g...)`` — appended as ``out_col`` (rounded half-away
    to ``round_digits`` so both engines emit the same float).  One hash
    shuffle; the per-group totals are one segment-``reduceat`` over the
    bucket-sorted values repeated back onto the rows — no per-group
    Python, no join-back second pass.  Null values contribute 0 to the
    total and get a null share; an all-null/zero-total group divides to
    null (SQL NULL), never NaN.  Integer values accumulate in int64
    (exact totals), floats in float64."""
    from ..functions import round_half_away

    group_cols = list(group_cols)

    def _share(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column(out_col,
                                     pa.array([], type=pa.float64()))
        tab = tab.sort_by([(c, "ascending") for c in group_cols])
        n = tab.num_rows
        starts = np.flatnonzero(segment_starts(tab, group_cols))
        sizes = np.diff(np.append(starts, n))
        v = tab[value_col].combine_chunks()
        is_int = pa.types.is_integer(v.type)
        vnum = pc.cast(v, pa.int64() if is_int else pa.float64()) \
            .fill_null(0).to_numpy(zero_copy_only=False)
        totals = np.add.reduceat(vnum, starts)
        tot_row = np.repeat(totals, sizes).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            share = round_half_away(
                vnum.astype(np.float64) / tot_row, round_digits)
        valid = (tot_row != 0.0) & ~np.asarray(
            v.is_null() if v.null_count else np.zeros(n, dtype=bool))
        return tab.append_column(out_col, pa.array(
            np.where(valid, share, np.nan), type=pa.float64(),
            mask=~valid))

    return bucketed_map_groups(ds, group_cols, _share, buckets=buckets,
                               sort_within=False)


def group_running(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group window functions over ``order_cols`` order:
    ``(group, order..., value, row_number, running_sum, lag)`` —
    ``row_number`` 1-based, ``running_sum`` the inclusive prefix sum of
    ``value_col``, ``lag`` the previous row's value (null at each group
    start).  SQL analogue: ``row_number() / sum(v) over (partition by g
    order by o rows unbounded preceding) / lag(v)``.

    One hash shuffle; all three windows are computed vectorized over
    the bucket-sorted arrays (segment-reset prefix sums via
    ``np.cumsum`` minus group-start offsets), never per-group Python.
    Prefix sums are sequential left-to-right per group, matching SQL's
    running-frame addition order.  Integer value columns accumulate in
    int64 end-to-end (``running_sum`` comes out int64, exact at any
    bucket-wide total — a float64 bucket-wide prefix would lose
    integer exactness past 2^53 even for small groups); float columns
    accumulate in float64.  Null values contribute 0 to
    ``running_sum`` (SQL returns NULL until the first non-null; use a
    non-null value column when oracle-matching)."""
    order_cols = list(order_cols)

    def _win(tab: pa.Table) -> pa.Table:
        sort_keys = [(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols]
        tab = tab.sort_by(sort_keys)
        n = tab.num_rows
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, sizes)
        v = tab[value_col].combine_chunks()
        is_int = pa.types.is_integer(v.type)
        acc_type = pa.int64() if is_int else pa.float64()
        vnum = pc.cast(v, acc_type).fill_null(
            0 if is_int else 0.0).to_numpy(zero_copy_only=False)
        # int64 cumsum wraps (two's complement) if the BUCKET-wide
        # total exceeds 2^63, but the per-group difference cs-base is
        # still exact whenever the group's own running total fits
        # int64 — modular arithmetic cancels the wrap
        cs = np.cumsum(vnum)
        zero = np.zeros(1, dtype=vnum.dtype)
        base = np.concatenate([zero, cs])[np.repeat(starts, sizes)]
        running = cs - base
        # lag: previous row within group, null at group starts
        lag_idx = np.arange(n) - 1
        lag = pc.if_else(pa.array(new), pa.nulls(n, type=v.type),
                         v.take(pa.array(np.maximum(lag_idx, 0))))
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        out[value_col] = v
        out["row_number"] = pa.array((pos + 1).astype(np.int64))
        out["running_sum"] = pa.array(running)
        out["lag"] = lag
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [value_col]))),
        [group_col], _win, buckets=buckets, sort_within=False)


def group_window_rank(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, ntile_n: int = 4, buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group ranking windows over ``order_cols`` order:
    ``(group, order..., value, rank, dense_rank, percent_rank,
    cume_dist, ntile, lead, first_value, last_value)`` — SQL
    ``rank()/dense_rank()/percent_rank()/cume_dist()/ntile(n)/
    lead(v)/first_value(v)`` over ``(PARTITION BY g ORDER BY o...)``
    and ``last_value(v)`` with the UNBOUNDED FOLLOWING frame (the SQL
    default frame would make last_value the current row).

    Tie semantics are SQL's: tied order keys share rank/dense_rank/
    percent_rank, and ``cume_dist`` counts through the END of the tie
    run.  Order-dependent outputs (``lead``, ``ntile``) follow the
    sorted position; give a unique order key when comparing against an
    engine whose tie order differs.

    One hash shuffle on the group key; every window is computed
    vectorized over the bucket-sorted arrays (segment-reset prefix
    sums, run-start forward fills, one Arrow ``take`` per value
    window) — no per-group Python.  ``percent_rank`` of a one-row
    group is 0.0 (SQL's 0/0 convention)."""
    order_cols = list(order_cols)
    if ntile_n < 1:
        raise ValueError("ntile_n must be >= 1")

    def _win(tab: pa.Table) -> pa.Table:
        sort_keys = [(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols]
        tab = tab.sort_by(sort_keys)
        n = tab.num_rows
        if n == 0:
            vt = tab[value_col].type
            out = {group_col: tab[group_col]}
            for c in order_cols:
                out[c] = tab[c]
            out[value_col] = tab[value_col]
            for name, t in [("rank", pa.int64()),
                            ("dense_rank", pa.int64()),
                            ("percent_rank", pa.float64()),
                            ("cume_dist", pa.float64()),
                            ("ntile", pa.int64()),
                            ("lead", vt), ("first_value", vt),
                            ("last_value", vt)]:
                out[name] = pa.nulls(0, type=t)
            return pa.table(out)
        new_g = segment_starts(tab, [group_col])
        new_run = segment_starts(tab, [group_col] + order_cols)
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, sizes)          # group start idx/row
        size_r = np.repeat(sizes, sizes)           # group size/row
        pos = np.arange(n) - gstart                # 0-based in group
        idx = np.arange(n)
        # rank: 1 + offset of the current tie-run's first row
        run_start = np.maximum.accumulate(np.where(new_run, idx, -1))
        rank = run_start - gstart + 1
        # dense_rank: tie-run ordinal within the group
        run_ord = np.cumsum(new_run)               # global run id, 1-based
        dense = run_ord - np.repeat(run_ord[starts] - 1, sizes)
        # percent_rank: (rank-1)/(n-1), 0.0 for n==1
        with np.errstate(invalid="ignore"):
            prank = np.where(size_r > 1, (rank - 1) / np.maximum(
                size_r - 1, 1), 0.0)
        # cume_dist: rows through the end of the tie run / group size
        run_last = idx[np.append(new_run[1:], True)]   # last idx per run
        cume = (run_last[run_ord - 1] - gstart + 1) / size_r
        # ntile(k), SQL semantics: q=n//k rows per tile, first n%k
        # tiles get one extra; n<k -> each row its own tile
        k = ntile_n
        q, r = size_r // k, size_r % k
        big = r * (q + 1)                          # rows in the fat tiles
        tile = np.where(
            q == 0, pos + 1,
            np.where(pos < big, pos // np.maximum(q + 1, 1) + 1,
                     r + (pos - big) // np.maximum(q, 1) + 1))
        v = tab[value_col].combine_chunks()
        # lead: next row's value, null at each group's last row
        last_in_g = np.append(new_g[1:], True)
        lead = pc.if_else(
            pa.array(last_in_g), pa.nulls(n, type=v.type),
            v.take(pa.array(np.minimum(idx + 1, n - 1))))
        first_v = v.take(pa.array(gstart))
        last_v = v.take(pa.array(gstart + size_r - 1))
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        out[value_col] = v
        out["rank"] = pa.array(rank.astype(np.int64))
        out["dense_rank"] = pa.array(dense.astype(np.int64))
        out["percent_rank"] = pa.array(prank.astype(np.float64))
        out["cume_dist"] = pa.array(cume.astype(np.float64))
        out["ntile"] = pa.array(tile.astype(np.int64))
        out["lead"] = lead
        out["first_value"] = first_v
        out["last_value"] = last_v
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [value_col]))),
        [group_col], _win, buckets=buckets, sort_within=False)


def explode(
    ds: "rd.Dataset", list_col: str, keep_cols: Sequence[str], *,
    value_col: str = "val", pos_col: str = "pos", one_based: bool = True,
) -> "rd.Dataset":
    """UNNEST WITH ORDINALITY: one output row per list element —
    ``(keep..., pos, val)``; null and empty lists contribute no rows
    (SQL UNNEST semantics).  Stateless per-batch stage, fully
    vectorized: ``pc.list_flatten`` + ``pc.list_parent_indices`` gather
    the values and the parent rows, and the per-parent ordinal comes
    from one exclusive prefix sum over the list lengths — no Python
    per row, no shuffle (row expansion happens inside the block, and
    Ray re-splits oversized output blocks downstream)."""
    keep_cols = list(keep_cols)

    def _explode(tab: pa.Table) -> pa.Table:
        arr = tab[list_col].combine_chunks()
        flat = pc.list_flatten(arr)
        parent = pc.list_parent_indices(arr)
        lens = pc.list_value_length(arr).fill_null(0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.cumsum(lens) - lens
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        if one_based:
            pos += 1
        out = {c: tab[c].combine_chunks().take(parent) for c in keep_cols}
        out[pos_col] = pa.array(pos)
        out[value_col] = flat
        return pa.table(out)

    return ds.select_columns(keep_cols + [list_col]).map_batches(
        _explode, batch_format="pyarrow")


def unpivot(
    ds: "rd.Dataset", keep_cols: Sequence[str], value_cols: Sequence[str],
    *, name_col: str = "measure", value_col: str = "value",
    include_nulls: bool = True,
) -> "rd.Dataset":
    """Wide → long (SQL UNPIVOT / pandas melt): one output row per
    (input row × value column) — ``(keep..., name, value)``.  Value
    columns are cast to a common Arrow type (unified via
    ``pa.unify_schemas`` promotion; mixed int/float promotes to
    float64).  ``include_nulls=False`` drops rows whose measure is
    null (SQL UNPIVOT's default EXCLUDE NULLS; the default here keeps
    them, matching the UNION ALL construction).

    Stateless per-batch stage: k vertical slices concatenated — no
    shuffle, no row loops; row expansion happens inside the block and
    Ray re-splits oversized output blocks downstream."""
    keep_cols, value_cols = list(keep_cols), list(value_cols)
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def _melt(tab: pa.Table) -> pa.Table:
        vt = pa.unify_schemas(
            [pa.schema([pa.field("v", tab[c].type)]) for c in value_cols],
            promote_options="permissive").field("v").type
        parts = []
        for c in value_cols:
            v = pc.cast(tab[c], vt)
            part = pa.table(
                {**{k: tab[k] for k in keep_cols},
                 name_col: pa.array([c] * tab.num_rows, type=pa.string()),
                 value_col: v})
            if not include_nulls:
                part = part.filter(pc.is_valid(part[value_col]))
            parts.append(part)
        return pa.concat_tables(parts)

    return ds.select_columns(
        list(dict.fromkeys(keep_cols + value_cols))).map_batches(
        _melt, batch_format="pyarrow")


def dataset_set_op(
    left: "rd.Dataset", right: "rd.Dataset", cols: Sequence[str], *,
    op: str, buckets: int | None = None,
) -> "rd.Dataset":
    """SQL set operations with DISTINCT semantics — ``op='except'``
    (rows of ``left`` absent from ``right``), ``op='intersect'``
    (rows present in both), or ``op='union'`` (distinct rows of
    either side); output is the deduplicated ``cols`` projection.
    SQL row equality: nulls compare EQUAL here (a row of nulls in
    both sides intersects), matching EXCEPT/INTERSECT/UNION.

    One hash exchange over both projected sides (a side flag rides
    along); inside each bucket the union is sorted once and each
    distinct-row run reduces to (any_left, any_right) via one bincount
    over run ids — no per-row Python, no driver-side sets.  Both
    inputs stream; only the deduplicated keys move."""
    if op not in ("except", "intersect", "union"):
        raise ValueError("op must be 'except', 'intersect' or 'union'")
    cols = list(cols)

    def _flag(side: int):
        def _f(tab: pa.Table) -> pa.Table:
            return tab.select(cols).append_column(
                "_side", pa.array(
                    np.full(tab.num_rows, side, dtype=np.int8)))
        return _f

    both = left.map_batches(_flag(0), batch_format="pyarrow").union(
        right.map_batches(_flag(1), batch_format="pyarrow"))

    def _reduce(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending") for c in cols])
        n = tab.num_rows
        if n == 0:
            return tab.select(cols)
        new = segment_starts(tab, cols)
        run = np.cumsum(new) - 1                    # 0-based run id
        side = tab["_side"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_runs = run[-1] + 1
        in_left = np.bincount(run, weights=1 - side,
                              minlength=n_runs) > 0
        in_right = np.bincount(run, weights=side, minlength=n_runs) > 0
        keep_run = (in_left & ~in_right) if op == "except" \
            else (in_left & in_right) if op == "intersect" \
            else (in_left | in_right)
        firsts = np.flatnonzero(new)
        pick = firsts[keep_run]
        return tab.select(cols).take(pa.array(pick))

    return bucketed_map_groups(both, cols, _reduce, buckets=buckets,
                               sort_within=False)


def interval_concurrency(
    ds: "rd.Dataset", group_col: str, start_col: str, end_col: str, *,
    out_col: str = "max_concurrent", buckets: int | None = None,
) -> "rd.Dataset":
    """Maximum number of simultaneously open intervals per group —
    ``(group, max_concurrent)``.  The classic boundary sweep: +1 at
    each start, -1 at each end, running sum, max.  End boundaries are
    EXCLUSIVE (an interval ending exactly when another starts does not
    overlap it): ties sort (end, start) so the -1 applies first —
    reproducible in SQL as ``sum(delta) OVER (PARTITION BY g ORDER BY
    bts, delta ROWS UNBOUNDED PRECEDING)`` then ``max()``.  Rows with
    a null start or end are skipped (SQL's WHERE IS NOT NULL).

    One hash exchange on the group key; the 2n boundary rows are built
    vectorized inside each bucket (never shuffled), the per-group max
    is one ``maximum.reduceat`` over the segment-reset prefix sum."""

    def _sweep(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.and_(pc.is_valid(tab[start_col]),
                                 pc.is_valid(tab[end_col])))
        n = tab.num_rows
        if n == 0:
            return pa.table({group_col: tab[group_col],
                             out_col: pa.array([], type=pa.int64())})
        s = pc.cast(tab[start_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        e = pc.cast(tab[end_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        g = tab[group_col].combine_chunks()
        bounds = pa.table({
            group_col: pa.concat_arrays([g, g]),
            "_bts": pa.array(np.concatenate([s, e])),
            "_delta": pa.array(np.concatenate([
                np.ones(n, dtype=np.int64),
                -np.ones(n, dtype=np.int64)])),
        }).sort_by([(group_col, "ascending"), ("_bts", "ascending"),
                    ("_delta", "ascending")])
        new = segment_starts(bounds, [group_col])
        starts = np.flatnonzero(new)
        d = bounds["_delta"].combine_chunks().to_numpy(
            zero_copy_only=False)
        cs = np.cumsum(d)
        base = np.concatenate([[0], cs])[starts]
        sizes = np.diff(np.append(starts, len(d)))
        running = cs - np.repeat(base, sizes)
        peak = np.maximum.reduceat(running, starts)
        return pa.table({
            group_col: bounds[group_col].take(pa.array(starts)),
            out_col: pa.array(peak.astype(np.int64))})

    return bucketed_map_groups(
        ds.select_columns([group_col, start_col, end_col]),
        [group_col], _sweep, buckets=buckets, sort_within=False)


def group_latest(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str], *,
    descending: bool = True, buckets: int | None = None,
) -> "rd.Dataset":
    """One FULL row per group: the row that sorts first by
    ``order_cols`` (descending by default — latest-event-per-key, the
    arg_max shape; ``descending=False`` gives arg_min).  Make
    ``order_cols`` a total order within each group (e.g. include a
    unique id) for a deterministic pick under ties.

    One hash shuffle; the winners are one ``take`` of the group-start
    offsets over the bucket-sorted table — no per-group Python and no
    second pass."""
    order_cols = list(order_cols)
    order = "descending" if descending else "ascending"

    def _first(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, order) for c in order_cols])
        firsts = np.flatnonzero(segment_starts(tab, [group_col]))
        return tab.take(pa.array(firsts))

    return bucketed_map_groups(ds, [group_col], _first,
                               buckets=buckets, sort_within=False)


def group_concat(
    ds: "rd.Dataset", group_col: str, value_col: str,
    order_cols: Sequence[str], *, sep: str = ",",
    out_col: str = "concat", buckets: int | None = None,
) -> "rd.Dataset":
    """SQL ``string_agg(value, sep ORDER BY order_cols)`` per group:
    ``(group, out_col)``.  Make ``order_cols`` a total order within
    each group for a deterministic result.

    One hash shuffle; inside the bucket the table is sorted once by
    (group, order…), list offsets are derived from the cumulative
    valid-value counts at segment boundaries, and the join is ONE
    ``pc.binary_join`` over a zero-copy ListArray — no per-group
    Python anywhere.  Null values are skipped and an all-null group
    yields SQL NULL (string_agg semantics).  ``value_col`` must be a
    string column (cast upstream; int casts render identically to SQL
    ``CAST(x AS VARCHAR)``)."""
    order_cols = list(order_cols)

    def _concat(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=tab[group_col].type),
                out_col: pa.array([], type=pa.string())})
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        starts = np.flatnonzero(segment_starts(tab, [group_col]))
        ends = np.append(starts[1:], tab.num_rows)
        v = pc.cast(tab[value_col], pa.string()).combine_chunks()
        valid = v.is_valid().to_numpy(zero_copy_only=False).astype(
            np.int64)
        vcum = np.concatenate([[0], np.cumsum(valid)])
        offs = np.empty(len(starts) + 1, dtype=np.int32)
        offs[0] = vcum[starts[0]]
        offs[1:] = vcum[ends]
        lists = pa.ListArray.from_arrays(
            pa.array(offs - offs[0], type=pa.int32()),
            v.filter(pa.array(valid.astype(bool))))
        joined = pc.binary_join(lists, sep)
        n_valid = offs[1:] - offs[:-1]
        out = pc.if_else(pa.array(n_valid > 0), joined,
                         pa.nulls(len(starts), type=pa.string()))
        return pa.table({
            group_col: tab[group_col].take(pa.array(starts)),
            out_col: out})

    cols = list(dict.fromkeys([group_col, value_col] + order_cols))
    return bucketed_map_groups(
        ds.select_columns(cols), [group_col], _concat,
        buckets=buckets, sort_within=False)


def sequence_pattern_flags(
    ds: "rd.Dataset", group_col: str, token_col: str,
    order_cols: Sequence[str], *, patterns: dict[str, str],
    sep: str = "", out_col: str = "seq",
    buckets: int | None = None,
) -> "rd.Dataset":
    """Sequence-shape validation per group (the transcript engine's
    MATCH_RECOGNIZE-lite): the group's ``token_col`` values concatenate
    in ``order_cols`` order (``sep`` between tokens) and each named
    RE2 ``patterns`` entry emits a boolean column — True iff the
    regex FINDS a match in the sequence string (anchor with ``^``/``$``
    inside the pattern for full-sequence shapes).  Arrow and DuckDB
    both run RE2, so ``regexp_matches(seq, pattern)`` mirrors every
    flag bit-for-bit.

    Output: ``(group, out_col, <one bool col per pattern>)``.  A group
    whose tokens are all null has a NULL sequence and NULL flags (SQL
    semantics).  One hash exchange (``group_concat``) plus a
    per-batch vectorized regex pass; the sequence string is O(group
    turns) — transcripts are bounded by the DoS byte caps upstream,
    but pass ``sep`` and single-char tokens to keep it minimal."""
    seqs = group_concat(ds, group_col, token_col, order_cols,
                        sep=sep, out_col=out_col, buckets=buckets)

    def _flags(tab: pa.Table) -> pa.Table:
        out = {group_col: tab[group_col], out_col: tab[out_col]}
        for name, rx in patterns.items():
            out[name] = pc.match_substring_regex(tab[out_col], rx)
        return pa.table(out)

    return seqs.map_batches(_flags, batch_format="pyarrow")


def group_rolling_time(
    ds: "rd.Dataset", group_col: str, ts_col: str, value_col: str, *,
    width: int, following: int = 0, buckets: int | None = None,
) -> "rd.Dataset":
    """TIME-range rolling aggregates per group — SQL
    ``SUM/COUNT(v) OVER (PARTITION BY g ORDER BY ts RANGE BETWEEN
    width PRECEDING AND following FOLLOWING)``: ``(group, ts, value,
    w_sum, w_n)``.  ``following=0`` (default) is the trailing
    ``CURRENT ROW`` frame; a positive ``following`` gives the
    centered / forward frame (e.g. ``width=following=30min`` is the
    ±30-minute smoother).  Units are the timestamp's own (µs for
    Arrow timestamps) and the frame is inclusive on both ends; rows
    sharing a timestamp are PEERS — every peer's frame extends
    through the LAST peer, exactly as SQL RANGE mode does.

    One hash shuffle; inside the bucket the table sorts once by
    (group, ts) and each group's window bounds come from two
    ``np.searchsorted`` calls over its sorted timestamps with a
    prefix-sum difference for the sums — an O(groups)-iteration loop
    per bucket, never per-row Python.  Integer value columns stay
    int64-exact; nulls add 0 to the sum and are excluded from
    ``w_n`` (SQL aggregate null semantics).  Null timestamps are
    excluded entirely (SQL RANGE ORDER BY semantics are peers-of-null;
    this engine drops them — keep timestamps non-null upstream)."""
    if width <= 0:
        raise ValueError("width must be positive")
    if following < 0:
        raise ValueError("following must be >= 0 (it extends the "
                         "frame forward; shrink with width instead)")

    def _roll(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[ts_col]))
        if tab.num_rows == 0:
            sum_t = pa.int64() if pa.types.is_integer(
                tab[value_col].type) else pa.float64()
            return pa.table({
                group_col: pa.array([], type=tab[group_col].type),
                ts_col: pa.array([], type=tab[ts_col].type),
                value_col: pa.array([], type=tab[value_col].type),
                "w_sum": pa.array([], type=sum_t),
                "w_n": pa.array([], type=pa.int64())})
        tab = tab.sort_by([(group_col, "ascending"),
                           (ts_col, "ascending")])
        n = tab.num_rows
        starts = np.flatnonzero(segment_starts(tab, [group_col]))
        ends = np.append(starts[1:], n)
        ts = pc.cast(tab[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = tab[value_col].combine_chunks()
        valid = v.is_valid().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # integer columns stay int64-exact; floats accumulate float64
        # (the sibling group_rolling/group_running contract — a blind
        # int64 cast would silently truncate float values)
        is_int = pa.types.is_integer(v.type)
        vnum = v.fill_null(0).to_numpy(zero_copy_only=False)
        vnum = vnum.astype(np.int64 if is_int else np.float64)
        cs = np.concatenate([[0], np.cumsum(vnum)])
        cn = np.concatenate([[0], np.cumsum(valid)])
        w_sum = np.empty(n, dtype=vnum.dtype)
        w_n = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = s + np.searchsorted(seg, seg - width, side="left")
            hi = s + np.searchsorted(seg, seg + following, side="right")
            w_sum[s:e] = cs[hi] - cs[lo]
            w_n[s:e] = cn[hi] - cn[lo]
        # SQL SUM over a frame with no non-null values is NULL, not 0
        sums = pc.if_else(
            pa.array(w_n > 0), pa.array(w_sum),
            pa.nulls(n, type=pa.int64() if is_int else pa.float64()))
        return pa.table({
            group_col: tab[group_col],
            ts_col: tab[ts_col],
            value_col: tab[value_col],
            "w_sum": sums,
            "w_n": pa.array(w_n)})

    cols = list(dict.fromkeys([group_col, ts_col, value_col]))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _roll, buckets=buckets,
                               sort_within=False)


def group_rolling(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, window: int, buckets: int | None = None,
) -> "rd.Dataset":
    """Trailing-frame rolling aggregates per group: for each row (in
    ``order_cols`` order within ``group_col``) the sum / count / mean
    of ``value_col`` over the frame ``ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW``.  Output ``(group, order..., value, rolling_sum,
    rolling_n, rolling_mean)``; frames at a group's head are partial
    (SQL semantics).

    One hash shuffle; the sliding sums come from one prefix-sum pass
    (``cs[i+1] - cs[max(i-window+1, group_start)]``) — no per-group
    iteration and no O(n*window) work.  Use an integer value column
    for bit-exact cross-engine sums; ``rolling_mean`` is the single
    division sum/n in float64 (reproducible).  Nulls contribute 0 to
    the sum but still occupy a frame slot (pair with a non-null
    column when oracle-matching, as SQL excludes nulls from AVG)."""
    order_cols = list(order_cols)
    if window <= 0:
        raise ValueError("window must be positive")

    def _roll(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, sizes)
        v = tab[value_col].combine_chunks()
        is_int = pa.types.is_integer(v.type)
        vnum = v.fill_null(0).to_numpy(zero_copy_only=False)
        if is_int:
            vnum = vnum.astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(vnum)])
        idx = np.arange(n)
        frame_lo = np.maximum(idx - window + 1, gstart)
        roll = cs[idx + 1] - cs[frame_lo]
        nrows = idx + 1 - frame_lo
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        out[value_col] = v
        out["rolling_sum"] = pa.array(
            roll, type=pa.int64() if is_int else pa.float64())
        out["rolling_n"] = pa.array(nrows.astype(np.int64))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = roll.astype(np.float64) / nrows
        out["rolling_mean"] = pa.array(mean)
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [value_col]))),
        [group_col], _roll, buckets=buckets, sort_within=False)


def group_rank(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    descending: bool = True, keep_cols: Sequence[str] = (),
    buckets: int | None = None,
) -> "rd.Dataset":
    """SQL ranking windows per group over ``value_col``: output
    ``(keep..., group, value, rank, dense_rank, percent_rank)`` with
    gaps-on-ties ``rank``, gapless ``dense_rank``, and
    ``percent_rank = (rank-1)/(group_size-1)`` (0 for single-row
    groups, per SQL).  Rank ties are decided by ``value_col`` alone;
    nulls sort last (match with NULLS LAST in the oracle).

    One hash shuffle; ranks are computed from two segment-start masks
    over the bucket-sorted arrays (group boundaries and (group,value)
    boundaries) — a rank is its value-segment's first offset within
    the group, dense_rank the count of value segments so far; no
    per-group Python."""
    keep_cols = list(keep_cols)
    order = "descending" if descending else "ascending"

    def _rank(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending"), (value_col, order)])
        n = tab.num_rows
        new_g = segment_starts(tab, [group_col])
        new_v = segment_starts(tab, [group_col, value_col])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, sizes)
        gsize = np.repeat(sizes, sizes)
        vstarts = np.flatnonzero(new_v)
        vsizes = np.diff(np.append(vstarts, n))
        first_idx = np.repeat(vstarts, vsizes)
        rank = first_idx - gstart + 1
        seg_ord = np.cumsum(new_v)
        dense = seg_ord - np.repeat(seg_ord[starts], sizes) + 1
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.where(gsize > 1, (rank - 1) / np.maximum(gsize - 1, 1),
                           0.0)
        out = {c: tab[c] for c in keep_cols}
        out[group_col] = tab[group_col]
        out[value_col] = tab[value_col]
        out["rank"] = pa.array(rank.astype(np.int64))
        out["dense_rank"] = pa.array(dense.astype(np.int64))
        out["percent_rank"] = pa.array(pct)
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(keep_cols + [group_col, value_col]),
        [group_col], _rank, buckets=buckets, sort_within=False)


def group_ntile(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    n_tiles: int, *, descending: bool = True,
    keep_cols: Sequence[str] = (), buckets: int | None = None,
) -> "rd.Dataset":
    """SQL NTILE per group: output ``(keep..., group, order...,
    tile)`` with ``tile`` in ``1..n_tiles``, bucket sizes differing by
    at most one and larger buckets first (exact SQL semantics).  Make
    ``order_cols`` a total order within each group (include a unique
    id) — NTILE of tied rows is otherwise engine-dependent.

    One hash shuffle; the tile comes from the row's offset within its
    group (``q = size // n, r = size % n``: the first ``r`` buckets
    hold ``q+1`` rows) — pure arithmetic over the segment offsets, no
    per-group Python."""
    order_cols = list(order_cols)
    keep_cols = list(keep_cols)
    if n_tiles <= 0:
        raise ValueError("n_tiles must be positive")
    order = "descending" if descending else "ascending"

    def _ntile(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, order) for c in order_cols])
        n = tab.num_rows
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, sizes)
        gsize = np.repeat(sizes, sizes)
        q, r = gsize // n_tiles, gsize % n_tiles
        big = r * (q + 1)  # rows covered by the q+1-sized buckets
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                pos < big,
                pos // np.maximum(q + 1, 1),
                r + (pos - big) // np.maximum(q, 1))
        out = {c: tab[c] for c in keep_cols}
        out[group_col] = tab[group_col]
        for c in order_cols:
            out[c] = tab[c]
        out["tile"] = pa.array((tile + 1).astype(np.int64))
        return pa.table(out)

    cols = list(dict.fromkeys(keep_cols + [group_col] + order_cols))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _ntile, buckets=buckets,
                               sort_within=False)


def pack_bins(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    weight_col: str, *, budget: int, buckets: int | None = None,
) -> "rd.Dataset":
    """Sequence packing: assign consecutive items (in ``order_cols``
    order within each group) to bins of capacity ``budget`` by
    cumulative weight — the batch/context packing step of a training
    pipeline.  Output ``(group, order..., weight, bin, bin_offset)``
    with ``bin = floor(exclusive_prefix_sum / budget)`` and
    ``bin_offset`` the item's start offset inside its bin's weight
    budget.

    Semantics note: an item whose weight straddles a bin boundary
    stays WHOLLY in the bin where it starts, so a bin can exceed
    ``budget`` by at most ``max(weight) - 1`` (contiguous-fill
    packing).  This keeps the assignment a pure prefix-sum — exactly
    reproducible by any SQL engine with a running-sum window and
    vectorizable with no per-group iteration — unlike strict greedy
    packing, whose reset-on-overflow recurrence is inherently
    sequential.  Pre-chunk oversized items (``chunk_documents``) when
    hard capacity matters.

    One hash shuffle on the group key; prefix sums are segment-reset
    vectorized over the bucket sort (same shape as
    ``group_running``)."""
    order_cols = list(order_cols)
    if budget <= 0:
        raise ValueError("budget must be positive")

    def _pack(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        w = pc.cast(tab[weight_col], pa.int64()).fill_null(0) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        cs = np.cumsum(w)
        base = np.concatenate([[0], cs])[np.repeat(starts, sizes)]
        excl = (cs - w) - base  # exclusive prefix sum within group
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        out[weight_col] = tab[weight_col]
        out["bin"] = pa.array(excl // budget, type=pa.int64())
        out["bin_offset"] = pa.array(excl % budget, type=pa.int64())
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [weight_col]))),
        [group_col], _pack, buckets=buckets, sort_within=False)


def assemble_sequences(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, sep: str = "|", buckets: int | None = None,
) -> "rd.Dataset":
    """Reassemble each group's ordered values into one row:
    ``(group, n, seq)`` — e.g. turns back into a conversation document
    (the input shape for conversation-level dedup/fingerprinting), or a
    user's event path.  Null values are skipped (SQL ``string_agg``
    semantics); ``n`` counts the joined values.

    One hash shuffle on the group key; the join is a single vectorized
    ``pc.binary_join`` over a ListArray built from the segment offsets
    of the bucket-sorted column — no per-group Python, no per-row
    string concatenation."""
    order_cols = list(order_cols)
    need = list(dict.fromkeys([group_col, *order_cols, value_col]))

    def _asm(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[value_col]))
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=tab[group_col].type),
                "n": pa.array([], type=pa.int64()),
                "seq": pa.array([], type=pa.string())})
        tab = tab.sort_by([(c, "ascending")
                           for c in [group_col, *order_cols]])
        new = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new)
        offsets = np.append(starts, tab.num_rows).astype(np.int32)
        values = pc.cast(tab[value_col], pa.string()).combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets), values)
        return pa.table({
            group_col: tab[group_col].take(pa.array(starts)),
            "n": pa.array(np.diff(offsets).astype(np.int64)),
            "seq": pc.binary_join(lists, sep),
        })

    return bucketed_map_groups(ds.select_columns(need), [group_col],
                               _asm, buckets=buckets, sort_within=False)


def group_histogram(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    lo: float, hi: float, n_bins: int = 10, buckets: int | None = None,
) -> "rd.Dataset":
    """Fixed-bin per-group histogram: ``(group, bin, n)`` with
    ``bin = clamp(floor((v - lo) / width), 0, n_bins-1)`` over non-null
    values (the PSI/drift bucketing as a standalone exact operator).

    Partial aggregation: each block reduces to its distinct
    (group, bin, count) triples BEFORE the shuffle, so only
    O(groups x bins) rows per block move."""
    width = (hi - lo) / n_bins

    def _partial(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[value_col]))
        v = pc.cast(tab[value_col], pa.float64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        b = np.clip(np.floor((v - lo) / width), 0,
                    n_bins - 1).astype(np.int64)
        t = tab.select([group_col]).append_column("bin", pa.array(b))
        return agg_named(t, [group_col, "bin"],
                         [([], "count_all")], ["n"])

    partial = ds.select_columns([group_col, value_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _sum(tab: pa.Table) -> pa.Table:
        return agg_named(tab, [group_col, "bin"], [("n", "sum")], ["n"])

    return bucketed_map_groups(partial, [group_col], _sum,
                               buckets=buckets, sort_within=False)


def pivot_counts(
    ds: "rd.Dataset", group_col: str, cat_col: str,
    categories: Sequence[str], *, buckets: int | None = None,
    other: str | None = "other",
) -> "rd.Dataset":
    """Pivot (crosstab): one row per group with a count column per
    declared category — ``(group, n_<cat1>, ..., n_other)``.  The
    category set is DECLARED, not discovered, so the output schema is
    fixed and every stage stays vectorized (discovery would need an
    extra pass; run ``profile`` first if the domain is unknown).

    Partial aggregation: each block reduces to its (group, category)
    counts via one dictionary-encode + bincount BEFORE the shuffle, so
    only O(groups x categories) rows per block move; the final merge is
    a per-bucket sum.  ``other`` names the catch-all column for values
    outside ``categories`` (None drops them)."""
    categories = list(categories)
    n_cat = len(categories)
    cat_index = {c: i for i, c in enumerate(categories)}
    cols = [f"n_{c}" for c in categories] + (
        [f"n_{other}"] if other is not None else [])

    def _partial(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            out = {group_col: tab[group_col]}
            for c in cols:
                out[c] = pa.array([], type=pa.int64())
            return pa.table(out)
        enc = pc.dictionary_encode(
            pc.cast(tab[cat_col], pa.string()).combine_chunks())
        # map dictionary values -> declared category slots once per
        # distinct value, not per row
        dict_vals = enc.dictionary.to_pylist()
        slot_of = np.array(
            [cat_index.get(v, n_cat) for v in dict_vals], dtype=np.int64)
        idx = enc.indices.fill_null(len(dict_vals)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        slot_of = np.concatenate([slot_of, [n_cat]])  # nulls -> other
        slots = slot_of[idx]
        genc = pc.dictionary_encode(tab[group_col].combine_chunks())
        n_g = len(genc.dictionary)
        # a null group is its own SQL GROUP BY group: give it slot n_g
        gidx = genc.indices.fill_null(n_g).to_numpy(
            zero_copy_only=False).astype(np.int64)
        has_null_g = bool((gidx == n_g).any())
        n_rows_g = n_g + (1 if has_null_g else 0)
        width = n_cat + 1
        counts = np.bincount(gidx * width + slots,
                             minlength=n_rows_g * width)[
                                 :n_rows_g * width].reshape(n_rows_g, width)
        gvals = genc.dictionary
        if has_null_g:
            gvals = pa.concat_arrays(
                [gvals, pa.nulls(1, type=gvals.type)])
        out = {group_col: gvals}
        for i, c in enumerate(categories):
            out[f"n_{c}"] = pa.array(counts[:, i])
        if other is not None:
            out[f"n_{other}"] = pa.array(counts[:, n_cat])
        return pa.table(out)

    partial = ds.select_columns([group_col, cat_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _sum(tab: pa.Table) -> pa.Table:
        return agg_named(tab, [group_col],
                         [(c, "sum") for c in cols], cols)

    return bucketed_map_groups(partial, [group_col], _sum,
                               buckets=buckets, sort_within=False)


def local_topk_table(tab: pa.Table, group_col: str, order_col: str,
                     id_col: str, *, k: int, descending: bool) -> pa.Table:
    """Block-local top-k per group (the map-side combine of
    :func:`topk_per_group`): sort, segment, keep the first k rows of
    every group.  Top-k is mergeable — top-k of a union equals top-k
    over per-part top-ks — so this caps what the shuffle carries for a
    hot group at k rows PER BLOCK instead of its full row count (the
    same skew bound group_agg gets from partial aggregation)."""
    tab = tab.sort_by([
        (group_col, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (id_col, "ascending")])
    new = segment_starts(tab, [group_col])
    firsts = np.flatnonzero(new)
    n = tab.num_rows
    pos = np.arange(n) - np.repeat(
        firsts, np.diff(np.append(firsts, n)))
    return tab.filter(pa.array(pos < k))


def topk_per_group(ds: "rd.Dataset", group_col: str, order_col: str,
                   id_col: str, *, k: int = 3, descending: bool = True,
                   buckets: int | None = None) -> "rd.Dataset":
    """Top-k rows per group by ``order_col`` (ties broken by ascending
    ``id_col``): (group, id, rank).  Map-side combine
    (:func:`local_topk_table`) caps every block's contribution at k
    rows per group BEFORE the one hash shuffle — a group holding 50%
    of the corpus ships O(blocks·k) rows, not O(corpus) — then the
    per-bucket final rank is vectorized over the bucket-sorted arrays,
    never a per-group Python call (reference has no analogue; the
    sort/limit family of SURVEY §2.7 generalized per-group)."""

    def _local(tab: pa.Table) -> pa.Table:
        return local_topk_table(tab, group_col, order_col, id_col,
                                k=k, descending=descending)

    def _topk(tab: pa.Table) -> pa.Table:
        tab = local_topk_table(tab, group_col, order_col, id_col,
                               k=k, descending=descending)
        new = segment_starts(tab, [group_col])
        firsts = np.flatnonzero(new)
        n = tab.num_rows
        pos = np.arange(n) - np.repeat(
            firsts, np.diff(np.append(firsts, n)))
        return pa.table({
            group_col: tab[group_col],
            id_col: tab[id_col],
            "rank": pa.array((pos + 1).astype(np.int64)),
        })

    pre = ds.select_columns([group_col, order_col, id_col]).map_batches(
        _local, batch_format="pyarrow")
    return bucketed_map_groups(pre, [group_col], _topk, buckets=buckets,
                               sort_within=False)


def hopping_window_agg(
    ds: "rd.Dataset", ts_col: str, group_cols, value_col: str, *,
    size_us: int, hop_us: int, buckets: int | None = None,
) -> "rd.Dataset":
    """HOPPING (sliding) window aggregate: overlapping windows of
    ``size_us`` starting every ``hop_us`` — each event lands in
    exactly ``size/hop`` windows; output ``(window_start, group...,
    n, min_value, max_value)`` per window with ≥1 event.  The
    tumbling window is the ``size == hop`` special case
    (:func:`windowed_agg`).

    Per-block expansion (``k`` shifted projections, no row loops —
    window starts floor-divide the epoch so negative timestamps
    bucket like SQL ``//``), then the partial+final ``group_agg``
    pattern: each block pre-aggregates to its (window, group) rows
    before ONE small shuffle, so the k× row expansion never moves —
    only O(windows × groups) partials per block do.  Aggregates are
    order-exact (count/min/max); null timestamps drop (SQL GROUP BY
    over a derived window key)."""
    if hop_us <= 0 or size_us <= 0 or size_us % hop_us:
        raise ValueError("size_us must be a positive multiple of hop_us")
    k = size_us // hop_us
    group_cols = list(group_cols)

    def _expand(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[ts_col]))
        us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        base = np.floor_divide(us, hop_us)
        parts = []
        for j in range(k):
            ws = (base - j) * hop_us
            cols = {"window_start": pa.array(ws).cast(
                pa.timestamp("us"))}
            for c in group_cols:
                cols[c] = tab[c]
            cols[value_col] = tab[value_col]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    expanded = ds.select_columns(list(dict.fromkeys(
        [ts_col] + group_cols + [value_col]))).map_batches(
        _expand, batch_format="pyarrow")
    return group_agg(
        expanded, ["window_start"] + group_cols,
        [(value_col, "count", "n"), (value_col, "min", "min_value"),
         (value_col, "max", "max_value")], buckets=buckets)


def hopping_window_distinct(
    ds: "rd.Dataset", ts_col: str, value_col: str, *,
    size_us: int, hop_us: int, buckets: int | None = None,
) -> "rd.Dataset":
    """EXACT distinct count per HOPPING window — ``(window_start,
    n_distinct)``, the sliding-window ``COUNT(DISTINCT v)`` (e.g.
    rolling 6-hour active users every 2 hours).  Each event expands
    into its ``size/hop`` windows, (window, value) pairs dedupe
    INSIDE every block before the one hash exchange on the window —
    only distinct pairs move, never the expansion — and the bucket
    side counts distinct per window vectorized
    (:func:`distinct_count`'s combine pattern over
    :func:`hopping_window_agg`'s expansion).  Null timestamps drop;
    null values don't count but keep their window in the output."""
    if hop_us <= 0 or size_us <= 0 or size_us % hop_us:
        raise ValueError("size_us must be a positive multiple of hop_us")
    k = size_us // hop_us

    def _expand(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[ts_col]))
        us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        base = np.floor_divide(us, hop_us)
        parts = []
        for j in range(k):
            ws = (base - j) * hop_us
            parts.append(pa.table({
                "window_start": pa.array(ws).cast(pa.timestamp("us")),
                value_col: tab[value_col]}))
        # map-side combine: only distinct (window, value) pairs ship
        return pa.concat_tables(parts).group_by(
            ["window_start", value_col]).aggregate([])

    expanded = ds.select_columns(list(dict.fromkeys(
        [ts_col, value_col]))).map_batches(
        _expand, batch_format="pyarrow")
    return distinct_count(expanded, "window_start", value_col,
                          buckets=buckets)


def windowed_agg(ds: "rd.Dataset", ts_col: str, group_cols,
                 value_col: str, *, window: str = "day") -> "rd.Dataset":
    """Tumbling-window aggregate: (window_start, group..., n, min_value,
    max_value).  Pre-aggregates inside every block (map-side combine)
    before ONE small shuffle over (window, group) — the partial+final
    pattern of SURVEY §2.6 A6; aggregates chosen to be order-exact
    (counts/min/max, no float-sum nondeterminism)."""
    group_cols = list(group_cols)

    def _partial(tab: pa.Table) -> pa.Table:
        win = pc.floor_temporal(tab[ts_col], unit=window)
        t = tab.select(group_cols + [value_col]).append_column(
            "window_start", win)
        return agg_named(
            t, ["window_start"] + group_cols,
            [(value_col, "count"), (value_col, "min"),
             (value_col, "max")], ["n", "min_value", "max_value"])

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        return agg_named(
            tab, ["window_start"] + group_cols,
            [("n", "sum"), ("min_value", "min"), ("max_value", "max")],
            ["n", "min_value", "max_value"])

    return bucketed_map_groups(partial, ["window_start"] + group_cols,
                               _final, buckets=16, sort_within=False)


def resample_fill(
    ds: "rd.Dataset", group_cols, ts_col: str, *, every_us: int,
    buckets: int | None = None, max_fill: int = 1 << 24,
) -> "rd.Dataset":
    """Per-group time-series RESAMPLE with zero-filled gaps: one row
    per ``every_us`` bucket from each group's first to last event —
    ``(group..., bucket_us, n)`` where ``n = 0`` for buckets with no
    events (the gap-fill SQL spells as ``generate_series`` +
    ``LEFT JOIN``).  Bucketing floor-divides the epoch so negative
    (pre-1970) timestamps land like SQL ``//``; null timestamps drop.

    Scale shape: the partial+final pattern — each block pre-aggregates
    to its distinct (group, bucket) counts before ONE hash exchange on
    the group (a group's fill range needs all its buckets together),
    then the fill is a pure prefix-sum expansion (arange + scatter, no
    row loops).  Emitted rows per group are TIME-bounded (span /
    ``every_us``), not data-bounded — ``max_fill`` caps a degenerate
    span (one stray 1970 timestamp against 2026 data would emit
    millions of zeros; raising beats silently flooding the sink).

    No reference analogue (goskema has no temporal ops); this is the
    training-data freshness/coverage histogram a curation pipeline
    reports."""
    group_cols = list(group_cols)
    if every_us <= 0:
        raise ValueError("every_us must be positive")

    def _partial(tab: pa.Table) -> pa.Table:
        tab = tab.filter(pc.is_valid(tab[ts_col]))
        us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        b = np.floor_divide(us, every_us)
        t = pa.table({**{c: tab[c] for c in group_cols},
                      "_b": pa.array(b)})
        return agg_named(t, group_cols + ["_b"], [([], "count_all")],
                         ["n"])

    partial = ds.select_columns(list(dict.fromkeys(
        group_cols + [ts_col]))).map_batches(
        _partial, batch_format="pyarrow")

    def _fill(tab: pa.Table) -> pa.Table:
        if not tab.num_rows:   # an empty exchange bucket
            return pa.table(
                {**{c: tab[c] for c in group_cols},
                 "bucket_us": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())})
        tab = agg_named(tab, group_cols + ["_b"], [("n", "sum")], ["n"])
        tab = tab.sort_by([(c, "ascending") for c in group_cols]
                          + [("_b", "ascending")])
        new = segment_starts(tab, group_cols)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], tab.num_rows)
        b = tab["_b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = pc.cast(tab["n"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lo, hi = b[starts], b[ends - 1]
        span = hi - lo + 1
        if len(span) and int(span.max()) > max_fill:
            raise ValueError(
                f"resample_fill: a group spans {int(span.max())} "
                f"buckets (> max_fill={max_fill}); widen every_us or "
                "filter outlier timestamps")
        out_total = int(span.sum())
        seg_off = np.concatenate([[0], np.cumsum(span)[:-1]]).astype(
            np.int64)
        gidx = np.repeat(np.arange(len(starts), dtype=np.int64), span)
        ob = (np.arange(out_total, dtype=np.int64)
              - np.repeat(seg_off, span) + np.repeat(lo, span))
        on = np.zeros(out_total, dtype=np.int64)
        rseg = np.cumsum(new) - 1
        on[seg_off[rseg] + (b - lo[rseg])] = n
        cols = {c: tab[c].take(pa.array(starts[gidx]))
                for c in group_cols}
        cols["bucket_us"] = pa.array(ob * every_us)
        cols["n"] = pa.array(on)
        return pa.table(cols)

    return bucketed_map_groups(partial, group_cols, _fill,
                               buckets=buckets, sort_within=False)


def session_windows(
    ds: "rd.Dataset", *, key: str, ts_col: str, gap_us: int,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Session windows (gap-based sessionization): consecutive events of
    the same key belong to one session while the time gap between them
    is <= ``gap_us``; a larger gap starts a new session.  Returns one
    row per (key, session): (key, session_idx 1-based per key,
    session_start, session_end, n_events).

    The streaming-window member of the custom-operator family
    (asof / range / tumbling / session — SURVEY §2.5): one hash shuffle
    on the key, then a fully vectorized boundary scan per bucket
    (sorted diff > gap, cumulative boundary count rebased per key) and
    an Arrow C-speed group_by for the per-session aggregates.  Session
    numbering is deterministic under timestamp ties: a tie has gap 0,
    never a boundary, so any tie order yields the same sessions.
    Rows with a null timestamp are EXCLUDED (sessionization is
    undefined for them; a NaN-through-int64 cast would otherwise turn
    them into arbitrary boundaries)."""

    def _sessions(tab: pa.Table) -> pa.Table:
        if tab.num_rows and ts_col in tab.column_names and \
                tab[ts_col].null_count:
            tab = tab.filter(pc.is_valid(tab[ts_col]))
        if tab.num_rows == 0 or ts_col not in tab.column_names:
            return pa.table({
                key: pa.array([], type=pa.int64()),
                "session_idx": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.timestamp("us")),
                "session_end": pa.array([], type=pa.timestamp("us")),
                "n_events": pa.array([], type=pa.int64())})
        tab = tab.sort_by([(key, "ascending"), (ts_col, "ascending")])
        ts = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")), pa.int64())\
            .to_numpy(zero_copy_only=False)
        new_key = segment_starts(tab, [key])
        gap = np.empty(len(ts), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = new_key | (gap > gap_us)
        b = np.cumsum(new_sess)
        key_firsts = np.flatnonzero(new_key)
        key_seg = np.cumsum(new_key) - 1
        sess_idx = b - b[key_firsts[key_seg]] + 1
        t = pa.table({
            key: tab[key],
            "session_idx": pa.array(sess_idx.astype(np.int64)),
            "ts": tab[ts_col],
        })
        out = t.group_by([key, "session_idx"]).aggregate(
            [("ts", "min"), ("ts", "max"), ("ts", "count")])
        return pa.table({
            key: out[key], "session_idx": out["session_idx"],
            "session_start": out["ts_min"],
            "session_end": out["ts_max"],
            "n_events": pc.cast(out["ts_count"], pa.int64())})

    return bucketed_map_groups(ds, [key], _sessions, buckets=buckets,
                               sort_within=False)


def asof_join(
    left: "rd.Dataset", right: "rd.Dataset", *, key: str, left_key: str,
    left_ts: str, right_ts: str, left_id: str, value_col: str,
    direction: str = "backward", tolerance_us: int | None = None,
    buckets: int | None = None,
) -> "rd.Dataset":
    """As-of join: for each left row, the nearest right row at or
    BEFORE it (``direction="backward"``: greatest ``right_ts <=
    left_ts``) or at or AFTER it (``"forward"``: smallest ``right_ts
    >= left_ts``) for the same key; returns (left_id, left_key,
    asof_<value_col>).  Left rows with no match are dropped (inner
    as-of).  ``tolerance_us`` (the SQL ASOF ... WITHIN / pandas
    merge_asof tolerance) drops matches farther than that many
    microseconds from the left timestamp — the gap check happens in
    the merge's internal (direction-normalized) domain, so one code
    path serves both directions.  Both sides shuffle ONCE on the key; the merge is a
    vectorized carry-forward over the bucket sorted by (key, ts,
    side) — right rows sort before left rows at equal ts so the
    inclusive bound holds.  The forward direction rides the SAME
    machinery on negated µs timestamps (order reversal preserves the
    tie handling exactly) — no second code path (SURVEY §2.5 custom
    operator)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    def _ts_int(col) -> "pa.ChunkedArray":
        t = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        return pc.negate_checked(t) if direction == "forward" else t

    def _tag_left(tab: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(tab[left_key], pa.int64()),
            "ts": _ts_int(tab[left_ts]),
            "side": pa.array(np.ones(tab.num_rows, dtype=np.int8)),
            "lid": pc.cast(tab[left_id], pa.int64()),
            "val": pa.nulls(tab.num_rows, type=pa.timestamp("us")),
        })

    def _tag_right(tab: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(tab[key], pa.int64()),
            "ts": _ts_int(tab[right_ts]),
            "side": pa.array(np.zeros(tab.num_rows, dtype=np.int8)),
            "lid": pa.nulls(tab.num_rows, type=pa.int64()),
            "val": pc.cast(tab[value_col], pa.timestamp("us")),
        })

    both = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow"))

    def _merge(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("k", "ascending"), ("ts", "ascending"),
                           ("side", "ascending")])
        n = tab.num_rows
        kv = tab["k"].combine_chunks().to_numpy(zero_copy_only=False)
        side = tab["side"].combine_chunks().to_numpy(zero_copy_only=False)
        new_key = np.zeros(n, dtype=bool)
        if n:
            new_key[0] = True
            new_key[1:] = kv[1:] != kv[:-1]
        # carry forward the index of the last right row within each key
        idx = np.arange(n)
        last_right = np.where(side == 0, idx, -1)
        # reset at key boundaries: do segmented cummax via subtracting
        # the segment's base from a global cummax trick
        seg_id = np.cumsum(new_key) - 1
        # global cummax of (seg_id * (n+1) + last_right+1) keeps maxima
        # within segments (different segments never mix because seg_id
        # dominates the packed value)
        packed = seg_id * (n + 1) + (last_right + 1)
        run = np.maximum.accumulate(packed)
        carried = run - seg_id * (n + 1) - 1   # -1 => no right row yet
        is_left = side == 1
        ok = is_left & (carried >= 0)
        src = carried[ok]
        if tolerance_us is not None:
            tsv = tab["ts"].combine_chunks().to_numpy(
                zero_copy_only=False)
            # internal ts is negated for forward, so the signed gap
            # left - matched_right is >= 0 in BOTH directions
            near = (tsv[ok] - tsv[src]) <= tolerance_us
            full = np.flatnonzero(ok)[near]
            ok = np.zeros(len(tsv), dtype=bool)
            ok[full] = True
            src = src[near]
        out = pa.table({
            "lid": tab["lid"].filter(pa.array(ok)),
            "k": tab["k"].filter(pa.array(ok)),
            "asof_value": tab["val"].take(pa.array(src)),
        })
        return out

    return bucketed_map_groups(both, ["k"], _merge, buckets=buckets,
                               sort_within=False)


def range_count_join(
    left: "rd.Dataset", right: "rd.Dataset", *, key: str, left_key: str,
    left_ts: str, right_ts: str, left_id: str, span_us: int,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Range (interval) join, count form: for each left row, the number
    of right rows with the same key whose timestamp falls in
    ``[left_ts, left_ts + span_us)``.  Returns (left_id, left_key,
    n_matches) with EVERY left row present (count 0 when nothing
    matches).

    Both sides shuffle ONCE on the key; inside each bucket the count is
    fully vectorized: each left row contributes two MARKER rows (its
    interval start and end), markers sort before right rows at equal
    (key, ts), and a segmented exclusive prefix-count of right rows
    evaluated at the two marker positions gives
    count = prefix(end) - prefix(start) — no per-row or per-key Python
    loop (SURVEY §2.5 custom operator family: asof / range / window)."""

    def _tag_left(tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        ts_np = pc.cast(pc.cast(tab[left_ts], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        k = pc.cast(tab[left_key], pa.int64())\
            .combine_chunks().to_numpy(zero_copy_only=False)
        lid = pc.cast(tab[left_id], pa.int64())\
            .combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(np.concatenate([k, k])),
            "ts": pa.array(np.concatenate([ts_np, ts_np + span_us])),
            # markers (side 0) sort before right rows (side 1) at equal
            # ts: start inclusive, end exclusive
            "side": pa.array(np.zeros(2 * n, dtype=np.int8)),
            "kind": pa.array(np.concatenate(
                [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)])),
            "lid": pa.array(np.concatenate([lid, lid])),
        })

    def _tag_right(tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        return pa.table({
            "k": pc.cast(tab[key], pa.int64()),
            "ts": pc.cast(pc.cast(tab[right_ts], pa.timestamp("us")),
                          pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "kind": pa.array(np.full(n, -1, dtype=np.int8)),
            # zeros, not nulls: a null int64 column round-trips through
            # float64 in to_numpy and corrupts ids >= 2^53
            "lid": pa.array(np.zeros(n, dtype=np.int64)),
        })

    both = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow"))

    def _merge(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("k", "ascending"), ("ts", "ascending"),
                           ("side", "ascending"), ("kind", "ascending")])
        n = tab.num_rows
        kv = tab["k"].combine_chunks().to_numpy(zero_copy_only=False)
        side = tab["side"].combine_chunks().to_numpy(zero_copy_only=False)
        kind = tab["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        lid = tab["lid"].combine_chunks().to_numpy(zero_copy_only=False)
        is_right = (side == 1).astype(np.int64)
        # exclusive prefix: right rows strictly before position i
        prefix = np.concatenate([[0], np.cumsum(is_right)[:-1]]) if n \
            else np.zeros(0, dtype=np.int64)
        new_key = np.zeros(n, dtype=bool)
        if n:
            new_key[0] = True
            new_key[1:] = kv[1:] != kv[:-1]
        firsts = np.flatnonzero(new_key)
        seg_id = np.cumsum(new_key) - 1
        local = prefix - prefix[firsts[seg_id]] if n else prefix
        m = side == 0
        tsv = tab["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        lid_m, kind_m, cnt_m = lid[m], kind[m], local[m]
        k_m, ts_m = kv[m], tsv[m]
        # pair each left row's start marker with ITS end marker even
        # when left_id repeats: end ts = start ts + span (a constant),
        # so sorting starts and ends independently by (lid, ts) aligns
        # them 1:1 per lid (ties are identical intervals)
        s_mask, e_mask = kind_m == 0, kind_m == 1
        s_ord = np.lexsort((ts_m[s_mask], lid_m[s_mask]))
        e_ord = np.lexsort((ts_m[e_mask], lid_m[e_mask]))
        starts = cnt_m[s_mask][s_ord]
        ends = cnt_m[e_mask][e_ord]
        return pa.table({
            "lid": pa.array(lid_m[s_mask][s_ord].astype(np.int64)),
            "k": pa.array(k_m[s_mask][s_ord].astype(np.int64)),
            "n_matches": pa.array((ends - starts).astype(np.int64)),
        })

    return bucketed_map_groups(both, ["k"], _merge, buckets=buckets,
                               sort_within=False)


_JOIN_TYPES = {
    "inner": "inner",
    "left_outer": "left outer",
    "full_outer": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


@ray.remote(num_cpus=0.25)
def _block_schema_nonempty(tab: pa.Table):
    """Schema of a block IF it has rows, else None (empty blocks can
    carry stale schemas through Ray's Project — see _broadcast_join)."""
    return tab.schema if tab.num_rows else None


@ray.remote(num_cpus=1)
def _concat_remote(empty: pa.Table, *parts: pa.Table) -> pa.Table:
    """Assemble a broadcast table in a worker: the output lands in the
    object store directly, keeping the driver O(refs).  Zero-row blocks
    are dropped BEFORE concat — an empty dataset yields one 0-row
    0-COLUMN block (the map UDF never ran), and concatenating it would
    produce a schemaless table that breaks the downstream join; the
    caller-supplied ``empty`` table carries the correct schema for the
    nothing-survived case."""
    tabs = [t for t in parts if t.num_rows]
    if not tabs:
        return empty
    return pa.concat_tables(tabs).combine_chunks()


def detect_hot_keys(
    ds: "rd.Dataset", key_cols: Sequence[str], *,
    frac: float = 0.05, candidates_per_block: int = 16,
    w: int = 4096, d: int = 4,
) -> tuple[np.ndarray, int]:
    """Keys holding at least ``frac`` of ``ds``'s rows, as 64-bit
    composite-key hashes: ``(hot_hashes sorted, total_rows)``.

    Constant bytes per block: each block ships one ``w × d`` count-min
    sketch over its composite key hashes plus its local
    top-``candidates_per_block`` candidate hashes — no key exchange at
    all (the same motif as ``approx_top_tokens``).  CMS never
    underestimates, so a genuinely hot key is never missed once it is
    any block's local heavy hitter; a cold key promoted by collision
    only costs its rows a detour through the broadcast path of a skew
    join — never correctness."""
    key_cols = list(key_cols)
    from ..state.sketches import CountMin

    def _partial(tab: pa.Table) -> pa.Table:
        h = composite_hash(tab, key_cols)
        cms = CountMin(w=w, d=d)
        cms.update_hashes(h)
        uniq, counts = np.unique(h, return_counts=True)
        top = np.argsort(-counts, kind="stable")[:candidates_per_block]
        return pa.table({
            "cms": pa.array([cms.to_bytes()], type=pa.binary()),
            "cand": pa.array([uniq[top].astype(np.int64)],
                             type=pa.list_(pa.int64())),
            "n": pa.array([tab.num_rows], type=pa.int64())})

    parts = ds.select_columns(key_cols).map_batches(
        _partial, batch_format="pyarrow").take_all()
    merged = None
    cand: set[int] = set()
    total = 0
    for p in parts:
        c = CountMin.from_bytes(p["cms"])
        merged = c if merged is None else merged.merge(c)
        cand.update(int(x) for x in p["cand"])
        total += int(p["n"])
    if merged is None or not cand or total == 0:
        return np.empty(0, dtype=np.uint64), total
    thresh = max(1, int(frac * total))
    cand_arr = np.array(sorted(cand), dtype=np.int64).astype(np.uint64)
    ests = merged.query_hashes(cand_arr)
    return np.sort(cand_arr[ests >= thresh]), total


def join_many(
    tables: Sequence["rd.Dataset"], on, *, hows: Sequence[str] | None = None,
    suffix: str = "_r", buckets: int | None = None,
) -> "rd.Dataset":
    """N-way equi-join on a SHARED key through ONE hash exchange —
    the signal-assembly shape (k per-document signal tables folded
    into one card).  A chain of binary ``hash_join`` calls would pay
    k-1 all-to-all exchanges; here every table is tagged with a
    source ordinal, padded to the union schema, unioned, exchanged
    ONCE on the key, and the per-bucket fold is k-1 C++-speed
    ``pa.Table.join`` calls over co-located rows — no further data
    movement.

    ``hows[i]`` (default ``"inner"``) is the join type folding table
    ``i`` (i ≥ 1) onto the accumulated left: ``inner`` or
    ``left_outer``.  Output: table 0's columns then each later
    table's non-key columns (renamed with ``suffix`` on collision —
    same rule as :func:`hash_join`).  Key columns must share names
    across tables; each source's key casts to table 0's key types.
    SQL NULL keys never match (Acero semantics), matching a chained
    ``hash_join``."""
    tables = list(tables)
    if len(tables) < 2:
        raise ValueError("join_many needs at least two tables")
    keys = [on] if isinstance(on, str) else list(on)
    hows = ["inner"] * (len(tables) - 1) if hows is None else list(hows)
    if len(hows) != len(tables) - 1:
        raise ValueError("hows must have len(tables) - 1 entries")
    bad = [h for h in hows if h not in ("inner", "left_outer")]
    if bad:
        raise ValueError(f"unsupported join type(s) {bad}; join_many "
                         "folds with inner or left_outer")
    schemas = []
    for i, t in enumerate(tables):
        sch = t.schema(fetch_if_missing=False)
        if sch is None:
            t = t.materialize()
            sch = t.schema()
        if sch is None:
            raise ValueError(f"join_many table {i} is empty with no "
                             "schema; cannot derive output columns")
        tables[i] = t
        schemas.append(sch.base_schema)
    key_types = {k: schemas[0].field(k).type for k in keys}
    # per-source non-key output names, hash_join's collision rule
    col_map: list[list[tuple[str, str]]] = []
    used = set(keys)
    for sch in schemas:
        m = []
        for c in sch.names:
            if c in keys:
                continue
            name = c
            while name in used:
                name = name + suffix
            used.add(name)
            m.append((c, name))
        col_map.append(m)
    out_types = {}
    for sch, m in zip(schemas, col_map):
        for orig, out in m:
            out_types[out] = sch.field(orig).type
    all_out = [out for m in col_map for _, out in m]
    final_cols = keys + all_out

    def _pad(i: int):
        def _f(tab: pa.Table) -> pa.Table:
            n = tab.num_rows
            cols = {k: pc.cast(tab[k], key_types[k]) for k in keys}
            for m in col_map:
                for _, out in m:
                    cols[out] = pa.nulls(n, type=out_types[out])
            for orig, out in col_map[i]:
                cols[out] = tab[orig]
            cols["_src"] = pa.array(np.full(n, i, dtype=np.int8))
            return pa.table(cols)
        return _f

    both = tables[0].map_batches(_pad(0), batch_format="pyarrow")
    for i in range(1, len(tables)):
        both = both.union(tables[i].map_batches(
            _pad(i), batch_format="pyarrow"))

    def _assemble(tab: pa.Table) -> pa.Table:
        src = tab["_src"]
        subs = []
        for i in range(len(col_map)):
            sub = tab.filter(pc.equal(src, i)).select(
                keys + [out for _, out in col_map[i]])
            subs.append(sub)
        acc = subs[0]
        for i, sub in enumerate(subs[1:]):
            acc = acc.join(sub, keys=keys,
                           join_type=_JOIN_TYPES[hows[i]])
        return acc.select(final_cols)

    return bucketed_map_groups(both, keys, _assemble, buckets=buckets,
                               sort_within=False)


def _broadcast_join(left, right, keys, rkeys, jt, semi, suffix, how):
    """Broadcast-side implementation of :func:`hash_join`: the right
    side is materialized once and rides the object store; the left
    STREAMS — name collisions, output column order, and the
    right→left key-type cast all resolve from the first left batch
    (memoized per column signature), so no ``Dataset.schema()`` probe
    ever executes the left's upstream chain just to read names (a
    probe on a lazy ``map_batches`` chain runs the whole pipeline and
    discards the blocks — measured ~2 s per join build at sf0.1)."""
    right = right.materialize()
    rsch = right.schema(fetch_if_missing=False)
    rschema = rsch.base_schema if rsch is not None else None
    # Ray's Project (select_columns) can pass ZERO-ROW blocks through
    # UN-projected, so empty blocks carry a stale wider schema and the
    # dataset-level schema above is their union — a lie.  A non-empty
    # block's schema is authoritative; probe for one (tiny remote
    # tasks — the driver never pulls block bytes).
    ne_schemas = [s for s in ray.get(
        [_block_schema_nonempty.remote(r)
         for r in right.to_arrow_refs()]) if s is not None]
    if ne_schemas:
        rschema = ne_schemas[0]
    if rschema is None:
        # schema-less empty right: resolve without touching the left
        if how in ("inner", "left_semi"):
            return left.limit(0)
        if how == "left_anti":
            return left
        raise ValueError(
            f"right side of a {how} join is empty with no schema; "
            "cannot derive the right-hand output columns")
    parts = right.to_arrow_refs()
    empty = rschema.empty_table()
    if parts:
        # concat INSIDE a task: the assembled broadcast table goes
        # straight into the object store as the task's output and
        # never transits the driver heap (at scale the driver must
        # stay O(refs), not O(right-side bytes))
        ref = _concat_remote.remote(empty, *parts)
    else:
        ref = ray.put(empty)
    rval = [c for c in rschema.names if c not in rkeys]

    cache: dict = {}

    def _jb(tab: pa.Table) -> pa.Table:
        lcols = tab.column_names
        sig = (tuple(lcols),
               tuple(str(tab.schema.field(k).type) for k in keys))
        got = cache.get(sig)
        if got is None:
            lval = [c for c in lcols if c not in keys]
            ren, used = {}, set(lcols)
            for c in rval:
                name = c
                while name in used:
                    name = name + suffix
                ren[c] = name
                used.add(name)
            out_cols = keys + lval + (
                [] if semi else [ren[c] for c in rval])
            raw = ray.get(ref)
            cols = {}
            for lk, rk in zip(keys, rkeys):
                cols[lk] = pc.cast(raw[rk], tab.schema.field(lk).type)
            for c in rval:
                cols[ren[c]] = raw[c]
            got = (out_cols, pa.table(cols))
            cache[sig] = got
        out_cols, prepped = got
        return tab.join(prepped, keys=keys, join_type=jt) \
            .select(out_cols)

    return left.map_batches(_jb, batch_format="pyarrow")


def hash_join(
    left: "rd.Dataset", right: "rd.Dataset", *, on, right_on=None,
    how: str = "inner", broadcast: bool | str = False,
    buckets: int | None = None, suffix: str = "_r",
    prefilter: str | None = None, skew: str | None = None,
) -> "rd.Dataset":
    """General distributed equi-join with SQL NULL semantics (null keys
    never match — pyarrow's Acero join already guarantees this).

    The reference has no relational join operator (SURVEY §2.5 notes its
    join-like semantics are semi/anti lookups); this is the
    beyond-reference general form a data-engine user needs.  Two
    strategies, chosen by ``broadcast`` (pass ``"auto"`` to let the
    measured right side decide: it is materialized once — a cost both
    strategies pay in full anyway — and sides at or under
    ``AUTO_BROADCAST_MAX_BYTES`` take the broadcast path, larger ones
    the bucketed exchange; ``full_outer`` always buckets):

    - ``broadcast=True`` (dimension-table pattern): the right side is
      materialized ONCE, ``ray.put`` into the object store, and every
      left batch joins against it zero-copy inside ``map_batches`` —
      no shuffle at all.  The right side must fit in a worker's heap;
      right rows never move per batch.  ``full_outer`` is not
      expressible this way (an unmatched right row is unknowable from
      any one batch) and raises.
    - ``broadcast=False``: both sides are padded to a shared schema,
      unioned, hash-partitioned ONCE on the key (the repo-standard
      bucketed exchange), and each bucket runs a C++-speed
      ``pa.Table.join`` between its two sides.  All join types work;
      a key's rows from both sides land in the same bucket by
      construction.

    ``how``: inner | left_outer | full_outer | left_semi | left_anti.
    Output columns: left columns, then right non-key columns (renamed
    with ``suffix`` on collision); semi/anti return left columns only.
    Right key columns are coalesced into the left names.

    ``skew="auto"`` (bucketed, left-preserving joins): a constant-size
    count-min pass over the left keys detects keys holding ≥5% of the
    rows; those keys' rows (both sides, routed by the SAME key hash)
    take a broadcast side-path while the rest join bucketed — no
    single gather task serializes on a hot key.  Assumes the hot
    keys' RIGHT rows fit a worker heap (a hot×hot join's output
    explodes regardless of strategy).

    ``prefilter="bloom"`` (bucketed inner/left_semi only): the right
    side's key hashes fold into a 128 KiB Bloom filter (per-block
    partial bitmaps OR-merged, broadcast once) and left rows that
    cannot match are dropped BEFORE the exchange — for a selective
    join this removes most of the all-to-all bytes at the cost of one
    extra pass over the (materialized) right keys.  False positives
    only add shuffle volume; the join itself stays exact.  Rejected
    for left-preserving joins (outer/anti must keep unmatched left
    rows) and pointless under broadcast (no exchange to slim).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if len(rkeys) != len(keys):
        raise ValueError("on and right_on must have the same arity")
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    if broadcast == "auto":
        # File-metadata pre-check: a right side whose on-disk footprint
        # already rules out broadcast must NOT be materialized just to
        # be measured (at 100 TB the measuring materialize is itself
        # the problem).  Only plausibly-small sides are materialized
        # for the exact size decision — and that materialize is then
        # reused as the broadcast payload.
        est = _estimate_input_bytes(right)
        if est is not None and est > AUTO_BROADCAST_MAX_BYTES \
                * PARQUET_INFLATION:
            broadcast = False
        else:
            right = right.materialize()
            sz = right.size_bytes() or 0
            broadcast = (how != "full_outer"
                         and sz <= AUTO_BROADCAST_MAX_BYTES)
    elif not isinstance(broadcast, bool):
        raise ValueError("broadcast must be True, False or 'auto'")
    if prefilter not in (None, "bloom"):
        raise ValueError("prefilter must be None or 'bloom'")
    if prefilter == "bloom" and not broadcast:
        if how not in ("inner", "left_semi"):
            raise ValueError(
                "bloom prefilter requires inner or left_semi (a "
                "left-preserving join must keep unmatched left rows)")
    else:
        prefilter = None
    jt = _JOIN_TYPES[how]
    semi = how in ("left_semi", "left_anti")

    if broadcast:
        if how == "full_outer":
            raise ValueError("full_outer requires broadcast=False "
                             "(unmatched right rows are invisible to "
                             "any single left batch)")
        # the broadcast path never probes the left's schema: a
        # Dataset.schema() on a lazy map_batches chain executes its
        # whole upstream and discards the blocks — the left must stay
        # a pure stream (it is the 100 TB side)
        return _broadcast_join(left, right, keys, rkeys, jt, semi,
                               suffix, how)

    # Bucketed path: padding both sides to a shared schema needs the
    # real schemas.  Metadata-known schemas (reads, materialized
    # datasets) are free; a lazy transformed side is MATERIALIZED
    # first — the manual exchange gathers those same blocks anyway,
    # so the probe cost is recycled instead of a throwaway execution.
    lsch = left.schema(fetch_if_missing=False)
    if lsch is None:
        left = left.materialize()
        lsch = left.schema()
    rsch = right.schema(fetch_if_missing=False)
    if rsch is None:
        right = right.materialize()
        rsch = right.schema()
    # an upstream that dropped every row of a lazy chain can lose its
    # schema entirely (schema None even materialized); such a side IS
    # empty, so resolve the join without executing anything more:
    #   left empty:  inner/semi/anti/left_outer are all empty; pass the
    #                empty left through (full_outer degenerates to the
    #                right side, which needs a right schema we may not
    #                have either — keep the simple empty passthrough
    #                only for left-preserving types)
    #   right empty: inner/left_semi are empty-left; left_anti and
    #                left_outer keep every left row (outer's right cols
    #                are unknowable without a right schema, so only the
    #                column-preserving anti passes through)
    if lsch is None and how != "full_outer":
        return left
    if rsch is None:
        if how in ("inner", "left_semi"):
            return left.limit(0)
        if how == "left_anti":
            return left
        raise ValueError(
            f"right side of a {how} join is empty with no schema; "
            "cannot derive the right-hand output columns")
    if lsch is None:
        raise ValueError(
            "left side of a full_outer join is empty with no schema; "
            "cannot derive the left-hand output columns")
    lschema = lsch.base_schema
    rschema = rsch.base_schema

    if skew not in (None, "auto"):
        raise ValueError("skew must be None or 'auto'")
    if skew == "auto" and not broadcast:
        if how == "full_outer":
            raise ValueError(
                "skew handling requires a left-preserving join (hot "
                "rows take a broadcast side-path that cannot see "
                "unmatched right rows)")
        # constant-size sketch pass over the left keys; hot keys (and
        # their right rows) take a broadcast side-path so no single
        # bucket task serializes on them.  Routing is BY KEY HASH on
        # both sides with the same hash domain, so a collision merely
        # reroutes a cold key — never loses a match.  Materialize the
        # left FIRST: the sketch pass plus the two routes would
        # otherwise re-execute its upstream chain three times.
        left = left.materialize()
        hot, _total = detect_hot_keys(left, keys)
        if len(hot):
            hot_ref = ray.put(hot)

            def _hit(h: np.ndarray) -> np.ndarray:
                hs = ray.get(hot_ref)
                idx = np.searchsorted(hs, h).clip(max=len(hs) - 1)
                return hs[idx] == h

            def _route_left(tab: pa.Table, want: bool) -> pa.Table:
                m = _hit(composite_hash(tab, keys).astype(np.uint64))
                return tab.filter(pa.array(m if want else ~m))

            def _route_right(tab: pa.Table, want: bool) -> pa.Table:
                ck = pa.table({
                    lk: pc.cast(tab[rk], lschema.field(lk).type)
                    for lk, rk in zip(keys, rkeys)})
                m = _hit(composite_hash(ck, keys).astype(np.uint64))
                return tab.filter(pa.array(m if want else ~m))

            right = right.materialize()  # consumed by both routes
            l_hot = left.map_batches(
                lambda t: _route_left(t, True), batch_format="pyarrow")
            l_cold = left.map_batches(
                lambda t: _route_left(t, False), batch_format="pyarrow")
            r_hot = right.map_batches(
                lambda t: _route_right(t, True), batch_format="pyarrow")
            r_cold = right.map_batches(
                lambda t: _route_right(t, False),
                batch_format="pyarrow")
            hot_out = hash_join(l_hot, r_hot, on=keys, right_on=rkeys,
                                how=how, broadcast=True, suffix=suffix)
            cold_out = hash_join(l_cold, r_cold, on=keys,
                                 right_on=rkeys, how=how,
                                 broadcast=False, buckets=buckets,
                                 suffix=suffix, prefilter=prefilter)
            return hot_out.union(cold_out)

    lcols = list(lschema.names)
    lval = [c for c in lcols if c not in keys]
    rval = [c for c in rschema.names if c not in rkeys]
    ren, used = {}, set(lcols)
    for c in rval:
        name = c
        while name in used:
            name = name + suffix
        ren[c] = name
        used.add(name)
    out_cols = keys + lval + ([] if semi else [ren[c] for c in rval])

    def _col_or_empty(tab: pa.Table, name: str, typ: pa.DataType):
        # Ray's sort/exchange machinery can emit ZERO-COLUMN empty
        # blocks (schema "."); pad those from the known side schema
        # instead of KeyError-ing the whole join
        if name in tab.column_names:
            return tab[name]
        if tab.num_rows == 0:
            return pa.array([], type=typ)
        raise KeyError(f"join side block is missing column {name!r}")

    def _prep_right(tab: pa.Table) -> pa.Table:
        cols = {}
        for lk, rk in zip(keys, rkeys):
            cols[lk] = pc.cast(
                _col_or_empty(tab, rk, rschema.field(rk).type),
                lschema.field(lk).type)
        for c in rval:
            cols[ren[c]] = _col_or_empty(tab, c, rschema.field(c).type)
        return pa.table(cols)

    if prefilter == "bloom":
        from ..state.sketches import _hash64

        bits_log2 = 20
        mask = np.uint64((1 << bits_log2) - 1)
        words = 1 << (bits_log2 - 6)
        # one extra pass over the right keys: materialize so the join
        # pass does not recompute the right side's upstream chain
        right = right.materialize()

        def _pbloom(tab: pa.Table) -> pa.Table:
            # hash AFTER the right->left key cast (what the exchange
            # compares) — hashing the raw right dtype would give a
            # different hash family and silently drop true matches
            cast_keys = pa.table({
                lk: pc.cast(tab[rk], lschema.field(lk).type)
                for lk, rk in zip(keys, rkeys)})
            h = composite_hash(cast_keys, keys).astype(np.uint64)
            h2 = _hash64(h)
            bm = np.zeros(words, dtype=np.uint64)
            for i in range(4):
                pos = (h + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    bm, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)))
            return pa.table({"bloom": pa.array([bm.tobytes()],
                                               type=pa.large_binary())})

        bloom = np.zeros(words, dtype=np.uint64)
        for t in ray.get(right.select_columns(rkeys).map_batches(
                _pbloom, batch_format="pyarrow").to_arrow_refs()):
            for chunk in t["bloom"].to_pylist():
                bloom |= np.frombuffer(chunk, dtype=np.uint64)
        bloom_ref = ray.put(bloom)

        def _lfilter(tab: pa.Table) -> pa.Table:
            bm = ray.get(bloom_ref)
            h = composite_hash(tab, keys).astype(np.uint64)
            h2 = _hash64(h)
            hit = np.ones(tab.num_rows, dtype=bool)
            for i in range(4):
                pos = (h + np.uint64(i) * h2) & mask
                hit &= (bm[(pos >> np.uint64(6)).astype(np.int64)]
                        >> (pos & np.uint64(63))) & np.uint64(1) == 1
            return tab.filter(pa.array(hit))

        left = left.map_batches(_lfilter, batch_format="pyarrow")

    def _pad_left(tab: pa.Table) -> pa.Table:
        cols = {c: _col_or_empty(tab, c, lschema.field(c).type)
                for c in keys + lval}
        for c in rval:
            cols[ren[c]] = pa.nulls(tab.num_rows,
                                    type=rschema.field(c).type)
        cols["__side"] = pa.array(np.ones(tab.num_rows, dtype=np.int8))
        return pa.table(cols)

    def _pad_right(tab: pa.Table) -> pa.Table:
        t = _prep_right(tab)
        cols = {}
        for lk in keys:
            cols[lk] = t[lk]
        for c in lval:
            cols[c] = pa.nulls(tab.num_rows, type=lschema.field(c).type)
        for c in rval:
            cols[ren[c]] = t[ren[c]]
        cols["__side"] = pa.array(np.zeros(tab.num_rows, dtype=np.int8))
        return pa.table(cols)

    both = left.map_batches(_pad_left, batch_format="pyarrow").union(
        right.map_batches(_pad_right, batch_format="pyarrow"))

    def _merge(tab: pa.Table) -> pa.Table:
        side = tab["__side"]
        lt = tab.filter(pc.equal(side, 1)).select(keys + lval)
        rt = tab.filter(pc.equal(side, 0)).select(
            keys + [ren[c] for c in rval])
        return lt.join(rt, keys=keys, join_type=jt).select(out_cols)

    return bucketed_map_groups(both, keys, _merge, buckets=buckets,
                               sort_within=False)


def diff_snapshots(
    old: "rd.Dataset", new: "rd.Dataset", key_cols, compare_cols,
    *, buckets: int | None = None,
) -> "rd.Dataset":
    """Old-vs-new snapshot diff keyed on ``key_cols`` (reference
    ``RequestInfo.Old`` update semantics, domain_types.go:46-51 /
    SURVEY §2.5 J3): returns (key..., change) with change in
    {'added', 'removed', 'changed'}.  Both snapshots hash-partition ONCE
    on the key; the per-bucket compare is a vectorized sorted-merge.
    Assumes keys are unique within each snapshot (validate first)."""
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)

    def _tag(side: int):
        def fn(tab: pa.Table) -> pa.Table:
            t = tab.select(key_cols + compare_cols)
            return t.append_column(
                "side", pa.array(np.full(tab.num_rows, side, dtype=np.int8)))
        return fn

    both = old.map_batches(_tag(0), batch_format="pyarrow").union(
        new.map_batches(_tag(1), batch_format="pyarrow"))

    def _diff(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending") for c in key_cols]
                          + [("side", "ascending")])
        n = tab.num_rows
        new_key = segment_starts(tab, key_cols)
        side = tab["side"].combine_chunks().to_numpy(zero_copy_only=False)
        seg_id = np.cumsum(new_key) - 1
        n_seg = int(seg_id[-1]) + 1 if n else 0
        has_old = np.zeros(n_seg, dtype=bool)
        has_new = np.zeros(n_seg, dtype=bool)
        has_old[seg_id[side == 0]] = True
        has_new[seg_id[side == 1]] = True
        firsts = np.flatnonzero(new_key)
        # changed: both present and any compare column differs between
        # the pair's two adjacent rows (old sorts before new)
        pair_first = firsts[has_old & has_new]
        changed = np.zeros(len(pair_first), dtype=bool)
        for c in compare_cols:
            v = tab[c].combine_chunks()
            a = v.take(pa.array(pair_first))
            b = v.take(pa.array(pair_first + 1))
            neq = pc.fill_null(pc.not_equal(a, b), True)
            # both-null counts as equal
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            neq = pc.and_(neq, pc.invert(both_null))
            changed |= np.asarray(neq)
        out_idx = []
        out_change = []
        removed_idx = firsts[has_old & ~has_new]
        added_idx = firsts[~has_old & has_new]
        out_idx.append(added_idx); out_change += ["added"] * len(added_idx)
        out_idx.append(removed_idx); out_change += ["removed"] * len(removed_idx)
        ch_idx = pair_first[changed]
        out_idx.append(ch_idx); out_change += ["changed"] * len(ch_idx)
        idx = pa.array(np.concatenate(out_idx).astype(np.int64)) if out_idx \
            else pa.array([], type=pa.int64())
        out = {c: tab[c].take(idx) for c in key_cols}
        out["change"] = pa.array(out_change, type=pa.string())
        return pa.table(out)

    return bucketed_map_groups(both, key_cols, _diff, buckets=buckets,
                               sort_within=False)


def _pareto_frontier_table(tab: pa.Table, dims: Sequence[str],
                           sense: np.ndarray, chunk: int = 4096
                           ) -> pa.Table:
    """Exact local Pareto frontier of one table (all original columns
    kept).  A row is dominated iff some other row is at-least-as-good
    on EVERY dim and strictly better on at least one; identical dim
    vectors never dominate each other, so duplicate points all stay.

    Vectorized: canonicalize every dim to minimize, lexsort; in
    ascending lexicographic order a later row can never dominate an
    earlier one (componentwise ≤ with a strict dim contradicts the
    sort), so one forward pass over CHUNKS suffices — each chunk is
    matrix-checked (numpy broadcast) against the accumulated frontier
    and its own earlier rows.  Cost ≈ n·|frontier|·d bool ops, and
    skylines are small in practice; worst case (fully anti-correlated
    data, frontier = everything) degrades to quadratic, like every
    exact skyline."""
    n = tab.num_rows
    if n == 0:
        return tab
    # canonicalize to minimize; NATIVE dtypes per dim (an int64 dim
    # stays exact past 2^53 — no shared float matrix)
    cols = []
    for d, s in zip(dims, sense):
        if pc.any(pc.is_null(tab[d])).as_py():
            raise ValueError("skyline dims must be non-null / non-NaN")
        c = tab[d].combine_chunks().to_numpy(zero_copy_only=False)
        if np.issubdtype(c.dtype, np.floating) and np.isnan(c).any():
            raise ValueError("skyline dims must be non-null / non-NaN")
        if s < 0 and c.dtype.kind == "u":
            # unsigned negation wraps (0 would become the BEST value)
            if len(c) and c.max() > np.iinfo(np.int64).max:
                raise ValueError(f"maximize dim {d!r}: uint64 value "
                                 "exceeds int64 range")
            c = c.astype(np.int64)
        cols.append(-c if s < 0 else c)
    order = np.lexsort(tuple(reversed(cols)))
    cols = [c[order] for c in cols]
    front = [c[:0] for c in cols]
    keep_sorted: list[np.ndarray] = []
    for lo in range(0, n, chunk):
        C = [c[lo:lo + chunk] for c in cols]
        m = len(C[0])
        le = np.ones((m, len(front[0])), dtype=bool)
        lt = np.zeros((m, len(front[0])), dtype=bool)
        for f, c in zip(front, C):
            le &= f[None, :] <= c[:, None]
            lt |= f[None, :] < c[:, None]
        dom = (le & lt).any(1)
        # intra-chunk: only earlier rows (j < i) can dominate
        le2 = np.ones((m, m), dtype=bool)
        lt2 = np.zeros((m, m), dtype=bool)
        for c in C:
            le2 &= c[None, :] <= c[:, None]
            lt2 |= c[None, :] < c[:, None]
        tri = np.tri(m, k=-1, dtype=bool)             # j < i
        dom |= (le2 & lt2 & tri).any(1)
        keep = ~dom
        keep_sorted.append(np.flatnonzero(keep) + lo)
        front = [np.concatenate([f, c[keep]])
                 for f, c in zip(front, C)]
    pick = order[np.concatenate(keep_sorted)]
    return tab.take(pa.array(np.sort(pick)))


def skyline(
    ds: "rd.Dataset", *, minimize: Sequence[str] = (),
    maximize: Sequence[str] = (), chunk: int = 4096,
) -> "rd.Dataset":
    """Distributed SKYLINE (Pareto frontier): rows not dominated by
    any other row, where better = smaller on every ``minimize`` dim
    and larger on every ``maximize`` dim (strict on at least one).
    SQL mirror: ``WHERE NOT EXISTS (SELECT 1 FROM t q WHERE <q
    weakly better> AND <q strictly better somewhere>)``.

    Two stages, NO hash exchange at all: (1) every block computes its
    local frontier in parallel — valid because domination is global:
    the global skyline is a subset of every local one, so
    frontier-of-frontiers is EXACT, not approximate; (2) surviving
    candidates (typically a vanishing fraction) are repartitioned to
    one block for the final pass.  The stage-2 single task is the
    documented partitioning assumption: the union of local frontiers
    fits one worker — true for real data where skylines are tiny; a
    pathologically anti-correlated input would need a tree of merge
    rounds instead.  Null/NaN dims raise (SQL NOT EXISTS treats NULL
    comparisons as non-domination both ways, a semantics nobody
    wants from a frontier)."""
    dims = list(minimize) + list(maximize)
    if not dims:
        raise ValueError("need at least one minimize/maximize dim")
    sense = np.array([1.0] * len(minimize) + [-1.0] * len(maximize))

    def _local(tab: pa.Table) -> pa.Table:
        return _pareto_frontier_table(tab, dims, sense, chunk)

    cand = ds.map_batches(_local, batch_format="pyarrow")
    return cand.repartition(1).map_batches(_local,
                                           batch_format="pyarrow")


def group_transitions(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, buckets: int | None = None,
    from_col: str = "from_v", to_col: str = "to_v", n_col: str = "n",
) -> "rd.Dataset":
    """Consecutive-pair (Markov transition) counts: per group, order
    rows by ``order_cols`` and count every adjacent
    ``(value, next value)`` pair globally — SQL ``lead(v) OVER
    (PARTITION BY g ORDER BY o...)`` then ``GROUP BY v, nxt`` with
    ``nxt IS NOT NULL`` dropped pairs only at each group's last row.
    Give a unique order key (ties break by sorted position otherwise).
    NULL values ARE counted as states (SQL GROUP BY null-group
    semantics).

    One hash exchange on the group key; each bucket emits its
    PARTIAL ``(from, to) -> count`` table (distinct pairs, tiny), and
    a second exchange over that vocabulary-sized partial sums it —
    the full rows never move twice."""
    order_cols = list(order_cols)

    def _pairs(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        v = tab[value_col].combine_chunks()
        if n < 2:
            return pa.table({from_col: v.slice(0, 0),
                             to_col: v.slice(0, 0),
                             n_col: pa.array([], pa.int64())})
        new_g = segment_starts(tab, [group_col])
        idx = np.arange(n)
        src = idx[~np.append(new_g[1:], True)]     # not last in group
        part = pa.table({
            from_col: v.take(pa.array(src)),
            to_col: v.take(pa.array(src + 1)),
            "__one": pa.array(np.ones(len(src), dtype=np.int64))})
        return agg_named(part, [from_col, to_col], [("__one", "sum")],
                         [n_col])

    partials = bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [value_col]))),
        [group_col], _pairs, buckets=buckets, sort_within=False)
    return bucketed_map_groups(
        partials, [from_col, to_col],
        lambda t: agg_named(t, [from_col, to_col], [(n_col, "sum")],
                            [n_col]),
        buckets=buckets, sort_within=False)


def impute_by_group(
    ds: "rd.Dataset", group_cols: Sequence[str], val_col: str, *,
    strategy: str = "mode", buckets: int | None = None,
    out_col: str | None = None, flag_col: str = "imputed",
) -> "rd.Dataset":
    """Fill null values from their GROUP's statistic — the data-repair
    stage of a feature pipeline — with EXACT integer strategies so
    the fill is bit-identical to SQL at any parallelism:

    - ``mode``: the group's most frequent non-null value, ties by
      the smallest value (SQL: count window + row_number);
    - ``mean_floor``: ``floor(Σv / n)`` over non-null values in
      big-int arithmetic (SQL: HUGEINT ``SUM(v) // COUNT(v)`` —
      floor semantics match numpy on negatives).

    ``val_col`` must be integer-typed (scale decimal doubles to
    cents FIRST, the engine-wide convention).  A group with no
    non-null values fills nothing (value stays null, flag false).

    Scale shape: one vocabulary-sized stats exchange (mode rides
    block-local ``(group, value) → count`` partials; mean rides
    sum/count partials), then the O(groups) fill table broadcast-joins
    back onto the stream — rows never shuffle.  Returns the input
    rows with ``out_col`` (default ``val_col``) filled and a
    ``flag_col`` bool marking imputed rows."""
    group_cols = list(group_cols)
    out_col = out_col or val_col
    if strategy not in ("mode", "mean_floor"):
        raise ValueError(f"impute_by_group: unknown strategy "
                         f"{strategy!r}")

    src = ds
    nn = src.map_batches(
        lambda t: t.filter(pc.is_valid(t[val_col])),
        batch_format="pyarrow")

    if strategy == "mode":
        def _cnt_partial(tab: pa.Table) -> pa.Table:
            part = pa.table({
                **{c: tab[c] for c in group_cols},
                "_v": tab[val_col],
                "__one": pa.array(np.ones(tab.num_rows,
                                          dtype=np.int64))})
            return agg_named(part, group_cols + ["_v"],
                             [("__one", "sum")], ["c"])

        def _mode(tab: pa.Table) -> pa.Table:
            tab = agg_named(tab, group_cols + ["_v"],
                            [("c", "sum")], ["c"])
            tab = tab.sort_by([(c, "ascending") for c in group_cols]
                              + [("c", "descending"),
                                 ("_v", "ascending")])
            firsts = pa.array(np.flatnonzero(
                segment_starts(tab, group_cols)))
            return pa.table({
                **{c: tab[c].take(firsts) for c in group_cols},
                "_fill": tab["_v"].take(firsts)})

        fills = bucketed_map_groups(
            nn.map_batches(_cnt_partial, batch_format="pyarrow"),
            group_cols, _mode, buckets=buckets, sort_within=False)
    else:
        stats = group_agg(nn, group_cols,
                          [(val_col, "sum", "_s"),
                           (val_col, "count", "_n")], buckets=buckets)

        def _mean(tab: pa.Table) -> pa.Table:
            s = tab["_s"].to_pylist()
            n = tab["_n"].to_pylist()
            # big-int floor division — decimal128 sums arrive as
            # Decimal; // floors like SQL's HUGEINT // on negatives
            fill = [int(si) // int(ni) for si, ni in zip(s, n)]
            return pa.table({
                **{c: tab[c] for c in group_cols},
                "_fill": pa.array(fill, pa.int64())})

        fills = stats.map_batches(_mean, batch_format="pyarrow")

    j = hash_join(src, fills, on=group_cols, how="left_outer",
                  broadcast="auto")

    def _fill(tab: pa.Table) -> pa.Table:
        v = tab[val_col]
        f = pc.cast(tab["_fill"], pa.int64())
        filled = pc.coalesce(pc.cast(v, pa.int64()), f)
        imput = pc.and_(pc.is_null(v), pc.is_valid(f))
        out = {c: tab[c] for c in tab.column_names
               if c not in ("_fill", val_col, out_col, flag_col)}
        out[out_col] = filled
        out[flag_col] = imput
        return pa.table(out)

    return j.map_batches(_fill, batch_format="pyarrow")


def funnel_within(
    ds: "rd.Dataset", group_col: str, ts_col: str, type_col: str,
    steps: Sequence[str], *, within_us: int,
    buckets: int | None = None,
) -> "rd.Dataset":
    """TIME-BOUNDED funnel per group — did ``steps[0] → steps[1] →
    …`` happen in order with every successive step STRICTLY after
    and within ``within_us`` microseconds of the previous matched
    step?  Anchoring is GREEDY-EARLIEST and deterministic: ``t1 =
    min ts of step 1``, ``t_{i+1} = min ts of step i+1 in
    ``(t_i, t_i + within_us]`` — the simple contract SQL mirrors
    with one MIN-join per step (a full NFA funnel, where a LATER
    anchor can succeed when the earliest fails, is a different
    operator; this is the fixed-anchor industry default).  Null
    timestamps never match (SQL comparison semantics); every group
    with ≥1 row appears in the output.

    Scale shape: ONE hash exchange on the group key; inside each
    bucket every step is a masked ``minimum.reduceat`` sweep over
    the sorted rows — no per-group Python loop.  Returns
    ``(group, t1..tn timestamps (null where unmatched), converted)``.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel_within: need >= 2 steps")
    SENT = np.int64(1) << np.int64(62)

    def _funnel(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")])
        n = tab.num_rows
        if n == 0:
            cols = {group_col: tab[group_col]}
            for i in range(len(steps)):
                cols[f"t{i + 1}"] = pa.array([], pa.timestamp("us"))
            cols["converted"] = pa.array([], pa.bool_())
            return pa.table(cols)
        new_g = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.append(starts, n))
        ts = tab[ts_col].combine_chunks()
        valid = pc.is_valid(ts).to_numpy(zero_copy_only=False)
        us = pc.cast(ts, pa.timestamp("us")).cast(pa.int64()) \
            .fill_null(0).to_numpy(zero_copy_only=False)
        ty = tab[type_col].combine_chunks()
        prev = None
        t_steps = []
        for i, s in enumerate(steps):
            m = pc.equal(ty, s).fill_null(False) \
                .to_numpy(zero_copy_only=False) & valid
            if prev is not None:
                prow = np.repeat(prev, counts)
                m = m & (us > prow) & (us <= prow + within_us) \
                    & (prow != SENT)
            t = np.minimum.reduceat(np.where(m, us, SENT), starts)
            t[counts == 0] = SENT          # reduceat quirk guard
            t_steps.append(t)
            prev = t
        take = pa.array(starts)
        cols = {group_col: tab[group_col].take(take)}
        for i, t in enumerate(t_steps):
            cols[f"t{i + 1}"] = pa.Array.from_pandas(
                np.where(t == SENT, None, t),
                type=pa.timestamp("us"))
        cols["converted"] = pa.array(t_steps[-1] != SENT)
        return pa.table(cols)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col, ts_col, type_col]))),
        [group_col], _funnel, buckets=buckets, sort_within=False)


def group_path_ngrams(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, n: int = 3, buckets: int | None = None,
    n_col: str = "n",
) -> "rd.Dataset":
    """Consecutive n-window (path n-gram) counts — the k-step
    generalization of :func:`group_transitions`: per group, order
    rows by ``order_cols`` and count every window of ``n``
    consecutive values globally (``v1..vn`` columns).  SQL mirror:
    ``lead(v, 1..n-1) OVER (PARTITION BY g ORDER BY o...)`` counting
    only windows that fit inside the partition (use ``row_number`` +
    ``count(*) OVER`` rather than ``IS NOT NULL`` — a NULL value is
    a legitimate state).  The funnel-DISCOVERY primitive:
    ``events_funnel`` checks a declared path, this surfaces the
    observed ones.

    Same exchange shape as ``group_transitions``: full rows shuffle
    once on the group key, each bucket pre-aggregates to its distinct
    n-gram vocabulary, and only that partial takes the second
    exchange."""
    if n < 2:
        raise ValueError("group_path_ngrams: n must be >= 2")
    order_cols = list(order_cols)
    out_cols = [f"v{j + 1}" for j in range(n)]

    def _windows(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        rows = tab.num_rows
        v = tab[value_col].combine_chunks()
        if rows < n:
            return pa.table({**{c: v.slice(0, 0) for c in out_cols},
                             n_col: pa.array([], pa.int64())})
        gid = np.cumsum(segment_starts(tab, [group_col])) - 1
        idx = np.arange(rows - (n - 1))
        src = idx[gid[idx] == gid[idx + (n - 1)]]  # window fits group
        part = pa.table({
            **{out_cols[j]: v.take(pa.array(src + j)) for j in
               range(n)},
            "__one": pa.array(np.ones(len(src), dtype=np.int64))})
        return agg_named(part, out_cols, [("__one", "sum")], [n_col])

    partials = bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            [group_col] + order_cols + [value_col]))),
        [group_col], _windows, buckets=buckets, sort_within=False)
    return bucketed_map_groups(
        partials, out_cols,
        lambda t: agg_named(t, out_cols, [(n_col, "sum")], [n_col]),
        buckets=buckets, sort_within=False)


def group_weighted_median(
    ds: "rd.Dataset", group_cols: Sequence[str], value_col: str,
    weight_col: str, *, buckets: int | None = None,
    out_col: str = "wmedian",
) -> "rd.Dataset":
    """Exact WEIGHTED median per group (lower / type-1 convention):
    the smallest value whose cumulative weight, in value order,
    reaches half the group's total — ``min(v) WHERE 2·cumw(v) ≥
    totw`` in SQL window terms.  With all weights 1 this is the SQL
    ``median`` of an odd group and the LOWER middle of an even one.
    Weights must be non-negative integers (exact comparisons — no
    float cumsum drift); a group whose total weight is 0 yields NULL.

    One hash exchange on the group key; inside each bucket the sort
    is by (group, value) and the threshold crossing is found with a
    segment-reset prefix sum + one searchsorted per bucket — no
    per-group Python."""
    group_cols = list(group_cols)

    def _med(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(c, "ascending") for c in group_cols] +
                          [(value_col, "ascending")])
        n = tab.num_rows
        v = tab[value_col].combine_chunks()
        if n == 0:
            return pa.table(
                {**{c: tab[c] for c in group_cols},
                 out_col: v.slice(0, 0)})
        w = tab[weight_col].combine_chunks()
        if not pa.types.is_integer(w.type):
            raise TypeError("weights must be integers")
        if w.null_count:
            raise ValueError("weights must be non-null")
        wn = w.to_numpy(zero_copy_only=False).astype(np.int64)
        if wn.min() < 0:
            raise ValueError("weights must be non-negative")
        new_g = segment_starts(tab, group_cols)
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        cum = np.cumsum(wn)
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0), sizes)
        gcum = cum - base                       # per-group prefix sum
        ends = starts + sizes - 1
        tot = np.repeat(gcum[ends], sizes)
        hit = 2 * gcum >= tot
        # first hit per group: the minimum index with hit & same group
        idx = np.arange(n)
        cand = np.where(hit, idx, n)
        first_hit = np.minimum.reduceat(cand, starts)
        empty = gcum[ends] == 0                 # all-zero weight group
        med = v.take(pa.array(np.where(empty, ends, first_hit)))
        med = pc.if_else(pa.array(empty), pa.nulls(len(starts),
                                                   type=v.type), med)
        out = {c: tab[c].take(pa.array(starts)) for c in group_cols}
        out[out_col] = med
        return pa.table(out)

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            group_cols + [value_col, weight_col]))),
        group_cols, _med, buckets=buckets, sort_within=False)


def merge_views(
    view: "rd.Dataset", delta: "rd.Dataset", keys: Sequence[str],
    spec: Sequence[tuple[str, str]], *, buckets: int | None = None,
) -> "rd.Dataset":
    """Incremental MATERIALIZED-VIEW maintenance for decomposable
    aggregates: merge an existing pre-aggregated view with a (much
    smaller) delta aggregated at the same grain, WITHOUT rescanning
    the base fact table.  ``spec`` maps each measure column to its
    merge op — ``sum`` (also merges counts: a count is a sum of
    partial counts), ``min`` or ``max``.  Keys present in only one
    side pass through; additive refresh only (retractions would need
    signed deltas — negate the delta's sum columns upstream, min/max
    are not retractable without the base data).

    Cost shape: ONE exchange over |view| + |delta| AGGREGATE rows —
    the whole point vs. re-running the fact-table aggregation; at
    100 TB the view is the small derived artifact and the nightly
    delta smaller still."""
    keys = list(keys)
    ops = {op for _, op in spec}
    if not ops <= {"sum", "min", "max"}:
        raise ValueError("merge ops must be sum|min|max")
    cols = keys + [c for c, _ in spec]
    both = view.select_columns(cols).union(delta.select_columns(cols))
    aggs = [(c, op) for c, op in spec]
    names = [c for c, _ in spec]
    return bucketed_map_groups(
        both, keys, lambda t: agg_named(t, keys, aggs, names),
        buckets=buckets, sort_within=False)


def apply_cdc(
    ds: "rd.Dataset", key_cols: Sequence[str],
    seq_cols: Sequence[str], op_col: str, *,
    delete_op: str = "delete", buckets: int | None = None,
) -> "rd.Dataset":
    """Change-data-capture COMPACTION: reduce an upsert/delete log to
    its final state — per key, the operation that sorts LAST by
    ``seq_cols`` wins, and a key whose winning op is ``delete_op``
    vanishes (tombstone).  SQL mirror: ``row_number() OVER (PARTITION
    BY key ORDER BY seq DESC) = 1 AND op IS DISTINCT FROM delete``
    (the NULL-safe form — a NULL op is NOT a tombstone here, and
    plain ``op <> delete`` would drop it).  Make
    ``seq_cols`` a total order per key (include a unique id) or the
    winner under ties is sort-order-dependent.

    One hash exchange on the key; each bucket sorts (key asc, seq
    desc), takes the segment-start rows, and drops tombstones — the
    same one-take shape as :func:`group_latest`, generalized to
    composite keys plus the delete rule.  This is how a 100 TB
    snapshot gets rebuilt from a day of log shards without any
    driver-side state."""
    key_cols = list(key_cols)
    seq_cols = list(seq_cols)

    def _compact(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab.drop_columns([op_col])
        tab = tab.sort_by([(c, "ascending") for c in key_cols] +
                          [(c, "descending") for c in seq_cols])
        firsts = np.flatnonzero(segment_starts(tab, key_cols))
        win = tab.take(pa.array(firsts))
        keep = pc.invert(pc.equal(win[op_col], delete_op))
        # a NULL op is not a delete
        keep = pc.fill_null(keep, True)
        return win.filter(keep).drop_columns([op_col])

    return bucketed_map_groups(ds, key_cols, _compact,
                               buckets=buckets, sort_within=False)


def topn_other(
    ds: "rd.Dataset", key_col: str, value_col: str, *, n: int,
    other_key: str = "__other__", buckets: int | None = None,
) -> "rd.Dataset":
    """Top-N-plus-OTHER rollup: sum ``value_col`` per key, keep the
    ``n`` largest keys (ties broken by key ascending — deterministic),
    and collapse every remaining key into one ``other_key`` row.  The
    reporting staple that keeps dashboard cardinality bounded no
    matter how long the key tail grows.  Requires a string key (the
    OTHER row needs a label in the same column); integer values sum
    in int64 end-to-end.

    Scale shape — NO single-task pass over the totals, so an
    unbounded key tail (user ids, URLs) stays distributed: (1) per-key
    totals via one map-side-partial exchange; (2) each totals bucket
    emits its LOCAL top-n (the global top-n is a subset of the union
    of bucket top-ns, because per-key totals are already complete), a
    buckets-times-n-row table the driver cuts to the winners and
    ``ray.put``s; (3) one streaming pass over the totals re-labels
    every non-winner to ``other_key`` and partial-sums per block, and
    a final exchange over (n+1 keys x blocks) partials produces the
    bounded result."""

    totals = bucketed_map_groups(
        ds.select_columns([key_col, value_col]).map_batches(
            lambda t: agg_named(t, [key_col], [(value_col, "sum")],
                                ["_s"]),
            batch_format="pyarrow"),
        [key_col], lambda t: agg_named(t, [key_col], [("_s", "sum")],
                                       ["_s"]),
        buckets=buckets, sort_within=False)

    def _local_top(tab: pa.Table) -> pa.Table:
        if not pa.types.is_string(tab[key_col].type):
            raise TypeError("topn_other needs a string key column")
        return tab.sort_by([("_s", "descending"),
                            (key_col, "ascending")]).slice(0, n)

    totals = totals.materialize()     # reused: candidate cut + relabel
    parts = [t.select([key_col, "_s"]) for t in ray.get(
        totals.map_batches(_local_top, batch_format="pyarrow",
                           batch_size=None).to_arrow_refs())
        if t.num_rows]
    if parts:
        cand = pa.concat_tables(parts).sort_by(
            [("_s", "descending"), (key_col, "ascending")])
        winners = cand[key_col].combine_chunks().slice(0, n)
    else:
        winners = pa.chunked_array([pa.array([], pa.string())])
    winners_ref = ray.put(winners)

    def _relabel(tab: pa.Table) -> pa.Table:
        winners = ray.get(winners_ref)
        hit = pc.is_in(tab[key_col], value_set=winners)
        lab = pc.if_else(hit, tab[key_col],
                         pa.scalar(other_key, type=pa.string()))
        part = pa.table({key_col: lab, "_s": tab["_s"]})
        return agg_named(part, [key_col], [("_s", "sum")], ["_s"])

    out = bucketed_map_groups(
        totals.map_batches(_relabel, batch_format="pyarrow"),
        [key_col],
        lambda t: agg_named(t, [key_col], [("_s", "sum")], ["_s"]),
        buckets=buckets, sort_within=False)
    return out.map_batches(
        lambda t: t.rename_columns([value_col if c == "_s" else c
                                    for c in t.column_names]),
        batch_format="pyarrow")


@ray.remote(num_cpus=0.5)
def _block_ts_max(tab: pa.Table, ts_col: str) -> int | None:
    if ts_col not in tab.column_names or not tab.num_rows:
        return None
    us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")), pa.int64())
    m = pc.max(us).as_py()
    return None if m is None else int(m)


@ray.remote(num_cpus=0.5)
def _late_partial(tab: pa.Table, ts_col: str, group_col: str,
                  lateness_us: int, seed: int | None) -> "pa.Table":
    if ts_col not in tab.column_names or not tab.num_rows:
        gt = (tab[group_col].type if group_col in tab.column_names
              else pa.string())
        return pa.table({group_col: pa.array([], gt),
                         "n_events": pa.array([], pa.int64()),
                         "n_late": pa.array([], pa.int64())})
    us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                 pa.int64()).to_numpy(zero_copy_only=False)
    lo = np.iinfo(np.int64).min
    prev = np.empty_like(us)
    prev[0] = seed if seed is not None else lo
    if len(us) > 1:
        np.maximum.accumulate(us[:-1], out=prev[1:])
        prev[1:] = np.maximum(prev[1:], prev[0])
    late = (prev != lo) & (us + lateness_us < prev)
    part = pa.table({group_col: tab[group_col],
                     "_l": pa.array(late.astype(np.int64)),
                     "_o": pa.array(np.ones(len(us), np.int64))})
    return agg_named(part, [group_col], [("_o", "sum"), ("_l", "sum")],
                     ["n_events", "n_late"])


def late_arrivals(
    ds: "rd.Dataset", arrival_col: str, ts_col: str, group_col: str,
    *, lateness_us: int,
) -> pa.Table:
    """WATERMARK / allowed-lateness accounting: replay the stream in
    arrival order (``arrival_col`` — a unique ingestion sequence) and
    count, per group, events whose event-time ``ts_col`` lags the
    running event-time high-water mark by more than ``lateness_us`` —
    the rows a streaming window with this allowed lateness would have
    dropped.  SQL mirror: ``max(ts) OVER (ORDER BY arrival ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` vs ``ts +
    lateness``; the first arrival is never late.

    The running max is GLOBAL and order-sensitive — the one
    inherently sequential scan — but only block SEEDS are sequential:
    after a distributed range sort on the arrival column, tiny remote
    tasks report each block's event-time max, the driver prefix-maxes
    that |blocks|-sized list (exclusive), and every block then computes
    its seeded cumulative max vectorized and in parallel, reducing
    straight to per-group partial counts.  The same zipWithIndex-style
    trick as the skew census: the driver touches block scalars, never
    rows."""
    # null event times are DROPPED (the group_rolling_time
    # convention): a NaT would otherwise poison the running max for
    # every later row in its block
    def _drop_null_ts(tab: pa.Table) -> pa.Table:
        return tab.filter(pc.is_valid(tab[ts_col]))

    s = ds.select_columns([arrival_col, ts_col, group_col]) \
        .map_batches(_drop_null_ts, batch_format="pyarrow") \
        .sort(arrival_col).materialize()
    refs = s.to_arrow_refs()
    maxes = ray.get([_block_ts_max.remote(r, ts_col) for r in refs])
    seeds: list[int | None] = []
    cur: int | None = None
    for m in maxes:
        seeds.append(cur)
        if m is not None:
            cur = m if cur is None else max(cur, m)
    parts = ray.get([
        _late_partial.remote(r, ts_col, group_col, lateness_us, sd)
        for r, sd in zip(refs, seeds)])
    parts = [p for p in parts if p.num_rows]
    if not parts:
        sch = s.schema()
        gt = (sch.base_schema.field(group_col).type
              if sch is not None else pa.string())
        return pa.table({group_col: pa.array([], gt),
                         "n_events": pa.array([], pa.int64()),
                         "n_late": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts)
    return agg_named(merged, [group_col],
                     [("n_events", "sum"), ("n_late", "sum")],
                     ["n_events", "n_late"])


def group_cusum(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, drift: int, threshold: int,
    buckets: int | None = None,
) -> "rd.Dataset":
    """One-sided CUSUM change-point statistic per group, EXACT in
    integer units: over ``order_cols`` order,
    ``S_t = max(0, S_{t-1} + v_t - drift)`` and ``alarm_t = S_t >
    threshold`` — the classic upward-shift detector.  The recurrence
    looks sequential but has the closed form ``S_t = C_t - min_{j<=t}
    C_j`` over the cumulative sum ``C`` of ``(v - drift)``, so it
    vectorizes to one segment-reset prefix sum plus one prefix MIN —
    and mirrors into SQL as two nested window functions.  Integer
    values stay int64-exact (a float cumsum would drift on long
    groups).

    Output: ``(group, order..., value, cusum, alarm)`` per row.  One
    hash exchange on the group key; nulls in ``value_col`` raise
    (define the gap policy upstream — fill 0 to coast, drop to
    skip)."""
    order_cols = list(order_cols)

    def _cusum(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        v = tab[value_col].combine_chunks()
        if v.null_count:
            raise ValueError("group_cusum: null values — fill or "
                             "drop upstream")
        if not pa.types.is_integer(v.type):
            raise TypeError("group_cusum is integer-exact; scale "
                            "floats to int units upstream")
        out_cols = {group_col: tab[group_col]}
        for c in order_cols:
            out_cols[c] = tab[c]
        out_cols[value_col] = v
        if n == 0:
            out_cols["cusum"] = pa.array([], pa.int64())
            out_cols["alarm"] = pa.array([], pa.bool_())
            return pa.table(out_cols)
        x = v.to_numpy(zero_copy_only=False).astype(np.int64) - drift
        new_g = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        cum = np.cumsum(x)
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0),
                         sizes)
        c = cum - base                       # per-group cumulative
        # prefix MIN per group, including the virtual 0 before row 1
        # (an O(groups)-iteration loop per bucket, the
        # group_rolling_time precedent — never per-row Python)
        pm = np.empty(n, dtype=np.int64)
        for s_, e_ in zip(starts, starts + sizes):
            pm[s_:e_] = np.minimum(np.minimum.accumulate(c[s_:e_]), 0)
        s_stat = c - pm
        out_cols["cusum"] = pa.array(s_stat)
        out_cols["alarm"] = pa.array(s_stat > threshold)
        return pa.table(out_cols)

    cols = list(dict.fromkeys([group_col] + order_cols + [value_col]))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _cusum, buckets=buckets,
                               sort_within=False)


def group_rolling_ols(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    x_col: str, y_col: str, *, window: int,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-row ROLLING OLS trend over the trailing ``window`` rows
    (ROWS frame, per group, ``order_cols`` order): emits the exact
    integer NUMERATOR and DENOMINATOR of the slope —

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    — as ``ols_num`` / ``ols_den`` int64 columns (``den = 0`` ⇔
    fewer than 2 distinct x in the frame; divide downstream, or
    compare as a rational).  Keeping the rational avoids BOTH float
    drift and the ppm-scaling overflow a premature division invites;
    the SQL mirror computes the same two windows sums.  ``x_col`` and
    ``y_col`` must be int64-scaled by the caller small enough that
    ``window·Σ|xy|`` fits int64 (day numbers and cents are fine;
    epoch-µs x is not — rescale first).

    One hash exchange; all five windowed sums are prefix-sum
    differences over the bucket-sorted arrays."""
    if window < 1:
        raise ValueError("window must be >= 1")
    order_cols = list(order_cols)

    def _roll(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        if n == 0:
            out["ols_num"] = pa.array([], pa.int64())
            out["ols_den"] = pa.array([], pa.int64())
            return pa.table(out)
        for c in (x_col, y_col):
            if not pa.types.is_integer(tab[c].type):
                raise TypeError(f"{c} must be integer-scaled")
            if tab[c].null_count:
                raise ValueError(f"{c} must be non-null")
        x = tab[x_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = tab[y_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_g = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, sizes)
        idx = np.arange(n)
        lo = np.maximum(idx - window + 1, gstart)    # frame start
        def _ps(a):
            return np.concatenate([[0], np.cumsum(a)])
        cs_x, cs_y = _ps(x), _ps(y)
        cs_xy, cs_xx = _ps(x * y), _ps(x * x)
        cnt = idx + 1 - lo
        sx = cs_x[idx + 1] - cs_x[lo]
        sy = cs_y[idx + 1] - cs_y[lo]
        sxy = cs_xy[idx + 1] - cs_xy[lo]
        sxx = cs_xx[idx + 1] - cs_xx[lo]
        out["ols_num"] = pa.array(cnt * sxy - sx * sy)
        out["ols_den"] = pa.array(cnt * sxx - sx * sx)
        return pa.table(out)

    cols = list(dict.fromkeys([group_col] + order_cols +
                              [x_col, y_col]))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _roll, buckets=buckets,
                               sort_within=False)


def interpolate_by_group(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group LINEAR interpolation of missing values over row
    position (pandas ``interpolate(method="linear")`` semantics,
    exactly): each null value between two non-null neighbors in the
    group's ``order_cols`` order becomes the exact rational

        num / den = (a·(p1−p0) + (b−a)·(p−p0)) / (p1−p0)

    where ``a``/``b`` are the neighbor values at positions
    ``p0``/``p1``.  Emitted as int64 ``interp_num`` / ``interp_den``
    columns — non-null rows carry ``(v, 1)``, leading/trailing nulls
    (no neighbor on one side) stay NULL — so the result is
    bit-reproducible and SQL-mirrorable via the IGNORE NULLS window
    pair (``LAST_VALUE``/``FIRST_VALUE`` over position) with no float
    division anywhere.

    ``value_col`` must be integer-scaled with ``|v| · group_size``
    inside int64 (cents are fine).  One hash exchange on
    ``group_col``; the neighbor scan is two vectorized
    ``maximum/minimum.accumulate`` passes over the bucket-sorted
    arrays — no per-group Python."""
    order_cols = list(order_cols)

    def _interp(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        n = tab.num_rows
        out = {group_col: tab[group_col]}
        for c in order_cols:
            out[c] = tab[c]
        out[value_col] = tab[value_col]
        if n == 0:
            out["interp_num"] = pa.array([], pa.int64())
            out["interp_den"] = pa.array([], pa.int64())
            return pa.table(out)
        if not pa.types.is_integer(tab[value_col].type):
            raise TypeError(f"{value_col} must be integer-scaled")
        va = tab[value_col].combine_chunks()
        valid = va.is_valid().to_numpy(zero_copy_only=False)
        v = va.fill_null(0).to_numpy(zero_copy_only=False).astype(
            np.int64)
        new_g = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, sizes)
        gend = np.repeat(starts + sizes, sizes)       # one past last
        idx = np.arange(n)
        # previous non-null index (forward max-scan), masked to the
        # current group; a scan value from an earlier group sits
        # below gstart and reads as "no neighbor"
        ff = np.maximum.accumulate(np.where(valid, idx, -1))
        has_prev = ff >= gstart
        # next non-null index (backward min-scan)
        bf = np.minimum.accumulate(
            np.where(valid, idx, n)[::-1])[::-1]
        has_next = bf < gend
        both = has_prev & has_next & ~valid
        pp = np.where(has_prev, ff, 0)
        nn = np.where(has_next, bf, 0)
        a, b = v[pp], v[nn]
        den = np.where(both, nn - pp, 0).astype(np.int64)
        num = np.where(
            both, a * (nn - pp) + (b - a) * (idx - pp), 0
        ).astype(np.int64)
        num = np.where(valid, v, num)
        den = np.where(valid, 1, den)
        has = valid | both
        out["interp_num"] = pa.array(num, mask=~has)
        out["interp_den"] = pa.array(den, mask=~has)
        return pa.table(out)

    cols = list(dict.fromkeys([group_col] + order_cols + [value_col]))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _interp, buckets=buckets,
                               sort_within=False)


def group_autocorr(
    ds: "rd.Dataset", group_col: str, order_cols: Sequence[str],
    value_col: str, *, lag: int = 1,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group lag-``lag`` autocovariance statistics as EXACT int64
    sums: each row pairs with the row ``lag`` positions earlier in the
    group's ``order_cols`` order, and the group emits

        (n_pairs, s_a, s_b, s_ab, s_aa, s_bb)

    where ``a`` is the current side and ``b`` the lagged side —
    autocorrelation is the rational
    ``(n·s_ab − s_a·s_b) / √((n·s_aa − s_a²)(n·s_bb − s_b²))`` of
    these integers, derived downstream so no float summation order
    ever disagrees with the SQL mirror (``LAG(v) OVER (PARTITION BY g
    ORDER BY ...)`` + integer SUMs).

    ``value_col`` must be integer-scaled by the caller with
    ``Σ v²`` per group inside int64 (cents are fine); rows with a
    null value or null order key are dropped BEFORE pairing (mirror
    the same WHERE in SQL).  Groups with fewer than ``lag + 1``
    surviving rows produce no output row.

    One hash exchange on ``group_col``; pair sums are vectorized
    ``np.add.reduceat`` segments over the bucket-sorted arrays."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    order_cols = list(order_cols)

    def _stats(tab: pa.Table) -> pa.Table:
        keep = pc.is_valid(tab[value_col])
        for c in order_cols:
            keep = pc.and_(keep, pc.is_valid(tab[c]))
        tab = tab.filter(keep)
        tab = tab.sort_by([(group_col, "ascending")] + [
            (c, "ascending") for c in order_cols])
        gty = tab[group_col].type
        empty = pa.table({
            group_col: pa.array([], type=gty),
            "n_pairs": pa.array([], pa.int64()),
            "s_a": pa.array([], pa.int64()),
            "s_b": pa.array([], pa.int64()),
            "s_ab": pa.array([], pa.int64()),
            "s_aa": pa.array([], pa.int64()),
            "s_bb": pa.array([], pa.int64())})
        n = tab.num_rows
        if n == 0:
            return empty
        if not pa.types.is_integer(tab[value_col].type):
            raise TypeError(f"{value_col} must be integer-scaled")
        v = tab[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_g = segment_starts(tab, [group_col])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        gid = np.repeat(np.arange(len(starts)), sizes)
        gstart = np.repeat(starts, sizes)
        idx = np.arange(n)
        valid = idx - gstart >= lag
        if not valid.any():
            return empty
        cur_i = np.flatnonzero(valid)
        a = v[cur_i]
        b = v[cur_i - lag]
        seg = gid[cur_i]                      # sorted, per pair
        pstart = np.flatnonzero(np.diff(seg, prepend=-1))
        n_pairs = np.diff(np.append(pstart, len(seg)))
        vmax = int(np.abs(v).max())
        if vmax * vmax > 2**62:
            raise OverflowError(
                "group_autocorr: v² exceeds int64 — rescale "
                "value_col")
        prod = a * b

        def _seg(x):
            return np.add.reduceat(x, pstart)

        keys = tab[group_col].combine_chunks().take(
            pa.array(starts[seg[pstart]]))
        return pa.table({
            group_col: keys,
            "n_pairs": pa.array(n_pairs.astype(np.int64)),
            "s_a": pa.array(_seg(a)),
            "s_b": pa.array(_seg(b)),
            "s_ab": pa.array(_seg(prod)),
            "s_aa": pa.array(_seg(a * a)),
            "s_bb": pa.array(_seg(b * b))})

    cols = list(dict.fromkeys([group_col] + order_cols + [value_col]))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _stats, buckets=buckets,
                               sort_within=False)


@ray.remote(num_cpus=0.5)
def _block_sum64(tab: pa.Table, col: str) -> int:
    if col not in tab.column_names or not tab.num_rows:
        return 0
    return int(pc.sum(tab[col]).as_py() or 0)


@ray.remote(num_cpus=0.5)
def _pareto_slice(tab: pa.Table, col: str, seed: int, numer: int,
                  denom: int, total: int, key_cols: list,
                  value_col: str, schema: "pa.Schema") -> "pa.Table":
    if col not in tab.column_names or not tab.num_rows:
        # empty exchange blocks can arrive schema-less — emit the
        # canonical empty block so from_arrow_refs unifies cleanly
        out = {c: pa.array([], schema.field(c).type)
               for c in key_cols}
        out[value_col] = pa.array([], pa.int64())
        out["cum"] = pa.array([], pa.int64())
        return pa.table(out)
    v = tab[col].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(v) + seed
    keep = (cum - v) * denom < numer * total   # hadn't reached cut yet
    out = tab.filter(pa.array(keep))
    out = out.append_column("cum", pa.array(cum[keep]))
    return out.select(key_cols + [col, "cum"]).rename_columns(
        key_cols + [value_col, "cum"])


def pareto_cut(
    ds: "rd.Dataset", key_cols: Sequence[str], value_col: str, *,
    numer: int = 8, denom: int = 10, buckets: int | None = None,
) -> "rd.Dataset":
    """ABC / Pareto analysis: the MINIMAL set of keys whose summed
    ``value_col`` reaches ``numer/denom`` of the grand total, taking
    keys in (value desc, key asc) order — "which 20% of suppliers
    carry 80% of revenue".  Output: the kept keys with their total
    and inclusive running total ``cum`` (exact int64; the cut test is
    the integer cross-multiplication ``(cum − v)·denom <
    numer·total``, so no float share ever appears).  SQL mirror: a
    window cumsum over the same order with the same inequality.

    Scale shape: per-key totals via one map-side-partial exchange;
    the descending distributed range sort orders the totals; the
    global running sum uses block SEEDS (remote per-block sums +
    driver prefix over |blocks| scalars) and each block then filters
    itself in parallel — the same seeded-scan pattern as
    :func:`late_arrivals`, so no single task ever sees all keys."""
    key_cols = list(key_cols)
    if not (0 < numer <= denom):
        raise ValueError("need 0 < numer <= denom")

    def _partial(tab: pa.Table) -> pa.Table:
        return agg_named(tab.select(key_cols + [value_col]),
                         key_cols, [(value_col, "sum")], ["_v"])

    totals = bucketed_map_groups(
        ds.select_columns(key_cols + [value_col]).map_batches(
            _partial, batch_format="pyarrow"),
        key_cols,
        lambda t: agg_named(t, key_cols, [("_v", "sum")], ["_v"]),
        buckets=buckets, sort_within=False)
    s = totals.sort(["_v"] + key_cols,
                    descending=[True] + [False] * len(key_cols)) \
        .materialize()
    refs = s.to_arrow_refs()
    sums = ray.get([_block_sum64.remote(r, "_v") for r in refs])
    total = int(sum(sums))
    seeds = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    # kept blocks stay IN the object store — the result is a Dataset
    # built from the filtered block refs, never a driver concat (the
    # kept set is all keys when numer == denom)
    sch = s.schema().base_schema
    out_refs = [
        _pareto_slice.remote(r, "_v", int(sd), numer, denom, total,
                             key_cols, value_col, sch)
        for r, sd in zip(refs, seeds)]
    return rd.from_arrow_refs(out_refs)


def group_islands(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    max_gap: int = 1, buckets: int | None = None,
) -> "rd.Dataset":
    """GAPS-AND-ISLANDS: per group, collapse the sorted DISTINCT
    integer values of ``value_col`` into maximal runs where adjacent
    values differ by at most ``max_gap`` — one output row per island:
    ``(group, island_start, island_end, n_values)``.  The activity-
    streak / sensor-uptime primitive.  SQL mirror: island id =
    running ``SUM(CASE WHEN v - lag(v) > max_gap THEN 1 END)`` per
    group, then GROUP BY (g, id).

    One hash exchange on the group key; islands fall out of one
    sorted diff + boolean cumsum per bucket — no per-group Python.
    Values must be non-null integers (epoch days, seq numbers)."""

    def _islands(tab: pa.Table) -> pa.Table:
        tab = tab.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([])     # distinct
        tab = tab.sort_by([(group_col, "ascending"),
                           (value_col, "ascending")])
        n = tab.num_rows
        gt = tab[group_col]
        if n == 0:
            return pa.table({
                group_col: gt,
                "island_start": pa.array([], pa.int64()),
                "island_end": pa.array([], pa.int64()),
                "n_values": pa.array([], pa.int64())})
        v = tab[value_col].combine_chunks()
        if v.null_count or not pa.types.is_integer(v.type):
            raise ValueError("value_col must be non-null integers")
        vn = v.to_numpy(zero_copy_only=False).astype(np.int64)
        new_g = segment_starts(tab, [group_col])
        diff = np.empty(n, dtype=np.int64)
        diff[0] = max_gap + 1
        diff[1:] = vn[1:] - vn[:-1]
        new_island = new_g | (diff > max_gap)
        starts = np.flatnonzero(new_island)
        sizes = np.diff(np.append(starts, n))
        ends = starts + sizes - 1
        return pa.table({
            group_col: gt.take(pa.array(starts)),
            "island_start": pa.array(vn[starts]),
            "island_end": pa.array(vn[ends]),
            "n_values": pa.array(sizes.astype(np.int64))})

    return bucketed_map_groups(
        ds.select_columns([group_col, value_col]).map_batches(
            lambda t: t.group_by(
                [group_col, value_col]).aggregate([]),
            batch_format="pyarrow"),
        [group_col], _islands, buckets=buckets, sort_within=False)


def cross_join(
    left: "rd.Dataset", right: "rd.Dataset", *, suffix: str = "_r",
    max_right_rows: int = 1_000_000,
) -> "rd.Dataset":
    """Cartesian product with the SMALL side broadcast: every left
    batch pairs with the materialized right table (repeat × tile, one
    take each — no Python row loops).  Refuses a right side beyond
    ``max_right_rows`` — an unbounded cross join at 100 TB is always
    a bug, and the guard names it; calendars, parameter grids and dim
    tables are what this is for.  Collision columns from the right
    take ``suffix``."""
    right = right.materialize()
    cnt = right.count()
    if cnt > max_right_rows:
        raise ValueError(
            f"cross_join right side has {cnt} rows "
            f"(> {max_right_rows}); a cross join this size is "
            "almost certainly a mistake — raise max_right_rows "
            "to insist")
    parts = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
    if not parts:
        return left.limit(0)
    rtab = pa.concat_tables(parts).combine_chunks()
    ref = ray.put(rtab)

    def _cross(tab: pa.Table) -> pa.Table:
        r = ray.get(ref)
        n, m = tab.num_rows, r.num_rows
        if n == 0:
            out = {c: tab[c] for c in tab.column_names}
        else:
            li = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
            tabr = tab.take(li)
            out = {c: tabr[c] for c in tab.column_names}
        used = set(out)
        ri = pa.array(np.tile(np.arange(r.num_rows, dtype=np.int64),
                              max(tab.num_rows, 0)))
        rr = r.take(ri)
        for c in r.column_names:
            name = c
            while name in used:
                name = name + suffix
            used.add(name)
            out[name] = rr[c]
        return pa.table(out)

    return left.map_batches(_cross, batch_format="pyarrow")


def pivot_sum(
    ds: "rd.Dataset", group_col: str, cat_col: str, value_col: str,
    categories: Sequence[str], *, buckets: int | None = None,
    other: str | None = "other",
) -> "rd.Dataset":
    """SUM pivot (crosstab of a measure): one row per group with the
    exact int64 sum of ``value_col`` per declared category —
    ``(group, s_<cat1>, ..., s_other)``; empty cells are 0 (the
    ``COALESCE(SUM(...), 0)`` convention).  Null measure values add
    nothing; null/undeclared categories land in ``other`` (None
    drops them).  Same declared-domain design as
    :func:`pivot_counts`: fixed schema, dictionary-encode slotting,
    int64 scatter-add partials per block (a float bincount would lose
    integer exactness past 2^53), one exchange over
    O(groups × categories) partial rows."""
    categories = list(categories)
    n_cat = len(categories)
    cat_index = {c: i for i, c in enumerate(categories)}
    cols = [f"s_{c}" for c in categories] + (
        [f"s_{other}"] if other is not None else [])

    def _partial(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            out = {group_col: tab[group_col]}
            for c in cols:
                out[c] = pa.array([], type=pa.int64())
            return pa.table(out)
        v = tab[value_col]
        if not pa.types.is_integer(v.type):
            raise TypeError("pivot_sum is integer-exact; scale "
                            "floats to int units upstream")
        vals = pc.fill_null(v, 0).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(
            pc.cast(tab[cat_col], pa.string()).combine_chunks())
        dict_vals = enc.dictionary.to_pylist()
        slot_of = np.array(
            [cat_index.get(x, n_cat) for x in dict_vals],
            dtype=np.int64)
        idx = enc.indices.fill_null(len(dict_vals)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        slot_of = np.concatenate([slot_of, [n_cat]])  # nulls -> other
        slots = slot_of[idx]
        genc = pc.dictionary_encode(tab[group_col].combine_chunks())
        n_g = len(genc.dictionary)
        gidx = genc.indices.fill_null(n_g).to_numpy(
            zero_copy_only=False).astype(np.int64)
        has_null_g = bool((gidx == n_g).any())
        n_rows_g = n_g + (1 if has_null_g else 0)
        width = n_cat + 1
        sums = np.zeros((n_rows_g, width), dtype=np.int64)
        np.add.at(sums, (gidx, slots), vals)
        gvals = genc.dictionary
        if has_null_g:
            gvals = pa.concat_arrays(
                [gvals, pa.nulls(1, type=gvals.type)])
        out = {group_col: gvals}
        for i, c in enumerate(categories):
            out[f"s_{c}"] = pa.array(sums[:, i])
        if other is not None:
            out[f"s_{other}"] = pa.array(sums[:, n_cat])
        return pa.table(out)

    partial = ds.select_columns(
        [group_col, cat_col, value_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _sum(tab: pa.Table) -> pa.Table:
        return agg_named(tab, [group_col],
                         [(c, "sum") for c in cols], cols)

    return bucketed_map_groups(partial, [group_col], _sum,
                               buckets=buckets, sort_within=False)


def group_time_weighted(
    ds: "rd.Dataset", group_col: str, ts_col: str, value_col: str, *,
    tiebreak_cols: Sequence[str] = (), buckets: int | None = None,
) -> "rd.Dataset":
    """Exact time-weighted sum per group (the TWAP numerator): rows
    ordered by ``(ts, tiebreak...)``, each value weighted by the µs
    until the NEXT row of the same group —
    ``twap_num = Σ v_i·(t_{i+1}−t_i)``, all int64 integer arithmetic.
    The time-weighted AVERAGE is ``twap_num / dur_us``; both terms are
    returned unreduced so the caller (and a SQL oracle) never divides
    into floats.  Returns (group, twap_num, dur_us, n_seg) for groups
    with ≥2 in-scope rows; rows with a null timestamp or null value
    are excluded.

    Exactness bound: ``|v|·corpus_span_us`` must fit int64 —
    cents-scale values (≤10^9) over a multi-year span (≤10^14 µs) stay
    inside 9.2·10^18.  One hash exchange on the group key; everything
    after is numpy segment arithmetic (reduceat), no per-row loops."""
    tiebreak_cols = list(tiebreak_cols)

    def _twap(tab: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(tab[ts_col]), pc.is_valid(tab[value_col]))
        if tab.num_rows and not pc.all(mask).as_py():
            tab = tab.filter(mask)
        gtype = tab[group_col].type
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=gtype),
                "twap_num": pa.array([], type=pa.int64()),
                "dur_us": pa.array([], type=pa.int64()),
                "n_seg": pa.array([], type=pa.int64())})
        tab = tab.sort_by(
            [(group_col, "ascending"), (ts_col, "ascending")]
            + [(c, "ascending") for c in tiebreak_cols])
        us = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(tab[value_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = tab.num_rows
        new_g = segment_starts(tab, [group_col])
        d = np.zeros(n, dtype=np.int64)
        if n > 1:
            d[:-1] = us[1:] - us[:-1]
        last = np.append(new_g[1:], True)
        d[last] = 0                      # no segment leaves its group
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.append(starts, n))
        num = np.add.reduceat(v * d, starts)
        ends = np.append(starts[1:], n) - 1
        dur = us[ends] - us[starts]
        keep = counts >= 2
        return pa.table({
            group_col: tab[group_col].take(pa.array(starts[keep])),
            "twap_num": pa.array(num[keep]),
            "dur_us": pa.array(dur[keep]),
            "n_seg": pa.array((counts - 1)[keep])})

    cols = list(dict.fromkeys(
        [group_col, ts_col, value_col] + tiebreak_cols))
    return bucketed_map_groups(ds.select_columns(cols), [group_col],
                               _twap, buckets=buckets,
                               sort_within=False)


def match_overlapping_intervals(
    lc: np.ndarray, ls: np.ndarray, le: np.ndarray,
    rc: np.ndarray, rs: np.ndarray, re_: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """All index pairs ``(i, j)`` with ``lc[i] == rc[j]`` and CLOSED
    intervals ``[ls[i], le[i]]`` ∩ ``[rs[j], re_[j]]`` ≠ ∅ — the
    vectorized core of :func:`interval_overlap_join`, exposed for
    direct testing.

    Rights sort once by (code, start); the composite key
    ``code·M + rank(start)`` (M > number of distinct starts) keeps the
    whole order in ONE int64 array, so each left's candidate window
    ``start ∈ [ls − max_right_duration, le]`` is two global
    searchsorteds.  The lower bound is sound for ANY input (a matching
    right j has ``rs_j = re_j − dur_j ≥ ls − dur_j ≥ ls − dmax``
    because ``dur_j ≤ dmax``, even with malformed reversed
    intervals); the upper bound enforces ``rs ≤ le`` exactly, and the
    residual predicate ``re ≥ ls`` filters the expansion."""
    order = np.lexsort((rs, rc))
    rc_o, rs_o, re_o = rc[order], rs[order], re_[order]
    vals = np.unique(rs_o)
    m = np.int64(len(vals) + 2)
    comp = rc_o * m + np.searchsorted(vals, rs_o)
    dmax = np.int64((re_o - rs_o).max()) if len(rs_o) else np.int64(0)
    if dmax < 0:
        dmax = np.int64(0)
    lo_rank = np.searchsorted(vals, ls - dmax, side="left")
    hi_rank = np.searchsorted(vals, le, side="right")
    lo = np.searchsorted(comp, lc * m + lo_rank, side="left")
    hi = np.searchsorted(comp, lc * m + hi_rank, side="left")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    lidx = np.repeat(np.arange(len(lc)), cnt)
    ridx = np.repeat(lo, cnt) + (
        np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt))
    ok = re_o[ridx] >= ls[lidx]            # start bound already holds
    return lidx[ok], order[ridx[ok]]


def interval_overlap_join(
    left: "rd.Dataset", right: "rd.Dataset", *, key: str,
    l_start: str, l_end: str, r_start: str, r_end: str,
    l_cols: Sequence[str], r_cols: Sequence[str],
    buckets: int | None = None,
) -> "rd.Dataset":
    """Interval×interval overlap join within a key: emit one row per
    (left, right) pair of the same ``key`` whose CLOSED intervals
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap
    (``l_start ≤ r_end AND r_start ≤ l_end`` — the SQL range-predicate
    join no equi-join can express).  Output columns:
    ``key`` + ``l_cols`` + ``r_cols`` (names must not collide).

    Distribution: BOTH sides ride one hash exchange on ``key`` (side-
    stamped union — neither side is broadcast or materialized), so the
    join parallelizes across keys no matter the total size.  Within a
    bucket the matching is fully vectorized: rights sort by
    (key, start) in RANK space (composite ``code·M + rank`` int64
    keys), each left binary-searches its candidate window
    ``start ∈ [l_start − max_right_duration, l_end]`` with two global
    searchsorteds, candidates expand by repeat, and the exact overlap
    predicate filters.  Per-left candidate count is bounded by rights
    starting inside a ``max_right_duration + left_length`` window —
    tight when interval lengths are regular (sessions, promo windows);
    a single enormous right interval in a key degrades that key to a
    scan, never the whole bucket.  Rows with null bounds are dropped.
    """
    l_cols, r_cols = list(l_cols), list(r_cols)
    if set(l_cols) & set(r_cols):
        raise ValueError("l_cols and r_cols must not collide")

    def _us(col: pa.ChunkedArray) -> np.ndarray:
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            col = pc.cast(col, pa.int64())
        return col.to_numpy(zero_copy_only=False)

    # payload types resolved ONCE on the driver (a one-block schema
    # probe) so each stamped side can null-fill the OTHER side's
    # payload columns — the union then has one schema and rides one
    # exchange
    l_types = {f.name: f.type for f in left.schema().base_schema}
    r_types = {f.name: f.type for f in right.schema().base_schema}

    def _stamp(side: int, s_col: str, e_col: str):
        def _f(tab: pa.Table) -> pa.Table:
            # SQL join semantics: null keys and null bounds never match
            mask = pc.and_(pc.is_valid(tab[key]),
                           pc.and_(pc.is_valid(tab[s_col]),
                                   pc.is_valid(tab[e_col])))
            if tab.num_rows and not pc.all(mask).as_py():
                tab = tab.filter(mask)
            n = tab.num_rows
            cols = {key: tab[key],
                    "__side": pa.array(
                        np.full(n, side, dtype=np.int8)),
                    "__s": pa.array(_us(tab[s_col].combine_chunks())),
                    "__e": pa.array(_us(tab[e_col].combine_chunks()))}
            # canonical payload order (l_cols then r_cols) on BOTH
            # sides so the union concats cleanly
            for c in l_cols:
                cols[c] = tab[c] if side == 0 else \
                    pa.nulls(n, type=l_types[c])
            for c in r_cols:
                cols[c] = tab[c] if side == 1 else \
                    pa.nulls(n, type=r_types[c])
            return pa.table(cols)
        return _f

    lt = left.map_batches(_stamp(0, l_start, l_end),
                          batch_format="pyarrow")
    rt = right.map_batches(_stamp(1, r_start, r_end),
                           batch_format="pyarrow")

    def _join(tab: pa.Table) -> pa.Table:
        side = tab["__side"].to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        l_tab = tab.filter(pa.array(lmask))
        r_tab = tab.filter(pa.array(rmask))
        empty = {key: pa.array([], type=tab[key].type)}
        for c in l_cols + r_cols:
            empty[c] = pa.array([], type=tab[c].type)
        if l_tab.num_rows == 0 or r_tab.num_rows == 0:
            return pa.table(empty)
        # consistent key codes across both sides: ONE dictionary over
        # the whole bucket (a chunk-wise encode would give each chunk
        # its own code space)
        karr = tab[key].combine_chunks()
        if isinstance(karr, pa.ChunkedArray):
            karr = (karr.chunk(0) if karr.num_chunks == 1
                    else pa.concat_arrays(karr.chunks))
        codes = pc.dictionary_encode(karr).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lc, rc = codes[lmask], codes[rmask]
        ls = l_tab["__s"].to_numpy(zero_copy_only=False)
        le = l_tab["__e"].to_numpy(zero_copy_only=False)
        rs = r_tab["__s"].to_numpy(zero_copy_only=False)
        re_ = r_tab["__e"].to_numpy(zero_copy_only=False)
        lidx, ridx = match_overlapping_intervals(lc, ls, le,
                                                 rc, rs, re_)
        if len(lidx) == 0:
            return pa.table(empty)
        out = {key: l_tab[key].take(pa.array(lidx))}
        l_take = pa.array(lidx)
        r_take = pa.array(ridx)
        for c in l_cols:
            out[c] = l_tab[c].take(l_take)
        for c in r_cols:
            out[c] = r_tab[c].take(r_take)
        return pa.table(out)

    return bucketed_map_groups(lt.union(rt), [key], _join,
                               buckets=buckets, sort_within=False)


# ---------------------------------------------------------------------------
# Global (partition-free) window ranking: ROW_NUMBER / RANK / DENSE_RANK
# OVER (ORDER BY ...) with no PARTITION BY — the one window shape the
# per-group machinery (group_rank etc.) cannot express, because there is
# no key to hash-partition on.
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0.5)
def _rank_block_stats(tab: pa.Table, by: list) -> dict:
    """O(1)-size ordering stats for one range-partitioned block: row
    count, first/last key tuple, sizes of the leading/trailing tie
    runs, and the distinct-key count — everything the driver needs to
    resolve cross-block tie runs without touching row data."""
    n = tab.num_rows
    if n == 0:
        return {"n": 0}
    ne = _neighbor_change_mask(tab, by)          # len n-1, True = new run
    n_runs = 1 + int(ne.sum())
    # leading run length = first True position (or n); trailing likewise
    idx = np.flatnonzero(ne)
    lead = int(idx[0]) + 1 if len(idx) else n
    trail = n - 1 - int(idx[-1]) if len(idx) else n

    def _key(i: int) -> tuple:
        # NaN canonicalized to a sentinel so the driver's cross-block
        # tuple equality matches the NaN==NaN run semantics above
        out = []
        for c in by:
            v = tab[c][i].as_py()
            if isinstance(v, float) and v != v:
                v = "__nan__"
            out.append(v)
        return tuple(out)

    first = _key(0)
    last = _key(n - 1)
    return {"n": n, "first": first, "last": last,
            "lead": lead, "trail": trail, "runs": n_runs}


def _neighbor_change_mask(tab: pa.Table, by: Sequence[str]) -> np.ndarray:
    """Boolean vector of length ``n-1``: True where row ``i+1`` starts a
    new tie run over the ``by`` tuple (null-safe: null == null)."""
    n = tab.num_rows
    if n <= 1:
        return np.zeros(0, dtype=bool)
    ne = np.zeros(n - 1, dtype=bool)
    for c in by:
        col = tab[c].combine_chunks()
        a, b = col.slice(1), col.slice(0, n - 1)
        eq = pc.fill_null(pc.equal(a, b), False)
        eq = pc.or_(eq, pc.and_(pc.is_null(a), pc.is_null(b)))
        if pa.types.is_floating(col.type):
            # SQL ORDER BY groups NaNs into one tie run; IEEE
            # NaN != NaN would split them into singleton runs
            both_nan = pc.and_(pc.fill_null(pc.is_nan(a), False),
                               pc.fill_null(pc.is_nan(b), False))
            eq = pc.or_(eq, both_nan)
        ne |= np.logical_not(eq.to_numpy(zero_copy_only=False))
    return ne


@ray.remote(num_cpus=0.5)
def _rank_block_finalize(
        tab: pa.Table, by: list, kinds: tuple, out_schema: pa.Schema,
        row_off: int, rank_carry: int, dense_before: int,
        cont: bool) -> pa.Table:
    """Attach the requested global window columns to one sorted block.

    ``row_off``: global 0-based index of the block's first row.
    ``rank_carry``: global 0-based start index of the tie run the
    block's first row belongs to (== ``row_off`` unless the run
    straddles in from earlier blocks).
    ``dense_before``: distinct keys strictly before this block's first
    NEW key; ``cont``: whether the first row continues an earlier run.
    """
    n = tab.num_rows
    if n == 0:
        # Ray's sort can emit ZERO-COLUMN empty blocks (schema ".");
        # return the full output schema so the downstream union of
        # blocks stays schema-consistent
        return out_schema.empty_table()
    ne = _neighbor_change_mask(tab, by)
    new_run = np.empty(n, dtype=np.int64)
    new_run[0] = 1
    new_run[1:] = ne
    run_id = np.cumsum(new_run)                  # 1-based within block
    out = tab
    if "row_number" in kinds:
        out = out.append_column("row_number", pa.array(
            np.arange(row_off + 1, row_off + n + 1, dtype=np.int64)))
    if "rank" in kinds:
        # rank of a run = 1-based global index of its first row; the
        # first run's start may carry in from an earlier block
        starts = np.flatnonzero(new_run) + row_off      # 0-based global
        starts[0] = rank_carry
        out = out.append_column("rank", pa.array(
            starts[run_id - 1] + 1))
    if "dense_rank" in kinds:
        base = dense_before - 1 if cont else dense_before
        out = out.append_column("dense_rank", pa.array(
            base + run_id))
    return out.select(out_schema.names)


def _null_fill_default(t: pa.DataType):
    """An arbitrary valid scalar of ``t`` used to null-fill physical
    sort keys (the value never affects semantics — null placement is
    carried by the is-null flag column)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", type=t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", type=t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, type=t)
    try:
        return pa.scalar(0, type=t)      # ints, floats, ts, date, time
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        raise ValueError(f"unsupported global_rank key type: {t}")


def global_rank(
    ds: "rd.Dataset", by, *, descending=False, tiebreak=None,
    kinds: Sequence[str] = ("row_number", "rank", "dense_rank"),
) -> "rd.Dataset":
    """Exact global ``ROW_NUMBER()`` / ``RANK()`` / ``DENSE_RANK()``
    ``OVER (ORDER BY by)`` — no PARTITION BY — attached as int64
    columns (1-based), TeraSort style.

    Distribution: ``ds.sort`` range-partitions on sampled boundaries
    (Ray Data's streaming sort — each block ends up globally ordered
    relative to its neighbors and sorted within), then ONE O(1)-sized
    stats task per block feeds a driver pass that resolves row offsets,
    cross-block tie runs (a run straddling any number of blocks gets
    the rank of its true first row) and distinct-key prefix counts —
    driver state is O(blocks), never O(rows).  A finalize task per
    block attaches the columns vectorized (run-length encoding over
    the pre-sorted keys; no row loops).

    ``by``: ordering/comparison columns for rank semantics.
    ``descending``: bool or per-``by``-column list.
    ``tiebreak``: extra columns appended to the physical sort (always
    ascending) so ``row_number`` is deterministic under ties without
    affecting ``rank``/``dense_rank`` comparisons — mirror them in the
    oracle's ``ROW_NUMBER() OVER (ORDER BY ..., tiebreak)``.

    Null ordering follows Ray's sort (nulls last under ascending,
    first under descending — Arrow semantics); nulls form one tie run
    (null == null for ranking, the SQL convention).
    """
    by = [by] if isinstance(by, str) else list(by)
    tiebreak = ([] if tiebreak is None else
                [tiebreak] if isinstance(tiebreak, str) else list(tiebreak))
    kinds = tuple(kinds)
    bad = set(kinds) - {"row_number", "rank", "dense_rank"}
    if bad:
        raise ValueError(f"unknown rank kinds: {sorted(bad)}")
    desc = ([descending] * len(by) if isinstance(descending, bool)
            else list(descending))
    if len(desc) != len(by):
        raise ValueError("descending must match by arity")

    sch = ds.schema(fetch_if_missing=False)
    if sch is None:
        ds = ds.materialize()
        sch = ds.schema()
    if sch is None:
        return ds          # fully-empty schema-less input: nothing to rank
    in_schema = sch.base_schema
    out_fields = list(in_schema) + [pa.field(k, pa.int64())
                                    for k in kinds]
    out_schema = pa.schema(out_fields)

    # Null-free physical sort keys: Ray's range-partitioned sort can
    # DUPLICATE a row whose sort key is null across two partitions
    # (observed on 2.49 with more blocks than rows), so every sort
    # column is encoded as (is_null flag, null-filled value) — the
    # flag reproduces the documented null placement (last under asc,
    # first under desc) and the filled value never reaches Ray's
    # boundary logic as a null.  Rank semantics still read the
    # ORIGINAL columns (null-safe run detection), so the fill value is
    # arbitrary.
    sort_cols: list = []
    sort_desc: list = []
    enc_all = list(zip(by, desc)) + [(c, False) for c in tiebreak]

    def _encode(tab: pa.Table) -> pa.Table:
        cols = {c: tab[c] for c in tab.column_names}
        for i, (c, _d) in enumerate(enc_all):
            col = tab[c]
            fill = _null_fill_default(col.type)
            if pa.types.is_floating(col.type):
                # NaN is ALSO a sort key Ray's range sort can
                # duplicate, and it must order values < NaN < NULL
                # (DuckDB semantics): flag 0 valid / 1 NaN / 2 null,
                # both specials zero-filled out of the value key
                isnan = pc.fill_null(pc.is_nan(col), False)
                cols[f"__nn{i}"] = pc.if_else(
                    pc.is_null(col), pa.scalar(2, pa.int8()),
                    pc.cast(isnan, pa.int8()))
                cols[f"__nv{i}"] = pc.if_else(
                    isnan, fill, pc.fill_null(col, fill))
            else:
                cols[f"__nn{i}"] = pc.cast(pc.is_null(col), pa.int8())
                cols[f"__nv{i}"] = pc.fill_null(col, fill)
        return pa.table(cols)

    for i, (_c, d) in enumerate(enc_all):
        sort_cols += [f"__nn{i}", f"__nv{i}"]
        sort_desc += [d, d]

    s = ds.map_batches(_encode, batch_format="pyarrow") \
        .sort(sort_cols, descending=sort_desc).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    stats = ray.get([_rank_block_stats.remote(r, by)
                     for r in refs])

    # driver pass: O(blocks) scalars
    out_refs = []
    row_off = 0          # global 0-based index of next block's first row
    dense_before = 0     # distinct keys fully before the current block
    prev_last = None     # last key tuple of the previous non-empty block
    run_start = 0        # global 0-based start of the open trailing run
    for r, st in zip(refs, stats):
        n = st["n"]
        if n == 0:
            out_refs.append(_rank_block_finalize.remote(
                r, by, kinds, out_schema, row_off, row_off,
                dense_before, False))
            continue
        cont = prev_last is not None and st["first"] == prev_last
        rank_carry = run_start if cont else row_off
        out_refs.append(_rank_block_finalize.remote(
            r, by, kinds, out_schema, row_off, rank_carry,
            dense_before, cont))
        # advance driver state
        dense_before += st["runs"] - (1 if cont else 0)
        if st["first"] == st["last"] and st["lead"] == n and cont:
            # whole block continues the open run: run_start unchanged
            pass
        else:
            run_start = row_off + n - st["trail"]
        row_off += n
        prev_last = st["last"]
    return rd.from_arrow_refs(out_refs)


def rrf_fuse(
    ds: "rd.Dataset", id_cols, signals: Sequence[tuple[str, bool]],
    *, k: int = 60, buckets: int | None = None,
) -> "rd.Dataset":
    """Reciprocal Rank Fusion over per-row scoring signals: each
    signal column ranks the whole corpus globally (SQL ``RANK()``
    ties), and every row's fused relevance is
    ``rrf = Σ_s 1/(k + rank_s)`` (Cormack et al. SIGIR'09, k=60).
    The multi-signal ranking combiner a curation pipeline uses to
    fold quality/BM25/freshness scores into ONE ordering without
    score normalization.

    Output: ``id_cols`` + one int64 ``rank_<col>`` per signal +
    float64 ``rrf`` (terms summed in ``signals`` order — fixed
    float-op order keeps the score bit-reproducible; rank ties make
    it layout-independent).

    Distribution: one :func:`global_rank` sort per signal (range
    partitioned, O(blocks) driver state) and ONE shared hash exchange
    (:func:`join_many`) folding the rank tables — no all-pairs, no
    driver-side rows.
    """
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    if not signals:
        raise ValueError("rrf_fuse needs at least one signal")
    ranked = []
    for col, desc in signals:
        r = global_rank(ds, col, descending=desc, tiebreak=id_cols,
                        kinds=("rank",))
        ranked.append(r.map_batches(
            lambda t, _c=col: t.select(id_cols + ["rank"])
            .rename_columns(id_cols + [f"rank_{_c}"]),
            batch_format="pyarrow"))
    if len(ranked) == 1:
        fused = ranked[0]
    else:
        fused = join_many(ranked, id_cols, buckets=buckets)
    rank_names = [f"rank_{c}" for c, _ in signals]

    def _score(tab: pa.Table) -> pa.Table:
        acc = np.zeros(tab.num_rows, dtype=np.float64)
        for rn in rank_names:
            acc = acc + 1.0 / (k + tab[rn].to_numpy(zero_copy_only=False))
        return tab.append_column("rrf", pa.array(acc))

    return fused.map_batches(_score, batch_format="pyarrow")


def km_risk_table(
    ds: "rd.Dataset", duration_col: str, event_col: str,
    *, buckets: int | None = None,
) -> pa.Table:
    """Kaplan–Meier risk table over per-subject survival rows: for
    every distinct observed ``duration`` (int units — days, weeks;
    null durations are dropped), the counts the estimator needs:

    - ``n_death``: subjects whose event was OBSERVED at exactly t
      (``event_col`` truthy),
    - ``n_censored``: subjects lost to follow-up at t,
    - ``n_at_risk``: subjects still under observation entering t
      (duration ≥ t).

    Integer-only by design: ``S(t) = Π (n_at_risk−n_death)/n_at_risk``
    is a product of floats no two engines multiply identically, so the
    operator emits the exact counts and leaves the product to the
    consumer — the risk table IS the reproducible artifact (and the
    SQL-checkable one).

    Distribution: per-block partial counts collapse each block to at
    most 2·distinct-durations rows, ONE small exchange merges them
    (``group_agg``), and the suffix-sum for ``n_at_risk`` runs on the
    merged O(distinct durations) table on the driver — with bucketed
    durations (days) that is thousands of rows from 10^12 subjects.
    """
    def _flag(t: pa.Table) -> pa.Table:
        # null event flag = censored (the subject was observed for the
        # duration but no event was recorded — SQL COALESCE(ev, FALSE))
        ev = pc.fill_null(pc.cast(t[event_col], pa.bool_()), False)
        return pa.table({
            duration_col: t[duration_col],
            "_d": pc.cast(ev, pa.int64()),
            "_c": pc.cast(pc.invert(ev), pa.int64()),
        }).filter(pc.is_valid(t[duration_col]))

    merged = group_agg(ds.map_batches(_flag, batch_format="pyarrow"),
                       [duration_col],
                       [("_d", "sum", "n_death"),
                        ("_c", "sum", "n_censored")],
                       buckets=buckets).materialize()
    tabs = [t for t in ray.get(merged.to_arrow_refs()) if t.num_rows]
    tab = pa.concat_tables(tabs, promote_options="default") \
        if tabs else None
    if tab is None or tab.num_rows == 0:
        return pa.table({duration_col: pa.array([], pa.int64()),
                         "n_death": pa.array([], pa.int64()),
                         "n_censored": pa.array([], pa.int64()),
                         "n_at_risk": pa.array([], pa.int64())})
    tab = tab.sort_by(duration_col)
    d = pc.cast(tab["n_death"], pa.int64()).to_numpy(zero_copy_only=False)
    c = pc.cast(tab["n_censored"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    leaving = d + c
    at_risk = leaving[::-1].cumsum()[::-1]
    return pa.table({
        duration_col: pc.cast(tab[duration_col], pa.int64()),
        "n_death": pa.array(d),
        "n_censored": pa.array(c),
        "n_at_risk": pa.array(at_risk),
    })


def theta_set_overlap(
    ds: "rd.Dataset", group_col: str, value_col: str, *,
    k: int = 4096, buckets: int | None = None,
) -> pa.Table:
    """Approximate pairwise SET OPERATIONS between per-group value
    sets via KMV/theta sketches: for every unordered group pair,
    estimated ``|A|``, ``|B|``, ``|A∪B|`` and ``|A∩B|`` — the
    audience-overlap / contamination-matrix shape at 10^12 rows.

    Scale: exact pairwise overlap must ship every distinct
    (group, value) pair through an exchange; this ships ONE ``8k``-byte
    bottom-k sketch per (group, block) — O(groups × blocks) bytes,
    independent of value cardinality — merges per group through one
    exchange, and the driver holds only the O(groups) merged sketches
    for the pairwise pass (group cardinality must be modest: event
    types, sources, languages).  Deterministic (seeded value hashes,
    order-independent merges); sets under ``k`` distinct values are
    EXACT.  Nulls: null values are excluded (SQL DISTINCT), a null
    group is its own group."""
    from ..state.sketches import KMV, _hash64, hash_strings

    def _prep(tab: pa.Table):
        v = tab[value_col].combine_chunks()
        valid = np.asarray(v.is_valid()) if v.null_count else \
            np.ones(len(v), dtype=bool)
        if pa.types.is_integer(v.type):
            data = _hash64(pc.cast(v, pa.int64()).fill_null(0)
                           .to_numpy(zero_copy_only=False)
                           .astype(np.uint64))
        else:
            data = hash_strings(pc.cast(v, pa.string()))
        return data, valid

    def _make(hashes: np.ndarray) -> bytes:
        s = KMV(k)
        s.update_hashes(hashes)
        return s.to_bytes()

    partial = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: _grouped_sketch_partial(t, group_col, _prep, _make,
                                          "__kmv"),
        batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        gtype = tab.schema.field(group_col).type
        if tab.num_rows == 0:
            return pa.table({group_col: pa.nulls(0, type=gtype),
                             "__kmv": pa.array([], type=pa.binary())})
        tab, starts, merged = _merge_grouped_blobs(
            tab, group_col, "__kmv", KMV.from_bytes)
        return pa.table({
            group_col: tab[group_col].take(pa.array(starts)),
            "__kmv": pa.array([s.to_bytes() for s in merged],
                              type=pa.binary())})

    merged_ds = bucketed_map_groups(partial, [group_col], _final,
                                    buckets=buckets,
                                    sort_within=False).materialize()
    tabs = [t for t in ray.get(merged_ds.to_arrow_refs())
            if t.num_rows]
    gtype = tabs[0].schema.field(group_col).type if tabs else         ds.schema().base_schema.field(group_col).type
    rows = [r for t in tabs for r in t.to_pylist()]
    rows.sort(key=lambda r: (r[group_col] is None, str(r[group_col])))
    sketches = [(r[group_col], KMV.from_bytes(r["__kmv"]))
                for r in rows]
    a_col, b_col, ea, eb, eu, ei = [], [], [], [], [], []
    for i in range(len(sketches)):
        for j in range(i + 1, len(sketches)):
            ga, sa = sketches[i]
            gb, sb = sketches[j]
            u = KMV.from_bytes(sa.to_bytes()).merge(sb)
            a_col.append(ga)
            b_col.append(gb)
            ea.append(int(round(sa.estimate())))
            eb.append(int(round(sb.estimate())))
            eu.append(int(round(u.estimate())))
            ei.append(int(round(KMV.intersection_estimate(sa, sb))))
    return pa.table({
        "group_a": pa.array(a_col, gtype),
        "group_b": pa.array(b_col, gtype),
        "est_a": pa.array(ea, pa.int64()),
        "est_b": pa.array(eb, pa.int64()),
        "est_union": pa.array(eu, pa.int64()),
        "est_intersect": pa.array(ei, pa.int64()),
    })


@ray.remote(num_cpus=0.25)
def _block_nrows(tab: pa.Table) -> int:
    return tab.num_rows


@ray.remote(num_cpus=0.25)
def _block_take_one(tab: pa.Table, idx: int) -> pa.Table:
    return tab.slice(idx, 1)


def global_quantiles(
    ds: "rd.Dataset", value_col: str, qs: Sequence[float],
) -> pa.Table:
    """Exact whole-corpus discrete quantiles (SQL ``quantile_disc``
    semantics: value at position ``ceil(q·n)−1`` of the sorted
    non-null values) — the global complement of the per-group
    ``group_quantiles``, which would funnel a constant group through
    ONE bucket task.  Range-partitioned sort instead: per-block row
    COUNTS (an O(1) scalar per block) locate each quantile's block,
    and one single-row take per quantile fetches the value — the
    driver never holds a value column, only O(blocks) counts.
    Returns ``(q float64, value)``."""
    import math
    from fractions import Fraction

    clean = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[value_col]))
        .select([value_col]),
        batch_format="pyarrow")
    s = clean.sort(value_col).materialize()
    refs = s.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    n = int(sum(counts))
    vtype = None
    sch = s.schema(fetch_if_missing=False)
    if sch is not None:
        vtype = sch.base_schema.field(value_col).type
    if n == 0:
        return pa.table({
            "q": pa.array([], pa.float64()),
            "value": pa.array([], vtype or pa.float64())})
    offs = np.concatenate([[0], np.cumsum(counts)])
    fetch = []
    for q in qs:
        # DECIMAL-literal semantics, matching DuckDB's parse of a
        # clean decimal quantile literal: the position is computed on
        # the exact rational of the decimal string, not the binary
        # double (0.2 means 1/5 exactly; ceil is never off-by-one
        # from float representation error)
        pos = min(max(math.ceil(Fraction(str(q)) * n) - 1, 0), n - 1)
        b = int(np.searchsorted(offs, pos, side="right") - 1)
        fetch.append(_block_take_one.remote(refs[b], pos - int(offs[b])))
    rows = ray.get(fetch)
    vals = pa.concat_tables(rows)[value_col]
    return pa.table({"q": pa.array([float(q) for q in qs],
                                   pa.float64()),
                     "value": vals})


def rank_sum_u(
    ds: "rd.Dataset", group_col: str, value_col: str,
    groups: Sequence, *, buckets: int | None = None,
) -> pa.Table:
    """Exact Mann–Whitney / Wilcoxon rank-sum statistics between two
    (or more) groups, ties handled by MIDRANKS without ever computing
    a float: ``2·midrank = rank_asc + (n+1) − rank_desc`` (min-rank
    ascending plus the mirrored descending rank), so the doubled rank
    sum and doubled U stay exact integers any engine reproduces.

    Two :func:`global_rank` passes (range-partitioned sorts, no
    single-bucket funnel) + one tiny per-group aggregate each; the
    driver folds O(groups) scalars.  Output per group:
    ``(group, n, r2_sum, u2)`` with ``u2 = r2_sum − n(n+1)`` — the
    doubled U statistic of that group against the rest."""
    gset = pa.array(list(groups))

    def _keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(t[group_col], value_set=gset),
                    pc.is_valid(t[value_col]))
        return t.filter(m).select([group_col, value_col])

    base = ds.map_batches(_keep, batch_format="pyarrow").materialize()

    def _sums(ranked: "rd.Dataset") -> dict:
        agg = group_agg(ranked, [group_col],
                        [("rank", "sum", "s"),
                         ("rank", "count", "n")], buckets=buckets)
        out = {}
        for t in ray.get(agg.to_arrow_refs()):
            for i in range(t.num_rows):
                out[t[group_col][i].as_py()] = (
                    int(t["s"][i].as_py()), int(t["n"][i].as_py()))
        return out

    asc = _sums(global_rank(base, value_col, kinds=("rank",)))
    desc = _sums(global_rank(base, value_col, descending=True,
                             kinds=("rank",)))
    n = sum(v[1] for v in asc.values())
    keys = sorted(asc, key=lambda k: (k is None, str(k)))
    g_out, n_out, r2_out, u2_out = [], [], [], []
    for g in keys:
        s_a, n_g = asc[g]
        s_d, _ = desc[g]
        r2 = s_a + (n + 1) * n_g - s_d
        g_out.append(g)
        n_out.append(n_g)
        r2_out.append(r2)
        u2_out.append(r2 - n_g * (n_g + 1))
    return pa.table({
        group_col: pa.array(g_out, gset.type),
        "n": pa.array(n_out, pa.int64()),
        "r2_sum": pa.array(r2_out, pa.int64()),
        "u2": pa.array(u2_out, pa.int64()),
    })


def approx_top_k_per_group(
    ds: "rd.Dataset", group_col: str, item_col: str, *,
    n_top: int = 5, k_track: int = 256, buckets: int | None = None,
) -> "rd.Dataset":
    """Approximate PER-GROUP heavy hitters via mergeable SpaceSaving
    summaries: ``(group, item, est_count, err)`` for each group's
    top ``n_top`` items — count desc, item asc.

    Scale shape: exact per-group top-k must ship every distinct
    (group, item) pair through the exchange; this ships ONE
    ``k_track``-entry summary per (group, block) — bounded bytes at
    any item cardinality — and merges per group through one exchange
    (merge keeps the SpaceSaving guarantee: any item with frequency
    > N_g/k_track is present, reported counts overestimate truth by
    at most ``err``).  Below ``k_track`` distinct items per group the
    summary is EXACT (err 0) — the validation-scale regime.  Null
    items are excluded; a null group is its own group."""
    from ..state.sketches import SpaceSaving

    def _prep(tab: pa.Table):
        v = pc.cast(tab[item_col], pa.string()).combine_chunks()
        valid = np.asarray(v.is_valid()) if v.null_count else \
            np.ones(len(v), dtype=bool)
        return v.to_numpy(zero_copy_only=False), valid

    def _make(items: np.ndarray) -> bytes:
        s = SpaceSaving(k_track)
        if len(items):
            u, c = np.unique(items, return_counts=True)
            s.update_aggregated(list(u), c)
        return s.to_bytes()

    partial = ds.select_columns([group_col, item_col]).map_batches(
        lambda t: _grouped_sketch_partial(t, group_col, _prep, _make,
                                          "__ss"),
        batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        gtype = tab.schema.field(group_col).type
        if tab.num_rows == 0:
            return pa.table({
                group_col: pa.nulls(0, type=gtype),
                "item": pa.array([], pa.string()),
                "est_count": pa.array([], pa.int64()),
                "err": pa.array([], pa.int64())})
        tab, starts, merged = _merge_grouped_blobs(
            tab, group_col, "__ss", SpaceSaving.from_bytes)
        g_idx, items, cnts, errs = [], [], [], []
        for i, st in enumerate(starts):
            for it, c, e in merged[i].top(n_top):
                g_idx.append(int(st))
                items.append(it)
                cnts.append(c)
                errs.append(e)
        return pa.table({
            group_col: tab[group_col].take(pa.array(g_idx, pa.int64())),
            "item": pa.array(items, pa.string()),
            "est_count": pa.array(cnts, pa.int64()),
            "err": pa.array(errs, pa.int64())})

    return bucketed_map_groups(partial, [group_col], _final,
                               buckets=buckets, sort_within=False)


def group_theilsen(
    ds: "rd.Dataset", group_col: str, x_col: str, y_col: str, *,
    max_group: int = 2000, buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group Theil–Sen robust slope: the MEDIAN of all pairwise
    slopes ``(y_j − y_i)/(x_j − x_i)`` (pairs with equal x excluded;
    even pair count averages the two middles — SQL ``median``
    semantics).  Breakdown point ~29%: one wild outlier moves OLS
    arbitrarily but barely moves Theil–Sen.  Output
    ``(group, n, n_pairs, slope)``; a group with no valid pair gets
    NULL slope.

    Distribution: one hash exchange on the group; inside a bucket the
    O(s²) pair expansion reuses the dedup module's shared per-size
    triu templates, sliced so at most ~4M pairs are resident at once.
    Rows with null x/y are dropped; groups larger than ``max_group``
    raise (the estimator is inherently quadratic — subsample upstream
    for bigger groups rather than silently degrade)."""
    def _clean(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        m = pc.and_(m, pc.is_valid(t[group_col]))
        return t.filter(m).select([group_col, x_col, y_col])

    cleaned = ds.map_batches(_clean, batch_format="pyarrow")

    def _ts(tab: pa.Table) -> pa.Table:
        gtype = tab.schema.field(group_col).type
        empty = pa.table({
            group_col: pa.nulls(0, type=gtype),
            "n": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "slope": pa.array([], pa.float64())})
        n = tab.num_rows
        if n == 0:
            return empty
        tab = tab.sort_by([(group_col, "ascending")])
        new = segment_starts(tab, [group_col])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.append(firsts, n))
        if counts.max() > max_group:
            raise ValueError(
                f"group_theilsen: group of size {counts.max()} "
                f"exceeds max_group={max_group}")
        x = pc.cast(tab[x_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        y = pc.cast(tab[y_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        g_out, n_out, np_out, s_out = [], [], [], []
        budget = 4 << 20
        for s in np.unique(counts):
            s = int(s)
            base = firsts[counts == s]
            if s < 2:
                for b in base:
                    g_out.append(int(b))
                    n_out.append(s)
                    np_out.append(0)
                    s_out.append(np.nan)
                continue
            ia, ib = np.triu_indices(s, k=1)
            per = len(ia)
            step = max(1, budget // per)
            for lo in range(0, len(base), step):
                bs = base[lo:lo + step]
                A = bs[:, None] + ia[None, :]
                B = bs[:, None] + ib[None, :]
                dx = x[B] - x[A]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sl = (y[B] - y[A]) / dx
                # SQL parity: equal-x pairs are NULL (excluded), but a
                # NaN-y slope is a VALUE that sorts largest — map it
                # to +inf so sorting places it where DuckDB does, and
                # map any inf-touching median back to NaN at the end
                nan_slope = np.isnan(sl) & (dx != 0)
                sl[nan_slope] = np.inf
                sl[dx == 0] = np.nan          # sorts after inf: excluded
                valid = (dx != 0).sum(axis=1)
                srt = np.sort(sl, axis=1)
                med = np.full(len(bs), np.nan)
                has = valid > 0
                if has.any():
                    m = valid[has]
                    lo = srt[has, (m - 1) // 2]
                    hi = srt[has, m // 2]
                    med[has] = (lo + hi) / 2.0
                med[np.isinf(med)] = np.nan
                g_out.extend(int(b) for b in bs)
                n_out.extend([s] * len(bs))
                np_out.extend(valid.astype(np.int64).tolist())
                s_out.extend(med.tolist())
        order = np.argsort(np.array(g_out))
        gvals = tab[group_col].take(pa.array(np.array(g_out)[order]))
        n_arr = np.array(n_out, dtype=np.int64)[order]
        p_arr = np.array(np_out, dtype=np.int64)[order]
        s_arr = np.array(s_out, dtype=np.float64)[order]
        return pa.table({
            group_col: gvals,
            "n": pa.array(n_arr),
            "n_pairs": pa.array(p_arr),
            "slope": pa.array(s_arr, pa.float64())}) \
            .set_column(3, "slope",
                        pc.if_else(pa.array(np.isnan(s_arr)),
                                   pa.scalar(None, pa.float64()),
                                   pa.array(s_arr)))

    return bucketed_map_groups(cleaned, [group_col], _ts,
                               buckets=buckets, sort_within=False)


def hopping_window_quantile(
    ds: "rd.Dataset", ts_col: str, group_col: str, value_col: str, *,
    size_us: int, hop_us: int, qs: Sequence[float],
    delta: int = 200, buckets: int | None = None,
) -> "rd.Dataset":
    """Sliding-window percentiles: t-digest quantile estimates per
    (hopping window, group) — the latency-p99-over-time shape.
    Output ``(window_start, group, q, value_est)``.

    Scale shape: the k = size/hop per-row window expansion happens
    INSIDE each block and collapses immediately to one constant-size
    t-digest blob per (window, group, block) — only blobs ride the
    exchange, never the k× rows (the reason exact sliding quantiles
    don't scale: they must ship every (window, value) pair).  Windows
    floor-divide the epoch (negative timestamps bucket like SQL
    ``//``); null timestamps/values drop.  The group column must
    round-trip through a string key (ints/strings do); its dtype is
    restored in the output."""
    from ..state.sketches import TDigest

    gsch = ds.schema(fetch_if_missing=True)
    gtype = gsch.base_schema.field(group_col).type

    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    k = size_us // hop_us

    def _expand(tab: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(tab[ts_col]),
                    pc.is_valid(tab[value_col]))
        m = pc.and_(m, pc.is_valid(tab[group_col]))
        tab = tab.filter(m)
        ts = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        base = np.floor_divide(ts, hop_us)
        parts = []
        for j in range(k):
            w = (base - j) * hop_us
            parts.append(pa.table({
                "window_start": pa.array(w),
                group_col: tab[group_col],
                value_col: tab[value_col]}))
        return pa.concat_tables(parts)

    def _prep(tab: pa.Table):
        v = pc.cast(tab[value_col], pa.float64())
        valid = np.asarray(v.is_valid()) if v.null_count else \
            np.ones(len(v), dtype=bool)
        return v.to_numpy(zero_copy_only=False), valid

    def _make(vals: np.ndarray) -> bytes:
        t = TDigest(delta)
        t.update(vals)
        return t.to_bytes()

    def _partial(tab: pa.Table) -> pa.Table:
        tab = _expand(tab)
        # composite (window, group) key packed as one string column so
        # the shared grouped-sketch machinery applies unchanged
        wk = pc.binary_join_element_wise(
            pc.cast(tab["window_start"], pa.string()),
            pc.cast(tab[group_col], pa.string()), "|")
        keyed = pa.table({"__wg": wk, value_col: tab[value_col]})
        return _grouped_sketch_partial(keyed, "__wg", _prep, _make,
                                       "__td")

    partial = ds.select_columns([ts_col, group_col, value_col]) \
        .map_batches(_partial, batch_format="pyarrow")

    qlist = [float(q) for q in qs]

    def _final(tab: pa.Table) -> pa.Table:
        empty = pa.table({
            "window_start": pa.array([], pa.int64()),
            group_col: pa.array([], gtype),
            "q": pa.array([], pa.float64()),
            "value_est": pa.array([], pa.float64())})
        if tab.num_rows == 0:
            return empty
        tab, starts, merged = _merge_grouped_blobs(
            tab, "__wg", "__td", TDigest.from_bytes)
        keys = tab["__wg"].take(pa.array(starts)).to_pylist()
        ws, gs, qs_out, vs = [], [], [], []
        for key, td in zip(keys, merged):
            w_str, g = key.split("|", 1)
            est = td.quantile(np.array(qlist))
            for q, v in zip(qlist, est):
                ws.append(int(w_str))
                gs.append(g)
                qs_out.append(q)
                vs.append(float(v))
        return pa.table({
            "window_start": pa.array(ws, pa.int64()),
            group_col: pc.cast(pa.array(gs, pa.string()), gtype),
            "q": pa.array(qs_out, pa.float64()),
            "value_est": pa.array(vs, pa.float64())})

    return bucketed_map_groups(partial, ["__wg"], _final,
                               buckets=buckets, sort_within=False)


def hopping_window_distinct_approx(
    ds: "rd.Dataset", ts_col: str, group_col: str, value_col: str, *,
    size_us: int, hop_us: int, p: int = 12,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Approximate sliding-window COUNT(DISTINCT): HyperLogLog per
    (hopping window, group) — active-users-per-window at 10^12 rows.
    Output ``(window_start, group, n_approx)``.

    Scale shape vs the exact :func:`hopping_window_distinct`: exact
    must ship every distinct (window, value) pair through the
    exchange — O(windows × distinct values) rows — while this ships
    ONE 2^p-register sketch per (window, group, block).  Same
    composite-key machinery as :func:`hopping_window_quantile`;
    deterministic and parallelism-independent (register-wise max).
    The group column round-trips through a string key; its dtype is
    restored in the output."""
    from ..state.sketches import HyperLogLog, _hash64, hash_strings

    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    k = size_us // hop_us
    gsch = ds.schema(fetch_if_missing=True)
    gtype = gsch.base_schema.field(group_col).type

    def _expand(tab: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(tab[ts_col]),
                    pc.is_valid(tab[value_col]))
        m = pc.and_(m, pc.is_valid(tab[group_col]))
        tab = tab.filter(m)
        ts = pc.cast(pc.cast(tab[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        base = np.floor_divide(ts, hop_us)
        parts = []
        for j in range(k):
            w = (base - j) * hop_us
            wk = pc.binary_join_element_wise(
                pa.array(w.astype(str)),
                pc.cast(tab[group_col], pa.string()), "|")
            parts.append(pa.table({"__wg": wk,
                                   value_col: tab[value_col]}))
        return pa.concat_tables(parts)

    def _prep(tab: pa.Table):
        v = tab[value_col].combine_chunks()
        valid = np.asarray(v.is_valid()) if v.null_count else \
            np.ones(len(v), dtype=bool)
        if pa.types.is_integer(v.type):
            data = _hash64(pc.cast(v, pa.int64()).fill_null(0)
                           .to_numpy(zero_copy_only=False)
                           .astype(np.uint64))
        else:
            data = hash_strings(pc.cast(v, pa.string()))
        return data, valid

    def _make(hashes: np.ndarray) -> bytes:
        h = HyperLogLog(p)
        h.update_hashes(hashes)
        return h.to_bytes()

    partial = ds.select_columns([ts_col, group_col, value_col]) \
        .map_batches(
            lambda t: _grouped_sketch_partial(_expand(t), "__wg",
                                              _prep, _make, "__hll"),
            batch_format="pyarrow")

    def _final(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({
                "window_start": pa.array([], pa.int64()),
                group_col: pa.array([], gtype),
                "n_approx": pa.array([], pa.int64())})
        tab, starts, merged = _merge_grouped_blobs(
            tab, "__wg", "__hll", HyperLogLog.from_bytes)
        keys = tab["__wg"].take(pa.array(starts)).to_pylist()
        ws, gs, ns = [], [], []
        for key, h in zip(keys, merged):
            w_str, g = key.split("|", 1)
            ws.append(int(w_str))
            gs.append(g)
            ns.append(int(round(h.estimate())))
        return pa.table({
            "window_start": pa.array(ws, pa.int64()),
            group_col: pc.cast(pa.array(gs, pa.string()), gtype),
            "n_approx": pa.array(ns, pa.int64())})

    return bucketed_map_groups(partial, ["__wg"], _final,
                               buckets=buckets, sort_within=False)


# ---------------------------------------------------------------------------
# Global ordered prefix-sum packing (curriculum / shard assembly)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=1)
def _pack_block_stats(tab: pa.Table, weight_col: str) -> int:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return 0
    w = pc.cast(tab[weight_col], pa.int64()).fill_null(0)
    return int(pc.sum(w).as_py() or 0)


@ray.remote(num_cpus=1)
def _pack_block_finalize(tab: pa.Table, weight_col: str, offset: int,
                         budget: int, keep_cols: list) -> pa.Table:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    out = {c: tab[c] for c in keep_cols}
    if tab.num_rows == 0:
        out["bin"] = pa.array([], type=pa.int64())
        out["bin_offset"] = pa.array([], type=pa.int64())
        return pa.table(out)
    w = pc.cast(tab[weight_col], pa.int64()).fill_null(0) \
        .combine_chunks().to_numpy(zero_copy_only=False)
    excl = offset + np.cumsum(w) - w
    out["bin"] = pa.array(excl // budget, type=pa.int64())
    out["bin_offset"] = pa.array(excl % budget, type=pa.int64())
    return pa.table(out)


def global_pack(
    ds: "rd.Dataset", order_cols: Sequence[str], weight_col: str, *,
    budget: int, descending=False,
) -> "rd.Dataset":
    """GLOBAL contiguous-fill packing: sort the whole corpus by
    ``order_cols`` and assign each row to ``bin = floor(exclusive_
    global_prefix_sum(weight) / budget)`` (plus its ``bin_offset``) —
    the curriculum/shard-assembly step where one total order spans
    the corpus, which :func:`pack_bins` (per-GROUP packing, one hash
    bucket per group) cannot express without serializing everything
    into a single group.

    Same straddling semantics as ``pack_bins``: a row stays wholly in
    the bin where its exclusive prefix lands, so a bin overfills by
    at most ``max(weight) - 1`` — the price of keeping assignment a
    pure prefix sum (associative, layout-independent, SQL-window
    reproducible).

    Distribution, TeraSort style like :func:`global_rank`: ONE
    range-partitioned sort (order keys null-encoded so Ray's boundary
    logic never sees a null or NaN), one O(1) weight-sum stat task
    per block, a driver fold carrying O(blocks) integer offsets
    (Python ints — exact at any corpus size), and one finalize task
    per block attaching ``bin``/``bin_offset`` vectorized."""
    order_cols = list(order_cols)
    if budget <= 0:
        raise ValueError("budget must be positive")
    desc = ([descending] * len(order_cols)
            if isinstance(descending, bool) else list(descending))
    if len(desc) != len(order_cols):
        raise ValueError("descending must match order_cols arity")

    sch = ds.schema(fetch_if_missing=False)
    if sch is None:
        ds = ds.materialize()
        sch = ds.schema()
    if sch is None:
        return ds
    keep_cols = list(sch.base_schema.names)

    def _encode(tab: pa.Table) -> pa.Table:
        cols = {c: tab[c] for c in tab.column_names}
        for i, c in enumerate(order_cols):
            col = tab[c]
            fill = _null_fill_default(col.type)
            if pa.types.is_floating(col.type):
                isnan = pc.fill_null(pc.is_nan(col), False)
                cols[f"__pn{i}"] = pc.if_else(
                    pc.is_null(col), pa.scalar(2, pa.int8()),
                    pc.cast(isnan, pa.int8()))
                cols[f"__pv{i}"] = pc.if_else(
                    isnan, fill, pc.fill_null(col, fill))
            else:
                cols[f"__pn{i}"] = pc.cast(pc.is_null(col), pa.int8())
                cols[f"__pv{i}"] = pc.fill_null(col, fill)
        return pa.table(cols)

    sort_cols, sort_desc = [], []
    for i, d in enumerate(desc):
        sort_cols += [f"__pn{i}", f"__pv{i}"]
        sort_desc += [d, d]
    s = ds.map_batches(_encode, batch_format="pyarrow") \
        .sort(sort_cols, descending=sort_desc).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    sums = ray.get([_pack_block_stats.remote(r, weight_col)
                    for r in refs])
    out_refs = []
    offset = 0
    for r, ws in zip(refs, sums):
        out_refs.append(_pack_block_finalize.remote(
            r, weight_col, offset, budget, keep_cols))
        offset += ws
    return rd.from_arrow_refs(out_refs)


def _field_types_or(ds: "rd.Dataset", cols: Sequence[str],
                    defaults: Sequence["pa.DataType"]) -> list:
    """Arrow types of ``cols`` from the dataset's already-known schema
    (``fetch_if_missing=False`` — never triggers execution), falling
    back to ``defaults`` per column when the schema is unknown or a
    column is absent.  Used by operators that must emit SCHEMA-STABLE
    empty blocks from empty exchange buckets (a mismatched empty
    block poisons the union schema)."""
    out = list(defaults)
    sch = ds.schema(fetch_if_missing=False)
    if sch is not None:
        base = getattr(sch, "base_schema", sch)
        for i, c in enumerate(cols):
            try:
                out[i] = base.field(c).type
            except KeyError:
                pass
    return out


def scd2_intervals(
    ds: "rd.Dataset", key_col: str, value_col: str, ts_col: str, *,
    tiebreak: Sequence[str] = (), buckets: int | None = None,
) -> "rd.Dataset":
    """Slowly-changing-dimension (type 2) history build: collapse each
    key's time-ordered value stream into validity intervals —
    ``(key, value, valid_from, valid_to, version)`` with one row per
    RUN of consecutive equal values, ``valid_to`` the next run's
    start (null while current) and ``version`` the key's 1-based run
    ordinal.  Ordering ties resolve by ``tiebreak`` columns; equal
    values compare null-safely (null == null, one run).

    One hash exchange on the key; run detection, interval bounds and
    version numbers are all shift-compares over the bucket-sorted
    arrays — no per-key Python."""
    tiebreak = list(tiebreak)
    sort_cols = [key_col, ts_col] + tiebreak

    # empty-bucket blocks must carry the SAME key/value/ts types as
    # the non-empty ones (a string key or non-us timestamp would
    # otherwise poison the union schema) — derive from the input
    # schema when available, fall back to the common fixture types
    key_t, val_t, ts_t = _field_types_or(
        ds, [key_col, value_col, ts_col],
        [pa.int64(), pa.string(), pa.timestamp("us")])

    def _runs(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({
                key_col: pa.array([], key_t),
                value_col: pa.array([], val_t),
                "valid_from": pa.array([], ts_t),
                "valid_to": pa.array([], ts_t),
                "version": pa.array([], pa.int64())})
        tab = tab.sort_by([(c, "ascending") for c in sort_cols])
        new_key = segment_starts(tab, [key_col])
        # null-safe value change detection via the shared segment
        # machinery on (key, value): a row starts a run iff it starts
        # a (key, value) segment in the KEY-sorted order... which is
        # not the same as a (key,value) sort — compare shifted arrays
        # instead
        v = tab[value_col]
        eq = pc.fill_null(
            pc.equal(v.slice(1), v.slice(0, tab.num_rows - 1)), False)
        both_null = pc.and_(pc.is_null(v.slice(1)),
                            pc.is_null(v.slice(0, tab.num_rows - 1)))
        same = pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        chg = np.ones(tab.num_rows, dtype=bool)
        chg[1:] = new_key[1:] | ~same
        starts = np.flatnonzero(chg)
        key_seg = np.cumsum(new_key) - 1
        # version: ordinal of the run within its key
        run_key = key_seg[starts]
        first_run_of_key = np.concatenate(
            [[True], run_key[1:] != run_key[:-1]])
        version = np.arange(len(starts)) - np.repeat(
            np.flatnonzero(first_run_of_key),
            np.diff(np.append(np.flatnonzero(first_run_of_key),
                              len(starts)))) + 1
        ts = tab[ts_col].combine_chunks()
        valid_from = ts.take(pa.array(starts))
        nxt = np.append(starts[1:], -1)
        same_key_next = np.append(run_key[1:] == run_key[:-1], False)
        to_idx = np.where(same_key_next, nxt, 0)
        valid_to_raw = ts.take(pa.array(to_idx))
        valid_to = pc.if_else(pa.array(same_key_next), valid_to_raw,
                              pa.nulls(len(starts), ts.type))
        return pa.table({
            key_col: tab[key_col].combine_chunks().take(
                pa.array(starts)),
            value_col: v.combine_chunks().take(pa.array(starts)),
            "valid_from": valid_from,
            "valid_to": valid_to,
            "version": pa.array(version.astype(np.int64))})

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(
            sort_cols + [value_col]))), [key_col], _runs,
        buckets=buckets, sort_within=False)


def cms_join_size_estimate(
    left: "rd.Dataset", right: "rd.Dataset",
    left_key: Sequence[str] | str, right_key: Sequence[str] | str, *,
    w: int = 4096, d: int = 5,
) -> dict:
    """Equi-join OUTPUT-size estimate WITHOUT joining: fold one
    count-min sketch per side over the composite key hashes (constant
    ``d × w`` int64 bytes per block, merged by addition — associative,
    layout-independent) and take ``min_r ⟨A_r, B_r⟩`` over the d hash
    rows (Cormode & Muthukrishnan's inner-product estimator).  The
    estimate NEVER undershoots the true size (collisions only add),
    and exceeds it by at most ``e/w · |L| · |R|`` with probability
    ``1 − e^−d`` — the planner-side cardinality input for choosing
    broadcast vs bucketed vs skew-path joins before paying any
    shuffle.

    Returns ``{"estimate": int, "n_left": int, "n_right": int,
    "bound": int}`` (bound = the ``⌈e/w·|L|·|R|⌉`` slack term)."""
    import math

    from ..state.sketches import CountMin

    def _fold(ds, keys):
        keys = [keys] if isinstance(keys, str) else list(keys)

        def _partial(tab: pa.Table) -> pa.Table:
            cms = CountMin(w=w, d=d)
            cms.update_hashes(composite_hash(tab, keys))
            return pa.table({
                "cms": pa.array([cms.to_bytes()], type=pa.binary()),
                "n": pa.array([tab.num_rows], type=pa.int64())})

        total = CountMin(w=w, d=d)
        n = 0
        for t in ray.get(ds.select_columns(keys).map_batches(
                _partial, batch_format="pyarrow").to_arrow_refs()):
            for blob, bn in zip(t["cms"].to_pylist(),
                                t["n"].to_pylist()):
                total.merge(CountMin.from_bytes(blob))
                n += int(bn)
        return total, n

    ca, na = _fold(left, left_key)
    cb, nb = _fold(right, right_key)
    est = min(int(np.dot(ca.table[r].astype(object),
                         cb.table[r].astype(object)))
              for r in range(d))
    bound = int(math.ceil(math.e / w * na * nb))
    return {"estimate": est, "n_left": na, "n_right": nb,
            "bound": bound}


@ray.remote(num_cpus=1)
def _emd_block_stats(tab: pa.Table) -> dict:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return {"n": 0}
    return {"n": tab.num_rows,
            "sum_a": int(pc.sum(tab["na"]).as_py() or 0),
            "sum_b": int(pc.sum(tab["nb"]).as_py() or 0),
            "first_qv": int(tab["qv"][0].as_py()),
            "last_qv": int(tab["qv"][tab.num_rows - 1].as_py())}


@ray.remote(num_cpus=1)
def _emd_block_fold(tab: pa.Table, cum_a: int, cum_b: int,
                    total_a: int, total_b: int,
                    next_qv: int | None) -> str:
    """One block's contribution to Σ |cumA·N_B − cumB·N_A| · gap over
    the globally qv-sorted distinct-value table; the driver supplies
    the exclusive prefix counts and the NEXT block's first value (the
    boundary gap).  Python-int exact; returned as a decimal string."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return "0"
    qv = tab["qv"].to_numpy(zero_copy_only=False).astype(object)
    na = tab["na"].to_numpy(zero_copy_only=False).astype(object)
    nb = tab["nb"].to_numpy(zero_copy_only=False).astype(object)
    ca = np.cumsum(na) + cum_a
    cb = np.cumsum(nb) + cum_b
    total = 0
    for i in range(len(qv)):
        nxt = qv[i + 1] if i + 1 < len(qv) else next_qv
        if nxt is None:
            break
        total += abs(int(ca[i]) * total_b - int(cb[i]) * total_a) \
            * (int(nxt) - int(qv[i]))
    return str(total)


def wasserstein_1d(
    ds: "rd.Dataset", value_col: str, side_col: str, *,
    buckets: int | None = None,
) -> dict:
    """EXACT 1-D Wasserstein (earth-mover) distance between the two
    integer-valued distributions tagged ``"a"`` / ``"b"`` in
    ``side_col``:

        ``W1 = Σ_gaps |F_a − F_b| · gap
             = Σ |cumA·N_B − cumB·N_A| · gap / (N_A · N_B)``

    returned as exact integers ``{"w1_num": int, "n_a": int,
    "n_b": int}`` (the caller divides — or hash-checks the numerator
    directly; a SQL running-sum window reproduces it term-for-term).

    Distribution: one exchange aggregates per-value counts, ONE
    range-partitioned sort orders the distinct values, an O(1) stats
    task per block feeds the driver's exclusive-prefix fold
    (O(blocks) Python ints — exact at any scale), and each block
    folds its own terms with the boundary gap supplied by the driver.
    The per-block loop runs over DISTINCT values of that block with
    arbitrary-precision ints — the price of exactness; quantize the
    value column coarser when the distinct-value count is the
    bottleneck."""
    def _counts(tab: pa.Table) -> pa.Table:
        a = pc.cast(pc.equal(tab[side_col], "a"), pa.int64())
        b = pc.cast(pc.equal(tab[side_col], "b"), pa.int64())
        return agg_named(
            pa.table({"qv": tab[value_col], "na": a, "nb": b}),
            ["qv"], [("na", "sum"), ("nb", "sum")], ["na", "nb"])

    per_value = bucketed_map_groups(
        ds.select_columns([value_col, side_col]).map_batches(
            _counts, batch_format="pyarrow"),
        ["qv"],
        lambda t: agg_named(t, ["qv"], [("na", "sum"), ("nb", "sum")],
                            ["na", "nb"]),
        buckets=buckets, sort_within=False)

    s = per_value.sort("qv").materialize()
    refs = s.to_arrow_refs()
    stats = ray.get([_emd_block_stats.remote(r) for r in refs])
    total_a = sum(st.get("sum_a", 0) for st in stats)
    total_b = sum(st.get("sum_b", 0) for st in stats)
    # next non-empty block's first value per block
    firsts = [st.get("first_qv") for st in stats]
    nexts: list[int | None] = []
    for i in range(len(stats)):
        nxt = None
        for j in range(i + 1, len(stats)):
            if stats[j]["n"]:
                nxt = firsts[j]
                break
        nexts.append(nxt)
    folds = []
    cum_a = cum_b = 0
    for r, st, nxt in zip(refs, stats, nexts):
        folds.append(_emd_block_fold.remote(r, cum_a, cum_b,
                                            total_a, total_b, nxt))
        cum_a += st.get("sum_a", 0)
        cum_b += st.get("sum_b", 0)
    w1_num = sum(int(x) for x in ray.get(folds))
    return {"w1_num": w1_num, "n_a": total_a, "n_b": total_b}


def interval_union_length(
    ds: "rd.Dataset", key_col: str, start_col: str, end_col: str, *,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Total length of the UNION of each key's (possibly overlapping)
    half-open intervals, plus the merged-interval count — the
    active-time / uptime / coverage measure
    (``[1,5)∪[3,8)∪[10,12) → 9, 2 intervals``).  Degenerate
    intervals (end ≤ start) contribute zero length but still merge.

    One hash exchange on the key; inside each bucket the classic
    sweep is fully vectorized: sort by (key, start, end), running
    ``np.maximum.accumulate`` of ends segment-reset per key, a break
    wherever a start exceeds the previous running max, and merged
    spans reduced by segment sums — no per-key Python.  Output:
    ``(key, active, n_intervals)``, both int64."""
    # empty-bucket key type must match the non-empty blocks' (same
    # schema-poisoning hazard scd2_intervals documents)
    [key_t] = _field_types_or(ds, [key_col], [pa.int64()])

    def _union(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "active": pa.array([], pa.int64()),
                             "n_intervals": pa.array([], pa.int64())})
        tab = tab.sort_by([(key_col, "ascending"),
                           (start_col, "ascending"),
                           (end_col, "ascending")])
        new_key = segment_starts(tab, [key_col])
        s = pc.cast(tab[start_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        e = pc.cast(tab[end_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        key_seg = np.cumsum(new_key) - 1
        # running max of e within each key segment (C-level grouped
        # cummax; a shift-offset accumulate trick would overflow for
        # epoch-range values × many keys)
        import pandas as pd
        run = pd.Series(e).groupby(key_seg).cummax().to_numpy()
        prev_max = np.empty_like(run)
        prev_max[1:] = run[:-1]
        brk = new_key.copy()
        brk[1:] |= s[1:] > prev_max[1:]
        # merged span id; span bounds: start of first member,
        # running-max end at last member
        span = np.cumsum(brk) - 1
        span_start = s[np.flatnonzero(brk)]
        last_of_span = np.append(np.flatnonzero(brk)[1:] - 1,
                                 len(s) - 1)
        span_end = run[last_of_span]
        span_len = np.maximum(span_end - span_start, 0)
        span_key_row = np.flatnonzero(brk)
        key_of_span = key_seg[span_key_row]
        n_keys = int(key_seg[-1]) + 1
        active = np.zeros(n_keys, np.int64)
        np.add.at(active, key_of_span, span_len)
        n_int = np.bincount(key_of_span, minlength=n_keys) \
            .astype(np.int64)
        first_rows = np.flatnonzero(new_key)
        return pa.table({
            key_col: tab[key_col].combine_chunks().take(
                pa.array(first_rows)),
            "active": pa.array(active),
            "n_intervals": pa.array(n_int)})

    return bucketed_map_groups(
        ds.select_columns([key_col, start_col, end_col]), [key_col],
        _union, buckets=buckets, sort_within=False)


@ray.remote(num_cpus=1)
def _stump_block_stats(tab: pa.Table) -> dict:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return {"n": 0}
    return {"n": tab.num_rows,
            "pos": int(pc.sum(tab["pos"]).as_py() or 0),
            "neg": int(pc.sum(tab["neg"]).as_py() or 0)}


@ray.remote(num_cpus=1)
def _stump_block_best(tab: pa.Table, cum_pos: int, cum_neg: int,
                      tot_pos: int, tot_neg: int,
                      quant: int, is_last: bool) -> tuple | None:
    """Best (lowest) split score among this block's candidate
    thresholds: split AFTER each distinct value (the last global value
    is no split).  Returns (score_q, threshold) or None."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return None
    from ..functions import round_half_away

    qv = tab["qv"].to_numpy(zero_copy_only=False)
    p = np.cumsum(tab["pos"].to_numpy(zero_copy_only=False)) + cum_pos
    ng = np.cumsum(tab["neg"].to_numpy(zero_copy_only=False)) + cum_neg
    if is_last:         # drop the no-split candidate (all rows left)
        qv, p, ng = qv[:-1], p[:-1], ng[:-1]
        if len(qv) == 0:
            return None

    def _xlx(c):
        c = c.astype(np.float64)
        return np.where(c > 0, c * np.log(np.maximum(c, 1)), 0.0)

    rp = tot_pos - p
    rn = tot_neg - ng
    score = (_xlx(p + ng) - _xlx(p) - _xlx(ng)
             + _xlx(rp + rn) - _xlx(rp) - _xlx(rn))
    sq = round_half_away(score * quant, 0).astype(np.int64)
    i = int(np.lexsort((qv, sq))[0])      # min score, tie: smaller qv
    n_left = int(p[i] + ng[i])
    return (int(sq[i]), int(qv[i]), n_left,
            (tot_pos + tot_neg) - n_left)


def decision_stump(
    ds: "rd.Dataset", value_col: str, label_col: str, *,
    quant: int = 1_000_000, buckets: int | None = None,
) -> dict:
    """Exact best binary split (a depth-1 decision tree): over every
    candidate threshold t (split after each distinct value of the
    int64 ``value_col``), minimize the total split impurity

        ``n_L·H(L) + n_R·H(R)
          = Σ_side [ n·ln n − c₊·ln c₊ − c₋·ln c₋ ]``

    computed from EXACT prefix class counts, the float expression
    quantized ONCE per threshold (``round_half_away(score · quant)``)
    so the argmin — ties to the smaller threshold — is deterministic
    and SQL-window-reproducible.  ``label_col`` must be 0/1 int64.

    Returns ``{"threshold": int, "score_q": int, "n_left": int,
    "n_right": int}`` — rows with ``value <= threshold`` go left.

    Distribution: the EMD motif — one per-value count exchange, one
    range sort over distinct values, O(1) class-prefix stats per
    block, per-block vectorized candidate scoring with driver-carried
    prefix counts, O(blocks) driver reduce of block champions."""
    def _counts(tab: pa.Table) -> pa.Table:
        lab = pc.cast(tab[label_col], pa.int64())
        return agg_named(
            pa.table({"qv": tab[value_col], "pos": lab,
                      "neg": pc.subtract(1, lab)}),
            ["qv"], [("pos", "sum"), ("neg", "sum")], ["pos", "neg"])

    per_value = bucketed_map_groups(
        ds.select_columns([value_col, label_col]).map_batches(
            _counts, batch_format="pyarrow"),
        ["qv"],
        lambda t: agg_named(t, ["qv"],
                            [("pos", "sum"), ("neg", "sum")],
                            ["pos", "neg"]),
        buckets=buckets, sort_within=False)

    s = per_value.sort("qv").materialize()
    refs = s.to_arrow_refs()
    stats = ray.get([_stump_block_stats.remote(r) for r in refs])
    tot_pos = sum(st.get("pos", 0) for st in stats)
    tot_neg = sum(st.get("neg", 0) for st in stats)
    last_nonempty = max((i for i, st in enumerate(stats) if st["n"]),
                        default=-1)
    folds = []
    cum_pos = cum_neg = 0
    for i, (r, st) in enumerate(zip(refs, stats)):
        folds.append(_stump_block_best.remote(
            r, cum_pos, cum_neg, tot_pos, tot_neg, quant,
            i == last_nonempty))
        cum_pos += st.get("pos", 0)
        cum_neg += st.get("neg", 0)
    best = None
    for cand in ray.get(folds):
        if cand is None:
            continue
        if best is None or (cand[0], cand[1]) < (best[0], best[1]):
            best = cand
    if best is None:
        raise ValueError("no split candidate (fewer than 2 distinct "
                         "values)")
    return {"score_q": best[0], "threshold": best[1],
            "n_left": best[2], "n_right": best[3]}


@ray.remote(num_cpus=1)
def _ks_block_fold(tab: pa.Table, cum_a: int, cum_b: int,
                   total_a: int, total_b: int) -> tuple:
    """Block maximum of |cumA·N_B − cumB·N_A| over its distinct
    values (evaluated at every step of the union CDF), with the
    smallest value attaining it."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return (0, None)
    qv = tab["qv"].to_numpy(zero_copy_only=False)
    ca = np.cumsum(tab["na"].to_numpy(zero_copy_only=False)
                   .astype(object)) + cum_a
    cb = np.cumsum(tab["nb"].to_numpy(zero_copy_only=False)
                   .astype(object)) + cum_b
    diff = np.abs(ca * total_b - cb * total_a)
    best = int(np.argmax(diff))       # first (= smallest qv) argmax
    return (int(diff[best]), int(qv[best]))


def ks_exact(
    ds: "rd.Dataset", value_col: str, side_col: str, *,
    buckets: int | None = None,
) -> dict:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the
    integer-valued distributions tagged ``"a"`` / ``"b"``:

        ``KS = max_v |F_a(v) − F_b(v)|
             = max_v |cumA·N_B − cumB·N_A| / (N_A·N_B)``

    returned as exact integers ``{"ks_num": int, "at_value": int,
    "n_a": int, "n_b": int}`` (``at_value`` = the smallest value
    attaining the maximum — a deterministic tie rule the SQL window
    argmax reproduces).  The sketch-based drift check
    (``drift.ks_from_digests``) trades exactness for constant state;
    this is its exact companion at one-sort cost — same distribution
    shape as :func:`wasserstein_1d` (per-value count exchange, range
    sort, O(blocks) driver prefix carry, per-block vectorized max)."""
    def _counts(tab: pa.Table) -> pa.Table:
        a = pc.cast(pc.equal(tab[side_col], "a"), pa.int64())
        b = pc.cast(pc.equal(tab[side_col], "b"), pa.int64())
        return agg_named(
            pa.table({"qv": tab[value_col], "na": a, "nb": b}),
            ["qv"], [("na", "sum"), ("nb", "sum")], ["na", "nb"])

    per_value = bucketed_map_groups(
        ds.select_columns([value_col, side_col]).map_batches(
            _counts, batch_format="pyarrow"),
        ["qv"],
        lambda t: agg_named(t, ["qv"], [("na", "sum"), ("nb", "sum")],
                            ["na", "nb"]),
        buckets=buckets, sort_within=False)

    s = per_value.sort("qv").materialize()
    refs = s.to_arrow_refs()
    stats = ray.get([_emd_block_stats.remote(r) for r in refs])
    total_a = sum(st.get("sum_a", 0) for st in stats)
    total_b = sum(st.get("sum_b", 0) for st in stats)
    folds = []
    cum_a = cum_b = 0
    for r, st in zip(refs, stats):
        folds.append(_ks_block_fold.remote(r, cum_a, cum_b,
                                           total_a, total_b))
        cum_a += st.get("sum_a", 0)
        cum_b += st.get("sum_b", 0)
    best_num, best_at = 0, None
    for num, at in ray.get(folds):
        if at is None:
            continue
        if num > best_num or (num == best_num and
                              (best_at is None or at < best_at)):
            best_num, best_at = num, at
    return {"ks_num": best_num, "at_value": best_at,
            "n_a": total_a, "n_b": total_b}


@ray.remote(num_cpus=1)
def _emdm_block_stats(tab: pa.Table, k: int) -> dict:
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    if tab.num_rows == 0:
        return {"n": 0}
    g = tab["g"].to_numpy(zero_copy_only=False)
    c = tab["c"].to_numpy(zero_copy_only=False)
    sums = np.zeros(k, dtype=np.int64)
    np.add.at(sums, g, c)
    return {"n": tab.num_rows, "sums": sums.tolist(),
            "first_qv": int(tab["qv"][0].as_py())}


@ray.remote(num_cpus=1)
def _emdm_block_fold(tab: pa.Table, k: int, cum: list,
                     totals: list, next_qv: int | None) -> list:
    """All-pairs W1 contributions of one block: per distinct value,
    per-group cumulative counts advance, and every ordered pair (i<j)
    accumulates |cum_i·N_j − cum_j·N_i| · gap.  Python-int exact;
    returns a flat k*k list of decimal strings."""
    from ..plan import limit_arrow_threads
    limit_arrow_threads()
    acc = [[0] * k for _ in range(k)]
    if tab.num_rows == 0:
        return [str(x) for row in acc for x in row]
    qv = tab["qv"].to_numpy(zero_copy_only=False)
    g = tab["g"].to_numpy(zero_copy_only=False)
    c = tab["c"].to_numpy(zero_copy_only=False)
    # group rows by distinct qv (sorted): segment boundaries
    new = np.ones(len(qv), dtype=bool)
    new[1:] = qv[1:] != qv[:-1]
    starts = np.flatnonzero(new)
    cumv = [int(x) for x in cum]
    for si, s in enumerate(starts):
        e = starts[si + 1] if si + 1 < len(starts) else len(qv)
        for r in range(s, e):
            cumv[g[r]] += int(c[r])
        nxt = int(qv[e]) if e < len(qv) else next_qv
        if nxt is None:
            continue
        gap = nxt - int(qv[s])
        for i in range(k):
            for j in range(i + 1, k):
                acc[i][j] += abs(cumv[i] * totals[j]
                                 - cumv[j] * totals[i]) * gap
    return [str(x) for row in acc for x in row]


def wasserstein_matrix(
    ds: "rd.Dataset", value_col: str, group_col: str, *,
    buckets: int | None = None,
) -> pa.Table:
    """Pairwise EXACT 1-D Wasserstein distances between EVERY group's
    value distribution in ONE sort (the k-way generalization of
    :func:`wasserstein_1d` — the distribution-drift matrix a
    validation engine reports per segment): output ``(g_a, g_b,
    w1_num, n_a, n_b)`` for each unordered pair, ``w1 = w1_num /
    (n_a·n_b)``.

    Distribution: one exchange builds per-(value, group) counts, one
    range sort over distinct values, per-block stats carry O(blocks·k)
    integers on the driver, and each block folds its own all-pairs
    gap terms (O(distinct·k²) exact-int work, the k-way price)."""
    def _counts(tab: pa.Table) -> pa.Table:
        return agg_named(
            pa.table({"qv": tab[value_col], "grp": tab[group_col],
                      "__one": np.ones(tab.num_rows, np.int64)}),
            ["qv", "grp"], [("__one", "sum")], ["c"])

    per_value = bucketed_map_groups(
        ds.select_columns([value_col, group_col]).map_batches(
            _counts, batch_format="pyarrow"),
        ["qv", "grp"],
        lambda t: agg_named(t, ["qv", "grp"], [("c", "sum")], ["c"]),
        buckets=buckets, sort_within=False).materialize()

    groups = sorted({g for t in ray.get(
        per_value.map_batches(
            lambda tb: pa.table({"g": pc.unique(tb["grp"])})
            if tb.num_rows else pa.table(
                {"g": pa.array([], pa.string())}),
            batch_format="pyarrow").to_arrow_refs())
        for g in (t["g"].to_pylist() if t.num_rows else [])})
    k = len(groups)
    garr = pa.array(groups, pa.string())

    coded = per_value.map_batches(
        lambda t: pa.table({
            "qv": t["qv"],
            "g": pc.cast(pc.index_in(t["grp"], value_set=garr),
                         pa.int64()),
            "c": t["c"]}),
        batch_format="pyarrow")
    s = coded.sort("qv").materialize()
    refs = s.to_arrow_refs()
    stats = ray.get([_emdm_block_stats.remote(r, k) for r in refs])
    totals = [0] * k
    for st in stats:
        if st["n"]:
            for i, v in enumerate(st["sums"]):
                totals[i] += v
    firsts = [st.get("first_qv") for st in stats]
    folds = []
    cum = [0] * k
    for i, (r, st) in enumerate(zip(refs, stats)):
        nxt = None
        for j in range(i + 1, len(stats)):
            if stats[j]["n"]:
                nxt = firsts[j]
                break
        folds.append(_emdm_block_fold.remote(r, k, list(cum),
                                             totals, nxt))
        if st["n"]:
            for x, v in enumerate(st["sums"]):
                cum[x] += v
    acc = [[0] * k for _ in range(k)]
    for flat in ray.get(folds):
        for i in range(k):
            for j in range(k):
                acc[i][j] += int(flat[i * k + j])
    out_a, out_b, out_w, out_na, out_nb = [], [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            out_a.append(groups[i])
            out_b.append(groups[j])
            out_w.append(acc[i][j])
            out_na.append(totals[i])
            out_nb.append(totals[j])
    return pa.table({"g_a": pa.array(out_a, pa.string()),
                     "g_b": pa.array(out_b, pa.string()),
                     "w1_num": pa.array(out_w, pa.int64()),
                     "n_a": pa.array(out_na, pa.int64()),
                     "n_b": pa.array(out_nb, pa.int64())})


def group_decision_stump(
    ds: "rd.Dataset", group_col: str, value_col: str,
    label_col: str, *, quant: int = 1_000_000,
    buckets: int | None = None,
) -> "rd.Dataset":
    """Per-GROUP best binary split: :func:`decision_stump`'s
    minimum-impurity threshold computed independently for every value
    of ``group_col`` in one exchange — per-segment feature binning
    (e.g. one calibrated alert threshold per event type).  Groups
    with fewer than 2 distinct values emit nothing.  Output:
    ``(group, threshold, score_q, n_left, n_right)`` with the same
    quantized-score / smaller-threshold tie contract.

    Distribution: per-(group, value) class counts pre-aggregate per
    batch; ONE exchange on the group key sees each group complete,
    and the candidate scan is segment-reset vectorized (prefix sums,
    one lexsort argmin per segment) — no per-group Python."""
    from ..functions import round_half_away

    def _counts(tab: pa.Table) -> pa.Table:
        lab = pc.cast(tab[label_col], pa.int64())
        return agg_named(
            pa.table({"grp": tab[group_col], "qv": tab[value_col],
                      "pos": lab, "neg": pc.subtract(1, lab)}),
            ["grp", "qv"], [("pos", "sum"), ("neg", "sum")],
            ["pos", "neg"])

    counted = ds.select_columns(
        [group_col, value_col, label_col]).map_batches(
        _counts, batch_format="pyarrow")

    def _best(tab: pa.Table) -> pa.Table:
        empty = pa.table({
            "group": pa.array([], pa.string()),
            "threshold": pa.array([], pa.int64()),
            "score_q": pa.array([], pa.int64()),
            "n_left": pa.array([], pa.int64()),
            "n_right": pa.array([], pa.int64())})
        if tab.num_rows == 0:
            return empty
        tab = agg_named(tab, ["grp", "qv"],
                        [("pos", "sum"), ("neg", "sum")],
                        ["pos", "neg"])
        tab = tab.sort_by([("grp", "ascending"), ("qv", "ascending")])
        new = segment_starts(tab, ["grp"])
        seg = np.cumsum(new) - 1
        firsts = np.flatnonzero(new)
        sizes = np.diff(np.append(firsts, tab.num_rows))
        qv = tab["qv"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = tab["pos"].combine_chunks().to_numpy(
            zero_copy_only=False)
        neg = tab["neg"].combine_chunks().to_numpy(
            zero_copy_only=False)
        cp = np.cumsum(pos)
        cn = np.cumsum(neg)
        base_p = np.concatenate([[0], cp])[np.repeat(firsts, sizes)]
        base_n = np.concatenate([[0], cn])[np.repeat(firsts, sizes)]
        p = cp - base_p
        ng = cn - base_n
        lasts = firsts + sizes - 1
        tp = p[lasts][seg]
        tn = ng[lasts][seg]
        # candidates: all rows except each segment's last
        cand = np.ones(tab.num_rows, dtype=bool)
        cand[lasts] = False
        if not cand.any():
            return empty

        def _xlx(c):
            c = c.astype(np.float64)
            return np.where(c > 0,
                            c * np.log(np.maximum(c, 1)), 0.0)

        rp = tp - p
        rn = tn - ng
        score = (_xlx(p + ng) - _xlx(p) - _xlx(ng)
                 + _xlx(rp + rn) - _xlx(rp) - _xlx(rn))
        sq = round_half_away(score * quant, 0).astype(np.int64)
        ci = np.flatnonzero(cand)
        order = np.lexsort((qv[ci], sq[ci], seg[ci]))
        oseg = seg[ci][order]
        first_of_seg = np.concatenate([[True], oseg[1:] != oseg[:-1]])
        win = ci[order][first_of_seg]
        return pa.table({
            "group": pc.cast(tab["grp"], pa.string()).take(
                pa.array(win)),
            "threshold": pa.array(qv[win]),
            "score_q": pa.array(sq[win]),
            "n_left": pa.array(p[win] + ng[win]),
            "n_right": pa.array((tp[win] - p[win])
                                + (tn[win] - ng[win]))})

    return bucketed_map_groups(counted, ["grp"], _best,
                               buckets=buckets, sort_within=False)
