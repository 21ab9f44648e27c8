"""Contract inference: propose a :class:`TableSchema` from observed
data — the authoring direction of a validation engine (the reference
ships hand-written DSL contracts, e.g. ``examples/user/main.go``;
inference bootstraps that declaration from a sample of the real table
so the tightest contract the data satisfies becomes the starting
point a human then relaxes).

Two pruned scans, both with tiny exchanges:

1. :func:`profile_columns` (one scan + one bounded (col, value) hash
   exchange) supplies row/null counts, EXACT distinct cardinality and
   min/max per column.  Temporal columns are pre-cast to int64 epoch
   units in a zero-copy ``map_batches`` so their min/max ride the
   numeric path (lexicographic strings of timestamps are
   format-dependent; epoch integers are not).
2. One scan of the STRING columns only emits per-block length
   min/max partials plus, for enum candidates (global distinct
   ``<= enum_max``, known from pass 1), the per-block distinct
   values — per block that is at most ``n_distinct <= enum_max``
   rows per candidate column, so the driver-side merge is
   O(blocks x (cols + enum_max)), never row count.

The proposed contract is the TIGHTEST one the observed data passes:
``NonNull`` where no null was seen, ``Enum`` for low-cardinality
strings, ``Range`` over observed numeric min/max, ``LenBounds`` over
observed UTF-8 lengths.  By construction ``ConstraintPlan(infer_contract(ds)).validate``
emits zero violations on the data it was inferred from (asserted in
``tests/test_infer.py``); unseen future values that fall outside the
observed envelope surface as violations, which is the point — the
caller widens what should legitimately vary.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..plan import limit_arrow_threads
from ..schema import (
    Column, Enum, LenBounds, NonNull, Range, TableSchema, Unknown,
)
from .profile import profile_columns

_FACT_COLS = ["col", "n", "n_null", "n_distinct", "min_num", "max_num",
              "min_len", "max_len", "enum_values"]


def _is_string(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _is_temporal(t: pa.DataType) -> bool:
    return (pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t))


def _empty_len_partial() -> pa.Table:
    return pa.table({
        "col": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "min_len": pa.array([], type=pa.int64()),
        "max_len": pa.array([], type=pa.int64()),
    })


def infer_facts(
    ds: "rd.Dataset", columns: Sequence[str] | None = None, *,
    enum_max: int = 16, buckets: int | None = None,
) -> pa.Table:
    """Observed per-column facts, one row per column (see
    :func:`_facts_and_dtypes` for the scan shape)."""
    return _facts_and_dtypes(ds, columns, enum_max=enum_max,
                             buckets=buckets)[0]


def _facts_and_dtypes(
    ds: "rd.Dataset", columns: Sequence[str] | None = None, *,
    enum_max: int = 16, buckets: int | None = None,
) -> tuple[pa.Table, dict]:
    """Observed per-column facts, one row per column sorted by name:
    ``(col, n, n_null, n_distinct, min_num, max_num, min_len,
    max_len, enum_values)``.

    - numeric columns fill ``min_num``/``max_num`` (temporal columns
      as int64 epoch units of their storage unit — e.g. microseconds
      for ``timestamp[us]``);
    - string columns fill ``min_len``/``max_len`` (UTF-8 codepoint
      length over non-null cells) and, when their exact distinct
      cardinality is ``<= enum_max``, ``enum_values`` = the sorted
      distinct values joined with ``,``;
    - ``n_distinct`` is exact and excludes nulls (SQL
      ``count(DISTINCT col)``).
    """
    arrow_schema = ds.schema().base_schema
    names = list(columns) if columns is not None else \
        list(arrow_schema.names)
    dtypes = {n: arrow_schema.field(n).type for n in names}
    temporal = [n for n in names if _is_temporal(dtypes[n])]

    proj = ds.select_columns(names)
    if temporal:
        def _epoch_cast(tab: pa.Table) -> pa.Table:
            # zero-copy reinterpret: temporal min/max must not depend
            # on str() formatting, so profile them as epoch integers
            for c in temporal:
                i = tab.column_names.index(c)
                tab = tab.set_column(
                    i, c, pc.cast(tab[c], pa.int64()))
            return tab

        proj = proj.map_batches(_epoch_cast, batch_format="pyarrow")

    prof = profile_columns(proj, names, buckets=buckets)
    n_distinct = dict(zip(prof["col"].to_pylist(),
                          prof["n_distinct"].to_pylist()))

    str_cols = [n for n in names if _is_string(dtypes[n])]
    cand = [c for c in str_cols if n_distinct.get(c, 0) <= enum_max]
    len_stats: dict[str, tuple[int | None, int | None]] = {}
    enum_vals: dict[str, list[str]] = {}
    if str_cols:
        def _len_partials(tab: pa.Table) -> pa.Table:
            limit_arrow_threads()
            parts = []
            for c in str_cols:
                ln = pc.utf8_length(tab[c])
                mm = pc.min_max(ln)
                parts.append(pa.table({
                    "col": pa.array([c], type=pa.string()),
                    "kind": pa.array(["l"]),
                    "v": pa.array([None], type=pa.string()),
                    "min_len": pa.array([mm["min"].as_py()],
                                        type=pa.int64()),
                    "max_len": pa.array([mm["max"].as_py()],
                                        type=pa.int64()),
                }))
                if c in cand:
                    u = pc.unique(tab[c].combine_chunks())
                    u = u.filter(pc.is_valid(u))
                    k = len(u)
                    parts.append(pa.table({
                        "col": pa.array(np.full(k, c), type=pa.string()),
                        "kind": pa.array(np.full(k, "v"),
                                         type=pa.string()),
                        "v": pc.cast(u, pa.string()),
                        "min_len": pa.nulls(k, type=pa.int64()),
                        "max_len": pa.nulls(k, type=pa.int64()),
                    }))
            return pa.concat_tables(parts) if parts else \
                _empty_len_partial()

        tabs = [t for t in ray.get(
            ds.select_columns(str_cols).map_batches(
                _len_partials, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows and "kind" in t.column_names]
        if tabs:
            both = pa.concat_tables(tabs)
            is_l = pc.equal(both["kind"], "l")
            lt = both.filter(is_l)
            for c in str_cols:
                sel = lt.filter(pc.equal(lt["col"], c))
                mn = pc.min(sel["min_len"]).as_py()
                mx = pc.max(sel["max_len"]).as_py()
                len_stats[c] = (mn, mx)
            vt = both.filter(pc.invert(is_l))
            for c in cand:
                vals = sorted(set(
                    vt.filter(pc.equal(vt["col"], c))["v"].to_pylist()))
                # enum_values is a ","-joined encoding (SQL-oracle
                # friendly); a value containing "," or an empty value
                # set would not round-trip — drop the enum proposal
                # for such columns (LenBounds still applies)
                if vals and not any("," in v for v in vals):
                    enum_vals[c] = vals

    # assemble one row per column in the profile's (sorted) order
    cols_sorted = prof["col"].to_pylist()
    return pa.table({
        "col": prof["col"],
        "n": prof["n"],
        "n_null": prof["n_null"],
        "n_distinct": prof["n_distinct"],
        "min_num": prof["min_num"],
        "max_num": prof["max_num"],
        "min_len": pa.array(
            [len_stats.get(c, (None, None))[0] for c in cols_sorted],
            type=pa.int64()),
        "max_len": pa.array(
            [len_stats.get(c, (None, None))[1] for c in cols_sorted],
            type=pa.int64()),
        "enum_values": pa.array(
            [",".join(enum_vals[c]) if c in enum_vals else None
             for c in cols_sorted], type=pa.string()),
    }).select(_FACT_COLS), dtypes


def contract_from_facts(
    facts: pa.Table, dtypes: dict[str, pa.DataType], *,
    key_columns: Sequence[str] = (), name: str = "inferred",
    unknown: Unknown = Unknown.STRIP,
) -> TableSchema:
    """Build the tightest :class:`TableSchema` the observed facts
    satisfy.  Column order follows the facts table (sorted by name);
    temporal/nested columns get presence constraints only (their
    envelope is format-dependent)."""
    cols = []
    for row in facts.to_pylist():
        c = row["col"]
        dt = dtypes[c]
        constraints = []
        no_nulls = row["n"] > 0 and row["n_null"] == 0
        if no_nulls:
            constraints.append(NonNull(rule=f"{c}_required"))
        if row["enum_values"] is not None:
            # "" is NOT falsy-none here: it is the joined encoding of
            # the one-value set {""} (empty sets are never stored, so
            # "".split(",") == [""] decodes it exactly; an Enum(())
            # would compile to a null-typed is_in and crash validation)
            constraints.append(Enum(
                rule=f"{c}_enum",
                values=tuple(row["enum_values"].split(","))))
        elif _is_string(dt) and row["min_len"] is not None:
            constraints.append(LenBounds(
                rule=f"{c}_len", min_len=row["min_len"],
                max_len=row["max_len"]))
        elif (not _is_temporal(dt) and row["min_num"] is not None
              and (pa.types.is_integer(dt) or pa.types.is_floating(dt)
                   or pa.types.is_decimal(dt))):
            mn, mx = row["min_num"], row["max_num"]
            if pa.types.is_integer(dt):
                # the facts carry bounds as float64; beyond 2^53 the
                # cast may have rounded INWARD past the true extreme,
                # and a Range tighter than the data flags the very rows
                # it was inferred from — widen one ulp out there (exact
                # below 2^53) and clamp to int64
                import math
                lo, hi = float(mn), float(mx)
                if abs(lo) >= 2.0 ** 53:
                    lo = math.nextafter(lo, -math.inf)
                if abs(hi) >= 2.0 ** 53:
                    hi = math.nextafter(hi, math.inf)
                mn = max(int(lo), -(2 ** 63))
                mx = min(int(hi), 2 ** 63 - 1)
            constraints.append(Range(rule=f"{c}_range", min=mn, max=mx))
        cols.append(Column(c, dt, nullable=not no_nulls,
                           constraints=tuple(constraints)))
    return TableSchema(columns=tuple(cols),
                       key_columns=tuple(key_columns),
                       unknown=unknown, name=name)


def infer_contract(
    ds: "rd.Dataset", *, columns: Sequence[str] | None = None,
    key_columns: Sequence[str] = (), enum_max: int = 16,
    name: str = "inferred", unknown: Unknown = Unknown.STRIP,
    buckets: int | None = None,
) -> TableSchema:
    """One-call inference: scan ``ds`` and propose the tightest
    contract it satisfies (see module docstring for the exact
    constraint families emitted)."""
    facts, dtypes = _facts_and_dtypes(ds, columns, enum_max=enum_max,
                                      buckets=buckets)
    return contract_from_facts(facts, dtypes, key_columns=key_columns,
                               name=name, unknown=unknown)


# ---------------------------------------------------------------------------
# Approximate functional-dependency mining
# ---------------------------------------------------------------------------

def mine_fds(
    ds: "rd.Dataset", cols: Sequence[str], *,
    min_conf: float = 0.99, buckets: int | None = None,
) -> pa.Table:
    """Mine approximate functional dependencies A → B over every
    ordered pair of ``cols`` (the TANE/G3 error measure): the minimum
    number of rows that must be removed for the dependency to hold
    exactly is

        ``viol(A→B) = Σ_a ( |rows with A=a| − max_b |rows with A=a,
        B=b| )``

    and the FD is reported as holding when
    ``viol ≤ (1 − min_conf) · N`` (compared in EXACT integer
    cross-multiplication — no float thresholds).  Null is a value
    (SQL ``GROUP BY`` semantics).  Output (driver-side, O(pairs)
    rows): ``(lhs, rhs, violations, n_rows, holds)``.

    Distribution: values are cast to strings once and every pair's
    ``(a, b)`` counts pre-aggregate per batch, so ONE exchange keyed
    on ``(pair, a)`` sees each A-group complete (max-per-group is not
    sum-decomposable — it must fold inside the gather, the same
    completeness argument as connected_components' group minima);
    each bucket emits one integer partial per pair and the driver
    folds O(buckets · pairs) scalars."""
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        segment_starts)

    cols = list(cols)
    pairs = [(a, b) for a in cols for b in cols if a != b]

    def _pair_counts(tab: pa.Table) -> pa.Table:
        strs = {c: pc.fill_null(
            pc.cast(tab[c], pa.string()), "\x00null") for c in cols}
        parts = []
        for pid, (a, b) in enumerate(pairs):
            parts.append(agg_named(
                pa.table({"pid": pa.array(
                    np.full(tab.num_rows, pid, np.int64)),
                    "a": strs[a], "b": strs[b],
                    "__one": np.ones(tab.num_rows, np.int64)}),
                ["pid", "a", "b"], [("__one", "sum")], ["n"]))
        return pa.concat_tables(parts)

    counted = ds.select_columns(cols).map_batches(
        _pair_counts, batch_format="pyarrow")

    def _viol(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"pid": pa.array([], pa.int64()),
                             "viol": pa.array([], pa.int64())})
        # sum (pid, a, b) partials from different batches first, then
        # per (pid, a): violations = group total - max b count
        tab = agg_named(tab, ["pid", "a", "b"], [("n", "sum")], ["n"])
        tab = tab.sort_by([("pid", "ascending"), ("a", "ascending"),
                           ("b", "ascending")])
        seg = np.cumsum(segment_starts(tab, ["pid", "a"])) - 1
        n = tab["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pid = tab["pid"].combine_chunks().to_numpy(
            zero_copy_only=False)
        n_seg = int(seg[-1]) + 1
        tot = np.zeros(n_seg, np.int64)
        mx = np.zeros(n_seg, np.int64)
        np.add.at(tot, seg, n)
        np.maximum.at(mx, seg, n)
        first = np.concatenate([[True], seg[1:] != seg[:-1]])
        return pa.table({"pid": pa.array(pid[first]),
                         "viol": pa.array(tot - mx)})

    viol_ds = bucketed_map_groups(counted, ["pid", "a"], _viol,
                                  buckets=buckets, sort_within=False)
    viol = np.zeros(len(pairs), np.int64)
    for t in ray.get(viol_ds.to_arrow_refs()):
        if t.num_rows == 0:
            continue
        for p, v in zip(t["pid"].to_pylist(), t["viol"].to_pylist()):
            viol[p] += v

    n_rows = ds.count()
    # holds <=> viol * 10^k <= (10^k - conf_scaled) * n, exact ints
    conf_num = int(round(min_conf * 1_000_000))
    holds = [int(v) * 1_000_000 <= (1_000_000 - conf_num) * n_rows
             for v in viol]
    return pa.table({
        "lhs": pa.array([a for a, _ in pairs], pa.string()),
        "rhs": pa.array([b for _, b in pairs], pa.string()),
        "violations": pa.array(viol),
        "n_rows": pa.array(np.full(len(pairs), n_rows, np.int64)),
        "holds": pa.array(holds)})
