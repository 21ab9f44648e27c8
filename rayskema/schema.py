"""Declarative table schema + constraint vocabulary.

The analogue of the reference's fluent DSL (goskema
``dsl/object_builder.go:29-210``): declare once, compile once
(``rayskema.plan.compile_plan``), evaluate many times over Arrow
batches.  A :class:`TableSchema` wraps a ``pyarrow.Schema`` with:

- per-column constraints (type, non-null, regex, enum, length/byte
  bounds, numeric range, timestamp format) — reference codes
  ``invalid_type/required/pattern/invalid_enum/too_*/overflow``
  (``dsl/primitives.go``, ``kubeopenapi/patterns.go:14-44``);
- per-column ``default`` (reference default application,
  ``dsl/object_builder.go:70-91``) and ``nullable``;
- an unknown-column policy Strict/Strip/Passthrough (reference
  ``types.go:3-10``, ``dsl/object_core.go:136-169``);
- table-scope rules: uniqueness over key columns (reference
  ``rules/rules.go:104-137`` + duplicate-key enforcement
  ``internal/engine/enforce.go:116-136``), referential integrity
  (context rules, ``examples/context_order_inventory``), conditional
  cross-column refinements (``rules/rules.go:14-76``,
  ``dsl/object_builder.go:129-135``), per-group (per-conversation)
  rules, and distribution-drift checks (beyond-reference, from the
  north rule).

Pure Python; picklable (constraints are declarative data, compiled
lazily inside each actor — reference analogue: ``Build()`` caches
sorted keys once, ``dsl/object_builder.go:178-201``).
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Mapping, Sequence

import pyarrow as pa


def _canon(obj):
    """Recursively canonicalize schema objects for hashing: dataclasses
    -> {type, sorted fields}, dicts sorted, tuples/lists -> lists,
    everything else -> str."""
    import dataclasses

    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {"__type__": type(obj).__name__,
                **{f.name: _canon(getattr(obj, f.name))
                   for f in dataclasses.fields(obj)}}
    if isinstance(obj, Mapping):
        return {str(k): _canon(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_canon(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


class Unknown(enum.Enum):
    """Unknown-column policy (reference types.go:3-10)."""

    STRICT = "strict"          # extra column in file => unknown_key violation
    STRIP = "strip"            # drop silently
    PASSTHROUGH = "passthrough"  # keep extras in canonical output


# ---------------------------------------------------------------------------
# Column-level constraints. Each is pure data; the plan compiler turns it
# into a vectorized pyarrow.compute kernel.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Constraint:
    rule: str = ""  # optional rule name stamped on violations


@dataclass(frozen=True)
class NonNull(Constraint):
    """Null in a non-nullable column => `required` (reference
    dsl/object_core.go:113-131 via Arrow validity bitmap)."""


@dataclass(frozen=True)
class Regex(Constraint):
    """Regex => `pattern` (reference kubeopenapi/patterns.go).
    Full-match by default; ``search=True`` uses unanchored search
    semantics (JSON Schema / Go ``MatchString`` — what the OpenAPI
    importer emits)."""

    pattern: str = ""
    search: bool = False


@dataclass(frozen=True)
class Enum(Constraint):
    """Value must be in the set => `invalid_enum` (reference errors.go:20)."""

    values: tuple = ()


@dataclass(frozen=True)
class LenBounds(Constraint):
    """UTF-8 character length bounds => too_short / too_long
    (reference dsl/array.go:137-158 for the string/array length family)."""

    min_len: int | None = None
    max_len: int | None = None


@dataclass(frozen=True)
class ByteBounds(Constraint):
    """Byte-size bounds — the per-cell DoS guard (reference MaxBytes,
    parse.go:155-167 / enforce.go:147-155) => too_short / truncated."""

    min_bytes: int | None = None
    max_bytes: int | None = None


@dataclass(frozen=True)
class Range(Constraint):
    """Numeric range => too_small / too_big (reference
    kubeopenapi minimum/maximum; dsl width checks)."""

    min: float | int | None = None
    max: float | int | None = None
    exclusive_min: bool = False
    exclusive_max: bool = False


@dataclass(frozen=True)
class TsFormat(Constraint):
    """String column must parse with strptime format => `invalid_format`
    (reference codec/rfc3339.go:27-37)."""

    format: str = "%Y-%m-%dT%H:%M:%S%z"


@dataclass(frozen=True)
class MapKeyRegex(Constraint):
    """All keys of a map column must full-match the pattern (reference
    patternProperties/propertyNames import, kubeopenapi/patterns.go:
    14-207; map key validation of MapAny) => `pattern` violation on any
    offending row.  ``search=True`` = unanchored (JSON Schema
    patternProperties semantics)."""

    pattern: str = ""
    search: bool = False


@dataclass(frozen=True)
class AnyOf(Constraint):
    """anyOf/oneOf branch matching with an ambiguity strategy
    (reference ``kubeopenapi/union_ambiguity.go:12-75`` +
    ``options.go:44-51``): count how many ``branches`` (compile_expr
    predicates over the column value) match each row.

    strategy="error" (oneOf): more than one match => ``union_ambiguous``,
    zero matches => ``no_match``.
    strategy="first_match" (anyOf): only zero matches => ``no_match``."""

    branches: tuple = ()           # tuple[Mapping] predicate exprs
    strategy: str = "error"


@dataclass(frozen=True)
class Contains(Constraint):
    """List-column contains/minContains/maxContains (reference
    ``kubeopenapi/contains.go:15-126``): count the elements of each
    row's list that match ``predicate`` (a ``plan.compile_expr``
    expression over the ELEMENT value, column name ``"_el"``); rows
    with fewer than ``min_contains`` matches emit ``too_short`` and
    rows with more than ``max_contains`` emit ``too_long`` at the
    column path, mirroring the reference's codes."""

    predicate: Mapping[str, Any] = dc_field(default_factory=dict)
    min_contains: int | None = None
    max_contains: int | None = None


@dataclass(frozen=True)
class ListUnique(Constraint):
    """List-column element uniqueness (reference x-kubernetes-list-type
    set/map import, ``kubeopenapi/list.go:19-136``): a row whose list
    holds duplicate elements (or duplicate composite keys of struct
    elements, ``keys``) emits ``duplicate_item``."""

    keys: tuple = ()               # () = whole element; else struct keys


@dataclass(frozen=True)
class StructField(Constraint):
    """Apply a constraint to a nested struct subfield (reference nested
    object validation, ``dsl/object_core.go`` child-issue path rebasing
    ``/field/...``): ``path`` names the chain of struct field names
    under the column; violations carry the JSON-Pointer path
    ``/<col>/<path...>``."""

    path: tuple = ()              # ("meta", "lang") under the column
    constraint: Constraint | None = None
    # subfield default (reference nested default application,
    # dsl/object_builder.go:70-91): when the wire struct type LACKS
    # this child, inject the constant and set PRESENCE_DEFAULT_APPLIED
    # on the subpath — preserve-mode encode restores it to absent.
    # Depth-1 paths only (plan._reconcile_struct).
    default: Any = None
    # skip rows whose PARENT struct is null (reference embedded
    # resource presence, kubeopenapi/embedded.go:22-26: "outer field
    # presence is governed by required; do nothing here") — without
    # this a NonNull subfield check would fire on every row where the
    # optional outer object is absent
    when_parent_valid: bool = False
    # subfield codec (the nested analogue of Column.codec — reference
    # kubeopenapi/plan.go:18-28 under nesting): "int_or_string"
    # decodes a string wire child to the declared float64 child during
    # struct reconciliation (non-numeric => invalid_format at
    # /<col>/<path>).  Depth-1 paths only, constraint may be None for
    # a codec-only entry.
    codec: str | None = None


@dataclass(frozen=True)
class Column:
    name: str
    dtype: pa.DataType
    nullable: bool = True
    default: Any = None           # applied when column absent from a file
    constraints: tuple = ()       # tuple[Constraint, ...]
    # column codec (reference Codec[A,B], api.go:40-51; rfc3339 codec
    # codec/rfc3339.go): wire representation <-> declared dtype.
    # "rfc3339": string on the wire <-> timestamp[us] declared; decode
    # applied during normalize (parse errors => invalid_format),
    # canonical re-encode via plan.encode_canonical (UTC RFC3339).
    codec: str | None = None

    def with_constraints(self, *cs: Constraint) -> "Column":
        return Column(self.name, self.dtype, self.nullable, self.default,
                      self.constraints + tuple(cs), self.codec)


# ---------------------------------------------------------------------------
# Table-scope rules.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UniqueRule:
    """No duplicate key tuples across the whole table (reference
    rules.UniqueBy, rules/rules.go:104-137; duplicate JSON keys
    reinterpreted as duplicate primary key per SURVEY §2.3 E2).
    Violations: code=duplicate_key, rule name as given."""

    columns: tuple
    rule: str = "unique_key"


@dataclass(frozen=True)
class RefIntegrityRule:
    """Every value of `column` must appear in a manifest key set
    (reference context rules / existence lookups, SURVEY §2.5 J2).
    Dangling => code=conflict. The manifest is broadcast via ray.put."""

    column: str
    rule: str = "ref_integrity"
    # cross-check declared group size (manifest n_turns) vs observed
    # distinct count (FIXTURES.md §3)
    check_counts: bool = True
    count_rule: str = "declared_turns"


@dataclass(frozen=True)
class GroupCountRule:
    """Per-group row-count bounds (reference AtLeastOne / min-maxItems,
    rules/rules.go:79-99) => aggregate_violation."""

    group_by: tuple
    min_count: int | None = 1
    max_count: int | None = None
    rule: str = "group_count"


@dataclass(frozen=True)
class ContiguousRule:
    """Within each group, `column` must be exactly 0..n-1 (gap-free,
    duplicate-free). Checked via per-group min/max/count aggregates —
    no map_groups needed. => aggregate_violation (gaps) / too_small
    (negative index)."""

    group_by: tuple
    column: str = "turn_idx"
    rule: str = "contiguous_index"


@dataclass(frozen=True)
class MonotonicRule:
    """Within each group ordered by `order_by`, `column` must be
    non-decreasing (ts regression => business_rule; reference typed
    rules dsl/typed_rules.go:56-91)."""

    group_by: tuple
    order_by: str = "turn_idx"
    column: str = "ts"
    rule: str = "ts_monotonic"


@dataclass(frozen=True)
class CrossFieldRule:
    """Row-local cross-column refinement (reference Refine,
    dsl/object_builder.go:129-135): a named, declarative predicate of
    the form  `when` (mask expr) => `expect` (mask expr) must hold.
    Expressions are declarative dicts compiled to pyarrow.compute masks
    (see plan.compile_expr). Failing rows => code (default
    business_rule)."""

    rule: str
    when: Mapping[str, Any] | None  # None = always
    expect: Mapping[str, Any]
    code: str = "business_rule"
    message: str = ""


@dataclass(frozen=True)
class UnionRule:
    """Discriminated union (reference ``dsl/union.go:17-52``,
    ``dsl/object_builder.go:144-175``): rows are routed by the value of
    ``discriminator`` to a per-variant constraint set; each variant maps
    column -> constraints evaluated ONLY on that variant's rows
    (vectorized masks, no row loop).  Null discriminator =>
    ``discriminator_missing``; value not in the variant map =>
    ``discriminator_unknown`` (codes from reference errors.go:23-25)."""

    discriminator: str = ""
    # mapping: discriminator value -> tuple[(column, Constraint), ...]
    variants: Mapping[str, tuple] = dc_field(default_factory=dict)
    rule: str = "union"


@dataclass(frozen=True)
class Normalizer:
    """Column normalization applied BEFORE checks (reference
    ``Normalizer[T]`` hook, api.go:108-110 / pipeline.go:6-11).
    Declarative kinds keep the plan picklable: utf8_trim, utf8_lower,
    utf8_upper, nfc (unicode NFC via pyarrow utf8_normalize)."""

    column: str = ""
    kind: str = "utf8_trim"


@dataclass(frozen=True)
class DriftRule:
    """Distribution drift vs a baseline profile (north-rule extension;
    no reference analogue — reference aggregates are exact in-memory,
    SURVEY §2.6 A6). Sketch-backed: role-frequency PSI and
    numeric-column KS from merged t-digests."""

    column: str
    kind: str = "psi"        # "psi" (categorical) | "ks" (numeric)
    threshold: float = 0.2
    rule: str = "drift"


TableRule = Any  # union of the rule dataclasses above


@dataclass(frozen=True)
class TableSchema:
    """The declared contract for one table."""

    columns: tuple                      # tuple[Column, ...]
    key_columns: tuple = ()             # identity of a row in violation output
    unknown: Unknown = Unknown.STRICT
    rules: tuple = ()                   # tuple[TableRule, ...]
    name: str = "table"
    normalizers: tuple = ()             # tuple[Normalizer, ...]

    def __post_init__(self) -> None:
        names = [c.name for c in self.columns]
        if len(set(names)) != len(names):
            raise ValueError("duplicate column names in schema")
        for k in self.key_columns:
            if k not in names:
                raise ValueError(f"key column {k!r} not declared")

    # -- helpers -----------------------------------------------------------
    def column(self, name: str) -> Column:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def arrow_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(c.name, c.dtype, nullable=c.nullable) for c in self.columns]
        )

    def key_fields(self) -> list[pa.Field]:
        return [pa.field(k, self.column(k).dtype, nullable=True)
                for k in self.key_columns]

    def schema_hash(self) -> str:
        """Stable hash of the declaration — stamped into checkpoint
        manifests so resume refuses to mix schema versions.  Uses a
        canonical (sorted-keys) dump so equal schemas hash equally even
        when nested dict key order differs (e.g. after a contract
        round-trip)."""
        payload = json.dumps(_canon(self), sort_keys=True,
                             separators=(",", ":")).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def rules_of(self, cls: type) -> list:
        return [r for r in self.rules if isinstance(r, cls)]


# ---------------------------------------------------------------------------
# The transcript contract (BASELINE.json input_hint / FIXTURES.md §1).
# ---------------------------------------------------------------------------

ROLE_ENUM = ("system", "user", "assistant", "tool")
CONV_ID_PATTERN = r"conv_[0-9]{8}"
TOOL_PATTERN = r"[a-z][a-z0-9_]{0,63}"
TEXT_MAX_BYTES = 4096


def transcript_schema(
    *,
    text_max_bytes: int = TEXT_MAX_BYTES,
    with_drift: bool = True,
) -> TableSchema:
    cols = (
        Column("conv_id", pa.string(), nullable=False,
               constraints=(NonNull(rule="conv_id_required"),
                            Regex(pattern=CONV_ID_PATTERN, rule="conv_id_format"))),
        Column("turn_idx", pa.int32(), nullable=False,
               constraints=(NonNull(rule="turn_idx_required"),
                            Range(min=0, rule="turn_idx_nonneg"))),
        Column("role", pa.string(), nullable=False,
               constraints=(NonNull(rule="role_required"),
                            Enum(values=ROLE_ENUM, rule="role_enum"))),
        Column("text", pa.string(), nullable=False,
               constraints=(NonNull(rule="text_required"),
                            ByteBounds(min_bytes=1, max_bytes=text_max_bytes,
                                       rule="text_bytes"))),
        Column("tool", pa.string(), nullable=True,
               constraints=(Regex(pattern=TOOL_PATTERN, rule="tool_format"),)),
        Column("ts", pa.timestamp("us"), nullable=False,
               constraints=(NonNull(rule="ts_required"),)),
    )
    rules: list[TableRule] = [
        UniqueRule(columns=("conv_id", "turn_idx"), rule="unique_turn"),
        RefIntegrityRule(column="conv_id", rule="conv_manifest"),
        ContiguousRule(group_by=("conv_id",), column="turn_idx",
                       rule="turn_idx_contiguous"),
        MonotonicRule(group_by=("conv_id",), order_by="turn_idx", column="ts",
                      rule="ts_monotonic"),
        # tool set <=> role=="tool" (FIXTURES.md corruption table)
        CrossFieldRule(rule="tool_iff_tool_role",
                       when={"op": "ne", "col": "role", "value": "tool"},
                       expect={"op": "is_null", "col": "tool"},
                       code="business_rule",
                       message="tool must be null unless role=='tool'"),
        CrossFieldRule(rule="tool_role_has_tool",
                       when={"op": "eq", "col": "role", "value": "tool"},
                       expect={"op": "not_null", "col": "tool"},
                       code="business_rule",
                       message="role=='tool' requires tool name"),
        # role-sequence structure: a conversation opens with a system
        # turn, and system turns appear nowhere else.  Stated row-local
        # (over turn_idx) so the checks stay batch-local and
        # salting-proof; turn_idx integrity itself is covered by the
        # contiguity + uniqueness rules above.
        CrossFieldRule(rule="role_seq_start",
                       when={"op": "eq", "col": "turn_idx", "value": 0},
                       expect={"op": "eq", "col": "role", "value": "system"},
                       code="business_rule",
                       message="turn 0 must be a system turn"),
        CrossFieldRule(rule="role_seq_only_first",
                       when={"op": "eq", "col": "role", "value": "system"},
                       expect={"op": "eq", "col": "turn_idx", "value": 0},
                       code="business_rule",
                       message="system role only allowed at turn 0"),
    ]
    if with_drift:
        rules.append(DriftRule(column="role", kind="psi", threshold=0.2,
                               rule="role_psi_drift"))
        rules.append(DriftRule(column="text_len", kind="ks", threshold=0.1,
                               rule="text_len_ks_drift"))
    return TableSchema(
        columns=cols,
        key_columns=("conv_id", "turn_idx"),
        unknown=Unknown.STRICT,
        rules=tuple(rules),
        name="transcripts",
    )
