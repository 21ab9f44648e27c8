"""Contract evolution / compatibility checking — the schema-registry
question a validation engine gets asked before every contract rollout:
*can I apply the NEW contract to the corpus validated under the OLD one
without manufacturing violations, and will data produced under the new
contract still satisfy consumers pinned to the old?*

Definitions are data-centric (the registry BACKWARD / FORWARD notions
with "reader" = contract):

- **backward_ok**: every table valid under the OLD contract is valid
  under the NEW one (safe to roll the new contract onto the existing
  corpus — no re-validation storm).
- **forward_ok**: every table valid under the NEW contract is valid
  under the OLD one (consumers still enforcing the old contract accept
  new data).

Each structural difference becomes one :class:`Change` row with both
flags; :func:`compatibility` folds them into ``full | backward |
forward | none``.  Classification is CONSERVATIVE: a constraint change
the checker cannot reason about (a regex rewrite, a refine hook)
clears both flags rather than guessing.

Reference analogue: goskema has no evolution checker — this extends
the contract surface (contract.go / kubeopenapi import) with the
compatibility semantics published by schema registries (Avro/Protobuf
resolution rules): type promotion lattices, enum set containment,
bound-interval containment, required-column addition/removal.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from .schema import (AnyOf, ByteBounds, Column, Contains, Enum,
                     LenBounds, ListUnique, MapKeyRegex, NonNull, Range,
                     Regex, StructField, TableSchema, TsFormat, Unknown)

__all__ = ["Change", "diff_schemas", "compatibility", "changes_table"]


@dataclass(frozen=True)
class Change:
    path: str           # column name, or "<table>" for table-scope
    change: str         # kind slug (column_added, type_changed, ...)
    detail: str
    backward_ok: bool   # old-valid data still valid under new
    forward_ok: bool    # new-valid data still valid under old


# -- type promotion lattice (Avro-style resolution, Arrow types) ----------

_INT_RANK = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
_UINT_RANK = {pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32,
              pa.uint64(): 64}


def _widens(old: pa.DataType, new: pa.DataType) -> bool:
    """True iff every value of ``old`` is exactly representable in
    ``new`` (so data valid at ``old`` re-types losslessly)."""
    if old.equals(new):
        return True
    if old in _INT_RANK and new in _INT_RANK:
        return _INT_RANK[old] < _INT_RANK[new]
    if old in _UINT_RANK and new in _UINT_RANK:
        return _UINT_RANK[old] < _UINT_RANK[new]
    # unsigned fits in a STRICTLY wider signed
    if old in _UINT_RANK and new in _INT_RANK:
        return _UINT_RANK[old] < _INT_RANK[new]
    # ints fit exactly in floats with a wider mantissa
    if old in _INT_RANK or old in _UINT_RANK:
        bits = _INT_RANK.get(old) or _UINT_RANK[old]
        if new.equals(pa.float32()):
            return bits <= 16       # 24-bit mantissa
        if new.equals(pa.float64()):
            return bits <= 32       # 53-bit mantissa
    if old.equals(pa.float32()) and new.equals(pa.float64()):
        return True
    if old.equals(pa.string()) and new.equals(pa.large_string()):
        return True
    if old.equals(pa.binary()) and new.equals(pa.large_binary()):
        return True
    if pa.types.is_decimal(old) and pa.types.is_decimal(new):
        return (new.scale >= old.scale
                and (new.precision - new.scale
                     >= old.precision - old.scale))
    return False


# -- bound-interval containment -------------------------------------------

def _interval(lo, hi, lo_excl=False, hi_excl=False):
    return (lo, lo_excl, hi, hi_excl)


def _contains(outer, inner) -> bool:
    """outer ⊇ inner for (lo, lo_excl, hi, hi_excl) with None = ∞."""
    olo, olx, ohi, ohx = outer
    ilo, ilx, ihi, ihx = inner
    if olo is not None:
        if ilo is None or ilo < olo or (ilo == olo and olx and not ilx):
            return False
    if ohi is not None:
        if ihi is None or ihi > ohi or (ihi == ohi and ohx and not ihx):
            return False
    return True


def _bounds_of(c) -> tuple:
    if isinstance(c, Range):
        return _interval(c.min, c.max, c.exclusive_min, c.exclusive_max)
    if isinstance(c, LenBounds):
        return _interval(c.min_len, c.max_len)
    if isinstance(c, ByteBounds):
        return _interval(c.min_bytes, c.max_bytes)
    raise TypeError(type(c))


_BOUND_KINDS = (Range, LenBounds, ByteBounds)
_OPAQUE_KINDS = (Regex, TsFormat, MapKeyRegex, AnyOf, Contains,
                 ListUnique, StructField)
# looseness rank of the unknown-column policy
_UNKNOWN_RANK = {Unknown.STRICT: 0, Unknown.STRIP: 1,
                 Unknown.PASSTHROUGH: 2}


def _constraint_changes(col: str, old: Column, new: Column) -> list[Change]:
    out: list[Change] = []

    def by_kind(c_list, kind):
        return [c for c in c_list if type(c) is kind]

    # NonNull as an explicit constraint (in addition to nullability)
    old_nn = bool(by_kind(old.constraints, NonNull)) or not old.nullable
    new_nn = bool(by_kind(new.constraints, NonNull)) or not new.nullable
    if old_nn != new_nn:
        if new_nn:
            out.append(Change(col, "nullability_tightened",
                              "nullable -> required", False, True))
        else:
            out.append(Change(col, "nullability_loosened",
                              "required -> nullable", True, False))

    # enum set containment
    old_e = by_kind(old.constraints, Enum)
    new_e = by_kind(new.constraints, Enum)
    if old_e or new_e:
        os_ = set(old_e[0].values) if old_e else None
        ns_ = set(new_e[0].values) if new_e else None
        if os_ != ns_:
            # None = unconstrained = the universe
            back = ns_ is None or (os_ is not None and os_ <= ns_)
            fwd = os_ is None or (ns_ is not None and ns_ <= os_)
            out.append(Change(
                col, "enum_changed",
                f"{sorted(os_) if os_ is not None else 'any'} -> "
                f"{sorted(ns_) if ns_ is not None else 'any'}",
                back, fwd))

    # bound intervals: new ⊇ old => backward ok; new ⊆ old => forward ok
    for kind in _BOUND_KINDS:
        old_b = by_kind(old.constraints, kind)
        new_b = by_kind(new.constraints, kind)
        if not old_b and not new_b:
            continue
        full = _interval(None, None)
        oi = _bounds_of(old_b[0]) if old_b else full
        ni = _bounds_of(new_b[0]) if new_b else full
        if oi != ni:
            out.append(Change(
                col, f"{kind.__name__.lower()}_changed",
                f"{oi} -> {ni}",
                _contains(ni, oi), _contains(oi, ni)))

    # opaque constraints: equality or conservative incompatibility
    for kind in _OPAQUE_KINDS:
        old_k, new_k = by_kind(old.constraints, kind), \
            by_kind(new.constraints, kind)
        if old_k == new_k:
            continue
        added = [c for c in new_k if c not in old_k]
        removed = [c for c in old_k if c not in new_k]
        out.append(Change(
            col, f"{kind.__name__.lower()}_changed",
            f"+{len(added)}/-{len(removed)}",
            not added,        # new checks old data never saw
            not removed))     # old checks new data no longer meets

    # any constraint kind this checker does not model: set inequality
    # is conservatively incompatible both ways (never silently
    # "full") — future constraint classes are safe by default
    handled = (NonNull, Enum) + _BOUND_KINDS + _OPAQUE_KINDS
    old_rest = [c for c in old.constraints
                if not isinstance(c, handled)]
    new_rest = [c for c in new.constraints
                if not isinstance(c, handled)]
    if old_rest != new_rest:
        kinds = sorted({type(c).__name__
                        for c in old_rest + new_rest})
        out.append(Change(col, "constraint_changed",
                          f"unmodeled kinds {kinds}", False, False))

    if old.codec != new.codec:
        out.append(Change(col, "codec_changed",
                          f"{old.codec} -> {new.codec}", False, False))
    if old.default != new.default:
        out.append(Change(col, "default_changed",
                          f"{old.default!r} -> {new.default!r}",
                          True, True))
    return out


def diff_schemas(old: TableSchema, new: TableSchema) -> list[Change]:
    """All structural differences between two contracts, each
    classified backward/forward (see module docstring).  An empty list
    means the contracts are equivalent for validation purposes."""
    out: list[Change] = []
    old_cols = {c.name: c for c in old.columns}
    new_cols = {c.name: c for c in new.columns}

    for name, nc in new_cols.items():
        if name not in old_cols:
            required = not nc.nullable and nc.default is None
            out.append(Change(
                name, "column_added",
                "required, no default" if required else
                ("with default" if nc.default is not None
                 else "nullable"),
                # old data lacks the column: a default fills it, a
                # nullable column reads as null — only a required
                # no-default add breaks the corpus
                not required,
                # old contract: extra column is its unknown-policy call
                old.unknown is not Unknown.STRICT))
    for name, oc in old_cols.items():
        if name not in new_cols:
            out.append(Change(
                name, "column_removed", "",
                new.unknown is not Unknown.STRICT,
                oc.nullable or oc.default is not None))

    for name in old_cols.keys() & new_cols.keys():
        oc, nc = old_cols[name], new_cols[name]
        if not oc.dtype.equals(nc.dtype):
            out.append(Change(
                name, "type_changed", f"{oc.dtype} -> {nc.dtype}",
                _widens(oc.dtype, nc.dtype),
                _widens(nc.dtype, oc.dtype)))
        out.extend(_constraint_changes(name, oc, nc))

    if tuple(old.key_columns) != tuple(new.key_columns):
        out.append(Change(
            "<table>", "key_columns_changed",
            f"{list(old.key_columns)} -> {list(new.key_columns)}",
            False, False))
    if old.unknown is not new.unknown:
        tightened = _UNKNOWN_RANK[new.unknown] < _UNKNOWN_RANK[old.unknown]
        out.append(Change(
            "<table>", "unknown_policy_changed",
            f"{old.unknown.value} -> {new.unknown.value}",
            not tightened, tightened))
    if tuple(old.normalizers) != tuple(new.normalizers):
        # a normalizer rewrites data before validation: a different
        # canonical form can flip validity in either direction
        out.append(Change("<table>", "normalizers_changed",
                          f"{len(old.normalizers)} -> "
                          f"{len(new.normalizers)}", False, False))
    old_rules, new_rules = set(old.rules), set(new.rules)
    for r in sorted(new_rules - old_rules, key=repr):
        out.append(Change("<table>", "rule_added", repr(r), False, True))
    for r in sorted(old_rules - new_rules, key=repr):
        out.append(Change("<table>", "rule_removed", repr(r), True, False))
    return out


def compatibility(changes: list[Change]) -> str:
    """Fold a change list into the registry verdict:
    ``full`` (both directions), ``backward``, ``forward`` or
    ``none``."""
    back = all(c.backward_ok for c in changes)
    fwd = all(c.forward_ok for c in changes)
    return ("full" if back and fwd else
            "backward" if back else
            "forward" if fwd else "none")


def changes_table(changes: list[Change]) -> pa.Table:
    """Change list as an Arrow table (for sinks / CLI reporting)."""
    return pa.table({
        "path": pa.array([c.path for c in changes], pa.string()),
        "change": pa.array([c.change for c in changes], pa.string()),
        "detail": pa.array([c.detail for c in changes], pa.string()),
        "backward_ok": pa.array([c.backward_ok for c in changes]),
        "forward_ok": pa.array([c.forward_ok for c in changes])})
