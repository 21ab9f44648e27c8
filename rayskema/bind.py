"""Typed row projection — the columnar analogue of the reference's
``Bind[T]`` (``dsl/bind.go:12-33``): consume validated Arrow rows as
instances of a user dataclass, with the reference's key-resolution
priority (``reflect_utils.go:11-37``): explicit ``rayskema`` tag >
``json`` tag > field name; ``"-"`` disables the field.

This is a DRIVER-EDGE convenience for small results (verdict rows,
aggregates, violation samples) — per-row object construction is
inherently Python-speed, so the hot path stays columnar and only the
consumption edge binds.  ``iter_bound`` streams batches so a Dataset is
never materialized in full.

Tags live in dataclass field metadata::

    @dataclass
    class Verdict:
        conv: str = field(metadata={"rayskema": "conv_id"})
        n:    int = field(metadata={"json": "violation_count"})
        ok:   bool = True          # bound by field name

Missing columns: fields with a default keep it; fields without one
raise (the reference's required semantics at the typed edge).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Type, TypeVar

import pyarrow as pa

T = TypeVar("T")


def resolve_field_key(f: "dataclasses.Field") -> str:
    """Priority: rayskema tag > json tag > field name; '-' disables
    (reference ResolveStructKey, reflect_utils.go:11-37)."""
    tag = f.metadata.get("rayskema") if f.metadata else None
    if tag:
        return str(tag)
    jt = f.metadata.get("json") if f.metadata else None
    if jt:
        if jt == "-":
            return "-"
        name = str(jt).split(",", 1)[0]
        return name if name else f.name
    return f.name


def _binding(cls: Type[T], colnames: list[str]):
    """[(field, column-or-None)] plan; raises for a required field
    whose resolved column is absent."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"bind target must be a dataclass, got {cls!r}")
    plan = []
    for f in dataclasses.fields(cls):
        key = resolve_field_key(f)
        if key == "-":
            if (f.default is dataclasses.MISSING
                    and f.default_factory is dataclasses.MISSING):
                raise TypeError(
                    f"field {f.name!r} is disabled with tag '-' but has "
                    f"no default; give it a default (the reference "
                    f"zero-values disabled fields, reflect_utils.go:"
                    f"11-37 — Python dataclasses need an explicit one)")
            continue
        if key in colnames:
            plan.append((f.name, key))
        elif (f.default is not dataclasses.MISSING
              or f.default_factory is not dataclasses.MISSING):
            plan.append((f.name, None))  # keep the default
        else:
            raise KeyError(
                f"required field {f.name!r} (column {key!r}) absent "
                f"from columns {colnames}")
    return plan


def bind_table(tab: pa.Table, cls: Type[T]) -> list[T]:
    """One dataclass instance per row of ``tab``.  Columns not named by
    any field are ignored (strip semantics at the typed edge)."""
    plan = _binding(cls, tab.column_names)
    cols = {c: tab[c].to_pylist() for _, c in plan if c is not None}
    out: list[T] = []
    for i in range(tab.num_rows):
        kwargs: dict[str, Any] = {fn: cols[c][i]
                                  for fn, c in plan if c is not None}
        out.append(cls(**kwargs))
    return out


def iter_bound(ds, cls: Type[T], *, batch_size: int = 4096) -> Iterator[T]:
    """Stream a Dataset's rows as dataclass instances without
    materializing it: one bound batch at a time through
    ``iter_batches(batch_format="pyarrow")``."""
    for batch in ds.iter_batches(batch_size=batch_size,
                                 batch_format="pyarrow"):
        yield from bind_table(batch, cls)
