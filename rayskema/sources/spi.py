"""Pluggable source-driver SPI (reference ``JSONDriver`` /
``SetJSONDriver``, source.go:62-112).

The reference lets callers swap the tokenizer that turns raw input
into its engine's token stream.  The Ray-Data analogue of "the thing
that turns raw files into the engine's substrate" is the reader that
produces a ``ray.data.Dataset`` of Arrow blocks — so the SPI here is a
per-format registry of ``paths -> Dataset`` readers.  The ingest seams
(:func:`~rayskema.sources.jsonl.read_jsonl` / ``read_csv`` /
``read_parquet_source``) resolve their reader through this registry,
so a deployment can swap in a different engine (a custom
``Datasource``, a decompressing reader, a schema-inferring variant)
without touching pipeline code — the reconcile + validate stages are
driver-agnostic, exactly like the reference's parse-then-validate
split.

Thread-safety matches the reference (a mutex around the global):
drivers are process-global; swaps are expected at startup, not
mid-pipeline.  Worker processes never consult the registry — the
resolved reader builds the Dataset on the driver, and only Arrow
blocks ship to workers.
"""
from __future__ import annotations

import threading
from typing import Callable, Iterator

import ray.data as rd

__all__ = ["register_source_driver", "get_source_driver",
           "use_default_source_driver", "source_driver_names"]

_lock = threading.RLock()


def _default_json(paths, **kw) -> "rd.Dataset":
    return rd.read_json(paths, **kw)


def _default_csv(paths, **kw) -> "rd.Dataset":
    return rd.read_csv(paths, **kw)


def _default_parquet(paths, **kw) -> "rd.Dataset":
    return rd.read_parquet(paths, **kw)


def _default_ipc(paths, **kw) -> "rd.Dataset":
    from rayskema.sources.ipc import read_ipc
    return read_ipc(paths, **kw)


def _default_orc(paths, **kw) -> "rd.Dataset":
    from rayskema.sources.orc import read_orc
    return read_orc(paths, **kw)


_DEFAULTS: dict[str, Callable[..., "rd.Dataset"]] = {
    "json": _default_json,
    "csv": _default_csv,
    "parquet": _default_parquet,
    "ipc": _default_ipc,
    "orc": _default_orc,
}
_drivers: dict[str, Callable[..., "rd.Dataset"]] = dict(_DEFAULTS)
_DEFAULT_NAMES: dict[str, str] = {
    f: ("ray.data" if f in ("json", "csv", "parquet") else "rayskema")
    for f in _DEFAULTS}
_names: dict[str, str] = dict(_DEFAULT_NAMES)


def register_source_driver(fmt: str, reader: Callable[..., "rd.Dataset"],
                           *, name: str | None = None) -> None:
    """Replace (or add) the reader for ``fmt`` — reference
    ``SetJSONDriver`` (source.go:73-81).  ``reader(paths, **kwargs)``
    must return a ``ray.data.Dataset``.  ``None`` readers are ignored,
    matching the reference's nil-guard."""
    if reader is None:
        return
    with _lock:
        _drivers[fmt] = reader
        _names[fmt] = name or getattr(reader, "__name__", "custom")


def get_source_driver(fmt: str) -> Callable[..., "rd.Dataset"]:
    """Resolve the current reader for ``fmt``; raises ``KeyError`` for
    a format nothing registered."""
    with _lock:
        return _drivers[fmt]


def use_default_source_driver(fmt: str | None = None) -> None:
    """Restore the built-in ray.data reader(s) — reference
    ``UseDefaultJSONDriver`` (source.go:83-88).  ``None`` restores
    every format and drops custom-only formats."""
    with _lock:
        if fmt is None:
            _drivers.clear()
            _drivers.update(_DEFAULTS)
            _names.clear()
            _names.update(_DEFAULT_NAMES)
        elif fmt in _DEFAULTS:
            _drivers[fmt] = _DEFAULTS[fmt]
            _names[fmt] = _DEFAULT_NAMES[fmt]
        else:
            _drivers.pop(fmt, None)
            _names.pop(fmt, None)


def source_driver_names() -> dict[str, str]:
    """Current ``format -> driver name`` view (reference
    ``JSONDriver.Name()``) for diagnostics."""
    with _lock:
        return dict(_names)
