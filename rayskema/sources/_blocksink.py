"""Shared per-block file sink — the ONE implementation of the
atomic-publish / idempotent-naming contract used by ``write_ipc``,
``write_orc`` and the snapshot layout:

- one file per non-empty block, streamed through a ``Datasink`` with
  backpressure (the dataset is never materialized whole);
- names carry a deterministic ORDINAL (``task_idx`` + within-task
  block index) plus the content hash: a retried block task rewrites
  the SAME file (idempotent), while byte-identical but DISTINCT
  blocks keep distinct ordinals — a pure content-addressed name would
  collapse them and silently lose rows;
- files are written to a ``.tmp-<uuid>`` sibling and ``os.replace``d
  (atomic publish — readers never observe partial files);
- an optional ``token`` namespaces one WRITE ATTEMPT: two writes of
  identical data into the same directory otherwise produce identical
  names (same ordinals, same content hash), which makes it unsafe to
  delete "this write's files" on failure — the token keeps attempts
  disjoint while staying stable across task retries (it is chosen
  once on the driver and captured by the closure).
"""

from __future__ import annotations

import hashlib
import os
import uuid
from typing import Callable

import pyarrow as pa

import ray.data as rd


def write_block_files(
    ds: "rd.Dataset", out_dir: str, *,
    encode: Callable[[pa.Table], "pa.Buffer"],
    ext: str, prefix: str = "block", token: str | None = None,
    entry: Callable[[pa.Table, str, "pa.Buffer"], object] | None = None,
) -> list:
    """Write one ``encode``d file per non-empty block of ``ds`` under
    ``out_dir``; returns the per-file results (``entry(tab, relname,
    buf)`` when given, else the bare file names)."""
    os.makedirs(out_dir, exist_ok=True)

    from ray.data import Datasink
    from ray.data.block import BlockAccessor

    tok = f"-{token}" if token else ""

    class _Sink(Datasink):
        def __init__(self):
            self.results: list = []

        def write(self, blocks, ctx) -> list:
            out = []
            for j, block in enumerate(blocks):
                tab = BlockAccessor.for_block(block).to_arrow()
                if tab.num_rows == 0:
                    continue
                buf = encode(tab)
                name = (f"{prefix}-{ctx.task_idx:06d}-{j:04d}-"
                        f"{hashlib.md5(buf).hexdigest()[:16]}"
                        f"{tok}.{ext}")
                path = os.path.join(out_dir, name)
                tmp = path + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "wb") as f:
                    f.write(buf)
                os.replace(tmp, path)      # atomic publish
                out.append(entry(tab, name, buf)
                           if entry is not None else name)
            return out

        def on_write_complete(self, write_result) -> None:
            for part in write_result.write_returns:
                self.results.extend(part)

    sink = _Sink()
    ds.write_datasink(sink)
    return sink.results
