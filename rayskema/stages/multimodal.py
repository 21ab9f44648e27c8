"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is real and tested; the actual codec work is STUBBED because
image/audio libraries are not available in this container:

- pass ``decoder=`` a callable to plug a real codec (PIL/ffmpeg/...);
- the default ``decoder=None`` raises ``NotImplementedError`` at actor
  construction, unless ``fake=True`` selects the deterministic fake
  decoder (payload bytes -> pseudo pixels) used by tests/benchmarks.

Scale notes: payloads are large, so these stages must run with SMALL
``batch_size`` (size by bytes: target_bytes // avg_payload) and an
actor pool (decoder/model state loaded once per actor in ``__init__``).
Outputs keep the key columns + derived features and DROP the payload
unless ``keep_payload=True`` — never carry 100 TB of pixels past the
stage that needed them.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd


def fake_decode(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Deterministic stand-in for an image decoder: bytes -> (h, w, 3)
    uint8 array derived from the payload bytes (stable across runs)."""
    h = int(meta.get("height", 8)) if meta else 8
    w = int(meta.get("width", 8)) if meta else 8
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * 3
    reps = -(-need // max(1, len(buf)))
    return np.tile(buf, reps)[:need].reshape(h, w, 3)


class DecodeStage:
    """Actor-pool stage: binary payload column -> decoded feature
    columns (shape + channel means).  ``__init__`` loads the decoder
    once per actor; ``__call__`` decodes one batch."""

    def __init__(self, payload_col: str, key_cols: list,
                 decoder: Callable | None = None, *, fake: bool = False,
                 keep_payload: bool = False):
        if decoder is None:
            if not fake:
                raise NotImplementedError(
                    "no image/audio codec in this environment; pass "
                    "decoder=... or fake=True")
            decoder = fake_decode
        self.decode = decoder
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.keep_payload = keep_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].combine_chunks()
        heights, widths, means = [], [], []
        for v in payloads:
            arr = self.decode(v.as_py() or b"")
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            means.append(arr.reshape(-1, arr.shape[-1]).mean(axis=0))
        out = {c: batch[c] for c in self.key_cols}
        if self.keep_payload:
            out[self.payload_col] = batch[self.payload_col]
        out["height"] = pa.array(heights, type=pa.int32())
        out["width"] = pa.array(widths, type=pa.int32())
        out["channel_mean"] = pa.array(
            [m.astype(np.float32) for m in means],
            type=pa.list_(pa.float32(), 3))
        return pa.table(out)


class ResizeStage:
    """Actor-pool stage signature for resize: decoded (or payload)
    column -> fixed-size thumbnail feature.  Stubbed: with the fake
    decoder it nearest-neighbor-samples the fake pixel array."""

    def __init__(self, payload_col: str, key_cols: list,
                 target: tuple = (4, 4),
                 decoder: Callable | None = None, *, fake: bool = False):
        if decoder is None:
            if not fake:
                raise NotImplementedError(
                    "no image codec in this environment; pass decoder= "
                    "or fake=True")
            decoder = fake_decode
        self.decode = decoder
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        thumbs = []
        for v in batch[self.payload_col].combine_chunks():
            arr = self.decode(v.as_py() or b"")
            ys = np.linspace(0, arr.shape[0] - 1, th).astype(int)
            xs = np.linspace(0, arr.shape[1] - 1, tw).astype(int)
            thumbs.append(arr[np.ix_(ys, xs)].ravel())
        out = {c: batch[c] for c in self.key_cols}
        out["thumb"] = pa.array([t.astype(np.uint8) for t in thumbs],
                                type=pa.list_(pa.uint8(), th * tw * 3))
        return pa.table(out)


class FrameSampleStage:
    """Video-style frame sampling signature: payload -> every Nth
    'frame' (stubbed as fixed-size byte windows) as separate rows
    (flat_map layout: one output row per sampled frame)."""

    def __init__(self, payload_col: str, key_cols: list,
                 frame_bytes: int = 64, stride: int = 4):
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import binary_buffers

        arr = batch[self.payload_col]
        offsets, mv, null_mask = binary_buffers(arr)
        lens = offsets[1:] - offsets[:-1]
        if null_mask is not None:     # null payloads sample zero frames
            lens = np.where(null_mask, 0, lens)
        fb, st = self.frame_bytes, self.stride
        n_frames = np.maximum(lens // fb, 1)
        n_samp = -(-n_frames // st)                 # ceil(n_frames/stride)
        # one take per key column over repeated row indices — no
        # per-row .as_py() round trip (the row-expansion indices and
        # frame windows are all computed vectorized; only the frame
        # byte copies remain per-row, which is the actual work)
        n_rows = len(offsets) - 1
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), n_samp)
        local = np.arange(len(row_ids), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_samp)[:-1]]), n_samp)
        fidx = local * st
        starts = offsets[:-1][row_ids] + fidx * fb
        # bound by the row's LOGICAL end (lens, not raw offsets — null
        # slots may span undefined bytes)
        ends = np.minimum(starts + fb, offsets[:-1][row_ids] + lens[row_ids])
        frames = [mv[s:e] for s, e in zip(starts, ends)]
        idx = pa.array(row_ids)
        out = {c: batch[c].take(idx) for c in self.key_cols}
        out["frame_idx"] = pa.array(fidx.astype(np.int32), type=pa.int32())
        out["frame"] = pa.array(frames, type=pa.binary())
        return pa.table(out)


def decode_features(
    ds: "rd.Dataset", payload_col: str, key_cols: list, *,
    decoder: Callable | None = None, fake: bool = False,
    batch_size: int = 64, concurrency=(1, 8),
) -> "rd.Dataset":
    """Run the decode stage as an actor pool with payload-aware batch
    sizing (small batches: payloads are big)."""
    return ds.map_batches(
        DecodeStage, fn_constructor_args=(payload_col, key_cols, decoder),
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
