"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is real and tested.  Codecs come in three tiers:

- **real, built-in**: uncompressed container formats decode with numpy
  and the stdlib alone — 24-bit BMP, binary PPM (P6) images, and PCM
  WAV audio (``decode_bmp`` / ``decode_ppm`` / ``decode_wav``, plus
  matching encoders for data synthesis).  ``decoder="auto"`` sniffs
  magic bytes and dispatches to these.
- **pluggable**: pass ``decoder=`` a callable to plug an external codec
  (PIL/ffmpeg/...) for compressed formats.
- **unavailable**: compressed codecs (JPEG/PNG/H.264/...) genuinely
  need external libraries absent from this container; ``"auto"``
  raises ``NotImplementedError`` naming the format, and the
  deterministic ``fake=True`` decoder remains for benchmarks that only
  exercise the Ray plumbing.

Scale notes: payloads are large, so these stages must run with SMALL
``batch_size`` (size by bytes: target_bytes // avg_payload) and an
actor pool (decoder/model state loaded once per actor in ``__init__``).
Outputs keep the key columns + derived features and DROP the payload
unless ``keep_payload=True`` — never carry 100 TB of pixels past the
stage that needed them.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd


# --------------------------------------------------------------------
# Real built-in codecs: formats decodable with numpy + stdlib only.
# --------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ASCII ints separated by whitespace; '#'
    # comments run to end-of-line and may appear between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = h * w * 3
    return np.frombuffer(payload, dtype=np.uint8, count=need,
                         offset=pos).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8.

    Handles bottom-up and top-down row order and 4-byte row padding;
    pixel bytes are stored BGR and returned RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    if h_raw > 0:  # positive height = bottom-up storage
        img = img[::-1]
    return img.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> uncompressed 24-bit bottom-up BMP bytes."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = np.ascontiguousarray(
        img[::-1, :, ::-1], dtype=np.uint8).reshape(h, w * 3)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n_samples, n_channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        samples = np.frombuffer(f.readframes(n), dtype="<i2")
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) int16 -> PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(
            samples, dtype="<i2").tobytes())
    return buf.getvalue()


_UNAVAILABLE_MAGIC = [
    (b"\xff\xd8\xff", "JPEG"), (b"\x89PNG", "PNG"),
    (b"GIF8", "GIF"), (b"\x00\x00\x00", "MP4/ISO-BMFF"),
    (b"\x1a\x45\xdf\xa3", "Matroska/WebM"), (b"OggS", "Ogg"),
]


def sniff_decode(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Magic-byte dispatch to the built-in codecs.  Images return
    (h, w, 3) uint8; WAV audio returns (n_samples, channels) int16.
    Compressed formats raise ``NotImplementedError`` naming the format
    (they need external codec libraries)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)[0]
    return sniff_decode_image(payload, meta)


def sniff_decode_image(payload: bytes,
                       meta: dict | None = None) -> np.ndarray:
    """Image-only magic-byte dispatch: always (h, w, 3) uint8.  The
    image stages (DecodeStage/ResizeStage) use this so an audio payload
    fails with a clear error instead of mis-shaping their fixed-size
    feature columns — WAV belongs to AudioStatsStage."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        raise TypeError(
            "WAV payload in an image stage; route audio columns "
            "through AudioStatsStage")
    for magic, name in _UNAVAILABLE_MAGIC:
        if payload[:len(magic)] == magic:
            raise NotImplementedError(
                f"{name} payloads need an external codec library "
                "(not in this container); pass decoder=...")
    raise ValueError(
        f"unrecognized payload magic {payload[:4]!r}; pass decoder=...")


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
                 decoder: Callable | str | None = "auto", *,
                 fake: bool = False, keep_payload: bool = False):
        if fake:
            decoder = fake_decode
        elif decoder == "auto":
            decoder = sniff_decode_image
        elif decoder is None:
            raise NotImplementedError(
                "pass decoder=..., decoder='auto' (built-in BMP/PPM "
                "codecs), or fake=True")
        self.decode = decoder
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.keep_payload = keep_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import binary_buffers

        offsets, mv, null_mask = binary_buffers(batch[self.payload_col])
        heights, widths, means = [], [], []
        for i in range(len(offsets) - 1):
            if null_mask is not None and null_mask[i]:
                heights.append(None)
                widths.append(None)
                means.append(None)
                continue
            arr = self.decode(bytes(mv[offsets[i]:offsets[i + 1]]))
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            means.append(arr.reshape(-1, arr.shape[-1]).mean(axis=0))
        out = {c: batch[c] for c in self.key_cols}
        if self.keep_payload:
            out[self.payload_col] = batch[self.payload_col]
        out["height"] = pa.array(heights, type=pa.int32())
        out["width"] = pa.array(widths, type=pa.int32())
        out["channel_mean"] = pa.array(
            [None if m is None else m.astype(np.float32) for m in means],
            type=pa.list_(pa.float32(), 3))
        return pa.table(out)


class ResizeStage:
    """Actor-pool stage: image payload column -> fixed-size thumbnail
    feature (nearest-neighbor sampling of the decoded pixel array)."""

    def __init__(self, payload_col: str, key_cols: list,
                 target: tuple = (4, 4),
                 decoder: Callable | str | None = "auto", *,
                 fake: bool = False):
        if fake:
            decoder = fake_decode
        elif decoder == "auto":
            decoder = sniff_decode_image
        elif decoder is None:
            raise NotImplementedError(
                "pass decoder=..., decoder='auto' (built-in BMP/PPM "
                "codecs), or fake=True")
        self.decode = decoder
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import binary_buffers

        th, tw = self.target
        offsets, mv, null_mask = binary_buffers(batch[self.payload_col])
        thumbs = []
        for i in range(len(offsets) - 1):
            if null_mask is not None and null_mask[i]:
                thumbs.append(None)
                continue
            arr = self.decode(bytes(mv[offsets[i]:offsets[i + 1]]))
            ys = np.linspace(0, arr.shape[0] - 1, th).astype(int)
            xs = np.linspace(0, arr.shape[1] - 1, tw).astype(int)
            thumbs.append(arr[np.ix_(ys, xs)].ravel().astype(np.uint8))
        out = {c: batch[c] for c in self.key_cols}
        out["thumb"] = pa.array(thumbs, type=pa.list_(pa.uint8(),
                                                      th * tw * 3))
        return pa.table(out)


class PatchifyStage:
    """Actor-pool stage: image payload column -> non-overlapping
    P×P patch rows (the ViT tokenizer prep).  Each decoded (H, W, 3)
    image yields (H//P)·(W//P) rows of ``(keys..., patch_idx,
    patch)`` where ``patch`` is the flattened P·P·3 uint8 vector and
    ``patch_idx`` scans row-major.  The image must tile exactly
    (H % P == W % P == 0) or the stage raises — silent cropping
    would corrupt training data.  Patch extraction is one
    reshape/transpose per image (no per-patch Python); decode is the
    per-payload cost, as in the other stages (decoder resolved once
    in ``__init__`` — the actor-pool contract)."""

    def __init__(self, payload_col: str, key_cols: list,
                 patch: int = 4,
                 decoder: Callable | str | None = "auto", *,
                 fake: bool = False):
        if fake:
            decoder = fake_decode
        elif decoder == "auto":
            decoder = sniff_decode_image
        elif decoder is None:
            raise NotImplementedError(
                "pass decoder=..., decoder='auto' (built-in BMP/PPM "
                "codecs), or fake=True")
        if patch <= 0:
            raise ValueError("patch must be positive")
        self.decode = decoder
        self.payload_col = payload_col
        self.key_cols = list(key_cols)
        self.patch = int(patch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import binary_buffers

        p = self.patch
        offsets, mv, null_mask = binary_buffers(batch[self.payload_col])
        img_rows: list[int] = []
        img_counts: list[int] = []
        patch_idx: list[np.ndarray] = []
        patches: list[np.ndarray] = []
        for i in range(len(offsets) - 1):
            if null_mask is not None and null_mask[i]:
                continue
            arr = self.decode(bytes(mv[offsets[i]:offsets[i + 1]]))
            h, w = arr.shape[0], arr.shape[1]
            if h % p or w % p:
                raise ValueError(
                    f"image ({h}x{w}) does not tile into {p}x{p} "
                    "patches; resize upstream")
            grid = arr.reshape(h // p, p, w // p, p, 3) \
                .transpose(0, 2, 1, 3, 4).reshape(-1, p * p * 3)
            img_rows.append(i)
            img_counts.append(grid.shape[0])
            patch_idx.append(np.arange(grid.shape[0], dtype=np.int64))
            patches.append(grid.astype(np.uint8))
        if patches:
            flat = np.concatenate(patches)
            pidx = np.concatenate(patch_idx)
        else:
            flat = np.zeros((0, p * p * 3), dtype=np.uint8)
            pidx = np.zeros(0, dtype=np.int64)
        take = pa.array(np.repeat(
            np.array(img_rows, dtype=np.int64),
            np.array(img_counts, dtype=np.int64)))
        out = {c: batch[c].take(take) for c in self.key_cols}
        out["patch_idx"] = pa.array(pidx)
        # zero-copy fixed-size-list build from the flat buffer — one
        # Python object per patch (pa.array over a list of row views)
        # would dominate large images
        out["patch"] = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1)), p * p * 3)
        return pa.table(out)


class AudioStatsStage:
    """Actor-pool stage: PCM WAV payload column -> audio feature
    columns (sample rate, length, channel count, duration, RMS
    amplitude).  Decodes with the built-in stdlib WAV codec; pass
    ``decoder=`` a ``payload -> (samples (n, ch) int16, rate)``
    callable for compressed audio formats."""

    def __init__(self, payload_col: str, key_cols: list,
                 decoder: Callable | None = None):
        self.decode = decoder or decode_wav
        self.payload_col = payload_col
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import binary_buffers

        offsets, mv, null_mask = binary_buffers(batch[self.payload_col])
        rates, counts, chans, durs, rms = [], [], [], [], []
        for i in range(len(offsets) - 1):
            if null_mask is not None and null_mask[i]:
                for col in (rates, counts, chans, durs, rms):
                    col.append(None)
                continue
            samples, rate = self.decode(
                bytes(mv[offsets[i]:offsets[i + 1]]))
            rates.append(rate)
            counts.append(samples.shape[0])
            chans.append(samples.shape[1])
            durs.append(samples.shape[0] / rate if rate else 0.0)
            rms.append(float(np.sqrt(np.mean(
                samples.astype(np.float64) ** 2))) if samples.size
                else 0.0)
        out = {c: batch[c] for c in self.key_cols}
        out["sample_rate"] = pa.array(rates, type=pa.int32())
        out["n_samples"] = pa.array(counts, type=pa.int64())
        out["n_channels"] = pa.array(chans, type=pa.int32())
        out["duration_s"] = pa.array(durs, type=pa.float64())
        out["rms"] = pa.array(rms, type=pa.float64())
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
    decoder: Callable | str | None = "auto", fake: bool = False,
    batch_size: int = 64, concurrency=(1, 8),
) -> "rd.Dataset":
    """Run the decode stage as an actor pool with payload-aware batch
    sizing (small batches: payloads are big)."""
    return ds.map_batches(
        DecodeStage, fn_constructor_args=(payload_col, key_cols, decoder),
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
