"""Built-in multimodal codecs: BMP / PPM / WAV round-trips and the
decode / resize / audio-stats stages driven over REAL codec bytes
(no fake decoder), including through a Ray actor pool."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayskema.stages.multimodal import (
    AudioStatsStage, DecodeStage, ResizeStage, decode_bmp, decode_ppm,
    decode_wav, decode_features, encode_bmp, encode_ppm, encode_wav,
    sniff_decode,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# codec round-trips
# ---------------------------------------------------------------------------

def test_ppm_roundtrip():
    img = _img(5, 7)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_comment_header():
    img = _img(2, 3)
    payload = encode_ppm(img)
    # inject a comment line between tokens — legal PPM
    payload = b"P6\n# a comment\n3 2\n255\n" + payload.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(payload), img)


@pytest.mark.parametrize("w", [4, 5, 6, 7])  # covers all row paddings
def test_bmp_roundtrip(w):
    img = _img(3, w, seed=w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    rng = np.random.default_rng(1)
    samples = rng.integers(-2 ** 15, 2 ** 15, size=(100, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_sniff_dispatch():
    img = _img(4, 4)
    assert np.array_equal(sniff_decode(encode_bmp(img)), img)
    assert np.array_equal(sniff_decode(encode_ppm(img)), img)
    wav = encode_wav(np.zeros((10, 1), dtype=np.int16), 8000)
    assert sniff_decode(wav).shape == (10, 1)


# ---------------------------------------------------------------------------
# stages over real codec bytes
# ---------------------------------------------------------------------------

def test_decode_stage_real_bmp_and_ppm():
    imgs = [_img(6, 4, seed=1), _img(3, 5, seed=2)]
    tab = pa.table({
        "id": [1, 2, 3],
        "payload": pa.array(
            [encode_bmp(imgs[0]), encode_ppm(imgs[1]), None],
            type=pa.binary()),
    })
    out = DecodeStage("payload", ["id"])(tab)
    assert out["height"].to_pylist() == [6, 3, None]
    assert out["width"].to_pylist() == [4, 5, None]
    means = out["channel_mean"].to_pylist()
    for got, img in zip(means, imgs):
        np.testing.assert_allclose(
            got, img.reshape(-1, 3).mean(axis=0), rtol=1e-5)
    assert means[2] is None


def test_resize_stage_real():
    img = _img(16, 16, seed=3)
    tab = pa.table({"id": [1], "payload": [encode_bmp(img)]})
    out = ResizeStage("payload", ["id"], target=(4, 4))(tab)
    thumb = np.array(out["thumb"].to_pylist()[0], dtype=np.uint8)
    ys = np.linspace(0, 15, 4).astype(int)
    assert np.array_equal(thumb, img[np.ix_(ys, ys)].ravel())


def test_audio_stats_stage():
    t = np.arange(16000, dtype=np.float64) / 16000
    sine = (np.sin(2 * np.pi * 440 * t) * 10000).astype(np.int16)
    tab = pa.table({
        "id": [1, 2],
        "payload": pa.array(
            [encode_wav(sine[:, None], 16000), None], type=pa.binary()),
    })
    out = AudioStatsStage("payload", ["id"])(tab)
    assert out["sample_rate"].to_pylist() == [16000, None]
    assert out["n_samples"].to_pylist() == [16000, None]
    assert out["n_channels"].to_pylist() == [1, None]
    assert out["duration_s"].to_pylist()[0] == pytest.approx(1.0)
    # RMS of a 10000-amplitude sine is amplitude/sqrt(2)
    assert out["rms"].to_pylist()[0] == pytest.approx(
        10000 / np.sqrt(2), rel=0.01)


def test_decode_features_auto_through_ray(ray_session):
    imgs = {i: _img(8, 8, seed=i) for i in range(6)}
    ds = rd.from_arrow(pa.table({
        "id": list(imgs),
        "payload": [encode_bmp(v) if i % 2 else encode_ppm(v)
                    for i, v in imgs.items()],
    }))
    out = decode_features(ds, "payload", ["id"],
                          concurrency=(1, 2)).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["height"].tolist() == [8] * 6
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(out["channel_mean"][i]),
            imgs[i].reshape(-1, 3).mean(axis=0), rtol=1e-5)


def test_patchify_stage():
    """Row-major P x P patches tile exactly; a non-tiling image
    raises; nulls are skipped."""
    import numpy as np
    import pyarrow as pa

    from rayskema.stages.multimodal import PatchifyStage, encode_bmp

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    stage = PatchifyStage("payload", ["id"], patch=4)
    batch = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([encode_bmp(img), None], type=pa.binary())})
    out = stage(batch)
    assert out["id"].to_pylist() == [1, 1, 1, 1]
    assert out["patch_idx"].to_pylist() == [0, 1, 2, 3]
    # patch 0 = rows 0..3 x cols 0..3; verify against numpy slicing
    p0 = np.asarray(out["patch"].combine_chunks().flatten())[:48]
    assert (p0 == img[:4, :4, :].ravel()).all()
    # patch 3 = rows 4..7 x cols 4..7
    p3 = np.asarray(out["patch"].combine_chunks().flatten())[144:]
    assert (p3 == img[4:, 4:, :].ravel()).all()

    odd = np.zeros((6, 8, 3), dtype=np.uint8)
    bad = pa.table({"id": pa.array([1], type=pa.int64()),
                    "payload": pa.array([encode_bmp(odd)],
                                        type=pa.binary())})
    try:
        stage(bad)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "tile" in str(e)
