"""Real media codecs (functions/media.py) + their multimodal-stage wiring.

Every decoder is proven against ground truth by ROUND-TRIP: pixels /
samples we authored -> encode (real container bytes) -> decode -> exact
equality. Unknown containers must still take the documented fake path.
"""

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.functions import media


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- codecs


def test_bmp_roundtrip_odd_width():
    # odd widths exercise the 4-byte row padding
    for h, w in [(5, 7), (1, 1), (16, 16), (3, 2)]:
        img = _rgb(h, w, seed=h * 100 + w)
        buf = media.encode_bmp(img)
        assert media.sniff(buf) == "bmp"
        out = media.decode_bmp(buf)
        np.testing.assert_array_equal(out, img)


def test_bmp_top_down_variant():
    img = _rgb(4, 5, seed=3)
    buf = bytearray(media.encode_bmp(img))
    # flip the height sign -> top-down layout; re-flip pixel rows to match
    import struct
    h = struct.unpack_from("<i", buf, 14 + 8)[0]
    struct.pack_into("<i", buf, 14 + 8, -h)
    row_bytes = (5 * 3 + 3) & ~3
    off = 54
    rows = [bytes(buf[off + i * row_bytes: off + (i + 1) * row_bytes])
            for i in range(4)]
    buf[off:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(media.decode_bmp(bytes(buf)), img)


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        media.decode_bmp(b"BM" + b"\x00" * 10)  # truncated header
    img = _rgb(8, 8)
    buf = media.encode_bmp(img)
    with pytest.raises(ValueError):
        media.decode_bmp(buf[:-10])  # truncated pixels
    with pytest.raises(ValueError):
        media.decode_bmp(b"XX" + buf[2:])  # bad magic


def test_ppm_roundtrip_and_comments():
    img = _rgb(6, 4, seed=9)
    buf = media.encode_ppm(img)
    assert media.sniff(buf) == "ppm"
    np.testing.assert_array_equal(media.decode_ppm(buf), img)
    # header comments are legal netpbm
    commented = b"P6\n# made by a test\n4 6\n# maxval next\n255\n" + img.tobytes()
    np.testing.assert_array_equal(media.decode_ppm(commented), img)


def test_pgm_gray_replicates_channels():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    buf = b"P5\n4 3\n255\n" + gray.tobytes()
    assert media.sniff(buf) == "pgm"
    out = media.decode_ppm(buf)
    assert out.shape == (3, 4, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], gray)


def test_wav_roundtrip_mono16():
    samples = (np.sin(np.arange(2048) * 0.05) * 20000).astype(np.int16)
    buf = media.encode_wav(samples, sample_rate=8000)
    assert media.sniff(buf) == "wav"
    pcm, rate = media.decode_wav(buf)
    assert rate == 8000
    np.testing.assert_allclose(pcm, samples.astype(np.float32) / 32768.0)


def test_wav_stereo_mono_mix():
    import io
    import wave
    left = np.full(100, 1000, dtype=np.int16)
    right = np.full(100, 3000, dtype=np.int16)
    inter = np.empty(200, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(inter.tobytes())
    pcm, _ = media.decode_wav(out.getvalue())
    np.testing.assert_allclose(pcm, np.full(100, 2000.0 / 32768.0), rtol=1e-6)


def test_resize_nearest():
    img = _rgb(8, 8, seed=1)
    np.testing.assert_array_equal(media.resize_nearest(img, 8, 8), img)
    up = media.resize_nearest(img, 16, 16)
    # each source pixel becomes a 2x2 block under nearest-neighbor
    np.testing.assert_array_equal(up[::2, ::2], img)
    np.testing.assert_array_equal(up[1::2, 1::2], img)
    down = media.resize_nearest(img, 4, 4)
    np.testing.assert_array_equal(down, img[::2, ::2])


def test_sniff_unknown():
    assert media.sniff(b"not a container at all") is None
    assert media.sniff(b"BM") is None  # too short
    assert media.decode_image(b"random opaque bytes here") is None


# ------------------------------------------------- stage integration


def test_image_decode_stage_real_bmp(ray_session):
    import ray.data

    from donkey_ray.stages.multimodal import decode_images

    imgs = [_rgb(16, 16, seed=i) for i in range(4)]
    media_bytes = [media.encode_bmp(im) for im in imgs]
    media_bytes.append(b"opaque-not-an-image")  # fake-path row rides along
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "media": pa.array(media_bytes, pa.binary()),
    }))
    out = decode_images(ds, height=16, width=16, concurrency=(1, 2),
                        batch_size=2).take_all()
    got = {r["doc_id"]: np.asarray(r["pixels"], dtype=np.uint8).reshape(16, 16, 3)
           for r in out}
    for i in range(4):  # REAL decode: exact source pixels, no resize needed
        np.testing.assert_array_equal(got[i], imgs[i])
    assert got[4].shape == (16, 16, 3)  # fake path still produces layout


def test_image_decode_stage_real_resize(ray_session):
    import ray.data

    from donkey_ray.stages.multimodal import decode_images

    img = _rgb(32, 32, seed=7)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "media": pa.array([media.encode_ppm(img)], pa.binary()),
    }))
    out = decode_images(ds, height=16, width=16).take_all()
    px = np.asarray(out[0]["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    np.testing.assert_array_equal(px, media.resize_nearest(img, 16, 16))


def test_audio_frame_sample_real_wav(ray_session):
    import ray.data

    from donkey_ray.stages.multimodal import AudioFrameSampleStage

    samples = (np.arange(1024, dtype=np.int64) % 4096 - 2048).astype(np.int16)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "media": pa.array([media.encode_wav(samples)], pa.binary()),
    }))
    out = ds.map_batches(AudioFrameSampleStage, batch_format="pyarrow",
                         concurrency=1).take_all()
    # frame 0 must be the REAL first 256 samples of the WAV payload
    first = [r for r in out if r["frame_idx"] == 0][0]
    np.testing.assert_allclose(
        np.asarray(first["samples"], dtype=np.float32),
        samples[:256].astype(np.float32) / 32768.0)


def test_audio_fingerprint_real_wav_distinguishes(ray_session):
    import ray.data

    from donkey_ray.stages.multimodal import audio_fingerprints

    rng = np.random.default_rng(5)
    a = media.encode_wav((rng.normal(0, 8000, 4096)).astype(np.int16))
    b = media.encode_wav((rng.normal(0, 8000, 4096)).astype(np.int16))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "media": pa.array([a, a, b], pa.binary()),
    }))
    rows = sorted(audio_fingerprints(ds).take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["fp"] == rows[1]["fp"]       # identical audio -> same fp
    assert rows[0]["fp"] != rows[2]["fp"]       # different audio -> differs
    assert rows[0]["n_windows"] == 4096 // 256


def test_sniffed_but_undecodable_bytes_fall_back(ray_session):
    """REGRESSION (review finding): bytes that merely START with a known
    container magic ('BM', 'P6', 'RIFF....WAVE') but are not decodable
    must take the deterministic-fake path, not crash the stage."""
    import pyarrow as pa

    from donkey_ray.stages.multimodal import (
        AudioFingerprintStage,
        ImageDecodeStage,
        _decode_pcm,
    )

    bad_bmp = b"BM" + bytes(60)
    bad_ppm = b"P6\n999 999\n255\n"        # header claims pixels it lacks
    bad_wav = b"RIFF1234WAVE" + bytes(32)

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media": pa.array([bad_bmp, bad_ppm], pa.binary()),
    })
    out = ImageDecodeStage(height=8, width=8)(batch)
    assert out.num_rows == 2  # fake RGB, no exception

    pcm = _decode_pcm(bad_wav)
    assert len(pcm) > 0  # fake PCM, no wave.Error

    fp_batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "media": pa.array([bad_wav], pa.binary()),
    })
    fp = AudioFingerprintStage()(fp_batch)
    assert fp.num_rows == 1
