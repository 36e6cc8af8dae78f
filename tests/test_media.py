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


# ------------------------------------------------------------- PNG


def _png_manual(pix2d, filters, color, channels):
    """Forward-filter a (h, w*channels) uint8 raster with the given
    per-row filter choices and wrap it in PNG chunks — an independent
    re-implementation of the wire format so decode_png is proven against
    the spec, not against encode_png."""
    import struct
    import zlib

    h, stride = pix2d.shape
    w = stride // channels
    rows = []
    prev = np.zeros(stride, np.int64)
    for y, f in enumerate(filters):
        r = pix2d[y].astype(np.int64)
        if f == 0:
            fl = r
        elif f == 1:  # Sub
            fl = r.copy()
            fl[channels:] = (r[channels:] - r[:-channels]) % 256
        elif f == 2:  # Up
            fl = (r - prev) % 256
        elif f == 3:  # Average
            fl = np.empty(stride, np.int64)
            for x in range(stride):
                left = int(r[x - channels]) if x >= channels else 0
                fl[x] = (r[x] - (left + int(prev[x])) // 2) % 256
        else:  # Paeth
            fl = np.empty(stride, np.int64)
            for x in range(stride):
                a = int(r[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                fl[x] = (r[x] - pred) % 256
        rows.append(bytes([f]) + bytes(fl.astype(np.uint8)))
        prev = r

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (media._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_png_roundtrip():
    for h, w in [(1, 1), (5, 7), (16, 16), (3, 2)]:
        img = _rgb(h, w, seed=h * 31 + w)
        buf = media.encode_png(img)
        assert media.sniff(buf) == "png"
        np.testing.assert_array_equal(media.decode_png(buf), img)
        np.testing.assert_array_equal(media.decode_image(buf), img)


def test_png_all_filters_rgb_and_gray():
    rng = np.random.default_rng(11)
    # 5 rows, one per filter type, proven against the independent
    # forward-filter in _png_manual
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    buf = _png_manual(rgb.reshape(5, 18), [0, 1, 2, 3, 4], color=2,
                      channels=3)
    np.testing.assert_array_equal(media.decode_png(buf), rgb)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    buf = _png_manual(gray, [4, 3, 2, 1, 0], color=0, channels=1)
    np.testing.assert_array_equal(
        media.decode_png(buf), np.repeat(gray[:, :, None], 3, axis=2))


def test_png_alpha_color_types():
    rng = np.random.default_rng(12)
    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    buf = _png_manual(rgba.reshape(4, 12), [0, 1, 2, 4], color=6,
                      channels=4)
    np.testing.assert_array_equal(media.decode_png(buf), rgba[:, :, :3])
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    buf = _png_manual(ga.reshape(3, 8), [0, 2, 1], color=4, channels=2)
    np.testing.assert_array_equal(
        media.decode_png(buf), np.repeat(ga[:, :, :1], 3, axis=2))


def test_png_multi_idat_and_ancillary_chunks():
    import struct
    import zlib

    img = _rgb(6, 5, seed=21)
    raw = np.zeros((6, 1 + 15), np.uint8)
    raw[:, 1:] = img.reshape(6, 15)
    z = zlib.compress(raw.tobytes())

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
    mid = len(z) // 2
    buf = (media._PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"tEXt", b"Comment\x00ancillary chunks are skipped")
           + chunk(b"IDAT", z[:mid]) + chunk(b"IDAT", z[mid:])
           + chunk(b"IEND", b""))
    np.testing.assert_array_equal(media.decode_png(buf), img)


def test_png_rejects_unsupported_and_truncated():
    img = _rgb(4, 4, seed=5)
    buf = media.encode_png(img)
    with pytest.raises(ValueError):
        media.decode_png(b"\x89PNX" + buf[4:])  # bad signature
    with pytest.raises(ValueError):
        media.decode_png(buf[:20])  # missing IHDR/IDAT
    # 16-bit depth and interlace are out of scope -> clean ValueError
    import struct

    bad_depth = bytearray(buf)
    bad_depth[8 + 8 + 8] = 16  # IHDR depth byte
    with pytest.raises(ValueError):
        media.decode_png(bytes(bad_depth))
    bad_il = bytearray(buf)
    bad_il[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError):
        media.decode_png(bytes(bad_il))
    # truncated scanline stream
    raw = np.zeros((4, 13), np.uint8)
    import zlib

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    short = zlib.compress(raw.tobytes()[:-5])
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        media.decode_png(media._PNG_SIG + chunk(b"IHDR", ihdr)
                         + chunk(b"IDAT", short) + chunk(b"IEND", b""))
    # unknown filter byte
    raw = np.zeros((4, 13), np.uint8)
    raw[2, 0] = 9
    with pytest.raises(ValueError):
        media.decode_png(media._PNG_SIG + chunk(b"IHDR", ihdr)
                         + chunk(b"IDAT", zlib.compress(raw.tobytes()))
                         + chunk(b"IEND", b""))


def test_image_decode_stage_real_png_mixed(ray_session):
    """BMP and PNG rows through the SAME actor-pool stage: the sniff
    dispatch must route each container to its real decoder."""
    import ray.data

    from donkey_ray.stages.multimodal import decode_images

    imgs = [_rgb(16, 16, seed=40 + i) for i in range(4)]
    media_bytes = [
        media.encode_png(imgs[0]), media.encode_bmp(imgs[1]),
        media.encode_png(imgs[2]), media.encode_bmp(imgs[3]),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "media": pa.array(media_bytes, pa.binary()),
    }))
    out = decode_images(ds, height=16, width=16, concurrency=(1, 2),
                        batch_size=2).take_all()
    got = {r["doc_id"]: np.asarray(r["pixels"], dtype=np.uint8
                                   ).reshape(16, 16, 3) for r in out}
    for i in range(4):
        np.testing.assert_array_equal(got[i], imgs[i])
