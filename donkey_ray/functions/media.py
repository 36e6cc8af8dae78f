"""Real media codecs with zero external dependencies.

Donkey's extractors (SURVEY.md §2A A1) decode raw media bytes before
feature extraction; this module supplies the REAL decode step for the
formats that are parseable with the standard library + numpy alone:

- **BMP** (Windows bitmap, 24-bit uncompressed BI_RGB, bottom-up or
  top-down) — pure header parse + one numpy stride reshape.
- **PPM / PGM** (netpbm P6/P5 binary, maxval <= 255) — tokenized
  header (comments supported) + numpy reshape.
- **WAV** (RIFF PCM, 8/16-bit, any channel count) — stdlib ``wave``;
  multi-channel is mono-mixed.
- **PNG** (8-bit gray / RGB / gray+alpha / RGBA, non-interlaced, all
  five scanline filters) — chunk walk + stdlib ``zlib`` inflate +
  vectorized un-filtering (Sub/Up via wraparound cumsum; Average/Paeth
  per-pixel within a row, as their left-neighbor dependency demands).

Encoders for the same formats exist so tests and the synthetic corpus
can round-trip REAL bytes (encode → decode == identity), proving the
decode path against ground truth rather than a fake.

``sniff()`` dispatches on magic bytes; unknown formats return None so
callers (``stages/multimodal.py``) can fall back to PIL (if installed)
or the documented deterministic fake.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------- sniff


def sniff(buf: bytes) -> str | None:
    """Identify a supported container by magic bytes.

    Returns 'bmp' | 'ppm' | 'pgm' | 'wav' | 'png' | None.
    """
    if len(buf) < 12:
        return None
    if buf[:8] == _PNG_SIG:
        return "png"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"P5":
        return "pgm"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")      # magic, size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {rgb.shape}")
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte multiples
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(pix), 0, 0, offset)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pix


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB.

    Supports bottom-up (height > 0) and top-down (height < 0) layouts.
    """
    if len(buf) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        raise ValueError("truncated BMP header")
    magic, _, _, _, offset = _BMP_FILE_HDR.unpack_from(buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (hdr_size, w, h, planes, bpp, compression, _, _, _, _, _) = (
        _BMP_INFO_HDR.unpack_from(buf, _BMP_FILE_HDR.size)
    )
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP pixels ({len(buf)} < {need} B)")
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h,
                         offset=offset).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# -------------------------------------------------------------- PPM/PGM


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {rgb.shape}")
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def _pnm_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints (skipping ``#`` comments)
    from ``buf`` beginning at ``start``; return (values, next offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        if i >= len(buf):
            raise ValueError("truncated PNM header")
        c = buf[i : i + 1]
        if c == b"#":
            j = buf.find(b"\n", i)
            i = len(buf) if j < 0 else j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            tok = buf[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad PNM header token {tok!r}")
            vals.append(int(tok))
            i = j
    # exactly ONE whitespace byte separates the header from raster data
    if i >= len(buf) or not buf[i : i + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    return vals, i + 1


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) or PGM (P5), maxval <= 255 -> (h, w, 3) uint8 RGB.

    Grayscale PGM is replicated across the three channels.
    """
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    channels = 3 if buf[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(buf, 3, 2)
    if maxval > 255:
        raise ValueError(f"unsupported PNM maxval {maxval} (> 255)")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    need = off + w * h * channels
    if len(buf) < need:
        raise ValueError(f"truncated PNM pixels ({len(buf)} < {need} B)")
    pix = np.frombuffer(buf, dtype=np.uint8, count=w * h * channels,
                        offset=off).reshape(h, w, channels)
    if channels == 1:
        pix = np.repeat(pix, 3, axis=2)
    return np.ascontiguousarray(pix)


# ------------------------------------------------------------------ PNG
#
# Pure-stdlib implementation of the subset a data pipeline meets in
# practice: 8-bit-depth, non-interlaced, color types 0 (gray),
# 2 (truecolor), 4 (gray+alpha), 6 (RGBA); every ancillary chunk is
# skipped; IDAT may span multiple chunks. The wire format is the public
# PNG spec (RFC 2083): signature, then length-type-data-crc chunks;
# scanlines are zlib-deflated with a per-row filter byte.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per supported color type (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor non-interlaced PNG bytes
    (filter 0 rows, one IDAT). Round-trips through decode_png."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {rgb.shape}")
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _png_unfilter(data: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Inflated scanline stream -> (h, w*c) uint8 recon rows.

    Filters 0 (None) and 2 (Up) are whole-row numpy ops; 1 (Sub) is a
    per-channel wraparound cumsum (uint8 addition is associative mod
    256); 3 (Average) and 4 (Paeth) depend on the just-reconstructed
    left neighbor, so they walk the row pixel-wise — the encoders this
    repo and the fixtures use emit filter 0, and a decode-heavy corpus
    runs inside the actor-pool stage where the row walk is per-image,
    not per-corpus."""
    stride = w * c
    if len(data) < h * (1 + stride):
        raise ValueError(f"truncated PNG scanlines "
                         f"({len(data)} < {h * (1 + stride)} B)")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = data[pos]
        row = np.frombuffer(data, dtype=np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += 1 + stride
        if f == 0:
            rec = row
        elif f == 1:  # Sub: recon[x] = row[x] + recon[x - c]
            rec = np.cumsum(
                row.reshape(w, c).astype(np.uint64), axis=0
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            rec = row + prev
        elif f == 3:  # Average: + floor((left + up) / 2)
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth predictor
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                if pa_ <= pb_ and pa_ <= pc_:
                    pred = a
                elif pb_ <= pc_:
                    pred = b
                else:
                    pred = cc
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on row {y}")
        out[y] = rec
        prev = rec
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG bytes -> (h, w, 3) uint8 RGB.

    Gray replicates across channels; alpha is dropped (the pipeline's
    feature extractors are RGB-only, matching the other decoders)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError(f"truncated PNG chunk {typ!r}")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color type={color})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG (compression/filter/interlace)")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    if not idat:
        raise ValueError("PNG missing IDAT")
    c = _PNG_CHANNELS[color]
    rows = _png_unfilter(zlib.decompress(bytes(idat)), h, w, c)
    pix = rows.reshape(h, w, c)
    if color == 0:
        pix = np.repeat(pix, 3, axis=2)
    elif color == 4:
        pix = np.repeat(pix[:, :, :1], 3, axis=2)
    elif color == 6:
        pix = pix[:, :, :3]
    return np.ascontiguousarray(pix)


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 PCM samples -> mono 16-bit WAV bytes (stdlib ``wave``)."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim != 1:
        raise ValueError(f"expected 1-D mono samples, got {samples.shape}")
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(sample_rate))
        wf.writeframes(samples.tobytes())
    return out.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1), sample_rate).

    Supports 8-bit unsigned and 16-bit signed PCM at any channel count;
    multi-channel audio is mono-mixed by channel mean.
    """
    with wave.open(io.BytesIO(buf), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} B")
    if nch > 1:
        usable = (len(pcm) // nch) * nch
        pcm = pcm[:usable].reshape(-1, nch).mean(axis=1)
    return pcm, rate


# --------------------------------------------------------------- helpers


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array to (h, w, C) —
    deterministic, vectorized (two fancy-index gathers)."""
    H, W = img.shape[0], img.shape[1]
    if H == h and W == w:
        return np.ascontiguousarray(img)
    rows = (np.arange(h, dtype=np.int64) * H) // h
    cols = (np.arange(w, dtype=np.int64) * W) // w
    return np.ascontiguousarray(img[rows][:, cols])


def decode_image(buf: bytes) -> np.ndarray | None:
    """Decode any supported REAL image container to (h, w, 3) uint8 RGB;
    None when the bytes are not a supported image format."""
    kind = sniff(buf)
    if kind == "bmp":
        return decode_bmp(buf)
    if kind in ("ppm", "pgm"):
        return decode_ppm(buf)
    if kind == "png":
        return decode_png(buf)
    return None
