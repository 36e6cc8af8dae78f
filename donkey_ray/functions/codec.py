"""Varbyte + delta codecs for posting lists (SURVEY.md B13/B28).

Pinned wire format (SURVEY.md section 7 step 4):
  - varbyte: LSB-first 7-bit groups, high bit = continuation (set on every
    byte except the last byte of a value). Values are unsigned 64-bit.
  - doc_ids are stored as deltas over the ascending-sorted unique list:
    first value absolute, subsequent values = difference (>= 1).
  - tf / dl streams are stored varbyte, un-deltaed.

All kernels are numpy-vectorized (no per-value Python loop); encode loops
over at most 10 byte-groups, decode is fully vectorized.

Donkey parallel [PK]: donkey's kgraph index file format is its on-disk
posting analogue (src/index-kgraph.cpp, file-level, unverifiable — see
SURVEY.md section 0); this format is our own pinned spec.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_M7F = np.uint64(0x7F)


def varbyte_encode(values) -> bytes:
    """Encode an array of uint64 values. Returns b'' for empty input."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes-per-value: number of 7-bit groups (>=1)
    nb = np.ones(v.size, dtype=np.int64)
    rest = v >> _U7
    while rest.any():
        nb += (rest > 0)
        rest = rest >> _U7
    offs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nb, out=offs[1:])
    out = np.zeros(offs[-1], dtype=np.uint8)
    starts = offs[:-1]
    for g in range(10):
        mask = nb > g
        if not mask.any():
            break
        pos = starts[mask] + g
        byte = ((v[mask] >> np.uint64(7 * g)) & _M7F).astype(np.uint8)
        cont = (nb[mask] - 1 > g).astype(np.uint8)
        out[pos] = byte | (cont << 7)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a varbyte buffer back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if not is_end[-1]:
        raise ValueError("truncated varbyte stream")
    n_vals = int(is_end.sum())
    # uniform-width fast path: sorted-hash doc-id deltas cluster in one
    # log range, so whole buffers are often a single byte length — then
    # the stream is a (n, L) matrix and decoding is L column combines
    # (no cumsum / flatnonzero / scatter)
    if n_vals and b.size % n_vals == 0:
        L = b.size // n_vals
        ends = is_end.reshape(n_vals, L)
        if ends[:, -1].all() and (L == 1 or not ends[:, :-1].any()):
            m = b.reshape(n_vals, L).astype(np.uint64)
            vals = m[:, 0] & np.uint64(0x7F)
            for g in range(1, L):
                vals |= (m[:, g] & np.uint64(0x7F)) << np.uint64(7 * g)
            return vals
    value_id = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=value_id[1:])
    # start index of each value
    starts = np.flatnonzero(
        np.concatenate(([True], is_end[:-1]))
    )
    shift = (np.arange(b.size, dtype=np.int64) - starts[value_id]).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (_U7 * shift)
    n = int(is_end.sum())
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, value_id, contrib)
    return vals


def varbyte_encode_all(values) -> tuple[bytes, np.ndarray]:
    """Encode all values in one vectorized pass; returns (buffer, offs)
    where offs[i] is the byte offset of value i (len n+1). Slicing
    buffer[offs[i]:offs[j]] yields the encoding of values[i:j]."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nb = np.ones(v.size, dtype=np.int64)
    rest = v >> _U7
    while rest.any():
        nb += (rest > 0)
        rest = rest >> _U7
    offs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nb, out=offs[1:])
    out = np.zeros(offs[-1], dtype=np.uint8)
    starts = offs[:-1]
    for g in range(10):
        mask = nb > g
        if not mask.any():
            break
        pos = starts[mask] + g
        byte = ((v[mask] >> np.uint64(7 * g)) & _M7F).astype(np.uint8)
        cont = (nb[mask] - 1 > g).astype(np.uint8)
        out[pos] = byte | (cont << 7)
    return out.tobytes(), offs


def varbyte_encode_segments(values, seg_starts) -> list[bytes]:
    """[varbyte_encode(run) for run in runs] in one vectorized pass."""
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    buf, offs = varbyte_encode_all(values)
    n = offs.size - 1
    byte_bounds = offs[np.append(seg_starts, n)]
    return [buf[byte_bounds[i]: byte_bounds[i + 1]] for i in range(len(seg_starts))]


def decode_blocked_deltas(buf: bytes, n: int, block_size: int) -> np.ndarray:
    """Decode a delta stream whose deltas RESET at every block boundary
    (the first value of each block is absolute) -> absolute int64 values.

    This layout makes each block independently decodable (lazy block-max
    WAND skips decode of pruned blocks)."""
    d = varbyte_decode(buf)
    assert d.size == n, (d.size, n)
    if n == 0:
        return d.astype(np.int64)
    c = np.cumsum(d, dtype=np.uint64)
    bs = np.arange(0, n, block_size)
    pre = np.concatenate((np.zeros(1, dtype=np.uint64), c[bs[1:] - 1]))
    lens = np.diff(np.append(bs, n))
    corr = np.repeat(pre, lens)
    return (c - corr).astype(np.int64)


def delta_encode_segments(sorted_vals, seg_starts) -> np.ndarray:
    """Per-run delta encode in one pass: within each run the first value is
    absolute, the rest are diffs (runs are ascending-sorted)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    d[seg_starts] = v[seg_starts]
    return d


def delta_encode(sorted_vals) -> np.ndarray:
    """Ascending-sorted unique uint64 -> deltas (first absolute)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    return d


def delta_decode(deltas) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids) -> bytes:
    """Ascending-sorted unique doc_ids (int64/uint64) -> delta varbyte."""
    return varbyte_encode(delta_encode(np.asarray(doc_ids, dtype=np.uint64)))


def decode_postings(buf: bytes) -> np.ndarray:
    """Inverse of encode_postings; returns int64 doc_ids."""
    return delta_decode(varbyte_decode(buf)).astype(np.int64)
