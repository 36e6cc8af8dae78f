"""Vectorized Bloom filter over int64/uint64 key columns.

The distributed-join prefilter: build one filter over the SMALL side's
keys (per-batch partial bitsets OR-merged — mergeable like the HLL
registers in functions/sketch.py), broadcast it once per worker
(ray.put), and drop big-side rows that cannot match BEFORE the join's
keyed exchange. At 100 TB this converts a shuffle of every probe-side
row into a shuffle of survivors only; false positives (~0.8% at the
default 10 bits/key, k=7) cost only wasted shuffle bytes — the exact
join behind the filter keeps the result identical.

Double hashing (Kirsch & Mitzenmacher 2006): probe_i = h1 + i*h2 with
h1/h2 from two splitmix64 streams — k probes from 2 hashes, all numpy.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

BITS_PER_KEY = 10
NUM_PROBES = 7  # ~= BITS_PER_KEY * ln2, FPR ~ 0.8%
_H2_SALT = np.uint64(0xA5A5A5A5DEADBEEF)


def bloom_num_words(n_keys: int) -> int:
    """Filter size in uint64 words: next power of two >= n*BITS_PER_KEY
    bits (power of two so the modulo is a mask)."""
    bits = max(64, n_keys * BITS_PER_KEY)
    return 1 << max(0, (bits - 1).bit_length() - 6)


def _probe_positions(keys: np.ndarray, n_words: int) -> tuple[np.ndarray, np.ndarray]:
    """(word_index, bit_mask) arrays of shape (len(keys), NUM_PROBES)."""
    x = keys.astype(np.uint64)
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ _H2_SALT) | np.uint64(1)
    i = np.arange(NUM_PROBES, dtype=np.uint64)[None, :]
    pos = (h1[:, None] + i * h2[:, None]) & np.uint64(n_words * 64 - 1)
    return (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63))


def bloom_partial(keys: np.ndarray, n_words: int) -> np.ndarray:
    """One batch's partial filter: (n_words,) uint64 bitset."""
    out = np.zeros(n_words, dtype=np.uint64)
    if len(keys):
        words, masks = _probe_positions(keys, n_words)
        np.bitwise_or.at(out, words.ravel(), masks.ravel())
    return out


def bloom_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = np.zeros_like(partials[0])
    for p in partials:
        out |= p
    return out


def bloom_might_contain(bloom: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where the key MAY be in the set (no false
    negatives)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    words, masks = _probe_positions(keys, len(bloom))
    return ((bloom[words] & masks) == masks).all(axis=1)
