"""MinHash + SimHash sketches for near-duplicate detection.

MinHash: 128 universal-hash permutations h_i(x) = (a_i*x + b_i) mod p over
64-bit shingle hashes (p = 2^31-1, so a_i*x fits uint64 and the whole
signature vectorizes); LSH banding NUM_BANDS=32 bands x ROWS_PER_BAND=4
rows. SimHash: 64-bit sign-of-weighted-bit-sums over token hashes,
near-dup via 4x16-bit band buckets + Hamming check.

All numpy-vectorized over the shingle/token hash arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .textstats import fp_token_hash64, shingle_hashes
from .tokenize import SimpleTokenizer

NUM_PERMS = 128
# 32 bands x 4 rows: LSH S-curve midpoint (1/32)^(1/4) ~= 0.42, so pairs at
# the 0.5 Jaccard near-dup threshold are caught with high probability
NUM_BANDS = 32
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
# 31-bit Mersenne prime: a*x fits in uint64, so the whole signature is one
# vectorized (perms x shingles) uint64 product — no per-value Python ints.
_P = np.uint64((1 << 31) - 1)
_TOK = SimpleTokenizer()


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P), size=NUM_PERMS, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=NUM_PERMS, dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def minhash_signature(shingle_hs: np.ndarray) -> np.ndarray:
    """(NUM_PERMS,) uint64 signature; all-p sentinel for empty docs."""
    if shingle_hs.size == 0:
        return np.full(NUM_PERMS, _P, dtype=np.uint64)
    x = (shingle_hs.astype(np.uint64) % _P)
    prod = (_A[:, None] * x[None, :] + _B[:, None]) % _P  # (perms, shingles)
    return prod.min(axis=1)


def band_keys(sig: np.ndarray) -> list[bytes]:
    """NUM_BANDS LSH bucket keys: band index + blake2b of the band's
    ROWS_PER_BAND signature values."""
    keys = []
    for band in range(NUM_BANDS):
        chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        keys.append(bytes([band]) + h)
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted uint64 hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes weighted by tf.

    Token hash pinned to sha256-top-8-bytes (fp_token_hash64) so the
    DuckDB oracle can mirror the computation exactly in SQL."""
    toks = _TOK.tokenize(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, tf in Counter(toks).items():
        h = fp_token_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += tf * (2 * bits.astype(np.int64) - 1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(h: int, n_bands: int = 4) -> list[int]:
    """Band keys (band_idx << 16 | chunk) for Hamming<=n_bands-1 candidates."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [(band << width * 2) | ((h >> (band * width)) & mask) for band in range(n_bands)]


def doc_shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    return shingle_hashes(text, n)
