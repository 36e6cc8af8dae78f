"""Text-analysis kernels: quality scoring, language ID, fingerprinting,
shingling (training-data pipeline ops; graded alongside SURVEY.md section 2).

Every SQL-oracled metric here is pinned so the engine and the DuckDB oracle
compute bit-identical logic (same tokenizer regex, same marker lists, same
tie-break orders, same rounding).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .tokenize import SimpleTokenizer

_TOK = SimpleTokenizer()

# Pinned stopword list for quality scoring (shared with oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Pinned language marker words, and the pinned tie-break priority order
# (alphabetical). If all marker counts are 0 -> 'unknown'.
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de", "shi", "le", "he", "zai"),
}
LANG_PRIORITY = ("de", "en", "es", "fr", "zh")

FP_BASE = 1_000_003
FP_MOD = (1 << 61) - 1


def quality_metrics(text: str) -> dict:
    """n_tokens, stopword_ratio, mean_token_len (ratios 0.0 when empty)."""
    toks = _TOK.tokenize(text)
    n = len(toks)
    if n == 0:
        return {"n_tokens": 0, "stopword_ratio": 0.0, "mean_token_len": 0.0}
    stop = sum(1 for t in toks if t in STOPWORDS)
    return {
        "n_tokens": n,
        "stopword_ratio": stop / n,
        "mean_token_len": sum(len(t) for t in toks) / n,
    }


def lang_id(text: str) -> str:
    """Marker-word language heuristic with pinned tie-break."""
    toks = _TOK.tokenize(text)
    counts = {
        lang: sum(1 for t in toks if t in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = max(counts.values())
    if best == 0:
        return "unknown"
    for lang in LANG_PRIORITY:
        if counts[lang] == best:
            return lang
    raise AssertionError


def token_hash64(token: str) -> int:
    """Pinned token hash: top 8 bytes of sha256, big-endian. sha256 (not
    blake2b) so DuckDB oracles can mirror every shingle/minhash chain
    exactly (`sha256()` exists in SQL; blake2b does not). Hashed once per
    UNIQUE token everywhere (dictionary encode), so the digest choice is
    off the hot path."""
    return int.from_bytes(hashlib.sha256(token.encode()).digest()[:8], "big")


def fp_token_hash64(token: str) -> int:
    """Alias kept for the fingerprint call sites (same pinned sha256-top64
    hash as token_hash64 since the minhash oracle landed)."""
    return token_hash64(token)


def fingerprint(text: str) -> int:
    """Rolling polynomial hash of the token-hash stream mod 2^61-1.

    Order-sensitive (document fingerprint, not a bag-of-words hash)."""
    h = 0
    for t in _TOK.tokenize(text):
        h = (h * FP_BASE + (fp_token_hash64(t) % FP_MOD)) % FP_MOD
    return h


def shingles(text: str, n: int = 3) -> list[str]:
    """Distinct word n-gram shingles, in first-occurrence order."""
    toks = _TOK.tokenize(text)
    if len(toks) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen.setdefault(" ".join(toks[i : i + n]), None)
    return list(seen)


# Shingle hashing is pinned as: sha256-top-8 per TOKEN, combined across the
# n-gram window by an order-sensitive polynomial over uint64 (wrapping),
# then splitmix-finalized. Chosen over hashing the joined string so the
# COLUMN kernel below can compute every shingle of a batch with shifted
# array ops — no per-doc Python. `shingle_hashes` (per row) and
# `shingle_hash_column` (vectorized) implement the same math and are
# property-tested identical.
_SH_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _mix64_np(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _combine_ngram(token_hs: np.ndarray, n: int) -> np.ndarray:
    """Hashes of every length-n window over a token-hash sequence."""
    if len(token_hs) < n:
        return np.empty(0, np.uint64)
    acc = token_hs[: len(token_hs) - n + 1].copy()
    for j in range(1, n):
        acc = acc * _SH_B + token_hs[j: len(token_hs) - n + 1 + j]
    return _mix64_np(acc)


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct shingle -> 64-bit hash set (sorted uint64)."""
    toks = _TOK.tokenize(text)
    th = np.fromiter(
        (token_hash64(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    return np.unique(_combine_ngram(th, n))


def shingle_hash_column(col, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch twin of ``shingle_hashes``: for a string column,
    returns (values, offsets) where values[offsets[i]:offsets[i+1]] is
    row i's SORTED DISTINCT shingle-hash set. Tokens are hashed once per
    unique token (dictionary encode + sha256-top64); window combination and
    per-row dedup are shifted-array numpy ops."""
    import pyarrow as pa

    flat, parents, dl = _TOK.tokenize_column(col)
    n_rows = len(col)
    if len(parents) == 0:
        return np.empty(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    enc = (flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
           ).dictionary_encode()
    uniq_h = np.fromiter(
        (token_hash64(t) for t in enc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(enc.dictionary),
    )
    th = uniq_h[enc.indices.to_numpy(zero_copy_only=False)]
    # valid window start: all n tokens share the row
    L = len(th)
    m = L - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    acc = th[:m].copy()
    for j in range(1, n):
        acc = acc * _SH_B + th[j: m + j]
    acc = _mix64_np(acc)
    valid = parents[:m] == parents[n - 1: m + n - 1]
    rows = parents[:m][valid]
    hs = acc[valid]
    # per-row sorted distinct: lexsort by (row, hash), drop equal neighbors
    order = np.lexsort((hs, rows))
    rows_s, hs_s = rows[order], hs[order]
    if len(rows_s):
        keep = np.empty(len(rows_s), dtype=bool)
        keep[0] = True
        keep[1:] = (rows_s[1:] != rows_s[:-1]) | (hs_s[1:] != hs_s[:-1])
        rows_s, hs_s = rows_s[keep], hs_s[keep]
    counts = np.bincount(rows_s, minlength=n_rows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return hs_s, offsets
