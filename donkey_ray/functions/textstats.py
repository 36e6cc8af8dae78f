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
    return int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")


def fp_token_hash64(token: str) -> int:
    """Token hash for FINGERPRINTS only: top 8 bytes of sha256, big-endian.
    Pinned to sha256 (not blake2b) so the DuckDB oracle can mirror it
    exactly (`sha256()` exists in SQL; blake2b does not)."""
    return int.from_bytes(hashlib.sha256(token.encode()).digest()[:8], "big")


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


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct shingle -> 64-bit hash set (sorted uint64)."""
    hs = {token_hash64(s) for s in shingles(text, n)}
    return np.fromiter(sorted(hs), dtype=np.uint64, count=len(hs))
