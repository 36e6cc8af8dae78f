"""Mergeable sketches for distributed approximate aggregation.

HyperLogLog (Flajolet et al., standard 2^p-register formulation with
the small-range linear-counting correction): the unit of work is a
REGISTER VECTOR, which is associative-mergeable by elementwise max —
exactly the map-side-partial + tiny-final-merge shape every partial
aggregate in this repo uses. Hashing is splitmix64 (the repo's pinned
process-independent mixer), so partials from any worker merge exactly.
"""

from __future__ import annotations

import numpy as np

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register vector (2^p uint8) for one batch of int64/uint64 values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _mix64(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    top = np.uint64(1) << np.uint64(63)
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p):
        zero_top = alive & ((cur & top) == 0)
        lz[zero_top] += 1
        alive &= zero_top
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    rank = lz + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear counting for the small range."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)
