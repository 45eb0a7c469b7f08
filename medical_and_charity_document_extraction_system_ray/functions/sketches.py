"""Mergeable sketches for approximate aggregates at scale.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
64-bit hashes of the key set; estimate = (k-1) / kth_min_normalized.
Sketches merge by union+truncate, so the Ray pattern is: one sketch
per key per batch inside ``map_batches``, then a tiny groupby merging
sketches — the shuffle moves O(k) values per key per batch instead of
every row (ray guide, "Aggregation at scale").
"""

from __future__ import annotations

import numpy as np

_MAX = np.float64(2**64)


def kmv_from_hashes(hashes: np.ndarray, k: int) -> np.ndarray:
    """Sketch = sorted unique k smallest uint64 hashes."""
    u = np.unique(hashes)  # sorted ascending
    return u[:k]


def kmv_merge(sketches: list[np.ndarray], k: int) -> np.ndarray:
    if not sketches:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(sketches))[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """Distinct-count estimate; exact when the sketch is not full."""
    if sketch.size < k:
        return float(sketch.size)
    kth = float(sketch[k - 1]) / float(_MAX)
    return (k - 1) / kth if kth > 0 else float(k)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (fixed register array, max-mergeable)
# ---------------------------------------------------------------------------

HLL_P = 11  # 2^11 = 2048 registers -> sigma ~ 1.04/sqrt(m) ~ 2.3 %


def _bit_length64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float log — values
    above 2^53 would lose precision): smear the high bit down, then
    popcount."""
    x = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(x.size, 8), axis=1
    ).sum(axis=1, dtype=np.int64)


def hll_from_hashes(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Register array (uint8, length 2^p) from uint64 hashes: index =
    top p bits, value = leading-zero run of the remaining bits + 1."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return reg
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        w = h << np.uint64(p)  # suffix shifted to the top 64-p bits
    rho = np.where(w == 0, 64 - p + 1, 64 - _bit_length64(w) + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(registers: list[np.ndarray]) -> np.ndarray:
    """Elementwise max — order-independent, so batch boundaries never
    change the result (unlike counter-based sketches)."""
    return np.maximum.reduce([r.astype(np.uint8) for r in registers])


def hll_estimate(reg: np.ndarray, p: int = HLL_P) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (the 64-bit hash makes large-range correction moot)."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)
