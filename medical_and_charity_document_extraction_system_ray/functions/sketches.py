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
