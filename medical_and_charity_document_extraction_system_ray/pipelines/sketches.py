"""Distinct-count operators: exact (SQL-matched) and KMV-approximate.

The exact variant dedups locally per batch before any shuffle; the
approximate variant ships one O(k) sketch per key per batch — the
shape that holds at 10^12 rows where the exact pair-dedup shuffle
would not.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from ..functions.sketches import kmv_estimate, kmv_from_hashes, kmv_merge
from ..sources.readers import read_table

KMV_K = 256


def q_distinct_users_exact(sf_dir: str) -> ray.data.Dataset:
    """COUNT(DISTINCT user_id) per event_type, exact: local pair-dedup
    per batch -> global pair distinct -> count."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
    distinct_pairs = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_c")
    )
    return distinct_pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")
    )


Q_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64 ids (splitmix64)."""
    x = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def q_approx_distinct_users(sf_dir: str, k: int = KMV_K) -> ray.data.Dataset:
    """KMV approximate distinct users per event_type.  One sketch per
    (type, batch) -> merge in a tiny groupby.  Rows-only oracle; the
    accuracy bound is pytest-asserted (test_dedup_similarity)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for etype, grp in df.groupby("event_type", sort=True):
            h = _hash_ids(grp["user_id"].to_numpy())
            sk = kmv_from_hashes(h, k)
            rows.append({"event_type": etype, "sketch": sk.astype(np.int64).tolist()})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    pa.field("event_type", pa.string()),
                    pa.field("sketch", pa.list_(pa.int64())),
                ]
            ),
        )

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, grp in g.groupby("event_type", sort=True):
            parts = [np.asarray(s, dtype=np.int64).astype(np.uint64) for s in grp["sketch"]]
            merged = kmv_merge(parts, k)
            rows.append(
                {
                    "event_type": etype,
                    "approx_users": round(kmv_estimate(merged, k), 2),
                }
            )
        return pd.DataFrame(rows, columns=["event_type", "approx_users"])

    return sketches.groupby("event_type").map_groups(merge, batch_format="pandas")
