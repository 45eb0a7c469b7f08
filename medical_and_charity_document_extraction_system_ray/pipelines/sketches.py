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

    def merge(g: pd.DataFrame) -> pa.Table:
        etypes, ests = [], []
        for etype, grp in g.groupby("event_type", sort=True):
            parts = [np.asarray(s, dtype=np.int64).astype(np.uint64) for s in grp["sketch"]]
            merged = kmv_merge(parts, k)
            etypes.append(etype)
            ests.append(round(kmv_estimate(merged, k), 2))
        # explicit Arrow schema so empty groups emit the same schema as
        # non-empty ones (schema-unstable operators break downstream fusion)
        return pa.table(
            {
                "event_type": pa.array(etypes, type=pa.string()),
                "approx_users": pa.array(ests, type=pa.float64()),
            }
        )

    return sketches.groupby("event_type").map_groups(merge, batch_format="pandas")


def q_approx_distinct_check(
    sf_dir: str, k: int = KMV_K, tolerance: float = 0.15
) -> pa.Table:
    """Value-oracled accuracy gate for the KMV sketch: runs the exact
    distinct count AND the sketch estimate, emits the exact count plus
    ``est_ok`` = |estimate/exact - 1| <= tolerance.  The SQL oracle
    recomputes the exact count and asserts TRUE, so a sketch drifting
    out of its error bound fails the hash-match — an honest value
    oracle for a probabilistic operator."""
    exact = q_distinct_users_exact(sf_dir).to_pandas()
    approx = q_approx_distinct_users(sf_dir, k=k).to_pandas()
    m = exact.merge(approx, on="event_type", how="outer")
    est_ok = (
        (m["approx_users"] / m["n_users"] - 1.0).abs() <= tolerance
    ).fillna(False)
    return pa.table(
        {
            "event_type": pa.array(m["event_type"], type=pa.string()),
            "n_users": pa.array(m["n_users"].astype("int64")),
            "est_ok": pa.array(est_ok.astype(bool)),
        }
    )


Q_APPROX_DISTINCT_CHECK_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, TRUE AS est_ok
FROM events GROUP BY event_type
"""
