"""Similarity search over the ``embeddings`` table.

- brute-force cosine top-k: broadcast the query matrix once
  (``ray.put``), numpy matmul per batch, global top-k via sort+limit —
  the exact baseline, SQL-matched;
- IVF: deterministic k-means (fixed seed + iterations) trained on a
  sample, vectors assigned to centroid lists, query probes the
  ``nprobe`` nearest lists — the 100-TB shape (search touches ~nprobe/
  nlist of the data).  Rows-only oracle (approximate recall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.readers import read_table


def _matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, mat


def _cosine(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    num = m @ q
    den = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(den > 0, num / den, 0.0)


def q_knn_bruteforce(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> ray.data.Dataset:
    """Exact cosine top-k to the embedding of ``query_vec_id``.

    cosine = dot/(|a||b|) computed like the SQL oracle
    (list_cosine_similarity over DOUBLE[]), floored to the 1e-6 grid;
    unique tie-break on vec_id.
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # fetch the query vector once (tiny read, pruned by row filter)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    qtab = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", query_vec_id)],
    )
    q = np.asarray(qtab["embedding"].to_pylist()[0], dtype=np.float64)
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        ids, mat = _matrix(t)
        sims = _cosine(mat, ray.get(q_ref))
        # local top-k per batch: the global sort only sees k rows/batch
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "cosine": pa.array(np.floor(sims[order] * 1e6 + 1e-3) / 1e6),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


Q_KNN_SQL = """
SELECT vec_id,
       FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
             * 1000000 + 0.001) / 1000000 AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def _kmeans(mat: np.ndarray, nlist: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic lloyd iterations, seeded init."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            pts = mat[assign == c]
            if len(pts):
                centroids[c] = pts.mean(axis=0)
    return centroids


def q_knn_ivf(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """IVF approximate top-k: train centroids on a head sample, assign
    per batch, search only the ``nprobe`` closest lists.  The scan
    prunes (nlist-nprobe)/nlist of the data — the scale path where the
    brute-force matmul is the per-list verifier."""
    import pyarrow.parquet as pq

    sample = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, 2048)
    ids_s, mat_s = _matrix(sample)
    centroids = _kmeans(mat_s, nlist=nlist)
    q = mat_s[np.nonzero(ids_s == query_vec_id)[0][0]]
    probe_lists = np.argsort(((centroids - q) ** 2).sum(axis=1))[:nprobe]
    ctx = ray.put((centroids, set(probe_lists.tolist()), q))

    def probe(t: pa.Table) -> pa.Table:
        centroids_, probes_, q_ = ray.get(ctx)
        ids, mat = _matrix(t)
        d = ((mat[:, None, :] - centroids_[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(probes_))
        ids, mat = ids[mask], mat[mask]
        sims = _cosine(mat, q_)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cosine": pa.array(np.floor(sims * 1e6 + 1e-3) / 1e6),
            }
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    scored = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)
