"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes (ray guide "Aggregation at scale"):

- exact: per-batch combine (text -> min doc_id, count) BEFORE the
  groupby, so the shuffle moves one row per distinct text per batch;
- MinHash: signatures are computed vectorized per batch, exploded to
  (band_id, band_hash, doc_id) rows, bucketed by a groupby, candidate
  pairs verified by true Jaccard — only bucket-mates ever pair up;
- SimHash: 64-bit sketch per doc, 4 x 16-bit band tables for
  hamming<=k candidates;
- embedding near-dup: exact blocked brute-force verify (the sf-scale
  baseline; the IVF path in similarity.py is the 100-TB shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.text import stable_hash64
from ..sources.readers import read_table

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
# coarse shuffle-key cardinality: enough groups for parallelism, few
# enough that per-group python overhead stays negligible
_COARSE_BUCKETS = 64


# ---------------------------------------------------------------------------
# Exact dedup (SQL-matched)
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keeper per distinct text = min(doc_id); emits (doc_id, n_dups)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("text").aggregate([("doc_id", "min"), ("doc_id", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("text").aggregate(
        Min("doc_id_min", alias_name="doc_id"),
        Sum("doc_id_count", alias_name="n_dups"),
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "n_dups"]),
        batch_format="pyarrow",
    )


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text
"""


# ---------------------------------------------------------------------------
# Shingling + MinHash signatures (vectorized)
# ---------------------------------------------------------------------------

def _token_hashes_per_row(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes, row id per token) for a string column."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text_col), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    rows = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return stable_hash64(flat), rows


def _shingle_hashes(text_col, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram shingle hashes (flat) + row ids, vectorized: combine
    k consecutive token hashes within a row."""
    th, rows = _token_hashes_per_row(text_col)
    n = th.size
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        sh = th.copy()
        valid = np.ones(n, dtype=bool)
        for j in range(1, k):
            shifted = np.empty(n, dtype=np.uint64)
            shifted[: n - j] = th[j:]
            shifted[n - j :] = 0
            same_row = np.zeros(n, dtype=bool)
            same_row[: n - j] = rows[j:] == rows[: n - j]
            sh = sh * _P1 + shifted * _P2
            valid &= same_row
    return sh[valid], rows[valid]


def minhash_signatures(
    text_col, num_hashes: int = 64, shingle_k: int = 3, seed: int = 1234
) -> tuple[np.ndarray, np.ndarray]:
    """(row_ids, signatures[num_rows, num_hashes]) for non-empty rows."""
    sh, rows = _shingle_hashes(text_col, k=shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    uniq_rows = np.unique(rows)
    sig = np.full((uniq_rows.size, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    row_pos = np.searchsorted(uniq_rows, rows)
    with np.errstate(over="ignore"):
        for j in range(num_hashes):
            hv = sh * a[j] + b[j]
            np.minimum.at(sig[:, j], row_pos, hv)
    return uniq_rows, sig


def q_minhash_lsh_pairs(
    sf_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """Near-dup pairs via MinHash banding.

    signatures -> (band_id, band_hash, doc_id) rows -> groupby bucket ->
    candidate pairs -> exact shingle-Jaccard verify.  Rows-only oracle
    (probabilistic recall is not SQL-expressible)."""
    rows_per_band = num_hashes // bands
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_band_rows(t: pa.Table) -> pa.Table:
        row_ids, sig = minhash_signatures(t["text"], num_hashes=num_hashes)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[row_ids]
        texts = np.asarray(t["text"].to_pylist(), dtype=object)[row_ids]
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), row_ids.size)
        with np.errstate(over="ignore"):
            bh = np.zeros((row_ids.size, bands), dtype=np.uint64)
            for bidx in range(bands):
                seg = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
                h = np.zeros(row_ids.size, dtype=np.uint64)
                for c in range(seg.shape[1]):
                    h = h * _P1 + seg[:, c]
                bh[:, bidx] = h
        bh_flat = bh.T.reshape(-1)
        return pa.table(
            {
                "band_id": band_ids,
                "band_hash": bh_flat.astype(np.int64),
                # coarse shuffle key: one groupby call handles MANY LSH
                # buckets (a map_groups call per (band,hash) bucket would
                # pay python overhead per bucket — thousands of calls)
                "bucket": (bh_flat % np.uint64(_COARSE_BUCKETS)).astype(np.int32),
                "doc_id": np.tile(doc_ids, bands),
                "text": pa.array(np.tile(texts, bands)),
            }
        )

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_, _), grp in g.groupby(["band_id", "band_hash"], sort=True):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            texts = grp["text"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.append((int(ids[i]), int(ids[j]), texts[i], texts[j]))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "text_a", "text_b"])
        if len(df):
            df["pair_bucket"] = (
                (df["doc_a"].to_numpy(np.uint64) * _P1 + df["doc_b"].to_numpy(np.uint64))
                % np.uint64(_COARSE_BUCKETS)
            ).astype(np.int32)
        else:
            df["pair_bucket"] = pd.Series([], dtype=np.int32)
        return df

    cand = band_rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # a pair found in several bands always lands in one pair_bucket,
        # so the within-bucket drop_duplicates is a global dedup
        if len(g) == 0:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
        g = g.drop_duplicates(subset=["doc_a", "doc_b"])
        jac = []
        for _, r in g.iterrows():
            ta = pa.array([r["text_a"], r["text_b"]])
            sh, rows = _shingle_hashes(ta)
            sa = set(sh[rows == 0].tolist())
            sb = set(sh[rows == 1].tolist())
            denom = len(sa | sb)
            jac.append(len(sa & sb) / denom if denom else 1.0)
        g = g[["doc_a", "doc_b"]].copy()
        g["jaccard"] = np.floor(np.asarray(jac) * 1e6) / 1e6
        return g[g["jaccard"] >= jaccard_threshold]

    return cand.groupby("pair_bucket").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash64(text_col) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized."""
    th, rows = _token_hashes_per_row(text_col)
    n_rows = len(text_col)
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    if th.size:
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        np.add.at(acc, rows, 2 * bits - 1)
    out = np.zeros(n_rows, dtype=np.uint64)
    pos = (acc > 0).astype(np.uint64)
    for j in range(64):
        out |= pos[:, j] << np.uint64(j)
    return out


def q_simhash_pairs(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with SimHash hamming distance <= max_hamming via
    4 x 16-bit band tables (a pair within distance 3 must agree on at
    least one of 4 bands). Rows-only oracle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_bands(t: pa.Table) -> pa.Table:
        sh = simhash64(t["text"])
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        parts = []
        for b in range(4):
            key = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(t), b, dtype=np.int32)),
                        "band_key": pa.array(key),
                        "bucket": pa.array(
                            ((b * 65536 + key) % _COARSE_BUCKETS).astype(np.int32)
                        ),
                        "doc_id": pa.array(doc),
                        "simhash": pa.array(sh.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    bands = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_, _), grp in g.groupby(["band_id", "band_key"], sort=True):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                d = np.bitwise_xor(hs[i], hs[i + 1 :])
                ham = np.array([bin(int(x)).count("1") for x in d])
                for j in np.nonzero(ham <= max_hamming)[0]:
                    out.append((int(ids[i]), int(ids[i + 1 + j]), int(ham[j])))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])
        if len(df):
            df["pair_bucket"] = (
                (df["doc_a"].to_numpy(np.uint64) * _P1 + df["doc_b"].to_numpy(np.uint64))
                % np.uint64(_COARSE_BUCKETS)
            ).astype(np.int32)
        else:
            df["pair_bucket"] = pd.Series([], dtype=np.int32)
        return df

    cand = bands.groupby("bucket").map_groups(pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
        return g.drop_duplicates(subset=["doc_a", "doc_b"])[
            ["doc_a", "doc_b", "hamming"]
        ]

    return cand.groupby("pair_bucket").map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard within blocking buckets
# ---------------------------------------------------------------------------

def q_ngram_jaccard(sf_dir: str, threshold: float = 0.4) -> ray.data.Dataset:
    """Char-5-gram Jaccard over pairs blocked by (lang, length decile).

    Blocking keeps the pair count bounded (the all-pairs alternative is
    quadratic); rows-only oracle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(t["n_chars"], 50), pa.int32())
        return t.append_column("len_bucket", b)

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_, _), grp in g.groupby(["lang", "len_bucket"], sort=True):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            grams = [
                {t[i : i + 5] for i in range(max(len(t) - 4, 1))}
                for t in grp["text"]
            ]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    denom = len(grams[i] | grams[j])
                    jac = len(grams[i] & grams[j]) / denom if denom else 1.0
                    if jac >= threshold:
                        out.append(
                            (int(ids[i]), int(ids[j]), float(np.floor(jac * 1e6) / 1e6))
                        )
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return ds.groupby(["lang", "len_bucket"]).map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact verify; SQL-matched)
# ---------------------------------------------------------------------------

def q_embedding_neardup(sf_dir: str, threshold: float = 0.4) -> ray.data.Dataset:
    """All pairs with cosine >= threshold — exact blocked brute force
    (each batch matmuls against the broadcast full matrix; O(n^2/B)
    per task).  SQL oracle is the equivalent self-join."""
    import ray

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_rows = pa.concat_tables(
        ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )
    ids_all = all_rows["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(all_rows["embedding"].to_pylist()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat))

    def block(t: pa.Table) -> pa.Table:
        ids_b = t["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ids_all_, mat_ = ray.get(ref)
        sims = m @ mat_.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = ids_b[ai] < ids_all_[bj]
        return pa.table(
            {
                "vec_a": pa.array(ids_b[ai][keep]),
                "vec_b": pa.array(ids_all_[bj][keep]),
                "cosine": pa.array(np.floor(sims[ai, bj][keep] * 1e6 + 1e-3) / 1e6),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow", batch_size=1024)


Q_EMB_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.001) / 1000000
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""
