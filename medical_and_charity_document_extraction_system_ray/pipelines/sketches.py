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
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from ..functions.sketches import (
    HLL_P,
    hll_estimate,
    hll_from_hashes,
    hll_merge,
    kmv_estimate,
    kmv_from_hashes,
    kmv_merge,
)
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


# ---------------------------------------------------------------------------
# Histogram quantile sketch: mergeable, deterministic, fully value-oracled
# ---------------------------------------------------------------------------

HIST_BINS = 256


def q_hist_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.9), bins: int = HIST_BINS
) -> ray.data.Dataset:
    """Approximate quantiles of o_totalprice from a fixed-bin histogram
    sketch — the two-pass mergeable shape for 10^12 rows:

    pass 1: min/max (tiny aggregate); pass 2: per-batch bin COUNTS
    (order-independent integer sums -> groupby).  The estimate is the
    lower edge of the bin holding the target rank — deterministic and
    bin-exact, so DuckDB recomputes the IDENTICAL histogram and edge:
    this approximate operator is fully value-oracled (unlike
    order-sensitive GK/t-digest merges, which can only be band-gated).
    Error bound: (max-min)/bins, asserted by pytest against the exact
    quantile."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    # pass 1: bounds on the integer-cents grid (exact in both engines)
    def minmax(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "lo": pa.array([pc.min(c).as_py()], pa.int64()),
                "hi": pa.array([pc.max(c).as_py()], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    mm = (
        ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(None)
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .take(1)[0]
    )
    lo, hi = int(mm["lo"]), int(mm["hi"])
    width = max(1, -(-(hi - lo + 1) // bins))  # ceil: every value in range

    # pass 2: bin counts (vectorized bincount per batch)
    def hist(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        b = (c - lo) // width
        counts = np.bincount(b, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    # small result: bins rows -> finalize on the driver
    rows = agg.take_all()
    counts = np.zeros(bins, dtype=np.int64)
    for r in rows:
        counts[int(r["bin"])] = int(r["n"])
    csum = np.cumsum(counts)
    total = int(csum[-1])
    out_q, out_est = [], []
    for q in qs:
        rank = int(np.ceil(q * total))  # 1-based rank, quantile_disc style
        b = int(np.searchsorted(csum, max(rank, 1)))
        out_q.append(q)
        out_est.append((lo + b * width) / 100.0)  # lower bin edge, dollars
    return ray.data.from_arrow(
        pa.table(
            {
                "q": pa.array(out_q, pa.float64()),
                "est": pa.array(out_est, pa.float64()),
            }
        )
    )


Q_HIST_QUANTILES_SQL = f"""
WITH c AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v FROM orders
), b AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi,
         GREATEST(1, CAST(CEIL((MAX(v) - MIN(v) + 1) / {HIST_BINS}.0) AS BIGINT)) AS w
  FROM c
), h AS (
  SELECT (v - b.lo) // b.w AS bin, COUNT(*) AS n FROM c, b GROUP BY 1
), cum AS (
  SELECT bin, SUM(n) OVER (ORDER BY bin) AS csum, SUM(n) OVER () AS total
  FROM h
), qs AS (SELECT UNNEST([0.25, 0.5, 0.9]) AS q)
SELECT q,
       (b.lo + (SELECT MIN(bin) FROM cum
                WHERE csum >= GREATEST(CAST(CEIL(q * total) AS BIGINT), 1)) * b.w)
       / 100.0 AS est
FROM qs, b, (SELECT DISTINCT total FROM cum) t(total)
"""


# ---------------------------------------------------------------------------
# Heavy hitters: mergeable Misra-Gries sketch + value-oracled gate
# ---------------------------------------------------------------------------

# The corpus vocabulary is ~31 near-uniform tokens: k=28 forces real
# per-batch compression while keeping the n/(k+1) guarantee threshold
# below the top-token share, so the gate checks a non-empty heavy set.
MG_K = 28


def _mg_compress(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Reduce a counter set to <= k entries by subtracting the (k+1)-th
    largest count (the Misra-Gries decrement, batched): error added is
    bounded by that pivot, and the summary stays mergeable-by-sum
    (Agarwal et al., 'Mergeable Summaries', PODS'12)."""
    if tokens.size <= k:
        return tokens, counts
    pivot = np.partition(counts, counts.size - (k + 1))[counts.size - (k + 1)]
    c = counts - pivot
    keep = c > 0
    return tokens[keep], c[keep]


def q_heavy_hitters(sf_dir: str, k: int = MG_K) -> pa.Table:
    """Misra-Gries heavy hitters over all document tokens with k
    counters: every token whose true frequency exceeds n/(k+1) is
    guaranteed present, with count underestimated by at most n/(k+1).

    Scale shape: each batch compresses its exact local counts to k
    counters (one ``np.partition``), the shuffle moves <= k rows per
    batch, partials merge by SUM (mergeability is the point of MG),
    and the final compress sees the merged counter table — bounded by
    k x batches, not the vocabulary.  Counter VALUES depend on batch
    boundaries, so this op is rows-only; its guarantee is value-gated
    by ``q_heavy_hitters_check``."""
    from ray.data.aggregate import Sum

    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, _parent, _n = _tokens_flat(t["text"])
        g = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
        toks = np.asarray(g["token"].to_pylist(), dtype=object)
        cnts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, cnts = _mg_compress(toks, cnts, k)
        return pa.table(
            {"token": pa.array(list(toks), type=pa.string()),
             "c": pa.array(cnts, type=pa.int64())}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    toks = merged["token"].to_numpy(dtype=object)
    cnts = merged["c"].to_numpy(dtype=np.int64)
    toks, cnts = _mg_compress(toks, cnts, k)
    order = np.lexsort((toks, -cnts))
    return pa.table(
        {
            "token": pa.array(list(toks[order]), type=pa.string()),
            "est": pa.array(cnts[order], type=pa.int64()),
        }
    )


def q_heavy_hitters_check(sf_dir: str, k: int = MG_K) -> pa.Table:
    """Value-oracled guarantee gate for the MG sketch: computes the
    EXACT counts of all tokens with freq > n/(k+1) (the heavy set) and
    asserts each is present in the sketch with estimate within
    n/(k+1) of exact.  The SQL oracle recomputes the exact heavy set
    and asserts TRUE — a sketch violating its bound hash-mismatches."""
    from ray.data.aggregate import Sum

    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        flat, _parent, _n = _tokens_flat(t["text"])
        g = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "c"])

    exact = (
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n = int(exact["c"].sum())
    thr = n / (k + 1.0)
    heavy = exact[exact["c"] > thr].sort_values("token").reset_index(drop=True)

    sk = q_heavy_hitters(sf_dir, k=k).to_pandas().set_index("token")["est"]
    est = heavy["token"].map(sk)
    ok = est.notna() & ((heavy["c"] - est.fillna(0)) <= thr)
    return pa.table(
        {
            "token": pa.array(heavy["token"], type=pa.string()),
            "n_exact": pa.array(heavy["c"].astype("int64")),
            "est_ok": pa.array(ok.astype(bool)),
        }
    )


Q_HEAVY_HITTERS_CHECK_SQL = r"""
WITH toks AS (
  SELECT UNNEST(list_filter(regexp_split_to_array(trim(text), '\s+'),
                t -> t <> '')) AS token
  FROM documents
), c AS (
  SELECT token, COUNT(*) AS n_exact FROM toks GROUP BY token
)
SELECT token, CAST(n_exact AS BIGINT) AS n_exact, TRUE AS est_ok
FROM c
WHERE n_exact > (SELECT COUNT(*) FROM toks) / 29.0
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct count (fixed-size register sketch)
# ---------------------------------------------------------------------------

def q_hll_distinct_users(sf_dir: str, p: int = HLL_P) -> ray.data.Dataset:
    """HyperLogLog approximate distinct users per event_type — the
    constant-memory alternative to KMV: one 2^p-byte register array per
    (type, batch), merged by elementwise max (order-independent, so the
    estimate is deterministic for a given corpus regardless of batch
    boundaries).  Rows-only oracle; the accuracy bound is gated by
    ``q_hll_check`` and pytest."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        etypes, regs = [], []
        for etype, grp in df.groupby("event_type", sort=True):
            h = _hash_ids(grp["user_id"].to_numpy())
            etypes.append(etype)
            regs.append(hll_from_hashes(h, p).tobytes())
        return pa.table(
            {
                "event_type": pa.array(etypes, type=pa.string()),
                "registers": pa.array(regs, type=pa.large_binary()),
            }
        )

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pa.Table:
        etypes, ests = [], []
        for etype, grp in g.groupby("event_type", sort=True):
            merged = hll_merge(
                [np.frombuffer(r, dtype=np.uint8) for r in grp["registers"]]
            )
            etypes.append(etype)
            ests.append(round(hll_estimate(merged, p), 2))
        return pa.table(
            {
                "event_type": pa.array(etypes, type=pa.string()),
                "hll_users": pa.array(ests, type=pa.float64()),
            }
        )

    return sketches.groupby("event_type").map_groups(merge, batch_format="pandas")


def q_hll_check(sf_dir: str, p: int = HLL_P, tolerance: float = 0.1) -> pa.Table:
    """Value-oracled accuracy gate for the HLL sketch (same contract as
    ``q_approx_distinct_check``): exact count + ``est_ok`` asserting the
    estimate sits within ``tolerance`` (2048 registers -> sigma ~2.3 %,
    so 10 % is a 4-sigma bound)."""
    exact = q_distinct_users_exact(sf_dir).to_pandas()
    approx = q_hll_distinct_users(sf_dir, p=p).to_pandas()
    m = exact.merge(approx, on="event_type", how="outer")
    est_ok = ((m["hll_users"] / m["n_users"] - 1.0).abs() <= tolerance).fillna(False)
    return pa.table(
        {
            "event_type": pa.array(m["event_type"], type=pa.string()),
            "n_users": pa.array(m["n_users"].astype("int64")),
            "est_ok": pa.array(est_ok.astype(bool)),
        }
    )


Q_HLL_CHECK_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, TRUE AS est_ok
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimation with one-sided error
# ---------------------------------------------------------------------------

CMS_WIDTH = 2048
CMS_DEPTH = 4
_CMS_SALTS = (0x9E37, 0xC2B2, 0x1657, 0x27D4)  # one odd-ish salt per row


def _cms_hash(tokens_h: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row-salted splitmix-style rehash of pre-hashed token ids."""
    with np.errstate(over="ignore"):
        x = tokens_h * np.uint64(2 * _CMS_SALTS[row] + 1)
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(32)
    return (x % np.uint64(width)).astype(np.int64)


def q_cms_token_counts(
    sf_dir: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> pa.Table:
    """Count-Min point estimates for every distinct document token: a
    depth x width counter matrix per batch, merged by elementwise SUM
    (linear sketch — merge order can never change the result), queried
    with min-over-rows.

    Scale shape: each batch ships one fixed-size (depth·width int64)
    matrix regardless of row count; the vocabulary query at the end
    reads the merged matrix once.  Estimates are one-sided
    (est >= true always); the bound is value-gated by ``q_cms_check``.
    Rows-only: counter values depend on nothing but the corpus (linear
    sketch), but the ESTIMATES are not SQL-expressible."""
    import ray

    from ..functions.text import stable_hash64
    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["text"])

    def sketch(t: pa.Table) -> pa.Table:
        flat, _, _ = _tokens_flat(t["text"])
        h = stable_hash64(flat)
        mat = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            np.add.at(mat[r], _cms_hash(h, r, width), 1)
        return pa.table({"cms": pa.array([mat.tobytes()], type=pa.large_binary())})

    blocks = ray.get(
        [
            ref
            for bundle in ds.map_batches(
                sketch, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
            .iter_internal_ref_bundles()
            for ref in bundle.block_refs
        ]
    )
    mat = np.zeros((depth, width), dtype=np.int64)
    for b in blocks:
        if b.num_rows and "cms" in b.column_names:
            for raw in b["cms"].to_pylist():
                mat += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)

    # vocabulary to query: exact distinct tokens (tiny here; at web
    # scale the CMS answers point queries without any vocabulary scan)
    def distinct_tokens(t: pa.Table) -> pa.Table:
        flat, _, _ = _tokens_flat(t["text"])
        return pa.table({"token": pc.unique(flat)})

    vocab = (
        ds.map_batches(distinct_tokens, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()["token"]
        .sort_values()
        .to_numpy()
    )
    th = stable_hash64(pa.array(vocab.tolist(), type=pa.string()))
    ests = np.min(
        np.stack([mat[r][_cms_hash(th, r, width)] for r in range(depth)]), axis=0
    )
    return pa.table(
        {
            "token": pa.array(vocab, type=pa.string()),
            "cms_count": pa.array(ests.astype(np.int64)),
        }
    )


def q_cms_check(
    sf_dir: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> pa.Table:
    """Value-oracled gate for the CMS: per token, the exact count (SQL
    recomputes it) plus ``one_sided`` (est >= exact, a DETERMINISTIC CMS
    property) and ``bounded`` (est <= exact + 2·N/width in every row —
    Markov gives P(excess > 2N/width) <= 1/2 per row, so the min over
    ``depth`` independent rows exceeds it with p <= 2^-depth per
    token)."""
    est = q_cms_token_counts(sf_dir, width=width, depth=depth).to_pandas()
    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        toks, _, _ = _tokens_flat(t["text"])
        flat = pa.table({"token": toks})
        g = flat.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    m = exact.merge(est, on="token", how="outer").fillna(0)
    total = int(m["n"].sum())
    slack = 2.0 * total / width
    one_sided = (m["cms_count"] >= m["n"]).all()
    bounded = (m["cms_count"] <= m["n"] + slack).all()
    return pa.table(
        {
            "token": pa.array(m["token"].sort_values(), type=pa.string()),
            "n": pa.array(
                m.sort_values("token")["n"].astype("int64").to_numpy()
            ),
            "one_sided": pa.array([bool(one_sided)] * len(m), type=pa.bool_()),
            "bounded": pa.array([bool(bounded)] * len(m), type=pa.bool_()),
        }
    )


Q_CMS_CHECK_SQL = r"""
WITH tok AS (
  SELECT UNNEST(regexp_split_to_array(trim(text, ' '), '\s+')) AS token
  FROM documents WHERE length(trim(text, ' ')) > 0
)
SELECT token, COUNT(*) AS n, TRUE AS one_sided, TRUE AS bounded
FROM tok WHERE token <> '' GROUP BY token
"""


# ---------------------------------------------------------------------------
# HLL set algebra: cross-segment audience overlap via inclusion-exclusion
# ---------------------------------------------------------------------------

def _hll_per_type(sf_dir: str, p: int) -> dict[str, np.ndarray]:
    """One merged HLL register array per event_type (each is 2^p bytes;
    at any corpus size only |types| x 2^p bytes reach the driver)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        etypes, regs = [], []
        for etype, grp in df.groupby("event_type", sort=True):
            h = _hash_ids(grp["user_id"].to_numpy())
            etypes.append(etype)
            regs.append(hll_from_hashes(h, p).tobytes())
        return pa.table(
            {
                "event_type": pa.array(etypes, type=pa.string()),
                "registers": pa.array(regs, type=pa.large_binary()),
            }
        )

    out: dict[str, np.ndarray] = {}
    for row in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_rows():
        reg = np.frombuffer(row["registers"], dtype=np.uint8)
        et = row["event_type"]
        out[et] = np.maximum(out[et], reg) if et in out else reg
    return out


def q_hll_overlap(sf_dir: str, p: int = HLL_P) -> pa.Table:
    """Audience-overlap matrix from HLL sketch ALGEBRA: for every pair
    of event types, |A∩B| ≈ est(A) + est(B) - est(A∪B), where the union
    sketch is just the elementwise register max — no re-scan per pair,
    the whole matrix costs |types|² register merges on 2^p-byte arrays.
    This is the sketch-composition shape audience/reach systems run at
    10^12 rows (per-pair exact intersections would be a shuffle each).
    Rows-only; accuracy gated by ``q_hll_overlap_check``."""
    sk = _hll_per_type(sf_dir, p)
    types = sorted(sk)
    ta, tb, ia, ib, iu, ii = [], [], [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ea = hll_estimate(sk[a], p)
            eb = hll_estimate(sk[b], p)
            eu = hll_estimate(np.maximum(sk[a], sk[b]), p)
            ta.append(a)
            tb.append(b)
            ia.append(round(ea, 2))
            ib.append(round(eb, 2))
            iu.append(round(eu, 2))
            ii.append(round(max(ea + eb - eu, 0.0), 2))
    return pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "est_a": pa.array(ia, pa.float64()),
            "est_b": pa.array(ib, pa.float64()),
            "est_union": pa.array(iu, pa.float64()),
            "est_overlap": pa.array(ii, pa.float64()),
        }
    )


def q_hll_overlap_check(
    sf_dir: str, type_a: str = "click", type_b: str = "view", p: int = HLL_P
) -> pa.Table:
    """Value-oracled gate for the sketch algebra: the exact click∩view
    distinct-user count (recomputed by DuckDB INTERSECT) plus a bound
    check — the inclusion-exclusion estimate must land within
    4·1.04/√2^p of exact relative to the audience sizes (union), the
    standard HLL error budget for a 3-term composition."""
    ov = q_hll_overlap(sf_dir, p).to_pandas()
    row = ov[(ov.type_a == type_a) & (ov.type_b == type_b)].iloc[0]

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def flags(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        m = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        t2 = t.filter(m)
        df = t2.to_pandas()
        g = df.groupby("user_id")["event_type"].agg(
            a=lambda s: bool((s == type_a).any()),
            b=lambda s: bool((s == type_b).any()),
        )
        return pa.table(
            {
                "user_id": pa.array(g.index.to_numpy(), pa.int64()),
                "has_a": pa.array(g["a"].to_numpy().astype(np.int64)),
                "has_b": pa.array(g["b"].to_numpy().astype(np.int64)),
            }
        )

    from ray.data.aggregate import Max

    agg = (
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Max("has_a", alias_name="a"), Max("has_b", alias_name="b"))
    )

    def count_both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64())})
        both = pc.and_(pc.equal(t["a"], 1), pc.equal(t["b"], 1))
        return pa.table({"n": pa.array([int(pc.sum(pc.cast(both, pa.int64())).as_py() or 0)], pa.int64())})

    exact = sum(r["n"] for r in agg.map_batches(count_both, batch_format="pyarrow").take_all())
    tol = 4 * 1.04 / np.sqrt(2**p) * max(float(row["est_union"]), 1.0)
    ok = abs(float(row["est_overlap"]) - exact) <= tol
    return pa.table(
        {
            "type_a": pa.array([type_a], pa.string()),
            "type_b": pa.array([type_b], pa.string()),
            "exact_overlap": pa.array([int(exact)], pa.int64()),
            "within_bound": pa.array([bool(ok)], pa.bool_()),
        }
    )


Q_HLL_OVERLAP_CHECK_SQL = """
SELECT 'click' AS type_a, 'view' AS type_b,
       CAST(COUNT(*) AS BIGINT) AS exact_overlap,
       TRUE AS within_bound
FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'view'
)
"""


def q_salted_distinct_users(sf_dir: str, salts: int = 16) -> ray.data.Dataset:
    """COUNT(DISTINCT user_id) per event_type via HOT-KEY SALTING — the
    exact-result skew treatment the two-level pair shuffle can't give
    you when ONE key owns most of the corpus: the shuffle key is
    ``(event_type, splitmix64(user_id) % salts)``, so a hot type's
    distinct-resolution work spreads over ``salts`` reducers instead of
    one.  Correctness is unconditional: a given user always lands in
    the same salt shard, shards are disjoint, so per-shard distinct
    counts SUM to the per-type distinct count.  Stage 1 also dedups
    (type, user) locally per batch, so repeat visits never leave their
    batch.  Same SQL oracle as the unsalted variant — the salted plan
    must be indistinguishable by value."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def local(t: pa.Table) -> pa.Table:
        d = t.group_by(["event_type", "user_id"]).aggregate([])
        uid = d["user_id"].to_numpy(zero_copy_only=False)
        salt = (_hash_ids(uid) % np.uint64(salts)).astype(np.int64)
        return pa.table(
            {
                "event_type": d["event_type"],
                "salt": pa.array(salt),
                "user_id": d["user_id"],
            }
        )

    from ray.data.aggregate import Sum

    shard = (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "salt", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby(["event_type", "salt"])
        .aggregate(Count(alias_name="n_shard"))
    )
    agg = shard.groupby("event_type").aggregate(
        Sum("n_shard", alias_name="n_users")
    )

    out_schema = pa.schema([("event_type", pa.string()), ("n_users", pa.int64())])

    def pin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return out_schema.empty_table()
        return pa.table(
            {"event_type": t["event_type"],
             "n_users": pc.cast(t["n_users"], pa.int64())},
            schema=out_schema,
        )

    return agg.map_batches(pin, batch_format="pyarrow")


Q_SALTED_DISTINCT_SQL = Q_DISTINCT_USERS_SQL


# ---------------------------------------------------------------------------
# Mergeable quantile summary (deterministic thinned eps-summary) + gate
# ---------------------------------------------------------------------------

_AQ_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _quantile_summary(sf_dir: str, eps: float):
    """One streaming pass over ``lineitem.l_extendedprice``: each block
    sorts locally and keeps every k-th value (k = eps * block_rows) as
    a weight-k representative plus a weighted tail max — the classic
    deterministic mergeable eps-approximation (Munro-Paterson family).
    Rank error contributed by a block is < k <= eps * block_rows, so
    the union's error is < eps * n regardless of block count, and the
    summary is ~1/eps rows per block (the ONLY data the driver sees)."""

    def thin(t: pa.Table) -> pa.Table:
        v = np.sort(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        n = v.size
        k = max(1, int(eps * n))
        idx = np.arange(k - 1, n, k)
        reps = v[idx]
        w = np.full(idx.size, k, np.int64)
        rem = n - idx.size * k
        if rem:
            reps = np.append(reps, v[-1])
            w = np.append(w, rem)
        return pa.table({"v": pa.array(reps, pa.float64()), "w": pa.array(w)})

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    summ = ds.map_batches(thin, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((summ["w"].to_numpy(), summ["v"].to_numpy()))
    v = summ["v"].to_numpy()[order]
    cum = np.cumsum(summ["w"].to_numpy()[order])
    n = int(cum[-1]) if cum.size else 0
    return v, cum, n


def q_approx_quantiles(sf_dir: str, eps: float = 0.02) -> pa.Table:
    """Approximate quantiles of ``l_extendedprice`` from the mergeable
    thinned summary (rows-only: the estimates are data values whose
    exact ranks are asserted by ``q_approx_quantiles_check``)."""
    v, cum, n = _quantile_summary(sf_dir, eps)
    ests = []
    for q in _AQ_QS:
        target = max(1, int(np.ceil(q * n)))
        i = min(int(np.searchsorted(cum, target)), v.size - 1)
        ests.append(float(v[i]))
    return pa.table(
        {
            "q": pa.array(list(_AQ_QS), pa.float64()),
            "est": pa.array(ests, pa.float64()),
        }
    )


def q_approx_quantiles_check(
    sf_dir: str, eps: float = 0.02, tolerance: float = 0.05
) -> pa.Table:
    """Accuracy gate: for each estimate v_q, one exact streaming rank
    pass computes ``count(< v_q)`` / ``count(<= v_q)`` (per-block
    partial sums, no shuffle) and asserts the true rank interval
    intersects ``q*n ± tolerance*n`` — the bound the eps-summary
    provably satisfies (eps + one max-weight step < tolerance).  The
    SQL oracle recomputes n_rows exactly and asserts TRUE."""
    est = q_approx_quantiles(sf_dir, eps=eps).to_pandas()
    vals = est["est"].to_numpy()

    def rank_partial(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        lt = (x[:, None] < vals[None, :]).sum(axis=0).astype(np.int64)
        le = (x[:, None] <= vals[None, :]).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "q": pa.array(list(_AQ_QS), pa.float64()),
                "lt": pa.array(lt),
                "le": pa.array(le),
                "n": pa.array(np.full(len(_AQ_QS), x.size, np.int64)),
            }
        )

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(rank_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("q")
        .aggregate(Sum("lt", alias_name="lt"), Sum("le", alias_name="le"),
                   Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("q")
    )
    n = agg["n"].to_numpy()
    lo = agg["q"].to_numpy() * n - tolerance * n
    hi = agg["q"].to_numpy() * n + tolerance * n
    ok = (agg["le"].to_numpy() >= lo) & (agg["lt"].to_numpy() <= hi)
    return pa.table(
        {
            "q": pa.array(agg["q"].to_numpy(), pa.float64()),
            "n_rows": pa.array(n.astype(np.int64)),
            "rank_ok": pa.array(ok),
        }
    )


Q_APPROX_QUANTILES_CHECK_SQL = """
SELECT q, (SELECT COUNT(*) FROM lineitem) AS n_rows, TRUE AS rank_ok
FROM (SELECT UNNEST([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
ORDER BY q
"""
