"""Scalar-function suites — per-row string and temporal kernels,
vectorized Arrow on the Ray side and bit-identical ANSI SQL on the
DuckDB side (the §2.8 scalar-function surface, widened beyond what the
reference itself uses).

Parity notes (each is a real cross-engine trap):

- ``strpos`` is 1-based with 0 for absent; Arrow ``find_substring`` is
  0-based with -1 for absent — ``+1`` maps one onto the other exactly,
  including the absent case;
- ``substr(s, i, n)`` is 1-based; Arrow ``utf8_slice_codeunits`` is
  0-based half-open;
- the corpus' name columns are ASCII, so upper/lower/reverse agree
  without locale concerns (DuckDB upper() is not locale-aware either).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.readers import read_table
from .relational import _cents


def q_string_functions(sf_dir: str) -> ray.data.Dataset:
    """Per-row string-function battery over customer names."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        name = t["c_name"]
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "upper_name": pc.utf8_upper(name),
                "lower_name": pc.utf8_lower(name),
                "name_part": pc.utf8_slice_codeunits(name, start=9, stop=15),
                "no_zeros": pc.replace_substring(name, "0", ""),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "hash_pos": pc.cast(
                    pc.add(pc.find_substring(name, "#"), 1), pa.int64()
                ),
                "reversed_name": pc.utf8_reverse(name),
                "tagged": pc.binary_join_element_wise(
                    name, t["c_mktsegment"], "-"
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


Q_STRING_SQL = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_name) AS lower_name,
       substr(c_name, 10, 6) AS name_part,
       replace(c_name, '0', '') AS no_zeros,
       length(c_name) AS name_len,
       strpos(c_name, '#') AS hash_pos,
       reverse(c_name) AS reversed_name,
       c_name || '-' || c_mktsegment AS tagged
FROM customer
"""


def q_monthly_order_stats(sf_dir: str) -> ray.data.Dataset:
    """Temporal bucketing: per (year, month) order count, revenue and
    date range — date_part extraction + integer-cents sums, partial
    aggregation before the (small) shuffle."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "mo": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
                "price_c": _cents(t["o_totalprice"]),
                "d": t["o_orderdate"],
            }
        )
        return tmp.group_by(["yr", "mo"]).aggregate(
            [("price_c", "sum"), ("price_c", "count"), ("d", "min"), ("d", "max")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        partials.repartition(1)
        .groupby(["yr", "mo"])
        .aggregate(
            Sum("price_c_sum", alias_name="s"),
            Sum("price_c_count", alias_name="n_orders"),
            Min("d_min", alias_name="first_order"),
            Max("d_max", alias_name="last_order"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": t["yr"],
                "mo": t["mo"],
                "n_orders": t["n_orders"],
                "revenue": pc.divide(pc.cast(t["s"], pa.float64()), 100.0),
                "first_order": t["first_order"],
                "last_order": t["last_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_MONTHLY_SQL = """
SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
       CAST(date_part('month', o_orderdate) AS BIGINT) AS mo,
       COUNT(*) AS n_orders,
       SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders GROUP BY 1, 2
"""


def q_hash_sample(sf_dir: str, pct: int = 5) -> ray.data.Dataset:
    """Deterministic hash-based Bernoulli sample of documents (~pct%):
    keep rows where the codepoint-Horner hash of the doc id lands in the
    first ``pct`` buckets of 100.  Unlike random sampling this is
    reproducible across engines, so the oracle is exact — the 100-TB
    sampling primitive (per-shard, no coordination, no materialized
    randomness)."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.string())
        h = fingerprint64(ids)
        import numpy as np

        return t.filter(pa.array((h % np.uint64(100)) < pct))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


Q_HASH_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(range(1, length(CAST(doc_id AS VARCHAR))+1),
                         i -> unicode((CAST(doc_id AS VARCHAR))[i]))),
          (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) % 100 < 5
"""


STRATA_PCT = {"en": 2, "de": 10, "fr": 10, "es": 25, "zh": 25}  # % per lang


def q_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic STRATIFIED sample: each language keeps a different
    hash-bucket fraction (downsample the dominant stratum, keep more of
    the rare ones — the class-rebalancing primitive for training-data
    curation).  Same shard-local zero-coordination shape as
    q_hash_sample; unknown languages keep 5%."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        h = fingerprint64(pc.cast(t["doc_id"], pa.string())) % np.uint64(100)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        cut = np.full(len(t), 5, dtype=np.uint64)
        for lang, pct in STRATA_PCT.items():
            cut[langs == lang] = pct
        return t.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


Q_STRATIFIED_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(range(1, length(CAST(doc_id AS VARCHAR))+1),
                         i -> unicode((CAST(doc_id AS VARCHAR))[i]))),
          (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) % 100
      < CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 10 WHEN 'fr' THEN 10
                  WHEN 'es' THEN 25 WHEN 'zh' THEN 25 ELSE 5 END
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis, deterministic)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 5
_U53 = 9007199254740992  # 2^53: largest power of two exact in a double


def q_weighted_sample(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> ray.data.Dataset:
    """Top-``k`` docs per language, sampled WITHOUT replacement with
    probability proportional to ``n_chars`` (Efraimidis-Spirakis
    A-ES: rank by ``ln(u) / w`` descending, u a deterministic
    per-doc uniform) — the quality/length-weighted curation sampler.

    Deterministic u = (horner_hash(doc_id) % 2^53 + 1) / (2^53 + 1):
    exact in a double on both engines, so numpy and DuckDB compute
    bit-identical keys (same libm ``log``) and the selected SET is
    value-oracle-able, not just its size.  Scale shape: each batch
    keeps only its local top-k per lang (vectorized run-position
    filter), so the final per-lang reduce sees k rows per (lang,
    batch) — the classic distributed-top-k funnel, no global sort."""
    import numpy as np

    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def _keyed_topk(t: pa.Table) -> pa.Table:
        h = fingerprint64(pc.cast(t["doc_id"], pa.string()))
        u = ((h % np.uint64(_U53)) + np.uint64(1)).astype(np.float64) / float(_U53 + 1)
        w = np.maximum(
            t["n_chars"].to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        key = np.log(u) / w
        lang = t["lang"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -key, lang))
        l_sorted = lang[order]
        starts = np.concatenate([[True], l_sorted[1:] != l_sorted[:-1]])
        run_start = np.maximum.accumulate(np.where(starts, np.arange(len(order)), 0))
        rank = np.arange(len(order)) - run_start
        keep = order[rank < k]
        return pa.table(
            {
                "lang": t["lang"].take(pa.array(keep)),
                "doc_id": pc.cast(t["doc_id"], pa.int64()).take(pa.array(keep)),
                "n_chars": pc.cast(t["n_chars"], pa.int64()).take(pa.array(keep)),
            }
        )

    local = ds.map_batches(_keyed_topk, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [("lang", pa.string()), ("doc_id", pa.int64()), ("n_chars", pa.int64())]
    )

    def final_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "lang" not in g.column_names:
            return out_schema.empty_table()
        return _keyed_topk(g.combine_chunks()).cast(out_schema)

    return local.groupby("lang").map_groups(final_topk, batch_format="pyarrow")


Q_WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ln(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
              list_transform(range(1, length(CAST(doc_id AS VARCHAR))+1),
                             i -> unicode((CAST(doc_id AS VARCHAR))[i]))),
              (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
            % 9007199254740992 + 1 AS DOUBLE) / 9007199254740993.0)
         / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS key
  FROM documents
)
SELECT lang, doc_id, n_chars FROM keyed
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) <= 5
"""


SPLIT_BUCKETS = (80, 90)  # train < 80 <= val < 90 <= test (of 100)


def q_train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test assignment (80/10/10) by Horner-hash
    bucket of the doc id — the dataset-split primitive for training-data
    curation.  Shard-local, zero-coordination, reproducible across
    engines and runs (re-running over a grown corpus never reassigns an
    existing doc), and stratification composes by hashing (key, salt).
    """
    import numpy as np

    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    lo, hi = SPLIT_BUCKETS

    def assign(t: pa.Table) -> pa.Table:
        h = fingerprint64(pc.cast(t["doc_id"], pa.string())) % np.uint64(100)
        split = np.where(h < lo, "train", np.where(h < hi, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


Q_SPLIT_SQL = """
WITH h AS (
  SELECT doc_id, lang, source,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(1, length(CAST(doc_id AS VARCHAR))+1),
                            i -> unicode((CAST(doc_id AS VARCHAR))[i]))),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) % 100
           AS bucket
  FROM documents
)
SELECT doc_id, lang, source,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""
