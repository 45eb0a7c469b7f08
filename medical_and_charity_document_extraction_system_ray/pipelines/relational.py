"""Relational operator suite over the generic benchmark tables.

These pipelines exercise the engine's core operator set (filter /
project / aggregate / join / sort / limit / distinct / union) in
Ray-Data-first form and each has a DuckDB oracle in
``__ray_entry__.oracle_sql`` — names and value semantics match
bit-for-bit:

- money aggregates are computed on **integer cents** (``floor(x*100 +
  0.5)``) so sums are order-independent and identical in both engines
  (double summation order differs between Ray partials and DuckDB);
- computed ratios are floored to a 1e-6 grid (see functions.text);
- top-k orders carry a unique tie-break key.

Scale notes: every aggregate pre-combines inside ``map_batches`` (one
partial row per key per batch) before the ``groupby`` shuffle;
small-side joins broadcast a python set/dict via ``ray.put`` instead of
shuffling the big side; the one large-large join uses the
hash-partitioned ``Dataset.join``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.cluster import join_partitions
from ..sources.readers import read_table


def _cents(col) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — matches SQL CAST(FLOOR(x*100 + 0.5) AS BIGINT)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter + partial agg + groupby
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Grouped pricing summary over lineitem (TPC-H Q1 shape).

    Partial aggregation inside map_batches (one row per key per batch),
    then a small groupby over partials — the shuffle moves O(keys x
    blocks) rows, not O(rows).
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"), type=pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty_c = _cents(t["l_quantity"])
        price_c = _cents(t["l_extendedprice"])
        disc_pct = _cents(t["l_discount"])  # discount in basis points /100... 0.04 -> 4
        rev_e4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        tmp = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "rev_e4": rev_e4,
            }
        )
        g = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("rev_e4", "sum"), ("qty_c", "count")]
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # <=8 final groups: single-partition merge (the per-batch partials
    # already did the heavy reduction) — also keeps every aggregate
    # output partition non-empty, so no schema-less empty blocks
    partials = partials.repartition(1)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c_sum", alias_name="s_qty"),
        Sum("price_c_sum", alias_name="s_price"),
        Sum("rev_e4_sum", alias_name="s_rev"),
        Sum("qty_c_count", alias_name="count_order"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(t["s_qty"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(pc.cast(t["s_price"], pa.float64()), 100.0),
                "sum_disc_price": pc.divide(pc.cast(t["s_rev"], pa.float64()), 10000.0),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q6-style scalar aggregate with read-time predicate pushdown
# ---------------------------------------------------------------------------

def q6_revenue_forecast(sf_dir: str) -> ray.data.Dataset:
    """Scalar revenue over a tight filter; predicate applied at the
    parquet read (row-group pushdown) and columns pruned."""
    flt = (
        (pc.field("l_shipdate") >= pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us")))
        & (pc.field("l_shipdate") < pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us")))
        & (pc.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=flt,
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_pct = _cents(t["l_discount"])
        m = pc.and_(pc.greater_equal(disc_pct, 5), pc.less_equal(disc_pct, 7))
        t2 = t.filter(m)
        rev_e4 = pc.multiply(_cents(t2["l_extendedprice"]), pc.cast(_cents(t2["l_discount"]), pa.int64()))
        return pa.table({"rev_e4": pa.array([pc.sum(rev_e4).as_py() or 0], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(None).aggregate(Sum("rev_e4", alias_name="s"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"revenue": pc.divide(pc.cast(t["s"], pa.float64()), 10000.0)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q6_SQL = """
SELECT SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24
  AND CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
"""


# ---------------------------------------------------------------------------
# Broadcast semi-join: small dimension side shipped once via ray.put
# ---------------------------------------------------------------------------

def q3_priority_counts(sf_dir: str) -> ray.data.Dataset:
    """Orders of BUILDING-segment customers, counted by priority.

    The customer side is tiny (dimension table): materialize the key
    set once on the driver, ``ray.put`` it, and filter orders inside
    map_batches — a broadcast semi-join, no shuffle of the fact table.
    """
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def batch_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["c_mktsegment"], "BUILDING")
        return pa.table(
            {"c_custkey": pc.cast(pc.unique(t.filter(m)["c_custkey"]), pa.int64())}
        )

    # per-batch distinct in the tasks, numpy union on the driver — no
    # python set of per-row values crosses the boundary
    parts = [
        b["c_custkey"].to_numpy(zero_copy_only=False)
        for b in cust.map_batches(
            batch_keys, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    keys_ref = ray.put(
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )

    def partial(t: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), wanted)
        t2 = t.filter(pa.array(mask))
        return pa.table(
            {"o_orderpriority": t2["o_orderpriority"]}
        ).group_by("o_orderpriority").aggregate([([], "count_all")])

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    partials = orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("o_orderpriority").aggregate(
        Sum("count_all", alias_name="order_count")
    )


Q3_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Large-large hash join via Dataset.join
# ---------------------------------------------------------------------------

def q_join_brand_revenue(sf_dir: str) -> ray.data.Dataset:
    """lineitem x part hash-partitioned join, revenue by brand.

    The fact side is pre-aggregated per batch to one row per (batch,
    part key) BEFORE the join — the aggregate-pushdown-below-join
    shape.  The per-batch partial alone shrinks the join input ~20x;
    a full pre-join groupby would shrink it further but costs an extra
    all-to-all that measures slower than letting the post-join
    groupby(p_brand) absorb the duplicates."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev_e4 = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        return pa.table(
            {"l_partkey": t["l_partkey"], "rev_e4": rev_e4}
        ).group_by("l_partkey").aggregate([("rev_e4", "sum")])

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = li.join(
        part, join_type="inner", num_partitions=join_partitions(),
        on=("l_partkey",), right_on=("p_partkey",),
    )
    agg = joined.groupby("p_brand").aggregate(Sum("rev_e4_sum", alias_name="s"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "revenue": pc.divide(pc.cast(t["s"], pa.float64()), 10000.0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_JOIN_SQL = """
SELECT p_brand,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Sort / top-k, distinct, union
# ---------------------------------------------------------------------------

def q_top_customers(sf_dir: str) -> ray.data.Dataset:
    """Top 10 customers by balance (unique tie-break on custkey)."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(10)


Q_TOPK_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


def q_distinct_flags(sf_dir: str) -> ray.data.Dataset:
    """Distinct (returnflag, linestatus) pairs — per-batch dedup then a
    tiny groupby (never shuffles full rows)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate([])

    ds = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="_n")
    ).select_columns(["l_returnflag", "l_linestatus"])


Q_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_union_nation_counts(sf_dir: str) -> ray.data.Dataset:
    """Union of customer+supplier nation keys, counted per nation."""
    cust = read_table(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": t["c_nationkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    supp = read_table(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": t["s_nationkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return cust.union(supp).groupby("nationkey").aggregate(Count(alias_name="n"))


Q_UNION_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
"""


# ---------------------------------------------------------------------------
# Group-concatenate: the PDF-merge analog (SURVEY.md §2.6 merge_pdfs)
# ---------------------------------------------------------------------------

_MERGE_PAGE_CHARS = 200  # page model shared with sources/derive.py


def q_merge_documents(sf_dir: str) -> ray.data.Dataset:
    """N documents -> one merged text per source, pages joined in
    doc_id order — the engine analog of the reference's merge_pdfs
    (pdf_service.py:23-85) INCLUDING its skip semantics: unreadable
    inputs (here: empty text, the missing/encrypted-PDF analog) are
    skipped and counted, and merged page totals are reported
    (insert_pdf page accounting)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def merge(t: pa.Table) -> pa.Table:
        t = t.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        src = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        pages = -(-lens // _MERGE_PAGE_CHARS)  # ceil; 0 for empty text
        ids = np.asarray(src, dtype=object)
        bounds = np.nonzero(ids[1:] != ids[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ids)]])
        out_src, n_docs, n_merged, n_skipped, total_pages, merged = (
            [], [], [], [], [], []
        )
        for s, e in zip(starts, ends):
            keep = [i for i in range(s, e) if lens[i] > 0]
            out_src.append(src[s])
            n_docs.append(int(e - s))
            n_merged.append(len(keep))
            n_skipped.append(int(e - s) - len(keep))
            total_pages.append(int(pages[keep].sum()) if keep else 0)
            merged.append("\n\n".join(texts[i] for i in keep))
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "n_docs": pa.array(n_docs, type=pa.int64()),
                "n_merged": pa.array(n_merged, type=pa.int64()),
                "n_skipped": pa.array(n_skipped, type=pa.int64()),
                "total_pages": pa.array(total_pages, type=pa.int64()),
                "merged_text": pa.array(merged, type=pa.string()),
            }
        )

    return ds.groupby("source").map_groups(merge, batch_format="pyarrow")


Q_MERGE_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE length(text) > 0) AS BIGINT) AS n_merged,
       CAST(COUNT(*) FILTER (WHERE length(text) = 0) AS BIGINT) AS n_skipped,
       CAST(COALESCE(SUM(CAST(CEIL(length(text) / 200.0) AS BIGINT))
                     FILTER (WHERE length(text) > 0), 0) AS BIGINT) AS total_pages,
       COALESCE(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)
                FILTER (WHERE length(text) > 0), '') AS merged_text
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# Exact quantiles (median / p90) per group
# ---------------------------------------------------------------------------

def q_quantity_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-flag median and p90 of quantity.

    Exact quantiles need the full value set per key — a keyed shuffle
    plus per-group numpy; at petabyte scale swap in a mergeable KLL
    sketch computed per batch (same groupby shape, approximate)."""
    import pandas as pd

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": t["l_returnflag"], "qty_c": _cents(t["l_quantity"])}
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)

    def quantiles(g: pd.DataFrame) -> pa.Table:
        flags, ns, meds, p90s = [], [], [], []
        for flag, grp in g.groupby("l_returnflag", sort=True):
            c = grp["qty_c"].to_numpy(dtype=np.float64)
            flags.append(flag)
            ns.append(len(c))
            meds.append(np.floor(np.median(c) / 100.0 * 1e6 + 1e-3) / 1e6)
            p90s.append(
                np.floor(np.percentile(c, 90, method="linear") / 100.0 * 1e6 + 1e-3)
                / 1e6
            )
        # explicit Arrow schema: empty groups must emit the same schema
        return pa.table(
            {
                "l_returnflag": pa.array(flags, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "median_qty": pa.array(meds, type=pa.float64()),
                "p90_qty": pa.array(p90s, type=pa.float64()),
            }
        )

    return ds.groupby("l_returnflag").map_groups(quantiles, batch_format="pandas")


Q_QUANTILES_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       FLOOR(median(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) / 100.0 * 1000000 + 0.001) / 1000000 AS median_qty,
       FLOOR(quantile_cont(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT), 0.9) / 100.0 * 1000000 + 0.001) / 1000000 AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Anti join: customers with no orders (broadcast NOT-IN)
# ---------------------------------------------------------------------------

def q_customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Anti join via a broadcast key set (ray guide: semi/anti =
    broadcast the key set, filter inside map_batches — no shuffle):
    customers who never produced a 'purchase' event."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def batch_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        return pa.table(
            {"user_id": pc.cast(pc.unique(t.filter(m)["user_id"]), pa.int64())}
        )

    # per-batch distinct in the tasks, numpy union on the driver — no
    # python set of per-row values crosses the boundary
    parts = [
        b["user_id"].to_numpy(zero_copy_only=False)
        for b in ev.map_batches(
            batch_keys, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    keys_ref = ray.put(
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )

    def anti(t: pa.Table) -> pa.Table:
        have = ray.get(keys_ref)
        mask = ~np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), have)
        return t.filter(pa.array(mask))

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cust.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


Q_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c_custkey AND event_type = 'purchase')
"""


# ---------------------------------------------------------------------------
# Grouped top-k: top 2 orders per customer by (totalprice, orderkey)
# ---------------------------------------------------------------------------

def q_top_orders_per_customer(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Per-key top-k (the window row_number() analog): coarse-bucket
    shuffle + ONE lexsort per bucket group + a run-position mask — no
    per-customer python call (see functions/segments.py)."""
    import numpy as np

    from ..functions.segments import bucket_grouped, run_positions, runs

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    topk_schema = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_totalprice", pa.float64()),
        ]
    )

    def topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return topk_schema.empty_table()
        g = g.combine_chunks()
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        price = g["o_totalprice"].to_numpy(zero_copy_only=False)
        # price DESC via exact float negation, orderkey ASC tie-break
        order = np.lexsort((okey, -price, cust))
        cust, okey, price = cust[order], okey[order], price[order]
        starts, _, run_of = runs(cust)
        keep = run_positions(starts, run_of) < k
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep]),
                "o_orderkey": pa.array(okey[keep]),
                "o_totalprice": pa.array(price[keep], type=pa.float64()),
            },
            schema=topk_schema,
        )

    return bucket_grouped(ds, "o_custkey").map_groups(
        topk, batch_format="pyarrow"
    )


Q_TOP_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# ROLLUP / grouping sets (engine-added; reference has no analytics)
# ---------------------------------------------------------------------------

def q_revenue_rollup(sf_dir: str) -> ray.data.Dataset:
    """ROLLUP(l_returnflag, l_linestatus) revenue: detail rows + per-flag
    subtotals + grand total in one result, with SQL GROUPING markers.

    Shape: ONE per-batch partial aggregate at the finest grain, one
    shuffle to merge it, then the coarser levels are re-aggregated from
    the (tiny) detail result — the rollup costs one extra pass over
    <=|groups| rows, never a second scan of the fact table."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "price_c": _cents(t["l_extendedprice"]),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate([("price_c", "sum")])

    detail = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("price_c_sum", alias_name="c"))
    )

    def rollup(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        levels = [df.assign(grouping=0)]
        sub = df.groupby("l_returnflag", as_index=False)["c"].sum()
        sub["l_linestatus"] = None
        sub["grouping"] = 1
        levels.append(sub)
        tot = pd.DataFrame(
            {"l_returnflag": [None], "l_linestatus": [None],
             "c": [df["c"].sum()], "grouping": [3]}
        )
        levels.append(tot)
        allr = pd.concat(levels, ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(allr["l_returnflag"], type=pa.string()),
                "l_linestatus": pa.array(allr["l_linestatus"], type=pa.string()),
                "revenue": pa.array(
                    (allr["c"].astype("int64") / 100.0), type=pa.float64()
                ),
                "grouping": pa.array(allr["grouping"].astype("int64")),
            }
        )

    # detail is tiny (<=|flag x status| rows): the rollup runs in one task
    return detail.repartition(1).map_batches(rollup, batch_format="pyarrow")


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Discrete percentiles (exact order statistics per group)
# ---------------------------------------------------------------------------

def q_price_percentiles_disc(sf_dir: str) -> ray.data.Dataset:
    """percentile_disc(.25/.5/.75) of o_totalprice per order priority —
    exact discrete order statistics (the value AT index ceil(p*n)-1 of
    the sorted group, matching DuckDB quantile_disc)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"], "price_c": _cents(t["o_totalprice"])}
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)

    def pct(g: pa.Table) -> pa.Table:
        tbl = g.combine_chunks()
        prios = tbl["o_orderpriority"].to_numpy(zero_copy_only=False)
        vals = tbl["price_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, prios))
        p_s, v_s = prios[order], vals[order]
        starts = np.nonzero(np.concatenate([[True], p_s[1:] != p_s[:-1]]))[0]
        ends = np.concatenate([starts[1:], [p_s.size]])
        out_p, q25, q50, q75 = [], [], [], []
        for s, e in zip(starts, ends):
            seg = v_s[s:e]
            n = seg.size
            out_p.append(p_s[s])
            # quantile_disc: value at ceil(p*n)-1 (1-based rank ceil(p*n))
            q25.append(seg[max(0, -(-n * 25 // 100) - 1)] / 100.0)
            q50.append(seg[max(0, -(-n * 50 // 100) - 1)] / 100.0)
            q75.append(seg[max(0, -(-n * 75 // 100) - 1)] / 100.0)
        return pa.table(
            {
                "o_orderpriority": pa.array(out_p, type=pa.string()),
                "p25": pa.array(q25, type=pa.float64()),
                "p50": pa.array(q50, type=pa.float64()),
                "p75": pa.array(q75, type=pa.float64()),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(pct, batch_format="pyarrow")


Q_PCT_DISC_SQL = """
SELECT o_orderpriority,
       quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.25) / 100.0 AS p25,
       quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.50) / 100.0 AS p50,
       quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.75) / 100.0 AS p75
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Left-outer join (null-preserving dimension attach)
# ---------------------------------------------------------------------------

def q_customer_nation_left(sf_dir: str) -> ray.data.Dataset:
    """customer LEFT JOIN nation: every customer survives; unmatched
    nation names stay NULL.

    The 25-row dimension is pulled to the driver once, ``ray.put``, and
    attached inside ``map_batches`` with a null-preserving searchsorted
    + take — a broadcast left-attach, no all-to-all of the fact side (a
    ``Dataset.join`` here would hash-shuffle every customer row just to
    co-locate it with one of 25 dimension rows)."""
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nat_tbl = pa.concat_tables(
        nat.iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    keys = nat_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    lookup_ref = ray.put(
        (keys[order], nat_tbl["n_name"].combine_chunks().take(pa.array(order)))
    )

    def attach(t: pa.Table) -> pa.Table:
        ks, names = ray.get(lookup_ref)
        ck = pc.cast(t["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, ck), ks.size - 1)
            hit = ks[pos] == ck
        else:
            pos = np.zeros(ck.size, np.int64)
            hit = np.zeros(ck.size, bool)
        # null index -> null value under take: exactly LEFT JOIN semantics
        idx = pc.if_else(
            pa.array(hit), pa.array(pos, type=pa.int64()), pa.scalar(None, pa.int64())
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pa.array(ck),
                "n_name": names.take(idx),
            }
        )

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return cust.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


Q_LEFT_JOIN_SQL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, n_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation): priorities -> columns per status
# ---------------------------------------------------------------------------

_PRIORITIES = [
    ("1-URGENT", "p1_urgent"),
    ("2-HIGH", "p2_high"),
    ("3-MEDIUM", "p3_medium"),
    ("4-NOT SPECIFIED", "p4_notspec"),
    ("5-LOW", "p5_low"),
]


def q_priority_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot: one row per order status, one count column per priority —
    conditional aggregation done vectorized per batch (boolean cast +
    group_by sum), so the shuffle moves one partial row per (batch,
    status) instead of one per order."""
    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"o_orderstatus": t["o_orderstatus"]}
        for lit, name in _PRIORITIES:
            cols[name] = pc.cast(
                pc.equal(t["o_orderpriority"], lit), pa.int64()
            )
        return (
            pa.table(cols)
            .group_by("o_orderstatus")
            .aggregate([(name, "sum") for _, name in _PRIORITIES])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("o_orderstatus").aggregate(
        *[Sum(f"{name}_sum", alias_name=name) for _, name in _PRIORITIES]
    )
    return agg.map_batches(
        lambda t: t.select(["o_orderstatus"] + [n for _, n in _PRIORITIES]),
        batch_format="pyarrow",
    )


Q_PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_notspec,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Per-group argmax: richest customer per nation
# ---------------------------------------------------------------------------

def q_top_customer_per_nation(sf_dir: str) -> ray.data.Dataset:
    """argmax per group with a deterministic tie-break (max c_acctbal,
    then min c_custkey): per-batch winners first — one candidate row per
    (batch, nation) — then a tiny final groupby resolves across batches.
    The shuffle never moves the full customer table."""
    ds = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        nat = pc.cast(t["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        key = t["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -bal, nat))
        first = np.concatenate([[True], nat[order][1:] != nat[order][:-1]])
        w = order[first]
        return pa.table(
            {
                "c_nationkey": pa.array(nat[w]),
                "top_custkey": pa.array(key[w]),
                "top_acctbal": pa.array(bal[w]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pa.Table) -> pa.Table:
        return partial(
            g.rename_columns(["c_nationkey", "c_custkey", "c_acctbal"])
        ).rename_columns(["c_nationkey", "top_custkey", "top_acctbal"])

    return partials.groupby("c_nationkey").map_groups(final, batch_format="pyarrow")


Q_ARGMAX_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       c_custkey AS top_custkey, c_acctbal AS top_acctbal
FROM customer
QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey) = 1
"""


# ---------------------------------------------------------------------------
# Window-filter: orders above their customer's average order value
# ---------------------------------------------------------------------------

def q_orders_above_cust_avg(sf_dir: str) -> ray.data.Dataset:
    """Orders strictly above their customer's own average total —
    the correlated-subquery / AVG() OVER (PARTITION BY) shape.

    Keyed shuffle on o_custkey, then a vectorized compare inside the
    group.  Exactness: compare on integers (cents * n > total_cents) —
    no float division on either side."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
        ]
    )

    def above_avg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        cents = _cents(g["o_totalprice"]).to_numpy(zero_copy_only=False)
        order = np.argsort(cust, kind="stable")
        c, v = cust[order], cents[order]
        starts = np.nonzero(np.concatenate([[True], c[1:] != c[:-1]]))[0]
        gid = np.cumsum(np.concatenate([[0], (c[1:] != c[:-1]).astype(np.int64)]))
        totals = np.bincount(gid, weights=v).astype(np.int64)
        counts = np.bincount(gid)
        keep_sorted = v * counts[gid] > totals[gid]
        keep = np.zeros(len(g), dtype=bool)
        keep[order] = keep_sorted
        return pa.table(
            {
                "o_orderkey": g["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": g["o_custkey"].filter(pa.array(keep)),
                "o_totalprice": g["o_totalprice"].filter(pa.array(keep)),
            },
            schema=out_schema,
        )

    from ..functions.segments import bucket_grouped

    # the kernel is segment-safe: coarse-bucket the shuffle so the UDF
    # runs once per bucket, not once per customer
    return bucket_grouped(ds, "o_custkey").map_groups(
        above_avg, batch_format="pyarrow"
    )


Q_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WINDOW w AS (PARTITION BY o_custkey)
QUALIFY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) * COUNT(*) OVER w
        > SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER w
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join: fixed-size filter prunes the fact scan
# ---------------------------------------------------------------------------

def _bloom_build(keys: np.ndarray, bits_per_key: int = 16, k: int = 4):
    """Blocked numpy Bloom filter: (bitarray uint64[], mask, k).  Double
    hashing h1 + i*h2 over splitmix64-style mixes — pure vectorized
    construction and probes."""
    m = 1 << max(6, int(np.ceil(np.log2(max(1, keys.size * bits_per_key)))))
    mask = np.uint64(m - 1)
    bits = np.zeros(m // 64, dtype=np.uint64)
    h1, h2 = _bloom_hashes(keys.astype(np.uint64))
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return bits, mask, k


def _bloom_hashes(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        w = x * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(1)
        w = (w ^ (w >> np.uint64(29))) * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (w ^ (w >> np.uint64(32))) | np.uint64(1)
    return h1, h2


def _bloom_probe(bits: np.ndarray, mask: np.uint64, k: int, x: np.ndarray) -> np.ndarray:
    h1, h2 = _bloom_hashes(x.astype(np.uint64))
    out = np.ones(x.size, dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) & mask
            word = bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return out


def q_bloom_brand_revenue(sf_dir: str, brand: str = "Brand#23") -> ray.data.Dataset:
    """Revenue of one brand's parts via a Bloom-prefiltered semi join.

    At 100 TB the dimension key set can be too big to broadcast
    exactly, but its BLOOM FILTER is fixed-size: build it from the
    filtered part keys (per-batch unique partials -> driver), broadcast
    it once, and drop non-matching fact rows BEFORE any shuffle/join.
    False positives are then removed by the exact key check on the
    (already tiny) survivor set, so the result is exact — the oracle is
    the plain inner-join SQL.  The measured prune ratio is carried in
    the plan as the bloom's whole point."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def part_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["p_brand"], brand)
        return pa.table(
            {"p_partkey": pc.cast(pc.unique(t.filter(m)["p_partkey"]), pa.int64())}
        )

    parts = [
        b["p_partkey"].to_numpy(zero_copy_only=False)
        for b in part.map_batches(
            part_keys, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    keys = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    bloom_ref = ray.put(_bloom_build(keys))
    keys_ref = ray.put(keys)  # exact verify set (small after the filter)

    def partial(t: pa.Table) -> pa.Table:
        bits, mask, k = ray.get(bloom_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        cand = _bloom_probe(bits, mask, k, pk)       # fixed-size prune
        surv = t.filter(pa.array(cand))
        spk = surv["l_partkey"].to_numpy(zero_copy_only=False)
        exact = np.isin(spk, ray.get(keys_ref))      # false-positive removal
        surv = surv.filter(pa.array(exact))
        rev_e4 = pc.multiply(
            _cents(surv["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(surv["l_discount"])),
        )
        s = pc.sum(rev_e4).as_py() or 0
        return pa.table(
            {
                "rev_e4": pa.array([s], pa.int64()),
                "n_items": pa.array([len(surv)], pa.int64()),
            }
        )

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )
    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(None).aggregate(
        Sum("rev_e4", alias_name="s"), Sum("n_items", alias_name="n_items")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "revenue": pc.divide(pc.cast(t["s"], pa.float64()), 10000.0),
                "n_items": pc.cast(t["n_items"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q_BLOOM_SQL = """
SELECT SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
"""


# ---------------------------------------------------------------------------
# Two-column cross-moments: covariance + Pearson correlation per group
# ---------------------------------------------------------------------------

def q_price_qty_correlation(sf_dir: str) -> ray.data.Dataset:
    """Population covariance and Pearson r between l_quantity and
    l_extendedprice per return flag — the two-column extension of the
    moments sketch: per-batch partials carry exact integer
    (n, Σx, Σy, Σx², Σy², Σxy) on the cents grid, one tiny groupby
    merges them, floats happen once at the end.  The oracle computes
    the identical expressions from the same sums, so the derived
    doubles hash-match."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = _cents(t["l_quantity"])
        y = _cents(t["l_extendedprice"])
        tmp = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": x,
                "y": y,
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
                "xy": pc.multiply(x, y),
            }
        )
        return tmp.group_by("l_returnflag").aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"),
             ("xy", "sum"), ("x", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("l_returnflag").aggregate(
        Sum("x_sum", alias_name="sx"),
        Sum("y_sum", alias_name="sy"),
        Sum("xx_sum", alias_name="sxx"),
        Sum("yy_sum", alias_name="syy"),
        Sum("xy_sum", alias_name="sxy"),
        Sum("x_count", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        cov = (n * sxy - sx * sy) / (n * n) / 10000.0
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": pc.cast(t["n"], pa.int64()),
                "cov_qty_price": pa.array(np.floor(cov * 1e6) / 1e6),
                "corr_qty_price": pa.array(np.floor(r * 1e6) / 1e6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS sx,
         SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS sy,
         SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)
             * CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS sxx,
         SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
             * CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS syy,
         SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)
             * CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       FLOOR((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * n) / 10000.0 * 1e6) / 1e6 AS cov_qty_price,
       FLOOR((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1e6) / 1e6 AS corr_qty_price
FROM s
"""


def q_revenue_cube(sf_dir: str) -> ray.data.Dataset:
    """CUBE(l_returnflag, l_linestatus) revenue: detail rows plus BOTH
    one-dimension subtotal planes and the grand total, with SQL
    GROUPING markers — the full grouping-sets lattice.

    Same shape as ``q_revenue_rollup`` (one finest-grain partial
    aggregate + one shuffle); all coarser planes re-aggregate the tiny
    detail result, never the fact table."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "price_c": _cents(t["l_extendedprice"]),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate([("price_c", "sum")])

    detail = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("price_c_sum", alias_name="c"))
    )

    def cube(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        levels = [df.assign(grouping=0)]
        by_flag = df.groupby("l_returnflag", as_index=False)["c"].sum()
        by_flag["l_linestatus"] = None
        by_flag["grouping"] = 1  # GROUPING(flag, status): status rolled up
        levels.append(by_flag)
        by_status = df.groupby("l_linestatus", as_index=False)["c"].sum()
        by_status["l_returnflag"] = None
        by_status["grouping"] = 2  # flag rolled up
        levels.append(by_status)
        levels.append(
            pd.DataFrame(
                {"l_returnflag": [None], "l_linestatus": [None],
                 "c": [df["c"].sum()], "grouping": [3]}
            )
        )
        allr = pd.concat(levels, ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(allr["l_returnflag"], type=pa.string()),
                "l_linestatus": pa.array(allr["l_linestatus"], type=pa.string()),
                "revenue": pa.array(
                    (allr["c"].astype("int64") / 100.0), type=pa.float64()
                ),
                "grouping": pa.array(allr["grouping"].astype("int64")),
            }
        )

    return detail.repartition(1).map_batches(cube, batch_format="pyarrow")


Q_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_brand_basket_pairs(sf_dir: str) -> ray.data.Dataset:
    """Market-basket co-occurrence: for every unordered brand pair, in
    how many orders both brands appear — the frequent-itemset input.

    Shape: brand attaches to lineitem via a hash join against the part
    dimension; (order, brand) is deduped per batch (partial) and then
    GLOBALLY via a keyed groupby — a batch-local distinct alone
    over-counts pairs whose duplicates land in different join output
    blocks.  The co-occurrence SELF-join on orderkey (the vectorized
    alternative to a per-order group walk — measured 40x faster here)
    fans out at most basket_size^2 rows per order (<= 7 lineitems in
    this schema); per-batch pair partials keep the final groupby at
    |brands|^2."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "p_brand"]).aggregate([])

    def drop_marker(t: pa.Table) -> pa.Table:
        return t.select(["l_orderkey", "p_brand"])

    ob = (
        li.join(part, join_type="inner", num_partitions=join_partitions(),
                on=("l_partkey",), right_on=("p_partkey",))
        .map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["l_orderkey", "p_brand"]).aggregate(Count(alias_name="_c"))
        .map_batches(drop_marker, batch_format="pyarrow")
        # absorb groupby's empty marker blocks before the Acero join
        .repartition(join_partitions())
        .materialize()
    )

    ob_b = ob.map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "brand_b": t["p_brand"]}
        ),
        batch_format="pyarrow",
    )
    both = ob.join(
        ob_b, join_type="inner", num_partitions=join_partitions(), on=("l_orderkey",)
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["p_brand"], t["brand_b"]))
        return (
            pa.table({"brand_a": t["p_brand"], "brand_b": t["brand_b"]})
            .group_by(["brand_a", "brand_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["brand_a", "brand_b", "n"])
        )

    partials = both.map_batches(pair_counts, batch_format="pyarrow")
    return partials.groupby(["brand_a", "brand_b"]).aggregate(
        Sum("n", alias_name="n_orders")
    )


Q_BASKET_SQL = """
WITH lb AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_orders
FROM lb a JOIN lb b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Grouped ordinary-least-squares regression from exact integer partials
# ---------------------------------------------------------------------------

def q_regr_price_by_brand(sf_dir: str) -> ray.data.Dataset:
    """Per-brand OLS fit of extendedprice (y) on quantity (x): slope and
    intercept — the grouped regr_slope/regr_intercept aggregate.

    Partials are the five exact integer sums (n, Σx, Σy, Σxy, Σx²) in
    cents, pre-reduced per batch so the shuffle moves one row per
    (batch, brand); the float division happens once per brand at
    finalize, with the SQL oracle computing the IDENTICAL expression
    from the same BIGINT sums (bit-equal float64, then a 1e-6 grid as
    belt-and-braces).  Scale note: Σxy of cents×cents grows ~1e15 per
    24k-row group — at 10^12-row groups switch the partial dtype to
    float64 (Kahan) or split the cents scaling."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    joined = li.join(part, join_type="inner", num_partitions=join_partitions(),
                     on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        x = _cents(t["l_quantity"]).to_numpy()
        y = _cents(t["l_extendedprice"]).to_numpy()
        tmp = pa.table(
            {
                "p_brand": t["p_brand"],
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        return tmp.group_by(["p_brand"]).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum"),
             ("sx", "count")]
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("p_brand").aggregate(
        Sum("sx_sum", alias_name="sx"),
        Sum("sy_sum", alias_name="sy"),
        Sum("sxy_sum", alias_name="sxy"),
        Sum("sxx_sum", alias_name="sxx"),
        Sum("sx_count", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n / 100.0  # back to currency units
        grid = lambda v: np.floor(v * 1e6 + 1e-3) / 1e6
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "n": t["n"],
                "slope": pa.array(grid(slope), type=pa.float64()),
                "intercept": pa.array(grid(intercept), type=pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_REGR_SQL = """
WITH s AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sxx
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand
)
SELECT p_brand, n,
       FLOOR(((n*sxy - sx*sy) / CAST(n*sxx - sx*sx AS DOUBLE)) * 1e6 + 1e-3) / 1e6
         AS slope,
       FLOOR((((sy - ((n*sxy - sx*sy) / CAST(n*sxx - sx*sx AS DOUBLE)) * sx) / n)
              / 100.0) * 1e6 + 1e-3) / 1e6 AS intercept
FROM s
"""


# ---------------------------------------------------------------------------
# Set difference: (supplier, part) pairs seen returned but never kept
# ---------------------------------------------------------------------------

def q_brands_returned_not_kept(sf_dir: str) -> ray.data.Dataset:
    """EXCEPT set-op: (suppkey, partkey) pairs that appear on some
    returned lineitem (l_returnflag = 'R') but on NO non-returned one
    — without two scans or an anti-join: per-batch
    (pair, saw_r, saw_other) flag partials, one keyed groupby max,
    then a vectorized filter.  The pair key is sparse (~1-4 lineitems
    each) so the result is non-trivially populated at every scale,
    unlike a brand-level EXCEPT where every brand has both flags."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_partkey", "l_returnflag"]
    )

    def flags(t: pa.Table) -> pa.Table:
        is_r = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        tmp = pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "l_partkey": t["l_partkey"],
                "saw_r": is_r,
                "saw_other": pc.subtract(1, is_r),
            }
        )
        return tmp.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [("saw_r", "max"), ("saw_other", "max")]
        )

    partials = li.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["l_suppkey", "l_partkey"]).aggregate(
        Max("saw_r_max", alias_name="r"), Max("saw_other_max", alias_name="o")
    )

    def only_r(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["r"], 1), pc.equal(t["o"], 0))
        k = t.filter(keep)
        return pa.table({"l_suppkey": k["l_suppkey"], "l_partkey": k["l_partkey"]})

    return agg.map_batches(only_r, batch_format="pyarrow")


Q_EXCEPT_SQL = """
SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT
SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag <> 'R'
"""


# ---------------------------------------------------------------------------
# Full-outer join of two independent aggregates
# ---------------------------------------------------------------------------

def q_nation_side_counts(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join shape: rich-customer count per nation vs
    rich-supplier count per nation, keeping nations that have only one
    side (COALESCE 0).  Both sides pre-aggregate before the join so
    the full-outer exchange moves |nations| rows, not the base tables."""
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    supp = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def cside(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 8000.0))
        return pa.table({"nationkey": pc.cast(t["c_nationkey"], pa.int64())}) \
            .group_by(["nationkey"]).aggregate([([], "count_all")]) \
            .rename_columns(["nationkey", "pc"])

    def sside(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["s_acctbal"], 8000.0))
        return pa.table({"nationkey": pc.cast(t["s_nationkey"], pa.int64())}) \
            .group_by(["nationkey"]).aggregate([([], "count_all")]) \
            .rename_columns(["nationkey", "ps"])

    c = (cust.map_batches(cside, batch_format="pyarrow")
         .groupby("nationkey").aggregate(Sum("pc", alias_name="n_cust"))
         .repartition(2))
    s = (supp.map_batches(sside, batch_format="pyarrow")
         .groupby("nationkey").aggregate(Sum("ps", alias_name="n_supp"))
         .repartition(2))

    j = c.join(s, join_type="full_outer", num_partitions=2, on=("nationkey",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nationkey": t["nationkey"],
                "n_cust": pc.coalesce(t["n_cust"], pa.scalar(0, pa.int64())),
                "n_supp": pc.coalesce(t["n_supp"], pa.scalar(0, pa.int64())),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


Q_FULL_OUTER_SQL = """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust
  FROM customer WHERE c_acctbal > 8000 GROUP BY 1
), s AS (
  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_supp
  FROM supplier WHERE s_acctbal > 8000 GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


# ---------------------------------------------------------------------------
# Grouped mode (most frequent value, deterministic tie-break)
# ---------------------------------------------------------------------------

def q_priority_mode_per_cust(sf_dir: str) -> ray.data.Dataset:
    """MODE() per group: each customer's most frequent order priority
    (ties broken toward the lexicographically smallest priority).
    Per-batch (cust, prio) count partials shrink the shuffle, the
    exact counts resolve in one keyed groupby, and the argmax reuses
    the lexsort-first-row pattern — no per-group python loop."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o_custkey": t["o_custkey"], "prio": t["o_orderpriority"]})
            .group_by(["o_custkey", "prio"]).aggregate([([], "count_all")])
            .rename_columns(["o_custkey", "prio", "n"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_custkey", "prio"]).aggregate(Sum("n", alias_name="n"))
    )

    def argmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("mode_priority", pa.string()),
                    ("n_orders", pa.int64()),
                ]
            ).empty_table()
        t = t.combine_chunks()
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        prio = t["prio"].to_numpy(zero_copy_only=False)
        order = np.lexsort((prio, -n, cust))
        first = np.concatenate([[True], cust[order][1:] != cust[order][:-1]])
        w = order[first]
        return pa.table(
            {
                "o_custkey": pa.array(cust[w]),
                "mode_priority": pa.array(prio[w], type=pa.string()),
                "n_orders": pa.array(n[w]),
            }
        )

    from ..functions.segments import bucket_grouped

    # the argmax only needs all rows of one customer in one group; the
    # kernel is segment-safe, so one coarse-bucket shuffle bounds the
    # per-group python-call count
    return bucket_grouped(counts, "o_custkey").map_groups(
        argmax, batch_format="pyarrow"
    )


Q_MODE_SQL = """
WITH c AS (
  SELECT o_custkey, o_orderpriority AS prio, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, prio AS mode_priority, n AS n_orders
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY n DESC, prio) = 1
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation per group
# ---------------------------------------------------------------------------

def q_nation_rich_names(sf_dir: str) -> ray.data.Dataset:
    """STRING_AGG(... ORDER BY ...) per group: comma-joined names of
    each nation's customers with acctbal > 9900, name-ordered so the
    concatenation is deterministic.  The filter runs before the
    shuffle; the group kernel is one sort + one join per group."""
    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_name", "c_acctbal"])
    filt = ds.filter(expr="c_acctbal > 9900.0")

    def agg(t: pa.Table) -> pa.Table:
        names = sorted(t["c_name"].to_pylist())
        return pa.table(
            {
                "c_nationkey": pa.array([int(t["c_nationkey"][0].as_py())], pa.int64()),
                "names": pa.array([",".join(names)], pa.string()),
                "n": pa.array([len(names)], pa.int64()),
            }
        )

    return filt.groupby("c_nationkey").map_groups(agg, batch_format="pyarrow")


Q_STRING_AGG_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       STRING_AGG(c_name, ',' ORDER BY c_name) AS names,
       COUNT(*) AS n
FROM customer WHERE c_acctbal > 9900.0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Multi-join star query (TPC-H Q5 shape): revenue per region / nation
# ---------------------------------------------------------------------------

def q_regional_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue by (region, nation) of the supplying supplier — the
    4-table star join (lineitem ⨝ supplier ⨝ nation ⨝ region).

    Scale plan: the fact table NEVER joins raw — a per-batch partial
    aggregate by l_suppkey shrinks it to ≤|supplier| rows before the
    one keyed hash join against the supplier dimension (supplier
    scales with the corpus, so it earns a real join); nation and
    region are constant-size and ride along as a driver-built
    broadcast dict attached inside ``map_batches``.  One exchange
    total for a 4-table query."""
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = read_table(sf_dir, "nation").take_all()
    region = read_table(sf_dir, "region").take_all()
    rname = {r["r_regionkey"]: r["r_name"] for r in region}
    nk_arr = pa.array([n["n_nationkey"] for n in nation])
    nname_arr = pa.array([n["n_name"] for n in nation], pa.string())
    rname_arr = pa.array(
        [rname[n["n_regionkey"]] for n in nation], pa.string()
    )

    def partial(t: pa.Table) -> pa.Table:
        ep = _cents(t["l_extendedprice"]).to_numpy()
        disc = _cents(t["l_discount"]).to_numpy()
        return (
            pa.table({"l_suppkey": t["l_suppkey"], "u": ep * (100 - disc)})
            .group_by(["l_suppkey"]).aggregate([("u", "sum")])
            .rename_columns(["l_suppkey", "u"])
        )

    per_supp = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey").aggregate(Sum("u", alias_name="u"))
        # absorb groupby's empty marker blocks pre-join
        .repartition(join_partitions())
    )
    j = per_supp.join(supp, join_type="inner", num_partitions=join_partitions(),
                      on=("l_suppkey",), right_on=("s_suppkey",))

    def attach(t: pa.Table) -> pa.Table:
        # vectorized dim attach: one index_in + two takes per batch
        idx = pc.index_in(pc.cast(t["s_nationkey"], nk_arr.type), value_set=nk_arr)
        return (
            pa.table(
                {
                    "r_name": rname_arr.take(idx),
                    "n_name": nname_arr.take(idx),
                    "u": t["u"],
                }
            )
            .group_by(["r_name", "n_name"]).aggregate([("u", "sum")])
            .rename_columns(["r_name", "n_name", "u"])
        )

    agg = (
        j.map_batches(attach, batch_format="pyarrow")
        .groupby(["r_name", "n_name"]).aggregate(Sum("u", alias_name="u"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": t["r_name"],
                "n_name": t["n_name"],
                "revenue": pc.divide(pc.cast(t["u"], pa.float64()), 10000.0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_REGIONAL_REVENUE_SQL = """
SELECT r_name, n_name,
       SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) / 10000.0
         AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Ratio-to-report: revenue share per brand
# ---------------------------------------------------------------------------

def q_brand_revenue_share(sf_dir: str) -> pa.Table:
    """Each brand's share of total revenue (ratio-to-report window
    shape).  The distributed part collapses to |brands| exact integer
    rows; the grand total and the single share division happen on the
    driver over those 25 rows.  int/int → float64 is one IEEE op on
    both engines — bit-equal, no grid."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    j = li.join(part, join_type="inner", num_partitions=join_partitions(),
                on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        ep = _cents(t["l_extendedprice"]).to_numpy()
        disc = _cents(t["l_discount"]).to_numpy()
        return (
            pa.table({"p_brand": t["p_brand"], "u": ep * (100 - disc)})
            .group_by(["p_brand"]).aggregate([("u", "sum")])
            .rename_columns(["p_brand", "u"])
        )

    rows = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand").aggregate(Sum("u", alias_name="u"))
        .take_all()
    )
    rows.sort(key=lambda r: r["p_brand"])
    u = np.array([r["u"] for r in rows], dtype=np.int64)
    total = np.float64(u.sum())
    return pa.table(
        {
            "p_brand": pa.array([r["p_brand"] for r in rows], pa.string()),
            "revenue": pa.array(u.astype(np.float64) / 10000.0),
            "share": pa.array(u.astype(np.float64) / total),
        }
    )


Q_REVENUE_SHARE_SQL = """
WITH b AS (
  SELECT p_brand,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
              * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT) AS u
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT p_brand, u / 10000.0 AS revenue,
       CAST(u AS DOUBLE) / CAST(SUM(u) OVER () AS DOUBLE) AS share
FROM b
"""


# ---------------------------------------------------------------------------
# Distributed triangle counting (graph 3-cycle via two-hop joins)
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str) -> pa.Table:
    """Triangles in the brand co-purchase graph — the canonical
    multi-way-join graph pattern.  Edges = basket pairs with
    above-average support (the exact integer comparison n·|pairs| > Σn
    so the cut transfers across corpus scales); triangles come from
    two DISTRIBUTED hash joins (edge ⨝ edge on the middle vertex →
    wedges, wedge ⨝ edge on the closing pair), never an adjacency
    matrix on the driver — the same plan works when the graph doesn't
    fit one node.  a<b edge orientation makes each triangle match
    exactly once."""
    pairs = q_brand_basket_pairs(sf_dir).materialize()
    stats = pairs.aggregate(Sum("n_orders", alias_name="s"), Count(alias_name="c"))
    s, c = stats["s"], stats["c"]

    def cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.multiply(t["n_orders"], c), s))

    edges = pairs.map_batches(cut, batch_format="pyarrow").materialize()

    e1 = edges.map_batches(
        lambda t: pa.table({"x": t["brand_a"], "y": t["brand_b"]}),
        batch_format="pyarrow",
    ).repartition(4)
    e2 = edges.map_batches(
        lambda t: pa.table({"y2": t["brand_a"], "z": t["brand_b"]}),
        batch_format="pyarrow",
    ).repartition(4)
    e3 = edges.map_batches(
        lambda t: pa.table({"xc": t["brand_a"], "zc": t["brand_b"]}),
        batch_format="pyarrow",
    ).repartition(4)

    wedges = e1.join(e2, join_type="inner", num_partitions=4,
                     on=("y",), right_on=("y2",))
    tri = wedges.join(e3, join_type="inner", num_partitions=4,
                      on=("x", "z"), right_on=("xc", "zc"))
    return pa.table({"n_triangles": pa.array([tri.count()], pa.int64())})


Q_TRIANGLES_SQL = """
WITH lb AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), p AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n
  FROM lb a JOIN lb b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
), m AS (
  SELECT CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS c FROM p
), e AS (
  SELECT brand_a, brand_b FROM p, m WHERE n * c > s
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.brand_a = e1.brand_b
JOIN e e3 ON e3.brand_a = e1.brand_a AND e3.brand_b = e2.brand_b
"""


# ---------------------------------------------------------------------------
# Exact grouped median from the broadcast value histogram
# ---------------------------------------------------------------------------

def q_median_price_by_status(sf_dir: str) -> pa.Table:
    """Exact per-group MEDIAN (the two-middle average for even n) of
    o_totalprice by order status — computed from the per-(group,
    cents) histogram, never a per-group sort of the raw rows: the
    histogram partials shrink to the value domain, the driver resolves
    the two order statistics per group with one cumsum+searchsorted.
    (a+b)/2.0/100.0 mirrors the SQL AVG-of-two-middles op order."""
    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"st": t["o_orderstatus"], "c": _cents(t["o_totalprice"])})
            .group_by(["st", "c"]).aggregate([([], "count_all")])
            .rename_columns(["st", "c", "n"])
        )

    rows = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["st", "c"]).aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_st: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_st.setdefault(r["st"], []).append((r["c"], r["n"]))
    sts, meds, ns = [], [], []
    for st in sorted(by_st):
        pairs = sorted(by_st[st])
        cs = np.array([p[0] for p in pairs], dtype=np.int64)
        cnt = np.array([p[1] for p in pairs], dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        lo_rank, hi_rank = (n + 1) // 2, n // 2 + 1
        a = cs[np.searchsorted(cum, lo_rank, side="left")]
        b = cs[np.searchsorted(cum, hi_rank, side="left")]
        sts.append(st)
        meds.append((a + b) / 2.0 / 100.0)
        ns.append(n)
    return pa.table(
        {
            "o_orderstatus": pa.array(sts, pa.string()),
            "median_price": pa.array(meds, pa.float64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


Q_MEDIAN_SQL = """
WITH c AS (
  SELECT o_orderstatus, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
), r AS (
  SELECT o_orderstatus, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM c
)
SELECT o_orderstatus, AVG(cents) / 100.0 AS median_price,
       CAST(MAX(n) AS BIGINT) AS n
FROM r WHERE rn IN ((n + 1) // 2, n // 2 + 1)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Distributed Pareto front (skyline query)
# ---------------------------------------------------------------------------

def q_pareto_parts(sf_dir: str) -> ray.data.Dataset:
    """Skyline of the part table under (minimize p_retailprice, minimize
    p_size): every part not dominated by another that is <= on both and
    strictly < on at least one.

    Distributed shape (the classic skyline merge): each batch computes
    its LOCAL front with one lexsort + running-min mask (any global
    survivor must survive its own batch), fronts concatenate into a
    single small table, and one final pass over that union yields the
    global front — O(front²) work only on the tiny merged set, never on
    the corpus.  Prices compare on the integer-cents grid (oracle
    parity recipe)."""
    import ray

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def local_front(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["p_retailprice"], 100.0), 0.5)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _pareto_mask(cents, size)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()).filter(pa.array(keep)),
                "p_size": pa.array(size[keep]),
                "price_cents": pa.array(cents[keep]),
            }
        )

    fronts = (
        ds.map_batches(local_front, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    blocks = [
        ray.get(r)
        for bundle in fronts.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]
    merged = pa.concat_tables(
        [b for b in blocks if b.num_rows and "p_partkey" in b.column_names]
    ).combine_chunks()
    cents = merged["price_cents"].to_numpy(zero_copy_only=False)
    size = merged["p_size"].to_numpy(zero_copy_only=False)
    keep = _pareto_mask(cents, size)
    out = merged.filter(pa.array(keep))
    order = pc.sort_indices(out, sort_keys=[("p_partkey", "ascending")])
    return ray.data.from_arrow(out.take(order))


def _pareto_mask(cost_a: np.ndarray, cost_b: np.ndarray) -> np.ndarray:
    """Non-dominated mask for two minimize-objectives, vectorized:
    after lexsort by (a asc, b asc), a row is dominated iff some row
    with strictly smaller a has b <= its b, OR an identical-a
    predecessor has strictly smaller b (same-a runs keep only their
    first-b rows, which are duplicates-by-value).  Running minima over
    the sorted order give both tests without a pair loop."""
    n = cost_a.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((cost_b, cost_a))
    a, b = cost_a[order], cost_b[order]
    # running min of b over all STRICTLY-smaller-a prefixes
    run_min = np.minimum.accumulate(b)
    new_a = np.concatenate([[True], a[1:] != a[:-1]])
    # min-b among rows with a' < a: the running min at the last index of
    # the previous a-run
    grp = np.cumsum(new_a) - 1  # a-run id per row
    prev_run_last = np.concatenate([[0], np.nonzero(new_a)[0][1:]]) - 1
    minb_prev = np.where(
        grp == 0, np.iinfo(np.int64).max, run_min[prev_run_last[grp]]
    )
    dominated = minb_prev <= b
    # within an equal-a run, rows with b strictly above the run's min are
    # dominated by the run head (same a, smaller b)
    run_first_b = b[np.nonzero(new_a)[0]][grp]
    dominated |= b > run_first_b
    keep_sorted = ~dominated
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


Q_PARETO_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_partkey, a.p_size, a.price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size)
)
ORDER BY a.p_partkey
"""


# ---------------------------------------------------------------------------
# Table profiling (ANALYZE shape): per-column null + exact distinct counts
# ---------------------------------------------------------------------------

def q_profile_orders(sf_dir: str) -> ray.data.Dataset:
    """Per-column data profile of ``orders`` — row count, nulls, EXACT
    distinct count for every column (the ANALYZE/stats-collection pass
    every engine runs before planning).

    Scale shape: one pass emits, per batch, (a) tiny per-column
    null/row partials and (b) locally-distinct (column, value-hash)
    pairs — so the single shuffle carries one row per distinct value
    per batch per column, never raw values (timestamps/doubles are
    hashed onto int64 via their exact bit patterns; count-distinct on
    hashes equals count-distinct on values absent a 64-bit collision).
    A coarse 64-bucket groupby then counts distinct hashes per column
    vectorized, and the driver merges |columns| small rows."""
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    ds = read_table(sf_dir, "orders", columns=cols)

    from ..functions.text import stable_hash64

    def _col_hash(arr: pa.ChunkedArray) -> np.ndarray:
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        t = a.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return stable_hash64(a)
        if pa.types.is_timestamp(t):
            return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        if pa.types.is_floating(t):
            return a.to_numpy(zero_copy_only=False).view(np.uint64)
        return a.to_numpy(zero_copy_only=False).astype(np.uint64)

    mid_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("column", pa.string()),
            ("vhash", pa.int64()),
            ("n_rows", pa.int64()),
            ("n_nulls", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            arr = t[c]
            nulls = int(arr.null_count)
            valid = arr.combine_chunks().drop_null() if nulls else arr
            h = np.unique(_col_hash(valid))
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
                        "column": pa.array([c] * h.size, pa.string()),
                        "vhash": pa.array(h.view(np.int64)),
                        "n_rows": pa.array(np.zeros(h.size, np.int64)),
                        "n_nulls": pa.array(np.zeros(h.size, np.int64)),
                    },
                    schema=mid_schema,
                )
            )
            # stats row rides under bucket -1 (one per column per batch)
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array([-1], pa.int64()),
                        "column": pa.array([c], pa.string()),
                        "vhash": pa.array([0], pa.int64()),
                        "n_rows": pa.array([t.num_rows], pa.int64()),
                        "n_nulls": pa.array([nulls], pa.int64()),
                    },
                    schema=mid_schema,
                )
            )
        return pa.concat_tables(parts)

    mid = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    part_schema = pa.schema(
        [
            ("column", pa.string()),
            ("n_rows", pa.int64()),
            ("n_nulls", pa.int64()),
            ("n_distinct", pa.int64()),
        ]
    )

    def resolve(g: "pd.DataFrame") -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        if int(g["bucket"].iloc[0]) == -1:
            agg = g.groupby("column", sort=True).agg(
                n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum")
            )
            return pa.table(
                {
                    "column": pa.array(agg.index.to_numpy(), pa.string()),
                    "n_rows": pa.array(agg["n_rows"].to_numpy().astype(np.int64)),
                    "n_nulls": pa.array(agg["n_nulls"].to_numpy().astype(np.int64)),
                    "n_distinct": pa.array(np.zeros(len(agg), np.int64)),
                },
                schema=part_schema,
            )
        # distinct hashes per column within this bucket
        u = g[["column", "vhash"]].drop_duplicates().groupby("column").size()
        return pa.table(
            {
                "column": pa.array(u.index.to_numpy(), pa.string()),
                "n_rows": pa.array(np.zeros(len(u), np.int64)),
                "n_nulls": pa.array(np.zeros(len(u), np.int64)),
                "n_distinct": pa.array(u.to_numpy().astype(np.int64)),
            },
            schema=part_schema,
        )

    parts = mid.groupby("bucket").map_groups(resolve, batch_format="pandas")
    agg = parts.groupby("column").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_nulls", alias_name="n_nulls"),
        Sum("n_distinct", alias_name="n_distinct"),
    )
    from .dedup import _with_schema

    return agg.map_batches(
        _with_schema(part_schema), batch_format="pyarrow"
    )


Q_PROFILE_ORDERS_SQL = """
SELECT 'o_custkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate) FROM orders
UNION ALL
SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
       COUNT(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice) FROM orders
"""


# ---------------------------------------------------------------------------
# Upsert / MERGE (CDC latest-wins by version key)
# ---------------------------------------------------------------------------

def q_upsert_latest(sf_dir: str) -> ray.data.Dataset:
    """MERGE INTO semantics (the lakehouse CDC apply): a deltas stream
    upserts onto the base table, latest version wins per key.  The
    deltas are derived deterministically from the corpus (no external
    data): every ``doc_id % 7 == 0`` doc gets a v1 update with
    ``' v2'`` appended, and one brand-new row per source batch appears
    under ``doc_id + 10_000_000``.

    Scale shape: base ∪ deltas stream through ONE groupby(doc_id)
    whose aggregate is a plain MAX over ``version << 32 | n_chars`` —
    latest-wins folds into an ordinary mergeable aggregate instead of a
    per-key argmax sort, so the shuffle is one int64 per key per batch
    after per-batch partial max."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        upd = ids % 7 == 0
        out_ids = [ids, ids[upd], ids[upd] + 10_000_000]
        out_ver = [
            np.zeros(ids.size, np.int64),
            np.ones(int(upd.sum()), np.int64),
            np.zeros(int(upd.sum()), np.int64),
        ]
        out_nch = [n_chars, n_chars[upd] + 3, n_chars[upd]]  # ' v2' appended
        i = np.concatenate(out_ids)
        v = np.concatenate(out_ver)
        c = np.concatenate(out_nch)
        enc = (v << np.int64(32)) | c
        part = pa.table({"doc_id": pa.array(i), "enc": pa.array(enc)})
        return part.group_by("doc_id").aggregate([("enc", "max")])

    agg = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Max("enc_max", alias_name="enc"))
    )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("version", pa.int64()), ("n_chars", pa.int64())]
    )

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        enc = t["enc"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "version": pa.array(enc >> np.int64(32)),
                "n_chars": pa.array(enc & np.int64(0xFFFFFFFF)),
            },
            schema=out_schema,
        )

    return agg.map_batches(decode, batch_format="pyarrow")


Q_UPSERT_SQL = """
WITH all_rows AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS version,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
  UNION ALL
  SELECT doc_id, 1, length(text) + 3 FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 10000000, 0, length(text) FROM documents WHERE doc_id % 7 = 0
), enc AS (
  SELECT doc_id, MAX(version * 4294967296 + n_chars) AS e
  FROM all_rows GROUP BY doc_id
)
SELECT doc_id, CAST(e // 4294967296 AS BIGINT) AS version,
       CAST(e % 4294967296 AS BIGINT) AS n_chars
FROM enc
"""


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-dimensional data clustering
# ---------------------------------------------------------------------------

def q_zorder_keys(sf_dir: str) -> ray.data.Dataset:
    """Z-order/Morton layout key per order — the multi-dimensional
    clustering key lakehouse OPTIMIZE/Z-ORDER writes sort by so range
    filters on EITHER customer or date prune row groups: 16 bits of
    ``o_custkey`` interleaved with 16 bits of the epoch-day.

    Pure per-batch bit math (16 shift-or steps over the whole column,
    no shuffle at all — the sort that would consume this key is the
    writer's existing global sort); bit-identical to the DuckDB
    list_transform expression."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    out_schema = pa.schema([("o_orderkey", pa.int64()), ("zkey", pa.int64())])

    def zorder(t: pa.Table) -> pa.Table:
        x = (
            t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            & 0xFFFF
        )
        day = (
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        ) & 0xFFFF
        z = np.zeros(x.size, np.int64)
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((day >> i) & 1) << (2 * i + 1)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "zkey": pa.array(z)},
            schema=out_schema,
        )

    return ds.map_batches(zorder, batch_format="pyarrow", zero_copy_batch=True)


Q_ZORDER_SQL = """
SELECT o_orderkey,
       CAST(list_sum(list_transform(range(0, 16), i ->
           ((o_custkey % 65536) // (CAST(1 AS BIGINT) << i) % 2)
               * (CAST(1 AS BIGINT) << (2 * i))
           + (((CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 65536)
               // (CAST(1 AS BIGINT) << i) % 2)
               * (CAST(1 AS BIGINT) << (2 * i + 1))
       )) AS BIGINT) AS zkey
FROM orders
"""


# ---------------------------------------------------------------------------
# Q21-style blame report: double-correlated EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

_BLAME_ROW = pa.schema(
    [("o_orderkey", pa.int64()), ("r_skey", pa.int64())]
)


def q_blame_suppliers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    that were the SOLE returning supplier (`l_returnflag = 'R'`) on a
    finalized (`o_orderstatus = 'F'`) multi-supplier order — the classic
    EXISTS(other supplier) AND NOT EXISTS(other returning supplier)
    double-correlated subquery, counted per supplier.

    Ray shape: the correlation collapses into per-order aggregates —
    (1) per-batch (orderkey, suppkey) -> any_R partials, (2) one
    groupby(orderkey, suppkey), (3) one groupby(orderkey) producing
    n_suppliers / n_returning / the single returning suppkey, (4) filter
    n_sup >= 2 AND n_r == 1, (5) hash-join the surviving one-row-per-
    order stream against status-'F' order keys, (6) a supplier-bounded
    count + broadcast name lookup.  No row-vs-row self-join ever
    materializes: the l2/l3 EXISTS subqueries the SQL oracle runs are
    replaced by the order-level counts, so the widest shuffle carries
    one ~24 B row per (order, supplier).  The supplier dimension is the
    genuinely small side and is broadcast via ``ray.put`` (sorted-key
    searchsorted, not a python dict probe)."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "any_r": r,
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("any_r", "max")])
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "any_r"])

    per_os = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("any_r", alias_name="any_r"))
    )

    def widen(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ar = t["any_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "one": pa.array(np.ones(len(t), np.int64)),
                "any_r": pa.array(ar),
                "r_skey": pa.array(np.where(ar == 1, sk, -1)),
            }
        )

    per_order = (
        per_os.map_batches(widen, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(
            Sum("one", alias_name="n_sup"),
            Sum("any_r", alias_name="n_r"),
            Max("r_skey", alias_name="r_skey"),
        )
    )

    def blame_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _BLAME_ROW.empty_table()
        m = pc.and_(pc.greater_equal(t["n_sup"], 2), pc.equal(t["n_r"], 1))
        t = t.filter(m)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "r_skey": pc.cast(t["r_skey"], pa.int64()),
            }
        )

    f_orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    blamed = (
        per_order.map_batches(blame_filter, batch_format="pyarrow")
        .repartition(join_partitions())
        .join(
            f_orders.repartition(join_partitions()),
            join_type="inner",
            num_partitions=join_partitions(),
            on=("o_orderkey",),
        )
    )

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).take_all()
    order_sk = np.argsort([r["s_suppkey"] for r in sup])
    name_ref = ray.put(
        (
            np.array([sup[i]["s_suppkey"] for i in order_sk], dtype=np.int64),
            pa.array([sup[i]["s_name"] for i in order_sk], type=pa.string()),
        )
    )

    def count_partial(t: pa.Table) -> pa.Table:
        # per-batch supplier counts with the broadcast name attached
        # here, so ONE bounded groupby(s_name) finishes the report
        if t.num_rows == 0:
            return pa.schema(
                [("s_name", pa.string()), ("n", pa.int64())]
            ).empty_table()
        keys, names = ray.get(name_ref)
        g = (
            t.select(["r_skey"])
            .group_by("r_skey")
            .aggregate([([], "count_all")])
        )
        skey = g["r_skey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, skey)
        # inner-join semantics: a blamed suppkey absent from the
        # supplier table (orphan FK) must be dropped, not clamped to a
        # neighbouring name or indexed past the end
        ok = pos < len(keys)
        ok[ok] = keys[pos[ok]] == skey[ok]
        if not ok.all():
            g = g.filter(pa.array(ok))
            pos = pos[ok]
        return pa.table(
            {
                "s_name": names.take(pa.array(pos, type=pa.int64())),
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_name": t["s_name"],
                "n_blame": pc.cast(t["n_blame"], pa.int64()),
            }
        )

    return (
        blamed.map_batches(count_partial, batch_format="pyarrow")
        .groupby("s_name")
        .aggregate(Sum("n", alias_name="n_blame"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["n_blame", "s_name"], descending=[True, False])
        .limit(k)
    )


Q_BLAME_SUPPLIERS_SQL = """
SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_blame
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY n_blame DESC, s_name
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan foreign keys across the star schema
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def q_fk_audit(sf_dir: str) -> ray.data.Dataset:
    """Warehouse referential-integrity audit: per foreign-key edge of
    the star schema, the child row count and how many child rows point
    at a parent key that does not exist — the ingest health check run
    before any join is trusted.

    Scale shape per edge: the child side collapses to DISTINCT
    (fk, row-count) partials per batch before ONE keyed groupby, the
    parent contributes only its key column, and the orphan test is a
    hash LEFT OUTER join between those two key-sized streams (never a
    broadcast of a fact-table key set — ``orders`` is not a dim).  The
    four per-edge results are unioned; each is two small shuffles of
    ~16 B rows."""
    results = []
    for name, child, fk, parent, pk in _FK_EDGES:
        ch = read_table(sf_dir, child, columns=[fk])

        def child_partial(t: pa.Table, _fk=fk) -> pa.Table:
            g = t.group_by(_fk).aggregate([([], "count_all")])
            return pa.table(
                {
                    "k": pc.cast(g[_fk], pa.int64()),
                    "n": pc.cast(g["count_all"], pa.int64()),
                }
            )

        child_keys = (
            ch.map_batches(child_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .aggregate(Sum("n", alias_name="n"))
        )
        parent_ds = read_table(sf_dir, parent, columns=[pk])
        if parent_ds.count() == 0:  # parquet metadata count, no scan
            # degenerate all-orphan edge: an empty parent leaves Ray's
            # hash join without a right-side schema (zero-column empty
            # blocks) — mark every child key missing instead
            joined = child_keys.map_batches(
                lambda t: t.append_column(
                    "present", pa.array([None] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
        else:

            def parent_partial(t: pa.Table, _pk=pk) -> pa.Table:
                u = pc.cast(pc.unique(t[_pk].combine_chunks()), pa.int64())
                return pa.table({"k": u})

            # per-batch unique is only a combiner: a parent PK repeated
            # ACROSS blocks would multiply child rows through the join
            # and inflate the audit — the groupby makes the distinct
            # global (the integrity check must not trust parent PKs)
            pr = (
                parent_ds.map_batches(
                    parent_partial, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("k")
                .aggregate(Count(alias_name="present"))
            )
            joined = child_keys.repartition(join_partitions()).join(
                pr.repartition(join_partitions()),
                join_type="left_outer",
                num_partitions=join_partitions(),
                on=("k",),
            )

        def fold(t: pa.Table, _name=name) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema(
                    [
                        ("edge", pa.string()),
                        ("n_child", pa.int64()),
                        ("n_orphan", pa.int64()),
                    ]
                ).empty_table()
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            miss = pc.is_null(t["present"]).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "edge": pa.array([_name]),
                    "n_child": pa.array([int(n.sum())]),
                    "n_orphan": pa.array([int(n[miss].sum())]),
                }
            )

        results.append(
            joined.map_batches(fold, batch_format="pyarrow")
            .groupby("edge")
            .aggregate(
                Sum("n_child", alias_name="n_child"),
                Sum("n_orphan", alias_name="n_orphan"),
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "edge": t["edge"],
                "n_child": pc.cast(t["n_child"], pa.int64()),
                "n_orphan": pc.cast(t["n_orphan"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


Q_FK_AUDIT_SQL = """
SELECT 'lineitem->orders' AS edge,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
            WHERE o_orderkey = l_orderkey) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan
FROM lineitem
UNION ALL
SELECT 'lineitem->part',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM part
            WHERE p_partkey = l_partkey) THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem->supplier',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM supplier
            WHERE s_suppkey = l_suppkey) THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders->customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
            WHERE c_custkey = o_custkey) THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
"""
