"""Training-data preparation operators over the ``documents`` table.

The reference system stops at span extraction (its product path ends in
JSON results, SURVEY.md §2.6); a 100 TB training-data pipeline needs the
next stages too: chunking documents into model-window pieces, packing
chunks into fixed token budgets, and decontaminating the corpus against
a benchmark set.  All three are expressed as vectorized ``map_batches``
stages (token explode = Arrow split + numpy gather; no per-row Python in
the hot path) and every operator is value-oracled against DuckDB.

Scale notes (100 TB):
- chunking is embarrassingly parallel — zero shuffles, output streams.
- packing shuffles one (source, doc_id, n_tokens) row per document
  (~24 B), never the text; the pack assignment is a per-source running
  sum, i.e. the same keyed-window shape as ``events.q_running_user_value``.
- decontamination broadcasts the *benchmark* n-gram set (the small side
  by construction — benchmarks are a fixed, curated corpus) via
  ``ray.put``; the 100 TB side streams through a membership probe.  If
  the benchmark set outgrew worker memory, swap the broadcast for a hash
  join on the n-gram string (same partials, one shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.readers import read_table

__all__ = [
    "q_chunk_plan",
    "q_pack_plan",
    "q_decontaminate",
    "q_dsir_weights",
    "Q_DSIR_SQL",
    "Q_CHUNK_SQL",
    "Q_PACK_SQL",
    "Q_DECON_SQL",
]


def _tokens_flat(text_col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace-token explode: returns ``(flat_tokens, parent_row,
    n_tokens_per_row)`` with empty tokens dropped (parity with the SQL
    ``list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')``)."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text_col), r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    n_rows = len(text_col)
    n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
    return flat, parent, n_tok


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """``concatenate([arange(c) for c in counts])`` without the loop."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _ngrams_flat(
    flat: pa.Array, n_tok: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """Space-joined word ``n``-gram strings over an exploded token
    stream: ``(flat n-grams, parent row index)`` — one numpy gather +
    one ``binary_join``, no per-row Python."""
    doc_off = np.cumsum(n_tok) - n_tok
    n_grams = np.maximum(n_tok - (n - 1), 0)
    row_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_grams)
    start = _grouped_arange(n_grams)
    tok_idx = (np.repeat(doc_off[row_idx] + start, n) +
               np.tile(np.arange(n, dtype=np.int64), int(n_grams.sum())))
    values = flat.take(pa.array(tok_idx))
    offsets = np.arange(0, (int(n_grams.sum()) + 1) * n, n, dtype=np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    return pc.binary_join(lists, " "), row_idx


# ---------------------------------------------------------------------------
# Chunking: fixed token windows with stride (overlapping model chunks)
# ---------------------------------------------------------------------------

def q_chunk_plan(sf_dir: str, window: int = 32, stride: int = 24) -> ray.data.Dataset:
    """Split every document into ``window``-token chunks at ``stride``
    offsets (overlap = window - stride) — the pre-tokenization chunking
    step of an LLM training pipeline.

    Fully vectorized per batch: one Arrow regex split, numpy gather
    indices for every chunk's tokens at once, one ``ListArray`` +
    ``binary_join`` to materialize chunk texts.  No shuffle; the op
    streams at any corpus size.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        flat, _parent, n_tok = _tokens_flat(t["text"])
        doc_off = np.cumsum(n_tok) - n_tok  # first flat index per row
        n_chunks = -(-n_tok // stride)  # ceil; 0 tokens -> 0 chunks
        row_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunks)
        chunk_idx = _grouped_arange(n_chunks)
        start = chunk_idx * stride
        chunk_len = np.minimum(window, n_tok[row_idx] - start)
        # global token indices for every chunk, one flat gather
        tok_idx = np.repeat(doc_off[row_idx] + start, chunk_len) + _grouped_arange(chunk_len)
        values = flat.take(pa.array(tok_idx))
        offsets = np.concatenate([[0], np.cumsum(chunk_len)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
        chunk_text = pc.binary_join(lists, " ")
        doc_ids = t["doc_id"].combine_chunks().take(pa.array(row_idx))
        return pa.table(
            {
                "doc_id": doc_ids,
                "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
                "chunk_text": chunk_text,
                "n_tokens": pa.array(chunk_len, type=pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


Q_CHUNK_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
), ex AS (
  SELECT doc_id, tk, UNNEST(range(0, greatest(len(tk), 0), 24)) AS s
  FROM tk
)
SELECT doc_id,
       s // 24 AS chunk_idx,
       array_to_string(list_slice(tk, s + 1, s + 32), ' ') AS chunk_text,
       least(32, len(tk) - s) AS n_tokens
FROM ex
"""


# ---------------------------------------------------------------------------
# Sequence packing: contiguous token-budget bins per source shard
# ---------------------------------------------------------------------------

def q_pack_plan(sf_dir: str, budget: int = 256) -> ray.data.Dataset:
    """Pack documents (ordered by doc_id within each ``source`` shard)
    into contiguous token-budget bins: a document's pack is
    ``floor(tokens_before_it / budget)`` — the deterministic
    offset-based packing plan used before sequence concatenation.

    Shuffle moves one ``(source, doc_id, n_tokens)`` row per document;
    text never leaves the scan batch.  The per-source running sum runs
    inside ``map_groups`` on numpy (same keyed-window shape as
    ``events.q_running_user_value``).
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def counts(t: pa.Table) -> pa.Table:
        _flat, _parent, n_tok = _tokens_flat(t["text"])
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "nt": pa.array(n_tok, type=pa.int64()),
            }
        )

    rows = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("pack_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("pack_tokens", pa.int64()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
        ]
    )

    def pack(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "source" not in g.column_names:
            return out_schema.empty_table()
        g = g.combine_chunks()
        order = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        doc = g["doc_id"].take(order).to_numpy(zero_copy_only=False)
        nt = g["nt"].take(order).to_numpy(zero_copy_only=False)
        cum_before = np.cumsum(nt) - nt
        pack_id = cum_before // budget
        # pack_id is non-decreasing -> reduce over runs
        starts = np.nonzero(np.concatenate([[True], pack_id[1:] != pack_id[:-1]]))[0]
        ends = np.concatenate([starts[1:], [pack_id.size]])
        sums = np.add.reduceat(nt, starts)
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()] * starts.size),
                "pack_id": pa.array(pack_id[starts], type=pa.int64()),
                "n_docs": pa.array(ends - starts, type=pa.int64()),
                "pack_tokens": pa.array(sums, type=pa.int64()),
                "first_doc": pa.array(doc[starts], type=pa.int64()),
                "last_doc": pa.array(doc[ends - 1], type=pa.int64()),
            },
            schema=out_schema,
        )

    return rows.groupby("source").map_groups(pack, batch_format="pyarrow")


Q_PACK_SQL = r"""
WITH n AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS nt
  FROM documents
), c AS (
  SELECT source, doc_id, nt,
         COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM n
)
SELECT source, CAST(cb // 256 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c
GROUP BY source, cb // 256
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination: word n-gram overlap against a held-out set
# ---------------------------------------------------------------------------

def q_decontaminate(sf_dir: str, n: int = 4, holdout_mod: int = 97) -> ray.data.Dataset:
    """Flag training documents that share any word ``n``-gram with the
    benchmark set (here: ``doc_id % holdout_mod == 0`` stands in for the
    curated eval corpus).  Output is one row per *training* doc with its
    distinct-hit count — stable schema even when nothing is contaminated.

    The benchmark n-gram set is collected once (distinct per batch, then
    a driver-side distinct — bounded by the benchmark corpus, which is
    small by construction) and broadcast via ``ray.put``; training docs
    stream through an Arrow ``is_in`` membership probe.  At a benchmark
    set too big to broadcast, replace the probe with a hash join on the
    n-gram string (same per-batch distinct partials, one shuffle).
    """
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _ngrams(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
        """(flat n-gram strings, parent row index) per batch."""
        flat, _parent, n_tok = _tokens_flat(t["text"])
        return _ngrams_flat(flat, n_tok, n)

    def is_bench(t: pa.Table) -> pa.Array:
        # no modulo kernel in this pyarrow: one zero-ish-copy numpy round-trip
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.array(ids % holdout_mod == 0)

    def bench_grams(t: pa.Table) -> pa.Table:
        t = t.filter(is_bench(t))
        g, _rows = _ngrams(t)
        return pa.table({"g": pc.unique(g)})

    bench = pa.concat_tables(
        b for b in read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(bench_grams, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    )
    bench_set = pc.unique(bench["g"]) if bench.num_rows else pa.array([], type=pa.string())
    bench_ref = ray.put(bench_set)

    class Probe:
        def __init__(self) -> None:
            self.bench: pa.Array = ray.get(bench_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(is_bench(t)))
            if t.num_rows == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        "n_hits": pa.array([], type=pa.int64()),
                        "contaminated": pa.array([], type=pa.bool_()),
                    }
                )
            g, row_idx = _ngrams(t)
            hit = pc.is_in(g, value_set=self.bench).to_numpy(zero_copy_only=False)
            n_hits = np.zeros(t.num_rows, dtype=np.int64)
            if hit.any():
                # distinct contaminated grams per doc: unique (row, gram)
                hg = g.take(pa.array(np.nonzero(hit)[0]))
                hr = row_idx[hit]
                tmp = pa.table({"r": pa.array(hr), "g": hg})
                d = tmp.group_by(["r", "g"]).aggregate([])
                np.add.at(n_hits, d["r"].to_numpy(zero_copy_only=False), 1)
            return pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "n_hits": pa.array(n_hits, type=pa.int64()),
                    "contaminated": pa.array(n_hits > 0),
                }
            )

    # autoscaling probe pool with a cluster-derived ceiling: a fixed
    # (1, 4) capped the membership probe at 4 actors on wide clusters
    # (the same flaw as the fixed bucket widths); CPUs//4 leaves the
    # rest of the session to the producer scan, floor 2 so the small
    # pytest session still overlaps probe with read
    from ..functions.cluster import media_pool_size

    return ds.map_batches(Probe, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, media_pool_size()))


Q_DECON_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
), bg AS (
  SELECT DISTINCT array_to_string(list_slice(tk, i + 1, i + 4), ' ') AS g
  FROM (SELECT tk, UNNEST(range(0, greatest(len(tk) - 3, 0))) AS i
        FROM tk WHERE doc_id % 97 = 0)
), dg AS (
  SELECT doc_id, array_to_string(list_slice(tk, i + 1, i + 4), ' ') AS g
  FROM (SELECT doc_id, tk, UNNEST(range(0, greatest(len(tk) - 3, 0))) AS i
        FROM tk WHERE doc_id % 97 <> 0)
), hits AS (
  SELECT doc_id, COUNT(DISTINCT g) AS n_hits
  FROM dg WHERE g IN (SELECT g FROM bg)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Adaptive quality-threshold filter (keep the top decile by score)
# ---------------------------------------------------------------------------

def q_quality_threshold_filter(sf_dir: str, pct: float = 0.9) -> ray.data.Dataset:
    """Keep documents at or above the corpus' ``pct`` order statistic
    of ``n_chars`` — the 'keep the top decile by quality score'
    curation step, where the cut point is a GLOBAL statistic computed
    from the data, not a constant.

    Exact without a sort: integer scores make the threshold computable
    from a value histogram — per-batch (score, count) partials, one
    tiny groupby, cumulative counts on the driver (bounded by the
    DISTINCT score domain, not the corpus).  The threshold is then a
    plain broadcast predicate on a second streaming pass.  Threshold
    definition shared with the SQL oracle: the k-th smallest score,
    k = ceil(pct * n)."""
    cols = read_table(sf_dir, "documents", columns=["n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table({"v": t["n_chars"]}).group_by("v").aggregate([([], "count_all")])
        return g.rename_columns(["v", "c"])

    counts = (
        cols.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    n = int(counts["c"].sum())
    if n == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("lang", pa.string()),
                 ("n_chars", pa.int64())]
            ).empty_table()
        )
    k = int(np.ceil(pct * n))
    cum = counts["c"].cumsum().to_numpy()
    threshold = int(counts["v"].to_numpy()[np.searchsorted(cum, k)])

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["n_chars"], threshold)
        out = t.filter(mask)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "lang": out["lang"],
                "n_chars": pc.cast(out["n_chars"], pa.int64()),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


Q_QUALITY_FILTER_SQL = """
WITH th AS (
  SELECT n_chars AS t FROM documents ORDER BY n_chars
  LIMIT 1
  OFFSET (SELECT CAST(CEIL(0.9 * COUNT(*)) AS BIGINT) - 1 FROM documents)
)
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars >= (SELECT t FROM th)
"""


# ---------------------------------------------------------------------------
# Global index assignment (zipWithIndex over a total order)
# ---------------------------------------------------------------------------

def q_global_index(sf_dir: str) -> ray.data.Dataset:
    """Assign every document a contiguous global row index under the
    total order (source, doc_id) — the zipWithIndex primitive used to
    give a sharded corpus stable training example ids.

    Two cheap passes instead of a global sort: (1) per-source counts
    (tiny groupby) -> driver-side prefix sum over the ~#sources rows ->
    broadcast offset dict; (2) rank within source (keyed shuffle +
    vectorized argsort per group) + offset lookup.  The all-to-all
    moves (source, doc_id) pairs only."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    counts = (
        ds.groupby("source")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("source")
    )
    csum = counts["c"].cumsum().shift(fill_value=0)
    offsets = dict(zip(counts["source"], csum.astype(int)))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("global_row", pa.int64())]
    )

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "source" not in g.column_names:
            return out_schema.empty_table()
        g = g.combine_chunks()
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        rk = np.empty(len(doc), dtype=np.int64)
        rk[order] = np.arange(len(doc), dtype=np.int64)
        base = offsets[g["source"][0].as_py()]
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "source": g["source"],
                "global_row": pa.array(base + rk, type=pa.int64()),
            },
            schema=out_schema,
        )

    return ds.groupby("source").map_groups(rank, batch_format="pyarrow")


Q_GLOBAL_INDEX_SQL = """
SELECT doc_id, source,
       ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS global_row
FROM documents
"""


# ---------------------------------------------------------------------------
# Source mixing weights (temperature sampling over corpus shards)
# ---------------------------------------------------------------------------

def q_source_mixing_weights(sf_dir: str) -> pa.Table:
    """Per-source sampling weights for temperature-based data mixing
    (p_s ∝ n_s^0.5, the sqrt temperature used to up-weight small
    sources in multilingual / multi-corpus training).

    The distributed part is one count-per-source groupby (|sources|
    rows on the driver); sqrt is IEEE-correctly-rounded in both
    engines, the share division is one op, and the 1e-6 grid absorbs
    denominator sum-order ulps.  alpha=0.5 deliberately: pow(x, a)
    for general a is not guaranteed bit-equal across libms."""
    ds = read_table(sf_dir, "documents", columns=["source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["source"]).aggregate([([], "count_all")])
            .rename_columns(["source", "n"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source").aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["source"])
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    w = np.sqrt(n.astype(np.float64))
    tot = w.sum()
    grid = lambda v: np.floor(v * 1e6 + 1e-3) / 1e6
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_docs": pa.array(n),
            "w": pa.array(grid(w), pa.float64()),
            "p": pa.array(grid(w / tot), pa.float64()),
        }
    )


Q_MIXING_SQL = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
), t AS (
  SELECT SUM(SQRT(CAST(n AS DOUBLE))) AS tot FROM s
)
SELECT source, n AS n_docs,
       FLOOR(SQRT(CAST(n AS DOUBLE)) * 1e6 + 1e-3) / 1e6 AS w,
       FLOOR(SQRT(CAST(n AS DOUBLE)) / tot * 1e6 + 1e-3) / 1e6 AS p
FROM s, t
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-bigram data selection)
# ---------------------------------------------------------------------------

def q_dsir_weights(sf_dir: str, buckets: int = 256) -> ray.data.Dataset:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): hash word bigrams into ``buckets`` feature buckets,
    fit add-1-smoothed bucket distributions for the TARGET domain
    (here the ground-truth ``lang = 'en'`` slice) and the RAW corpus,
    and score every document with its mean per-bigram log importance
    ratio ``log p_target(b) - log p_raw(b)``.  High scores mark
    raw-corpus documents that look like the target domain — the
    resampling key of the DSIR pipeline.

    Scale shape (100 TB): pass 1 emits per-batch bucket-count partials
    (<= ``buckets`` rows per batch, two tagged columns) through ONE
    tiny groupby; the resulting <=256-row table collapses to a
    ``buckets``-length float64 log-ratio array broadcast once via
    ``ray.put``.  Pass 2 streams: bigrams are hashed per batch
    (vectorized Horner fold, the SQL-matched ``fingerprint64``) and
    scored with one gather + ``np.add.reduceat`` segment means — a
    doc's text never leaves its batch and no stage materializes the
    corpus.  ``ln`` parity with DuckDB holds (same libm, one division
    per term — the unigram-LM recipe); the per-doc mean is floored to
    the 1e-6 grid to absorb sum-order ulps.  Documents with zero
    bigrams are excluded (the SQL side has no bigram rows for them).
    """
    from ..functions.text import fingerprint64, floor6

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    nb = np.int64(buckets)

    def _bigram_buckets(t: pa.Table):
        """(parent_row, bucket) arrays for every word bigram in the batch."""
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        good = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(good))
        parent = parent[good]
        if len(flat) < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        same = parent[1:] == parent[:-1]
        if not same.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        joined = pc.binary_join_element_wise(w1, w2, " ")
        bucket = (fingerprint64(joined) % np.uint64(buckets)).astype(np.int64)
        return parent[:-1][same], bucket

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parent, bucket = _bigram_buckets(t)
        if bucket.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "c_tgt": pa.array([], pa.int64()),
                    "c_raw": pa.array([], pa.int64()),
                }
            )
        is_tgt = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        c_raw = np.bincount(bucket, minlength=buckets).astype(np.int64)
        c_tgt = np.bincount(
            bucket[is_tgt[parent]], minlength=buckets
        ).astype(np.int64)
        nz = np.flatnonzero(c_raw)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "c_tgt": pa.array(c_tgt[nz]),
                "c_raw": pa.array(c_raw[nz]),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("c_tgt", alias_name="c_tgt"), Sum("c_raw", alias_name="c_raw"))
    )
    tabs = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ray.get(counts.to_arrow_refs())
    ]
    tabs = [t for t in tabs if t.num_rows and "bucket" in t.column_names]
    c_tgt = np.zeros(buckets, dtype=np.int64)
    c_raw = np.zeros(buckets, dtype=np.int64)
    if tabs:
        ct = pa.concat_tables(tabs, promote_options="default")
        bk = ct["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_tgt[bk] = ct["c_tgt"].to_numpy(zero_copy_only=False)
        c_raw[bk] = ct["c_raw"].to_numpy(zero_copy_only=False)
    n_tgt = float(c_tgt.sum())
    n_raw = float(c_raw.sum())
    # add-1 smoothing; one division per term, then ln — the exact SQL
    # expression ln((c+1)/(N+B)) term-for-term
    logratio = np.log((c_tgt + 1.0) / (n_tgt + float(buckets))) - np.log(
        (c_raw + 1.0) / (n_raw + float(buckets))
    )
    ratio_ref = ray.put(logratio)

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(ratio_ref)
        t = t.combine_chunks()
        parent, bucket = _bigram_buckets(t)
        nrows = t.num_rows
        n_bg = np.bincount(parent, minlength=nrows).astype(np.int64) if bucket.size else np.zeros(nrows, np.int64)
        sums = np.zeros(nrows, dtype=np.float64)
        if bucket.size:
            # bigram stream stays row-grouped in order -> reduceat segments
            offsets = np.concatenate(([0], np.cumsum(n_bg)[:-1]))
            keep0 = n_bg > 0
            sums[keep0] = np.add.reduceat(lr[bucket], offsets[keep0])
        keep = n_bg > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "n_bigrams": pa.array(n_bg[keep]),
                "avg_logw": pa.array(floor6(sums[keep] / n_bg[keep])),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(text, ' '), '\s+'),
                     w -> w <> '') AS tk
  FROM documents
), bg AS (
  SELECT doc_id, lang, (p).a || ' ' || (p).b AS bigram
  FROM (
    SELECT doc_id, lang,
           UNNEST(list_transform(range(1, len(tk)),
                  i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
    FROM toks WHERE len(tk) > 1
  )
), bk AS (
  SELECT doc_id, lang,
         CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
              list_transform(range(1, length(bigram)+1), i -> unicode(bigram[i]))),
              (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
              % 256 AS BIGINT) AS bucket
  FROM bg
), tot AS (
  SELECT CAST(COUNT(*) FILTER (lang = 'en') AS DOUBLE) AS nt,
         CAST(COUNT(*) AS DOUBLE) AS nr
  FROM bk
), lr AS (
  SELECT r.bucket,
         ln((COALESCE(t.c, 0) + 1.0) / (tot.nt + 256.0))
         - ln((r.c + 1.0) / (tot.nr + 256.0)) AS logratio
  FROM (SELECT bucket, COUNT(*) AS c FROM bk GROUP BY bucket) r
  LEFT JOIN (SELECT bucket, COUNT(*) AS c FROM bk WHERE lang = 'en'
             GROUP BY bucket) t USING (bucket)
  CROSS JOIN tot
)
SELECT bk.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       FLOOR(SUM(lr.logratio) / COUNT(*) * 1000000) / 1000000 AS avg_logw
FROM bk JOIN lr USING (bucket)
GROUP BY bk.doc_id
"""


def q_domain_cap(sf_dir: str, cap: int = 15) -> ray.data.Dataset:
    """Per-source document cap (the web-curation "domain cap": no single
    domain/feed may contribute more than ``cap`` documents to the
    training mix).  Selection is deterministic — the ``cap`` smallest
    values of the codepoint-Horner hash of the doc id (ties broken by
    doc_id) — so it is a reproducible uniform subsample per source, not
    materialized randomness.  Emits ``(source, doc_id, rn)`` with
    ``rn`` = 1-based rank within the source.

    Scale shape (100 TB): bottom-k per key is a mergeable sketch.  Each
    batch keeps its local ``cap`` smallest (hash, doc_id) per source
    (sources are a bounded key set), so the one shuffle carries at most
    ``cap x sources`` 24-byte rows per input block; the bounded-key
    ``groupby(source)`` merge then handles ``cap x blocks`` candidates
    per group, never the corpus.  Document text never leaves storage
    (the read prunes to two columns)."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def local_prune(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.string())
        hs = fingerprint64(ids).view(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False), dtype=object)
        _, codes = np.unique(src, return_inverse=True)
        order = np.lexsort((doc, hs, codes))
        codes_s = codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        )
        lens = np.diff(np.concatenate([starts, [codes_s.size]]))
        pos = np.arange(codes_s.size) - np.repeat(starts, lens)
        kept = order[pos < cap]
        return pa.table(
            {
                "source": pa.array(src[kept], pa.string()),
                "doc_id": pa.array(doc[kept], pa.int64()),
                "hs": pa.array(hs[kept], pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        hs = t["hs"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, hs))[:cap]
        return pa.table(
            {
                "source": t["source"].take(pa.array(order)),
                "doc_id": pa.array(doc[order], pa.int64()),
                "rn": pa.array(np.arange(1, order.size + 1, dtype=np.int64)),
            }
        )

    pruned = ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.groupby("source").map_groups(final, batch_format="pyarrow")


# The signed CASE maps the hugeint Horner hash onto the same two's-
# complement int64 ordering numpy's .view(int64) produces, so both
# engines rank identically.
Q_DOMAIN_CAP_SQL = """
WITH h AS (
  SELECT doc_id, source,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(1, length(CAST(doc_id AS VARCHAR))+1),
                            i -> unicode((CAST(doc_id AS VARCHAR))[i]))),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) AS hu
  FROM documents
)
SELECT source, doc_id,
       row_number() OVER (
         PARTITION BY source
         ORDER BY CAST(CASE WHEN hu >= 9223372036854775808
                            THEN hu - 18446744073709551616
                            ELSE hu END AS BIGINT), doc_id) AS rn
FROM h
QUALIFY rn <= 15
ORDER BY source, rn
"""


# ---------------------------------------------------------------------------
# End-to-end corpus-prep composition: quality filter -> dedup -> accounting
# ---------------------------------------------------------------------------

def q_corpus_prep(sf_dir: str) -> ray.data.Dataset:
    """The canonical corpus-prep chain as ONE pipeline: quality-gate
    every document (5 <= tokens <= 5000 AND digit-ratio < 0.3, checked
    in EXACT integer form ``10*digits < 3*chars``), exact-dedup the
    survivors keeping the min doc_id per text, then account the kept
    corpus per source (docs + total tokens) — the end-to-end "what do
    we actually train on" report.

    Scale shape: the quality gate is a stateless vectorized filter
    fused into the scan; dedup ships one (hash, min(doc_id*K+src),
    ntok) partial per distinct surviving text per batch (the keeper's
    source rides the doc_id in a composite int64 — NO join back to the
    winning row); the final per-source rollup is a bounded groupby."""
    from ..functions.text import char_counts_nospace, digit_count, fingerprint64, token_count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    # global bounded source registry, broadcast once; the composite
    # multiplier scales with it (power of two >= registry size), so a
    # wider registry just uses more low bits — the only ceiling is
    # doc_id * K < 2^63
    src_reg = sorted(
        {
            r["source"]
            for r in read_table(sf_dir, "documents", columns=["source"])
            .map_batches(
                lambda t: pa.table(
                    {"source": pc.unique(t["source"].combine_chunks())}
                ),
                batch_format="pyarrow",
            )
            .take_all()
        }
    )
    mult = 1
    while mult < len(src_reg):
        mult *= 2
    reg_ref = ray.put((np.array(src_reg), mult))

    def partial(t: pa.Table) -> pa.Table:
        reg, mult_ = ray.get(reg_ref)
        text = t["text"].combine_chunks()
        ntok = token_count(text).to_numpy(zero_copy_only=False).astype(np.int64)
        nosp = char_counts_nospace(text).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dig = digit_count(text).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ntok >= 5) & (ntok <= 5000) & (10 * dig < 3 * nosp)
        t2 = pa.table(
            {
                "h": pa.array(fingerprint64(text).view(np.int64)),
                "doc_id": t["doc_id"],
                "source": t["source"],
                "ntok": pa.array(ntok),
            }
        ).filter(pa.array(keep))
        # composite keeper key: doc_id * mult + GLOBAL source index;
        # min over the composite = min doc_id (doc_id is unique), and
        # the keeper's source decodes from k % mult — no join back
        sidx = np.searchsorted(
            reg, t2["source"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        did = t2["doc_id"].to_numpy(zero_copy_only=False)
        comp = pa.table(
            {
                "h": t2["h"],
                "k": pa.array(did * mult_ + sidx),
                "ntok": t2["ntok"],
            }
        )
        g = comp.group_by("h").aggregate([("k", "min"), ("ntok", "max")])
        return pa.table(
            {
                "h": g["h"],
                "k": pc.cast(g["k_min"], pa.int64()),
                "ntok": pc.cast(g["ntok_max"], pa.int64()),
            }
        )

    deduped = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("k", alias_name="k"), Max("ntok", alias_name="ntok"))
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("source", pa.string()), ("one", pa.int64()), ("ntok", pa.int64())]
            ).empty_table()
        reg, mult_ = ray.get(reg_ref)
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": pa.array(reg[(k % mult_).astype(np.int64)]),
                "one": pa.array(np.ones(len(t), np.int64)),
                "ntok": pc.cast(t["ntok"], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            }
        )

    return (
        deduped.map_batches(rollup, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("one", alias_name="n_docs"), Sum("ntok", alias_name="n_tokens"))
        .map_batches(finish, batch_format="pyarrow")
    )


Q_CORPUS_PREP_SQL = r"""
WITH q AS (
  SELECT doc_id, source, text,
         CASE WHEN length(trim(text, ' ')) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text, ' '), '\s+')) END
           AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_chars_nospace,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
  FROM documents
), f AS (
  SELECT * FROM q
  WHERE n_tokens >= 5 AND n_tokens <= 5000
    AND 10 * n_digits < 3 * n_chars_nospace
), keeper AS (
  SELECT source, n_tokens,
         doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_keeper
  FROM f
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM keeper WHERE is_keeper
GROUP BY source
"""
