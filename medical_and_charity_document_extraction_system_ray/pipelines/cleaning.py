"""Corpus-cleaning operators — the scrub/filter/score stages a
training-data pipeline runs before tokenization: pattern redaction,
stopword filtering, corpus-LM quality scoring, token-diversity scoring.

All stages are stateless vectorized ``map_batches`` over Arrow batches
(RE2 kernels / numpy segment math); the unigram-LM pass broadcasts the
corpus vocabulary once via ``ray.put`` (31 tokens here; at real vocab
scale swap the broadcast for a hash join on token, same as the TF-IDF
stage documents).  The reference has no corpus-cleaning surface — these
extend the engine for LLM-data preparation per the brief; the redaction
semantics (regex find/replace producing both the cleaned text and a hit
count) mirror every production PII-scrub stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.text import floor6, token_count
from ..functions.cluster import derive_buckets
from ..sources.readers import read_table


def _arr(x: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Collapse a (possibly chunked) column to a single Array."""
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    return x

# ---------------------------------------------------------------------------
# Pattern redaction (PII-scrub shape): regex -> mask + hit count
# ---------------------------------------------------------------------------

# The corpus is synthetic word-salad (no emails/SSNs), so the "sensitive
# entity" pattern is the two brand-like tokens that actually occur; a
# production run passes its own PII alternation — the operator shape
# (one RE2 replace + one RE2 count per batch) is unchanged.
REDACT_PATTERN = r"\b(customer|spark)\b"
REDACT_MASK = "[ENT]"


def q_pattern_redaction(sf_dir: str) -> ray.data.Dataset:
    """Redact a sensitive-entity regex from every document: emit the
    cleaned text, the number of hits, and the cleaned length.

    Both the replace and the count are single RE2 kernels over the whole
    batch (`pc.replace_substring_regex` / `pc.count_substring_regex`) —
    no python row loop, no driver materialization."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(t["text"], REDACT_PATTERN, REDACT_MASK)
        hits = pc.cast(pc.count_substring_regex(t["text"], REDACT_PATTERN), pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "redacted": red,
                "n_hits": hits,
                "red_len": pc.cast(pc.utf8_length(red), pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


Q_REDACTION_SQL = r"""
SELECT doc_id,
       regexp_replace(text, '\b(customer|spark)\b', '[ENT]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\b(customer|spark)\b')) AS BIGINT) AS n_hits,
       CAST(length(regexp_replace(text, '\b(customer|spark)\b', '[ENT]', 'g')) AS BIGINT)
         AS red_len
FROM documents
"""


# ---------------------------------------------------------------------------
# Stopword filtering
# ---------------------------------------------------------------------------

STOPWORD_PATTERN = r"\b(the|a)\b"


def q_stopword_filter(sf_dir: str) -> ray.data.Dataset:
    """Remove stopwords, renormalize whitespace, report tokens removed.

    Three chained RE2 kernels per batch: drop the stopword tokens,
    collapse the resulting runs of spaces, trim the ends; the removed
    count is tokens-before minus tokens-after (cheaper than a second
    regex count and bit-identical to it for word-bounded patterns)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def filt(t: pa.Table) -> pa.Table:
        before = pc.cast(token_count(t["text"]), pa.int64())
        stripped = pc.replace_substring_regex(t["text"], STOPWORD_PATTERN, "")
        collapsed = pc.utf8_trim(
            pc.replace_substring_regex(stripped, r"\s+", " "), " "
        )
        after = pc.cast(token_count(collapsed), pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": collapsed,
                "n_tokens": after,
                "n_removed": pc.subtract(before, after),
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


Q_STOPWORD_SQL = r"""
WITH cleaned AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(text, '\b(the|a)\b', '', 'g'),
                             '\s+', ' ', 'g'), ' ') AS clean_text
  FROM documents
), counted AS (
  SELECT doc_id, clean_text,
         CASE WHEN length(trim(text, ' ')) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text, ' '), '\s+')) END AS n_before,
         CASE WHEN length(clean_text) = 0 THEN 0
              ELSE len(regexp_split_to_array(clean_text, '\s+')) END AS n_tokens
  FROM cleaned
)
SELECT doc_id, clean_text,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_before - n_tokens AS BIGINT) AS n_removed
FROM counted
"""


# ---------------------------------------------------------------------------
# Unigram-LM quality scoring (corpus-probability perplexity proxy)
# ---------------------------------------------------------------------------

def q_unigram_lm_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-document average token log-probability under the corpus's own
    unigram LM — the classic cheap perplexity proxy for quality filtering.

    Two passes: (1) global token counts via per-batch Arrow group_by
    partials + one vocabulary-sized ``groupby('token')`` shuffle; the
    count table is broadcast once with ``ray.put`` (vocab is tiny here;
    at web-vocab scale swap the broadcast for a token hash join); (2)
    per batch, tokens are exploded and scored with an ``index_in``
    lookup + ``np.add.reduceat`` segment sums — no python row loop, a
    doc's tokens never leave its batch.  ``ln`` parity with DuckDB holds
    (same libm, see the TF-IDF stage); the final ratio is floored to the
    1e-6 grid.  Zero-token documents are excluded (the SQL side has no
    token rows for them)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pa.table({"token": pc.list_flatten(toks)})
        flat = flat.filter(pc.not_equal(flat["token"], ""))
        g = flat.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    vocab = counts.to_arrow_refs()
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ray.get(vocab)]
    vt = pa.concat_tables([t for t in tabs if t.num_rows], promote_options="default")
    tok_chunked = vt["token"].combine_chunks()
    tokens = tok_chunked.chunk(0) if isinstance(tok_chunked, pa.ChunkedArray) else tok_chunked
    cnt = vt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(cnt.sum())
    logp = np.log(cnt.astype(np.float64) / float(total))
    vocab_ref = ray.put((tokens, logp))

    def score(t: pa.Table) -> pa.Table:
        tok_arr, lp = ray.get(vocab_ref)
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # drop "" tokens (edge \t/\n produce them, since the trim only
        # strips ' ' while the split is \s+) — mirroring count_partial,
        # so the vocab and the scored stream agree with the SQL's
        # `WHERE token <> ''`
        good = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(good))
        parent = parent[good]
        nrows = t.num_rows
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
        idx = pc.fill_null(
            pc.index_in(flat, value_set=tok_arr), 0
        ).to_numpy(zero_copy_only=False)
        tok_lp = lp[idx.astype(np.int64)]
        # the filtered stream stays row-grouped in order, so offsets are
        # just the cumulative per-row counts
        offsets = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        keep = n_tok > 0
        sums = np.zeros(nrows, dtype=np.float64)
        if keep.any() and len(tok_lp):
            sums[keep] = np.add.reduceat(tok_lp, offsets[keep])
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        avg = sums[keep] / n_tok[keep]
        # floor on the 1e-6 grid; scores are negative, so floor toward
        # -inf matches SQL FLOOR exactly (both IEEE floor)
        return pa.table(
            {
                "doc_id": doc_id,
                "n_tokens": n_tok[keep],
                "avg_logp": floor6(avg),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_UNIGRAM_LM_SQL = r"""
WITH tok_raw AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text, ' '), '\s+')) AS token
  FROM documents WHERE length(trim(text, ' ')) > 0
), tok AS (
  SELECT doc_id, token FROM tok_raw WHERE token <> ''
), cnt AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total FROM cnt
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       FLOOR(AVG(ln(CAST(c.c AS DOUBLE) / tot.total)) * 1000000) / 1000000
         AS avg_logp
FROM tok t JOIN cnt c USING (token) CROSS JOIN tot
GROUP BY t.doc_id, tot.total
"""


# ---------------------------------------------------------------------------
# Token-diversity scoring (exact rational arithmetic — no transcendentals)
# ---------------------------------------------------------------------------

def q_token_diversity(sf_dir: str) -> ray.data.Dataset:
    """Per-document token-diversity signals: distinct-token count,
    type-token ratio, and Gini impurity of the token distribution
    (1 - sum((c_i/n)^2)) — repetitive low-quality documents score low.

    Fully vectorized and *exact*: per-doc token counts come from one
    ``np.unique`` over (row, token-id) composites, the Gini numerator is
    integer arithmetic, and the only float ops are two divisions of
    exactly-representable integers — bit-identical to the SQL."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def diversity(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.utf8_length(pc.utf8_trim(t["text"], " ")), 0)
        n = np.where(empty.to_numpy(zero_copy_only=False), 0, n)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        # token-id within the batch via dictionary encode
        tok_id = _arr(pc.dictionary_encode(_arr(flat))).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nvocab = int(tok_id.max()) + 1 if len(tok_id) else 1
        composite = parent.astype(np.int64) * nvocab + tok_id
        uniq, counts = np.unique(composite, return_counts=True)
        row_of = uniq // nvocab
        nrows = t.num_rows
        distinct = np.bincount(row_of, minlength=nrows).astype(np.int64)
        sumsq = np.bincount(row_of, weights=(counts.astype(np.float64)) ** 2,
                            minlength=nrows).astype(np.int64)
        keep = n > 0
        nk = n[keep].astype(np.float64)
        gini = 1.0 - sumsq[keep].astype(np.float64) / (nk * nk)
        ttr = distinct[keep].astype(np.float64) / nk
        return pa.table(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
                "n_tokens": n[keep],
                "distinct_tokens": distinct[keep],
                "gini": floor6(gini),
                "type_token_ratio": floor6(ttr),
            }
        )

    return ds.map_batches(diversity, batch_format="pyarrow", zero_copy_batch=True)


Q_TOKEN_DIVERSITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text, ' '), '\s+')) AS token
  FROM documents WHERE length(trim(text, ' ')) > 0
), per AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS distinct_tokens,
       FLOOR((1.0 - CAST(SUM(c * c) AS DOUBLE)
                    / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)))
             * 1000000) / 1000000 AS gini,
       FLOOR((CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE))
             * 1000000) / 1000000 AS type_token_ratio
FROM per GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Source-drift scoring: Jensen-Shannon divergence per source vs corpus
# ---------------------------------------------------------------------------

def q_source_jsd(sf_dir: str) -> pa.Table:
    """Jensen-Shannon divergence of every source's token distribution
    from the whole-corpus distribution — the drift/outlier signal used
    to spot a crawl shard gone bad before it trains.

    Distributed part: per-batch (source, token) count partials + one
    vocabulary-x-sources groupby (the only shuffle; rows = distincts,
    never occurrences).  The |sources| x |vocab| count grid is tiny and
    is finished on the driver in numpy (same shape as
    ``q_source_mixing_weights``).  ``ln`` parity per the TF-IDF
    precedent; result floored to the 1e-6 grid."""

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        src = _arr(t["source"]).take(parent)
        tmp = pa.table({"source": src, "token": flat})
        tmp = tmp.filter(pc.not_equal(tmp["token"], ""))
        g = tmp.group_by(["source", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "token", "n"])

    grid = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # pivot to sources x vocab counts (tiny: distinct sources x vocab)
    pv = grid.pivot_table(index="source", columns="token", values="n",
                          aggfunc="sum", fill_value=0).sort_index(axis=0).sort_index(axis=1)
    c = pv.to_numpy(dtype=np.float64)          # [n_sources, vocab]
    gc = c.sum(axis=0)                         # corpus counts per token
    p = c / c.sum(axis=1, keepdims=True)       # per-source distribution
    q = gc / gc.sum()                          # corpus distribution
    m = (p + q[None, :]) / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        p_term = np.where(p > 0, 0.5 * p * np.log(p / m), 0.0)
        q_term = 0.5 * q[None, :] * np.log(q[None, :] / m)
    jsd = floor6((p_term + q_term).sum(axis=1))
    return pa.table(
        {
            "source": pa.array(pv.index.to_list(), type=pa.string()),
            "jsd": pa.array(jsd, type=pa.float64()),
        }
    )


Q_SOURCE_JSD_SQL = r"""
WITH tok AS (
  SELECT source, UNNEST(regexp_split_to_array(trim(text, ' '), '\s+')) AS token
  FROM documents WHERE length(trim(text, ' ')) > 0
), sc AS (
  SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token
), vocab AS (
  SELECT token, CAST(SUM(c) AS BIGINT) AS gc FROM sc GROUP BY token
), stot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM sc GROUP BY source
), gtot AS (
  SELECT CAST(SUM(gc) AS BIGINT) AS total FROM vocab
), grid AS (
  SELECT s.source, v.token, COALESCE(sc.c, 0) AS c, v.gc, s.tot, g.total
  FROM stot s CROSS JOIN vocab v
  LEFT JOIN sc ON sc.source = s.source AND sc.token = v.token
  CROSS JOIN gtot g
), terms AS (
  SELECT source,
         (CASE WHEN c > 0 THEN 0.5 * (CAST(c AS DOUBLE)/tot)
               * ln((CAST(c AS DOUBLE)/tot)
                    / ((CAST(c AS DOUBLE)/tot + CAST(gc AS DOUBLE)/total)/2))
               ELSE 0 END)
         + 0.5 * (CAST(gc AS DOUBLE)/total)
           * ln((CAST(gc AS DOUBLE)/total)
                / ((CAST(c AS DOUBLE)/tot + CAST(gc AS DOUBLE)/total)/2))
           AS term
  FROM grid
)
SELECT source, FLOOR(SUM(term) * 1000000) / 1000000 AS jsd
FROM terms GROUP BY source
"""


# ---------------------------------------------------------------------------
# Repeated-passage removal (C4-style cross-document segment dedup)
# ---------------------------------------------------------------------------

_SEG_LEN = 8
_SEG_P = np.uint64(1099511628211)


def q_segment_dedup(sf_dir: str, min_docs: int = 2) -> ray.data.Dataset:
    """C4/RefinedWeb-style repeated-passage removal: split every doc
    into consecutive non-overlapping 8-token segments; a segment whose
    exact text occurs in >= ``min_docs`` DISTINCT documents is removed
    from all of them.  Emits per doc (n_segments, n_dropped,
    kept_tokens = n_tokens - 8*n_dropped).

    Scale shape: ONE scan — the explode emits (bucket, seg_hash,
    doc_id, occ) with per-doc stats riding the same table under
    stats-buckets (64+doc_id%64, so no single-group skew) — then a
    64+64-way bucket groupby resolves segment frequency fully
    vectorized (sorted run lengths, no per-segment python), and a final
    doc_id groupby merges partials.  The shuffle carries 32 B/segment
    (hash+ids), never segment text; frequency is exact, not sketched.
    Segment identity is a Horner fold of the 8 token hashes — the SQL
    oracle compares the actual segment strings, so a hash collision
    would surface as a gate mismatch."""
    from .dedup import _token_hashes_per_row

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # fan-out derived from live cluster CPUs on the DRIVER (all batches
    # of one query must agree on nb); results are invariant to nb
    nb = derive_buckets()
    weights = _SEG_P ** np.arange(_SEG_LEN - 1, -1, -1, dtype=np.uint64)

    mid_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("seg_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("occ", pa.int64()),
        ]
    )

    def explode(t: pa.Table) -> pa.Table:
        th, rows = _token_hashes_per_row(_arr(t["text"]))
        doc_np = _arr(t["doc_id"]).to_numpy(zero_copy_only=False)
        n_rows = t.num_rows
        n_tok = np.bincount(rows, minlength=n_rows).astype(np.int64)
        n_seg = n_tok // _SEG_LEN
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]]).astype(np.int64)
        pos = np.arange(rows.size, dtype=np.int64) - starts[rows]
        keep = pos < n_seg[rows] * _SEG_LEN
        with np.errstate(over="ignore"):
            contrib = th[keep] * weights[pos[keep] % _SEG_LEN]
            # kept tokens are row-major prefixes, so each segment's 8
            # contributions are consecutive: one reshape-sum, no scatter
            seg_hash = contrib.reshape(-1, _SEG_LEN).sum(
                axis=1, dtype=np.uint64
            )
        seg_doc = np.repeat(doc_np, n_seg)
        # occurrences per (hash, doc) — docs never span batches, so
        # these rows are globally unique after the local collapse
        order = np.lexsort((seg_hash, seg_doc))
        h, d = seg_hash[order], seg_doc[order]
        if h.size:
            bnd = np.concatenate([[True], (h[1:] != h[:-1]) | (d[1:] != d[:-1])])
            idx = np.flatnonzero(bnd)
            occ = np.diff(np.concatenate([idx, [h.size]]))
            hu, du = h[idx], d[idx]
        else:
            hu = np.empty(0, np.uint64)
            du = occ = np.empty(0, np.int64)
        hi = hu.view(np.int64)
        seg_part = pa.table(
            {
                "bucket": pa.array((hu % np.uint64(nb)).astype(np.int64)),
                "seg_hash": pa.array(hi),
                "doc_id": pa.array(du.astype(np.int64)),
                "occ": pa.array(occ.astype(np.int64)),
            },
            schema=mid_schema,
        )
        # per-doc stats ride the same table: bucket >= nb,
        # seg_hash carries n_tokens, occ carries n_segments
        stats_part = pa.table(
            {
                "bucket": pa.array(nb + (doc_np % nb)),
                "seg_hash": pa.array(n_tok),
                "doc_id": pa.array(doc_np),
                "occ": pa.array(n_seg),
            },
            schema=mid_schema,
        )
        return pa.concat_tables([seg_part, stats_part])

    mid = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_segments", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_dropped", pa.int64()),
        ]
    )

    def resolve(g: "pd.DataFrame") -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        if int(g["bucket"].iloc[0]) >= nb:
            return pa.table(
                {
                    "doc_id": pa.array(g["doc_id"].to_numpy()),
                    "n_segments": pa.array(g["occ"].to_numpy()),
                    "n_tokens": pa.array(g["seg_hash"].to_numpy()),
                    "n_dropped": pa.array(np.zeros(len(g), np.int64)),
                },
                schema=part_schema,
            )
        h = g["seg_hash"].to_numpy()
        d = g["doc_id"].to_numpy()
        occ = g["occ"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        bnd = np.concatenate([[True], hs[1:] != hs[:-1]])
        run_id = np.cumsum(bnd) - 1
        run_len = np.bincount(run_id)
        frequent = run_len[run_id] >= min_docs  # rows unique per doc
        sel = order[frequent]
        if sel.size == 0:
            return part_schema.empty_table()
        docs_u, inv = np.unique(d[sel], return_inverse=True)
        dropped = np.bincount(inv, weights=occ[sel]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(docs_u),
                "n_segments": pa.array(np.zeros(docs_u.size, np.int64)),
                "n_tokens": pa.array(np.zeros(docs_u.size, np.int64)),
                "n_dropped": pa.array(dropped),
            },
            schema=part_schema,
        )

    parts = mid.groupby("bucket").map_groups(resolve, batch_format="pandas")

    agg = parts.groupby("doc_id").aggregate(
        Sum("n_segments", alias_name="n_segments"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_dropped", alias_name="n_dropped"),
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_segments", pa.int64()),
            ("n_dropped", pa.int64()),
            ("kept_tokens", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        kept = pc.subtract(
            t["n_tokens"], pc.multiply(t["n_dropped"], pa.scalar(8, pa.int64()))
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_segments": t["n_segments"],
                "n_dropped": t["n_dropped"],
                "kept_tokens": kept,
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q_SEGMENT_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                               '\s+') AS ws
  FROM documents
), segs AS (
  SELECT doc_id, len(ws) AS n_tokens,
         list_transform(range(0, len(ws) // 8),
                        i -> array_to_string(ws[i*8+1 : i*8+8], ' ')) AS seglist
  FROM toks
), ex AS (
  SELECT doc_id, UNNEST(seglist) AS seg FROM segs
), freq AS (
  SELECT seg FROM ex GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2
), dropped AS (
  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dropped
  FROM ex e JOIN freq f USING (seg) GROUP BY e.doc_id
)
SELECT s.doc_id,
       CAST(len(s.seglist) AS BIGINT) AS n_segments,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(s.n_tokens - 8 * COALESCE(d.n_dropped, 0) AS BIGINT) AS kept_tokens
FROM segs s LEFT JOIN dropped d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Boilerplate prefix detection (shared headers/footers shape)
# ---------------------------------------------------------------------------

def q_boilerplate_prefixes(sf_dir: str, k: int = 8, min_docs: int = 2) -> ray.data.Dataset:
    """Leading-boilerplate detection: the first ``k`` tokens of each doc
    form its prefix; prefixes shared by >= ``min_docs`` DISTINCT docs
    are reported with their doc counts — the header/footer-boilerplate
    sweep every web pipeline runs before dedup.

    Scale shape: per-batch partials collapse to one (prefix, n_docs)
    row per distinct prefix per batch (a doc never spans batches), so
    the single groupby shuffles ~60 B/distinct-prefix; no full text
    moves."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    out_schema = pa.schema([("prefix", pa.string()), ("n_docs", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.replace_substring_regex(_arr(t["text"]), r"^\s+|\s+$", "")
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        keep = nt >= k
        sliced = pc.list_slice(toks.filter(pa.array(keep)), 0, k)
        joined = pc.binary_join(pc.cast(sliced, pa.list_(pa.string())), " ")
        return (
            pa.table({"prefix": joined})
            .group_by("prefix")
            .aggregate([("prefix", "count")])
            .rename_columns(["prefix", "n_docs"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prefix")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prefix" not in t.column_names:
            return out_schema.empty_table()
        f = t.filter(pc.greater_equal(t["n_docs"], pa.scalar(min_docs, pa.int64())))
        return pa.table(
            {"prefix": f["prefix"], "n_docs": f["n_docs"]}, schema=out_schema
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q_BOILERPLATE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                               '\s+') AS ws
  FROM documents
)
SELECT array_to_string(ws[1:8], ' ') AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM toks WHERE len(ws) >= 8
GROUP BY prefix HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (CDC: rolling-hash breakpoints)
# ---------------------------------------------------------------------------

_CDC_P = np.uint64(1099511628211)   # the Horner base every oracle shares
_CDC_W = 8                           # rolling-window chars
_CDC_MASK = 64                       # break when window hash % 64 == 0


def q_cdc_dedup(sf_dir: str, min_docs: int = 2) -> ray.data.Dataset:
    """Cross-document dedup over CONTENT-DEFINED chunks (the
    rsync/LBFS/FastCDC shape): a chunk boundary falls after any char
    whose trailing 8-char Horner hash is ≡ 0 (mod 64) — so boundaries
    travel with the content, and an insertion near the head of a doc
    re-aligns within ~one chunk instead of shifting every fixed-width
    segment (the known weakness of ``q_segment_dedup``).  A chunk whose
    exact text occurs in >= ``min_docs`` distinct docs is a duplicate;
    emits per doc (n_chunks, n_dup_chunks, dup_chars).

    Scale shape mirrors segment_dedup: one scan emits (bucket,
    chunk_hash, doc_id, occ, chars) plus per-doc stats rows under
    skew-free stats buckets; a 128-way bucket groupby resolves exact
    distinct-doc frequency with sorted run lengths; a final doc_id
    groupby merges partials.  Chunking itself is pure flat-array numpy
    (window hash = 8 shifted multiply-adds; chunk hashes via one
    ``np.add.reduceat`` with end-relative Horner weights) — no per-doc
    python.  The SQL oracle re-derives breakpoints, chunk hashes and
    frequencies from ``unicode()`` codepoints with hugeint arithmetic,
    so chunking drift fails the value gate."""
    from ..functions.text import utf8_codepoints

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # fan-out derived from live cluster CPUs on the DRIVER (all batches
    # of one query must agree on nb); results are invariant to nb
    nb = derive_buckets()
    wpow = _CDC_P ** np.arange(_CDC_W, dtype=np.uint64)  # P^j for cp[i-j]

    mid_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("chunk_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("occ", pa.int64()),
            ("chars", pa.int64()),
        ]
    )

    def explode(t: pa.Table) -> pa.Table:
        cps, rows = utf8_codepoints(_arr(t["text"]))
        doc_np = _arr(t["doc_id"]).to_numpy(zero_copy_only=False)
        n_rows = t.num_rows
        nf = cps.size
        row_counts = np.bincount(rows, minlength=n_rows).astype(np.int64)
        row_ends = np.cumsum(row_counts)
        row_starts = row_ends - row_counts
        idx = np.arange(nf, dtype=np.int64)
        with np.errstate(over="ignore"):
            hwin = np.zeros(nf, dtype=np.uint64)
            # j capped at nf: a batch of only sub-window docs would
            # otherwise slice cps[:negative] (hypothesis-found edge)
            for j in range(min(_CDC_W, nf)):
                hwin[j:] += cps[: nf - j] * wpow[j] if j else cps * wpow[0]
        valid = np.zeros(nf, dtype=bool)
        if nf >= _CDC_W:
            valid[_CDC_W - 1 :] = rows[_CDC_W - 1 :] == rows[: nf - _CDC_W + 1]
        isbrk = valid & (hwin % np.uint64(_CDC_MASK) == 0)
        # a break on a row's last char is a no-op boundary
        isbrk &= idx != (row_ends[rows] - 1)
        brk = np.flatnonzero(isbrk)
        starts_all = np.sort(
            np.concatenate([row_starts[row_counts > 0], brk + 1])
        )
        n_chunk_rows = np.bincount(rows[starts_all], minlength=n_rows).astype(
            np.int64
        )
        if starts_all.size:
            ends_all = np.concatenate([starts_all[1:], [nf]])
            lens = ends_all - starts_all
            cid = np.searchsorted(starts_all, idx, side="right") - 1
            e = ends_all[cid] - 1 - idx
            with np.errstate(over="ignore"):
                # ppow wraps mod 2^64 by design (Horner hash)
                ppow = np.ones(int(lens.max()), dtype=np.uint64)
                for k in range(1, ppow.size):
                    ppow[k] = ppow[k - 1] * _CDC_P
                ch = np.add.reduceat(cps * ppow[e], starts_all, dtype=np.uint64)
            cdoc = doc_np[rows[starts_all]]
            # collapse to (hash, doc) occurrence counts + char sums
            order = np.lexsort((ch, cdoc))
            h, d, ln = ch[order], cdoc[order], lens[order]
            bnd = np.concatenate([[True], (h[1:] != h[:-1]) | (d[1:] != d[:-1])])
            gid = np.cumsum(bnd) - 1
            occ = np.bincount(gid)
            chars = np.bincount(gid, weights=ln).astype(np.int64)
            first = np.flatnonzero(bnd)
            hu, du = h[first], d[first]
        else:
            hu = np.empty(0, np.uint64)
            du = occ = chars = np.empty(0, np.int64)
        chunk_part = pa.table(
            {
                "bucket": pa.array(
                    (hu % np.uint64(nb)).astype(np.int64)
                ),
                "chunk_hash": pa.array(hu.view(np.int64)),
                "doc_id": pa.array(du.astype(np.int64)),
                "occ": pa.array(occ.astype(np.int64)),
                "chars": pa.array(chars),
            },
            schema=mid_schema,
        )
        stats_part = pa.table(
            {
                "bucket": pa.array(nb + (doc_np % nb)),
                "chunk_hash": pa.array(np.zeros(n_rows, np.int64)),
                "doc_id": pa.array(doc_np),
                "occ": pa.array(n_chunk_rows),
                "chars": pa.array(np.zeros(n_rows, np.int64)),
            },
            schema=mid_schema,
        )
        return pa.concat_tables([chunk_part, stats_part])

    mid = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_dup_chunks", pa.int64()),
            ("dup_chars", pa.int64()),
        ]
    )

    def resolve(g: "pd.DataFrame") -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        if int(g["bucket"].iloc[0]) >= nb:
            z = np.zeros(len(g), np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(g["doc_id"].to_numpy()),
                    "n_chunks": pa.array(g["occ"].to_numpy()),
                    "n_dup_chunks": pa.array(z),
                    "dup_chars": pa.array(z),
                },
                schema=part_schema,
            )
        h = g["chunk_hash"].to_numpy()
        d = g["doc_id"].to_numpy()
        occ = g["occ"].to_numpy()
        chars = g["chars"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        bnd = np.concatenate([[True], hs[1:] != hs[:-1]])
        run_id = np.cumsum(bnd) - 1
        run_len = np.bincount(run_id)
        frequent = run_len[run_id] >= min_docs  # (hash, doc) rows unique
        sel = order[frequent]
        if sel.size == 0:
            return part_schema.empty_table()
        docs_u, inv = np.unique(d[sel], return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(docs_u),
                "n_chunks": pa.array(np.zeros(docs_u.size, np.int64)),
                "n_dup_chunks": pa.array(
                    np.bincount(inv, weights=occ[sel]).astype(np.int64)
                ),
                "dup_chars": pa.array(
                    np.bincount(inv, weights=chars[sel]).astype(np.int64)
                ),
            },
            schema=part_schema,
        )

    parts = mid.groupby("bucket").map_groups(resolve, batch_format="pandas")
    agg = parts.groupby("doc_id").aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_dup_chunks", alias_name="n_dup_chunks"),
        Sum("dup_chars", alias_name="dup_chars"),
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_dup_chunks", pa.int64()),
            ("dup_chars", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        return pa.table(
            {f.name: pc.cast(t[f.name], f.type) for f in out_schema},
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q_CDC_DEDUP_SQL = r"""
WITH cps AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(1, length(text)+1), i -> unicode(text[i])) AS cp
  FROM documents
), bnd AS (
  SELECT doc_id, n, cp,
         list_concat(list_concat(
           [CAST(0 AS BIGINT)],
           list_filter(range(8, n), i ->
               list_reduce(list_prepend(CAST(0 AS HUGEINT), cp[i-7:i]),
                   (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
               % 64 = 0)),
           [CAST(n AS BIGINT)]) AS b
  FROM cps WHERE n > 0
), chunks AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), cp[b[k]+1 : b[k+1]]),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) AS h,
         b[k+1] - b[k] AS clen
  FROM bnd, UNNEST(range(1, len(b))) AS u(k)
), freq AS (
  SELECT h FROM chunks GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), dup AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_chunks,
         CAST(SUM(c.clen) AS BIGINT) AS dup_chars
  FROM chunks c JOIN freq f USING (h) GROUP BY c.doc_id
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
  FROM chunks GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_chunks, 0) AS n_chunks,
       COALESCE(u.n_dup_chunks, 0) AS n_dup_chunks,
       COALESCE(u.dup_chars, 0) AS dup_chars
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN dup u USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Dup-rate by length decile (corpus-health calibration, SQL-matched)
# ---------------------------------------------------------------------------

def q_dup_rate_by_length(sf_dir: str) -> ray.data.Dataset:
    """Exact-duplicate rate stratified by document length bucket
    (``min(n_tokens // 10, 9)``) — the classic corpus-health calibration
    showing that duplication concentrates in short documents, used to
    pick length-conditioned dedup thresholds.

    Scale shape (100 TB): the length bucket is a function of the text
    itself, so identical copies share a bucket and NO doc-level join is
    needed — one (text_hash, bucket, count) partial per batch, one
    coarse-bucketed shuffle of those ~24 B rows, a vectorized run-length
    resolve (global count per text; if > 1 every copy is a duplicate),
    then a ≤10-key groupby of (bucket, n_docs, n_dup_docs) partials."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        text = _arr(t["text"])
        h = fingerprint64(text).view(np.int64)
        ntok = token_count(text).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(ntok // 10, 9)
        g = pa.table(
            {"h": pa.array(h), "bucket": pa.array(b)}
        ).group_by(["h", "bucket"]).aggregate([("h", "count")])
        hb = g["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "hb": pa.array((hb % np.uint64(64)).astype(np.int64)),
                "h": g["h"],
                "bucket": g["bucket"],
                "c": pc.cast(g["h_count"], pa.int64()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        b = t["bucket"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, h))
        h, b, c = h[order], b[order], c[order]
        bnd = np.concatenate([[True], h[1:] != h[:-1]])
        idx = np.flatnonzero(bnd)
        c_tot = np.add.reduceat(c, idx)
        b_run = b[idx]
        n_docs = np.bincount(b_run, weights=c_tot, minlength=10).astype(np.int64)
        dup = c_tot > 1
        n_dup = np.bincount(
            b_run[dup], weights=c_tot[dup], minlength=10
        ).astype(np.int64)
        keep = n_docs > 0
        return pa.table(
            {
                "bucket": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n_docs": pa.array(n_docs[keep]),
                "n_dup_docs": pa.array(n_dup[keep]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        du = t["n_dup_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pc.cast(t["bucket"], pa.int64()),
                "n_docs": pa.array(nd),
                "n_dup_docs": pa.array(du),
                "dup_rate": pa.array(floor6(du / nd.astype(np.float64))),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_hb = partials.groupby("hb").map_groups(resolve, batch_format="pyarrow")
    return (
        per_hb.groupby("bucket")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dup_docs", alias_name="n_dup_docs"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


Q_DUP_RATE_BY_LENGTH_SQL = r"""
WITH tk AS (
  SELECT LEAST(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END // 10,
               9) AS bucket,
         COUNT(*) AS c
  FROM documents GROUP BY text, bucket
)
SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs,
       FLOOR(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
             / CAST(SUM(c) AS DOUBLE) * 1000000) / 1000000 AS dup_rate
FROM tk GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Quality-vs-duplication AUC (exact Mann-Whitney with midranks)
# ---------------------------------------------------------------------------

def _auc_fold(
    hist: list[tuple[int, int, int]],
) -> tuple[int, int, int, float]:
    """Fold a (score, pos, neg) histogram into the exact Mann-Whitney
    AUC: num2 = sum_s pos_s * (2*cumneg_<s + neg_s) counts every
    (pos, neg) pair twice (wins x2, ties x1), so AUC = num2/(2*P*N).
    Pure integer arithmetic until one final double division mirrored
    by the SQL oracle; returns (num2, P, N, floor6(auc))."""
    num2 = cumneg = p_tot = n_tot = 0
    for _, pos, neg in sorted(hist):
        num2 += pos * (2 * cumneg + neg)
        cumneg += neg
        p_tot += pos
        n_tot += neg
    if p_tot > 0 and n_tot > 0:
        auc = float(
            np.floor(float(num2) / float(2 * p_tot * n_tot) * 1e6) / 1e6
        )
    else:
        auc = 0.0
    return num2, p_tot, n_tot, auc


def q_quality_auc(sf_dir: str) -> pa.Table:
    """Exact Mann-Whitney AUC of a quality signal (mean token length,
    1e-6 grid) as a separator of duplicated vs unique documents — the
    rank statistic a corpus team reads before wiring a quality score
    into a length/dup-conditioned filter ("does this score actually
    rank dups below uniques?").  Ties get the standard midrank 1/2.

    Scale shape (100 TB): the score is a pure function of the text, so
    it rides the text hash exactly like ``q_dup_rate_by_length``'s
    bucket — NO doc-level join: (1) per-batch (hash, score, count)
    partials; (2) one coarse-bucketed shuffle of those ~28 B rows with a
    vectorized run-length resolve into per-score (pos, neg) doc counts
    (pos = copies of a text that occurs > 1x, neg = unique texts);
    (3) a groupby over the score grid — bounded by the score DOMAIN
    (distinct 1e-6-grid ratios), not the corpus; (4) a bucketed
    two-level fold (per-bucket inner terms + cross terms against the
    buckets' exclusive neg offsets) so the DRIVER sees one row per
    score bucket, never the raw histogram — the same offset algebra as
    ``q_global_running_revenue``.  AUC = sum_s pos_s*(2*cumneg_<s +
    neg_s) / (2*P*N) is exact integer arithmetic until one final
    double division, mirrored term-for-term by the SQL oracle
    (``_auc_fold`` is the property-tested single-node spec)."""
    from ..functions.text import char_counts_nospace, fingerprint64

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        text = _arr(t["text"])
        h = fingerprint64(text).view(np.int64)
        ntok = token_count(text).to_numpy(zero_copy_only=False).astype(np.int64)
        nosp = char_counts_nospace(text).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            mtl = np.where(ntok > 0, nosp / ntok.astype(np.float64), 0.0)
        su = np.floor(mtl * 1e6).astype(np.int64)
        g = (
            pa.table({"h": pa.array(h), "su": pa.array(su)})
            .group_by(["h", "su"])
            .aggregate([("h", "count")])
        )
        hb = g["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "hb": pa.array((hb % np.uint64(64)).astype(np.int64)),
                "h": g["h"],
                "su": g["su"],
                "c": pc.cast(g["h_count"], pa.int64()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        su = t["su"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((su, h))
        h, su, c = h[order], su[order], c[order]
        bnd = np.concatenate([[True], h[1:] != h[:-1]])
        idx = np.flatnonzero(bnd)
        c_tot = np.add.reduceat(c, idx)            # global copies per text
        su_run = su[idx]                           # score rides the text
        # collapse distinct texts -> per-score (pos, neg) partials
        o2 = np.argsort(su_run, kind="stable")
        su_s, ct_s = su_run[o2], c_tot[o2]
        b2 = np.concatenate([[True], su_s[1:] != su_s[:-1]])
        i2 = np.flatnonzero(b2)
        pos = np.add.reduceat(np.where(ct_s > 1, ct_s, 0), i2)
        neg = np.add.reduceat((ct_s == 1).astype(np.int64), i2)
        return pa.table(
            {
                "su": pa.array(su_s[i2]),
                "pos": pa.array(pos.astype(np.int64)),
                "neg": pa.array(neg),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hb")
        .map_groups(resolve, batch_format="pyarrow")
        .groupby("su")
        .aggregate(Sum("pos", alias_name="pos"), Sum("neg", alias_name="neg"))
    )

    # two-level fold: the exact num2 = sum_s pos_s*(2*cumneg_<s+neg_s)
    # decomposes into per-BUCKET inner terms plus a cross term against
    # the buckets' exclusive neg offsets, so the driver only ever sees
    # one row per score bucket (su // 2^20 — a few hundred buckets for
    # any text-derived ratio), never the raw score histogram.
    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("sb", pa.int64()),
                    ("su", pa.int64()),
                    ("pos", pa.int64()),
                    ("neg", pa.int64()),
                ]
            ).empty_table()
        su_np = t["su"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sb": pa.array((su_np // (1 << 20)).astype(np.int64)),
                "su": pc.cast(t["su"], pa.int64()),
                "pos": pc.cast(t["pos"], pa.int64()),
                "neg": pc.cast(t["neg"], pa.int64()),
            }
        )

    def bucket_fold(g: pa.Table) -> pa.Table:
        su_np = g["su"].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        neg = g["neg"].to_numpy(zero_copy_only=False)
        order = np.argsort(su_np, kind="stable")
        p_s, n_s = pos[order], neg[order]
        cumneg_in = np.concatenate([[0], np.cumsum(n_s)[:-1]])
        inner = int((p_s * (2 * cumneg_in + n_s)).sum())
        return pa.table(
            {
                "sb": pa.array([int(g["sb"][0].as_py())], type=pa.int64()),
                "inner": pa.array([inner], type=pa.int64()),
                "pos": pa.array([int(p_s.sum())], type=pa.int64()),
                "neg": pa.array([int(n_s.sum())], type=pa.int64()),
            }
        )

    buckets = (
        hist.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .take_all()
    )
    buckets.sort(key=lambda r: r["sb"])
    num2 = 0
    negoff = 0
    p_tot = 0
    n_tot = 0
    for r in buckets:  # one row per score bucket
        num2 += int(r["inner"]) + 2 * int(r["pos"]) * negoff
        negoff += int(r["neg"])
        p_tot += int(r["pos"])
        n_tot += int(r["neg"])
    if p_tot > 0 and n_tot > 0:
        auc = float(
            np.floor(float(num2) / float(2 * p_tot * n_tot) * 1e6) / 1e6
        )
    else:
        auc = 0.0
    return pa.table(
        {
            "pos_docs": pa.array([p_tot], type=pa.int64()),
            "neg_docs": pa.array([n_tot], type=pa.int64()),
            "auc_num2": pa.array([num2], type=pa.int64()),
            "auc": pa.array([float(auc)], type=pa.float64()),
        }
    )


Q_QUALITY_AUC_SQL = r"""
WITH base AS (
  SELECT text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_chars_nospace
  FROM documents
), scored AS (
  SELECT text,
         CAST(FLOOR(CASE WHEN n_tokens > 0
              THEN CAST(n_chars_nospace AS DOUBLE) / n_tokens ELSE 0 END
              * 1000000) AS BIGINT) AS su
  FROM base
), lab AS (
  SELECT su, COUNT(*) AS c FROM scored GROUP BY text, su
), h AS (
  SELECT su,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS neg
  FROM lab GROUP BY su
), cum AS (
  SELECT su, pos, neg,
         CAST(COALESCE(SUM(neg) OVER (ORDER BY su
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumneg
  FROM h
)
SELECT CAST(SUM(pos) AS BIGINT) AS pos_docs,
       CAST(SUM(neg) AS BIGINT) AS neg_docs,
       CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2,
       CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0
            THEN FLOOR(CAST(SUM(pos * (2 * cumneg + neg)) AS DOUBLE)
                 / (2 * SUM(pos) * SUM(neg)) * 1000000) / 1000000
            ELSE 0.0 END AS auc
FROM cum
"""


# ---------------------------------------------------------------------------
# Pearson chi-square independence: lang x source contingency
# ---------------------------------------------------------------------------

def q_lang_source_chi2(sf_dir: str) -> pa.Table:
    """Pearson chi-square statistic for independence of ``lang`` and
    ``source`` — the corpus-composition shift test ("did shard 7 start
    feeding us a different language mix?").

    Scale shape: per-batch (lang, source) count partials, ONE groupby
    over the bounded langs-x-sources grid, then the driver finishes the
    tiny contingency in numpy (``q_source_jsd`` precedent).  All
    expected counts come from exact integer marginals; the only floats
    are the final per-cell (o-e)^2/e terms, floored to the 1e-6 grid
    after the sum (Q_SOURCE_JSD_SQL's parity recipe).  Zero cells of
    the full grid are included (e > 0 whenever both marginals are)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "n"])

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pv = grid.pivot_table(
        index="lang", columns="source", values="n", aggfunc="sum", fill_value=0
    ).sort_index(axis=0).sort_index(axis=1)
    c = pv.to_numpy(dtype=np.int64)
    total = int(c.sum())
    row = c.sum(axis=1).astype(np.float64)
    col = c.sum(axis=0).astype(np.float64)
    e = row[:, None] * col[None, :] / float(total)
    chi2 = floor6(float((((c - e) ** 2) / e).sum()))
    dof = (c.shape[0] - 1) * (c.shape[1] - 1)
    return pa.table(
        {
            "n_docs": pa.array([total], type=pa.int64()),
            "dof": pa.array([dof], type=pa.int64()),
            "chi2": pa.array([float(chi2)], type=pa.float64()),
        }
    )


Q_LANG_SOURCE_CHI2_SQL = """
WITH cnt AS (
  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
), rl AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS rc FROM cnt GROUP BY lang
), cs AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS cc FROM cnt GROUP BY source
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
), grid AS (
  SELECT rl.lang, cs.source, COALESCE(cnt.c, 0) AS c,
         CAST(rl.rc AS DOUBLE) * cs.cc / tot.n AS e
  FROM rl CROSS JOIN cs
  LEFT JOIN cnt ON cnt.lang = rl.lang AND cnt.source = cs.source
  CROSS JOIN tot
)
SELECT (SELECT n FROM tot) AS n_docs,
       CAST(((SELECT COUNT(*) FROM rl) - 1) * ((SELECT COUNT(*) FROM cs) - 1)
            AS BIGINT) AS dof,
       FLOOR(SUM((c - e) * (c - e) / e) * 1000000) / 1000000 AS chi2
FROM grid
"""


# ---------------------------------------------------------------------------
# Unicode-hygiene audit: NFC conformance, non-ASCII and control chars
# ---------------------------------------------------------------------------

def q_unicode_audit(sf_dir: str) -> ray.data.Dataset:
    """Per-document Unicode hygiene: non-ASCII codepoint count, control
    characters outside tab/newline, and NFC conformance — the encoding
    triage every multilingual ingest runs before tokenization (mojibake
    shows up as control chars + non-NFC combining marks).

    Vectorization: both codepoint-class counts are single RE2 kernels
    over the batch.  The NFC check rides an ASCII FAST PATH (pure-ASCII
    text is NFC by definition, and pyarrow 16's ``utf8_normalize``
    decomposes for every form — unusable), so the per-row
    ``unicodedata.normalize`` comparison runs ONLY over the non-ASCII
    tail of each batch, which in a web corpus is the minority slice and
    in this fixture corpus is empty."""
    import unicodedata

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def audit(t: pa.Table) -> pa.Table:
        text = _arr(t["text"])
        nonascii = pc.cast(
            pc.count_substring_regex(text, r"[^\x00-\x7F]"), pa.int64()
        )
        ctrl = pc.cast(
            pc.count_substring_regex(text, r"[\x00-\x08\x0B-\x1F\x7F]"),
            pa.int64(),
        )
        na = nonascii.to_numpy(zero_copy_only=False)
        is_nfc = np.ones(len(t), dtype=bool)
        tail = np.nonzero(na > 0)[0]
        if tail.size:
            vals = text.take(pa.array(tail)).to_pylist()
            for j, s in zip(tail, vals):
                is_nfc[j] = unicodedata.normalize("NFC", s) == s
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_nonascii": nonascii,
                "n_control": ctrl,
                "is_nfc": pa.array(is_nfc),
            }
        )

    return ds.map_batches(audit, batch_format="pyarrow", zero_copy_batch=True)


Q_UNICODE_AUDIT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[^\x00-\x7F]')) AS BIGINT)
         AS n_nonascii,
       CAST(len(regexp_extract_all(text, '[\x00-\x08\x0B-\x1F\x7F]'))
         AS BIGINT) AS n_control,
       text = nfc_normalize(text) AS is_nfc
FROM documents
"""
