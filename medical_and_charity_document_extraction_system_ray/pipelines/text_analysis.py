"""Text-analysis operators over the ``documents`` table — the
large-scale-training-pipeline extras: token counting, quality scoring,
language ID, document fingerprinting.

All hot paths are vectorized (pyarrow.compute / numpy); the language-ID
stage is a stateful actor pool (profiles built once per actor) — the
canonical warm-state pattern shared with the OCR stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.text import (
    char_counts_nospace,
    digit_count,
    fingerprint64,
    horner_mod64,
    token_count,
)
from ..sources.readers import read_table


# ---------------------------------------------------------------------------
# Token counting + per-language corpus stats (SQL-matched)
# ---------------------------------------------------------------------------

def q_doc_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-language corpus stats: docs, chars, whitespace tokens."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "n_tokens": pc.cast(token_count(t["text"]), pa.int64()),
            }
        )
        return tmp.group_by("lang").aggregate(
            [("n_chars", "sum"), ("n_tokens", "sum"), ("n_chars", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("lang").aggregate(
        Sum("n_chars_sum", alias_name="total_chars"),
        Sum("n_tokens_sum", alias_name="total_tokens"),
        Sum("n_chars_count", alias_name="n_docs"),
    )


Q_DOC_STATS_SQL = """
SELECT lang,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT)
         AS total_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Quality scoring (SQL-matched, per-document)
# ---------------------------------------------------------------------------

def q_quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality signals: token count, non-space chars, digit
    ratio, mean token length — floored to the 1e-6 grid."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.cast(token_count(t["text"]), pa.int64())
        nosp = pc.cast(char_counts_nospace(t["text"]), pa.int64())
        digits = pc.cast(digit_count(t["text"]), pa.int64())
        toks_np = toks.to_numpy(zero_copy_only=False).astype(np.float64)
        nosp_np = nosp.to_numpy(zero_copy_only=False).astype(np.float64)
        dig_np = digits.to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            digit_ratio = np.where(nosp_np > 0, dig_np / nosp_np, 0.0)
            mean_tok_len = np.where(toks_np > 0, nosp_np / toks_np, 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": toks,
                "n_chars_nospace": nosp,
                "digit_ratio": np.floor(digit_ratio * 1e6) / 1e6,
                "mean_token_len": np.floor(mean_tok_len * 1e6) / 1e6,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_chars_nospace,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars_nospace AS BIGINT) AS n_chars_nospace,
       FLOOR(CASE WHEN n_chars_nospace > 0
             THEN CAST(n_digits AS DOUBLE) / n_chars_nospace ELSE 0 END * 1000000) / 1000000
         AS digit_ratio,
       FLOOR(CASE WHEN n_tokens > 0
             THEN CAST(n_chars_nospace AS DOUBLE) / n_tokens ELSE 0 END * 1000000) / 1000000
         AS mean_token_len
FROM base
"""


# ---------------------------------------------------------------------------
# Language ID — stateful actor pool (heuristic stopword/char profiles)
# ---------------------------------------------------------------------------

class LangIdScorer:
    """Actor: language profiles compiled once per actor in __init__.

    Heuristic stopword scorer over {en, de, es, fr, zh}: per batch the
    word stream is extracted ONCE with Arrow kernels (RE2 split on the
    non-word-class), lowered, membership-tested against each profile
    with ``pc.is_in``, and segment-summed per row — no per-row python
    loop.  Ties break alphabetically (de < en < es < fr), matching the
    SQL oracle's CASE cascade.  SQL-matched (Q_LANG_ID_SQL).
    """

    # sorted key order IS the tie-break order
    PROFILES = {
        "de": ("der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "ein"),
        "en": ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with"),
        "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
        "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"),
    }
    WORD_CLASS = "a-zA-ZÀ-ÿ"
    CJK_CLASS = "一-鿿"

    def __init__(self):
        self.langs = sorted(self.PROFILES)
        self.profile_sets = [
            pa.array(self.PROFILES[lang]) for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = len(batch)
        cjk = pc.count_substring_regex(text, f"[{self.CJK_CLASS}]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        total_len = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        toks = pc.split_pattern_regex(text, f"[^{self.WORD_CLASS}]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        rows = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = pc.utf8_lower(flat.filter(pa.array(nonempty)))
        rows = rows[nonempty]
        n_words = np.bincount(rows, minlength=n).astype(np.float64)
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, vs in enumerate(self.profile_sets):
            m = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            hits[:, j] = np.bincount(rows[m], minlength=n)
        best_j = hits.argmax(axis=1)  # first max in column order = alpha tie-break
        best_hits = hits[np.arange(n), best_j].astype(np.float64)
        is_zh = (cjk > 0) & (cjk >= total_len * 0.05)
        no_words = n_words == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            conf = np.where(n_words > 0, best_hits / n_words, 0.0)
        conf = np.floor(conf * 1e6) / 1e6
        conf = np.where(is_zh, 1.0, np.where(no_words, 0.0, conf))
        langs_arr = np.asarray(self.langs, dtype=object)
        pred = langs_arr[best_j].copy()
        pred[best_hits == 0] = "und"
        pred[no_words] = "und"
        pred[is_zh] = "zh"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "pred_lang": pa.array(pred, type=pa.string()),
                "lang_conf": pa.array(conf),
            }
        )


def q_lang_id(
    sf_dir: str, concurrency: int | tuple[int, int] | None = None
) -> ray.data.Dataset:
    if concurrency is None:
        from ..functions.cluster import media_pool_size

        concurrency = media_pool_size()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency, zero_copy_batch=True,
    )


def _in_list(col: str, words: tuple[str, ...]) -> str:
    quoted = ", ".join("'" + w + "'" for w in words)
    return (
        f"len(list_filter(ws, x -> x IN ({quoted}))) AS {col}"
    )


Q_LANG_ID_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         length(regexp_replace(text, '[^{LangIdScorer.CJK_CLASS}]', '', 'g')) AS cjk,
         length(text) AS nchars,
         list_transform(regexp_extract_all(text, '[{LangIdScorer.WORD_CLASS}]+'),
                        x -> lower(x)) AS ws
  FROM documents
), s AS (
  SELECT doc_id, lang, cjk, nchars, len(ws) AS nw,
         {_in_list("h_de", LangIdScorer.PROFILES["de"])},
         {_in_list("h_en", LangIdScorer.PROFILES["en"])},
         {_in_list("h_es", LangIdScorer.PROFILES["es"])},
         {_in_list("h_fr", LangIdScorer.PROFILES["fr"])}
  FROM w
)
SELECT doc_id, lang,
  CASE WHEN cjk > 0 AND cjk >= nchars * 0.05 THEN 'zh'
       WHEN nw = 0 THEN 'und'
       WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
       WHEN h_es >= h_fr THEN 'es'
       ELSE 'fr' END AS pred_lang,
  CASE WHEN cjk > 0 AND cjk >= nchars * 0.05 THEN 1.0
       WHEN nw = 0 THEN 0.0
       ELSE FLOOR(CAST(greatest(h_de, h_en, h_es, h_fr) AS DOUBLE) / nw * 1000000)
            / 1000000 END AS lang_conf
FROM s
"""


# ---------------------------------------------------------------------------
# Document fingerprinting — vectorized rolling hash (SQL-matched)
# ---------------------------------------------------------------------------

def q_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """64-bit content fingerprint per doc (Horner fold of the Unicode
    codepoints, mod 2^64) + a coarse 16-bit bucket — the unit for
    shard-level dedup bookkeeping at scale.  Bit-identical to the
    DuckDB list_reduce expression in Q_FINGERPRINTS_SQL."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        h = fingerprint64(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": h.astype(np.int64),  # two's-complement view
                "bucket": (h >> np.uint64(48)).astype(np.int32),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


Q_FINGERPRINTS_SQL = """
WITH h AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(1, length(text)+1), i -> unicode(text[i]))),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) AS hu
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
            ELSE hu END AS BIGINT) AS fingerprint,
       CAST(hu // 281474976710656 AS INTEGER) AS bucket
FROM h
"""


# ---------------------------------------------------------------------------
# Top-k tokens per language (explode -> two-level aggregate -> grouped top-k)
# ---------------------------------------------------------------------------

def q_top_tokens_per_lang(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """The k most frequent whitespace tokens per language (count DESC,
    token ASC tie-break).

    Scale shape: tokens are exploded AND pre-counted per (batch, lang,
    token) inside ``map_batches`` (vectorized Arrow split + group_by),
    so the shuffle moves one row per distinct (lang, token) per batch —
    never one row per token occurrence.  A final per-lang ``map_groups``
    takes the top k."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def explode_count(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = t["lang"].combine_chunks().take(parent)
        tmp = pa.table({"lang": lang, "token": flat})
        tmp = tmp.filter(pc.not_equal(tmp["token"], ""))  # empty-text rows
        g = tmp.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "n"])

    partials = ds.map_batches(explode_count, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["lang", "token"]).aggregate(Sum("n", alias_name="n"))

    out_schema = pa.schema(
        [("lang", pa.string()), ("token", pa.string()), ("n", pa.int64())]
    )

    def topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "lang" not in g.column_names:
            return out_schema.empty_table()
        g = g.combine_chunks()
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("token", "ascending")]
        )[: min(k, len(g))]
        top = g.take(order)
        return pa.table(
            {
                "lang": top["lang"],
                "token": top["token"],
                "n": pc.cast(top["n"], pa.int64()),
            },
            schema=out_schema,
        )

    return agg.groupby("lang").map_groups(topk, batch_format="pyarrow")


Q_TOP_TOKENS_SQL = r"""
WITH toks AS (
  SELECT lang, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT lang, token, COUNT(*) AS n FROM toks WHERE token <> ''
  GROUP BY lang, token
)
SELECT lang, token, n FROM counts
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) <= 5
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (keyword extraction)
# ---------------------------------------------------------------------------

def q_tfidf_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document (score DESC, token ASC
    tie-break) — the keyword-extraction primitive.

    Two passes, both shuffle-light: (1) document frequencies via
    per-batch DISTINCT (doc, token) explode + groupby count — the DF
    table is vocabulary-sized and broadcast via ``ray.put`` (at 100 TB
    vocab scale swap the broadcast for a hash join on token); (2) per
    batch: Arrow group_by counts tf per (row, token) locally — a doc's
    tokens never leave its batch — idf lookup, score on the 1e-6 floor
    grid, vectorized per-row top-k by run position.  ``ln`` parity
    holds because numpy and DuckDB call the same libm double log."""
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def doc_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc = t["doc_id"].combine_chunks().take(parent)
        tmp = pa.table({"doc_id": doc, "token": flat})
        return tmp.filter(pc.not_equal(tmp["token"], ""))

    # pass 1: document frequency (distinct doc per token)
    def local_distinct(t: pa.Table) -> pa.Table:
        g = doc_tokens(t)
        return g.group_by(["doc_id", "token"]).aggregate([])

    from ray.data.aggregate import Count

    df_tbl = pa.concat_tables(
        b
        for b in (
            ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("token")
            .aggregate(Count(alias_name="df"))
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        if b.num_rows and "token" in b.column_names
    )
    vocab = df_tbl["token"].to_pylist()
    idf = np.log(n_docs / df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64))
    idf_ref = ray.put(dict(zip(vocab, idf)))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("token", pa.string()), ("score", pa.float64())]
    )

    def topk(t: pa.Table) -> pa.Table:
        lookup = ray.get(idf_ref)
        tf = (
            doc_tokens(t)
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "token", "n"])
            .combine_chunks()
        )
        if tf.num_rows == 0:
            return out_schema.empty_table()
        toks = tf["token"].to_pylist()
        idfs = np.fromiter((lookup[x] for x in toks), dtype=np.float64, count=len(toks))
        score = np.floor(
            tf["n"].to_numpy(zero_copy_only=False).astype(np.float64) * idfs * 1e6
        ) / 1e6
        tf = tf.append_column("score", pa.array(score))
        order = pc.sort_indices(
            tf,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("token", "ascending"),
            ],
        )
        srt = tf.take(order)
        docs = srt["doc_id"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], docs[1:] != docs[:-1]])
        run_start = np.maximum.accumulate(np.where(first, np.arange(docs.size), 0))
        keep = (np.arange(docs.size) - run_start) < k
        out = srt.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "token": out["token"],
                "score": out["score"],
            },
            schema=out_schema,
        )

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)


Q_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS n FROM toks WHERE token <> ''
  GROUP BY 1, 2
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks WHERE token <> ''
  GROUP BY 1
), nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token,
       FLOOR(tf.n * ln(CAST(n_docs AS DOUBLE) / df.df) * 1e6) / 1e6 AS score
FROM tf JOIN df USING (token), nd
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY FLOOR(tf.n * ln(CAST(n_docs AS DOUBLE) / df.df)
                                          * 1e6) / 1e6 DESC, token) <= 3
"""


# ---------------------------------------------------------------------------
# Conjunctive term search (inverted-index query shape)
# ---------------------------------------------------------------------------

def q_conjunctive_search(
    sf_dir: str, terms: tuple[str, ...] = ("spark", "window", "merge")
) -> ray.data.Dataset:
    """Documents containing ALL query terms (exact whitespace-token
    match), with the total occurrence count of the query terms.

    Scale shape: the scan is embarrassingly parallel and prunes to the
    query vocabulary inside each batch (an ``is_in`` over the exploded
    tokens — only doc_id + two ints survive), so nothing but matches
    leaves the read.  For a standing query workload, the same per-batch
    explode feeds a (term, doc_id) posting-list build (one groupby);
    this operator is the one-shot scan flavor.
    """
    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    k = len(terms)

    def probe(t: pa.Table) -> pa.Table:
        flat, parent, _n_tok = _tokens_flat(t["text"])
        n_rows = t.num_rows
        hit_terms = np.zeros(n_rows, dtype=np.int64)  # distinct terms present
        n_matches = np.zeros(n_rows, dtype=np.int64)  # total occurrences
        for term in terms:
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            per_row = np.bincount(parent[eq], minlength=n_rows)
            hit_terms += per_row > 0
            n_matches += per_row
        keep = hit_terms == k
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_matches": pa.array(n_matches[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


Q_CONJ_SEARCH_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(tk, t -> t IN ('spark', 'window', 'merge')))
            AS BIGINT) AS n_matches
FROM tk
WHERE list_contains(tk, 'spark')
  AND list_contains(tk, 'window')
  AND list_contains(tk, 'merge')
"""


# ---------------------------------------------------------------------------
# Intra-document repetition scores (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def q_repetition_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-doc repetition signals used by quality-filter rules:
    ``dup_2gram_ratio`` (fraction of 2-gram occurrences whose gram
    repeats within the doc) and ``top_token_ratio`` (share of the most
    frequent token) — high values flag boilerplate/spam for removal.

    Per batch: one token explode feeds both signals; counts come from
    Arrow ``group_by`` over (row, gram), segment-reduced back to rows
    with ``np.add.at``/``np.maximum.at``.  Ratios are single exact
    integer divisions, so the 1e-6 floor grid needs no ulp slack."""
    from .training_prep import _ngrams_flat, _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        flat, parent, n_tok = _tokens_flat(t["text"])
        # 2-gram duplication: occurrences of grams with count >= 2
        grams, g_rows = _ngrams_flat(flat, n_tok, 2)
        dup_occ = np.zeros(n_rows, dtype=np.int64)
        if len(grams):
            cnt = (
                pa.table({"r": pa.array(g_rows), "g": grams})
                .group_by(["r", "g"])
                .aggregate([([], "count_all")])
            )
            c = cnt["count_all"].to_numpy(zero_copy_only=False)
            dup = c >= 2
            np.add.at(dup_occ, cnt["r"].to_numpy(zero_copy_only=False)[dup], c[dup])
        tot2 = np.maximum(n_tok - 1, 0)
        # top token share
        top = np.zeros(n_rows, dtype=np.int64)
        if len(flat):
            cu = (
                pa.table({"r": pa.array(parent), "tok": flat})
                .group_by(["r", "tok"])
                .aggregate([([], "count_all")])
            )
            np.maximum.at(
                top,
                cu["r"].to_numpy(zero_copy_only=False),
                cu["count_all"].to_numpy(zero_copy_only=False),
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            r2 = np.where(tot2 > 0, dup_occ / tot2.astype(np.float64), 0.0)
            ru = np.where(n_tok > 0, top / n_tok.astype(np.float64), 0.0)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "dup_2gram_ratio": pa.array(np.floor(r2 * 1e6) / 1e6),
                "top_token_ratio": pa.array(np.floor(ru * 1e6) / 1e6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_REPETITION_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
), g2 AS (
  SELECT doc_id, array_to_string(list_slice(tk, i + 1, i + 2), ' ') AS g
  FROM (SELECT doc_id, tk, UNNEST(range(0, greatest(len(tk) - 1, 0))) AS i FROM tk)
), c2 AS (
  SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g
), r2 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
         CAST(SUM(c) AS BIGINT) AS tot
  FROM c2 GROUP BY doc_id
), cu AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(tk) AS tok FROM tk) GROUP BY doc_id, tok
), ru AS (
  SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS nt FROM cu GROUP BY doc_id
)
SELECT t.doc_id,
       FLOOR(CASE WHEN COALESCE(r2.tot, 0) > 0
                  THEN CAST(r2.dup_occ AS DOUBLE) / r2.tot ELSE 0 END
             * 1000000) / 1000000 AS dup_2gram_ratio,
       FLOOR(CASE WHEN COALESCE(ru.nt, 0) > 0
                  THEN CAST(ru.mx AS DOUBLE) / ru.nt ELSE 0 END
             * 1000000) / 1000000 AS top_token_ratio
FROM tk t
LEFT JOIN r2 ON r2.doc_id = t.doc_id
LEFT JOIN ru ON ru.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# Regex pattern scan (the PII/pattern-audit shape)
# ---------------------------------------------------------------------------

def q_regex_scan(sf_dir: str) -> ray.data.Dataset:
    """Per-document regex hit counts — the PII / pattern-audit scan
    (emails, IDs, ...) expressed on patterns this corpus actually
    contains.  Fully vectorized: one ``pc.count_substring_regex``
    kernel per pattern per batch (RE2, same engine DuckDB uses, so
    leftmost-non-overlapping counts agree by construction); no shuffle
    at all — embarrassingly parallel over blocks."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    pats = {
        "n_vowel_tok": r"\b[aeiou][a-z]+",
        "n_ing": r"[a-z]+ing\b",
        "n_num": r"[0-9]+",
    }

    def scan(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"]}
        for name, pat in pats.items():
            cols[name] = pc.cast(
                pc.count_substring_regex(t["text"], pat), pa.int64()
            )
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


Q_REGEX_SCAN_SQL = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\b[aeiou][a-z]+')) AS BIGINT)
         AS n_vowel_tok,
       CAST(length(regexp_extract_all(text, '[a-z]+ing\b')) AS BIGINT) AS n_ing,
       CAST(length(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num
FROM documents
"""


# ---------------------------------------------------------------------------
# Token co-occurrence (the topic-modeling / PMI input shape)
# ---------------------------------------------------------------------------

def q_token_cooccurrence(sf_dir: str, vocab_k: int = 40) -> ray.data.Dataset:
    """Document-level co-occurrence counts over the top-``vocab_k``
    vocabulary — the input matrix of every topic-model / PMI / word-
    embedding pipeline.

    Pass 1 computes exact document frequencies (per-batch distinct
    (doc, token) collapse, then a token groupby) and takes the top-k
    vocabulary (df DESC, token ASC) — k rows on the driver.  Pass 2
    builds a docs×k boolean incidence matrix per batch and gets ALL
    pair counts from one ``M.T @ M`` int matmul — no per-doc pair
    loop, and the shuffle moves only k·(k-1)/2 partial rows per batch.
    Pairs are emitted with tok_a < tok_b lexicographically so the SQL
    self-join (`a.token < b.token`) lands on identical keys."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def doc_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc = t["doc_id"].combine_chunks().take(parent)
        tmp = pa.table({"doc_id": doc, "token": flat})
        return tmp.filter(pc.not_equal(tmp["token"], ""))

    def df_partial(t: pa.Table) -> pa.Table:
        dt = doc_tokens(t).group_by(["doc_id", "token"]).aggregate([])
        return (
            dt.group_by(["token"]).aggregate([([], "count_all")])
            .rename_columns(["token", "df"])
        )

    vocab_rows = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .sort(["df", "token"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )
    vocab = sorted(r["token"] for r in vocab_rows)  # lexicographic index order
    vocab_arr = pa.array(vocab, type=pa.string())
    k = len(vocab)

    def pair_partial(t: pa.Table) -> pa.Table:
        dt = doc_tokens(t)
        idx = pc.index_in(dt["token"], value_set=vocab_arr)
        keep = pc.is_valid(idx)
        doc = dt["doc_id"].filter(keep).to_numpy(zero_copy_only=False)
        col = idx.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        if doc.size == 0:
            return pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        _, row = np.unique(doc, return_inverse=True)
        m = np.zeros((row.max() + 1, k), dtype=np.int64)
        m[row, col] = 1  # incidence (dedups repeated tokens in a doc)
        co = m.T @ m
        ai, bi = np.triu_indices(k, 1)
        n = co[ai, bi]
        nz = n > 0
        return pa.table(
            {
                "tok_a": pa.array(np.array(vocab, dtype=object)[ai[nz]], pa.string()),
                "tok_b": pa.array(np.array(vocab, dtype=object)[bi[nz]], pa.string()),
                "n": pa.array(n[nz]),
            }
        )

    partials = ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["tok_a", "tok_b"]).aggregate(Sum("n", alias_name="n_docs"))


Q_COOCCUR_SQL = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), df AS (
  SELECT token, COUNT(*) AS df FROM tok GROUP BY 1
), vocab AS (
  SELECT token FROM df ORDER BY df DESC, token LIMIT 40
)
SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_docs
FROM tok a
JOIN tok b ON a.doc_id = b.doc_id AND a.token < b.token
WHERE a.token IN (SELECT token FROM vocab)
  AND b.token IN (SELECT token FROM vocab)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt: wide per-doc metrics to long (doc_id, metric, value)
# ---------------------------------------------------------------------------

def q_unpivot_doc_metrics(sf_dir: str) -> ray.data.Dataset:
    """Wide→long reshape (UNPIVOT/melt): each document's metrics
    emitted as (doc_id, metric, value) rows — the feature-store /
    metrics-table layout.  Pure per-batch stacking (one table concat
    per batch, metric name as a dictionary-ish constant column), no
    shuffle, streams at any size."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        toks = pc.cast(token_count(t["text"]), pa.int64())
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "doc_id": t["doc_id"],
                        "metric": pa.array(["n_chars"] * n, pa.string()),
                        "value": pc.cast(t["n_chars"], pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "doc_id": t["doc_id"],
                        "metric": pa.array(["n_tokens"] * n, pa.string()),
                        "value": toks,
                    }
                ),
            ]
        )

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


Q_UNPIVOT_SQL = """
SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS BIGINT) AS value
FROM documents
UNION ALL
SELECT doc_id, 'n_tokens' AS metric,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
FROM documents
"""


# ---------------------------------------------------------------------------
# Inverted-index build (token → ordered postings, fingerprinted)
# ---------------------------------------------------------------------------

def q_inverted_index(sf_dir: str) -> ray.data.Dataset:
    """Build the inverted index: per token its document frequency,
    postings range, and a 64-bit Horner fingerprint of the ORDERED
    postings list — the search-index-construction shape (the
    fingerprint stands in for shipping the full postings in the gate
    result; the list itself stays distributed).

    One token explode with per-batch (doc, token) distinct (each doc
    lives in one batch, so batch-distinct IS global), a keyed groupby,
    and a vectorized sort+Horner per token.  Matches the DuckDB
    list_reduce expression bit-for-bit."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def doc_tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc = t["doc_id"].combine_chunks().take(parent)
        tmp = pa.table({"token": flat, "doc_id": doc})
        tmp = tmp.filter(pc.not_equal(tmp["token"], ""))
        return tmp.group_by(["token", "doc_id"]).aggregate([])

    out_schema = pa.schema(
        [
            ("token", pa.string()),
            ("df", pa.int64()),
            ("min_doc", pa.int64()),
            ("max_doc", pa.int64()),
            ("postings_fp", pa.int64()),
        ]
    )

    def build(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "token" not in g.column_names:
            return out_schema.empty_table()
        toks = g["token"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, toks))
        toks, ids = toks[order], ids[order]
        first = np.concatenate([[True], toks[1:] != toks[:-1]])
        row_of = np.cumsum(first) - 1
        n_rows = int(row_of[-1]) + 1
        fp = horner_mod64(ids.astype(np.uint64), row_of, n_rows)
        starts = np.flatnonzero(first)
        lengths = np.diff(np.concatenate([starts, [ids.size]]))
        return pa.table(
            {
                "token": pa.array(toks[starts], pa.string()),
                "df": pa.array(lengths, pa.int64()),
                "min_doc": pa.array(ids[starts]),
                "max_doc": pa.array(ids[starts + lengths - 1]),
                "postings_fp": pa.array(fp.astype(np.int64)),
            },
            schema=out_schema,
        )

    from ..functions.segments import bucket_grouped_str

    partials = ds.map_batches(doc_tok, batch_format="pyarrow", zero_copy_batch=True)
    # the build kernel is segment-safe (lexsort + run boundaries), so
    # shuffle on hash(token) % 64 — a web vocab would otherwise cost one
    # python call per distinct token
    return bucket_grouped_str(partials, "token").map_groups(
        build, batch_format="pyarrow"
    )


Q_INVERTED_INDEX_SQL = r"""
WITH dt AS (
  SELECT DISTINCT token, doc_id FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), l AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         list(doc_id ORDER BY doc_id) AS ids
  FROM dt GROUP BY token
), h AS (
  SELECT token, df, min_doc, max_doc,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(ids, i -> CAST(i AS HUGEINT))),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) AS hu
  FROM l
)
SELECT token, df, min_doc, max_doc,
       CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
            ELSE hu END AS BIGINT) AS postings_fp
FROM h
"""


def q_corpus_checksum(sf_dir: str) -> pa.Table:
    """Order-independent corpus checksum (the anti-entropy / replica
    equality primitive): per row ``rh = fingerprint64(text) *
    (2*doc_id + 1) mod 2^64`` — the odd id-derived factor binds content
    to its key NON-linearly (an additive ``fp*P + id`` mix is
    separable: Σ splits into Σfp + Σid, so swapping two docs' texts
    would cancel) — then ``checksum = Σ rh mod 2^64`` and a row count.
    Additive merge means partials combine in any order at any fan-in:
    the 100 TB shape is one uint64 + one int64 per BLOCK crossing the
    wire, no shuffle at all.  Bit-identical to the DuckDB hugeint
    expression (Q_CORPUS_CHECKSUM_SQL)."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        h = fingerprint64(t["text"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            rh = h * (np.uint64(2) * ids + np.uint64(1))
            s = np.uint64(rh.sum(dtype=np.uint64))
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "sum_i64": pa.array([np.int64(s.view(np.int64))], pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one tiny row per input block
    total = np.uint64(0)
    n = 0
    with np.errstate(over="ignore"):
        for r in parts:
            total += np.int64(r["sum_i64"]).view(np.uint64)
            n += int(r["n_rows"])
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "checksum": pa.array([int(np.int64(total.view(np.int64)))], pa.int64()),
        }
    )


Q_CORPUS_CHECKSUM_SQL = """
WITH h AS (
  SELECT (list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(1, length(text)+1), i -> unicode(text[i]))),
             (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
          * (2 * doc_id + 1)) % 18446744073709551616 AS rh
  FROM documents
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
            ELSE s END AS BIGINT) AS checksum
FROM (SELECT COUNT(*) AS n, SUM(rh) % 18446744073709551616 AS s FROM h)
"""


def q_lang_agreement_kappa(sf_dir: str) -> pa.Table:
    """Cohen's kappa between the DECLARED ``lang`` column and the
    heuristic language-ID prediction — the annotation-agreement metric
    every labeling pipeline reports (chance-corrected, unlike raw
    accuracy).  The contingency matrix is built with per-batch partials
    + one tiny keyed groupby (|langs|² rows); kappa itself is one float
    expression over exact integer counts, so the DuckDB oracle (which
    re-derives the prediction from the same CASE cascade) is
    bit-identical on the 1e-6 grid."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.cluster import media_pool_size

    preds = q_lang_id(sf_dir, concurrency=media_pool_size())

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"lang": t["lang"], "pred_lang": t["pred_lang"]})
            .group_by(["lang", "pred_lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "pred_lang", "c"])
        )

    cells = (
        preds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(_Sum("c", alias_name="c"))
        .to_pandas()
    )
    n = int(cells["c"].sum())
    agree = int(cells.loc[cells["lang"] == cells["pred_lang"], "c"].sum())
    row = cells.groupby("lang")["c"].sum()
    col = cells.groupby("pred_lang")["c"].sum()
    cross = int(sum(int(row[l]) * int(col.get(l, 0)) for l in row.index))
    po = agree / n
    pe = cross / (n * n)
    kappa = (po - pe) / (1 - pe) if pe < 1.0 else 1.0
    g = lambda x: np.floor(x * 1e6 + 1e-3) / 1e6
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "agreement": pa.array([g(po)], pa.float64()),
            "kappa": pa.array([g(kappa)], pa.float64()),
        }
    )


# reuse the lang-id CASE cascade; only the final SELECT differs
Q_LANG_KAPPA_SQL = (
    "WITH pred AS (" + Q_LANG_ID_SQL + """),
cells AS (
  SELECT lang, pred_lang, COUNT(*) AS c FROM pred GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN lang = pred_lang THEN c END), 0) AS BIGINT)
           AS agree
  FROM cells
), marg AS (
  SELECT CAST(COALESCE(SUM(r.rc * co.cc), 0) AS BIGINT) AS crossv
  FROM (SELECT lang, SUM(c) AS rc FROM cells GROUP BY lang) r
  JOIN (SELECT pred_lang, SUM(c) AS cc FROM cells GROUP BY pred_lang) co
    ON r.lang = co.pred_lang
)
SELECT t.n AS n_docs,
       FLOOR(CAST(t.agree AS DOUBLE) / t.n * 1000000 + 0.001) / 1000000
         AS agreement,
       FLOOR((CAST(t.agree AS DOUBLE) / t.n
              - CAST(m.crossv AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n))
             / (1 - CAST(m.crossv AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n))
             * 1000000 + 0.001) / 1000000 AS kappa
FROM tot t, marg m
"""
)


# GPT-2-style pretokenizer, RE2-compatible subset (no lookaheads): both
# Arrow and DuckDB run RE2, so match counts agree by construction
_BPE_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def q_bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-doc token counts under a BPE-ish pretokenizer (the GPT-2
    split regex, RE2-subset) alongside the whitespace count — the
    budget number every training-data pipeline reports.  One vectorized
    RE2 count per batch, no shuffle; per-language totals ride a tiny
    groupby."""
    from ..functions.text import token_count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("ws_tokens", pa.int64()),
            ("bpe_tokens", pa.int64()),
        ]
    )

    def count(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "ws_tokens": pc.cast(token_count(t["text"]), pa.int64()),
                "bpe_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], _BPE_PRETOKEN),
                    pa.int64(),
                ),
            },
            schema=out_schema,
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


Q_BPE_TOKENS_SQL = r"""
SELECT doc_id, lang,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
         AS ws_tokens,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))
         AS BIGINT) AS bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# BPE merge candidates (tokenizer-induction step 1: top adjacent pairs)
# ---------------------------------------------------------------------------

def q_bpe_merge_candidates(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """The first merge step of BPE tokenizer training: the corpus's top
    ``k`` adjacent character pairs by frequency (ties broken by pair
    order — UTF-8 byte order == codepoint order, so both engines agree).

    Scale shape: per-batch pair counting collapses each batch to its
    distinct (pair, n) rows (one ``np.unique`` over codepoint
    composites — bounded by charset², not corpus size), one tiny
    ``groupby(pair)`` merges partials, and the final top-k sorts the
    |charset|² table.  No text leaves its batch."""
    from ..functions.text import utf8_codepoints

    ds = read_table(sf_dir, "documents", columns=["text"])
    _K = np.int64(0x110000)  # > max codepoint: composite is injective

    def partial(t: pa.Table) -> pa.Table:
        cps, rows = utf8_codepoints(t["text"].combine_chunks())
        if cps.size < 2:
            return pa.table(
                {"pair_key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        same = rows[1:] == rows[:-1]
        comp = cps[:-1][same].astype(np.int64) * _K + cps[1:][same]
        u, c = np.unique(comp, return_counts=True)
        return pa.table({"pair_key": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_key")
        .aggregate(Sum("n", alias_name="n"))
    )

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pair_key" not in t.column_names:
            return pa.table(
                {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        key = t["pair_key"].to_numpy(zero_copy_only=False)
        pair = [chr(int(x) // 0x110000) + chr(int(x) % 0x110000) for x in key]
        return pa.table(
            {"pair": pa.array(pair, pa.string()), "n": pc.cast(t["n"], pa.int64())}
        )

    return (
        counts.map_batches(decode, batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )


Q_BPE_MERGE_SQL = """
WITH pairs AS (
  SELECT UNNEST(list_transform(range(1, length(text)),
                               i -> text[i] || text[i+1])) AS pair
  FROM documents WHERE length(text) > 1
), c AS (
  SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair
)
SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20
"""


# ---------------------------------------------------------------------------
# Adjacent-token PMI (collocation mining over the corpus)
# ---------------------------------------------------------------------------

def q_token_pmi(sf_dir: str, min_count: int = 10) -> ray.data.Dataset:
    """Pointwise mutual information of adjacent token pairs —
    collocation mining, the classic corpus-statistics feature for
    phrase detection:

        pmi = ln( (n_ab / N_pair) / ((n_a / N_tok) * (n_b / N_tok)) )

    computed from exact BIGINT counts with the identical
    double-precision expression on both engines, floored to the 1e-6
    grid.  '' tokens (edge whitespace artifacts) are excluded on both
    sides; pairs rarer than ``min_count`` are dropped.

    Scale shape: per-batch distinct (pair, n) partials (dictionary-
    encode + one np.unique over code composites), one pair-keyed
    groupby; the unigram table is broadcast once via ``ray.put`` (tiny
    here — at a web vocab swap the lookup for a token-keyed join)."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        n = code.size
        if n < 2:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        same = parent[1:] == parent[:-1]
        a, b = code[:-1][same], code[1:][same]
        # '' (edge-whitespace artifact) never pairs on either side
        lens = pc.utf8_length(vocab).to_numpy(zero_copy_only=False)
        ok = (lens[a] > 0) & (lens[b] > 0)
        a, b = a[ok], b[ok]
        if a.size == 0:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        v = len(vocab)
        u, c = np.unique(a * v + b, return_counts=True)
        return pa.table(
            {
                "tok_a": vocab.take(pa.array(u // v)).cast(pa.string()),
                "tok_b": vocab.take(pa.array(u % v)).cast(pa.string()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    pair_counts = (
        ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n_ab"))
    )

    def tok_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pa.table({"token": pc.list_flatten(toks)})
        flat = flat.filter(pc.not_equal(flat["token"], ""))
        g = flat.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    uni = (
        ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_arrow_refs()
    )
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ray.get(uni)]
    vt = pa.concat_tables([t for t in tabs if t.num_rows], promote_options="default")
    tok_arr = vt["token"].combine_chunks()
    tok_arr = tok_arr.chunk(0) if isinstance(tok_arr, pa.ChunkedArray) else tok_arr
    cnt = vt["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_tok = float(cnt.sum())
    vocab_ref = ray.put((tok_arr, cnt))

    # N_pair: one tiny count over the pair table (exact, driver-side)
    agg = pair_counts.sum("n_ab")
    n_pair = float(agg if agg is not None else 0.0)

    out_schema = pa.schema(
        [
            ("tok_a", pa.string()),
            ("tok_b", pa.string()),
            ("n_ab", pa.int64()),
            ("pmi", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok_a" not in t.column_names:
            return out_schema.empty_table()
        t = t.filter(pc.greater_equal(t["n_ab"], min_count))
        if t.num_rows == 0:
            return out_schema.empty_table()
        toks, counts_ = ray.get(vocab_ref)
        t = t.combine_chunks()
        ia = pc.index_in(t["tok_a"], value_set=toks).to_numpy(zero_copy_only=False)
        ib = pc.index_in(t["tok_b"], value_set=toks).to_numpy(zero_copy_only=False)
        nab = t["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        num = nab * n_tok * n_tok
        den = n_pair * counts_[ia.astype(np.int64)] * counts_[ib.astype(np.int64)]
        pmi = np.floor(np.log(num / den) * 1e6) / 1e6
        return pa.table(
            {
                "tok_a": t["tok_a"],
                "tok_b": t["tok_b"],
                "n_ab": pc.cast(t["n_ab"], pa.int64()),
                "pmi": pa.array(pmi),
            },
            schema=out_schema,
        )

    return pair_counts.map_batches(score, batch_format="pyarrow")


Q_TOKEN_PMI_SQL = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(text, ' '), '\s+') AS tk
  FROM documents WHERE length(trim(text, ' ')) > 0
), uni AS (
  SELECT token, COUNT(*) AS n FROM (
    SELECT UNNEST(tk) AS token FROM toks
  ) WHERE token <> '' GROUP BY token
), n_tok AS (SELECT CAST(SUM(n) AS DOUBLE) AS v FROM uni),
bi AS (
  SELECT (p).a AS tok_a, (p).b AS tok_b, COUNT(*) AS n_ab FROM (
    SELECT UNNEST(list_transform(range(1, len(tk)),
                  i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
    FROM toks WHERE len(tk) > 1
  ) WHERE (p).a <> '' AND (p).b <> '' GROUP BY 1, 2
), n_pair AS (SELECT CAST(SUM(n_ab) AS DOUBLE) AS v FROM bi)
SELECT b.tok_a, b.tok_b, b.n_ab,
       FLOOR(ln(CAST(b.n_ab AS DOUBLE) * n_tok.v * n_tok.v
                / (n_pair.v * CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)))
             * 1000000) / 1000000 AS pmi
FROM bi b
JOIN uni ua ON ua.token = b.tok_a
JOIN uni ub ON ub.token = b.tok_b
CROSS JOIN n_tok CROSS JOIN n_pair
WHERE b.n_ab >= 10
"""


# ---------------------------------------------------------------------------
# Kneser-Ney continuation counts (n-gram LM training statistic)
# ---------------------------------------------------------------------------

def q_kn_continuation(sf_dir: str) -> ray.data.Dataset:
    """Kneser-Ney continuation counts — the lower-order statistic of
    the classic smoothed n-gram LM: for each token ``w``,
    ``n1p = N1+(· w)`` (how many DISTINCT left contexts precede it) and
    the continuation probability ``p_cont = n1p / |distinct bigram
    types|``.  "Francisco" is frequent but only ever follows "San" —
    continuation counts are what stop a smoothed LM from over-predicting
    it in fresh contexts.

    Scale shape: per-batch DISTINCT (prev, tok) pairs (one np.unique
    over dictionary-code composites — the shuffle moves pair *types*,
    never occurrences), a pair-keyed groupby collapses cross-batch
    repeats, and the tok-keyed count runs over the type table.  The
    type table is materialized once (bounded by observed bigram types,
    not corpus size) so the driver total and the per-token counts share
    one execution.  Exact BIGINT counts; the single ``n1p / total``
    division is the identical double expression in SQL, floored to the
    1e-6 grid."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    pair_schema = pa.schema([("prev", pa.string()), ("tok", pa.string())])

    def pair_types(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        if code.size < 2:
            return pair_schema.empty_table()
        same = parent[1:] == parent[:-1]
        a, b = code[:-1][same], code[1:][same]
        lens = pc.utf8_length(vocab).to_numpy(zero_copy_only=False)
        ok = (lens[a] > 0) & (lens[b] > 0)
        a, b = a[ok], b[ok]
        if a.size == 0:
            return pair_schema.empty_table()
        u = np.unique(a * np.int64(len(vocab)) + b)
        return pa.table(
            {
                "prev": vocab.take(pa.array(u // len(vocab))).cast(pa.string()),
                "tok": vocab.take(pa.array(u % len(vocab))).cast(pa.string()),
            },
            schema=pair_schema,
        )

    types = (
        ds.map_batches(pair_types, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["prev", "tok"])
        .aggregate(Count(alias_name="_one"))
        .materialize()  # bounded by bigram TYPES, not corpus size
    )
    total = float(types.count())

    out_schema = pa.schema(
        [("token", pa.string()), ("n1p", pa.int64()), ("p_cont", pa.float64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return out_schema.empty_table()
        n1p = t["n1p"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "token": t["tok"],
                "n1p": pa.array(n1p),
                "p_cont": pa.array(
                    np.floor(n1p.astype(np.float64) / total * 1e6) / 1e6
                ),
            },
            schema=out_schema,
        )

    return (
        types.groupby("tok")
        .aggregate(Count(alias_name="n1p"))
        .map_batches(finish, batch_format="pyarrow")
    )


Q_KN_CONTINUATION_SQL = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(text, ' '), '\s+') AS tk
  FROM documents WHERE length(trim(text, ' ')) > 0
), bi AS (
  SELECT DISTINCT (p).a AS prev, (p).b AS tok FROM (
    SELECT UNNEST(list_transform(range(1, len(tk)),
                  i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
    FROM toks WHERE len(tk) > 1
  ) WHERE (p).a <> '' AND (p).b <> ''
), total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM bi)
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n1p,
       FLOOR(COUNT(*) / total.v * 1000000) / 1000000 AS p_cont
FROM bi CROSS JOIN total GROUP BY tok, total.v
"""


# ---------------------------------------------------------------------------
# Char-bigram LM cross-entropy (the CCNet-style perplexity quality proxy)
# ---------------------------------------------------------------------------

def q_char_bigram_xent(sf_dir: str) -> ray.data.Dataset:
    """Per-document cross-entropy under the corpus's own char-bigram
    LM: xent = -mean over positions i>0 of ln( n(c_{i-1}c_i) /
    n_left(c_{i-1}) ) — the language-model perplexity proxy used for
    corpus quality filtering, at char level so it needs no tokenizer.
    Every bigram in a doc is in the corpus counts by construction (the
    LM is trained on the same corpus), so no smoothing term is needed.

    Scale shape: pass 1 reduces to the char-bigram count table (bounded
    by charset^2) via per-batch np.unique partials + one tiny groupby,
    broadcast once with ``ray.put``; pass 2 scores each doc with one
    searchsorted lookup + segment sums — docs never leave their batch.
    Floats: identical double expression + 1e-6 floor on both engines
    (ln parity holds, same libm — see the TF-IDF stage)."""
    from ..functions.text import utf8_codepoints

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    _K = np.int64(0x110000)

    def partial(t: pa.Table) -> pa.Table:
        cps, rows = utf8_codepoints(t["text"].combine_chunks())
        if cps.size < 2:
            return pa.table(
                {"pair_key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        same = rows[1:] == rows[:-1]
        comp = cps[:-1][same].astype(np.int64) * _K + cps[1:][same]
        u, c = np.unique(comp, return_counts=True)
        return pa.table({"pair_key": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_key")
        .aggregate(Sum("n", alias_name="n"))
        .to_arrow_refs()
    )
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ray.get(counts)]
    vt = pa.concat_tables([t for t in tabs if t.num_rows], promote_options="default")
    keys = vt["pair_key"].to_numpy(zero_copy_only=False)
    ns = vt["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(keys)
    keys, ns = keys[order], ns[order]
    # left-context totals n_left(a) = sum over b of n(ab)
    left = keys // _K
    lk, li = np.unique(left, return_inverse=True)
    ln_tot = np.bincount(li, weights=ns)
    # per-pair ln probability, precomputed once
    lp = np.log(ns / ln_tot[li])
    lm_ref = ray.put((keys, lp))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("xent", pa.float64())]
    )

    def score(t: pa.Table) -> pa.Table:
        keys_l, lp_l = ray.get(lm_ref)
        t = t.combine_chunks()
        cps, rows = utf8_codepoints(t["text"])
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        nrows = t.num_rows
        if cps.size < 2:
            return out_schema.empty_table()
        same = rows[1:] == rows[:-1]
        comp = cps[:-1][same].astype(np.int64) * _K + cps[1:][same]
        prow = rows[1:][same]
        idx = np.searchsorted(keys_l, comp)
        vals = lp_l[idx]
        n_bi = np.bincount(prow, minlength=nrows).astype(np.int64)
        sums = np.bincount(prow, weights=vals, minlength=nrows)
        keep = n_bi > 0
        xent = -(sums[keep] / n_bi[keep])
        return pa.table(
            {
                "doc_id": pa.array(doc[keep].astype(np.int64)),
                "n_bigrams": pa.array(n_bi[keep]),
                "xent": pa.array(np.floor(xent * 1e6) / 1e6),
            },
            schema=out_schema,
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_CHAR_BIGRAM_XENT_SQL = """
WITH bi AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, length(text)),
                               i -> text[i] || text[i+1])) AS pair
  FROM documents WHERE length(text) > 1
), c AS (
  SELECT pair, COUNT(*) AS n FROM bi GROUP BY pair
), lt AS (
  SELECT pair[1] AS a, CAST(SUM(n) AS DOUBLE) AS n_left FROM c GROUP BY 1
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       FLOOR(-AVG(ln(CAST(c.n AS DOUBLE) / lt.n_left)) * 1000000) / 1000000
         AS xent
FROM bi b JOIN c ON c.pair = b.pair JOIN lt ON lt.a = b.pair[1]
GROUP BY b.doc_id
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility per language (bytes/token, tokens/word)
# ---------------------------------------------------------------------------

def q_token_fertility(sf_dir: str) -> ray.data.Dataset:
    """Per-language tokenizer-efficiency statistics: UTF-8 bytes per
    BPE token ("compression") and BPE tokens per whitespace word
    ("fertility") — the numbers multilingual-tokenizer reports lead
    with, because a language with high fertility pays more of the
    context window per word.

    Scale shape: per-batch integer partial sums keyed by ``lang`` (a
    bounded key — per CLAUDE.md's segment-kernel rule, bounded keys
    may group directly), one tiny groupby, then two exact-integer
    divisions floored to the 1e-6 grid.  No text leaves its batch;
    the shuffle carries |langs| rows per batch."""
    from ..functions.text import token_count

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pa.table(
            {
                "lang": t["lang"],
                "n_bytes": pc.cast(pc.binary_length(t["text"]), pa.int64()),
                "ws": pc.cast(token_count(t["text"]), pa.int64()),
                "bpe": pc.cast(
                    pc.count_substring_regex(t["text"], _BPE_PRETOKEN), pa.int64()
                ),
            }
        )
        g = m.group_by("lang").aggregate(
            [("n_bytes", "sum"), ("ws", "sum"), ("bpe", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["lang", "n_bytes", "ws", "bpe", "n_docs"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_bytes", alias_name="n_bytes"),
            Sum("ws", alias_name="ws_tokens"),
            Sum("bpe", alias_name="bpe_tokens"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )

    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("n_bytes", pa.int64()),
            ("ws_tokens", pa.int64()),
            ("bpe_tokens", pa.int64()),
            ("bytes_per_token", pa.float64()),
            ("tokens_per_word", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.column_names:
            return out_schema.empty_table()
        nb = t["n_bytes"].to_numpy(zero_copy_only=False).astype(np.float64)
        ws = t["ws_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        bpe = t["bpe_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "n_bytes": t["n_bytes"],
                "ws_tokens": t["ws_tokens"],
                "bpe_tokens": t["bpe_tokens"],
                "bytes_per_token": pa.array(np.floor(nb / bpe * 1e6) / 1e6),
                "tokens_per_word": pa.array(np.floor(bpe / ws * 1e6) / 1e6),
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q_TOKEN_FERTILITY_SQL = r"""
WITH m AS (
  SELECT lang,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
           AS ws,
         CAST(len(regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))
           AS BIGINT) AS bpe
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       FLOOR(CAST(SUM(n_bytes) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE) * 1000000)
         / 1000000 AS bytes_per_token,
       FLOOR(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) * 1000000)
         / 1000000 AS tokens_per_word
FROM m GROUP BY lang
"""


# ---------------------------------------------------------------------------
# BM25 ranked search (Okapi, Lucene idf) — fixed-query top-k
# ---------------------------------------------------------------------------

_BM25_TERMS = ("table", "hash", "merge")
_BM25_K = 25


def q_bm25_search(sf_dir: str) -> ray.data.Dataset:
    """Top-k documents for a fixed term query under Okapi BM25 with
    the Lucene idf (``ln((N-df+0.5)/(df+0.5) + 1)``, k1=1.2, b=0.75)
    — the ranked-retrieval counterpart of ``q_conjunctive_search``.

    Scale shape: pass 1 streams one 1-row partial per batch (doc
    count, token-length sum, per-term document frequencies) into a
    5-number global aggregate; the idf/avgdl constants are computed
    once on the driver.  Pass 2 streams again, scores each batch
    vectorized (bincount tf per term), keeps a LOCAL top-k per batch
    (the combiner — the global sort sees at most k rows per batch,
    never the corpus), then one tiny sort+limit.  Float parity: each
    per-term score is the identical literal expression in both
    engines and the 3 terms are summed in fixed left-to-right order
    (the SQL writes the sum out explicitly — no join-order float
    reassociation), floored to the 1e-6 grid; ties break on doc_id."""
    from .training_prep import _tokens_flat

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms, k = _BM25_TERMS, _BM25_K

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, parent, n_tok = _tokens_flat(t["text"])
        row = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array([int(n_tok.sum())], pa.int64()),
        }
        for j, term in enumerate(terms):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            per_row = np.bincount(parent[eq], minlength=t.num_rows)
            row[f"df{j}"] = pa.array([int((per_row > 0).sum())], pa.int64())
        return pa.table(row)

    agg = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_dl", alias_name="sum_dl"),
            *[Sum(f"df{j}", alias_name=f"df{j}") for j in range(len(terms))],
        )
    )
    n_docs = float(agg["n_docs"])
    avgdl = float(agg["sum_dl"]) / n_docs
    idf = [
        np.log((n_docs - float(agg[f"df{j}"]) + 0.5) / (float(agg[f"df{j}"]) + 0.5) + 1.0)
        for j in range(len(terms))
    ]

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("score", pa.float64())]
    )

    def score(t: pa.Table) -> pa.Table:
        flat, parent, n_tok = _tokens_flat(t["text"])
        nrows = t.num_rows
        dl = n_tok.astype(np.float64)
        total = np.zeros(nrows, dtype=np.float64)
        any_tf = np.zeros(nrows, dtype=bool)
        # fixed left-to-right term order == the SQL's explicit sum
        for j, term in enumerate(terms):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[eq], minlength=nrows).astype(np.float64)
            any_tf |= tf > 0
            with np.errstate(invalid="ignore", divide="ignore"):
                s = idf[j] * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            total = total + np.where(tf > 0, s, 0.0)
        keep = any_tf
        doc_id = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)[keep]
        sc = np.floor(total[keep] * 1e6) / 1e6
        # local top-k combiner: same (score desc, doc_id asc) order
        order = np.lexsort((doc_id, -sc))[:k]
        return pa.table(
            {"doc_id": pa.array(doc_id[order]), "score": pa.array(sc[order])},
            schema=out_schema,
        )

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


Q_BM25_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(tk) AS DOUBLE) AS dl,
         CAST(len(list_filter(tk, t -> t = 'table')) AS DOUBLE) AS tf0,
         CAST(len(list_filter(tk, t -> t = 'hash'))  AS DOUBLE) AS tf1,
         CAST(len(list_filter(tk, t -> t = 'merge')) AS DOUBLE) AS tf2
  FROM tk
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         CAST(COUNT(*) FILTER (tf0 > 0) AS DOUBLE) AS df0,
         CAST(COUNT(*) FILTER (tf1 > 0) AS DOUBLE) AS df1,
         CAST(COUNT(*) FILTER (tf2 > 0) AS DOUBLE) AS df2
  FROM m
)
SELECT doc_id,
       FLOOR((
           (CASE WHEN tf0 > 0 THEN ln((g.n - g.df0 + 0.5) / (g.df0 + 0.5) + 1.0)
                 * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * (dl / g.avgdl)))
                 ELSE 0.0 END)
         + (CASE WHEN tf1 > 0 THEN ln((g.n - g.df1 + 0.5) / (g.df1 + 0.5) + 1.0)
                 * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * (dl / g.avgdl)))
                 ELSE 0.0 END)
         + (CASE WHEN tf2 > 0 THEN ln((g.n - g.df2 + 0.5) / (g.df2 + 0.5) + 1.0)
                 * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * (dl / g.avgdl)))
                 ELSE 0.0 END)
       ) * 1000000) / 1000000 AS score
FROM m CROSS JOIN g
WHERE tf0 + tf1 + tf2 > 0
ORDER BY score DESC, doc_id
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Gopher-style composite rule filter (per-doc pass/fail with reasons)
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("a", "the", "of", "to", "and")


def q_gopher_rules(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style (Rae et al. 2021, Appendix A) composite quality
    rules evaluated per document, each exposed as its own flag plus
    the conjunctive ``keep`` — the filter stage of a training-data
    pipeline, kept as *flags* rather than a filter so downstream can
    audit rejection reasons.  Rules (thresholds adapted to this
    corpus's 10-99-word documents): word count in [20, 80], mean word
    length in [3, 10], digit fraction < 20%, symbol fraction < 10%,
    at least one stopword.

    Every rule is an INTEGER comparison (mean-length bounds are
    cross-multiplied: ``3·nw <= nchars <= 10·nw``) so there is no
    float-parity surface at all.  One vectorized pass, no shuffle;
    at 100 TB this is embarrassingly parallel and prunes to
    (doc_id, 6 bools) leaving the read."""
    from ..functions.text import char_counts_nospace, digit_count, token_count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def rules(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        nw = pc.cast(token_count(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nc = pc.cast(char_counts_nospace(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nd = pc.cast(digit_count(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nsym = pc.cast(
            pc.count_substring_regex(t["text"], r"[^a-zA-Z0-9\s]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        has_stop = np.zeros(t.num_rows, dtype=bool)
        stop_hit = pc.is_in(
            flat, value_set=pa.array(_GOPHER_STOPWORDS, pa.string())
        ).to_numpy(zero_copy_only=False)
        has_stop[np.unique(parent[stop_hit])] = True
        r_words = (nw >= 20) & (nw <= 80)
        r_mean_len = (3 * nw <= nc) & (nc <= 10 * nw)
        r_digit = 5 * nd < nc
        r_symbol = 10 * nsym < nw
        keep = r_words & r_mean_len & r_digit & r_symbol & has_stop
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "r_words": pa.array(r_words),
                "r_mean_len": pa.array(r_mean_len),
                "r_digit": pa.array(r_digit),
                "r_symbol": pa.array(r_symbol),
                "r_stopword": pa.array(has_stop),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(rules, batch_format="pyarrow", zero_copy_batch=True)


Q_GOPHER_RULES_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
           AS nw,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nc,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS nd,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS nsym,
         len(list_filter(regexp_split_to_array(trim(text, ' '), '\s+'),
             w -> w IN ('a', 'the', 'of', 'to', 'and'))) > 0 AS has_stop
  FROM documents
)
SELECT doc_id,
       (nw >= 20 AND nw <= 80) AS r_words,
       (3 * nw <= nc AND nc <= 10 * nw) AS r_mean_len,
       (5 * nd < nc) AS r_digit,
       (10 * nsym < nw) AS r_symbol,
       has_stop AS r_stopword,
       (nw >= 20 AND nw <= 80 AND 3 * nw <= nc AND nc <= 10 * nw
        AND 5 * nd < nc AND 10 * nsym < nw AND has_stop) AS keep
FROM base
"""


# ---------------------------------------------------------------------------
# Flesch reading ease (classic readability quality signal)
# ---------------------------------------------------------------------------

def q_flesch_scores(sf_dir: str) -> ray.data.Dataset:
    """Flesch reading ease per document: ``206.835 - 1.015·(words /
    sentences) - 84.6·(syllables / words)`` with the standard cheap
    syllable proxy (vowel-group count, RE2 ``[aeiouyAEIOUY]+`` — the
    same approximation production readability filters use) and
    sentences = max(1, terminal-punctuation runs).

    Zero shuffle, one vectorized pass; the three counts are exact
    integers, the formula is evaluated in the identical literal
    left-to-right order in both engines and floored to the 1e-6
    grid.  Zero-word documents are excluded (no rows on the SQL
    side either)."""
    from ..functions.text import token_count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        w = pc.cast(token_count(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        syl = pc.cast(
            pc.count_substring_regex(t["text"], r"[aeiouyAEIOUY]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        sent = pc.cast(
            pc.count_substring_regex(t["text"], r"[.!?]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        sent = np.maximum(sent, 1)
        keep = w > 0
        wf = w[keep].astype(np.float64)
        sf = sent[keep].astype(np.float64)
        yf = syl[keep].astype(np.float64)
        flesch = 206.835 - 1.015 * (wf / sf) - 84.6 * (yf / wf)
        return pa.table(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
                "n_words": pa.array(w[keep]),
                "n_syllables": pa.array(syl[keep]),
                "n_sentences": pa.array(sent[keep]),
                "flesch": pa.array(np.floor(flesch * 1e6) / 1e6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


Q_FLESCH_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
           AS n_words,
         CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
           AS n_syllables,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
           AS n_sentences
  FROM documents
)
SELECT doc_id, n_words, n_syllables, n_sentences,
       FLOOR((206.835
              - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
             * 1000000) / 1000000 AS flesch
FROM base WHERE n_words > 0
"""


# ---------------------------------------------------------------------------
# Zipf slope (corpus token-frequency power-law exponent)
# ---------------------------------------------------------------------------

def q_zipf_slope(sf_dir: str, top_n: int = 1000) -> pa.Table:
    """OLS slope of ln(frequency) on ln(rank) over the corpus's top
    tokens — the Zipf exponent (natural text ≈ -1; word-salad or
    boilerplate-heavy corpora drift toward 0).  A standard one-number
    corpus health statistic for training-data reports.

    Scale shape: per-batch token-count partials → one vocabulary
    groupby → top-N by (count desc, token) with a sort that only ever
    sees the distinct-token table; only the N-row rank table reaches
    the driver.  The rank/ln/OLS arithmetic happens once on N rows;
    the SQL oracle computes the identical expression from the same
    BIGINT counts (the 1e-6(+1e-3) grid absorbs SUM-order ulps)."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pa.table({"token": pc.list_flatten(toks)})
        flat = flat.filter(pc.not_equal(flat["token"], ""))
        g = flat.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    top = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(top_n)
        .to_pandas()
    )
    cnt = top["n"].to_numpy().astype(np.float64)
    n_terms = len(cnt)
    x = np.log(np.arange(1, n_terms + 1, dtype=np.float64))
    y = np.log(cnt)
    n = float(n_terms)
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    grid = lambda v: float(np.floor(v * 1e6 + 1e-3) / 1e6)
    return pa.table(
        {
            "n_terms": pa.array([n_terms], pa.int64()),
            "slope": pa.array([grid(slope)], pa.float64()),
            "intercept": pa.array([grid(intercept)], pa.float64()),
        }
    )


Q_ZIPF_SQL = r"""
WITH tok AS (
  SELECT UNNEST(list_filter(regexp_split_to_array(trim(text, ' '), '\s+'),
                w -> w <> '')) AS token
  FROM documents
), cnts AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY token
  ORDER BY n DESC, token LIMIT 1000
), r AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM cnts
), s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_terms,
       FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.001)
         / 1000000 AS slope,
       FLOOR((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             * 1000000 + 0.001) / 1000000 AS intercept
FROM s
"""


# ---------------------------------------------------------------------------
# Hybrid-retrieval fusion: BM25 + token-set Jaccard under RRF (SQL-matched)
# ---------------------------------------------------------------------------

_RRF_C = 60  # the standard reciprocal-rank-fusion constant
_RRF_TOPN = 10


def q_jaccard_search(sf_dir: str) -> ray.data.Dataset:
    """Second ranker for the hybrid-fusion pair: token-SET Jaccard of
    each document against the fixed query terms — ``|q ∩ d| / |q ∪ d|``
    over DISTINCT tokens.  Same scale shape as ``q_bm25_search``'s
    pass 2: vectorized per-batch scoring, local top-k combiner, one
    tiny global sort+limit; the corpus never reaches the sort."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms, k = _BM25_TERMS, _BM25_K
    out_schema = pa.schema([("doc_id", pa.int64()), ("jac", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        from .training_prep import _tokens_flat

        flat, parent, _ = _tokens_flat(t["text"])
        nrows = t.num_rows
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = pc.dictionary_encode(flat)
        tok_id = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nvocab = int(tok_id.max()) + 1 if tok_id.size else 1
        composite = parent.astype(np.int64) * nvocab + tok_id
        uniq = np.unique(composite)
        nd = np.bincount((uniq // nvocab).astype(np.int64), minlength=nrows)
        ov = np.zeros(nrows, np.int64)
        for term in terms:
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            ov += np.bincount(parent[eq], minlength=nrows) > 0
        keep = ov > 0
        union = nd[keep] + len(terms) - ov[keep]
        jac = np.floor(ov[keep].astype(np.float64) / union * 1e6) / 1e6
        doc_id = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)[keep]
        order = np.lexsort((doc_id, -jac))[:k]
        return pa.table(
            {"doc_id": pa.array(doc_id[order]), "jac": pa.array(jac[order])},
            schema=out_schema,
        )

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["jac", "doc_id"], descending=[True, False])
        .limit(k)
    )


def q_hybrid_rrf(sf_dir: str) -> pa.Table:
    """Reciprocal-rank fusion of the BM25 and token-set-Jaccard ranked
    lists (the standard hybrid-retrieval combiner:
    ``rrf = Σ 1/(60 + rank)`` over the lists containing the doc), top
    10 by (rrf desc, doc_id).  Both input lists are top-k combiner
    outputs — O(k) rows by construction — so the fusion itself runs on
    the driver over 2k rows regardless of corpus size; the heavy work
    is the two corpus passes inside the rankers.  Addition order (BM25
    term first) and the 1e-6 floor grid match the SQL literally."""
    a = q_bm25_search(sf_dir).to_pandas()
    b = q_jaccard_search(sf_dir).to_pandas()
    a = a.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    b = b.sort_values(["jac", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    ra = {int(d): i + 1 for i, d in enumerate(a["doc_id"])}
    rb = {int(d): i + 1 for i, d in enumerate(b["doc_id"])}
    fused = []
    for d in sorted(set(ra) | set(rb)):
        s = (1.0 / (_RRF_C + ra[d]) if d in ra else 0.0) + (
            1.0 / (_RRF_C + rb[d]) if d in rb else 0.0
        )
        fused.append((d, np.floor(s * 1e6) / 1e6))
    fused.sort(key=lambda x: (-x[1], x[0]))
    top = fused[:_RRF_TOPN]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in top], pa.int64()),
            "rrf": pa.array([s for _, s in top], pa.float64()),
        }
    )


Q_JACCARD_SEARCH_SQL = r"""
WITH dt AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   t -> t <> '')) AS dt
  FROM documents
), ov AS (
  SELECT doc_id, len(dt) AS nd,
         (CASE WHEN list_contains(dt, 'table') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(dt, 'hash')  THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(dt, 'merge') THEN 1 ELSE 0 END) AS ov
  FROM dt
)
SELECT doc_id,
       FLOOR(CAST(ov AS DOUBLE) / CAST(nd + 3 - ov AS DOUBLE) * 1000000)
         / 1000000 AS jac
FROM ov WHERE ov > 0
ORDER BY jac DESC, doc_id
LIMIT 25
"""

Q_HYBRID_RRF_SQL = (
    "WITH bm AS MATERIALIZED (" + Q_BM25_SQL + "),\n"
    "jc AS MATERIALIZED (" + Q_JACCARD_SEARCH_SQL + "),\n"
    + r"""
a AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra FROM bm),
b AS (SELECT doc_id, row_number() OVER (ORDER BY jac DESC, doc_id) AS rb FROM jc)
SELECT doc_id,
       FLOOR((COALESCE(1.0 / (60 + a.ra), 0.0)
            + COALESCE(1.0 / (60 + b.rb), 0.0)) * 1000000) / 1000000 AS rrf
FROM a FULL OUTER JOIN b USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 10
"""
)


# ---------------------------------------------------------------------------
# Hapax legomena / exclusive vocabulary per source
# ---------------------------------------------------------------------------

def q_hapax_by_source(sf_dir: str) -> ray.data.Dataset:
    """Within-source hapax legomena rate: per source, the distinct
    vocabulary size, the tokens occurring exactly ONCE in that source,
    and their ratio — the Zipf-tail companion of ``q_zipf_slope``; a
    crawl shard whose hapax rate explodes is usually mojibake or
    boilerplate soup.

    Scale shape: per-batch (token, source-idx, count) partials collapse
    occurrences before the ONE vocabulary-keyed shuffle (rows =
    distinct (token, source) pairs, never occurrences); the rollup is a
    bounded groupby over the source registry index.  The rate is one
    double division on the 1e-6 grid."""
    import ray as _ray
    from ..functions.text import floor6 as _floor6

    ds = read_table(sf_dir, "documents", columns=["source", "text"])
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
    reg_ref = _ray.put(np.array(src_reg))

    def partial(t: pa.Table) -> pa.Table:
        reg = _ray.get(reg_ref)
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim(t["text"], " "), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        src = t["source"].combine_chunks().take(parent)
        tmp = pa.table({"token": flat, "src": src})
        tmp = tmp.filter(pc.not_equal(tmp["token"], ""))
        sidx = np.searchsorted(
            reg, tmp["src"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        g = (
            pa.table({"token": tmp["token"], "sidx": pa.array(sidx)})
            .group_by(["token", "sidx"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["token", "sidx", "c"])

    per_pair = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["token", "sidx"])
        .aggregate(Sum("c", alias_name="n"))
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("sidx", pa.int64()), ("hapax", pa.int64()), ("one", pa.int64())]
            ).empty_table()
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sidx": pc.cast(t["sidx"], pa.int64()),
                "hapax": pa.array((n == 1).astype(np.int64)),
                "one": pa.array(np.ones(len(t), np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        reg = _ray.get(reg_ref)
        s_ = t["sidx"].to_numpy(zero_copy_only=False).astype(np.int64)
        hap = t["n_hapax"].to_numpy(zero_copy_only=False).astype(np.int64)
        voc = t["n_vocab"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(reg[s_]),
                "n_vocab": pa.array(voc),
                "n_hapax": pa.array(hap),
                "hapax_rate": pa.array(_floor6(hap / voc.astype(np.float64))),
            }
        )

    return (
        per_pair.map_batches(rollup, batch_format="pyarrow")
        .groupby("sidx")
        .aggregate(Sum("hapax", alias_name="n_hapax"), Sum("one", alias_name="n_vocab"))
        .map_batches(finish, batch_format="pyarrow")
    )


Q_HAPAX_SQL = r"""
WITH tok AS (
  SELECT source, UNNEST(regexp_split_to_array(trim(text, ' '), '\s+')) AS token
  FROM documents WHERE length(trim(text, ' ')) > 0
), t2 AS (
  SELECT source, token, COUNT(*) AS n
  FROM tok WHERE token <> '' GROUP BY source, token
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       FLOOR(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE) * 1000000) / 1000000 AS hapax_rate
FROM t2 GROUP BY source
"""
