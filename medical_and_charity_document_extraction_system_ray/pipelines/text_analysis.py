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

from ..functions.text import char_counts_nospace, digit_count, stable_hash64, token_count
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

    Heuristic n-gram/stopword scorer over {en, de, es, fr, zh}: scores
    each language by stopword hits + script hints.  Not SQL-expressible
    (rows-only oracle check)."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "for", "on", "with"},
        "de": {"der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "ein"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
        "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"},
    }

    def __init__(self):
        import re

        self.word_re = re.compile(r"[a-zA-ZÀ-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, confs = [], []
        for text in batch["text"]:
            cjk = len(self.cjk_re.findall(text))
            if cjk > 0 and cjk >= len(text) * 0.05:
                preds.append("zh")
                confs.append(1.0)
                continue
            words = [w.lower() for w in self.word_re.findall(text)]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(w in prof for w in words) / len(words)
                for lang, prof in self.profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "und")
            confs.append(round(scores[best], 6))
        out = batch[["doc_id", "lang"]].copy()
        out["pred_lang"] = preds
        out["lang_conf"] = confs
        return out


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return ds.map_batches(
        LangIdScorer, batch_format="pandas", batch_size=2048, concurrency=2
    )


# ---------------------------------------------------------------------------
# Document fingerprinting — vectorized rolling hash (rows-only oracle)
# ---------------------------------------------------------------------------

def q_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """64-bit content fingerprint per doc (polynomial rolling hash over
    UTF-8 bytes) + a coarse 16-bit bucket — the unit for shard-level
    dedup bookkeeping at scale."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        h = stable_hash64(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": h.astype(np.int64),  # two's-complement view
                "bucket": (h >> np.uint64(48)).astype(np.int32),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
