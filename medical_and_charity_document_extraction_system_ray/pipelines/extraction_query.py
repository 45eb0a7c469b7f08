"""Flagship extraction over the derived interleaved corpus, with a full
DuckDB oracle.

The flat ``documents`` table is converted to interleaved spans by
``sources.derive.flat_to_interleaved`` (deterministic, SQL-expressible)
and run through the complete pipeline — classifier, span explode,
render/decode + preprocess + band OCR on the scanned path, the
groupby(doc_id) reassembly shuffle.  Because the band codec is exactly
invertible, every output column except confidence is reproducible in
ANSI SQL, giving the flagship a value-level oracle, not just a row
count.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..sources.derive import DERIVED_SPANS_SQL, flat_to_interleaved
from ..sources.readers import read_table
from .extraction import extract_documents


def q_extract_documents(sf_dir: str) -> ray.data.Dataset:
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    flat = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # the derived corpus is text-dominant (only ~1/6 of pages OCR), so a
    # quarter-of-the-cluster pool amortizes actor spawn best at
    # gate/bench scales and keeps widening on larger clusters (a fixed
    # min(8, ...) capped the stage at 8 actors)
    conc = max(2, ncpu // 4)
    docs = flat.map_batches(flat_to_interleaved, batch_format="pyarrow")
    out = extract_documents(
        docs, ocr_concurrency=conc, ocr_batch_size=128,
        repartition_blocks=conc * 8,
    )
    return out.map_batches(
        lambda t: t.select(
            [
                "doc_id",
                "is_scanned",
                "processing_method",
                "page_count",
                "total_characters",
                "total_words",
                "text",
            ]
        ),
        batch_format="pyarrow",
    )


Q_EXTRACT_SQL = (
    DERIVED_SPANS_SQL
    + """
, cls AS (
  -- ASCII-\\s trim (tabs/newlines included) to track the classifier's
  -- whitespace strip; remaining divergence vs utf8_trim_whitespace is
  -- unicode spaces only (absent from the corpus by construction)
  SELECT doc_id,
         (SUM(length(regexp_replace(text_layer, '^\\s+|\\s+$', '', 'g')))
            FILTER (WHERE k < 3) * 1.0
          / LEAST(3, MAX(n_pages))) < 50 AS is_scanned
  FROM spans GROUP BY doc_id
), out_pages AS (
  SELECT s.doc_id, s.k, c.is_scanned,
         CASE WHEN c.is_scanned THEN s.chunk ELSE s.text_layer END AS page_out
  FROM spans s JOIN cls c USING (doc_id)
)
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id,
       BOOL_OR(is_scanned) AS is_scanned,
       CASE WHEN BOOL_OR(is_scanned) THEN 'ocr_pipeline'
            ELSE 'direct_text_extraction' END AS processing_method,
       CAST(COUNT(*) AS INTEGER) AS page_count,
       CAST(SUM(length(page_out)) AS BIGINT) AS total_characters,
       CAST(CASE WHEN BOOL_OR(is_scanned)
            THEN SUM(CASE WHEN length(trim(page_out)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(page_out), '\\s+')) END)
            ELSE 0 END AS BIGINT) AS total_words,
       STRING_AGG('--- Page ' || CAST(k + 1 AS VARCHAR) || ' ---' || chr(10) || page_out,
                  chr(10) || chr(10) ORDER BY k) AS text
FROM out_pages
GROUP BY doc_id
"""
)
