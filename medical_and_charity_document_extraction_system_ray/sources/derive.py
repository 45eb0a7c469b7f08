"""Derive an interleaved-span documents table from a flat text corpus.

The driver's generic ``documents`` table is flat (doc_id:int64, text,
lang, source, n_chars — TESTDATA.md); the engine's conformance input is
the interleaved span schema (BASELINE.json input_hint).  This module
maps flat -> interleaved **deterministically and SQL-expressibly**, so
the flagship extraction pipeline over the derived table can be checked
against a DuckDB oracle:

- pages = 200-char chunks of ``text`` (min 1 page, possibly empty);
- docs with ``doc_id % 3 == 0`` turn their odd pages into media spans:
  text layer becomes "", the chunk rides inside a self-contained
  ``memb64://`` media_ref and is recovered byte-exact by the band OCR
  engine on the scanned path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DOCUMENTS_SCHEMA, KIND_MEDIA, KIND_TEXT
from .media_resolver import text_to_media_ref

PAGE_CHARS = 200


def flat_to_interleaved(batch: pa.Table) -> pa.Table:
    """Vectorized flat->interleaved conversion (one pass per page index:
    ``utf8_slice_codeunits`` over the whole column)."""
    n = len(batch)
    doc_ids = batch.column("doc_id").to_pylist()
    lengths = pc.utf8_length(batch.column("text")).to_pylist()
    max_pages = max((max(1, -(-ln // PAGE_CHARS)) for ln in lengths), default=1)

    # page text per (row, k) — column slices, no python substring loop
    page_cols = [
        pc.utf8_slice_codeunits(
            batch.column("text"), start=k * PAGE_CHARS, stop=(k + 1) * PAGE_CHARS
        ).to_pylist()
        for k in range(max_pages)
    ]

    docs = []
    for i in range(n):
        did = doc_ids[i]
        n_pages = max(1, -(-lengths[i] // PAGE_CHARS))
        media_doc = did % 3 == 0
        spans = []
        for k in range(n_pages):
            chunk = page_cols[k][i]
            if media_doc and k % 2 == 1:
                spans.append(
                    {
                        "kind": KIND_MEDIA,
                        "text": "",
                        "media_ref": text_to_media_ref(chunk),
                        "offset": k,
                    }
                )
            else:
                spans.append(
                    {"kind": KIND_TEXT, "text": chunk, "media_ref": "", "offset": k}
                )
        docs.append({"doc_id": f"doc-{did}", "spans": spans})
    return pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)


# DuckDB CTE that reproduces the derived spans; reused by the flagship
# extraction oracle in __ray_entry__.oracle_sql.
DERIVED_SPANS_SQL = f"""
WITH pages AS (
  SELECT d.doc_id,
         CAST(gs.k AS INTEGER) AS k,
         substr(d.text, gs.k * {PAGE_CHARS} + 1, {PAGE_CHARS}) AS chunk,
         (d.doc_id % 3 = 0 AND gs.k % 2 = 1) AS is_media,
         GREATEST(CAST(CEIL(length(d.text) / {PAGE_CHARS}.0) AS INTEGER), 1) AS n_pages
  FROM documents d,
       LATERAL (SELECT UNNEST(generate_series(0,
                 GREATEST(CAST(CEIL(length(d.text) / {PAGE_CHARS}.0) AS INTEGER), 1) - 1)) AS k) gs
), spans AS (
  SELECT doc_id, k, chunk, is_media, n_pages,
         CASE WHEN is_media THEN '' ELSE chunk END AS text_layer
  FROM pages
)
"""
