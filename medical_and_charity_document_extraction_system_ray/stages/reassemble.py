"""Document reassembly: the pipeline's one required shuffle.

``groupby("doc_id")`` + per-group sort on ``offset`` + header-join +
aggregate math, matching the reference's ``_combine_page_results``
(``backend/app/services/ocr_service.py:188-227``) and the direct-path
combine (``backend/app/services/pdf_service.py:182-211``):

- ``text`` = ``"--- Page {n} ---\n{page}"`` joined with ``"\n\n"``,
  page numbers positional 1..N after sorting by ``offset`` (the
  reference gets that order for free from its sequential loop,
  ``ocr_service.py:148``; Ray map tasks complete out of order so the
  order is re-imposed here — SURVEY.md §7.4),
- ``average_confidence = round(mean, 2)`` (python banker's rounding),
  pinned 100.0 on the direct path,
- ``engine`` / ``language`` from the first page (None if it errored),
- output ``spans`` = extracted (kind, text, media_ref, offset) in
  offset order — the span-sequence-equality target.

``reassemble_table`` is segment-safe: it handles a table holding ANY
number of complete groups, so it works under
``groupby.map_groups`` (one group per call) and under a
sort-within-partition strategy alike.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import (
    DIRECT_CONFIDENCE,
    PAGE_HEADER,
    PAGE_SEP,
    RESULT_SCHEMA,
    RESULT_SCHEMA_WITH_PAGES,
)


def reassemble_table(t: pa.Table, include_pages: bool = False) -> pa.Table:
    schema = RESULT_SCHEMA_WITH_PAGES if include_pages else RESULT_SCHEMA
    if len(t) == 0:
        return pa.Table.from_pylist([], schema=schema)
    t = t.sort_by([("doc_id", "ascending"), ("offset", "ascending")])

    doc_ids = t.column("doc_id").to_pylist()
    offsets = t.column("offset").to_pylist()
    kinds = t.column("kind").to_pylist()
    texts = t.column("text").to_pylist()
    media_refs = t.column("media_ref").to_pylist()
    scanned = t.column("is_scanned").to_numpy(zero_copy_only=False)
    conf = t.column("confidence").to_numpy(zero_copy_only=False)
    wc = t.column("word_count").to_numpy(zero_copy_only=False)
    cc = t.column("character_count").to_numpy(zero_copy_only=False)
    engines = t.column("engine").to_pylist()
    langs = t.column("language").to_pylist()
    words = (
        t.column("words").to_pylist()
        if include_pages and "words" in t.column_names
        else None
    )

    # segment boundaries (table is sorted by doc_id)
    ids = np.asarray(doc_ids, dtype=object)
    bounds = np.nonzero(ids[1:] != ids[:-1])[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(ids)]])

    rows = []
    for s, e in zip(starts, ends):
        if e - s == 1 and kinds[s] == "__empty__":
            # zero-page document sentinel (stages/classify.py): the
            # reference's direct path over no pages
            row = {
                "doc_id": ids[s],
                "is_scanned": False,
                "processing_method": "direct_text_extraction",
                "page_count": 0,
                "total_characters": 0,
                "total_words": 0,
                "average_confidence": DIRECT_CONFIDENCE,
                "text": "",
                "engine": None,
                "language": None,
                "spans": [],
            }
            if include_pages:
                row["pages"] = []
            rows.append(row)
            continue
        pages = texts[s:e]
        full_text = PAGE_SEP.join(
            PAGE_HEADER.format(n=i + 1) + p for i, p in enumerate(pages)
        )
        is_scanned = bool(scanned[s])
        if is_scanned:
            # sequential python sum, NOT numpy pairwise: the oracle
            # (and the reference, ocr_service.py:210-213) sums floats
            # left-to-right, and the two orders can differ in the last
            # ulp right at a round(x, 2) boundary
            avg = round(sum(conf[s:e].tolist()) / (e - s), 2)
            method = "ocr_pipeline"
            total_words = int(wc[s:e].sum())
            engine = engines[s]
            language = langs[s]
        else:
            avg = DIRECT_CONFIDENCE
            method = "direct_text_extraction"
            total_words = 0
            engine = None
            language = None
        row = {
            "doc_id": ids[s],
            "is_scanned": is_scanned,
            "processing_method": method,
            "page_count": e - s,
            "total_characters": int(cc[s:e].sum()),
            "total_words": total_words,
            "average_confidence": avg,
            "text": full_text,
            "engine": engine,
            "language": language,
            "spans": [
                {
                    "kind": kinds[i],
                    "text": texts[i],
                    "media_ref": media_refs[i],
                    "offset": offsets[i],
                }
                for i in range(s, e)
            ],
        }
        if include_pages:
            # reference pages[] tree (page_number sequential from 1,
            # ocr_service.py:148-153)
            row["pages"] = [
                {
                    "page_number": idx + 1,
                    "text": texts[i],
                    "confidence": float(conf[i]),
                    "word_count": int(wc[i]),
                    "character_count": int(cc[i]),
                    "words": (words[i] or []) if words is not None else [],
                }
                for idx, i in enumerate(range(s, e))
            ]
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=schema)
