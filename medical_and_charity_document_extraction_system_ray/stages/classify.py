"""Scanned-vs-text classification + span explode (vectorized Arrow).

Classifier semantics = the reference's ``is_pdf_scanned``
(``backend/app/services/pdf_service.py:231-259``): sample the first
``min(3, page_count)`` pages, compute the average stripped text length,
scanned iff average < 50; a document with zero pages is NOT scanned.
In the span model "first 3 pages" = spans with ``offset`` in {0,1,2}
(offsets are dense 0-based), so the classifier is a pure columnar
computation over the nested ``spans`` column — no python row loop.

Both stages run as stateless ``map_batches(fn, batch_format="pyarrow")``
(zero-copy Arrow batches).  The explode is the doc->span fan-out that
replaces the reference's sequential per-page loop
(``ocr_service.py:148``) and makes work units *spans*, so heavy-tailed
document sizes balance across the cluster (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import (
    CLASSIFIER_SAMPLE_PAGES,
    CLASSIFIER_THRESHOLD_CHARS,
    SPAN_ROWS_SCHEMA,
)


def classify_batch(batch: pa.Table) -> pa.Table:
    """Append ``is_scanned`` (bool) and ``page_count`` (int32) columns."""
    spans = batch.column("spans").combine_chunks()
    page_count = pc.list_value_length(spans).cast(pa.int32())

    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    offsets = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False)
    # null text counts as an empty text layer (dirty real-world input)
    text = pc.fill_null(pc.struct_field(flat, "text"), "")
    stripped_len = (
        pc.utf8_length(pc.utf8_trim_whitespace(text))
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )

    n = len(batch)
    sums = np.zeros(n, dtype=np.float64)
    sample_mask = offsets < CLASSIFIER_SAMPLE_PAGES
    np.add.at(sums, parent[sample_mask], stripped_len[sample_mask])

    counts = page_count.to_numpy(zero_copy_only=False).astype(np.float64)
    pages_to_check = np.minimum(counts, CLASSIFIER_SAMPLE_PAGES)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(pages_to_check > 0, sums / pages_to_check, np.inf)
    # zero-page docs -> not scanned (pdf_service.py:235-237)
    is_scanned = avg < CLASSIFIER_THRESHOLD_CHARS

    return batch.append_column(
        "is_scanned", pa.array(is_scanned, type=pa.bool_())
    ).append_column("page_count", page_count)


EMPTY_DOC_KIND = "__empty__"  # sentinel span for zero-page documents


# doc-level columns the explode consumes; anything else on the input
# batch is treated as a passthrough column and replicated per span
# (e.g. the checkpoint runner's partition_id)
_CONSUMED_COLUMNS = frozenset({"doc_id", "spans", "is_scanned", "page_count"})


def explode_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans, is_scanned, page_count, *extra) -> one row per
    span; unrecognized input columns pass through (replicated per span).

    A document with an empty ``spans`` list would otherwise vanish from
    the pipeline; it gets one sentinel row (kind ``__empty__``) that the
    extractor passes through and reassembly turns into the reference's
    empty-document result (0 pages, empty text, direct path —
    ``pdf_service.py:182-211`` with no pages)."""
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    extra = [c for c in batch.column_names if c not in _CONSUMED_COLUMNS]

    out = pa.Table.from_arrays(
        [
            pc.take(batch.column("doc_id"), parent),
            pc.struct_field(flat, "offset"),
            pc.fill_null(pc.struct_field(flat, "kind"), "text"),
            pc.fill_null(pc.struct_field(flat, "text"), ""),
            pc.fill_null(pc.struct_field(flat, "media_ref"), ""),
            pc.take(batch.column("is_scanned"), parent),
            pc.take(batch.column("page_count"), parent),
        ],
        schema=SPAN_ROWS_SCHEMA,
    )
    for name in extra:
        out = out.append_column(name, pc.take(batch.column(name), parent))

    empty_mask = pc.equal(pc.list_value_length(spans), 0)
    if pc.any(empty_mask).as_py():
        empties = batch.filter(empty_mask)
        n = len(empties)
        sentinel = pa.Table.from_arrays(
            [
                empties.column("doc_id"),
                pa.array([0] * n, pa.int32()),
                pa.array([EMPTY_DOC_KIND] * n),
                pa.array([""] * n),
                pa.array([""] * n),
                empties.column("is_scanned"),
                empties.column("page_count"),
            ],
            schema=SPAN_ROWS_SCHEMA,
        )
        for name in extra:
            sentinel = sentinel.append_column(name, empties.column(name))
        out = pa.concat_tables([out, sentinel])
    return out


def classify_and_explode(batch: pa.Table) -> pa.Table:
    """Fused classify+explode (one pass over the nested column)."""
    return explode_batch(classify_batch(batch))
