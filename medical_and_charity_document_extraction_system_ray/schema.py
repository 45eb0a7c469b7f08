"""Arrow schemas for the engine.

The reference manipulates untyped dicts (see SURVEY.md §1.1); the engine
declares fixed ``pyarrow`` schemas once and keeps data columnar end to
end.  Input shape follows ``BASELINE.json.input_hint``; output shape
follows the reference's document-result dict
(``backend/app/services/ocr_service.py:215-227``) plus the extracted
span sequence that is the per-row equality target.
"""

from __future__ import annotations

import pyarrow as pa

KIND_TEXT = "text"
KIND_MEDIA = "media"
KIND_HTML = "html"  # html source in `text`; extraction = boilerplate strip

# --- input ---------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "media"
        pa.field("text", pa.string()),       # page text; "" for media spans
        pa.field("media_ref", pa.string()),  # "" for text spans
        pa.field("offset", pa.int32()),      # dense 0-based position in doc
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# --- exploded span rows (between explode and reassembly) -----------------

SPAN_ROWS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("is_scanned", pa.bool_()),
        pa.field("page_count", pa.int32()),
    ]
)

# --- extracted span rows (output of the extraction stage) ----------------

EXTRACTED_ROWS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),        # extracted text for this page
        pa.field("media_ref", pa.string()),
        pa.field("is_scanned", pa.bool_()),
        pa.field("page_count", pa.int32()),
        pa.field("confidence", pa.float64()),
        pa.field("word_count", pa.int64()),
        pa.field("character_count", pa.int64()),
        pa.field("engine", pa.string()),
        pa.field("language", pa.string()),
        # error-row semantics (ocr_service.py:229-243): errors become data
        pa.field("error", pa.string()),       # "" when success
        pa.field("error_code", pa.string()),  # exception class name ("" when success)
        pa.field("success", pa.bool_()),
    ]
)

# per-word OCR results (golden-output shape, storage/json_tasks/task_1.json:
# pages[].words[].{text,confidence,bbox{left,top,width,height},block_num,
# line_num,word_num}); attached to span rows only when keep_words=True
WORD_STRUCT = pa.struct(
    [
        pa.field("text", pa.string()),
        pa.field("confidence", pa.float64()),
        pa.field(
            "bbox",
            pa.struct(
                [
                    pa.field("left", pa.int32()),
                    pa.field("top", pa.int32()),
                    pa.field("width", pa.int32()),
                    pa.field("height", pa.int32()),
                ]
            ),
        ),
        pa.field("block_num", pa.int32()),
        pa.field("line_num", pa.int32()),
        pa.field("word_num", pa.int32()),
    ]
)

# --- reassembled document results ----------------------------------------

RESULT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("is_scanned", pa.bool_()),
        pa.field("processing_method", pa.string()),  # "direct_text_extraction" | "ocr_pipeline"
        pa.field("page_count", pa.int32()),
        pa.field("total_characters", pa.int64()),
        pa.field("total_words", pa.int64()),         # 0 on the direct-text path
        pa.field("average_confidence", pa.float64()),  # round(mean, 2); 100.0 direct
        pa.field("text", pa.string()),               # "--- Page {n} ---\n{t}" joined by "\n\n"
        pa.field("engine", pa.string()),
        pa.field("language", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),    # extracted spans, offset order
    ]
)

PAGE_HEADER = "--- Page {n} ---\n"
PAGE_SEP = "\n\n"

# per-page result struct (reference pages[] output,
# ocr_service.py:148-153 + golden storage/json_tasks/task_1.json);
# attached to document results only when include_pages=True
PAGE_STRUCT = pa.struct(
    [
        pa.field("page_number", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("confidence", pa.float64()),
        pa.field("word_count", pa.int64()),
        pa.field("character_count", pa.int64()),
        pa.field("words", pa.list_(WORD_STRUCT)),
    ]
)

RESULT_SCHEMA_WITH_PAGES = RESULT_SCHEMA.append(
    pa.field("pages", pa.list_(PAGE_STRUCT))
)

# Scanned-vs-text classifier constants (pdf_service.py:231-259)
CLASSIFIER_SAMPLE_PAGES = 3
CLASSIFIER_THRESHOLD_CHARS = 50.0

# Direct-path constants (pdf_service.py:210, ocr_service.py:67)
TEXT_BASED_MIN_CHARS = 100
DIRECT_CONFIDENCE = 100.0
