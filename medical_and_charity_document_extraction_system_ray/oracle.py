"""Pure-python conformance oracle: reference semantics, one document at
a time.

Reimplements the control flow of ``OCRService.process_pdf``
(``/root/reference/backend/app/services/ocr_service.py:33-128``) over
the interleaved span model, sequentially, with the same kernels and
engine the Ray pipeline uses — so pytest span-sequence equality
verifies that the distributed plumbing (explode, actor pool, shuffle,
per-group sort) preserves document-at-a-time semantics exactly
(FIXTURES.md §2).

- classifier: avg stripped chars over first <=3 pages < 50 -> scanned
  (``pdf_service.py:231-259``); zero pages -> not scanned
- direct path: page text verbatim, confidence 100.0
  (``pdf_service.py:164-229``, ``ocr_service.py:59-68``)
- OCR path: rasterize -> preprocess -> engine per page, error rows on
  failure (``ocr_service.py:79-106,154-157,229-243``)
- combine: "--- Page {n} ---\\n" header join, sums, round(mean, 2)
  (``ocr_service.py:188-227``)
"""

from __future__ import annotations

from typing import Any

from .engines import create_ocr_engine
from .fixtures.media import encode_text_image
from .kernels.html import strip_boilerplate
from .kernels.preprocess import PreprocessConfig, preprocess_image_array
from .schema import (
    CLASSIFIER_SAMPLE_PAGES,
    CLASSIFIER_THRESHOLD_CHARS,
    DIRECT_CONFIDENCE,
    KIND_HTML,
    KIND_TEXT,
    PAGE_HEADER,
    PAGE_SEP,
)
from .sources.media_resolver import MediaResolver


def classify_document(spans: list[dict[str, Any]]) -> bool:
    """True iff the document is 'scanned' (avg stripped text of the
    first <=3 pages below 50 chars)."""
    if not spans:
        return False
    ordered = sorted(spans, key=lambda s: s["offset"])
    pages_to_check = min(CLASSIFIER_SAMPLE_PAGES, len(ordered))
    total = sum(len(ordered[i]["text"].strip()) for i in range(pages_to_check))
    return total / pages_to_check < CLASSIFIER_THRESHOLD_CHARS


def extract_document(
    doc: dict[str, Any],
    *,
    engine: str | None = None,
    language: str = "eng",
    preprocess: bool = True,
    document_type: str = "general",
    _engine_cache: dict | None = None,
) -> dict[str, Any]:
    """One document through reference semantics; returns a result row
    shaped like :data:`..schema.RESULT_SCHEMA`."""
    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    is_scanned = classify_document(doc["spans"])

    if not is_scanned:
        pages = [
            strip_boilerplate(s["text"]) if s["kind"] == KIND_HTML else s["text"]
            for s in spans
        ]
        full_text = PAGE_SEP.join(
            PAGE_HEADER.format(n=i + 1) + p for i, p in enumerate(pages)
        )
        return {
            "doc_id": doc["doc_id"],
            "is_scanned": False,
            "processing_method": "direct_text_extraction",
            "page_count": len(pages),
            "total_characters": sum(len(p) for p in pages),
            "total_words": 0,
            "average_confidence": DIRECT_CONFIDENCE,
            "text": full_text,
            "engine": None,
            "language": None,
            "spans": [
                {
                    "kind": s["kind"],
                    "text": p,  # extracted page text (stripped for html)
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
                for s, p in zip(spans, pages)
            ],
        }

    # OCR path — sequential per-page loop like ocr_service.process_images
    if _engine_cache is not None:
        key = f"{engine}_{language}"
        ocr = _engine_cache.get(key)
        if ocr is None:
            ocr = create_ocr_engine(engine, language=language)
            ocr.initialize()
            _engine_cache[key] = ocr
    else:
        ocr = create_ocr_engine(engine, language=language)
        ocr.initialize()
    resolver = MediaResolver()
    config = PreprocessConfig.for_document_type(document_type)

    page_results: list[dict[str, Any]] = []
    for s in spans:
        try:
            if s["kind"] == KIND_HTML:
                t = strip_boilerplate(s["text"])
                page_results.append(
                    {
                        "text": t,
                        "confidence": DIRECT_CONFIDENCE,
                        "word_count": len(t.split()),
                        "character_count": len(t),
                    }
                )
                continue
            if s["kind"] == KIND_TEXT:
                img = encode_text_image(s["text"])
            else:
                img = resolver.resolve(s["media_ref"])
            if preprocess:
                img, _ = preprocess_image_array(img, config)
            result = ocr.process_image(img)
            page_results.append(result)
        except Exception as e:
            # _create_error_result (ocr_service.py:229-243)
            page_results.append(
                {
                    "text": "",
                    "confidence": 0.0,
                    "word_count": 0,
                    "character_count": 0,
                    "error": str(e),
                    "success": False,
                }
            )

    full_text = PAGE_SEP.join(
        PAGE_HEADER.format(n=i + 1) + r.get("text", "")
        for i, r in enumerate(page_results)
    )
    avg = (
        sum(r.get("confidence", 0) for r in page_results) / len(page_results)
        if page_results
        else 0.0
    )
    return {
        "doc_id": doc["doc_id"],
        "is_scanned": True,
        "processing_method": "ocr_pipeline",
        "page_count": len(page_results),
        "total_characters": sum(r.get("character_count", 0) for r in page_results),
        "total_words": sum(r.get("word_count", 0) for r in page_results),
        "average_confidence": round(avg, 2),
        "text": full_text,
        "engine": page_results[0].get("engine") if page_results else None,
        "language": page_results[0].get("language") if page_results else None,
        "spans": [
            {
                "kind": s["kind"],
                "text": r.get("text", ""),
                "media_ref": s["media_ref"],
                "offset": s["offset"],
            }
            for s, r in zip(spans, page_results)
        ],
    }


def extract_table(docs: list[dict[str, Any]], **kwargs) -> list[dict[str, Any]]:
    """Oracle over a list of document dicts (engine cached across docs,
    like the reference's per-process cache)."""
    cache: dict = {}
    return [extract_document(d, _engine_cache=cache, **kwargs) for d in docs]
