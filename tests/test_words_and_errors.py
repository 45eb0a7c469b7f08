"""Golden-output parity extras: per-word boxes (keep_words) and the
structured error-code column; giant-document skew reassembly."""

import pyarrow as pa
import ray.data

from medical_and_charity_document_extraction_system_ray.pipelines.extraction import (
    extract_documents,
    extract_spans,
)
from medical_and_charity_document_extraction_system_ray.schema import (
    DOCUMENTS_SCHEMA,
)
from medical_and_charity_document_extraction_system_ray.stages import SpanExtractor


def _doc(doc_id, spans):
    return {"doc_id": doc_id, "spans": spans}


def test_keep_words_golden_shape():
    # media-dominant doc -> scanned -> OCR path emits per-word boxes
    docs = pa.Table.from_pylist(
        [
            _doc(
                "w1",
                [
                    {"kind": "media", "text": "", "media_ref": "mem://w1/0", "offset": 0},
                ],
            )
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    rows = extract_spans(
        ray.data.from_arrow(docs), ocr_concurrency=1, keep_words=True
    ).take_all()
    assert len(rows) == 1
    words = rows[0]["words"]
    assert len(words) >= 1
    w = words[0]
    assert set(w) == {"text", "confidence", "bbox", "block_num", "line_num", "word_num"}
    assert set(w["bbox"]) == {"left", "top", "width", "height"}
    assert rows[0]["text"].split()[0] == w["text"]


def test_error_code_column():
    batch = pa.Table.from_pylist(
        [
            {
                "doc_id": "e1", "offset": 0, "kind": "media", "text": "",
                "media_ref": "s3://x/y.png", "is_scanned": True, "page_count": 1,
            }
        ]
    )
    row = SpanExtractor()(batch).to_pylist()[0]
    assert row["success"] is False
    assert row["error_code"] == "MEDIA_UNSUPPORTED_SCHEME"
    # happy rows carry empty code
    batch2 = pa.Table.from_pylist(
        [
            {
                "doc_id": "e2", "offset": 0, "kind": "text", "text": "hello",
                "media_ref": "", "is_scanned": False, "page_count": 1,
            }
        ]
    )
    row2 = SpanExtractor()(batch2).to_pylist()[0]
    assert row2["error_code"] == "" and row2["success"] is True


def test_giant_document_reassembles_in_order():
    # 2,000-span text-only doc (skew case): offsets shuffled on input
    n = 2000
    spans = [
        {"kind": "text", "text": f"p{k}", "media_ref": "", "offset": k}
        for k in range(n)
    ]
    import random

    random.Random(0).shuffle(spans)
    docs = pa.Table.from_pylist([_doc("giant", spans)], schema=DOCUMENTS_SCHEMA)
    out = extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=2, repartition_blocks=8
    ).take_all()
    assert len(out) == 1
    got = out[0]
    assert got["page_count"] == n
    assert [s["offset"] for s in got["spans"]] == list(range(n))
    assert got["spans"][1234]["text"] == "p1234"
    assert got["text"].startswith("--- Page 1 ---\np0\n\n--- Page 2 ---\np1")


def test_zero_span_document_survives():
    # reference semantics: 0-page PDF -> not scanned, empty direct result
    docs = pa.Table.from_pylist(
        [
            _doc("empty", []),
            _doc("normal", [
                {"kind": "text", "text": "hello " * 30, "media_ref": "", "offset": 0}
            ]),
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = {r["doc_id"]: r for r in extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=1
    ).take_all()}
    assert set(out) == {"empty", "normal"}
    e = out["empty"]
    assert e["page_count"] == 0
    assert e["text"] == "" and e["spans"] == []
    assert e["processing_method"] == "direct_text_extraction"
    assert e["average_confidence"] == 100.0

    from medical_and_charity_document_extraction_system_ray.oracle import (
        extract_document,
    )
    want = extract_document({"doc_id": "empty", "spans": []})
    for k in ("page_count", "text", "total_characters", "total_words",
              "average_confidence", "processing_method", "spans"):
        assert e[k] == want[k], k


def test_null_span_fields_tolerated():
    # dirty input: null text / media_ref / kind inside spans
    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "n1",
                "spans": [
                    {"kind": None, "text": None, "media_ref": None, "offset": 0},
                    {"kind": "text", "text": "real page content here " * 4,
                     "media_ref": "", "offset": 1},
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=1
    ).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["page_count"] == 2
    assert r["spans"][0]["text"] == ""  # null treated as empty text layer
    assert "real page content" in r["spans"][1]["text"]


def test_include_pages_golden_tree():
    # the reference's full output tree: pages[].words[].bbox
    docs = pa.Table.from_pylist(
        [
            _doc(
                "g1",
                [
                    {"kind": "media", "text": "", "media_ref": "mem://g1/0", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": "mem://g1/1", "offset": 1},
                ],
            )
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=1, include_pages=True
    ).take_all()
    r = out[0]
    assert r["page_count"] == 2
    pages = r["pages"]
    assert [p["page_number"] for p in pages] == [1, 2]
    for p, s in zip(pages, r["spans"]):
        assert p["text"] == s["text"]
        assert p["character_count"] == len(p["text"])
        assert p["word_count"] == len(p["words"])
        if p["words"]:
            w = p["words"][0]
            assert set(w["bbox"]) == {"left", "top", "width", "height"}
    # aggregate math consistent with the pages tree (ocr_service.py:188-227)
    assert r["total_words"] == sum(p["word_count"] for p in pages)
    assert r["total_characters"] == sum(p["character_count"] for p in pages)
    avg = round(sum(p["confidence"] for p in pages) / len(pages), 2)
    assert r["average_confidence"] == avg


def test_reference_golden_file_parity():
    """The engine's include_pages output tree + aggregate formulas
    checked against the reference's REAL golden output
    (/root/reference/storage/json_tasks/task_1.json — an actual EasyOCR
    run, ocr_service.py:215-227): same nested key tree, and OUR
    reassembly math (PAGE_HEADER/PAGE_SEP templating, round(mean, 2))
    reproduces the golden's recorded aggregates bit-for-bit."""
    import json
    import os

    import pytest

    from medical_and_charity_document_extraction_system_ray.schema import (
        PAGE_HEADER,
        PAGE_SEP,
    )

    golden_path = "/root/reference/storage/json_tasks/task_1.json"
    if not os.path.exists(golden_path):
        pytest.skip("reference golden not present")
    with open(golden_path) as f:
        golden = json.load(f)

    # ---- the golden's aggregates derive from OUR formulas ------------
    pages = golden["pages"]
    assert golden["average_confidence"] == round(
        sum(p["confidence"] for p in pages) / len(pages), 2
    )
    assert golden["total_words"] == sum(p["word_count"] for p in pages)
    assert golden["total_characters"] == sum(p["character_count"] for p in pages)
    assert golden["page_count"] == len(pages)
    assert golden["text"] == PAGE_SEP.join(
        PAGE_HEADER.format(n=i + 1) + p["text"] for i, p in enumerate(pages)
    )

    # ---- key-tree parity: run the engine, compare trees ---------------
    docs = pa.Table.from_pylist(
        [
            _doc(
                "gp1",
                [
                    {"kind": "media", "text": "", "media_ref": "mem://gp1/0",
                     "offset": 0},
                ],
            )
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    r = extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=1, include_pages=True
    ).take_all()[0]
    # doc level: every golden key except the reference's filesystem
    # path (pdf_path -> our doc_id; documented elimination, SURVEY §2.1)
    doc_keys = set(golden) - {"pdf_path"}
    assert doc_keys <= set(r) | {"spans"}
    # page level: image_path (per-page PNG round-trip, eliminated) and
    # engine/language/metadata (doc-level here) are the known deltas
    page_keys = set(golden["pages"][0]) - {
        "image_path", "engine", "language", "metadata",
    }
    assert page_keys <= set(r["pages"][0])
    # word level: identical tree incl. the bbox struct
    gw = golden["pages"][0]["words"][0]
    ow = r["pages"][0]["words"][0]
    assert set(gw) == set(ow)
    assert set(gw["bbox"]) == set(ow["bbox"])
    # golden value sanity the engine must also satisfy
    assert all(0.0 <= w["confidence"] <= 100.0 for w in golden["pages"][0]["words"])
    assert all(0.0 <= w["confidence"] <= 100.0 for w in r["pages"][0]["words"])


def test_stable_error_codes():
    from medical_and_charity_document_extraction_system_ray.errors import (
        MediaCodecUnavailableError,
        MediaSchemeError,
        OcrProcessingError,
        stable_error_code,
    )

    assert stable_error_code(MediaSchemeError("x")) == "MEDIA_UNSUPPORTED_SCHEME"
    assert stable_error_code(MediaCodecUnavailableError("x")) == "MEDIA_CODEC_UNAVAILABLE"
    assert stable_error_code(OcrProcessingError("x")) == "OCR_PROCESSING_FAILED"
    assert stable_error_code(FileNotFoundError("x")) == "MEDIA_NOT_FOUND"
    assert stable_error_code(NotImplementedError("x")) == "MEDIA_CODEC_UNAVAILABLE"
    assert stable_error_code(ValueError("x")) == "INVALID_VALUE"
    # IsADirectoryError is an OSError subclass -> mapped through the MRO
    assert stable_error_code(IsADirectoryError("x")) == "IO_ERROR"

    class Weird(Exception):
        pass

    assert stable_error_code(Weird()) == "UNCLASSIFIED_Weird"


def test_missing_local_png_is_error_row():
    batch = pa.Table.from_pylist(
        [
            {
                "doc_id": "e3", "offset": 0, "kind": "media", "text": "",
                "media_ref": "/nonexistent/page.png", "is_scanned": True,
                "page_count": 1,
            }
        ]
    )
    row = SpanExtractor()(batch).to_pylist()[0]
    assert row["success"] is False
    assert row["error_code"] == "MEDIA_NOT_FOUND"


def test_merge_skip_accounting(tmp_path):
    """merge_pdfs skip semantics: empty-text docs (the missing/encrypted
    analog) are skipped and counted; page totals reported."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_merge_documents,
    )

    rows = [
        {"doc_id": 1, "source": "s1", "text": "x" * 450},   # 3 pages
        {"doc_id": 2, "source": "s1", "text": ""},          # skipped
        {"doc_id": 3, "source": "s1", "text": "short"},     # 1 page
        {"doc_id": 4, "source": "s2", "text": ""},          # all skipped
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = q_merge_documents(str(tmp_path)).to_pandas().set_index("source")
    s1 = out.loc["s1"]
    assert (s1["n_docs"], s1["n_merged"], s1["n_skipped"]) == (3, 1 + 1, 1)
    assert s1["total_pages"] == 4
    assert s1["merged_text"] == "x" * 450 + "\n\n" + "short"
    s2 = out.loc["s2"]
    assert (s2["n_docs"], s2["n_merged"], s2["n_skipped"]) == (1, 0, 1)
    assert s2["total_pages"] == 0 and s2["merged_text"] == ""


def test_reference_exception_taxonomy_mirror_complete():
    """r4 verdict ask #8: every class of the reference exception tree
    (backend/app/utils/exceptions.py:4-280, 49 classes) must round-trip
    to a stable engine code.  When the reference snapshot is present
    the class list is parsed from it; the count pin keeps the check
    honest standalone."""
    import ast
    import os

    from medical_and_charity_document_extraction_system_ray.errors import (
        REFERENCE_ERROR_CODES,
        reference_error_code,
    )

    assert len(REFERENCE_ERROR_CODES) == 49
    for name, code in REFERENCE_ERROR_CODES.items():
        assert code and code == code.upper(), (name, code)
        assert reference_error_code(name) == code

    ref = "/root/reference/backend/app/utils/exceptions.py"
    if os.path.isfile(ref):
        with open(ref) as f:
            tree = ast.parse(f.read())
        classes = {
            n.name for n in ast.walk(tree) if isinstance(n, ast.ClassDef)
        }
        assert classes == set(REFERENCE_ERROR_CODES), (
            classes ^ set(REFERENCE_ERROR_CODES)
        )

    # unknown names stay queryable, mirroring stable_error_code
    assert reference_error_code("SomeNewError") == "UNCLASSIFIED_SomeNewError"


def test_giant_document_100k_spans_byte_exact_bounded():
    """r4 verdict ask #7: one document much larger than one batch
    (100k spans vs the 256-row default batch) must reassemble
    byte-exactly through the bucketed shuffle, without the driver or a
    worker accumulating the doc more than O(doc) — asserted via driver
    max-RSS growth (a quadratic reassembly would trip the bound).

    Span texts are >=50 chars so the classifier takes the DIRECT path:
    the stress target is the reassembly shuffle, not 100k OCR
    rasterizations (the scanned path's per-page kernels are stress-
    covered by the 5k-span conformance giant)."""
    import random
    import resource

    n = 100_000
    page = "page {k:06d} lorem ipsum dolor sit amet consectetur adipiscing"
    texts = [page.format(k=k) for k in range(n)]
    spans = [
        {"kind": "text", "text": texts[k], "media_ref": "", "offset": k}
        for k in range(n)
    ]
    random.Random(1).shuffle(spans)
    docs = pa.Table.from_pylist([_doc("giant100k", spans)], schema=DOCUMENTS_SCHEMA)
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out = extract_documents(
        ray.data.from_arrow(docs), ocr_concurrency=2, repartition_blocks=16
    ).take_all()
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert len(out) == 1
    got = out[0]
    assert got["processing_method"] == "direct_text_extraction"
    assert got["page_count"] == n
    offs = [s["offset"] for s in got["spans"]]
    assert offs == list(range(n))
    # byte-exact against the reference's join semantics, not a prefix
    expected = "\n\n".join(
        f"--- Page {k + 1} ---\n{texts[k]}" for k in range(n)
    )
    assert got["text"] == expected
    # reference semantics: sum of PER-PAGE char counts, not len(joined)
    assert got["total_characters"] == sum(len(t) for t in texts)
    # driver growth stays O(doc): the payload is ~6 MB; 512 MiB bound
    # catches any accumulate-everything or quadratic-join regression
    # (ru_maxrss is KiB on linux)
    assert (rss_after - rss_before) < 512 * 1024, (rss_before, rss_after)
