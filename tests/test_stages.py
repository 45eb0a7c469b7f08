"""Stage-level unit tests (no full pipeline): classify, explode,
reassemble segment-safety, extractor error rows."""

import pyarrow as pa

from medical_and_charity_document_extraction_system_ray.fixtures import (
    make_documents_table,
)
from medical_and_charity_document_extraction_system_ray.oracle import (
    classify_document,
)
from medical_and_charity_document_extraction_system_ray.schema import (
    DOCUMENTS_SCHEMA,
    EXTRACTED_ROWS_SCHEMA,
)
from medical_and_charity_document_extraction_system_ray.stages import (
    SpanExtractor,
    classify_and_explode,
    classify_batch,
    reassemble_table,
)


def test_classify_matches_oracle():
    table = make_documents_table(120, seed=42)
    got = classify_batch(table)
    scanned = got.column("is_scanned").to_pylist()
    for i, doc in enumerate(table.to_pylist()):
        assert scanned[i] == classify_document(doc["spans"]), doc["doc_id"]


def test_explode_row_count_and_columns():
    table = make_documents_table(40, seed=42)
    rows = classify_and_explode(table)
    expected = sum(len(d["spans"]) for d in table.to_pylist())
    assert len(rows) == expected
    assert rows.column_names == [
        "doc_id", "offset", "kind", "text", "media_ref", "is_scanned", "page_count",
    ]


def test_extractor_error_rows_for_bad_media():
    batch = pa.Table.from_pylist(
        [
            {
                "doc_id": "d1",
                "offset": 0,
                "kind": "media",
                "text": "",
                "media_ref": "s3://nope/image.png",  # unsupported scheme
                "is_scanned": True,
                "page_count": 1,
            }
        ]
    )
    out = SpanExtractor()(batch)
    assert out.schema.equals(EXTRACTED_ROWS_SCHEMA)
    row = out.to_pylist()[0]
    assert row["success"] is False
    assert row["text"] == ""
    assert row["confidence"] == 0.0
    assert "scheme" in row["error"] or "media_ref" in row["error"]


def test_reassemble_multi_group_segment_safety():
    # one table holding two complete groups with shuffled row order
    rows = []
    for doc, offs in (("b", [1, 0]), ("a", [2, 0, 1])):
        for o in offs:
            rows.append(
                {
                    "doc_id": doc,
                    "offset": o,
                    "kind": "text",
                    "text": f"{doc}{o}",
                    "media_ref": "",
                    "is_scanned": False,
                    "page_count": len(offs),
                    "confidence": 100.0,
                    "word_count": 0,
                    "character_count": 2,
                    "engine": None,
                    "language": None,
                    "error": "",
                    "success": True,
                }
            )
    out = reassemble_table(pa.Table.from_pylist(rows)).to_pylist()
    assert [r["doc_id"] for r in out] == ["a", "b"]
    a = out[0]
    assert [s["text"] for s in a["spans"]] == ["a0", "a1", "a2"]
    assert a["text"] == (
        "--- Page 1 ---\na0\n\n--- Page 2 ---\na1\n\n--- Page 3 ---\na2"
    )


def test_documents_schema_matches_input_hint():
    table = make_documents_table(3, seed=1)
    assert table.schema.equals(DOCUMENTS_SCHEMA)
