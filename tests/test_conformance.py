"""End-to-end conformance: Ray pipeline == pure-python oracle.

The north-rule invariant (BASELINE.json / FIXTURES.md §2): for every
document, the pipeline's output span sequence equals the oracle's under
``(kind, text, media_ref, order)`` — elementwise, in order, byte-exact
— plus the aggregate fields of the document result.
"""

import math

import pyarrow as pa
import pytest
import ray.data

from medical_and_charity_document_extraction_system_ray.fixtures import (
    make_documents_table,
)
from medical_and_charity_document_extraction_system_ray.oracle import extract_table
from medical_and_charity_document_extraction_system_ray.pipelines import (
    extract_documents,
)
from medical_and_charity_document_extraction_system_ray.schema import RESULT_SCHEMA

NUM_DOCS = 80


@pytest.fixture(scope="module")
def docs_table() -> pa.Table:
    return make_documents_table(NUM_DOCS, seed=42)


@pytest.fixture(scope="module")
def pipeline_result(docs_table):
    ds = ray.data.from_arrow(docs_table).repartition(8)
    out = extract_documents(ds, ocr_concurrency=2, ocr_batch_size=64)
    rows = out.take_all()
    return {r["doc_id"]: r for r in rows}


@pytest.fixture(scope="module")
def oracle_result(docs_table):
    return {r["doc_id"]: r for r in extract_table(docs_table.to_pylist())}


def test_all_documents_present(pipeline_result, oracle_result):
    assert set(pipeline_result) == set(oracle_result)
    assert len(pipeline_result) == NUM_DOCS


def test_span_sequence_equality(pipeline_result, oracle_result):
    """THE invariant: (kind, text, media_ref, order) per document."""
    for doc_id, want in oracle_result.items():
        got = pipeline_result[doc_id]
        got_seq = [(s["kind"], s["text"], s["media_ref"]) for s in got["spans"]]
        want_seq = [(s["kind"], s["text"], s["media_ref"]) for s in want["spans"]]
        assert got_seq == want_seq, f"span mismatch for {doc_id}"
        # offsets strictly ordered
        offs = [s["offset"] for s in got["spans"]]
        assert offs == sorted(offs)


def test_document_aggregates(pipeline_result, oracle_result):
    for doc_id, want in oracle_result.items():
        got = pipeline_result[doc_id]
        assert got["is_scanned"] == want["is_scanned"], doc_id
        assert got["processing_method"] == want["processing_method"], doc_id
        assert got["page_count"] == want["page_count"], doc_id
        assert got["total_characters"] == want["total_characters"], doc_id
        assert got["total_words"] == want["total_words"], doc_id
        assert math.isclose(
            got["average_confidence"], want["average_confidence"], abs_tol=0.0
        ), doc_id
        assert got["text"] == want["text"], doc_id
        assert got["engine"] == want["engine"], doc_id
        assert got["language"] == want["language"], doc_id


def test_both_classifier_branches_exercised(oracle_result):
    methods = {r["processing_method"] for r in oracle_result.values()}
    assert methods == {"direct_text_extraction", "ocr_pipeline"}


def test_output_schema(pipeline_result):
    row = next(iter(pipeline_result.values()))
    assert set(row) == set(RESULT_SCHEMA.names)
