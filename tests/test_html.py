"""HTML boilerplate-strip kernel + pipeline path (north-rule DOM
text-density heuristics; no reference analog — semantics defined by
the oracle, SURVEY.md §7.1 step 9)."""

import numpy as np
import pyarrow as pa
import ray.data

from medical_and_charity_document_extraction_system_ray.fixtures.generate import (
    _html_page,
    make_documents_table,
)
from medical_and_charity_document_extraction_system_ray.kernels.html import (
    strip_boilerplate,
)
from medical_and_charity_document_extraction_system_ray.oracle import extract_document
from medical_and_charity_document_extraction_system_ray.pipelines import (
    extract_documents,
)
from medical_and_charity_document_extraction_system_ray.schema import DOCUMENTS_SCHEMA


def test_strip_keeps_body_drops_nav():
    body = "the charity hospital issued a receipt for the donation today"
    html = (
        '<html><head><script>nav()</script><style>.x{}</style></head><body>'
        '<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        f"<p>{body}</p>"
        '<div class="footer"><a href="/t">Terms</a> (c)</div>'
        "</body></html>"
    )
    assert strip_boilerplate(html) == body


def test_strip_link_density_filter():
    # a long block that is mostly links is boilerplate
    links = " ".join(f'<a href="/{i}">Category number {i}</a>' for i in range(10))
    assert strip_boilerplate(f"<div>{links}</div>") == ""


def test_strip_multi_paragraph_order():
    p1 = "first paragraph with enough characters to be kept around"
    p2 = "second paragraph also long enough to clear the threshold"
    out = strip_boilerplate(f"<body><p>{p1}</p><p>{p2}</p></body>")
    assert out == f"{p1}\n{p2}"


def test_html_span_pipeline_matches_oracle():
    rng = np.random.default_rng(123)
    docs = [
        {
            "doc_id": f"h{i}",
            "spans": [
                {"kind": "html", "text": _html_page(rng), "media_ref": "", "offset": 0},
                {"kind": "text", "text": "plain page text " * 5, "media_ref": "", "offset": 1},
            ],
        }
        for i in range(4)
    ]
    table = pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in extract_documents(
            ray.data.from_arrow(table), ocr_concurrency=1
        ).take_all()
    }
    for d in docs:
        want = extract_document(d)
        g = got[d["doc_id"]]
        assert [s["text"] for s in g["spans"]] == [s["text"] for s in want["spans"]]
        assert g["text"] == want["text"]
        assert g["total_characters"] == want["total_characters"]
        # stripped text contains no tags
        assert "<" not in g["spans"][0]["text"]
        assert "Home" not in g["spans"][0]["text"]


def test_generator_emits_html_spans():
    t = make_documents_table(300, seed=42)
    kinds = set()
    for d in t.to_pylist():
        kinds.update(s["kind"] for s in d["spans"])
    assert {"text", "media", "html"} <= kinds
