"""Property-based tests (hypothesis) for the deterministic cores."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from medical_and_charity_document_extraction_system_ray.fixtures.media import (
    decode_text_image,
    encode_text_image,
)
from medical_and_charity_document_extraction_system_ray.functions.text import (
    token_count,
)
from medical_and_charity_document_extraction_system_ray.oracle import (
    classify_document,
)
from medical_and_charity_document_extraction_system_ray.stages.classify import (
    classify_batch,
)
from medical_and_charity_document_extraction_system_ray.schema import DOCUMENTS_SCHEMA

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=400,
)


@settings(max_examples=40, deadline=None)
@given(texts)
def test_codec_roundtrip_any_text(t):
    assert decode_text_image(encode_text_image(t)) == t


@settings(max_examples=40, deadline=None)
@given(texts)
def test_token_count_matches_duckdb(t):
    """The contract is bit-parity with the DuckDB oracle expression
    (hypothesis exposed that python str.split() differs on unicode
    whitespace like NBSP — RE2 \\s is ASCII-only)."""
    import duckdb

    if "\x00" in t:
        return  # NUL is not representable in a duckdb varchar literal
    got = token_count(pa.array([t]))[0].as_py()
    want = duckdb.execute(
        "SELECT CASE WHEN length(trim(?)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(?), '\\s+')) END",
        [t, t],
    ).fetchone()[0]
    assert got == want, repr(t)


span_lists = st.lists(
    st.tuples(
        st.sampled_from(["text", "media"]),
        st.text(max_size=120),
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(span_lists, min_size=1, max_size=5))
def test_classifier_vectorized_matches_oracle(doclists):
    docs = []
    for i, spans in enumerate(doclists):
        docs.append(
            {
                "doc_id": f"d{i}",
                "spans": [
                    {
                        "kind": k,
                        "text": "" if k == "media" else t,
                        "media_ref": "mem://x/0" if k == "media" else "",
                        "offset": off,
                    }
                    for off, (k, t) in enumerate(spans)
                ],
            }
        )
    table = pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)
    got = classify_batch(table).column("is_scanned").to_pylist()
    want = [classify_document(d["spans"]) for d in docs]
    assert got == want
