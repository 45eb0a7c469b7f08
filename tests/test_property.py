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


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([60, 80, 95, 100]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_decoder_total_on_random_images(h, w, seed, quality):
    """Any uint8 image en/decodes without error, right shape, and the
    reconstruction error is bounded by the quantization scale."""
    from medical_and_charity_document_extraction_system_ray.sources.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=quality))
    assert out.shape == (h, w) and out.dtype == np.uint8
    if quality == 100 and h >= 8 and w >= 8:
        # near-lossless at q100 on interior content
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 12


@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from(["none", "packbits", "lzw"]),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_tiff_roundtrip_exact_on_random_images(h, w, seed, comp, predictor):
    from medical_and_charity_document_extraction_system_ray.sources.tiffcodec import (
        tiff_decode,
        tiff_encode,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    out = tiff_decode(tiff_encode(img, compression=comp, predictor=predictor))
    np.testing.assert_array_equal(out, img)


@given(
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([1, 2]),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_bounded_error(n, seed, channels):
    from medical_and_charity_document_extraction_system_ray.sources.wavcodec import (
        wav_decode,
        wav_encode,
    )

    x = np.random.default_rng(seed).uniform(-1, 1, (n, channels)).astype(np.float32)
    if channels == 1:
        x = x[:, 0]
    out, rate = wav_decode(wav_encode(x, 8000))
    assert rate == 8000 and out.shape == x.shape
    assert np.abs(out - x).max() <= 1.5 / 32768  # 16-bit quantization bound


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            min_size=0,
            max_size=400,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_cdc_chunks_partition_text(texts):
    """CDC invariants on arbitrary unicode: per doc, chunk count >= 1
    for non-empty text, chunk lengths sum to the codepoint count, and
    hashes are reproducible (same input twice -> identical tables)."""
    import numpy as np
    import pyarrow as pa
    from medical_and_charity_document_extraction_system_ray.functions.text import (
        utf8_codepoints,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines import cleaning

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # drive the explode fn directly (no Ray session needed)
    ds_like = []
    explode = None
    # rebuild the inner explode via the public query pieces: call the
    # module-private path by constructing the same math here
    cps, rows = utf8_codepoints(t["text"].combine_chunks())
    n_cps = np.bincount(rows, minlength=len(texts))
    # run the packaged explode through a one-batch pipeline shim
    captured = {}
    orig_read = cleaning.read_table
    class _FakeDS:
        def map_batches(self, fn, **kw):
            captured["out"] = fn(t)
            raise _Stop()
    class _Stop(Exception):
        pass
    try:
        cleaning.read_table = lambda *a, **k: _FakeDS()
        try:
            cleaning.q_cdc_dedup("ignored")
        except _Stop:
            pass
    finally:
        cleaning.read_table = orig_read
    mid = captured["out"]
    stats = mid.filter(
        pa.compute.greater_equal(mid["bucket"], pa.scalar(64, pa.int64()))
    )
    chunks = mid.filter(
        pa.compute.less(mid["bucket"], pa.scalar(64, pa.int64()))
    )
    n_chunks_by_doc = dict(zip(stats["doc_id"].to_pylist(), stats["occ"].to_pylist()))
    chars_by_doc: dict[int, int] = {}
    occ_by_doc: dict[int, int] = {}
    for d, c, o in zip(
        chunks["doc_id"].to_pylist(), chunks["chars"].to_pylist(),
        chunks["occ"].to_pylist(),
    ):
        chars_by_doc[d] = chars_by_doc.get(d, 0) + c
        occ_by_doc[d] = occ_by_doc.get(d, 0) + o
    for i, txt in enumerate(texts):
        n = int(n_cps[i])
        if n == 0:
            assert n_chunks_by_doc.get(i, 0) == 0
        else:
            assert n_chunks_by_doc[i] >= 1
            assert chars_by_doc[i] == n          # chunks partition the text
            assert occ_by_doc[i] == n_chunks_by_doc[i]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),   # grid score
            st.integers(min_value=0, max_value=4),    # pos docs at score
            st.integers(min_value=0, max_value=4),    # neg docs at score
        ),
        max_size=12,
        unique_by=lambda x: x[0],
    )
)
def test_auc_fold_matches_bruteforce_pairs(hist):
    """_auc_fold == brute-force mean over all (pos, neg) pairs of
    win=1 / tie=0.5 / loss=0, on any histogram including degenerate
    one-class ones."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        _auc_fold,
    )

    num2, p, n, auc = _auc_fold(hist)
    pos_scores = [s for s, po, _ in hist for _ in range(po)]
    neg_scores = [s for s, _, ne in hist for _ in range(ne)]
    assert p == len(pos_scores) and n == len(neg_scores)
    if not pos_scores or not neg_scores:
        assert auc == 0.0 and num2 == sum(
            po * ne for _, po, ne in hist
        ) + 2 * sum(
            po1 * ne2
            for s1, po1, _ in hist
            for s2, _, ne2 in hist
            if s2 < s1
        )
        return
    wins2 = sum(
        2 if ps > ns else (1 if ps == ns else 0)
        for ps in pos_scores
        for ns in neg_scores
    )
    assert num2 == wins2
    assert auc == np.floor(float(wins2) / float(2 * p * n) * 1e6) / 1e6
