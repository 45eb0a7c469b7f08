"""Band-codec roundtrip: encode -> (preprocess) -> decode is exact."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_ray.fixtures.generate import (
    media_ground_truth,
    media_noise_sigma,
)
from medical_and_charity_document_extraction_system_ray.fixtures.media import (
    decode_text_image,
    encode_text_image,
    parse_mem_ref,
)
from medical_and_charity_document_extraction_system_ray.kernels.preprocess import (
    preprocess_image_array,
)

TEXTS = [
    "patient invoice ₹500 café hello world",
    "",
    "a",
    "नमस्ते señor São 東京 " * 5,
    "x" * 300,
    " leading and trailing \n",
]


@pytest.mark.parametrize("noise", [0.0, 8.0, 18.0])
def test_raw_roundtrip(noise):
    for t in TEXTS:
        img = encode_text_image(t, noise_sigma=noise, seed=3)
        assert decode_text_image(img) == t


def test_roundtrip_after_preprocess():
    for t in TEXTS:
        if not t.strip():
            continue  # near-empty bands under heavy noise may yield error rows
        for noise in (0.0, 8.0, 18.0):
            img = encode_text_image(t, noise_sigma=noise, seed=3)
            proc, _ = preprocess_image_array(img)
            assert decode_text_image(proc) == t


def test_roundtrip_with_known_skew():
    # the reference's own test recipe: known text + noise + known skew
    # (scripts/test_preprocessing.py:22-49)
    for skew in (2.0, 5.0, -3.5):
        img = encode_text_image("skewed page text", noise_sigma=5.0, skew_deg=skew, seed=1)
        assert decode_text_image(img) == "skewed page text"


def test_generator_corpus_decodes():
    for i in range(60):
        doc = f"doc-42-{i:08d}"
        t = media_ground_truth(doc, i % 5)
        img = encode_text_image(
            t, noise_sigma=media_noise_sigma(doc, i % 5), seed=(i % 5) + 1
        )
        proc, _ = preprocess_image_array(img)
        assert decode_text_image(proc) == t


def test_decode_garbage_raises():
    rng = np.random.default_rng(0)
    garbage = rng.integers(0, 256, size=(80, 200)).astype(np.uint8)
    with pytest.raises(ValueError):
        decode_text_image(garbage)


def test_parse_mem_ref():
    assert parse_mem_ref("mem://doc-42-00000007/13") == ("doc-42-00000007", 13)
    with pytest.raises(ValueError):
        parse_mem_ref("file:///x.png")


def test_phash64_perturbation_and_discrimination():
    """pHash invariants: identical image -> identical hash; a few
    flipped pixels -> small hamming; unrelated image -> large hamming."""
    import numpy as np
    from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
        _dct_matrix,
        phash64,
    )

    rng = np.random.default_rng(3)
    dct = _dct_matrix(32)
    img = (rng.integers(0, 256, size=(64, 96))).astype(np.uint8)
    h0 = phash64(img, dct)
    assert phash64(img.copy(), dct) == h0
    pert = img.copy()
    pert[5:8, 5:8] ^= 255  # tiny local change
    ham_near = bin(int(h0) ^ int(phash64(pert, dct))).count("1")
    other = (rng.integers(0, 256, size=(64, 96))).astype(np.uint8)
    ham_far = bin(int(h0) ^ int(phash64(other, dct))).count("1")
    assert ham_near <= 6
    assert ham_far > 12


def test_image_phash_neardup_planted(tmp_path):
    """Two docs with byte-identical media payloads surface as a
    hamming-0 pair; the check gate confirms every exact-dup pair is
    found."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
        q_image_phash_check,
        q_image_phash_neardup,
    )

    # doc_id % 3 == 0 docs get a media span at page 1 (chars 200..400)
    text = ("alpha " * 80).strip()  # 479 chars -> 3 pages, media at k=1
    rows = [
        {"doc_id": 0, "text": text},
        {"doc_id": 3, "text": text},                 # identical payload
        {"doc_id": 6, "text": ("omega " * 80).strip()},  # different payload
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    pairs = q_image_phash_neardup(str(tmp_path)).to_pandas()
    keys = set(zip(pairs["doc_a"], pairs["off_a"], pairs["doc_b"], pairs["off_b"]))
    assert ("doc-0", 1, "doc-3", 1) in keys
    assert (pairs["hamming"] == 0).all() or len(pairs) >= 1
    chk = q_image_phash_check(str(tmp_path)).to_pandas()
    assert bool(chk["exact_dups_found"][0])
    assert int(chk["n_exact_dup_pairs"][0]) >= 1
