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
