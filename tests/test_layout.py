"""Page-layout analysis kernel tests (synthetic pages with known
regions)."""

import numpy as np

from medical_and_charity_document_extraction_system_ray.kernels.layout import (
    analyze_layout,
)


def _page():
    img = np.full((200, 300), 255, dtype=np.uint8)
    # three text lines
    for y in (30, 60, 90):
        img[y : y + 8, 20:280] = 0
    # vertical separator rule
    img[120:190, 150:153] = 0
    # noise speckles (below 20 px area)
    img[150, 50] = 0
    img[160:162, 60:62] = 0
    return img


def test_layout_classifies_known_regions():
    lay = analyze_layout(_page())
    assert lay["n_text_lines"] >= 3
    assert lay["n_separators"] >= 1
    assert lay["n_noise"] >= 2
    types = {r["type"] for r in lay["regions"]}
    assert {"text_line", "separator", "noise"} <= types
    line = [r for r in lay["regions"] if r["type"] == "text_line"][0]
    assert line["top"] == 30 and line["height"] == 8
    assert line["left"] == 20 and line["width"] == 260
    sep = [r for r in lay["regions"] if r["type"] == "separator"][0]
    assert sep["width"] == 3 and sep["height"] == 70


def test_layout_empty_page():
    lay = analyze_layout(np.full((50, 50), 255, dtype=np.uint8))
    assert lay["regions"] == []
    assert lay["n_text_lines"] == 0
    assert lay["ink_ratio"] == 0.0


def test_layout_band_codec_page_has_lines():
    from medical_and_charity_document_extraction_system_ray.fixtures.media import (
        encode_text_image,
    )
    from medical_and_charity_document_extraction_system_ray.kernels.binarizer import (
        binarize,
    )

    img = encode_text_image("some page content here rendered")
    lay = analyze_layout(binarize(img))
    assert lay["n_text_lines"] >= 1
    assert lay["ink_ratio"] > 0
