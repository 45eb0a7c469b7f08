"""Pure-python PNG/BMP codec: roundtrips across every PNG filter type,
palette and color variants, BMP orientations, and resolver + extraction
integration (a real .png file ref flowing through the OCR actor path)."""

import numpy as np
import pyarrow as pa
import pytest

from medical_and_charity_document_extraction_system_ray.sources.imagecodec import (
    bmp_decode,
    bmp_encode,
    decode_image_bytes,
    png_decode,
    png_encode,
)
from medical_and_charity_document_extraction_system_ray.sources.media_resolver import (
    MediaResolver,
)


@pytest.fixture(scope="module")
def gray():
    rng = np.random.default_rng(4)
    return rng.integers(0, 256, (37, 53), dtype=np.uint8)


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_gray_roundtrip_all_filters(gray, filter_type):
    data = png_encode(gray, filter_type=filter_type)
    out = png_decode(data)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, gray)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_rgb_roundtrip_all_filters(rgb, filter_type):
    out = png_decode(png_encode(rgb, filter_type=filter_type))
    np.testing.assert_array_equal(out, rgb)


def test_png_mixed_filters_per_row(gray):
    ftypes = np.arange(gray.shape[0], dtype=np.uint8) % 5
    out = png_decode(png_encode(gray, filter_type=ftypes))
    np.testing.assert_array_equal(out, gray)


def test_png_rgba_and_gray_alpha_roundtrip():
    rng = np.random.default_rng(6)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(rgba)), rgba)
    ga = rng.integers(0, 256, (9, 11, 2), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(ga)), ga)


def test_bmp_roundtrip(gray, rgb):
    out = bmp_decode(bmp_encode(gray))
    np.testing.assert_array_equal(out, gray)  # grey 24-bit collapses to 2-D
    np.testing.assert_array_equal(bmp_decode(bmp_encode(rgb)), rgb)


def test_bmp_8bit_palette_decode():
    # hand-build an 8-bit grey-palette BMP, bottom-up, padded rows
    import struct

    img = np.arange(20, dtype=np.uint8).reshape(4, 5) * 10
    w, h = 5, 4
    row_size = (w + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w] = img[::-1]
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    pix = rows.tobytes()
    off = 14 + 40 + len(pal)
    data = (
        struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 0, 0, 256, 0)
        + pal
        + pix
    )
    np.testing.assert_array_equal(bmp_decode(data), img)


def test_decode_sniffs_format(gray):
    np.testing.assert_array_equal(decode_image_bytes(png_encode(gray)), gray)
    np.testing.assert_array_equal(decode_image_bytes(bmp_encode(gray)), gray)
    with pytest.raises(NotImplementedError):
        decode_image_bytes(b"GIF89a gif-ish", ref="x.gif")


def test_resolver_decodes_png_and_bmp_files(tmp_path, gray):
    r = MediaResolver()
    p = tmp_path / "page.png"
    p.write_bytes(png_encode(gray))
    np.testing.assert_array_equal(r.resolve(str(p)), gray)
    np.testing.assert_array_equal(r.resolve("file://" + str(p)), gray)
    b = tmp_path / "page.bmp"
    b.write_bytes(bmp_encode(gray))
    np.testing.assert_array_equal(r.resolve(str(b)), gray)
    with pytest.raises(NotImplementedError):
        r.resolve(str(tmp_path / "page.gif"))


def test_png_media_ref_through_extraction(tmp_path):
    """A real on-disk PNG page flows through the full OCR actor path and
    decodes to the planted text (band codec page saved as PNG)."""
    import ray.data

    from medical_and_charity_document_extraction_system_ray.fixtures.media import (
        encode_text_image,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines import (
        extract_documents,
    )

    text = "png codec integration page"
    img = encode_text_image(text)
    p = tmp_path / "page0.png"
    p.write_bytes(png_encode(img))
    docs = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "spans": pa.array(
                [
                    [
                        {"offset": 0, "kind": "media", "text": "",
                         "media_ref": str(p)}
                    ]
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    out = extract_documents(ds, ocr_concurrency=1, repartition_blocks=0).to_pandas()
    assert len(out) == 1
    assert out["processing_method"].iloc[0] == "ocr_pipeline"
    assert text in out["text"].iloc[0]
