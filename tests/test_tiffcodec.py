"""Baseline TIFF codec: encoder/decoder roundtrips across compressions
and the predictor, a real libtiff file cross-checked pixel-identical
against the same image decoded from PNG by the independent PNG codec,
and the resolver integration (.tif page on disk)."""

import os

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_ray.sources.imagecodec import (
    decode_image_bytes,
    png_decode,
)
from medical_and_charity_document_extraction_system_ray.sources.media_resolver import (
    MediaResolver,
)
from medical_and_charity_document_extraction_system_ray.sources.tiffcodec import (
    tiff_decode,
    tiff_encode,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_gray_and_rgb(comp, predictor):
    rng = np.random.default_rng(3)
    for img in (
        rng.integers(0, 256, (37, 53), dtype=np.uint8),
        rng.integers(0, 256, (21, 33, 3), dtype=np.uint8),
        (np.indices((40, 60)).sum(0) * 3 % 256).astype(np.uint8),
    ):
        out = tiff_decode(tiff_encode(img, compression=comp, predictor=predictor))
        np.testing.assert_array_equal(out, img)


def test_real_libtiff_file_identical_to_png():
    """python.tiff (written by a real TIFF encoder) must decode
    pixel-identical to python.png via the independent PNG codec —
    both are lossless encodings of the same image."""
    with open(os.path.join(DATA, "libtiff_rgba.tiff"), "rb") as f:
        t = tiff_decode(f.read())
    assert t.shape == (16, 16, 4)  # RGBA
    with open(os.path.join(DATA, "libjpeg_420_source.png"), "rb") as f:
        p = png_decode(f.read())
    np.testing.assert_array_equal(t[:, :, :3], p[:, :, :3])


def test_unsupported_variants_rejected():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(tiff_encode(img))
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_decode(b"XX" + bytes(data[2:]))
    # 16-bit flag: patch BitsPerSample short value (tag 258, inline)
    import struct
    pos = bytes(data).find(struct.pack("<HHI", 258, 3, 1))
    data[pos + 8 : pos + 10] = struct.pack("<H", 16)
    with pytest.raises(ValueError, match="bit depths"):
        tiff_decode(bytes(data))


def test_sniff_and_resolver(tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    data = tiff_encode(img, compression="lzw", predictor=True)
    np.testing.assert_array_equal(decode_image_bytes(data, ref="x.tif"), img)
    p = tmp_path / "page.tif"
    p.write_bytes(data)
    np.testing.assert_array_equal(MediaResolver().resolve(str(p)), img)
