"""AVI container codec: lossless DIB roundtrips, MJPG stream decode,
header metadata, tolerant-walk error paths, and the real-container
scene-change pipeline helper."""

import struct

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_ray.sources.avicodec import (
    avi_decode,
    avi_encode,
    encode_luma_video,
)


def test_gray_dib_roundtrip_exact_odd_width():
    rng = np.random.default_rng(1)
    fr = rng.integers(0, 256, size=(7, 9, 13), dtype=np.uint8)  # stride pad
    out, fps = avi_decode(avi_encode(fr, fps=24, codec="DIB "))
    assert out.dtype == np.uint8 and out.shape == fr.shape
    assert np.array_equal(out, fr)
    assert fps == 24.0


def test_rgb_dib_roundtrip_exact():
    rng = np.random.default_rng(2)
    fr = rng.integers(0, 256, size=(3, 6, 7, 3), dtype=np.uint8)
    out, fps = avi_decode(avi_encode(fr, fps=30, codec="DIB "))
    assert out.shape == fr.shape and np.array_equal(out, fr)
    assert fps == 30.0


def test_mjpg_stream_decodes_via_jpegcodec():
    g = np.tile(np.linspace(0, 255, 16, dtype=np.uint8), (4, 16, 1))
    data = avi_encode(g, fps=12, codec="MJPG", quality=95)
    assert b"MJPG" in data[:200]
    out, fps = avi_decode(data)
    assert out.shape == g.shape and fps == 12.0
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 4.0


def test_container_structure():
    fr = np.zeros((2, 4, 4), np.uint8)
    data = avi_encode(fr, fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert 8 + riff_size == len(data)  # declared size spans the file
    assert b"hdrl" in data and b"movi" in data and b"idx1" in data
    assert data.count(b"00db") == 2 + 2  # 2 movi chunks + 2 idx1 entries


def test_frame_order_preserved():
    fr = np.arange(6, dtype=np.uint8).reshape(6, 1, 1) * 40
    out, _ = avi_decode(avi_encode(fr))
    assert np.array_equal(out, fr)


def test_top_down_negative_height():
    fr = np.arange(16, dtype=np.uint8).reshape(1, 4, 4)
    data = bytearray(avi_encode(fr))
    # flip biHeight negative (strf payload: 'strf' + size + biSize,
    # biWidth, biHeight at offset +8+4+4) and invert the stored rows so
    # the decoded image is unchanged
    i = data.index(b"strf") + 8
    (h,) = struct.unpack_from("<i", data, i + 8)
    struct.pack_into("<i", data, i + 8, -h)
    j = data.index(b"00db") + 8
    stride = 4  # width 4, already aligned
    rows = [bytes(data[j + k * stride : j + (k + 1) * stride]) for k in range(4)]
    data[j : j + 4 * stride] = b"".join(reversed(rows))
    out, _ = avi_decode(bytes(data))
    assert np.array_equal(out, fr)


def test_color_palette_maps_to_rgb():
    fr = np.array([[[0, 1], [2, 3]]], np.uint8)
    data = bytearray(avi_encode(fr))
    # rewrite the first 4 grayscale palette entries (BGRX) to colors
    i = data.index(b"strf") + 8 + 40
    for k, bgr in enumerate([(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]):
        struct.pack_into("<BBBB", data, i + 4 * k, *bgr, 0)
    out, _ = avi_decode(bytes(data))
    assert out.shape == (1, 2, 2, 3)
    assert tuple(out[0, 0, 0]) == (3, 2, 1)  # palette BGR -> RGB
    assert tuple(out[0, 1, 1]) == (12, 11, 10)


def test_fps_fallback_from_avih():
    fr = np.zeros((1, 2, 2), np.uint8)
    data = bytearray(avi_encode(fr, fps=20))
    i = data.index(b"strh") + 8
    struct.pack_into("<II", data, i + 20, 0, 0)  # zero dwScale/dwRate
    _, fps = avi_decode(bytes(data))
    assert fps == pytest.approx(20.0)  # 1e6 / dwMicroSecPerFrame


def test_rejects_non_avi_and_truncation():
    fr = np.zeros((3, 5, 5), np.uint8)
    data = avi_encode(fr)
    for bad in (b"", b"RIFF\x04\x00\x00\x00WAVE", data[:40], data[:200]):
        with pytest.raises(ValueError):
            avi_decode(bad)


def test_rejects_unknown_codec():
    fr = np.zeros((1, 2, 2), np.uint8)
    data = bytearray(avi_encode(fr))
    i = data.index(b"strf") + 8
    struct.pack_into("<I", data, i + 16, 0x30385056)  # 'VP80'
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        avi_decode(bytes(data))
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        avi_encode(fr, codec="VP80")


def test_encode_luma_video_lossless():
    luma = np.array([0, 255, 17, 203, 203], np.uint8)
    frames, fps = avi_decode(encode_luma_video(luma, side=4, fps=24))
    assert frames.shape == (5, 4, 4)
    assert np.array_equal(frames[:, 0, 0], luma)
    assert (frames.reshape(5, -1).std(axis=1) == 0).all()
    assert fps == 24.0


def test_avi_scene_changes_matches_synth_pipeline(tmp_path, ray_session):
    """The real-container path must agree row-for-row with the pure
    synth detector (the DIB round trip is lossless)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
        q_avi_scene_changes,
        q_scene_changes,
    )

    texts = ["aZ09 zz", "", "x", "The quick brown fox! é中"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    key = ["doc_id", "frame_idx"]
    real = q_avi_scene_changes(str(tmp_path)).to_pandas().sort_values(key)
    synth = q_scene_changes(str(tmp_path)).to_pandas().sort_values(key)
    assert real.reset_index(drop=True).equals(synth.reset_index(drop=True))
    assert len(real) > 0
