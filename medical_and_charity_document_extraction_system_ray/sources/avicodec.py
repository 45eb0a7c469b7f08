"""Pure-python AVI (RIFF) video container codec.

Completes the multimodal decode matrix: image (PNG/BMP/JPEG/TIFF) and
audio (WAV) already decode for real; this module does the same for
video so frame-level operators (scene-change detection, frame
sampling, per-frame features) can run on real container bytes instead
of synthesized luma.  The reference has no video path at all (its
media surface is cv2 images, ``backend/app/utils/file_utils.py``) —
this is brief-driven: "image/audio/video as opaque binary columns with
typed metadata".

Supported streams (one 'vids' stream per file):

- ``DIB `` / BI_RGB, 8-bit with a grayscale palette — lossless gray
  frames (the value-oracle path: every byte survives the round trip).
- ``DIB `` / BI_RGB, 24-bit bottom-up BGR (the classic uncompressed
  AVI layout, 4-byte-aligned rows).
- ``MJPG`` — every frame is a baseline JPEG, decoded by the repo's own
  ``sources/jpegcodec.py``.

Encoder writes the standard layout: RIFF('AVI ') → LIST('hdrl')
[avih + LIST('strl')[strh + strf]] → LIST('movi')['00db'/'00dc'
chunks, even-padded] → 'idx1'.  Decoder is a tolerant RIFF walk: it
takes frame order from the movi list, ignores unknown chunks, accepts
missing idx1, and handles top-down (negative biHeight) frames.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["avi_encode", "avi_decode", "encode_luma_video"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """A RIFF chunk: fourcc + size + payload, padded to even length."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


_GRAY_PALETTE = b"".join(struct.pack("<BBBB", v, v, v, 0) for v in range(256))


def avi_encode(
    frames: np.ndarray,
    fps: int = 25,
    codec: str = "DIB ",
    quality: int = 90,
) -> bytes:
    """Encode ``frames`` as an AVI file.

    ``frames``: uint8 ``(n, h, w)`` grayscale or ``(n, h, w, 3)`` RGB.
    ``codec``: ``"DIB "`` (uncompressed; gray input → 8-bit palette
    stream, lossless; RGB input → 24-bit BGR) or ``"MJPG"`` (each frame
    a baseline JPEG at ``quality``).
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8 or frames.ndim not in (3, 4):
        raise ValueError("frames must be uint8 (n, h, w) or (n, h, w, 3)")
    n, h, w = frames.shape[:3]
    gray = frames.ndim == 3

    if codec == "MJPG":
        from .jpegcodec import jpeg_encode

        payloads = [jpeg_encode(f, quality=quality) for f in frames]
        bit_count, compression, palette = 24, b"MJPG", b""
        chunk_id = b"00dc"
    elif codec == "DIB ":
        payloads = []
        if gray:
            row_pad = (-w) % 4
            for f in frames:
                rows = f[::-1]  # bottom-up
                if row_pad:
                    rows = np.pad(rows, ((0, 0), (0, row_pad)))
                payloads.append(rows.tobytes())
            bit_count, palette = 8, _GRAY_PALETTE
        else:
            row_pad = (-(w * 3)) % 4
            for f in frames:
                bgr = f[::-1, :, ::-1]  # bottom-up, RGB→BGR
                flat = bgr.reshape(h, w * 3)
                if row_pad:
                    flat = np.pad(flat, ((0, 0), (0, row_pad)))
                payloads.append(flat.tobytes())
            bit_count, palette = 24, b""
        compression = struct.pack("<I", 0)  # BI_RGB
        chunk_id = b"00db"
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")

    size_image = max(len(p) for p in payloads)
    comp_u32 = (
        struct.unpack("<I", compression)[0]
        if isinstance(compression, bytes) and len(compression) == 4
        else 0
    )
    strf = struct.pack(
        "<IiihhIIiiII",
        40, w, h, 1, bit_count, comp_u32, size_image, 0, 0,
        256 if palette else 0, 0,
    ) + palette
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids",
        b"MJPG" if codec == "MJPG" else b"DIB ",
        0, 0, 0, 0,
        1, int(fps),          # dwScale / dwRate → fps = rate/scale
        0, n, size_image, 0xFFFFFFFF, 0,
        0, 0, w, h,           # rcFrame
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // int(fps), size_image * int(fps), 0,
        0x10,                 # AVIF_HASINDEX
        n, 0, 1, size_image, w, h, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the start of 'movi' (the list type
        # fourcc), pointing at the chunk id
        idx_entries.append((len(movi_body), len(p)))
        movi_body += _chunk(chunk_id, p)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"%s%s" % (chunk_id, struct.pack("<III", 0x10, off, size))
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF region
    (clamped to the buffer, so truncated files fall out of the walk
    instead of over-reading)."""
    i = start
    end = min(end, len(data))
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        if i + 8 + size > len(data):
            break  # truncated chunk: stop rather than over-read
        yield fourcc, i + 8, size
        i += 8 + size + (size % 2)


def avi_decode(data: bytes) -> tuple[np.ndarray, float]:
    """Decode an AVI file to ``(frames, fps)``.

    Frames come back uint8 ``(n, h, w)`` for 8-bit-palette DIB and
    grayscale MJPG, ``(n, h, w, 3)`` RGB for 24-bit DIB and color MJPG.
    Raises ``ValueError`` on anything that is not a one-video-stream
    AVI of a supported codec (callers turn that into an error row, the
    image-codec convention)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    width = height = bit_count = None
    compression = 0
    palette = None
    fps = 0.0
    frame_chunks: list[tuple[int, int]] = []

    def parse_strl(s: int, e: int) -> None:
        nonlocal width, height, bit_count, compression, palette, fps
        is_vids = False
        for cc, ps, sz in _walk_chunks(data, s, e):
            if cc == b"strh" and sz >= 56:
                fcc_type = data[ps : ps + 4]
                is_vids = fcc_type == b"vids"
                if is_vids:
                    scale, rate = struct.unpack_from("<II", data, ps + 20)
                    if scale:
                        fps = rate / scale
            elif cc == b"strf" and is_vids and sz >= 40:
                (
                    _bi_size, bw, bh, _planes, bc, comp, _sz_img,
                    _xp, _yp, clr_used, _clr_imp,
                ) = struct.unpack_from("<IiihhIIiiII", data, ps)
                width, height, bit_count, compression = bw, bh, bc, comp
                if bc == 8:
                    n_pal = clr_used or 256
                    pal = np.frombuffer(
                        data, np.uint8, count=n_pal * 4, offset=ps + 40
                    ).reshape(n_pal, 4)
                    palette = pal[:, :3][:, ::-1]  # BGRX → RGB

    def walk(s: int, e: int) -> None:
        nonlocal fps
        for cc, ps, sz in _walk_chunks(data, s, e):
            if cc == b"LIST":
                ltype = data[ps : ps + 4]
                if ltype in (b"hdrl", b"strl"):
                    if ltype == b"strl" and width is None:
                        parse_strl(ps + 4, ps + sz)
                    else:
                        walk(ps + 4, ps + sz)
                elif ltype == b"movi":
                    for fcc, fs, fsz in _walk_chunks(data, ps + 4, ps + sz):
                        if fcc in (b"00db", b"00dc") and fsz > 0:
                            frame_chunks.append((fs, fsz))
            elif cc == b"avih":
                if fps == 0.0 and sz >= 4:
                    (uspf,) = struct.unpack_from("<I", data, ps)
                    if uspf:
                        fps = 1_000_000 / uspf

    walk(12, end)
    if width is None or height is None:
        raise ValueError("AVI has no video stream header")
    if not frame_chunks:
        raise ValueError("AVI has no video frames")

    top_down = height < 0
    h, w = abs(height), width
    mjpg = compression in (0x47504A4D, 0x67706A6D)  # 'MJPG' / 'mjpg'

    if mjpg:
        from .jpegcodec import jpeg_decode

        decoded = [jpeg_decode(data[s : s + sz]) for s, sz in frame_chunks]
        frames = np.stack(decoded)
    elif compression == 0 and bit_count == 8:
        stride = w + ((-w) % 4)
        rows = []
        for s, sz in frame_chunks:
            if sz < stride * h:
                raise ValueError("truncated DIB frame")
            fr = np.frombuffer(data, np.uint8, count=stride * h, offset=s)
            fr = fr.reshape(h, stride)[:, :w]
            rows.append(fr if top_down else fr[::-1])
        frames = np.stack(rows)
        if palette is not None and not np.array_equal(
            palette, np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        ):
            frames = palette[frames]  # non-gray palette → RGB
    elif compression == 0 and bit_count == 24:
        stride = w * 3 + ((-(w * 3)) % 4)
        rows = []
        for s, sz in frame_chunks:
            if sz < stride * h:
                raise ValueError("truncated DIB frame")
            fr = np.frombuffer(data, np.uint8, count=stride * h, offset=s)
            fr = fr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
            rows.append(fr if top_down else fr[::-1])
        frames = np.stack(rows)
    else:
        raise ValueError(
            f"unsupported AVI codec (biCompression=0x{compression:08x}, "
            f"biBitCount={bit_count}); DIB 8/24-bit and MJPG are built in"
        )
    return frames, fps


def encode_luma_video(luma: np.ndarray, side: int = 8, fps: int = 24) -> bytes:
    """Fixture helper: one flat ``side``×``side`` gray frame per luma
    value — the deterministic video payload used by the value-oracled
    scene-change pipeline (lossless DIB, so the decoded luma is exactly
    the input)."""
    luma = np.asarray(luma, dtype=np.uint8)
    frames = np.broadcast_to(
        luma[:, None, None], (luma.size, side, side)
    ).copy()
    return avi_encode(frames, fps=fps, codec="DIB ")
