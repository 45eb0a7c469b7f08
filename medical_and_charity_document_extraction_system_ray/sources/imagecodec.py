"""Pure-python PNG / BMP codec (stdlib ``zlib`` + ``struct`` only).

Closes the real-image-decode gap left by the container shipping no
imaging library (the reference decodes with ``cv2.imread`` + a PIL
fallback, ``backend/app/utils/file_utils.py:129-173``): PNG and BMP are
implemented exactly here; baseline JPEG lives in ``jpegcodec.py``
(sniffed via ``decode_image_bytes``); TIFF stays behind the
``NotImplementedError`` stub (an LZW/tag-soup decoder is out of scope).

Supported:

- PNG decode: 8-bit greyscale / grey+alpha / RGB / RGBA / palette,
  non-interlaced, all five scanline filters.  Sub/Up/None unfilter
  vectorized (cumsum-by-residue-class for Sub); Average/Paeth fall back
  to a per-row loop (our encoder never emits them, external files may).
- PNG encode: 8-bit greyscale or RGB, per-row filter selectable
  (default 0/None) — also used by tests to exercise every unfilter path.
- BMP decode: 8-bit palette (grey) and 24-bit BGR, bottom-up or
  top-down, 4-byte row padding.
- BMP encode: 24-bit BGR.

Returns ``uint8`` arrays shaped (h, w) for greyscale or (h, w, c).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type -> samples/px


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * nch
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.uint8)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = nch  # bytes per pixel at bit depth 8
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        cur = rows[y].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: cumulative sum within each residue class mod bpp
            for c in range(bpp):
                np.cumsum(cur[c::bpp], dtype=np.uint8, out=cur[c::bpp])
        elif f == 2:  # Up
            cur += prev
        elif f == 3:  # Average (left-sequential)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (left-sequential)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[out.reshape(height, width)]
        # collapse a grey palette to 2-D
        if (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all():
            return np.ascontiguousarray(img[..., 0])
        return img
    img = out.reshape(height, width, nch)
    return np.ascontiguousarray(img[:, :, 0]) if nch == 1 else img


def png_encode(
    img: np.ndarray, filter_type: int | np.ndarray = 0, compress_level: int = 6
) -> bytes:
    """Encode uint8 greyscale (h, w) or RGB/RGBA (h, w, c) as PNG.
    ``filter_type`` may be a scalar or per-row array (tests use this to
    exercise every unfilter path)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, nch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        nch = img.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[nch]
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    stride = w * nch
    ftypes = np.broadcast_to(np.asarray(filter_type, dtype=np.uint8), (h,))
    bpp = nch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y].reshape(-1)
        f = int(ftypes[y])
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            enc = cur - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        elif f == 4:
            enc = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (int(cur[i]) - _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        lines.append(f)
        lines.extend(enc.tobytes())
        prev = cur
    payload = zlib.compress(bytes(lines), compress_level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (pix_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError("compressed BMP not supported")
    top_down = height < 0
    height = abs(height)
    row_size = (width * bpp // 8 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_size * height, offset=pix_offset
    ).reshape(height, row_size)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        (colors_used,) = struct.unpack("<I", data[46:50])
        n_colors = colors_used or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        img = pal[rows[:, :width]]
        if (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all():
            return np.ascontiguousarray(img[..., 0])
        return np.ascontiguousarray(img)
    if bpp == 24:
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        img = bgr[:, :, ::-1]  # -> RGB
        if (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all():
            return np.ascontiguousarray(img[..., 0])
        return np.ascontiguousarray(img)
    raise ValueError(f"unsupported BMP bit depth {bpp}")


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode uint8 greyscale (h, w) or RGB (h, w, 3) as 24-bit BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + pix


def decode_image_bytes(data: bytes, ref: str = "") -> np.ndarray:
    """Sniff-and-decode: PNG, BMP, baseline JPEG or baseline TIFF by
    magic bytes — the full reference ALLOWED_EXTENSIONS matrix."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:2] == b"\xff\xd8":
        from .jpegcodec import jpeg_decode

        return jpeg_decode(data)
    if data[:2] in (b"II", b"MM"):
        from .tiffcodec import tiff_decode

        return tiff_decode(data)
    raise NotImplementedError(
        f"no decoder for media {ref!r}: PNG, BMP, baseline JPEG and "
        "baseline TIFF have pure-python decoders here; anything else "
        "needs an imaging library not present in this environment"
    )
