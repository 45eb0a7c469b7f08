"""Pure-python baseline TIFF codec (TIFF 6.0, numpy + stdlib only).

Closes the LAST decode gap vs the reference's ``cv2.imread`` matrix
(``backend/app/utils/file_utils.py:129-173``): with PNG/BMP
(``imagecodec.py``), baseline JPEG (``jpegcodec.py``) and this module,
every format the reference's ALLOWED_EXTENSIONS lists has a built-in
decoder.

Decoder: 8-bit baseline TIFF — little/big endian, first IFD, chunky
planar config, strip-based; compressions none(1), LZW(5, with
horizontal-differencing predictor 2 and early-change), PackBits(32773);
photometric white-is-zero / black-is-zero / RGB / palette; 1-4 samples
per pixel (gray, gray+alpha, RGB, RGBA).  Tiled, planar, 16-bit and
old-style-JPEG TIFFs raise ``ValueError``.

Encoder (test-fixture generator): grayscale/RGB, compression none /
PackBits / LZW (+predictor), single strip.  Real-file cross-check: the
CPython test-suite ``python.tiff`` decodes pixel-identical to the same
image's PNG decoded by the independent PNG codec (both lossless).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i"}


def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, list[int]]:
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        voff = base + 8 if size <= 4 else struct.unpack_from(bo + "I", data, base + 8)[0]
        if typ in _TYPE_FMT:
            tags[tag] = list(struct.unpack_from(bo + str(cnt) + _TYPE_FMT[typ], data, voff))
        elif typ == 5:  # rational
            raw = struct.unpack_from(bo + str(2 * cnt) + "I", data, voff)
            tags[tag] = [raw[2 * j] // max(1, raw[2 * j + 1]) for j in range(cnt)]
        elif typ == 2:  # ascii — unused downstream
            tags[tag] = list(data[voff : voff + cnt])
    return tags


def _packbits_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n and len(out) < expected:
        c = src[i]
        i += 1
        if c < 128:
            out.extend(src[i : i + c + 1])
            i += c + 1
        elif c > 128:
            out.extend(src[i : i + 1] * (257 - c))
            i += 1
        # 128 = no-op
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first codes, Clear=256, EOI=257,
    early-change code-width bump."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(src)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out[:expected])
            acc = (acc << 8) | src[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        prev = entry
        # early change: width bumps when the NEXT code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected])


def tiff_decode(data: bytes) -> np.ndarray:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    if struct.unpack_from(bo + "H", data, 2)[0] != 42:
        raise ValueError("not a TIFF file (bad magic)")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    tags = _read_ifd(data, bo, ifd_off)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8-bit only)")
    comp = one(259, 1)
    photo = one(262)
    if one(284, 1) != 1:
        raise ValueError("planar TIFF not supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported")
    rows_per_strip = one(278, h)
    offsets = tags[273]
    counts = tags[279]
    predictor = one(317, 1)

    stride = w * spp
    raw = bytearray()
    remaining_rows = h
    for soff, scnt in zip(offsets, counts):
        nrows = min(rows_per_strip, remaining_rows)
        expected = nrows * stride
        chunk = bytes(data[soff : soff + scnt])
        if comp == 1:
            raw.extend(chunk[:expected])
        elif comp == 5:
            raw.extend(_lzw_decode(chunk, expected))
        elif comp == 32773:
            raw.extend(_packbits_decode(chunk, expected))
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        remaining_rows -= nrows
    arr = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * stride).reshape(h, stride)
    if predictor == 2:  # horizontal differencing: cumsum per sample lane
        arr = arr.copy()
        for c in range(spp):
            np.cumsum(arr[:, c::spp], axis=1, dtype=np.uint8, out=arr[:, c::spp])
    img = arr.reshape(h, w, spp)

    if photo == 3:  # palette
        if 320 not in tags:
            raise ValueError("palette TIFF missing ColorMap")
        cm = np.asarray(tags[320], dtype=np.int64)
        ncol = cm.size // 3
        pal = (cm.reshape(3, ncol).T >> 8).astype(np.uint8)  # 16-bit -> 8-bit
        img = pal[img[:, :, 0]]
    elif photo == 0:  # white-is-zero
        img = 255 - img
    elif photo not in (1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")

    if img.shape[2] == 1:
        return np.ascontiguousarray(img[:, :, 0])
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# encoder (test fixtures)
# ---------------------------------------------------------------------------

def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
        else:
            lit = i
            while (
                i < n
                and i - lit < 128
                and not (i + 1 < n and row[i + 1] == row[i] and i + 2 < n and row[i + 2] == row[i])
            ):
                i += 1
            out.append(i - lit - 1)
            out.extend(row[lit:i])
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for byte in src:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # early change: the decoder bumps when its table is one short
        if nxt + 1 > (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_encode(
    img: np.ndarray, compression: str = "none", predictor: bool = False
) -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) -> single-strip TIFF.
    ``compression``: none | packbits | lzw.  ``predictor`` applies
    horizontal differencing before LZW."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    flat = img.reshape(h, w * spp)
    if predictor:
        d = flat.astype(np.int16)
        for c in range(spp):
            lane = d[:, c::spp]
            lane[:, 1:] = lane[:, 1:] - lane[:, :-1]
        flat = (d & 0xFF).astype(np.uint8)
    payload = flat.tobytes()
    if compression == "none":
        comp_id, body = 1, payload
    elif compression == "packbits":
        comp_id = 32773
        body = b"".join(_packbits_encode(flat[y].tobytes()) for y in range(h))
    elif compression == "lzw":
        comp_id, body = 5, _lzw_encode(payload)
    else:
        raise ValueError(f"unknown compression {compression!r}")

    entries = []  # (tag, type, count, value)

    def add(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    bits_off_needed = spp > 2
    # layout: header(8) | IFD | [bits array] | strip
    n_entries = 9 + (1 if predictor else 0)
    ifd_size = 2 + 12 * n_entries + 4
    bits_off = 8 + ifd_size
    strip_off = bits_off + (2 * spp if bits_off_needed else 0)

    add(256, 3, 1, w)
    add(257, 3, 1, h)
    if bits_off_needed:
        add(258, 3, spp, bits_off)
    else:
        add(258, 3, 1, 8)
    add(259, 3, 1, comp_id)
    add(262, 3, 1, 1 if gray or spp == 1 else 2)  # black-is-zero / RGB
    add(273, 4, 1, strip_off)
    add(277, 3, 1, spp)
    add(278, 3, 1, h)
    add(279, 4, 1, len(body))
    if predictor:
        add(317, 3, 1, 2)
    entries.sort()

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out.extend(struct.pack("<H", len(entries)))
    for tag, typ, cnt, val in entries:
        out.extend(struct.pack("<HHI", tag, typ, cnt))
        if typ == 3 and cnt == 1:
            out.extend(struct.pack("<HH", val, 0))
        else:
            out.extend(struct.pack("<I", val))
    out.extend(struct.pack("<I", 0))  # next IFD
    if bits_off_needed:
        out.extend(struct.pack(f"<{spp}H", *([8] * spp)))
    assert len(out) == strip_off
    out.extend(body)
    return bytes(out)
