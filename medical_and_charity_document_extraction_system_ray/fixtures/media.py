"""Deterministic media payloads for the fixture tables.

A ``media_ref`` of the form ``mem://{doc_id}/{offset}`` resolves to a
deterministically synthesized grayscale page image.  The image carries
its text content in a **bit-band codec**: the UTF-8 bytes of the text
are laid out as black/white cells, so a mock OCR engine can recover the
exact text as a pure function of the (possibly preprocessed) image.
This mirrors the reference's script-test recipe of rendering known text
onto an image and asserting it survives the pipeline
(``scripts/test_preprocessing.py:22-49`` renders known text + Gaussian
noise + known skew), while staying exactly invertible so pytest span
equality is byte-exact (FIXTURES.md §1).

Layout (grayscale uint8, white background, ``MARGIN`` px border):

- header: magic byte ``0xFF`` (a solid-black anchor cell row-start),
  2-byte big-endian payload length, 4-byte CRC32 of the payload;
- payload: UTF-8 bytes of the text;
- each byte is 8 cells (MSB first), each cell ``CELL`` x ``CELL`` px:
  bit 1 -> black (0), bit 0 -> white (255); ``BYTES_PER_ROW`` bytes
  per cell-row.

The decoder is tolerant of what the preprocessing chain (enhance ->
denoise -> deskew -> binarize, reference semantics) does to the page:
it locates the ink bounding box (translation/canvas changes), searches
small candidate de-rotations (the auto-deskew stage may apply a small
Hough-median rotation), and accepts the first grid whose CRC32
validates — so decoding is still a deterministic pure function of the
image.
"""

from __future__ import annotations

import zlib

import numpy as np

CELL = 4          # px per bit cell (3x3 center sampling + CRC keeps 4 px robust)
MARGIN = 12       # white margin px
BYTES_PER_ROW = 16
_MAGIC = 0xFF
_HEADER_BYTES = 7  # magic(1) + length(2) + crc32(4)

MEM_SCHEME = "mem://"

# candidate de-rotations tried by the decoder (degrees); auto-deskew
# rotations are Hough medians of integer-degree angles (multiples of
# 0.5) or projection-sweep multiples of 0.5 — 0.25 steps cover both
# plus interpolation slack.
_CANDIDATE_ANGLES = [0.0]
for _k in range(1, 33):
    _CANDIDATE_ANGLES += [0.25 * _k, -0.25 * _k]


def encode_text_image(
    text: str,
    *,
    noise_sigma: float = 0.0,
    skew_deg: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Render ``text`` into a band-codec grayscale image (H, W) uint8."""
    payload = text.encode("utf-8")
    if len(payload) > 0xFFFF:
        payload = payload[:0xFFFF]
    length = len(payload).to_bytes(2, "big")
    # CRC covers the length header too: an all-white misread (length 0,
    # crc 0) can then never validate, since crc32(b"\x00\x00") != 0
    data = (
        bytes([_MAGIC])
        + length
        + (zlib.crc32(length + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        + payload
    )
    n = len(data)
    rows = max(1, -(-n // BYTES_PER_ROW))
    h = rows * CELL + 2 * MARGIN
    w = BYTES_PER_ROW * 8 * CELL + 2 * MARGIN

    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    grid = np.zeros(rows * BYTES_PER_ROW * 8, dtype=np.uint8)
    grid[: bits.size] = bits
    grid = grid.reshape(rows, BYTES_PER_ROW * 8)

    cells = np.where(grid == 1, 0, 255).astype(np.uint8)
    body = np.kron(cells, np.ones((CELL, CELL), dtype=np.uint8))

    img = np.full((h, w), 255, dtype=np.uint8)
    img[MARGIN : MARGIN + body.shape[0], MARGIN : MARGIN + body.shape[1]] = body

    if skew_deg != 0.0:
        from ..kernels.ops import rotate_expand

        img = rotate_expand(img, skew_deg, border_value=255)

    if noise_sigma > 0.0:
        rng = np.random.default_rng(seed)
        noisy = img.astype(np.float64) + rng.normal(0.0, noise_sigma, img.shape)
        img = np.clip(noisy, 0, 255).astype(np.uint8)
    return img


def _rotate_gray(img: np.ndarray, angle_deg: float) -> np.ndarray:
    from ..kernels.ops import rotate_expand

    return rotate_expand(img, angle_deg, border_value=255)


def _open_mask(mask: np.ndarray) -> np.ndarray:
    """3x3 morphological opening: kills binarization speckles (<=2 px)
    while 6-px band cells survive; used for band *location* only."""
    m = np.pad(mask, 1, mode="constant")
    er = np.ones_like(m)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            er &= np.roll(np.roll(m, dy, 0), dx, 1)
    di = np.zeros_like(m)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            di |= np.roll(np.roll(er, dy, 0), dx, 1)
    return di[1:-1, 1:-1]


def _try_decode_grid(img: np.ndarray) -> str | None:
    """Decode assuming the band is axis-aligned in ``img``; CRC-check."""
    ink = _open_mask(img < 128)
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return None
    top, left = int(ys.min()), int(xs.min())
    rows = max(1, -(-(int(ys.max()) + 1 - top) // CELL))
    cols = BYTES_PER_ROW * 8

    # sample cell centers
    cy = top + (np.arange(rows) + 0.5) * CELL
    cx = left + (np.arange(cols) + 0.5) * CELL
    cyi = np.clip(cy.astype(int), 0, img.shape[0] - 1)
    cxi = np.clip(cx.astype(int), 0, img.shape[1] - 1)
    # 3x3 mean around each center for noise tolerance
    acc = np.zeros((rows, cols), dtype=np.float64)
    for dy in (-1, 0, 1):
        yy = np.clip(cyi + dy, 0, img.shape[0] - 1)
        for dx in (-1, 0, 1):
            xx = np.clip(cxi + dx, 0, img.shape[1] - 1)
            acc += img[yy[:, None], xx[None, :]]
    bits = (acc / 9.0 < 128).astype(np.uint8).reshape(-1)

    data = np.packbits(bits).tobytes()
    if len(data) < _HEADER_BYTES or data[0] != _MAGIC:
        return None
    n = int.from_bytes(data[1:3], "big")
    crc = int.from_bytes(data[3:7], "big")
    payload = data[_HEADER_BYTES : _HEADER_BYTES + n]
    if len(payload) != n or (zlib.crc32(data[1:3] + payload) & 0xFFFFFFFF) != crc:
        return None
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return None


def decode_text_image(img: np.ndarray) -> str:
    """Recover the text from a band-codec image (gray or binary).

    Deterministic: fixed candidate-angle order, first CRC-valid grid
    wins.  Raises ``ValueError`` when no candidate validates (the
    analog of an OCR failure — surfaces as an error row)."""
    if img.ndim == 3:
        img = img.mean(axis=2).astype(np.uint8)
    direct = _try_decode_grid(img)
    if direct is not None:
        return direct
    for angle in _CANDIDATE_ANGLES[1:]:
        got = _try_decode_grid(_rotate_gray(img, angle))
        if got is not None:
            return got
    raise ValueError("band decode failed: no CRC-valid grid found")


def parse_mem_ref(media_ref: str) -> tuple[str, int]:
    """``mem://{doc_id}/{offset}`` -> (doc_id, offset)."""
    if not media_ref.startswith(MEM_SCHEME):
        raise ValueError(f"not a mem:// media_ref: {media_ref!r}")
    body = media_ref[len(MEM_SCHEME) :]
    doc_id, _, off = body.rpartition("/")
    return doc_id, int(off)
