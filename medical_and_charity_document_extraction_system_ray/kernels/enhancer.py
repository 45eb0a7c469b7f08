"""Contrast-enhancement kernels.

Same semantics as the reference's ``ImageEnhancer``
(``backend/app/core/image_processors/enhancer.py``): string-dispatched
methods with an ``auto`` mode that picks by intensity statistics
(std < 40 -> CLAHE clip 3.0; mean < 100 -> gamma 1.5; mean > 180 ->
gamma 0.7; else CLAHE clip 2.0 — ``enhancer.py:35-66``).  Implemented
on pure numpy (no OpenCV in this environment); color inputs are
converted to grayscale first (the engine's media path is grayscale).
All functions are stateless and vectorized — used inside
``map_batches`` batch functions, one call per image.
"""

from __future__ import annotations

import numpy as np

from .ops import conv2d_3x3, to_gray

_SHARPEN_KERNEL = np.array(
    [[-1.0, -1.0, -1.0], [-1.0, 9.0, -1.0], [-1.0, -1.0, -1.0]]
)


def enhance(image: np.ndarray, method: str = "auto") -> np.ndarray:
    if method == "clahe":
        return apply_clahe(image)
    if method == "histogram":
        return histogram_equalization(image)
    if method == "sharpen":
        return sharpen(image)
    if method == "gamma":
        return gamma_correction(image)
    # "auto" and unknown methods fall back to auto (enhancer.py:31-33)
    return _auto_enhance(image)


def _auto_enhance(image: np.ndarray) -> np.ndarray:
    gray = to_gray(image)
    mean = float(np.mean(gray))
    std = float(np.std(gray))
    if std < 40:
        return apply_clahe(image)               # low contrast
    if mean < 100:
        return gamma_correction(image, gamma=1.5)  # dark
    if mean > 180:
        return gamma_correction(image, gamma=0.7)  # bright
    return apply_clahe(image, clip_limit=2.0)   # normal -> light CLAHE


def apply_clahe(
    image: np.ndarray,
    clip_limit: float = 3.0,
    tile_size: tuple[int, int] = (8, 8),
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization.

    Tile histograms with clip-redistribution, bilinear interpolation of
    the per-tile mapping functions (the standard CLAHE construction,
    matching cv2.createCLAHE behavior up to interpolation rounding).
    """
    gray = to_gray(image)
    h, w = gray.shape
    ny, nx = tile_size  # tile GRID counts, like cv2 tileGridSize
    th = max(1, -(-h // ny))
    tw = max(1, -(-w // nx))
    # pad so tiles cover the image exactly (cv2 pads with reflection)
    ph, pw = th * ny, tw * nx
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="reflect")

    clip = max(1, int(clip_limit * th * tw / 256))
    # per-tile clipped-equalization LUTs
    tiles = padded.reshape(ny, th, nx, tw).transpose(0, 2, 1, 3).reshape(ny, nx, -1)
    luts = np.empty((ny, nx, 256), dtype=np.float64)
    for i in range(ny):
        for j in range(nx):
            hist = np.bincount(tiles[i, j], minlength=256).astype(np.int64)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess // 256
            cdf = np.cumsum(hist)
            luts[i, j] = cdf * (255.0 / max(cdf[-1], 1))

    # bilinear interpolation between the four surrounding tile LUTs,
    # evaluated PER INTERPOLATION REGION (the run of pixels sharing the
    # same four tiles): four fast 1-D LUT takes per region instead of
    # full-image broadcasted 3-D fancy indexing (~3x)
    yy = (np.arange(ph) + 0.5) / th - 0.5
    xx = (np.arange(pw) + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(yy).astype(int), 0, ny - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, nx - 1)
    fy_all = np.clip(yy - y0, 0.0, 1.0)
    fx_all = np.clip(xx - x0, 0.0, 1.0)

    px = padded.astype(np.intp)
    out = np.empty((ph, pw), dtype=np.float64)
    ystarts = np.concatenate([[0], np.nonzero(np.diff(y0))[0] + 1, [ph]])
    xstarts = np.concatenate([[0], np.nonzero(np.diff(x0))[0] + 1, [pw]])
    for yi in range(len(ystarts) - 1):
        ys, ye = ystarts[yi], ystarts[yi + 1]
        ry0 = y0[ys]
        ry1 = min(ry0 + 1, ny - 1)
        fy = fy_all[ys:ye, None]
        for xi in range(len(xstarts) - 1):
            xs, xe = xstarts[xi], xstarts[xi + 1]
            rx0 = x0[xs]
            rx1 = min(rx0 + 1, nx - 1)
            fx = fx_all[None, xs:xe]
            sub = px[ys:ye, xs:xe]
            g00 = np.take(luts[ry0, rx0], sub, mode="clip")
            g01 = np.take(luts[ry0, rx1], sub, mode="clip")
            g10 = np.take(luts[ry1, rx0], sub, mode="clip")
            g11 = np.take(luts[ry1, rx1], sub, mode="clip")
            out[ys:ye, xs:xe] = (
                g00 * (1 - fy) * (1 - fx)
                + g01 * (1 - fy) * fx
                + g10 * fy * (1 - fx)
                + g11 * fy * fx
            )
    return np.clip(out[:h, :w] + 0.5, 0, 255).astype(np.uint8)


def histogram_equalization(image: np.ndarray) -> np.ndarray:
    """Global histogram equalization (enhancer.py:97-108)."""
    gray = to_gray(image)
    hist = np.bincount(gray.reshape(-1), minlength=256)
    cdf = np.cumsum(hist).astype(np.float64)
    nz = cdf[cdf > 0]
    if nz.size == 0:
        return gray
    cdf_min = nz[0]
    total = cdf[-1]
    lut = np.round((cdf - cdf_min) / max(total - cdf_min, 1) * 255.0)
    return np.clip(lut, 0, 255).astype(np.uint8)[gray]


def sharpen(image: np.ndarray, strength: float = 1.0) -> np.ndarray:
    """3x3 [-1..9..-1] sharpening kernel x strength (enhancer.py:110-125)."""
    gray = to_gray(image)
    out = conv2d_3x3(gray, _SHARPEN_KERNEL * strength)
    return np.clip(out, 0, 255).astype(np.uint8)


def gamma_correction(image: np.ndarray, gamma: float = 1.0) -> np.ndarray:
    """256-entry LUT gamma correction (enhancer.py:127-142)."""
    gray = to_gray(image)
    inv = 1.0 / gamma
    lut = (((np.arange(256) / 255.0) ** inv) * 255.0).astype(np.uint8)
    return lut[gray]


def adjust_brightness_contrast(
    image: np.ndarray, brightness: int = 0, contrast: int = 0
) -> np.ndarray:
    """Linear brightness/contrast (enhancer.py:144-168)."""
    img = to_gray(image).astype(np.float64)
    if brightness != 0:
        img = img + brightness
    if contrast != 0:
        factor = (259.0 * (contrast + 255.0)) / (255.0 * (259.0 - contrast))
        img = factor * (img - 128.0) + 128.0
    return np.clip(img, 0, 255).astype(np.uint8)


def enhance_for_text(image: np.ndarray) -> np.ndarray:
    """Gray -> CLAHE clip 2.0 -> half-strength sharpen (enhancer.py:170-187)."""
    gray = to_gray(image)
    out = apply_clahe(gray, clip_limit=2.0)
    return np.clip(conv2d_3x3(out, _SHARPEN_KERNEL * 0.5), 0, 255).astype(np.uint8)
