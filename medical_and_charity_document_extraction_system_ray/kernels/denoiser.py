"""Denoising kernels.

Same semantics as the reference's ``ImageDenoiser``
(``backend/app/core/image_processors/denoiser.py``): string dispatch
with ``auto`` picking by a Laplacian-variance noise estimate
(> 15 -> bilateral, > 8 -> median, else gaussian k=3 —
``denoiser.py:37-65``).  Pure-numpy implementations.
"""

from __future__ import annotations

import numpy as np

from .ops import dilate3, erode3, gaussian_blur, laplacian_variance, median3, to_gray


def denoise(image: np.ndarray, method: str = "auto") -> np.ndarray:
    if method == "gaussian":
        return gaussian_denoise(image)
    if method == "median":
        return median_denoise(image)
    if method == "bilateral":
        return bilateral_denoise(image)
    if method == "nlm":
        return nlm_denoise(image)
    if method == "morphology":
        return morphological_denoise(image)
    return _auto_denoise(image)


def estimate_noise(gray: np.ndarray) -> float:
    """Laplacian-variance noise proxy (denoiser.py:59-65)."""
    return laplacian_variance(gray)


def _auto_denoise(image: np.ndarray) -> np.ndarray:
    gray = to_gray(image)
    noise = estimate_noise(gray)
    if noise > 15:
        return bilateral_denoise(image)
    if noise > 8:
        return median_denoise(image)
    return gaussian_denoise(image, kernel_size=3)


def gaussian_denoise(
    image: np.ndarray, kernel_size: int = 5, sigma: float = 0
) -> np.ndarray:
    if kernel_size % 2 == 0:
        kernel_size += 1
    return gaussian_blur(image, kernel_size, sigma if sigma > 0 else None)


def median_denoise(image: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    if kernel_size % 2 == 0:
        kernel_size += 1
    # implemented as iterated 3x3 medians for k=5 (two passes approximate
    # a 5x5 median; exact 5x5 windows would need 25-plane stacking)
    out = median3(image)
    if kernel_size >= 5:
        out = median3(out)
    return out


def bilateral_denoise(
    image: np.ndarray, d: int = 9, sigma_color: float = 75, sigma_space: float = 75
) -> np.ndarray:
    """Bilateral filter: gaussian space weight x gaussian range weight,
    vectorized as a sum over the (d x d) shift lattice.

    Exploits the symmetry w(p, p+s) == w(p+s, p): only half the shifts
    compute a |diff| + LUT gather; each pair's weight is applied twice —
    once gather-style (center receives neighbor) and once scatter-style
    into a shifted view (neighbor receives center).  Working frame is
    the r-padded image over a 2r-padded source so the scatter stays
    border-exact; the border ring is cropped at the end.  Buffers are
    preallocated and reused across shifts (the loop is memory-bound)."""
    gray8 = to_gray(image)
    h, w = gray8.shape
    r = d // 2
    src2 = np.pad(gray8, 2 * r, mode="reflect")
    src16 = src2.astype(np.int16)
    srcf = src2.astype(np.float32)
    H1, W1 = h + 2 * r, w + 2 * r
    c16 = src16[r : r + H1, r : r + W1]
    cf = srcf[r : r + H1, r : r + W1]
    # range weights via a 256-entry LUT over |intensity diff| (exact for
    # uint8 inputs, ~4x cheaper than exp per pixel per shift)
    diffs = np.arange(256, dtype=np.float32)
    base_lut = np.exp(-(diffs**2) / np.float32(2.0 * sigma_color**2)).astype(np.float32)
    inv2_ss = 1.0 / (2.0 * sigma_space**2)
    num = cf.copy()  # the (0, 0) shift: weight exactly 1
    den = np.ones((H1, W1), dtype=np.float32)
    tmp = np.empty((H1, W1), dtype=np.float32)
    d16 = np.empty((H1, W1), dtype=np.int16)
    idx = np.empty((H1, W1), dtype=np.intp)
    wgt = np.empty((H1, W1), dtype=np.float32)
    for di in range(d):
        for dj in range(d):
            a, b = di - r, dj - r
            if (a, b) <= (0, 0):  # lexicographic upper half only
                continue
            sw = np.exp(-(a * a + b * b) * inv2_ss)
            lut = base_lut * np.float32(sw)  # space weight folded in
            n16 = src16[r + a : r + a + H1, r + b : r + b + W1]
            nf = srcf[r + a : r + a + H1, r + b : r + b + W1]
            np.subtract(n16, c16, out=d16)
            np.abs(d16, out=d16)
            # native-width indices + mode='clip' dodge numpy's slow
            # int16-index + bounds-checked take path (~2x on the gather,
            # which dominates this loop)
            np.copyto(idx, d16)
            np.take(lut, idx, out=wgt, mode="clip")
            np.multiply(wgt, nf, out=tmp)
            num += tmp
            den += wgt
            # mirrored shift: scatter the same weights into the +s view
            sr = slice(max(0, -a), H1 - max(0, a))
            dr = slice(max(0, a), H1 - max(0, -a))
            sc = slice(max(0, -b), W1 - max(0, b))
            dc = slice(max(0, b), W1 - max(0, -b))
            np.multiply(wgt[sr, sc], cf[sr, sc], out=tmp[dr, dc])
            num[dr, dc] += tmp[dr, dc]
            den[dr, dc] += wgt[sr, sc]
    out = num[r : r + h, r : r + w] / den[r : r + h, r : r + w]
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def nlm_denoise(
    image: np.ndarray,
    h: float = 10,
    template_size: int = 7,
    search_size: int = 21,
) -> np.ndarray:
    """Non-local means, shift-vectorized approximation: patch distances
    are gaussian-smoothed pointwise squared differences per shift (the
    standard fast-NLM construction).  The search window is capped at
    11x11 for tractability without cv2's SIMD path; only reachable via
    an explicit ``method="nlm"`` (never from ``auto``)."""
    gray = to_gray(image).astype(np.float64)
    search = min(search_size, 11)
    r = search // 2
    src = np.pad(gray, r, mode="reflect")
    hh, ww = gray.shape
    num = np.zeros((hh, ww), dtype=np.float64)
    den = np.zeros((hh, ww), dtype=np.float64)
    inv_h2 = 1.0 / (h * h)
    for di in range(search):
        for dj in range(search):
            shifted = src[di : di + hh, dj : dj + ww]
            d2 = gaussian_blur(
                np.clip((shifted - gray) ** 2 / 255.0, 0, 255).astype(np.uint8),
                template_size,
            ).astype(np.float64) * 255.0
            wgt = np.exp(-d2 * inv_h2)
            num += wgt * shifted
            den += wgt
    return np.clip(num / den + 0.5, 0, 255).astype(np.uint8)


def morphological_denoise(image: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """Open then close with a 3x3 rect element (denoiser.py:167-195)."""
    gray = to_gray(image)
    opened = dilate3(erode3(gray))
    return erode3(dilate3(opened)).astype(np.uint8)


def remove_salt_pepper(image: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    return median_denoise(image, kernel_size)


def adaptive_denoise(image: np.ndarray, block_size: int = 64) -> np.ndarray:
    """Blockwise auto-denoise: per 64-px block, estimate noise and apply
    the matching filter (denoiser.py:213-236)."""
    gray = to_gray(image)
    out = gray.copy()
    h, w = gray.shape
    for i in range(0, h, block_size):
        for j in range(0, w, block_size):
            block = gray[i : i + block_size, j : j + block_size]
            if block.size == 0:
                continue
            noise = estimate_noise(block)
            if noise > 15:
                fixed = bilateral_denoise(block, d=5, sigma_color=50, sigma_space=50)
            elif noise > 8:
                fixed = median_denoise(block, kernel_size=3)
            else:
                fixed = gaussian_blur(block, 3)
            out[i : i + block_size, j : j + block_size] = fixed
    return out
