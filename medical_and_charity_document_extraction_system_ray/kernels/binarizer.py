"""Binarization kernels.

Same semantics as the reference's ``ImageBinarizer``
(``backend/app/core/image_processors/binarizer.py``): gray-convert,
then string dispatch with ``auto`` picking by contrast
(std > 50 -> Otsu; std < 30 -> adaptive; else Sauvola —
``binarizer.py:43-62``).  Pure-numpy implementations; local-stat
methods use O(1)-per-pixel integral-image box filters.
"""

from __future__ import annotations

import numpy as np

from .ops import box_mean, box_std, gaussian_blur, label_components, to_gray


def binarize(image: np.ndarray, method: str = "auto") -> np.ndarray:
    gray = to_gray(image)
    if method == "otsu":
        return otsu_binarize(gray)
    if method == "adaptive":
        return adaptive_binarize(gray)
    if method == "sauvola":
        return sauvola_binarize(gray)
    if method == "niblack":
        return niblack_binarize(gray)
    if method == "triangle":
        return triangle_binarize(gray)
    return _auto_binarize(gray)


def _auto_binarize(gray: np.ndarray) -> np.ndarray:
    std = float(np.std(gray))
    if std > 50:
        return otsu_binarize(gray)      # high contrast
    if std < 30:
        return adaptive_binarize(gray)  # low contrast
    return sauvola_binarize(gray)       # medium contrast


def otsu_threshold(gray: np.ndarray) -> float:
    """Otsu's threshold by maximizing inter-class variance."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0.0
    w0 = np.cumsum(hist)
    w1 = total - w0
    cum_mean = np.cumsum(hist * np.arange(256))
    mu0 = np.divide(cum_mean, w0, out=np.zeros(256), where=w0 > 0)
    mu1 = np.divide(cum_mean[-1] - cum_mean, w1, out=np.zeros(256), where=w1 > 0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return float(np.argmax(between))


def otsu_binarize(gray: np.ndarray, invert: bool = False) -> np.ndarray:
    t = otsu_threshold(gray)
    binary = np.where(gray > t, 255, 0).astype(np.uint8)
    return (255 - binary) if invert else binary


def adaptive_binarize(
    gray: np.ndarray, block_size: int = 11, c: int = 2, method: str = "gaussian"
) -> np.ndarray:
    """Local-threshold binarization: pixel > (local mean - c) -> 255.
    ``gaussian`` weighs the window like cv2.ADAPTIVE_THRESH_GAUSSIAN_C."""
    if block_size % 2 == 0:
        block_size += 1
    if method == "gaussian":
        local = gaussian_blur(gray, block_size).astype(np.float64)
    else:
        local = box_mean(gray, block_size)
    return np.where(gray.astype(np.float64) > local - c, 255, 0).astype(np.uint8)


def sauvola_binarize(
    gray: np.ndarray, window_size: int = 15, k: float = 0.2, r: float = 128.0
) -> np.ndarray:
    """Sauvola local threshold T = m(1 + k((s/r) - 1)) (binarizer.py:118-155)."""
    if window_size % 2 == 0:
        window_size += 1
    mean = box_mean(gray, window_size)
    std = box_std(gray, window_size)
    threshold = mean * (1.0 + k * ((std / r) - 1.0))
    return np.where(gray.astype(np.float64) > threshold, 255, 0).astype(np.uint8)


def niblack_binarize(
    gray: np.ndarray, window_size: int = 15, k: float = -0.2
) -> np.ndarray:
    """Niblack local threshold T = m + k*s (binarizer.py:157-186)."""
    if window_size % 2 == 0:
        window_size += 1
    threshold = box_mean(gray, window_size) + k * box_std(gray, window_size)
    return np.where(gray.astype(np.float64) > threshold, 255, 0).astype(np.uint8)


def triangle_threshold(gray: np.ndarray) -> float:
    """Triangle algorithm: max distance from the histogram to the line
    from the peak to the far tail."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    peak = int(np.argmax(hist))
    nz = np.nonzero(hist)[0]
    if nz.size == 0:
        return 0.0
    lo, hi = int(nz[0]), int(nz[-1])
    # use the longer tail side (cv2 flips so the tail is to the right)
    if peak - lo > hi - peak:
        tail = lo
        idx = np.arange(tail, peak + 1)
    else:
        tail = hi
        idx = np.arange(peak, tail + 1)
    if idx.size <= 1:
        return float(peak)
    x1, y1 = float(peak), float(hist[peak])
    x2, y2 = float(tail), float(hist[tail])
    d = np.abs((y2 - y1) * idx - (x2 - x1) * hist[idx] + x2 * y1 - y2 * x1)
    return float(idx[int(np.argmax(d))])


def triangle_binarize(gray: np.ndarray) -> np.ndarray:
    t = triangle_threshold(gray)
    return np.where(gray > t, 255, 0).astype(np.uint8)


def multi_scale_binarize(
    gray: np.ndarray, scales: tuple[int, ...] = (11, 21, 31)
) -> np.ndarray:
    """Pixelwise median of adaptive binarizations at several block sizes
    (binarizer.py:215-233)."""
    results = [adaptive_binarize(gray, block_size=s) for s in scales]
    return np.median(np.stack(results, axis=0), axis=0).astype(np.uint8)


def clean_binary_image(binary: np.ndarray, remove_small_objects: int = 20) -> np.ndarray:
    """Drop 8-connected components smaller than ``remove_small_objects``
    pixels (binarizer.py:235-251)."""
    mask = binary > 0
    labels, n = label_components(mask, connectivity=8)
    if n == 0:
        return np.zeros_like(binary)
    areas = np.bincount(labels.reshape(-1))
    keep = areas >= remove_small_objects
    keep[0] = False
    return np.where(keep[labels], 255, 0).astype(np.uint8)
