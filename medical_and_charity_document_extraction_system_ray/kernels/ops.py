"""Shared numpy image primitives.

The reference implements its image kernels on OpenCV
(``backend/app/core/image_processors/*.py``); OpenCV is not available
in this environment, so the engine implements the same *semantics*
(dispatch thresholds, filter families, rotation behavior) on pure
numpy.  All functions take/return uint8 ndarrays, grayscale ``(H, W)``
or color ``(H, W, 3)``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "to_gray",
    "conv2d_3x3",
    "gaussian_blur",
    "box_mean",
    "box_std",
    "median3",
    "erode3",
    "dilate3",
    "laplacian_variance",
    "rotate_expand",
    "label_components",
]


def to_gray(img: np.ndarray) -> np.ndarray:
    """BGR -> grayscale with the standard ITU-R 601 weights (matches
    cv2.cvtColor(BGR2GRAY) to within rounding)."""
    if img.ndim == 2:
        return img
    b = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    r = img[..., 2].astype(np.float64)
    return np.clip(0.114 * b + 0.587 * g + 0.299 * r + 0.5, 0, 255).astype(np.uint8)


def _pad_reflect(img: np.ndarray, k: int) -> np.ndarray:
    return np.pad(img, k, mode="reflect")


def conv2d_3x3(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """3x3 convolution via 9 shifted adds (vectorized, no python loop
    over pixels). float64 out, caller clips."""
    src = _pad_reflect(img.astype(np.float64), 1)
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.float64)
    for di in range(3):
        for dj in range(3):
            out += kernel[di, dj] * src[di : di + h, dj : dj + w]
    return out


def _gaussian_kernel1d(ksize: int, sigma: float | None = None) -> np.ndarray:
    if sigma is None or sigma <= 0:
        # cv2's default sigma for getGaussianKernel
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def gaussian_blur(img: np.ndarray, ksize: int = 3, sigma: float | None = None) -> np.ndarray:
    """Separable Gaussian blur."""
    if img.ndim == 3:
        return np.stack(
            [gaussian_blur(img[..., c], ksize, sigma) for c in range(img.shape[2])],
            axis=2,
        )
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    src = _pad_reflect(img.astype(np.float64), r)
    tmp = np.zeros((img.shape[0], src.shape[1]), dtype=np.float64)
    for i, kv in enumerate(k):
        tmp += kv * src[i : i + img.shape[0], :]
    out = np.zeros(img.shape, dtype=np.float64)
    for j, kv in enumerate(k):
        out += kv * tmp[:, j : j + img.shape[1]]
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def _integral(img: np.ndarray) -> np.ndarray:
    ii = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.float64), axis=1, out=ii[1:, 1:])
    return ii


def box_mean(img: np.ndarray, ksize: int) -> np.ndarray:
    """Local mean over a ksize x ksize window (edge-replicated), O(1)
    per pixel via integral image.  float64 output."""
    r = ksize // 2
    src = np.pad(img.astype(np.float64), r, mode="edge")
    ii = _integral(src)
    h, w = img.shape
    s = (
        ii[ksize:, ksize:]
        - ii[:-ksize, ksize:]
        - ii[ksize:, :-ksize]
        + ii[:-ksize, :-ksize]
    )
    return s[:h, :w] / (ksize * ksize)


def box_std(img: np.ndarray, ksize: int) -> np.ndarray:
    """Local standard deviation over a ksize x ksize window."""
    m = box_mean(img, ksize)
    m2 = box_mean(img.astype(np.float64) ** 2, ksize)
    return np.sqrt(np.maximum(m2 - m**2, 0.0))


def _window3(img: np.ndarray) -> np.ndarray:
    """(H, W, 9) view of 3x3 neighborhoods (reflect-padded)."""
    src = _pad_reflect(img, 1)
    h, w = img.shape
    return np.stack(
        [src[di : di + h, dj : dj + w] for di in range(3) for dj in range(3)], axis=2
    )


def median3(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        return np.stack([median3(img[..., c]) for c in range(img.shape[2])], axis=2)
    return np.median(_window3(img), axis=2).astype(np.uint8)


def erode3(img: np.ndarray) -> np.ndarray:
    return _window3(img).min(axis=2)


def dilate3(img: np.ndarray) -> np.ndarray:
    return _window3(img).max(axis=2)


_LAPLACIAN = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float64)


def laplacian_variance(gray: np.ndarray) -> float:
    """Noise proxy used by the reference's auto-denoise
    (``denoiser.py:37-65``): variance of the Laplacian response."""
    return float(conv2d_3x3(gray, _LAPLACIAN).var())


def rotate_expand(
    img: np.ndarray, angle_deg: float, border_value: int = 255
) -> np.ndarray:
    """Rotate by ``angle_deg`` (counter-clockwise positive, like cv2's
    getRotationMatrix2D) with canvas expanded to fit and background
    filled white — the reference's ``rotate_image``
    (``deskewer.py:190-231``).  Bilinear sampling, inverse mapping."""
    if img.ndim == 3:
        return np.stack(
            [rotate_expand(img[..., c], angle_deg, border_value) for c in range(img.shape[2])],
            axis=2,
        )
    h, w = img.shape
    a = np.deg2rad(angle_deg)
    cos, sin = abs(np.cos(a)), abs(np.sin(a))
    nw = int(h * sin + w * cos + 0.5)
    nh = int(h * cos + w * sin + 0.5)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (nh - 1) / 2.0, (nw - 1) / 2.0

    # inverse rotation of destination coords back into source space;
    # float32 throughout (pixel coordinates fit with slack)
    ca, sa = np.float32(np.cos(a)), np.float32(np.sin(a))
    dx = (np.arange(nw, dtype=np.float32) - np.float32(ncx))[None, :]
    dy = (np.arange(nh, dtype=np.float32) - np.float32(ncy))[:, None]
    xs = dx * ca - dy * sa + np.float32(cx)
    ys = dx * sa + dy * ca + np.float32(cy)

    x0 = np.floor(xs).astype(np.int32)
    y0 = np.floor(ys).astype(np.int32)
    fx = xs - x0
    fy = ys - y0
    valid = (xs >= -1) & (xs <= w) & (ys >= -1) & (ys <= h)

    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)

    f = img.astype(np.float32)
    out = (
        f[y0c, x0c] * (1 - fx) * (1 - fy)
        + f[y0c, x1c] * fx * (1 - fy)
        + f[y1c, x0c] * (1 - fx) * fy
        + f[y1c, x1c] * fx * fy
    )
    out = np.where(valid, out, np.float32(border_value))
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def label_components(
    binary: np.ndarray, connectivity: int = 4
) -> tuple[np.ndarray, int]:
    """Connected-component labeling of a boolean mask (4- or 8-conn).

    Row-run based union-find (vectorized over runs, not pixels) — fast
    enough for the clean-binary / contour-deskew kernels.
    Returns (labels int32 array with 0 = background, num_labels).
    """
    diag = 1 if connectivity == 8 else 0
    h, w = binary.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    prev_runs: list[tuple[int, int, int]] = []  # (start, end, label)
    for y in range(h):
        row = binary[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.where(d == 1)[0] + 1)
        ends = list(np.where(d == -1)[0] + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(w)
        runs = []
        for s, e in zip(starts, ends):
            lbl = 0
            for ps, pe, pl in prev_runs:
                if ps < e + diag and s < pe + diag:  # run adjacency
                    if lbl == 0:
                        lbl = pl
                    else:
                        union(lbl, pl)
            if lbl == 0:
                parent.append(len(parent))
                lbl = len(parent) - 1
            labels[y, s:e] = lbl
            runs.append((s, e, lbl))
        prev_runs = runs

    # flatten label equivalences
    root = np.array([find(i) for i in range(len(parent))], dtype=np.int32)
    remap = np.zeros_like(root)
    nxt = 0
    for i in range(1, len(root)):
        if root[i] == i:
            nxt += 1
            remap[i] = nxt
    labels = remap[root[labels]]
    return labels, nxt
