"""Skew detection / correction kernels.

Same semantics as the reference's ``ImageDeskewer``
(``backend/app/core/image_processors/deskewer.py``): ``auto`` tries
Hough first (accepted if |angle| < 45), falls back to projection-sweep,
else returns the image unrotated with angle 0.0
(``deskewer.py:38-61``).  ``rotate_image`` expands the canvas and fills
the background white, and is a no-op for |angle| < 0.1°
(``deskewer.py:190-231``).  Pure-numpy implementations: the Hough
accumulator is a vectorized (theta, rho) histogram over
gradient-magnitude edge points; the projection sweep runs on an image
downscaled to <=256 px height (deterministic speed optimization — the
reference sweeps 181 full-resolution rotations).
"""

from __future__ import annotations

import numpy as np

from .binarizer import otsu_threshold
from .ops import label_components, rotate_expand, to_gray


def deskew(image: np.ndarray, method: str = "auto") -> tuple[np.ndarray, float]:
    if method == "hough":
        angle = detect_skew_hough(image)
    elif method == "projection":
        angle = detect_skew_projection(image)
    elif method == "contour":
        angle = detect_skew_contour(image)
    else:
        return _auto_deskew(image)
    return rotate_image(image, angle), angle


def _auto_deskew(image: np.ndarray) -> tuple[np.ndarray, float]:
    try:
        angle = detect_skew_hough(image)
        if abs(angle) < 45:
            return rotate_image(image, angle), angle
    except Exception:
        pass
    try:
        angle = detect_skew_projection(image)
        return rotate_image(image, angle), angle
    except Exception:
        pass
    return image, 0.0


def _edge_points(gray: np.ndarray, mag_thresh: float = 100.0) -> tuple[np.ndarray, np.ndarray]:
    """Sobel gradient magnitude threshold (stand-in for cv2.Canny(50,150);
    no hysteresis/NMS — only line *angles* are consumed downstream)."""
    g = gray.astype(np.float32)
    gx = np.zeros_like(g)
    gy = np.zeros_like(g)
    gx[:, 1:-1] = g[:, 2:] - g[:, :-2]
    gy[1:-1, :] = g[2:, :] - g[:-2, :]
    # compare squared magnitude (avoids the sqrt of hypot)
    ys, xs = np.nonzero(gx * gx + gy * gy > np.float32(mag_thresh * mag_thresh))
    return ys, xs


def detect_skew_hough(image: np.ndarray, angle_range: float = 45.0) -> float:
    """Standard (rho, theta) Hough over edge points; vote threshold 100
    like cv2.HoughLines(edges, 1, pi/180, 100); line angle = theta - 90°;
    median of angles within ±angle_range (deskewer.py:63-102)."""
    gray = to_gray(image)
    ys, xs = _edge_points(gray)
    if ys.size == 0:
        return 0.0
    cap = 10_000
    if ys.size > cap:  # deterministic subsample keeps the accumulator cheap
        step = ys.size // cap + 1
        ys, xs = ys[::step], xs[::step]
        vote_scale = step  # keep the effective vote threshold comparable
    else:
        vote_scale = 1

    # only thetas with |theta - 90| < angle_range can survive the final
    # filter, so the accumulator never needs the other half of the
    # theta axis — ~2x less work, bit-identical result
    t_lo = max(0, int(np.floor(90.0 - angle_range)) + 1)
    t_hi = min(180, int(np.ceil(90.0 + angle_range)))  # exclusive
    n_t = t_hi - t_lo
    thetas = np.deg2rad(np.arange(t_lo, t_hi, dtype=np.float32))
    diag = int(np.ceil(np.hypot(*gray.shape)))
    cos_t = np.cos(thetas)
    sin_t = np.sin(thetas)
    # rho = x cosθ + y sinθ ∈ [-diag, diag]; +0.5 then truncate == round
    # half-up (values are >= 0 after the +diag shift)
    rho = (
        xs[:, None].astype(np.float32) * cos_t[None, :]
        + ys[:, None].astype(np.float32) * sin_t[None, :]
        + np.float32(diag)
        + np.float32(0.5)
    ).astype(np.int32)  # int32: float32->int64 casts hit a slow numpy path
    nbins = 2 * diag + 1
    flat = (
        np.broadcast_to(np.arange(n_t, dtype=np.int32)[None, :], rho.shape) * nbins
        + rho
    ).reshape(-1)
    acc = np.bincount(flat, minlength=n_t * nbins).reshape(n_t, nbins)

    t_idx, _ = np.nonzero(acc >= max(1, 100 // vote_scale))
    if t_idx.size == 0:
        return 0.0
    angles = (t_idx + t_lo).astype(np.float64) - 90.0
    angles = angles[np.abs(angles) < angle_range]
    if angles.size == 0:
        return 0.0
    return float(np.median(angles))


def detect_skew_projection(
    image: np.ndarray, angle_range: float = 45.0, angle_step: float = 0.5
) -> float:
    """Otsu-inverse binarize, sweep rotations maximizing row-projection
    variance (deskewer.py:104-146).  Runs on a <=256-px-tall downscale."""
    gray = to_gray(image)
    if gray.shape[0] > 256:
        step = -(-gray.shape[0] // 256)
        gray = gray[::step, ::step]
    t = otsu_threshold(gray)
    binary = np.where(gray > t, 0, 255).astype(np.uint8)  # THRESH_BINARY_INV

    best_angle, max_var = 0.0, 0.0
    for angle in np.arange(-angle_range, angle_range, angle_step):
        rotated = rotate_image(binary, float(angle), background=0)
        var = float(np.var(rotated.sum(axis=1, dtype=np.int64)))
        if var > max_var:
            max_var = var
            best_angle = float(angle)
    return best_angle


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; points (N, 2) as (x, y)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def detect_skew_contour(image: np.ndarray) -> float:
    """Min-area rect of the largest connected component of the
    Otsu-inverse image; cv2-style angle normalization then negated
    (deskewer.py:148-188)."""
    gray = to_gray(image)
    t = otsu_threshold(gray)
    binary = gray <= t  # ink mask (THRESH_BINARY_INV)
    labels, n = label_components(binary, connectivity=8)
    if n == 0:
        return 0.0
    areas = np.bincount(labels.reshape(-1))
    areas[0] = 0
    biggest = int(areas.argmax())
    ys, xs = np.nonzero(labels == biggest)
    hull = _convex_hull(np.stack([xs, ys], axis=1).astype(np.float64))
    if len(hull) < 3:
        return 0.0

    # rotating calipers: minimal-area enclosing rectangle
    best_area, best_angle = np.inf, 0.0
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    for ex, ey in edges:
        norm = np.hypot(ex, ey)
        if norm == 0:
            continue
        ux, uy = ex / norm, ey / norm
        proj_u = hull[:, 0] * ux + hull[:, 1] * uy
        proj_v = -hull[:, 0] * uy + hull[:, 1] * ux
        area = (proj_u.max() - proj_u.min()) * (proj_v.max() - proj_v.min())
        if area < best_area:
            best_area = area
            best_angle = float(np.rad2deg(np.arctan2(ey, ex)))

    angle = best_angle % 90.0  # cv2 4.x minAreaRect angle convention (0, 90]
    if angle < -45:
        angle = 90 + angle
    elif angle > 45:
        angle = angle - 90
    return -angle


def rotate_image(
    image: np.ndarray, angle: float, background: int = 255
) -> np.ndarray:
    """Expand-canvas rotation, white background, no-op for |angle|<0.1°."""
    if abs(angle) < 0.1:
        return image
    return rotate_expand(image, angle, border_value=background)


def check_if_skewed(image: np.ndarray, threshold: float = 2.0) -> bool:
    return abs(detect_skew_hough(image)) > threshold
