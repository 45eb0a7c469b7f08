"""Page-layout analysis: region segmentation + classification.

The north rule names "PDF layout parsing and page-region
classification" as part of main-content extraction; the reference has
no explicit layout stage (its OCR engines consume whole pages), so
these semantics are engine-defined and oracle-mirrored.

Given a binarized page (ink = dark), the analyzer produces typed
regions:

- ``text_line``   — horizontal bands of ink found by row-projection
  segmentation (the classic XY-cut first axis);
- ``separator``   — connected components with extreme aspect ratio
  (rules / table borders);
- ``noise``       — components below the area threshold (same 20 px
  constant the reference's clean_binary_image uses,
  ``binarizer.py:235-251``).

Pure numpy, deterministic; runs per page inside the same actor pool as
OCR.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .ops import label_components

NOISE_AREA = 20
SEPARATOR_ASPECT = 12.0
SEPARATOR_MAX_THICKNESS = 4  # px; thicker elongated blocks are body text
LINE_MIN_INK_ROWS = 2


def analyze_layout(binary: np.ndarray) -> dict[str, Any]:
    """Segment and classify regions of a binarized page.

    Returns ``{regions: [{type, left, top, width, height}...],
    n_text_lines, n_separators, n_noise, ink_ratio}``.
    """
    ink = binary < 128
    h, w = ink.shape
    regions: list[dict[str, Any]] = []

    # --- text lines: row-projection bands -----------------------------
    row_ink = ink.sum(axis=1)
    in_band = row_ink > 0
    d = np.diff(in_band.astype(np.int8))
    starts = list(np.where(d == 1)[0] + 1)
    ends = list(np.where(d == -1)[0] + 1)
    if in_band.size and in_band[0]:
        starts.insert(0, 0)
    if in_band.size and in_band[-1]:
        ends.append(h)
    n_text_lines = 0
    for s, e in zip(starts, ends):
        if e - s < LINE_MIN_INK_ROWS:
            continue
        cols = np.nonzero(ink[s:e].any(axis=0))[0]
        if cols.size == 0:
            continue
        regions.append(
            {
                "type": "text_line",
                "left": int(cols[0]),
                "top": int(s),
                "width": int(cols[-1] - cols[0] + 1),
                "height": int(e - s),
            }
        )
        n_text_lines += 1

    # --- component-level separators / noise ---------------------------
    labels, n = label_components(ink, connectivity=8)
    n_sep = n_noise = 0
    if n > 0:
        flat = labels.reshape(-1)
        areas = np.bincount(flat, minlength=n + 1)
        ys, xs = np.nonzero(labels)
        lab = labels[ys, xs]
        order = np.argsort(lab, kind="stable")
        lab_s, ys_s, xs_s = lab[order], ys[order], xs[order]
        bounds = np.searchsorted(lab_s, np.arange(1, n + 2))
        for c in range(1, n + 1):
            lo, hi = bounds[c - 1], bounds[c]
            if lo == hi:
                continue
            y0, y1 = int(ys_s[lo:hi].min()), int(ys_s[lo:hi].max())
            x0, x1 = int(xs_s[lo:hi].min()), int(xs_s[lo:hi].max())
            bw, bh = x1 - x0 + 1, y1 - y0 + 1
            aspect = max(bw, bh) / max(min(bw, bh), 1)
            if areas[c] < NOISE_AREA:
                rtype = "noise"
                n_noise += 1
            elif aspect >= SEPARATOR_ASPECT and min(bw, bh) <= SEPARATOR_MAX_THICKNESS:
                rtype = "separator"
                n_sep += 1
            else:
                continue  # body ink is covered by the text_line bands
            regions.append(
                {
                    "type": rtype,
                    "left": x0,
                    "top": y0,
                    "width": bw,
                    "height": bh,
                }
            )

    return {
        "regions": regions,
        "n_text_lines": n_text_lines,
        "n_separators": n_sep,
        "n_noise": n_noise,
        "ink_ratio": float(ink.mean()),
    }
