"""Deterministic band-codec OCR engine.

The conformance engine for pytest span equality (FIXTURES.md §1:
"mock-OCR whose output is a pure function of the span").  It reads the
bit-band codec of :mod:`..fixtures.media` off a (raw or preprocessed)
page image, so its text output is exactly invertible while the Ray-side
actor-pool machinery is identical to a real engine's.

Output shape mirrors the easyocr engine's result
(``backend/app/core/ocr_engines/easyocr_engine.py:79-122``): per-word
ltwh bboxes, per-word confidence, ``confidence = round(mean, 2)``,
``block_num=0``, ``line_num=word_num=i``.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..fixtures.media import _HEADER_BYTES, BYTES_PER_ROW, CELL, MARGIN, decode_text_image
from .base import BaseOCREngine


class BandOCREngine(BaseOCREngine):
    engine_name = "band"

    def initialize(self) -> None:
        self._initialized = True

    def process_image(self, image: np.ndarray) -> dict[str, Any]:
        text = decode_text_image(image)
        conf = self._image_confidence(image)

        words: list[dict[str, Any]] = []
        byte_pos = _HEADER_BYTES  # header bytes precede the payload
        for i, w in enumerate(text.split()):
            nbytes = len(w.encode("utf-8"))
            row, col = divmod(byte_pos, BYTES_PER_ROW)
            width = min(nbytes, BYTES_PER_ROW - col) * 8 * CELL
            words.append(
                {
                    "text": w,
                    "confidence": conf,
                    "bbox": {
                        "left": int(MARGIN + col * 8 * CELL),
                        "top": int(MARGIN + row * CELL),
                        "width": int(width),
                        "height": int(CELL),
                    },
                    "block_num": 0,
                    "line_num": i,
                    "word_num": i,
                }
            )
            byte_pos += nbytes + 1  # +1 for the separating space

        avg = round(float(np.mean([w["confidence"] for w in words])), 2) if words else 0.0
        out = self.format_output(
            text,
            avg,
            words,
            model="band-codec",
            image_size=f"{image.shape[1]}x{image.shape[0]}",
        )
        # word_count semantics follow the easyocr engine: number of
        # recognized word boxes, not len(text.split()) of format_output
        out["word_count"] = len(words)
        return out

    @staticmethod
    def _image_confidence(image: np.ndarray) -> float:
        """Deterministic decode-margin confidence: mean |cell - 128| over
        the payload area, scaled to [0, 100]."""
        if image.ndim == 3:
            image = image.mean(axis=2)
        body = image[MARGIN:-MARGIN or None, MARGIN:-MARGIN or None].astype(np.float64)
        if body.size == 0:
            return 0.0
        margin = float(np.abs(body - 128.0).mean()) / 127.0 * 100.0
        return round(min(margin, 100.0), 2)
