"""Import-gated adapters for real OCR libraries.

This container ships neither easyocr nor paddleocr, so these adapters
raise :class:`EngineUnavailableError` at ``initialize`` when the
library is absent — the actor-pool plumbing, result schema and
language handling are real and identical to the band engine's, which is
what conformance exercises.  (The reference's tesseract engine is
broken in-repo — undefined helpers, hard-coded Windows path,
``tesseract_engine.py:88,123,16`` — and rejected by its factory; we
keep only the engine-slot.)
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import BaseOCREngine, EngineUnavailableError, map_language_codes


class EasyOCRAdapter(BaseOCREngine):
    """easyocr.Reader adapter (easyocr_engine.py:20-122 semantics):
    bbox quads -> ltwh ints, confidence x100, line texts joined by " "."""

    engine_name = "easyocr"

    def __init__(self, language: str = "eng", gpu: bool = False):
        super().__init__(language)
        self.gpu = gpu
        self.reader = None

    def initialize(self) -> None:
        if self.reader is not None:
            return
        try:
            import easyocr  # noqa: F401
        except ImportError as e:
            raise EngineUnavailableError(
                "easyocr is not installed in this environment"
            ) from e
        import easyocr

        self.reader = easyocr.Reader(map_language_codes(self.language), gpu=self.gpu)
        self._initialized = True

    def process_image(self, image: np.ndarray) -> dict[str, Any]:
        self.initialize()
        results = self.reader.readtext(image)
        texts, words = [], []
        total_conf = 0.0
        for i, (bbox, text, conf) in enumerate(results):
            texts.append(text)
            (x1, y1), _, (x2, y2), _ = bbox
            words.append(
                {
                    "text": text,
                    "confidence": float(conf * 100),
                    "bbox": {
                        "left": int(x1),
                        "top": int(y1),
                        "width": int(x2 - x1),
                        "height": int(y2 - y1),
                    },
                    "block_num": 0,
                    "line_num": i,
                    "word_num": i,
                }
            )
            total_conf += conf * 100
        combined = " ".join(texts)
        avg = round(total_conf / len(words), 2) if words else 0.0
        out = self.format_output(combined, avg, words, gpu=self.gpu, model="easyocr")
        out["word_count"] = len(words)
        return out


class PaddleOCRAdapter(BaseOCREngine):
    """PaddleOCR adapter (paddle_engine.py:21-149 semantics):
    gray/RGBA -> BGR coercion, empty-result short-circuit to zero row."""

    engine_name = "paddle"

    def __init__(self, language: str = "eng"):
        super().__init__(language)
        self.ocr = None

    def initialize(self) -> None:
        if self.ocr is not None:
            return
        try:
            from paddleocr import PaddleOCR  # noqa: F401
        except ImportError as e:
            raise EngineUnavailableError(
                "paddleocr is not installed in this environment"
            ) from e
        from paddleocr import PaddleOCR

        lang = map_language_codes(self.language)[0]
        self.ocr = PaddleOCR(use_angle_cls=True, lang=lang, show_log=False)
        self._initialized = True

    def process_image(self, image: np.ndarray) -> dict[str, Any]:
        self.initialize()
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=2)
        elif image.shape[2] == 4:
            image = image[..., :3]
        raw = self.ocr.ocr(image, cls=True)
        if not raw or not raw[0]:
            out = self.format_output("", 0.0, [], model="paddleocr")
            out["word_count"] = 0
            return out
        texts, words = [], []
        total_conf = 0.0
        for i, (quad, (text, conf)) in enumerate(raw[0]):
            texts.append(text)
            xs = [p[0] for p in quad]
            ys = [p[1] for p in quad]
            words.append(
                {
                    "text": text,
                    "confidence": float(conf * 100),
                    "bbox": {
                        "left": int(min(xs)),
                        "top": int(min(ys)),
                        "width": int(max(xs) - min(xs)),
                        "height": int(max(ys) - min(ys)),
                    },
                    "block_num": 0,
                    "line_num": i,
                    "word_num": i,
                }
            )
            total_conf += conf * 100
        combined = " ".join(texts)
        avg = round(total_conf / len(words), 2) if words else 0.0
        out = self.format_output(combined, avg, words, model="paddleocr")
        out["word_count"] = len(words)
        return out
