"""OCR engine contract.

Mirrors the reference's ABC (``backend/app/core/ocr_engines/base_engine.py:11-69``):
``initialize`` / ``process_image`` / ``format_output`` / language
helpers — minus the async veneer (the reference's ``async`` methods
never await real concurrency; in the engine, concurrency comes from the
Ray actor pool, so engines are plain synchronous classes).

An engine instance is the *warm state* of a stateful Ray Data stage:
constructed once per actor in the actor's ``__init__`` and reused for
every batch (the reference instead keeps a per-process
``_engine_cache`` keyed ``f"{engine}_{language}"``,
``ocr_service.py:170-186``).
"""

from __future__ import annotations

from typing import Any

import numpy as np


class EngineUnavailableError(RuntimeError):
    """Raised when an engine's backing library is not installed."""


class BaseOCREngine:
    engine_name = "base"

    def __init__(self, language: str = "eng"):
        self.language = language
        self._initialized = False

    # -- lifecycle ---------------------------------------------------------

    def initialize(self) -> None:
        """Load models / probe availability. Idempotent."""
        self._initialized = True

    def is_available(self) -> bool:
        try:
            self.initialize()
            return True
        except Exception:
            return False

    # -- inference ---------------------------------------------------------

    def process_image(self, image: np.ndarray) -> dict[str, Any]:
        raise NotImplementedError

    # -- helpers -----------------------------------------------------------

    def format_output(
        self,
        text: str,
        confidence: float,
        word_results: list[dict[str, Any]] | None = None,
        **metadata: Any,
    ) -> dict[str, Any]:
        """Canonical OCR result dict (base_engine.py:53-69)."""
        return {
            "text": text,
            "confidence": confidence,
            "word_count": len(text.split()) if text else 0,
            "character_count": len(text) if text else 0,
            "words": word_results or [],
            "engine": self.__class__.__name__,
            "language": self.language,
            "metadata": metadata,
        }

    def get_supported_languages(self) -> list[str]:
        return ["eng"]

    def get_engine_info(self) -> dict[str, Any]:
        return {
            "name": self.engine_name,
            "language": self.language,
            "initialized": self._initialized,
        }


# tesseract-style ISO-639-2 -> short codes (easyocr_engine.py:147-186);
# "+"-joined multi-language strings split into lists.
_LANG_MAP = {
    "eng": "en", "chi_sim": "ch_sim", "chi_tra": "ch_tra", "jpn": "ja",
    "kor": "ko", "tha": "th", "vie": "vi", "ara": "ar", "rus": "ru",
    "deu": "de", "fra": "fr", "spa": "es", "por": "pt", "tur": "tr",
    "fas": "fa", "hin": "hi", "ben": "bn", "tam": "ta", "tel": "te",
    "kan": "kn", "mal": "ml", "mar": "mr", "nep": "ne", "ita": "it",
    "nld": "nl", "pol": "pl", "swe": "sv", "fin": "fi", "dan": "da",
    "nor": "no", "hun": "hu",
}


def map_language_codes(language: str, default: str = "en") -> list[str]:
    """Map tesseract-style language codes to engine short codes."""
    parts = language.split("+") if "+" in language else [language]
    return [_LANG_MAP.get(p, default) for p in parts]
