"""Engine registry / factory.

Mirrors the reference's name->class registry
(``backend/app/core/ocr_engines/engine_factory.py:15-84``): aliased
names, explicit rejection of the broken tesseract engine, unknown name
-> error listing what is available.  The default engine here is the
deterministic ``band`` engine (the reference forces ``easyocr``,
``settings.py:36`` — available via the adapter when installed).

New engines register without touching the pipeline driver
(user-extension surface, SURVEY.md §2.9).
"""

from __future__ import annotations

from .band import BandOCREngine
from .base import BaseOCREngine
from .external import EasyOCRAdapter, PaddleOCRAdapter
from .nanocr import NanOCREngine

DEFAULT_ENGINE = "band"

_ENGINES: dict[str, type[BaseOCREngine]] = {
    "band": BandOCREngine,
    "easyocr": EasyOCRAdapter,
    "paddle": PaddleOCRAdapter,
    "paddleocr": PaddleOCRAdapter,
    # real trained numpy MLP recognizer (vendored weights) — the
    # non-faked model path through the actor pool
    "nanocr": NanOCREngine,
}

_REJECTED = {
    "tesseract": "tesseract engine is disabled (broken in the reference: "
    "undefined helpers + hard-coded binary path; engine_factory.py rejects it)"
}


def register_engine(name: str, cls: type[BaseOCREngine]) -> None:
    _ENGINES[name] = cls


def available_engines() -> list[str]:
    return sorted(_ENGINES)


def create_ocr_engine(
    name: str | None = None, language: str = "eng", **kwargs
) -> BaseOCREngine:
    engine_name = (name or DEFAULT_ENGINE).lower()
    if engine_name in _REJECTED:
        raise ValueError(_REJECTED[engine_name])
    cls = _ENGINES.get(engine_name)
    if cls is None:
        raise ValueError(
            f"unknown OCR engine {engine_name!r}; available: {available_engines()}"
        )
    return cls(language=language, **kwargs)
