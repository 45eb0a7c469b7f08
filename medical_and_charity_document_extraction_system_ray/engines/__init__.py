from .band import BandOCREngine
from .base import BaseOCREngine, EngineUnavailableError, map_language_codes
from .external import EasyOCRAdapter, PaddleOCRAdapter
from .factory import (
    DEFAULT_ENGINE,
    available_engines,
    create_ocr_engine,
    register_engine,
)

__all__ = [
    "BandOCREngine",
    "BaseOCREngine",
    "EngineUnavailableError",
    "map_language_codes",
    "EasyOCRAdapter",
    "PaddleOCRAdapter",
    "DEFAULT_ENGINE",
    "available_engines",
    "create_ocr_engine",
    "register_engine",
]
