"""Preprocessing orchestration: enhance -> denoise -> deskew -> binarize.

Same fixed order, per-step gating flags, method-string options and
``steps_applied``/``skew_angle`` metadata as the reference's
``PreprocessingService.preprocess_image_array``
(``backend/app/services/preprocessing_service.py:82-133``).  Unlike the
reference, images never round-trip through the filesystem between steps
— the array flows through in memory inside a ``map_batches`` function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from . import binarizer, denoiser, deskewer, enhancer


@dataclass(frozen=True)
class PreprocessConfig:
    """Stage toggles + method strings (settings.py:47-51 analogs)."""

    enhance: bool = True
    denoise: bool = True
    deskew: bool = True
    binarize: bool = True
    enhancement_method: str = "auto"
    denoise_method: str = "auto"
    deskew_method: str = "auto"
    binarize_method: str = "auto"

    @classmethod
    def for_document_type(cls, document_type: str = "general") -> "PreprocessConfig":
        """Document-type presets; unknown types fall back to "general"
        (preprocessing_service.py:143-152 — only "general" is defined)."""
        presets = {"general": cls()}
        return presets.get(document_type, presets["general"])


def preprocess_image_array(
    image: np.ndarray, config: PreprocessConfig | None = None, **options: Any
) -> tuple[np.ndarray, dict[str, Any]]:
    """Run the gated kernel chain; returns (processed, metadata)."""
    cfg = config or PreprocessConfig()
    metadata: dict[str, Any] = {
        "original_shape": tuple(image.shape),
        "steps_applied": [],
        "skew_angle": 0.0,
    }
    processed = image

    if options.get("enhance", cfg.enhance):
        m = options.get("enhancement_method", cfg.enhancement_method)
        processed = enhancer.enhance(processed, method=m)
        metadata["steps_applied"].append(f"enhance_{m}")

    if options.get("denoise", cfg.denoise):
        m = options.get("denoise_method", cfg.denoise_method)
        processed = denoiser.denoise(processed, method=m)
        metadata["steps_applied"].append(f"denoise_{m}")

    if options.get("deskew", cfg.deskew):
        m = options.get("deskew_method", cfg.deskew_method)
        processed, angle = deskewer.deskew(processed, method=m)
        metadata["skew_angle"] = angle
        metadata["steps_applied"].append(f"deskew_{m}")

    if options.get("binarize", cfg.binarize):
        m = options.get("binarize_method", cfg.binarize_method)
        processed = binarizer.binarize(processed, method=m)
        metadata["steps_applied"].append(f"binarize_{m}")

    metadata["final_shape"] = tuple(processed.shape)
    return processed, metadata
