from . import binarizer, denoiser, deskewer, enhancer, ops
from .preprocess import PreprocessConfig, preprocess_image_array

__all__ = [
    "binarizer",
    "denoiser",
    "deskewer",
    "enhancer",
    "ops",
    "PreprocessConfig",
    "preprocess_image_array",
]
