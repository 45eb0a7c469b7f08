from .generate import (
    make_document,
    make_documents_table,
    media_ground_truth,
    media_noise_sigma,
    write_documents_parquet,
)
from .media import decode_text_image, encode_text_image, parse_mem_ref

__all__ = [
    "make_document",
    "make_documents_table",
    "media_ground_truth",
    "media_noise_sigma",
    "write_documents_parquet",
    "decode_text_image",
    "encode_text_image",
    "parse_mem_ref",
]
