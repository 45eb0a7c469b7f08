from .classify import classify_and_explode, classify_batch, explode_batch
from .extract import SpanExtractor
from .reassemble import reassemble_table

__all__ = [
    "classify_and_explode",
    "classify_batch",
    "explode_batch",
    "SpanExtractor",
    "reassemble_table",
]
