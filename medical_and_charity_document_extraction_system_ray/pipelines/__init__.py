from .extraction import extract_documents, extract_spans

__all__ = ["extract_documents", "extract_spans"]
