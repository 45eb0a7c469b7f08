from .media_resolver import MediaResolver
from .readers import read_documents, read_table

__all__ = ["MediaResolver", "read_documents", "read_table"]
