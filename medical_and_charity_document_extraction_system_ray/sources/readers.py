"""Dataset readers.

The production format in the north rule is Lance; the container ships
no lance bindings, so parquet is the storage stand-in (identical Arrow
schema, identical columnar access patterns — column pruning + row-group
predicate pushdown via ``ray.data.read_parquet``).
"""

from __future__ import annotations

import ray.data


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Read an interleaved-documents table (doc_id, spans)."""
    return ray.data.read_parquet(path, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one of the generic benchmark tables, pruning at the read."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)
