"""Dataset readers.

The production format in the north rule is Lance; the container ships
no lance bindings, so parquet is the storage stand-in (identical Arrow
schema, identical columnar access patterns — column pruning + row-group
predicate pushdown via ``ray.data.read_parquet``).
"""

from __future__ import annotations

import ray.data


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Read an interleaved-documents table (doc_id, spans).

    A ``*.lance`` path (or ``lance://`` URI) routes to
    ``ray.data.read_lance`` — the north rule's production format — when
    the ``lance`` bindings are installed (import-gated exactly like the
    OCR/PDF adapters; this container ships none, so the pytest fakes
    the module).  Everything else reads parquet: identical Arrow
    schema, identical column pruning, so downstream stages never see
    the difference."""
    lower = path.lower()
    if lower.endswith(".lance") or lower.startswith("lance://"):
        try:
            import lance  # noqa: F401  (read_lance needs the bindings)
        except ImportError as e:
            raise RuntimeError(
                "reading a Lance table requires the 'lance' package "
                "(pip install pylance); parquet needs no extra bindings"
            ) from e
        uri = path[8:] if lower.startswith("lance://") else path
        return ray.data.read_lance(uri, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one of the generic benchmark tables, pruning at the read."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def read_flat_documents(path: str, columns: list[str] | None = None,
                        **kwargs) -> ray.data.Dataset:
    """Flat documents corpus from parquet / JSONL / CSV, by extension.

    Parquet gets column pruning at the read; JSONL/CSV are row formats
    (no pruning possible at the scan) so unwanted columns are dropped in
    the first map stage instead.  All three normalize to the same
    schema: ``doc_id`` int64, ``text`` string, plus ``n_chars``
    (computed when the source lacks it) — downstream pipelines are
    format-agnostic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lower = path.lower()
    if lower.endswith(".parquet") or lower.endswith("/"):
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if lower.endswith((".jsonl", ".json")):
        ds = ray.data.read_json(path, **kwargs)
    elif lower.endswith(".csv"):
        ds = ray.data.read_csv(path, **kwargs)
    else:
        raise ValueError(f"unknown documents format: {path!r}")

    def normalize(t: pa.Table) -> pa.Table:
        cols = {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            # CSV parses an empty cell as null: normalize to "" so the
            # extractor's text kernels never see a null page
            "text": pc.fill_null(pc.cast(t["text"], pa.string()), ""),
        }
        for extra in ("lang", "source"):
            if extra in t.column_names:
                cols[extra] = pc.cast(t[extra], pa.string())
        cols["n_chars"] = (
            pc.cast(t["n_chars"], pa.int64())
            if "n_chars" in t.column_names
            else pc.cast(pc.utf8_length(cols["text"]), pa.int64())
        )
        out = pa.table(cols)
        if columns:
            out = out.select([c for c in columns if c in out.column_names])
        return out

    return ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)


def write_results_json(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Partitioned JSON(L) sink — the reference persists every result as
    a JSON document (``backend/app/utils/json_utils.py`` writers); the
    engine's primary sink is partitioned parquet + manifest
    (``state/checkpoint.py``), and this wrapper serves consumers that
    want the reference's format: one JSONL shard per block, streamed."""
    ds.write_json(out_dir, **kwargs)
