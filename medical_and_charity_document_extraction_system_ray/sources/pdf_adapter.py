"""Import-gated real-PDF ingestion (PyMuPDF / ``fitz``).

The reference's front door is a ``.pdf`` byte blob: it rasterizes pages
via PyMuPDF and/or reads the text layer
(``backend/app/services/pdf_service.py:87-229``).  This engine models
documents as already-exploded span tables, so this adapter is the
bridge from a real PDF file to that table — mirroring the OCR adapters'
pattern (``engines/external.py``): the fitz import happens at
``initialize``; without the library every call raises the typed
``PdfSupportUnavailableError`` while the Ray-side plumbing (actor
signature, batch layout, output schema) stays real and fake-module
testable.

Reference semantics preserved:

- encrypted file -> ``PdfPasswordProtectedError``; zero pages ->
  ``PdfEmptyError`` (``pdf_service.py:107-122``);
- rasterize at ``zoom = dpi / 72`` via ``Matrix(zoom, zoom)``,
  ``get_pixmap(alpha=False)`` (``pdf_service.py:125-143``);
- text layer: per-page ``get_text``, ``full_text`` joined as
  ``--- Page N ---`` sections, ``is_text_based = total_chars > 100``
  (``pdf_service.py:165-229``);
- the text/scanned routing mirrors the pipeline's classifier: a
  text-based PDF becomes direct text spans, a scanned one becomes
  media spans whose rasterized pages are spooled as ``npy://`` refs
  the per-actor ``MediaResolver`` loads lazily (pixels are NOT shipped
  through the documents table).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa

from ..errors import (
    PdfConversionError,
    PdfEmptyError,
    PdfPasswordProtectedError,
    PdfSupportUnavailableError,
)
from ..schema import DOCUMENTS_SCHEMA, KIND_MEDIA, KIND_TEXT

TEXT_BASED_MIN_CHARS = 100  # pdf_service.py:222 ``total_chars > 100``


class PDFAdapter:
    """Stateful per-actor adapter: holds the imported fitz module."""

    def __init__(self, dpi: int = 200, spool_dir: str = "/tmp/graft_pdf_spool"):
        self.dpi = dpi
        self.spool_dir = spool_dir
        self._fitz = None

    def initialize(self) -> None:
        if self._fitz is not None:
            return
        try:
            import fitz
        except ImportError as e:
            raise PdfSupportUnavailableError(
                "PyMuPDF (fitz) is not installed in this environment; "
                "PDF ingestion is import-gated like the external OCR engines"
            ) from e
        self._fitz = fitz

    def _open(self, source: str | bytes):
        self.initialize()
        try:
            doc = (
                self._fitz.open(stream=source, filetype="pdf")
                if isinstance(source, (bytes, bytearray))
                else self._fitz.open(source)
            )
        except Exception as e:
            raise PdfConversionError(f"failed to open PDF: {e}") from e
        if getattr(doc, "is_encrypted", False):
            doc.close()
            raise PdfPasswordProtectedError("PDF is password protected")
        if doc.page_count == 0:
            doc.close()
            raise PdfEmptyError("PDF has no pages")
        return doc

    def extract_text(self, source: str | bytes) -> dict[str, Any]:
        """Text-layer read, pdf_service.py:165-229 shape."""
        doc = self._open(source)
        try:
            pages = []
            total = 0
            for i in range(doc.page_count):
                text = doc[i].get_text()
                pages.append(
                    {"page_number": i + 1, "text": text, "char_count": len(text)}
                )
                total += len(text)
            full_text = "\n\n".join(
                f"--- Page {p['page_number']} ---\n{p['text']}" for p in pages
            )
            return {
                "page_count": len(pages),
                "total_characters": total,
                "full_text": full_text,
                "pages": pages,
                "is_text_based": total > TEXT_BASED_MIN_CHARS,
            }
        finally:
            doc.close()

    def rasterize(self, source: str | bytes, dpi: int | None = None) -> list[np.ndarray]:
        """Per-page pixel arrays at ``zoom = dpi / 72``
        (pdf_service.py:125-143; in-memory instead of the reference's
        png-per-page round-trip)."""
        dpi = dpi or self.dpi
        doc = self._open(source)
        try:
            zoom = dpi / 72.0
            mat = self._fitz.Matrix(zoom, zoom)
            out = []
            for i in range(doc.page_count):
                pix = doc[i].get_pixmap(matrix=mat, alpha=False)
                arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
                    pix.height, pix.width, pix.n
                )
                out.append(arr[:, :, 0] if pix.n == 1 else arr)
            return out
        finally:
            doc.close()

    def to_document_row(self, source: str | bytes, doc_id: str) -> dict[str, Any]:
        """One documents-table row: direct text spans for a text-based
        PDF, spooled ``npy://`` media spans for a scanned one."""
        info = self.extract_text(source)
        if info["is_text_based"]:
            spans = [
                {
                    "kind": KIND_TEXT,
                    "text": p["text"],
                    "media_ref": "",
                    "offset": p["page_number"] - 1,
                }
                for p in info["pages"]
            ]
        else:
            os.makedirs(self.spool_dir, exist_ok=True)
            spans = []
            for i, page in enumerate(self.rasterize(source)):
                path = os.path.join(self.spool_dir, f"{doc_id}_page_{i:04d}.npy")
                np.save(path, page)
                spans.append(
                    {
                        "kind": KIND_MEDIA,
                        "text": "",
                        "media_ref": f"npy://{path}",
                        "offset": i,
                    }
                )
        return {"doc_id": doc_id, "spans": spans}


class PDFToDocuments:
    """``map_batches`` callable class over a table of PDF paths:
    ``(path [, doc_id])`` -> documents-schema rows + an ``error``
    column (per-file failures become rows, never task failures —
    the extract stage's error-row policy applied to ingestion)."""

    def __init__(self, dpi: int = 200, spool_dir: str = "/tmp/graft_pdf_spool"):
        self.adapter = PDFAdapter(dpi=dpi, spool_dir=spool_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        ids = (
            batch["doc_id"].to_pylist()
            if "doc_id" in batch.column_names
            else [os.path.splitext(os.path.basename(p))[0] for p in paths]
        )
        rows, errors = [], []
        for path, doc_id in zip(paths, ids):
            try:
                rows.append(self.adapter.to_document_row(path, doc_id))
                errors.append("")
            except Exception as e:
                rows.append({"doc_id": doc_id, "spans": []})
                errors.append(f"{type(e).__name__}: {e}")
        out = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
        return out.append_column("error", pa.array(errors, type=pa.string()))


def read_pdfs(
    paths: list[str],
    dpi: int = 200,
    concurrency: int | None = None,
    spool_dir: str = "/tmp/graft_pdf_spool",
):
    """PDF files -> documents-shaped Dataset (feed to
    ``extract_documents``).  An actor pool holds the warm fitz module;
    one file is one row, so Ray streams/backpressures per file.
    ``concurrency=None`` derives the pool width from the cluster CPU
    count (rasterization is CPU-bound per file)."""
    import ray.data

    if concurrency is None:
        from ..functions.cluster import media_pool_size

        concurrency = media_pool_size()
    items = [{"path": p} for p in paths]
    return ray.data.from_items(items).map_batches(
        PDFToDocuments,
        fn_constructor_kwargs={"dpi": dpi, "spool_dir": spool_dir},
        batch_format="pyarrow",
        concurrency=min(concurrency, max(1, len(items))),
        batch_size=1,
    )
