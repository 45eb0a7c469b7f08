"""Import-gated PDF adapter exercised with a FAKED fitz module in
sys.modules (PyMuPDF is not installable in this container), mirroring
tests/test_external_adapters.py: the rasterize-at-dpi math, text-layer
extraction shape, encrypted/empty error routing and the batch stage's
error-row policy all actually run (pdf_service.py:87-229 semantics)."""

import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from medical_and_charity_document_extraction_system_ray.errors import (
    PdfEmptyError,
    PdfPasswordProtectedError,
    PdfSupportUnavailableError,
)
from medical_and_charity_document_extraction_system_ray.sources.media_resolver import (
    MediaResolver,
)
from medical_and_charity_document_extraction_system_ray.sources.pdf_adapter import (
    PDFAdapter,
    PDFToDocuments,
)


# ---------------------------------------------------------------------------
# fake fitz
# ---------------------------------------------------------------------------

class _FakeMatrix:
    def __init__(self, zx, zy):
        self.zx, self.zy = zx, zy


class _FakePixmap:
    # fake page geometry: 72 x 36 points -> pixel dims scale with zoom
    def __init__(self, matrix, gray=False):
        self.width = int(round(72 * matrix.zx))
        self.height = int(round(36 * matrix.zy))
        self.n = 1 if gray else 3
        val = 200 if gray else 90
        self.samples = bytes([val]) * (self.width * self.height * self.n)


class _FakePage:
    def __init__(self, text, gray=False):
        self._text = text
        self._gray = gray
        self.pixmap_calls = []

    def get_text(self):
        return self._text

    def get_pixmap(self, matrix=None, alpha=True):
        self.pixmap_calls.append((matrix.zx, matrix.zy, alpha))
        return _FakePixmap(matrix, gray=self._gray)


class _FakeDoc:
    def __init__(self, pages, encrypted=False):
        self._pages = pages
        self.is_encrypted = encrypted
        self.page_count = len(pages)
        self.closed = False

    def __getitem__(self, i):
        return self._pages[i]

    def close(self):
        self.closed = True


def _install_fake_fitz(monkeypatch, docs_by_path):
    mod = types.ModuleType("fitz")
    mod.Matrix = _FakeMatrix

    def _open(path=None, stream=None, filetype=None):
        key = path if path is not None else stream
        doc = docs_by_path[key]
        if isinstance(doc, Exception):
            raise doc
        return doc

    mod.open = _open
    monkeypatch.setitem(sys.modules, "fitz", mod)
    return mod


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_unavailable_without_fitz(monkeypatch):
    monkeypatch.setitem(sys.modules, "fitz", None)  # forces ImportError
    a = PDFAdapter()
    with pytest.raises(PdfSupportUnavailableError):
        a.initialize()


def test_text_layer_extraction_shape(monkeypatch):
    long_text = "charity intake form " * 10  # > 100 chars -> text-based
    doc = _FakeDoc([_FakePage(long_text), _FakePage("page two")])
    _install_fake_fitz(monkeypatch, {"a.pdf": doc})
    a = PDFAdapter()
    info = a.extract_text("a.pdf")
    assert info["page_count"] == 2
    assert info["is_text_based"] is True
    assert info["total_characters"] == len(long_text) + len("page two")
    # pdf_service.py:204-207 join shape
    assert info["full_text"].startswith("--- Page 1 ---\n")
    assert "\n\n--- Page 2 ---\npage two" in info["full_text"]
    assert doc.closed


def test_text_based_pdf_becomes_text_spans(monkeypatch):
    long_text = "x" * 120
    doc = _FakeDoc([_FakePage(long_text), _FakePage("tail")])
    _install_fake_fitz(monkeypatch, {"a.pdf": doc})
    row = PDFAdapter().to_document_row("a.pdf", "docA")
    assert row["doc_id"] == "docA"
    assert [s["kind"] for s in row["spans"]] == ["text", "text"]
    assert [s["offset"] for s in row["spans"]] == [0, 1]
    assert row["spans"][0]["text"] == long_text


def test_scanned_pdf_rasterizes_at_dpi_and_spools(monkeypatch, tmp_path):
    pages = [_FakePage("", gray=True), _FakePage("", gray=True)]
    doc = _FakeDoc(pages)
    _install_fake_fitz(monkeypatch, {"scan.pdf": doc})
    a = PDFAdapter(dpi=144, spool_dir=str(tmp_path))
    row = a.to_document_row("scan.pdf", "docS")
    # zoom = dpi/72 = 2.0, alpha=False (pdf_service.py:125-135)
    assert pages[0].pixmap_calls == [(2.0, 2.0, False)]
    assert [s["kind"] for s in row["spans"]] == ["media", "media"]
    # spooled npy loads through the standard resolver at 2x page dims
    img = MediaResolver().resolve(row["spans"][0]["media_ref"])
    assert img.shape == (72, 144)
    assert img.dtype == np.uint8 and img[0, 0] == 200


def test_rgb_pixmap_keeps_channels(monkeypatch):
    doc = _FakeDoc([_FakePage("", gray=False)])
    _install_fake_fitz(monkeypatch, {"c.pdf": doc})
    imgs = PDFAdapter(dpi=72).rasterize("c.pdf")
    assert imgs[0].shape == (36, 72, 3)


def test_encrypted_and_empty_errors(monkeypatch):
    _install_fake_fitz(
        monkeypatch,
        {
            "enc.pdf": _FakeDoc([_FakePage("x")], encrypted=True),
            "empty.pdf": _FakeDoc([]),
        },
    )
    a = PDFAdapter()
    with pytest.raises(PdfPasswordProtectedError):
        a.extract_text("enc.pdf")
    with pytest.raises(PdfEmptyError):
        a.rasterize("empty.pdf")


def test_batch_stage_error_rows(monkeypatch, tmp_path):
    """Per-file failures become rows with an error column — the
    ingestion twin of the extract stage's error-row policy."""
    long_text = "y" * 150
    _install_fake_fitz(
        monkeypatch,
        {
            "good.pdf": _FakeDoc([_FakePage(long_text)]),
            "enc.pdf": _FakeDoc([_FakePage("x")], encrypted=True),
        },
    )
    stage = PDFToDocuments(spool_dir=str(tmp_path))
    out = stage(
        pa.table({"path": ["good.pdf", "enc.pdf"], "doc_id": ["g", "e"]})
    )
    assert out.column_names == ["doc_id", "spans", "error"]
    rows = out.to_pylist()
    assert rows[0]["error"] == "" and len(rows[0]["spans"]) == 1
    assert rows[1]["error"].startswith("PdfPasswordProtectedError")
    assert rows[1]["spans"] == []
