"""Stable error-code taxonomy for error ROWS.

The reference declares a 40+-class exception tree whose ``error_code``
defaults to the class name (``backend/app/utils/exceptions.py:4-280``).
The engine keeps the same idea but makes the codes an explicit, stable
contract: error rows are DATA (queried, aggregated, retried on), so
codes must survive refactors that rename exception classes.

``stable_error_code(exc)`` is the single mapping used by the extractor
stage when it converts a failure into an error row."""

from __future__ import annotations


class EngineError(Exception):
    """Base: subclasses pin a stable ``code`` independent of the class
    name (reference OCRSystemException.to_dict analog)."""

    code = "ENGINE_ERROR"

    def __init__(self, message: str = "", details: dict | None = None):
        super().__init__(message)
        self.details = details or {}

    def to_row(self) -> dict:
        return {"error": self.code, "message": str(self), "details": self.details}


# -- media / file family (reference FileException + ImageException) ---------

class MediaError(EngineError):
    code = "MEDIA_ERROR"


class MediaNotFoundError(MediaError):
    code = "MEDIA_NOT_FOUND"


class MediaFormatError(MediaError):
    code = "MEDIA_INVALID_FORMAT"


class MediaDecodeError(MediaError):
    code = "MEDIA_DECODE_FAILED"


class MediaCodecUnavailableError(MediaError, NotImplementedError):
    """No decoder for the format in this environment (the multimodal
    stub policy keeps this a NotImplementedError subclass)."""

    code = "MEDIA_CODEC_UNAVAILABLE"


class MediaSchemeError(MediaError, NotImplementedError):
    """Remote/unknown media scheme with no reader in this environment
    (s3:// etc. — a real deployment plugs a reader into MediaResolver)."""

    code = "MEDIA_UNSUPPORTED_SCHEME"


# -- OCR family (reference OCRException) -------------------------------------

class OcrError(EngineError):
    code = "OCR_ERROR"


class OcrProcessingError(OcrError):
    code = "OCR_PROCESSING_FAILED"


class OcrNoTextFoundError(OcrError):
    code = "OCR_NO_TEXT_FOUND"


# -- PDF family (reference PDFException tree, exceptions.py analog;
#    raised by the import-gated fitz adapter, sources/pdf_adapter.py) --------

class PdfError(EngineError):
    code = "PDF_ERROR"


class PdfSupportUnavailableError(PdfError, NotImplementedError):
    """PyMuPDF (fitz) is not installed — the container-gated analog of
    the OCR adapters' EngineUnavailableError."""

    code = "PDF_SUPPORT_UNAVAILABLE"


class PdfPasswordProtectedError(PdfError):
    code = "PDF_PASSWORD_PROTECTED"


class PdfEmptyError(PdfError):
    code = "PDF_EMPTY"


class PdfConversionError(PdfError):
    code = "PDF_CONVERSION_FAILED"


# -- validation family (reference ValidationException) ------------------------

class InputValidationError(EngineError):
    code = "INPUT_VALIDATION_FAILED"


# builtin / third-party exceptions that reach the error-row boundary get
# stable codes too — type(e).__name__ would silently change under
# refactors or library swaps
_BUILTIN_CODES = {
    FileNotFoundError: "MEDIA_NOT_FOUND",
    PermissionError: "MEDIA_ACCESS_DENIED",
    NotImplementedError: "MEDIA_CODEC_UNAVAILABLE",
    ValueError: "INVALID_VALUE",
    KeyError: "MISSING_KEY",
    TypeError: "INVALID_TYPE",
    MemoryError: "OUT_OF_MEMORY",
    TimeoutError: "TIMEOUT",
    OSError: "IO_ERROR",
}


def stable_error_code(exc: BaseException) -> str:
    """Stable code for an exception: EngineError subclasses carry their
    own; known builtins map through _BUILTIN_CODES (most-derived class
    first); anything else falls back to the class name prefixed so the
    unclassified set is queryable."""
    if isinstance(exc, EngineError):
        return exc.code
    for klass in type(exc).__mro__:
        if klass in _BUILTIN_CODES:
            return _BUILTIN_CODES[klass]
    return f"UNCLASSIFIED_{type(exc).__name__}"
