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


# ---------------------------------------------------------------------------
# Reference exception taxonomy mirror
# ---------------------------------------------------------------------------
# Every class of the reference's exception tree
# (backend/app/utils/exceptions.py:4-280, 49 classes; the reference's
# error_code defaults to the class name) mapped to this engine's stable
# codes, so a consumer migrating stored reference error payloads — or
# grepping for a reference class — can round-trip.  Families with no
# batch-engine analog (HTTP envelope codes, task-queue lifecycle,
# database) map to engine-level codes that keep the family queryable.
REFERENCE_ERROR_CODES: dict[str, str] = {
    # root
    "OCRSystemException": "ENGINE_ERROR",
    # file family -> media (files are media_ref'd rows here)
    "FileException": "MEDIA_ERROR",
    "FileNotFoundError": "MEDIA_NOT_FOUND",
    "InvalidFileTypeError": "MEDIA_INVALID_FORMAT",
    "FileSizeExceededError": "MEDIA_SIZE_EXCEEDED",
    "FileUploadError": "MEDIA_INGEST_FAILED",
    "FileReadError": "IO_ERROR",
    "FileWriteError": "IO_ERROR",
    # PDF family
    "PDFException": "PDF_ERROR",
    "PDFMergeError": "PDF_MERGE_FAILED",
    "PDFCorruptedError": "PDF_CONVERSION_FAILED",
    "PDFPasswordProtectedError": "PDF_PASSWORD_PROTECTED",
    "PDFConversionError": "PDF_CONVERSION_FAILED",
    "PDFEmptyError": "PDF_EMPTY",
    # image family
    "ImageException": "MEDIA_ERROR",
    "ImageLoadError": "MEDIA_DECODE_FAILED",
    "ImageProcessingError": "PREPROCESS_FAILED",
    "ImageQualityError": "PREPROCESS_FAILED",
    "ImageFormatError": "MEDIA_INVALID_FORMAT",
    # OCR family
    "OCRException": "OCR_ERROR",
    "OCREngineNotFoundError": "OCR_ENGINE_NOT_FOUND",
    "OCRProcessingError": "OCR_PROCESSING_FAILED",
    "OCRNoTextFoundError": "OCR_NO_TEXT_FOUND",
    "OCRLowConfidenceError": "OCR_LOW_CONFIDENCE",
    "OCRTimeoutError": "TIMEOUT",
    "OCRLanguageNotSupportedError": "OCR_LANGUAGE_UNSUPPORTED",
    # task family -> checkpoint/manifest lifecycle
    "TaskException": "CHECKPOINT_ERROR",
    "TaskNotFoundError": "CHECKPOINT_PARTITION_NOT_FOUND",
    "TaskCreationError": "CHECKPOINT_COMMIT_FAILED",
    "TaskStorageError": "CHECKPOINT_COMMIT_FAILED",
    "TaskLimitExceededError": "CHECKPOINT_LIMIT_EXCEEDED",
    # validation family
    "ValidationException": "INPUT_VALIDATION_FAILED",
    "JSONValidationError": "INPUT_VALIDATION_FAILED",
    "SchemaValidationError": "SCHEMA_VALIDATION_FAILED",
    "InputValidationError": "INPUT_VALIDATION_FAILED",
    # configuration family
    "ConfigurationException": "CONFIG_ERROR",
    "MissingConfigurationError": "CONFIG_MISSING",
    "InvalidConfigurationError": "CONFIG_INVALID",
    # database family (no database here; keep the family queryable)
    "DatabaseException": "STORAGE_ERROR",
    "DatabaseConnectionError": "STORAGE_ERROR",
    "DatabaseQueryError": "STORAGE_ERROR",
    # API envelope family -> driver-level errors (no HTTP surface)
    "APIException": "ENGINE_ERROR",
    "BadRequestError": "INPUT_VALIDATION_FAILED",
    "UnauthorizedError": "ACCESS_DENIED",
    "ForbiddenError": "ACCESS_DENIED",
    "NotFoundError": "MEDIA_NOT_FOUND",
    "ConflictError": "CHECKPOINT_COMMIT_FAILED",
    "InternalServerError": "ENGINE_ERROR",
    "ServiceUnavailableError": "ENGINE_UNAVAILABLE",
}


def reference_error_code(reference_class_name: str) -> str:
    """Round-trip a reference exception class name (the reference's
    default ``error_code``) to this engine's stable code; unknown names
    get the queryable UNCLASSIFIED prefix, mirroring
    ``stable_error_code``'s fallback."""
    return REFERENCE_ERROR_CODES.get(
        reference_class_name, f"UNCLASSIFIED_{reference_class_name}"
    )
