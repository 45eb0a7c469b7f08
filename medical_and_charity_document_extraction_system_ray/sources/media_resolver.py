"""Pluggable media resolution: ``media_ref`` string -> page image.

The reference loads page images from the filesystem per page
(``backend/app/utils/file_utils.py:129-173``) and round-trips every
intermediate image through disk.  The engine instead resolves media
*inside* the batch function and keeps pixels in memory for the whole
preprocess->OCR chain.

Schemes:

- ``mem://{doc_id}/{offset}`` — fixture scheme: deterministically
  synthesize the band-codec image for the span's ground-truth text
  (FIXTURES.md §1).
- ``memb64://{base64-utf8-text}`` — self-contained scheme used when an
  interleaved table is derived from a flat corpus: the page text rides
  inside the ref and is rendered on demand.
- ``npy://{path}`` — raw ndarray on disk (np.load).
- ``file://{path}`` or a bare path ending ``.png``/``.bmp``/``.jpg``/
  ``.jpeg``/``.tif``/``.tiff`` — decoded with the pure-python codecs
  (``sources/imagecodec.py`` for PNG/BMP, ``sources/jpegcodec.py`` for
  baseline JPEG, ``sources/tiffcodec.py`` for baseline TIFF; the
  reference's ``cv2.imread`` analog, ``file_utils.py:129-173`` — the
  full ALLOWED_EXTENSIONS matrix is now covered).  The Ray-side
  plumbing (actor signature, batch layout) is identical for all
  schemes.
"""

from __future__ import annotations

import base64

import numpy as np

from ..fixtures.generate import media_ground_truth, media_noise_sigma
from ..fixtures.media import MEM_SCHEME, encode_text_image, parse_mem_ref

B64_SCHEME = "memb64://"
NPY_SCHEME = "npy://"
FILE_SCHEME = "file://"

# extension allow-list for media file refs (reference
# ``validate_image_format`` + ALLOWED_EXTENSIONS, file_utils.py:271-273,
# settings.py:104-108)
ALLOWED_EXTENSIONS = {".jpg", ".jpeg", ".png", ".tiff", ".tif", ".bmp", ".npy"}


def validate_media_format(media_ref: str) -> bool:
    """True when the ref is an in-memory scheme or a file with an
    allowed image extension."""
    if media_ref.startswith((MEM_SCHEME, B64_SCHEME)):
        return True
    import os

    ext = os.path.splitext(media_ref.split("://")[-1])[1].lower()
    return ext in ALLOWED_EXTENSIONS


def image_info(img: "np.ndarray") -> dict:
    """Width/height/channels/bytes metadata probe (reference
    ``get_image_info``, file_utils.py:210-237) — on the in-memory
    array, never a filesystem round-trip."""
    return {
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
        "channels": 1 if img.ndim == 2 else int(img.shape[2]),
        "size_bytes": int(img.nbytes),
        "dtype": str(img.dtype),
    }


class MediaResolver:
    """Stateless-per-call resolver; hold one per actor (warm state slot)."""

    def resolve(self, media_ref: str) -> np.ndarray:
        if media_ref.startswith(MEM_SCHEME):
            doc_id, offset = parse_mem_ref(media_ref)
            text = media_ground_truth(doc_id, offset)
            sigma = media_noise_sigma(doc_id, offset)
            return encode_text_image(text, noise_sigma=sigma, seed=offset + 1)
        if media_ref.startswith(B64_SCHEME):
            text = base64.urlsafe_b64decode(
                media_ref[len(B64_SCHEME) :].encode("ascii")
            ).decode("utf-8")
            return encode_text_image(text)
        if media_ref.startswith(NPY_SCHEME):
            return np.load(media_ref[len(NPY_SCHEME) :])
        from ..errors import MediaCodecUnavailableError, MediaSchemeError

        if media_ref.startswith(FILE_SCHEME) or "://" not in media_ref:
            path = (
                media_ref[len(FILE_SCHEME) :]
                if media_ref.startswith(FILE_SCHEME)
                else media_ref
            )
            if path.lower().endswith(
                (".png", ".bmp", ".jpg", ".jpeg", ".tif", ".tiff")
            ):
                from .imagecodec import decode_image_bytes

                with open(path, "rb") as f:
                    return decode_image_bytes(f.read(), ref=media_ref)
            raise MediaCodecUnavailableError(
                f"no image codec available for media_ref {media_ref!r}; "
                "png/bmp/jpg/tiff are decoded by the built-in pure-python "
                "codecs — anything else needs an imaging library not "
                "present in this environment"
            )
        raise MediaSchemeError(
            f"no reader for media scheme in {media_ref!r}; a deployment "
            "plugs remote readers (s3/http) into MediaResolver"
        )


def text_to_media_ref(text: str) -> str:
    """Build a self-contained ``memb64://`` ref carrying ``text``."""
    return B64_SCHEME + base64.urlsafe_b64encode(text.encode("utf-8")).decode("ascii")
