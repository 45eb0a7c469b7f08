"""Span extraction — the stateful heart of the pipeline.

``SpanExtractor`` is a callable class for
``map_batches(SpanExtractor, concurrency=N, batch_size=B)``: the OCR
engine (model weights / warm parser state) and media resolver are built
ONCE per actor in ``__init__`` and reused across batches — the Ray
replacement for the reference's per-process engine cache
(``backend/app/services/ocr_service.py:170-186``).

Routing follows the reference per-document branches
(``ocr_service.py:33-128``):

- doc NOT scanned  -> direct text extraction: each span's text layer is
  taken verbatim (media spans contribute their empty text layer),
  confidence pinned 100.0 (``ocr_service.py:59-68``,
  ``pdf_service.py:164-229``).  Handled fully vectorized.
- doc scanned      -> every page is rasterized and OCR'd
  (``ocr_service.py:79-100``): text spans are rendered to a page image,
  media spans resolved from ``media_ref``; then preprocess (enhance ->
  denoise -> deskew -> binarize) and the engine run per image.  A
  per-span failure becomes an error ROW, never a task failure
  (``ocr_service.py:154-157,229-243``).

Both branches are handled in ONE stage rather than two filtered
sub-datasets: splitting would execute the upstream read+explode once
per branch (Ray Data datasets re-execute per consumer), which at 100 TB
doubles the scan.  The text branch costs a few vectorized Arrow kernels
per batch, so sharing the media batch size loses nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engines import create_ocr_engine
from ..errors import stable_error_code
from ..kernels.html import strip_boilerplate
from ..kernels.preprocess import PreprocessConfig, preprocess_image_array
from ..fixtures.media import encode_text_image
from ..schema import (
    DIRECT_CONFIDENCE,
    EXTRACTED_ROWS_SCHEMA,
    KIND_HTML,
    KIND_TEXT,
    WORD_STRUCT,
)
from ..sources.media_resolver import MediaResolver


class SpanExtractor:
    def __init__(
        self,
        engine: str | None = None,
        language: str = "eng",
        preprocess: bool = True,
        document_type: str = "general",
        keep_words: bool = False,
    ):
        self.engine = create_ocr_engine(engine, language=language)
        self.engine.initialize()
        self.resolver = MediaResolver()
        self.preprocess = preprocess
        self.config = PreprocessConfig.for_document_type(document_type)
        # per-word boxes (golden-output parity) bloat the reassembly
        # shuffle ~5-10x, so they are opt-in
        self.keep_words = keep_words

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        batch = batch.combine_chunks()
        kind_col = batch.column("kind")
        text_col = batch.column("text").combine_chunks()
        scanned = batch.column("is_scanned").to_numpy(zero_copy_only=False)
        is_html = pc.equal(kind_col, KIND_HTML).to_numpy(zero_copy_only=False)
        # rows needing python work: every scanned row (rasterize/OCR) and
        # every HTML row (boilerplate strip).  Direct non-HTML rows — the
        # overwhelming majority of a text corpus — never leave Arrow:
        # text verbatim, codepoint count, confidence pinned.
        slow = scanned | is_html
        slow_idx = np.nonzero(slow)[0]

        conf = np.where(scanned, 0.0, DIRECT_CONFIDENCE)
        char_count = (
            pc.utf8_length(text_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        char_count[slow_idx] = 0  # slow rows recomputed below
        word_count = np.zeros(n, dtype=np.int64)
        engine_name: list[str | None] = [None] * n
        language: list[str | None] = [None] * n
        error: list[str] = [""] * n
        error_code: list[str] = [""] * n
        success = np.ones(n, dtype=bool)
        words: list[list] = [[] for _ in range(n)] if self.keep_words else []

        out_slow: list[str] = [""] * slow_idx.size
        if slow_idx.size:
            take = pa.array(slow_idx)
            kind = kind_col.take(take).to_pylist()
            text_in = text_col.take(take).to_pylist()
            media_ref = batch.column("media_ref").take(take).to_pylist()
        for j, i in enumerate(slow_idx):
            if not scanned[i]:
                # direct HTML: main-content extraction (boilerplate
                # strip) — the north-rule DOM-density path
                t = strip_boilerplate(text_in[j])
                out_slow[j] = t
                char_count[i] = len(t)
                continue
            try:
                if kind[j] == KIND_HTML:
                    t = strip_boilerplate(text_in[j])
                    out_slow[j] = t
                    conf[i] = DIRECT_CONFIDENCE
                    word_count[i] = len(t.split())
                    char_count[i] = len(t)
                    continue
                if kind[j] == KIND_TEXT:
                    img = encode_text_image(text_in[j])  # rasterize the page
                else:
                    img = self.resolver.resolve(media_ref[j])
                if self.preprocess:
                    img, _meta = preprocess_image_array(img, self.config)
                result = self.engine.process_image(img)
                out_slow[j] = result["text"]
                conf[i] = result["confidence"]
                word_count[i] = result["word_count"]
                char_count[i] = result["character_count"]
                engine_name[i] = result["engine"]
                language[i] = result["language"]
                if self.keep_words:
                    words[i] = result.get("words", [])
            except Exception as e:  # error-row semantics: errors become data
                out_slow[j] = ""
                conf[i] = 0.0
                word_count[i] = 0
                char_count[i] = 0
                error[i] = str(e)
                # structured error taxonomy (exceptions.py:4-280 analog):
                # stable codes survive class renames / library swaps
                error_code[i] = stable_error_code(e)
                success[i] = False

        if slow_idx.size:
            # scatter the slow-row texts back without touching fast rows:
            # concat (input ++ replacements) and take with a remapped index
            repl = pa.array(out_slow, type=text_col.type)
            pool = pa.chunked_array([text_col, repl]).combine_chunks()
            take_idx = np.arange(n, dtype=np.int64)
            take_idx[slow_idx] = n + np.arange(slow_idx.size)
            out_text = pool.take(pa.array(take_idx))
        else:
            out_text = text_col

        out = pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("offset"),
                batch.column("kind"),
                pc.cast(out_text, pa.string()),
                batch.column("media_ref"),
                batch.column("is_scanned"),
                batch.column("page_count"),
                pa.array(conf),
                pa.array(word_count),
                pa.array(char_count),
                pa.array(engine_name, type=pa.string()),
                pa.array(language, type=pa.string()),
                pa.array(error, type=pa.string()),
                pa.array(error_code, type=pa.string()),
                pa.array(success),
            ],
            schema=EXTRACTED_ROWS_SCHEMA,
        )
        if self.keep_words:
            out = out.append_column(
                "words", pa.array(words, type=pa.list_(WORD_STRUCT))
            )
        # rows are 1:1 with input: unrecognized input columns pass
        # through (e.g. the checkpoint runner's partition_id)
        consumed = {
            "doc_id", "offset", "kind", "text", "media_ref",
            "is_scanned", "page_count",
        }
        for name in batch.column_names:
            if name not in consumed:
                out = out.append_column(name, batch.column(name))
        return out
