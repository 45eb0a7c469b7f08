"""Multimodal column operators.

Image/audio/video payloads are opaque references/binary columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.  All three modalities now decode
for real with the built-in pure-python codecs: images via
``sources/imagecodec.py``/``jpegcodec.py``/``tiffcodec.py``, audio via
``sources/wavcodec.py``, video via ``sources/avicodec.py`` (AVI/RIFF,
DIB + MJPG streams — exercised end-to-end by ``q_avi_scene_changes``).
Unknown formats stay typed error rows (``MediaCodecUnavailableError``
via MediaResolver — the reference's cv2 decode path,
``file_utils.py:129-173``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.media_resolver import MediaResolver


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resize (the engine analog of cv2.resize)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    f = img.astype(np.float64)
    out = (
        f[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + f[np.ix_(y0, x1)] * (1 - fy) * fx
        + f[np.ix_(y1, x0)] * fy * (1 - fx)
        + f[np.ix_(y1, x1)] * fy * fx
    )
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def sample_frames(n_frames: int, fps: float, every_sec: float) -> np.ndarray:
    """Deterministic frame-sampling plan for a video payload: indices of
    one frame per ``every_sec`` seconds.  (Video *decode* is stubbed —
    no codec in this container — but the sampling plan and the actor
    plumbing are the real scale path.)"""
    step = max(1, int(round(fps * every_sec)))
    return np.arange(0, n_frames, step, dtype=np.int64)


def q_frame_sample_plan(sf_dir: str, every_sec: float = 2.0) -> ray.data.Dataset:
    """Deterministic video frame-sampling plan: each document models a
    video payload (n_frames = n_chars at fps 12..36 derived from
    doc_id), and ``sample_frames`` emits one row per kept frame — the
    plan half of the video path (frame DECODE is the multimodal stub;
    the fan-out, schema and ordering are the real scale surface).
    SQL-matched via generate_series."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def plan(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        n_frames = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = (12 + (doc % 5) * 6).astype(np.float64)
        step = np.maximum(1, (fps * every_sec).astype(np.int64))  # exact ints
        counts = np.where(n_frames > 0, (n_frames - 1) // step + 1, 0)
        rep_doc = np.repeat(doc, counts)
        rep_step = np.repeat(step, counts)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        j = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "doc_id": pa.array(rep_doc.astype(np.int64)),
                "frame_idx": pa.array(j * rep_step),
                "fps": pa.array(np.repeat(fps, counts)),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)


Q_FRAME_SAMPLE_SQL = """
SELECT d.doc_id,
       CAST(gs.f AS BIGINT) AS frame_idx,
       CAST(12 + (d.doc_id % 5) * 6 AS DOUBLE) AS fps
FROM documents d,
     LATERAL (SELECT UNNEST(generate_series(0, d.n_chars - 1,
                  GREATEST(CAST((12 + (d.doc_id % 5) * 6) * 2 AS BIGINT), 1)))
              AS f) gs
WHERE d.n_chars > 0
"""


class MediaFeatureExtractor:
    """Actor: decode media_ref -> grayscale page image -> fixed feature
    row (dims, ink ratio, intensity stats, 8x8 thumbnail hash).

    Resolver state held per actor; failures become error rows (same
    semantics as the OCR stage)."""

    def __init__(self, thumb: int = 8):
        self.resolver = MediaResolver()
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        n = len(refs)
        height = np.zeros(n, np.int32)
        width = np.zeros(n, np.int32)
        mean = np.zeros(n, np.float64)
        std = np.zeros(n, np.float64)
        ink_ratio = np.zeros(n, np.float64)
        thumb_hash = np.zeros(n, np.int64)
        error = [""] * n
        success = np.ones(n, bool)
        for i, ref in enumerate(refs):
            try:
                img = self.resolver.resolve(ref)
                if img.ndim == 3:
                    img = img.mean(axis=2).astype(np.uint8)
                height[i], width[i] = img.shape
                mean[i] = float(img.mean())
                std[i] = float(img.std())
                ink_ratio[i] = float((img < 128).mean())
                t = resize_bilinear(img, self.thumb, self.thumb)
                bits = (t.reshape(-1) < t.mean()).astype(np.uint64)
                h = np.uint64(0)
                for b in bits:
                    h = (h << np.uint64(1)) | b
                thumb_hash[i] = np.int64(h.astype(np.int64))
            except Exception as e:
                error[i] = str(e)
                success[i] = False
        # 1e-3 grid epsilon (the cosine recipe): the SQL oracle computes
        # these from the band-codec bit counts, the pipeline from the
        # rendered pixels — identical rationals up to float summation
        # order, so both floor on the nudged grid
        cols = {
            "media_ref": batch.column("media_ref"),
            "height": pa.array(height),
            "width": pa.array(width),
            "mean_intensity": pa.array(np.floor(mean * 1e6 + 1e-3) / 1e6),
            "std_intensity": pa.array(np.floor(std * 1e6 + 1e-3) / 1e6),
            "ink_ratio": pa.array(np.floor(ink_ratio * 1e6 + 1e-3) / 1e6),
            "thumb_hash": pa.array(thumb_hash),
            "error": pa.array(error),
            "success": pa.array(success),
        }
        for name in batch.column_names:
            if name != "media_ref":
                cols[name] = batch.column(name)
        return pa.table(cols)


def q_media_features(sf_dir: str) -> ray.data.Dataset:
    """Feature-extract every media span of the derived interleaved
    corpus — the image-pipeline plumbing demo over real Ray actors.
    Rows-only oracle."""
    import pyarrow.compute as pc

    from ..sources.derive import flat_to_interleaved
    from ..sources.readers import read_table
    from ..stages.classify import classify_and_explode

    flat = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = flat.map_batches(flat_to_interleaved, batch_format="pyarrow")
    spans = docs.map_batches(classify_and_explode, batch_format="pyarrow")
    media = spans.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")).select(
            ["doc_id", "offset", "media_ref"]
        ),
        batch_format="pyarrow",
    )
    from ..functions.cluster import media_pool_size

    feats = media.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=256, concurrency=media_pool_size(),
    )
    return feats.map_batches(
        lambda t: t.select(
            ["doc_id", "offset", "height", "width", "mean_intensity",
             "std_intensity", "ink_ratio", "thumb_hash", "success"]
        ),
        batch_format="pyarrow",
    )


def q_media_features_geometry(sf_dir: str) -> ray.data.Dataset:
    """Value-oracled slice of ``q_media_features``: height/width, mean
    and std intensity, ink ratio.  Because the band codec is an exact
    function of the page text's UTF-8 bytes, the DuckDB oracle
    recomputes every value from byte/bit counts alone — including the
    CRC32 header (computed in SQL via a list_reduce-generated CRC
    table).  thumb_hash (bilinear resample) stays in the rows-only
    parent query."""
    feats = q_media_features(sf_dir)
    return feats.map_batches(
        lambda t: t.select(
            ["doc_id", "offset", "height", "width", "mean_intensity",
             "std_intensity", "ink_ratio", "success"]
        ),
        batch_format="pyarrow",
    )


# band-codec geometry model (fixtures/media.py): payload = utf-8 bytes
# of the chunk; header = magic 0xFF + 2-byte length + crc32(length +
# payload); image = ceil((7+len)/16) cell-rows of 16 bytes x 8 bit-cells
# of 4x4 px inside a 12 px margin; ink pixels = 16 x popcount(header +
# payload).
from ..sources.derive import DERIVED_SPANS_SQL as _SPANS_SQL  # noqa: E402

Q_MEDIA_GEOM_SQL = (
    _SPANS_SQL
    + """
, media AS (
  SELECT doc_id, k, chunk FROM spans WHERE is_media
), enc AS (
  SELECT doc_id, k,
         flatten(list_transform(
             list_transform(range(1, length(chunk)+1), i -> unicode(chunk[i])),
             cp -> CASE
               WHEN cp < 128 THEN [cp]
               WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
               WHEN cp < 65536 THEN
                 [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64]
               ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
                     128 + (cp // 64) % 64, 128 + cp % 64]
             END)) AS pb
  FROM media
), crctab AS (
  SELECT list_transform(range(0, 256), i ->
      list_reduce(list_prepend(CAST(i AS BIGINT), [0,0,0,0,0,0,0,0]),
        (c, x) -> CASE WHEN c % 2 = 1 THEN xor(3988292384, c // 2)
                       ELSE c // 2 END)) AS tab
), feat AS (
  SELECT e.doc_id, e.k, len(e.pb) AS L,
         xor(list_reduce(
               list_prepend(CAST(4294967295 AS BIGINT),
                 list_concat([(len(e.pb) // 256) % 256, len(e.pb) % 256], e.pb)),
               (c, x) -> xor(t.tab[(xor(c, x) % 256) + 1], c // 256)),
             4294967295) AS crc,
         8 + bit_count(CAST(len(e.pb) AS BIGINT))
           + CAST(list_sum(list_transform(e.pb, b -> bit_count(CAST(b AS BIGINT)))) AS BIGINT)
           AS bits_no_crc
  FROM enc e, crctab t
), geom AS (
  SELECT doc_id, k,
         CAST(CEIL((7 + L) / 16.0) AS INTEGER) * 4 + 24 AS height,
         536 AS width,
         (bits_no_crc + bit_count(crc)) * 16 AS ink_px
  FROM feat
)
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(k AS INTEGER) AS "offset",
       height, width,
       FLOOR(255.0 * (height * 536 - ink_px) / (height * 536) * 1000000 + 0.001)
         / 1000000 AS mean_intensity,
       FLOOR(255.0 * sqrt((CAST(ink_px AS DOUBLE) / (height * 536))
                          * (1 - CAST(ink_px AS DOUBLE) / (height * 536)))
             * 1000000 + 0.001) / 1000000 AS std_intensity,
       FLOOR(CAST(ink_px AS DOUBLE) / (height * 536) * 1000000 + 0.001)
         / 1000000 AS ink_ratio,
       TRUE AS success
FROM geom
"""
)


class LayoutAnalyzer:
    """Actor: media_ref -> binarized page -> layout regions
    (kernels/layout.py).  Page-region classification stage of the
    north rule; shares the warm-resolver actor pattern with OCR."""

    def __init__(self):
        from ..kernels import binarizer

        self.resolver = MediaResolver()
        self.binarize = binarizer.binarize

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.layout import analyze_layout

        refs = batch.column("media_ref").to_pylist()
        n = len(refs)
        n_lines = np.zeros(n, np.int32)
        n_seps = np.zeros(n, np.int32)
        n_noise = np.zeros(n, np.int32)
        ink_ratio = np.zeros(n, np.float64)
        success = np.ones(n, bool)
        for i, ref in enumerate(refs):
            try:
                img = self.resolver.resolve(ref)
                lay = analyze_layout(self.binarize(img))
                n_lines[i] = lay["n_text_lines"]
                n_seps[i] = lay["n_separators"]
                n_noise[i] = lay["n_noise"]
                ink_ratio[i] = np.floor(lay["ink_ratio"] * 1e6) / 1e6
            except Exception:
                success[i] = False
        cols = {name: batch.column(name) for name in batch.column_names}
        cols.update(
            n_text_lines=pa.array(n_lines),
            n_separators=pa.array(n_seps),
            n_noise=pa.array(n_noise),
            ink_ratio=pa.array(ink_ratio),
            success=pa.array(success),
        )
        return pa.table(cols)


def q_page_regions_check(sf_dir: str) -> ray.data.Dataset:
    """Value-oracled slice of ``q_page_regions``: text-line count,
    noise-component count and ink ratio, all recomputed by the DuckDB
    oracle from the band codec's BIT GRID alone —

    - a noise region is a connected component of area < 20 px; on a
      4 px-cell grid that is exactly ONE isolated cell, i.e. a 1-bit
      whose 8 bit-grid neighbours are 0 (verified cell-exact against
      the binarize+label pipeline on every sf0.01/sf0.1 media span);
    - the band body is vertically contiguous (UTF-8 bytes contain no
      NUL, so no 16-byte cell row is all-white) -> n_text_lines == 1;
    - ink ratio == ink-pixel count / page area, as in
      media_features_geometry.

    n_separators stays in the rows-only parent (an isolated-run
    derivation is possible but the pipeline's rotating-calipers
    components are pytest-covered instead)."""
    out = q_page_regions(sf_dir)
    return out.map_batches(
        lambda t: t.select(
            ["doc_id", "offset", "n_text_lines", "n_noise", "ink_ratio", "success"]
        ),
        batch_format="pyarrow",
    )


Q_PAGE_REGIONS_SQL = (
    _SPANS_SQL
    + """
, media AS (
  SELECT doc_id, k, chunk FROM spans WHERE is_media
), enc AS (
  SELECT doc_id, k,
         flatten(list_transform(
             list_transform(range(1, length(chunk)+1), i -> unicode(chunk[i])),
             cp -> CASE
               WHEN cp < 128 THEN [cp]
               WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
               WHEN cp < 65536 THEN
                 [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64]
               ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
                     128 + (cp // 64) % 64, 128 + cp % 64]
             END)) AS pb
  FROM media
), crctab AS (
  SELECT list_transform(range(0, 256), i ->
      list_reduce(list_prepend(CAST(i AS BIGINT), [0,0,0,0,0,0,0,0]),
        (c, x) -> CASE WHEN c % 2 = 1 THEN xor(3988292384, c // 2)
                       ELSE c // 2 END)) AS tab
), hdr AS (
  SELECT e.doc_id, e.k, e.pb, len(e.pb) AS L,
         xor(list_reduce(
               list_prepend(CAST(4294967295 AS BIGINT),
                 list_concat([(len(e.pb) // 256) % 256, len(e.pb) % 256], e.pb)),
               (c, x) -> xor(t.tab[(xor(c, x) % 256) + 1], c // 256)),
             4294967295) AS crc
  FROM enc e, crctab t
), grid AS (
  SELECT doc_id, k, L,
         CAST(CEIL((7 + L) / 16.0) AS INTEGER) AS nrows,
         flatten(list_transform(
             list_concat([255, (L // 256) % 256, L % 256,
                          (crc // 16777216) % 256, (crc // 65536) % 256,
                          (crc // 256) % 256, crc % 256], pb),
             b -> [b//128%2, b//64%2, b//32%2, b//16%2,
                   b//8%2, b//4%2, b//2%2, b%2])) AS bits0
  FROM hdr
), padded AS (
  SELECT doc_id, k, nrows, list_sum(bits0) AS ink_bits,
         list_concat(bits0,
             list_transform(range(0, nrows * 128 - len(bits0)), x -> 0)) AS g
  FROM grid
)
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(k AS INTEGER) AS "offset",
       CAST(1 AS INTEGER) AS n_text_lines,  -- band body is contiguous
       CAST(len(list_filter(range(0, nrows * 128), i ->
           g[i + 1] = 1
           AND (CASE WHEN i % 128 > 0 THEN g[i] ELSE 0 END) = 0
           AND (CASE WHEN i % 128 < 127 THEN g[i + 2] ELSE 0 END) = 0
           AND (CASE WHEN i >= 128 THEN g[i - 127] ELSE 0 END) = 0
           AND (CASE WHEN i >= 128 AND i % 128 > 0 THEN g[i - 128] ELSE 0 END) = 0
           AND (CASE WHEN i >= 128 AND i % 128 < 127 THEN g[i - 126] ELSE 0 END) = 0
           AND (CASE WHEN i < (nrows - 1) * 128 THEN g[i + 129] ELSE 0 END) = 0
           AND (CASE WHEN i < (nrows - 1) * 128 AND i % 128 > 0 THEN g[i + 128] ELSE 0 END) = 0
           AND (CASE WHEN i < (nrows - 1) * 128 AND i % 128 < 127 THEN g[i + 130] ELSE 0 END) = 0
       )) AS INTEGER) AS n_noise,
       FLOOR(CAST(ink_bits * 16 AS DOUBLE)
             / ((nrows * 4 + 24) * 536) * 1000000) / 1000000 AS ink_ratio,
       TRUE AS success
FROM padded
"""
)


def q_page_regions(sf_dir: str) -> ray.data.Dataset:
    """Layout analysis over every media span of the derived corpus.
    Rows-only oracle (geometry heuristics are not SQL-expressible)."""
    import pyarrow.compute as pc

    from ..sources.derive import flat_to_interleaved
    from ..sources.readers import read_table
    from ..stages.classify import classify_and_explode

    flat = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = flat.map_batches(flat_to_interleaved, batch_format="pyarrow")
    spans = docs.map_batches(classify_and_explode, batch_format="pyarrow")
    media = spans.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")).select(
            ["doc_id", "offset", "media_ref"]
        ),
        batch_format="pyarrow",
    )
    from ..functions.cluster import media_pool_size

    out = media.map_batches(
        LayoutAnalyzer, batch_format="pyarrow", batch_size=256,
        concurrency=media_pool_size(),
    )
    return out.map_batches(
        lambda t: t.select(
            ["doc_id", "offset", "n_text_lines", "n_separators", "n_noise",
             "ink_ratio", "success"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Audio: window plan (SQL-matched) + feature-extraction actor stage
# ---------------------------------------------------------------------------

def q_audio_window_plan(
    sf_dir: str, frame_ms: int = 25, hop_ms: int = 10
) -> ray.data.Dataset:
    """Deterministic STFT-style framing plan for audio payloads: each
    document models an audio clip (duration_ms = n_chars * 10, the
    deterministic-metadata convention of q_frame_sample_plan) and emits
    one row per 25 ms analysis window at a 10 ms hop — the plan half of
    the audio path (real decode lives in sources/wavcodec.py; compressed
    formats are the documented stub).  SQL-matched via generate_series:
    window k exists while k*hop + frame <= duration."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def plan(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64) * 10
        counts = np.maximum(0, (dur - frame_ms) // hop_ms + 1)
        rep_doc = np.repeat(doc, counts)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        k = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "doc_id": pa.array(rep_doc),
                "window_idx": pa.array(k),
                "start_ms": pa.array(k * hop_ms),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)


Q_AUDIO_PLAN_SQL = """
SELECT d.doc_id,
       CAST(gs.k AS BIGINT) AS window_idx,
       CAST(gs.k * 10 AS BIGINT) AS start_ms
FROM documents d,
     LATERAL (SELECT UNNEST(generate_series(0,
                  (d.n_chars * 10 - 25) // 10)) AS k) gs
WHERE d.n_chars * 10 >= 25
"""


class AudioFeatureExtractor:
    """Actor-pool stage: ``audio_ref`` (a ``.wav`` path or
    ``file://`` ref) -> per-clip frame features — RMS energy and
    zero-crossing rate over 25 ms / 10 ms windows, fully vectorized
    (strided framing, no python loop over frames).  Stereo is
    downmixed; decode errors become error ROWS (the extract stage's
    policy).  The mel/model half of a real audio pipeline would slot in
    after the framing exactly like the OCR engine does after
    preprocess."""

    def __init__(self, frame_ms: int = 25, hop_ms: int = 10):
        self.frame_ms = frame_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.wavcodec import frame_signal, wav_decode

        refs = batch["audio_ref"].to_pylist()
        out = {
            "audio_ref": refs,
            "sample_rate": np.zeros(len(refs), np.int64),
            "n_samples": np.zeros(len(refs), np.int64),
            "n_windows": np.zeros(len(refs), np.int64),
            "rms_mean": np.zeros(len(refs), np.float64),
            "zcr_mean": np.zeros(len(refs), np.float64),
            "error": [""] * len(refs),
        }
        for i, ref in enumerate(refs):
            try:
                path = ref[7:] if ref.startswith("file://") else ref
                with open(path, "rb") as f:
                    x, rate = wav_decode(f.read())
                if x.ndim == 2:
                    x = x.mean(axis=1)
                frame = max(1, rate * self.frame_ms // 1000)
                hop = max(1, rate * self.hop_ms // 1000)
                fr = frame_signal(np.ascontiguousarray(x), frame, hop)
                out["sample_rate"][i] = rate
                out["n_samples"][i] = x.size
                out["n_windows"][i] = fr.shape[0]
                if fr.shape[0]:
                    rms = np.sqrt((fr.astype(np.float64) ** 2).mean(axis=1))
                    zc = (np.diff(np.signbit(fr), axis=1) != 0).sum(axis=1)
                    out["rms_mean"][i] = float(rms.mean())
                    out["zcr_mean"][i] = float((zc / (fr.shape[1] - 1)).mean())
            except Exception as e:
                out["error"][i] = f"{type(e).__name__}: {e}"
        return pa.table(
            {
                "audio_ref": pa.array(out["audio_ref"], pa.string()),
                "sample_rate": pa.array(out["sample_rate"]),
                "n_samples": pa.array(out["n_samples"]),
                "n_windows": pa.array(out["n_windows"]),
                "rms_mean": pa.array(out["rms_mean"]),
                "zcr_mean": pa.array(out["zcr_mean"]),
                "error": pa.array(out["error"], pa.string()),
            }
        )


def extract_audio_features(
    ds: ray.data.Dataset, concurrency: int | None = None, batch_size: int = 64
) -> ray.data.Dataset:
    """Audio-ref table -> per-clip features via the actor pool.
    ``concurrency=None`` derives the pool width from the cluster."""
    if concurrency is None:
        from ..functions.cluster import media_pool_size

        concurrency = media_pool_size()
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Image perceptual-hash near-dup (pHash: 32x32 DCT -> 64-bit sketch)
# ---------------------------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the pHash transform; cv2.dct analog)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0] /= np.sqrt(2.0)
    return d


def phash64(img: np.ndarray, dct: np.ndarray) -> np.uint64:
    """Classic pHash: grayscale -> 32x32 -> 2-D DCT -> low-frequency
    8x8 block -> bit per coefficient above the block median."""
    small = resize_bilinear(img, 32, 32).astype(np.float64)
    coef = (dct @ small @ dct.T)[:8, :8].reshape(-1)
    bits = coef > np.median(coef)
    return np.uint64(np.packbits(bits).view(">u8")[0])


class PHashExtractor:
    """Actor: media_ref -> 64-bit perceptual hash.  Resolver + DCT basis
    built once per actor; decode failures become error rows."""

    def __init__(self):
        self.resolver = MediaResolver()
        self.dct = _dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        n = len(refs)
        ph = np.zeros(n, np.uint64)
        ok = np.ones(n, bool)
        for i, ref in enumerate(refs):
            try:
                img = self.resolver.resolve(ref)
                if img.ndim == 3:
                    img = img.mean(axis=2).astype(np.uint8)
                ph[i] = phash64(img, self.dct)
            except Exception:
                ok[i] = False
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["phash"] = pa.array(ph.view(np.int64))
        cols["success"] = pa.array(ok)
        return pa.table(cols)


_SPAN_OFF_BITS = 12  # span offsets are chunk indices, far below 4096


def _media_spans(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..sources.derive import flat_to_interleaved
    from ..sources.readers import read_table
    from ..stages.classify import classify_and_explode

    flat = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = flat.map_batches(flat_to_interleaved, batch_format="pyarrow")
    spans = docs.map_batches(classify_and_explode, batch_format="pyarrow")
    return spans.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")).select(
            ["doc_id", "offset", "media_ref"]
        ),
        batch_format="pyarrow",
    )


def q_image_phash_neardup(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-duplicate IMAGES by perceptual hash: every media span is
    pHashed (actor pool), then the SimHash machinery finds all pairs at
    hamming <= 3 exactly (4 x 16-bit bands, pigeonhole).  Identical
    payloads get identical pHashes, near-identical renders land within
    a few bits — the image-side analog of the text near-dup family.

    Rows-only for the driver (a 32x32 DCT is not expressible in SQL);
    accuracy is gated by ``q_image_phash_check`` (exact-duplicate
    payload pairs MUST be found at hamming 0, count value-oracled) and
    a planted-perturbation pytest.  Scale shape: the band shuffle moves
    (band_key, span_id, phash) = 24 B/row x 4 bands, never pixels;
    bucket pair generation is slab-bounded (dedup._iter_pair_slabs)."""
    from ray.data.aggregate import Min

    from ..functions.cluster import derive_buckets, media_pool_size
    from .dedup import _iter_pair_slabs, _popcount64

    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()
    feats = _media_spans(sf_dir).map_batches(
        PHashExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=media_pool_size(),
    )

    def to_bands(t: pa.Table) -> pa.Table:
        t = t.filter(t["success"])
        docnum = pa.compute.cast(
            pa.compute.utf8_slice_codeunits(t["doc_id"], 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)
        off = t["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        span_id = (docnum << _SPAN_OFF_BITS) | off
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(span_id)
        band_key = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            band_key[b * n : (b + 1) * n] = (
                ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                + (b << 16)
            )
        return pa.table(
            {
                "band_key": pa.array(band_key),
                "bucket": pa.array((band_key % nb).astype(np.int32)),
                "span_id": pa.array(np.tile(span_id, 4)),
                "phash": pa.array(np.tile(ph.astype(np.int64), 4)),
            }
        )

    bands = feats.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["span_id"].to_numpy(zero_copy_only=False)
        hs = g["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, keys))
        k, v, h = keys[order], ids[order], hs[order]
        starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
        ends = np.concatenate([starts[1:], [k.size]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            for ii, jj in _iter_pair_slabs(m):
                ham = _popcount64(np.bitwise_xor(h[s:e][ii], h[s:e][jj]))
                keep = ham <= max_hamming
                out_a.append(v[s:e][ii][keep])
                out_b.append(v[s:e][jj][keep])
                out_h.append(ham[keep])
        if out_a:
            a = np.concatenate(out_a).astype(np.int64)
            b = np.concatenate(out_b).astype(np.int64)
            hm = np.concatenate(out_h).astype(np.int64)
            keep = a != b
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            a, b, hm = lo[keep], hi[keep], hm[keep]
        else:
            a = b = hm = np.empty(0, np.int64)
        return pa.table(
            {"span_a": pa.array(a), "span_b": pa.array(b), "hamming": pa.array(hm)}
        )

    cand = bands.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    uniq = cand.groupby(["span_a", "span_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )

    out_schema = pa.schema(
        [
            ("doc_a", pa.string()),
            ("off_a", pa.int64()),
            ("doc_b", pa.string()),
            ("off_b", pa.int64()),
            ("hamming", pa.int64()),
        ]
    )
    mask = np.int64((1 << _SPAN_OFF_BITS) - 1)

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "span_a" not in t.column_names:
            return out_schema.empty_table()
        a = t["span_a"].to_numpy(zero_copy_only=False)
        b = t["span_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_a": pa.array(
                    ["doc-%d" % x for x in (a >> _SPAN_OFF_BITS)], pa.string()
                ),
                "off_a": pa.array(a & mask),
                "doc_b": pa.array(
                    ["doc-%d" % x for x in (b >> _SPAN_OFF_BITS)], pa.string()
                ),
                "off_b": pa.array(b & mask),
                "hamming": t["hamming"],
            },
            schema=out_schema,
        )

    result = uniq.map_batches(unpack, batch_format="pyarrow").materialize()
    if result.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    return result


def _pair_intersection_count(
    expected: "ray.data.Dataset", reported: "ray.data.Dataset"
) -> tuple:
    """(|expected|, |expected ∩ reported|) over (pair_a, pair_b) int64
    pair datasets, computed distributed: tag each side, one
    groupby(pair) count, per-batch partials of ``count == 2`` — a pair
    appears at most once per side, so a 2-count means both sides have
    it.  Nothing but (a, b, tag) rows ever move; no driver pull."""
    from ray.data.aggregate import Count, Sum

    def tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array(np.full(t.num_rows, v, np.int64)))

        return f

    both = expected.map_batches(tag(0), batch_format="pyarrow").union(
        reported.map_batches(tag(1), batch_format="pyarrow")
    )
    counts = both.groupby(["pair_a", "pair_b"]).aggregate(
        Count(alias_name="n_sides"), Sum("side", alias_name="side_sum")
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_sides" not in t.column_names:
            return pa.table({"exp": pa.array([0], pa.int64()),
                             "hit": pa.array([0], pa.int64())})
        ns = t["n_sides"].to_numpy(zero_copy_only=False)
        ss = t["side_sum"].to_numpy(zero_copy_only=False)
        # expected rows are every group containing a side-0 row
        exp = int(np.count_nonzero(ss < ns))
        hit = int(np.count_nonzero(ns == 2))
        return pa.table({"exp": pa.array([exp], pa.int64()),
                         "hit": pa.array([hit], pa.int64())})

    agg = counts.map_batches(partial, batch_format="pyarrow").sum(["exp", "hit"])
    if not agg:  # no dup pairs and nothing reported
        return 0, 0
    return int(agg["sum(exp)"]), int(agg["sum(hit)"])


_PAIR_SCHEMA = pa.schema([("pair_a", pa.int64()), ("pair_b", pa.int64())])


def _emit_pairs_segmented(key_codes: np.ndarray, ids: np.ndarray) -> pa.Table:
    """All within-key id pairs for a bucket group: ONE lexsort, then
    pair generation only over runs with >= 2 members (the python loop
    is bounded by the number of DUP GROUPS in the bucket, not by key
    count — singleton keys never enter it).  Output size == the true
    dup-pair count, the same volume the gate is counting."""
    order = np.lexsort((ids, key_codes))
    k, v = key_codes[order], ids[order].astype(np.int64)
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    ends = np.concatenate([starts[1:], [k.size]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, k=1)
        out_a.append(v[s:e][ii])
        out_b.append(v[s:e][jj])
    if not out_a:
        return _PAIR_SCHEMA.empty_table()
    return pa.table(
        {
            "pair_a": pa.array(np.concatenate(out_a)),
            "pair_b": pa.array(np.concatenate(out_b)),
        },
        schema=_PAIR_SCHEMA,
    )


def _dict_codes(col) -> np.ndarray:
    enc = col.dictionary_encode()
    enc = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def q_image_phash_check(sf_dir: str) -> pa.Table:
    """Value-oracled accuracy gate for the pHash near-dup: media spans
    with byte-identical payloads MUST surface as **hamming-0** pairs.
    The exact-duplicate pair count is recomputed by the SQL oracle from
    the derived span chunks (media_ref is a pure function of the
    chunk), so a pHash/banding regression that loses exact dups fails
    the hash-match.

    Fully distributed: expected pairs come from a
    ``groupby(media_ref)`` pair-emit (output-sized, the same volume as
    the dup pairs themselves), reported hamming-0 pairs are re-keyed to
    span ids, and the intersection is one tagged groupby + count
    partials — no full-table ``to_pandas`` on the driver."""
    import pyarrow.compute as pc

    spans = _media_spans(sf_dir)

    def with_span_id(t: pa.Table) -> pa.Table:
        docnum = pc.cast(
            pc.utf8_slice_codeunits(t["doc_id"], 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)
        off = t["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "media_ref": t["media_ref"],
                "span_id": pa.array((docnum << _SPAN_OFF_BITS) | off),
            }
        )

    from ..functions.segments import bucket_grouped_str

    expected = bucket_grouped_str(
        spans.map_batches(with_span_id, batch_format="pyarrow"), "media_ref"
    ).map_groups(
        lambda g: _emit_pairs_segmented(
            _dict_codes(g["media_ref"].combine_chunks()),
            g["span_id"].to_numpy(zero_copy_only=False),
        ),
        batch_format="pyarrow",
    )

    zero_schema = pa.schema([("pair_a", pa.int64()), ("pair_b", pa.int64())])

    def rekey_zero(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "hamming" not in t.column_names:
            return zero_schema.empty_table()
        t = t.filter(pc.equal(t["hamming"], 0))
        da = pc.cast(
            pc.utf8_slice_codeunits(t["doc_a"], 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)
        db = pc.cast(
            pc.utf8_slice_codeunits(t["doc_b"], 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)
        a = (da << _SPAN_OFF_BITS) | t["off_a"].to_numpy(zero_copy_only=False)
        b = (db << _SPAN_OFF_BITS) | t["off_b"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"pair_a": pa.array(lo.astype(np.int64)),
             "pair_b": pa.array(hi.astype(np.int64))},
            schema=zero_schema,
        )

    reported = q_image_phash_neardup(sf_dir).map_batches(
        rekey_zero, batch_format="pyarrow"
    )
    n_exact, found = _pair_intersection_count(expected, reported)
    return pa.table(
        {
            "n_exact_dup_pairs": pa.array([n_exact], pa.int64()),
            "exact_dups_found": pa.array([found == n_exact], pa.bool_()),
        }
    )


from ..sources.derive import DERIVED_SPANS_SQL as _SPANS_SQL2  # noqa: E402

Q_IMAGE_PHASH_CHECK_SQL = (
    _SPANS_SQL2
    + """
SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS n_exact_dup_pairs,
       TRUE AS exact_dups_found
FROM (SELECT chunk, COUNT(*) AS c FROM spans WHERE is_media GROUP BY chunk)
WHERE c > 1
"""
)


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (energy-contour signature over real WAV)
# ---------------------------------------------------------------------------

def synth_audio_for_doc(text: str, rate: int = 8000) -> bytes:
    """Deterministic synthetic WAV for a document (the audio analog of
    the band-codec page renderer): each codepoint contributes 20 ms of
    a tone whose amplitude/frequency derive from the codepoint, so
    byte-identical text ⇒ byte-identical clip and near-identical text
    ⇒ clips differing in a few tone segments."""
    from ..sources.wavcodec import wav_encode

    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if cps.size == 0:
        cps = np.array([32], dtype=np.uint32)
    seg = rate // 50  # 20 ms per char
    n = cps.size * seg
    t = np.arange(n, dtype=np.float64)
    freq = 200.0 + (np.repeat(cps, seg) % np.uint32(64)).astype(np.float64) * 40.0
    amp = 6000.0 + (np.repeat(cps, seg) % np.uint32(17)).astype(np.float64) * 1000.0
    x = (amp * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
    return wav_encode(x, rate)


class AudioFingerprinter:
    """Actor: doc text -> synth WAV -> decode -> 25/10 ms framing ->
    64-window energy contour -> 64-bit signature (bit = window RMS
    above the clip median).  The signature is computed from the DECODED
    samples through the real codec path, not from the text."""

    def __init__(self):
        from ..sources.wavcodec import frame_signal, wav_decode

        self._decode = wav_decode
        self._frame = frame_signal

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        sig = np.zeros(n, np.uint64)
        ok = np.ones(n, bool)
        for i, txt in enumerate(texts):
            try:
                x, rate = self._decode(synth_audio_for_doc(txt))
                frame = rate * 25 // 1000
                hop = rate * 10 // 1000
                fr = self._frame(np.ascontiguousarray(x), frame, hop)
                rms = np.sqrt((fr.astype(np.float64) ** 2).mean(axis=1))
                # 64 equal time bins over the contour
                bins = np.array_split(rms, 64)
                means = np.array([b.mean() if b.size else 0.0 for b in bins])
                bits = (means > np.median(means)).astype(np.uint8)
                sig[i] = np.uint64(np.packbits(bits).view(">u8")[0])
            except Exception:
                ok[i] = False
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(sig.view(np.int64)),
                "success": pa.array(ok),
            }
        )


def q_audio_fingerprint_neardup(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-duplicate AUDIO clips by energy-contour fingerprint: every
    doc renders to a synthetic WAV (deterministic synth — the container
    ships no audio corpora), the fingerprint travels the REAL decode →
    frame → RMS path, and the SimHash band machinery finds all pairs at
    hamming <= 3 exactly.  Completes the text/image/audio dedup
    triangle.  Rows-only (a WAV DSP chain is not SQL); gated by
    ``q_audio_fingerprint_check`` (exact-dup texts must pair at
    hamming 0; pair count recomputed by DuckDB) plus a perturbation
    pytest."""
    from ray.data.aggregate import Min

    from ..functions.cluster import derive_buckets, media_pool_size
    from ..sources.readers import read_table
    from .dedup import _iter_pair_slabs, _popcount64

    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    feats = ds.map_batches(
        # pool width derived from cluster CPUs with a floor of 2: a
        # pool holding every CPU of a 4-CPU test session starves the
        # downstream groupby (observed hang) — see media_pool_size
        AudioFingerprinter, batch_format="pyarrow", batch_size=128,
        concurrency=media_pool_size(),
    )

    def to_bands(t: pa.Table) -> pa.Table:
        t = t.filter(t["success"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sg = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = ids.size
        band_key = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            band_key[b * n : (b + 1) * n] = (
                ((sg >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                + (b << 16)
            )
        return pa.table(
            {
                "band_key": pa.array(band_key),
                "bucket": pa.array((band_key % nb).astype(np.int32)),
                "doc_id": pa.array(np.tile(ids, 4)),
                "sig": pa.array(np.tile(sg.astype(np.int64), 4)),
            }
        )

    bands = feats.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = g["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, keys))
        k, v, h = keys[order], ids[order], hs[order]
        starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
        ends = np.concatenate([starts[1:], [k.size]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            for ii, jj in _iter_pair_slabs(m):
                ham = _popcount64(np.bitwise_xor(h[s:e][ii], h[s:e][jj]))
                keep = ham <= max_hamming
                out_a.append(v[s:e][ii][keep])
                out_b.append(v[s:e][jj][keep])
                out_h.append(ham[keep])
        if out_a:
            a = np.concatenate(out_a).astype(np.int64)
            b = np.concatenate(out_b).astype(np.int64)
            hm = np.concatenate(out_h).astype(np.int64)
            keep = a != b
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            a, b, hm = lo[keep], hi[keep], hm[keep]
        else:
            a = b = hm = np.empty(0, np.int64)
        return pa.table(
            {"doc_a": pa.array(a), "doc_b": pa.array(b), "hamming": pa.array(hm)}
        )

    cand = bands.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    uniq = cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )

    def pin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return out_schema.empty_table()
        return pa.table(
            {f.name: pa.compute.cast(t[f.name], f.type) for f in out_schema},
            schema=out_schema,
        )

    result = uniq.map_batches(pin, batch_format="pyarrow").materialize()
    if result.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    return result


def q_audio_fingerprint_check(sf_dir: str) -> pa.Table:
    """Value-oracled gate: docs with byte-identical text render to
    byte-identical clips and MUST pair at hamming 0; the exact-dup pair
    count is recomputed by DuckDB from the raw texts.

    Distributed like ``q_image_phash_check``: one ``groupby(text)``
    pair-emit for the expected side (one shuffle keyed on text, the
    dedup_exact shape), the reported hamming-0 pairs re-keyed, and a
    tagged-groupby intersection count — no driver ``to_pandas``."""
    import pyarrow.compute as pc

    from ..sources.readers import read_table

    from ..functions.segments import bucket_grouped_str

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    expected = bucket_grouped_str(docs, "text").map_groups(
        lambda g: _emit_pairs_segmented(
            _dict_codes(g["text"].combine_chunks()),
            g["doc_id"].to_numpy(zero_copy_only=False),
        ),
        batch_format="pyarrow",
    )

    zero_schema = pa.schema([("pair_a", pa.int64()), ("pair_b", pa.int64())])

    def rekey_zero(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "hamming" not in t.column_names:
            return zero_schema.empty_table()
        t = t.filter(pc.equal(t["hamming"], 0))
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"pair_a": pa.array(lo), "pair_b": pa.array(hi)}, schema=zero_schema
        )

    reported = q_audio_fingerprint_neardup(sf_dir).map_batches(
        rekey_zero, batch_format="pyarrow"
    )
    n_exact, found = _pair_intersection_count(expected, reported)
    return pa.table(
        {
            "n_exact_dup_pairs": pa.array([n_exact], pa.int64()),
            "exact_dups_found": pa.array([found == n_exact], pa.bool_()),
        }
    )


Q_AUDIO_FP_CHECK_SQL = """
SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS n_exact_dup_pairs,
       TRUE AS exact_dups_found
FROM (SELECT text, COUNT(*) AS c FROM documents GROUP BY text)
WHERE c > 1
"""


# ---------------------------------------------------------------------------
# Video scene-change detection (frame-delta thresholding)
# ---------------------------------------------------------------------------

def q_scene_changes(sf_dir: str, threshold: int = 64) -> ray.data.Dataset:
    """Scene-change detection over each document's modeled video: one
    luma sample per frame (deterministic synth from the doc's
    codepoints — frame DECODE stays the documented multimodal stub, the
    per-frame metadata convention of ``q_frame_sample_plan``), a cut
    wherever the frame-to-frame luma delta reaches ``threshold``.

    The detection math — flat frame stream, one vectorized diff with
    row-boundary masks, no per-video python — is the real scale
    surface; at 100 TB the same map runs on decoded luma instead of
    synth.  Emits (doc_id, frame_idx) per cut; value-oracled (the synth
    and the delta rule are exact integer math in SQL)."""
    from ..functions.text import utf8_codepoints
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    out_schema = pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int64())])

    def detect(t: pa.Table) -> pa.Table:
        cps, rows = utf8_codepoints(t["text"].combine_chunks())
        doc_np = t["doc_id"].to_numpy(zero_copy_only=False)
        nf = cps.size
        if nf == 0:
            return out_schema.empty_table()
        n_per = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        pos = np.arange(nf, dtype=np.int64) - starts[rows]
        luma = (cps.astype(np.int64) * 37 + pos) % 256
        cut = np.zeros(nf, dtype=bool)
        cut[1:] = (np.abs(np.diff(luma)) >= threshold) & (rows[1:] == rows[:-1])
        idx = np.flatnonzero(cut)
        return pa.table(
            {
                "doc_id": pa.array(doc_np[rows[idx]].astype(np.int64)),
                "frame_idx": pa.array(pos[idx]),
            },
            schema=out_schema,
        )

    return ds.map_batches(detect, batch_format="pyarrow", zero_copy_batch=True)


def q_avi_scene_changes(sf_dir: str, threshold: int = 64) -> ray.data.Dataset:
    """Scene-change detection through the REAL video container path.

    Each document's modeled video (one frame per codepoint, the
    ``q_scene_changes`` luma convention) is encoded as an actual AVI
    file — RIFF headers, stream header, 8-bit-palette DIB frames,
    idx1 — and decoded back with ``sources/avicodec.py`` before
    detection, so the bytes the detector sees went through the same
    container parse a stored ``.avi`` payload would (the video analog
    of the band-codec image gates; DIB is lossless, so the decoded
    luma is bit-exact and the whole path stays value-oracled by the
    same SQL as ``q_scene_changes``).

    Scale shape: encode/decode is per-payload work inside the batch
    function (the image-codec convention — media never leaves its
    batch); detection is one vectorized diff over the flat decoded
    frame stream with row-boundary masks.  At 100 TB the encode half
    disappears (payloads come from storage) and the decode+detect map
    is unchanged."""
    from ..functions.text import utf8_codepoints
    from ..sources.avicodec import avi_decode, encode_luma_video
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    out_schema = pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int64())])

    def roundtrip_detect(t: pa.Table) -> pa.Table:
        cps, rows = utf8_codepoints(t["text"].combine_chunks())
        doc_np = t["doc_id"].to_numpy(zero_copy_only=False)
        if cps.size == 0:
            return out_schema.empty_table()
        n_per = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        pos = np.arange(cps.size, dtype=np.int64) - starts[rows]
        luma_in = ((cps.astype(np.int64) * 37 + pos) % 256).astype(np.uint8)
        decoded = np.empty_like(luma_in)
        for r in range(t.num_rows):  # container framing is per-payload
            if n_per[r] == 0:
                continue
            sl = slice(starts[r], starts[r] + n_per[r])
            frames, _fps = avi_decode(encode_luma_video(luma_in[sl], side=4))
            decoded[sl] = frames[:, 0, 0]
        luma = decoded.astype(np.int64)
        cut = np.zeros(cps.size, dtype=bool)
        cut[1:] = (np.abs(np.diff(luma)) >= threshold) & (rows[1:] == rows[:-1])
        idx = np.flatnonzero(cut)
        return pa.table(
            {
                "doc_id": pa.array(doc_np[rows[idx]].astype(np.int64)),
                "frame_idx": pa.array(pos[idx]),
            },
            schema=out_schema,
        )

    return ds.map_batches(
        roundtrip_detect, batch_format="pyarrow", zero_copy_batch=True
    )


Q_SCENE_CHANGES_SQL = """
WITH cps AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(1, length(text)+1),
                        i -> (unicode(text[i]) * 37 + (i - 1)) % 256) AS luma
  FROM documents
)
SELECT doc_id, CAST(UNNEST(list_filter(range(1, n),
                    k -> abs(luma[k+1] - luma[k]) >= 64)) AS BIGINT) AS frame_idx
FROM cps WHERE n > 1
"""

# the AVI round trip is lossless (8-bit DIB), so the container-path
# pipeline is value-oracled by the identical SQL
Q_AVI_SCENE_CHANGES_SQL = Q_SCENE_CHANGES_SQL
