"""The flagship pipeline: interleaved documents -> extracted documents.

Ray-Data-first composition (SURVEY.md §7.1 steps 3-6):

    read (Lance/Parquet)
      -> map_batches(classify_and_explode, pyarrow, zero-copy)   [stateless]
      -> map_batches(SpanExtractor, actor pool, warm OCR state)  [stateful]
      -> groupby("doc_id") -> reassemble (per-group offset sort) [the shuffle]

The streaming executor pipelines the stages with backpressure; nothing
materializes the full dataset.  Scale knobs:

- ``ocr_batch_size`` — spans per extractor call; page images are
  resolved inside the actor, so a batch holds at most
  ``batch_size`` decoded pages at once (media pages ~100 KB here;
  300-DPI A4 would be ~25 MB -> drop batch size accordingly).
- ``ocr_concurrency`` / ``num_cpus`` — actor-pool sizing; leave
  headroom for the read and shuffle stages.
- ``repartition_blocks`` — post-explode repartition to balance blocks
  when input files are few/skewed.  Default (None) derives it from the
  cluster CPU count: Ray fuses the explode (task pool) into the OCR
  actor pool, capping in-flight tasks at the upstream block count, so
  a single-file read (~16 blocks) would starve a 24-actor pool AND a
  giant document's spans would serialize on one actor.  Pass 0 to
  disable explicitly.
"""

from __future__ import annotations

import ray
import ray.data

from ..stages.classify import classify_and_explode
from ..stages.extract import SpanExtractor
from ..stages.reassemble import reassemble_table


def _default_repartition_blocks() -> int:
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    # ~8 tasks per actor at the tuned 7/8-of-CPUs pool ratio: enough
    # granularity to damp straggler tails without per-task overhead
    return max(16, ncpu * 7)


def _default_ocr_concurrency() -> int:
    """Pool width when the caller does not size it: 7/8 of the cluster
    CPUs (the bench-tuned ratio — the extractor dominates the pipeline,
    the remaining 1/8 feeds the read/classify tasks and the reassembly
    shuffle), floor 2.  A fixed default of 4 was right nowhere except a
    small box: it oversubscribed a 4-CPU session and capped a wide
    cluster.  Text-dominant callers should still pass a smaller pool
    (see ``extraction_query.q_extract_documents``)."""
    from ..functions.cluster import cluster_cpus

    return max(2, (cluster_cpus() * 7) // 8)


def extract_spans(
    ds: ray.data.Dataset,
    *,
    engine: str | None = None,
    language: str = "eng",
    preprocess: bool = True,
    document_type: str = "general",
    ocr_concurrency: int | tuple[int, int] | None = None,
    ocr_batch_size: int = 256,
    num_cpus: float = 1,
    repartition_blocks: int | None = None,
    keep_words: bool = False,
) -> ray.data.Dataset:
    """Documents -> extracted span rows (before reassembly)."""
    if ocr_concurrency is None:
        ocr_concurrency = _default_ocr_concurrency()
    ds = ds.map_batches(
        classify_and_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    if repartition_blocks is None:
        repartition_blocks = _default_repartition_blocks()
    if repartition_blocks:
        ds = ds.repartition(repartition_blocks)
    return ds.map_batches(
        SpanExtractor,
        fn_constructor_kwargs={
            "engine": engine,
            "language": language,
            "preprocess": preprocess,
            "document_type": document_type,
            "keep_words": keep_words,
        },
        batch_format="pyarrow",
        batch_size=ocr_batch_size,
        concurrency=ocr_concurrency,
        num_cpus=num_cpus,
    )


def extract_documents(
    ds: ray.data.Dataset,
    *,
    engine: str | None = None,
    language: str = "eng",
    preprocess: bool = True,
    document_type: str = "general",
    ocr_concurrency: int | tuple[int, int] | None = None,
    ocr_batch_size: int = 256,
    num_cpus: float = 1,
    repartition_blocks: int | None = None,
    include_pages: bool = False,
) -> ray.data.Dataset:
    """Full extraction: documents in, reassembled document results out.

    ``include_pages=True`` additionally emits the reference's full
    ``pages[].words[].bbox`` tree (golden-output shape,
    storage/json_tasks/task_1.json) — opt-in because the nested word
    boxes inflate the reassembly shuffle.
    """
    rows = extract_spans(
        ds,
        engine=engine,
        language=language,
        preprocess=preprocess,
        document_type=document_type,
        ocr_concurrency=ocr_concurrency,
        ocr_batch_size=ocr_batch_size,
        num_cpus=num_cpus,
        repartition_blocks=repartition_blocks,
        keep_words=include_pages,
    )
    if include_pages:
        fn = lambda t: reassemble_table(t, include_pages=True)  # noqa: E731
    else:
        fn = reassemble_table
    # coarse-bucket the reassembly shuffle: ``groupby("doc_id")`` would
    # invoke reassemble_table once per DOCUMENT (one python call +
    # format conversion each — 10^8 calls at corpus scale).  The kernel
    # is segment-safe (handles any number of complete groups), so key
    # the shuffle on hash(doc_id) % (7*CPUs) instead: bounded calls,
    # same per-doc results, and each bucket still fits a worker.
    from ..functions.segments import bucket_grouped_str

    nbuckets = repartition_blocks or _default_repartition_blocks()
    return bucket_grouped_str(rows, "doc_id", nbuckets).map_groups(
        fn, batch_format="pyarrow"
    )
