"""Fault-injection: the flagship pipeline must survive worker loss.

The reference has no retry story at all (SURVEY §4: per-page failure ->
error row, request failure -> 500); the engine's contract is that
DETERMINISTIC span failures become error rows while INFRASTRUCTURE
faults (worker OOM-kill, node loss) are absorbed by Ray's lineage-based
task retry + actor restart — the run completes with byte-identical
results, no partial output, no dropped documents."""

import os

import pytest
import ray.data

from medical_and_charity_document_extraction_system_ray.fixtures import (
    write_documents_parquet,
)
from medical_and_charity_document_extraction_system_ray.oracle import extract_table
import medical_and_charity_document_extraction_system_ray.pipelines.extraction as px
from medical_and_charity_document_extraction_system_ray.pipelines import (
    extract_documents,
)
from medical_and_charity_document_extraction_system_ray.stages.extract import (
    SpanExtractor,
)


def test_actor_death_mid_batch_recovers_exactly(ray_session, tmp_path):
    """Kill one extractor actor's process mid-batch (os._exit — the
    OOM-killer shape, not a python exception): Ray Data restarts the
    actor, replays the task from lineage, and the output still matches
    the document-at-a-time oracle span for span."""
    docs = str(tmp_path / "docs.parquet")
    write_documents_parquet(docs, 60, seed=11)
    marker = str(tmp_path / "died_once")

    class FlakyExtractor(SpanExtractor):
        def __call__(self, batch):
            if not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(1)  # simulated worker loss, NOT an exception
            return super().__call__(batch)

    orig = px.SpanExtractor
    px.SpanExtractor = FlakyExtractor
    try:
        out = extract_documents(
            ray.data.read_parquet(docs), ocr_concurrency=2, ocr_batch_size=16
        ).take_all()
    finally:
        px.SpanExtractor = orig

    assert os.path.exists(marker), "fault was never injected"
    import pyarrow.parquet as pq

    want = {
        d["doc_id"]: d for d in extract_table(pq.read_table(docs).to_pylist())
    }
    assert len(out) == 60
    for row in out:
        w = want[row["doc_id"]]
        assert [
            (s["kind"], s["text"], s["media_ref"]) for s in row["spans"]
        ] == [(s["kind"], s["text"], s["media_ref"]) for s in w["spans"]]
        assert row["total_characters"] == w["total_characters"]
        assert row["text"] == w["text"]
