"""Heavy-tail document-skew benchmark for the flagship extraction
pipeline (north rule: "explicit skew-aware repartitioning for
heavy-tailed document sizes").

Two corpora carry the SAME number of all-media spans (so every span
does one render+preprocess+OCR unit of work and the classifier sends
both corpora down the identical scanned path):

- ``uniform``:  500 docs x 32 spans;
- ``skewed``:   one 3,200-span mega-doc (20% of all spans — 100x the
  mean) + a power-law head [1600, 800, 400, 200, 100] + a small-doc
  tail, same 16,000-span total, same 500-doc count.

Per-span work is identical in distribution across corpora (noise
sigma / sentence length derive from the hashed media_ref, i.i.d.
across refs), so any throughput gap between the legs is the effect of
the size distribution alone.  Three legs:

1. uniform,            repartition_blocks = 7 x CPUs (production default)
2. skewed,             repartition_blocks = 7 x CPUs
3. skewed, NO explode-repartition (repartition_blocks=0) — the
   anti-pattern control: the mega-doc's span block stays fused into
   one actor task and serializes the pool.

Evidence target: leg 2 ~= leg 1 (skew absorbed by the span-level
rebalance), leg 3 >> leg 2 (what the repartition buys).  Results are
recorded in BASELINE.md.

Run:  python scripts/bench_skew.py
Env:  RAY_GRAFT_CPUS (default 32), GRAFT_SKEW_SPANS (default 16000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = "/tmp/graft_skew"
TOTAL_SPANS = int(os.environ.get("GRAFT_SKEW_SPANS", "16000"))
N_DOCS = 500
HEAD_SIZES = [TOTAL_SPANS // 5, 1600, 800, 400, 200, 100]


def _doc_row(doc_id: str, n_spans: int, rng: np.random.Generator) -> dict:
    spans = [
        {"kind": "media", "text": "", "media_ref": f"mem://{doc_id}/{off}",
         "offset": off}
        for off in range(n_spans)
    ]
    order = rng.permutation(n_spans)  # offset carries the truth
    return {"doc_id": doc_id, "spans": [spans[i] for i in order]}


def build_corpus(kind: str) -> str:
    from medical_and_charity_document_extraction_system_ray.schema import (
        DOCUMENTS_SCHEMA,
    )

    path = os.path.join(FIXTURE_DIR, f"{kind}_{TOTAL_SPANS}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = np.random.default_rng(20260819)
    if kind == "uniform":
        sizes = [TOTAL_SPANS // N_DOCS] * N_DOCS
    else:
        head = [s for s in HEAD_SIZES if s > 0]
        rest_docs = N_DOCS - len(head)
        rest_spans = TOTAL_SPANS - sum(head)
        base = rest_spans // rest_docs
        sizes = head + [base + (1 if i < rest_spans - base * rest_docs else 0)
                        for i in range(rest_docs)]
    assert sum(sizes) == TOTAL_SPANS and len(sizes) == N_DOCS
    docs = [
        _doc_row(f"sk-{kind}-{i:05d}", n, rng) for i, n in enumerate(sizes)
    ]
    pq.write_table(
        pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA), path,
        row_group_size=256,
    )
    return path


def main() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from medical_and_charity_document_extraction_system_ray.pipelines import (
        extract_documents,
    )

    paths = {k: build_corpus(k) for k in ("uniform", "skewed")}
    conc = max(2, (cpus * 7) // 8)

    def leg(path: str, repartition_blocks: int | None) -> float:
        t0 = time.perf_counter()
        out = extract_documents(
            ray.data.read_parquet(path),
            ocr_concurrency=conc,
            ocr_batch_size=128,
            repartition_blocks=repartition_blocks,
        )
        n_docs = 0
        n_pages = 0
        for b in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n_docs += b.num_rows
            n_pages += int(pa.compute.sum(b["page_count"]).as_py())
        dt = time.perf_counter() - t0
        assert n_docs == N_DOCS, n_docs
        assert n_pages == TOTAL_SPANS, n_pages
        return dt

    # untimed warm-up (worker spawn + imports)
    leg(paths["uniform"], cpus * 7)

    legs = {
        "uniform": lambda: leg(paths["uniform"], cpus * 7),
        "skewed": lambda: leg(paths["skewed"], cpus * 7),
        "skewed_nosplit": lambda: leg(paths["skewed"], 0),
    }
    passes: dict[str, list[float]] = {k: [] for k in legs}
    for _ in range(2):  # interleaved passes: host-noise insurance
        for k, fn in legs.items():
            passes[k].append(round(fn(), 3))
    best = {k: min(v) for k, v in passes.items()}
    result = {
        "metric": "skew_bench",
        "total_spans": TOTAL_SPANS,
        "n_docs": N_DOCS,
        "mega_doc_spans": HEAD_SIZES[0],
        "num_cpus": cpus,
        "sec": best,
        "passes": passes,
        "spans_per_sec": {k: round(TOTAL_SPANS / v, 1) for k, v in best.items()},
        "skew_vs_uniform": round(best["uniform"] / best["skewed"], 3),
        "repartition_speedup_under_skew": round(
            best["skewed_nosplit"] / best["skewed"], 2
        ),
    }
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
