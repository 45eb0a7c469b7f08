"""Production driver for the flagship extraction pipeline.

``ray job submit``-able entrypoint (SURVEY.md §3.2 analog of the
reference's uvicorn bootstrap): config parse -> ray session -> dataset
construction -> checkpointed run -> metrics summary.  Resume is
automatic: re-running with the same output dir skips partitions whose
manifest entries verify.

    python scripts/run_extraction.py --input 'data/*.parquet' \
        --output /tmp/out --partitions 16 --concurrency 24

(or: ray job submit --working-dir . -- python scripts/run_extraction.py ...)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_ray_init_kwargs(
    address: str | None = None, num_cpus: int = 0, env=os.environ
) -> dict:
    """ray.init kwargs for the job driver.  Joins the cluster named by
    --address / $RAY_ADDRESS (``ray job submit`` exports the latter —
    a hardcoded address="local" would boot a fresh SINGLE-NODE Ray
    inside the job and leave the multi-node cluster idle); empty/unset
    falls back to local mode.  num_cpus / include_dashboard are
    local-mode-only kwargs (ray.init rejects them when connecting to
    an existing cluster)."""
    addr = address or env.get("RAY_ADDRESS") or "local"
    kwargs = dict(address=addr, ignore_reinit_error=True,
                  logging_level="ERROR")
    if addr == "local":
        kwargs["include_dashboard"] = False
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
    return kwargs


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input parquet file/glob/dir")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--engine", default=None, help="ocr engine name (default: band)")
    ap.add_argument("--language", default="eng")
    ap.add_argument("--no-preprocess", action="store_true")
    ap.add_argument("--document-type", default="general")
    ap.add_argument("--concurrency", type=int, default=0,
                    help="OCR actor pool size (default: 3/4 of CPUs)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="ray session CPUs (default: all; local mode only)")
    ap.add_argument("--address", default=None,
                    help="ray cluster address (default: $RAY_ADDRESS or "
                         "'local'; under `ray job submit` the submitter "
                         "exports RAY_ADDRESS so the job joins the cluster)")
    ap.add_argument("--gc-stale", action="store_true",
                    help="remove stale part-*.tmp dirs before running")
    ap.add_argument("--format", default="parquet", choices=["parquet", "lance"],
                    help="partition payload format (lance needs pylance)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(**resolve_ray_init_kwargs(args.address, args.num_cpus))
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from medical_and_charity_document_extraction_system_ray.pipelines import (
        extract_spans,
    )
    from medical_and_charity_document_extraction_system_ray.stages.reassemble import (
        reassemble_table,
    )
    from medical_and_charity_document_extraction_system_ray.state import (
        run_with_checkpoints,
    )
    from medical_and_charity_document_extraction_system_ray.state.gc import (
        cleanup_stale_partials,
    )

    if os.path.isdir(args.input):
        files = sorted(
            glob.glob(os.path.join(args.input, "*.parquet"))
            or glob.glob(os.path.join(args.input, "*.pdf"))
        )
    else:
        files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2

    # a .pdf input set goes through the import-gated PyMuPDF adapter
    # (sources/pdf_adapter.py) straight into the same checkpointed
    # pipeline; per-file failures become empty-span rows, and the
    # fingerprints fall back to path+size (no parquet footer)
    reader_fn = None
    if all(f.lower().endswith(".pdf") for f in files):
        from medical_and_charity_document_extraction_system_ray.sources.pdf_adapter import (
            read_pdfs,
        )

        def reader_fn(group):
            # pool width follows the cluster (fixed min(8,...) capped a
            # wide cluster's rasterize stage), never exceeds the files
            ds = read_pdfs(group)
            return ds.map_batches(
                lambda t: t.drop_columns(["error"]), batch_format="pyarrow"
            )

    if args.gc_stale:
        removed = cleanup_stale_partials(args.output)
        if removed:
            print(f"removed stale partials: {removed}", file=sys.stderr)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    conc = args.concurrency or max(2, (ncpu * 7) // 8)

    def pipeline(ds):
        # span-level pipeline only: the commit stage's groupby(partition)
        # also performs the per-document reassembly (finalize_fn), so the
        # run has ONE shuffle instead of reassembly + partition shuffles
        return extract_spans(
            ds,
            engine=args.engine,
            language=args.language,
            preprocess=not args.no_preprocess,
            document_type=args.document_type,
            ocr_concurrency=conc,
            ocr_batch_size=args.batch_size,
            repartition_blocks=ncpu * 7,
        )

    t0 = time.time()
    summary = run_with_checkpoints(
        files, args.output, pipeline, num_partitions=args.partitions,
        finalize_fn=reassemble_table, reader_fn=reader_fn,
        file_format=args.format,
    )
    wall = time.time() - t0
    rows = sum(e["rows"] for e in summary["manifest"].values())
    print(json.dumps({
        "partitions": summary["partitions"],
        "executed": summary["executed"],
        "skipped": summary["skipped"],
        "rows_total": rows,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(
            sum(summary["manifest"][p]["rows"] for p in summary["executed"]) / wall, 2
        ) if wall > 0 else None,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
