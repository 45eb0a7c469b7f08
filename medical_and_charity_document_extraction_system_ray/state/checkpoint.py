"""Per-partition checkpoint / lineage / resume (SURVEY.md §7.1 step 7).

The reference's only resume facility is a directory scan for the next
``task_N.json`` index (``backend/app/utils/json_utils.py:13-32``); the
engine replaces it with real batch-pipeline checkpointing:

- a **partition** is a fixed group of input files (a row is a complete
  document, so documents never straddle partitions and the
  groupby(doc_id) reassembly stays partition-local — no cross-partition
  shuffle, no re-read amplification on resume);
- each partition runs as its own (internally parallel) Ray pipeline
  and commits atomically: results to ``part-{pid:05d}.tmp`` then one
  ``os.replace`` rename; the manifest entry
  ``{partition_id, fingerprint, rows, wall_ms, files}`` is written
  last, also via tmp+rename;
- resume = skip partitions whose manifest entry exists AND whose input
  fingerprint still matches; everything else recomputes.

At cluster scale the partition count is chosen so one partition is a
few minutes of work (e.g. ~100 GB each at 100 TB); the driver loop is
cheap relative to that.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable

import ray.data


def partition_files(files: list[str], num_partitions: int) -> list[list[str]]:
    """Stable round-robin file grouping (sorted first, so the grouping
    is independent of listing order)."""
    files = sorted(files)
    groups: list[list[str]] = [[] for _ in range(min(num_partitions, len(files)))]
    for i, f in enumerate(files):
        groups[i % len(groups)].append(f)
    return groups


def _fingerprint(files: list[str]) -> str:
    """Input lineage fingerprint: path + size per file, plus (for
    parquet) footer metadata — row count and per-row-group uncompressed
    sizes.  Footer-only reads; never scans data.  (Size alone is not
    enough: compression can swallow a small append.)"""
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(os.path.getsize(f)).encode())
        if f.endswith(".parquet"):
            import pyarrow.parquet as pq

            md = pq.read_metadata(f)
            h.update(str(md.num_rows).encode())
            for i in range(md.num_row_groups):
                h.update(str(md.row_group(i).total_byte_size).encode())
    return h.hexdigest()[:16]


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict[int, dict]:
    mdir = _manifest_dir(out_dir)
    entries: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return entries
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                e = json.load(f)
            entries[e["partition_id"]] = e
    return entries


def _write_manifest_entry(out_dir: str, entry: dict) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"part-{entry['partition_id']:05d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def run_with_checkpoints(
    files: list[str],
    out_dir: str,
    pipeline_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    num_partitions: int = 16,
    on_partition_done: Callable[[int], None] | None = None,
) -> dict:
    """Run ``pipeline_fn`` over the file groups with per-partition
    checkpointing.  Returns a summary with per-partition metrics.

    ``on_partition_done`` is a test hook (e.g. raise to simulate a
    kill after K partitions)."""
    os.makedirs(out_dir, exist_ok=True)
    groups = partition_files(files, num_partitions)
    manifest = load_manifest(out_dir)

    skipped, executed = [], []
    for pid, group in enumerate(groups):
        fp = _fingerprint(group)
        prev = manifest.get(pid)
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        if prev is not None and prev["fingerprint"] == fp and os.path.isdir(part_dir):
            skipped.append(pid)
            continue

        t0 = time.time()
        ds = ray.data.read_parquet(group)
        out = pipeline_fn(ds)
        tmp_dir = os.path.join(out_dir, f"part-{pid:05d}.tmp")
        if os.path.isdir(tmp_dir):  # stale partial write from a kill
            import shutil

            shutil.rmtree(tmp_dir)
        out.write_parquet(tmp_dir)
        # row count from the written files' metadata (no recompute)
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        _write_manifest_entry(
            out_dir,
            {
                "partition_id": pid,
                "fingerprint": fp,
                "files": group,
                "rows": rows,
                "wall_ms": int((time.time() - t0) * 1000),
            },
        )
        executed.append(pid)
        if on_partition_done is not None:
            on_partition_done(pid)

    return {
        "partitions": len(groups),
        "executed": executed,
        "skipped": skipped,
        "manifest": load_manifest(out_dir),
    }
