"""Per-partition checkpoint / lineage / resume (SURVEY.md §7.1 step 7).

The reference's only resume facility is a directory scan for the next
``task_N.json`` index (``backend/app/utils/json_utils.py:13-32``); the
engine replaces it with real batch-pipeline checkpointing:

- a **partition** is a fixed group of input files (a row is a complete
  document, so documents never straddle partitions, no re-read
  amplification on resume);
- ALL dirty partitions run in ONE streaming Ray execution (the OCR
  actor pool warms up once, not once per partition): each dirty group
  is tagged with a ``partition_id`` column AT READ TIME, the groups are
  unioned, run through the pipeline (which passes the tag column
  through every stage), and committed by a
  ``groupby(partition_id).map_groups`` write stage — each group task
  writes ``part-{pid:05d}.tmp``, renames it atomically, then writes the
  manifest entry ``{partition_id, fingerprint, rows, wall_ms, files}``
  (tmp+rename; ``wall_ms`` is the commit task's own finalize+write
  time — upstream pipeline work is shared across partitions in the
  streaming execution and not attributable to one);
- a kill mid-run loses only uncommitted partitions; resume = skip
  partitions whose manifest entry parses AND whose input fingerprint
  still matches; everything else recomputes.  Shrinking
  ``num_partitions`` deletes now-out-of-range part dirs + manifest
  entries (stale-output hazard); growing changes every fingerprint and
  recomputes.

Assumption (pre-existing — the reassembly groupby already requires
it): ``doc_id`` is unique across the whole input.  At cluster scale
``out_dir`` must be shared storage and the partition count is chosen
so one partition's OUTPUT fits a worker's heap (the commit stage holds
one partition per task).
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
            try:
                with open(os.path.join(mdir, name)) as f:
                    e = json.load(f)
                entries[e["partition_id"]] = e
            except (ValueError, OSError, KeyError):
                # truncated / unparsable entry (e.g. a kill mid-write
                # before the rename landed on a non-atomic fs): treat
                # the partition as dirty instead of aborting the resume
                continue
    return entries


def _atomic_json_write(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _write_manifest_entry(out_dir: str, entry: dict) -> None:
    final = os.path.join(
        _manifest_dir(out_dir), f"part-{entry['partition_id']:05d}.json"
    )
    _atomic_json_write(final, entry)


# ---------------------------------------------------------------------------
# Derived-artifact store (ANN indexes, codebooks): same manifest +
# atomic-rename discipline as the partition sink, keyed by input lineage
# ---------------------------------------------------------------------------

DEFAULT_ARTIFACT_ROOT = "/tmp/graft_artifacts"


def artifact_root(root: str | None = None) -> str:
    """Artifact store root: explicit arg > ``GRAFT_ARTIFACT_ROOT`` env >
    local default.  On a multi-node cluster point this at shared
    storage (every probe task reads the published layout)."""
    return root or os.environ.get("GRAFT_ARTIFACT_ROOT") or DEFAULT_ARTIFACT_ROOT


def get_or_build_artifact(
    kind: str,
    params: dict,
    input_files: list[str],
    build_fn: Callable[[str], dict | None],
    root: str | None = None,
) -> str:
    """Deployment-shaped cache for derived artifacts (IVF layouts, PQ
    codebooks, ...): the cache key is ``(kind, params, input
    fingerprint)`` where the fingerprint is the checkpoint sink's
    lineage fingerprint (path + size + parquet footer), so a restarted
    job — or a different driver on the same shared root — reuses a
    published artifact if and only if its inputs are byte-identical at
    the footer level.

    ``build_fn(tmp_dir)`` materializes the artifact into ``tmp_dir``
    and may return extra manifest metadata; publish is tmp+rename
    atomic and the manifest entry is fsynced (a kill mid-build leaves
    only a ``.tmp`` dir that the next build clears)."""
    import shutil

    root = artifact_root(root)
    fp = _fingerprint(input_files)
    key = hashlib.sha256(
        f"{kind}|{json.dumps(params, sort_keys=True)}|{fp}".encode()
    ).hexdigest()[:16]
    kind_dir = os.path.join(root, kind)
    final = os.path.join(kind_dir, key)
    mpath = os.path.join(kind_dir, "_manifest", f"{key}.json")
    if os.path.isdir(final) and os.path.isfile(mpath):
        try:
            with open(mpath) as f:
                entry = json.load(f)
            if entry.get("fingerprint") == fp:
                return final
        except (ValueError, OSError):
            pass  # unparsable manifest: rebuild
    tmp = final + ".tmp"
    if os.path.isdir(tmp):  # stale partial build from a kill
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    ts = time.time()
    meta = build_fn(tmp) or {}
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    _atomic_json_write(
        mpath,
        {
            "key": key,
            "kind": kind,
            "params": params,
            "fingerprint": fp,
            "files": sorted(input_files),
            "wall_ms": int((time.time() - ts) * 1000),
            **meta,
        },
    )
    return final


def _invalidate_extra_partitions(out_dir: str, manifest: dict[int, dict], n: int) -> None:
    """Re-running with fewer partitions would leave stale part dirs +
    manifest entries from the old partitioning: any consumer globbing
    part-*/ would read duplicate rows.  Delete everything at
    partition_id >= n."""
    import shutil

    for pid in [p for p in manifest if p >= n]:
        mpath = os.path.join(_manifest_dir(out_dir), f"part-{pid:05d}.json")
        if os.path.isfile(mpath):
            os.remove(mpath)
        pdir = os.path.join(out_dir, f"part-{pid:05d}")
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        del manifest[pid]
    # stale dirs can also exist without a manifest entry (kill between
    # rename and manifest write)
    for name in os.listdir(out_dir):
        if name.startswith("part-") and not name.endswith(".tmp"):
            try:
                pid = int(name.split("-")[1])
            except ValueError:
                continue
            if pid >= n:
                shutil.rmtree(os.path.join(out_dir, name))


def _parquet_writer(data, tmp_dir: str) -> list[str]:
    import pyarrow.parquet as pq

    name = "data-00000.parquet"
    pq.write_table(data, os.path.join(tmp_dir, name))
    return [name]


def _lance_writer(data, tmp_dir: str) -> list[str]:
    """Lance partition payload (the north rule's production format,
    SURVEY §1.2: ``out/part-{pid:05d}.lance``).  Import-gated exactly
    like ``sources/readers.read_documents`` — the container ships no
    lance bindings, so pytest fakes the writer; the commit/rename/
    manifest machinery is identical either way."""
    import lance

    name = "data.lance"
    lance.write_dataset(data, os.path.join(tmp_dir, name))
    return [name]


def resolve_data_writer(file_format: str) -> Callable:
    """``file_format`` -> (table, tmp_dir) -> [payload names].  For
    'lance' the bindings are probed HERE (driver side) so a missing
    package fails fast instead of inside every commit task."""
    if file_format == "parquet":
        return _parquet_writer
    if file_format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "file_format='lance' requires the 'lance' package "
                "(pip install pylance); file_format='parquet' needs no "
                "extra bindings"
            ) from e
        return _lance_writer
    raise ValueError(f"unknown file_format: {file_format!r}")


def run_with_checkpoints(
    files: list[str],
    out_dir: str,
    pipeline_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    num_partitions: int = 16,
    on_partition_done: Callable[[int], None] | None = None,
    finalize_fn: "Callable | None" = None,
    reader_fn: "Callable[[list[str]], ray.data.Dataset] | None" = None,
    file_format: str = "parquet",
    data_writer: "Callable | None" = None,
) -> dict:
    """Run ``pipeline_fn`` over the file groups with per-partition
    checkpointing — ONE streaming execution for all dirty partitions
    (the actor pools warm up once, not once per partition; partitions
    commit independently as their commit task finishes, so a kill only
    loses uncommitted work).

    Contract: each dirty group is read and tagged with a
    ``partition_id`` column; ``pipeline_fn`` must PRESERVE that column
    (``extract_spans`` passes unrecognized columns through every
    stage).  The commit stage groups by partition, applies
    ``finalize_fn`` (e.g. ``reassemble_table`` — this folds the
    pipeline's reassembly shuffle into the partition shuffle), writes
    ``part-{pid:05d}`` atomically and commits the manifest entry.

    ``on_partition_done`` is a driver-side hook invoked as each
    partition's commit is observed (test hook: raise to simulate a
    kill — partitions whose commit task already ran stay committed).

    ``file_format`` selects the partition payload: 'parquet' (default)
    or 'lance' (import-gated; SURVEY §1.2's production layout).
    ``data_writer`` overrides it with a custom (table, tmp_dir) ->
    [names] callable — also the test seam for faked lance bindings
    (a driver-injected fake module does not exist in Ray workers, but a
    locally-defined writer closure pickles by value)."""
    import pyarrow as pa

    if data_writer is None:
        data_writer = resolve_data_writer(file_format)

    os.makedirs(out_dir, exist_ok=True)
    groups = partition_files(files, num_partitions)
    manifest = load_manifest(out_dir)
    _invalidate_extra_partitions(out_dir, manifest, len(groups))
    fps = {pid: _fingerprint(g) for pid, g in enumerate(groups)}

    skipped, dirty = [], []
    for pid in range(len(groups)):
        prev = manifest.get(pid)
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        if prev is not None and prev["fingerprint"] == fps[pid] and os.path.isdir(part_dir):
            skipped.append(pid)
        else:
            dirty.append(pid)

    if not dirty:
        return {
            "partitions": len(groups),
            "executed": [],
            "skipped": skipped,
            "manifest": load_manifest(out_dir),
        }

    # ONE dataset over all dirty groups, each tagged at read time.
    # reader_fn generalizes the source (default parquet; e.g. read_pdfs
    # for a .pdf input set — fingerprints fall back to path+size there)
    if reader_fn is None:
        reader_fn = ray.data.read_parquet
    parts = []
    for pid in dirty:
        p = reader_fn(groups[pid]).map_batches(
            lambda t, _pid=pid: t.append_column(
                "partition_id", pa.array([_pid] * len(t), type=pa.int32())
            ),
            batch_format="pyarrow",
        )
        parts.append(p)
    main = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    out = pipeline_fn(main)

    def write_commit(g: pa.Table) -> pa.Table:
        import shutil

        ts = time.time()
        pid = int(g["partition_id"][0].as_py())
        data = g.drop_columns(["partition_id"])
        if finalize_fn is not None:
            data = finalize_fn(data)
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):  # stale partial write from a kill
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        data_writer(data, tmp_dir)
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        _write_manifest_entry(
            out_dir,
            {
                "partition_id": pid,
                "fingerprint": fps[pid],
                "files": groups[pid],
                "rows": len(data),
                "wall_ms": int((time.time() - ts) * 1000),
            },
        )
        return pa.table(
            {
                "partition_id": pa.array([pid], type=pa.int32()),
                "rows": pa.array([len(data)], type=pa.int64()),
            }
        )

    summary_ds = out.groupby("partition_id").map_groups(
        write_commit, batch_format="pyarrow"
    )

    executed = []
    for batch in summary_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows == 0 or "partition_id" not in batch.column_names:
            continue
        for pid in batch["partition_id"].to_pylist():
            executed.append(int(pid))
            if on_partition_done is not None:
                on_partition_done(int(pid))

    # partitions whose group produced no rows never reach the commit
    # stage: commit them as empty so resume doesn't recompute forever
    import shutil

    for pid in dirty:
        if pid not in executed:
            part_dir = os.path.join(out_dir, f"part-{pid:05d}")
            # a previously committed non-empty output must not survive a
            # now-empty input: clear before recording rows=0 (else
            # consumers globbing part-*/ read stale rows)
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
            os.makedirs(part_dir)
            _write_manifest_entry(
                out_dir,
                {
                    "partition_id": pid,
                    "fingerprint": fps[pid],
                    "files": groups[pid],
                    "rows": 0,
                    "wall_ms": 0,  # no commit task ran for an empty group
                },
            )
            executed.append(pid)

    return {
        "partitions": len(groups),
        "executed": sorted(executed),
        "skipped": skipped,
        "manifest": load_manifest(out_dir),
    }
