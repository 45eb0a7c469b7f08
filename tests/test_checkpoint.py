"""Resume fixture (FIXTURES.md §4): kill after a partition commits,
restart, assert committed partitions are not re-executed and the final
output is identical to an uninterrupted run.

The checkpoint runner executes ALL dirty partitions in ONE streaming
Ray execution and commits each partition from its own commit task, so
a kill observed at partition K may leave OTHER partitions committed
too — the assertions work from the post-kill manifest, not a fixed
execution order."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_and_charity_document_extraction_system_ray.fixtures import (
    make_documents_table,
)
from medical_and_charity_document_extraction_system_ray.pipelines import (
    extract_spans,
)
from medical_and_charity_document_extraction_system_ray.stages.reassemble import (
    reassemble_table,
)
from medical_and_charity_document_extraction_system_ray.state import (
    load_manifest,
    partition_files,
    run_with_checkpoints,
)


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    """60 docs across 4 parquet shards."""
    root = tmp_path_factory.mktemp("shards")
    table = make_documents_table(60, seed=9)
    files = []
    for i in range(4):
        shard = table.slice(i * 15, 15)
        path = str(root / f"shard-{i}.parquet")
        pq.write_table(shard, path)
        files.append(path)
    return files


def _pipeline(ds):
    return extract_spans(ds, ocr_concurrency=2, ocr_batch_size=32)


def _run(files, out_dir, **kw):
    return run_with_checkpoints(
        files, out_dir, _pipeline, finalize_fn=reassemble_table, **kw
    )


def _collect(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-") and not name.endswith(".tmp") and not name.startswith("part-_"):
            p = os.path.join(out_dir, name)
            if not os.path.isdir(p):
                continue
            for f in sorted(os.listdir(p)):
                if f.endswith(".parquet"):
                    rows.extend(pq.read_table(os.path.join(p, f)).to_pylist())
    return sorted(rows, key=lambda r: r["doc_id"])


def test_kill_and_resume(sharded_input, tmp_path):
    clean_dir = str(tmp_path / "clean")
    ckpt_dir = str(tmp_path / "ckpt")

    # uninterrupted reference run
    summary = _run(sharded_input, clean_dir, num_partitions=4)
    assert summary["executed"] == [0, 1, 2, 3]
    want = _collect(clean_dir)
    assert len(want) == 60

    # killed run: die when partition 1's commit is observed
    class Kill(Exception):
        pass

    def bomb(pid):
        if pid == 1:
            raise Kill()

    with pytest.raises(Kill):
        _run(sharded_input, ckpt_dir, num_partitions=4, on_partition_done=bomb)
    committed = sorted(load_manifest(ckpt_dir))
    assert 1 in committed  # the observed commit really landed
    assert committed and set(committed) <= set(range(4))
    mtimes = {
        pid: os.path.getmtime(
            os.path.join(ckpt_dir, "_manifest", f"part-{pid:05d}.json")
        )
        for pid in committed
    }

    # resume: committed partitions skipped (manifest untouched), rest run
    summary2 = _run(sharded_input, ckpt_dir, num_partitions=4)
    assert summary2["skipped"] == committed
    assert summary2["executed"] == sorted(set(range(4)) - set(committed))
    for pid in committed:
        assert (
            os.path.getmtime(
                os.path.join(ckpt_dir, "_manifest", f"part-{pid:05d}.json")
            )
            == mtimes[pid]
        )

    # output identical to the uninterrupted run
    got = _collect(ckpt_dir)
    assert got == want

    # manifest carries lineage + metrics
    m2 = load_manifest(ckpt_dir)
    assert sorted(m2) == [0, 1, 2, 3]
    for e in m2.values():
        assert e["rows"] == 15
        assert e["fingerprint"]
        assert e["wall_ms"] >= 0
        assert len(e["files"]) == 1


def test_changed_input_invalidates_partition(sharded_input, tmp_path):
    out_dir = str(tmp_path / "out")
    _run(sharded_input, out_dir, num_partitions=4)

    # append a row to shard 2 -> only that partition recomputes
    groups = partition_files(sharded_input, 4)
    target = groups[2][0]
    t = pq.read_table(target)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), target)

    summary = _run(sharded_input, out_dir, num_partitions=4)
    assert summary["executed"] == [2]
    assert sorted(summary["skipped"]) == [0, 1, 3]


def test_corrupt_manifest_entry_recomputes(sharded_input, tmp_path):
    out_dir = str(tmp_path / "out")
    _run(sharded_input, out_dir, num_partitions=4)
    # tamper with partition 1's fingerprint -> must recompute just it
    mpath = os.path.join(out_dir, "_manifest", "part-00001.json")
    e = json.load(open(mpath))
    e["fingerprint"] = "deadbeefdeadbeef"
    json.dump(e, open(mpath, "w"))
    summary = _run(sharded_input, out_dir, num_partitions=4)
    assert summary["executed"] == [1]
    assert sorted(summary["skipped"]) == [0, 2, 3]
    # manifest healed
    healed = load_manifest(out_dir)[1]
    assert healed["fingerprint"] != "deadbeefdeadbeef"


def test_truncated_manifest_entry_recomputes(sharded_input, tmp_path):
    """An unparsable (truncated) manifest entry marks the partition
    dirty instead of aborting the resume."""
    out_dir = str(tmp_path / "out")
    _run(sharded_input, out_dir, num_partitions=4)
    mpath = os.path.join(out_dir, "_manifest", "part-00002.json")
    with open(mpath, "w") as f:
        f.write('{"partition_id": 2, "finge')  # kill mid-write
    summary = _run(sharded_input, out_dir, num_partitions=4)
    assert summary["executed"] == [2]
    assert sorted(summary["skipped"]) == [0, 1, 3]
    assert load_manifest(out_dir)[2]["rows"] == 15


def test_shrinking_partitions_removes_stale_output(sharded_input, tmp_path):
    """Re-running with fewer partitions must not leave part dirs /
    manifest entries from the old partitioning (duplicate rows for any
    consumer globbing part-*/)."""
    out_dir = str(tmp_path / "out")
    _run(sharded_input, out_dir, num_partitions=4)
    assert sorted(load_manifest(out_dir)) == [0, 1, 2, 3]

    summary = _run(sharded_input, out_dir, num_partitions=2)
    assert summary["partitions"] == 2
    m = load_manifest(out_dir)
    assert sorted(m) == [0, 1]
    dirs = [
        d for d in os.listdir(out_dir)
        if d.startswith("part-") and not d.endswith(".tmp")
    ]
    assert sorted(dirs) == ["part-00000", "part-00001"]
    # total output rows unchanged (no duplicates)
    assert len(_collect(out_dir)) == 60
    assert sum(e["rows"] for e in m.values()) == 60


def test_zero_row_recommit_clears_stale_output(tmp_path):
    """A partition committed with rows whose input later shrinks to 0
    rows must not keep serving the old parquet files (ADVICE r2: stale
    rows survived the rows=0 recommit)."""
    root = tmp_path / "shards"
    root.mkdir()
    path = str(root / "shard-0.parquet")
    pq.write_table(make_documents_table(10, seed=4), path)
    out_dir = str(tmp_path / "out")

    s1 = _run([path], out_dir, num_partitions=1)
    assert s1["executed"] == [0]
    assert len(_collect(out_dir)) == 10

    # input becomes an empty table (same schema): fingerprint changes,
    # the pipeline yields 0 rows, the partition recommits as empty
    pq.write_table(make_documents_table(10, seed=4).slice(0, 0), path)
    s2 = _run([path], out_dir, num_partitions=1)
    assert s2["executed"] == [0]
    assert load_manifest(out_dir)[0]["rows"] == 0
    assert _collect(out_dir) == []  # no stale parquet left in part-00000/


def test_custom_reader_fn_used(sharded_input, tmp_path):
    """run_with_checkpoints reads dirty groups through reader_fn (the
    hook the PDF ingestion path uses) — called once per dirty group."""
    import ray.data

    calls = []

    def rf(group):
        calls.append(list(group))
        return ray.data.read_parquet(group)

    out = str(tmp_path / "o")
    s = _run(sharded_input[:2], out, num_partitions=2, reader_fn=rf)
    assert s["executed"] == [0, 1]
    assert len(calls) == 2 and all(len(g) == 1 for g in calls)
    assert len(_collect(out)) == 30
    # resume: nothing dirty, reader not called again
    calls.clear()
    s2 = _run(sharded_input[:2], out, num_partitions=2, reader_fn=rf)
    assert s2["executed"] == [] and calls == []


def test_lance_sink_gated_without_bindings(tmp_path, monkeypatch):
    """file_format='lance' without the bindings fails fast on the
    DRIVER with the same gating contract as sources/readers."""
    import sys

    monkeypatch.setitem(sys.modules, "lance", None)  # forces ImportError
    with pytest.raises(RuntimeError, match="pylance"):
        _run(["x.parquet"], str(tmp_path / "o"), file_format="lance")


def test_lance_sink_layout_and_resume(sharded_input, tmp_path, monkeypatch):
    """The Lance partition commit (SURVEY §1.2 layout
    part-{pid:05d}/data.lance) through the SAME atomic-rename manifest:
    faked bindings on the driver gate-check, a by-value writer closure
    standing in for lance.write_dataset in the commit tasks (a
    sys.modules fake does not exist in Ray workers), resume skips
    committed partitions."""
    import sys
    import types

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))

    def fake_lance_write(data, tmp_dir):
        # mimics lance.write_dataset(table, uri): a .lance dataset DIR
        d = os.path.join(tmp_dir, "data.lance")
        os.makedirs(d)
        pq.write_table(data, os.path.join(d, "payload.parquet"))
        return ["data.lance"]

    out = str(tmp_path / "o")
    s = _run(
        sharded_input, out, num_partitions=3,
        file_format="lance", data_writer=fake_lance_write,
    )
    assert s["executed"] == [0, 1, 2]
    for pid in range(3):
        d = os.path.join(out, f"part-{pid:05d}", "data.lance")
        assert os.path.isdir(d)
    rows = []
    for pid in range(3):
        rows += pq.read_table(
            os.path.join(out, f"part-{pid:05d}", "data.lance", "payload.parquet")
        ).to_pylist()
    assert len(rows) == 60
    assert len({r["doc_id"] for r in rows}) == 60
    # resume: all clean, nothing re-executed, payloads untouched
    s2 = _run(
        sharded_input, out, num_partitions=3,
        file_format="lance", data_writer=fake_lance_write,
    )
    assert s2["executed"] == [] and sorted(s2["skipped"]) == [0, 1, 2]


def test_resolve_data_writer_contract():
    from medical_and_charity_document_extraction_system_ray.state.checkpoint import (
        resolve_data_writer,
    )

    assert callable(resolve_data_writer("parquet"))
    with pytest.raises(ValueError, match="unknown file_format"):
        resolve_data_writer("orc")


def test_artifact_store_resume_and_invalidation(tmp_path):
    """The ANN index cache discipline (r4 verdict ask #3): the cache
    key is (kind, params, input lineage fingerprint) persisted in an
    fsynced manifest, so a 'restarted' build (everything is on disk —
    no process state) reuses the artifact; an input change or a param
    change rebuilds; a corrupted manifest entry rebuilds."""
    from medical_and_charity_document_extraction_system_ray.state.checkpoint import (
        get_or_build_artifact,
    )

    src = tmp_path / "input.bin"
    src.write_bytes(b"v1" * 100)
    root = str(tmp_path / "artifacts")
    calls = []

    def build(tmp_dir):
        calls.append(tmp_dir)
        with open(os.path.join(tmp_dir, "payload.txt"), "w") as f:
            f.write("built")
        return {"rows": 1}

    d1 = get_or_build_artifact("ivf", {"nlist": 8}, [str(src)], build, root=root)
    assert os.path.isfile(os.path.join(d1, "payload.txt"))
    assert d1.startswith(os.path.join(root, "ivf"))
    assert len(calls) == 1

    # restart-shaped reuse: same inputs -> same dir, no rebuild
    d2 = get_or_build_artifact("ivf", {"nlist": 8}, [str(src)], build, root=root)
    assert d2 == d1 and len(calls) == 1

    # param change -> a DIFFERENT artifact, built fresh
    d3 = get_or_build_artifact("ivf", {"nlist": 16}, [str(src)], build, root=root)
    assert d3 != d1 and len(calls) == 2

    # input change -> the key changes -> rebuild
    src.write_bytes(b"v2" * 150)
    d4 = get_or_build_artifact("ivf", {"nlist": 8}, [str(src)], build, root=root)
    assert d4 != d1 and len(calls) == 3

    # corrupted manifest entry -> treated dirty, rebuilt in place
    key = os.path.basename(d4)
    mpath = os.path.join(root, "ivf", "_manifest", f"{key}.json")
    with open(mpath, "w") as f:
        f.write("{truncated")
    d5 = get_or_build_artifact("ivf", {"nlist": 8}, [str(src)], build, root=root)
    assert d5 == d4 and len(calls) == 4
    with open(mpath) as f:
        entry = json.load(f)  # manifest entry restored and parsable
    assert entry["params"] == {"nlist": 8} and entry["rows"] == 1


def test_ivf_index_cache_key_survives_restart(tmp_path):
    """build_ivf_index twice against the same embeddings table returns
    the same published dir without re-running the distributed build
    (centroids.npy inode/mtime untouched)."""
    import numpy as np

    from medical_and_charity_document_extraction_system_ray.pipelines.similarity import (
        build_ivf_index,
    )

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 8)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    root = str(tmp_path / "idx")
    d1 = build_ivf_index(str(tmp_path), nlist=4, cache_root=root)
    st1 = os.stat(os.path.join(d1, "centroids.npy"))
    d2 = build_ivf_index(str(tmp_path), nlist=4, cache_root=root)
    st2 = os.stat(os.path.join(d2, "centroids.npy"))
    assert d1 == d2
    assert (st1.st_mtime_ns, st1.st_ino) == (st2.st_mtime_ns, st2.st_ino)
