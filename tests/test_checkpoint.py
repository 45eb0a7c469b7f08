"""Resume fixture (FIXTURES.md §4): kill after K partitions, restart,
assert completed partitions are not re-executed and the final output is
identical to an uninterrupted run."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_and_charity_document_extraction_system_ray.fixtures import (
    make_documents_table,
)
from medical_and_charity_document_extraction_system_ray.pipelines import (
    extract_documents,
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
    return extract_documents(ds, ocr_concurrency=2, ocr_batch_size=32)


def _collect(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-") and not name.endswith(".tmp"):
            for f in sorted(os.listdir(os.path.join(out_dir, name))):
                if f.endswith(".parquet"):
                    rows.extend(
                        pq.read_table(os.path.join(out_dir, name, f)).to_pylist()
                    )
    return sorted(rows, key=lambda r: r["doc_id"])


def test_kill_and_resume(sharded_input, tmp_path):
    clean_dir = str(tmp_path / "clean")
    ckpt_dir = str(tmp_path / "ckpt")

    # uninterrupted reference run
    summary = run_with_checkpoints(sharded_input, clean_dir, _pipeline, num_partitions=4)
    assert summary["executed"] == [0, 1, 2, 3]
    want = _collect(clean_dir)
    assert len(want) == 60

    # killed run: die after 2 completed partitions
    class Kill(Exception):
        pass

    def bomb(pid):
        if pid == 1:
            raise Kill()

    with pytest.raises(Kill):
        run_with_checkpoints(
            sharded_input, ckpt_dir, _pipeline, num_partitions=4, on_partition_done=bomb
        )
    m = load_manifest(ckpt_dir)
    assert sorted(m) == [0, 1]
    mtimes = {
        pid: os.path.getmtime(os.path.join(ckpt_dir, "_manifest", f"part-{pid:05d}.json"))
        for pid in (0, 1)
    }

    # resume: partitions 0-1 skipped (manifest untouched), 2-3 executed
    summary2 = run_with_checkpoints(sharded_input, ckpt_dir, _pipeline, num_partitions=4)
    assert summary2["skipped"] == [0, 1]
    assert summary2["executed"] == [2, 3]
    for pid in (0, 1):
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
    for e in m2.values():
        assert e["rows"] == 15
        assert e["fingerprint"]
        assert e["wall_ms"] >= 0
        assert len(e["files"]) == 1


def test_changed_input_invalidates_partition(sharded_input, tmp_path):
    out_dir = str(tmp_path / "out")
    run_with_checkpoints(sharded_input, out_dir, _pipeline, num_partitions=4)

    # append a row to shard 2 -> only that partition recomputes
    groups = partition_files(sharded_input, 4)
    target = groups[2][0]
    extra = make_documents_table(61, seed=9).slice(60, 0)  # schema-only no-op
    t = pq.read_table(target)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), target)

    summary = run_with_checkpoints(sharded_input, out_dir, _pipeline, num_partitions=4)
    assert summary["executed"] == [2]
    assert sorted(summary["skipped"]) == [0, 1, 3]


def test_corrupt_manifest_entry_recomputes(sharded_input, tmp_path):
    out_dir = str(tmp_path / "out")
    run_with_checkpoints(sharded_input, out_dir, _pipeline, num_partitions=4)
    # tamper with partition 1's fingerprint -> must recompute just it
    import json

    mpath = os.path.join(out_dir, "_manifest", "part-00001.json")
    e = json.load(open(mpath))
    e["fingerprint"] = "deadbeefdeadbeef"
    json.dump(e, open(mpath, "w"))
    summary = run_with_checkpoints(sharded_input, out_dir, _pipeline, num_partitions=4)
    assert summary["executed"] == [1]
    assert sorted(summary["skipped"]) == [0, 2, 3]
    # manifest healed
    healed = load_manifest(out_dir)[1]
    assert healed["fingerprint"] != "deadbeefdeadbeef"
