"""Utility-surface tests: retention GC, media validation, image info,
multimodal helpers."""

import os
import time

import numpy as np

from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
    MediaFeatureExtractor,
    resize_bilinear,
    sample_frames,
)
from medical_and_charity_document_extraction_system_ray.sources.media_resolver import (
    image_info,
    text_to_media_ref,
    validate_media_format,
)
from medical_and_charity_document_extraction_system_ray.state.gc import (
    cleanup_files,
    cleanup_stale_partials,
)


def test_cleanup_files_by_age(tmp_path):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    other = tmp_path / "old.txt"
    for p in (old, new, other):
        p.write_text("x")
    past = time.time() - 10 * 86400
    os.utime(old, (past, past))
    os.utime(other, (past, past))
    deleted = cleanup_files(str(tmp_path), days=7, pattern="*.json")
    assert deleted == [str(old)]
    assert new.exists() and other.exists()


def test_cleanup_stale_partials(tmp_path):
    (tmp_path / "part-00000").mkdir()
    (tmp_path / "part-00001.tmp").mkdir()
    removed = cleanup_stale_partials(str(tmp_path))
    assert removed == ["part-00001.tmp"]
    assert (tmp_path / "part-00000").is_dir()


def test_validate_media_format():
    assert validate_media_format("mem://doc-1/0")
    assert validate_media_format(text_to_media_ref("hi"))
    assert validate_media_format("s3://bucket/page.png")
    assert not validate_media_format("s3://bucket/page.exe")


def test_image_info():
    info = image_info(np.zeros((10, 20), dtype=np.uint8))
    assert info == {
        "width": 20, "height": 10, "channels": 1,
        "size_bytes": 200, "dtype": "uint8",
    }


def test_resize_bilinear_shapes_and_range():
    img = np.linspace(0, 255, 40 * 60).reshape(40, 60).astype(np.uint8)
    out = resize_bilinear(img, 8, 8)
    assert out.shape == (8, 8) and out.dtype == np.uint8
    # downsampling a gradient keeps monotonicity along rows
    assert (np.diff(out.astype(int), axis=1) >= 0).all()


def test_sample_frames_plan():
    idx = sample_frames(n_frames=100, fps=25.0, every_sec=1.0)
    assert idx.tolist() == list(range(0, 100, 25))


def test_media_feature_extractor_error_rows():
    import pyarrow as pa

    batch = pa.table({"media_ref": ["memb64://" + "aGVsbG8=", "s3://x/y.png"]})
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["success"] is True
    assert out[1]["success"] is False and "scheme" in out[1]["error"]


def test_read_flat_documents_formats_agree(tmp_path):
    """parquet / JSONL / CSV sources normalize to one schema and yield
    identical rows (n_chars computed when the source lacks it)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_and_charity_document_extraction_system_ray.sources.readers import (
        read_flat_documents,
        write_results_json,
    )

    rows = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en"},
        {"doc_id": 2, "text": "gamma", "lang": "de"},
        {"doc_id": 3, "text": "", "lang": "en"},
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows]),
                "lang": pa.array([r["lang"] for r in rows]),
            }
        ),
        str(tmp_path / "docs.parquet"),
    )
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    with open(tmp_path / "docs.csv", "w") as f:
        f.write("doc_id,text,lang\n")
        for r in rows:
            f.write(f"{r['doc_id']},{r['text']},{r['lang']}\n")

    outs = {}
    for name in ("docs.parquet", "docs.jsonl", "docs.csv"):
        df = (
            read_flat_documents(str(tmp_path / name))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if "n_chars" not in df.columns:  # parquet passthrough keeps source cols
            df["n_chars"] = df["text"].str.len()
        outs[name] = df[["doc_id", "text", "lang", "n_chars"]]
    assert outs["docs.parquet"].equals(outs["docs.jsonl"])
    assert outs["docs.parquet"].equals(outs["docs.csv"])

    # JSON sink roundtrip
    ds = read_flat_documents(str(tmp_path / "docs.jsonl"))
    write_results_json(ds, str(tmp_path / "out_json"))
    import glob

    got = []
    for p in glob.glob(str(tmp_path / "out_json" / "*.json")):
        with open(p) as f:
            got.extend(_json.loads(line) for line in f if line.strip())
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3]
