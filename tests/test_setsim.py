"""Planted-fixture tests for the prefix-filtered set-similarity join:
exact recall on a near-dup pair (no LSH randomness to tune), correct
exclusion below threshold, shingle-less short docs, and empty-result
schema pinning."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_setsim_planted_pair_and_exclusion(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_setsim_prefix_join,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " zzz yyy"  # high overlap
    far = " ".join(f"other{i}" for i in range(40))  # zero shared shingles
    short = "one two"  # <3 tokens: no shingles, excluded entirely
    sf = _write_docs(tmp_path, [base, near, far, short])
    out = q_setsim_prefix_join(sf, threshold=0.6).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(0, 1)}
    # jaccard: base has 38 shingles, near has 38 (36 shared + 2 new)
    assert abs(out["jaccard"].iloc[0] - 36 / 40) < 1e-6


def test_setsim_empty_result_schema(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_setsim_prefix_join,
    )

    texts = [" ".join(f"w{i}_{d}" for i in range(10)) for d in range(5)]
    sf = _write_docs(tmp_path, texts)
    res = q_setsim_prefix_join(sf, threshold=0.6)
    df = res.to_pandas()
    assert len(df) == 0
    assert list(res.schema().names) == ["doc_a", "doc_b", "jaccard"]


def test_hll_accuracy_and_merge_determinism():
    """Pure-sketch math: estimate within 3 sigma across magnitudes, and
    merging arbitrary partitions of the stream equals the one-shot
    sketch exactly (registers are max-mergeable)."""
    import numpy as np
    from medical_and_charity_document_extraction_system_ray.functions.sketches import (
        HLL_P,
        hll_estimate,
        hll_from_hashes,
        hll_merge,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        _hash_ids,
    )

    sigma = 1.04 / np.sqrt(1 << HLL_P)
    for n in (50, 1_000, 50_000):
        h = _hash_ids(np.arange(n, dtype=np.int64))
        est = hll_estimate(hll_from_hashes(h))
        assert abs(est / n - 1.0) <= 3 * sigma + 0.01, (n, est)
        # split into 7 uneven parts, merge — must be bit-identical
        parts = np.array_split(h, 7)
        merged = hll_merge([hll_from_hashes(p) for p in parts])
        assert np.array_equal(merged, hll_from_hashes(h))


def test_hll_query_bound(tmp_path):
    """End-to-end over a small synthetic events table: gate query says
    est_ok for every type."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_hll_check,
    )

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000 + 1_700_000_000_000_000
            ).view(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 900, n), pa.int64()),
            "event_type": pa.array(
                [["click", "view", "buy"][i % 3] for i in range(n)]
            ),
            "value": pa.array(rng.random(n), pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = q_hll_check(str(tmp_path)).to_pandas()
    assert len(out) == 3 and out["est_ok"].all()


def test_kmeans_planted_blobs(tmp_path):
    """Three well-separated blobs: distributed Lloyd's recovers the
    partition sizes exactly and inertia is non-increasing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.similarity import (
        kmeans_fit,
        q_kmeans_clusters,
    )

    rng = np.random.default_rng(3)
    blobs = [
        rng.normal(loc, 0.05, size=(n, 8))
        for loc, n in ((0.0, 40), (5.0, 25), (-5.0, 35))
    ]
    mat = np.concatenate(blobs).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([row.tolist() for row in mat],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 40 + [1] * 25 + [2] * 35, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    _, inertia = kmeans_fit(str(tmp_path), k=3, iters=4)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertia, inertia[1:]))
    sizes = q_kmeans_clusters(str(tmp_path), k=3, iters=4).to_pandas()
    assert sorted(sizes["n_points"]) == [25, 35, 40]


def test_cms_one_sided_and_linear(tmp_path):
    """CMS estimates are >= exact for every token, and the sketch is
    linear: any batch split merges to identical counters (exercised by
    the pipeline over multiple blocks)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_cms_check,
        q_cms_token_counts,
    )

    texts = (["alpha beta"] * 30) + (["gamma delta alpha"] * 10) + [""]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    est = q_cms_token_counts(str(tmp_path)).to_pandas().set_index("token")["cms_count"]
    # 4 tokens in a 2048-wide sketch: collisions impossible -> exact
    assert est["alpha"] == 40 and est["beta"] == 30
    assert est["gamma"] == 10 and est["delta"] == 10
    chk = q_cms_check(str(tmp_path)).to_pandas()
    assert chk["one_sided"].all() and chk["bounded"].all()


def test_setsim_join_path_matches_broadcast(tmp_path):
    """All three verify regimes (broadcast-sets, broadcast-pairs,
    hash-join fallback) yield identical verified pairs."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_setsim_prefix_join,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " zzz yyy"
    far = " ".join(f"other{i}" for i in range(40))
    sf = _write_docs(tmp_path, [base, near, far])
    bsets = q_setsim_prefix_join(sf).to_pandas()
    bpairs = q_setsim_prefix_join(sf, broadcast_sets_bytes=0).to_pandas()
    joins = q_setsim_prefix_join(
        sf, broadcast_sets_bytes=0, broadcast_pairs_bytes=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["doc_a"], df["doc_b"], df["jaccard"]))
    assert key(bsets) == key(bpairs) == key(joins) == [(0, 1, 0.9)]


def test_stable_hash64_sliced_input():
    """A zero-copy slice (non-zero Arrow view offset) must hash the same
    as a compacted copy — the offsets-buffer hazard from ADVICE."""
    import numpy as np
    import pyarrow as pa
    from medical_and_charity_document_extraction_system_ray.functions.text import (
        stable_hash64,
    )

    full = pa.array(["aaa", "bb", "cccc", "d", "ee"])
    sl = full.slice(1, 3)
    compact = pa.array(sl.to_pylist())
    assert np.array_equal(stable_hash64(sl), stable_hash64(compact))


def test_pareto_mask_bruteforce():
    """Vectorized skyline mask equals the O(n^2) definition on random
    data with heavy ties/duplicates."""
    import numpy as np
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        _pareto_mask,
    )

    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(1, 60))
        a = rng.integers(0, 6, n)
        b = rng.integers(0, 6, n)
        got = _pareto_mask(a.astype(np.int64), b.astype(np.int64))
        want = np.array(
            [
                not any(
                    (a[j] <= a[i] and b[j] <= b[i])
                    and (a[j] < a[i] or b[j] < b[i])
                    for j in range(n)
                )
                for i in range(n)
            ]
        )
        assert np.array_equal(got, want), (a.tolist(), b.tolist())


def test_hll_overlap_algebra(tmp_path):
    """Planted overlap: 200 click users, 200 view users, 100 shared —
    inclusion-exclusion over merged registers lands within the gate's
    error budget, and disjoint segments estimate ~0 overlap."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_hll_overlap,
        q_hll_overlap_check,
    )

    click_users = list(range(0, 200))
    view_users = list(range(100, 300))       # 100..199 shared
    scroll_users = list(range(1000, 1100))   # disjoint from both
    users = click_users + view_users + scroll_users
    types = ["click"] * 200 + ["view"] * 200 + ["scroll"] * 100
    n = len(users)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) + 1_700_000_000_000_000
            ).view(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    ov = q_hll_overlap(str(tmp_path)).to_pandas().set_index(["type_a", "type_b"])
    est = ov.loc[("click", "view"), "est_overlap"]
    assert 70 <= est <= 130                     # ~100 ± sketch error
    assert ov.loc[("click", "scroll"), "est_overlap"] <= 30
    chk = q_hll_overlap_check(str(tmp_path)).to_pandas()
    assert int(chk["exact_overlap"][0]) == 100
    assert bool(chk["within_bound"][0])


def test_salted_distinct_hot_key(tmp_path):
    """A planted hot key (90% of events one type) still counts exactly:
    per-shard distincts sum to the true distinct, repeat visits and
    cross-shard users all handled."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_salted_distinct_users,
    )

    rng = np.random.default_rng(2)
    n = 9000
    users = rng.integers(0, 700, n)          # ~700 distinct, many repeats
    types = np.where(np.arange(n) % 10 < 9, "hot", "cold")
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) + 1_700_000_000_000_000
            ).view(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types.tolist()),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = (
        q_salted_distinct_users(str(tmp_path))
        .to_pandas()
        .set_index("event_type")["n_users"]
    )
    hot_truth = len(set(users[np.arange(n) % 10 < 9].tolist()))
    cold_truth = len(set(users[np.arange(n) % 10 >= 9].tolist()))
    assert out["hot"] == hot_truth
    assert out["cold"] == cold_truth
