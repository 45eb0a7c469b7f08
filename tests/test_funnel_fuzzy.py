"""Semantics tests for the funnel and fuzzy-vocabulary operators."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
    _lev_pairs,
    q_fuzzy_vocab_pairs,
)
from medical_and_charity_document_extraction_system_ray.pipelines.events import q_funnel


def _write_events(tmp_path, rows):
    """rows: list of (user_id, event_type, ts_us)."""
    n = len(rows)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.asarray([r[2] for r in rows], np.int64)
            ).view(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_strict_order(tmp_path):
    """click BEFORE the first view must not count as step 2, and a
    purchase between view and click must not count as step 3."""
    t0 = 1_700_000_000 * 1_000_000
    rows = [
        # user 1: full ordered funnel
        (1, "view", t0), (1, "click", t0 + 10), (1, "purchase", t0 + 20),
        # user 2: click precedes the only view -> stops at step 1
        (2, "click", t0), (2, "view", t0 + 10),
        # user 3: purchase between view and click -> stops at step 2
        (3, "view", t0), (3, "purchase", t0 + 5), (3, "click", t0 + 10),
        # user 4: never viewed -> not in the funnel at all
        (4, "purchase", t0),
    ]
    out = q_funnel(_write_events(tmp_path, rows))
    assert out.iloc[0]["n_view"] == 3
    assert out.iloc[0]["n_view_click"] == 2  # users 1 and 3
    assert out.iloc[0]["n_full_funnel"] == 1  # user 1 only


def test_funnel_uses_first_qualifying_step_time(tmp_path):
    """Step 2 is the FIRST click after the first view: a later click
    must not push the purchase window forward."""
    t0 = 1_700_000_000 * 1_000_000
    rows = [
        (1, "view", t0),
        (1, "click", t0 + 10),      # first qualifying click
        (1, "purchase", t0 + 15),   # after first click -> counts
        (1, "click", t0 + 20),      # later click is irrelevant
    ]
    out = q_funnel(_write_events(tmp_path, rows))
    assert out.iloc[0]["n_full_funnel"] == 1


def _py_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_lev_pairs_matches_reference():
    rng = np.random.default_rng(42)
    alpha = np.array(list("abcde"))
    strs = ["".join(rng.choice(alpha, rng.integers(0, 9))) for _ in range(60)]
    a = [strs[i] for i in range(0, 60, 2)]
    b = [strs[i] for i in range(1, 60, 2)]
    mw = max(max((len(s) for s in a), default=1), max((len(s) for s in b), default=1), 1)
    ac = np.array(a, dtype=f"U{mw}").view(np.uint32).reshape(len(a), mw)
    bc = np.array(b, dtype=f"U{mw}").view(np.uint32).reshape(len(b), mw)
    al = np.array([len(s) for s in a], np.int64)
    bl = np.array([len(s) for s in b], np.int64)
    got = _lev_pairs(ac, al, bc, bl)
    want = np.array([_py_lev(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, want)


def test_fuzzy_vocab_banding_finds_cross_length_pairs(tmp_path):
    """Pairs whose lengths straddle a bucket boundary (len 5 vs 7 with
    width-3 buckets) must still be found via the bucket-below emit."""
    names = ["abcde", "abcdefg", "zzzzz", "qq"]  # abcde<->abcdefg dist 2
    tbl = pa.table(
        {
            "p_partkey": pa.array(range(len(names)), pa.int64()),
            "p_name": pa.array(names),
            "p_brand": pa.array(["b"] * len(names)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "part.parquet"))
    out = q_fuzzy_vocab_pairs(str(tmp_path), max_dist=2).to_pandas()
    got = set(zip(out["name_a"], out["name_b"], out["dist"]))
    assert ("abcde", "abcdefg", 2) in got
    # no duplicate pair rows even though both names share two buckets
    assert len(out) == len(out.drop_duplicates(["name_a", "name_b"]))
    assert all(out["dist"] <= 2)


def test_pagerank_neardup_planted_graph(tmp_path):
    """A path graph A-B-C (B overlaps both halves, A and C share
    nothing): ranks must match a numpy power iteration, with the hub B
    outranking the leaves."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_pagerank_neardup,
    )

    q1 = [f"q{i}" for i in range(12)]
    q2 = [f"r{i}" for i in range(12)]
    # jaccard(A,B) = jaccard(B,C) = 10/22 ~ 0.45; jaccard(A,C) = 0
    texts = [" ".join(q1), " ".join(q1 + q2), " ".join(q2),
             "totally unrelated words here now"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        q_pagerank_neardup(str(tmp_path), iters=3, jaccard_threshold=0.4)
        .to_pandas()
        .set_index("doc_id")["rank"]
    )
    assert sorted(out.index) == [0, 1, 2]  # doc 3 has no dup edge
    # numpy reference: path 0-1-2 (hub 1 has deg 2, leaves deg 1)
    edges = [(0, 1), (1, 2)]
    deg = np.zeros(3)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    r = np.full(3, 1 / 3)
    for _ in range(3):
        nxt = np.full(3, 0.15 / 3)
        for a, b in edges:
            nxt[b] += 0.85 * r[a] / deg[a]
            nxt[a] += 0.85 * r[b] / deg[b]
        r = nxt
    want = np.floor(r * 1e6 + 1e-3) / 1e6
    got = out.sort_index().to_numpy()
    assert np.allclose(got, want, atol=2e-6)
    assert got[1] > got[0]  # the hub outranks the leaves
