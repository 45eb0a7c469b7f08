"""Semantics tests for the training-data-prep operators (the driver
gate value-matches them against DuckDB; these pin the windowing /
packing / contamination rules with hand-built fixtures)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medical_and_charity_document_extraction_system_ray.pipelines.training_prep import (
    q_chunk_plan,
    q_decontaminate,
    q_pack_plan,
)


def _write_docs(tmp_path, texts, doc_ids=None, sources=None):
    n = len(texts)
    doc_ids = doc_ids if doc_ids is not None else list(range(n))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources if sources is not None else ["s0"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_windows_cover_and_overlap(tmp_path):
    """70 tokens, window 32 / stride 24 -> chunks at 0/24/48 with
    lengths 32/32/22; stride-aligned overlap of 8 tokens."""
    toks = [f"t{i}" for i in range(70)]
    sf = _write_docs(tmp_path, [" ".join(toks)])
    out = (
        q_chunk_plan(sf, window=32, stride=24)
        .to_pandas()
        .sort_values("chunk_idx")
        .reset_index(drop=True)
    )
    assert list(out["chunk_idx"]) == [0, 1, 2]
    assert list(out["n_tokens"]) == [32, 32, 22]
    chunks = [c.split(" ") for c in out["chunk_text"]]
    assert chunks[0] == toks[0:32]
    assert chunks[1] == toks[24:56]
    assert chunks[2] == toks[48:70]
    # overlap region agrees between consecutive chunks
    assert chunks[0][24:] == chunks[1][:8]


def test_chunk_short_and_blank_docs(tmp_path):
    """A doc shorter than one window emits exactly one chunk; an
    all-whitespace doc emits none (empty tokens are filtered)."""
    sf = _write_docs(tmp_path, ["alpha beta  gamma", "   "])
    out = q_chunk_plan(sf, window=32, stride=24).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["doc_id"] == 0
    assert out.iloc[0]["chunk_text"] == "alpha beta gamma"
    assert out.iloc[0]["n_tokens"] == 3


def test_pack_offset_boundaries(tmp_path):
    """Budget 256, per-source doc_id order: packs split where the
    *preceding* cumulative token count crosses a budget multiple, and
    pack token sums partition the total."""
    texts = [" ".join(["w"] * n) for n in (100, 100, 100, 60)]
    sf = _write_docs(tmp_path, texts)
    out = (
        q_pack_plan(sf, budget=256)
        .to_pandas()
        .sort_values("pack_id")
        .reset_index(drop=True)
    )
    # cum_before = 0,100,200,300 -> packs 0,0,0,1
    assert list(out["pack_id"]) == [0, 1]
    assert list(out["n_docs"]) == [3, 1]
    assert list(out["pack_tokens"]) == [300, 60]
    assert list(out["first_doc"]) == [0, 3]
    assert list(out["last_doc"]) == [2, 3]
    assert out["pack_tokens"].sum() == 360


def test_pack_is_per_source(tmp_path):
    """Sources pack independently — each restarts at pack_id 0."""
    texts = [" ".join(["w"] * 300)] * 4
    sf = _write_docs(tmp_path, texts, sources=["a", "a", "b", "b"])
    out = q_pack_plan(sf, budget=256).to_pandas()
    for src in ("a", "b"):
        sub = out[out["source"] == src].sort_values("pack_id")
        assert list(sub["pack_id"]) == [0, 1]
        assert list(sub["n_docs"]) == [1, 1]


def test_decontaminate_planted_overlap(tmp_path):
    """doc_id 0 (0 % 97 == 0) is the benchmark; a training doc sharing
    a word 4-gram is flagged with the distinct-hit count, one without
    any shared 4-gram is clean."""
    bench = "the quick brown fox jumps over the lazy dog"
    hot = "intro words then the quick brown fox appears here"  # one shared 4-gram
    cold = "completely different tokens with no shared phrase at all"
    sf = _write_docs(tmp_path, [bench, hot, cold], doc_ids=[0, 1, 2])
    out = q_decontaminate(sf, n=4, holdout_mod=97).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 2]  # benchmark doc excluded from output
    assert bool(out.loc[1, "contaminated"]) is True
    assert out.loc[1, "n_hits"] == 1
    assert bool(out.loc[2, "contaminated"]) is False
    assert out.loc[2, "n_hits"] == 0


def test_decontaminate_counts_distinct_grams(tmp_path):
    """A training doc repeating the same contaminated 4-gram twice
    counts it once; two different shared 4-grams count twice."""
    bench = "a b c d e f"  # bench 4-grams: 'a b c d', 'b c d e', 'c d e f'
    rep = "a b c d x a b c d"  # 'a b c d' twice -> 1 distinct hit
    two = "a b c d e zz"  # 'a b c d' + 'b c d e' -> 2 distinct hits
    sf = _write_docs(tmp_path, [bench, rep, two], doc_ids=[0, 1, 2])
    out = q_decontaminate(sf, n=4, holdout_mod=97).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_hits"] == 1
    assert out.loc[2, "n_hits"] == 2


def test_weighted_sample_funnel_invariance(tmp_path):
    """The per-batch local-top-k funnel must select the same set as a
    single brute-force pass, regardless of how rows are split into
    blocks."""
    import ray.data
    from medical_and_charity_document_extraction_system_ray.functions.text import (
        fingerprint64,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines.scalar_suite import (
        _U53,
        q_weighted_sample,
    )

    n = 40
    texts = ["x" * (i + 1) for i in range(n)]
    sf = _write_docs(tmp_path, texts, doc_ids=list(range(n)))
    got = set(q_weighted_sample(sf, k=5).to_pandas()["doc_id"])

    # brute force with identical arithmetic
    ids = pa.array([str(i) for i in range(n)])
    h = fingerprint64(ids)
    u = ((h % np.uint64(_U53)) + np.uint64(1)).astype(np.float64) / float(_U53 + 1)
    w = np.maximum(np.array([i + 1 for i in range(n)], np.int64), 1).astype(np.float64)
    key = np.log(u) / w
    want = set(np.argsort(-key, kind="stable")[:5].tolist())
    assert got == want


def test_repetition_scores_planted(tmp_path):
    """'a b a b a' has 2-grams [ab, ba, ab, ba] (all repeated -> ratio
    1.0) and top token 'a' 3/5; a no-repeat doc scores 0 and 1/4."""
    sf = _write_docs(tmp_path, ["a b a b a", "w x y z"])
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_repetition_scores,
    )

    out = q_repetition_scores(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_2gram_ratio"] == 1.0
    assert abs(out.loc[0, "top_token_ratio"] - np.floor(3 / 5 * 1e6) / 1e6) < 1e-9
    assert out.loc[1, "dup_2gram_ratio"] == 0.0
    assert out.loc[1, "top_token_ratio"] == 0.25


def test_heavy_hitters_guarantee_on_skewed_corpus(tmp_path):
    """One token dominates a 40-token vocabulary: Misra-Gries with
    k=4 counters must surface it with estimate within n/(k+1) of the
    exact count, even though per-batch compression is aggressive."""
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_heavy_hitters,
        q_heavy_hitters_check,
    )

    rng = np.random.default_rng(3)
    texts = []
    for _ in range(30):
        toks = ["hot"] * 20 + [f"w{rng.integers(40)}" for _ in range(20)]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    sf = _write_docs(tmp_path, texts)
    n = 30 * 40
    sk = q_heavy_hitters(sf, k=4).to_pandas().set_index("token")["est"]
    exact_hot = 30 * 20
    assert "hot" in sk.index
    assert exact_hot - sk["hot"] <= n / 5.0
    assert sk["hot"] <= exact_hot  # MG never overestimates
    assert len(sk) <= 4
    chk = q_heavy_hitters_check(sf, k=4).to_pandas()
    assert "hot" in set(chk["token"])
    assert chk["est_ok"].all()
