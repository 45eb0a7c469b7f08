"""Edge-semantics tests for the corpus-cleaning operators (the driver
gate value-checks them against DuckDB at sf0.01/sf0.1; these pin the
corner cases with hand-built fixtures): word-boundary redaction,
all-stopword and empty documents, LM scoring excluding zero-token docs,
and diversity math on planted repetition."""

import math

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


def test_redaction_word_boundaries(tmp_path):
    """'customers' must NOT be redacted (word boundary); counts and
    lengths reflect only whole-word hits."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_pattern_redaction,
    )

    sf = _write_docs(tmp_path, ["customer customers spark sparkly", "no hits here", ""])
    out = q_pattern_redaction(sf).to_pandas().sort_values("doc_id")
    assert out["n_hits"].tolist() == [2, 0, 0]
    assert out["redacted"].tolist() == [
        "[ENT] customers [ENT] sparkly",
        "no hits here",
        "",
    ]
    assert out["red_len"].tolist() == [29, 12, 0]


def test_stopword_filter_degenerate_docs(tmp_path):
    """All-stopword doc collapses to empty (0 tokens, all removed);
    empty doc stays empty with zero counts."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_stopword_filter,
    )

    sf = _write_docs(tmp_path, ["the a the", "the quick fox", "", "a"])
    out = q_stopword_filter(sf).to_pandas().sort_values("doc_id")
    assert out["clean_text"].tolist() == ["", "quick fox", "", ""]
    assert out["n_tokens"].tolist() == [0, 2, 0, 0]
    assert out["n_removed"].tolist() == [3, 1, 0, 1]


def test_unigram_lm_scores_math(tmp_path):
    """Corpus = 3x 'x', 1x 'y': p(x)=3/4, p(y)=1/4; zero-token docs are
    excluded from the output like the SQL side."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_unigram_lm_scores,
    )

    sf = _write_docs(tmp_path, ["x x", "x y", ""])
    out = q_unigram_lm_scores(sf).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_tokens"].tolist() == [2, 2]
    exp0 = math.floor(math.log(0.75) * 1e6) / 1e6
    exp1 = math.floor((math.log(0.75) + math.log(0.25)) / 2 * 1e6) / 1e6
    assert out["avg_logp"].tolist() == [exp0, exp1]


def test_token_diversity_planted_repetition(tmp_path):
    """'x x x x' -> gini 0, ttr 0.25; four distinct tokens -> gini 0.75,
    ttr 1.0."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_token_diversity,
    )

    sf = _write_docs(tmp_path, ["x x x x", "a b c d", ""])
    out = q_token_diversity(sf).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 1]
    assert out["distinct_tokens"].tolist() == [1, 4]
    assert out["gini"].tolist() == [0.0, 0.75]
    assert out["type_token_ratio"].tolist() == [0.25, 1.0]


def test_source_jsd_bounds(tmp_path):
    """A source identical to the corpus mix scores ~0; a fully disjoint
    vocabulary source scores near the ln(2) JSD maximum."""
    import math

    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_source_jsd,
    )

    texts = ["alpha beta gamma"] * 6 + ["zzz qqq www"] * 2
    tbl_sources = ["same"] * 6 + ["weird"] * 2
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 8),
            "source": pa.array(tbl_sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_source_jsd(str(tmp_path)).to_pandas().set_index("source")["jsd"]
    assert out["same"] < out["weird"]
    assert out["weird"] <= math.log(2) + 1e-9
    assert out["same"] >= 0.0


def test_split_deterministic_and_total(tmp_path):
    """Every doc gets exactly one split; assignment is stable across
    runs and insensitive to corpus growth (hash of the id only)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.scalar_suite import (
        q_train_val_test_split,
    )

    texts = [f"doc body {i}" for i in range(60)]
    sf = _write_docs(tmp_path, texts)
    a = q_train_val_test_split(sf).to_pandas().sort_values("doc_id")
    b = q_train_val_test_split(sf).to_pandas().sort_values("doc_id")
    assert a["split"].tolist() == b["split"].tolist()
    assert set(a["split"]) <= {"train", "val", "test"}
    assert a["split"].value_counts()["train"] > 30  # ~80 % of 60


def test_segment_dedup_planted(tmp_path):
    """A shared 8-token segment is dropped from BOTH docs (each
    occurrence counted); a segment repeated only WITHIN one doc stays
    (frequency counts distinct docs); tail tokens (<8) never count as a
    segment but stay in kept_tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_segment_dedup,
    )

    shared = "a b c d e f g h"          # the frequent segment
    solo = "p q r s t u v w"            # unique to doc 2, repeated there
    rows = [
        # doc 0: shared + 8 unique + 3-token tail -> 2 segs, 1 dropped
        {"doc_id": 0, "text": shared + " i j k l m n o zz tail one two"},
        # doc 1: unique 8 + shared -> 2 segs, 1 dropped
        {"doc_id": 1, "text": "z y x w v u t s " + shared},
        # doc 2: solo twice (same doc!) -> 2 segs, 0 dropped
        {"doc_id": 2, "text": solo + " " + solo},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = (
        q_segment_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_segments"]) == [2, 2, 2]
    assert list(out["n_dropped"]) == [1, 1, 0]
    assert list(out["kept_tokens"]) == [19 - 8, 16 - 8, 16]


def test_cdc_dedup_insertion_robust(tmp_path):
    """The CDC property fixed-width segments lack: inserting words near
    the HEAD of a near-duplicate still leaves the shared tail chunks
    byte-identical, so the pair is caught as duplicate content."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_cdc_dedup,
        q_segment_dedup,
    )

    rng = np.random.default_rng(5)
    words = [f"w{int(x)}" for x in rng.integers(0, 500, size=120)]
    base = " ".join(words)
    shifted = "inserted words here " + base   # head insertion
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": shifted},
        {"doc_id": 2, "text": " ".join(f"z{int(x)}" for x in rng.integers(0, 500, 120))},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    cdc = q_cdc_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    # docs 0 and 1 share most chunks despite the shift; doc 2 shares none
    assert cdc.loc[0, "n_dup_chunks"] >= cdc.loc[0, "n_chunks"] * 0.5
    assert cdc.loc[1, "n_dup_chunks"] >= 1
    assert cdc.loc[2, "n_dup_chunks"] == 0
    # contrast: aligned fixed segments find nothing after the shift
    seg = q_segment_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert seg.loc[0, "n_dropped"] == 0


def test_boilerplate_prefix_edges(tmp_path):
    """Docs shorter than 8 tokens never form a prefix; count is per
    occurrence; 9th token may differ (only the first 8 key the group)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_boilerplate_prefixes,
    )

    head = "a b c d e f g h"
    rows = [
        {"doc_id": 0, "text": head + " tail1"},
        {"doc_id": 1, "text": head + " tail2"},
        {"doc_id": 2, "text": head},              # exactly 8 tokens: counts
        {"doc_id": 3, "text": "a b c d e f g"},   # 7 tokens: excluded
        {"doc_id": 4, "text": "x y z q r s t u solo"},  # unique prefix
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = q_boilerplate_prefixes(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["prefix"][0] == head and out["n_docs"][0] == 3


def test_cdc_unicode_sql_parity(tmp_path):
    """CDC chunking parity vs DuckDB on NON-ASCII text (multibyte UTF-8
    incl. CJK and astral-plane emoji) — the sf corpora are ASCII-only,
    so this is the one place the codepoint decode path is cross-checked
    against SQL on 2-4 byte sequences."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        Q_CDC_DEDUP_SQL,
        q_cdc_dedup,
    )

    texts = [
        "héllo wörld ünïcode text càfé niño — ascii mix 1234 " * 3,
        "日本語のテキストです。これはテストです。" * 4,
        "emoji 😀😁😂🤣 astral plane 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 mixed ascii tail " * 3,
        "héllo wörld ünïcode text càfé niño — ascii mix 1234 " * 3,  # dup of 0
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (
        q_cdc_dedup(str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.execute(Q_CDC_DEDUP_SQL).df()
        .sort_values("doc_id").reset_index(drop=True)
        .astype({"n_chunks": "int64", "n_dup_chunks": "int64",
                 "dup_chars": "int64"})
    )
    assert got.equals(want.astype(got.dtypes.to_dict()))
    assert got.loc[0, "n_dup_chunks"] >= 1      # the planted dup pair
