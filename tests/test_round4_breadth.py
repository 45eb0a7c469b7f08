"""Edge-semantics tests for the round-4 breadth operators (the driver
gate value-checks them against DuckDB at sf0.01/sf0.1; these pin corner
semantics with hand-built fixtures): DSIR target-domain preference,
Gopher rule boundary inclusion/exclusion, BM25 tf monotonicity and
non-match exclusion, normalized-dedup key collapse, cluster-size
histogram shape, Kneser-Ney distinct-context counting, SemDeDup
precision on a clustered fixture, and PCA axis recovery."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_documents(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs or ["en"] * n, pa.string()),
            "source": pa.array(sources or ["src0"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_embeddings(tmp_path, mat, labels=None):
    n = len(mat)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in mat], pa.list_(pa.float32())
            ),
            "label": pa.array(labels or [0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_dsir_prefers_target_like_docs(tmp_path):
    """A doc whose bigrams match the lang='en' target slice outscores a
    doc made of off-domain bigrams, regardless of its own lang tag."""
    from medical_and_charity_document_extraction_system_ray.pipelines.training_prep import (
        q_dsir_weights,
    )

    texts = (
        ["alpha beta alpha beta"] * 4      # en: the target domain
        + ["gamma delta gamma delta"] * 4  # de: off-domain bulk
        + ["alpha beta", "gamma delta"]    # two de probes
    )
    langs = ["en"] * 4 + ["de"] * 6
    sf = _write_documents(tmp_path, texts, langs)
    out = q_dsir_weights(sf).to_pandas().set_index("doc_id")
    assert out.loc[8, "avg_logw"] > out.loc[9, "avg_logw"]
    assert out.loc[8, "n_bigrams"] == 1
    # single-token doc has no bigrams -> excluded
    sf2 = _write_documents(tmp_path, ["alpha", "alpha beta"], ["en", "en"])
    out2 = q_dsir_weights(sf2).to_pandas()
    assert set(out2["doc_id"]) == {1}


def test_gopher_rule_boundaries(tmp_path):
    """Boundary semantics: nw=20 passes r_words, 19 fails; mean length
    exactly 3 passes (<= is inclusive); digit fraction exactly 20%
    fails (strict <)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_gopher_rules,
    )

    texts = [
        " ".join(["the"] + ["abc"] * 19),   # nw=20, mean len 3.0 -> pass
        " ".join(["the"] + ["abc"] * 18),   # nw=19 -> r_words fails
        " ".join(["the"] + ["abc"] * 17 + ["ab1"] * 2),  # 2 digits / 60 chars -> pass digit
        " ".join(["the"] + ["a12"] * 19),   # 38/60 digits -> r_digit fails
    ]
    sf = _write_documents(tmp_path, texts)
    out = q_gopher_rules(sf).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"])
    assert not bool(out.loc[1, "r_words"]) and bool(out.loc[1, "r_mean_len"])
    assert bool(out.loc[2, "r_digit"])
    assert not bool(out.loc[3, "r_digit"])
    assert bool(out.loc[0, "r_stopword"])


def test_bm25_tf_monotone_and_exclusion(tmp_path):
    """More query-term occurrences at equal length -> higher score;
    docs with no query term never appear."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_bm25_search,
    )

    texts = [
        "table table table pad pad pad",
        "table pad pad pad pad pad",
        "nothing relevant here at all pad",
    ]
    sf = _write_documents(tmp_path, texts)
    out = q_bm25_search(sf).to_pandas().set_index("doc_id")
    assert 2 not in out.index
    assert out.loc[0, "score"] > out.loc[1, "score"]


def test_dedup_normalized_collapses_case_and_punct(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_dedup_normalized,
    )

    sf = _write_documents(
        tmp_path, ["Hello, World!", "hello world", "  HELLO   world  ", "other"]
    )
    out = q_dedup_normalized(sf).to_pandas().sort_values("doc_id")
    assert out["n_dups"].tolist() == [3, 1]
    assert out["doc_id"].tolist() == [0, 3]


def test_dup_cluster_sizes_histogram(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_dup_cluster_sizes,
    )

    sf = _write_documents(tmp_path, ["a"] * 3 + ["b"] * 2 + ["c", "d"])
    out = q_dup_cluster_sizes(sf).to_pandas().set_index("cluster_size")
    assert out.loc[3, "n_clusters"] == 1
    assert out.loc[2, "n_clusters"] == 1
    assert out.loc[1, "n_clusters"] == 2


def test_kn_continuation_distinct_contexts(tmp_path):
    """n1p counts DISTINCT left contexts: 'b' after both 'a' and 'c'
    scores 2 even when 'a b' repeats."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_kn_continuation,
    )

    sf = _write_documents(tmp_path, ["a b a b c b", "a b"])
    out = q_kn_continuation(sf).to_pandas().set_index("token")
    # bigram types: (a,b), (b,a), (b,c), (c,b) -> total 4
    assert out.loc["b", "n1p"] == 2          # after 'a' and after 'c'
    assert out.loc["a", "n1p"] == 1
    assert abs(out.loc["b", "p_cont"] - 0.5) < 1e-9


def test_semdedup_finds_clustered_pairs(tmp_path):
    """Two tight antipodal clusters: every within-cluster pair clears
    the threshold and SemDeDup reports it (same-cluster by
    construction); reported pairs are a subset of the exact sweep."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_embedding_neardup,
        q_semdedup,
    )

    rng = np.random.RandomState(7)
    base1 = np.ones(16) / 4.0
    base2 = -base1
    mat = np.concatenate(
        [
            base1 + rng.normal(0, 0.01, (20, 16)),
            base2 + rng.normal(0, 0.01, (20, 16)),
        ]
    )
    sf = _write_embeddings(tmp_path, mat)
    sem = q_semdedup(sf, k=2, iters=2, threshold=0.9).to_pandas()
    exact = q_embedding_neardup(sf, threshold=0.9).to_pandas()
    sem_set = set(zip(sem["vec_a"], sem["vec_b"]))
    exact_set = set(zip(exact["vec_a"], exact["vec_b"]))
    assert sem_set <= exact_set
    assert len(exact_set) == 2 * (20 * 19 // 2)  # all within-cluster pairs
    assert sem_set == exact_set  # tight clusters -> full recall


def test_pca_recovers_dominant_axis(tmp_path):
    """Variance concentrated on axis 0 -> first component is ±e0 and
    the gate's invariants hold."""
    from medical_and_charity_document_extraction_system_ray.pipelines.similarity import (
        pca_fit,
        q_pca_check,
        q_pca_project,
    )

    rng = np.random.RandomState(3)
    mat = np.zeros((50, 8))
    mat[:, 0] = rng.normal(0, 1.0, 50)
    mat[:, 1:] = rng.normal(0, 0.01, (50, 7))
    sf = _write_embeddings(tmp_path, mat)
    _mean, comps, evals, n = pca_fit(sf, n_components=2)
    assert n == 50
    assert abs(abs(comps[0, 0]) - 1.0) < 0.01
    assert evals[0] > 10 * evals[1]
    check = q_pca_check(sf, n_components=2).to_pandas()
    assert bool(check["orthonormal"].iloc[0]) and bool(check["var_match"].iloc[0])
    proj = q_pca_project(sf, n_components=2).to_pandas()
    assert len(proj) == 100  # 50 vectors x 2 components


def test_token_fertility_multibyte_bytes(tmp_path):
    """n_bytes counts UTF-8 bytes (not codepoints): a 2-byte character
    doubles the byte count of an equal-length ASCII doc."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_token_fertility,
    )

    sf = _write_documents(tmp_path, ["aa aa", "éé éé"], langs=["en", "fr"])
    out = q_token_fertility(sf).to_pandas().set_index("lang")
    assert out.loc["en", "n_bytes"] == 5
    assert out.loc["fr", "n_bytes"] == 9  # 4 x 2-byte é + 1 space
    assert out.loc["en", "ws_tokens"] == 2


def test_flesch_known_value(tmp_path):
    """'the cat sat on a mat' -> 6 words, 6 vowel groups, 1 sentence
    (no terminal punctuation -> floor of 1): 206.835 - 1.015*6 - 84.6*1."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_flesch_scores,
    )

    sf = _write_documents(tmp_path, ["the cat sat on a mat", ""])
    out = q_flesch_scores(sf).to_pandas()
    assert out["doc_id"].tolist() == [0]  # zero-word doc excluded
    row = out.iloc[0]
    assert row["n_words"] == 6 and row["n_syllables"] == 6
    assert row["n_sentences"] == 1
    want = 206.835 - 1.015 * 6.0 - 84.6 * 1.0
    assert abs(row["flesch"] - np.floor(want * 1e6) / 1e6) < 1e-9


def test_dup_substring_fraction_shared_run(tmp_path):
    """Two docs sharing a 20-char prefix have duplicated windows from
    that run; a disjoint doc reports 0."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_dup_substring_fraction,
    )

    shared = "abcdefghijklmnopqrst"  # 20 chars + the following space
    sf = _write_documents(
        tmp_path,
        [shared + " one tail here", shared + " two other tail", "zz" * 20],
    )
    out = q_dup_substring_fraction(sf).to_pandas().set_index("doc_id")
    # offsets 0..5 share their window (the space after the prefix is
    # shared too; offset 6 first sees 'o' vs 't') -> 6 dup positions
    assert out.loc[0, "n_dup_positions"] == 6
    assert out.loc[1, "n_dup_positions"] == 6
    assert out.loc[2, "n_dup_positions"] == 0
    assert out.loc[2, "dup_frac"] == 0.0
    assert out.loc[0, "n_windows"] == len(shared + " one tail here") - 15


def test_hard_negatives_nearest_other_label(tmp_path):
    """The top negative for anchor 0 is the different-label vector
    closest in angle, never a same-label one."""
    from medical_and_charity_document_extraction_system_ray.pipelines.similarity import (
        q_hard_negatives,
    )

    e = np.eye(8)
    mat = np.stack(
        [
            e[0],                      # 0: anchor, label 0
            e[0] * 0.9 + e[1] * 0.1,   # 1: label 0 (same -> excluded)
            e[0] * 0.8 + e[1] * 0.2,   # 2: label 1, closest negative
            e[1],                      # 3: label 1, orthogonal
        ]
    )
    sf = _write_embeddings(tmp_path, mat, labels=[0, 0, 1, 1])
    out = q_hard_negatives(sf, n_anchors=1, k=2).to_pandas()
    assert set(out["anchor"]) == {0}
    ranked = out.sort_values("cosine", ascending=False)["neg"].tolist()
    assert ranked == [2, 3]
    assert 1 not in set(out["neg"])


def test_retrieval_eval_ranks(tmp_path):
    """Anchor 0's top-2 neighbours: the same-label vector at rank 1 ->
    n_hits counts it, first_rank = 1; an anchor whose neighbours are
    all other-label gets first_rank 0."""
    from medical_and_charity_document_extraction_system_ray.pipelines.similarity import (
        q_retrieval_eval,
    )

    e = np.eye(8)
    mat = np.stack(
        [
            e[0],
            e[0] * 0.95 + e[1] * 0.05,  # same label as 0, nearest
            e[0] * 0.7 + e[1] * 0.3,    # other label
            e[2],                        # orthogonal filler
        ]
    )
    sf = _write_embeddings(tmp_path, mat, labels=[0, 0, 1, 2])
    out = q_retrieval_eval(sf, n_anchors=1, k=2).to_pandas().set_index("anchor")
    assert out.loc[0, "n_hits"] == 1
    assert out.loc[0, "first_rank"] == 1


def test_domain_cap_bottom_k_by_hash(tmp_path):
    """One source, 30 docs, cap 15: exactly the 15 smallest signed
    fingerprint64(doc_id) values survive, ranked 1..15."""
    import pyarrow.compute as pc

    from medical_and_charity_document_extraction_system_ray.functions.text import (
        fingerprint64,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines.training_prep import (
        q_domain_cap,
    )

    sf = _write_documents(tmp_path, [f"doc number {i}" for i in range(30)])
    out = q_domain_cap(sf).to_pandas().sort_values("rn")
    assert len(out) == 15
    assert list(out["rn"]) == list(range(1, 16))
    ids = pa.array([str(i) for i in range(30)], pa.string())
    hs = fingerprint64(ids).view(np.int64)
    expect = [d for _, d in sorted(zip(hs, range(30)))][:15]
    assert sorted(out["doc_id"]) == sorted(expect)
    # rank order follows the hash order exactly
    assert list(out["doc_id"]) == expect


def test_cross_source_dup_matrix_counts(tmp_path):
    """text 'a' in s1 x1 + s2 x2 -> (s1,s2)=2 cross pairs and
    (s2,s2)=1 same-source pair; text 'b' in s1+s3 -> (s1,s3)=1;
    unique text 'c' contributes nothing."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_cross_source_dup_matrix,
    )

    sf = _write_documents(
        tmp_path,
        ["a", "a", "a", "b", "b", "c"],
        sources=["s1", "s2", "s2", "s1", "s3", "s1"],
    )
    out = q_cross_source_dup_matrix(sf).to_pandas()
    got = {
        (r.source_a, r.source_b): r.dup_pairs for r in out.itertuples()
    }
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s2"): 1}


def test_cross_source_dup_matrix_empty_schema(tmp_path):
    """All-unique corpus: zero rows but the pinned 3-column schema."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_cross_source_dup_matrix,
    )

    sf = _write_documents(tmp_path, ["x", "y", "z"], sources=["s1", "s2", "s3"])
    ds = q_cross_source_dup_matrix(sf)
    assert ds.count() == 0
    assert ds.schema().names == ["source_a", "source_b", "dup_pairs"]


def test_approx_quantiles_rank_bound(tmp_path):
    """Skewed + heavily tied values: every estimate's exact rank
    interval must intersect q*n +/- tol*n, and the per-block summary
    must actually thin (reps << rows)."""
    import pyarrow.parquet as pq2

    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        q_approx_quantiles,
        q_approx_quantiles_check,
        _quantile_summary,
    )

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [np.full(400, 7.0), rng.gamma(2.0, 10.0, 600)]
    )  # 40% ties at 7.0 + a skewed tail
    tbl = pa.table({"l_extendedprice": pa.array(vals, pa.float64())})
    pq2.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    sf = str(tmp_path)

    out = q_approx_quantiles_check(sf).to_pandas()
    assert out["rank_ok"].all()
    assert (out["n_rows"] == 1000).all()

    # thinning ratio ~ eps * block_rows: tiny test blocks (~31 rows)
    # need a coarse eps for k > 1; at corpus block sizes eps=0.02 thins
    v, cum, n = _quantile_summary(sf, eps=0.2)
    assert n == 1000
    assert v.size < 350  # summary thins vs the 1000 rows

    est = q_approx_quantiles(sf).to_pandas()
    assert est["est"].is_monotonic_increasing


def test_hybrid_rrf_fuses_both_ranks(tmp_path):
    """RRF output must equal 1/(60+rank_bm25) + 1/(60+rank_jaccard)
    recomputed from the two ranker outputs, and docs without any query
    term never appear in either list or the fusion."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_bm25_search,
        q_hybrid_rrf,
        q_jaccard_search,
    )

    rng = np.random.RandomState(11)
    vocab = ["table", "hash", "merge", "row", "scan", "sort", "batch", "key"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 12)))
        for _ in range(28)
    ] + ["row scan sort", "batch key row"]  # no query terms at all
    sf = _write_documents(tmp_path, texts)

    a = (
        q_bm25_search(sf).to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    b = (
        q_jaccard_search(sf).to_pandas()
        .sort_values(["jac", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    ra = {int(d): i + 1 for i, d in enumerate(a["doc_id"])}
    rb = {int(d): i + 1 for i, d in enumerate(b["doc_id"])}
    out = q_hybrid_rrf(sf).to_pandas()
    for r in out.itertuples():
        want = (1.0 / (60 + ra[r.doc_id]) if r.doc_id in ra else 0.0) + (
            1.0 / (60 + rb[r.doc_id]) if r.doc_id in rb else 0.0
        )
        assert r.rrf == np.floor(want * 1e6) / 1e6
    assert 28 not in set(out["doc_id"]) and 29 not in set(out["doc_id"])
    assert 28 not in ra and 29 not in rb


def test_dup_rate_by_length_buckets(tmp_path):
    """Short dup pair lands in bucket 0 with rate 2/3; long uniques in
    bucket 1 with rate 0; 100-token doc clips into bucket 9."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_dup_rate_by_length,
    )

    texts = [
        "a b c",                      # bucket 0, dup x2
        "a b c",
        "unique short doc",           # bucket 0, unique
        " ".join(["w"] * 12),         # bucket 1, unique
        " ".join(["v"] * 15),         # bucket 1, unique
        " ".join(["z"] * 100),        # bucket 9 (clipped)
    ]
    sf = _write_documents(tmp_path, texts)
    out = q_dup_rate_by_length(sf).to_pandas().set_index("bucket")
    assert out.loc[0, "n_docs"] == 3 and out.loc[0, "n_dup_docs"] == 2
    assert out.loc[0, "dup_rate"] == np.floor(2 / 3 * 1e6) / 1e6
    assert out.loc[1, "n_docs"] == 2 and out.loc[1, "n_dup_docs"] == 0
    assert out.loc[9, "n_docs"] == 1
    assert set(out.index) == {0, 1, 9}


def test_quality_auc_midranks(tmp_path):
    """Hand-computed Mann-Whitney AUC: dup texts at mean-token-len 2
    and 3, uniques at 1, 2 (a tie), and 4.  P=4 copies, N=3 uniques;
    pairwise wins 6 + one tie (0.5x2 docs) -> AUC = 7/12."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_quality_auc,
    )

    texts = [
        "aa bb", "aa bb",        # dup pair, mtl 2.0
        "aaa bbb", "aaa bbb",    # dup pair, mtl 3.0
        "a b",                   # unique, mtl 1.0
        "aa cc",                 # unique, mtl 2.0 (ties the dup pair)
        "aaaa bbbb",             # unique, mtl 4.0
    ]
    out = q_quality_auc(_write_documents(tmp_path, texts)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["pos_docs"]) == 4 and int(r["neg_docs"]) == 3
    assert int(r["auc_num2"]) == 14  # 2*(sum of pairwise wins + ties/2)
    assert r["auc"] == np.floor(14 / 24 * 1e6) / 1e6


def test_quality_auc_degenerate_no_dups(tmp_path):
    """All-unique corpus has no positive class: AUC pinned to 0.0."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_quality_auc,
    )

    out = q_quality_auc(
        _write_documents(tmp_path, ["a b", "aa bb", "aaa bbb"])
    ).to_pandas()
    r = out.iloc[0]
    assert int(r["pos_docs"]) == 0 and int(r["neg_docs"]) == 3
    assert r["auc"] == 0.0 and int(r["auc_num2"]) == 0


def test_blame_suppliers_q21_semantics(tmp_path):
    """Hand-built Q21 fixture: supplier 1 is sole-R on two F orders
    (one with a second R supplier -> excluded; one single-supplier ->
    excluded; one order status 'O' -> excluded)."""
    import pyarrow.parquet as pq2

    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_blame_suppliers,
    )

    # orderkey: suppliers (returnflag)
    li = [
        (1, 1, "R"), (1, 2, "N"),            # F, multi, sole R=1 -> blame 1
        (2, 1, "R"), (2, 3, "N"), (2, 3, "R"),  # F, multi, two R supps -> none
        (3, 1, "R"),                          # F, single supplier -> none
        (4, 1, "R"), (4, 2, "N"),            # status O -> none
        (5, 2, "R"), (5, 1, "N"),            # F, multi, sole R=2 -> blame 2
        (6, 2, "R"), (6, 3, "A"),            # F, multi, sole R=2 -> blame 2
    ]
    pq2.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([x[0] for x in li], pa.int64()),
                "l_suppkey": pa.array([x[1] for x in li], pa.int64()),
                "l_returnflag": pa.array([x[2] for x in li], pa.string()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq2.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "o_orderstatus": pa.array(
                    ["F", "F", "F", "O", "F", "F"], pa.string()
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq2.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["Supp#1", "Supp#2", "Supp#3"], pa.string()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = (
        q_blame_suppliers(str(tmp_path))
        .to_pandas()
        .set_index("s_name")["n_blame"]
        .to_dict()
    )
    assert out == {"Supp#2": 2, "Supp#1": 1}


def test_lang_source_chi2_hand_value(tmp_path):
    """Perfectly dependent 2x2 contingency [[10,0],[0,10]] -> chi2 = n
    = 20, dof = 1; zero cells of the full grid are included."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_lang_source_chi2,
    )

    texts = ["t%d" % i for i in range(20)]
    langs = ["en"] * 10 + ["de"] * 10
    sources = ["s0"] * 10 + ["s1"] * 10
    out = q_lang_source_chi2(
        _write_documents(tmp_path, texts, langs, sources)
    ).to_pandas()
    r = out.iloc[0]
    assert int(r["n_docs"]) == 20 and int(r["dof"]) == 1
    assert r["chi2"] == 20.0


def test_global_running_revenue_brute_force(tmp_path):
    """Cross-day shuffled events: the two-phase day-offset scan must
    equal the single-threaded cumulative sum in (ts, event_id) order,
    including same-timestamp ties broken by event_id."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_global_running_revenue,
    )

    day = 86_400_000_000
    rng = np.random.RandomState(5)
    # 3 days, shuffled arrival order, duplicate timestamps included
    ts = np.concatenate(
        [d * day + rng.randint(0, day, size=40) for d in (3, 1, 2)]
    )
    ts[5] = ts[6]  # forced tie -> event_id break
    vals = rng.uniform(-50, 50, size=len(ts))
    sf = _write_events(tmp_path, ts, [0] * len(ts), vals)

    out = (
        q_global_running_revenue(sf)
        .to_pandas()
        .set_index("event_id")["cum_cents"]
    )
    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    order = np.lexsort((np.arange(len(ts)), ts))
    cum = np.cumsum(cents[order])
    for pos, eid in enumerate(order):
        assert out[eid] == cum[pos]


def test_corpus_prep_filter_dedup_attribution(tmp_path):
    """Quality gate drops short and digit-heavy docs; cross-source dup
    is counted once, attributed to the MIN doc_id's source."""
    from medical_and_charity_document_extraction_system_ray.pipelines.training_prep import (
        q_corpus_prep,
    )

    texts = [
        "alpha beta gamma delta epsilon",   # 0: keep (src B, keeper of dup)
        "alpha beta gamma delta epsilon",   # 1: dup   (src A)
        "one two",                          # 2: too short (< 5 tokens)
        "11 22 33 44 55 aa",                # 3: digit-heavy -> dropped
        "zeta eta theta iota kappa lambda", # 4: keep (src A)
    ]
    sources = ["B", "A", "A", "A", "A"]
    out = (
        q_corpus_prep(_write_documents(tmp_path, texts, sources=sources))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["B", "n_docs"] == 1 and out.loc["B", "n_tokens"] == 5
    assert out.loc["A", "n_docs"] == 1 and out.loc["A", "n_tokens"] == 6
    assert set(out.index) == {"A", "B"}


def test_top_users_per_hour_ranking_and_ties(tmp_path):
    """Two hours, tie on cents broken by user_id asc, k=3 cut."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_top_users_per_hour,
    )

    h = 3_600_000_000
    # hour 0: u1=30, u2=30 (tie), u3=20, u4=10 (cut); hour 1: u5 alone
    ts = [0, 1, 2, 3, 4, h + 1]
    users = [1, 2, 3, 4, 2, 5]
    vals = [0.30, 0.20, 0.20, 0.10, 0.10, 0.50]
    sf = _write_events(tmp_path, [t + 10 for t in ts], users, vals)
    out = q_top_users_per_hour(sf).to_pandas().sort_values(["hour", "rnk"])
    assert list(out["user_id"]) == [1, 2, 3, 5]
    assert list(out["rnk"]) == [1, 2, 3, 1]
    assert list(out["cents"]) == [30, 30, 20, 50]


def test_hapax_by_source_within_source_counts(tmp_path):
    """src A: vocab {x(2), y(1), z(1)} -> 2 hapax / 3 vocab; src B:
    vocab {x(1)} -> x is hapax IN B even though global count is 3."""
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_hapax_by_source,
    )

    texts = ["x y x", "z", "x"]
    sources = ["A", "A", "B"]
    out = (
        q_hapax_by_source(_write_documents(tmp_path, texts, sources=sources))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["A", "n_vocab"] == 3 and out.loc["A", "n_hapax"] == 2
    assert out.loc["A", "hapax_rate"] == np.floor(2 / 3 * 1e6) / 1e6
    assert out.loc["B", "n_vocab"] == 1 and out.loc["B", "n_hapax"] == 1


def test_unicode_audit_nfc_and_control(tmp_path):
    """Decomposed combining mark -> is_nfc False; BEL/US are control,
    tab/newline are NOT; CJK counts as non-ASCII and stays NFC."""
    from medical_and_charity_document_extraction_system_ray.pipelines.cleaning import (
        q_unicode_audit,
    )

    texts = [
        "plain ascii",
        "cafe\u0301 decomposed",   # combining acute -> non-NFC
        "caf\u00e9 composed",       # precomposed -> NFC
        "bell\x07 unit\x1f",
        "tab\tand\nnewline",
        "\u6c49\u5b57 cjk",
    ]
    out = (
        q_unicode_audit(_write_documents(tmp_path, texts))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["is_nfc"]) == [True, False, True, True, True, True]
    assert list(out["n_nonascii"]) == [0, 1, 1, 0, 0, 2]
    assert list(out["n_control"]) == [0, 0, 0, 2, 0, 0]


def test_ks_by_event_type_hand_value(tmp_path):
    """Two disjoint distributions: type A all at 1.00, type B all at
    2.00 -> KS = 1.0 both ways; a mixed type C at both values vs an
    equal rest gives a hand-computable supremum."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_ks_by_event_type,
    )

    vals = [1.0] * 4 + [2.0] * 4
    types = ["A"] * 4 + ["B"] * 4
    sf = _write_events(
        tmp_path, list(range(8)), [0] * 8, vals, event_type=types
    )
    out = q_ks_by_event_type(sf).to_pandas().set_index("event_type")
    # A vs rest: at c=100 ECDF_A=1, ECDF_B=0 -> KS=1; num = 4*4
    assert out.loc["A", "ks"] == 1.0 and out.loc["A", "ks_num"] == 16
    assert out.loc["B", "ks"] == 1.0 and out.loc["B", "n"] == 4


def test_event_paths_triples_respect_user_and_order(tmp_path):
    """Triples never cross users; arrival order is (ts, event_id)."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_event_paths,
    )

    # user 0: A B C A B C -> ABC x2, BCA, CAB; user 1: A B (too short)
    ts = [10, 20, 30, 40, 50, 60, 10, 20]
    users = [0, 0, 0, 0, 0, 0, 1, 1]
    types = ["A", "B", "C", "A", "B", "C", "A", "B"]
    sf = _write_events(tmp_path, ts, users, [1.0] * 8, event_type=types)
    out = q_event_paths(sf).to_pandas()
    got = {
        (r.step1, r.step2, r.step3): r.n for r in out.itertuples()
    }
    assert got == {
        ("A", "B", "C"): 2,
        ("B", "C", "A"): 1,
        ("C", "A", "B"): 1,
    }


def test_dau_mau_stickiness_two_months(tmp_path):
    """Hand case across a month boundary: Jan has 2 active days
    (DAU 2 then 1, MAU 2), Feb has 1 day (DAU 1, MAU 1); repeat
    events on one day must not inflate DAU."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_dau_mau_stickiness,
    )
    import datetime as dt

    def us(y, m, d, h=0):
        return int(
            dt.datetime(y, m, d, h, tzinfo=dt.timezone.utc).timestamp() * 1e6
        )

    ts = [
        us(2024, 1, 1), us(2024, 1, 1, 5), us(2024, 1, 1, 9),  # day1: u0,u0,u1
        us(2024, 1, 20),                                        # day2: u0
        us(2024, 2, 3),                                         # feb: u1
    ]
    users = [0, 0, 1, 0, 1]
    sf = _write_events(tmp_path, ts, users, [1.0] * 5)
    out = (
        q_dau_mau_stickiness(sf).to_pandas().sort_values("month").reset_index(drop=True)
    )
    jan, feb = out.iloc[0], out.iloc[1]
    assert jan["n_days"] == 2 and jan["mau"] == 2
    assert jan["mean_dau"] == np.floor(3 / 2 * 1e6) / 1e6
    assert jan["stickiness"] == np.floor(3 / 2 / 2 * 1e6) / 1e6
    assert feb["n_days"] == 1 and feb["mau"] == 1 and feb["stickiness"] == 1.0


def test_ks_single_type_degenerate(tmp_path):
    """A single-type corpus has no 'rest' sample: KS pinned to 0."""
    from tests.test_round3_breadth import _write_events
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_ks_by_event_type,
    )

    sf = _write_events(tmp_path, [1, 2, 3], [0, 0, 0], [1.0, 2.0, 3.0])
    out = q_ks_by_event_type(sf).to_pandas()
    assert len(out) == 1 and out.iloc[0]["ks"] == 0.0 and out.iloc[0]["ks_num"] == 0


def test_fk_audit_counts_orphans(tmp_path):
    """Inject one orphan lineitem (missing order) and one orphan order
    (missing customer); counts land on the right edges."""
    import pyarrow.parquet as pq2

    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_fk_audit,
    )

    pq2.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 99], pa.int64()),  # 99 orphan
                "l_partkey": pa.array([10, 10, 10], pa.int64()),
                "l_suppkey": pa.array([5, 5, 5], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq2.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([77], pa.int64()),  # orphan customer
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq2.write_table(
        pa.table({"p_partkey": pa.array([10], pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    pq2.write_table(
        pa.table({"s_suppkey": pa.array([5], pa.int64())}),
        str(tmp_path / "supplier.parquet"),
    )
    pq2.write_table(
        pa.table({"c_custkey": pa.array([], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    out = q_fk_audit(str(tmp_path)).to_pandas().set_index("edge")
    assert out.loc["lineitem->orders", "n_orphan"] == 1
    assert out.loc["lineitem->orders", "n_child"] == 3
    assert out.loc["lineitem->part", "n_orphan"] == 0
    assert out.loc["lineitem->supplier", "n_orphan"] == 0
    assert out.loc["orders->customer", "n_orphan"] == 1
