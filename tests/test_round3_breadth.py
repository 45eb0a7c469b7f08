"""Edge-semantics tests for the late-round-3 breadth operators (the
driver gate value-checks them against DuckDB at sf0.01/sf0.1; these pin
the corner semantics with hand-built fixtures): range-join boundary
inclusion and exactly-once pairing across hour buckets, ROWS-frame
tie-break, PERCENT_RANK tie sharing, min-max degenerate range, cohort
offsets, and co-occurrence incidence (not occurrence) counting."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, ts_us, user_id, value, event_type=None):
    n = len(ts_us)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.asarray(ts_us, np.int64)).view(pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(event_type or ["click"] * n),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_range_join_boundaries_and_exactly_once(tmp_path):
    """View at click-1h is IN (>=), at click ts is OUT (<); a view is
    never double-counted even though it is replicated into two hour
    buckets."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_range_views_before_click,
    )

    hour = 3600 * 1_000_000
    t0 = 1_700_003_000 * 1_000_000  # NOT hour-aligned: view/click straddle buckets
    ts = [t0, t0 - hour, t0 - hour - 1, t0 - 1, t0]
    types = ["click", "view", "view", "view", "view"]
    sf = _write_events(tmp_path, ts, [1] * 5, [0.0] * 5, types)
    out = q_range_views_before_click(sf).to_pandas()
    assert len(out) == 1
    assert int(out["n_views"].iloc[0]) == 2  # boundary-in + just-before


def test_moving_window_rows_tiebreak(tmp_path):
    """Same-ts rows order by event_id; each sees only earlier peers."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_moving_window_rows,
    )

    t0 = 1_700_000_000 * 1_000_000
    sf = _write_events(tmp_path, [t0] * 3, [5] * 3, [1.0, 2.0, 4.0])
    out = (
        q_moving_window_rows(sf).to_pandas().sort_values("event_id")
    )
    assert out["win_value"].tolist() == [1.0, 3.0, 7.0]
    assert out["n_window"].tolist() == [1, 2, 3]


def test_percent_rank_ties_and_singleton(tmp_path):
    """Tied values share (rank-1)/(n-1); a single-row partition is 0."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_percent_rank_value,
    )

    t0 = 1_700_000_000 * 1_000_000
    sf = _write_events(
        tmp_path, [t0] * 4, [1, 2, 3, 4], [1.0, 1.0, 2.0, 9.0],
        ["a", "a", "a", "b"],
    )
    out = q_percent_rank_value(sf).to_pandas().sort_values("event_id")
    assert out[out.event_type == "a"]["pr"].tolist() == [0.0, 0.0, 1.0]
    assert out[out.event_type == "b"]["pr"].tolist() == [0.0]


def test_minmax_scale_degenerate_range_is_null(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_minmax_scale,
    )

    t0 = 1_700_000_000 * 1_000_000
    sf = _write_events(
        tmp_path, [t0] * 4, [1, 2, 3, 4], [5.0, 5.0, 1.0, 3.0],
        ["flat", "flat", "v", "v"],
    )
    out = q_minmax_scale(sf).to_pandas().sort_values("event_id")
    flat = out[out.event_type == "flat"]["scaled"]
    assert flat.isna().all()
    assert out[out.event_type == "v"]["scaled"].tolist() == [0.0, 1.0]


def test_cohort_retention_offsets(tmp_path):
    """A user active on days d, d+2 lands in cohort d with offsets
    {0, 2}; a second same-day event adds nothing (user-day distinct)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_cohort_retention,
    )

    day = 86400 * 1_000_000
    d0 = 19_000 * day
    ts = [d0, d0 + 1, d0 + 2 * day, d0 + 2 * day + day // 2]
    sf = _write_events(tmp_path, ts, [9] * 4, [0.0] * 4)
    out = q_cohort_retention(sf).to_pandas().sort_values("offset_days")
    assert out["cohort_day"].tolist() == [19_000, 19_000]
    assert out["offset_days"].tolist() == [0, 2]
    assert out["n_users"].tolist() == [1, 1]


def test_token_cooccurrence_counts_documents_not_occurrences(tmp_path):
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_token_cooccurrence,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a a", "b a", "c only"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_token_cooccurrence(str(tmp_path)).to_pandas()
    pair = out[(out.tok_a == "a") & (out.tok_b == "b")]
    assert int(pair["n_docs"].iloc[0]) == 2  # doc 1 counts once despite "a" x3
    assert not ((out.tok_a == "c") & (out.tok_b == "only")).empty


def test_dup_canonical_keeps_longest(tmp_path):
    """Two near-identical docs cluster; the LONGER one is kept, the
    shorter dropped; the unrelated doc never appears in the output."""
    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_dup_canonical,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array([base, base + "and then some extra", "zzz totally different"]),
            "n_chars": pa.array(
                [len(base), len(base) + 19, 21], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_dup_canonical(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [10, 11]
    assert out["keep"].tolist() == [False, True]  # 11 is longer
    assert (out["cluster_rep"] == 10).all()


def test_event_dedup_window_boundaries(tmp_path):
    """Gap == window is KEPT (>=); gap == window-1us dropped; the rule
    compares against the previous event kept-or-not (LAG semantics, so
    a run of rapid repeats keeps only its head until a full-window gap
    appears vs the immediate predecessor); types are independent."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_event_dedup_window,
    )

    s = 1_000_000
    t0 = 1_700_000_000 * s
    ts = [
        t0,             # e0 click  kept (first)
        t0 + 60 * s,    # e1 click  kept (gap == 60s, boundary in)
        t0 + 90 * s,    # e2 click  dropped (30s after e1)
        t0 + 149 * s,   # e3 click  dropped (59s after e2 — LAG vs e2, not e1)
        t0 + 210 * s,   # e4 click  kept (61s after e3)
        t0 + 90 * s,    # e5 view   kept (different type)
    ]
    root = _write_events(
        tmp_path, ts, [7] * 6, [1.0] * 6,
        ["click", "click", "click", "click", "click", "view"],
    )
    out = q_event_dedup_window(root).to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [0, 1, 4, 5]


def test_ewma_dyadic_weights(tmp_path):
    """EWMA sanity on a hand-computable series: first event equals its
    own value; second = (2*prev + curr*1)/3 ... with dyadic weights
    2^-d; users independent."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_ewma_user_value,
    )

    s = 1_000_000
    t0 = 1_700_000_000 * s
    root = _write_events(
        tmp_path,
        [t0, t0 + s, t0 + 2 * s, t0],
        [1, 1, 1, 2],
        [10.0, 4.0, 7.0, 5.0],
    )
    out = (
        q_ewma_user_value(root)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    import math
    def grid(x):
        return math.floor(x * 1e6 + 1e-3) / 1e6
    assert out["ewma"][0] == grid(10.0)                       # only itself
    assert out["ewma"][1] == grid((1 * 10 + 2 * 4) / 3)       # current weighs 2x
    assert out["ewma"][2] == grid((1 * 10 + 2 * 4 + 4 * 7) / 7)
    assert out["ewma"][3] == grid(5.0)                        # other user


def test_corpus_checksum_binding_and_order_independence(tmp_path):
    """Row order never changes the checksum; SWAPPING two docs' texts
    (same multiset of texts and ids!) does — content is bound to key."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_corpus_checksum,
    )

    a = [{"doc_id": 1, "text": "alpha"}, {"doc_id": 2, "text": "beta"}]
    d1 = tmp_path / "d1"; d2 = tmp_path / "d2"; d3 = tmp_path / "d3"
    for d in (d1, d2, d3):
        d.mkdir()
    pq.write_table(pa.Table.from_pylist(a), str(d1 / "documents.parquet"))
    pq.write_table(pa.Table.from_pylist(a[::-1]), str(d2 / "documents.parquet"))
    swapped = [{"doc_id": 1, "text": "beta"}, {"doc_id": 2, "text": "alpha"}]
    pq.write_table(pa.Table.from_pylist(swapped), str(d3 / "documents.parquet"))
    c1 = q_corpus_checksum(str(d1)).to_pydict()
    c2 = q_corpus_checksum(str(d2)).to_pydict()
    c3 = q_corpus_checksum(str(d3)).to_pydict()
    assert c1 == c2
    assert c1["checksum"] != c3["checksum"]


def test_sliding_distinct_users_dedup(tmp_path):
    """A user visiting 3x inside one hop contributes ONE to each of the
    4 windows covering it; two users -> 2."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_sliding_distinct_users,
    )

    s = 1_000_000
    t0 = (1_700_000_000 // 900) * 900 * s  # hop-aligned
    ts = [t0, t0 + s, t0 + 2 * s, t0 + 3 * s]
    root = _write_events(tmp_path, ts, [1, 1, 1, 2], [0.0] * 4)
    out = q_sliding_distinct_users(root).to_pandas()
    assert len(out) == 4                      # 4 hop-windows cover t0
    assert out["n_users"].tolist() == [2, 2, 2, 2]


def test_profile_orders_nulls_and_distinct(tmp_path):
    """Profiling counts nulls and exact distincts per column, hashing
    doubles/timestamps by bit pattern (distinct-preserving)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_profile_orders,
    )

    import numpy as np
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([7, 7, None, 9], pa.int64()),
            "o_orderstatus": pa.array(["O", "F", "O", None]),
            "o_totalprice": pa.array([1.5, 1.5, 2.5, 2.5], pa.float64()),
            "o_orderdate": pa.array(
                np.array([0, 0, 86400, 86400], np.int64) * 1_000_000
            ).view(pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    out = (
        q_profile_orders(str(tmp_path))
        .to_pandas()
        .set_index("column")
    )
    assert (out["n_rows"] == 4).all()
    assert out.loc["o_custkey", "n_nulls"] == 1
    assert out.loc["o_custkey", "n_distinct"] == 2
    assert out.loc["o_orderstatus", "n_nulls"] == 1
    assert out.loc["o_orderstatus", "n_distinct"] == 2
    assert out.loc["o_totalprice", "n_distinct"] == 2
    assert out.loc["o_orderdate", "n_distinct"] == 2
    assert out.loc["o_orderpriority", "n_distinct"] == 1
    assert out.loc["o_orderkey", "n_distinct"] == 4


def test_upsert_latest_wins(tmp_path):
    """doc_id % 7 == 0 rows surface at version 1 with +3 chars; others
    stay v0; new rows appear under +10M ids at v0."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_upsert_latest,
    )

    rows = [
        {"doc_id": 7, "text": "abcd"},     # updated
        {"doc_id": 8, "text": "xy"},       # untouched
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = (
        q_upsert_latest(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [7, 8, 10_000_007]
    assert out["version"].tolist() == [1, 0, 0]
    assert out["n_chars"].tolist() == [7, 2, 4]


def test_zorder_interleave_locality(tmp_path):
    """Bit-interleave sanity: custkey occupies even bits, day odd bits;
    nearby (cust, day) points get nearby z-keys (prefix locality)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_zorder_keys,
    )

    day_us = 86_400_000_000
    tbl = pa.table(
        {
            "o_orderkey": pa.array([0, 1, 2], pa.int64()),
            "o_custkey": pa.array([0b101, 0, 0xFFFF], pa.int64()),
            "o_orderdate": pa.array(
                np.array([0, 0b11, 0xFFFF], np.int64) * day_us
            ).view(pa.timestamp("us")),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([1.0] * 3),
            "o_orderpriority": pa.array(["1-URGENT"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    out = q_zorder_keys(str(tmp_path)).to_pandas().sort_values("o_orderkey")
    z = out["zkey"].tolist()
    assert z[0] == 0b10001          # x bits at even positions: 101 -> 1_0_0_0_1
    assert z[1] == 0b1010           # y bits at odd positions: 11 -> 1010
    assert z[2] == (1 << 32) - 1    # all 32 bits set


def test_bpe_pretokenizer_semantics(tmp_path):
    """GPT-2-ish split: contractions split off, leading-space words are
    one token, punctuation runs group, whitespace runs count once."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.text_analysis import (
        q_bpe_token_counts,
    )

    rows = [
        # "it's  fine!!" -> ["it", "'s", "  " (ws run? no: ' fine' takes one space...)]
        {"doc_id": 0, "lang": "en", "text": "it's done, ok 42"},
        {"doc_id": 1, "lang": "en", "text": ""},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = (
        q_bpe_token_counts(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    # "it" "'s" " done" "," " ok" " 42" = 6
    assert out.loc[0, "bpe_tokens"] == 6
    assert out.loc[0, "ws_tokens"] == 4
    assert out.loc[1, "bpe_tokens"] == 0 and out.loc[1, "ws_tokens"] == 0
