"""Edge-semantics tests for the round-3 operator additions (the driver
gate checks values against DuckDB; these pin the tricky semantics with
hand-built fixtures): hopping-window membership, RANGE-frame ts peers,
Bloom filter no-false-negatives, histogram-quantile error bound."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def _write_events(tmp_path, ts_us, user_id, value):
    n = len(ts_us)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.asarray(ts_us, np.int64)).view(pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_hopping_window_membership(tmp_path):
    """An event at minute 30 belongs to exactly the 4 hour-long windows
    starting at minutes -30, -15, 0, 15 (epoch-aligned grid)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_hopping_window_stats,
    )

    ts = [(1_700_000_000 + 30 * 60) * 1_000_000]  # minute 30 after an epoch point
    sf = _write_events(tmp_path, ts, [1], [2.0])
    out = q_hopping_window_stats(sf).to_pandas().sort_values("window_start")
    assert len(out) == 4
    starts = out["window_start"].astype("datetime64[us]").astype(np.int64).to_numpy()
    ev = ts[0]
    # each window contains the event: ws <= ts < ws + 60min
    assert np.all((starts <= ev) & (ev < starts + 60 * 60 * 1_000_000))
    # consecutive windows are one hop apart
    assert np.all(np.diff(starts) == 15 * 60 * 1_000_000)
    assert (out["n_events"] == 1).all()


def test_rolling_window_includes_ts_peers(tmp_path):
    """SQL RANGE ... CURRENT ROW includes ALL rows with the same ts —
    both duplicate-ts events must see each other's value."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_rolling_user_value,
    )

    t0 = 1_700_000_000 * 1_000_000
    hour = 60 * 60 * 1_000_000
    #              in-window    dup-ts pair           out-of-window
    ts = [t0, t0 + hour // 2, t0 + hour, t0 + hour, t0 + 3 * hour]
    sf = _write_events(tmp_path, ts, [7] * 5, [1.0, 2.0, 4.0, 8.0, 16.0])
    out = (
        q_rolling_user_value(sf)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # event 0: only itself; event 1: 1+2; events 2,3 (same ts): both see
    # 2+4+8 (+1? t0 is exactly 1h before t0+hour -> inside closed lower
    # bound [ts-1h, ts] -> 1+2+4+8); event 4: only itself
    assert out.loc[0, "rolling_value"] == 1.0
    assert out.loc[1, "rolling_value"] == 3.0
    assert out.loc[2, "rolling_value"] == 15.0
    assert out.loc[3, "rolling_value"] == 15.0
    assert out.loc[2, "n_window"] == 4 and out.loc[3, "n_window"] == 4
    assert out.loc[4, "rolling_value"] == 16.0


def test_bloom_no_false_negatives_and_low_fp():
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        _bloom_build,
        _bloom_probe,
    )

    rng = np.random.default_rng(11)
    keys = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    bits, mask, k = _bloom_build(keys)
    assert _bloom_probe(bits, mask, k, keys).all()  # zero false negatives
    probe = rng.choice(10_000_000, size=20000, replace=False).astype(np.int64)
    outside = probe[~np.isin(probe, keys)]
    fp = _bloom_probe(bits, mask, k, outside).mean()
    assert fp < 0.01  # 16 bits/key, k=4 -> ~0.2% expected


def test_price_qty_correlation_semantics(tmp_path):
    """Perfectly linear group -> r == 1.0 exactly (integer-sum identity
    survives float64); cov matches the population formula."""
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_price_qty_correlation,
    )

    tbl = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 3 + ["B"] * 3),
            "l_quantity": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0]),
            # group A: price = 2*qty (r=1); group B: decorrelated
            "l_extendedprice": pa.array([2.0, 4.0, 6.0, 5.0, 1.0, 3.0]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    out = (
        q_price_qty_correlation(str(tmp_path))
        .to_pandas()
        .set_index("l_returnflag")
    )
    assert out.loc["A", "corr_qty_price"] == 1.0
    # population cov of [1,2,3] vs [2,4,6] = 4/3, floored to the 1e-6 grid
    assert out.loc["A", "cov_qty_price"] == np.floor(4 / 3 * 1e6) / 1e6
    # group B: cov = mean(xy)-mx*my = (5+2+9)/3 - 2*3 = 16/3-6 = -2/3
    assert out.loc["B", "cov_qty_price"] == np.floor(-2 / 3 * 1e6) / 1e6
    assert -1.0 <= out.loc["B", "corr_qty_price"] < 0.0


def test_hist_quantiles_within_bin_error():
    from medical_and_charity_document_extraction_system_ray.pipelines.sketches import (
        HIST_BINS,
        q_hist_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    est = q_hist_quantiles(sf).to_pandas().set_index("q")["est"]
    prices = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_totalprice"]
    )["o_totalprice"].to_numpy(zero_copy_only=False)
    cents = np.floor(prices * 100 + 0.5).astype(np.int64)
    width = max(1, -(-(cents.max() - cents.min() + 1) // HIST_BINS))
    for q in (0.25, 0.5, 0.9):
        exact = np.sort(cents)[int(np.ceil(q * cents.size)) - 1] / 100.0
        assert abs(est[q] - exact) <= width / 100.0  # one-bin bound


def test_watermark_lateness_and_bucket_carry(tmp_path):
    """Watermark semantics vs a brute-force sequential reference, with
    bucket_hours=1 so lateness must flow across arrival buckets through
    the broadcast prefix-max carry (eid 15's ts=t0+3500 lands in bucket
    0 but outdates eid 2, which arrives in bucket 1)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.events import (
        q_watermark_window_stats,
    )

    t0 = 1_700_000_000
    eids = np.array([0, 3, 4, 7, 15, 2, 1, 8], np.int64)
    ts_s = np.array(
        [t0 + 1000, t0, t0 + 50, t0 + 400, t0 + 3500,
         t0 + 2500, t0 + 2 * 3600, t0 + 2 * 3600 - 2000],
        np.int64,
    )
    vals = np.arange(1.0, len(eids) + 1.0)
    n = len(eids)
    tbl = pa.table(
        {
            "event_id": pa.array(eids),
            "ts": pa.array(ts_s * 1_000_000).view(pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = (
        q_watermark_window_stats(str(tmp_path), bucket_hours=1)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )

    # brute-force sequential reference (global arrival order)
    jitter = (eids * 2654435761) % 3600
    arrival = ts_s + jitter
    order = np.lexsort((eids, arrival))
    seen_max = -(2**62)
    ref = {}
    for i in order:
        seen_max = max(seen_max, ts_s[i])
        late = ts_s[i] < seen_max - 900
        w = (ts_s[i] // 3600) * 3600
        k, l, s = ref.get(w, (0, 0, 0.0))
        ref[w] = (k + (not late), l + late, s + (0.0 if late else vals[i]))
    assert out["n_late"].sum() >= 2  # fixture really exercises lateness
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        w = row["window_start"].value // 1_000_000_000  # ns -> s
        k, l, s = ref[w]
        assert (row["n_kept"], row["n_late"]) == (k, l)
        assert abs(row["sum_value_kept"] - s) < 1e-9
