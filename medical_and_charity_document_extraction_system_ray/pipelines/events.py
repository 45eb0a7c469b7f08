"""Stream-shaped operators over the ``events`` table.

Ray Data is a batch engine (and the reference has no streaming either,
SURVEY.md §2.10) — stream semantics are expressed as: shuffle on a
COARSE key bucket (``hash(user) % 64``), lexsort once per bucket
group, and run every window kernel flat over the sorted columns with
run-boundary masks (``functions/segments.py``) — bounded python-call
count at any user cardinality.  Ordering assumption: event time is
complete per key at run time (no watermarks / late data; see
``q_watermark_window_stats`` for the bounded-out-of-orderness variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.cluster import join_partitions
from ..functions.segments import (
    bucket_grouped,
    run_positions,
    run_searchsorted,
    runs,
)
from ..sources.readers import read_table
from .relational import _cents


def q_hourly_event_stats(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour windows per event_type: count + value sum.

    The window key is computed vectorized per batch
    (``floor_temporal``), partials are pre-aggregated per batch, and
    the shuffle only moves (window, type) partial rows.
    """
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        tmp = pa.table(
            {
                "hour": hour,
                "event_type": t["event_type"],
                "value_c": _cents(t["value"]),
            }
        )
        return tmp.group_by(["hour", "event_type"]).aggregate(
            [("value_c", "sum"), ("value_c", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["hour", "event_type"]).aggregate(
        Sum("value_c_sum", alias_name="s"),
        Sum("value_c_count", alias_name="n_events"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": t["hour"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.divide(pc.cast(t["s"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user (new session when the gap from the
    previous event exceeds ``gap_minutes``): per-user session count,
    event count, and max session length.

    Coarse-bucket shuffle (``hash(user) % 64``), ONE lexsort per bucket
    group, then the gap/session logic runs flat over the sorted columns
    with run-boundary masks — no per-user python call (the
    ``q_sliding_distinct_users`` pattern; ``map_groups`` invokes its
    UDF once per group, so keying the shuffle on the raw user_id costs
    #users python calls at 10^8-user scale).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_events", pa.int64()),
            ("max_session_events", pa.int64()),
        ]
    )

    def sessions(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        starts, lengths, run_of = runs(u)
        n = u.size
        # exact microsecond comparison (SQL INTERVAL is exact too;
        # truncating to seconds would misclassify e.g. a 1800.5 s gap)
        sess_start = np.zeros(n, dtype=bool)
        sess_start[starts] = True
        sess_start[1:] |= (ts[1:] - ts[:-1] > gap_us) & (u[1:] == u[:-1])
        sess_idx = np.flatnonzero(sess_start)
        sess_len = np.diff(np.concatenate([sess_idx, [n]]))
        # sessions are contiguous per user: the r-th user's sessions
        # start at position sess_off[r] in the session arrays
        sess_off = np.searchsorted(sess_idx, starts)
        n_sess = np.add.reduceat(sess_start.astype(np.int64), starts)
        max_ev = np.maximum.reduceat(sess_len, sess_off)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_sessions": pa.array(n_sess),
                "n_events": pa.array(lengths),
                "max_session_events": pa.array(max_ev),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(
        sessions, batch_format="pyarrow"
    )


Q_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       MAX(n) AS max_session_events
FROM per_session GROUP BY user_id
"""


def q_asof_view_before_click(sf_dir: str) -> ray.data.Dataset:
    """As-of join: for every 'click', the most recent strictly-prior
    'view' by the same user (custom operator — Ray Data has no asof
    join; composed as coarse-bucket shuffle + one lexsort + a
    run-restricted searchsorted pick, flat over the bucket group).
    Partitioning assumption: all events of a user fit one bucket
    group.  Input assumption
    shared with Q_ASOF_SQL: view timestamps are unique per user —
    with duplicates, DuckDB's ASOF tie choice is unspecified while
    merge_asof picks the last sorted row, so view_value could diverge
    (testdata satisfies uniqueness)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def prefilter(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "view"]))
        return t.filter(keep)

    ds = ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)

    asof_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("click_ts", pa.timestamp("us")),
            ("view_ts", pa.timestamp("us")),
            ("view_value", pa.float64()),
        ]
    )

    def asof(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return asof_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        is_click = pc.equal(g["event_type"], "click").to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ts, u))
        u, ts, is_click = u[order], ts[order], is_click[order]
        val = g["value"].to_numpy(zero_copy_only=False)[order]
        # views: flat (user, ts)-sorted subsequence; one run per user
        vu, vts, vval = u[~is_click], ts[~is_click], val[~is_click]
        cu, cts = u[is_click], ts[is_click]
        if vu.size == 0 or cu.size == 0:
            return asof_schema.empty_table()
        vstarts, vlengths, _ = runs(vu)
        v_users = vu[vstarts]
        # each click's view-run (users with no views → invalid run)
        r = np.searchsorted(v_users, cu)
        has_views = (r < v_users.size) & (v_users[np.minimum(r, v_users.size - 1)] == cu)
        r_ok = r[has_views]
        # strictly-prior view: first vts >= cts, minus one
        idx = (
            run_searchsorted(
                vts, cts[has_views], vstarts, vlengths, r_ok, side="left"
            )
            - 1
        )
        valid = idx >= vstarts[r_ok]
        keep_c = np.flatnonzero(has_views)[valid]
        idx = idx[valid]
        return pa.table(
            {
                "user_id": pa.array(cu[keep_c]),
                "click_ts": pa.array(cts[keep_c]).cast(pa.timestamp("us")),
                "view_ts": pa.array(vts[idx]).cast(pa.timestamp("us")),
                "view_value": pa.array(vval[idx], type=pa.float64()),
            },
            schema=asof_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(asof, batch_format="pyarrow")


Q_ASOF_SQL = """
SELECT a.user_id, a.ts AS click_ts, b.ts AS view_ts, b.value AS view_value
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') a
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id AND a.ts > b.ts
"""


def q_running_user_value(sf_dir: str) -> ray.data.Dataset:
    """Per-user running total of value in event-time order (window
    function analog): coarse-bucket shuffle, ONE lexsort per bucket
    group, exact integer-cents cumsum with run-base subtraction — no
    per-user python call (functions/segments.py)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "value_c": _cents(t["value"]),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    running_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("running_value", pa.float64()),
        ]
    )

    def running(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return running_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        # event_id = deterministic tie-break for duplicate ts (the SQL
        # window orders the same way, so per-row running sums stay
        # comparable even with ts collisions)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        cents = g["value_c"].to_numpy(zero_copy_only=False)[order]
        starts, _, run_of = runs(u)
        cs = np.cumsum(cents)
        # subtract everything before the user's run start
        base = np.where(starts > 0, cs[starts - 1], 0)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "running_value": pa.array((cs - base[run_of]) / 100.0),
            },
            schema=running_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(
        running, batch_format="pyarrow"
    )


Q_RUNNING_SQL = """
SELECT user_id, ts,
       SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) / 100.0 AS running_value
FROM events
"""


def q_user_event_ranks(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """ROW_NUMBER() window analog: each user's top-k events by value
    (unique tie-break on event_id), rank attached — coarse-bucket
    shuffle + one lexsort per bucket group + a run-position mask; only
    k rows per user leave the group."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])

    rank_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("value", pa.float64()),
            ("rnk", pa.int64()),
        ]
    )

    def ranks(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return rank_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        # value DESC via exact float negation, event_id ASC tie-break
        order = np.lexsort((eid, -v, u))
        u, eid, v = u[order], eid[order], v[order]
        starts, _, run_of = runs(u)
        rnk = run_positions(starts, run_of) + 1
        keep = rnk <= k
        return pa.table(
            {
                "user_id": pa.array(u[keep]),
                "event_id": pa.array(eid[keep]),
                "value": pa.array(v[keep], type=pa.float64()),
                "rnk": pa.array(rnk[keep]),
            },
            schema=rank_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(ranks, batch_format="pyarrow")


Q_RANKS_SQL = """
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rnk
  FROM events
) WHERE rnk <= 3
"""


def q_hopping_window_stats(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15
) -> ray.data.Dataset:
    """Hopping (sliding) windows: 1-hour windows starting every 15
    minutes, per event_type — each event lands in window/hop = 4
    overlapping windows.

    The 4 epoch-aligned window starts are computed vectorized per batch
    (one repeat + tile, no per-row loop), partials pre-aggregate per
    batch, and the shuffle only moves (window_start, type) partial rows
    — the fan-out-by-4 never touches the shuffle because it collapses
    inside the batch first.  Empty windows are not emitted (matches the
    oracle's cross-join form)."""
    hop_us = hop_minutes * 60 * 1_000_000
    k = window_minutes // hop_minutes
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        grid = ts_us // hop_us
        ws = (np.repeat(grid, k) - np.tile(np.arange(k, dtype=np.int64), n)) * hop_us
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        tmp = pa.table(
            {
                "window_start": pa.array(ws).view(pa.timestamp("us")),
                "event_type": t["event_type"].combine_chunks().take(rep),
                "value_c": _cents(t["value"]).take(rep),
            }
        )
        return tmp.group_by(["window_start", "event_type"]).aggregate(
            [("value_c", "sum"), ("value_c", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("value_c_sum", alias_name="s"),
        Sum("value_c_count", alias_name="n_events"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t["window_start"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.divide(pc.cast(t["s"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_HOPPING_SQL = """
SELECT make_timestamp(((CAST(FLOOR(epoch(ts) / 900) AS BIGINT) - k.k) * 900)
                      * 1000000) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS k) k
GROUP BY 1, 2
"""


def q_rolling_user_value(sf_dir: str, window_minutes: int = 60) -> ray.data.Dataset:
    """Per-event rolling 1-hour sum/count of ``value`` within the user
    (window-frame ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT
    ROW`` analog — peers at the same ts are all included, per SQL RANGE
    semantics).

    Coarse-bucket shuffle; one lexsort per bucket group, then the
    frame sums come from a global prefix-sum + two RUN-RESTRICTED
    searchsorteds over the flat columns (functions/segments.py) — no
    per-user python call, no per-row loop."""
    win_us = window_minutes * 60 * 1_000_000
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("rolling_value", pa.float64()),
            ("n_window", pa.int64()),
        ]
    )

    def rolling(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False)[order] * 100 + 0.5
        ).astype(np.int64)
        starts, lengths, run_of = runs(u)
        csum = np.concatenate([[0], np.cumsum(cents)])
        lo = run_searchsorted(ts, ts - win_us, starts, lengths, run_of, "left")
        hi = run_searchsorted(ts, ts, starts, lengths, run_of, "right")  # ts peers
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(u),
                "rolling_value": pa.array((csum[hi] - csum[lo]) / 100.0),
                "n_window": pa.array((hi - lo).astype(np.int64)),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(
        rolling, batch_format="pyarrow"
    )


Q_ROLLING_SQL = """
SELECT event_id, user_id,
       SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w / 100.0 AS rolling_value,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_event_gaps(sf_dir: str) -> ray.data.Dataset:
    """LAG window analog: per event, microseconds since the user's
    previous event (NULL for each user's first).  Deterministic order
    (ts, event_id) on both sides; coarse-bucket shuffle + ONE
    vectorized diff over the whole sorted bucket group, run starts
    masked to NULL."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def gaps(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        starts, _, _ = runs(u)
        gap = np.empty(ts.size, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        first = np.zeros(ts.size, dtype=bool)
        first[starts] = True  # NULL for each user's first event
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(u),
                "gap_us": pa.array(gap, mask=first),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(gaps, batch_format="pyarrow")


Q_EVENT_GAPS_SQL = """
SELECT event_id, user_id,
       CAST(epoch_us(ts - LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) AS BIGINT) AS gap_us
FROM events
"""


def q_event_dedup_window(sf_dir: str, window_s: int = 60) -> ray.data.Dataset:
    """Rapid-repeat event dedup (double-click / retry suppression):
    within each (user, event_type), drop an event when it follows the
    previous same-type event by < ``window_s`` seconds.  LAG semantics
    (gap vs the previous event, kept or not) so the rule is stateless
    per neighbour pair and shuffles once on the composite key — at
    100 TB this is one keyed exchange, no iteration, no global state.
    Deterministic order (ts, event_id) on both sides."""
    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_id", "event_type", "ts"]
    )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    win_us = np.int64(window_s * 1_000_000)

    def dedup(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].dictionary_encode()
        et = et.chunk(0) if isinstance(et, pa.ChunkedArray) else et
        code = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, code, u))
        u, ts, eid, code = u[order], ts[order], eid[order], code[order]
        starts, _, _ = runs(u, code)
        keep = np.empty(ts.size, dtype=bool)
        keep[0] = True
        keep[1:] = ts[1:] - ts[:-1] >= win_us
        keep[starts] = True  # each (user, type) run's first event
        return pa.table(
            {
                "event_id": pa.array(eid[keep], type=pa.int64()),
                "user_id": pa.array(u[keep]),
                "event_type": et.dictionary.take(pa.array(code[keep])).cast(
                    pa.string()
                ),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(dedup, batch_format="pyarrow")


Q_EVENT_DEDUP_WINDOW_SQL = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         epoch_us(ts - LAG(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id)) AS gap_us
  FROM events
) WHERE gap_us IS NULL OR gap_us >= 60000000
"""


def q_user_value_ntiles(sf_dir: str, n: int = 4) -> ray.data.Dataset:
    """NTILE(4) per user over (value, event_id) order — quartile
    bucketing inside each key, deterministic tie-break.  Coarse-bucket
    shuffle + one lexsort per bucket group; tile indices come from a
    closed-form run-position expression following SQL NTILE semantics
    (first ``extra`` tiles get the +1) — no per-user python call."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("tile", pa.int64()),
        ]
    )

    def ntiles(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, v, u))
        u, eid = u[order], eid[order]
        starts, lengths, run_of = runs(u)
        p = run_positions(starts, run_of)
        m = lengths[run_of]
        base, extra = m // n, m % n
        # SQL NTILE: the first `extra` tiles get base+1 rows
        boundary = extra * (base + 1)
        tile = np.where(
            p < boundary,
            p // (base + 1),
            extra + (p - boundary) // np.maximum(base, 1),
        ) + 1
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(u),
                "tile": pa.array(tile.astype(np.int64)),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(ntiles, batch_format="pyarrow")


Q_NTILE_SQL = """
SELECT event_id, user_id,
       CAST(NTILE(4) OVER (PARTITION BY user_id
                           ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
"""


def q_value_moments(sf_dir: str) -> ray.data.Dataset:
    """Per-type mean / population variance / stddev of ``value`` from
    exact integer moments: per-batch partials carry (n, Σc, Σc²) on the
    cents grid (int64 — order-independent, overflow-safe to ~3·10⁹ rows
    of $10⁶ values per partial), one tiny groupby merges them, and the
    float math happens ONCE at the end — the moments-sketch shape for
    any algebraic aggregate at 10¹² rows.  The SQL oracle computes the
    identical (n·Σc² − (Σc)²) / n² expression from the same sums, so
    even the derived doubles hash-match (DuckDB's own var_pop uses a
    different summation and would not)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"])
        c2 = pc.multiply(c, c)
        tmp = pa.table({"event_type": t["event_type"], "c": c, "c2": c2})
        return tmp.group_by("event_type").aggregate(
            [("c", "sum"), ("c2", "sum"), ("c", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("event_type").aggregate(
        Sum("c_sum", alias_name="s1"),
        Sum("c2_sum", alias_name="s2"),
        Sum("c_count", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
        var = (n * s2 - s1 * s1) / (n * n) / 10000.0
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "mean_value": pa.array(np.floor(s1 / n) / 100.0),
                "var_value": pa.array(np.floor(var * 1e6) / 1e6),
                "std_value": pa.array(np.floor(np.sqrt(var) * 1e6) / 1e6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_MOMENTS_SQL = """
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS s1,
         SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)
             * CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS s2
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       FLOOR(CAST(s1 AS DOUBLE) / n) / 100.0 AS mean_value,
       FLOOR((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * n) / 10000.0 * 1e6) / 1e6 AS var_value,
       FLOOR(SQRT((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * n) / 10000.0) * 1e6) / 1e6 AS std_value
FROM s
"""


def q_watermark_window_stats(
    sf_dir: str,
    jitter_seconds: int = 3600,
    delay_seconds: int = 900,
    bucket_hours: int = 6,
) -> ray.data.Dataset:
    """Bounded-out-of-orderness watermark semantics (Flink-style) over a
    simulated arrival stream: each event's *arrival* time is its event
    time plus a deterministic hash jitter in [0, jitter) seconds, the
    watermark after each arrival is ``max(event time seen so far) −
    delay``, and an event is LATE (dropped) if its event time is behind
    the watermark at its own arrival.  Output: per tumbling 1-hour
    event-time window, kept/late counts and the kept-value sum.

    Distributed prefix-max shape (no global sort): arrivals are range-
    bucketed by ``arrival // bucket``, pass A is a column-pruned scan
    producing ONE max-ts row per bucket (the only driver-side collect —
    #buckets = time-span/bucket, independent of row count), the
    exclusive prefix max per bucket is broadcast via ``ray.put``, and
    pass B resolves exact per-event watermarks inside each bucket group
    with one ``np.maximum.accumulate``.  The per-event late flags
    collapse to (window, kept/late) partials inside the group, so the
    final shuffle moves only window rows.  Partitioning assumption:
    one arrival-time bucket fits a group (size ``bucket_hours`` by the
    corpus's event rate — shrink it for denser streams)."""
    jit_us = 1_000_000
    bucket_us = bucket_hours * 3600 * 1_000_000
    win_us = 3600 * 1_000_000
    delay_us = delay_seconds * 1_000_000
    # Knuth multiplicative hash, reduced mod jitter.  Computed as
    # ((id % m) * (K % m)) % m so int64 never overflows; DuckDB runs the
    # direct HUGEINT form — identical by modular arithmetic.
    kmod = 2654435761 % jitter_seconds

    def _arrival(eid: np.ndarray, ts_us: np.ndarray) -> np.ndarray:
        return ts_us + ((eid % jitter_seconds) * kmod) % jitter_seconds * jit_us

    # ---- pass A: per-bucket max event time (column-pruned light scan)
    ds_a = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def bucket_max(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        bucket = _arrival(eid, ts_us) // bucket_us
        tmp = pa.table({"bucket": pa.array(bucket), "ts_us": pa.array(ts_us)})
        return tmp.group_by("bucket").aggregate([("ts_us", "max")])

    per_bucket = (
        ds_a.map_batches(bucket_max, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("ts_us_max", alias_name="mx"))
        .to_pandas()  # tiny: one row per bucket_hours of stream time
    )
    order = np.argsort(per_bucket["bucket"].to_numpy())
    b_ids = per_bucket["bucket"].to_numpy()[order]
    b_max = per_bucket["mx"].to_numpy()[order]
    # exclusive prefix max: carry[i] = max ts over all earlier buckets
    carry = np.concatenate(
        [[np.int64(-(2**62))], np.maximum.accumulate(b_max)[:-1]]
    )
    carry_ref = ray.put((b_ids, carry))

    # ---- pass B: exact watermark inside each bucket + window partials
    ds_b = read_table(sf_dir, "events", columns=["event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        arrival = _arrival(eid, ts_us)
        return pa.table(
            {
                "bucket": pa.array(arrival // bucket_us),
                "arrival_us": pa.array(arrival),
                "event_id": t["event_id"],
                "ts_us": pa.array(ts_us),
                "value_c": _cents(t["value"]),
            }
        )

    part_schema = pa.schema(
        [
            ("window_us", pa.int64()),
            ("n_kept", pa.int64()),
            ("n_late", pa.int64()),
            ("kept_c", pa.int64()),
        ]
    )

    def bucket_windows(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        b_ids_l, carry_l = ray.get(carry_ref)
        outs = []
        for bkt, grp in g.groupby("bucket", sort=True):
            o = np.lexsort((grp["event_id"].to_numpy(), grp["arrival_us"].to_numpy()))
            ts = grp["ts_us"].to_numpy()[o]
            cents = grp["value_c"].to_numpy()[o]
            c_in = carry_l[np.searchsorted(b_ids_l, bkt)]
            wm = np.maximum(np.maximum.accumulate(ts), c_in) - delay_us
            late = ts < wm
            win = (ts // win_us) * win_us
            uw, inv = np.unique(win, return_inverse=True)
            n_late = np.zeros(uw.size, dtype=np.int64)
            np.add.at(n_late, inv[late], 1)
            n_kept = np.zeros(uw.size, dtype=np.int64)
            np.add.at(n_kept, inv[~late], 1)
            kept_c = np.zeros(uw.size, dtype=np.int64)
            np.add.at(kept_c, inv[~late], cents[~late])
            outs.append((uw, n_kept, n_late, kept_c))
        return pa.table(
            {
                "window_us": pa.array(np.concatenate([o[0] for o in outs])),
                "n_kept": pa.array(np.concatenate([o[1] for o in outs])),
                "n_late": pa.array(np.concatenate([o[2] for o in outs])),
                "kept_c": pa.array(np.concatenate([o[3] for o in outs])),
            },
            schema=part_schema,
        )

    partials = (
        ds_b.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_windows, batch_format="pandas")
    )
    agg = partials.groupby("window_us").aggregate(
        Sum("n_kept", alias_name="n_kept"),
        Sum("n_late", alias_name="n_late"),
        Sum("kept_c", alias_name="kept_c"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.cast(t["window_us"], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_kept": pc.cast(t["n_kept"], pa.int64()),
                "n_late": pc.cast(t["n_late"], pa.int64()),
                "sum_value_kept": pc.divide(
                    pc.cast(t["kept_c"], pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q_WATERMARK_SQL = """
WITH a AS (
  SELECT ts, value,
         epoch_us(ts)
           + ((CAST(event_id AS HUGEINT) * 2654435761) % 3600) * 1000000
           AS arrival_us,
         event_id
  FROM events
), w AS (
  SELECT ts, value,
         MAX(ts) OVER (ORDER BY arrival_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS max_ts
  FROM a
), f AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
           AS window_start,
         (epoch_us(ts) < epoch_us(max_ts) - 900000000) AS late,
         value
  FROM w
)
SELECT window_start,
       CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN late THEN 0
                     ELSE CAST(FLOOR(value*100 + 0.5) AS BIGINT) END)
            AS BIGINT) / 100.0 AS sum_value_kept
FROM f GROUP BY window_start
"""


def q_funnel(sf_dir: str) -> "pd.DataFrame":
    """Ordered conversion funnel view -> click -> purchase: how many
    users reached each step, where a step only counts when it happens
    STRICTLY AFTER the user's completion of the previous step
    (first view, then first click after that view, then first purchase
    after that click).

    Scale shape: the scan projects/filters to the three step types per
    batch (value/props never leave the read), so the groupby(user)
    shuffle moves only (user_id, event_type, ts) rows.  A funnel has no
    lossless small per-type partial (step k's time depends on step
    k-1's), so the per-user event set is the minimal shuffle payload.
    The step walk is three masked ``reduceat`` sweeps over the sorted
    bucket group (first view, first later click, any later purchase) —
    no per-user python; each bucket emits ONE partial row and the
    final reduce is a 3-counter sum.
    """
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    steps = ("view", "click", "purchase")

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=pa.array(steps)))

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    part_schema = pa.schema(
        [("nv", pa.int64()), ("s2", pa.int64()), ("s3", pa.int64())]
    )
    _INF = np.int64(2**62)

    def user_steps(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return part_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        starts, _, run_of = runs(u)
        n = u.size
        idx = np.arange(n, dtype=np.int64)
        # first view per user (ts-sorted => first occurrence = min ts)
        vi = np.minimum.reduceat(np.where(et == steps[0], idx, n), starts)
        entered = vi < n
        t1 = np.where(entered, ts[np.minimum(vi, n - 1)], _INF)
        # first click strictly after the first view
        cand = (et == steps[1]) & (ts > t1[run_of])
        ci = np.minimum.reduceat(np.where(cand, idx, n), starts)
        s2 = ci < n
        t2 = np.where(s2, ts[np.minimum(ci, n - 1)], _INF)
        # any purchase strictly after that click
        pnd = (et == steps[2]) & (ts > t2[run_of])
        s3 = np.maximum.reduceat(pnd.astype(np.int64), starts) > 0
        return pa.table(
            {
                "nv": pa.array([int(entered.sum())], pa.int64()),
                "s2": pa.array([int(s2.sum())], pa.int64()),
                "s3": pa.array([int((s2 & s3).sum())], pa.int64()),
            },
            schema=part_schema,
        )

    per_bucket = bucket_grouped(pruned, "user_id").map_groups(
        user_steps, batch_format="pyarrow"
    )
    agg = per_bucket.aggregate(
        Sum("nv", alias_name="n_view"),
        Sum("s2", alias_name="n_view_click"),
        Sum("s3", alias_name="n_full_funnel"),
    )
    return pd.DataFrame(
        {
            "n_view": [int(agg["n_view"] or 0)],
            "n_view_click": [int(agg["n_view_click"] or 0)],
            "n_full_funnel": [int(agg["n_full_funnel"] or 0)],
        }
    )


Q_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_view_click,
       (SELECT COUNT(*) FROM s3) AS n_full_funnel
"""


def q_event_transitions(sf_dir: str) -> ray.data.Dataset:
    """First-order Markov transition counts between consecutive event
    types per user (ordered by ts, event_id tie-break) — the session-
    flow matrix behind next-action models.

    Coarse-bucket shuffle moves (user_id, event_type, ts, event_id);
    one lexsort per bucket group + one shifted comparison produces
    every (prev, next) pair vectorized (dictionary-encoded), and
    per-bucket partial counts keep the final transition groupby at
    |types|^2 rows."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema(
        [("prev_type", pa.string()), ("next_type", pa.string()), ("n", pa.int64())]
    )

    def transitions(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].dictionary_encode()
        et = et.chunk(0) if isinstance(et, pa.ChunkedArray) else et
        code = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        prev_c, next_c = code[:-1][same], code[1:][same]
        if prev_c.size == 0:
            return out_schema.empty_table()
        ntypes = int(code.max()) + 1
        uniq, cnt = np.unique(prev_c * ntypes + next_c, return_counts=True)
        lut = et.dictionary.cast(pa.string())
        return pa.table(
            {
                "prev_type": lut.take(pa.array(uniq // ntypes)),
                "next_type": lut.take(pa.array(uniq % ntypes)),
                "n": pa.array(cnt.astype(np.int64)),
            },
            schema=out_schema,
        )

    partials = bucket_grouped(ds, "user_id").map_groups(
        transitions, batch_format="pyarrow"
    )
    return partials.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n")
    )


Q_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def q_resample_ffill(sf_dir: str) -> ray.data.Dataset:
    """Per-user hourly grid resample with forward fill: for each user,
    sample the last observed ``value`` at every whole hour between the
    user's first and last event (grid points BEFORE the first event do
    not exist by construction) — the gap-filling step before
    time-series feature extraction.

    Ambiguity guard shared with the SQL oracle: events are first
    collapsed to one row per (user, ts) keeping the max event_id's
    value, so the as-of pick is deterministic on duplicate timestamps.
    Coarse-bucket shuffle; per bucket group the grid is materialized
    for ALL users at once (repeat/cumsum arithmetic) and resolved with
    one run-restricted searchsorted (functions/segments.py)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("grid_ts", pa.timestamp("us")),
         ("value", pa.float64())]
    )
    hour_us = 3600 * 1_000_000

    def resample(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        v = g["value"].to_numpy(zero_copy_only=False)[order]
        # collapse duplicate (user, ts) -> last row (max event_id)
        keep = np.concatenate([(u[1:] != u[:-1]) | (ts[1:] != ts[:-1]), [True]])
        u, ts, v = u[keep], ts[keep], v[keep]
        starts, lengths, _ = runs(u)
        ends = starts + lengths - 1
        lo_h = -(-ts[starts] // hour_us)  # ceil to next whole hour
        hi_h = ts[ends] // hour_us
        counts = np.maximum(hi_h - lo_h + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        grid_run = np.repeat(np.arange(starts.size, dtype=np.int64), counts)
        off0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(total, dtype=np.int64) - off0[grid_run]
        grid = (lo_h[grid_run] + pos) * hour_us
        idx = run_searchsorted(ts, grid, starts, lengths, grid_run, "right") - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts][grid_run]),
                "grid_ts": pa.array(grid).cast(pa.timestamp("us")),
                "value": pa.array(v[idx], type=pa.float64()),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(
        resample, batch_format="pyarrow"
    )


Q_RESAMPLE_SQL = """
WITH dedup AS (
  SELECT user_id, ts, value
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
), bounds AS (
  SELECT user_id,
         CAST(CEIL(epoch_us(MIN(ts)) / 3600000000.0) AS BIGINT) AS lo_h,
         epoch_us(MAX(ts)) // 3600000000 AS hi_h
  FROM dedup GROUP BY user_id
), grid AS (
  SELECT user_id, make_timestamp(h * 3600000000) AS grid_ts
  FROM (SELECT user_id, UNNEST(range(lo_h, hi_h + 1)) AS h
        FROM bounds WHERE hi_h >= lo_h)
)
SELECT g.user_id, g.grid_ts, d.value
FROM grid g ASOF JOIN dedup d
  ON g.user_id = d.user_id AND g.grid_ts >= d.ts
"""


def q_range_views_before_click(sf_dir: str) -> ray.data.Dataset:
    """Range (interval) join — for every click, how many views by the
    same user landed in the hour before it: ts in [click-1h, click).
    Ray Data has no range join; this is the BUCKET-REPLICATION
    pattern: each view is replicated into its own hour bucket and the
    next one, clicks key on their single bucket, an equi-join on
    (user, bucket) meets every candidate pair EXACTLY once (the two
    view buckets are distinct, only one can equal the click's), and a
    vectorized window filter + per-click sum finishes.  Unlike the
    per-user ``map_groups`` asof (q_asof_view_before_click) this
    never needs a user's full history in one task — the shuffle key is
    (user, hour), so even a pathological single user spreads across
    buckets."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    hour_us = 3600 * 1_000_000

    def clicks_tbl(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "bucket": pc.divide(ts_us, hour_us),
                "click_id": t["event_id"],
                "click_us": ts_us,
            }
        )

    def views_tbl(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "view"))
        ts_us = pc.cast(t["ts"], pa.int64())
        b0 = pc.divide(ts_us, hour_us)
        dup = pa.concat_tables(
            [
                pa.table({"user_id": t["user_id"], "bucket": b0, "view_us": ts_us}),
                pa.table(
                    {
                        "user_id": t["user_id"],
                        "bucket": pc.add(b0, 1),
                        "view_us": ts_us,
                    }
                ),
            ]
        )
        return dup

    # repartition before the join: a read block whose rows ALL filter
    # away keeps its pre-map schema (map_batches never runs on empty
    # blocks) and poisons the join's FieldRef resolution — the
    # repartition re-blocks everything to the mapped schema
    clicks = ds.map_batches(
        clicks_tbl, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(join_partitions())
    views = ds.map_batches(
        views_tbl, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(join_partitions())

    j = clicks.join(
        views, join_type="left_outer", num_partitions=join_partitions(),
        on=("user_id", "bucket"),
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        lo = pc.subtract(t["click_us"], hour_us)
        ok = pc.and_kleene(
            pc.greater_equal(t["view_us"], lo), pc.less(t["view_us"], t["click_us"])
        )
        hit = pc.cast(pc.coalesce(ok, False), pa.int64())
        return (
            pa.table({"click_id": t["click_id"], "hit": hit})
            .group_by(["click_id"]).aggregate([("hit", "sum")])
            .rename_columns(["click_id", "n"])
        )

    partials = j.map_batches(partial_counts, batch_format="pyarrow")
    return partials.groupby("click_id").aggregate(Sum("n", alias_name="n_views"))


Q_RANGE_JOIN_SQL = """
SELECT c.event_id AS click_id, COUNT(v.ts) AS n_views
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = c.user_id
 AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts < c.ts
GROUP BY 1
"""


def q_zscore_outliers(sf_dir: str) -> ray.data.Dataset:
    """Population z-score outlier filter: events whose |value - mu| >
    3 sigma for their event_type.  Two passes: an exact integer-cents
    moment aggregate collapses to |types| rows on the driver (the
    broadcast side), then one streaming filter pass recomputes z per
    row vectorized.  Float parity: mu/sigma/z are derived from the
    same BIGINT sums with the same IEEE-754 op order as the SQL
    oracle, so even boundary rows agree bit-exactly."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy()
        tmp = pa.table(
            {
                "event_type": t["event_type"],
                "s": pa.array(c),
                "s2": pa.array(c * c),
            }
        )
        return tmp.group_by(["event_type"]).aggregate(
            [("s", "sum"), ("s2", "sum"), ("s", "count")]
        )

    stats = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("s_sum", alias_name="s"),
            Sum("s2_sum", alias_name="s2"),
            Sum("s_count", alias_name="n"),
        )
        .take_all()
    )
    types = sorted(r["event_type"] for r in stats)
    by_type = {r["event_type"]: r for r in stats}
    mu, sd = np.empty(len(types)), np.empty(len(types))
    for i, ty in enumerate(types):
        r = by_type[ty]
        nf, sf, s2f = float(r["n"]), float(r["s"]), float(r["s2"])
        m = sf / nf
        var = (s2f - sf * sf / nf) / nf
        mu[i] = m
        sd[i] = np.sqrt(var)
    type_arr = pa.array(types, type=pa.string())

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        c = _cents(t["value"]).to_numpy().astype(np.float64)
        z = (c - mu[idx]) / sd[idx]
        keep = np.abs(z) > 3.0
        return pa.table(
            {
                "event_id": pa.array(t["event_id"].to_numpy(zero_copy_only=False)[keep]),
                "event_type": pc.array_filter(t["event_type"], pa.array(keep)),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


Q_ZSCORE_SQL = """
WITH st AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                * CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
), m AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         SQRT((CAST(s2 AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE)) AS sd
  FROM st
)
SELECT e.event_id, e.event_type
FROM events e JOIN m ON e.event_type = m.event_type
WHERE ABS((CAST(CAST(FLOOR(e.value*100 + 0.5) AS BIGINT) AS DOUBLE) - m.mu) / m.sd)
      > 3.0
"""


def q_cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users bucketed by first-active day
    (the cohort), counted per (cohort_day, offset_days) active day.

    Scale shape: per-batch distinct (user, day) collapse BEFORE the
    keyed shuffle (an activity log has many events per user-day, the
    shuffle moves one row per user-day per batch); one coarse-bucket
    group computes every user's cohort and offsets in a single lexsort
    + run-boundary pass with a local pre-count, so the final
    (cohort, offset) groupby sums tiny partials.  No driver-side state
    at all."""
    day_us = 86400 * 1_000_000
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def user_days(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pc.divide(pc.cast(t["ts"], pa.int64()), day_us),
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    distinct = ds.map_batches(user_days, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [("cohort_day", pa.int64()), ("offset_days", pa.int64()), ("n", pa.int64())]
    )

    def per_user(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        # dedup (user, day) across source batches
        keep = np.concatenate([[True], (u[1:] != u[:-1]) | (day[1:] != day[:-1])])
        u, day = u[keep], day[keep]
        starts, _, run_of = runs(u)
        cohort = day[starts][run_of]
        offset = day - cohort
        uniq, cnt = np.unique(cohort * np.int64(1 << 32) + offset,
                              return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(uniq >> 32),
                "offset_days": pa.array(uniq & np.int64((1 << 32) - 1)),
                "n": pa.array(cnt.astype(np.int64)),
            },
            schema=out_schema,
        )

    partials = bucket_grouped(distinct, "user_id").map_groups(
        per_user, batch_format="pyarrow"
    )
    return partials.groupby(["cohort_day", "offset_days"]).aggregate(
        Sum("n", alias_name="n_users")
    )


Q_COHORT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), c AS (
  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY 1
)
SELECT c.cohort AS cohort_day, ud.day - c.cohort AS offset_days,
       COUNT(*) AS n_users
FROM ud JOIN c ON ud.user_id = c.user_id
GROUP BY 1, 2
"""


def q_percent_rank_value(sf_dir: str) -> ray.data.Dataset:
    """PERCENT_RANK() per event_type over the cents value grid —
    (rank-1)/(n-1) with rank = 1 + count of strictly smaller values.

    Two passes, no keyed shuffle of the fact rows: pass 1 reduces to
    the exact per-(type, cents) histogram (bounded by the value
    domain, ~18k rows here — at an unbounded domain swap in the
    mergeable histogram sketch from ``q_hist_quantiles``); the driver
    broadcasts per-type sorted cents + cumulative counts, and pass 2
    ranks every row with one ``searchsorted`` per type per batch.
    Parity: the single int/int division matches SQL PERCENT_RANK
    bit-for-bit (no grid needed)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})
            .group_by(["event_type", "c"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "c", "n"])
        )

    rows = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["c"], r["n"]))
    lut = {}
    for ty, pairs in by_type.items():
        pairs.sort()
        cs = np.array([p[0] for p in pairs], dtype=np.int64)
        ns = np.array([p[1] for p in pairs], dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(ns)[:-1]])  # strictly-smaller count
        lut[ty] = (cs, below, int(ns.sum()))

    def rank(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy()
        types = t["event_type"].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(t), dtype=np.float64)
        for ty in np.unique(types):
            m = types == ty
            cs, below, n = lut[ty]
            if n > 1:
                pr[m] = below[np.searchsorted(cs, c[m])] / (n - 1)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "pr": pa.array(pr, type=pa.float64()),
            }
        )

    return ds.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)


Q_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       PERCENT_RANK() OVER (
         PARTITION BY event_type
         ORDER BY CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS pr
FROM events
"""


def q_moving_window_rows(sf_dir: str, k: int = 7) -> ray.data.Dataset:
    """ROWS-frame window (``ROWS BETWEEN 6 PRECEDING AND CURRENT
    ROW``): per event, the sum/count of ``value`` over the user's last
    k events in deterministic (ts, event_id) order — the row-count
    companion to ``q_rolling_user_value``'s RANGE frame.  One keyed
    shuffle; inside the group a single prefix-sum serves every
    window."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("win_value", pa.float64()),
            ("n_window", pa.int64()),
        ]
    )

    def windows(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False)[order] * 100 + 0.5
        ).astype(np.int64)
        starts, _, run_of = runs(u)
        csum = np.concatenate([[0], np.cumsum(cents)])
        i = np.arange(u.size, dtype=np.int64)
        lo = np.maximum(i - (k - 1), starts[run_of])
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(u),
                "win_value": pa.array((csum[i + 1] - csum[lo]) / 100.0),
                "n_window": pa.array(i + 1 - lo),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(
        windows, batch_format="pyarrow"
    )


Q_MOVING_ROWS_SQL = """
SELECT event_id, user_id,
       SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w / 100.0 AS win_value,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_minmax_scale(sf_dir: str) -> ray.data.Dataset:
    """Min-max feature scaling per event_type: (v - min) / (max - min)
    on the cents grid — the normalize-before-training shape.  Exact
    per-type extrema collapse to |types| rows (broadcast side); the
    scaling pass streams.  NULL when a type has a single distinct
    value (denominator 0), matching the SQL NULLIF."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def extrema(t: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})
            .group_by(["event_type"])
            .aggregate([("c", "min"), ("c", "max")])
            .rename_columns(["event_type", "lo", "hi"])
        )

    rows = (
        ds.map_batches(extrema, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .take_all()
    )
    lut = {r["event_type"]: (r["lo"], r["hi"]) for r in rows}

    def scale(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy().astype(np.float64)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        scaled = np.full(len(t), np.nan)
        for ty in np.unique(types):
            lo, hi = lut[ty]
            if hi > lo:
                m = types == ty
                scaled[m] = (c[m] - lo) / (hi - lo)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "scaled": pa.array(scaled, type=pa.float64(), from_pandas=True),
            }
        )

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


Q_MINMAX_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type,
       CAST(cents - MIN(cents) OVER w AS DOUBLE)
         / NULLIF(MAX(cents) OVER w - MIN(cents) OVER w, 0) AS scaled
FROM c
WINDOW w AS (PARTITION BY event_type)
"""


def q_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured extraction: parse the JSON ``props`` column and
    aggregate the extracted ``k`` per event_type (count / sum / min /
    max).  The parse is one vectorized RE2 ``extract_regex`` kernel
    per batch (the props schema here is a flat int field, so the
    regex fast-path is exact; a general nested payload would swap in a
    per-batch ``json.loads`` actor stage), partials pre-reduce per
    batch, and the shuffle moves |types| rows."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?[0-9]+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        return (
            pa.table({"event_type": t["event_type"], "k": k})
            .group_by(["event_type"])
            .aggregate([("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")])
            .rename_columns(["event_type", "n", "sum_k", "min_k", "max_k"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


Q_PROPS_SQL = """
SELECT event_type,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""


def q_ewma_user_value(sf_dir: str, span: int = 20) -> ray.data.Dataset:
    """Exponentially-weighted moving average of ``value`` per user (the
    time-decayed feature every ranking/feature pipeline computes):
    weight 2^-d for the event d positions back, truncated at ``span``
    trailing events — dyadic weights make the weighted sums EXACT
    int64 arithmetic in both engines (cents x 2^19 x 20 < 2^53 is not
    even needed: it stays int64), so the single float division is
    bit-identical to DuckDB's and the result floor-grids cleanly.

    Scale shape: one coarse-bucket shuffle; inside each sorted run the trailing
    window is 20 shifted multiply-adds over the FLAT column with
    row-boundary masks — no per-user python loop, no quadratic frame."""
    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "value"]
    )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ewma", pa.float64()),
        ]
    )

    def ewma(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort(
            (g["event_id"].to_numpy(zero_copy_only=False), ts, u)
        )
        uid = u[order]
        eid = g["event_id"].to_numpy(zero_copy_only=False)[order]
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False)[order] * 100 + 0.5
        ).astype(np.int64)
        n = cents.size
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        for d in range(span):
            w = np.int64(1) << np.int64(span - 1 - d)
            if d == 0:
                num += cents * w
                den += w
            else:
                same = uid[d:] == uid[:-d]
                num[d:][same] += cents[:-d][same] * w
                den[d:][same] += w
        val = np.floor(num / (100.0 * den) * 1e6 + 1e-3) / 1e6
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ewma": pa.array(val),
            },
            schema=out_schema,
        )

    return bucket_grouped(ds, "user_id").map_groups(ewma, batch_format="pyarrow")


Q_EWMA_SQL = """
WITH o AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.event_id, a.user_id,
       FLOOR(CAST(SUM(b.c * (CAST(1 AS BIGINT) << (19 - (a.rn - b.rn)))) AS DOUBLE)
             / (100.0 * SUM(CAST(1 AS BIGINT) << (19 - (a.rn - b.rn))))
             * 1000000 + 0.001) / 1000000 AS ewma
FROM o a JOIN o b
  ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
GROUP BY a.event_id, a.user_id
"""


def q_sliding_distinct_users(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15
) -> ray.data.Dataset:
    """DISTINCT users per hopping window — the aggregation hop windows
    can't get from mergeable sums: distinct needs a dedup, and the
    naive shape (ship every (window, user) occurrence) multiplies the
    shuffle by window/hop x duplicate visits.

    Scale shape: (1) per-batch local dedup of (window, user) pairs
    (np.unique over the fanned-out composites) so repeat visits inside
    a batch never leave it; (2) ONE shuffle keyed on a 64-way coarse
    window bucket; (3) inside each bucket one lexsort resolves both the
    cross-batch dedup and the per-window counts via run lengths — no
    per-window python."""
    hop_us = hop_minutes * 60 * 1_000_000
    k = window_minutes // hop_minutes
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        grid = ts_us // hop_us
        ws = (np.repeat(grid, k) - np.tile(np.arange(k, dtype=np.int64), n)) * hop_us
        uu = np.repeat(uid, k)
        pairs = np.unique(np.stack([ws, uu], axis=1), axis=0)
        return pa.table(
            {
                "bucket": pa.array((pairs[:, 0] // hop_us) % 64),
                "w_us": pa.array(pairs[:, 0]),
                "user_id": pa.array(pairs[:, 1]),
            }
        )

    mid = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [("window_start", pa.timestamp("us")), ("n_users", pa.int64())]
    )

    def resolve(g: "pd.DataFrame") -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        w = g["w_us"].to_numpy()
        u = g["user_id"].to_numpy()
        order = np.lexsort((u, w))
        ws_, us_ = w[order], u[order]
        first = np.concatenate([[True], (ws_[1:] != ws_[:-1]) | (us_[1:] != us_[:-1])])
        ws_u = ws_[first]
        w_starts = np.concatenate([[True], ws_u[1:] != ws_u[:-1]])
        w_vals = ws_u[w_starts]
        counts = np.diff(np.concatenate([np.flatnonzero(w_starts), [ws_u.size]]))
        return pa.table(
            {
                "window_start": pa.array(w_vals).view(pa.timestamp("us")),
                "n_users": pa.array(counts.astype(np.int64)),
            },
            schema=out_schema,
        )

    return mid.groupby("bucket").map_groups(resolve, batch_format="pandas")


Q_SLIDING_DISTINCT_SQL = """
SELECT make_timestamp(((CAST(FLOOR(epoch(ts) / 900) AS BIGINT) - k.k) * 900)
                      * 1000000) AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events, (SELECT UNNEST(range(0, 4)) AS k) k
GROUP BY 1
"""


def q_trimmed_mean_value(sf_dir: str, trim_pct: int = 5) -> ray.data.Dataset:
    """5%-trimmed mean of ``value`` per event_type — the robust
    aggregate that survives heavy-tailed junk where AVG does not.

    Order statistics WITHOUT a global sort: pass 1 reduces the fact
    table to the exact per-(type, cents) histogram (bounded by the
    value domain, the ``q_percent_rank_value`` shape — at an unbounded
    domain swap in the mergeable histogram sketch); the driver trims
    k = n // 20 occurrences off each end of the cumulative histogram
    with integer arithmetic (partial bins included exactly), so the
    trimmed sum is int64-exact and the single double division matches
    the SQL window form bit-for-bit."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})
            .group_by(["event_type", "c"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "c", "n"])
        )

    rows = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["c"], r["n"]))
    out_t, out_n, out_mean = [], [], []
    for ty in sorted(by_type):
        pairs = sorted(by_type[ty])
        cs = np.array([p[0] for p in pairs], dtype=np.int64)
        ns = np.array([p[1] for p in pairs], dtype=np.int64)
        total = int(ns.sum())
        k = total // (100 // trim_pct)
        kept = total - 2 * k
        if kept <= 0:
            continue
        cum = np.cumsum(ns)
        # sum of the k smallest occurrences (partial last bin exact)
        def head_sum(k_):
            if k_ == 0:
                return 0
            i = int(np.searchsorted(cum, k_))
            below = int((ns[:i] * cs[:i]).sum())
            prev = int(cum[i - 1]) if i > 0 else 0
            return below + (k_ - prev) * int(cs[i])
        lo = head_sum(k)
        hi_all = int((ns * cs).sum())
        # k largest = total sum minus sum of first (total - k)
        hi = hi_all - head_sum(total - k)
        trimmed = hi_all - lo - hi
        out_t.append(ty)
        out_n.append(kept)
        out_mean.append(
            np.floor(float(trimmed) / kept / 100.0 * 1e6) / 1e6
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "n_kept": pa.array(out_n, pa.int64()),
                "trimmed_mean": pa.array(out_mean, pa.float64()),
            }
        )
    )


Q_TRIMMED_MEAN_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 * 1000000)
         / 1000000 AS trimmed_mean
FROM r
WHERE rn > n // 20 AND rn <= n - n // 20
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Global running revenue — distributed prefix scan (two-phase offsets)
# ---------------------------------------------------------------------------

def q_global_running_revenue(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide cumulative revenue in (ts, event_id) order — the
    canonical DISTRIBUTED PREFIX SCAN: unlike ``q_running_user_value``
    (keyed per user) this window has no partition key at all, which is
    exactly the shape naive engines serialize on one node.

    Two-phase exact scan: (1) per-batch day-bucket cent totals + one
    bounded groupby(day) -> the driver builds EXCLUSIVE day offsets
    (calendar-bounded: rows on the driver = distinct days, never the
    corpus) and broadcasts them once; (2) one shuffle keyed on the day
    (bounded key — safe for ``map_groups`` per CLAUDE.md), each group
    lexsorts its day once and adds offset + local cumsum.  A hot day
    sub-buckets by hour with the same algebra.  Integer cents end to
    end — bit-identical to the SQL running window."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "value"])
    day_us = 86_400_000_000

    def day_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        tmp = pa.table(
            {
                "day": pc.divide(us, day_us),
                "c": _cents(t["value"]),
            }
        )
        return tmp.group_by("day").aggregate([("c", "sum")]).rename_columns(
            ["day", "c"]
        )

    totals = (
        ds.map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    totals.sort(key=lambda r: r["day"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["day"])] = acc
        acc += int(r["c"])
    off_ref = ray.put(offsets)

    def add_day(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "us": us,
                "day": pc.divide(us, day_us),
                "c": _cents(t["value"]),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, day))  # group may span several days
        cum = np.cumsum(c[order])
        # per-day re-basing: each day's run starts at its exclusive offset
        d_sorted = day[order]
        bnd = np.concatenate([[True], d_sorted[1:] != d_sorted[:-1]])
        starts = np.flatnonzero(bnd)
        base = np.array([off[int(d_sorted[s])] for s in starts], dtype=np.int64)
        prior = np.concatenate([[0], cum[starts[1:] - 1]]) if starts.size else base
        rebased = cum + np.repeat(base - prior, np.diff(np.append(starts, len(cum))))
        out = np.empty_like(rebased)
        out[order] = rebased
        return pa.table(
            {
                "event_id": g["event_id"],
                "cum_cents": pa.array(out.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(add_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .map_groups(scan, batch_format="pyarrow")
    )


Q_GLOBAL_RUNNING_REVENUE_SQL = """
SELECT event_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM events
"""


# ---------------------------------------------------------------------------
# Windowed grouped top-k: top spenders per hour window
# ---------------------------------------------------------------------------

def q_top_users_per_hour(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k users by value inside each tumbling hour — the window x
    ranking composite (streaming leaderboard shape).

    Scale shape: the unbounded user key never reaches a ranking stage
    raw — per-batch (hour, user) cent partials collapse occurrences
    first, ONE keyed shuffle moves those ~24 B rows, and the ranking
    runs once per hour GROUP (hours are calendar-bounded) with a single
    lexsort + head-k slice, not a per-user python call.  Ties break on
    user_id, mirroring the SQL window's ORDER BY."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "user_id": t["user_id"],
                "c": _cents(t["value"]),
            }
        )
        return (
            tmp.group_by(["hour", "user_id"])
            .aggregate([("c", "sum")])
            .rename_columns(["hour", "user_id", "cents"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "user_id"])
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def topk(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -c))[:k]
        return pa.table(
            {
                "hour": g["hour"].take(pa.array(order)),
                "user_id": pa.array(uid[order]),
                "cents": pa.array(c[order].astype(np.int64)),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return agg.groupby("hour").map_groups(topk, batch_format="pyarrow")


Q_TOP_USERS_PER_HOUR_SQL = """
WITH s AS (
  SELECT date_trunc('hour', ts) AS hour, user_id,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY hour, user_id
)
SELECT hour, user_id, cents,
       CAST(row_number() OVER (PARTITION BY hour
            ORDER BY cents DESC, user_id) AS BIGINT) AS rnk
FROM s QUALIFY rnk <= 3
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov: each event_type vs the rest
# ---------------------------------------------------------------------------

def q_ks_by_event_type(sf_dir: str) -> pa.Table:
    """Exact two-sample KS statistic of each event type's value
    distribution against all OTHER events — the distribution-shift test
    ("did checkout values drift from everything else?") completing the
    chi-square / AUC statistics family.

    Exactness: on the integer cents grid the KS supremum is
    max |c1*n2 - c2*n1| / (n1*n2) — pure integer arithmetic until ONE
    final double division (floored to the 1e-6 grid), so parity with
    the SQL window-cumsum oracle is bit-for-bit.  Scale shape: the only
    shuffle is the (type, cents) histogram groupby, bounded by the
    value DOMAIN, not the corpus (``q_percent_rank_value`` precedent);
    the driver folds the tiny grid in numpy."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})
            .group_by(["event_type", "c"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "c", "n"])
        )

    rows = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    types = sorted({r["event_type"] for r in rows})
    grid = np.array(sorted({int(r["c"]) for r in rows}), dtype=np.int64)
    counts = {ty: np.zeros(grid.size, dtype=np.int64) for ty in types}
    for r in rows:
        counts[r["event_type"]][np.searchsorted(grid, int(r["c"]))] += int(r["n"])
    total_at = np.zeros(grid.size, dtype=np.int64)
    for ty in types:
        total_at += counts[ty]
    cum_total = np.cumsum(total_at)
    n_all = int(cum_total[-1]) if grid.size else 0

    out_ty, out_n, out_num, out_ks = [], [], [], []
    for ty in types:
        cum1 = np.cumsum(counts[ty])
        n1 = int(cum1[-1])
        n2 = n_all - n1
        cum2 = cum_total - cum1
        num = int(np.abs(cum1 * n2 - cum2 * n1).max()) if n1 and n2 else 0
        ks = (
            float(np.floor(float(num) / float(n1 * n2) * 1e6) / 1e6)
            if n1 and n2
            else 0.0
        )
        out_ty.append(ty)
        out_n.append(n1)
        out_num.append(num)
        out_ks.append(ks)
    return pa.table(
        {
            "event_type": pa.array(out_ty, type=pa.string()),
            "n": pa.array(out_n, type=pa.int64()),
            "ks_num": pa.array(out_num, type=pa.int64()),
            "ks": pa.array(out_ks, type=pa.float64()),
        }
    )


Q_KS_BY_EVENT_TYPE_SQL = """
WITH h AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, c
), grid AS (
  SELECT DISTINCT c FROM h
), types AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n1 FROM h GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM h
), cells AS (
  SELECT t.event_type, g.c, t.n1, COALESCE(h.n, 0) AS n
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.c = g.c
), cum1s AS (
  SELECT event_type, c, n1,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum1
  FROM cells
), gcum AS (
  SELECT c, CAST(SUM(n2) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_all
  FROM (SELECT c, SUM(n) AS n2 FROM h GROUP BY c)
)
SELECT a.event_type,
       a.n1 AS n,
       CAST(MAX(ABS(a.cum1 * (t.n_all - a.n1)
                    - (g.cum_all - a.cum1) * a.n1)) AS BIGINT) AS ks_num,
       CASE WHEN t.n_all - a.n1 = 0 THEN 0.0
            ELSE FLOOR(CAST(MAX(ABS(a.cum1 * (t.n_all - a.n1)
                               - (g.cum_all - a.cum1) * a.n1)) AS DOUBLE)
                 / (a.n1 * (t.n_all - a.n1)) * 1000000) / 1000000 END AS ks
FROM cum1s a JOIN gcum g USING (c) CROSS JOIN tot t
GROUP BY a.event_type, a.n1, t.n_all
"""


# ---------------------------------------------------------------------------
# Path mining: top per-user event-type trigrams (3-step journeys)
# ---------------------------------------------------------------------------

def q_event_paths(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Most frequent 3-step event-type journeys across all users — the
    sequence-mining extension of ``q_event_transitions``' bigram
    matrix (PrefixSpan-lite for fixed length 3).

    Same coarse-bucket shape: one lexsort per user-hash bucket, two
    shifted comparisons produce every in-user consecutive triple
    vectorized (dictionary codes packed base-|types|), per-bucket
    partial counts keep the final groupby at <= |types|^3 rows, and the
    top-k is a bounded sort."""
    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"]
    )

    out_schema = pa.schema(
        [
            ("step1", pa.string()),
            ("step2", pa.string()),
            ("step3", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def triples(g: pa.Table) -> pa.Table:
        if g.num_rows < 3:
            return out_schema.empty_table()
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].dictionary_encode()
        et = et.chunk(0) if isinstance(et, pa.ChunkedArray) else et
        code = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same3 = (u[2:] == u[:-2]) & (u[1:-1] == u[:-2])
        c1, c2, c3 = code[:-2][same3], code[1:-1][same3], code[2:][same3]
        if c1.size == 0:
            return out_schema.empty_table()
        ntypes = int(code.max()) + 1
        uniq, cnt = np.unique(
            (c1 * ntypes + c2) * ntypes + c3, return_counts=True
        )
        lut = et.dictionary.cast(pa.string())
        return pa.table(
            {
                "step1": lut.take(pa.array(uniq // (ntypes * ntypes))),
                "step2": lut.take(pa.array((uniq // ntypes) % ntypes)),
                "step3": lut.take(pa.array(uniq % ntypes)),
                "n": pa.array(cnt.astype(np.int64)),
            },
            schema=out_schema,
        )

    partials = bucket_grouped(ds, "user_id").map_groups(
        triples, batch_format="pyarrow"
    )
    return (
        partials.groupby(["step1", "step2", "step3"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "step1", "step2", "step3"], descending=[True, False, False, False])
        .limit(k)
    )


Q_EVENT_PATHS_SQL = """
WITH o AS (
  SELECT user_id, event_type AS step1,
         LEAD(event_type, 1) OVER w AS step2,
         LEAD(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE step2 IS NOT NULL AND step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n DESC, step1, step2, step3
LIMIT 10
"""


# ---------------------------------------------------------------------------
# DAU / MAU stickiness: calendar-grain distinct-user rollup
# ---------------------------------------------------------------------------

def q_dau_mau_stickiness(sf_dir: str) -> ray.data.Dataset:
    """Per month: mean daily active users, monthly active users, and
    the DAU/MAU stickiness ratio — the activation report every events
    pipeline ships.

    Exactness + scale: the only corpus-sized shuffle is the distinct
    (day, user) pair groupby (per-batch dedup partials first, so the
    shuffle moves distinct pairs, never events); MAU needs distinct
    (month, user), derived from the SAME day-level pairs (a (day,user)
    pair implies its (month,user) pair) with a second distinct-collapse
    — events are never re-scanned.  The final per-month fold is a
    bounded groupby; mean-DAU and stickiness are single double
    divisions on the 1e-6 grid."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = (
            pa.table({"day": day, "user_id": t["user_id"]})
            .group_by(["day", "user_id"])
            .aggregate([])
        )
        return g

    # two consumers (DAU and MAU) read the pair set; without the
    # materialize Ray re-executes the events scan per consumer.  The
    # pinned set is the DISTINCT (day, user) pairs — bounded by
    # users x active-days, orders of magnitude below the event stream —
    # which is exactly the "small result" case where mid-pipeline
    # materialization is the right trade.  (If even the pair set
    # outgrew the object store — 10^9 users x 365 days — drop the
    # materialize and pay the second streaming scan instead; both
    # consumers remain one-pass streaming shapes.)
    pairs = (
        ds.map_batches(day_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .materialize()
    )

    def per_day(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("day", pa.timestamp("us")), ("dau", pa.int64())]
            ).empty_table()
        g = (
            t.select(["day"]).group_by("day").aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day": pc.cast(g["day"], pa.timestamp("us")),
                "dau": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def month_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("month", pa.timestamp("us")), ("user_id", pa.int64())]
            ).empty_table()
        month = pc.floor_temporal(pc.cast(t["day"], pa.timestamp("us")), unit="month")
        return (
            pa.table({"month": month, "user_id": t["user_id"]})
            .group_by(["month", "user_id"])
            .aggregate([])
        )

    dau_by_month = (
        pairs.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"))
        .map_batches(
            lambda t: pa.table(
                {
                    "month": pc.floor_temporal(
                        pc.cast(t["day"], pa.timestamp("us")), unit="month"
                    ),
                    "dau": pc.cast(t["dau"], pa.int64()),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("month")
        .aggregate(
            Sum("dau", alias_name="dau_sum"), Sum("one", alias_name="n_days")
        )
    )
    mau = (
        pairs.map_batches(month_pairs, batch_format="pyarrow")
        .groupby(["month", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {
                    "month": pc.cast(t["month"], pa.timestamp("us")),
                    "mau_one": pa.array(np.ones(len(t), np.int64)),
                }
            )
            if t.num_rows
            else pa.schema(
                [("month", pa.timestamp("us")), ("mau_one", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        )
        .groupby("month")
        .aggregate(Sum("mau_one", alias_name="mau"))
    )

    joined = dau_by_month.repartition(4).join(
        mau.repartition(4), join_type="inner", num_partitions=4, on=("month",)
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("month", pa.timestamp("us")),
                    ("n_days", pa.int64()),
                    ("mau", pa.int64()),
                    ("mean_dau", pa.float64()),
                    ("stickiness", pa.float64()),
                ]
            ).empty_table()
        ds_ = t["dau_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t["n_days"].to_numpy(zero_copy_only=False).astype(np.int64)
        mau_ = t["mau"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean_dau = np.floor(ds_ / nd.astype(np.float64) * 1e6) / 1e6
        stick = np.floor(
            ds_ / nd.astype(np.float64) / mau_.astype(np.float64) * 1e6
        ) / 1e6
        return pa.table(
            {
                "month": pc.cast(t["month"], pa.timestamp("us")),
                "n_days": pa.array(nd),
                "mau": pa.array(mau_),
                "mean_dau": pa.array(mean_dau),
                "stickiness": pa.array(stick),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


Q_DAU_MAU_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
), dm AS (
  SELECT date_trunc('month', day) AS month,
         CAST(SUM(dau) AS BIGINT) AS dau_sum,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY month
), mau AS (
  SELECT date_trunc('month', day) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM du GROUP BY month
)
SELECT dm.month, dm.n_days, mau.mau,
       FLOOR(CAST(dm.dau_sum AS DOUBLE) / dm.n_days * 1000000) / 1000000
         AS mean_dau,
       FLOOR(CAST(dm.dau_sum AS DOUBLE) / dm.n_days / mau.mau * 1000000)
         / 1000000 AS stickiness
FROM dm JOIN mau USING (month)
"""
