"""Two-width A/B for the derived coarse-bucket fan-out (r4 verdict ask #1).

The window/dedup family shuffles on ``hash(key) % nbuckets`` where
``nbuckets`` is now derived from live cluster CPUs
(``functions/cluster.derive_buckets``: 4 x CPUs, floor 64).  The ask's
done-criterion: a two-width A/B on ``sessionize_100k_users`` showing the
wider derived fan-out causes no reduce starvation (i.e. is not slower
than the old fixed 64) and returns identical results.

Runs q_sessionize over the 100k-user wide fixture (same generator as
bench.py) at width 64 (the old fixed constant) and at the derived width,
3 interleaved passes each in ONE Ray session, asserts the aggregated
session stats are identical across widths, and prints one JSON line.

Run:  python scripts/bench_bucket_width.py
Env:  RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _wide_fixture() -> str:
    """100k users x 3 events, identical to bench.py's wide fixture."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    wide_dir = "/tmp/graft_bench/wide"
    wide_path = os.path.join(wide_dir, "events.parquet")
    if not os.path.exists(wide_path):
        os.makedirs(wide_dir, exist_ok=True)
        rng = np.random.default_rng(7)
        n_users, per = 100_000, 3
        n = n_users * per
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(
                        np.repeat(np.arange(n_users, dtype=np.int64), per)
                    ),
                    "ts": pa.array(
                        (
                            np.int64(1_700_000_000_000_000)
                            + rng.integers(0, 86_400_000_000, n)
                        ).astype("datetime64[us]")
                    ),
                    "event_id": pa.array(np.arange(n, dtype=np.int64)),
                    "value": pa.array(rng.uniform(0, 100, n)),
                }
            ),
            wide_path,
        )
    return wide_dir


def main() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from medical_and_charity_document_extraction_system_ray.functions import (
        cluster,
        segments,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines import events

    wide_dir = _wide_fixture()
    derived = cluster.derive_buckets()
    widths = {"fixed_64": 64, f"derived_{derived}": derived}

    def run(width: int):
        # bucket_grouped resolves nbuckets via the segments-module
        # binding of derive_buckets when not passed explicitly
        orig = segments.derive_buckets
        segments.derive_buckets = lambda *a, **k: width
        try:
            t0 = time.perf_counter()
            df = events.q_sessionize(wide_dir).to_pandas()
            wall = time.perf_counter() - t0
        finally:
            segments.derive_buckets = orig
        return wall, df

    # warm-up (worker spawn + imports, untimed)
    run(64)

    passes: dict[str, list[float]] = {n: [] for n in widths}
    stats: dict[str, tuple] = {}
    for _ in range(3):
        for name, width in widths.items():
            wall, df = run(width)
            passes[name].append(round(wall, 3))
            key = (
                len(df),
                int(df["n_events"].sum()),
                int(df["n_sessions"].sum()),
                int(df["max_session_events"].max()),
            )
            if name in stats:
                assert stats[name] == key, f"{name} nondeterministic: {key}"
            stats[name] = key

    vals = list(stats.values())
    assert all(v == vals[0] for v in vals), f"width changed results: {stats}"

    mins = {n: min(ts) for n, ts in passes.items()}
    fixed = mins["fixed_64"]
    wide = mins[f"derived_{derived}"]
    print(
        json.dumps(
            {
                "metric": "sessionize_100k_users wall-clock, fixed 64 vs "
                "derived coarse-bucket width (min of 3 interleaved passes)",
                "num_cpus": cpus,
                "derived_width": derived,
                "sec": mins,
                "passes": passes,
                "wide_over_fixed": round(wide / fixed, 3),
                "users": vals[0][0],
                "parity": "identical session stats across widths",
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
