"""Dup-heavy fallback-regime benchmark (r4 verdict ask #5).

The minhash (>broadcast_pairs_bytes) and setsim join-plan fallbacks are
parity-tested on toy fixtures but the corpora the driver benches have
NO duplicates, so the fallback regimes never see load.  This script:

1. derives a DETERMINISTIC 30%-duplicate variant of the sf0.1
   documents table (seeded; near-dup rows = original text with the
   last word swapped, exact-dup rows = verbatim copies) under
   ``/tmp/graft_dupheavy`` — no external data;
2. runs q_minhash_lsh_pairs and q_setsim_prefix_join in BOTH regimes
   (broadcast vs forced join fallback) on it;
3. asserts the two regimes return the identical verified pair set
   (green = parity under load, the ask's done-criterion);
4. prints one JSON line with per-regime wall times, recorded in
   BASELINE.md.

Run:  python scripts/bench_dupheavy.py [sf_dir]
Env:  RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = "/tmp/graft_dupheavy"
DUP_FRACTION = 0.30  # of the OUTPUT corpus


def build_fixture(sf_dir: str) -> str:
    """30%-duplicate variant: for a base corpus of n docs, add
    n*0.3/0.7 duplicate rows (half exact, half near: last word
    swapped) with doc_id = 1_000_000 + original.  Deterministic —
    same input -> byte-identical fixture (seeded choice, no time)."""
    out_dir = os.path.join(FIXTURE_DIR, os.path.basename(sf_dir.rstrip("/")))
    out_path = os.path.join(out_dir, "documents.parquet")
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n = t.num_rows
    n_dup = int(round(n * DUP_FRACTION / (1.0 - DUP_FRACTION)))
    rng = np.random.default_rng(20240819)
    picks = rng.choice(n, size=n_dup, replace=False)
    picks.sort()
    base = t.take(pa.array(picks))
    ids = pc.add(base["doc_id"], pa.scalar(1_000_000, pa.int64()))
    texts = base["text"].to_pylist()
    half = n_dup // 2
    near = []
    for i, s in enumerate(texts):
        if i < half:
            near.append(s)  # exact duplicate
        else:
            w = s.split()
            if w:
                w[-1] = "dupword"
            near.append(" ".join(w))  # near duplicate
    dup_rows = pa.table(
        {
            "doc_id": ids,
            "text": pa.array(near, pa.string()),
            "lang": base["lang"],
            "source": base["source"],
            "n_chars": pa.array([len(s) for s in near], pa.int64()),
        }
    )
    merged = pa.concat_tables(
        [t.select(dup_rows.column_names), dup_rows]
    ).combine_chunks()
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(merged, out_path)
    return out_dir


def pairs_key(df) -> list[tuple]:
    return sorted(zip(df["doc_a"], df["doc_b"], df["jaccard"]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)

    from medical_and_charity_document_extraction_system_ray.pipelines.dedup import (
        q_minhash_lsh_pairs,
        q_setsim_prefix_join,
    )

    fixture = build_fixture(sf_dir)
    n_rows = pq.read_metadata(os.path.join(fixture, "documents.parquet")).num_rows

    results: dict[str, float] = {}

    def run(name: str, fn):
        t0 = time.perf_counter()
        df = fn().to_pandas()
        results[name] = round(time.perf_counter() - t0, 3)
        return df

    mh_bcast = run("minhash_broadcast", lambda: q_minhash_lsh_pairs(fixture))
    mh_join = run(
        "minhash_join_fallback",
        lambda: q_minhash_lsh_pairs(fixture, broadcast_pairs_bytes=0),
    )
    assert pairs_key(mh_bcast) == pairs_key(mh_join), "minhash regime mismatch"

    ss_bcast = run("setsim_broadcast_sets", lambda: q_setsim_prefix_join(fixture))
    ss_join = run(
        "setsim_join_fallback",
        lambda: q_setsim_prefix_join(
            fixture, broadcast_sets_bytes=0, broadcast_pairs_bytes=0
        ),
    )
    assert pairs_key(ss_bcast) == pairs_key(ss_join), "setsim regime mismatch"

    print(
        json.dumps(
            {
                "fixture_rows": int(n_rows),
                "dup_fraction": DUP_FRACTION,
                "minhash_pairs": int(len(mh_bcast)),
                "setsim_pairs": int(len(ss_bcast)),
                "parity": "both regimes identical",
                "sec": results,
                "num_cpus": cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
