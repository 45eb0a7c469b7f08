"""Segment (run) kernels for keyed window operators.

The per-key window family (sessionize, running sums, ranks, rolling
frames, LAG gaps, NTILE, asof, grouped top-k) shares one scale flaw
when expressed as ``groupby(key).map_groups(fn)``: Ray invokes the UDF
once per GROUP, so a 10^8-user table costs 10^8 python calls + batch
conversions even when each call is vectorized inside.  The fix is the
coarse-bucket pattern proven by ``q_sliding_distinct_users``
(events.py): ``bucket = hash(key) % _KEY_BUCKETS`` is the shuffle key
(bounded group count, all rows of a key co-located), each bucket group
is lexsorted ONCE by (key, order...), and every window kernel runs
flat over the sorted columns with run-boundary masks — numpy only, no
per-key python, no pandas per-group conversion.

Helpers here compute run boundaries, per-run row positions, and
run-restricted searchsorted (RANGE frames / asof picks) over such
sorted flat columns.  Reference semantics source: the SQL window
equivalents documented next to each operator (the reference itself has
no windows, SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# coarse shuffle-key fan-out: bounded group count (so map_groups makes
# O(nbuckets) python calls, not O(#keys)) while still spreading a
# bucket's work across the cluster.  Derived from live cluster CPUs
# (floor 64 = the tuned single-node value); the kernels are invariant
# to it.  None = resolve via functions.cluster.derive_buckets() on the
# driver at plan-build time, so all batches of one query agree.
from .cluster import derive_buckets

_MULT = np.int64(-1640531527)  # 2654435761 as a signed 64-bit literal


def add_bucket(t: pa.Table, key: str, nbuckets: int) -> pa.Table:
    """Append ``bucket = hash(key) % nbuckets`` (multiplicative hash so
    sequential id spaces spread evenly; mod-2^64 wraparound intended)."""
    k = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        b = (k * _MULT) & np.int64(2**63 - 1)
    return t.append_column("bucket", pa.array(b % np.int64(nbuckets)))


def add_bucket_str(t: pa.Table, key: str, nbuckets: int) -> pa.Table:
    """``add_bucket`` for STRING keys (stable_hash64 over UTF-8 bytes)."""
    from .text import stable_hash64

    h = stable_hash64(t[key])
    return t.append_column(
        "bucket", pa.array((h % np.uint64(nbuckets)).astype(np.int64))
    )


def bucket_grouped_str(ds, key: str, nbuckets: int | None = None):
    """``bucket_grouped`` for STRING keys."""
    nb = int(nbuckets) if nbuckets else derive_buckets()
    return ds.map_batches(
        lambda t: add_bucket_str(t, key, nb),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby("bucket")


def bucket_grouped(ds, key: str, nbuckets: int | None = None):
    """``ds`` → grouped-by-coarse-bucket dataset (the one keyed shuffle)."""
    nb = int(nbuckets) if nbuckets else derive_buckets()
    return ds.map_batches(
        lambda t: add_bucket(t, key, nb),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby("bucket")


def runs(*key_cols: np.ndarray):
    """Run boundaries of a (composite-)key column that is already
    sorted: returns ``(starts, lengths, run_of_row)`` — all int64.

    ``starts[r]`` = first row of run r, ``lengths[r]`` its row count,
    ``run_of_row[i]`` = run index of row i."""
    n = key_cols[0].size
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for col in key_cols:
        new[1:] |= col[1:] != col[:-1]
    starts = np.flatnonzero(new)
    lengths = np.diff(np.concatenate([starts, [n]]))
    run_of = np.cumsum(new) - 1
    return starts, lengths.astype(np.int64), run_of.astype(np.int64)


def run_positions(starts: np.ndarray, run_of: np.ndarray) -> np.ndarray:
    """0-based position of each row within its run."""
    return np.arange(run_of.size, dtype=np.int64) - starts[run_of]


def run_searchsorted(
    values: np.ndarray,
    queries: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    run_of_q: np.ndarray,
    side: str = "left",
) -> np.ndarray:
    """``searchsorted`` restricted to runs: ``values`` is flat int64,
    ascending WITHIN each run; ``queries[i]`` is answered within run
    ``run_of_q[i]``.  Returns global insertion indices.

    One global ``np.searchsorted`` over a per-run-normalized composite
    key (rel + run_id * span) — queries outside a run's value range are
    clipped to sentinels that resolve to the run's start/end under
    either ``side``.  Slabbed when run_count * span would overflow
    int64 (astronomical keys per bucket)."""
    nq = queries.size
    if nq == 0:
        return np.empty(0, np.int64)
    n = values.size
    if n == 0:
        return np.zeros(nq, np.int64)
    nruns = starts.size
    base = values[starts]
    rel_v = values - np.repeat(base, lengths)
    rel_q = queries - base[run_of_q]
    span = int(rel_v.max()) + 3
    # below-run → -1 (< all rel_v ≥ 0: resolves to run start both
    # sides); above-run → span-2 (> rel_v ≤ span-3: run end both sides)
    rel_q = np.clip(rel_q, -1, span - 2)
    run_of_v = np.repeat(np.arange(nruns, dtype=np.int64), lengths)
    max_runs = max(1, (2**62) // span)
    if nruns <= max_runs:
        return np.searchsorted(rel_v + run_of_v * span, rel_q + run_of_q * span,
                               side=side)
    out = np.empty(nq, np.int64)
    for r0 in range(0, nruns, max_runs):
        r1 = min(r0 + max_runs, nruns)
        v_lo = int(starts[r0])
        v_hi = int(starts[r1]) if r1 < nruns else n
        qm = (run_of_q >= r0) & (run_of_q < r1)
        out[qm] = v_lo + np.searchsorted(
            rel_v[v_lo:v_hi] + (run_of_v[v_lo:v_hi] - r0) * span,
            rel_q[qm] + (run_of_q[qm] - r0) * span,
            side=side,
        )
    return out
