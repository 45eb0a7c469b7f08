"""Cluster-size-derived fan-out for coarse-bucket shuffles.

The window/dedup family shuffles on ``hash(key) % nbuckets`` (see
``functions/segments.py``): the bucket count bounds how many reduce
groups exist, i.e. the maximum reduce-side parallelism of the whole
family.  A fixed 64 is right on a 32-CPU box but caps a 100x-scale
cluster at 64 concurrent groups — so the fan-out is derived from the
live cluster's CPU count (pattern proven by
``pipelines/extraction.py:_default_repartition_blocks``).

Resolve the value ON THE DRIVER at query-build time and capture it in
batch closures: every batch of one query must agree on ``nbuckets``
(rows of one key must co-locate), and driver-side resolution keeps the
value stable even if the cluster resizes mid-run.
"""

from __future__ import annotations

import ray

_DEFAULT_CPUS = 8


def cluster_cpus(default: int = _DEFAULT_CPUS) -> int:
    """Total CPU count of the connected Ray cluster (``default`` when
    no session is up yet, e.g. plan-building in unit tests)."""
    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def derive_buckets(
    per_cpu: int = 4, min_buckets: int = 64, cap: int = 65536
) -> int:
    """Coarse-bucket fan-out: ``clamp(per_cpu x cluster CPUs,
    [min_buckets, cap])``.

    ``per_cpu=4`` keeps ~4 reduce groups in flight per core (straggler
    damping without per-group python overhead); ``min_buckets=64``
    preserves the tuned single-node behaviour; the cap only guards
    against pathological resource reports — at 64k buckets a 16 B
    bucket row stream is still >> per-group overhead."""
    return min(cap, max(min_buckets, per_cpu * cluster_cpus()))


def join_partitions(min_partitions: int = 2, cap: int = 4096) -> int:
    """Partition width for hash joins whose BOTH sides are fact-sized
    (lineitem x part, event streams, key streams): ``clamp(CPUs / 2,
    [min_partitions, cap])``.  A fixed 4-8 was tuned for this 32-CPU
    box; on a wider cluster it would cap join parallelism, so the
    width follows the cluster.  Resolve ON THE DRIVER at query-build
    time (same rule as ``derive_buckets``).  Joins against a bounded
    dimension (nation, month, calendar buckets) keep small fixed
    widths — more partitions there only buy overhead.

    The floor must scale DOWN with the session, not up: hash-shuffle
    joins hold one aggregator actor per partition ALIVE for the whole
    exchange, so a query with several concurrent joins (fk_audit's
    four star edges) whose widths exceed the session's CPUs
    deadlocks waiting on actors that can never all schedule — measured
    as a hang on the 4-CPU pytest session when the floor was 8."""
    return min(cap, max(min_partitions, cluster_cpus() // 2))


def media_pool_size(min_actors: int = 2, cap: int = 512) -> int:
    """Actor-pool width for media decode / feature / scoring stages
    (pHash, layout, audio fingerprint, lang-id): ``clamp(CPUs // 4,
    [min_actors, cap])``.

    A fixed pool of 2 was right on this box but caps the stage at 2
    actors on a 100x-scale cluster — the same flaw as the fixed bucket
    widths.  ``CPUs // 4`` leaves most of the session to the producer
    scan and the downstream shuffle: a pool holding EVERY core of a
    small session starves the downstream groupby (observed hang on the
    4-CPU pytest session), so the floor stays at the tuned 2 there.
    Resolve ON THE DRIVER at query-build time (same rule as
    ``derive_buckets``)."""
    return min(cap, max(min_actors, cluster_cpus() // 4))
