"""Cluster-derived shuffle/join fan-out (functions/cluster.py).

The window/dedup bucket width and the fact-join partition width both
follow the live cluster's CPU count with tuned single-node floors —
these tests pin the clamp algebra and the floor behaviour on the
4-CPU test session.
"""

import ray

from medical_and_charity_document_extraction_system_ray.functions import cluster


def test_cluster_cpus_reports_live_session():
    assert ray.is_initialized()
    assert cluster.cluster_cpus() == int(ray.cluster_resources()["CPU"])


def test_floors_hold_on_small_sessions():
    # 4-CPU test session: the bucket width sits on its tuned floor and
    # the join width scales DOWN (a width above the session's CPUs
    # deadlocks concurrent hash-shuffle joins — see the docstring).
    assert cluster.derive_buckets() == 64
    assert cluster.join_partitions() == 2
    assert cluster.join_partitions() <= cluster.cluster_cpus()
    # media actor pools keep the tuned floor of 2 (a wider pool starves
    # the downstream groupby on a 4-CPU session — observed hang)
    assert cluster.media_pool_size() == 2


def test_clamp_algebra(monkeypatch):
    monkeypatch.setattr(cluster, "cluster_cpus", lambda default=8: 1024)
    assert cluster.derive_buckets() == 4096          # 4 x CPUs
    assert cluster.join_partitions() == 512          # CPUs / 2
    assert cluster.media_pool_size() == 256          # CPUs / 4
    monkeypatch.setattr(cluster, "cluster_cpus", lambda default=8: 10**9)
    assert cluster.derive_buckets() == 65536         # cap guards bad reports
    assert cluster.join_partitions() == 4096
    assert cluster.media_pool_size() == 512
    monkeypatch.setattr(cluster, "cluster_cpus", lambda default=8: 1)
    assert cluster.derive_buckets() == 64            # floor
    assert cluster.join_partitions() == 2
    assert cluster.media_pool_size() == 2


def test_default_when_uninitialized(monkeypatch):
    # Plan-building before ray.init (unit-test imports) must not raise.
    monkeypatch.setattr(cluster.ray, "is_initialized", lambda: False)
    assert cluster.cluster_cpus() == cluster._DEFAULT_CPUS
