"""Cluster-size-aware defaults."""

from __future__ import annotations

import ray


def default_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Actor-pool autoscaling bounds sized to the cluster: (1, ~CPUs).

    On a laptop this is (1, cores); on a 256-node cluster it scales the
    pool to the cluster's CPU count (optionally capped).  Falls back to
    (1, 8) when Ray is not initialised yet (pipeline built before init).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n = max(2, cpus)
    if cap:
        n = min(n, cap)
    return (1, n)
