"""Cluster-size-aware defaults."""

from __future__ import annotations

import pyarrow as pa
import ray


def pa_from_pandas(df, **kwargs) -> "pa.Table":
    """``pa.Table.from_pandas`` minus the ``b'pandas'`` schema metadata.

    ``from_pandas`` stamps every table with a pandas-metadata blob, and a
    pyarrow schema carrying metadata is UNHASHABLE — Ray Data's
    ``unify_schemas`` then misses its cheap ``set(schemas)`` dedup early
    exit on every block merge and logs "Failed to hash the schemas" per
    reduce task.  All keyword arguments pass through unchanged
    (``preserve_index`` semantics included); only the metadata differs.
    """
    return pa.Table.from_pandas(df, **kwargs).replace_schema_metadata(None)


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
