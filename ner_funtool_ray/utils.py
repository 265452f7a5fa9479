"""Cluster-size-aware defaults."""

from __future__ import annotations

import logging

import pyarrow as pa
import ray


class _EmptySchemaWarningFilter(logging.Filter):
    """Drops ONLY the empty-schema variant of Ray Data's "RefBundle with a
    different schema" warning.

    Ray's sort-based shuffle (the engine under every ``groupby`` /
    ``sort``) emits zero-column blocks for empty range partitions — which
    happen whenever a bucketed exchange has more output partitions than
    distinct keys (n_buckets=64 vs hundreds of blocks at scale).  Those
    blocks are produced INSIDE Ray's sort operator, carry no rows, and are
    skipped by downstream map transforms; user code cannot type them.
    Every UDF in this package already returns typed (possibly empty) Arrow
    tables, so the only remaining source is this Ray-internal artifact.
    The filter matches the exact empty-schema suffix and passes every
    other schema-mismatch warning through untouched (a REAL schema
    divergence between typed bundles still warns)."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: ." in msg
        )


def install_benign_schema_warning_filter() -> None:
    """Install :class:`_EmptySchemaWarningFilter` on the streaming-executor
    logger (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(
        isinstance(f, _EmptySchemaWarningFilter) for f in logger.filters
    ):
        logger.addFilter(_EmptySchemaWarningFilter())


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
