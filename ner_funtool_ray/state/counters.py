"""Per-stage run counters (north rule: per-partition lineage + COUNTERS).

A named zero-CPU Ray actor accumulates ``(stage, key) → count`` increments
fired from inside ``map_batches`` tasks.  The increments are
fire-and-forget (one async actor call per batch — no hot-path blocking),
so :func:`snapshot_stable` polls until two consecutive snapshots agree
before reporting; the counters are an OBSERVABILITY surface (rows seen
per stage, resumed-run skip evidence), never a correctness input — the
output manifest's per-partition fingerprints remain the integrity record.

Usage::

    ds = count_rows(ds, "sentences", run="job42")   # pass-through stage
    ...consume ds...
    snapshot_stable(run="job42")
    # {"sentences": {"rows": 12345, "batches": 7}}
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray

_DEFAULT_RUN = "ner_funtool_counters"

# per-worker-process handle cache: ray.get_actor is a GCS RPC, one per
# (process, run) is enough
_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}


@ray.remote(num_cpus=0)
class CounterActor:
    """Named accumulator; zero-CPU so it never occupies a worker slot."""

    def __init__(self) -> None:
        self._counts: dict[str, dict[str, int]] = {}

    def inc(self, stage: str, key: str, n: int) -> None:
        self._counts.setdefault(stage, {}).setdefault(key, 0)
        self._counts[stage][key] += int(n)

    def snapshot(self) -> dict[str, dict[str, int]]:
        return {s: dict(kv) for s, kv in self._counts.items()}

    def reset(self) -> None:
        self._counts = {}


def get_counters(run: str = _DEFAULT_RUN) -> "ray.actor.ActorHandle":
    """Get-or-create the named counter actor for ``run``."""
    h = _HANDLES.get(run)
    if h is None:
        h = CounterActor.options(name=run, get_if_exists=True).remote()
        _HANDLES[run] = h
    return h


def count_rows(
    ds: "ray.data.Dataset", stage: str, run: str = _DEFAULT_RUN
) -> "ray.data.Dataset":
    """Pass-through stage recording rows/batches flowing past ``stage``.

    The batch is returned untouched (zero-copy), so inserting this
    between any two stages never changes results — only the counter
    actor learns the flow."""

    def tick(batch: pa.Table) -> pa.Table:
        get_counters(run).inc.remote(stage, "rows", batch.num_rows)
        get_counters(run).inc.remote(stage, "batches", 1)
        return batch

    return ds.map_batches(tick, batch_format="pyarrow")


def snapshot_stable(
    run: str = _DEFAULT_RUN, timeout_s: float = 10.0
) -> dict[str, dict[str, int]]:
    """Snapshot after the fire-and-forget queue drains: poll until two
    consecutive snapshots agree (in-flight ``inc`` calls land within
    ms once the dataset is consumed; the loop bounds the wait)."""
    h = get_counters(run)
    prev = ray.get(h.snapshot.remote())
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(0.05)
        cur = ray.get(h.snapshot.remote())
        if cur == prev:
            return cur
        prev = cur
    return prev


def reset_counters(run: str = _DEFAULT_RUN) -> None:
    ray.get(get_counters(run).reset.remote())
