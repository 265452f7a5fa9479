"""Count-Min frequency sketch, reproduced EXACTLY in SQL.

Companion to the HyperLogLog sketch (``stages/hll.py``): approximate
per-key frequencies from a fixed ``depth × width`` counter grid.  The
shuffle carries at most ``depth·width`` counter cells per block — constant
no matter the corpus size — instead of the full key set; the estimate for
a key is the MIN over its ``depth`` counters, an upper bound on the true
count that standard CM analysis bounds to within ``ε·N`` with probability
``1 - (1/2)^depth`` for ``width = e/ε``.

Determinism (the repo-wide oracle rule): hashes are the proven
``md5_number_lower`` recipe over ``"j:key"`` strings — identical uint64 on
numpy (``functions/md5vec.py``) and DuckDB — and every output is integer,
so the twin is bit-exact.  The default width is deliberately SMALL (64)
so the sf0.01 events table actually collides and the sweep exercises the
over-estimate path, not just the no-collision identity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum

__all__ = ["events_user_countmin", "cm_buckets", "EVENTS_USER_COUNTMIN_SQL"]

_DEPTH = 4
_WIDTH = 64


def cm_buckets(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(len(keys), depth) bucket matrix: md5_number_lower("j:key") % width."""
    out = np.empty((len(keys), depth), dtype=np.int64)
    for j in range(depth):
        h = md5_number_lower_batch([f"{j}:{k}" for k in keys])
        out[:, j] = (h % np.uint64(width)).astype(np.int64)
    return out


def events_user_countmin(
    sf_dir: str,
    depth: int = _DEPTH,
    width: int = _WIDTH,
    driver_cap: int | None = 500_000,
) -> "ray.data.Dataset":
    """Per-user event counts: exact ``true_cnt`` alongside the Count-Min
    estimate ``cm_est`` (≥ true_cnt; equality when no counter collides).

    Plan: one pass builds per-block partial counter cells (≤ depth·width
    rows each, pre-reduced over the block's distinct users); the merged
    grid is at most depth·width cells REGARDLESS of data size, so it is
    collected and broadcast into the per-user estimate map — the only
    all-to-all is the (bounded, bucketed) true-count aggregation."""
    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id"])

    def cell_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        uniq, counts = np.unique(uid, return_counts=True)
        b = cm_buckets(uniq, depth, width)  # hash distinct keys only
        cells = (np.arange(depth, dtype=np.int64) * width)[None, :] + b
        return pa.table(
            {
                "cell": pa.array(cells.ravel()),
                "n": pa.array(np.repeat(counts.astype(np.int64), depth)),
            }
        )

    grid = bucketed_group_sum(
        ds.map_batches(cell_partial, batch_format="pyarrow"),
        keys=["cell"],
        sum_cols={"n": "n"},
        count_col=None,
        driver_cap=driver_cap,
    ).take_all()  # ≤ depth·width rows by construction — driver-safe
    counters = np.zeros(depth * width, dtype=np.int64)
    for row in grid:
        counters[int(row["cell"])] = int(row["n"])

    users = bucketed_group_sum(
        ds, keys=["user_id"], count_col="true_cnt", driver_cap=driver_cap
    )

    def estimate(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        b = cm_buckets(uid, depth, width)
        cells = (np.arange(depth, dtype=np.int64) * width)[None, :] + b
        est = counters[cells].min(axis=1)
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64)),
                "true_cnt": batch["true_cnt"].cast(pa.int64()),
                "cm_est": pa.array(est),
            }
        )

    return users.map_batches(estimate, batch_format="pyarrow")


EVENTS_USER_COUNTMIN_SQL = f"""
WITH js AS (SELECT unnest(range({_DEPTH})) AS j),
hs AS (
  SELECT js.j, e.user_id,
         md5_number_lower(concat(js.j, ':', e.user_id)) % {_WIDTH} AS bucket
  FROM events e CROSS JOIN js
),
cells AS (SELECT j, bucket, count(*) AS n FROM hs GROUP BY j, bucket),
users AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id),
uh AS (
  SELECT u.user_id, u.true_cnt, js.j,
         md5_number_lower(concat(js.j, ':', u.user_id)) % {_WIDTH} AS bucket
  FROM users u CROSS JOIN js
)
SELECT uh.user_id,
       CAST(uh.true_cnt AS BIGINT) AS true_cnt,
       CAST(min(c.n) AS BIGINT) AS cm_est
FROM uh JOIN cells c ON c.j = uh.j AND c.bucket = uh.bucket
GROUP BY uh.user_id, uh.true_cnt
"""
