"""Event-sequence mining over the events stream.

First-class sequence operators the training-data/analytics engine needs
beyond windows and funnels (``relational.py``): per-user ordered event
chains, reduced to transition statistics.  The Ray shape for all of them
is the one the funnel/session queries established: hash-bucket users
(bounded group count — NEVER one Ray group per user), order inside the
bucket with a vectorized sort, and shuffle only pre-aggregated partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas


def event_transitions(
    sf_dir: str,
    n_buckets: int = 32,
    driver_cap: int | None = 200_000,
) -> "ray.data.Dataset":
    """First-order Markov transition counts between consecutive events of
    the same user → ``(from_type, to_type, n)``.

    Order within a user is ``(ts, event_id)`` — the repo's deterministic
    tie-break for equal timestamps.  Each user bucket emits at most
    ``|event types|²`` partial rows, so the final merge is tiny no matter
    the stream size."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array((batch["user_id"].to_numpy() % n_buckets).astype(np.int64)),
        )

    def transitions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].to_numpy()[:-1] == g["user_id"].to_numpy()[1:]
        et = g["event_type"].to_numpy()
        pairs = pd.DataFrame(
            {"from_type": et[:-1][same_user], "to_type": et[1:][same_user]}
        )
        out = (
            pairs.groupby(["from_type", "to_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
    )
    return bucketed_group_sum(
        partials,
        keys=["from_type", "to_type"],
        sum_cols={"n": "n"},
        count_col=None,
        driver_cap=driver_cap,
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY from_type, to_type
"""


def event_type_trigrams(
    sf_dir: str,
    n_buckets: int = 32,
    driver_cap: int | None = 200_000,
) -> "ray.data.Dataset":
    """Length-3 sequential patterns: counts of consecutive event-type
    triples per user → ``(t1, t2, t3, n)`` — the next order up from
    :func:`event_transitions`, same disjoint-user-bucket plan (each
    bucket emits at most ``|types|³`` partial rows)."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array((batch["user_id"].to_numpy() % n_buckets).astype(np.int64)),
        )

    def trigrams(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tri = pd.DataFrame(
            {"t1": et[:-2][same], "t2": et[1:-1][same], "t3": et[2:][same]}
        )
        out = (
            tri.groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(trigrams, batch_format="pandas")
    )
    return bucketed_group_sum(
        partials,
        keys=["t1", "t2", "t3"],
        sum_cols={"n": "n"},
        count_col=None,
        driver_cap=driver_cap,
    )


EVENT_TYPE_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3,
         lead(user_id, 2) OVER w AS u3,
         user_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
"""


def user_gap_stats(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Inter-event gap statistics per user → ``(user_id, n_gaps,
    sum_gap_us, min_gap_us, max_gap_us)`` over consecutive events in
    ``(ts, event_id)`` order — all integer microseconds (no division;
    the mean is a downstream ``sum/n``).

    Disjoint user-hash buckets make every user's diff sequence local to
    one group, so min/max/sum need no cross-bucket merge; users with a
    single event have no gap and are absent (mirrored by the twin's
    WHERE)."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": ts,
                "event_id": batch["event_id"],
                "bucket": pa.array(
                    (batch["user_id"].to_numpy() % n_buckets).astype(np.int64)
                ),
            }
        )

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        same = u[:-1] == u[1:]
        d = pd.DataFrame({"user_id": u[1:][same], "gap": t[1:][same] - t[:-1][same]})
        if d.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "sum_gap_us": pd.Series([], dtype=np.int64),
                    "min_gap_us": pd.Series([], dtype=np.int64),
                    "max_gap_us": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            d.groupby("user_id", sort=False)["gap"]
            .agg(n_gaps="size", sum_gap_us="sum", min_gap_us="min", max_gap_us="max")
            .reset_index()
        )
        for c in ("n_gaps", "sum_gap_us", "min_gap_us", "max_gap_us"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
    )


USER_GAP_STATS_SQL = """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM d WHERE gap IS NOT NULL
GROUP BY user_id
"""


def event_debounce(
    sf_dir: str, gap_minutes: int = 5, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Windowed deduplication (debounce) report → ``(user_id, n_events,
    n_kept)``: per user, how many events survive dropping repeats of the
    same event TYPE within ``gap_minutes`` of the previously KEPT
    occurrence... simplified to the standard lag rule — an event is kept
    iff it is the first of its (user, type) or arrives more than the gap
    after the PREVIOUS event of that (user, type) (lag-based, matching
    the window twin exactly; ties on ts break by event_id on both
    engines).

    One user-hash exchange co-locates each user's events; the lag diff is
    a vectorized sort+diff per (user, type) run inside the bucket."""
    gap_us = gap_minutes * 60_000_000
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def side(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_id": np.asarray(batch["event_id"]).astype(np.int64),
                "user_id": np.asarray(batch["user_id"]).astype(np.int64),
                "event_type": np.asarray(batch["event_type"]),
                "t": np.asarray(batch["ts"])
                .astype("datetime64[us]")
                .astype(np.int64),
            }
        )
        df["bucket"] = df["user_id"] % n_buckets
        return pa_from_pandas(df, preserve_index=False)

    def debounce(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["user_id", "event_type", "t", "event_id"], kind="mergesort"
        )
        same = (
            (g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1])
            & (g["event_type"].to_numpy()[1:] == g["event_type"].to_numpy()[:-1])
        )
        dt = g["t"].to_numpy()[1:] - g["t"].to_numpy()[:-1]
        kept = np.ones(len(g), dtype=bool)
        kept[1:] = ~same | (dt > gap_us)
        out = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "kept": kept.astype(np.int64)}
        )
        agg = (
            out.groupby("user_id", sort=False)
            .agg(n_events=("kept", "size"), n_kept=("kept", "sum"))
            .reset_index()
        )
        return pa_from_pandas(agg, preserve_index=False)

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    parts = (
        ds.map_batches(side, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(debounce, batch_format="pandas")
    )
    return bucketed_group_sum(
        parts,
        ["user_id"],
        sum_cols={"n_events": "n_events", "n_kept": "n_kept"},
        count_col=None,
        driver_cap=2_000_000,
    )


EVENT_DEBOUNCE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events
),
lagged AS (
  SELECT user_id,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > {5 * 60_000_000}
              THEN 1 ELSE 0 END AS kept
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t, event_id)
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(kept)::BIGINT AS n_kept
FROM lagged GROUP BY user_id
"""





def rate_limit_violators(
    sf_dir: str, threshold: int = 5
) -> "ray.data.Dataset":
    """Abuse/rate-limit detection → ``(user_id, day, n)``: (user, day)
    cells whose event count reaches ``threshold`` — the per-principal
    windowed-count check every ingestion edge runs.

    Pure partial-then-bounded-merge: per-batch (user, day) count partials
    ride one int-key exchange (`bucketed_group_sum`), then a vectorized
    filter.  No distinct, no sort."""
    from ner_funtool_ray.pipelines.mining import _DAY_US as _DAY, _ts_us

    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "user_id": np.asarray(batch["user_id"]).astype(np.int64),
                    "day": _ts_us(batch["ts"]) // _DAY,
                }
            ),
            preserve_index=False,
        )

    counts = bucketed_group_sum(
        ds.map_batches(cells, batch_format="pyarrow"),
        keys=["user_id", "day"],
        count_col="n",
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch["n"], pa.scalar(threshold))
        )

    return counts.map_batches(keep, batch_format="pyarrow")


RATE_LIMIT_VIOLATORS_SQL = """
SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2 HAVING count(*) >= 5
"""


def gap_median_by_type(
    sf_dir: str, coarse_shift: int = 24, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Latency-style analytics → ``(event_type, median_gap_us)``: the
    EXACT median inter-event gap (microseconds) per event type, over the
    per-(user, type) consecutive-event differences — p50 "time between
    actions", the streaming-telemetry summary.

    Phase 1 computes the gaps where they live: one user-hash exchange
    co-locates each user's events, a vectorized sort+diff per (user,
    type) run emits (type, gap) rows — one row per event minus one per
    run, never a cross product.  Phase 2 is the two-pass histogram
    refinement (`stats._grouped_median_value`) over those rows — gaps
    span microseconds to weeks, hence the wider ``coarse_shift``."""
    from ner_funtool_ray.pipelines.mining import _ts_us
    from ner_funtool_ray.pipelines.stats import _grouped_median_value

    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def side(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": np.asarray(batch["user_id"]).astype(np.int64),
                "event_type": np.asarray(batch["event_type"]),
                "t": _ts_us(batch["ts"]),
            }
        )
        df["bucket"] = df["user_id"] % n_buckets
        return pa_from_pandas(df, preserve_index=False)

    def gaps(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["user_id", "event_type", "t"], kind="mergesort"
        )
        same = (
            (g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1])
            & (
                g["event_type"].to_numpy()[1:]
                == g["event_type"].to_numpy()[:-1]
            )
        )
        dt = g["t"].to_numpy()[1:] - g["t"].to_numpy()[:-1]
        return pa.table(
            {
                "event_type": pa.array(
                    g["event_type"].to_numpy()[1:][same], type=pa.string()
                ),
                "gap": pa.array(dt[same], type=pa.int64()),
            }
        )

    gap_ds = (
        ds.map_batches(side, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
        .materialize()
    )
    med = _grouped_median_value(
        gap_ds,
        lambda b: np.asarray(b["gap"]).astype(np.int64),
        "event_type",
        coarse_shift,
    )
    keys = sorted(med)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(keys, type=pa.string()),
                "median_gap_us": pa.array(
                    np.array([med[k] for k in keys], dtype=np.int64)
                ),
            }
        )
    )


GAP_MEDIAN_BY_TYPE_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
g AS (
  SELECT event_type, t - lag(t) OVER w AS gap
  FROM e WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)
  QUALIFY gap IS NOT NULL
),
ranked AS (
  SELECT event_type, gap,
         row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM g
)
SELECT event_type, gap AS median_gap_us
FROM ranked WHERE rn = (n + 1) // 2
"""
