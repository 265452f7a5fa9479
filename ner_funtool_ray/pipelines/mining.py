"""Data-mining operators over the warehouse tables: market-basket pair
mining, cohort retention, a GLOBAL cumulative sum (the distributed scan
primitive), and a skyline (pareto-front) query.

These fill the remaining "wide analytics" shapes the engine lacked:

- ``basket_part_pairs`` — frequent co-purchased part pairs.  Baskets are
  bounded (a TPC-H order holds ≤7 lines), so the per-order pair expansion
  is a bounded k² blow-up done vectorized inside each orderkey bucket; the
  pair counts ride a bounded-bucket group sum.  Nothing ever touches the
  driver.
- ``cohort_retention`` — the classic weekly cohort × week-offset
  distinct-user retention matrix.  Users hash-bucket once; because each
  user lives in exactly one bucket, per-bucket cell counts are disjoint
  and summing them IS the exact distinct-user count (no count-distinct
  shuffle).
- ``running_revenue`` — cumulative revenue over the GLOBAL order of
  ``(o_orderdate, o_orderkey)``.  Every other window in this repo is
  per-user/per-customer (hash-partitionable); a global running sum needs
  the distributed-scan shape instead: range-partition by day (bounds from
  parquet row-group statistics — no data scan), local sorted cumsum per
  partition, plus one tiny per-partition-totals exchange (≤ n_partitions
  rows) whose exclusive prefix sums become each partition's offset.
- ``orders_pareto`` — skyline over (price, date): orders no other order
  dominates on both axes.  Local pareto per block, then pareto-of-union:
  the front of a union is contained in the union of fronts, so survivors
  shrink geometrically and the final merge sees a front-sized input.

All money is integer cents (``_cents`` half-away-from-zero, matching
DuckDB ``round``), all calendar math integer microseconds/days/weeks, so
every DuckDB twin is hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.pipelines.relational import _cents
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US
_I64_MAX = np.iinfo(np.int64).max


def _ts_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()


def _pairs_within_groups(
    group_codes: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All strict pairs (a < b) within each run of equal ``group_codes``.
    Requires rows sorted by (group, value) with (group, value) distinct.
    Same factorized expansion as the KG triple assembly
    (stages/materialize.py:_assemble_triples_local), extracted for reuse;
    cost is Σk² over group sizes k — callers must bound k."""
    starts, ks = np.unique(group_codes, return_index=True, return_counts=True)[1:]
    k_per_el = np.repeat(ks, ks)
    left = np.repeat(np.arange(len(group_codes), dtype=np.int64), k_per_el)
    el_block_start = np.concatenate([[0], np.cumsum(k_per_el[:-1])]).astype(
        np.int64
    )
    within = np.arange(len(left), dtype=np.int64) - np.repeat(
        el_block_start, k_per_el
    )
    right = np.repeat(np.repeat(starts, ks), k_per_el) + within
    mask = right > left  # value-sorted blocks ⇒ values[right] > values[left]
    return values[left[mask]], values[right[mask]]


def basket_part_pairs(
    sf_dir: str,
    min_support: int = 1,
    n_buckets: int = 64,
    max_sq_sum: int = 200_000_000,
    driver_cap: int | None = 2_000_000,
) -> "ray.data.Dataset":
    """Part pairs co-purchased in the same order, with the number of
    distinct orders containing both (support), kept at ``min_support``+.

    Shape: per-batch distinct (order, part) slims the stream, orderkey
    buckets co-locate each basket, the vectorized k² expansion runs per
    bucket (guarded by ``max_sq_sum`` — baskets are ≤7 parts by
    construction, so Σk² ≈ 50·orders/bucket), and pair counts merge in a
    bounded-bucket group sum.  Support is exact because a basket emits
    each pair at most once.

    ``driver_cap`` size guard (the ``all_triples`` convention — each Ray
    all-to-all costs a ~3 s fixed Sort barrier at 32 CPUs, and this plan
    has two): when the slimmed distinct (order, part) stream fits the cap
    the expansion runs once on the driver in pure numpy, skipping both
    shuffles (measured 9.2 s → ~2 s at sf0.1); above it the distributed
    plan runs unchanged (parity-tested)."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        df["bucket"] = (df["l_orderkey"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def _expand_sorted(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        codes = df["l_orderkey"].to_numpy(dtype=np.int64)
        ks = np.unique(codes, return_counts=True)[1]
        sq = int((ks.astype(np.int64) ** 2).sum())
        if sq > max_sq_sum:
            raise ValueError(
                f"basket expansion Σk²={sq} exceeds guard {max_sq_sum}; "
                "re-bucket or cap basket size"
            )
        a, b = _pairs_within_groups(codes, df["l_partkey"].to_numpy(np.int64))
        return (
            pd.DataFrame({"part_a": a, "part_b": b})
            .groupby(["part_a", "part_b"], sort=False)
            .size()
            .reset_index(name="n")
        )

    if driver_cap is not None:
        slim = ds.map_batches(partial, batch_format="pyarrow").materialize()
        if slim.count() <= driver_cap:
            df = slim.drop_columns(["bucket"]).to_pandas().drop_duplicates()
            out = _expand_sorted(df).rename(columns={"n": "n_orders"})
            if min_support > 1:
                out = out[out["n_orders"] >= min_support]
            return ray.data.from_arrow(
                pa_from_pandas(
                    out.reset_index(drop=True), preserve_index=False
                )
            )
        slimmed = slim  # partials already computed — reuse for the wide plan
    else:
        slimmed = ds.map_batches(partial, batch_format="pyarrow")

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        return _expand_sorted(group.drop(columns=["bucket"]).drop_duplicates())

    counts = bucketed_group_sum(
        slimmed.groupby("bucket").map_groups(expand, batch_format="pandas"),
        keys=["part_a", "part_b"],
        sum_cols={"n_orders": "n"},
        count_col=None,
    )
    if min_support <= 1:
        return counts
    import pyarrow.compute as pc

    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_orders"], min_support)),
        batch_format="pyarrow",
    )


def make_basket_sql(min_support: int = 1) -> str:
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {min_support}
"""


BASKET_PART_PAIRS_SQL = make_basket_sql(1)


def cohort_retention(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Weekly cohort retention: users grouped by first-active week
    (cohort), counted in every later week they were active, as
    ``(cohort_week, week_offset, n_users)``.

    Distinct-user counting without a distinct shuffle: (user, week) pairs
    dedupe per batch, users hash-bucket, and each bucket's cell counts are
    over disjoint user sets — their sum is the exact global count."""
    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        week = _ts_us(batch["ts"]) // _WEEK_US
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(), "week": week}
        ).drop_duplicates()
        df["bucket"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def cells(group: pd.DataFrame) -> pd.DataFrame:
        df = group.drop(columns=["bucket"]).drop_duplicates()
        cohort = df.groupby("user_id", sort=False)["week"].transform("min")
        out = pd.DataFrame(
            {"cohort_week": cohort, "week_offset": df["week"] - cohort}
        )
        return (
            out.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n")
        )

    return bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cells, batch_format="pandas"),
        keys=["cohort_week", "week_offset"],
        sum_cols={"n_users": "n"},
        count_col=None,
        # cells are weeks², not corpus-sized (≈125k at a decade of weekly
        # cohorts) — the driver merge skips a whole Sort barrier; above
        # the cap it falls back to the bucketed shuffle automatically
        driver_cap=200_000,
    )


COHORT_RETENTION_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
),
c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""


def _orderdate_day_bounds(path: str) -> tuple[int, int]:
    """(min, max) o_orderdate as epoch days from parquet row-group
    statistics — metadata only, no data scan.  Falls back to a pruned
    single-column aggregate pass when stats are absent."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("o_orderdate")
    lo, hi = None, None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = None
            break
        mn = np.datetime64(st.min, "us").astype(np.int64)
        mx = np.datetime64(st.max, "us").astype(np.int64)
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    if lo is not None:
        return int(lo // _DAY_US), int(hi // _DAY_US)
    ds = read_parquet_auto(path, columns=["o_orderdate"])
    agg = ds.map_batches(
        lambda t: pa.table({"d": pa.array(_ts_us(t["o_orderdate"]) // _DAY_US)}),
        batch_format="pyarrow",
    )
    return int(agg.min("d")), int(agg.max("d"))


def running_revenue(sf_dir: str, n_partitions: int = 32) -> "ray.data.Dataset":
    """Global running revenue: for every order, the cumulative sum of
    order-price cents over ALL orders at-or-before it in
    ``(o_orderdate, o_orderkey)`` order — the distributed-scan primitive.

    Plan: day-range partitions (bounds from parquet stats, zero scan) make
    the partition id ORDER-CONSISTENT with the sort key, so the scan
    decomposes into (a) per-partition totals — a ≤``n_partitions``-row
    exchange whose exclusive prefix sums are the partition offsets — and
    (b) one sorted local cumsum per partition plus its offset.  The only
    driver-side data is the totals vector."""
    path = f"{sf_dir}/orders.parquet"
    lo_day, hi_day = _orderdate_day_bounds(path)
    width = max(1, -(-(hi_day - lo_day + 1) // n_partitions))

    ds = read_parquet_auto(
        path, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["o_orderdate"])
        return pa.table(
            {
                "part": pa.array((ts // _DAY_US - lo_day) // width),
                "ts_us": pa.array(ts),
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    totals = (
        bucketed_group_sum(
            keyed_ds.map_batches(
                lambda t: t.select(["part", "cents"]), batch_format="pyarrow"
            ),
            keys=["part"],
            sum_cols={"s": "cents"},
            count_col=None,
            n_buckets=8,
            # ≤ n_partitions rows per block partial — always driver-merged
            driver_cap=1_000_000,
        )
        .to_pandas()  # ≤ n_partitions rows — the scan's tiny reduce
        .sort_values("part")
    )
    offs = dict(
        zip(
            totals["part"].to_numpy(),
            np.concatenate([[0], np.cumsum(totals["s"].to_numpy())[:-1]]),
        )
    )

    def local_scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts_us", "o_orderkey"], kind="mergesort")
        run = np.cumsum(g["cents"].to_numpy(dtype=np.int64)) + int(
            offs[int(g["part"].iloc[0])]
        )
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(), "running_cents": run}
        )

    return keyed_ds.groupby("part").map_groups(local_scan, batch_format="pandas")


RUNNING_REVENUE_SQL = """
SELECT o_orderkey,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING)::BIGINT AS running_cents
FROM orders
"""


def daily_active_users(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Daily activity roll-up — ``(day, active_users, new_users,
    cum_users)``: distinct users active each day, users whose FIRST
    activity is that day, and the cumulative unique-user count (a
    count-distinct-over-window without any distinct shuffle).

    Users hash-bucket once; per-bucket user sets are disjoint, so both
    the active-per-day and first-day cell counts sum exactly.  The final
    cumulative pass runs on the driver because the day axis is
    calendar-bounded (≤ tens of thousands of rows at decades of data) —
    by construction, not a size guess."""
    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "d": _ts_us(batch["ts"]) // _DAY_US,
            }
        ).drop_duplicates()
        df["bucket"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def day_cells(group: pd.DataFrame) -> pd.DataFrame:
        ud = group.drop(columns=["bucket"]).drop_duplicates()
        act = (
            ud.groupby("d", sort=False)
            .size()
            .rename_axis("day")
            .reset_index(name="active")
        )
        first = ud.groupby("user_id", sort=False)["d"].min()
        new = (
            first.value_counts().rename_axis("day").reset_index(name="new")
        )
        return act.merge(new, on="day", how="left").fillna({"new": 0})

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(day_cells, batch_format="pandas")
        .to_pandas()  # calendar-sized by construction
        .groupby("day", sort=True)[["active", "new"]]
        .sum()
        .reset_index()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(days["day"].to_numpy(np.int64)),
                "active_users": pa.array(days["active"].to_numpy(np.int64)),
                "new_users": pa.array(days["new"].to_numpy(np.int64)),
                "cum_users": pa.array(
                    np.cumsum(days["new"].to_numpy(np.int64))
                ),
            }
        )
    )


DAILY_ACTIVE_USERS_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
),
f AS (SELECT user_id, min(d) AS fd FROM ud GROUP BY user_id),
act AS (SELECT d, count(*) AS active_users FROM ud GROUP BY d),
n AS (SELECT fd AS d, count(*) AS new_users FROM f GROUP BY fd)
SELECT CAST(act.d AS BIGINT) AS day,
       CAST(active_users AS BIGINT) AS active_users,
       CAST(COALESCE(new_users, 0) AS BIGINT) AS new_users,
       SUM(COALESCE(new_users, 0)) OVER (
         ORDER BY act.d ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM act LEFT JOIN n ON n.d = act.d
"""


def _skyline_mask(price: np.ndarray, day: np.ndarray) -> np.ndarray:
    """True for non-dominated points: no other point has price ≤ AND day ≤
    with one strict.  Vectorized: price-sort, then a point is dominated iff
    some strictly-cheaper point has day ≤ its own (prefix min over earlier
    price groups) or a same-price point has day strictly less (group's
    first day)."""
    order = np.lexsort((day, price))
    p, d = price[order], day[order]
    new_group = np.concatenate([[True], p[1:] != p[:-1]])
    group_id = np.cumsum(new_group) - 1
    group_first_d = d[new_group]  # min day within group (day-sorted)
    cummin = np.minimum.accumulate(group_first_d)
    prev_min = np.concatenate([[_I64_MAX], cummin[:-1]])[group_id]
    dominated = (prev_min <= d) | (group_first_d[group_id] < d)
    mask = np.zeros(len(price), dtype=bool)
    mask[order[~dominated]] = True
    return mask


def orders_pareto(
    sf_dir: str, driver_cap: int = 5_000_000, max_rounds: int = 3
) -> "ray.data.Dataset":
    """Skyline of orders on (price cents ↓, order day ↓): every order no
    other order beats on both axes — ``(o_orderkey, price_c, day)``.

    Local pareto per block (each block's front, typically O(log block)),
    then pareto-of-union: the global front is a subset of the union of
    local fronts, so survivors shrink geometrically; extra local rounds
    run only if the union still exceeds ``driver_cap``, and the final
    front-sized merge is one driver pass."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def local(batch: pa.Table) -> pa.Table:
        price = _cents(batch["o_totalprice"]).to_numpy()
        day = _ts_us(batch["o_orderdate"]) // _DAY_US
        m = _skyline_mask(price, day)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    batch["o_orderkey"].to_numpy()[m].astype(np.int64)
                ),
                "price_c": pa.array(price[m]),
                "day": pa.array(day[m]),
            }
        )

    surv = ds.map_batches(local, batch_format="pyarrow").materialize()
    rounds = 0
    while surv.count() > driver_cap:
        if rounds >= max_rounds:
            raise ValueError(
                f"pareto front still > {driver_cap} after {max_rounds} "
                "local rounds — raise driver_cap"
            )
        surv = (
            surv.repartition(max(1, surv.num_blocks() // 8))
            .map_batches(local_merge, batch_format="pyarrow")
            .materialize()
        )
        rounds += 1
    df = surv.to_pandas()
    m = _skyline_mask(
        df["price_c"].to_numpy(np.int64), df["day"].to_numpy(np.int64)
    )
    return ray.data.from_arrow(
        pa_from_pandas(df[m].reset_index(drop=True), preserve_index=False)
    )


def local_merge(batch: pa.Table) -> pa.Table:
    m = _skyline_mask(
        batch["price_c"].to_numpy().astype(np.int64),
        batch["day"].to_numpy().astype(np.int64),
    )
    return batch.filter(pa.array(m))


ORDERS_PARETO_SQL = f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
         epoch_us(o_orderdate) // {_DAY_US} AS day
  FROM orders
)
SELECT a.o_orderkey, a.price_c, CAST(a.day AS BIGINT) AS day
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.price_c <= a.price_c AND b.day <= a.day
    AND (b.price_c < a.price_c OR b.day < a.day)
)
"""


__all__ = [
    "basket_part_pairs",
    "make_basket_sql",
    "BASKET_PART_PAIRS_SQL",
    "cohort_retention",
    "COHORT_RETENTION_SQL",
    "running_revenue",
    "RUNNING_REVENUE_SQL",
    "daily_active_users",
    "DAILY_ACTIVE_USERS_SQL",
    "orders_pareto",
    "ORDERS_PARETO_SQL",
]


def monthly_revenue_delta(sf_dir: str) -> "ray.data.Dataset":
    """Period-over-period time series → ``(month, rev_cents, delta_cents)``
    where ``month`` is months-since-epoch, ``rev_cents`` the month's order
    revenue and ``delta_cents`` the change vs the previous CALENDAR month
    (months with no orders count as zero — the lag is over the dense
    month grid, not over observed rows, mirroring the twin's
    generate_series).

    Per-batch partials aggregate to ≤ months rows each; the merge is a
    calendar-bounded driver groupby (months grow with TIME, not data
    size — the same by-construction bound ``daily_active_users``
    documents), then a vectorized diff over the dense grid."""
    from ner_funtool_ray.sources.io import read_parquet_auto

    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"]).astype("datetime64[M]")
        month = d.astype(np.int64)  # months since epoch
        from ner_funtool_ray.pipelines.relational import cents_np

        cents = cents_np(np.asarray(batch["o_totalprice"]))
        g = (
            pd.DataFrame({"month": month, "rev_cents": cents})
            .groupby("month", sort=False)
            .sum()
            .reset_index()
        )
        return pa_from_pandas(g, preserve_index=False)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # calendar-bounded by construction
        .groupby("month", sort=True)["rev_cents"]
        .sum()
    )
    lo, hi = int(parts.index.min()), int(parts.index.max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    rev = parts.reindex(grid, fill_value=0).to_numpy(np.int64)
    delta = np.diff(rev, prepend=np.int64(0))
    delta[0] = rev[0]  # first month: delta vs an implicit empty month
    return ray.data.from_arrow(
        pa.table(
            {
                "month": pa.array(grid),
                "rev_cents": pa.array(rev),
                "delta_cents": pa.array(delta),
            }
        )
    )


MONTHLY_REVENUE_DELTA_SQL = """
WITH m AS (
  SELECT (year(o_orderdate) - 1970) * 12 + (month(o_orderdate) - 1)
           AS month,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1
),
grid AS (
  SELECT unnest(range((SELECT min(month) FROM m),
                      (SELECT max(month) FROM m) + 1)) AS month
),
dense AS (
  SELECT g.month, coalesce(m.rev_cents, 0) AS rev_cents
  FROM grid g LEFT JOIN m ON m.month = g.month
)
SELECT CAST(month AS BIGINT) AS month,
       CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(rev_cents - lag(rev_cents, 1, 0) OVER (ORDER BY month)
            AS BIGINT) AS delta_cents
FROM dense
"""


__all__ += ["monthly_revenue_delta", "MONTHLY_REVENUE_DELTA_SQL"]


def weekly_active_users(
    sf_dir: str, window_days: int = 7, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Trailing-window distinct users → ``(day, wau)``: for every day of
    the dense calendar span, the count of users active at least once in
    the ``window_days`` days ending that day — the rolling WAU metric,
    i.e. a COUNT(DISTINCT) over a sliding window, computed WITHOUT any
    distinct shuffle.

    Plan: per-batch distinct (user, day) cells hash-bucket by user (one
    exchange; user sets per bucket are disjoint); inside the bucket each
    user's active days expand to the ≤ ``window_days`` covered window
    ends and dedupe PER USER, so every (user, window_end) survives exactly
    once globally and the per-day counts from disjoint buckets sum
    exactly — a calendar-bounded partial (≤ days rows per bucket).  The
    dense grid (days with zero activity included) is clamped to the
    observed span on the driver."""
    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "d": _ts_us(batch["ts"]) // _DAY_US,
            }
        ).drop_duplicates()
        df["bucket"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def window_cells(group: pd.DataFrame) -> pa.Table:
        ud = group[["user_id", "d"]].drop_duplicates()
        users = np.repeat(
            ud["user_id"].to_numpy(), window_days
        )
        ends = (
            ud["d"].to_numpy()[:, None]
            + np.arange(window_days, dtype=np.int64)[None, :]
        ).reshape(-1)
        cells = pd.DataFrame({"user_id": users, "day": ends}).drop_duplicates()
        cnt = (
            cells.groupby("day", sort=False)
            .size()
            .rename("wau")
            .reset_index()
        )
        return pa_from_pandas(cnt, preserve_index=False)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window_cells, batch_format="pandas")
        .to_pandas()  # calendar-bounded by construction
        .groupby("day", sort=True)["wau"]
        .sum()
    )
    # clamp to the observed day span: window ends past the last active
    # day are artifacts of the expansion, and the twin's grid matches
    days = parts.index.to_numpy()
    active_days = days[parts.to_numpy() > 0]
    lo = int(active_days.min())
    hi = int(days.max() - (window_days - 1))
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    wau = parts.reindex(grid, fill_value=0).to_numpy(np.int64)
    return ray.data.from_arrow(
        pa.table({"day": pa.array(grid), "wau": pa.array(wau)})
    )


def make_weekly_active_users_sql(window_days: int = 7) -> str:
    """Twin of ``weekly_active_users`` for the SAME ``window_days``."""
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
),
span AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
grid AS (
  SELECT unnest(range((SELECT lo FROM span), (SELECT hi FROM span) + 1))
           AS day
)
SELECT CAST(g.day AS BIGINT) AS day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM grid g
LEFT JOIN ud u ON u.d BETWEEN g.day - {window_days - 1} AND g.day
GROUP BY g.day
"""


WEEKLY_ACTIVE_USERS_SQL = make_weekly_active_users_sql()


__all__ += [
    "weekly_active_users",
    "make_weekly_active_users_sql",
    "WEEKLY_ACTIVE_USERS_SQL",
]


def basket_pair_confidence(
    sf_dir: str, min_support: int = 2
) -> "ray.data.Dataset":
    """Association rules from the basket pairs →
    ``(antecedent, consequent, support_pair, conf_ppm)``: confidence of
    part→part co-purchase as an exact scaled integer,
    ``conf_ppm = support(ab)·10⁶ // support(a)``, both rule directions
    emitted (confidence is asymmetric).

    Reuses the size-guarded ``basket_part_pairs`` plan for the pair
    supports; the per-part marginals (distinct orders containing the
    part) ride one bounded exchange and broadcast as a catalog-bounded
    dict.  All integers → the twin is hash-exact."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    pairs = basket_part_pairs(sf_dir, min_support=min_support).to_pandas()

    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def marg_partial(batch: pa.Table) -> pa.Table:
        # rows arriving here are already distinct (order, part) pairs —
        # the bucketed_group_sum below guarantees it
        g = (
            batch.to_pandas()
            .groupby("l_partkey", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa_from_pandas(g, preserve_index=False)

    # distinct (order, part) per batch; an order's rows can span batches,
    # so the per-part count must dedupe globally — route through the
    # distinct pair itself (two-level, like supplier_distinct_parts)
    def distinct_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa_from_pandas(df, preserve_index=False)

    marg = (
        bucketed_group_sum(
            ds.map_batches(distinct_partial, batch_format="pyarrow"),
            keys=["l_orderkey", "l_partkey"],
            count_col="c",
        )
        .map_batches(marg_partial, batch_format="pyarrow")
        .to_pandas()  # catalog-bounded
        .groupby("l_partkey", sort=False)["n"]
        .sum()
        .to_dict()
    )
    a = pairs["part_a"].to_numpy(np.int64)
    b = pairs["part_b"].to_numpy(np.int64)
    s = pairs["n_orders"].to_numpy(np.int64)
    ant = np.concatenate([a, b])
    con = np.concatenate([b, a])
    sup = np.concatenate([s, s])
    conf = np.array(
        [
            (int(si) * 1_000_000) // marg[int(ai)]
            for ai, si in zip(ant, sup)
        ],
        dtype=np.int64,
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "antecedent": pa.array(ant),
                "consequent": pa.array(con),
                "support_pair": pa.array(sup),
                "conf_ppm": pa.array(conf),
            }
        )
    )


BASKET_PAIR_CONFIDENCE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*)::BIGINT AS support
  FROM op x JOIN op y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
marg AS (
  SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n FROM op GROUP BY 1
),
rules AS (
  SELECT a AS antecedent, b AS consequent, support FROM pairs
  UNION ALL SELECT b, a, support FROM pairs
)
SELECT antecedent, consequent, support AS support_pair,
       CAST(CAST(support AS HUGEINT) * 1000000 // m.n AS BIGINT)
         AS conf_ppm
FROM rules JOIN marg m ON m.l_partkey = antecedent
"""


__all__ += ["basket_pair_confidence", "BASKET_PAIR_CONFIDENCE_SQL"]


def dense_daily_type_counts(sf_dir: str) -> "pd.DataFrame":
    """Shared machinery for the calendar-dense (event_type, day) count
    grid: per-batch cells ride one bounded exchange, the pivot reindexes
    onto the dense day span with zero fill.  Vocabulary × calendar
    bounded → a driver frame by construction (consumers:
    ``event_type_weekly_counts``, ``distribution.event_type_drift``)."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "event_type": np.asarray(batch["event_type"]),
                    "day": _ts_us(batch["ts"]) // _DAY_US,
                }
            ),
            preserve_index=False,
        )

    counts = bucketed_group_sum(
        ds.map_batches(cells, batch_format="pyarrow"),
        keys=["event_type", "day"],
        count_col="c",
    ).to_pandas()
    piv = (
        counts.pivot(index="day", columns="event_type", values="c")
        .fillna(0)
        .astype(np.int64)
        .sort_index()
    )
    lo, hi = int(piv.index.min()), int(piv.index.max())
    return piv.reindex(np.arange(lo, hi + 1, dtype=np.int64), fill_value=0)


def event_type_weekly_counts(
    sf_dir: str, window_days: int = 7
) -> "ray.data.Dataset":
    """Trailing time-range window aggregate → ``(event_type, day,
    trailing_n)``: per type and dense-calendar day, the event count over
    the ``window_days`` days ending that day — the RANGE-window
    complement of the per-key ROWS window op.

    Daily (type, day) partials ride one bounded exchange; the trailing
    sum is a vectorized cumsum difference over the dense day grid —
    calendar × type-vocabulary bounded, so it runs on the driver."""
    piv = dense_daily_type_counts(sf_dir)
    grid = piv.index.to_numpy(np.int64)
    out_t, out_d, out_n = [], [], []
    for ty in sorted(piv.columns):
        daily = piv[ty].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(daily)])
        trail = cum[1:] - cum[np.maximum(0, np.arange(len(grid)) - window_days + 1)]
        out_t.extend([ty] * len(grid))
        out_d.extend(grid.tolist())
        out_n.extend(trail.tolist())
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "day": pa.array(np.array(out_d, dtype=np.int64)),
                "trailing_n": pa.array(np.array(out_n, dtype=np.int64)),
            }
        )
    )


EVENT_TYPE_WEEKLY_COUNTS_SQL = f"""
WITH c AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
days AS (
  SELECT unnest(range((SELECT min(day) FROM c),
                      (SELECT max(day) FROM c) + 1)) AS day
),
types AS (SELECT DISTINCT event_type FROM c),
grid AS (
  SELECT t.event_type, d.day, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_n
FROM grid
"""


__all__ += ["event_type_weekly_counts", "EVENT_TYPE_WEEKLY_COUNTS_SQL"]


def events_dow_hour_heatmap(sf_dir: str) -> "ray.data.Dataset":
    """Seasonality heatmap → ``(dow, hour, n)``: event counts per
    (day-of-week, hour-of-day) cell — the 7×24 activity profile every
    operations dashboard opens with.  Per-batch cell partials ride one
    bounded exchange (≤168 rows per block); dow uses the epoch-day
    formula ``(days + 4) % 7`` (0 = Sunday), which matches DuckDB's
    ``dayofweek`` exactly."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch["ts"])
        days = t // _DAY_US
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "dow": (days + 4) % 7,
                    "hour": (t // 3_600_000_000) % 24,
                }
            ),
            preserve_index=False,
        )

    return bucketed_group_sum(
        ds.map_batches(cells, batch_format="pyarrow"),
        keys=["dow", "hour"],
        count_col="n",
        driver_cap=2_000_000,
    )


EVENTS_DOW_HOUR_HEATMAP_SQL = f"""
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2
"""


__all__ += ["events_dow_hour_heatmap", "EVENTS_DOW_HOUR_HEATMAP_SQL"]


def event_anomaly_days(
    sf_dir: str, window_days: int = 7, k: int = 3
) -> "ray.data.Dataset":
    """Burst / anomaly ranking over the daily event stream →
    ``(event_type, day, n, prev_n, ratio_ppm)``: each type's ``k`` MOST
    anomalous dense-calendar days, ranked by the integer ratio of the
    day's count to its trailing ``window_days``-day average — the
    triage view behind every ingestion-volume monitor (a fixed ×2
    threshold goes silent as daily volume grows and relative noise
    shrinks; the top-k ranking stays informative at any scale).

    Pure-integer score (no float average):
    ``ratio_ppm = n · window_days · 10⁶ // prev_n`` with ``prev_n`` the
    count over the ``window_days`` days STRICTLY BEFORE the day; only
    days with a full, non-silent window rank (``day ≥ min_day +
    window_days``, ``prev_n > 0``); ties break on earlier day.

    Daily (type, day) partials ride one bounded exchange
    (``dense_daily_type_counts``); the window score is a vectorized
    cumsum difference over the calendar × type-vocabulary grid."""
    piv = dense_daily_type_counts(sf_dir)
    grid = piv.index.to_numpy(np.int64)
    idx = np.arange(len(grid))
    out: dict[str, list] = {
        "event_type": [], "day": [], "n": [], "prev_n": [], "ratio_ppm": []
    }
    w = np.int64(window_days)
    for ty in sorted(piv.columns):
        daily = piv[ty].to_numpy(np.int64)
        cum = np.concatenate([[np.int64(0)], np.cumsum(daily)])
        prev = cum[idx] - cum[np.maximum(0, idx - window_days)]
        ok = (idx >= window_days) & (prev > 0)
        ratio = np.zeros(len(grid), dtype=np.int64)
        ratio[ok] = (daily[ok] * w * np.int64(1_000_000)) // prev[ok]
        cand = np.flatnonzero(ok)
        # top-k by (ratio DESC, day ASC): lexsort on (-ratio, day)
        order = cand[np.lexsort((grid[cand], -ratio[cand]))][:k]
        out["event_type"].extend([ty] * len(order))
        out["day"].extend(grid[order].tolist())
        out["n"].extend(daily[order].tolist())
        out["prev_n"].extend(prev[order].tolist())
        out["ratio_ppm"].extend(ratio[order].tolist())
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out["event_type"], type=pa.string()),
                "day": pa.array(np.array(out["day"], dtype=np.int64)),
                "n": pa.array(np.array(out["n"], dtype=np.int64)),
                "prev_n": pa.array(np.array(out["prev_n"], dtype=np.int64)),
                "ratio_ppm": pa.array(
                    np.array(out["ratio_ppm"], dtype=np.int64)
                ),
            }
        )
    )


EVENT_ANOMALY_DAYS_SQL = f"""
WITH c AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
days AS (
  SELECT unnest(range((SELECT min(day) FROM c),
                      (SELECT max(day) FROM c) + 1)) AS day
),
types AS (SELECT DISTINCT event_type FROM c),
grid AS (
  SELECT t.event_type, d.day, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
),
w AS (
  SELECT event_type, day, c,
         coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY day
                               RANGE BETWEEN 7 PRECEDING
                                         AND 1 PRECEDING), 0) AS prev
  FROM grid
),
r AS (
  SELECT event_type, day, c, prev,
         (c * 7 * 1000000) // prev AS ratio_ppm,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY (c * 7 * 1000000) // prev DESC, day
         ) AS rn
  FROM w
  WHERE day >= (SELECT min(day) FROM c) + 7 AND prev > 0
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(c AS BIGINT) AS n,
       CAST(prev AS BIGINT) AS prev_n, CAST(ratio_ppm AS BIGINT) AS ratio_ppm
FROM r WHERE rn <= 3
"""


__all__ += ["event_anomaly_days", "EVENT_ANOMALY_DAYS_SQL"]
