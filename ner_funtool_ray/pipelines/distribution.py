"""Distribution-shaped analytics: count-of-counts histograms, share-of-
total filters against a global scalar, and exact integer anomaly flags.

Three shapes the warehouse family didn't cover yet:

- ``customer_order_histogram`` — TPC-H Q13: a two-level aggregate where
  the OUTPUT of one grouped count becomes the KEY of the next (the
  "custdist" distribution), including the zero bin that only a LEFT
  join would surface.
- ``important_parts`` — TPC-H Q11 shape: keep groups whose share of a
  GLOBAL total exceeds a threshold.  The global scalar broadcasts (one
  int), and the comparison cross-multiplies so both engines stay in
  exact integer arithmetic end to end.
- ``event_anomaly_cells`` — per-group z-score outlier flagging done
  entirely in integers: ``c > mean + 2·std`` over a group's cells is
  algebraically ``(c·n − S) > 0  AND  (c·n − S)² > 4·(n·S2 − S²)``
  with ``n, S, S2`` the count / sum / sum-of-squares — no sqrt, no
  float, so the DuckDB twin (HUGEINT) is hash-exact.

All heavy passes are per-batch partial aggregates followed by one
bounded exchange; every "second level" operates on data whose size is
bounded by a DOMAIN (distinct order-counts per customer, part catalog,
event-type × calendar-day cells), not by the corpus — the same
by-construction argument `daily_active_users` documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.pipelines.mining import _ts_us
from ner_funtool_ray.pipelines.relational import _cents
from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas

_DAY_US = 86_400_000_000


def customer_order_histogram(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 count-of-counts → ``(c_count, custdist)``: how many
    customers placed exactly ``c_count`` orders, INCLUDING the zero bin.

    Plan: per-batch partial counts per ``o_custkey`` → one int-key
    bucketed exchange → exact per-customer counts; the histogram over
    those counts has a domain bounded by the max orders-per-customer
    (tens), so per-batch histogram partials merge on the driver.  The
    zero bin never touches the customer TABLE's rows — its size is
    ``|customer| − |customers with ≥1 order|`` with ``|customer|`` read
    from parquet metadata (customers are unique by key).  A zero bin of
    size 0 is omitted (mirrored in the SQL twin's WHERE)."""
    orders = read_parquet_auto(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    per_cust = bucketed_group_sum(orders, keys=["o_custkey"], count_col="c_count")

    def hist_partial(batch: pa.Table) -> pa.Table:
        vc = (
            pd.Series(batch["c_count"].to_numpy())
            .value_counts()
            .rename_axis("c_count")
            .reset_index(name="custdist")
        )
        return pa_from_pandas(vc, preserve_index=False)

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()  # domain-bounded: distinct c_count values per block
        .groupby("c_count", sort=True)["custdist"]
        .sum()
        .reset_index()
    )
    n_customers = parquet_num_rows(f"{sf_dir}/customer.parquet")
    zero = n_customers - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [pd.DataFrame({"c_count": [0], "custdist": [zero]}), hist],
            ignore_index=True,
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "c_count": pa.array(hist["c_count"].to_numpy(np.int64)),
                "custdist": pa.array(hist["custdist"].to_numpy(np.int64)),
            }
        )
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
WITH o AS (SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY o_custkey),
h AS (SELECT c_count, count(*) AS custdist FROM o GROUP BY c_count),
z AS (
  SELECT 0 AS c_count,
         (SELECT count(*) FROM customer) - (SELECT sum(custdist) FROM h)
           AS custdist
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(custdist AS BIGINT) AS custdist FROM h
UNION ALL
SELECT CAST(c_count AS BIGINT), CAST(custdist AS BIGINT)
FROM z WHERE custdist > 0
"""


def important_parts(
    sf_dir: str, boost_num: int = 5, boost_den: int = 4
) -> "ray.data.Dataset":
    """TPC-H Q11 shape → ``(l_partkey, part_cents, share_ppm)``: parts
    whose revenue share exceeds ``boost_num/boost_den`` (default 1.25×)
    of the AVERAGE per-part share — relative to the catalog, so the
    filter stays meaningful at every scale (an absolute share threshold
    goes vacuous as the part catalog grows: measured 0 rows at sf0.01
    with a fixed 1/1000 cut).

    One partial-then-bucketed exchange builds exact per-part cents (the
    result is part-CATALOG-sized, so materializing it is bounded by the
    catalog, not the corpus); the global total and part count are one
    aggregate over that materialized table, broadcast as two ints.  The
    share test ``part·P·den > tot·num`` is applied as
    ``part ≥ tot·num // (P·den) + 1`` (integer-equivalent: for integer a,
    a·q > r  ⇔  a ≥ floor(r/q)+1) so the per-batch filter stays in int64
    while DuckDB cross-multiplies in HUGEINT."""
    li = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "cents": _cents(batch["l_extendedprice"]),
            }
        )

    per_part = bucketed_group_sum(
        li.map_batches(to_cents, batch_format="pyarrow"),
        keys=["l_partkey"],
        sum_cols={"part_cents": "cents"},
        count_col=None,
    ).materialize()
    tot = int(per_part.sum("part_cents"))
    n_parts = per_part.count()
    thresh = (tot * boost_num) // (n_parts * boost_den) + 1

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "l_partkey": pa.array([], type=pa.int64()),
                    "part_cents": pa.array([], type=pa.int64()),
                    "share_ppm": pa.array([], type=pa.int64()),
                }
            )
        pc_ = batch["part_cents"].to_numpy()
        mask = pc_ >= thresh
        cents = pc_[mask]
        share = [
            (int(c) * 1_000_000) // tot for c in cents
        ]  # python ints: no overflow at any scale
        return pa.table(
            {
                "l_partkey": pa.array(
                    batch["l_partkey"].to_numpy()[mask].astype(np.int64)
                ),
                "part_cents": pa.array(cents.astype(np.int64)),
                "share_ppm": pa.array(np.fromiter(share, dtype=np.int64)),
            }
        )

    return per_part.map_batches(keep, batch_format="pyarrow")


IMPORTANT_PARTS_SQL = """
WITH p AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS part_cents
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(sum(part_cents) AS HUGEINT) AS tot,
             CAST(count(*) AS HUGEINT) AS np FROM p)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(part_cents AS BIGINT) AS part_cents,
       CAST(CAST(part_cents AS HUGEINT) * 1000000 // tot AS BIGINT)
         AS share_ppm
FROM p, t
WHERE CAST(part_cents AS HUGEINT) * np * 4 > tot * 5
"""


def event_anomaly_cells(sf_dir: str) -> "ray.data.Dataset":
    """Per-type daily-count outliers → ``(event_type, day, cnt)``: cells
    whose count exceeds that event type's mean + 2·std over its active
    days — flagged with EXACT integer algebra (see module docstring), so
    the SQL twin matches bit for bit.

    Cell counts ride one bucketed exchange; the per-type moments
    ``(n, S, S2)`` are a second partial aggregate whose output is
    event-type-VOCABULARY-sized, merged on the driver and broadcast.  The
    final flag pass squares ``c·n − S`` in Python ints (cell-level work,
    bounded by type×calendar cells, and only on the ``c·n > S`` half)."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "day": _ts_us(batch["ts"]) // _DAY_US,
            }
        )
        return pa_from_pandas(df, preserve_index=False)

    cells = bucketed_group_sum(
        ds.map_batches(cell_partial, batch_format="pyarrow"),
        keys=["event_type", "day"],
        count_col="cnt",
    ).materialize()

    def moment_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "cnt": batch["cnt"].to_numpy(),
            }
        )
        df["c2"] = df["cnt"] * df["cnt"]
        df["one"] = np.int64(1)
        g = (
            df.groupby("event_type", sort=False)
            .agg(n=("one", "sum"), s=("cnt", "sum"), s2=("c2", "sum"))
            .reset_index()
        )
        return pa_from_pandas(g, preserve_index=False)

    stats = (
        cells.map_batches(moment_partial, batch_format="pyarrow")
        .to_pandas()  # type-vocabulary-sized by construction
        .groupby("event_type", sort=False)[["n", "s", "s2"]]
        .sum()
    )
    lut = {
        t: (int(r["n"]), int(r["s"]), int(r["s2"]))
        for t, r in stats.iterrows()
    }
    lut_ref = ray.put(lut)

    def flag(batch: pa.Table) -> pa.Table:
        st = ray.get(lut_ref)
        types = batch["event_type"].to_pylist()
        days = batch["day"].to_numpy()
        cnts = batch["cnt"].to_numpy()
        keep_t, keep_d, keep_c = [], [], []
        for t, d, c in zip(types, days, cnts):
            n, s, s2 = st[t]
            lhs = int(c) * n - s
            if lhs > 0 and lhs * lhs > 4 * (n * s2 - s * s):
                keep_t.append(t)
                keep_d.append(int(d))
                keep_c.append(int(c))
        return pa.table(
            {
                "event_type": pa.array(keep_t, type=pa.string()),
                "day": pa.array(keep_d, type=pa.int64()),
                "cnt": pa.array(keep_c, type=pa.int64()),
            }
        )

    return cells.map_batches(flag, batch_format="pyarrow")


EVENT_ANOMALY_CELLS_SQL = f"""
WITH c AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS cnt
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(cnt) AS HUGEINT) AS s,
         CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS s2
  FROM c GROUP BY event_type
)
SELECT c.event_type, CAST(day AS BIGINT) AS day, CAST(cnt AS BIGINT) AS cnt
FROM c JOIN s USING (event_type)
WHERE (CAST(cnt AS HUGEINT) * n - s) > 0
  AND (CAST(cnt AS HUGEINT) * n - s) * (CAST(cnt AS HUGEINT) * n - s)
        > 4 * (n * s2 - s * s)
"""


__all__ = [
    "customer_order_histogram",
    "CUSTOMER_ORDER_HISTOGRAM_SQL",
    "important_parts",
    "IMPORTANT_PARTS_SQL",
    "event_anomaly_cells",
    "EVENT_ANOMALY_CELLS_SQL",
]


def cheapest_supplier_per_part(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """TPC-H Q2 shape → ``(l_partkey, s_suppkey, s_name, best_cents)``:
    for every part, the supplier that ever shipped it at the lowest
    single-line price — grouped MIN (not sum) followed by an argmin
    join-back, with the deterministic ``(cents, suppkey)`` tie-break.

    MIN is idempotent and associative, so the same partial-then-bucketed
    plan as ``bucketed_group_sum`` applies with a min-merge: per-batch
    vectorized groupby-min over (part, supp), one int-key bucketed
    exchange, per-bucket min-merge, then the per-part argmin inside the
    PART's hash bucket (parts and their (part, supp) rows co-locate, so
    no second shuffle).  Supplier names attach from a broadcast dim."""
    import pyarrow.parquet as pq_

    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    s2name = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    name_ref = ray.put(s2name)

    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": np.asarray(batch["l_partkey"]).astype(np.int64),
                "s_suppkey": np.asarray(batch["l_suppkey"]).astype(np.int64),
                "cents": np.asarray(_cents(batch["l_extendedprice"])),
            }
        )
        g = (
            df.groupby(["l_partkey", "s_suppkey"], sort=False)["cents"]
            .min()
            .reset_index()
        )
        # bucket by PART so the later argmin needs no second exchange
        g["bucket"] = (g["l_partkey"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(g, preserve_index=False)

    def bucket_argmin(group: pd.DataFrame) -> pa.Table:
        m = (
            group.groupby(["l_partkey", "s_suppkey"], sort=False)["cents"]
            .min()
            .reset_index()
        )
        # deterministic argmin: sort by (cents, suppkey), first per part
        m = m.sort_values(
            ["l_partkey", "cents", "s_suppkey"], kind="mergesort"
        ).drop_duplicates("l_partkey", keep="first")
        names = ray.get(name_ref)
        return pa.table(
            {
                "l_partkey": pa.array(m["l_partkey"].to_numpy(np.int64)),
                "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64)),
                "s_name": pa.array(
                    m["s_suppkey"].map(names), type=pa.string()
                ),
                "best_cents": pa.array(m["cents"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_argmin, batch_format="pandas")
    )


CHEAPEST_SUPPLIER_SQL = """
WITH m AS (
  SELECT l_partkey, l_suppkey AS s_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
r AS (
  SELECT l_partkey, s_suppkey, cents,
         row_number() OVER (
           PARTITION BY l_partkey ORDER BY cents, s_suppkey
         ) AS rn
  FROM m
)
SELECT r.l_partkey, r.s_suppkey, s.s_name, r.cents AS best_cents
FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE rn = 1
"""


__all__ += ["cheapest_supplier_per_part", "CHEAPEST_SUPPLIER_SQL"]


def customer_revenue_gini(sf_dir: str) -> "ray.data.Dataset":
    """Revenue-concentration metric → one row ``(n, total_cents,
    gini_ppm)``: the Gini coefficient of per-customer order revenue as an
    exact scaled integer, ``G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)`` over
    the ascending-sorted revenues.

    Per-customer revenues come from the usual int-key partial exchange
    (customer-bounded output); the rank-weighted sum runs on the driver
    in Python big ints — ties in revenue make Σi·x₍ᵢ₎ order-invariant
    (equal x across a run of consecutive ranks sums to x·Σi however the
    run is permuted), so no tiebreak is needed on either engine."""
    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    per_cust = bucketed_group_sum(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        keys=["o_custkey"],
        sum_cols={"rev": "cents"},
        count_col=None,
        driver_cap=2_000_000,
    ).to_pandas()  # customer-bounded
    x = np.sort(per_cust["rev"].to_numpy(np.int64))
    n = len(x)
    total = int(x.sum())
    weighted = sum(int(i + 1) * int(v) for i, v in enumerate(x))
    gini_ppm = (
        ((2 * weighted - (n + 1) * total) * 1_000_000) // (n * total)
        if n and total
        else 0
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "total_cents": pa.array([total], type=pa.int64()),
                "gini_ppm": pa.array([gini_ppm], type=pa.int64()),
            }
        )
    )


CUSTOMER_REVENUE_GINI_SQL = """
WITH c AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT rev, row_number() OVER (ORDER BY rev) AS i FROM c
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(rev) AS HUGEINT) AS total,
         CAST(sum(CAST(i AS HUGEINT) * rev) AS HUGEINT) AS weighted
  FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(total AS BIGINT) AS total_cents,
       CAST(((2 * weighted - (n + 1) * total) * 1000000) // (n * total)
            AS BIGINT) AS gini_ppm
FROM s
"""


def event_type_drift(sf_dir: str) -> "ray.data.Dataset":
    """Distribution-drift monitoring → ``(day, tv_num, t_prev, t_cur)``
    per dense-calendar day after the first: the total-variation-distance
    NUMERATOR ``Σ_type |c_prev·T_cur − c_cur·T_prev|`` between
    consecutive days' event-type distributions, with both totals
    alongside (the caller divides by ``2·T_prev·T_cur`` for the TV
    distance — left as exact integers so the twin hash-matches; no
    float, no logs, unlike PSI).

    (type, day) count partials ride one bounded exchange; the day-pair
    assembly is calendar × type-vocabulary bounded → driver Python ints
    (HUGEINT twin).  The grid is dense over the observed span, so
    zero-event days yield zero numerators rather than skipped pairs."""
    from ner_funtool_ray.pipelines.mining import dense_daily_type_counts

    piv = dense_daily_type_counts(sf_dir)
    grid = piv.index.to_numpy(np.int64)
    rows = []
    for i in range(1, len(grid)):
        prev = piv.iloc[i - 1]
        cur = piv.iloc[i]
        tp, tc = int(prev.sum()), int(cur.sum())
        num = sum(
            abs(int(a) * tc - int(b) * tp) for a, b in zip(prev, cur)
        )
        rows.append((int(grid[i]), num, tp, tc))
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array([r[0] for r in rows], type=pa.int64()),
                "tv_num": pa.array([r[1] for r in rows], type=pa.int64()),
                "t_prev": pa.array([r[2] for r in rows], type=pa.int64()),
                "t_cur": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


EVENT_TYPE_DRIFT_SQL = f"""
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
  SELECT d.day, t.event_type, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
),
tot AS (SELECT day, CAST(sum(c) AS HUGEINT) AS t FROM grid GROUP BY day),
paired AS (
  SELECT g2.day,
         abs(CAST(g1.c AS HUGEINT) * t2.t - CAST(g2.c AS HUGEINT) * t1.t)
           AS term,
         t1.t AS t_prev, t2.t AS t_cur
  FROM grid g1
  JOIN grid g2 ON g2.day = g1.day + 1
              AND g2.event_type = g1.event_type
  JOIN tot t1 ON t1.day = g1.day
  JOIN tot t2 ON t2.day = g2.day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(sum(term) AS BIGINT) AS tv_num,
       CAST(min(t_prev) AS BIGINT) AS t_prev,
       CAST(min(t_cur) AS BIGINT) AS t_cur
FROM paired GROUP BY day
"""


__all__ += [
    "customer_revenue_gini",
    "CUSTOMER_REVENUE_GINI_SQL",
    "event_type_drift",
    "EVENT_TYPE_DRIFT_SQL",
]
