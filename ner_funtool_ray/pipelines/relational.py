"""Relational operator coverage: grouped aggregates, broadcast joins,
top-k sort, windowed event aggregates — each with an exact DuckDB twin.

Float determinism: money/quantity sums are computed in integer CENTS on
both engines (``round(x*100)`` per row, summed as int64, divided by 100.0
at the end) — distributed partial sums of doubles are not associative, so
both sides sum exact integers instead and the final division of identical
ints is bit-identical.

Join strategy (SURVEY §2.5): dimension tables (customer, nation) are read
driver-side (they are the small side), composed into a lookup dict,
``ray.put`` once, and applied inside ``map_batches`` — a broadcast hash
join with no shuffle.  The fact table streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.utils import pa_from_pandas


def _cents(col: pa.ChunkedArray) -> pa.Array:
    # half_towards_infinity == DuckDB round() (half away from zero);
    # pyarrow's default half_to_even would drift on .5-cent boundaries
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def cents_np(values) -> "np.ndarray":
    """numpy twin of :func:`_cents`: money → int64 cents rounding half
    AWAY from zero like DuckDB ``round()`` (``np.round`` is half-to-even
    and would drift on exact .5-cent boundaries)."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style pricing summary over lineitem (shipdate cutoff,
    groupby returnflag+linestatus).  Columns pruned at the read; the filter
    is a vectorized Arrow kernel; partial aggregation per batch keeps the
    shuffle to one row per (flag, status) per batch."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": _cents(batch["l_quantity"]),
                "price_c": _cents(batch["l_extendedprice"]),
                "disc_price_c": _cents(disc_price),
            }
        )
        df = (
            t.to_pandas()
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                qty_c=("qty_c", "sum"),
                price_c=("price_c", "sum"),
                disc_price_c=("disc_price_c", "sum"),
                n=("qty_c", "size"),
            )
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_price_c", alias_name="disc_price_c"),
            Sum("n", alias_name="count_order"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["count_order"]
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(batch["qty_c"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(
                    pc.cast(batch["price_c"], pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(batch["disc_price_c"], pa.float64()), 100.0
                ),
                "avg_qty": pc.divide(
                    pc.divide(pc.cast(batch["qty_c"], pa.float64()), 100.0),
                    pc.cast(n, pa.float64()),
                ),
                "count_order": n,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
  sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) / 100.0 AS sum_disc_price,
  (sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0) / count(*) AS avg_qty,
  count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(
    sf_dir: str,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """orders ⋈ customer ⋈ nation → revenue per nation.

    Size-guarded join strategy: nation (25 rows) is always a broadcast
    dict.  customer is O(rows) in TPC-H, so the plan checks its row count
    from parquet METADATA (no data read) against ``broadcast_limit``:

    - small side fits → broadcast hash join (dict ``ray.put`` once, fact
      table streams, no shuffle);
    - above the limit → bucketed shuffle join: per-batch partial revenue
      aggregate by custkey (the combiner — the shuffle carries one row per
      custkey per batch, never raw orders), customer and order partials
      co-located by ``custkey % n_buckets``, pandas merge per bucket, then
      a tiny final groupby(n_name).

    Both paths produce identical integer-cent results (oracle-exact)."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey2name = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    n_customers = parquet_num_rows(f"{sf_dir}/customer.parquet")

    if n_customers <= broadcast_limit:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust2nation = {
            c: nkey2name[n]
            for c, n in zip(
                cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()
            )
        }
        lookup_ref = ray.put(cust2nation)

        def join(batch: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            names = [lookup.get(c) for c in batch["o_custkey"].to_pylist()]
            t = pa.table(
                {
                    "n_name": pa.array(names, type=pa.string()),
                    "rev_c": _cents(batch["o_totalprice"]),
                }
            )
            df = (
                t.to_pandas()
                .groupby("n_name", sort=False)
                .agg(rev_c=("rev_c", "sum"), n_orders=("rev_c", "size"))
                .reset_index()
            )
            return pa_from_pandas(df, preserve_index=False)

        agg = (
            read_parquet_auto(
                f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
            )
            .map_batches(join, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(
                Sum("rev_c", alias_name="rev_c"),
                Sum("n_orders", alias_name="n_orders"),
            )
        )
    else:
        name_ref = ray.put(nkey2name)

        def order_partials(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "custkey": batch["o_custkey"].to_numpy(),
                    "rev_c": _cents(batch["o_totalprice"]).to_numpy(),
                }
            )
            agg = (
                df.groupby("custkey", sort=False)
                .agg(rev_c=("rev_c", "sum"), n_orders=("rev_c", "size"))
                .reset_index()
            )
            agg["nationkey"] = np.int64(-1)
            agg["kind"] = np.int8(0)
            agg["bucket"] = (agg["custkey"] % n_buckets).astype(np.int64)
            return pa_from_pandas(agg, preserve_index=False)

        def cust_rows(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "custkey": batch["c_custkey"].to_numpy(),
                    "rev_c": np.zeros(batch.num_rows, dtype=np.int64),
                    "n_orders": np.zeros(batch.num_rows, dtype=np.int64),
                    "nationkey": batch["c_nationkey"].to_numpy().astype(np.int64),
                    "kind": np.full(batch.num_rows, 1, dtype=np.int8),
                }
            )
            df["bucket"] = (df["custkey"] % n_buckets).astype(np.int64)
            return pa_from_pandas(df, preserve_index=False)

        orders_side = read_parquet_auto(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).map_batches(order_partials, batch_format="pyarrow")
        cust_side = read_parquet_auto(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(cust_rows, batch_format="pyarrow")

        def bucket_join(group: pd.DataFrame) -> pa.Table:
            dim = group[group["kind"] == 1]
            fact = group[group["kind"] == 0]
            if fact.empty:
                return pa.table(
                    {
                        "n_name": pa.array([], type=pa.string()),
                        "rev_c": pa.array([], type=pa.int64()),
                        "n_orders": pa.array([], type=pa.int64()),
                    }
                )
            nk = fact["custkey"].map(
                pd.Series(dim["nationkey"].to_numpy(), index=dim["custkey"].to_numpy())
            )
            names = nk.map(ray.get(name_ref))
            agg = (
                pd.DataFrame(
                    {
                        "n_name": names,
                        "rev_c": fact["rev_c"].to_numpy(),
                        "n_orders": fact["n_orders"].to_numpy(),
                    }
                )
                .groupby("n_name", sort=False)
                .sum()
                .reset_index()
            )
            return pa_from_pandas(agg, preserve_index=False)

        agg = (
            orders_side.union(cust_side)
            .groupby("bucket")
            .map_groups(bucket_join, batch_format="pandas")
            .groupby("n_name")
            .aggregate(
                Sum("rev_c", alias_name="rev_c"),
                Sum("n_orders", alias_name="n_orders"),
            )
        )

    return agg.map_batches(
        lambda b: pa.table(
            {
                "n_name": b["n_name"],
                "revenue": pc.divide(pc.cast(b["rev_c"], pa.float64()), 100.0),
                "n_orders": b["n_orders"],
            }
        ),
        batch_format="pyarrow",
    )


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
  sum(CAST(round(o.o_totalprice*100) AS BIGINT)) / 100.0 AS revenue,
  count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    k: int = 10,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem → top-k orders by
    revenue.  This is the engine's FACT-TO-FACT shuffle join (orders ⋈
    lineitem are both O(rows); the dim joins elsewhere broadcast):

    - semi-join pushdown: the segment-filtered custkey set is small →
      broadcast once, applied as a vectorized ``np.isin`` mask on orders
      (at catalog scale this side would fall back to the same bucketed
      join, like ``revenue_by_nation``'s guard);
    - lineitem never crosses the wire raw: per-batch partial revenue
      (integer cents) per orderkey is the combiner, so the shuffle carries
      one row per orderkey per batch;
    - both sides co-locate by ``orderkey % n_buckets``; per bucket a
      pandas merge + group-sum + LOCAL top-k (orderkeys are
      bucket-disjoint, so pruning to k per bucket is exact); the final
      sort touches k × n_buckets rows."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filters=[("c_mktsegment", "==", segment)],
    )
    keys = np.sort(cust["c_custkey"].to_numpy())
    keys_ref = ray.put(keys)
    cut = pa.scalar(np.datetime64(cutoff, "us"))

    def orders_side(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["o_orderdate"], cut))
        mask = np.isin(batch["o_custkey"].to_numpy(), ray.get(keys_ref))
        batch = batch.filter(pa.array(mask))
        n = batch.num_rows
        ok = batch["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "orderkey": pa.array(ok),
                "rev_c": pa.array(np.zeros(n, dtype=np.int64)),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def lineitem_side(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cut))
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        df = (
            pd.DataFrame(
                {
                    "orderkey": batch["l_orderkey"].to_numpy().astype(np.int64),
                    "rev_c": _cents(rev).to_numpy(),
                }
            )
            .groupby("orderkey", sort=False)["rev_c"]
            .sum()
            .reset_index()
        )
        n = len(df)
        ok = df["orderkey"].to_numpy()
        return pa.table(
            {
                "orderkey": pa.array(ok),
                "rev_c": pa.array(df["rev_c"].to_numpy()),
                "o_orderdate": pa.nulls(n, type=pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, type=pa.string()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow")
    items = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(lineitem_side, batch_format="pyarrow")

    def bucket_join(group: pd.DataFrame) -> pa.Table:
        o = group[group["kind"] == 1]
        l = group[group["kind"] == 0]
        if o.empty or l.empty:
            return pa.table(
                {
                    "l_orderkey": pa.array([], type=pa.int64()),
                    "rev_c": pa.array([], type=pa.int64()),
                    "o_orderdate": pa.array([], type=pa.timestamp("us")),
                    "o_orderpriority": pa.array([], type=pa.string()),
                }
            )
        rev = l.groupby("orderkey", sort=False)["rev_c"].sum().reset_index()
        m = rev.merge(
            o[["orderkey", "o_orderdate", "o_orderpriority"]], on="orderkey"
        )
        top = m.sort_values(
            ["rev_c", "orderkey"], ascending=[False, True]
        ).head(k)
        return pa.table(
            {
                "l_orderkey": pa.array(top["orderkey"].to_numpy(), type=pa.int64()),
                "rev_c": pa.array(top["rev_c"].to_numpy(), type=pa.int64()),
                "o_orderdate": pa.Array.from_pandas(
                    top["o_orderdate"], type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    top["o_orderpriority"].tolist(), type=pa.string()
                ),
            }
        )

    top = (
        orders.union(items)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .sort(["rev_c", "l_orderkey"], descending=[True, False])
        .limit(k)
    )
    return top.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue": pc.divide(pc.cast(b["rev_c"], pa.float64()), 100.0),
                "o_orderdate": b["o_orderdate"],
                "o_orderpriority": b["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )


SHIPPING_PRIORITY_SQL = """
SELECT l.l_orderkey,
  sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) / 100.0 AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


def top_orders(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Top-k orders by total price: per-batch local top-k partials, then a
    small global sort — never a full sort of the fact table."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k, [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return batch.take(idx)

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window aggregate: events per (event_type, hour window) with
    value sums — windows as groupby over truncated timestamps (the batch
    twin of a streaming tumbling window; SURVEY §2.9 had none in the
    reference, this is the training-pipeline extension)."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.floor_temporal(batch["ts"], unit="hour"),
                "value_c": _cents(batch["value"]),
            }
        )
        df = (
            t.to_pandas()
            .groupby(["event_type", "hour"], sort=False)
            .agg(value_c=("value_c", "sum"), n=("value_c", "size"))
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("value_c", alias_name="value_c"), Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "hour": b["hour"],
                "sum_value": pc.divide(pc.cast(b["value_c"], pa.float64()), 100.0),
                "n": b["n"],
            }
        ),
        batch_format="pyarrow",
    )


def customers_without_big_orders(
    sf_dir: str,
    threshold: float = 400_000.0,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Anti-join: customers with no order above ``threshold``.

    Size-guarded plan (mirrors ``revenue_by_nation``, guarded by parquet
    METADATA row count — no data read to decide): when orders is small
    enough for a driver-side filtered key read, the qualifying custkeys
    are broadcast once as a sorted unique int64 array and applied with
    vectorized ``np.isin`` inside map_batches (no shuffle).  Above the
    limit the plan is a fully distributed bucketed shuffle anti-join:
    orders are read and filtered IN TASKS, both sides co-located by
    ``custkey % n_buckets``, per-bucket vectorized ``isin``.  Identical
    results either way."""
    import pyarrow.parquet as pq

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")

    if n_orders <= broadcast_limit:
        big = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filters=[("o_totalprice", ">", threshold)],
        )
        keys = np.unique(np.asarray(big["o_custkey"]).astype(np.int64))
        keys_ref = ray.put(keys)

        def anti(batch: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            cust = np.asarray(batch["c_custkey"]).astype(np.int64)
            return batch.filter(
                pa.array(~np.isin(cust, k, assume_unique=False))
            )

        return read_parquet_auto(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        ).map_batches(anti, batch_format="pyarrow")

    # big-orders fallback: orders are read + filtered in tasks (never on
    # the driver); the shuffle carries distinct qualifying custkeys per
    # batch + customer rows only
    def key_rows(batch: pa.Table) -> pa.Table:
        hit = batch.filter(
            pc.greater(batch["o_totalprice"], pa.scalar(threshold))
        )
        cust = np.unique(np.asarray(hit["o_custkey"]).astype(np.int64))
        return pa.table(
            {
                "c_custkey": pa.array(cust, type=pa.int64()),
                "c_name": pa.nulls(len(cust), type=pa.string()),
                "kind": pa.array(np.zeros(len(cust), dtype=np.int8)),
                "bucket": pa.array(cust % np.int64(n_buckets)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        cust = np.asarray(batch["c_custkey"]).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": batch["c_name"],
                "kind": pa.array(np.ones(len(cust), dtype=np.int8)),
                "bucket": pa.array(cust % np.int64(n_buckets)),
            }
        )

    def bucket_anti(group: pd.DataFrame) -> pa.Table:
        bad = group.loc[group["kind"] == 0, "c_custkey"].to_numpy()
        cust = group[group["kind"] == 1]
        keep = cust[~np.isin(cust["c_custkey"].to_numpy(), bad)]
        return pa.table(
            {
                "c_custkey": pa.array(
                    keep["c_custkey"].to_numpy(), type=pa.int64()
                ),
                "c_name": pa.array(keep["c_name"], type=pa.string()),
            }
        )

    filtered_orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(key_rows, batch_format="pyarrow")
    customers = read_parquet_auto(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    return (
        filtered_orders.union(customers)
        .groupby("bucket")
        .map_groups(bucket_anti, batch_format="pandas")
    )


CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def purchase_view_gap(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: for each 'purchase' event, seconds since the same user's
    latest 'view' at-or-before it (NULL-free: purchases with no prior view
    are dropped).  Ray shape: hash-bucket users (bounded group count) →
    one ts-sorted ``merge_asof(by=user_id)`` per bucket — the documented
    as-of pattern; equal-ts views give the same gap regardless of tie
    order, so the result is deterministic."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    n_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(
                (batch["user_id"].to_numpy() % n_buckets).astype(np.int64)
            ),
        )

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per hash BUCKET of users, not per user (the repo's
        # groupagg.py lesson: per-key map_groups at high cardinality is the
        # shuffle bottleneck); within the bucket one ts-sorted merge_asof
        # with by=user_id handles every user vectorized
        purchases = group[group["event_type"] == "purchase"].sort_values("ts")
        views = group[group["event_type"] == "view"].sort_values("ts")
        if purchases.empty or views.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "secs_since_view": pd.Series([], dtype="int64")})
        m = pd.merge_asof(
            purchases[["event_id", "user_id", "ts"]],
            views[["user_id", "ts"]].rename(columns={"ts": "view_ts"}),
            left_on="ts", right_on="view_ts", by="user_id",
            direction="backward",
        ).dropna(subset=["view_ts"])
        # DuckDB date_diff('second', a, b) counts second-BOUNDARY crossings
        # (floor(b) - floor(a)), not the floored delta — match it exactly
        secs = (
            m["ts"].dt.floor("s") - m["view_ts"].dt.floor("s")
        ).dt.total_seconds()
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "secs_since_view": secs.astype("int64"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
    )


PURCHASE_VIEW_GAP_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view')
SELECT p.event_id,
       CAST(date_diff('second', v.view_ts, p.ts) AS BIGINT) AS secs_since_view
FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.view_ts <= p.ts
"""


def top_order_per_customer(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Window top-1 per group: each customer's most expensive order
    (ties → lowest orderkey).  Per-batch partial top-1 per customer, then
    a bounded hash-bucket merge — the shuffle carries one row per customer
    per batch, never the fact table."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return df.groupby("o_custkey", sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        df = best(batch.to_pandas())
        df["bucket"] = (df["o_custkey"] % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def merge(group: pd.DataFrame) -> pa.Table:
        out = best(group.drop(columns=["bucket"]))
        return pa_from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


TOP_ORDER_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
) = 1
"""


def event_props_k(sf_dir: str) -> "ray.data.Dataset":
    """JSON scalar extraction (§2.8): events.props is a JSON string
    ``{"k": n}`` → (event_id, k).  Vectorized via polars'
    Rust-native ``json_path_match`` (zero Python per row); stdlib
    ``json.loads`` fallback if polars is absent.  SQL twin uses
    json_extract."""
    try:
        import polars as pl
    except ImportError:
        pl = None

    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )

    def parse(batch: pa.Table) -> pa.Table:
        if pl is not None:
            s = pl.from_arrow(batch["props"].combine_chunks())
            ks = (
                s.str.json_path_match("$.k")
                .cast(pl.Int64)
                .to_arrow()
                .cast(pa.int64())
            )
        else:
            import json

            ks = pa.array(
                [int(json.loads(p)["k"]) for p in batch["props"].to_pylist()],
                type=pa.int64(),
            )
        return pa.table({"event_id": batch["event_id"], "k": ks})

    return ds.map_batches(parse, batch_format="pyarrow")


EVENT_PROPS_K_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


def sample_documents(sf_dir: str, pct: int = 5) -> "ray.data.Dataset":
    """Deterministic hash sampling (O1/sampling twin that is reproducible
    across engines, unlike seeded shuffles): keep doc iff
    md5_number_lower(doc_id) % 100 < pct — the same rows on every engine
    and at every parallelism.  Hashing is the vectorized single-block MD5
    kernel (functions/md5vec.py) — no per-row Python loop."""
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = [str(d) for d in batch["doc_id"].to_pylist()]
        u = md5_number_lower_batch(ids)
        return batch.filter(pa.array(u % np.uint64(100) < np.uint64(pct)))

    return ds.map_batches(keep, batch_format="pyarrow")


SAMPLE_DOCUMENTS_SQL = """
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 5
"""


def forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6 shape — the pure filter-aggregate fact scan: revenue
    forgone from 1996 shipments at 5-7% discount and quantity < 24.
    The batch transform is all pyarrow.compute (filter + integer-cent
    product + partial sum); the driver only adds ~n_blocks partial rows.
    Integer cents × integer discount-percent keep the sum associativity-
    free, so the result hashes bit-exactly against the SQL twin at any
    parallelism."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64("1996-01-01").astype("datetime64[us]")
    hi = np.datetime64("1997-01-01").astype("datetime64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        dc = _cents(batch["l_discount"])
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(dc, 5), pc.less_equal(dc, 7)
                ),
                pc.less(batch["l_quantity"], 24.0),
            ),
        )
        hit = batch.filter(keep)
        ep = _cents(hit["l_extendedprice"])
        dh = _cents(hit["l_discount"])
        rev = int(pc.sum(pc.multiply(ep, dh)).as_py() or 0)
        return pa.table(
            {
                "rev4": pa.array([rev], type=pa.int64()),
                "n": pa.array([hit.num_rows], type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return ray.data.from_arrow(
        pa.table(
            {
                "revenue": pa.array(
                    [parts["rev4"].sum() / 10000.0], type=pa.float64()
                ),
                "n": pa.array([int(parts["n"].sum())], type=pa.int64()),
            }
        )
    )


FORECAST_REVENUE_SQL = """
SELECT
  sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS revenue,
  count(*)::BIGINT AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def profit_by_nation_year(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q9 shape — fact scan with two broadcast dimension joins and a
    broadcast semi-join filter: profit on PROMO parts per supplier nation
    per ship year.  supplier→nation (100 rows) rides as a broadcast dict,
    the PROMO partkey set as a sorted int array (vectorized ``np.isin``);
    the fact table never shuffles — per-batch partials aggregate by
    (nation, year) and a tiny bounded groupby merges them.  Amounts are
    integer cents × integer (100 - discount%), bit-exact vs the twin."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk2name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    sup2nation = {
        s: nk2name[n]
        for s, n in zip(sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())
    }
    promo = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_type", "=", "PROMO")],
    )
    promo_keys = np.unique(np.asarray(promo["p_partkey"]).astype(np.int64))
    refs = ray.put((sup2nation, promo_keys))

    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        s2n, pk = ray.get(refs)
        keep = np.isin(np.asarray(batch["l_partkey"]).astype(np.int64), pk)
        hit = batch.filter(pa.array(keep))
        ep = np.asarray(_cents(hit["l_extendedprice"]))
        dc = np.asarray(_cents(hit["l_discount"]))
        amount4 = ep * (100 - dc)
        yr = np.asarray(pc.year(hit["l_shipdate"])).astype(np.int64)
        nations = pd.Series(hit["l_suppkey"].to_numpy()).map(s2n)
        return pa_from_pandas(
            pd.DataFrame({"n_name": nations, "yr": yr, "profit4": amount4}),
            preserve_index=False,
        )

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    # partials are ≤ (nations × years) rows per batch — the size-guarded
    # driver merge skips the ~3 s fixed Sort barrier; above the cap the
    # bounded-bucket shuffle handles it
    agg = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["n_name", "yr"],
        sum_cols={"profit4": "profit4"},
        count_col="n",
        driver_cap=2_000_000,
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "n_name": b["n_name"],
                "yr": b["yr"],
                "profit": pc.divide(pc.cast(b["profit4"], pa.float64()), 10000.0),
                "n": b["n"],
            }
        ),
        batch_format="pyarrow",
    )


PROFIT_BY_NATION_YEAR_SQL = """
SELECT n.n_name, year(l.l_shipdate)::BIGINT AS yr,
  sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l.l_discount*100) AS BIGINT))) / 10000.0 AS profit,
  count(*)::BIGINT AS n
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_type = 'PROMO'
GROUP BY 1, 2
"""


def late_order_priority(
    sf_dir: str, n_buckets: int = 32, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """TPC-H Q4 shape — fact-to-fact EXISTS semi-join: orders placed in
    1996Q1 with at least one line shipped more than 90 days after the
    order date, counted per priority.

    Size-guarded plan: the probe side is only ONE QUARTER of orders, so
    when the orders table is driver-readable (parquet-metadata row count ≤
    ``broadcast_limit``) the filtered (orderkey → orderdate, priority)
    arrays are broadcast once and the lineitem fact table streams against
    them with searchsorted — the only shuffle carries the distinct LATE
    orderkeys (≤ quarter size).  Above the limit, both sides hash-bucket
    by orderkey and each bucket resolves the predicate with a vectorized
    merge; the lineitem side then pre-aggregates to max(l_shipdate) per
    order per batch (EXISTS only needs the max).  Identical results."""
    lo = np.datetime64("1996-01-01").astype("datetime64[us]")
    hi = np.datetime64("1996-04-01").astype("datetime64[us]")
    import pyarrow.parquet as pq

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if n_orders <= broadcast_limit:
        ot = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        keep = pc.and_(
            pc.greater_equal(ot["o_orderdate"], pa.scalar(lo)),
            pc.less(ot["o_orderdate"], pa.scalar(hi)),
        )
        ot = ot.filter(keep)
        okeys = np.asarray(ot["o_orderkey"]).astype(np.int64)
        order = np.argsort(okeys)
        okeys = okeys[order]
        odates = np.asarray(ot["o_orderdate"]).astype("datetime64[us]")[order]
        oprio = np.asarray(ot["o_orderpriority"])[order]
        deadline = (odates + np.timedelta64(90, "D")).astype(np.int64)
        side = ray.put((okeys, deadline, oprio))

        def late_rows(batch: pa.Table) -> pa.Table:
            ks, dl, prio = ray.get(side)
            lk = np.asarray(batch["l_orderkey"]).astype(np.int64)
            ship = np.asarray(batch["l_shipdate"]).astype("datetime64[us]").astype(np.int64)
            idx = np.searchsorted(ks, lk)
            ok = (idx < len(ks))
            idx2 = np.minimum(idx, len(ks) - 1)
            hit = ok & (ks[idx2] == lk) & (ship > dl[idx2])
            lk_hit = lk[hit]
            uniq, first = np.unique(lk_hit, return_index=True)
            pr = prio[idx2[hit][first]]
            return pa.table(
                {
                    "orderkey": pa.array(uniq, type=pa.int64()),
                    "o_orderpriority": pa.array(pr, type=pa.string()),
                    "bucket": pa.array(uniq % np.int64(n_buckets)),
                }
            )

        def bucket_distinct(group: pd.DataFrame) -> pa.Table:
            d = group.drop_duplicates("orderkey")
            agg = (
                d.groupby("o_orderpriority", sort=False)
                .size()
                .reset_index(name="n_late_orders")
            )
            return pa.table(
                {
                    "o_orderpriority": pa.array(
                        agg["o_orderpriority"], type=pa.string()
                    ),
                    "n_late_orders": pa.array(
                        agg["n_late_orders"].to_numpy(dtype=np.int64)
                    ),
                }
            )

        from ner_funtool_ray.stages.groupagg import bucketed_group_sum

        late = read_parquet_auto(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ).map_batches(late_rows, batch_format="pyarrow")
        per_bucket = late.groupby("bucket").map_groups(
            bucket_distinct, batch_format="pandas"
        )
        out = bucketed_group_sum(
            per_bucket, ["o_orderpriority"],
            sum_cols={"n_late_orders": "n_late_orders"},
            count_col=None, driver_cap=2_000_000,
        )
        return out.select_columns(["o_orderpriority", "n_late_orders"])

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lines = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        hit = batch.filter(keep)
        ok = np.asarray(hit["o_orderkey"]).astype(np.int64)
        return pa.table(
            {
                "orderkey": pa.array(ok, type=pa.int64()),
                "ts": hit["o_orderdate"],
                "priority": hit["o_orderpriority"],
                "kind": pa.array(np.ones(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def line_maxima(batch: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "orderkey": np.asarray(batch["l_orderkey"]).astype(np.int64),
                    "ts": batch["l_shipdate"].to_pandas(),
                }
            )
            .groupby("orderkey", sort=False)["ts"]
            .max()
            .reset_index()
        )
        ok = df["orderkey"].to_numpy()
        return pa.table(
            {
                "orderkey": pa.array(ok, type=pa.int64()),
                "ts": pa.Array.from_pandas(df["ts"], type=pa.timestamp("us")),
                "priority": pa.nulls(len(ok), type=pa.string()),
                "kind": pa.array(np.zeros(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def bucket_semi(group: pd.DataFrame) -> pa.Table:
        o = group[group["kind"] == 1]
        l = group[group["kind"] == 0]
        if o.empty:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        lmax = l.groupby("orderkey", sort=False)["ts"].max()
        m = o.merge(
            lmax.rename("max_ship").reset_index(), on="orderkey", how="inner"
        )
        late = m[m["max_ship"] > m["ts"] + pd.Timedelta(days=90)]
        agg = (
            late.groupby("priority", sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "o_orderpriority": pa.array(agg["priority"], type=pa.string()),
                "n": pa.array(agg["n"].to_numpy(dtype=np.int64)),
            }
        )

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    parts = (
        orders.map_batches(order_rows, batch_format="pyarrow")
        .union(lines.map_batches(line_maxima, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(bucket_semi, batch_format="pandas")
    )
    out = bucketed_group_sum(
        parts, ["o_orderpriority"], sum_cols={"n_late_orders": "n"},
        count_col=None, driver_cap=2_000_000,
    )
    return out.select_columns(["o_orderpriority", "n_late_orders"])


LATE_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


def doc_length_quantiles(
    sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.95)
) -> "ray.data.Dataset":
    """EXACT per-group quantiles (p25/p50/p75/p95 of document length per
    lang) — the wide-aggregate shape a 100 TB pipeline needs without
    collecting group values: lengths are bounded-domain INTEGERS, so the
    distributed plan aggregates a (lang, n_chars) → count HISTOGRAM
    (bucketed partial-then-final sum; the shuffle carries one row per
    distinct (lang, length), never per document) and computes the exact
    order statistics from cumulative counts.  Interpolation mirrors
    DuckDB's ``quantile_cont`` (linear between the two bracketing order
    stats), so the SQL twin hashes exactly."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    hist = bucketed_group_sum(
        ds, ["lang", "n_chars"], count_col="cnt", driver_cap=2_000_000
    )

    def quantiles(group: pd.DataFrame) -> pa.Table:
        out_rows = []
        for lang, sub in group.groupby("lang", sort=False):
            sub = sub.sort_values("n_chars")
            vals = sub["n_chars"].to_numpy(dtype=np.float64)
            cnts = sub["cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            row = {"lang": lang}
            for q in qs:
                h = (n - 1) * q
                lo_i = int(np.floor(h))
                hi_i = min(lo_i + 1, n - 1)
                lo_v = vals[np.searchsorted(cum, lo_i + 1)]
                hi_v = vals[np.searchsorted(cum, hi_i + 1)]
                frac = h - lo_i
                # DuckDB's quantile_cont lerps as (1-f)*lo + f*hi — the
                # algebraically-equal lo + f*(hi-lo) differs in the last
                # ulp and breaks the bit-exact value hash
                row[f"p{int(q * 100)}"] = (1.0 - frac) * lo_v + frac * hi_v
            out_rows.append(row)
        df = pd.DataFrame(out_rows)
        return pa_from_pandas(df, preserve_index=False)

    # the histogram is tiny (distinct lengths × langs); one group per lang
    # would also be fine — a single merge task keeps it deterministic
    def collect(batch: pa.Table) -> pa.Table:
        return batch

    return (
        hist.map_batches(collect, batch_format="pyarrow")
        .repartition(1)
        .map_batches(quantiles, batch_format="pandas", batch_size=None)
    )


DOC_LENGTH_QUANTILES_SQL = """
SELECT lang,
  quantile_cont(n_chars, 0.25) AS p25,
  quantile_cont(n_chars, 0.50) AS p50,
  quantile_cont(n_chars, 0.75) AS p75,
  quantile_cont(n_chars, 0.95) AS p95
FROM documents GROUP BY lang
"""


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Sessionization (streaming-shaped workload as a batch groupby):
    per-user event stream sorted by ts; a new session starts when the gap
    to the previous event exceeds ``gap_minutes``.  Returns (user_id,
    n_sessions, n_events).  Users are hash-bucketed so the shuffle has a
    bounded group count at any user cardinality.  Ordering assumption:
    within a user, ts order
    defines sessions; equal timestamps share a session regardless of
    tie-break, so the result is deterministic."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    n_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(
                (batch["user_id"].to_numpy() % n_buckets).astype(np.int64)
            ),
        )

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per hash BUCKET of users (bounded group count —
        # per-user map_groups is the measured high-cardinality bottleneck);
        # a single sort + C-level groupby().diff() sessionizes every user
        # in the bucket vectorized
        g = group.sort_values(["user_id", "ts"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff()
        new_s = gaps.isna() | (gaps > pd.Timedelta(minutes=gap_minutes))
        out = (
            g.assign(new_s=new_s.astype(np.int64))
            .groupby("user_id", sort=False)
            .agg(n_sessions=("new_s", "sum"), n_events=("new_s", "size"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
    )


USER_SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
)
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
FROM e GROUP BY user_id
"""


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
  sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value,
  count(*)::BIGINT AS n
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def events_sliding(
    sf_dir: str, size_minutes: int = 60, hop_minutes: int = 15
) -> "ray.data.Dataset":
    """HOPPING-window aggregate (§2.9 family, alongside the tumbling
    ``events_hourly`` and session windows): each event contributes to the
    size/hop overlapping windows covering it.  Ray shape: the window
    expansion + a batch-local partial aggregate happen inside map_batches
    (the shuffle carries one row per (type, window) per batch, ~size/hop ×
    smaller than the event stream), then a bounded groupby merges partials.
    Window slots are integer epoch-second arithmetic so the DuckDB twin is
    bit-exact; value sums ride as integer cents (the shared float-sum
    protocol)."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    hop_us = hop_minutes * 60 * 1_000_000
    n_hops = size_minutes // hop_minutes

    def prep(batch: pa.Table) -> pa.Table:
        us = np.asarray(batch["ts"].cast(pa.int64()))
        slot = us // hop_us  # positive epochs: trunc == floor
        vc = np.asarray(_cents(batch["value"]))
        types = batch["event_type"].to_pandas()
        n = len(us)
        wslot = np.concatenate([slot - i for i in range(n_hops)])
        df = (
            pd.DataFrame(
                {
                    "event_type": pd.concat(
                        [types] * n_hops, ignore_index=True
                    ),
                    "wslot": wslot,
                    "value_c": np.tile(vc, n_hops),
                }
            )
            .groupby(["event_type", "wslot"], sort=False)
            .agg(value_c=("value_c", "sum"), n=("value_c", "size"))
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "wslot"])
        .aggregate(Sum("value_c", alias_name="value_c"), Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        ws = (np.asarray(b["wslot"]) * hop_us).astype("datetime64[us]")
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start": pa.array(ws, type=pa.timestamp("us")),
                "sum_value": pc.divide(
                    pc.cast(b["value_c"], pa.float64()), 100.0
                ),
                "n": b["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_SLIDING_SQL = """
WITH e AS (
  SELECT event_type,
         date_diff('second', TIMESTAMP '1970-01-01', ts) // 900 AS slot,
         CAST(round(value*100) AS BIGINT) AS vc
  FROM events
),
x AS (
  SELECT event_type, vc, slot - i AS wslot
  FROM e CROSS JOIN (SELECT unnest(range(4)) AS i) t
)
SELECT event_type,
       make_timestamp(wslot * 900 * 1000000) AS window_start,
       sum(vc) / 100.0 AS sum_value,
       count(*)::BIGINT AS n
FROM x GROUP BY 1, 2
"""


def user_funnel_counts(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Sequential-pattern funnel (SURVEY §2.9 streaming-shaped): how many
    users progressed view -> click -> purchase in strict timestamp order
    — stage 2 counts users with a click strictly after their FIRST view,
    stage 3 users with a purchase strictly after that first qualifying
    click.  The chained-min formulation (t1 = min view ts; t2 = min click
    ts > t1; t3 = min purchase ts > t2) makes the result order-exact and
    integer-only.

    Ray shape: one pass filters the three event types and hash-buckets
    users (the only shuffle, 3 columns); each bucket computes all of its
    users' stages vectorized (three groupby-mins and two filtering merges
    in pandas) and emits 3 partial count rows, so the final merge is
    bucket-count × 3 rows — driver-trivial at any corpus size."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def filter_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch["event_type"],
            value_set=pa.array(["view", "click", "purchase"]),
        )
        out = batch.filter(keep)
        uid = np.asarray(out["user_id"]).astype(np.int64)
        return out.append_column("bucket", pa.array(uid % np.int64(n_buckets)))

    def stages(group: pd.DataFrame) -> pd.DataFrame:
        v1 = (
            group[group["event_type"] == "view"]
            .groupby("user_id", sort=False)["ts"]
            .min()
            .rename("t1")
        )
        c = group[group["event_type"] == "click"].merge(
            v1, left_on="user_id", right_index=True
        )
        c2 = (
            c[c["ts"] > c["t1"]]
            .groupby("user_id", sort=False)["ts"]
            .min()
            .rename("t2")
        )
        p = group[group["event_type"] == "purchase"].merge(
            c2, left_on="user_id", right_index=True
        )
        p3 = p[p["ts"] > p["t2"]].groupby("user_id", sort=False)["ts"].min()
        return pd.DataFrame(
            {
                "stage": ["view", "click", "purchase"],
                "n_users": np.array([len(v1), len(c2), len(p3)], dtype=np.int64),
            }
        )

    partials = (
        ds.map_batches(filter_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(stages, batch_format="pandas")
    )
    return bucketed_group_sum(
        partials,
        keys=["stage"],
        sum_cols={"n_users": "n_users"},
        count_col=None,
        driver_cap=2_000_000,
    )


USER_FUNNEL_COUNTS_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v
UNION ALL SELECT 'click', count(*)::BIGINT FROM c
UNION ALL SELECT 'purchase', count(*)::BIGINT FROM p
"""


def events_gapfill(sf_dir: str, window_minutes: int = 15) -> "ray.data.Dataset":
    """Time-series resample with GAP FILL: events per (event_type,
    fixed window) over the corpus's full time span, with explicit ZERO
    rows for empty windows — the property ``events_hourly`` lacks and
    downstream charting/anomaly jobs need.

    Shape: one bounded aggregation (type × occupied-slot counts plus a
    per-batch min/max slot partial ride the same shuffle), then the dense
    grid is generated FROM THE SPAN — (span/window) × types rows, a
    time-bounded sketch no matter the corpus size — and left-joined on
    the driver against the bin counts (which are <= grid-sized by
    construction).  No stage touches raw events twice."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    slot_us = np.int64(window_minutes * 60 * 1_000_000)
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def slots(batch: pa.Table) -> pa.Table:
        us = np.asarray(batch["ts"]).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "slot": pa.array(us // slot_us),
            }
        )

    bins = bucketed_group_sum(
        ds.map_batches(slots, batch_format="pyarrow"),
        keys=["event_type", "slot"],
        count_col="n",
        driver_cap=2_000_000,
    ).to_pandas()  # <= types x occupied slots: time-bounded, driver-safe

    lo, hi = int(bins["slot"].min()), int(bins["slot"].max())
    types = np.sort(bins["event_type"].unique())
    all_slots = np.arange(lo, hi + 1, dtype=np.int64)
    grid = pd.MultiIndex.from_product(
        [types, all_slots], names=["event_type", "slot"]
    )
    filled = (
        bins.set_index(["event_type", "slot"])
        .reindex(grid, fill_value=0)
        .reset_index()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(filled["event_type"], type=pa.string()),
                "window_start": pa.array(
                    (filled["slot"].to_numpy() * slot_us).astype(
                        "datetime64[us]"
                    )
                ),
                "n": pa.array(filled["n"].to_numpy(dtype=np.int64)),
            }
        )
    )


EVENTS_GAPFILL_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 900000000 AS slot FROM events
),
b AS (SELECT event_type, slot, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
span AS (SELECT min(slot) AS lo, max(slot) AS hi FROM e),
grid AS (
  SELECT t.event_type, g.slot
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT lo FROM span),
                                  (SELECT hi FROM span))) AS slot
  ) g
)
SELECT grid.event_type,
       make_timestamp(grid.slot * 900000000) AS window_start,
       COALESCE(b.n, 0)::BIGINT AS n
FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.slot = grid.slot
"""


def orders_above_customer_avg(
    sf_dir: str, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Correlated-scalar-subquery shape: per customer, how many of their
    orders cost MORE than their own average order price.  The comparison
    is cross-multiplied into pure integers (cents * n_orders > sum_cents)
    so no division — and therefore no float rounding — exists on either
    engine.

    One shuffle: (custkey, cents) hash-buckets; each bucket computes its
    customers' sums/counts and the vectorized comparison locally (a
    customer never spans buckets)."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["o_custkey"]).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(ck),
                "cents": _cents(batch["o_totalprice"]),
                "bucket": pa.array(ck % np.int64(n_buckets)),
            }
        )

    def above(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("o_custkey", sort=False)["cents"]
        s = g.transform("sum").to_numpy(dtype=np.int64)
        n = g.transform("size").to_numpy(dtype=np.int64)
        hit = (group["cents"].to_numpy(dtype=np.int64) * n > s).astype(np.int64)
        out = pd.DataFrame(
            {"o_custkey": group["o_custkey"], "hit": hit, "one": np.int64(1)}
        )
        agg = out.groupby("o_custkey", sort=False, as_index=False).sum()
        return pd.DataFrame(
            {
                "o_custkey": agg["o_custkey"].to_numpy(dtype=np.int64),
                "n_above": agg["hit"].to_numpy(dtype=np.int64),
                "n_orders": agg["one"].to_numpy(dtype=np.int64),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(above, batch_format="pandas")
    )


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
a AS (
  SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS s, count(*)::BIGINT AS n
  FROM o GROUP BY o_custkey
)
SELECT o.o_custkey,
       CAST(sum(CASE WHEN o.cents * a.n > a.s THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       a.n AS n_orders
FROM o JOIN a USING (o_custkey) GROUP BY o.o_custkey, a.n
"""


def user_last_event(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Latest-record compaction (the CDC/upsert primitive): each user's
    most recent event — order ``(ts, event_id)`` descending, the repo's
    deterministic tie-break — keeping its type and value.  Per-batch
    partial top-1 per user, then a bounded hash-bucket merge: the shuffle
    carries one row per user per block, never the stream."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        return df.groupby("user_id", sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        df = best(batch.to_pandas())
        df["bucket"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = best(group.drop(columns=["bucket"]))
        return out.rename(
            columns={"event_type": "last_type", "value": "last_value"}
        )[["user_id", "ts", "last_type", "last_value"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


USER_LAST_EVENT_SQL = """
WITH r AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, ts, event_type AS last_type, value AS last_value
FROM r WHERE rn = 1
"""


def nation_pair_volume(
    sf_dir: str,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """TPC-H Q7 shape → ``(supp_nation, cust_nation, yr, revenue, n)``:
    shipping volume between DIFFERENT nations — the pair-grouped
    fact-to-fact join (lineitem needs the customer nation, which lives
    across the orders join).

    Dimension sides (supplier→nation, customer→nation) always broadcast.
    The order→nation map is FACT-sized, so it is size-guarded by parquet
    metadata: below the limit it broadcasts as a sorted orderkey array +
    nation-code array applied with ``np.searchsorted`` (fact table never
    shuffles); above it, lineitem partials and order rows co-locate by
    ``orderkey % n_buckets`` (the ``shipping_priority`` fact-fact plan)
    and only (pair, year) partials leave each bucket.  Revenue follows
    the Q9 integer recipe: cents × (100 − discount%) summed exactly, one
    final division."""
    import pyarrow.parquet as pq_

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk2name = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sup2nk = dict(
        zip(sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())
    )
    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust2nk = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    )

    def li_partial(batch: pa.Table):
        """lineitem → (l_orderkey, supp_nk, yr, rev4) — shared by both plans."""
        ep = np.asarray(_cents(batch["l_extendedprice"]))
        dc = np.asarray(_cents(batch["l_discount"]))
        return pd.DataFrame(
            {
                "l_orderkey": np.asarray(batch["l_orderkey"]).astype(np.int64),
                "supp_nk": pd.Series(batch["l_suppkey"].to_numpy()).map(sup2nk),
                "yr": np.asarray(pc.year(batch["l_shipdate"])).astype(np.int64),
                "rev4": ep * (100 - dc),
            }
        )

    def finalize(agg: "ray.data.Dataset") -> "ray.data.Dataset":
        return agg.map_batches(
            lambda b: pa.table(
                {
                    "supp_nation": b["supp_nation"],
                    "cust_nation": b["cust_nation"],
                    "yr": b["yr"],
                    "revenue": pc.divide(
                        pc.cast(b["rev4"], pa.float64()), 10000.0
                    ),
                    "n": b["n"],
                }
            ),
            batch_format="pyarrow",
        )

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if n_orders <= broadcast_limit:
        o = pq_.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        ok = np.asarray(o["o_orderkey"]).astype(np.int64)
        cnk = (
            pd.Series(o["o_custkey"].to_numpy())
            .map(cust2nk)
            .to_numpy(np.int64)
        )
        order_srt = np.argsort(ok, kind="mergesort")
        refs = ray.put((ok[order_srt], cnk[order_srt]))

        def partial(batch: pa.Table) -> pa.Table:
            okeys, onk = ray.get(refs)
            df = li_partial(batch)
            pos = np.searchsorted(okeys, df["l_orderkey"].to_numpy())
            df["cust_nk"] = onk[pos]
            df["supp_nation"] = df["supp_nk"].map(nk2name)
            df["cust_nation"] = pd.Series(df["cust_nk"]).map(nk2name)
            df = df[df["supp_nation"] != df["cust_nation"]]
            g = (
                df.groupby(["supp_nation", "cust_nation", "yr"], sort=False)
                .agg(rev4=("rev4", "sum"), n=("rev4", "size"))
                .reset_index()
            )
            return pa_from_pandas(g, preserve_index=False)

        agg = bucketed_group_sum(
            read_parquet_auto(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"],
            ).map_batches(partial, batch_format="pyarrow"),
            ["supp_nation", "cust_nation", "yr"],
            sum_cols={"rev4": "rev4", "n": "n"},
            count_col=None,
            driver_cap=2_000_000,  # ≤ nations² × years rows
        )
        return finalize(agg)

    # fact-fact fallback: co-locate lineitem partials and order rows by
    # orderkey bucket; only (pair, year) partials leave each bucket
    def li_rows(batch: pa.Table) -> pa.Table:
        df = li_partial(batch)
        df["kind"] = np.int8(0)
        df["cust_nk"] = np.int64(-1)
        df["bucket"] = df["l_orderkey"].to_numpy() % np.int64(n_buckets)
        return pa_from_pandas(df, preserve_index=False)

    def order_rows(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
        cnk = (
            pd.Series(batch["o_custkey"].to_numpy())
            .map(cust2nk)
            .to_numpy(np.int64)
        )
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "l_orderkey": ok,
                    "supp_nk": np.int64(-1),
                    "yr": np.int64(-1),
                    "rev4": np.int64(0),
                    "kind": np.int8(1),
                    "cust_nk": cnk,
                    "bucket": ok % np.int64(n_buckets),
                }
            ),
            preserve_index=False,
        )

    def bucket_join(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group["kind"] == 1]
        li = group[group["kind"] == 0]
        if li.empty:
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype=object),
                    "cust_nation": pd.Series([], dtype=object),
                    "yr": pd.Series([], dtype=np.int64),
                    "rev4": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        lut = dict(zip(o["l_orderkey"], o["cust_nk"]))
        li = li.copy()
        li["cust_nk"] = li["l_orderkey"].map(lut)
        li["supp_nation"] = li["supp_nk"].map(nk2name)
        li["cust_nation"] = li["cust_nk"].map(nk2name)
        li = li[li["supp_nation"] != li["cust_nation"]]
        return (
            li.groupby(["supp_nation", "cust_nation", "yr"], sort=False)
            .agg(rev4=("rev4", "sum"), n=("rev4", "size"))
            .reset_index()
        )

    li_ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o_ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_rows, batch_format="pyarrow")
    agg = bucketed_group_sum(
        li_ds.union(o_ds).groupby("bucket").map_groups(
            bucket_join, batch_format="pandas"
        ),
        ["supp_nation", "cust_nation", "yr"],
        sum_cols={"rev4": "rev4", "n": "n"},
        count_col=None,
        driver_cap=2_000_000,
    )
    return finalize(agg)


NATION_PAIR_VOLUME_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS yr,
       sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) / 10000.0
         AS revenue,
       count(*)::BIGINT AS n
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


def top_returned_customers(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """TPC-H Q10 shape → top-``k`` ``(c_custkey, c_name, revenue, n)`` by
    lost revenue on RETURNED line items.

    lineitem is filtered at the scan (returnflag pushdown), partials
    aggregate by custkey THROUGH the broadcast order→custkey map (orders
    would be fact-sized at scale — here the map is the semi-joined
    RETURNED order set, which is returns-bounded, and guarded), and the
    per-customer aggregate rides one int-key bucketed exchange before a
    tiny exact top-k (revenue DESC, custkey ASC tie-break)."""
    import pyarrow.parquet as pq_

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    o = pq_.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ok = np.asarray(o["o_orderkey"]).astype(np.int64)
    ck = np.asarray(o["o_custkey"]).astype(np.int64)
    srt = np.argsort(ok, kind="mergesort")
    refs = ray.put((ok[srt], ck[srt]))

    def partial(batch: pa.Table) -> pa.Table:
        okeys, ckeys = ray.get(refs)
        hit = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        if hit.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], type=pa.int64()),
                    "rev4": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        ep = np.asarray(_cents(hit["l_extendedprice"]))
        dc = np.asarray(_cents(hit["l_discount"]))
        lo = np.asarray(hit["l_orderkey"]).astype(np.int64)
        cust = ckeys[np.searchsorted(okeys, lo)]
        df = (
            pd.DataFrame({"c_custkey": cust, "rev4": ep * (100 - dc)})
            .groupby("c_custkey", sort=False)
            .agg(rev4=("rev4", "sum"), n=("rev4", "size"))
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    per_cust = bucketed_group_sum(
        read_parquet_auto(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag",
                     "l_extendedprice", "l_discount"],
        ).map_batches(partial, batch_format="pyarrow"),
        keys=["c_custkey"],
        sum_cols={"rev4": "rev4", "n": "n"},
        count_col=None,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["rev4", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa_from_pandas(df, preserve_index=False)

    cand = (
        per_cust.map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rev4", "c_custkey"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
    )
    cust_names = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    out = cand.merge(cust_names, on="c_custkey", how="left")
    return ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64)),
                "c_name": pa.array(out["c_name"], type=pa.string()),
                "revenue": pa.array(
                    out["rev4"].to_numpy(np.int64) / 10000.0
                ),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )
    )


TOP_RETURNED_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name,
       sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) / 10000.0
         AS revenue,
       count(*)::BIGINT AS n
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l.l_discount*100) AS BIGINT))) DESC,
         c.c_custkey
LIMIT 20
"""


def _totalprice_cents_bounds(path: str) -> tuple[int, int]:
    """(min, max) o_totalprice as cents from parquet row-group stats —
    metadata only, pruned single-column fallback."""
    import pyarrow.parquet as pq_

    f = pq_.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("o_totalprice")
    lo, hi = None, None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        t = pq_.read_table(path, columns=["o_totalprice"])
        v = np.asarray(t["o_totalprice"])
        lo, hi = float(v.min()), float(v.max())
    # stats bound the VALUES; widen by one cent so rounding never escapes
    return int(np.floor(lo * 100)) - 1, int(np.ceil(hi * 100)) + 1


def order_price_decile(
    sf_dir: str, n_tiles: int = 10, n_partitions: int = 32
) -> "ray.data.Dataset":
    """Global rank statistic without a global sort → ``(o_orderkey,
    cents, decile)`` where ``decile = rank·n_tiles // N`` under the total
    order ``(cents, o_orderkey)``.

    The ``running_revenue`` scan decomposition applied to a VALUE key:
    cents-range partitions (bounds from parquet stats) are
    order-consistent with the sort key, so per-partition row counts give
    exclusive rank offsets and each partition ranks locally — the only
    driver-side data is the ≤``n_partitions``-row counts vector."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    path = f"{sf_dir}/orders.parquet"
    lo, hi = _totalprice_cents_bounds(path)
    width = max(1, -(-(hi - lo + 1) // n_partitions))

    ds = read_parquet_auto(path, columns=["o_orderkey", "o_totalprice"])

    def keyed(batch: pa.Table) -> pa.Table:
        cents = np.asarray(_cents(batch["o_totalprice"]))
        return pa.table(
            {
                "part": pa.array((cents - lo) // width),
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "cents": pa.array(cents),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    counts = (
        bucketed_group_sum(
            keyed_ds.map_batches(
                lambda t: t.select(["part"]), batch_format="pyarrow"
            ),
            keys=["part"],
            count_col="c",
            n_buckets=8,
            driver_cap=1_000_000,
        )
        .to_pandas()
        .sort_values("part")
    )
    total = int(counts["c"].sum())
    offs = dict(
        zip(
            counts["part"].to_numpy(),
            np.concatenate([[0], np.cumsum(counts["c"].to_numpy())[:-1]]),
        )
    )

    def local_rank(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cents", "o_orderkey"], kind="mergesort")
        rank = np.arange(len(g), dtype=np.int64) + int(
            offs[int(g["part"].iloc[0])]
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "cents": g["cents"].to_numpy(),
                "decile": (rank * n_tiles) // total,
            }
        )

    return keyed_ds.groupby("part").map_groups(
        local_rank, batch_format="pandas"
    )


ORDER_PRICE_DECILE_SQL = """
WITH c AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderkey, cents,
         row_number() OVER (ORDER BY cents, o_orderkey) - 1 AS rk,
         count(*) OVER () AS n
  FROM c
)
SELECT o_orderkey, cents, CAST((rk * 10) // n AS BIGINT) AS decile FROM r
"""


def top_supplier_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q15 shape — top supplier(s) by quarterly revenue →
    ``(suppkey, s_name, total_revenue)``: revenue per supplier over
    1996-Q1 shipments, keeping every supplier tied at the maximum.

    Plan: pruned fact scan → per-batch integer-cent partial sums keyed by
    ``l_suppkey`` (the partial rows per batch are bounded by the supplier
    dimension, not the fact table) → size-guarded merge
    (``bucketed_group_sum``) → the max-filter and the name join run on
    the SUPPLIER-sized aggregate, a dimension table by definition, so the
    driver step is bounded at any fact-table scale.  Integer 1e-4-dollar
    units keep the sum associative → bit-exact vs the SQL twin."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    lo = np.datetime64("1996-01-01").astype("datetime64[us]")
    hi = np.datetime64("1996-04-01").astype("datetime64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        hit = batch.filter(keep)
        ep = _cents(hit["l_extendedprice"]).to_numpy()
        dc = _cents(hit["l_discount"]).to_numpy()
        df = pd.DataFrame(
            {"suppkey": hit["l_suppkey"].to_numpy(), "rev4": ep * (100 - dc)}
        )
        agg = df.groupby("suppkey", sort=False)["rev4"].sum().reset_index()
        return pa_from_pandas(agg, preserve_index=False)

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    agg = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["suppkey"],
        sum_cols={"rev4": "rev4"},
        driver_cap=2_000_000,
    ).to_pandas()  # ≤ one row per supplier — dimension-bounded
    if len(agg) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "suppkey": pa.array([], type=pa.int64()),
                    "s_name": pa.array([], type=pa.string()),
                    "total_revenue": pa.array([], type=pa.float64()),
                }
            )
        )
    best = agg[agg["rev4"] == agg["rev4"].max()]
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = best.merge(sup, left_on="suppkey", right_on="s_suppkey")
    out = out.sort_values("suppkey")
    return ray.data.from_arrow(
        pa.table(
            {
                "suppkey": pa.array(out["suppkey"].to_numpy(np.int64)),
                "s_name": pa.array(out["s_name"].astype(str)),
                "total_revenue": pa.array(
                    out["rev4"].to_numpy(np.int64) / 10000.0, type=pa.float64()
                ),
            }
        )
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT r.suppkey, s.s_name, r.rev4 / 10000.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
WHERE r.rev4 = (SELECT max(rev4) FROM rev)
"""


def event_value_by_nation(sf_dir: str, hot_k: int = 16) -> "ray.data.Dataset":
    """Event value rollup by the acting customer's nation →
    ``(n_name, total_value, n_events)`` — the demo query for the
    SKEW-SPLIT JOIN (`stages/skewjoin.py`): events join customer on
    ``user_id = c_custkey`` with the ``hot_k`` heaviest user ids joined
    MAP-SIDE from a broadcast (no reducer ever owns a hot key's whole
    row set) and the cold tail through the bucketed shuffle.  The final
    nation rollup is a bounded group-sum over integer cents; nation
    names broadcast (25 rows)."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum
    from ner_funtool_ray.stages.skewjoin import skew_split_join

    fact = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    dim = read_parquet_auto(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = skew_split_join(
        fact, dim, "user_id", "c_custkey", ["c_nationkey"], hot_k=hot_k
    )
    nations = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    n_map = dict(
        zip(nations["n_nationkey"].to_pylist(), nations["n_name"].to_pylist())
    )
    n_ref = ray.put(n_map)

    def partial(batch: pa.Table) -> pa.Table:
        nm = ray.get(n_ref)
        df = pd.DataFrame(
            {
                "n_name": pd.Series(
                    np.asarray(batch["c_nationkey"]).astype(np.int64)
                ).map(nm),
                "cents": _cents(batch["value"]).to_numpy(),
            }
        )
        agg = (
            df.groupby("n_name", sort=False)["cents"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return pa.table(
            {
                "n_name": pa.array(agg["n_name"].astype(str)),
                "cents": pa.array(agg["sum"].to_numpy(np.int64)),
                "n_events": pa.array(agg["size"].to_numpy(np.int64)),
            }
        )

    agg = bucketed_group_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        keys=["n_name"],
        sum_cols={"cents": "cents", "n_events": "n_events"},
        driver_cap=2_000_000,
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "n_name": b["n_name"],
                "total_value": pc.divide(pc.cast(b["cents"], pa.float64()), 100.0),
                "n_events": b["n_events"],
            }
        ),
        batch_format="pyarrow",
    )


EVENT_VALUE_BY_NATION_SQL = """
SELECT n.n_name,
       sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value,
       count(*)::BIGINT AS n_events
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


def orders_nearby_count(sf_dir: str, days: int = 3) -> "ray.data.Dataset":
    """Pure time-band range join (no equi key): for each order, how many
    OTHER orders — any customer — were placed strictly after it and within
    ``days`` days.  The reference has no join at all (SURVEY §2.5); Ray
    Data has no range-join operator; `stages/rangejoin.py` supplies the
    binned-replication plan (left ×2 bins, rights in their own bin, counts
    not pairs), so the |matches| pair expansion never materializes."""
    from ner_funtool_ray.stages.rangejoin import banded_count_join

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    return banded_count_join(
        orders,
        orders,
        left_id="o_orderkey",
        left_ts="o_orderdate",
        right_ts="o_orderdate",
        band_us=days * 86_400_000_000,
        out_col="n_within",
    )


ORDERS_NEARBY_COUNT_SQL = """
SELECT a.o_orderkey,
       CAST(count(b.o_orderkey) AS BIGINT) AS n_within
FROM orders a
LEFT JOIN orders b
  ON b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 3 DAY
GROUP BY a.o_orderkey
"""


def user_event_burst(sf_dir: str, minutes: int = 10) -> "ray.data.Dataset":
    """Keyed band range join: for each event, how many LATER events the
    same user produced within ``minutes`` minutes (burst detection).  The
    equi key (user) lets `stages/rangejoin.py` co-locate both sides by
    key hash — no replication, one ts-sorted searchsorted per key slice
    per bucket."""
    from ner_funtool_ray.stages.rangejoin import banded_count_join

    events = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return banded_count_join(
        events,
        events,
        left_id="event_id",
        left_ts="ts",
        right_ts="ts",
        band_us=minutes * 60_000_000,
        key="user_id",
        out_col="n_burst",
    )


USER_EVENT_BURST_SQL = """
SELECT a.event_id,
       CAST(count(b.event_id) AS BIGINT) AS n_burst
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_id
"""


def _nation_year_revenue_base(
    sf_dir: str,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(n_name, yr, rev_c) base aggregate shared by :func:`revenue_rollup`
    and :func:`revenue_cube`: the same size-guarded join as
    :func:`revenue_by_nation` (broadcast customer dict under
    ``broadcast_limit``, else the bucketed kind-tagged shuffle join),
    keyed by (nation, order year), integer cents."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey2name = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    n_customers = parquet_num_rows(f"{sf_dir}/customer.parquet")
    orders_cols = ["o_custkey", "o_totalprice", "o_orderdate"]

    if n_customers <= broadcast_limit:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust2nation = {
            c: nkey2name[n]
            for c, n in zip(
                cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()
            )
        }
        lookup_ref = ray.put(cust2nation)

        def join(batch: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            names = [lookup.get(c) for c in batch["o_custkey"].to_pylist()]
            df = pd.DataFrame(
                {
                    "n_name": names,
                    "yr": pc.year(batch["o_orderdate"])
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False),
                    "rev_c": _cents(batch["o_totalprice"]).to_numpy(),
                }
            )
            agg = (
                df.groupby(["n_name", "yr"], sort=False)["rev_c"]
                .sum()
                .reset_index()
            )
            return pa_from_pandas(agg, preserve_index=False)

        base = (
            read_parquet_auto(f"{sf_dir}/orders.parquet", columns=orders_cols)
            .map_batches(join, batch_format="pyarrow")
            .groupby(["n_name", "yr"])
            .aggregate(Sum("rev_c", alias_name="rev_c"))
        )
    else:
        name_ref = ray.put(nkey2name)

        def order_partials(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "custkey": batch["o_custkey"].to_numpy(),
                    "yr": pc.year(batch["o_orderdate"])
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False),
                    "rev_c": _cents(batch["o_totalprice"]).to_numpy(),
                }
            )
            agg = (
                df.groupby(["custkey", "yr"], sort=False)["rev_c"]
                .sum()
                .reset_index()
            )
            agg["nationkey"] = np.int64(-1)
            agg["kind"] = np.int8(0)
            agg["bucket"] = (agg["custkey"] % n_buckets).astype(np.int64)
            return pa_from_pandas(agg, preserve_index=False)

        def cust_rows(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "custkey": batch["c_custkey"].to_numpy(),
                    "yr": np.zeros(batch.num_rows, dtype=np.int64),
                    "rev_c": np.zeros(batch.num_rows, dtype=np.int64),
                    "nationkey": batch["c_nationkey"].to_numpy().astype(np.int64),
                    "kind": np.full(batch.num_rows, 1, dtype=np.int8),
                }
            )
            df["bucket"] = (df["custkey"] % n_buckets).astype(np.int64)
            return pa_from_pandas(df, preserve_index=False)

        orders_side = read_parquet_auto(
            f"{sf_dir}/orders.parquet", columns=orders_cols
        ).map_batches(order_partials, batch_format="pyarrow")
        cust_side = read_parquet_auto(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(cust_rows, batch_format="pyarrow")

        def bucket_join(group: pd.DataFrame) -> pa.Table:
            dim = group[group["kind"] == 1]
            fact = group[group["kind"] == 0]
            if fact.empty:
                return pa.table(
                    {
                        "n_name": pa.array([], type=pa.string()),
                        "yr": pa.array([], type=pa.int64()),
                        "rev_c": pa.array([], type=pa.int64()),
                    }
                )
            nk = fact["custkey"].map(
                pd.Series(
                    dim["nationkey"].to_numpy(), index=dim["custkey"].to_numpy()
                )
            )
            names = nk.map(ray.get(name_ref))
            agg = (
                pd.DataFrame(
                    {
                        "n_name": names,
                        "yr": fact["yr"].to_numpy(),
                        "rev_c": fact["rev_c"].to_numpy(),
                    }
                )
                .groupby(["n_name", "yr"], sort=False)["rev_c"]
                .sum()
                .reset_index()
            )
            return pa_from_pandas(agg, preserve_index=False)

        base = (
            orders_side.union(cust_side)
            .groupby("bucket")
            .map_groups(bucket_join, batch_format="pandas")
            .groupby(["n_name", "yr"])
            .aggregate(Sum("rev_c", alias_name="rev_c"))
        )

    return base


def _levels_to_dataset(frames: "list[pd.DataFrame]") -> "ray.data.Dataset":
    out = pd.concat(frames, ignore_index=True)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_name": pa.array(out["n_name"], type=pa.string()),
                "yr": pa.array(out["yr"].to_numpy(np.int64)),
                "rev_cents": pa.array(out["rev_c"].to_numpy(np.int64)),
            }
        )
    )


def revenue_rollup(
    sf_dir: str,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP (nation, year) over order revenue — the
    subtotal/grand-total warehouse shape: one row per (nation, year),
    one per-nation subtotal row (yr = 0 sentinel) and one grand-total
    row (n_name = 'ALL', yr = 0); integer cents throughout so every
    level is bit-exact vs DuckDB's ``GROUP BY ROLLUP``.

    The rollup levels are derived FROM the base aggregate, which is
    bounded by |nations| × |years| (hundreds of rows at any corpus
    scale), so the driver-side subtotal expansion is safe by
    construction — the fact table is never re-scanned per level."""
    bdf = _nation_year_revenue_base(
        sf_dir, broadcast_limit, n_buckets
    ).to_pandas()
    nation_sub = (
        bdf.groupby("n_name", sort=False)["rev_c"].sum().reset_index()
    )
    nation_sub["yr"] = np.int64(0)
    grand = pd.DataFrame(
        {"n_name": ["ALL"], "yr": np.int64(0), "rev_c": [bdf["rev_c"].sum()]}
    )
    return _levels_to_dataset(
        [bdf[["n_name", "yr", "rev_c"]],
         nation_sub[["n_name", "yr", "rev_c"]], grand]
    )


def revenue_cube(
    sf_dir: str,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """GROUP BY CUBE (nation, year): ROLLUP's levels plus the per-YEAR
    subtotal rows (n_name = 'ALL', yr = <year>) — all four grouping
    sets, same sentinels, same bounded-base derivation."""
    bdf = _nation_year_revenue_base(
        sf_dir, broadcast_limit, n_buckets
    ).to_pandas()
    nation_sub = (
        bdf.groupby("n_name", sort=False)["rev_c"].sum().reset_index()
    )
    nation_sub["yr"] = np.int64(0)
    year_sub = bdf.groupby("yr", sort=False)["rev_c"].sum().reset_index()
    year_sub["n_name"] = "ALL"
    grand = pd.DataFrame(
        {"n_name": ["ALL"], "yr": np.int64(0), "rev_c": [bdf["rev_c"].sum()]}
    )
    return _levels_to_dataset(
        [bdf[["n_name", "yr", "rev_c"]],
         nation_sub[["n_name", "yr", "rev_c"]],
         year_sub[["n_name", "yr", "rev_c"]], grand]
    )


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(n_name, 'ALL') AS n_name,
       CAST(COALESCE(yr, 0) AS BIGINT) AS yr,
       CAST(sum(cents) AS BIGINT) AS rev_cents
FROM (
  SELECT n.n_name,
         year(o.o_orderdate) AS yr,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
) GROUP BY ROLLUP (n_name, yr)
"""


REVENUE_CUBE_SQL = """
SELECT COALESCE(n_name, 'ALL') AS n_name,
       CAST(COALESCE(yr, 0) AS BIGINT) AS yr,
       CAST(sum(cents) AS BIGINT) AS rev_cents
FROM (
  SELECT n.n_name,
         year(o.o_orderdate) AS yr,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
) GROUP BY CUBE (n_name, yr)
"""
