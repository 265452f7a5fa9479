"""Statistical aggregates the reference's analytics surface lacks but a
warehouse user expects: grouped Pearson correlation / covariance from
exact integer moment sums, a MODE (most-frequent-value) aggregate with
deterministic ties, and a per-key ordered ROWS-window moving sum.

Bit-exact-oracle design note (the repo-wide rule, see BASELINE.md): float
outputs are computed from EXACT integer sums with the SAME IEEE-double
expression, in the same operation order, as the SQL twin — so the
driver's value hash matches bit-for-bit no matter how either engine
ordered its partial aggregation tree.  All moment sums here stay below
2^53 at the tested scales (quantity ≤ 50, discount-hundredths ≤ 10,
value-cents bounded); at larger scale the int64 partials still hold
(≪ 2^63) and the final int→double conversions stay exact while
n·Σx² < 2^53 — document-and-chunk beyond that.

Scale shape: every operator is one bounded-bucket shuffle (partial
aggregation inside ``map_batches`` first), or a size-guarded driver fast
path below a parquet-metadata row cap (the ~3 s fixed Sort-barrier lesson
from BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas

__all__ = [
    "qty_discount_stats",
    "nation_mode_priority",
    "user_value_moving_sum",
    "order_price_median_by_priority",
    "order_price_histogram",
]


# ---------------------------------------------------------------------------
# grouped Pearson correlation / covariance / stddev from exact integer sums


def _finalize_stats(batch: pa.Table) -> pa.Table:
    """Shared float finalization — one expression, used verbatim on the
    merged sums, mirroring QTY_DISCOUNT_STATS_SQL term for term."""
    n = np.asarray(batch["n"]).astype(np.int64)
    sx = np.asarray(batch["sx"]).astype(np.int64)
    sy = np.asarray(batch["sy"]).astype(np.int64)
    sxy = np.asarray(batch["sxy"]).astype(np.int64)
    sxx = np.asarray(batch["sxx"]).astype(np.int64)
    syy = np.asarray(batch["syy"]).astype(np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    dx = np.sqrt((n * sxx - sx * sx).astype(np.float64))
    dy = np.sqrt((n * syy - sy * sy).astype(np.float64))
    nd = n.astype(np.float64)
    return pa.table(
        {
            "l_returnflag": batch["l_returnflag"],
            "n": pa.array(n),
            "corr_qd": pa.array(num / (dx * dy)),
            "covar_pop_qd": pa.array(num / (n * n).astype(np.float64)),
            "stddev_pop_q": pa.array(dx / nd),
        }
    )


def qty_discount_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per ``l_returnflag``: Pearson correlation, population covariance and
    population stddev of (quantity, discount-in-hundredths).

    One pass computes the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) as
    int64 partials inside ``map_batches``; the shuffle carries ≤ 3 rows per
    block.  The float statistics are derived once at the end from the
    exact integer sums (formula identical to the SQL twin), so the result
    is independent of batch boundaries and aggregation order."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        q = np.round(np.asarray(batch["l_quantity"])).astype(np.int64)
        d = np.round(np.asarray(batch["l_discount"]) * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "sx": pa.array(q),
                "sy": pa.array(d),
                "sxy": pa.array(q * d),
                "sxx": pa.array(q * q),
                "syy": pa.array(d * d),
            }
        )

    # partials are ≤ |distinct flags| rows per block — the driver merge
    # always applies, skipping the fixed Sort barrier (BASELINE.md)
    sums = bucketed_group_sum(
        ds.map_batches(moments, batch_format="pyarrow"),
        keys=["l_returnflag"],
        sum_cols={c: c for c in ["sx", "sy", "sxy", "sxx", "syy"]},
        count_col="n",
        driver_cap=2_000_000,
    )
    return sums.map_batches(_finalize_stats, batch_format="pyarrow")


QTY_DISCOUNT_STATS_SQL = """
WITH u AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         count(*)::BIGINT AS n,
         sum(q)::BIGINT AS sx, sum(d)::BIGINT AS sy,
         sum(q * d)::BIGINT AS sxy,
         sum(q * q)::BIGINT AS sxx, sum(d * d)::BIGINT AS syy
  FROM u GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (n*sxy - sx*sy)::DOUBLE
    / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)) AS corr_qd,
  (n*sxy - sx*sy)::DOUBLE / ((n*n)::DOUBLE) AS covar_pop_qd,
  sqrt((n*sxx - sx*sx)::DOUBLE) / (n::DOUBLE) AS stddev_pop_q
FROM s
"""


# ---------------------------------------------------------------------------
# MODE aggregate: most frequent order priority per customer nation


def nation_mode_priority(
    sf_dir: str, n_buckets: int = 16, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """MODE (most-frequent-value) aggregate with deterministic ties: per
    customer nation, the most common order priority (ties broken by the
    lexicographically smallest priority), plus its count.

    Below ``broadcast_limit`` (parquet-metadata row probe) the
    custkey→nation mapping is built once on the driver and shipped via
    ``ray.put`` — read by every task, never re-serialized per batch.
    Above it, the counts partials and the customer dim hash-bucket by
    custkey and join inside each bucket (no broadcast anywhere).  Both
    plans end in ONE bucketed shuffle keyed by nation alone, whose merge
    both sums the partial counts AND picks the mode — the per-nation
    argmax needs all of that nation's priorities in one place, which
    bucketing by (nation) guarantees; a ``groupby`` by (nation, priority)
    would need a second shuffle to pick the winner."""
    import pyarrow.parquet as pq
    import zlib

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey2name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    def pick_mode(group: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            group.groupby(["n_name", "o_orderpriority"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        cnt = cnt.sort_values(
            ["n_name", "cnt", "o_orderpriority"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = cnt.drop_duplicates("n_name", keep="first")
        return pd.DataFrame(
            {
                "n_name": top["n_name"].to_numpy(),
                "mode_priority": top["o_orderpriority"].to_numpy(),
                "n_orders": top["cnt"].to_numpy().astype(np.int64),
            }
        )

    def bucket_by_nation(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = np.fromiter(
            (
                zlib.crc32(s.encode("utf-8")) % n_buckets
                for s in df["n_name"].astype(str)
            ),
            dtype=np.int64,
            count=len(df),
        )
        return df

    if parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_limit:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        ckeys = np.asarray(cust["c_custkey"]).astype(np.int64)
        order_idx = np.argsort(ckeys, kind="stable")
        names = np.array(
            [nkey2name[int(k)] for k in np.asarray(cust["c_nationkey"])],
            dtype=object,
        )
        ref = ray.put((ckeys[order_idx], names[order_idx]))

        def partial(batch: pa.Table) -> pa.Table:
            skeys, snames = ray.get(ref)
            ck = np.asarray(batch["o_custkey"]).astype(np.int64)
            pos = np.searchsorted(skeys, ck)
            df = pd.DataFrame(
                {
                    "n_name": snames[pos],
                    "o_orderpriority": np.asarray(batch["o_orderpriority"]),
                }
            )
            agg = (
                df.groupby(["n_name", "o_orderpriority"], sort=False)
                .size()
                .rename("cnt")
                .reset_index()
            )
            return pa_from_pandas(bucket_by_nation(agg), preserve_index=False)

        parts = orders.map_batches(partial, batch_format="pyarrow")
        return parts.groupby("bucket").map_groups(pick_mode, batch_format="pandas")

    # distributed fallback: bucketed hash join by custkey, then the same
    # nation-bucketed mode merge (no driver state, no broadcast)
    def order_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": np.asarray(batch["o_custkey"]).astype(np.int64),
                "o_orderpriority": np.asarray(batch["o_orderpriority"]),
            }
        )
        agg = (
            df.groupby(["o_custkey", "o_orderpriority"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        agg["kind"] = np.int64(0)
        agg["c_nationkey"] = np.int64(-1)
        agg["bucket"] = agg["o_custkey"].to_numpy() % np.int64(n_buckets)
        return pa_from_pandas(agg, preserve_index=False)

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["c_custkey"]).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_custkey": ck,
                "o_orderpriority": "",
                "cnt": np.int64(0),
                "kind": np.int64(1),
                "c_nationkey": np.asarray(batch["c_nationkey"]).astype(np.int64),
                "bucket": ck % np.int64(n_buckets),
            }
        )
        return pa_from_pandas(df, preserve_index=False)

    o = orders.map_batches(order_partial, batch_format="pyarrow")
    c = read_parquet_auto(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_partial, batch_format="pyarrow")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        dim = group[group["kind"] == 1]
        fact = group[group["kind"] == 0]
        m = fact.merge(
            dim[["o_custkey", "c_nationkey"]], on="o_custkey", suffixes=("", "_d")
        )
        m["n_name"] = m["c_nationkey_d"].map(
            lambda k: nkey2name[int(k)]
        )  # 25-entry dict: closure-captured, trivially serialized
        agg = (
            m.groupby(["n_name", "o_orderpriority"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        return bucket_by_nation(agg)

    joined = (
        o.union(c).groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    )
    return joined.groupby("bucket").map_groups(pick_mode, batch_format="pandas")


NATION_MODE_PRIORITY_SQL = """
SELECT n_name, o_orderpriority AS mode_priority, cnt AS n_orders FROM (
  SELECT n_name, o_orderpriority, count(*)::BIGINT AS cnt,
         row_number() OVER (
           PARTITION BY n_name ORDER BY count(*) DESC, o_orderpriority
         ) AS rn
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name, o_orderpriority
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# per-key ordered ROWS window: 3-row moving sum of event value cents


def user_value_moving_sum(
    sf_dir: str,
    window_rows: int = 3,
    n_buckets: int = 32,
    driver_cap: int | None = 2_000_000,
) -> "ray.data.Dataset":
    """Per-user ordered ROWS window (the moving-average shape): for every
    event, the sum of value cents over that user's last ``window_rows``
    events ordered by (ts, event_id), plus the actual window length —
    ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``.  Integer outputs →
    bit-exact vs the SQL twin.

    Same size-guarded hybrid as ``customer_order_window``: below the
    parquet-metadata row cap one driver pandas pass computes every window
    (skipping the fixed Sort barrier); above it, users hash-bucket and
    each bucket runs the identical vectorized kernel (one sort, one
    cumsum, windows by index arithmetic — no per-row Python)."""
    import pyarrow.parquet as pq

    cols = ["event_id", "user_id", "ts", "value"]

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        uid = df["user_id"].to_numpy()
        n = len(df)
        cs = np.concatenate([[np.int64(0)], np.cumsum(cents)])
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1] if n else np.array([], dtype=np.int64)
        seg_len = np.diff(np.r_[starts, n])
        grp_start = np.repeat(starts, seg_len) if n else np.array([], dtype=np.int64)
        pos = np.arange(n) - grp_start
        k = np.minimum(pos + 1, window_rows).astype(np.int64)
        idx = np.arange(1, n + 1)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy().astype(np.int64),
                "user_id": uid.astype(np.int64),
                "mov_cents": (cs[idx] - cs[idx - k]).astype(np.int64),
                "n_win": k,
            }
        )

    if driver_cap is not None:
        pf = pq.ParquetFile(f"{sf_dir}/events.parquet")
        if pf.metadata.num_rows <= driver_cap:
            df = pf.read(columns=cols).to_pandas()
            return ray.data.from_arrow(
                pa_from_pandas(windows(df), preserve_index=False)
            )

    ds = read_parquet_auto(f"{sf_dir}/events.parquet", columns=cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch["user_id"]).astype(np.int64)
        return batch.append_column("bucket", pa.array(uid % np.int64(n_buckets)))

    # windows() projects an explicit column set, so the bucket column
    # never reaches the output
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


USER_VALUE_MOVING_SUM_SQL = """
SELECT event_id, user_id,
  CAST(sum(cents) OVER w AS BIGINT) AS mov_cents,
  CAST(count(*) OVER w AS BIGINT) AS n_win
FROM (
  SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
"""


# ---------------------------------------------------------------------------
# exact grouped median over an UNBOUNDED integer domain (histogram refinement)


def order_price_median_by_priority(
    sf_dir: str, coarse_shift: int = 16
) -> "ray.data.Dataset":
    """EXACT median order price (cents) per priority over an unbounded
    value domain — the complement of ``doc_length_quantiles`` (which
    relies on a bounded histogram): two aggregate-only passes, no value
    collection anywhere.

    Pass 1 histograms ``cents >> coarse_shift`` per priority (a shuffle
    of ≤ groups × 2^(bits-shift) count rows); the cumulative counts
    locate, for each group, the coarse bin holding the median and the
    median's rank offset inside it.  Pass 2 histograms EXACT cents but
    only for rows inside each group's selected bin — by construction at
    most 2^coarse_shift distinct values per group, so the second shuffle
    is bounded no matter how large or skewed the data — and the order
    statistic falls out of the refined cumulative counts.  Both
    per-group final scans run over sketch-sized histograms on the
    driver (same convention as ``doc_length_quantiles``).  Median = the
    lower middle (rank ``(n+1)//2``), an integer — no interpolation, no
    float drift."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def coarse(batch: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(batch["o_totalprice"]) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "pr": np.asarray(batch["o_orderpriority"]),
                "bin": cents >> coarse_shift,
            }
        )
        return pa_from_pandas(df, preserve_index=False)

    hist1 = bucketed_group_sum(
        ds.map_batches(coarse, batch_format="pyarrow"),
        keys=["pr", "bin"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    targets: dict[str, tuple[int, int]] = {}
    for pr, sub in hist1.groupby("pr", sort=False):
        sub = sub.sort_values("bin")
        cum = sub["cnt"].to_numpy().cumsum()
        k = (int(cum[-1]) + 1) // 2
        i = int(np.searchsorted(cum, k))
        before = int(cum[i - 1]) if i else 0
        targets[pr] = (int(sub["bin"].to_numpy()[i]), k - before)

    def fine(batch: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(batch["o_totalprice"]) * 100).astype(np.int64)
        pr = np.asarray(batch["o_orderpriority"])
        u, inv = np.unique(pr, return_inverse=True)
        tbin = np.array([targets[p][0] for p in u], dtype=np.int64)[inv]
        keep = (cents >> coarse_shift) == tbin
        df = pd.DataFrame({"pr": pr[keep], "cents": cents[keep]})
        return pa_from_pandas(df, preserve_index=False)

    hist2 = bucketed_group_sum(
        ds.map_batches(fine, batch_format="pyarrow"),
        keys=["pr", "cents"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    rows = []
    for pr, sub in hist2.groupby("pr", sort=False):
        sub = sub.sort_values("cents")
        cum = sub["cnt"].to_numpy().cumsum()
        offset = targets[pr][1]
        j = int(np.searchsorted(cum, offset))
        rows.append((pr, int(sub["cents"].to_numpy()[j])))
    rows.sort()
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array([r[0] for r in rows], type=pa.string()),
                "median_cents": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64)
                ),
            }
        )
    )


ORDER_PRICE_MEDIAN_SQL = """
WITH u AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM u
)
SELECT o_orderpriority, cents AS median_cents
FROM ranked WHERE rn = (n + 1) // 2
"""


def order_price_histogram(
    sf_dir: str,
    bin_width: float = 25_000.0,
    n_bins: int = 24,
    driver_cap: int | None = 200_000,
) -> "ray.data.Dataset":
    """Equi-width histogram of order totals → ``(bin, n)``, zero-filled to
    exactly ``n_bins`` rows (last bin absorbs overflow).  Per-batch
    ``np.bincount`` partials mean the shuffle carries ≤ n_bins ints per
    block regardless of table size.  Bin edges are computed with the SAME
    IEEE-double division on both engines, so placement is bit-identical."""

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy()
        bins = np.minimum(
            np.floor(price / bin_width).astype(np.int64), n_bins - 1
        )
        counts = np.bincount(bins, minlength=n_bins)
        return pa.table(
            {
                "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    ds = read_parquet_auto(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["bin"],
        sum_cols={"n": "n"},
        count_col=None,
        driver_cap=driver_cap,
    )


ORDER_PRICE_HISTOGRAM_SQL = """
WITH binned AS (
  SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 23) AS bin
  FROM orders
)
SELECT g.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM (SELECT unnest(range(24)) AS bin) g
LEFT JOIN (SELECT bin, count(*) AS n FROM binned GROUP BY bin) c
  ON g.bin = c.bin
"""


def order_price_quantile_by_priority(
    sf_dir: str,
    q_num: int = 9,
    q_den: int = 10,
    coarse_shift: int = 16,
) -> "ray.data.Dataset":
    """EXACT grouped order statistic at rank ``ceil(q·n)`` (default p90)
    per priority — :func:`order_price_median_by_priority` generalized to
    an arbitrary rational quantile; same two aggregate-only histogram
    passes (coarse bin locate → exact refine inside the one selected
    bin), the value at rank ``(q_num·n + q_den − 1) // q_den`` under
    ascending ``cents`` — an integer, discrete-quantile semantics, no
    interpolation."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def coarse(batch: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(batch["o_totalprice"]) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "pr": np.asarray(batch["o_orderpriority"]),
                "bin": cents >> coarse_shift,
            }
        )
        return pa_from_pandas(df, preserve_index=False)

    hist1 = bucketed_group_sum(
        ds.map_batches(coarse, batch_format="pyarrow"),
        keys=["pr", "bin"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    targets: dict[str, tuple[int, int]] = {}
    for pr, sub in hist1.groupby("pr", sort=False):
        sub = sub.sort_values("bin")
        cum = sub["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        k = (q_num * n + q_den - 1) // q_den  # rank = ceil(q*n), 1-based
        i = int(np.searchsorted(cum, k))
        before = int(cum[i - 1]) if i else 0
        targets[pr] = (int(sub["bin"].to_numpy()[i]), k - before)

    def fine(batch: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(batch["o_totalprice"]) * 100).astype(np.int64)
        pr = np.asarray(batch["o_orderpriority"])
        u, inv = np.unique(pr, return_inverse=True)
        tbin = np.array([targets[p][0] for p in u], dtype=np.int64)[inv]
        keep = (cents >> coarse_shift) == tbin
        df = pd.DataFrame({"pr": pr[keep], "cents": cents[keep]})
        return pa_from_pandas(df, preserve_index=False)

    hist2 = bucketed_group_sum(
        ds.map_batches(fine, batch_format="pyarrow"),
        keys=["pr", "cents"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    rows = []
    for pr, sub in hist2.groupby("pr", sort=False):
        sub = sub.sort_values("cents")
        cum = sub["cnt"].to_numpy().cumsum()
        offset = targets[pr][1]
        j = int(np.searchsorted(cum, offset))
        rows.append((pr, int(sub["cents"].to_numpy()[j])))
    rows.sort()
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array([r[0] for r in rows], type=pa.string()),
                "p90_cents": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64)
                ),
            }
        )
    )


ORDER_PRICE_P90_SQL = """
WITH u AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM u
)
SELECT o_orderpriority, cents AS p90_cents
FROM ranked WHERE rn = (9 * n + 9) // 10
"""


def _grouped_median_value(
    ds: "ray.data.Dataset",
    value_of,
    key_col: str,
    coarse_shift: int,
) -> dict[str, int]:
    """Exact per-group median of ``value_of(batch) -> int64 ndarray`` via
    the two-pass histogram refinement (see ``order_price_median_by_priority``
    for the plan); returns {group: median}.  Values must be >= 0 so the
    coarse ``>> shift`` binning is order-preserving."""

    def coarse(batch: pa.Table) -> pa.Table:
        v = value_of(batch)
        return pa_from_pandas(
            pd.DataFrame(
                {"g": np.asarray(batch[key_col]), "bin": v >> coarse_shift}
            ),
            preserve_index=False,
        )

    hist1 = bucketed_group_sum(
        ds.map_batches(coarse, batch_format="pyarrow"),
        keys=["g", "bin"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    targets: dict[str, tuple[int, int]] = {}
    for g, sub in hist1.groupby("g", sort=False):
        sub = sub.sort_values("bin")
        cum = sub["cnt"].to_numpy().cumsum()
        k = (int(cum[-1]) + 1) // 2
        i = int(np.searchsorted(cum, k))
        before = int(cum[i - 1]) if i else 0
        targets[g] = (int(sub["bin"].to_numpy()[i]), k - before)

    def fine(batch: pa.Table) -> pa.Table:
        v = value_of(batch)
        g = np.asarray(batch[key_col])
        u, inv = np.unique(g, return_inverse=True)
        tbin = np.array([targets[p][0] for p in u], dtype=np.int64)[inv]
        keep = (v >> coarse_shift) == tbin
        return pa_from_pandas(
            pd.DataFrame({"g": g[keep], "v": v[keep]}), preserve_index=False
        )

    hist2 = bucketed_group_sum(
        ds.map_batches(fine, batch_format="pyarrow"),
        keys=["g", "v"],
        count_col="cnt",
        driver_cap=2_000_000,
    ).to_pandas()

    out: dict[str, int] = {}
    for g, sub in hist2.groupby("g", sort=False):
        sub = sub.sort_values("v")
        cum = sub["cnt"].to_numpy().cumsum()
        j = int(np.searchsorted(cum, targets[g][1]))
        out[g] = int(sub["v"].to_numpy()[j])
    return out


def order_price_mad_by_priority(
    sf_dir: str, coarse_shift: int = 16
) -> "ray.data.Dataset":
    """Robust statistics: EXACT median absolute deviation (and the median
    it centers on) of the order price per priority →
    ``(o_orderpriority, median_cents, mad_cents)``.

    Four aggregate-only passes, each a bounded histogram exchange — the
    chained form of the two-pass refinement: passes 1-2 find each group's
    median (``_grouped_median_value``); the group→median dict (bounded by
    the priority vocabulary) closes over the second run, which histograms
    ``|cents − median_g|`` — again >= 0, so the same machinery applies
    unchanged.  MAD is an integer order statistic (lower-middle rank), so
    the window-function twin is hash-exact."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    from ner_funtool_ray.pipelines.relational import cents_np

    def cents_of(batch: pa.Table) -> np.ndarray:
        return cents_np(np.asarray(batch["o_totalprice"]))

    med = _grouped_median_value(ds, cents_of, "o_orderpriority", coarse_shift)

    def dev_of(batch: pa.Table) -> np.ndarray:
        g = np.asarray(batch["o_orderpriority"])
        u, inv = np.unique(g, return_inverse=True)
        m = np.array([med[p] for p in u], dtype=np.int64)[inv]
        return np.abs(cents_of(batch) - m)

    mad = _grouped_median_value(ds, dev_of, "o_orderpriority", coarse_shift)
    keys = sorted(med)
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(keys, type=pa.string()),
                "median_cents": pa.array(
                    np.array([med[k] for k in keys], dtype=np.int64)
                ),
                "mad_cents": pa.array(
                    np.array([mad[k] for k in keys], dtype=np.int64)
                ),
            }
        )
    )


ORDER_PRICE_MAD_SQL = """
WITH u AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM u
), med AS (
  SELECT o_orderpriority, cents AS median_cents
  FROM ranked WHERE rn = (n + 1) // 2
), dev AS (
  SELECT u.o_orderpriority, m.median_cents,
         abs(u.cents - m.median_cents) AS d
  FROM u JOIN med m USING (o_orderpriority)
), ranked2 AS (
  SELECT o_orderpriority, median_cents, d,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM dev
)
SELECT o_orderpriority, median_cents, d AS mad_cents
FROM ranked2 WHERE rn = (n + 1) // 2
"""


__all__ += [
    "order_price_mad_by_priority",
    "ORDER_PRICE_MAD_SQL",
]


def _grouped_weighted_median(
    ds: "ray.data.Dataset",
    value_of,
    weight_of,
    key_col: str,
    coarse_shift: int,
) -> dict[str, int]:
    """Weighted generalization of ``_grouped_median_value``: the smallest
    value whose cumulative WEIGHT reaches ``(Σw+1)//2`` per group — the
    same two aggregate-only histogram passes, with weights summed instead
    of rows counted.  Values and weights must be >= 0 int64."""

    def coarse(batch: pa.Table) -> pa.Table:
        v = value_of(batch)
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "g": np.asarray(batch[key_col]),
                    "bin": v >> coarse_shift,
                    "w": weight_of(batch),
                }
            ),
            preserve_index=False,
        )

    hist1 = bucketed_group_sum(
        ds.map_batches(coarse, batch_format="pyarrow"),
        keys=["g", "bin"],
        sum_cols={"w": "w"},
        count_col=None,
        driver_cap=2_000_000,
    ).to_pandas()

    targets: dict[str, tuple[int, int]] = {}
    for g, sub in hist1.groupby("g", sort=False):
        sub = sub.sort_values("bin")
        cum = sub["w"].to_numpy().cumsum()
        k = (int(cum[-1]) + 1) // 2
        i = int(np.searchsorted(cum, k))
        before = int(cum[i - 1]) if i else 0
        targets[g] = (int(sub["bin"].to_numpy()[i]), k - before)

    def fine(batch: pa.Table) -> pa.Table:
        v = value_of(batch)
        g = np.asarray(batch[key_col])
        u, inv = np.unique(g, return_inverse=True)
        tbin = np.array([targets[p][0] for p in u], dtype=np.int64)[inv]
        keep = (v >> coarse_shift) == tbin
        return pa_from_pandas(
            pd.DataFrame(
                {"g": g[keep], "v": v[keep], "w": weight_of(batch)[keep]}
            ),
            preserve_index=False,
        )

    hist2 = bucketed_group_sum(
        ds.map_batches(fine, batch_format="pyarrow"),
        keys=["g", "v"],
        sum_cols={"w": "w"},
        count_col=None,
        driver_cap=2_000_000,
    ).to_pandas()

    out: dict[str, int] = {}
    for g, sub in hist2.groupby("g", sort=False):
        sub = sub.sort_values("v")
        cum = sub["w"].to_numpy().cumsum()
        j = int(np.searchsorted(cum, targets[g][1]))
        out[g] = int(sub["v"].to_numpy()[j])
    return out


def lineitem_weighted_median_price(
    sf_dir: str, coarse_shift: int = 16
) -> "ray.data.Dataset":
    """Quantity-weighted EXACT median line price per return flag →
    ``(l_returnflag, wmedian_cents, total_qc)``: the smallest price whose
    cumulative shipped QUANTITY reaches half the flag's total — the
    inventory-weighted percentile a pricing analyst asks for (a plain
    median over lines would weight a 1-unit line equally with a 50-unit
    line).

    Two aggregate-only histogram passes (weights ride the same bounded
    exchanges as the counts did); quantity is centi-units int64, so the
    cumulative-window twin is hash-exact."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    from ner_funtool_ray.pipelines.relational import cents_np

    def cents_of(batch: pa.Table) -> np.ndarray:
        return cents_np(np.asarray(batch["l_extendedprice"]))

    def qc_of(batch: pa.Table) -> np.ndarray:
        return cents_np(np.asarray(batch["l_quantity"]))

    med = _grouped_weighted_median(
        ds, cents_of, qc_of, "l_returnflag", coarse_shift
    )

    def tot_partial(batch: pa.Table) -> pa.Table:
        return pa_from_pandas(
            pd.DataFrame(
                {"g": np.asarray(batch["l_returnflag"]), "w": qc_of(batch)}
            )
            .groupby("g", sort=False)
            .sum()
            .reset_index(),
            preserve_index=False,
        )

    tot = (
        ds.map_batches(tot_partial, batch_format="pyarrow")
        .to_pandas()  # flag-vocabulary-bounded
        .groupby("g", sort=True)["w"]
        .sum()
    )
    keys = sorted(med)
    return ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(keys, type=pa.string()),
                "wmedian_cents": pa.array(
                    np.array([med[k] for k in keys], dtype=np.int64)
                ),
                "total_qc": pa.array(
                    np.array([int(tot[k]) for k in keys], dtype=np.int64)
                ),
            }
        )
    )


LINEITEM_WEIGHTED_MEDIAN_SQL = """
WITH u AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem
), pv AS (
  SELECT l_returnflag, cents, sum(qc) AS w
  FROM u GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, cents, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag,
       min(cents) AS wmedian_cents,
       CAST(min(tot) AS BIGINT) AS total_qc
FROM c
WHERE cum >= (tot + 1) // 2
GROUP BY l_returnflag
"""


__all__ += [
    "lineitem_weighted_median_price",
    "LINEITEM_WEIGHTED_MEDIAN_SQL",
]


def part_price_qty_slope(sf_dir: str) -> "ray.data.Dataset":
    """Grouped least-squares regression → ``(l_partkey, n, slope_num,
    slope_den, slope)``: per part, the OLS slope of line price (cents)
    against quantity (centi-units) assembled ENTIRELY from exact integer
    moments — ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``.

    The five moments are per-batch int64 partials riding one bounded
    exchange (`bucketed_group_sum`; output is catalog-sized); the
    numerator/denominator cross-products are assembled per part in
    Python big ints (HUGEINT in the twin — n²·Σxy can exceed int64), and
    the one float division at the edge is the identical IEEE op on both
    engines, so even the ``slope`` double hash-matches.  Parts whose
    quantities never vary (den = 0) or with n < 2 are excluded on both
    engines."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        from ner_funtool_ray.pipelines.relational import cents_np

        x = cents_np(np.asarray(batch["l_quantity"]))
        y = cents_np(np.asarray(batch["l_extendedprice"]))
        df = pd.DataFrame(
            {
                "l_partkey": np.asarray(batch["l_partkey"]).astype(np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        g = (
            df.groupby("l_partkey", sort=False)
            .agg(
                n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
                sxy=("sxy", "sum"), sxx=("sxx", "sum"),
            )
            .reset_index()
        )
        return pa_from_pandas(g, preserve_index=False)

    agg = bucketed_group_sum(
        ds.map_batches(moments, batch_format="pyarrow"),
        keys=["l_partkey"],
        sum_cols={"n": "n", "sx": "sx", "sy": "sy", "sxy": "sxy",
                  "sxx": "sxx"},
        count_col=None,
        driver_cap=2_000_000,
    ).to_pandas()  # catalog-bounded

    rows = []
    for r in agg.itertuples():
        n, sx, sy, sxy, sxx = (
            int(r.n), int(r.sx), int(r.sy), int(r.sxy), int(r.sxx)
        )
        num = n * sxy - sx * sy  # python ints: exact at any magnitude
        den = n * sxx - sx * sx
        if n >= 2 and den != 0:
            # float(num)/float(den), not num/den: SQL rounds BOTH ints to
            # double BEFORE dividing; Python's int/int true division
            # rounds the exact rational — they differ past 2^53
            rows.append((int(r.l_partkey), n, num, den, float(num) / float(den)))
    rows.sort()
    return ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
                "n": pa.array([r[1] for r in rows], type=pa.int64()),
                "slope_num": pa.array([r[2] for r in rows], type=pa.int64()),
                "slope_den": pa.array([r[3] for r in rows], type=pa.int64()),
                "slope": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )
    )


PART_PRICE_QTY_SLOPE_SQL = """
WITH u AS (
  SELECT l_partkey,
         CAST(round(l_quantity*100) AS HUGEINT) AS x,
         CAST(round(l_extendedprice*100) AS HUGEINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
  FROM u GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(n AS BIGINT) AS n,
       CAST(n*sxy - sx*sy AS BIGINT) AS slope_num,
       CAST(n*sxx - sx*sx AS BIGINT) AS slope_den,
       CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
         AS slope
FROM m
WHERE n >= 2 AND n*sxx - sx*sx != 0
"""


__all__ += ["part_price_qty_slope", "PART_PRICE_QTY_SLOPE_SQL"]


def orders_above_p99(
    sf_dir: str, q_num: int = 99, q_den: int = 100
) -> "ray.data.Dataset":
    """Quantile join-back (tail-anomaly filter) →
    ``(o_orderpriority, p99_cents, n_above)``: each priority's EXACT p99
    price and how many of its orders lie STRICTLY above it — the
    fan-out pattern where a computed quantile feeds back into a filter
    over the same table.

    Pass 1-2: the rank-parameterized two-pass histogram refinement
    (`order_price_quantile_by_priority`) yields the per-group threshold —
    group-vocabulary-sized, so it broadcasts as a dict; pass 3 streams
    the table once more with a vectorized threshold probe and
    group-bounded count partials.  All integers, hash-exact."""
    thr = {
        r.o_orderpriority: int(r.p90_cents)
        for r in order_price_quantile_by_priority(
            sf_dir, q_num=q_num, q_den=q_den
        )
        .to_pandas()
        .itertuples()
    }

    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    from ner_funtool_ray.pipelines.relational import cents_np

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch["o_orderpriority"])
        cents = cents_np(np.asarray(batch["o_totalprice"]))
        u, inv = np.unique(g, return_inverse=True)
        t = np.array([thr[p] for p in u], dtype=np.int64)[inv]
        above = cents > t
        df = (
            pd.DataFrame({"o_orderpriority": g, "n_above": above.astype(np.int64)})
            .groupby("o_orderpriority", sort=False)["n_above"]
            .sum()
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # priority-vocabulary bounded
        .groupby("o_orderpriority", sort=True)["n_above"]
        .sum()
    )
    keys = sorted(thr)
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(keys, type=pa.string()),
                "p99_cents": pa.array(
                    np.array([thr[k] for k in keys], dtype=np.int64)
                ),
                "n_above": pa.array(
                    np.array([int(counts[k]) for k in keys], dtype=np.int64)
                ),
            }
        )
    )


ORDERS_ABOVE_P99_SQL = """
WITH u AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM u
), thr AS (
  SELECT o_orderpriority, cents AS p99_cents
  FROM ranked WHERE rn = (99 * n + 100 - 1) // 100
)
SELECT t.o_orderpriority, t.p99_cents,
       CAST(sum(CASE WHEN u.cents > t.p99_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above
FROM u JOIN thr t USING (o_orderpriority)
GROUP BY t.o_orderpriority, t.p99_cents
"""


__all__ += ["orders_above_p99", "ORDERS_ABOVE_P99_SQL"]
