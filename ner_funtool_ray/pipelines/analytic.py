"""Warehouse-analytic operators over the TPC-H-shaped tables.

Beyond-reference ops alongside the SURVEY.md §2.5/§2.6/§2.8/§2.9 families
(the reference's own join surface is broadcast dict lookups,
`bert_data_utils.py`); these are the remaining warehouse shapes a 100 TB
corpus pipeline needs:

- conditional aggregate across a fact-fact join (TPC-H Q12 shape),
- HAVING-filtered group-then-join-back (TPC-H Q18 shape),
- per-group window functions — row_number / running sum / lag (§2.9
  streaming-shaped family, same hash-bucket design as ``user_sessions``),
- grouped COUNT DISTINCT (two-level: per-batch distinct pairs ride the
  shuffle, never raw fact rows),
- RE2 regexp extraction over documents (§2.8 scalar family — pyarrow and
  DuckDB both compile RE2, so the twin is semantics-identical).

Every query has a bit-exact DuckDB twin: money as integer cents, counts as
int64, window sums cast to BIGINT in SQL (DuckDB's HUGEINT sum would
otherwise come back as float64 and hash differently).
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

_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def order_priority_linestatus(
    sf_dir: str, n_buckets: int = 32, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """TPC-H Q12 shape — conditional aggregate over an orders⋈lineitem
    join: per line status, how many lines belong to high-priority
    (URGENT/HIGH) vs lower-priority orders.

    Size-guarded plan: at or below ``broadcast_limit`` order rows the
    (orderkey → is_high) pair is broadcast once as two sorted arrays and
    the lineitem fact table streams against them with searchsorted — the
    only shuffle carries one 3-column partial row per (batch, linestatus).
    Above the limit both sides hash-bucket by orderkey and each bucket
    joins vectorized; the lineitem side pre-aggregates to (orderkey,
    linestatus, n) per batch so raw fact rows never shuffle.  Identical
    results (parity-tested with broadcast_limit=0)."""
    import pyarrow.parquet as pq

    def final(partials: "ray.data.Dataset") -> "ray.data.Dataset":
        out = bucketed_group_sum(
            partials,
            ["l_linestatus"],
            sum_cols={
                "high_line_count": "high_line_count",
                "low_line_count": "low_line_count",
            },
            count_col=None,
            driver_cap=2_000_000,
        )
        return out.select_columns(
            ["l_linestatus", "high_line_count", "low_line_count"]
        )

    if parquet_num_rows(f"{sf_dir}/orders.parquet") <= broadcast_limit:
        ot = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        )
        okeys = np.asarray(ot["o_orderkey"]).astype(np.int64)
        order = np.argsort(okeys)
        okeys = okeys[order]
        high = (
            np.asarray(pc.is_in(ot["o_orderpriority"], value_set=pa.array(_HIGH_PRIORITIES)))
            .astype(np.int64)[order]
        )
        side = ray.put((okeys, high))

        def partial(batch: pa.Table) -> pa.Table:
            ks, hi = ray.get(side)
            lk = np.asarray(batch["l_orderkey"]).astype(np.int64)
            idx = np.searchsorted(ks, lk)
            ok = idx < len(ks)
            idx2 = np.minimum(idx, len(ks) - 1)
            hit = ok & (ks[idx2] == lk)  # inner-join semantics
            df = pd.DataFrame(
                {
                    "ls": np.asarray(batch["l_linestatus"])[hit],
                    "high": hi[idx2[hit]],
                }
            )
            agg = df.groupby("ls", sort=False)["high"].agg(["sum", "size"])
            return pa.table(
                {
                    "l_linestatus": pa.array(agg.index, type=pa.string()),
                    "high_line_count": pa.array(
                        agg["sum"].to_numpy(dtype=np.int64)
                    ),
                    "low_line_count": pa.array(
                        (agg["size"] - agg["sum"]).to_numpy(dtype=np.int64)
                    ),
                }
            )

        lines = read_parquet_auto(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linestatus"],
        )
        return final(lines.map_batches(partial, batch_format="pyarrow"))

    # bucketed fallback: both sides shuffle by orderkey hash bucket; the
    # lineitem side is pre-aggregated per batch so the exchange carries
    # (orderkey, linestatus) counts, not raw lines
    def order_rows(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
        hi = (
            np.asarray(pc.is_in(batch["o_orderpriority"], value_set=pa.array(_HIGH_PRIORITIES)))
            .astype(np.int64)
        )
        return pa.table(
            {
                "orderkey": pa.array(ok),
                "ls": pa.array([""] * len(ok), type=pa.string()),
                "n": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "high": pa.array(hi),
                "kind": pa.array(np.ones(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "orderkey": np.asarray(batch["l_orderkey"]).astype(np.int64),
                "ls": np.asarray(batch["l_linestatus"]),
            }
        )
        agg = df.groupby(["orderkey", "ls"], sort=False).size().reset_index(name="n")
        ok = agg["orderkey"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "orderkey": pa.array(ok),
                "ls": pa.array(agg["ls"], type=pa.string()),
                "n": pa.array(agg["n"].to_numpy(dtype=np.int64)),
                "high": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "kind": pa.array(np.zeros(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def join_bucket(group: pd.DataFrame) -> pa.Table:
        o = group[group["kind"] == 1]
        l = group[group["kind"] == 0]
        hi = l["orderkey"].map(
            pd.Series(o["high"].to_numpy(), index=o["orderkey"].to_numpy())
        )
        keep = hi.notna()  # inner-join semantics
        df = pd.DataFrame(
            {"ls": l["ls"][keep], "high": hi[keep].astype(np.int64), "n": l["n"][keep]}
        )
        g = df.groupby("ls", sort=False)
        agg = g.apply(
            lambda d: pd.Series(
                {
                    "high_line_count": int(d.loc[d["high"] == 1, "n"].sum()),
                    "low_line_count": int(d.loc[d["high"] == 0, "n"].sum()),
                }
            ),
        ).reset_index()
        return pa.table(
            {
                "l_linestatus": pa.array(agg["ls"], type=pa.string()),
                "high_line_count": pa.array(
                    agg["high_line_count"].to_numpy(dtype=np.int64)
                ),
                "low_line_count": pa.array(
                    agg["low_line_count"].to_numpy(dtype=np.int64)
                ),
            }
        )

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linestatus"]
    ).map_batches(line_rows, batch_format="pyarrow")
    partials = orders.union(lines).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )
    return final(partials)


ORDER_PRIORITY_LINESTATUS_SQL = """
SELECT l_linestatus,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
    AS high_line_count,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::BIGINT
    AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


def large_volume_customers(
    sf_dir: str,
    qty_threshold: float = 250.0,
    n_buckets: int = 64,
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q18 shape — HAVING-filtered group then join back: orders whose
    total line quantity exceeds ``qty_threshold``, joined back to the order
    header and the customer name.

    Plan: (1) per-order quantity sums via the bucketed partial-sum shuffle
    (raw lines never shuffle — per-batch partials do); (2) the HAVING
    filter leaves the OUTPUT-sized hot set, which is materialized and, at
    or below ``broadcast_limit`` rows, broadcast as sorted arrays so the
    orders table streams against it; (3) customer names attach the same
    way (dimension broadcast below the limit, hash-bucket merge above).
    All three fallbacks are bucketed shuffles keyed by the same hash —
    parity-tested with broadcast_limit=0.

    ``sum_qty`` stays double to match DuckDB's SUM(DOUBLE); quantities are
    small integers so partial-sum order cannot change the value."""
    import pyarrow.parquet as pq

    sums = bucketed_group_sum(
        read_parquet_auto(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        ),
        ["l_orderkey"],
        sum_cols={"sum_qty": "l_quantity"},
        count_col=None,
        n_buckets=n_buckets,
    )

    def having(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["sum_qty"], pa.scalar(qty_threshold)))

    hot = sums.map_batches(having, batch_format="pyarrow").materialize()

    def with_customers(rows: "ray.data.Dataset") -> "ray.data.Dataset":
        n_cust = parquet_num_rows(f"{sf_dir}/customer.parquet")
        if n_cust <= broadcast_limit:
            ct = pq.read_table(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
            )
            ck = np.asarray(ct["c_custkey"]).astype(np.int64)
            order = np.argsort(ck)
            ck = ck[order]
            cn = np.asarray(ct["c_name"])[order]
            side = ray.put((ck, cn))

            def attach(batch: pa.Table) -> pa.Table:
                keys, names = ray.get(side)
                cust = np.asarray(batch["c_custkey"]).astype(np.int64)
                idx = np.searchsorted(keys, cust)
                idx2 = np.minimum(idx, len(keys) - 1)
                hit = (idx < len(keys)) & (keys[idx2] == cust)
                out = batch.filter(pa.array(hit))
                return out.append_column(
                    "c_name", pa.array(names[idx2[hit]], type=pa.string())
                )

            return rows.map_batches(attach, batch_format="pyarrow")

        # bucketed merge: hot-order rows are output-sized; customers bucket
        # by the same custkey hash
        def cust_rows(batch: pa.Table) -> pa.Table:
            ck = np.asarray(batch["c_custkey"]).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": pa.array(ck),
                    "c_name": batch["c_name"],
                    "kind": pa.array(np.ones(len(ck), dtype=np.int8)),
                    "bucket": pa.array(ck % np.int64(n_buckets)),
                }
            )

        def fact_rows(batch: pa.Table) -> pa.Table:
            ck = np.asarray(batch["c_custkey"]).astype(np.int64)
            return batch.append_column(
                "kind", pa.array(np.zeros(len(ck), dtype=np.int8))
            ).append_column("bucket", pa.array(ck % np.int64(n_buckets)))

        cust = read_parquet_auto(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        ).map_batches(cust_rows, batch_format="pyarrow")
        fact = rows.map_batches(fact_rows, batch_format="pyarrow")

        def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
            dim = group[group["kind"] == 1]
            f = group[group["kind"] == 0].copy()
            f["c_name"] = f["c_custkey"].map(
                pd.Series(dim["c_name"].to_numpy(), index=dim["c_custkey"].to_numpy())
            )
            f = f[f["c_name"].notna()]
            return f.drop(columns=["kind", "bucket"])

        # dim side lacks the fact columns; pad for a unionable schema
        pad_cols = ["o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]

        def pad(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            batch = batch.append_column(
                "o_orderkey", pa.array(np.zeros(n, dtype=np.int64))
            )
            batch = batch.append_column(
                "o_orderdate", pa.nulls(n, type=pa.timestamp("us"))
            )
            batch = batch.append_column(
                "o_totalprice", pa.array(np.zeros(n, dtype=np.float64))
            )
            return batch.append_column(
                "sum_qty", pa.array(np.zeros(n, dtype=np.float64))
            )

        def pad_fact(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "c_name", pa.array([""] * batch.num_rows, type=pa.string())
            )

        cols = ["c_custkey", "c_name", *pad_cols, "kind", "bucket"]
        both = (
            cust.map_batches(pad, batch_format="pyarrow")
            .select_columns(cols)
            .union(
                fact.map_batches(pad_fact, batch_format="pyarrow").select_columns(cols)
            )
        )
        joined = both.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas"
        )
        return joined

    n_hot = hot.count()
    if n_hot <= broadcast_limit:
        ht = pa_from_pandas(hot.to_pandas(), preserve_index=False)
        if ht.num_rows == 0 or n_hot == 0:
            empty = pa.table(
                {
                    "c_custkey": pa.array([], type=pa.int64()),
                    "c_name": pa.array([], type=pa.string()),
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "o_orderdate": pa.array([], type=pa.timestamp("us")),
                    "o_totalprice": pa.array([], type=pa.float64()),
                    "sum_qty": pa.array([], type=pa.float64()),
                }
            )
            return ray.data.from_arrow(empty)
        hk = np.asarray(ht["l_orderkey"]).astype(np.int64)
        order = np.argsort(hk)
        hk = hk[order]
        hq = np.asarray(ht["sum_qty"]).astype(np.float64)[order]
        side = ray.put((hk, hq))

        def order_hits(batch: pa.Table) -> pa.Table:
            keys, qty = ray.get(side)
            ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
            idx = np.searchsorted(keys, ok)
            idx2 = np.minimum(idx, len(keys) - 1)
            hit = (idx < len(keys)) & (keys[idx2] == ok)
            out = batch.filter(pa.array(hit))
            return out.append_column(
                "sum_qty", pa.array(qty[idx2[hit]], type=pa.float64())
            )

        rows = read_parquet_auto(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        ).map_batches(order_hits, batch_format="pyarrow")
        rows = rows.rename_columns(
            {"o_custkey": "c_custkey"}
        )
        out = with_customers(rows)
        return out.select_columns(
            ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
        )

    # hot set above the broadcast limit: bucket-join hot↔orders by orderkey
    def hot_rows(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"]).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "c_custkey": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "o_orderdate": pa.nulls(len(ok), type=pa.timestamp("us")),
                "o_totalprice": pa.array(np.zeros(len(ok), dtype=np.float64)),
                "sum_qty": batch["sum_qty"],
                "kind": pa.array(np.ones(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "c_custkey": batch["o_custkey"].cast(pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_totalprice": batch["o_totalprice"],
                "sum_qty": pa.array(np.zeros(len(ok), dtype=np.float64)),
                "kind": pa.array(np.zeros(len(ok), dtype=np.int8)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def join_orders(group: pd.DataFrame) -> pd.DataFrame:
        h = group[group["kind"] == 1]
        o = group[group["kind"] == 0].copy()
        q = o["o_orderkey"].map(
            pd.Series(h["sum_qty"].to_numpy(), index=h["o_orderkey"].to_numpy())
        )
        o = o[q.notna()]
        o["sum_qty"] = q[q.notna()].astype(np.float64)
        return o.drop(columns=["kind", "bucket"])

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(order_rows, batch_format="pyarrow")
    rows = (
        hot.map_batches(hot_rows, batch_format="pyarrow")
        .union(orders)
        .groupby("bucket")
        .map_groups(join_orders, batch_format="pandas")
    )
    out = with_customers(rows)
    return out.select_columns(
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
WITH hot AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM hot
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def customer_order_window(
    sf_dir: str, n_buckets: int = 32, driver_cap: int | None = 2_000_000
) -> "ray.data.Dataset":
    """Per-group window functions (§2.9 streaming-shaped family, same
    hash-bucket design as ``user_sessions``): for every order, its
    row_number within the customer (by orderdate, orderkey), the running
    spend in integer cents, and the gap in days since the customer's
    previous order (-1 for the first).

    Size-guarded hybrid (the ``driver_cap`` pattern from
    ``stages/groupagg.py``): at or below ``driver_cap`` parquet-metadata
    rows the windows compute in ONE driver-side vectorized pandas pass —
    every Ray all-to-all carries ~3 s of fixed barrier latency at 32 CPUs,
    which dominates this output-equals-input query at bench scale
    (measured 4.2 s shuffled vs ~1 s hybrid at sf0.1).  Above the cap,
    customers hash-bucket (bounded group count at any customer
    cardinality) and inside a bucket one sort + C-level groupby
    cumsum/diff computes all three windows vectorized.  Identical results
    (parity-tested with driver_cap=None, which disables the fast path as
    in groupagg); integer outputs → bit-exact vs the SQL twin regardless
    of either engine's aggregation tree."""
    import pyarrow.parquet as pq

    cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]

    def windows(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        by = g.groupby("o_custkey", sort=False)
        cents = np.round(g["o_totalprice"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "rn": (by.cumcount() + 1).to_numpy(dtype=np.int64),
                "running_cents": pd.Series(cents, index=g.index)
                .groupby(g["o_custkey"], sort=False)
                .cumsum()
                .to_numpy(dtype=np.int64),
                "gap_days": by["o_orderdate"]
                .diff()
                .dt.days.fillna(-1)
                .to_numpy(dtype=np.int64),
            }
        )
        return out

    if driver_cap is not None:
        # one handle: metadata probe and (on the fast path) the read
        pf = pq.ParquetFile(f"{sf_dir}/orders.parquet")
        if pf.metadata.num_rows <= driver_cap:
            df = pf.read(columns=cols).to_pandas()
            return ray.data.from_arrow(
                pa_from_pandas(windows(df), preserve_index=False)
            )

    ds = read_parquet_auto(f"{sf_dir}/orders.parquet", columns=cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["o_custkey"]).astype(np.int64)
        return batch.append_column("bucket", pa.array(ck % np.int64(n_buckets)))

    # windows() projects an explicit column set, so the stray bucket
    # column never reaches the output
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


CUSTOMER_ORDER_WINDOW_SQL = """
SELECT o_orderkey, o_custkey,
  row_number() OVER w AS rn,
  SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS UNBOUNDED PRECEDING)::BIGINT AS running_cents,
  COALESCE(date_diff('day', lag(o_orderdate) OVER w, o_orderdate), -1)::BIGINT
    AS gap_days
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def supplier_distinct_parts(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Grouped COUNT DISTINCT (two-level): distinct parts and total lines
    per supplier.  Per batch the fact rows collapse to (suppkey, partkey,
    n) — the shuffle carries distinct pairs, never raw lines; inside a
    supplier-hash bucket a second dedup + groupby finishes both counts."""
    ds = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_suppkey": np.asarray(batch["l_suppkey"]).astype(np.int64),
                "l_partkey": np.asarray(batch["l_partkey"]).astype(np.int64),
            }
        )
        agg = (
            df.groupby(["l_suppkey", "l_partkey"], sort=False)
            .size()
            .reset_index(name="n")
        )
        agg["bucket"] = (agg["l_suppkey"] % n_buckets).astype(np.int64)
        return pa_from_pandas(agg, preserve_index=False)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby("l_suppkey", sort=False)
            .agg(n_parts=("l_partkey", "nunique"), n_lines=("n", "sum"))
            .reset_index()
        )
        out["n_parts"] = out["n_parts"].astype(np.int64)
        out["n_lines"] = out["n_lines"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


SUPPLIER_DISTINCT_PARTS_SQL = """
SELECT l_suppkey, COUNT(DISTINCT l_partkey)::BIGINT AS n_parts,
  COUNT(*)::BIGINT AS n_lines
FROM lineitem GROUP BY l_suppkey
"""

_KEYWORD_PATTERN = r"\b(join|merge|sort)\b"


def doc_keyword_hits(sf_dir: str, pattern: str = _KEYWORD_PATTERN) -> "ray.data.Dataset":
    """Regexp extraction over documents (§2.8 scalar family): per language,
    total keyword matches, documents with ≥1 match, and document count.
    ``pyarrow.compute.count_substring_regex`` and DuckDB's regexp functions
    both compile RE2, so the twin's semantics (``\\b``, alternation) are
    identical by construction, not by luck."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(batch["text"], pattern)
        df = pd.DataFrame(
            {
                "lang": np.asarray(batch["lang"]),
                "h": np.asarray(hits).astype(np.int64),
            }
        )
        agg = (
            df.assign(hit=(df["h"] > 0).astype(np.int64), one=np.int64(1))
            .groupby("lang", sort=False)
            .agg(
                n_hits=("h", "sum"),
                n_docs_hit=("hit", "sum"),
                n_docs=("one", "sum"),
            )
            .reset_index()
        )
        return pa_from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = bucketed_group_sum(
        partials,
        ["lang"],
        sum_cols={
            "n_hits": "n_hits",
            "n_docs_hit": "n_docs_hit",
            "n_docs": "n_docs",
        },
        count_col=None,
        driver_cap=2_000_000,
    )
    return out.select_columns(["lang", "n_hits", "n_docs_hit", "n_docs"])


DOC_KEYWORD_HITS_SQL = r"""
SELECT lang,
  SUM(len(regexp_extract_all(text, '\b(join|merge|sort)\b')))::BIGINT AS n_hits,
  SUM(CASE WHEN regexp_matches(text, '\b(join|merge|sort)\b') THEN 1 ELSE 0 END)::BIGINT
    AS n_docs_hit,
  COUNT(*)::BIGINT AS n_docs
FROM documents GROUP BY lang
"""


def stratified_sample_documents(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Deterministic STRATIFIED sampling (per-group quota, the companion to
    ``sample_documents``' global hash sample): the k documents per language
    with the smallest md5-derived rank — the same rows on every engine and
    at every parallelism.  Per-batch local top-k per language shrinks the
    shuffle to ≤ k·langs rows per batch; a bounded groupby finishes."""
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        u = md5_number_lower_batch([str(d) for d in ids])
        df = pd.DataFrame(
            {
                "lang": np.asarray(batch["lang"]),
                "doc_id": np.asarray(ids, dtype=np.int64),
                "u": u,
            }
        )
        df = df.sort_values(["lang", "u", "doc_id"]).groupby("lang", sort=False).head(k)
        return pa_from_pandas(df, preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(["lang", "u", "doc_id"]).groupby("lang", sort=False).head(k)
        return out[["lang", "doc_id"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


STRATIFIED_SAMPLE_DOCUMENTS_SQL = """
SELECT lang, doc_id FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) <= 3
"""

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot / crosstab: one row per user with a count column per event
    type.  Per-batch pandas crosstab partials ride the shuffle (one row per
    (batch, user)), merged by the bounded-bucket group sum."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    out_cols = [f"n_{t}" for t in _EVENT_TYPES]

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": np.asarray(batch["user_id"]).astype(np.int64),
                "t": np.asarray(batch["event_type"]),
            }
        )
        ct = pd.crosstab(df["user_id"], df["t"]).reindex(
            columns=list(_EVENT_TYPES), fill_value=0
        )
        ct.columns = out_cols
        ct = ct.astype(np.int64).reset_index()
        return pa_from_pandas(ct, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = bucketed_group_sum(
        partials,
        ["user_id"],
        sum_cols={c: c for c in out_cols},
        count_col=None,
    )
    return out.select_columns(["user_id", *out_cols])


EVENTS_PIVOT_SQL = """
SELECT user_id,
  SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS n_click,
  SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS n_error,
  SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
  SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS n_signup,
  SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS n_view
FROM events GROUP BY user_id
"""


def doc_top_terms(
    sf_dir: str, k: int = 3, n_buckets: int = 32
) -> "ray.data.Dataset":
    """TF-IDF-shaped feature extraction: each document's top-k terms by
    term frequency (ties → term asc) annotated with the term's corpus
    document frequency.  Integer (tf, df) outputs keep the twin bit-exact;
    a scorer divides tf/df downstream without touching the shuffle.

    Plan: term frequencies and the per-doc top-k are BATCH-LOCAL (documents
    are rows, so no shuffle); document frequencies are per-batch distinct
    (term → n_docs) partials summed by the bounded-bucket group sum; the
    top-k rows then bucket-join df by the same term hash.  Tokenization is
    the ``\\w+`` recipe shared with ``vocab_count`` (ASCII-word corpora;
    the SQL twin's RE2 ``\\w`` is ASCII-only while Python/polars ``\\w`` is
    unicode — identical on this data, documented divergence elsewhere)."""
    import zlib

    try:
        import polars as pl
    except ImportError:
        pl = None

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def term_pairs(batch: pa.Table) -> pd.DataFrame:
        if pl is not None:
            t = pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(
                        batch["doc_id"].combine_chunks().cast(pa.int64())
                    ),
                    "term": pl.from_arrow(batch["text"].combine_chunks())
                    .str.extract_all(r"\w+"),
                }
            ).explode("term")
            tf = (
                t.group_by(["doc_id", "term"])
                .len()
                .rename({"len": "tf"})
                .to_pandas()
            )
        else:
            from collections import Counter

            from ner_funtool_ray.functions.text import tokenize_words

            rows = []
            for d, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            ):
                for term, n in Counter(tokenize_words(txt or "")).items():
                    rows.append((d, term, n))
            tf = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
        tf = tf.dropna(subset=["term"])
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf

    def local(batch: pa.Table) -> pa.Table:
        tf = term_pairs(batch)
        top = (
            tf.sort_values(["doc_id", "tf", "term"], ascending=[True, False, True])
            .groupby("doc_id", sort=False)
            .head(k)
            .copy()
        )
        top["df"] = np.int64(0)
        top["kind"] = np.int8(0)
        # per-batch partial document frequency: docs never span batches, so
        # the distinct (doc, term) pairs in this batch contribute exactly
        # their doc count to the global df
        dfp = tf.groupby("term", sort=False).size().reset_index(name="df")
        dfp["doc_id"] = np.int64(0)
        dfp["tf"] = np.int64(0)
        dfp["df"] = dfp["df"].astype(np.int64)
        dfp["kind"] = np.int8(1)
        both = pd.concat([top, dfp], ignore_index=True)[
            ["doc_id", "term", "tf", "df", "kind"]
        ]
        both["bucket"] = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) % n_buckets for s in both["term"]),
            dtype=np.int64,
            count=len(both),
        )
        return pa_from_pandas(both, preserve_index=False)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        dfs = (
            group[group["kind"] == 1]
            .groupby("term", sort=False)["df"]
            .sum()
        )
        top = group[group["kind"] == 0].copy()
        top["df"] = top["term"].map(dfs).astype(np.int64)
        return top[["doc_id", "term", "tf", "df"]]

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )


DOC_TOP_TERMS_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\w+')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM w GROUP BY term
),
top AS (
  SELECT doc_id, term, tf FROM tf
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) <= 3
)
SELECT doc_id, top.term AS term, tf, df FROM top JOIN df USING (term)
"""


def click_purchase_attribution(
    sf_dir: str, window_minutes: int = 30, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Interval / RANGE join (all pairs, unlike the as-of
    ``purchase_view_gap``): every (click, purchase) pair by the same user
    where the purchase lands in ``[click.ts, click.ts + window)`` —
    click-attribution shape.

    Users hash-bucket (the only shuffle; carries 3 columns of the two
    filtered event streams).  Inside a bucket both sides sort once by
    (user, ts); each user's purchases find their click range with two
    searchsorted calls and expand vectorized — per-user work is numpy, the
    Python loop is one iteration per user WITH purchases (session-scale
    event counts assumed; a hot user degrades to its own O(pairs) output,
    never a cross product).  Delay is exact integer microseconds so the
    DuckDB twin (epoch_us difference) is bit-identical — date_diff
    ('second') counts boundary crossings, not floored deltas, and is
    deliberately avoided."""
    win = np.timedelta64(window_minutes * 60 * 1_000_000, "us")
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def filter_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch["event_type"], value_set=pa.array(["click", "purchase"])
        )
        out = batch.filter(keep)
        uid = np.asarray(out["user_id"]).astype(np.int64)
        return out.append_column("bucket", pa.array(uid % np.int64(n_buckets)))

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"])
        c = g[g["event_type"] == "click"]
        p = g[g["event_type"] == "purchase"]
        cols = {"user_id": [], "click_id": [], "purchase_id": [], "delay_us": []}
        out = []
        cu = c["user_id"].to_numpy()
        cts_all = c["ts"].to_numpy()
        cid_all = c["event_id"].to_numpy()
        # click segment bounds per user (sorted by user first)
        for uid, pp in p.groupby("user_id", sort=False):
            s = np.searchsorted(cu, uid, side="left")
            e = np.searchsorted(cu, uid, side="right")
            if s == e:
                continue
            cts = cts_all[s:e]
            pts = pp["ts"].to_numpy()
            lo = np.searchsorted(cts, pts - win, side="right")
            hi = np.searchsorted(cts, pts, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                continue
            rep_p = np.repeat(np.arange(len(pp)), cnt)
            idx_c = np.concatenate(
                [np.arange(l, h) for l, h in zip(lo, hi) if h > l]
            )
            out.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(total, uid, dtype=np.int64),
                        "click_id": cid_all[s:e][idx_c],
                        "purchase_id": pp["event_id"].to_numpy()[rep_p],
                        "delay_us": (
                            (pts[rep_p] - cts[idx_c]) // np.timedelta64(1, "us")
                        ).astype(np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {k: pd.Series([], dtype=np.int64) for k in cols}
            )
        return pd.concat(out, ignore_index=True)

    return (
        ds.map_batches(filter_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand, batch_format="pandas")
    )


CLICK_PURCHASE_ATTRIBUTION_SQL = """
SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id,
  (epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS delay_us
FROM events c JOIN events p
  ON c.user_id = p.user_id AND c.event_type = 'click'
  AND p.event_type = 'purchase'
  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
"""


def events_rollup(sf_dir: str) -> "ray.data.Dataset":
    """ROLLUP / hierarchical subtotals: value cents and counts per
    (event_type, day), per event_type, and the grand total — the
    GROUP BY ROLLUP shape.  Rolled-up positions carry the sentinel 'ALL'
    (COALESCE in the twin) so the result avoids NULL-vs-NaN hash drift.

    One pass over the fact table produces the finest-level partials; the
    coarser levels re-aggregate the FINEST-LEVEL RESULT (types × days
    rows, never the facts), so the extra levels cost nothing at scale."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch["ts"], unit="day"), "%Y-%m-%d")
        cents = np.round(np.asarray(batch["value"]) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(batch["event_type"]),
                "day": np.asarray(day),
                "cents": cents,
            }
        )
        agg = (
            df.groupby(["event_type", "day"], sort=False)["cents"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(agg["event_type"], type=pa.string()),
                "day": pa.array(agg["day"], type=pa.string()),
                "cents": pa.array(agg["sum"].to_numpy(dtype=np.int64)),
                "n": pa.array(agg["size"].to_numpy(dtype=np.int64)),
            }
        )

    fine = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        sum_cols={"cents": "cents", "n": "n"},
        count_col=None,
        driver_cap=2_000_000,
    )

    def roll_type(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("day"),
            "day",
            pa.array(["ALL"] * batch.num_rows, type=pa.string()),
        )

    def roll_all(batch: pa.Table) -> pa.Table:
        t = roll_type(batch)
        return t.set_column(
            t.schema.get_field_index("event_type"),
            "event_type",
            pa.array(["ALL"] * t.num_rows, type=pa.string()),
        )

    cols = ["event_type", "day", "cents", "n"]
    fine = fine.select_columns(cols).materialize()  # types × days rows
    by_type = bucketed_group_sum(
        fine.map_batches(roll_type, batch_format="pyarrow"),
        ["event_type", "day"],
        sum_cols={"cents": "cents", "n": "n"},
        count_col=None,
        driver_cap=2_000_000,
    ).select_columns(cols)
    grand = bucketed_group_sum(
        fine.map_batches(roll_all, batch_format="pyarrow"),
        ["event_type", "day"],
        sum_cols={"cents": "cents", "n": "n"},
        count_col=None,
        driver_cap=2_000_000,
    ).select_columns(cols)
    return fine.union(by_type).union(grand)


EVENTS_ROLLUP_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
  SUM(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
  COUNT(*)::BIGINT AS n
FROM events
GROUP BY ROLLUP(event_type, date_trunc('day', ts))
"""


def customer_urgent_order_counts(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """LEFT OUTER aggregate join with zero-fill: every customer and their
    count of 1-URGENT orders — customers with none appear with 0 (203 of
    1500 at sf0.01, so the outer semantics are exercised by the oracle,
    not just by unit tests).

    Single scale-safe plan, no broadcast: the shuffle carries per-batch
    partial counts from the orders side plus the customer rows, both
    hash-bucketed by custkey; inside a bucket the counts left-merge onto
    the customers with fillna(0)."""
    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    cust = read_parquet_auto(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def order_partials(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.equal(batch["o_orderpriority"], "1-URGENT"))
        ck = np.asarray(hit["o_custkey"]).astype(np.int64)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(uniq),
                "c_name": pa.array([""] * len(uniq), type=pa.string()),
                "n_urgent": pa.array(cnt.astype(np.int64)),
                "kind": pa.array(np.zeros(len(uniq), dtype=np.int8)),
                "bucket": pa.array(uniq % np.int64(n_buckets)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["c_custkey"]).astype(np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(ck),
                "c_name": batch["c_name"],
                "n_urgent": pa.array(np.zeros(len(ck), dtype=np.int64)),
                "kind": pa.array(np.ones(len(ck), dtype=np.int8)),
                "bucket": pa.array(ck % np.int64(n_buckets)),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group[group["kind"] == 0].groupby("c_custkey", sort=False)["n_urgent"].sum()
        )
        out = group[group["kind"] == 1][["c_custkey", "c_name"]].copy()
        out["n_urgent"] = (
            out["c_custkey"].map(counts).fillna(0).astype(np.int64)
        )
        return out

    return (
        orders.map_batches(order_partials, batch_format="pyarrow")
        .union(cust.map_batches(cust_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


CUSTOMER_URGENT_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_name, count(o_orderkey)::BIGINT AS n_urgent
FROM customer LEFT JOIN (
  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
) o ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


def nation_top_customers(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Ordered string aggregation (collect-list / string_agg): per nation,
    the names of the k richest customers (acctbal DESC, custkey ASC)
    comma-joined in rank order.  Per-batch local top-k per nationkey
    bounds the shuffle to k rows per (batch, nation); the 25-row nation
    dimension is a broadcast closure."""
    import pyarrow.parquet as pq

    nt = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(
            np.asarray(nt["n_nationkey"]).astype(np.int64).tolist(),
            np.asarray(nt["n_name"]).tolist(),
        )
    )
    nref = ray.put(names)

    ds = read_parquet_auto(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_name", "c_custkey", "c_acctbal"],
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["c_nationkey", "c_acctbal", "c_custkey"],
            ascending=[True, False, True],
        )
        return df.groupby("c_nationkey", sort=False).head(k)

    def local_topk(batch: pa.Table) -> pa.Table:
        return pa_from_pandas(
            best(batch.to_pandas()), preserve_index=False
        )

    def join_names(group: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        top = best(group)
        agg = (
            top.groupby("c_nationkey", sort=False)["c_name"]
            .agg(",".join)
            .reset_index(name="top_names")
        )
        agg["n_name"] = agg["c_nationkey"].map(lookup)
        return agg[["n_name", "top_names"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("c_nationkey")
        .map_groups(join_names, batch_format="pandas")
    )


NATION_TOP_CUSTOMERS_SQL = """
WITH top AS (
  SELECT c_nationkey, c_name, c_custkey,
    row_number() OVER (
      PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer)
SELECT n_name, string_agg(c_name, ',' ORDER BY rn) AS top_names
FROM top JOIN nation ON n_nationkey = c_nationkey
WHERE rn <= 3 GROUP BY n_name
"""


def events_cube(sf_dir: str) -> "ray.data.Dataset":
    """CUBE / full grouping sets over (event_type, iso day-of-week):
    value cents + counts at all four levels — (type, dow), (type), (dow)
    and the grand total, with 'ALL' sentinels (same NULL-vs-NaN-safe
    convention as ``events_rollup``, which covers the ROLLUP subset).

    One pass over the facts builds the finest level; the other three
    levels re-aggregate the finest RESULT (≤ types × 7 rows).  Day of
    week is ISO (Mon=1..Sun=7): pyarrow's day_of_week counts Mon=0, so
    +1 aligns it with DuckDB's isodow — rendered as a string so the
    sentinel can share the column."""
    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(batch["ts"]), 1)  # ISO: Mon=1..Sun=7
        cents = np.round(np.asarray(batch["value"]) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(batch["event_type"]),
                "dow": np.asarray(dow).astype(str),
                "cents": cents,
            }
        )
        agg = (
            df.groupby(["event_type", "dow"], sort=False)["cents"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(agg["event_type"], type=pa.string()),
                "dow": pa.array(agg["dow"], type=pa.string()),
                "cents": pa.array(agg["sum"].to_numpy(dtype=np.int64)),
                "n": pa.array(agg["size"].to_numpy(dtype=np.int64)),
            }
        )

    def _sentinel(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index(col),
                col,
                pa.array(["ALL"] * batch.num_rows, type=pa.string()),
            )

        return fn

    def _resum(d: "ray.data.Dataset") -> "ray.data.Dataset":
        return bucketed_group_sum(
            d,
            ["event_type", "dow"],
            sum_cols={"cents": "cents", "n": "n"},
            count_col=None,
            driver_cap=2_000_000,
        ).select_columns(cols)

    cols = ["event_type", "dow", "cents", "n"]
    fine = _resum(
        ds.map_batches(partial, batch_format="pyarrow")
    ).materialize()  # ≤ types × 7 rows
    by_type = _resum(fine.map_batches(_sentinel("dow"), batch_format="pyarrow"))
    by_dow = _resum(
        fine.map_batches(_sentinel("event_type"), batch_format="pyarrow")
    )
    grand = _resum(
        fine.map_batches(_sentinel("dow"), batch_format="pyarrow").map_batches(
            _sentinel("event_type"), batch_format="pyarrow"
        )
    )
    return fine.union(by_type).union(by_dow).union(grand)


EVENTS_CUBE_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(isodow(ts)::VARCHAR, 'ALL') AS dow,
  SUM(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
  COUNT(*)::BIGINT AS n
FROM events
GROUP BY CUBE(event_type, isodow(ts))
"""


def nation_account_counts(
    sf_dir: str,
    cust_min_bal: float = 7500.0,
    supp_min_bal: float = 2500.0,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """FULL OUTER aggregate join with zero-fill on BOTH sides: per nation,
    the count of high-balance customers and of high-balance suppliers; a
    nation appears when EITHER side has rows, with 0 filling the other
    (at sf0.001 only 10 suppliers exist, so most nations exercise the
    customer-only direction and some the supplier-only one).

    No join operator runs at all: both sides pre-aggregate to per-batch
    (nationkey, count) partials tagged with their side, the single
    bucketed shuffle sums each side's column per nationkey, and the FULL
    OUTER semantics fall out of the union — a key absent from one side
    simply contributes 0 to that column.  The 25-row nation dim rides as
    a plain broadcast dict."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey2name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    def side_partial(key_col: str, bal_col: str, out_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            lim = cust_min_bal if out_col == "n_cust" else supp_min_bal
            hit = batch.filter(pc.greater(batch[bal_col], lim))
            nk = np.asarray(hit[key_col]).astype(np.int64)
            keys, counts = np.unique(nk, return_counts=True)
            other = "n_supp" if out_col == "n_cust" else "n_cust"
            return pa.table(
                {
                    "n_nationkey": pa.array(keys),
                    out_col: pa.array(counts.astype(np.int64)),
                    other: pa.array(np.zeros(len(keys), dtype=np.int64)),
                    "bucket": pa.array(keys % np.int64(n_buckets)),
                }
            )

        return fn

    cust = read_parquet_auto(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    ).map_batches(
        side_partial("c_nationkey", "c_acctbal", "n_cust"), batch_format="pyarrow"
    )
    supp = read_parquet_auto(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    ).map_batches(
        side_partial("s_nationkey", "s_acctbal", "n_supp"), batch_format="pyarrow"
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        agg = (
            group.groupby("n_nationkey", sort=False)[["n_cust", "n_supp"]]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "n_name": [nkey2name[int(k)] for k in agg["n_nationkey"]],
                "n_cust": agg["n_cust"].to_numpy().astype(np.int64),
                "n_supp": agg["n_supp"].to_numpy().astype(np.int64),
            }
        )

    return cust.union(supp).groupby("bucket").map_groups(
        merge, batch_format="pandas"
    )


NATION_ACCOUNT_COUNTS_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*)::BIGINT AS n_cust
  FROM customer WHERE c_acctbal > 7500.0 GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey AS nk, count(*)::BIGINT AS n_supp
  FROM supplier WHERE s_acctbal > 2500.0 GROUP BY s_nationkey
)
SELECT n_name,
       COALESCE(n_cust, 0)::BIGINT AS n_cust,
       COALESCE(n_supp, 0)::BIGINT AS n_supp
FROM c FULL OUTER JOIN s USING (nk)
JOIN nation ON n_nationkey = nk
"""


def supplier_balance_ranks(
    sf_dir: str, n_tiles: int = 4, n_buckets: int = 16
) -> "ray.data.Dataset":
    """The remaining rank-family windows in one query: per nation,
    ``dense_rank`` over balance cents (DESC; ties share a rank),
    ``ntile(4)`` over the total order (cents DESC, suppkey — SQL NTILE's
    first ``n mod t`` buckets get the extra row), and ``percent_rank``
    ((rank-1)/(n-1), 0 for single-row partitions) — integer cents plus a
    two-exact-int division keep every column bit-exact vs the twin.

    Suppliers hash-bucket by nation; inside a bucket one sort + pandas
    group ranks + index arithmetic compute all three windows with no
    per-row Python."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey2name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    ds = read_parquet_auto(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch["s_nationkey"]).astype(np.int64)
        return batch.append_column("bucket", pa.array(nk % np.int64(n_buckets)))

    def ranks(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["cents"] = np.round(g["s_acctbal"].to_numpy() * 100).astype(np.int64)
        g = g.sort_values(
            ["s_nationkey", "cents", "s_suppkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        grp = g.groupby("s_nationkey", sort=False)
        drank = grp["cents"].rank(method="dense", ascending=False)
        rank_min = grp["cents"].rank(method="min", ascending=False)
        sizes = grp["s_nationkey"].transform("size").to_numpy().astype(np.int64)
        pos = grp.cumcount().to_numpy().astype(np.int64)
        k, r = sizes // n_tiles, sizes % n_tiles
        boundary = r * (k + 1)
        in_big = pos < boundary
        # k == 0 only when sizes < n_tiles, and then every pos < boundary
        tile = np.where(
            in_big, pos // (k + 1), r + (pos - boundary) // np.maximum(k, 1)
        ) + 1
        rm = rank_min.to_numpy().astype(np.int64)
        prank = np.where(
            sizes > 1, (rm - 1).astype(np.float64) / (sizes - 1).astype(np.float64), 0.0
        )
        return pd.DataFrame(
            {
                "s_suppkey": g["s_suppkey"].to_numpy().astype(np.int64),
                "n_name": [nkey2name[int(x)] for x in g["s_nationkey"]],
                "cents": g["cents"].to_numpy(),
                "drank": drank.to_numpy().astype(np.int64),
                "tile": tile.astype(np.int64),
                "prank": prank,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(ranks, batch_format="pandas")
    )


SUPPLIER_BALANCE_RANKS_SQL = """
SELECT s_suppkey, n_name,
  CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
  dense_rank() OVER (
    PARTITION BY s_nationkey ORDER BY round(s_acctbal * 100) DESC
  )::BIGINT AS drank,
  ntile(4) OVER (
    PARTITION BY s_nationkey ORDER BY round(s_acctbal * 100) DESC, s_suppkey
  )::BIGINT AS tile,
  percent_rank() OVER (
    PARTITION BY s_nationkey ORDER BY round(s_acctbal * 100) DESC
  ) AS prank
FROM supplier JOIN nation ON n_nationkey = s_nationkey
"""


def _doc_bigram_tf(batch: pa.Table) -> pd.DataFrame:
    """Per-doc adjacent-token bigram term frequencies for one batch
    (polars shift-join; Counter fallback parity-tested).  Docs never span
    batches, so adjacency is batch-local."""
    try:
        import polars as pl
    except ImportError:
        pl = None

    if pl is not None:
        t = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(
                        batch["doc_id"].combine_chunks().cast(pa.int64())
                    ),
                    "tok": pl.from_arrow(
                        batch["text"].combine_chunks()
                    ).str.extract_all(r"\w+"),
                }
            )
            .explode("tok")
            .with_columns(
                nxt=pl.col("tok").shift(-1),
                nxt_doc=pl.col("doc_id").shift(-1),
            )
            .filter(
                (pl.col("doc_id") == pl.col("nxt_doc"))
                & pl.col("tok").is_not_null()
                & pl.col("nxt").is_not_null()
            )
            .with_columns(bg=pl.col("tok") + " " + pl.col("nxt"))
        )
        tf = t.group_by(["doc_id", "bg"]).len().rename({"len": "tf"}).to_pandas()
    else:
        from collections import Counter

        from ner_funtool_ray.functions.text import tokenize_words

        rows = []
        for d, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = tokenize_words(txt or "")
            cnt = Counter(f"{a} {b}" for a, b in zip(toks, toks[1:]))
            rows.extend((d, bg, n) for bg, n in cnt.items())
        tf = pd.DataFrame(rows, columns=["doc_id", "bg", "tf"])
    tf["tf"] = tf["tf"].astype(np.int64)
    tf["doc_id"] = tf["doc_id"].astype(np.int64)
    return tf


def doc_bigram_commonality(
    sf_dir: str, min_count: int = 30, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Bigram language-model commonality scoring — the boilerplate /
    repetition signal a training-data quality filter uses: per document,
    how many of its adjacent-token bigram occurrences are "common" in the
    corpus LM (corpus bigram count >= ``min_count``), plus the total
    corpus-count mass.  All-integer outputs (n_bigrams, n_common, cb_sum)
    keep the twin hash-exact where a float avg-log-prob would drift on
    summation order and libm differences.

    Plan (same skeleton as ``doc_top_terms``): per-batch polars
    tokenize -> shift-join adjacent tokens into bigrams (docs never span
    batches, so adjacency is batch-local) -> per-doc bigram tf rows plus
    per-batch corpus-count partials, both shuffled once by bigram hash;
    the bucket join attaches global counts and pre-aggregates per
    (doc, bucket); a second bounded shuffle sums the per-doc partials.
    The corpus LM is never a driver-side dict (the round-1 lesson) —
    counts ride the same shuffle as the data."""
    import zlib

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def local(batch: pa.Table) -> pa.Table:
        tf = _doc_bigram_tf(batch)
        tf["kind"] = np.int8(0)
        cbp = tf.groupby("bg", sort=False)["tf"].sum().reset_index(name="cb")
        cbp["doc_id"] = np.int64(0)
        cbp["tf"] = np.int64(0)
        cbp["kind"] = np.int8(1)
        tf["cb"] = np.int64(0)
        both = pd.concat([tf, cbp], ignore_index=True)[
            ["doc_id", "bg", "tf", "cb", "kind"]
        ]
        both["cb"] = both["cb"].astype(np.int64)
        both["bucket"] = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) % n_buckets for s in both["bg"]),
            dtype=np.int64,
            count=len(both),
        )
        return pa_from_pandas(both, preserve_index=False)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cb = group[group["kind"] == 1].groupby("bg", sort=False)["cb"].sum()
        tf = group[group["kind"] == 0]
        cbv = tf["bg"].map(cb).to_numpy(dtype=np.int64)
        tfv = tf["tf"].to_numpy(dtype=np.int64)
        part = pd.DataFrame(
            {
                "doc_id": tf["doc_id"].to_numpy(dtype=np.int64),
                "n_bigrams": tfv,
                "n_common": np.where(cbv >= min_count, tfv, 0),
                "cb_sum": tfv * cbv,
            }
        )
        return part.groupby("doc_id", sort=False, as_index=False).sum()

    per_bucket = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )
    return bucketed_group_sum(
        per_bucket,
        keys=["doc_id"],
        sum_cols={c: c for c in ["n_bigrams", "n_common", "cb_sum"]},
        count_col=None,
        driver_cap=2_000_000,
    )


DOC_BIGRAM_COMMONALITY_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\w+') AS l FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
           AS bg
  FROM toks WHERE len(l) >= 2
),
cb AS (SELECT bg, count(*)::BIGINT AS cb FROM bg GROUP BY bg)
SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
       CAST(sum(CASE WHEN c.cb >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(sum(c.cb) AS BIGINT) AS cb_sum
FROM bg b JOIN cb c USING (bg)
GROUP BY b.doc_id
"""


def doc_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Within-document repetition signal (the Gopher-style
    duplicate-n-gram quality filter): per document, total adjacent-token
    bigram occurrences, distinct bigrams, and the most-repeated bigram's
    count.  1 - n_distinct/n_bigrams is the duplicate fraction; the
    integer numerators are emitted so the twin is hash-exact and the
    caller divides downstream.

    Entirely batch-local — documents are rows, so this is a pure
    ``map_batches`` with NO shuffle at any corpus size."""

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def local(batch: pa.Table) -> pa.Table:
        tf = _doc_bigram_tf(batch)
        agg = tf.groupby("doc_id", sort=False)["tf"].agg(
            ["sum", "size", "max"]
        )
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(dtype=np.int64)),
                "n_bigrams": pa.array(agg["sum"].to_numpy(dtype=np.int64)),
                "n_distinct_bigrams": pa.array(
                    agg["size"].to_numpy(dtype=np.int64)
                ),
                "max_bigram_tf": pa.array(agg["max"].to_numpy(dtype=np.int64)),
            }
        )

    return ds.map_batches(local, batch_format="pyarrow")


DOC_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\w+') AS l FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
           AS bg
  FROM toks WHERE len(l) >= 2
),
tf AS (SELECT doc_id, bg, count(*)::BIGINT AS tf FROM bg GROUP BY doc_id, bg)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       count(*)::BIGINT AS n_distinct_bigrams,
       CAST(max(tf) AS BIGINT) AS max_bigram_tf
FROM tf GROUP BY doc_id
"""


def order_share_within_customer(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """ratio_to_report window → ``(o_orderkey, o_custkey, cents,
    share_ppm)``: each order's share (parts per million, floor) of its
    CUSTOMER's total spend — the per-group share window every BI layer
    ships (``ratio_to_report`` / ``sum() OVER (PARTITION BY)``).

    One customer-hash bucket exchange co-locates a customer's orders;
    inside the bucket a vectorized transform('sum') + integer floor
    division computes the share.  Shares are exact ints (Python-int
    cross-multiplication, HUGEINT in the twin), so the result
    hash-matches at any parallelism."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def side(batch: pa.Table) -> pa.Table:
        from ner_funtool_ray.pipelines.relational import cents_np

        cents = cents_np(np.asarray(batch["o_totalprice"]))
        cust = np.asarray(batch["o_custkey"]).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "o_custkey": pa.array(cust),
                "cents": pa.array(cents),
                "bucket": pa.array(cust % np.int64(n_buckets)),
            }
        )

    def share(group: pd.DataFrame) -> pa.Table:
        tot = group.groupby("o_custkey", sort=False)["cents"].transform("sum")
        ppm = [
            (int(c) * 1_000_000) // int(t)
            for c, t in zip(group["cents"], tot)
        ]  # python ints: no overflow at any scale
        return pa.table(
            {
                "o_orderkey": pa.array(
                    group["o_orderkey"].to_numpy(np.int64)
                ),
                "o_custkey": pa.array(group["o_custkey"].to_numpy(np.int64)),
                "cents": pa.array(group["cents"].to_numpy(np.int64)),
                "share_ppm": pa.array(np.array(ppm, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(side, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(share, batch_format="pandas")
    )


ORDER_SHARE_WITHIN_CUSTOMER_SQL = """
WITH u AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, cents,
       CAST(CAST(cents AS HUGEINT) * 1000000 //
            CAST(sum(cents) OVER (PARTITION BY o_custkey) AS HUGEINT)
            AS BIGINT) AS share_ppm
FROM u
"""





def bigram_collocations(
    sf_dir: str, min_count: int = 30, k: int = 20
) -> "ray.data.Dataset":
    """Collocation / phrase mining → top-``k`` ``(bigram, cab, lift_ppm)``
    by integer association lift — the phrase-vocabulary induction step of
    corpus curation.  ``lift_ppm = c(ab)·N·10⁶ // (c(a)·c(b))`` is the
    PMI exponential as an exact scaled integer (the same no-log trick as
    ``entity_cooccurrence_lift``), so the twin hash-matches; candidates
    need corpus count ≥ ``min_count``, ties order by (lift DESC, bigram).

    One corpus pass: per-batch polars bigram/unigram count partials (the
    ``_doc_bigram_tf`` machinery) ride a single bounded exchange keyed by
    (kind, term) — VOCABULARY-sized, not corpus-sized — and the lift
    assembly over the merged vocabulary runs on the driver in Python big
    ints (HUGEINT in the twin)."""
    import re as _re

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        tf = _doc_bigram_tf(batch)
        bg = tf.groupby("bg", sort=False)["tf"].sum().reset_index(name="c")
        from collections import Counter

        uni: Counter[str] = Counter()
        for t in batch["text"].to_pylist():
            uni.update(_re.findall(r"\w+", t or ""))
        u = pd.DataFrame(
            {"term": list(uni.keys()), "c": list(uni.values())}
        )
        u["kind"] = np.int8(1)
        b = pd.DataFrame({"term": bg["bg"], "c": bg["c"]})
        b["kind"] = np.int8(0)
        out = pd.concat([b, u], ignore_index=True)
        out["c"] = out["c"].astype(np.int64)
        return pa_from_pandas(
            out[["kind", "term", "c"]], preserve_index=False
        )

    counts = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["kind", "term"],
        sum_cols={"c": "c"},
        count_col=None,
        driver_cap=2_000_000,
    ).to_pandas()  # vocabulary-bounded by construction
    uni = counts[counts["kind"] == 1].set_index("term")["c"]
    big = counts[counts["kind"] == 0]
    n_tokens = int(uni.sum())
    rows = []
    for r in big.itertuples():
        cab = int(r.c)
        if cab < min_count:
            continue
        a, b = r.term.split(" ", 1)
        lift = (cab * n_tokens * 1_000_000) // (int(uni[a]) * int(uni[b]))
        rows.append((r.term, cab, lift))
    rows.sort(key=lambda t: (-t[2], t[0]))
    rows = rows[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "bigram": pa.array([r[0] for r in rows], type=pa.string()),
                "cab": pa.array([r[1] for r in rows], type=pa.int64()),
                "lift_ppm": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


BIGRAM_COLLOCATIONS_SQL = r"""
WITH toks AS (
  SELECT regexp_extract_all(text, '\w+') AS l FROM documents
),
cu AS (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w
),
n AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM cu),
bg AS (
  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
           AS bg
  FROM toks WHERE len(l) >= 2
),
cb AS (SELECT bg, count(*)::BIGINT AS cab FROM bg GROUP BY bg),
scored AS (
  SELECT cb.bg AS bigram, cb.cab,
         CAST(CAST(cb.cab AS HUGEINT) * n.n * 1000000
              // (CAST(ca.c AS HUGEINT) * CAST(cbb.c AS HUGEINT))
              AS BIGINT) AS lift_ppm
  FROM cb
  JOIN cu ca ON ca.w = split_part(cb.bg, ' ', 1)
  JOIN cu cbb ON cbb.w = split_part(cb.bg, ' ', 2), n
  WHERE cb.cab >= 30
),
ranked AS (
  SELECT bigram, cab, lift_ppm,
         row_number() OVER (ORDER BY lift_ppm DESC, bigram) AS rn
  FROM scored
)
SELECT bigram, cab, lift_ppm FROM ranked WHERE rn <= 20
"""


def event_user_skew(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Key-skew profile of `events.user_id`: the top-``k`` heaviest keys
    with count, dense rank, share of total and cumulative share — the
    diagnostic that decides WHEN the engine's hot-key mitigations
    (`stages/skewjoin.py` map-side broadcast, `stages/rangejoin.py`
    ``n_salt``) are worth their replication cost.  At 100 TB this is the
    first query run against any new key column.

    Plan: per-batch partial counts (combiner) → one groupby(key) sum over
    DISTINCT keys (not raw rows) → distributed sort + limit(k) → the k
    rows (bounded by construction) get rank/share driver-side.  total is
    an integer ``Dataset.sum``; every share is one int/int double divide
    (correctly rounded, so bit-identical to the DuckDB twin), and the
    cumulative share divides an INTEGER running sum — never a float
    accumulation."""
    ev = read_parquet_auto(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["user_id"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(vals, type=pa.int64()),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum("cnt")
    )
    total = int(counts.sum("sum(cnt)"))
    top = (
        counts.sort(["sum(cnt)", "user_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    cnt = top["sum(cnt)"].to_numpy(np.int64)
    cume = np.cumsum(cnt)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(top["user_id"].to_numpy(np.int64)),
                "cnt": pa.array(cnt),
                "rnk": pa.array(np.arange(1, len(cnt) + 1, dtype=np.int64)),
                "share": pa.array(cnt / float(total), type=pa.float64()),
                "cume_share": pa.array(
                    cume / float(total), type=pa.float64()
                ),
            }
        )
    )


EVENT_USER_SKEW_SQL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
     t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
     r AS (SELECT user_id, cnt,
                  row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk,
                  sum(cnt) OVER (ORDER BY cnt DESC, user_id
                                 ROWS UNBOUNDED PRECEDING) AS cume_cnt
           FROM c)
SELECT r.user_id,
       CAST(r.cnt AS BIGINT) AS cnt,
       CAST(r.rnk AS BIGINT) AS rnk,
       r.cnt / t.total AS share,
       r.cume_cnt / t.total AS cume_share
FROM r, t
WHERE r.rnk <= 20
ORDER BY r.rnk
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT/crosstab: one row per user, one int64 count column per event
    type (the fixed-vocabulary wide layout feature stores want).  Ray
    plan: per-batch crosstab partials (a (users × 5) dense count table
    per batch — the combiner, so the shuffle carries one row per user
    per batch, never raw events) → one groupby(user_id) sum.  The column
    vocabulary is FIXED (schema can't depend on data at plan time);
    unseen types stay all-zero columns, matching the SQL FILTER twin."""
    ev = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        users, inv = np.unique(uid, return_inverse=True)
        cols = {"user_id": pa.array(users, type=pa.int64())}
        for t in _EVENT_TYPES:
            sel = inv[et == t]
            if len(sel):
                cnt = np.bincount(sel, minlength=len(users)).astype(np.int64)
            else:
                cnt = np.zeros(len(users), dtype=np.int64)
            cols[f"n_{t}"] = pa.array(cnt)
        return pa.table(cols)

    from ray.data.aggregate import Sum

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES]
        )
    )
    return agg


USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""
