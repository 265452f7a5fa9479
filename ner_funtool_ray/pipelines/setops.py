"""Set operations (INTERSECT / EXCEPT shapes) and a Bloom-prefiltered
exact semi-join — membership machinery the reference has no analog for
but any warehouse migration needs.

Scale notes:

* The INTERSECT/EXCEPT pair is ONE bounded-bucket shuffle: each batch
  pre-reduces to distinct ``(key, in_a, in_b)`` flags, the bucket merge
  ORs the flags (max of 0/1 ints), and the set operation itself is a
  trailing filter.  No full-table distinct, no second pass.
* The Bloom semi-join builds fixed-size per-block bitmaps inside
  ``map_batches`` and OR-merges them on the driver — a constant-size
  sketch reduction (like an HLL merge), NOT a data materialization; at
  any corpus size the driver holds ``m_bits/8`` bytes × a handful of
  partials.  The merged filter ships once via ``ray.put`` and prunes the
  probe side to candidates; a size-guarded EXACT verification (broadcast
  ``np.isin`` below the cap, bucketed shuffle semi-join above) removes
  Bloom false positives, so the result is exact at every setting of
  ``m_bits``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.utils import pa_from_pandas

__all__ = [
    "customers_retained",
    "customers_churned",
    "returned_orders_bloom",
    "bloom_build",
    "bloom_might_contain",
]


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT: customers ordering in year A vs year B


def _customer_year_flags(
    sf_dir: str, year_a: int, year_b: int, n_buckets: int
) -> "ray.data.Dataset":
    """Distinct ``(o_custkey, in_a, in_b)`` membership flags, one bucketed
    shuffle.  Flag OR across batches == max of 0/1 ints (a plain sum would
    double-count repeat members)."""
    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    lo_a = np.datetime64(f"{year_a}-01-01").astype("datetime64[us]")
    hi_a = np.datetime64(f"{year_a + 1}-01-01").astype("datetime64[us]")
    lo_b = np.datetime64(f"{year_b}-01-01").astype("datetime64[us]")
    hi_b = np.datetime64(f"{year_b + 1}-01-01").astype("datetime64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        dt = np.asarray(batch["o_orderdate"])
        a = (dt >= lo_a) & (dt < hi_a)
        b = (dt >= lo_b) & (dt < hi_b)
        keep = a | b
        df = pd.DataFrame(
            {
                "o_custkey": np.asarray(batch["o_custkey"])[keep].astype(np.int64),
                "in_a": a[keep].astype(np.int64),
                "in_b": b[keep].astype(np.int64),
            }
        )
        agg = df.groupby("o_custkey", sort=False).max().reset_index()
        agg["bucket"] = agg["o_custkey"].to_numpy() % np.int64(n_buckets)
        return pa_from_pandas(agg, preserve_index=False)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.groupby("o_custkey", sort=False)[["in_a", "in_b"]]
            .max()
            .reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def customers_retained(
    sf_dir: str, year_a: int = 1995, year_b: int = 1996, n_buckets: int = 32
) -> "ray.data.Dataset":
    """INTERSECT: distinct customers with orders in BOTH years."""
    flags = _customer_year_flags(sf_dir, year_a, year_b, n_buckets)

    def both(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch["in_a"], 1), pc.equal(batch["in_b"], 1)
        )
        return batch.filter(keep).select(["o_custkey"])

    return flags.map_batches(both, batch_format="pyarrow")


CUSTOMERS_RETAINED_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def customers_churned(
    sf_dir: str, year_a: int = 1995, year_b: int = 1996, n_buckets: int = 32
) -> "ray.data.Dataset":
    """EXCEPT: distinct customers with orders in year A but none in B."""
    flags = _customer_year_flags(sf_dir, year_a, year_b, n_buckets)

    def only_a(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch["in_a"], 1), pc.equal(batch["in_b"], 0)
        )
        return batch.filter(keep).select(["o_custkey"])

    return flags.map_batches(only_a, batch_format="pyarrow")


CUSTOMERS_CHURNED_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


# ---------------------------------------------------------------------------
# Bloom filter over int64 keys (vectorized double hashing)

_MULT1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiplier (splitmix64)
_MULT2 = np.uint64(0xC2B2AE3D27D4EB4F)  # second mix constant (splitmix64)


def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent multiply-xorshift hashes of int64 keys — pure
    integer math, deterministic across processes (no PYTHONHASHSEED)."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = x * _MULT1
        h1 ^= h1 >> np.uint64(29)
        h1 *= _MULT2
        h1 ^= h1 >> np.uint64(32)
        h2 = (x + np.uint64(1)) * _MULT2
        h2 ^= h2 >> np.uint64(31)
        h2 *= _MULT1
        h2 ^= h2 >> np.uint64(29)
    return h1, h2


def bloom_build(keys: np.ndarray, m_bits: int, n_hashes: int = 4) -> np.ndarray:
    """Packed-bit Bloom filter (uint8 array of m_bits/8 bytes) over int64
    keys, double hashing h1 + i*h2 (Kirsch–Mitzenmacher)."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bits
    h1, h2 = _hash2(np.asarray(keys, dtype=np.int64))
    m = np.uint64(m_bits)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits


def bloom_might_contain(
    bits: np.ndarray, keys: np.ndarray, n_hashes: int = 4
) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = surely
    absent (Bloom guarantee: no false negatives)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash2(np.asarray(keys, dtype=np.int64))
    m = np.uint64(len(bits) * 8)
    out = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % m
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return out


def returned_orders_bloom(
    sf_dir: str,
    m_bits: int = 1 << 20,
    n_buckets: int = 32,
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Exact semi-join with a Bloom prefilter: orders having at least one
    heavily-discounted returned lineitem (``l_returnflag = 'R'`` and
    ``l_discount >= 0.08``).

    Per-block Bloom bitmaps over qualifying ``l_orderkey`` are OR-merged
    on the driver (constant-size sketches) and broadcast once; the orders
    probe keeps only Bloom candidates — at 100 TB this is what shrinks the
    verification join's shuffled volume by the true-negative fraction.
    Verification is EXACT either way: below ``broadcast_limit`` distinct
    qualifying keys ship sorted and candidates ``np.searchsorted``-check
    against them; above it, candidates and keys hash-bucket by orderkey
    and each bucket runs the same vectorized membership check."""
    lkeys = read_parquet_auto(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_discount"],
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch["l_returnflag"], "R"),
            pc.greater_equal(batch["l_discount"], 0.08),
        )
        ok = batch.filter(keep)["l_orderkey"]
        return pa.table({"l_orderkey": pc.unique(ok)})

    # consumed twice (bloom partials + exact verification) — pin the
    # per-block distinct keys instead of re-reading the fact table
    keys_ds = lkeys.map_batches(qualifying, batch_format="pyarrow").materialize()

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bits = bloom_build(np.asarray(batch["l_orderkey"]), m_bits)
        return pa.table({"bloom": pa.array([bits.tobytes()], type=pa.binary())})

    # constant-size sketch reduction on the driver (not a data pull):
    # every partial is m_bits/8 bytes regardless of corpus size
    partial_blooms = keys_ds.map_batches(
        bloom_partial, batch_format="pyarrow"
    ).take_all()
    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in partial_blooms:
        bloom |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    orders = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
        return batch.filter(pa.array(bloom_might_contain(bits, ok)))

    candidates = orders.map_batches(probe, batch_format="pyarrow")

    n_lineitem = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if n_lineitem <= broadcast_limit:
        keys = np.unique(
            np.concatenate(
                [
                    np.asarray(b["l_orderkey"]).astype(np.int64)
                    for b in keys_ds.iter_batches(batch_format="pyarrow")
                ]
                or [np.array([], dtype=np.int64)]
            )
        )
        keys_ref = ray.put(keys)

        def verify(batch: pa.Table) -> pa.Table:
            sk = ray.get(keys_ref)
            ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
            hit = np.zeros(len(ok), dtype=bool)
            if len(sk):
                pos = np.searchsorted(sk, ok)
                in_range = pos < len(sk)
                hit[in_range] = sk[pos[in_range]] == ok[in_range]
            return batch.filter(pa.array(hit))

        return candidates.map_batches(verify, batch_format="pyarrow")

    # bucketed exact verification: candidates + distinct keys co-locate by
    # orderkey hash; inside a bucket one sorted membership check
    def cand_tag(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"]).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_orderpriority": batch["o_orderpriority"],
                "kind": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def key_tag(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"]).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_orderpriority": pa.array([""] * len(ok), type=pa.string()),
                "kind": pa.array(np.ones(len(ok), dtype=np.int64)),
                "bucket": pa.array(ok % np.int64(n_buckets)),
            }
        )

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(
            group.loc[group["kind"] == 1, "o_orderkey"].to_numpy()
        )
        cand = group[group["kind"] == 0]
        ok = cand["o_orderkey"].to_numpy()
        hit = np.isin(ok, keys)
        out = cand.loc[hit, ["o_orderkey", "o_orderpriority"]]
        return out.reset_index(drop=True)

    tagged = candidates.map_batches(cand_tag, batch_format="pyarrow").union(
        keys_ds.map_batches(key_tag, batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(
        bucket_verify, batch_format="pandas"
    )


RETURNED_ORDERS_BLOOM_SQL = """
SELECT o_orderkey, o_orderpriority FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  WHERE l_returnflag = 'R' AND l_discount >= 0.08
)
"""
