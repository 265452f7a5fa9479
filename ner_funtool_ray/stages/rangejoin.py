"""Range (interval/band) joins — a join family the reference lacks and
Ray Data has no native operator for (SURVEY §2.5 "custom operators").

Semantics implemented: **banded count join** — for each left row, count
right rows whose timestamp falls in the half-open band
``(left_ts, left_ts + band]`` (strictly after, at-or-before the band
end), optionally restricted to rows sharing an equi key.  Counting (not
pair emission) keeps the output |left|-sized: the O(matches) pair
expansion never materializes, which is what makes the plan safe when a
3-day band matches thousands of rows at 100 TB.

Two distributed plans, chosen by whether an equi key exists:

* **keyed** (``key=``): hash-bucket BOTH sides by ``hash(key) %
  n_buckets`` — every match shares the key, so it shares the bucket; no
  replication.  Per bucket, one ts-sorted ``searchsorted`` per key slice
  counts each left row's band vectorized.
* **pure time band** (``key=None``): bin time into band-width bins
  ``ts // band``.  A left row's band ``(t, t+band]`` overlaps exactly
  bins ``t//band`` and ``t//band + 1``, so the left side is replicated
  ×2 while each right row lands in its single own bin — each match is
  counted exactly once (in the right row's bin).  Per-bin partial
  counts are then summed by left id (a shuffle over 2·|left| count
  rows, not over matches).

**Skew** (``n_salt``): a flash-crowd band (pure plan) or a hot key
(keyed plan) concentrates one group; ``n_salt=s`` sub-splits every
right group by a mixed ts hash into ``s`` shards and replicates lefts
×s (so ×2s in the pure plan), turning the hottest group into ``s``
parallel groups at the cost of s× more slim count partials.  Counts
are additive, so the per-shard partials sum to the exact answer —
``n_salt`` changes the schedule, never the result.  Caveat: rights with
the IDENTICAL microsecond timestamp share a salt (the hash must be a
row-layout-independent function of the data), so a crowd at one exact
instant still lands together; at µs resolution that is the degenerate
case, and its count contribution is a constant per left row anyway.

Both plans are exact (integer-µs comparisons, no floats) and have
DuckDB twins of the literal ``JOIN … ON b.ts > a.ts AND b.ts <= a.ts +
INTERVAL`` form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier


def _salt_of(ts: np.ndarray, n_salt: int) -> np.ndarray:
    """Deterministic, layout-independent shard of a ts column."""
    if n_salt <= 1:
        return np.zeros(len(ts), dtype=np.int64)
    with np.errstate(over="ignore"):
        h = (ts.astype(np.uint64) * _MIX) >> np.uint64(33)
    return (h % np.uint64(n_salt)).astype(np.int64)


def _ts_us(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """timestamp[*] or integer column → int64 microseconds."""
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def banded_count_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_id: str,
    left_ts: str,
    right_ts: str,
    band_us: int,
    key: str | None = None,
    n_buckets: int = 64,
    n_salt: int = 1,
    out_col: str = "n_within",
) -> "ray.data.Dataset":
    """(left_id, count of right rows with right_ts ∈ (left_ts, left_ts +
    band_us], same ``key`` if given).  Lefts with zero matches are kept
    (count 0) — LEFT-join count semantics.  ``n_salt`` sub-shards hot
    groups (see module docstring); any value gives identical results."""
    if band_us <= 0:
        raise ValueError(f"band_us must be positive, got {band_us}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")

    if key is not None:
        return _keyed_plan(
            left, right, left_id, left_ts, right_ts, band_us, key,
            n_buckets, n_salt, out_col,
        )
    return _binned_plan(
        left, right, left_id, left_ts, right_ts, band_us, n_salt, out_col
    )


def _count_in_bands(
    l_ts: np.ndarray, r_ts_sorted: np.ndarray, band_us: int
) -> np.ndarray:
    """Vectorized band counts: rights strictly after l_ts, ≤ l_ts+band."""
    hi = np.searchsorted(r_ts_sorted, l_ts + band_us, side="right")
    lo = np.searchsorted(r_ts_sorted, l_ts, side="right")
    return (hi - lo).astype(np.int64)


def _sum_partials(partials, left_id, out_col):
    """groupby-sum of (lid, partial) count rows → (left_id, out_col)."""
    agg = partials.groupby("lid").sum("partial")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                left_id: batch["lid"],
                out_col: batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _replicate(arrs: dict[str, np.ndarray], times: int) -> dict:
    if times == 1:
        return arrs
    return {k: np.tile(v, times) for k, v in arrs.items()}


def _keyed_plan(
    left, right, left_id, left_ts, right_ts, band_us, key,
    n_buckets, n_salt, out_col,
):
    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = {
            "k": k,
            "lid": batch[left_id]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "ts_us": _ts_us(batch[left_ts]),
        }
        rep = _replicate(base, n_salt)
        # left replica j probes right shard j of its key bucket
        salts = np.repeat(np.arange(n_salt, dtype=np.int64), len(batch))
        bucket = (rep["k"] % n_buckets) * n_salt + salts
        n = len(bucket)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "k": pa.array(rep["k"]),
                "lid": pa.array(rep["lid"]),
                "ts_us": pa.array(rep["ts_us"]),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = _ts_us(batch[right_ts])
        bucket = (k % n_buckets) * n_salt + _salt_of(ts, n_salt)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "k": pa.array(k),
                "lid": pa.array(np.zeros(len(batch), dtype=np.int64)),
                "ts_us": pa.array(ts),
                "side": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    direct = n_salt == 1  # each left appears once → counts are final
    id_out = left_id if direct else "lid"
    cnt_out = out_col if direct else "partial"

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lefts = g[g["side"] == 0]
        rights = g[g["side"] == 1]
        if lefts.empty:
            return pd.DataFrame(
                {
                    id_out: pd.Series([], dtype="int64"),
                    cnt_out: pd.Series([], dtype="int64"),
                }
            )
        out = np.zeros(len(lefts), dtype=np.int64)
        l_k = lefts["k"].to_numpy()
        l_ts = lefts["ts_us"].to_numpy()
        if not rights.empty:
            r = rights.sort_values(["k", "ts_us"])
            r_k = r["k"].to_numpy()
            r_ts = r["ts_us"].to_numpy()
            # per-key slice bounds in the (k, ts)-sorted right array; one
            # vectorized searchsorted pair per DISTINCT key, not per row
            for k in np.unique(l_k):
                l_sel = l_k == k
                s, e = np.searchsorted(r_k, [k, k + 1])
                if s == e:
                    continue
                out[l_sel] = _count_in_bands(l_ts[l_sel], r_ts[s:e], band_us)
        return pd.DataFrame({id_out: lefts["lid"].to_numpy(), cnt_out: out})

    counted = (
        both.groupby("bucket").map_groups(count_bucket, batch_format="pandas")
    )
    if direct:
        return counted
    return _sum_partials(counted, left_id, out_col)


def _binned_plan(
    left, right, left_id, left_ts, right_ts, band_us, n_salt, out_col
):
    def tag_left(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[left_ts])
        lid = batch[left_id].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = ts // band_us
        # the band (t, t+band] overlaps exactly bins t//band and t//band+1
        bins2 = np.concatenate([b0, b0 + 1])
        rep = _replicate(
            {"bin": bins2, "lid": np.tile(lid, 2), "ts_us": np.tile(ts, 2)},
            n_salt,
        )
        salts = np.repeat(
            np.arange(n_salt, dtype=np.int64), 2 * len(batch)
        )
        part = rep["bin"] * n_salt + salts
        return pa.table(
            {
                "bin": pa.array(part),
                "lid": pa.array(rep["lid"]),
                "ts_us": pa.array(rep["ts_us"]),
                "side": pa.array(np.zeros(len(part), dtype=np.int8)),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[right_ts])
        part = (ts // band_us) * n_salt + _salt_of(ts, n_salt)
        return pa.table(
            {
                "bin": pa.array(part),
                "lid": pa.array(np.zeros(len(batch), dtype=np.int64)),
                "ts_us": pa.array(ts),
                "side": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def count_bin(g: pd.DataFrame) -> pd.DataFrame:
        lefts = g[g["side"] == 0]
        if lefts.empty:
            return pd.DataFrame(
                {
                    "lid": pd.Series([], dtype="int64"),
                    "partial": pd.Series([], dtype="int64"),
                }
            )
        rights = g[g["side"] == 1]
        if rights.empty:
            cnt = np.zeros(len(lefts), dtype=np.int64)
        else:
            r_ts = np.sort(rights["ts_us"].to_numpy())
            cnt = _count_in_bands(
                lefts["ts_us"].to_numpy(), r_ts, band_us
            )
        return pd.DataFrame(
            {"lid": lefts["lid"].to_numpy(), "partial": cnt}
        )

    partials = (
        both.groupby("bin").map_groups(count_bin, batch_format="pandas")
    )
    # each left id has exactly 2·n_salt partials (its replicas); sum them
    return _sum_partials(partials, left_id, out_col)
