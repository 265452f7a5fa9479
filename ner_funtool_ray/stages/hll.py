"""HyperLogLog distinct-count sketch, reproduced EXACTLY in SQL.

The brief's "novel sketch" slot: approximate COUNT(DISTINCT) per group as
a fixed-size mergeable register sketch — the shuffle carries ≤ m rows per
(group, block) no matter the corpus size, vs. the full distinct-key set
an exact count must move.

Everything is integer math so the DuckDB twin is bit-exact (the repo-wide
oracle rule):

* hash: the proven ``md5_number_lower`` recipe (``functions/md5vec.py``)
  — identical uint64 on both engines;
* rho (leading-zero rank of the low ``64-p`` bits): branchless binary
  bit-length in numpy, ``length(bin(w))`` on the DuckDB side — both exact
  integer paths, no float log2 (whose ulp behavior differs per libm);
* register sum: Σ 2^(S-reg) held as EXACT integers (Python int / DuckDB
  HUGEINT), converted to double once at the end — round-to-nearest of an
  exact integer is deterministic on both engines;
* estimator: the RAW HyperLogLog formula alpha_m·m²/Σ2^-reg with the SAME
  literal expression on both sides.  The small-range (linear counting)
  correction is deliberately OMITTED: it needs ln(), whose last-ulp
  behavior is libm-specific and would break the bit-exact oracle.  At
  cardinalities ≤ 2.5·m the raw estimate is biased — pick p so the groups
  of interest sit above that (documented, tested at sf0.01).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.utils import pa_from_pandas

__all__ = ["events_user_hll", "hll_rho", "EVENTS_USER_HLL_SQL"]


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 → 0)."""
    w = w.astype(np.uint64, copy=True)
    out = np.zeros(w.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(s))
        out[m] += s
        w = np.where(m, w >> np.uint64(s), w)
    out += (w > np.uint64(0)).astype(np.int64)
    return out


def hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Split uint64 hashes into (register index, rho).  idx = top p bits;
    rho = 1 + leading zeros of the low 64-p bits (w == 0 → 64-p+1)."""
    q = 64 - p
    idx = (h >> np.uint64(q)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(q)) - np.uint64(1))
    rho = (q + 1) - _bitlen_u64(w)
    return idx, rho


_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}  # standard HLL constants, m ≤ 64


def _alpha(p: int) -> float:
    if p in _ALPHA:
        return _ALPHA[p]
    m = 1 << p
    return 0.7213 / (1.0 + 1.079 / m)


def events_user_hll(sf_dir: str, p: int = 4) -> "ray.data.Dataset":
    """Approximate distinct users per event type via a 2^p-register
    HyperLogLog.  Partials are per-block register maxima (≤ types·2^p
    rows per block); the single shuffle buckets by event type so the
    merge both max-combines registers and finalizes the estimate."""
    q = 64 - p
    m = 1 << p
    scale = q + 1  # exact-sum units: term(reg) = 2^(scale - reg)
    alpha = _alpha(p)

    ds = read_parquet_auto(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"])
        uid = np.asarray(batch["user_id"]).astype(np.int64)
        h = md5_number_lower_batch([str(u) for u in uid])
        idx, rho = hll_rho(h, p)
        df = pd.DataFrame({"event_type": et, "idx": idx, "rho": rho})
        agg = (
            df.groupby(["event_type", "idx"], sort=False)["rho"]
            .max()
            .reset_index()
        )
        # 5 event types: a plain string groupby key is fine (bounded)
        return pa_from_pandas(agg, preserve_index=False)

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        regs = (
            group.groupby("idx", sort=False)["rho"].max().to_dict()
        )
        s = 0  # Python int: exact, mirrors the twin's HUGEINT sum
        for i in range(m):
            s += 1 << (scale - int(regs.get(i, 0)))
        est = alpha * float(m) * float(m) * float(1 << scale) / float(s)
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "approx_users": [est],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pandas")
    )


# Twin of events_user_hll(p=4): q = 60, scale = 61, alpha = 0.673.
# rho via length(bin(w)) — bin() renders the minimal binary string, an
# exact integer path on both engines (no float log2).
EVENTS_USER_HLL_SQL = """
WITH h AS (
  SELECT event_type,
         md5_number_lower(user_id::VARCHAR) AS h
  FROM events
), parts AS (
  SELECT event_type,
         (h >> 60)::BIGINT AS idx,
         CASE WHEN (h & CAST(1152921504606846975 AS UBIGINT)) = CAST(0 AS UBIGINT)
              THEN 61
              ELSE 61 - length(bin(h & CAST(1152921504606846975 AS UBIGINT)))
         END AS rho
  FROM h
), regs AS (
  SELECT event_type, idx, max(rho) AS reg FROM parts GROUP BY event_type, idx
), grid AS (
  SELECT DISTINCT event_type FROM events
), allregs AS (
  SELECT g.event_type, i.idx, COALESCE(r.reg, 0) AS reg
  FROM grid g
  CROSS JOIN (SELECT unnest(range(16)) AS idx) i
  LEFT JOIN regs r ON r.event_type = g.event_type AND r.idx = i.idx
), s AS (
  SELECT event_type,
         sum((CAST(1 AS HUGEINT) << (61 - reg))) AS s
  FROM allregs GROUP BY event_type
)
SELECT event_type,
       0.673 * 16.0 * 16.0 * 2305843009213693952.0 / (s::DOUBLE) AS approx_users
FROM s
"""
