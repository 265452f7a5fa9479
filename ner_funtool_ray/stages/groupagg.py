"""Bucketed grouped aggregation for high-cardinality string keys.

``Dataset.groupby(keys).aggregate(...)`` sort-shuffles by the raw key
tuple; with many distinct multi-string keys the sort dominates (measured
13s for 93k rows / 4 string keys).  ``bucketed_group_sum`` instead:

1. per-batch partial aggregate (vectorized pandas groupby);
2. add ``bucket = hash64(keys) % n_buckets`` (deterministic);
3. ``groupby(bucket)`` — a cheap int64 shuffle into n_buckets groups;
4. vectorized pandas groupby inside each bucket group.

Same result, bounded group count, all per-row work vectorized.  n_buckets
scales with cluster size (it is the shuffle parallelism); key skew is
immaterial because every distinct key lands in exactly one bucket and
buckets hold many keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ner_funtool_ray.utils import pa_from_pandas


def _bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    # all-integer keys: vectorized splitmix-style mixing — pure numpy
    # arithmetic, so cross-process deterministic, and ~100× faster than
    # the per-row crc32 path (measured on a 1.2M-row int-pair aggregate).
    # Bucket ids only steer partitioning, never values, so the two paths
    # are interchangeable per call site.
    cols = [df[k] for k in keys]
    if all(
        isinstance(c.dtype, np.dtype) and c.dtype.kind in "iu" for c in cols
    ):
        h = np.zeros(len(df), dtype=np.uint64)
        for c in cols:
            h = (h ^ c.to_numpy().astype(np.uint64)) * np.uint64(
                0x9E3779B97F4A7C15
            )
            h ^= h >> np.uint64(33)
        return (h % np.uint64(n_buckets)).astype(np.int64)
    # crc32: content-based and cross-process deterministic.  (pandas'
    # hash_pandas_object is NOT stable across worker processes for object
    # dtype — it salted buckets differently per task and split keys.)
    import zlib

    joined = df[keys].astype(str).agg("\x00".join, axis=1)
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % n_buckets for s in joined),
        dtype=np.int64,
        count=len(joined),
    )


def bucketed_group_sum(
    ds: "ray.data.Dataset",
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_col: str | None = "n",
    n_buckets: int = 64,
    driver_cap: int | None = None,
) -> "ray.data.Dataset":
    """Group by ``keys``; emit sum columns (``sum_cols``: out_name→in_name)
    and/or a row count (``count_col``).

    ``driver_cap`` (opt-in) adds a size-guarded final merge: the per-batch
    partials are materialized and COUNTED; at or below the cap the merge is
    one driver-side pandas groupby (skipping the Ray sort shuffle, whose
    fixed cost dominates small aggregates — measured 2× on the sf0.1 KG
    headline), above it the usual bounded-bucket shuffle merges the
    already-materialized partials.  Only pass a cap where materializing the
    partials is acceptable — e.g. the doc-entity summary, which the caller
    materializes right after anyway (partials ≈ output there, so the pin
    moves earlier at no extra cost); leave ``None`` for aggregates whose
    partials are corpus-sized.  Both paths produce identical results
    (same partial/merge math)."""
    sum_cols = sum_cols or {}

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + list(sum_cols.values())).to_pandas()
        if count_col:
            df["__cnt"] = np.int64(1)
        spec = {out: (src, "sum") for out, src in sum_cols.items()}
        if count_col:
            spec[count_col] = ("__cnt", "sum")
        # dropna=False: DuckDB keeps NULL group keys, pandas drops them by
        # default — a silent engine/oracle divergence if a key is ever null
        agg = df.groupby(keys, sort=False, dropna=False).agg(**spec).reset_index()
        agg["bucket"] = _bucket_of(agg, keys, n_buckets)
        return pa_from_pandas(agg, preserve_index=False)

    def merge(group: pd.DataFrame) -> pa.Table:
        cols = list(sum_cols) + ([count_col] if count_col else [])
        agg = group.groupby(keys, sort=False, dropna=False)[cols].sum().reset_index()
        return pa_from_pandas(agg, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    if driver_cap is not None:
        parts = parts.materialize()
        n_parts = parts.count()
        if n_parts == 0:
            # empty-Dataset trap: .to_pandas() on zero rows DROPS columns
            # (and .schema() can be None), so the groupby below would
            # KeyError — run the partial fn on an empty input table built
            # from the INPUT schema to get a correctly-typed empty result
            in_sch = ds.schema()
            if in_sch is None:
                return parts  # no schema anywhere: already empty
            empty_in = pa.table(
                {n: pa.array([], type=t) for n, t in zip(in_sch.names, in_sch.types)}
            )
            return ray.data.from_arrow(partial(empty_in).drop_columns(["bucket"]))
        if n_parts <= driver_cap:
            cols = list(sum_cols) + ([count_col] if count_col else [])
            df = parts.drop_columns(["bucket"]).to_pandas()
            agg = (
                df.groupby(keys, sort=False, dropna=False)[cols]
                .sum()
                .reset_index()
            )
            return ray.data.from_arrow(
                pa_from_pandas(agg, preserve_index=False)
            )
    return parts.groupby("bucket").map_groups(merge, batch_format="pandas")
