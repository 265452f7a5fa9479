"""Skew-split equi-join: per-key hybrid of broadcast and shuffle plans.

The uniform-strategy joins elsewhere in this repo pick ONE plan per join
(size-guarded broadcast, else bucketed shuffle).  Under heavy key skew a
hash shuffle sends every row of a hot key to one reducer — the straggler
pattern the retrieved skew literature targets (Scarlett EUROSYS'11,
FP-Hadoop VLDB'15, skewed-hash-join ICDE'24; see PAPERS.md — public
work, pattern only).  This operator splits PER KEY instead:

1. one cheap distributed count pass finds the ``hot_k`` heaviest fact
   keys (partial per-batch counts → bounded group-sum → top-k);
2. the dim rows for those keys — at most ``hot_k`` rows — broadcast via
   ``ray.put`` and hot fact rows join MAP-SIDE, no shuffle, so a hot key
   parallelizes across every fact block instead of serializing on one
   reducer;
3. cold rows take the normal bucketed shuffle join.

The result is plan-invariant: hot_k=0 (all-shuffle) and hot_k=∞
(all-broadcast) produce identical rows, which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ner_funtool_ray.utils import pa_from_pandas


def skew_split_join(
    fact: "ray.data.Dataset",
    dim: "ray.data.Dataset",
    fact_key: str,
    dim_key: str,
    payload_cols: list[str],
    hot_k: int = 64,
    n_buckets: int = 32,
    count_cap: int = 2_000_000,
) -> "ray.data.Dataset":
    """Inner-join ``fact`` to ``dim`` on integer keys → fact columns +
    ``payload_cols``.  ``dim_key`` must be unique in ``dim`` (dimension
    semantics).  See module docstring for the hot/cold split."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    if fact_key == dim_key:
        # widen_fact nulls out cols[dim_key], which would overwrite the fact
        # key and silently drop every cold join row — refuse loudly instead
        raise ValueError(
            "skew_split_join requires fact_key != dim_key "
            f"(both are {fact_key!r}); rename one side before joining"
        )

    def key_counts(batch: pa.Table) -> pa.Table:
        k, c = np.unique(
            np.asarray(batch[fact_key]).astype(np.int64), return_counts=True
        )
        return pa.table(
            {"k": pa.array(k), "cnt": pa.array(c.astype(np.int64))}
        )

    counts = bucketed_group_sum(
        fact.map_batches(key_counts, batch_format="pyarrow"),
        keys=["k"],
        sum_cols={"cnt": "cnt"},
        driver_cap=count_cap,
    )
    top = (
        counts.sort(["cnt", "k"], descending=[True, False])
        .limit(hot_k)
        .to_pandas()
        if hot_k > 0
        else pd.DataFrame({"k": pd.Series(dtype=np.int64)})
    )
    hot_keys = np.sort(top["k"].to_numpy(np.int64)) if len(top) else np.array(
        [], dtype=np.int64
    )
    hot_ref = ray.put(hot_keys)

    # hot dim rows: ≤ hot_k rows cross to the driver (dim_key unique)
    def pick_hot(batch: pa.Table) -> pa.Table:
        keep = np.isin(
            np.asarray(batch[dim_key]).astype(np.int64), ray.get(hot_ref)
        )
        return batch.filter(pa.array(keep))

    hot_dim = (
        dim.map_batches(pick_hot, batch_format="pyarrow").to_pandas()
        if len(hot_keys)
        else pd.DataFrame(columns=[dim_key, *payload_cols])
    )
    lut_ref = ray.put(
        hot_dim.set_index(dim_key)[payload_cols]
        if len(hot_dim)
        else pd.DataFrame(columns=payload_cols)
    )

    fact_sch = fact.schema()
    dim_sch = dim.schema()
    fact_cols = list(fact_sch.names)
    fact_types = dict(zip(fact_sch.names, fact_sch.types))
    dim_types = dict(zip(dim_sch.names, dim_sch.types))
    def hot_join(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = np.asarray(batch[fact_key]).astype(np.int64)
        hot = batch.filter(pa.array(np.isin(keys, hk)))
        if hot.num_rows == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=fact_types[c]) for c in fact_cols},
                    **{
                        c: pa.array([], type=dim_types[c])
                        for c in payload_cols
                    },
                }
            )
        lut = ray.get(lut_ref)
        df = hot.to_pandas()
        joined = df.join(lut, on=fact_key, how="inner")
        # cast through the declared Arrow types exactly like bucket_join:
        # an empty lut (hot keys matching zero dim rows) leaves payload
        # columns object-dtype, and date/decimal payloads round-trip pandas
        # with a different inferred type — either diverges from the cold
        # path's schema and breaks the final hot.union(cold)
        tbl = pa_from_pandas(
            joined[[*fact_cols, *payload_cols]], preserve_index=False
        )
        return pa.table(
            {c: tbl[c].cast(out_types[c]) for c in [*fact_cols, *payload_cols]}
        )

    # cold path: both sides widen to ONE schema (typed nulls for the other
    # side's columns) so the union has a single block schema
    def widen_fact(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[fact_key]).astype(np.int64)
        cold = batch.filter(pa.array(~np.isin(keys, ray.get(hot_ref))))
        n = cold.num_rows
        cols = {c: cold[c] for c in fact_cols}
        cols[dim_key] = pa.nulls(n, type=dim_types[dim_key])
        for c in payload_cols:
            cols[c] = pa.nulls(n, type=dim_types[c])
        cols["side"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["bucket"] = pa.array(
            np.asarray(cold[fact_key]).astype(np.int64) % np.int64(n_buckets)
            if n
            else np.array([], dtype=np.int64)
        )
        return pa.table(cols)

    def widen_dim(batch: pa.Table) -> pa.Table:
        keep = ~np.isin(
            np.asarray(batch[dim_key]).astype(np.int64), ray.get(hot_ref)
        )
        cold = batch.filter(pa.array(keep))
        n = cold.num_rows
        cols = {c: pa.nulls(n, type=fact_types[c]) for c in fact_cols}
        cols[dim_key] = cold[dim_key]
        for c in payload_cols:
            cols[c] = cold[c]
        cols["side"] = pa.array(np.ones(n, dtype=np.int8))
        cols["bucket"] = pa.array(
            np.asarray(cold[dim_key]).astype(np.int64) % np.int64(n_buckets)
            if n
            else np.array([], dtype=np.int64)
        )
        return pa.table(cols)

    out_types = {
        **{c: fact_types[c] for c in fact_cols},
        **{c: dim_types[c] for c in payload_cols},
    }

    def bucket_join(group: pd.DataFrame) -> pa.Table:
        # the widened nulls upcast ints to float64 in pandas; cast every
        # column back to its declared Arrow type on the way out
        dimp = group.loc[group["side"] == 1, [dim_key, *payload_cols]]
        factp = group.loc[group["side"] == 0, fact_cols]
        merged = factp.merge(
            dimp, left_on=fact_key, right_on=dim_key, how="inner"
        )[[*fact_cols, *payload_cols]]
        tbl = pa_from_pandas(merged, preserve_index=False)
        return pa.table(
            {c: tbl[c].cast(out_types[c]) for c in [*fact_cols, *payload_cols]}
        )

    cold = (
        fact.map_batches(widen_fact, batch_format="pyarrow")
        .union(dim.map_batches(widen_dim, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
    )
    hot = fact.map_batches(hot_join, batch_format="pyarrow")
    return hot.union(cold)
