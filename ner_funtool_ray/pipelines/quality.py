"""Data-quality audit operators.

A 100 TB ingest needs machine-checkable integrity gates before any
downstream join trusts its keys.  ``fk_integrity_counts`` audits every
foreign-key edge of the warehouse schema in one Dataset: per relation it
reports total child rows and the number of ORPHANS (child keys with no
parent row — exactly what a LEFT JOIN ... IS NULL probe counts).

Plan shape per edge (same guard discipline as the repo's joins):

* parent side at or below ``broadcast_cap`` rows (parquet metadata probe,
  no data read): parent keys are deduped and ``ray.put`` once; each child
  batch runs a vectorized ``searchsorted`` membership probe and emits ONE
  partial row — the shuffle carries block counts, never keys.
* larger parents: both sides hash-bucket by key (child rows carry a tag),
  each bucket counts its own orphans — the standard bucketed anti-join.

Both plans return identical counts (unit-tested); null child keys count
as orphans on both engines (LEFT JOIN never matches NULL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum

FK_EDGES: list[tuple[str, str, str, str]] = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def _membership_misses(vals: np.ndarray, sorted_keys: np.ndarray) -> int:
    """How many of ``vals`` are absent from ``sorted_keys`` (sorted, unique)."""
    if len(sorted_keys) == 0:
        return len(vals)
    idx = np.searchsorted(sorted_keys, vals)
    idx = np.clip(idx, 0, len(sorted_keys) - 1)
    return int((sorted_keys[idx] != vals).sum())


def _orphan_partials_broadcast(
    child_path: str, child_col: str, parent_keys_ref, relation: str
) -> "ray.data.Dataset":
    def probe(batch: pa.Table) -> pa.Table:
        keys = ray.get(parent_keys_ref)  # zero-copy shared-memory numpy
        col = batch[child_col]
        nulls = col.null_count
        vals = col.drop_null().to_numpy().astype(np.int64)
        orphans = _membership_misses(vals, keys) + nulls
        return pa.table(
            {
                "relation": pa.array([relation]),
                "fk": pa.array([child_col]),
                "n_rows": pa.array([batch.num_rows], type=pa.int64()),
                "n_orphans": pa.array([orphans], type=pa.int64()),
            }
        )

    return read_parquet_auto(child_path, columns=[child_col]).map_batches(
        probe, batch_format="pyarrow"
    )


def _orphan_partials_bucketed(
    child_path: str,
    child_col: str,
    parent_path: str,
    parent_col: str,
    relation: str,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    def child_rows(batch: pa.Table) -> pa.Table:
        col = batch[child_col].cast(pa.int64())  # narrow FK cols: widen first
        vals = col.fill_null(np.iinfo(np.int64).min).to_numpy()
        return pa.table(
            {
                "key": pa.array(vals),
                "bucket": pa.array(np.abs(vals) % n_buckets),
                "is_child": pa.array(np.ones(len(vals), dtype=np.int8)),
            }
        )

    def parent_rows(batch: pa.Table) -> pa.Table:
        vals = batch[parent_col].drop_null().to_numpy().astype(np.int64)
        return pa.table(
            {
                "key": pa.array(vals),
                "bucket": pa.array(np.abs(vals) % n_buckets),
                "is_child": pa.array(np.zeros(len(vals), dtype=np.int8)),
            }
        )

    def count_bucket(group: pd.DataFrame) -> pd.DataFrame:
        child = group.loc[group["is_child"] == 1, "key"].to_numpy()
        parents = np.unique(group.loc[group["is_child"] == 0, "key"].to_numpy())
        sentinel = np.iinfo(np.int64).min  # null child keys: always orphans
        n_null = int((child == sentinel).sum())
        real = child[child != sentinel]
        return pd.DataFrame(
            {
                "relation": [relation],
                "fk": [child_col],
                "n_rows": np.array([len(child)], dtype=np.int64),
                "n_orphans": np.array(
                    [_membership_misses(real, parents) + n_null], dtype=np.int64
                ),
            }
        )

    child = read_parquet_auto(child_path, columns=[child_col]).map_batches(
        child_rows, batch_format="pyarrow"
    )
    parent = read_parquet_auto(parent_path, columns=[parent_col]).map_batches(
        parent_rows, batch_format="pyarrow"
    )
    return child.union(parent).groupby("bucket").map_groups(
        count_bucket, batch_format="pandas"
    )


def fk_integrity_counts(
    sf_dir: str,
    edges: list[tuple[str, str, str, str]] | None = None,
    broadcast_cap: int = 5_000_000,
    driver_cap: int | None = 200_000,
) -> "ray.data.Dataset":
    """One audit row per FK edge: ``(relation, fk, n_rows, n_orphans)``."""
    parts = []
    for relation, child_col, parent_tbl, parent_col in edges or FK_EDGES:
        child_path = f"{sf_dir}/{relation}.parquet"
        parent_path = f"{sf_dir}/{parent_tbl}.parquet"
        if parquet_num_rows(parent_path) <= broadcast_cap:
            keys = np.unique(
                read_parquet_auto(parent_path, columns=[parent_col])
                .to_pandas()[parent_col]
                .dropna()
                .to_numpy()
                .astype(np.int64)
            )
            parts.append(
                _orphan_partials_broadcast(
                    child_path, child_col, ray.put(keys), relation
                )
            )
        else:
            parts.append(
                _orphan_partials_bucketed(
                    child_path, child_col, parent_path, parent_col, relation
                )
            )
    combined = parts[0]
    for p in parts[1:]:
        combined = combined.union(p)
    return bucketed_group_sum(
        combined,
        keys=["relation", "fk"],
        sum_cols={"n_rows": "n_rows", "n_orphans": "n_orphans"},
        count_col=None,
        driver_cap=driver_cap,
    )


def _edge_sql(relation: str, child_col: str, parent_tbl: str, parent_col: str) -> str:
    return f"""
SELECT '{relation}' AS relation, '{child_col}' AS fk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum(CASE WHEN p.{parent_col} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphans
FROM {relation} c LEFT JOIN {parent_tbl} p ON c.{child_col} = p.{parent_col}
"""


FK_INTEGRITY_SQL = " UNION ALL ".join(_edge_sql(*e) for e in FK_EDGES)
