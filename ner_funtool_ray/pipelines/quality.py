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
from ner_funtool_ray.utils import pa_from_pandas

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


_PROFILE_COLUMNS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


def table_profile(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """ANALYZE-style column profiling of the orders table →
    ``(column, n_rows, n_null, n_distinct)`` — the stats pass every
    engine's optimizer and every data-quality monitor runs first.

    Exact distinct counts without a distinct shuffle per column: each
    batch emits its DISTINCT (column, serialized-value) pairs (the
    combiner; serialization is injective per type, so string-distinct ==
    native-distinct) which hash-bucket by value; a value lands in exactly
    one bucket, so the per-bucket distinct counts SUM exactly per column
    (the ``supplier_distinct_parts`` two-level argument).  Null/row
    counts are column-bounded scalar partials merged on the driver."""
    import zlib

    ds = read_parquet_auto(
        f"{sf_dir}/orders.parquet", columns=list(_PROFILE_COLUMNS)
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols_out, vals_out = [], []
        meta = []
        for c in _PROFILE_COLUMNS:
            arr = batch[c]
            n_null = int(arr.null_count)
            # vectorized per-batch distinct on NATIVE values first (the
            # hot path); only the small distinct set gets serialized
            uniq = pd.unique(arr.to_pandas().dropna())
            vals = [str(x) for x in uniq]
            cols_out.extend([c] * len(vals))
            vals_out.extend(vals)
            meta.append((c, batch.num_rows, n_null))
        t1 = pd.DataFrame(
            {"column": cols_out, "value": vals_out, "n_rows": np.int64(0),
             "n_null": np.int64(0), "kind": np.int8(0)}
        )
        t2 = pd.DataFrame(
            {"column": [m[0] for m in meta], "value": "",
             "n_rows": np.array([m[1] for m in meta], dtype=np.int64),
             "n_null": np.array([m[2] for m in meta], dtype=np.int64),
             "kind": np.int8(1)}
        )
        out = pd.concat([t1, t2], ignore_index=True)
        out["bucket"] = np.fromiter(
            (
                zlib.crc32(f"{c}\x00{v}".encode("utf-8")) % n_buckets
                for c, v in zip(out["column"], out["value"])
            ),
            dtype=np.int64,
            count=len(out),
        )
        return pa_from_pandas(out, preserve_index=False)

    def bucket_stats(group: pd.DataFrame) -> pa.Table:
        d = group[group["kind"] == 0]
        m = group[group["kind"] == 1]
        dc = (
            d.drop_duplicates(["column", "value"])
            .groupby("column", sort=False)
            .size()
            .rename("n_distinct")
            .reset_index()
        )
        dc["n_rows"] = np.int64(0)
        dc["n_null"] = np.int64(0)
        mc = (
            m.groupby("column", sort=False)[["n_rows", "n_null"]]
            .sum()
            .reset_index()
        )
        mc["n_distinct"] = np.int64(0)
        out = pd.concat([dc, mc], ignore_index=True)
        return pa_from_pandas(
            out[["column", "n_rows", "n_null", "n_distinct"]],
            preserve_index=False,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()  # column-bounded by construction
        .groupby("column", sort=True)[["n_rows", "n_null", "n_distinct"]]
        .sum()
        .reset_index()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "column": pa.array(agg["column"], type=pa.string()),
                "n_rows": pa.array(agg["n_rows"].to_numpy(np.int64)),
                "n_null": pa.array(agg["n_null"].to_numpy(np.int64)),
                "n_distinct": pa.array(agg["n_distinct"].to_numpy(np.int64)),
            }
        )
    )


TABLE_PROFILE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column, count(*)::BIGINT AS n_rows, "
    f"(count(*) - count({c}))::BIGINT AS n_null, "
    f"count(DISTINCT {c})::BIGINT AS n_distinct FROM orders"
    for c in _PROFILE_COLUMNS
)


__all__ = ["fk_integrity_counts", "FK_INTEGRITY_SQL", "table_profile", "TABLE_PROFILE_SQL"]
