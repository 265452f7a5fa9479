"""Embedding-column analytics: per-label centroids and a k-means
assignment step.

Float averages are NOT cross-engine reproducible (partial-aggregation
trees sum in different orders), so both operators follow the repo-wide
bit-exact-oracle rule by quantizing each component to integer fixed point
FIRST — ``q = floor(x·2^20)`` computed with the identical IEEE-double
expression on both engines — and doing ALL arithmetic in exact integers:
centroids are (count, Σq) pairs, distances are integer squared-L2.  The
consumer divides at the edge if it wants floats.

Scale shape: per-batch partials bound every shuffle (centroid partials
are ≤ labels × dim rows per block; assignments never shuffle at all —
the k centroid vectors are ``ray.put`` once and each batch runs one
integer matmul).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum

_FP = 1 << 20  # fixed-point scale; |x| < 1 keeps q within ±2^20
_DIM = 64


def _quantized(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(batch), -1)
    return np.floor(mat * float(_FP)).astype(np.int64)


def label_centroids(
    sf_dir: str, driver_cap: int | None = 200_000
) -> "ray.data.Dataset":
    """Per-label centroid in exact integer form → ``(label, dim, n,
    sum_fp)`` long format (dim is 1-based to match SQL list subscripts).
    The centroid component is ``sum_fp / (n · 2^20)`` — left to the
    consumer so the stored result stays integer-exact and mergeable."""
    ds = read_parquet_auto(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized(batch)
        labels = batch["label"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        dim = np.arange(1, q.shape[1] + 1, dtype=np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, q.shape[1])),
                "dim": pa.array(np.tile(dim, len(uniq))),
                "n": pa.array(np.repeat(counts, q.shape[1])),
                "sum_fp": pa.array(sums.ravel()),
            }
        )

    return bucketed_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["label", "dim"],
        sum_cols={"n": "n", "sum_fp": "sum_fp"},
        count_col=None,
        driver_cap=driver_cap,
    )


LABEL_CENTROIDS_SQL = f"""
WITH q AS (
  SELECT label, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP)}) AS BIGINT) AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
)
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(qx) AS BIGINT) AS sum_fp
FROM q GROUP BY label, dim
"""


def kmeans_assign(sf_dir: str, k: int = 8) -> "ray.data.Dataset":
    """One k-means assignment step → ``(vec_id, centroid_id, dist2)``.

    Centroid init is deterministic — the ``k`` lowest vec_ids (so the SQL
    twin can name the same centroids).  Distances are integer squared-L2
    over the fixed-point components; ties go to the lowest centroid id on
    both engines (numpy argmin-first == SQL ``ORDER BY dist2, cid``).
    The centroid block is ``ray.put`` once; assignment is embarrassingly
    parallel — no shuffle at any scale."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    head = pq.read_table(path, columns=["vec_id", "embedding"])
    head = head.filter(pc.less(head["vec_id"], k)).sort_by("vec_id")
    if head.num_rows != k:
        raise ValueError(f"expected vec_ids 0..{k-1} for centroid init")
    cent = _quantized(head)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        q = _quantized(batch)
        d2 = (
            (q * q).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1, dtype=np.int64)[None, :]
        )
        best = np.argmin(d2, axis=1)  # first min == lowest centroid id
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "centroid_id": pa.array(best.astype(np.int64)),
                "dist2": pa.array(d2[np.arange(len(best)), best]),
            }
        )

    ds = read_parquet_auto(path, columns=["vec_id", "embedding"])
    return ds.map_batches(assign, batch_format="pyarrow")


KMEANS_ASSIGN_SQL = f"""
WITH q AS (
  SELECT vec_id, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP)}) AS BIGINT) AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
),
c AS (SELECT vec_id AS cid, dim, qx AS qc FROM q WHERE vec_id < 8),
d AS (
  SELECT q.vec_id, c.cid,
         CAST(sum((q.qx - c.qc) * (q.qx - c.qc)) AS BIGINT) AS dist2
  FROM q JOIN c ON q.dim = c.dim
  GROUP BY q.vec_id, c.cid
),
r AS (
  SELECT vec_id, cid, dist2,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
  FROM d
)
SELECT vec_id, cid AS centroid_id, dist2 FROM r WHERE rn = 1
"""


def embedding_quantize(sf_dir: str) -> "ray.data.Dataset":
    """Int8 symmetric quantization of the embedding column (the storage /
    serving-prep step for vector indexes) → long-format
    ``(vec_id, i, q, scale)`` with ``q = trunc(x · 127 / scale)`` and
    ``scale`` the vector's max-|x|.

    Bit-exact twin: float32 → float64 widening is exact on both engines,
    and ``x·127/scale`` + ``trunc`` are the IDENTICAL IEEE-double ops in
    numpy and DuckDB, so q and scale hash-match.  Per-batch vectorized,
    shuffle-free at any scale; output rows = vectors × dim (long form
    because list-valued result columns defeat order-insensitive value
    hashing — the layout a consumer would write back to parquet anyway)."""
    ds = read_parquet_auto(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def quant(batch: pa.Table) -> pa.Table:
        from ner_funtool_ray.stages.similarity import _batch_matrix

        mat = _batch_matrix(batch, "embedding")
        n, d = mat.shape
        scale = np.max(np.abs(mat), axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.trunc(mat * 127.0 / safe[:, None])
        q = np.where(scale[:, None] == 0.0, 0.0, q).astype(np.int64)
        ids = np.repeat(batch["vec_id"].to_numpy().astype(np.int64), d)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "i": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "q": pa.array(q.reshape(-1)),
                "scale": pa.array(np.repeat(scale, d), type=pa.float64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), m AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM e
)
SELECT vec_id,
       CAST(unnest(range(len(v))) AS BIGINT) AS i,
       CAST(unnest(list_transform(
         v, x -> CASE WHEN scale = 0 THEN 0.0
                      ELSE trunc(x * 127.0 / scale) END)) AS BIGINT) AS q,
       scale
FROM m
"""


__all__ = [
    "label_centroids", "LABEL_CENTROIDS_SQL",
    "kmeans_assign", "KMEANS_ASSIGN_SQL",
    "embedding_quantize", "EMBEDDING_QUANTIZE_SQL",
    "kmeans_lloyd", "make_kmeans_lloyd_sql",
]


def kmeans_lloyd(sf_dir: str, k: int = 8, iters: int = 2) -> "ray.data.Dataset":
    """Distributed Lloyd k-means, ``iters`` full iterations → the final
    centroids in exact integer form ``(cid, dim, c_fp, n)`` (dim 1-based;
    ``c_fp = Σq // n`` fixed-point components, ``n`` the cluster size of
    the final assignment).

    The iterative-algorithm shape on Ray Data: each iteration is one
    broadcast (``ray.put`` the k×dim centroid block) + one
    embarrassingly-parallel assignment pass whose per-batch partials are
    (cid, dim, Σq, count) rows — k·dim-bounded, so the merge is a tiny
    driver groupby — and NO corpus shuffle anywhere.  Centroids are
    re-quantized by TRUNCATING integer division each round (DuckDB's
    integer ``//`` truncates toward zero while numpy's floors — the numpy
    side mirrors truncation explicitly since centroid sums go negative),
    which keeps every quantity integer and the
    unrolled-CTE twin bit-exact; a cluster that loses all members drops
    out on both engines."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # predicate-pushdown read: only the row groups holding vec_id < k
    # leave storage (reading the whole table for k init rows was the
    # operator's biggest IO cost)
    head = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", k)]
    )
    head = head.filter(pc.less(head["vec_id"], k)).sort_by("vec_id")
    if head.num_rows != k:
        raise ValueError(f"expected vec_ids 0..{k-1} for centroid init")
    cent_ids = np.arange(k, dtype=np.int64)
    cent = _quantized(head)

    ds = read_parquet_auto(path, columns=["vec_id", "embedding"])
    sums = counts = None
    for _ in range(iters):
        cent_ref = ray.put((cent_ids, cent))

        def partial(batch: pa.Table) -> pa.Table:
            cids, c = ray.get(cent_ref)
            q = _quantized(batch)
            d2 = (
                (q * q).sum(axis=1, dtype=np.int64)[:, None]
                - 2 * (q @ c.T)
                + (c * c).sum(axis=1, dtype=np.int64)[None, :]
            )
            best = np.argmin(d2, axis=1)
            nc, dim = c.shape
            s = np.zeros((nc, dim), dtype=np.int64)
            np.add.at(s, best, q)
            n = np.bincount(best, minlength=nc).astype(np.int64)
            live = n > 0
            rows_cid = np.repeat(cids[live], dim)
            rows_dim = np.tile(np.arange(1, dim + 1, dtype=np.int64),
                               int(live.sum()))
            return pa.table(
                {
                    "cid": pa.array(rows_cid),
                    "dim": pa.array(rows_dim),
                    "s": pa.array(s[live].reshape(-1)),
                    "n": pa.array(np.repeat(n[live], dim)),
                }
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()  # k × dim bounded by construction
            .groupby(["cid", "dim"], sort=True)[["s", "n"]]
            .sum()
            .reset_index()
        )
        piv_s = agg.pivot(index="cid", columns="dim", values="s").sort_index()
        # n arrives replicated per dim; take it from dim 1
        n_per = agg[agg["dim"] == 1].set_index("cid")["n"].sort_index()
        cent_ids = piv_s.index.to_numpy(np.int64)
        s_mat = piv_s.to_numpy(np.int64)
        n_col = n_per.to_numpy(np.int64)[:, None]
        # TRUNCATING integer division (toward zero) — DuckDB's integer //
        # truncates while numpy's floors, and centroid sums go negative
        cent = np.where(s_mat >= 0, s_mat // n_col, -((-s_mat) // n_col))
        sums, counts = piv_s, n_per

    dim = cent.shape[1]
    return ray.data.from_arrow(
        pa.table(
            {
                "cid": pa.array(np.repeat(cent_ids, dim)),
                "dim": pa.array(
                    np.tile(np.arange(1, dim + 1, dtype=np.int64),
                            len(cent_ids))
                ),
                "c_fp": pa.array(cent.reshape(-1)),
                "n": pa.array(
                    np.repeat(counts.to_numpy(np.int64), dim)
                ),
            }
        )
    )


def make_kmeans_lloyd_sql(k: int = 8, iters: int = 2) -> str:
    """Unrolled-CTE twin of ``kmeans_lloyd``: the identical assign →
    integer-floor-centroid rounds."""
    parts = [
        f"""WITH q AS (
  SELECT vec_id, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP)}) AS BIGINT)
           AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
),
c0 AS (SELECT vec_id AS cid, dim, qx AS qc FROM q WHERE vec_id < {k})"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
d{it} AS (
  SELECT q.vec_id, c.cid,
         CAST(sum((q.qx - c.qc) * (q.qx - c.qc)) AS BIGINT) AS dist2
  FROM q JOIN c{it - 1} c ON q.dim = c.dim
  GROUP BY q.vec_id, c.cid
),
a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
    FROM d{it}
  ) WHERE rn = 1
),
c{it} AS (
  SELECT a.cid, q.dim,
         CAST(sum(q.qx) // count(*) AS BIGINT) AS qc,
         count(*)::BIGINT AS n
  FROM a{it} a JOIN q ON q.vec_id = a.vec_id
  GROUP BY a.cid, q.dim
)"""
        )
    parts.append(
        f"\nSELECT cid, CAST(dim AS BIGINT) AS dim, qc AS c_fp, n"
        f" FROM c{iters}"
    )
    return "".join(parts)


def label_centroid_distances(sf_dir: str) -> "ray.data.Dataset":
    """Cluster-separation diagnostics → ``(label_a, label_b, dist2)``:
    exact integer squared-L2 distance between every pair of per-label
    centroids, with centroids requantized by TRUNCATING integer division
    (the ``kmeans_lloyd`` convention — DuckDB's ``//`` truncates).

    Builds on ``label_centroids``' exact (n, Σq) pairs: the centroid
    table is labels × dim (bounded), so the pairwise matrix assembles on
    the driver; the only corpus pass is the centroid aggregation
    itself."""
    cent = label_centroids(sf_dir).to_pandas()  # label-bounded
    piv_s = cent.pivot(index="label", columns="dim", values="sum_fp").sort_index()
    n_per = cent[cent["dim"] == 1].set_index("label")["n"].sort_index()
    s_mat = piv_s.to_numpy(np.int64)
    n_col = n_per.to_numpy(np.int64)[:, None]
    q = np.where(s_mat >= 0, s_mat // n_col, -((-s_mat) // n_col))
    labels = piv_s.index.to_numpy(np.int64)
    la, lb, d2 = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            diff = q[i] - q[j]
            la.append(int(labels[i]))
            lb.append(int(labels[j]))
            d2.append(int((diff * diff).sum()))
    return ray.data.from_arrow(
        pa.table(
            {
                "label_a": pa.array(np.array(la, dtype=np.int64)),
                "label_b": pa.array(np.array(lb, dtype=np.int64)),
                "dist2": pa.array(np.array(d2, dtype=np.int64)),
            }
        )
    )


LABEL_CENTROID_DISTANCES_SQL = f"""
WITH q AS (
  SELECT label, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP)}) AS BIGINT)
           AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
),
c AS (
  SELECT label, dim,
         CAST(sum(qx) // count(*) AS BIGINT) AS qc
  FROM q GROUP BY label, dim
)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       CAST(sum((a.qc - b.qc) * (a.qc - b.qc)) AS BIGINT) AS dist2
FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
"""


__all__ += ["label_centroid_distances", "LABEL_CENTROID_DISTANCES_SQL"]


# --- semantic dedup (SemDeDup) ------------------------------------------------

# Coarser fixed-point scale for the cosine-threshold predicate: with
# |x| < 1 and dim 64, |q| < 2^10 keeps dot <= 2^26 and 100*dot^2 <= 2^59,
# so EVERY intermediate of the squared-cosine test fits int64 on the numpy
# side (DuckDB sums are HUGEINT regardless).  The assignment step keeps the
# finer 2^20 scale so it is identical to ``kmeans_assign``.
_FP_SEM = 1 << 10


def semantic_dedup(
    sf_dir: str, k: int = 8, t2_num: int = 4, t2_den: int = 25
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, public arXiv 2303.09540) →
    ``(vec_id, centroid_id, kept)``: cluster the embedding space, then
    inside each cluster drop every vector that has a LOWER-id neighbor
    with cosine similarity ≥ t (keep-lowest-id greedy — the paper keeps
    one representative per semantic duplicate group; lowest id is the
    deterministic choice both engines can name).

    Exactness: cos(x,y) ≥ t is evaluated as the all-integer predicate
    ``dot ≥ 0 AND t2_den·dot² ≥ t2_num·|x|²·|y|²`` over ``2^10``
    fixed-point components (t² = t2_num/t2_den, default 0.16 → t = 0.4 — low enough that the
    synthetic corpus yields real drops, so the oracle check is never
    vacuous),
    so there is no float-rounding hazard and the DuckDB twin hashes
    bit-exactly.

    Ray shape: centroid assignment is embarrassingly parallel (broadcast
    centroid block, one matmul per batch — the ``kmeans_assign`` stage);
    the ONLY shuffle is the groupby(centroid_id) over the embedding
    table, and the per-cluster work is the paper's O(m²/k) pairwise pass.
    At 100 TB, ``k`` scales with the corpus (SemDeDup uses ~10⁵ clusters)
    to bound both cluster width and pairwise cost."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    head = pq.read_table(path, columns=["vec_id", "embedding"])
    head = head.filter(pc.less(head["vec_id"], k)).sort_by("vec_id")
    if head.num_rows != k:
        raise ValueError(f"expected vec_ids 0..{k-1} for centroid init")
    cent = _quantized(head)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        q = _quantized(batch)
        d2 = (
            (q * q).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1, dtype=np.int64)[None, :]
        )
        best = np.argmin(d2, axis=1)
        return batch.append_column("centroid_id", pa.array(best.astype(np.int64)))

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(group["vec_id"].to_numpy())
        g = group.iloc[order]
        ids = g["vec_id"].to_numpy(np.int64)
        mat = np.vstack(g["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(mat * float(_FP_SEM)).astype(np.int64)
        dot = q @ q.T
        n2 = np.diag(dot).copy()
        near = (dot >= 0) & (
            np.int64(t2_den) * dot * dot >= np.int64(t2_num) * np.outer(n2, n2)
        )
        # dominated ⟺ some strictly-lower-id row is near (strict lower
        # triangle, diagonal excluded)
        dominated = np.tril(near, k=-1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "centroid_id": g["centroid_id"].to_numpy(np.int64),
                "kept": (~dominated).astype(np.int64),
            }
        )

    ds = read_parquet_auto(path, columns=["vec_id", "embedding"])
    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("centroid_id")
        .map_groups(prune, batch_format="pandas")
    )


SEMANTIC_DEDUP_SQL = f"""
WITH q AS (
  SELECT vec_id, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP)}) AS BIGINT) AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
),
c AS (SELECT vec_id AS cid, dim, qx AS qc FROM q WHERE vec_id < 8),
d AS (
  SELECT q.vec_id, c.cid,
         CAST(sum((q.qx - c.qc) * (q.qx - c.qc)) AS BIGINT) AS dist2
  FROM q JOIN c ON q.dim = c.dim
  GROUP BY q.vec_id, c.cid
),
a AS (
  SELECT vec_id, cid AS centroid_id
  FROM (SELECT vec_id, cid, dist2,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d)
  WHERE rn = 1
),
-- coarser 2^10 fixed point for the overflow-safe cosine predicate
s AS (
  SELECT vec_id, i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {float(_FP_SEM)}) AS BIGINT)
           AS qx
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
),
n2 AS (SELECT vec_id, CAST(sum(qx * qx) AS BIGINT) AS n2 FROM s GROUP BY vec_id),
pr AS (
  SELECT ax.vec_id AS hi
  FROM a ax
  JOIN a ay ON ax.centroid_id = ay.centroid_id AND ay.vec_id < ax.vec_id
  JOIN s sx ON sx.vec_id = ax.vec_id
  JOIN s sy ON sy.vec_id = ay.vec_id AND sy.dim = sx.dim
  JOIN n2 nx ON nx.vec_id = ax.vec_id
  JOIN n2 ny ON ny.vec_id = ay.vec_id
  GROUP BY ax.vec_id, ay.vec_id, nx.n2, ny.n2
  HAVING sum(sx.qx * sy.qx) >= 0
     AND 25 * sum(sx.qx * sy.qx) * sum(sx.qx * sy.qx) >= 4 * nx.n2 * ny.n2
),
dup AS (SELECT DISTINCT hi FROM pr)
SELECT a.vec_id, a.centroid_id,
       CAST(CASE WHEN dup.hi IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM a LEFT JOIN dup ON dup.hi = a.vec_id
"""

__all__ += ["semantic_dedup", "SEMANTIC_DEDUP_SQL"]
