"""Similarity search over an embedding column (training-data ops).

- :func:`topk_cosine` — brute-force cosine top-k against a broadcast query
  matrix: the query vectors are ``ray.put`` once and read inside each task;
  each batch computes a float64 matmul and emits only its local top-k, so
  the final exact sort touches k × n_batches rows, not the corpus.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH bucket
  keys; candidates = rows sharing a bucket with the query; exact re-score
  of candidates only.

Embeddings stay Arrow list<float> end-to-end; numpy views are zero-copy
per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def cosine_scores(mat: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity, float64, zero-safe."""
    qn = query / max(np.linalg.norm(query), 1e-30)
    norms = np.linalg.norm(mat, axis=1)
    return (mat @ qn) / np.maximum(norms, 1e-30)


def topk_cosine(
    embeddings: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Exact top-k by cosine vs one query vector.

    Per-batch: matmul + local top-k (partial); final: small global sort.
    Returns (id_col, score) with score optionally rounded for stable
    cross-engine comparison.
    """
    query_ref = ray.put(np.asarray(query_vec, dtype=np.float64))

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(query_ref)
        mat = _batch_matrix(batch, vec_col)
        scores = cosine_scores(mat, q)
        take = np.argsort(-scores, kind="stable")[:k]
        out = {
            id_col: batch[id_col].take(pa.array(take)),
            "score": pa.array(scores[take], type=pa.float64()),
        }
        return pa.table(out)

    partial = embeddings.map_batches(local_topk, batch_format="pyarrow")
    top = partial.sort("score", descending=True).limit(k)

    if round_to is not None:
        top = top.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("score"),
                "score",
                pa.array(np.round(t["score"].to_numpy(), round_to)),
            ),
            batch_format="pyarrow",
        )
    return top


def hyperplane_lsh_keys(
    mat: np.ndarray, planes: np.ndarray
) -> np.ndarray:
    """Sign-bit bucket key per row: int64 of (mat @ planes.T > 0) bits."""
    bits = (mat @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_bucket_topk(
    embeddings: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Approximate top-k: restrict to rows in the query's LSH bucket, then
    exact cosine.  The bucket filter happens inside map_batches (no shuffle);
    candidate count ≈ n / 2^n_planes.

    Hyperplanes are md5-derived (functions/md5vec.py) rather than seeded
    gaussians, so the bucketing — and therefore the whole result — has an
    exact DuckDB twin; ties are broken by lowest id to match its
    (score DESC, id) ordering."""
    from ner_funtool_ray.functions.md5vec import md5_planes

    query = np.asarray(query_vec, dtype=np.float64)
    d = dim or query.shape[0]
    planes = md5_planes(n_planes, d, seed=seed)
    q_key = int(hyperplane_lsh_keys(query[None, :], planes)[0])
    query_ref = ray.put(query)

    def candidates(batch: pa.Table) -> pa.Table:
        q = ray.get(query_ref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        mat = _batch_matrix(batch, vec_col)
        keys = hyperplane_lsh_keys(mat, planes)
        mask = keys == q_key
        if not mask.any():
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        idx = np.nonzero(mask)[0]
        scores = cosine_scores(mat[idx], q)
        # stable sort over id-ordered rows → ties at the k cut keep the
        # lowest id (the SQL twin's ORDER BY score DESC, id)
        ids = np.asarray(batch[id_col]).astype(np.int64)[idx]
        byid = np.argsort(ids, kind="stable")
        take = byid[np.argsort(-scores[byid], kind="stable")[:k]]
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx[take])),
            "score": pa.array(scores[take], type=pa.float64()),
        })

    partial = embeddings.map_batches(candidates, batch_format="pyarrow")
    top = partial.sort(["score", id_col], descending=[True, False]).limit(k)
    if round_to is not None:
        top = top.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("score"),
                "score",
                pa.array(np.round(t["score"].to_numpy(), round_to)),
            ),
            batch_format="pyarrow",
        )
    return top


def ivf_topk(
    embeddings: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """IVF-flat approximate top-k: vectors are partitioned by nearest
    centroid (the inverted-file coarse quantizer); the query scans only
    the ``n_probe`` nearest partitions and re-scores those exactly.

    Centroids are md5-derived unit vectors (functions/md5vec.py — the
    deterministic stand-in for k-means centroids, giving the structure an
    exact DuckDB twin; a trained quantizer would slot into the same
    assignment stage).  Assignment happens INSIDE map_batches — one
    (B, d) @ (d, C) matmul per batch, no shuffle; at scale the natural
    extension is writing the assignment out as a partition column so
    probes prune at the READ (partitioned parquet), which this layout
    makes trivial.  Ties in centroid distance go to the lowest centroid
    id; final ordering is (score DESC, id), matching the SQL twin."""
    query = np.asarray(query_vec, dtype=np.float64)
    d = dim or query.shape[0]
    cents = ivf_centroids(n_centroids, d, seed)

    # probe set: centroids nearest to the query by cosine (equivalently
    # max dot against unit centroids)
    qsims = cents @ (query / max(np.linalg.norm(query), 1e-30))
    order = np.lexsort((np.arange(n_centroids), -qsims))
    probes = np.sort(order[:n_probe])
    query_ref = ray.put((query, cents, probes))

    def candidates(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(query_ref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        mat = _batch_matrix(batch, vec_col)
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        sims = unit @ c.T  # (B, C)
        # argmax with lowest-id tie-break: argmax returns the FIRST max
        assign = np.argmax(sims, axis=1)
        mask = np.isin(assign, pr)
        if not mask.any():
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        idx = np.nonzero(mask)[0]
        scores = cosine_scores(mat[idx], q)
        ids = np.asarray(batch[id_col]).astype(np.int64)[idx]
        byid = np.argsort(ids, kind="stable")
        take = byid[np.argsort(-scores[byid], kind="stable")[:k]]
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx[take])),
            "score": pa.array(scores[take], type=pa.float64()),
        })

    partial = embeddings.map_batches(candidates, batch_format="pyarrow")
    top = partial.sort(["score", id_col], descending=[True, False]).limit(k)
    if round_to is not None:
        top = top.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("score"),
                "score",
                pa.array(np.round(t["score"].to_numpy(), round_to)),
            ),
            batch_format="pyarrow",
        )
    return top


def multiquery_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Batched exact ANN: top-k by cosine for MANY queries at once.

    The (Q, d) query matrix is unit-normalized once and broadcast via
    ``ray.put``; every batch does ONE (B, d) @ (d, Q) matmul and emits its
    local top-k rows per query (arg-partition per column), so the shuffle
    carries k × Q × n_batches rows; the final per-query exact top-k is a
    tiny bucketed ``groupby(query_id)``.  This is the batched form of
    :func:`topk_cosine` — amortizing the data pass across the whole query
    set is the scale play (one corpus scan regardless of Q).
    """
    import pandas as pd

    q = np.asarray(query_mat, dtype=np.float64)
    q_unit = q / np.maximum(np.linalg.norm(q, axis=1), 1e-30)[:, None]
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qids, q_unit))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids_q, qu = ray.get(ref)
        if batch.num_rows == 0:  # argsort on an empty axis would raise
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        mat = _batch_matrix(batch, vec_col)
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        scores = unit @ qu.T  # (B, Q)
        kk = min(k, scores.shape[0])
        # deterministic boundary ties: pre-order rows by vec_id, then a
        # STABLE descending-score argsort per query column — equal scores
        # at the kk cut keep the lowest vec_id, matching the SQL oracle's
        # (score DESC, vec_id) ordering
        ids_rows = np.asarray(batch[id_col]).astype(np.int64)
        byid = np.argsort(ids_rows, kind="stable")
        take = np.argsort(-scores[byid], axis=0, kind="stable")[:kk]  # (kk, Q)
        rows = byid[take.ravel(order="F")]
        out_q = np.repeat(ids_q, kk)
        out_s = scores[rows, np.repeat(np.arange(len(ids_q)), kk)]
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: batch[id_col].take(pa.array(rows)),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    def final_topk(group: "pd.DataFrame") -> pa.Table:
        g = (
            group.sort_values(["query_id", "score", id_col],
                              ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(k)
        )
        score = g["score"].to_numpy()
        if round_to is not None:
            score = np.round(score, round_to)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(), type=pa.int64()),
                id_col: pa.array(g[id_col].to_numpy(), type=pa.int64()),
                "score": pa.array(score, type=pa.float64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "qbucket",
            pa.array((batch["query_id"].to_numpy() % 16).astype(np.int64)),
        )

    return (
        embeddings.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("qbucket")
        .map_groups(final_topk, batch_format="pandas")
    )


def ivf_centroids(n_centroids: int, dim: int, seed: int = 7) -> np.ndarray:
    """The md5-derived unit-vector coarse quantizer shared by
    :func:`ivf_topk` and the partitioned index (deterministic stand-in for
    k-means; a trained quantizer slots into the same call sites)."""
    from ner_funtool_ray.functions.md5vec import md5_unit_batch

    keys = [f"ivf:{seed}:{c}:{l}" for c in range(n_centroids) for l in range(dim)]
    cents = md5_unit_batch(keys).reshape(n_centroids, dim)
    return cents / np.maximum(np.linalg.norm(cents, axis=1), 1e-30)[:, None]


def build_ivf_index(
    embeddings: "ray.data.Dataset",
    out_dir: str,
    n_centroids: int = 16,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Materialize the IVF layout as PARTITIONED parquet: one
    ``centroid=<c>`` directory per coarse cell, so queries prune at the
    READ (only ``n_probe`` directories are opened) instead of filtering
    after a full scan.  This is :func:`ivf_topk`'s documented scale path:
    the assignment matmul runs once at build time inside map_batches (no
    shuffle — write_parquet splits partitions per block), and each
    directory is independently resumable output."""
    cref = ray.put(ivf_centroids(n_centroids, dim, seed))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _batch_matrix(batch, vec_col)
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        a = np.argmax(unit @ c.T, axis=1)  # first max = lowest centroid id
        return batch.append_column("centroid", pa.array(a.astype(np.int64)))

    embeddings.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["centroid"]
    )
    return out_dir


def query_ivf_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Query the partitioned IVF index: select the ``n_probe`` centroids
    nearest the query, read ONLY their directories, and re-score the
    candidates exactly.  Produces the same rows as :func:`ivf_topk` with
    the same parameters (tested), but the non-probed partitions are never
    read from storage."""
    import os

    query = np.asarray(query_vec, dtype=np.float64)
    cents = ivf_centroids(n_centroids, query.shape[0], seed)
    qsims = cents @ (query / max(np.linalg.norm(query), 1e-30))
    order = np.lexsort((np.arange(n_centroids), -qsims))
    probes = np.sort(order[:n_probe])

    # a LIST of paths is treated as files by read_parquet — expand each
    # probed directory to its parquet files
    dirs = [
        p for p in (os.path.join(index_dir, f"centroid={c}") for c in probes)
        if os.path.isdir(p)
    ]
    paths = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})
        )
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    qref = ray.put(query)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        mat = _batch_matrix(batch, vec_col)
        scores = cosine_scores(mat, q)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        byid = np.argsort(ids, kind="stable")
        take = byid[np.argsort(-scores[byid], kind="stable")[:k]]
        return pa.table({
            id_col: batch[id_col].take(pa.array(take)),
            "score": pa.array(scores[take], type=pa.float64()),
        })

    top = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )
    if round_to is not None:
        top = top.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("score"),
                "score",
                pa.array(np.round(t["score"].to_numpy(), round_to)),
            ),
            batch_format="pyarrow",
        )
    return top


def pq_codebook(
    m: int, ksub: int, dsub: int, seed: int = 7
) -> np.ndarray:
    """(m, ksub, dsub) product-quantization codebook with md5-derived
    entries — the deterministic stand-in for per-subspace k-means (same
    convention as :func:`ivf_centroids`, giving IVF-PQ an exact DuckDB
    twin; trained codebooks slot into the same call sites).  Entry
    ``[s, c, j]`` is ``md5_unit('pq:<seed>:<s>:<c>:<j>')``."""
    from ner_funtool_ray.functions.md5vec import md5_unit_batch

    keys = [
        f"pq:{seed}:{s}:{c}:{j}"
        for s in range(m)
        for c in range(ksub)
        for j in range(dsub)
    ]
    return md5_unit_batch(keys).reshape(m, ksub, dsub)


def pq_encode(unit: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(N, m) uint8 PQ codes for unit-normalized rows: per subspace the
    nearest codebook entry by squared L2, ties to the lowest code id
    (np.argmin returns the first minimum, matching the SQL
    ``row_number() ... ORDER BY d2 ASC, c`` tie-break)."""
    m, ksub, dsub = cb.shape
    sub = unit.reshape(unit.shape[0], m, dsub)
    # (N, m, ksub): squared distance of each subvector to each entry
    d2 = ((sub[:, :, None, :] - cb[None]) ** 2).sum(axis=-1)
    return np.argmin(d2, axis=-1).astype(np.uint8)


def ivfpq_topk(
    embeddings: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """IVF-PQ approximate top-k — the memory-compressed scale path of the
    ANN family: vectors in the ``n_probe`` probed coarse cells are ranked
    by ASYMMETRIC DISTANCE (the dot of the query against each vector's
    product-quantized reconstruction, computed as ``m`` lookups into a
    per-query table), never by the raw floats.  At 100 TB the codes are
    ``m`` bytes per vector (64 B of float32 → 8 B here), so a worker
    holds ~50× more index in heap than IVF-flat; the probed-cell scan
    layout is identical to :func:`query_ivf_index`'s partitioned parquet.

    Fully deterministic (md5-derived coarse centroids AND codebook), so
    the whole path — assignment, probes, codes, ADC ranking — has an
    exact DuckDB twin.  Output ``(vec_id, score)`` where score is the ADC
    approximation of cosine (query side exactly unit-normalized), ordered
    (score DESC, id).

    Ranking happens on the ROUNDED score (``round_to``, default 4): PQ
    maps different vectors to identical codes, so exact ADC ties at the
    k boundary are COMMON, and the SQL twin assembles each adc as a
    hash-agg ``sum`` of 8 joined doubles whose order isn't bit-stable
    between tied groups — ranking full-precision values there flips the
    boundary id nondeterministically (observed: two vectors tied at
    rank 10/11).  Rounding first makes the (score, id) tie-break decide
    identically in both engines; the residual x.xxxx5-boundary rounding
    hazard is the documented millibit-style cross-engine risk."""
    query = np.asarray(query_vec, dtype=np.float64)
    d = dim or query.shape[0]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    cents = ivf_centroids(n_centroids, d, seed)
    cb = pq_codebook(m, ksub, dsub, seed)

    qunit = query / max(np.linalg.norm(query), 1e-30)
    qsims = cents @ qunit
    order = np.lexsort((np.arange(n_centroids), -qsims))
    probes = np.sort(order[:n_probe])
    # per-query ADC lookup table: lut[s, c] = dot(q_s, cb[s, c])
    lut = np.einsum("sj,scj->sc", qunit.reshape(m, dsub), cb)
    shared = ray.put((cents, probes, cb, lut))

    def candidates(batch: pa.Table) -> pa.Table:
        c, pr, book, table = ray.get(shared)
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        mat = _batch_matrix(batch, vec_col)
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        assign = np.argmax(unit @ c.T, axis=1)  # first max = lowest id
        mask = np.isin(assign, pr)
        if not mask.any():
            return empty
        idx = np.nonzero(mask)[0]
        codes = pq_encode(unit[idx], book)  # (B', m)
        adc = table[np.arange(book.shape[0])[None, :], codes].sum(axis=1)
        if round_to is not None:
            adc = np.round(adc, round_to)
        ids = np.asarray(batch[id_col]).astype(np.int64)[idx]
        byid = np.argsort(ids, kind="stable")
        take = byid[np.argsort(-adc[byid], kind="stable")[:k]]
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx[take])),
            "score": pa.array(adc[take], type=pa.float64()),
        })

    partial = embeddings.map_batches(candidates, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)
