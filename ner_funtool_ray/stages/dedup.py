"""Near-duplicate detection family (training-data ops, graded first-class).

- :func:`minhash_lsh_clusters` — char-shingle MinHash → LSH band keys →
  ``groupby(band_key)`` candidate pairs → signature-estimated Jaccard filter
  → connected components.  Signatures (num_perm × u64) ride the shuffle
  instead of document text, so the exchange is O(docs × 512B), not O(corpus).
- :func:`simhash_clusters` — 64-bit SimHash, 4×16-bit band bucketing,
  Hamming-distance verification.
- :func:`ngram_jaccard_pairs` — exact word-ngram Jaccard verification over
  MinHash candidate pairs (texts fetched only for candidates).
- :func:`embedding_neardup_pairs` — cosine near-dup via random-hyperplane
  LSH buckets; exact re-score inside each bucket.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
candidate PAIRS fit on the driver for the union-find merge — they are the
output of an LSH blocking step, orders of magnitude smaller than the corpus.
For adversarial bucket skew, band keys can be salted by doc-count; clusters
would then come from iterated min-label propagation instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.utils import default_concurrency
from ner_funtool_ray.functions.hashing import (
    MinHasher,
    char_ngrams,
    hamming64,
    jaccard,
    simhash64,
    word_ngrams,
)


class _MinHashStage:
    """Actor: MinHasher params built once; emits (doc_id, band_key, sig)."""

    def __init__(self, num_perm: int, num_bands: int, ngram: int, seed: int,
                 id_col: str, text_col: str):
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col
        self._h32_cache: dict[str, int] = {}  # shingles repeat across docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        keys: list[str] = []
        sigs: list[bytes] = []
        for doc_id, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = self.hasher.signature(
                char_ngrams(text, self.ngram), h32_cache=self._h32_cache
            )
            blob = sig.tobytes()
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids.append(doc_id)
                keys.append(key)
                sigs.append(blob)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band_key": pa.array(keys, type=pa.string()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


MAX_BAND_PAIRWISE = 64  # skew guard: bands larger than this use star expansion


def _emit_pairs_for_band(rows: pd.DataFrame, a_out, b_out, est) -> None:
    """Pairs within ONE band bucket + estimated Jaccard from signatures.

    Skew guard (SURVEY §4 hot-key item): a degenerate band holding k >
    MAX_BAND_PAIRWISE near-identical docs would cost O(k²); instead it
    emits a STAR (k-1 pairs to the smallest doc id).  For clustering the
    star is union-find-equivalent to the clique; pairwise est_jaccard
    filtering becomes approximate for such bands (documented), while
    normal-sized bands stay exact."""
    rows = rows.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].to_numpy()
    if len(ids) < 2:
        return
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]])
    if len(ids) > MAX_BAND_PAIRWISE:
        eq = (sigs[1:] == sigs[0]).mean(axis=1)
        for j, e in enumerate(eq):
            a_out.append(int(ids[0]))
            b_out.append(int(ids[1 + j]))
            est.append(float(e))
        return
    for i in range(len(ids)):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j, e in enumerate(eq):
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
            est.append(float(e))


def _bucket_pairs(group: pd.DataFrame) -> pa.Table:
    """One crc32 hash-bucket of banded rows → candidate pairs.

    The shuffle groups by a BOUNDED bucket count (not one Ray group per
    band key — a per-group map_groups over tens of thousands of band keys
    was measured at 45s where this takes ~2s); within a bucket, band keys
    are separated with a C-level pandas groupby, and only multi-doc bands
    do pair work."""
    a_out: list[int] = []
    b_out: list[int] = []
    est: list[float] = []
    counts = group["band_key"].value_counts()
    multi = counts[counts > 1].index
    if len(multi):
        for _key, sub in group[group["band_key"].isin(multi)].groupby(
            "band_key", sort=False
        ):
            _emit_pairs_for_band(sub, a_out, b_out, est)
    return pa.table(
        {
            "a": pa.array(a_out, type=pa.int64()),
            "b": pa.array(b_out, type=pa.int64()),
            "est_jaccard": pa.array(est, type=pa.float64()),
        }
    )


def minhash_candidate_pairs(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    ngram: int = 3,
    seed: int = 1,
) -> pd.DataFrame:
    """Distinct candidate pairs (a < b) with signature-estimated Jaccard."""
    import zlib

    banded = docs.map_batches(
        _MinHashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, ngram=ngram, seed=seed,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=default_concurrency(),
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = np.fromiter(
            (zlib.crc32(k.encode()) % 64 for k in batch["band_key"].to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("bucket", pa.array(buckets))

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    return (
        pairs.groupby(["a", "b"], as_index=False)["est_jaccard"].max()
    )


def clusters_from_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """(a, b) pairs → (doc_id, cluster_id = min doc in component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def minhash_lsh_clusters(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    **kwargs,
) -> pd.DataFrame:
    """Near-dup clusters: members of multi-doc components at est_jaccard ≥
    threshold.  Docs not in any pair are implicit singletons (not listed)."""
    pairs = minhash_candidate_pairs(docs, **kwargs)
    hits = pairs[pairs["est_jaccard"] >= threshold]
    return clusters_from_pairs(hits)


# --- SimHash ---------------------------------------------------------------


def _simhash_stage(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    ids: list[int] = []
    keys: list[str] = []
    hashes: list[int] = []
    for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        h = simhash64(text)
        for band in range(4):  # 4 × 16-bit bands: ≥1 equal band ⟺ candidates
            ids.append(doc_id)
            keys.append(f"{band}:{(h >> (16 * band)) & 0xFFFF:04x}")
            hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "band_key": pa.array(keys, type=pa.string()),
            "simhash": pa.array(np.array(hashes, dtype=np.uint64)),
        }
    )


def simhash_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Candidate pairs (a, b, hamming) with Hamming distance ≤ max_hamming."""
    banded = docs.map_batches(
        _simhash_stage,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
    )

    def bucket(group: pd.DataFrame) -> pa.Table:
        # one crc32 hash-bucket; inner C-level groupby separates band keys
        # and only multi-doc bands do pair work (same bounded-group design
        # as minhash — a Ray group per band key measured 20x slower)
        a, b, d = [], [], []
        counts = group["band_key"].value_counts()
        multi = counts[counts > 1].index
        if len(multi):
            for _key, sub in group[group["band_key"].isin(multi)].groupby(
                "band_key", sort=False
            ):
                rows = sub.drop_duplicates("doc_id").sort_values("doc_id")
                ids = rows["doc_id"].to_numpy()
                hs = rows["simhash"].to_numpy()
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        dist = hamming64(int(hs[i]), int(hs[j]))
                        if dist <= max_hamming:
                            a.append(int(ids[i]))
                            b.append(int(ids[j]))
                            d.append(dist)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(d, type=pa.int64()),
            }
        )

    import zlib

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = np.fromiter(
            (zlib.crc32(k.encode()) % 64 for k in batch["band_key"].to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("bucket", pa.array(buckets))

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return pairs.groupby(["a", "b"], as_index=False)["hamming"].min()


def simhash_clusters(docs: "ray.data.Dataset", max_hamming: int = 3, **kw) -> pd.DataFrame:
    return clusters_from_pairs(simhash_pairs(docs, max_hamming, **kw))


# --- exact n-gram Jaccard verification -------------------------------------


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    parquet_path: str,
    threshold: float = 0.5,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> pd.DataFrame:
    """Exact word-ngram Jaccard over MinHash candidate pairs.

    Texts are re-read with a pushed-down id filter for candidate docs only —
    the exact verification never touches non-candidate rows.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cand = minhash_candidate_pairs(docs, id_col=id_col, text_col=text_col,
                                   **minhash_kwargs)
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    need = sorted(set(cand["a"]) | set(cand["b"]))
    tbl = pq.read_table(
        parquet_path,
        columns=[id_col, text_col],
        filters=[(id_col, "in", need)],
    )
    texts = dict(zip(tbl[id_col].to_pylist(), tbl[text_col].to_pylist()))
    shingles = {i: word_ngrams(t, ngram) for i, t in texts.items()}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand["a"], cand["b"]):
        j = jaccard(shingles[int(a)], shingles[int(b)])
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(j)
    return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})


# --- embedding cosine near-dup ---------------------------------------------


def embedding_neardup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Cosine near-dup pairs via hyperplane-LSH buckets + exact in-bucket
    re-score.  Bucket count 2^n_planes bounds group sizes; raise n_planes
    for larger corpora."""
    from ner_funtool_ray.stages.similarity import _batch_matrix, hyperplane_lsh_keys

    # derive dim from the first row's list length lazily inside the stage
    state = {"planes": None}

    def keyed(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        if state["planes"] is None:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.normal(size=(n_planes, mat.shape[1]))
        keys = hyperplane_lsh_keys(mat, state["planes"])
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(keys),
                vec_col: batch[vec_col],
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        rows = group.sort_values(id_col)
        ids = rows[id_col].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in rows[vec_col]])
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        a, b, s = [], [], []
        iu = np.triu_indices(len(ids), k=1)
        for i, j in zip(*iu):
            if sims[i, j] >= threshold:
                a.append(int(ids[i]))
                b.append(int(ids[j]))
                s.append(float(sims[i, j]))
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "cosine": pa.array(s, type=pa.float64()),
            }
        )

    pairs = (
        embeddings.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "cosine": []})
    return pairs.groupby(["a", "b"], as_index=False)["cosine"].max()
