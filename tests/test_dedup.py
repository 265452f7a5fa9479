"""Dedup family: MinHash-LSH finds planted near-dups, estimates track true
Jaccard, SimHash clusters exact dups, embedding near-dup symmetric."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.functions.hashing import (
    MinHasher,
    char_ngrams,
    jaccard,
    simhash64,
)
from ner_funtool_ray.stages.dedup import (
    clusters_from_pairs,
    embedding_neardup_pairs,
    minhash_candidate_pairs,
    minhash_lsh_clusters,
    simhash_clusters,
)


def _docs():
    base = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    near = base.replace("lazy", "sleepy")  # near-dup of 0
    other = "completely different content about ray data pipelines and arrow"
    rows = [base, near, base, other, "short text here totally unrelated words"]
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(rows))), "text": rows})
    ), rows


def test_minhash_estimate_tracks_jaccard():
    h = MinHasher(num_perm=256, seed=1)
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox leaps over the lazy dog"
    sa, sb = char_ngrams(a), char_ngrams(b)
    est = (h.signature(sa) == h.signature(sb)).mean()
    true = jaccard(sa, sb)
    assert abs(est - true) < 0.15


def test_minhash_lsh_finds_planted_dups():
    ds, rows = _docs()
    pairs = minhash_candidate_pairs(ds, num_perm=64, num_bands=16)
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 2) in found  # exact dup pair
    est_exact = pairs[(pairs["a"] == 0) & (pairs["b"] == 2)]["est_jaccard"].iloc[0]
    assert est_exact == 1.0
    clusters = minhash_lsh_clusters(ds, threshold=0.7, num_perm=64, num_bands=16)
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert cl.get(0) == cl.get(2) == 0
    assert 3 not in cl  # unrelated doc is a singleton


def test_minhash_deterministic():
    ds, _ = _docs()
    p1 = minhash_candidate_pairs(ds, num_perm=64, num_bands=16)
    p2 = minhash_candidate_pairs(ds, num_perm=64, num_bands=16)
    pd.testing.assert_frame_equal(
        p1.sort_values(["a", "b"]).reset_index(drop=True),
        p2.sort_values(["a", "b"]).reset_index(drop=True),
    )


def test_simhash_exact_dup_cluster():
    ds, _ = _docs()
    assert simhash64("same words here") == simhash64("same words here")
    clusters = simhash_clusters(ds, max_hamming=3)
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert cl.get(0) == cl.get(2) == 0


def test_clusters_from_pairs_union_find():
    pairs = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
    cl = clusters_from_pairs(pairs)
    m = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10


def test_oversized_band_star_guard_keeps_cluster():
    # 100 identical docs → bands far exceed MAX_BAND_PAIRWISE; the star
    # expansion must still produce ONE cluster containing all of them
    text = "identical content repeated across many documents for dedup"
    n = 100
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(n)), "text": [text] * n})
    )
    clusters = minhash_lsh_clusters(ds, threshold=0.9, num_perm=64, num_bands=16)
    assert len(clusters) == n
    assert set(clusters["cluster_id"]) == {0}


def test_embedding_neardup():
    rng = np.random.default_rng(0)
    base = rng.normal(size=32)
    near = base + rng.normal(scale=0.01, size=32)  # cosine ≈ 1
    far = rng.normal(size=32)
    tbl = pa.table(
        {
            "vec_id": [0, 1, 2],
            "embedding": pa.array(
                [base.astype(np.float32).tolist(),
                 near.astype(np.float32).tolist(),
                 far.astype(np.float32).tolist()],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pairs = embedding_neardup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95, n_planes=2
    )
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found
