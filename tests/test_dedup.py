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
    clusters_from_pairs_ds,
    embedding_neardup_exact,
    embedding_neardup_pairs,
    minhash_candidate_pairs,
    minhash_lsh_clusters,
    ngram_jaccard_pairs,
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
    clusters = minhash_lsh_clusters(
        ds, threshold=0.7, num_perm=64, num_bands=16
    ).to_pandas()
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
    clusters = simhash_clusters(ds, max_hamming=3).to_pandas()
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
    clusters = minhash_lsh_clusters(
        ds, threshold=0.9, num_perm=64, num_bands=16
    ).to_pandas()
    assert len(clusters) == n
    assert set(clusters["cluster_id"]) == {0}


def test_distributed_clusters_match_union_find():
    # Pair graph bigger than any single band: chains (worst case for
    # propagation depth), cliques and singleton pairs; the distributed
    # min-label propagation must agree with the driver union-find oracle
    # exactly — and at this size nothing funnels through the driver.
    rng = np.random.default_rng(5)
    a, b = [], []
    for start in range(0, 3000, 30):  # 100 chains of 30 nodes
        for i in range(start, start + 29):
            a.append(i)
            b.append(i + 1)
    for c in range(20):  # 20 cliques of 12 nodes
        nodes = 10_000 + c * 12 + np.arange(12)
        for i in range(12):
            for j in range(i + 1, 12):
                a.append(int(nodes[i]))
                b.append(int(nodes[j]))
    perm = rng.permutation(len(a))
    pairs = pd.DataFrame({"a": np.array(a)[perm], "b": np.array(b)[perm]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    want = clusters_from_pairs(pairs)
    # distributed min-label propagation (cap forced below the edge count)
    got = (
        clusters_from_pairs_ds(ds, driver_cap=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # size-guarded driver fast path must produce identical labels
    fast = (
        clusters_from_pairs_ds(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast.astype("int64"), want.astype("int64"))


def test_clusters_from_pairs_ds_empty():
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    )
    out = clusters_from_pairs_ds(ds)
    assert out.count() == 0
    # (empty-Dataset to_pandas drops columns — assert on the Arrow schema)
    assert out.schema().names == ["doc_id", "cluster_id"]


def test_ngram_jaccard_exact_vs_bruteforce():
    from ner_funtool_ray.functions.hashing import jaccard, word_ngrams

    ds, rows = _docs()
    got = (
        ngram_jaccard_pairs(ds, threshold=0.3, ngram=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            jac = jaccard(word_ngrams(rows[i], 2), word_ngrams(rows[j], 2))
            if jac >= 0.3:
                want.append((i, j, jac))
    assert list(map(tuple, got[["a", "b"]].to_numpy())) == [
        (w[0], w[1]) for w in want
    ]
    assert np.allclose(got["jaccard"].to_numpy(), [w[2] for w in want])


def test_embedding_neardup_exact_vs_bruteforce():
    rng = np.random.default_rng(3)
    n, d = 40, 16
    mat = rng.normal(size=(n, d))
    mat[7] = mat[3] + rng.normal(scale=0.01, size=d)  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    got = (
        embedding_neardup_exact(ray.data.from_arrow(tbl), threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    m32 = mat.astype(np.float32).astype(np.float64)
    unit = m32 / np.linalg.norm(m32, axis=1)[:, None]
    sims = unit @ unit.T
    want = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= 0.5
    ]
    assert list(map(tuple, got[["a", "b"]].to_numpy())) == want
    assert (3, 7) in want


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
    ).to_pandas()  # Dataset since r3 (driver-materialization fix)
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found


def test_simhash_stage_cache_parity():
    # the actor's memoized per-token hashing must equal simhash64 exactly
    # (the SQL oracle depends on it)
    from ner_funtool_ray.stages.dedup import _SimHashStage

    stage = _SimHashStage("doc_id", "text")
    texts = [
        "the quick brown fox the fox",
        "",
        "duplicate duplicate duplicate",
        "中国 首都 北京",
    ]
    for t in texts:
        assert stage._simhash(t) == simhash64(t)
    # run twice — cache hits must not change results
    for t in texts:
        assert stage._simhash(t) == simhash64(t)


def test_multiquery_topk_tie_break_and_empty_batch():
    # equal scores at the local-topk boundary must keep the LOWEST vec_id
    # (the SQL oracle's (score DESC, vec_id) order), and an empty block
    # must not crash the local stage
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ner_funtool_ray.stages.similarity import multiquery_topk

    # 8 identical unit vectors → all scores tie at 1.0; k=3 must pick ids 0,1,2
    vecs = [[1.0, 0.0]] * 8
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(8)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
        }
    )
    empty = tbl.slice(0, 0)
    ds = ray.data.from_arrow([tbl.slice(0, 4), empty, tbl.slice(4, 4)])
    out = (
        multiquery_topk(
            ds, np.array([7]), np.array([[1.0, 0.0]]), k=3
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(out["vec_id"]) == [0, 1, 2]
    assert (out["score"] == 1.0).all()


def test_ngram_jaccard_max_df_cap_binds_identically_to_sql_rule():
    # when the stop-shingle cap binds, the engine must drop EXACTLY the
    # shingles with df > max_df (the SQL twin's HAVING count(*) <= cap)
    import duckdb
    import pyarrow as pa
    import ray.data

    from ner_funtool_ray.stages.dedup import ngram_jaccard_pairs

    texts = {
        1: "hot hot alpha beta",     # bigrams: 'hot hot','hot alpha','alpha beta'
        2: "hot hot alpha beta",     # near-identical to 1
        3: "hot hot gamma delta",
        4: "hot hot gamma delta",
        5: "hot hot other words",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("docs", tbl)
    expect = con.sql("""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks FROM docs
    ),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(
        generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])) AS sh
      FROM toks
    ),
    d AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM sh),
    keep AS (SELECT s FROM d GROUP BY s HAVING count(*) <= 2),
    pairs AS (
      SELECT x.doc_id AS a, y.doc_id AS b, x.n AS n_a, y.n AS n_b, count(*)::BIGINT AS inter
      FROM d x JOIN d y ON x.s = y.s AND x.doc_id < y.doc_id
      JOIN keep k ON k.s = x.s GROUP BY 1,2,3,4
    )
    SELECT a, b, inter / (n_a + n_b - inter) AS jaccard
    FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.5
    ORDER BY a, b
    """).df()
    got = (
        ngram_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.5, max_df=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # 'hot hot' (df=5) is dropped by the cap on both engines; the rare
    # shingles still pair (1,2) and (3,4)
    assert list(zip(expect["a"], expect["b"])) == [(1, 2), (3, 4)]
    import pandas as pd
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_ivf_topk_probes_own_partition_and_orders():
    # the query's own partition is always probed (its centroid ranks first),
    # so the query vector itself must come back at rank 1 with score 1.0
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ner_funtool_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(12)
    n, d = 200, 64
    mat = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n)), type=pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    q = mat[0].astype(np.float32).astype(np.float64)
    out = ivf_topk(
        ray.data.from_arrow(tbl), q, k=5, n_centroids=8, n_probe=2
    ).to_pandas()
    assert len(out) >= 1
    assert out.iloc[0]["vec_id"] == 0
    assert out.iloc[0]["score"] == 1.0
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()


def test_dedup_normalized_best_planted(ray_session, tmp_path):
    """Quality-priority keep: punctuation variants of one doc collapse to a
    single normalized group; the LONGEST raw form wins, ties by min id."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.textops import dedup_normalized_best

    docs = [
        (1, "the quick brown fox"),            # 19 chars
        (2, "The quick, brown fox!!"),         # 22 chars → kept
        (3, "THE QUICK BROWN FOX"),            # 19 chars
        (4, "a different document entirely"),  # own group
        (5, "The quick, brown fox??"),         # 22 chars, tie → id 2 wins
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": [t for _, t in docs],
                "n_chars": pa.array(
                    [len(t) for _, t in docs], type=pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = (
        dedup_normalized_best(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [2, 4]
    assert out.loc[2, "group_size"] == 4
    assert out.loc[4, "group_size"] == 1
    # bucket-count invariance: the argmax must not depend on layout
    out2 = dedup_normalized_best(str(tmp_path), n_buckets=3).to_pandas()
    assert sorted(out2["doc_id"]) == [2, 4]
