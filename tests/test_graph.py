"""Non-default-path tests for pipelines/graph.py plus the funnel and
bigram-commonality invariants.  The default plans' oracle equivalence is
covered by the parametrized sweep in test_queries_oracle.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from ner_funtool_ray.pipelines.graph import (
    BASE,
    SCALE,
    _pagerank_numpy,
    pagerank_ds,
)

SF_DIR = "/root/testdata/sf0.001"


def _random_graph(seed: int, n: int = 50, m: int = 300):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 6, len(src)).astype(np.int64)
    return src, dst, w, n


def test_pagerank_distributed_matches_numpy_core():
    src, dst, w, n = _random_graph(11)
    ref = _pagerank_numpy(src, dst, w, n, iters=5)
    names = np.array([f"ent:n{i:03d}" for i in range(n)])
    nodes = ray.data.from_arrow(pa.table({"entity_id": pa.array(names)}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(names[src]),
                "dst": pa.array(names[dst]),
                "weight": pa.array(w),
            }
        )
    )
    out = (
        pagerank_ds(nodes, edges, iters=5)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["pagerank_fp"].to_numpy(), ref)


def test_pagerank_sink_and_source_invariants():
    # star graph: 0 -> {1..4}; node 0 has no in-edges -> rank BASE after
    # any iteration; leaves split node 0's rank mass equally
    src = np.zeros(4, dtype=np.int64)
    dst = np.arange(1, 5, dtype=np.int64)
    w = np.ones(4, dtype=np.int64)
    r = _pagerank_numpy(src, dst, w, 5, iters=3)
    assert r[0] == BASE
    assert len(set(r[1:].tolist())) == 1
    assert r[1] > BASE
    # no node below the teleport floor, none above total mass
    assert (r >= BASE).all() and (r < 5 * SCALE).all()


def test_pagerank_iteration_zero_is_scale():
    src, dst, w, n = _random_graph(3)
    assert (_pagerank_numpy(src, dst, w, n, iters=0) == SCALE).all()


def test_funnel_counts_match_per_user_bruteforce():
    from ner_funtool_ray.pipelines.relational import user_funnel_counts

    got = (
        user_funnel_counts(SF_DIR)
        .to_pandas()
        .set_index("stage")["n_users"]
        .to_dict()
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    s1 = s2 = s3 = 0
    for _, g in ev.groupby("user_id"):
        v = g.loc[g["event_type"] == "view", "ts"]
        if v.empty:
            continue
        s1 += 1
        t1 = v.min()
        c = g.loc[(g["event_type"] == "click") & (g["ts"] > t1), "ts"]
        if c.empty:
            continue
        s2 += 1
        t2 = c.min()
        p = g.loc[(g["event_type"] == "purchase") & (g["ts"] > t2), "ts"]
        if not p.empty:
            s3 += 1
    assert got == {"view": s1, "click": s2, "purchase": s3}
    assert got["view"] >= got["click"] >= got["purchase"]


def test_bigram_commonality_counter_fallback_matches_polars_path():
    import unittest.mock as mock

    import ner_funtool_ray.pipelines.analytic as A

    def norm(df):
        return (
            df[sorted(df.columns)]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    got = norm(A.doc_bigram_commonality(SF_DIR).to_pandas())
    real_import = (
        __builtins__["__import__"]
        if isinstance(__builtins__, dict)
        else __builtins__.__import__
    )

    def no_polars(name, *a, **k):
        if name == "polars":
            raise ImportError("forced")
        return real_import(name, *a, **k)

    with mock.patch("builtins.__import__", side_effect=no_polars):
        fb = norm(A.doc_bigram_commonality(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(got, fb, check_dtype=False)


def test_bigram_commonality_threshold_monotone():
    from ner_funtool_ray.pipelines.analytic import doc_bigram_commonality

    lo = (
        doc_bigram_commonality(SF_DIR, min_count=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    hi = (
        doc_bigram_commonality(SF_DIR, min_count=10**9)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # min_count=1: every bigram is common; huge threshold: none are
    assert (lo["n_common"] == lo["n_bigrams"]).all()
    assert (hi["n_common"] == 0).all()
    assert lo["n_bigrams"].equals(hi["n_bigrams"])


def test_bfs_depth_matches_bruteforce_bfs():
    from collections import deque

    from ner_funtool_ray.pipelines.graph import entity_bfs_depth
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    got = (
        entity_bfs_depth(SF_DIR)
        .to_pandas()
        .set_index("entity_id")["depth"]
        .to_dict()
    )
    df = kg_from_sf_dir(SF_DIR).to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = sorted(df.loc[df["pred"] == "appears_in", "subj"].unique())
    adj = {n: set() for n in nodes}
    for s, o in zip(cooc["subj"], cooc["obj"]):
        adj[s].add(o)
        adj[o].add(s)
    depth = {n: -1 for n in nodes}
    depth[nodes[0]] = 0
    q = deque([nodes[0]])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if depth[v] == -1 and depth[u] < 6:
                depth[v] = depth[u] + 1
                q.append(v)
    assert got == depth


def test_triangle_counts_match_bruteforce_on_sparse_graph():
    from itertools import combinations

    import numpy as np

    # sparse random graph -> diag(A^3)//2 equals explicit enumeration
    rng = np.random.default_rng(23)
    n = 30
    edges = {
        (a, b)
        for a, b in zip(rng.integers(0, n, 60), rng.integers(0, n, 60))
        if a < b
    }
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        A[a, b] = A[b, a] = 1
    per_node = np.diagonal(A @ A @ A) // 2
    expect = np.zeros(n, dtype=np.int64)
    for x, y, z in combinations(range(n), 3):
        if (x, y) in edges and (y, z) in edges and (x, z) in edges:
            expect[[x, y, z]] += 1
    assert np.array_equal(per_node, expect)
