"""Distributed general-graph cores (stages/graphops.py).

Two test families:

1. PARITY: every ``pipelines/graph.py`` entity op runs its driver numpy
   core (default cap) and its distributed core (``driver_cap=0``) on the
   same sf0.001 KG — frames must match exactly, the same dual-plan
   discipline as the existing ``pagerank_ds`` parity test.  Because the
   driver paths are oracle-checked (CORRECTNESS rows / unrolled-CTE
   twins), parity transfers oracle-exactness to the distributed plans.

2. SCALE: the distributed cores run on a synthetic >2M-edge graph (a
   union of K4 cliques — analytic expectations for every metric) that
   would be far beyond any gazetteer bound, proving the ops no longer
   refuse to run above the driver cap.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

SF = "/root/testdata/sf0.001"

# >2M edges: 350_001 cliques of 4 nodes → 2_100_006 canonical edges
N_CLIQUES = 350_001
N_NODES = 4 * N_CLIQUES
N_EDGES = 6 * N_CLIQUES


def _norm(df: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    return df.sort_values(by).reset_index(drop=True)


@pytest.mark.parametrize(
    "op, sort_by, kwargs",
    [
        # bounded-round ops run FEWER rounds here (both paths get the
        # same count, so parity still proves the per-round rule) to keep
        # the shuffle-heavy distributed plans fast on the 4-CPU fixture
        ("entity_components", ["entity_id"], {"rounds": 3}),
        ("entity_bfs_depth", ["entity_id"], {"rounds": 3}),
        ("entity_triangle_counts", ["entity_id"], {}),
        ("entity_kcore", ["entity_id"], {"rounds": 2}),
        ("entity_ppr", ["entity_id"], {"iters": 2}),
        ("entity_clustering_coefficient", ["entity_id"], {}),
        ("entity_neighbor_jaccard", ["a", "b"], {}),
        ("entity_resource_allocation", ["a", "b"], {}),
        ("entity_cooccur_conditional", ["subj", "obj"], {}),
        ("kg_negative_samples", ["subj", "obj", "i"], {}),
        ("source_shared_entity_pairs", ["a", "b"], {}),
        ("entity_katz", ["entity_id"], {"iters": 2}),
        ("entity_shortest_path", ["entity_id"], {"rounds": 3}),
        ("entity_lpa_communities", ["entity_id"], {"rounds": 2}),
    ],
)
def test_graph_op_distributed_parity(op, sort_by, kwargs):
    import ner_funtool_ray.pipelines.graph as G

    fn = getattr(G, op)
    driver = _norm(fn(SF, **kwargs).to_pandas(), sort_by)
    dist = _norm(fn(SF, driver_cap=0, **kwargs).to_pandas(), sort_by)
    pd.testing.assert_frame_equal(driver, dist)
    assert len(driver) > 0


def _clique_nodes() -> "ray.data.Dataset":
    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"])
        return pa.table(
            {"entity_id": pa.array([f"n{i:08d}" for i in ids])}
        )

    return ray.data.range(N_NODES).map_batches(
        gen, batch_format="pyarrow"
    ).materialize()


def _clique_edges_canon() -> "ray.data.Dataset":
    # canonical a < b (zero-padded names keep lexical == numeric order)
    def gen(batch: pa.Table) -> pa.Table:
        cl = np.asarray(batch["id"])
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        a_l, b_l = [], []
        for i, j in pairs:
            a_l.append(4 * cl + i)
            b_l.append(4 * cl + j)
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        return pa.table(
            {
                "a": pa.array([f"n{x:08d}" for x in a]),
                "b": pa.array([f"n{x:08d}" for x in b]),
            }
        )

    return ray.data.range(N_CLIQUES).map_batches(
        gen, batch_format="pyarrow"
    ).materialize()


def _sym(edges_canon: "ray.data.Dataset") -> "ray.data.Dataset":
    return edges_canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()


@pytest.fixture(scope="module")
def clique_graph():
    nodes = _clique_nodes()
    canon = _clique_edges_canon()
    assert canon.count() == N_EDGES and N_EDGES > 2_000_000
    return nodes, canon, _sym(canon)


def test_scale_triangles_and_cc(clique_graph):
    from ner_funtool_ray.stages.graphops import (
        clustering_coefficient_ds,
        triangles_ds,
    )

    nodes, canon, _ = clique_graph
    tri = triangles_ds(nodes, canon)
    stats = tri.aggregate(
        ray.data.aggregate.Min("n_triangles"),
        ray.data.aggregate.Max("n_triangles"),
        ray.data.aggregate.Count(),
    )
    # every K4 corner sits in exactly 3 triangles
    assert stats == {
        "min(n_triangles)": 3,
        "max(n_triangles)": 3,
        "count()": N_NODES,
    }

    cc = clustering_coefficient_ds(nodes, canon)
    stats = cc.aggregate(
        ray.data.aggregate.Min("degree"),
        ray.data.aggregate.Max("degree"),
        ray.data.aggregate.Min("cc_ppm"),
        ray.data.aggregate.Max("cc_ppm"),
        ray.data.aggregate.Count(),
    )
    # K4: degree 3, cc = 2·3·10⁶ // (3·2) = 10⁶ exactly
    assert stats == {
        "min(degree)": 3,
        "max(degree)": 3,
        "min(cc_ppm)": 1_000_000,
        "max(cc_ppm)": 1_000_000,
        "count()": N_NODES,
    }


def test_scale_jaccard_and_ra(clique_graph):
    from ner_funtool_ray.stages.graphops import (
        neighbor_jaccard_ds,
        resource_allocation_ds,
    )

    _, _, sym = clique_graph
    jac = neighbor_jaccard_ds(sym)
    stats = jac.aggregate(
        ray.data.aggregate.Min("inter"),
        ray.data.aggregate.Max("inter"),
        ray.data.aggregate.Min("union_n"),
        ray.data.aggregate.Max("union_n"),
        ray.data.aggregate.Min("jac_ppm"),
        ray.data.aggregate.Max("jac_ppm"),
        ray.data.aggregate.Count(),
    )
    # any K4 pair: |N(a)∩N(b)| = 2 (the other two), union = 4
    assert stats == {
        "min(inter)": 2,
        "max(inter)": 2,
        "min(union_n)": 4,
        "max(union_n)": 4,
        "min(jac_ppm)": 500_000,
        "max(jac_ppm)": 500_000,
        "count()": N_EDGES,
    }

    ra = resource_allocation_ds(sym)
    stats = ra.aggregate(
        ray.data.aggregate.Min("ra_ppm"),
        ray.data.aggregate.Max("ra_ppm"),
        ray.data.aggregate.Count(),
    )
    # two common neighbors, each deg 3: 2 · (10⁶ // 3) = 666666
    assert stats == {
        "min(ra_ppm)": 666_666,
        "max(ra_ppm)": 666_666,
        "count()": N_EDGES,
    }


def test_scale_propagation(clique_graph):
    from ner_funtool_ray.stages.graphops import (
        bfs_depth_ds,
        components_ds,
        kcore_ds,
    )

    nodes, _, sym = clique_graph

    depth = bfs_depth_ds(nodes, sym, rounds=1, seed_entity="n00000000")
    counts = (
        depth.groupby("depth").count().to_pandas().set_index("depth")["count()"]
    )
    # one round reaches exactly the seed's clique
    assert counts.to_dict() == {0: 1, 1: 3, -1: N_NODES - 4}

    comp = components_ds(nodes, sym, rounds=2)

    def check(t: pa.Table) -> pa.Table:
        ids = [int(e[1:]) for e in t["entity_id"].to_pylist()]
        expect = [f"n{4 * (i // 4):08d}" for i in ids]
        ok = np.array(
            [c == e for c, e in zip(t["component"].to_pylist(), expect)]
        )
        return pa.table({"ok": pa.array(ok.astype(np.int64))})

    n_ok = comp.map_batches(check, batch_format="pyarrow").sum("ok")
    assert n_ok == N_NODES  # every node labeled with its clique minimum

    core = kcore_ds(nodes, sym, k=3, rounds=1)
    assert core.sum("in_core") == N_NODES  # K4 is a 3-core


def test_scale_ppr(clique_graph):
    from ner_funtool_ray.pipelines.graph import pagerank_ds

    nodes, _, sym = clique_graph
    edges = sym.map_batches(
        lambda t: t.append_column(
            "weight", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    seed = "n00000000"
    ranks = pagerank_ds(
        nodes, edges, iters=2, seed_entity=seed, seed_n=N_NODES
    )

    def distinct(t: pa.Table) -> pa.Table:
        return pa.table(
            {"r": pa.array(sorted(set(np.asarray(t["pagerank_fp"]))))}
        )

    vals = sorted(
        {r["r"] for r in ranks.map_batches(
            distinct, batch_format="pyarrow"
        ).take_all()}
    )
    # symmetry: seed, seed's 3 clique-mates, everyone else — ≤3 values,
    # and the seed (sole teleport target) holds the maximum
    assert len(vals) <= 3
    seed_r = [
        r["pagerank_fp"]
        for r in ranks.filter(
            lambda row: row["entity_id"] == seed
        ).take_all()
    ][0]
    assert seed_r == vals[-1] and seed_r > vals[0]


def test_scale_conditional_and_negatives(clique_graph):
    from ner_funtool_ray.stages.graphops import (
        cooccur_conditional_ds,
        negative_samples_ds,
    )

    nodes, canon, _ = clique_graph
    cooc = canon.map_batches(
        lambda t: pa.table(
            {
                "subj": t["a"],
                "obj": t["b"],
                "weight": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    cond = cooccur_conditional_ds(cooc)
    stats = cond.aggregate(
        ray.data.aggregate.Min("cond_ppm"),
        ray.data.aggregate.Max("cond_ppm"),
        ray.data.aggregate.Count(),
    )
    # marginal of every node is 3 → 10⁶ // 3, both directions emitted
    assert stats == {
        "min(cond_ppm)": 333_333,
        "max(cond_ppm)": 333_333,
        "count()": 2 * N_EDGES,
    }

    neg = negative_samples_ds(cooc, nodes, k=1).materialize()
    assert neg.count() == N_EDGES
    # spot-check the md5 rule: node names ARE the sorted vocabulary
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch

    sample = neg.take(5)
    keys = [f"{r['subj']}|{r['obj']}|1" for r in sample]
    idx = (
        md5_number_lower_batch(keys) % np.uint64(N_NODES)
    ).astype(np.int64)
    assert [r["neg_obj"] for r in sample] == [f"n{i:08d}" for i in idx]


def test_scale_shared_member_pairs():
    from ner_funtool_ray.stages.graphops import shared_member_pairs_ds

    n_pairs = 1_000_000  # 4M membership rows

    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"])
        ent, doc = [], []
        for suffix in ("a", "b"):
            for off in (0, 1):
                ent.append([f"e{i}{suffix}" for i in ids])
                doc.append([f"d{2 * i + off:08d}" for i in ids])
        return pa.table(
            {
                "entity": pa.array([x for part in ent for x in part]),
                "doc": pa.array([x for part in doc for x in part]),
            }
        )

    membership = ray.data.range(n_pairs).map_batches(
        gen, batch_format="pyarrow"
    )
    assert membership.count() == 4 * n_pairs and 4 * n_pairs > 2_000_000
    out = shared_member_pairs_ds(membership, min_shared=2)
    stats = out.aggregate(
        ray.data.aggregate.Min("shared"),
        ray.data.aggregate.Max("shared"),
        ray.data.aggregate.Count(),
    )
    # each doc pair (d2i, d2i+1) shares exactly its two entities
    assert stats == {
        "min(shared)": 2,
        "max(shared)": 2,
        "count()": n_pairs,
    }


def test_hits_distributed_parity():
    import ner_funtool_ray.pipelines.graph as G

    driver = _norm(
        G.entity_source_hits(SF, iters=2).to_pandas(), ["entity_id"]
    )
    dist = _norm(
        G.entity_source_hits(SF, iters=2, driver_cap=0).to_pandas(),
        ["entity_id"],
    )
    pd.testing.assert_frame_equal(driver, dist)
    assert len(driver) > 0 and (driver["hub_fp"] > 0).all()


def test_scale_hits():
    """hits_ds on a >2M-row membership layer: every component is the
    same 2-entity × 2-doc block, so sum-normalization fixes every hub at
    exactly SCALE // n_entities from the first iteration on."""
    from ner_funtool_ray.stages.graphops import SCALE, hits_ds

    n_pairs = 600_000  # 4 membership rows each → 2.4M > 2M

    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"])
        ent, doc = [], []
        for suffix in ("a", "b"):
            for off in (0, 1):
                ent.append([f"e{i}{suffix}" for i in ids])
                doc.append([f"d{2 * i + off:08d}" for i in ids])
        return pa.table(
            {
                "entity": pa.array([x for part in ent for x in part]),
                "doc": pa.array([x for part in doc for x in part]),
            }
        )

    membership = ray.data.range(n_pairs).map_batches(
        gen, batch_format="pyarrow"
    )
    assert membership.count() == 4 * n_pairs and 4 * n_pairs > 2_000_000
    out = hits_ds(membership, iters=2)
    n_ents = 2 * n_pairs
    expected = int(SCALE) // n_ents
    stats = out.aggregate(
        ray.data.aggregate.Min("hub_fp"),
        ray.data.aggregate.Max("hub_fp"),
        ray.data.aggregate.Count(),
    )
    assert stats == {
        "min(hub_fp)": expected,
        "max(hub_fp)": expected,
        "count()": n_ents,
    }


def test_scale_katz_sssp_lpa(clique_graph):
    """The three round-based cores added for the Katz/SSSP/LPA ops run on
    the >2M-edge clique union with analytic expectations: every K4 corner
    is symmetric, so Katz converges to one shared value (checked against
    the numpy core on a single K4), SSSP reaches only the seed's clique
    (uniform weight 1 → edge length 1001), and 2 LPA rounds collapse each
    clique onto its smallest member."""
    import numpy as np
    import pyarrow as pa

    from ner_funtool_ray.pipelines.graph import SCALE, _katz_numpy
    from ner_funtool_ray.stages.graphops import katz_ds, lpa_ds, sssp_ds

    nodes, _, sym = clique_graph
    symw = sym.map_batches(
        lambda t: t.append_column(
            "weight", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )

    k = katz_ds(nodes, symw, iters=2)
    stats = k.aggregate(
        ray.data.aggregate.Min("katz_fp"),
        ray.data.aggregate.Max("katz_fp"),
        ray.data.aggregate.Count(),
    )
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    src = np.array([a for a, b in pairs] + [b for a, b in pairs])
    dst = np.array([b for a, b in pairs] + [a for a, b in pairs])
    expect = _katz_numpy(src, dst, np.ones(12, dtype=np.int64), 4, 2)
    assert len(set(expect)) == 1  # symmetric corners agree
    assert stats == {
        "min(katz_fp)": int(expect[0]),
        "max(katz_fp)": int(expect[0]),
        "count()": N_NODES,
    }

    symlen = sym.map_batches(
        lambda t: t.append_column(
            "len", pa.array(np.full(t.num_rows, 1001, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    d = sssp_ds(nodes, symlen, rounds=2)
    import pyarrow.compute as pc

    reach = d.map_batches(
        lambda t: pa.table(
            {
                "reached": pc.cast(
                    pc.greater_equal(t["dist"], pa.scalar(0)), pa.int64()
                ),
                "dist": t["dist"],
            }
        ),
        batch_format="pyarrow",
    )
    stats = reach.aggregate(
        ray.data.aggregate.Sum("reached"), ray.data.aggregate.Max("dist")
    )
    # seed clique only: seed at 0 + its 3 corners at 1001
    assert stats == {"sum(reached)": 4, "max(dist)": 1001}

    comm = lpa_ds(nodes, symw, rounds=2)
    n_comm = comm.map_batches(
        lambda t: pa.table({"community": t["community"]}),
        batch_format="pyarrow",
    ).unique("community")
    assert len(n_comm) == N_CLIQUES


@pytest.mark.quick
def test_attach_col_broadcast_matches_shuffle():
    """The size-guarded broadcast fast path and the bucketed shuffle plan
    must agree row-for-row (inner and left+fill, int and string values,
    matched-but-null LUT values surviving an inner join)."""
    from ner_funtool_ray.stages.graphops import attach_col

    left = ray.data.from_items(
        [{"k": i % 7, "payload": f"p{i}"} for i in range(50)]
    )
    lut = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([0, 1, 2, 3, 9], type=pa.int64()),
                "val": pa.array([10, None, 30, 40, 90], type=pa.int64()),
            }
        )
    )
    for how, fill in [("inner", None), ("left", -1)]:
        fast = (
            attach_col(left, "k", lut, "key", "val", "v", how=how, fill=fill)
            .to_pandas()
            .sort_values(["k", "payload"])
            .reset_index(drop=True)
        )
        slow = (
            attach_col(
                left, "k", lut, "key", "val", "v",
                how=how, fill=fill, broadcast_limit=None,
            )
            .to_pandas()
            .sort_values(["k", "payload"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)
        if how == "inner":
            # k==1 matched a null LUT value: row kept, value null
            assert fast.loc[fast.k == 1, "v"].isna().all()
            assert set(fast.k) == {0, 1, 2, 3}
        else:
            assert (fast.loc[~fast.k.isin([0, 1, 2, 3]), "v"] == -1).all()

    # string-valued LUT: both paths must agree on object-dtype payloads
    slut = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([0, 2, 4], type=pa.int64()),
                "name": pa.array(["zero", "two", "four"], type=pa.string()),
            }
        )
    )
    fast_s = (
        attach_col(left, "k", slut, "key", "name", "nm", how="left", fill="?")
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    slow_s = (
        attach_col(
            left, "k", slut, "key", "name", "nm",
            how="left", fill="?", broadcast_limit=None,
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast_s, slow_s)
    assert set(fast_s.loc[fast_s.k == 2, "nm"]) == {"two"}
    assert set(fast_s.loc[fast_s.k == 5, "nm"]) == {"?"}
