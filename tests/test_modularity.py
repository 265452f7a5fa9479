"""Modularity audit of LPA communities (pipelines/graph.py:
community_modularity).  The corpus-level oracle parity runs in
test_queries_oracle.py (degenerate there: the sf graph is one dense
community, q = 0 exactly); these tests pin the non-vacuous semantics on
a planted two-community graph and the negative-term floor parity."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from ner_funtool_ray.pipelines.graph import community_modularity


def _write_docs(tmp_path, doc_ids, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * len(doc_ids), type=pa.string()),
                "source": pa.array(["t"] * len(doc_ids), type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_two_cliques_weak_bridge(ray_session, tmp_path):
    # two strongly-internal triangles bridged by ONE weak edge: LPA keeps
    # them apart and both communities contribute positive modularity
    clique_a = "scan join sort"
    clique_b = "customer row table"
    sf = _write_docs(
        tmp_path,
        list(range(1, 8)),
        [clique_a] * 3 + [clique_b] * 3 + ["sort customer"],
    )
    df = community_modularity(sf).to_pandas()
    assert len(df) == 2
    assert (df["q_ppm"] > 0).all()
    assert set(df["n_nodes"]) == {3}
    # bookkeeping identity: Σ d_tot = 2m and Σ e_in = m − cross-edges
    m = 3 + 3 + 3 + 3 + 3 + 3 + 1  # 6 intra edges ×3 docs + 1 bridge
    assert df["d_tot"].sum() == 2 * m
    assert df["e_in"].sum() == m - 1


def test_star_graph_is_perfectly_disassortative(ray_session, tmp_path):
    # star (hub 'join', 3 leaves): M=6 directed edges, Σx=12, Σxy=18,
    # Σxx=30 → r = (6·18 − 144)/(6·30 − 144) = −1 exactly; the sf corpus
    # oracle row is vacuous (complete graph → zero variance → r = 0), so
    # this pins the non-degenerate value
    from ner_funtool_ray.pipelines.graph import graph_assortativity

    sf = _write_docs(
        tmp_path, [1, 2, 3], ["join scan", "join sort", "join merge"]
    )
    row = graph_assortativity(sf).to_pandas().iloc[0]
    assert row["n_dir_edges"] == 6
    assert (row["sum_deg"], row["sum_xy"], row["sum_xx"]) == (12, 18, 30)
    assert row["assortativity"] == -1.0


def test_linkpred_cn_auc_planted_split(ray_session, tmp_path):
    # base (even docs) = square scan-join-sort-merge plus sort-group.
    # CN-scorable non-edges: (scan,sort) cn=2, (join,merge) cn=2,
    # (join,group) cn=1, (merge,group) cn=1.  The new half (odd doc)
    # adds edge (scan,sort) → one positive at the top score: 2 wins over
    # the cn=1 negatives + 1 tie with (join,merge) gives U2 = 2·2 + 1 = 5,
    # AUC = 5·1e6 // (2·1·3) = 833333.
    from ner_funtool_ray.pipelines.graph import linkpred_cn_auc

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 6, 8, 1],
        [
            "scan join",
            "join sort",
            "scan merge",
            "merge sort",
            "sort group",
            "scan sort",
        ],
    )
    row = linkpred_cn_auc(sf).to_pandas().iloc[0]
    assert (row["n_pos"], row["n_neg"]) == (1, 3)
    assert row["auc_ppm"] == 833333


def test_linkpred_ra_auc_breaks_the_cn_tie(ray_session, tmp_path):
    # same planted split: RA weighs middles by 1/deg, so (scan,sort)
    # (middles join+merge, both deg 2 → 1e6) strictly beats the cn-tied
    # (join,merge) (500000+333333) — AUC becomes perfect
    from ner_funtool_ray.pipelines.graph import linkpred_ra_auc

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 6, 8, 1],
        [
            "scan join",
            "join sort",
            "scan merge",
            "merge sort",
            "sort group",
            "scan sort",
        ],
    )
    row = linkpred_ra_auc(sf).to_pandas().iloc[0]
    assert (row["n_pos"], row["n_neg"]) == (1, 3)
    assert row["auc_ppm"] == 1_000_000


def test_linkpred_pa_auc_degree_product(ray_session, tmp_path):
    # same planted split: PA = deg(a)·deg(b) gives (scan,sort) 2·3 = 6,
    # strictly above (join,merge) 4 and the deg-1 pairs → perfect AUC
    from ner_funtool_ray.pipelines.graph import linkpred_pa_auc

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 6, 8, 1],
        [
            "scan join",
            "join sort",
            "scan merge",
            "merge sort",
            "sort group",
            "scan sort",
        ],
    )
    row = linkpred_pa_auc(sf).to_pandas().iloc[0]
    assert (row["n_pos"], row["n_neg"]) == (1, 3)
    assert row["auc_ppm"] == 1_000_000


def test_linkpred_jaccard_auc_can_underperform(ray_session, tmp_path):
    # same planted split through the Jaccard lens: (join,merge) scores a
    # full 1e6 (cn 2, union 2) ABOVE the positive (scan,sort) at 666666
    # (cn 2, union 3) → the positive wins only over the two deg-1 pairs:
    # U2 = 2·2 → AUC = 4e6 // 6 = 666666 — the harness separates the
    # heuristics (RA/PA perfect, CN 833333, Jaccard 666666)
    from ner_funtool_ray.pipelines.graph import linkpred_jaccard_auc

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 6, 8, 1],
        [
            "scan join",
            "join sort",
            "scan merge",
            "merge sort",
            "sort group",
            "scan sort",
        ],
    )
    row = linkpred_jaccard_auc(sf).to_pandas().iloc[0]
    assert (row["n_pos"], row["n_neg"]) == (1, 3)
    assert row["auc_ppm"] == 666666


def test_community_size_histogram_two_cliques(ray_session, tmp_path):
    # two 3-cliques bridged weakly → histogram is exactly {3: 2}
    from ner_funtool_ray.pipelines.graph import community_size_histogram

    sf = _write_docs(
        tmp_path,
        list(range(1, 8)),
        ["scan join sort"] * 3 + ["customer row table"] * 3
        + ["sort customer"],
    )
    df = community_size_histogram(sf).to_pandas()
    assert df.to_dict("records") == [{"size": 3, "n_communities": 2}]


def test_negative_term_floor_parity_with_duckdb(ray_session):
    # the HUGEINT CASE in the SQL twin must floor negative q terms the
    # way Python's // does — check the exact expression on values where
    # trunc and floor division differ
    # −49e6 / 324 = −151234.57…: floor (−151235) ≠ trunc (−151234)
    m, e, d = 9, 0, 7
    py = ((4 * m * e - d * d) * 1_000_000) // (4 * m * m)
    assert py == -151235  # Python floors toward −inf
    sql = duckdb.sql(
        f"""
        SELECT (CASE WHEN (4*m*e - d*d) >= 0
                 THEN (4*m*e - d*d) * 1000000 // (4*m*m)
                 ELSE -(((d*d - 4*m*e) * 1000000 + 4*m*m - 1) // (4*m*m))
                END)::BIGINT AS q
        FROM (SELECT {m}::HUGEINT AS m, {e}::HUGEINT AS e, {d}::HUGEINT AS d)
        """
    ).fetchone()[0]
    assert py == sql == -151235
