"""Knowledge fusion / versioned reads / WL fingerprints / blocking audit /
reification (pipelines/fusion.py).  Corpus-level oracle parity runs in
test_queries_oracle.py; these pin the semantics on hand-built inputs."""

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_funtool_ray.pipelines.fusion import (
    AttrObservationExtractor,
    er_blocking_quality,
    er_cluster_quality,
    kg_attr_fusion,
    kg_attr_latest,
    kg_reify_statements,
    kg_attr_conflicts,
    kg_attr_fusion_weighted,
    kg_graph_summary,
    kg_triple_intervals,
    kg_type_subsumption,
    kg_wl_colors,
    source_attr_reliability,
)


def _obs(doc_ids, texts):
    ex = AttrObservationExtractor()
    out = ex(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    return list(
        zip(
            out["doc_id"].to_pylist(),
            out["entity_id"].to_pylist(),
            out["attr"].to_pylist(),
        )
    )


def test_attr_observations_carry_doc_id_and_lexicon_filter():
    # 'fast join' observes; 'red join' is outside the lexicon; alias
    # 'agg' → 'aggregate' rewrites the entity
    rows = _obs(
        [7, 9], ["a fast join here. red join there", "one big agg"]
    )
    assert rows == [
        (7, "ent:join", "fast"),
        (9, "ent:aggregate", "big"),
    ]


def test_attr_observations_sentence_boundary_blocks_modifier():
    # the adjective is in the PREVIOUS sentence, so the pregap of the
    # mention's own sentence has no tokens — no observation
    assert _obs([1], ["it was fast. join runs"]) == []


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


def test_fusion_majority_and_tie_break(ray_session, tmp_path):
    # join: fast×2, slow×1 → fast (votes 2 / total 3, conf 666666 ppm);
    # sort: big×1, small×1 → tie breaks to lexicographically smaller 'big'
    sf = _write_docs(
        tmp_path,
        [1, 2, 3, 4, 5],
        [
            "fast join",
            "fast join",
            "slow join",
            "big sort",
            "small sort",
        ],
    )
    df = (
        kg_attr_fusion(sf)
        .to_pandas()
        .set_index("entity_id")
        .sort_index()
    )
    j = df.loc["ent:join"]
    assert (j["fused_attr"], j["votes"], j["total"], j["conf_ppm"]) == (
        "fast", 2, 3, 666666,
    )
    s = df.loc["ent:sort"]
    assert (s["fused_attr"], s["votes"], s["total"], s["conf_ppm"]) == (
        "big", 1, 2, 500000,
    )


def test_latest_is_highest_doc_then_smallest_attr(ray_session, tmp_path):
    # join's latest observation is doc 9 ('slow'); sort's latest doc 6
    # carries two attrs → smallest ('big') wins the intra-doc tie
    sf = _write_docs(
        tmp_path,
        [1, 9, 6],
        ["fast join", "slow join", "small sort and big sort"],
    )
    df = kg_attr_latest(sf).to_pandas().set_index("entity_id")
    assert tuple(df.loc["ent:join"]) == ("slow", 9)
    assert tuple(df.loc["ent:sort"]) == ("big", 6)


def test_wl_colors_structural_symmetry(ray_session, tmp_path):
    # path graph: scan — join — sort (co-occurrence via shared docs).
    # 'scan' and 'sort' are structurally symmetric (degree-1 leaves with
    # identical neighborhoods up to iso) → same WL color; the center
    # 'join' differs.
    sf = _write_docs(
        tmp_path,
        [1, 2],
        ["scan join", "join sort"],
    )
    df = kg_wl_colors(sf, rounds=2).to_pandas().set_index("entity_id")
    assert df.loc["ent:scan", "wl_color"] == df.loc["ent:sort", "wl_color"]
    assert df.loc["ent:join", "wl_color"] != df.loc["ent:scan", "wl_color"]


def test_wl_rounds_refine_distinguish_radius_two(ray_session, tmp_path):
    # path of 4: a-b-c-d. At round 1 the two leaves (a, d) agree and the
    # two middles (b, c) agree; leaves stay symmetric at round 2 as well
    # (the graph has an automorphism swapping a↔d, b↔c) — but a leaf never
    # equals a middle at any round.
    sf = _write_docs(
        tmp_path,
        [1, 2, 3],
        ["scan join", "join sort", "sort merge"],
    )
    df = kg_wl_colors(sf, rounds=2).to_pandas().set_index("entity_id")
    leaves = {df.loc["ent:scan", "wl_color"], df.loc["ent:merge", "wl_color"]}
    mids = {df.loc["ent:join", "wl_color"], df.loc["ent:sort", "wl_color"]}
    assert len(leaves) == 1 and len(mids) == 1
    assert leaves.isdisjoint(mids)


def test_blocking_quality_finds_planted_duplicates(ray_session, tmp_path):
    # two identical docs (whitespace-normalized) → 1 truth pair; identical
    # docs share every band, so blocking must surface the pair: PC = 1e6
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha  beta gamma\tdelta epsilon zeta",
        "completely different content about sorting algorithms",
        "yet another unrelated document with other words",
    ]
    sf = _write_docs(tmp_path, [1, 2, 3, 4], texts)
    df = er_blocking_quality(sf)
    row = df.iloc[0]
    assert row["n_docs"] == 4
    assert row["n_true_pairs"] == 1
    assert row["n_hit_pairs"] == 1
    assert row["pair_completeness_ppm"] == 1_000_000
    assert 0 <= row["n_cand_pairs"] <= 6
    assert row["reduction_ppm"] == (6 - row["n_cand_pairs"]) * 1_000_000 // 6


def _write_docs_src(tmp_path, doc_ids, texts, sources):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * len(doc_ids), type=pa.string()),
                "source": pa.array(sources, type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_source_reliability_agreement_ratio(ray_session, tmp_path):
    # fused(join) = 'fast' (2 vs 1).  Source A's two observations agree;
    # source B's one observation disagrees.
    sf = _write_docs_src(
        tmp_path,
        [1, 2, 3],
        ["fast join", "fast join", "slow join"],
        ["A", "A", "B"],
    )
    df = source_attr_reliability(sf).to_pandas().set_index("source")
    assert tuple(df.loc["A"]) == (2, 2, 1_000_000)
    assert tuple(df.loc["B"]) == (1, 0, 0)


def test_weighted_fusion_overrules_unreliable_majority(ray_session, tmp_path):
    # 'join' sets reliabilities: A fast×6 vs B slow×4 → round-1 'fast',
    # so r(A) = 6/7 = 857142 ppm (one dissent on sort) and r(B) = 2/6 =
    # 333333 ppm (4 join dissents, 2 sort agreements).  On 'sort', B has
    # the raw 2-1 majority ('slow'), but round-2 scores are fast =
    # 857142 > slow = 2·333333 = 666666 — the reliable minority wins.
    sf = _write_docs_src(
        tmp_path,
        list(range(1, 14)),
        ["fast join"] * 6 + ["fast sort"] + ["slow join"] * 4
        + ["slow sort"] * 2,
        ["A"] * 7 + ["B"] * 6,
    )
    un = kg_attr_fusion(sf).to_pandas().set_index("entity_id")
    assert un.loc["ent:sort", "fused_attr"] == "slow"  # raw majority
    wdf = kg_attr_fusion_weighted(sf).to_pandas().set_index("entity_id")
    s = wdf.loc["ent:sort"]
    assert (s["fused_attr"], s["score"], s["n_obs"]) == ("fast", 857142, 1)
    j = wdf.loc["ent:join"]
    assert (j["fused_attr"], j["score"], j["n_obs"]) == (
        "fast", 6 * 857142, 6,
    )


def test_attr_conflicts_lists_only_disagreeing_entities(ray_session, tmp_path):
    # join has two distinct values (conflict); sort has one (clean)
    sf = _write_docs(
        tmp_path,
        [1, 2, 3],
        ["fast join", "slow join", "big sort"],
    )
    df = kg_attr_conflicts(sf).to_pandas()
    assert df["entity_id"].tolist() == ["ent:join"]
    assert tuple(df.iloc[0][["n_values", "n_obs"]]) == (2, 2)


def test_b3_perfect_on_exact_duplicates(ray_session, tmp_path):
    # predicted clusters == truth clusters (one exact-dup pair + two
    # singletons) → B³ precision and recall both exactly 1e6
    sf = _write_docs(
        tmp_path,
        [1, 2, 3, 4],
        [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon zeta",
            "other content entirely here with words",
            "third unrelated document text goes here",
        ],
    )
    row = er_cluster_quality(sf).iloc[0]
    assert row["n_docs"] == 4
    assert row["b3_precision_ppm"] == 1_000_000
    assert row["b3_recall_ppm"] == 1_000_000


def test_triple_intervals_first_last_and_count(ray_session, tmp_path):
    # (join, scan) co-occurs in docs 3 and 9 → interval [3, 9], n_docs 2;
    # (join, sort) only in doc 9 → degenerate interval [9, 9]
    sf = _write_docs(
        tmp_path,
        [3, 9],
        ["scan join", "scan join sort"],
    )
    df = kg_triple_intervals(sf).to_pandas().set_index(["subj", "obj"])
    assert tuple(df.loc[("ent:join", "ent:scan")]) == (2, 3, 9)
    assert tuple(df.loc[("ent:join", "ent:sort")]) == (1, 9, 9)


def test_type_subsumption_containment_direction(ray_session, tmp_path):
    # every TABLE doc also has an OPERATION mention, but not vice versa:
    # containment(super=OPERATION, sub=TABLE) = 1e6; the reverse is 1/2
    sf = _write_docs(
        tmp_path,
        [1, 2],
        ["customer join", "join only here"],
    )
    df = kg_type_subsumption(sf).to_pandas().set_index(
        ["super_type", "sub_type"]
    )
    up = df.loc[("OPERATION", "TABLE")]
    assert (up["n_both"], up["n_sub"], up["containment_ppm"]) == (
        1, 1, 1_000_000,
    )
    down = df.loc[("TABLE", "OPERATION")]
    assert (down["n_both"], down["n_sub"], down["containment_ppm"]) == (
        1, 2, 500_000,
    )


def test_graph_summary_condenses_by_dominant_type(ray_session, tmp_path):
    # doc 1 yields edge (join, scan) → super-edge (OPERATION, OPERATION);
    # doc 2 yields (customer, scan) → (OPERATION, TABLE) — one co-occurrence
    # edge each, condensed by the entities' dominant types.
    sf = _write_docs(
        tmp_path, [1, 2], ["scan join", "scan customer"]
    )
    df = kg_graph_summary(sf).to_pandas().set_index(["type_a", "type_b"])
    assert tuple(df.loc[("OPERATION", "OPERATION")]) == (1, 1)
    assert tuple(df.loc[("OPERATION", "TABLE")]) == (1, 1)
    assert len(df) == 2


def test_fusion_family_handles_corpus_without_observations(
    ray_session, tmp_path
):
    # no adjectival modifiers anywhere → every attribute op returns empty
    # (no crash, deterministic zero rows)
    sf = _write_docs(
        tmp_path, [1, 2], ["scan join here", "plain sort text"]
    )
    assert len(kg_attr_fusion(sf).to_pandas()) == 0
    assert len(kg_attr_latest(sf).to_pandas()) == 0
    assert len(kg_attr_conflicts(sf).to_pandas()) == 0
    assert len(source_attr_reliability(sf).to_pandas()) == 0
    assert len(kg_attr_fusion_weighted(sf).to_pandas()) == 0


def test_random_walks_deterministic_and_edge_valid(ray_session, tmp_path):
    # path graph scan—join—sort: every step must traverse a real edge;
    # degree-1 nodes have forced moves; the md5 replay makes reruns
    # identical row-for-row
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.kgembed import kg_random_walks

    sf = _write_docs(tmp_path, [1, 2], ["scan join", "join sort"])
    df = kg_random_walks(sf, steps=3).to_pandas()
    df2 = kg_random_walks(sf, steps=3).to_pandas()
    key = ["walk_id", "step", "node"]
    pd.testing.assert_frame_equal(
        df.sort_values(key).reset_index(drop=True),
        df2.sort_values(key).reset_index(drop=True),
    )
    edges = {("ent:scan", "ent:join"), ("ent:join", "ent:sort")}
    edges |= {(b, a) for a, b in edges}
    for wid, g in df.groupby("walk_id"):
        seq = g.sort_values("step")["node"].tolist()
        assert seq[0] == wid
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in edges
    # degree-1 start: scan's first hop is forced to join
    scan = df[df["walk_id"] == "ent:scan"].set_index("step")["node"]
    assert scan.loc[1] == "ent:join"
    # join's first hop replays the md5 rank rule over sorted neighbors
    h = int(md5_number_lower_batch(["ent:join|1|ent:join"])[0])
    expect = ["ent:scan", "ent:sort"][h % 2]
    join = df[df["walk_id"] == "ent:join"].set_index("step")["node"]
    assert join.loc[1] == expect


def test_entity_timeline_span(ray_session, tmp_path):
    from ner_funtool_ray.pipelines.fusion import kg_entity_timeline

    sf = _write_docs(
        tmp_path, [2, 7, 9], ["scan here", "scan again", "join once"]
    )
    df = kg_entity_timeline(sf).to_pandas().set_index("entity_id")
    assert tuple(df.loc["ent:scan"]) == (2, 2, 7, 5)  # n, first, last, span
    assert tuple(df.loc["ent:join"]) == (1, 9, 9, 0)


def test_triples_with_attrs_appends_fused_facts(ray_session, tmp_path):
    from ner_funtool_ray.pipelines.fusion import kg_triples_with_attrs
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    sf = _write_docs(tmp_path, [1, 2], ["fast join", "fast join and scan"])
    base = kg_from_sf_dir(sf).to_pandas()
    full = kg_triples_with_attrs(sf).to_pandas()
    extra = full[full["pred"] == "has_attr"]
    assert len(full) == len(base) + len(extra)
    assert extra[["subj", "obj", "weight"]].values.tolist() == [
        ["ent:join", "fast", 2]
    ]


def test_graph_diff_statuses(ray_session, tmp_path):
    # base = even doc_ids {0: "scan join", 2: "scan join", 4: "sort merge"},
    # new = odd {1: "scan join", 3: "scan customer"}: join's weights drop
    # (changed), customer rows appear (added), sort/merge rows vanish
    # (removed), scan's appears_in weight 2 == 2 is dropped as unchanged
    from ner_funtool_ray.pipelines.kg import kg_graph_diff

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 1, 3],
        ["scan join", "scan join", "sort merge", "scan join", "scan customer"],
    )
    df = (
        kg_graph_diff(sf)
        .to_pandas()
        .set_index(["subj", "pred", "obj"])
        .sort_index()
    )
    ch = df.loc[("ent:join", "appears_in", "repos/t")]
    assert (ch["base_weight"], ch["new_weight"], ch["status"]) == (
        2, 1, "changed",
    )
    add = df.loc[("ent:customer", "appears_in", "repos/t")]
    assert (add["base_weight"], add["new_weight"], add["status"]) == (
        0, 1, "added",
    )
    rem = df.loc[("ent:merge", "cooccurs_with", "ent:sort")]
    assert (rem["base_weight"], rem["new_weight"], rem["status"]) == (
        1, 0, "removed",
    )
    assert ("ent:scan", "appears_in", "repos/t") not in df.index


def test_graph_similarity_consistent_with_diff(ray_session, tmp_path):
    from ner_funtool_ray.pipelines.kg import kg_graph_diff, kg_graph_similarity

    sf = _write_docs(
        tmp_path,
        [0, 2, 4, 1, 3],
        ["scan join", "scan join", "sort merge", "scan join", "scan customer"],
    )
    gate = kg_graph_similarity(sf).to_pandas().iloc[0]
    diff = kg_graph_diff(sf).to_pandas()["status"].value_counts()
    assert gate["n_added"] == diff.get("added", 0)
    assert gate["n_removed"] == diff.get("removed", 0)
    assert gate["n_changed"] == diff.get("changed", 0)
    union = gate["n_base"] + gate["n_new"] - gate["n_shared"]
    assert gate["key_jaccard_ppm"] == gate["n_shared"] * 1_000_000 // union


def test_node2vec_bias_rule_and_validity(ray_session, tmp_path):
    # path scan—join—sort—merge: walks stay on edges, reruns are
    # identical, and the step-2 choice from 'join' (prev 'scan')
    # replays md5 % (w_return + w_out) over the sorted candidates
    import numpy as np

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.kgembed import node2vec_walks

    sf = _write_docs(
        tmp_path, [1, 2, 3], ["scan join", "join sort", "sort merge"]
    )
    df = node2vec_walks(sf, steps=3).to_pandas()
    df2 = node2vec_walks(sf, steps=3).to_pandas()
    key = ["walk_id", "step", "node"]
    pd.testing.assert_frame_equal(
        df.sort_values(key).reset_index(drop=True),
        df2.sort_values(key).reset_index(drop=True),
    )
    edges = {
        ("ent:scan", "ent:join"),
        ("ent:join", "ent:sort"),
        ("ent:sort", "ent:merge"),
    }
    edges |= {(b, a) for a, b in edges}
    for wid, g in df.groupby("walk_id"):
        seq = g.sort_values("step")["node"].tolist()
        assert seq[0] == wid
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in edges
    # hand-replay: from join (prev scan), candidates sorted are
    # [scan (return, wt 1), sort (out, wt 2)] → cum [1, 3]
    r = int(
        md5_number_lower_batch(["ent:scan|2|ent:scan|ent:join"])[0]
        % np.uint64(3)
    )
    expect = "ent:scan" if r < 1 else "ent:sort"
    scan_walk = df[df["walk_id"] == "ent:scan"].set_index("step")["node"]
    assert scan_walk.loc[2] == expect


def test_skipgram_pairs_window_arithmetic(ray_session, tmp_path):
    # complete 3-node graph: every walk runs the full 4 positions, so a
    # window of 2 yields exactly 5 ordered pairs per walk; every pair is
    # a (node, later-node-within-2) co-visit of a real walk
    from ner_funtool_ray.pipelines.kgembed import (
        kg_random_walks,
        walk_skipgram_pairs,
    )

    sf = _write_docs(
        tmp_path, [1, 2, 3], ["scan join", "join sort", "sort scan"]
    )
    pairs = walk_skipgram_pairs(sf, steps=3, window=2).to_pandas()
    n_walks = kg_random_walks(sf, steps=3).to_pandas()["walk_id"].nunique()
    assert pairs["n"].sum() == 5 * n_walks
    assert (pairs["n"] >= 1).all()


def test_node2vec_return_weight_zero_forbids_backtrack(ray_session, tmp_path):
    # triangle scan/join/sort: with w_return=0 a walk can never revisit
    # its previous node (every alternative has positive weight)
    from ner_funtool_ray.pipelines.kgembed import node2vec_walks

    sf = _write_docs(
        tmp_path, [1, 2, 3], ["scan join", "join sort", "sort scan"]
    )
    df = node2vec_walks(sf, steps=5, w_return=0).to_pandas()
    for _, g in df.groupby("walk_id"):
        seq = g.sort_values("step")["node"].tolist()
        for a, b in zip(seq, seq[2:]):
            assert a != b  # no immediate backtrack anywhere


def test_reify_statement_id_is_stable_md5(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [1, 2], ["scan join", "scan join sort"])
    df = kg_reify_statements(sf).to_pandas()
    assert df["stmt_id"].is_unique
    for _, r in df.iterrows():
        expect = hashlib.md5(
            f"{r['subj']}|cooccurs_with|{r['obj']}".encode()
        ).hexdigest()
        assert r["stmt_id"] == expect
    # (scan, join) co-occurs in both docs → n_docs 2, exemplar doc 1
    pair = df.set_index(["subj", "obj"]).loc[("ent:join", "ent:scan")]
    assert (pair["n_docs"], pair["first_doc"]) == (2, 1)


def test_wl_hub_degree_skew_bounded(ray_session):
    # planted 100k-degree hub (star graph): the WL round must stream the
    # hub's neighbor multiset through fixed-width digests — the result
    # rows all carry 32-char colors, never a degree-proportional string
    # (pipelines/fusion.py:_wl_sig_agg).  Pre-fix this built one ~3 MB+
    # signature string per round that rode an attach_col exchange.
    import numpy as np
    import ray

    from ner_funtool_ray.pipelines.fusion import _wl_refine

    n = 100_000

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        leaves = np.char.add("n", ids.astype(str))
        hub = np.full(len(ids), "h")
        return pa.table(
            {
                "e": pa.array(
                    np.concatenate([hub, leaves]), type=pa.string()
                ),
                "m": pa.array(
                    np.concatenate([leaves, hub]), type=pa.string()
                ),
            }
        )

    nb = ray.data.range(n, override_num_blocks=8).map_batches(
        mk_edges, batch_format="pyarrow"
    )
    nodes = ray.data.range(n + 1, override_num_blocks=4).map_batches(
        lambda t: pa.table(
            {
                "entity_id": pa.array(
                    [
                        "h" if i == n else f"n{i}"
                        for i in t["id"].to_pylist()
                    ],
                    type=pa.string(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    out = _wl_refine(nodes, nb, rounds=2, n_buckets=8).to_pandas()
    assert len(out) == n + 1
    # every carried color is a fixed 32-char digest — no unbounded rows
    assert out["wl_color"].str.len().max() == 32
    colors = out.set_index("entity_id")["wl_color"]
    leaf_colors = set(colors[colors.index != "h"])
    assert len(leaf_colors) == 1  # leaves structurally identical
    assert colors["h"] not in leaf_colors  # hub distinguished


def test_benign_schema_warning_filter_targets_empty_only():
    import logging

    from ner_funtool_ray.utils import (
        _EmptySchemaWarningFilter,
        install_benign_schema_warning_filter,
    )

    f = _EmptySchemaWarningFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "p", 1, msg, (), None)

    benign = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: . This may "
        "lead to unexpected behavior."
    )
    real = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: b: string. "
        "This may lead to unexpected behavior."
    )
    assert not f.filter(rec(benign))  # dropped
    assert f.filter(rec(real))  # real divergence passes through
    assert f.filter(rec("some other warning"))
    # idempotent install
    install_benign_schema_warning_filter()
    install_benign_schema_warning_filter()
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    assert (
        sum(isinstance(x, _EmptySchemaWarningFilter) for x in logger.filters)
        == 1
    )
