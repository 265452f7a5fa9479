"""Proximity edges + mention-statistics ops (pipelines/openrel.py).

The pipeline surfaces are oracle-swept by test_queries_oracle; these
tests plant tiny synthetic sentences to pin the edge rules the oracle
corpus may not exercise: gap-0 adjacency scoring, the w≤0 drop, the
self-pair drop, canonical a<b ordering through aliases, zero diversity
for single-entity docs and zero variance numerator for even spread.
"""

import numpy as np
import pyarrow as pa

from ner_funtool_ray.pipelines.openrel import (
    PROXIMITY_MAX,
    ProximityEdgeExtractor,
)


def _sent_batch(sents):
    return pa.table({"sentence": pa.array(sents, type=pa.string())})


def _rows(t: pa.Table):
    return sorted(zip(*[t[c].to_pylist() for c in ("a", "b", "w")]))


def test_proximity_gap_zero_scores_max():
    ex = ProximityEdgeExtractor(
        gazetteer={"key": "T", "order": "T"}, aliases={}
    )
    out = ex(_sent_batch(["key order"]))
    assert _rows(out) == [("ent:key", "ent:order", PROXIMITY_MAX)]


def test_proximity_far_pairs_dropped():
    ex = ProximityEdgeExtractor(
        gazetteer={"key": "T", "order": "T"}, aliases={}
    )
    # 5 filler tokens between mentions -> w = 0 -> dropped
    out = ex(_sent_batch(["key a b c d e order"]))
    assert out.num_rows == 0
    # 4 fillers -> w = 1 survives
    out = ex(_sent_batch(["key a b c d order"]))
    assert _rows(out) == [("ent:key", "ent:order", 1)]


def test_proximity_self_pairs_dropped_via_alias():
    # alias folds both surfaces onto one entity -> self-pair -> dropped
    ex = ProximityEdgeExtractor(
        gazetteer={"key": "T", "keys": "T"}, aliases={"keys": "key"}
    )
    assert ex(_sent_batch(["key keys"])).num_rows == 0


def test_proximity_canonical_order():
    ex = ProximityEdgeExtractor(
        gazetteer={"zeta": "T", "alpha": "T"}, aliases={}
    )
    out = ex(_sent_batch(["zeta alpha"]))
    # textual order is zeta->alpha but the emitted pair is a<b
    assert _rows(out) == [("ent:alpha", "ent:zeta", PROXIMITY_MAX)]


def test_diversity_and_dispersion_formulas():
    # pure-integer formula spot checks against the op definitions
    # single entity: n=3, s2=9 -> simpson 0
    n, s2 = np.int64(3), np.int64(9)
    assert (1_000_000 * (n * n - s2)) // (n * n) == 0
    # two entities 2+1: n=3, s2=5 -> (10^6·4)//9 = 444444
    n, s2 = np.int64(3), np.int64(5)
    assert (1_000_000 * (n * n - s2)) // (n * n) == 444_444
    # even spread c=[2,2,2]: nd·Σc² - (Σc)² = 3·12 - 36 = 0
    c = np.array([2, 2, 2], dtype=np.int64)
    assert len(c) * int((c * c).sum()) - int(c.sum()) ** 2 == 0
    # skewed c=[5,1]: 2·26 - 36 = 16 > 0
    c = np.array([5, 1], dtype=np.int64)
    assert len(c) * int((c * c).sum()) - int(c.sum()) ** 2 == 16


def test_pipeline_surfaces_run(ray_session):
    from ner_funtool_ray.pipelines.openrel import (
        doc_mention_diversity,
        entity_dispersion,
        kg_proximity_edges,
    )

    sf = "/root/testdata/sf0.001"
    prox = kg_proximity_edges(sf).to_pandas()
    assert (prox["a"] < prox["b"]).all()
    assert (prox["strength"] >= prox["n_pairs"]).all()  # w ≥ 1 per pair

    div = doc_mention_diversity(sf).to_pandas()
    assert div["simpson_ppm"].between(0, 1_000_000).all()
    assert (div["n_mentions"] > 0).all()

    disp = entity_dispersion(sf).to_pandas()
    assert (disp["var_num"] >= 0).all()
    assert (disp["total"] >= disp["n_docs"]).all()


def test_shape_violations_semantics(ray_session):
    from ner_funtool_ray.pipelines.openrel import (
        kg_predicate_signatures,
        kg_shape_violations,
    )

    sf = "/root/testdata/sf0.001"
    sig = kg_predicate_signatures(sf).to_pandas()
    bad = kg_shape_violations(sf).to_pandas()
    # every violation row differs from its expected signature
    assert (
        (bad["subj_type"] != bad["expect_subj_type"])
        | (bad["obj_type"] != bad["expect_obj_type"])
    ).all()
    # per predicate: violations = all signature rows except the dominant
    n_sig = sig.groupby("pred").size()
    n_bad = bad.groupby("pred").size().reindex(n_sig.index, fill_value=0)
    assert ((n_sig - n_bad) == 1).all()
    # the dominant really is the max-evidence row of its predicate
    dom = bad.drop_duplicates("pred")[
        ["pred", "expect_subj_type", "expect_obj_type"]
    ]
    m = sig.merge(
        dom,
        left_on=["pred", "subj_type", "obj_type"],
        right_on=["pred", "expect_subj_type", "expect_obj_type"],
    )
    mx = sig.groupby("pred")["n_triples"].max()
    assert (m["n_triples"].to_numpy() == mx.loc[m["pred"]].to_numpy()).all()


def test_name_pair_editdistance_blocks_losslessly():
    import numpy as np

    from ner_funtool_ray.stages.editdist import editdistance_name_pairs_df

    names = ["part", "sort", "spark", "key", "keys", "window"]
    lens = np.array([len(n) for n in names])
    homes = (lens // 2).astype(np.int64)
    got = []
    for bucket in sorted(set(homes) | set(homes + 1)):
        df = editdistance_name_pairs_df(names, homes, int(bucket), 2)
        got += list(zip(df["a"], df["b"], df["dist"]))
    # brute-force reference over all pairs
    from ner_funtool_ray.pipelines.textops import _levenshtein

    expect = sorted(
        (min(x, y), max(x, y), _levenshtein(x, y))
        for i, x in enumerate(names)
        for y in names[i + 1:]
        if _levenshtein(x, y) <= 2
    )
    assert sorted(got) == expect
    assert ("key", "keys", 1) in expect  # a true near-alias pair survives


def test_merge_candidates_pipeline(ray_session):
    from ner_funtool_ray.pipelines.openrel import kg_merge_candidates

    out = kg_merge_candidates("/root/testdata/sf0.001").to_pandas()
    assert (out["a"] < out["b"]).all()
    assert out["dist"].between(1, 2).all()
    assert (out["shared"] >= 1).all()
    # the corpus's known near-name pair is found
    assert {"part"} <= set(out["a"])
