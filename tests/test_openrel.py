"""Open relation extraction, entity typing, triple provenance
(pipelines/openrel.py).  The corpus-level oracle parity runs in
test_queries_oracle.py; these tests pin the extractor semantics on
hand-built sentences where the expected triples are enumerable."""

import pandas as pd
import pyarrow as pa
import pytest

from ner_funtool_ray.pipelines.openrel import OpenRelationExtractor


def _extract(sentences, **kw):
    ex = OpenRelationExtractor(**kw)
    out = ex(pa.table({"sentence": pa.array(sentences, type=pa.string())}))
    return list(
        zip(
            out["subj"].to_pylist(),
            out["pred"].to_pylist(),
            out["obj"].to_pylist(),
        )
    )


def test_adjacent_pairs_and_gap_normalization():
    # 'spark' JOIN-gap 'filter' — gap tokens lowercased + underscore-joined
    rows = _extract(["spark Quickly Runs the filter"])
    assert rows == [("ent:spark", "rel:quickly_runs_the", "ent:filter")]


def test_only_adjacent_mentions_pair():
    # three mentions → exactly two relations (1-2, 2-3), never 1-3
    rows = _extract(["spark uses join before sort here"])
    assert rows == [
        ("ent:spark", "rel:uses", "ent:join"),
        ("ent:join", "rel:before", "ent:sort"),
    ]


def test_gap_token_cap_and_empty_gap_drop():
    # 4-token gap exceeds the default cap of 3; punctuation-only gap has 0
    # tokens — both adjacent pairs are dropped
    rows = _extract(
        ["spark one two three four join", "spark -- join"]
    )
    assert rows == []
    # the same 4-token gap passes with a raised cap
    rows = _extract(["spark one two three four join"], max_gap_tokens=4)
    assert rows == [("ent:spark", "rel:one_two_three_four", "ent:join")]


def test_alias_rewrite_applies_to_both_sides():
    # 'agg' → 'aggregate' and 'dup' → 'duplicate' via the alias table
    rows = _extract(["agg hides dup"])
    assert rows == [("ent:aggregate", "rel:hides", "ent:duplicate")]


def test_word_boundary_no_substring_mentions():
    # 'joins' must not match 'join' (\\b anchoring), so only one mention
    # exists and no pair forms
    assert _extract(["spark joins nothing"]) == []


def test_empty_and_null_sentences():
    ex = OpenRelationExtractor()
    out = ex(pa.table({"sentence": pa.array(["", None], type=pa.string())}))
    assert len(out) == 0
    assert out.schema.names == ["subj", "pred", "obj"]


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_provenance_first_doc_is_min_support(sf_dir):
    """first_doc must be the smallest doc_id among SUPPORTING docs of the
    pair — spot-check one edge against a direct per-doc scan."""
    import re

    import pyarrow.parquet as pq

    from ner_funtool_ray.config import ALIASES, GAZETTEER
    from ner_funtool_ray.pipelines.openrel import kg_triple_provenance

    prov = kg_triple_provenance(sf_dir).to_pandas()
    assert (prov["n_docs"] >= 1).all()
    assert (prov["subj"] < prov["obj"]).all()

    terms = sorted(GAZETTEER.keys(), key=len, reverse=True)
    pat = re.compile(r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b")
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    row = prov.sort_values(["subj", "obj"]).iloc[0]
    support = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ents = {
            "ent:" + ALIASES.get(m.group(1), m.group(1))
            for m in pat.finditer(text or "")
        }
        if row["subj"] in ents and row["obj"] in ents:
            support.append(doc_id)
    assert len(support) == row["n_docs"]
    assert min(support) == row["first_doc"]


def test_attribute_extractor_semantics():
    from ner_funtool_ray.pipelines.openrel import EntityAttributeExtractor

    ex = EntityAttributeExtractor()
    out = ex(
        pa.table(
            {
                "sentence": pa.array(
                    [
                        "the fast key beats a slow scan",  # 2 attrs
                        "very big data",                    # 1 attr
                        "the key",                          # 'the' not in lexicon
                        "fast agg",                         # alias rewrite
                        "key fast",                         # attr AFTER mention: no
                    ],
                    type=pa.string(),
                )
            }
        )
    )
    rows = list(zip(out["entity_id"].to_pylist(), out["attr"].to_pylist()))
    assert rows == [
        ("ent:key", "fast"),
        ("ent:scan", "slow"),
        ("ent:data", "big"),
        ("ent:aggregate", "fast"),
    ]


def test_predicate_signatures_guard_fires_on_tiny_limit(sf_dir):
    from ner_funtool_ray.pipelines.openrel import kg_predicate_signatures

    with pytest.raises(RuntimeError, match="broadcast_limit"):
        kg_predicate_signatures(sf_dir, broadcast_limit=1)


def test_entity_summary_consistency(sf_dir):
    """Entity cards must be internally consistent with the triple table:
    Σ n_edges == |appears_in triples| + 2·|cooccurs triples|, and every
    entity has n_preds ≥ 1."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.pipelines.openrel import kg_entity_summary

    cards = kg_entity_summary(sf_dir).to_pandas()
    triples = kg_from_sf_dir(sf_dir).to_pandas()
    n_appears = int((triples["pred"] == "appears_in").sum())
    n_cooc = int((triples["pred"] == "cooccurs_with").sum())
    assert int(cards["n_edges"].sum()) == n_appears + 2 * n_cooc
    assert (cards["n_preds"] >= 1).all()
    assert (cards["n_neighbors"] <= cards["n_edges"]).all()


def test_typed_triples_weights_sum_to_mention_total(sf_dir):
    """Σ weight over has_type triples == total gazetteer mentions in the
    corpus (typing partitions mentions; nothing is dropped or doubled)."""
    import re

    import pyarrow.parquet as pq

    from ner_funtool_ray.config import GAZETTEER
    from ner_funtool_ray.pipelines.openrel import kg_typed_triples

    typed = kg_typed_triples(sf_dir).to_pandas()
    assert (typed["pred"] == "has_type").all()

    terms = sorted(GAZETTEER.keys(), key=len, reverse=True)
    pat = re.compile(r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b")
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    total = sum(
        len(pat.findall(t or "")) for t in docs["text"].to_pylist()
    )
    assert int(typed["weight"].sum()) == total
