"""Linking-based canonicalization: confident links override the surface
form; NIL mentions keep alias-normalized surfaces; triples flow unchanged."""

import pyarrow as pa
import ray.data

from ner_funtool_ray.config import PipelineConfig
from ner_funtool_ray.pipelines.kg import (
    kg_triples_linked,
    link_canonicalized_mentions,
)


def _corpus(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "repo": [r[0] for r in rows],
                "path": [f"p{i}" for i in range(len(rows))],
                "commit": ["c" * 40] * len(rows),
                "lang": ["en"] * len(rows),
                "content": [r[1] for r in rows],
            }
        )
    )


def test_confident_link_overrides_surface():
    # 'agg' is in the gazetteer; its exact catalog form is 'aggregate'
    # (alias), so linking resolves it; 'customer' links to itself.
    corpus = _corpus([("r1", "customer agg join")])
    out = link_canonicalized_mentions(corpus, threshold=0.5).to_pandas()
    by_surface = dict(zip(out["surface"], out["entity_id"]))
    assert by_surface["customer"] == "ent:customer"
    assert out.loc[out["surface"] == "customer", "link_score"].iloc[0] > 0.99
    # every entity_id is consistent with canonical
    for r in out.itertuples():
        assert r.entity_id == f"ent:{r.canonical}"


def test_nil_link_falls_back_to_alias_table():
    corpus = _corpus([("r1", "agg value")])
    out = link_canonicalized_mentions(corpus, threshold=0.99).to_pandas()
    # at threshold .99 'agg' cannot link (no exact catalog match) →
    # falls back to the static alias rewrite agg→aggregate
    row = out[out["surface"] == "agg"].iloc[0]
    assert row["entity_id"] == "ent:aggregate"


def test_kg_triples_linked_end_to_end():
    corpus = _corpus(
        [("r1", "customer join table"), ("r2", "customer sort"), ("r1", "join table")]
    )
    triples = kg_triples_linked(corpus).to_pandas()
    assert {"subj", "pred", "obj", "weight"} == set(triples.columns)
    appears = triples[triples["pred"] == "appears_in"]
    assert ("ent:customer" in set(appears["subj"]))
    cooc = triples[triples["pred"] == "cooccurs_with"]
    assert len(cooc) > 0
    # deterministic
    t2 = kg_triples_linked(corpus).to_pandas()
    key = ["subj", "pred", "obj"]
    assert triples.sort_values(key).reset_index(drop=True).equals(
        t2.sort_values(key).reset_index(drop=True)
    )
