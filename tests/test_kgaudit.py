"""Governance audits (pipelines/kgaudit.py).  Corpus-level oracle parity
runs in test_queries_oracle.py (where kg_isolated_entities is the
all-connected empty row); these pin the semantics on planted inputs."""

import pyarrow as pa
import pyarrow.parquet as pq

from ner_funtool_ray.pipelines.kgaudit import (
    gazetteer_coverage,
    kg_isolated_entities,
    kg_source_contribution,
)


def _write_docs(tmp_path, doc_ids, texts, sources=None):
    n = len(doc_ids)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
                "source": pa.array(sources or ["t"] * n, type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_isolated_entities_planted(ray_session, tmp_path):
    # 'vector' only ever appears alone; 'scan' appears alone once but
    # pairs with 'join' elsewhere → only vector is isolated
    sf = _write_docs(
        tmp_path,
        [1, 2, 3, 4],
        ["vector alone", "vector again", "scan solo", "scan join"],
    )
    t = kg_isolated_entities(sf)
    assert t.to_pydict() == {
        "entity_id": ["ent:vector"],
        "n_mentions": [2],
    }


def test_isolated_entities_empty_keeps_schema(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [1], ["scan join"])
    t = kg_isolated_entities(sf)
    assert t.num_rows == 0
    assert t.schema.names == ["entity_id", "n_mentions"]


def test_gazetteer_coverage_ratio(ray_session, tmp_path):
    # 6 word tokens, 3 gazetteer mentions → exactly half coverage
    sf = _write_docs(
        tmp_path, [1, 2], ["scan the big join", "sort it"]
    )
    row = gazetteer_coverage(sf).iloc[0]
    assert (row["n_tokens"], row["n_mention_tokens"]) == (6, 3)
    assert row["coverage_ppm"] == 500_000


def test_source_contribution_counts(ray_session, tmp_path):
    # source A: 2 docs, 3 mentions, 2 distinct entities ('agg'→aggregate
    # alias); B: 1 doc, zero mentions
    sf = _write_docs(
        tmp_path,
        [1, 2, 3],
        ["scan scan", "agg here", "nothing relevant"],
        ["A", "A", "B"],
    )
    df = (
        kg_source_contribution(sf).to_pandas().set_index("source").sort_index()
    )
    assert tuple(df.loc["A"][["n_docs", "n_mentions", "n_entities"]]) == (
        2, 3, 2,
    )
    assert tuple(df.loc["B"][["n_docs", "n_mentions", "n_entities"]]) == (
        1, 0, 0,
    )
