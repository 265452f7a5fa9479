"""KG data-governance audits: per-source contribution, extraction
coverage, isolated entities.

The reports a KG-construction pipeline publishes next to the graph so a
data owner can answer "which feed contributed what", "how much of the
corpus does the gazetteer actually see", and "which entities never
co-occur" — each a bounded-aggregate scan with a DuckDB twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.config import ALIASES, GAZETTEER
from ner_funtool_ray.functions.text import _WORD_RE
from ner_funtool_ray.pipelines.openrel import _gaz_pattern
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.graphops import _crc_bucket
from ner_funtool_ray.stages.groupagg import bucketed_group_sum


def kg_source_contribution(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Per document source: docs, mentions and DISTINCT entities it
    contributes to the graph — the feed-level accounting a governance
    review starts from.

    Plan: per-batch (source, doc/mention counts + distinct (source,
    entity) pairs) partials; the distinct-entity count resolves inside
    the source's hash bucket (pairs are |sources|×|entities|-bounded)."""
    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    pattern = _gaz_pattern(GAZETTEER)

    def partial(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        ents: list[str] = []
        n_docs: list[int] = []
        n_ment: list[int] = []
        per_src_docs: dict[str, int] = {}
        per_src_ment: dict[str, int] = {}
        pairs: set[tuple[str, str]] = set()
        for src, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            per_src_docs[src] = per_src_docs.get(src, 0) + 1
            m = 0
            for match in pattern.finditer(text or ""):
                s = match.group(1)
                pairs.add((src, "ent:" + ALIASES.get(s, s)))
                m += 1
            per_src_ment[src] = per_src_ment.get(src, 0) + m
        for src in per_src_docs:
            srcs.append(src)
            ents.append("")  # count row: no entity
            n_docs.append(per_src_docs[src])
            n_ment.append(per_src_ment[src])
        for src, ent in pairs:
            srcs.append(src)
            ents.append(ent)
            n_docs.append(0)
            n_ment.append(0)
        return pa.table(
            {
                "source": pa.array(srcs, type=pa.string()),
                "entity_id": pa.array(ents, type=pa.string()),
                "n_docs": pa.array(n_docs, type=pa.int64()),
                "n_mentions": pa.array(n_ment, type=pa.int64()),
                "sbucket": pa.array(_crc_bucket(srcs, n_buckets)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        counts = (
            g.groupby("source", sort=False)[["n_docs", "n_mentions"]]
            .sum()
            .reset_index()
        )
        dist = (
            g.loc[g["entity_id"] != "", ["source", "entity_id"]]
            .drop_duplicates()
            .groupby("source", sort=False)
            .size()
            .rename("n_entities")
            .reset_index()
        )
        out = counts.merge(dist, on="source", how="left")
        out["n_entities"] = out["n_entities"].fillna(0).astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_mentions"] = out["n_mentions"].astype(np.int64)
        return out

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("sbucket")
        .map_groups(merge, batch_format="pandas")
    )


def gazetteer_coverage(sf_dir: str) -> pd.DataFrame:
    """One-row extraction-coverage audit: corpus word tokens, gazetteer
    mention tokens (terms are single words by config validation) and
    ``coverage_ppm = mentions · 1e6 // tokens`` — how much of the corpus
    the dictionary actually sees; the first number to check before
    blaming recall on the tagger."""
    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    pattern = _gaz_pattern(GAZETTEER)

    def partial(batch: pa.Table) -> pa.Table:
        toks = 0
        ments = 0
        for text in batch["text"].to_pylist():
            t = text or ""
            toks += len(_WORD_RE.findall(t))
            ments += sum(1 for _ in pattern.finditer(t))
        return pa.table(
            {
                "t": pa.array([toks], type=pa.int64()),
                "m": pa.array([ments], type=pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").materialize()
    toks = int(parts.sum("t") or 0)
    ments = int(parts.sum("m") or 0)
    return pd.DataFrame(
        {
            "n_tokens": pd.array([toks], dtype="int64"),
            "n_mention_tokens": pd.array([ments], dtype="int64"),
            "coverage_ppm": pd.array(
                [ments * 1_000_000 // toks if toks else 0], dtype="int64"
            ),
        }
    )


def kg_isolated_entities(sf_dir: str, n_buckets: int = 64) -> pa.Table:
    """Entities that appear in the corpus but NEVER co-occur with another
    entity — graph-fringe nodes a pruning pass reviews (every edge-less
    node is invisible to the co-occurrence predicates).  Output
    (entity_id, n_mentions) as an Arrow table: the result is
    entity-vocabulary-bounded, and a materialized table keeps its schema
    even when NO entity is isolated (``Dataset.to_pandas()`` drops the
    columns of an all-empty dataset, which would fail the driver's
    schema check on the healthy all-connected corpus).

    Plan: per-doc distinct entity sets flag solo docs; an entity is
    isolated iff it never shares any doc — resolved as mention-count
    partials minus co-occurring entity keys inside one entity bucket."""
    from ner_funtool_ray.pipelines.openrel import _doc_entities_batch

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pattern = _gaz_pattern(GAZETTEER)

    def partial(batch: pa.Table) -> pa.Table:
        ents: list[str] = []
        ment: list[int] = []
        shared: list[int] = []
        counts: dict[str, int] = {}
        coocs: set[str] = set()
        for text in batch["text"].to_pylist():
            doc_ents = set()
            for m in pattern.finditer(text or ""):
                s = m.group(1)
                e = "ent:" + ALIASES.get(s, s)
                counts[e] = counts.get(e, 0) + 1
                doc_ents.add(e)
            if len(doc_ents) > 1:
                coocs |= doc_ents
        for e, c in counts.items():
            ents.append(e)
            ment.append(c)
            shared.append(1 if e in coocs else 0)
        return pa.table(
            {
                "entity_id": pa.array(ents, type=pa.string()),
                "n_mentions": pa.array(ment, type=pa.int64()),
                "n_shared": pa.array(shared, type=pa.int64()),
                "ebucket": pa.array(_crc_bucket(ents, n_buckets)),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        agg = (
            g.groupby("entity_id", sort=False)[["n_mentions", "n_shared"]]
            .sum()
            .reset_index()
        )
        out = agg.loc[agg["n_shared"] == 0, ["entity_id", "n_mentions"]]
        # typed Arrow output: an all-empty result keeps its schema (a
        # pandas-block dataset of empty object frames loses it)
        return pa.table(
            {
                "entity_id": pa.array(out["entity_id"], type=pa.string()),
                "n_mentions": pa.array(
                    out["n_mentions"].to_numpy(dtype=np.int64)
                ),
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(merge, batch_format="pandas")
    )
    import ray as _ray

    tables = _ray.get(out.to_arrow_refs())
    schema = pa.schema(
        [("entity_id", pa.string()), ("n_mentions", pa.int64())]
    )
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(
        [t.select(["entity_id", "n_mentions"]) for t in tables]
    )


__all__ = [
    "kg_source_contribution",
    "gazetteer_coverage",
    "kg_isolated_entities",
]
