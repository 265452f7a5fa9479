"""Flagship KG-construction pipeline (SURVEY.md §7.1).

read_parquet → P0 ingest (row_id, sha256) → P1 sentence split → mention
detection (gazetteer path here; model path in pipelines.tagging) →
P6 canonicalize → P7 triples (dedup + subject buckets).

Every stage is a streaming ``map_batches`` / ``groupby`` — nothing
materializes the corpus; consume with write_parquet or an aggregate.
"""

from __future__ import annotations

import ray.data

from ner_funtool_ray.config import PipelineConfig
from ner_funtool_ray.corpus import corpus_from_documents
from ner_funtool_ray.stages.canonicalize import canonicalize
from ner_funtool_ray.stages.gazetteer import extract_mentions
from ner_funtool_ray.stages.ingest import ingest
from ner_funtool_ray.stages.materialize import all_triples
from ner_funtool_ray.stages.sentence import split_to_sentences


def mentions_dataset(
    corpus: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    docs = ingest(corpus)
    sents = split_to_sentences(docs)
    mentions = extract_mentions(
        sents, gazetteer=cfg.gazetteer, batch_size=cfg.mention_batch_size
    )
    return canonicalize(mentions, aliases=cfg.aliases)


def linked_mentions(
    corpus: "ray.data.Dataset", cfg: PipelineConfig | None = None,
    threshold: float = 0.85,
) -> "ray.data.Dataset":
    """mentions + (linked_entity, link_score) via the P5 broadcast-index
    linker; catalog = the gazetteer's canonical surfaces."""
    from ner_funtool_ray.stages.link import link_mentions

    cfg = cfg or PipelineConfig()
    catalog = sorted({cfg.aliases.get(t, t) for t in cfg.gazetteer})
    return link_mentions(
        mentions_dataset(corpus, cfg), catalog, threshold=threshold
    )


def link_canonicalized_mentions(
    corpus: "ray.data.Dataset", cfg: PipelineConfig | None = None,
    threshold: float = 0.85,
) -> "ray.data.Dataset":
    """Full P5+P6: mentions are linked against the entity catalog
    (MinHash blocking + cosine) and the canonical entity id becomes the
    LINKED entity when the linker is confident, else the alias-normalized
    surface — the union of the static alias table and the similarity-based
    alias discovery the north rule describes.  entity_id is overwritten so
    downstream triple materialization is unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc

    linked = linked_mentions(corpus, cfg, threshold)

    def resolve(batch: pa.Table) -> pa.Table:
        use_link = pc.not_equal(batch["linked_entity"], "")
        canon = pc.if_else(use_link, batch["linked_entity"], batch["canonical"])
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        ent = pc.binary_join_element_wise(
            pa.array(["ent:"] * len(batch), type=pa.string()), canon, ""
        )
        batch = batch.set_column(
            batch.schema.get_field_index("canonical"), "canonical", canon
        )
        return batch.set_column(
            batch.schema.get_field_index("entity_id"), "entity_id", ent
        )

    return linked.map_batches(resolve, batch_format="pyarrow")


def kg_triples_linked(
    corpus: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """Flagship variant with the linking-based canonicalization."""
    return all_triples(link_canonicalized_mentions(corpus, cfg))


def kg_triples(
    corpus: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """corpus table → deduplicated weighted (subj, pred, obj, weight)."""
    return all_triples(mentions_dataset(corpus, cfg))


def kg_from_sf_dir(sf_dir: str, cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    """documents.parquet in ``sf_dir`` → triples (the driver entry path)."""
    return kg_triples(corpus_from_documents(sf_dir), cfg)
