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


def kg_incremental_triples(
    sf_dir: str, cfg: PipelineConfig | None = None, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Incremental KG maintenance → the DELTA ``(subj, pred, obj, weight)``
    a new document batch adds to an existing graph: triples extracted from
    the newly-arrived half of the corpus (``doc_id % 2 == 1``) whose key is
    NOT already present in the base graph built from the existing half
    (``doc_id % 2 == 0``) — exactly the rows an upsert into the stored
    triple table would insert (key-level anti-join; weight merging for
    existing keys is a trivial group-sum the delta consumer owns).

    At 100 TB the base graph is a stored table, not a recompute — the plan
    only assumes BOTH sides arrive as triple datasets, which are
    entity-vocabulary-bounded, far below corpus size.  The anti-join
    hash-buckets both sides by the triple key (crc32, content-based and
    cross-process deterministic like ``bucketed_group_sum``'s string
    path), so each bucket group holds every base/new row of a key and the
    per-bucket anti-join is a vectorized pandas merge — no driver
    materialization, no broadcast of the (potentially huge) base graph."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    base = kg_triples(corpus_from_documents(sf_dir, doc_parity=0), cfg)
    new = kg_triples(corpus_from_documents(sf_dir, doc_parity=1), cfg)

    def widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import zlib

            keys = [
                f"{s}\x00{p}\x00{o}"
                for s, p, o in zip(
                    batch["subj"].to_pylist(),
                    batch["pred"].to_pylist(),
                    batch["obj"].to_pylist(),
                )
            ]
            bucket = np.fromiter(
                (zlib.crc32(k.encode("utf-8")) % n_buckets for k in keys),
                dtype=np.int64,
                count=len(keys),
            )
            return batch.append_column(
                "side", pa.array(np.full(len(keys), side, dtype=np.int8))
            ).append_column("bucket", pa.array(bucket))

        return fn

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        newr = group.loc[group["side"] == 1, ["subj", "pred", "obj", "weight"]]
        baser = group.loc[
            group["side"] == 0, ["subj", "pred", "obj"]
        ].drop_duplicates()
        out = newr.merge(
            baser, on=["subj", "pred", "obj"], how="left", indicator=True
        )
        out = out.loc[out["_merge"] == "left_only",
                      ["subj", "pred", "obj", "weight"]]
        out["weight"] = out["weight"].astype(np.int64)
        return out

    return (
        base.map_batches(widen(0), batch_format="pyarrow")
        .union(new.map_batches(widen(1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
    )


def kg_upsert_merged(
    sf_dir: str, cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """The UPSERT companion of :func:`kg_incremental_triples`: the merged
    graph after the new document batch lands — base ∪ new with weights
    SUMMED on key collisions (the "weight merging the delta consumer
    owns" step, executed end-to-end).

    Plan: union the two triple streams and run one bounded
    ``bucketed_group_sum`` over the key — the same single shuffle the
    stored-table upsert would do; nothing driver-side.  Invariant (tested):
    result == kg_triples over the whole corpus, because triple weights are
    themselves per-doc-partition sums."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    base = kg_triples(corpus_from_documents(sf_dir, doc_parity=0), cfg)
    new = kg_triples(corpus_from_documents(sf_dir, doc_parity=1), cfg)
    out = bucketed_group_sum(
        base.union(new),
        ["subj", "pred", "obj"],
        sum_cols={"weight": "weight"},
        count_col=None,
        driver_cap=2_000_000,
    )
    return out.select_columns(["subj", "pred", "obj", "weight"])


def kg_graph_diff(
    sf_dir: str, cfg: PipelineConfig | None = None, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Versioned-KG full diff between the base (``doc_id % 2 == 0``) and
    new (``doc_id % 2 == 1``) graphs: one row per triple key whose weight
    changed, with ``status`` ∈ added / removed / changed and both weights
    (0 where the side lacks the key) — the audit a KG release pipeline
    publishes next to the upsert.

    Same key-bucketed co-location as :func:`kg_incremental_triples`
    (both sides are entity-vocabulary-bounded triple aggregates); the
    per-bucket full-outer merge is a vectorized pandas join, and
    unchanged keys are dropped before leaving the bucket."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    base = kg_triples(corpus_from_documents(sf_dir, doc_parity=0), cfg)
    new = kg_triples(corpus_from_documents(sf_dir, doc_parity=1), cfg)

    def widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import zlib

            keys = [
                f"{s}\x00{p}\x00{o}"
                for s, p, o in zip(
                    batch["subj"].to_pylist(),
                    batch["pred"].to_pylist(),
                    batch["obj"].to_pylist(),
                )
            ]
            bucket = np.fromiter(
                (zlib.crc32(k.encode("utf-8")) % n_buckets for k in keys),
                dtype=np.int64,
                count=len(keys),
            )
            return batch.append_column(
                "side", pa.array(np.full(len(keys), side, dtype=np.int8))
            ).append_column("bucket", pa.array(bucket))

        return fn

    def diff(group: pd.DataFrame) -> pd.DataFrame:
        key = ["subj", "pred", "obj"]
        baser = group.loc[group["side"] == 0, key + ["weight"]].rename(
            columns={"weight": "base_weight"}
        )
        newr = group.loc[group["side"] == 1, key + ["weight"]].rename(
            columns={"weight": "new_weight"}
        )
        m = baser.merge(newr, on=key, how="outer")
        bw = m["base_weight"].fillna(0).astype(np.int64)
        nw = m["new_weight"].fillna(0).astype(np.int64)
        m["base_weight"] = bw
        m["new_weight"] = nw
        m["status"] = np.where(
            bw == 0, "added", np.where(nw == 0, "removed", "changed")
        )
        return m.loc[
            bw != nw,
            ["subj", "pred", "obj", "base_weight", "new_weight", "status"],
        ]

    return (
        base.map_batches(widen(0), batch_format="pyarrow")
        .union(new.map_batches(widen(1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(diff, batch_format="pandas")
    )


def kg_graph_similarity(
    sf_dir: str, cfg: PipelineConfig | None = None, n_buckets: int = 32
) -> "ray.data.Dataset":
    """One-row release gate over the base/new graphs: triple-key counts
    (base, new, shared) plus integer-ppm key Jaccard and the
    added/removed/changed tallies — the summary a CI gate thresholds
    before publishing a new KG build (detail rows: :func:`kg_graph_diff`).

    Same key-bucketed co-location as the diff; each bucket reduces to
    one partial-count row, so the driver merge is bucket-bounded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as _rd

    base = kg_triples(corpus_from_documents(sf_dir, doc_parity=0), cfg)
    new = kg_triples(corpus_from_documents(sf_dir, doc_parity=1), cfg)

    def widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import zlib

            keys = [
                f"{s}\x00{p}\x00{o}"
                for s, p, o in zip(
                    batch["subj"].to_pylist(),
                    batch["pred"].to_pylist(),
                    batch["obj"].to_pylist(),
                )
            ]
            bucket = np.fromiter(
                (zlib.crc32(k.encode("utf-8")) % n_buckets for k in keys),
                dtype=np.int64,
                count=len(keys),
            )
            return pa.table(
                {
                    "key": pa.array(keys, type=pa.string()),
                    "weight": batch["weight"].cast(pa.int64()),
                    "side": pa.array(
                        np.full(len(keys), side, dtype=np.int8)
                    ),
                    "bucket": pa.array(bucket),
                }
            )

        return fn

    def tally(group: pd.DataFrame) -> pd.DataFrame:
        b = group[group["side"] == 0].set_index("key")["weight"]
        n = group[group["side"] == 1].set_index("key")["weight"]
        shared = b.index.intersection(n.index)
        changed = int((b.loc[shared] != n.loc[shared]).sum())
        return pd.DataFrame(
            {
                "n_base": [len(b)],
                "n_new": [len(n)],
                "n_shared": [len(shared)],
                "n_changed": [changed],
            }
        )

    parts = (
        base.map_batches(widen(0), batch_format="pyarrow")
        .union(new.map_batches(widen(1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(tally, batch_format="pandas")
        .materialize()
    )
    n_base = int(parts.sum("n_base") or 0)
    n_new = int(parts.sum("n_new") or 0)
    n_shared = int(parts.sum("n_shared") or 0)
    n_changed = int(parts.sum("n_changed") or 0)
    union = n_base + n_new - n_shared
    return _rd.from_arrow(
        pa.table(
            {
                "n_base": pa.array([n_base], type=pa.int64()),
                "n_new": pa.array([n_new], type=pa.int64()),
                "n_shared": pa.array([n_shared], type=pa.int64()),
                "n_added": pa.array([n_new - n_shared], type=pa.int64()),
                "n_removed": pa.array([n_base - n_shared], type=pa.int64()),
                "n_changed": pa.array([n_changed], type=pa.int64()),
                "key_jaccard_ppm": pa.array(
                    [n_shared * 1_000_000 // union if union else 1_000_000],
                    type=pa.int64(),
                ),
            }
        )
    )


def kg_from_sf_dir_counted(
    sf_dir: str,
    cfg: PipelineConfig | None = None,
    run: str = "ner_funtool_counters",
) -> "ray.data.Dataset":
    """``kg_from_sf_dir`` with per-stage run counters (north rule:
    lineage + counters).  Each ``count_rows`` insert is a zero-copy
    pass-through reporting rows/batches to the named counter actor, so
    results are byte-identical to the uncounted flagship (tested); the
    CLI's resumable_write snapshot lands the counts in the output
    manifest, and a RESUMED run shows its skip in the ingest counter."""
    from ner_funtool_ray.stages.gazetteer import extract_mentions
    from ner_funtool_ray.state.counters import count_rows

    cfg = cfg or PipelineConfig()
    docs = count_rows(ingest(corpus_from_documents(sf_dir)), "ingest", run)
    sents = count_rows(split_to_sentences(docs), "sentences", run)
    mentions = count_rows(
        extract_mentions(
            sents, gazetteer=cfg.gazetteer, batch_size=cfg.mention_batch_size
        ),
        "mentions",
        run,
    )
    canon = canonicalize(mentions, aliases=cfg.aliases)
    return count_rows(all_triples(canon), "triples", run)
