"""P7 triple materialization: mentions → deduplicated (subj, pred, obj) triples.

Scale design (SURVEY.md §7.1, shuffle #3):

- **pre-aggregate inside map_batches** — each batch first reduces to its
  distinct (subj, pred, obj[, weight]) rows, so the wide ``groupby`` only
  shuffles partial aggregates, not raw mention rows;
- ``appears_in`` triples: entity → repo with mention-count weight;
- ``cooccurs_with`` triples: unordered entity pairs per document
  (subj < obj lexicographically) with document-count weight — per-doc pair
  expansion happens inside ``groupby(row_id).map_groups`` so only mention
  rows of one document are ever co-resident;
- output: subject-hash bucket column (``hash(subj) % n`` + salt for hot
  subjects) for partitioned, resumable parquet layout.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ner_funtool_ray.stages.ingest import stable_id64


def _partial_appears(batch: pa.Table) -> pa.Table:
    """Batch-local partial aggregate: (entity_id, repo) → mention count."""
    df = (
        batch.select(["entity_id", "repo"])
        .to_pandas()
        .groupby(["entity_id", "repo"], sort=False)
        .size()
        .reset_index(name="weight")
    )
    return pa.table(
        {
            "subj": df["entity_id"].astype(str),
            "pred": np.full(len(df), "appears_in", dtype=object),
            "obj": df["repo"].astype(str),
            "weight": df["weight"].astype(np.int64),
        }
    )


def appears_in_triples(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    """entity appears_in repo, weight = total mentions (exact dedup via
    partial-then-final Sum aggregation)."""
    partial = mentions.map_batches(_partial_appears, batch_format="pyarrow")
    return (
        partial.groupby(["subj", "pred", "obj"])
        .aggregate(Sum("weight", alias_name="weight"))
    )


def _doc_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ents = sorted(group["entity_id"].unique())
    pairs = list(combinations(ents, 2))
    if not pairs:
        return pd.DataFrame({"subj": [], "pred": [], "obj": [], "weight": []})
    return pd.DataFrame(
        {
            "subj": [a for a, _ in pairs],
            "pred": "cooccurs_with",
            "obj": [b for _, b in pairs],
            "weight": np.ones(len(pairs), dtype=np.int64),
        }
    )


def cooccurs_triples(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    """entity-pair co-occurrence per document → weight = n docs.

    groupby(row_id) co-locates one document's mentions; pair expansion is
    per-group; the final groupby sums the per-doc 1-weights.  Mentions are
    pre-projected to (row_id, entity_id) so the shuffle moves two columns.
    """
    slim = mentions.select_columns(["row_id", "entity_id"])
    pairs = slim.groupby("row_id").map_groups(_doc_pairs, batch_format="pandas")
    return (
        pairs.groupby(["subj", "pred", "obj"])
        .aggregate(Sum("weight", alias_name="weight"))
    )


def all_triples(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    return appears_in_triples(mentions).union(cooccurs_triples(mentions))


def add_subject_bucket(
    triples: "ray.data.Dataset",
    n_buckets: int = 16,
    hot_subjects: set[str] | None = None,
    salt_buckets: int = 8,
) -> "ray.data.Dataset":
    """+ subj_bucket = hash(subj) % n; hot subjects get salted into
    ``salt_buckets`` sub-buckets (hash(subj,obj)) so no single partition
    holds a whole hot entity (SURVEY.md §4 skew item)."""
    hot = hot_subjects or set()

    def bucket(batch: pa.Table) -> pa.Table:
        subs = batch["subj"].to_pylist()
        objs = batch["obj"].to_pylist()
        out = np.empty(len(subs), dtype=np.int64)
        for i, (s, o) in enumerate(zip(subs, objs)):
            if s in hot:
                out[i] = (
                    stable_id64(s) % n_buckets
                    + n_buckets * (stable_id64(s, o) % salt_buckets)
                )
            else:
                out[i] = stable_id64(s) % n_buckets
        return batch.append_column("subj_bucket", pa.array(out))

    return triples.map_batches(bucket, batch_format="pyarrow")


def write_triples(
    triples: "ray.data.Dataset", out_dir: str, n_buckets: int = 16
) -> None:
    """Partitioned, resumable output: one directory per subject bucket."""
    add_subject_bucket(triples, n_buckets).write_parquet(
        out_dir, partition_cols=["subj_bucket"]
    )
