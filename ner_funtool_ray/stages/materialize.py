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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.stages.ingest import stable_id64
from ner_funtool_ray.utils import pa_from_pandas


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
    partial-then-final aggregation; bucketed merge bounds shuffle groups)."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    partial = mentions.map_batches(_partial_appears, batch_format="pyarrow")
    out = bucketed_group_sum(
        partial, ["subj", "pred", "obj"],
        sum_cols={"weight": "weight"}, count_col=None,
        driver_cap=2_000_000,  # triple partials ≈ bounded output → the
        # size-guarded driver merge skips the fixed-cost sort when small
    )
    return out.select_columns(["subj", "pred", "obj", "weight"])


_PAIR_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
     ("weight", pa.int64())]
)


def _bucket_doc_pairs(group: pd.DataFrame) -> pa.Table:
    """One hash bucket of docs → partial (subj, pred, obj, weight) counts.

    Vectorized: distinct (row_id, entity_id) self-merged on row_id
    (pandas hash join), upper-triangle filter, then a local groupby count —
    no per-document Python loop."""
    d = group[["row_id", "entity_id"]].drop_duplicates()
    m = d.merge(d, on="row_id", suffixes=("_a", "_b"))
    m = m[m["entity_id_a"] < m["entity_id_b"]]
    agg = (
        m.groupby(["entity_id_a", "entity_id_b"], sort=False)
        .size()
        .reset_index(name="weight")
    )
    return pa.table(
        {
            "subj": pa.array(agg["entity_id_a"], type=pa.string()),
            "pred": pa.array(["cooccurs_with"] * len(agg), type=pa.string()),
            "obj": pa.array(agg["entity_id_b"], type=pa.string()),
            "weight": pa.array(agg["weight"].to_numpy(dtype=np.int64)),
        },
        schema=_PAIR_SCHEMA,
    )


def cooccurs_triples(
    mentions: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """entity-pair co-occurrence per document → weight = n docs.

    Shuffle plan: project to (row_id, entity_id), batch-local distinct,
    then co-locate documents by ``bucket = row_id % n_buckets`` — a groupby
    over n_buckets groups (bounded), NOT one group per document — and expand
    pairs with a vectorized self-join per bucket.  The final small groupby
    sums per-bucket partial counts.
    """

    def slim_distinct(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["row_id", "entity_id"]).to_pandas().drop_duplicates()
        )
        df["bucket"] = (df["row_id"] % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    slim = mentions.map_batches(slim_distinct, batch_format="pyarrow")
    pairs = slim.groupby("bucket").map_groups(
        _bucket_doc_pairs, batch_format="pandas"
    )
    out = bucketed_group_sum(
        pairs, ["subj", "pred", "obj"],
        sum_cols={"weight": "weight"}, count_col=None,
        driver_cap=2_000_000,
    )
    return out.select_columns(["subj", "pred", "obj", "weight"])


def doc_entity_summary(
    mentions: "ray.data.Dataset", checkpoint_dir: str | None = None
) -> "ray.data.Dataset":
    """Compact per-doc summary: (row_id, repo, entity_id, n_mentions),
    pinned ONCE.  ``all_triples`` fans out into two consumers (appears_in +
    cooccurs); without pinning, Ray re-executes the entire upstream
    (read → tag → decode) once per branch.

    Two pinning modes:
    - default: ``materialize()`` into the object store — right when the
      summary (distinct doc×entity rows, orders of magnitude smaller than
      the corpus) fits cluster memory + spill;
    - ``checkpoint_dir``: write the summary to partitioned parquet and read
      it back — the 100TB path: the summary lands on durable storage, both
      branches stream from it, and a failed downstream stage resumes from
      the checkpoint WITHOUT re-running tagging (stage-level lineage).
      An existing non-empty checkpoint is reused as-is.
    """
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    if checkpoint_dir is not None:
        import glob
        import os

        from ner_funtool_ray.sources.io import read_parquet_auto

        if not glob.glob(os.path.join(checkpoint_dir, "*.parquet")):
            summary = bucketed_group_sum(
                mentions.select_columns(["row_id", "repo", "entity_id"]),
                ["row_id", "repo", "entity_id"],
                count_col="n_mentions",
                driver_cap=2_000_000,  # partials ≈ summary here (docs
                # rarely split across batches) and the summary is being
                # checkpointed anyway — the pin just moves earlier
            )
            summary.select_columns(
                ["row_id", "repo", "entity_id", "n_mentions"]
            ).write_parquet(checkpoint_dir)
        return read_parquet_auto(checkpoint_dir)

    summary = bucketed_group_sum(
        mentions.select_columns(["row_id", "repo", "entity_id"]),
        ["row_id", "repo", "entity_id"],
        count_col="n_mentions",
        driver_cap=2_000_000,  # see checkpoint branch note
    )
    return summary.materialize()


def _assemble_triples_local(df: pd.DataFrame) -> pa.Table:
    """Driver-side triple assembly from a doc-entity summary DataFrame
    (row_id, repo, entity_id, n_mentions) — the same appears_in/cooccurs
    math as the distributed path in one pass, with the pair expansion on
    FACTORIZED int codes (string merges on the ~k² expansion were 3×
    slower).  Entity codes are rank-ordered so code comparison equals the
    distributed path's lexicographic ``entity_id_a < entity_id_b``."""
    appears = (
        df.groupby(["entity_id", "repo"], sort=False)["n_mentions"]
        .sum()
        .reset_index()
    )

    ent_codes_raw, ent_uniq = pd.factorize(df["entity_id"])
    order = np.argsort(ent_uniq)  # rank in lexicographic order
    rank_of = np.empty(len(ent_uniq), dtype=np.int64)
    rank_of[order] = np.arange(len(ent_uniq), dtype=np.int64)
    ents_sorted = ent_uniq.to_numpy()[order]
    row_codes, _ = pd.factorize(df["row_id"])

    # distinct (doc, entity) pairs as sorted int keys — np.unique gives
    # them ordered by (doc, entity-rank), which the expansion below relies
    # on for its c_a < c_b filter
    n_ents = np.int64(len(ent_uniq))
    uk0 = np.unique(row_codes.astype(np.int64) * n_ents
                    + rank_of[ent_codes_raw])
    c = uk0 % n_ents
    r = uk0 // n_ents
    # per-doc all-pairs expansion, pure numpy (a pandas self-merge here
    # was the assembly's dominant cost): for each element, pair it with
    # every element of its doc block, then keep the strict upper triangle
    starts, ks = np.unique(r, return_index=True, return_counts=True)[1:]
    k_per_el = np.repeat(ks, ks)
    left = np.repeat(np.arange(len(uk0), dtype=np.int64), k_per_el)
    el_block_start = np.concatenate(
        [[0], np.cumsum(k_per_el[:-1])]
    ).astype(np.int64)
    within = np.arange(len(left), dtype=np.int64) - np.repeat(
        el_block_start, k_per_el
    )
    right = np.repeat(np.repeat(starts, ks), k_per_el) + within
    mask = right > left  # blocks are entity-rank-sorted ⇒ c[right] > c[left]
    uk, counts = np.unique(
        c[left[mask]] * n_ents + c[right[mask]], return_counts=True
    )
    ca = uk // n_ents
    cb = uk % n_ents

    return pa.table(
        {
            "subj": pa.array(
                np.concatenate(
                    [appears["entity_id"].to_numpy(), ents_sorted[ca]]
                ),
                type=pa.string(),
            ),
            "pred": pa.array(
                ["appears_in"] * len(appears)
                + ["cooccurs_with"] * len(uk),
                type=pa.string(),
            ),
            "obj": pa.array(
                np.concatenate(
                    [appears["repo"].to_numpy(), ents_sorted[cb]]
                ),
                type=pa.string(),
            ),
            "weight": pa.array(
                np.concatenate(
                    [
                        appears["n_mentions"].to_numpy(dtype=np.int64),
                        counts.astype(np.int64),
                    ]
                )
            ),
        },
        schema=_PAIR_SCHEMA,
    )


def all_triples(
    mentions: "ray.data.Dataset", n_buckets: int = 64,
    checkpoint_dir: str | None = None,
    driver_cap: int | None = 200_000,
) -> "ray.data.Dataset":
    """Both triple families from ONE pass over the corpus via the
    materialized doc-entity summary, merged in ONE final shuffle.

    Shuffle count (each all-to-all has fixed barrier latency): summary
    merge (1) + doc-bucket pair expansion (1) + one shared final
    (subj, pred, obj) merge over the UNION of appears/cooccur partials (1).

    Size guard (``driver_cap``, same pattern as ``bucketed_group_sum`` /
    ``clusters_from_pairs_ds``): the summary is already pinned and
    counted; at or below the cap the whole triple assembly is ONE
    driver-side pandas pass — skipping the two remaining all-to-all
    barriers, whose ~3 s fixed latency each dominates small/medium jobs
    (measured: the sf0.1 headline spends >60% of its wall in them).
    Above the cap (or when checkpointing), the distributed plan runs
    unchanged.  Both paths compute identical triples (parity-tested)."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    summary = doc_entity_summary(mentions, checkpoint_dir=checkpoint_dir)

    if driver_cap is not None and checkpoint_dir is None:
        n = summary.count()
        if n == 0:
            return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
        if n <= driver_cap:
            df = summary.select_columns(
                ["row_id", "repo", "entity_id", "n_mentions"]
            ).to_pandas()
            # quadratic guard: the pair expansion is Σ k_doc² — a single
            # degenerate doc with huge entity fan-out must not blow up the
            # driver; such inputs take the distributed path (which spreads
            # the same expansion across doc buckets)
            ks = np.unique(df["row_id"].to_numpy(), return_counts=True)[1]
            if float((ks.astype(np.float64) ** 2).sum()) <= 2e8:
                return ray.data.from_arrow(_assemble_triples_local(df))

    def appears_partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["entity_id", "repo", "n_mentions"])
            .to_pandas()
            .groupby(["entity_id", "repo"], sort=False)["n_mentions"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "subj": pa.array(df["entity_id"], type=pa.string()),
                "pred": pa.array(["appears_in"] * len(df), type=pa.string()),
                "obj": pa.array(df["repo"], type=pa.string()),
                "weight": pa.array(df["n_mentions"].to_numpy(dtype=np.int64)),
            },
            schema=_PAIR_SCHEMA,
        )

    def with_doc_bucket(batch: pa.Table) -> pa.Table:
        df = batch.select(["row_id", "entity_id"]).to_pandas()
        df["bucket"] = (df["row_id"] % n_buckets).astype(np.int64)
        return pa_from_pandas(df, preserve_index=False)

    appears = summary.map_batches(appears_partial, batch_format="pyarrow")
    cooccur = (
        summary.map_batches(with_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_doc_pairs, batch_format="pandas")
    )
    merged = bucketed_group_sum(
        appears.union(cooccur), ["subj", "pred", "obj"],
        sum_cols={"weight": "weight"}, count_col=None,
        driver_cap=2_000_000,  # final triple merge: partials ≈ output
    )
    return merged.select_columns(["subj", "pred", "obj", "weight"])


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


# --- RDF interchange export ---------------------------------------------------


class _NtFilenameProvider:
    """``.nt``-suffixed shard names for the N-Triples sink."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        return f"{write_uuid}_{task_index:06}_{block_index:06}.nt"


def _nt_term(value: str, base: str) -> str:
    """Percent-encode a graph identifier into an IRI term.  N-Triples
    forbids space, <>, quotes, braces, pipes, carets, backticks and
    backslashes inside IRIREF; urllib's quote handles all of them plus
    control chars, and keeps the readable ``:/._-`` subset."""
    from urllib.parse import quote

    return f"<{base}{quote(value, safe=':/._-~')}>"


def write_ntriples(
    triples: "ray.data.Dataset", out_dir: str, base: str = "urn:graft:"
) -> None:
    """RDF N-Triples interchange export: ``(subj, pred, obj)`` → one
    ``<s> <p> <o> .`` line per triple, one ``.nt`` shard per block (the
    sink never funnels rows through the driver).  N-Triples is strictly
    ternary, so the ``weight`` column is not representable and is
    dropped here — :func:`write_triples`' partitioned parquet remains
    the lossless store; this is the interchange view a downstream triple
    store ingests.  Lines are written verbatim (no CSV quoting: a
    one-column table with ``quoting_style='none'`` and a delimiter that
    cannot appear in an escaped IRI)."""

    def fmt(batch: pa.Table) -> pa.Table:
        lines = [
            f"{_nt_term(s, base)} {_nt_term(p, base)} {_nt_term(o, base)} ."
            for s, p, o in zip(
                batch["subj"].to_pylist(),
                batch["pred"].to_pylist(),
                batch["obj"].to_pylist(),
            )
        ]
        return pa.table({"line": pa.array(lines, type=pa.string())})

    def _nt_opts() -> dict:
        # built lazily on the writing worker (WriteOptions is unpicklable)
        import pyarrow.csv as pacsv

        return {
            "write_options": pacsv.WriteOptions(
                include_header=False, quoting_style="none", delimiter="\x1f"
            )
        }

    triples.map_batches(fmt, batch_format="pyarrow").write_csv(
        out_dir,
        arrow_csv_args_fn=_nt_opts,
        filename_provider=_NtFilenameProvider(),
    )


def read_ntriples(
    in_dir: str, base: str = "urn:graft:"
) -> "ray.data.Dataset":
    """Roundtrip reader for :func:`write_ntriples` shards → ``(subj,
    pred, obj)``.  Reads the ``.nt`` files as one-column text (same
    no-quoting CSV trick) and percent-decodes the three IRI terms in a
    vectorized batch pass."""
    import pyarrow.csv as pacsv

    import ray.data

    ds = ray.data.read_csv(
        in_dir,
        file_extensions=["nt"],
        read_options=pacsv.ReadOptions(
            column_names=["line"], autogenerate_column_names=False
        ),
        parse_options=pacsv.ParseOptions(delimiter="\x1f", quote_char=False),
    )

    def parse(batch: pa.Table) -> pa.Table:
        from urllib.parse import unquote

        subj, pred, obj = [], [], []
        n = len(base)
        for line in batch["line"].to_pylist():
            s, p, o = line.rstrip(" .").split(" ")
            subj.append(unquote(s[1 + n : -1]))
            pred.append(unquote(p[1 + n : -1]))
            obj.append(unquote(o[1 + n : -1]))
        return pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "pred": pa.array(pred, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
