"""Knowledge fusion, versioned reads, WL fingerprints, blocking audit,
statement reification.

Five KG-construction surfaces downstream of the extraction stack:

- :func:`kg_attr_fusion` — truth discovery over conflicting attribute
  observations: per entity, the majority-vote attribute with vote count,
  total evidence and an integer-exact confidence (ppm).  Data-fusion
  complement of the extraction in ``pipelines/openrel.py``
  (`EntityAttributeExtractor`): extraction emits every observation, fusion
  resolves them to one value per entity.
- :func:`kg_attr_latest` — last-write-wins versioned read: the attribute
  observed in the HIGHEST doc_id (ties: lexicographically smallest attr),
  i.e. the "current" value when doc_id orders ingestion batches.
- :func:`kg_wl_colors` — 1-dim Weisfeiler-Lehman color refinement over the
  co-occurrence graph: two rounds of hash(own color + sorted multiset of
  neighbor colors).  Entities with identical colors are structurally
  indistinguishable at radius 2 — the classic structural-fingerprint
  blocking key for entity-resolution over graphs (complements the
  name-similarity blocking in ``openrel.kg_merge_candidates``).
- :func:`er_blocking_quality` — audit of the MinHash-LSH blocking stage
  (`stages/dedup.py:minhash_candidate_pairs_ds`): pair completeness
  (candidate recall of exact-duplicate ground truth) and reduction ratio
  vs the quadratic all-pairs baseline, both exact-integer ppm.
- :func:`kg_reify_statements` — RDF-style statement reification: each
  co-occurrence edge becomes an addressable statement (md5 statement id)
  carrying its provenance (supporting-doc count + exemplar), the shape a
  downstream annotation/qualifier layer attaches to.

Scale design: every op is map_batches partial extraction → bounded-bucket
shuffles only (``bucketed_group_sum`` / ``attach_col`` / crc-bucketed
group-argmax).  The WL rounds move node-cardinality color tables through
the same bucketed equi-join the PageRank/BFS cores use; nothing funnels
the corpus through the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_funtool_ray.config import ALIASES, GAZETTEER
from ner_funtool_ray.functions.text import _WORD_RE, split_sentences
from ner_funtool_ray.pipelines.openrel import (
    ATTR_LEXICON,
    _gaz_pattern,
    kg_triple_provenance,
)
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.graphops import _crc_bucket, attach_col
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas


# ---------------------------------------------------------------------------
# attribute observations (shared by fusion + latest)
# ---------------------------------------------------------------------------


class AttrObservationExtractor:
    """map_batches callable: documents rows → (doc_id, entity_id, attr).

    Same adjectival-modifier semantics as
    ``openrel.EntityAttributeExtractor`` (last pregap token in the
    lexicon), but run per DOCUMENT with the doc_id carried through so
    downstream fusion can weigh and order observations by source."""

    def __init__(
        self,
        gazetteer: dict[str, str] | None = None,
        aliases: dict[str, str] | None = None,
        lexicon: frozenset[str] | None = None,
    ):
        self.pattern = _gaz_pattern(gazetteer or GAZETTEER)
        self.aliases = dict(ALIASES) if aliases is None else dict(aliases)
        self.lexicon = ATTR_LEXICON if lexicon is None else lexicon

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        ents: list[str] = []
        attrs: list[str] = []
        al = self.aliases
        lex = self.lexicon
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for sent in split_sentences(text or ""):
                parts = self.pattern.split(sent)
                n = (len(parts) - 1) // 2
                for i in range(n):
                    toks = _WORD_RE.findall(parts[2 * i].lower())
                    if toks and toks[-1] in lex:
                        m = parts[2 * i + 1]
                        doc_ids.append(doc_id)
                        ents.append("ent:" + al.get(m, m))
                        attrs.append(toks[-1])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "entity_id": pa.array(ents, type=pa.string()),
                "attr": pa.array(attrs, type=pa.string()),
            }
        )


def _attr_observations(sf_dir: str) -> "ray.data.Dataset":
    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(AttrObservationExtractor(), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kg_attr_fusion — majority-vote truth discovery
# ---------------------------------------------------------------------------


def kg_attr_fusion(
    sf_dir: str,
    n_buckets: int = 64,
    obs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Per entity: (fused_attr, votes, total, conf_ppm) by majority vote.

    Winner = the attribute with the most observations; ties break to the
    lexicographically smallest attr (deterministic, matches the SQL twin's
    ``ORDER BY n DESC, attr``).  ``conf_ppm = votes * 1e6 // total`` is
    integer-exact, so the DuckDB twin hash-matches.

    Plan: observation stream → bounded-bucket group-count per
    (entity, attr) → one more entity-bucketed shuffle for the per-entity
    argmax + total (partials are attribute-lexicon × entity-vocabulary
    bounded, never corpus-sized).  ``obs`` lets a caller share one
    materialized observation extraction across fusion rounds."""
    if obs is None:
        obs = _attr_observations(sf_dir)
    counts = bucketed_group_sum(
        obs.drop_columns(["doc_id"]),
        ["entity_id", "attr"],
        count_col="n",
        n_buckets=n_buckets,
    )

    def with_ebucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ebucket",
            pa.array(_crc_bucket(t["entity_id"].to_pylist(), n_buckets)),
        )

    def fuse(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["entity_id", "n", "attr"], ascending=[True, False, True]
        )
        tot = g.groupby("entity_id", sort=False)["n"].sum()
        win = g.drop_duplicates("entity_id")
        votes = win["n"].to_numpy(dtype=np.int64)
        total = tot.loc[win["entity_id"]].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "entity_id": pa.array(win["entity_id"], type=pa.string()),
                "fused_attr": pa.array(win["attr"], type=pa.string()),
                "votes": pa.array(votes),
                "total": pa.array(total),
                "conf_ppm": pa.array(votes * 1_000_000 // total),
            }
        )

    return (
        counts.map_batches(with_ebucket, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(fuse, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_attr_latest — last-write-wins versioned read
# ---------------------------------------------------------------------------


def kg_attr_latest(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per entity: the attribute observed in the highest doc_id
    (``as_of_doc``); ties within that doc break to the smallest attr.

    The (doc_id DESC, attr ASC) argmax is associative, so each batch
    reduces to one row per entity before the single bounded shuffle."""

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["entity_id", "doc_id", "attr"], ascending=[True, False, True]
        )
        return df.drop_duplicates("entity_id")

    def partial(t: pa.Table) -> pa.Table:
        df = best(t.to_pandas())
        out = pa_from_pandas(df, preserve_index=False)
        return out.append_column(
            "ebucket",
            pa.array(_crc_bucket(df["entity_id"].tolist(), n_buckets)),
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        df = best(g)
        return pa.table(
            {
                "entity_id": pa.array(df["entity_id"], type=pa.string()),
                "attr": pa.array(df["attr"], type=pa.string()),
                "as_of_doc": pa.array(
                    df["doc_id"].to_numpy(dtype=np.int64)
                ),
            }
        )

    return (
        _attr_observations(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# source_attr_reliability — truth-discovery source scoring
# ---------------------------------------------------------------------------


def source_attr_reliability(
    sf_dir: str,
    n_buckets: int = 64,
    obs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Per document source: how often its attribute observations agree
    with the corpus-fused majority value — ``reliability_ppm = n_agree ·
    1e6 // n_obs`` (one voting round of classic truth-discovery source
    scoring; the scores would reweight the next :func:`kg_attr_fusion`
    vote in an iterated system).

    Plan: the observation stream attaches its doc's ``source`` and the
    entity's fused value through two bucketed lookups (the fused table is
    entity-vocabulary-bounded), then per-batch (source, agree) partials
    ride one bounded group sum.  ``obs`` shares one materialized
    extraction with the fusion pass (and the weighted caller)."""
    if obs is None:
        obs = _attr_observations(sf_dir).materialize()
    if obs.count() == 0:
        # an empty fused table has no schema for the bucketed attach
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_obs": pa.array([], type=pa.int64()),
                    "n_agree": pa.array([], type=pa.int64()),
                    "reliability_ppm": pa.array([], type=pa.int64()),
                }
            )
        )
    src = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    fused = kg_attr_fusion(sf_dir, n_buckets=n_buckets, obs=obs).map_batches(
        lambda t: t.select(["entity_id", "fused_attr"]),
        batch_format="pyarrow",
    )
    with_src = attach_col(
        obs, "doc_id", src, "doc_id", "source", "source",
        n_buckets=n_buckets, how="inner",
    )
    with_fused = attach_col(
        with_src, "entity_id", fused, "entity_id", "fused_attr",
        "fused_attr", n_buckets=n_buckets, how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "agree": pc.equal(t["attr"], t["fused_attr"])
                .cast(pa.int64())
                .to_pylist(),
            }
        )
        agg = df.groupby("source", sort=False)["agree"].agg(
            n_obs="size", n_agree="sum"
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(agg["source"], type=pa.string()),
                "n_obs": pa.array(agg["n_obs"].to_numpy(dtype=np.int64)),
                "n_agree": pa.array(
                    agg["n_agree"].to_numpy(dtype=np.int64)
                ),
            }
        )

    agg = bucketed_group_sum(
        with_fused.map_batches(partial, batch_format="pyarrow"),
        keys=["source"],
        sum_cols={"n_obs": "n_obs", "n_agree": "n_agree"},
        count_col=None,
        n_buckets=n_buckets,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_obs": t["n_obs"],
                "n_agree": t["n_agree"],
                "reliability_ppm": pa.array(
                    np.asarray(t["n_agree"], dtype=np.int64)
                    * 1_000_000
                    // np.asarray(t["n_obs"], dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# kg_attr_fusion_weighted — iterated (2-round) truth discovery
# ---------------------------------------------------------------------------


def kg_attr_fusion_weighted(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Round-2 truth discovery: re-vote each entity's attribute with
    observations weighted by their SOURCE's round-1 reliability (the
    TruthFinder / Latent-Credibility iteration, cut to one re-vote so
    every number stays integer-exact).

    ``score(entity, attr) = Σ reliability_ppm(source(obs))`` over
    supporting observations; winner by (score DESC, attr ASC).  A value
    pushed only by unreliable sources loses to one backed by sources
    that usually agree with the majority — the disagreement-robustness
    plain majority vote lacks.

    Plan: reuses :func:`source_attr_reliability` (itself two bucketed
    lookups + one group sum); weights attach back onto the observation
    stream through the same source-bucketed join, then one
    (entity, attr) group sum and an entity-bucketed argmax.  The corpus
    is scanned ONCE: the observation extraction materializes (it is
    observation-sized, far below the corpus) and feeds all three passes."""
    obs = _attr_observations(sf_dir).materialize()
    if obs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([], type=pa.string()),
                    "fused_attr": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.int64()),
                    "n_obs": pa.array([], type=pa.int64()),
                }
            )
        )
    src = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    rel = source_attr_reliability(
        sf_dir, n_buckets=n_buckets, obs=obs
    ).map_batches(
        lambda t: t.select(["source", "reliability_ppm"]),
        batch_format="pyarrow",
    )
    with_src = attach_col(
        obs, "doc_id", src, "doc_id", "source", "source",
        n_buckets=n_buckets, how="inner",
    )
    with_r = attach_col(
        with_src, "source", rel, "source", "reliability_ppm", "r",
        n_buckets=n_buckets, how="inner",
    )
    scores = bucketed_group_sum(
        with_r.map_batches(
            lambda t: t.select(["entity_id", "attr", "r"]),
            batch_format="pyarrow",
        ),
        keys=["entity_id", "attr"],
        sum_cols={"score": "r"},
        count_col="n_obs",
        n_buckets=n_buckets,
    )

    def with_ebucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ebucket",
            pa.array(_crc_bucket(t["entity_id"].to_pylist(), n_buckets)),
        )

    def pick(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["entity_id", "score", "attr"], ascending=[True, False, True]
        )
        win = g.drop_duplicates("entity_id")
        return pa.table(
            {
                "entity_id": pa.array(win["entity_id"], type=pa.string()),
                "fused_attr": pa.array(win["attr"], type=pa.string()),
                "score": pa.array(win["score"].to_numpy(dtype=np.int64)),
                "n_obs": pa.array(win["n_obs"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        scores.map_batches(with_ebucket, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(pick, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_attr_conflicts — conflicting-observation report
# ---------------------------------------------------------------------------


def kg_attr_conflicts(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Entities whose observations disagree: (entity_id, n_values,
    n_obs) for entities with more than one distinct attribute value —
    the work queue a human-in-the-loop fusion review consumes."""
    counts = bucketed_group_sum(
        _attr_observations(sf_dir).drop_columns(["doc_id"]),
        ["entity_id", "attr"],
        count_col="n",
        n_buckets=n_buckets,
    )

    def with_ebucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ebucket",
            pa.array(_crc_bucket(t["entity_id"].to_pylist(), n_buckets)),
        )

    def report(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("entity_id", sort=False).agg(
            n_values=("attr", "nunique"), n_obs=("n", "sum")
        ).reset_index()
        agg = agg[agg["n_values"] > 1]
        agg["n_values"] = agg["n_values"].astype(np.int64)
        agg["n_obs"] = agg["n_obs"].astype(np.int64)
        return agg

    return (
        counts.map_batches(with_ebucket, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(report, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_wl_colors — Weisfeiler-Lehman structural fingerprints
# ---------------------------------------------------------------------------


def _wl_hash(own: str, sig: str) -> str:
    return hashlib.md5((own + "|" + sig).encode("utf-8")).hexdigest()


def _wl_sig_agg(g: pd.DataFrame) -> pa.Table:
    """Per-bucket WL signature reducer: (e, mc) edge rows → (e, sig) where
    ``sig = md5(','.join(sorted(md5(mc_i))))`` — the sorted neighbor-color
    multiset reduced to ONE 32-char digest inside the group.

    Skew-bounded by construction: a 10⁶-degree hub contributes a 10⁶×16 B
    fixed-width numpy digest array that is sorted and STREAMED into the
    hasher in 8k-token chunks; only the 32-char digest leaves the group
    (the previous design comma-joined the raw neighbor colors into one
    ~32 MB Python string that then rode an ``attach_col`` exchange as a
    single row value — a straggler/OOM magnet on skewed degree)."""
    mc = g["mc"].to_numpy()
    dig = np.fromiter(
        (hashlib.md5(s.encode("utf-8")).hexdigest().encode("ascii")
         for s in mc),
        dtype="S32",
        count=len(mc),
    )
    codes, uniq = pd.factorize(g["e"], sort=False)
    order = np.argsort(codes, kind="stable")
    dig = dig[order]
    counts = np.bincount(codes, minlength=len(uniq))
    offs = np.concatenate(([0], np.cumsum(counts)))
    sigs = []
    _CH = 8192
    for i in range(len(uniq)):
        arr = np.sort(dig[offs[i]:offs[i + 1]])
        h = hashlib.md5()
        h.update(arr[0])
        for j in range(1, len(arr), _CH):
            h.update(b",")
            h.update(b",".join(arr[j:j + _CH]))
        sigs.append(h.hexdigest())
    return pa.table(
        {
            "e": pa.array(uniq, type=pa.string()),
            "sig": pa.array(sigs, type=pa.string()),
        }
    )


def _wl_refine(
    nodes: "ray.data.Dataset",
    nb: "ray.data.Dataset",
    rounds: int,
    n_buckets: int,
) -> "ray.data.Dataset":
    """WL color-refinement core over a prepared (e, m) neighbor dataset.

    color_0 = ``'d' + degree``; color_{t+1} = md5(color_t + '|' + sig_t)
    with sig_t the bounded multiset digest from :func:`_wl_sig_agg`
    ('' for isolated nodes).  Each round is the PageRank-core join shape
    (``graphops.attach_col`` neighbor tag → crc-bucketed per-node digest
    aggregation → left-attach back), moving node-cardinality color tables
    only — no row ever exceeds a 32-char color."""
    deg = bucketed_group_sum(
        nb.map_batches(
            lambda t: pa.table({"e": t["e"]}), batch_format="pyarrow"
        ),
        keys=["e"],
        count_col="d",
        n_buckets=n_buckets,
    )
    colors = attach_col(
        nodes, "entity_id", deg, "e", "d", "d",
        n_buckets=n_buckets, how="left", fill=0,
    ).map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "c": pa.array(
                    ["d" + str(int(d)) for d in t["d"].to_pylist()],
                    type=pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        tagged = attach_col(
            nb, "m", colors, "entity_id", "c", "mc",
            n_buckets=n_buckets, how="inner",
        )
        sigs = (
            tagged.map_batches(
                lambda t: t.select(["e", "mc"]).append_column(
                    "sbucket",
                    pa.array(_crc_bucket(t["e"].to_pylist(), n_buckets)),
                ),
                batch_format="pyarrow",
            )
            .groupby("sbucket")
            .map_groups(_wl_sig_agg, batch_format="pandas")
        )
        joined = attach_col(
            colors, "entity_id", sigs, "e", "sig", "sig",
            n_buckets=n_buckets, how="left", fill=None,
        )
        colors = joined.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t["entity_id"],
                    "c": pa.array(
                        [
                            _wl_hash(c, s or "")
                            for c, s in zip(
                                t["c"].to_pylist(), t["sig"].to_pylist()
                            )
                        ],
                        type=pa.string(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return colors.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "wl_color": t["c"]}
        ),
        batch_format="pyarrow",
    )


def kg_wl_colors(
    sf_dir: str, rounds: int = 2, n_buckets: int = 64
) -> "ray.data.Dataset":
    """(entity_id, wl_color) after ``rounds`` WL refinement iterations.

    color_0 = ``'d' + degree`` (distinct-neighbor count in the simple
    co-occurrence graph); color_{t+1} = md5(color_t + '|' + sig_t) where
    sig_t = md5 of the comma-joined SORTED multiset of per-neighbor md5
    digests (see :func:`_wl_sig_agg` — same refinement semantics as the
    classic raw-concatenation WL, but every carried value is a fixed
    32-char digest, so a skewed-degree hub can't build an unbounded
    signature string).  Nodes = distinct ``appears_in`` subjects, so
    mention-only entities with no co-occurrence edge refine from degree 0
    with an empty neighbor signature."""
    from ner_funtool_ray.pipelines.graph import _graph_parts_ds
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.graphops import neighbors_ds

    triples = kg_from_sf_dir(sf_dir)
    nodes, cooc = _graph_parts_ds(triples)
    nb = neighbors_ds(
        cooc.map_batches(
            lambda t: pa.table({"src": t["subj"], "dst": t["obj"]}),
            batch_format="pyarrow",
        ).union(
            cooc.map_batches(
                lambda t: pa.table({"src": t["obj"], "dst": t["subj"]}),
                batch_format="pyarrow",
            )
        ),
        n_buckets=n_buckets,
    ).materialize()
    return _wl_refine(nodes, nb, rounds=rounds, n_buckets=n_buckets)


def make_wl_sql(triples_sql: str, rounds: int = 2) -> str:
    """Unrolled-CTE DuckDB twin of :func:`kg_wl_colors` —
    ``md5(string_agg(md5(c), ',' ORDER BY md5(c)))`` matches the engine's
    pre-hashed-token multiset digest (:func:`_wl_sig_agg`): DuckDB varchar
    ORDER BY on the 32-char lowercase-hex digests is byte-wise ascending,
    identical to the engine's ``np.sort`` on fixed-width S32, and outer
    ``md5()`` matches hashlib for the ASCII token stream."""
    parts = [
        f"WITH t AS ({triples_sql})",
        "cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with')",
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in')",
        "nb AS (SELECT subj AS e, obj AS m FROM cooc"
        " UNION SELECT obj, subj FROM cooc)",
        "deg AS (SELECT e, count(*)::BIGINT AS d FROM nb GROUP BY e)",
        "c0 AS (SELECT n.entity_id, 'd' || COALESCE(deg.d, 0) AS c"
        " FROM nodes n LEFT JOIN deg ON deg.e = n.entity_id)",
    ]
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        parts.append(
            f"s{r} AS (SELECT nb.e,"
            f" md5(string_agg(md5(cm.c), ',' ORDER BY md5(cm.c)))"
            f" AS sig FROM nb JOIN {prev} cm ON cm.entity_id = nb.m"
            f" GROUP BY nb.e)"
        )
        parts.append(
            f"c{r} AS (SELECT {prev}.entity_id,"
            f" md5({prev}.c || '|' || COALESCE(s{r}.sig, '')) AS c"
            f" FROM {prev} LEFT JOIN s{r} ON s{r}.e = {prev}.entity_id)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT entity_id, c AS wl_color FROM c{rounds}"
    )


# ---------------------------------------------------------------------------
# er_blocking_quality — blocking-stage audit
# ---------------------------------------------------------------------------


def er_blocking_quality(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """One-row audit of MinHash-LSH blocking vs exact-duplicate truth.

    - truth pairs: documents with identical whitespace-normalized text
      (the ``dedup_exact`` ground truth), counted as sum over fingerprint
      groups of C(k, 2) — group sizes ride a bounded bucket shuffle, the
      pair set itself is never expanded;
    - candidate pairs: the deduped banded pair set from
      ``minhash_candidate_pairs_ds`` (BEFORE the est-Jaccard verify
      filter — the audit grades the blocking key, not the verifier);
    - hits: candidates whose two fingerprints agree, via two bucketed
      lookups of the (doc_id, fp) table;
    - ``pair_completeness_ppm`` = hits·1e6 // truth (1e6 when no truth
      pairs exist);  ``reduction_ppm`` = (C(n,2) − candidates)·1e6 //
      C(n,2) — how much of the quadratic comparison space blocking
      eliminated.  All integer-exact."""
    from ner_funtool_ray.stages.dedup import minhash_candidate_pairs_ds

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join((x or "").split()).encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "fp": pa.array(fps, type=pa.string()),
            }
        )

    fp = docs.map_batches(fp_batch, batch_format="pyarrow").materialize()
    n_docs = fp.count()

    # truth-pair count: Σ_groups C(k,2) over fingerprint group sizes
    sizes = bucketed_group_sum(
        fp.map_batches(
            lambda t: pa.table({"fp": t["fp"]}), batch_format="pyarrow"
        ),
        keys=["fp"],
        count_col="k",
        n_buckets=n_buckets,
    )
    n_true = int(
        sizes.map_batches(
            lambda t: pa.table(
                {
                    "p": pa.array(
                        [
                            int(
                                (
                                    np.asarray(t["k"], dtype=np.int64)
                                    * (np.asarray(t["k"], dtype=np.int64) - 1)
                                    // 2
                                ).sum()
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("p")
        or 0
    )

    cand = minhash_candidate_pairs_ds(docs, dedupe=True).materialize()
    n_cand = cand.count()
    with_a = attach_col(
        cand, "a", fp, "doc_id", "fp", "fp_a",
        n_buckets=n_buckets, how="inner",
    )
    with_b = attach_col(
        with_a, "b", fp, "doc_id", "fp", "fp_b",
        n_buckets=n_buckets, how="inner",
    )
    n_hit = with_b.map_batches(
        lambda t: pa.table(
            {
                "h": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.equal(t["fp_a"], t["fp_b"]).cast(pa.int64())
                            ).as_py()
                            or 0
                        )
                    ],
                    type=pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("h") or 0
    n_hit = int(n_hit)

    total_pairs = n_docs * (n_docs - 1) // 2
    pc_ppm = n_hit * 1_000_000 // n_true if n_true else 1_000_000
    rr_ppm = (
        (total_pairs - n_cand) * 1_000_000 // total_pairs
        if total_pairs
        else 0
    )
    return pd.DataFrame(
        {
            "n_docs": pd.array([n_docs], dtype="int64"),
            "n_true_pairs": pd.array([n_true], dtype="int64"),
            "n_cand_pairs": pd.array([n_cand], dtype="int64"),
            "n_hit_pairs": pd.array([n_hit], dtype="int64"),
            "pair_completeness_ppm": pd.array([pc_ppm], dtype="int64"),
            "reduction_ppm": pd.array([rr_ppm], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# er_cluster_quality — B³ evaluation of the ER clustering
# ---------------------------------------------------------------------------


def er_cluster_quality(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """One-row B-cubed audit of the MinHash-LSH ER clustering vs
    exact-duplicate ground truth.

    Predicted clusters: ``minhash_lsh_clusters`` components (docs in no
    multi-doc component are implicit singletons — restored here so every
    doc has a cluster).  Truth clusters: equal whitespace-normalized-text
    fingerprints.  Per doc d: B³ precision = |P(d) ∩ T(d)| / |P(d)|, B³
    recall = |∩| / |T(d)| — both floored to ppm per doc, then the corpus
    mean floored again, so DuckDB hash-matches (no float division).

    Plan: cluster membership joins its fingerprint through one bucketed
    attach; per-cluster sizes and per-(cluster, fp) intersections compute
    INSIDE the cluster's hash bucket (one co-location, no second
    exchange); truth sizes attach by fp bucket; the final mean reduces
    per-batch partial sums."""
    from ner_funtool_ray.stages.dedup import minhash_lsh_clusters

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join((x or "").split()).encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "fp": pa.array(fps, type=pa.string()),
            }
        )

    fp = docs.map_batches(fp_batch, batch_format="pyarrow").materialize()
    pred = minhash_lsh_clusters(docs, threshold=0.8)
    # every doc gets a cluster: component label, else its own singleton
    withc = attach_col(
        fp, "doc_id", pred, "doc_id", "cluster_id", "cluster_id",
        n_buckets=n_buckets, how="left", fill=None,
    )

    def cid_batch(t: pa.Table) -> pa.Table:
        cids = [
            str(c) if c is not None else "s" + str(d)
            for d, c in zip(
                t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp": t["fp"],
                "cid": pa.array(cids, type=pa.string()),
                "cbucket": pa.array(_crc_bucket(cids, n_buckets)),
            }
        )

    memb = withc.map_batches(cid_batch, batch_format="pyarrow")

    def per_doc(g: pd.DataFrame) -> pa.Table:
        n_c = g.groupby("cid")["doc_id"].transform("size")
        n_cf = g.groupby(["cid", "fp"])["doc_id"].transform("size")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)),
                "fp": pa.array(g["fp"], type=pa.string()),
                "n_c": pa.array(n_c.to_numpy(dtype=np.int64)),
                "n_cf": pa.array(n_cf.to_numpy(dtype=np.int64)),
            }
        )

    per = memb.groupby("cbucket").map_groups(per_doc, batch_format="pandas")
    sizes = bucketed_group_sum(
        fp.map_batches(
            lambda t: pa.table({"fp": t["fp"]}), batch_format="pyarrow"
        ),
        keys=["fp"],
        count_col="n_f",
        n_buckets=n_buckets,
    )
    full = attach_col(
        per, "fp", sizes, "fp", "n_f", "n_f",
        n_buckets=n_buckets, how="inner",
    )

    def partial_sums(t: pa.Table) -> pa.Table:
        n_cf = np.asarray(t["n_cf"], dtype=np.int64)
        n_c = np.asarray(t["n_c"], dtype=np.int64)
        n_f = np.asarray(t["n_f"], dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([len(n_cf)], type=pa.int64()),
                "p": pa.array(
                    [int((n_cf * 1_000_000 // n_c).sum())], type=pa.int64()
                ),
                "r": pa.array(
                    [int((n_cf * 1_000_000 // n_f).sum())], type=pa.int64()
                ),
            }
        )

    parts = full.map_batches(
        partial_sums, batch_format="pyarrow"
    ).materialize()
    n_docs = int(parts.sum("n") or 0)
    p_sum = int(parts.sum("p") or 0)
    r_sum = int(parts.sum("r") or 0)
    return pd.DataFrame(
        {
            "n_docs": pd.array([n_docs], dtype="int64"),
            "b3_precision_ppm": pd.array(
                [p_sum // n_docs if n_docs else 0], dtype="int64"
            ),
            "b3_recall_ppm": pd.array(
                [r_sum // n_docs if n_docs else 0], dtype="int64"
            ),
        }
    )


# ---------------------------------------------------------------------------
# kg_triple_intervals — temporal validity of co-occurrence edges
# ---------------------------------------------------------------------------


def kg_triple_intervals(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per cooccurs_with edge: (subj, obj, n_docs, first_doc, last_doc) —
    the edge's validity interval when doc_id orders ingestion (the
    temporal-KG read of ``openrel.kg_triple_provenance``, which this
    extends with the closing endpoint; same doc-bucket pair expansion +
    crc-bucketed sum/min/max merge)."""
    from ner_funtool_ray.pipelines.openrel import _doc_entities_batch

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def with_bucket(batch: pa.Table) -> pa.Table:
        t = _doc_entities_batch(batch)
        bucket = pa.array(
            (t["doc_id"].to_numpy() % n_buckets).astype(np.int64)
        )
        return t.append_column("bucket", bucket)

    def expand_pairs(group: pd.DataFrame) -> pa.Table:
        d = group[["doc_id", "entity_id"]].drop_duplicates()
        m = d.merge(d, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["entity_id_a"] < m["entity_id_b"]]
        agg = (
            m.groupby(["entity_id_a", "entity_id_b"], sort=False)["doc_id"]
            .agg(n_docs="size", first_doc="min", last_doc="max")
            .reset_index()
        )
        kb = _crc_bucket(
            [
                f"{a}\x00{b}"
                for a, b in zip(agg["entity_id_a"], agg["entity_id_b"])
            ],
            n_buckets,
        )
        return pa.table(
            {
                "subj": pa.array(agg["entity_id_a"], type=pa.string()),
                "obj": pa.array(agg["entity_id_b"], type=pa.string()),
                "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64)),
                "first_doc": pa.array(
                    agg["first_doc"].to_numpy(dtype=np.int64)
                ),
                "last_doc": pa.array(
                    agg["last_doc"].to_numpy(dtype=np.int64)
                ),
                "kbucket": pa.array(kb),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["subj", "obj"], sort=False)
            .agg(
                n_docs=("n_docs", "sum"),
                first_doc=("first_doc", "min"),
                last_doc=("last_doc", "max"),
            )
            .reset_index()
        )
        for c in ("n_docs", "first_doc", "last_doc"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        docs.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand_pairs, batch_format="pandas")
        .groupby("kbucket")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_type_subsumption — ontology induction from doc-level type containment
# ---------------------------------------------------------------------------


def kg_type_subsumption(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Directed type-pair containment: for each (super_type, sub_type),
    how often a doc mentioning the sub type also mentions the super type
    (``containment_ppm = n_both · 1e6 // n_sub``, integer-exact).  High
    containment suggests the subsumption axiom ``sub ⊑ super`` — the
    document-level distributional test ontology-induction systems start
    from.  Types come from the gazetteer surface map (same rule as
    ``openrel.kg_typed_triples``).

    Plan: per-doc distinct types (≤ |type vocabulary| rows per doc) →
    doc-bucket pair expansion → two bounded group sums (pairs +
    marginals) → one bucketed attach.  Everything after extraction is
    |types|²-bounded."""
    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pattern = _gaz_pattern(GAZETTEER)

    def doc_types(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        types: list[str] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            seen = {GAZETTEER[m.group(1)] for m in pattern.finditer(text or "")}
            for t in seen:
                ids.append(doc_id)
                types.append(t)
        out = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "t": pa.array(types, type=pa.string()),
            }
        )
        return out.append_column(
            "bucket",
            pa.array((np.asarray(ids, dtype=np.int64) % n_buckets)),
        )

    dt = docs.map_batches(doc_types, batch_format="pyarrow").materialize()

    def expand(g: pd.DataFrame) -> pa.Table:
        d = g[["doc_id", "t"]]
        m = d.merge(d, on="doc_id", suffixes=("_sup", "_sub"))
        m = m[m["t_sup"] != m["t_sub"]]
        agg = m.groupby(["t_sup", "t_sub"], sort=False).size().reset_index(
            name="n_both"
        )
        return pa.table(
            {
                "super_type": pa.array(agg["t_sup"], type=pa.string()),
                "sub_type": pa.array(agg["t_sub"], type=pa.string()),
                "n_both": pa.array(agg["n_both"].to_numpy(dtype=np.int64)),
            }
        )

    pairs = bucketed_group_sum(
        dt.groupby("bucket").map_groups(expand, batch_format="pandas"),
        keys=["super_type", "sub_type"],
        sum_cols={"n_both": "n_both"},
        count_col=None,
        n_buckets=n_buckets,
    )
    marg = bucketed_group_sum(
        dt.map_batches(lambda t: t.select(["t"]), batch_format="pyarrow"),
        keys=["t"],
        count_col="n_sub",
        n_buckets=n_buckets,
    )
    full = attach_col(
        pairs, "sub_type", marg, "t", "n_sub", "n_sub",
        n_buckets=n_buckets, how="inner",
    )
    return full.map_batches(
        lambda t: pa.table(
            {
                "super_type": t["super_type"],
                "sub_type": t["sub_type"],
                "n_both": t["n_both"],
                "n_sub": t["n_sub"],
                "containment_ppm": pa.array(
                    np.asarray(t["n_both"], dtype=np.int64)
                    * 1_000_000
                    // np.asarray(t["n_sub"], dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# kg_entity_timeline — per-entity activity span
# ---------------------------------------------------------------------------


def kg_entity_timeline(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per entity: (first_doc, last_doc, n_docs, span) where span =
    last − first when doc_id orders ingestion — the node-level companion
    of :func:`kg_triple_intervals` (edge validity), answering "when was
    this entity active in the corpus".

    Plan: distinct (doc, entity) per batch → one crc-bucketed
    min/max/count merge; partials are entity-vocabulary-bounded."""
    from ner_funtool_ray.pipelines.openrel import _doc_entities_batch

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = _doc_entities_batch(batch)
        df = (
            t.to_pandas()
            .groupby("entity_id", sort=False)["doc_id"]
            .agg(n_docs="nunique", first_doc="min", last_doc="max")
            .reset_index()
        )
        # distinct doc set per batch: nunique is exact per batch, but the
        # same doc never spans batches (one row per doc), so the bucket
        # merge can SUM counts and min/max the endpoints
        out = pa_from_pandas(df, preserve_index=False)
        return out.append_column(
            "ebucket",
            pa.array(_crc_bucket(df["entity_id"].tolist(), n_buckets)),
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("entity_id", sort=False)
            .agg(
                n_docs=("n_docs", "sum"),
                first_doc=("first_doc", "min"),
                last_doc=("last_doc", "max"),
            )
            .reset_index()
        )
        for c in ("n_docs", "first_doc", "last_doc"):
            out[c] = out[c].astype(np.int64)
        out["span"] = out["last_doc"] - out["first_doc"]
        return out

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_triples_with_attrs — materialize fused facts into the graph
# ---------------------------------------------------------------------------


def kg_triples_with_attrs(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """The flagship triple table EXTENDED with the fused attribute facts:
    ``(entity, has_attr, fused value, weight = votes)`` rows union into
    the appears_in/cooccurs_with graph — the "write the resolved facts
    back into the KG" materialize step that closes the
    extract → fuse → publish loop."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir)
    attrs = kg_attr_fusion(sf_dir, n_buckets=n_buckets).map_batches(
        lambda t: pa.table(
            {
                "subj": t["entity_id"],
                "pred": pa.array(
                    np.full(t.num_rows, "has_attr", dtype=object),
                    type=pa.string(),
                ),
                "obj": t["fused_attr"],
                "weight": t["votes"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return triples.union(attrs)


# ---------------------------------------------------------------------------
# kg_graph_summary — SNAP-style type-level graph condensation
# ---------------------------------------------------------------------------


def kg_graph_summary(
    sf_dir: str, broadcast_limit: int = 5_000_000, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Condensed type-level view of the co-occurrence graph: one row per
    unordered dominant-type pair with its edge count and total weight —
    the SNAP-style super-node summary an analyst reads before diving
    into the full graph.

    Dominant type per entity = max mention-evidence weight, ties to the
    lexicographically smallest type (the ``kg_predicate_signatures``
    rule).  The type map is entity-vocabulary-bounded and broadcast under
    the same loud ``broadcast_limit`` guard; edges stream through one
    map_batches relabel + one |types|²-bounded group sum."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.pipelines.openrel import kg_typed_triples

    typed = kg_typed_triples(sf_dir).materialize()
    n_typed = typed.count()
    if n_typed > broadcast_limit:
        raise RuntimeError(
            f"entity-type table has {n_typed} rows > broadcast_limit="
            f"{broadcast_limit}; route the dominant-type map through a "
            "bucketed join on subj/obj instead"
        )
    tdf = typed.to_pandas().sort_values(
        ["subj", "weight", "obj"], ascending=[True, False, True]
    ).drop_duplicates("subj", keep="first")
    ent_type = dict(zip(tdf["subj"], tdf["obj"]))

    triples = kg_from_sf_dir(sf_dir)

    def relabel(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], "cooccurs_with"))
        ta = [ent_type[s] for s in t["subj"].to_pylist()]
        tb = [ent_type[o] for o in t["obj"].to_pylist()]
        return pa.table(
            {
                "type_a": pa.array(
                    [min(a, b) for a, b in zip(ta, tb)], type=pa.string()
                ),
                "type_b": pa.array(
                    [max(a, b) for a, b in zip(ta, tb)], type=pa.string()
                ),
                "weight": t["weight"],
            }
        )

    out = bucketed_group_sum(
        triples.map_batches(relabel, batch_format="pyarrow"),
        ["type_a", "type_b"],
        sum_cols={"total_weight": "weight"},
        count_col="n_edges",
        n_buckets=n_buckets,
    )
    return out.select_columns(
        ["type_a", "type_b", "n_edges", "total_weight"]
    )


# ---------------------------------------------------------------------------
# kg_reify_statements — RDF-style reification with provenance
# ---------------------------------------------------------------------------


def kg_reify_statements(sf_dir: str) -> "ray.data.Dataset":
    """Each co-occurrence edge as an addressable statement:
    (stmt_id, subj, pred, obj, n_docs, first_doc) where ``stmt_id =
    md5(subj|pred|obj)`` — stable across runs and partitions, so
    qualifier/annotation layers can attach without re-deriving the edge."""

    def reify(t: pa.Table) -> pa.Table:
        subs = t["subj"].to_pylist()
        objs = t["obj"].to_pylist()
        ids = [
            hashlib.md5(
                f"{s}|cooccurs_with|{o}".encode("utf-8")
            ).hexdigest()
            for s, o in zip(subs, objs)
        ]
        n = len(subs)
        return pa.table(
            {
                "stmt_id": pa.array(ids, type=pa.string()),
                "subj": t["subj"],
                "pred": pa.array(
                    np.full(n, "cooccurs_with", dtype=object), type=pa.string()
                ),
                "obj": t["obj"],
                "n_docs": t["n_docs"],
                "first_doc": t["first_doc"],
            }
        )

    return kg_triple_provenance(sf_dir).map_batches(
        reify, batch_format="pyarrow"
    )


__all__ = [
    "AttrObservationExtractor",
    "kg_attr_fusion",
    "kg_attr_latest",
    "kg_wl_colors",
    "make_wl_sql",
    "source_attr_reliability",
    "kg_attr_fusion_weighted",
    "kg_attr_conflicts",
    "er_blocking_quality",
    "er_cluster_quality",
    "kg_triple_intervals",
    "kg_type_subsumption",
    "kg_graph_summary",
    "kg_entity_timeline",
    "kg_triples_with_attrs",
    "kg_reify_statements",
]
