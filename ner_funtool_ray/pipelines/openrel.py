"""Open relation extraction, entity typing and triple provenance.

Three KG-construction surfaces the fixed-predicate flagship
(``pipelines/kg.py``: appears_in / cooccurs_with) does not cover:

- :func:`kg_open_relations` — TEXTUAL predicates: for every pair of
  ADJACENT gazetteer mentions inside one sentence, the normalized token
  run between them becomes the relation (``rel:owned_by`` style), so the
  graph carries what the corpus *says* connects two entities, not just
  that they co-occur.  The reference's span decoders motivate the shape
  (`ner_utils.py:103-146` emits (entity, type, position) — predicates
  come from the inter-span text, which only a corpus-level engine can
  aggregate).
- :func:`kg_typed_triples` — entity typing as first-class triples
  (``(ent:x, has_type, OPERATION)``), the rdf:type edge every KG needs;
  weight = corpus-wide mention count, so downstream type inference can
  resolve conflicts by evidence mass.
- :func:`kg_triple_provenance` — per co-occurrence edge, the evidence
  trail: how many documents support it and the smallest supporting
  ``doc_id`` (a stable exemplar pointer back into the corpus).

Scale design: every op is map_batches partial extraction → one bounded
bucketed merge (``stages/groupagg.bucketed_group_sum`` or the same
crc32-bucket + per-bucket vectorized pandas pattern).  Pair expansion for
provenance happens per doc-bucket group (only one bucket's docs are ever
co-resident), mirroring ``stages/materialize.cooccurs_triples``.  Nothing
broadcasts or materializes corpus-sized state.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.config import ALIASES, GAZETTEER
from ner_funtool_ray.corpus import corpus_from_documents
from ner_funtool_ray.functions.text import _WORD_RE
from ner_funtool_ray.pipelines.kg import mentions_dataset
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.stages.ingest import ingest
from ner_funtool_ray.stages.sentence import split_to_sentences

# triple partials are entity-vocabulary-bounded, far below corpus size —
# same rationale as materialize.appears_in_triples' cap
_TRIPLE_DRIVER_CAP = 2_000_000


def _gaz_pattern(gazetteer: dict[str, str]) -> "re.Pattern[str]":
    terms = sorted(gazetteer.keys(), key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b")


# ---------------------------------------------------------------------------
# kg_typed_triples
# ---------------------------------------------------------------------------


def kg_typed_triples(sf_dir: str) -> "ray.data.Dataset":
    """(subj='ent:'+canonical, pred='has_type', obj=entity_type, weight).

    weight = total mentions of that (entity, type) across the corpus.  A
    canonical entity can carry several types when aliases merge surfaces
    of different gazetteer types — one row per (entity, type), so the
    consumer sees the full evidence distribution."""
    mentions = mentions_dataset(corpus_from_documents(sf_dir))

    def typed(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "subj": batch["entity_id"],
                "pred": pa.array(np.full(n, "has_type", dtype=object)),
                "obj": batch["entity_type"],
            }
        )

    out = bucketed_group_sum(
        mentions.map_batches(typed, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        count_col="weight",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )
    return out.select_columns(["subj", "pred", "obj", "weight"])


# ---------------------------------------------------------------------------
# kg_open_relations
# ---------------------------------------------------------------------------


class OpenRelationExtractor:
    """map_batches callable: sentence rows → (subj, pred, obj) rows.

    For each ADJACENT mention pair in a sentence, the predicate is the
    lowercased ``\\w+`` token run of the text between them, joined with
    ``_`` and capped at ``max_gap_tokens`` (longer gaps are noise, not
    relations — the row is dropped, matching the SQL twin's BETWEEN).
    ``re.split`` with the capturing gazetteer alternation yields
    ``[pre, m1, gap1, m2, gap2, …, post]``, so mention i and i+1 bracket
    ``parts[2i+2]`` exactly — same alignment the oracle derives from
    ``regexp_extract_all`` + ``regexp_split_to_array`` positionally."""

    def __init__(
        self,
        gazetteer: dict[str, str] | None = None,
        aliases: dict[str, str] | None = None,
        max_gap_tokens: int = 3,
    ):
        self.pattern = _gaz_pattern(gazetteer or GAZETTEER)
        self.aliases = dict(ALIASES) if aliases is None else dict(aliases)
        self.max_gap_tokens = max_gap_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        al = self.aliases
        cap = self.max_gap_tokens
        for sent in batch["sentence"].to_pylist():
            parts = self.pattern.split(sent or "")
            n = (len(parts) - 1) // 2  # number of mentions
            for i in range(n - 1):
                toks = [t.lower() for t in _WORD_RE.findall(parts[2 * i + 2])]
                if not 1 <= len(toks) <= cap:
                    continue
                s = parts[2 * i + 1]
                o = parts[2 * i + 3]
                subjs.append("ent:" + al.get(s, s))
                preds.append("rel:" + "_".join(toks))
                objs.append("ent:" + al.get(o, o))
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
            }
        )


def kg_open_relations(
    sf_dir: str, max_gap_tokens: int = 3
) -> "ray.data.Dataset":
    """Corpus → weighted textual-predicate triples.

    weight = number of (sentence, adjacent-pair) occurrences of the exact
    (subj, pred, obj) across the corpus."""
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    rels = sents.map_batches(
        OpenRelationExtractor(max_gap_tokens=max_gap_tokens),
        batch_format="pyarrow",
    )
    out = bucketed_group_sum(
        rels,
        ["subj", "pred", "obj"],
        count_col="weight",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )
    return out.select_columns(["subj", "pred", "obj", "weight"])


# ---------------------------------------------------------------------------
# kg_entity_attributes
# ---------------------------------------------------------------------------

# adjective lexicon for attribute extraction — the modifier vocabulary the
# synthetic corpus carries; a real deployment swaps in a POS-derived list
ATTR_LEXICON = frozenset({"fast", "slow", "small", "big"})


class EntityAttributeExtractor:
    """map_batches callable: sentence rows → (entity_id, attr) rows.

    Attribute = the LAST token of the text immediately preceding a mention
    when it belongs to the adjective lexicon ("fast key" → (ent:key, fast))
    — adjectival-modifier property extraction, the (entity, attribute,
    value) complement of the relation extractor.  Alignment: mention i's
    preceding gap is split-part ``parts[2i]`` (SQL twin: ``gaps[i]``)."""

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
        ents: list[str] = []
        attrs: list[str] = []
        al = self.aliases
        lex = self.lexicon
        for sent in batch["sentence"].to_pylist():
            parts = self.pattern.split(sent or "")
            n = (len(parts) - 1) // 2
            for i in range(n):
                toks = _WORD_RE.findall(parts[2 * i].lower())
                if toks and toks[-1] in lex:
                    m = parts[2 * i + 1]
                    ents.append("ent:" + al.get(m, m))
                    attrs.append(toks[-1])
        return pa.table(
            {
                "entity_id": pa.array(ents, type=pa.string()),
                "attr": pa.array(attrs, type=pa.string()),
            }
        )


def kg_entity_attributes(sf_dir: str) -> "ray.data.Dataset":
    """Corpus → (entity_id, attr, n) adjectival property counts."""
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    pairs = sents.map_batches(EntityAttributeExtractor(), batch_format="pyarrow")
    out = bucketed_group_sum(
        pairs, ["entity_id", "attr"], count_col="n",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )
    return out.select_columns(["entity_id", "attr", "n"])


# ---------------------------------------------------------------------------
# kg_triple_provenance
# ---------------------------------------------------------------------------


def _doc_entities_batch(batch: pa.Table) -> pa.Table:
    """documents batch → distinct (doc_id, entity_id) with doc bucket."""
    pattern = _gaz_pattern(GAZETTEER)
    ids: list[int] = []
    ents: list[str] = []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        for m in pattern.finditer(text or ""):
            s = m.group(1)
            ids.append(doc_id)
            ents.append("ent:" + ALIASES.get(s, s))
    df = pd.DataFrame(
        {"doc_id": np.asarray(ids, dtype=np.int64), "entity_id": ents}
    ).drop_duplicates()
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
            "entity_id": pa.array(df["entity_id"], type=pa.string()),
        }
    )


_PROV_PARTIAL_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("n_docs", pa.int64()),
        ("first_doc", pa.int64()),
        ("kbucket", pa.int64()),
    ]
)


def kg_predicate_signatures(
    sf_dir: str, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """Schema induction: textual predicates → (subj_type, obj_type) usage.

    Joins the open-relation triples against each entity's DOMINANT type
    (max evidence weight, ties to the lexicographically smallest type) and
    counts (pred, subj_type, obj_type) signatures — the ontology a
    downstream consumer would declare for each induced relation.

    The type map is entity-vocabulary-bounded, so the join is the
    broadcast-small-side plan (dict built once from the typed-triple
    aggregate, applied inside map_batches); ``broadcast_limit`` guards the
    assumption loudly instead of silently shipping an oversized dict."""
    typed = kg_typed_triples(sf_dir).materialize()
    n_typed = typed.count()
    if n_typed > broadcast_limit:
        raise RuntimeError(
            f"entity-type table has {n_typed} rows > broadcast_limit="
            f"{broadcast_limit}; the dominant-type map no longer fits a "
            "broadcast — route through a bucketed join on subj instead"
        )
    tdf = typed.to_pandas().sort_values(
        ["subj", "weight", "obj"], ascending=[True, False, True]
    )
    ent_type = dict(
        zip(
            tdf.drop_duplicates("subj", keep="first")["subj"],
            tdf.drop_duplicates("subj", keep="first")["obj"],
        )
    )

    rels = kg_open_relations(sf_dir)

    def sign(batch: pa.Table) -> pa.Table:
        subj_t = [ent_type[s] for s in batch["subj"].to_pylist()]
        obj_t = [ent_type[o] for o in batch["obj"].to_pylist()]
        return pa.table(
            {
                "pred": batch["pred"],
                "subj_type": pa.array(subj_t, type=pa.string()),
                "obj_type": pa.array(obj_t, type=pa.string()),
                "weight": batch["weight"],
            }
        )

    out = bucketed_group_sum(
        rels.map_batches(sign, batch_format="pyarrow"),
        ["pred", "subj_type", "obj_type"],
        sum_cols={"total_weight": "weight"},
        count_col="n_triples",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )
    return out.select_columns(
        ["pred", "subj_type", "obj_type", "n_triples", "total_weight"]
    )


def kg_entity_summary(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per-entity card over the flagship triple table: edge count, total
    evidence weight, distinct predicates, distinct co-occurrence
    neighbors.

    Distinct counts need every edge of an entity co-resident, so edges are
    exploded to per-endpoint rows and bucketed by crc32(entity) — one
    bounded groupby over the (entity-vocabulary-bounded) triple table; the
    per-bucket nunique/sums are vectorized pandas."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        subs = batch["subj"].to_pylist()
        preds = batch["pred"].to_pylist()
        objs = batch["obj"].to_pylist()
        ws = batch["weight"].to_pylist()
        ents: list[str] = []
        prs: list[str] = []
        wts: list[int] = []
        nbr: list[str | None] = []
        for s, p, o, w in zip(subs, preds, objs, ws):
            cooc = p == "cooccurs_with"
            ents.append(s)
            prs.append(p)
            wts.append(w)
            nbr.append(o if cooc else None)
            if cooc:
                ents.append(o)
                prs.append(p)
                wts.append(w)
                nbr.append(s)
        bucket = np.fromiter(
            (zlib.crc32(e.encode("utf-8")) % n_buckets for e in ents),
            dtype=np.int64,
            count=len(ents),
        )
        return pa.table(
            {
                "entity": pa.array(ents, type=pa.string()),
                "pred": pa.array(prs, type=pa.string()),
                "weight": pa.array(np.asarray(wts, dtype=np.int64)),
                "neighbor": pa.array(nbr, type=pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def summarize(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("entity", sort=False).agg(
            n_edges=("pred", "size"),
            total_weight=("weight", "sum"),
            n_preds=("pred", "nunique"),
            n_neighbors=("neighbor", "nunique"),  # nunique drops NaN/None
        )
        out = agg.reset_index()
        for c in ("n_edges", "total_weight", "n_preds", "n_neighbors"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        triples.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(summarize, batch_format="pandas")
    )


def kg_triple_provenance(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Per cooccurs_with edge: (subj, obj, n_docs, first_doc).

    ``n_docs`` = supporting-document count (the cooccurs weight);
    ``first_doc`` = min supporting doc_id — a stable exemplar pointer.

    Plan: distinct (doc_id, entity) per batch → co-locate docs by
    ``doc_id % n_buckets`` (bounded group count, one doc's mentions never
    split) → per-bucket vectorized pair expansion + partial
    (count, min) → one more bounded bucket merge keyed by crc32(subj,obj)
    summing counts and min-ing exemplars.  Both shuffles move
    entity-vocabulary-bounded partials only."""
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
        import zlib

        d = group[["doc_id", "entity_id"]].drop_duplicates()
        m = d.merge(d, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["entity_id_a"] < m["entity_id_b"]]
        agg = (
            m.groupby(["entity_id_a", "entity_id_b"], sort=False)["doc_id"]
            .agg(n_docs="size", first_doc="min")
            .reset_index()
        )
        kb = np.fromiter(
            (
                zlib.crc32(f"{a}\x00{b}".encode("utf-8")) % n_buckets
                for a, b in zip(agg["entity_id_a"], agg["entity_id_b"])
            ),
            dtype=np.int64,
            count=len(agg),
        )
        return pa.table(
            {
                "subj": pa.array(agg["entity_id_a"], type=pa.string()),
                "obj": pa.array(agg["entity_id_b"], type=pa.string()),
                "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64)),
                "first_doc": pa.array(
                    agg["first_doc"].to_numpy(dtype=np.int64)
                ),
                "kbucket": pa.array(kb),
            },
            schema=_PROV_PARTIAL_SCHEMA,
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["subj", "obj"], sort=False)
            .agg(n_docs=("n_docs", "sum"), first_doc=("first_doc", "min"))
            .reset_index()
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["first_doc"] = out["first_doc"].astype(np.int64)
        return out

    partials = (
        docs.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand_pairs, batch_format="pandas")
    )
    return (
        partials.groupby("kbucket")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_proximity_edges — distance-weighted co-occurrence
# ---------------------------------------------------------------------------

PROXIMITY_MAX = 5  # strength contribution = max(0, 5 - gap_tokens)


class ProximityEdgeExtractor:
    """map_batches callable: sentence rows → (a, b, w) partials.

    For every ADJACENT mention pair the contribution is
    ``PROXIMITY_MAX - gap_tokens`` (tokens strictly between the two
    mentions), dropped at ≤ 0 — so "key order" (gap 0) contributes 5
    while mentions five-plus tokens apart contribute nothing.  The pair
    is emitted canonical (``a < b`` on the alias-normalized entity ids,
    self-pairs dropped), making the edge symmetric: co-occurrence
    strength graded by how close the corpus actually places the two
    entities, where ``cooccurs_with`` only records that they share a
    document.  Same split alignment as :class:`OpenRelationExtractor`."""

    def __init__(
        self,
        gazetteer: dict[str, str] | None = None,
        aliases: dict[str, str] | None = None,
        max_prox: int = PROXIMITY_MAX,
    ):
        self.pattern = _gaz_pattern(gazetteer or GAZETTEER)
        self.aliases = dict(ALIASES) if aliases is None else dict(aliases)
        self.max_prox = max_prox

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_l: list[str] = []
        b_l: list[str] = []
        w_l: list[int] = []
        al = self.aliases
        mp = self.max_prox
        for sent in batch["sentence"].to_pylist():
            parts = self.pattern.split(sent or "")
            n = (len(parts) - 1) // 2
            for i in range(n - 1):
                w = mp - len(_WORD_RE.findall(parts[2 * i + 2]))
                if w <= 0:
                    continue
                s = parts[2 * i + 1]
                o = parts[2 * i + 3]
                e1 = "ent:" + al.get(s, s)
                e2 = "ent:" + al.get(o, o)
                if e1 == e2:
                    continue
                a_l.append(min(e1, e2))
                b_l.append(max(e1, e2))
                w_l.append(w)
        return pa.table(
            {
                "a": pa.array(a_l, type=pa.string()),
                "b": pa.array(b_l, type=pa.string()),
                "w": pa.array(np.asarray(w_l, dtype=np.int64)),
            }
        )


def kg_proximity_edges(
    sf_dir: str, max_prox: int = PROXIMITY_MAX
) -> "ray.data.Dataset":
    """Corpus → ``(a, b, strength, n_pairs)`` proximity-weighted
    symmetric entity edges (see :class:`ProximityEdgeExtractor`)."""
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    pairs = sents.map_batches(
        ProximityEdgeExtractor(max_prox=max_prox), batch_format="pyarrow"
    )
    out = bucketed_group_sum(
        pairs,
        ["a", "b"],
        sum_cols={"strength": "w"},
        count_col="n_pairs",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )
    return out.select_columns(["a", "b", "strength", "n_pairs"])


# ---------------------------------------------------------------------------
# Mention-statistics ops: per-doc diversity, per-entity dispersion
# ---------------------------------------------------------------------------


def _per_doc_entity_counts(sf_dir: str) -> "ray.data.Dataset":
    """(repo, path, entity_id, ne): canonical-mention counts per doc —
    the shared partial for diversity and dispersion (the per-key twin of
    ``kg_mention_counts``' per-surface rows)."""
    mentions = mentions_dataset(corpus_from_documents(sf_dir))
    return bucketed_group_sum(
        mentions.map_batches(
            lambda t: t.select(["repo", "path", "entity_id"]),
            batch_format="pyarrow",
        ),
        ["repo", "path", "entity_id"],
        count_col="ne",
        driver_cap=_TRIPLE_DRIVER_CAP,
    )


def doc_mention_diversity(sf_dir: str) -> "ray.data.Dataset":
    """Per-document mention-type diversity → ``(repo, path, n_mentions,
    simpson_ppm)`` with the Gini–Simpson index in EXACT integer ppm:
    ``(10^6 · (n² - Σ nₑ²)) // n²`` over per-entity counts nₑ.  0 = all
    mentions are one entity, →10^6 = evenly spread.  Unlike a Shannon
    entropy this needs no log, so the DuckDB twin is hash-exact.

    Plan: per-(doc, entity) counts → per-doc sums of nₑ and nₑ² (two
    bounded bucketed group-sums) → final vectorized arithmetic.  Docs
    with zero mentions are absent (identically in both engines)."""
    pe = _per_doc_entity_counts(sf_dir)

    def squares(t: pa.Table) -> pa.Table:
        ne = np.asarray(t["ne"], dtype=np.int64)
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "ne": pa.array(ne),
                "ne2": pa.array(ne * ne),
            }
        )

    pd_sums = bucketed_group_sum(
        pe.map_batches(squares, batch_format="pyarrow"),
        ["repo", "path"],
        sum_cols={"n": "ne", "s2": "ne2"},
        count_col=None,
        driver_cap=_TRIPLE_DRIVER_CAP,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], dtype=np.int64)
        s2 = np.asarray(t["s2"], dtype=np.int64)
        ppm = (np.int64(1_000_000) * (n * n - s2)) // (n * n)
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "n_mentions": pa.array(n),
                "simpson_ppm": pa.array(ppm),
            }
        )

    return pd_sums.map_batches(finish, batch_format="pyarrow")


def entity_dispersion(sf_dir: str) -> "ray.data.Dataset":
    """Per-entity spread across documents → ``(entity_id, n_docs, total,
    var_num)`` where ``var_num = n_docs·Σc² - (Σc)²`` is the exact
    integer variance numerator of the per-doc mention counts c — 0 when
    the entity appears equally often in every doc that carries it, large
    when its mentions cluster in a few.  The integer form avoids float
    division so the twin hashes exactly (same trick as the Gini op)."""
    pe = _per_doc_entity_counts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = np.asarray(t["ne"], dtype=np.int64)
        return pa.table(
            {
                "entity_id": t["entity_id"],
                "one": pa.array(np.ones(len(ne), dtype=np.int64)),
                "c": pa.array(ne),
                "c2": pa.array(ne * ne),
            }
        )

    sums = bucketed_group_sum(
        pe.map_batches(partial, batch_format="pyarrow"),
        ["entity_id"],
        sum_cols={"n_docs": "one", "total": "c", "s2": "c2"},
        count_col=None,
        driver_cap=_TRIPLE_DRIVER_CAP,
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = np.asarray(t["n_docs"], dtype=np.int64)
        s = np.asarray(t["total"], dtype=np.int64)
        s2 = np.asarray(t["s2"], dtype=np.int64)
        return pa.table(
            {
                "entity_id": t["entity_id"],
                "n_docs": pa.array(nd),
                "total": pa.array(s),
                "var_num": pa.array(nd * s2 - s * s),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kg_shape_violations — SHACL-lite signature validation
# ---------------------------------------------------------------------------


def kg_shape_violations(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Shape validation of the induced relation schema → one row per
    NON-dominant ``(pred, subj_type, obj_type)`` signature, carrying the
    predicate's expected (dominant) signature and the violating triple
    count — the SHACL-style "this relation usually connects OPERATION to
    STRUCTURE; these n triples don't" report a KG curator works from.

    Dominant = max ``n_triples``, ties to the lexicographically smallest
    ``(subj_type, obj_type)`` (identical ordering in the SQL twin's
    ROW_NUMBER).  The signature table is predicate-vocabulary × type²
    bounded, but no driver pull is needed anyway: signatures hash-bucket
    by ``pred`` (a predicate never spans buckets) and each bucket
    resolves its predicates' dominants and violations in one vectorized
    pandas group."""
    import zlib

    sig = kg_predicate_signatures(sf_dir)

    def bucket(t: pa.Table) -> pa.Table:
        b = np.fromiter(
            (
                zlib.crc32(p.encode("utf-8")) % n_buckets
                for p in t["pred"].to_pylist()
            ),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column("bucket", pa.array(b))

    def violations(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["pred", "n_triples", "subj_type", "obj_type"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        dom = g.drop_duplicates("pred", keep="first")[
            ["pred", "subj_type", "obj_type"]
        ].rename(
            columns={
                "subj_type": "expect_subj_type",
                "obj_type": "expect_obj_type",
            }
        )
        m = g.merge(dom, on="pred")
        bad = m[
            (m["subj_type"] != m["expect_subj_type"])
            | (m["obj_type"] != m["expect_obj_type"])
        ]
        out = bad[
            [
                "pred",
                "subj_type",
                "obj_type",
                "expect_subj_type",
                "expect_obj_type",
                "n_triples",
            ]
        ].copy()
        out["n_triples"] = out["n_triples"].astype(np.int64)
        return out

    return (
        sig.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(violations, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# kg_merge_candidates — alias-discovery audit
# ---------------------------------------------------------------------------


def kg_merge_candidates(
    sf_dir: str, max_dist: int = 2, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Entity pairs that look like unmerged aliases → ``(a, b, dist,
    shared)``: canonical entities within ``max_dist`` Levenshtein edits
    of each other AND sharing at least one co-occurrence neighbor — the
    candidate list a curator reviews before adding alias rows (the
    similarity-based alias discovery the canonicalization stage's static
    table cannot see).

    Fully distributed, no broadcast: (1) names fan out to length-blocked
    buckets and pair up under the lossless banded-DP plan of
    ``stages/editdist`` (each qualifying pair scored in exactly one
    bucket); (2) shared-neighbor counts come from the
    ``shared_member_pairs_ds`` bipartite projection with the
    co-occurrence NEIGHBOR as the shared middle; (3) one composite-key
    bucketed join marries the two pair lists."""
    import pyarrow.compute as pc

    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.editdist import editdistance_name_pairs_df
    from ner_funtool_ray.stages.graphops import (
        attach_col,
        shared_member_pairs_ds,
    )

    triples = kg_from_sf_dir(sf_dir).materialize()

    names = bucketed_group_sum(
        triples.map_batches(
            lambda t: pa.table(
                {
                    "name": pc.utf8_slice_codeunits(
                        t.filter(pc.equal(t["pred"], "appears_in"))["subj"],
                        4,  # strip 'ent:'
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["name"],
        count_col="__c",
        n_buckets=n_buckets,
    ).drop_columns(["__c"])

    # (1) name-similarity pairs (length-blocked, adjacent-bucket emission)
    w = max_dist

    def fanout(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t["name"]).to_numpy()
        home = (lens // w).astype(np.int64)
        name = t["name"].combine_chunks() if isinstance(
            t["name"], pa.ChunkedArray
        ) else t["name"]
        return pa.table(
            {
                "name": pa.concat_arrays([name, name]),
                "home": pa.array(np.concatenate([home, home])),
                "lbucket": pa.array(np.concatenate([home, home + 1])),
            }
        )

    def score(group: pd.DataFrame) -> pd.DataFrame:
        return editdistance_name_pairs_df(
            group["name"].tolist(),
            group["home"].to_numpy(),
            int(group["lbucket"].iloc[0]),
            max_dist,
        )

    cand = (
        names.map_batches(fanout, batch_format="pyarrow")
        .groupby("lbucket")
        .map_groups(score, batch_format="pandas")
    )

    # (2) shared co-occurrence neighbors per entity pair
    def membership(t: pa.Table) -> pa.Table:
        co = t.filter(pc.equal(t["pred"], "cooccurs_with"))
        s = pc.utf8_slice_codeunits(co["subj"], 4)
        o = pc.utf8_slice_codeunits(co["obj"], 4)
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        o = o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o
        # middle = the shared NEIGHBOR, member = the endpoint entity
        return pa.table(
            {
                "entity": pa.concat_arrays([o, s]),
                "doc": pa.concat_arrays([s, o]),
            }
        )

    shared = shared_member_pairs_ds(
        triples.map_batches(membership, batch_format="pyarrow"),
        min_shared=1,
        n_buckets=n_buckets,
    )

    # (3) composite-key bucketed join: candidates ⋈ shared counts
    def keyed(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t["a"].cast(pa.string()), t["b"].cast(pa.string()), "\x00"
        )
        return t.append_column("k", k)

    cand_k = cand.map_batches(keyed, batch_format="pyarrow")
    shared_k = shared.map_batches(
        lambda t: pa.table(
            {
                "k": pc.binary_join_element_wise(
                    t["a"].cast(pa.string()), t["b"].cast(pa.string()), "\x00"
                ),
                "shared": t["shared"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = attach_col(
        cand_k, "k", shared_k, "k", "shared", "shared",
        n_buckets=n_buckets, how="inner",
    )
    return joined.map_batches(
        lambda t: t.select(["a", "b", "dist", "shared"]),
        batch_format="pyarrow",
    )
