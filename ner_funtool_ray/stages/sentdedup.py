"""Cross-document sentence deduplication — the CCNet/Dolma-style
boilerplate scrubber: any sentence appearing (verbatim, after trim) in
MORE THAN ONE document is removed from every document; each doc is
reassembled from its surviving sentences in original order.

Within-doc repetition is untouched (a sentence repeated twice in one doc
is not "cross-document"), matching the distinct-doc count semantics of
the SQL twin.

Plan (two passes over documents, one bounded exchange, no sentence-text
re-shuffle):

1. explode → per-batch DISTINCT (sentence, doc) pairs.  A document is one
   row and never spans batches, so per-batch distinct pairs are globally
   distinct and the per-sentence doc-counts from different batches sum
   exactly (same trick as cohort_retention's user buckets).
2. bounded-bucket group sum over the pairs → sentences with n_docs > 1.
   The duplicate SET (not the corpus) is collected and broadcast via
   ``ray.put`` under a size guard — boilerplate vocabulary grows with
   template count, not corpus size; the guard fails loudly rather than
   degrading.
3. second map over documents re-splits each doc (cheaper than shuffling
   exploded sentences back together) and drops members of the set.

Reference splitter lineage: functions/text.py:split_sentences
(predict_lstm_crf.py:104 semantics), whose RE2 twin is
SENTENCE_SPLIT_SQL_REGEX — the same pair every kg_sentences oracle uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.functions.text import (
    SENTENCE_SPLIT_SQL_REGEX,
    split_sentences,
)
from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum


def _dup_sentences(ds: "ray.data.Dataset", broadcast_limit: int) -> set[str]:
    def pairs(batch: pa.Table) -> pd.DataFrame:
        rows = {
            (s, d)
            for d, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
            for s in set(split_sentences(txt or ""))
        }
        df = pd.DataFrame(sorted(rows), columns=["sentence", "doc_id"])
        return df[["sentence"]]

    counts = bucketed_group_sum(
        ds.map_batches(pairs, batch_format="pyarrow"),
        keys=["sentence"],
        count_col="n_docs",
    )
    import pyarrow.compute as pc

    dups = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)).select(["sentence"]),
        batch_format="pyarrow",
    ).materialize()
    n = dups.count()
    if n > broadcast_limit:
        raise ValueError(
            f"{n} duplicated sentences exceed broadcast_limit="
            f"{broadcast_limit}; raise the limit or pre-shard the corpus"
        )
    out: set[str] = set()
    for b in dups.iter_batches(batch_format="pyarrow"):
        out.update(b["sentence"].to_pylist())
    return out


def dedup_sentences(
    sf_dir: str, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """→ ``(doc_id, clean_text, n_kept, n_dropped)`` with duplicated
    sentences removed and ``clean_text`` space-joined in original order
    (empty string when everything was boilerplate — the row survives)."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    dup_ref = ray.put(_dup_sentences(ds, broadcast_limit))

    def rebuild(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        doc_ids, texts, kept, dropped = [], [], [], []
        for d, txt in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sents = split_sentences(txt or "")
            keep = [s for s in sents if s not in dup]
            doc_ids.append(d)
            texts.append(" ".join(keep))
            kept.append(len(keep))
            dropped.append(len(sents) - len(keep))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "clean_text": pa.array(texts, type=pa.string()),
                "n_kept": pa.array(kept, type=pa.int64()),
                "n_dropped": pa.array(dropped, type=pa.int64()),
            }
        )

    return ds.map_batches(rebuild, batch_format="pyarrow")


DEDUP_SENTENCES_SQL = f"""
WITH s AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_idx) AS sid,
         trim(frag) AS sentence
  FROM (
    SELECT doc_id, generate_subscripts(l, 1) AS raw_idx, unnest(l) AS frag
    FROM (
      SELECT doc_id,
             regexp_split_to_array(text, '{SENTENCE_SPLIT_SQL_REGEX}') AS l
      FROM documents
    )
  )
  WHERE trim(frag) <> ''
),
dup AS (
  SELECT sentence FROM (
    SELECT sentence, count(DISTINCT doc_id) AS c FROM s GROUP BY sentence
  ) WHERE c > 1
),
keep AS (
  SELECT s.* FROM s LEFT JOIN dup USING (sentence)
  WHERE dup.sentence IS NULL
),
agg AS (
  SELECT doc_id, string_agg(sentence, ' ' ORDER BY sid) AS t,
         count(*) AS k
  FROM keep GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.t, '') AS clean_text,
       CAST(COALESCE(a.k, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(tot.n, 0) - COALESCE(a.k, 0) AS BIGINT) AS n_dropped
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN tot USING (doc_id)
"""


import re

_WORD_RE = re.compile(r"\w+")
_NGRAM_N = 6


def doc_dup_ngram_coverage(
    sf_dir: str, n: int = _NGRAM_N, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """Duplicated-n-gram coverage — the Gopher/RefinedWeb repetition
    signal at corpus level: per document, how many token positions fall
    inside a word n-gram that also occurs in ANOTHER document →
    ``(doc_id, n_tokens, n_masked)`` (all ints; the masked fraction is a
    downstream division).  Unlike :func:`dedup_sentences` (whole
    sentences, which this synthetic corpus never repeats verbatim),
    n-gram overlap is dense here, so the driver check exercises the dup
    machinery end to end.

    Same shape as the sentence scrub: per-batch distinct (gram, doc)
    partials sum to exact distinct-doc counts, dup grams broadcast under
    a guard, and a second document pass turns hit positions into covered
    spans with a vectorized +1/−1 sweep."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _grams(tokens: list[str]) -> list[str]:
        return [
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ]

    def gram_pairs(batch: pa.Table) -> pd.DataFrame:
        rows = {
            (g, d)
            for d, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
            for g in set(_grams(_WORD_RE.findall(txt or "")))
        }
        return pd.DataFrame(sorted(rows), columns=["gram", "doc_id"])[["gram"]]

    counts = bucketed_group_sum(
        ds.map_batches(gram_pairs, batch_format="pyarrow"),
        keys=["gram"],
        count_col="n_docs",
    )
    import pyarrow.compute as pc

    dups = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)).select(["gram"]),
        batch_format="pyarrow",
    ).materialize()
    if dups.count() > broadcast_limit:
        raise ValueError(
            f"{dups.count()} duplicated {n}-grams exceed broadcast_limit="
            f"{broadcast_limit}; raise the limit or pre-shard the corpus"
        )
    dup_set: set[str] = set()
    for b in dups.iter_batches(batch_format="pyarrow"):
        dup_set.update(b["gram"].to_pylist())
    dup_ref = ray.put(dup_set)

    def mask(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        doc_ids, n_tok, n_mask = [], [], []
        for d, txt in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = _WORD_RE.findall(txt or "")
            hits = np.fromiter(
                (i for i, g in enumerate(_grams(toks)) if g in dup),
                dtype=np.int64,
            )
            if len(hits):
                diff = np.zeros(len(toks) + n, dtype=np.int64)
                np.add.at(diff, hits, 1)
                np.add.at(diff, hits + n, -1)
                masked = int((np.cumsum(diff)[: len(toks)] > 0).sum())
            else:
                masked = 0
            doc_ids.append(d)
            n_tok.append(len(toks))
            n_mask.append(masked)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_masked": pa.array(n_mask, type=pa.int64()),
            }
        )

    return ds.map_batches(mask, batch_format="pyarrow")


def doc_dup_span_scrub(
    sf_dir: str, n: int = _NGRAM_N, broadcast_limit: int = 5_000_000
) -> "ray.data.Dataset":
    """ExactSubstr-style duplicate-span REMOVAL (the apply step of
    :func:`doc_dup_ngram_coverage`, the way ``minhash_dedup_corpus`` is
    the apply step of the LSH signal): every token position covered by a
    word n-gram that also occurs in ANOTHER document is deleted, and the
    document is reassembled from the surviving tokens in original order →
    ``(doc_id, scrubbed_text, n_tokens, n_kept)``.

    This is the word-level analogue of the suffix-array ExactSubstr
    dedup of Lee et al. (2022), "Deduplicating Training Data Makes
    Language Models Better": instead of byte-level suffix arrays the
    span finder is the same distributed n-gram plan the coverage signal
    uses — per-batch distinct (gram, doc) partials, one bounded group
    sum, a guarded dup-set broadcast — so the corpus text itself is
    never shuffled; the second pass re-derives spans locally with the
    +1/−1 sweep and drops covered tokens."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _grams(tokens: list[str]) -> list[str]:
        return [
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ]

    def gram_pairs(batch: pa.Table) -> pd.DataFrame:
        rows = {
            (g, d)
            for d, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
            for g in set(_grams(_WORD_RE.findall(txt or "")))
        }
        return pd.DataFrame(sorted(rows), columns=["gram", "doc_id"])[["gram"]]

    counts = bucketed_group_sum(
        ds.map_batches(gram_pairs, batch_format="pyarrow"),
        keys=["gram"],
        count_col="n_docs",
    )
    import pyarrow.compute as pc

    dups = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)).select(["gram"]),
        batch_format="pyarrow",
    ).materialize()
    if dups.count() > broadcast_limit:
        raise ValueError(
            f"{dups.count()} duplicated {n}-grams exceed broadcast_limit="
            f"{broadcast_limit}; raise the limit or pre-shard the corpus"
        )
    dup_set: set[str] = set()
    for b in dups.iter_batches(batch_format="pyarrow"):
        dup_set.update(b["gram"].to_pylist())
    dup_ref = ray.put(dup_set)

    def scrub(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        doc_ids, texts, n_tok, n_kept = [], [], [], []
        for d, txt in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = _WORD_RE.findall(txt or "")
            hits = np.fromiter(
                (i for i, g in enumerate(_grams(toks)) if g in dup),
                dtype=np.int64,
            )
            if len(hits):
                diff = np.zeros(len(toks) + n, dtype=np.int64)
                np.add.at(diff, hits, 1)
                np.add.at(diff, hits + n, -1)
                keep = np.cumsum(diff)[: len(toks)] == 0
                kept = [t for t, k in zip(toks, keep) if k]
            else:
                kept = toks
            doc_ids.append(d)
            texts.append(" ".join(kept))
            n_tok.append(len(toks))
            n_kept.append(len(kept))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "scrubbed_text": pa.array(texts, type=pa.string()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_kept": pa.array(n_kept, type=pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def make_dup_span_scrub_sql(n: int = _NGRAM_N) -> str:
    joined = " || ' ' || ".join(f"l[i + {j}]" for j in range(n))
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\w+') AS l FROM documents
),
g AS (
  SELECT doc_id,
         unnest(range(1, len(l) - {n - 2})) AS pos,
         unnest(list_transform(range(1, len(l) - {n - 2}),
                               i -> {joined})) AS gram
  FROM t
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS c FROM g GROUP BY gram
  ) WHERE c > 1
),
cov AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT g.doc_id, unnest(range(g.pos, g.pos + {n})) AS p
    FROM g JOIN dup USING (gram)
  )
),
w AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) AS p, unnest(l) AS w FROM t
),
kept AS (
  SELECT w.doc_id, w.p, w.w
  FROM w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.p = cov.p
  WHERE cov.p IS NULL
),
agg AS (
  SELECT doc_id,
         string_agg(w, ' ' ORDER BY p) AS scrubbed_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(agg.scrubbed_text, '') AS scrubbed_text,
       CAST(len(t.l) AS BIGINT) AS n_tokens,
       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN agg USING (doc_id)
"""


DOC_DUP_SPAN_SCRUB_SQL = make_dup_span_scrub_sql(_NGRAM_N)


def make_dup_ngram_sql(n: int = _NGRAM_N) -> str:
    joined = " || ' ' || ".join(f"l[i + {j}]" for j in range(n))
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\w+') AS l FROM documents
),
g AS (
  SELECT doc_id,
         unnest(range(1, len(l) - {n - 2})) AS pos,
         unnest(list_transform(range(1, len(l) - {n - 2}),
                               i -> {joined})) AS gram
  FROM t
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS c FROM g GROUP BY gram
  ) WHERE c > 1
),
cov AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT g.doc_id, unnest(range(g.pos, g.pos + {n})) AS p
    FROM g JOIN dup USING (gram)
  )
),
m AS (SELECT doc_id, count(*) AS n_masked FROM cov GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.l) AS BIGINT) AS n_tokens,
       CAST(COALESCE(m.n_masked, 0) AS BIGINT) AS n_masked
FROM t LEFT JOIN m USING (doc_id)
"""


DOC_DUP_NGRAM_SQL = make_dup_ngram_sql(_NGRAM_N)


__all__ = [
    "dedup_sentences",
    "DEDUP_SENTENCES_SQL",
    "doc_dup_ngram_coverage",
    "make_dup_ngram_sql",
    "DOC_DUP_NGRAM_SQL",
    "doc_dup_span_scrub",
    "make_dup_span_scrub_sql",
    "DOC_DUP_SPAN_SCRUB_SQL",
]
