"""Text-analysis pipelines over the ``documents`` table (training-data ops).

Each function takes ``sf_dir`` and returns a Dataset whose semantics have an
exact DuckDB SQL twin (registered in ``__ray_entry__.oracle_sql``):
language-ID, quality scoring, token counting, fingerprinting, exact dedup,
vocabulary frequency.  All are stateless vectorized ``map_batches`` except
the groupbys, which pre-aggregate per batch before shuffling.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min, Sum

from ner_funtool_ray.sources.io import read_parquet_auto

from ner_funtool_ray.utils import pa_from_pandas
from ner_funtool_ray.functions.text import (
    detect_language,
    fingerprint,
    quality_features,
    tokenize_words,
)


def _read_documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_auto(f"{sf_dir}/documents.parquet", columns=columns)


def doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc quality features (doc_id, n_chars, n_tokens, punct_ratio,
    stopword_ratio, mean_token_len)."""

    def f(batch: pa.Table) -> pa.Table:
        feats = quality_features(batch["text"].to_pylist())
        return pa.table({"doc_id": batch["doc_id"], **feats})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def langid(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc heuristic language ID (doc_id, lang_pred)."""

    def f(batch: pa.Table) -> pa.Table:
        preds = [detect_language(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds)})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc md5 fingerprint of whitespace-normalized lowercase text."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup on text fingerprint: keep min doc_id per fingerprint,
    report copy count.  Shuffle moves (fingerprint, doc_id) partials only."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [fingerprint(t) for t in batch["text"].to_pylist()]
        df = pd.DataFrame({"fingerprint": fps, "doc_id": batch["doc_id"].to_numpy()})
        agg = df.groupby("fingerprint", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return pa_from_pandas(agg.reset_index(), preserve_index=False)

    partial = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )
    return partial.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="doc_id"), Sum("n_copies", alias_name="n_copies")
    )


def dedup_normalized_best(
    sf_dir: str, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Normalization-keyed dedup with QUALITY-PRIORITY keep (the
    FineWeb/Dolma pattern): documents are grouped by their lowercased
    word sequence (punctuation- and whitespace-insensitive, unlike
    :func:`dedup_exact`'s whitespace-only normalization), and each group
    keeps its highest-quality member — max ``n_chars``, ties broken by
    min ``doc_id`` — rather than first-by-id →
    ``(doc_id, n_chars, group_size)``.

    Plan: one scan emits per-batch PRE-REDUCED partials (one row per key
    per batch: running best + count — argmax-by-(n_chars,−doc_id) is
    associative, so batch partials merge exactly), then one bounded
    exchange on ``bucket = md5(key) % n_buckets`` where a pandas groupby
    finishes the argmax.  The corpus text never shuffles; only
    (key, doc_id, n_chars, cnt) rows move."""
    import hashlib

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = [
            " ".join(tokenize_words((t or "").lower()))
            for t in batch["text"].to_pylist()
        ]
        hashed = [hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys]
        df = pd.DataFrame(
            {
                "key": hashed,
                "doc_id": batch["doc_id"].to_numpy(),
                "n_chars": batch["n_chars"].to_numpy(),
            }
        ).sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        agg = (
            df.groupby("key", sort=False)
            .agg(
                doc_id=("doc_id", "first"),
                n_chars=("n_chars", "first"),
                group_size=("doc_id", "size"),
            )
            .reset_index()
        )
        agg["bucket"] = [
            int(k[:8], 16) % n_buckets for k in agg["key"]
        ]
        return pa_from_pandas(agg, preserve_index=False)

    def finish(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        out = (
            g.groupby("key", sort=False)
            .agg(
                doc_id=("doc_id", "first"),
                n_chars=("n_chars", "first"),
                group_size=("group_size", "sum"),
            )
            .reset_index(drop=True)
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), type=pa.int64()),
                "n_chars": pa.array(
                    out["n_chars"].to_numpy(), type=pa.int64()
                ),
                "group_size": pa.array(
                    out["group_size"].to_numpy(), type=pa.int64()
                ),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
    )


DEDUP_NORMALIZED_BEST_SQL = r"""
WITH k AS (
  SELECT doc_id, n_chars,
         array_to_string(regexp_extract_all(lower(text), '\w+'), ' ') AS key
  FROM documents
)
SELECT doc_id, n_chars, group_size FROM (
  SELECT doc_id, n_chars,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS group_size,
         row_number() OVER (
           PARTITION BY key ORDER BY n_chars DESC, doc_id ASC
         ) AS rn
  FROM k
) WHERE rn = 1
"""


def vocab_count(sf_dir: str, min_count: int = 5) -> "ray.data.Dataset":
    """Word frequency over all documents (word, cnt), min_count-filtered —
    reference ``vocab_build`` aggregation semantics (data_preprocess.py:87-102)
    at corpus scale: per-batch partial counts, then a small groupby-Sum."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for t in batch["text"].to_pylist():
            c.update(tokenize_words(t or ""))
        if not c:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        words, cnts = zip(*c.items())
        return pa.table({"word": pa.array(words), "cnt": pa.array(cnts, type=pa.int64())})

    partial = _read_documents(sf_dir, ["text"]).map_batches(
        partial_counts, batch_format="pyarrow"
    )
    counts = partial.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    return counts.filter(expr=f"cnt >= {min_count}")


def lang_source_counts(sf_dir: str) -> "ray.data.Dataset":
    """Confusion-matrix-style crosstab: (lang, source, n) — reference A2
    pattern (`tag_evaluating.py:183-207`) as groupby-count."""
    return (
        _read_documents(sf_dir, ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
    )


class _WinnowStage:
    """Actor: winnowing (rolling-window-min) fingerprints per document —
    the MOSS-style local document fingerprinting scheme (public algorithm):
    char k-gram hashes over whitespace-normalized lowercased text, then the
    minimum hash of every window of w consecutive k-grams, deduplicated.
    Near-identical documents share most selected fingerprints, so matching
    fingerprint rows find local overlap (plagiarism-style dedup), not just
    whole-document equality like ``fingerprints``.

    k-gram hashes are md5-based (md5[:8] little-endian & 0xffffffff — the
    same construction the MinHash shingles use) and memoized across the
    actor's batches; the window minimum is a vectorized numpy
    sliding-window reduce.
    """

    def __init__(self, k: int = 5, window: int = 4):
        self.k = k
        self.window = window
        self._cache: dict[str, int] = {}

    def _doc_fps(self, text: str) -> list[int]:
        import hashlib

        import numpy as np

        t = " ".join((text or "").split()).lower()
        if not t:
            return []
        k = self.k
        grams = [t[i : i + k] for i in range(max(1, len(t) - k + 1))]
        hs = np.empty(len(grams), dtype=np.uint64)
        for i, g in enumerate(grams):
            v = self._cache.get(g)
            if v is None:
                v = (
                    int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                    & 0xFFFFFFFF
                )
                self._cache[g] = v
            hs[i] = v
        w = min(self.window, len(hs))
        from numpy.lib.stride_tricks import sliding_window_view

        mins = sliding_window_view(hs, w).min(axis=1)
        return sorted(set(int(x) for x in mins))

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        ids: list[int] = []
        fps: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for fp in self._doc_fps(text):
                ids.append(doc_id)
                fps.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "fingerprint": pa.array(fps, type=pa.int64()),
            }
        )


_WINNOW_CACHE: dict = {}


def _winnow_batch(batch, k: int, window: int):
    # task-pool stage with a per-worker cached instance: the k-gram hash
    # memo survives across batches AND queries without actor-pool spin-up
    stage = _WINNOW_CACHE.get((k, window))
    if stage is None:
        stage = _WinnowStage(k=k, window=window)
        _WINNOW_CACHE[(k, window)] = stage
    return stage(batch)


def winnow_fingerprints(
    sf_dir: str, k: int = 5, window: int = 4
) -> "ray.data.Dataset":
    """Distinct winnowing fingerprints per document: (doc_id, fingerprint)
    rows — no shuffle (dedup is per-document local)."""
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _winnow_batch,
        fn_kwargs={"k": k, "window": window},
        batch_format="pyarrow",
    )


def dedup_representatives(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """The dedup pipeline's OUTPUT corpus: one representative document
    (min doc_id) per exact content fingerprint — documents → per-batch
    (fingerprint, min doc_id) partials → fingerprint min-merge → a
    distributed bucketed SEMI-JOIN back onto documents by doc_id.  The
    keep-list is corpus-sized at web scale, so it co-locates with the
    documents by ``doc_id % n_buckets`` instead of broadcasting.  Returns
    (doc_id, lang, source)."""
    import numpy as np

    keeps = dedup_exact(sf_dir).select_columns(["doc_id"])

    def keep_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "lang": pa.nulls(len(ids), type=pa.string()),
                "source": pa.nulls(len(ids), type=pa.string()),
                "kind": pa.array(np.zeros(len(ids), dtype=np.int8)),
                "bucket": pa.array(ids % np.int64(n_buckets)),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "source": batch["source"],
                "kind": pa.array(np.ones(len(ids), dtype=np.int8)),
                "bucket": pa.array(ids % np.int64(n_buckets)),
            }
        )

    def bucket_semi(group: pd.DataFrame) -> pa.Table:
        keep = group.loc[group["kind"] == 0, "doc_id"].to_numpy()
        docs = group[group["kind"] == 1]
        import numpy as np

        hit = docs[np.isin(docs["doc_id"].to_numpy(), keep)]
        return pa.table(
            {
                "doc_id": pa.array(hit["doc_id"].to_numpy(), type=pa.int64()),
                "lang": pa.array(hit["lang"], type=pa.string()),
                "source": pa.array(hit["source"], type=pa.string()),
            }
        )

    docs = _read_documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        doc_rows, batch_format="pyarrow"
    )
    return (
        keeps.map_batches(keep_rows, batch_format="pyarrow")
        .union(docs)
        .groupby("bucket")
        .map_groups(bucket_semi, batch_format="pandas")
    )


def lang_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID EVAL → ``(lang_actual, lang_pred, n)`` confusion matrix
    of the heuristic detector against the corpus's labeled ``lang``
    column — the QA aggregate run before trusting a classifier stage.
    One scan, per-batch partial counts, languages²-bounded merge."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    def f(batch: pa.Table) -> pa.Table:
        preds = [detect_language(t) for t in batch["text"].to_pylist()]
        df = pd.DataFrame(
            {"lang_actual": batch["lang"].to_pylist(), "lang_pred": preds}
        )
        return pa_from_pandas(df, preserve_index=False)

    return bucketed_group_sum(
        _read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            f, batch_format="pyarrow"
        ),
        keys=["lang_actual", "lang_pred"],
        count_col="n",
        driver_cap=1_000_000,  # ≤ |langs|² rows per block partial
    )


_DOC_STATS_METRICS = (
    "n_chars", "n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len",
)


def doc_stats_long(sf_dir: str) -> "ray.data.Dataset":
    """UNPIVOT / melt shape → ``(doc_id, metric, value)``: the per-doc
    quality features reshaped to the long metric-table layout (the form
    monitoring systems ingest).  Pure per-batch reshape on top of
    ``doc_stats`` — no shuffle; ints widen to DOUBLE exactly, so the
    UNPIVOT twin hash-matches."""

    def melt(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = batch.to_pandas()
        out = df.melt(
            id_vars=["doc_id"],
            value_vars=list(_DOC_STATS_METRICS),
            var_name="metric",
            value_name="value",
        )
        out["value"] = out["value"].astype(np.float64)
        return pa_from_pandas(out, preserve_index=False)

    return doc_stats(sf_dir).map_batches(melt, batch_format="pyarrow")


def top_terms_per_lang(
    sf_dir: str, k: int = 10, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Corpus-level top-``k`` terms per language → ``(lang, word, cnt,
    rank)`` with the deterministic ``(cnt DESC, word)`` tie-break — the
    per-domain vocabulary profile a curation run reports.

    Exact corpus counts need one bounded exchange (per-batch Counter
    partials over (lang, word) via ``bucketed_group_sum`` — vocabulary ×
    languages rows, not corpus rows); the top-k then runs inside each
    LANGUAGE's hash bucket (a language never spans buckets, so the local
    head IS the global head).  Languages are a vocabulary, so the final
    result is tiny by construction."""
    import numpy as np

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[tuple[str, str]] = Counter()
        for lang, t in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            for w in tokenize_words(t or ""):
                c[(lang, w)] += 1
        if not c:
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "word": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        langs, words = zip(*c.keys())
        return pa.table(
            {
                "lang": pa.array(langs),
                "word": pa.array(words),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = bucketed_group_sum(
        _read_documents(sf_dir, ["lang", "text"]).map_batches(
            partial_counts, batch_format="pyarrow"
        ),
        keys=["lang", "word"],
        sum_cols={"cnt": "cnt"},
        count_col=None,
    )

    def add_lang_bucket(batch: pa.Table) -> pa.Table:
        import zlib

        langs = batch["lang"].to_pylist()
        return batch.append_column(
            "lbucket",
            pa.array(
                np.fromiter(
                    (zlib.crc32(s.encode()) % n_buckets for s in langs),
                    dtype=np.int64,
                    count=len(langs),
                )
            ),
        )

    def head(group: pd.DataFrame) -> pa.Table:
        out = []
        for lang, sub in group.groupby("lang", sort=False):
            sub = sub.sort_values(
                ["cnt", "word"], ascending=[False, True], kind="mergesort"
            ).head(k)
            sub = sub.assign(rank=np.arange(1, len(sub) + 1, dtype=np.int64))
            out.append(sub[["lang", "word", "cnt", "rank"]])
        return pa_from_pandas(
            pd.concat(out, ignore_index=True), preserve_index=False
        )

    return (
        counts.map_batches(add_lang_bucket, batch_format="pyarrow")
        .groupby("lbucket")
        .map_groups(head, batch_format="pandas")
    )


TOP_TERMS_PER_LANG_SQL = """
WITH c AS (
  SELECT lang, word, count(*)::BIGINT AS cnt
  FROM (SELECT lang, unnest(regexp_extract_all(text, '\\w+')) AS word
        FROM documents)
  GROUP BY lang, word
),
r AS (
  SELECT lang, word, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word)
           AS rank
  FROM c
)
SELECT lang, word, cnt, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


def source_lang_diversity(sf_dir: str) -> "ray.data.Dataset":
    """Corpus diversity report → ``(source, n_docs, sum_sq,
    simpson_ppm)``: the Gini–Simpson language-diversity index per source
    as an exact scaled integer, ``10⁶ − (Σc_l²·10⁶) // n²`` — the no-log
    stand-in for Shannon entropy (same trick as the lift ops), so the
    HUGEINT twin hash-matches.

    Per-batch (source, lang) count partials ride one bounded exchange
    (sources × languages rows); the index assembles per source on the
    driver in Python ints."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    ds = _read_documents(sf_dir, ["source", "lang"])

    counts = bucketed_group_sum(
        ds, keys=["source", "lang"], count_col="c"
    ).to_pandas()  # source × language bounded
    rows = []
    for src, sub in counts.groupby("source", sort=True):
        n = int(sub["c"].sum())
        ss = int((sub["c"].astype(object) ** 2).sum())
        rows.append((src, n, ss, 1_000_000 - (ss * 1_000_000) // (n * n)))
    import numpy as np

    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], type=pa.string()),
                "n_docs": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64)
                ),
                "sum_sq": pa.array(
                    np.array([r[2] for r in rows], dtype=np.int64)
                ),
                "simpson_ppm": pa.array(
                    np.array([r[3] for r in rows], dtype=np.int64)
                ),
            }
        )
    )


SOURCE_LANG_DIVERSITY_SQL = """
WITH c AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY source, lang
),
s AS (
  SELECT source,
         CAST(sum(c) AS HUGEINT) AS n,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM c GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(ss AS BIGINT) AS sum_sq,
       CAST(1000000 - (ss * 1000000) // (n * n) AS BIGINT) AS simpson_ppm
FROM s
"""


def source_dedup_report(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Per-source duplication report → ``(source, n_docs, n_distinct,
    dup_ppm)``: how much of each source survives exact dedup —
    the per-domain health metric a curation run publishes.

    Two-level exact distinct (the ``table_profile`` plan): per-batch
    DISTINCT (source, fingerprint) pairs hash-bucket by fingerprint, so
    per-bucket distinct counts sum exactly per source; doc counts are
    scalar partials.  ``dup_ppm = (n − distinct)·10⁶ // n`` in exact
    ints."""
    import zlib

    import numpy as np

    from ner_funtool_ray.functions.text import fingerprint

    ds = _read_documents(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        fps = [fingerprint(t) for t in batch["text"].to_pylist()]
        d = pd.DataFrame({"source": srcs, "fp": fps}).drop_duplicates()
        d["n"] = np.int64(0)
        d["kind"] = np.int8(0)
        m = (
            pd.DataFrame({"source": srcs})
            .groupby("source", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        m["fp"] = ""
        m["kind"] = np.int8(1)
        out = pd.concat([d, m[["source", "fp", "n", "kind"]]], ignore_index=True)
        out["bucket"] = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in out["fp"]),
            dtype=np.int64,
            count=len(out),
        )
        return pa_from_pandas(out, preserve_index=False)

    def bucket_stats(group: pd.DataFrame) -> pa.Table:
        d = group[group["kind"] == 0]
        m = group[group["kind"] == 1]
        dc = (
            d.drop_duplicates(["source", "fp"])
            .groupby("source", sort=False)
            .size()
            .rename("n_distinct")
            .reset_index()
        )
        dc["n_docs"] = np.int64(0)
        mc = (
            m.groupby("source", sort=False)["n"]
            .sum()
            .rename("n_docs")
            .reset_index()
        )
        mc["n_distinct"] = np.int64(0)
        out = pd.concat([dc, mc], ignore_index=True)
        return pa_from_pandas(
            out[["source", "n_docs", "n_distinct"]], preserve_index=False
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()  # source-bounded
        .groupby("source", sort=True)[["n_docs", "n_distinct"]]
        .sum()
        .reset_index()
    )
    n = agg["n_docs"].to_numpy(np.int64)
    dist = agg["n_distinct"].to_numpy(np.int64)
    dup = np.array(
        [(int(a - b) * 1_000_000) // int(a) for a, b in zip(n, dist)],
        dtype=np.int64,
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(agg["source"], type=pa.string()),
                "n_docs": pa.array(n),
                "n_distinct": pa.array(dist),
                "dup_ppm": pa.array(dup),
            }
        )
    )


SOURCE_DEDUP_REPORT_SQL = """
WITH f AS (
  SELECT source,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
),
s AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(count(DISTINCT fp) AS HUGEINT) AS d
  FROM f GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(d AS BIGINT) AS n_distinct,
       CAST((n - d) * 1000000 // n AS BIGINT) AS dup_ppm
FROM s
"""


def mention_contexts(sf_dir: str, window: int = 3) -> "ray.data.Dataset":
    """KWIC (keyword-in-context) extraction → ``(doc_id, pos, entity,
    left_ctx, right_ctx)``: every gazetteer-term token occurrence with
    its ±``window``-token context — the snippet table an annotation or
    weak-supervision step consumes downstream of NER.

    Embarrassingly parallel (per-doc, no shuffle at any scale): the term
    set broadcasts, matching is one vectorized ``np.isin`` per document's
    token array, and only the sparse hits pay the per-hit join cost.
    Tokenization is the repo-wide ``\\w+`` so the list-slice twin sees
    identical positions."""
    import re as _re

    import numpy as np

    from ner_funtool_ray.config import GAZETTEER

    terms = np.array(sorted(GAZETTEER), dtype=object)

    def extract(batch: pa.Table) -> pa.Table:
        ids, poss, ents, lefts, rights = [], [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = np.array(_re.findall(r"\w+", text or ""), dtype=object)
            if not len(toks):
                continue
            hits = np.nonzero(np.isin(toks, terms))[0]
            for i in hits:
                ids.append(did)
                poss.append(int(i) + 1)  # 1-based, matching SQL subscripts
                ents.append(toks[i])
                lefts.append(" ".join(toks[max(0, i - window) : i]))
                rights.append(" ".join(toks[i + 1 : i + 1 + window]))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pos": pa.array(poss, type=pa.int64()),
                "entity": pa.array(ents, type=pa.string()),
                "left_ctx": pa.array(lefts, type=pa.string()),
                "right_ctx": pa.array(rights, type=pa.string()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow"
    )


def make_mention_contexts_sql(window: int = 3) -> str:
    from ner_funtool_ray.config import GAZETTEER

    terms = ", ".join(f"'{t}'" for t in sorted(GAZETTEER))
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\w+') AS l FROM documents
),
pos AS (
  SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM toks
),
hit AS (SELECT doc_id, l, i FROM pos WHERE l[i] IN ({terms}))
SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i] AS entity,
       coalesce(array_to_string(
         list_slice(l, greatest(1, i - {window}), i - 1), ' '), '')
         AS left_ctx,
       coalesce(array_to_string(
         list_slice(l, i + 1, least(len(l), i + {window})), ' '), '')
         AS right_ctx
FROM hit
"""


def _levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein (gazetteer terms and tokens are short)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def fuzzy_gazetteer_matches(
    sf_dir: str, max_dist: int = 1
) -> "ray.data.Dataset":
    """Typo-tolerant dictionary matching → ``(term, token, dist, cnt)``:
    corpus tokens within edit distance ``max_dist`` of a gazetteer term
    (the fuzzy-entity-recall step a high-precision exact matcher misses),
    with the token's corpus frequency.  Exact-match rows (dist 0) are
    included so the output is the full match table.

    The only corpus-sized pass is the word count (``vocab_count``
    exchange); the DP runs over VOCABULARY × gazetteer with length
    blocking (|len(a) − len(b)| ≤ max_dist prunes most cells) INSIDE
    ``map_batches`` — the gazetteer is the broadcast-bounded side, so the
    vocabulary never funnels through the driver (an open vocabulary at
    corpus scale made the old driver pull unbounded).  DuckDB's
    ``levenshtein`` agrees with the plain DP, so the twin is hash-exact."""
    import numpy as np

    from ner_funtool_ray.config import GAZETTEER

    terms = sorted(GAZETTEER)  # gazetteer-bounded: ships with the task

    def match(t: pa.Table) -> pa.Table:
        rows = []
        for w, c in zip(t["word"].to_pylist(), t["cnt"].to_pylist()):
            lw = len(w)
            for g in terms:
                if abs(len(g) - lw) > max_dist:
                    continue
                d = _levenshtein(g, w)
                if d <= max_dist:
                    rows.append((g, w, d, int(c)))
        return pa.table(
            {
                "term": pa.array([r[0] for r in rows], type=pa.string()),
                "token": pa.array([r[1] for r in rows], type=pa.string()),
                "dist": pa.array(
                    np.array([r[2] for r in rows], dtype=np.int64)
                ),
                "cnt": pa.array(
                    np.array([r[3] for r in rows], dtype=np.int64)
                ),
            }
        )

    # (term, token) is unique, so this sort reproduces the old total order
    return (
        vocab_count(sf_dir, min_count=1)
        .map_batches(match, batch_format="pyarrow")
        .sort(["term", "token"])
    )


def make_fuzzy_gazetteer_sql(max_dist: int = 1) -> str:
    from ner_funtool_ray.config import GAZETTEER

    terms = ", ".join(f"('{t}')" for t in sorted(GAZETTEER))
    return rf"""
WITH w AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(text, '\w+')) AS word
        FROM documents)
  GROUP BY word
),
g AS (SELECT * FROM (VALUES {terms}) AS g(term))
SELECT g.term, w.word AS token,
       CAST(levenshtein(g.term, w.word) AS BIGINT) AS dist,
       w.cnt
FROM g JOIN w ON abs(length(g.term) - length(w.word)) <= {max_dist}
            AND levenshtein(g.term, w.word) <= {max_dist}
"""
