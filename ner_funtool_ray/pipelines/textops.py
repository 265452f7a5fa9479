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
        return pa.Table.from_pandas(agg.reset_index(), preserve_index=False)

    partial = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )
    return partial.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="doc_id"), Sum("n_copies", alias_name="n_copies")
    )


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
        return pa.Table.from_pandas(df, preserve_index=False)

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
        return pa.Table.from_pandas(out, preserve_index=False)

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
        return pa.Table.from_pandas(
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
