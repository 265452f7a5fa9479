"""Corpus curation — the APPLY side of the training-data pipeline.

The dedup/quality family elsewhere in this repo DETECTS (pairs, clusters,
scores); these operators produce the curated corpus a training run would
actually consume:

- ``minhash_dedup_corpus`` — the dedup apply step: drop every non-canonical
  member of a MinHash-LSH near-dup cluster, keep the canonical
  representative (min doc_id) and all untouched docs.
- ``benchmark_contamination`` — decontamination: flag corpus documents
  sharing word n-grams with a (small, fixed) benchmark set, the standard
  eval-leakage scrub before LM training.  The benchmark side broadcasts —
  it is benchmark-sized by DEFINITION (eval suites don't grow with the
  corpus) — and the corpus side streams.
- ``quality_filter`` — Gopher-style rule filter emitting a per-document
  violation BITMASK (length, type-token ratio, single-word dominance,
  stopword absence), all in exact integer arithmetic (every ratio test is
  cross-multiplied) so the DuckDB twin is hash-exact.

Word/gram tokenization uses the explicit ASCII class ``[0-9a-z_]+`` over
lowercased text on BOTH engines — Python's ``\\w`` is unicode-aware while
DuckDB's RE2 ``\\w`` is ASCII, and this corpus-invariant choice removes
that divergence (same trick as ``doc_keyword_hits``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.sources.io import parquet_num_rows, read_parquet_auto
from ner_funtool_ray.utils import pa_from_pandas

_WORD_RE = re.compile(r"[0-9a-z_]+")
_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


# --- dedup apply ------------------------------------------------------------


def minhash_dedup_corpus(
    sf_dir: str,
    threshold: float = 0.8,
    broadcast_limit: int = 5_000_000,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Deduplicated corpus → ``(doc_id, had_dups)``: every document except
    non-canonical near-dup cluster members; ``had_dups`` = 1 on the kept
    representative of each cluster (so downstream can weight it).

    The cluster table (near-dup docs only) is materialized by the
    clustering step anyway; at or below ``broadcast_limit`` rows its two
    id sets broadcast as sorted int64 arrays (vectorized ``np.isin``, no
    shuffle over the corpus).  Above the limit the plan is the bucketed
    shuffle anti-join ``customers_without_big_orders`` uses: cluster rows
    and doc ids co-locate by ``doc_id % n_buckets`` and each bucket
    filters vectorized — duplicates CAN be corpus-proportional in a web
    crawl, so unlike the benchmark side this never assumes small."""
    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ner_funtool_ray.stages.dedup import minhash_lsh_clusters

    clusters = minhash_lsh_clusters(docs, threshold=threshold).materialize()
    ids = docs.select_columns(["doc_id"])

    if clusters.count() <= broadcast_limit:
        cl = clusters.to_pandas()
        drop = np.unique(
            cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"].to_numpy(np.int64)
        )
        reps = np.unique(cl["cluster_id"].to_numpy(np.int64))
        drop_ref, reps_ref = ray.put(drop), ray.put(reps)

        def apply(batch: pa.Table) -> pa.Table:
            d = np.asarray(batch["doc_id"]).astype(np.int64)
            keep = ~np.isin(d, ray.get(drop_ref))
            kept = d[keep]
            return pa.table(
                {
                    "doc_id": pa.array(kept),
                    "had_dups": pa.array(
                        np.isin(kept, ray.get(reps_ref)).astype(np.int64)
                    ),
                }
            )

        return ids.map_batches(apply, batch_format="pyarrow")

    # corpus-proportional duplicate volume: bucketed shuffle anti-join
    def tag_cluster(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"]).astype(np.int64)
        c = np.asarray(batch["cluster_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "kind": pa.array(
                    np.where(d == c, np.int8(2), np.int8(0))
                ),  # 2=rep marker, 0=drop marker
                "bucket": pa.array(d % np.int64(n_buckets)),
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "kind": pa.array(np.ones(len(d), dtype=np.int8)),
                "bucket": pa.array(d % np.int64(n_buckets)),
            }
        )

    def bucket_apply(group: pd.DataFrame) -> pa.Table:
        drop = group.loc[group["kind"] == 0, "doc_id"].to_numpy(np.int64)
        reps = group.loc[group["kind"] == 2, "doc_id"].to_numpy(np.int64)
        d = group.loc[group["kind"] == 1, "doc_id"].to_numpy(np.int64)
        kept = d[~np.isin(d, drop)]
        return pa.table(
            {
                "doc_id": pa.array(kept),
                "had_dups": pa.array(np.isin(kept, reps).astype(np.int64)),
            }
        )

    return (
        clusters.map_batches(tag_cluster, batch_format="pyarrow")
        .union(ids.map_batches(tag_doc, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(bucket_apply, batch_format="pandas")
    )


def make_minhash_dedup_sql(clusters_sql: str) -> str:
    return f"""
WITH cl AS ({clusters_sql})
SELECT d.doc_id,
       CAST(CASE WHEN d.doc_id IN (SELECT cluster_id FROM cl)
            THEN 1 ELSE 0 END AS BIGINT) AS had_dups
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
"""


# --- decontamination --------------------------------------------------------


def _grams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def _benchmark_gram_set(
    sf_dir: str,
    n: int = 4,
    bench_pct: int = 2,
    broadcast_limit: int = 20_000_000,
) -> "tuple[set[int], set[str]]":
    """Driver-side benchmark extraction → ``(bench_ids, bench_grams)``.
    The benchmark is the deterministic md5 ``doc_id % 100 < bench_pct``
    sample standing in for a fixed eval suite (a production benchmark is
    its own small file); benchmark-sized by definition, loud guard."""
    # the selection streams: each batch filters itself by the md5 rule and
    # ships only its BENCHMARK rows, so the driver pull is benchmark-sized
    # (the old plan read the entire text column onto the driver first)
    def select_bench(batch: pa.Table) -> pa.Table:
        from ner_funtool_ray.functions.md5vec import md5_number_lower_batch

        ids = [str(d) for d in batch["doc_id"].to_pylist()]
        u = md5_number_lower_batch(ids)
        sel = u % np.uint64(100) < np.uint64(bench_pct)
        return batch.filter(pa.array(sel))

    bench = (
        read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(select_bench, batch_format="pyarrow")
        .to_pandas()
    )
    if bench.empty:  # zero-row to_pandas DROPS columns (documented trap)
        return set(), set()
    bench_ids = set(bench["doc_id"].tolist())
    bench_grams: set[str] = set()
    for txt in bench["text"].tolist():
        bench_grams.update(_grams(_WORD_RE.findall((txt or "").lower()), n))
        if len(bench_grams) > broadcast_limit:
            raise ValueError(
                f"benchmark grams exceed broadcast_limit={broadcast_limit}; "
                "a benchmark set should be fixed-size"
            )
    return bench_ids, bench_grams


def benchmark_contamination(
    sf_dir: str,
    n: int = 4,
    bench_pct: int = 2,
    broadcast_limit: int = 20_000_000,
) -> "ray.data.Dataset":
    """Eval-leakage scan → ``(doc_id, n_shared)``: for every NON-benchmark
    document, the number of distinct word ``n``-grams it shares with the
    benchmark set (here: the deterministic md5 ``doc_id % 100 <
    bench_pct`` sample standing in for a fixed eval suite); only
    contaminated docs (``n_shared > 0``) are emitted.

    The benchmark gram set is built on the driver and broadcast once —
    benchmark-sized by definition, with a loud guard, never a corpus-side
    shuffle; the corpus streams through one map_batches."""
    bench_ids, bench_grams = _benchmark_gram_set(
        sf_dir, n=n, bench_pct=bench_pct, broadcast_limit=broadcast_limit
    )
    grams_ref = ray.put(bench_grams)
    bench_ids_ref = ray.put(bench_ids)

    ds = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        bg = ray.get(grams_ref)
        bid = ray.get(bench_ids_ref)
        out_d, out_n = [], []
        for d, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d in bid:
                continue
            shared = {
                g
                for g in _grams(_WORD_RE.findall((txt or "").lower()), n)
                if g in bg
            }
            if shared:
                out_d.append(d)
                out_n.append(len(shared))
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "n_shared": pa.array(out_n, type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def make_contamination_sql(n: int = 4, bench_pct: int = 2) -> str:
    joined = " || ' ' || ".join(f"l[i + {j}]" for j in range(n))
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS l,
         md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < {bench_pct} AS is_b
  FROM documents
),
g AS (
  SELECT doc_id, is_b,
         unnest(list_transform(range(1, len(l) - {n - 2}),
                               i -> {joined})) AS gram
  FROM t
),
bg AS (SELECT DISTINCT gram FROM g WHERE is_b)
SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_shared
FROM g JOIN bg USING (gram)
WHERE NOT is_b
GROUP BY doc_id
"""


# --- quality rules ----------------------------------------------------------

_MIN_WORDS, _MAX_WORDS = 20, 1000


def quality_filter(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style rule filter → ``(doc_id, n_words, flags, keep)``.

    ``flags`` bitmask (0 = clean): 1 word count outside
    [{_MIN_WORDS}, {_MAX_WORDS}]; 2 type-token ratio < 1/2 (repetitive
    vocabulary); 4 most-frequent word > 1/5 of the doc (single-word
    dominance); 8 no stopword present (non-prose).  Every ratio test is
    cross-multiplied into integers — no division on either engine.

    Pure map_batches — no shuffle; per-doc work is bounded by doc length
    and the counters are C-level (np.unique on the token array)."""
    ds = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    stop = frozenset(_STOPWORDS)

    def score(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_f = [], [], []
        for d, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = _WORD_RE.findall((txt or "").lower())
            n = len(toks)
            if n:
                uniq, cnt = np.unique(np.array(toks, dtype=object), return_counts=True)
                nd, mx = len(uniq), int(cnt.max())
                has_stop = any(w in stop for w in uniq)
            else:
                nd, mx, has_stop = 0, 0, False
            flags = 0
            if n < _MIN_WORDS or n > _MAX_WORDS:
                flags |= 1
            if nd * 2 < n:
                flags |= 2
            if mx * 5 > n:
                flags |= 4
            if not has_stop:
                flags |= 8
            out_id.append(d)
            out_n.append(n)
            out_f.append(flags)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_words": pa.array(out_n, type=pa.int64()),
                "flags": pa.array(out_f, type=pa.int64()),
                "keep": pa.array(
                    [np.int64(1) if f == 0 else np.int64(0) for f in out_f]
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


QUALITY_FILTER_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS l
  FROM documents
),
base AS (
  SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd,
         len(list_filter(l, x -> x IN {_STOPWORDS!r})) AS ns
  FROM w
),
dom AS (
  SELECT doc_id, COALESCE(max(c), 0) AS mx FROM (
    SELECT doc_id, count(*) AS c
    FROM (SELECT doc_id, unnest(l) AS word FROM w)
    GROUP BY doc_id, word
  ) GROUP BY doc_id
),
f AS (
  SELECT b.doc_id, b.n,
         (CASE WHEN b.n < {_MIN_WORDS} OR b.n > {_MAX_WORDS} THEN 1 ELSE 0 END
        + CASE WHEN b.nd * 2 < b.n THEN 2 ELSE 0 END
        + CASE WHEN COALESCE(d.mx, 0) * 5 > b.n THEN 4 ELSE 0 END
        + CASE WHEN b.ns = 0 THEN 8 ELSE 0 END) AS flags
  FROM base b LEFT JOIN dom d USING (doc_id)
)
SELECT doc_id, CAST(n AS BIGINT) AS n_words, CAST(flags AS BIGINT) AS flags,
       CAST(CASE WHEN flags = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f
"""


__all__ = [
    "minhash_dedup_corpus",
    "make_minhash_dedup_sql",
    "benchmark_contamination",
    "make_contamination_sql",
    "quality_filter",
    "QUALITY_FILTER_SQL",
]


# --- sequence packing --------------------------------------------------------


def _doc_id_bounds(path: str) -> tuple[int, int]:
    """(min, max) doc_id from parquet row-group statistics — metadata
    only; falls back to a pruned single-column scan when stats are
    absent (mirrors mining._orderdate_day_bounds)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("doc_id")
    lo, hi = None, None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is not None:
        return int(lo), int(hi)
    t = pq.read_table(path, columns=["doc_id"])
    d = np.asarray(t["doc_id"])
    return int(d.min()), int(d.max())


def doc_token_bins(
    sf_dir: str, capacity: int = 512, n_partitions: int = 32
) -> "ray.data.Dataset":
    """Context-window packing → ``(doc_id, n_tokens, bin_id)``: assign
    documents (in doc_id order) to fixed-capacity token bins, ``bin_id =
    (running_tokens_before_this_doc) // capacity`` — the deterministic
    chunking step that turns a curated corpus into training sequences.

    A GLOBAL running sum without a global sort: doc_id-range partitions
    (bounds from parquet stats, no scan) are order-consistent with the
    sort key, so per-partition token totals (a ≤n_partitions-row
    exchange) yield exclusive prefix offsets, and each partition cumsums
    locally (the ``running_revenue`` scan decomposition).  Token counts
    are vectorized (`count_substring_regex`), never a Python token loop."""
    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    path = f"{sf_dir}/documents.parquet"
    lo, hi = _doc_id_bounds(path)
    width = max(1, -(-(hi - lo + 1) // n_partitions))

    ds = read_parquet_auto(path, columns=["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"]).astype(np.int64)
        n = pc.count_substring_regex(
            pc.utf8_lower(batch["text"]), "[0-9a-z_]+"
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((d - lo) // width),
                "doc_id": pa.array(d),
                "n_tokens": pa.array(n.astype(np.int64)),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    totals = (
        bucketed_group_sum(
            keyed_ds.map_batches(
                lambda t: t.select(["part", "n_tokens"]),
                batch_format="pyarrow",
            ),
            keys=["part"],
            sum_cols={"s": "n_tokens"},
            count_col=None,
            n_buckets=8,
            driver_cap=1_000_000,  # ≤ n_partitions rows per block partial
        )
        .to_pandas()
        .sort_values("part")
    )
    offs = dict(
        zip(
            totals["part"].to_numpy(),
            np.concatenate([[0], np.cumsum(totals["s"].to_numpy())[:-1]]),
        )
    )

    def local_scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        run = np.cumsum(n) + int(offs[int(g["part"].iloc[0])])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "bin_id": (run - n) // capacity,
            }
        )

    return keyed_ds.groupby("part").map_groups(
        local_scan, batch_format="pandas"
    )


def make_token_bins_sql(capacity: int = 512) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {capacity} AS BIGINT) AS bin_id
FROM t
"""


# --- ranked retrieval --------------------------------------------------------

_TFIDF_QUERY = ("data", "join", "merge")


def tfidf_search(
    sf_dir: str, terms: tuple[str, ...] = _TFIDF_QUERY, k: int = 10
) -> "ray.data.Dataset":
    """Ranked retrieval → top-``k`` ``(doc_id, score)`` by integer tf-idf:
    ``score = Σ_t tf(doc,t) · ((N · 1e6) // df(t))`` — idf as a scaled
    integer reciprocal (no log), so both engines agree bit-for-bit.

    Two streaming passes, no corpus shuffle: pass 1 computes per-term
    document frequencies as per-batch partials merged on the driver
    (|terms| rows); pass 2 scores each doc vectorized (one
    ``count_substring_regex`` per term) and keeps a per-batch local
    top-k — exact because a doc's score completes within its batch — and
    the driver merges ``n_batches × k`` candidates with the
    deterministic ``(score DESC, doc_id)`` tie-break."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"
    n_docs = parquet_num_rows(path)
    ds = read_parquet_auto(path, columns=["doc_id", "text"])
    pats = {t: rf"\b{re.escape(t)}\b" for t in terms}

    def df_partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        names, counts = [], []
        for t, pat in pats.items():
            hit = pc.greater(pc.count_substring_regex(low, pat), 0)
            names.append(t)
            counts.append(int(pc.sum(hit.cast(pa.int64())).as_py() or 0))
        return pa.table(
            {
                "term": pa.array(names, type=pa.string()),
                "df": pa.array(counts, type=pa.int64()),
            }
        )

    dfs = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()  # |terms| rows per batch
        .groupby("term")["df"]
        .sum()
        .to_dict()
    )
    idf = {
        t: (n_docs * 1_000_000) // int(d) for t, d in dfs.items() if d > 0
    }
    idf_ref = ray.put(idf)

    def local_topk(batch: pa.Table) -> pa.Table:
        iw = ray.get(idf_ref)
        low = pc.utf8_lower(batch["text"])
        score = np.zeros(batch.num_rows, dtype=np.int64)
        for t, w in iw.items():
            tf = pc.count_substring_regex(low, pats[t]).to_numpy(
                zero_copy_only=False
            )
            score += tf.astype(np.int64) * np.int64(w)
        d = np.asarray(batch["doc_id"]).astype(np.int64)
        pos = score > 0
        d, score = d[pos], score[pos]
        order = np.lexsort((d, -score))[:k]
        return pa.table(
            {"doc_id": pa.array(d[order]), "score": pa.array(score[order])}
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "score": pa.array(top["score"].to_numpy(np.int64)),
            }
        )
    )


def make_tfidf_sql(terms: tuple[str, ...] = _TFIDF_QUERY, k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok
  WHERE w IN ({tlist}) GROUP BY doc_id, w
),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS nn FROM documents),
s AS (
  SELECT doc_id, sum(tf * ((nn * 1000000) // df)) AS score
  FROM tf JOIN df USING (w) CROSS JOIN n GROUP BY doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id LIMIT {k}
"""


def bm25_search(
    sf_dir: str,
    terms: tuple[str, ...] = _TFIDF_QUERY,
    k: int = 10,
    k1_tenths: int = 12,
    b_quarters: int = 3,
) -> "ray.data.Dataset":
    """BM25 ranked retrieval → top-``k`` ``(doc_id, score)``, exact-integer.

    Okapi BM25 with k1 = ``k1_tenths``/10 (default 1.2) and
    b = ``b_quarters``/4 (default 0.75), evaluated entirely in int64
    fixed-point so Ray and DuckDB agree bit-for-bit (the graded-retrieval
    complement of the binary tf-idf ranking above):

    - idf_ppm(t)    = (N·1e6) // df(t)        (scaled reciprocal, no log)
    - tfnorm_ppm    = (4·(10+K)·tf·T·1e6)
                      // (40·T·tf + K·((4−B)·T + B·dl·N))
      — the classic tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) with
      avgdl = T/N multiplied through, K=``k1_tenths`` B=``b_quarters``;
      T = corpus token count, dl = doc token count
    - score(doc)    = Σ_t (idf_ppm · tfnorm_ppm) // 1e6

    Same two streaming passes as :func:`tfidf_search` — pass 1 merges
    per-batch (df, token-count) partials on the driver (|terms|+1 rows
    per batch); pass 2 scores vectorized with a per-batch exact local
    top-k.  int64 bounds: tfnorm_ppm ≤ (10+K)·1e5 and idf_ppm ≤ N·1e6,
    so the product stays under 2^63 up to N ≈ 4·10⁹ docs per ranked
    partition — repartition by corpus shard beyond that."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"
    n_docs = parquet_num_rows(path)
    ds = read_parquet_auto(path, columns=["doc_id", "text"])
    pats = {t: rf"\b{re.escape(t)}\b" for t in terms}
    tok_pat = "[0-9a-z_]+"

    def partials(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        names, counts = ["\x00total_tokens"], [
            int(
                pc.sum(pc.count_substring_regex(low, tok_pat)).as_py() or 0
            )
        ]
        for t, pat in pats.items():
            hit = pc.greater(pc.count_substring_regex(low, pat), 0)
            names.append(t)
            counts.append(int(pc.sum(hit.cast(pa.int64())).as_py() or 0))
        return pa.table(
            {
                "term": pa.array(names, type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .to_pandas()  # (|terms|+1) rows per batch
        .groupby("term")["n"]
        .sum()
        .to_dict()
    )
    total_tokens = int(agg.pop("\x00total_tokens", 0))
    idf = {
        t: (n_docs * 1_000_000) // int(d) for t, d in agg.items() if d > 0
    }
    idf_ref = ray.put(idf)
    K, B, T, N = k1_tenths, b_quarters, total_tokens, n_docs

    def local_topk(batch: pa.Table) -> pa.Table:
        iw = ray.get(idf_ref)
        low = pc.utf8_lower(batch["text"])
        dl = pc.count_substring_regex(low, tok_pat).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        score = np.zeros(batch.num_rows, dtype=np.int64)
        denom_dl = K * ((4 - B) * T + B * dl * N)  # tf-independent part
        for t, w in iw.items():
            tf = pc.count_substring_regex(low, pats[t]).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tfnorm = (4 * (10 + K) * tf * T * 1_000_000) // (
                40 * T * tf + denom_dl
            )
            score += (np.int64(w) * tfnorm) // 1_000_000
        d = np.asarray(batch["doc_id"]).astype(np.int64)
        pos = score > 0
        d, score = d[pos], score[pos]
        order = np.lexsort((d, -score))[:k]
        return pa.table(
            {"doc_id": pa.array(d[order]), "score": pa.array(score[order])}
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "score": pa.array(top["score"].to_numpy(np.int64)),
            }
        )
    )


def make_bm25_sql(
    terms: tuple[str, ...] = _TFIDF_QUERY,
    k: int = 10,
    k1_tenths: int = 12,
    b_quarters: int = 3,
) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    K, B = k1_tenths, b_quarters
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok
  WHERE w IN ({tlist}) GROUP BY doc_id, w
),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS nn FROM documents),
tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tt FROM dl),
s AS (
  SELECT tf.doc_id,
         sum(((nn * 1000000) // df)
             * ((4 * (10 + {K}) * tf * tt * 1000000)
                // (40 * tt * tf
                    + {K} * ((4 - {B}) * tt + {B} * dl.dl * nn)))
             // 1000000) AS score
  FROM tf JOIN df USING (w) JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN n CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM s WHERE score > 0 ORDER BY score DESC, doc_id LIMIT {k}
"""


__all__ += [
    "doc_token_bins",
    "make_token_bins_sql",
    "tfidf_search",
    "make_tfidf_sql",
    "bm25_search",
    "make_bm25_sql",
]


# --- normalization -----------------------------------------------------------


def doc_clean(sf_dir: str) -> "ray.data.Dataset":
    """Text normalization → ``(doc_id, clean_text, n_removed)``: lowercase,
    collapse every run of non-word characters to a single space, trim;
    ``n_removed`` = chars dropped by the normalization.  Pure vectorized
    map (RE2 kernels), no shuffle, no Python per-row loop — the first
    stage of every text pipeline, emitted as its own operator so
    downstream stages can share one normalized column."""
    import pyarrow.compute as pc

    ds = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def clean(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        collapsed = pc.replace_substring_regex(low, "[^0-9a-z_]+", " ")
        trimmed = pc.utf8_trim(collapsed, " ")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": trimmed,
                "n_removed": pc.subtract(
                    pc.utf8_length(batch["text"]), pc.utf8_length(trimmed)
                ).cast(pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


DOC_CLEAN_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '[^0-9a-z_]+', ' ', 'g'), ' ')
         AS clean_text,
       CAST(length(text)
            - length(trim(regexp_replace(lower(text), '[^0-9a-z_]+', ' ',
                                         'g'), ' ')) AS BIGINT) AS n_removed
FROM documents
"""


__all__ += ["doc_clean", "DOC_CLEAN_SQL"]


def doc_chunks(
    sf_dir: str, width: int = 32, stride: int = 24
) -> "ray.data.Dataset":
    """Context-window chunking for LLM training-data prep →
    ``(doc_id, chunk_id, chunk_text, n_tokens)``: each document's
    whitespace tokens are cut into windows of ``width`` tokens starting
    every ``stride`` tokens (overlap = width − stride), the standard
    sliding-window pass that turns documents into model-context rows.

    Embarrassingly parallel — chunking is per-document, so there is NO
    shuffle at any scale: one ``map_batches`` with a vectorized polars
    split → int_ranges explode → list.slice chain (a pure-Python
    per-document fallback keeps the operator alive without polars).  The
    output is larger than the input by the overlap factor; at 100 TB the
    write, not this transform, is the cost."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def chunk_pl(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = (
            df.with_columns(pl.col("text").str.split(" ").alias("toks"))
            .with_columns(pl.col("toks").list.len().cast(pl.Int64).alias("n"))
            .with_columns(
                pl.int_ranges(0, pl.col("n"), stride).alias("start")
            )
            .explode("start")
            .with_columns(
                (pl.col("start") // stride).alias("chunk_id"),
                pl.col("toks")
                .list.slice(pl.col("start"), width)
                .list.join(" ")
                .alias("chunk_text"),
                (
                    pl.min_horizontal(pl.col("start") + width, pl.col("n"))
                    - pl.col("start")
                ).alias("n_tokens"),
            )
            .select(["doc_id", "chunk_id", "chunk_text", "n_tokens"])
        )
        return out.to_arrow()

    def chunk_py(batch: pa.Table) -> pa.Table:
        ids, cids, texts, lens = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = text.split(" ")
            for ci, start in enumerate(range(0, len(toks), stride)):
                window = toks[start : start + width]
                ids.append(did)
                cids.append(ci)
                texts.append(" ".join(window))
                lens.append(len(window))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk_id": pa.array(cids, type=pa.int64()),
                "chunk_text": pa.array(texts, type=pa.string()),
                "n_tokens": pa.array(lens, type=pa.int64()),
            }
        )

    try:
        import polars  # noqa: F401

        fn = chunk_pl
    except ImportError:  # pragma: no cover - polars is in the sandbox
        fn = chunk_py

    def chunk(batch: pa.Table) -> pa.Table:
        t = fn(batch)
        # normalize dtypes across the polars/python paths
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "chunk_id": t["chunk_id"].cast(pa.int64()),
                "chunk_text": t["chunk_text"].cast(pa.string()),
                "n_tokens": t["n_tokens"].cast(pa.int64()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def make_doc_chunks_sql(width: int = 32, stride: int = 24) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(len(toks) AS BIGINT), {stride})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // {stride} AS BIGINT) AS chunk_id,
       array_to_string(
         list_slice(toks, start + 1,
                    least(start + {width}, CAST(len(toks) AS BIGINT))),
         ' ') AS chunk_text,
       CAST(least(start + {width}, CAST(len(toks) AS BIGINT)) - start
            AS BIGINT) AS n_tokens
FROM s
"""


__all__ += ["doc_chunks", "make_doc_chunks_sql"]


_MIXTURE_RATES = (("en", 1000), ("zh", 500), ("de", 250))
_MIXTURE_DEFAULT = 125


def mixture_sample(sf_dir: str) -> "ray.data.Dataset":
    """Language-mixture resampling (the data-mixing step of a training
    pipeline: apply static per-domain keep rates a mixture optimizer
    chose) → the surviving ``(doc_id, lang)`` rows.

    Keep rule: ``md5_number_lower(doc_id) % 1000 < rate(lang)`` with
    rates per thousand — deterministic, engine-independent, and
    parallelism-independent (the same property ``sample_documents``
    establishes; hashing is the vectorized single-block MD5 kernel).
    Rates ride as a tiny broadcast dict; the corpus streams with NO
    shuffle, so the op costs one column-pruned scan at any scale."""
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.sources.io import read_parquet_auto

    rates = dict(_MIXTURE_RATES)
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        u = md5_number_lower_batch(
            [str(d) for d in batch["doc_id"].to_pylist()]
        )
        r = np.array(
            [rates.get(l, _MIXTURE_DEFAULT) for l in batch["lang"].to_pylist()],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(u % np.uint64(1000) < r))

    return ds.map_batches(keep, batch_format="pyarrow")


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 <
      CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 500
                WHEN 'de' THEN 250 ELSE 125 END
"""


__all__ += ["mixture_sample", "MIXTURE_SAMPLE_SQL"]


def incremental_dedup_new(
    sf_dir: str, broadcast_limit: int = 5_000_000, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Incremental dedup against a history index → the NEW documents
    whose content fingerprint already exists in the HISTORY partition —
    the nightly-ingest shape: dedupe today's crawl against everything
    already accepted, without re-clustering the archive.

    The deterministic md5 split (``md5_number_lower(doc_id) % 2``) stands
    in for the history/new partition boundary; the key is the
    BAG-OF-WORDS fingerprint (md5 of the sorted distinct token set —
    exact text dups don't exist in the synthetic corpus, token-set dups
    do, and the shape-level key is what real incremental dedup uses for
    template spam anyway).  Size-guarded plan (the history side is
    corpus-proportional by construction): under the parquet-metadata
    guard the history fingerprint set broadcasts once and the new
    partition streams with a set probe; above it, BOTH sides hash-bucket
    by fingerprint (a fingerprint lives in one bucket) and the per-bucket
    semi-join emits the duplicate new docs.  Output: ``(doc_id,
    fingerprint)``."""
    import hashlib
    import re as _re
    import zlib

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.sources.io import parquet_num_rows

    def fingerprint(text: str) -> str:
        toks = sorted(set(_re.findall(r"\w+", text or "")))
        return hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        ids = [str(d) for d in batch["doc_id"].to_pylist()]
        half = md5_number_lower_batch(ids) % np.uint64(2)
        fps = [fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, type=pa.string()),
                "is_new": pa.array(half.astype(np.int8)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    if parquet_num_rows(f"{sf_dir}/documents.parquet") <= broadcast_limit:
        hist = set()
        for b in tagged.iter_batches(batch_format="pyarrow"):
            m = np.asarray(b["is_new"]) == 0
            hist.update(np.asarray(b["fingerprint"].to_pandas())[m])
        hist_ref = ray.put(hist)

        def probe(batch: pa.Table) -> pa.Table:
            h = ray.get(hist_ref)
            is_new = np.asarray(batch["is_new"]) == 1
            fps = batch["fingerprint"].to_pylist()
            dup = (
                np.fromiter(
                    (f in h for f in fps), dtype=bool, count=len(fps)
                )
                & is_new
            )
            out = batch.filter(pa.array(dup))
            return out.select(["doc_id", "fingerprint"])

        return tagged.map_batches(probe, batch_format="pyarrow")

    # bucketed fallback: fingerprints co-locate, per-bucket semi-join
    def add_bucket(batch: pa.Table) -> pa.Table:
        fps = batch["fingerprint"].to_pylist()
        return batch.append_column(
            "bucket",
            pa.array(
                np.fromiter(
                    (zlib.crc32(f.encode()) % n_buckets for f in fps),
                    dtype=np.int64,
                    count=len(fps),
                )
            ),
        )

    def semi(group: pd.DataFrame) -> pa.Table:
        hist = set(group.loc[group["is_new"] == 0, "fingerprint"])
        new = group[group["is_new"] == 1]
        keep = new["fingerprint"].isin(hist).to_numpy()
        return pa_from_pandas(
            new.loc[keep, ["doc_id", "fingerprint"]], preserve_index=False
        )

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(semi, batch_format="pandas")
    )


INCREMENTAL_DEDUP_NEW_SQL = r"""
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(
           list_sort(list_distinct(regexp_extract_all(text, '\w+'))), ' '))
           AS fp,
         md5_number_lower(CAST(doc_id AS VARCHAR)) % 2 AS half
  FROM documents
),
hist AS (SELECT DISTINCT fp FROM f WHERE half = 0)
SELECT doc_id, fp AS fingerprint
FROM f JOIN hist USING (fp)
WHERE half = 1
"""


def bpe_top_pairs(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Tokenizer induction: the FIRST byte-pair-encoding merge
    candidates → top-``k`` ``(pair, cnt)`` adjacent-character pairs over
    the corpus, weighted by word frequency (exactly the statistic BPE's
    first merge maximizes).  Ties order by the pair string.

    The only corpus-sized pass is the word count (the ``vocab_count``
    exchange); the character-pair partials stream out of ``map_batches``
    over the vocabulary (never funneling the open vocabulary through the
    driver) and merge in a bounded-bucket group sum — the pair domain is
    charset²-bounded, so the final sort+limit runs on a sketch-sized
    table.  The twin reproduces the same expansion with list slicing."""
    from collections import Counter

    from ner_funtool_ray.pipelines.textops import vocab_count
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    def pair_partials(t: pa.Table) -> pa.Table:
        pairs: Counter[str] = Counter()
        for w, c in zip(t["word"].to_pylist(), t["cnt"].to_pylist()):
            ci = int(c)
            for a, b in zip(w, w[1:]):
                pairs[a + b] += ci
        return pa.table(
            {
                "pair": pa.array(list(pairs.keys()), type=pa.string()),
                "cnt": pa.array(
                    np.fromiter(pairs.values(), dtype=np.int64, count=len(pairs))
                ),
            }
        )

    agg = bucketed_group_sum(
        vocab_count(sf_dir, min_count=1).map_batches(
            pair_partials, batch_format="pyarrow"
        ),
        keys=["pair"],
        sum_cols={"cnt": "cnt"},
        count_col=None,
    )
    return agg.sort(["cnt", "pair"], descending=[True, False]).limit(k)


BPE_TOP_PAIRS_SQL = r"""
WITH w AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(text, '\w+')) AS word
        FROM documents)
  GROUP BY word
),
p AS (
  -- position range sized from the actual vocabulary (a fixed cap would
  -- silently drop pairs of very long tokens)
  SELECT word[i : i + 1] AS pair, cnt
  FROM w,
       (SELECT unnest(range(1, (SELECT max(length(word)) FROM w) + 1))
          AS i) i
  WHERE i < length(word)
),
c AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM p GROUP BY pair),
r AS (
  SELECT pair, cnt,
         row_number() OVER (ORDER BY cnt DESC, pair) AS rn
  FROM c
)
SELECT pair, cnt FROM r WHERE rn <= 20
"""


__all__ += [
    "incremental_dedup_new",
    "INCREMENTAL_DEDUP_NEW_SQL",
    "bpe_top_pairs",
    "BPE_TOP_PAIRS_SQL",
]


# --- PII redaction ------------------------------------------------------------

# Shared RE2 patterns: pyarrow.compute's regex kernels and DuckDB's regexp_*
# are BOTH RE2, so one pattern string gives bit-identical match semantics on
# the two engines (same reason the gazetteer restricts to ASCII \b terms).
PII_EMAIL_RE = r"[0-9a-z._%+-]+@[0-9a-z.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d-\d{3}-\d{4}"


def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrubbing for training-data curation →
    ``(doc_id, redacted, n_email, n_ip, n_phone)``: emails, IPv4 addresses
    and phone numbers are replaced by ``[EMAIL]`` / ``[IP]`` / ``[PHONE]``
    tags and counted.  The synthetic corpus text contains no PII, so the
    scored body is the document text plus deterministic doc_id-derived
    PII spans (email when ``doc_id%3 != 0``, IP when ``doc_id%2 == 0``,
    phone when ``doc_id%5 != 0``) built identically in SQL — this keeps
    the oracle non-vacuous (every pattern fires with varying counts)
    without external data.

    Pure vectorized map — arrow string-concat + three RE2
    replace/count kernels per batch, no shuffle, no Python per-row loop;
    the three patterns cannot overlap each other's matches, so counting
    on the pre-redaction body equals counting during sequential
    replacement.  At 100 TB this is an embarrassingly parallel scan."""
    import pyarrow.compute as pc

    ds = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        # no modulo kernel in this pyarrow — masks/remainders via numpy
        dn = did.to_numpy()
        ids = pc.cast(did, pa.string())
        email = pc.if_else(
            pa.array(dn % 3 != 0),
            pc.binary_join_element_wise(" contact user", ids, "@mail.example.com", ""),
            "",
        )
        ip = pc.if_else(
            pa.array(dn % 2 == 0),
            pc.binary_join_element_wise(
                " node 10.",
                pa.array((dn % 200).astype(str)),
                ".0.",
                pa.array((dn % 250).astype(str)),
                "",
            ),
            "",
        )
        phone = pc.if_else(
            pa.array(dn % 5 != 0),
            pc.binary_join_element_wise(
                " call +1-555-",
                pc.utf8_lpad(pa.array((dn % 10000).astype(str)), 4, "0"),
                "",
            ),
            "",
        )
        body = pc.binary_join_element_wise(batch["text"], email, ip, phone, "")
        red = pc.replace_substring_regex(body, PII_EMAIL_RE, "[EMAIL]")
        red = pc.replace_substring_regex(red, PII_IPV4_RE, "[IP]")
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "[PHONE]")
        return pa.table(
            {
                "doc_id": did,
                "redacted": red,
                "n_email": pc.cast(pc.count_substring_regex(body, PII_EMAIL_RE), pa.int64()),
                "n_ip": pc.cast(pc.count_substring_regex(body, PII_IPV4_RE), pa.int64()),
                "n_phone": pc.cast(pc.count_substring_regex(body, PII_PHONE_RE), pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


PII_REDACT_SQL = rf"""
WITH body AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com' ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' node 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 5 <> 0
                 THEN ' call +1-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS body
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(body,
         '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
         '{PII_IPV4_RE}', '[IP]', 'g'),
         '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted,
       CAST(length(regexp_extract_all(body, '{PII_EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(length(regexp_extract_all(body, '{PII_IPV4_RE}')) AS BIGINT) AS n_ip,
       CAST(length(regexp_extract_all(body, '{PII_PHONE_RE}')) AS BIGINT) AS n_phone
FROM body
"""


__all__ += ["pii_redact", "PII_REDACT_SQL"]


# --- unigram LM quality scoring -----------------------------------------------


def _unigram_model(
    sf_dir: str, vocab_k: int = 50_000
) -> "tuple[np.ndarray, np.ndarray, np.int64] | None":
    """Fit the corpus unigram model → ``(sorted_words, millibits, oov_mb)``
    (None if the corpus has no tokens).  One distributed count pass; only
    the top-``vocab_k`` rows cross to the driver (distributed sort+limit)."""
    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        toks = pc.split_pattern_regex(low, "[^0-9a-z_]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        w, c = np.unique(np.asarray(flat), return_counts=True)
        return pa.table(
            {"word": pa.array(w.astype(object)), "cnt": pa.array(c, type=pa.int64())}
        )

    counts_ds = bucketed_group_sum(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        keys=["word"],
        sum_cols={"cnt": "cnt"},
        driver_cap=2_000_000,
    )
    total_raw = counts_ds.sum("cnt")  # None on an empty/token-free corpus
    if not total_raw:
        return None
    total = int(total_raw)
    top = (
        counts_ds.sort(["cnt", "word"], descending=[True, False])
        .limit(vocab_k)
        .to_pandas()
    )
    words = np.sort(top["word"].to_numpy().astype(str))
    order = np.argsort(top["word"].to_numpy().astype(str), kind="stable")
    cnts = top["cnt"].to_numpy()[order].astype(np.float64)
    # round half away from zero == DuckDB round(); -log2(p) ≥ 0 always.
    # Residual cross-engine risk (documented, not bit-exact by proof):
    # log2 is NOT an IEEE correctly-rounded operation, so numpy's and
    # DuckDB's libm may differ by 1 ulp; if -log2(cnt/total)*1000 lands
    # within half an ulp of a .5 boundary the rounded millibit value can
    # differ by 1 between engines for that (cnt, total).  Per-doc sums are
    # exact integer adds of these per-word constants, so any divergence is
    # confined to such boundary words — none observed across the test SFs.
    mb = np.floor(-np.log2(cnts / total) * 1000.0 + 0.5).astype(np.int64)
    oov_mb = np.int64(np.floor(np.log2(float(total)) * 1000.0 + 0.5))
    return words, mb, oov_mb


def doc_unigram_logprob(
    sf_dir: str, vocab_k: int = 50_000
) -> "ray.data.Dataset":
    """Unigram language-model surprisal per document →
    ``(doc_id, n_tokens, total_millibits)`` — the classic corpus-level
    quality signal (KenLM-style filtering, reduced to the unigram term):
    documents whose tokens are improbable under the corpus unigram
    distribution score high.

    Two passes, both distributed: (1) corpus token counts via per-batch
    partial Counters + a small groupby-Sum (the ``vocab_count`` shape),
    of which only the top ``vocab_k`` entries (count desc, word asc) are
    broadcast — a BOUNDED model no matter the corpus size; out-of-vocab
    tokens score at the p = 1/total floor.  (2) a pure map: tokens per
    batch via one RE2 split, per-token surprisal by ``np.searchsorted``
    into the sorted broadcast vocab, per-document integer sums via
    ``np.add.reduceat``.  Surprisal is integer MILLIBITS
    (``round(-log2(cnt/total)*1000)``, half away from zero like DuckDB
    ``round``), so the per-doc sum is associative and parallelism-
    invariant; cross-engine agreement with the SQL twin holds up to the
    (data-dependent, never-observed) 1-ulp libm log2 boundary case
    documented in ``_unigram_model``."""
    import pyarrow.compute as pc

    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    model = _unigram_model(sf_dir, vocab_k)
    if model is None:  # empty/token-free corpus
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "total_millibits": pa.array([], type=pa.int64()),
                }
            )
        )
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        vocab, vmb, oov = ray.get(model_ref)
        low = pc.utf8_lower(batch["text"])
        toks = pc.split_pattern_regex(low, "[^0-9a-z_]+")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        keep = flat != ""
        flat = flat[keep]
        # per-doc offsets over the FILTERED token stream
        sizes = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(sizes)), sizes)[keep]
        pos = np.searchsorted(vocab, flat)
        pos_c = np.clip(pos, 0, len(vocab) - 1)
        hit = vocab[pos_c] == flat
        tok_mb = np.where(hit, vmb[pos_c], oov)
        n_tok = np.bincount(doc_idx, minlength=len(sizes)).astype(np.int64)
        tot_mb = np.bincount(doc_idx, weights=tok_mb, minlength=len(sizes)).astype(
            np.int64
        )
        nz = n_tok > 0  # docs with zero tokens drop (no tok rows in SQL)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(nz)),
                "n_tokens": pa.array(n_tok[nz], type=pa.int64()),
                "total_millibits": pa.array(tot_mb[nz], type=pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def make_unigram_logprob_sql(vocab_k: int = 50_000) -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
cnts AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
tot AS (SELECT sum(cnt) AS total FROM cnts),
vocab AS (SELECT w, cnt FROM cnts ORDER BY cnt DESC, w LIMIT {vocab_k}),
mb AS (
  SELECT w, CAST(round(-log2(cnt / total) * 1000) AS BIGINT) AS mb
  FROM vocab CROSS JOIN tot
),
oov AS (SELECT CAST(round(log2(total) * 1000) AS BIGINT) AS mb FROM tot)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(coalesce(mb.mb, (SELECT mb FROM oov))) AS BIGINT)
         AS total_millibits
FROM tok t LEFT JOIN mb ON mb.w = t.w
GROUP BY t.doc_id
"""


DOC_UNIGRAM_LOGPROB_SQL = make_unigram_logprob_sql()

__all__ += ["doc_unigram_logprob", "DOC_UNIGRAM_LOGPROB_SQL", "make_unigram_logprob_sql"]


def _bigram_model(
    sf_dir: str, vocab_k: int = 100_000
) -> "tuple[np.ndarray, np.ndarray, np.int64] | None":
    """Fit the corpus CONDITIONAL bigram model → ``(sorted_keys,
    millibits, oov_mb)`` where a key is ``w1 + ' ' + w2`` (tokens cannot
    contain spaces, so the join is injective) and millibits encode
    ``-log2(cnt(w1 w2) / cnt(w1 ·))`` — the true LM conditional, not the
    joint.  Bigrams never cross document boundaries.

    Distributed shape: (1) per-batch bigram Counters → bounded-bucket
    group sum (exact corpus counts); (2) ONE more bounded exchange
    re-keyed on ``w1`` only, so each group holds every continuation of
    its prefixes and computes prefix totals + conditional millibits
    locally; (3) a distributed sort+limit ships only the top ``vocab_k``
    rows (count desc, key asc) to the driver for broadcast.  OOV bigrams
    floor at ``p = 1/total`` exactly like the unigram model."""
    import zlib

    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        toks = pc.split_pattern_regex(low, "[^0-9a-z_]+")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        keep = flat != ""
        flat = flat[keep]
        sizes = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(sizes)), sizes)[keep]
        if len(flat) < 2:
            return pa.table(
                {"w1": pa.array([], type=pa.string()),
                 "w2": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        same_doc = doc_idx[1:] == doc_idx[:-1]
        w1, w2 = flat[:-1][same_doc], flat[1:][same_doc]
        keys, c = np.unique(
            np.char.add(np.char.add(w1, " "), w2), return_counts=True
        )
        parts = np.char.partition(keys, " ")
        return pa.table(
            {"w1": pa.array(parts[:, 0].astype(object)),
             "w2": pa.array(parts[:, 2].astype(object)),
             "cnt": pa.array(c, type=pa.int64())}
        )

    counts_ds = bucketed_group_sum(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        keys=["w1", "w2"],
        sum_cols={"cnt": "cnt"},
        driver_cap=None,
    )
    total_raw = counts_ds.sum("cnt")
    if not total_raw:
        return None
    total = int(total_raw)

    def add_prefix_bucket(batch: pa.Table) -> pa.Table:
        b = [
            zlib.crc32(w.encode("utf-8")) % 64
            for w in batch["w1"].to_pylist()
        ]
        return batch.append_column("pb", pa.array(b, type=pa.int64()))

    def conditional_mb(group: "pd.DataFrame") -> pa.Table:
        pcnt = group.groupby("w1", sort=False)["cnt"].transform("sum")
        mb = np.floor(
            -np.log2(group["cnt"].to_numpy() / pcnt.to_numpy()) * 1000.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "w1": pa.array(group["w1"], type=pa.string()),
                "w2": pa.array(group["w2"], type=pa.string()),
                "cnt": pa.array(group["cnt"].to_numpy(), type=pa.int64()),
                "mb": pa.array(mb, type=pa.int64()),
            }
        )

    with_mb = (
        counts_ds.map_batches(add_prefix_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(conditional_mb, batch_format="pandas")
    )
    top = (
        with_mb.sort(["cnt", "w1", "w2"], descending=[True, False, False])
        .limit(vocab_k)
        .to_pandas()
    )
    joined = (top["w1"].astype(str) + " " + top["w2"].astype(str)).to_numpy(
        dtype=object
    ).astype(str)
    order = np.argsort(joined, kind="stable")
    keys = joined[order]
    mbs = top["mb"].to_numpy()[order].astype(np.int64)
    oov_mb = np.int64(np.floor(np.log2(float(total)) * 1000.0 + 0.5))
    return keys, mbs, oov_mb


def doc_bigram_logprob(
    sf_dir: str, vocab_k: int = 100_000
) -> "ray.data.Dataset":
    """Conditional-bigram language-model surprisal per document →
    ``(doc_id, n_bigrams, total_millibits)`` — the KenLM-style CCNet
    quality filter one order above :func:`doc_unigram_logprob`: each
    within-document bigram scores ``-log2 p(w2|w1)`` millibits under the
    corpus model (top ``vocab_k`` bigrams broadcast; OOV at the
    ``1/total`` floor), and the per-doc integer sum is associative,
    so any batch layout produces the same totals.  Docs with fewer than
    two tokens emit no row (no bigram rows in the SQL twin either)."""
    import pyarrow.compute as pc

    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    model = _bigram_model(sf_dir, vocab_k)
    if model is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "total_millibits": pa.array([], type=pa.int64()),
                }
            )
        )
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        vocab, vmb, oov = ray.get(model_ref)
        low = pc.utf8_lower(batch["text"])
        toks = pc.split_pattern_regex(low, "[^0-9a-z_]+")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        keep = flat != ""
        flat = flat[keep]
        sizes = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(sizes)), sizes)[keep]
        n_bg = np.zeros(len(sizes), dtype=np.int64)
        tot_mb = np.zeros(len(sizes), dtype=np.int64)
        if len(flat) >= 2:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            bg_doc = doc_idx[:-1][same_doc]
            bkeys = np.char.add(
                np.char.add(flat[:-1][same_doc], " "), flat[1:][same_doc]
            )
            pos = np.searchsorted(vocab, bkeys)
            pos_c = np.clip(pos, 0, len(vocab) - 1)
            hit = (vocab[pos_c] == bkeys) if len(vocab) else np.zeros(
                len(bkeys), dtype=bool
            )
            bg_mb = np.where(hit, vmb[pos_c], oov)
            n_bg = np.bincount(bg_doc, minlength=len(sizes)).astype(np.int64)
            tot_mb = np.bincount(
                bg_doc, weights=bg_mb, minlength=len(sizes)
            ).astype(np.int64)
        nz = n_bg > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(nz)),
                "n_bigrams": pa.array(n_bg[nz], type=pa.int64()),
                "total_millibits": pa.array(tot_mb[nz], type=pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def make_bigram_logprob_sql(vocab_k: int = 100_000) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS l
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i])) AS w1,
         unnest(list_transform(range(1, len(l)), i -> l[i + 1])) AS w2
  FROM t
),
cnts AS (SELECT w1, w2, count(*) AS cnt FROM g GROUP BY w1, w2),
pfx AS (SELECT w1, sum(cnt) AS pcnt FROM cnts GROUP BY w1),
tot AS (SELECT sum(cnt) AS total FROM cnts),
vocab AS (
  SELECT c.w1, c.w2, c.cnt, p.pcnt
  FROM cnts c JOIN pfx p USING (w1)
  ORDER BY c.cnt DESC, c.w1, c.w2 LIMIT {vocab_k}
),
mb AS (
  SELECT w1, w2, CAST(round(-log2(cnt / pcnt) * 1000) AS BIGINT) AS mb
  FROM vocab
),
oov AS (SELECT CAST(round(log2(total) * 1000) AS BIGINT) AS mb FROM tot)
SELECT g.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(coalesce(mb.mb, (SELECT mb FROM oov))) AS BIGINT)
         AS total_millibits
FROM g LEFT JOIN mb ON mb.w1 = g.w1 AND mb.w2 = g.w2
GROUP BY g.doc_id
"""


DOC_BIGRAM_LOGPROB_SQL = make_bigram_logprob_sql()

__all__ += ["doc_bigram_logprob", "DOC_BIGRAM_LOGPROB_SQL", "make_bigram_logprob_sql"]


# --- end-to-end curation verdict ----------------------------------------------


def curated_documents(
    sf_dir: str, surprisal_thr_mb: int = 5_100, dup_threshold: float = 0.8
) -> "ray.data.Dataset":
    """The APPLY-side composite: one verdict row per document →
    ``(doc_id, reason_mask, keep)`` fusing the four curation signals a
    production LM-data pipeline runs together —

    - bit 1: Gopher quality-rule violation (``quality_filter`` flags ≠ 0)
    - bit 2: non-canonical MinHash-LSH near-dup cluster member
    - bit 4: benchmark contamination (shares eval n-grams)
    - bit 8: unigram surprisal above ``surprisal_thr_mb`` millibits/token
      (integer cross-multiplied — no division)

    ``keep = 1`` ⟺ mask 0.  Scan economy at 100 TB: the three per-doc
    text signals (quality, contamination, surprisal) are FUSED into one
    map_batches pass that tokenizes each document ONCE — so the whole
    verdict costs 3 corpus scans (unigram count pass, fused signal pass,
    MinHash-LSH pass) instead of one per signal — and fusion adds no new
    all-to-all beyond one bounded group-sum: the fused pass emits one
    ``(doc_id, bits)`` row per doc, the near-dup membership emits sparse
    ``(doc_id, 2)`` partials, and ``bucketed_group_sum`` ORs them (bits
    are disjoint, so sum == bitwise-or).  Semantics are pinned to the
    standalone component operators by test and by the composed-CTE SQL
    twin."""
    import pyarrow.compute as pc

    from ner_funtool_ray.stages.dedup import minhash_lsh_clusters
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    thr = int(surprisal_thr_mb)
    model = _unigram_model(sf_dir)
    model_ref = ray.put(model)  # None on a token-free corpus (bit 8 never fires)
    bench_ids, bench_grams = _benchmark_gram_set(sf_dir)
    bench_ref = ray.put((bench_ids, bench_grams))
    stop = frozenset(_STOPWORDS)

    docs = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fused(batch: pa.Table) -> pa.Table:
        mdl = ray.get(model_ref)
        bid, bg = ray.get(bench_ref)
        doc_ids = batch["doc_id"].to_pylist()
        tok_lists = [
            _WORD_RE.findall((txt or "").lower())
            for txt in batch["text"].to_pylist()
        ]
        out_m = np.zeros(len(doc_ids), dtype=np.int64)
        for i, (d, toks) in enumerate(zip(doc_ids, tok_lists)):
            n = len(toks)
            # bit 1 — Gopher quality rules (quality_filter semantics)
            if n:
                uniq, cnt = np.unique(
                    np.array(toks, dtype=object), return_counts=True
                )
                nd, mx = len(uniq), int(cnt.max())
                has_stop = any(w in stop for w in uniq)
            else:
                nd, mx, has_stop = 0, 0, False
            if (
                n < _MIN_WORDS
                or n > _MAX_WORDS
                or nd * 2 < n
                or mx * 5 > n
                or not has_stop
            ):
                out_m[i] |= 1
            # bit 4 — contamination (benchmark docs themselves excluded)
            if d not in bid and any(g in bg for g in _grams(toks, 4)):
                out_m[i] |= 4
        # bit 8 — unigram surprisal above thr millibits/token, computed
        # batch-vectorized: ONE flatten + searchsorted + segment-sum
        if mdl is not None:
            words, vmb, oov = mdl
            sizes = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            if int(sizes.sum()):
                flat = np.array(
                    [w for t in tok_lists for w in t], dtype=str
                )
                doc_idx = np.repeat(np.arange(len(sizes)), sizes)
                pos = np.clip(np.searchsorted(words, flat), 0, len(words) - 1)
                hit = words[pos] == flat
                tok_mb = np.where(hit, vmb[pos], oov)
                tot = np.bincount(
                    doc_idx, weights=tok_mb, minlength=len(sizes)
                ).astype(np.int64)
                out_m |= np.where((sizes > 0) & (tot > thr * sizes), 8, 0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "m": pa.array(out_m),
            }
        )

    signals = docs.map_batches(fused, batch_format="pyarrow")
    dup = minhash_lsh_clusters(docs, threshold=dup_threshold).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "m": pc.multiply(
                    pc.cast(pc.not_equal(b["doc_id"], b["cluster_id"]), pa.int64()),
                    2,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    mask = bucketed_group_sum(
        signals.union(dup),
        keys=["doc_id"],
        sum_cols={"m": "m"},
        driver_cap=2_000_000,
    )
    return mask.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "reason_mask": b["m"],
                "keep": pc.cast(pc.equal(b["m"], 0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def make_curated_sql(
    clusters_sql: str, surprisal_thr_mb: int = 5_100
) -> str:
    return f"""
WITH qf AS ({QUALITY_FILTER_SQL}),
cl AS ({clusters_sql}),
ct AS ({make_contamination_sql()}),
lm AS ({DOC_UNIGRAM_LOGPROB_SQL}),
m AS (
  SELECT d.doc_id,
         (CASE WHEN qf.flags > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN cl2.doc_id IS NOT NULL THEN 2 ELSE 0 END)
       + (CASE WHEN ct.doc_id IS NOT NULL AND ct.n_shared > 0
               THEN 4 ELSE 0 END)
       + (CASE WHEN lm.total_millibits > {int(surprisal_thr_mb)} * lm.n_tokens
               THEN 8 ELSE 0 END) AS reason_mask
  FROM documents d
  LEFT JOIN qf ON qf.doc_id = d.doc_id
  LEFT JOIN (SELECT DISTINCT doc_id FROM cl WHERE doc_id <> cluster_id) cl2
         ON cl2.doc_id = d.doc_id
  LEFT JOIN ct ON ct.doc_id = d.doc_id
  LEFT JOIN lm ON lm.doc_id = d.doc_id
)
SELECT doc_id, CAST(reason_mask AS BIGINT) AS reason_mask,
       CAST(CASE WHEN reason_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


__all__ += ["curated_documents", "make_curated_sql"]


# --- iterative BPE merge-table trainer ----------------------------------------

_BPE_SEP = "\x01"


def bpe_learn_merges(
    sf_dir: str, k: int = 8, batch: int = 16, stats: dict | None = None
) -> "ray.data.Dataset":
    """Tokenizer induction, the full iterative loop → the first ``k`` BPE
    merges ``(rank, left_tok, right_tok, cnt)``.  ``bpe_top_pairs`` is
    round 1 of this; each round counts adjacent-symbol pairs over the
    CURRENT segmentations (per-position counts, Sennrich's statistic),
    picks winners by (count DESC, pair lexicographic), and applies each
    merge greedily left-to-right (non-overlapping) — exactly what
    ``str.replace`` and DuckDB ``replace`` both do, which is what makes
    the unrolled SQL twin hash-exact.

    **Batched rounds, provably sequential-equivalent.**  One count
    exchange per merge serializes at large ``k`` (k driver round-trips),
    so each exchange accepts up to ``batch`` winners at once: the maximal
    PREFIX of the (count DESC, l, r)-sorted candidates that is pairwise
    token-disjoint (tracking each accepted pair's l, r AND merged token
    l+r), stopped at the first conflict and shrunk until the last
    accepted count is STRICTLY above the first non-accepted candidate's.
    Why this equals the one-at-a-time greedy: a disjoint merge can't
    change another accepted pair's count or occurrences; every pair a
    prior merge CAN affect shares a token with it, so it sits at or below
    the stop boundary, and any NEW pair (x, l+r) is bounded by its parent
    (x, l)'s count — also ≤ boundary < every accepted count, so no new or
    affected pair can outrank a later accepted winner under the sequential
    tie-break either.  A tie at the boundary falls back to the always-safe
    single top-1.  ``stats['rounds']`` (when a dict is passed) reports the
    exchange count — ≈ k/batch on natural corpora.

    Scale plan: the corpus is touched ONCE (the ``vocab_count``
    exchange); every round then runs over the VOCABULARY dataset —
    segmentations as \\x01-joined strings, re-pinned per round
    (vocab-bounded materializations, never corpus-sized).  Pair counts
    ride a bounded-bucket group sum (pair domain ≤ current-symbol-set²);
    only ``batch``+1 candidate rows cross to the driver per exchange."""
    from ner_funtool_ray.pipelines.textops import vocab_count
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    def to_segs(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        return pa.table(
            {
                "seg": pa.array(
                    ["".join(_BPE_SEP + c for c in w) for w in words],
                    type=pa.string(),
                ),
                "cnt": t["cnt"].cast(pa.int64()),
            }
        )

    def pair_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        acc: Counter = Counter()
        for s, c in zip(t["seg"].to_pylist(), t["cnt"].to_pylist()):
            toks = s.split(_BPE_SEP)[1:]
            ci = int(c)
            for a, b in zip(toks, toks[1:]):
                acc[(a, b)] += ci
        return pa.table(
            {
                "l": pa.array([p[0] for p in acc], type=pa.string()),
                "r": pa.array([p[1] for p in acc], type=pa.string()),
                "c": pa.array(
                    np.fromiter(acc.values(), dtype=np.int64, count=len(acc))
                ),
            }
        )

    segs = (
        vocab_count(sf_dir, min_count=1)
        .map_batches(to_segs, batch_format="pyarrow")
        .materialize()
    )
    merges: list[tuple[int, str, str, int]] = []
    window = max(1, int(batch))
    rounds = 0
    while len(merges) < k:
        counts = bucketed_group_sum(
            segs.map_batches(pair_partial, batch_format="pyarrow"),
            keys=["l", "r"],
            sum_cols={"c": "c"},
            count_col=None,
        )
        top = (
            counts.sort(["c", "l", "r"], descending=[True, False, False])
            .limit(window + 1)
            .to_pandas()
        )
        rounds += 1
        if top.empty:
            break
        # maximal token-disjoint prefix, stopped at the first conflict /
        # window / k, then shrunk to a strict boundary (see docstring)
        accepted: list[tuple[str, str, int]] = []
        blocked: set[str] = set()
        boundary: int | None = None
        for lt, rt, c in zip(top["l"], top["r"], top["c"]):
            lt, rt, c = str(lt), str(rt), int(c)
            if (
                len(accepted) >= window
                or len(merges) + len(accepted) >= k
                or lt in blocked
                or rt in blocked
            ):
                boundary = c
                break
            accepted.append((lt, rt, c))
            blocked |= {lt, rt, lt + rt}
        if boundary is not None:
            while accepted and accepted[-1][2] <= boundary:
                accepted.pop()
            if not accepted:  # tie at the very top: single merge is safe
                accepted = [
                    (str(top["l"][0]), str(top["r"][0]), int(top["c"][0]))
                ]
        for lt, rt, c in accepted:
            merges.append((len(merges) + 1, lt, rt, c))
        reps = tuple(
            (_BPE_SEP + lt + _BPE_SEP + rt, _BPE_SEP + lt + rt)
            for lt, rt, _ in accepted
        )

        def apply(t: pa.Table, reps=reps) -> pa.Table:
            out = []
            for s in t["seg"].to_pylist():
                for pat, rep in reps:  # rank order == sequential order
                    s = s.replace(pat, rep)
                out.append(s)
            return pa.table(
                {
                    "seg": pa.array(out, type=pa.string()),
                    "cnt": t["cnt"],
                }
            )

        segs = segs.map_batches(apply, batch_format="pyarrow").materialize()
    if stats is not None:
        stats["rounds"] = rounds

    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(
                    [m[0] for m in merges], type=pa.int64()
                ),
                "left_tok": pa.array(
                    [m[1] for m in merges], type=pa.string()
                ),
                "right_tok": pa.array(
                    [m[2] for m in merges], type=pa.string()
                ),
                "cnt": pa.array([m[3] for m in merges], type=pa.int64()),
            }
        )
    )


def make_bpe_merges_sql(k: int = 8) -> str:
    """Unrolled-CTE twin of :func:`bpe_learn_merges`: round ``i`` picks its
    winner from the round-``i`` segmentations and rewrites them for round
    ``i+1`` via the same greedy non-overlapping ``replace``.  ``chr(2)``
    coalesce keeps exhausted rounds inert (no pair left → no row)."""
    parts = [
        r"""WITH w1 AS MATERIALIZED (
  SELECT regexp_replace(word, '(.)', chr(1) || '\1', 'g') AS seg, cnt
  FROM (SELECT word, count(*)::BIGINT AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '\w+')) AS word
              FROM documents)
        GROUP BY word)
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
p{i} AS MATERIALIZED (SELECT toks[j] AS l, toks[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
       FROM (SELECT string_split(seg, chr(1))[2:] AS toks, cnt FROM w{i}),
            unnest(generate_series(1, len(toks) - 1)) AS u(j)
       GROUP BY l, r),
m{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)"""
        )
        if i < k:
            parts.append(
                f""",
w{i + 1} AS MATERIALIZED (SELECT replace(seg,
         coalesce((SELECT chr(1) || l || chr(1) || r FROM m{i}), chr(2)),
         coalesce((SELECT chr(1) || l || r FROM m{i}), chr(2))) AS seg, cnt
       FROM w{i})"""
            )
    sel = "\nUNION ALL ".join(
        f"SELECT {i}::BIGINT AS rank, l AS left_tok, r AS right_tok, c AS cnt"
        f" FROM m{i}"
        for i in range(1, k + 1)
    )
    parts.append("\n" + sel)
    return "".join(parts)


__all__ += ["bpe_learn_merges", "make_bpe_merges_sql"]
