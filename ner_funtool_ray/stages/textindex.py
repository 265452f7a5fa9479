"""Inverted text index as partitioned parquet: build once, prune at the
read on query — the keyword-search sibling of the IVF vector index
(stages/similarity.py:build_ivf_index).

Layout: distinct (term, doc_id) postings, hash-sharded by term into
``shard=<s>`` directories.  A query touches only its terms' shards, so
the read is posting-sized, not corpus-sized.  Because every document is
one row (a doc never spans batches), per-batch distinct pairs are
GLOBALLY distinct — the build is a single embarrassingly-parallel
map_batches + partitioned write, no shuffle anywhere.

Tokenization is the repo-wide ``\\w+`` recipe (doc_top_terms /
vocab_count), so the DuckDB twin's ``regexp_extract_all`` is
semantics-identical on this ASCII-word corpus.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas

try:
    import polars as pl
except ImportError:  # pragma: no cover - polars is baked into the sandbox
    pl = None


def _term_shard(terms, n_shards: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % n_shards for t in terms),
        dtype=np.int64,
        count=len(terms),
    )


def _postings(batch: pa.Table) -> pd.DataFrame:
    """Distinct (doc_id, term) pairs for one batch of documents."""
    if pl is not None:
        t = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(
                        batch["doc_id"].combine_chunks().cast(pa.int64())
                    ),
                    "term": pl.from_arrow(
                        batch["text"].combine_chunks()
                    ).str.extract_all(r"\w+"),
                }
            )
            .explode("term")
            .unique()
            .to_pandas()
        )
    else:
        from ner_funtool_ray.functions.text import tokenize_words

        rows = {
            (d, term)
            for d, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
            for term in set(tokenize_words(txt or ""))
        }
        t = pd.DataFrame(sorted(rows), columns=["doc_id", "term"])
    t = t.dropna(subset=["term"])
    t["doc_id"] = t["doc_id"].astype(np.int64)
    return t


def build_text_index(sf_dir: str, out_dir: str, n_shards: int = 32) -> str:
    """Tokenize ``documents`` and write the sharded posting lists.
    ``out_dir`` must be fresh — parquet writes APPEND into existing
    partition directories."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def emit(batch: pa.Table) -> pa.Table:
        t = _postings(batch)
        t["shard"] = _term_shard(t["term"].tolist(), n_shards)
        return pa_from_pandas(t, preserve_index=False)

    ds.map_batches(emit, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard"]
    )
    return out_dir


def query_text_index(
    index_dir: str,
    terms: list[str],
    mode: str = "and",
    n_shards: int = 32,
    driver_cap: int | None = 5_000_000,
) -> "ray.data.Dataset":
    """Documents matching the query terms (``and`` = every term, ``or`` =
    any) as a ``doc_id`` dataset.  Reads ONLY the query terms' shard
    directories; the per-doc match count is exact because postings are
    distinct by construction, and it rides a bounded-bucket group sum
    (driver-merged below ``driver_cap`` — a few terms' postings are tiny
    next to the corpus)."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    terms = sorted(set(terms))
    if not terms:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64())})
        )
    shards = sorted(set(_term_shard(terms, n_shards).tolist()))
    # read_parquet treats a LIST of paths as files — expand each shard dir
    paths = [
        os.path.join(d, f)
        for d in (os.path.join(index_dir, f"shard={s}") for s in shards)
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64())})
        )
    ds = read_parquet_auto(paths, columns=["doc_id", "term"])
    term_set = pa.array(terms, type=pa.string())

    def hit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = batch.filter(pc.is_in(batch["term"], value_set=term_set))
        return pa.table({"doc_id": m["doc_id"].cast(pa.int64())})

    counts = bucketed_group_sum(
        ds.map_batches(hit, batch_format="pyarrow"),
        keys=["doc_id"],
        count_col="n_terms",
        driver_cap=driver_cap,
    )
    need = len(terms) if mode == "and" else 1

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch.filter(
                    pc.greater_equal(batch["n_terms"], need)
                )["doc_id"]
            }
        )

    return counts.map_batches(keep, batch_format="pyarrow")


def make_text_search_sql(terms: list[str], mode: str = "and") -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    need = len(set(terms)) if mode == "and" else 1
    return rf"""
WITH w AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\w+')) AS term
    FROM documents
  )
)
SELECT doc_id FROM w WHERE term IN ({quoted})
GROUP BY doc_id HAVING count(*) >= {need}
"""


__all__ = [
    "build_text_index",
    "query_text_index",
    "make_text_search_sql",
]
