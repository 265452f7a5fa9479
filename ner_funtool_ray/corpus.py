"""Deterministic source-code corpus (north-rule input table).

The engine's primary input is a Parquet table of source files::

    repo: string, path: string, commit: string, lang: string, content: string

Two deterministic constructions are provided:

- :func:`corpus_from_documents` — derive the table from a ``documents``
  parquet table (driver testdata ``doc_id,text,lang,source,n_chars``) with a
  pure, SQL-expressible mapping, so DuckDB oracles can reproduce it exactly.
- :func:`synthesize_corpus` — seed-fixed generator planting known entities
  (identifiers, import targets, Chinese BMES spans) per FIXTURES.md F1, used
  by unit tests; includes long (> max_seq) rows, empty rows and a Zipf-skewed
  hot repo to exercise truncation / skew paths.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_funtool_ray.sources.io import read_parquet_auto

# SQL twin of corpus_from_documents (kept adjacent so they evolve together).
CORPUS_FROM_DOCUMENTS_SQL = """
    SELECT
        'repos/' || source                         AS repo,
        'src/doc_' || doc_id || '.txt'             AS path,
        substr(sha256('commit:' || doc_id), 1, 40) AS "commit",
        lang                                       AS lang,
        text                                       AS content
    FROM documents
"""


def _derive_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    doc_id_str = pc.cast(doc_id, pa.string())
    repo = pc.binary_join_element_wise("repos/", batch["source"], "")
    path = pc.binary_join_element_wise("src/doc_", doc_id_str, ".txt", "")
    commit = pa.array(
        [
            hashlib.sha256(f"commit:{d}".encode()).hexdigest()[:40]
            for d in doc_id.to_pylist()
        ],
        type=pa.string(),
    )
    return pa.table(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def corpus_from_documents(
    sf_dir: str,
    rows_per_block: int | None = None,
    doc_parity: int | None = None,
) -> "ray.data.Dataset":
    """``documents.parquet`` → the (repo, path, commit, lang, content) table.

    Pure per-row mapping (no shuffle); matches CORPUS_FROM_DOCUMENTS_SQL.

    ``rows_per_block`` controls the READ split (no shuffle, scale-safe —
    big tables defer to Ray's target-block-size splitting regardless).
    Expensive fused consumers (the model actor pools) pass a small value
    so the block count, which gates an actor pool's task parallelism,
    exceeds the pool size; cheap aggregates keep the default coarse
    split where per-block scheduling overhead dominates.

    ``doc_parity`` keeps only docs with ``doc_id % 2 == doc_parity`` —
    the deterministic corpus split the incremental-maintenance queries
    use as their "existing vs newly-arrived" halves (SQL twin: a WHERE
    clause).  The filter runs inside the read's map stage, before any
    derived column is built."""
    kwargs = {}
    if rows_per_block is not None:
        kwargs["rows_per_block"] = rows_per_block
        # the mid-table floor (64 blocks) would recoalesce the fine split
        kwargs["min_rows_per_block"] = rows_per_block
        kwargs["max_blocks"] = 1024
        kwargs["mid_block_cap"] = 1024
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        **kwargs,
    )
    if doc_parity is None:
        return ds.map_batches(_derive_batch, batch_format="pyarrow")
    parity = int(doc_parity)

    def filter_and_derive(batch: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.bit_wise_and(pc.cast(batch["doc_id"], pa.int64()), 1), parity
        )
        return _derive_batch(batch.filter(keep))

    return ds.map_batches(filter_and_derive, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synthetic fixture corpus (FIXTURES.md F1) — tests only, seed-fixed.
# ---------------------------------------------------------------------------

# Chinese sentences with known BMES spans (surface, type, char offsets are
# fixed by construction; mirrors the reference's bundled clue-style corpora).
_ZH_TEMPLATES = [
    # (text, [(surface, type, start, end_inclusive)])
    ("中国首都是北京。", [("中国", "LOC", 0, 1), ("北京", "LOC", 5, 6)]),
    ("张三在清华大学工作。", [("张三", "PER", 0, 1), ("清华大学", "ORG", 2, 5)]),
    ("阿里巴巴位于杭州。", [("阿里巴巴", "ORG", 0, 3), ("杭州", "LOC", 6, 7)]),
]

def synthesize_tagged_corpus(n_rows: int = 200, seed: int = 42) -> pa.Table:
    """Seed-fixed BMES-tagged eval corpus (FIXTURES.md F2): one row per
    sentence, (doc_id, sent_id, chars: str, gold_tags: list<string>) with
    gold spans planted from the templates (exact by construction).

    Uses S- singletons never (templates are ≥2 chars → B/M/E); O elsewhere.
    """
    rng = np.random.default_rng(seed)
    doc_ids, sent_ids, chars_col, tags_col = [], [], [], []
    for i in range(n_rows):
        text, spans = _ZH_TEMPLATES[int(rng.integers(0, len(_ZH_TEMPLATES)))]
        tags = ["O"] * len(text)
        for surface, typ, s, e in spans:
            if s == e:
                tags[s] = f"S-{typ}"
            else:
                tags[s] = f"B-{typ}"
                for j in range(s + 1, e):
                    tags[j] = f"M-{typ}"
                tags[e] = f"E-{typ}"
        doc_ids.append(i)
        sent_ids.append(0)
        chars_col.append(text)
        tags_col.append(tags)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "sent_id": pa.array(sent_ids, type=pa.int64()),
            "chars": pa.array(chars_col, type=pa.string()),
            "gold_tags": pa.array(tags_col, type=pa.list_(pa.string())),
        }
    )


_CODE_TEMPLATE = (
    "import {imp}\n"
    "def handler_{k}(request):\n"
    "    client = {imp}.Client()\n"
    "    return client.fetch('{imp}', {k})\n"
)

_IMPORTS = ["numpy", "pandas", "pyarrow", "requests", "flask", "torch"]
_LANGS = ["py", "java", "go", "js", "zh-doc"]


def synthesize_corpus(n_rows: int = 1000, seed: int = 42) -> pa.Table:
    """Seed-fixed (repo, path, commit, lang, content) fixture table.

    Includes: zh-doc rows with plantable BMES entities, code rows with import
    targets, empty rows, a few very long rows, and a hot repo holding ~20% of
    rows (skew / salting path, FIXTURES.md F8).
    """
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        hot = rng.random() < 0.2
        org = 0 if hot else int(rng.integers(1, 8))
        rep = 0 if hot else int(rng.integers(0, 5))
        repo = f"org{org}/repo{rep}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        if i % 97 == 0:
            content = ""  # empty-content edge case
        elif i % 89 == 0:
            # very long row (> max_seq truncation path)
            content = "很长的句子" * 200
        elif lang == "zh-doc":
            t1 = _ZH_TEMPLATES[int(rng.integers(0, len(_ZH_TEMPLATES)))][0]
            t2 = _ZH_TEMPLATES[int(rng.integers(0, len(_ZH_TEMPLATES)))][0]
            content = t1 + t2
        else:
            imp = _IMPORTS[int(rng.integers(0, len(_IMPORTS)))]
            content = _CODE_TEMPLATE.format(imp=imp, k=i)
        ext = "txt" if lang == "zh-doc" else lang
        path = f"src/m{int(rng.integers(0, 20))}/f{i}.{ext}"
        commit = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )
