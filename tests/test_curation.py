"""Dedup apply step, decontamination, and the quality-rule bitmask."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_dedup_corpus_paths_agree(ray_session):
    from ner_funtool_ray.pipelines.curation import minhash_dedup_corpus

    fast = (
        minhash_dedup_corpus(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    slow = (
        minhash_dedup_corpus(SF_DIR, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
    # survivors plus dropped members partition the corpus
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert len(fast) < len(docs)  # the synthetic corpus has planted dups
    assert fast["doc_id"].is_unique
    assert set(fast.loc[fast["had_dups"] == 1, "doc_id"]).issubset(
        set(fast["doc_id"])
    )


def test_minhash_dedup_corpus_drops_cluster_members(ray_session):
    from ner_funtool_ray.pipelines.curation import minhash_dedup_corpus
    from ner_funtool_ray.sources.io import read_parquet_auto
    from ner_funtool_ray.stages.dedup import minhash_lsh_clusters

    surv = set(minhash_dedup_corpus(SF_DIR).to_pandas()["doc_id"])
    docs = read_parquet_auto(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    cl = minhash_lsh_clusters(docs, threshold=0.8).to_pandas()
    for _, r in cl.iterrows():
        if r["doc_id"] == r["cluster_id"]:
            assert r["doc_id"] in surv  # representative kept
        else:
            assert r["doc_id"] not in surv  # member dropped


def test_contamination_planted(ray_session, tmp_path):
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.curation import benchmark_contamination

    # choose ids by md5 rank so EXACTLY one doc is the benchmark: the
    # min-rank id gets the benchmark text, the two max-rank ids the rest
    cand = [str(i) for i in range(64)]
    ranks = (md5_number_lower_batch(cand) % np.uint64(100)).astype(int)
    order = np.argsort(ranks, kind="stable")
    bench_id, c1, c2 = int(order[0]), int(order[-1]), int(order[-2])
    pct = int(ranks[order[0]]) + 1
    assert ranks[c1] >= pct and ranks[c2] >= pct
    pq.write_table(
        pa.table(
            {
                "doc_id": [bench_id, c1, c2],
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "alpha beta gamma delta unrelated words here now",
                    "totally different text with no overlap at all",
                ],
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = benchmark_contamination(
        str(tmp_path), n=4, bench_pct=pct
    ).to_pandas()
    # doc c1 shares exactly one distinct 4-gram: "alpha beta gamma delta"
    assert dict(zip(df["doc_id"], df["n_shared"])) == {c1: 1}


def test_contamination_guard(ray_session):
    from ner_funtool_ray.pipelines.curation import benchmark_contamination

    with pytest.raises(ValueError, match="broadcast_limit"):
        benchmark_contamination(SF_DIR, broadcast_limit=1)


def test_quality_filter_rules(ray_session, tmp_path):
    from ner_funtool_ray.pipelines.curation import quality_filter

    docs = [
        # clean: 20+ diverse words incl. stopword
        "the quick brown fox jumps over one lazy dog while many other "
        "animals watch from nearby hills during a bright morning walk",
        # short (bit 1) and no stopword (bit 8)
        "just three words",
        # repetitive: dominance (bit 4) + low TTR (bit 2) + stopword 'the'
        "the spam spam spam spam spam spam spam spam spam spam spam "
        "spam spam spam spam spam spam spam spam spam spam spam spam",
    ]
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": docs}),
        tmp_path / "documents.parquet",
    )
    df = (
        quality_filter(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "flags"] == 0 and df.loc[1, "keep"] == 1
    assert df.loc[2, "flags"] & 1 and df.loc[2, "flags"] & 8
    assert df.loc[3, "flags"] & 2 and df.loc[3, "flags"] & 4
    assert (df.loc[[2, 3], "keep"] == 0).all()


def test_quality_filter_corpus_not_degenerate(ray_session):
    from ner_funtool_ray.pipelines.curation import quality_filter

    df = quality_filter(SF_DIR).to_pandas()
    assert len(df) == 500
    # both kept and rejected docs exist on the synthetic corpus
    assert 0 < df["keep"].sum() < len(df)


def test_doc_token_bins_partition_invariance(ray_session):
    from ner_funtool_ray.pipelines.curation import doc_token_bins

    a = (
        doc_token_bins(SF_DIR, capacity=256, n_partitions=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        doc_token_bins(SF_DIR, capacity=256, n_partitions=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # bins start at 0, never decrease along doc order, and the bin of a
    # doc equals its exclusive running sum // capacity
    assert a["bin_id"].iloc[0] == 0
    assert a["bin_id"].is_monotonic_increasing
    run = a["n_tokens"].cumsum() - a["n_tokens"]
    assert (a["bin_id"] == run // 256).all()


def test_tfidf_search_matches_bruteforce(ray_session):
    import re as _re

    from ner_funtool_ray.pipelines.curation import tfidf_search

    got = tfidf_search(SF_DIR, terms=("data", "join"), k=5).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    word = _re.compile(r"[0-9a-z_]+")
    toks = {r.doc_id: word.findall(r.text.lower()) for r in docs.itertuples()}
    n = len(docs)
    scores = {}
    for t in ("data", "join"):
        df = sum(1 for v in toks.values() if t in v)
        idf = (n * 1_000_000) // df
        for d, v in toks.items():
            tf = sum(1 for w in v if w == t)
            if tf:
                scores[d] = scores.get(d, 0) + tf * idf
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["doc_id"], got["score"])) == exp


def test_bm25_search_matches_bruteforce(ray_session):
    import re as _re

    from ner_funtool_ray.pipelines.curation import bm25_search

    got = bm25_search(SF_DIR, terms=("data", "join"), k=5).to_pandas()
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    word = _re.compile(r"[0-9a-z_]+")
    toks = {r.doc_id: word.findall(r.text.lower()) for r in docs.itertuples()}
    N = len(docs)
    T = sum(len(v) for v in toks.values())
    K, B = 12, 3
    scores = {}
    for t in ("data", "join"):
        df = sum(1 for v in toks.values() if t in v)
        idf = (N * 1_000_000) // df
        for d, v in toks.items():
            tf = sum(1 for w in v if w == t)
            if tf:
                dl = len(v)
                tfnorm = (4 * (10 + K) * tf * T * 1_000_000) // (
                    40 * T * tf + K * ((4 - B) * T + B * dl * N)
                )
                scores[d] = scores.get(d, 0) + (idf * tfnorm) // 1_000_000
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["doc_id"], got["score"])) == exp


def test_bm25_prefers_shorter_doc_at_equal_tf(ray_session, tmp_path):
    # BM25's length normalization: same tf, shorter doc scores higher —
    # the behavior that distinguishes it from the raw tf-idf ranking
    texts = [
        "join filler " + "pad " * 50,   # tf=1, long
        "join here",                     # tf=1, short
        "nothing relevant at all",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    from ner_funtool_ray.pipelines.curation import bm25_search

    got = bm25_search(str(tmp_path), terms=("join",), k=3).to_pandas()
    assert list(got["doc_id"]) == [2, 1]  # short doc first, non-hit absent
    assert got["score"].iloc[0] > got["score"].iloc[1]
