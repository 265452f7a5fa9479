"""Tests for the round-3 curation additions: PII redaction, unigram-LM
document scoring, and the Q15 top-supplier shape.  DuckDB-twin equality is
covered by the oracle harness; these tests pin the semantics with
brute-force / invariant checks."""

import re

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_pii_redact_removes_every_pattern():
    from ner_funtool_ray.pipelines.curation import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_redact,
    )

    df = pii_redact(SF).to_pandas()
    assert len(df) == 500
    # nothing PII-shaped survives redaction
    for pat in (PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE):
        r = re.compile(pat)
        assert not df["redacted"].map(lambda s: bool(r.search(s))).any()
    # the doc_id-derived spans fire with the designed cadence
    assert (df["n_email"].to_numpy() == (df["doc_id"].to_numpy() % 3 != 0)).all()
    assert (df["n_ip"].to_numpy() == (df["doc_id"].to_numpy() % 2 == 0)).all()
    assert (df["n_phone"].to_numpy() == (df["doc_id"].to_numpy() % 5 != 0)).all()
    # each redaction left its tag behind exactly n times
    assert (
        df["redacted"].str.count(re.escape("[EMAIL]")).to_numpy()
        == df["n_email"].to_numpy()
    ).all()


def test_unigram_logprob_matches_bruteforce():
    from ner_funtool_ray.pipelines.curation import doc_unigram_logprob

    got = doc_unigram_logprob(SF).to_pandas().set_index("doc_id")
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        d: re.findall(r"[0-9a-z_]+", (t or "").lower())
        for d, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist())
    }
    from collections import Counter

    cnt: Counter[str] = Counter()
    for ts in toks.values():
        cnt.update(ts)
    total = sum(cnt.values())
    mb = {
        w: int(np.floor(-np.log2(c / total) * 1000.0 + 0.5))
        for w, c in cnt.items()
    }
    for d, ts in list(toks.items())[:50]:
        if not ts:
            assert d not in got.index
            continue
        assert got.loc[d, "n_tokens"] == len(ts)
        assert got.loc[d, "total_millibits"] == sum(mb[t] for t in ts)


def test_unigram_logprob_oov_floor():
    """With a tiny vocab cap, rare tokens score at the 1/total floor —
    so every doc's total can only go UP vs the uncapped model."""
    from ner_funtool_ray.pipelines.curation import doc_unigram_logprob

    full = doc_unigram_logprob(SF).to_pandas().set_index("doc_id")
    capped = doc_unigram_logprob(SF, vocab_k=5).to_pandas().set_index("doc_id")
    j = full.join(capped, rsuffix="_cap")
    assert (j["total_millibits_cap"] >= j["total_millibits"]).all()
    assert (j["n_tokens_cap"] == j["n_tokens"]).all()


def test_bigram_logprob_planted_conditionals(tmp_path, ray_session):
    """Conditional p(w2|w1) (not joint), bigrams never cross docs, and a
    doc with <2 tokens emits no row."""
    import pyarrow as pa

    from ner_funtool_ray.pipelines.curation import doc_bigram_logprob

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                # doc1 bigrams: (a,b) (b,a) (a,c); doc2: (c,a);
                # doc boundary between them must NOT create (c,c)
                "text": ["a b a c", "c a", "x"],
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = doc_bigram_logprob(str(tmp_path)).to_pandas().set_index("doc_id")
    # corpus: cnt(a,b)=1 cnt(b,a)=1 cnt(a,c)=1 cnt(c,a)=1
    # prefixes: a·=2, b·=1, c·=1 → mb: (a,b)=1000 (b,a)=0 (a,c)=1000 (c,a)=0
    assert list(got.index) == [1, 2]
    assert got.loc[1, "n_bigrams"] == 3
    assert got.loc[1, "total_millibits"] == 2000
    assert got.loc[2, "n_bigrams"] == 1
    assert got.loc[2, "total_millibits"] == 0


def test_bigram_logprob_oov_floor(ray_session):
    """With a tiny vocab cap, rare bigrams score at the 1/total floor —
    so totals only go up and bigram counts are unchanged."""
    from ner_funtool_ray.pipelines.curation import doc_bigram_logprob

    full = doc_bigram_logprob(SF).to_pandas().set_index("doc_id")
    capped = doc_bigram_logprob(SF, vocab_k=5).to_pandas().set_index("doc_id")
    j = full.join(capped, rsuffix="_cap")
    assert (j["total_millibits_cap"] >= j["total_millibits"]).all()
    assert (j["n_bigrams_cap"] == j["n_bigrams"]).all()


def test_top_supplier_revenue_bruteforce():
    from ner_funtool_ray.pipelines.relational import top_supplier_revenue

    got = top_supplier_revenue(SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).to_pandas()
    win = li[
        (li["l_shipdate"] >= np.datetime64("1996-01-01"))
        & (li["l_shipdate"] < np.datetime64("1996-04-01"))
    ].copy()
    ep = np.floor(np.abs(win["l_extendedprice"]) * 100 + 0.5).astype(np.int64)
    dc = np.floor(np.abs(win["l_discount"]) * 100 + 0.5).astype(np.int64)
    win["rev4"] = ep * (100 - dc)
    rev = win.groupby("l_suppkey")["rev4"].sum()
    best = rev[rev == rev.max()]
    assert set(got["suppkey"]) == set(best.index)
    for _, row in got.iterrows():
        assert row["total_revenue"] == best[row["suppkey"]] / 10000.0


def test_semantic_dedup_bruteforce():
    """Brute-force twin of the within-cluster lowest-id-domination rule."""
    from ner_funtool_ray.pipelines.embedding import _FP_SEM, semantic_dedup

    got = semantic_dedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"]).astype(np.int64)
    mat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    assign = got.set_index("vec_id")["centroid_id"]
    q = np.floor(mat * float(_FP_SEM)).astype(np.int64)
    dot = q @ q.T
    n2 = np.diag(dot)
    near = (dot >= 0) & (25 * dot * dot >= 4 * np.outer(n2, n2))
    same_cluster = (
        assign[ids].to_numpy()[:, None] == assign[ids].to_numpy()[None, :]
    )
    dominated = (np.tril(near & same_cluster, k=-1)).any(axis=1)
    kept = got.set_index("vec_id")["kept"]
    assert (kept[ids].to_numpy() == (~dominated).astype(np.int64)).all()
    assert dominated.sum() > 0  # non-vacuous at the default threshold


def test_semantic_dedup_keeps_one_per_dup_pair():
    from ner_funtool_ray.pipelines.embedding import semantic_dedup

    df = semantic_dedup(SF).to_pandas()
    assert set(df["kept"].unique()) <= {0, 1}
    # every vector appears exactly once
    assert df["vec_id"].is_unique and len(df) == 500


def test_curated_documents_bits_consistent_with_components():
    """The composite mask must agree bit-for-bit with the standalone
    component operators it fuses."""
    from ner_funtool_ray.pipelines.curation import (
        benchmark_contamination,
        curated_documents,
        doc_unigram_logprob,
        quality_filter,
    )

    cur = curated_documents(SF).to_pandas().set_index("doc_id")
    assert len(cur) == 500
    assert ((cur["keep"] == 1) == (cur["reason_mask"] == 0)).all()

    qf = quality_filter(SF).to_pandas().set_index("doc_id")
    assert ((cur["reason_mask"] & 1) > 0).equals(qf["flags"] > 0)

    ct = benchmark_contamination(SF).to_pandas()
    contaminated = set(ct.loc[ct["n_shared"] > 0, "doc_id"])
    assert set(cur.index[(cur["reason_mask"] & 4) > 0]) == contaminated

    lm = doc_unigram_logprob(SF).to_pandas().set_index("doc_id")
    hot = set(lm.index[lm["total_millibits"] > 5_100 * lm["n_tokens"]])
    assert set(cur.index[(cur["reason_mask"] & 8) > 0]) == hot
    # every bit fires somewhere at this scale (non-vacuous composite)
    for bit in (1, 2, 4, 8):
        assert ((cur["reason_mask"] & bit) > 0).any(), bit


def test_new_curation_ops_empty_corpus(tmp_path):
    """Empty-Dataset traps (the r2 ADVICE theme): zero-row documents must
    yield zero-row results, not KeyError/TypeError."""
    import pyarrow as pa

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    pq.write_table(empty, str(tmp_path / "documents.parquet"))
    from ner_funtool_ray.pipelines.curation import (
        curated_documents,
        doc_unigram_logprob,
        pii_redact,
    )

    assert pii_redact(str(tmp_path)).count() == 0
    assert doc_unigram_logprob(str(tmp_path)).count() == 0
    assert curated_documents(str(tmp_path)).count() == 0


def test_prefix_jaccard_identical_to_counting_plan():
    """The PPJoin prefix plan must produce the IDENTICAL exact pair set."""
    import pandas as pd

    from ner_funtool_ray.sources.io import read_parquet_auto
    from ner_funtool_ray.stages.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    for thr in (0.5, 0.8):
        docs = read_parquet_auto(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        old = (
            ngram_jaccard_pairs(docs, threshold=thr)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        docs2 = read_parquet_auto(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        new = (
            ngram_jaccard_pairs_prefix(docs2, threshold=thr)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(old, new)
        assert len(old) > 0 or thr > 0.5  # t=0.5 is non-vacuous here


def test_prefix_jaccard_recall_safe_beyond_max_df():
    """A pair whose ONLY shared shingle is a stop-shingle is LOST by the
    counting plan once max_df binds; the prefix plan keeps exact recall
    with no knob."""
    import ray.data

    from ner_funtool_ray.stages.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    import pyarrow as pa

    stop = "alpha beta"
    texts = [stop, stop] + [
        f"{stop} junk{i} junk{i}b junk{i}c" for i in range(2, 400)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(400), type=pa.int64()), "text": texts}
    )
    capped = ngram_jaccard_pairs(
        ray.data.from_arrow(tbl), threshold=0.9, max_df=100
    ).to_pandas()
    exact = ngram_jaccard_pairs_prefix(
        ray.data.from_arrow(tbl), threshold=0.9
    ).to_pandas()
    assert len(capped) == 0  # the cap silently dropped the identical pair
    assert len(exact) == 1
    assert (exact.iloc[0]["a"], exact.iloc[0]["b"]) == (0, 1)
    assert exact.iloc[0]["jaccard"] == 1.0


def test_counting_plan_cap_guard_fires_exactly_when_cap_binds():
    """``on_cap="raise"`` must fail the job in EXACTLY the scenario the
    recall-safety test above plants (a stop-shingle beyond max_df), and
    stay silent when the cap does not bind."""
    import pyarrow as pa
    import pytest

    import ray.data
    from ner_funtool_ray.stages.dedup import ngram_jaccard_pairs

    stop = "alpha beta"
    texts = [stop, stop] + [
        f"{stop} junk{i} junk{i}b junk{i}c" for i in range(2, 400)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(400), type=pa.int64()), "text": texts}
    )
    # cap binds (df(alpha·beta)=400 > 100) → loud failure, not silent loss
    with pytest.raises(Exception, match="max_df=100 dropped"):
        ngram_jaccard_pairs(
            ray.data.from_arrow(tbl), threshold=0.9, max_df=100,
            on_cap="raise",
        ).to_pandas()
    # cap does not bind → identical scenario completes and finds the pair
    ok = ngram_jaccard_pairs(
        ray.data.from_arrow(tbl), threshold=0.9, max_df=1000, on_cap="raise"
    ).to_pandas()
    assert len(ok) == 1 and (ok.iloc[0]["a"], ok.iloc[0]["b"]) == (0, 1)


def test_prefix_jaccard_randomized_equivalence():
    """Seeded random corpora (varying vocab sizes/doc lengths — including
    near-dup-heavy ones) must give identical pair sets on both plans."""
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from ner_funtool_ray.stages.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = np.random.default_rng(7)
    for vocab, n_docs, length in ((5, 60, 6), (40, 80, 12), (12, 50, 4)):
        words = [f"w{i}" for i in range(vocab)]
        texts = []
        for _ in range(n_docs):
            toks = rng.choice(words, size=length).tolist()
            texts.append(" ".join(toks))
        # plant exact + near duplicates
        texts[1] = texts[0]
        texts[3] = texts[2] + " extra"
        tbl = pa.table(
            {"doc_id": pa.array(range(n_docs), type=pa.int64()), "text": texts}
        )
        for thr in (0.3, 0.7):
            a = (
                ngram_jaccard_pairs(ray.data.from_arrow(tbl), threshold=thr)
                .to_pandas()
                .sort_values(["a", "b"])
                .reset_index(drop=True)
            )
            b = (
                ngram_jaccard_pairs_prefix(
                    ray.data.from_arrow(tbl), threshold=thr
                )
                .to_pandas()
                .sort_values(["a", "b"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b)
            assert len(a) > 0  # planted dups keep every case non-vacuous


def test_prefix_jaccard_sparse_buckets():
    """Tiny corpus where most pair-buckets are empty — the empty-group
    branch must emit side-correct zero-row schemas (regression)."""
    import pyarrow as pa

    import ray.data
    from ner_funtool_ray.stages.dedup import ngram_jaccard_pairs_prefix

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "same exact text here",
                "same exact text here",
                "totally different words now",
            ],
        }
    )
    out = ngram_jaccard_pairs_prefix(
        ray.data.from_arrow(tbl), threshold=0.9
    ).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"], out.iloc[0]["jaccard"]) == (0, 1, 1.0)


def test_skew_split_join_plan_invariant_and_skewed():
    """hot_k=0 (all-shuffle), mid, and all-broadcast plans must produce
    the identical join, including on a genuinely skewed key (one key
    owning half the fact rows)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from ner_funtool_ray.stages.skewjoin import skew_split_join

    rng = np.random.default_rng(3)
    n = 4000
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 200, n))
    fact_t = pa.table(
        {
            "row_id": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(keys.astype(np.int64)),
            "v": pa.array(rng.random(n)),
        }
    )
    dim_t = pa.table(
        {
            "dk": pa.array(np.arange(150, dtype=np.int64)),  # keys 150+ dangle
            "label": pa.array([f"L{i}" for i in range(150)]),
        }
    )
    results = []
    for hot_k in (0, 4, 10**6):
        out = (
            skew_split_join(
                ray.data.from_arrow(fact_t),
                ray.data.from_arrow(dim_t),
                "k",
                "dk",
                ["label"],
                hot_k=hot_k,
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        results.append(out)
    pd.testing.assert_frame_equal(results[0], results[1])
    pd.testing.assert_frame_equal(results[0], results[2])
    # brute-force twin
    f = fact_t.to_pandas()
    d = dim_t.to_pandas()
    exp = (
        f.merge(d, left_on="k", right_on="dk", how="inner")
        .sort_values("row_id")
        .reset_index(drop=True)[["row_id", "k", "v", "label"]]
    )
    pd.testing.assert_frame_equal(results[0], exp, check_dtype=False)
    assert (results[0]["k"] == 7).sum() > n * 0.4  # the hot key really is hot
