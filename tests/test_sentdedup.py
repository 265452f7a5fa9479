"""Cross-document sentence dedup + the daily-activity roll-up."""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_sentences_invariants(ray_session):
    from ner_funtool_ray.stages.sentdedup import dedup_sentences

    df = dedup_sentences(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    # every document survives, even if scrubbed empty
    assert sorted(df["doc_id"]) == sorted(docs["doc_id"])
    assert (df["n_kept"] >= 0).all() and (df["n_dropped"] >= 0).all()
    # a kept clean_text has exactly n_kept sentences when re-split
    from ner_funtool_ray.functions.text import split_sentences

    sample = df.head(50)
    for _, r in sample.iterrows():
        assert len(split_sentences(r["clean_text"])) == r["n_kept"]
    # no surviving sentence may appear in two different docs
    seen: dict[str, int] = {}
    for _, r in df.iterrows():
        for s in set(split_sentences(r["clean_text"])):
            assert seen.setdefault(s, r["doc_id"]) == r["doc_id"], s


@pytest.fixture()
def planted_dir(tmp_path):
    # three docs sharing one boilerplate sentence; doc 2 also repeats a
    # sentence WITHIN itself (must be kept — not cross-document)
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        "shared legal footer here. unique alpha text one.",
        "unique beta text two. shared legal footer here. self repeat. self repeat.",
        "shared legal footer here. unique gamma text three.",
    ]
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": docs}),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_dedup_sentences_planted(ray_session, planted_dir):
    from ner_funtool_ray.stages.sentdedup import dedup_sentences

    df = (
        dedup_sentences(planted_dir)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "clean_text"] == "unique alpha text one"
    assert df.loc[1, "n_dropped"] == 1
    # the within-doc repeat survives twice; the cross-doc footer is gone
    assert (
        df.loc[2, "clean_text"]
        == "unique beta text two self repeat self repeat"
    )
    assert df.loc[2, "n_dropped"] == 1
    assert df.loc[3, "n_kept"] == 1


def test_dedup_sentences_guard_raises(ray_session, planted_dir):
    from ner_funtool_ray.stages.sentdedup import dedup_sentences

    with pytest.raises(ValueError, match="broadcast_limit"):
        dedup_sentences(planted_dir, broadcast_limit=0)


def test_dup_ngram_coverage_planted(ray_session, planted_dir):
    from ner_funtool_ray.stages.sentdedup import doc_dup_ngram_coverage

    df = (
        doc_dup_ngram_coverage(planted_dir, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # docs 1 and 3 share 'shared legal footer here' AND the follow-on
    # 'footer here unique' 3-gram → positions 0-4 covered
    assert df.loc[1, "n_masked"] == 5
    assert df.loc[1, "n_tokens"] == 8
    assert (df["n_masked"] <= df["n_tokens"]).all()


def test_dup_span_scrub_planted(ray_session, planted_dir):
    from ner_funtool_ray.stages.sentdedup import doc_dup_span_scrub

    df = (
        doc_dup_span_scrub(planted_dir, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: positions 0-4 covered (shared 3-grams with doc 3) → only the
    # trailing unique words survive, in original order
    assert df.loc[1, "scrubbed_text"] == "alpha text one"
    assert df.loc[1, "n_tokens"] == 8 and df.loc[1, "n_kept"] == 3
    # consistency with the coverage signal: kept = tokens − masked
    from ner_funtool_ray.stages.sentdedup import doc_dup_ngram_coverage

    cov = (
        doc_dup_ngram_coverage(planted_dir, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (df["n_kept"] == cov["n_tokens"] - cov["n_masked"]).all()
    # scrubbed text re-tokenizes to exactly n_kept words
    import re

    for _, r in df.iterrows():
        assert len(re.findall(r"\w+", r["scrubbed_text"])) == r["n_kept"]


def test_daily_active_users_consistency(ray_session):
    from ner_funtool_ray.pipelines.mining import daily_active_users

    df = daily_active_users(SF_DIR).to_pandas()
    assert (df["new_users"] <= df["active_users"]).all()
    assert df["cum_users"].is_monotonic_increasing
    assert df["cum_users"].iloc[-1] == df["new_users"].sum()
    # bucket-count invariance (the distinct math must not depend on layout)
    df2 = daily_active_users(SF_DIR, n_buckets=7).to_pandas()
    pd.testing.assert_frame_equal(df, df2)
