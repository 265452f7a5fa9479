"""Edit-distance near-dup stage: banded-DP exactness, planted pairs, and
the lossless-blocking guarantee."""

import numpy as np
import pandas as pd
import pytest

from ner_funtool_ray.stages.editdist import (
    banded_levenshtein_pairs,
    dedup_editdistance,
    editdistance_pairs_df,
    encode_strings,
)


def ref_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_banded_dp_exact_random():
    rng = np.random.default_rng(7)
    strs = [
        "".join(rng.choice(list("abcd"), size=rng.integers(0, 50)))
        for _ in range(50)
    ] + ["", "x", "abab" * 8]
    codes, lens = encode_strings(strs)
    ai, bi = np.triu_indices(len(strs), k=1)
    for d in (0, 2, 5, 12):
        got = banded_levenshtein_pairs(codes, lens, ai, bi, d, chunk=333)
        exp = np.array(
            [min(ref_lev(strs[a], strs[b]), d + 1) for a, b in zip(ai, bi)]
        )
        assert np.array_equal(got, exp)


def test_banded_dp_unicode():
    strs = ["中国首都北京", "中国首都上海", "中国的首都北京", "déjà vu", "deja vu"]
    codes, lens = encode_strings(strs)
    ai, bi = np.triu_indices(len(strs), k=1)
    got = banded_levenshtein_pairs(codes, lens, ai, bi, 10)
    exp = np.array([ref_lev(strs[a], strs[b]) for a, b in zip(ai, bi)])
    assert np.array_equal(got, exp)


def test_planted_near_dups_found_with_exact_distance(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the dusty town square under a copper evening sky"
    )
    docs = {
        0: base,
        1: base.replace("quick", "quack").replace("dusty", "musty"),  # 2 subs
        2: base + " tonight",  # 8 inserts
        3: "completely unrelated text about distributed stream processing",
        4: base[: len(base) // 2],  # far: half deleted
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values())),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        dedup_editdistance(str(tmp_path), max_dist=10)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {"doc_a": [0, 0, 1], "doc_b": [1, 2, 2], "dist": [2, 8, 10]}
    )
    assert got["dist"].tolist() == [
        ref_lev(docs[a], docs[b])
        for a, b in zip(got["doc_a"], got["doc_b"])
    ]
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bucket_width_guard():
    with pytest.raises(ValueError):
        dedup_editdistance("/root/testdata/sf0.001", max_dist=20, bucket_width=10)


def test_pair_scored_in_exactly_one_bucket():
    # two docs whose homes straddle a bucket edge: the pair must come out
    # of the max-home bucket only, never twice
    texts = ["a" * 19, "a" * 21]  # homes 0 and 1 at W=20, dist 2
    ids = np.array([10, 11], dtype=np.int64)
    homes = np.array([0, 1], dtype=np.int64)
    b0 = editdistance_pairs_df(ids, texts, homes, bucket=0, max_dist=20)
    b1 = editdistance_pairs_df(ids, texts, homes, bucket=1, max_dist=20)
    assert len(b0) == 0
    assert b1[["doc_a", "doc_b", "dist"]].values.tolist() == [[10, 11, 2]]
