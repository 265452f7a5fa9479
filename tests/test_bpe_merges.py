"""Iterative BPE merge trainer (curation.bpe_learn_merges): greedy
non-overlapping merge semantics, exhaustion guard, twin parity on a planted
corpus (the standard path is oracle-covered by test_queries_oracle.py)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ner_funtool_ray.pipelines.curation import bpe_learn_merges, make_bpe_merges_sql


def _write_docs(d, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * len(texts), type=pa.string()),
                "source": pa.array(["src0"] * len(texts), type=pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )


def test_bpe_overlap_and_exhaustion(tmp_path):
    """'aaa' counts the (a,a) pair per POSITION (2 per word) but merges
    non-overlapping (one merge per word) — and when no pair is left the
    loop stops early, returning fewer than k rows on both engines."""
    d = tmp_path / "sf"
    d.mkdir()
    _write_docs(d, ["aaa aaa b"])
    got = bpe_learn_merges(str(d), k=8).to_pandas()
    assert got.to_dict("records") == [
        {"rank": 1, "left_tok": "a", "right_tok": "a", "cnt": 4},
        {"rank": 2, "left_tok": "aa", "right_tok": "a", "cnt": 2},
    ]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    exp = con.sql(make_bpe_merges_sql(8)).df().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bpe_tie_break_lexicographic(tmp_path):
    """Equal-count pairs resolve by (left, right) byte order identically
    on both engines."""
    d = tmp_path / "sf"
    d.mkdir()
    _write_docs(d, ["xy zw xy zw"])  # (x,y) and (z,w) both count 2
    got = bpe_learn_merges(str(d), k=1).to_pandas()
    assert got.to_dict("records") == [
        {"rank": 1, "left_tok": "x", "right_tok": "y", "cnt": 2}
    ]


def test_bpe_first_merge_agrees_with_top_pairs():
    """Round 1's statistic is exactly bpe_top_pairs' — the two ops must
    pick the same winning pair on the shared corpus."""
    from ner_funtool_ray.pipelines.curation import bpe_top_pairs

    sf = "/root/testdata/sf0.001"
    top = bpe_top_pairs(sf, k=1).to_pandas()
    first = bpe_learn_merges(sf, k=1).to_pandas()
    assert (
        top["pair"][0]
        == first["left_tok"][0] + first["right_tok"][0]
    )
    assert int(top["cnt"][0]) == int(first["cnt"][0])


def test_bpe_batched_rounds_match_sequential(tmp_path):
    """Disjoint frequent pairs batch into one exchange; the merge table is
    bit-identical to the one-merge-per-round protocol and to the SQL twin,
    with measurably fewer count exchanges."""
    d = tmp_path / "sf"
    d.mkdir()
    # four token-disjoint frequent pairs + overlap chains to exercise the
    # conflict stop and the strict-boundary shrink
    _write_docs(
        d,
        ["ab ab ab cd cd ef ef gh aab abb"] * 3
        + ["ab cd ef gh ab cd"] * 2,
    )
    st_b, st_s = {}, {}
    batched = bpe_learn_merges(str(d), k=8, batch=16, stats=st_b).to_pandas()
    sequential = bpe_learn_merges(str(d), k=8, batch=1, stats=st_s).to_pandas()
    pd.testing.assert_frame_equal(batched, sequential)
    assert st_b["rounds"] < st_s["rounds"]  # the latency win
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    exp = (
        con.sql(make_bpe_merges_sql(8))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batched, exp, check_dtype=False)
