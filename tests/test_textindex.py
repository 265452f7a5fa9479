"""Inverted text index: sharded build, prune-at-the-read query, and the
polars-absent fallback parity."""

import os
import tempfile

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["query", "window", "scan"]


def _ids(ds) -> list[int]:
    df = ds.to_pandas()
    if "doc_id" not in df.columns:  # empty-Dataset to_pandas drops columns
        assert len(df) == 0
        return []
    return sorted(df["doc_id"].tolist())


@pytest.fixture(scope="module")
def index_dir(ray_session):
    from ner_funtool_ray.stages.textindex import build_text_index

    with tempfile.TemporaryDirectory() as d:
        yield build_text_index(SF_DIR, os.path.join(d, "idx"))


def test_and_is_intersection_of_single_terms(index_dir):
    from ner_funtool_ray.stages.textindex import query_text_index

    both = set(_ids(query_text_index(index_dir, TERMS, mode="and")))
    singles = [set(_ids(query_text_index(index_dir, [t]))) for t in TERMS]
    assert both == set.intersection(*singles)
    assert len(both) > 0
    union = set(_ids(query_text_index(index_dir, TERMS, mode="or")))
    assert union == set.union(*singles)


def test_query_reads_only_term_shards(index_dir):
    # the shards NOT hosting the query terms must never be opened
    from ner_funtool_ray.stages import textindex

    opened = []
    orig = textindex.read_parquet_auto

    def spy(paths, *a, **kw):
        opened.extend(paths if isinstance(paths, list) else [paths])
        return orig(paths, *a, **kw)

    import unittest.mock as mock

    with mock.patch.object(textindex, "read_parquet_auto", spy):
        textindex.query_text_index(index_dir, ["query"]).to_pandas()
    shards = {p.split("shard=")[1].split("/")[0] for p in opened}
    import zlib

    assert shards == {str(zlib.crc32(b"query") % 32)}


def test_empty_and_missing_terms(index_dir):
    from ner_funtool_ray.stages.textindex import query_text_index

    assert _ids(query_text_index(index_dir, [])) == []
    assert _ids(query_text_index(index_dir, ["zz_not_a_term_zz"])) == []
    with pytest.raises(ValueError, match="mode"):
        query_text_index(index_dir, ["query"], mode="xor")


def test_fallback_tokenizer_matches_polars(ray_session, index_dir):
    from ner_funtool_ray.stages import textindex

    import unittest.mock as mock

    with mock.patch.object(textindex, "pl", None):
        with tempfile.TemporaryDirectory() as d:
            idx = textindex.build_text_index(SF_DIR, os.path.join(d, "idx"))
            got = _ids(textindex.query_text_index(idx, TERMS, mode="and"))
    expect = _ids(textindex.query_text_index(index_dir, TERMS, mode="and"))
    assert got == expect


def test_distributed_count_path_matches_driver(index_dir):
    from ner_funtool_ray.stages.textindex import query_text_index

    fast = _ids(query_text_index(index_dir, TERMS, mode="and"))
    dist = _ids(query_text_index(index_dir, TERMS, mode="and", driver_cap=None))
    assert fast == dist
