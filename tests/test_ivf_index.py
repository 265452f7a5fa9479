"""Partitioned IVF index: build writes one directory per coarse cell;
query reads only the probed directories and returns exactly what the
scan-everything ``ivf_topk`` returns with the same parameters."""

import os

import pandas as pd
import pyarrow.parquet as pq

from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.stages.similarity import (
    build_ivf_index,
    ivf_topk,
    query_ivf_index,
)

SF_DIR = "/root/testdata/sf0.001"


def _query_vec():
    import numpy as np
    import pyarrow.compute as pc

    tbl = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qrow = tbl.filter(pc.equal(tbl["vec_id"], 0))
    return np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)


def test_partitioned_index_matches_full_scan(tmp_path, ray_session):
    q = _query_vec()
    ds = read_parquet_auto(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    idx = build_ivf_index(ds, str(tmp_path / "ivf"), n_centroids=16, dim=64)

    parts = sorted(p for p in os.listdir(idx) if p.startswith("centroid="))
    assert 1 < len(parts) <= 16  # one dir per non-empty coarse cell

    got = (
        query_ivf_index(idx, q, k=10, n_centroids=16, n_probe=4)
        .to_pandas()
        .sort_values(["score", "vec_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    expect = (
        ivf_topk(ds, q, k=10, n_centroids=16, n_probe=4)
        .to_pandas()
        .sort_values(["score", "vec_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)
    assert len(got) == 10


def test_query_missing_probe_dirs_is_empty(tmp_path, ray_session):
    empty = query_ivf_index(str(tmp_path / "nothing"), _query_vec(), k=5)
    assert empty.count() == 0
    assert list(empty.schema().names) == ["vec_id", "score"]
