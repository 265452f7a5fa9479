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


def test_ivfpq_serial_parity_and_structure(ray_session):
    """IVF-PQ ADC ranking matches a serial numpy reimplementation exactly,
    and every returned id belongs to a probed coarse cell."""
    import numpy as np

    from ner_funtool_ray.stages.similarity import (
        ivf_centroids,
        ivfpq_topk,
        pq_codebook,
        pq_encode,
    )

    tbl = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl["vec_id"]).astype(np.int64)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    query = mat[ids == 0][0]

    ds = read_parquet_auto(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = ivfpq_topk(
        ds, query, k=10, n_centroids=16, n_probe=4, m=8, ksub=16, round_to=None
    ).to_pandas()

    # serial twin
    cents = ivf_centroids(16, 64)
    cb = pq_codebook(8, 16, 8)
    qunit = query / np.linalg.norm(query)
    order = np.lexsort((np.arange(16), -(cents @ qunit)))
    probes = np.sort(order[:4])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    assign = np.argmax(unit @ cents.T, axis=1)
    mask = np.isin(assign, probes)
    codes = pq_encode(unit[mask], cb)
    lut = np.einsum("sj,scj->sc", qunit.reshape(8, 8), cb)
    adc = lut[np.arange(8)[None, :], codes].sum(axis=1)
    cand_ids = ids[mask]
    srt = np.argsort(cand_ids, kind="stable")
    srt = srt[np.argsort(-adc[srt], kind="stable")[:10]]
    assert list(got["vec_id"]) == list(cand_ids[srt])
    np.testing.assert_array_equal(got["score"].to_numpy(), adc[srt])
    # structure: all returned ids sit in probed cells; scores descend
    assert np.isin(assign[np.isin(ids, got["vec_id"])], probes).all()
    s = got["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_pq_encode_deterministic_and_compact():
    import numpy as np

    from ner_funtool_ray.stages.similarity import pq_codebook, pq_encode

    rng = np.random.default_rng(3)
    u = rng.normal(size=(100, 64))
    u /= np.linalg.norm(u, axis=1)[:, None]
    cb = pq_codebook(8, 16, 8)
    c1, c2 = pq_encode(u, cb), pq_encode(u, cb)
    np.testing.assert_array_equal(c1, c2)
    assert c1.dtype == np.uint8 and c1.shape == (100, 8)
    assert c1.max() < 16
    # the 8-byte code beats the 512-byte float64 row by 64x — the point
    # of PQ; sanity-check ADC separates planted near-neighbors of the
    # query from unrelated random vectors (untrained md5 codebook, so
    # only the planted/random mean gap is asserted, not tight recall)
    q = rng.normal(size=64)
    q /= np.linalg.norm(q)
    near = q[None, :] + rng.normal(scale=0.15, size=(50, 64))
    far = rng.normal(size=(50, 64))
    pool = np.vstack([near, far])
    pool /= np.linalg.norm(pool, axis=1)[:, None]
    codes = pq_encode(pool, cb)
    lut = np.einsum("sj,scj->sc", q.reshape(8, 8), cb)
    adc = lut[np.arange(8)[None, :], codes].sum(axis=1)
    assert adc[:50].mean() > adc[50:].mean() + 0.1


def test_ivfpq_boundary_tie_breaks_by_lowest_id(ray_session):
    """PQ maps duplicate vectors to identical codes, so exact ADC ties at
    the k boundary are common; the rank must cut tie groups by lowest id
    (the r4 flake: full-precision ranking let DuckDB's hash-agg sum order
    flip the boundary id).  Ranking happens on the ROUNDED score."""
    import numpy as np
    import pyarrow as pa

    import ray

    from ner_funtool_ray.stages.similarity import ivfpq_topk

    rng = np.random.default_rng(0)
    v = rng.normal(size=64)
    # 30 identical vectors (one tie group) + the query vector itself
    ids = list(range(1, 31)) + [0]
    vecs = [v.tolist()] * 30 + [rng.normal(size=64).tolist()]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )
    ).repartition(5)
    out = ivfpq_topk(
        ds, np.asarray(vecs[-1]), k=10, n_centroids=4, n_probe=4,
        m=8, ksub=16,
    ).to_pandas()
    dup_ids = [i for i in out["vec_id"].tolist() if i != 0]
    # the tie group fills the remaining slots with its LOWEST ids, in order
    assert dup_ids == sorted(dup_ids)
    assert dup_ids == list(range(1, len(dup_ids) + 1))
    assert len(out) == 10
