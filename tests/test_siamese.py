"""Siamese twin-tower ALBERT (`bert/modeling_google_albert.py:282-501`
AlbertModelSiamese): shared-encoder / separate-pooler structure, score
determinism under batching and padding, and the Ray actor-pool stage +
pipeline end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ner_funtool_ray.model.transformer import (
    AlbertEncoder,
    AlbertSiamese,
    init_albert_siamese_weights,
    init_albert_weights,
)

V = 50


@pytest.mark.quick
def test_siamese_structure_shared_encoder_separate_poolers():
    # encoder/embedding parameters are the SHARED AlbertModel set (the
    # second tower re-enters the same `bert` scope, google_albert:403);
    # the ONLY additions are the two pooler heads (pooler_1/pooler_2)
    base = set(init_albert_weights(vocab_size=V, n_tags=2))
    sia = init_albert_siamese_weights(vocab_size=V)
    assert set(sia) - base == {"pool1_w", "pool1_b", "pool2_w", "pool2_b"}
    w = sia
    # towers share the encoder: identical inputs give identical encodings
    m = AlbertSiamese(w)
    ids = np.array([[2, 5, 7, 3]], dtype=np.int32)
    mask = np.ones_like(ids)
    enc = AlbertEncoder(w).encode(ids, mask)
    p1, p2 = m.pooled_pair(ids, mask, ids, mask)
    assert np.allclose(np.tanh(enc[:, 0] @ w["pool1_w"] + w["pool1_b"]), p1)
    assert np.allclose(np.tanh(enc[:, 0] @ w["pool2_w"] + w["pool2_b"]), p2)
    # ... but the poolers are per-tower, so pooled outputs differ
    assert not np.allclose(p1, p2)


@pytest.mark.quick
def test_siamese_similarity_bounds_and_padding_invariance():
    w = init_albert_siamese_weights(vocab_size=V)
    m = AlbertSiamese(w)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, V, size=(4, 6)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[2, 4:] = 0
    sims = m.similarity(ids, mask, ids[::-1].copy(), mask[::-1].copy())
    assert sims.shape == (4,)
    assert np.all(np.abs(sims) <= 1.0 + 1e-9)
    # padding invariance: widening a tower with masked zeros cannot move
    # the score (attention adder + [CLS]-only pooling)
    ids_wide = np.concatenate(
        [ids, np.zeros((4, 3), dtype=np.int32)], axis=1
    )
    mask_wide = np.concatenate(
        [mask, np.zeros((4, 3), dtype=np.int32)], axis=1
    )
    sims_wide = m.similarity(
        ids_wide, mask_wide, ids[::-1].copy(), mask[::-1].copy()
    )
    np.testing.assert_allclose(sims, sims_wide, rtol=0, atol=1e-5)


@pytest.mark.quick
def test_siamese_scorer_batch_composition_parity():
    # the actor's integer sim_ppm must not depend on which rows share a
    # batch (chunked padding is per-tower, masked positions inert)
    from ner_funtool_ray.stages.tag import SiameseSimilarityScorer

    scorer = SiameseSimilarityScorer(max_seq_len=32)
    a = ["alpha beta gamma", "x", "the quick brown fox", "zz top"]
    b = ["alpha beta delta", "xyzzy", "the quick brown fox", "aa"]
    full = scorer(
        pa.table({"text_a": a, "text_b": b})
    )["sim_ppm"].to_pylist()
    singles = [
        scorer(pa.table({"text_a": [x], "text_b": [y]}))["sim_ppm"][0].as_py()
        for x, y in zip(a, b)
    ]
    assert full == singles
    # identical pair through DIFFERENT towers is high but not forced to 1
    # (separate poolers); self-consistency: repeat call is deterministic
    assert full == scorer(
        pa.table({"text_a": a, "text_b": b})
    )["sim_ppm"].to_pylist()


def test_siamese_stage_in_ray_pipeline():
    from ner_funtool_ray.stages.tag import SiameseSimilarityScorer

    rows = [
        {"pid": i, "text_a": f"sentence number {i}", "text_b": f"sentence number {i+1}"}
        for i in range(20)
    ]
    ds = ray.data.from_items(rows).map_batches(
        SiameseSimilarityScorer,
        fn_constructor_kwargs={"max_seq_len": 32},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    out = ds.to_pandas().sort_values("pid").reset_index(drop=True)
    assert len(out) == 20
    assert out["sim_ppm"].dtype.kind == "i"
    # Ray-vs-serial parity
    serial = SiameseSimilarityScorer(max_seq_len=32)
    tbl = pa.table(
        {
            "pid": [r["pid"] for r in rows],
            "text_a": [r["text_a"] for r in rows],
            "text_b": [r["text_b"] for r in rows],
        }
    )
    expect = serial(tbl)["sim_ppm"].to_pylist()
    assert out["sim_ppm"].tolist() == expect


def test_siamese_sentence_sims_pipeline():
    from ner_funtool_ray.pipelines.tagging import siamese_sentence_sims

    out = siamese_sentence_sims(
        "/root/testdata/sf0.001", concurrency=2
    ).to_pandas()
    assert set(out.columns) == {"row_id_a", "row_id_b", "sim_ppm"}
    # n-1 pairs per block over the 500-doc corpus
    assert len(out) > 400
    assert not out.duplicated(["row_id_a", "row_id_b"]).any()
    assert out["sim_ppm"].abs().max() <= 1_000_000
    # deterministic: a second run reproduces the scores bit-for-bit
    again = (
        siamese_sentence_sims("/root/testdata/sf0.001", concurrency=2)
        .to_pandas()
        .sort_values(["row_id_a", "row_id_b"])
        .reset_index(drop=True)
    )
    pd_sorted = out.sort_values(["row_id_a", "row_id_b"]).reset_index(
        drop=True
    )
    assert pd_sorted.equals(again)


def test_bm25_siamese_rerank():
    from ner_funtool_ray.pipelines.curation import bm25_search
    from ner_funtool_ray.pipelines.tagging import bm25_siamese_rerank

    out = bm25_siamese_rerank(
        "/root/testdata/sf0.001", k_bm25=20, k=5, concurrency=2
    )
    assert list(out.columns) == ["doc_id", "bm25_score", "sim_ppm"]
    assert len(out) == 5
    # reranked order: sim_ppm descending, doc_id ascending on ties
    s = out["sim_ppm"].tolist()
    assert s == sorted(s, reverse=True)
    # every survivor came from the BM25 candidate set (with its score)
    cand = bm25_search("/root/testdata/sf0.001", k=20).to_pandas()
    lut = dict(zip(cand["doc_id"], cand["score"]))
    assert all(lut[d] == b for d, b in zip(out["doc_id"], out["bm25_score"]))
    # deterministic end-to-end
    again = bm25_siamese_rerank(
        "/root/testdata/sf0.001", k_bm25=20, k=5, concurrency=2
    )
    assert out.equals(again)
