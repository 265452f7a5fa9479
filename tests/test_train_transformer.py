"""Transformer-family training: exact backprop through the BERT/ALBERT
encoders (finite differences for every head), forward parity with the
serving encoders, the cascade's stop-gradient attr mask, and the
end-to-end fine-tuning loop (loss decreases; history schema)."""

import numpy as np
import pytest

from ner_funtool_ray.model import train_transformer as tt
from ner_funtool_ray.model.train import AdamWeightDecay
from ner_funtool_ray.model.transformer import (
    AlbertEncoder,
    TransformerEncoder,
    init_albert_weights,
    init_bert_bilstm_weights,
    init_transformer_weights,
)

SF = "/root/testdata/sf0.001"

_rng = np.random.default_rng(7)
_B, _S = 3, 7
IDS = _rng.integers(0, 13, size=(_B, _S)).astype(np.int32)
LENGTHS = np.array([7, 5, 3])
MASK = (np.arange(_S)[None, :] < LENGTHS[:, None]).astype(np.int32)
LABELS = _rng.integers(0, 5, size=(_B, _S)).astype(np.int32)
ATTRS = _rng.integers(0, 4, size=(_B, _S)).astype(np.int32)


def _f64(w):
    return {
        k: (v.astype(np.float64) if v.dtype.kind == "f" else v)
        for k, v in w.items()
    }


def _fd_check(w, loss_fn, nsamp=5, eps=1e-5):
    """Central-difference check of every gradient tensor at sampled
    coordinates.  Combined tolerance: tiny gradients (~1e-7) sit at the
    FD truncation floor, so |num − ana| ≤ 1e-8 + 1e-4·max(|num|,|ana|)."""
    w = _f64(w)
    rng = np.random.default_rng(1)
    loss, grads = loss_fn(w)
    assert np.isfinite(loss)
    for key, g in grads.items():
        arr = w[key]
        assert g.shape == arr.shape, key
        for fi in rng.choice(arr.size, size=min(nsamp, arr.size), replace=False):
            idx = np.unravel_index(fi, arr.shape)
            orig = arr[idx]
            arr[idx] = orig + eps
            lp = loss_fn(w)[0]
            arr[idx] = orig - eps
            lm = loss_fn(w)[0]
            arr[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[idx]
            tol = 1e-8 + 1e-4 * max(abs(num), abs(ana))
            assert abs(num - ana) <= tol, (key, idx, num, ana)


def test_bert_crf_gradients_match_finite_differences():
    w = init_transformer_weights(
        13, hidden=8, n_layers=2, n_heads=2, intermediate=16,
        max_position=12, n_tags=5, seed=3,
    )
    _fd_check(w, lambda w: tt.bert_crf_loss_and_grads(w, IDS, MASK, LABELS))


def test_bert_wol_gradients_match_finite_differences():
    w = init_transformer_weights(
        13, hidden=8, n_layers=2, n_heads=2, intermediate=16,
        max_position=12, n_tags=5, seed=3,
    )
    _fd_check(w, lambda w: tt.bert_wol_loss_and_grads(w, IDS, MASK, LABELS))


def test_cascade_gradients_match_finite_differences():
    w = init_transformer_weights(
        13, hidden=8, n_layers=2, n_heads=2, intermediate=16,
        max_position=12, n_tags=5, n_attrs=4, seed=4,
    )
    _fd_check(
        w,
        lambda w: tt.bert_cascade_loss_and_grads(w, IDS, MASK, LABELS, ATTRS),
    )


def test_albert_gradients_match_finite_differences_and_share_groups():
    # 3 layer applications, ONE shared group: the gradient of each g0_*
    # key is the sum over applications — exactly what the FD check
    # verifies, since the numeric loss sees all three applications move
    w = init_albert_weights(
        13, embedding_size=6, hidden=8, n_layers=3, n_groups=1,
        n_heads=2, intermediate=16, max_position=12, n_tags=5, seed=5,
    )
    _, grads = tt.bert_crf_loss_and_grads(_f64(w), IDS, MASK, LABELS)
    assert any(k.startswith("g0_") for k in grads)
    assert not any(k.startswith("l0_") for k in grads)
    assert "emb_proj_w" in grads
    _fd_check(w, lambda w: tt.bert_crf_loss_and_grads(w, IDS, MASK, LABELS))


def test_stacked_bilstm_gradients_match_finite_differences():
    w = init_bert_bilstm_weights(
        13, hidden=8, lstm_hidden=6, n_layers=2, n_heads=2,
        intermediate=16, max_position=12, n_tags=5, seed=6,
    )
    _fd_check(
        w, lambda w: tt.bert_bilstm_crf_loss_and_grads(w, IDS, MASK, LABELS)
    )


def test_forward_cache_matches_serving_encoder():
    """transformer_forward_cache must replicate the serving encoders
    op-for-op, so a trained weight dict drops into the serving classes."""
    w = init_transformer_weights(
        13, hidden=8, n_layers=2, n_heads=2, intermediate=16,
        max_position=12, n_tags=5, seed=3,
    )
    enc, _ = tt.transformer_forward_cache(_f64(w), IDS, MASK)
    ref = TransformerEncoder(w).encode(IDS, MASK)
    np.testing.assert_allclose(enc, ref, rtol=1e-5, atol=1e-6)

    wa = init_albert_weights(
        13, embedding_size=6, hidden=8, n_layers=3, n_groups=1,
        n_heads=2, intermediate=16, max_position=12, n_tags=5, seed=5,
    )
    enc_a, _ = tt.transformer_forward_cache(_f64(wa), IDS, MASK)
    ref_a = AlbertEncoder(wa).encode(IDS, MASK)
    np.testing.assert_allclose(enc_a, ref_a, rtol=1e-5, atol=1e-6)


def test_cascade_attr_mask_is_a_stop_gradient():
    """run_multitask_bert_crf.py:648-650 — the attr loss is masked where
    the CURRENT BMEO Viterbi prediction is O; attr labels at masked
    positions must contribute nothing (loss OR gradient)."""
    from ner_funtool_ray.model.bilstm_crf import viterbi_decode_batch

    w = _f64(
        init_transformer_weights(
            13, hidden=8, n_layers=1, n_heads=2, intermediate=16,
            max_position=12, n_tags=5, n_attrs=4, seed=4,
        )
    )
    enc, _ = tt.transformer_forward_cache(w, IDS, MASK)
    bmeo_logits = enc @ w["proj_w"] + w["proj_b"]
    preds = viterbi_decode_batch(bmeo_logits, w["crf_trans"], LENGTHS)
    masked_o = (preds == 0) & (np.arange(_S)[None, :] < LENGTHS[:, None])
    if not masked_o.any():
        pytest.skip("seed produced no O predictions")
    loss1, g1 = tt.bert_cascade_loss_and_grads(w, IDS, MASK, LABELS, ATTRS)
    flipped = ATTRS.copy()
    flipped[masked_o] = (flipped[masked_o] + 1) % 4
    loss2, g2 = tt.bert_cascade_loss_and_grads(w, IDS, MASK, LABELS, flipped)
    assert loss1 == pytest.approx(loss2, abs=1e-12)
    np.testing.assert_allclose(g1["attr_proj_w"], g2["attr_proj_w"])


def test_finetune_steps_decrease_loss():
    """A few AdamW steps on one fixed batch must reduce both the
    BERT+CRF and the cascade loss (the create_optimizer semantics)."""
    for variant, loss_fn in (
        (
            "crf",
            lambda w: tt.bert_crf_loss_and_grads(w, IDS, MASK, LABELS),
        ),
        (
            "cascade",
            lambda w: tt.bert_cascade_loss_and_grads(
                w, IDS, MASK, LABELS, ATTRS
            ),
        ),
    ):
        w = _f64(
            init_transformer_weights(
                13, hidden=8, n_layers=2, n_heads=2, intermediate=16,
                max_position=12, n_tags=5,
                n_attrs=4 if variant == "cascade" else None, seed=9,
            )
        )
        opt = AdamWeightDecay(lr=5e-3)
        first, _ = loss_fn(w)
        for _ in range(8):
            loss, grads = loss_fn(w)
            w = opt.step(w, grads)
        last, _ = loss_fn(w)
        assert last < first, (variant, first, last)


def test_train_bert_loop_runs_and_reports(ray_session):
    """End-to-end data-parallel fine-tuning at sf0.001: history schema,
    finite decreasing loss, token-accuracy eval columns."""
    from ner_funtool_ray.pipelines.training import train_bert

    _, hist = train_bert(
        SF, variant="crf", epochs=2, batch_size=64, n_workers=2,
        max_examples=300,
    )
    assert list(hist["epoch"]) == [0, 1]
    assert np.isfinite(hist["mean_loss"]).all()
    assert hist["mean_loss"].iloc[1] <= hist["mean_loss"].iloc[0]
    assert "token_acc" in hist.columns

    _, hist2 = train_bert(
        SF, variant="cascade", epochs=1, batch_size=64, n_workers=2,
        max_examples=300, optimizer="dual_rate",
    )
    assert {"bmeo_token_acc", "attr_token_acc"} <= set(hist2.columns)
    assert np.isfinite(hist2["mean_loss"]).all()


def test_trained_bert_checkpoint_round_trips_into_serving(ray_session, tmp_path):
    """A ``train_bert`` checkpoint must drop straight into the serving
    actor (`BertNerTagger(weights_path=…)`) — the K6/K7 role: tags from
    the loaded tagger equal tags from the in-memory trained weights."""
    from ner_funtool_ray.model.bilstm_crf import save_weights
    from ner_funtool_ray.model.transformer import BertCrf
    from ner_funtool_ray.pipelines.training import train_bert
    from ner_funtool_ray.stages.tag import BertNerTagger
    import pyarrow as pa

    w, _ = train_bert(
        SF, variant="crf", epochs=1, batch_size=64, n_workers=2,
        max_examples=200, eval_each_epoch=False,
    )
    w32 = {
        k: (v.astype(np.float32) if v.dtype.kind == "f" else v)
        for k, v in w.items()
    }
    path = str(tmp_path / "bert_crf.npz")
    save_weights(path, w32)
    tagger = BertNerTagger(weights_path=path, max_seq_len=64)
    assert isinstance(tagger.model, BertCrf)
    batch = pa.table({"sentence": ["中国首都是北京", "def run(x): pass"]})
    out = tagger(batch)
    tags = out["pred_tags"].to_pylist()
    assert len(tags) == 2 and len(tags[0]) == 7
    # parity with the in-memory weights through the same encode path
    tagger2 = BertNerTagger(max_seq_len=64)
    tagger2.model = BertCrf(w32)
    assert tagger2(batch)["pred_tags"].to_pylist() == tags


def test_train_bert_sync_step_matches_concatenated_batch(ray_session):
    """One sync round over n workers must equal one big-batch step: the
    example-weighted gradient average over two worker batches equals the
    gradients of the concatenated batch (the data-parallel invariant,
    transformer edition)."""
    w = _f64(
        init_transformer_weights(
            13, hidden=8, n_layers=1, n_heads=2, intermediate=16,
            max_position=12, n_tags=5, seed=3,
        )
    )
    ids2 = _rng.integers(0, 13, size=(2, _S)).astype(np.int32)
    len2 = np.array([6, 4])
    mask2 = (np.arange(_S)[None, :] < len2[:, None]).astype(np.int32)
    lab2 = _rng.integers(0, 5, size=(2, _S)).astype(np.int32)

    l1, g1 = tt.bert_crf_loss_and_grads(w, IDS, MASK, LABELS)
    l2, g2 = tt.bert_crf_loss_and_grads(w, ids2, mask2, lab2)
    cat_ids = np.concatenate([IDS, ids2])
    cat_mask = np.concatenate([MASK, mask2])
    cat_lab = np.concatenate([LABELS, lab2])
    lc, gc = tt.bert_crf_loss_and_grads(w, cat_ids, cat_mask, cat_lab)
    n1, n2 = len(LABELS), len(lab2)
    assert (l1 * n1 + l2 * n2) / (n1 + n2) == pytest.approx(lc, rel=1e-10)
    for k in gc:
        np.testing.assert_allclose(
            (g1[k] * n1 + g2[k] * n2) / (n1 + n2), gc[k], rtol=1e-8,
            atol=1e-12,
        )
