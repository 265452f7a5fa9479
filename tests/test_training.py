"""Training path: exact CRF/BPTT gradients (finite differences), the
optimizer family (Adam / AdamW+warmup / dual-rate), data-parallel step
equivalence, and the end-to-end epoch loop (loss decreases, checkpoint
round-trips into the serving tagger)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from ner_funtool_ray.model.bilstm_crf import init_weights
from ner_funtool_ray.model.train import (
    Adam,
    AdamWeightDecay,
    bilstm_crf_loss_and_grads,
    clip_by_global_norm,
    crf_nll_and_grad,
    dual_rate_step,
    warmup_linear_decay_lr,
)

SF = "/root/testdata/sf0.001"


def test_crf_gradients_match_finite_differences():
    rng = np.random.default_rng(0)
    B, S, T = 3, 5, 4
    logits = rng.normal(size=(B, S, T))
    trans = rng.normal(size=(T, T))
    labels = rng.integers(0, T, size=(B, S))
    lengths = np.array([5, 3, 1])
    loss, dlog, dtr = crf_nll_and_grad(logits, trans, labels, lengths)
    assert np.isfinite(loss) and loss > 0
    eps = 1e-6
    for _ in range(20):
        b, s, t = rng.integers(0, B), rng.integers(0, S), rng.integers(0, T)
        lp, lm = logits.copy(), logits.copy()
        lp[b, s, t] += eps
        lm[b, s, t] -= eps
        num = (
            crf_nll_and_grad(lp, trans, labels, lengths)[0]
            - crf_nll_and_grad(lm, trans, labels, lengths)[0]
        ) / (2 * eps)
        assert abs(num - dlog[b, s, t]) < 1e-7
    for _ in range(10):
        i, j = rng.integers(0, T), rng.integers(0, T)
        tp, tm = trans.copy(), trans.copy()
        tp[i, j] += eps
        tm[i, j] -= eps
        num = (
            crf_nll_and_grad(logits, tp, labels, lengths)[0]
            - crf_nll_and_grad(logits, tm, labels, lengths)[0]
        ) / (2 * eps)
        assert abs(num - dtr[i, j]) < 1e-7
    # padded positions get zero gradient
    assert np.allclose(dlog[2, 1:, :], 0.0)


def test_full_model_gradients_match_finite_differences():
    rng = np.random.default_rng(1)
    w = init_weights(vocab_size=12, emb_dim=5, hidden=6, n_tags=4, seed=1)
    w = {k: v.astype(np.float64) for k, v in w.items()}
    ids = rng.integers(1, 12, size=(3, 7)).astype(np.int32)
    labels = rng.integers(0, 4, size=(3, 7))
    lengths = np.array([7, 4, 2], dtype=np.int32)
    loss, grads = bilstm_crf_loss_and_grads(w, ids, labels, lengths)
    assert np.isfinite(loss)
    eps = 1e-6
    for key in grads:
        g = grads[key]
        for fi in rng.integers(0, g.size, size=min(4, g.size)):
            idx = np.unravel_index(fi, g.shape)
            wp = {k: v.copy() for k, v in w.items()}
            wm = {k: v.copy() for k, v in w.items()}
            wp[key][idx] += eps
            wm[key][idx] -= eps
            num = (
                bilstm_crf_loss_and_grads(wp, ids, labels, lengths)[0]
                - bilstm_crf_loss_and_grads(wm, ids, labels, lengths)[0]
            ) / (2 * eps)
            assert abs(num - g[idx]) < 1e-6, key


def test_sync_step_equals_concatenated_batch():
    """The data-parallel invariant: the example-weighted average of
    per-shard gradients equals the gradient of the concatenated batch
    (both are means over examples), so K workers per step == one
    reference step over the K batches."""
    rng = np.random.default_rng(2)
    w = init_weights(vocab_size=15, emb_dim=4, hidden=5, n_tags=4, seed=3)
    w = {k: v.astype(np.float64) for k, v in w.items()}
    S = 6
    ids = rng.integers(1, 15, size=(6, S)).astype(np.int32)
    labels = rng.integers(0, 4, size=(6, S))
    lengths = rng.integers(1, S + 1, size=6).astype(np.int32)
    _, g_all = bilstm_crf_loss_and_grads(w, ids, labels, lengths)
    _, g1 = bilstm_crf_loss_and_grads(w, ids[:2], labels[:2], lengths[:2])
    _, g2 = bilstm_crf_loss_and_grads(w, ids[2:], labels[2:], lengths[2:])
    for k in g_all:
        avg = (g1[k] * 2 + g2[k] * 4) / 6
        assert np.allclose(avg, g_all[k], atol=1e-12), k


def test_warmup_linear_decay_schedule():
    # optimization.py:51-77 — linear warmup to init_lr, then linear
    # decay to 0 at num_train_steps
    lr = 1e-4
    assert warmup_linear_decay_lr(0, lr, 100, 10) == 0.0
    assert abs(warmup_linear_decay_lr(5, lr, 100, 10) - lr * 0.5) < 1e-12
    assert abs(warmup_linear_decay_lr(10, lr, 100, 10) - lr * 0.9) < 1e-12
    assert abs(warmup_linear_decay_lr(50, lr, 100, 10) - lr * 0.5) < 1e-12
    assert warmup_linear_decay_lr(100, lr, 100, 10) == 0.0


def test_adamw_weight_decay_exclusions():
    # decay applies to kernels, not to LayerNorm/bias-named params
    # (optimization.py exclude_from_weight_decay)
    opt = AdamWeightDecay(lr=0.1, weight_decay=0.5)
    params = {
        "l0_ff1_w": np.ones(3),
        "l0_attn_ln_g": np.ones(3),
        "proj_b": np.ones(3),
    }
    zero_grads = {k: np.zeros(3) for k in params}
    out = opt.step(params, zero_grads)
    assert (out["l0_ff1_w"] < 1.0).all()  # decayed toward 0
    assert np.array_equal(out["l0_attn_ln_g"], np.ones(3))  # excluded
    assert np.array_equal(out["proj_b"], np.ones(3))  # excluded


def test_clip_by_global_norm_and_dual_rate():
    g = {"a": np.array([3.0]), "b": np.array([4.0])}  # global norm 5
    assert clip_by_global_norm(g, 10.0) is g  # below: untouched
    c = clip_by_global_norm(g, 2.5)
    assert abs(np.sqrt(sum((x**2).sum() for x in c.values())) - 2.5) < 1e-12
    # dual-rate: encoder group stepped at lr 1e-4, head at 1e-3
    params = {"l0_q_w": np.zeros(2), "proj_w": np.zeros(2)}
    grads = {"l0_q_w": np.ones(2), "proj_w": np.ones(2)}
    out = dual_rate_step(
        params, grads, Adam(lr=1e-4), Adam(lr=1e-3)
    )
    assert abs(out["l0_q_w"][0]) < abs(out["proj_w"][0])
    assert abs(out["proj_w"][0] + 1e-3) < 1e-9  # first Adam step ≈ −lr


def test_adam_first_step_magnitude():
    opt = Adam(lr=0.01)
    params = {"x": np.array([1.0])}
    out = opt.step(params, {"x": np.array([0.5])})
    # bias-corrected first step ≈ lr · sign(g)
    assert abs((params["x"] - out["x"])[0] - 0.01) < 1e-6


def test_train_loop_loss_decreases_and_checkpoints(tmp_path):
    from ner_funtool_ray.pipelines.training import train_bilstm_crf

    w, hist = train_bilstm_crf(
        SF, epochs=3, batch_size=64, n_workers=2,
        checkpoint_dir=str(tmp_path),
    )
    losses = hist["mean_loss"].tolist()
    assert len(losses) == 3
    assert losses[1] < losses[0] and losses[2] < losses[1]  # learning
    assert (hist["n_examples"] > 0).all()
    assert "best_f1" in hist.columns  # A8 tracker surfaced
    # checkpoint round-trip: trained weights serve through the tagger
    from ner_funtool_ray.model.bilstm_crf import save_weights
    from ner_funtool_ray.stages.tag import NerTagger

    path = str(tmp_path / "trained.npz")
    save_weights(path, {k: v.astype(np.float32) for k, v in w.items()})
    t = NerTagger(weights_path=path)
    out = t(pa.table({"sentence": ["spark joins the customer table"]}))
    tags = out["pred_tags"].to_pylist()[0]
    assert len(tags) == len("spark joins the customer table")


def test_wol_training_gradients_match_finite_differences():
    from ner_funtool_ray.model.train import bilstm_wol_loss_and_grads

    rng = np.random.default_rng(4)
    w = init_weights(vocab_size=10, emb_dim=4, hidden=5, n_tags=4, seed=2)
    w = {k: v.astype(np.float64) for k, v in w.items()}
    ids = rng.integers(1, 10, size=(3, 6)).astype(np.int32)
    labels = rng.integers(0, 4, size=(3, 6))
    lengths = np.array([6, 4, 1], dtype=np.int32)
    loss, grads = bilstm_wol_loss_and_grads(w, ids, labels, lengths)
    assert np.isfinite(loss) and loss > 0
    assert "crf_trans" not in grads  # CE head: no transition params
    eps = 1e-6
    for key in grads:
        g = grads[key]
        for fi in rng.integers(0, g.size, size=min(4, g.size)):
            idx = np.unravel_index(fi, g.shape)
            wp = {k: v.copy() for k, v in w.items()}
            wm = {k: v.copy() for k, v in w.items()}
            wp[key][idx] += eps
            wm[key][idx] -= eps
            num = (
                bilstm_wol_loss_and_grads(wp, ids, labels, lengths)[0]
                - bilstm_wol_loss_and_grads(wm, ids, labels, lengths)[0]
            ) / (2 * eps)
            assert abs(num - g[idx]) < 1e-6, key


def test_wol_weighting_changes_the_objective():
    """Entity positions must weigh 3× O positions: the weighted and
    unweighted losses differ whenever entities are present, and agree
    (up to the denominators) on an all-O batch."""
    from ner_funtool_ray.model.train import wol_ce_loss_and_grad

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(2, 5, 4))
    lengths = np.array([5, 5])
    with_ents = np.array([[0, 1, 2, 0, 3], [1, 1, 0, 0, 0]])
    lw, _ = wol_ce_loss_and_grad(logits, with_ents, lengths, use_weights=True)
    lu, _ = wol_ce_loss_and_grad(logits, with_ents, lengths, use_weights=False)
    assert abs(lw - lu) > 1e-9


def test_wol_training_loop_learns():
    from ner_funtool_ray.pipelines.training import train_bilstm_crf

    _, hist = train_bilstm_crf(
        SF, epochs=2, batch_size=64, n_workers=2, loss="wol_ce",
        eval_each_epoch=False,
    )
    losses = hist["mean_loss"].tolist()
    assert losses[1] < losses[0]


def test_train_deterministic_across_runs():
    from ner_funtool_ray.pipelines.training import train_bilstm_crf

    _, h1 = train_bilstm_crf(
        SF, epochs=1, batch_size=64, n_workers=2, eval_each_epoch=False
    )
    _, h2 = train_bilstm_crf(
        SF, epochs=1, batch_size=64, n_workers=2, eval_each_epoch=False
    )
    assert h1["mean_loss"].tolist() == h2["mean_loss"].tolist()


def test_bilstm_cascade_gradients_match_finite_differences():
    """model_multitask_lstm.py:67-81 loss over the BiLSTM trunk — exact
    gradients for both heads + the shared trunk."""
    from ner_funtool_ray.model.train import bilstm_cascade_loss_and_grads

    rng = np.random.default_rng(2)
    B, S = 3, 6
    ids = rng.integers(0, 11, size=(B, S)).astype(np.int32)
    lengths = np.array([6, 4, 2])
    bmeo = rng.integers(0, 5, size=(B, S)).astype(np.int32)
    attr = rng.integers(0, 4, size=(B, S)).astype(np.int32)
    w = init_weights(vocab_size=11, emb_dim=5, hidden=6, n_tags=5,
                     n_attrs=4, seed=8)
    w = {k: v.astype(np.float64) for k, v in w.items()}
    loss, grads = bilstm_cascade_loss_and_grads(w, ids, bmeo, attr, lengths)
    assert np.isfinite(loss)
    eps = 1e-5
    for key, g in grads.items():
        arr = w[key]
        for fi in rng.choice(arr.size, size=min(4, arr.size), replace=False):
            idx = np.unravel_index(fi, arr.shape)
            o = arr[idx]
            arr[idx] = o + eps
            lp = bilstm_cascade_loss_and_grads(w, ids, bmeo, attr, lengths)[0]
            arr[idx] = o - eps
            lm = bilstm_cascade_loss_and_grads(w, ids, bmeo, attr, lengths)[0]
            arr[idx] = o
            num = (lp - lm) / (2 * eps)
            tol = 1e-8 + 1e-4 * max(abs(num), abs(g[idx]))
            assert abs(num - g[idx]) <= tol, (key, idx, num, g[idx])


def test_cascade_lstm_training_loop_learns():
    """The reference's cascade_lstm_crf training (Result.MD row 6):
    loss decreases, eval reports the trans_label-combined entity F1."""
    from ner_funtool_ray.pipelines.training import train_bilstm_crf

    _, hist = train_bilstm_crf(
        SF, epochs=2, batch_size=64, n_workers=2, loss="cascade",
    )
    losses = hist["mean_loss"].tolist()
    assert losses[1] < losses[0]
    assert {"precision", "recall", "f1", "best_f1"} <= set(hist.columns)
