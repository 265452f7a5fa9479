"""Training for the transformer-encoder taggers — exact numpy backprop
through the BERT / ALBERT encoders of ``model/transformer.py``.

The reference fine-tunes these encoders end-to-end: `run_bert_crf.py`
trains BERT→CRF (loss = ``reduce_mean(-log_likelihood)``, UNnormalized —
`layers/lstm_crf_layer.py:159-164`), `run_multitask_bert_crf.py:620-653`
trains the cascade pair (length-normalized BMEO CRF NLL + attr softmax
CE masked by ``preds_bmeo != O`` — the mask is an argmax/Viterbi output,
i.e. a stop-gradient), `run_bert_wol.py:575-593` swaps in the
entity-weighted CE, and the ``use_lstm`` flag stacks a BiLSTM head
(`lstm_crf_layer.py:88-127` ``crf_only=False``).  ALBERT's cross-layer
sharing (`bert/modeling_albert.py:1091-1098`) means one group weight is
APPLIED n_layers times — its gradient is the sum over applications,
which falls out of accumulating into one key here.

Everything is float64 and finite-difference-tested
(``tests/test_train_transformer.py``); the forward replicates
``TransformerEncoder.encode`` / ``AlbertEncoder.encode`` op-for-op so a
trained weight dict drops straight into the serving classes.
"""

from __future__ import annotations

import numpy as np

from ner_funtool_ray.model.train import (
    _lstm_backward,
    _lstm_forward_cache,
    cascade_heads_loss_and_grads,
    crf_nll_and_grad,
    wol_ce_loss_and_grad,
)
from ner_funtool_ray.model.transformer import _GELU_C

__all__ = [
    "transformer_forward_cache",
    "transformer_backward",
    "bert_crf_loss_and_grads",
    "bert_wol_loss_and_grads",
    "bert_cascade_loss_and_grads",
    "bert_bilstm_crf_loss_and_grads",
]

_LN_EPS = 1e-12  # layer_norm's eps in model/transformer.py


def _ln_forward(x, gamma, beta):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    istd = 1.0 / np.sqrt(var + _LN_EPS)
    xhat = (x - mu) * istd
    return xhat * gamma + beta, (xhat, istd)


def _ln_backward(dy, cache, gamma):
    xhat, istd = cache
    axes = tuple(range(dy.ndim - 1))
    dgamma = (dy * xhat).sum(axis=axes)
    dbeta = dy.sum(axis=axes)
    dxhat = dy * gamma
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    return istd * (dxhat - m1 - xhat * m2), dgamma, dbeta


def _gelu_grad(x):
    u = _GELU_C * (x + 0.044715 * (x * x * x))
    t = np.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * _GELU_C * (
        1.0 + 3.0 * 0.044715 * x * x
    )


def _layer_keys(w):
    """Per-application weight-key prefixes: BERT = one per layer
    (``l{i}_``), ALBERT = the group-selection rule of
    `modeling_albert.py:1093` (``g{gi}_``, shared across layers)."""
    n_layers = int(w["n_layers"])
    if "emb_proj_w" in w:
        n_groups = int(w["n_groups"])
        return [
            f"g{int(i / n_layers * n_groups)}_" for i in range(n_layers)
        ]
    return [f"l{i}_" for i in range(n_layers)]


def transformer_forward_cache(
    w: dict[str, np.ndarray],
    input_ids: np.ndarray,
    input_mask: np.ndarray,
    segment_ids: np.ndarray | None = None,
):
    """Float64 twin of ``TransformerEncoder.encode`` /
    ``AlbertEncoder.encode`` that keeps every intermediate needed for
    backprop.  Returns ``(enc, cache)``."""
    B, S = input_ids.shape
    if segment_ids is None:
        segment_ids = np.zeros_like(input_ids)
    nh = int(w["n_heads"])

    def f64(k):
        return w[k].astype(np.float64)

    x0 = (
        f64("word_emb")[input_ids]
        + f64("pos_emb")[:S][None, :, :]
        + f64("type_emb")[segment_ids]
    )
    x, emb_ln_cache = _ln_forward(x0, f64("emb_ln_g"), f64("emb_ln_b"))
    albert = "emb_proj_w" in w
    x_ln_e = x
    if albert:
        x = x @ f64("emb_proj_w") + f64("emb_proj_b")
    H = x.shape[-1]
    hd = H // nh
    adder = (1.0 - input_mask.astype(np.float64))[:, None, None, :] * -10000.0
    layers = []
    for kp in _layer_keys(w):
        x_in = x
        q = (x @ f64(kp + "q_w") + f64(kp + "q_b")).reshape(
            B, S, nh, hd
        ).transpose(0, 2, 1, 3)
        k = (x @ f64(kp + "k_w") + f64(kp + "k_b")).reshape(
            B, S, nh, hd
        ).transpose(0, 2, 1, 3)
        v = (x @ f64(kp + "v_w") + f64(kp + "v_b")).reshape(
            B, S, nh, hd
        ).transpose(0, 2, 1, 3)
        scores = (q @ k.swapaxes(-1, -2)) / np.sqrt(hd) + adder
        scores -= scores.max(axis=-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(axis=-1, keepdims=True)
        ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, S, H)
        attn_out = ctx @ f64(kp + "ao_w") + f64(kp + "ao_b")
        h1, ln1_cache = _ln_forward(
            x_in + attn_out, f64(kp + "attn_ln_g"), f64(kp + "attn_ln_b")
        )
        ff_pre = h1 @ f64(kp + "ff1_w") + f64(kp + "ff1_b")
        u = _GELU_C * (ff_pre + 0.044715 * (ff_pre * ff_pre * ff_pre))
        ffa = 0.5 * ff_pre * (1.0 + np.tanh(u))
        ff_out = ffa @ f64(kp + "ff2_w") + f64(kp + "ff2_b")
        x, ln2_cache = _ln_forward(
            h1 + ff_out, f64(kp + "out_ln_g"), f64(kp + "out_ln_b")
        )
        layers.append(
            (kp, x_in, q, k, v, p, ctx, ln1_cache, h1, ff_pre, ffa, ln2_cache)
        )
    cache = {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "emb_ln_cache": emb_ln_cache,
        "x_ln_e": x_ln_e,
        "albert": albert,
        "layers": layers,
        "nh": nh,
    }
    return x, cache


def _acc(grads: dict, key: str, val: np.ndarray) -> None:
    # += accumulation is exactly what makes ALBERT's shared group weights
    # receive the sum of their per-application gradients
    if key in grads:
        grads[key] = grads[key] + val
    else:
        grads[key] = val


def transformer_backward(
    w: dict[str, np.ndarray], cache: dict, denc: np.ndarray
) -> dict[str, np.ndarray]:
    """Backprop ``denc`` (gradient w.r.t. the encoder output) through
    every layer and the embeddings; returns the gradient dict."""
    nh = cache["nh"]
    grads: dict[str, np.ndarray] = {}
    dx = denc

    def f64(k):
        return w[k].astype(np.float64)

    for (
        kp, x_in, q, k, v, p, ctx, ln1_cache, h1, ff_pre, ffa, ln2_cache,
    ) in reversed(cache["layers"]):
        B, S, H = x_in.shape
        hd = H // nh
        # out LayerNorm
        d_fin, dg2, db2 = _ln_backward(dx, ln2_cache, f64(kp + "out_ln_g"))
        _acc(grads, kp + "out_ln_g", dg2)
        _acc(grads, kp + "out_ln_b", db2)
        # feed-forward (+ residual into h1)
        dh1 = d_fin.copy()
        dff_out = d_fin
        _acc(
            grads, kp + "ff2_w",
            ffa.reshape(-1, ffa.shape[-1]).T @ dff_out.reshape(-1, H),
        )
        _acc(grads, kp + "ff2_b", dff_out.sum(axis=(0, 1)))
        dffa = dff_out @ f64(kp + "ff2_w").T
        dff_pre = dffa * _gelu_grad(ff_pre)
        _acc(
            grads, kp + "ff1_w",
            h1.reshape(-1, H).T @ dff_pre.reshape(-1, dff_pre.shape[-1]),
        )
        _acc(grads, kp + "ff1_b", dff_pre.sum(axis=(0, 1)))
        dh1 += dff_pre @ f64(kp + "ff1_w").T
        # attn LayerNorm
        d_ain, dg1, db1 = _ln_backward(dh1, ln1_cache, f64(kp + "attn_ln_g"))
        _acc(grads, kp + "attn_ln_g", dg1)
        _acc(grads, kp + "attn_ln_b", db1)
        dx = d_ain.copy()  # residual into x_in
        d_attn_out = d_ain
        _acc(
            grads, kp + "ao_w",
            ctx.reshape(-1, H).T @ d_attn_out.reshape(-1, H),
        )
        _acc(grads, kp + "ao_b", d_attn_out.sum(axis=(0, 1)))
        dctx = (d_attn_out @ f64(kp + "ao_w").T).reshape(
            B, S, nh, hd
        ).transpose(0, 2, 1, 3)
        dp = dctx @ v.swapaxes(-1, -2)
        dv = p.swapaxes(-1, -2) @ dctx
        ds = (dp - (dp * p).sum(axis=-1, keepdims=True)) * p
        ds /= np.sqrt(hd)
        dq = ds @ k
        dk = ds.swapaxes(-1, -2) @ q
        for name, dhm in (("q", dq), ("k", dk), ("v", dv)):
            dflat = dhm.transpose(0, 2, 1, 3).reshape(B, S, H)
            _acc(
                grads, kp + name + "_w",
                x_in.reshape(-1, H).T @ dflat.reshape(-1, H),
            )
            _acc(grads, kp + name + "_b", dflat.sum(axis=(0, 1)))
            dx += dflat @ f64(kp + name + "_w").T

    if cache["albert"]:
        x_ln_e = cache["x_ln_e"]
        E = x_ln_e.shape[-1]
        H = dx.shape[-1]
        grads["emb_proj_w"] = (
            x_ln_e.reshape(-1, E).T @ dx.reshape(-1, H)
        )
        grads["emb_proj_b"] = dx.sum(axis=(0, 1))
        dx = dx @ f64("emb_proj_w").T
    dx0, dgE, dbE = _ln_backward(dx, cache["emb_ln_cache"], f64("emb_ln_g"))
    grads["emb_ln_g"] = dgE
    grads["emb_ln_b"] = dbE
    ids = cache["input_ids"]
    seg = cache["segment_ids"]
    B, S = ids.shape
    E = dx0.shape[-1]
    dword = np.zeros((w["word_emb"].shape[0], E), dtype=np.float64)
    np.add.at(dword, ids.reshape(-1), dx0.reshape(-1, E))
    grads["word_emb"] = dword
    dpos = np.zeros((w["pos_emb"].shape[0], E), dtype=np.float64)
    dpos[:S] = dx0.sum(axis=0)
    grads["pos_emb"] = dpos
    dtype_ = np.zeros((w["type_emb"].shape[0], E), dtype=np.float64)
    np.add.at(dtype_, seg.reshape(-1), dx0.reshape(-1, E))
    grads["type_emb"] = dtype_
    return grads


def _proj_head_backward(w, cache, enc, dlogits, proj_key="proj"):
    """dense-projection grads + encoder backprop for one head."""
    B, S, H = enc.shape
    grads = {
        f"{proj_key}_w": enc.reshape(-1, H).T
        @ dlogits.reshape(-1, dlogits.shape[-1]),
        f"{proj_key}_b": dlogits.sum(axis=(0, 1)),
    }
    denc = dlogits @ w[f"{proj_key}_w"].astype(np.float64).T
    return grads, denc


def bert_crf_loss_and_grads(
    w: dict[str, np.ndarray],
    input_ids: np.ndarray,
    input_mask: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray | None = None,
    segment_ids: np.ndarray | None = None,
):
    """BERT(/ALBERT)→dense→CRF fine-tuning loss + full gradient dict.
    Loss = batch mean of the UNnormalized CRF NLL
    (`lstm_crf_layer.py:159-164`)."""
    if lengths is None:
        lengths = input_mask.astype(np.int64).sum(axis=1)
    enc, cache = transformer_forward_cache(w, input_ids, input_mask, segment_ids)
    logits = enc @ w["proj_w"].astype(np.float64) + w["proj_b"].astype(
        np.float64
    )
    loss, dlogits, dtrans = crf_nll_and_grad(
        logits, w["crf_trans"], labels, lengths, normalize_by_length=False
    )
    grads, denc = _proj_head_backward(w, cache, enc, dlogits)
    grads["crf_trans"] = dtrans
    grads.update(transformer_backward(w, cache, denc))
    return float(loss), grads


def bert_wol_loss_and_grads(
    w: dict[str, np.ndarray],
    input_ids: np.ndarray,
    input_mask: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray | None = None,
    segment_ids: np.ndarray | None = None,
    o_index: int = 0,
    use_weights: bool = True,
):
    """The actual reference WOL pairing — `run_bert_wol.py:575-593`
    trains the BERT encoder under the entity-weighted softmax CE
    (``masks_of_entity + 0.5``), no CRF."""
    if lengths is None:
        lengths = input_mask.astype(np.int64).sum(axis=1)
    enc, cache = transformer_forward_cache(w, input_ids, input_mask, segment_ids)
    logits = enc @ w["proj_w"].astype(np.float64) + w["proj_b"].astype(
        np.float64
    )
    loss, dlogits = wol_ce_loss_and_grad(
        logits, labels, lengths, o_index=o_index, use_weights=use_weights
    )
    grads, denc = _proj_head_backward(w, cache, enc, dlogits)
    grads.update(transformer_backward(w, cache, denc))
    return float(loss), grads


def bert_cascade_loss_and_grads(
    w: dict[str, np.ndarray],
    input_ids: np.ndarray,
    input_mask: np.ndarray,
    bmeo_labels: np.ndarray,
    attr_labels: np.ndarray,
    lengths: np.ndarray | None = None,
    segment_ids: np.ndarray | None = None,
    bmeo_o_index: int = 0,
):
    """The cascade training loss (`run_multitask_bert_crf.py:620-653`):

    - BMEO head: length-normalized CRF NLL per example;
    - attr head: per-position softmax CE, masked where the CURRENT
      Viterbi prediction of the BMEO head is ``O`` (:648-650) — the mask
      comes out of ``crf_decode``, a non-differentiable path, so no
      gradient flows through it (exactly TF's behavior);
    - loss = batch mean of (bmeo_nll/len + masked attr CE).

    Deviation (documented, matches ``wol_ce_loss_and_grad``): positions
    beyond each row's true length are excluded from the attr mask, so
    losses are batch-composition-invariant."""
    if lengths is None:
        lengths = input_mask.astype(np.int64).sum(axis=1)
    enc, cache = transformer_forward_cache(w, input_ids, input_mask, segment_ids)
    bmeo_logits = enc @ w["proj_w"].astype(np.float64) + w["proj_b"].astype(
        np.float64
    )
    attr_logits = enc @ w["attr_proj_w"].astype(np.float64) + w[
        "attr_proj_b"
    ].astype(np.float64)
    loss, dlogits_b, dtrans, dlogits_a = cascade_heads_loss_and_grads(
        bmeo_logits, attr_logits, w["crf_trans"], bmeo_labels, attr_labels,
        lengths, bmeo_o_index=bmeo_o_index,
    )
    grads_b, denc_b = _proj_head_backward(w, cache, enc, dlogits_b, "proj")
    grads_a, denc_a = _proj_head_backward(
        w, cache, enc, dlogits_a, "attr_proj"
    )
    grads = {**grads_b, **grads_a, "crf_trans": dtrans}
    grads.update(transformer_backward(w, cache, denc_b + denc_a))
    return loss, grads


def bert_bilstm_crf_loss_and_grads(
    w: dict[str, np.ndarray],
    input_ids: np.ndarray,
    input_mask: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray | None = None,
    segment_ids: np.ndarray | None = None,
):
    """Stacked-head fine-tuning (``use_lstm`` —
    `lstm_crf_layer.py:88-127` ``crf_only=False``): transformer encoder
    → BiLSTM (fw/bw CONCAT) → tanh hidden → projection → CRF, full
    backprop including BPTT through both LSTM directions.  Loss is the
    unnormalized batch-mean NLL like the other lstm_crf_layer heads."""
    if lengths is None:
        lengths = input_mask.astype(np.int64).sum(axis=1)
    lengths = np.asarray(lengths)
    enc, cache = transformer_forward_cache(w, input_ids, input_mask, segment_ids)
    fw, cache_fw = _lstm_forward_cache(
        enc, lengths, w["lstm_fw_kernel"].astype(np.float64),
        w["lstm_fw_bias"].astype(np.float64), False,
    )
    bw, cache_bw = _lstm_forward_cache(
        enc, lengths, w["lstm_bw_kernel"].astype(np.float64),
        w["lstm_bw_bias"].astype(np.float64), True,
    )
    cat = np.concatenate([fw, bw], axis=-1)
    hw = w["stack_hid_w"].astype(np.float64)
    pre = cat @ hw + w["stack_hid_b"].astype(np.float64)
    hid = np.tanh(pre)
    pw = w["stack_proj_w"].astype(np.float64)
    logits = hid @ pw + w["stack_proj_b"].astype(np.float64)
    loss, dlogits, dtrans = crf_nll_and_grad(
        logits, w["crf_trans"], labels, lengths, normalize_by_length=False
    )
    B, S, Hh = hid.shape
    grads = {
        "crf_trans": dtrans,
        "stack_proj_w": hid.reshape(-1, Hh).T
        @ dlogits.reshape(-1, dlogits.shape[-1]),
        "stack_proj_b": dlogits.sum(axis=(0, 1)),
    }
    dhid = dlogits @ pw.T
    dpre = dhid * (1.0 - hid * hid)
    grads["stack_hid_w"] = (
        cat.reshape(-1, cat.shape[-1]).T @ dpre.reshape(-1, Hh)
    )
    grads["stack_hid_b"] = dpre.sum(axis=(0, 1))
    dcat = dpre @ hw.T
    Hl = fw.shape[-1]
    denc_fw, dk_fw, db_fw = _lstm_backward(
        enc, dcat[:, :, :Hl], cache_fw, w["lstm_fw_kernel"].astype(np.float64)
    )
    denc_bw, dk_bw, db_bw = _lstm_backward(
        enc, dcat[:, :, Hl:], cache_bw, w["lstm_bw_kernel"].astype(np.float64)
    )
    grads.update(
        {
            "lstm_fw_kernel": dk_fw,
            "lstm_fw_bias": db_fw,
            "lstm_bw_kernel": dk_bw,
            "lstm_bw_bias": db_bw,
        }
    )
    grads.update(transformer_backward(w, cache, denc_fw + denc_bw))
    return float(loss), grads
