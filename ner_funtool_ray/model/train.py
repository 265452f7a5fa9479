"""Training for the BiLSTM+CRF tagger — the reference's missing half.

The reference is first a TRAINING toolkit: `train_lstm_crf.py:226-269`
runs the epoch loop (per-epoch shuffle via ``batch_yield``, Adam at
lr=1e-3 — :54,126 — with an optional ±5 value clip — :55,128-129), the
loss is the length-normalized CRF negative log-likelihood
(`model_lstm_crf.py:55-68`: ``-crf_log_likelihood / len``, batch mean),
and the BERT paths fine-tune with AdamW + linear warmup + linear decay
(`bert/optimization.py:48-107`: wd=0.01, betas 0.9/0.999, eps 1e-6,
LayerNorm/bias excluded from decay, global-norm clip 1.0) or the
dual-rate group optimizer (`bert/optimization.py:25-45`: separate Adams
at bert_lr=1e-4 / others_lr=1e-3, per-group global-norm clip 5.0 — T9).

This module supplies the numpy math those loops need, all exact and
finite-difference-tested:

- ``crf_nll_and_grad`` — CRF log-likelihood via the forward algorithm
  plus analytic gradients from forward-backward posteriors (the
  ``tf.contrib.crf.crf_log_likelihood`` pair);
- ``bilstm_crf_loss_and_grads`` — full backprop through projection,
  the SUMMED BiLSTM directions (BPTT mirroring
  ``bilstm_crf._lstm_direction``'s gate order/masking), and the
  embedding scatter;
- ``Adam`` / ``AdamWeightDecay`` / ``clip_by_global_norm`` /
  ``warmup_linear_decay_lr`` / ``dual_rate_step`` — the reference's
  optimizer family.

The distributed epoch loop lives in ``pipelines/training.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "crf_nll_and_grad",
    "bilstm_crf_loss_and_grads",
    "wol_ce_loss_and_grad",
    "bilstm_wol_loss_and_grads",
    "cascade_heads_loss_and_grads",
    "bilstm_cascade_loss_and_grads",
    "Adam",
    "AdamWeightDecay",
    "clip_by_global_norm",
    "warmup_linear_decay_lr",
    "dual_rate_step",
]


def _logsumexp(x: np.ndarray, axis: int) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    # all-(−inf) slices (masked-out rows, discarded by the caller's
    # np.where) must produce −inf, not NaN from (−inf) − (−inf)
    m_safe = np.where(np.isfinite(m), m, 0.0)
    s = np.exp(x - m_safe).sum(axis=axis, keepdims=True)
    with np.errstate(divide="ignore"):
        return (m_safe + np.log(s)).squeeze(axis)


def crf_nll_and_grad(
    logits: np.ndarray,
    trans: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray,
    normalize_by_length: bool = True,
):
    """Length-normalized CRF NLL (`model_lstm_crf.py:66-68`) + exact
    gradients.

    Returns ``(loss, dlogits, dtrans)`` where ``loss`` is the batch MEAN
    of ``(logZ − gold_score) / len`` and the gradients are of that mean:
    ``dlogits = (posterior − onehot(gold)) / len / B`` per valid
    position, ``dtrans`` the expected-minus-observed transition counts
    (forward-backward marginals), same normalization.

    ``normalize_by_length=False`` gives the BERT+CRF head's loss instead
    — the plain batch mean of the unnormalized NLL
    (`layers/lstm_crf_layer.py:159-164`: ``reduce_mean(-log_likelihood)``
    with no per-length division)."""
    B, S, T = logits.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    L = np.float64(0.0)
    dlogits = np.zeros((B, S, T), dtype=np.float64)
    dtrans = np.zeros((T, T), dtype=np.float64)
    lg = logits.astype(np.float64)
    tr = trans.astype(np.float64)

    # forward (log-alpha) and backward (log-beta) passes, batch-masked
    alpha = np.full((B, S, T), -np.inf)
    alpha[:, 0, :] = lg[:, 0, :]
    for t in range(1, S):
        live = t < lengths
        if not live.any():
            break
        # a[t, j] = logit[t, j] + LSE_i(a[t-1, i] + trans[i, j])
        prev = alpha[:, t - 1, :, None] + tr[None, :, :]
        alpha[:, t, :] = np.where(
            live[:, None], lg[:, t, :] + _logsumexp(prev, axis=1),
            alpha[:, t - 1, :],
        )
    last = np.maximum(lengths - 1, 0)
    logZ = _logsumexp(alpha[np.arange(B), last, :], axis=1)

    beta = np.full((B, S, T), -np.inf)
    beta[np.arange(B), last, :] = 0.0
    for t in range(S - 2, -1, -1):
        inside = (t + 1) < lengths  # position t+1 exists
        if not inside.any():
            continue
        nxt = (
            tr[None, :, :]
            + lg[:, t + 1, None, :]
            + beta[:, t + 1, None, :]
        )
        beta[:, t, :] = np.where(
            inside[:, None], _logsumexp(nxt, axis=2), beta[:, t, :]
        )

    if normalize_by_length:
        inv_len = 1.0 / np.maximum(lengths, 1).astype(np.float64)
    else:
        inv_len = np.ones(B, dtype=np.float64)
    for b in range(B):
        n = int(lengths[b])
        if n == 0:
            continue
        scale = inv_len[b] / B
        # gold path score
        gold = lg[b, np.arange(n), labels[b, :n]].sum()
        if n > 1:
            gold += tr[labels[b, : n - 1], labels[b, 1:n]].sum()
        L += (logZ[b] - gold) * inv_len[b]
        # unary posteriors − onehot
        post = np.exp(alpha[b, :n, :] + beta[b, :n, :] - logZ[b])
        g = post.copy()
        g[np.arange(n), labels[b, :n]] -= 1.0
        dlogits[b, :n, :] = g * scale
        # pairwise posteriors − observed transitions
        if n > 1:
            pair = np.exp(
                alpha[b, : n - 1, :, None]
                + tr[None, :, :]
                + lg[b, 1:n, None, :]
                + beta[b, 1:n, None, :]
                - logZ[b]
            )  # (n-1, T, T)
            dt = pair.sum(axis=0)
            np.add.at(dt, (labels[b, : n - 1], labels[b, 1:n]), -1.0)
            dtrans += dt * scale
    return L / B, dlogits, dtrans


def _lstm_forward_cache(
    x: np.ndarray, lengths: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
    reverse: bool,
):
    """``bilstm_crf._lstm_direction`` forward with per-step caches for
    BPTT — identical gate order (i, g, f, o; forget_bias=1) and
    valid-masking, so predict/train share one definition of the model."""
    B, S, D = x.shape
    H = kernel.shape[1] // 4
    w_x, w_h = kernel[:D], kernel[D:]
    z_x = (x.reshape(B * S, D) @ w_x).reshape(B, S, 4 * H) + bias
    h = np.zeros((B, H), dtype=np.float64)
    c = np.zeros((B, H), dtype=np.float64)
    out = np.zeros((B, S, H), dtype=np.float64)
    steps = list(range(S - 1, -1, -1) if reverse else range(S))
    cache = []
    for t in steps:
        z = z_x[:, t, :] + h @ w_h
        zi, zg, zf, zo = np.split(z, 4, axis=1)
        i = 1.0 / (1.0 + np.exp(-zi))
        f = 1.0 / (1.0 + np.exp(-(zf + 1.0)))
        o = 1.0 / (1.0 + np.exp(-zo))
        g = np.tanh(zg)
        valid = (t < lengths)[:, None]
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        cache.append((t, h.copy(), c.copy(), i, g, f, o, c_new, valid))
        c = np.where(valid, c_new, c)
        h = np.where(valid, h_new, h)
        out[:, t, :] = np.where(valid, h_new, 0.0)
    return out, cache


def _lstm_backward(
    x: np.ndarray, dout: np.ndarray, cache, kernel: np.ndarray
):
    """BPTT for one direction; returns (dx, dkernel, dbias)."""
    B, S, D = x.shape
    H = kernel.shape[1] // 4
    w_x, w_h = kernel[:D], kernel[D:]
    dWx = np.zeros_like(w_x, dtype=np.float64)
    dWh = np.zeros_like(w_h, dtype=np.float64)
    db = np.zeros(4 * H, dtype=np.float64)
    dx = np.zeros((B, S, D), dtype=np.float64)
    dh_carry = np.zeros((B, H), dtype=np.float64)
    dc_carry = np.zeros((B, H), dtype=np.float64)
    for t, h_prev, c_prev, i, g, f, o, c_new, valid in reversed(cache):
        v = valid.astype(np.float64)
        dh_new = (dout[:, t, :] + dh_carry) * v
        dh_pass = dh_carry * (1.0 - v)
        dc_new = dc_carry * v
        dc_pass = dc_carry * (1.0 - v)
        tc = np.tanh(c_new)
        do = dh_new * tc
        dct = dc_new + dh_new * o * (1.0 - tc * tc)
        df = dct * c_prev
        di = dct * g
        dg = dct * i
        dzo = do * o * (1.0 - o)
        dzf = df * f * (1.0 - f)
        dzi = di * i * (1.0 - i)
        dzg = dg * (1.0 - g * g)
        dz = np.concatenate([dzi, dzg, dzf, dzo], axis=1)
        dx[:, t, :] = dz @ w_x.T
        dWx += x[:, t, :].T @ dz
        dWh += h_prev.T @ dz
        db += dz.sum(axis=0)
        dh_carry = dz @ w_h.T + dh_pass
        dc_carry = dct * f + dc_pass
    return dx, np.vstack([dWx, dWh]), db


def _encoder_logits_and_grads(weights, input_ids, lengths, head_grad_fn):
    """Shared trunk for the trainers: forward embedding → summed BiLSTM
    → projection, call ``head_grad_fn(logits) -> (loss, dlogits,
    extra_grads)``, then backprop the trunk.  Returns (loss, grads)."""
    w = weights
    emb = w["embedding"].astype(np.float64)
    x = emb[input_ids]  # (B, S, D)
    fw, cache_fw = _lstm_forward_cache(
        x, lengths, w["lstm_fw_kernel"].astype(np.float64),
        w["lstm_fw_bias"].astype(np.float64), False,
    )
    bw, cache_bw = _lstm_forward_cache(
        x, lengths, w["lstm_bw_kernel"].astype(np.float64),
        w["lstm_bw_bias"].astype(np.float64), True,
    )
    enc = fw + bw  # model_lstm_crf.py:40 — summed directions
    pw = w["proj_w"].astype(np.float64)
    logits = enc @ pw + w["proj_b"].astype(np.float64)

    loss, dlogits, extra = head_grad_fn(logits)

    B, S, H = enc.shape
    dproj_w = enc.reshape(B * S, H).T @ dlogits.reshape(B * S, -1)
    dproj_b = dlogits.sum(axis=(0, 1))
    denc = dlogits @ pw.T
    dx_fw, dk_fw, db_fw = _lstm_backward(
        x, denc, cache_fw, w["lstm_fw_kernel"].astype(np.float64)
    )
    dx_bw, dk_bw, db_bw = _lstm_backward(
        x, denc, cache_bw, w["lstm_bw_kernel"].astype(np.float64)
    )
    dx = dx_fw + dx_bw
    demb = np.zeros_like(emb)
    np.add.at(demb, input_ids.reshape(-1), dx.reshape(-1, x.shape[-1]))
    grads = {
        "embedding": demb,
        "lstm_fw_kernel": dk_fw,
        "lstm_fw_bias": db_fw,
        "lstm_bw_kernel": dk_bw,
        "lstm_bw_bias": db_bw,
        "proj_w": dproj_w,
        "proj_b": dproj_b,
    }
    grads.update(extra)
    return float(loss), grads


def bilstm_crf_loss_and_grads(
    weights: dict[str, np.ndarray],
    input_ids: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray,
):
    """Loss + full gradient dict for one padded batch — backprop through
    the exact forward ``model/bilstm_crf.BiLstmCrf`` runs (embedding →
    summed fw/bw LSTM → projection → CRF NLL).  Gradient keys mirror the
    weight keys; finite-difference-tested."""

    def head(logits):
        loss, dlogits, dtrans = crf_nll_and_grad(
            logits, weights["crf_trans"], labels, lengths
        )
        return loss, dlogits, {"crf_trans": dtrans}

    return _encoder_logits_and_grads(weights, input_ids, lengths, head)


def wol_ce_loss_and_grad(
    logits: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray,
    o_index: int = 0,
    use_weights: bool = True,
):
    """The WOL TRAINING objective (`run_bert_wol.py:575-593`,
    ``use_crf=False``): per-position softmax CE, either entity-weighted
    (``masks_of_entity + 0.5``, normalized by entity count + 1e-5) or
    the plain length-masked mean, batch-averaged.  Returns (loss,
    dlogits).  Positions beyond each row's true length are masked out of
    both branches (the reference's weighted branch trains through its
    pad positions — the documented quirk; masking keeps the engine's
    losses batch-composition-invariant)."""
    B, S, T = logits.shape
    lg = logits.astype(np.float64)
    m = lg.max(axis=-1, keepdims=True)
    lse = m + np.log(np.exp(lg - m).sum(axis=-1, keepdims=True))
    logp = lg - lse
    sm = np.exp(logp)
    onehot = np.zeros((B, S, T))
    bi = np.repeat(np.arange(B), S)
    si = np.tile(np.arange(S), B)
    onehot[bi, si, labels.reshape(-1)] = 1.0
    ce = -(logp[bi, si, labels.reshape(-1)]).reshape(B, S)
    valid = (np.arange(S)[None, :] < np.asarray(lengths)[:, None]).astype(
        np.float64
    )
    if use_weights:
        masks = ((labels != o_index).astype(np.float64)) * valid
        wts = (masks + 0.5) * valid
        denom = masks.sum(axis=-1) + 1e-5
    else:
        wts = valid
        denom = np.maximum(np.asarray(lengths, dtype=np.float64), 1.0)
    per_ex = (ce * wts).sum(axis=-1) / denom
    loss = per_ex.mean()
    dce = (wts / denom[:, None])[:, :, None] / B
    dlogits = (sm - onehot) * dce
    return float(loss), dlogits


def bilstm_wol_loss_and_grads(
    weights: dict[str, np.ndarray],
    input_ids: np.ndarray,
    labels: np.ndarray,
    lengths: np.ndarray,
    o_index: int = 0,
    use_weights: bool = True,
):
    """WOL-objective twin of ``bilstm_crf_loss_and_grads`` — same trunk,
    entity-weighted softmax-CE head instead of the CRF (T5's training
    semantics).  Finite-difference-tested."""

    def head(logits):
        loss, dlogits = wol_ce_loss_and_grad(
            logits, labels, lengths, o_index, use_weights
        )
        return loss, dlogits, {}

    return _encoder_logits_and_grads(weights, input_ids, lengths, head)


def cascade_heads_loss_and_grads(
    bmeo_logits: np.ndarray,
    attr_logits: np.ndarray,
    crf_trans: np.ndarray,
    bmeo_labels: np.ndarray,
    attr_labels: np.ndarray,
    lengths: np.ndarray,
    bmeo_o_index: int = 0,
):
    """The shared cascade loss of `model_multitask_lstm.py:67-81` /
    `run_multitask_bert_crf.py:620-653` given the two heads' logits:
    length-normalized BMEO CRF NLL + attr softmax CE masked where the
    CURRENT BMEO Viterbi prediction is O (the mask comes out of
    ``crf_decode`` — non-differentiable, a stop-gradient), batch mean of
    the sum.  Positions beyond each row's true length are excluded from
    the attr mask (the engine's batch-composition-invariance rule, as in
    ``wol_ce_loss_and_grad``).  Returns
    ``(loss, dlogits_bmeo, dtrans, dlogits_attr)``."""
    from ner_funtool_ray.model.bilstm_crf import viterbi_decode_batch

    lengths = np.asarray(lengths)
    loss_b, dlogits_b, dtrans = crf_nll_and_grad(
        bmeo_logits, crf_trans, bmeo_labels, lengths,
        normalize_by_length=True,
    )
    preds_bmeo = viterbi_decode_batch(
        bmeo_logits, np.asarray(crf_trans, dtype=np.float64), lengths
    )
    B, S, A = attr_logits.shape
    valid = np.arange(S)[None, :] < lengths[:, None]
    mask = ((preds_bmeo != bmeo_o_index) & valid).astype(np.float64)
    lg = attr_logits.astype(np.float64)
    m = lg.max(axis=-1, keepdims=True)
    lse = m + np.log(np.exp(lg - m).sum(axis=-1, keepdims=True))
    logp = lg - lse
    sm = np.exp(logp)
    bi = np.repeat(np.arange(B), S)
    si = np.tile(np.arange(S), B)
    onehot = np.zeros((B, S, A))
    onehot[bi, si, attr_labels.reshape(-1)] = 1.0
    ce = -(logp[bi, si, attr_labels.reshape(-1)]).reshape(B, S)
    denom = mask.sum(axis=-1) + 1e-5  # the reference's +1e-5 (:77)
    loss_a = float(((ce * mask).sum(axis=-1) / denom).mean())
    dlogits_a = (sm - onehot) * (mask / denom[:, None])[:, :, None] / B
    return float(loss_b) + loss_a, dlogits_b, dtrans, dlogits_a


def bilstm_cascade_loss_and_grads(
    weights: dict[str, np.ndarray],
    input_ids: np.ndarray,
    bmeo_labels: np.ndarray,
    attr_labels: np.ndarray,
    lengths: np.ndarray,
):
    """Training loss + full gradients for the BiLSTM cascade
    (`model_multitask_lstm.py:5-81`, the reference's `cascade_lstm_crf`
    row): shared embedding→summed-BiLSTM trunk, BMEO-CRF + attr-CE
    heads via :func:`cascade_heads_loss_and_grads`.  Backprops BOTH
    heads' gradients through the trunk.  Finite-difference-tested."""
    w = weights
    emb = w["embedding"].astype(np.float64)
    x = emb[input_ids]
    fw, cache_fw = _lstm_forward_cache(
        x, lengths, w["lstm_fw_kernel"].astype(np.float64),
        w["lstm_fw_bias"].astype(np.float64), False,
    )
    bw, cache_bw = _lstm_forward_cache(
        x, lengths, w["lstm_bw_kernel"].astype(np.float64),
        w["lstm_bw_bias"].astype(np.float64), True,
    )
    enc = fw + bw
    pw = w["proj_w"].astype(np.float64)
    aw = w["attr_proj_w"].astype(np.float64)
    bmeo_logits = enc @ pw + w["proj_b"].astype(np.float64)
    attr_logits = enc @ aw + w["attr_proj_b"].astype(np.float64)
    loss, dlb, dtrans, dla = cascade_heads_loss_and_grads(
        bmeo_logits, attr_logits, w["crf_trans"], bmeo_labels,
        attr_labels, lengths,
    )
    B, S, H = enc.shape
    ef = enc.reshape(B * S, H)
    grads = {
        "crf_trans": dtrans,
        "proj_w": ef.T @ dlb.reshape(B * S, -1),
        "proj_b": dlb.sum(axis=(0, 1)),
        "attr_proj_w": ef.T @ dla.reshape(B * S, -1),
        "attr_proj_b": dla.sum(axis=(0, 1)),
    }
    denc = dlb @ pw.T + dla @ aw.T
    dx_fw, dk_fw, db_fw = _lstm_backward(
        x, denc, cache_fw, w["lstm_fw_kernel"].astype(np.float64)
    )
    dx_bw, dk_bw, db_bw = _lstm_backward(
        x, denc, cache_bw, w["lstm_bw_kernel"].astype(np.float64)
    )
    dx = dx_fw + dx_bw
    demb = np.zeros_like(emb)
    np.add.at(demb, input_ids.reshape(-1), dx.reshape(-1, x.shape[-1]))
    grads.update(
        {
            "embedding": demb,
            "lstm_fw_kernel": dk_fw,
            "lstm_fw_bias": db_fw,
            "lstm_bw_kernel": dk_bw,
            "lstm_bw_bias": db_bw,
        }
    )
    return loss, grads


def clip_by_global_norm(
    grads: dict[str, np.ndarray], clip_norm: float
) -> dict[str, np.ndarray]:
    """``tf.clip_by_global_norm`` semantics (`optimization.py:39-40,99`):
    scale ALL gradients by ``clip_norm / max(global_norm, clip_norm)``."""
    gn = float(np.sqrt(sum(float((g * g).sum()) for g in grads.values())))
    if gn <= clip_norm or gn == 0.0:
        return grads
    s = clip_norm / gn
    return {k: g * s for k, g in grads.items()}


def warmup_linear_decay_lr(
    step: int, init_lr: float, num_train_steps: int, num_warmup_steps: int
) -> float:
    """`optimization.py:51-77`: linear (power-1 polynomial) decay to 0
    over ``num_train_steps``, overridden by linear warmup below
    ``num_warmup_steps``."""
    decayed = init_lr * max(
        0.0, 1.0 - min(step, num_train_steps) / num_train_steps
    )
    if num_warmup_steps and step < num_warmup_steps:
        return init_lr * (step / num_warmup_steps)
    return decayed


class Adam:
    """`tf.train.AdamOptimizer` semantics (`train_lstm_crf.py:126`):
    bias-corrected moments, eps ADDED OUTSIDE the sqrt denominator the
    way TF does (update = lr·m̂ / (√v̂ + eps))."""

    def __init__(self, lr: float = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.m: dict[str, np.ndarray] = {}
        self.v: dict[str, np.ndarray] = {}
        self.t = 0

    def step(
        self, params: dict[str, np.ndarray], grads: dict[str, np.ndarray],
        lr: float | None = None,
    ) -> dict[str, np.ndarray]:
        self.t += 1
        lr = self.lr if lr is None else lr
        b1t = 1.0 - self.b1 ** self.t
        b2t = 1.0 - self.b2 ** self.t
        out = dict(params)
        for k, g in grads.items():
            m = self.m.get(k)
            if m is None:
                m = np.zeros_like(g, dtype=np.float64)
                self.v[k] = np.zeros_like(g, dtype=np.float64)
            v = self.v[k]
            m = self.b1 * m + (1.0 - self.b1) * g
            v = self.b2 * v + (1.0 - self.b2) * (g * g)
            self.m[k], self.v[k] = m, v
            upd = lr * (m / b1t) / (np.sqrt(v / b2t) + self.eps)
            out[k] = (params[k].astype(np.float64) - upd).astype(
                params[k].dtype
            )
        return out


class AdamWeightDecay:
    """`bert/optimization.py:107-…` AdamWeightDecayOptimizer: NO bias
    correction, eps 1e-6, decoupled weight decay 0.01 skipping any
    parameter whose name matches the exclude list (LayerNorm/bias —
    here the ``_ln_`` / ``_b`` naming of ``init_transformer_weights``)."""

    def __init__(self, lr: float = 1e-4, weight_decay: float = 0.01,
                 beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-6,
                 exclude_from_decay: tuple = ("_ln_", "_b", "bias")):
        self.lr, self.wd = lr, weight_decay
        self.b1, self.b2, self.eps = beta1, beta2, eps
        self.exclude = exclude_from_decay
        self.m: dict[str, np.ndarray] = {}
        self.v: dict[str, np.ndarray] = {}

    def _decays(self, name: str) -> bool:
        return not any(name.endswith(e) or e in name for e in self.exclude)

    def step(
        self, params: dict[str, np.ndarray], grads: dict[str, np.ndarray],
        lr: float | None = None,
    ) -> dict[str, np.ndarray]:
        lr = self.lr if lr is None else lr
        out = dict(params)
        for k, g in grads.items():
            m = self.m.get(k)
            if m is None:
                m = np.zeros_like(g, dtype=np.float64)
                self.v[k] = np.zeros_like(g, dtype=np.float64)
            v = self.v[k]
            m = self.b1 * m + (1.0 - self.b1) * g
            v = self.b2 * v + (1.0 - self.b2) * (g * g)
            self.m[k], self.v[k] = m, v
            upd = m / (np.sqrt(v) + self.eps)
            if self._decays(k):
                upd = upd + self.wd * params[k].astype(np.float64)
            out[k] = (params[k].astype(np.float64) - lr * upd).astype(
                params[k].dtype
            )
        return out


def dual_rate_step(
    params: dict[str, np.ndarray],
    grads: dict[str, np.ndarray],
    opt_encoder: "Adam",
    opt_other: "Adam",
    encoder_prefixes: tuple = ("word_emb", "pos_emb", "type_emb", "emb_",
                               "l0_", "l1_", "l2_", "l3_", "g0_", "g1_"),
    clip: float = 5.0,
) -> dict[str, np.ndarray]:
    """`bert/optimization.py:25-45` create_optimizer_multitask: split
    params into encoder ("bert") vs head groups, clip each group's
    gradients by global norm 5.0, apply a separate Adam to each (the
    dual-rate T9 semantics: encoder lr 1e-4, heads lr 1e-3)."""
    enc = {
        k: g for k, g in grads.items()
        if any(k.startswith(p) for p in encoder_prefixes)
    }
    other = {k: g for k, g in grads.items() if k not in enc}
    out = dict(params)
    stepped_enc = opt_encoder.step(params, clip_by_global_norm(enc, clip))
    stepped_other = opt_other.step(params, clip_by_global_norm(other, clip))
    # each step() returns a full param copy — take only each group's keys
    out.update({k: stepped_enc[k] for k in enc})
    out.update({k: stepped_other[k] for k in other})
    return out
