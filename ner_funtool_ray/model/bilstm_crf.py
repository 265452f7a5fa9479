"""Deterministic numpy BiLSTM+CRF tagger (SURVEY.md §2.4 T2-T4).

Reimplements the reference model semantics (`model_lstm_crf.py:6-68`) in
numpy, batch-vectorized, so actor-pool stages and the single-process oracle
share one deterministic implementation:

- frozen embedding lookup (`model_lstm_crf.py:25,28` — trainable=False);
- BiLSTM encoder with forward/backward outputs **summed**
  (`model_lstm_crf.py:40`: ``tf.add(rnn_fw_outputs, rnn_bw_outputs)``),
  standard LSTM cell with forget_bias=1.0 (TF LSTMCell default);
- dense projection to V logits (`model_lstm_crf.py:47`);
- CRF Viterbi decode with a transition matrix over true lengths
  (`model_lstm_crf.py:56`: ``tf.contrib.crf.crf_decode`` semantics);
- cascade variant (`run_multitask_bert_crf.py:606-653`): shared encoder →
  BMEO projection + CRF decode, attr projection + argmax; the cascade
  combination (O-propagation) happens downstream via ``trans_label``.

Weights are seed-generated (FIXTURES.md F5 stand-in for trained ckpts) and
persisted as ``.npz`` so every actor and the oracle load identical bytes.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def init_weights(
    vocab_size: int,
    emb_dim: int = 32,
    hidden: int = 32,
    n_tags: int = 5,
    n_attrs: int | None = None,
    seed: int = 7,
) -> dict[str, np.ndarray]:
    """Seed-fixed weight set.  When ``n_attrs`` is given, adds the cascade
    attr head (shared encoder, two projections)."""
    rng = np.random.default_rng(seed)

    def g(*shape):
        return rng.normal(0.0, 0.2, size=shape).astype(np.float32)

    w = {
        "embedding": g(vocab_size, emb_dim),
        "lstm_fw_kernel": g(emb_dim + hidden, 4 * hidden),
        "lstm_fw_bias": np.zeros(4 * hidden, dtype=np.float32),
        "lstm_bw_kernel": g(emb_dim + hidden, 4 * hidden),
        "lstm_bw_bias": np.zeros(4 * hidden, dtype=np.float32),
        "proj_w": g(hidden, n_tags),
        "proj_b": np.zeros(n_tags, dtype=np.float32),
        "crf_trans": g(n_tags, n_tags),
    }
    if n_attrs is not None:
        w["attr_proj_w"] = g(hidden, n_attrs)
        w["attr_proj_b"] = np.zeros(n_attrs, dtype=np.float32)
    return w


def save_weights(path: str, weights: dict[str, np.ndarray]) -> None:
    np.savez(path, **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _lstm_direction(
    x: np.ndarray, lengths: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
    reverse: bool,
) -> np.ndarray:
    """One LSTM direction over a padded batch.

    x: (B, S, D); returns (B, S, H) hidden states.  Gate order i, g, f, o
    with forget_bias=1.0 (TF LSTMCell convention); steps beyond a row's
    true length produce zeros, matching ``bidirectional_dynamic_rnn``'s
    ``sequence_length`` behavior.
    """
    B, S, D = x.shape
    H = kernel.shape[1] // 4
    h = np.zeros((B, H), dtype=np.float32)
    c = np.zeros((B, H), dtype=np.float32)
    out = np.zeros((B, S, H), dtype=np.float32)
    # hoist the input projection out of the time loop: one (B*S, D) matmul
    # instead of S small ones; the loop only does the recurrent h @ Wh
    w_x, w_h = kernel[:D], kernel[D:]
    z_x = (x.reshape(B * S, D) @ w_x).reshape(B, S, 4 * H) + bias
    steps = range(S - 1, -1, -1) if reverse else range(S)
    for t in steps:
        z = z_x[:, t, :] + h @ w_h
        i, g, f, o = np.split(z, 4, axis=1)
        valid = (t < lengths)[:, None]  # within the row's true length
        i = _sigmoid(i)
        f = _sigmoid(f + 1.0)
        o = _sigmoid(o)
        g = np.tanh(g)
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        c = np.where(valid, c_new, c)
        h = np.where(valid, h_new, h)
        out[:, t, :] = np.where(valid, h_new, 0.0)
    return out


def viterbi_decode_batch(
    logits: np.ndarray, trans: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Batch Viterbi — ``tf.contrib.crf.crf_decode`` semantics.

    logits: (B, S, V) unary potentials; trans: (V, V) with trans[i, j] =
    score of i→j; lengths: (B,) true lengths.  Returns (B, S) int32 best
    paths; positions ≥ length are 0.  Vectorized over batch and tags; the
    only Python loop is over time.
    """
    B, S, V = logits.shape
    score = logits[:, 0, :].copy()  # (B, V)
    backp = np.zeros((B, S, V), dtype=np.int32)
    # transposed layout: cand[b, j, i] = score[b, i] + trans[i, j] puts the
    # argmax on the contiguous last axis (~30% faster than axis=1)
    trans_t = np.ascontiguousarray(trans.T)
    for t in range(1, S):
        cand = score[:, None, :] + trans_t[None, :, :]
        best_prev = cand.argmax(axis=2)  # (B, V): best i for each j
        best_score = np.take_along_axis(cand, best_prev[:, :, None], axis=2)[:, :, 0]
        new_score = best_score + logits[:, t, :]
        active = (t < lengths)[:, None]
        score = np.where(active, new_score, score)
        backp[:, t, :] = np.where(active, best_prev, 0)
    # vectorized backtrack (loop over time only)
    paths = np.zeros((B, S), dtype=np.int32)
    tag = score.argmax(axis=1).astype(np.int32)
    rows = np.arange(B)
    valid = lengths > 0
    paths[rows[valid], (lengths - 1)[valid]] = tag[valid]
    cur = tag.copy()
    for t in range(S - 1, 0, -1):
        active = t <= lengths - 1
        prev = backp[rows, t, cur]
        paths[:, t - 1] = np.where(active, prev, paths[:, t - 1])
        cur = np.where(active, prev, cur).astype(np.int32)
    return paths


def softmax_decode_batch(
    logits: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """The ``use_crf=False`` head (`lstm_crf_layer.py:129-135` softmax
    branch / `run_multitask_bert_crf.py:71-76`): per-position argmax of
    the unary logits, no transition model.  Returns (B, S) int32 paths;
    positions ≥ length are 0, matching :func:`viterbi_decode_batch`."""
    B, S, _ = logits.shape
    paths = logits.argmax(axis=2).astype(np.int32)
    mask = np.arange(S)[None, :] < lengths[:, None]
    return np.where(mask, paths, 0).astype(np.int32)


class BiLstmCrf:
    """Deterministic numpy tagger: ids → BMES tag-id paths.

    ``predict(input_ids, lengths)`` is a pure function of the weights —
    identical results in any process → exact Ray-vs-oracle parity.
    ``use_crf=False`` swaps Viterbi for the per-position softmax argmax
    (`lstm_crf_layer.py` softmax branch)."""

    def __init__(self, weights: dict[str, np.ndarray], use_crf: bool = True):
        self.w = weights
        self.n_tags = weights["proj_w"].shape[1]
        self.use_crf = use_crf

    def encode(self, input_ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        emb = self.w["embedding"][input_ids]  # (B, S, D)
        fw = _lstm_direction(
            emb, lengths, self.w["lstm_fw_kernel"], self.w["lstm_fw_bias"], False
        )
        bw = _lstm_direction(
            emb, lengths, self.w["lstm_bw_kernel"], self.w["lstm_bw_bias"], True
        )
        return fw + bw  # model_lstm_crf.py:40 — summed, not concatenated

    def logits(self, input_ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        return self.encode(input_ids, lengths) @ self.w["proj_w"] + self.w["proj_b"]

    def predict(self, input_ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(B, S) int ids, (B,) lengths → (B, S) best tag-id paths."""
        logits = self.logits(input_ids, lengths)
        if not self.use_crf:
            return softmax_decode_batch(logits, lengths)
        return viterbi_decode_batch(logits, self.w["crf_trans"], lengths)


class CascadeTagger(BiLstmCrf):
    """Cascade BMEO + attr heads over the shared encoder
    (`run_multitask_bert_crf.py:606-653` semantics): BMEO via CRF decode,
    attr via per-position argmax.  Combination/O-masking is applied
    downstream by ``trans_label`` (`ner_utils.py:9-39`)."""

    def predict_cascade(
        self, input_ids: np.ndarray, lengths: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        enc = self.encode(input_ids, lengths)
        bmeo_logits = enc @ self.w["proj_w"] + self.w["proj_b"]
        attr_logits = enc @ self.w["attr_proj_w"] + self.w["attr_proj_b"]
        bmeo = viterbi_decode_batch(bmeo_logits, self.w["crf_trans"], lengths)
        attr = attr_logits.argmax(axis=2).astype(np.int32)
        mask = np.arange(input_ids.shape[1])[None, :] < lengths[:, None]
        return bmeo, np.where(mask, attr, 0)
