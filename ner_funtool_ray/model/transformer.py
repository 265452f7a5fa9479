"""Deterministic numpy transformer (BERT-style) encoder + CRF/cascade heads
(SURVEY §2.4 T3/T4).

Reimplements the reference's BERT encoder structure
(`bert/modeling_bert.py:106-238`) in seeded numpy so the "BERT" model paths
run a genuinely distinct architecture from the BiLSTM (T2), consuming the
wordpiece feature columns (`input_ids` / `input_mask` / `segment_ids`) the
encode stage produces (`run_bert_crf.py:340-433` semantics):

- embeddings = word + position + token-type, then LayerNorm
  (`modeling_bert.py:169-196` embedding_lookup/embedding_postprocessor);
- N transformer layers: multi-head self-attention with an additive
  −10⁴ mask for padded positions (`modeling_bert.py:558-565`
  attention_mask → adder), residual + LayerNorm, GELU feed-forward,
  residual + LayerNorm (`transformer_model`, :606-700);
- heads: dense projection → CRF Viterbi decode (T3, the
  ``crf_only=True`` path of `run_bert_crf.py:505-542`), or the cascade
  pair BMEO-CRF + attr-argmax (T4, `run_multitask_bert_crf.py:606-653`).

Weights are seed-generated (FIXTURES.md F5 stand-in for trained ckpts) and
persistable as ``.npz``; ``predict`` is a pure function of the weights, so
Ray actor pools and the single-process oracle are exactly parity-testable.
Everything is batch-vectorized; the only Python loop is over layers.
"""

from __future__ import annotations

import numpy as np

from ner_funtool_ray.model.bilstm_crf import viterbi_decode_batch


_GELU_C = float(np.sqrt(2.0 / np.pi))


def gelu(x: np.ndarray) -> np.ndarray:
    """Gaussian Error Linear Unit — the tanh approximation the reference
    uses (`modeling_bert.py:264-277`).  x*x*x instead of power(x,3): same
    values, ~3× faster in numpy."""
    return 0.5 * x * (1.0 + np.tanh(_GELU_C * (x + 0.044715 * (x * x * x))))


def layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
               eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def init_transformer_weights(
    vocab_size: int,
    hidden: int = 48,
    n_layers: int = 2,
    n_heads: int = 4,
    intermediate: int = 96,
    max_position: int = 160,
    n_tags: int = 5,
    n_attrs: int | None = None,
    type_vocab: int = 2,
    seed: int = 11,
) -> dict[str, np.ndarray]:
    """Seed-fixed BERT-style weight set; ``n_attrs`` adds the cascade attr
    head (shared encoder, two projections — T4)."""
    assert hidden % n_heads == 0
    rng = np.random.default_rng(seed)

    def g(*shape):
        return rng.normal(0.0, 0.08, size=shape).astype(np.float32)

    w: dict[str, np.ndarray] = {
        "word_emb": g(vocab_size, hidden),
        "pos_emb": g(max_position, hidden),
        "type_emb": g(type_vocab, hidden),
        "emb_ln_g": np.ones(hidden, dtype=np.float32),
        "emb_ln_b": np.zeros(hidden, dtype=np.float32),
        "n_layers": np.array(n_layers),
        "n_heads": np.array(n_heads),
    }
    for i in range(n_layers):
        w[f"l{i}_q_w"] = g(hidden, hidden)
        w[f"l{i}_q_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_k_w"] = g(hidden, hidden)
        w[f"l{i}_k_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_v_w"] = g(hidden, hidden)
        w[f"l{i}_v_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_ao_w"] = g(hidden, hidden)
        w[f"l{i}_ao_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_attn_ln_g"] = np.ones(hidden, dtype=np.float32)
        w[f"l{i}_attn_ln_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_ff1_w"] = g(hidden, intermediate)
        w[f"l{i}_ff1_b"] = np.zeros(intermediate, dtype=np.float32)
        w[f"l{i}_ff2_w"] = g(intermediate, hidden)
        w[f"l{i}_ff2_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"l{i}_out_ln_g"] = np.ones(hidden, dtype=np.float32)
        w[f"l{i}_out_ln_b"] = np.zeros(hidden, dtype=np.float32)
    w["proj_w"] = g(hidden, n_tags)
    w["proj_b"] = np.zeros(n_tags, dtype=np.float32)
    w["crf_trans"] = rng.normal(0.0, 0.2, size=(n_tags, n_tags)).astype(np.float32)
    if n_attrs is not None:
        w["attr_proj_w"] = g(hidden, n_attrs)
        w["attr_proj_b"] = np.zeros(n_attrs, dtype=np.float32)
    return w


class TransformerEncoder:
    """ids/mask/segments → (B, S, H) hidden states, numpy, deterministic."""

    def __init__(self, weights: dict[str, np.ndarray], use_crf: bool = True):
        self.w = weights
        self.use_crf = use_crf
        self.n_layers = int(weights["n_layers"])
        self.n_heads = int(weights["n_heads"])

    def encode(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        w = self.w
        B, S = input_ids.shape
        if segment_ids is None:
            segment_ids = np.zeros_like(input_ids)
        x = (
            w["word_emb"][input_ids]
            + w["pos_emb"][:S][None, :, :]
            + w["type_emb"][segment_ids]
        )
        x = layer_norm(x, w["emb_ln_g"], w["emb_ln_b"])
        H = x.shape[-1]
        nh = self.n_heads
        hd = H // nh
        # additive attention adder: 0 for real tokens, −1e4 for padding
        # (modeling_bert.py:558-565)
        adder = (1.0 - input_mask.astype(np.float32))[:, None, None, :] * -10000.0
        for i in range(self.n_layers):
            # head-major (B, nh, S, hd) layouts so the attention products
            # run as batched BLAS matmuls (einsum without optimize= falls
            # back to naive C loops — measured 4× slower)
            q = (
                (x @ w[f"l{i}_q_w"] + w[f"l{i}_q_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            k = (
                (x @ w[f"l{i}_k_w"] + w[f"l{i}_k_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            v = (
                (x @ w[f"l{i}_v_w"] + w[f"l{i}_v_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            # (B, nh, S, S) scaled dot-product scores
            scores = (q @ k.swapaxes(-1, -2)) / np.sqrt(hd) + adder
            scores -= scores.max(axis=-1, keepdims=True)  # stable softmax
            p = np.exp(scores)
            p /= p.sum(axis=-1, keepdims=True)
            ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, S, H)
            attn_out = ctx @ w[f"l{i}_ao_w"] + w[f"l{i}_ao_b"]
            x = layer_norm(
                x + attn_out, w[f"l{i}_attn_ln_g"], w[f"l{i}_attn_ln_b"]
            )
            ff = gelu(x @ w[f"l{i}_ff1_w"] + w[f"l{i}_ff1_b"])
            ff = ff @ w[f"l{i}_ff2_w"] + w[f"l{i}_ff2_b"]
            x = layer_norm(x + ff, w[f"l{i}_out_ln_g"], w[f"l{i}_out_ln_b"])
        return x


class BertCrf(TransformerEncoder):
    """T3: transformer encoder → dense → CRF Viterbi over true lengths
    (the ``crf_only=True`` head of `run_bert_crf.py:505-542`);
    ``use_crf=False`` decodes by per-position softmax argmax instead
    (`lstm_crf_layer.py:129-135` softmax branch)."""

    def predict(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        from ner_funtool_ray.model.bilstm_crf import softmax_decode_batch

        enc = self.encode(input_ids, input_mask, segment_ids)
        logits = enc @ self.w["proj_w"] + self.w["proj_b"]
        lengths = input_mask.astype(np.int32).sum(axis=1)
        if not self.use_crf:
            return softmax_decode_batch(logits, lengths)
        return viterbi_decode_batch(logits, self.w["crf_trans"], lengths)


def init_albert_weights(
    vocab_size: int,
    embedding_size: int = 24,
    hidden: int = 48,
    n_layers: int = 4,
    n_groups: int = 1,
    n_heads: int = 4,
    intermediate: int = 96,
    max_position: int = 160,
    n_tags: int = 5,
    type_vocab: int = 2,
    seed: int = 13,
) -> dict[str, np.ndarray]:
    """Seed-fixed ALBERT-structured weight set — the two structural moves
    of `bert/modeling_albert.py`:

    - FACTORIZED embeddings: word/pos/type tables live at
      ``embedding_size`` E < H (`modeling_albert.py:484-526`
      embedding_lookup at E) and one ``emb_proj`` matrix maps E→H before
      the first layer (`:1085-1088` embedding_hidden_mapping_in);
    - CROSS-LAYER SHARING: parameters exist once per GROUP, not per
      layer (`:1091-1098` ``reuse=tf.AUTO_REUSE`` under ``group_%d``);
      ``n_layers`` only sets how many times the group weights are
      APPLIED, so the parameter count is independent of depth.
    """
    assert hidden % n_heads == 0
    rng = np.random.default_rng(seed)

    def g(*shape):
        return rng.normal(0.0, 0.08, size=shape).astype(np.float32)

    w: dict[str, np.ndarray] = {
        "word_emb": g(vocab_size, embedding_size),
        "pos_emb": g(max_position, embedding_size),
        "type_emb": g(type_vocab, embedding_size),
        "emb_ln_g": np.ones(embedding_size, dtype=np.float32),
        "emb_ln_b": np.zeros(embedding_size, dtype=np.float32),
        "emb_proj_w": g(embedding_size, hidden),
        "emb_proj_b": np.zeros(hidden, dtype=np.float32),
        "n_layers": np.array(n_layers),
        "n_groups": np.array(n_groups),
        "n_heads": np.array(n_heads),
    }
    for gi in range(n_groups):
        w[f"g{gi}_q_w"] = g(hidden, hidden)
        w[f"g{gi}_q_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_k_w"] = g(hidden, hidden)
        w[f"g{gi}_k_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_v_w"] = g(hidden, hidden)
        w[f"g{gi}_v_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_ao_w"] = g(hidden, hidden)
        w[f"g{gi}_ao_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_attn_ln_g"] = np.ones(hidden, dtype=np.float32)
        w[f"g{gi}_attn_ln_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_ff1_w"] = g(hidden, intermediate)
        w[f"g{gi}_ff1_b"] = np.zeros(intermediate, dtype=np.float32)
        w[f"g{gi}_ff2_w"] = g(intermediate, hidden)
        w[f"g{gi}_ff2_b"] = np.zeros(hidden, dtype=np.float32)
        w[f"g{gi}_out_ln_g"] = np.ones(hidden, dtype=np.float32)
        w[f"g{gi}_out_ln_b"] = np.zeros(hidden, dtype=np.float32)
    w["proj_w"] = g(hidden, n_tags)
    w["proj_b"] = np.zeros(n_tags, dtype=np.float32)
    w["crf_trans"] = rng.normal(0.0, 0.2, size=(n_tags, n_tags)).astype(
        np.float32
    )
    return w


class AlbertEncoder:
    """ALBERT-structured encoder: factorized E-wide embeddings projected
    once to H, then ``n_layers`` applications of the per-group shared
    layer weights (`modeling_albert.py:1020-1120` transformer_model)."""

    def __init__(self, weights: dict[str, np.ndarray], use_crf: bool = True):
        self.w = weights
        self.use_crf = use_crf
        self.n_layers = int(weights["n_layers"])
        self.n_groups = int(weights["n_groups"])
        self.n_heads = int(weights["n_heads"])

    def encode(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        w = self.w
        B, S = input_ids.shape
        if segment_ids is None:
            segment_ids = np.zeros_like(input_ids)
        # embeddings at E (word+pos+type, LayerNorm), THEN the single E→H
        # mapping — the factorization order of modeling_albert.py
        x = (
            w["word_emb"][input_ids]
            + w["pos_emb"][:S][None, :, :]
            + w["type_emb"][segment_ids]
        )
        x = layer_norm(x, w["emb_ln_g"], w["emb_ln_b"])
        x = x @ w["emb_proj_w"] + w["emb_proj_b"]
        H = x.shape[-1]
        nh = self.n_heads
        hd = H // nh
        adder = (1.0 - input_mask.astype(np.float32))[:, None, None, :] * -10000.0
        for layer_idx in range(self.n_layers):
            # group selection rule of modeling_albert.py:1093
            gi = int(layer_idx / self.n_layers * self.n_groups)
            q = (
                (x @ w[f"g{gi}_q_w"] + w[f"g{gi}_q_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            k = (
                (x @ w[f"g{gi}_k_w"] + w[f"g{gi}_k_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            v = (
                (x @ w[f"g{gi}_v_w"] + w[f"g{gi}_v_b"])
                .reshape(B, S, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            scores = (q @ k.swapaxes(-1, -2)) / np.sqrt(hd) + adder
            scores -= scores.max(axis=-1, keepdims=True)
            p = np.exp(scores)
            p /= p.sum(axis=-1, keepdims=True)
            ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, S, H)
            attn_out = ctx @ w[f"g{gi}_ao_w"] + w[f"g{gi}_ao_b"]
            x = layer_norm(
                x + attn_out, w[f"g{gi}_attn_ln_g"], w[f"g{gi}_attn_ln_b"]
            )
            ff = gelu(x @ w[f"g{gi}_ff1_w"] + w[f"g{gi}_ff1_b"])
            ff = ff @ w[f"g{gi}_ff2_w"] + w[f"g{gi}_ff2_b"]
            x = layer_norm(x + ff, w[f"g{gi}_out_ln_g"], w[f"g{gi}_out_ln_b"])
        return x


def init_bert_bilstm_weights(
    vocab_size: int,
    hidden: int = 48,
    lstm_hidden: int = 32,
    n_layers: int = 2,
    n_heads: int = 4,
    intermediate: int = 96,
    max_position: int = 160,
    n_tags: int = 5,
    type_vocab: int = 2,
    seed: int = 17,
) -> dict[str, np.ndarray]:
    """Transformer encoder weights + the stacked BiLSTM head of
    `layers/lstm_crf_layer.py:88-127` (``crf_only=False``): BiLSTM over
    the encoder output, fw/bw CONCATENATED (``tf.concat(outputs,
    axis=2)``, :101), tanh hidden 2H→H (:112-117), then the tag
    projection (:120-126).  Gate layout matches
    ``bilstm_crf._lstm_direction`` (i,g,f,o with forget_bias=1)."""
    w = init_transformer_weights(
        vocab_size=vocab_size,
        hidden=hidden,
        n_layers=n_layers,
        n_heads=n_heads,
        intermediate=intermediate,
        max_position=max_position,
        n_tags=n_tags,
        type_vocab=type_vocab,
        seed=seed,
    )
    rng = np.random.default_rng(seed + 1)

    def g(*shape):
        return rng.normal(0.0, 0.08, size=shape).astype(np.float32)

    w["lstm_fw_kernel"] = g(hidden + lstm_hidden, 4 * lstm_hidden)
    w["lstm_fw_bias"] = np.zeros(4 * lstm_hidden, dtype=np.float32)
    w["lstm_bw_kernel"] = g(hidden + lstm_hidden, 4 * lstm_hidden)
    w["lstm_bw_bias"] = np.zeros(4 * lstm_hidden, dtype=np.float32)
    w["stack_hid_w"] = g(2 * lstm_hidden, lstm_hidden)
    w["stack_hid_b"] = np.zeros(lstm_hidden, dtype=np.float32)
    w["stack_proj_w"] = g(lstm_hidden, n_tags)
    w["stack_proj_b"] = np.zeros(n_tags, dtype=np.float32)
    return w


class BertBilstmCrf(TransformerEncoder):
    """Stacked T3 variant (``use_lstm``, `run_multitask_bert_crf.py:71-76`
    / `lstm_crf_layer.py:40-50` ``crf_only=False``): transformer encoder
    → BiLSTM → concat → tanh hidden → projection → CRF Viterbi."""

    def predict(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        from ner_funtool_ray.model.bilstm_crf import _lstm_direction

        w = self.w
        enc = self.encode(input_ids, input_mask, segment_ids)
        lengths = input_mask.astype(np.int32).sum(axis=1)
        fw = _lstm_direction(
            enc, lengths, w["lstm_fw_kernel"], w["lstm_fw_bias"], False
        )
        bw = _lstm_direction(
            enc, lengths, w["lstm_bw_kernel"], w["lstm_bw_bias"], True
        )
        cat = np.concatenate([fw, bw], axis=-1)  # lstm_crf_layer.py:101
        hid = np.tanh(cat @ w["stack_hid_w"] + w["stack_hid_b"])
        logits = hid @ w["stack_proj_w"] + w["stack_proj_b"]
        if not self.use_crf:
            from ner_funtool_ray.model.bilstm_crf import softmax_decode_batch

            return softmax_decode_batch(logits, lengths)
        return viterbi_decode_batch(logits, w["crf_trans"], lengths)


class AlbertCrf(AlbertEncoder):
    """ALBERT encoder → dense → CRF Viterbi (the ``use_albert`` flag path
    of `run_bert_crf.py:89` with the same ``crf_only=True`` head)."""

    def predict(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        enc = self.encode(input_ids, input_mask, segment_ids)
        logits = enc @ self.w["proj_w"] + self.w["proj_b"]
        lengths = input_mask.astype(np.int32).sum(axis=1)
        if not self.use_crf:
            from ner_funtool_ray.model.bilstm_crf import softmax_decode_batch

            return softmax_decode_batch(logits, lengths)
        return viterbi_decode_batch(logits, self.w["crf_trans"], lengths)


class BertCascade(TransformerEncoder):
    """T4: shared transformer encoder → BMEO projection + CRF decode and
    attr projection + masked argmax (`run_multitask_bert_crf.py:606-653`);
    the cascade O-propagation happens downstream via ``trans_label``."""

    def predict_cascade(
        self,
        input_ids: np.ndarray,
        input_mask: np.ndarray,
        segment_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        enc = self.encode(input_ids, input_mask, segment_ids)
        w = self.w
        bmeo_logits = enc @ w["proj_w"] + w["proj_b"]
        attr_logits = enc @ w["attr_proj_w"] + w["attr_proj_b"]
        lengths = input_mask.astype(np.int32).sum(axis=1)
        bmeo = viterbi_decode_batch(bmeo_logits, w["crf_trans"], lengths)
        attr = attr_logits.argmax(axis=2).astype(np.int32)
        return bmeo, np.where(input_mask.astype(bool), attr, 0)


def init_albert_siamese_weights(
    vocab_size: int,
    embedding_size: int = 24,
    hidden: int = 48,
    n_layers: int = 4,
    n_groups: int = 1,
    n_heads: int = 4,
    intermediate: int = 96,
    max_position: int = 160,
    type_vocab: int = 2,
    seed: int = 13,
) -> dict[str, np.ndarray]:
    """ALBERT weights + the TWO pooler heads of the siamese variant
    (`bert/modeling_google_albert.py:282-501` AlbertModelSiamese):
    embeddings and encoder are SHARED between towers (both towers
    re-enter the same ``bert`` variable scope — the file's
    “共享BERT层参数” comment at :403), while each tower owns its own
    tanh pooler over the first token (``pooler_1``/``pooler_2`` scopes,
    :393/:455 — the poolers are the only unshared parameters)."""
    w = init_albert_weights(
        vocab_size=vocab_size,
        embedding_size=embedding_size,
        hidden=hidden,
        n_layers=n_layers,
        n_groups=n_groups,
        n_heads=n_heads,
        intermediate=intermediate,
        max_position=max_position,
        n_tags=2,  # unused by the siamese head; kept for bundle parity
        type_vocab=type_vocab,
        seed=seed,
    )
    rng = np.random.default_rng(seed + 7)

    def g(*shape):
        return rng.normal(0.0, 0.08, size=shape).astype(np.float32)

    w["pool1_w"] = g(hidden, hidden)
    w["pool1_b"] = np.zeros(hidden, dtype=np.float32)
    w["pool2_w"] = g(hidden, hidden)
    w["pool2_b"] = np.zeros(hidden, dtype=np.float32)
    return w


class AlbertSiamese(AlbertEncoder):
    """Twin-tower ALBERT (`modeling_google_albert.py:282`
    AlbertModelSiamese): one shared encoder applied to both inputs, a
    per-tower tanh dense pooler over the first ([CLS]) token
    (:389-401/:455-464), cosine similarity between the pooled vectors as
    the pair score.  The reference file defines the model but no runner
    instantiates it; this twin completes the file's API surface so a
    sentence-pair scorer built on it ports directly."""

    def pooled_pair(
        self,
        ids_1: np.ndarray,
        mask_1: np.ndarray,
        ids_2: np.ndarray,
        mask_2: np.ndarray,
        segment_ids_1: np.ndarray | None = None,
        segment_ids_2: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        w = self.w
        enc_1 = self.encode(ids_1, mask_1, segment_ids_1)
        enc_2 = self.encode(ids_2, mask_2, segment_ids_2)
        pooled_1 = np.tanh(enc_1[:, 0, :] @ w["pool1_w"] + w["pool1_b"])
        pooled_2 = np.tanh(enc_2[:, 0, :] @ w["pool2_w"] + w["pool2_b"])
        return pooled_1, pooled_2

    def similarity(
        self,
        ids_1: np.ndarray,
        mask_1: np.ndarray,
        ids_2: np.ndarray,
        mask_2: np.ndarray,
    ) -> np.ndarray:
        p1, p2 = self.pooled_pair(ids_1, mask_1, ids_2, mask_2)
        num = (p1 * p2).sum(axis=1)
        den = np.linalg.norm(p1, axis=1) * np.linalg.norm(p2, axis=1)
        return np.where(den > 0, num / np.maximum(den, 1e-12), 0.0)
