"""T5: WOL — weighted loss over entity positions (`run_bert_wol.py`).

The reference's BERT+WOL variant differs from BERT+Cascade ONLY in its
training objective: with ``use_weights_of_loss`` (`run_bert_wol.py:
579-589`), the per-position softmax cross-entropy is reweighted so
entity positions count 3× as much as O positions:

    masks_of_entity = float(bmeo_labels != O)        # :583
    weights_of_loss = masks_of_entity + 0.5          # :585
    loss_per_example = sum(ce * weights) / (sum(masks) + 1e-5)   # :587

This module exposes that exact arithmetic eval-time: ``wol_weights`` is
the weight vector, ``wol_weighted_ce`` the per-example weighted CE a
pipeline attaches as a metric column (``stages/tag.WolScorer``).  Note
the reference formula applies NO sequence mask in the weighted branch —
padded positions (label O) contribute ce·0.5 — so ``lengths=None``
reproduces it verbatim; passing ``lengths`` restricts to real tokens
(the eval-sane variant, flagged off by default).
"""

from __future__ import annotations

import numpy as np

__all__ = ["wol_weights", "softmax_ce", "wol_weighted_ce"]


def wol_weights(bmeo_labels: np.ndarray, o_index: int = 0) -> np.ndarray:
    """``masks_of_entity + 0.5`` (`run_bert_wol.py:583-585`): 1.5 at
    entity positions, 0.5 at O positions, float32 like the reference."""
    masks = (np.asarray(bmeo_labels) != o_index).astype(np.float32)
    return masks + np.float32(0.5)


def softmax_ce(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-position sparse softmax cross-entropy, (B, S) — the
    ``tf.nn.sparse_softmax_cross_entropy_with_logits`` term (:579)."""
    m = logits.max(axis=-1, keepdims=True)
    lse = m + np.log(np.exp(logits - m).sum(axis=-1, keepdims=True))
    logp = logits - lse
    B, S = labels.shape
    return -logp[np.arange(B)[:, None], np.arange(S)[None, :], labels]


def wol_weighted_ce(
    logits: np.ndarray,
    labels: np.ndarray,
    o_index: int = 0,
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """Per-example WOL loss (B,) — `run_bert_wol.py:579-587` verbatim:
    ``sum(ce·(mask+0.5)) / (sum(mask) + 1e-5)``.  ``lengths`` optionally
    zeroes padded positions out of both sums (the reference does not)."""
    ce = softmax_ce(logits, labels)
    masks = (np.asarray(labels) != o_index).astype(np.float32)
    weights = masks + np.float32(0.5)
    if lengths is not None:
        valid = (
            np.arange(labels.shape[1])[None, :] < np.asarray(lengths)[:, None]
        ).astype(np.float32)
        ce = ce * valid
        masks = masks * valid
        weights = weights * valid
    num = (ce * weights).sum(axis=-1)
    return num / (masks.sum(axis=-1) + np.float32(1e-5))
