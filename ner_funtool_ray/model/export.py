"""Serving-bundle export/load — the SavedModel-export role (SURVEY §2.2
K7, `run_bert_crf.py:657-668, 865-867`; WOL variant's
``export_savedmodel`` with a serving receiver fn).

The reference freezes an Estimator into a SavedModel directory: a
signature (named int placeholders ``input_ids / input_mask /
segment_ids / label_ids``) plus the variables, so a serving process can
load the model without the training code.  The Ray-native equivalent is
a **bundle directory** holding

- ``weights.npz``      — every model tensor (`model/bilstm_crf.py:save_weights`)
- ``signature.json``   — the serving signature: model family + head
  flags, declared input/output tensors with dtype+shape, the label
  vocabulary (the reference persists ``label2id.pkl`` next to its
  export, `run_bert_crf.py:356-359`), and the weight file's sha256 so a
  truncated/corrupted copy fails loudly at load time.

``load_bundle`` reconstructs the exact tagger class the bundle was
exported from — the same "load the model without the pipeline code
that trained it" contract as ``tf.contrib.predictor.from_saved_model``
(`infer_offline.py:76-77`, T7) — and is what the serving actor and the
actor-pool ``tag_sentences`` stage accept as a model source.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import numpy as np

BUNDLE_FORMAT = "ner-funtool-ray-bundle/1"
SIGNATURE_FILE = "signature.json"
WEIGHTS_FILE = "weights.npz"

# int32 serving placeholders per family, mirroring the reference's
# serving_input receiver (`run_bert_crf.py:657-668`: input_ids /
# input_mask / segment_ids / label_ids, all (None, max_seq_len) int32;
# label_ids is a dummy at serve time but part of the signature).
_BERT_FAMILIES = {"bert", "albert", "bert_lstm"}


def _family_signature(model: str, cascade: bool, max_seq_len: int) -> dict:
    if model in _BERT_FAMILIES:
        inputs = [
            {"name": n, "dtype": "int32", "shape": [-1, max_seq_len]}
            for n in ("input_ids", "input_mask", "segment_ids", "label_ids")
        ]
    else:  # bilstm family: dynamic batch-max padding (pad_sequences M8)
        inputs = [
            {"name": "input_ids", "dtype": "int32", "shape": [-1, -1]},
            {"name": "lengths", "dtype": "int32", "shape": [-1]},
        ]
    outputs = [{"name": "pred_ids", "dtype": "int32", "shape": [-1, -1]}]
    if cascade:
        outputs.append(
            {"name": "attr_pred_ids", "dtype": "int32", "shape": [-1, -1]}
        )
    return {"method": "predict", "inputs": inputs, "outputs": outputs}


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def export_bundle(
    out_dir: str,
    model: str = "bilstm",
    cascade: bool = False,
    weights: dict[str, np.ndarray] | None = None,
    weights_path: str | None = None,
    max_seq_len: int = 128,
    use_crf: bool = True,
    seed: int | None = None,
) -> str:
    """Freeze a tagger into a self-contained bundle directory.

    Weight source, in priority order: an in-memory ``weights`` dict (e.g.
    a training checkpoint from `pipelines/training.py`), a ``weights_path``
    ``.npz``, else the family's deterministic seed-initialized weights —
    in every case the weights are round-tripped through the SAME tagger
    class ``load_bundle`` will construct, so export is guaranteed
    loadable.  Returns ``out_dir``.  Writes are atomic per file (tmp +
    rename) so a rerun over a partial export self-heals — the resumable-
    output rule applied to model artifacts.
    """
    from ner_funtool_ray.model.bilstm_crf import save_weights
    from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

    key = (model, cascade)
    if key not in _TAGGER_CLASSES:
        raise ValueError(
            f"unknown tagger family {key!r}; known: {sorted(_TAGGER_CLASSES)}"
        )
    if weights is None:
        kwargs: dict[str, Any] = {
            "weights_path": weights_path,
            "max_seq_len": max_seq_len,
        }
        if seed is not None:
            kwargs["seed"] = seed
        if not use_crf:
            if cascade:
                raise ValueError(
                    "use_crf=False applies to the single-head taggers only"
                )
            kwargs["use_crf"] = False
        tagger = _TAGGER_CLASSES[key](**kwargs)
        weights = tagger.model.w
        labels = [tagger.id2tag[i] for i in range(len(tagger.id2tag))]
    else:
        labels = _default_labels(model)

    os.makedirs(out_dir, exist_ok=True)
    wpath = os.path.join(out_dir, WEIGHTS_FILE)
    tmp = wpath + ".tmp"
    save_weights(tmp, weights)
    if not tmp.endswith(".npz"):  # np.savez appends .npz to bare names
        tmp += ".npz"
    os.replace(tmp, wpath)

    sig = {
        "format": BUNDLE_FORMAT,
        "model": model,
        "cascade": cascade,
        "use_crf": use_crf,
        "max_seq_len": max_seq_len,
        "labels": labels,
        "weights_file": WEIGHTS_FILE,
        "weights_sha256": _sha256_file(wpath),
        "signature": _family_signature(model, cascade, max_seq_len),
    }
    spath = os.path.join(out_dir, SIGNATURE_FILE)
    with open(spath + ".tmp", "w") as f:
        json.dump(sig, f, indent=1, sort_keys=True)
    os.replace(spath + ".tmp", spath)
    return out_dir


def export_bundle_from_tf_checkpoint(
    out_dir: str,
    ckpt_prefix: str,
    model: str = "bilstm",
    cascade: bool = False,
    max_seq_len: int = 128,
    n_heads: int | None = None,
    labels: list[str] | None = None,
) -> str:
    """Freeze a reference-trained TF1 checkpoint into a serving bundle.

    The drop-in-predictor path for a user holding reference checkpoints
    (`predict_bert_crf.py:127-128` ``Saver.restore``): the tensor bundle
    is parsed without TensorFlow (`model/tf_checkpoint.py`), variable
    names are mapped onto the engine's weight layout, and the result is
    a normal bundle ``load_bundle`` / the serving actor / ``tag``-stage
    actors consume.  ``n_heads`` is required for the bert family (BERT
    checkpoints don't carry it — it lives in ``bert_config.json``)."""
    from ner_funtool_ray.model.tf_checkpoint import (
        bert_weights_from_tf,
        bilstm_weights_from_tf,
    )

    if model in _BERT_FAMILIES:
        if n_heads is None:
            raise ValueError(
                "n_heads is required for bert-family checkpoints "
                "(see bert_config.json num_attention_heads)"
            )
        weights = bert_weights_from_tf(ckpt_prefix, n_heads=n_heads)
        if "proj_w" not in weights:
            raise ValueError(
                "checkpoint has no task head (projection/dense) — a bare "
                "pretrained encoder can't serve; fine-tune or supply a head"
            )
    else:
        weights = bilstm_weights_from_tf(ckpt_prefix)
    use_crf = "crf_trans" in weights
    out = export_bundle(
        out_dir,
        model=model,
        cascade=cascade,
        weights=weights,
        max_seq_len=max_seq_len,
        use_crf=use_crf,
    )
    if labels is not None:
        sig = read_signature(out)
        sig["labels"] = labels
        spath = os.path.join(out, SIGNATURE_FILE)
        with open(spath + ".tmp", "w") as f:
            json.dump(sig, f, indent=1, sort_keys=True)
        os.replace(spath + ".tmp", spath)
    return out


def _default_labels(model: str) -> list[str]:
    from ner_funtool_ray.model.vocabs import BERT_TAGS, TAGS

    return list(BERT_TAGS if model in _BERT_FAMILIES else TAGS)


def read_signature(bundle_dir: str) -> dict:
    with open(os.path.join(bundle_dir, SIGNATURE_FILE)) as f:
        sig = json.load(f)
    if sig.get("format") != BUNDLE_FORMAT:
        raise ValueError(
            f"not a {BUNDLE_FORMAT} bundle: {bundle_dir!r} "
            f"(format={sig.get('format')!r})"
        )
    return sig


def load_bundle(bundle_dir: str):
    """Signature + integrity-checked weights → the exact tagger instance
    the bundle was exported from (T7 `from_saved_model` role)."""
    from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

    sig = read_signature(bundle_dir)
    wpath = os.path.join(bundle_dir, sig["weights_file"])
    got = _sha256_file(wpath)
    if got != sig["weights_sha256"]:
        raise ValueError(
            f"bundle weights corrupted: sha256 {got[:12]}… != "
            f"recorded {sig['weights_sha256'][:12]}… ({wpath})"
        )
    cls = _TAGGER_CLASSES[(sig["model"], bool(sig["cascade"]))]
    kwargs: dict[str, Any] = {
        "weights_path": wpath,
        "max_seq_len": int(sig["max_seq_len"]),
    }
    if not sig.get("use_crf", True):
        kwargs["use_crf"] = False
    return cls(**kwargs)


class BundleTagger:
    """Actor-pool callable over an exported bundle: each actor loads the
    sha-checked bundle ONCE in ``__init__`` (T7/T8 pattern) and tags
    per batch — `stages/tag.py:tag_sentences(bundle=…)` uses this."""

    def __init__(self, bundle: str, text_col: str = "sentence",
                 out_col: str = "pred_tags"):
        self.tagger = load_bundle(bundle)
        self.tagger.text_col = text_col
        self.tagger.out_col = out_col

    def __call__(self, batch):
        return self.tagger(batch)
