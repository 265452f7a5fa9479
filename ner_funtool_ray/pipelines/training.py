"""Distributed BiLSTM+CRF training — the reference's training loop
(`train_lstm_crf.py:226-269`) as synchronous data-parallel SGD on Ray.

Reference semantics preserved per step: per-epoch example shuffle
(``batch_yield(shuffle=True)``, :231 → ``Dataset.random_shuffle``, the
O1 operator), ``pad_sequences``-padded batches (:235-237), Adam at
lr=1e-3 (:54,126), loss = batch-mean of length-normalized CRF NLL
(`model_lstm_crf.py:66-68`), per-epoch eval with entity P/R/F1 and a
best-F1 tracker (:243-266, A8), per-epoch ``.npz`` checkpoints (K6/K7
role of ``saver.save``, :267-268).

Distributed mapping: the example Dataset shuffles and splits into
``n_workers`` shards each epoch; one ``GradWorker`` actor per shard
holds its shard iterator and, per synchronized step, computes
loss+gradients for ITS next batch against the current broadcast
parameters (``ray.put`` once per step, not per worker).  The driver
merges the per-worker gradients as an example-weighted average in
worker-index order (deterministic float order), applies one Adam
update, and rebroadcasts — i.e. each sync round is one large-batch step
over ``n_workers`` reference batches, the standard sync data-parallel
mapping of a sequential SGD loop.  Raw actors are justified here: the
iteratively-updated parameter state is exactly what ``Dataset``
transforms cannot express (the documented exception).

The reference's ``use_clip_grad`` branch (`train_lstm_crf.py:128-129`)
calls ``tf.clip_by_value(g, clip, clip)`` with BOTH bounds = +5.0,
which would replace every gradient with the constant 5 — an inert bug
(the flag defaults to False, :66).  Not replicated: ``use_clip_grad``
here clips to the intended [−5, +5] (M14-style "bug not replicated").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.model.bilstm_crf import BiLstmCrf, init_weights
from ner_funtool_ray.model.train import (
    Adam,
    bilstm_crf_loss_and_grads,
    bilstm_wol_loss_and_grads,
)
from ner_funtool_ray.model.vocabs import TAGS, default_char_vocab

_UNK_ID = 1

__all__ = [
    "training_examples",
    "train_bilstm_crf",
    "bert_training_examples",
    "train_bert",
]


def training_examples(
    sf_dir: str, max_len: int = 128, cascade: bool = False
) -> "ray.data.Dataset":
    """Corpus → (input_ids, label_ids, length) example rows: sentences
    with gazetteer-gold tags (the repo's training-label source), chars
    encoded through the SAME vocab path ``stages/tag.NerTagger`` serves
    with, tags through the TAGS index — so a trained checkpoint drops
    straight into the serving actors via ``weights_path``.

    ``cascade=True`` splits each tag into the (bmeo, attr) pair (M15,
    `data_preprocess_multitask.py:57-62`) and emits ``bmeo_label_ids`` /
    ``attr_label_ids`` instead — the `model_multitask_lstm.py` input."""
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.model.vocabs import attr2id, bmeo2id
    from ner_funtool_ray.stages.gazetteer import gold_tag_sentences
    from ner_funtool_ray.stages.ingest import ingest
    from ner_funtool_ray.stages.sentence import split_to_sentences

    char2id = default_char_vocab()
    tag2id = {t: i for i, t in enumerate(TAGS)}
    bmeo_map, attr_map = bmeo2id(), attr2id()
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    both = gold_tag_sentences(sents, max_seq_len=max_len)

    def encode(batch: pa.Table) -> pa.Table:
        ids_out, lab_out, blab_out, alab_out, len_out = [], [], [], [], []
        for text, tags in zip(
            batch["sentence"].to_pylist(), batch["gold_tags"].to_pylist()
        ):
            t = (text or "")[:max_len]
            if not t:
                continue
            ids = [char2id.get(c, _UNK_ID) for c in t]
            tags = list(tags)[: len(ids)] + ["O"] * (len(ids) - len(tags))
            ids_out.append(ids)
            len_out.append(len(ids))
            if cascade:
                blab_out.append(
                    [bmeo_map.get(g.partition("-")[0], 0) for g in tags]
                )
                alab_out.append(
                    [attr_map.get(g.partition("-")[2] or "O", 0) for g in tags]
                )
            else:
                lab_out.append([tag2id.get(g, 0) for g in tags])
        t32 = pa.list_(pa.int32())
        cols = {"input_ids": pa.array(ids_out, type=t32)}
        if cascade:
            cols["bmeo_label_ids"] = pa.array(blab_out, type=t32)
            cols["attr_label_ids"] = pa.array(alab_out, type=t32)
        else:
            cols["label_ids"] = pa.array(lab_out, type=t32)
        cols["length"] = pa.array(len_out, type=pa.int64())
        return pa.table(cols)

    return both.map_batches(encode, batch_format="pyarrow")


def _pad_batch(batch: pa.Table, label_cols: tuple = ("label_ids",)):
    """``pad_sequences`` semantics (`train_lstm_crf.py:235-237`,
    pad_mark=0) at batch max length.  Returns (input matrix, one padded
    matrix per entry of ``label_cols``…, lengths)."""
    ids = batch["input_ids"].to_pylist()
    lengths = np.array([len(s) for s in ids], dtype=np.int32)
    S = max(1, int(lengths.max()) if len(lengths) else 1)
    mat = np.zeros((len(ids), S), dtype=np.int32)
    for i, s in enumerate(ids):
        mat[i, : len(s)] = s
    outs = [mat]
    for col in label_cols:
        labs = batch[col].to_pylist()
        lab = np.zeros((len(ids), S), dtype=np.int32)
        for i, l in enumerate(labs):
            lab[i, : len(l)] = l
        outs.append(lab)
    return (*outs, lengths)


def bert_training_examples(
    sf_dir: str, max_len: int = 64, cascade: bool = False
) -> "ray.data.Dataset":
    """Corpus → wordpiece-encoded training examples for the BERT-family
    trainers — the ``convert_single_example`` path (`run_bert_crf.py:
    340-433`; multitask twin `run_multitask_bert_crf.py:380-498`) over
    gazetteer-gold-tagged sentences: each char is one word, its first
    piece carries the tag, continuation pieces get ``X``, ``[CLS]`` /
    ``[SEP]`` wrap with their own label ids, pads are masked.  Cascade
    mode splits each tag into the (bmeo, attr) pair (M15 semantics) and
    emits both label-id columns with the specials appended to BOTH
    spaces exactly like the reference (:427-447)."""
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.functions.tokenization import FullTokenizer
    from ner_funtool_ray.model.vocabs import (
        BERT_BMEO,
        BERT_TAGS,
        CASCADE_ATTRS,
        default_wordpiece_vocab,
    )
    from ner_funtool_ray.stages.encode import convert_example
    from ner_funtool_ray.stages.gazetteer import gold_tag_sentences
    from ner_funtool_ray.stages.ingest import ingest
    from ner_funtool_ray.stages.sentence import split_to_sentences

    vocab = default_wordpiece_vocab()
    tag_map = {t: i for i, t in enumerate(BERT_TAGS)}
    bmeo_map = {t: i for i, t in enumerate(BERT_BMEO)}
    attr_map = {
        t: i
        for i, t in enumerate(CASCADE_ATTRS + ("X", "[CLS]", "[SEP]"))
    }
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    both = gold_tag_sentences(sents, max_seq_len=max_len)

    def encode(batch: pa.Table) -> pa.Table:
        tok = FullTokenizer(vocab)
        out: dict[str, list] = {k: [] for k in (
            ["input_ids", "input_mask", "segment_ids"]
            + (["bmeo_label_ids", "attr_label_ids"] if cascade
               else ["label_ids"])
        )}
        for text, tags in zip(
            batch["sentence"].to_pylist(), batch["gold_tags"].to_pylist()
        ):
            words = list(text or "")
            if not words:
                continue
            tags = list(tags)[: len(words)] + ["O"] * (len(words) - len(tags))
            if cascade:
                # M15 split (`data_preprocess_multitask.py:57-62`):
                # 'B-ORG' → ('B','ORG'); single-part tag → attr O
                bmeo = [t.partition("-")[0] for t in tags]
                attr = [
                    t.partition("-")[2] or "O" for t in tags
                ]
                fb = convert_example(words, bmeo, tok, bmeo_map, max_len)
                fa = convert_example(words, attr, tok, attr_map, max_len)
                out["input_ids"].append(fb["input_ids"])
                out["input_mask"].append(fb["input_mask"])
                out["segment_ids"].append(fb["segment_ids"])
                out["bmeo_label_ids"].append(fb["label_ids"])
                out["attr_label_ids"].append(fa["label_ids"])
            else:
                f = convert_example(words, tags, tok, tag_map, max_len)
                for k in out:
                    out[k].append(f[k])
        t = pa.list_(pa.int32())
        return pa.table({k: pa.array(v, type=t) for k, v in out.items()})

    return both.map_batches(encode, batch_format="pyarrow")


def _pad_batch_bert(batch: pa.Table, cascade: bool = False):
    """Fixed-width feature lists → numpy matrices, trimmed to the batch's
    true max length (pads are attention-masked, so trimming trailing
    all-pad columns is exact — the serving stages' dynamic-pad rationale)."""
    ids = np.asarray(batch["input_ids"].to_pylist(), dtype=np.int32)
    mask = np.asarray(batch["input_mask"].to_pylist(), dtype=np.int32)
    seg = np.asarray(batch["segment_ids"].to_pylist(), dtype=np.int32)
    lengths = mask.sum(axis=1).astype(np.int32)
    S = max(2, int(lengths.max()) if len(lengths) else 2)
    cols = [ids[:, :S], mask[:, :S], seg[:, :S]]
    if cascade:
        cols.append(
            np.asarray(batch["bmeo_label_ids"].to_pylist(), dtype=np.int32)[:, :S]
        )
        cols.append(
            np.asarray(batch["attr_label_ids"].to_pylist(), dtype=np.int32)[:, :S]
        )
    else:
        cols.append(
            np.asarray(batch["label_ids"].to_pylist(), dtype=np.int32)[:, :S]
        )
    return (*cols, lengths)


@ray.remote(num_cpus=0)
class GradWorker:
    """One shard's gradient worker: iterates its shard batch-by-batch,
    each ``step(params_ref)`` returning (grads, loss, n_examples) for
    its NEXT batch against the broadcast parameters, or None when the
    shard is exhausted for this epoch.

    ``num_cpus=0``: the sync loop strictly ALTERNATES phases — the
    per-epoch ``random_shuffle``/``split`` (Ray Data task pool) runs
    while every worker idles, and worker steps run while no Data tasks
    do — so a CPU reservation would only ever be held by an idle actor.
    On a small session (e.g. the 4-CPU test fixture) n_workers
    reservations starve the shuffle's tasks outright: a deadlock, not a
    slowdown.  Zero-CPU actors make both phases schedulable; compute
    never oversubscribes because the phases don't overlap."""

    def __init__(self) -> None:
        self._it = None

    def load(
        self, shard: "ray.data.Dataset", batch_size: int, loss: str = "crf"
    ) -> int:
        self._it = iter(
            shard.iter_batches(batch_size=batch_size, batch_format="pyarrow")
        )
        self._loss = loss
        return 0

    def step(self, params: dict):
        batch = next(self._it, None)
        if batch is None or batch.num_rows == 0:
            return None
        if self._loss == "bert_cascade":
            from ner_funtool_ray.model.train_transformer import (
                bert_cascade_loss_and_grads,
            )

            ids, mask, seg, bmeo, attr, lengths = _pad_batch_bert(
                batch, cascade=True
            )
            loss, grads = bert_cascade_loss_and_grads(
                params, ids, mask, bmeo, attr, lengths, seg
            )
        elif self._loss in ("bert_crf", "albert_crf", "bert_wol",
                            "bert_bilstm"):
            from ner_funtool_ray.model import train_transformer as tt

            ids, mask, seg, labs, lengths = _pad_batch_bert(batch)
            if self._loss == "bert_wol":
                loss, grads = tt.bert_wol_loss_and_grads(
                    params, ids, mask, labs, lengths, seg
                )
            elif self._loss == "bert_bilstm":
                loss, grads = tt.bert_bilstm_crf_loss_and_grads(
                    params, ids, mask, labs, lengths, seg
                )
            else:
                # BERT and ALBERT share the loss fn — the weight-dict
                # structure (emb_proj_w / group keys) picks the encoder
                loss, grads = tt.bert_crf_loss_and_grads(
                    params, ids, mask, labs, lengths, seg
                )
        elif self._loss == "lstm_cascade":
            from ner_funtool_ray.model.train import (
                bilstm_cascade_loss_and_grads,
            )

            ids, bmeo, attr, lengths = _pad_batch(
                batch, ("bmeo_label_ids", "attr_label_ids")
            )
            loss, grads = bilstm_cascade_loss_and_grads(
                params, ids, bmeo, attr, lengths
            )
        elif self._loss == "wol_ce":
            # T5 objective: entity-weighted softmax CE
            # (run_bert_wol.py:575-593, use_weights_of_loss)
            ids, labs, lengths = _pad_batch(batch)
            loss, grads = bilstm_wol_loss_and_grads(
                params, ids, labs, lengths, o_index=0, use_weights=True
            )
        else:
            ids, labs, lengths = _pad_batch(batch)
            loss, grads = bilstm_crf_loss_and_grads(
                params, ids, labs, lengths
            )
        return grads, loss, len(lengths)


def _eval_entity_f1(weights: dict, test_ds: "ray.data.Dataset") -> tuple:
    """Per-epoch eval (`train_lstm_crf.py:243-266` dev_step role):
    entity-level P/R/F1 of the current weights on the held-out split."""
    from ner_funtool_ray.metrics.entity_metrics import entity_metrics

    model = BiLstmCrf(weights)
    id2tag = dict(enumerate(TAGS))
    id2char = {i: c for c, i in default_char_vocab().items()}
    rows_chars, rows_gold, rows_pred = [], [], []
    for batch in test_ds.iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        ids, labs, lengths = _pad_batch(batch)
        paths = model.predict(ids, lengths)
        for i in range(len(lengths)):
            n = int(lengths[i])
            rows_chars.append(
                "".join(id2char.get(int(c), "?") for c in ids[i, :n])
            )
            rows_gold.append([id2tag[int(t)] for t in labs[i, :n]])
            rows_pred.append([id2tag[int(t)] for t in paths[i, :n]])
    tagged = ray.data.from_arrow(
        pa.table(
            {
                "chars": pa.array(rows_chars, type=pa.string()),
                "gold_tags": pa.array(rows_gold, type=pa.list_(pa.string())),
                "pred_tags": pa.array(rows_pred, type=pa.list_(pa.string())),
            }
        )
    )
    return entity_metrics(tagged)


def _eval_cascade_entity_f1(weights: dict, test_ds: "ray.data.Dataset") -> tuple:
    """Cascade eval: decode both heads, combine via ``trans_label``
    O-propagation (`ner_utils.py:9-39`), entity P/R/F1 against the gold
    combined tags (reconstructed the same way from the gold bmeo/attr
    streams) — the reference's multitask eval surface."""
    from ner_funtool_ray.functions.spans import trans_label_row
    from ner_funtool_ray.metrics.entity_metrics import entity_metrics
    from ner_funtool_ray.model.bilstm_crf import CascadeTagger
    from ner_funtool_ray.model.vocabs import BMEO, CASCADE_ATTRS

    model = CascadeTagger(weights)
    id2bmeo = dict(enumerate(BMEO))
    id2attr = dict(enumerate(CASCADE_ATTRS))
    id2char = {i: c for c, i in default_char_vocab().items()}
    rows_chars, rows_gold, rows_pred = [], [], []
    for batch in test_ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        ids, bmeo, attr, lengths = _pad_batch(
            batch, ("bmeo_label_ids", "attr_label_ids")
        )
        b_pred, a_pred = model.predict_cascade(ids, lengths)
        for i in range(len(lengths)):
            n = int(lengths[i])
            rows_chars.append(
                "".join(id2char.get(int(c), "?") for c in ids[i, :n])
            )
            rows_gold.append(
                trans_label_row(
                    [id2bmeo[int(t)] for t in bmeo[i, :n]],
                    [id2attr[int(t)] for t in attr[i, :n]],
                )
            )
            rows_pred.append(
                trans_label_row(
                    [id2bmeo[int(t)] for t in b_pred[i, :n]],
                    [id2attr[int(t)] for t in a_pred[i, :n]],
                )
            )
    tagged = ray.data.from_arrow(
        pa.table(
            {
                "chars": pa.array(rows_chars, type=pa.string()),
                "gold_tags": pa.array(rows_gold, type=pa.list_(pa.string())),
                "pred_tags": pa.array(rows_pred, type=pa.list_(pa.string())),
            }
        )
    )
    return entity_metrics(tagged)


def train_bilstm_crf(
    sf_dir: str,
    epochs: int = 3,
    batch_size: int = 128,
    lr: float = 1e-3,
    n_workers: int | None = None,
    max_len: int = 128,
    seed: int = 42,
    use_clip_grad: bool = False,
    test_size: float = 0.2,
    eval_each_epoch: bool = True,
    checkpoint_dir: str | None = None,
    loss: str = "crf",
):
    """The `train_lstm_crf.py:226-269` loop, data-parallel.  Returns
    ``(weights, history)`` — history one row per epoch with mean train
    loss (A7 reduction) and, when evaluated, entity P/R/F1 + the
    running best F1 (A8).  ``loss="wol_ce"`` swaps the CRF NLL for the
    WOL entity-weighted softmax CE (`run_bert_wol.py:575-593`) — the
    T5 training objective; eval still decodes with the CRF head.
    ``loss="cascade"`` trains the two-head BiLSTM cascade
    (`model_multitask_lstm.py:5-81`, the reference's `cascade_lstm_crf`
    result row): BMEO-CRF + Viterbi-masked attr CE, eval = entity F1 of
    the ``trans_label``-combined streams."""
    from ner_funtool_ray.metrics.tag_metrics import BestMetricTracker
    from ner_funtool_ray.model.vocabs import BMEO, CASCADE_ATTRS
    from ner_funtool_ray.sources.splits import train_test_split

    cascade = loss == "cascade"
    if n_workers is None:
        try:
            n_workers = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
        except Exception:
            n_workers = 2
    examples = training_examples(sf_dir, max_len, cascade=cascade).materialize()
    train_ds, test_ds = train_test_split(examples, test_size=test_size)
    train_ds = train_ds.materialize()
    test_ds = test_ds.materialize()

    w = init_weights(
        vocab_size=len(default_char_vocab()),
        emb_dim=32,
        hidden=48,
        n_tags=len(BMEO) if cascade else len(TAGS),
        n_attrs=len(CASCADE_ATTRS) if cascade else None,
        seed=seed,
    )
    w = {k: v.astype(np.float64) for k, v in w.items()}
    opt = Adam(lr=lr)
    tracker = BestMetricTracker()
    workers = [GradWorker.remote() for _ in range(n_workers)]
    history = []
    for epoch in range(epochs):
        shuffled = train_ds.random_shuffle(seed=seed + epoch)
        shards = shuffled.split(n_workers, equal=False)
        ray.get(
            [
                wk.load.remote(
                    sh, batch_size, "lstm_cascade" if cascade else loss
                )
                for wk, sh in zip(workers, shards)
            ]
        )
        params_ref = ray.put(w)
        active = list(range(n_workers))
        loss_sum, n_sum = 0.0, 0
        while active:
            res = ray.get(
                [workers[i].step.remote(params_ref) for i in active]
            )
            live = [(i, r) for i, r in zip(active, res) if r is not None]
            active = [i for i, _ in live]
            if not live:
                break
            total_n = sum(r[2] for _, r in live)
            # example-weighted average in worker-index order —
            # deterministic float summation
            avg = {
                k: sum(r[0][k] * r[2] for _, r in live) / total_n
                for k in live[0][1][0]
            }
            loss_sum += sum(r[1] * r[2] for _, r in live)
            n_sum += total_n
            if use_clip_grad:
                avg = {k: np.clip(g, -5.0, 5.0) for k, g in avg.items()}
            w = opt.step(w, avg)
            params_ref = ray.put(w)
        row = {
            "epoch": epoch,
            "mean_loss": loss_sum / max(n_sum, 1),
            "n_examples": n_sum,
        }
        if eval_each_epoch:
            if cascade:
                p, r, f1 = _eval_cascade_entity_f1(w, test_ds)
            else:
                p, r, f1 = _eval_entity_f1(w, test_ds)
            improved = tracker.update(f1)
            row.update(
                {"precision": p, "recall": r, "f1": f1, "best_f1": tracker.best}
            )
            if checkpoint_dir and improved:
                from ner_funtool_ray.model.bilstm_crf import save_weights

                save_weights(
                    f"{checkpoint_dir}/bilstm_crf_epoch{epoch}.npz",
                    {k: v.astype(np.float32) for k, v in w.items()},
                )
        history.append(row)
    return w, pd.DataFrame(history)


_BERT_TRAIN_DIMS = dict(hidden=32, n_layers=2, n_heads=4, intermediate=64)


def _eval_bert_token_acc(weights: dict, test_ds, variant: str) -> dict:
    """Per-epoch dev eval for the BERT-family trainers — token-level
    accuracy over attention-masked positions, the same surface the
    reference's ``metric_fn`` measures (`run_bert_crf.py:610-641`:
    confusion-matrix metrics weighted by ``input_mask``)."""
    from ner_funtool_ray.model.transformer import (
        AlbertCrf,
        BertBilstmCrf,
        BertCascade,
        BertCrf,
        TransformerEncoder,
    )

    cascade = variant == "cascade"
    correct = np.zeros(2 if cascade else 1, dtype=np.int64)
    total = 0
    for batch in test_ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        cols = _pad_batch_bert(batch, cascade=cascade)
        if cascade:
            ids, mask, seg, bmeo, attr, lengths = cols
            b_pred, a_pred = BertCascade(weights).predict_cascade(
                ids, mask, seg
            )
            m = mask.astype(bool)
            correct[0] += int((b_pred[m] == bmeo[m]).sum())
            correct[1] += int((a_pred[m] == attr[m]).sum())
            total += int(m.sum())
            continue
        ids, mask, seg, labs, lengths = cols
        if variant == "wol":
            # use_crf=False path: plain argmax over the softmax logits
            enc = TransformerEncoder(weights).encode(ids, mask, seg)
            logits = enc @ weights["proj_w"] + weights["proj_b"]
            pred = logits.argmax(axis=-1)
        else:
            cls = {"albert": AlbertCrf, "bilstm": BertBilstmCrf}.get(
                variant, BertCrf
            )
            pred = cls(weights).predict(ids, mask, seg)
        m = mask.astype(bool)
        correct[0] += int((np.asarray(pred)[m] == labs[m]).sum())
        total += int(m.sum())
    total = max(total, 1)
    if cascade:
        return {
            "bmeo_token_acc": correct[0] / total,
            "attr_token_acc": correct[1] / total,
        }
    return {"token_acc": correct[0] / total}


def train_bert(
    sf_dir: str,
    variant: str = "crf",
    epochs: int = 2,
    batch_size: int = 64,
    lr: float = 1e-3,
    n_workers: int | None = None,
    max_len: int = 64,
    seed: int = 11,
    test_size: float = 0.2,
    eval_each_epoch: bool = True,
    checkpoint_dir: str | None = None,
    optimizer: str = "adamw",
    warmup_proportion: float = 0.1,
    max_examples: int | None = 4000,
):
    """Fine-tuning loops of the BERT runners as sync data-parallel SGD —
    ``variant`` ∈ {"crf", "wol", "cascade", "albert", "bilstm"} maps to
    `run_bert_crf.py:545-655` / `run_bert_wol.py:513-595` /
    `run_multitask_bert_crf.py:572-720` / the ``use_albert`` /
    ``use_lstm`` flags.  Optimizer semantics are the reference's
    ``create_optimizer`` (`bert/optimization.py:48-107`: AdamW wd=0.01
    excluding LayerNorm/bias, linear warmup → linear decay, global-norm
    clip 1.0); ``optimizer="dual_rate"`` swaps in the
    ``create_optimizer_multitask`` alternative (:25-45, present but
    commented out in the reference runners).  Weights start from the
    FIXTURES seed-random stand-in (no pretrained ckpt exists in this
    environment), so the default lr is the head-scale 1e-3 rather than a
    fine-tune 5e-5 — the schedule, decay exclusions and clipping are
    what's being exercised.  ``max_examples`` bounds the corpus slice so
    the query-surface entry stays cheap; pass ``None`` for the full
    corpus.  Returns ``(weights, history)``."""
    from ner_funtool_ray.model.train import (
        Adam,
        AdamWeightDecay,
        clip_by_global_norm,
        dual_rate_step,
        warmup_linear_decay_lr,
    )
    from ner_funtool_ray.model.transformer import (
        init_albert_weights,
        init_bert_bilstm_weights,
        init_transformer_weights,
    )
    from ner_funtool_ray.model.vocabs import (
        BERT_BMEO,
        BERT_TAGS,
        CASCADE_ATTRS,
        default_wordpiece_vocab,
    )
    from ner_funtool_ray.sources.splits import train_test_split

    if variant not in ("crf", "wol", "cascade", "albert", "bilstm"):
        raise ValueError(f"unknown variant {variant!r}")
    cascade = variant == "cascade"
    if n_workers is None:
        try:
            n_workers = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
        except Exception:
            n_workers = 2
    examples = bert_training_examples(sf_dir, max_len, cascade=cascade)
    if max_examples is not None:
        examples = examples.limit(max_examples)
    examples = examples.materialize()
    train_ds, test_ds = train_test_split(examples, test_size=test_size)
    train_ds = train_ds.materialize()
    test_ds = test_ds.materialize()

    vocab_size = len(default_wordpiece_vocab())
    dims = dict(_BERT_TRAIN_DIMS)
    if variant == "albert":
        w = init_albert_weights(
            vocab_size, embedding_size=16, n_groups=1,
            max_position=max_len + 2, n_tags=len(BERT_TAGS), seed=seed,
            **dims,
        )
    elif variant == "bilstm":
        w = init_bert_bilstm_weights(
            vocab_size, lstm_hidden=24, max_position=max_len + 2,
            n_tags=len(BERT_TAGS), seed=seed, **dims,
        )
    elif cascade:
        w = init_transformer_weights(
            vocab_size, max_position=max_len + 2, n_tags=len(BERT_BMEO),
            n_attrs=len(CASCADE_ATTRS) + 3, seed=seed, **dims,
        )
    else:
        w = init_transformer_weights(
            vocab_size, max_position=max_len + 2, n_tags=len(BERT_TAGS),
            seed=seed, **dims,
        )
    w = {
        k: (v.astype(np.float64) if v.dtype.kind == "f" else v)
        for k, v in w.items()
    }
    loss_key = {
        "crf": "bert_crf", "albert": "albert_crf", "wol": "bert_wol",
        "cascade": "bert_cascade", "bilstm": "bert_bilstm",
    }[variant]
    n_train = train_ds.count()
    steps_per_epoch = max(1, -(-n_train // (batch_size * n_workers)))
    num_train_steps = steps_per_epoch * epochs
    num_warmup = int(num_train_steps * warmup_proportion)
    if optimizer == "dual_rate":
        opt_enc, opt_other = Adam(lr=1e-4), Adam(lr=1e-3)
    else:
        opt = AdamWeightDecay(lr=lr)

    workers = [GradWorker.remote() for _ in range(n_workers)]
    history = []
    step_no = 0
    best = -1.0
    for epoch in range(epochs):
        shuffled = train_ds.random_shuffle(seed=seed + epoch)
        shards = shuffled.split(n_workers, equal=False)
        ray.get(
            [
                wk.load.remote(sh, batch_size, loss_key)
                for wk, sh in zip(workers, shards)
            ]
        )
        params_ref = ray.put(w)
        active = list(range(n_workers))
        loss_sum, n_sum = 0.0, 0
        while active:
            res = ray.get(
                [workers[i].step.remote(params_ref) for i in active]
            )
            live = [(i, r) for i, r in zip(active, res) if r is not None]
            active = [i for i, _ in live]
            if not live:
                break
            total_n = sum(r[2] for _, r in live)
            avg = {
                k: sum(r[0][k] * r[2] for _, r in live) / total_n
                for k in live[0][1][0]
            }
            loss_sum += sum(r[1] * r[2] for _, r in live)
            n_sum += total_n
            if optimizer == "dual_rate":
                w = dual_rate_step(w, avg, opt_enc, opt_other)
            else:
                cur_lr = warmup_linear_decay_lr(
                    step_no, lr, num_train_steps, num_warmup
                )
                avg = clip_by_global_norm(avg, 1.0)  # optimization.py:99
                w = opt.step(w, avg, lr=cur_lr)
            step_no += 1
            params_ref = ray.put(w)
        row = {
            "epoch": epoch,
            "variant": variant,
            "mean_loss": loss_sum / max(n_sum, 1),
            "n_examples": n_sum,
        }
        if eval_each_epoch:
            metrics = _eval_bert_token_acc(w, test_ds, variant)
            row.update(metrics)
            head = next(iter(metrics.values()))
            if checkpoint_dir and head > best:
                best = head
                from ner_funtool_ray.model.bilstm_crf import save_weights

                save_weights(
                    f"{checkpoint_dir}/bert_{variant}_epoch{epoch}.npz",
                    {
                        k: (v.astype(np.float32) if v.dtype.kind == "f" else v)
                        for k, v in w.items()
                    },
                )
        history.append(row)
    return w, pd.DataFrame(history)
