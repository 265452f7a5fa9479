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

__all__ = ["training_examples", "train_bilstm_crf"]


def training_examples(
    sf_dir: str, max_len: int = 128
) -> "ray.data.Dataset":
    """Corpus → (input_ids, label_ids, length) example rows: sentences
    with gazetteer-gold tags (the repo's training-label source), chars
    encoded through the SAME vocab path ``stages/tag.NerTagger`` serves
    with, tags through the TAGS index — so a trained checkpoint drops
    straight into the serving actors via ``weights_path``."""
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.stages.gazetteer import gold_tag_sentences
    from ner_funtool_ray.stages.ingest import ingest
    from ner_funtool_ray.stages.sentence import split_to_sentences

    char2id = default_char_vocab()
    tag2id = {t: i for i, t in enumerate(TAGS)}
    sents = split_to_sentences(ingest(corpus_from_documents(sf_dir)))
    both = gold_tag_sentences(sents, max_seq_len=max_len)

    def encode(batch: pa.Table) -> pa.Table:
        ids_out, lab_out, len_out = [], [], []
        for text, tags in zip(
            batch["sentence"].to_pylist(), batch["gold_tags"].to_pylist()
        ):
            t = (text or "")[:max_len]
            if not t:
                continue
            ids = [char2id.get(c, _UNK_ID) for c in t]
            labs = [tag2id.get(g, 0) for g in tags[: len(ids)]]
            labs += [0] * (len(ids) - len(labs))
            ids_out.append(ids)
            lab_out.append(labs)
            len_out.append(len(ids))
        return pa.table(
            {
                "input_ids": pa.array(ids_out, type=pa.list_(pa.int32())),
                "label_ids": pa.array(lab_out, type=pa.list_(pa.int32())),
                "length": pa.array(len_out, type=pa.int64()),
            }
        )

    return both.map_batches(encode, batch_format="pyarrow")


def _pad_batch(batch: pa.Table):
    """``pad_sequences`` semantics (`train_lstm_crf.py:235-237`,
    pad_mark=0) at batch max length."""
    ids = batch["input_ids"].to_pylist()
    labs = batch["label_ids"].to_pylist()
    lengths = np.array([len(s) for s in ids], dtype=np.int32)
    S = max(1, int(lengths.max()) if len(lengths) else 1)
    mat = np.zeros((len(ids), S), dtype=np.int32)
    lab = np.zeros((len(ids), S), dtype=np.int32)
    for i, (s, l) in enumerate(zip(ids, labs)):
        mat[i, : len(s)] = s
        lab[i, : len(l)] = l
    return mat, lab, lengths


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
        ids, labs, lengths = _pad_batch(batch)
        if self._loss == "wol_ce":
            # T5 objective: entity-weighted softmax CE
            # (run_bert_wol.py:575-593, use_weights_of_loss)
            loss, grads = bilstm_wol_loss_and_grads(
                params, ids, labs, lengths, o_index=0, use_weights=True
            )
        else:
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
    T5 training objective; eval still decodes with the CRF head."""
    from ner_funtool_ray.metrics.tag_metrics import BestMetricTracker
    from ner_funtool_ray.sources.splits import train_test_split

    if n_workers is None:
        try:
            n_workers = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
        except Exception:
            n_workers = 2
    examples = training_examples(sf_dir, max_len).materialize()
    train_ds, test_ds = train_test_split(examples, test_size=test_size)
    train_ds = train_ds.materialize()
    test_ds = test_ds.materialize()

    w = init_weights(
        vocab_size=len(default_char_vocab()),
        emb_dim=32,
        hidden=48,
        n_tags=len(TAGS),
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
                wk.load.remote(sh, batch_size, loss)
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
