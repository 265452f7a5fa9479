"""Tag-level P/R/F1 + confusion matrix as Ray Data aggregates (SURVEY §2.6 A1-A3).

Reference math reimplemented (`public_tools/tag_evaluating.py:4-135`):

- tagset = set of GOLD tags (tags only predicted are excluded from rows);
- per-tag: tp = #(gold==pred==tag), P = tp/pred_cnt (0 when pred_cnt==0),
  R = tp/gold_cnt, F1 = 2PR/(P+R+1e-10)  ← the reference's epsilon;
- weighted average by gold support / total gold count;
- remove_O drops positions where the GOLD tag is 'O'
  (`tag_evaluating.py:137-152`);
- confusion matrix counts (gold, pred) pairs where BOTH tags are in the
  gold tagset (`tag_evaluating.py:195-201` skips ValueError rows).

Distributed shape: per-batch partial counters inside ``map_batches`` →
tiny ``groupby(tag).Sum`` shuffle → driver-side scalar math on the
per-tag table (the per-tag table is bounded by |tagset|, never by rows).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum
from ner_funtool_ray.utils import pa_from_pandas


def _partial_tag_counts(batch: pa.Table) -> pa.Table:
    gold = batch["gold_tag"].to_pylist()
    pred = batch["pred_tag"].to_pylist()
    tp: Counter[str] = Counter()
    pred_cnt: Counter[str] = Counter(pred)
    gold_cnt: Counter[str] = Counter(gold)
    for g, p in zip(gold, pred):
        if g == p:
            tp[g] += 1
    tags = sorted(set(pred_cnt) | set(gold_cnt))
    return pa.table(
        {
            "tag": pa.array(tags, type=pa.string()),
            "tp": pa.array([tp.get(t, 0) for t in tags], type=pa.int64()),
            "pred_cnt": pa.array([pred_cnt.get(t, 0) for t in tags], type=pa.int64()),
            "gold_cnt": pa.array([gold_cnt.get(t, 0) for t in tags], type=pa.int64()),
        }
    )


def tag_counts(pairs: "ray.data.Dataset", remove_o: bool = False) -> "ray.data.Dataset":
    """(gold_tag, pred_tag) rows → per-tag (tag, tp, pred_cnt, gold_cnt)."""
    if remove_o:
        pairs = pairs.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["gold_tag"], "O")),
            batch_format="pyarrow",
        )
    partial = pairs.map_batches(_partial_tag_counts, batch_format="pyarrow")
    return partial.groupby("tag").aggregate(
        Sum("tp", alias_name="tp"),
        Sum("pred_cnt", alias_name="pred_cnt"),
        Sum("gold_cnt", alias_name="gold_cnt"),
    )


def tag_report(pairs: "ray.data.Dataset", remove_o: bool = False) -> pd.DataFrame:
    """Per-tag report (tag, precision, recall, f1, support) restricted to the
    gold tagset, plus an 'avg/total' weighted row — reference
    ``Metrics.report_scores`` semantics."""
    df = tag_counts(pairs, remove_o).to_pandas()
    df = df[df["gold_cnt"] > 0].reset_index(drop=True)  # tagset = gold tags
    precision = df.apply(
        lambda r: 0.0 if r["pred_cnt"] == 0 else r["tp"] / r["pred_cnt"], axis=1
    )
    recall = df["tp"] / df["gold_cnt"]
    f1 = 2 * precision * recall / (precision + recall + 1e-10)
    out = pd.DataFrame(
        {
            "tag": df["tag"],
            "precision": precision,
            "recall": recall,
            "f1": f1,
            "support": df["gold_cnt"].astype("int64"),
        }
    ).sort_values("tag", kind="mergesort").reset_index(drop=True)
    total = int(out["support"].sum())
    if total > 0:
        w = out["support"] / total
        avg = pd.DataFrame(
            {
                "tag": ["avg/total"],
                "precision": [(out["precision"] * w).sum()],
                "recall": [(out["recall"] * w).sum()],
                "f1": [(out["f1"] * w).sum()],
                "support": [total],
            }
        )
        out = pd.concat([out, avg], ignore_index=True)
    return out


def prf_from_confusion(
    cm: pd.DataFrame,
    beta: float = 1.0,
    average: str = "micro",
    exclude: tuple[str, ...] = (),
) -> tuple[float, float, float]:
    """Micro/macro/weighted P/R/Fβ from a (gold_tag, pred_tag, n) confusion
    table — reference ``tf_metrics`` semantics (`public_tools/tf_metrics.py:
    15-215`, streaming confusion-matrix metrics): per-class precision =
    diag/col-sum, recall = diag/row-sum, Fβ = (1+β²)PR/(β²P+R); micro sums
    TP/col/row over the selected classes first; weighted weights per-class
    scores by gold support.  ``exclude`` drops classes (e.g. 'O') from the
    selection, mirroring the mask at `run_bert_crf.py:627-630`."""
    tags = sorted(
        (set(cm["gold_tag"]) | set(cm["pred_tag"])) - set(exclude)
    )
    pivot = (
        cm.pivot_table(
            index="gold_tag", columns="pred_tag", values="n",
            aggfunc="sum", fill_value=0,
        )
        .reindex(index=tags, columns=tags, fill_value=0)
        .to_numpy(dtype=float)
    )
    diag = pivot.diagonal()
    col = pivot.sum(axis=0)
    row = pivot.sum(axis=1)
    b2 = beta * beta

    def fbeta(p, r):
        denom = b2 * p + r
        return (1 + b2) * p * r / denom if denom > 0 else 0.0

    if average == "micro":
        p = diag.sum() / col.sum() if col.sum() else 0.0
        r = diag.sum() / row.sum() if row.sum() else 0.0
        return p, r, fbeta(p, r)
    import numpy as np

    ps = np.divide(diag, col, out=np.zeros_like(diag), where=col > 0)
    rs = np.divide(diag, row, out=np.zeros_like(diag), where=row > 0)
    fs = np.array([fbeta(p, r) for p, r in zip(ps, rs)])
    if average == "macro":
        n = len(tags) or 1
        return float(ps.sum() / n), float(rs.sum() / n), float(fs.sum() / n)
    if average == "weighted":
        w = row / (row.sum() or 1.0)
        return float(ps @ w), float(rs @ w), float(fs @ w)
    raise ValueError(average)


def confusion_matrix(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(gold, pred, n) counts over pairs where both tags appear in the gold
    tagset.  The gold tagset is computed with a small unique() and broadcast
    into the filter (semi-join, no row shuffle)."""
    tagset = set(pairs.unique("gold_tag"))

    def filt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tags = pa.array(sorted(tagset), type=pa.string())
        mask = pc.and_(
            pc.is_in(batch["gold_tag"], value_set=tags),
            pc.is_in(batch["pred_tag"], value_set=tags),
        )
        return batch.filter(mask)

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.to_pandas()
            .groupby(["gold_tag", "pred_tag"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa_from_pandas(df, preserve_index=False)

    return (
        pairs.map_batches(filt, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["gold_tag", "pred_tag"])
        .aggregate(Sum("n", alias_name="n"))
    )


class BestMetricTracker:
    """A8 (`train_lstm_crf.py:225,264-265`): running max over eval rounds.

    The reference keeps ``best_f1`` as a loop variable and saves a
    checkpoint when it improves; here it is a small driver-side artifact a
    periodic eval pipeline can fold results into (`update` returns True
    exactly when the metric improved, i.e. when the caller should persist).
    """

    def __init__(self) -> None:
        self.best: float | None = None
        self.best_round: int | None = None
        self.history: list[float] = []

    def update(self, value: float) -> bool:
        self.history.append(float(value))
        if self.best is None or value > self.best:
            self.best = float(value)
            self.best_round = len(self.history) - 1
            return True
        return False
