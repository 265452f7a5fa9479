"""Entity-level P/R/F1 (SURVEY §2.6 A4) + CLUE per-label F1 (A5).

Reference semantics:

- ``entity_metrics`` (`public_tools/entity_evaluating.py:60-81`): decode
  gold and pred entity lists (with positions), intersect with LIST
  semantics (``[i for i in pred if i in gold]`` — each pred occurrence
  counts if present in gold), P = |∩|/|pred|, R = |∩|/|gold|; all-zero when
  the intersection is empty (reference quirk, kept).
- CLUE scorer (`public_tools/cluener_score.py:10-49`): per-label TP/FP/FN
  over span-key membership per (pred, gold) document pair; macro average
  over the fixed label list.

Distributed shape: the per-sentence intersection is row-local (gold and
pred live in the same row — a positional zip join, SURVEY §2.5 J3); only
three counters per batch are shuffled.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ner_funtool_ray.functions.spans import decode_positional


def _partial_entity_counts(batch: pa.Table) -> pa.Table:
    """Rows: (chars: str, gold_tags: list<str>, pred_tags: list<str>)."""
    n_pred = n_gold = n_inter = 0
    chars_col = batch["chars"].to_pylist()
    gold_col = batch["gold_tags"].to_pylist()
    pred_col = batch["pred_tags"].to_pylist()
    for chars, gold, pred in zip(chars_col, gold_col, pred_col):
        ge = decode_positional(chars, gold)
        pe = decode_positional(chars, pred)
        n_pred += len(pe)
        n_gold += len(ge)
        n_inter += sum(1 for e in pe if e in ge)  # list-membership semantics
    return pa.table(
        {
            "n_pred": pa.array([n_pred], type=pa.int64()),
            "n_gold": pa.array([n_gold], type=pa.int64()),
            "n_inter": pa.array([n_inter], type=pa.int64()),
        }
    )


def entity_metrics(tagged: "ray.data.Dataset") -> tuple[float, float, float]:
    """Dataset of (chars, gold_tags, pred_tags) → (precision, recall, f1).

    Returns (0, 0, 0) when the intersection is empty — the reference's
    behavior (`entity_evaluating.py:75-81`)."""
    partial = tagged.map_batches(_partial_entity_counts, batch_format="pyarrow")
    agg = partial.aggregate(
        Sum("n_pred", alias_name="n_pred"),
        Sum("n_gold", alias_name="n_gold"),
        Sum("n_inter", alias_name="n_inter"),
    )
    n_pred = agg.get("sum(n_pred)", agg.get("n_pred", 0)) or 0
    n_gold = agg.get("sum(n_gold)", agg.get("n_gold", 0)) or 0
    n_inter = agg.get("sum(n_inter)", agg.get("n_inter", 0)) or 0
    if n_inter == 0:
        return 0.0, 0.0, 0.0
    p = n_inter / n_pred
    r = n_inter / n_gold
    return p, r, 2 * p * r / (p + r)


CLUE_LABELS = (
    "address", "book", "company", "game", "government",
    "movie", "name", "organization", "position", "scene",
)


def _partial_clue_counts(batch: pa.Table) -> pa.Table:
    """Rows: pred_label / gold_label are {label: {surface: spans}} dicts
    (JSON-encoded strings).  Emits per-label TP/FP/FN partials."""
    import json

    tp = {l: 0 for l in CLUE_LABELS}
    fp = {l: 0 for l in CLUE_LABELS}
    fn = {l: 0 for l in CLUE_LABELS}
    for pred_s, gold_s in zip(
        batch["pred_label"].to_pylist(), batch["gold_label"].to_pylist()
    ):
        pred = json.loads(pred_s) if isinstance(pred_s, str) else (pred_s or {})
        gold = json.loads(gold_s) if isinstance(gold_s, str) else (gold_s or {})
        for label in CLUE_LABELS:
            p_keys = list(pred.get(label, {}).keys())
            g_keys = list(gold.get(label, {}).keys())
            for k in p_keys:
                if k in g_keys:
                    tp[label] += 1
                else:
                    fp[label] += 1
            for k in g_keys:
                if k not in p_keys:
                    fn[label] += 1
    return pa.table(
        {
            "label": pa.array(list(CLUE_LABELS)),
            "tp": pa.array([tp[l] for l in CLUE_LABELS], type=pa.int64()),
            "fp": pa.array([fp[l] for l in CLUE_LABELS], type=pa.int64()),
            "fn": pa.array([fn[l] for l in CLUE_LABELS], type=pa.int64()),
        }
    )


def clue_f1(docs: "ray.data.Dataset") -> tuple[dict[str, float], float]:
    """Dataset of (pred_label, gold_label) JSON rows → per-label F1 + macro
    average, reference ``get_f1_score`` semantics."""
    partial = docs.map_batches(_partial_clue_counts, batch_format="pyarrow")
    per = (
        partial.groupby("label")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
        )
        .to_pandas()
        .set_index("label")
    )
    scores: dict[str, float] = {}
    for label in CLUE_LABELS:
        tp = int(per.loc[label, "tp"]) if label in per.index else 0
        fp = int(per.loc[label, "fp"]) if label in per.index else 0
        fn = int(per.loc[label, "fn"]) if label in per.index else 0
        p = tp / (tp + fp) if (tp + fp) else 0.0
        r = tp / (tp + fn) if (tp + fn) else 0.0
        scores[label] = 2 * p * r / (p + r) if (p + r) else 0.0
    return scores, sum(scores.values()) / len(CLUE_LABELS)
