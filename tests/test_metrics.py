"""Metric math parity with the reference (values harvested by executing
`public_tools/tag_evaluating.py` / `entity_evaluating.py` on this fixture)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.metrics.entity_metrics import entity_metrics
from ner_funtool_ray.metrics.tag_metrics import confusion_matrix, tag_report

GOLD = ["B-ORG", "M-ORG", "E-ORG", "O", "B-LOC", "E-LOC", "O", "O", "B-ORG", "E-ORG"]
PRED = ["B-ORG", "M-ORG", "E-ORG", "O", "B-ORG", "E-LOC", "O", "B-LOC", "B-ORG", "M-ORG"]


def _pairs_ds():
    return ray.data.from_arrow(
        pa.table({"gold_tag": GOLD, "pred_tag": PRED})
    )


def test_tag_report_reference_parity():
    rep = tag_report(_pairs_ds(), remove_o=False).set_index("tag")
    # reference Metrics outputs on (GOLD, PRED):
    expect = {
        "B-LOC": (0.0, 0.0, 0.0, 1),
        "B-ORG": (2 / 3, 1.0, 0.799999999952, 2),
        "E-LOC": (1.0, 1.0, 0.99999999995, 1),
        "E-ORG": (1.0, 0.5, 0.6666666666222222, 2),
        "M-ORG": (0.5, 1.0, 0.6666666666222222, 1),
        "O": (1.0, 2 / 3, 0.799999999952, 3),
    }
    for tag, (p, r, f1, sup) in expect.items():
        row = rep.loc[tag]
        assert row["precision"] == pytest.approx(p)
        assert row["recall"] == pytest.approx(r)
        assert row["f1"] == pytest.approx(f1)
        assert row["support"] == sup
    avg = rep.loc["avg/total"]
    assert avg["precision"] == pytest.approx(0.7833333333333333)
    assert avg["recall"] == pytest.approx(0.7)
    assert avg["f1"] == pytest.approx(0.6999999999576667)


def test_tag_report_remove_o_reference_parity():
    rep = tag_report(_pairs_ds(), remove_o=True).set_index("tag")
    assert "O" not in rep.index
    avg = rep.loc["avg/total"]
    assert avg["precision"] == pytest.approx(0.6904761904761905)
    assert avg["recall"] == pytest.approx(0.7142857142857143)
    assert avg["f1"] == pytest.approx(0.6571428571029524)
    # B-LOC precision 0: its only pred occurrence sat on a removed gold-O slot
    assert rep.loc["B-LOC", "precision"] == 0.0


def test_tag_report_perfect_prediction():
    ds = ray.data.from_arrow(pa.table({"gold_tag": GOLD, "pred_tag": GOLD}))
    rep = tag_report(ds, remove_o=True)
    body = rep[rep["tag"] != "avg/total"]
    assert (body["precision"] == 1.0).all() and (body["recall"] == 1.0).all()
    assert rep.iloc[-1]["f1"] == pytest.approx(1.0, abs=1e-9)


def test_confusion_matrix_counts():
    cm = confusion_matrix(_pairs_ds()).to_pandas()
    as_dict = {
        (r.gold_tag, r.pred_tag): r.n for r in cm.itertuples()
    }
    # gold B-LOC predicted B-ORG once; gold O predicted B-LOC once; etc.
    assert as_dict[("B-LOC", "B-ORG")] == 1
    assert as_dict[("O", "B-LOC")] == 1
    assert as_dict[("B-ORG", "B-ORG")] == 2
    assert as_dict[("O", "O")] == 2
    assert sum(as_dict.values()) == 10  # all pairs in-tagset here


def test_prf_from_confusion_micro_macro_weighted():
    # hand-computed on the GOLD/PRED confusion table (A3 / tf_metrics math)
    from ner_funtool_ray.metrics.tag_metrics import prf_from_confusion

    cm = confusion_matrix(_pairs_ds()).to_pandas()
    p, r, f = prf_from_confusion(cm, average="micro")
    assert (p, r, f) == (pytest.approx(0.7), pytest.approx(0.7), pytest.approx(0.7))
    p, r, f = prf_from_confusion(cm, average="macro")
    assert p == pytest.approx(4.166666666 / 6)
    assert r == pytest.approx(4.166666666 / 6)
    assert f == pytest.approx(3.933333333 / 6)
    p, r, f = prf_from_confusion(cm, average="weighted")
    # weighted P/R match the reference Metrics weighted average (cross-check)
    assert p == pytest.approx(0.7833333333)
    assert r == pytest.approx(0.7)
    assert f == pytest.approx(0.7)


def test_entity_metrics_reference_parity():
    chars = "abcdefghij"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "chars": [chars],
                "gold_tags": pa.array([GOLD], type=pa.list_(pa.string())),
                "pred_tags": pa.array([PRED], type=pa.list_(pa.string())),
            }
        )
    )
    # reference entity_metrics_without_lableid → (1.0, 1/3, 0.5)
    p, r, f1 = entity_metrics(ds)
    assert (p, r, f1) == (1.0, pytest.approx(1 / 3), pytest.approx(0.5))


def test_entity_metrics_swap_swaps_p_and_r():
    chars = "abcdefghij"

    def ds(g, p):
        return ray.data.from_arrow(
            pa.table(
                {
                    "chars": [chars],
                    "gold_tags": pa.array([g], type=pa.list_(pa.string())),
                    "pred_tags": pa.array([p], type=pa.list_(pa.string())),
                }
            )
        )

    p1, r1, _ = entity_metrics(ds(GOLD, PRED))
    p2, r2, _ = entity_metrics(ds(PRED, GOLD))
    assert (p1, r1) == (r2, p2)


def test_entity_metrics_empty_intersection_zeroes():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "chars": ["abc"],
                "gold_tags": pa.array([["B-X", "E-X", "O"]], type=pa.list_(pa.string())),
                "pred_tags": pa.array([["O", "B-Y", "E-Y"]], type=pa.list_(pa.string())),
            }
        )
    )
    assert entity_metrics(ds) == (0.0, 0.0, 0.0)


def test_best_metric_tracker():
    from ner_funtool_ray.metrics.tag_metrics import BestMetricTracker

    t = BestMetricTracker()
    assert t.update(0.5) is True      # first value always improves
    assert t.update(0.4) is False
    assert t.update(0.67) is True
    assert t.update(0.67) is False    # ties do not re-save (reference: >)
    assert t.best == 0.67 and t.best_round == 2
    assert t.history == [0.5, 0.4, 0.67, 0.67]
