"""Tokenizer parity (expected outputs harvested by executing the reference
`bert/tokenization.py` on these fixtures) + feature-encoder semantics
(convert_single_example, run_bert_crf.py:340-433)."""

import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.functions.tokenization import (
    BasicTokenizer,
    FullTokenizer,
    WordpieceTokenizer,
)
from ner_funtool_ray.stages.encode import convert_example, encode_features

WP_VOCAB = {
    t: i
    for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
         "hello", "world", "中", "国", "!", "you", "##r"]
    )
}


@pytest.mark.parametrize(
    "text,expect",
    [
        ("Hello WORLD!", ["hello", "world", "!"]),
        ("中国people你好", ["中", "国", "people", "你", "好"]),
        ("naïve café", ["naive", "cafe"]),  # NFD accent strip
        ("don't stop-me", ["don", "'", "t", "stop", "-", "me"]),
        ("  spaces\tand\nnewlines  ", ["spaces", "and", "newlines"]),
        ("數字123abc", ["數", "字", "123abc"]),
        ("a\x00b�c", ["abc"]),  # control/invalid chars dropped
    ],
)
def test_basic_tokenizer_reference_parity(text, expect):
    assert BasicTokenizer(do_lower_case=True).tokenize(text) == expect


@pytest.mark.parametrize(
    "word,expect",
    [
        ("unaffable", ["un", "##aff", "##able"]),
        ("hello", ["hello"]),
        ("unknownword", ["[UNK]"]),
        ("中", ["中"]),
        ("unaffableunaff", ["[UNK]"]),  # greedy fails mid-word → UNK
    ],
)
def test_wordpiece_reference_parity(word, expect):
    assert WordpieceTokenizer(WP_VOCAB).tokenize(word) == expect


def test_wordpiece_overlong_token_unk():
    assert WordpieceTokenizer(WP_VOCAB).tokenize("a" * 201) == ["[UNK]"]


def test_full_tokenizer_ids_roundtrip():
    ft = FullTokenizer(WP_VOCAB)
    toks = ft.tokenize("Hello 中国 unaffable!")
    assert toks == ["hello", "中", "国", "un", "##aff", "##able", "!"]
    ids = ft.convert_tokens_to_ids(toks)
    assert ft.convert_ids_to_tokens(ids) == toks
    assert ft.convert_tokens_to_ids(["zzz"]) == [WP_VOCAB["[UNK]"]]


LABEL_MAP = {"O": 0, "B-ORG": 1, "E-ORG": 2, "X": 3, "[CLS]": 4, "[SEP]": 5}


def test_convert_example_reference_semantics():
    f = convert_example(
        ["中", "国", "unaffable"], ["B-ORG", "E-ORG", "O"],
        FullTokenizer(WP_VOCAB), LABEL_MAP, max_seq_length=10,
    )
    # tokens: 中 国 un ##aff ##able → labels B-ORG E-ORG O X X
    assert f["input_ids"][:7] == [
        WP_VOCAB["[CLS]"], WP_VOCAB["中"], WP_VOCAB["国"], WP_VOCAB["un"],
        WP_VOCAB["##aff"], WP_VOCAB["##able"], WP_VOCAB["[SEP]"],
    ]
    assert f["label_ids"] == [4, 1, 2, 0, 3, 3, 5, 0, 0, 0]  # pad label = O
    assert f["input_mask"] == [1] * 7 + [0] * 3
    assert f["segment_ids"] == [0] * 10
    assert all(len(f[k]) == 10 for k in f)


def test_convert_example_truncation():
    f = convert_example(
        ["中"] * 20, ["O"] * 20, FullTokenizer(WP_VOCAB), LABEL_MAP,
        max_seq_length=8,
    )
    # truncate to max_seq-2 = 6 tokens + CLS/SEP
    assert f["input_mask"] == [1] * 8
    assert f["input_ids"][0] == WP_VOCAB["[CLS]"]
    assert f["input_ids"][7] == WP_VOCAB["[SEP]"]


def test_encode_features_stage():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "chars": pa.array([["中", "国"], ["hello"]], type=pa.list_(pa.string())),
                "tags": pa.array([["B-ORG", "E-ORG"], ["O"]], type=pa.list_(pa.string())),
            }
        )
    )
    out = encode_features(ds, WP_VOCAB, LABEL_MAP, max_seq_length=6).to_pandas()
    assert len(out) == 2
    for col in ("input_ids", "input_mask", "segment_ids", "label_ids"):
        assert all(len(v) == 6 for v in out[col])
