"""functions.text unit coverage: langid branches, quality edge cases,
normalization, sentence splitting edge cases."""

import pytest

from ner_funtool_ray.functions.text import (
    detect_language,
    fingerprint,
    normalize_char,
    quality_features,
    split_sentences,
    token_count,
)


def test_detect_language_cjk_branch():
    assert detect_language("中文文本的语言识别测试") == "zh"
    # mixed below the 0.2 CJK share threshold with english markers → en
    assert detect_language("the quick fox is in the box 中") == "en"


def test_detect_language_markers_and_und():
    assert detect_language("der hund ist nicht da und bellt") == "de"
    assert detect_language("le chat est dans la maison pour dormir") == "fr"
    assert detect_language("el gato es una mascota para casa") == "es"
    assert detect_language("zzz qqq xxx") == "und"
    assert detect_language("") == "und"


def test_normalize_char():
    assert normalize_char("7") == "<NUM>"
    assert normalize_char("a") == "<ENG>"
    assert normalize_char("Z") == "<ENG>"
    assert normalize_char("中") == "中"
    assert normalize_char("!") == "!"


def test_split_sentences_edge_cases():
    assert split_sentences("") == []
    assert split_sentences("。。。") == []
    assert split_sentences("一句话") == ["一句话"]
    assert split_sentences("a。b！c？d") == ["a", "b", "c", "d"]


def test_quality_features_empty_and_basic():
    f = quality_features(["", "the cat!"])
    assert f["n_chars"].tolist() == [0, 8]
    assert f["n_tokens"].tolist() == [0, 2]
    assert f["punct_ratio"][1] == pytest.approx(1 / 8)
    assert f["stopword_ratio"][1] == pytest.approx(0.5)  # 'the' is a stopword
    assert f["mean_token_len"][1] == pytest.approx(3.0)
    assert f["punct_ratio"][0] == 0.0  # max(n_chars,1) guard


def test_token_count_and_fingerprint():
    assert token_count("a b  c") == 3
    assert token_count("") == 0
    assert fingerprint("  Hello   World ") == fingerprint("hello world")
    assert fingerprint("a") != fingerprint("b")


def test_winnow_fingerprints_overlap_properties():
    # exact dup docs share ALL fingerprints; a locally-edited near-dup
    # shares most; an unrelated doc shares few — the winnowing guarantee
    from ner_funtool_ray.pipelines.textops import _WinnowStage

    st = _WinnowStage()
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps in the warm afternoon sun near the garden wall"
    )
    near = base.replace("lazy", "sleepy")
    other = "completely different content about ray data pipelines and arrow"
    f_base = set(st._doc_fps(base))
    f_dup = set(st._doc_fps("  ".join(base.split())))  # whitespace-normalized dup
    f_near = set(st._doc_fps(near))
    f_other = set(st._doc_fps(other))
    assert f_base and f_base == f_dup
    sim_near = len(f_base & f_near) / len(f_base | f_near)
    sim_other = len(f_base & f_other) / max(len(f_base | f_other), 1)
    assert sim_near > 0.6
    assert sim_other < 0.2
    assert st._doc_fps("") == []
    assert len(st._doc_fps("ab")) == 1  # shorter than k → one gram
