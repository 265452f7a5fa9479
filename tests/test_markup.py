"""Markup converters (S11-S13): Boson, MSRA, People's Daily semantics."""

import pyarrow as pa

from ner_funtool_ray.sources.markup import (
    boson_line_to_tagged,
    parse_boson,
    parse_msra,
    peoples_daily_line_to_tagged,
    read_markup_corpus,
)


def test_boson_inline_markup():
    pairs = boson_line_to_tagged("我在{{company_name:百度}}工作")
    assert pairs == [
        ("我", "O"), ("在", "O"),
        ("百", "B_company_name"), ("度", "E_company_name"),
        ("工", "O"), ("作", "O"),
    ]


def test_boson_len1_span_reference_quirk():
    # origin2tag writes a single-char span twice (B_ then E_) — preserved
    pairs = boson_line_to_tagged("{{loc:京}}好")
    assert pairs == [("京", "B_loc"), ("京", "E_loc"), ("好", "O")]


def test_boson_multichar_span_and_split():
    out = parse_boson("{{person_name:张三丰}}，在{{loc:北京}}。")
    # split on '，/O' → two sentences; trailing '。/O' ends second
    assert len(out) == 2
    chars0, tags0 = out[0]
    assert chars0 == ["张", "三", "丰"]
    assert tags0 == ["B_person_name", "M_person_name", "E_person_name"]
    chars1, tags1 = out[1]
    assert chars1 == ["在", "北", "京"]
    assert tags1 == ["O", "B_loc", "E_loc"]


def test_msra_drops_all_o_sentences():
    text = "中/B_ns 国/E_ns 人/o ，/o 很/o 好/o"
    out = parse_msra(text)
    assert len(out) == 1
    assert out[0] == (["中", "国", "人"], ["B_ns", "E_ns", "o"])
    assert len(parse_msra(text, keep_all_o=True)) == 2


def test_peoples_daily_bracket_group_and_nr_merge():
    line = "19980101/m  [中/b  国/n]nt  主/n  张/nr  三/nr  说/v  的/u"
    pairs = peoples_daily_line_to_tagged(line)
    assert pairs == [
        ("中", "B_nt"), ("国", "E_nt"),
        ("主", "O"),
        ("张", "B_nr"), ("三", "E_nr"),
        ("说", "O"),
        # trailing token 的/u skipped (reference loops to len-2)
    ]


def test_peoples_daily_single_nr_not_merged():
    line = "19980101/m  张/nr  说/v  话/n"
    pairs = peoples_daily_line_to_tagged(line)
    assert pairs == [("张", "B_nr"), ("说", "O")]


def test_read_markup_corpus_dataset(tmp_path):
    p = str(tmp_path / "boson.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("{{loc:北京}}很大。\n{{time:明天}}去。\n")
    rows = read_markup_corpus([p], fmt="boson").to_pandas()
    assert len(rows) == 2
    assert list(rows["tags"][0]) == ["B_loc", "E_loc", "O", "O"]
