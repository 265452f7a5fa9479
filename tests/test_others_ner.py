"""others_ner parallel-file family: roundtrip read, alignment validation,
bio+attr combination convention (E→I, S→B, null→O)."""

import os

import pytest

from ner_funtool_ray.sources.others_ner import (
    combine_bio_attr,
    load_vocab_lines,
    parse_others_ner_split,
    read_others_ner,
)

CHARS = [
    ["啄", "木", "鸟", "[SPA]", "包"],
    ["a", "b"],
]
WORDS = [["啄木鸟", "[SPA]", "包"], ["ab"]]
ATTR = [["品牌", "品牌", "品牌", "null", "品类"], ["null", "null"]]
BIO = [["B", "I", "E", "O", "S"], ["O", "O"]]
BIOATTR = [["B-品牌", "I-品牌", "I-品牌", "O", "B-品类"], ["O", "O"]]


def _write_split(d):
    os.makedirs(d, exist_ok=True)
    files = {
        "input.seq.char": CHARS,
        "input.seq.word": WORDS,
        "output.seq.attr": ATTR,
        "output.seq.bio": BIO,
        "output.seq.bioattr": BIOATTR,
    }
    for name, rows in files.items():
        with open(os.path.join(d, name), "w", encoding="utf-8") as f:
            f.writelines(" ".join(r) + "\n" for r in rows)


def test_roundtrip(tmp_path):
    d = str(tmp_path / "train")
    _write_split(d)
    tbl = parse_others_ner_split(d)
    assert tbl.num_rows == 2
    assert tbl["chars"].to_pylist() == CHARS
    assert tbl["words"].to_pylist() == WORDS
    assert tbl["bioattr"].to_pylist() == BIOATTR
    df = read_others_ner(d).to_pandas()
    assert list(df["sent_id"]) == [0, 1]


def test_combine_matches_reference_convention():
    # the bioattr stream is derivable from (bio, attr) with E→I / S→B
    for bio, attr, want in zip(BIO, ATTR, BIOATTR):
        assert combine_bio_attr(bio, attr) == want


def test_alignment_validation(tmp_path):
    d = str(tmp_path / "bad")
    _write_split(d)
    with open(os.path.join(d, "output.seq.bio"), "w", encoding="utf-8") as f:
        f.write("B I\n")  # wrong line count
    with pytest.raises(ValueError, match="line-count"):
        parse_others_ner_split(d)
    _write_split(d)
    with open(os.path.join(d, "output.seq.bio"), "w", encoding="utf-8") as f:
        f.write("B I\nO O\n")  # right lines, wrong token count on line 0
    with pytest.raises(ValueError, match="lengths differ"):
        parse_others_ner_split(d)


def test_vocab_lines(tmp_path):
    p = str(tmp_path / "vocab_bioattr.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("O\nB-品牌\nI-品牌\n")
    v = load_vocab_lines(p)
    assert v == {"O": 0, "B-品牌": 1, "I-品牌": 2}
