"""Span decoder / label transform parity with the reference.

Expected values were obtained by executing the reference's pure-Python
functions (`public_tools/ner_utils.py`, `public_tools/entity_evaluating.py`)
on the fixtures below and are hardcoded here (tests stay self-contained).
"""

from ner_funtool_ray.functions.spans import (
    decode_bmes,
    decode_clue_spans,
    decode_positional,
    get_entity_strings,
    spans_to_clue_label,
    split_label,
    trans_label_row,
)

TAGS = ["B-ORG", "M-ORG", "M-ORG", "E-ORG", "O", "M-ORG", "M-ORG"]
SENT = "中国首都是北京"


def test_get_result_reference_fixture():
    # reference ner_utils.py:150-176 __main__ fixture
    assert decode_clue_spans(SENT, TAGS) == ([[0, 3]], ["ORG"])


def test_get_result_s_tag_and_trailing_open_span():
    # reference output: ([[0, 0], [1, 2]], ['X', 'Y']) — trailing B-Z dropped
    assert decode_clue_spans("abcde", ["S-X", "B-Y", "M-Y", "O", "B-Z"]) == (
        [[0, 0], [1, 2]],
        ["X", "Y"],
    )


def test_get_result_m_without_open_span_dropped():
    assert decode_clue_spans("abc", ["M-Q", "E-Q", "O"]) == ([], [])


def test_get_entity_strings_reference_quirk():
    # reference get_entity keeps the separator via tag[1:] → '-ORG:...'
    assert get_entity_strings(SENT, TAGS) == ["-ORG:中国首都"]


def test_decode_bmes_typed():
    assert decode_bmes(SENT, TAGS) == [("ORG", "中国首都", 0, 3)]


def test_decode_bmes_no_type_check():
    # get_entity does NOT check type consistency on M/E (ner_utils.py:51-53)
    tags = ["B-ORG", "M-LOC", "E-ORG"]
    assert decode_bmes("abc", tags) == [("ORG", "abc", 0, 2)]


def test_decode_positional_type_check():
    # calculate DOES check type consistency (entity_evaluating.py:23-25)
    assert decode_positional("abc", ["B-ORG", "M-LOC", "E-ORG"]) == []
    assert decode_positional("中国北ab", ["B-ORG", "M-ORG", "E-ORG", "O", "O"]) == [
        ("ORG", "中国北", 0, 2)
    ]


def test_decode_positional_fresh_list_per_call():
    # the reference's mutable-default res=[] bug must NOT be replicated
    a = decode_positional("中国北", ["B-ORG", "M-ORG", "E-ORG"])
    b = decode_positional("中国北", ["B-ORG", "M-ORG", "E-ORG"])
    assert a == b and len(a) == 1


def test_trans_label_reference_fixture():
    # reference trans_label([[1,2,3,0,1,3]], [[1,1,2,0,0,2]], ...) →
    # [['B-ORG','M-ORG','E-LOC','O','O','E-LOC']]
    bmeo = ["B", "M", "E", "O", "B", "E"]
    attr = ["ORG", "ORG", "LOC", "O", "O", "LOC"]
    assert trans_label_row(bmeo, attr) == ["B-ORG", "M-ORG", "E-LOC", "O", "O", "E-LOC"]


def test_split_label():
    assert split_label("B-ORG") == ("B", "ORG")
    assert split_label("O") == ("O", "O")
    assert split_label("[CLS]") == ("[CLS]", "O")


def test_spans_to_clue_label():
    label = spans_to_clue_label(SENT, [[0, 3], [5, 6]], ["ORG", "LOC"])
    assert label == {"ORG": {"中国首都": [[0, 3]]}, "LOC": {"北京": [[5, 6]]}}
