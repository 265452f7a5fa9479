"""Span decoding + label-scheme transforms (SURVEY.md §2.3 M11-M15).

Reimplements (from observed behavior, not copied code) the reference's:

- ``trans_label`` — combine cascade BMEO + attr streams with O-propagation
  (`public_tools/ner_utils.py:9-39`): combined is "O" if either head says O,
  else ``f"{bmeo}{sep}{attr}"``; per-position attr (variant 1 in the
  reference docstring).
- ``get_entity`` — BMES decoder emitting typed spans
  (`public_tools/ner_utils.py:42-59`).  Reference quirk: it slices the tag
  with ``[1:]`` so the emitted string keeps the separator (``"-ORG:中国"``);
  :func:`get_entity_strings` reproduces that byte-for-byte for parity tests,
  :func:`decode_bmes` is the typed engine decoder (type, surface, start, end).
- ``get_result`` — CLUE offset decoder handling O/S-/B-/M-/E- prefixes
  (`public_tools/ner_utils.py:103-146`), inclusive [start, end] offsets.
- ``calculate`` — positional entity extraction with M/E type-consistency
  check (`public_tools/entity_evaluating.py:12-33`).  The reference's
  mutable-default ``res=[]`` accumulator bug is deliberately NOT replicated
  (SURVEY.md §7.4).
- label splitter — ``'B-ORG' → ('B','ORG')``, single-part tags → attr ``'O'``
  (`run_multitask_bert_crf.py:311-319`).
"""

from __future__ import annotations


def split_label(tag: str, sep: str = "-") -> tuple[str, str]:
    """Composite tag → (bmeo, attr); 'O'/'X'/'[CLS]' → (tag, 'O')."""
    parts = tag.split(sep, 1)
    if len(parts) == 1:
        return tag, "O"
    return parts[0], parts[1]


def trans_label_row(bmeo: list[str], attr: list[str], sep: str = "-") -> list[str]:
    """Combine one sentence's BMEO + attr tag streams (O-propagation)."""
    out = []
    for b, a in zip(bmeo, attr):
        if b == "O" or a == "O":
            out.append("O")
        else:
            out.append(f"{b}{sep}{a}")
    return out


def decode_bmes(chars, tags) -> list[tuple[str, str, int, int]]:
    """BMES span decoder → [(type, surface, start, end_inclusive)].

    Engine-facing typed version of the reference ``get_entity`` semantics:
    B starts a span, M extends an open span, E extends + emits, anything
    else (O, S, scheme noise) resets; spans left open at sentence end are
    dropped; no type-consistency check on M/E (matching ner_utils.py:42-59 —
    see :func:`decode_positional` for the checking variant).
    """
    res = []
    open_type = None
    start = -1
    surface: list[str] = []
    for j, tag in enumerate(tags):
        head = tag[:1]
        if head == "B":
            open_type = split_label(tag)[1]
            start = j
            surface = [chars[j]]
        elif head == "M" and open_type is not None:
            surface.append(chars[j])
        elif head == "E" and open_type is not None:
            surface.append(chars[j])
            res.append((open_type, "".join(surface), start, j))
            open_type = None
            surface = []
        else:
            open_type = None
            surface = []
    return res


def get_entity_strings(chars, tags) -> list[str]:
    """Byte-parity variant of reference ``get_entity`` (ner_utils.py:42-59):
    emits ``tag[1:] + ':' + surface`` strings (separator retained — the
    reference's ``[1:]`` slice quirk), skipping O the way the reference skips
    label id 0."""
    res = []
    entity = ""
    for j, tag in enumerate(tags):
        if tag == "O":
            continue  # reference: label id 0 → continue
        head = tag[0]
        if head == "B":
            entity = tag[1:] + ":" + chars[j]
        elif head == "M" and len(entity) != 0:
            entity += chars[j]
        elif head == "E" and len(entity) != 0:
            entity += chars[j]
            res.append(entity)
            entity = ""
        else:
            entity = ""
    return res


def decode_clue_spans(sentence: str, labels) -> tuple[list[list[int]], list[str]]:
    """CLUE offset decoder — reference ``get_result`` semantics
    (ner_utils.py:103-146): returns ([[start, end_inclusive], ...], [type, ...]).

    Behavior preserved exactly: O closes an open run (even with empty type);
    S- emits a singleton; B- opens; M- extends an open run; any other label
    (E-, X, [SEP], ...) extends-and-closes an open run; trailing open runs
    are dropped; offsets are char positions in ``sentence`` (iteration capped
    at min(len(sentence), len(labels))).
    """
    result_words: list[list[int]] = []
    result_pos: list[str] = []
    temp: list[int] = []
    temp_pos = ""
    for i in range(min(len(sentence), len(labels))):
        lab = labels[i]
        if lab.startswith("O"):
            if temp:
                result_words.append([min(temp), max(temp)])
                result_pos.append(temp_pos)
            temp, temp_pos = [], ""
        elif lab.startswith("S-"):
            if temp:
                result_words.append([min(temp), max(temp)])
                result_pos.append(temp_pos)
            result_words.append([i, i])
            result_pos.append(lab.split("-")[1])
            temp, temp_pos = [], ""
        elif lab.startswith("B-"):
            if temp:
                result_words.append([min(temp), max(temp)])
                result_pos.append(temp_pos)
            temp = [i]
            temp_pos = lab.split("-")[1]
        elif lab.startswith("M-"):
            if temp:
                temp.append(i)
                if temp_pos == "":
                    temp_pos = lab.split("-")[1]
        else:
            if temp:
                temp.append(i)
                if temp_pos == "":
                    temp_pos = lab.split("-")[1]
                result_words.append([min(temp), max(temp)])
                result_pos.append(temp_pos)
            temp, temp_pos = [], ""
    return result_words, result_pos


def decode_positional(
    chars, tags
) -> list[tuple[str, str, int, int]]:
    """Type-consistent BMES decoder — reference ``calculate`` semantics
    (entity_evaluating.py:12-33): M/E must carry the SAME attr as the open
    span or the span resets.  Returns [(type, surface, start, end)].
    Fresh result list per call (the reference's mutable default-arg
    accumulation is a bug we do not replicate, SURVEY.md §7.4)."""
    res = []
    open_type = None
    start = -1
    surface: list[str] = []
    for j, tag in enumerate(tags):
        if tag == "O":
            continue  # reference skips id 0 without resetting
        head, attr = tag[:1], split_label(tag)[1]
        if head == "B":
            open_type, start, surface = attr, j, [chars[j]]
        elif head == "M" and open_type == attr and surface:
            surface.append(chars[j])
        elif head == "E" and open_type == attr and surface:
            surface.append(chars[j])
            res.append((attr, "".join(surface), start, j))
            open_type, surface = None, []
        else:
            open_type, surface = None, []
    return res


def spans_to_clue_label(
    sentence: str, spans: list[list[int]], types: list[str]
) -> dict[str, dict[str, list[list[int]]]]:
    """Assemble the CLUE submit ``label`` dict
    ``{type: {surface: [[start, end]]}}`` from decoded offset spans —
    reference ``predict_bert_wol.py:204-221`` semantics (inclusive ends,
    surfaces sliced from the sentence)."""
    label: dict[str, dict[str, list[list[int]]]] = {}
    for (s, e), typ in zip(spans, types):
        if not typ:
            continue
        surface = sentence[s : e + 1]
        label.setdefault(typ, {}).setdefault(surface, []).append([s, e])
    return label
