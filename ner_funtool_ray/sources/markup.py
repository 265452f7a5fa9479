"""Markup-corpus converters (SURVEY §2.1 S11-S13).

Reimplemented from observed reference behavior:

- **Boson** inline markup ``{{type:span}}`` → per-char ``B_/M_/E_type`` tags
  (`data/boson_ner/data_util.py:104-132` ``origin2tag``), then sentence
  split on ``[，。！？、‘’“”（）]/O`` (``tagsplit`` :135-143).  Reference
  quirk kept: a length-1 span emits the char twice (B_ then E_) — that is
  what ``origin2tag`` writes.
- **MSRA** ``char/tag`` token lines → sentences split on
  ``[，。；！：？、‘’“”]/o``, dropping sentences with no entity tag
  (`data/msra_ner/train2pkl.py:72-89` — the ``num_not_o != 0`` filter).
- **People's Daily** POS corpus → merge ``[...]nt`` bracket groups and
  consecutive ``nr`` name pairs, then ``B_/M_/E_`` char tags for nr/ns/nt
  (`data/people_dairy_ner/data_renmin_word.py:11-60`).  Deliberate
  deviation (documented per SURVEY §7.4): a length-1 entity word emits one
  ``B_`` char — the reference would duplicate the char as ``B_`` then
  ``E_`` (`data_renmin_word.py:53-56`), which corrupts the text stream.

All are pure line parsers usable inside ``map_batches`` over ``read_text``.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

_BOSON_SPLIT = re.compile(r"[，。！？、‘’“”（）]/O")
_MSRA_SPLIT = re.compile(r"[，。；！：？、‘’“”]/o")


def boson_line_to_tagged(line: str) -> list[tuple[str, str]]:
    """One raw Boson line → [(char, tag)] pairs (origin2tag semantics)."""
    out: list[tuple[str, str]] = []
    i = 0
    line = line.strip()
    while i < len(line):
        if line[i] == "{":
            i += 2
            temp = ""
            while i < len(line) and line[i] != "}":
                temp += line[i]
                i += 1
            i += 2
            typ, _, sen = temp.partition(":")
            if not sen:
                continue
            out.append((sen[0], f"B_{typ}"))
            for ch in sen[1 : len(sen) - 1]:
                out.append((ch, f"M_{typ}"))
            out.append((sen[-1], f"E_{typ}"))  # len-1 span: char emitted twice
        else:
            out.append((line[i], "O"))
            i += 1
    return out


def _split_tagged(pairs: list[tuple[str, str]], splitter: re.Pattern,
                  o_tag: str) -> list[list[tuple[str, str]]]:
    """Split a char/tag stream at punctuation chars tagged ``o_tag``."""
    text = " ".join(f"{c}/{t}" for c, t in pairs)
    sentences = []
    for frag in splitter.split(text):
        frag = frag.strip()
        if not frag:
            continue
        sent = []
        for tok in frag.split():
            c, _, t = tok.rpartition("/")
            if c:
                sent.append((c, t))
        if sent:
            sentences.append(sent)
    return sentences


def parse_boson(text: str) -> list[tuple[list[str], list[str]]]:
    """Raw Boson corpus text → [(chars, tags)] sentences."""
    result = []
    for line in text.split("\n"):
        if not line.strip():
            continue
        pairs = boson_line_to_tagged(line)
        for sent in _split_tagged(pairs, _BOSON_SPLIT, "O"):
            chars = [c for c, _ in sent]
            tags = [t for _, t in sent]
            result.append((chars, tags))
    return result


def parse_msra(text: str, keep_all_o: bool = False) -> list[tuple[list[str], list[str]]]:
    """MSRA wordtag text (char/tag tokens, lowercase 'o' for outside) →
    [(chars, tags)]; sentences with no entity tags dropped unless
    ``keep_all_o`` (reference ``num_not_o`` filter)."""
    result = []
    for line in text.split("\n"):
        for frag in _MSRA_SPLIT.split(line.strip()):
            toks = frag.strip().split()
            if not toks:
                continue
            chars, tags = [], []
            num_not_o = 0
            for tok in toks:
                c, _, t = tok.rpartition("/")
                if not c:
                    continue
                chars.append(c)
                tags.append(t)
                if t != "o":
                    num_not_o += 1
            if chars and (num_not_o != 0 or keep_all_o):
                result.append((chars, tags))
    return result


def peoples_daily_line_to_tagged(line: str) -> list[tuple[str, str]]:
    """One People's-Daily POS line (``word/pos`` tokens, ``[...]nt`` groups,
    leading date token) → [(char, tag)] with B_/M_/E_{nr,ns,nt}."""
    toks = line.split("  ")
    merged: list[tuple[str, str]] = []  # (word, pos)
    i = 1  # reference skips the leading date token
    while i < len(toks) - 1:
        tok = toks[i]
        if not tok:
            i += 1
            continue
        if tok.startswith("["):
            word = tok.split("/")[0][1:]
            i += 1
            while i < len(toks) - 1 and "]" not in toks[i]:
                if toks[i]:
                    word += toks[i].split("/")[0]
                i += 1
            if i < len(toks) - 1:
                last = toks[i]
                word += last.split("/")[0].strip()
                merged.append((word, last.split("/")[1][-2:]))
        elif "/" in tok and tok.split("/")[1] == "nr":
            word = tok.split("/")[0]
            if i + 1 < len(toks) - 1 and "/" in toks[i + 1] and toks[i + 1].split("/")[1] == "nr":
                i += 1
                merged.append((word + toks[i].split("/")[0], "nr"))
            else:
                merged.append((word, "nr"))
        elif "/" in tok:
            merged.append((tok.split("/")[0], tok.split("/")[1]))
        i += 1
    out: list[tuple[str, str]] = []
    for word, pos in merged:
        if not word:
            continue
        if pos in ("nr", "ns", "nt"):
            out.append((word[0], f"B_{pos}"))
            for ch in word[1 : len(word) - 1]:
                out.append((ch, f"M_{pos}"))
            if len(word) > 1:
                out.append((word[-1], f"E_{pos}"))
        else:
            for ch in word:
                out.append((ch, "O"))
    return out


def _sentences_table(records: list[tuple[list[str], list[str]]], src: str) -> pa.Table:
    lst = pa.list_(pa.string())
    return pa.table(
        {
            "source": pa.array([src] * len(records), type=pa.string()),
            "sent_id": pa.array(range(len(records)), type=pa.int64()),
            "chars": pa.array([c for c, _ in records], type=lst),
            "tags": pa.array([t for _, t in records], type=lst),
        }
    )


def read_markup_corpus(paths, fmt: str) -> "ray.data.Dataset":
    """Markup file(s) → sentence rows.  fmt ∈ {boson, msra}."""
    parser = {"boson": parse_boson, "msra": parse_msra}[fmt]
    files = ray.data.read_binary_files(paths, include_paths=True)

    def convert(batch: pa.Table) -> pa.Table:
        tables = [
            _sentences_table(parser(data.decode("utf-8", errors="replace")), path)
            for path, data in zip(
                batch["path"].to_pylist(), batch["bytes"].to_pylist()
            )
        ]
        return pa.concat_tables(tables) if tables else _sentences_table([], "")

    return files.map_batches(convert, batch_format="pyarrow")
