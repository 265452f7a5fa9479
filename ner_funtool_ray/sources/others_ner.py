"""Reader for the `others_ner` parallel sequence-file family (SURVEY §5.4;
reference ``data/others_ner/{train,test}/``).

Format: one directory per split holding five LINE-ALIGNED files —

- ``input.seq.char``    space-separated chars (``[SPA]`` marks a space)
- ``input.seq.word``    word segmentation of the same sentence (own length)
- ``output.seq.attr``   per-CHAR attribute, ``null`` = none
- ``output.seq.bio``    per-CHAR boundary tag (O/B/I/E/S)
- ``output.seq.bioattr``  combined per-CHAR tag in strict BIO (E folds to
  I, S folds to B — observed in the reference data itself, e.g. train line
  1: bio ``B I E`` ↔ bioattr ``B-品牌 I-品牌 I-品牌``)

char/attr/bio/bioattr are token-aligned per line; word is a parallel
word-level stream of the same sentence.  Vocab sidecar files
(``vocab_bioattr.txt`` etc., one token per line) load with
:func:`load_vocab_lines`.

These are small corpus side-files (10k lines in the reference), read
driver-side like the other corpus converters (S11-S13) and handed to Ray
as one Arrow table; the heavy lifting downstream is the Dataset pipeline.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

FILES = (
    "input.seq.char",
    "input.seq.word",
    "output.seq.attr",
    "output.seq.bio",
    "output.seq.bioattr",
)


def combine_bio_attr(bio: list[str], attr: list[str]) -> list[str]:
    """(bio, attr) → combined bioattr tags, matching the reference data's
    own convention: ``null``/missing attr or O boundary → O; E→I and S→B
    boundary folding (the bioattr stream is strict BIO)."""
    fold = {"E": "I", "S": "B"}
    out = []
    for b, a in zip(bio, attr):
        if b == "O" or a in ("null", "O", ""):
            out.append("O")
        else:
            out.append(f"{fold.get(b, b)}-{a}")
    return out


def parse_others_ner_split(split_dir: str) -> pa.Table:
    """One split directory → Arrow table (sent_id, chars, words, attr,
    bio, bioattr); raises on per-line misalignment of the char-aligned
    streams."""
    streams: dict[str, list[list[str]]] = {}
    for name in FILES:
        with open(os.path.join(split_dir, name), encoding="utf-8") as f:
            streams[name] = [line.split() for line in f]
    n = {name: len(rows) for name, rows in streams.items()}
    if len(set(n.values())) != 1:
        raise ValueError(f"line-count mismatch across files: {n}")
    chars = streams["input.seq.char"]
    for i, (c, a, b, ba) in enumerate(
        zip(
            chars,
            streams["output.seq.attr"],
            streams["output.seq.bio"],
            streams["output.seq.bioattr"],
        )
    ):
        if not (len(c) == len(a) == len(b) == len(ba)):
            raise ValueError(
                f"line {i}: char-aligned stream lengths differ "
                f"({len(c)}/{len(a)}/{len(b)}/{len(ba)})"
            )
    lst = pa.list_(pa.string())
    return pa.table(
        {
            "sent_id": pa.array(range(len(chars)), type=pa.int64()),
            "chars": pa.array(chars, type=lst),
            "words": pa.array(streams["input.seq.word"], type=lst),
            "attr": pa.array(streams["output.seq.attr"], type=lst),
            "bio": pa.array(streams["output.seq.bio"], type=lst),
            "bioattr": pa.array(streams["output.seq.bioattr"], type=lst),
        }
    )


def read_others_ner(split_dir: str) -> "ray.data.Dataset":
    """Split directory → Dataset of aligned sentence rows (S-family
    completion; downstream stages consume ``chars``/``bioattr`` exactly
    like the CoNLL reader's output)."""
    return ray.data.from_arrow(parse_others_ner_split(split_dir))


def load_vocab_lines(path: str) -> dict[str, int]:
    """One-token-per-line vocab sidecar (vocab_bio.txt, vocab_attr.txt,
    vocab_bioattr.txt, ...) → token→id by line order."""
    out: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            if tok and tok not in out:
                out[tok] = i
    return out
