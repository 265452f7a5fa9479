"""Fixed deterministic vocabularies for the model path (FIXTURES.md F3/F4).

Every process (Ray actor, serial oracle, test) derives identical dicts from
these constants — the broadcast-small-side pattern without shipping state.
"""

from __future__ import annotations

import string

from ner_funtool_ray.sources.vocab import SPECIALS

# attr set: CLUE-style zh types + the code-entity types of the KG pipeline
ATTRS = ("LOC", "PER", "ORG", "SYSTEM", "OPERATION", "DATAOBJ", "TABLE")

# O first (id 0 — decoders skip id 0, reference convention), then B/M/E/S × attr
TAGS = ("O",) + tuple(f"{b}-{a}" for a in ATTRS for b in ("B", "M", "E", "S"))

# chars covered by the synthetic corpora: ascii printable + the planted
# Chinese template chars (corpus.py) — fixed string constant, never inferred
_ZH_CHARS = "中国首都是北京张三在清华大学工作阿里巴巴位于杭州很长的句子。"


def default_char_vocab() -> dict[str, int]:
    vocab: dict[str, int] = {s: i for i, s in enumerate(SPECIALS)}
    for ch in string.printable + _ZH_CHARS:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    return vocab


def tag2id() -> dict[str, int]:
    return {t: i for i, t in enumerate(TAGS)}


def id2tag() -> dict[int, str]:
    return {i: t for i, t in enumerate(TAGS)}


# cascade label spaces (multitask bmeo2label / attr2label fixtures)
BMEO = ("O", "B", "M", "E", "S")
CASCADE_ATTRS = ("O",) + ATTRS


def bmeo2id() -> dict[str, int]:
    return {t: i for i, t in enumerate(BMEO)}


def attr2id() -> dict[str, int]:
    return {t: i for i, t in enumerate(CASCADE_ATTRS)}


# --- BERT-path vocabularies (T3/T4) ----------------------------------------

# label list for the BERT+CRF head: corpus tags + the wordpiece-alignment
# specials appended exactly like the reference (`run_bert_crf.py:295-307`:
# X for continuation pieces, [CLS]/[SEP] carry their own label ids)
BERT_TAGS = TAGS + ("X", "[CLS]", "[SEP]")
BERT_BMEO = BMEO + ("X", "[CLS]", "[SEP]")


def default_wordpiece_vocab() -> dict[str, int]:
    """Deterministic wordpiece vocab over the synthetic corpora's chars
    ([PAD]/[UNK]/[CLS]/[SEP] + lowercased printable + planted CJK chars) —
    every process derives the identical dict (FIXTURES.md F3 pattern)."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    seen = set(toks)
    for ch in string.printable + _ZH_CHARS:
        c = ch.lower()
        if not c.strip():  # whitespace/control never reaches wordpiece
            continue
        if c not in seen:
            toks.append(c)
            seen.add(c)
    return {t: i for i, t in enumerate(toks)}
