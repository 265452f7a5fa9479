"""Vocabularies & label maps (SURVEY.md §2.1 S4-S8, §2.3 M7-M8, M17).

Small side data: loaded driver-side once, passed into actor constructors
(broadcast join pattern, SURVEY.md §2.5 J1) — never shuffled.

Reference semantics reimplemented:

- ``load_tag2label`` — ``tag\\tid`` TSV (`data_preprocess.py:261-274`),
  with the runtime ``X``/``[CLS]``/``[SEP]`` augmentation of
  `run_bert_crf.py:295-307`;
- ``load_char_vocab`` — ``char\\tid`` TSV (`data_preprocess.py:245-258`);
- ``vocab_build`` — char normalization (digit→``<NUM>``, ascii→``<ENG>``),
  frequency count, min_count filter, re-id (`data_preprocess.py:77-113`);
- ``sentence2id`` — char→id with ``<UNK>`` fallback
  (`data_preprocess.py:144-160`);
- ``pad_sequences`` — pad to the batch max, return true lengths
  (`data_preprocess.py:228-242`; the reference ignores its ``max_len`` arg —
  we keep dynamic padding but honor an optional cap, SURVEY.md §7.4).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from ner_funtool_ray.functions.text import normalize_char

PAD, UNK = "<PAD>", "<UNK>"
SPECIALS = ("<PAD>", "<UNK>", "<CLS>", "<SEP>", "<MASK>", "<NUM>", "<ENG>")

# BMES boundary tags (multitask bmeo2label) — O first so id 0 == O, matching
# the reference convention that label id 0 is skipped by decoders.
BMEO_TAGS = ("O", "B", "M", "E", "S")


def load_tag2label(path: str, bert_specials: bool = False) -> dict[str, int]:
    """``tag\\tid`` TSV → dict; ``bert_specials`` appends X, [CLS], [SEP]
    with the next free ids (run_bert_crf.py:295-307)."""
    tag2label: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tag, idx = line.split("\t")
            tag2label[tag] = int(idx)
    if bert_specials:
        for extra in ("X", "[CLS]", "[SEP]"):
            if extra not in tag2label:
                tag2label[extra] = len(tag2label)
    return tag2label


def load_char_vocab(path: str) -> dict[str, int]:
    """``char\\tid`` TSV → char2id (data_preprocess.py:245-258)."""
    char2id: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            ch, idx = line.split("\t")
            char2id[ch] = int(idx)
    return char2id


def invert(d: dict[str, int]) -> dict[int, str]:
    return {v: k for k, v in d.items()}


def vocab_build(texts, min_count: int = 1) -> dict[str, int]:
    """Char vocab from a corpus with <NUM>/<ENG> normalization + min_count
    filter (data_preprocess.py:77-113).  Specials first, then chars in
    first-seen order (reference assigns ids in iteration order)."""
    counts: Counter[str] = Counter()
    order: list[str] = []
    for t in texts:
        for ch in t or "":
            ch = normalize_char(ch)
            if ch not in counts:
                order.append(ch)
            counts[ch] += 1
    vocab: dict[str, int] = {s: i for i, s in enumerate(SPECIALS)}
    for ch in order:
        if ch in vocab:
            continue
        if counts[ch] >= min_count:
            vocab[ch] = len(vocab)
    return vocab


def write_label_map(path: str, label_map: dict[str, int]) -> None:
    """Persist a label map side-file (K8 equivalent of the reference's
    ``label2id.pkl`` memoization, `run_bert_crf.py:356-359`): written once
    driver-side, read-only inside actors."""
    import pickle

    with open(path, "wb") as f:
        pickle.dump(label_map, f)


def clean_bert_vocab(lines: list[str]) -> list[str]:
    """M18 (`data/clean_vocab.py:7-17`): drop ``[unused*]`` entries and strip
    leading ``##`` continuation markers from a BERT vocab listing."""
    out = []
    for line in lines:
        tok = line.strip()
        if not tok or "unused" in tok:
            continue
        if tok.startswith("##"):
            tok = tok[2:]
        out.append(tok)
    return out


def extract_vocab_from_embedding_lines(
    lines: list[str],
    specials: tuple[str, ...] = ("<PAD>", "<UNK>", "<CLS>", "<SEP>", "<MASK>"),
) -> list[str]:
    """S15 (`data/clean_vocab.py:20-32`): embedding-text lines
    (``token dim1 dim2 …``) → vocab listing with specials prepended."""
    toks = [line.split()[0] for line in lines if line.strip()]
    return list(specials) + toks


def read_dictionary(path: str) -> dict[str, int]:
    """Pickled char2id loader (S8, `data_preprocess.py:116-126`)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def load_embedding_matrix(path: str):
    """Embedding matrix loader (S7): ``.npy``/``.npz``/pickled ``(V, D)``
    float array (`train_lstm_crf.py:87-88` loads a pickle; we accept numpy
    formats too).  Loaded once per actor in ``__init__``."""
    import numpy as _np

    if path.endswith(".npz"):
        with _np.load(path) as z:
            return z[z.files[0]]
    if path.endswith(".npy"):
        return _np.load(path)
    import pickle

    with open(path, "rb") as f:
        return _np.asarray(pickle.load(f), dtype=_np.float32)


def sentence2id(sent: str, char2id: dict[str, int]) -> list[int]:
    """char→id with normalization + <UNK> fallback
    (data_preprocess.py:144-160)."""
    unk = char2id.get(UNK, 1)
    return [char2id.get(normalize_char(ch), unk) for ch in sent]


def pad_sequences(
    seqs, pad_id: int = 0, max_len: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of id lists to the batch max (optionally capped) →
    ((B, S) int32 matrix, (B,) true lengths).  Dynamic per-batch padding,
    as the reference effectively does (data_preprocess.py:228-242)."""
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    if max_len is not None:
        lengths = np.minimum(lengths, max_len)
    S = int(lengths.max()) if len(lengths) and lengths.max() > 0 else 1
    out = np.full((len(seqs), S), pad_id, dtype=np.int32)
    for i, s in enumerate(seqs):
        L = int(lengths[i])
        out[i, :L] = s[:L]
    return out, lengths
