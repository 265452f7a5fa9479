"""Vectorized text scalar functions (SURVEY.md §2.8, M9, M17 + text analysis).

All functions operate on whole columns (numpy / pyarrow) — no per-row Python
in hot paths beyond regex application, matching the reference's semantics:

- sentence splitting on Chinese/ASCII punctuation
  (reference ``predict_lstm_crf.py:104``: split on ``[，。！？、‘’“”（）]``);
- char normalization digit→``<NUM>`` / ascii→``<ENG>``
  (``data_preprocess.py:89-92``);
- quality scoring, token counting, fingerprinting, language-ID heuristics
  for the large-scale training-data path (new, not in reference).
"""

from __future__ import annotations

import re

import numpy as np

# Reference split set (predict_lstm_crf.py:104) + ASCII sentence enders so the
# same splitter serves code/English corpora. Kept in sync with
# SENTENCE_SPLIT_SQL_REGEX below (DuckDB RE2 twin used by oracles).
_SENT_SPLIT_RE = re.compile(r"[，。！？、‘’“”（）.!?;\n]")
SENTENCE_SPLIT_SQL_REGEX = "[，。！？、‘’“”（）.!?;\n]"

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

STOPWORDS = frozenset(
    "the a an and of to in is are was were be been it this that for on with as".split()
)


def split_sentences(text: str) -> list[str]:
    """Split one document into non-empty stripped sentences.

    Mirrors the reference inference splitter (``predict_lstm_crf.py:104``),
    extended with ASCII enders/newlines; drops empty fragments the same way
    (reference filters empty strings out of the regex split).
    """
    return [s.strip() for s in _SENT_SPLIT_RE.split(text) if s.strip()]


def split_sentences_batch(texts) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Vectorized exploder: texts → (row_index, sent_id, sentence) triples."""
    idx: list[int] = []
    sent_ids: list[int] = []
    sents: list[str] = []
    for i, t in enumerate(texts):
        for j, s in enumerate(split_sentences(t or "")):
            idx.append(i)
            sent_ids.append(j)
            sents.append(s)
    return np.asarray(idx, dtype=np.int64), np.asarray(sent_ids, dtype=np.int64), sents


def normalize_char(ch: str) -> str:
    """``data_preprocess.py:89-92``: digits → <NUM>, ascii letters → <ENG>."""
    if ch.isdigit():
        return "<NUM>"
    if "a" <= ch <= "z" or "A" <= ch <= "Z":
        return "<ENG>"
    return ch


def tokenize_words(text: str) -> list[str]:
    """Whitespace/word-regex token split (BPE-ish \\w+ runs)."""
    return _WORD_RE.findall(text)


def token_count(text: str) -> int:
    return len(_WORD_RE.findall(text))


def quality_features(texts) -> dict[str, np.ndarray]:
    """Per-document quality features: length, token count, punctuation ratio,
    stopword ratio, mean token length. Deterministic arithmetic (SQL twin in
    __ray_entry__ oracle)."""
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    tok_chars = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = _WORD_RE.findall(t)
        n_chars[i] = len(t)
        n_tokens[i] = len(toks)
        n_punct[i] = len(_PUNCT_RE.findall(t))
        n_stop[i] = sum(1 for w in toks if w.lower() in STOPWORDS)
        tok_chars[i] = sum(len(w) for w in toks)
    denom = np.maximum(n_tokens, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / np.maximum(n_chars, 1),
        "stopword_ratio": n_stop / denom,
        "mean_token_len": tok_chars / denom,
    }


# --- language ID (n-gram/stopword heuristic) -------------------------------

# Tiny per-language function-word lists; deterministic scoring = hit count /
# token count, argmax with fixed tie order. SQL-expressible (word IN list).
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to is in that it for with".split()),
    "de": frozenset("der die das und ist nicht ein zu mit von".split()),
    "fr": frozenset("le la les et est une pour dans que des".split()),
    "es": frozenset("el la los y es una para en que del".split()),
}
LANG_ORDER = ("en", "de", "fr", "es")


def detect_language(text: str) -> str:
    """Heuristic language-ID.  CJK codepoint share > 0.2 → zh; else the
    marker-word list with the highest hit count (ties → LANG_ORDER; all-zero
    → 'und')."""
    t = text or ""
    if t:
        cjk = sum(1 for ch in t if _is_cjk(ch))
        if cjk / len(t) > 0.2:
            return "zh"
    toks = [w.lower() for w in _WORD_RE.findall(t)]
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in LANG_ORDER:
        hits = sum(1 for w in toks if w in LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def _is_cjk(ch: str) -> bool:
    """CJK codepoint predicate — same ranges as reference
    ``bert/tokenization.py:264-284``."""
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    SQL twin: ``md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))``."""
    import hashlib

    norm = re.sub(r"\s+", " ", (text or "")).strip().lower()
    return hashlib.md5(norm.encode("utf-8")).hexdigest()
