"""WordPiece tokenization (SURVEY.md §2.3 M1-M3, M16).

Reimplementation of the standard (public) BERT tokenizer semantics the
reference vendors at ``bert/tokenization.py:121-359``:

- :class:`BasicTokenizer` — invalid/control char cleaning (→ space), CJK
  codepoint spacing, whitespace split, optional lowercase + NFD accent
  stripping, punctuation splitting;
- :class:`WordpieceTokenizer` — greedy longest-match-first ``##``
  continuation pieces, tokens longer than ``max_input_chars_per_word`` → UNK;
- :class:`FullTokenizer` — the composition + vocab id lookup.

Pure functions of (text, vocab) — safe to hold inside map_batches actors.
"""

from __future__ import annotations

import unicodedata


def load_vocab(path: str) -> dict[str, int]:
    """Ordered wordpiece vocab file (one token per line) → token→id
    (reference ``bert/tokenization.py:121-133``)."""
    vocab: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            if tok and tok not in vocab:
                vocab[tok] = i
    return vocab


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII non-alphanumeric ranges count as punctuation (incl. $, ^, `)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk_char(cp: int) -> bool:
    """CJK unified ideograph ranges (reference tokenization.py:264-284)."""
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


def _whitespace_tokenize(text: str) -> list[str]:
    text = text.strip()
    return text.split() if text else []


class BasicTokenizer:
    """Clean → CJK-space → split → (lower + strip accents) → punct split."""

    def __init__(self, do_lower_case: bool = True):
        self.do_lower_case = do_lower_case

    def tokenize(self, text: str) -> list[str]:
        text = self._clean_text(text)
        text = self._tokenize_chinese_chars(text)
        out = []
        for tok in _whitespace_tokenize(text):
            if self.do_lower_case:
                tok = tok.lower()
                tok = self._strip_accents(tok)
            out.extend(self._split_on_punc(tok))
        return _whitespace_tokenize(" ".join(out))

    @staticmethod
    def _clean_text(text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    @staticmethod
    def _tokenize_chinese_chars(text: str) -> str:
        out = []
        for ch in text:
            if _is_cjk_char(ord(ch)):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        return "".join(out)

    @staticmethod
    def _strip_accents(text: str) -> str:
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )

    @staticmethod
    def _split_on_punc(text: str) -> list[str]:
        chunks: list[list[str]] = []
        start_new = True
        for ch in text:
            if _is_punctuation(ch):
                chunks.append([ch])
                start_new = True
            else:
                if start_new:
                    chunks.append([])
                    start_new = False
                chunks[-1].append(ch)
        return ["".join(c) for c in chunks]


class WordpieceTokenizer:
    """Greedy longest-match-first wordpiece with ``##`` continuations."""

    def __init__(
        self,
        vocab: dict[str, int],
        unk_token: str = "[UNK]",
        max_input_chars_per_word: int = 200,
    ):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_input_chars_per_word = max_input_chars_per_word

    def tokenize(self, text: str) -> list[str]:
        out = []
        for token in _whitespace_tokenize(text):
            if len(token) > self.max_input_chars_per_word:
                out.append(self.unk_token)
                continue
            is_bad = False
            start = 0
            sub_tokens = []
            while start < len(token):
                end = len(token)
                cur = None
                while start < end:
                    piece = token[start:end]
                    if start > 0:
                        piece = "##" + piece
                    if piece in self.vocab:
                        cur = piece
                        break
                    end -= 1
                if cur is None:
                    is_bad = True
                    break
                sub_tokens.append(cur)
                start = end
            out.append(self.unk_token) if is_bad else out.extend(sub_tokens)
        return out


class FullTokenizer:
    """BasicTokenizer ∘ WordpieceTokenizer + id lookup
    (reference ``bert/tokenization.py:161-182``)."""

    def __init__(self, vocab: dict[str, int], do_lower_case: bool = True):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.basic = BasicTokenizer(do_lower_case=do_lower_case)
        self.wordpiece = WordpieceTokenizer(vocab)

    @classmethod
    def from_file(cls, vocab_file: str, do_lower_case: bool = True) -> "FullTokenizer":
        return cls(load_vocab(vocab_file), do_lower_case)

    def tokenize(self, text: str) -> list[str]:
        out = []
        for tok in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(tok))
        return out

    def convert_tokens_to_ids(self, tokens) -> list[int]:
        unk = self.vocab.get("[UNK]", 0)
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self.inv_vocab[i] for i in ids]
