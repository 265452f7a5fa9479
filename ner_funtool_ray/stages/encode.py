"""BERT-style feature encoding stage (SURVEY §2.3 M4-M6; K1 equivalent).

Reimplements ``convert_single_example`` semantics (`run_bert_crf.py:340-433`)
over Arrow batches:

- per-word wordpiece tokenize; first piece carries the word's label,
  continuation pieces get ``"X"`` (:367-377);
- truncate to ``max_seq-2`` when ``len >= max_seq-1`` (:379-381);
- ``[CLS]`` / ``[SEP]`` wrap with their own label ids (:385-394);
- zero-pad ids/mask/segments; labels padded with ``O``'s id (:398-405);
- length asserts (:407-410) kept as real assertions.

The encoded fixed-width columns are emitted as ``list<int32>`` so
``write_parquet`` replaces the reference's TFRecord round-trip (K1;
S9's TFRecord input_fn is unnecessary — blocks stay in the object store).
Inference variant (M6): no labels → label_ids all O except [CLS]/[SEP].
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.tokenization import FullTokenizer


def convert_example(
    words: list[str],
    labels: list[str] | None,
    tokenizer: FullTokenizer,
    label_map: dict[str, int],
    max_seq_length: int = 128,
) -> dict[str, list[int]]:
    """One example → fixed-width feature vectors (reference semantics)."""
    o_id = label_map["O"]
    tokens: list[str] = []
    tok_labels: list[str] = []
    labs = labels if labels is not None else ["O"] * len(words)
    for word, lab in zip(words, labs):
        pieces = tokenizer.tokenize(word)
        for m, piece in enumerate(pieces):
            tokens.append(piece)
            tok_labels.append(lab if m == 0 else "X")
    if len(tokens) >= max_seq_length - 1:
        tokens = tokens[: max_seq_length - 2]
        tok_labels = tok_labels[: max_seq_length - 2]
    ntokens = ["[CLS]"] + tokens + ["[SEP]"]
    label_ids = (
        [label_map["[CLS]"]]
        + [label_map[l] for l in tok_labels]
        + [label_map["[SEP]"]]
    )
    input_ids = tokenizer.convert_tokens_to_ids(ntokens)
    input_mask = [1] * len(input_ids)
    segment_ids = [0] * len(input_ids)
    while len(input_ids) < max_seq_length:
        input_ids.append(0)
        input_mask.append(0)
        segment_ids.append(0)
        label_ids.append(o_id)  # labels pad with O (run_bert_crf.py:403)
    assert len(input_ids) == max_seq_length
    assert len(input_mask) == max_seq_length
    assert len(segment_ids) == max_seq_length
    assert len(label_ids) == max_seq_length
    return {
        "input_ids": input_ids,
        "input_mask": input_mask,
        "segment_ids": segment_ids,
        "label_ids": label_ids,
    }


class FeatureEncoder:
    """Actor-pool stage: (chars list<string>[, tags list<string>]) rows →
    + fixed-width feature columns.  Tokenizer vocab + label map built once
    per actor (T1 pattern)."""

    def __init__(
        self,
        vocab: dict[str, int],
        label_map: dict[str, int],
        max_seq_length: int = 128,
        chars_col: str = "chars",
        tags_col: str | None = "tags",
    ):
        self.tokenizer = FullTokenizer(vocab)
        self.label_map = label_map
        self.max_seq_length = max_seq_length
        self.chars_col = chars_col
        self.tags_col = tags_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        chars_rows = batch[self.chars_col].to_pylist()
        if self.tags_col and self.tags_col in batch.column_names:
            tag_rows = batch[self.tags_col].to_pylist()
        else:
            tag_rows = [None] * len(chars_rows)
        feats = [
            convert_example(
                list(words), labs, self.tokenizer, self.label_map,
                self.max_seq_length,
            )
            for words, labs in zip(chars_rows, tag_rows)
        ]
        t = pa.list_(pa.int32())
        for name in ("input_ids", "input_mask", "segment_ids", "label_ids"):
            batch = batch.append_column(
                name, pa.array([f[name] for f in feats], type=t)
            )
        return batch


def encode_features(
    ds: "ray.data.Dataset",
    vocab: dict[str, int],
    label_map: dict[str, int],
    max_seq_length: int = 128,
    batch_size: int = 512,
    concurrency=None,
) -> "ray.data.Dataset":
    from ner_funtool_ray.utils import default_concurrency

    return ds.map_batches(
        FeatureEncoder,
        fn_constructor_kwargs={
            "vocab": vocab,
            "label_map": label_map,
            "max_seq_length": max_seq_length,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
