"""P1 sentence split: content → (sent_id, sentence) rows with provenance.

Stateless explode inside ``map_batches`` (never ``ds.flat_map`` per row —
that is a per-row Python call).  Carries ``content_sha256`` through so the
per-row invariant is checkable on every downstream row.  Splitter semantics:
reference ``predict_lstm_crf.py:104`` punctuation split (see
functions.text.split_sentences).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.text import split_sentences_batch

_CARRY = ("row_id", "repo", "path", "commit", "lang", "content_sha256")


def _split_batch(batch: pa.Table) -> pa.Table:
    texts = batch["content"].to_pylist()
    idx, sent_ids, sents = split_sentences_batch(texts)
    cols: dict[str, pa.Array] = {}
    for name in _CARRY:
        if name in batch.column_names:
            cols[name] = batch[name].take(pa.array(idx))
    cols["sent_id"] = pa.array(sent_ids, type=pa.int64())
    cols["sentence"] = pa.array(sents, type=pa.string())
    return pa.table(cols)


def split_to_sentences(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """ingested corpus → sentence rows (row_id, …, sent_id, sentence)."""
    return docs.map_batches(_split_batch, batch_format="pyarrow")
