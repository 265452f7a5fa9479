"""CLUE span-JSON source/sink (SURVEY §2.1 S10, §2.2 K4).

- :func:`clue_json_to_bio` — ``{"text", "label": {type: {word: [[s,e]]}}}``
  JSON-lines → per-char S/B/M/E-attr tags, exact reference converter
  semantics (`data/clue_ner/data_trans.py:38-60`): inclusive offsets; spans
  applied in dict iteration order (later spans overwrite earlier chars —
  reference behavior, preserved).
- :func:`predictions_to_clue_json` — decoded spans → submit JSON-lines with
  ids in INPUT ORDER via an explicit row_id column
  (`predict_bert_wol.py:204-221`; ordering note SURVEY §2.9).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.spans import decode_clue_spans, spans_to_clue_label


def spans_to_bio(text: str, label: dict) -> list[str]:
    """Reference ``data_trans.read_corpus`` tagging rule."""
    tags = ["O"] * len(text)
    for attr, words in (label or {}).items():
        for _word, indices in words.items():
            for s, e in indices:
                if s == e:
                    tags[s] = f"S-{attr}"
                else:
                    tags[s] = f"B-{attr}"
                    tags[e] = f"E-{attr}"
                    for i in range(s + 1, e):
                        tags[i] = f"M-{attr}"
    return tags


def _convert_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    labels = batch["label"].to_pylist() if "label" in batch.column_names else [
        None
    ] * len(texts)
    tag_lists = []
    for text, label in zip(texts, labels):
        if isinstance(label, str):
            label = json.loads(label) if label else {}
        tag_lists.append(spans_to_bio(text, label or {}))
    out = pa.table(
        {
            "text": pa.array(texts, type=pa.string()),
            "tags": pa.array(tag_lists, type=pa.list_(pa.string())),
        }
    )
    if "id" in batch.column_names:
        out = out.append_column("id", batch["id"])
    return out


def clue_json_to_bio(paths) -> "ray.data.Dataset":
    """CLUE JSON-lines file(s) → (text, tags[, id]) rows."""
    return ray.data.read_json(paths).map_batches(
        _convert_batch, batch_format="pyarrow"
    )


def predictions_to_clue_json(
    tagged: "ray.data.Dataset",
    text_col: str = "sentence",
    tags_col: str = "pred_tags",
    id_col: str = "row_id",
    verify_offsets: bool = False,
    with_span_counts: bool = False,
) -> "ray.data.Dataset":
    """Tagged rows → CLUE submit rows (id, label-JSON string).

    Span re-assembly uses ``get_result`` semantics (decode_clue_spans);
    label dict shape per `predict_bert_wol.py:204-221`.  Carries the
    explicit id column — never block order.

    ``verify_offsets`` is the submit-integrity self-check: every span
    recorded in the label JSON must re-locate its surface at
    ``text[start:end+1]`` — a corrupted offset raises instead of writing a
    bad submission.  ``with_span_counts`` adds an ``n_spans`` column so
    the driver's rows-only sweep also pins the total span count."""

    def convert(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        tag_lists = batch[tags_col].to_pylist()
        labels = []
        n_spans = []
        for text, tags in zip(texts, tag_lists):
            spans, types = decode_clue_spans(text or "", tags or [])
            label = spans_to_clue_label(text or "", spans, types)
            count = 0
            for typ, surfaces in label.items():
                for surface, sps in surfaces.items():
                    count += len(sps)
                    if verify_offsets:
                        for s, e in sps:
                            if (text or "")[s : e + 1] != surface:
                                raise ValueError(
                                    "clue submit offset mismatch: "
                                    f"{typ}/{surface!r} at [{s},{e}] vs "
                                    f"{(text or '')[s:e + 1]!r}"
                                )
            n_spans.append(count)
            labels.append(
                json.dumps(label, ensure_ascii=False, sort_keys=True)
            )
        out = pa.table(
            {
                "id": pa.array(ids),
                "label": pa.array(labels, type=pa.string()),
            }
        )
        if with_span_counts:
            out = out.append_column(
                "n_spans", pa.array(n_spans, type=pa.int64())
            )
        return out

    return tagged.map_batches(convert, batch_format="pyarrow")
