"""Gazetteer mention detection (deterministic, SQL-oracle-checkable path).

The model path (stages.tag) and this gazetteer path both emit the same
mention schema; the gazetteer path is a pure regex extraction so DuckDB can
reproduce it exactly, giving the KG pipeline an end-to-end correctness gate.

Actor-pool stage: the regex is compiled once per actor in ``__init__``
(stateful-stage pattern); extraction is per-batch over Arrow.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from ner_funtool_ray.config import GAZETTEER
# (actor-pool helper no longer needed here — gazetteer stages run as tasks)

_CARRY = ("row_id", "repo", "path", "commit", "lang", "sent_id", "content_sha256")


class GazetteerMentions:
    """map_batches callable: sentences → mention rows
    (carry…, surface, entity_type, start, end) with inclusive char offsets
    (CLUE span convention, `ner_utils.py:103-146`)."""

    def __init__(self, gazetteer: dict[str, str] | None = None,
                 text_col: str = "sentence"):
        gaz = gazetteer or GAZETTEER
        # longest-first alternation so e.g. 'order' wins over 'or'
        terms = sorted(gaz.keys(), key=len, reverse=True)
        self.pattern = re.compile(
            r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b"
        )
        self.gaz = gaz
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        idx: list[int] = []
        surfaces: list[str] = []
        types: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        for i, t in enumerate(texts):
            for m in self.pattern.finditer(t or ""):
                idx.append(i)
                surfaces.append(m.group(1))
                types.append(self.gaz[m.group(1)])
                starts.append(m.start(1))
                ends.append(m.end(1) - 1)  # inclusive end
        take = pa.array(np.asarray(idx, dtype=np.int64))
        cols: dict[str, pa.Array] = {
            name: batch[name].take(take)
            for name in _CARRY
            if name in batch.column_names
        }
        cols["surface"] = pa.array(surfaces, type=pa.string())
        cols["entity_type"] = pa.array(types, type=pa.string())
        cols["start"] = pa.array(starts, type=pa.int64())
        cols["end"] = pa.array(ends, type=pa.int64())
        return pa.table(cols)


class GazetteerTagger:
    """Char-level BMES gold tagger from gazetteer matches: sentence →
    ``gold_tags`` list<string> (B/M/E/S-type over matched spans, O
    elsewhere).  Used as the deterministic gold stream for metric
    pipelines; ``max_seq_len`` truncation mirrors the model path
    (`run_bert_crf.py:379-381`)."""

    def __init__(self, gazetteer: dict[str, str] | None = None,
                 text_col: str = "sentence", max_seq_len: int = 128):
        gaz = gazetteer or GAZETTEER
        terms = sorted(gaz.keys(), key=len, reverse=True)
        self.pattern = re.compile(
            r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b"
        )
        self.gaz = gaz
        self.text_col = text_col
        self.max_seq_len = max_seq_len

    def tag_one(self, text: str) -> list[str]:
        t = (text or "")[: self.max_seq_len]
        tags = ["O"] * len(t)
        for m in self.pattern.finditer(t):
            s, e = m.start(1), m.end(1) - 1
            typ = self.gaz[m.group(1)]
            if s == e:
                tags[s] = f"S-{typ}"
            else:
                tags[s] = f"B-{typ}"
                for j in range(s + 1, e):
                    tags[j] = f"M-{typ}"
                tags[e] = f"E-{typ}"
        return tags

    def __call__(self, batch: pa.Table) -> pa.Table:
        tags = [self.tag_one(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(
            "gold_tags", pa.array(tags, type=pa.list_(pa.string()))
        )


def _tagger_batch(
    batch: pa.Table, gaz_items: tuple, max_seq_len: int
) -> pa.Table:
    key = ("tagger", gaz_items, max_seq_len)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = GazetteerTagger(dict(gaz_items), max_seq_len=max_seq_len)
        _STAGE_CACHE[key] = stage
    return stage(batch)


def gold_tag_sentences(
    sentences: "ray.data.Dataset",
    gazetteer: dict[str, str] | None = None,
    max_seq_len: int = 128,
    batch_size: int = 2048,
) -> "ray.data.Dataset":
    gaz = gazetteer or GAZETTEER
    return sentences.map_batches(
        _tagger_batch,
        fn_kwargs={
            "gaz_items": tuple(sorted(gaz.items())),
            "max_seq_len": max_seq_len,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# Per-worker-process stage cache for the TASK-pool path: compiling a
# small gazetteer regex is microseconds, so running this stage as an actor
# pool bought nothing and paid 1-2 s of dedicated-pool spin-up per query
# (measured ~40% of the sf0.1 headline's wall).  Tasks reuse the warm
# default worker pool; each worker compiles once into this cache.  The
# actor-pool pattern stays the right call for EXPENSIVE state (model
# weights — stages/tag.py); this stage's state is cheap.
_STAGE_CACHE: dict = {}


def _mentions_batch(
    batch: pa.Table, gaz_items: tuple, text_col: str = "sentence"
) -> pa.Table:
    key = ("mentions", gaz_items, text_col)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = GazetteerMentions(dict(gaz_items), text_col=text_col)
        _STAGE_CACHE[key] = stage
    return stage(batch)


def extract_mentions(
    sentences: "ray.data.Dataset",
    gazetteer: dict[str, str] | None = None,
    batch_size: int = 2048,
) -> "ray.data.Dataset":
    gaz = gazetteer or GAZETTEER
    return sentences.map_batches(
        _mentions_batch,
        fn_kwargs={"gaz_items": tuple(sorted(gaz.items()))},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
