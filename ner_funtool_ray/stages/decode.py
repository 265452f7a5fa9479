"""P4 span decode: tagged sentences → mention rows (SURVEY §7.1 P4).

Stateless ``map_batches``; ``decode_bmes`` gives reference ``get_entity``
semantics, ``decode_positional`` the type-consistent ``calculate`` variant.
Output schema matches the gazetteer path so downstream canonicalize /
materialize stages are shared.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.spans import decode_bmes, decode_positional

_CARRY = ("row_id", "repo", "path", "commit", "lang", "sent_id", "content_sha256")


def _decode_batch(
    batch: pa.Table, text_col: str, tags_col: str, type_consistent: bool
) -> pa.Table:
    decode = decode_positional if type_consistent else decode_bmes
    texts = batch[text_col].to_pylist()
    tag_lists = batch[tags_col].to_pylist()
    idx: list[int] = []
    types: list[str] = []
    surfaces: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for i, (text, tags) in enumerate(zip(texts, tag_lists)):
        for typ, surface, s, e in decode(text or "", tags or []):
            idx.append(i)
            types.append(typ)
            surfaces.append(surface)
            starts.append(s)
            ends.append(e)
    take = pa.array(np.asarray(idx, dtype=np.int64))
    cols: dict[str, pa.Array] = {
        name: batch[name].take(take) for name in _CARRY if name in batch.column_names
    }
    cols["surface"] = pa.array(surfaces, type=pa.string())
    cols["entity_type"] = pa.array(types, type=pa.string())
    cols["start"] = pa.array(starts, type=pa.int64())
    cols["end"] = pa.array(ends, type=pa.int64())
    return pa.table(cols)


def decode_mentions(
    tagged: "ray.data.Dataset",
    text_col: str = "sentence",
    tags_col: str = "pred_tags",
    type_consistent: bool = False,
) -> "ray.data.Dataset":
    return tagged.map_batches(
        _decode_batch,
        fn_kwargs={
            "text_col": text_col,
            "tags_col": tags_col,
            "type_consistent": type_consistent,
        },
        batch_format="pyarrow",
    )
