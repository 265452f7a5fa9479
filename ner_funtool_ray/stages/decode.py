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


def _decode_batch_fast(batch: pa.Table, text_col: str, tags_col: str) -> pa.Table:
    """Vectorized BMES decode (decode_bmes semantics, no type check).

    Head chars are classified with Arrow kernels over the FLAT tag array
    (one pass, no per-char Python); the only Python loop is over candidate
    B positions, which are sparse.  A span is emitted iff the head sequence
    from a B runs ``B M* E`` contiguously — equivalent to the reference
    scan (`ner_utils.py:42-59`): any other head in between resets, and the
    span type/start come from the B tag.  Parity with decode_bmes is
    covered by tests.
    """
    import pyarrow.compute as pc

    tags_arr = batch[tags_col]
    if isinstance(tags_arr, pa.ChunkedArray):
        tags_arr = tags_arr.combine_chunks()
    flat = tags_arr.values
    offsets = tags_arr.offsets.to_numpy()
    heads = pc.utf8_slice_codeunits(flat, 0, 1)
    codes = np.full(len(flat), -1, dtype=np.int8)
    for code, ch in enumerate("BME"):
        codes[pc.equal(heads, ch).to_numpy(zero_copy_only=False)] = code
    # attr of each tag (after the separator); '' for O/single-part tags
    attrs = pc.utf8_slice_codeunits(flat, 2, 2**30).to_pylist()

    texts = batch[text_col].to_pylist()
    idx: list[int] = []
    types: list[str] = []
    surfaces: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for i, text in enumerate(texts):
        lo, hi = offsets[i], offsets[i + 1]
        row = codes[lo:hi]
        for b in np.nonzero(row == 0)[0]:
            j = b + 1
            n = len(row)
            while j < n and row[j] == 1:  # M run (sparse; spans are short)
                j += 1
            if j < n and row[j] == 2:  # E closes the span
                idx.append(i)
                types.append(attrs[lo + b])
                surfaces.append((text or "")[b : j + 1])
                starts.append(int(b))
                ends.append(int(j))
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
    """Span decode stage.  The default (type_consistent=False) uses the
    vectorized fast path (decode_bmes / reference string-variant semantics:
    'O' RESETS an open span, matching ``get_entity_without_labelid``,
    ner_utils.py:62-79 — note the id-variant ``get_entity`` skips id-0
    without reset; both exist in the reference).  type_consistent=True
    falls back to the per-row ``calculate`` decoder."""
    if type_consistent:
        return tagged.map_batches(
            _decode_batch,
            fn_kwargs={
                "text_col": text_col,
                "tags_col": tags_col,
                "type_consistent": True,
            },
            batch_format="pyarrow",
        )
    return tagged.map_batches(
        _decode_batch_fast,
        fn_kwargs={"text_col": text_col, "tags_col": tags_col},
        batch_format="pyarrow",
    )
