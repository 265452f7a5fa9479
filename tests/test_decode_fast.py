"""Vectorized decode fast path ≡ decode_bmes on random tag streams."""

import numpy as np
import pyarrow as pa

from ner_funtool_ray.functions.spans import decode_bmes
from ner_funtool_ray.stages.decode import _decode_batch, _decode_batch_fast

TAGS = ["O", "B-ORG", "M-ORG", "E-ORG", "B-LOC", "M-LOC", "E-LOC", "S-PER", "X"]


def _random_batch(n_rows=200, seed=0):
    rng = np.random.default_rng(seed)
    texts, tag_lists = [], []
    for i in range(n_rows):
        L = int(rng.integers(0, 30))
        texts.append("".join(chr(ord("a") + int(c)) for c in rng.integers(0, 26, L)))
        tag_lists.append([TAGS[int(t)] for t in rng.integers(0, len(TAGS), L)])
    return pa.table(
        {
            "row_id": pa.array(range(n_rows), type=pa.int64()),
            "sentence": pa.array(texts, type=pa.string()),
            "pred_tags": pa.array(tag_lists, type=pa.list_(pa.string())),
        }
    )


def test_fast_decode_equals_reference_decoder():
    batch = _random_batch()
    fast = _decode_batch_fast(batch, "sentence", "pred_tags").to_pylist()
    slow = _decode_batch(batch, "sentence", "pred_tags", False).to_pylist()
    assert fast == slow
    assert len(fast) > 0  # fixture actually produced spans


def test_fast_decode_matches_decode_bmes_per_row():
    batch = _random_batch(seed=7)
    fast = _decode_batch_fast(batch, "sentence", "pred_tags")
    by_row: dict[int, list] = {}
    for r in fast.to_pylist():
        by_row.setdefault(r["row_id"], []).append(
            (r["entity_type"], r["surface"], r["start"], r["end"])
        )
    for row_id, text, tags in zip(
        batch["row_id"].to_pylist(),
        batch["sentence"].to_pylist(),
        batch["pred_tags"].to_pylist(),
    ):
        assert by_row.get(row_id, []) == decode_bmes(text, tags)


def test_fast_decode_adjacent_and_edge_cases():
    batch = pa.table(
        {
            "row_id": pa.array([0, 1, 2], type=pa.int64()),
            "sentence": ["abcd", "ab", ""],
            "pred_tags": pa.array(
                [
                    ["B-X", "E-X", "B-Y", "E-Y"],  # adjacent, no O between
                    ["B-X", "M-X"],  # trailing open span dropped
                    [],
                ],
                type=pa.list_(pa.string()),
            ),
        }
    )
    out = _decode_batch_fast(batch, "sentence", "pred_tags").to_pylist()
    assert [(r["entity_type"], r["surface"]) for r in out] == [("X", "ab"), ("Y", "cd")]
