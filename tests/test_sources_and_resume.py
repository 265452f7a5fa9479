"""CoNLL/CLUE sources, tag-vocab inference, submit writer round-trip,
resumable partitioned output with lineage manifest."""

import json
import os

import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.corpus import synthesize_tagged_corpus
from ner_funtool_ray.sources.clue_json import (
    clue_json_to_bio,
    predictions_to_clue_json,
    spans_to_bio,
)
from ner_funtool_ray.sources.conll import (
    infer_tag_vocab,
    parse_conll_text,
    read_conll,
    write_conll,
)
from ner_funtool_ray.state.lineage import (
    load_manifest,
    resumable_write,
    verify_manifest,
)


def test_conll_roundtrip(tmp_path):
    tbl = synthesize_tagged_corpus(n_rows=30, seed=42)
    # write as CoNLL (chars is a string → per-char rows)
    tbl2 = pa.table(
        {
            "chars": pa.array(
                [list(s) for s in tbl["chars"].to_pylist()],
                type=pa.list_(pa.string()),
            ),
            "tags": tbl["gold_tags"],
        }
    )
    p = str(tmp_path / "train.txt")
    write_conll(tbl2, p)
    ds = read_conll([p])
    rows = ds.to_pandas().sort_values("sent_id").reset_index(drop=True)
    assert len(rows) == 30
    assert [list(x) for x in rows["chars"]] == tbl2["chars"].to_pylist()
    assert [list(x) for x in rows["tags"]] == tbl2["tags"].to_pylist()


def test_conll_multitask_split(tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("中\tB-ORG\n国\tE-ORG\n好\tO\n\n")
    rows = read_conll([p], multitask=True).to_pandas()
    assert list(rows["bmeo_tags"][0]) == ["B", "E", "O"]
    assert list(rows["attr_tags"][0]) == ["ORG", "ORG", "O"]


def test_parse_conll_trailing_sentence_no_blank():
    out = parse_conll_text("a\tO\nb\tB-X\n")
    assert out == [(["a", "b"], ["O", "B-X"])]


def test_infer_tag_vocab(tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("中\tB-ORG\n国\tE-ORG\n好\tO\n\n北\tB-LOC\n京\tE-LOC\n\n")
    vocab = infer_tag_vocab(read_conll([p]))
    assert vocab["O"] == 0
    assert set(vocab) == {"O", "B-ORG", "E-ORG", "B-LOC", "E-LOC"}


def test_clue_json_to_bio_reference_semantics(tmp_path):
    rec = {
        "id": 0,
        "text": "艺术家也讨厌画廊的老板",
        "label": {"position": {"艺术家": [[0, 2]], "老板": [[9, 10]]}},
    }
    p = str(tmp_path / "x.json")
    with open(p, "w", encoding="utf-8") as f:
        f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    rows = clue_json_to_bio([p]).to_pandas()
    tags = list(rows["tags"][0])
    assert tags[0:3] == ["B-position", "M-position", "E-position"]
    assert tags[9:11] == ["B-position", "E-position"]
    assert all(t == "O" for t in tags[3:9])


def test_spans_to_bio_singleton():
    assert spans_to_bio("abc", {"x": {"b": [[1, 1]]}}) == ["O", "S-x", "O"]


def test_submit_json_roundtrip():
    # spans→BIO→(predictions_to_clue_json)→label dict equals original spans
    text = "中国首都是北京"
    label = {"LOC": {"中国": [[0, 1]], "北京": [[5, 6]]}}
    tags = spans_to_bio(text, label)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array([7], type=pa.int64()),
                "sentence": [text],
                "pred_tags": pa.array([tags], type=pa.list_(pa.string())),
            }
        )
    )
    out = predictions_to_clue_json(ds).to_pandas()
    assert out["id"][0] == 7
    assert json.loads(out["label"][0]) == label


def _triples_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "subj": [f"ent:e{i}" for i in range(20)],
                "pred": ["appears_in"] * 20,
                "obj": [f"repo{i % 3}" for i in range(20)],
                "weight": pa.array([1] * 20, type=pa.int64()),
                "subj_bucket": pa.array([i % 4 for i in range(20)], type=pa.int64()),
            }
        )
    )


def test_resumable_write_and_verify(tmp_path):
    out = str(tmp_path / "triples")
    m1 = resumable_write(_triples_ds(), out, lineage={"stage": "test"})
    assert set(m1["partitions"]) == {"0", "1", "2", "3"}
    assert sum(p["rows"] for p in m1["partitions"].values()) == 20
    assert verify_manifest(out)
    assert load_manifest(out)["lineage"] == {"stage": "test"}


def test_resume_skips_completed_partitions(tmp_path):
    out = str(tmp_path / "triples")
    resumable_write(_triples_ds(), out)
    # record write times, then resume: nothing should be rewritten
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d))
        for d in os.listdir(out)
        if d.startswith("subj_bucket=")
    }
    m2 = resumable_write(_triples_ds(), out)
    assert set(m2["partitions"]) == {"0", "1", "2", "3"}
    assert verify_manifest(out)
    for d, t in mtimes.items():
        files = os.listdir(os.path.join(out, d))
        assert len(files) == 1, f"{d} got extra files on resume: {files}"


def test_resume_completes_missing_partition(tmp_path):
    out = str(tmp_path / "triples")
    resumable_write(_triples_ds(), out)
    # simulate a crash that lost bucket 2: remove its dir + manifest entry
    import shutil

    m = load_manifest(out)
    del m["partitions"]["2"]
    from ner_funtool_ray.state.lineage import save_manifest

    shutil.rmtree(os.path.join(out, "subj_bucket=2"))
    save_manifest(out, m)
    m2 = resumable_write(_triples_ds(), out)
    assert set(m2["partitions"]) == {"0", "1", "2", "3"}
    assert verify_manifest(out)
