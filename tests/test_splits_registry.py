"""train/test split determinism, writers, and the stage/pipeline registry."""

import pyarrow as pa
import ray.data

from ner_funtool_ray import registry
from ner_funtool_ray.sources.splits import (
    train_test_split,
    write_entities,
    write_eval_results,
)


def _ds(n=500):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(n)), "x": [i * 2 for i in range(n)]})
    )


def test_hash_split_deterministic_and_disjoint():
    train1, test1 = train_test_split(_ds(), test_size=0.2, id_col="doc_id")
    train2, test2 = train_test_split(_ds(), test_size=0.2, id_col="doc_id")
    tr1 = set(train1.to_pandas()["doc_id"])
    te1 = set(test1.to_pandas()["doc_id"])
    assert tr1 | te1 == set(range(500))
    assert not (tr1 & te1)
    assert 0.1 < len(te1) / 500 < 0.3
    assert set(train2.to_pandas()["doc_id"]) == tr1  # same rows every run


def test_positional_split():
    train, test = train_test_split(_ds(100), test_size=0.25)
    assert train.count() + test.count() == 100
    assert test.count() == 25


def test_write_eval_results(tmp_path):
    p = str(tmp_path / "eval_results.txt")
    write_eval_results(p, {"f1": 0.9, "precision": 0.8})
    assert open(p).read() == "f1 = 0.9\nprecision = 0.8\n"


def test_write_tsv_roundtrip(tmp_path, ray_session):
    from ner_funtool_ray.sources.splits import write_tsv

    ds = ray.data.from_arrow(
        pa.table({"p_ORG": [0.25, 0.5], "p_LOC": [0.75, 0.5]})
    )
    out = str(tmp_path / "test_results")
    write_tsv(ds, out)
    import glob

    lines = []
    for f in sorted(glob.glob(f"{out}/*")):
        lines.extend(open(f).read().splitlines())
    header = [ln for ln in lines if ln.startswith('"p_ORG"')]
    # tab-delimited (reference '\t'.join shape), values round-trip
    assert header and "\t" in header[0]
    data = sorted(ln for ln in lines if not ln.startswith('"'))
    assert data == ["0.25\t0.75", "0.5\t0.5"]


def test_write_entities(tmp_path):
    ds = ray.data.from_arrow(
        pa.table({"entity_type": ["ORG", "LOC"], "surface": ["清华", "北京"]})
    )
    p = str(tmp_path / "ents.txt")
    write_entities(p, ds)
    assert sorted(open(p).read().split()) == ["LOC:北京", "ORG:清华"]


def test_registry_stage_compose():
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": ["r"], "path": ["p"], "commit": ["c"],
                "lang": ["en"], "content": ["hello. world."],
            }
        )
    )
    out = registry.build(corpus, ["ingest", "sentence-split"]).to_pandas()
    assert len(out) == 2
    assert set(out["sentence"]) == {"hello", "world"}


def test_registry_pipeline_lookup():
    assert "kg-gazetteer" in registry.pipelines()
    res = registry.pipeline("kg-gazetteer")("/root/testdata/sf0.001")
    assert res.count() > 0


def test_registry_unknown_raises():
    import pytest

    with pytest.raises(KeyError):
        registry.stage("nope")
    with pytest.raises(KeyError):
        registry.pipeline("nope")
