"""Model-path pipeline: Ray-vs-serial parity, invariant preservation,
cascade semantics, fixture gold corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.corpus import synthesize_corpus, synthesize_tagged_corpus
from ner_funtool_ray.functions.hashing import sha256_hex
from ner_funtool_ray.functions.spans import trans_label_row
from ner_funtool_ray.metrics.tag_metrics import tag_report
from ner_funtool_ray.stages.decode import decode_mentions
from ner_funtool_ray.stages.ingest import ingest
from ner_funtool_ray.stages.sentence import split_to_sentences
from ner_funtool_ray.stages.tag import CascadeNerTagger, NerTagger, tag_sentences


@pytest.fixture(scope="module")
def sentences_ds():
    corpus = synthesize_corpus(n_rows=120, seed=42)
    ds = ray.data.from_arrow(corpus)
    return split_to_sentences(ingest(ds))


def test_ray_vs_serial_parity(sentences_ds):
    # Ray: actor pool, small batches (forces multi-batch, multi-actor)
    ray_out = (
        tag_sentences(sentences_ds, batch_size=16, concurrency=2)
        .select_columns(["row_id", "sent_id", "sentence", "pred_tags"])
        .to_pandas()
        .sort_values(["row_id", "sent_id"])
        .reset_index(drop=True)
    )
    # serial oracle: ONE NerTagger call over the whole table
    serial_tbl = NerTagger()(
        pa.table(
            {
                "row_id": pa.array(ray_out["row_id"], type=pa.int64()),
                "sent_id": pa.array(ray_out["sent_id"], type=pa.int64()),
                "sentence": pa.array(ray_out["sentence"], type=pa.string()),
            }
        )
    )
    serial_tags = serial_tbl["pred_tags"].to_pylist()
    got_tags = [list(x) for x in ray_out["pred_tags"]]
    assert got_tags == serial_tags


def test_sha256_invariant_through_pipeline(sentences_ds):
    tagged = tag_sentences(sentences_ds, batch_size=32, concurrency=2)
    mentions = decode_mentions(tagged).to_pandas()
    corpus = synthesize_corpus(n_rows=120, seed=42)
    by_key = {
        (r, p): s
        for r, p, s in zip(
            corpus["repo"].to_pylist(),
            corpus["path"].to_pylist(),
            sha256_hex(corpus["content"].to_pylist()),
        )
    }
    assert len(mentions) > 0
    for r in mentions.itertuples():
        assert by_key[(r.repo, r.path)] == r.content_sha256


def test_truncation_cap(sentences_ds):
    tagged = tag_sentences(sentences_ds, batch_size=32, concurrency=2,
                           max_seq_len=64).to_pandas()
    assert tagged["pred_tags"].map(len).max() <= 64


def test_cascade_combination_is_trans_label():
    corpus = synthesize_corpus(n_rows=40, seed=1)
    sents = split_to_sentences(ingest(ray.data.from_arrow(corpus)))
    out = tag_sentences(sents, cascade=True, batch_size=16, concurrency=2).to_pandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert list(r.pred_tags) == trans_label_row(list(r.bmeo_tags), list(r.attr_tags))
    # O-propagation: combined is O wherever bmeo or attr is O
    for r in out.itertuples():
        for b, a, c in zip(r.bmeo_tags, r.attr_tags, r.pred_tags):
            if b == "O" or a == "O":
                assert c == "O"


def test_tagged_fixture_gold_roundtrip():
    tbl = synthesize_tagged_corpus(n_rows=50, seed=42)
    # gold tags decode back to the planted spans
    from ner_funtool_ray.functions.spans import decode_positional

    for chars, tags in zip(tbl["chars"].to_pylist(), tbl["gold_tags"].to_pylist()):
        ents = decode_positional(chars, tags)
        assert len(ents) >= 1
        for typ, surface, s, e in ents:
            assert chars[s : e + 1] == surface


def test_perfect_model_metrics_on_fixture():
    # pred == gold → tag F1 = 1.0 (SURVEY §5 property test)
    tbl = synthesize_tagged_corpus(n_rows=50, seed=42)
    pairs = []
    golds, preds = [], []
    for tags in tbl["gold_tags"].to_pylist():
        golds.extend(tags)
        preds.extend(tags)
    ds = ray.data.from_arrow(pa.table({"gold_tag": golds, "pred_tag": preds}))
    rep = tag_report(ds, remove_o=True)
    assert rep.iloc[-1]["f1"] == pytest.approx(1.0, abs=1e-9)
