"""K7 serving-bundle export/load (`run_bert_crf.py:657-668, 865-867`
SavedModel-export role; T7 `infer_offline.py:76-77` load role)."""

import json
import os

import pyarrow as pa
import pytest

from ner_funtool_ray.model.export import (
    BUNDLE_FORMAT,
    export_bundle,
    load_bundle,
    read_signature,
)

SENTS = ["中国首都是北京", "阿里巴巴在杭州成立", "hello world", ""]


def _predict(tagger):
    return tagger(pa.table({"sentence": SENTS})).to_pydict()


@pytest.mark.parametrize(
    "model,cascade",
    [("bilstm", False), ("bilstm", True), ("bert", False), ("albert", False)],
)
def test_bundle_round_trip_parity(tmp_path, model, cascade):
    """Export → load reconstructs the exact tagger: identical predictions."""
    from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

    d = str(tmp_path / "bundle")
    export_bundle(d, model=model, cascade=cascade, max_seq_len=64)
    loaded = load_bundle(d)
    original = _TAGGER_CLASSES[(model, cascade)](max_seq_len=64)
    assert _predict(loaded) == _predict(original)
    assert isinstance(loaded, _TAGGER_CLASSES[(model, cascade)])


def test_signature_contents(tmp_path):
    d = str(tmp_path / "b")
    export_bundle(d, model="bert", max_seq_len=32)
    sig = read_signature(d)
    assert sig["format"] == BUNDLE_FORMAT
    # the reference's 4 int serving placeholders (run_bert_crf.py:657-668)
    names = [i["name"] for i in sig["signature"]["inputs"]]
    assert names == ["input_ids", "input_mask", "segment_ids", "label_ids"]
    assert all(i["shape"] == [-1, 32] for i in sig["signature"]["inputs"])
    assert sig["labels"] and "O" in sig["labels"]
    assert len(sig["weights_sha256"]) == 64


def test_bilstm_signature_dynamic_shape(tmp_path):
    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm")
    sig = read_signature(d)
    names = [i["name"] for i in sig["signature"]["inputs"]]
    assert names == ["input_ids", "lengths"]


def test_corrupted_weights_fail_loudly(tmp_path):
    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm")
    wpath = os.path.join(d, "weights.npz")
    blob = bytearray(open(wpath, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(wpath, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="corrupted"):
        load_bundle(d)


def test_not_a_bundle_fails(tmp_path):
    d = str(tmp_path / "b")
    os.makedirs(d)
    with open(os.path.join(d, "signature.json"), "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="not a"):
        read_signature(d)


def test_use_crf_false_round_trips(tmp_path):
    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm", use_crf=False)
    assert read_signature(d)["use_crf"] is False
    loaded = load_bundle(d)
    assert loaded.model.use_crf is False
    from ner_funtool_ray.stages.tag import NerTagger

    assert _predict(loaded) == _predict(NerTagger(use_crf=False))


def test_reexport_is_stable(tmp_path):
    """Rerunning the export self-heals a partial dir: same bytes, same sha."""
    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm")
    sha1 = read_signature(d)["weights_sha256"]
    os.remove(os.path.join(d, "signature.json"))  # simulate partial write
    export_bundle(d, model="bilstm")
    assert read_signature(d)["weights_sha256"] == sha1
    load_bundle(d)


def test_trained_checkpoint_exports(tmp_path):
    """A weights dict (training checkpoint) exports and serves."""
    from ner_funtool_ray.model.bilstm_crf import init_weights
    from ner_funtool_ray.model.vocabs import TAGS, default_char_vocab

    w = init_weights(
        vocab_size=len(default_char_vocab()),
        emb_dim=32,
        hidden=48,
        n_tags=len(TAGS),
        seed=99,
    )
    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm", weights=w)
    loaded = load_bundle(d)
    import numpy as np

    np.testing.assert_array_equal(loaded.model.w["proj_w"], w["proj_w"])


def test_bundle_tag_stage_and_server(ray_session, tmp_path):
    """tag_sentences(bundle=…) actor pool + serving actor over a bundle
    both reproduce the direct tagger output."""
    import ray.data as rd

    from ner_funtool_ray.serving import predict, start_server, stop_server
    from ner_funtool_ray.stages.tag import NerTagger, tag_sentences

    d = str(tmp_path / "b")
    export_bundle(d, model="bilstm")
    ds = rd.from_items([{"sentence": s} for s in SENTS if s])
    got = tag_sentences(ds, bundle=d, concurrency=(1, 1)).to_pandas()
    direct = NerTagger()(pa.table({"sentence": [s for s in SENTS if s]}))
    want = {s: t for s, t in zip(
        direct["sentence"].to_pylist(), direct["pred_tags"].to_pylist()
    )}
    for _, row in got.iterrows():
        assert list(row["pred_tags"]) == want[row["sentence"]]

    server = start_server(name="bundle-test-server", bundle=d)
    out = predict(server, ["中国首都是北京"])
    assert out and out[0]["text"] == "中国首都是北京"
    assert isinstance(out[0]["entities"], list)
    stop_server("bundle-test-server")


def test_train_export_serve_lifecycle(ray_session, tmp_path):
    """The full reference lifecycle on Ray: train (epoch loop) → export
    (K7 bundle) → serve (T6 actor) → predictions match a direct tagger
    built from the trained weights."""
    import numpy as np

    from ner_funtool_ray.pipelines.training import train_bilstm_crf
    from ner_funtool_ray.serving import predict, start_server, stop_server
    from ner_funtool_ray.stages.tag import NerTagger

    w, history = train_bilstm_crf(
        "/root/testdata/sf0.001",
        epochs=1,
        batch_size=64,
        n_workers=2,
        eval_each_epoch=False,
    )
    d = str(tmp_path / "trained")
    export_bundle(d, model="bilstm", weights=w)
    loaded = load_bundle(d)
    np.testing.assert_array_equal(loaded.model.w["proj_w"], w["proj_w"])

    server = start_server(name="lifecycle-test-server", bundle=d)
    got = predict(server, [SENTS[0]])
    stop_server("lifecycle-test-server")

    direct = NerTagger()
    direct.model.w = w
    direct.model = type(direct.model)(w)
    import pyarrow as _pa

    out = direct(_pa.table({"sentence": [SENTS[0]]}))
    want = []
    from ner_funtool_ray.functions.spans import decode_bmes

    for typ, surf, s, e in decode_bmes(
        SENTS[0], out["pred_tags"][0].as_py()
    ):
        want.append({"type": typ, "surface": surf, "start": s, "end": e})
    assert got[0]["entities"] == want
