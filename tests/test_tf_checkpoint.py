"""TF1 tensor-bundle checkpoint interop (model/tf_checkpoint.py).

The writer synthesises checkpoints in the REAL on-disk format (LevelDB
SSTable index + raw data shard), so reader tests double as format tests:
footer magic, masked-crc block trailers, prefix-compressed keys, protobuf
bundle entries.  Prediction-parity tests pin the reference-graph name
mapping (`model_lstm_crf.py:23-56`, `model_bert_crf.py:47-56`,
`bert/modeling.py` scopes) for the BiLSTM and transformer families."""

import struct

import numpy as np
import pytest

from ner_funtool_ray.model.bilstm_crf import BiLstmCrf, init_weights
from ner_funtool_ray.model.tf_checkpoint import (
    _BILSTM_NAME_MAP,
    _TABLE_MAGIC,
    bert_weights_from_tf,
    bilstm_weights_from_tf,
    read_tf_checkpoint,
    write_tf_checkpoint,
)
from ner_funtool_ray.model.transformer import (
    BertCrf,
    init_transformer_weights,
)


def test_roundtrip_dtypes_shapes(tmp_path):
    rng = np.random.default_rng(3)
    tensors = {
        "a/b/kernel": rng.normal(size=(7, 5)).astype(np.float32),
        "a/b/bias": rng.normal(size=(5,)).astype(np.float32),
        "steps": np.array(1234, dtype=np.int64),  # scalar
        "ids": np.arange(11, dtype=np.int32),
        "dbl": rng.normal(size=(2, 3, 4)),  # float64
    }
    prefix = str(tmp_path / "model.ckpt-77")
    write_tf_checkpoint(prefix, tensors)
    back = read_tf_checkpoint(prefix)
    assert sorted(back) == sorted(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype, k
        assert back[k].shape == tensors[k].shape, k
        np.testing.assert_array_equal(back[k], tensors[k])


def test_index_file_is_a_real_sstable(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, {"v": np.zeros(3, dtype=np.float32)})
    raw = open(prefix + ".index", "rb").read()
    # 48-byte footer ends with the leveldb table magic, little-endian
    assert struct.unpack("<Q", raw[-8:])[0] == _TABLE_MAGIC
    # data shard carries exactly the tensor bytes
    data = open(prefix + ".data-00000-of-00001", "rb").read()
    assert data == np.zeros(3, dtype=np.float32).tobytes()


def test_many_tensors_cross_block_boundaries(tmp_path):
    # >4 KB of index entries forces multiple prefix-compressed data blocks
    # and a multi-entry index block
    tensors = {
        f"scope_{i:03d}/very/long/variable/name/kernel_{i:03d}":
            np.full((3,), i, dtype=np.float32)
        for i in range(300)
    }
    prefix = str(tmp_path / "big.ckpt")
    write_tf_checkpoint(prefix, tensors)
    back = read_tf_checkpoint(prefix)
    assert len(back) == 300
    for k, v in tensors.items():
        np.testing.assert_array_equal(back[k], v)


def test_data_corruption_detected(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(
        prefix, {"v": np.arange(4, dtype=np.float32)}
    )
    p = prefix + ".data-00000-of-00001"
    raw = bytearray(open(p, "rb").read())
    raw[0] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        read_tf_checkpoint(prefix)
    # opt-out skips verification
    back = read_tf_checkpoint(prefix, verify_crc=False)
    assert back["v"].shape == (4,)


def test_index_corruption_detected(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, {"v": np.arange(4, dtype=np.float32)})
    p = prefix + ".index"
    raw = bytearray(open(p, "rb").read())
    raw[2] ^= 0xFF  # inside the first data block
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic|corrupt"):
        read_tf_checkpoint(prefix)


def test_bilstm_checkpoint_prediction_parity(tmp_path):
    # engine weights → TF-named checkpoint → import → identical predictions
    w = init_weights(vocab_size=40, emb_dim=8, hidden=8, n_tags=5, seed=5)
    inverse = {v: k for k, v in _BILSTM_NAME_MAP.items()}
    tf_tensors = {inverse[k]: v for k, v in w.items()}
    # optimizer slots and step counter must be ignored by the importer
    tf_tensors["global_step"] = np.array(120, dtype=np.int64)
    tf_tensors["projection/dense/kernel/Adam"] = np.zeros_like(w["proj_w"])
    prefix = str(tmp_path / "lstm.ckpt-120")
    write_tf_checkpoint(prefix, tf_tensors)

    imported = bilstm_weights_from_tf(prefix)
    assert sorted(imported) == sorted(w)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 40, size=(6, 12)).astype(np.int64)
    lengths = np.array([12, 3, 7, 12, 1, 9])
    np.testing.assert_array_equal(
        BiLstmCrf(imported).predict(ids, lengths),
        BiLstmCrf(w).predict(ids, lengths),
    )


def test_bilstm_missing_variable_raises_by_name(tmp_path):
    w = init_weights(vocab_size=10, emb_dim=4, hidden=4, n_tags=3)
    inverse = {v: k for k, v in _BILSTM_NAME_MAP.items()}
    tf_tensors = {inverse[k]: v for k, v in w.items()}
    del tf_tensors["encoder/bidirectional_rnn/bw/lstm_cell/kernel"]
    prefix = str(tmp_path / "broken.ckpt")
    write_tf_checkpoint(prefix, tf_tensors)
    with pytest.raises(KeyError, match="bw/lstm_cell/kernel"):
        bilstm_weights_from_tf(prefix)


def test_bilstm_softmax_variant_without_transitions(tmp_path):
    w = init_weights(vocab_size=10, emb_dim=4, hidden=4, n_tags=3)
    inverse = {v: k for k, v in _BILSTM_NAME_MAP.items()}
    tf_tensors = {
        inverse[k]: v for k, v in w.items() if k != "crf_trans"
    }
    prefix = str(tmp_path / "softmax.ckpt")
    write_tf_checkpoint(prefix, tf_tensors)
    imported = bilstm_weights_from_tf(prefix)
    assert "crf_trans" not in imported
    ids = np.arange(8).reshape(2, 4) % 10
    lengths = np.array([4, 2])
    np.testing.assert_array_equal(
        BiLstmCrf(imported, use_crf=False).predict(ids, lengths),
        BiLstmCrf(w, use_crf=False).predict(ids, lengths),
    )


def _bert_tf_names(w: dict, n_layers: int) -> dict:
    from ner_funtool_ray.model.tf_checkpoint import (
        _BERT_EMB_MAP,
        _BERT_HEAD_MAP,
        _bert_layer_map,
    )

    name_map = dict(_BERT_EMB_MAP)
    name_map.update(_BERT_HEAD_MAP)
    for i in range(n_layers):
        name_map.update(_bert_layer_map(i))
    inverse = {v: k for k, v in name_map.items()}
    return {
        inverse[k]: v
        for k, v in w.items()
        if k not in ("n_layers", "n_heads")
    }


def test_bert_checkpoint_prediction_parity(tmp_path):
    w = init_transformer_weights(
        vocab_size=30, hidden=16, n_layers=2, n_heads=2, intermediate=32,
        max_position=20, n_tags=5, seed=9,
    )
    prefix = str(tmp_path / "bert.ckpt-9000")
    write_tf_checkpoint(prefix, _bert_tf_names(w, n_layers=2))
    imported = bert_weights_from_tf(prefix, n_heads=2)
    assert int(imported["n_layers"]) == 2
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 30, size=(4, 10)).astype(np.int64)
    mask = np.ones((4, 10), dtype=np.int64)
    mask[1, 6:] = 0
    mask[3, 3:] = 0
    np.testing.assert_array_equal(
        BertCrf(imported).predict(ids, mask),
        BertCrf(w).predict(ids, mask),
    )


def test_bert_headless_checkpoint_imports_encoder_only(tmp_path):
    w = init_transformer_weights(
        vocab_size=12, hidden=8, n_layers=1, n_heads=2, intermediate=16,
        max_position=12, n_tags=4,
    )
    tf_tensors = {
        k: v
        for k, v in _bert_tf_names(w, n_layers=1).items()
        if not k.startswith("projection/")
    }
    prefix = str(tmp_path / "pretrained.ckpt")
    write_tf_checkpoint(prefix, tf_tensors)
    imported = bert_weights_from_tf(prefix, n_heads=2)
    assert "proj_w" not in imported and "crf_trans" not in imported
    assert imported["word_emb"].shape == (12, 8)


def test_tf_checkpoint_to_serving_bundle_bilstm(tmp_path):
    """Reference-trained BiLSTM checkpoint → bundle → identical serving
    predictions (the drop-in-predictor path, `predict_lstm_crf.py` role)."""
    import pyarrow as pa

    from ner_funtool_ray.model.export import (
        export_bundle,
        export_bundle_from_tf_checkpoint,
        load_bundle,
    )
    from ner_funtool_ray.model.vocabs import TAGS, default_char_vocab

    w = init_weights(
        vocab_size=len(default_char_vocab()),
        emb_dim=32,
        hidden=48,
        n_tags=len(TAGS),
        seed=99,
    )
    inverse = {v: k for k, v in _BILSTM_NAME_MAP.items()}
    prefix = str(tmp_path / "ckpt" / "model.ckpt-4000")
    write_tf_checkpoint(prefix, {inverse[k]: v for k, v in w.items()})

    d_tf = str(tmp_path / "bundle_tf")
    export_bundle_from_tf_checkpoint(d_tf, prefix, model="bilstm")
    d_np = str(tmp_path / "bundle_np")
    export_bundle(d_np, model="bilstm", weights=w)

    sents = ["中国首都是北京", "阿里巴巴在杭州成立", "hello", ""]
    batch = pa.table({"sentence": sents})
    assert (
        load_bundle(d_tf)(batch).to_pydict()
        == load_bundle(d_np)(batch).to_pydict()
    )


def test_tf_checkpoint_to_serving_bundle_bert(tmp_path):
    import pyarrow as pa

    from ner_funtool_ray.model.export import (
        export_bundle,
        export_bundle_from_tf_checkpoint,
        load_bundle,
    )
    from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

    ref = _TAGGER_CLASSES[("bert", False)](max_seq_len=64)
    w = ref.model.w
    n_layers, n_heads = int(w["n_layers"]), int(w["n_heads"])
    prefix = str(tmp_path / "bert.ckpt-9000")
    write_tf_checkpoint(prefix, _bert_tf_names(w, n_layers=n_layers))

    d_tf = str(tmp_path / "bundle_tf")
    export_bundle_from_tf_checkpoint(
        d_tf, prefix, model="bert", n_heads=n_heads, max_seq_len=64
    )
    d_np = str(tmp_path / "bundle_np")
    export_bundle(d_np, model="bert", weights=w, max_seq_len=64)

    sents = ["中国首都是北京", "hello world"]
    batch = pa.table({"sentence": sents})
    assert (
        load_bundle(d_tf)(batch).to_pydict()
        == load_bundle(d_np)(batch).to_pydict()
    )


def test_bert_family_requires_n_heads(tmp_path):
    from ner_funtool_ray.model.export import export_bundle_from_tf_checkpoint

    with pytest.raises(ValueError, match="n_heads"):
        export_bundle_from_tf_checkpoint(
            str(tmp_path / "b"), "nonexistent", model="bert"
        )
