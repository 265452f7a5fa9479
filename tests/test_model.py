"""Numpy BiLSTM+CRF core: Viterbi correctness vs brute force, determinism,
masking, cascade shapes."""

import itertools

import numpy as np

from ner_funtool_ray.model.bilstm_crf import (
    BiLstmCrf,
    CascadeTagger,
    init_weights,
    load_weights,
    save_weights,
    viterbi_decode_batch,
)


def brute_force_best_path(logits, trans, length):
    V = logits.shape[1]
    best, best_score = None, -np.inf
    for path in itertools.product(range(V), repeat=length):
        s = logits[0, path[0]]
        for t in range(1, length):
            s += trans[path[t - 1], path[t]] + logits[t, path[t]]
        if s > best_score:
            best, best_score = path, s
    return list(best)


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(0)
    B, S, V = 6, 5, 4
    logits = rng.normal(size=(B, S, V)).astype(np.float32)
    trans = rng.normal(size=(V, V)).astype(np.float32)
    lengths = np.array([5, 4, 3, 2, 1, 5], dtype=np.int32)
    paths = viterbi_decode_batch(logits, trans, lengths)
    for b in range(B):
        L = int(lengths[b])
        expect = brute_force_best_path(logits[b], trans, L)
        assert paths[b, :L].tolist() == expect, f"row {b}"
        assert (paths[b, L:] == 0).all()  # padding stays 0


def test_viterbi_zero_length_row():
    logits = np.zeros((2, 3, 4), dtype=np.float32)
    trans = np.zeros((4, 4), dtype=np.float32)
    paths = viterbi_decode_batch(logits, trans, np.array([0, 3]))
    assert (paths[0] == 0).all()


def test_model_deterministic_across_instances(tmp_path):
    w = init_weights(vocab_size=50, emb_dim=8, hidden=8, n_tags=5, seed=3)
    p = str(tmp_path / "w.npz")
    save_weights(p, w)
    w2 = load_weights(p)
    ids = np.array([[1, 2, 3, 0], [4, 5, 0, 0]], dtype=np.int32)
    lens = np.array([3, 2], dtype=np.int32)
    out1 = BiLstmCrf(w).predict(ids, lens)
    out2 = BiLstmCrf(w2).predict(ids, lens)
    np.testing.assert_array_equal(out1, out2)


def test_model_padding_invariance():
    # extra padding columns must not change predictions for true lengths
    w = init_weights(vocab_size=50, emb_dim=8, hidden=8, n_tags=5, seed=3)
    m = BiLstmCrf(w)
    ids = np.array([[1, 2, 3]], dtype=np.int32)
    lens = np.array([3], dtype=np.int32)
    padded = np.array([[1, 2, 3, 0, 0, 0]], dtype=np.int32)
    np.testing.assert_array_equal(
        m.predict(ids, lens)[0, :3], m.predict(padded, lens)[0, :3]
    )


def test_batch_invariance():
    # a row's prediction must not depend on which batch it rides in
    # (required for Ray-vs-oracle parity under any batching)
    w = init_weights(vocab_size=50, emb_dim=8, hidden=8, n_tags=5, seed=3)
    m = BiLstmCrf(w)
    ids = np.array([[1, 2, 3, 4], [5, 6, 0, 0], [7, 8, 9, 0]], dtype=np.int32)
    lens = np.array([4, 2, 3], dtype=np.int32)
    full = m.predict(ids, lens)
    for b in range(3):
        solo = m.predict(ids[b : b + 1, : lens[b]], lens[b : b + 1])
        np.testing.assert_array_equal(full[b, : lens[b]], solo[0])


def test_cascade_outputs():
    w = init_weights(vocab_size=50, emb_dim=8, hidden=8, n_tags=5, n_attrs=4, seed=3)
    m = CascadeTagger(w)
    ids = np.array([[1, 2, 3, 0]], dtype=np.int32)
    lens = np.array([3], dtype=np.int32)
    bmeo, attr = m.predict_cascade(ids, lens)
    assert bmeo.shape == (1, 4) and attr.shape == (1, 4)
    assert (bmeo[0, 3:] == 0).all() and (attr[0, 3:] == 0).all()
    assert attr.max() < 4 and bmeo.max() < 5
