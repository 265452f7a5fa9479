"""Encoder variants (ALBERT structure, transformer+BiLSTM stack) and the
WOL weighted-loss surface: structure assertions (layer sharing, factorized
embeddings), Ray-vs-serial parity, and reference-formula parity."""

import numpy as np
import pyarrow as pa

import ray.data

from ner_funtool_ray.model.transformer import (
    AlbertCrf,
    BertBilstmCrf,
    BertCrf,
    init_albert_weights,
    init_bert_bilstm_weights,
    init_transformer_weights,
)

V, T = 50, 7


def _n_params(w: dict) -> int:
    return sum(
        int(np.prod(v.shape))
        for k, v in w.items()
        if k not in ("n_layers", "n_groups", "n_heads")
    )


def test_albert_layer_sharing_param_count():
    # the ALBERT structural claim: depth does NOT add parameters
    # (modeling_albert.py:1091-1098 AUTO_REUSE under group scopes)
    w2 = init_albert_weights(vocab_size=V, n_tags=T, n_layers=2)
    w8 = init_albert_weights(vocab_size=V, n_tags=T, n_layers=8)
    assert set(w2) == set(w8)
    assert _n_params(w2) == _n_params(w8)
    assert int(w2["n_layers"]) == 2 and int(w8["n_layers"]) == 8
    # ... while a BERT-structured stack grows linearly with depth
    b2 = init_transformer_weights(vocab_size=V, n_tags=T, n_layers=2)
    b4 = init_transformer_weights(vocab_size=V, n_tags=T, n_layers=4)
    assert _n_params(b4) > _n_params(b2)


def test_albert_factorized_embeddings():
    w = init_albert_weights(
        vocab_size=V, n_tags=T, embedding_size=24, hidden=48
    )
    # word table at E < H plus the single E→H mapping
    # (modeling_albert.py:484-526, :1085-1088)
    assert w["word_emb"].shape == (V, 24)
    assert w["emb_proj_w"].shape == (24, 48)
    b = init_transformer_weights(vocab_size=V, n_tags=T, hidden=48)
    assert b["word_emb"].shape == (V, 48)  # BERT: word table at H


def test_albert_depth_actually_applied():
    # shared weights, but n_layers controls APPLICATION count — deeper
    # model must produce different encodings from shallower
    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, size=(2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    w1 = init_albert_weights(vocab_size=V, n_tags=T, n_layers=1, seed=5)
    w3 = init_albert_weights(vocab_size=V, n_tags=T, n_layers=3, seed=5)
    e1 = AlbertCrf(w1).encode(ids, mask)
    e3 = AlbertCrf(w3).encode(ids, mask)
    assert e1.shape == e3.shape
    assert not np.allclose(e1, e3)


def test_albert_group_selection_rule():
    # with n_groups == n_layers every layer gets its own group — the
    # group index rule int(layer/n_layers*n_groups) must hit each once
    w = init_albert_weights(vocab_size=V, n_tags=T, n_layers=3, n_groups=3)
    assert all(f"g{i}_q_w" in w for i in range(3))
    m = AlbertCrf(w)
    assert [int(i / m.n_layers * m.n_groups) for i in range(3)] == [0, 1, 2]


def test_albert_padding_and_batch_invariance():
    m = AlbertCrf(init_albert_weights(vocab_size=V, n_tags=T, seed=3))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, V, size=(4, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[2, 7:] = 0
    full = m.predict(ids, mask)
    # padding must not leak
    ids2 = ids.copy()
    ids2[2, 7:] = 42
    assert np.array_equal(full[2, :7], m.predict(ids2, mask)[2, :7])
    # batch invariance
    solo = m.predict(ids[2:3], mask[2:3])
    assert np.array_equal(full[2], solo[0])


def test_bert_bilstm_stacked_head_structure():
    w = init_bert_bilstm_weights(
        vocab_size=V, n_tags=T, hidden=48, lstm_hidden=32
    )
    # concat → tanh hidden 2H→H → tag projection (lstm_crf_layer.py:101-126)
    assert w["lstm_fw_kernel"].shape == (48 + 32, 4 * 32)
    assert w["stack_hid_w"].shape == (64, 32)
    assert w["stack_proj_w"].shape == (32, T)
    m = BertBilstmCrf(w)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, V, size=(3, 8)).astype(np.int32)
    mask = np.ones_like(ids)
    out = m.predict(ids, mask)
    assert out.shape == (3, 8)
    # stacked head is a genuinely different function from the plain head
    plain = BertCrf(
        init_transformer_weights(vocab_size=V, n_tags=T, seed=17)
    ).predict(ids, mask)
    assert out.shape == plain.shape


def test_variant_taggers_differ_from_bert():
    from ner_funtool_ray.stages.tag import (
        AlbertNerTagger,
        BertBilstmNerTagger,
        BertNerTagger,
    )

    sents = ["spark joins the customer table while the query scans rows"] * 3
    a = AlbertNerTagger()(pa.table({"sentence": sents}))["pred_tags"].to_pylist()
    s = BertBilstmNerTagger()(pa.table({"sentence": sents}))["pred_tags"].to_pylist()
    b = BertNerTagger()(pa.table({"sentence": sents}))["pred_tags"].to_pylist()
    assert len(a[0]) == len(b[0]) == len(s[0])
    assert a != b and s != b  # distinct architectures, distinct streams


def test_ray_vs_serial_parity_albert_and_stacked():
    from ner_funtool_ray.stages.tag import (
        AlbertNerTagger,
        BertBilstmNerTagger,
        tag_sentences,
    )

    sents = [
        "spark joins the customer table",
        "中国首都是北京",
        "merge sort group agg window vector stream",
        "short",
    ] * 6
    ds = ray.data.from_arrow(
        pa.table({"sid": list(range(len(sents))), "sentence": sents})
    ).repartition(3)
    for model, cls in (
        ("albert", AlbertNerTagger),
        ("bert_lstm", BertBilstmNerTagger),
    ):
        got = (
            tag_sentences(ds, model=model, batch_size=5, concurrency=2)
            .to_pandas()
            .sort_values("sid")
            .reset_index(drop=True)
        )
        want = cls()(pa.table({"sentence": sents}))["pred_tags"].to_pylist()
        assert [list(r) for r in got["pred_tags"]] == want


def test_wol_weights_reference_formula():
    from ner_funtool_ray.model.wol import wol_weights

    labels = np.array([[0, 1, 2, 0, 3], [4, 0, 0, 0, 0]])
    got = wol_weights(labels, o_index=0)
    # run_bert_wol.py:583-585: masks_of_entity = float(labels != O);
    # weights = masks + 0.5
    want = (labels != 0).astype(np.float32) + 0.5
    assert got.dtype == np.float32
    assert np.array_equal(got, want)
    assert set(np.unique(got)) == {0.5, 1.5}


def test_wol_weighted_ce_matches_manual():
    from ner_funtool_ray.model.wol import softmax_ce, wol_weighted_ce

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 4, 3)).astype(np.float64)
    labels = np.array([[0, 1, 2, 0], [2, 0, 0, 0]])
    ce = softmax_ce(logits, labels)
    # manual per-position CE
    for b in range(2):
        for s in range(4):
            z = logits[b, s]
            p = np.exp(z - z.max()) / np.exp(z - z.max()).sum()
            assert abs(ce[b, s] + np.log(p[labels[b, s]])) < 1e-9
    # reference reduction: sum(ce*(mask+0.5)) / (sum(mask)+1e-5)
    got = wol_weighted_ce(logits, labels, o_index=0)
    masks = (labels != 0).astype(np.float32)
    want = (ce * (masks + 0.5)).sum(axis=-1) / (masks.sum(axis=-1) + 1e-5)
    assert np.allclose(got, want)
    # lengths variant masks padding out of both sums
    got_l = wol_weighted_ce(logits, labels, o_index=0, lengths=np.array([4, 1]))
    want1 = (ce[1, :1] * (masks[1, :1] + 0.5)).sum() / (
        masks[1, :1].sum() + 1e-5
    )
    # float32 epsilon in the reference constant vs float64 manual math
    assert abs(got_l[1] - want1) < 1e-6


def test_wol_scorer_batch_invariance_and_pipeline():
    from ner_funtool_ray.stages.tag import WolScorer

    sents = [
        "spark joins the customer table",
        "the query filters each row",
        "merge sort group agg",
    ]
    golds = [
        ["B-ORG", "M-ORG", "E-ORG"] + ["O"] * (len(sents[0]) - 3),
        ["O"] * len(sents[1]),
        ["S-LOC"] + ["O"] * (len(sents[2]) - 1),
    ]
    tbl = pa.table(
        {
            "sentence": sents,
            "gold_tags": pa.array(golds, type=pa.list_(pa.string())),
        }
    )
    sc = WolScorer()
    full = sc(tbl)["wol_loss"].to_pylist()
    # chunk-padding independence: scoring rows one at a time is identical
    solo = [
        sc(tbl.slice(i, 1))["wol_loss"].to_pylist()[0] for i in range(3)
    ]
    assert np.allclose(full, solo)
    assert all(v > 0 for v in full)


def test_wol_report_runs():
    from ner_funtool_ray.pipelines.tagging import wol_loss_report

    rep = wol_loss_report("/root/testdata/sf0.001")
    assert list(rep.columns) == ["n_sentences", "mean_wol_loss"]
    assert rep["n_sentences"][0] > 0
    assert rep["mean_wol_loss"][0] > 0


def test_softmax_decode_matches_bruteforce_and_differs_from_viterbi():
    """use_crf=False (softmax branch): per-position argmax of the logits,
    zero past true length; with CRF transitions active the two decoders
    must disagree somewhere on random inputs."""
    import numpy as np

    from ner_funtool_ray.model.bilstm_crf import (
        BiLstmCrf,
        init_weights,
        softmax_decode_batch,
        viterbi_decode_batch,
    )

    rng = np.random.default_rng(5)
    w = init_weights(vocab_size=50, emb_dim=8, hidden=12, n_tags=5, seed=3)
    ids = rng.integers(1, 50, size=(16, 20)).astype(np.int32)
    lengths = rng.integers(1, 21, size=16).astype(np.int32)
    m_soft = BiLstmCrf(w, use_crf=False)
    m_crf = BiLstmCrf(w)
    logits = m_soft.logits(ids, lengths)
    got = m_soft.predict(ids, lengths)
    # brute-force row-by-row argmax
    for b in range(16):
        L = int(lengths[b])
        assert list(got[b, :L]) == list(logits[b, :L].argmax(axis=1))
        assert (got[b, L:] == 0).all()
    np.testing.assert_array_equal(got, softmax_decode_batch(logits, lengths))
    assert (got != m_crf.predict(ids, lengths)).any()


def test_softmax_tagger_pipeline_runs(ray_session):
    """use_crf=False plumbs through the actor pool; cascade rejects it."""
    import pytest as _pytest

    from ner_funtool_ray.pipelines.tagging import model_mentions
    from ner_funtool_ray.stages.tag import tag_sentences

    df = model_mentions(
        "/root/testdata/sf0.001", model="bilstm", use_crf=False
    ).to_pandas()
    assert len(df) > 0 and "entity_id" in df.columns
    import ray.data as rd

    with _pytest.raises(ValueError, match="single-head"):
        tag_sentences(
            rd.from_items([{"sentence": "x"}]), cascade=True, use_crf=False
        )
