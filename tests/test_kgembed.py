"""TransE KG embeddings (pipelines/kgembed.py): gradient correctness by
finite differences, bit-exact Ray-vs-serial parity, deterministic
convergence on the real triple table."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ner_funtool_ray.pipelines.kgembed import (
    _neg_indices,
    train_transe,
    train_transe_serial,
    transe_batch_grads,
)


def _toy_triples(n_ent=8, n_rel=2, n=40, seed=7):
    rng = np.random.default_rng(seed)
    rows = {
        (f"e{a}", f"r{r}", f"e{b}")
        for a, r, b in zip(
            rng.integers(0, n_ent, n),
            rng.integers(0, n_rel, n),
            rng.integers(0, n_ent, n),
        )
        if a != b
    }
    rows = sorted(rows)
    return pd.DataFrame(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        }
    )


def test_gradients_match_finite_differences():
    rng = np.random.default_rng(3)
    n_ent, n_rel, dim, n = 6, 2, 4, 10
    E = rng.normal(size=(n_ent, dim))
    R = rng.normal(size=(n_rel, dim))
    hi = rng.integers(0, n_ent, n)
    ri = rng.integers(0, n_rel, n)
    ti = rng.integers(0, n_ent, n)
    ch = rng.integers(0, 2, n).astype(bool)
    neg = rng.integers(0, n_ent, n)

    def loss_of(E_, R_):
        true_ent = np.where(ch, hi, ti)
        ng = np.where(neg == true_ent, (neg + 1) % n_ent, neg)
        nh = np.where(ch, ng, hi)
        nt = np.where(ch, ti, ng)
        dp = np.sum((E_[hi] + R_[ri] - E_[ti]) ** 2, axis=1)
        dn = np.sum((E_[nh] + R_[ri] - E_[nt]) ** 2, axis=1)
        return float(np.sum(np.maximum(1.0 + dp - dn, 0.0))) / n

    gE, gR, loss = transe_batch_grads(E, R, hi, ri, ti, ch, neg, margin=1.0)
    assert loss == pytest.approx(loss_of(E, R))
    # hinge kink: skip any coordinate whose perturbation flips an active set
    eps = 1e-6
    for M, gM in ((E, gE), (R, gR)):
        for i in range(M.shape[0]):
            for j in range(M.shape[1]):
                M[i, j] += eps
                up = loss_of(E, R)
                M[i, j] -= 2 * eps
                dn_ = loss_of(E, R)
                M[i, j] += eps
                fd = (up - dn_) / (2 * eps)
                assert fd == pytest.approx(gM[i, j], abs=1e-5)


def test_negatives_are_content_derived_and_placement_free():
    subs, preds, objs = ["a", "b"], ["r", "r"], ["c", "d"]
    ch1, n1 = _neg_indices(subs, preds, objs, 10, epoch=0)
    ch2, n2 = _neg_indices(list(reversed(subs)), list(reversed(preds)),
                           list(reversed(objs)), 10, epoch=0)
    assert list(ch1) == list(reversed(list(ch2)))
    assert list(n1) == list(reversed(list(n2)))
    # epoch changes the corruption
    ch3, n3 = _neg_indices(subs, preds, objs, 10, epoch=1)
    assert list(n1) != list(n3) or list(ch1) != list(ch3)


def test_ray_vs_serial_bit_exact_parity():
    df = _toy_triples()
    kw = dict(dim=6, epochs=3, lr=0.05, margin=1.0, batch_size=8,
              n_workers=2, seed=42)
    E_s, R_s, e2i_s, r2i_s, hist_s = train_transe_serial(df, **kw)
    E_d, R_d, e2i_d, r2i_d, hist_d = train_transe(
        ray.data.from_pandas(df), **kw
    )
    assert e2i_s == e2i_d and r2i_s == r2i_d
    assert np.array_equal(E_s, E_d)
    assert np.array_equal(R_s, R_d)
    assert hist_s == hist_d


def test_loss_decreases_on_real_triples():
    from ner_funtool_ray.pipelines.kgembed import kg_transe_report

    rep = kg_transe_report(
        "/root/testdata/sf0.001", dim=8, epochs=4
    ).to_pandas()
    assert len(rep) == 4
    assert rep["mean_loss"].iloc[-1] < rep["mean_loss"].iloc[0]
    assert (rep["n_entities"] > 0).all() and (rep["n_relations"] >= 2).all()
    # deterministic: a second run reproduces the history exactly
    rep2 = kg_transe_report(
        "/root/testdata/sf0.001", dim=8, epochs=4
    ).to_pandas()
    pd.testing.assert_frame_equal(rep, rep2)


def test_linkpred_report_is_consistent_and_deterministic():
    from ner_funtool_ray.pipelines.kgembed import kg_transe_linkpred

    rep = kg_transe_linkpred(
        "/root/testdata/sf0.001", dim=8, epochs=2
    ).to_pandas()
    assert len(rep) == 1
    row = rep.iloc[0]
    assert row["hits1"] <= row["hits3"] <= row["hits10"] <= row["n_triples"]
    assert 0 < row["mrr_ppm"] <= 1_000_000
    rep2 = kg_transe_linkpred(
        "/root/testdata/sf0.001", dim=8, epochs=2
    ).to_pandas()
    pd.testing.assert_frame_equal(rep, rep2)


# --- DeepWalk / SGNS over walk pairs ---------------------------------------


def _toy_pairs(seed=3, n_nodes=6, n=30):
    rng = np.random.default_rng(seed)
    rows = {}
    for a, b in zip(rng.integers(0, n_nodes, n), rng.integers(0, n_nodes, n)):
        if a == b:
            continue
        k = (f"v{a}", f"v{b}")
        rows[k] = rows.get(k, 0) + 1
    keys = sorted(rows)
    return pd.DataFrame(
        {
            "center": [k[0] for k in keys],
            "context": [k[1] for k in keys],
            "n": [rows[k] for k in keys],
        }
    )


def test_sgns_gradients_match_finite_differences():
    from ner_funtool_ray.pipelines.kgembed import (
        _sgns_negatives,
        sgns_shard_grads,
    )

    df = _toy_pairs()
    vocab = {
        v: i
        for i, v in enumerate(
            sorted(set(df["center"]) | set(df["context"]))
        )
    }
    rng = np.random.default_rng(0)
    W = rng.normal(scale=0.2, size=(len(vocab), 5))
    C = rng.normal(scale=0.2, size=(len(vocab), 5))
    ci = np.asarray([vocab[c] for c in df["center"]])
    xi = np.asarray([vocab[x] for x in df["context"]])
    n = df["n"].to_numpy(dtype=np.float64)
    neg = _sgns_negatives(list(df["center"]), list(df["context"]), len(vocab), 0, 2)

    def loss_at(W_, C_):
        w = W_[ci]
        s = 1.0 / (1.0 + np.exp(-(w * C_[xi]).sum(axis=1)))
        l = -(n * np.log(np.maximum(s, 1e-12))).sum()
        for j in range(neg.shape[1]):
            sn = 1.0 / (1.0 + np.exp(-(w * C_[neg[:, j]]).sum(axis=1)))
            l += -(n * np.log(np.maximum(1.0 - sn, 1e-12))).sum()
        return l

    gW, gC, loss, tot = sgns_shard_grads(W, C, ci, xi, n, neg)
    assert np.isclose(loss, loss_at(W, C))
    eps = 1e-6
    for M, g in ((W, gW), (C, gC)):
        for idx in [(0, 0), (2, 3), (len(vocab) - 1, 4)]:
            P = M.copy()
            P[idx] += eps
            fd = (
                (loss_at(P, C) if M is W else loss_at(W, P)) - loss_at(W, C)
            ) / eps
            assert abs(fd - g[idx]) < 1e-3, (idx, fd, g[idx])


def test_deepwalk_ray_vs_serial_bit_exact(ray_session):
    from ner_funtool_ray.pipelines.kgembed import (
        train_deepwalk,
        train_deepwalk_serial,
    )

    df = _toy_pairs()
    ds = ray.data.from_pandas(df).repartition(3)
    W1, C1, v1, h1 = train_deepwalk(ds, dim=8, epochs=3)
    W2, C2, v2, h2 = train_deepwalk_serial(df, dim=8, epochs=3)
    assert v1 == v2
    assert np.array_equal(W1, W2) and np.array_equal(C1, C2)
    assert h1 == h2


def test_deepwalk_loss_decreases_on_real_walks(ray_session):
    from ner_funtool_ray.pipelines.kgembed import kg_deepwalk_report

    t = kg_deepwalk_report("/root/testdata/sf0.001", epochs=4).to_pandas()
    losses = t["mean_loss"].tolist()
    assert all(a > b for a, b in zip(losses, losses[1:]))
    assert (t["n_vocab"] > 0).all()
