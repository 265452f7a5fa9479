"""TransE knowledge-graph embeddings, data-parallel over the triple table.

Trains translation embeddings (h + r ≈ t, Bordes et al. 2013, public) on
the engine's own triple output (``pipelines/kg.py``), the standard "learn
from the KG you just built" step of a KG-construction pipeline: margin
ranking loss with corrupted-entity negatives, minibatch SGD, per-step
entity renormalization to the unit sphere.

Scale/determinism design (mirrors ``pipelines/training.py``):

- triples stay a sharded Dataset — only the entity/relation VOCAB (bounded
  by the entity universe, not corpus size) and the |E|×d / |R|×d matrices
  ever reach the driver;
- gradient workers are zero-CPU actors stepping shard batches against the
  broadcast parameter ref (``ray.put`` once per step, not per batch row);
- negatives are CONTENT-derived (crc32 of the triple key + epoch), so the
  corrupted entity for a triple is identical no matter which worker or
  process holds it — this is what makes Ray-vs-serial parity exact;
- per-step gradient averaging runs in worker-index order (deterministic
  float summation), exactly like the NER training loop.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _neg_indices(
    subs: list[str], preds: list[str], objs: list[str],
    n_entities: int, epoch: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Content-derived corruption: (corrupt_head?, negative entity id).

    crc32 over the triple key + epoch — identical across processes and
    shard placements, so serial and distributed runs corrupt identically."""
    corrupt_head = np.empty(len(subs), dtype=bool)
    neg = np.empty(len(subs), dtype=np.int64)
    for i, (s, p, o) in enumerate(zip(subs, preds, objs)):
        h = zlib.crc32(f"{s}\x00{p}\x00{o}\x00{epoch}".encode("utf-8"))
        corrupt_head[i] = bool(h & 1)
        neg[i] = (h >> 1) % n_entities
    return corrupt_head, neg


def transe_batch_grads(
    E: np.ndarray, R: np.ndarray,
    hi: np.ndarray, ri: np.ndarray, ti: np.ndarray,
    corrupt_head: np.ndarray, neg: np.ndarray,
    margin: float,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Margin-ranking gradients for one minibatch (vectorized, L2² score).

    Returns dense (gradE, gradR, mean_loss); gradients are the MEAN over
    batch examples so shard-weighted averaging composes exactly."""
    n = len(hi)
    # negatives never equal the true replaced entity (shift-by-1 escape)
    true_ent = np.where(corrupt_head, hi, ti)
    neg = np.where(neg == true_ent, (neg + 1) % len(E), neg)
    nh = np.where(corrupt_head, neg, hi)
    nt = np.where(corrupt_head, ti, neg)

    d_pos_vec = E[hi] + R[ri] - E[ti]
    d_neg_vec = E[nh] + R[ri] - E[nt]
    d_pos = np.sum(d_pos_vec * d_pos_vec, axis=1)
    d_neg = np.sum(d_neg_vec * d_neg_vec, axis=1)
    viol = margin + d_pos - d_neg
    active = viol > 0
    loss = float(np.sum(np.maximum(viol, 0.0))) / n

    gradE = np.zeros_like(E)
    gradR = np.zeros_like(R)
    if active.any():
        gp = 2.0 * d_pos_vec[active] / n
        gn = 2.0 * d_neg_vec[active] / n
        np.add.at(gradE, hi[active], gp)
        np.add.at(gradR, ri[active], gp)
        np.add.at(gradE, ti[active], -gp)
        np.add.at(gradE, nh[active], -gn)
        np.add.at(gradR, ri[active], -gn)
        np.add.at(gradE, nt[active], gn)
    return gradE, gradR, loss


@ray.remote(num_cpus=0)
class _TransEWorker:
    """Zero-CPU gradient worker (see GradWorker's num_cpus=0 rationale in
    pipelines/training.py — strict phase alternation, no reservations)."""

    def load(
        self, shard: "ray.data.Dataset", ent2id: dict, rel2id: dict,
        batch_size: int, margin: float,
    ) -> int:
        self._rows = []
        for b in shard.iter_batches(batch_size=4096, batch_format="pyarrow"):
            self._rows.append(
                (
                    b["subj"].to_pylist(),
                    b["pred"].to_pylist(),
                    b["obj"].to_pylist(),
                )
            )
        self._ent2id = ent2id
        self._rel2id = rel2id
        self._batch_size = batch_size
        self._margin = margin
        return sum(len(r[0]) for r in self._rows)

    def start_epoch(self, epoch: int) -> int:
        subs = [s for r in self._rows for s in r[0]]
        preds = [p for r in self._rows for p in r[1]]
        objs = [o for r in self._rows for o in r[2]]
        self._hi = np.asarray([self._ent2id[s] for s in subs], dtype=np.int64)
        self._ri = np.asarray([self._rel2id[p] for p in preds], dtype=np.int64)
        self._ti = np.asarray([self._ent2id[o] for o in objs], dtype=np.int64)
        self._ch, self._neg = _neg_indices(
            subs, preds, objs, len(self._ent2id), epoch
        )
        self._pos = 0
        return len(subs)

    def step(self, params: dict):
        if self._pos >= len(self._hi):
            return None
        lo, hi = self._pos, min(self._pos + self._batch_size, len(self._hi))
        self._pos = hi
        gE, gR, loss = transe_batch_grads(
            params["E"], params["R"],
            self._hi[lo:hi], self._ri[lo:hi], self._ti[lo:hi],
            self._ch[lo:hi], self._neg[lo:hi], self._margin,
        )
        return gE, gR, loss, hi - lo


def _vocab_from_triples(triples: "ray.data.Dataset") -> tuple[dict, dict]:
    """Entity/relation id maps via distributed distinct → sorted driver
    merge.  Bounded: the vocab is the entity universe, not corpus rows."""
    ents = sorted(
        set(triples.unique("subj")) | set(triples.unique("obj"))
    )
    rels = sorted(triples.unique("pred"))
    return (
        {e: i for i, e in enumerate(ents)},
        {r: i for i, r in enumerate(rels)},
    )


def train_transe(
    triples: "ray.data.Dataset",
    dim: int = 16,
    epochs: int = 5,
    lr: float = 0.05,
    margin: float = 1.0,
    batch_size: int = 256,
    n_workers: int = 2,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, dict, dict, list[dict]]:
    """→ (E, R, ent2id, rel2id, history).  history: one row per epoch."""
    ent2id, rel2id = _vocab_from_triples(triples)
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    E = rng.uniform(-bound, bound, size=(len(ent2id), dim))
    R = rng.uniform(-bound, bound, size=(len(rel2id), dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)

    # deterministic shard assignment: sort-free content split by crc32 of
    # the triple key — identical shards regardless of block layout
    def shard_of(batch: pa.Table) -> pa.Table:
        keys = [
            f"{s}\x00{p}\x00{o}"
            for s, p, o in zip(
                batch["subj"].to_pylist(),
                batch["pred"].to_pylist(),
                batch["obj"].to_pylist(),
            )
        ]
        sh = np.fromiter(
            (zlib.crc32(k.encode("utf-8")) % n_workers for k in keys),
            dtype=np.int64, count=len(keys),
        )
        return batch.append_column("shard", pa.array(sh))

    sharded = triples.map_batches(shard_of, batch_format="pyarrow").materialize()
    workers = [_TransEWorker.remote() for _ in range(n_workers)]
    loads = []
    for i, wk in enumerate(workers):
        shard = sharded.filter(
            expr=f"shard == {i}"
        ).select_columns(["subj", "pred", "obj"]).sort(["subj", "pred", "obj"])
        loads.append(wk.load.remote(shard, ent2id, rel2id, batch_size, margin))
    ray.get(loads)

    history: list[dict] = []
    for epoch in range(epochs):
        ray.get([wk.start_epoch.remote(epoch) for wk in workers])
        loss_sum, n_sum = 0.0, 0
        active = list(range(n_workers))
        params_ref = ray.put({"E": E, "R": R})
        while active:
            res = ray.get([workers[i].step.remote(params_ref) for i in active])
            live = [(i, r) for i, r in zip(active, res) if r is not None]
            active = [i for i, _ in live]
            if not live:
                break
            total_n = sum(r[3] for _, r in live)
            gE = sum(r[0] * r[3] for _, r in live) / total_n
            gR = sum(r[1] * r[3] for _, r in live) / total_n
            loss_sum += sum(r[2] * r[3] for _, r in live)
            n_sum += total_n
            E = E - lr * gE
            R = R - lr * gR
            # per-step entity renormalization (TransE algorithm line 5)
            E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            params_ref = ray.put({"E": E, "R": R})
        history.append(
            {
                "epoch": epoch,
                "mean_loss": loss_sum / max(n_sum, 1),
                "n_examples": n_sum,
            }
        )
    return E, R, ent2id, rel2id, history


def train_transe_serial(
    triples_df, dim=16, epochs=5, lr=0.05, margin=1.0, batch_size=256,
    seed=42, n_workers=2,
) -> tuple[np.ndarray, np.ndarray, dict, dict, list[dict]]:
    """Single-process twin of :func:`train_transe` for parity tests: same
    init, same content-derived shards/negatives, same worker-index-order
    averaging — bit-identical results without any Ray actors."""
    ents = sorted(set(triples_df["subj"]) | set(triples_df["obj"]))
    rels = sorted(set(triples_df["pred"]))
    ent2id = {e: i for i, e in enumerate(ents)}
    rel2id = {r: i for i, r in enumerate(rels)}
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    E = rng.uniform(-bound, bound, size=(len(ents), dim))
    R = rng.uniform(-bound, bound, size=(len(rels), dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)

    shards: list[list[tuple[str, str, str]]] = [[] for _ in range(n_workers)]
    for s, p, o in zip(
        triples_df["subj"], triples_df["pred"], triples_df["obj"]
    ):
        shards[zlib.crc32(f"{s}\x00{p}\x00{o}".encode()) % n_workers].append(
            (s, p, o)
        )
    shards = [sorted(sh) for sh in shards]

    history: list[dict] = []
    for epoch in range(epochs):
        state = []
        for sh in shards:
            subs = [t[0] for t in sh]
            preds = [t[1] for t in sh]
            objs = [t[2] for t in sh]
            hi = np.asarray([ent2id[s] for s in subs], dtype=np.int64)
            ri = np.asarray([rel2id[p] for p in preds], dtype=np.int64)
            ti = np.asarray([ent2id[o] for o in objs], dtype=np.int64)
            ch, neg = _neg_indices(subs, preds, objs, len(ents), epoch)
            state.append([hi, ri, ti, ch, neg, 0])
        loss_sum, n_sum = 0.0, 0
        while True:
            live = []
            for st in state:
                hi, ri, ti, ch, neg, pos = st
                if pos >= len(hi):
                    continue
                lo, hi_end = pos, min(pos + batch_size, len(hi))
                st[5] = hi_end
                gE, gR, loss = transe_batch_grads(
                    E, R, hi[lo:hi_end], ri[lo:hi_end], ti[lo:hi_end],
                    ch[lo:hi_end], neg[lo:hi_end], margin,
                )
                live.append((gE, gR, loss, hi_end - lo))
            if not live:
                break
            total_n = sum(r[3] for r in live)
            gE = sum(r[0] * r[3] for r in live) / total_n
            gR = sum(r[1] * r[3] for r in live) / total_n
            loss_sum += sum(r[2] * r[3] for r in live)
            n_sum += total_n
            E = E - lr * gE
            R = R - lr * gR
            E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        history.append(
            {
                "epoch": epoch,
                "mean_loss": loss_sum / max(n_sum, 1),
                "n_examples": n_sum,
            }
        )
    return E, R, ent2id, rel2id, history


def transe_linkpred_eval(
    triples: "ray.data.Dataset",
    E: np.ndarray, R: np.ndarray, ent2id: dict, rel2id: dict,
) -> dict:
    """Filtered link-prediction eval (tail ranking): MRR + hits@{1,3,10}.

    Distributed scoring: the embedding matrices and the (h, r) → true-tail
    filter dict (all entity-vocabulary-bounded) broadcast once via
    ``ray.put``; each batch ranks its triples' true tails against ALL
    entities vectorized (one matmul-shaped distance per batch) and emits
    integer partials; one tiny driver sum finishes.  Ranks use the
    standard filtered protocol: other known-true tails of the same (h, r)
    are excluded before ranking; ties rank optimistically by strict-less
    counting (deterministic — no RNG)."""
    # true-tail filter: bounded by the triple-key vocabulary
    true_tails: dict[tuple[int, int], set[int]] = {}
    for b in triples.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for s, p, o in zip(
            b["subj"].to_pylist(), b["pred"].to_pylist(), b["obj"].to_pylist()
        ):
            true_tails.setdefault(
                (ent2id[s], rel2id[p]), set()
            ).add(ent2id[o])
    state_ref = ray.put((E, R, ent2id, rel2id, true_tails))

    def score(batch: pa.Table) -> pa.Table:
        E_, R_, e2i, r2i, tt = ray.get(state_ref)
        hi = np.asarray([e2i[s] for s in batch["subj"].to_pylist()])
        ri = np.asarray([r2i[p] for p in batch["pred"].to_pylist()])
        ti = np.asarray([e2i[o] for o in batch["obj"].to_pylist()])
        # distances of EVERY entity as candidate tail: |batch| × |E|
        q = E_[hi] + R_[ri]
        d = (
            np.sum(q * q, axis=1, keepdims=True)
            - 2.0 * q @ E_.T
            + np.sum(E_ * E_, axis=1)[None, :]
        )
        ranks = np.empty(len(hi), dtype=np.int64)
        for j in range(len(hi)):
            row = d[j]
            mask = np.zeros(len(E_), dtype=bool)
            others = tt[(int(hi[j]), int(ri[j]))] - {int(ti[j])}
            if others:
                mask[list(others)] = True
            better = np.sum((row < row[ti[j]]) & ~mask)
            ranks[j] = better + 1
        return pa.table(
            {
                "n": pa.array([len(ranks)], type=pa.int64()),
                "rr_ppm_sum": pa.array(
                    [int(np.sum(1_000_000 // ranks))], type=pa.int64()
                ),
                "hits1": pa.array([int(np.sum(ranks <= 1))], type=pa.int64()),
                "hits3": pa.array([int(np.sum(ranks <= 3))], type=pa.int64()),
                "hits10": pa.array([int(np.sum(ranks <= 10))], type=pa.int64()),
            }
        )

    parts = triples.map_batches(score, batch_format="pyarrow").to_pandas()
    return {
        "n_triples": int(parts["n"].sum()),
        "mrr_ppm": int(parts["rr_ppm_sum"].sum() // max(parts["n"].sum(), 1)),
        "hits1": int(parts["hits1"].sum()),
        "hits3": int(parts["hits3"].sum()),
        "hits10": int(parts["hits10"].sum()),
    }


def kg_transe_linkpred(
    sf_dir: str, dim: int = 16, epochs: int = 5, seed: int = 42
) -> pa.Table:
    """Query surface: train TransE on the corpus triples, then the
    filtered tail-ranking link-prediction report (one row)."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    E, R, ent2id, rel2id, _ = train_transe(
        triples, dim=dim, epochs=epochs, seed=seed
    )
    m = transe_linkpred_eval(triples, E, R, ent2id, rel2id)
    return pa.table({k: pa.array([v], type=pa.int64()) for k, v in m.items()})


def kg_transe_report(
    sf_dir: str, dim: int = 16, epochs: int = 5, seed: int = 42
) -> pa.Table:
    """Query surface: per-epoch training report + final embedding health
    (mean entity norm must be 1.0 by construction; mean relation norm is
    free and shrinks toward translation consistency)."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    E, R, ent2id, rel2id, history = train_transe(
        kg_from_sf_dir(sf_dir), dim=dim, epochs=epochs, seed=seed
    )
    return pa.table(
        {
            "epoch": pa.array([h["epoch"] for h in history], type=pa.int64()),
            "mean_loss": pa.array(
                [h["mean_loss"] for h in history], type=pa.float64()
            ),
            "n_examples": pa.array(
                [h["n_examples"] for h in history], type=pa.int64()
            ),
            "n_entities": pa.array(
                [len(ent2id)] * len(history), type=pa.int64()
            ),
            "n_relations": pa.array(
                [len(rel2id)] * len(history), type=pa.int64()
            ),
            "mean_rel_norm": pa.array(
                [float(np.mean(np.linalg.norm(R, axis=1)))] * len(history),
                type=pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# kg_random_walks — deterministic DeepWalk-style walk corpus
# ---------------------------------------------------------------------------


def kg_random_walks(
    sf_dir: str, steps: int = 3, n_buckets: int = 64
) -> "ray.data.Dataset":
    """(walk_id, step, node): one ``steps``-hop walk started from every
    entity over the simple co-occurrence graph — the walk corpus a
    DeepWalk/node2vec embedding trainer consumes (Perozzi et al. 2014,
    public), with the "random" choice made ENGINE-REPRODUCIBLE: at step
    s from node v the walk takes the neighbor whose lexicographic rank
    is ``md5_number_lower(walk_id|s|v) mod degree(v)`` — the same
    md5-derived determinism the TransE negatives and hyperplane-LSH
    planes use, so the DuckDB twin replays the walks bit-exactly.

    Walks stop early at nodes with no co-occurrence edge (step 0 is
    always emitted).  Scale plan: each step is two bucketed equi-joins
    over walk-cardinality tables (degree attach, then the (node, rank)
    composite-key neighbor lookup); the neighbor ranking itself is one
    crc-bucketed sort per node — never a broadcast of the edge list."""
    import pandas as pd

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.graph import _graph_parts_ds
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.graphops import (
        _crc_bucket,
        attach_col,
        neighbors_ds,
    )
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    nodes, cooc = _graph_parts_ds(kg_from_sf_dir(sf_dir))
    nb = neighbors_ds(
        cooc.map_batches(
            lambda t: pa.table({"src": t["subj"], "dst": t["obj"]}),
            batch_format="pyarrow",
        ).union(
            cooc.map_batches(
                lambda t: pa.table({"src": t["obj"], "dst": t["subj"]}),
                batch_format="pyarrow",
            )
        ),
        n_buckets=n_buckets,
    ).materialize()

    def rank_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["e", "m"], kind="mergesort")
        r = g.groupby("e", sort=False).cumcount().to_numpy(dtype=np.int64)
        keys = [f"{e}\x00{i}" for e, i in zip(g["e"], r)]
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "m": pa.array(g["m"], type=pa.string()),
            }
        )

    ranked = (
        nb.map_batches(
            lambda t: t.append_column(
                "rbucket", pa.array(_crc_bucket(t["e"].to_pylist(), n_buckets))
            ),
            batch_format="pyarrow",
        )
        .groupby("rbucket")
        .map_groups(rank_group, batch_format="pandas")
        .materialize()
    )
    deg = bucketed_group_sum(
        nb.map_batches(lambda t: pa.table({"e": t["e"]}), batch_format="pyarrow"),
        keys=["e"],
        count_col="d",
        n_buckets=n_buckets,
    ).materialize()

    frontier = nodes.map_batches(
        lambda t: pa.table(
            {"walk_id": t["entity_id"], "node": t["entity_id"]}
        ),
        batch_format="pyarrow",
    )
    emitted = [
        frontier.map_batches(
            lambda t: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "step": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64)
                    ),
                    "node": t["node"],
                }
            ),
            batch_format="pyarrow",
        )
    ]
    for s in range(1, steps + 1):
        withd = attach_col(
            frontier, "node", deg, "e", "d", "d",
            n_buckets=n_buckets, how="inner",
        )

        def pick_key(t: pa.Table, _s=s) -> pa.Table:
            wids = t["walk_id"].to_pylist()
            vs = t["node"].to_pylist()
            d = np.asarray(t["d"], dtype=np.uint64)
            h = md5_number_lower_batch(
                [f"{w}|{_s}|{v}" for w, v in zip(wids, vs)]
            )
            idx = (h % d).astype(np.int64)
            keys = [f"{v}\x00{i}" for v, i in zip(vs, idx)]
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "key": pa.array(keys, type=pa.string()),
                }
            )

        keyed = withd.map_batches(pick_key, batch_format="pyarrow")
        nxt = attach_col(
            keyed, "key", ranked, "key", "m", "node",
            n_buckets=n_buckets, how="inner",
        )
        frontier = nxt.map_batches(
            lambda t: t.select(["walk_id", "node"]), batch_format="pyarrow"
        ).materialize()
        emitted.append(
            frontier.map_batches(
                lambda t, _s=s: pa.table(
                    {
                        "walk_id": t["walk_id"],
                        "step": pa.array(
                            np.full(t.num_rows, _s, dtype=np.int64)
                        ),
                        "node": t["node"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = emitted[0]
    for e in emitted[1:]:
        out = out.union(e)
    return out


def make_walks_sql(triples_sql: str, steps: int = 3) -> str:
    """Unrolled-CTE DuckDB twin of :func:`kg_random_walks` — DuckDB's
    ``md5_number_lower`` equals ``md5vec.md5_number_lower_batch`` and the
    rank join replays each step's neighbor choice exactly."""
    parts = [
        f"WITH t AS ({triples_sql})",
        "cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with')",
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in')",
        "nb AS (SELECT subj AS e, obj AS m FROM cooc"
        " UNION SELECT obj, subj FROM cooc)",
        "rk AS (SELECT e, m,"
        " row_number() OVER (PARTITION BY e ORDER BY m) - 1 AS r FROM nb)",
        "deg AS (SELECT e, count(*)::BIGINT AS d FROM nb GROUP BY e)",
        "w0 AS (SELECT entity_id AS walk_id, entity_id AS node FROM nodes)",
    ]
    for s in range(1, steps + 1):
        prev = f"w{s - 1}"
        parts.append(
            f"w{s} AS (SELECT w.walk_id, rk.m AS node"
            f" FROM {prev} w"
            f" JOIN deg ON deg.e = w.node"
            f" JOIN rk ON rk.e = w.node AND rk.r ="
            f" (md5_number_lower(w.walk_id || '|{s}|' || w.node)"
            f" % deg.d::UBIGINT)::BIGINT)"
        )
    selects = [
        f"SELECT walk_id, {s}::BIGINT AS step, node FROM w{s}"
        for s in range(0, steps + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)




# ---------------------------------------------------------------------------
# node2vec_walks — second-order (p/q-biased) deterministic walks
# ---------------------------------------------------------------------------


def node2vec_walks(
    sf_dir: str,
    steps: int = 3,
    w_return: int = 1,
    w_common: int = 4,
    w_out: int = 2,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Second-order biased walks (node2vec, Grover & Leskovec 2016,
    public): from node v arrived-from u, candidate neighbor w weighs
    ``w_return`` if w == u (1/p), ``w_common`` if w also neighbors u
    (distance 1) and ``w_out`` otherwise (1/q) — integer weights so the
    cumulative-weight pick is exact.  The pick replays
    ``md5_number_lower(walk|step|prev|cur) mod total_weight`` against the
    lexicographically-ordered candidates' running sum, making the walks
    engine-reproducible like :func:`kg_random_walks` (whose first-order
    uniform rule this generalizes; step 1 has no prev and is uniform
    with hash ``walk|1|cur``).

    Scale plan: per step, ONE bucketed co-location expands each frontier
    row to its candidate set (cost = frontier degree sum, inherent to
    node2vec), one more flags prev-adjacency against the edge-key set,
    and the cumulative pick runs inside the walk's hash bucket.  All
    tables are walk- or edge-cardinality."""
    import pandas as pd

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.graph import _graph_parts_ds
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.graphops import _crc_bucket, neighbors_ds

    nodes, cooc = _graph_parts_ds(kg_from_sf_dir(sf_dir))
    nb = neighbors_ds(
        cooc.map_batches(
            lambda t: pa.table({"src": t["subj"], "dst": t["obj"]}),
            batch_format="pyarrow",
        ).union(
            cooc.map_batches(
                lambda t: pa.table({"src": t["obj"], "dst": t["subj"]}),
                batch_format="pyarrow",
            )
        ),
        n_buckets=n_buckets,
    ).materialize()

    def _expand(frontier: "ray.data.Dataset") -> "ray.data.Dataset":
        """frontier (walk_id, prev, cur) × nb on cur — bucketed m:n join."""

        def tag_f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "prev": t["prev"],
                    "cur": t["cur"],
                    "m": pa.nulls(t.num_rows, type=pa.string()),
                    "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                    "jbucket": pa.array(
                        _crc_bucket(t["cur"].to_pylist(), n_buckets)
                    ),
                }
            )

        def tag_nb(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "walk_id": pa.nulls(n, type=pa.string()),
                    "prev": pa.nulls(n, type=pa.string()),
                    "cur": t["e"],
                    "m": t["m"],
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                    "jbucket": pa.array(
                        _crc_bucket(t["e"].to_pylist(), n_buckets)
                    ),
                }
            )

        def join(g: pd.DataFrame) -> pa.Table:
            f = g[g["kind"] == 0][["walk_id", "prev", "cur"]]
            r = g[g["kind"] == 1][["cur", "m"]]
            out = f.merge(r, on="cur")
            return pa.table(
                {
                    "walk_id": pa.array(out["walk_id"], type=pa.string()),
                    "prev": pa.array(out["prev"], type=pa.string()),
                    "cur": pa.array(out["cur"], type=pa.string()),
                    "cand": pa.array(out["m"], type=pa.string()),
                }
            )

        return (
            frontier.map_batches(tag_f, batch_format="pyarrow")
            .union(nb.map_batches(tag_nb, batch_format="pyarrow"))
            .groupby("jbucket")
            .map_groups(join, batch_format="pandas")
        )

    def _flag_common(cands: "ray.data.Dataset") -> "ray.data.Dataset":
        """Append is_common: does edge (prev, cand) exist? Bucketed
        semi-join against the edge-key set."""

        def tag_c(t: pa.Table) -> pa.Table:
            keys = [
                f"{p}\x00{c}" if p is not None else ""
                for p, c in zip(
                    t["prev"].to_pylist(), t["cand"].to_pylist()
                )
            ]
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "prev": t["prev"],
                    "cur": t["cur"],
                    "cand": t["cand"],
                    "ekey": pa.array(keys, type=pa.string()),
                    "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                    "jbucket": pa.array(_crc_bucket(keys, n_buckets)),
                }
            )

        def tag_e(t: pa.Table) -> pa.Table:
            keys = [
                f"{e}\x00{m}"
                for e, m in zip(t["e"].to_pylist(), t["m"].to_pylist())
            ]
            n = t.num_rows
            return pa.table(
                {
                    "walk_id": pa.nulls(n, type=pa.string()),
                    "prev": pa.nulls(n, type=pa.string()),
                    "cur": pa.nulls(n, type=pa.string()),
                    "cand": pa.nulls(n, type=pa.string()),
                    "ekey": pa.array(keys, type=pa.string()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                    "jbucket": pa.array(_crc_bucket(keys, n_buckets)),
                }
            )

        def join(g: pd.DataFrame) -> pa.Table:
            c = g[g["kind"] == 0]
            keys = set(g.loc[g["kind"] == 1, "ekey"])
            flag = c["ekey"].isin(keys).to_numpy()
            return pa.table(
                {
                    "walk_id": pa.array(c["walk_id"], type=pa.string()),
                    "prev": pa.array(c["prev"], type=pa.string()),
                    "cur": pa.array(c["cur"], type=pa.string()),
                    "cand": pa.array(c["cand"], type=pa.string()),
                    "is_common": pa.array(flag),
                }
            )

        return (
            cands.map_batches(tag_c, batch_format="pyarrow")
            .union(nb.map_batches(tag_e, batch_format="pyarrow"))
            .groupby("jbucket")
            .map_groups(join, batch_format="pandas")
        )

    def _pick(cands: "ray.data.Dataset", step: int) -> "ray.data.Dataset":
        def choose(g: pd.DataFrame, _s=step) -> pa.Table:
            outs = {"walk_id": [], "prev": [], "cur": []}
            g = g.sort_values(["walk_id", "cand"], kind="mergesort")
            for wid, sub in g.groupby("walk_id", sort=False):
                prev = sub["prev"].iloc[0]
                cur = sub["cur"].iloc[0]
                if _s == 1:
                    wt = np.ones(len(sub), dtype=np.int64)
                    hkey = f"{wid}|1|{cur}"
                else:
                    wt = np.where(
                        sub["cand"].to_numpy() == prev,
                        w_return,
                        np.where(sub["is_common"].to_numpy(), w_common, w_out),
                    ).astype(np.int64)
                    hkey = f"{wid}|{_s}|{prev}|{cur}"
                cw = np.cumsum(wt)
                r = int(md5_number_lower_batch([hkey])[0] % np.uint64(cw[-1]))
                j = int(np.searchsorted(cw, r, side="right"))
                outs["walk_id"].append(wid)
                outs["prev"].append(cur)
                outs["cur"].append(sub["cand"].iloc[j])
            return pa.table(
                {
                    "walk_id": pa.array(outs["walk_id"], type=pa.string()),
                    "prev": pa.array(outs["prev"], type=pa.string()),
                    "cur": pa.array(outs["cur"], type=pa.string()),
                }
            )

        return (
            cands.map_batches(
                lambda t: t.append_column(
                    "wbucket",
                    pa.array(_crc_bucket(t["walk_id"].to_pylist(), n_buckets)),
                ),
                batch_format="pyarrow",
            )
            .groupby("wbucket")
            .map_groups(choose, batch_format="pandas")
        )

    frontier = nodes.map_batches(
        lambda t: pa.table(
            {
                "walk_id": t["entity_id"],
                "prev": pa.nulls(t.num_rows, type=pa.string()),
                "cur": t["entity_id"],
            }
        ),
        batch_format="pyarrow",
    )
    emitted = [
        frontier.map_batches(
            lambda t: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "step": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                    "node": t["cur"],
                }
            ),
            batch_format="pyarrow",
        )
    ]
    for s in range(1, steps + 1):
        cands = _expand(frontier)
        if s > 1:
            cands = _flag_common(cands)
        frontier = _pick(cands, s).materialize()
        emitted.append(
            frontier.map_batches(
                lambda t, _s=s: pa.table(
                    {
                        "walk_id": t["walk_id"],
                        "step": pa.array(
                            np.full(t.num_rows, _s, dtype=np.int64)
                        ),
                        "node": t["cur"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = emitted[0]
    for e in emitted[1:]:
        out = out.union(e)
    return out


def make_node2vec_sql(
    triples_sql: str,
    steps: int = 3,
    w_return: int = 1,
    w_common: int = 4,
    w_out: int = 2,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`node2vec_walks` — the
    cumulative-weight pick is a window running sum over the
    lexicographically-ordered candidates, selected where
    ``cw − wt ≤ md5 mod total < cw``."""
    parts = [
        f"WITH t AS ({triples_sql})",
        "cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with')",
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in')",
        "nb AS (SELECT subj AS e, obj AS m FROM cooc"
        " UNION SELECT obj, subj FROM cooc)",
        "f0 AS (SELECT entity_id AS walk_id, CAST(NULL AS VARCHAR) AS prev,"
        " entity_id AS cur FROM nodes)",
    ]
    for s in range(1, steps + 1):
        prev = f"f{s - 1}"
        if s == 1:
            wt = "1"
            hkey = f"w.walk_id || '|1|' || w.cur"
        else:
            wt = (
                f"CASE WHEN nb.m = w.prev THEN {w_return}"
                f" WHEN e2.m IS NOT NULL THEN {w_common}"
                f" ELSE {w_out} END"
            )
            hkey = f"w.walk_id || '|{s}|' || w.prev || '|' || w.cur"
        ljoin = (
            "" if s == 1
            else " LEFT JOIN nb e2 ON e2.e = w.prev AND e2.m = nb.m"
        )
        parts.append(
            f"c{s} AS (SELECT w.walk_id, w.prev, w.cur, nb.m AS cand,"
            f" ({wt})::BIGINT AS wt, {hkey} AS hkey"
            f" FROM {prev} w JOIN nb ON nb.e = w.cur{ljoin})"
        )
        parts.append(
            f"x{s} AS (SELECT *,"
            f" sum(wt) OVER (PARTITION BY walk_id ORDER BY cand"
            f" ROWS UNBOUNDED PRECEDING) AS cw,"
            f" sum(wt) OVER (PARTITION BY walk_id) AS tw FROM c{s})"
        )
        parts.append(
            f"f{s} AS (SELECT walk_id, cur AS prev, cand AS cur FROM x{s}"
            f" WHERE (md5_number_lower(hkey) % tw::UBIGINT)::BIGINT >= cw - wt"
            f" AND (md5_number_lower(hkey) % tw::UBIGINT)::BIGINT < cw)"
        )
    selects = [
        f"SELECT walk_id, {s}::BIGINT AS step, cur AS node FROM f{s}"
        for s in range(0, steps + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)




def walk_skipgram_pairs(
    sf_dir: str, steps: int = 3, window: int = 2, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Skip-gram training pairs from the walk corpus: (center, context,
    n) for walk positions within ``window`` of each other (direction
    collapsed by the usual skip-gram symmetry; self-pairs where a walk
    revisits a node are kept — they are real co-visits).  The
    pair-extraction step between :func:`kg_random_walks` and an SGNS
    trainer.

    Plan: walks co-locate by walk hash bucket (each walk is ≤ steps+1
    rows), pairs expand vectorized per bucket, then one bounded group
    sum."""
    import pandas as pd

    from ner_funtool_ray.stages.graphops import _crc_bucket
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    walks = kg_random_walks(sf_dir, steps=steps, n_buckets=n_buckets)

    def expand(g: pd.DataFrame, _w=window) -> pa.Table:
        g = g.sort_values(["walk_id", "step"], kind="mergesort")
        m = g.merge(g, on="walk_id", suffixes=("_a", "_b"))
        d = m["step_b"] - m["step_a"]
        m = m[(d >= 1) & (d <= _w)]
        return pa.table(
            {
                "center": pa.array(m["node_a"], type=pa.string()),
                "context": pa.array(m["node_b"], type=pa.string()),
            }
        )

    pairs = (
        walks.map_batches(
            lambda t: t.append_column(
                "wbucket",
                pa.array(_crc_bucket(t["walk_id"].to_pylist(), n_buckets)),
            ),
            batch_format="pyarrow",
        )
        .groupby("wbucket")
        .map_groups(expand, batch_format="pandas")
    )
    out = bucketed_group_sum(
        pairs, keys=["center", "context"], count_col="n", n_buckets=n_buckets
    )
    return out.select_columns(["center", "context", "n"])


def make_skipgram_sql(triples_sql: str, steps: int = 3, window: int = 2) -> str:
    """DuckDB twin of :func:`walk_skipgram_pairs` — the walk twin
    self-joined on walk_id with a step-distance band."""
    walks = make_walks_sql(triples_sql, steps=steps)
    return f"""
WITH w AS (SELECT * FROM ({walks}) q)
SELECT a.node AS center, b.node AS context, count(*)::BIGINT AS n
FROM w a JOIN w b ON a.walk_id = b.walk_id
WHERE b.step - a.step BETWEEN 1 AND {window}
GROUP BY 1, 2
"""




# ---------------------------------------------------------------------------
# SGNS (DeepWalk) trainer over the walk-pair table
# ---------------------------------------------------------------------------


def _sgns_negatives(
    centers: list[str], contexts: list[str], n_vocab: int, epoch: int, k: int
) -> np.ndarray:
    """Content-derived negative context ids, shape (n_pairs, k) — crc32 of
    (center, context, epoch, j), identical across processes/shards."""
    out = np.empty((len(centers), k), dtype=np.int64)
    for i, (c, x) in enumerate(zip(centers, contexts)):
        for j in range(k):
            out[i, j] = (
                zlib.crc32(f"{c}\x00{x}\x00{epoch}\x00{j}".encode("utf-8"))
                % n_vocab
            )
    return out


def sgns_shard_grads(
    W: np.ndarray, C: np.ndarray,
    ci: np.ndarray, xi: np.ndarray, n: np.ndarray, neg: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, float, int]:
    """Full-shard skip-gram-negative-sampling gradients (vectorized).

    Loss per pair (weight n): −n·[log σ(w·c) + Σⱼ log σ(−w·cⱼ⁻)];
    returns SUMS (grads and loss) plus the total weight so shard
    averaging composes exactly."""
    w = W[ci]
    c = C[xi]
    s_pos = 1.0 / (1.0 + np.exp(-(w * c).sum(axis=1)))
    coef_pos = (s_pos - 1.0) * n
    gW = np.zeros_like(W)
    gC = np.zeros_like(C)
    np.add.at(gW, ci, coef_pos[:, None] * c)
    np.add.at(gC, xi, coef_pos[:, None] * w)
    loss = float(-(n * np.log(np.maximum(s_pos, 1e-12))).sum())
    for j in range(neg.shape[1]):
        cn = C[neg[:, j]]
        s_neg = 1.0 / (1.0 + np.exp(-(w * cn).sum(axis=1)))
        coef = s_neg * n
        np.add.at(gW, ci, coef[:, None] * cn)
        np.add.at(gC, neg[:, j], coef[:, None] * w)
        loss += float(-(n * np.log(np.maximum(1.0 - s_neg, 1e-12))).sum())
    return gW, gC, loss, int(n.sum())


@ray.remote(num_cpus=0)
class _SgnsWorker:
    """Zero-CPU gradient worker (same phase-alternation rationale as
    _TransEWorker)."""

    def load(self, shard: "ray.data.Dataset", vocab: dict) -> int:
        cs: list[str] = []
        xs: list[str] = []
        ns: list[int] = []
        for b in shard.iter_batches(batch_size=4096, batch_format="pyarrow"):
            cs.extend(b["center"].to_pylist())
            xs.extend(b["context"].to_pylist())
            ns.extend(b["n"].to_pylist())
        order = sorted(range(len(cs)), key=lambda i: (cs[i], xs[i]))
        self._c = [cs[i] for i in order]
        self._x = [xs[i] for i in order]
        self._ci = np.asarray([vocab[c] for c in self._c], dtype=np.int64)
        self._xi = np.asarray([vocab[x] for x in self._x], dtype=np.int64)
        self._n = np.asarray([ns[i] for i in order], dtype=np.float64)
        self._nv = len(vocab)
        return len(self._c)

    def epoch_grads(self, params: dict, epoch: int, k: int):
        if not len(self._ci):
            return None
        neg = _sgns_negatives(self._c, self._x, self._nv, epoch, k)
        return sgns_shard_grads(
            params["W"], params["C"], self._ci, self._xi, self._n, neg
        )


def train_deepwalk(
    pairs: "ray.data.Dataset",
    dim: int = 16,
    epochs: int = 5,
    lr: float = 0.1,
    k_neg: int = 3,
    n_workers: int = 2,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, dict, list[dict]]:
    """DeepWalk = skip-gram with negative sampling over the walk-pair
    table (Perozzi et al. 2014 / Mikolov et al. 2013, public): full-batch
    gradient per epoch over crc-sharded pairs, worker sums merged in
    worker-index order — Ray-vs-serial BIT-EXACT like
    ``train_transe``.  The pair table is entity-vocabulary²-bounded, so
    full-batch is exact, cheap and deterministic."""
    cents = sorted(set(pairs.unique("center")) | set(pairs.unique("context")))
    vocab = {e: i for i, e in enumerate(cents)}
    rng = np.random.default_rng(seed)
    bound = 0.5 / dim
    W = rng.uniform(-bound, bound, size=(len(vocab), dim))
    C = rng.uniform(-bound, bound, size=(len(vocab), dim))

    def shard_of(batch: pa.Table) -> pa.Table:
        keys = [
            f"{c}\x00{x}"
            for c, x in zip(
                batch["center"].to_pylist(), batch["context"].to_pylist()
            )
        ]
        sh = np.fromiter(
            (zlib.crc32(kk.encode("utf-8")) % n_workers for kk in keys),
            dtype=np.int64, count=len(keys),
        )
        return batch.append_column("shard", pa.array(sh))

    sharded = pairs.map_batches(shard_of, batch_format="pyarrow").materialize()
    workers = [_SgnsWorker.remote() for _ in range(n_workers)]
    ray.get(
        [
            wk.load.remote(
                sharded.filter(expr=f"shard == {i}").select_columns(
                    ["center", "context", "n"]
                ),
                vocab,
            )
            for i, wk in enumerate(workers)
        ]
    )

    history: list[dict] = []
    for epoch in range(epochs):
        params_ref = ray.put({"W": W, "C": C})
        res = ray.get(
            [wk.epoch_grads.remote(params_ref, epoch, k_neg) for wk in workers]
        )
        live = [r for r in res if r is not None]
        total = sum(r[3] for r in live)
        gW = sum(r[0] for r in live) / total
        gC = sum(r[1] for r in live) / total
        loss = sum(r[2] for r in live) / total
        W = W - lr * gW
        C = C - lr * gC
        history.append({"epoch": epoch, "mean_loss": loss, "n_weight": total})
    return W, C, vocab, history


def train_deepwalk_serial(
    pairs_df, dim=16, epochs=5, lr=0.1, k_neg=3, n_workers=2, seed=42
) -> tuple[np.ndarray, np.ndarray, dict, list[dict]]:
    """Single-process twin of :func:`train_deepwalk` — same init, shards,
    negatives and merge order; bit-identical without Ray actors."""
    cents = sorted(set(pairs_df["center"]) | set(pairs_df["context"]))
    vocab = {e: i for i, e in enumerate(cents)}
    rng = np.random.default_rng(seed)
    bound = 0.5 / dim
    W = rng.uniform(-bound, bound, size=(len(vocab), dim))
    C = rng.uniform(-bound, bound, size=(len(vocab), dim))

    shards: list[list[tuple[str, str, int]]] = [[] for _ in range(n_workers)]
    for c, x, n in zip(pairs_df["center"], pairs_df["context"], pairs_df["n"]):
        shards[zlib.crc32(f"{c}\x00{x}".encode()) % n_workers].append(
            (c, x, int(n))
        )
    shards = [sorted(sh) for sh in shards]

    history: list[dict] = []
    for epoch in range(epochs):
        live = []
        for sh in shards:
            if not sh:
                continue
            cs = [t[0] for t in sh]
            xs = [t[1] for t in sh]
            ci = np.asarray([vocab[c] for c in cs], dtype=np.int64)
            xi = np.asarray([vocab[x] for x in xs], dtype=np.int64)
            n = np.asarray([t[2] for t in sh], dtype=np.float64)
            neg = _sgns_negatives(cs, xs, len(vocab), epoch, k_neg)
            live.append(sgns_shard_grads(W, C, ci, xi, n, neg))
        total = sum(r[3] for r in live)
        gW = sum(r[0] for r in live) / total
        gC = sum(r[1] for r in live) / total
        loss = sum(r[2] for r in live) / total
        W = W - lr * gW
        C = C - lr * gC
        history.append({"epoch": epoch, "mean_loss": loss, "n_weight": total})
    return W, C, vocab, history


def kg_deepwalk_report(
    sf_dir: str, dim: int = 16, epochs: int = 5
) -> pa.Table:
    """Query surface (rows-only — weight evolution is not
    SQL-expressible): per-epoch mean SGNS loss over the engine's own walk
    pairs, plus vocab size and final mean embedding norm.  Loss must
    DECREASE across epochs (asserted in tests)."""
    pairs = walk_skipgram_pairs(sf_dir, steps=3, window=2)
    W, C, vocab, history = train_deepwalk(pairs, dim=dim, epochs=epochs)
    return pa.table(
        {
            "epoch": pa.array([h["epoch"] for h in history], type=pa.int64()),
            "mean_loss": pa.array(
                [h["mean_loss"] for h in history], type=pa.float64()
            ),
            "n_weight": pa.array(
                [h["n_weight"] for h in history], type=pa.int64()
            ),
            "n_vocab": pa.array(
                [len(vocab)] * len(history), type=pa.int64()
            ),
            "mean_w_norm": pa.array(
                [float(np.linalg.norm(W, axis=1).mean())] * len(history),
                type=pa.float64(),
            ),
        }
    )


__all__ = ["train_transe", "train_transe_serial", "transe_linkpred_eval", "kg_transe_report", "kg_random_walks", "make_walks_sql", "node2vec_walks", "make_node2vec_sql", "walk_skipgram_pairs", "make_skipgram_sql", "train_deepwalk", "train_deepwalk_serial", "kg_deepwalk_report", "sgns_shard_grads"]
