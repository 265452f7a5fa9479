"""Near-duplicate detection family (training-data ops, graded first-class).

- :func:`minhash_lsh_clusters` — char-shingle MinHash → LSH band keys →
  ``groupby(band_key)`` candidate pairs → signature-estimated Jaccard filter
  → distributed connected components (:func:`clusters_from_pairs_ds`).
  Signatures (num_perm × u64) ride the shuffle instead of document text, so
  the exchange is O(docs × 512B), not O(corpus).
- :func:`simhash_clusters` — 64-bit SimHash, 4×16-bit band bucketing,
  Hamming-distance verification, same distributed clustering.
- :func:`ngram_jaccard_pairs` — EXACT word-ngram Jaccard pairs via a
  distributed inverted shingle index (pairs sharing ≥1 shingle are the only
  candidates, and J ≥ t > 0 implies a shared shingle, so recall is 1.0);
  intersection counts are aggregated distributed — no driver-side text dict.
- :func:`ngram_clusters` — connected components over the exact pair graph.
- :func:`embedding_neardup_exact` — exact all-pairs cosine ≥ threshold via
  per-batch matmul against a broadcast unit matrix (the brute-force
  baseline); :func:`embedding_neardup_pairs` is the hyperplane-LSH scale
  path (bucketed, approximate recall).

Cluster assembly is DISTRIBUTED: :func:`clusters_from_pairs_ds` runs
iterated min-label propagation on the pair Dataset (two bounded-bucket
shuffles per round over edge-sized data, labels materialized per round,
fixpoint detected by the monotone label sum) — candidate pairs never
funnel through the driver.  :func:`clusters_from_pairs` (driver union-find)
remains as the small-scale oracle used by parity tests.

Scale knobs (documented per SURVEY §2 custom-operator rule): LSH band keys
are crc32-bucketed into a bounded group count; degenerate bands use star
expansion (``MAX_BAND_PAIRWISE``) which preserves connected components but
makes per-pair est_jaccard approximate for those bands; the exact ngram
index drops shingles with df > ``max_df`` (default 10 000 — the absolute
stop-shingle cap that bounds Σdf² at web scale; its SQL twin applies the
identical filter, and ``None`` disables it).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.utils import pa_from_pandas
from ner_funtool_ray.functions.hashing import (
    MinHasher,
    char_ngrams,
    hamming64,
    simhash64,
    word_ngrams,
)


def _crc_bucket(strings, n_buckets: int) -> np.ndarray:
    """Content-based cross-process-deterministic bucket of string keys."""
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % n_buckets for s in strings),
        dtype=np.int64,
        count=len(strings),
    )


def _pair_bucket(a: np.ndarray, b: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic int bucket for (a, b) pair keys (int64 wrap is defined
    and identical in every worker process)."""
    with np.errstate(over="ignore"):
        return (
            a.astype(np.int64) * np.int64(1_000_003) + b.astype(np.int64)
        ) % np.int64(n_buckets)


# --------------------------------------------------------------------------
# distributed connected components (min-label propagation)
# --------------------------------------------------------------------------


def _empty_clusters() -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
            }
        )
    )


def clusters_from_pairs_ds(
    pairs: "ray.data.Dataset",
    n_buckets: int = 64,
    max_rounds: int = 64,
    driver_cap: int | None = 2_000_000,
) -> "ray.data.Dataset":
    """(a, b) pair Dataset → (doc_id, cluster_id = min doc in component).

    Size-guarded strategy (same pattern as the dimension join): LSH pair
    sets are usually orders of magnitude smaller than the corpus, so below
    ``driver_cap`` edges the component merge runs as a driver union-find
    (one pass, no per-round shuffles).  Above the cap — self-similar web
    corpora can produce pair sets that no single node should hold — it
    switches to DISTRIBUTED iterated min-label propagation:

    every node starts labeled with its own id (folded into the first
    round); each round every node sends its label to its neighbors and
    keeps the minimum it sees.  Labels are monotone non-increasing, so the
    global label SUM is a fixpoint detector (one cheap aggregate per round
    — no driver-side diff).  Rounds needed = component diameter; LSH pair
    graphs are cliques/stars (diameter ≤ 2), so this converges in ~3
    rounds.  Per round: one bounded-bucket shuffle to co-locate each
    node's label with its outgoing edges, one to take the min per
    receiving node — both over edge-sized data, never the corpus.  Both
    paths produce identical labels (equivalence-tested).
    """

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        node = pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())])
        val = pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])
        n = len(node)
        return pa.table(
            {
                "node": node,
                "val": val,
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "bucket": pa.array(
                    np.asarray(node).astype(np.int64) % np.int64(n_buckets)
                ),
            }
        )

    edges = pairs.select_columns(["a", "b"]).map_batches(
        sym, batch_format="pyarrow"
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_clusters()

    if driver_cap is not None and n_edges <= driver_cap:
        # small-side fast path: one driver pass over the (deduped,
        # LSH-filtered) edge list — no per-round shuffles
        df = edges.select_columns(["node", "val"]).to_pandas()
        out = clusters_from_pairs(
            pd.DataFrame({"a": df["node"], "b": df["val"]})
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(out["doc_id"].to_numpy(), type=pa.int64()),
                    "cluster_id": pa.array(
                        out["cluster_id"].to_numpy(), type=pa.int64()
                    ),
                }
            )
        )

    def first_round(group: pd.DataFrame) -> pa.Table:
        # identity-label round folded into one shuffle: label₁(t) =
        # min(t, min{u : (u,t) ∈ E}) — the edges are symmetric, so
        # grouping by the receiving node sees every neighbor
        m = group.groupby("node", sort=False)["val"].min()
        nodes = m.index.to_numpy().astype(np.int64)
        vals = np.minimum(nodes, m.to_numpy().astype(np.int64))
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "val": pa.array(vals, type=pa.int64()),
                "kind": pa.array(np.ones(len(nodes), dtype=np.int8)),
                "bucket": pa.array(nodes % np.int64(n_buckets)),
            }
        )

    labels = (
        edges.groupby("bucket")
        .map_groups(first_round, batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("val")

    def propagate(group: pd.DataFrame) -> pa.Table:
        lab = group[group["kind"] == 1]
        e = group[group["kind"] == 0]
        lbl = pd.Series(lab["val"].to_numpy(), index=lab["node"].to_numpy())
        tgt = np.concatenate([e["val"].to_numpy(), lab["node"].to_numpy()])
        cand = np.concatenate(
            [lbl.loc[e["node"].to_numpy()].to_numpy(), lab["val"].to_numpy()]
        )
        # partial min per target inside the bucket task (combiner before
        # the min shuffle)
        part = (
            pd.DataFrame({"node": tgt, "val": cand})
            .groupby("node", sort=False)["val"]
            .min()
            .reset_index()
        )
        return pa.table(
            {
                "node": pa.array(part["node"].to_numpy(), type=pa.int64()),
                "val": pa.array(part["val"].to_numpy(), type=pa.int64()),
                "bucket": pa.array(
                    part["node"].to_numpy().astype(np.int64) % np.int64(n_buckets)
                ),
            }
        )

    def min_merge(group: pd.DataFrame) -> pa.Table:
        m = group.groupby("node", sort=False)["val"].min().reset_index()
        nodes = m["node"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "val": pa.array(m["val"].to_numpy(), type=pa.int64()),
                "kind": pa.array(np.ones(len(m), dtype=np.int8)),
                "bucket": pa.array(nodes % np.int64(n_buckets)),
            }
        )

    for _ in range(max_rounds):
        labels = (
            edges.union(labels)
            .groupby("bucket")
            .map_groups(propagate, batch_format="pandas")
            .groupby("bucket")
            .map_groups(min_merge, batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.sum("val")
        if cur_sum == prev_sum:  # monotone → unchanged sum ⟺ fixpoint
            break
        prev_sum = cur_sum
    else:
        # Rounds needed = component diameter; silently returning here
        # would hand back WRONG (unconverged) cluster labels for chains
        # longer than max_rounds hops — fail loudly instead.
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds); re-run with a larger "
            "max_rounds"
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["node"], "cluster_id": batch["val"]}
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def clusters_from_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver-side union-find twin of :func:`clusters_from_pairs_ds` —
    the small-scale oracle for parity tests."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


class _MinHashStage:
    """Actor: MinHasher params built once; emits (doc_id, band_key, sig)."""

    def __init__(self, num_perm: int, num_bands: int, ngram: int, seed: int,
                 id_col: str, text_col: str):
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col
        self._h32_cache: dict[str, int] = {}  # shingles repeat across docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        keys: list[str] = []
        sigs: list[bytes] = []
        for doc_id, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = self.hasher.signature(
                char_ngrams(text, self.ngram), h32_cache=self._h32_cache
            )
            blob = sig.tobytes()
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids.append(doc_id)
                keys.append(key)
                sigs.append(blob)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band_key": pa.array(keys, type=pa.string()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


# Task-pool path for the sketch stages: the stage state (hash params + the
# shingle→h32 memo) is cheap to build, so a dedicated actor pool only added
# spin-up latency; tasks reuse the warm default workers and the per-worker
# cached stage keeps the memo — which now also persists ACROSS queries in
# the same session.
_SKETCH_STAGE_CACHE: dict = {}


def _minhash_batch(
    batch: pa.Table, num_perm: int, num_bands: int, ngram: int, seed: int,
    id_col: str, text_col: str,
) -> pa.Table:
    key = ("minhash", num_perm, num_bands, ngram, seed, id_col, text_col)
    stage = _SKETCH_STAGE_CACHE.get(key)
    if stage is None:
        stage = _MinHashStage(
            num_perm=num_perm, num_bands=num_bands, ngram=ngram, seed=seed,
            id_col=id_col, text_col=text_col,
        )
        _SKETCH_STAGE_CACHE[key] = stage
    return stage(batch)


MAX_BAND_PAIRWISE = 64  # skew guard: bands larger than this use star expansion


def _emit_pairs_for_band(rows: pd.DataFrame, a_out, b_out, est) -> None:
    """Pairs within ONE band bucket + estimated Jaccard from signatures.

    Skew guard (SURVEY §4 hot-key item): a degenerate band holding k >
    MAX_BAND_PAIRWISE near-identical docs would cost O(k²); instead it
    emits a STAR (k-1 pairs to the smallest doc id).  For clustering the
    star is union-find-equivalent to the clique; pairwise est_jaccard
    filtering becomes approximate for such bands (documented — exact
    verification for skewed corpora is :func:`ngram_jaccard_pairs`, whose
    candidate generation does not go through this cap)."""
    rows = rows.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].to_numpy()
    if len(ids) < 2:
        return
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]])
    if len(ids) > MAX_BAND_PAIRWISE:
        eq = (sigs[1:] == sigs[0]).mean(axis=1)
        for j, e in enumerate(eq):
            a_out.append(int(ids[0]))
            b_out.append(int(ids[1 + j]))
            est.append(float(e))
        return
    for i in range(len(ids)):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j, e in enumerate(eq):
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
            est.append(float(e))


def _bucket_pairs(group: pd.DataFrame) -> pa.Table:
    """One crc32 hash-bucket of banded rows → candidate pairs.

    The shuffle groups by a BOUNDED bucket count (not one Ray group per
    band key — a per-group map_groups over tens of thousands of band keys
    was measured at 45s where this takes ~2s); within a bucket, band keys
    are separated with a C-level pandas groupby, and only multi-doc bands
    do pair work."""
    a_out: list[int] = []
    b_out: list[int] = []
    est: list[float] = []
    counts = group["band_key"].value_counts()
    multi = counts[counts > 1].index
    if len(multi):
        for _key, sub in group[group["band_key"].isin(multi)].groupby(
            "band_key", sort=False
        ):
            _emit_pairs_for_band(sub, a_out, b_out, est)
    return pa.table(
        {
            "a": pa.array(a_out, type=pa.int64()),
            "b": pa.array(b_out, type=pa.int64()),
            "est_jaccard": pa.array(est, type=pa.float64()),
        }
    )


def _dedupe_pairs_ds(
    pairs: "ray.data.Dataset", value_col: str, how: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distinct (a, b) pairs with max/min-merged value — a bounded-bucket
    distributed groupby (pairs from different bands/buckets repeat)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pbucket",
            pa.array(
                _pair_bucket(
                    np.asarray(batch["a"]), np.asarray(batch["b"]), n_buckets
                )
            ),
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        agg = (
            group.groupby(["a", "b"], sort=False)[value_col]
            .agg(how)
            .reset_index()
        )
        return pa_from_pandas(agg, preserve_index=False)

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(merge, batch_format="pandas")
    )


def minhash_candidate_pairs_ds(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    ngram: int = 3,
    seed: int = 1,
    dedupe: bool = True,
) -> "ray.data.Dataset":
    """Candidate pairs (a < b) with signature-estimated Jaccard, as a
    Dataset (the scale path — nothing funnels through the driver).

    ``dedupe=False`` skips the per-pair max-merge shuffle and may emit the
    same pair once per matching band — correct and cheaper for CLUSTERING
    consumers (duplicate edges are harmless to component merge, and any
    occurrence passing the threshold implies the max does too)."""
    banded = docs.map_batches(
        _minhash_batch,
        fn_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, ngram=ngram, seed=seed,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = _crc_bucket(batch["band_key"].to_pylist(), 64)
        return batch.append_column("bucket", pa.array(buckets))

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    if not dedupe:
        return pairs
    return _dedupe_pairs_ds(pairs, "est_jaccard", "max")


def minhash_candidate_pairs(docs: "ray.data.Dataset", **kwargs) -> pd.DataFrame:
    """Driver-side convenience twin of :func:`minhash_candidate_pairs_ds`
    (tests / small corpora)."""
    pairs = minhash_candidate_pairs_ds(docs, **kwargs).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    return pairs[["a", "b", "est_jaccard"]].sort_values(["a", "b"]).reset_index(
        drop=True
    )


def minhash_lsh_clusters(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    **kwargs,
) -> "ray.data.Dataset":
    """Near-dup clusters: members of multi-doc components at est_jaccard ≥
    threshold.  Docs not in any pair are implicit singletons (not listed).
    LSH pairs → threshold filter → size-guarded component merge; returns a
    Dataset (doc_id, cluster_id).  Pair max-dedup is skipped (duplicate
    edges are harmless to clustering — one shuffle saved)."""
    import pyarrow.compute as pc

    pairs = minhash_candidate_pairs_ds(docs, dedupe=False, **kwargs)
    hits = pairs.map_batches(
        lambda b: b.filter(pc.greater_equal(b["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    return clusters_from_pairs_ds(hits)


# --- SimHash ---------------------------------------------------------------


class _SimHashStage:
    """Actor: emits (doc_id, band_key, simhash); per-token md5 hashes are
    memoized across the actor's batches (tokens repeat heavily across
    docs — same cache pattern as the MinHash stage)."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col
        self._tok_cache: dict[str, int] = {}

    def _simhash(self, text: str) -> int:
        import hashlib

        toks = (text or "").lower().split()
        if not toks:
            return 0
        v = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        for t in toks:
            h = self._tok_cache.get(t)
            if h is None:
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                self._tok_cache[t] = h
            bits = (np.uint64(h) >> shifts) & one
            v += np.where(bits == 1, 1, -1)
        return int(
            ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        keys: list[str] = []
        hashes: list[int] = []
        for doc_id, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            h = self._simhash(text)
            for band in range(4):  # 4 × 16-bit bands: ≥1 equal band ⟺ candidates
                ids.append(doc_id)
                keys.append(f"{band}:{(h >> (16 * band)) & 0xFFFF:04x}")
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band_key": pa.array(keys, type=pa.string()),
                "simhash": pa.array(np.array(hashes, dtype=np.uint64)),
            }
        )


def simhash_pairs_ds(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    dedupe: bool = True,
) -> "ray.data.Dataset":
    """Candidate pairs (a, b, hamming) with Hamming distance ≤ max_hamming
    as a Dataset (bounded crc32 band buckets, same design as minhash)."""
    def _simhash_batch(batch: pa.Table) -> pa.Table:
        key = ("simhash", id_col, text_col)
        stage = _SKETCH_STAGE_CACHE.get(key)
        if stage is None:
            stage = _SimHashStage(id_col=id_col, text_col=text_col)
            _SKETCH_STAGE_CACHE[key] = stage
        return stage(batch)

    banded = docs.map_batches(_simhash_batch, batch_format="pyarrow")

    def bucket(group: pd.DataFrame) -> pa.Table:
        a, b, d = [], [], []
        counts = group["band_key"].value_counts()
        multi = counts[counts > 1].index
        if len(multi):
            for _key, sub in group[group["band_key"].isin(multi)].groupby(
                "band_key", sort=False
            ):
                rows = sub.drop_duplicates("doc_id").sort_values("doc_id")
                ids = rows["doc_id"].to_numpy()
                hs = rows["simhash"].to_numpy()
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        dist = hamming64(int(hs[i]), int(hs[j]))
                        if dist <= max_hamming:
                            a.append(int(ids[i]))
                            b.append(int(ids[j]))
                            d.append(dist)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(d, type=pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = _crc_bucket(batch["band_key"].to_pylist(), 64)
        return batch.append_column("bucket", pa.array(buckets))

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket, batch_format="pandas")
    )
    if not dedupe:
        return pairs
    return _dedupe_pairs_ds(pairs, "hamming", "min")


def simhash_pairs(docs: "ray.data.Dataset", max_hamming: int = 3, **kw) -> pd.DataFrame:
    pairs = simhash_pairs_ds(docs, max_hamming, **kw).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return pairs[["a", "b", "hamming"]].sort_values(["a", "b"]).reset_index(drop=True)


def simhash_clusters(
    docs: "ray.data.Dataset", max_hamming: int = 3, **kw
) -> "ray.data.Dataset":
    return clusters_from_pairs_ds(
        simhash_pairs_ds(docs, max_hamming, dedupe=False, **kw)
    )


# --- exact n-gram Jaccard (distributed inverted index) ----------------------


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 10_000,
    n_buckets: int = 64,
    metric: str = "jaccard",
    on_cap: str = "warn",
) -> "ray.data.Dataset":
    """EXACT word-ngram Jaccard pairs (a < b, jaccard ≥ threshold).

    ``metric="containment"`` scores ``inter / min(n_a, n_b)`` instead
    (max-containment — catches sub-document duplication where a short
    doc is wholly embedded in a long one, which Jaccard's union
    denominator dilutes); the inverted-index plan is identical, only the
    final per-pair formula changes, and the same recall-1.0 argument
    holds (containment ≥ t > 0 still implies a shared shingle).

    Distributed inverted-index join — SQL-oracle-exact (no LSH, no driver
    text dict):

    1. per doc: distinct word ngrams + the doc's shingle count → inverted
       index rows (shingle, doc_id, n), crc32-bucketed by shingle;
    2. per shingle: emit co-occurrence rows for every doc pair sharing it
       (sorted ids, numpy triangular expansion) carrying (n_a, n_b);
    3. bucketed group-count over (a, b) → |A∩B|; jaccard =
       inter / (n_a + n_b − inter), filter ≥ threshold.

    Recall is exactly 1.0 while ``max_df`` does not bind: J(A,B) ≥ t > 0
    implies a shared shingle, so every qualifying pair is generated.
    Pair volume is Σ df²/2 over shingles, so a shingle shared by 100M
    documents would alone contribute 5·10¹⁵ pair emissions — ``max_df``
    (default 10 000) is the standard absolute stop-shingle cap that bounds
    this at web scale; the SQL twin applies the IDENTICAL cap, so the
    oracle stays exact whether or not it binds (at the test SFs it never
    does: the synthetic vocab's max df is 338 at sf0.1).  Ints divide
    identically on every engine, so the jaccard column is bit-identical
    to the DuckDB twin.

    When the cap DOES bind, any pair whose only shared shingles are
    capped loses recall — ``on_cap`` makes that loud instead of silent:
    ``"warn"`` (default) emits a ``UserWarning`` from the worker naming
    the capped shingle count, ``"raise"`` fails the job with a
    ``RuntimeError`` telling the caller to switch to the recall-safe
    ``ngram_jaccard_pairs_prefix`` plan (no df cap), ``"ignore"``
    restores the old silent behavior.
    """
    if on_cap not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_cap must be warn|raise|ignore, got {on_cap!r}")

    def index_rows(batch: pa.Table) -> pa.Table:
        sh_out: list[str] = []
        id_out: list[int] = []
        n_out: list[int] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sh = word_ngrams(text, ngram)
            n = len(sh)
            for s in sh:
                sh_out.append(s)
                id_out.append(doc_id)
                n_out.append(n)
        return pa.table(
            {
                "s": pa.array(sh_out, type=pa.string()),
                "doc_id": pa.array(id_out, type=pa.int64()),
                "n": pa.array(n_out, type=pa.int64()),
                "bucket": pa.array(_crc_bucket(sh_out, n_buckets)),
            }
        )

    def cooc_pairs(group: pd.DataFrame) -> pa.Table:
        a_l: list[np.ndarray] = []
        b_l: list[np.ndarray] = []
        na_l: list[np.ndarray] = []
        nb_l: list[np.ndarray] = []
        counts = group["s"].value_counts()
        multi = counts[counts > 1].index
        n_capped = 0
        for _s, sub in group[group["s"].isin(multi)].groupby("s", sort=False):
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            k = len(sub)
            if k < 2:
                continue
            if max_df is not None and k > max_df:
                n_capped += 1
                continue
            ids = sub["doc_id"].to_numpy()
            ns = sub["n"].to_numpy()
            iu, ju = np.triu_indices(k, k=1)
            a_l.append(ids[iu])
            b_l.append(ids[ju])
            na_l.append(ns[iu])
            nb_l.append(ns[ju])
        if n_capped and on_cap != "ignore":
            msg = (
                f"ngram_jaccard_pairs: max_df={max_df} dropped {n_capped} "
                "stop-shingle(s) in this bucket — pairs whose ONLY shared "
                "shingles are capped are silently lost; use the recall-safe "
                "ngram_jaccard_pairs_prefix plan (no df cap) or raise max_df"
            )
            if on_cap == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        if not a_l:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "n_a": pa.array([], type=pa.int64()),
                    "n_b": pa.array([], type=pa.int64()),
                    "inter": pa.array([], type=pa.int64()),
                }
            )
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        # partial count inside the bucket task (combiner before the pair
        # shuffle): same (a,b) repeats once per shared shingle
        df = (
            pd.DataFrame(
                {
                    "a": a,
                    "b": b,
                    "n_a": np.concatenate(na_l),
                    "n_b": np.concatenate(nb_l),
                }
            )
            .groupby(["a", "b", "n_a", "n_b"], sort=False)
            .size()
            .rename("inter")
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    def add_pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pbucket",
            pa.array(
                _pair_bucket(
                    np.asarray(batch["a"]), np.asarray(batch["b"]), n_buckets
                )
            ),
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        agg = (
            group.groupby(["a", "b", "n_a", "n_b"], sort=False)["inter"]
            .sum()
            .reset_index()
        )
        inter = agg["inter"].to_numpy().astype(np.float64)
        if metric == "containment":
            denom = np.minimum(
                agg["n_a"].to_numpy(), agg["n_b"].to_numpy()
            ).astype(np.float64)
        else:
            denom = (
                (agg["n_a"] + agg["n_b"]).to_numpy().astype(np.float64) - inter
            )
        j = inter / denom
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(agg["a"].to_numpy()[keep], type=pa.int64()),
                "b": pa.array(agg["b"].to_numpy()[keep], type=pa.int64()),
                metric: pa.array(j[keep], type=pa.float64()),
            }
        )

    return (
        docs.map_batches(index_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cooc_pairs, batch_format="pandas")
        .map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(merge, batch_format="pandas")
    )


def ngram_clusters(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    ngram: int = 2,
    **kwargs,
) -> "ray.data.Dataset":
    """Connected components over the EXACT ngram-Jaccard pair graph —
    distributed end to end (pairs → min-label propagation), with a
    recursive-CTE SQL twin for the oracle."""
    return clusters_from_pairs_ds(
        ngram_jaccard_pairs(docs, threshold=threshold, ngram=ngram, **kwargs)
    )


# --- embedding cosine near-dup ---------------------------------------------


def embedding_neardup_exact(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """EXACT all-pairs cosine ≥ threshold — the brute-force baseline: the
    unit-normalized matrix is broadcast once (``ray.put``), every batch
    does one matmul against it and emits its qualifying (a < b) pairs.

    O(n²) compute but O(n·d) broadcast memory and zero shuffle; the scale
    path for big n is :func:`embedding_neardup_pairs` (hyperplane LSH).
    Cosine is rounded to 4 decimals for cross-engine float stability
    (matches the ``topk_cosine`` oracle protocol)."""
    from ner_funtool_ray.stages.similarity import _batch_matrix

    tbl = pa.concat_tables(
        embeddings.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    all_ids = np.asarray(tbl[id_col]).astype(np.int64)
    mat = _batch_matrix(tbl, vec_col).astype(np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
    ref = ray.put((all_ids, unit))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, unit_all = ray.get(ref)
        ids_b = np.asarray(batch[id_col]).astype(np.int64)
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        u = m / np.maximum(np.linalg.norm(m, axis=1), 1e-30)[:, None]
        sims = u @ unit_all.T  # (B, N)
        rows, cols = np.nonzero(sims >= threshold)
        a = ids_b[rows]
        b = ids_all[cols]
        keep = a < b  # each unordered pair emitted once, by its lower id
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "cosine": pa.array(
                    np.round(sims[rows, cols][keep], 4), type=pa.float64()
                ),
            }
        )

    return embeddings.map_batches(pairs, batch_format="pyarrow")


def embedding_neardup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Cosine near-dup pairs via hyperplane-LSH buckets + exact in-bucket
    re-score (the scale path: bucket count 2^n_planes bounds group sizes;
    raise n_planes for larger corpora; recall is approximate by
    construction — the exact twin is :func:`embedding_neardup_exact`).

    Round-2 review items fixed: returns a streaming ``Dataset`` (the pair
    set never lands on the driver), the in-bucket scorer is a vectorized
    ``np.nonzero`` over the similarity matrix (no per-pair Python loop),
    and the planes are md5-derived (functions/md5vec.py) so the result has
    an exact DuckDB twin.  Each vector lands in exactly ONE bucket (the
    key uses all planes), so no cross-bucket pair dedup is needed."""
    from ner_funtool_ray.functions.md5vec import md5_planes
    from ner_funtool_ray.stages.similarity import _batch_matrix, hyperplane_lsh_keys

    # derive dim from the first row's list length lazily inside the stage
    state = {"planes": None}

    def keyed(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        if state["planes"] is None:
            state["planes"] = md5_planes(n_planes, mat.shape[1], seed=seed)
        keys = hyperplane_lsh_keys(mat, state["planes"])
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(keys),
                vec_col: batch[vec_col],
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        rows = group.sort_values(id_col)
        ids = rows[id_col].to_numpy().astype(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in rows[vec_col]])
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        np.fill_diagonal(sims, -np.inf)
        i, j = np.nonzero(np.triu(sims >= threshold, k=1))
        cos = sims[i, j]
        if round_to is not None:
            cos = np.round(cos, round_to)
        return pa.table(
            {
                "a": pa.array(ids[i], type=pa.int64()),
                "b": pa.array(ids[j], type=pa.int64()),
                "cosine": pa.array(cos, type=pa.float64()),
            }
        )

    return (
        embeddings.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def tfngram_cosine_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 10_000,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXACT TF-weighted word-ngram cosine pairs (a < b, cos ≥ threshold)
    — the multiset complement of :func:`ngram_jaccard_pairs`: repeated
    phrases WEIGHT the similarity instead of collapsing to set membership
    (boilerplate-heavy near-dups score higher here).

    Same distributed inverted-index plan; the index rows carry the
    term frequency and the doc's Σtf² norm, the per-shingle expansion
    emits tf·tf dot-product partials, and the pair merge finishes with
    ``dot / sqrt(n2_a · n2_b)``.  Everything before the final division is
    exact int64; sqrt and / are IEEE-correctly-rounded on BOTH engines
    (sqrt is one of the five basic operations), so the score is
    bit-identical to the DuckDB twin.  The ``max_df`` stop-shingle cap
    bounds Σdf² exactly as documented on the jaccard op.  (The registered
    SQL twin covers the default ``ngram=2`` only — other shingle sizes
    are outside the oracle contract, same caveat as ``late_days`` on
    ``waiting_suppliers``.)"""
    from collections import Counter

    def index_rows(batch: pa.Table) -> pa.Table:
        sh_out: list[str] = []
        id_out: list[int] = []
        tf_out: list[int] = []
        n2_out: list[int] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = [t for t in text.split() if t]
            if len(toks) >= ngram:
                grams = Counter(
                    " ".join(toks[i : i + ngram])
                    for i in range(len(toks) - ngram + 1)
                )
            elif toks:
                grams = Counter([" ".join(toks)])
            else:
                grams = Counter()
            n2 = sum(v * v for v in grams.values())
            for s, tf in grams.items():
                sh_out.append(s)
                id_out.append(doc_id)
                tf_out.append(tf)
                n2_out.append(n2)
        return pa.table(
            {
                "s": pa.array(sh_out, type=pa.string()),
                "doc_id": pa.array(id_out, type=pa.int64()),
                "tf": pa.array(tf_out, type=pa.int64()),
                "n2": pa.array(n2_out, type=pa.int64()),
                "bucket": pa.array(_crc_bucket(sh_out, n_buckets)),
            }
        )

    def cooc_dots(group: pd.DataFrame) -> pa.Table:
        a_l, b_l, d_l, na_l, nb_l = [], [], [], [], []
        counts = group["s"].value_counts()
        multi = counts[counts > 1].index
        for _s, sub in group[group["s"].isin(multi)].groupby("s", sort=False):
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            k = len(sub)
            if k < 2 or (max_df is not None and k > max_df):
                continue
            ids = sub["doc_id"].to_numpy()
            tfs = sub["tf"].to_numpy()
            n2s = sub["n2"].to_numpy()
            iu, ju = np.triu_indices(k, k=1)
            a_l.append(ids[iu])
            b_l.append(ids[ju])
            d_l.append(tfs[iu] * tfs[ju])
            na_l.append(n2s[iu])
            nb_l.append(n2s[ju])
        if not a_l:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "n2_a": pa.array([], type=pa.int64()),
                    "n2_b": pa.array([], type=pa.int64()),
                    "dot": pa.array([], type=pa.int64()),
                }
            )
        df = (
            pd.DataFrame(
                {
                    "a": np.concatenate(a_l),
                    "b": np.concatenate(b_l),
                    "n2_a": np.concatenate(na_l),
                    "n2_b": np.concatenate(nb_l),
                    "dot": np.concatenate(d_l),
                }
            )
            .groupby(["a", "b", "n2_a", "n2_b"], sort=False)["dot"]
            .sum()
            .reset_index()
        )
        return pa_from_pandas(df, preserve_index=False)

    def add_pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pbucket",
            pa.array(
                _pair_bucket(
                    np.asarray(batch["a"]), np.asarray(batch["b"]), n_buckets
                )
            ),
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        agg = (
            group.groupby(["a", "b", "n2_a", "n2_b"], sort=False)["dot"]
            .sum()
            .reset_index()
        )
        cos = agg["dot"].to_numpy().astype(np.float64) / np.sqrt(
            agg["n2_a"].to_numpy().astype(np.float64)
            * agg["n2_b"].to_numpy().astype(np.float64)
        )
        keep = cos >= threshold
        return pa.table(
            {
                "a": pa.array(agg["a"].to_numpy()[keep], type=pa.int64()),
                "b": pa.array(agg["b"].to_numpy()[keep], type=pa.int64()),
                "cos_sim": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return (
        docs.map_batches(index_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cooc_dots, batch_format="pandas")
        .map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(merge, batch_format="pandas")
    )




def ngram_jaccard_pairs_prefix(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXACT word-ngram Jaccard pairs via PPJoin-style PREFIX FILTERING
    (Xiao et al., WWW 2008 — public algorithm) → identical result set to
    :func:`ngram_jaccard_pairs` (same SQL oracle), different plan.

    Why: the inverted-index plan's candidate volume is Σ df²/2 over ALL
    shingles — the one shape in this repo that explodes on skewed vocab
    (61 s / 36M emissions at sf0.1).  Prefix filtering only indexes each
    document's first ``n − ⌈t·n⌉ + 1`` shingles under a GLOBAL total
    order (crc32 — order choice affects only candidate count, never
    correctness): if J(A,B) ≥ t, the order-minimal common shingle
    provably lands in both prefixes, so recall stays exactly 1.0 with no
    ``max_df`` knob.  Candidates are then verified EXACTLY against the
    full shingle sets.

    Plan (all stages bucket-bounded):
    1. per doc: shingles sorted by (crc32, shingle); prefix rows →
       shingle-bucketed candidate generation (distinct pairs only — no
       counting, so stop-shingles cost prefix-df², a t-fraction of df²);
    2. global pair-dedup (bucketed groupby);
    3. two bucketed joins attach each side's full shingle set
       (sets ride as one separator-joined string per doc);
    4. exact set intersection per candidate → jaccard ≥ t filter.
    """
    t = float(threshold)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        sh_out: list[str] = []
        id_out: list[int] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sh = sorted(
                word_ngrams(text, ngram),
                key=lambda s: (zlib.crc32(s.encode("utf-8")), s),
            )
            n = len(sh)
            if n == 0:
                continue
            # floor(t*n) <= ceil(t*n): a longer-than-needed prefix is
            # still correct (more candidates, never fewer)
            p = n - int(np.floor(t * n)) + 1
            for s in sh[:p]:
                sh_out.append(s)
                id_out.append(doc_id)
        return pa.table(
            {
                "s": pa.array(sh_out, type=pa.string()),
                "doc_id": pa.array(id_out, type=pa.int64()),
                "bucket": pa.array(_crc_bucket(sh_out, n_buckets)),
            }
        )

    def cand_pairs(group: pd.DataFrame) -> pa.Table:
        a_l: list[np.ndarray] = []
        b_l: list[np.ndarray] = []
        counts = group["s"].value_counts()
        multi = counts[counts > 1].index
        for _s, sub in group[group["s"].isin(multi)].groupby("s", sort=False):
            ids = np.unique(sub["doc_id"].to_numpy(np.int64))
            k = len(ids)
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, k=1)
            a_l.append(ids[iu])
            b_l.append(ids[ju])
        if not a_l:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                }
            )
        df = pd.DataFrame(
            {"a": np.concatenate(a_l), "b": np.concatenate(b_l)}
        ).drop_duplicates()  # in-bucket combiner before the pair shuffle
        return pa_from_pandas(df, preserve_index=False)

    def add_pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pbucket",
            pa.array(
                _pair_bucket(
                    np.asarray(batch["a"]), np.asarray(batch["b"]), n_buckets
                )
            ),
        )

    def dedupe(group: pd.DataFrame) -> pd.DataFrame:
        return group[["a", "b"]].drop_duplicates()

    cands = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cand_pairs, batch_format="pandas")
        .map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedupe, batch_format="pandas")
    )

    SEP = "\x1f"

    # semi-join pushdown (the shipping_priority idiom): only docs that
    # appear in some candidate pair ship their full shingle set through
    # the verify joins — the set payload is candidate-proportional, not
    # corpus-proportional.  Size-guarded: above the cap, ship everything.
    cands = cands.materialize()
    cand_ids_ref = None
    if cands.count() <= 5_000_000:
        cd = cands.to_pandas()
        cand_ids_ref = ray.put(
            np.unique(np.concatenate([cd["a"].to_numpy(np.int64),
                                      cd["b"].to_numpy(np.int64)]))
            if len(cd)
            else np.array([], dtype=np.int64)
        )

    def set_rows(batch: pa.Table) -> pa.Table:
        if cand_ids_ref is not None:
            keep = np.isin(
                np.asarray(batch[id_col]).astype(np.int64),
                ray.get(cand_ids_ref),
            )
            batch = batch.filter(pa.array(keep))
        ids: list[int] = []
        joined: list[str] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sh = word_ngrams(text, ngram)
            if not sh:
                continue
            ids.append(doc_id)
            joined.append(SEP.join(sh))
        return pa.table(
            {
                "key": pa.array(ids, type=pa.int64()),
                "sh": pa.array(joined, type=pa.string()),
                "kind": pa.array(np.ones(len(ids), dtype=np.int8)),
                "a": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "b": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "jbucket": pa.array(
                    np.asarray(ids, dtype=np.int64) % np.int64(n_buckets)
                ),
            }
        )

    sets = docs.map_batches(set_rows, batch_format="pyarrow")

    def tag_cand(key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = np.asarray(batch[key_col]).astype(np.int64)
            n = len(key)
            cols = {
                "key": pa.array(key),
                "sh": batch["sh"]
                if "sh" in batch.column_names
                else pa.array([""] * n, type=pa.string()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "a": batch["a"],
                "b": batch["b"],
                "jbucket": pa.array(key % np.int64(n_buckets)),
            }
            return pa.table(cols)

        return fn

    def attach(side: str):
        # join candidate rows (kind 0) to set rows (kind 1) on key within
        # the bucket; the attached set replaces/extends the sh payload
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            lut = group.loc[group["kind"] == 1].set_index("key")["sh"]
            cand = group.loc[group["kind"] == 0].copy()
            if cand.empty:
                # typed empty frame with the SAME columns as the non-empty
                # branch for this side (a mismatched zero-row schema would
                # KeyError downstream on blocks from empty buckets)
                out_col = "sh_a" if side == "a" else "sh_b"
                return pd.DataFrame(
                    {
                        "a": pd.Series(dtype=np.int64),
                        "b": pd.Series(dtype=np.int64),
                        "sh": pd.Series(dtype=object),
                        out_col: pd.Series(dtype=object),
                    }
                )
            attached = cand[side].map(lut)
            ok = attached.notna()  # docs with zero shingles have no sets
            cand = cand[ok]
            if side == "a":
                return pd.DataFrame(
                    {
                        "a": cand["a"].to_numpy(np.int64),
                        "b": cand["b"].to_numpy(np.int64),
                        "sh": [""] * len(cand),
                        "sh_a": attached[ok].to_numpy(),
                    }
                )
            return pd.DataFrame(
                {
                    "a": cand["a"].to_numpy(np.int64),
                    "b": cand["b"].to_numpy(np.int64),
                    "sh": cand["sh_a"].to_numpy(),  # carried A-sets
                    "sh_b": attached[ok].to_numpy(),
                }
            )

        return fn

    with_a = (
        cands.map_batches(tag_cand("a"), batch_format="pyarrow")
        .union(sets)
        .groupby("jbucket")
        .map_groups(attach("a"), batch_format="pandas")
    )

    def retag_b(batch: pa.Table) -> pa.Table:
        # column order matches the widened set rows exactly so the union
        # has ONE schema (no block-level divergence)
        b = np.asarray(batch["b"]).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(b),
                "sh": batch["sh"],  # unused slot (cand side)
                "kind": pa.array(np.zeros(len(b), dtype=np.int8)),
                "a": batch["a"],
                "b": batch["b"],
                "jbucket": pa.array(b % np.int64(n_buckets)),
                "sh_a": batch["sh_a"],
            }
        )

    def widen_sets(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sh_a", pa.array([""] * batch.num_rows, type=pa.string())
        )

    verified_in = (
        with_a.map_batches(retag_b, batch_format="pyarrow")
        .union(sets.map_batches(widen_sets, batch_format="pyarrow"))
        .groupby("jbucket")
        .map_groups(attach("b"), batch_format="pandas")
    )

    def score(batch: pa.Table) -> pa.Table:
        a_out: list[int] = []
        b_out: list[int] = []
        j_out: list[float] = []
        memo: dict[str, frozenset] = {}  # docs recur across pairs

        def as_set(joined: str) -> frozenset:
            v = memo.get(joined)
            if v is None:
                v = memo.setdefault(joined, frozenset(joined.split(SEP)))
            return v

        for a, b, sa, sb in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["sh"].to_pylist(),
            batch["sh_b"].to_pylist(),
        ):
            A = as_set(sa)
            B = as_set(sb)
            inter = len(A & B)
            j = inter / (len(A) + len(B) - inter)
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(j)
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )

    return verified_in.map_batches(score, batch_format="pyarrow")
