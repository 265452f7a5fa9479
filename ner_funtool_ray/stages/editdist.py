"""Edit-distance (Levenshtein) near-duplicate pairs over the documents table.

New dedup-family member alongside exact / MinHash / SimHash / n-gram-Jaccard /
embedding-cosine (``stages/dedup.py``): emit every unordered pair of documents
within ``max_dist`` single-character edits, with the exact distance.

Ray shape — and why it is scale-safe:

* **Lossless length blocking.** ``levenshtein(a, b) >= |len(a) - len(b)|``,
  so only pairs whose lengths differ by at most ``max_dist`` can qualify.
  Each doc is assigned a home bucket ``h = len // W`` (``W >= max_dist``)
  and emitted to buckets ``h`` and ``h+1``; any qualifying pair then
  co-occurs in exactly one bucket (the one equal to ``max(h_a, h_b)``),
  which is where it is scored.  The shuffle therefore carries each doc
  twice, never a pair list, and the result is the TRUE all-pairs answer —
  the blocking loses nothing.
* **Windowed pair generation.** Inside a bucket the docs are sorted by
  length and candidate pairs come from a two-pointer length window
  (``np.searchsorted``), so candidate volume is bounded by the local
  length-collision count, not ``n²`` over the bucket.
* **Pair-vectorized banded DP.**  The Ukkonen band (width ``2d+1``) is
  advanced one row at a time with the *pair* axis vectorized in numpy; the
  in-row insertion chain ``dp[i][j-1]+1`` is a prefix-min, computed with
  ``np.minimum.accumulate`` via ``min_{k'<=k}(m[k'] + (k-k')) =
  k + cummin(m[k'] - k')`` — no per-cell Python.  Pairs whose band minimum
  exceeds ``d`` are retired early (the band minimum is non-decreasing),
  and finished/abandoned pairs are compacted out of the working set.

At web scale the length window alone can still over-generate in a corpus
with concentrated lengths (the worst case is every doc the same length);
compose with a content block first — e.g. restrict to pairs sharing a
MinHash band from ``stages/dedup.py`` — and run this as the exact verifier.

Reference parity: the reference repo deduplicates corpora only by exact
line match (e.g. data loaders dropping repeated sentences); this operator
generalizes that to bounded-edit near-duplicates as a first-class query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.sources.io import read_parquet_auto

_INF = np.int32(1 << 20)
_A_PAD = np.uint32(0xFFFFFFFF)  # distinct sentinels: padding never matches
_B_PAD = np.uint32(0xFFFFFFFE)


def encode_strings(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pack strings into a (n, Lmax) uint32 codepoint matrix + length vector."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    lmax = int(lens.max()) if len(lens) else 0
    codes = np.full((len(texts), max(lmax, 1)), _A_PAD, dtype=np.uint32)
    for i, t in enumerate(texts):
        if t:
            codes[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            )
    return codes, lens


def banded_levenshtein_pairs(
    codes: np.ndarray,
    lens: np.ndarray,
    ai: np.ndarray,
    bi: np.ndarray,
    max_dist: int,
    chunk: int = 8192,
) -> np.ndarray:
    """Exact Levenshtein distance per (ai, bi) pair, capped at ``max_dist``
    (pairs farther than that return ``max_dist + 1``).  Vectorized across
    pairs; O(min_len × (2d+1)) cells per pair with early abandon."""
    d = int(max_dist)
    out = np.full(len(ai), d + 1, dtype=np.int64)
    for lo in range(0, len(ai), chunk):
        sl = slice(lo, lo + chunk)
        out[sl] = _banded_chunk(codes, lens, ai[sl], bi[sl], d)
    return out


def _banded_chunk(
    codes: np.ndarray,
    lens: np.ndarray,
    ai: np.ndarray,
    bi: np.ndarray,
    d: int,
) -> np.ndarray:
    # per pair, run the band over the SHORTER string (fewer rows)
    swap = lens[ai] > lens[bi]
    ai, bi = np.where(swap, bi, ai), np.where(swap, ai, bi)
    la = lens[ai].astype(np.int64)
    lb = lens[bi].astype(np.int64)
    n = len(ai)
    res = np.full(n, d + 1, dtype=np.int64)
    feasible = (lb - la) <= d  # lossless bound: dist >= len diff
    if not feasible.any():
        return res

    act = np.nonzero(feasible)[0]  # indices into the chunk's pair list
    a_pad = codes[ai[act]]
    # B side re-padded with a different sentinel so pad never equals pad
    b_pad = codes[bi[act]].copy()
    b_pad[b_pad == _A_PAD] = _B_PAD
    la_a = la[act]
    lb_a = lb[act]

    karr = np.arange(2 * d + 1, dtype=np.int64)
    # i = 0 row: dp[0][j] = j  →  band k = j + d
    dp = np.where(karr >= d, karr - d, _INF).astype(np.int32)
    dp = np.broadcast_to(dp, (len(act), 2 * d + 1)).copy()

    # zero-length A strings are done immediately: dist = len(B)
    done0 = la_a == 0
    if done0.any():
        res[act[done0]] = np.where(lb_a[done0] <= d, lb_a[done0], d + 1)
        keep = ~done0
        act, a_pad, b_pad, la_a, lb_a, dp = (
            act[keep], a_pad[keep], b_pad[keep], la_a[keep], lb_a[keep], dp[keep]
        )

    i = 0
    lmax_rows = int(la_a.max()) if len(la_a) else 0
    while len(act) and i < lmax_rows:
        i += 1
        j = i + karr - d  # (K,) same for every pair this row
        jm1 = np.clip(j - 1, 0, b_pad.shape[1] - 1)
        cost = (a_pad[:, i - 1 : i] != b_pad[:, jm1]).astype(np.int32)
        dp_shift = np.concatenate(  # dp_old[k+1] == same j, one fewer A char
            [dp[:, 1:], np.full((len(act), 1), _INF, dtype=np.int32)], axis=1
        )
        m = np.minimum(dp_shift + 1, dp + cost)
        invalid = (j < 0) | (j > lb_a[:, None])
        m[invalid] = _INF
        # insertion chain dp_new[k] = min_{k'<=k} m[k'] + (k - k')
        chain = karr.astype(np.int32) + np.minimum.accumulate(
            m - karr.astype(np.int32), axis=1
        )
        dp = np.minimum(m, chain)
        dp[invalid] = _INF

        finished = la_a == i
        if finished.any():
            kfin = (lb_a[finished] - i + d).astype(np.int64)
            dist = dp[finished, kfin]
            ok = dist <= d
            res[act[finished][ok]] = dist[ok]
        dead = finished | (dp.min(axis=1) > d)  # band min is non-decreasing
        if dead.any():
            keep = ~dead
            act, a_pad, b_pad, la_a, lb_a, dp = (
                act[keep], a_pad[keep], b_pad[keep], la_a[keep], lb_a[keep],
                dp[keep],
            )
            lmax_rows = int(la_a.max()) if len(la_a) else 0
    return res


def _window_pairs(lens_sorted: np.ndarray, d: int) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) index pairs, i < j, with lens[j] - lens[i] <= d over a
    length-sorted vector — two-pointer window, fully vectorized."""
    n = len(lens_sorted)
    ends = np.searchsorted(lens_sorted, lens_sorted + d, side="right")
    counts = ends - np.arange(n) - 1
    counts = np.maximum(counts, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ai = np.repeat(np.arange(n), counts)
    offsets = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    bi = ai + 1 + offsets
    return ai, bi


def editdistance_pairs_df(
    doc_ids: np.ndarray,
    texts: list[str],
    homes: np.ndarray,
    bucket: int,
    max_dist: int,
) -> pd.DataFrame:
    """Score one meeting bucket: candidate pairs via the length window,
    keep a pair only when ``max(home_a, home_b) == bucket`` (each pair is
    scored in exactly one bucket) and its distance is within ``max_dist``."""
    codes, lens = encode_strings(texts)
    order = np.argsort(lens, kind="stable")
    ai, bi = _window_pairs(lens[order], max_dist)
    ai, bi = order[ai], order[bi]
    if len(ai):
        keep = np.maximum(homes[ai], homes[bi]) == bucket
        ai, bi = ai[keep], bi[keep]
    if not len(ai):
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    dist = banded_levenshtein_pairs(codes, lens, ai, bi, max_dist)
    hit = dist <= max_dist
    da, db = doc_ids[ai[hit]], doc_ids[bi[hit]]
    lo, hi = np.minimum(da, db), np.maximum(da, db)
    return pd.DataFrame(
        {
            "doc_a": lo.astype(np.int64),
            "doc_b": hi.astype(np.int64),
            "dist": dist[hit].astype(np.int64),
        }
    )


def dedup_editdistance(
    sf_dir: str,
    max_dist: int = 20,
    bucket_width: int | None = None,
) -> "ray.data.Dataset":
    """All document pairs within ``max_dist`` Levenshtein edits →
    ``(doc_a, doc_b, dist)``.  Exact: the length blocking is lossless, so
    this equals the unblocked all-pairs answer (SQL twin below)."""
    w = bucket_width if bucket_width is not None else max_dist
    if w < max_dist:
        raise ValueError(
            f"bucket_width {w} < max_dist {max_dist}: adjacent-bucket "
            "emission would miss qualifying pairs"
        )

    def fanout(batch: pa.Table) -> pa.Table:
        lens = pa.compute.utf8_length(batch["text"]).to_numpy()
        home = (lens // w).astype(np.int64)
        doc_id = batch["doc_id"].to_numpy()
        text = batch["text"]
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([doc_id, doc_id])),
                "text": pa.concat_arrays(
                    [text.combine_chunks(), text.combine_chunks()]
                ),
                "home": pa.array(np.concatenate([home, home])),
                "bucket": pa.array(np.concatenate([home, home + 1])),
            }
        )

    def score(group: pd.DataFrame) -> pd.DataFrame:
        return editdistance_pairs_df(
            group["doc_id"].to_numpy(),
            group["text"].tolist(),
            group["home"].to_numpy(),
            int(group["bucket"].iloc[0]),
            max_dist,
        )

    ds = read_parquet_auto(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(fanout, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score, batch_format="pandas")
    )


# The bucket join below is a pure optimization: dist <= max_dist implies
# |len diff| <= max_dist implies adjacent length buckets, so the blocked
# result equals the all-pairs result (same reason the Ray plan is exact).
DEDUP_EDITDISTANCE_SQL = """
WITH d AS (
  SELECT doc_id, text, length(text) AS len, length(text) // 20 AS b
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND b.b BETWEEN a.b - 1 AND a.b + 1
 AND abs(a.len - b.len) <= 20
WHERE levenshtein(a.text, b.text) <= 20
"""


def editdistance_name_pairs_df(
    names: list[str],
    homes: np.ndarray,
    bucket: int,
    max_dist: int,
) -> pd.DataFrame:
    """String-keyed sibling of :func:`editdistance_pairs_df` for short
    name vocabularies (entity merge candidates): same lossless length
    blocking and banded DP, output ``(a, b, dist)`` with a < b."""
    codes, lens = encode_strings(names)
    order = np.argsort(lens, kind="stable")
    ai, bi = _window_pairs(lens[order], max_dist)
    ai, bi = order[ai], order[bi]
    if len(ai):
        keep = np.maximum(homes[ai], homes[bi]) == bucket
        ai, bi = ai[keep], bi[keep]
    if not len(ai):
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    dist = banded_levenshtein_pairs(codes, lens, ai, bi, max_dist)
    hit = dist <= max_dist
    na = np.asarray(names, dtype=object)
    xa, xb = na[ai[hit]], na[bi[hit]]
    swap = xa > xb
    lo = np.where(swap, xb, xa)
    hi = np.where(swap, xa, xb)
    return pd.DataFrame(
        {"a": lo, "b": hi, "dist": dist[hit].astype(np.int64)}
    )
