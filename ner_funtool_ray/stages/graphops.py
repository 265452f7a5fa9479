"""Distributed general-graph cores for the KG analytics family.

``pipelines/graph.py``'s entity ops serve a GAZETTEER-BOUNDED graph, so
their production path assembles the sketch-sized aggregated graph on the
driver (see ``entity_pagerank``'s module docstring for the bound).  This
module is the other half of each op's contract: the fully distributed
plan each docstring names, for general graphs fed in by a caller —
doc-doc similarity edges, open-vocabulary KGs — where neither nodes nor
edges fit a driver.  Every core here:

- takes ``nodes`` (column ``entity_id``) / ``edges`` Datasets directly,
  so callers can feed graphs that never came from a KG build;
- uses only bounded-bucket shuffles (``groupby("bucket")`` over a fixed
  bucket count) — the same pattern as ``pagerank_ds`` and
  ``stages/groupagg.bucketed_group_sum``: per-row work stays vectorized,
  shuffle parallelism = ``n_buckets``, key skew is immaterial because a
  bucket holds many keys;
- replicates the driver core's arithmetic EXACTLY (same int64 /
  arbitrary-precision rules, same bounded-round semantics), so the
  unrolled-CTE DuckDB twins in ``pipelines/graph.py`` stay hash-exact on
  either path (parity-tested via ``driver_cap=0``).

Edge-table conventions (the caller symmetrizes / canonicalizes):

- ``edges_sym``: directed both ways (``src, dst`` [+ ``weight``]) —
  propagation ops (BFS, components, k-core, PPR).
- ``edges_canon``: undirected canonical ``a < b``, unique — triangle ops.
- ``nb``: the distinct neighbor relation ``(e, m)`` (m is a neighbor of
  e), i.e. ``edges_sym`` deduplicated — middle-node pair-expansion ops.

Middle-node pair expansion (triangles / neighbor-Jaccard / resource
allocation / bipartite projection) materializes ``Σ_m deg(m)²`` pair
rows — the inverted-index join shape of ``stages/dedup.
ngram_jaccard_pairs``; hub nodes dominate that sum, which is inherent to
the exact (recall-1.0) plan and documented on each op.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ner_funtool_ray.stages.groupagg import bucketed_group_sum
from ner_funtool_ray.utils import pa_from_pandas

SCALE = np.int64(1_000_000_000)
INF = np.int64(999_999_999)

__all__ = [
    "attach_col",
    "bucketed_group_min",
    "neighbors_ds",
    "bfs_depth_ds",
    "components_ds",
    "kcore_ds",
    "triangles_ds",
    "clustering_coefficient_ds",
    "neighbor_jaccard_ds",
    "resource_allocation_ds",
    "cooccur_conditional_ds",
    "negative_samples_ds",
    "shared_member_pairs_ds",
    "hits_ds",
    "global_min_string",
]


def _crc_bucket(vals, n_buckets: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(str(x).encode("utf-8")) % n_buckets for x in vals),
        dtype=np.int64,
        count=len(vals),
    )


def global_min_string(ds: "ray.data.Dataset", col: str) -> str | None:
    """Global minimum of a string column via per-block partial mins —
    the driver sees one scalar per block, never the data."""
    parts = ds.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.min(t[col]).as_py()] if t.num_rows else [],
                           type=pa.string())}
        ),
        batch_format="pyarrow",
    ).take_all()
    vals = [r["m"] for r in parts if r["m"] is not None]
    return min(vals) if vals else None


def _pa_type(t) -> pa.DataType:
    """Coerce a Ray Schema type entry to an Arrow DataType — pandas-block
    datasets (``map_groups(..., batch_format="pandas")`` outputs) report
    numpy dtypes / Python classes instead of Arrow types."""
    if isinstance(t, pa.DataType):
        return t
    try:
        dt = np.dtype(t)
    except TypeError:
        return pa.string()
    if dt.kind in ("O", "U", "S"):
        return pa.string()
    return pa.from_numpy_dtype(dt)


def attach_col(
    left: "ray.data.Dataset",
    key_col: str,
    lut: "ray.data.Dataset",
    lut_key: str,
    lut_val: str,
    out_col: str,
    n_buckets: int = 64,
    how: str = "inner",
    fill=None,
    broadcast_limit: int | None = 1_000_000,
) -> "ray.data.Dataset":
    """Bucketed equi-join attaching one lookup column onto ``left``.

    Small LUTs (≤ ``broadcast_limit`` rows after materializing) take a
    broadcast fast path: the (key, val) frame rides ``ray.put`` once and
    every batch merges against it locally — zero shuffles, and ``left``
    streams untouched.  Larger LUTs fall back to the tagged-union plan
    (the ``entity_cooccurrence_lift`` distributed join, generalized):
    both sides bucket by the join key's crc32, one ``groupby("bucket")``
    co-locates them, and a per-bucket merge attaches the value — the
    shuffle moves each row once, no cross product.  Both paths share the
    same pandas-merge semantics (matched-but-null LUT values survive an
    inner join).  ``lut`` keys must be unique.  ``how="left"`` keeps
    unmatched left rows with ``fill``; ``"inner"`` drops them.  Pass
    ``broadcast_limit=None`` to force the shuffle plan."""
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = {
        n: _pa_type(t)
        for n, t in zip(left_schema.names, left_schema.types)
    }
    val_type = _pa_type(
        dict(zip(lut.schema().names, lut.schema().types))[lut_val]
    )

    def _finish(merged: "pd.DataFrame") -> pa.Table:
        if how != "inner" and fill is not None:
            merged[out_col] = merged[out_col].fillna(fill)
        tbl = pa_from_pandas(merged, preserve_index=False)
        out = {n: tbl[n].cast(left_types[n]) for n in left_names}
        out[out_col] = tbl[out_col].cast(val_type)
        return pa.table(out)

    if broadcast_limit is not None:
        lut = lut.materialize()
        if lut.count() <= broadcast_limit:
            lut_pdf = (
                lut.select_columns([lut_key, lut_val])
                .to_pandas()
                .rename(columns={lut_key: key_col, lut_val: out_col})
            )
            # match the shuffle path's key-type alignment (lut key cast
            # to the left side's key type before the merge)
            lut_pdf[key_col] = (
                pa.Array.from_pandas(lut_pdf[key_col])
                .cast(left_types[key_col])
                .to_pandas()
            )
            if pa.types.is_integer(val_type):
                lut_pdf[out_col] = lut_pdf[out_col].astype("Int64")
            lut_ref = ray.put(lut_pdf)

            def attach(t: pa.Table) -> pa.Table:
                left_df = t.select(left_names).to_pandas()
                merged = left_df.merge(
                    ray.get(lut_ref),
                    on=key_col,
                    how="inner" if how == "inner" else "left",
                )
                return _finish(merged)

            return left.map_batches(attach, batch_format="pyarrow")

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in left_names}
        cols["__v"] = pa.nulls(t.num_rows, type=val_type)
        cols["__kind"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["bucket"] = pa.array(
            _crc_bucket(t[key_col].to_pylist(), n_buckets)
        )
        return pa.table(cols)

    def tag_lut(t: pa.Table) -> pa.Table:
        cols = {
            n: pa.nulls(t.num_rows, type=left_types[n]) for n in left_names
        }
        cols[key_col] = t[lut_key].cast(left_types[key_col])
        cols["__v"] = t[lut_val]
        cols["__kind"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["bucket"] = pa.array(
            _crc_bucket(t[lut_key].to_pylist(), n_buckets)
        )
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        lut.map_batches(tag_lut, batch_format="pyarrow")
    )

    def join(group: pa.Table) -> pa.Table:
        # vectorized hash join: pandas merge (C hash table), nullable
        # Int64 so a left join never silently floats an int64 payload
        kind = group["__kind"]
        lut_df = (
            group.filter(pc.equal(kind, 1))
            .select([key_col, "__v"])
            .to_pandas()
            .rename(columns={"__v": out_col})
        )
        left_df = group.filter(pc.equal(kind, 0)).select(left_names).to_pandas()
        if pa.types.is_integer(val_type):
            lut_df[out_col] = lut_df[out_col].astype("Int64")
        merged = left_df.merge(
            lut_df, on=key_col, how="inner" if how == "inner" else "left"
        )
        return _finish(merged)

    return both.groupby("bucket").map_groups(join, batch_format="pyarrow")


def bucketed_group_min(
    ds: "ray.data.Dataset",
    keys: list[str],
    min_cols: dict[str, str],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Group-min twin of ``stages/groupagg.bucketed_group_sum``: per-batch
    partial min, crc32 bucket, one bounded shuffle, per-bucket final min.

    Both aggregate passes run as Arrow ``TableGroupBy`` hash-min kernels —
    pandas object-dtype ``groupby().min()`` is a per-group PYTHON min
    (measured 57 s vs Arrow's 0.6 s on a 4M-row string column), and string
    labels are the common case here (components' min-label rounds)."""

    def _agg(tbl: pa.Table, cols: dict[str, str]) -> pa.Table:
        agg = pa.TableGroupBy(tbl, keys).aggregate(
            [(src, "min") for src in cols.values()]
        )
        out = {k: agg[k] for k in keys}
        for out_name, src in cols.items():
            out[out_name] = agg[f"{src}_min"]
        return pa.table(out)

    def partial(batch: pa.Table) -> pa.Table:
        agg = _agg(batch.select(keys + list(min_cols.values())), min_cols)
        if len(keys) == 1:
            bkeys = agg[keys[0]].to_pylist()
        else:
            bkeys = [
                "\x00".join(map(str, row))
                for row in zip(*[agg[k].to_pylist() for k in keys])
            ]
        return agg.append_column(
            "bucket", pa.array(_crc_bucket(bkeys, n_buckets))
        )

    def merge(group: pa.Table) -> pa.Table:
        return _agg(
            group.select(keys + list(min_cols)),
            {out: out for out in min_cols},
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def neighbors_ds(
    edges_sym: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distinct neighbor relation ``(e, m)`` from the symmetrized edge
    list — the SQL twins' ``nb AS (... UNION ...)`` (UNION deduplicates,
    so multigraph inputs collapse to simple-graph semantics here too)."""
    nb = edges_sym.map_batches(
        lambda t: pa.table(
            {"e": t["src"].cast(pa.string()), "m": t["dst"].cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_sum(
        nb, keys=["e", "m"], count_col="__c", n_buckets=n_buckets
    ).drop_columns(["__c"])


def _propagate_rounds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    init_label,
    rounds: int,
    mode: str,
    n_buckets: int = 64,
    seed_entity: str | None = None,
) -> "ray.data.Dataset":
    """Bounded-round min-propagation shared by BFS (``mode="bfs"``: the
    candidate a neighbor offers is ``label+1``), weighted single-source
    shortest paths (``mode="sssp"``: the candidate is ``label+len`` with
    ``len`` an int64 edge-length column on ``edges_sym`` — bounded-round
    Bellman-Ford) and connected components (``mode="cc"``: the candidate
    is the label itself, min over strings).
    Exactly the driver cores' per-round rule — new(v) = min(old(v),
    min over in-edges candidate(u)) — so the unrolled-CTE twins match
    bit-for-bit whether or not the propagation has converged."""
    if mode in ("bfs", "sssp"):
        label_type = pa.int64()

        def init(t: pa.Table) -> pa.Table:
            ids = t["entity_id"].to_pylist()
            lab = np.where(
                np.array([i == seed_entity for i in ids], dtype=bool),
                np.int64(0),
                INF,
            )
            return pa.table(
                {"entity_id": t["entity_id"], "lab": pa.array(lab)}
            )

    else:  # cc: every node starts labeled with itself
        label_type = pa.string()

        def init(t: pa.Table) -> pa.Table:
            return pa.table(
                {"entity_id": t["entity_id"], "lab": t["entity_id"]}
            )

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()
    edge_cols = ["src", "dst"] + (["len"] if mode == "sssp" else [])
    edges_m = edges_sym.map_batches(
        lambda t: t.select(edge_cols), batch_format="pyarrow"
    ).materialize()

    for _ in range(rounds):
        # labels ride to their out-edges (src-bucketed join) ...
        tagged = attach_col(
            edges_m, "src", labels, "entity_id", "lab", "src_lab",
            n_buckets=n_buckets, how="inner",
        )
        if mode == "bfs":
            cand = tagged.map_batches(
                lambda t: pa.table(
                    {
                        "dst": t["dst"],
                        "cand": pc.add(
                            t["src_lab"].cast(pa.int64()), pa.scalar(1)
                        ).cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        elif mode == "sssp":
            # an unreached source offers INF+len; the min-update below
            # can never store it (every stored label is <= INF already)
            cand = tagged.map_batches(
                lambda t: pa.table(
                    {
                        "dst": t["dst"],
                        "cand": pc.add(
                            t["src_lab"].cast(pa.int64()),
                            t["len"].cast(pa.int64()),
                        ).cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        else:
            cand = tagged.map_batches(
                lambda t: pa.table({"dst": t["dst"], "cand": t["src_lab"]}),
                batch_format="pyarrow",
            )
        # ... best offer per destination ...
        best = bucketed_group_min(
            cand, keys=["dst"], min_cols={"inc": "cand"}, n_buckets=n_buckets
        )
        # ... zero-fill min back onto every node's current label
        joined = attach_col(
            labels, "entity_id", best, "dst", "inc", "inc",
            n_buckets=n_buckets, how="left", fill=None,
        )

        def update(t: pa.Table, _lt=label_type) -> pa.Table:
            lab = t["lab"]
            inc = t["inc"].cast(_lt)
            new = pc.min_element_wise(lab, pc.fill_null(inc, lab))
            # fill_null(inc, lab): per-row fallback to the current label
            return pa.table({"entity_id": t["entity_id"], "lab": new})

        labels = joined.map_batches(update, batch_format="pyarrow").materialize()

    return labels


def bfs_depth_ds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    rounds: int = 6,
    n_buckets: int = 64,
    seed_entity: str | None = None,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_bfs_depth``'s numpy core: bounded-round
    min-plus hop distance from ``seed_entity`` (default: the global
    lexicographic minimum), unreached after ``rounds`` = -1."""
    if seed_entity is None:
        seed_entity = global_min_string(nodes, "entity_id")
    labels = _propagate_rounds(
        nodes, edges_sym, None, rounds, "bfs", n_buckets, seed_entity
    )
    return labels.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "depth": pc.if_else(
                    pc.greater_equal(t["lab"], pa.scalar(int(INF))),
                    pa.scalar(-1, type=pa.int64()),
                    t["lab"].cast(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def components_ds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    rounds: int = 8,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_components``: bounded-round min-LABEL
    propagation over entity strings (string min == sorted-index min, the
    same identity the numpy core relies on)."""
    labels = _propagate_rounds(nodes, edges_sym, None, rounds, "cc", n_buckets)
    return labels.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "component": t["lab"]}
        ),
        batch_format="pyarrow",
    )


def sssp_ds(
    nodes: "ray.data.Dataset",
    edges_sym_len: "ray.data.Dataset",
    rounds: int = 6,
    n_buckets: int = 64,
    seed_entity: str | None = None,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_shortest_path``'s numpy core:
    bounded-round Bellman-Ford from ``seed_entity`` (default: the global
    lexicographic minimum) over int64 edge lengths (``len`` column on
    the symmetrized edges), unreached after ``rounds`` = -1."""
    if seed_entity is None:
        seed_entity = global_min_string(nodes, "entity_id")
    labels = _propagate_rounds(
        nodes, edges_sym_len, None, rounds, "sssp", n_buckets, seed_entity
    )
    return labels.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "dist": pc.if_else(
                    pc.greater_equal(t["lab"], pa.scalar(int(INF))),
                    pa.scalar(-1, type=pa.int64()),
                    t["lab"].cast(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def katz_ds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    iters: int = 5,
    n_buckets: int = 64,
    scale: int = 1_000_000_000,
    alpha_num: int = 20,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_katz``'s numpy core: fixed-point
    attenuated-walk centrality on the out-weight-normalized adjacency,
    k'(v) = SCALE + (α_num · Σ_in (w·k(u)) // outw(u)) // 100, all int64.

    Per iteration: one src-bucketed lookup join rides ranks to their
    edges, one bounded-bucket group sum merges per-dst contributions,
    and one dst-bucketed zero-fill join rewrites every node's score —
    the same three-shuffle round as ``pagerank_ds``, built from the
    generic ``attach_col``/``bucketed_group_sum`` primitives."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    scale = np.int64(scale)
    alpha = np.int64(alpha_num)

    ow = bucketed_group_sum(
        edges_sym.map_batches(
            lambda t: pa.table(
                {"src": t["src"], "w": t["weight"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        keys=["src"],
        sum_cols={"outw": "w"},
        count_col=None,
        n_buckets=n_buckets,
    )
    edges_ow = attach_col(
        edges_sym, "src", ow, "src", "outw", "outw",
        n_buckets=n_buckets, how="inner",
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "k": pa.array(np.full(t.num_rows, scale, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        tagged = attach_col(
            edges_ow, "src", ranks, "entity_id", "k", "src_k",
            n_buckets=n_buckets, how="inner",
        )

        def contrib(t: pa.Table) -> pa.Table:
            c = (
                np.asarray(t["src_k"], dtype=np.int64)
                * np.asarray(t["weight"], dtype=np.int64)
            ) // np.asarray(t["outw"], dtype=np.int64)
            return pa.table({"dst": t["dst"], "c": pa.array(c)})

        inc = bucketed_group_sum(
            tagged.map_batches(contrib, batch_format="pyarrow"),
            keys=["dst"],
            sum_cols={"inc": "c"},
            count_col=None,
            n_buckets=n_buckets,
        )
        joined = attach_col(
            ranks.drop_columns(["k"]), "entity_id", inc, "dst", "inc", "inc",
            n_buckets=n_buckets, how="left", fill=0,
        )
        ranks = joined.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t["entity_id"],
                    "k": pa.array(
                        scale
                        + (
                            alpha
                            * np.asarray(
                                pc.fill_null(t["inc"], 0), dtype=np.int64
                            )
                        )
                        // np.int64(100)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "katz_fp": t["k"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def lpa_ds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    rounds: int = 4,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_lpa_communities``'s pandas core:
    synchronous weighted label propagation.  Per round every node takes
    the label with the largest incoming weight sum (ties → smallest
    label; no in-edges → keep own), so a FIXED round count is fully
    deterministic and the unrolled-CTE twin (ROW_NUMBER over
    ``sw DESC, lab ASC``) matches exactly.

    Per round: labels ride to out-edges (src-bucketed join), a bounded
    group sum merges (dst, lab) weight partials, a dst-bucketed
    ``map_groups`` picks each node's argmax, and a zero-fill join
    rewrites the label column."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    labels = nodes.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "lab": t["entity_id"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    edges_m = edges_sym.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": t["weight"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        tagged = attach_col(
            edges_m, "src", labels, "entity_id", "lab", "src_lab",
            n_buckets=n_buckets, how="inner",
        )
        sums = bucketed_group_sum(
            tagged.map_batches(
                lambda t: pa.table(
                    {"dst": t["dst"], "lab": t["src_lab"], "w": t["weight"]}
                ),
                batch_format="pyarrow",
            ),
            keys=["dst", "lab"],
            sum_cols={"sw": "w"},
            count_col=None,
            n_buckets=n_buckets,
        )

        # per-dst argmax (sw DESC, lab ASC) inside dst-hash buckets —
        # a dst never spans buckets, so the local winner IS global
        def bucket_dst(t: pa.Table) -> pa.Table:
            return t.append_column(
                "bucket", pa.array(_crc_bucket(t["dst"].to_pylist(), n_buckets))
            )

        def pick(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["dst", "sw", "lab"], ascending=[True, False, True]
            ).drop_duplicates("dst")
            return g[["dst", "lab"]].rename(columns={"lab": "win"})

        winners = (
            sums.map_batches(bucket_dst, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pick, batch_format="pandas")
        )
        joined = attach_col(
            labels, "entity_id", winners, "dst", "win", "win",
            n_buckets=n_buckets, how="left", fill=None,
        )
        labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t["entity_id"],
                    "lab": pc.fill_null(
                        t["win"].cast(pa.string()), t["lab"]
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return labels.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "community": t["lab"]}
        ),
        batch_format="pyarrow",
    )


def kcore_ds(
    nodes: "ray.data.Dataset",
    edges_sym: "ray.data.Dataset",
    k: int = 2,
    rounds: int = 6,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_kcore``: per round, each edge checks
    both endpoints against the alive set (two bucketed joins), surviving
    edges group-count per src, and nodes peel when their alive-degree
    drops below ``k``.  Identical bounded-round rule as the numpy core."""
    alive = nodes.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "alive": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    edges_m = edges_sym.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    ).materialize()

    for _ in range(rounds):
        e1 = attach_col(
            edges_m, "src", alive, "entity_id", "alive", "a_src",
            n_buckets=n_buckets, how="inner",
        )
        e2 = attach_col(
            e1, "dst", alive, "entity_id", "alive", "a_dst",
            n_buckets=n_buckets, how="inner",
        )
        live = e2.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["a_src"], pa.scalar(1, type=pa.int64())),
                    pc.equal(t["a_dst"], pa.scalar(1, type=pa.int64())),
                )
            ).select(["src"]),
            batch_format="pyarrow",
        )
        deg = bucketed_group_sum(
            live, keys=["src"], count_col="d", n_buckets=n_buckets
        )
        withdeg = attach_col(
            alive, "entity_id", deg, "src", "d", "d",
            n_buckets=n_buckets, how="left", fill=0,
        )
        alive = withdeg.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t["entity_id"],
                    "alive": pc.if_else(
                        pc.and_(
                            pc.equal(t["alive"], pa.scalar(1, type=pa.int64())),
                            pc.greater_equal(
                                pc.fill_null(t["d"], 0).cast(pa.int64()),
                                pa.scalar(k, type=pa.int64()),
                            ),
                        ),
                        pa.scalar(1, type=pa.int64()),
                        pa.scalar(0, type=pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return alive.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity_id"], "in_core": t["alive"]}
        ),
        batch_format="pyarrow",
    )


def _middle_pairs(
    nb: "ray.data.Dataset",
    n_buckets: int = 64,
    with_term: bool = False,
) -> "ray.data.Dataset":
    """Expand the neighbor relation per middle node: for each ``m``, all
    sorted pairs ``(a < b)`` of entities adjacent to ``m`` — the
    common-neighbor inverted index.  ``with_term`` also emits
    ``1_000_000 // deg(m)`` (resource allocation's per-middle floored
    term; ``deg(m)`` IS the group size because ``nb`` is distinct).
    Output volume is Σ_m deg(m)² — see module docstring."""

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "e": t["e"],
                "m": t["m"],
                "bucket": pa.array(_crc_bucket(t["m"].to_pylist(), n_buckets)),
            }
        )

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized triangular expansion: the self-merge on m yields
        # each ordered pair of m's (distinct) neighbors once; keeping
        # a < b keeps each unordered pair exactly once
        nbg = group[["e", "m"]]
        merged = nbg.merge(nbg, on="m", suffixes=("_x", "_y"))
        merged = merged[merged["e_x"] < merged["e_y"]]
        out = pd.DataFrame(
            {"a": merged["e_x"].to_numpy(), "b": merged["e_y"].to_numpy()}
        )
        if with_term:
            deg = nbg["m"].value_counts()
            out["term"] = (
                np.int64(1_000_000)
                // merged["m"].map(deg).to_numpy(dtype=np.int64)
            )
        return out

    return (
        nb.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand, batch_format="pandas")
    )


def neighbor_jaccard_ds(
    edges_sym: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_neighbor_jaccard``: middle-node pair
    expansion → per-pair common-neighbor count (inter), two bucketed
    degree joins, exact ``inter·10⁶ // union``."""
    nb = neighbors_ds(edges_sym, n_buckets).materialize()
    deg = bucketed_group_sum(
        nb, keys=["e"], count_col="d", n_buckets=n_buckets
    ).materialize()
    inter = bucketed_group_sum(
        _middle_pairs(nb, n_buckets),
        keys=["a", "b"],
        count_col="inter",
        n_buckets=n_buckets,
    )
    j1 = attach_col(inter, "a", deg, "e", "d", "da", n_buckets, how="inner")
    j2 = attach_col(j1, "b", deg, "e", "d", "db", n_buckets, how="inner")

    def finalize(t: pa.Table) -> pa.Table:
        inter_v = np.asarray(t["inter"]).astype(np.int64)
        union_v = (
            np.asarray(t["da"]).astype(np.int64)
            + np.asarray(t["db"]).astype(np.int64)
            - inter_v
        )
        return pa.table(
            {
                "a": t["a"].cast(pa.string()),
                "b": t["b"].cast(pa.string()),
                "inter": pa.array(inter_v),
                "union_n": pa.array(union_v),
                "jac_ppm": pa.array(inter_v * np.int64(1_000_000) // union_v),
            }
        )

    return j2.map_batches(finalize, batch_format="pyarrow")


def resource_allocation_ds(
    edges_sym: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_resource_allocation``: each middle
    emits its floored ``10⁶ // deg(m)`` term onto its neighbor pairs,
    one bounded-bucket group-sum accumulates per pair — per-middle-floor
    semantics identical to the driver core and the SQL twin."""
    nb = neighbors_ds(edges_sym, n_buckets).materialize()
    pairs = _middle_pairs(nb, n_buckets, with_term=True)
    return bucketed_group_sum(
        pairs, keys=["a", "b"], sum_cols={"ra_ppm": "term"},
        count_col=None, n_buckets=n_buckets,
    )


def triangles_ds(
    nodes: "ray.data.Dataset",
    edges_canon: "ray.data.Dataset",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_triangle_counts``: per-middle neighbor
    pairs semi-join the canonical (a<b unique) edge set bucketed by pair
    hash; every match is one triangle credited to its MIDDLE (each
    triangle surfaces exactly once per corner as middle), so the group
    count per middle IS diag(A³)//2."""
    edges_sym = edges_canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t["a"].combine_chunks().cast(pa.string()),
                        t["b"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t["b"].combine_chunks().cast(pa.string()),
                        t["a"].combine_chunks().cast(pa.string()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    nb = neighbors_ds(edges_sym, n_buckets).materialize()

    def pair_bucket(a_vals, b_vals) -> np.ndarray:
        return np.fromiter(
            (
                zlib.crc32(f"{a}\x00{b}".encode("utf-8")) % n_buckets
                for a, b in zip(a_vals, b_vals)
            ),
            dtype=np.int64,
            count=len(a_vals),
        )

    def tag_pairs(t: pa.Table) -> pa.Table:
        # carries the middle through the semi-join (kind 0 = candidate)
        return pa.table(
            {
                "a": t["a"].cast(pa.string()),
                "b": t["b"].cast(pa.string()),
                "mid": t["mid"].cast(pa.string()),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "bucket": pa.array(
                    pair_bucket(t["a"].to_pylist(), t["b"].to_pylist())
                ),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["a"].cast(pa.string()),
                "b": t["b"].cast(pa.string()),
                "mid": pa.nulls(t.num_rows, type=pa.string()),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "bucket": pa.array(
                    pair_bucket(t["a"].to_pylist(), t["b"].to_pylist())
                ),
            }
        )

    # pair expansion that KEEPS the middle (unlike _middle_pairs)
    def tag_nb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "e": t["e"],
                "m": t["m"],
                "bucket": pa.array(_crc_bucket(t["m"].to_pylist(), n_buckets)),
            }
        )

    def expand_with_mid(group: pd.DataFrame) -> pd.DataFrame:
        # same vectorized self-merge as _middle_pairs, keeping the middle
        nbg = group[["e", "m"]]
        merged = nbg.merge(nbg, on="m", suffixes=("_x", "_y"))
        merged = merged[merged["e_x"] < merged["e_y"]]
        return pd.DataFrame(
            {
                "a": merged["e_x"].to_numpy(),
                "b": merged["e_y"].to_numpy(),
                "mid": merged["m"].to_numpy(),
            }
        )

    cand = (
        nb.map_batches(tag_nb, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand_with_mid, batch_format="pandas")
    )

    def semi_join(group: pa.Table) -> pa.Table:
        kind = group["kind"]
        edge_df = (
            group.filter(pc.equal(kind, 1)).select(["a", "b"]).to_pandas()
        )
        cand_df = (
            group.filter(pc.equal(kind, 0))
            .select(["a", "b", "mid"])
            .to_pandas()
        )
        # vectorized semi-join: candidate pairs that ARE canonical edges
        matched_df = cand_df.merge(edge_df, on=["a", "b"], how="inner")
        return pa.table(
            {"entity_id": pa.array(matched_df["mid"], type=pa.string())}
        )

    matched = (
        cand.map_batches(tag_pairs, batch_format="pyarrow")
        .union(edges_canon.map_batches(tag_edges, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(semi_join, batch_format="pyarrow")
    )
    tri = bucketed_group_sum(
        matched, keys=["entity_id"], count_col="n_triangles",
        n_buckets=n_buckets,
    )
    out = attach_col(
        nodes, "entity_id", tri, "entity_id", "n_triangles", "n_triangles",
        n_buckets=n_buckets, how="left", fill=0,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t["entity_id"],
                "n_triangles": pc.fill_null(t["n_triangles"], 0).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def clustering_coefficient_ds(
    nodes: "ray.data.Dataset",
    edges_canon: "ray.data.Dataset",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_clustering_coefficient``: distributed
    triangles + distinct-neighbor degree, joined per node;
    ``cc_ppm = 2·tri·10⁶ // (d·(d−1))`` for d ≥ 2 else 0."""
    edges_sym = edges_canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t["a"].combine_chunks().cast(pa.string()),
                        t["b"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t["b"].combine_chunks().cast(pa.string()),
                        t["a"].combine_chunks().cast(pa.string()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    nb = neighbors_ds(edges_sym, n_buckets)
    deg = bucketed_group_sum(nb, keys=["e"], count_col="d", n_buckets=n_buckets)
    tri = triangles_ds(nodes, edges_canon, n_buckets)
    withdeg = attach_col(
        tri, "entity_id", deg, "e", "d", "degree",
        n_buckets=n_buckets, how="left", fill=0,
    )

    def finalize(t: pa.Table) -> pa.Table:
        d = np.asarray(
            pc.fill_null(t["degree"], 0).cast(pa.int64())
        ).astype(np.int64)
        tri_v = np.asarray(t["n_triangles"]).astype(np.int64)
        cc = np.where(
            d >= 2,
            (2 * tri_v * 1_000_000) // np.maximum(d * (d - 1), 1),
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "entity_id": t["entity_id"],
                "degree": pa.array(d),
                "triangles": pa.array(tri_v),
                "cc_ppm": pa.array(cc),
            }
        )

    return withdeg.map_batches(finalize, batch_format="pyarrow")


def cooccur_conditional_ds(
    cooc: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distributed twin of ``entity_cooccur_conditional``: symmetrize,
    marginals via one bounded-bucket group-sum, one bucketed join back,
    ``cond_ppm = w·10⁶ // m(subj)`` in arbitrary-precision ints (the
    HUGEINT rule)."""
    edges = cooc.map_batches(
        lambda t: pa.table(
            {
                "subj": pa.concat_arrays(
                    [
                        t["subj"].combine_chunks().cast(pa.string()),
                        t["obj"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "obj": pa.concat_arrays(
                    [
                        t["obj"].combine_chunks().cast(pa.string()),
                        t["subj"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "weight": pa.concat_arrays(
                    [t["weight"].combine_chunks().cast(pa.int64())] * 2
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    marg = bucketed_group_sum(
        edges.map_batches(
            lambda t: pa.table({"ent": t["subj"], "w": t["weight"]}),
            batch_format="pyarrow",
        ),
        keys=["ent"],
        sum_cols={"m": "w"},
        count_col=None,
        n_buckets=n_buckets,
    )
    joined = attach_col(
        edges, "subj", marg, "ent", "m", "m", n_buckets=n_buckets, how="inner"
    )

    def finalize(t: pa.Table) -> pa.Table:
        cond = [
            (int(w) * 1_000_000) // int(m)
            for w, m in zip(t["weight"].to_pylist(), t["m"].to_pylist())
        ]
        return pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "weight": t["weight"],
                "cond_ppm": pa.array(
                    np.fromiter(cond, dtype=np.int64, count=len(cond))
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def negative_samples_ds(
    cooc: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    k: int = 2,
    broadcast_limit: int = 50_000_000,
) -> "ray.data.Dataset":
    """Distributed twin of ``kg_negative_samples``: the sorted node
    vocabulary broadcasts ONCE (``ray.put``; loud guard above
    ``broadcast_limit`` — positional indexing needs the whole sorted
    array) and edges stream through ``map_batches`` applying the
    identical ``nodes[md5(subj|obj|i) % n]`` rule."""
    n_nodes = nodes.count()
    if n_nodes > broadcast_limit:
        raise RuntimeError(
            f"negative_samples_ds: {n_nodes} nodes exceed the "
            f"{broadcast_limit} broadcast guard; raise broadcast_limit "
            "only if workers can hold the sorted vocabulary"
        )
    arr = np.sort(
        np.asarray(
            [r["entity_id"] for r in nodes.take_all()], dtype=object
        )
    )
    arr_ref = ray.put(arr)

    def corrupt(t: pa.Table) -> pa.Table:
        from ner_funtool_ray.functions.md5vec import md5_number_lower_batch

        nodes_arr = ray.get(arr_ref)
        n = len(nodes_arr)
        subs = t["subj"].to_pylist()
        objs = t["obj"].to_pylist()
        subj_out, obj_out, neg_out, i_out = [], [], [], []
        for i in range(1, k + 1):
            keys = [f"{s}|{o}|{i}" for s, o in zip(subs, objs)]
            h = md5_number_lower_batch(keys)
            idx = (h % np.uint64(n)).astype(np.int64)
            subj_out.extend(subs)
            obj_out.extend(objs)
            neg_out.extend(nodes_arr[idx])
            i_out.extend([i] * len(subs))
        return pa.table(
            {
                "subj": pa.array(subj_out, type=pa.string()),
                "obj": pa.array(obj_out, type=pa.string()),
                "neg_obj": pa.array(neg_out, type=pa.string()),
                "i": pa.array(np.array(i_out, dtype=np.int64)),
            }
        )

    return cooc.map_batches(corrupt, batch_format="pyarrow")


def shared_member_pairs_ds(
    membership: "ray.data.Dataset",
    min_shared: int = 2,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed twin of ``source_shared_entity_pairs``: the bipartite
    projection as entity-bucketed pair expansion (entities as shingles —
    the ``ngram_jaccard_pairs`` plan).  ``membership`` has columns
    ``(entity, doc)``; output ``(a, b, shared)`` for doc pairs sharing ≥
    ``min_shared`` distinct entities."""
    ap = bucketed_group_sum(
        membership, keys=["entity", "doc"], count_col="__c",
        n_buckets=n_buckets,
    ).drop_columns(["__c"])
    nb = ap.map_batches(
        lambda t: pa.table(
            {"e": t["doc"].cast(pa.string()), "m": t["entity"].cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    pairs = _middle_pairs(nb, n_buckets)
    shared = bucketed_group_sum(
        pairs, keys=["a", "b"], count_col="shared", n_buckets=n_buckets
    )
    return shared.map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                t["shared"].cast(pa.int64()),
                pa.scalar(min_shared, type=pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )


def hits_ds(
    membership: "ray.data.Dataset",
    iters: int = 3,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed HITS over a bipartite membership layer — hubs are the
    ``entity`` side, authorities the ``doc`` side.  The distributed twin
    of ``pipelines/graph.entity_source_hits``'s driver core (same int64
    fixed-point rule, parity-tested via ``driver_cap=0``).

    Per iteration: (1) hub scores meet their edges in an entity-bucketed
    ``attach_col`` join and a doc-bucketed group sum produces raw
    authorities; (2) one scalar ``sum()`` yields the normalizer and a
    streaming ``map_batches`` rescales to fixed point (sum-normalization
    — ``(raw·SCALE)//total`` — instead of the classic L2 norm, so every
    step stays in exactly-reproducible integer arithmetic); (3) the
    mirrored join + group sum + rescale rewrites hubs.  Every shuffle is
    a bounded-bucket exchange; each side's scores move once per join.
    Overflow-safe by construction: ``h0 = SCALE // n`` makes each side's
    total ≤ SCALE = 10⁹ forever, so ``raw·SCALE ≤ 10¹⁸ < 2⁶³``.

    ``membership`` has columns ``(entity, doc)`` (distinct pairs); output
    ``(entity_id, hub_fp)``.
    """
    edges = bucketed_group_sum(
        membership, keys=["entity", "doc"], count_col="__c",
        n_buckets=n_buckets,
    ).drop_columns(["__c"]).materialize()
    ents = bucketed_group_sum(
        edges, keys=["entity"], count_col="__c", n_buckets=n_buckets
    ).drop_columns(["__c"]).materialize()
    n = ents.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([], type=pa.string()),
                    "hub_fp": pa.array([], type=pa.int64()),
                }
            )
        )
    h0 = np.int64(SCALE // np.int64(n))

    def _init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": t["entity"].cast(pa.string()),
                "h": pa.array(np.full(t.num_rows, h0, dtype=np.int64)),
            }
        )

    h = ents.map_batches(_init, batch_format="pyarrow").materialize()

    def _rescale(key: str, raw: str, out: str, total: int):
        tot = np.int64(total)

        def fn(t: pa.Table) -> pa.Table:
            vals = np.asarray(t[raw]).astype(np.int64)
            return pa.table(
                {
                    key: t[key].cast(pa.string()),
                    out: pa.array((vals * SCALE) // tot),
                }
            )

        return fn

    for _ in range(iters):
        eh = attach_col(edges, "entity", h, "entity", "h", "__h",
                        n_buckets=n_buckets)
        a_raw = bucketed_group_sum(
            eh, keys=["doc"], sum_cols={"__ar": "__h"}, count_col=None,
            n_buckets=n_buckets,
        ).materialize()
        a_tot = int(a_raw.sum("__ar"))
        a = a_raw.map_batches(
            _rescale("doc", "__ar", "a", a_tot), batch_format="pyarrow"
        )
        ea = attach_col(edges, "doc", a, "doc", "a", "__a",
                        n_buckets=n_buckets)
        h_raw = bucketed_group_sum(
            ea, keys=["entity"], sum_cols={"__hr": "__a"}, count_col=None,
            n_buckets=n_buckets,
        ).materialize()
        h_tot = int(h_raw.sum("__hr"))
        h = h_raw.map_batches(
            _rescale("entity", "__hr", "h", h_tot), batch_format="pyarrow"
        ).materialize()

    return h.map_batches(
        lambda t: pa.table(
            {"entity_id": t["entity"].cast(pa.string()), "hub_fp": t["h"]}
        ),
        batch_format="pyarrow",
    )
