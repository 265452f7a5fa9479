"""Graph analytics over the constructed knowledge graph.

The KG built by ``pipelines/kg.py`` (reference semantics:
``get_entity``-style mention extraction -> co-occurrence edges, see
reference ``model_predict.py`` / ``data_utils.py:get_entity``) is a
weighted entity graph.  This module ranks its nodes with PageRank in
**integer fixed-point arithmetic** so that a fixed number of iterations
is bit-reproducible across engines: every operation is int64 add /
multiply / floor-divide (all values non-negative, so floor == trunc),
which makes the DuckDB twin — the same iterations unrolled as chained
CTEs — hash-exact, with none of the float-summation-order drift that
rules out a naive float PageRank oracle.

Update rule (damping 0.85 as the rational 85/100, rank scale 1e9):

    r0(v)   = SCALE
    inc(v)  = sum over in-edges (u,v,w) of (r(u) * w) // outw(u)
    r'(v)   = (15*SCALE)//100 + (85 * inc(v)) // 100

Two execution paths share the identical math:

- ``_pagerank_numpy`` — vectorized scatter-add on the driver.  This is
  the PRODUCTION path for the entity graph: nodes are bounded by the
  gazetteer and edges by gazetteer^2 (the same bound that makes the
  gazetteer broadcastable), so the aggregated graph is sketch-sized no
  matter how many petabytes of documents produced it.
- ``pagerank_ds`` — fully distributed: per iteration one src-bucketed
  join (ranks ride to their edges), one bounded-bucket group sum over
  contributions, and one dst-bucketed zero-fill join.  This is the
  scale path for UNBOUNDED graphs (e.g. doc-doc similarity edges) where
  neither nodes nor edges fit a driver; parity-tested against the numpy
  core.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ner_funtool_ray.utils import pa_from_pandas

SCALE = np.int64(1_000_000_000)
BASE = np.int64((15 * 1_000_000_000) // 100)

__all__ = [
    "entity_pagerank",
    "pagerank_ds",
    "make_pagerank_sql",
]


def _pagerank_numpy(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n_nodes: int, iters: int
) -> np.ndarray:
    """Fixed-point PageRank core (see module docstring for the rule)."""
    outw = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(outw, src, w.astype(np.int64))
    ow = outw[src]  # > 0 for every edge source by construction
    r = np.full(n_nodes, SCALE, dtype=np.int64)
    for _ in range(iters):
        contrib = (r[src] * w) // ow
        inc = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(inc, dst, contrib)
        r = BASE + (np.int64(85) * inc) // np.int64(100)
    return r


def _bucket_str(s: pd.Series, n_buckets: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(x.encode("utf-8")) % n_buckets for x in s),
        dtype=np.int64,
        count=len(s),
    )


def pagerank_ds(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    iters: int = 5,
    n_buckets: int = 32,
    seed_entity: str | None = None,
    seed_n: int | None = None,
) -> "ray.data.Dataset":
    """Distributed fixed-point PageRank for graphs too large for a
    driver: ``nodes`` has column ``entity_id``; ``edges`` has
    ``src, dst, weight`` (already expanded to directed form).

    Per iteration: (1) ranks hash-bucket by entity and meet their
    out-edges in a src-bucketed group (the shuffle carries rank rows +
    edge rows, never a cross product), emitting per-dst contribution
    partials; (2) a bounded-bucket group sum merges them per dst;
    (3) a dst-bucketed zero-fill join rewrites every node's rank.  All
    arithmetic is the same int64 rule as ``_pagerank_numpy`` (parity
    tested), so either path may serve the oracle.

    ``seed_entity``/``seed_n`` switch the teleport to PERSONALIZED mode
    (``entity_ppr``'s rule): the whole 15% teleport mass — ``(15·SCALE·
    seed_n)//100`` with ``seed_n`` the node count — lands on the seed
    each iteration and every other node's base term is 0."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    # out-weight per src, attached to edges once (src-bucketed join)
    def tag_edges(batch: pa.Table) -> pa.Table:
        df = batch.select(["src", "dst", "weight"]).to_pandas()
        df["bucket"] = _bucket_str(df["src"], n_buckets)
        return pa_from_pandas(df, preserve_index=False)

    edges_b = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def attach_outw(group: pd.DataFrame) -> pd.DataFrame:
        ow = group.groupby("src", sort=False)["weight"].sum()
        out = group.copy()
        out["outw"] = out["src"].map(ow).astype(np.int64)
        return out[["src", "dst", "weight", "outw", "bucket"]]

    # src never spans buckets, so the per-bucket sum IS the global outw
    edges_ow = (
        edges_b.groupby("bucket").map_groups(attach_outw, batch_format="pandas")
    ).materialize()

    def tag_nodes(batch: pa.Table) -> pa.Table:
        df = batch.select(["entity_id"]).to_pandas()
        df["bucket"] = _bucket_str(df["entity_id"], n_buckets)
        return pa_from_pandas(df, preserve_index=False)

    nodes_b = nodes.map_batches(tag_nodes, batch_format="pyarrow").materialize()

    ranks = nodes_b.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, SCALE, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )

    for _ in range(iters):
        # (1) ranks meet their out-edges in the src bucket
        r_tagged = ranks.map_batches(
            lambda t: pa_from_pandas(
                pd.DataFrame(
                    {
                        "src": np.asarray(t["entity_id"]),
                        "dst": "",
                        "weight": np.int64(0),
                        "outw": np.int64(0),
                        "r": np.asarray(t["r"]),
                        "bucket": np.asarray(t["bucket"]),
                        "kind": np.int8(1),
                    }
                ),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        e_tagged = edges_ow.map_batches(
            lambda t: t.append_column(
                "r", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ).append_column("kind", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow",
        )

        def contribs(group: pd.DataFrame) -> pd.DataFrame:
            rk = (
                group[group["kind"] == 1]
                .drop_duplicates("src")
                .set_index("src")["r"]
            )
            e = group[group["kind"] == 0]
            if e.empty:
                return pd.DataFrame(
                    {
                        "dst": pd.Series([], dtype=object),
                        "c": pd.Series([], dtype=np.int64),
                    }
                )
            r_src = e["src"].map(rk).to_numpy(dtype=np.int64)
            c = (r_src * e["weight"].to_numpy(dtype=np.int64)) // e[
                "outw"
            ].to_numpy(dtype=np.int64)
            out = pd.DataFrame({"dst": e["dst"].to_numpy(), "c": c})
            return out.groupby("dst", sort=False, as_index=False)["c"].sum()

        contrib_ds = (
            r_tagged.union(e_tagged)
            .groupby("bucket")
            .map_groups(contribs, batch_format="pandas")
        )

        # (2) global per-dst increment
        inc = bucketed_group_sum(
            contrib_ds, keys=["dst"], sum_cols={"inc": "c"}, count_col=None,
            n_buckets=n_buckets,
        )

        # (3) zero-fill join back onto the node set
        inc_tagged = inc.map_batches(
            lambda t: pa_from_pandas(
                pd.DataFrame(
                    {
                        "entity_id": np.asarray(t["dst"]),
                        "inc": np.asarray(t["inc"]),
                        "bucket": _bucket_str(
                            pd.Series(np.asarray(t["dst"])), n_buckets
                        ),
                        "kind": np.int8(1),
                    }
                ),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        n_tagged = nodes_b.map_batches(
            lambda t: t.append_column(
                "inc", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ).append_column("kind", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow",
        )

        def new_ranks(group: pd.DataFrame) -> pd.DataFrame:
            inc_m = group[group["kind"] == 1].set_index("entity_id")["inc"]
            n = group[group["kind"] == 0]
            iv = n["entity_id"].map(inc_m).fillna(0).to_numpy(dtype=np.int64)
            if seed_entity is None:
                base = BASE
            else:
                # personalized teleport: all mass on the seed, 0 elsewhere
                base = np.where(
                    n["entity_id"].to_numpy() == seed_entity,
                    (np.int64(15) * SCALE * np.int64(seed_n)) // np.int64(100),
                    np.int64(0),
                )
            return pd.DataFrame(
                {
                    "entity_id": n["entity_id"].to_numpy(),
                    "bucket": n["bucket"].to_numpy(dtype=np.int64),
                    "r": base + (np.int64(85) * iv) // np.int64(100),
                }
            )

        ranks = (
            n_tagged.union(inc_tagged)
            .groupby("bucket")
            .map_groups(new_ranks, batch_format="pandas")
        ).materialize()

    return ranks.map_batches(
        lambda t: t.select(["entity_id", "r"]).rename_columns(
            ["entity_id", "pagerank_fp"]
        ),
        batch_format="pyarrow",
    )


def entity_pagerank(
    sf_dir: str, iters: int = 5, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """PageRank over the KG's entity co-occurrence graph.

    The aggregated triple table is gazetteer-bounded (nodes <= |gazetteer|,
    edges <= |gazetteer|^2) regardless of corpus size, so below
    ``driver_cap`` triples the graph is assembled on the driver and ranked
    by the vectorized numpy core — the petabyte-corpus production path.
    Above the cap (a general graph fed in by a caller) it falls back to
    the fully distributed ``pagerank_ds``; both paths share the identical
    int64 update rule."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() <= driver_cap:
        df = triples.to_pandas()
        cooc = df[df["pred"] == "cooccurs_with"]
        nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
        idx = {e: i for i, e in enumerate(nodes)}
        a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
        b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
        w = cooc["weight"].to_numpy(dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        ww = np.concatenate([w, w])
        r = _pagerank_numpy(src, dst, ww, len(nodes), iters)
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array(nodes, type=pa.string()),
                    "pagerank_fp": pa.array(r),
                }
            )
        )

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum
    import pyarrow.compute as pc

    cooc_ds = triples.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], "cooccurs_with")),
        batch_format="pyarrow",
    )
    nodes_ds = bucketed_group_sum(
        triples.map_batches(
            lambda t: pa.table(
                {"entity_id": t.filter(pc.equal(t["pred"], "appears_in"))["subj"]}
            ),
            batch_format="pyarrow",
        ),
        keys=["entity_id"],
        count_col="n",
    ).drop_columns(["n"])

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa_from_pandas(
            pd.DataFrame(
                {
                    "src": np.concatenate([df["subj"], df["obj"]]),
                    "dst": np.concatenate([df["obj"], df["subj"]]),
                    "weight": np.concatenate([df["weight"], df["weight"]]).astype(
                        np.int64
                    ),
                }
            ),
            preserve_index=False,
        )

    edges_ds = cooc_ds.map_batches(expand, batch_format="pyarrow")
    return pagerank_ds(nodes_ds, edges_ds, iters=iters)


def make_pagerank_sql(triples_sql: str, iters: int = 5) -> str:
    """DuckDB twin: the identical fixed-point iterations unrolled as
    chained CTEs over the (already oracle-exact) triples SQL.  Integer
    ``//`` floor-division matches numpy's on the non-negative domain."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst, weight FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst, weight FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w"
        " FROM edges GROUP BY src),\n"
        "r0 AS (SELECT entity_id, CAST(1000000000 AS BIGINT) AS r FROM nodes)"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT n.entity_id,
         CAST(150000000 + (85 * COALESCE(CAST(
             SUM((pr.r * e.weight) // o.w) AS BIGINT), 0)) // 100
           AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.entity_id
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r{i - 1} pr ON pr.entity_id = e.src
  GROUP BY n.entity_id
)"""
        )
    parts.append(f"\nSELECT entity_id, r AS pagerank_fp FROM r{iters}")
    return "".join(parts)


INF = np.int64(999_999_999)


def entity_bfs_depth(
    sf_dir: str, rounds: int = 6, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Bounded-round BFS hop distance from a deterministic seed (the
    lexicographically smallest entity) over the KG co-occurrence graph —
    min-plus label propagation, the same bounded-round shuffle family as
    ``stages/dedup.clusters_from_pairs_ds``.  Depth is int64 (unreached
    after ``rounds`` = -1), so the unrolled-CTE twin is hash-exact.  The
    aggregated graph is gazetteer-bounded (see ``entity_pagerank``); the
    numpy path is the production path, and a general-graph distributed
    run applies the identical per-round rule inside
    ``stages/graphops.bfs_depth_ds``'s bucketed rounds (parity-tested)."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import bfs_depth_ds

        nodes, cooc = _graph_parts_ds(triples)
        return bfs_depth_ds(nodes, _sym_edges_ds(cooc), rounds=rounds)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    d = np.full(len(nodes), INF, dtype=np.int64)
    if len(nodes):
        d[0] = 0  # nodes sorted -> index 0 IS min(entity_id)
    for _ in range(rounds):
        nd = d.copy()
        np.minimum.at(nd, dst, d[src] + 1)
        d = np.minimum(d, nd)
    depth = np.where(d >= INF, np.int64(-1), d)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "depth": pa.array(depth),
            }
        )
    )


def make_bfs_sql(triples_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of ``entity_bfs_depth``: the identical min-plus rounds
    unrolled as chained CTEs."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "seed AS (SELECT min(entity_id) AS id FROM nodes),\n"
        "d0 AS (SELECT entity_id, CASE WHEN entity_id = (SELECT id FROM seed)"
        " THEN 0 ELSE 999999999 END AS d FROM nodes)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT n.entity_id,
         LEAST(MIN(p.d), COALESCE(MIN(q.d + 1), 999999999)) AS d
  FROM nodes n
  JOIN d{i - 1} p ON p.entity_id = n.entity_id
  LEFT JOIN edges e ON e.dst = n.entity_id
  LEFT JOIN d{i - 1} q ON q.entity_id = e.src AND q.d < 999999999
  GROUP BY n.entity_id
)"""
        )
    parts.append(
        f"\nSELECT entity_id, CAST(CASE WHEN d >= 999999999 THEN -1 ELSE d END"
        f" AS BIGINT) AS depth FROM d{rounds}"
    )
    return "".join(parts)


def entity_triangle_counts(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Per-entity triangle participation over the (deduplicated,
    canonically subj<obj) co-occurrence edge set — the clustering-
    coefficient numerator.  Gazetteer-bounded graph -> dense int64
    adjacency on the driver; n_triangles(v) = diag(A^3)//2, exact
    integer arithmetic, so the 3-way-self-join SQL twin is hash-exact.
    Above the cap, ``stages/graphops.triangles_ds`` runs the
    inverted-index plan (per-middle neighbor pairs semi-joined against
    the canonical edge set) — parity-tested against the matmul."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import triangles_ds

        nodes, cooc = _graph_parts_ds(triples)
        canon = cooc.map_batches(
            lambda t: pa.table(
                {
                    "a": t["subj"].cast(pa.string()),
                    "b": t["obj"].cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        return triangles_ds(nodes, canon)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.int64)
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    A[a, b] = 1
    A[b, a] = 1
    tri = np.diagonal(A @ A @ A) // 2 if n else np.zeros(0, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "n_triangles": pa.array(tri.astype(np.int64)),
            }
        )
    )


def make_triangles_sql(triples_sql: str) -> str:
    """DuckDB twin: triangles as a 3-way self-join over the canonical
    subj<obj edge list; each triangle (x<y<z) contributes once to each
    corner."""
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nodes AS (SELECT DISTINCT subj AS entity_id FROM t WHERE pred = 'appears_in'),
tri AS (
  SELECT ab.subj AS x, ab.obj AS y, bc.obj AS z
  FROM cooc ab
  JOIN cooc bc ON ab.obj = bc.subj
  JOIN cooc ac ON ac.subj = ab.subj AND ac.obj = bc.obj
),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnts AS (SELECT id, count(*)::BIGINT AS c FROM corners GROUP BY id)
SELECT n.entity_id, COALESCE(c.c, 0)::BIGINT AS n_triangles
FROM nodes n LEFT JOIN cnts c ON c.id = n.entity_id
"""


__all__ += ["entity_bfs_depth", "make_bfs_sql", "entity_triangle_counts",
            "make_triangles_sql"]


def _cooc_driver_frame(sf_dir: str, driver_cap: int):
    """Shared assembly for the sketch-sized-graph driver paths: the
    aggregated triple table (gazetteer-bounded regardless of corpus
    size), or None when it exceeds the cap and callers must take the
    distributed plan."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        return triples, None
    return triples, triples.to_pandas()


def _graph_parts_ds(triples: "ray.data.Dataset"):
    """Distributed counterpart of ``_cooc_driver_frame``: the node set
    (distinct ``appears_in`` subjects, via one bounded-bucket distinct)
    and the canonical co-occurrence edge table, both as Datasets — the
    inputs every ``stages/graphops`` core takes."""
    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    cooc = triples.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], "cooccurs_with")).select(
            ["subj", "obj", "weight"]
        ),
        batch_format="pyarrow",
    )
    nodes = bucketed_group_sum(
        triples.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t.filter(
                        pc.equal(t["pred"], "appears_in")
                    )["subj"]
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["entity_id"],
        count_col="__n",
    ).drop_columns(["__n"])
    return nodes, cooc


def _sym_edges_ds(cooc: "ray.data.Dataset") -> "ray.data.Dataset":
    """Symmetrize the canonical co-occurrence edges to directed form
    (``src, dst, weight`` both ways)."""

    def expand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t["subj"].combine_chunks().cast(pa.string()),
                        t["obj"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t["obj"].combine_chunks().cast(pa.string()),
                        t["subj"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "weight": pa.concat_arrays(
                    [t["weight"].combine_chunks().cast(pa.int64())] * 2
                ),
            }
        )

    return cooc.map_batches(expand, batch_format="pyarrow")


def entity_cooccurrence_lift(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Association strength of each co-occurrence edge: ``lift_ppm =
    floor(w(a,b) · W · 1e6 / (m(a) · m(b)))`` where ``m`` is the entity's
    total incident weight and ``W`` the graph's total edge weight — the
    integer-exact stand-in for PMI (no transcendental log, so the DuckDB
    twin is hash-exact via HUGEINT arithmetic; the driver path uses
    arbitrary-precision Python ints for the same reason).

    Driver path below the cap (the aggregated graph is sketch-sized, see
    ``entity_pagerank``); above it, marginals ride a bounded-bucket group
    sum and attach to edges through two bucketed joins — parity-tested."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is not None:
        cooc = df[df["pred"] == "cooccurs_with"]
        w = cooc["weight"].astype(object)  # Python ints: no int64 overflow
        tw = int(cooc["weight"].sum())
        marg: dict[str, int] = {}
        for ent, ww in zip(
            pd.concat([cooc["subj"], cooc["obj"]]),
            pd.concat([cooc["weight"], cooc["weight"]]),
        ):
            marg[ent] = marg.get(ent, 0) + int(ww)
        lift = [
            (int(wi) * tw * 1_000_000) // (marg[a] * marg[b])
            for a, b, wi in zip(cooc["subj"], cooc["obj"], w)
        ]
        return ray.data.from_arrow(
            pa.table(
                {
                    "subj": pa.array(cooc["subj"], type=pa.string()),
                    "obj": pa.array(cooc["obj"], type=pa.string()),
                    "weight": pa.array(
                        cooc["weight"].to_numpy(np.int64), type=pa.int64()
                    ),
                    "lift_ppm": pa.array(
                        np.fromiter(lift, dtype=np.int64, count=len(lift))
                    ),
                }
            )
        )

    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    cooc_ds = triples.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], "cooccurs_with")).select(
            ["subj", "obj", "weight"]
        ),
        batch_format="pyarrow",
    )
    tw = int(cooc_ds.sum("weight"))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pa.concat_arrays(
                    [
                        t["subj"].combine_chunks().cast(pa.string()),
                        t["obj"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "w": pa.concat_arrays(
                    [t["weight"].combine_chunks()] * 2
                ).cast(pa.int64()),
            }
        )

    marginals = bucketed_group_sum(
        cooc_ds.map_batches(endpoints, batch_format="pyarrow"),
        keys=["entity"],
        sum_cols={"mw": "w"},
        count_col=None,
    )

    n_buckets = 64

    def _attach(side: str):
        # edges meet the marginal of `side` in that entity's hash bucket
        def tag_edges(t: pa.Table) -> pa.Table:
            df_ = t.to_pandas()
            df_["bucket"] = _bucket_str(df_[side], n_buckets)
            df_["is_marg"] = np.int8(0)
            return pa_from_pandas(df_, preserve_index=False)

        def tag_marg(t: pa.Table) -> pa.Table:
            df_ = t.to_pandas()
            df_["bucket"] = _bucket_str(df_["entity"], n_buckets)
            df_["is_marg"] = np.int8(1)
            return pa_from_pandas(df_, preserve_index=False)

        out_col = f"m_{side}"

        def join(group: pd.DataFrame) -> pd.DataFrame:
            m = group[group["is_marg"] == 1]
            e = group[group["is_marg"] == 0].drop(
                columns=["entity", "mw", "is_marg", "bucket"], errors="ignore"
            )
            if e.empty:
                e[out_col] = pd.Series([], dtype="int64")
                return e
            lut = dict(zip(m["entity"], m["mw"]))
            e = e.copy()
            e[out_col] = e[side].map(lut).astype("int64")
            return e

        return tag_edges, tag_marg, join

    edges = cooc_ds
    for side in ("subj", "obj"):
        tag_edges, tag_marg, join = _attach(side)
        edges = (
            edges.map_batches(tag_edges, batch_format="pyarrow")
            .union(marginals.map_batches(tag_marg, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(join, batch_format="pandas")
        )

    def finalize(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        lift = [
            (int(w) * tw * 1_000_000) // (int(ma) * int(mb))
            for w, ma, mb in zip(df_["weight"], df_["m_subj"], df_["m_obj"])
        ]
        return pa.table(
            {
                "subj": pa.array(df_["subj"], type=pa.string()),
                "obj": pa.array(df_["obj"], type=pa.string()),
                "weight": pa.array(df_["weight"].to_numpy(np.int64)),
                "lift_ppm": pa.array(
                    np.fromiter(lift, dtype=np.int64, count=len(lift))
                ),
            }
        )

    return edges.map_batches(finalize, batch_format="pyarrow")


def make_lift_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),
tot AS (SELECT CAST(sum(weight) AS HUGEINT) AS tw FROM cooc),
m AS (
  SELECT entity, CAST(sum(w) AS HUGEINT) AS mw FROM (
    SELECT subj AS entity, weight AS w FROM cooc
    UNION ALL SELECT obj AS entity, weight AS w FROM cooc
  ) GROUP BY entity
)
SELECT c.subj, c.obj, CAST(c.weight AS BIGINT) AS weight,
       CAST((CAST(c.weight AS HUGEINT) * tot.tw * 1000000)
            // (ma.mw * mb.mw) AS BIGINT) AS lift_ppm
FROM cooc c
CROSS JOIN tot
JOIN m ma ON ma.entity = c.subj
JOIN m mb ON mb.entity = c.obj
"""


def entity_two_hop_counts(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Size of each entity's 2-hop neighborhood: distinct entities ``c ≠ a``
    reachable by a path ``a–b–c`` over the undirected co-occurrence graph
    (1-hop neighbors count when they close such a path), zero-filled over
    all nodes.

    Driver path: one boolean matmul on the sketch-sized aggregated graph.
    Distributed path: middle-node bucket expansion → pair dedup → count,
    all bounded-bucket shuffles — parity-tested against the matmul."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is not None:
        cooc = df[df["pred"] == "cooccurs_with"]
        nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
        idx = {e: i for i, e in enumerate(nodes)}
        n = len(nodes)
        a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
        b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
        A = np.zeros((n, n), dtype=bool)
        A[a, b] = True
        A[b, a] = True
        R = (A.astype(np.int32) @ A.astype(np.int32)) > 0
        np.fill_diagonal(R, False)
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array(nodes, type=pa.string()),
                    "two_hop": pa.array(R.sum(axis=1).astype(np.int64)),
                }
            )
        )

    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    n_buckets = 64

    def und_edges(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.equal(t["pred"], "cooccurs_with"))
        df_ = tt.to_pandas()
        out = pd.DataFrame(
            {
                "mid": np.concatenate([df_["obj"], df_["subj"]]),
                "end": np.concatenate([df_["subj"], df_["obj"]]),
            }
        )
        out["bucket"] = _bucket_str(out["mid"], n_buckets)
        return pa_from_pandas(out, preserve_index=False)

    def expand_pairs(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in group.groupby("mid", sort=False):
            ends = g["end"].unique()
            i, j = np.meshgrid(
                np.arange(len(ends)), np.arange(len(ends)), indexing="ij"
            )
            keep = i.ravel() != j.ravel()
            outs.append(
                pd.DataFrame(
                    {"entity": ends[i.ravel()[keep]], "nbr": ends[j.ravel()[keep]]}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "nbr": pd.Series([], dtype=object)}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = (
        triples.map_batches(und_edges, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand_pairs, batch_format="pandas")
    )
    distinct = bucketed_group_sum(pairs, keys=["entity", "nbr"], count_col="n")
    counts = bucketed_group_sum(
        distinct.drop_columns(["n"]), keys=["entity"], count_col="two_hop"
    )

    def node_rows(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.equal(t["pred"], "appears_in"))
        df_ = pd.DataFrame({"entity": tt["subj"].to_pandas().unique()})
        df_["two_hop"] = np.int64(0)
        df_["is_node"] = np.int8(1)
        df_["bucket"] = _bucket_str(df_["entity"], n_buckets)
        return pa_from_pandas(df_, preserve_index=False)

    def tag_counts(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        df_["is_node"] = np.int8(0)
        df_["bucket"] = _bucket_str(df_["entity"], n_buckets)
        return pa_from_pandas(df_, preserve_index=False)

    def zero_fill(group: pd.DataFrame) -> pd.DataFrame:
        nodes_ = group.loc[group["is_node"] == 1, ["entity"]].drop_duplicates()
        cnts = group[group["is_node"] == 0]
        lut = dict(zip(cnts["entity"], cnts["two_hop"]))
        nodes_ = nodes_.copy()
        nodes_["two_hop"] = (
            nodes_["entity"].map(lut).fillna(0).astype("int64")
        )
        return nodes_.rename(columns={"entity": "entity_id"})

    return (
        triples.map_batches(node_rows, batch_format="pyarrow")
        .union(counts.map_batches(tag_counts, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(zero_fill, batch_format="pandas")
    )


def make_two_hop_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
edges AS (SELECT subj AS src, obj AS dst FROM cooc
          UNION ALL SELECT obj AS src, subj AS dst FROM cooc),
nodes AS (SELECT DISTINCT subj AS entity_id FROM t WHERE pred = 'appears_in'),
two AS (
  SELECT e1.src AS a, count(DISTINCT e2.dst) AS c
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
  WHERE e2.dst <> e1.src
  GROUP BY e1.src
)
SELECT n.entity_id, CAST(COALESCE(two.c, 0) AS BIGINT) AS two_hop
FROM nodes n LEFT JOIN two ON two.a = n.entity_id
"""


__all__ += ["entity_cooccurrence_lift", "make_lift_sql",
            "entity_two_hop_counts", "make_two_hop_sql"]


def entity_degree_histogram(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Degree distribution of the co-occurrence graph → ``(degree,
    n_entities)``: for each entity the number of incident co-occurrence
    edges, then the count-of-counts over those degrees — the standard
    first look at a graph's shape (scale-free tail vs clique blob).

    Driver path below the cap (aggregated graph is sketch-sized, see
    ``entity_pagerank``): two pandas value_counts.  Distributed path:
    endpoints explode → bounded-bucket per-entity count → per-batch
    histogram partials merged on the driver (the histogram domain is
    bounded by the max degree, not the graph) — parity-tested."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is not None:
        cooc = df[df["pred"] == "cooccurs_with"]
        deg = pd.concat([cooc["subj"], cooc["obj"]]).value_counts()
        hist = deg.value_counts().sort_index()
        return ray.data.from_arrow(
            pa.table(
                {
                    "degree": pa.array(
                        hist.index.to_numpy(np.int64), type=pa.int64()
                    ),
                    "n_entities": pa.array(
                        hist.to_numpy(np.int64), type=pa.int64()
                    ),
                }
            )
        )

    import pyarrow.compute as pc

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    cooc_ds = triples.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], "cooccurs_with")).select(
            ["subj", "obj"]
        ),
        batch_format="pyarrow",
    )

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pa.concat_arrays(
                    [
                        t["subj"].combine_chunks().cast(pa.string()),
                        t["obj"].combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    degrees = bucketed_group_sum(
        cooc_ds.map_batches(endpoints, batch_format="pyarrow"),
        keys=["entity"],
        count_col="degree",
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        vc = (
            pd.Series(t["degree"].to_numpy())
            .value_counts()
            .rename_axis("degree")
            .reset_index(name="n_entities")
        )
        return pa_from_pandas(vc, preserve_index=False)

    hist = (
        degrees.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()  # max-degree-bounded by construction
        .groupby("degree", sort=True)["n_entities"]
        .sum()
        .reset_index()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "degree": pa.array(hist["degree"].to_numpy(np.int64)),
                "n_entities": pa.array(hist["n_entities"].to_numpy(np.int64)),
            }
        )
    )


def make_degree_histogram_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
d AS (
  SELECT entity, count(*) AS degree FROM (
    SELECT subj AS entity FROM cooc
    UNION ALL SELECT obj AS entity FROM cooc
  ) GROUP BY entity
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_entities
FROM d GROUP BY degree
"""


__all__ += ["entity_degree_histogram", "make_degree_histogram_sql"]


def entity_components(
    sf_dir: str, rounds: int = 8, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Weakly connected components of the KG co-occurrence graph →
    ``(entity_id, component)`` where ``component`` is the round-bounded
    min-label (the lexicographically smallest entity reachable within
    ``rounds`` hops — for components whose diameter fits, exactly the
    component representative).

    Same bounded-round min-propagation family as ``entity_bfs_depth``;
    because the SQL twin unrolls the IDENTICAL rounds, the two engines
    agree bit-for-bit whether or not a pathological chain has converged.
    The entity graph is gazetteer-bounded (see ``entity_pagerank``), so
    the numpy scatter-min on sorted node INDICES (index order == lexical
    order) is the production path; above the cap,
    ``stages/graphops.components_ds`` runs the identical bounded rounds
    as min-LABEL propagation over entity strings (string min ==
    sorted-index min), parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import components_ds

        nodes, cooc = _graph_parts_ds(triples)
        return components_ds(nodes, _sym_edges_ds(cooc), rounds=rounds)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    lab = np.arange(len(nodes), dtype=np.int64)
    for _ in range(rounds):
        nl = lab.copy()
        np.minimum.at(nl, dst, lab[src])
        lab = np.minimum(lab, nl)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "component": pa.array(nodes[lab], type=pa.string()),
            }
        )
    )


def make_components_sql(triples_sql: str, rounds: int = 8) -> str:
    """DuckDB twin of ``entity_components``: the identical min-label
    rounds unrolled as chained CTEs (string MIN == index MIN because the
    numpy path labels by sorted-node index)."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "l0 AS (SELECT entity_id, entity_id AS l FROM nodes)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
l{i} AS (
  SELECT cur.entity_id,
         min(least(cur.l, coalesce(p.l, cur.l))) AS l
  FROM l{i - 1} cur
  LEFT JOIN edges e ON e.dst = cur.entity_id
  LEFT JOIN l{i - 1} p ON p.entity_id = e.src
  GROUP BY cur.entity_id
)"""
        )
    parts.append(
        f"\nSELECT entity_id, l AS component FROM l{rounds}"
    )
    return "".join(parts)


__all__ += ["entity_components", "make_components_sql"]


def source_shared_entity_pairs(
    sf_dir: str, min_shared: int = 2, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Bipartite projection of the entity→source ``appears_in`` layer →
    ``(a, b, shared)``: source pairs connected through at least
    ``min_shared`` distinct entities (the doc-doc projection step that
    turns a bipartite membership graph into a similarity graph).

    The aggregated bipartite layer is gazetteer × sources — sketch-sized
    at any corpus scale (same bound as ``entity_pagerank``) — so the
    triangular expansion happens on the driver; above the cap,
    ``stages/graphops.shared_member_pairs_ds`` runs the identical
    expansion inside entity-bucketed ``map_groups`` (the
    ``ngram_jaccard_pairs`` plan with entities as shingles),
    parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        import pyarrow.compute as pc

        from ner_funtool_ray.stages.graphops import shared_member_pairs_ds

        membership = triples.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "entity": f["subj"].cast(pa.string()),
                        "doc": f["obj"].cast(pa.string()),
                    }
                )
            )(t.filter(pc.equal(t["pred"], "appears_in"))),
            batch_format="pyarrow",
        )
        return shared_member_pairs_ds(membership, min_shared=min_shared)
    df = triples.to_pandas()
    ap = df[df["pred"] == "appears_in"][["subj", "obj"]].drop_duplicates()
    a_l, b_l = [], []
    for _e, sub in ap.groupby("subj", sort=False):
        docs = np.sort(sub["obj"].unique())
        if len(docs) < 2:
            continue
        iu, ju = np.triu_indices(len(docs), k=1)
        a_l.append(docs[iu])
        b_l.append(docs[ju])
    if not a_l:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.string()),
                    "b": pa.array([], type=pa.string()),
                    "shared": pa.array([], type=pa.int64()),
                }
            )
        )
    pairs = (
        pd.DataFrame({"a": np.concatenate(a_l), "b": np.concatenate(b_l)})
        .groupby(["a", "b"], sort=True)
        .size()
        .rename("shared")
        .reset_index()
    )
    pairs = pairs[pairs["shared"] >= min_shared]
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(pairs["a"], type=pa.string()),
                "b": pa.array(pairs["b"], type=pa.string()),
                "shared": pa.array(
                    pairs["shared"].to_numpy(np.int64), type=pa.int64()
                ),
            }
        )
    )


def make_shared_entity_sql(triples_sql: str, min_shared: int = 2) -> str:
    return f"""
WITH t AS ({triples_sql}),
ap AS (SELECT DISTINCT subj AS entity, obj AS doc FROM t
       WHERE pred = 'appears_in')
SELECT x.doc AS a, y.doc AS b, count(*)::BIGINT AS shared
FROM ap x JOIN ap y ON x.entity = y.entity AND x.doc < y.doc
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


__all__ += ["source_shared_entity_pairs", "make_shared_entity_sql"]


def entity_cooccur_conditional(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Directed conditional edge weights → ``(subj, obj, weight,
    cond_ppm)`` with ``cond_ppm = w(a,b)·10⁶ // m(a)`` — P(obj | subj)
    over the symmetrized co-occurrence graph, the edge normalization a
    random-walk or embedding step consumes.  Both directions are emitted
    (the cooccurrence edge is undirected; the conditional is not).

    Same gazetteer-bounded driver path as ``entity_cooccurrence_lift``
    (Python ints / HUGEINT twin); above the cap,
    ``stages/graphops.cooccur_conditional_ds`` runs the identical math
    with marginals riding a bounded-bucket group sum, parity-tested."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is None:
        from ner_funtool_ray.stages.graphops import cooccur_conditional_ds

        _nodes, cooc_ds = _graph_parts_ds(triples)
        return cooccur_conditional_ds(cooc_ds)
    cooc = df[df["pred"] == "cooccurs_with"]
    marg: dict[str, int] = {}
    for ent, ww in zip(
        pd.concat([cooc["subj"], cooc["obj"]]),
        pd.concat([cooc["weight"], cooc["weight"]]),
    ):
        marg[ent] = marg.get(ent, 0) + int(ww)
    subj = pd.concat([cooc["subj"], cooc["obj"]], ignore_index=True)
    obj = pd.concat([cooc["obj"], cooc["subj"]], ignore_index=True)
    w = pd.concat([cooc["weight"], cooc["weight"]], ignore_index=True)
    cond = [
        (int(wi) * 1_000_000) // marg[a] for a, wi in zip(subj, w)
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
                "weight": pa.array(w.to_numpy(np.int64), type=pa.int64()),
                "cond_ppm": pa.array(
                    np.fromiter(cond, dtype=np.int64, count=len(cond))
                ),
            }
        )
    )


def make_cooccur_conditional_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),
edges AS (
  SELECT subj, obj, weight FROM cooc
  UNION ALL SELECT obj, subj, weight FROM cooc
),
marg AS (
  SELECT subj AS ent, CAST(sum(weight) AS HUGEINT) AS m
  FROM edges GROUP BY subj
)
SELECT e.subj, e.obj, CAST(e.weight AS BIGINT) AS weight,
       CAST(CAST(e.weight AS HUGEINT) * 1000000 // m.m AS BIGINT)
         AS cond_ppm
FROM edges e JOIN marg m ON m.ent = e.subj
"""


def entity_ppr(
    sf_dir: str, iters: int = 5, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Personalized PageRank from a deterministic seed (the
    lexicographically smallest entity) — the localized variant used for
    entity-centric relevance: teleport mass returns to the SEED instead
    of spreading uniformly.

    Update rule (int64 fixed point, same scale as ``entity_pagerank``):
    ``r'(v) = [v = seed]·(15·SCALE·n)//100 + (85·inc(v))//100`` — the
    total teleport mass (15% of n·SCALE) concentrates on the seed, so
    ranks decay with distance from it.  Identical unrolled iterations in
    the twin keep it hash-exact; the entity graph is gazetteer-bounded
    (driver numpy path), and above the cap the same rule runs inside
    ``pagerank_ds``'s rounds with the seed-teleport base (parity-tested)."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import global_min_string

        nodes, cooc = _graph_parts_ds(triples)
        nodes = nodes.materialize()
        seed = global_min_string(nodes, "entity_id")
        n = nodes.count()
        ranks = pagerank_ds(
            nodes, _sym_edges_ds(cooc), iters=iters,
            seed_entity=seed, seed_n=n,
        )
        return ranks.map_batches(
            lambda t: t.rename_columns(["entity_id", "ppr_fp"]),
            batch_format="pyarrow",
        )
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    w = cooc["weight"].to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    ww = np.concatenate([w, w])
    n = len(nodes)
    outw = np.zeros(n, dtype=np.int64)
    np.add.at(outw, src, ww)
    ow = outw[src]
    seed_base = np.zeros(n, dtype=np.int64)
    if n:
        seed_base[0] = (np.int64(15) * SCALE * np.int64(n)) // np.int64(100)
    r = np.full(n, SCALE, dtype=np.int64)
    for _ in range(iters):
        contrib = (r[src] * ww) // ow
        inc = np.zeros(n, dtype=np.int64)
        np.add.at(inc, dst, contrib)
        r = seed_base + (np.int64(85) * inc) // np.int64(100)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "ppr_fp": pa.array(r),
            }
        )
    )


def make_ppr_sql(triples_sql: str, iters: int = 5) -> str:
    """Twin of ``entity_ppr``: the seed-teleport iterations unrolled."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst, weight FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst, weight FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "seed AS (SELECT min(entity_id) AS id,"
        " CAST(count(*) AS BIGINT) AS n FROM nodes),\n"
        "outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w"
        " FROM edges GROUP BY src),\n"
        "r0 AS (SELECT entity_id, CAST(1000000000 AS BIGINT) AS r FROM nodes)"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT n.entity_id,
         CAST(CASE WHEN n.entity_id = (SELECT id FROM seed)
              THEN (CAST(15 AS BIGINT) * 1000000000 * (SELECT n FROM seed))
                   // 100
              ELSE 0 END
           + (85 * COALESCE(CAST(
               SUM((pr.r * e.weight) // o.w) AS BIGINT), 0)) // 100
           AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.entity_id
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r{i - 1} pr ON pr.entity_id = e.src
  GROUP BY n.entity_id
)"""
        )
    parts.append(f"\nSELECT entity_id, r AS ppr_fp FROM r{iters}")
    return "".join(parts)


__all__ += [
    "entity_cooccur_conditional",
    "make_cooccur_conditional_sql",
    "entity_ppr",
    "make_ppr_sql",
]


def kg_negative_samples(
    sf_dir: str, k: int = 2, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Deterministic negative sampling for KG-embedding training →
    ``(subj, obj, neg_obj, i)``: for every co-occurrence edge, ``k``
    corrupted tails drawn by md5 from the entity vocabulary — the
    contrastive-pair generation step of TransE-style training, made
    engine-reproducible (``md5_number_lower`` replaces the RNG, the same
    recipe the linker and every LSH structure use).

    ``neg = nodes[md5(subj|obj|i) % n]`` may collide with the true tail —
    standard for uniform negative sampling and kept (filtering would
    need a second pass; training treats it as label noise).  The entity
    vocabulary is gazetteer-bounded, so generation is driver-side here;
    above the cap ``stages/graphops.negative_samples_ds`` broadcasts the
    sorted node array once (``ray.put``, loud memory guard) and streams
    edges through ``map_batches`` with the identical hash rule,
    parity-tested."""
    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import negative_samples_ds

        nodes, cooc = _graph_parts_ds(triples)
        return negative_samples_ds(cooc, nodes, k=k)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    n = len(nodes)
    subj_out, obj_out, neg_out, i_out = [], [], [], []
    for i in range(1, k + 1):
        keys = [f"{s}|{o}|{i}" for s, o in zip(cooc["subj"], cooc["obj"])]
        h = md5_number_lower_batch(keys)
        idx = (h % np.uint64(n)).astype(np.int64)
        subj_out.extend(cooc["subj"])
        obj_out.extend(cooc["obj"])
        neg_out.extend(nodes[idx])
        i_out.extend([i] * len(cooc))
    return ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(subj_out, type=pa.string()),
                "obj": pa.array(obj_out, type=pa.string()),
                "neg_obj": pa.array(neg_out, type=pa.string()),
                "i": pa.array(np.array(i_out, dtype=np.int64)),
            }
        )
    )


def make_negative_samples_sql(triples_sql: str, k: int = 2) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nodes AS (
  SELECT list(entity_id ORDER BY entity_id) AS l,
         CAST(count(*) AS UBIGINT) AS n
  FROM (SELECT DISTINCT subj AS entity_id FROM t
        WHERE pred = 'appears_in')
)
SELECT c.subj, c.obj,
       nodes.l[CAST(
         md5_number_lower(c.subj || '|' || c.obj || '|' || i.i) % nodes.n
         AS BIGINT) + 1] AS neg_obj,
       CAST(i.i AS BIGINT) AS i
FROM cooc c
CROSS JOIN (SELECT unnest(range(1, {k + 1})) AS i) i, nodes
"""


__all__ += ["kg_negative_samples", "make_negative_samples_sql"]


def entity_neighbor_jaccard(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Link-prediction features → ``(a, b, inter, union_n, jac_ppm)``:
    Jaccard similarity of the neighbor sets of every entity pair that
    SHARES at least one neighbor (the candidate rule — J > 0 implies a
    common neighbor, so recall is 1.0, the ``ngram_jaccard_pairs``
    argument on graphs).  ``jac_ppm`` is the exact scaled integer
    ``inter·10⁶ // union``.

    The entity graph is gazetteer-bounded → driver expansion over the
    common-neighbor inverted index (per middle node, the pair triangle);
    above the cap ``stages/graphops.neighbor_jaccard_ds`` runs the
    identical plan inside middle-node-bucketed ``map_groups``,
    parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import neighbor_jaccard_ds

        _nodes, cooc = _graph_parts_ds(triples)
        return neighbor_jaccard_ds(_sym_edges_ds(cooc))
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    neigh: dict[str, set] = {}
    for s, o in zip(cooc["subj"], cooc["obj"]):
        neigh.setdefault(s, set()).add(o)
        neigh.setdefault(o, set()).add(s)
    # inverted index: middle node -> entities having it as neighbor
    inv: dict[str, list] = {}
    for e, ns in neigh.items():
        for m in ns:
            inv.setdefault(m, []).append(e)
    pairs = set()
    for m, ents in inv.items():
        ents = sorted(ents)
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                pairs.add((ents[i], ents[j]))
    rows = []
    for a, b in sorted(pairs):
        inter = len(neigh[a] & neigh[b])
        union = len(neigh[a] | neigh[b])
        rows.append((a, b, inter, union, (inter * 1_000_000) // union))
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([r[0] for r in rows], type=pa.string()),
                "b": pa.array([r[1] for r in rows], type=pa.string()),
                "inter": pa.array(
                    np.array([r[2] for r in rows], dtype=np.int64)
                ),
                "union_n": pa.array(
                    np.array([r[3] for r in rows], dtype=np.int64)
                ),
                "jac_ppm": pa.array(
                    np.array([r[4] for r in rows], dtype=np.int64)
                ),
            }
        )
    )


def make_neighbor_jaccard_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nb AS (
  SELECT subj AS e, obj AS m FROM cooc
  UNION SELECT obj, subj FROM cooc
),
deg AS (SELECT e, count(*)::BIGINT AS d FROM nb GROUP BY e),
pairs AS (
  SELECT x.e AS a, y.e AS b, count(*)::BIGINT AS inter
  FROM nb x JOIN nb y ON x.m = y.m AND x.e < y.e
  GROUP BY 1, 2
)
SELECT p.a, p.b, p.inter,
       CAST(da.d + db.d - p.inter AS BIGINT) AS union_n,
       CAST(CAST(p.inter AS HUGEINT) * 1000000
            // (da.d + db.d - p.inter) AS BIGINT) AS jac_ppm
FROM pairs p
JOIN deg da ON da.e = p.a
JOIN deg db ON db.e = p.b
"""


__all__ += ["entity_neighbor_jaccard", "make_neighbor_jaccard_sql"]


def entity_resource_allocation(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Resource-allocation link-prediction index → ``(a, b, ra_ppm)``:
    for entity pairs sharing a neighbor, ``Σ_m 10⁶ // deg(m)`` over the
    common neighbors — the no-log cousin of Adamic–Adar (1/deg instead of
    1/log deg), chosen because it stays in exact integers on both
    engines.  Per-middle-floor semantics: each common neighbor
    contributes its own floored term, mirrored exactly by the twin's
    per-row division before the SUM.  Above the cap
    ``stages/graphops.resource_allocation_ds`` runs the identical plan
    (each middle emits its floored term onto its pairs), parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import resource_allocation_ds

        _nodes, cooc = _graph_parts_ds(triples)
        return resource_allocation_ds(_sym_edges_ds(cooc))
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    neigh: dict[str, set] = {}
    for s, o in zip(cooc["subj"], cooc["obj"]):
        neigh.setdefault(s, set()).add(o)
        neigh.setdefault(o, set()).add(s)
    deg = {e: len(ns) for e, ns in neigh.items()}
    inv: dict[str, list] = {}
    for e, ns in neigh.items():
        for m in ns:
            inv.setdefault(m, []).append(e)
    scores: dict[tuple, int] = {}
    for m, ents in inv.items():
        term = 1_000_000 // deg[m]
        ents = sorted(ents)
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                k = (ents[i], ents[j])
                scores[k] = scores.get(k, 0) + term
    rows = sorted(scores.items())
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([k[0] for k, _ in rows], type=pa.string()),
                "b": pa.array([k[1] for k, _ in rows], type=pa.string()),
                "ra_ppm": pa.array(
                    np.array([v for _, v in rows], dtype=np.int64)
                ),
            }
        )
    )


def make_resource_allocation_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nb AS (
  SELECT subj AS e, obj AS m FROM cooc
  UNION SELECT obj, subj FROM cooc
),
deg AS (SELECT e AS ent, count(*)::BIGINT AS d FROM nb GROUP BY e),
pairs AS (
  SELECT x.e AS a, y.e AS b, x.m AS m
  FROM nb x JOIN nb y ON x.m = y.m AND x.e < y.e
)
SELECT p.a, p.b,
       CAST(sum(1000000 // d.d) AS BIGINT) AS ra_ppm
FROM pairs p JOIN deg d ON d.ent = p.m
GROUP BY p.a, p.b
"""


def entity_clustering_coefficient(
    sf_dir: str, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Local clustering coefficient → ``(entity_id, degree, triangles,
    cc_ppm)`` with ``cc_ppm = 2·tri·10⁶ // (d·(d−1))`` for d ≥ 2 (nodes
    of degree < 2 report 0) — the neighborhood-density feature, exact
    ints via the same diag(A³)/2 triangle core the triangle-count op
    uses.  Above the cap ``stages/graphops.clustering_coefficient_ds``
    composes the distributed triangle plan with a bucketed degree join,
    parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import (
            clustering_coefficient_ds,
        )

        nodes, cooc = _graph_parts_ds(triples)
        canon = cooc.map_batches(
            lambda t: pa.table(
                {
                    "a": t["subj"].cast(pa.string()),
                    "b": t["obj"].cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        return clustering_coefficient_ds(nodes, canon)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.int64)
    for s, o in zip(cooc["subj"], cooc["obj"]):
        A[idx[s], idx[o]] = 1
        A[idx[o], idx[s]] = 1
    np.fill_diagonal(A, 0)
    tri = np.diag(A @ A @ A) // 2
    d = A.sum(axis=1)
    cc = np.where(
        d >= 2, (2 * tri * 1_000_000) // np.maximum(d * (d - 1), 1), 0
    ).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "degree": pa.array(d.astype(np.int64)),
                "triangles": pa.array(tri.astype(np.int64)),
                "cc_ppm": pa.array(cc),
            }
        )
    )


def make_clustering_coefficient_sql(triples_sql: str) -> str:
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT DISTINCT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nb AS (
  SELECT subj AS e, obj AS m FROM cooc
  UNION SELECT obj, subj FROM cooc
),
nodes AS (SELECT DISTINCT subj AS entity_id FROM t
          WHERE pred = 'appears_in'),
deg AS (
  SELECT n.entity_id, CAST(count(nb.m) AS BIGINT) AS degree
  FROM nodes n LEFT JOIN nb ON nb.e = n.entity_id
  GROUP BY n.entity_id
),
tri AS (
  SELECT n.entity_id,
         CAST(count(*) // 2 AS BIGINT) AS triangles
  FROM nodes n
  JOIN nb x ON x.e = n.entity_id
  JOIN nb y ON y.e = n.entity_id AND y.m <> x.m
  JOIN nb z ON z.e = x.m AND z.m = y.m
  GROUP BY n.entity_id
)
SELECT d.entity_id, d.degree,
       COALESCE(tri.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN CAST(2 * COALESCE(tri.triangles, 0) * 1000000
                      // (d.degree * (d.degree - 1)) AS BIGINT)
            ELSE 0 END AS cc_ppm
FROM deg d LEFT JOIN tri ON tri.entity_id = d.entity_id
"""


def entity_kcore(
    sf_dir: str, k: int = 2, rounds: int = 6, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Bounded-round k-core peeling → ``(entity_id, in_core)``: nodes
    surviving ``rounds`` rounds of "drop every node with fewer than
    ``k`` neighbors among survivors" — the dense-subgraph backbone used
    to prune noisy KG fringes.  As with BFS/CC, the twin unrolls the
    IDENTICAL rounds, so both engines agree even before the peel
    converges; the entity graph's bounded size makes the numpy path the
    production one, and above the cap ``stages/graphops.kcore_ds`` runs
    the same rounds as per-round bucketed degree filters, parity-tested."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        from ner_funtool_ray.stages.graphops import kcore_ds

        nodes, cooc = _graph_parts_ds(triples)
        return kcore_ds(nodes, _sym_edges_ds(cooc), k=k, rounds=rounds)
    df = triples.to_pandas()
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    alive = np.ones(len(nodes), dtype=bool)
    for _ in range(rounds):
        deg = np.zeros(len(nodes), dtype=np.int64)
        m = alive[src] & alive[dst]
        np.add.at(deg, src[m], 1)
        alive = alive & (deg >= k)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "in_core": pa.array(alive.astype(np.int64)),
            }
        )
    )


def make_kcore_sql(triples_sql: str, k: int = 2, rounds: int = 6) -> str:
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT DISTINCT subj, obj FROM t"
        " WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst FROM cooc\n"
        "          UNION ALL SELECT obj, subj FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "a0 AS (SELECT entity_id, 1 AS alive FROM nodes)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
a{i} AS MATERIALIZED (
  SELECT n.entity_id,
         CASE WHEN n.alive = 1 AND COALESCE(dg.d, 0) >= {k}
              THEN 1 ELSE 0 END AS alive
  FROM a{i - 1} n
  LEFT JOIN (
    SELECT e.src AS entity_id, count(*) AS d
    FROM edges e
    JOIN a{i - 1} s ON s.entity_id = e.src AND s.alive = 1
    JOIN a{i - 1} d2 ON d2.entity_id = e.dst AND d2.alive = 1
    GROUP BY e.src
  ) dg ON dg.entity_id = n.entity_id
)"""
        )
    parts.append(
        f"\nSELECT entity_id, CAST(alive AS BIGINT) AS in_core FROM a{rounds}"
    )
    return "".join(parts)


__all__ += [
    "entity_resource_allocation",
    "make_resource_allocation_sql",
    "entity_clustering_coefficient",
    "make_clustering_coefficient_sql",
    "entity_kcore",
    "make_kcore_sql",
]


def entity_source_hits(
    sf_dir: str, iters: int = 3, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """HITS hub scores over the bipartite entity→doc ``appears_in``
    layer — the Kleinberg mutual-reinforcement rule specialized to KG
    curation: an entity is a strong HUB when it appears in strongly
    "authoritative" docs, and a doc is authoritative when strong hub
    entities appear in it (the salience signal an entity-centric corpus
    ranker uses, complementary to ``entity_pagerank``'s co-occurrence
    centrality).

    Update rule (int64 fixed point, SCALE = 10⁹, sum-normalization so
    every step is exactly reproducible integer arithmetic — the classic
    L2 norm would put an irrational sqrt between engines):

    - ``h0(e) = SCALE // n`` (n = #entities) — caps every later total at
      SCALE so ``raw·SCALE`` never overflows int64;
    - ``a_raw(d) = Σ_{e∈d} h(e)``; ``a(d) = a_raw(d)·SCALE // Σa_raw``;
    - ``h_raw(e) = Σ_{d∋e} a(d)``; ``h(e) = h_raw(e)·SCALE // Σh_raw``.

    Output ``(entity_id, hub_fp)``.  The aggregated bipartite layer is
    gazetteer-bounded on the entity side but corpus-sized on the doc
    side, so above ``driver_cap`` the identical rule runs distributed in
    ``stages/graphops.hits_ds`` (entity/doc-bucketed joins + bounded
    group sums + one scalar normalizer per half-step; parity-tested via
    ``driver_cap=0``).  Identical unrolled iterations in the twin
    (``make_hits_sql``) keep it hash-exact on either path."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    triples = kg_from_sf_dir(sf_dir).materialize()
    if triples.count() > driver_cap:
        import pyarrow.compute as pc

        from ner_funtool_ray.stages.graphops import hits_ds

        membership = triples.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "entity": f["subj"].cast(pa.string()),
                        "doc": f["obj"].cast(pa.string()),
                    }
                )
            )(t.filter(pc.equal(t["pred"], "appears_in"))),
            batch_format="pyarrow",
        )
        return hits_ds(membership, iters=iters)
    df = triples.to_pandas()
    ap = df[df["pred"] == "appears_in"][["subj", "obj"]].drop_duplicates()
    ents = np.sort(ap["subj"].unique())
    docs = np.sort(ap["obj"].unique())
    n = len(ents)
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([], type=pa.string()),
                    "hub_fp": pa.array([], type=pa.int64()),
                }
            )
        )
    ei = ap["subj"].map({e: i for i, e in enumerate(ents)}).to_numpy(np.int64)
    di = ap["obj"].map({d: i for i, d in enumerate(docs)}).to_numpy(np.int64)
    h = np.full(n, SCALE // np.int64(n), dtype=np.int64)
    for _ in range(iters):
        ar = np.zeros(len(docs), dtype=np.int64)
        np.add.at(ar, di, h[ei])
        a = (ar * SCALE) // np.int64(ar.sum())
        hr = np.zeros(n, dtype=np.int64)
        np.add.at(hr, ei, a[di])
        h = (hr * SCALE) // np.int64(hr.sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(ents, type=pa.string()),
                "hub_fp": pa.array(h),
            }
        )
    )


def make_hits_sql(triples_sql: str, iters: int = 3) -> str:
    """Twin of ``entity_source_hits``: the sum-normalized HITS
    iterations unrolled (same int64 floor divisions)."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "b AS (SELECT DISTINCT subj AS e, obj AS d FROM t\n"
        "      WHERE pred = 'appears_in'),\n"
        "ne AS (SELECT CAST(count(DISTINCT e) AS BIGINT) AS n FROM b),\n"
        "h0 AS (SELECT DISTINCT e,\n"
        "       CAST(1000000000 // (SELECT n FROM ne) AS BIGINT) AS h\n"
        "       FROM b)"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
ar{i} AS (SELECT d, CAST(sum(h) AS BIGINT) AS ar
         FROM b JOIN h{i - 1} USING (e) GROUP BY d),
a{i} AS (SELECT d,
         (ar * 1000000000) // (SELECT CAST(sum(ar) AS BIGINT) FROM ar{i})
           AS a
         FROM ar{i}),
hr{i} AS (SELECT e, CAST(sum(a) AS BIGINT) AS hr
         FROM b JOIN a{i} USING (d) GROUP BY e),
h{i} AS (SELECT e,
         CAST((hr * 1000000000)
              // (SELECT CAST(sum(hr) AS BIGINT) FROM hr{i}) AS BIGINT) AS h
         FROM hr{i})"""
        )
    parts.append(
        f"\nSELECT e AS entity_id, h AS hub_fp FROM h{iters}"
    )
    return "".join(parts)


__all__ += ["entity_source_hits", "make_hits_sql"]


# --- basic-graph-pattern matching ------------------------------------------


def kg_pattern_bindings(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """SPARQL-style basic-graph-pattern match over the KG → bindings
    ``(a, b, repo, support)`` for the triangle pattern::

        (a) -[cooccurs_with]- (b)
        (a) -[appears_in]-> (repo)
        (b) -[appears_in]-> (repo)

    i.e. every co-occurring entity pair together with each repository
    BOTH appear in; ``support`` = min of the two appearance weights (the
    pattern's weakest-edge confidence, the usual BGP scoring rule).
    ``a < b`` by the triple table's canonical pair order, so bindings are
    emitted once per undirected pair.

    Unlike the sketch-sized graph metrics this produces BINDINGS —
    output is pattern-match-sized, so there is no driver path at all:
    two content-hash bucketed inner joins (pattern edge at a time, the
    standard BGP join plan), each a union → ``groupby(bucket)`` →
    vectorized pandas merge.  Join keys co-locate by crc32 (the
    cross-process-deterministic string path of ``bucketed_group_sum``);
    nothing is broadcast and nothing is materialized on the driver."""
    import zlib

    import pyarrow.compute as pc

    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    # three consumers (co side + two ap sides) — pin the aggregated triple
    # table (entity-vocabulary-bounded) once instead of re-running the
    # corpus scan per branch; blocks stay in the object store, not on the
    # driver
    triples = kg_from_sf_dir(sf_dir).materialize()

    def _crc_bucket(keys: list[str]) -> np.ndarray:
        return np.fromiter(
            (zlib.crc32(k.encode("utf-8")) % n_buckets for k in keys),
            dtype=np.int64,
            count=len(keys),
        )

    # pattern edge 1: co(a,b) ⋈ ap(e,repo,w) ON a = e
    def co_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], "cooccurs_with"))
        a = f["subj"].to_pylist()
        return pa.table(
            {
                "a": pa.array(a, type=pa.string()),
                "b": f["obj"].cast(pa.string()),
                "repo": pa.nulls(len(a), type=pa.string()),
                "w": pa.nulls(len(a), type=pa.int64()),
                "side": pa.array(np.zeros(len(a), dtype=np.int8)),
                "bucket": pa.array(_crc_bucket(a)),
            }
        )

    def ap_side_join1(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], "appears_in"))
        e = f["subj"].to_pylist()
        return pa.table(
            {
                "a": pa.array(e, type=pa.string()),
                "b": pa.nulls(len(e), type=pa.string()),
                "repo": f["obj"].cast(pa.string()),
                "w": f["weight"].cast(pa.int64()),
                "side": pa.array(np.ones(len(e), dtype=np.int8)),
                "bucket": pa.array(_crc_bucket(e)),
            }
        )

    def join1(group: pd.DataFrame) -> pd.DataFrame:
        co = group.loc[group["side"] == 0, ["a", "b"]]
        ap = group.loc[group["side"] == 1, ["a", "repo", "w"]]
        out = co.merge(ap, on="a", how="inner")
        out["w"] = out["w"].astype(np.int64)
        return out[["a", "b", "repo", "w"]]

    bound1 = (
        triples.map_batches(co_side, batch_format="pyarrow")
        .union(triples.map_batches(ap_side_join1, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join1, batch_format="pandas")
    )

    # pattern edge 2: ⋈ ap(e,repo,w2) ON (b = e AND repo = repo)
    def left_side_join2(t: pa.Table) -> pa.Table:
        b = t["b"].to_pylist()
        repo = t["repo"].to_pylist()
        keys = [f"{x}\x00{r}" for x, r in zip(b, repo)]
        return pa.table(
            {
                "a": t["a"].cast(pa.string()),
                "b": t["b"].cast(pa.string()),
                "repo": t["repo"].cast(pa.string()),
                "w": t["w"].cast(pa.int64()),
                "side": pa.array(np.zeros(len(b), dtype=np.int8)),
                "bucket": pa.array(_crc_bucket(keys)),
            }
        )

    def ap_side_join2(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], "appears_in"))
        e = f["subj"].to_pylist()
        repo = f["obj"].to_pylist()
        keys = [f"{x}\x00{r}" for x, r in zip(e, repo)]
        return pa.table(
            {
                "a": pa.nulls(len(e), type=pa.string()),
                "b": pa.array(e, type=pa.string()),
                "repo": pa.array(repo, type=pa.string()),
                "w": f["weight"].cast(pa.int64()),
                "side": pa.array(np.ones(len(e), dtype=np.int8)),
                "bucket": pa.array(_crc_bucket(keys)),
            }
        )

    def join2(group: pd.DataFrame) -> pd.DataFrame:
        left = group.loc[group["side"] == 0, ["a", "b", "repo", "w"]]
        ap = group.loc[group["side"] == 1, ["b", "repo", "w"]].rename(
            columns={"w": "w2"}
        )
        out = left.merge(ap, on=["b", "repo"], how="inner")
        out["support"] = np.minimum(
            out["w"].astype(np.int64), out["w2"].astype(np.int64)
        )
        return out[["a", "b", "repo", "support"]]

    return (
        bound1.map_batches(left_side_join2, batch_format="pyarrow")
        .union(triples.map_batches(ap_side_join2, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join2, batch_format="pandas")
    )


def make_pattern_bindings_sql(triples_sql: str) -> str:
    """DuckDB twin: the same triangle BGP as three CTE self-joins."""
    return f"""
WITH t AS ({triples_sql}),
co AS (SELECT subj AS a, obj AS b FROM t WHERE pred = 'cooccurs_with'),
ap AS (SELECT subj AS e, obj AS repo, weight FROM t
       WHERE pred = 'appears_in')
SELECT co.a, co.b, ap1.repo,
       least(ap1.weight, ap2.weight)::BIGINT AS support
FROM co
JOIN ap ap1 ON ap1.e = co.a
JOIN ap ap2 ON ap2.e = co.b AND ap2.repo = ap1.repo
"""


__all__ += ["kg_pattern_bindings", "make_pattern_bindings_sql"]


# ---------------------------------------------------------------------------
# Katz-style attenuated-walk centrality (fixed-point int64)
# ---------------------------------------------------------------------------

KATZ_ALPHA_NUM = 20  # α = 20/100 on the out-weight-normalized adjacency


def _katz_numpy(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n_nodes: int, iters: int
) -> np.ndarray:
    """Fixed-point Katz core: k0 = SCALE; k'(v) = SCALE +
    (α_num · Σ_in (w·k(u)) // outw(u)) // 100.

    Unlike PageRank's ``BASE + 85%·inc`` rule there is no teleport
    redistribution — every node re-seeds the full SCALE each iteration
    and walks attenuate by α per hop, the Katz series k = Σ_j α^j P^T^j·1
    over the column-stochastic walk matrix P.  Normalizing by out-weight
    keeps total mass bounded (Σ k ≤ n·SCALE/(1-α)), so int64 holds for
    any graph below ~3·10^8 nodes at this SCALE (document+lower SCALE
    beyond that)."""
    outw = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(outw, src, w.astype(np.int64))
    ow = outw[src]  # > 0 for every edge source by construction
    k = np.full(n_nodes, SCALE, dtype=np.int64)
    for _ in range(iters):
        contrib = (k[src] * w) // ow
        inc = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(inc, dst, contrib)
        k = SCALE + (np.int64(KATZ_ALPHA_NUM) * inc) // np.int64(100)
    return k


def entity_katz(
    sf_dir: str, iters: int = 5, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Katz-style attenuated-walk centrality over the KG co-occurrence
    graph → ``(entity_id, katz_fp)``.  Complements ``entity_pagerank``:
    PageRank measures stationary visit probability, Katz counts
    attenuated walks of every length, so leaf entities attached to hubs
    score differently under the two.

    Gazetteer-bounded graph → numpy scatter-add driver core is the
    production path (see ``entity_pagerank``); above ``driver_cap``
    triples the identical int64 rule runs fully distributed in
    ``stages/graphops.katz_ds`` (three bucketed shuffles per iteration),
    parity-tested."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is None:
        from ner_funtool_ray.stages.graphops import katz_ds

        nodes, cooc = _graph_parts_ds(triples)
        return katz_ds(
            nodes, _sym_edges_ds(cooc), iters=iters,
            scale=int(SCALE), alpha_num=KATZ_ALPHA_NUM,
        )
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    w = cooc["weight"].to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    ww = np.concatenate([w, w])
    k = _katz_numpy(src, dst, ww, len(nodes), iters)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "katz_fp": pa.array(k),
            }
        )
    )


def make_katz_sql(triples_sql: str, iters: int = 5) -> str:
    """DuckDB twin of ``entity_katz``: the identical fixed-point
    iterations unrolled as chained CTEs (same construction as
    ``make_pagerank_sql``, with base SCALE and α=20/100)."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst, weight FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst, weight FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w"
        " FROM edges GROUP BY src),\n"
        "k0 AS (SELECT entity_id, CAST(1000000000 AS BIGINT) AS k FROM nodes)"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
k{i} AS (
  SELECT n.entity_id,
         CAST(1000000000 + ({KATZ_ALPHA_NUM} * COALESCE(CAST(
             SUM((pk.k * e.weight) // o.w) AS BIGINT), 0)) // 100
           AS BIGINT) AS k
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.entity_id
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN k{i - 1} pk ON pk.entity_id = e.src
  GROUP BY n.entity_id
)"""
        )
    parts.append(f"\nSELECT entity_id, k AS katz_fp FROM k{iters}")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (bounded-round Bellman-Ford)
# ---------------------------------------------------------------------------

SSSP_LEN_NUM = np.int64(1000)  # edge length = 1 + 1000 // weight


def entity_shortest_path(
    sf_dir: str, rounds: int = 6, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Bounded-round weighted shortest-path distance from a
    deterministic seed (the lexicographically smallest entity) →
    ``(entity_id, dist)``, unreached after ``rounds`` = -1.

    Edge length is the int64 ``1 + 1000 // weight`` — frequently
    co-occurring entities are CLOSER, so the distances rank semantic
    proximity rather than hop count (``entity_bfs_depth``'s measure).
    Same bounded-round min-plus family as BFS: new(v) = min(old(v),
    min over in-edges old(u)+len(u,v)) — Bellman-Ford with ``rounds``
    relaxation sweeps, bit-reproducible at any round count because the
    unrolled-CTE twin applies the identical sweeps.

    Gazetteer-bounded graph → numpy scatter-min driver core; above
    ``driver_cap`` the identical rule runs distributed in
    ``stages/graphops.sssp_ds`` (parity-tested)."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is None:
        from ner_funtool_ray.stages.graphops import sssp_ds

        nodes, cooc = _graph_parts_ds(triples)

        def with_len(t: pa.Table) -> pa.Table:
            w = np.asarray(t["weight"], dtype=np.int64)
            return t.append_column(
                "len", pa.array(np.int64(1) + SSSP_LEN_NUM // w)
            )

        return sssp_ds(
            nodes,
            _sym_edges_ds(cooc).map_batches(with_len, batch_format="pyarrow"),
            rounds=rounds,
        )
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    idx = {e: i for i, e in enumerate(nodes)}
    a = cooc["subj"].map(idx).to_numpy(dtype=np.int64)
    b = cooc["obj"].map(idx).to_numpy(dtype=np.int64)
    w = cooc["weight"].to_numpy(dtype=np.int64)
    ln = np.int64(1) + SSSP_LEN_NUM // w
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    lens = np.concatenate([ln, ln])
    d = np.full(len(nodes), INF, dtype=np.int64)
    if len(nodes):
        d[0] = 0  # nodes sorted -> index 0 IS min(entity_id)
    for _ in range(rounds):
        nd = d.copy()
        np.minimum.at(nd, dst, d[src] + lens)
        d = np.minimum(d, nd)
    dist = np.where(d >= INF, np.int64(-1), d)
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "dist": pa.array(dist),
            }
        )
    )


def make_sssp_sql(triples_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of ``entity_shortest_path``: the identical
    Bellman-Ford sweeps unrolled as chained CTEs.  An unreached source
    offers INF+len, which LEAST() can never keep (stored labels are
    already ≤ INF) — the same invariant the numpy core relies on."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst,\n"
        "                 CAST(1 + 1000 // weight AS BIGINT) AS len FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst,\n"
        "                 CAST(1 + 1000 // weight AS BIGINT) AS len FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "seed AS (SELECT min(entity_id) AS e FROM nodes),\n"
        "d0 AS (SELECT entity_id, CASE WHEN entity_id = (SELECT e FROM seed)\n"
        "       THEN CAST(0 AS BIGINT) ELSE CAST(999999999 AS BIGINT) END AS d\n"
        "       FROM nodes)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT n.entity_id,
         least(any_value(pd0.d),
               COALESCE(min(pd.d + e.len), CAST(999999999 AS BIGINT))) AS d
  FROM nodes n
  JOIN d{i - 1} pd0 ON pd0.entity_id = n.entity_id
  LEFT JOIN edges e ON e.dst = n.entity_id
  LEFT JOIN d{i - 1} pd ON pd.entity_id = e.src
  GROUP BY n.entity_id
)"""
        )
    parts.append(
        f"""
SELECT entity_id,
       CASE WHEN d >= 999999999 THEN CAST(-1 AS BIGINT) ELSE d END AS dist
FROM d{rounds}"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Weighted label-propagation communities (synchronous, fixed rounds)
# ---------------------------------------------------------------------------


def entity_lpa_communities(
    sf_dir: str, rounds: int = 4, driver_cap: int = 2_000_000
) -> "ray.data.Dataset":
    """Synchronous weighted label-propagation community detection →
    ``(entity_id, community)``.  Init: every node labels itself.  Per
    round every node takes the incoming label with the largest weight
    sum (ties → lexicographically smallest label; no in-edges → keep
    own).  A FIXED round count with that deterministic tie-break makes
    the result engine-independent — the classic async/random-order LPA
    is not reproducible, this variant is.

    Communities differ from ``entity_components``: components ignore
    weights (any path merges), LPA keeps weakly-bridged groups apart
    because the bridge's weight loses the per-node majority vote.

    Gazetteer-bounded graph → pandas groupby-argmax driver core; above
    ``driver_cap`` the identical rule runs distributed in
    ``stages/graphops.lpa_ds`` (parity-tested)."""
    triples, df = _cooc_driver_frame(sf_dir, driver_cap)
    if df is None:
        from ner_funtool_ray.stages.graphops import lpa_ds

        nodes, cooc = _graph_parts_ds(triples)
        return lpa_ds(nodes, _sym_edges_ds(cooc), rounds=rounds)
    cooc = df[df["pred"] == "cooccurs_with"]
    nodes = np.sort(df.loc[df["pred"] == "appears_in", "subj"].unique())
    e = pd.DataFrame(
        {
            "src": np.concatenate([cooc["subj"], cooc["obj"]]),
            "dst": np.concatenate([cooc["obj"], cooc["subj"]]),
            "w": np.concatenate([cooc["weight"], cooc["weight"]]).astype(
                np.int64
            ),
        }
    )
    lab = pd.Series(nodes, index=nodes)
    for _ in range(rounds):
        sums = (
            pd.DataFrame(
                {
                    "dst": e["dst"],
                    "lab": e["src"].map(lab).to_numpy(),
                    "w": e["w"],
                }
            )
            .groupby(["dst", "lab"], sort=False, as_index=False)["w"]
            .sum()
        )
        win = (
            sums.sort_values(
                ["dst", "w", "lab"], ascending=[True, False, True]
            )
            .drop_duplicates("dst")
            .set_index("dst")["lab"]
        )
        new = pd.Series(nodes, index=nodes).index.map(win)
        lab = pd.Series(
            np.where(pd.isna(new), lab.to_numpy(), new), index=nodes
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(nodes, type=pa.string()),
                "community": pa.array(lab.to_numpy(), type=pa.string()),
            }
        )
    )


def make_lpa_sql(triples_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of ``entity_lpa_communities``: the identical
    synchronous rounds unrolled as chained CTEs, the per-node argmax as
    ROW_NUMBER() OVER (PARTITION BY dst ORDER BY sw DESC, lab ASC)."""
    parts = [
        f"WITH t AS ({triples_sql}),\n"
        "cooc AS (SELECT subj, obj, weight FROM t WHERE pred = 'cooccurs_with'),\n"
        "edges AS (SELECT subj AS src, obj AS dst, weight FROM cooc\n"
        "          UNION ALL SELECT obj AS src, subj AS dst, weight FROM cooc),\n"
        "nodes AS (SELECT DISTINCT subj AS entity_id FROM t"
        " WHERE pred = 'appears_in'),\n"
        "r0 AS (SELECT entity_id, entity_id AS lab FROM nodes)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
c{i} AS (
  SELECT e.dst, pr.lab, CAST(SUM(e.weight) AS BIGINT) AS sw
  FROM edges e JOIN r{i - 1} pr ON pr.entity_id = e.src
  GROUP BY e.dst, pr.lab
),
p{i} AS (
  SELECT dst, lab FROM (
    SELECT dst, lab,
           ROW_NUMBER() OVER (PARTITION BY dst
                              ORDER BY sw DESC, lab ASC) AS rn
    FROM c{i}) WHERE rn = 1
),
r{i} AS (
  SELECT pr.entity_id, COALESCE(p.lab, pr.lab) AS lab
  FROM r{i - 1} pr LEFT JOIN p{i} p ON p.dst = pr.entity_id
)"""
        )
    parts.append(
        f"\nSELECT entity_id, lab AS community FROM r{rounds}"
    )
    return "".join(parts)


__all__ += [
    "entity_katz",
    "make_katz_sql",
    "entity_shortest_path",
    "make_sssp_sql",
    "entity_lpa_communities",
    "make_lpa_sql",
]


def community_modularity(
    sf_dir: str, rounds: int = 4, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Newman modularity audit of the LPA communities, integer-exact:
    per community c — node count, internal edge weight ``e_in``, total
    incident weight ``d_tot``, and the community's modularity
    contribution in ppm::

        q_ppm = floor((4·m·e_in − d_tot²) · 1e6 / (4·m²))

    (the standard ``e_c/m − (d_c/2m)²`` term cross-multiplied by 4m² so
    both engines compute the same integer; Σ q_ppm ≈ Q·1e6).  Python
    bigints on this side, HUGEINT with an explicit floor-division CASE
    on the DuckDB side, so negative terms floor identically.

    Plan: the edge table attaches both endpoint communities through two
    bucketed lookups, per-edge (community, e_w, d_w) partials ride one
    bounded group sum, node counts one more; the per-community math runs
    vectorized inside map_batches over the community-bounded aggregate —
    only the single scalar ``m`` reduces to the driver."""
    import pyarrow.compute as _pc

    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.graphops import attach_col
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    triples = kg_from_sf_dir(sf_dir)
    _, cooc = _graph_parts_ds(triples)
    cooc = cooc.materialize()
    comm = entity_lpa_communities(sf_dir, rounds=rounds).materialize()

    m = int(cooc.sum("weight") or 0)

    with_cs = attach_col(
        cooc, "subj", comm, "entity_id", "community", "cs",
        n_buckets=n_buckets, how="inner",
    )
    with_co = attach_col(
        with_cs, "obj", comm, "entity_id", "community", "co",
        n_buckets=n_buckets, how="inner",
    )

    def partials(t: pa.Table) -> pa.Table:
        w = np.asarray(t["weight"], dtype=np.int64)
        cs = t["cs"].to_pylist()
        co = t["co"].to_pylist()
        same = np.array([a == b for a, b in zip(cs, co)], dtype=bool)
        return pa.table(
            {
                "community": pa.array(cs + co, type=pa.string()),
                "e_w": pa.array(
                    np.concatenate([np.where(same, w, 0), np.zeros_like(w)])
                ),
                "d_w": pa.array(np.concatenate([w, w])),
            }
        )

    byc = bucketed_group_sum(
        with_co.map_batches(partials, batch_format="pyarrow"),
        keys=["community"],
        sum_cols={"e_in": "e_w", "d_tot": "d_w"},
        count_col=None,
        n_buckets=n_buckets,
    )
    counts = bucketed_group_sum(
        comm.map_batches(
            lambda t: pa.table({"community": t["community"]}),
            batch_format="pyarrow",
        ),
        keys=["community"],
        count_col="n_nodes",
        n_buckets=n_buckets,
    )
    full = attach_col(
        counts, "community", byc, "community", "e_in", "e_in",
        n_buckets=n_buckets, how="left", fill=0,
    )
    full = attach_col(
        full, "community", byc, "community", "d_tot", "d_tot",
        n_buckets=n_buckets, how="left", fill=0,
    )

    def finish(t: pa.Table, _m=m) -> pa.Table:
        e = [int(x) for x in t["e_in"].to_pylist()]
        d = [int(x) for x in t["d_tot"].to_pylist()]
        den = 4 * _m * _m
        q = [
            ((4 * _m * ei - di * di) * 1_000_000) // den if den else 0
            for ei, di in zip(e, d)
        ]
        return pa.table(
            {
                "community": t["community"],
                "n_nodes": t["n_nodes"].cast(pa.int64()),
                "e_in": t["e_in"].cast(pa.int64()),
                "d_tot": t["d_tot"].cast(pa.int64()),
                "q_ppm": pa.array(q, type=pa.int64()),
            }
        )

    return full.map_batches(finish, batch_format="pyarrow")


def make_modularity_sql(triples_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`community_modularity` — HUGEINT arithmetic
    with an explicit floor-division CASE so negative q terms floor like
    Python's ``//``."""
    lpa = make_lpa_sql(triples_sql, rounds=rounds)
    return f"""
WITH comm AS (SELECT * FROM ({lpa}) q),
t2 AS ({triples_sql}),
cooc AS (SELECT subj, obj, weight FROM t2 WHERE pred = 'cooccurs_with'),
mm AS (SELECT COALESCE(sum(weight), 0)::HUGEINT AS m FROM cooc),
e AS (
  SELECT c.weight, ca.community AS cs, cb.community AS co
  FROM cooc c
  JOIN comm ca ON ca.entity_id = c.subj
  JOIN comm cb ON cb.entity_id = c.obj
),
byc AS (
  SELECT community, sum(e_w)::HUGEINT AS e_in, sum(d_w)::HUGEINT AS d_tot
  FROM (
    SELECT cs AS community,
           CASE WHEN cs = co THEN weight ELSE 0 END AS e_w,
           weight AS d_w
    FROM e
    UNION ALL
    SELECT co, 0, weight FROM e
  ) GROUP BY community
),
n AS (SELECT community, count(*)::BIGINT AS n_nodes FROM comm GROUP BY community),
j AS (
  SELECT n.community, n.n_nodes,
         COALESCE(byc.e_in, 0::HUGEINT) AS e_in,
         COALESCE(byc.d_tot, 0::HUGEINT) AS d_tot, mm.m
  FROM n LEFT JOIN byc USING (community) CROSS JOIN mm
)
SELECT community, n_nodes, e_in::BIGINT AS e_in, d_tot::BIGINT AS d_tot,
       (CASE WHEN m = 0 THEN 0
             WHEN (4*m*e_in - d_tot*d_tot) >= 0
             THEN (4*m*e_in - d_tot*d_tot) * 1000000 // (4*m*m)
             ELSE -(((d_tot*d_tot - 4*m*e_in) * 1000000 + 4*m*m - 1)
                    // (4*m*m)) END)::BIGINT AS q_ppm
FROM j
"""


__all__ += ["community_modularity", "make_modularity_sql"]


def graph_assortativity(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Degree-assortativity audit of the co-occurrence graph (one row):
    Pearson correlation of endpoint degrees over the symmetrized
    unweighted edge list — ``r = (M·Σxy − Σx·Σy) / (M·Σxx − (Σx)²)``
    with M the directed edge count and x/y the endpoint degrees (the x
    and y marginals coincide under symmetrization, so one denominator
    serves both).  Moments are exact integers (Python bigints / HUGEINT);
    the single edge division casts both sides to double first —
    identical IEEE semantics on both engines, so the float hash-matches.
    Degree-regular graphs (zero variance) report r = 0.0 by convention.

    Plan: the distinct-neighbor relation attaches both endpoint degrees
    through two bucketed lookups; per-batch moment partials reduce to
    one row per batch and a driver-side constant-size sum."""
    import pyarrow.compute as _pc

    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.stages.graphops import attach_col, neighbors_ds
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    triples = kg_from_sf_dir(sf_dir)
    _, cooc = _graph_parts_ds(triples)
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
    deg = bucketed_group_sum(
        nb.map_batches(lambda t: pa.table({"e": t["e"]}), batch_format="pyarrow"),
        keys=["e"],
        count_col="d",
        n_buckets=n_buckets,
    ).materialize()
    withx = attach_col(
        nb, "e", deg, "e", "d", "x", n_buckets=n_buckets, how="inner"
    )
    withy = attach_col(
        withx, "m", deg, "e", "d", "y", n_buckets=n_buckets, how="inner"
    )

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"], dtype=np.int64)
        y = np.asarray(t["y"], dtype=np.int64)
        return pa.table(
            {
                "mdir": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            }
        )

    parts = withy.map_batches(partial, batch_format="pyarrow").materialize()
    mdir = int(parts.sum("mdir") or 0)
    sx = int(parts.sum("sx") or 0)
    sxy = int(parts.sum("sxy") or 0)
    sxx = int(parts.sum("sxx") or 0)
    num = mdir * sxy - sx * sx
    den = mdir * sxx - sx * sx
    r = float(num) / float(den) if den else 0.0
    import pandas as pd

    return ray.data.from_arrow(
        pa.table(
            {
                "n_dir_edges": pa.array([mdir], type=pa.int64()),
                "sum_deg": pa.array([sx], type=pa.int64()),
                "sum_xy": pa.array([sxy], type=pa.int64()),
                "sum_xx": pa.array([sxx], type=pa.int64()),
                "assortativity": pa.array([r], type=pa.float64()),
            }
        )
    )


def make_assortativity_sql(triples_sql: str) -> str:
    """DuckDB twin of :func:`graph_assortativity` — HUGEINT moments,
    both cross-products cast to DOUBLE before the one division."""
    return f"""
WITH t AS ({triples_sql}),
cooc AS (SELECT subj, obj FROM t WHERE pred = 'cooccurs_with'),
nb AS (SELECT subj AS e, obj AS m FROM cooc UNION SELECT obj, subj FROM cooc),
deg AS (SELECT e, count(*)::BIGINT AS d FROM nb GROUP BY e),
x AS (
  SELECT da.d AS x, db.d AS y
  FROM nb JOIN deg da ON da.e = nb.e JOIN deg db ON db.e = nb.m
),
s AS (
  SELECT count(*)::HUGEINT AS mdir, COALESCE(sum(x), 0)::HUGEINT AS sx,
         COALESCE(sum(x*y), 0)::HUGEINT AS sxy,
         COALESCE(sum(x*x), 0)::HUGEINT AS sxx
  FROM x
)
SELECT mdir::BIGINT AS n_dir_edges, sx::BIGINT AS sum_deg,
       sxy::BIGINT AS sum_xy, sxx::BIGINT AS sum_xx,
       CASE WHEN mdir*sxx - sx*sx = 0 THEN 0.0
            ELSE (mdir*sxy - sx*sx)::DOUBLE / (mdir*sxx - sx*sx)::DOUBLE
       END AS assortativity
FROM s
"""


__all__ += ["graph_assortativity", "make_assortativity_sql"]


def linkpred_auc(
    sf_dir: str, score: str = "cn", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Link-prediction evaluation of a neighborhood heuristic on the
    versioned corpus (one row): score every BASE-graph (doc parity 0)
    non-edge pair with ≥1 common neighbor, label it positive when the
    edge APPEARS in the new half's graph, and report the exact
    Mann-Whitney AUC in ppm — ``(2·#(pos>neg) + #(pos=neg)) · 1e6 //
    (2·P·N)``, 500000 by convention when either class is empty — the
    temporal-split eval KG completion uses for this heuristic family.

    ``score``: ``"cn"`` = common-neighbor count; ``"ra"`` = resource
    allocation, Σ_m 1e6 // deg(m) over shared middles (the same floored
    integer term as ``resource_allocation_ds``); ``"pa"`` = preferential
    attachment, deg(a)·deg(b); ``"jaccard"`` = cn·1e6 // (deg(a)+deg(b)−cn)
    (candidates are always the CN≥1 set, so every variant ranks the same
    pair universe) — all integer scores, so the twins hash-match.

    Plan: middle-node pair expansion over the base neighbor relation
    (the CN inverted index), then ONE pair-key co-location of candidates
    + base edges (anti) + new edges (label), a score histogram through a
    bounded group sum, and a distinct-score-bounded U-statistic cross
    product on the driver (|scores_pos| × |scores_neg| cells, degree-
    bounded — never pair-cardinality)."""
    if score not in ("cn", "ra", "pa", "jaccard"):
        raise ValueError(f"score must be cn|ra|pa|jaccard, got {score!r}")
    import pandas as pd

    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.pipelines.kg import kg_triples
    from ner_funtool_ray.stages.graphops import (
        _crc_bucket,
        _middle_pairs,
        neighbors_ds,
    )
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    import pyarrow.compute as _pcmp

    def _edges(parity: int) -> "ray.data.Dataset":
        t = kg_triples(corpus_from_documents(sf_dir, doc_parity=parity))
        return t.map_batches(
            lambda b: b.filter(
                _pcmp.equal(b["pred"], "cooccurs_with")
            ).select(["subj", "obj"]),
            batch_format="pyarrow",
        )

    base = _edges(0).materialize()
    new = _edges(1).materialize()
    nb = neighbors_ds(
        base.map_batches(
            lambda t: pa.table({"src": t["subj"], "dst": t["obj"]}),
            batch_format="pyarrow",
        ).union(
            base.map_batches(
                lambda t: pa.table({"src": t["obj"], "dst": t["subj"]}),
                batch_format="pyarrow",
            )
        ),
        n_buckets=n_buckets,
    ).materialize()
    if score == "cn":
        cand = bucketed_group_sum(
            _middle_pairs(nb, n_buckets),
            keys=["a", "b"],
            count_col="cn",
            n_buckets=n_buckets,
        )
    elif score == "ra":  # per-middle floored term summed per pair
        cand = bucketed_group_sum(
            _middle_pairs(nb, n_buckets, with_term=True),
            keys=["a", "b"],
            sum_cols={"cn": "term"},
            count_col=None,
            n_buckets=n_buckets,
        )
    else:  # pa / jaccard: need both endpoint degrees
        from ner_funtool_ray.stages.graphops import attach_col

        deg_t = bucketed_group_sum(
            nb.map_batches(
                lambda t: pa.table({"e": t["e"]}), batch_format="pyarrow"
            ),
            keys=["e"],
            count_col="d",
            n_buckets=n_buckets,
        ).materialize()
        pairs0 = bucketed_group_sum(
            _middle_pairs(nb, n_buckets),
            keys=["a", "b"],
            count_col="__cn",
            n_buckets=n_buckets,
        )
        j1 = attach_col(
            pairs0, "a", deg_t, "e", "d", "da",
            n_buckets=n_buckets, how="inner",
        )
        j2 = attach_col(
            j1, "b", deg_t, "e", "d", "db",
            n_buckets=n_buckets, how="inner",
        )
        def _score(t: pa.Table, _sc=score) -> pa.Table:
            da = np.asarray(t["da"], dtype=np.int64)
            db = np.asarray(t["db"], dtype=np.int64)
            cn = np.asarray(t["__cn"], dtype=np.int64)
            if _sc == "pa":
                s = da * db
            else:  # jaccard
                s = cn * np.int64(1_000_000) // (da + db - cn)
            return pa.table({"a": t["a"], "b": t["b"], "cn": pa.array(s)})

        cand = j2.map_batches(_score, batch_format="pyarrow")

    def tag_pairs(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            if kind == 0:
                a = t["a"].to_pylist()
                b = t["b"].to_pylist()
                cn = t["cn"].to_pylist()
            else:
                a = t["subj"].to_pylist()
                b = t["obj"].to_pylist()
                cn = [0] * len(a)
            keys = [f"{x}\x00{y}" for x, y in zip(a, b)]
            return pa.table(
                {
                    "pkey": pa.array(keys, type=pa.string()),
                    "cn": pa.array(cn, type=pa.int64()),
                    "kind": pa.array(
                        np.full(len(a), kind, dtype=np.int8)
                    ),
                    "pbucket": pa.array(_crc_bucket(keys, n_buckets)),
                }
            )

        return fn

    def judge(g: pd.DataFrame) -> pa.Table:
        c = g[g["kind"] == 0]
        base_keys = set(g.loc[g["kind"] == 1, "pkey"])
        new_keys = set(g.loc[g["kind"] == 2, "pkey"])
        c = c[~c["pkey"].isin(base_keys)]
        is_pos = c["pkey"].isin(new_keys).to_numpy().astype(np.int64)
        return pa.table(
            {
                "cn": pa.array(c["cn"].to_numpy(dtype=np.int64)),
                "is_pos": pa.array(is_pos),
            }
        )

    labeled = (
        cand.map_batches(tag_pairs(0), batch_format="pyarrow")
        .union(base.map_batches(tag_pairs(1), batch_format="pyarrow"))
        .union(new.map_batches(tag_pairs(2), batch_format="pyarrow"))
        .groupby("pbucket")
        .map_groups(judge, batch_format="pandas")
    )
    hist = bucketed_group_sum(
        labeled, keys=["cn", "is_pos"], count_col="c", n_buckets=n_buckets
    ).to_pandas()  # distinct-score × 2 rows: degree-bounded, never pairs
    if hist.empty:  # no scorable non-edge exists (e.g. a complete graph)
        hist = pd.DataFrame({"cn": [], "is_pos": [], "c": []})

    ph = dict(
        zip(
            hist.loc[hist["is_pos"] == 1, "cn"],
            hist.loc[hist["is_pos"] == 1, "c"],
        )
    )
    nh = dict(
        zip(
            hist.loc[hist["is_pos"] == 0, "cn"],
            hist.loc[hist["is_pos"] == 0, "c"],
        )
    )
    n_pos = int(sum(ph.values()))
    n_neg = int(sum(nh.values()))
    u2 = 0
    for sp, cp in ph.items():
        for sn, cnn in nh.items():
            if sp > sn:
                u2 += 2 * int(cp) * int(cnn)
            elif sp == sn:
                u2 += int(cp) * int(cnn)
    auc = (
        u2 * 1_000_000 // (2 * n_pos * n_neg)
        if n_pos and n_neg
        else 500_000
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_pos": pa.array([n_pos], type=pa.int64()),
                "n_neg": pa.array([n_neg], type=pa.int64()),
                "auc_ppm": pa.array([auc], type=pa.int64()),
            }
        )
    )


def linkpred_cn_auc(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Common-neighbor variant of :func:`linkpred_auc`."""
    return linkpred_auc(sf_dir, score="cn", n_buckets=n_buckets)


def linkpred_ra_auc(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Resource-allocation variant of :func:`linkpred_auc`."""
    return linkpred_auc(sf_dir, score="ra", n_buckets=n_buckets)


def linkpred_pa_auc(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Preferential-attachment variant of :func:`linkpred_auc`."""
    return linkpred_auc(sf_dir, score="pa", n_buckets=n_buckets)


def linkpred_jaccard_auc(
    sf_dir: str, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Neighbor-Jaccard variant of :func:`linkpred_auc`."""
    return linkpred_auc(sf_dir, score="jaccard", n_buckets=n_buckets)


def make_linkpred_auc_sql(triples_sql_fn, score: str = "cn") -> str:
    """DuckDB twin of :func:`linkpred_cn_auc` — ``triples_sql_fn`` is the
    parity-filtered triple-SQL builder (the ``_triples_sql`` callable in
    ``__ray_entry__``)."""
    baset = triples_sql_fn(" WHERE doc_id % 2 = 0")
    newt = triples_sql_fn(" WHERE doc_id % 2 = 1")
    if score == "cn":
        score_expr = "count(*)::BIGINT"
        mp_from = "mp"
    elif score == "ra":
        score_expr = "sum(1000000 // dg.d)::BIGINT"
        mp_from = "mp JOIN deg dg ON dg.m = mp.m"
    elif score == "pa":
        score_expr = "(any_value(de.d) * any_value(df.d))::BIGINT"
        mp_from = ("mp JOIN degn de ON de.e = mp.a"
                   " JOIN degn df ON df.e = mp.b")
    elif score == "jaccard":
        score_expr = ("(count(*) * 1000000 // (any_value(de.d)"
                      " + any_value(df.d) - count(*)))::BIGINT")
        mp_from = ("mp JOIN degn de ON de.e = mp.a"
                   " JOIN degn df ON df.e = mp.b")
    else:
        raise ValueError(f"score must be cn|ra|pa|jaccard, got {score!r}")
    return f"""
WITH baset AS ({baset}),
newt AS ({newt}),
be AS (SELECT subj AS a, obj AS b FROM baset WHERE pred = 'cooccurs_with'),
ne AS (SELECT subj AS a, obj AS b FROM newt WHERE pred = 'cooccurs_with'),
nb AS (SELECT a AS e, b AS m FROM be UNION SELECT b, a FROM be),
deg AS (SELECT m, count(*)::BIGINT AS d FROM nb GROUP BY m),
degn AS (SELECT e, count(*)::BIGINT AS d FROM nb GROUP BY e),
mp AS (SELECT x.e AS a, y.e AS b, x.m AS m FROM nb x JOIN nb y
       ON x.m = y.m AND x.e < y.e),
cand AS (SELECT a, b, {score_expr} AS cn FROM {mp_from} GROUP BY a, b),
nonedge AS (SELECT c.* FROM cand c ANTI JOIN be USING (a, b)),
lab AS (
  SELECT c.cn, CASE WHEN ne.a IS NOT NULL THEN 1 ELSE 0 END AS is_pos
  FROM nonedge c LEFT JOIN ne USING (a, b)
),
ph AS (SELECT cn, count(*)::HUGEINT AS c FROM lab WHERE is_pos = 1 GROUP BY cn),
nh AS (SELECT cn, count(*)::HUGEINT AS c FROM lab WHERE is_pos = 0 GROUP BY cn),
u AS (
  SELECT COALESCE(sum(CASE WHEN p.cn > n.cn THEN 2 * p.c * n.c
                           WHEN p.cn = n.cn THEN p.c * n.c
                           ELSE 0 END), 0)::HUGEINT AS u2
  FROM ph p CROSS JOIN nh n
),
tot AS (
  SELECT (SELECT COALESCE(sum(c), 0) FROM ph)::HUGEINT AS np,
         (SELECT COALESCE(sum(c), 0) FROM nh)::HUGEINT AS nn
)
SELECT np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
       (CASE WHEN np = 0 OR nn = 0 THEN 500000
             ELSE (SELECT u2 FROM u) * 1000000 // (2 * np * nn)
        END)::BIGINT AS auc_ppm
FROM tot
"""


__all__ += ["linkpred_auc", "linkpred_cn_auc", "linkpred_ra_auc",
            "linkpred_pa_auc", "linkpred_jaccard_auc", "make_linkpred_auc_sql"]


def entity_distance_histogram(
    sf_dir: str, rounds: int = 6, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distance distribution of the KG from the deterministic seed:
    (dist, n_entities) over :func:`entity_shortest_path`'s weighted
    distances (unreached = -1 bucket included) — the one-glance
    connectivity profile a graph-health dashboard plots.

    Composition: the shortest-path table is node-cardinality; the
    histogram is one bounded group count on it."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    dist = entity_shortest_path(sf_dir, rounds=rounds)
    out = bucketed_group_sum(
        dist.map_batches(
            lambda t: pa.table({"dist": t["dist"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        keys=["dist"],
        count_col="n_entities",
        n_buckets=n_buckets,
    )
    return out.select_columns(["dist", "n_entities"])


def make_distance_histogram_sql(triples_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of :func:`entity_distance_histogram` — the sssp twin
    grouped by distance."""
    return f"""
WITH sp AS ({make_sssp_sql(triples_sql, rounds=rounds)})
SELECT dist, count(*)::BIGINT AS n_entities FROM sp GROUP BY dist
"""


__all__ += ["entity_distance_histogram", "make_distance_histogram_sql"]


def community_size_histogram(
    sf_dir: str, rounds: int = 4, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Community-size distribution: (size, n_communities) over the LPA
    assignment — the count-of-counts profile that flags degenerate
    collapses (one giant community) or over-fragmentation at a glance.
    Two bounded group counts over the node-cardinality label table."""
    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    comm = entity_lpa_communities(sf_dir, rounds=rounds)
    sizes = bucketed_group_sum(
        comm.map_batches(
            lambda t: pa.table({"community": t["community"]}),
            batch_format="pyarrow",
        ),
        keys=["community"],
        count_col="size",
        n_buckets=n_buckets,
    )
    out = bucketed_group_sum(
        sizes.map_batches(
            lambda t: pa.table({"size": t["size"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        keys=["size"],
        count_col="n_communities",
        n_buckets=n_buckets,
    )
    return out.select_columns(["size", "n_communities"])


def make_community_size_sql(triples_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`community_size_histogram`."""
    return f"""
WITH comm AS (SELECT * FROM ({make_lpa_sql(triples_sql, rounds=rounds)}) q),
sizes AS (SELECT community, count(*)::BIGINT AS size FROM comm GROUP BY 1)
SELECT size, count(*)::BIGINT AS n_communities FROM sizes GROUP BY size
"""


__all__ += ["community_size_histogram", "make_community_size_sql"]
