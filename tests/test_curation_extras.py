"""Property tests for the late-round curation/graph/stats additions
(entity_components, order_price_mad_by_priority, doc_chunks); the oracle
harness covers their DuckDB twins."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_entity_components_are_valid_partition():
    from ner_funtool_ray.pipelines.graph import entity_components

    df = entity_components(SF).to_pandas()
    # the label is the lexicographic min of the component, so label <= member
    assert (df["component"] <= df["entity_id"]).all()
    # labels are closed: a component representative labels itself
    reps = set(df["component"])
    own = df.set_index("entity_id")["component"]
    for r in reps:
        assert own[r] == r


def test_entity_components_respect_edges():
    """Every co-occurrence edge joins two entities with the same label
    (the graph's diameter fits the default rounds at this scale)."""
    from ner_funtool_ray.pipelines.graph import entity_components
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    lab = (
        entity_components(SF)
        .to_pandas()
        .set_index("entity_id")["component"]
    )
    tr = kg_from_sf_dir(SF).to_pandas()
    cooc = tr[tr["pred"] == "cooccurs_with"]
    assert (cooc["subj"].map(lab).to_numpy() == cooc["obj"].map(lab).to_numpy()).all()


def test_mad_matches_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import order_price_mad_by_priority

    got = order_price_mad_by_priority(SF).to_pandas()
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    t["cents"] = np.round(t["o_totalprice"] * 100).astype(np.int64)

    def lower_median(v: np.ndarray) -> int:
        s = np.sort(v)
        return int(s[(len(s) + 1) // 2 - 1])

    for _, row in got.iterrows():
        v = t.loc[t["o_orderpriority"] == row["o_orderpriority"], "cents"]
        med = lower_median(v.to_numpy())
        assert row["median_cents"] == med
        assert row["mad_cents"] == lower_median(np.abs(v.to_numpy() - med))


def test_doc_chunks_reconstruct_documents():
    """Stride-aligned prefixes of consecutive chunks re-concatenate to the
    original token stream (overlap = width - stride is dropped)."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.curation import doc_chunks

    width, stride = 32, 24
    ch = doc_chunks(SF, width=width, stride=stride).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sample = docs.head(20)
    by_doc = {d: g.sort_values("chunk_id") for d, g in ch.groupby("doc_id")}
    for _, row in sample.iterrows():
        toks = row["text"].split(" ")
        g = by_doc[row["doc_id"]]
        assert len(g) == (len(toks) + stride - 1) // stride
        rebuilt = []
        for _, c in g.iterrows():
            rebuilt.extend(c["chunk_text"].split(" ")[:stride])
        assert rebuilt == toks
        assert (g["n_tokens"] <= width).all()


def test_doc_chunks_polars_and_python_paths_agree():
    from ner_funtool_ray.pipelines import curation as C

    got = C.doc_chunks(SF).to_pandas()

    # force the pure-python fallback by running the inner kernel directly
    import pyarrow.parquet as pq

    batch = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids, cids, texts, lens = [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = text.split(" ")
        for ci, start in enumerate(range(0, len(toks), 24)):
            window = toks[start : start + 32]
            ids.append(did)
            cids.append(ci)
            texts.append(" ".join(window))
            lens.append(len(window))
    exp = pd.DataFrame(
        {"doc_id": ids, "chunk_id": cids, "chunk_text": texts, "n_tokens": lens}
    )
    key = ["doc_id", "chunk_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
