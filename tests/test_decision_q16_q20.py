"""Edge semantics for the Q16/Q20 shapes and the incremental-KG delta
(their default plans are oracle-covered by test_queries_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ner_funtool_ray.pipelines import decision as D

SF = "/root/testdata/sf0.001"


def _write_supplier(d, keys, bals=None, names=None):
    n = len(keys)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(keys, type=pa.int64()),
                "s_name": pa.array(
                    names or [f"SUPP_{k}" for k in keys], type=pa.string()
                ),
                "s_nationkey": pa.array([0] * n, type=pa.int64()),
                "s_acctbal": pa.array(
                    bals if bals is not None else [100.0] * n,
                    type=pa.float64(),
                ),
            }
        ),
        d / "supplier.parquet",
    )


def test_part_supplier_variety_anti_join(tmp_path):
    """A (brand,size) whose ONLY supplier is blacklisted (negative
    balance) must vanish; a group keeps only its clean suppliers; the
    count is distinct-supplier, not line count."""
    d = tmp_path / "sf"
    d.mkdir()
    _write_supplier(d, [1, 2, 3], bals=[100.0, -5.0, 100.0])
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([10, 11, 12], type=pa.int64()),
                "p_brand": pa.array(["A", "A", "B"], type=pa.string()),
                "p_size": pa.array([1, 1, 2], type=pa.int32()),
            }
        ),
        d / "part.parquet",
    )
    # part 10/11 share (A,1): supp 1 ships both (2 lines each -> still 1
    # distinct), blacklisted supp 2 ships part 10; part 12 (B,2) is shipped
    # ONLY by blacklisted supp 2.
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([10, 10, 11, 10, 12], type=pa.int64()),
                "l_suppkey": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            }
        ),
        d / "lineitem.parquet",
    )
    out = (
        D.part_supplier_variety(str(d))
        .to_pandas()
        .sort_values(["p_brand", "p_size"])
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"p_brand": "A", "p_size": 1, "supplier_cnt": 1}
    ]


def test_dominant_suppliers_strict_relative_threshold(tmp_path):
    """q·n·den > tot·num is STRICT: quantities [2,1,1] put the heavy
    supplier exactly AT 1.5x the average share (2*3*2 == 4*3) ->
    excluded; [5,1] is above -> dominant for that part only."""
    d = tmp_path / "sf"
    d.mkdir()
    _write_supplier(d, [1, 2, 3])
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([10, 10, 10, 20, 20], type=pa.int64()),
                "l_suppkey": pa.array([1, 2, 3, 1, 2], type=pa.int64()),
                "l_quantity": pa.array(
                    [2.0, 1.0, 1.0, 5.0, 1.0], type=pa.float64()
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    out = D.dominant_suppliers(str(d)).to_pandas()
    assert out.to_dict("records") == [
        {"s_suppkey": 1, "s_name": "SUPP_1", "n_parts": 1}
    ]


def test_kg_incremental_delta_definition():
    """delta == keys(new-half triples) \\ keys(base-half triples), with the
    new-half weights — checked against the two halves run directly."""
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.pipelines.kg import kg_incremental_triples, kg_triples

    key = lambda df: set(zip(df["subj"], df["pred"], df["obj"]))
    base = kg_triples(corpus_from_documents(SF, doc_parity=0)).to_pandas()
    new = kg_triples(corpus_from_documents(SF, doc_parity=1)).to_pandas()
    delta = kg_incremental_triples(SF).to_pandas()
    assert key(delta) == key(new) - key(base)
    assert len(delta) == len(key(delta))  # delta itself is key-deduped
    merged = delta.merge(new, on=["subj", "pred", "obj"], suffixes=("", "_new"))
    assert (merged["weight"] == merged["weight_new"]).all()
    # parity split covers the corpus exactly once
    full = kg_triples(corpus_from_documents(SF)).to_pandas()
    assert key(full) == key(base) | key(new)


def test_kg_upsert_merged_equals_full_corpus_graph():
    """Upsert invariant: merging the two half-corpus graphs with weight
    sums reproduces the whole-corpus graph exactly — triple weights are
    per-doc-partition sums, so the upsert is lossless."""
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.pipelines.kg import kg_triples, kg_upsert_merged

    merged = (
        kg_upsert_merged(SF)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    full = (
        kg_triples(corpus_from_documents(SF))
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(merged, full[merged.columns])


def test_corpus_parity_split_partitions_rows():
    from ner_funtool_ray.corpus import corpus_from_documents

    even = corpus_from_documents(SF, doc_parity=0).to_pandas()
    odd = corpus_from_documents(SF, doc_parity=1).to_pandas()
    both = corpus_from_documents(SF).to_pandas()
    assert len(even) + len(odd) == len(both)
    assert set(even["path"]).isdisjoint(set(odd["path"]))
    # parity is on the numeric doc_id embedded in the path
    ids = even["path"].str.extract(r"doc_(\d+)")[0].astype(int)
    assert (ids % 2 == 0).all()
