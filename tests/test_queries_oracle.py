"""Local replica of the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB on sf0.001 (row count, schema names,
order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(expect.columns), (
        f"{name}: columns {list(got.columns)} != {list(expect.columns)}"
    )
    assert len(got) == len(expect), f"{name}: {len(got)} rows != {len(expect)}"
    pd.testing.assert_frame_equal(
        got, expect, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12
    )
    # the driver's correctness gate HASHES values — float columns must be
    # bit-exact, not merely close (caught a quantile lerp-form mismatch)
    import numpy as np

    for c in got.columns:
        g = got[c].to_numpy()
        if g.dtype.kind == "f":
            e = expect[c].to_numpy()
            assert np.array_equal(g, e, equal_nan=True), (
                f"{name}.{c}: floats not bit-exact"
            )


def _schema_and_len(res) -> tuple[list[str], int]:
    if isinstance(res, pd.DataFrame):
        return list(res.columns), len(res)
    return list(res.schema().names), res.count()  # Dataset: schema survives 0 rows


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_smoke(name):
    # non-SQL-expressible queries: must run and return a stable schema
    cols1, n1 = _schema_and_len(QUERIES[name](SF_DIR))
    assert len(cols1) > 0
    cols2, n2 = _schema_and_len(QUERIES[name](SF_DIR))
    assert cols1 == cols2
    assert n1 == n2  # deterministic row count


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert {"subj", "pred", "obj", "weight"} <= set(df.columns)


def test_revenue_by_nation_shuffle_join_fallback_matches_oracle():
    # force the size guard past the broadcast path: the bucketed shuffle
    # join must produce the identical integer-cent result
    from ner_funtool_ray.pipelines.relational import revenue_by_nation

    got = _normalize(
        revenue_by_nation(SF_DIR, broadcast_limit=0).to_pandas()
    )
    con = _duck(SF_DIR)  # keep the connection alive while the relation runs
    expect = _normalize(con.sql(ORACLES["revenue_by_nation"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_revenue_rollup_fallback_matches_oracle():
    # broadcast_limit=0 forces the bucketed kind-tagged shuffle join for
    # the (nation, year) base; the rollup levels must still be bit-exact
    from ner_funtool_ray.pipelines.relational import revenue_rollup

    got = _normalize(
        revenue_rollup(SF_DIR, broadcast_limit=0).to_pandas()
    )
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["revenue_rollup"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_customers_without_big_orders_fallback_matches_oracle():
    # broadcast_limit=0 forces the fully distributed bucketed anti-join;
    # it must equal the broadcast np.isin path / the SQL twin exactly
    from ner_funtool_ray.pipelines.relational import customers_without_big_orders

    got = _normalize(
        customers_without_big_orders(SF_DIR, broadcast_limit=0).to_pandas()
    )
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["customers_without_big_orders"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_all_triples_local_assembly_matches_distributed():
    # the size-guarded driver assembly and the distributed two-shuffle plan
    # must emit identical triples
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.pipelines.kg import mentions_dataset
    from ner_funtool_ray.stages.materialize import all_triples

    key = ["subj", "pred", "obj"]
    loc = (
        all_triples(mentions_dataset(corpus_from_documents(SF_DIR)))
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    dist = (
        all_triples(
            mentions_dataset(corpus_from_documents(SF_DIR)), driver_cap=None
        )
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)


def test_late_order_priority_fallback_matches_oracle():
    # broadcast_limit=0 forces the bucketed fact-fact semi-join; identical
    # to the broadcast searchsorted path / the SQL twin
    from ner_funtool_ray.pipelines.relational import late_order_priority

    got = _normalize(late_order_priority(SF_DIR, broadcast_limit=0).to_pandas())
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["late_order_priority"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_order_priority_linestatus_fallback_matches_oracle():
    # broadcast_limit=0 forces the bucketed orderkey join; identical to the
    # broadcast searchsorted path / the SQL twin
    from ner_funtool_ray.pipelines.analytic import order_priority_linestatus

    got = _normalize(order_priority_linestatus(SF_DIR, broadcast_limit=0).to_pandas())
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["order_priority_linestatus"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_large_volume_customers_fallback_matches_oracle():
    # broadcast_limit=0 forces BOTH bucketed joins (hot->orders by orderkey,
    # rows->customer by custkey)
    from ner_funtool_ray.pipelines.analytic import large_volume_customers

    got = _normalize(large_volume_customers(SF_DIR, broadcast_limit=0).to_pandas())
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["large_volume_customers"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_large_volume_customers_empty_result():
    # a threshold above every order's quantity sum -> empty result with the
    # full output schema (empty-Dataset .to_pandas() column-drop trap)
    from ner_funtool_ray.pipelines.analytic import large_volume_customers

    res = large_volume_customers(SF_DIR, qty_threshold=1e9)
    assert res.count() == 0
    assert list(res.schema().names) == [
        "c_custkey", "c_name", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty",
    ]


def test_doc_top_terms_counter_fallback_matches_polars_path():
    # the Counter fallback (polars absent) must produce the polars result
    import ner_funtool_ray.pipelines.analytic as A

    got = _normalize(A.doc_top_terms(SF_DIR).to_pandas())
    import unittest.mock as mock

    real_import = __builtins__["__import__"] if isinstance(__builtins__, dict) else __builtins__.__import__

    def no_polars(name, *a, **k):
        if name == "polars":
            raise ImportError("forced")
        return real_import(name, *a, **k)

    with mock.patch("builtins.__import__", side_effect=no_polars):
        fb = _normalize(A.doc_top_terms(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(got, fb, check_dtype=False)


def test_customer_order_window_distributed_matches_oracle():
    # driver_cap=None disables the driver fast path (groupagg convention),
    # forcing the bucketed shuffle plan; identical to the SQL twin
    from ner_funtool_ray.pipelines.analytic import customer_order_window

    got = _normalize(customer_order_window(SF_DIR, driver_cap=None).to_pandas())
    con = _duck(SF_DIR)
    expect = _normalize(con.sql(ORACLES["customer_order_window"]).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_nation_pair_volume_fallback_matches_oracle():
    from ner_funtool_ray.pipelines.relational import nation_pair_volume

    got = _normalize(
        nation_pair_volume(SF_DIR, broadcast_limit=0).to_pandas()
    )
    con = _duck(SF_DIR)
    exp = _normalize(con.sql(ORACLES["nation_pair_volume"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
