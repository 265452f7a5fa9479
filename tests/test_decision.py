"""Decision-support shapes (pipelines/decision.py): the default plans are
oracle-covered by test_queries_oracle.py; here the bucketed-shuffle
FALLBACK plans (broadcast_limit=0) must match the broadcast plans, plus
shape-level invariants the oracle can't see."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from ner_funtool_ray.pipelines import decision as D

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize(
    "fn",
    [
        D.local_supplier_volume,
        D.market_share,
        D.waiting_suppliers,
        D.idle_rich_customers,
    ],
)
def test_fallback_plan_matches_broadcast_plan(fn):
    fast = _norm(fn(SF).to_pandas())
    slow = _norm(fn(SF, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_annotate_cust_nation_plans_agree():
    import pyarrow as pa
    import pyarrow.compute as pc

    def prep(batch):
        return pa.table(
            {
                "orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            }
        )

    fast = _norm(
        D._annotate_cust_nation(
            SF, ["l_orderkey", "l_suppkey"], prep, ["suppkey"]
        ).to_pandas()
    )
    slow = _norm(
        D._annotate_cust_nation(
            SF, ["l_orderkey", "l_suppkey"], prep, ["suppkey"],
            broadcast_limit=0,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    # every lineitem row is annotated (all orders resolve to a customer)
    con = duckdb.connect()
    n_li = con.sql(f"SELECT count(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    assert len(fast) == n_li


def test_waiting_suppliers_planted_verdict(tmp_path):
    """Hand-built fixture: order 1 has two suppliers, only supplier 7
    late -> counted; order 2 single-supplier late -> not counted; order 3
    two late suppliers -> not counted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_orderdate": pa.array(
                    [ts("1996-01-01")] * 3, type=pa.timestamp("us")
                ),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 3], type=pa.int64()),
                "l_suppkey": pa.array([7, 8, 7, 7, 8], type=pa.int64()),
                "l_shipdate": pa.array(
                    [
                        ts("1996-09-01"),  # late (order 1, supp 7)
                        ts("1996-01-15"),  # on time (order 1, supp 8)
                        ts("1996-09-01"),  # late but single-supplier order
                        ts("1996-09-01"),  # late (order 3, supp 7)
                        ts("1996-09-01"),  # late (order 3, supp 8)
                    ],
                    type=pa.timestamp("us"),
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([7, 8], type=pa.int64()),
                "s_name": pa.array(["SUPP_7", "SUPP_8"], type=pa.string()),
            }
        ),
        d / "supplier.parquet",
    )
    out = D.waiting_suppliers(str(d)).to_pandas()
    assert out.to_dict("records") == [{"s_name": "SUPP_7", "numwait": 1}]


def test_small_quantity_threshold_semantics(tmp_path):
    """5·n·q < Σq is strict: a part whose every line has the same quantity
    never qualifies; a single tiny line among large ones does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], type=pa.int64()),
                "p_brand": pa.array(["Brand#11", "Brand#11"], type=pa.string()),
            }
        ),
        d / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # part 1: uniform qty 10 -> no line below 0.2*avg
                # part 2: qties [1, 100, 100] -> avg 67, 0.2*avg=13.4 -> the
                # qty-1 line qualifies
                "l_partkey": pa.array([1, 1, 2, 2, 2], type=pa.int64()),
                "l_quantity": pa.array(
                    [10.0, 10.0, 1.0, 100.0, 100.0], type=pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [5.0, 5.0, 7.5, 9.0, 9.0], type=pa.float64()
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    out = D.small_quantity_revenue(str(d), brands=("Brand#11",)).to_pandas()
    assert out.to_dict("records") == [
        {"p_brand": "Brand#11", "total_cents": 750, "n_lines": 1}
    ]


def test_waiting_suppliers_driver_cap_plans_agree():
    fast = _norm(D.waiting_suppliers(SF).to_pandas())
    bucketed = _norm(D.waiting_suppliers(SF, driver_cap=0).to_pandas())
    pd.testing.assert_frame_equal(fast, bucketed, check_dtype=False)
