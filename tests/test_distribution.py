"""Count-of-counts, share-of-total, and integer anomaly flagging."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def planted_dir(tmp_path):
    # 5 customers; customer 5 has NO orders (zero bin), 1-2 have one
    # order each, 3-4 have three orders each
    pq.write_table(
        pa.table({"c_custkey": [1, 2, 3, 4, 5]}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"o_custkey": [1, 2, 3, 3, 3, 4, 4, 4]}),
        tmp_path / "orders.parquet",
    )
    return str(tmp_path)


def test_customer_order_histogram_zero_bin(ray_session, planted_dir):
    from ner_funtool_ray.pipelines.distribution import customer_order_histogram

    df = (
        customer_order_histogram(planted_dir)
        .to_pandas()
        .set_index("c_count")["custdist"]
        .to_dict()
    )
    assert df == {0: 1, 1: 2, 3: 2}


def test_customer_order_histogram_totals(ray_session):
    from ner_funtool_ray.pipelines.distribution import customer_order_histogram
    from ner_funtool_ray.sources.io import parquet_num_rows

    df = customer_order_histogram(SF_DIR).to_pandas()
    # histogram mass == customer count; weighted mass == order count
    assert df["custdist"].sum() == parquet_num_rows(f"{SF_DIR}/customer.parquet")
    assert (df["c_count"] * df["custdist"]).sum() == parquet_num_rows(
        f"{SF_DIR}/orders.parquet"
    )


def test_important_parts_threshold_semantics(ray_session):
    from ner_funtool_ray.pipelines.distribution import important_parts

    df = important_parts(SF_DIR).to_pandas()
    assert len(df) > 0
    lo = important_parts(SF_DIR, boost_num=0, boost_den=1).to_pandas()
    # a zero threshold keeps the whole catalog, and every kept row of the
    # default cut is in it with identical cents
    assert len(lo) >= len(df)
    merged = df.merge(lo, on="l_partkey", suffixes=("", "_all"))
    assert len(merged) == len(df)
    assert (merged["part_cents"] == merged["part_cents_all"]).all()
    # shares are exact floors of ppm
    tot = lo["part_cents"].sum()
    expect = (df["part_cents"].astype(object) * 1_000_000 // int(tot)).astype(
        np.int64
    )
    assert (df["share_ppm"].to_numpy() == expect.to_numpy()).all()


@pytest.fixture()
def anomaly_dir(tmp_path):
    # type A: 9 quiet days of 2 events + one day of 40 (clear outlier);
    # type B: flat — nothing may be flagged
    ts, et = [], []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    for d in range(9):
        for _ in range(2):
            ts.append(base + d * day)
            et.append("A")
    for _ in range(40):
        ts.append(base + 9 * day)
        et.append("A")
    for d in range(10):
        for _ in range(3):
            ts.append(base + d * day)
            et.append("B")
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.zeros(len(ts), dtype=np.int64)),
                "event_type": pa.array(et),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )
    return str(tmp_path)


def test_event_anomaly_planted(ray_session, anomaly_dir):
    from ner_funtool_ray.pipelines.distribution import event_anomaly_cells

    df = event_anomaly_cells(anomaly_dir).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["event_type"] == "A"
    assert df.iloc[0]["cnt"] == 40
    # exact integer algebra: c*n - S = 40*10 - 58 = 342 > 0,
    # 342^2 = 116964 > 4*(10*1636 - 58^2) = 51984
    assert 342 * 342 > 4 * (10 * (9 * 4 + 1600) - 58 * 58)


def test_degree_histogram_distributed_parity(ray_session):
    from ner_funtool_ray.pipelines.graph import entity_degree_histogram

    drv = (
        entity_degree_histogram(SF_DIR)
        .to_pandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    dist = (
        entity_degree_histogram(SF_DIR, driver_cap=0)
        .to_pandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert drv["n_entities"].sum() > 0


def test_order_price_decile_invariants(ray_session):
    from ner_funtool_ray.pipelines.relational import order_price_decile

    a = (
        order_price_decile(SF_DIR, n_partitions=32)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    b = (
        order_price_decile(SF_DIR, n_partitions=5)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # deciles are balanced: each tile holds N//10 or N//10 + 1 rows
    sizes = a["decile"].value_counts()
    n = len(a)
    assert set(sizes.index) == set(range(10))
    assert sizes.min() >= n // 10 and sizes.max() <= n // 10 + 1
    # ordering respected: max cents of tile t <= min cents of tile t+1
    g = a.groupby("decile")["cents"]
    mx, mn = g.max(), g.min()
    assert all(mx[t] <= mn[t + 1] for t in range(9))


def test_event_type_trigrams_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ner_funtool_ray.pipelines.sequence import event_type_trigrams

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
         "2024-01-01 00:02:00", "2024-01-01 00:03:00",
         "2024-01-01 00:00:30"]
    )
    pq.write_table(
        pa.table(
            {
                "event_id": [1, 2, 3, 4, 5],
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": [7, 7, 7, 7, 8],  # user 8: single event, no trigram
                "event_type": ["view", "click", "view", "purchase", "view"],
            }
        ),
        tmp_path / "events.parquet",
    )
    df = event_type_trigrams(str(tmp_path)).to_pandas()
    got = {
        (r.t1, r.t2, r.t3): r.n for r in df.itertuples()
    }
    assert got == {
        ("view", "click", "view"): 1,
        ("click", "view", "purchase"): 1,
    }


def test_cheapest_supplier_per_part_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ner_funtool_ray.pipelines.distribution import cheapest_supplier_per_part

    # part 1: supp 5 is cheapest; part 2: tie at 3.00 -> lower suppkey (2)
    pq.write_table(
        pa.table(
            {
                "l_partkey": [1, 1, 1, 2, 2],
                "l_suppkey": [4, 5, 4, 9, 2],
                "l_extendedprice": [10.0, 7.5, 8.0, 3.0, 3.0],
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": [2, 4, 5, 9],
                "s_name": ["s2", "s4", "s5", "s9"],
            }
        ),
        tmp_path / "supplier.parquet",
    )
    df = (
        cheapest_supplier_per_part(str(tmp_path))
        .to_pandas()
        .set_index("l_partkey")
        .sort_index()
    )
    assert df.loc[1, "s_suppkey"] == 5 and df.loc[1, "best_cents"] == 750
    assert df.loc[2, "s_suppkey"] == 2 and df.loc[2, "s_name"] == "s2"
