"""Fallback-plan parity and unit tests for pipelines/setops.py and
pipelines/stats.py.  The oracle equivalence of the default plans is
covered by the parametrized sweep in test_queries_oracle.py; these tests
force the NON-default plans (bucketed-join mode fallback, shuffled
moving window, bucketed bloom verification) and check the bloom-filter
and correlation primitives directly."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from ner_funtool_ray.pipelines.setops import (
    bloom_build,
    bloom_might_contain,
    returned_orders_bloom,
)
from ner_funtool_ray.pipelines.stats import (
    nation_mode_priority,
    qty_discount_stats,
    user_value_moving_sum,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["nation", "customer", "orders", "lineitem", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_nation_mode_priority_bucketed_join_fallback_matches_oracle():
    # broadcast_limit=0 forces the no-broadcast bucketed hash-join plan
    got = _normalize(nation_mode_priority(SF_DIR, broadcast_limit=0).to_pandas())
    from ner_funtool_ray.pipelines.stats import NATION_MODE_PRIORITY_SQL

    con = _duck()
    expect = _normalize(con.sql(NATION_MODE_PRIORITY_SQL).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_user_value_moving_sum_shuffled_matches_driver_fast_path():
    fast = _normalize(user_value_moving_sum(SF_DIR).to_pandas())
    shuffled = _normalize(
        user_value_moving_sum(SF_DIR, driver_cap=None).to_pandas()
    )
    pd.testing.assert_frame_equal(shuffled, fast, check_dtype=False)


def test_returned_orders_bloom_bucketed_verify_matches_oracle():
    # broadcast_limit=0 forces the bucketed shuffle verification
    got = _normalize(
        returned_orders_bloom(SF_DIR, broadcast_limit=0).to_pandas()
    )
    from ner_funtool_ray.pipelines.setops import RETURNED_ORDERS_BLOOM_SQL

    con = _duck()
    expect = _normalize(con.sql(RETURNED_ORDERS_BLOOM_SQL).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_returned_orders_bloom_exact_even_with_tiny_filter():
    # 512-bit bloom over ~hundreds of keys saturates with false positives;
    # the exact verification must still produce the oracle result
    got = _normalize(returned_orders_bloom(SF_DIR, m_bits=512).to_pandas())
    from ner_funtool_ray.pipelines.setops import RETURNED_ORDERS_BLOOM_SQL

    con = _duck()
    expect = _normalize(con.sql(RETURNED_ORDERS_BLOOM_SQL).df())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bloom_no_false_negatives_and_prunes():
    rng_keys = np.arange(0, 5000, 7, dtype=np.int64) * 1_000_003
    bits = bloom_build(rng_keys, m_bits=1 << 16)
    assert bloom_might_contain(bits, rng_keys).all()  # guarantee
    probe = np.arange(1, 20000, 3, dtype=np.int64)  # mostly non-members
    members = np.isin(probe, rng_keys)
    maybe = bloom_might_contain(bits, probe)
    assert maybe[members].all()
    # prunes the vast majority of true negatives at this sizing
    fp_rate = (maybe & ~members).sum() / max(1, (~members).sum())
    assert fp_rate < 0.05


def test_bloom_merge_equals_bulk_build():
    a = np.array([1, 2, 3, 10**12], dtype=np.int64)
    b = np.array([5, 6, 7], dtype=np.int64)
    merged = bloom_build(a, 1 << 12) | bloom_build(b, 1 << 12)
    bulk = bloom_build(np.concatenate([a, b]), 1 << 12)
    assert np.array_equal(merged, bulk)


def test_qty_discount_corr_matches_numpy_reference():
    got = qty_discount_stats(SF_DIR).to_pandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    for _, row in got.iterrows():
        sub = li[li["l_returnflag"] == row["l_returnflag"]]
        q = np.round(sub["l_quantity"].to_numpy()).astype(np.int64)
        d = np.round(sub["l_discount"].to_numpy() * 100).astype(np.int64)
        ref = np.corrcoef(q, d)[0, 1]
        assert abs(row["corr_qd"] - ref) < 1e-9
        assert abs(row["covar_pop_qd"] - np.cov(q, d, bias=True)[0, 1]) < 1e-6
        assert abs(row["stddev_pop_q"] - q.std()) < 1e-9
        assert row["n"] == len(sub)


def test_moving_sum_window_semantics():
    out = user_value_moving_sum(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ev["cents"] = cents
    roll = (
        ev.groupby("user_id", sort=False)["cents"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    expect = pd.DataFrame(
        {
            "event_id": ev["event_id"].to_numpy(),
            "mov_cents": roll.to_numpy().astype(np.int64),
        }
    )
    m = out.merge(expect, on="event_id", suffixes=("", "_ref"))
    assert len(m) == len(out) == len(ev)
    assert (m["mov_cents"] == m["mov_cents_ref"]).all()
    assert m["n_win"].max() == 3 and m["n_win"].min() == 1


def test_ntile_semantics_match_duckdb_on_uneven_groups():
    # 7 rows / 4 tiles: NTILE gives sizes 2,2,2,1 — first n%t buckets big
    import duckdb

    con = duckdb.connect()
    exp = con.sql(
        "SELECT v, ntile(4) OVER (ORDER BY v) AS t "
        "FROM (SELECT unnest(range(7)) AS v)"
    ).df()
    n, t = 7, 4
    pos = np.arange(n)
    k, r = n // t, n % t
    boundary = r * (k + 1)
    tile = (
        np.where(pos < boundary, pos // (k + 1), r + (pos - boundary) // max(k, 1))
        + 1
    )
    assert (tile == exp.sort_values("v")["t"].to_numpy()).all()


def test_hll_accuracy_at_sf001():
    import duckdb

    from ner_funtool_ray.stages.hll import events_user_hll

    sf = "/root/testdata/sf0.01"
    got = events_user_hll(sf).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS c "
        f"FROM '{sf}/events.parquet' GROUP BY event_type"
    ).df().set_index("event_type")
    rel = (got["approx_users"] / exact["c"] - 1).abs()
    # m=16 registers → σ ≈ 1.04/√16 = 26%; generous 2σ bound
    assert (rel < 0.55).all(), rel


def test_hll_rho_and_bitlen_edges():
    from ner_funtool_ray.stages.hll import hll_rho

    h = np.array(
        [0, 1, (1 << 60) - 1, 1 << 60, (1 << 64) - 1], dtype=np.uint64
    )
    idx, rho = hll_rho(h, 4)
    assert list(idx) == [0, 0, 0, 1, 15]
    # w = low 60 bits: 0 → rho 61; 1 → rho 60; 2^60-1 → rho 1
    assert list(rho) == [61, 60, 1, 61, 1]


def test_events_cube_levels_consistent():
    from ner_funtool_ray.pipelines.analytic import events_cube

    df = events_cube(SF_DIR).to_pandas()
    fine = df[(df["event_type"] != "ALL") & (df["dow"] != "ALL")]
    grand = df[(df["event_type"] == "ALL") & (df["dow"] == "ALL")]
    assert len(grand) == 1
    assert grand["cents"].iloc[0] == fine["cents"].sum()
    assert grand["n"].iloc[0] == fine["n"].sum()
    by_type = df[(df["event_type"] != "ALL") & (df["dow"] == "ALL")]
    assert by_type["n"].sum() == fine["n"].sum()
    by_dow = df[(df["event_type"] == "ALL") & (df["dow"] != "ALL")]
    assert by_dow["n"].sum() == fine["n"].sum()
    assert set(by_dow["dow"]).issubset({str(i) for i in range(1, 8)})


def test_grouped_median_invariant_to_refinement_granularity():
    from ner_funtool_ray.pipelines.stats import order_price_median_by_priority

    base = _normalize(order_price_median_by_priority(SF_DIR).to_pandas())
    for shift in (8, 20):  # much finer / much coarser first pass
        other = _normalize(
            order_price_median_by_priority(SF_DIR, coarse_shift=shift).to_pandas()
        )
        pd.testing.assert_frame_equal(other, base)


def test_grouped_median_is_lower_middle():
    from ner_funtool_ray.pipelines.stats import order_price_median_by_priority

    got = order_price_median_by_priority(SF_DIR).to_pandas()
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype(np.int64)
    for _, row in got.iterrows():
        vals = np.sort(
            orders.loc[
                orders["o_orderpriority"] == row["o_orderpriority"], "cents"
            ].to_numpy()
        )
        assert row["median_cents"] == vals[(len(vals) + 1) // 2 - 1]
