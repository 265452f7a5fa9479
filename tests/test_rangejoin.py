"""Banded-count range joins (`stages/rangejoin.py`) — brute-force parity
on random data for both plans, band-edge exactness, zero-count keeps."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _brute(left_df, right_df, band_us, key=None):
    out = {}
    for _, lrow in left_df.iterrows():
        cnt = 0
        for _, rrow in right_df.iterrows():
            if key is not None and rrow[key] != lrow[key]:
                continue
            if lrow["ts"] < rrow["ts"] <= lrow["ts"] + band_us:
                cnt += 1
        out[int(lrow["id"])] = cnt
    return out


def _run(left_df, right_df, band_us, key=None, n_salt=1):
    from ner_funtool_ray.stages.rangejoin import banded_count_join

    cols = ["id", "ts"] + ([key] if key else [])
    left = ray.data.from_arrow(pa.Table.from_pandas(left_df[cols]))
    rcols = ["ts"] + ([key] if key else [])
    right = ray.data.from_arrow(pa.Table.from_pandas(right_df[rcols]))
    got = banded_count_join(
        left, right, left_id="id", left_ts="ts", right_ts="ts",
        band_us=band_us, key=key, n_buckets=4, n_salt=n_salt,
    ).to_pandas()
    return dict(zip(got["id"].astype(int), got["n_within"].astype(int)))


@pytest.mark.parametrize("key", [None, "k"])
def test_bruteforce_parity_random(ray_session, key):
    rng = np.random.default_rng(11)
    n_l, n_r = 80, 120
    band = 50
    left = pd.DataFrame(
        {
            "id": np.arange(n_l),
            "ts": rng.integers(0, 1000, n_l),
            "k": rng.integers(0, 5, n_l),
        }
    )
    right = pd.DataFrame(
        {"ts": rng.integers(0, 1000, n_r), "k": rng.integers(0, 5, n_r)}
    )
    got = _run(left, right, band, key=key)
    want = _brute(left, right, band, key=key)
    assert got == want
    assert len(got) == n_l  # zero-count lefts kept


def test_band_edges_exact(ray_session):
    """Strictly-after start, inclusive end: ts==t excluded, ts==t+band in."""
    left = pd.DataFrame({"id": [1], "ts": [100]})
    right = pd.DataFrame({"ts": [100, 101, 150, 150, 151]})
    assert _run(left, right, band_us=50) == {1: 3}  # 101, 150, 150


def test_bin_boundary_no_double_count(ray_session):
    """Rights straddling the replication bin boundary count exactly once:
    t just below a bin edge, matches on both sides of the edge."""
    band = 100
    left = pd.DataFrame({"id": [7], "ts": [99]})  # band (99, 199] spans bins 0,1
    right = pd.DataFrame({"ts": [99, 100, 199, 200]})
    assert _run(left, right, band_us=band) == {7: 2}  # 100 and 199


def test_keyed_isolates_keys(ray_session):
    left = pd.DataFrame({"id": [1, 2], "ts": [0, 0], "k": [1, 2]})
    right = pd.DataFrame({"ts": [5, 6, 7], "k": [1, 1, 2]})
    assert _run(left, right, band_us=10, key="k") == {1: 2, 2: 1}


@pytest.mark.parametrize("key", [None, "k"])
@pytest.mark.parametrize("n_salt", [2, 5])
def test_salting_changes_schedule_not_result(ray_session, key, n_salt):
    """Hot-group sub-sharding (n_salt) must be result-invariant: counts
    are additive over the ts-hash shards."""
    rng = np.random.default_rng(3)
    # hot cluster: half the rights inside one band-width window
    hot = rng.integers(500, 550, 60)
    cold = rng.integers(0, 1000, 60)
    left = pd.DataFrame(
        {
            "id": np.arange(40),
            "ts": rng.integers(400, 700, 40),
            "k": rng.integers(0, 3, 40),
        }
    )
    right = pd.DataFrame(
        {
            "ts": np.concatenate([hot, cold]),
            "k": rng.integers(0, 3, 120),
        }
    )
    band = 50
    assert _run(left, right, band, key=key, n_salt=n_salt) == _brute(
        left, right, band, key=key
    )


def test_bad_band_raises(ray_session):
    from ner_funtool_ray.stages.rangejoin import banded_count_join

    ds = ray.data.from_items([{"id": 1, "ts": 0}])
    with pytest.raises(ValueError, match="band_us"):
        banded_count_join(ds, ds, "id", "ts", "ts", band_us=0)


def test_sf_queries_match_duckdb(ray_session):
    """Both sf-level queries vs their oracle twins at sf0.001."""
    import duckdb

    from ner_funtool_ray.pipelines.relational import (
        ORDERS_NEARBY_COUNT_SQL,
        USER_EVENT_BURST_SQL,
        orders_nearby_count,
        user_event_burst,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"create view orders as select * from '{sf}/orders.parquet'")
    con.sql(f"create view events as select * from '{sf}/events.parquet'")
    for fn, sql, idc in [
        (orders_nearby_count, ORDERS_NEARBY_COUNT_SQL, "o_orderkey"),
        (user_event_burst, USER_EVENT_BURST_SQL, "event_id"),
    ]:
        got = fn(sf).to_pandas().sort_values(idc).reset_index(drop=True)
        exp = con.sql(sql).df().sort_values(idc).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
