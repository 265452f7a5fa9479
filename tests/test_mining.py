"""Unit tests for the mining family: basket pairs, cohort retention,
global running sum, skyline.  The oracle suite covers the default plans
end-to-end; these pin the algorithmic pieces and the plan knobs."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_pairs_within_groups_matches_bruteforce():
    from ner_funtool_ray.pipelines.mining import _pairs_within_groups

    rng = np.random.default_rng(7)
    rows = set()
    for g in range(40):
        for v in rng.choice(1000, size=rng.integers(1, 9), replace=False):
            rows.add((g, int(v)))
    arr = np.array(sorted(rows), dtype=np.int64)
    a, b = _pairs_within_groups(arr[:, 0], arr[:, 1])
    got = set(zip(a.tolist(), b.tolist()))
    expect = {
        (x, y)
        for (g1, x) in rows
        for (g2, y) in rows
        if g1 == g2 and x < y
    }
    assert got == expect


def test_skyline_mask_matches_bruteforce():
    from ner_funtool_ray.pipelines.mining import _skyline_mask

    rng = np.random.default_rng(3)
    p = rng.integers(0, 20, size=300).astype(np.int64)
    d = rng.integers(0, 20, size=300).astype(np.int64)
    got = _skyline_mask(p, d)
    for i in range(len(p)):
        dominated = bool(
            np.any(
                (p <= p[i])
                & (d <= d[i])
                & ((p < p[i]) | (d < d[i]))
            )
        )
        assert got[i] == (not dominated), i


def test_basket_distributed_matches_driver(ray_session):
    from ner_funtool_ray.pipelines.mining import basket_part_pairs

    fast = _norm(basket_part_pairs(SF_DIR))
    dist = _norm(basket_part_pairs(SF_DIR, driver_cap=None))
    pd.testing.assert_frame_equal(fast, dist)


def test_basket_min_support_filters(ray_session):
    from ner_funtool_ray.pipelines.mining import basket_part_pairs

    all_pairs = basket_part_pairs(SF_DIR).to_pandas()
    filtered = basket_part_pairs(SF_DIR, min_support=2).to_pandas()
    assert len(filtered) == int((all_pairs["n_orders"] >= 2).sum())
    # a pair never counts an order twice even with duplicate lineitems
    assert (all_pairs["n_orders"] >= 1).all()
    assert (all_pairs["part_a"] < all_pairs["part_b"]).all()


def test_running_revenue_partition_invariance(ray_session):
    from ner_funtool_ray.pipelines.mining import running_revenue

    a = _norm(running_revenue(SF_DIR))
    b = _norm(running_revenue(SF_DIR, n_partitions=5))
    pd.testing.assert_frame_equal(a, b)
    # the scan's last value is the global total
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    total = int(
        pc.sum(
            pc.cast(
                pc.round(
                    pc.multiply(t["o_totalprice"], 100.0),
                    round_mode="half_towards_infinity",
                ),
                "int64",
            )
        ).as_py()
    )
    assert a["running_cents"].max() == total


def test_pareto_of_union_property():
    # the correctness invariant the distributed plan relies on: the global
    # front is contained in the union of per-chunk fronts, so applying the
    # mask locally then globally equals one global pass
    from ner_funtool_ray.pipelines.mining import _skyline_mask

    rng = np.random.default_rng(11)
    p = rng.integers(0, 50, size=1000).astype(np.int64)
    d = rng.integers(0, 50, size=1000).astype(np.int64)
    keep_p, keep_d = [], []
    for lo in range(0, 1000, 137):  # uneven chunks
        pc_, dc_ = p[lo : lo + 137], d[lo : lo + 137]
        m = _skyline_mask(pc_, dc_)
        keep_p.append(pc_[m])
        keep_d.append(dc_[m])
    up, ud = np.concatenate(keep_p), np.concatenate(keep_d)
    merged = set(zip(up[_skyline_mask(up, ud)], ud[_skyline_mask(up, ud)]))
    g = _skyline_mask(p, d)
    assert merged == set(zip(p[g], d[g]))


def test_orders_pareto_cap_below_front_raises(ray_session):
    # the front cannot shrink below its true size: a cap under it must
    # fail loudly instead of looping
    from ner_funtool_ray.pipelines.mining import orders_pareto

    with pytest.raises(ValueError, match="pareto front"):
        orders_pareto(SF_DIR, driver_cap=0, max_rounds=2)


def test_cohort_retention_offsets_nonnegative(ray_session):
    from ner_funtool_ray.pipelines.mining import cohort_retention

    df = cohort_retention(SF_DIR).to_pandas()
    assert (df["week_offset"] >= 0).all()
    assert (df["n_users"] > 0).all()
    # offset-0 cell of each cohort counts every user of that cohort:
    # it must be the cohort's largest cell
    base = df[df["week_offset"] == 0].set_index("cohort_week")["n_users"]
    for _, r in df.iterrows():
        assert r["n_users"] <= base[r["cohort_week"]]


def test_event_anomaly_days_ranking_properties():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.mining import event_anomaly_days

    df = event_anomaly_days(SF_DIR).to_pandas()
    # exactly k=3 rows per type present in the stream, scores consistent
    assert (df.groupby("event_type").size() == 3).all()
    assert (df["prev_n"] > 0).all()
    assert (
        df["ratio_ppm"] == (df["n"] * 7 * 1_000_000) // df["prev_n"]
    ).all()
    # each row's n really is that day's count and prev_n the prior week's
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "ts"]
    ).to_pandas()
    day = ev["ts"].values.astype("datetime64[us]").astype(
        np.int64
    ) // 86_400_000_000
    ev = ev.assign(day=day)
    for r in df.itertuples():
        mask = ev["event_type"] == r.event_type
        assert r.n == ((ev["day"] == r.day) & mask).sum()
        assert r.prev_n == (
            (ev["day"] >= r.day - 7) & (ev["day"] < r.day) & mask
        ).sum()
        # no unranked full-window day of this type beats the kept top-3
        typed = ev[mask]
        days = np.arange(typed["day"].min() + 7, typed["day"].max() + 1)
        kept = set(df[df["event_type"] == r.event_type]["day"])
        worst = df[df["event_type"] == r.event_type]["ratio_ppm"].min()
        for d in days:
            if d in kept:
                continue
            n_d = (typed["day"] == d).sum()
            p_d = ((typed["day"] >= d - 7) & (typed["day"] < d)).sum()
            if p_d > 0:
                assert (n_d * 7 * 1_000_000) // p_d <= worst
