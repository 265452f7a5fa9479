"""Count-Min sketch, event transitions, FK audit, histogram: plan-variant
parity and sketch guarantees beyond the auto-oracle sweep."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_fk_bucketed_fallback_matches_broadcast(ray_session):
    from ner_funtool_ray.pipelines.quality import fk_integrity_counts

    fast = _norm(fk_integrity_counts(SF).to_pandas())
    slow = _norm(fk_integrity_counts(SF, broadcast_cap=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) == 6
    assert (fast["n_orphans"] >= 0).all()


def test_fk_orphans_detected(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3], type=pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([1, 1, 2, 9, None], type=pa.int64())}
        ),
        tmp_path / "lineitem.parquet",
    )
    from ner_funtool_ray.pipelines.quality import fk_integrity_counts

    edges = [("lineitem", "l_orderkey", "orders", "o_orderkey")]
    for cap in (10**6, 0):  # broadcast plan and bucketed plan agree
        got = fk_integrity_counts(
            str(tmp_path), edges=edges, broadcast_cap=cap
        ).to_pandas()
        assert got["n_rows"].tolist() == [5]
        assert got["n_orphans"].tolist() == [2]  # key 9 + the NULL


def test_countmin_is_upper_bound_and_finds_heavy_hitter(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    uid = np.concatenate([rng.integers(0, 400, 3000), np.full(900, 777)])
    pq.write_table(
        pa.table({"user_id": pa.array(uid, type=pa.int64())}),
        tmp_path / "events.parquet",
    )
    from ner_funtool_ray.stages.countmin import events_user_countmin

    got = events_user_countmin(str(tmp_path)).to_pandas()
    assert (got["cm_est"] >= got["true_cnt"]).all()  # CM never undercounts
    hh = got.set_index("user_id").loc[777]
    # the planted heavy hitter dominates its counters: estimate stays tight
    assert hh["true_cnt"] >= 900
    assert hh["cm_est"] <= hh["true_cnt"] * 1.2


def test_event_transitions_matches_pandas_reference(ray_session):
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.sequence import event_transitions

    got = _norm(event_transitions(SF).to_pandas())
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    ref = (
        pd.DataFrame({"from_type": ev["event_type"], "to_type": nxt})
        .dropna()
        .groupby(["from_type", "to_type"])
        .size()
        .rename("n")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, _norm(ref), check_dtype=False)
    # transition totals == events with a successor
    assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


def test_histogram_total_and_zero_fill(ray_session):
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import order_price_histogram

    got = order_price_histogram(SF).to_pandas().sort_values("bin")
    n_orders = pq.ParquetFile(f"{SF}/orders.parquet").metadata.num_rows
    assert got["bin"].tolist() == list(range(24))  # zero-filled, dense
    assert got["n"].sum() == n_orders
