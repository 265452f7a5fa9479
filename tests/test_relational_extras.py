"""Invariant tests for the gap-fill resample and the correlated
above-average query (oracle equivalence is covered by the sweep in
test_queries_oracle.py)."""

import numpy as np
import pandas as pd

from ner_funtool_ray.pipelines.relational import (
    events_gapfill,
    orders_above_customer_avg,
)

SF_DIR = "/root/testdata/sf0.001"


def test_gapfill_dense_grid_and_mass_conservation():
    df = events_gapfill(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type"])
    # total mass is conserved; empty windows exist and are explicit zeros
    assert df["n"].sum() == len(ev)
    assert (df["n"] == 0).any()
    # the grid is dense: every type covers the identical full slot range
    per_type = df.groupby("event_type")["window_start"]
    spans = per_type.agg(["min", "max", "size"])
    assert spans["min"].nunique() == 1 and spans["max"].nunique() == 1
    assert spans["size"].nunique() == 1
    step = np.timedelta64(15 * 60 * 1_000_000, "us")
    one = df[df["event_type"] == df["event_type"].iloc[0]].sort_values(
        "window_start"
    )
    assert (np.diff(one["window_start"].to_numpy()) == step).all()


def test_above_customer_avg_bounds():
    df = orders_above_customer_avg(SF_DIR).to_pandas()
    # a customer's most expensive order can't exceed the average unless
    # another order is below it: n_above is in [0, n_orders - 1], and a
    # single-order customer is never above their own average
    assert (df["n_above"] >= 0).all()
    assert (df["n_above"] <= df["n_orders"] - 1).all()
    assert (df.loc[df["n_orders"] == 1, "n_above"] == 0).all()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
    assert df["n_orders"].sum() == len(orders)
