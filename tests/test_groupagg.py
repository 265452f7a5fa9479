"""bucketed_group_sum: exact equality with a single-process pandas groupby
over a multi-block dataset (regression test for the cross-process bucket
hash bug — pandas hash_pandas_object salted buckets per worker)."""

import numpy as np
import pyarrow as pa
import ray.data

from ner_funtool_ray.stages.groupagg import bucketed_group_sum


def _table(n=50000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k1": [f"key{int(x)}" for x in rng.integers(0, 2000, n)],
            "k2": [f"t{int(x)}" for x in rng.integers(0, 3, n)],
            "w": rng.integers(1, 5, n).astype(np.int64),
        }
    )


def test_bucketed_group_sum_matches_pandas():
    tbl = _table()
    expect = (
        tbl.to_pandas()
        .groupby(["k1", "k2"], as_index=False)
        .agg(w=("w", "sum"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = (
        bucketed_group_sum(ds, ["k1", "k2"], sum_cols={"w": "w"}, count_col=None)
        .to_pandas()[["k1", "k2", "w"]]
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert got.equals(expect)


def test_bucketed_group_count():
    tbl = _table(n=10000, seed=1)
    expect = (
        tbl.to_pandas()
        .groupby(["k1"], as_index=False)
        .agg(w=("w", "sum"), n=("w", "size"))
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = bucketed_group_sum(ds, ["k1"], sum_cols={"w": "w"}, count_col="n").to_pandas()
    merged = got.merge(expect, on="k1", suffixes=("", "_e"))
    assert len(merged) == len(expect) == len(got)
    assert (merged["w"] == merged["w_e"]).all()
    assert (merged["n"] == merged["n_e"]).all()


def test_deterministic_across_runs():
    tbl = _table(n=30000, seed=2)
    runs = []
    for _ in range(2):
        ds = ray.data.from_arrow(tbl).repartition(8)
        out = (
            bucketed_group_sum(ds, ["k1", "k2"], sum_cols={"w": "w"}, count_col=None)
            .to_pandas()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        runs.append(out[["k1", "k2", "w"]])
    assert runs[0].equals(runs[1])


def test_null_group_keys_kept():
    # DuckDB oracles keep NULL group keys; pandas drops them by default —
    # regression for the dropna=False fix (ADVICE r1)
    import pyarrow as pa

    tbl = pa.table(
        {
            "k1": ["a", None, "a", None, "b"],
            "w": [1, 2, 3, 4, 5],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = (
        bucketed_group_sum(ds, ["k1"], sum_cols={"w": "w"}, count_col="n")
        .to_pandas()
    )
    by_key = {k: (int(w), int(n)) for k, w, n in zip(got["k1"], got["w"], got["n"])}
    keys = {k for k in by_key if isinstance(k, str)}
    assert keys == {"a", "b"}
    null_rows = [v for k, v in by_key.items() if not isinstance(k, str)]
    assert null_rows == [(6, 2)]  # the NULL group survives with w=2+4
    assert by_key["a"] == (4, 2)
    assert by_key["b"] == (5, 1)


def test_empty_input_driver_cap_returns_empty_with_schema():
    # Regression (ADVICE r2): empty partials + driver_cap used to KeyError
    # because Dataset.to_pandas() drops columns on zero rows
    empty = _table(n=100, seed=3).slice(0, 0)  # zero rows, real schema
    ds = ray.data.from_arrow(empty)
    out = bucketed_group_sum(
        ds, ["k1"], sum_cols={"w": "w"}, count_col="n", driver_cap=1000
    )
    assert out.count() == 0
    assert set(out.schema().names) == {"k1", "w", "n"}


def test_driver_cap_matches_shuffle_path():
    tbl = _table(n=20000, seed=4)
    ds1 = ray.data.from_arrow(tbl).repartition(8)
    ds2 = ray.data.from_arrow(tbl).repartition(8)
    via_driver = (
        bucketed_group_sum(
            ds1, ["k1", "k2"], sum_cols={"w": "w"}, count_col=None,
            driver_cap=10_000_000,
        )
        .to_pandas()[["k1", "k2", "w"]]
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    via_shuffle = (
        bucketed_group_sum(
            ds2, ["k1", "k2"], sum_cols={"w": "w"}, count_col=None,
            driver_cap=None,
        )
        .to_pandas()[["k1", "k2", "w"]]
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert via_driver.equals(via_shuffle)
