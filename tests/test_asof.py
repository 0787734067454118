"""as-of join (`operators/asof.py`) vs the pandas.merge_asof oracle.

merge_asof implements the exact semantics we target (inclusive match,
backward/forward, tolerance, left-keep), so every property is checked
against it on randomized frames; the driver-gate query `j2_asof_join`
is additionally hash-checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from var_elasticnet_bigdata_spark.operators.asof import asof_join


def _frames(seed: int, n_left: int = 200, n_right: int = 150, n_keys: int = 7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.choice(np.arange(0, 10_000, 3), n_left, replace=False).astype(
                "int64"
            ),
            "lv": rng.normal(size=n_left).round(6),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.choice(np.arange(1, 10_000, 7), n_right, replace=False).astype(
                "int64"
            ),
            "rv": rng.normal(size=n_right).round(6),
            "tag": [f"r{i}" for i in range(n_right)],
        }
    )
    return left, right


def _expected(left, right, direction, tolerance=None):
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        suffixes=("", "_r"),
        tolerance=tolerance,
    )
    matched = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "rt"}).assign(t=lambda d: d.rt),
        on="t",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )["rt"]
    exp = exp.assign(t_r=matched.values)
    return exp.sort_values(["k", "t"]).reset_index(drop=True)


def _actual(spark, left, right, direction, tolerance=None, how="left"):
    res = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="t",
        direction=direction,
        tolerance=tolerance,
        how=how,
    )
    return (
        res.toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_pandas_merge_asof(spark, direction, seed):
    left, right = _frames(seed)
    exp = _expected(left, right, direction)
    act = _actual(spark, left, right, direction)
    assert len(act) == len(exp)
    for col in ["k", "t", "lv"]:
        np.testing.assert_array_equal(act[col].values, exp[col].values)
    np.testing.assert_allclose(
        act["rv"].to_numpy(dtype=float), exp["rv"].to_numpy(dtype=float)
    )
    np.testing.assert_array_equal(
        act["t_r"].to_numpy(dtype=float), exp["t_r"].to_numpy(dtype=float)
    )
    assert act["tag"].fillna("∅").tolist() == exp["tag"].fillna("∅").tolist()


def test_tolerance_and_inner(spark):
    left, right = _frames(3)
    exp = _expected(left, right, "backward", tolerance=50)
    act = _actual(spark, left, right, "backward", tolerance=50.0)
    np.testing.assert_array_equal(
        act["t_r"].to_numpy(dtype=float), exp["t_r"].to_numpy(dtype=float)
    )
    np.testing.assert_allclose(
        act["rv"].to_numpy(dtype=float), exp["rv"].to_numpy(dtype=float)
    )
    inner = _actual(spark, left, right, "backward", tolerance=50.0, how="inner")
    assert len(inner) == exp["t_r"].notna().sum()
    assert inner["t_r"].notna().all()


def test_inclusive_tie_and_column_rename(spark):
    left = pd.DataFrame({"k": [1, 1], "t": [10, 20], "v": [1.0, 2.0]})
    right = pd.DataFrame({"k": [1, 1], "t": [10, 15], "v": [9.0, 8.0]})
    act = _actual(spark, left, right, "backward")
    # equal timestamps match (inclusive), and colliding names get _r
    assert set(act.columns) == {"k", "t", "v", "t_r", "v_r"}
    assert act.loc[act.t == 10, "v_r"].iloc[0] == 9.0
    assert act.loc[act.t == 20, "v_r"].iloc[0] == 8.0
    fwd = _actual(spark, left, right, "forward")
    assert fwd.loc[fwd.t == 10, "v_r"].iloc[0] == 9.0
    assert fwd.loc[fwd.t == 20, "v_r"].iloc[0] is None or np.isnan(
        fwd.loc[fwd.t == 20, "v_r"].iloc[0]
    )


def test_single_shuffle_plan(spark):
    left = pd.DataFrame({"k": [1, 2], "t": [10, 20], "v": [1.0, 2.0]})
    right = pd.DataFrame({"k": [1, 2], "t": [5, 25], "w": [9.0, 8.0]})
    res = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), "k", "t"
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    # union-merge: exactly one exchange (hash partition on the key),
    # no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("CartesianProduct", "SortMergeJoin", "BroadcastNestedLoop"):
        assert bad not in plan


def test_null_right_payload_does_not_stitch_rows(spark):
    # regression: per-column fill would take 'a' from an OLDER row when
    # the matched row's 'a' is NULL — the match must be atomic per row
    left = pd.DataFrame({"k": [1], "t": [6]})
    right = pd.DataFrame(
        {"k": [1, 1], "t": [1, 5], "a": [1.0, None], "tag": ["old", "new"]}
    )
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), "k", "t"
    ).toPandas()
    assert out.loc[0, "tag"] == "new" and out.loc[0, "t_r"] == 5
    assert np.isnan(out.loc[0, "a"])  # NOT 1.0 from the t=1 row
    # and with a tolerance excluding t=1, nothing leaks through either
    tol = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        "k", "t", tolerance=2.0,
    ).toPandas()
    assert tol.loc[0, "tag"] == "new" and np.isnan(tol.loc[0, "a"])


def test_output_name_collision_raises(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1], "v": [1.0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [1], "v": [2.0], "v_r": [3.0]})
    )
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, "k", "t")
