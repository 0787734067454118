"""Grid-bucketed range join (`operators/rangejoin.py`) vs the naive
cross-filter oracle, across grid widths (the result must be
grid-invariant) — plus the no-cartesian plan assertion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from var_elasticnet_bigdata_spark.operators.rangejoin import range_join


def _data(seed=0, n_pts=400, n_iv=60):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts, dtype="int64"),
            "t": rng.uniform(0, 1000, n_pts).round(3),
        }
    )
    lo = rng.uniform(0, 950, n_iv).round(3)
    iv = pd.DataFrame(
        {
            "iid": np.arange(n_iv, dtype="int64"),
            "lo": lo,
            "hi": (lo + rng.uniform(0, 80, n_iv)).round(3),
        }
    )
    return pts, iv


def _naive(pts, iv):
    out = []
    for _, p in pts.iterrows():
        for _, i in iv.iterrows():
            if i.lo <= p.t <= i.hi:
                out.append((int(p.pid), int(i.iid)))
    return sorted(out)


@pytest.mark.parametrize("grid", [10.0, 50.0, 250.0])
def test_matches_naive_across_grids(spark, grid):
    pts, iv = _data()
    exp = _naive(pts, iv)
    res = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        "t", "lo", "hi", grid=grid,
    )
    act = sorted(
        (int(r.pid), int(r.iid)) for r in res.select("pid", "iid").collect()
    )
    assert act == exp  # exact pair set, no dups, grid-invariant


def test_inclusive_bounds_and_collision_guard(spark):
    pts = spark.createDataFrame(pd.DataFrame({"pid": [1, 2, 3], "t": [5.0, 10.0, 10.5]}))
    iv = spark.createDataFrame(pd.DataFrame({"iid": [7], "lo": [5.0], "hi": [10.0]}))
    got = sorted(r.pid for r in range_join(pts, iv, "t", "lo", "hi", 4.0).collect())
    assert got == [1, 2]  # both endpoints inclusive, outside excluded
    with pytest.raises(ValueError):
        range_join(pts, pts, "t", "lo", "hi", 4.0)


def test_no_cartesian_in_plan(spark):
    pts, iv = _data()
    res = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        "t", "lo", "hi", grid=50.0,
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
