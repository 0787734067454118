"""Sketch surface (`operators/sketch.py`): exact forms vs numpy, and
measured error bounds for the mergeable sketch scale path."""

from __future__ import annotations

import numpy as np
import pandas as pd

from var_elasticnet_bigdata_spark.operators.sketch import (
    distinct_count,
    grouped_quantiles,
)


def _df(spark, seed=0, n=20_000):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "g": rng.integers(0, 3, n),
                "v": rng.lognormal(0.0, 1.0, n).round(6),
                "u": rng.integers(0, 2_000, n).astype("int64"),
            }
        )
    )


def test_exact_quantiles_match_numpy(spark):
    df = _df(spark)
    pdf = df.toPandas()
    qs = [0.5, 0.9, 0.99]
    act = grouped_quantiles(df, ["g"], "v", qs).toPandas()
    for g, sub in pdf.groupby("g"):
        for q in qs:
            exp = np.quantile(sub["v"], q)  # linear interpolation
            got = act[(act.g == g) & (act.q == q)]["value"].iloc[0]
            np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_approx_quantiles_rank_error_bounded(spark):
    df = _df(spark)
    pdf = df.toPandas()
    acc = 100  # rank error <= 1/acc of the group size
    act = grouped_quantiles(df, ["g"], "v", [0.5, 0.9], exact=False, accuracy=acc)
    for r in act.collect():
        sub = np.sort(pdf[pdf.g == r.g]["v"].to_numpy())
        rank = np.searchsorted(sub, r.value) / len(sub)
        assert abs(rank - r.q) <= 1.0 / acc + 0.01


def test_distinct_count_exact_and_hll(spark):
    df = _df(spark)
    pdf = df.toPandas()
    exact = {
        r.g: r.n_distinct for r in distinct_count(df, ["g"], "u").collect()
    }
    for g, sub in pdf.groupby("g"):
        assert exact[g] == sub["u"].nunique()
    approx = {
        r.g: r.n_distinct
        for r in distinct_count(df, ["g"], "u", exact=False, rsd=0.02).collect()
    }
    for g, n in exact.items():
        assert abs(approx[g] - n) / n < 0.1  # 5 sigma of rsd=0.02
