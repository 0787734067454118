"""Skew mitigation (`operators/skew.py`): salted rewrites must be
invisible in results and visible in the plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.operators.skew import salted_agg, salted_join


def _skewed(spark, n=5000, hot_frac=0.7, seed=0):
    rng = np.random.default_rng(seed)
    k = np.where(
        rng.random(n) < hot_frac, 0, rng.integers(1, 50, n)
    ).astype("int64")
    return spark.createDataFrame(
        pd.DataFrame({"k": k, "v": rng.normal(size=n).round(6)})
    )


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = (
        df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            df,
            ["k"],
            {
                "n": ("count", "v"),
                "s": ("sum", "v"),
                "a": ("avg", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salts=8,
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(salted["k"], plain["k"])
    np.testing.assert_array_equal(salted["n"], plain["n"])
    for c in ["s", "a", "lo", "hi"]:
        np.testing.assert_allclose(salted[c], plain[c], rtol=1e-12)


def test_salted_agg_two_stage_plan(spark):
    df = _skewed(spark)
    res = salted_agg(df, ["k"], {"s": ("sum", "v")}, salts=8)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # stage-1 grouping carries the salt key
    assert "__salt" in plan


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, how):
    big = _skewed(spark)
    rng = np.random.default_rng(1)
    # dim covers only keys 0..39 → key 40+ unmatched, exercises `left`
    small = spark.createDataFrame(
        pd.DataFrame(
            {"k": np.arange(40, dtype="int64"), "w": rng.normal(size=40).round(6)}
        )
    )
    plain = (
        big.join(small, "k", how)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.coalesce("w", F.lit(0.0))).alias("x"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        salted_join(big, small, "k", salts=8, how=how)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.coalesce("w", F.lit(0.0))).alias("x"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(salted["k"], plain["k"])
    np.testing.assert_array_equal(salted["n"], plain["n"])
    np.testing.assert_allclose(salted["x"], plain["x"], rtol=1e-9)


def test_salted_join_key_includes_salt(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(40, dtype="int64"), "w": np.zeros(40)})
    )
    res = salted_join(big, small, "k", salts=8)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join key carries the salt
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_salted_join_rejects_outer(spark):
    big = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(big, big, "k", how="full_outer")
