"""Bucketed tables (`sources/bucketing.py`): the write-once shuffle.

The plan assertions are the point: a join of two tables bucketed on
the same key/count must contain NO exchange on either side, and a
group-by on the bucket key must aggregate without a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    rng = np.random.default_rng(0)
    n = 20_000
    facts = pd.DataFrame(
        {
            "k": rng.integers(0, 500, n).astype("int64"),
            "v": rng.normal(size=n).round(6),
        }
    )
    dims = pd.DataFrame(
        {
            "k": np.arange(500, dtype="int64"),
            "w": rng.normal(size=500).round(6),
        }
    )
    write_bucketed(
        spark.createDataFrame(facts), "t_facts", "k", buckets=8,
        sort_cols="k", path=str(base / "facts"),
    )
    write_bucketed(
        spark.createDataFrame(dims), "t_dims", "k", buckets=8,
        sort_cols="k", path=str(base / "dims"),
    )
    yield facts, dims
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def _no_broadcast(spark):
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    facts, dims = bucketed_pair
    old = _no_broadcast(spark)
    try:
        f = read_bucketed(spark, "t_facts")
        d = read_bucketed(spark, "t_dims")
        res = f.join(d, "k").groupBy("k").agg(F.sum(F.col("v") * F.col("w")).alias("x"))
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is right
        exp = (
            facts.merge(dims, on="k")
            .assign(x=lambda t: t.v * t.w)
            .groupby("k", as_index=False)["x"]
            .sum()
            .sort_values("k")
            .reset_index(drop=True)
        )
        act = res.toPandas().sort_values("k").reset_index(drop=True)
        np.testing.assert_array_equal(act["k"], exp["k"])
        np.testing.assert_allclose(act["x"], exp["x"], rtol=1e-9)
    finally:
        _restore(spark, old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    f = read_bucketed(spark, "t_facts")
    res = f.groupBy("k").agg(F.sum("v").alias("s"))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_plain_parquet_read_loses_buckets(spark, bucketed_pair, tmp_path):
    # the cautionary half of read_bucketed's docstring, asserted
    old = _no_broadcast(spark)
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED t_facts")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        f_raw = spark.read.parquet(loc)
        res = f_raw.groupBy("k").agg(F.sum("v").alias("s"))
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        _restore(spark, old)
