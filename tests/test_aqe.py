"""AQE runtime behaviors asserted on REAL executions — the 100 TB
runtime levers the session enables (session.py): skew-join split,
shuffle-partition coalescing, and runtime bloom-filter join pruning.

These tests inspect the FINAL adaptive plan of the same
QueryExecution that ran (collect() on the DataFrame — a count() or a
write spawns a different QueryExecution whose final plan is not
visible from the original)."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        k = k.replace("__", ".")
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_aqe_splits_skewed_join(spark):
    """One hot key (99% of rows) in a sort-merge join: AQE must mark
    the partition skewed and split it into multiple tasks instead of
    letting one straggler carry 99% of the work."""
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        big = (
            spark.range(100_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(
                    F.col("id") % 37
                ),
            )
            .withColumn(
                "pay", F.concat(*[F.md5(F.col("id").cast("string"))] * 8)
            )
        )
        dim = (
            spark.range(37)
            .withColumnRenamed("id", "k")
            .withColumn("v", F.col("k") * 2)
        )
        j = big.join(dim, "k").select("k", "v")
        plan = _final_plan(j)
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """A 7-group aggregate under 32 shuffle partitions: AQE must
    coalesce the near-empty partitions at runtime."""
    with _confs(
        spark,
        **{"spark.sql.adaptive.coalescePartitions.enabled": "true"},
    ):
        small = (
            spark.range(1_000)
            .withColumn("g", F.col("id") % 7)
            .groupBy("g")
            .count()
        )
        plan = _final_plan(small)
        assert "AQEShuffleRead coalesced" in plan


def test_runtime_bloom_filter_prunes_join_scan(spark, tmp_path):
    """A selective dim filter injects a bloom filter
    (might_contain) on the fact side's join key BEFORE the shuffle —
    the runtime row-pruning that makes selective big-joins viable at
    100 TB. Requires parquet sources (size statistics)."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    (
        spark.range(200_000)
        .withColumn("k", F.col("id") % 5000)
        .withColumn("pay", F.md5(F.col("id").cast("string")))
        .write.mode("overwrite")
        .parquet(fact_p)
    )
    (
        spark.range(5000)
        .withColumnRenamed("id", "k")
        .withColumn("cat", F.col("k") % 17)
        .write.mode("overwrite")
        .parquet(dim_p)
    )
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter("cat = 3")
        j = fact.join(dim, "k")
        pp = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in pp, "bloom runtime filter not injected"
        # result correctness with the filter active: 40 fact rows per
        # key × the dim keys with cat==3
        n_keys = sum(1 for k in range(5000) if k % 17 == 3)
        assert j.count() == (200_000 // 5000) * n_keys
