"""Partitioned writes: static partition pruning and dynamic partition
pruning (DPP) — the directory-layout half of the storage story
(`tests/test_bucketing.py` covers the bucket half).

At 100 TB, a date/category-partitioned layout means a filtered scan
touches only the matching directories; DPP extends that to joins,
deriving the partition filter at runtime from the dim side."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("part") / "facts")
    rng = np.random.default_rng(0)
    n = 30_000
    pdf = pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c", "d", "e"], n),
            "k": rng.integers(0, 100, n).astype("int64"),
            "v": rng.normal(size=n).round(6),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").partitionBy(
        "cat"
    ).parquet(base)
    return base, pdf


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, part_dir):
    base, pdf = part_dir
    f = spark.read.parquet(base).filter(F.col("cat") == "b")
    plan = _plan(f)
    assert "PartitionFilters: [isnotnull(cat" in plan
    assert f.count() == (pdf.cat == "b").sum()
    # the partition column never reaches the data filters
    assert "PushedFilters: []" in plan


def test_dynamic_partition_pruning(spark, part_dir, tmp_path):
    base, pdf = part_dir
    facts = spark.read.parquet(base)
    # DPP derives the partition filter from a FILTERED file-source dim
    dim_pdf = pd.DataFrame(
        {"cat": ["a", "b", "c", "d", "e"], "w": [1.0, 9.0, 2.0, 9.0, 9.0]}
    )
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(dim_pdf).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("w") < 5.0)
    res = facts.join(dim, "cat").agg(F.sum(F.col("v") * F.col("w")).alias("x"))
    plan = _plan(res)
    assert "dynamicpruning" in plan.lower(), plan
    exp = (
        pdf.merge(dim_pdf[dim_pdf.w < 5.0], on="cat").eval("v * w").sum()
    )
    np.testing.assert_allclose(res.collect()[0]["x"], exp, rtol=1e-9)
