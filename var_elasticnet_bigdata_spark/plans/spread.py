"""Scan-parallelism floor for expensive narrow passes.

A single small parquet file scans as ONE input partition (the split
floor is ``spark.sql.files.openCostInBytes``, and a file with one row
group cannot split anyway), so every CPU-heavy narrow chain built on
it — codec synth/decode Arrow passes, HOF-dense shingle/tokenize
projections — serializes on one task no matter how many cores the
session has. ``spread_to_cores`` hash-repartitions such a frame up to
the session's core count WHEN (and only when) it carries fewer
partitions: the guide's unsplittable-input fix (§2.5), applied as a
conditional so the 100 TB case — scans arriving with thousands of
splits — adds NO exchange. Keys are the frame's stable id column(s):
deterministic under task retry (unlike round-robin over a
non-deterministic input, SPARK-38388), and placement cannot change
any per-row derived value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_to_cores(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism on
    ``key_cols`` if it currently has fewer partitions; no-op (and no
    added exchange) otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df
