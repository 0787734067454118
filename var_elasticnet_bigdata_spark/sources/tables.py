"""Parquet table registry for the canonical test schema.

The reference reads rectangular Excel ranges (``Main.R:32-37``); the
engine's canonical sources are columnar Parquet scans — Catalyst gives
column pruning + predicate pushdown for free, which is the scan-side
behaviour the ranged Excel reads emulated by hand (SURVEY §2.1 S1-S4).

At 100 TB, the fact tables (``lineitem``, ``orders``, ``events``)
would be date-partitioned so `P3` time-window slices become partition
pruning rather than row filters; the API here is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Pure `spark.read.parquet` — projection and
    filters are left to the caller so Catalyst pushes them into the
    scan (verify with `.explain`: `PushedFilters` / narrow `ReadSchema`).

    ``events.ts`` is stored as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as long
    nanoseconds and is converted to a microsecond TIMESTAMP_NTZ here
    (floor-truncation — the same ns→µs semantics DuckDB applies)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries and
    the DataFrame API share one catalog."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
