"""S2/S3: CSV sink + scan round-trip (reference write.csv/read.csv of
result grids, Testing.R:311-315, 397-402)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.sources import load_table

from .conftest import SF_SMALL


def test_csv_sink_scan_roundtrip(spark):
    src = (
        load_table(spark, SF_SMALL, "orders")
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    want = {(r.o_orderstatus, r.total) for r in src.collect()}
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/grid_csv"
        src.write.option("header", True).mode("overwrite").csv(path)
        back = spark.read.option("header", True).option("inferSchema", True).csv(path)
        got = {(r.o_orderstatus, r.total) for r in back.collect()}
    assert got == want
    assert dict(back.dtypes)["total"] == "double"  # schema inference


def test_csv_null_handling(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", None), (None, 3.0)], "k string, v double"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/nulls_csv"
        df.write.option("header", True).mode("overwrite").csv(path)
        back = spark.read.option("header", True).option("inferSchema", True).csv(path)
        rows = {(r.k, r.v) for r in back.collect()}
    assert rows == {("a", 1.0), ("b", None), (None, 3.0)}
