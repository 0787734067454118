"""Watermark semantics under real late data: a row arriving after its
window is finalized must be DROPPED, and unfinalized windows must not
emit — the property the stream≡batch tests cannot see (availableNow
over one file never produces lateness)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _write(path: str, rows: list[tuple[str, int, float]], mtime: float) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
    # MICROsecond timestamps: the session reads TIMESTAMP(NANOS) as
    # long (nanosAsLong), which would break the declared schema
    tbl = pa.table(
        {
            "ts": pa.array(pd.to_datetime(pdf["ts"]), type=pa.timestamp("us")),
            "user_id": pa.array(pdf["user_id"], type=pa.int64()),
            "value": pa.array(pdf["value"], type=pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_late_row_cannot_change_finalized_window(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    # batch 0: one 08:05 row populates the 08:00 window; 11:30 drives
    # the watermark to 10:30, finalizing (and evicting) that window
    _write(
        str(src / "f1.parquet"),
        [
            ("2024-01-01 08:05:00", 0, 1.0),
            ("2024-01-01 10:05:00", 1, 1.0),
            ("2024-01-01 10:20:00", 2, 1.0),
            ("2024-01-01 11:30:00", 3, 1.0),
        ],
        1_000_000.0,
    )
    # batch 1: an on-time row — its batch runs with watermark 10:30,
    # so the 08:00 window finalizes, emits, and evicts here; it also
    # pushes the watermark to 11:30, finalizing 10:00 next batch
    _write(
        str(src / "f2.parquet"),
        [("2024-01-01 12:30:00", 4, 1.0)],
        1_000_100.0,
    )
    # batch 2: a row 2.5 h late for the ALREADY-EMITTED 08:00 window
    _write(
        str(src / "f3.parquet"),
        [("2024-01-01 08:10:00", 5, 1.0)],
        1_000_200.0,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_demo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (str(r.start), r.n)
        for r in spark.sql("SELECT * FROM late_demo").collect()
    ]
    eight = [n for s, n in rows if s.startswith("2024-01-01 08:")]
    # the 08:00 window was emitted ONCE, with only its on-time row —
    # the row arriving after eviction could not update or re-emit it
    assert eight == [1]
    assert ("2024-01-01 10:00:00", 2) in rows
    # windows not yet passed by the final 11:30 watermark stay open
    assert not any(
        s.startswith(("2024-01-01 11:", "2024-01-01 12:")) for s, _ in rows
    )
