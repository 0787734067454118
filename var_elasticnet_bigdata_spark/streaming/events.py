"""Structured Streaming ingestion of the events table.

The reference is pure batch (SURVEY §2.10 — no streaming operators),
but the engine's north star includes streaming ingest of new
observations: late-arriving monthly data points are exactly the
watermark use case. The same windowed aggregations the batch path
uses (A1 roll-ups) are declared here over ``readStream``, so batch
and streaming share semantics (and the tests assert stream results ==
batch results under availableNow).

Scale notes: file-source streaming with ``maxFilesPerTrigger``
backpressure; watermark bounds state; the stateful per-user totals
use ``applyInPandasWithState`` with explicit GroupStateTimeout — the
state store holds one row per user, partitioned by the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# schema-per-source cache: stream_events may be called repeatedly
# (tests, bench); the batch footer read only needs to happen once
_SCHEMA_CACHE: dict[str, object] = {}


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of the events table with the same ``ts``
    normalization as sources.tables.load_table. The stream schema is
    taken from a batch footer read, so TIMESTAMP(NANOS) (scans as long
    under nanosAsLong, converted ns→µs here) and native
    TIMESTAMP(MICROS) testdata both work.

    The file source needs a DIRECTORY (new files appear → new
    micro-batches); the shared testdata dir mixes table schemas, so a
    per-table staging dir of symlinks is built under /tmp. In
    production the ingest directory IS the source — this staging is
    test-fixture plumbing only."""
    import hashlib
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the window-bucket equivalence with the batch path (TIMESTAMP_NTZ)
    # relies on the session zone being UTC (session.py pins it); fail
    # loudly instead of silently diverging under a caller's local zone
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"stream_events requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): the cast to zoned TIMESTAMP would shift "
            "window buckets relative to the batch TIMESTAMP_NTZ path"
        )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = f"/tmp/spark_graft_stream_{tag}/events"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    raw_schema = _SCHEMA_CACHE.get(src)
    if raw_schema is None:
        raw_schema = spark.read.parquet(src).schema
        _SCHEMA_CACHE[src] = raw_schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    # TIMESTAMP (not NTZ): watermarks require event time with a zone;
    # the session zone is pinned UTC so wall-clock matches the batch path.
    ts_type = dict((f.name, f.dataType.simpleString()) for f in raw_schema)
    if ts_type.get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) window roll-up per event type with a
    watermark for late data — the streaming twin of the A1 quarterly
    roll-up. State is bounded by the watermark horizon."""
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming sessionization: ``F.session_window`` merges
    events within ``gap`` of each other per user — the streaming twin
    of the batch gaps-and-islands query (``g7_session_window``).
    Watermark closes sessions once event time passes session end +
    gap, bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            "total_value",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    running per-user event count + value total, emitted on every
    update. One state row per user key."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
):
    """Drive a streaming frame to a memory sink with availableNow
    (process-everything-then-stop) — the test/verification harness."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
