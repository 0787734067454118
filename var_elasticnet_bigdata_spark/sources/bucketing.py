"""Bucketed parquet tables: pay the shuffle once at write time.

At 100 TB the dominant cost of a repeated equi-join or keyed
aggregation is the shuffle of the big side. Spark's storage-level
answer is bucketing (`DataFrameWriter.bucketBy`): rows are
hash-partitioned into a fixed bucket count AT WRITE TIME and the
catalog records the layout, so every later join or group-by on the
bucket key reads the data already co-partitioned — the exchange
disappears from the plan entirely (`tests/test_bucketing.py` asserts
it). Two fact tables bucketed on the same key with the same bucket
count sort-merge-join with ZERO shuffle on either side.

Sizing rule: buckets ≈ table_size / target_partition_size (128-512 MB
compressed per bucket), and the bucket count is a lasting contract —
every producer of the table must write the same count. ``sortBy``
within buckets additionally removes the per-task sort of a
sort-merge join and keeps min/max row-group pruning sharp.

This needs `saveAsTable` (the bucket layout lives in the catalog, not
the files); plain `.parquet(path)` writes cannot carry it. The
default in-memory catalog works — no Hive metastore required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet
    table registered in the session catalog. ``path`` makes it an
    external table at that location; otherwise it lands under
    ``spark.sql.warehouse.dir``.

    On ``mode='append'`` to an EXISTING table the catalog's location
    wins and ``path`` is ignored: compaction
    (`sources/compaction.compact_bucketed`) legitimately moves an
    external store to a sibling location (alternating ``__c``
    suffix), and pinning the caller's original path would fail every
    post-compaction append with a location-mismatch AnalysisException
    (latent until the r7 crash-recovery test exercised an
    append-after-move)."""
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    # Pre-partition on the bucket columns into exactly `buckets`
    # tasks: bucketBy assigns files per (task, bucket), so an
    # unpartitioned write emits up to tasks x buckets files PER
    # APPEND — the file-count growth that forces compaction. With the
    # repartition (same HashPartitioning the bucket spec uses) every
    # task holds exactly one bucket's rows and each append adds at
    # most `buckets` files. The shuffle is batch-sized by the
    # incremental-store contract (the store never rewrites; only the
    # batch moves), so this trades a small exchange for a bounded
    # file count at 100 TB append cadence.
    df = df.repartition(buckets, *[F.col(c) for c in bcols])
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bcols)
    if sort_cols is not None:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    if path is not None and not (
        mode == "append" and df.sparkSession.catalog.tableExists(table)
    ):
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its layout. ``spark.table`` is
    mandatory here: ``spark.read.parquet(path)`` on the same files
    loses the bucket metadata and the exchange comes back."""
    return spark.table(table)
