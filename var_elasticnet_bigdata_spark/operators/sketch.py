"""Order statistics and cardinality: exact forms + sketch scale path.

At 100 TB an exact grouped quantile is a per-group sort and an exact
distinct count is a full shuffle of the distinct pairs — both fine
when needed, but most pipeline gates (p99 latency, corpus-cardinality
tripwires) tolerate bounded error, and Spark's sketches
(``percentile_approx`` = KLL-style rank sketch, ``approx_count_distinct``
= HyperLogLog++) are MERGEABLE: each partition builds a constant-size
sketch, the shuffle moves sketches instead of data, and accuracy is a
knob, not a fallout. The exact forms below are the driver-gate twins
(`g9_percentile`) and the recall oracles the tests measure the
sketches against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: list[float],
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of ``col`` at probabilities ``qs``,
    returned long: ``keys..., q, value``.

    ``exact=True``: ``percentile`` — linear interpolation on the
    sorted group (matches DuckDB's ``quantile_cont``; per-group sort
    cost). ``exact=False``: ``percentile_approx`` — rank error ≤
    1/accuracy with a constant-memory mergeable sketch; the scale
    default."""
    fn: Column = (
        F.percentile(col, F.lit(qs))
        if exact
        else F.percentile_approx(col, F.lit(qs), F.lit(accuracy))
    )
    agg = df.groupBy(*keys).agg(fn.alias("__qv"))
    # an all-NULL group makes percentile return a NULL array;
    # arrays_zip(_, NULL) is NULL and a plain explode would DROP the
    # group's keys from the output — emit one NULL-quantile row per
    # requested q instead (matching SQL quantile semantics)
    pairs = F.arrays_zip(
        F.lit(qs).cast("array<double>").alias("q"),
        F.coalesce(
            F.col("__qv"),
            F.array(*[F.lit(None).cast("double") for _ in qs]),
        ).alias("value"),
    )
    return agg.select(
        *keys, F.explode(pairs).alias("__p")
    ).select(*keys, F.col("__p.q").alias("q"), F.col("__p.value").alias("value"))


def distinct_count(
    df: DataFrame,
    keys: list[str],
    col: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct count of ``col``: exact (full distinct
    shuffle) or HyperLogLog++ (``approx_count_distinct``, relative
    standard deviation ``rsd``, constant memory per group)."""
    fn = (
        F.count_distinct(F.col(col))
        if exact
        else F.approx_count_distinct(col, rsd)
    )
    return df.groupBy(*keys).agg(fn.alias("n_distinct"))
