"""Incremental aggregation: maintain a grouped rollup as new /
late-arriving data lands WITHOUT rescanning history.

The 100 TB pattern: a full ``groupBy`` over an append-only fact table
re-reads everything on every refresh. Instead the rollup is kept as
DECOMPOSABLE partial aggregates (count / sum / min / max — mergeable
monoids; avg and friends derive at read time). A refresh aggregates
only the delta partition(s) and merges by key: cost is O(delta +
touched keys), independent of history size, and a backfilled row
lands in its key's partials the same way a fresh one does.

Algebra contract (tested): ``merge(partial(A), partial(B)) ==
partial(A ∪ B)`` for any split, so the incremental path is
bit-equivalent to a full recompute — the declared query's DuckDB
oracle IS the full recompute, making that equivalence part of the
driver hash gate.

Scale notes: both ``partial_rollup`` and ``merge_rollup`` are one
combinable (map-side partial) key shuffle; the union before the merge
group-by is free (no shuffle of its own). State stays (keys ×
partials) — the same width whether it absorbed one delta or a
thousand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTIAL_COLS = ("cnt", "total", "vmin", "vmax")


def partial_rollup(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key mergeable partials of ``value_col``:
    ``(keys..., cnt, total, vmin, vmax)``. Null measures are excluded
    everywhere (SQL ``COUNT(col)`` semantics), matching the
    full-recompute oracle."""
    c = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(c).alias("cnt"),
        F.sum(c).alias("total"),
        F.min(c).alias("vmin"),
        F.max(c).alias("vmax"),
    )


def merge_rollup(state: DataFrame, delta_partial: DataFrame) -> DataFrame:
    """Merge two partial-rollup frames by key (monoid fold):
    counts/sums add, min/max reduce. Columns must be
    ``keys... + PARTIAL_COLS`` on both sides."""
    keys = [c for c in state.columns if c not in PARTIAL_COLS]
    delta_keys = [c for c in delta_partial.columns if c not in PARTIAL_COLS]
    # compare as SETS: unionByName/groupBy below are column-order
    # insensitive, so a delta with the same keys in a different order
    # is valid (ADVICE r2)
    if sorted(delta_keys) != sorted(keys):
        raise ValueError(f"state keys {keys} != delta keys {delta_keys}")
    return (
        state.select(state.columns)
        .unionByName(delta_partial.select(state.columns))
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Read-time derivation: adds ``avg`` (null for all-null keys)."""
    return state.withColumn(
        "avg",
        F.when(F.col("cnt") > 0, F.col("total") / F.col("cnt")),
    )
