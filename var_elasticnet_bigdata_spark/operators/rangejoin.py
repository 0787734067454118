"""Grid-bucketed range join (point-in-interval containment).

Spark plans a plain ``p.ts BETWEEN i.lo AND i.hi`` predicate with no
equi-key as a broadcast-nested-loop (fine when the interval side is
tiny — then just write the predicate and let Catalyst broadcast) or,
when both sides are big, a cartesian product: O(P·I) comparisons, the
classic 100 TB scale-killer.

This operator makes the join an EQUI-join on a time-grid cell:
intervals are exploded onto every grid cell they overlap
(``sequence(floor(lo/g), floor(hi/g))``), points map to their single
cell, and the shuffle carries cell keys. Each (interval, point)
candidate pair meets exactly once — in the point's unique cell — so
no post-join dedup is needed; a residual ``lo <= p <= hi`` filter
removes same-cell non-overlaps. Cost: O(P + I·w/g) shuffled rows and
only per-cell-local comparisons, with ``g`` (the grid width) chosen
near the typical interval width so the replication factor w/g stays
~1-2. Hot cells (many points in one grid bucket) are ordinary key
skew — AQE or `operators/skew.salted_join` applies unchanged.

Only inner semantics here: "points with no containing interval" is
the composition ``points.join(range_join(...), on=point-id,
how="left_anti")`` — an ordinary equi-anti-join that needs no range
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CELL = "__cell"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    grid: float,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start_col <= point_col <= end_col`` (inclusive both ends).
    Numeric or timestamp columns (timestamps compare as epoch
    seconds; ``grid`` is then in seconds). Column names must not
    collide across the two inputs — rename beforehand."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"column collision between points and intervals: {sorted(overlap)}"
        )
    g = float(grid)
    if g <= 0:
        raise ValueError(f"grid must be positive, got {grid!r}")

    def num(df: DataFrame, col: str):
        # TIMESTAMP_NTZ has no direct double cast; route through
        # TIMESTAMP (instant-preserving — session zone pinned UTC)
        if dict(df.dtypes)[col] == "timestamp_ntz":
            return F.col(col).cast("timestamp").cast("double")
        return F.col(col).cast("double")

    pts = points.withColumn(
        _CELL, F.floor(num(points, point_col) / g).cast("long")
    )
    ivs = intervals.withColumn(
        _CELL,
        F.explode(
            F.sequence(
                F.floor(num(intervals, start_col) / g).cast("long"),
                F.floor(num(intervals, end_col) / g).cast("long"),
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return pts.join(ivs, on=_CELL, how="inner").filter(contained).drop(_CELL)
