"""Top-N selection with deterministic tie-breaks (T1).

The reference's ``order(score, decreasing=TRUE)[1:N]`` selections
(enetVAR.R:636-638, 653, 674-676, …) are tie-order-dependent (quirk
Q8). The engine always breaks ties on a deterministic key column.

Physical note: ``orderBy(...).limit(N)`` compiles to TakeOrderedAndProject
— a per-partition top-N + single-reduce merge, NOT a global sort. That
is the plan that survives 100 TB; verify with `.explain`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    score_col: str,
    n: int,
    tiebreak_col: str,
    descending: bool = True,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Global (or per-group) top-N by score with a deterministic
    tiebreak. Grouped variant uses row_number over a partitioned
    window (per-group heap, no global sort)."""
    score = F.col(score_col).desc() if descending else F.col(score_col).asc()
    order = [score, F.col(tiebreak_col).asc()]
    if not group_cols:
        return df.orderBy(*order).limit(n)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .drop("__rank")
    )
