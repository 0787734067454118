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


def mg_partition_summaries(
    df: DataFrame, col: str, k: int = 64
) -> DataFrame:
    """Per-partition MISRA-GRIES frequent-items summaries — the
    missing member of the mergeable-sketch family (quantiles =
    percentile_approx, cardinality = HLL++, frequent items = THIS):
    each task streams its rows through a ≤``k``-counter MG summary
    (constant memory, one pass), emitting ≤ k ``(item, c)`` rows.
    The shuffle/collect moves k·partitions rows instead of the corpus
    — at 100 TB that is the difference between a top-N over billions
    of distinct tokens and a few KB per task.

    Guarantee (per summary, preserved by `mg_merge`): every item with
    true frequency > n/(k+1) is present, and each reported count
    under-estimates the true count by at most n/(k+1).

    Items of ANY input type are accepted: the column is cast to
    string Spark-side before the Arrow boundary (ADVICE r9 — the
    output schema is ``item string``, and a silent Arrow coercion of
    e.g. int64 ids would otherwise be engine-dependent). Distinctness
    is therefore string-distinctness, the same rule a SQL twin's
    ``CAST(col AS VARCHAR)`` applies."""
    def run(it):
        import pandas as pd

        counts: dict = {}
        for pdf in it:
            for v in pdf["item"]:
                if v is None:
                    continue
                if v in counts:
                    counts[v] += 1
                elif len(counts) < k:
                    counts[v] = 1
                else:
                    dead = [key for key in counts if counts[key] == 1]
                    for key in counts:
                        counts[key] -= 1
                    for key in dead:
                        del counts[key]
        if counts:
            yield pd.DataFrame(
                {"item": list(counts), "c": list(counts.values())}
            )

    return df.select(F.col(col).cast("string").alias("item")).mapInPandas(
        run, schema="item string, c long"
    )


def mg_merge(summaries: list[tuple], k: int = 64) -> dict:
    """Merge MG summaries (lists of ``(item, c)``): sum counts per
    item, then decrement everything by the (k+1)-th largest combined
    count and drop non-positives — the standard mergeable-MG rule
    (Agarwal et al.): the merged summary keeps the same
    n/(k+1)-error guarantee over the combined stream."""
    combined: dict = {}
    for item, c in summaries:
        combined[item] = combined.get(item, 0) + int(c)
    if len(combined) > k:
        kth = sorted(combined.values(), reverse=True)[k]
        combined = {
            i: c - kth for i, c in combined.items() if c - kth > 0
        }
    return combined


def heavy_hitters_mg(
    df: DataFrame, col: str, k: int = 64
) -> dict:
    """Distributed frequent-items: per-partition MG summaries
    (`mg_partition_summaries`) collected (≤ k rows per partition —
    bounded, never the corpus) and merged driver-side (`mg_merge`).
    Returns ``{item: lower_count}`` with the n/(k+1) guarantee. The
    EXACT twin (`text_heavy_hitters`'s groupBy top-N) is the oracle
    the tests measure this against."""
    rows = mg_partition_summaries(df, col, k=k).collect()
    return mg_merge([(r["item"], r["c"]) for r in rows], k=k)
