"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document source, a default
user id, one dominant event type) concentrate an entire shuffle
partition on one reducer. AQE's skew-join split
(``spark.sql.adaptive.skewJoin``) handles sort-merge joins whose
*partitions* are detectably oversized; these operators cover the two
cases AQE does not re-plan:

- **hot-key aggregation** (`salted_agg`): Spark's hash aggregate
  already map-side-combines, but the FINAL reduce of one hot key
  still lands on a single task. Salting splits that key across
  ``salts`` reducers and recombines in a second (tiny) aggregation
  whose input is at most ``|keys| x salts`` rows.
- **replicated-salt join** (`salted_join`): an equi-join where the
  big side's key histogram is skewed. The big side gets a uniform
  random salt, the small side is replicated once per salt value, and
  the join key becomes ``(key, salt)`` — each formerly-hot partition
  is now ``salts`` partitions. Row-level results are identical to
  the plain join for inner/left joins (every big row still meets
  every matching small row exactly once, because the small side
  carries ALL salt values).

Both are semantics-preserving rewrites, so the driver-gate queries
hash-check them against the PLAIN SQL form in DuckDB — the oracle is
the un-salted query itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# recombination rules: stage-1 partial per (keys, salt) → stage-2 merge
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Two-stage grouped aggregation with a salted first stage.

    ``aggs`` maps output column name → ``(fn, input_col)`` with fn in
    {sum, count, min, max, avg}. ``avg`` is decomposed into sum+count
    partials so the recombination stays exact. Stage 1 groups by
    ``keys + [salt]`` (the hot key now spreads over ``salts``
    reducers); stage 2 groups by ``keys`` over at most
    ``distinct(keys) x salts`` rows — negligible at any scale.
    """
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    partials: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__s_{out}"))
            partials.append(F.count(col).alias(f"__c_{out}"))
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn in _MERGEABLE:
            part, merge = _MERGEABLE[fn]
            partials.append(part(col).alias(f"__p_{out}"))
            finals.append(merge(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg fn {fn!r} for {out!r}")
    salted = df.withColumn(
        _SALT, F.floor(F.rand(seed) * F.lit(salts)).cast("int")
    )
    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salts: int = 8,
    how: str = "inner",
    seed: int = 7,
    force_shuffle: bool = True,
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``salts``× so every (key, salt) pair exists. The join
    key becomes ``(on..., salt)``; a hot key's rows now spread over
    ``salts`` shuffle partitions instead of one.

    ``how`` is restricted to inner/left (outer-right semantics would
    need per-salt dedup of unmatched small rows). ``force_shuffle``
    adds a merge-join hint so the demonstration actually exercises
    the salted shuffle path even when the small side would broadcast
    (a broadcast join never skews — if it fits, prefer it and skip
    salting entirely).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    if salts < 1:
        # salts=0 would explode an empty array: every small-side row
        # dropped, silently empty/all-NULL join output
        raise ValueError(f"salts must be >= 1, got {salts}")
    keys = [on] if isinstance(on, str) else list(on)
    clash = {_SALT} & (set(big.columns) | set(small.columns))
    if clash:
        raise ValueError(f"inputs may not contain reserved column {_SALT!r}")
    bigs = big.withColumn(
        _SALT, F.floor(F.rand(seed) * F.lit(salts)).cast("int")
    )
    smalls = small.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(salts)])),
    )
    if force_shuffle:
        smalls = smalls.hint("merge")
    joined = bigs.join(smalls, on=keys + [_SALT], how=how)
    return joined.drop(_SALT)
