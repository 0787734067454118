"""Unit tests for the incremental (mergeable-partials) rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _full(spark, rows):
    from var_elasticnet_bigdata_spark.operators.incremental import (
        partial_rollup,
    )

    return {
        r.k: (r.cnt, r.total, r.vmin, r.vmax)
        for r in partial_rollup(_rows(spark, rows), ["k"], "v").collect()
    }


def _merged(spark, a, b):
    from var_elasticnet_bigdata_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    m = merge_rollup(
        partial_rollup(_rows(spark, a), ["k"], "v"),
        partial_rollup(_rows(spark, b), ["k"], "v"),
    )
    return {r.k: (r.cnt, r.total, r.vmin, r.vmax) for r in m.collect()}


DATA = [
    ("a", 1.0),
    ("a", 2.5),
    ("a", -3.0),
    ("b", 10.0),
    ("b", 0.5),
    ("c", 7.0),
]


@pytest.mark.parametrize("split", [0, 1, 3, 5, 6])
def test_merge_equals_full_any_split(spark, split):
    """merge(partial(A), partial(B)) == partial(A ∪ B) for every
    split point, including empty sides."""
    got = _merged(spark, DATA[:split], DATA[split:])
    want = _full(spark, DATA)
    assert got == want


def test_sequential_deltas(spark):
    """Folding three deltas one at a time equals the full rollup."""
    from var_elasticnet_bigdata_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    state = partial_rollup(_rows(spark, DATA[:2]), ["k"], "v")
    for chunk in (DATA[2:4], DATA[4:5], DATA[5:]):
        state = merge_rollup(state, partial_rollup(_rows(spark, chunk), ["k"], "v"))
    got = {r.k: (r.cnt, r.total, r.vmin, r.vmax) for r in state.collect()}
    assert got == _full(spark, DATA)


def test_nulls_excluded(spark):
    from var_elasticnet_bigdata_spark.operators.incremental import (
        finalize_rollup,
        partial_rollup,
    )

    df = _rows(spark, [("a", 1.0), ("a", None), ("n", None)])
    out = {
        r.k: r for r in finalize_rollup(partial_rollup(df, ["k"], "v")).collect()
    }
    assert out["a"].cnt == 1 and out["a"].avg == pytest.approx(1.0)
    # all-null key: cnt 0, avg null (not a division error)
    assert out["n"].cnt == 0 and out["n"].avg is None


def test_merge_rejects_mismatched_keys(spark):
    from var_elasticnet_bigdata_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    a = partial_rollup(_rows(spark, DATA), ["k"], "v")
    b = partial_rollup(
        spark.createDataFrame([("a", "x", 1.0)], "k string, k2 string, v double"),
        ["k", "k2"],
        "v",
    )
    with pytest.raises(ValueError):
        merge_rollup(a, b)


def test_delta_only_touches_its_keys(spark):
    """A delta with one key leaves every other key's partials
    byte-identical — the backfill-locality contract."""
    from var_elasticnet_bigdata_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    state = partial_rollup(_rows(spark, DATA), ["k"], "v")
    delta = partial_rollup(_rows(spark, [("b", 99.0)]), ["k"], "v")
    after = {
        r.k: (r.cnt, r.total, r.vmin, r.vmax)
        for r in merge_rollup(state, delta).collect()
    }
    before = {r.k: (r.cnt, r.total, r.vmin, r.vmax) for r in state.collect()}
    assert after["a"] == before["a"]
    assert after["c"] == before["c"]
    assert after["b"] == (3, 109.5, 0.5, 99.0)


def test_merge_rollup_accepts_reordered_key_columns(spark):
    """A delta with the same key SET in a different column order
    merges fine (unionByName is order-insensitive) — ADVICE r2."""
    from var_elasticnet_bigdata_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0)], "k1 string, k2 int, value double"
    )
    state = partial_rollup(df, ["k1", "k2"], "value")
    delta = partial_rollup(
        df.select("k2", "k1", "value"), ["k2", "k1"], "value"
    )
    merged = merge_rollup(state, delta)
    row = merged.filter("k1 = 'a'").collect()[0]
    assert row.cnt == 2 and row.total == 2.0
