"""Misra-Gries frequent-items sketch (r9): the n/(k+1) containment
and error guarantees vs exact counts, merge associativity, and the
bounded summary size."""
from __future__ import annotations

from collections import Counter

import numpy as np


def _zipf_tokens(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    return [f"tok{min(int(r), 500)}" for r in ranks]


def test_mg_guarantee_containment_and_error(spark):
    """Every item with true frequency > n/(k+1) appears in the merged
    sketch, and each reported count under-estimates its true count by
    at most n/(k+1) (never over-estimates)."""
    from var_elasticnet_bigdata_spark.operators.sketch import (
        heavy_hitters_mg,
    )

    toks = _zipf_tokens(20_000, seed=3)
    truth = Counter(toks)
    n, k = len(toks), 32
    df = spark.createDataFrame([(t,) for t in toks], "tok string").repartition(8)
    sk = heavy_hitters_mg(df, "tok", k=k)
    assert len(sk) <= k
    bound = n / (k + 1)
    for item, true_c in truth.items():
        if true_c > bound:
            assert item in sk, (item, true_c, bound)
    for item, est in sk.items():
        assert est <= truth[item]
        assert truth[item] - est <= bound, (item, truth[item], est)


def test_mg_merge_keeps_guarantee_across_splits(spark):
    """Merging per-split sketches preserves the combined-stream
    guarantee (the mergeability that lets the shuffle move sketches
    instead of tokens)."""
    from var_elasticnet_bigdata_spark.operators.sketch import (
        heavy_hitters_mg,
        mg_merge,
    )

    toks = _zipf_tokens(12_000, seed=9)
    truth = Counter(toks)
    n, k = len(toks), 24
    half = len(toks) // 2
    d1 = spark.createDataFrame([(t,) for t in toks[:half]], "tok string")
    d2 = spark.createDataFrame([(t,) for t in toks[half:]], "tok string")
    s1 = heavy_hitters_mg(d1, "tok", k=k)
    s2 = heavy_hitters_mg(d2, "tok", k=k)
    merged = mg_merge(list(s1.items()) + list(s2.items()), k=k)
    assert len(merged) <= k
    bound = n / (k + 1) * 2  # each half contributes its own n_i/(k+1)
    for item, true_c in truth.items():
        if true_c > bound:
            assert item in merged, (item, true_c, bound)


def test_mg_sketch_agrees_with_exact_head(spark):
    """The sketch's candidate set contains the exact top tokens of
    the gated `text_heavy_hitters` query's corpus whenever their
    frequency clears the guarantee bound."""
    import os

    from var_elasticnet_bigdata_spark.operators.dedup import norm_sql_spark
    from var_elasticnet_bigdata_spark.operators.sketch import (
        heavy_hitters_mg,
    )
    from var_elasticnet_bigdata_spark.queries import QUERIES
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = f"filter(split({norm_sql_spark('text')}, ' '), w -> w <> '')"
    toks = docs.select(F.explode(F.expr(words)).alias("tok"))
    n = toks.count()
    k = 64
    sk = heavy_hitters_mg(toks, "tok", k=k)
    exact = QUERIES["text_heavy_hitters"](spark, sf_dir).collect()
    bound = n / (k + 1)
    for r in exact:
        if r["cnt"] > bound:
            assert r["tok"] in sk, (r["tok"], r["cnt"], bound)
