"""Unit tests for operators/shard.py (distributed global rank +
serpentine shard balance) and operators/text.vocab_coverage.

Reference parity: the reference (Gotcha17/VAR_ElasticNet_BigData) has
no shard/vocab analogue — these are the training-data-pipeline
extensions; correctness is pinned against hand-computed and
single-window oracles instead.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.operators.shard import (
    global_rank,
    shard_balance,
)
from var_elasticnet_bigdata_spark.operators.text import vocab_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# ---------------------------------------------------------------------------
# global_rank
# ---------------------------------------------------------------------------


def test_global_rank_matches_single_window(spark):
    rows = [(f"d{i:03d}", (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "id string, v int").repartition(7)
    got = global_rank(
        df, [F.col("v").desc(), F.col("id").asc()], num_ranges=5
    )
    out = {r["id"]: r["rank"] for r in got.collect()}
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))
    for pos, (rid, _) in enumerate(expect, start=1):
        assert out[rid] == pos


def test_global_rank_invariant_to_num_ranges(spark):
    rows = [(f"d{i}", i % 13) for i in range(80)]
    df = spark.createDataFrame(rows, "id string, v int")
    order = [F.col("v").asc(), F.col("id").asc()]
    a = {r["id"]: r["rank"] for r in global_rank(df, order, num_ranges=1).collect()}
    b = {r["id"]: r["rank"] for r in global_rank(df, order, num_ranges=9).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# shard_balance
# ---------------------------------------------------------------------------


def test_shard_serpentine_rule_hand_computed(spark):
    # 6 docs, sizes 6..1 under k=2: ranks 1..6 -> z=0..5
    # blocks: (z0,z1)=fwd -> shards 0,1 ; (z2,z3)=rev -> 1,0 ; (z4,z5)=fwd -> 0,1
    rows = [(f"d{i}", " ".join(["w"] * (6 - i))) for i in range(6)]
    out = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in shard_balance(_docs(spark, rows), k=2).collect()
    }
    assert out == {
        "d0": (6, 0),
        "d1": (5, 1),
        "d2": (4, 1),
        "d3": (3, 0),
        "d4": (2, 0),
        "d5": (1, 1),
    }


def test_shard_balance_token_totals_even(spark):
    # Skewed sizes: serpentine keeps per-shard totals within the
    # largest single document of each other.
    rows = [(f"d{i:03d}", " ".join(["tok"] * ((i * 17) % 97 + 1))) for i in range(120)]
    got = shard_balance(_docs(spark, rows), k=8)
    totals = {
        r["shard"]: r["t"]
        for r in got.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert sorted(totals) == list(range(8))
    biggest_doc = 97
    assert max(totals.values()) - min(totals.values()) <= biggest_doc


def test_shard_null_and_empty_docs_pinned_to_zero(spark):
    rows = [("a", None), ("b", ""), ("c", "one two")]
    out = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in shard_balance(_docs(spark, rows), k=2).collect()
    }
    # ranks (size desc, id asc): c(2)->z=0 shard0, a(0)->z=1 shard1,
    # b(0)->z=2 (block 1, reversed) shard1
    assert out["c"] == (2, 0)
    assert out["a"] == (0, 1)
    assert out["b"] == (0, 1)


def test_shard_rejects_bad_k(spark):
    import pytest

    with pytest.raises(ValueError):
        shard_balance(_docs(spark, [("a", "x")]), k=0)


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_hand_computed(spark):
    # corpus counts: the=3, cat=2, dog=1, sat=1 ; vocab_size=2 ->
    # {the, cat} (freq desc, token asc tiebreak for dog/sat unused)
    rows = [
        ("a", "the cat sat"),
        ("b", "the cat"),
        ("c", "the dog"),
    ]
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ratio"])
        for r in vocab_coverage(_docs(spark, rows), vocab_size=2).collect()
    }
    assert out["a"] == (3, 1, round(1 / 3, 6))
    assert out["b"] == (2, 0, 0.0)
    assert out["c"] == (2, 1, 0.5)


def test_vocab_coverage_tiebreak_token_asc(spark):
    # all tokens freq=1; vocab_size=2 keeps the 2 lexicographically
    # smallest ("alpha", "beta") per the token-asc tiebreak
    rows = [("a", "alpha beta gamma delta")]
    out = vocab_coverage(_docs(spark, rows), vocab_size=2).collect()[0]
    assert (out["n_tokens"], out["n_oov"]) == (4, 2)


def test_vocab_coverage_skips_empty_docs(spark):
    rows = [("a", "x y"), ("b", ""), ("c", None)]
    got = vocab_coverage(_docs(spark, rows), vocab_size=10)
    assert [r["doc_id"] for r in got.collect()] == ["a"]


def test_vocab_coverage_rejects_bad_size(spark):
    import pytest

    with pytest.raises(ValueError):
        vocab_coverage(_docs(spark, [("a", "x")]), vocab_size=0)
