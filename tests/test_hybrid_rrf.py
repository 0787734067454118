"""Hybrid retrieval with reciprocal-rank fusion (r11)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_rrf_formula_and_missing_arm(spark):
    """Constructed arms: fused score is exactly sum(1/(60+rank)) with
    0 for a missing arm; ties break on id ascending."""
    from var_elasticnet_bigdata_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], topk=10).collect()}
    assert rows[2]["rrf"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert rows[1]["rrf"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert rows[4]["rrf"] == pytest.approx(round(1 / 62, 6), abs=1e-9)
    assert rows[3]["rrf"] == pytest.approx(round(1 / 63, 6), abs=1e-9)
    # doc 2 hit both arms -> top fused rank
    assert rows[2]["rank"] == 1
    assert rows[2]["rank_0"] == 2 and rows[2]["rank_1"] == 1
    assert rows[1]["rank_1"] is None  # missing arm surfaces as null
    # tie: docs 1 (1/61) vs 4 (1/62) vs 3 (1/63) ordered by score
    assert rows[1]["rank"] == 2 and rows[4]["rank"] == 3
    assert rows[3]["rank"] == 4


def test_rrf_tie_breaks_on_id(spark):
    from var_elasticnet_bigdata_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(9, 1), (5, 2)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(5, 1), (9, 2)], "doc_id long, rank int"
    )
    rows = sorted(
        (r["rank"], r["doc_id"])
        for r in rrf_fuse([a, b], topk=10).collect()
    )
    # identical fused scores -> lower id first
    assert rows == [(1, 5), (2, 9)]


def test_hybrid_query_arms_consistent(spark):
    """On real data: every fused row's per-arm ranks agree with the
    standalone arms, and a doc present in both arms outranks the same
    docs seen by one arm at equal-or-worse ranks."""
    from var_elasticnet_bigdata_spark.queries import QUERIES

    rows = QUERIES["retrieval_hybrid_rrf"](spark, SF).collect()
    assert rows and len(rows) <= 10
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["rank_0"] is not None or r["rank_1"] is not None
        want = round(
            (1.0 / (60 + r["rank_0"]) if r["rank_0"] else 0.0)
            + (1.0 / (60 + r["rank_1"]) if r["rank_1"] else 0.0),
            6,
        )
        assert r["rrf"] == pytest.approx(want, abs=1e-9)
