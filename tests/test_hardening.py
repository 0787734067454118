"""Edge-case hardening for the round-3 additions: empty frontiers,
degenerate series, singular covariances — the paths a 100 TB run hits
in its long tail (a partition of empty docs, a constant series, a
collinear residual pair) must degrade cleanly, not throw."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.functions.stats import adf_test, hosking_test
from var_elasticnet_bigdata_spark.operators.curation import (
    corpus_stats,
    curate_corpus,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_curation_empty_after_filter(spark):
    docs = _docs(spark, ["x", "yy", "z z"])  # all fail min_tokens=20
    kept = curate_corpus(docs)
    assert kept.count() == 0
    assert corpus_stats(kept).count() == 0


def test_curation_drops_exact_and_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "sleepy")
    other = "entirely different content about spark catalyst planning " * 6
    docs = _docs(spark, [base, base.upper(), near, other])
    kept = curate_corpus(docs, min_quality=0.0, min_tokens=5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # doc1 is an exact dup of doc0 (case-normalized); doc2 a near-dup
    # (one word changed) dropped as the higher id of the pair;
    # doc3 survives
    assert ids == [0, 3]


def test_adf_constant_series_is_nan_not_crash():
    r = adf_test(np.full(40, 3.14), k=0)
    assert np.isnan(r["statistic"]) or np.isfinite(r["statistic"])


def test_adf_table_degenerate_series(spark):
    from var_elasticnet_bigdata_spark.functions.stats import adf_table

    pdf = pd.DataFrame(
        {
            "series_id": ["const"] * 30,
            "obs_date": pd.date_range("2020-01-01", periods=30).date,
            "value": [1.0] * 30,
        }
    )
    out = adf_table(spark.createDataFrame(pdf), k=0).collect()
    assert len(out) == 1  # one row, NaN stat — no exception


def test_hosking_singular_c0_uses_pinv():
    rng = np.random.default_rng(0)
    x = rng.normal(size=60)
    U = np.column_stack([x, 2.0 * x])  # rank-1 covariance
    rows = hosking_test(U, lags=(3,), order=0)
    assert np.isfinite(rows[0]["statistic"])


def test_ar1_relational_zero_prefix_guard(spark):
    import datetime as dt

    from var_elasticnet_bigdata_spark.harness.modeltrain import (
        ar1_rolling_relational,
    )

    n = 30
    vals = [0.0] * 12 + list(np.arange(1.0, n - 11))
    pdf = pd.DataFrame(
        {
            "obs_date": [
                dt.date(2000, 1, 1) + dt.timedelta(days=7 * i) for i in range(n)
            ],
            "a": vals,
        }
    )
    wide = spark.createDataFrame(pdf)
    out = ar1_rolling_relational(
        spark, wide, "a", start_pred=pdf["obs_date"][20], h=4
    ).collect()
    assert len(out) == 3  # horizons 1,2,4 — zero-denominator phi guarded
