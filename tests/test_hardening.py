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


def test_asof_join_empty_right_keeps_left(spark):
    import pandas as pd

    from var_elasticnet_bigdata_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "t": [10, 20], "v": [1.0, 2.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [5], "w": [9.0]})
    ).filter("k > 99")
    out = asof_join(left, right, "k", "t").toPandas()
    assert len(out) == 2 and out["w"].isna().all()
    inner = asof_join(left, right, "k", "t", how="inner").toPandas()
    assert len(inner) == 0


def test_range_join_empty_and_degenerate_interval(spark):
    import pandas as pd

    from var_elasticnet_bigdata_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(pd.DataFrame({"p": [5.0, 6.0]}))
    iv = spark.createDataFrame(pd.DataFrame({"lo": [5.0], "hi": [5.0]}))
    out = range_join(pts, iv, "p", "lo", "hi", grid=10.0).toPandas()
    assert out["p"].tolist() == [5.0]  # zero-width interval still matches
    empty = range_join(
        pts.filter("p > 99"), iv, "p", "lo", "hi", grid=10.0
    ).toPandas()
    assert len(empty) == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        range_join(pts, iv, "p", "lo", "hi", grid=0.0)


def test_salted_agg_empty_and_single_row(spark):
    import pandas as pd

    from var_elasticnet_bigdata_spark.operators.skew import salted_agg

    df = spark.createDataFrame(pd.DataFrame({"k": [7], "v": [3.5]}))
    out = salted_agg(
        df, ["k"], {"n": ("count", "v"), "a": ("avg", "v")}, salts=8
    ).toPandas()
    assert out.loc[0, "n"] == 1 and out.loc[0, "a"] == 3.5
    none = salted_agg(
        df.filter("k > 99"), ["k"], {"n": ("count", "v")}, salts=8
    ).toPandas()
    assert len(none) == 0


def test_grouped_quantiles_single_value_group(spark):
    import pandas as pd

    from var_elasticnet_bigdata_spark.operators.sketch import grouped_quantiles

    df = spark.createDataFrame(pd.DataFrame({"g": [1], "v": [2.0]}))
    out = grouped_quantiles(df, ["g"], "v", [0.0, 0.5, 1.0]).toPandas()
    assert out["value"].tolist() == [2.0, 2.0, 2.0]
