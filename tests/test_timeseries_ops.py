"""Unit + property tests for the time-series operator core
(SURVEY §5 test plan: diff∘cumsum identity, lag-embed shape/naming,
na.pad semantics, R-faithful ACF, Durbin–Levinson PACF)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.operators import acf as acf_ops
from var_elasticnet_bigdata_spark.operators import timeseries as ts
from var_elasticnet_bigdata_spark.operators.lag_embed import var_z


def _series_df(spark, values, series_id="s1", start=dt.date(2020, 1, 1)):
    rows = [
        Row(series_id=series_id, obs_date=start + dt.timedelta(days=30 * i), value=v)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows)


def test_diff_matches_numpy(spark):
    vals = [1.0, 4.0, 9.0, 16.0, 25.0]
    out = (
        ts.diff(_series_df(spark, vals), out_col="d")
        .orderBy("obs_date")
        .select("d")
        .collect()
    )
    got = [r.d for r in out]
    assert got[0] is None  # na.pad keeps the leading NULL
    assert got[1:] == list(np.diff(vals))


def test_second_diff_and_na_pad(spark):
    vals = [1.0, 4.0, 9.0, 16.0, 25.0]
    padded = ts.diff(_series_df(spark, vals), order=2, out_col="d")
    got = [r.d for r in padded.orderBy("obs_date").select("d").collect()]
    assert got[:2] == [None, None]
    assert got[2:] == list(np.diff(vals, n=2))
    dropped = ts.diff(_series_df(spark, vals), order=2, out_col="d", na_pad=False)
    assert dropped.count() == 3


def test_logdiff_reconstruct_roundtrip(spark):
    # W7 ∘ W2 identity: reconstruct_levels(log_diff(x), x0) == x
    vals = [100.0, 105.0, 103.0, 110.0, 120.0]
    ld = ts.log_diff(_series_df(spark, vals), out_col="value")
    rec = ts.reconstruct_levels(ld, init_level=vals[0])
    got = [r.level for r in rec.orderBy("obs_date").collect()]
    assert got == pytest.approx(vals, rel=1e-12)


def test_resample_quarterly_sum(spark):
    df = _series_df(spark, [1.0] * 6)  # 30-day spacing spans 2 quarters
    out = ts.resample(df, freq="quarter", how="sum").orderBy("obs_date").collect()
    assert sum(r.value for r in out) == 6.0
    assert all(r.obs_date.month in (1, 4, 7, 10) and r.obs_date.day == 1 for r in out)


def test_var_z_shape_names_dof(spark):
    # FIXTURES.md F3: K=3, T=10, values 10*row + series_index
    rows = [
        Row(
            obs_date=dt.date(2020, 1, 1) + dt.timedelta(days=i),
            a=10.0 * i + 1,
            b=10.0 * i + 2,
            c=10.0 * i + 3,
        )
        for i in range(10)
    ]
    wide = spark.createDataFrame(rows)
    for p in (1, 2, 3):
        vz = var_z(wide, series=["a", "b", "c"], p=p)
        assert vz.z_names == [
            f"{s}.l{i}" for i in range(1, p + 1) for s in ["a", "b", "c"]
        ]
        data = vz.df.orderBy("obs_date").collect()
        assert len(data) == 10 - p  # y[(1+p):T, ]
        first = data[0]
        # row p (0-indexed) of the original: lag i column = value at row p-i
        for i in range(1, p + 1):
            assert first[f"a.l{i}"] == 10.0 * (p - i) + 1
        assert vz.dof(10) == 10 - p - 3 * p
    vz_i = var_z(wide, series=["a", "b", "c"], p=2, intercept=True)
    assert vz_i.z_names[0] == "intercept"
    assert vz_i.k == 7
    assert {r["intercept"] for r in vz_i.df.select("intercept").collect()} == {1.0}


def test_acf_r_matches_reference_formula(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=60).cumsum()  # persistent series
    out = acf_ops.acf_table(
        _series_df(spark, [float(v) for v in x]), max_lag=3, method="r"
    ).collect()
    got = {r.lag: r.acf for r in out}
    # R acf(): r_k = sum((x_{t+k}-m)(x_t-m)) / sum((x_t-m)^2), m = full mean
    m = x.mean()
    denom = ((x - m) ** 2).sum()
    for k in (1, 2, 3):
        want = ((x[k:] - m) * (x[:-k] - m)).sum() / denom
        assert got[k] == pytest.approx(want, rel=1e-9)


def test_cross_acf_self_equals_acf(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=50).cumsum()
    df = _series_df(spark, [float(v) for v in x], series_id="t")
    a = {r.lag: r.acf for r in acf_ops.acf_table(df, 3, method="r").collect()}
    c = {
        r.lag: r.acf
        for r in acf_ops.cross_acf_table(df, "t", 3, method="r").collect()
    }
    for k in (1, 2, 3):
        assert c[k] == pytest.approx(a[k], rel=1e-9)


def test_pacf_durbin_levinson_ar1():
    # AR(1): acf_k = phi^k  → pacf_1 = phi, pacf_k≈0 for k>1
    phi = 0.6
    r = np.array([phi**k for k in range(1, 6)])
    pacf = acf_ops.pacf_from_acf(r)
    assert pacf[0] == pytest.approx(phi)
    assert np.allclose(pacf[1:], 0.0, atol=1e-12)


def test_naive_forecast_is_lag1(spark):
    vals = [1.0, 2.0, 3.0]
    out = (
        ts.naive_forecast(_series_df(spark, vals))
        .orderBy("obs_date")
        .select("rw_forecast")
        .collect()
    )
    assert [r.rw_forecast for r in out] == [None, 1.0, 2.0]


def test_wide_long_roundtrip(spark):
    rows = [
        Row(obs_date=dt.date(2020, 1, 1) + dt.timedelta(days=i), a=float(i), b=float(-i))
        for i in range(5)
    ]
    wide = spark.createDataFrame(rows)
    long = ts.wide_to_long(wide, ["a", "b"])
    assert long.count() == 10
    back = ts.long_to_wide(long, series_ids=["a", "b"])
    assert sorted(back.columns) == ["a", "b", "obs_date"]
    assert back.count() == 5
    orig = {(r.obs_date, r.a, r.b) for r in rows}
    got = {(r.obs_date, r.a, r.b) for r in back.collect()}
    assert got == orig


def test_reconstruct_levels_mid_series_gap_propagates(spark):
    """The leading na.pad NULL means zero growth; a NULL later in the
    series is a missing observation — levels from the gap onward are
    NULL, not silently imputed as 0% growth."""
    import math

    from var_elasticnet_bigdata_spark.operators.timeseries import (
        reconstruct_levels,
    )

    rows = [
        ("s", "2020-01-01", None),   # leading na.pad NULL → growth 0
        ("s", "2020-04-01", 0.1),
        ("s", "2020-07-01", None),   # GAP
        ("s", "2020-10-01", 0.2),
    ]
    df = spark.createDataFrame(
        rows, "series_id string, obs_date string, value double"
    ).withColumn("obs_date", F.col("obs_date").cast("date"))
    out = {
        str(r.obs_date): r.level
        for r in reconstruct_levels(df, 100.0).collect()
    }
    assert out["2020-01-01"] == pytest.approx(100.0)
    assert out["2020-04-01"] == pytest.approx(100.0 * math.exp(0.1))
    assert out["2020-07-01"] is None
    assert out["2020-10-01"] is None


def test_resample_first_last_are_chronological(spark):
    """first/last pick the chronologically first/last observation
    regardless of partition layout (min_by/max_by on the date)."""
    from var_elasticnet_bigdata_spark.operators.timeseries import resample

    rows = [
        ("s", "2020-03-28", 328.0),
        ("s", "2020-01-15", 115.0),
        ("s", "2020-02-02", 202.0),
    ]
    df = (
        spark.createDataFrame(
            rows, "series_id string, obs_date string, value double"
        )
        .withColumn("obs_date", F.col("obs_date").cast("date"))
        .repartition(4)
    )
    first = resample(df, "quarter", how="first").collect()[0].value
    last = resample(df, "quarter", how="last").collect()[0].value
    assert first == 115.0
    assert last == 328.0
