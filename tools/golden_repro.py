"""Golden-number reproduction: run the reference's pinned
out-of-sample experiments (Testing.R:227-243) end to end on the
actual SW dataset through the engine, and compare "mse sum"
(Σ of the four horizon MSFEs) against the recorded values:

    result2: modeltrain(y, lag=5, const=TRUE)        → 0.00907175092168175
    result3: modeltrain(y, lag=1, const=TRUE)        → 0.0107635485836803
    result5: modeltrain(y, lag=5, alpha=0.5, const=T) → 0.009076151

where y = na.omit(end_var[, ezlasso.all]) with the 30-variable
hardcoded preselection list (Testing.R:214-219). Data prep follows
TESTING.R's own prep block (Testing.R:23-97), which produced the
end_var those golden numbers were computed on — it differs from
Main.R:32-96 in four load-bearing ways: ADF with fixed lag k=7,
crit=0.05 flagged at p >= crit; currency list = FRED!DK1:EB1 +
ED1:EP1 only (no CW1:DA1); currency series failing the positivity
check are left untransformed; and end_var is GLOBALLY na.omit-ed
across all 147 columns before any selection (Testing.R:97), so the
sample starts where the latest-starting series starts.

Exact-to-the-last-digit parity is not expected — glmnet's Fortran CD
tolerances and CV-curve shapes differ in the last digits and λ.min
selection can flip between near-tied grid points — but the sums
should land within a few percent (BASELINE.md tolerance note).

Usage: python tools/golden_repro.py [--quick]  (quick = lag=1 only)
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EZLASSO_ALL = [
    "GDP", "DDURRG3M086SBEA", "DPCERA3M086SBEA", "W875RX1", "INDPRO",
    "IPFINAL", "IPCONGD", "IPDCONGD", "IPNCONGD", "IPBUSEQ", "IPMAT",
    "IPDMAT", "IPNMAT", "IPFPNSS", "IPFUELN", "TCU", "MCUMFN", "CLF16OV",
    "CE16OV", "UNRATE", "UEMPMEAN", "UEMPLT5", "UEMP5TO14", "UEMP15OV",
    "UEMP15T26", "UEMP27OV", "PAYEMS", "USPRIV", "CES1021000001", "FEDFUNDS",
]

GOLDEN = {
    "result2": {"lag": 5, "alpha": 0.4, "mse_sum": 0.00907175092168175},
    "result3": {"lag": 1, "alpha": 0.4, "mse_sum": 0.0107635485836803},
    "result5": {"lag": 5, "alpha": 0.5, "mse_sum": 0.009076151},
}


def build_end_var(spark, variant: str = "testing"):
    """Data prep through the engine. variant="testing" replicates
    Testing.R:23-97 (the golden numbers' end_var, globally
    na.omit-ed); variant="main" replicates Main.R:32-96."""
    from var_elasticnet_bigdata_spark.operators.stationarity import (
        stationarity_pipeline,
    )

    if not os.path.exists("/tmp/sw_converted/monthly.parquet"):
        from tools.sw_convert import convert

        convert()
    meta = json.load(open("/tmp/sw_converted/meta.json"))
    if "currency_series_2ranges" not in meta:
        from tools.sw_convert import convert

        meta = convert()
    monthly = pd.read_parquet("/tmp/sw_converted/monthly.parquet")
    gdp = pd.read_parquet("/tmp/sw_converted/gdp.parquet")

    series_cols = [c for c in monthly.columns if c != "obs_date"]
    long = monthly.melt(
        id_vars=["obs_date"], value_vars=series_cols,
        var_name="series_id", value_name="value",
    )
    monthly_long = spark.createDataFrame(long)

    if variant == "testing":
        res = stationarity_pipeline(
            monthly_long,
            currency_series=set(meta["currency_series_2ranges"]),
            crit=0.05,
            adf_k=7,
            flag_ge=True,
            consume_currency=False,
            currency_fallback_diff=False,
        )
    else:
        res = stationarity_pipeline(
            monthly_long, currency_series=set(meta["currency_series"]),
            crit=0.01,
        )
    print(
        f"stationarity[{variant}]: {res.rounds} rounds, "
        f"still non-stationary: {res.still_non_stationary}"
    )

    quarterly = res.data.toPandas()
    wide = quarterly.pivot_table(
        index="obs_date", columns="series_id", values="value", aggfunc="first",
        dropna=False,
    ).sort_index()

    gdp = gdp.sort_values("obs_date").reset_index(drop=True)
    gdp["GDP"] = np.log(gdp.gdp).diff()
    gdp_ld = gdp.set_index("obs_date")["GDP"]

    merged = pd.concat([gdp_ld, wide], axis=1).sort_index()
    merged.index.name = "obs_date"
    if variant == "testing":
        # Testing.R:97: end_var <- na.omit(end_var) across ALL columns
        merged = merged.dropna()
        print(f"global na.omit end_var: {merged.shape[0]} quarters "
              f"({merged.index.min()} .. {merged.index.max()})")
    return merged, res


def run_experiment(spark, end_var: pd.DataFrame, lag: int, alpha: float):
    from var_elasticnet_bigdata_spark.harness.modeltrain import modeltrain

    cols = [c for c in EZLASSO_ALL if c in end_var.columns]
    missing = [c for c in EZLASSO_ALL if c not in end_var.columns]
    if missing:
        print("MISSING COLUMNS:", missing)
    sub = end_var[cols].dropna()
    print(f"na.omit frame: {sub.shape[0]} quarters x {sub.shape[1]} vars, "
          f"{sub.index.min()} .. {sub.index.max()}")
    pdf = sub.reset_index()
    pdf["obs_date"] = pd.to_datetime(pdf["obs_date"]).dt.date
    wide_df = spark.createDataFrame(pdf)
    start_pred = dt.date(2000, 1, 1)
    t0 = time.time()
    res = modeltrain(
        spark, wide_df, cols, start_pred=start_pred, lag=lag, alpha=alpha,
        const=True, with_ar1=False,
    )
    wall = time.time() - t0
    # "mse sum" in Testing.R = Σ_h u_1[h] = Σ_h SSE over the aligned
    # 68-origin window (sum((for.err$h)^2), enetVAR.R:475-482)
    mse_sum = sum(v * res.n_aligned for v in res.msfe.values())
    return mse_sum, res.msfe, wall


def main() -> None:
    quick = "--quick" in sys.argv
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from var_elasticnet_bigdata_spark.session import get_spark

    # 96 shuffle partitions: ~75 origin groups of very uneven cost
    # (late origins have more data AND more CV folds) — finer tasks
    # let the scheduler balance the stragglers
    spark = get_spark("golden-repro", shuffle_partitions=96)
    spark.sparkContext.setLogLevel("ERROR")
    end_var, _ = build_end_var(spark)
    results = {}
    for name, cfg in GOLDEN.items():
        if quick and cfg["lag"] != 1:
            continue
        mse_sum, msfe, wall = run_experiment(
            spark, end_var, cfg["lag"], cfg["alpha"]
        )
        rel = abs(mse_sum - cfg["mse_sum"]) / cfg["mse_sum"]
        results[name] = {
            "ours": mse_sum,
            "golden": cfg["mse_sum"],
            "rel_err": rel,
            "msfe": msfe,
            "wall_sec": wall,
        }
        print(
            f"{name}: ours={mse_sum:.9f} golden={cfg['mse_sum']:.9f} "
            f"rel_err={rel:.1%} wall={wall:.0f}s"
        )
    with open("/tmp/golden_repro.json", "w") as f:
        json.dump(results, f, indent=2, default=float)
    spark.stop()


if __name__ == "__main__":
    main()
