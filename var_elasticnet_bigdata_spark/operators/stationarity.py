"""Stationarity-transform fixpoint pipeline (SURVEY §2.8 M19;
reference Main.R:64-92) and ``unscale`` (M25, enetVAR.R:861-873).

The reference loop, replicated:

    while any series is ADF-non-stationary (p > crit):
      for each non-stationary series i:
        if i is a currency-unit series (membership consumed) AND all
        its raw monthly LEVELS are > 0:
            replace its quarterly column with the quarterly SUM of
            monthly log-diffs (dropping the first quarter)
        else:
            replace its column with the first difference of the
            current column (na.pad)
      re-run the batch ADF

Driver-side control flow issuing Spark jobs per round (SURVEY §3.1):
each round is one batch-ADF pass (grouped applyInPandas) plus
per-branch window transforms on the LONG frame — all partitioned by
series_id, never a global sort. The transform history per series is
returned so levels can be reconstructed (W7) and the pipeline is
auditable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import adf_table
from . import timeseries as ts


@dataclass
class StationarityResult:
    data: DataFrame  # long (series_id, obs_date, value) — all stationary
    transforms: dict[str, list[str]] = field(default_factory=dict)
    rounds: int = 0
    still_non_stationary: list[str] = field(default_factory=list)


def make_quarterly_diffs(
    monthly_long: DataFrame, freq: str = "quarter"
) -> DataFrame:
    """Initial transform (Main.R:43): quarterly SUM of monthly first
    diffs, first quarter dropped (the reference's ``[-1,]``).
    strict_na: zoo's sum propagates NA (partial quarters at ragged
    series starts stay NA, as in R). ``freq`` generalizes the bucket
    (the reference's monthly→quarterly shape at other input
    granularities, e.g. daily→week for the driver testdata's 30-day
    event span)."""
    d = ts.diff(monthly_long, out_col="value")
    q = ts.resample(d, freq=freq, how="sum", strict_na=True)
    first_q = q.agg(F.min("obs_date")).collect()[0][0]
    return q.filter(F.col("obs_date") > F.lit(first_q))


def _quarterly_logdiffs(
    monthly_long: DataFrame, series: list[str], freq: str = "quarter"
) -> DataFrame:
    """Log-diff branch (Main.R:86-87): quarterly sum of monthly
    log-diffs for the given series, first quarter dropped."""
    sub = monthly_long.filter(F.col("series_id").isin(series))
    ld = ts.log_diff(sub, out_col="value")
    q = ts.resample(ld, freq=freq, how="sum", strict_na=True)
    first_q = q.agg(F.min("obs_date")).collect()[0][0]
    return q.filter(F.col("obs_date") > F.lit(first_q))


def stationarity_pipeline(
    monthly_long: DataFrame,
    currency_series: set[str] | list[str],
    crit: float = 0.01,
    max_rounds: int = 8,
    adf_k: int | None = None,
    flag_ge: bool = False,
    consume_currency: bool = True,
    currency_fallback_diff: bool = True,
    resample_freq: str = "quarter",
) -> StationarityResult:
    """Run the fixpoint loop on a long monthly frame
    ``(series_id, obs_date, value)``. Returns the stationary
    quarterly frame + per-series transform history.

    Two reference variants exist (they produce DIFFERENT data):

    - Main.R:64-92 (defaults): ADF lag k auto (trunc((n−1)^(1/3))),
      flag p > crit (crit 0.01), currency membership consumed on
      first use, currency series failing the positivity check fall
      through to the extra-diff branch.
    - Testing.R:45-97 (``adf_k=7, crit=0.05, flag_ge=True,
      consume_currency=False, currency_fallback_diff=False``): fixed
      ADF lag 7, flag p >= crit, currency membership NOT consumed
      (the pool-removal line operates on the wrong variable, so a
      still-non-stationary currency series just gets its — idempotent
      — log-diff replacement again), and a currency series failing
      positivity is left UNTRANSFORMED (no else-branch), relying on
      the no-progress loop guard. The golden numbers in
      Testing.R:227-243 were produced on THIS variant's ``end_var``.
    """
    currency_pool = set(currency_series)
    transforms: dict[str, list[str]] = {}

    # strictly-positive check uses RAW monthly levels (Main.R:72)
    positive = {
        r["series_id"]
        for r in (
            monthly_long.dropna(subset=["value"])
            .groupBy("series_id")
            .agg((F.min("value") > 0).alias("pos"))
            .collect()
        )
        if r["pos"]
    }

    current = make_quarterly_diffs(monthly_long, freq=resample_freq)
    for s in {r["series_id"] for r in current.select("series_id").distinct().collect()}:
        transforms[s] = ["diff_quarterly_sum"]

    rounds = 0
    non_stat: list[str] = []
    while rounds < max_rounds:
        adf = adf_table(current.dropna(subset=["value"]), k=adf_k).collect()
        if flag_ge:
            non_stat = sorted(
                r["series_id"] for r in adf if not (r["p_value"] < crit)
            )
        else:
            non_stat = sorted(
                r["series_id"] for r in adf if not (r["p_value"] <= crit)
            )
        if not non_stat:
            break
        log_branch, diff_branch = [], []
        for s in non_stat:
            if s in currency_pool:
                if consume_currency:
                    currency_pool.discard(s)  # membership consumed (Main.R:71)
                if s in positive:
                    log_branch.append(s)
                elif currency_fallback_diff:
                    diff_branch.append(s)
                # else: Testing.R leaves it untransformed
            else:
                diff_branch.append(s)
        # no-progress guard (Testing.R:88-93): if every remaining
        # transform is an idempotent log-diff replay and nothing gets
        # an extra diff, the loop cannot change the data — stop.
        effective_log = [
            s for s in log_branch
            if transforms.get(s) != ["logdiff_quarterly_sum"]
        ]
        if not effective_log and not diff_branch:
            break
        rounds += 1
        changed = set(effective_log) | set(diff_branch)
        keep = current.filter(~F.col("series_id").isin(list(changed)))
        log_branch = effective_log
        parts = [keep]
        if log_branch:
            parts.append(
                _quarterly_logdiffs(monthly_long, log_branch, resample_freq)
            )
            for s in log_branch:
                transforms[s] = ["logdiff_quarterly_sum"]
        if diff_branch:
            sub = current.filter(F.col("series_id").isin(diff_branch))
            parts.append(ts.diff(sub, out_col="value"))  # na.pad (Main.R:89)
            for s in diff_branch:
                transforms.setdefault(s, []).append("diff")
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        current = merged
    return StationarityResult(
        data=current,
        transforms=transforms,
        rounds=rounds,
        still_non_stationary=non_stat,
    )


def unscale(df: DataFrame, centers: dict[str, float], scales: dict[str, float],
            columns: list[str] | None = None) -> DataFrame:
    """M25 ``unscale`` (enetVAR.R:861-873): invert standardization
    column-wise, x·scale + center — the StandardScaler inverse as
    plain column arithmetic."""
    cols = columns or list(centers)
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.col(f"`{c}`") * F.lit(scales[c]) + F.lit(centers[c])
        )
    return out
