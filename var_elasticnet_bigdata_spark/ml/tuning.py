"""Rolling-origin hyper-parameter tuning (SURVEY §2.8 M13/M14) — the
engine's largest custom piece: MLlib has no timeSlice resampler.

Reference semantics (enetVAR.R:538-565 ``enetVARtune``; 617-641
``ezlasso``): caret ``trainControl(method="timeSlice",
initialWindow, horizon, fixedWindow=FALSE)`` over the lag-embedded
design — for each origin t = initialWindow..(n−horizon), train on
rows 1..t, test on rows t+1..t+horizon; score every (α, λ) grid cell
by RMSE averaged over ALL origins; per equation, bestTune = the grid
cell with the lowest mean RMSE (caret tie-break: first in grid
order). ``ezlasso`` is the same machinery on a single equation
(y ~ x), horizon=1, α fixed, λ grid 10^seq(2,−2,len 100), then
signed-coefficient top-N (quirk Q6: large NEGATIVE predictors are
never selected — replicated faithfully, with a ``rank_abs`` fix
flag).

Spark shape (SURVEY §3.3): the resample×grid matrix is embarrassingly
parallel. The embedded frame is tiny (it is the post-aggregation
estimation frontier), so it is broadcast once; the (equation, α)
cells fan out via ``applyInPandas`` over a cell table — each cell
fits ONE λ-path per origin with warm starts (pathwise coordinate
descent ≡ glmnet's strategy, so one path serves all 200 λs) and
returns the per-λ mean RMSE. The driver then argmins. Fit count:
equations × α × origins path-fits, exactly caret's workload, spread
over the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .elastic_net import enet_path
from .local import moments_from_numpy

DEFAULT_ALPHA_GRID = np.round(np.arange(0.05, 0.951, 0.05), 2)  # 19 values
DEFAULT_LAMBDA_GRID = 10 ** np.linspace(1, -4, 200)  # enetVAR.R:557
EZLASSO_LAMBDA_GRID = 10 ** np.linspace(2, -2, 100)  # enetVAR.R:633


def _cell_rmse(
    X: np.ndarray,
    y: np.ndarray,
    alpha: float,
    lambdas: np.ndarray,
    init_window: int,
    horizon: int,
    intercept: bool = False,
) -> np.ndarray:
    """Mean RMSE per λ over all expanding-window origins (caret
    timeSlice): one warm-started λ-path fit per origin."""
    n = len(y)
    names = [f"x{i}" for i in range(X.shape[1])] + ["y"]
    x_cols, y_col = names[:-1], "y"
    lambdas = np.asarray(sorted(lambdas, reverse=True), dtype=float)
    origins = range(init_window, n - horizon + 1)
    if len(origins) == 0:
        # all-NaN RMSEs would make the caller's argmin silently pick
        # the first grid lambda — an untuned model with no visible
        # error anywhere downstream
        raise ValueError(
            f"no rolling origins: sample of {n} rows cannot hold "
            f"init_window={init_window} + horizon={horizon}"
        )
    # caret aggregation: RMSE per RESAMPLE (origin), then the mean
    # across resamples — NOT a pooled sqrt(sum_sse/sum_cnt). At
    # horizon=1 the per-origin RMSE is |e|, so pooling would rank the
    # lambda grid by RMSE where caret ranks by MAE and bestTune can
    # differ (heteroskedastic errors / outlier origins)
    rmse_sum = np.zeros(len(lambdas))
    n_origins = 0
    for t in origins:
        m = moments_from_numpy(
            np.column_stack([X[:t], y[:t]]), names
        )
        fit = enet_path(
            m, x_cols, y_col, alpha=alpha, lambdas=lambdas, intercept=intercept
        )
        Xt = X[t : t + horizon]
        yt = y[t : t + horizon]
        pred = Xt @ fit.coefs + fit.intercepts  # (horizon, nlambda)
        rmse_sum += np.sqrt(((pred - yt[:, None]) ** 2).mean(axis=0))
        n_origins += 1
    return rmse_sum / n_origins


def rolling_origin_tune(
    spark: SparkSession,
    wide_df: DataFrame,
    series: list[str],
    lag: int,
    init_window: int,
    horizon: int,
    alpha_grid: np.ndarray | None = None,
    lambda_grid: np.ndarray | None = None,
    intercept: bool = False,
    date_col: str = "obs_date",
) -> pd.DataFrame:
    """enetVARtune: per-equation bestTune (α, λ) over the rolling-
    origin grid. Returns a pandas frame (equation, alpha, lambda,
    rmse). Cells distributed as (equation, α) Spark tasks."""
    from ..operators.lag_embed import lag_col_name, var_z
    from pyspark.sql import functions as F

    alpha_grid = DEFAULT_ALPHA_GRID if alpha_grid is None else np.asarray(alpha_grid)
    lambda_grid = (
        DEFAULT_LAMBDA_GRID if lambda_grid is None else np.asarray(lambda_grid)
    )
    lambda_sorted = np.array(sorted(lambda_grid, reverse=True), dtype=float)

    vz = var_z(wide_df.select(date_col, *series), series, lag, date_col=date_col)
    z_cols = [lag_col_name(s, i) for i in range(1, lag + 1) for s in series]
    cond = None
    for c in [*z_cols, *series]:
        pred = F.col(f"`{c}`").isNotNull()
        cond = pred if cond is None else (cond & pred)
    embedded = vz.df.filter(cond).select(
        *[F.col(f"`{c}`") for c in [*z_cols, *series]]
    )
    from ..plans.guards import guard_driver_collect

    guard_driver_collect(
        embedded,
        "rolling_origin_tune's embedded estimation frame",
        "the distributed per-origin Gram path (harness.modeltrain with "
        "distribute='join')",
    )
    pdf = (
        vz.df.filter(cond)
        .orderBy(date_col)
        .select(*[F.col(f"`{c}`") for c in [*z_cols, *series]])
        .toPandas()
    )
    X = pdf[z_cols].to_numpy(dtype=float)
    Y = pdf[series].to_numpy(dtype=float)
    sc = spark.sparkContext
    bdata = sc.broadcast((X, Y))

    cell_rows = [
        (i, int(j), float(a))
        for i, (j, a) in enumerate(
            (j, a) for j in range(len(series)) for a in alpha_grid
        )
    ]
    # one task per (equation, α) cell via range partitioning — a
    # groupBy().applyInPandas here would shuffle the tiny cell frame
    # into spark.sql.shuffle.partitions tasks, spinning up a python
    # worker per partition for a handful of cells (measured 12 s of
    # pure worker startup at 32 partitions vs <1 s this way)
    cells = spark.createDataFrame(
        cell_rows, schema="cell_id int, eq int, alpha double"
    ).repartitionByRange(len(cell_rows), "cell_id")
    out_schema = StructType(
        [
            StructField("eq", IntegerType()),
            StructField("alpha", DoubleType()),
            StructField("rmse", ArrayType(DoubleType())),
        ]
    )
    iw, hz, ic = init_window, horizon, intercept
    lams = lambda_sorted

    def run(batches):
        X_, Y_ = bdata.value
        for pdf in batches:
            for j, a in zip(pdf["eq"], pdf["alpha"]):
                rmse = _cell_rmse(X_, Y_[:, int(j)], float(a), lams, iw, hz, ic)
                yield pd.DataFrame(
                    [{"eq": int(j), "alpha": float(a), "rmse": rmse.tolist()}]
                )

    res = cells.mapInPandas(run, out_schema).collect()

    rows = []
    for j, s in enumerate(series):
        best = None
        for r in sorted(
            (r for r in res if r["eq"] == j), key=lambda r: r["alpha"]
        ):
            rm = np.array(r["rmse"])
            # caret grid order: λ ascending within α; first min wins
            order = np.argsort(lams)  # ascending λ
            rm_asc = rm[order]
            li = int(np.argmin(rm_asc))
            cand = (float(rm_asc[li]), float(r["alpha"]), float(lams[order][li]))
            if best is None or cand[0] < best[0]:
                best = cand
        rows.append(
            {"equation": s, "alpha": best[1], "lambda": best[2], "rmse": best[0]}
        )
    return pd.DataFrame(rows)


def ezlasso(
    spark: SparkSession,
    wide_df: DataFrame,
    target: str,
    predictors: list[str],
    alpha: float = 0.0,
    maxnrvar: int = 10,
    init_window: int = 159,
    horizon: int = 1,
    rank_abs: bool = False,
    date_col: str = "obs_date",
    return_details: bool = False,
) -> list[str] | tuple[list[str], float, dict[str, float]]:
    """ezlasso (enetVAR.R:617-641): tune λ by rolling-origin RMSE on
    the single equation target ~ predictors (α fixed), refit on the
    full sample at bestTune, rank coefficients, take top maxnrvar,
    prepend the target.

    Quirk Q6 (faithful default): ranking is by SIGNED coefficient
    (``order(co, decreasing=T)``) so large negative predictors rank
    last; ``rank_abs=True`` ranks by |coef|.
    """
    from pyspark.sql import functions as F

    from ..plans.guards import guard_driver_collect

    frame = wide_df.select(date_col, target, *predictors).dropna()
    guard_driver_collect(
        frame,
        "ezlasso's estimation frame",
        "a per-origin distributed tuner (ml.tuning.rolling_origin_tune)",
    )
    pdf = frame.orderBy(date_col).toPandas()
    X = pdf[predictors].to_numpy(dtype=float)
    y = pdf[target].to_numpy(dtype=float)
    lams = np.array(sorted(EZLASSO_LAMBDA_GRID, reverse=True))
    rmse = _cell_rmse(X, y, alpha, lams, init_window, horizon, intercept=False)
    order = np.argsort(lams)  # ascending λ, caret grid order
    best_lam = float(lams[order][int(np.argmin(rmse[order]))])

    names = [f"x{i}" for i in range(X.shape[1])] + ["y"]
    m = moments_from_numpy(np.column_stack([X, y]), names)
    fit = enet_path(
        m, names[:-1], "y", alpha=alpha,
        lambdas=np.linspace(2 * best_lam, best_lam / 2, 10), intercept=False,
    )
    co, _ = fit.coef_at(best_lam)
    if rank_abs:
        # fix-mode: rank predictors by |coef| (no intercept row)
        idx = np.lexsort((np.arange(len(co)), -np.abs(co)))[:maxnrvar]
        chosen = [predictors[i] for i in idx]
    else:
        # faithful: glmnet's coef() matrix carries the '(Intercept)'
        # row FIRST (0 under intercept=FALSE) and the reference ranks
        # it WITH the predictors, dropping it only after the
        # top-maxnrvar slice (enetVAR.R:634-637) — so whenever fewer
        # than maxnrvar coefficients are strictly positive, the
        # intercept's 0 occupies a slot (beating every negative, and
        # winning ties at 0 by its first position under R's stable
        # order()) and only maxnrvar-1 predictors survive (quirk Q13)
        co_full = np.concatenate(([0.0], co))
        idx = np.lexsort((np.arange(len(co_full)), -co_full))[:maxnrvar]
        chosen = [predictors[i - 1] for i in idx if i != 0]
    sel = [target, *[c for c in chosen if c != target]]
    if return_details:
        # expose the tuned λ and refit coefficients so the driver
        # oracle can hash-check the whole chain, not just the names
        return sel, best_lam, {p: float(c) for p, c in zip(predictors, co)}
    return sel
