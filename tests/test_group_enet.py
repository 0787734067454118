"""Group elastic net oracles: K=1 equivalence with the univariate
path, group-KKT optimality, ridge closed form, row-sparsity
structure, and the Spark fit path."""

from __future__ import annotations

import numpy as np
import pytest

from var_elasticnet_bigdata_spark.ml.elastic_net import enet_path
from var_elasticnet_bigdata_spark.ml.group_enet import (
    LocalGroupEnetVAR,
    _block_cd,
    _standardize_group,
    cv_group_enet,
    fit_group_enet_var,
    group_enet_path,
)
from var_elasticnet_bigdata_spark.ml.local import (
    fold_moments_from_numpy,
    moments_from_numpy,
)


def make_problem(seed=0, n=200, k=6, K=3, group_sparse=True):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    B = np.zeros((k, K))
    active = [0, 2] if group_sparse else range(k)
    for j in active:
        B[j] = rng.normal(size=K)
    Y = X @ B + rng.normal(scale=0.3, size=(n, K))
    return X, Y, B


def _moments(X, Y):
    k, K = X.shape[1], Y.shape[1]
    names = [f"x{i}" for i in range(k)] + [f"y{i}" for i in range(K)]
    return moments_from_numpy(np.column_stack([X, Y]), names), names


def test_k1_reduces_to_univariate_enet():
    X, Y, _ = make_problem(K=1)
    m, names = _moments(X, Y)
    xc, yc = names[:-1], [names[-1]]
    for alpha in (0.3, 1.0):
        # tol below the production default (glmnet thresh): this is an
        # exact-equivalence oracle, not a speed path
        g = group_enet_path(
            m, xc, yc, alpha=alpha, standardize_response=False, nlambda=30,
            tol=1e-14,
        )
        u = enet_path(m, xc, yc[0], alpha=alpha, lambdas=g.lambdas)
        assert g.coefs[:, 0, :] == pytest.approx(u.coefs, abs=1e-8)


def test_group_ridge_closed_form():
    X, Y, _ = make_problem(seed=1, group_sparse=False)
    m, names = _moments(X, Y)
    xc, yc = names[:6], names[6:]
    xtx_n, xty_n, *_ = _standardize_group(m, xc, yc, False, True, False)
    lam = 0.3
    B = _block_cd(xtx_n, xty_n, alpha=0.0, lam=lam, tol=1e-14)
    want = np.linalg.solve(xtx_n + lam * np.eye(6), xty_n)
    assert B == pytest.approx(want, abs=1e-8)


def test_group_kkt_conditions():
    X, Y, _ = make_problem(seed=2)
    m, names = _moments(X, Y)
    xc, yc = names[:6], names[6:]
    xtx_n, xty_n, *_ = _standardize_group(m, xc, yc, False, True, True)
    alpha, lam = 0.6, 0.15
    B = _block_cd(xtx_n, xty_n, alpha, lam, tol=1e-14)
    R = xty_n - xtx_n @ B
    for j in range(6):
        grad = R[j] - lam * (1 - alpha) * B[j]
        nb = np.linalg.norm(B[j])
        if nb > 0:
            want = lam * alpha * B[j] / nb
            assert grad == pytest.approx(want, abs=1e-7)
        else:
            assert np.linalg.norm(R[j]) <= lam * alpha + 1e-7


def test_row_group_sparsity():
    X, Y, Btrue = make_problem(seed=3)
    m, names = _moments(X, Y)
    fit = group_enet_path(m, names[:6], names[6:], alpha=0.9, nlambda=50)
    mid = fit.coefs[:, :, 20]
    row_norms = np.linalg.norm(mid, axis=1)
    # sparsity is row-structured: a zero row is zero across ALL responses
    zero_rows = row_norms == 0
    assert zero_rows.any()
    for j in np.flatnonzero(zero_rows):
        assert np.all(mid[j] == 0)


def test_cv_recovers_signal_and_predict():
    X, Y, Btrue = make_problem(seed=4, n=300)
    data = np.column_stack([X, Y])
    names = [f"x{i}" for i in range(6)] + [f"y{i}" for i in range(3)]
    fm = fold_moments_from_numpy(data, names, np.arange(300) // 30)
    fit = cv_group_enet(fm, names[:6], names[6:], alpha=0.5)
    B, a0 = fit.coef_at(fit.lambda_min)
    assert B == pytest.approx(Btrue, abs=0.1)
    assert fit.cv_mean is not None and np.isfinite(fit.cv_mean).all()


def test_local_group_var_recursive_predict():
    rng = np.random.default_rng(5)
    T = 150
    y = np.zeros((T, 2))
    for t in range(1, T):
        y[t, 0] = 0.5 * y[t - 1, 0] + 0.3 * y[t - 1, 1] + rng.normal(scale=0.2)
        y[t, 1] = 0.4 * y[t - 1, 1] + rng.normal(scale=0.2)
    m = LocalGroupEnetVAR(y, ["a", "b"], p=1, alpha=0.4)
    B = m.coef_matrix()
    got = m.predict(3)
    hist = y.copy()
    for _ in range(3):
        z = hist[::-1][:1].ravel()
        yh = z @ B
        hist = np.vstack([hist, yh])
    assert got == pytest.approx(hist[-3:], rel=1e-10)


def test_spark_group_fit_matches_local(spark):
    import datetime as dt

    import pandas as pd

    rng = np.random.default_rng(6)
    T = 120
    y = np.cumsum(rng.normal(size=(T, 2)), axis=0) * 0.05
    pdf = pd.DataFrame(y, columns=["a", "b"])
    pdf.insert(
        0, "obs_date", [dt.date(2000, 1, 1) + dt.timedelta(days=i) for i in range(T)]
    )
    wide = spark.createDataFrame(pdf)
    dist = fit_group_enet_var(wide, ["a", "b"], p=1, alpha=0.4)
    local = LocalGroupEnetVAR(y, ["a", "b"], p=1, alpha=0.4)
    assert dist.lambda_min == pytest.approx(local.fit.lambda_min, rel=1e-9)
    Bd, _ = dist.coef_at(dist.lambda_min)
    Bl, _ = local.fit.coef_at(local.fit.lambda_min)
    assert Bd == pytest.approx(Bl, abs=1e-8)


def test_block_cd_fixed_converges_to_block_cd():
    """The fixed-schedule solver used by the ml_group_enet_coefs hash
    gate reaches the converged _block_cd solution as sweeps grow, and
    80 sweeps (the gate's schedule) is deterministic and finite."""
    import numpy as np

    from var_elasticnet_bigdata_spark.ml.group_enet import (
        _block_cd,
        block_cd_fixed,
    )

    rng = np.random.default_rng(7)
    n, k, K = 200, 4, 2
    X = rng.normal(size=(n, k))
    X[:, 2] = 0.95 * X[:, 0] + 0.05 * X[:, 2]  # collinear like a lag design
    B_true = rng.normal(size=(k, K))
    Y = X @ B_true + rng.normal(scale=0.1, size=(n, K))
    Xs = (X - X.mean(0)) / X.std(0)
    Ys = (Y - Y.mean(0)) / Y.std(0)
    C = Xs.T @ Xs / n
    R = Xs.T @ Ys / n
    ref = _block_cd(C, R, alpha=0.5, lam=0.01, tol=1e-12)
    approx = block_cd_fixed(C, R, alpha=0.5, lam=0.01, sweeps=60000)
    # fixed schedule lands ON the unique minimizer (KKT residual ~1e-16
    # measured; _block_cd's energy-criterion exit stops ~7e-5 short on
    # this collinear design, so compare both to optimality, not to
    # each other at tight tolerance)
    g, ridge = 0.005, 0.005
    def kkt_residual(B):
        Rres = R - C @ B
        worst = 0.0
        for j in range(4):
            if np.any(B[j] != 0):
                u = B[j] / np.linalg.norm(B[j])
                worst = max(worst, np.abs(Rres[j] - ridge * B[j] - g * u).max())
            else:
                worst = max(worst, max(0.0, np.linalg.norm(Rres[j]) - g))
        return worst
    assert kkt_residual(approx) < 1e-10
    assert np.allclose(approx, ref, atol=1e-3)
    # determinism of the gate schedule
    a = block_cd_fixed(C, R, alpha=0.5, lam=0.01, sweeps=80)
    b = block_cd_fixed(C, R, alpha=0.5, lam=0.01, sweeps=80)
    assert np.array_equal(a, b)
