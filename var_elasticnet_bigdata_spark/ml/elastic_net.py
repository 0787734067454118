"""Pathwise coordinate-descent elastic net on moment matrices.

Solves the glmnet-family gaussian objective (the reference's
``.enetVAR`` core, enetVAR.R:10-37, which calls glmnet's Fortran
coordinate descent):

    min_b  (1/2n)·Σ(y − Xb)²  +  λ·( α·‖b‖₁ + (1−α)/2·‖b‖₂² )

entirely from the moment matrix ``M'M`` over ``[1, X, y]`` — so the
fit is EXACT given one distributed Gram pass, independent of data
size (SURVEY §4.3 "Gram-matrix trick").

glmnet semantics replicated (public glmnet docs/source behavior):
- ``standardize=True``: X scaled to unit variance with denominator n;
  coefficients un-standardized on return.
- ``intercept=True``: X and y centered (intercept recovered as
  ȳ − β'x̄); ``intercept=False``: no centering, scale = √E[x²]
  (uncentered second moment — glmnet's intr=0 behavior).
- λ path: ``lambda_max = max_j |⟨x̃_j, ỹ⟩|/(n·max(α, 1e-3))``,
  ``nlambda`` log-spaced down to ``lambda_max·lambda_min_ratio``
  (ratio 1e-4 when n > k else 1e-2), warm starts down the path.
- covariance-style updates with active-set iteration (the strategy
  glmnet uses for n ≫ k).

Verification oracles (tests/test_elastic_net.py): ridge closed form
at α=0, soft-threshold closed form on orthonormal designs at α=1,
and KKT optimality conditions at any (α, λ).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .gram import Moments


@dataclass
class StandardizedProblem:
    """Inner products of the standardized design with the (centered)
    response: everything coordinate descent touches."""

    xtx_n: np.ndarray  # (1/n)·X̃'X̃
    xty_n: np.ndarray  # (1/n)·X̃'ỹ
    yty_n: float  # (1/n)·ỹ'ỹ
    x_mean: np.ndarray
    x_scale: np.ndarray
    y_mean: float
    n: int


def standardize_problem(
    moments: Moments,
    x_cols: list[str],
    y_col: str,
    intercept: bool,
    standardize: bool = True,
) -> StandardizedProblem:
    n = moments.n
    sx = moments.sums(x_cols)
    sy = moments.sums([y_col])[0]
    xtx = moments.cross(x_cols, x_cols)
    xty = moments.cross(x_cols, [y_col])[:, 0]
    yty = moments.cross([y_col], [y_col])[0, 0]

    if intercept:
        mx, my = sx / n, sy / n
    else:
        mx, my = np.zeros_like(sx), 0.0
    # second moment about mx (centered iff intercept)
    var_x = xtx.diagonal() / n - mx**2
    scale = np.sqrt(np.maximum(var_x, 0.0)) if standardize else np.ones_like(sx)
    scale = np.where(scale <= 0, 1.0, scale)

    # (1/n)·X̃'X̃ = (XtX/n − mx⊗mx) / (sx⊗sx)
    xtx_n = (xtx / n - np.outer(mx, mx)) / np.outer(scale, scale)
    xty_n = (xty / n - mx * my) / scale
    yty_n = yty / n - my**2
    return StandardizedProblem(
        xtx_n=xtx_n,
        xty_n=xty_n,
        yty_n=yty_n,
        x_mean=mx,
        x_scale=scale,
        y_mean=my,
        n=n,
    )


def lambda_path(
    prob: StandardizedProblem,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float | None = None,
) -> np.ndarray:
    """glmnet's default λ sequence from the data."""
    k = len(prob.xty_n)
    if lambda_min_ratio is None:
        lambda_min_ratio = 1e-2 if prob.n < k else 1e-4
    a = max(alpha, 1e-3)
    lmax = float(np.max(np.abs(prob.xty_n))) / a
    if lmax <= 0:
        lmax = 1.0
    return np.exp(np.linspace(np.log(lmax), np.log(lmax * lambda_min_ratio), nlambda))


def _soft(z: float, g: float) -> float:
    if z > g:
        return z - g
    if z < -g:
        return z + g
    return 0.0


def coordinate_descent(
    prob: StandardizedProblem,
    alpha: float,
    lam: float,
    b0: np.ndarray | None = None,
    tol: float = 1e-10,
    max_iter: int = 100_000,
) -> np.ndarray:
    """Covariance-update coordinate descent at one λ (standardized
    scale). Active-set strategy: full passes until the active set
    stabilizes, then iterate on the active set to convergence."""
    k = len(prob.xty_n)
    b = np.zeros(k) if b0 is None else b0.copy()
    xtx, xty = prob.xtx_n, prob.xty_n
    den = xtx.diagonal() + lam * (1.0 - alpha)
    g = lam * alpha
    # residual inner products: r_j = (1/n)⟨x̃_j, ỹ − X̃b⟩ maintained incrementally
    r = xty - xtx @ b

    def sweep(idx) -> float:
        delta = 0.0
        for j in idx:
            bj_old = b[j]
            z = r[j] + xtx[j, j] * bj_old
            bj = _soft(z, g) / den[j] if den[j] > 0 else 0.0
            if bj != bj_old:
                d = bj - bj_old
                np.subtract(r, xtx[:, j] * d, out=r)
                b[j] = bj
                delta = max(delta, abs(d))
        return delta

    all_idx = np.arange(k)
    for _ in range(max_iter):
        delta = sweep(all_idx)
        if delta < tol:
            break
        active = np.flatnonzero(b)
        for _ in range(max_iter):
            if sweep(active) < tol:
                break
    return b


@dataclass
class EnetFit:
    """Per-equation elastic-net path (the reference's glmnet fit
    object, enetVAR.R:23-35): coefficients at every λ on the original
    data scale + the intercepts."""

    x_cols: list[str]
    y_col: str
    alpha: float
    lambdas: np.ndarray
    coefs: np.ndarray  # (k, nlambda) original scale
    intercepts: np.ndarray  # (nlambda,)
    cv_mean: np.ndarray | None = None  # mean CV MSE per λ
    cv_se: np.ndarray | None = None
    lambda_min: float | None = None
    extras: dict = field(default_factory=dict)

    def coef_at(self, lam: float) -> tuple[np.ndarray, float]:
        """Coefficients at λ: exact if on the path, else linear
        interpolation in λ (glmnet ``coef(s=...)`` behavior,
        ``exact=FALSE``)."""
        ls = self.lambdas
        if lam >= ls[0]:
            return self.coefs[:, 0], float(self.intercepts[0])
        if lam <= ls[-1]:
            return self.coefs[:, -1], float(self.intercepts[-1])
        i = int(np.searchsorted(-ls, -lam, side="left"))
        l0, l1 = ls[i - 1], ls[i]
        w = (lam - l1) / (l0 - l1)
        return (
            w * self.coefs[:, i - 1] + (1 - w) * self.coefs[:, i],
            float(w * self.intercepts[i - 1] + (1 - w) * self.intercepts[i]),
        )


def enet_path(
    moments: Moments,
    x_cols: list[str],
    y_col: str,
    alpha: float = 0.4,
    lambdas: np.ndarray | None = None,
    intercept: bool = False,
    standardize: bool = True,
    nlambda: int = 100,
    lambda_min_ratio: float | None = None,
    tol: float = 1e-10,
) -> EnetFit:
    """Fit the full λ path from a moment matrix (warm starts)."""
    prob = standardize_problem(moments, x_cols, y_col, intercept, standardize)
    if lambdas is None:
        lambdas = lambda_path(prob, alpha, nlambda, lambda_min_ratio)
    lambdas = np.asarray(sorted(lambdas, reverse=True), dtype=float)
    k = len(x_cols)
    coefs = np.zeros((k, len(lambdas)))
    intercepts = np.zeros(len(lambdas))
    b = np.zeros(k)
    for i, lam in enumerate(lambdas):
        b = coordinate_descent(prob, alpha, float(lam), b0=b, tol=tol)
        beta = b / prob.x_scale
        coefs[:, i] = beta
        intercepts[i] = prob.y_mean - float(beta @ prob.x_mean) if intercept else 0.0
    return EnetFit(
        x_cols=list(x_cols),
        y_col=y_col,
        alpha=alpha,
        lambdas=lambdas,
        coefs=coefs,
        intercepts=intercepts,
    )


def cv_enet(
    fold_moments: dict[int, Moments],
    x_cols: list[str],
    y_col: str,
    alpha: float = 0.4,
    intercept: bool = False,
    standardize: bool = True,
    nlambda: int = 100,
    lambdas: np.ndarray | None = None,
    tol: float = 1e-10,
) -> EnetFit:
    """cv.glmnet from per-fold moments: ONE distributed pass gave
    {fold → moments}; each fold's held-out MSE is computed exactly
    from its own moment matrix:

        MSE_f(b) = (1/n_f)·(y'y − 2·b'X'y + b'X'X b) over fold f

    (with the intercept folded in via the constant column). Mirrors
    the reference's blocked-fold cv.glmnet (enetVAR.R:27-35) with
    ``lambda.min`` selection.
    """
    from .gram import moments_total

    total = moments_total(fold_moments)
    full = enet_path(
        total,
        x_cols,
        y_col,
        alpha=alpha,
        lambdas=lambdas,
        intercept=intercept,
        standardize=standardize,
        nlambda=nlambda,
        tol=tol,
    )
    errs = np.zeros((len(fold_moments), len(full.lambdas)))
    for fi, (fold, fm) in enumerate(sorted(fold_moments.items())):
        train = total.minus(fm)
        fit = enet_path(
            train,
            x_cols,
            y_col,
            alpha=alpha,
            lambdas=full.lambdas,
            intercept=intercept,
            standardize=standardize,
            tol=tol,
        )
        # held-out MSE from fold moments
        n_f = fm.n
        xtx = fm.cross(x_cols, x_cols)
        xty = fm.cross(x_cols, [y_col])[:, 0]
        yty = fm.cross([y_col], [y_col])[0, 0]
        sx = fm.sums(x_cols)
        sy = fm.sums([y_col])[0]
        for li in range(len(full.lambdas)):
            b = fit.coefs[:, li]
            a0 = fit.intercepts[li]
            sse = (
                yty
                - 2 * b @ xty
                + b @ xtx @ b
                + n_f * a0**2
                + 2 * a0 * (b @ sx - sy)
            )
            errs[fi, li] = sse / n_f
    full.cv_mean = errs.mean(axis=0)
    full.cv_se = errs.std(axis=0, ddof=1) / np.sqrt(len(fold_moments))
    full.lambda_min = float(full.lambdas[int(np.argmin(full.cv_mean))])
    return full


def blocked_fold_ids(n: int, block: int = 10) -> np.ndarray:
    """The reference's contiguous time-series CV folds
    (enetVAR.R:27-35): fold id = row index div block, identical
    across equations 'for comparability'. The final short block keeps
    its own id (matching ``rep(1:ceiling(n/10), each=10)[1:n]``)."""
    return np.arange(n) // block


def kkt_violation(
    prob: StandardizedProblem, b: np.ndarray, alpha: float, lam: float
) -> float:
    """Max KKT violation at (α, λ) on the standardized scale — the
    optimality oracle used by the tests: for active coords
    grad = λα·sign(b); for zeros |grad| ≤ λα."""
    grad = prob.xty_n - prob.xtx_n @ b - lam * (1 - alpha) * b
    v = 0.0
    for j in range(len(b)):
        if b[j] != 0:
            v = max(v, abs(grad[j] - lam * alpha * np.sign(b[j])))
        else:
            v = max(v, max(0.0, abs(grad[j]) - lam * alpha))
    return v
