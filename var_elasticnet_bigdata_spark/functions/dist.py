"""Distribution CDFs (normal, Student-t, χ²) in pure Python/numpy.

scipy is not part of this environment, so the tail probabilities the
statistical-test operators need (reference ``pt``/``pnorm`` at
enetVAR.R:788,839 and χ² for Ljung–Box) are implemented from the
standard special-function identities:

- normal CDF via ``erfc`` (math library),
- Student-t CDF via the regularized incomplete beta function
  I_x(a,b) (continued fraction, Lentz's algorithm),
- χ² CDF via the regularized lower incomplete gamma P(s, x)
  (series for x < s+1, continued fraction otherwise).

All are textbook algorithms (Abramowitz & Stegun §6.4/§26; DLMF 8.9,
8.17) with double-precision accuracy ~1e-12, verified in
tests/test_dist.py against pinned R/scipy reference values.
"""

from __future__ import annotations

import math


def norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def norm_sf(x: float) -> float:
    """Upper tail P(Z > x) — R ``pnorm(x, lower.tail=FALSE)``."""
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def _betacf(a: float, b: float, x: float, max_iter: int = 300, eps: float = 3e-14) -> float:
    """Continued fraction for the incomplete beta (Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            return h
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_cdf(x: float, df: float) -> float:
    """Student-t CDF — R ``pt(x, df)``."""
    if df <= 0:
        raise ValueError("df must be positive")
    p = 0.5 * betainc(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - p if x > 0 else p


def t_sf(x: float, df: float) -> float:
    """Upper tail — R ``pt(x, df, lower.tail=FALSE)``."""
    return 1.0 - t_cdf(x, df)


def _gamma_p(s: float, x: float, max_iter: int = 500, eps: float = 3e-14) -> float:
    """Regularized lower incomplete gamma P(s, x)."""
    if x < 0 or s <= 0:
        raise ValueError("bad arguments")
    if x == 0:
        return 0.0
    if x < s + 1.0:
        # series
        term = 1.0 / s
        total = term
        a = s
        for _ in range(max_iter):
            a += 1.0
            term *= x / a
            total += term
            if abs(term) < abs(total) * eps:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for Q(s, x)
    b = x + 1.0 - s
    c = 1e300
    d = 1.0 / b
    h = d
    for i in range(1, max_iter + 1):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < 1e-300:
            d = 1e-300
        c = b + an / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    q = math.exp(-x + s * math.log(x) - math.lgamma(s)) * h
    return 1.0 - q


def chi2_cdf(x: float, df: float) -> float:
    return _gamma_p(df / 2.0, x / 2.0)


def chi2_sf(x: float, df: float) -> float:
    return 1.0 - chi2_cdf(x, df)
