"""Statistical distribution tail functions in pure numpy/stdlib.

scipy is not available in the target environment, so the survival
functions the regression engine needs (normal, chi-square, Student t, F)
are implemented here from the classic special-function algorithms
(regularized incomplete gamma via series/continued-fraction, regularized
incomplete beta via Lentz's continued fraction — standard public-domain
numerical methods, cf. Abramowitz & Stegun §6.5/§26.5).

These run driver-side or inside grouped pandas-UDF kernels on small
per-fit inputs, so scalar math.* calls wrapped with np.vectorize are
plenty fast; nothing here touches the distributed hot path.
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 3e-16
_FPMIN = 1e-300
_MAX_ITER = 500


def _gammainc_lower_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x) by power series (x < a+1)."""
    if x <= 0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delt = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delt *= x / ap
        summ += delt
        if abs(delt) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gammainc_upper_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a,x) by continued fraction (x >= a+1)."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def _gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = Gamma(a,x)/Gamma(a)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gammainc_lower_series(a, x)
    return _gammainc_upper_cf(a, x)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


# ---- public vectorized API ------------------------------------------------


def norm_sf(z):
    """Standard normal survival function P(Z > z)."""
    return np.vectorize(lambda v: 0.5 * math.erfc(v / math.sqrt(2.0)), otypes=[float])(z)


def chi2_sf(x, df):
    """Chi-square survival function P(X > x) = Q(df/2, x/2)."""
    return np.vectorize(
        lambda v, k: _gammainc_q(k / 2.0, v / 2.0) if v >= 0 else 1.0, otypes=[float]
    )(x, df)


def t_sf(t, df):
    """Student-t survival function P(T > t)."""

    def one(tv: float, k: float) -> float:
        if k <= 0:
            return float("nan")
        p = 0.5 * _betainc(k / 2.0, 0.5, k / (k + tv * tv))
        return p if tv >= 0 else 1.0 - p

    return np.vectorize(one, otypes=[float])(t, df)


def f_sf(x, dfn, dfd):
    """F-distribution survival function P(F > x)."""

    def one(v: float, d1: float, d2: float) -> float:
        if v <= 0:
            return 1.0
        return _betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * v))

    return np.vectorize(one, otypes=[float])(x, dfn, dfd)


def skewtest_z_p(g1: float, n: int) -> tuple[float, float]:
    """D'Agostino skewness test: z-score + two-sided p for sample skewness
    g1 with n observations (the closed form scipy.stats.skewtest uses;
    D'Agostino, Belanger & D'Agostino Jr 1990). Requires n >= 8."""
    if n < 8:
        return float("nan"), float("nan")
    y = g1 * math.sqrt(((n + 1.0) * (n + 3.0)) / (6.0 * (n - 2.0)))
    beta2 = (
        3.0
        * (n * n + 27.0 * n - 70.0)
        * (n + 1.0)
        * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    if y == 0:
        y = 1.0
    z = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))
    p = 2.0 * float(norm_sf(abs(z)))
    return z, p
