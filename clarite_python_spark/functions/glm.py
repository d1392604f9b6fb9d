"""Numpy GLM fitter — the per-variable kernel of the regression fan-out.

statsmodels is not available in the target environment, so this module
implements the two GLM families the reference dispatches to
(``glm_regression.py:126,157``):

- Gaussian + identity (continuous outcome): ordinary least squares; Wald
  inference uses the t distribution (reference sets ``use_t=True`` for
  Gaussian, ``glm_regression.py:128``), scale estimated as SSR/df_resid.
- Binomial + logit (binary outcome): IRLS / Newton; scale fixed at 1,
  Wald inference uses the normal distribution (``use_t=False``,
  ``glm_regression.py:160``).

Log-likelihood / AIC conventions follow statsmodels' GLM so LRT and
Diff_AIC numbers are comparable with the reference:

- Gaussian llf at the estimated scale s=SSR/df_resid:
  ``-0.5 * sum((y-mu)^2/s + log(2*pi*s))``
- Binomial llf: ``sum(y*log(mu) + (1-y)*log(1-mu))``
- AIC = -2*llf + 2*p  (p = number of estimated mean parameters)

Every fit is a small dense problem (n x p with p ~ 10), solved with
LAPACK via numpy inside an Arrow-batched ``applyInPandas`` worker — the
distributed plan never sees these matrices.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from clarite_python_spark.functions.distributions import norm_sf, t_sf

GAUSSIAN = "gaussian"
BINOMIAL = "binomial"


@dataclass
class GLMResult:
    params: np.ndarray
    bse: np.ndarray
    pvalues: np.ndarray
    llf: float
    aic: float
    df_resid: float
    converged: bool
    names: list[str]

    def by_name(self) -> dict[str, tuple[float, float, float]]:
        return {
            n: (float(b), float(s), float(p))
            for n, b, s, p in zip(self.names, self.params, self.bse, self.pvalues)
        }


def _wald(params: np.ndarray, cov: np.ndarray, df_resid: float, use_t: bool):
    bse = np.sqrt(np.clip(np.diag(cov), 0, None))
    with np.errstate(divide="ignore", invalid="ignore"):
        stat = params / bse
    if use_t:
        pvals = 2.0 * t_sf(np.abs(stat), df_resid)
    else:
        pvals = 2.0 * norm_sf(np.abs(stat))
    return bse, np.asarray(pvals, dtype=float)


def fit_gaussian(X: np.ndarray, y: np.ndarray, names: list[str]) -> GLMResult:
    """OLS with t-based Wald tests (statsmodels GLM Gaussian, use_t=True)."""
    n, p = X.shape
    params, _, rank, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ params
    ssr = float(resid @ resid)
    df_resid = n - rank
    scale = ssr / df_resid if df_resid > 0 else np.nan
    xtx_inv = np.linalg.pinv(X.T @ X)
    cov = scale * xtx_inv
    bse, pvals = _wald(params, cov, df_resid, use_t=True)
    if df_resid > 0 and scale > 0:
        llf = -0.5 * (ssr / scale + n * np.log(2.0 * np.pi * scale))
    else:
        llf = np.nan
    aic = -2.0 * llf + 2.0 * p
    return GLMResult(params, bse, pvals, float(llf), float(aic), float(df_resid), True, names)


def fit_binomial(
    X: np.ndarray, y: np.ndarray, names: list[str], max_iter: int = 100, tol: float = 1e-8
) -> GLMResult:
    """Logistic regression via IRLS with z-based Wald tests
    (statsmodels GLM Binomial, use_t=False; same convergence criterion
    family: relative deviance change < tol)."""
    n, p = X.shape
    beta = np.zeros(p)
    dev_old = np.inf
    converged = False
    mu = np.full(n, np.clip(y.mean(), 1e-6, 1 - 1e-6))
    eta = np.log(mu / (1 - mu))
    for _ in range(max_iter):
        w = mu * (1.0 - mu)
        w = np.clip(w, 1e-10, None)
        z = eta + (y - mu) / w
        wx = X * w[:, None]
        try:
            beta = np.linalg.solve(X.T @ wx, wx.T @ z)
        except np.linalg.LinAlgError:
            beta = np.linalg.lstsq(wx * 0 + X * np.sqrt(w)[:, None], z * np.sqrt(w), rcond=None)[0]
        eta = X @ beta
        eta = np.clip(eta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        mu = np.clip(mu, 1e-10, 1 - 1e-10)
        dev = -2.0 * float(np.sum(y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
        if abs(dev - dev_old) < tol * (abs(dev) + 0.1):
            converged = True
            break
        dev_old = dev
    w = np.clip(mu * (1.0 - mu), 1e-10, None)
    cov = np.linalg.pinv(X.T @ (X * w[:, None]))
    df_resid = n - p
    bse, pvals = _wald(beta, cov, df_resid, use_t=False)
    llf = float(np.sum(y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
    aic = -2.0 * llf + 2.0 * p
    return GLMResult(beta, bse, pvals, llf, float(aic), float(df_resid), converged, names)


def fit_binomial_freq(
    X: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    names: list[str],
    max_iter: int = 100,
    tol: float = 1e-8,
) -> GLMResult:
    """Frequency-weighted logistic IRLS: ``w[i]`` identical observations
    collapsed into one design row. Mirrors :func:`fit_binomial` step for
    step (same start, same update, same deviance criterion), so the
    iterates — and therefore params/SE/llf/AIC — equal the row-level fit
    exactly (all quantities are sums over rows = count-weighted sums over
    cells). ``n`` for df_resid/llf is the total count, not the cell
    count."""
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    w = np.asarray(w, dtype=float)
    n = float(w.sum())
    p = X.shape[1]
    mu_bar = np.clip((w @ y) / n, 1e-6, 1 - 1e-6)
    mu = np.full(len(y), mu_bar)
    eta = np.log(mu / (1 - mu))
    beta = np.zeros(p)
    dev_old = np.inf
    converged = False
    for _ in range(max_iter):
        wirls = np.clip(mu * (1.0 - mu), 1e-10, None)
        z = eta + (y - mu) / wirls
        wt = w * wirls
        wx = X * wt[:, None]
        try:
            beta = np.linalg.solve(X.T @ wx, wx.T @ z)
        except np.linalg.LinAlgError:
            sq = np.sqrt(wt)
            beta = np.linalg.lstsq(X * sq[:, None], z * sq, rcond=None)[0]
        eta = np.clip(X @ beta, -30, 30)
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-10, 1 - 1e-10)
        dev = -2.0 * float(w @ (y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
        if abs(dev - dev_old) < tol * (abs(dev) + 0.1):
            converged = True
            break
        dev_old = dev
    wirls = np.clip(mu * (1.0 - mu), 1e-10, None)
    cov = np.linalg.pinv(X.T @ (X * (w * wirls)[:, None]))
    df_resid = n - p
    bse, pvals = _wald(beta, cov, df_resid, use_t=False)
    llf = float(w @ (y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
    aic = -2.0 * llf + 2.0 * p
    return GLMResult(beta, bse, pvals, llf, float(aic), float(df_resid), converged, names)


def fit_glm(X: np.ndarray, y: np.ndarray, names: list[str], family: str) -> GLMResult:
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    if family == GAUSSIAN:
        return fit_gaussian(X, y, names)
    if family == BINOMIAL:
        return fit_binomial(X, y, names)
    raise ValueError(f"unknown family {family!r}")


def dummy_encode(values, levels: list, prefix: str) -> tuple[np.ndarray, list[str]]:
    """Treatment-code a categorical column against sorted ``levels``:
    reference level = first sorted level (pandas/patsy convention that
    fixes beta signs in the reference, ``glm_regression.py:129-150``).
    Returns (n x (k-1) matrix, names like ``prefix[T.level]``)."""
    arr = np.asarray(values, dtype=object)
    cols = []
    names = []
    for lv in levels[1:]:
        cols.append((arr == lv).astype(float))
        names.append(f"{prefix}[T.{lv}]")
    if not cols:
        return np.empty((len(arr), 0)), []
    return np.column_stack(cols), names
