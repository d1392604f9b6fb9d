"""Survey-weighted GLM kernel math — pure numpy, runs inside the
Arrow-batched ``applyInPandas`` workers of the weighted fan-out.

Re-implements (from public descriptions and observed behavior; no code
copied) the reference's survey statistics:

- weighted GLM fit with frequency weights (reference fits statsmodels
  ``GLM(freq_weights=...)``, ``survey_model.py:210-240``);
- Stata-linearization sandwich vcov ``H^-1 (J'J) H^-1`` with per-cluster
  score sums, stratum centering, lonely-PSU policies, ``sqrt(nh/(nh-1))``
  and ``sqrt(1-fpc)`` scaling (``survey_model.py:46-172``;
  http://www.stata.com/manuals13/svyvarianceestimation.pdf);
- survey degrees of freedom (``survey_design.py:723-745``);
- the Lumley-Scott working likelihood-ratio test with saddlepoint
  approximation (``clarite/internal/calculations.py:10-86``; Lumley &
  Scott, Aust. N.Z. J. Stat. 56(1), 2014).

Scale factors cancel in the sandwich (H^-1 carries +scale, J'J carries
1/scale^2 twice), so all quantities here are computed scale-free.

Numerical parity target: the reference's golden R ``survey`` CSVs at
rtol 1e-4 (``tests/analyze/test_association_study.py:1-11``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from clarite_python_spark.functions.distributions import f_sf, norm_sf

GAUSSIAN = "gaussian"
BINOMIAL = "binomial"

__all__ = [
    "WeightedGLMFit",
    "fit_weighted_glm",
    "sandwich_vcov",
    "jackknife_vcov",
    "survey_dof",
    "regterm_pvalue",
]


@dataclass
class WeightedGLMFit:
    """Weighted GLM fit state needed by the sandwich + LRT.

    ``a_inv`` is ``(X' W_irls X)^-1`` — statsmodels' ``cov_params()/scale``
    — where ``W_irls`` is ``w`` (Gaussian) or ``w*mu*(1-mu)`` (Binomial).
    ``score`` is the per-observation score ``w*(y-mu)*x`` (scale-free).
    """

    params: np.ndarray
    names: list[str]
    mu: np.ndarray
    deviance: float
    converged: bool
    a_inv: np.ndarray
    score: np.ndarray


def fit_weighted_glm(
    X: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    family: str,
    max_iter: int = 100,
    tol: float = 1e-8,
) -> WeightedGLMFit:
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    w = np.asarray(w, dtype=float)
    n, p = X.shape
    if family == GAUSSIAN:
        xtw = X.T * w
        a = xtw @ X
        try:
            params = np.linalg.solve(a, xtw @ y)
        except np.linalg.LinAlgError:
            params = np.linalg.lstsq(X * np.sqrt(w)[:, None], y * np.sqrt(w), rcond=None)[0]
        mu = X @ params
        resid = y - mu
        deviance = float(w @ (resid * resid))
        a_inv = np.linalg.pinv(a)
        score = (w * resid)[:, None] * X
        return WeightedGLMFit(params, [], mu, deviance, True, a_inv, score)
    if family == BINOMIAL:
        # IRLS with the statsmodels start (mu = (y+0.5)/2) and deviance
        # convergence criterion (atol 1e-8).
        mu = (y + 0.5) / 2.0
        eta = np.log(mu / (1.0 - mu))
        dev_old = np.inf
        converged = False
        params = np.zeros(p)
        for _ in range(max_iter):
            wm = np.clip(mu * (1.0 - mu), 1e-10, None)
            z = eta + (y - mu) / wm
            ww = w * wm
            xtw = X.T * ww
            try:
                params = np.linalg.solve(xtw @ X, xtw @ z)
            except np.linalg.LinAlgError:
                sq = np.sqrt(ww)
                params = np.linalg.lstsq(X * sq[:, None], z * sq, rcond=None)[0]
            eta = np.clip(X @ params, -30, 30)
            mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-10, 1 - 1e-10)
            dev = -2.0 * float(w @ (y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
            if abs(dev - dev_old) < tol:
                converged = True
                break
            dev_old = dev
        wm = np.clip(mu * (1.0 - mu), 1e-10, None)
        a = X.T @ (X * (w * wm)[:, None])
        a_inv = np.linalg.pinv(a)
        score = (w * (y - mu))[:, None] * X
        deviance = -2.0 * float(w @ (y * np.log(mu) + (1.0 - y) * np.log(1.0 - mu)))
        return WeightedGLMFit(params, [], mu, deviance, converged, a_inv, score)
    raise ValueError(f"unknown family {family!r}")


def _center_strata(
    jdata: np.ndarray,
    j_strat: np.ndarray,
    single_cluster: str,
    pop_mean: np.ndarray,
) -> np.ndarray:
    """Center per-cluster score sums within each stratum. Single-cluster
    strata: 'adjust' subtracts the grand per-observation mean; everything
    else centers on the (trivial) stratum mean → zero contribution
    (reference survey_model.py:127-141)."""
    out = jdata.copy()
    for s in np.unique(j_strat):
        rows = j_strat == s
        if rows.sum() == 1 and single_cluster == "adjust":
            out[rows] -= pop_mean
        else:
            out[rows] -= jdata[rows].mean(axis=0)
    return out


def sandwich_vcov(
    fit: WeightedGLMFit,
    strat: np.ndarray | None,
    clust: np.ndarray | None,
    constants: dict,
) -> np.ndarray:
    """Linearized (Taylor-series) survey vcov.

    ``strat``/``clust`` are the per-fitted-row stratum / cluster labels
    (None when the design lacks them). ``constants`` carries the
    full-design broadcast state computed once per SurveyDesignSpec:

    - ``has_strata`` / ``has_cluster`` / ``single_cluster``
    - ``clusters``: full-design cluster labels (cluster designs only)
    - ``strat_for_clust``: {cluster: stratum}
    - ``clust_per_strat``: {stratum: #clusters in full design}
    - ``rows_per_strat``: {stratum: #rows in full design} (no-cluster)
    - ``fpc_for_clust``: {cluster: sampling fraction} or
      ``fpc_for_strat``: {stratum: fraction} (no-cluster designs)

    Mirrors the reference exactly, including the subtle part: clusters
    present in the FULL design but absent from this fit (complete-case /
    subset drops) appear as zero rows — they shift stratum means and add
    their own centered contribution (reference survey_model.py:105-168,
    where the pandas categorical groupby keeps empty categories).
    """
    has_strata = constants["has_strata"]
    has_cluster = constants["has_cluster"]
    single_cluster = constants["single_cluster"]
    score = fit.score
    p = score.shape[1]

    if has_cluster:
        clusters = constants["clusters"]
        cl_index = {c: i for i, c in enumerate(clusters)}
        jdata = np.zeros((len(clusters), p))
        idx = np.fromiter((cl_index[c] for c in clust), dtype=int, count=len(clust))
        np.add.at(jdata, idx, score)
        j_strat = np.asarray([constants["strat_for_clust"][c] for c in clusters], dtype=object)
        nh = np.asarray(
            [constants["clust_per_strat"][s] for s in j_strat], dtype=float
        )
        fpc = np.asarray([constants["fpc_for_clust"].get(c, 0.0) for c in clusters], dtype=float)
    else:
        # Clusters default to one per observation (reference
        # survey_design.py:195-198): cluster sums are the score rows, and
        # full-design rows missing from this fit are zero rows. We avoid
        # materializing a per-row cluster list by appending one zero row
        # per (stratum, #missing) group — identical contribution.
        if has_strata:
            present_per_strat: dict = {}
            for s in strat:
                present_per_strat[s] = present_per_strat.get(s, 0) + 1
            extra_strata = []
            extra_counts = []
            for s, n_full in constants["rows_per_strat"].items():
                missing = n_full - present_per_strat.get(s, 0)
                if missing > 0:
                    extra_strata.append(s)
                    extra_counts.append(missing)
            jdata = score.copy()
            j_strat = np.asarray(list(strat), dtype=object)
            # zero rows, each repeated `missing` times — keep them
            # compressed: expand only per-stratum when centering.
            if extra_strata:
                zero_block = np.zeros((int(sum(extra_counts)), p))
                jdata = np.vstack([jdata, zero_block])
                j_strat = np.concatenate(
                    [j_strat, np.repeat(np.asarray(extra_strata, dtype=object), extra_counts)]
                )
            nh = np.asarray([constants["rows_per_strat"][s] for s in j_strat], dtype=float)
            fpc_map = constants.get("fpc_for_strat", {})
            fpc = np.asarray([fpc_map.get(s, 0.0) for s in j_strat], dtype=float)
        else:
            # weights-only design: every observation its own cluster in a
            # single stratum; absent rows are zero rows with no centering
            # → contribute nothing.
            jdata = score.copy()
            j_strat = None
            n_full = constants["rows_per_strat"]["__all__"]
            nh = np.full(len(jdata), float(n_full))
            fpc_map = constants.get("fpc_for_strat", {})
            fpc = np.full(len(jdata), float(fpc_map.get("__all__", 0.0)))

    if has_strata:
        pop_mean = score.mean(axis=0)
        jdata = _center_strata(jdata, j_strat, single_cluster, pop_mean)
        if single_cluster == "average":
            # design-level counts (reference survey_model.py:146-148 uses
            # design.n_strat): a stratum dropping entirely from this
            # variable's complete cases must not change the scale factor
            n_single = sum(1 for v in constants["clust_per_strat"].values() if v == 1)
            n_strat = len(constants["clust_per_strat"])
            jdata = jdata * np.sqrt(n_strat / (n_strat - n_single))

    with np.errstate(divide="ignore", invalid="ignore"):
        mh = np.sqrt(nh / (nh - 1.0))
    mh[~np.isfinite(mh)] = 1.0
    fh = np.sqrt(1.0 - fpc)
    jdata = jdata * (fh * mh)[:, None]

    v_hat = jdata.T @ jdata
    return fit.a_inv @ v_hat @ fit.a_inv.T


def jackknife_vcov(
    X: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    family: str,
    fit: WeightedGLMFit,
    strat: np.ndarray | None,
    clust: np.ndarray | None,
    constants: dict,
) -> np.ndarray:
    """Delete-1-cluster jackknife vcov (reference survey_model.py:174-208;
    replicate weights survey_design.py:699-721). The reference implements
    this estimator but its ``fit`` always uses linearization — we expose
    it through ``association_study(vcov_method="jackknife")``.

    Per full-design cluster ``c`` in stratum ``s`` with ``nh`` clusters:
    replicate weights scale stratum-``s`` rows by ``nh/(nh-1)`` and zero
    cluster-``c`` rows; refit; center replicates on the full-fit params
    (reference ``center_by="est"`` default); scale each replicate by
    ``sqrt((nh-1)/nh) * sqrt(1-fpc_c)``; vcov = sum of outer products.

    Cluster designs only: without clusters the reference's default
    one-cluster-per-row design degenerates to n refits. Cost is
    O(#clusters) refits per variable — #clusters is small (sampling-frame
    PSUs, e.g. ~60 for NHANES), and each refit reuses the in-kernel
    numpy design matrix, so this stays executor-local and bounded.
    Single-cluster strata (nh==1) skip the weight rescale; their
    ``sqrt((nh-1)/nh)=0`` factor zeroes the replicate's contribution."""
    if not constants["has_cluster"]:
        raise ValueError("jackknife vcov requires a cluster design")
    clusters = constants["clusters"]
    strat_for_clust = constants["strat_for_clust"]
    clust_per_strat = constants["clust_per_strat"]
    fpc_for_clust = constants.get("fpc_for_clust", {})
    clust_arr = np.asarray(list(clust), dtype=object)
    strat_arr = (
        np.asarray(list(strat), dtype=object) if strat is not None else None
    )
    p = len(fit.params)
    reps = np.zeros((len(clusters), p))
    for i, c in enumerate(clusters):
        s = strat_for_clust[c]
        nh = float(clust_per_strat[s])
        wrep = np.asarray(w, dtype=float).copy()
        if nh > 1.0:
            if strat_arr is not None:
                in_stratum = np.fromiter(
                    (x == s for x in strat_arr), dtype=bool, count=len(strat_arr)
                )
            else:
                in_stratum = np.ones(len(wrep), dtype=bool)
            wrep[in_stratum] *= nh / (nh - 1.0)
        in_clust = np.fromiter(
            (x == c for x in clust_arr), dtype=bool, count=len(clust_arr)
        )
        wrep[in_clust] = 0.0
        rep_fit = fit_weighted_glm(X, y, wrep, family)
        if not rep_fit.converged:
            # a non-converged replicate (e.g. separation after zeroing a
            # cluster) would silently pollute the variance — fall back to
            # the linearized sandwich for this variable instead
            return sandwich_vcov(fit, strat, clust, constants)
        reps[i] = rep_fit.params
    reps = reps - fit.params[None, :]
    nh_vec = np.asarray(
        [float(clust_per_strat[strat_for_clust[c]]) for c in clusters], dtype=float
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        mh = np.sqrt((nh_vec - 1.0) / nh_vec)
    mh[~np.isfinite(mh)] = 1.0
    fh = np.sqrt(
        1.0 - np.asarray([fpc_for_clust.get(c, 0.0) for c in clusters], dtype=float)
    )
    reps = reps * (mh * fh)[:, None]
    return reps.T @ reps


def survey_dof(
    has_strata: bool,
    has_cluster: bool,
    strat: np.ndarray | None,
    clust: np.ndarray | None,
    n_rows: int,
    n_params: int,
) -> float:
    """Survey degrees of freedom (reference survey_design.py:723-745):
    counts of strata/clusters OBSERVED in the fitted rows."""
    if has_cluster and has_strata:
        return len(set(clust)) - len(set(strat)) - (n_params - 1)
    if has_cluster:
        return len(set(clust)) - 1 - (n_params - 1)
    if has_strata:
        return n_rows - len(set(strat)) - (n_params - 1)
    return n_rows - n_params - 1


# ---------------------------------------------------------------------------
# Lumley-Scott working LRT (reference clarite/internal/calculations.py)
# ---------------------------------------------------------------------------


def _brentq(f, a: float, b: float, xtol: float = 1e-12, max_iter: int = 200) -> float:
    """Root of f on [a, b] (f(a), f(b) must differ in sign) — classic
    Brent's method, standing in for scipy.optimize.brentq."""
    fa, fb = f(a), f(b)
    if fa == 0:
        return a
    if fb == 0:
        return b
    if np.sign(fa) == np.sign(fb):
        raise ValueError("f(a) and f(b) must have different signs")
    c, fc = a, fa
    d = e = b - a
    for _ in range(max_iter):
        if np.sign(fb) == np.sign(fc):
            c, fc = a, fa
            d = e = b - a
        if abs(fc) < abs(fb):
            a, b, c = b, c, b
            fa, fb, fc = fb, fc, fb
        tol1 = 2.0 * np.finfo(float).eps * abs(b) + 0.5 * xtol
        xm = 0.5 * (c - b)
        if abs(xm) <= tol1 or fb == 0.0:
            return b
        if abs(e) >= tol1 and abs(fa) > abs(fb):
            s = fb / fa
            if a == c:
                pq = (2.0 * xm * s, 1.0 - s)
            else:
                q, r = fa / fc, fb / fc
                pq = (
                    s * (2.0 * xm * q * (q - r) - (b - a) * (r - 1.0)),
                    (q - 1.0) * (r - 1.0) * (s - 1.0),
                )
            pp, qq = pq
            if pp > 0:
                qq = -qq
            pp = abs(pp)
            if 2.0 * pp < min(3.0 * xm * qq - abs(tol1 * qq), abs(e * qq)):
                e, d = d, pp / qq
            else:
                d = e = xm
        else:
            d = e = xm
        a, fa = b, fb
        b = b + (d if abs(d) > tol1 else tol1 * np.sign(xm))
        fb = f(b)
    return b


def _saddle(x: float, lam: np.ndarray) -> float:
    """Saddlepoint approximation to P(sum lam_i chi^2_1 > x)
    (reference calculations.py:51-86; Kuonen 1999 Biometrika)."""
    d = float(np.max(lam))
    lam = lam / d
    x = x / d

    def k0(z):
        return -float(np.sum(np.log(1.0 - 2.0 * z * lam))) / 2.0

    def kprime0(z):
        return float(np.sum(lam / (1.0 - 2.0 * z * lam)))

    def kpprime0(z):
        return 2.0 * float(np.sum(lam**2 / (1.0 - 2.0 * z * lam) ** 2))

    if np.any(lam < 0):
        lam_min = float((1.0 / (2.0 * lam[lam < 0])).max()) * 0.99999
    elif x > float(lam.sum()):
        lam_min = -0.01
    else:
        lam_min = -float(len(lam)) / (2.0 * x)
    lam_max = float((1.0 / (2.0 * lam[lam > 0])).min()) * 0.99999

    hatzeta = _brentq(lambda z: kprime0(z) - x, lam_min, lam_max)
    sign = 1.0 if hatzeta > 0 else -1.0
    w = sign * np.sqrt(max(2.0 * (hatzeta * x - k0(hatzeta)), 0.0))
    v = hatzeta * np.sqrt(kpprime0(hatzeta))
    if abs(hatzeta) < 1e-4 or w == 0.0:
        return float("nan")
    return float(norm_sf(w + np.log(v / w) / w))


def _pfsum(x: float, a: np.ndarray, ddf: float) -> float:
    """P-value for a weighted sum of chi-square(1) variables: Satterthwaite
    F reference, replaced by the saddlepoint value when it exists
    (reference calculations.py:31-48)."""
    tr = float(a.mean())
    tr2 = float((a**2).mean()) / tr**2
    scale = tr * tr2
    ndf = len(a) / tr2
    rval = float(f_sf(x / ndf / scale, ndf, ddf))

    lam = np.append(a, -x / ddf)
    reps = np.ones(len(lam), dtype=int)
    reps[-1] = max(int(round(ddf)), 1)
    lam = np.repeat(lam, reps)
    try:
        s = _saddle(x=0.0, lam=lam)
    except ValueError:
        s = float("nan")
    if not np.isnan(s):
        rval = s
    return rval


def regterm_pvalue(
    chisq: float,
    vcov_full: np.ndarray,
    names_full: list[str],
    a_inv_full: np.ndarray,
    var_name: str,
    ddf: float,
) -> float:
    """Working-LRT p-value for the term ``var_name`` (all its dummy
    columns) — limited adaptation of R survey's regTermTest as in the
    reference (calculations.py:10-28). ``chisq`` is the deviance gap
    restricted-minus-full; the misspecification eigenvalues come from
    ``pinv(V0) @ V`` over the term's parameter block."""
    idx = [
        i
        for i, n in enumerate(names_full)
        if n == var_name or n.startswith(f"{var_name}[T.")
    ]
    if not idx:
        raise ValueError(f"no parameters found for term {var_name!r}")
    v = vcov_full[np.ix_(idx, idx)]
    v0 = a_inv_full[np.ix_(idx, idx)]
    misspec = np.linalg.eig(np.linalg.pinv(v0) @ v)[0]
    misspec = np.real(misspec)
    return _pfsum(float(chisq), misspec, float(ddf))
