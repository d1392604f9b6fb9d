"""GLM kernel vs closed-form OLS / known logistic results, and vs DuckDB's
regr_* aggregates as an independent engine."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from clarite_python_spark.functions.glm import dummy_encode, fit_glm


def test_gaussian_matches_closed_form_simple_regression():
    rng = np.random.RandomState(0)
    n = 500
    x = rng.randn(n)
    y = 2.0 + 3.0 * x + rng.randn(n)
    X = np.column_stack([np.ones(n), x])
    res = fit_glm(X, y, ["Intercept", "x"], "gaussian")
    # closed form
    sxx = np.sum((x - x.mean()) ** 2)
    beta = np.sum((x - x.mean()) * (y - y.mean())) / sxx
    assert res.params[1] == pytest.approx(beta, rel=1e-12)
    resid = y - X @ np.linalg.lstsq(X, y, rcond=None)[0]
    s2 = resid @ resid / (n - 2)
    assert res.bse[1] == pytest.approx(np.sqrt(s2 / sxx), rel=1e-10)
    assert res.converged


def test_gaussian_matches_duckdb_regr():
    rng = np.random.RandomState(1)
    n = 1000
    x = rng.rand(n) * 10
    y = 1.0 + 0.5 * x + rng.randn(n)
    pdf = pd.DataFrame({"x": x, "y": y})
    con = duckdb.connect()
    con.register("t", pdf)
    slope, icept = con.execute("select regr_slope(y,x), regr_intercept(y,x) from t").fetchone()
    X = np.column_stack([np.ones(n), x])
    res = fit_glm(X, y, ["Intercept", "x"], "gaussian")
    assert res.params[1] == pytest.approx(slope, rel=1e-9)
    assert res.params[0] == pytest.approx(icept, rel=1e-9)


def test_gaussian_t_pvalues():
    # null covariate should have uniform-ish pvalue; strong effect ~0
    rng = np.random.RandomState(2)
    n = 300
    x = rng.randn(n)
    y = 5.0 + 0.0 * x + rng.randn(n)
    X = np.column_stack([np.ones(n), x])
    res = fit_glm(X, y, ["Intercept", "x"], "gaussian")
    assert res.pvalues[1] > 0.01
    y2 = 5.0 + 1.0 * x + rng.randn(n)
    res2 = fit_glm(X, y2, ["Intercept", "x"], "gaussian")
    assert res2.pvalues[1] < 1e-10


def test_binomial_recovers_known_coefficients():
    rng = np.random.RandomState(3)
    n = 20000
    x = rng.randn(n)
    eta = -0.5 + 1.2 * x
    p = 1 / (1 + np.exp(-eta))
    y = (rng.rand(n) < p).astype(float)
    X = np.column_stack([np.ones(n), x])
    res = fit_glm(X, y, ["Intercept", "x"], "binomial")
    assert res.converged
    assert res.params[0] == pytest.approx(-0.5, abs=0.06)
    assert res.params[1] == pytest.approx(1.2, abs=0.06)
    # llf/aic sanity
    assert res.aic == pytest.approx(-2 * res.llf + 4.0)


def test_binomial_2x2_closed_form():
    # For a 2x2 table the logit coefficient is the log odds ratio and
    # SE = sqrt(sum of 1/cell counts)
    a, b, c, d = 40, 60, 25, 75  # x=1:(y=1 a, y=0 b), x=0:(y=1 c, y=0 d)
    x = np.array([1.0] * (a + b) + [0.0] * (c + d))
    y = np.array([1.0] * a + [0.0] * b + [1.0] * c + [0.0] * d)
    X = np.column_stack([np.ones(len(x)), x])
    res = fit_glm(X, y, ["Intercept", "x"], "binomial")
    log_or = np.log((a * d) / (b * c))
    se = np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert res.params[1] == pytest.approx(log_or, rel=1e-6)
    assert res.bse[1] == pytest.approx(se, rel=1e-6)


def test_gaussian_llf_aic_ols_convention():
    # For nested Gaussian models fitted at their own estimated scales,
    # adding a pure-noise regressor should change llf only slightly
    rng = np.random.RandomState(4)
    n = 200
    x = rng.randn(n)
    z = rng.randn(n)
    y = 1.0 + 2.0 * x + rng.randn(n)
    Xr = np.column_stack([np.ones(n), x])
    Xf = np.column_stack([np.ones(n), x, z])
    r = fit_glm(Xr, y, ["i", "x"], "gaussian")
    f = fit_glm(Xf, y, ["i", "x", "z"], "gaussian")
    lrstat = -2 * (r.llf - f.llf)
    assert lrstat >= -1e-8
    assert lrstat < 10.0  # pure noise: should be small


def test_dummy_encode():
    vals = np.array(["a", "b", "c", "a"], dtype=object)
    mat, names = dummy_encode(vals, ["a", "b", "c"], "v")
    assert names == ["v[T.b]", "v[T.c]"]
    np.testing.assert_array_equal(mat[:, 0], [0, 1, 0, 0])
    np.testing.assert_array_equal(mat[:, 1], [0, 0, 1, 0])
