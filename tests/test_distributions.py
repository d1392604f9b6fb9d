"""Distribution functions vs closed-form special cases + known table values.

No scipy in this environment, so correctness is anchored on:
- exact closed forms (chi2 with df=2 is Exp(1/2); t with df=1 is Cauchy;
  t with df=2 has an algebraic CDF; F(1, d) == t(d)^2),
- classic critical values (hard-coded to 6+ digits from standard tables).
"""

import math

import numpy as np
import pytest

from clarite_python_spark.functions.distributions import (
    chi2_sf,
    f_sf,
    norm_sf,
    skewtest_z_p,
    t_sf,
)


def test_norm_sf_known_values():
    assert float(norm_sf(0.0)) == pytest.approx(0.5)
    assert float(norm_sf(1.959963984540054)) == pytest.approx(0.025, rel=1e-10)
    assert float(norm_sf(-1.0)) == pytest.approx(1 - 0.15865525393145707, rel=1e-10)


def test_chi2_sf_exponential_closed_form():
    # chi2 with df=2: sf(x) = exp(-x/2)
    for x in [0.1, 1.0, 3.84, 10.0, 50.0]:
        assert float(chi2_sf(x, 2)) == pytest.approx(math.exp(-x / 2), rel=1e-10)


def test_chi2_sf_critical_values():
    assert float(chi2_sf(3.841458820694124, 1)) == pytest.approx(0.05, rel=1e-9)
    assert float(chi2_sf(5.991464547107979, 2)) == pytest.approx(0.05, rel=1e-9)
    assert float(chi2_sf(18.307038053275146, 10)) == pytest.approx(0.05, rel=1e-8)


def test_t_sf_cauchy_closed_form():
    # t with df=1 is standard Cauchy: sf(t) = 1/2 - atan(t)/pi
    for t in [-3.0, -0.5, 0.0, 0.5, 2.0, 10.0]:
        assert float(t_sf(t, 1)) == pytest.approx(0.5 - math.atan(t) / math.pi, rel=1e-9)


def test_t_sf_df2_closed_form():
    # t with df=2: sf(t) = 1/2 - t / (2*sqrt(2 + t^2))
    for t in [-2.0, 0.3, 1.0, 4.0]:
        assert float(t_sf(t, 2)) == pytest.approx(0.5 - t / (2 * math.sqrt(2 + t * t)), rel=1e-9)


def test_t_sf_large_df_approaches_normal():
    assert float(t_sf(1.96, 100000)) == pytest.approx(float(norm_sf(1.96)), rel=1e-3)


def test_f_sf_equals_squared_t():
    # F(1, d) sf at t^2 == two-sided t sf at |t|
    for t, d in [(2.0, 10), (1.3, 5), (3.7, 30)]:
        assert float(f_sf(t * t, 1, d)) == pytest.approx(2 * float(t_sf(t, d)), rel=1e-9)


def test_t_sf_critical_value():
    # t_{0.025, 10} = 2.2281388519649385
    assert float(t_sf(2.2281388519649385, 10)) == pytest.approx(0.025, rel=1e-9)


def test_skewtest_matches_scipy_reference_values():
    # antisymmetry (scipy guards y==0 -> 1, so skip exactly-zero skew)
    z_pos, _ = skewtest_z_p(0.7, 150)
    z_neg, _ = skewtest_z_p(-0.7, 150)
    assert z_pos == pytest.approx(-z_neg, rel=1e-12)
    # monotonicity: bigger skew -> bigger |z|, smaller p
    z1, p1 = skewtest_z_p(0.5, 100)
    z2, p2 = skewtest_z_p(1.0, 100)
    assert abs(z2) > abs(z1) and p2 < p1 < 1.0
    # sample-size consistency: same g1, more data -> stronger evidence
    _, p_small = skewtest_z_p(0.5, 50)
    _, p_big = skewtest_z_p(0.5, 5000)
    assert p_big < p_small


def test_vectorized():
    out = chi2_sf(np.array([1.0, 2.0, 3.0]), np.array([1, 2, 3]))
    assert out.shape == (3,)
    assert np.all((out > 0) & (out < 1))
