"""Reference-semantics edge cases for the analyze fan-out."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from clarite_python_spark.catalog import ClariteFrame, VariableCatalog
from clarite_python_spark.operators import analyze


def test_min_n_failure_produces_nan_row(ewas_cf):
    """Variables failing the min_n gate yield the default all-NaN row
    (reference glm_regression.py:474-479, error path :560-565)."""
    res = (
        analyze.association_study(
            ewas_cf, outcomes="outcome", covariates=["age"], min_n=10**6
        )
        .toPandas()
        .set_index("Variable")
    )
    assert len(res) > 0
    assert (~res.Converged.astype(bool)).all()
    assert res.Beta.isna().all() and res.pvalue.isna().all()


def test_multiple_outcomes_concat(ewas_cf):
    res = analyze.association_study(
        ewas_cf,
        outcomes=["outcome", "outcome_bin"],
        covariates=["age", "sex"],
        regression_variables=["signal", "noise1"],
        min_n=50,
    ).toPandas()
    assert set(res.Outcome) == {"outcome", "outcome_bin"}
    assert len(res) == 4
    # sorted by pvalue ascending, nulls last
    pv = res.pvalue.to_numpy()
    assert all(
        (np.isnan(pv[i + 1])) or pv[i] <= pv[i + 1] for i in range(len(pv) - 1)
    )


def test_constant_rv_skipped(spark):
    pdf = pd.DataFrame(
        {
            "ID": range(300),
            "y": np.random.RandomState(0).randn(300),
            "x": np.random.RandomState(1).randn(300),
            "const": 1.0,
        }
    )
    cat = VariableCatalog(
        types={"y": "continuous", "x": "continuous", "const": "constant"}
    )
    cf = ClariteFrame(spark.createDataFrame(pdf), cat)
    with pytest.warns(UserWarning, match="constant/unknown"):
        res = analyze.association_study(cf, outcomes="y", min_n=50).toPandas()
    assert set(res.Variable) == {"x"}


def test_outcome_with_nas(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "ID": range(500),
            "y": [float(v) if i % 5 else None for i, v in enumerate(rng.randn(500))],
            "x": rng.randn(500),
        }
    )
    cat = VariableCatalog(types={"y": "continuous", "x": "continuous"})
    cf = ClariteFrame(spark.createDataFrame(pdf), cat)
    res = analyze.association_study(cf, outcomes="y", min_n=50).toPandas()
    assert res.N.iloc[0] == 400  # complete cases only


def test_nonvarying_covariate_dropped_not_fatal(spark):
    rng = np.random.RandomState(4)
    x = rng.randn(400)
    pdf = pd.DataFrame(
        {
            "ID": range(400),
            "y": 2.0 * x + rng.randn(400),
            "x": x,
            "flat": 7.0,
        }
    )
    cat = VariableCatalog(
        types={"y": "continuous", "x": "continuous", "flat": "continuous"}
    )
    cf = ClariteFrame(spark.createDataFrame(pdf), cat)
    res = (
        analyze.association_study(
            cf, outcomes="y", covariates=["flat"], regression_variables=["x"], min_n=50
        )
        .toPandas()
        .set_index("Variable")
    )
    # the constant covariate is ignored (reference warns + drops it)
    assert bool(res.loc["x", "Converged"])
    assert res.loc["x", "Beta"] == pytest.approx(2.0, abs=0.2)


def test_suffstats_matches_kernel_exactly(ewas_cf):
    """The sufficient-stats path and the grouped kernel are the same OLS:
    results agree to near machine precision."""
    fast = (
        analyze.association_study(
            ewas_cf, outcomes="outcome", covariates=["age", "sex"], min_n=50
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )
    slow = (
        analyze.association_study(
            ewas_cf,
            outcomes="outcome",
            covariates=["age", "sex"],
            min_n=50,
            use_sufficient_stats=False,
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )
    for col in ("Beta", "SE", "pvalue", "LRT_pvalue", "Diff_AIC"):
        a, b = fast[col].astype(float), slow[col].astype(float)
        mask = ~(a.isna() & b.isna())
        assert np.allclose(a[mask], b[mask], rtol=1e-9, atol=1e-12), col
    assert list(fast.N) == list(slow.N)
    assert list(fast.Variable_type) == list(slow.Variable_type)


def test_encoded_suffstats_categorical_betas_matches_kernel(ewas_cf):
    """report_categorical_betas through the encoded sufficient-stats path
    equals the grouped kernel row-for-row (Category naming included)."""
    kw = dict(
        outcomes="outcome",
        covariates=["age", "sex"],
        min_n=50,
        report_categorical_betas=True,
    )
    fast = (
        analyze.association_study(ewas_cf, **kw)
        .toPandas()
        .set_index(["Variable", "Category"])
        .sort_index()
    )
    slow = (
        analyze.association_study(ewas_cf, use_sufficient_stats=False, **kw)
        .toPandas()
        .set_index(["Variable", "Category"])
        .sort_index()
    )
    assert list(fast.index) == list(slow.index)
    for col in ("Beta", "SE", "Beta_pvalue", "LRT_pvalue", "Diff_AIC", "pvalue"):
        a, b = fast[col].astype(float), slow[col].astype(float)
        mask = ~(a.isna() & b.isna())
        assert np.allclose(a[mask], b[mask], rtol=1e-9, atol=1e-12), col


def test_interaction_suffstats_matches_kernel(ewas_cf):
    """Continuous-pair interaction via sufficient stats equals the
    grouped kernel (same OLS + LRT)."""
    kw = dict(
        outcomes="outcome",
        covariates=["age"],
        interactions=[("signal", "noise1"), ("noise1", "noise2")],
        min_n=50,
        report_betas=True,
    )
    fast = (
        analyze.interaction_study(ewas_cf, **kw)
        .toPandas()
        .set_index(["Term1", "Term2"])
        .sort_index()
    )
    slow = (
        analyze.interaction_study(ewas_cf, use_sufficient_stats=False, **kw)
        .toPandas()
        .set_index(["Term1", "Term2"])
        .sort_index()
    )
    assert list(fast.index) == list(slow.index)
    for col in (
        "LRT_pvalue",
        "Full_Var1_Var2_beta",
        "Full_Var1_Var2_SE",
        "Full_Var1_Var2_Pval",
        "Red_Var1_beta",
        "Full_Var2_Pval",
    ):
        a, b = fast[col].astype(float), slow[col].astype(float)
        mask = ~(a.isna() & b.isna())
        assert np.allclose(a[mask], b[mask], rtol=1e-8, atol=1e-12), col
    assert list(fast.N) == list(slow.N)
