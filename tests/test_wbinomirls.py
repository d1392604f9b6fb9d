"""Distributed-IRLS path for survey-weighted logistic fits of CONTINUOUS
variables (functions/wbinomirls.py): must route when eligible and match
the grouped kernel's numbers (same iterates, same sandwich) on the
NHANES designs at rtol 1e-6 or better."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.catalog import ClariteFrame
from clarite_python_spark.operators import analyze, modify
from clarite_python_spark.sources.io import from_csv
from clarite_python_spark.survey import SurveyDesignSpec

DATA = "/root/reference/tests/test_data_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference golden data not available"
)


@pytest.fixture(scope="module")
def nhanes_cont_cf(spark):
    """NHANES frame extended with deterministic continuous RVs (the CSV
    has none): cont1 dense, cont2 with missingness."""
    cf = from_csv(spark, f"{DATA}/nhanes_data.csv", index_col=None)
    df = cf.df.withColumn(
        "cont1",
        (F.abs(F.hash(F.col("ID"))) % 1000).cast("double") / 100.0
        + F.expr("try_cast(RIAGENDR AS double)"),
    ).withColumn(
        "cont2",
        F.when(
            F.abs(F.hash(F.col("ID"), F.lit(3))) % 11 != 0,
            (F.abs(F.hash(F.col("ID"), F.lit(5))) % 500).cast("double") / 50.0,
        ),
    )
    out = ClariteFrame(df, catalog=cf.catalog)
    out = modify.make_binary(out, only=["HI_CHOL", "RIAGENDR"])
    out = modify.make_categorical(out, only=["race", "agecat"])
    out = modify.make_continuous(out, only=["cont1", "cont2"])
    return out


def _study(cf, design_kw, use_sufficient_stats, vcov_method="stata"):
    design = SurveyDesignSpec(cf.df, **design_kw)
    return (
        analyze.association_study(
            data=modify.colfilter(
                cf, only=["HI_CHOL", "RIAGENDR", "agecat", "cont1", "cont2"]
            ),
            outcomes="HI_CHOL",
            covariates=["agecat", "RIAGENDR"],
            survey_design_spec=design,
            use_sufficient_stats=use_sufficient_stats,
            vcov_method=vcov_method,
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )


DESIGNS = [
    pytest.param(
        dict(weights="WTMEC2YR", cluster="SDMVPSU", strata="SDMVSTRA", nest=True),
        id="cluster_strata",
    ),
    pytest.param(dict(weights="WTMEC2YR", strata="SDMVSTRA"), id="strata_only"),
    pytest.param(dict(weights="WTMEC2YR"), id="weights_only"),
]


@pytest.mark.parametrize("design_kw", DESIGNS)
def test_irls_path_matches_grouped_kernel(nhanes_cont_cf, design_kw):
    fast = _study(nhanes_cont_cf, design_kw, True)
    slow = _study(nhanes_cont_cf, design_kw, False)
    for rv in ("cont1", "cont2"):
        assert bool(fast.loc[rv, "Converged"]) and bool(slow.loc[rv, "Converged"])
        assert int(fast.loc[rv, "N"]) == int(slow.loc[rv, "N"])
        for col in ("Beta", "SE", "pvalue"):
            np.testing.assert_allclose(
                float(fast.loc[rv, col]),
                float(slow.loc[rv, col]),
                rtol=1e-6,
                err_msg=f"{rv}.{col}",
            )


def test_irls_path_actually_routes(nhanes_cont_cf, monkeypatch):
    """Continuous RVs must take the distributed IRLS path (guards against
    the gate silently melting them through the kernel)."""
    import clarite_python_spark.functions.wbinomirls as wi

    calls: list[list[str]] = []
    orig = wi.weighted_binomial_irls_rows

    def spy(df, outcome, rvs, *a, **kw):
        calls.append(list(rvs))
        return orig(df, outcome, rvs, *a, **kw)

    monkeypatch.setattr(wi, "weighted_binomial_irls_rows", spy)
    res = _study(
        nhanes_cont_cf,
        dict(weights="WTMEC2YR", cluster="SDMVPSU", strata="SDMVSTRA", nest=True),
        True,
    )
    assert calls and sorted(calls[0]) == ["cont1", "cont2"]
    assert bool(res.loc["cont1", "Converged"])


@pytest.mark.parametrize(
    "design_kw",
    [
        pytest.param(
            dict(weights="WTMEC2YR", cluster="SDMVPSU", strata="SDMVSTRA", nest=True),
            id="cluster_strata",
        ),
        pytest.param(dict(weights="WTMEC2YR", cluster="SDMVPSU"), id="cluster_only"),
    ],
)
def test_irls_jackknife_routes_and_matches_kernel(nhanes_cont_cf, design_kw, monkeypatch):
    """Round 6: vcov_method='jackknife' runs delete-1-cluster replicate
    IRLS fits batched through the suffstats scans (cluster designs) and
    must match the kernel's replicate refits — closes the last
    kernel-only fallback in SCALE.md."""
    import clarite_python_spark.functions.wbinomirls as wi

    calls: list[list[str]] = []
    orig = wi.weighted_binomial_irls_rows

    def spy(df, outcome, rvs, *a, **kw):
        calls.append(list(rvs))
        return orig(df, outcome, rvs, *a, **kw)

    monkeypatch.setattr(wi, "weighted_binomial_irls_rows", spy)
    fast = _study(nhanes_cont_cf, design_kw, True, vcov_method="jackknife")
    assert calls and sorted(calls[0]) == ["cont1", "cont2"]  # routed to IRLS
    slow = _study(nhanes_cont_cf, design_kw, False, vcov_method="jackknife")
    for rv in ("cont1", "cont2"):
        assert bool(fast.loc[rv, "Converged"]) and bool(slow.loc[rv, "Converged"])
        assert int(fast.loc[rv, "N"]) == int(slow.loc[rv, "N"])
        for col in ("Beta", "SE", "pvalue"):
            np.testing.assert_allclose(
                float(fast.loc[rv, col]),
                float(slow.loc[rv, col]),
                rtol=1e-6,
                err_msg=f"{rv}.{col}",
            )


def test_jackknife_unit_budget_falls_back_to_kernel(nhanes_cont_cf, monkeypatch):
    """Past JK_IRLS_MAX_UNITS (#rvs x #clusters replicate units), the
    jackknife routing must NOT take the chunked-IRLS engine (its scan
    count grows as ceil(units/256) x iterations) and instead fall back
    to the grouped kernel's one-scan in-pandas replicates — with the
    same numbers (the two engines are parity-tested above)."""
    import clarite_python_spark.functions.wbinomirls as wi
    from clarite_python_spark.operators import analyze as an

    calls: list[list[str]] = []
    orig = wi.weighted_binomial_irls_rows

    def spy(df, outcome, rvs, *a, **kw):
        calls.append(list(rvs))
        return orig(df, outcome, rvs, *a, **kw)

    monkeypatch.setattr(wi, "weighted_binomial_irls_rows", spy)
    monkeypatch.setattr(an, "JK_IRLS_MAX_UNITS", 1)
    design_kw = dict(weights="WTMEC2YR", cluster="SDMVPSU", strata="SDMVSTRA", nest=True)
    capped = _study(nhanes_cont_cf, design_kw, True, vcov_method="jackknife")
    assert not calls  # IRLS engine skipped under the budget
    monkeypatch.setattr(an, "JK_IRLS_MAX_UNITS", 4096)
    routed = _study(nhanes_cont_cf, design_kw, True, vcov_method="jackknife")
    assert calls  # and taken when the budget allows
    for rv in ("cont1", "cont2"):
        for col in ("Beta", "SE", "pvalue"):
            np.testing.assert_allclose(
                float(capped.loc[rv, col]),
                float(routed.loc[rv, col]),
                rtol=1e-6,
                err_msg=f"{rv}.{col}",
            )
