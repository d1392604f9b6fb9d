"""Columnar (distributed ML-GLM) strategy must agree with the grouped
pandas-kernel strategy — same GLM, two physical plans
(SURVEY.md §7 risk #4)."""

from __future__ import annotations

import numpy as np
import pytest

from clarite_python_spark.operators import analyze


def _run(cf, strategy, outcome="outcome", covariates=("age", "sex")):
    return (
        analyze.association_study(
            cf,
            outcomes=outcome,
            covariates=list(covariates),
            min_n=50,
            strategy=strategy,
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )


def test_columnar_matches_grouped_gaussian(ewas_cf):
    g = _run(ewas_cf, "grouped")
    c = _run(ewas_cf, "columnar")
    assert list(g.index) == list(c.index)
    assert list(g.N) == list(c.N)
    for col in ("Beta", "SE", "Beta_pvalue", "pvalue", "LRT_pvalue"):
        a, b = g[col].astype(float), c[col].astype(float)
        mask = ~(a.isna() & b.isna())
        assert np.allclose(a[mask], b[mask], rtol=1e-5, atol=1e-12), col


def test_columnar_matches_grouped_binomial(ewas_cf):
    g = _run(ewas_cf, "grouped", outcome="outcome_bin")
    c = _run(ewas_cf, "columnar", outcome="outcome_bin")
    for col in ("Beta", "SE", "pvalue"):
        a, b = g[col].astype(float), c[col].astype(float)
        mask = ~(a.isna() & b.isna())
        assert np.allclose(a[mask], b[mask], rtol=1e-4, atol=1e-10), col


def test_columnar_rejects_survey(ewas_cf):
    with pytest.raises(ValueError, match="columnar"):
        analyze.association_study(
            ewas_cf,
            outcomes="outcome",
            strategy="columnar",
            survey_design_spec=object(),
        )


def test_unknown_strategy(ewas_cf):
    with pytest.raises(ValueError, match="strategy"):
        analyze.association_study(ewas_cf, outcomes="outcome", strategy="bogus")
