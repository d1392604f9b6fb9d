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


def test_columnar_no_per_variable_distinct_jobs(ewas_cf, monkeypatch):
    """Level discovery must ride the single batched agg
    (_prefetch_fit_stats), not per-variable distinct() driver
    round-trips (VERDICT r1 item 3)."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError("columnar strategy called DataFrame.distinct()")

    monkeypatch.setattr(DataFrame, "distinct", _boom)
    c = _run(ewas_cf, "columnar")
    assert len(c) > 0


def test_prefetch_fit_stats_matches_per_subset(ewas_cf):
    """Batched mask-conditional stats == what a per-variable na.drop()
    subset computes (N and complete-case category levels)."""
    from clarite_python_spark.catalog import qcol
    from clarite_python_spark.operators.analyze_columnar import _prefetch_fit_stats

    df = ewas_cf.df
    types = ewas_cf.catalog.types
    covs = ["age", "sex"]
    rvs = [c for c in types if c not in ("outcome", "outcome_bin", *covs)]
    ns, levels = _prefetch_fit_stats(
        df, rvs, types, "outcome", covs, types, batch_size=3
    )
    for rv in rvs:
        sub = df.select(
            *[qcol(c).alias(c) for c in ("outcome", rv, *covs)]
        ).na.drop()
        assert ns[rv] == sub.count(), rv
        for c, got in levels[rv].items():
            exp = sorted(
                r[0] for r in sub.select(qcol(c).cast("string")).distinct().collect()
            )
            assert sorted(got) == exp, (rv, c)


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
