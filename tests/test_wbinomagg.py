"""Survey-weighted binomial sufficient-stats path (functions/wbinomagg.py):
must route for discrete-domain variables under cluster designs and match
the grouped kernel's numbers exactly (same IRLS iterates, same sandwich)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from clarite_python_spark.operators import analyze, modify
from clarite_python_spark.sources.io import from_csv
from clarite_python_spark.survey import SurveyDesignSpec

DATA = "/root/reference/tests/test_data_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference golden data not available"
)


@pytest.fixture(scope="module")
def nhanes_cf(spark):
    cf = from_csv(spark, f"{DATA}/nhanes_data.csv", index_col=None)
    cf = modify.make_binary(cf, only=["HI_CHOL", "RIAGENDR"])
    cf = modify.make_categorical(cf, only=["race", "agecat"])
    return cf


def _design(cf):
    return SurveyDesignSpec(
        cf.df,
        weights="WTMEC2YR",
        cluster="SDMVPSU",
        strata="SDMVSTRA",
        fpc=None,
        nest=True,
    )


def _study(cf, use_sufficient_stats):
    return (
        analyze.association_study(
            data=modify.colfilter(cf, only=["HI_CHOL", "RIAGENDR", "race", "agecat"]),
            outcomes="HI_CHOL",
            covariates=["agecat", "RIAGENDR"],
            survey_design_spec=_design(cf),
            use_sufficient_stats=use_sufficient_stats,
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )


def test_suffstats_matches_grouped_kernel_exactly(nhanes_cf):
    """Binary (RIAGENDR-style) and categorical (race) variables through the
    cell path must reproduce the row-level kernel at near machine
    precision — identical IRLS iterates, identical sandwich."""
    fast = _study(nhanes_cf, True)
    slow = _study(nhanes_cf, False)
    assert list(fast.index) == list(slow.index)
    assert list(fast["Variable_type"]) == list(slow["Variable_type"])
    assert list(fast["N"]) == list(slow["N"])
    assert list(fast["Weight"]) == list(slow["Weight"])
    for col in ("Beta", "SE", "Beta_pvalue", "LRT_pvalue", "pvalue"):
        a = fast[col].astype(float).to_numpy()
        b = slow[col].astype(float).to_numpy()
        both = ~(np.isnan(a) & np.isnan(b))
        np.testing.assert_allclose(a[both], b[both], rtol=1e-9, err_msg=col)


def test_suffstats_path_actually_routes(nhanes_cf, monkeypatch):
    """The dispatch must take the cell path for eligible studies (guards
    against the gate silently sending everything to the melt kernel)."""
    import clarite_python_spark.functions.wbinomagg as wb

    calls: list[list[str]] = []
    orig = wb.weighted_binomial_cells_rows

    def spy(df, outcome, rvs, *a, **kw):
        calls.append(list(rvs))
        return orig(df, outcome, rvs, *a, **kw)

    monkeypatch.setattr(wb, "weighted_binomial_cells_rows", spy)
    res = _study(nhanes_cf, True)
    assert calls and sorted(calls[0]) == ["race"]  # the one non-covariate RV
    assert res.loc["race", "Converged"]


def _study_design(cf, design, use_sufficient_stats):
    return (
        analyze.association_study(
            data=modify.colfilter(cf, only=["HI_CHOL", "RIAGENDR", "race", "agecat"]),
            outcomes="HI_CHOL",
            covariates=["agecat", "RIAGENDR"],
            survey_design_spec=design,
            use_sufficient_stats=use_sufficient_stats,
        )
        .toPandas()
        .set_index("Variable")
        .sort_index()
    )


@pytest.mark.parametrize(
    "design_kw",
    [
        dict(weights="WTMEC2YR"),  # weights-only: every obs its own cluster
        dict(weights="WTMEC2YR", strata="SDMVSTRA"),  # strata, no cluster
    ],
    ids=["weights_only", "strata_only"],
)
def test_no_cluster_designs_match_grouped_kernel(nhanes_cf, design_kw):
    """No-cluster sandwich needs per-observation score outer products —
    recovered exactly from the cells' second weight moment (sw2)."""
    design = SurveyDesignSpec(nhanes_cf.df, **design_kw)
    fast = _study_design(nhanes_cf, design, True)
    design2 = SurveyDesignSpec(nhanes_cf.df, **design_kw)
    slow = _study_design(nhanes_cf, design2, False)
    assert list(fast.index) == list(slow.index)
    assert list(fast["N"]) == list(slow["N"])
    for col in ("Beta", "SE", "Beta_pvalue", "LRT_pvalue", "pvalue"):
        a = fast[col].astype(float).to_numpy()
        b = slow[col].astype(float).to_numpy()
        both = ~(np.isnan(a) & np.isnan(b))
        np.testing.assert_allclose(a[both], b[both], rtol=1e-9, err_msg=col)


def test_jackknife_through_cell_path_matches_kernel(nhanes_cf):
    """Delete-1-cluster replicate weights are constant within a cell, so
    jackknife refits on cells reproduce the row-level replicates exactly."""

    def run(use_suffstats):
        return (
            analyze.association_study(
                data=modify.colfilter(
                    nhanes_cf, only=["HI_CHOL", "RIAGENDR", "race", "agecat"]
                ),
                outcomes="HI_CHOL",
                covariates=["agecat", "RIAGENDR"],
                survey_design_spec=_design(nhanes_cf),
                vcov_method="jackknife",
                use_sufficient_stats=use_suffstats,
            )
            .toPandas()
            .set_index("Variable")
            .sort_index()
        )

    fast, slow = run(True), run(False)
    for col in ("Beta", "SE", "pvalue"):
        a = fast[col].astype(float).to_numpy()
        b = slow[col].astype(float).to_numpy()
        both = ~(np.isnan(a) & np.isnan(b))
        np.testing.assert_allclose(a[both], b[both], rtol=1e-9, err_msg=col)
    # jackknife differs from the linearized sandwich (the categorical
    # LRT pvalue moves with the vcov) -> proves the replicate path ran
    stata = _study(nhanes_cf, True)
    assert not np.allclose(
        fast["pvalue"].astype(float), stata["pvalue"].astype(float), rtol=1e-6
    )


def test_report_categorical_betas_through_cell_path(nhanes_cf):
    fast = (
        analyze.association_study(
            data=modify.colfilter(
                nhanes_cf, only=["HI_CHOL", "RIAGENDR", "race", "agecat"]
            ),
            outcomes="HI_CHOL",
            covariates=["agecat", "RIAGENDR"],
            survey_design_spec=_design(nhanes_cf),
            report_categorical_betas=True,
            use_sufficient_stats=True,
        )
        .toPandas()
    )
    slow = (
        analyze.association_study(
            data=modify.colfilter(
                nhanes_cf, only=["HI_CHOL", "RIAGENDR", "race", "agecat"]
            ),
            outcomes="HI_CHOL",
            covariates=["agecat", "RIAGENDR"],
            survey_design_spec=_design(nhanes_cf),
            report_categorical_betas=True,
            use_sufficient_stats=False,
        )
        .toPandas()
    )
    key = ["Variable", "Category"]
    a = fast.sort_values(key).reset_index(drop=True)
    b = slow.sort_values(key).reset_index(drop=True)
    assert list(a["Category"]) == list(b["Category"])
    for col in ("Beta", "SE", "Beta_pvalue", "LRT_pvalue"):
        np.testing.assert_allclose(
            a[col].astype(float), b[col].astype(float), rtol=1e-9, err_msg=col
        )


def _wide_cf(spark, n_rows: int, n_levels: int):
    """Synthetic frame with a pathologically wide 'categorical' RV plus a
    well-behaved binary RV, and a deterministic cluster design."""
    from pyspark.sql import functions as F

    from clarite_python_spark.catalog import ClariteFrame

    # hash-scrambled columns so no cluster is perfectly balanced (a
    # perfectly symmetric design makes every sandwich SE exactly 0)
    df = spark.range(n_rows).select(
        F.col("id").alias("ID"),
        F.when(F.abs(F.hash("id")) % 2 == 0, "Case").otherwise("Control").alias("y"),
        (F.col("id") % n_levels).cast("string").alias("wide"),
        F.when(F.abs(F.hash("id", F.lit(7))) % 3 == 0, "a").otherwise("b").alias("narrow"),
        (F.abs(F.hash("id", F.lit(13))) % 4).cast("string").alias("clust"),
        F.lit(1.0).alias("wt"),
    )
    design = SurveyDesignSpec(
        df.select("ID", "clust", "wt"), cluster="clust", weights="wt"
    )
    cf = ClariteFrame(df.select("ID", "y", "wide", "narrow"))
    cf = modify.make_binary(cf, only=["y", "narrow"])
    cf = modify.make_categorical(cf, only=["wide"])
    return cf, design


def test_cell_precount_guard_no_driver_collect(spark, monkeypatch):
    """A 1.1e5-distinct 'categorical' must be routed to fallback by the
    executor-side pre-count (default max_cells gate) — the driver never
    collects its cell list.  The study is aborted right after the cell
    stage so the grouped-kernel fallback (which cannot fit 1e5 dummies)
    never runs; what's asserted is the guard's routing decision."""
    import clarite_python_spark.functions.wbinomagg as wb

    cf, design = _wide_cf(spark, 110_001, 110_001)
    captured: dict = {}
    orig = wb.weighted_binomial_cells_rows

    class _Abort(RuntimeError):
        pass

    def spy(*args, **kw):
        rows, fb = orig(*args, **kw)
        captured["rows"] = rows
        captured["fallback"] = fb
        raise _Abort()

    monkeypatch.setattr(wb, "weighted_binomial_cells_rows", spy)
    with pytest.raises(_Abort):
        analyze.association_study(
            data=cf,
            outcomes="y",
            survey_design_spec=design,
            use_sufficient_stats=True,
        ).collect()
    assert captured["fallback"] == ["wide"]
    # the well-behaved variable stayed on the cell path and converged
    narrow = [r for r in captured["rows"] if r["Variable"] == "narrow"]
    assert len(narrow) == 1 and narrow[0]["Converged"]


def test_cell_precount_fallback_reaches_kernel(spark, monkeypatch):
    """End-to-end: a variable the guard rejects must still produce a
    converged result row via the grouped kernel."""
    import clarite_python_spark.functions.wbinomagg as wb

    cf, design = _wide_cf(spark, 600, 48)
    orig = wb.weighted_binomial_cells_rows

    def tight(*args, **kw):
        kw["max_cells"] = 32
        return orig(*args, **kw)

    monkeypatch.setattr(wb, "weighted_binomial_cells_rows", tight)
    res = (
        analyze.association_study(
            data=cf,
            outcomes="y",
            survey_design_spec=design,
            use_sufficient_stats=True,
        )
        .toPandas()
        .set_index("Variable")
    )
    assert bool(res.loc["wide", "Converged"])
    assert bool(res.loc["narrow", "Converged"])
