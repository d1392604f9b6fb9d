"""Plot-module tests: the Spark-side prep is the tested surface (the
container has no matplotlib; render functions must fail with a clear
ImportError)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from clarite_python_spark import plot
from clarite_python_spark.operators import analyze


@pytest.fixture(scope="module")
def result_df(spark, request):
    ewas_cf = request.getfixturevalue("ewas_cf")
    return analyze.association_study(
        ewas_cf, outcomes="outcome", covariates=["age", "sex"], min_n=50
    )


def test_manhattan_prep(result_df):
    prepped = plot.manhattan_prep(
        {"study": result_df}, categories={"signal": "exposure", "noise1": "noise"}
    ).toPandas()
    assert set(prepped.columns) >= {"dataset", "variable", "pvalue", "category", "neg_log_pvalue", "xpos"}
    assert (prepped.dataset == "study").all()
    # x positions are dense ranks over (category, variable): unique 1..n
    assert sorted(prepped.xpos) == list(range(1, len(prepped) + 1))
    sig = prepped[prepped.variable == "signal"].iloc[0]
    assert sig.category == "exposure"
    if sig.pvalue > 0:
        assert sig.neg_log_pvalue == pytest.approx(-np.log10(sig.pvalue))
    else:  # p underflowed to 0 -> -log10 undefined -> null, not inf
        assert np.isnan(sig.neg_log_pvalue)
    noise = prepped[prepped.variable == "noise1"].iloc[0]
    assert noise.neg_log_pvalue == pytest.approx(-np.log10(noise.pvalue))
    # unmapped variables fall into 'unknown'
    assert (prepped[prepped.variable == "noise2"].category == "unknown").all()


def test_manhattan_prep_multiple_datasets(result_df):
    prepped = plot.manhattan_prep({"a": result_df, "b": result_df}).toPandas()
    assert set(prepped.dataset) == {"a", "b"}
    assert len(prepped) == 2 * prepped.dataset.value_counts()["a"]


def test_top_results_prep(result_df):
    top = plot.top_results_prep(result_df, num_rows=2).toPandas()
    assert len(top) == 2
    full = result_df.toPandas().sort_values("pvalue")
    assert list(top.Variable) == list(full.Variable.head(2))


def test_top_results_prep_validates_pvalue_name(result_df):
    with pytest.raises(ValueError, match="pvalue_name"):
        plot.top_results_prep(result_df, pvalue_name="nope")


@pytest.mark.skipif(plot.plots.HAS_MPL, reason="matplotlib present")
def test_render_gated_without_matplotlib(result_df, ewas_cf):
    with pytest.raises(ImportError, match="matplotlib"):
        plot.manhattan({"study": result_df})
    with pytest.raises(ImportError, match="matplotlib"):
        plot.top_results(result_df)
    with pytest.raises(ImportError, match="matplotlib"):
        plot.histogram(ewas_cf, "age")
