"""Describe-operator contracts, checked against pandas as the local oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import describe, modify


@pytest.fixture(scope="module")
def cat_cf(mixed_cf):
    return modify.categorize(mixed_cf)


def test_percent_na(cat_cf):
    out = {r["variable"]: r["percent_na"] for r in describe.percent_na(cat_cf).collect()}
    assert out["cont1"] == pytest.approx(30 / 400 * 100)
    assert out["mostly_na"] == pytest.approx(390 / 400 * 100)
    assert out["bin1"] == 0.0


def test_freq_table(cat_cf, mixed_cf):
    rows = describe.freq_table(cat_cf).collect()
    pdf = mixed_cf.df.toPandas()
    b_counts = pdf["bin1"].value_counts()
    got = {(r["variable"], r["value"]): r["count"] for r in rows}
    assert got[("bin1", "a")] == b_counts["a"]
    assert got[("bin1", "b")] == b_counts["b"]
    # non-categorical columns produce one summary row
    assert got[("cont1", "<Non-Categorical Values>")] == 370


def test_get_types(cat_cf):
    got = {r["variable"]: r["type"] for r in describe.get_types(cat_cf).collect()}
    assert got["bin1"] == "binary" and got["cont1"] == "continuous"


def test_correlations_matches_pandas(cat_cf, mixed_cf):
    out = describe.correlations(cat_cf, threshold=0.0).toPandas()
    pdf = mixed_cf.df.toPandas()
    expected = pdf[["cont1", "cont2"]].corr().iloc[0, 1]
    row = out[(out.var1 == "cont1") & (out.var2 == "cont2")]
    assert len(row) == 1
    assert row.correlation.iloc[0] == pytest.approx(expected, rel=1e-9)


def test_skewness_matches_moment_formula(cat_cf, mixed_cf):
    out = describe.skewness(cat_cf).toPandas().set_index("variable")
    pdf = mixed_cf.df.toPandas()
    x = pdf["cont2"].dropna().to_numpy()
    m2 = np.mean((x - x.mean()) ** 2)
    m3 = np.mean((x - x.mean()) ** 3)
    g1 = m3 / m2**1.5
    assert out.loc["cont2", "skew"] == pytest.approx(g1, rel=1e-7)
    assert 0 <= out.loc["cont2", "pvalue"] <= 1


def test_summarize(cat_cf):
    s = describe.summarize(cat_cf)
    assert s["rows"] == 400
    assert s["types"]["binary"] == 1
    assert s["types"]["continuous"] >= 2
