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


def test_get_types_matches_reference_dtype_contract(spark):
    """Mirror of the reference's tests/internal/test_dtypes.py:
    test_get_dtypes on the same NHANES frame plus genotype / unknown /
    constant columns — including the subtle case where an explicitly
    make_categorical'd constant column still reports 'constant'
    (reference _get_dtype re-derives from the data)."""
    import os

    import pytest as _pytest

    data = "/root/reference/tests/test_data_files/nhanes_data.csv"
    if not os.path.exists(data):
        _pytest.skip("reference data not available")
    from pyspark.sql import functions as F

    from clarite_python_spark.operators import modify
    from clarite_python_spark.sources.io import from_csv

    cf = from_csv(spark, data, index_col=None)
    df = (
        cf.df.withColumn(
            "var1", F.when(F.col("ID") % 3 == 0, "A/A").otherwise("A/T")
        )
        .withColumn("var2", F.when(F.col("ID") % 5 == 0, "G/T").otherwise("G/G"))
        .withColumn("unknown", F.lit("unknown"))
        .withColumn("constant", F.lit(1))
    )
    from clarite_python_spark.catalog import ClariteFrame

    out = ClariteFrame(df, catalog=cf.catalog)
    out = modify.make_binary(out, only=["HI_CHOL", "RIAGENDR"])
    out = modify.make_categorical(out, only=["race", "agecat", "constant"])
    out = modify.make_genotypes(out, {"var1": ("A", "T"), "var2": ("G", "T")})
    got = {
        r["variable"]: r["type"]
        for r in __import__(
            "clarite_python_spark.operators.describe", fromlist=["describe"]
        ).get_types(out).collect()
    }
    expected = {
        "SDMVPSU": "continuous",
        "SDMVSTRA": "continuous",
        "WTMEC2YR": "continuous",
        "HI_CHOL": "binary",
        "race": "categorical",
        "agecat": "categorical",
        "RIAGENDR": "binary",
        "var1": "genotypes",
        "var2": "genotypes",
        "unknown": "unknown",
        "constant": "constant",
    }
    for k, v in expected.items():
        assert got[k] == v, k


def test_make_categorical_all_null_is_unknown_not_constant(spark):
    """Reference _get_dtype (internal/utilities.py:148-157) maps exactly
    ONE category to 'constant'; an all-null categorical has ZERO
    categories and falls through to 'unknown' — not constant."""
    from pyspark.sql import functions as F

    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.operators import describe, modify

    df = spark.range(10).select(
        F.col("id").alias("ID"),
        F.lit(None).cast("string").alias("allnull"),
        F.lit("x").alias("const"),
    )
    out = modify.make_categorical(ClariteFrame(df), only=["allnull", "const"])
    got = {r["variable"]: r["type"] for r in describe.get_types(out).collect()}
    assert got["allnull"] == "unknown"
    assert got["const"] == "constant"
