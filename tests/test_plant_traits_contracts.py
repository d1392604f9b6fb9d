"""Exact-count contracts from the reference's plantTraits modify tests,
against a vendored fixture.

The reference fetches R's ``cluster::plantTraits`` over the network
(reference tests/modify/conftest.py:6-10) and asserts exact counts in
its printed logs (reference tests/modify/test_modify.py:9-140 — e.g.
make_binary rejecting 11 named variables, colfilter_percent_zero
"Removed 7 (22.58%)", colfilter_min_n "Removed 19 (61.29%)"). The
network is unavailable here, so tests/fixtures/plant_traits_like.csv
(scripts/make_plant_fixture.py, seeded) reproduces the dataset's
structural contract — 136 rows x 31 variables, the same 11 non-binary
columns, 19 NA-bearing columns, 7 >=90%-zero columns — and these tests
assert the reference's counts (not its ASCII banners) through the
public API.
"""

from __future__ import annotations

import os
import re

import pytest

import clarite_python_spark as cs

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "plant_traits_like.csv")

NON_BINARY_11 = [
    "pdias", "longindex", "durflow", "height", "begflow", "mycor",
    "vegaer", "vegsout", "autopoll", "insects", "wind",
]


@pytest.fixture(scope="module")
def plant(spark):
    cf = cs.load.from_csv(spark, FIXTURE, index_col="ID")
    cf.df = cf.df.cache()
    return cf


def test_fixture_shape(plant):
    assert len(plant.variables) == 31
    assert plant.df.count() == 136


def test_make_binary_rejects_the_11_multivalued_variables(plant):
    """Reference: '11 variable(s) did not have 2 unique values ...:
    pdias, longindex, durflow, height, begflow, mycor, vegaer, vegsout,
    autopoll, insects, wind' (test_modify.py:10-19)."""
    with pytest.raises(ValueError, match=re.escape("11 variable(s)")) as ei:
        cs.modify.make_binary(plant)
    for name in NON_BINARY_11:
        assert name in str(ei.value)


def test_make_binary_five_known_binary_columns(plant):
    """Reference: 'Set 5 of 31 variable(s) as binary, each with 136
    observations' (test_modify.py:21-37)."""
    cols = ["piq", "ros", "leafy", "winan", "suman"]
    out = cs.modify.make_binary(plant, only=cols)
    assert sorted(out.last_report["set_binary"]) == sorted(cols)
    assert len(out.variables) == 31  # marking types drops nothing
    for c in cols:
        assert out.catalog.get(c) == cs.catalog.BINARY
        # 'each with 136 observations': these five are NA-free
        assert out.df.where(out.df[c].isNull()).count() == 0


def test_make_categorical_and_continuous_all_31(plant):
    """Reference: 'Set 31 of 31 variable(s) as categorical/continuous'
    (test_modify.py:40-70)."""
    cat = cs.modify.make_categorical(plant)
    assert len(cat.last_report["set_categorical"]) == 31
    cont = cs.modify.make_continuous(plant)
    assert all(cont.catalog.get(c) == cs.catalog.CONTINUOUS for c in cont.variables)
    assert len(cont.variables) == 31


def test_colfilter_percent_zero_removes_7_of_31(plant):
    """Reference: 'Removed 7 (22.58%) tested continuous variables which
    were equal to zero in at least 90.00% of non-NA observations',
    result shape (136, 24) (test_modify.py:84-97)."""
    cont = cs.modify.make_continuous(plant)
    out = cs.modify.colfilter_percent_zero(cont)
    dropped = set(plant.variables) - set(out.variables)
    assert len(dropped) == 7
    assert dropped == {"everalw", "everparti", "elaio", "epizoo", "aquat", "windgl", "unsp"}
    assert len(out.variables) == 24 and out.df.count() == 136


def test_colfilter_min_n_removes_19_na_bearing_plus_test_binary(plant, spark):
    """Reference: adds a 'test' binary column with one None, then
    colfilter_min_n(n=136) removes 1 (100%) binary + 19 (61.29%)
    continuous, result shape (136, 12) (test_modify.py:100-124)."""
    from pyspark.sql import functions as F

    cont = cs.modify.make_continuous(plant)
    with_test = cont.with_df(
        cont.df.withColumn(
            "test", F.when(F.col("ID") == 1, None).otherwise((F.col("ID") <= 3).cast("int"))
        )
    )
    with_test = cs.modify.make_binary(with_test, only=["test"])
    out = cs.modify.colfilter_min_n(with_test, n=136)
    dropped = set(with_test.variables) - set(out.variables)
    assert "test" in dropped  # the 1 (100.00%) tested binary variable
    assert len(dropped - {"test"}) == 19  # the 19 (61.29%) continuous
    assert len(out.variables) == 12 and out.df.count() == 136


def test_colfilter_min_cat_n_drops_small_level_categorical(plant, spark):
    """Reference: two added categoricals (min level 2 vs 3), n=3 keeps
    one — 'Removed 1 (50.00%)', shape (136, 32) (test_modify.py:127+)."""
    from pyspark.sql import functions as F

    df = plant.df.withColumn(
        "test",
        F.when(F.col("ID") <= 2, "cat1").when(F.col("ID") <= 8, "cat2").otherwise("cat3"),
    ).withColumn(
        "test2",
        F.when(F.col("ID") <= 3, "cat1").when(F.col("ID") <= 9, "cat2").otherwise("cat3"),
    )
    cf = cs.modify.make_categorical(plant.with_df(df), only=["test", "test2"])
    out = cs.modify.colfilter_min_cat_n(cf, n=3)
    assert "test" not in out.variables and "test2" in out.variables
    assert len(out.variables) == 32 and out.df.count() == 136


def test_merge_variables_roundtrip(plant):
    """Reference test_merge: split columns 3/3/25, merge back, equal to
    the original (test_modify.py:73-81)."""
    cols = plant.variables
    parts = [cols[:3], cols[3:6], cols[6:]]
    frames = [plant.with_df(plant.df.select("ID", *p)) for p in parts]
    merged = cs.modify.merge_variables(frames[0], frames[1])
    merged = cs.modify.merge_variables(merged, frames[2])
    assert sorted(merged.variables) == sorted(cols)
    orig = {r["ID"]: r.asDict() for r in plant.df.collect()}
    back = {r["ID"]: r.asDict() for r in merged.df.collect()}
    assert orig == back
