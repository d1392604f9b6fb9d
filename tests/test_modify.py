"""Modify-operator contracts (count assertions modeled on the reference's
exact-log golden tests, /root/reference/tests/modify/test_modify.py)."""

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.catalog import ClariteFrame
from clarite_python_spark.operators import modify


def test_categorize_types(mixed_cf):
    out = modify.categorize(mixed_cf)
    t = out.catalog.types
    assert t["const1"] == "constant"
    assert t["bin1"] == "binary"
    assert t["cat1"] == "categorical"
    assert t["cont1"] == "continuous"
    assert t["cont2"] == "continuous"
    assert t["strcol"] == "unknown"  # many distinct, not numeric
    assert t["mostly_na"] == "unknown"  # 10 distinct values: between cat_max and cont_min
    assert out.catalog.categories["bin1"] == ["a", "b"]
    assert sorted(out.catalog.categories["cat1"]) == ["w", "x", "y", "z"]


def test_colfilter_and_validation(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.colfilter(cf, only=["cont1", "bin1"])
    assert set(out.variables) == {"cont1", "bin1"}
    out2 = modify.colfilter(cf, skip=["cont1"])
    assert "cont1" not in out2.variables
    with pytest.raises(ValueError):
        modify.colfilter(cf, skip=["a"], only=["b"])
    with pytest.raises(ValueError):
        modify.colfilter(cf, only=["nonexistent"])


def test_colfilter_min_n(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.colfilter_min_n(cf, n=100)
    assert "mostly_na" not in out.variables
    assert "cont1" in out.variables  # 370 non-NA >= 100


def test_colfilter_min_cat_n(mixed_cf):
    cf = modify.categorize(mixed_cf)
    # every level of bin1/cat1 occurs ~100-200x; n=1000 drops both
    out = modify.colfilter_min_cat_n(cf, n=1000)
    assert "bin1" not in out.variables and "cat1" not in out.variables
    assert "cont1" in out.variables  # continuous untouched
    out2 = modify.colfilter_min_cat_n(cf, n=2)
    assert "bin1" in out2.variables


def test_colfilter_percent_zero(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.colfilter_percent_zero(cf, filter_percent=90.0)
    assert "with_zeros" not in out.variables  # 95% zeros
    assert "cont1" in out.variables


def test_rowfilter_incomplete_obs(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.rowfilter_incomplete_obs(cf, only=["cont1"])
    assert out.df.count() == 370
    assert out.df.where(F.col("cont1").isNull()).count() == 0


def test_rowfilter(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.rowfilter(cf, "bin1", "eq", "a")
    vals = [r[0] for r in out.df.select("bin1").distinct().collect()]
    assert vals == ["a"]


def test_recode_values(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.recode_values(cf, {"a": "A"}, only=["bin1"], count_changes=True)
    n_a = cf.df.where(F.col("bin1") == "a").count()
    assert out.last_report["cells_changed"]["bin1"] == n_a
    assert out.df.where(F.col("bin1") == "a").count() == 0
    assert out.df.where(F.col("bin1") == "A").count() == n_a


def test_remove_outliers_gaussian(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(0)
    vals = np.concatenate([rng.randn(500), [100.0, -100.0]])
    pdf = pd.DataFrame({"ID": range(len(vals)), "x": vals})
    cf = ClariteFrame(spark.createDataFrame(pdf))
    out = modify.remove_outliers(cf, method="gaussian", cutoff=3)
    assert out.df.where(F.col("x").isNull()).count() == 2


def test_remove_outliers_iqr_matches_pandas_quantiles(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(1)
    vals = rng.lognormal(0, 1, 801)
    pdf = pd.DataFrame({"ID": range(len(vals)), "x": vals})
    q1, q3 = pdf["x"].quantile(0.25), pdf["x"].quantile(0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    expected_removed = int(((pdf["x"] < lo) | (pdf["x"] > hi)).sum())
    cf = ClariteFrame(spark.createDataFrame(pdf))
    out = modify.remove_outliers(cf, method="iqr", cutoff=1.5)
    assert out.df.where(F.col("x").isNull()).count() == expected_removed


def test_clip_outliers_winsorizes_to_pandas_bounds(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(2)
    vals = rng.lognormal(0, 1, 801)
    pdf = pd.DataFrame({"ID": range(len(vals)), "x": vals})
    q1, q3 = pdf["x"].quantile(0.25), pdf["x"].quantile(0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    cf = ClariteFrame(spark.createDataFrame(pdf))
    out = modify.clip_outliers(cf, method="iqr", cutoff=1.5)
    got = {r["ID"]: r["x"] for r in out.df.collect()}
    # no nulls introduced, every value clamped into [lo, hi], and
    # outliers land exactly ON the pandas-quantile bound
    assert len(got) == len(pdf) and all(v is not None for v in got.values())
    for i, v in pdf.set_index("ID")["x"].items():
        exp = min(max(v, lo), hi)
        assert got[i] == pytest.approx(exp, rel=1e-12)
    n_hi = sum(1 for v in got.values() if v == pytest.approx(hi, rel=1e-12))
    assert n_hi == int((pdf["x"] > hi).sum()) and n_hi > 0


def test_clip_outliers_preserves_nulls_and_other_columns(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"ID": [0, 1, 2, 3], "x": [1.0, None, 2.0, 500.0], "label": list("abcd")}
    )
    cf = ClariteFrame(spark.createDataFrame(pdf))
    out = modify.clip_outliers(cf, method="gaussian", cutoff=1.0, only=["x"])
    rows = {r["ID"]: r for r in out.df.collect()}
    assert rows[1]["x"] is None
    assert [rows[i]["label"] for i in range(4)] == list("abcd")
    with pytest.raises(ValueError):
        modify.clip_outliers(cf, cutoff=0)


def test_transform_log(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.transform(cf, "log", only=["cont2"])
    import math

    orig = {r["ID"]: r["cont2"] for r in cf.df.select("ID", "cont2").limit(5).collect()}
    new = {r["ID"]: r["cont2"] for r in out.df.select("ID", "cont2").collect()}
    for i, v in orig.items():
        assert new[i] == pytest.approx(math.log(v), rel=1e-12)


def test_transform_zscore(mixed_cf):
    cf = modify.categorize(mixed_cf)
    out = modify.transform(cf, "zscore", only=["cont1"])
    row = out.df.agg(F.mean("cont1"), F.stddev_samp("cont1")).collect()[0]
    assert row[0] == pytest.approx(0.0, abs=1e-9)
    assert row[1] == pytest.approx(1.0, rel=1e-9)


def test_transform_user_callable(mixed_cf):
    """Arbitrary-callable fallback (reference modify.py:944-1008 applies
    any method via data.apply): pandas-UDF path must match the same
    callable run through pandas directly."""
    import numpy as np

    cf = modify.categorize(mixed_cf)

    def shifted_tanh(s):
        return np.tanh(s) + 1.0

    out = modify.transform(cf, shifted_tanh, only=["cont2"])
    assert out.last_report["method"] == "shifted_tanh"
    orig = cf.df.select("ID", "cont2").toPandas().set_index("ID")["cont2"]
    new = out.df.select("ID", "cont2").toPandas().set_index("ID")["cont2"]
    expected = shifted_tanh(orig.astype(float))
    for i in orig.index:
        assert new[i] == pytest.approx(expected[i], rel=1e-12)


def test_transform_unknown_name_still_raises(mixed_cf):
    cf = modify.categorize(mixed_cf)
    with pytest.raises(ValueError, match="transform_method"):
        modify.transform(cf, "not_a_method")


def test_make_continuous_errors_on_strings(mixed_cf):
    cf = modify.categorize(mixed_cf)
    with pytest.raises(ValueError):
        modify.make_continuous(cf, only=["strcol"])
    out = modify.make_continuous(cf, only=["cont1"])
    assert out.catalog.get("cont1") == "continuous"


def test_make_binary_validates(mixed_cf):
    cf = modify.categorize(mixed_cf)
    with pytest.raises(ValueError):
        modify.make_binary(cf, only=["cat1"])
    out = modify.make_binary(cf, only=["bin1"])
    assert out.catalog.get("bin1") == "binary"


def test_merge_variables(spark):
    import pandas as pd

    a = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [1, 2, 3], "x": [1.0, 2.0, 3.0]})))
    b = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [2, 3, 4], "y": [9.0, 8.0, 7.0]})))
    inner = modify.merge_variables(a, b, how="inner")
    assert inner.df.count() == 2
    outer = modify.merge_variables(a, b, how="outer")
    assert outer.df.count() == 4
    assert set(outer.variables) == {"x", "y"}


def test_merge_observations(spark):
    import pandas as pd

    a = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [1, 2], "x": [1.0, 2.0]})))
    b = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [3, 4], "x": [3.0, 4.0], "extra": [0.0, 0.0]})))
    out = modify.merge_observations(a, b)
    assert out.df.count() == 4
    assert out.variables == ["x"]  # only common columns
    dup = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [2, 5], "x": [0.0, 0.0]})))
    with pytest.raises(ValueError):
        modify.merge_observations(a, dup)


def test_move_variables(spark):
    import pandas as pd

    a = ClariteFrame(
        spark.createDataFrame(pd.DataFrame({"ID": [1, 2], "x": [1.0, 2.0], "z": [5.0, 6.0]}))
    )
    b = ClariteFrame(spark.createDataFrame(pd.DataFrame({"ID": [1, 2], "y": [9.0, 8.0]})))
    new_a, new_b = modify.move_variables(a, b, only=["z"])
    assert new_a.variables == ["x"]
    assert set(new_b.variables) == {"y", "z"}


def test_drop_extra_categories(mixed_cf):
    cf = modify.categorize(mixed_cf)
    cf.catalog.categories["cat1"] = ["ghost", "w", "x", "y", "z"]
    out = modify.drop_extra_categories(cf, only=["cat1"])
    assert out.catalog.categories["cat1"] == ["w", "x", "y", "z"]
    assert out.last_report["removed_levels"] == {"cat1": ["ghost"]}


def test_jsonl_roundtrip(spark, tmp_path):
    from clarite_python_spark.sources.io import from_jsonl, save_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = f"{tmp_path}/corpus"
    save_jsonl(docs, d, compression="gzip", partition_by="source")
    back = from_jsonl(
        spark, d, schema="doc_id long, text string, lang string, n_chars long"
    )
    # partition column comes back from the directory layout
    assert "source" in back.columns
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_orc_roundtrip_with_catalog(spark, tmp_path, mixed_cf):
    """ORC sink/source: same splittable-columnar contract as parquet,
    including the semantic-type sidecar."""
    from clarite_python_spark.operators import modify
    from clarite_python_spark.sources.io import from_orc, save

    cf = modify.categorize(mixed_cf)
    d = f"{tmp_path}/orc_table"
    save(cf, d, fmt="orc")
    back = from_orc(spark, d)
    assert back.df.count() == cf.df.count()
    assert sorted(back.df.columns) == sorted(cf.df.columns)
    assert back.catalog.types == cf.catalog.types
