"""asof_join: semantics pinned against pandas.merge_asof (the de-facto
reference for as-of semantics) on crafted and real data, plus the plan
shape (one keyed shuffle, no cartesian/range join)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.joins import asof_join
from clarite_python_spark.sources.io import load_testdata

SF_DIR = "/root/testdata/sf0.001"


def test_backward_semantics_crafted(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 5.0, "c"), (2, 10.0, "d")],
        "k: long, ts: double, who: string",
    )
    right = spark.createDataFrame(
        [(1, 8.0, 100.0), (1, 10.0, 200.0), (1, 15.0, 300.0), (3, 1.0, 999.0)],
        "k: long, ts: double, v: double",
    )
    got = {
        r["who"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert got["a"] == (200.0, 10.0)  # equal ts matches (<=)
    assert got["b"] == (300.0, 15.0)  # most recent, not first
    assert got["c"] == (None, None)  # nothing at-or-before 5
    assert got["d"] == (None, None)  # key 2 has no right rows


def test_forward_and_tolerance(spark):
    left = spark.createDataFrame([(1, 10.0, "a"), (1, 30.0, "b")], "k: long, ts: double, who: string")
    right = spark.createDataFrame([(1, 12.0, 1.0), (1, 100.0, 2.0)], "k: long, ts: double, v: double")
    fwd = {r["who"]: r["v"] for r in asof_join(left, right, by="k", direction="forward").collect()}
    assert fwd == {"a": 1.0, "b": 2.0}
    tol = {
        r["who"]: r["v"]
        for r in asof_join(left, right, by="k", direction="forward", tolerance=5).collect()
    }
    assert tol == {"a": 1.0, "b": None}  # 100-30=70 > 5 nulled, row kept


def test_matches_pandas_merge_asof_on_events(spark):
    ev = load_testdata(spark, SF_DIR, ["events"])["events"]
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    got = (
        asof_join(clicks, buys, on="ts", by="user_id")
        .select("event_id", "purchase_value", "ts_right")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp, rp = clicks.toPandas(), buys.toPandas()
    want = (
        pd.merge_asof(
            lp.sort_values("ts"), rp.sort_values("ts"), on="ts", by="user_id", direction="backward"
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_series_equal(
        got["purchase_value"], want["purchase_value"], check_names=False
    )


def test_name_collision_gets_suffix(spark):
    left = spark.createDataFrame([(1, 1.0, 5.0)], "k: long, ts: double, v: double")
    right = spark.createDataFrame([(1, 1.0, 7.0)], "k: long, ts: double, v: double")
    out = asof_join(left, right, by="k")
    assert "v" in out.columns and "v_right" in out.columns
    r = out.collect()[0]
    assert r["v"] == 5.0 and r["v_right"] == 7.0


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 1.0)], "k: long, ts: double")
    with pytest.raises(ValueError):
        asof_join(df, df, by="k", direction="sideways")
    with pytest.raises(ValueError):
        asof_join(df, df, by="k", right_cols=["k"])


def test_plan_is_one_keyed_shuffle_no_cartesian(spark):
    ev = load_testdata(spark, SF_DIR, ["events"])["events"]
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    plan = (
        asof_join(clicks, buys, on="ts", by="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the union of the two scans shuffles ONCE on the key for the window
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------- interval_join


def test_interval_join_semantics(spark):
    pts = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 10.0, "b"), (1, 20.0, "c"), (2, 5.0, "d")],
        "k: long, ts: double, who: string",
    )
    ivl = spark.createDataFrame(
        [(1, 0.0, 10.0, "i1"), (1, 9.0, 30.0, "i2"), (3, 0.0, 100.0, "i3")],
        "k: long, start: double, end: double, name: string",
    )
    from clarite_python_spark.operators.joins import interval_join

    got = {
        (r["who"], r["name"])
        for r in interval_join(pts, ivl, by="k", bin_width=4.0).collect()
    }
    # closed intervals: ts=10 in both i1 ([0,10]) and i2 ([9,30])
    assert got == {("a", "i1"), ("b", "i1"), ("b", "i2"), ("c", "i2")}
    half = {
        (r["who"], r["name"])
        for r in interval_join(pts, ivl, by="k", bin_width=4.0, inclusive_end=False).collect()
    }
    assert half == {("a", "i1"), ("b", "i2"), ("c", "i2")}


def test_interval_join_matches_duckdb_inequality_join(spark):
    """Binned equi-join == the naive inequality join (DuckDB executes it
    exactly): clicks within 2h after a purchase, per user."""
    import duckdb

    ev = load_testdata(spark, SF_DIR, ["events"])["events"]
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    from clarite_python_spark.operators.joins import interval_join

    got = {
        (r["event_id"], r["purchase_id"])
        for r in interval_join(clicks, buys, by="user_id", bin_width=3600.0).collect()
    }
    want = set(
        map(
            tuple,
            duckdb.sql(
                f"""
        WITH e AS (SELECT * FROM '{SF_DIR}/events.parquet')
        SELECT c.event_id, p.event_id
        FROM (SELECT * FROM e WHERE event_type='click') c
        JOIN (SELECT * FROM e WHERE event_type='purchase') p
          ON c.user_id = p.user_id
         AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 2 HOURS
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def test_interval_join_guard_trips_on_runaway_interval(spark):
    pts = spark.createDataFrame([(0.5,)], "ts: double")
    ivl = spark.createDataFrame([(0.0, 1e9, "huge")], "start: double, end: double, name: string")
    from clarite_python_spark.operators.joins import interval_join

    with pytest.raises(Exception, match="too many bins"):
        interval_join(pts, ivl, bin_width=1.0).collect()


def test_interval_join_plan_no_cartesian(spark):
    pts = spark.createDataFrame([(1, 5.0)], "k: long, ts: double")
    ivl = spark.createDataFrame([(1, 0.0, 10.0)], "k: long, start: double, end: double")
    from clarite_python_spark.operators.joins import interval_join

    plan = (
        interval_join(pts, ivl, by="k", bin_width=4.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ------------------------------------------------- property: vs merge_asof


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ts = st.integers(min_value=0, max_value=50)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=15),
)
def test_asof_property_matches_merge_asof(spark, left, right):
    """Random keyed event sets agree with pandas merge_asof (right side
    deduped to one row per (key, ts) — ties there are unspecified)."""
    right = list({(k, t) for (k, t) in right})  # unique (key, ts)
    lp = pd.DataFrame(left, columns=["k", "ts"]).astype(float)
    lp["k"] = lp["k"].astype(int)
    lp["rowid"] = range(len(lp))
    rp = pd.DataFrame(right, columns=["k", "ts"]).astype(float)
    rp["k"] = rp["k"].astype(int)
    rp["v"] = rp["ts"] * 10 + rp["k"]

    got = (
        asof_join(
            spark.createDataFrame(lp), spark.createDataFrame(rp), on="ts", by="k"
        )
        .select("rowid", "v")
        .toPandas()
        .sort_values("rowid")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lp.sort_values(["ts", "rowid"]), rp.sort_values("ts"), on="ts", by="k"
        )
        .sort_values("rowid")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["v"], want["v"], check_names=False)


def test_asof_suffix_collision_guard(spark):
    left = spark.createDataFrame([(1, 1.0, 0.0)], "k: long, ts: double, ts_right: double")
    right = spark.createDataFrame([(1, 1.0, 7.0)], "k: long, ts: double, v: double")
    with pytest.raises(ValueError, match="duplicated"):
        asof_join(left, right, by="k")
    # a different suffix resolves it
    out = asof_join(left, right, by="k", suffix="_r").collect()[0]
    assert out["v"] == 7.0 and out["ts_r"] == 1.0


def test_asof_null_timestamps_no_phantom_matches(spark):
    """NULL `on` rows: right-side NULLs never match anything; left-side
    NULLs are kept with NULL payloads — in BOTH directions."""
    left = spark.createDataFrame(
        [(1, 5.0, "early"), (1, None, "nots")], "k: long, ts: double, who: string"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 10.0, 1.0)], "k: long, ts: double, v: double"
    )
    back = {r["who"]: r["v"] for r in asof_join(left, right, by="k").collect()}
    assert back == {"early": None, "nots": None}  # not 99.0
    fwd = {
        r["who"]: r["v"]
        for r in asof_join(left, right, by="k", direction="forward").collect()
    }
    assert fwd == {"early": 1.0, "nots": None}


def test_interval_join_null_and_reversed_intervals_drop(spark):
    from clarite_python_spark.operators.joins import interval_join

    pts = spark.createDataFrame([(1, 5.0)], "k: long, ts: double")
    ivl = spark.createDataFrame(
        [
            (1, None, 10.0, "null_start"),
            (1, 0.0, None, "null_end"),
            (1, 1e9, 0.0, "reversed-huge"),  # would be ~1e9 bins if generated
            (1, 0.0, 10.0, "good"),
        ],
        "k: long, start: double, end: double, name: string",
    )
    got = [r["name"] for r in interval_join(pts, ivl, by="k", bin_width=4.0).collect()]
    assert got == ["good"]


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(st.tuples(st.integers(0, 1), st.integers(0, 40)), min_size=1, max_size=12),
    ivls=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(-5, 45)),
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([1.0, 3.0, 4.0, 7.5]),
    inclusive=st.booleans(),
)
def test_interval_join_property_matches_bruteforce(spark, pts, ivls, width, inclusive):
    """Random integer points/intervals (incl. exact bin-edge ends and
    reversed intervals) match a python brute force for both closed and
    half-open semantics, across bin widths."""
    from clarite_python_spark.operators.joins import interval_join

    p = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(pts)], "k: long, ts: double, pid: long"
    )
    iv = spark.createDataFrame(
        [(k, float(s), float(e), j) for j, (k, s, e) in enumerate(ivls)],
        "k: long, start: double, end: double, iid: long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            p, iv, by="k", bin_width=width, inclusive_end=inclusive
        ).collect()
    }
    want = {
        (i, j)
        for i, (pk, t) in enumerate(pts)
        for j, (ik, s, e) in enumerate(ivls)
        if pk == ik and s <= t and (t <= e if inclusive else t < e)
    }
    assert got == want


# ---------------------------------------------------------------- round 9


def test_fuzzy_join_finds_edit_distance_pairs(spark):
    from clarite_python_spark.operators.joins import fuzzy_join

    a = spark.createDataFrame(
        [(1, "smith"), (2, "jones"), (3, "taylor")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "smyth"), (11, "jonas"), (12, "completely-different")],
        "id long, name string",
    )
    out = fuzzy_join(a, b, "name", "name", max_distance=1).collect()
    pairs = {(r["name"], r["name_r"], r["distance"]) for r in out}
    assert ("smith", "smyth", 1) in pairs
    assert ("jones", "jonas", 1) in pairs
    assert all(r["distance"] <= 1 for r in out)
    assert not any(r["name_r"] == "completely-different" for r in out)


def test_fuzzy_join_matches_bruteforce(spark):
    """Blocked candidates must equal the all-pairs truth (length banding
    is a NECESSARY condition — no pair may be lost)."""
    import itertools

    from clarite_python_spark.operators.joins import fuzzy_join

    def lev(s, t):
        m = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, m[0] = m[0], i
            for j, ct in enumerate(t, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1, prev + (cs != ct))
        return m[len(t)]

    names = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        "p_name"
    ).distinct()
    got = {
        (r["p_name"], r["p_name_r"])
        for r in fuzzy_join(names, names, "p_name", "p_name", max_distance=2)
        .where("p_name < p_name_r")
        .collect()
    }
    vals = [r["p_name"] for r in names.collect()]
    want = {
        (x, y)
        for x, y in itertools.combinations(sorted(vals), 2)
        if lev(x, y) <= 2
    }
    assert got == want and len(want) > 0


def test_fuzzy_join_block_cols_restricts(spark):
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.joins import fuzzy_join

    a = spark.createDataFrame(
        [(1, "smith", "NY"), (2, "smith", "LA")], "id long, name string, region string"
    )
    b = spark.createDataFrame(
        [(10, "smyth", "NY")], "id long, name string, region string"
    )
    out = fuzzy_join(
        a, b, "name", "name", max_distance=1, block_cols=("region", "region")
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 1  # only the NY pair


def test_fuzzy_join_validation(spark):
    import pytest as _pt

    from clarite_python_spark.operators.joins import fuzzy_join

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with _pt.raises(ValueError):
        fuzzy_join(df, df, "name", "name", max_distance=-1)
