"""Round-8 operators: attribution, cramers_v, embedding_drift,
leakage_safe_split — planted-value semantics beyond the oracle gate."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.catalog import ClariteFrame
from clarite_python_spark.operators.describe import cramers_v
from clarite_python_spark.operators.events import attribution
from clarite_python_spark.operators.modify import make_categorical
from clarite_python_spark.operators.pipeline import leakage_safe_split
from clarite_python_spark.operators.similarity import embedding_drift


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def journey(spark):
    """User 1: click @1h, view @2h, purchase @3h (last=view, first=click);
    a same-timestamp click with larger id than the purchase (no credit).
    User 2: purchase with no prior touch. User 3: touch 10 days before
    purchase (aged out under a 7-day lookback)."""
    rows = [
        (1, _ts(1), 1, "click", 1.0, None),
        (2, _ts(2), 1, "view", 1.0, None),
        (3, _ts(3), 1, "purchase", 9.0, None),
        (4, _ts(3), 1, "click", 1.0, None),  # same ts as purchase, larger id
        (5, _ts(4), 2, "purchase", 5.0, None),
        (6, dt.datetime(2023, 12, 22, 1), 3, "click", 1.0, None),
        (7, _ts(6), 3, "purchase", 7.0, None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, event_type: string,"
        " value: double, props: string",
    )


def test_attribution_last_touch(journey):
    got = {
        r["event_id"]: (r["channel"], r["touch_event_id"])
        for r in attribution(journey).collect()
    }
    assert got == {3: ("view", 2), 5: (None, None), 7: ("click", 6)}


def test_attribution_first_touch(journey):
    got = {
        r["event_id"]: (r["channel"], r["touch_event_id"])
        for r in attribution(journey, model="first_touch").collect()
    }
    assert got[3] == ("click", 1)


def test_attribution_lookback_voids_aged_touch(journey):
    got = {
        r["event_id"]: r["channel"]
        for r in attribution(journey, lookback_seconds=7 * 86400).collect()
    }
    # user 3's only touch is 10 days old -> unattributed
    assert got == {3: "view", 5: None, 7: None}


def test_attribution_channel_filter_and_errors(journey):
    got = {
        r["event_id"]: r["channel"]
        for r in attribution(journey, channels=["click"]).collect()
    }
    assert got[3] == "click"  # views no longer count as touches
    with pytest.raises(ValueError, match="model"):
        attribution(journey, model="linear")
    with pytest.raises(ValueError, match="channel"):
        attribution(journey, channels=["purchase", "click"])


def test_cramers_v_perfect_and_independent(spark):
    # x == y -> V = 1; z independent of both (balanced) -> V = 0
    rows = [("a", "a", c) for c in ("u", "v")] * 10 + [
        ("b", "b", c) for c in ("u", "v")
    ] * 10
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "ID: long, x: string, y: string, z: string",
    )
    cf = make_categorical(ClariteFrame(df))
    got = {
        (r["var1"], r["var2"]): r["cramers_v"]
        for r in cramers_v(cf).collect()
    }
    assert got[("x", "y")] == pytest.approx(1.0)
    assert got[("x", "z")] == pytest.approx(0.0, abs=1e-9)
    assert got[("y", "z")] == pytest.approx(0.0, abs=1e-9)


def test_cramers_v_matches_textbook_2x2(spark):
    # 2x2 table [[10, 20], [30, 5]]: chi2 via closed form == textbook
    rows = (
        [("m", "l")] * 10 + [("m", "r")] * 20 + [("f", "l")] * 30 + [("f", "r")] * 5
    )
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "ID: long, g: string, s: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = cramers_v(cf).collect()[0]
    n = 65.0
    # expected counts from margins
    chi2 = 0.0
    obs = {("m", "l"): 10, ("m", "r"): 20, ("f", "l"): 30, ("f", "r"): 5}
    rm = {"m": 30, "f": 35}
    cm = {"l": 40, "r": 25}
    for (a, b), o in obs.items():
        e = rm[a] * cm[b] / n
        chi2 += (o - e) ** 2 / e
    assert row["chi2"] == pytest.approx(chi2, rel=1e-6)
    assert row["cramers_v"] == pytest.approx(math.sqrt(chi2 / n), rel=1e-6)
    assert row["n"] == 65


def test_cramers_v_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", "k") for i in range(10)],
        "ID: long, x: string, c: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = cramers_v(cf).collect()[0]
    assert row["cramers_v"] is None  # min(r, c) = 1 -> undefined, not 0


def test_embedding_drift_identical_and_shifted(spark):
    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id: long, embedding: array<float>"
    )
    same = embedding_drift(a, a).collect()[0]
    assert same["centroid_cosine"] == pytest.approx(1.0)
    assert same["centroid_l2"] == pytest.approx(0.0)
    assert same["n_a"] == same["n_b"] == 2

    b = spark.createDataFrame(
        [(3, [-1.0, 0.0]), (4, [0.0, -1.0])], "vec_id: long, embedding: array<float>"
    )
    opp = embedding_drift(a, b).collect()[0]
    assert opp["centroid_cosine"] == pytest.approx(-1.0)
    assert opp["centroid_l2"] == pytest.approx(math.sqrt(2.0), rel=1e-6)
    assert opp["mean_norm_a"] == pytest.approx(1.0)


def test_leakage_safe_split_clusters_stay_together(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = leakage_safe_split(
        docs, {"train": 0.6, "val": 0.2, "test": 0.2}, salt="t"
    )
    # invariant: one split per cluster label
    bad = (
        out.groupBy("cluster_label")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert bad == 0
    # every row assigned (fractions sum to 1), all rows retained
    assert out.where(F.col("split").isNull()).count() == 0
    assert out.count() == docs.count()
    # near-dups exist in the corpus, so some cluster has >1 member
    assert (
        out.groupBy("cluster_label").count().where("count > 1").count() > 0
    )


def test_leakage_safe_split_exact_method(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same  text here"), (3, "other words")],
        "doc_id: long, text: string",
    )
    out = leakage_safe_split(df, {"train": 0.5, "test": 0.5}, method="exact")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["cluster_label"] == rows[2]["cluster_label"] == 1
    assert rows[1]["split"] == rows[2]["split"]
    assert rows[3]["cluster_label"] == 3
    with pytest.raises(ValueError, match="method"):
        leakage_safe_split(df, {"train": 1.0}, method="nope")


# ---------------------------------------------------------------- round 9


def test_mutual_information_perfect_and_independent(spark):
    from clarite_python_spark.operators.describe import mutual_information

    rows = [("a", "a", c) for c in ("u", "v")] * 10 + [
        ("b", "b", c) for c in ("u", "v")
    ] * 10
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "ID: long, x: string, y: string, z: string",
    )
    cf = make_categorical(ClariteFrame(df))
    got = {(r["var1"], r["var2"]): r for r in mutual_information(cf).collect()}
    # x == y, balanced binary: MI = H = ln 2, NMI = 1
    assert got[("x", "y")]["mi"] == pytest.approx(math.log(2), rel=1e-6)
    assert got[("x", "y")]["nmi"] == pytest.approx(1.0)
    # independent balanced pairs: MI = 0
    assert got[("x", "z")]["mi"] == pytest.approx(0.0, abs=1e-9)
    assert got[("x", "z")]["nmi"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_matches_scipy_style(spark):
    import numpy as np

    from clarite_python_spark.operators.describe import mutual_information

    rows = [("m", "l")] * 10 + [("m", "r")] * 20 + [("f", "l")] * 30 + [("f", "r")] * 5
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "ID: long, g: string, s: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = mutual_information(cf).collect()[0]
    n = 65.0
    obs = {("m", "l"): 10, ("m", "r"): 20, ("f", "l"): 30, ("f", "r"): 5}
    rm = {"m": 30, "f": 35}
    cm = {"l": 40, "r": 25}
    mi = sum(
        (o / n) * np.log(o * n / (rm[a] * cm[b])) for (a, b), o in obs.items()
    )
    ha = -sum((v / n) * np.log(v / n) for v in rm.values())
    hb = -sum((v / n) * np.log(v / n) for v in cm.values())
    assert row["mi"] == pytest.approx(mi, abs=1e-6)
    assert row["nmi"] == pytest.approx(mi / min(ha, hb), abs=1e-6)
    assert row["n"] == 65


def test_mutual_information_constant_column_nmi_null(spark):
    from clarite_python_spark.operators.describe import mutual_information

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", "k") for i in range(10)],
        "ID: long, x: string, c: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = mutual_information(cf).collect()[0]
    assert row["mi"] == pytest.approx(0.0, abs=1e-9)
    assert row["nmi"] is None  # min entropy = 0 -> normalization undefined


def test_theils_u_asymmetry(spark):
    """A fine variable determines a coarse one fully, but not vice
    versa: U(coarse|fine) = 1, U(fine|coarse) < 1."""
    from clarite_python_spark.operators.describe import theils_u

    # fine in {a,b,c,d}; coarse = fine's first half/second half
    rows = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")] * 10
    df = spark.createDataFrame(
        [(i, f, c) for i, (f, c) in enumerate(rows)],
        "ID: long, fine: string, coarse: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = theils_u(cf).collect()[0]
    # combinations order: (coarse, fine) -> var1=coarse, var2=fine
    assert {row["var1"], row["var2"]} == {"coarse", "fine"}
    u_coarse, u_fine = (
        (row["u_var1_given_var2"], row["u_var2_given_var1"])
        if row["var1"] == "coarse"
        else (row["u_var2_given_var1"], row["u_var1_given_var2"])
    )
    assert u_coarse == pytest.approx(1.0)
    assert u_fine == pytest.approx(0.5)  # MI = ln2, H(fine) = ln4


def test_theils_u_constant_direction_null(spark):
    from clarite_python_spark.operators.describe import theils_u

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", "k") for i in range(10)],
        "ID: long, x: string, c: string",
    )
    cf = make_categorical(ClariteFrame(df))
    row = theils_u(cf).collect()[0]
    const_side = (
        "u_var1_given_var2" if row["var1"] == "c" else "u_var2_given_var1"
    )
    other_side = (
        "u_var2_given_var1" if row["var1"] == "c" else "u_var1_given_var2"
    )
    assert row[const_side] is None  # H(constant) = 0 -> undefined
    assert row[other_side] == pytest.approx(0.0, abs=1e-9)


def _pairwise_rows(df_result, keycols):
    return {
        (r["var1"], r["var2"]): tuple(r[k] for k in keycols)
        for r in df_result.collect()
    }


def test_pairwise_categorical_matches_ground_truth_with_nulls(spark):
    # the nested-Generate kernel must reproduce per-pair complete-case
    # contingency statistics computed independently in Python, on a
    # frame with random nulls (8 vars -> 28 pairs)
    from collections import Counter

    from clarite_python_spark.operators.describe import mutual_information

    import random

    rng = random.Random(7)
    cols = [f"v{i}" for i in range(8)]
    rows = [
        (i, *[rng.choice("abc") if rng.random() > 0.1 else None for _ in cols])
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "ID: long, " + ", ".join(f"{c}: string" for c in cols)
    )
    cf = make_categorical(ClariteFrame(df))

    got_v = _pairwise_rows(cramers_v(cf), ["n", "chi2", "cramers_v"])
    got_mi = _pairwise_rows(mutual_information(cf), ["n", "mi", "nmi"])
    assert len(got_v) == 28 and len(got_mi) == 28

    for ia in range(len(cols)):
        for ib in range(ia + 1, len(cols)):
            a, b = cols[ia], cols[ib]
            cc = [
                (r[1 + ia], r[1 + ib])
                for r in rows
                if r[1 + ia] is not None and r[1 + ib] is not None
            ]
            n = len(cc)
            cells = Counter(cc)
            ra = Counter(x for x, _ in cc)
            cb = Counter(y for _, y in cc)
            chi2 = n * (
                sum(o * o / (ra[x] * cb[y]) for (x, y), o in cells.items()) - 1.0
            )
            r_, c_ = len(ra), len(cb)
            v = (
                math.sqrt(chi2 / (n * (min(r_, c_) - 1)))
                if min(r_, c_) > 1
                else None
            )
            mi = sum(
                (o / n) * math.log(o * n / (ra[x] * cb[y]))
                for (x, y), o in cells.items()
            )
            h = lambda m: -sum((o / n) * math.log(o / n) for o in m.values())
            nmi = mi / min(h(ra), h(cb)) if min(h(ra), h(cb)) > 1e-12 else None
            gn, gchi2, gv = got_v[(a, b)]
            assert gn == n
            assert gchi2 == pytest.approx(chi2, abs=1e-4)
            assert gv == pytest.approx(v, abs=1e-4)
            _, gmi, gnmi = got_mi[(a, b)]
            assert gmi == pytest.approx(mi, abs=1e-4)
            assert gnmi == pytest.approx(nmi, abs=1e-4)


def test_pairwise_categorical_wide_frame_bounded(spark):
    # p = 500 categorical vars -> 124,750 pairs: the naive C(p,2)
    # struct generator could not even compile at this width (O(p²)
    # expressions); the nested-Generate kernel is O(p) expressions and
    # streams the pairs, so this completes in bounded time
    n_vars, n_rows = 500, 50
    cols = [f"w{i}" for i in range(n_vars)]
    rows = [
        (i, *[("x" if (i * 31 + j * 7) % 3 else "y") for j in range(n_vars)])
        for i in range(n_rows)
    ]
    df = spark.createDataFrame(
        rows, "ID: long, " + ", ".join(f"{c}: string" for c in cols)
    )
    cf = make_categorical(ClariteFrame(df))
    out = cramers_v(cf)
    assert out.count() == n_vars * (n_vars - 1) // 2
