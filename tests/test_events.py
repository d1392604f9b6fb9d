"""Product-analytics operators: funnel (ordered conversion) and cohort
retention."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.events import (
    funnel,
    funnel_counts,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        ["user_id", "ts", "event_type"],
    )


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 0, "signup"), (1, 1, 1, "view"), (1, 1, 2, "purchase"),
        # user 2: purchase BEFORE view -> stops at stage 1... then view
        (2, 1, 0, "signup"), (2, 1, 1, "purchase"), (2, 1, 2, "view"),
        # user 3: no signup -> absent even though later steps present
        (3, 1, 0, "view"), (3, 1, 1, "purchase"),
        # user 4: signup only
        (4, 1, 5, "signup"),
    ]
    out = {r["user_id"]: r["stage"] for r in funnel(_ev(spark, rows), ["signup", "view", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 4: 1}  # user 2 reaches view (after signup); user 3 absent


def test_funnel_equal_timestamps_do_not_advance(spark):
    rows = [(1, 1, 0, "signup"), (1, 1, 0, "view")]  # same instant
    out = funnel(_ev(spark, rows), ["signup", "view"]).collect()
    assert out[0]["stage"] == 1  # strict > : simultaneous view doesn't count


def test_funnel_stage_ts_is_min_eligible(spark):
    rows = [
        (1, 1, 0, "signup"),
        (1, 1, 3, "view"),
        (1, 1, 2, "view"),  # earlier eligible view wins
    ]
    r = funnel(_ev(spark, rows), ["signup", "view"]).collect()[0]
    assert r["stage"] == 2 and r["stage_ts"] == dt.datetime(2024, 1, 1, 2)


def test_funnel_validation(spark):
    df = _ev(spark, [(1, 1, 0, "signup")])
    with pytest.raises(ValueError, match="at least one"):
        funnel(df, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, ["a", "a"])


def test_funnel_counts_emits_every_stage_cumulative(spark):
    rows = [
        (1, 1, 0, "signup"), (1, 1, 1, "view"), (1, 1, 2, "purchase"),
        (2, 1, 0, "signup"), (2, 1, 1, "view"),
        (3, 1, 0, "signup"),
    ]
    out = {r["stage"]: r["n_users"] for r in funnel_counts(_ev(spark, rows), ["signup", "view", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_funnel_counts_zero_rows_for_unreached_stage(spark):
    rows = [(1, 1, 0, "signup")]
    out = {r["stage"]: r["n_users"] for r in funnel_counts(_ev(spark, rows), ["signup", "view"]).collect()}
    assert out == {1: 1, 2: 0}


def test_retention_cohorts_triangle(spark):
    rows = [
        # user 1 first seen Jan 1, active again Jan 9 (offset 1)
        (1, 1, 0, "view"), (1, 9, 0, "view"),
        # user 2 first seen Jan 8 (separate cohort), active Jan 8 only
        (2, 8, 0, "view"),
    ]
    out = {
        (str(r["cohort_date"]), r["period_offset"]): r["n_users"]
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_retention_validation(spark):
    with pytest.raises(ValueError, match="period_days"):
        retention_cohorts(_ev(spark, [(1, 1, 0, "view")]), period_days=0)


def test_funnel_max_span_bounds_conversion(spark):
    rows = [
        # user 1: view 1h after signup -> inside a 2h window
        (1, 1, 0, "signup"), (1, 1, 1, "view"),
        # user 2: view 3h after signup -> outside the window, stage 1
        (2, 1, 0, "signup"), (2, 1, 3, "view"),
    ]
    out = {r["user_id"]: r["stage"] for r in funnel(
        _ev(spark, rows), ["signup", "view"], max_span_seconds=2 * 3600
    ).collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_max_span_anchor_is_first_step1(spark):
    # a later signup would open a fresh window, but the anchor is FIXED
    # at the first signup: the view at day1+5h is outside [0, 2h]
    rows = [
        (1, 1, 0, "signup"), (1, 1, 4, "signup"), (1, 1, 5, "view"),
    ]
    out = funnel(_ev(spark, rows), ["signup", "view"], max_span_seconds=2 * 3600).collect()
    assert out[0]["stage"] == 1


def test_funnel_max_span_validation(spark):
    with pytest.raises(ValueError, match="max_span_seconds"):
        funnel(_ev(spark, [(1, 1, 0, "signup")]), ["signup"], max_span_seconds=0)


def test_funnel_times_durations(spark):
    from clarite_python_spark.operators.events import funnel_times

    rows = [
        (1, 1, 0, "signup"), (1, 1, 2, "view"), (1, 1, 5, "purchase"),
        (2, 1, 0, "signup"),
    ]
    out = funnel_times(_ev(spark, rows), ["signup", "view", "purchase"]).collect()
    got = {(r["user_id"], r["stage"]): r["since_prev_us"] for r in out}
    assert got[(1, 1)] is None
    assert got[(1, 2)] == 2 * 3600 * 1_000_000
    assert got[(1, 3)] == 3 * 3600 * 1_000_000
    assert got[(2, 1)] is None and (2, 2) not in got


def test_funnel_matches_python_reference_on_random_events(spark):
    """Randomized (seeded) parity vs a direct python implementation of
    the t_k = min{ts > t_(k-1) [and <= t1+span]} recursion — exercises
    ties, interleavings, and span deadlines the hand-written cases
    miss."""
    import numpy as np

    from clarite_python_spark.operators.events import funnel

    rng = np.random.RandomState(42)
    steps = ["s1", "s2", "s3"]
    rows = []
    for u in range(60):
        n = rng.randint(1, 15)
        for _ in range(n):
            # coarse integer hours force plenty of exact-tie timestamps
            rows.append(
                (
                    u,
                    dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(rng.randint(0, 30))),
                    steps[rng.randint(0, 3)],
                )
            )
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])

    def py_funnel(evts, span=None):
        out = {}
        by_user: dict = {}
        for u, ts, et in evts:
            by_user.setdefault(u, []).append((ts, et))
        for u, es in by_user.items():
            t_prev, t1, stage = None, None, 0
            for k, step in enumerate(steps, start=1):
                cand = [
                    ts
                    for ts, et in es
                    if et == step
                    and (t_prev is None or ts > t_prev)
                    and (span is None or t1 is None or ts <= t1 + dt.timedelta(seconds=span))
                ]
                if not cand:
                    break
                t_prev = min(cand)
                t1 = t1 or t_prev
                stage = k
            if stage:
                out[u] = (stage, t_prev)
        return out

    for span in (None, 5 * 3600):
        got = {
            r["user_id"]: (r["stage"], r["stage_ts"])
            for r in funnel(df, steps, max_span_seconds=span).collect()
        }
        assert got == py_funnel(rows, span), f"span={span}"


def test_funnel_null_ts_and_user_dropped(spark):
    """A null-timestamp event must not freeze the scan at a null anchor
    (it used to sort first and bypass the advance predicates); null
    users are dropped entirely."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), "signup"),
        (1, None, "view"),  # null ts: ignored, NOT a stage-2 advance
        (1, dt.datetime(2024, 1, 1, 2), "view"),
        (None, dt.datetime(2024, 1, 1, 0), "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel(df, ["signup", "view"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["stage"] == 2
    assert r["stage_ts"] == dt.datetime(2024, 1, 1, 2)


def test_funnel_times_null_ts_dropped(spark):
    from clarite_python_spark.operators.events import funnel_times

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), "signup"),
        (1, None, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel_times(df, ["signup", "view"]).collect()
    assert [(r["stage"], r["stage_ts"]) for r in out] == [
        (1, dt.datetime(2024, 1, 1, 0))
    ]


def test_funnel_max_events_per_user_drops_bots(spark):
    rows = [(1, 1, h % 23, "signup") for h in range(10)] + [
        (2, 1, 0, "signup"),
        (2, 1, 1, "view"),
    ]
    df = _ev(spark, rows)
    # user 1 has 10 step events -> dropped at cap 5; user 2 unaffected
    out = {r["user_id"]: r["stage"] for r in funnel(df, ["signup", "view"], max_events_per_user=5).collect()}
    assert out == {2: 2}
    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel(df, ["signup"], max_events_per_user=0)


def test_retention_approx_matches_exact_on_small_cohorts(spark):
    """approx=True (HyperLogLog++) must agree with the exact count on
    gate-scale cohorts (well within the default 5% rsd — tiny
    cardinalities are exact in HLL++'s dense-correction regime)."""
    from clarite_python_spark.sources.io import load_testdata

    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev = ev.where(F.col("ts").isNotNull())
    key = lambda r: (r["cohort_date"], r["period_offset"])  # noqa: E731
    exact = {key(r): r["n_users"] for r in retention_cohorts(ev).collect()}
    approx = {key(r): r["n_users"] for r in retention_cohorts(ev, approx=True).collect()}
    assert exact.keys() == approx.keys()
    for k_, n in exact.items():
        assert abs(approx[k_] - n) <= max(1, 0.05 * n), k_
    with pytest.raises(ValueError, match="rsd"):
        retention_cohorts(ev, approx=True, rsd=0.0)


def _ev_id(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, d, h), t) for i, (u, d, h, t) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"],
    )


def test_event_transitions_python_parity(spark):
    from clarite_python_spark.operators.events import event_transitions

    rows = [
        (1, 1, 0, "a"), (1, 1, 1, "b"), (1, 1, 2, "a"), (1, 1, 3, "b"),
        (2, 1, 0, "a"), (2, 1, 1, "a"), (2, 1, 2, "c"),
        (3, 1, 5, "b"),  # single event -> no transitions
    ]
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(_ev_id(spark, rows)).collect()
    }
    # user 1: a->b, b->a, a->b ; user 2: a->a, a->c
    assert got[("a", "b")][0] == 2 and got[("b", "a")][0] == 1
    assert got[("a", "a")][0] == 1 and got[("a", "c")][0] == 1
    # conditional rows sum to 1 per from_type
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    for f, s in sums.items():
        assert abs(s - 1.0) < 1e-6, f


def test_event_transitions_excludes_null_users_and_ts(spark):
    from clarite_python_spark.operators.events import event_transitions

    df = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1), "a"),
            (2, 1, dt.datetime(2024, 1, 2), "b"),
            (3, None, dt.datetime(2024, 1, 3), "c"),  # null user
            (4, 1, None, "d"),  # null ts
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {(r["from_type"], r["to_type"]) for r in event_transitions(df).collect()}
    assert got == {("a", "b")}


# ---------------------------------------------------------------- round 9


def test_event_anomalies_flags_spike(spark):
    import datetime as dt

    from clarite_python_spark.operators.events import event_anomalies

    rows = []
    eid = 0
    # 10 quiet days of ~10 events, then a 100-event spike on day 11
    for d in range(10):
        for _ in range(10 + (d % 2)):  # 10/11 alternating -> nonzero std
            rows.append((eid, "click", dt.datetime(2024, 1, 1 + d, 12)))
            eid += 1
    for _ in range(100):
        rows.append((eid, "click", dt.datetime(2024, 1, 11, 12)))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = {r["day"]: r for r in event_anomalies(df, window=7, z_threshold=3.0).collect()}
    assert out["2024-01-11"]["is_anomaly"] is True
    assert out["2024-01-11"]["z"] > 3
    assert out["2024-01-05"]["is_anomaly"] is False
    # first day has no baseline
    assert out["2024-01-01"]["z"] is None and out["2024-01-01"]["is_anomaly"] is None


def test_event_anomalies_min_history_and_constant_baseline(spark):
    import datetime as dt

    from clarite_python_spark.operators.events import event_anomalies

    rows = []
    eid = 0
    for d in range(6):
        for _ in range(5):  # constant 5/day -> std 0
            rows.append((eid, "view", dt.datetime(2024, 2, 1 + d, 9)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = event_anomalies(df, window=7, min_history=3).collect()
    # constant baseline: std = 0 -> z NULL everywhere
    assert all(r["z"] is None for r in out)
    # days 4+ have enough history but zero variance
    assert out[-1]["base_std"] == 0.0


def test_event_anomalies_validation(spark):
    import pytest as _pt

    from clarite_python_spark.operators.events import event_anomalies

    df = spark.createDataFrame([], "event_type string, ts timestamp")
    with _pt.raises(ValueError):
        event_anomalies(df, window=0)
    with _pt.raises(ValueError):
        event_anomalies(df, min_history=0)


def test_session_stats_hand_computed(spark):
    import datetime as dt

    from clarite_python_spark.operators.events import session_stats

    t0 = dt.datetime(2024, 3, 1, 0)
    rows = [
        # user 1: session A = 3 events over 2h, session B (after >4h gap) = 1 event
        (1, t0, "click", 1.0),
        (1, t0 + dt.timedelta(hours=1), "view", 2.0),
        (1, t0 + dt.timedelta(hours=2), "click", 3.0),
        (1, t0 + dt.timedelta(hours=12), "click", 4.0),
        # user 2: single session of 2 events
        (2, t0, "view", 10.0),
        (2, t0 + dt.timedelta(minutes=30), "view", None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    out = {r["user_id"]: r for r in session_stats(df, gap="4 hours").collect()}
    u1 = out[1]
    assert u1["n_sessions"] == 2 and u1["n_events"] == 4
    assert u1["mean_events"] == 2.0 and u1["max_events"] == 3
    # spans: (2h + 4h gap) and (0 + 4h gap) -> mean 5h = 18000 s
    assert u1["mean_session_secs"] == 18000.0
    assert u1["total_value"] == 10.0
    u2 = out[2]
    assert u2["n_sessions"] == 1 and u2["n_events"] == 2
    # span: 30 min + 4h gap
    assert u2["mean_session_secs"] == 16200.0
    assert u2["total_value"] == 10.0


def test_session_stats_consistent_with_sessionized(spark):
    from clarite_python_spark.operators.events import session_stats
    from clarite_python_spark.sources.io import load_testdata
    from clarite_python_spark.streaming.events import sessionized

    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    stats = session_stats(ev).collect()
    sess = sessionized(ev).groupBy("user_id").count().collect()
    want = {r["user_id"]: r["count"] for r in sess}
    assert {r["user_id"]: r["n_sessions"] for r in stats} == want
