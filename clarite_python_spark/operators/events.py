"""Product-analytics operators over event streams: conversion funnels
and cohort retention.

Extension layer (the reference is a QC/EWAS library; these are the
batch OLAP staples an events warehouse runs daily, included for query
parity with analytics engines). Both operators are single-keyed-shuffle
plans: everything per-user happens inside one hash partition of the
user key, and the final result is O(#stages) or O(#cohorts x #periods)
rows — nothing user-level ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "funnel",
    "funnel_counts",
    "funnel_times",
    "retention_cohorts",
    "event_transitions",
    "attribution",
    "event_anomalies",
    "session_stats",
]


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_span_seconds: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: for each user, the furthest step of
    ``steps`` reached IN ORDER (step k+1 must occur STRICTLY after the
    time at which step k was first achieved). With ``max_span_seconds``
    the whole funnel must complete within that span of the user's FIRST
    step-1 event (fixed anchor — no re-anchoring on later step-1
    events; the standard product-analytics windowed funnel). Returns
    one row per user: (user, stage) with stage in [1, len(steps)];
    users with no first-step event are absent.

    The greedy earliest-advance scan is equivalent to the textbook
    recursion t_k = min{ts of step-k events with t_{k-1} < ts
    [<= t_1 + span]} (advance at the first eligible event == the
    minimum eligible timestamp), so a fixed-depth SQL twin with one
    min-join per stage reproduces it exactly — that equivalence is
    what the oracle checks.

    Plan: filter to funnel events (pushed to the scan), one groupBy
    user collecting that user's funnel events as a sorted array (rows
    per user are bounded by their own event count — the same per-key
    footprint as any sessionization), then a row-local ``aggregate``
    scan. One shuffle on the user key; no window, no self-joins — the
    N-stage alternative of N cascaded min-joins would shuffle N times.

    Skew guard: the per-user array is bounded by that user's (already
    step-filtered) event count; one bot user with 10^8 funnel events is
    a straggler task. ``max_events_per_user`` drops users whose
    step-event count exceeds the cap BEFORE the collect (a cheap
    map-side-combined count on the same user key — AQE reuses the
    partitioning), the standard bot-exclusion semantics.
    """
    ev = _funnel_events(
        df, steps, user_col, type_col, ts_col, max_span_seconds, max_events_per_user
    )
    scanned = _funnel_scan(ev, user_col, max_span_seconds)
    return scanned.select(
        user_col,
        F.size("stage_times").alias("stage"),
        F.element_at("stage_times", -1).alias("stage_ts"),
    ).where(F.col("stage") > 0)


def _funnel_events(
    df: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_col: str,
    max_span_seconds: float | None,
    max_events_per_user: int | None,
) -> DataFrame:
    """Shared validation + event prep for the funnel family: filter to
    the funnel steps, drop null users and events whose timestamp is null
    or uncastable (a null __ts would sort FIRST and freeze the greedy
    scan at a null anchor — every later comparison is null), stamp the
    1-based stage number, and optionally drop over-cap users."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    if max_span_seconds is not None and max_span_seconds <= 0:
        raise ValueError("max_span_seconds must be positive")
    if max_events_per_user is not None and max_events_per_user <= 0:
        raise ValueError("max_events_per_user must be positive")
    stage_of: Column = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        stage_of = F.when(F.col(type_col) == s, F.lit(len(steps) - i)).otherwise(stage_of)
    ev = (
        df.where(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col),
            F.col(ts_col).cast("timestamp").alias("__ts"),
            stage_of.alias("__stage"),
        )
        .where(F.col(user_col).isNotNull() & F.col("__ts").isNotNull())
    )
    if max_events_per_user is not None:
        keep = (
            ev.groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_events_per_user)
            .select(user_col)
        )
        ev = ev.join(keep, user_col, "left_semi")
    return ev


def _funnel_scan(ev, user_col: str, max_span_seconds: float | None):
    """Shared greedy scan: returns (user, stage_times array) — element k
    is the time stage k+1 was first achieved (empty = stage 0)."""
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("__ts", "__stage"))).alias("__evs")
    )
    # scan state: the achieved-stage time list (its size IS the stage;
    # first element is the fixed window anchor)
    init = F.expr("cast(array() as array<timestamp>)")

    def advance(st, e):
        ok = (e["__stage"] == F.size(st) + 1) & (
            (F.size(st) == 0) | (e["__ts"] > F.element_at(st, -1))
        )
        if max_span_seconds is not None:
            deadline = F.element_at(st, 1) + F.expr(
                f"INTERVAL {float(max_span_seconds)} SECOND"
            )
            ok = ok & ((F.size(st) == 0) | (e["__ts"] <= deadline))
        return F.when(ok, F.concat(st, F.array(e["__ts"]))).otherwise(st)

    return per_user.select(
        user_col,
        F.aggregate(F.col("__evs"), init, advance).alias("stage_times"),
    )


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_span_seconds: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Per-user per-stage achievement times: one row per (user, stage
    reached) with the stage's first-achievement timestamp and the
    integer-microsecond duration since the PREVIOUS stage (NULL for
    stage 1) — the row-level input to time-to-convert analytics. Same
    greedy scan (and oracle recursion) as :func:`funnel`; the explode
    is row-local."""
    ev = _funnel_events(
        df, steps, user_col, type_col, ts_col, max_span_seconds, max_events_per_user
    )
    scanned = _funnel_scan(ev, user_col, max_span_seconds)
    ex = scanned.select(
        user_col,
        F.col("stage_times").alias("__times"),
        F.posexplode("stage_times").alias("__pos", "stage_ts"),
    ).select(
        user_col,
        (F.col("__pos") + 1).alias("stage"),
        "stage_ts",
        F.when(
            F.col("__pos") > 0,
            F.unix_micros(F.col("stage_ts"))
            - F.unix_micros(F.element_at(F.col("__times"), F.col("__pos"))),
        ).alias("since_prev_us"),
    )
    return ex


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_span_seconds: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Funnel summary: for each stage k (one row per stage, even fully
    converted ones), how many users reached stage k OR FURTHER — the
    classic decreasing funnel bar chart. Derived from :func:`funnel`
    with one tiny agg."""
    per_user = funnel(
        df, steps, user_col, type_col, ts_col, max_span_seconds, max_events_per_user
    )
    reached = per_user.groupBy("stage").agg(F.count(F.lit(1)).alias("n_exact"))
    stages = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    full = stages.join(reached, "stage", "left").fillna(0, subset=["n_exact"])
    # cumulative from the top: users at stage >= k. The unpartitioned
    # window is over O(#stages) rows — already reduced, not event data.
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("stage")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return full.select(
        "stage", F.sum("n_exact").over(w).alias("n_users")
    ).orderBy("stage")


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the date of
    their FIRST event; for every (cohort_date, period offset) the
    number of distinct cohort users active in that period. The standard
    growth-analytics rollup.

    Plan: one groupBy(user) min to form cohorts (map-side combined),
    joined back to the events on the user key, then one
    (cohort, offset) distinct-count agg. The cohort table is O(#users)
    and keyed identically to the events shuffle; at warehouse scale the
    first agg's partitioning is reused by the join (no extra exchange
    under AQE).

    ``approx=True`` switches the per-(cohort, period) distinct-user
    count to ``approx_count_distinct`` (HyperLogLog++, relative error
    ``rsd``, mergeable constant-size sketches): the exact count keeps a
    per-group user hash set through the shuffle, which at 100 TB of
    events is the rollup's dominant cost; the sketch is O(1) per group.
    """
    if period_days <= 0:
        raise ValueError("period_days must be positive")
    if not 0 < rsd < 1:
        raise ValueError("rsd must be in (0, 1)")
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    cohorts = (
        df.select(F.col(user_col), day.alias("__day"))
        .groupBy(user_col)
        .agg(F.min("__day").alias("cohort_date"))
    )
    joined = df.select(F.col(user_col), day.alias("__day")).join(cohorts, user_col)
    offset = F.floor(
        F.datediff(F.col("__day"), F.col("cohort_date")) / F.lit(period_days)
    ).cast("int")
    n_users = (
        F.approx_count_distinct(user_col, rsd)
        if approx
        else F.countDistinct(user_col)
    )
    return (
        joined.select(user_col, "cohort_date", offset.alias("period_offset"))
        .groupBy("cohort_date", "period_offset")
        .agg(n_users.alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov structure of the event stream: for every
    user's time-ordered events, count adjacent (from_type, to_type)
    transitions and the conditional next-step probability
    p = n / Σ_to n — the "what do users do next" matrix behind path
    analysis, next-action dashboards, and funnel hypothesis mining.

    Plan: ONE shuffle on the user key; the next event is a ``lead()``
    window over (ts, id) within the user partition (row-local, ties
    broken by the event id for engine-stable ordering); then a
    (from, to) count agg — map-side combined, output O(#types²) rows.
    Null users/timestamps are excluded up front (a null ``lead``
    anchor would silently fabricate cross-user transitions after a
    repartition). The probability normalization is a window over the
    already-aggregated O(#types²) table — nothing user-level survives
    the agg.

    Returns (from_type, to_type, n, p), ordered by (from_type, to_type).
    """
    from pyspark.sql import Window

    ev = df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = (
        ev.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("from_type")
    return (
        counts.withColumn("p", F.round(F.col("n") / F.sum("n").over(wf), 6))
        .orderBy("from_type", "to_type")
    )


def attribution(
    df: DataFrame,
    conversion: str = "purchase",
    channels: list[str] | None = None,
    model: str = "last_touch",
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing-style conversion attribution: for every ``conversion``
    event, the channel (event type) of the touch that gets credit —
    ``last_touch`` (most recent prior channel event) or ``first_touch``
    (user's earliest channel event), the two standard single-touch
    models.

    "Prior" is strict: a touch counts only if it sorts before the
    conversion under (ts, event id) — a same-timestamp touch with a
    larger id does NOT get credit, and that total order makes the
    result engine-reproducible. ``channels=None`` counts every
    non-conversion type as a touch. ``lookback_seconds`` voids credit
    when the selected touch is older than the window (channel/touch
    columns go NULL = unattributed); under ``first_touch`` the
    candidate is still the user's FIRST touch — if that first touch
    has aged out, the conversion is unattributed rather than credited
    to a later touch (the usual strict first-touch reading).

    Plan: ONE shuffle on the user key; both models are a single
    ignore-nulls first/last over the running rows-frame (no self-join,
    no per-conversion scan). The per-user window sort has the same
    skew footprint as sessionization — cap bot users upstream the way
    :func:`funnel` documents. Returns one row per conversion:
    (user, event id, ts, value, channel, touch_ts, touch_event_id).
    """
    if model not in ("last_touch", "first_touch"):
        raise ValueError(
            f"model must be last_touch or first_touch, got {model!r}"
        )
    if channels is not None and conversion in channels:
        raise ValueError("conversion type cannot also be a channel")
    from pyspark.sql import Window

    is_touch = (
        F.col(type_col).isin(list(channels))
        if channels is not None
        else F.col(type_col) != F.lit(conversion)
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        is_touch,
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("c"),
        ),
    )
    pick = F.last if model == "last_touch" else F.first
    out = df.withColumn("__touch", pick(touch, ignorenulls=True).over(w)).where(
        F.col(type_col) == F.lit(conversion)
    )
    ok = F.col("__touch").isNotNull()
    if lookback_seconds is not None:
        # interval arithmetic (not an epoch cast): works for TIMESTAMP
        # and TIMESTAMP_NTZ alike under ANSI mode
        ok = ok & (
            F.col("__touch.t")
            >= F.col(ts_col)
            - F.make_dt_interval(secs=F.lit(float(lookback_seconds)))
        )
    return out.select(
        F.col(user_col),
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        F.when(ok, F.col("__touch.c")).alias("channel"),
        F.when(ok, F.col("__touch.t")).alias("touch_ts"),
        F.when(ok, F.col("__touch.i")).alias("touch_event_id"),
    )


def event_anomalies(
    df: DataFrame,
    window: int = 7,
    z_threshold: float = 3.0,
    by: str = "event_type",
    ts_col: str = "ts",
    min_history: int = 3,
) -> DataFrame:
    """Volume-anomaly detection on the event stream: per ``by`` group,
    each day's event count is z-scored against the trailing ``window``
    PRESENT days (strictly prior — today never contaminates its own
    baseline), flagged when |z| >= ``z_threshold``. "Present days" means
    days with at least one event: the ROWS frame skips calendar gaps, so
    on a sparse stream the baseline may reach further back than
    ``window`` calendar days (a zero-count day contributes no row rather
    than a 0 to the baseline — consistent across this operator, its
    streaming twin and the oracle). The first ``min_history`` days of a
    group have no defensible baseline and report NULL z — a monitoring
    query must distinguish "new stream" from "quiet stream".

    Baseline mean/std use the sample std (ddof=1, ``F.stddev``); a
    constant baseline (std = 0) also reports NULL z rather than ±inf.

    Plan: one map-side-combined (group, day) count agg — the raw stream
    collapses before any window — then two window functions over the
    tiny daily table partitioned by group. At 100 TB the expensive scan
    is the count agg, which is the minimum any volume monitor pays; the
    window runs over #groups × #days rows.

    Returns (by, day string, n_events, base_mean, base_std, z,
    is_anomaly) ordered by (by, day).
    """
    from pyspark.sql import Window

    if window < 1:
        raise ValueError("window must be >= 1")
    if min_history < 1:
        raise ValueError("min_history must be >= 1")
    daily = (
        df.where(F.col(by).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(by), F.date_trunc("day", F.col(ts_col)).alias("__day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__day")
        .rowsBetween(-window, -1)
    )
    base_mean = F.avg("n_events").over(w)
    base_std = F.stddev("n_events").over(w)
    base_n = F.count("n_events").over(w)
    z = F.when(
        (base_n >= min_history) & (base_std > 0),
        (F.col("n_events") - base_mean) / base_std,
    )
    return (
        daily.select(
            F.col(by),
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round(base_mean, 6).alias("base_mean"),
            F.round(base_std, 6).alias("base_std"),
            F.round(z, 6).alias("z"),
            F.when(z.isNotNull(), F.abs(z) >= F.lit(float(z_threshold))).alias(
                "is_anomaly"
            ),
        )
        .orderBy(by, "day")
    )


def session_stats(
    df: DataFrame,
    gap: str = "4 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user session rollup over :func:`streaming.events.sessionized`
    sessions: session count, event totals, mean/max events per session,
    mean session span in seconds (Spark session-window span: last event
    + gap − first event), and total value — the engagement table a
    clickstream warehouse derives right after sessionization.

    Plan: sessionization's one (user, merged-window) keyed shuffle, then
    a second agg on the user key over the O(#sessions) table — AQE
    coalesces the already-partitioned key. Nothing event-level survives
    the first agg.
    """
    from clarite_python_spark.streaming.events import sessionized

    s = sessionized(
        df, gap=gap, key_col=user_col, ts_col=ts_col, value_col=value_col
    )
    # cast: unix_micros rejects TIMESTAMP_NTZ (the rebuilt testdata ts
    # type); the difference is timezone-invariant
    dur_us = F.unix_micros(F.col("session_end").cast("timestamp")) - F.unix_micros(
        F.col("session_start").cast("timestamp")
    )
    return (
        s.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.avg("n_events"), 6).alias("mean_events"),
            F.max("n_events").alias("max_events"),
            F.round(F.avg(dur_us) / F.lit(1e6), 6).alias("mean_session_secs"),
            F.round(F.sum("total_value"), 4).alias("total_value"),
        )
        .orderBy(user_col)
    )
