"""Temporal joins Spark lacks as built-ins, expressed as compositions of
existing DataFrame ops (extension — the reference is row-static QC and
has no temporal operators).

``asof_join`` is THE canonical "custom operator on Spark" case: the
naive formulation is a range join (``l.ts >= r.ts`` + argmax), which
Catalyst executes as a broadcast-nested-loop / cartesian — O(n·m) and
dead at scale. The scalable formulation used here is the classic
union-and-scan:

1. union the two sides into one keyed event stream (right payload
   columns NULL on left rows and vice versa),
2. ONE hash shuffle on the key + ONE sort on (ts, side),
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   running window carries the most recent right row forward onto each
   left row,
4. keep left rows; optionally null out matches older than ``tolerance``.

Cost is exactly a groupBy-shaped shuffle + sort — linear in rows,
skew-bound by the hottest key like any keyed window, no pair explosion.
This is also precisely the plan a streaming as-of would use with state
(last right row per key), so batch and stream semantics line up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "fuzzy_join"]


def _seconds(df: DataFrame, name: str, col: Column | None = None) -> Column:
    """Numeric columns stay in their own units; TIMESTAMP / TIMESTAMP_NTZ
    (which Spark 4 refuses to cast straight to double, even via try_cast)
    go timestamp -> epoch seconds. Branches on the SCHEMA type because no
    single cast expression analyzes for both families."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    c = F.col(name) if col is None else col
    if isinstance(df.schema[name].dataType, (TimestampType, TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: attach to every left row the single right row
    with the largest ``on`` <= left's (``direction="backward"``; ties
    include equality, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    and pandas ``merge_asof``) or smallest >= (``"forward"``), per
    ``by`` key. Unmatched left rows keep NULL payloads (left join).

    ``right_cols`` selects the right payload (default: every right
    column except ``on``/``by``); each appears as ``<col><suffix>`` if it
    collides with a left name, plus ``<on><suffix>`` = the matched right
    timestamp. ``tolerance`` (seconds, or ``on``'s native units for
    numeric columns) nulls out matches further than that from the left
    row — rows are kept, payloads nulled, again merge_asof semantics.

    If several RIGHT rows share the same (key, ``on``) value, which of
    them wins is unspecified (pandas picks input order, which has no
    distributed analogue) — pre-aggregate the right side to one row per
    (key, time) when that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in keys]
    bad = [c for c in right_cols if c in (on, *keys)]
    if bad:
        raise ValueError(f"right_cols overlaps join keys: {bad}")

    out_name = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    on_right = on + suffix
    out_cols = [c for c in left.columns] + list(out_name.values()) + [on_right]
    dupes = sorted({c for c in out_cols if out_cols.count(c) > 1})
    if dupes:
        raise ValueError(
            f"output column(s) {dupes} would be duplicated; pass a different suffix"
        )

    # union schema: keys + on + __side + left columns + right payload
    lhs = left.select(
        *keys,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on and c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_name[c]) for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(on_right),
    )
    # a right row with NULL `on` can never be "the most recent at-or-
    # before" anything — dropping it here also keeps it from sorting
    # NULLS FIRST and leaking its payload onto unmatched left rows.
    # Left rows with NULL `on` are kept (left join) and get NULL payloads
    # for the same NULLS-FIRST reason: nothing precedes them.
    rhs = right.where(F.col(on).isNotNull()).select(
        *keys,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in keys],
        *[F.col(c).alias(out_name[c]) for c in right_cols],
        F.col(on).alias(on_right),
    )
    both = lhs.unionByName(rhs)

    # NULLS FIRST in BOTH directions: a left row with NULL `on` then has
    # no right row before it in the scan, so it gets NULL payloads
    # instead of inheriting whatever came last.
    ts_order: Column = (
        F.col(on).asc_nulls_first() if direction == "backward" else F.col(on).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*(keys or [F.lit(1)]))
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(out_name[c], ignorenulls=True).over(w).alias(out_name[c]) for c in right_cols]
    carried.append(F.last(on_right, ignorenulls=True).over(w).alias(on_right))

    joined = both.select(
        *keys, on, "__side",
        *[c for c in left.columns if c != on and c not in keys],
        *carried,
    ).where(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        lts = _seconds(left, on)
        rts = _seconds(right, on, F.col(on_right))
        gap = (lts - rts) if direction == "backward" else (rts - lts)
        ok = F.col(on_right).isNotNull() & (gap <= F.lit(float(tolerance)))
        null_cols = {out_name[c]: F.when(ok, F.col(out_name[c])) for c in right_cols}
        null_cols[on_right] = F.when(ok, F.col(on_right))
        joined = joined.withColumns(null_cols)
    return joined


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bin_width: float = 3600.0,
    inclusive_end: bool = True,
    suffix: str = "_ivl",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start <= point <= end`` (``< end`` when ``inclusive_end=False``),
    optionally per ``by`` key. Inner join: points in no interval drop,
    points in several intervals appear once per interval.

    Open-source Spark executes an inequality join as a broadcast-nested
    -loop / cartesian — O(n·m). This instead BINS time: each interval is
    exploded to the ``width``-sized bins it touches, each point computes
    its single bin, and the pair candidates come from an EQUI-join on
    (key, bin) that Catalyst shuffles/broadcasts like any other; the
    exact predicate then filters within candidates. Cost is linear with
    an explode factor of ~(interval length / bin_width + 1) — pick
    ``bin_width`` near the median interval length, keeping the factor
    ~2. A runaway interval (> ``max_bins_per_interval`` bins) fails
    fast with an explicit error rather than exploding a task.

    Interval columns keep their names (``suffix``-renamed on collision
    with a point column). Timestamps are binned on epoch seconds;
    numeric columns on their own units.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    ivl_cols = [c for c in intervals.columns if c not in keys]
    out_name = {c: (c + suffix if c in points.columns else c) for c in ivl_cols}
    i = intervals.select(
        *keys, *[F.col(c).alias(out_name[c]) for c in ivl_cols]
    )
    s_bin = F.floor(_seconds(intervals, start_col, F.col(out_name[start_col])) / w).cast("long")
    e_raw = _seconds(intervals, end_col, F.col(out_name[end_col])) / w
    e_bin = F.floor(e_raw).cast("long")
    # half-open intervals whose end sits exactly on a bin edge don't
    # touch that bin
    if not inclusive_end:
        e_bin = F.when(e_raw == F.floor(e_raw), e_bin - 1).otherwise(e_bin)
    n_bins = e_bin - s_bin + 1
    # assert_true RAISES on NULL input, so coalesce: a NULL-boundary or
    # reversed (end < start) interval passes the guard and instead yields
    # no bins below — explode_outer drops it, matching the join predicate
    # (no point satisfies start <= ts <= end when either is NULL/reversed).
    guard = F.assert_true(
        F.coalesce(n_bins <= F.lit(max_bins_per_interval), F.lit(True)),
        F.concat(
            F.lit("interval spans too many bins ("),
            n_bins.cast("string"),
            F.lit(f" > {max_bins_per_interval}); raise bin_width"),
        ),
    )
    bins = F.when(guard.isNull() & (e_bin >= s_bin), F.sequence(s_bin, e_bin))
    i = i.withColumn("__bin", F.explode_outer(bins))
    p = points.withColumn("__bin", F.floor(_seconds(points, point_col) / w).cast("long"))

    pa, ia = p.alias("__p"), i.alias("__i")
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in keys:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = cond & (F.col(point_col) >= F.col(out_name[start_col]))
    end_pred = (
        F.col(point_col) <= F.col(out_name[end_col])
        if inclusive_end
        else F.col(point_col) < F.col(out_name[end_col])
    )
    cond = cond & end_pred
    return (
        pa.join(ia, cond, "inner")
        .select(
            *[F.col(f"__p.{c}") for c in points.columns],
            *[F.col(f"__i.{out_name[c]}") for c in ivl_cols],
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Blocked Levenshtein join — the record-linkage / entity-resolution
    primitive: every (left, right) pair whose ``left_col``/``right_col``
    edit distance is <= ``max_distance``, WITHOUT a cartesian product.

    Blocking: |len(a) − len(b)| <= d is a necessary condition of edit
    distance d, so the left side explodes to the 2d+1 length bands it
    can match and the join is an EQUI-join on the band (each true pair
    meets in exactly one band — no post-join dedup needed). Verification
    uses Spark's thresholded ``levenshtein(l, r, d)`` (early-exits above
    d; returns −1 there, the distance otherwise) — pure codegen.

    Length blocking alone is weak on natural text (many strings share a
    length): pass ``block_cols`` (a column name per side — zip code,
    first token, a phonetic key) to add an equi-key that actually
    partitions the data; candidates then require BOTH. That composite
    key is the 100-TB lever — the plan is an ordinary shuffled equi-join
    on (band, block), skew-diagnosable like any other join.

    Right-side columns that collide with left names return suffixed
    ``_r``. Output adds an integer ``distance`` column.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    d = int(max_distance)
    lcols = set(left.columns)
    ren = {c: f"{c}_r" for c in right.columns if c in lcols}
    r = right
    for old, new in ren.items():
        if new in lcols or new in right.columns:
            raise ValueError(f"suffixed column {new!r} already exists")
        r = r.withColumnRenamed(old, new)
    rcol = ren.get(right_col, right_col)
    rblock = None
    if block_cols is not None:
        lblock, rblock_orig = block_cols
        rblock = ren.get(rblock_orig, rblock_orig)

    lx = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.length(left_col) - F.lit(d), F.length(left_col) + F.lit(d)
            )
        ),
    )
    rx = r.withColumn("__band", F.length(rcol))
    if rblock is None:
        joined = lx.join(rx, on=["__band"])
    else:
        joined = lx.join(
            rx,
            (lx["__band"] == rx["__band"])
            & (F.col(block_cols[0]) == F.col(rblock)),
        ).drop(rx["__band"])
    dist = F.levenshtein(F.col(left_col), F.col(rcol), d)
    return (
        joined.withColumn("distance", dist)
        .where(F.col("distance") >= 0)
        .drop("__band")
    )
