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

__all__ = ["asof_join"]


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

    # union schema: keys + on + __side + left columns + right payload
    lhs = left.select(
        *keys,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on and c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_name[c]) for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(on_right),
    )
    rhs = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in keys],
        *[F.col(c).alias(out_name[c]) for c in right_cols],
        F.col(on).alias(on_right),
    )
    both = lhs.unionByName(rhs)

    ts_order: Column = F.col(on).asc() if direction == "backward" else F.col(on).desc()
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
        lts, rts = F.col(on).cast("double"), F.col(on_right).cast("double")
        gap = (lts - rts) if direction == "backward" else (rts - lts)
        ok = F.col(on_right).isNotNull() & (gap <= F.lit(float(tolerance)))
        null_cols = {out_name[c]: F.when(ok, F.col(out_name[c])) for c in right_cols}
        null_cols[on_right] = F.when(ok, F.col(on_right))
        joined = joined.withColumns(null_cols)
    return joined
