"""Streaming cohort-retention feed via ``applyInPandasWithState``
(extension — the incremental twin of
``operators/events.py:retention_cohorts``).

The batch op counts distinct active users per (cohort, period offset).
Distinct-count state does not stream cheaply — but the FEED underneath
it does: per user, emit one row the FIRST time that user is active in
each period offset. The per-user state is the cohort date plus the set
of offsets already emitted (bounded by the observation horizon in
periods, e.g. 52 rows/user/year at weekly periods — tiny). The
retention triangle is then a plain batch count over the emitted feed:

    stream_retention_feed -> sink -> groupBy(cohort_date,
    period_offset).count()  ==  retention_cohorts(all events)

provided replay is in event-time order per user (a later-arriving
EARLIER event can re-cohort a user in batch but not in the stream —
the standard streaming trade; the parity test drives in-order).

Scale shape: state is one date + a small int set per user; keys
hash-partition across the state store; RocksDB at production scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DateType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["stream_retention_feed"]

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_date", DateType()),
        StructField("period_offset", IntegerType()),
    ]
)

# state: (cohort epoch day, offsets already emitted)
_STATE = StructType(
    [
        StructField("cohort_day", IntegerType()),
        StructField("seen", ArrayType(IntegerType())),
    ]
)


def _make_update(period_days: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        cohort_day, seen = state.get if state.exists else (None, [])
        seen = set(seen)
        new_rows = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            days = (
                pd.to_datetime(rows["ts"]).dt.normalize().astype("int64")
                // 86_400_000_000_000
            ).sort_values()
            for day in days:
                day = int(day)
                if cohort_day is None:
                    cohort_day = day
                off = (day - cohort_day) // period_days
                if off >= 0 and off not in seen:
                    seen.add(off)
                    new_rows.append(off)
        if cohort_day is None:
            return
        state.update((cohort_day, sorted(seen)))
        if not new_rows:
            return
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "cohort_date": pd.Timestamp(cohort_day * 86_400_000_000_000),
                "period_offset": new_rows,
            }
        )

    return _update


def stream_retention_feed(
    spark: SparkSession,
    path: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming first-activity feed; drive with
    ``trigger(availableNow=True)`` + output mode ``update``. The
    distinct (user, cohort, offset) set emitted over an in-order replay
    equals the batch ``retention_cohorts`` feed, so a count over the
    sink reproduces the batch triangle."""
    if period_days <= 0:
        raise ValueError("period_days must be positive")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(path)
        .where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
        )
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _make_update(period_days), _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
