"""Streaming conversion funnel via ``applyInPandasWithState``
(extension — the streaming twin of ``operators/events.py:funnel``).

A funnel is the canonical tiny-state streaming aggregate: per user the
state is one (stage, t, t1) triple — independent of event count — and
the greedy earliest-advance transition is associative over an in-order
replay, so the stream emits each user's CURRENT furthest stage every
micro-batch and, after a full in-order replay, the last emission per
user equals the batch ``funnel`` row exactly (the parity test drives
that with ``availableNow``).

Ordering semantics: the transition folds each micro-batch's rows in
event-time order, but state advances monotonically ACROSS batches — a
late event older than an already-achieved stage time cannot
retroactively advance the funnel (the standard streaming-funnel trade;
bound disorder upstream with a watermark + ``sort`` per batch, or
re-run the batch op for exact history).

Scale shape: keys hash-partition across executors via the state store;
one small tuple per user; RocksDB-backed at production scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["stream_funnel"]

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),
        StructField("stage_ts", TimestampType()),
    ]
)

# state: (stage, t_us, t1_us) — achieved stage + its event time and the
# fixed window anchor, microseconds since epoch (0 = unset)
_STATE = StructType(
    [
        StructField("stage", IntegerType()),
        StructField("t_us", LongType()),
        StructField("t1_us", LongType()),
    ]
)


def _make_update(stage_of: dict[str, int], max_span_us: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        stage, t_us, t1_us = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            # fold this batch in event-time order (ties: stage order,
            # matching the batch op's sort_array over (ts, stage))
            rows = rows.assign(__stage=rows["event_type"].map(stage_of))
            rows = rows.dropna(subset=["__stage", "ts"]).sort_values(
                ["ts", "__stage"]
            )
            for ts, st_ in zip(rows["ts"], rows["__stage"]):
                us = int(pd.Timestamp(ts).value // 1000)
                if int(st_) != stage + 1:
                    continue
                if stage > 0 and us <= t_us:
                    continue
                if (
                    max_span_us is not None
                    and t1_us > 0
                    and us > t1_us + max_span_us
                ):
                    continue
                stage += 1
                t_us = us
                if t1_us == 0:
                    t1_us = us
        state.update((stage, t_us, t1_us))
        if stage == 0:
            return
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "stage": stage,
                    "stage_ts": pd.Timestamp(t_us * 1000),
                }
            ]
        )

    return _update


def stream_funnel(
    spark: SparkSession,
    path: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_span_seconds: float | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming funnel; drive with
    ``trigger(availableNow=True)`` + output mode ``update``. After an
    in-order replay the final emission per user equals the batch
    ``funnel`` row."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(path)
        .where(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(type_col).alias("event_type"),
        )
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    update = _make_update(
        {s: i + 1 for i, s in enumerate(steps)},
        int(max_span_seconds * 1_000_000) if max_span_seconds is not None else None,
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
