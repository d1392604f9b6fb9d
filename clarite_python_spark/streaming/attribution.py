"""Streaming conversion attribution via ``applyInPandasWithState``
(extension — the streaming twin of ``operators/events.py:attribution``).

Attribution is another tiny-state streaming aggregate: per user the
state is ONE touch tuple — the most recent touch for ``last_touch``,
the earliest ever for ``first_touch`` — independent of event count.
Each micro-batch folds its rows in strict (ts, event id) order,
updating the touch state and emitting one attribution row per
conversion as it passes, so a conversion is credited exactly like the
batch operator's strictly-prior window: a same-timestamp touch with a
larger event id does NOT get credit.

After a full in-order replay the emitted rows equal the batch
``attribution`` result exactly (parity-tested with ``availableNow``).
The cross-batch caveat is the same as the streaming funnel: a late
touch arriving after a conversion was already emitted cannot
retroactively re-credit it — bound disorder upstream with a watermark,
or re-run the batch op for exact history.

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
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["stream_attribution"]

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("channel", StringType()),
        StructField("touch_ts", TimestampType()),
        StructField("touch_event_id", LongType()),
    ]
)

# state: the credited-touch candidate — (has_touch, t_us, event id,
# channel). The explicit has_touch flag (not a t_us==0 sentinel) keeps a
# legitimate touch at or before epoch 1970-01-01 creditable.
_STATE = StructType(
    [
        StructField("has_touch", LongType()),
        StructField("t_us", LongType()),
        StructField("touch_id", LongType()),
        StructField("channel", StringType()),
    ]
)


def _make_update(
    conversion: str,
    channels: set[str] | None,
    model: str,
    lookback_us: int | None,
):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        has, t_us, tid, ch = state.get if state.exists else (0, 0, 0, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        out: list[dict] = []
        if len(rows):
            rows = rows.dropna(subset=["ts", "event_id"]).sort_values(
                ["ts", "event_id"]
            )
            for ts, eid, etype, value in zip(
                rows["ts"], rows["event_id"], rows["event_type"], rows["value"]
            ):
                us = int(pd.Timestamp(ts).value // 1000)
                if etype == conversion:
                    ok = bool(has)
                    if ok and lookback_us is not None and t_us < us - lookback_us:
                        ok = False
                    out.append(
                        {
                            "user_id": key[0],
                            "event_id": int(eid),
                            "ts": pd.Timestamp(us * 1000),
                            "value": float(value) if pd.notna(value) else None,
                            "channel": ch if ok else None,
                            "touch_ts": pd.Timestamp(t_us * 1000) if ok else pd.NaT,
                            "touch_event_id": int(tid) if ok else None,
                        }
                    )
                elif etype is not None and pd.notna(etype) and (
                    channels is None or etype in channels
                ):
                    # null-typed events are never touches — matches the
                    # batch operator, whose `col(type_col) != conversion`
                    # is NULL (ignored) for null event types
                    if model == "last_touch" or not has:
                        has, t_us, tid, ch = 1, us, int(eid), str(etype)
        state.update((has, t_us, tid, ch))
        if out:
            yield pd.DataFrame(out)

    return _update


def stream_attribution(
    spark: SparkSession,
    path: str,
    conversion: str = "purchase",
    channels: list[str] | None = None,
    model: str = "last_touch",
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming attribution; drive with
    ``trigger(availableNow=True)`` + output mode ``update``. After an
    in-order replay the emitted rows equal the batch ``attribution``
    result exactly (see operators/events.py:attribution for the credit
    semantics this twin preserves)."""
    if model not in ("last_touch", "first_touch"):
        raise ValueError(f"model must be last_touch or first_touch, got {model!r}")
    if channels is not None and conversion in channels:
        raise ValueError("conversion type cannot also be a channel")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(type_col).alias("event_type"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    update = _make_update(
        conversion,
        set(channels) if channels is not None else None,
        model,
        int(lookback_seconds * 1_000_000) if lookback_seconds is not None else None,
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
