"""Streaming volume-anomaly monitor via ``applyInPandasWithState``
(extension — the streaming twin of ``operators/events.py:
event_anomalies``).

State per group is the trailing (day, count) table, truncated to the
``window`` + 1 most recent days — O(window) longs per key, independent
of event volume. Each micro-batch folds its events into the day
counts and re-emits every touched day's row, z-scored against the
``window`` PRESENT days strictly before it (same trailing-ROWS
semantics as the batch operator, sample std, NULL z below
``min_history`` or on a constant baseline).

A day's count accumulates across batches, so intermediate emissions
carry partial counts; the LAST emission per (group, day) — once no
later batch touches that day — equals the batch operator's row
exactly (parity-tested with a single availableNow batch, and
cross-batch accumulation tested explicitly). Late data older than the
truncated state cannot retroactively adjust a baseline — the same
disorder trade every twin in streaming/ documents; bound it upstream
with a watermark or re-run the batch op for exact history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["stream_event_anomalies"]

_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", StringType()),
        StructField("n_events", LongType()),
        StructField("base_mean", DoubleType()),
        StructField("base_std", DoubleType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

# state: ascending epoch-days + their counts, truncated to window + 1
_STATE = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _make_update(window: int, z_threshold: float, min_history: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        days, counts = state.get if state.exists else ([], [])
        hist = dict(zip(days, counts))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.dropna(subset=["ts"])
        out = []
        if len(rows):
            day_of = (
                pd.to_datetime(rows["ts"]).dt.normalize().astype("int64")
                // 86_400_000_000_000
            )
            adds = day_of.value_counts().sort_index()
            for d, add in adds.items():
                hist[int(d)] = hist.get(int(d), 0) + int(add)
            ordered = sorted(hist)
            for d in sorted(int(x) for x in adds.index):
                prior = [hist[p] for p in ordered if p < d][-window:]
                n = hist[d]
                bm = bs = z = None
                anom = None
                if prior:
                    s = pd.Series(prior, dtype="float64")
                    bm = float(s.mean())
                    bs = float(s.std(ddof=1)) if len(s) > 1 else None
                    if len(s) >= min_history and bs is not None and bs > 0:
                        z = (n - bm) / bs
                        anom = abs(z) >= z_threshold
                out.append(
                    {
                        "event_type": key[0],
                        "day": pd.Timestamp(d * 86_400_000_000_000).strftime(
                            "%Y-%m-%d"
                        ),
                        "n_events": n,
                        "base_mean": round(bm, 6) if bm is not None else None,
                        "base_std": round(bs, 6) if bs is not None else None,
                        "z": round(z, 6) if z is not None else None,
                        "is_anomaly": anom,
                    }
                )
        ordered = sorted(hist)[-(window + 1) :]
        state.update((ordered, [hist[d] for d in ordered]))
        if out:
            yield pd.DataFrame(out)

    return _update


def stream_event_anomalies(
    spark: SparkSession,
    path: str,
    window: int = 7,
    z_threshold: float = 3.0,
    min_history: int = 3,
    by: str = "event_type",
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming anomaly monitor; drive with
    ``trigger(availableNow=True)`` + output mode ``update``. The last
    emission per (group, day) equals the batch ``event_anomalies``
    row."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_history < 1:
        raise ValueError("min_history must be >= 1")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(path)
        .where(F.col(by).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(by).alias("event_type"),
            F.col(ts_col).cast("timestamp").alias("ts"),
        )
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    update = _make_update(window, z_threshold, min_history)
    return stream.groupBy("event_type").applyInPandasWithState(
        update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
