"""Custom stateful streaming operator via ``applyInPandasWithState``
(extension — SURVEY.md §2.12; the reference is pure batch).

``session_window`` / ``dropDuplicatesWithinWatermark`` cover the
declarative stateful shapes; this module is the escape hatch the brief's
"custom stateful operators" bullet points at: an incrementally-updated
per-key aggregate that Spark's built-in streaming aggs cannot express —
here, running moment statistics (count / sum / mean / sample variance
via a merge-safe (n, Σx, Σx²) triple) emitted EVERY micro-batch, so a
monitor sees per-user statistics converge as events arrive rather than
waiting for a window to close.

Scale shape: state is one 4-tuple of doubles per key, independent of
event count — the streaming analogue of a map-side-combined groupBy.
Keys are hash-partitioned across executors by the state store exactly
like a batch shuffle; RocksDB state store at production scale.

Batch/stream parity: after a full replay the last emitted row per key
equals the batch ``user_stats`` aggregate (tests/test_streaming_state.py).
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
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["user_stats", "stream_user_stats"]

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("mean_value", DoubleType()),
        StructField("var_value", DoubleType()),
    ]
)

# state: (n, sum, sumsq) — mergeable sufficient statistics, O(1) per key
_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("ss", DoubleType()),
    ]
)


def user_stats(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Batch twin: per-key count/sum/mean/sample-variance in one agg."""
    return events.groupBy(F.col(key_col).alias("user_id")).agg(
        F.count(value_col).alias("n_events"),
        F.sum(value_col).alias("total_value"),
        F.avg(value_col).alias("mean_value"),
        F.var_samp(value_col).alias("var_value"),
    )


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
) -> Iterator[pd.DataFrame]:
    """Arrow-batched state transition: fold this micro-batch's rows into
    the (n, Σx, Σx²) triple and emit the updated statistics."""
    n, s, ss = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        v = pdf["value"].dropna()
        n += int(v.size)
        s += float(v.sum())
        ss += float((v * v).sum())
    state.update((n, s, ss))
    if n == 0:
        return
    mean = s / n
    var = (ss - n * mean * mean) / (n - 1) if n > 1 else None
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": s, "mean_value": mean, "var_value": var}]
    )


def stream_user_stats(
    spark: SparkSession,
    path: str,
    key_col: str = "user_id",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming running stats; drive with
    ``trigger(availableNow=True)`` + output mode ``update``. The final
    emission per key equals the batch ``user_stats`` row."""
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path).select(
        F.col(key_col).alias("user_id"), F.col(value_col).alias("value")
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
