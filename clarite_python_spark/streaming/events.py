"""Structured Streaming over the ``events`` table (extension — the
reference is pure batch, SURVEY.md §2.12).

The same windowed aggregation is exposed twice:
- ``windowed_counts(df)`` — batch form, used by the DuckDB oracle;
- ``stream_windowed_counts(spark, path)`` — streaming form with a
  watermark for late data; drive it with ``trigger(availableNow=True)``
  to process a static directory end-to-end in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-event-type counts + value sums (batch)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, path: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: file source -> watermark -> windowed agg.

    The watermark bounds state: rows later than ``watermark`` behind the
    max seen event time are dropped and their windows finalized — the
    standard late-data contract."""
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    # withWatermark requires TIMESTAMP; parquet may deliver TIMESTAMP_NTZ.
    # Session TZ is pinned UTC so the cast is semantics-preserving.
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
