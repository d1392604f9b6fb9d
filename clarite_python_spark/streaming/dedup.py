"""Streaming exact deduplication (extension — the reference is pure
batch; this is the continuous-ingest form of ``operators.dedup``).

A training-data ingest pipeline dedups as documents ARRIVE: fingerprint
each document (same md5-of-normalized-text key as the batch
``exact_dedup``) and keep the first occurrence.

Two state contracts:
- ``stream_exact_dedup(..., ts_col=..., watermark=...)`` —
  ``dropDuplicatesWithinWatermark``: per-key state is evicted once the
  event-time watermark passes, so state is bounded by the dedup horizon
  (the standard choice at 100 TB/day — an exact global horizon would
  hold every fingerprint ever seen).
- ``ts_col=None`` — global ``dropDuplicates``: exact across the whole
  stream but state grows with distinct keys; only for bounded backfills
  driven with ``trigger(availableNow=True)``.

Batch/stream parity: the batch op keeps the min-id representative; the
stream keeps the FIRST-SEEN one — the kept set of fingerprints is
identical, the chosen representatives need not be (asserted in
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clarite_python_spark.operators.dedup import _norm


def fingerprinted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical dedup key (md5 of normalized text)."""
    return df.withColumn("__fp", F.md5(_norm(text_col)))


def stream_exact_dedup(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source streaming dedup; drive with
    ``trigger(availableNow=True)`` for backfills, append output mode."""
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    keyed = fingerprinted(stream, text_col)
    if ts_col is not None:
        # withWatermark requires TIMESTAMP; cast guards against
        # TIMESTAMP_NTZ parquet columns (session TZ pinned UTC).
        keyed = (
            keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
        )
    else:
        keyed = keyed.dropDuplicates(["__fp"])
    return keyed.drop("__fp")
