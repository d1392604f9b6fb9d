"""Structured Streaming test: the streaming windowed aggregation must
produce the same result as its batch form when driven to completion over
a static directory with trigger(availableNow=True)."""

from __future__ import annotations

import pandas as pd

from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.events import (
    sessionized,
    stream_sessionized,
    stream_windowed_counts,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    # write a clean parquet copy (micro-ts) for the file stream source
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    batch = windowed_counts(spark.read.parquet(src)).toPandas()

    stream_df = stream_windowed_counts(spark, src, window="1 hour", watermark="2 hours")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stream_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_counts").toPandas()

    key = ["window_start", "event_type"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(
        a[key + ["n"]], b[key + ["n"]], check_dtype=False
    )
    assert abs(a.total_value.sum() - b.total_value.sum()) < 1e-6


def test_sessionized_semantics(spark):
    """Crafted gaps: events 1h apart merge under a 2h gap; a 3h gap
    breaks the session; session_end = last event + gap; per-key."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 01:00:00", 2.0),   # +1h -> same session
        (1, "2024-01-01 04:30:00", 4.0),   # +3.5h -> new session
        (2, "2024-01-01 00:30:00", 8.0),   # other key: own session
    ]
    ev = spark.createDataFrame(rows, "user_id: long, ts: string, value: double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"], str(r["session_end"]))
        for r in sessionized(ev, gap="2 hours").collect()
    }
    assert out[(1, "2024-01-01 00:00:00")] == (2, 3.0, "2024-01-01 03:00:00")
    assert out[(1, "2024-01-01 04:30:00")] == (1, 4.0, "2024-01-01 06:30:00")
    assert out[(2, "2024-01-01 00:30:00")] == (1, 8.0, "2024-01-01 02:30:00")
    assert len(out) == 3


def test_stream_sessionized_matches_batch(spark, tmp_path):
    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "events_sess_src")
    events.write.mode("overwrite").parquet(src)

    batch = sessionized(spark.read.parquet(src), gap="4 hours").toPandas()
    q = (
        stream_sessionized(spark, src, gap="4 hours", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_sessions").toPandas()

    key = ["user_id", "session_start"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(
        a[key + ["session_end", "n_events"]],
        b[key + ["session_end", "n_events"]],
        check_dtype=False,
    )
    assert abs(a.total_value.sum() - b.total_value.sum()) < 1e-6


def test_stream_exact_dedup_matches_batch_fingerprints(spark, tmp_path):
    """Streaming dedup keeps first-seen per fingerprint; the SET of kept
    fingerprints must equal the batch exact_dedup's (representative ids
    may differ — that's the documented contract)."""
    from clarite_python_spark.operators.dedup import exact_dedup
    from clarite_python_spark.streaming.dedup import fingerprinted, stream_exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    batch_fps = {
        r["__fp"]
        for r in fingerprinted(exact_dedup(spark.read.parquet(src))).select("__fp").collect()
    }
    q = (
        stream_exact_dedup(spark, src)
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_dedup")
    stream_fps = {r["__fp"] for r in fingerprinted(got).select("__fp").collect()}
    assert stream_fps == batch_fps
    assert got.count() == len(batch_fps)  # exactly one survivor per key


def test_stream_exact_dedup_watermarked(spark, tmp_path):
    """Watermarked variant (bounded state): within one availableNow
    backfill batch no key's state expires mid-batch, so it still yields
    one survivor per fingerprint."""
    from pyspark.sql import functions as F

    from clarite_python_spark.streaming.dedup import stream_exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
    )
    src = str(tmp_path / "docs_ts_src")
    docs.write.mode("overwrite").parquet(src)
    q = (
        stream_exact_dedup(spark, src, ts_col="ts", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("stream_dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_dedup_wm")
    from clarite_python_spark.operators.dedup import exact_dedup

    expected = exact_dedup(spark.read.parquet(src)).count()
    assert got.count() == expected
