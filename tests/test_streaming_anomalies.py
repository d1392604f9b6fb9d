"""Streaming anomaly monitor (streaming/anomalies.py): single-batch
replay must equal the batch operators/events.event_anomalies table
row-for-row; day counts must accumulate across micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.events import event_anomalies
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.anomalies import stream_event_anomalies


def _drive(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_event_anomalies_matches_batch_single_batch(spark, tmp_path):
    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev = ev.where(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    src = str(tmp_path / "ev")
    ev.orderBy("ts").coalesce(1).write.parquet(src)

    batch = (
        event_anomalies(ev, window=7, z_threshold=2.0)
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    _drive(
        stream_event_anomalies(spark, src, window=7, z_threshold=2.0),
        "anom_stream",
    )
    got = (
        spark.sql("select * from anom_stream")
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stream_event_anomalies_accumulates_across_batches(spark, tmp_path):
    # day 2024-01-03's events split across two files: the LAST emission
    # carries the full count and the z computed against days 1-2
    src = str(tmp_path / "src")
    cols = ["event_type", "ts"]

    def day_rows(day, n):
        return [("click", dt.datetime(2024, 1, day, 10, 0, i % 60)) for i in range(n)]

    spark.createDataFrame(
        day_rows(1, 10) + day_rows(2, 12) + day_rows(3, 3), cols
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(day_rows(3, 37), cols).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    _drive(
        stream_event_anomalies(
            spark, src, window=7, z_threshold=2.0, min_history=2,
            max_files_per_trigger=1,
        ),
        "anom_xbatch",
    )
    rows = [
        r.asDict()
        for r in spark.sql(
            "select * from anom_xbatch where day = '2024-01-03'"
        ).collect()
    ]
    assert any(r["n_events"] == 40 for r in rows)  # final accumulated count
    final = [r for r in rows if r["n_events"] == 40][0]
    # baseline: days 1-2 = (10, 12): mean 11, sample std sqrt(2)
    assert final["base_mean"] == pytest.approx(11.0)
    assert final["z"] == pytest.approx((40 - 11.0) / (2 ** 0.5), abs=1e-5)
    assert final["is_anomaly"] is True


def test_stream_event_anomalies_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 1))], ["event_type", "ts"]
    ).write.parquet(src)
    with pytest.raises(ValueError):
        stream_event_anomalies(spark, src, window=0)
    with pytest.raises(ValueError):
        stream_event_anomalies(spark, src, min_history=0)
