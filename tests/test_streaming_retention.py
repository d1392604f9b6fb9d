"""Streaming retention feed (streaming/retention.py): the distinct
(user, cohort, offset) set from an in-order replay must equal the batch
retention feed, so counting the sink reproduces the cohort triangle."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from clarite_python_spark.operators.events import retention_cohorts
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.retention import stream_retention_feed


def _drive(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def test_stream_retention_matches_batch_triangle(spark, tmp_path):
    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev = ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    src = str(tmp_path / "ev")
    ev.orderBy("ts").coalesce(1).write.parquet(src)

    batch = (
        retention_cohorts(ev, period_days=7)
        .orderBy("cohort_date", "period_offset")
        .toPandas()
    )
    batch["cohort_date"] = batch["cohort_date"].astype(str)
    _drive(stream_retention_feed(spark, src, period_days=7), "ret_stream")
    got = (
        spark.sql(
            """select cast(cohort_date as string) as cohort_date, period_offset,
                      count(distinct user_id) as n_users
               from ret_stream group by 1, 2 order by 1, 2"""
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stream_retention_state_carries_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    b1 = [(1, dt.datetime(2024, 1, 1, 0), "view")]
    b2 = [(1, dt.datetime(2024, 1, 9, 0), "view"),   # offset 1
          (1, dt.datetime(2024, 1, 10, 0), "view")]  # same offset: no new row
    spark.createDataFrame(b1, ["user_id", "ts", "event_type"]).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, ["user_id", "ts", "event_type"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drive(
        stream_retention_feed(spark, src, period_days=7, max_files_per_trigger=1),
        "ret_carry",
    )
    rows = spark.sql(
        "select distinct cast(cohort_date as string) c, period_offset o from ret_carry"
    ).collect()
    assert {(r["c"], r["o"]) for r in rows} == {("2024-01-01", 0), ("2024-01-01", 1)}
