"""Streaming funnel (streaming/funnel.py): in-order replay must converge
to the batch operators/events.funnel result, state must carry across
micro-batches, and the max-span window must hold."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.events import funnel
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.funnel import stream_funnel

STEPS = ["signup", "view", "purchase"]


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


def _last_per_user(spark, name):
    # update-mode memory sink appends every emission; the LAST row per
    # user (max stage — the funnel is monotone) is the final state
    return (
        spark.sql(f"select user_id, max(stage) as stage from {name} group by user_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_stream_funnel_matches_batch(spark, tmp_path):
    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev = ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    src = str(tmp_path / "ev")
    ev.orderBy("ts").coalesce(1).write.parquet(src)

    batch = (
        funnel(ev, STEPS)
        .select("user_id", "stage")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    _drive(stream_funnel(spark, src, STEPS), "fun_stream")
    got = _last_per_user(spark, "fun_stream")
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stream_funnel_state_carries_across_batches(spark, tmp_path):
    # user 1 signs up in file 1, views in file 2: only cross-batch state
    # can reach stage 2
    d2 = str(tmp_path / "src")
    rows1 = [(1, dt.datetime(2024, 1, 1, 0), "signup")]
    rows2 = [(1, dt.datetime(2024, 1, 1, 1), "view")]
    spark.createDataFrame(rows1, ["user_id", "ts", "event_type"]).coalesce(1).write.parquet(d2)
    spark.createDataFrame(rows2, ["user_id", "ts", "event_type"]).coalesce(1).write.mode(
        "append"
    ).parquet(d2)
    _drive(
        stream_funnel(spark, d2, ["signup", "view"], max_files_per_trigger=1),
        "fun_carry",
    )
    got = _last_per_user(spark, "fun_carry")
    assert got.loc[0, "stage"] == 2


def test_stream_funnel_max_span(spark, tmp_path):
    src = str(tmp_path / "ev")
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), "signup"),
        (1, dt.datetime(2024, 1, 1, 1), "view"),   # inside 2h
        (2, dt.datetime(2024, 1, 1, 0), "signup"),
        (2, dt.datetime(2024, 1, 1, 3), "view"),   # outside 2h
    ]
    spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).coalesce(1).write.parquet(src)
    _drive(
        stream_funnel(spark, src, ["signup", "view"], max_span_seconds=2 * 3600),
        "fun_span",
    )
    got = _last_per_user(spark, "fun_span").set_index("user_id")
    assert int(got.loc[1, "stage"]) == 2
    assert int(got.loc[2, "stage"]) == 1


def test_stream_funnel_validation(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "signup")], ["user_id", "ts", "event_type"]
    ).write.parquet(src)
    with pytest.raises(ValueError, match="distinct"):
        stream_funnel(spark, src, ["a", "a"])
