"""Streaming attribution (streaming/attribution.py): in-order replay
must equal the batch operators/events.attribution result row-for-row,
touch state must carry across micro-batches, and the lookback window
must void aged credit."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.events import attribution
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.attribution import stream_attribution


def _drive(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pdf["value"] = pdf["value"].astype(float)
    pdf["touch_event_id"] = pdf["touch_event_id"].astype("float64")
    return pdf


@pytest.mark.parametrize("model", ["last_touch", "first_touch"])
def test_stream_attribution_matches_batch(spark, tmp_path, model):
    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev = ev.where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    src = str(tmp_path / f"ev_{model}")
    ev.orderBy("ts").coalesce(1).write.parquet(src)

    batch = _norm(
        attribution(ev, conversion="purchase", model=model)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("value").cast("double").alias("value"),
            "channel",
            "touch_ts",
            "touch_event_id",
        )
        .toPandas()
    )
    _drive(
        stream_attribution(spark, src, conversion="purchase", model=model),
        f"attr_{model}",
    )
    got = _norm(spark.sql(f"select * from attr_{model}").toPandas())
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stream_attribution_state_across_batches(spark, tmp_path):
    # touch lands in file 1, conversion in file 2: only cross-batch
    # state can credit it
    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    spark.createDataFrame(
        [(1, 10, t0, "click", 0.0)], cols
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(1, 11, t0 + dt.timedelta(hours=1), "purchase", 9.5)], cols
    ).coalesce(1).write.mode("append").parquet(src)

    _drive(
        stream_attribution(spark, src, conversion="purchase", max_files_per_trigger=1),
        "attr_xbatch",
    )
    rows = spark.sql("select * from attr_xbatch").collect()
    assert len(rows) == 1
    assert rows[0]["channel"] == "click"
    assert rows[0]["touch_event_id"] == 10


def test_stream_attribution_lookback_voids_old_touch(spark, tmp_path):
    src = str(tmp_path / "lb")
    t0 = dt.datetime(2024, 1, 1, 0)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    spark.createDataFrame(
        [
            (1, 1, t0, "click", 0.0),
            (1, 2, t0 + dt.timedelta(hours=5), "purchase", 1.0),
            (2, 3, t0, "click", 0.0),
            (2, 4, t0 + dt.timedelta(minutes=30), "purchase", 2.0),
        ],
        cols,
    ).coalesce(1).write.parquet(src)
    _drive(
        stream_attribution(
            spark, src, conversion="purchase", lookback_seconds=3600.0
        ),
        "attr_lb",
    )
    rows = {r["user_id"]: r for r in spark.sql("select * from attr_lb").collect()}
    assert rows[1]["channel"] is None  # aged out
    assert rows[2]["channel"] == "click"  # inside the hour


def test_stream_attribution_same_ts_larger_id_not_credited(spark, tmp_path):
    # strict (ts, id) order: a same-timestamp touch with a LARGER id
    # must not get credit (matches the batch strictly-prior window)
    src = str(tmp_path / "tie")
    t0 = dt.datetime(2024, 1, 1, 0)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    spark.createDataFrame(
        [
            (1, 5, t0, "purchase", 1.0),
            (1, 9, t0, "click", 0.0),  # same ts, larger id
        ],
        cols,
    ).coalesce(1).write.parquet(src)
    _drive(stream_attribution(spark, src, conversion="purchase"), "attr_tie")
    rows = spark.sql("select * from attr_tie").collect()
    assert len(rows) == 1 and rows[0]["channel"] is None


def test_stream_attribution_null_event_type_not_a_touch(spark, tmp_path):
    # channels=None: a NULL event_type must be skipped, not treated as a
    # touch with channel 'None' — the batch operator's
    # `col(type_col) != conversion` is NULL for null types and ignores
    # them (batch parity on dirty data)
    src = str(tmp_path / "nulltype")
    t0 = dt.datetime(2024, 1, 1, 0)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    spark.createDataFrame(
        [
            (1, 1, t0, None, 0.0),  # null-typed event: never a touch
            (1, 2, t0 + dt.timedelta(hours=1), "purchase", 3.0),
            (2, 3, t0, None, 0.0),
            (2, 4, t0 + dt.timedelta(minutes=5), "click", 0.0),
            (2, 5, t0 + dt.timedelta(hours=1), "purchase", 4.0),
        ],
        cols,
    ).coalesce(1).write.parquet(src)
    _drive(stream_attribution(spark, src, conversion="purchase"), "attr_null")
    rows = {r["user_id"]: r for r in spark.sql("select * from attr_null").collect()}
    assert rows[1]["channel"] is None  # only touch candidate was null-typed
    assert rows[2]["channel"] == "click"  # real touch still credited


def test_stream_attribution_epoch_zero_touch_credited(spark, tmp_path):
    # a legitimate touch at epoch 1970-01-01 must be credited (the state
    # carries an explicit has-touch flag, not a t_us==0 sentinel), and
    # under first_touch it must not be overwritten by a later touch
    src = str(tmp_path / "epoch0")
    epoch = dt.datetime(1970, 1, 1, 0)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    spark.createDataFrame(
        [
            (1, 1, epoch, "email", 0.0),
            (1, 2, epoch + dt.timedelta(minutes=10), "click", 0.0),
            (1, 3, epoch + dt.timedelta(hours=1), "purchase", 5.0),
        ],
        cols,
    ).coalesce(1).write.parquet(src)
    _drive(
        stream_attribution(spark, src, conversion="purchase", model="first_touch"),
        "attr_epoch0",
    )
    rows = spark.sql("select * from attr_epoch0").collect()
    assert len(rows) == 1
    assert rows[0]["channel"] == "email"
    assert rows[0]["touch_event_id"] == 1
    assert rows[0]["touch_ts"] == epoch


def test_stream_attribution_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "x", 0.0)],
        ["user_id", "event_id", "ts", "event_type", "value"],
    ).write.parquet(src)
    with pytest.raises(ValueError):
        stream_attribution(spark, src, model="nope")
    with pytest.raises(ValueError):
        stream_attribution(spark, src, conversion="a", channels=["a", "b"])
