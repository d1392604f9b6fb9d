"""Structured Streaming test: the streaming windowed aggregation must
produce the same result as its batch form when driven to completion over
a static directory with trigger(availableNow=True)."""

from __future__ import annotations

import pandas as pd

from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.events import stream_windowed_counts, windowed_counts

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
