"""applyInPandasWithState running-stats operator: the last update emitted
per key after a multi-micro-batch replay must equal the batch aggregate,
and state must fold incrementally across batches (not recompute)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.state import stream_user_stats, user_stats

SF_DIR = "/root/testdata/sf0.001"


def _drive(spark, src, name, **kw):
    q = (
        stream_user_stats(spark, src, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def test_stream_user_stats_matches_batch(spark, tmp_path):
    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "events_state_src")
    # 4 files => with maxFilesPerTrigger=1 the state MUST carry across
    # micro-batches for the final numbers to come out right.
    events.repartition(4).write.mode("overwrite").parquet(src)

    batch = user_stats(spark.read.parquet(src)).toPandas()
    q = _drive(spark, src, "user_state", max_files_per_trigger=1)
    assert q.lastProgress is not None

    got = spark.sql(
        # update mode appends one row per (key, micro-batch) to the memory
        # sink; the LAST emission per key is the final state
        """
        select user_id, n_events, total_value, mean_value, var_value
        from (select *, row_number() over (partition by user_id order by n_events desc) rn
              from user_state) where rn = 1
        """
    ).toPandas()

    a = batch.sort_values("user_id").reset_index(drop=True)
    b = got.sort_values("user_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(
        a[["user_id", "n_events"]], b[["user_id", "n_events"]], check_dtype=False
    )
    for col, tol in [("total_value", 1e-6), ("mean_value", 1e-9), ("var_value", 1e-6)]:
        assert (a[col] - b[col]).abs().max() == pytest.approx(0, abs=tol)


def test_stream_emits_incremental_updates(spark, tmp_path):
    """With one file per trigger, a key spread over several files shows
    monotonically growing n_events across its emitted updates."""
    pdf = pd.DataFrame(
        {"user_id": [7] * 8 + [9] * 4, "value": [float(i) for i in range(12)]}
    )
    src = str(tmp_path / "inc_src")
    spark.createDataFrame(pdf).repartition(4).write.mode("overwrite").parquet(src)

    _drive(spark, src, "user_state_inc", max_files_per_trigger=1)
    rows = spark.sql("select user_id, n_events from user_state_inc").collect()
    per_key: dict[int, list[int]] = {}
    for r in rows:
        per_key.setdefault(r["user_id"], []).append(r["n_events"])
    # >1 update for user 7 (8 rows over 4 files); counts are cumulative so
    # every emission is distinct and the last one covers all rows
    assert len(per_key[7]) > 1
    assert len(set(per_key[7])) == len(per_key[7])
    assert max(per_key[7]) == 8 and max(per_key[9]) == 4


def test_null_values_ignored(spark, tmp_path):
    pdf = pd.DataFrame({"user_id": [1, 1, 1], "value": [2.0, None, 4.0]})
    src = str(tmp_path / "null_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    _drive(spark, src, "user_state_null")
    r = spark.sql("select * from user_state_null").collect()[-1]
    assert r["n_events"] == 2 and r["total_value"] == 6.0 and r["var_value"] == 2.0


def test_stream_event_transitions_matches_batch(spark, tmp_path):
    import os
    import time

    from clarite_python_spark.operators.events import event_transitions
    from clarite_python_spark.streaming.events import stream_event_transitions

    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "ev_trans_src")
    os.makedirs(src, exist_ok=True)
    # two time-ordered files (per-user in-order arrival across batches):
    # transitions spanning the cut MUST come from carried state
    pdf = events.toPandas()
    med = pdf["ts"].astype("int64").median()
    early = pdf[pdf["ts"].astype("int64") <= med]
    late = pdf[pdf["ts"].astype("int64") > med]
    assert len(early) and len(late)
    early.to_parquet(os.path.join(src, "a.parquet"))
    late.to_parquet(os.path.join(src, "b.parquet"))
    os.utime(os.path.join(src, "b.parquet"), (time.time() + 5, time.time() + 5))

    q = (
        stream_event_transitions(spark, src, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("ev_trans")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("SELECT from_type, to_type, count(*) AS n FROM ev_trans GROUP BY 1, 2")
        .toPandas()
        .set_index(["from_type", "to_type"])["n"]
        .sort_index()
    )
    want = (
        event_transitions(spark.read.parquet(src))
        .select("from_type", "to_type", "n")
        .toPandas()
        .set_index(["from_type", "to_type"])["n"]
        .sort_index()
    )
    pd.testing.assert_series_equal(want, got, check_dtype=False)
    # cross-batch carry really happened: total transitions == rows - #users
    n_rows = spark.read.parquet(src).count()
    n_users = spark.read.parquet(src).select("user_id").distinct().count()
    assert int(got.sum()) == n_rows - n_users
