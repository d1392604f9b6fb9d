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
