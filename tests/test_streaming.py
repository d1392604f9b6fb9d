"""Structured Streaming test: the streaming windowed aggregation must
produce the same result as its batch form when driven to completion over
a static directory with trigger(availableNow=True)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

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


def _sessions_reference(rows, gap_s: int):
    """Pandas gaps-and-islands reference for sessionized(): a new session
    starts only when the gap to the previous same-key event is STRICTLY
    greater than the gap — session_window merges an event at exactly
    last+gap (verified empirically; the ==gap example pins it).
    Returns {(user, start_epoch): (n, total, end_epoch)}."""
    by_user: dict = {}
    for u, t, v in rows:
        by_user.setdefault(u, []).append((t, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sess: list[list] = []
        for t, v in evs:
            if sess and t - sess[-1][1] <= gap_s:
                cur = sess[-1]
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
            else:
                sess.append([t, t, 1, v])
        for start, last, n, tot in sess:
            out[(u, start)] = (n, tot, last + gap_s)
    return out


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),            # user
            st.integers(min_value=0, max_value=40_000),       # epoch offset s
            st.integers(min_value=-5, max_value=5),           # value
        ),
        min_size=1,
        max_size=60,
    )
)
@example(rows=[(1, 0, 1), (1, 3600, 1)])          # exactly == gap: merged
@example(rows=[(1, 0, 1), (1, 3601, 1)])          # gap + 1s: new session
@example(rows=[(1, 0, 1), (1, 0, 2), (2, 0, 3)])  # equal timestamps, two keys
@example(rows=[(1, 0, 1)])                        # single-event session
def test_sessionized_matches_gaps_and_islands(spark, rows):
    from pyspark.sql import functions as F

    base = 1_700_000_000
    gap_s = 3600
    ev = spark.createDataFrame(
        [(u, base + t, float(v)) for u, t, v in rows],
        "user_id: long, epoch: long, value: double",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - base): (
            r["n_events"],
            r["total_value"],
            int(r["session_end"].timestamp()) - base,
        )
        for r in sessionized(ev, gap="1 hour").collect()
    }
    want = {
        (u, s): (n, tot, e)
        for (u, s), (n, tot, e) in _sessions_reference(
            [(u, t, float(v)) for u, t, v in rows], gap_s
        ).items()
    }
    assert set(got) == set(want)
    for k in want:
        n, tot, end = want[k]
        gn, gtot, gend = got[k]
        assert gn == n and gend == end and abs(gtot - tot) < 1e-9


def test_stream_sessionized_drops_data_older_than_watermark(spark, tmp_path):
    """State-eviction contract: after a restart restores the watermark
    from the checkpoint, an event whose would-be session window closed
    before that watermark must be DROPPED — it may neither resurrect a
    finalized session nor emit one of its own (mirrors the windowed-
    counts watermark test, but across two availableNow runs so the
    watermark actually gates a later batch)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    sink = str(tmp_path / "sess_sink")
    t0 = 1_700_000_000

    def write(rows):
        spark.createDataFrame(
            rows, "user_id: long, epoch: long, value: double"
        ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch").write.mode(
            "append"
        ).parquet(src)

    def run():
        # parquet sink: the one append sink that supports checkpoint
        # RECOVERY (the memory sink does not), which is what restores
        # the watermark for run 2
        q = (
            stream_sessionized(spark, src, gap="10 minutes", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    # run 1: u1's session finalizes (watermark reaches t0+9h via u9)
    write([(1, t0, 1.0), (1, t0 + 300, 2.0), (9, t0 + 36_000, 9.0)])
    out1 = run()
    assert set(out1.user_id) == {1}  # u9 still in state

    # run 2: u2 is LATE (ts+gap << restored watermark t0+9h) -> dropped;
    # u3 pushes the watermark so u9's pending session finalizes
    write([(2, t0 + 3600, 5.0), (3, t0 + 72_000, 7.0)])
    out2 = run()
    assert 9 in set(out2.user_id)      # pending session finalized live
    assert 2 not in set(out2.user_id)  # late event evicted, not revived
    assert 2 not in set(run().user_id)  # nor parked in state


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static broadcast join == the batch join, driven to
    completion with availableNow."""
    from pyspark.sql import functions as F

    from clarite_python_spark.streaming.events import stream_enriched

    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "events_enrich_src")
    events.write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [(u, "seg%d" % (u % 3)) for u in range(0, 200, 2)], ["user_id", "segment"]
    )

    q = (
        stream_enriched(spark, src, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select user_id, segment, count(*) n from enriched group by 1,2").toPandas()
    want = (
        spark.read.parquet(src)
        .join(F.broadcast(dim), "user_id")
        .groupBy("user_id", "segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    key = ["user_id", "segment"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) > 0


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Native stream-stream time-range join == the batch interval_join
    over the same predicate (clicks within 2h after a purchase)."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.joins import interval_join
    from clarite_python_spark.streaming.events import stream_interval_join

    events = load_testdata(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "events_ssjoin_src")
    events.write.mode("overwrite").parquet(src)

    q = (
        stream_interval_join(spark, src)
        .writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("select l_event_id, r_event_id from ssjoin").collect()
    }

    ev = spark.read.parquet(src)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["event_id"], r["purchase_id"])
        for r in interval_join(clicks, buys, by="user_id", bin_width=3600.0).collect()
    }
    assert got == want and len(got) > 0


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    """The stateless corpus-quality stages (gopher_rules + language_id)
    are plain projections, so they run unchanged on a file stream; with
    availableNow they must produce exactly the batch verdicts. This is
    the streaming-ingest form of the cleaning pipeline: quality flags on
    arrival, dedup downstream via the watermarked streaming dedup."""
    from clarite_python_spark.operators.text import gopher_rules, language_id

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    batch = {
        (r["doc_id"]): (r["gopher_pass"], r["lang_pred"])
        for r in gopher_rules(docs)
        .join(language_id(docs), "doc_id")
        .select("doc_id", "gopher_pass", "lang_pred")
        .collect()
    }

    stream = spark.readStream.schema(docs.schema).parquet(src)
    flagged = gopher_rules(stream).join(language_id(stream), "doc_id")
    q = (
        flagged.select("doc_id", "gopher_pass", "lang_pred")
        .writeStream.format("memory")
        .queryName("stream_quality")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["gopher_pass"], r["lang_pred"])
        for r in spark.sql("select * from stream_quality").collect()
    }
    assert got == batch and len(got) == docs.count()
