"""Structured Streaming over the ``events`` table (extension — the
reference is pure batch, SURVEY.md §2.12).

Each aggregation is exposed twice:
- ``windowed_counts(df)`` / ``sessionized(df)`` — batch forms, used by
  the DuckDB oracle (the session oracle is the classic gaps-and-islands
  SQL);
- ``stream_windowed_counts(spark, path)`` / ``stream_sessionized`` —
  streaming forms with a watermark for late data; drive them with
  ``trigger(availableNow=True)`` to process a static directory
  end-to-end in tests.

Session windows use Spark's native ``F.session_window`` (merging
event-time windows, Spark 3.2+): declaring the session in the logical
plan lets the streaming engine keep per-key session state and finalize
a session when the watermark passes its end — no hand-rolled
``applyInPandasWithState`` needed for these semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-event-type counts + value sums (batch)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "4 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key session aggregation (batch): events closer than ``gap``
    to the previous event of the same key merge into one session;
    ``session_end`` is Spark's session-window end (last event + gap).

    The physical plan is one shuffle on (key, merged window) — exactly a
    groupBy agg; at 100 TB this partitions by user like any keyed agg."""
    return (
        events.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_sessionized(
    spark: SparkSession,
    path: str,
    gap: str = "4 hours",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming form: per-key session state is finalized (and evicted)
    once the event-time watermark passes the session's end — state is
    bounded by active sessions, the standard choice for continuous
    clickstream ingest."""
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, path: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: file source -> watermark -> windowed agg.

    The watermark bounds state: rows later than ``watermark`` behind the
    max seen event time are dropped and their windows finalized — the
    standard late-data contract."""
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    # withWatermark requires TIMESTAMP; parquet may deliver TIMESTAMP_NTZ.
    # Session TZ is pinned UTC so the cast is semantics-preserving.
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def stream_enriched(
    spark: SparkSession,
    path: str,
    dim: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Stream-static enrichment: join a file-source event stream to a
    static dimension table.

    Spark plans a stream-static inner join with the STATIC side
    broadcast/re-read per micro-batch — the stream itself is never
    shuffled, so at 100 TB/day the enrich step stays a per-partition map
    as long as the dimension fits the usual broadcast budget. No
    watermark needed (the static side never changes mid-query)."""
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    return stream.join(F.broadcast(dim), key_col, "inner")


def stream_interval_join(
    spark: SparkSession,
    path: str,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream inner join bounded by an event-time range: each
    left event pairs with right events of the same user at-or-before it
    within ``within``.

    This is Spark's native stream-stream join: the time-range condition
    plus watermarks lets the engine compute exactly how long a buffered
    right row can still match (watermark + range bound) and evict state
    after — without the range bound, stream-stream join state grows
    forever. The batch twin is operators.joins.interval_join over the
    same predicate (parity-tested)."""
    schema = spark.read.parquet(path).schema
    left = (
        spark.readStream.schema(schema).parquet(path)
        .where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_event_id"),
            F.col("user_id").alias("l_user_id"),
            F.col("ts").cast("timestamp").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        spark.readStream.schema(schema).parquet(path)
        .where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").cast("timestamp").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        F.expr(
            f"l_user_id = r_user_id AND l_ts >= r_ts AND l_ts <= r_ts + INTERVAL {within}"
        ),
        "inner",
    ).select("l_event_id", "l_user_id", "l_ts", "r_event_id", "r_ts")


def stream_event_transitions(
    spark: SparkSession,
    path: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`operators.events.event_transitions` —
    emit (user, from_type, to_type) transition rows as events arrive,
    so a plain ``groupBy(from_type, to_type).count()`` over the sink IS
    the batch transition matrix (the same emit-rows-not-state shape as
    ``stream_retention_feed``).

    State is ONE tuple per user — the last event's (ts, id, type) — the
    O(1)-per-key footprint that survives at 10^9 users on RocksDB. Each
    micro-batch sorts ITS OWN rows by (ts, id) (chunks are concatenated
    first — applyInPandasWithState splits a key's rows at Arrow batch
    boundaries), prepends the stored last event, and emits one row per
    adjacent pair. Like ``stream_funnel``, cross-batch correctness
    assumes per-user in-order arrival between batches (in-order
    ``availableNow`` replay == batch op; parity-tested).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("from_type", StringType()),
            StructField("to_type", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts_us", LongType()),
            StructField("last_id", LongType()),
            StructField("last_type", StringType()),
        ]
    )

    def update(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["__ts", "__id"], kind="mergesort")
        types = pdf["__type"].tolist()
        if state.exists:
            _, _, last_type = state.get
            types = [last_type] + types
        last = pdf.iloc[-1]
        state.update((int(last["__ts"]), int(last["__id"]), str(last["__type"])))
        if len(types) < 2:
            return
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * (len(types) - 1),
                "from_type": types[:-1],
                "to_type": types[1:],
            }
        )

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(path)
        .where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__user"),
            # long micros, not a timestamp: Arrow's us->ns conversion in
            # the stateful-UDF transfer overflows on sentinel values,
            # and integer order == event-time order anyway
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts"),
            F.col(id_col).alias("__id"),
            F.col(type_col).alias("__type"),
        )
    )
    return stream.groupBy("__user").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
