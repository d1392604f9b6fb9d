"""Streaming twins of token_budget_sample / pack_sequences
(streaming/ingest.py): single-batch backfills must equal the batch ops
exactly; ordered multi-batch replays must carry state across batches."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from clarite_python_spark.operators.pipeline import pack_sequences, token_budget_sample
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.ingest import (
    stream_pack_sequences,
    stream_token_budget,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGETS = {"src0": 3000, "src1": 500}


def _drive(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


@pytest.fixture(scope="module")
def docs(spark):
    return load_testdata(spark, SF_DIR, ["documents"])["documents"]


def test_stream_token_budget_single_batch_equals_batch_op(spark, docs, tmp_path):
    """One availableNow micro-batch = the whole corpus in deterministic
    key order -> identical kept set AND identical cum_tokens."""
    src = str(tmp_path / "docs_budget_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)

    batch = (
        token_budget_sample(spark.read.parquet(src), BUDGETS)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _drive(stream_token_budget(spark, src, BUDGETS), "budget_single")
    got = (
        spark.sql("select doc_id, source, n_tokens, cum_tokens from budget_single")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_token_budget_multichunk_group_equals_batch_op(spark, docs, tmp_path):
    """applyInPandasWithState splits one key's rows into multiple pandas
    chunks at arrow maxRecordsPerBatch (default 10k), in arbitrary order.
    Force tiny chunks so every group spans many of them: the backfill
    must STILL equal the batch op (regression for the per-chunk-sort bug
    where each chunk was greedily scanned independently)."""
    src = str(tmp_path / "docs_budget_chunked")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        _drive(stream_token_budget(spark, src, BUDGETS), "budget_chunked")
    finally:
        spark.conf.set(key, old)
    batch = (
        token_budget_sample(spark.read.parquet(src), BUDGETS)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        spark.sql("select doc_id, source, n_tokens, cum_tokens from budget_chunked")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_pack_sequences_multichunk_group_equals_batch_op(spark, docs, tmp_path):
    """Same arrow-chunking regression for the packing twin: tiny chunks,
    single availableNow backfill, must match batch pack_sequences."""
    src = str(tmp_path / "docs_pack_chunked")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        _drive(
            stream_pack_sequences(spark, src, max_tokens=512), "pack_chunked"
        )
    finally:
        spark.conf.set(key, old)
    batch = (
        pack_sequences(spark.read.parquet(src), max_tokens=512)
        .select("doc_id", "source", "shard", "n_tokens", "seq_id", "seq_offset")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        spark.sql(
            "select doc_id, source, shard, n_tokens, seq_id, seq_offset from pack_chunked"
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_token_budget_state_carries_across_batches(spark, docs, tmp_path):
    """Multi-batch replay: greedy arrival-order admissions, one running
    total per group. Verified against an independent pandas simulation
    fed the same per-file arrival order."""
    src = str(tmp_path / "docs_budget_multi")
    pdf = docs.toPandas().sort_values("doc_id")
    files = []
    for i, lo in enumerate(range(0, len(pdf), 200)):
        f = os.path.join(src, f"chunk{i}.parquet")
        os.makedirs(src, exist_ok=True)
        chunk = pdf.iloc[lo : lo + 200]
        chunk.to_parquet(f)
        os.utime(f, (time.time() + i, time.time() + i))  # stable pickup order
        files.append(chunk)

    _drive(
        stream_token_budget(spark, src, BUDGETS, max_files_per_trigger=1),
        "budget_multi",
    )
    got = (
        spark.sql("select doc_id, source, n_tokens, cum_tokens from budget_multi")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # independent greedy simulation over the same arrival chunks
    from clarite_python_spark.functions.hashing import md5_60bit_py

    state: dict[str, int] = {}
    rows = []
    for chunk in files:
        c = chunk.copy()
        c["n_tokens"] = c["text"].str.split().apply(lambda t: len([x for x in t if x]))
        c["__key"] = [md5_60bit_py(f"{d}:") for d in c["doc_id"]]
        for grp, g in c.groupby("source", sort=True):
            limit = BUDGETS.get(grp)
            for _, r in g.sort_values("__key").iterrows():
                cum = state.get(grp, 0)
                if limit is None or cum < limit:
                    state[grp] = cum + int(r["n_tokens"])
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "source": grp,
                            "n_tokens": int(r["n_tokens"]),
                            "cum_tokens": state[grp],
                        }
                    )
    want = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_stream_pack_sequences_ordered_replay_equals_batch(spark, docs, tmp_path):
    """Files written as consecutive order_col ranges and replayed with
    maxFilesPerTrigger=1 must reproduce batch pack_sequences
    row-for-row (the offset state continues across batches)."""
    src = str(tmp_path / "docs_pack_src")
    pdf = docs.toPandas().sort_values("doc_id")
    os.makedirs(src, exist_ok=True)
    for i, lo in enumerate(range(0, len(pdf), 150)):
        f = os.path.join(src, f"chunk{i}.parquet")
        pdf.iloc[lo : lo + 150].to_parquet(f)
        os.utime(f, (time.time() + i, time.time() + i))

    batch = (
        pack_sequences(spark.read.parquet(src), max_tokens=512)
        .select("doc_id", "source", "shard", "n_tokens", "seq_id", "seq_offset")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _drive(
        stream_pack_sequences(spark, src, max_tokens=512, max_files_per_trigger=1),
        "pack_ordered",
    )
    got = (
        spark.sql(
            "select doc_id, source, shard, n_tokens, seq_id, seq_offset from pack_ordered"
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_pack_sequences_sharded(spark, docs, tmp_path):
    """n_shards > 1: the (group, shard) keyed state packs each shard
    independently — same invariant as the batch op (shard assignment is
    content-addressed), checked against the batch twin."""
    src = str(tmp_path / "docs_pack_shard")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    batch = (
        pack_sequences(spark.read.parquet(src), max_tokens=256, n_shards=4)
        .select("doc_id", "shard", "seq_id", "seq_offset")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _drive(
        stream_pack_sequences(spark, src, max_tokens=256, n_shards=4),
        "pack_sharded",
    )
    got = (
        spark.sql("select doc_id, shard, seq_id, seq_offset from pack_sharded")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_shard_by_tokens_single_batch_equals_batch_op(spark, docs, tmp_path):
    """One availableNow backfill = batch shard_by_tokens exactly
    (ids, totals, AND shard assignments)."""
    from clarite_python_spark.operators.pipeline import shard_by_tokens
    from clarite_python_spark.streaming.ingest import stream_shard_by_tokens

    src = str(tmp_path / "docs_shard_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)

    batch = (
        shard_by_tokens(spark.read.parquet(src), 1000)
        .select("doc_id", "source", "n_tokens", "cum_tokens", "shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _drive(stream_shard_by_tokens(spark, src, 1000), "shard_single")
    got = (
        spark.sql(
            "select doc_id, source, n_tokens, cum_tokens, shard from shard_single"
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, got, check_dtype=False)


def test_stream_shard_by_tokens_state_continues_across_batches(spark, docs, tmp_path):
    """With one file per trigger, later batches continue each group's
    running total: shard ids never reset and cum_tokens is globally
    monotone per group in arrival order."""
    from clarite_python_spark.streaming.ingest import stream_shard_by_tokens

    src = str(tmp_path / "docs_shard_multi")
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(src)
    # append a second file so availableNow runs >= 2 triggers with
    # maxFilesPerTrigger=1
    docs.orderBy("doc_id").coalesce(1).write.mode("append").parquet(src)

    _drive(
        stream_shard_by_tokens(spark, src, 1000, max_files_per_trigger=1),
        "shard_multi",
    )
    got = spark.sql("select * from shard_multi").toPandas()
    assert len(got) == 2 * docs.count()
    for _, g in got.groupby("source"):
        g = g.sort_values("cum_tokens")
        # totals strictly increase, shards are non-decreasing in total order
        assert g["cum_tokens"].is_monotonic_increasing
        assert g["shard"].is_monotonic_increasing
        # state carried over: the second batch's totals extend the first
        assert g["cum_tokens"].iloc[-1] >= 2 * g["n_tokens"].iloc[0]
