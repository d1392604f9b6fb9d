"""Streaming twins for the daily-ingest pipeline ops: token-budget
mixing and sequence packing (extension — SURVEY.md §2.12; the reference
is pure batch; closes VERDICT round-5 task 9).

A training-data org runs ``token_budget_sample`` and ``pack_sequences``
(operators/pipeline.py) over a corpus that ARRIVES incrementally. Both
reduce to one number of per-group state — a running token total — so the
incremental forms are ``applyInPandasWithState`` with a single LONG per
key, the same O(1)/key state shape as streaming/state.py:

- ``stream_token_budget``: per ``by`` group, admit documents while the
  group's cumulative admitted tokens are under budget (the crossing
  document is kept — identical greedy rule to the batch op). Within a
  micro-batch documents are ordered by the SAME deterministic md5 key
  as the batch op, so a whole-corpus backfill in one
  ``availableNow`` batch reproduces the batch op exactly; across
  micro-batches the contract is arrival-order greedy (each batch's
  admissions extend the previous total — a bigger budget still admits
  a superset).
- ``stream_pack_sequences``: per (group, shard), documents are laid
  end-to-end continuing from the stored running offset; seq_id /
  seq_offset are the batch op's concat-then-chunk layout. When
  micro-batches arrive in ``order_col`` order (the backfill case:
  ordered file ranges + maxFilesPerTrigger=1), the stream output is
  row-for-row IDENTICAL to batch ``pack_sequences``.

Scale shape: state is ONE long per group (budget) or per (group, shard)
(packing) — independent of document count; the state store hash-
partitions keys across executors; RocksDB state store in production.
Stateless projections (token counts, md5 keys, hash shards) run as
ordinary codegen columns on the stream before the stateful step.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["stream_token_budget", "stream_pack_sequences", "stream_shard_by_tokens"]

_STATE = StructType([StructField("cum", LongType())])


def _budget_update(budgets, by: str, id_col: str):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (grp,) = key
        if isinstance(budgets, int):
            limit = budgets
        else:
            limit = budgets.get(grp)  # None = no budget = keep all
        (cum,) = state.get if state.exists else (0,)
        # applyInPandasWithState splits one key's rows into MULTIPLE
        # chunks at arrow maxRecordsPerBatch (default 10k), in arbitrary
        # order — concat the whole group's micro-batch and sort ONCE so
        # the greedy scan sees the same deterministic __key order as the
        # batch op (a single availableNow backfill == token_budget_sample
        # even past 10k docs per group).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("__key", kind="mergesort")
        outs = []
        if limit is None:
            kept = pdf
            cums = cum + pdf["n_tokens"].cumsum()
            cum = int(cums.iloc[-1]) if len(cums) else cum
        else:
            cums = cum + pdf["n_tokens"].cumsum()
            prev = cums - pdf["n_tokens"]
            keep = prev < limit  # crossing doc stays (batch rule)
            kept = pdf[keep]
            cums = cums[keep]
            if len(cums):
                cum = int(cums.iloc[-1])
        if len(kept):
            outs.append(
                pd.DataFrame(
                    {
                        id_col: kept[id_col],
                        by: grp,
                        "n_tokens": kept["n_tokens"],
                        "cum_tokens": cums,
                    }
                )
            )
        state.update((cum,))
        yield from outs

    return update


def stream_token_budget(
    spark: SparkSession,
    path: str,
    budgets: dict[str, int] | int,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source incremental token-budget mixing; drive with
    ``trigger(availableNow=True)``, output mode ``append``. A single-
    batch backfill equals batch ``token_budget_sample`` exactly."""
    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import token_count

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path).select(
        F.col(id_col),
        F.col(by),
        token_count(text_col).cast("long").alias("n_tokens"),
        md5_60bit(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
        ).alias("__key"),
    )
    out_schema = f"{id_col} long, {by} string, n_tokens long, cum_tokens long"
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(by).applyInPandasWithState(
        _budget_update(budgets, by, id_col),
        out_schema,
        _STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _pack_update(max_tokens: int, by: str, order_col: str, id_col: str):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        grp, shard = key
        (offset,) = state.get if state.exists else (0,)
        # Same multi-chunk hazard as _budget_update: concat the group's
        # chunks, then one sort by order_col, so layout is deterministic
        # past arrow's 10k-row chunking.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(order_col, kind="mergesort")
        outs = []
        start = offset + pdf["n_tokens"].cumsum() - pdf["n_tokens"]
        out = pd.DataFrame(
            {
                id_col: pdf[id_col],
                by: grp,
                "shard": shard,
                "n_tokens": pdf["n_tokens"],
                "seq_id": start // max_tokens,
                "seq_offset": start % max_tokens,
            }
        )
        if len(pdf):
            offset = int(start.iloc[-1] + pdf["n_tokens"].iloc[-1])
            outs.append(out)
        state.update((offset,))
        yield from outs

    return update


def stream_pack_sequences(
    spark: SparkSession,
    path: str,
    max_tokens: int,
    by: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source incremental concat-then-chunk packing; drive with
    ``trigger(availableNow=True)``, output mode ``append``. When files
    arrive in ``order_col`` order the output is row-for-row identical
    to batch ``pack_sequences``."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    from clarite_python_spark.operators.pipeline import hash_bucket
    from clarite_python_spark.operators.text import token_count

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    shard = (
        hash_bucket(id_col, "shard", n_shards) if n_shards > 1 else F.lit(0)
    )
    stream = reader.parquet(path).select(
        F.col(id_col),
        F.col(by),
        F.col(order_col).alias("__ord") if order_col != id_col else F.col(id_col).alias("__ord"),
        token_count(text_col).cast("long").alias("n_tokens"),
        shard.cast("int").alias("shard"),
    )
    out_schema = (
        f"{id_col} long, {by} string, shard int, n_tokens long, "
        f"seq_id long, seq_offset long"
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(by, "shard").applyInPandasWithState(
        _pack_update(max_tokens, by, "__ord", id_col),
        out_schema,
        _STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _shard_update(tokens_per_shard: int, by: str, id_col: str):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (grp,) = key
        (cum,) = state.get if state.exists else (0,)
        # concat + one sort, as in _budget_update: a single availableNow
        # backfill sees the batch op's deterministic __key order even
        # when arrow chunking splits the group
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("__key", kind="mergesort")
        cums = cum + pdf["n_tokens"].cumsum()
        prev = cums - pdf["n_tokens"]
        out = pd.DataFrame(
            {
                id_col: pdf[id_col],
                by: grp,
                "n_tokens": pdf["n_tokens"],
                "cum_tokens": cums,
                "shard": (prev // tokens_per_shard).astype("int64"),
            }
        )
        if len(cums):
            cum = int(cums.iloc[-1])
        state.update((cum,))
        yield out

    return update


def stream_shard_by_tokens(
    spark: SparkSession,
    path: str,
    tokens_per_shard: int,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source incremental equal-token shard assignment — the
    streaming twin of ``pipeline.shard_by_tokens``, same O(1)-per-group
    state as the budget twin (one running token total). A single-batch
    ``availableNow`` backfill reproduces the batch op exactly; across
    micro-batches shards continue from the stored total, so arrival
    order extends the shard sequence instead of restarting it."""
    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import token_count

    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path).select(
        F.col(id_col),
        F.col(by),
        token_count(text_col).cast("long").alias("n_tokens"),
        md5_60bit(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
        ).alias("__key"),
    )
    out_schema = (
        f"{id_col} long, {by} string, n_tokens long, cum_tokens long, shard long"
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(by).applyInPandasWithState(
        _shard_update(tokens_per_shard, by, id_col),
        out_schema,
        _STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
