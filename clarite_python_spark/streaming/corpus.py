"""Streaming twin of the ``clean_corpus`` composite (extension —
SURVEY.md §2.12; closes VERDICT round-6 task 8).

The daily-ingest form of the corpus-cleaning decision table: documents
arrive as files; every micro-batch gets the SAME per-stage verdicts as
batch :func:`~clarite_python_spark.operators.pipeline.clean_corpus`.
The quality / language / repetition (/ spans / classifier) stages are
per-document — batch-local by construction, so running the batch
composite inside ``foreachBatch`` is exact regardless of how documents
are split into batches. Only exact-dedup state crosses batches: a
fingerprint table (the same md5-of-normalized-text key as
``exact_dedup`` / ``stream_exact_dedup``) accumulated in ``state_dir``;
a document whose fingerprint was seen in ANY earlier batch fails
``keep_dedup`` (and so ``keep``), while within a batch the batch op's
min-id representative rule applies unchanged.

Parity contract (tests/test_streaming_corpus.py):
- a single-batch ``availableNow`` backfill is row-for-row identical to
  batch ``clean_corpus``;
- a multi-batch replay keeps exactly the batch op's fingerprint SET
  with first-arrival representatives — the same contract as
  ``stream_exact_dedup``.

Scale shape: each batch runs the already-audited batch plan (one scan +
id-keyed verdict joins); the cross-batch state is an append-only
fingerprint table read once per batch via a broadcast-able left-anti
join (at production scale: a Delta table or the RocksDB-backed
``dropDuplicatesWithinWatermark`` horizon of ``stream_exact_dedup``
bounds it; here it is plain parquet to stay inside the baked-in stack).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clarite_python_spark.operators.dedup import _norm
from clarite_python_spark.operators.pipeline import clean_corpus

__all__ = ["stream_clean_corpus"]


def stream_clean_corpus(
    spark: SparkSession,
    path: str,
    out_dir: str,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    **clean_kwargs,
):
    """File-source streaming corpus cleaner; drive with
    ``trigger(availableNow=True)``. Verdict rows append to ``out_dir``
    (parquet); seen fingerprints accumulate in ``state_dir``. Returns
    the started ``StreamingQuery`` (call ``awaitTermination()``).

    ``clean_kwargs`` pass through to batch ``clean_corpus`` (languages,
    gopher_kwargs, max_span_dup_frac, min_quality_prob, ...).
    """
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = clean_corpus(
            batch_df, text_col=text_col, id_col=id_col, **clean_kwargs
        )
        fp = batch_df.select(
            F.col(id_col), F.md5(_norm(text_col)).alias("__fp")
        )
        if os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in os.listdir(state_dir)
        ):
            seen = batch_df.sparkSession.read.parquet(state_dir)
            # ids whose fingerprint was seen in an earlier batch: their
            # keep_dedup (and keep) verdicts flip to False
            dup_ids = fp.join(seen, "__fp", "left_semi").select(id_col)
            verdicts = (
                verdicts.join(
                    dup_ids.withColumn("__dup", F.lit(True)), id_col, "left"
                )
                .withColumn(
                    "keep_dedup",
                    F.col("keep_dedup") & F.col("__dup").isNull(),
                )
                .withColumn("keep", F.col("keep") & F.col("__dup").isNull())
                .drop("__dup")
            )
        verdicts.write.mode("append").parquet(out_dir)
        fp.select("__fp").distinct().write.mode("append").parquet(state_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .start()
    )
