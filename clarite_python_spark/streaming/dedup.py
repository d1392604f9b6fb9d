"""Streaming exact deduplication (extension — the reference is pure
batch; this is the continuous-ingest form of ``operators.dedup``).

A training-data ingest pipeline dedups as documents ARRIVE: fingerprint
each document (same md5-of-normalized-text key as the batch
``exact_dedup``) and keep the first occurrence.

Two state contracts:
- ``stream_exact_dedup(..., ts_col=..., watermark=...)`` —
  ``dropDuplicatesWithinWatermark``: per-key state is evicted once the
  event-time watermark passes, so state is bounded by the dedup horizon
  (the standard choice at 100 TB/day — an exact global horizon would
  hold every fingerprint ever seen).
- ``ts_col=None`` — global ``dropDuplicates``: exact across the whole
  stream but state grows with distinct keys; only for bounded backfills
  driven with ``trigger(availableNow=True)``.

Batch/stream parity: the batch op keeps the min-id representative; the
stream keeps the FIRST-SEEN one — the kept set of fingerprints is
identical, the chosen representatives need not be (asserted in
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clarite_python_spark.operators.dedup import _norm


def stream_contamination(
    spark: SparkSession,
    path: str,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_grams: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of :func:`operators.dedup.contamination` — score
    documents against a STATIC evaluation benchmark as they arrive
    (the decontamination gate an ingest pipeline runs before a document
    ever reaches the training mix).

    Contamination is per-document given a fixed benchmark, so the
    operator is STATELESS across batches: each micro-batch runs the
    audited batch plan (row-local gram hashing, broadcast benchmark
    set, one keyed count agg) inside ``foreachBatch`` — exact at any
    batching, no watermark, no state store. The benchmark's distinct
    gram set is derived ONCE (:func:`operators.dedup.benchmark_grams`)
    and persisted, not recomputed per batch.

    Returns the started ``StreamingQuery``; verdict rows (id, n_ngrams,
    n_contaminated, contamination_frac, contaminated) append to
    ``out_dir`` as parquet. Drive with ``trigger(availableNow=True)``
    for backfills. Parity: a replay at ANY ``maxFilesPerTrigger``
    equals batch ``contamination`` row-for-row
    (tests/test_streaming_corpus.py)."""
    from clarite_python_spark.operators.dedup import benchmark_grams, contamination

    bcol = bench_text_col or text_col
    # DISK_ONLY: the gram table is reused across every micro-batch but a
    # deserialized in-memory persist of a 100-TB-scale benchmark gram set
    # competes with execution memory (the r11 CC OOM pattern — see
    # operators/dedup.py's _min_label_components storage-level note)
    bench = benchmark_grams(benchmark, n, bcol, hash_grams).persist(
        StorageLevel.DISK_ONLY
    )
    bench.count()  # materialize once; micro-batches reuse the cache

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = contamination(
            batch_df,
            benchmark,
            n=n,
            text_col=text_col,
            id_col=id_col,
            hash_grams=hash_grams,
            bench_grams=bench,
        )
        out.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def fingerprinted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical dedup key (md5 of normalized text)."""
    return df.withColumn("__fp", F.md5(_norm(text_col)))


def stream_exact_dedup(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source streaming dedup; drive with
    ``trigger(availableNow=True)`` for backfills, append output mode."""
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    keyed = fingerprinted(stream, text_col)
    if ts_col is not None:
        # withWatermark requires TIMESTAMP; cast guards against
        # TIMESTAMP_NTZ parquet columns (session TZ pinned UTC).
        keyed = (
            keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
        )
    else:
        keyed = keyed.dropDuplicates(["__fp"])
    return keyed.drop("__fp")


def stream_neardup(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
    max_files_per_trigger: int | None = None,
    band_dir: str | None = None,
):
    """Streaming NEAR-duplicate dedup — the continuous-ingest twin of
    :func:`operators.dedup.incremental_neardup`: each micro-batch is
    first deduped against everything already KEPT (banded cross-set
    candidates, exact shingle-Jaccard verify), then minhash-deduped
    within itself; survivors append to ``out_dir``.

    The kept corpus at ``out_dir`` IS the dedup state — the index a new
    document must clear is exactly the set of documents previously let
    through, so no second state store exists to drift from the output.
    Without ``band_dir`` each batch re-bands the kept corpus
    (O(|kept|) per trigger — fine for tests and small backfills). WITH
    ``band_dir`` the kept set's :func:`operators.dedup.band_table`
    persists there and each batch only (a) reads it and (b) appends the
    batch survivors' bands — the banding cost per trigger drops from
    O(|kept|) to O(|batch|), the difference between a toy and a 100 TB
    ingest. Same verdicts either way (parity-tested).

    Semantics are FIRST-SEEN-WINS against the surviving index — the
    production ingest rule. On a single-batch ``availableNow`` backfill
    this equals batch ``minhash_dedup`` exactly (parity-tested); across
    batches it can differ from one-shot batch dedup on A~B~C chains
    (batch greedy drops C because B~C; the stream KEEPS C when B was
    already dropped and A!~C — the stream's answer is the arguably
    more consistent one: every kept doc clears the kept index).

    Returns the started ``StreamingQuery`` (``availableNow`` trigger).
    """
    from clarite_python_spark.operators.dedup import band_table, incremental_neardup

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    band_kw = dict(
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n, hash_family=hash_family
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            seen = sess.read.parquet(out_dir)
        except Exception:
            seen = batch_df.limit(0)
        seen_bands = None
        if band_dir is not None:
            try:
                seen_bands = sess.read.parquet(band_dir)
            except Exception:
                seen_bands = band_table(
                    seen, text_col=text_col, id_col=id_col, **band_kw
                )
        kept = incremental_neardup(
            batch_df,
            seen,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            max_bucket=max_bucket,
            seen_bands=seen_bands,
            **band_kw,
        ).persist(StorageLevel.DISK_ONLY)
        kept.write.mode("append").parquet(out_dir)
        if band_dir is not None:
            band_table(kept, text_col=text_col, id_col=id_col, **band_kw).write.mode(
                "append"
            ).parquet(band_dir)
        kept.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_simhash_dedup(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    fp_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
    max_files_per_trigger: int | None = None,
):
    """Streaming near-dup dedup with SIMHASH state — the lightest-state
    twin in the family: where :func:`stream_neardup` re-reads the kept
    corpus (text) per trigger, this keeps ONE long per kept document at
    ``fp_dir`` (:func:`operators.dedup.simhash_fingerprints`), so the
    per-trigger history cost is an 8-byte-column scan however large the
    kept corpus grows — the shape that still works when the kept corpus
    is 100 TB but its fingerprint table is 0.008% of that.

    Each micro-batch: Hamming-check against the fingerprint table
    (band equi-join + popcount, pigeonhole-exact for bands >
    max_hamming), simhash-dedup the survivors within the batch, append
    survivors to ``out_dir`` and their fingerprints to ``fp_dir``.
    First-seen-wins semantics like the other streaming dedups; a
    single-batch ``availableNow`` backfill equals batch
    ``simhash_dedup`` exactly (parity-tested).

    Returns the started ``StreamingQuery`` (``availableNow`` trigger).
    """
    from clarite_python_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_fingerprints,
    )

    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    kw = dict(
        text_col=text_col, id_col=id_col, bits=bits, bands=bands,
        max_hamming=max_hamming, hash_family=hash_family, max_bucket=max_bucket,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            fps = sess.read.parquet(fp_dir)
        except Exception:  # first batch: no state written yet
            fps = None
        if fps is not None:
            kept = incremental_simhash_dedup(
                batch_df, fps, seen_fp_col="fp", **kw
            ).persist(StorageLevel.DISK_ONLY)
        else:
            kept = incremental_simhash_dedup(
                batch_df, batch_df.limit(0), **kw
            ).persist(StorageLevel.DISK_ONLY)
        kept.write.mode("append").parquet(out_dir)
        simhash_fingerprints(
            kept, text_col=text_col, id_col=id_col, bits=bits,
            hash_family=hash_family,
        ).write.mode("append").parquet(fp_dir)
        kept.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
