"""End-to-end corpus pipeline: the README quick-start flow run for real
against the driver testdata — jsonl IO, profiling, cleaning verdicts,
sub-document dedup, exact + fuzzy decontamination, epoch shuffle. Each
stage's output feeds the next, so this catches schema/contract drift
between operators that unit tests miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from clarite_python_spark.operators import dedup, pipeline, text
from clarite_python_spark.sources.io import from_jsonl, save_jsonl

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. land as jsonl (the common interchange format), read back
    save_jsonl(raw, f"{tmp_path}/raw", partition_by="source")
    docs = from_jsonl(
        spark,
        f"{tmp_path}/raw",
        schema="doc_id long, text string, lang string, n_chars long",
    )
    assert docs.count() == raw.count()

    # 2. profile
    profile = text.corpus_stats(docs).collect()
    assert sum(r["n_docs"] for r in profile) == raw.count()

    # 3. cleaning verdicts -> keep a permissive subset (synthetic corpus
    # fails strict Gopher rules, so gate only on dedup + repetition)
    verdicts = pipeline.clean_corpus(docs, languages=("en", "es", "de", "fr"))
    keep = verdicts.where("keep_dedup AND keep_repetition").select("doc_id")
    clean = docs.join(keep, "doc_id", "left_semi")
    n_clean = clean.count()
    assert 0 < n_clean <= raw.count()

    # 4. sub-document dedup (re-chunk on a frequent token)
    pd_out = dedup.paragraph_dedup(clean.select("doc_id", "text"), sep="batch")
    assert 0 < pd_out.count() <= n_clean
    assert pd_out.where("n_paras_kept > n_paras_total").count() == 0

    # 5. decontamination vs a benchmark split (first 25 ids)
    bench = docs.where("doc_id < 25")
    corpus = pd_out.join(bench.select("doc_id"), "doc_id", "left_anti")
    exact_flags = dedup.contamination(corpus, bench, n=5)
    fuzzy_flags = dedup.fuzzy_contamination(corpus, bench, threshold=0.5)
    flagged = (
        exact_flags.where("contaminated").select("doc_id")
        .unionByName(fuzzy_flags.select("doc_id"))
        .distinct()
    )
    final = corpus.join(flagged, "doc_id", "left_anti")
    assert final.count() <= corpus.count()

    # 6. epoch shuffle + write
    shards = pipeline.deterministic_shuffle(final, salt="e0", n_shards=4)
    save_jsonl(shards, f"{tmp_path}/out", compression="gzip", partition_by="shard")
    back = from_jsonl(spark, f"{tmp_path}/out")
    assert back.count() == final.count()
    assert back.select("shard").distinct().count() <= 4
    # shuffle is content-addressed: re-deriving the key from the id
    # reproduces the stored one
    rederived = back.withColumn(
        "k2",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("e0"))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    assert rederived.where("k2 != shuffle_key").count() == 0


def test_round7_selection_pipeline_composes(spark):
    """The round-7 assembly flow end-to-end: boilerplate line removal ->
    span decontamination -> perplexity gating -> quality-first token
    budget -> equal-token shards -> weighted subsample. Each stage
    consumes the previous stage's actual output schema."""
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. boilerplate lines (re-chunk on a frequent token, per source)
    ld = dedup.line_dedup(
        raw.select("doc_id", "source", "text"), sep="batch", scope_col="source"
    )
    docs = ld.select("doc_id", "source", "text").join(
        raw.select("doc_id", "lang", "n_chars"), "doc_id"
    )
    assert 0 < docs.count() <= raw.count()

    # 2. span-level decontamination vs the src0 "benchmark"
    bench = raw.where("source = 'src0'")
    dec = dedup.remove_contaminated_spans(
        docs.where("source != 'src0'"), bench, n=5
    )
    docs = (
        dec.where("text_cleaned != ''")
        .select("doc_id", F.col("text_cleaned").alias("text"))
        .join(raw.select("doc_id", "source", "lang", "n_chars"), "doc_id")
    )
    n_dec = docs.count()
    assert n_dec > 0

    # 3. perplexity gating: drop the tail bucket (approx = scale form)
    pb = pipeline.perplexity_buckets(docs, exact=False)
    docs = docs.join(
        pb.where("bucket_label != 'tail'").select("doc_id"), "doc_id", "left_semi"
    )
    n_gated = docs.count()
    assert 0 < n_gated < n_dec  # a tail exists and was cut

    # 4. quality-first token budget per source (n_chars as the score)
    picked = pipeline.token_budget_sample(docs, 2000, order_col="n_chars")
    assert 0 < picked.count() <= n_gated

    # 5. equal-token shards over the winners
    sharded = pipeline.shard_by_tokens(
        picked.drop("n_tokens", "cum_tokens"), 500
    )
    assert sharded.count() == picked.count()
    assert sharded.where("shard < 0").count() == 0

    # 6. deterministic weighted subsample of the sharded corpus
    ws = pipeline.weighted_sample(
        sharded.drop("cum_tokens"), 20, weight_col="n_tokens"
    )
    assert ws.count() == 20
