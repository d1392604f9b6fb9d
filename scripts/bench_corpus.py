"""Corpus-pipeline scale measurement: replicate the sf0.1 documents
table to ~1M rows (ids re-keyed to stay unique) and measure the cleaning
stack's throughput — the number that matters for the 100-TB design is
docs/sec/core staying flat as the corpus grows.

Usage: python scripts/bench_corpus.py [replication_factor]
Prints one JSON line; record results in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import dedup, pipeline, text  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("bench-corpus")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()

    # replicate with re-keyed ids (rep * n_base + doc_id) and a per-rep
    # text suffix so exact dedup is not trivially collapsing the corpus
    reps_df = spark.range(reps).withColumnRenamed("id", "rep")
    big = (
        base.crossJoin(reps_df)
        .select(
            (F.col("rep") * n_base + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))).alias(
                "text"
            ),
            "source",
        )
        .repartition(64)
        .persist()
    )
    n = big.count()  # materialize once so stages time pure compute

    results: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        t = time.time()
        out = fn()
        cnt = out.count() if hasattr(out, "count") else out
        dt = time.time() - t
        results[name] = round(dt, 2)
        results[f"{name}_rows"] = cnt
        print(f"{name}: {dt:.2f}s rows={cnt}", file=sys.stderr)

    bench("gopher_rules", lambda: text.gopher_rules(big))
    bench("language_id", lambda: text.language_id(big))
    bench("exact_dedup", lambda: dedup.exact_dedup(big))
    bench("repetition_stats", lambda: text.repetition_stats(big))
    bench("unigram_logprob", lambda: text.unigram_logprob(big))
    bench("paragraph_dedup", lambda: dedup.paragraph_dedup(big, sep="batch"))
    bench(
        "contamination",
        lambda: dedup.contamination(
            big.where("source != 'src0'"), big.where("source = 'src0'"), n=5
        ),
    )
    # the filter references dup_tokens so count() cannot
    # join-eliminate the whole counting subtree (unique-key left join)
    bench(
        "duplicate_spans",
        lambda: dedup.duplicate_spans(big, n=16).where("dup_tokens >= 0"),
    )
    bench("clean_corpus", lambda: pipeline.clean_corpus(big))
    bench("deterministic_shuffle", lambda: pipeline.deterministic_shuffle(big))
    # round-6 stages
    bench("quality_classifier", lambda: text.quality_classifier(big))
    bench("domain_cap", lambda: pipeline.domain_cap(big, 20_000, prefilter_margin=3.0))
    bench("temperature_mixture", lambda: pipeline.temperature_mixture(big, 0.7, n // 3))
    bench("tfidf_top_terms", lambda: text.tfidf_top_terms(big, k=3))
    bench("bigram_logprob", lambda: text.bigram_logprob(big))
    bench(
        "remove_duplicate_spans",
        lambda: dedup.remove_duplicate_spans(big, n=16).where("removed_tokens >= 0"),
    )
    # round-7 stages
    bench(
        "line_dedup",
        lambda: dedup.line_dedup(big, sep="batch", scope_col="source"),
    )
    bench(
        "remove_contaminated_spans",
        lambda: dedup.remove_contaminated_spans(
            big.where("source != 'src0'"), big.where("source = 'src0'"), n=16
        ).where("removed_tokens >= 0"),
    )
    bench(
        "perplexity_buckets_approx",
        lambda: pipeline.perplexity_buckets(
            big.withColumn("lang", F.lit("en")), exact=False
        ),
    )
    bench(
        "weighted_sample",
        lambda: pipeline.weighted_sample(
            big.withColumn("w", F.length("text")), 10_000, weight_col="w"
        ),
    )
    bench("feature_hash_embed", lambda: text.feature_hash_embed(big, dim=64))
    # round-7 session-3 stages
    bench("simhash_dedup", lambda: dedup.simhash_dedup(big))
    bench("ngram_novelty", lambda: text.ngram_novelty(big))
    bench("dataset_card", lambda: text.dataset_card(big))

    total = sum(v for k, v in results.items() if not k.endswith("_rows"))
    print(
        json.dumps(
            {
                "metric": "corpus_pipeline_wall",
                "value": round(total, 2),
                "unit": "sec",
                "n_docs": n,
                "docs_per_sec_clean": round(n / results["clean_corpus"]),
                "stages": results,
            }
        )
    )


if __name__ == "__main__":
    main()
