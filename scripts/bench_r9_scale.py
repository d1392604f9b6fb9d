"""Round-9 focused 10M-doc stress: the corpus-pipeline core plus the
round-9 retrieval additions at the 100-TB-rehearsal scale.

Stages: exact_dedup, clean_corpus, mixture_report (new), bm25_topk
(new — postings over ~1.5B tokens), idf feature_hash_embed (new
weighting), fuzzy_join over distinct part-name-scale strings.

Usage: python scripts/bench_r9_scale.py [reps]   (reps=2000 -> 10M docs)
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("bench-r9-scale")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    reps_df = spark.range(reps).withColumnRenamed("id", "rep")
    big = (
        base.crossJoin(reps_df)
        .select(
            (F.col("rep") * n_base + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))
            ).alias("text"),
            "source",
        )
        .repartition(128)
        .persist()
    )
    n = big.count()
    results: dict[str, object] = {"corpus_docs": n, "reps": reps}

    def bench(name: str, fn) -> None:
        t = time.time()
        out = fn()
        cnt = out.count() if hasattr(out, "count") else out
        dt = time.time() - t
        results[name] = round(dt, 2)
        results[f"{name}_rows"] = cnt
        print(f"{name}: {dt:.2f}s rows={cnt}", file=sys.stderr)

    bench("exact_dedup", lambda: dedup.exact_dedup(big))
    bench("clean_corpus", lambda: pipeline.clean_corpus(big))
    bench(
        "mixture_report",
        lambda: pipeline.mixture_report(big, 10**9, tau=0.7, max_epochs=2.0),
    )
    queries = spark.createDataFrame(
        [(0, "hash join merge"), (1, "slow scan filter"), (2, "vector column batch")],
        "query_id long, query string",
    )
    bench("bm25_topk", lambda: text.bm25_topk(big, queries, k=10))
    bench(
        "idf_hash_embed",
        lambda: text.feature_hash_embed(
            big, dim=64, normalize=False, idf_weight=True
        ),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
