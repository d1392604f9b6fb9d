"""Stored-postings BM25 amortization bench (round 10, VERDICT r9 #4).

The 10M-doc round-9 measurement showed the postings agg IS the inline
bm25_topk cost (286.7 of ~287 s). This bench prices the amortization the
stored-postings API now ships: build_postings once, then serve query
batches from the artifact with no corpus rescan / re-tokenize.

Corpus: sf0.1 documents replicated ``reps`` times with re-keyed ids and
a per-rep suffix token (same construction as bench_simhash_scale.py);
reps=100 -> 1M docs, reps=1000 -> 10M.

Measures, separately:
  inline      bm25_topk(corpus, queries).count()   — the single-shot cost
  build       build_postings(corpus, dir)          — the one-time artifact
  stored_q1   bm25_topk(None, queries, postings_dir) first batch
  stored_q2   second (different) batch against the same artifact
  bytes/doc   on-disk postings artifact size / corpus docs

Usage: python scripts/bench_bm25_postings.py [reps] [--out DIR]
Prints one JSON line; record results in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import text  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = None
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("bench-bm25-postings")
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
        )
        .repartition(128)
        .persist()
    )
    n = big.count()
    results: dict[str, object] = {"corpus_docs": n, "reps": reps}

    q1 = spark.createDataFrame(
        [(0, "hash join merge"), (1, "slow scan filter"), (2, "vector column batch")],
        "query_id long, query string",
    )
    q2 = spark.createDataFrame(
        [(0, "parquet row group"), (1, "broadcast shuffle exchange")],
        "query_id long, query string",
    )

    t0 = time.time()
    results["inline_rows"] = text.bm25_topk(big, q1, k=10).count()
    results["inline_s"] = round(time.time() - t0, 1)

    pdir = out_dir or tempfile.mkdtemp(prefix="bm25_post_")
    try:
        t0 = time.time()
        text.build_postings(big, pdir)
        results["build_s"] = round(time.time() - t0, 1)
        size = 0
        for root, _, files in os.walk(pdir):
            size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        results["artifact_bytes_per_doc"] = round(size / n, 2)

        t0 = time.time()
        results["stored_q1_rows"] = text.bm25_topk(
            None, q1, k=10, postings_dir=pdir
        ).count()
        results["stored_q1_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        results["stored_q2_rows"] = text.bm25_topk(
            None, q2, k=10, postings_dir=pdir
        ).count()
        results["stored_q2_s"] = round(time.time() - t0, 1)
    finally:
        if out_dir is None:
            shutil.rmtree(pdir, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
