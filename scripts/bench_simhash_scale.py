"""10M-doc stress of the simhash dedup family — the 100-TB daily-ingest
rehearsal (round 8; the round-7 numbers were 1M/500k).

Corpus: sf0.1 documents replicated ``reps`` times with re-keyed ids and
a per-rep suffix token (same construction as bench_corpus.py), so each
base doc forms a ``reps``-member near-dup clique: the pathological
duplicate-heavy shape where banding bucket sizes, not corpus size, decide
survival.

Measures, separately:
  candidates   simhash_candidates(big).count()  — banding + popcount verify
  dedup        simhash_dedup(big).count()       — + survivor anti-join
  fp_build     simhash_fingerprints(history) -> parquet (the amortized
               8-byte-per-doc state; bytes/doc reported from the file)
  fp_scan      reading + banding the persisted fp table alone — the
               per-batch floor cost of carrying the history
  incremental  incremental_simhash_dedup(batch, fp_table, seen_fp_col)

Usage: python scripts/bench_simhash_scale.py [reps] [--out DIR]
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

from clarite_python_spark.operators import dedup  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("bench-simhash-scale")
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

    bench("candidates", lambda: dedup.simhash_candidates(big))
    bench("dedup", lambda: dedup.simhash_dedup(big))

    # daily-ingest split: first half is history, second half the batch
    cut = n // 2
    history = big.where(F.col("doc_id") < cut)
    batch = big.where(F.col("doc_id") >= cut)
    workdir = tempfile.mkdtemp(prefix="simhash_scale_")
    fp_path = os.path.join(workdir, "fps")
    try:
        t = time.time()
        dedup.simhash_fingerprints(history).write.parquet(fp_path)
        results["fp_build"] = round(time.time() - t, 2)
        fp_bytes = sum(
            os.path.getsize(os.path.join(fp_path, f))
            for f in os.listdir(fp_path)
            if f.endswith(".parquet")
        )
        results["fp_bytes_per_doc"] = round(fp_bytes / cut, 2)

        fps = spark.read.parquet(fp_path)
        # per-batch floor: scan + distinct the persisted state (what every
        # incremental run pays before any batch work)
        bench("fp_scan", lambda: fps.select("fp").distinct())
        bench(
            "incremental",
            lambda: dedup.incremental_simhash_dedup(
                batch, fps, seen_fp_col="fp"
            ),
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
