"""10M-doc stress of the minhash dedup family (round 10, VERDICT r9 #6)
— the default ``dedup()`` method, previously measured only at 1M/sf0.1;
simhash got the full 10M treatment in r9 (bench_simhash_scale.py).

Corpus: sf0.1 documents replicated ``reps`` times with re-keyed ids and
a per-rep suffix token — each base doc forms a ``reps``-member near-dup
clique, the pathological duplicate-heavy shape where LSH bucket sizes,
not corpus size, decide survival. With reps=2000 most band buckets for
a clique reach ~2000 members and the ``max_bucket=1000`` guard drops
them (the documented degenerate-bucket cap): candidate counts measure
what the guard ADMITS, exactly like the capped jaccard_topk row.

Measures, separately (the candidates/verify/CC split the verdict asked
for):
  candidates         minhash_lsh_candidates(big).count()
  verify             ngram_jaccard_pairs over those candidates .count()
  dedup_greedy       minhash_dedup(big).count()            (full stack)
  dedup_transitive   minhash_dedup(big, transitive=True).count()

Usage: python scripts/bench_minhash_scale.py [reps] [--stages LIST]
where LIST is a comma set of {candidates,verify,greedy,transitive}
(default: all). Run heavy stages in SEPARATE processes: at 27M admitted
pairs the verify explodes to ~5B (pair, gram) rows and one session's
accumulated shuffle files can exhaust local disk (measured: 47 GB and
an ENOSPC abort when greedy re-verified on top of the first pass).
Prints one JSON line; record results in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time


def _stage(results: dict, key: str, val, t0: float | None = None) -> None:
    results[key] = val
    if t0 is not None:
        results[key + "_s" if not key.endswith("_s") else key] = val
    print(f"STAGE {key}={val}", file=sys.stderr, flush=True)

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import dedup  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    stages = {"candidates", "verify", "greedy", "transitive"}
    if "--stages" in sys.argv:
        stages = set(sys.argv[sys.argv.index("--stages") + 1].split(","))
    max_bucket = 1000
    if "--max-bucket" in sys.argv:
        max_bucket = int(sys.argv[sys.argv.index("--max-bucket") + 1])
    spark = get_spark("bench-minhash-scale")
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
    results: dict[str, object] = {
        "corpus_docs": n, "reps": reps, "max_bucket": max_bucket,
    }

    if "candidates" in stages or "verify" in stages:
        t0 = time.time()
        cands = dedup.minhash_lsh_candidates(big, max_bucket=max_bucket)
        # single evaluation for the verify stage too, so checkpoint like
        # the operator stack does internally
        cands = cands.localCheckpoint()
        _stage(results, "candidate_pairs", cands.count())
        _stage(results, "candidates_s", round(time.time() - t0, 1))

    if "verify" in stages:
        t0 = time.time()
        dups = dedup.ngram_jaccard_pairs(big, cands.repartition(128))
        _stage(results, "verified_pairs", dups.count())
        _stage(results, "verify_s", round(time.time() - t0, 1))

    if "greedy" in stages:
        t0 = time.time()
        _stage(
            results,
            "survivors_greedy",
            dedup.minhash_dedup(big, max_bucket=max_bucket).count(),
        )
        _stage(results, "dedup_greedy_s", round(time.time() - t0, 1))

    if "transitive" in stages:
        t0 = time.time()
        _stage(
            results,
            "survivors_transitive",
            dedup.minhash_dedup(
                big, transitive=True, max_bucket=max_bucket
            ).count(),
        )
        _stage(results, "dedup_transitive_s", round(time.time() - t0, 1))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
