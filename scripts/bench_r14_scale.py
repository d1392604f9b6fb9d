"""Round-14 scaling rehearsal (VERDICT r13 item 3): a corpus big enough
that compute dominates per-job latency, so 8-core vs 32-core ratios
discriminate.

The sf0.1 bench cannot show scaling — every headline query there is
per-job latency-bound (PERF_r13 scaling block: all ratios ~1). This
script synthesizes a DETERMINISTIC ~10x corpus with controlled
structure (no naive replication, which would square the near-dup
clique sizes) and times a subset of the DECLARED queries — the same
entry functions the driver greps — with the noop sink (guide §1.4).

Subcommands:
- ``gen [dir]``     — write the synthetic tables (documents, embeddings,
                      lineitem) under dir (default /tmp/sf_r14_scale).
- ``run [dir] [query ...]`` — time the declared queries against dir on
                      local[$SPARK_GRAFT_CPUS]; one JSON line per query
                      plus a summary line. Record 8c and 32c runs in
                      BASELINE.md.

Corpus shape (all hash-derived, no RNG):
- documents: 200k rows (40x sf0.1). text = 30-150 words drawn from a 4k
  vocab by xxhash(doc_id, pos); every 10th doc is a NEAR-DUP of its
  predecessor (same words, one substituted) so minhash/simhash/jaccard
  see linear pair counts (~10% of docs in 2-cliques), not replication's
  quadratic blowup. lang/source cycle through small domains.
- embeddings: 20k rows (10x sf0.1), 64-dim floats in [-1, 1) from
  xxhash — knn_graph's per-cell pair work grows ~25x, enough to be
  compute-bound at 8 cores.
- lineitem: sf0.1 lineitem replicated 4x with shifted orderkeys
  (2.4M rows) — replication is safe here (no dedup semantics).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = 4096
N_DOCS = 200_000
N_VECS = 20_000
LI_COPIES = 4

DEFAULT_DIR = "/tmp/sf_r14_scale"

# declared queries worth scaling: compute-bound families first
DEFAULT_QUERIES = [
    "clean_corpus_documents",
    "knn_graph_embeddings",
    "minhash_dedup_documents",
    "simhash_clusters_documents",
    "ngram_jaccard_documents",
    "text_stats_documents",
    "language_id_documents",
    "dataset_card_documents",
    "similarity_topk_embeddings",
    "association_study_lineitem",
    "remove_outliers_iqr_lineitem",
    "q1_pricing_summary",
]


def gen(out_dir: str) -> None:
    from pyspark.sql import functions as F

    from clarite_python_spark.session import get_spark

    spark = get_spark("r14_scale_gen")
    os.makedirs(out_dir, exist_ok=True)

    # --- documents ------------------------------------------------
    # word(doc, pos) = 'w' || pmod(xxhash64(doc, pos), VOCAB); dup docs
    # (doc_id % 10 == 1) reuse predecessor's words with position 0
    # substituted -> exactly one token differs (a near-dup pair).
    base_id = "CASE WHEN id % 10 = 1 THEN id - 1 ELSE id END"
    nwords = f"(30 + pmod(xxhash64({base_id}, 7), 121))"
    word = (
        f"concat('w', pmod(xxhash64({base_id}, p), {VOCAB}))"
    )
    sub_word = f"concat('w', pmod(xxhash64(id, -1), {VOCAB}))"
    text_expr = (
        f"concat_ws(' ', transform(sequence(1, {nwords}), "
        f"p -> CASE WHEN p = 1 AND id % 10 = 1 THEN {sub_word} "
        f"ELSE {word} END))"
    )
    docs = (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(text_expr).alias("text"),
            F.expr("element_at(array('en','en','en','de','fr','es'), cast(pmod(id, 6) + 1 as int))").alias("lang"),
            F.expr("concat('src', pmod(id, 7))").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # --- embeddings -----------------------------------------------
    vec = (
        "transform(sequence(0, 63), j -> CAST("
        "(pmod(xxhash64(id, j), 1000) + pmod(xxhash64(id, j + 7919), 1000)"
        " + pmod(xxhash64(id, j + 104729), 1000)) / 1500.0 - 1.0 AS FLOAT))"
    )
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.expr(vec).alias("embedding"),
        F.expr("CAST(pmod(id, 16) AS INT)").alias("label"),
    )
    emb.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # --- lineitem (replicated, keys shifted) ----------------------
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    maxkey = li.agg(F.max("l_orderkey")).first()[0]
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * (maxkey + 1)))
        for i in range(LI_COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    # small tables pass through so joins/describe queries resolve
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "events"]:
        spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
    print(json.dumps({"generated": out_dir, "docs": N_DOCS, "vecs": N_VECS}))
    spark.stop()


def run(sf_dir: str, only: list[str]) -> None:
    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("r14_scale_run")
    cpus = spark.sparkContext.defaultParallelism
    qs = entry_mod.queries()
    names = only or DEFAULT_QUERIES
    # session warm-up
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    times = {}
    reps = int(os.environ.get("R14_SCALE_REPS", "2"))
    for name in names:
        spark.sparkContext.setJobDescription(f"r14scale:{name}")
        best = float("inf")
        for _ in range(reps):  # rep 1 warms codegen/JIT; min is reported
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        times[name] = dt
        print(json.dumps({"query": name, "sec": dt, "cpus": cpus}), flush=True)
    print(
        json.dumps(
            {
                "metric": "r14_scale_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "cpus": cpus,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "gen":
        gen(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DIR)
    elif cmd == "run":
        d = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DIR
        run(d, sys.argv[3:])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
