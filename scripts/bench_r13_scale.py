"""Round-13 scale rehearsal: production-dim vector pricing, BPE at
production vocabulary sizes, clustered-corpus kNN-graph recall.

Subcommands (each prints one JSON line; record in BASELINE.md):

- ``bpe [n_docs] [n_merges]`` — train_bpe(strategy='driver') at n_docs
  (default 1M) and n_merges (default 10_000): the exact incremental
  pair-delta trainer vs the distributed loop's measured ~0.86 s/merge
  (BASELINE.md round 12). Also runs the distributed path at 30 merges
  on the SAME corpus for an in-run s/merge comparison, and checks the
  first 30 driver merges equal the distributed ones (exactness probe
  at scale, beyond the unit parity pin).
- ``encode [n_docs] [n_rules]`` — bpe_encode(encode_impl='pandas') of
  n_docs (default 1M) with a production-size rule table (default
  10_000, trained by the driver strategy on the same corpus): one
  Arrow pass over the distinct-word table instead of n_rules chained
  fold projections + ~n_rules/8 checkpoints.
- ``dims [n] [n_probe] [dim ...]`` — knn_graph at production embedding
  dims (default 768 1536 4096; n default 100k): for each dim, codegen
  assignment at its r12 sweet spot (256 lists) vs pandas assignment at
  1024 lists — wall, compiles, python-in-plan. The r12 sweeps all used
  dim=64; per-pair cosine-fold cost is O(dim), so this is where the
  pair-budget arithmetic gets dim-multiplied.
- ``retrieval [n] [nq] [dim]`` — the evaluate-retrieval arms (cosine /
  ivf / binary_stored, each ±MMR) at production dim (default 768;
  n default 1M): the r12 arm table re-priced where users live. The
  stored-binary advantage should WIDEN with dim (bit pack stays 1/32
  of float bytes).
- ``recall_clustered [n] [dim] [n_blobs] [nl:np ...]`` — knn_graph_recall
  on a CLUSTERED corpus (hash-seeded blob centers + small noise — the
  regime real embeddings live in) vs the uniform-random worst case the
  r12 1M rows measured; default 1M x 64-dim, 1000 blobs, probing
  (1024,8) (1024,32) (4096,32) with pandas assignment.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import evaluation, similarity, text  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def _vec_expr(dim: int) -> str:
    return (
        "transform(sequence(0, {d}), j -> "
        "(pmod(xxhash64(id, j), 1000) + pmod(xxhash64(id, j + 7919), 1000)"
        " + pmod(xxhash64(id, j + 104729), 1000)) / 1500.0 - 1.0)"
    ).format(d=dim - 1)


def _blob_expr(dim: int, n_blobs: int, noise: float) -> str:
    """Clustered corpus: each row's vector = its blob center (a
    deterministic hash function of the blob id and component index)
    plus small per-row noise — the structured regime where an IVF
    quantizer's cells align with real density."""
    return (
        "transform(sequence(0, {d}), j -> "
        "(pmod(xxhash64(pmod(xxhash64(id), {b}), j), 2000) / 1000.0 - 1.0)"
        " + {eps} * (pmod(xxhash64(id, j + 31), 2000) / 1000.0 - 1.0))"
    ).format(d=dim - 1, b=n_blobs, eps=noise)


def _corpus(spark, n: int, dim: int, expr: str | None = None):
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(expr or _vec_expr(dim)).alias("embedding"),
        )
        .repartition(64)
        .persist(StorageLevel.DISK_ONLY)
    )
    df.count()
    return df


def _docs(spark, n_docs: int):
    # synthetic docs: 12 pseudo-words drawn from a zipf-ish 30k-word
    # hash vocabulary, 3-8 chars each — deterministic, no RNG (same
    # generator as the r12 bpe bench, so s/merge numbers are comparable)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda j: F.substring(
                    F.md5(
                        (F.pmod(F.xxhash64(F.col("id"), j), F.lit(30_000)) % 30_000)
                        .cast("string")
                    ),
                    1,
                    (F.pmod(F.xxhash64(F.col("id"), j + 7919), F.lit(6)) + 3).cast("int"),
                ),
            ),
        ).alias("text"),
    ).repartition(64).persist(StorageLevel.DISK_ONLY)
    docs.count()
    return docs


def bpe(argv: list[str]) -> None:
    n_docs = int(argv[0]) if argv else 1_000_000
    n_merges = int(argv[1]) if len(argv) > 1 else 10_000
    spark = get_spark("bench-bpe-driver")
    docs = _docs(spark, n_docs)
    results: dict[str, object] = {"n_docs": n_docs, "n_merges": n_merges}

    t0 = time.time()
    drv = text.train_bpe(docs, n_merges=n_merges, strategy="driver").collect()
    wall = round(time.time() - t0, 2)
    results["driver"] = {
        "n_merges_done": len(drv),
        "wall_s": wall,
        "s_per_merge": round(wall / max(len(drv), 1), 5),
    }
    print(f"STAGE driver: {results['driver']}", file=sys.stderr, flush=True)

    t0 = time.time()
    dist = text.train_bpe(docs, n_merges=30).collect()
    wall = round(time.time() - t0, 2)
    results["distributed_30"] = {
        "n_merges_done": len(dist),
        "wall_s": wall,
        "s_per_merge": round(wall / max(len(dist), 1), 3),
    }
    results["first_30_equal"] = (
        [tuple(r) for r in drv[:30]] == [tuple(r) for r in dist]
    )
    results["speedup_per_merge"] = round(
        results["distributed_30"]["s_per_merge"] / max(results["driver"]["s_per_merge"], 1e-9)
    )
    print(json.dumps(results))
    spark.stop()


def encode(argv: list[str]) -> None:
    n_docs = int(argv[0]) if argv else 1_000_000
    n_rules = int(argv[1]) if len(argv) > 1 else 10_000
    spark = get_spark("bench-bpe-encode")
    docs = _docs(spark, n_docs)
    results: dict[str, object] = {"n_docs": n_docs, "n_rules_requested": n_rules}
    t0 = time.time()
    merges = text.train_bpe(docs, n_merges=n_rules, strategy="driver")
    rules = [(r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()]
    results["train_driver_s"] = round(time.time() - t0, 2)
    results["n_rules"] = len(rules)
    t0 = time.time()
    out = text.bpe_encode(docs, rules, encode_impl="pandas")
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    results["encode_pandas"] = {
        "wall_s": round(time.time() - t0, 2),
        "docs": agg["docs"],
        "total_tokens": int(agg["toks"]),
    }
    print(f"STAGE pandas: {results['encode_pandas']}", file=sys.stderr, flush=True)
    # fold path at a 64-rule prefix for reference (its design point);
    # running it at 10k rules is exactly the ceiling this path replaces
    t0 = time.time()
    out = text.bpe_encode(docs, rules[:64], encode_impl="fold")
    agg = out.agg(F.count(F.lit(1)).alias("docs")).first()
    results["encode_fold_64"] = {"wall_s": round(time.time() - t0, 2)}
    print(json.dumps(results))
    spark.stop()


def dims(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 100_000
    n_probe = int(argv[1]) if len(argv) > 1 else 2
    dim_list = [int(x) for x in argv[2:]] or [768, 1536, 4096]
    spark = get_spark("bench-knn-dims")
    results: dict[str, object] = {"n_vectors": n, "n_probe": n_probe, "k": 10, "dims": {}}
    for dim in dim_list:
        corpus = _corpus(spark, n, dim)
        entry: dict[str, object] = {}
        for impl, nl in (("codegen", 256), ("pandas", 1024)):
            # the dim=768 codegen arm measured 2010 s at 100k (33 min);
            # at 1536/4096 the codegen arm runs on a 10k subsample —
            # per-row assignment cost is what's being priced, and the
            # arm's n is recorded so nothing is silently extrapolated
            arm_corpus = corpus
            arm_n = n
            if impl == "codegen" and dim >= 1536 and n > 10_000:
                arm_n = 10_000
                arm_corpus = corpus.where(F.col("vec_id") < arm_n)
            arm: dict[str, object] = {"n_lists": nl, "n": arm_n}
            try:
                t0 = time.time()
                g = similarity.knn_graph(
                    arm_corpus, k=10, n_lists=nl, n_probe=n_probe,
                    assign_impl=impl,
                )
                plan = g._jdf.queryExecution().executedPlan().toString()
                arm["python_in_plan"] = ("ArrowEvalPython" in plan) or (
                    "MapInPandas" in plan
                ) or ("BatchEvalPython" in plan)
                arm["plan_build_s"] = round(time.time() - t0, 2)
                t0 = time.time()
                arm["rows"] = g.count()
                arm["wall_s"] = round(time.time() - t0, 2)
                arm["compiles"] = True
            except Exception as e:
                arm["compiles"] = False
                arm["error"] = f"{type(e).__name__}: {str(e)[:160]}"
            entry[impl] = arm
            print(f"STAGE dim={dim} {impl}: {arm}", file=sys.stderr, flush=True)
        results["dims"][str(dim)] = entry
        corpus.unpersist()
    print(json.dumps(results))
    spark.stop()


def retrieval(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 1_000_000
    nq = int(argv[1]) if len(argv) > 1 else 100
    dim = int(argv[2]) if len(argv) > 2 else 768
    spark = get_spark("bench-retrieval-dims")
    corpus = _corpus(spark, n, dim)
    queries = (
        corpus.where(F.col("vec_id") % (n // nq) == 0)
        .limit(nq)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist(StorageLevel.DISK_ONLY)
    )
    queries.count()
    k = 10
    t0 = time.time()
    qrels = (
        similarity.cosine_topk(corpus, queries, k=k)
        .select("query_id", "vec_id", F.lit(1).alias("rel"))
        .persist(StorageLevel.DISK_ONLY)
    )
    qrels.count()
    exact_s = round(time.time() - t0, 2)
    results: dict[str, object] = {
        "n_vectors": n, "n_queries": nq, "dim": dim, "k": k,
        "exact_qrels_s": exact_s, "arms": {},
    }

    def arm(name: str, fetch_k: int, mk, mmr: bool) -> None:
        t0 = time.time()
        cand = mk(fetch_k)
        if mmr:
            ranked = similarity.mmr_rerank(
                corpus, queries, k=k, lambda_=0.7,
                candidates=cand, score_col="cosine",
            )
        else:
            ranked = cand.where(F.col("rank") <= k)
        ev = evaluation.rank_eval_macro(
            ranked, qrels, k=k, query_col="query_id",
            doc_col="vec_id", rank_col="rank", rel_col="rel",
        ).first()
        results["arms"][name] = {
            "wall_s": round(time.time() - t0, 2),
            "recall": ev["recall"],
            "ndcg": ev["ndcg"],
        }
        print(f"STAGE {name}: {results['arms'][name]}", file=sys.stderr, flush=True)

    idx = f"/tmp/clarite_r13_retrieval_index_{dim}"
    t0 = time.time()
    similarity.build_binary_index(corpus, idx, dim=dim, store_vectors=True)
    results["build_binary_index_s"] = round(time.time() - t0, 2)

    mk_cos = lambda fk: similarity.cosine_topk(corpus, queries, k=fk)  # noqa: E731
    mk_ivf = lambda fk: similarity.ivf_topk(  # noqa: E731
        corpus, queries, k=fk, n_lists=64, n_probe=8, assign_impl="pandas"
    )
    mk_bin = lambda fk: similarity.binary_rerank(  # noqa: E731
        None, queries, k=fk, shortlist_k=4 * fk, index_dir=idx
    )
    for nm, mk in (("cosine", mk_cos), ("ivf", mk_ivf), ("binary_stored", mk_bin)):
        arm(nm, k, mk, mmr=False)
        arm(nm + "+mmr", 5 * k, mk, mmr=True)
    print(json.dumps(results))
    spark.stop()


def recall_clustered(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 1_000_000
    dim = int(argv[1]) if len(argv) > 1 else 64
    n_blobs = int(argv[2]) if len(argv) > 2 else 1000
    points = [tuple(int(v) for v in a.split(":")) for a in argv[3:]] or [
        (1024, 8),
        (1024, 32),
        (4096, 32),
    ]
    spark = get_spark("bench-recall-clustered")
    corpus = _corpus(spark, n, dim, expr=_blob_expr(dim, n_blobs, 0.15))
    results: dict[str, object] = {
        "n_vectors": n, "dim": dim, "n_blobs": n_blobs, "k": 10, "points": {},
    }
    for nl, np_ in points:
        t0 = time.time()
        row = similarity.knn_graph_recall(
            corpus, k=10, n_queries=20, n_lists=nl, n_probe=np_,
            assign_impl="pandas",
        ).first()
        entry = {
            "recall": row["recall"],
            "n_hits": row["n_hits"],
            "wall_s": round(time.time() - t0, 2),
        }
        results["points"][f"{nl}:{np_}"] = entry
        print(f"STAGE {nl}:{np_}: {entry}", file=sys.stderr, flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bpe"
    {
        "bpe": bpe,
        "encode": encode,
        "dims": dims,
        "retrieval": retrieval,
        "recall_clustered": recall_clustered,
    }[cmd](sys.argv[2:])
