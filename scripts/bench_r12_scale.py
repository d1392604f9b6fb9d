"""Round-12 scale rehearsal: knn_graph, train_bpe, evaluate-retrieval.

Subcommands (each prints one JSON line; record in BASELINE.md):

- ``knn [n] [n_probe] [n_lists ...]``  — corpus×corpus kNN graph at n
  vectors (default 100k), sweeping n_lists (default 64 128 256 512):
  wall + the quantizer's centroid-literal plan-build cost, plus
  knn_graph_recall at the largest workable config. Expected pair count
  is N²·n_probe/n_lists — n_lists must grow with N to hold per-cell
  size constant, and this sweep measures where the inlined-centroid
  quantizer stops compiling (the same Janino ceiling the round-12 pack
  fix closed for quantize_binary).
- ``bpe [n_docs] [n_merges]`` — distributed BPE trainer at 1M synthetic
  docs (default), n_merges rounds (default 30): corpus agg once, then
  per-round cost over the distinct-word table.
- ``retrieval [n] [nq]`` — the evaluate-retrieval arms priced at 1M
  vectors / 100 queries: candidate wall + rank_eval vs exact-cosine
  qrels for cosine / ivf / binary, each with and without MMR.
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

DIM = 64


def _vec_expr(dim: int) -> str:
    return (
        "transform(sequence(0, {d}), j -> "
        "(pmod(xxhash64(id, j), 1000) + pmod(xxhash64(id, j + 7919), 1000)"
        " + pmod(xxhash64(id, j + 104729), 1000)) / 1500.0 - 1.0)"
    ).format(d=dim - 1)


def _corpus(spark, n: int):
    df = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), F.expr(_vec_expr(DIM)).alias("embedding"))
        .repartition(64)
        .persist(StorageLevel.DISK_ONLY)
    )
    df.count()
    return df


def knn(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 100_000
    n_probe = int(argv[1]) if len(argv) > 1 else 2
    lists = [int(x) for x in argv[2:]] or [64, 128, 256, 512]
    spark = get_spark("bench-knn-graph")
    corpus = _corpus(spark, n)
    results: dict[str, object] = {"n_vectors": n, "n_probe": n_probe, "k": 10, "sweep": {}}
    best = None
    for nl in lists:
        entry: dict[str, object] = {}
        try:
            t0 = time.time()
            g = similarity.knn_graph(corpus, k=10, n_lists=nl, n_probe=n_probe)
            entry["plan_build_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            entry["rows"] = g.count()
            entry["wall_s"] = round(time.time() - t0, 2)
            entry["expected_pairs_m"] = round(n * n * n_probe / nl / 1e6)
            best = nl
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        results["sweep"][str(nl)] = entry
        print(f"STAGE n_lists={nl}: {entry}", file=sys.stderr, flush=True)
    if best is not None:
        t0 = time.time()
        row = similarity.knn_graph_recall(
            corpus, k=10, n_queries=20, n_lists=best, n_probe=n_probe
        ).first()
        results["recall_at_largest"] = {
            "n_lists": best,
            "recall": row["recall"],
            "wall_s": round(time.time() - t0, 2),
        }
        print(f"STAGE recall: {results['recall_at_largest']}", file=sys.stderr, flush=True)
    print(json.dumps(results))
    spark.stop()


def bpe(argv: list[str]) -> None:
    n_docs = int(argv[0]) if argv else 1_000_000
    n_merges = int(argv[1]) if len(argv) > 1 else 30
    spark = get_spark("bench-bpe")
    # synthetic docs: 12 pseudo-words drawn from a zipf-ish 30k-word
    # hash vocabulary, 3-8 chars each — deterministic, no RNG
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
    n = docs.count()
    t0 = time.time()
    merges = text.train_bpe(docs, n_merges=n_merges)
    rows = merges.collect()
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "n_docs": n,
                "n_merges_requested": n_merges,
                "n_merges_done": len(rows),
                "wall_s": wall,
                "s_per_round": round(wall / max(len(rows), 1), 2),
                "first_merges": [tuple(r) for r in rows[:3]],
            }
        )
    )
    spark.stop()


def retrieval(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 1_000_000
    nq = int(argv[1]) if len(argv) > 1 else 100
    spark = get_spark("bench-retrieval")
    corpus = _corpus(spark, n)
    queries = (
        corpus.where(F.col("vec_id") % (n // nq) == 0)
        .limit(nq)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist(StorageLevel.DISK_ONLY)
    )
    queries.count()
    k = 10
    # qrels = exact cosine top-10 (self included): every arm is scored
    # against what exact retrieval would return
    t0 = time.time()
    qrels = (
        similarity.cosine_topk(corpus, queries, k=k)
        .select("query_id", "vec_id", F.lit(1).alias("rel"))
        .persist(StorageLevel.DISK_ONLY)
    )
    qrels.count()
    exact_s = round(time.time() - t0, 2)
    results: dict[str, object] = {
        "n_vectors": n, "n_queries": nq, "k": k, "exact_qrels_s": exact_s, "arms": {},
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

    idx = "/tmp/clarite_r12_retrieval_index"
    t0 = time.time()
    similarity.build_binary_index(corpus, idx, dim=DIM, store_vectors=True)
    results["build_binary_index_s"] = round(time.time() - t0, 2)

    mk_cos = lambda fk: similarity.cosine_topk(corpus, queries, k=fk)  # noqa: E731
    mk_ivf = lambda fk: similarity.ivf_topk(  # noqa: E731
        corpus, queries, k=fk, n_lists=64, n_probe=8
    )
    mk_bin = lambda fk: similarity.binary_rerank(  # noqa: E731
        None, queries, k=fk, shortlist_k=4 * fk, index_dir=idx
    )
    for nm, mk in (("cosine", mk_cos), ("ivf", mk_ivf), ("binary_stored", mk_bin)):
        arm(nm, k, mk, mmr=False)
        arm(nm + "+mmr", 5 * k, mk, mmr=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "knn"
    {"knn": knn, "bpe": bpe, "retrieval": retrieval}[cmd](sys.argv[2:])
