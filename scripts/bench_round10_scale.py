"""Round-10 focused stress: the session's additions at 100-TB-rehearsal
scale on local[32].

Stages:
- connected_components over 8M-edge path graphs (2M components,
  diameter 4) and a 10M-edge star graph (diameter 2) — the shapes real
  identity/duplicate graphs take; plus a diameter-19 chain variant to
  price the rounds-~-diameter contract.
- table_diff over two 10M-row snapshots (3 compare columns, ~5% churn).
- mmr_rerank: 100 queries x fetch_k=50 over a 1M-vector corpus — the
  claim measured is that the Pandas stage is O(queries x fetch_k) and
  the corpus cost is cosine_topk's one scan.
- rank_eval over 10M result rows (100k queries x top-100) against 1M
  qrels rows.

Usage: python scripts/bench_round10_scale.py [scale]   (scale=1 -> sizes above)
Prints one JSON line; record results in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import evaluation, graph, similarity  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    spark = get_spark("bench-round10-scale")
    results: dict[str, object] = {"scale": scale}

    def bench(name: str, fn) -> None:
        t = time.time()
        out = fn()
        cnt = out.count() if hasattr(out, "count") else out
        dt = time.time() - t
        results[name] = round(dt, 2)
        results[f"{name}_rows"] = cnt
        print(f"{name}: {dt:.2f}s rows={cnt}", file=sys.stderr)

    n_nodes = int(10_000_000 * scale)

    # --- connected components ---------------------------------------
    path5 = (
        spark.range(n_nodes)
        .where("id % 5 != 0")
        .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst"))
        .repartition(64)
        .persist()
    )
    path5.count()
    bench("cc_path_diam4_8Medges", lambda: graph.connected_components(path5))
    path5.unpersist()

    star = (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            (F.col("id") - F.col("id") % 100).alias("dst"),
        )
        .where("id % 100 != 0")
        .repartition(64)
        .persist()
    )
    star.count()
    bench("cc_star100_diam2_10Medges", lambda: graph.connected_components(star))
    star.unpersist()

    chain20 = (
        spark.range(n_nodes // 10)
        .where("id % 20 != 0")
        .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst"))
        .repartition(64)
        .persist()
    )
    chain20.count()
    bench(
        "cc_chain_diam19_1Mnodes",
        lambda: graph.connected_components(chain20, shortcut=False),
    )
    bench(
        "cc_chain_diam19_shortcut",
        lambda: graph.connected_components(chain20, shortcut=True),
    )
    chain20.unpersist()

    # --- table_diff ----------------------------------------------------
    old = (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("v1"),
            F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("v2"),
            (F.col("id") % 7).cast("int").alias("v3"),
        )
        .repartition(64)
        .persist()
    )
    new = (
        spark.range(int(n_nodes * 1.02))
        .where("id % 41 != 0")  # ~2.4% removed, ~2% added
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 19 == 0, -1.0)
            .otherwise((F.col("id") % 997).cast("double"))
            .alias("v1"),
            F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("v2"),
            (F.col("id") % 7).cast("int").alias("v3"),
        )
        .repartition(64)
        .persist()
    )
    old.count(), new.count()
    bench(
        "table_diff_10M",
        lambda: evaluation.table_diff(old, new, keys=["k"], compare=["v1", "v2", "v3"]),
    )
    old.unpersist(), new.unpersist()

    # --- mmr_rerank over a 1M-vector corpus ----------------------------
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    nb = base.count()
    reps = max(1, int(1_000_000 * scale) // nb)
    corpus = (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("rep") * nb + F.col("vec_id")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("rep") % 17 * 0.001
            ).alias("embedding"),
        )
        .repartition(64)
        .persist()
    )
    nc = corpus.count()
    results["mmr_corpus_vecs"] = nc
    qvec = base.where("vec_id < 100").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bench(
        "mmr_100q_fetch50_1Mvecs",
        lambda: similarity.mmr_rerank(corpus, qvec, k=10, fetch_k=50),
    )
    corpus.unpersist()

    # --- rank_eval over 10M result rows ---------------------------------
    res = (
        spark.range(n_nodes)
        .select(
            (F.col("id") % 100_000).alias("query_id"),
            (F.col("id") * 2654435761 % 1_000_003).alias("doc_id"),
            (F.col("id") % 100 + 1).alias("rank"),
        )
        .repartition(64)
        .persist()
    )
    qrels = (
        spark.range(int(1_000_000 * scale))
        .select(
            (F.col("id") % 100_000).alias("query_id"),
            ((F.col("id") * 48271 + 7) % 1_000_003).alias("doc_id"),
            F.lit(1.0).alias("rel"),
        )
        .persist()
    )
    res.count(), qrels.count()
    bench(
        "rank_eval_10Mresults_100kq",
        lambda: evaluation.rank_eval(res, qrels, k=100),
    )
    res.unpersist(), qrels.unpersist()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
