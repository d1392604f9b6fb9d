"""Binary embedding family at 100-TB-rehearsal scale (round 11).

1M synthetic 64-dim vectors (seeded per-row hash mix, no RNG), 100
queries. Measures:

- ``cosine_float``  : exact brute-force cosine_topk (the r10-measured
  ~97 s baseline this family exists to beat),
- ``hamming``       : inline hamming_topk (pack both sides + XOR scan),
- ``build_index``   : build_binary_index one-time cost,
- ``hamming_stored``: hamming_topk from the stored pack (the per-batch
  serve cost the build amortizes),
- ``binary_rerank`` : stored-index shortlist-400 -> exact rerank top-10,
- ``recall``        : ann_recall(method='binary', shortlist_k=400) on
  20 queries — the quality number that licenses the speedup.

Usage: python scripts/bench_binary_scale.py [n_vectors] [n_queries]
       python scripts/bench_binary_scale.py --dims [n_vectors] [dim ...]
Prints one JSON line; record results in BASELINE.md.

``--dims`` (round 12) sweeps production embedding widths (default 64
768 1536 4096) at n_vectors (default 100k): pack wall, hamming_topk
wall, and whether the generated projection still whole-stage-compiles —
the measurement that justified replacing the unrolled WHEN-chain pack
with the constant-size transform/aggregate fold (the unrolled form is
6x slower at 768/1536 and fails Janino compilation outright at 4096).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import similarity  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402

DIM = 64


def _vec_expr(dim: int) -> str:
    return (
        "transform(sequence(0, {d}), j -> "
        "(pmod(xxhash64(id, j), 1000) + pmod(xxhash64(id, j + 7919), 1000)"
        " + pmod(xxhash64(id, j + 104729), 1000)) / 1500.0 - 1.0)"
    ).format(d=dim - 1)


def dims_sweep(argv: list[str]) -> None:
    n = int(argv[0]) if argv else 100_000
    dims = [int(d) for d in argv[1:]] or [64, 768, 1536, 4096]
    nq = 20
    from pyspark import StorageLevel

    spark = get_spark("bench-binary-dims")
    results: dict[str, object] = {"n_vectors": n, "n_queries": nq, "dims": {}}
    for dim in dims:
        # DISK_ONLY: at dim=4096 the float corpus is n x 32 KB — heap
        # persistence OOMs an 8g driver before the pack ever runs
        corpus = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), F.expr(_vec_expr(dim)).alias("embedding"))
            .repartition(64)
            .persist(StorageLevel.DISK_ONLY)
        )
        corpus.count()
        queries = (
            corpus.where(F.col("vec_id") % (n // nq) == 0)
            .limit(nq)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .persist()
        )
        queries.count()
        packed = similarity.quantize_binary(corpus, dim=dim)
        plan = packed._jdf.queryExecution().executedPlan().toString()
        codegen_ok = True
        t = time.time()
        try:
            packed.agg(F.sum(F.element_at("bvec", 1))).collect()
        except Exception:
            codegen_ok = False
        pack_s = round(time.time() - t, 2)
        t = time.time()
        cnt = similarity.hamming_topk(corpus, queries, k=10, dim=dim).count()
        ham_s = round(time.time() - t, 2)
        entry = {
            "pack_s": pack_s,
            "hamming_topk_s": ham_s,
            "hamming_rows": cnt,
            "pack_compiles": codegen_ok,
            "plan_has_python": "EvalPython" in plan,
        }
        results["dims"][str(dim)] = entry
        print(f"STAGE dim={dim}: {entry}", file=sys.stderr, flush=True)
        corpus.unpersist()
        queries.unpersist()
    print(json.dumps(results))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--dims":
        dims_sweep(sys.argv[2:])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("bench-binary-scale")
    results: dict[str, object] = {"n_vectors": n, "n_queries": nq, "dim": DIM}

    # deterministic pseudo-gaussian-ish vectors: sum of three hash
    # uniforms, centered — cheap, seedless, reproducible
    def vec_expr() -> str:
        return (
            "transform(sequence(0, {d}), j -> "
            "(pmod(xxhash64(id, j), 1000) + pmod(xxhash64(id, j + 7919), 1000)"
            " + pmod(xxhash64(id, j + 104729), 1000)) / 1500.0 - 1.0)"
        ).format(d=DIM - 1)

    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), F.expr(vec_expr()).alias("embedding"))
        .repartition(64)
        .persist()
    )
    corpus.count()
    queries = (
        corpus.where(F.col("vec_id") % (n // nq) == 0)
        .limit(nq)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    queries.count()

    def bench(name: str, fn) -> None:
        t = time.time()
        out = fn()
        cnt = out.count() if hasattr(out, "count") else 0
        results[name] = round(time.time() - t, 2)
        results[f"{name}_rows"] = cnt
        print(f"STAGE {name}: {results[name]}s rows={cnt}", file=sys.stderr, flush=True)

    bench("cosine_float", lambda: similarity.cosine_topk(corpus, queries, k=10))
    bench("hamming", lambda: similarity.hamming_topk(corpus, queries, k=10, dim=DIM))

    idx = "/tmp/clarite_r11_binary_index_bench"
    t = time.time()
    similarity.build_binary_index(corpus, idx, dim=DIM)
    results["build_index"] = round(time.time() - t, 2)
    print(f"STAGE build_index: {results['build_index']}s", file=sys.stderr, flush=True)

    bench(
        "hamming_stored",
        lambda: similarity.hamming_topk(None, queries, k=10, index_dir=idx),
    )
    bench(
        "binary_rerank",
        lambda: similarity.binary_rerank(
            corpus, queries, k=10, shortlist_k=400, dim=DIM, index_dir=idx
        ),
    )
    t = time.time()
    row = similarity.ann_recall(
        corpus, k=10, n_queries=20, method="binary", shortlist_k=400, dim=DIM
    ).first()
    results["recall_s"] = round(time.time() - t, 2)
    results["recall"] = row["recall"]
    print(f"STAGE recall: {row['recall']} in {results['recall_s']}s", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
