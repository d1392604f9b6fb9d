"""Measure the PQ residual-encoding headroom (round 10, VERDICT r9 #7).

``ivf_pq_topk`` encodes RAW vectors, not per-list residuals (the classic
IVFADC refinement). Residual codebooks can only reduce quantization
error, so their recall headroom at a given probe budget is bounded by

    recall(ivf exact-scoring) - recall(ivf_pq)     at the same n_probe

(the pruning loss is shared; the difference is purely PQ fidelity).
This script measures that bound at several (n_probe, m) points on the
gate corpus, plus the full-scan decomposition:

  exact          = 1.0 by construction (brute force vs itself)
  pq@m           quantization-only loss (full scan, PQ scoring)
  ivf@probe      pruning-only loss (IVF pruning, exact scoring)
  ivf_pq@probe,m combined

Round-10 outcome: the bound was material (0.34-0.58), so residual
encoding WAS implemented (ivf_pq_topk(residual=True), shared codebook —
Jégou's IVFADC) and this script now also measures it directly, on the
gate corpus AND on a deterministic 16-cluster synthetic corpus. The
punchline is corpus-dependent: residuals quantize better than raw
vectors iff mean cos(v, coarse centroid) > 0.5 (residual energy
2 - 2cos < 1 for unit vectors) — true for the clustered corpus (wins
0.348 vs 0.204), false for the near-uniform gate corpus (loses 0.204
vs 0.248). Decision recorded in BASELINE.md.

Usage: python scripts/bench_pq_residual_gap.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from clarite_python_spark.operators import similarity  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-pq-residual-gap")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    results: dict[str, object] = {"corpus": n, "k": 10, "n_queries": 50}

    def recall(method: str, **kw) -> float:
        t0 = time.time()
        r = similarity.ann_recall(
            emb, k=10, n_queries=50, method=method, **kw
        ).first()
        key = method + "".join(f"_{k}{v}" for k, v in sorted(kw.items()))
        results[key] = {
            "recall": float(r["recall"]),
            "s": round(time.time() - t0, 1),
        }
        return float(r["recall"])

    # full-scan decomposition: quantization-only loss at two code sizes
    recall("pq", m=8, k_sub=16)
    recall("pq", m=16, k_sub=16)
    # pruning-only loss at two probe budgets
    recall("ivf", n_lists=16, n_probe=4)
    recall("ivf", n_lists=16, n_probe=8)
    # combined, at the cross of those points
    recall("ivf_pq", n_lists=16, n_probe=4, m=8, k_sub=16)
    recall("ivf_pq", n_lists=16, n_probe=8, m=8, k_sub=16)
    recall("ivf_pq", n_lists=16, n_probe=8, m=16, k_sub=16)

    # the residual headroom bound at each probe budget
    for probe, mm in ((4, 8), (8, 8), (8, 16)):
        ivf = results[f"ivf_n_lists16_n_probe{probe}"]["recall"]
        ivfpq = results[f"ivf_pq_k_sub16_m{mm}_n_lists16_n_probe{probe}"]["recall"]
        results[f"residual_headroom_probe{probe}_m{mm}"] = round(ivf - ivfpq, 6)

    # the implemented residual form, measured directly on the gate corpus
    recall("ivf_pq", n_lists=16, n_probe=8, m=8, k_sub=16, residual=True)

    # and on a deterministic clustered corpus where the coarse quantizer
    # explains the vectors (mean cos > 0.5) — the regime residual=True
    # is for
    import numpy as np

    from clarite_python_spark.operators.similarity import _train_centroids

    rng = np.random.RandomState(0)
    dim, n_clu, per = 64, 16, 125
    centers = rng.randn(n_clu, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    V = np.repeat(centers, per, axis=0) + 0.08 * rng.randn(n_clu * per, dim)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    clu = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<double>",
    ).persist()
    clu.count()
    cents = _train_centroids(clu, "embedding", 16, 42, 10_000)
    assign = np.argmax(V @ cents.T, axis=1)
    results["clustered_residual_energy"] = round(
        float((np.linalg.norm(V - cents[assign], axis=1) ** 2).mean()), 3
    )
    for res in (False, True):
        r = similarity.ann_recall(
            clu, k=10, n_queries=50, method="ivf_pq",
            n_lists=16, n_probe=8, m=8, k_sub=16, residual=res,
        ).first()
        results[f"clustered_ivf_pq_residual{res}"] = float(r["recall"])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
