"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is timed to full materialization (collect), after one warm-up
query to amortize session/JIT startup. Per-query times are what to
compare round-over-round (BENCH_r{N}.json vs BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "association_study_lineitem",
    "association_study_covariates",
    "interaction_study_lineitem",
    "correlations_lineitem",
    "remove_outliers_iqr_lineitem",
    "exact_dedup_documents",
    "minhash_dedup_documents",
    "text_stats_documents",
    "similarity_topk_embeddings",
    "windowed_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # JMH-style warm-up: run every headline query once untimed so the
    # timed pass measures steady-state compute (scan + shuffle + kernel),
    # not first-touch IO, Catalyst analysis, codegen, or Python-worker
    # pool spin-up — those are per-session constants, not per-data costs.
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()

    # best-of-N per query: single-shot timings on a shared machine vary
    # 2-5x under external load (observed 3.4s vs 14.3s for identical
    # minhash code); the minimum is the reproducible steady-state number
    # worth comparing round-over-round.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            assert rows is not None
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)

    sf = 0.1
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        pass
    # box-drift calibration (BASELINE.md "calibration" §): q1's plan has
    # been frozen since round 4, so its time moves ONLY with the machine.
    # headline/q1 is the box-normalized headline — compare THAT
    # round-over-round to separate code regressions from box drift
    # (r10->r11 moved every query +8..32% on identical code).
    calibration = times["q1_pricing_summary"]
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "calibration_q1_sec": calibration,
                "headline_per_q1": round(total / calibration, 2)
                if calibration > 0
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
