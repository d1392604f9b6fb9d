"""GWAS-canonical-scale benchmark: the reference's "largeish GWAS" shape
— 10,000 obs x 1,000 SNPs, case/control logistic (reference
tests/analyze/conftest.py:93-119, test_gwas.py:34-57; marked slow and
commented out there) — through both binomial execution paths:

- contingency sufficient-stats (default): one unpivot->count aggregation
  (map-side combine => shuffle carries #SNPs x ~6 cells), freq-weighted
  IRLS driver-side with iterates identical to the row-level kernel;
- grouped kernel (``use_sufficient_stats=False``): melt + shuffle of
  rows x SNPs into per-variable Python workers.

Usage: python scripts/bench_gwas.py [n_rows] [n_snps]
Prints one JSON line with wall seconds for both paths.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    from clarite_python_spark.catalog import ClariteFrame, VariableCatalog
    from clarite_python_spark.operators import analyze
    from clarite_python_spark.session import get_spark

    spark = get_spark("bench-gwas")

    from clarite_python_spark.operators import modify

    rng = np.random.RandomState(42)
    maf = rng.uniform(0.1, 0.4, p)
    counts = rng.binomial(2, maf, size=(n, p))
    eta = -0.5 + 0.8 * counts[:, 0] + 0.6 * counts[:, 1]
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(int)
    gt = np.where(counts == 0, "A/A", np.where(counts == 1, "A/T", "T/T"))
    data = {"ID": np.arange(n), "Outcome": np.where(y == 1, "Case", "Control")}
    names = [f"SNP{i + 1}" for i in range(p)]
    for i, nm in enumerate(names):
        data[nm] = gt[:, i]
    pdf = pd.DataFrame(data)
    # materialize to parquet so the measured runs read a columnar source
    # (the production shape) instead of re-serializing a 78 MB
    # single-task local relation on every action. NOTE: no .cache() —
    # columnar caching allocates per-column builder buffers, and 1000+
    # columns x 32 partitions is GBs of heap.
    import tempfile

    src = tempfile.mkdtemp(prefix="bench_gwas_") + "/genotypes"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(src)
    cf = ClariteFrame(spark.read.parquet(src))
    cf = modify.make_binary(cf, only=["Outcome"])
    cf = modify.make_genotypes(cf, {nm: ("A", "T") for nm in names})

    def run() -> tuple[float, int]:
        t0 = time.perf_counter()
        res = analyze.association_study(
            cf, outcomes="Outcome", min_n=50, encoding="additive"
        )
        n_rows = res.count()
        return time.perf_counter() - t0, n_rows

    cold, n_rows = run()  # includes codegen/Arrow/Python-worker warm-up
    # shared-machine single-shot variance is +-50%; report the min of two
    warm = min(run()[0], run()[0])

    # --- survey-weighted variant: same shape through the weighted
    # contingency-cell path (functions/wbinomagg.py) — 30 strata x 2 PSUs,
    # mildly informative weights, stata sandwich. The per-(SNP, cluster,
    # cell) aggregation shuffles #SNPs x ~360 tiny rows; the grouped
    # weighted kernel would melt rows x SNPs instead.
    from pyspark.sql import functions as F

    from clarite_python_spark.survey import SurveyDesignSpec

    design_df = (
        spark.read.parquet(src)
        .select(
            "ID",
            *[c for c in []],
        )
        .withColumn("strat", F.col("ID") % 30)
        .withColumn("psu", F.col("ID") % 60)
        .withColumn("w", 1.0 + (F.col("ID") % 7) / 7.0)
    )
    design = SurveyDesignSpec(
        design_df, weights="w", cluster="psu", strata="strat", nest=False
    )

    def run_weighted(use_suffstats: bool, rvs=None) -> tuple[float, int]:
        t0 = time.perf_counter()
        res = analyze.association_study(
            cf,
            outcomes="Outcome",
            regression_variables=rvs,
            min_n=50,
            encoding="additive",
            survey_design_spec=design,
            use_sufficient_stats=use_suffstats,
        )
        n_out = res.count()
        return time.perf_counter() - t0, n_out

    w_cold, w_rows = run_weighted(True)
    w_warm = min(run_weighted(True)[0], run_weighted(True)[0])
    # grouped weighted kernel throughput sampled at 100 SNPs (full width
    # would take minutes — that contrast is the point)
    kernel_sample_n = min(100, p)
    k_sec, _ = run_weighted(False, rvs=names[:kernel_sample_n])

    print(
        json.dumps(
            {
                "metric": "gwas_canonical_wall",
                "value": round(warm, 3),
                "unit": "sec",
                "cold_sec": round(cold, 3),
                "n_obs": n,
                "n_snps": p,
                "fits_per_sec": round(p / warm, 1),
                "result_rows": n_rows,
                "weighted_warm_sec": round(w_warm, 3),
                "weighted_cold_sec": round(w_cold, 3),
                "weighted_fits_per_sec": round(p / w_warm, 1),
                "weighted_result_rows": w_rows,
                "weighted_kernel_sample": {
                    "n_snps": kernel_sample_n,
                    "sec": round(k_sec, 3),
                    "fits_per_sec": round(kernel_sample_n / k_sec, 1),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


