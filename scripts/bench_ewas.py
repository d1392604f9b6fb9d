"""EWAS-canonical-scale benchmark: the reference's flagship workload
shape — 22,624 observations x 970 variables, ~960 independent GLM fits
(reference clarite/modules/load.py:41, modify.py:209) — through the
grouped fan-out. The reference runs these sequentially in one process
(its pool is force-disabled); here they parallelize across cores /
executors via the groupBy(variable) shuffle.

Usage: python scripts/bench_ewas.py [n_rows] [n_vars]
Prints one JSON line with wall seconds and fits/sec.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22624
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 970

    from clarite_python_spark.catalog import ClariteFrame, VariableCatalog
    from clarite_python_spark.operators import analyze
    from clarite_python_spark.session import get_spark

    spark = get_spark("bench-ewas")

    rng = np.random.RandomState(42)
    age = rng.uniform(20, 70, n)
    sex = rng.choice([0.0, 1.0], n)
    base = 0.05 * age + 0.5 * sex
    data = {"ID": np.arange(n), "outcome": base + rng.randn(n), "age": age, "sex": sex}
    types = {"outcome": "continuous", "age": "continuous", "sex": "binary"}
    for i in range(p - 3):
        data[f"v{i}"] = rng.randn(n)
        types[f"v{i}"] = "continuous"
    pdf = pd.DataFrame(data)

    df = spark.createDataFrame(pdf).repartition(32).cache()
    df.count()
    cf = ClariteFrame(df, VariableCatalog(types=types, categories={"sex": [0.0, 1.0]}))

    def run() -> tuple[float, int]:
        t0 = time.perf_counter()
        res = analyze.association_study(
            cf, outcomes="outcome", covariates=["age", "sex"], min_n=200
        )
        n_rows = res.count()
        return time.perf_counter() - t0, n_rows

    cold, n_rows = run()  # includes codegen/Arrow/Python-worker warm-up
    warm, _ = run()
    n_fits = p - 3
    print(
        json.dumps(
            {
                "metric": "ewas_canonical_wall",
                "value": round(warm, 3),
                "unit": "sec",
                "cold_sec": round(cold, 3),
                "n_obs": n,
                "n_vars": p,
                "n_fits": n_fits,
                "fits_per_sec": round(n_fits / warm, 1),
                "result_rows": n_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
