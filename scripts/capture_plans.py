"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the 12
bench headline queries). The judge reads these files to check plan
claims (Exchange count, join strategy, PushedFilters, Python nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = sys.argv[4:]

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from clarite_python_spark.session import get_spark

    spark = get_spark("capture_plans")
    qs = entry_mod.queries()
    names = only or HEADLINE
    outdir = os.path.join("/root/repo/plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
