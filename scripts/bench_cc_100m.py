"""100M-edge connected-components stress (round 11, VERDICT r10 #5).

The public graph surface was measured only to 10M nodes / 8M edges in
r10; this runs the same three shapes an identity/duplicate graph takes
at 100M edges on local[32] and records, per shape:

- wall time and output rows,
- JVM heap in use after the run (memory headroom at the shipped
  default driver mem),
- the Spark block-manager local-dir footprint (what the per-round
  ``localCheckpoint`` of the label frame plus the DISK_ONLY edge list
  actually spill to disk) — the number a cluster sizing rule needs,
  since at 100 TB the equivalent is executor local storage.

Shapes (edge construction mirrors bench_round10_scale.py):
- ``star``  : 100-node stars, diameter 2 — the near-dup-clique shape;
- ``path``  : 5-node paths, diameter 4 — shallow chains;
- ``chain`` : 100-node chains, diameter 99 — the adversarial deep shape
  where pointer jumping's O(log d) rounds are mandatory.

Usage: python scripts/bench_cc_100m.py [n_edges] [--shapes star,path,chain]
Prints one JSON line; record results in BASELINE.md / SCALE.md. Run
shapes in separate processes if local disk is tight: each shape
unpersists its inputs, but shuffle files accumulate per session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators import graph  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402


def _local_dir_mb(spark) -> int:
    """Total size of Spark's scratch dirs (blockmgr + shuffle)."""
    conf_dir = spark.conf.get("spark.local.dir", None) or os.environ.get(
        "SPARK_LOCAL_DIRS", "/tmp"
    )
    total = 0
    for d in conf_dir.split(","):
        try:
            out = subprocess.run(
                ["du", "-sm", d], capture_output=True, text=True, timeout=600
            )
            total += int(out.stdout.split()[0])
        except Exception:
            pass
    return total


def _heap_mb(spark) -> tuple[int, int]:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) // (1024 * 1024)
    return int(used), int(rt.maxMemory() // (1024 * 1024))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    shapes = ["star", "path", "chain"]
    if "--shapes" in sys.argv:
        shapes = sys.argv[sys.argv.index("--shapes") + 1].split(",")
    spark = get_spark("bench-cc-100m")
    results: dict[str, object] = {"n_edges": n_edges}
    results["disk_mb_baseline"] = _local_dir_mb(spark)

    def run(name: str, edges, **kw) -> None:
        edges = edges.repartition(256).persist()
        n_in = edges.count()
        t = time.time()
        out_rows = graph.connected_components(edges, **kw).count()
        dt = time.time() - t
        edges.unpersist()
        used, mx = _heap_mb(spark)
        results[name] = round(dt, 1)
        results[f"{name}_edges"] = n_in
        results[f"{name}_nodes"] = out_rows
        results[f"{name}_heap_used_mb"] = used
        results[f"{name}_heap_max_mb"] = mx
        results[f"{name}_disk_mb"] = _local_dir_mb(spark)
        print(
            f"STAGE {name}: {dt:.1f}s edges={n_in} nodes={out_rows} "
            f"heap={used}/{mx}MB disk={results[f'{name}_disk_mb']}MB",
            file=sys.stderr,
            flush=True,
        )

    if "star" in shapes:
        # i -> i - i%100: 99 spokes per hub, diameter 2
        n = int(n_edges * 100 / 99)
        run(
            "cc_star100",
            spark.range(n)
            .select(F.col("id").alias("src"), (F.col("id") - F.col("id") % 100).alias("dst"))
            .where("id % 100 != 0"),
        )

    if "path" in shapes:
        # 5-node paths, diameter 4
        n = int(n_edges * 5 / 4)
        run(
            "cc_path5",
            spark.range(n)
            .where("id % 5 != 0")
            .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst")),
        )

    if "chain" in shapes:
        # 100-node chains, diameter 99 — pointer jumping required
        n = int(n_edges * 100 / 99)
        run(
            "cc_chain100",
            spark.range(n)
            .where("id % 100 != 0")
            .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst")),
            max_iter=50,
            shortcut=True,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
