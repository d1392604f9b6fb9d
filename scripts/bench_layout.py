"""Z-order layout: measured data-skipping effect at ~12M rows.

Writes the same table twice — linearly sorted on an unrelated key vs
Z-ordered on (l_extendedprice, l_quantity) — then times a selective
two-column box query on each layout (warm, best-of-3) and counts how
many files the box predicate can touch per the parquet footers.

Usage: python scripts/bench_layout.py [replication_factor]
Prints one JSON line; record results in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clarite_python_spark.operators.layout import optimize_layout  # noqa: E402
from clarite_python_spark.session import get_spark  # noqa: E402

COLS = ["l_extendedprice", "l_quantity"]
BOX = {"l_extendedprice": (20000.0, 30000.0), "l_quantity": (10.0, 15.0)}


def overlapping_files(path: str) -> tuple[int, int]:
    hit = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ok = True
        for c in COLS:
            # row groups written without statistics can't be pruned —
            # count them as hits rather than crashing on .min of None
            stats = [
                md.row_group(g).column(names[c]).statistics
                for g in range(md.num_row_groups)
            ]
            stats = [s for s in stats if s is not None and s.has_min_max]
            if not stats:
                continue
            if min(s.min for s in stats) > BOX[c][1] or max(s.max for s in stats) < BOX[c][0]:
                ok = False
        total += 1
        hit += ok
    return hit, total


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("bench-layout")
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    df = base
    for _ in range(reps - 1):
        df = df.unionAll(base)
    n = df.count()

    tmp = tempfile.mkdtemp(prefix="zbench")
    naive, zpath = f"{tmp}/naive", f"{tmp}/zorder"
    per_file = max(n // 32, 1)
    t0 = time.time()
    (
        df.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.option("maxRecordsPerFile", per_file)
        .parquet(naive)
    )
    t_naive_write = time.time() - t0
    t0 = time.time()
    optimize_layout(df, COLS, path=zpath, n_partitions=8, max_records_per_file=per_file)
    t_z_write = time.time() - t0

    pred = (
        (F.col("l_extendedprice").between(*BOX["l_extendedprice"]))
        & (F.col("l_quantity").between(*BOX["l_quantity"]))
    )

    def q(path: str) -> float:
        d = spark.read.parquet(path)
        best = None
        for _ in range(3):
            t = time.time()
            d.where(pred).agg(F.sum("l_extendedprice"), F.count(F.lit(1))).collect()
            best = min(best or 1e9, time.time() - t)
        return best

    q(naive)  # warm FS cache on both layouts before timing
    q(zpath)
    t_naive, t_z = q(naive), q(zpath)
    nh, nt = overlapping_files(naive)
    zh, zt = overlapping_files(zpath)
    print(
        json.dumps(
            {
                "metric": "zorder_scan_speedup",
                "value": round(t_naive / t_z, 3),
                "unit": "x",
                "rows": n,
                "naive_scan_s": round(t_naive, 3),
                "zorder_scan_s": round(t_z, 3),
                "naive_files_hit": f"{nh}/{nt}",
                "zorder_files_hit": f"{zh}/{zt}",
                "naive_write_s": round(t_naive_write, 3),
                "zorder_write_s": round(t_z_write, 3),
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
