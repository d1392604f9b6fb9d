"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same-named SQL on DuckDB over the same
parquet tables; compares row count, column names, and (row-order
insensitive) values. Prints one line per query + a JSON summary.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        key = []
        for c in sorted(r):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            key.append((c, v))
        out.append(tuple(key))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("check-correctness", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    summary = {}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            summary[name] = "spark_error"
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle)")
            summary[name] = f"rows_only:{len(spark_rows)}"
            if len(spark_rows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            cur = con.execute(oracles[name])
            cols = [d[0] for d in cur.description]
            duck_rows = [dict(zip(cols, row)) for row in cur.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            summary[name] = "duckdb_error"
            failures += 1
            continue
        s_cols = sorted(spark_rows[0]) if spark_rows else []
        d_cols = sorted(duck_rows[0]) if duck_rows else []
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} duckdb={len(duck_rows)}")
            summary[name] = "rowcount_mismatch"
            failures += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duckdb={d_cols}")
            summary[name] = "schema_mismatch"
            failures += 1
            continue
        ns, nd = normalize(spark_rows), normalize(duck_rows)
        if ns != nd:
            bad = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            summary[name] = "value_mismatch"
            failures += 1
            continue
        print(f"OK    {name}: {len(spark_rows)} rows match")
        summary[name] = "ok"

    print(json.dumps({"sf_dir": sf_dir, "failures": failures, "results": summary}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
