"""Time every registered query with the noop sink (guide §1.4).

One timed run per query (after an untimed warm-up of the session on q1),
computation only — ``df.write.format("noop")`` materializes every column
of every row without a sink or a driver collect. Prints one JSON line
per query and a sorted summary, so the optimization round can rank
operators by where the time actually goes rather than guessing.

Usage: python scripts/time_all_queries.py [sf_dir] [--reps N] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("time_all")
    qs = entry_mod.queries()
    names = [n for n in qs if not only or n in only]

    # session warm-up
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps({"query": name, "error": errors[name]}), flush=True)
            continue
        times[name] = round(best, 3)
        print(json.dumps({"query": name, "sec": times[name]}), flush=True)

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total_sec": round(sum(times.values()), 2),
                "n": len(times),
                "errors": errors,
                "top": ranked[:30],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
