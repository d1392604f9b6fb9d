"""Funnel straggler measurement under user skew (VERDICT round-6 #4).

The funnel's per-user collect_list is bounded by that user's
(step-filtered) event count; a bot user holding a large share of the
events serializes one task. This script measures funnel() wall time at
1M synthetic events in three shapes on local[32]:

  uniform   - 1M events over 100k users (~10 events/user)
  zipf-bot  - same, but one bot user owns 10% of all events (100k)
  capped    - zipf-bot with max_events_per_user=10_000 (bot dropped
              before the collect via the count pre-filter)

Events are generated engine-side (spark.range + hash arithmetic, no
driver loops); results go to stdout for BASELINE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import clarite_python_spark as cs  # noqa: E402
from clarite_python_spark.operators.events import funnel  # noqa: E402

N = 1_000_000
N_USERS = 100_000
STEPS = ["signup", "view", "purchase"]


def make_events(spark, bot_share: float):
    base = spark.range(N)
    n_bot = int(N * bot_share)
    user = (
        F.when(F.col("id") < n_bot, F.lit(0))  # the bot
        .otherwise((F.abs(F.hash(F.col("id"))) % F.lit(N_USERS)) + 1)
        .cast("long")
    )
    step = F.element_at(
        F.array(*[F.lit(s) for s in STEPS]),
        (F.abs(F.hash(F.col("id"), F.lit(7))) % 3 + 1).cast("int"),
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400)
    return base.select(
        user.alias("user_id"), ts.alias("ts"), step.alias("event_type")
    )


def timed(label, df):
    best, n = float("inf"), 0
    for _ in range(2):  # best-of-2: first run absorbs JIT/stage warm-up
        t0 = time.time()
        n = df.count()
        best = min(best, time.time() - t0)
    print(f"{label:10s} {best:7.2f} s   ({n} funnel rows)")
    return best


def main() -> None:
    spark = cs.get_spark()
    uniform = make_events(spark, 0.0)
    zipf = make_events(spark, 0.10)
    uniform.count()  # session warm-up
    for name, df, kw in (
        ("uniform", uniform, {}),
        ("zipf-bot", zipf, {}),
        ("capped", zipf, {"max_events_per_user": 10_000}),
    ):
        timed(name, funnel(df, STEPS, **kw))


if __name__ == "__main__":
    main()
