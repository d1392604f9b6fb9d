"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for correctness-at-scale, not just local runs:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting);
- Arrow on (every ``applyInPandas`` kernel transfers columnar batches);
- session timezone pinned to UTC so timestamp semantics are stable across
  engines (the DuckDB correctness oracle reads the same parquet);
- shuffle partitions sized by env (32 locally; a real cluster would set
  this to ~2-3x total cores or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "clarite_python_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession configured for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (or all cores). On a real
    cluster the ``master`` setting is ignored in favor of the deploy-mode
    master; everything else carries over.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # start every shuffle WIDE and let AQE coalesce the small ones
        # back down: with only #cores initial partitions, a fan-out
        # stage (LSH candidate pairs, shingle verifies) hands each task
        # a hash-agg map sized 1/cores of the whole stage and the
        # unified pool thrashes (measured: jaccard_topk on a 1M-doc
        # corpus with 200-way near-dup cliques OOMs at 32 initial
        # partitions, completes at 8x). Small queries are unaffected —
        # AQE merges their sub-64MB partitions back to a handful.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(cpus, 8) * 8),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # read INT64 TIMESTAMP(NANOS) parquet columns as long (Spark has no
        # nanos timestamp); sources/io.load_testdata rebuilds a timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # single-JVM local mode: when all cores saturate (wide fan-outs +
        # GC), the heartbeat thread can starve past the 10s default and
        # crash the context — give it headroom (network.timeout must stay
        # larger than the heartbeat interval)
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "600s")
        # InferFiltersFromGenerate duplicates the generator child into a
        # Filter(size(e) > 0) below every explode. For this engine's
        # explodes the child is an EXPENSIVE computed array (gram hashes,
        # MinHash shingles, winnowing minima) that can never push past
        # its own computation, so the inferred filter just evaluates the
        # whole lambda chain a second time — and, sitting below the
        # fan-out repartition, often on far fewer partitions. Generate
        # with outer=false already skips null/empty inputs, so excluding
        # the rule is semantically free. Measured: duplicate_spans at
        # sf0.1 4.54 s -> 0.82 s (5.5x); see BASELINE.md round-5 table.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
