"""Measure the dataset-pipeline extension layer at sf0.1 (documents /
events / embeddings) — the numbers BASELINE.md's pipeline table records.

Protocol mirrors bench.py: one untimed warm-up pass per query, then
best-of-3 timed runs to full materialization. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIPELINE_QUERIES = [
    "deterministic_split_documents",
    "stratified_sample_documents",
    "pack_sequences_documents",
    "chunk_documents_documents",
    "redact_documents",
    "top_tokens_documents",
    "bpe_token_counts_documents",
    "rolling_fingerprint_documents",
    "winnow_fingerprints_documents",
    "incremental_dedup_documents",
    "asof_join_events",
    "interval_join_events",
    "user_stats_events",
    "label_centroids_embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("bench-pipeline")
    qs = entry_mod.queries()
    for name in PIPELINE_QUERIES:
        qs[name](spark, sf_dir).collect()
    times = {}
    for name in PIPELINE_QUERIES:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "pipeline_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
