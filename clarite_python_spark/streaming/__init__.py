from clarite_python_spark.streaming import (  # noqa: F401
    corpus,
    dedup,
    events,
    funnel,
    ingest,
    retention,
    state,
)
