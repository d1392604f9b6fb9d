from clarite_python_spark.operators import (  # noqa: F401
    analyze,
    dedup,
    describe,
    evaluation,
    graph,
    joins,
    modify,
    multimodal,
    pipeline,
    similarity,
    text,
)
