from clarite_python_spark.operators import (  # noqa: F401
    analyze,
    dedup,
    describe,
    joins,
    modify,
    multimodal,
    pipeline,
    similarity,
    text,
)
