from clarite_python_spark.sources import io  # noqa: F401
