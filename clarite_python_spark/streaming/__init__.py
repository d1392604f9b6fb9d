from clarite_python_spark.streaming import events  # noqa: F401
