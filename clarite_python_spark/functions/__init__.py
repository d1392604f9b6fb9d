from clarite_python_spark.functions import distributions, glm  # noqa: F401
