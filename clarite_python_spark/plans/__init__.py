from clarite_python_spark.plans.melt import melt  # noqa: F401
