from clarite_python_spark.plot.plots import (
    distributions,
    histogram,
    manhattan,
    manhattan_bonferroni,
    manhattan_fdr,
    manhattan_prep,
    top_results,
    top_results_prep,
)

__all__ = [
    "distributions",
    "histogram",
    "manhattan",
    "manhattan_bonferroni",
    "manhattan_fdr",
    "manhattan_prep",
    "top_results",
    "top_results_prep",
]
