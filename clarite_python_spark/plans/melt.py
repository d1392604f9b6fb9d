"""Wide->long unpivot — the one structural transform pandas never needed.

The reference slices columns in place per regression variable
(``glm_regression.py:366``); Spark's equivalent fan-out needs the wide
observations x variables table reshaped to long ``(ID, ..., variable,
value)`` so the per-variable GLM fits become one
``groupBy("variable").applyInPandas`` job (SURVEY.md §2.6 canonical plan).

Spark ≥3.4 has a native ``DataFrame.unpivot`` (Catalyst ``Expand`` node:
one scan, rows multiplied by len(value_vars), no shuffle until the
downstream groupBy). We cast all value columns to a common type first —
unpivot requires it — double for continuous fan-outs, string for
categorical ones.

Scale note: the Expand output is |rows| x |value_vars|; the subsequent
shuffle partitions by ``variable`` so each reducer sees ~|rows| values.
That is the right layout for ≤10^7 rows/group; beyond that switch to the
columnar strategy (one Spark ML GLM job per variable, see
operators/analyze.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """Unpivot ``value_vars`` into (var_name, value_name) rows."""
    casted = df.select(
        *[F.col(c) for c in id_vars],
        *[F.col(c).cast(value_type).alias(c) for c in value_vars],
    )
    return casted.unpivot(list(id_vars), list(value_vars), var_name, value_name)
