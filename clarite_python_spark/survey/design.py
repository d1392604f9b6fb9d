"""SurveyDesignSpec — complex-survey design metadata, Spark-side
(reference ``clarite/modules/survey/survey_design.py:9-163``).

The reference holds the design as pandas Series aligned to the data
index. Here the design is a second *narrow* DataFrame keyed by ``ID``
(strata / cluster / weight columns / fpc / subset flag) that the
weighted fan-out equi-joins into the long table, plus a small set of
**full-design constants** (clusters-per-stratum, stratum-for-cluster,
per-cluster fpc fractions, weight means) computed once with batched
aggregations and closure-broadcast into every grouped kernel — the
reference computes these once per design too (``survey_design.py:
132-144``) and recomputing per variable would be quadratic.

Scale notes:
- the design table is one row per observation but only ~5 columns wide;
  the join is a co-partitioned equi-join on ``ID`` (sort-merge at scale,
  broadcast when small — left to AQE).
- full-design constants are O(#clusters) (+O(#strata)); cluster counts
  are bounded by the sampling frame, not the data. Designs with NO
  cluster variable default to one-cluster-per-observation (reference
  ``survey_design.py:195-198``); for those the kernel uses a closed-form
  per-stratum path so no O(rows) driver state is ever built.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clarite_python_spark.catalog import ID_COL, ClariteFrame

STRAT_COL = "__strat"
CLUST_COL = "__clust"
FPC_COL = "__fpc"
SUBSET_COL = "__subset"


def _weight_col(name: str) -> str:
    return f"__w::{name}"


class SurveyDesignSpec:
    """Spark-native analogue of the reference SurveyDesignSpec.

    Parameters mirror the reference (``survey_design.py:55-65``):
    ``survey_data`` (DataFrame or ClariteFrame with an ``ID`` column and
    the design columns), ``strata``, ``cluster``, ``nest``, ``weights``
    (single column name or {variable: weight column} mapping), ``fpc``,
    ``single_cluster`` in {fail, adjust, average, certainty}, and
    ``drop_unweighted``.
    """

    def __init__(
        self,
        survey_data: DataFrame | ClariteFrame,
        strata: str | None = None,
        cluster: str | None = None,
        nest: bool = False,
        weights: str | Mapping[str, str] | None = None,
        fpc: str | None = None,
        single_cluster: str = "fail",
        drop_unweighted: bool = False,
    ):
        df = survey_data.df if isinstance(survey_data, ClariteFrame) else survey_data
        if ID_COL not in df.columns:
            raise ValueError(f"survey_data must have an {ID_COL!r} column")
        if strata is None and cluster is None and weights is None:
            raise ValueError("At least one of strata, cluster, or weights must be provided")
        if single_cluster not in {"fail", "adjust", "average", "certainty"}:
            raise ValueError(
                "'single_cluster' must be one of 'fail', 'adjust', 'average', or 'certainty'."
            )
        for name, col in (("strata", strata), ("cluster", cluster), ("fpc", fpc)):
            if col is not None and col not in df.columns:
                raise KeyError(f"{name} key ('{col}') was not found in the survey_df")

        self.has_strata = strata is not None
        self.strata_name = strata
        self.has_cluster = cluster is not None
        self.cluster_name = cluster
        self.nested_clusters = bool(nest and self.has_strata and self.has_cluster)
        self.has_fpc = fpc is not None
        self.fpc_name = fpc
        self.single_cluster = single_cluster
        self.drop_unweighted = drop_unweighted
        self.subset_count = 0

        # weights: None | single name | {variable: weight name}
        self.single_weight = isinstance(weights, str)
        self.multi_weight = isinstance(weights, Mapping)
        self.weight_name = weights if self.single_weight else None
        self.weight_names = dict(weights) if self.multi_weight else None
        if weights is not None and not (self.single_weight or self.multi_weight):
            raise ValueError(
                "'weights' must be None, a weight name string, or a dictionary"
                " mapping variable name strings to weight name strings"
            )
        unique_weights = (
            [self.weight_name]
            if self.single_weight
            else sorted(set(self.weight_names.values())) if self.multi_weight else []
        )
        for w in unique_weights:
            if w not in df.columns:
                raise KeyError(f"the weight ('{w}') was not found in the survey_df")
        self.unique_weight_names = unique_weights

        cols = [F.col(ID_COL)]
        strat_expr = (
            F.col(strata).cast("string") if self.has_strata else F.lit("1")
        )
        cols.append(strat_expr.alias(STRAT_COL))
        if self.has_cluster:
            clust_expr = F.col(cluster).cast("string")
            if self.nested_clusters:
                # nest: same PSU id in different strata are distinct PSUs
                # (reference survey_design.py:215-221)
                clust_expr = F.concat_ws("-", strat_expr, clust_expr)
            cols.append(clust_expr.alias(CLUST_COL))
        cols.append(
            (F.col(fpc).cast("double") if self.has_fpc else F.lit(0.0)).alias(FPC_COL)
        )
        for w in unique_weights:
            # zero/negative weights -> 1e-99 to avoid divide-by-zero
            # (reference survey_design.py:244-246,257-259)
            cols.append(
                F.when(F.col(w).cast("double") <= 0, F.lit(1e-99))
                .otherwise(F.col(w).cast("double"))
                .alias(_weight_col(w))
            )
        cols.append(F.lit(True).alias(SUBSET_COL))
        self.df = df.select(*cols)
        self._constants: dict | None = None
        self._weight_means: dict[str, float] | None = None

        # NA checks on strata/cluster/fpc are part of the constants scan
        # (they would each force an action here; the reference checks
        # eagerly, survey_design.py:180-183).

    # ------------------------------------------------------------------
    # subsets
    # ------------------------------------------------------------------

    def subset(self, keep: DataFrame, condition: Column | str | None = None) -> None:
        """Restrict analysis to a subpopulation WITHOUT dropping design
        rows (reference ``survey_design.py:552-578``): full-design
        variance constants are unaffected; the flag is ANDed late.

        ``keep`` is either a DataFrame of (ID, <boolean column>) or — with
        ``condition`` — any DataFrame containing ``ID`` (e.g. the data
        frame), filtered by the given boolean Column/SQL expression.
        """
        if condition is not None:
            cond = F.expr(condition) if isinstance(condition, str) else condition
            flags = keep.select(ID_COL, cond.alias("__keep"))
        else:
            others = [c for c in keep.columns if c != ID_COL]
            if len(others) != 1:
                raise ValueError("subset DataFrame must be (ID, <boolean column>)")
            flags = keep.select(ID_COL, F.col(others[0]).cast("boolean").alias("__keep"))
        self.df = (
            self.df.join(flags, on=ID_COL, how="left")
            .withColumn(
                SUBSET_COL, F.col(SUBSET_COL) & F.coalesce(F.col("__keep"), F.lit(False))
            )
            .drop("__keep")
        )
        self.subset_count += 1
        self._constants = None  # n-strat style constants unaffected, but recollect lazily

    # ------------------------------------------------------------------
    # weight resolution
    # ------------------------------------------------------------------

    def weight_for(self, regression_variable: str) -> str | None:
        """Weight column for one regression variable (reference
        ``get_weights``, survey_design.py:367-395). Raises for a
        multi-weight design with no mapping for the variable."""
        if self.single_weight:
            return self.weight_name
        if self.multi_weight:
            w = self.weight_names.get(regression_variable)
            if w is None:
                raise ValueError(
                    f"No weight found in the survey design for the "
                    f"'{regression_variable}' variable"
                )
            return w
        return None

    def weight_means(self) -> dict[str, float]:
        """Full-design mean of each weight column (weights are normalized
        by their mean before every regression, reference
        survey_design.py:390) — one batched agg, cached."""
        if self._weight_means is None:
            if not self.unique_weight_names:
                self._weight_means = {}
            else:
                row = self.df.agg(
                    *[F.avg(_weight_col(w)).alias(w) for w in self.unique_weight_names]
                ).collect()[0]
                self._weight_means = {w: float(row[w]) for w in self.unique_weight_names}
        return self._weight_means

    # ------------------------------------------------------------------
    # full-design constants (broadcast into kernels)
    # ------------------------------------------------------------------

    def constants(self) -> dict:
        """Collect the full-design constants once (cached):
        stratum-for-cluster, clusters-per-stratum, per-cluster fpc
        fractions (population sizes converted per reference
        survey_design.py:267-317), and row counts per stratum."""
        if self._constants is not None:
            return self._constants

        c: dict = {
            "has_strata": self.has_strata,
            "has_cluster": self.has_cluster,
            "single_cluster": self.single_cluster,
        }
        if self.has_cluster:
            rows = (
                self.df.groupBy(CLUST_COL)
                .agg(
                    F.first(STRAT_COL).alias("strat"),
                    F.first(FPC_COL).alias("fpc"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.when(F.col(STRAT_COL).isNull(), 1).otherwise(0)).alias("na_strat"),
                )
                .collect()
            )
            clusters = sorted(r[CLUST_COL] for r in rows)
            by_clust = {r[CLUST_COL]: r for r in rows}
            strat_for_clust = {k: by_clust[k]["strat"] for k in clusters}
            clust_per_strat: dict = {}
            rows_per_strat: dict = {}
            for k in clusters:
                s = strat_for_clust[k]
                clust_per_strat[s] = clust_per_strat.get(s, 0) + 1
                rows_per_strat[s] = rows_per_strat.get(s, 0) + by_clust[k]["n_rows"]
            fpc_raw = {k: float(by_clust[k]["fpc"] or 0.0) for k in clusters}
            n_clust = len(clusters)
            if self.has_fpc and any(v > 1 for v in fpc_raw.values()):
                # population sizes -> sampling fractions
                if self.has_strata:
                    fpc = {
                        k: rows_per_strat[strat_for_clust[k]] / fpc_raw[k] for k in clusters
                    }
                else:
                    fpc = {k: n_clust / fpc_raw[k] for k in clusters}
            else:
                fpc = fpc_raw
            if self.has_fpc and not all(0 <= v <= 1 for v in fpc.values()):
                raise ValueError("Error processing FPC- invalid values")
            c.update(
                clusters=clusters,
                strat_for_clust=strat_for_clust,
                clust_per_strat=clust_per_strat,
                rows_per_strat=rows_per_strat,
                fpc_for_clust=fpc,
            )
            if (
                self.has_strata
                and self.single_cluster == "fail"
                and min(clust_per_strat.values()) < 2
            ):
                singles = sorted(
                    str(s) for s, v in clust_per_strat.items() if v == 1
                )
                raise ValueError(
                    f"One or more strata have single clusters: {', '.join(singles)}. "
                    f"Adjust the 'single_cluster' SurveyDesignSpec parameter "
                    f"or reassign the singular cluster to avoid this error."
                )
        else:
            rows = (
                self.df.groupBy(STRAT_COL)
                .agg(F.count(F.lit(1)).alias("n_rows"), F.first(FPC_COL).alias("fpc"))
                .collect()
            )
            if self.has_strata:
                rows_per_strat = {r[STRAT_COL]: int(r["n_rows"]) for r in rows}
                fpc_raw = {r[STRAT_COL]: float(r["fpc"] or 0.0) for r in rows}
            else:
                rows_per_strat = {"__all__": int(sum(r["n_rows"] for r in rows))}
                fpc_raw = {"__all__": float(rows[0]["fpc"] or 0.0)}
            if self.has_fpc and any(v > 1 for v in fpc_raw.values()):
                if not self.has_strata:
                    raise ValueError("Error processing FPC- invalid values")
                fpc = {s: rows_per_strat[s] / v if v > 1 else v for s, v in fpc_raw.items()}
            else:
                fpc = fpc_raw
            if self.has_fpc and not all(0 <= v <= 1 for v in fpc.values()):
                raise ValueError("Error processing FPC- invalid values")
            # clust_per_strat (one obs per cluster) == rows_per_strat
            c.update(
                rows_per_strat=rows_per_strat,
                clust_per_strat=dict(rows_per_strat),
                fpc_for_strat=fpc,
            )
        self._constants = c
        return c

    # ------------------------------------------------------------------
    # validation against an analysis frame
    # ------------------------------------------------------------------

    def validate(self, data: ClariteFrame | DataFrame) -> str | None:
        """Design columns must NOT appear in the data (reference
        survey_design.py:488-550); returns an error string or None.
        (The per-row coverage check is performed lazily by the join.)"""
        cols = set(
            (data.variables if isinstance(data, ClariteFrame) else data.columns)
        )
        msg = " Survey design variables should not be included in the data."
        if self.has_strata and self.strata_name in cols:
            return f"Strata variable ({self.strata_name}) found in the passed data." + msg
        if self.has_cluster and self.cluster_name in cols:
            return f"Cluster variable ({self.cluster_name}) found in the passed data." + msg
        if self.has_fpc and self.fpc_name in cols:
            return f"FPC variable ({self.fpc_name}) found in the passed data." + msg
        matched = set(self.unique_weight_names) & cols
        if len(matched) == 1:
            return f"Weight variable ({sorted(matched)[0]}) found in the passed data." + msg
        if len(matched) > 1:
            return f"{len(matched):,} Weight variables found in the passed data." + msg
        return None

    def design_columns(self) -> list[str]:
        out = [STRAT_COL, FPC_COL, SUBSET_COL]
        if self.has_cluster:
            out.insert(1, CLUST_COL)
        out.extend(_weight_col(w) for w in self.unique_weight_names)
        return out
