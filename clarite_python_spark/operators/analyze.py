"""The regression fan-out — CLARITE's core "query engine"
(reference ``clarite/modules/analyze/``).

``association_study`` fits one GLM per (outcome x regression-variable)
pair over a single wide table. The reference iterates variables in one
process (its multiprocessing pool is force-disabled,
``glm_regression.py:400-401``); here the designed per-variable
independence becomes the distributed axis:

    wide df --unpivot(RV cols)--> long (ID, outcome, covars..., variable, value)
        --groupBy("variable").applyInPandas(numpy GLM kernel)--> result rows
        --orderBy(pvalue)

The unpivot is a Catalyst ``Expand`` (one scan); the only shuffle keys on
``variable``, so each reducer handles ~|rows| values — the correct layout
up to ~10^7 rows/group. Beyond that (100-TB regime) a columnar strategy —
one Spark ML ``GeneralizedLinearRegression`` job per variable scheduled
from a driver thread pool over column-sliced DataFrames — keeps the same
result schema; the melt path is the default because EWAS tables are wide
(10^3 columns) and short-ish per group.

Kernel inputs that are identical across groups (covariate types/levels,
family, min_n) ride along as a tiny closure-captured dict (broadcast by
task serialization, ≈KBs).
"""

from __future__ import annotations

import warnings
from itertools import combinations
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clarite_python_spark.catalog import (
    BINARY,
    CATEGORICAL,
    CONSTANT,
    CONTINUOUS,
    ID_COL,
    UNKNOWN,
    ClariteFrame,
    qcol,
)
from clarite_python_spark.functions.distributions import chi2_sf, t_sf
from clarite_python_spark.functions.glm import (
    BINOMIAL,
    GAUSSIAN,
    dummy_encode,
    fit_glm,
)
from clarite_python_spark.functions.wglm import (
    fit_weighted_glm,
    jackknife_vcov,
    regterm_pvalue,
    sandwich_vcov,
    survey_dof,
)

__all__ = [
    "association_study",
    "interaction_study",
    "add_corrected_pvalues",
    "ewas",
    "get_significant",
]


# Budget of (variable x left-out-cluster) replicate units the
# jackknife-IRLS engine may batch through distributed scans. Units are
# chunked at 256/scan and each chunk runs its own multi-iteration IRLS
# loop, so full-table scans grow as ceil(units/256) x iterations — past
# this budget (~16 chunks x ~8 iters ~ 130 scans) the grouped kernel's
# in-pandas delete-1 replicates (ONE scan, per-variable numpy refits)
# are the cheaper engine and the routing falls back to it.
JK_IRLS_MAX_UNITS = 4096

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("Variable", T.StringType()),
        T.StructField("Outcome", T.StringType()),
        T.StructField("Category", T.StringType()),
        T.StructField("Variable_type", T.StringType()),
        T.StructField("Weight", T.StringType()),
        T.StructField("Converged", T.BooleanType()),
        T.StructField("N", T.LongType()),
        T.StructField("Beta", T.DoubleType()),
        T.StructField("SE", T.DoubleType()),
        T.StructField("Beta_pvalue", T.DoubleType()),
        T.StructField("LRT_pvalue", T.DoubleType()),
        T.StructField("Diff_AIC", T.DoubleType()),
        T.StructField("pvalue", T.DoubleType()),
    ]
)
# The reference's result frame (glm_regression.py:240-252) has index
# (Variable, Outcome[, Category]) and columns Variable_type..pvalue; the
# Category level exists only when report_categorical_betas=True — we keep
# a single schema with a nullable Category column.


def _default_row(rv: str, outcome: str) -> dict:
    """All-NaN result row (reference get_default_result_dict,
    glm_regression.py:197-210)."""
    return {
        "Variable": rv,
        "Outcome": outcome,
        "Category": None,
        "Variable_type": None,
        "Weight": None,
        "Converged": False,
        "N": None,
        "Beta": np.nan,
        "SE": np.nan,
        "Beta_pvalue": np.nan,
        "LRT_pvalue": np.nan,
        "Diff_AIC": np.nan,
        "pvalue": np.nan,
    }


def _encode_binary_outcome(levels: list) -> dict:
    """Sorted levels -> {level: 0/1}; 'Case'/'Control' special-cased so
    Control=0, Case=1 (reference glm_regression.py:135-150, GH #115)."""
    cats = sorted(levels)
    if len(cats) != 2:
        raise ValueError(f"binary outcome must have 2 levels, got {cats}")
    if cats[0] == "Case" and cats[1] == "Control":
        cats = ["Control", "Case"]
    return {cats[0]: 0.0, cats[1]: 1.0}


def _design_matrix(
    sub: pd.DataFrame,
    covariates: Sequence[str],
    covar_types: Mapping[str, str],
) -> tuple[np.ndarray, list[str], list[str]]:
    """Intercept + encoded covariates. Categorical covariates are
    treatment-coded against their *present* sorted levels (the reference
    drops empty categories after the complete-case mask,
    glm_regression.py:510-520, then patsy uses sorted levels).
    Returns (matrix, names, warnings)."""
    n = len(sub)
    cols = [np.ones(n)]
    names = ["Intercept"]
    warns: list[str] = []
    for cv in covariates:
        vals = sub[cv]
        if vals.nunique(dropna=True) <= 1:
            warns.append(f"non-varying covariate '{cv}' ignored")
            continue
        if covar_types.get(cv) in (BINARY, CATEGORICAL):
            levels = sorted(vals.dropna().unique().tolist())
            mat, nm = dummy_encode(vals.to_numpy(), levels, cv)
            if mat.shape[1]:
                cols.append(mat)
                names.extend(nm)
        else:
            cols.append(vals.to_numpy(dtype=float))
            names.append(cv)
    X = np.column_stack([c if c.ndim == 2 else c[:, None] for c in cols])
    return X, names, warns


def _make_assoc_kernel(
    outcome: str,
    covariates: list[str],
    covar_types: dict[str, str],
    rv_types: dict[str, str],
    family: str,
    min_n: int,
    report_categorical_betas: bool,
):
    """Build the applyInPandas kernel for one outcome's fan-out.

    Mirrors the reference per-RV flow (_run_rv, glm_regression.py:450-565):
    complete-case mask -> min_n gate -> drop non-varying covariates ->
    fit -> extract Wald (continuous/binary RV) or LRT (categorical RV).
    """

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rv = key[0]
        vtype = rv_types[rv]
        rows: list[dict] = []
        try:
            use_cols = [outcome, *covariates, "value"]
            sub = pdf[use_cols].dropna()
            n_complete = len(sub)
            if n_complete < min_n:
                raise ValueError(f"too few complete observations ({n_complete} < {min_n})")
            y = sub[outcome].to_numpy(dtype=float)
            Xr, names_r, _ = _design_matrix(sub, covariates, covar_types)

            if vtype == CONTINUOUS:
                x = pd.to_numeric(sub["value"]).to_numpy(dtype=float)[:, None]
                X = np.hstack([Xr, x])
                res = fit_glm(X, y, names_r + [rv], family)
                row = _default_row(rv, outcome)
                row.update(Variable_type=vtype, N=n_complete)
                if res.converged:
                    b, s, p = res.by_name()[rv]
                    row.update(Converged=True, Beta=b, SE=s, Beta_pvalue=p, pvalue=p)
                rows.append(row)
            elif vtype in (BINARY, CATEGORICAL):
                levels = _sorted_levels(sub["value"])
                mat, nm = dummy_encode(sub["value"].to_numpy(), levels, rv)
                X = np.hstack([Xr, mat])
                res = fit_glm(X, y, names_r + nm, family)
                if vtype == BINARY:
                    row = _default_row(rv, outcome)
                    row.update(Variable_type=vtype, N=n_complete)
                    if res.converged and nm:
                        b, s, p = res.by_name()[nm[0]]
                        row.update(Converged=True, Beta=b, SE=s, Beta_pvalue=p, pvalue=p)
                    rows.append(row)
                else:
                    res_r = fit_glm(Xr, y, names_r, family)
                    if res.converged and res_r.converged:
                        lrdf = res_r.df_resid - res.df_resid
                        lrstat = -2.0 * (res_r.llf - res.llf)
                        lr_p = float(chi2_sf(lrstat, lrdf)) if lrdf > 0 else np.nan
                        diff_aic = res.aic - res_r.aic
                        if report_categorical_betas:
                            by = res.by_name()
                            for param in nm:
                                b, s, p = by[param]
                                row = _default_row(rv, outcome)
                                row.update(
                                    Variable_type=vtype,
                                    N=n_complete,
                                    Converged=True,
                                    Category=param,
                                    Beta=b,
                                    SE=s,
                                    Beta_pvalue=p,
                                    LRT_pvalue=lr_p,
                                    Diff_AIC=diff_aic,
                                    pvalue=lr_p,
                                )
                                rows.append(row)
                        else:
                            row = _default_row(rv, outcome)
                            row.update(
                                Variable_type=vtype,
                                N=n_complete,
                                Converged=True,
                                LRT_pvalue=lr_p,
                                Diff_AIC=diff_aic,
                                pvalue=lr_p,
                            )
                            rows.append(row)
                    else:
                        row = _default_row(rv, outcome)
                        row.update(Variable_type=vtype, N=n_complete)
                        rows.append(row)
            else:
                raise ValueError(f"unsupported regression variable type {vtype!r}")
        except Exception:
            rows = [_default_row(rv, outcome)]
        out = pd.DataFrame(rows)
        out["N"] = out["N"].astype("Int64")
        return out[[f.name for f in RESULT_SCHEMA.fields]]

    return kernel


def _encode_genotype_variables(
    data: ClariteFrame,
    candidates: Sequence[str],
    encoding: str,
    edge_encoding_info,
) -> ClariteFrame:
    """Pre-encode genotype columns before the fan-out (reference
    ``_get_rv_specific_data``, glm_regression.py:364-384): the encoded
    column replaces the genotype in place and its CLARITE type becomes
    the encoded type (continuous, or categorical for codominant). Pure
    column expressions — the plan gains one projection, no UDF."""
    from clarite_python_spark.catalog import GENOTYPES
    from clarite_python_spark.functions.genotypes import (
        KNOWN_ENCODINGS,
        _sql_name,
        edge_alphas,
        encode_genotype_sql,
    )

    geno = [c for c in candidates if data.catalog.get(c) == GENOTYPES]
    if not geno:
        return data
    if encoding not in KNOWN_ENCODINGS:
        raise ValueError(f"Genotypes provided with unknown 'encoding': {encoding}")
    if encoding == "edge" and edge_encoding_info is None:
        raise ValueError("'edge_encoding_info' must be provided when using edge encoding")
    alphas = edge_alphas(edge_encoding_info) if encoding == "edge" else {}
    df = data.df
    cat = data.catalog.copy()
    # ONE selectExpr of SQL strings, replacing columns in place: the
    # Column-API form cost ~20 py4j round-trips per variant (measured
    # 43 s of driver time at 1,000 variants just BUILDING the plan); a
    # per-column withColumn loop additionally nests one Project per
    # genotype and overflows the JVM stack at GWAS width (10^3-10^6)
    exprs = {}
    for c in geno:
        if c not in cat.alleles:
            raise ValueError(f"genotype column {c!r} has no allele info (make_genotypes)")
        ref, alt = cat.alleles[c]
        alpha = alphas.get(c)
        if encoding == "edge" and alpha is None:
            raise ValueError(f"no edge alpha provided for variant {c!r}")
        sql, new_type = encode_genotype_sql(c, ref, alt, encoding, alpha)
        exprs[c] = sql
        cat.set(c, new_type)
    select = [
        f"{exprs[c]} AS {_sql_name(c)}" if c in exprs else _sql_name(c)
        for c in df.columns
    ]
    return ClariteFrame(df.selectExpr(*select), cat)


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread the fan-out's scans across cores when the input arrived as
    a SINGLE partition (a local / createDataFrame artifact: a
    pandas-built frame is one partition, serializing every aggregation —
    measured 70s vs ~3s for the GWAS contingency pass). Only the
    degenerate case triggers: for any multi-split input (parquet at
    scale) the repartition shuffle costs more than the extra
    parallelism buys on scan-bound aggregations (measured 3.1s vs 1.7s
    on a 3-split sf0.1 lineitem suffstats query), so this never adds a
    shuffle there."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if target > 1 and df.rdd.getNumPartitions() == 1:
        return df.repartition(target)
    return df


def _sorted_levels(values: pd.Series) -> list:
    """Distinct non-NA values, sorted numerically when every value parses
    as a number, else lexically — matching pandas' sorted category levels
    (values keep their original numeric order in the reference even
    though our melt carries them as strings)."""
    lv = values.dropna().unique().tolist()
    try:
        return sorted(lv, key=float)
    except (TypeError, ValueError):
        return sorted(lv)


def _missing_weight_error(sub_values: pd.Series, missing_mask, weight_name: str) -> str:
    """Detailed missing-weight error (reference survey_design.py:431-486)."""
    n_missing = int(missing_mask.sum())
    unique_missing = set(sub_values[missing_mask].dropna().unique())
    unique_not_missing = set(sub_values[~missing_mask].dropna().unique())
    sometimes = sorted(str(v) for v in unique_missing & unique_not_missing)
    always = sorted(str(v) for v in unique_missing - unique_not_missing)
    error = (
        f"{n_missing:,} observations are missing weights ({weight_name})"
        f" when the variable is not missing."
    )
    if len(sometimes) == 1:
        error += f"\n\tOne value sometimes occurs in observations with missing weight: {sometimes[0]}"
    elif len(sometimes) > 1:
        error += (
            f"\n\t{len(sometimes)} values sometimes occur in observations with missing weight:"
            f" {', '.join(sometimes[:5])}{', ...' if len(sometimes) > 5 else ''}"
        )
    if len(always) == 1:
        error += (
            f"\n\tOne value is only found in observations with missing weights: {always[0]}."
            " Should it be encoded as NaN?"
        )
    elif len(always) > 1:
        error += (
            f"\n\t{len(always)} values are only found in observations with missing weights: "
            f"{', '.join(always[:5])}{', ...' if len(always) > 5 else ''} Should they be encoded as NaN?"
        )
    return error


def _make_weighted_kernel(
    outcome: str,
    covariates: list[str],
    covar_types: dict[str, str],
    rv_types: dict[str, str],
    family: str,
    min_n: int,
    report_categorical_betas: bool,
    constants: dict,
    weight_info: dict,
    vcov_method: str = "stata",
):
    """applyInPandas kernel for the survey-weighted fan-out (reference
    ``weighted_glm_regression.py:357-494``). ``constants`` is the
    full-design broadcast state from SurveyDesignSpec.constants();
    ``weight_info`` = {single_weight, weight_name, weight_names,
    weight_means, drop_unweighted}. ``vcov_method``: ``"stata"`` =
    linearized sandwich (what the reference's ``fit`` uses);
    ``"jackknife"`` = delete-1-cluster replicates (implemented but unused
    in the reference, survey_model.py:174-208).
    """
    from clarite_python_spark.survey.design import (
        CLUST_COL,
        STRAT_COL,
        SUBSET_COL,
        _weight_col,
    )

    has_strata = constants["has_strata"]
    has_cluster = constants["has_cluster"]

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rv = key[0]
        vtype = rv_types[rv]
        rows: list[dict] = []
        try:
            # ---- resolve + normalize the weight for this variable ----
            if weight_info["single_weight"]:
                wname = weight_info["weight_name"]
            elif weight_info["weight_names"] is not None:
                wname = weight_info["weight_names"].get(rv)
                if wname is None:
                    raise ValueError(
                        f"No weight found in the survey design for the '{rv}' variable"
                    )
            else:
                wname = None
            if wname is not None:
                wvals = pdf[_weight_col(wname)] / weight_info["weight_means"][wname]
            else:
                wvals = pd.Series(1.0, index=pdf.index)

            subset = pdf[SUBSET_COL]
            if subset.isna().any():
                n_miss = int(subset.isna().sum())
                raise ValueError(
                    f"The survey design is missing information for {n_miss:,} rows in the data"
                )
            subset = subset.astype(bool)

            # ---- missing-weight policy (reference survey_design.py:397-486)
            weight_label = wname
            var_na = pdf["value"].isna()
            if wname is not None:
                missing_weight = ~var_na & wvals.isna() & subset
                n_mw = int(missing_weight.sum())
                if n_mw > 0:
                    if weight_info["drop_unweighted"]:
                        weight_label = f"{wname} ({n_mw} observations are missing weights)"
                    else:
                        raise ValueError(
                            _missing_weight_error(pdf["value"], missing_weight, wname)
                        )
            else:
                missing_weight = pd.Series(False, index=pdf.index)

            complete = ~pdf[[outcome, *covariates, "value"]].isna().any(axis=1)
            restricted = complete & subset & ~missing_weight
            N = int(restricted.sum())
            if N < min_n:
                raise ValueError(
                    f"too few complete observations (min_n filter: {N} < {min_n})"
                )

            sub = pdf.loc[restricted]
            y = sub[outcome].to_numpy(dtype=float)
            w = wvals.loc[restricted].to_numpy(dtype=float)
            strat = sub[STRAT_COL].to_numpy(dtype=object)
            clust = sub[CLUST_COL].to_numpy(dtype=object) if has_cluster else None
            Xr, names_r, _ = _design_matrix(sub, covariates, covar_types)

            def compute_vcov(fitted, X):
                if vcov_method == "jackknife":
                    return jackknife_vcov(
                        X, y, w, family, fitted, strat, clust, constants
                    )
                return sandwich_vcov(fitted, strat, clust, constants)

            def finish_wald(row, fitted, names, n_params, X):
                vcov = compute_vcov(fitted, X)
                stderr = np.sqrt(np.clip(np.diag(vcov), 0, None))
                pos = [
                    i
                    for i, n in enumerate(names)
                    if n == rv or n.startswith(f"{rv}[T.")
                ]
                if len(pos) != 1:
                    raise ValueError(
                        f"Failed to find regression variable column in the results for {rv}"
                    )
                i = pos[0]
                beta, se = float(fitted.params[i]), float(stderr[i])
                dof = survey_dof(has_strata, has_cluster, strat, clust, len(sub), n_params)
                if dof < 1:
                    row.update(Converged=True, Beta=beta, SE=np.inf, Beta_pvalue=1.0, pvalue=1.0)
                else:
                    p = 2.0 * float(t_sf(abs(beta / se), dof))
                    row.update(Converged=True, Beta=beta, SE=se, Beta_pvalue=p, pvalue=p)

            if vtype in (CONTINUOUS, BINARY):
                if vtype == CONTINUOUS:
                    x = pd.to_numeric(sub["value"]).to_numpy(dtype=float)[:, None]
                    names = names_r + [rv]
                else:
                    levels = _sorted_levels(sub["value"])
                    x, nm = dummy_encode(sub["value"].to_numpy(), levels, rv)
                    names = names_r + nm
                X = np.hstack([Xr, x])
                fitted = fit_weighted_glm(X, y, w, family)
                row = _default_row(rv, outcome)
                row.update(Variable_type=vtype, Weight=weight_label, N=N)
                if fitted.converged:
                    finish_wald(row, fitted, names, X.shape[1], X)
                rows.append(row)
            elif vtype == CATEGORICAL:
                levels = _sorted_levels(sub["value"])
                mat, nm = dummy_encode(sub["value"].to_numpy(), levels, rv)
                X_f = np.hstack([Xr, mat])
                names_f = names_r + nm
                fit_f = fit_weighted_glm(X_f, y, w, family)
                fit_r = fit_weighted_glm(Xr, y, w, family)
                # non-converged weighted categorical fits emit NO rows
                # (reference generator, weighted_glm_regression.py:245-286)
                if fit_f.converged and fit_r.converged:
                    vcov_f = compute_vcov(fit_f, X_f)
                    dof = survey_dof(has_strata, has_cluster, strat, clust, len(sub), X_f.shape[1])
                    chisq = fit_r.deviance - fit_f.deviance
                    lr_p = regterm_pvalue(chisq, vcov_f, names_f, fit_f.a_inv, rv, dof)
                    if report_categorical_betas:
                        stderr = np.sqrt(np.clip(np.diag(vcov_f), 0, None))
                        for i, pname in enumerate(names_f):
                            if not (pname == rv or pname.startswith(f"{rv}[T.")):
                                continue
                            beta, se = float(fit_f.params[i]), float(stderr[i])
                            if dof < 1:
                                se, bp = np.inf, 1.0
                            else:
                                bp = 2.0 * float(t_sf(abs(beta / se), dof))
                            row = _default_row(rv, outcome)
                            row.update(
                                Variable_type=vtype,
                                Weight=weight_label,
                                N=N,
                                Converged=True,
                                Category=pname,
                                Beta=beta,
                                SE=se,
                                Beta_pvalue=bp,
                                LRT_pvalue=lr_p,
                                pvalue=lr_p,
                            )
                            rows.append(row)
                    else:
                        row = _default_row(rv, outcome)
                        row.update(
                            Variable_type=vtype,
                            Weight=weight_label,
                            N=N,
                            Converged=True,
                            LRT_pvalue=lr_p,
                            pvalue=lr_p,
                        )
                        rows.append(row)
            else:
                raise ValueError(f"unsupported regression variable type {vtype!r}")
        except Exception:
            rows = [_default_row(rv, outcome)]
        out = pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA.fields])
        out["N"] = out["N"].astype("Int64")
        return out[[f.name for f in RESULT_SCHEMA.fields]]

    return kernel


def _zscore_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Global ddof=1 z-score (reference glm_regression.py:172-190 uses
    scipy zscore ddof=1 over the whole column, NaNs omitted). One stats
    agg broadcast back — no driver round-trip."""
    if not cols:
        return df
    stats = df.agg(
        *[F.mean(c).alias(f"mu::{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"sd::{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    return joined.select(
        *[
            ((F.col(c) - F.col(f"`mu::{c}`")) / F.col(f"`sd::{c}`")).alias(c)
            if c in set(cols)
            else F.col(c)
            for c in df.columns
        ]
    )


def association_study(
    data: ClariteFrame,
    outcomes: str | Sequence[str],
    regression_variables: Sequence[str] | None = None,
    covariates: Sequence[str] | None = None,
    min_n: int = 200,
    standardize_data: bool = False,
    report_categorical_betas: bool = False,
    survey_design_spec=None,
    regression_kind: str | None = None,
    encoding: str = "additive",
    edge_encoding_info=None,
    strategy: str = "grouped",
    max_concurrent_jobs: int = 8,
    use_sufficient_stats: bool = True,
    vcov_method: str = "stata",
) -> DataFrame:
    """EWAS-style mass regression (reference association_study.py:14-132).

    For each outcome and each regression variable: fit
    ``outcome ~ 1 + covariates + variable`` with family chosen by the
    outcome's CLARITE type (continuous -> Gaussian/identity with t-based
    Wald tests; binary -> Binomial/logit with z-based tests), complete-case
    per variable, ``min_n`` gate (default 200,
    glm_regression.py:54-56,474-479); categorical variables are tested
    with an LRT vs the restricted model. Returns the reference's result
    schema sorted by pvalue.

    With ``survey_design_spec`` (a SurveyDesignSpec) the fit is
    survey-adjusted (reference ``weighted_glm_regression.py``): the
    narrow design frame equi-joins into the long table on ``ID``, the
    full-design constants broadcast into the kernel, and inference uses
    the linearized sandwich vcov + survey dof (+ working-LRT for
    categorical variables).

    ``strategy``: ``"grouped"`` (default) = melt +
    ``groupBy(variable).applyInPandas`` — right for wide/short EWAS
    tables; ``"columnar"`` = one distributed ML-GLM job per variable
    scheduled from a driver thread pool (``max_concurrent_jobs``) — the
    100-TB path where a variable's rows exceed one worker's memory
    (SURVEY.md §7 risk #4). Same result schema; unweighted studies only.
    """
    custom_kernel_factory = None
    if callable(regression_kind):
        # user extension point (reference association_study.py:90-96
        # accepts a custom Regression subclass): a factory
        # ``f(outcome, covariates, covar_types, rv_types, family, min_n,
        # report_categorical_betas) -> kernel(key, pdf) -> pd.DataFrame``
        # whose kernel runs inside the grouped fan-out and must return
        # rows matching RESULT_SCHEMA.
        custom_kernel_factory = regression_kind
    elif regression_kind not in (None, "glm", "weighted_glm"):
        raise ValueError(f"unsupported regression_kind {regression_kind!r}")
    if vcov_method not in ("stata", "jackknife"):
        raise ValueError(f"unsupported vcov_method {vcov_method!r}")
    if vcov_method == "jackknife" and (
        survey_design_spec is None or not survey_design_spec.has_cluster
    ):
        raise ValueError("vcov_method='jackknife' requires a cluster survey design")
    if regression_kind == "weighted_glm" and survey_design_spec is None:
        raise ValueError("A 'survey_design_spec' must be provided")
    if isinstance(outcomes, str):
        outcomes = [outcomes]
    covariates = list(covariates or [])
    all_vars = data.variables
    if regression_variables is None:
        regression_variables = [c for c in all_vars if c not in set(outcomes) | set(covariates)]
    rvs = list(regression_variables)

    from clarite_python_spark.catalog import GENOTYPES

    genotype_cols = {
        c for c in [*rvs, *covariates] if data.catalog.get(c) == GENOTYPES
    }
    data = _encode_genotype_variables(
        data, [*rvs, *covariates], encoding, edge_encoding_info
    )
    cat = data.catalog
    for v in [*outcomes, *covariates, *rvs]:
        if v not in cat.types:
            raise ValueError(f"unknown variable {v!r}")
    skipped = [v for v in rvs if cat.get(v) in (CONSTANT, UNKNOWN)]
    if skipped:
        warnings.warn(f"skipping {len(skipped)} constant/unknown regression variables")
        rvs = [v for v in rvs if v not in set(skipped)]

    covar_types = {c: cat.get(c) for c in covariates}
    results: list[DataFrame] = []
    for outcome in outcomes:
        outcome_type = cat.get(outcome)
        my_rvs = [v for v in rvs if v != outcome]
        rv_types = {v: cat.get(v) for v in my_rvs}
        df = _ensure_parallelism(data.df)
        # survey-Gaussian suffstats passes deferred for thread-pool
        # overlap with the grouped tail (set by that branch below)
        deferred_gauss_jobs: list = []
        deferred_gauss_rows: list[dict] = []
        deferred_gauss_slot: int | None = None
        if outcome_type == CONTINUOUS:
            family = GAUSSIAN
            df = df.withColumn(outcome, F.col(outcome).cast("double"))
        elif outcome_type == BINARY:
            family = BINOMIAL
            mapping = _encode_binary_outcome(data.category_levels(outcome))
            expr = F.when(F.col(outcome).isNull(), F.lit(None).cast("double"))
            for k, v in mapping.items():
                expr = expr.when(F.col(outcome).cast("string") == F.lit(str(k)), F.lit(v))
            df = df.withColumn(outcome, expr)
        elif outcome_type == CATEGORICAL:
            raise NotImplementedError(
                "Categorical Outcomes are not yet supported for this type of regression."
            )
        else:
            raise ValueError(f"outcome {outcome!r} type could not be determined")

        if standardize_data:
            z_cols = [v for v in my_rvs if rv_types[v] == CONTINUOUS]
            z_cols += [c for c in covariates if covar_types[c] == CONTINUOUS]
            if outcome_type == CONTINUOUS:
                z_cols.append(outcome)
            df = _zscore_columns(df, z_cols)

        if strategy == "columnar":
            if survey_design_spec is not None:
                raise ValueError(
                    "strategy='columnar' does not support survey designs (use grouped)"
                )
            from clarite_python_spark.operators.analyze_columnar import (
                columnar_association_study,
            )

            pdf = columnar_association_study(
                df,
                outcome,
                my_rvs,
                rv_types,
                covariates,
                covar_types,
                family,
                min_n,
                max_concurrent_jobs,
            )
            results.append(data.df.sparkSession.createDataFrame(pdf, RESULT_SCHEMA))
            continue
        if strategy != "grouped":
            raise ValueError(f"unknown strategy {strategy!r}")

        id_vars = [ID_COL, outcome, *covariates]
        if survey_design_spec is not None:
            err = survey_design_spec.validate(data)
            if err is not None:
                raise ValueError(err)
            # warm the two cached full-design collects CONCURRENTLY
            # (guide §2.6): constants() (one groupBy-cluster agg) and
            # weight_means() (one global agg) are independent jobs that
            # otherwise run back-to-back; every later call hits the
            # spec's cache.
            from concurrent.futures import ThreadPoolExecutor as _TPE

            with _TPE(max_workers=2) as _pool:
                _cf = _pool.submit(survey_design_spec.constants)
                _wf = _pool.submit(survey_design_spec.weight_means)
                _cf.result()
                _wf.result()
            df = df.join(survey_design_spec.df, on=ID_COL, how="left")
            id_vars = id_vars + survey_design_spec.design_columns()
            weight_info = {
                "single_weight": survey_design_spec.single_weight,
                "weight_name": survey_design_spec.weight_name,
                "weight_names": survey_design_spec.weight_names,
                "weight_means": survey_design_spec.weight_means(),
                "drop_unweighted": survey_design_spec.drop_unweighted,
            }
            kernel = _make_weighted_kernel(
                outcome,
                covariates,
                covar_types,
                rv_types,
                family,
                min_n,
                report_categorical_betas,
                survey_design_spec.constants(),
                weight_info,
                vcov_method=vcov_method,
            )
        elif custom_kernel_factory is not None:
            kernel = custom_kernel_factory(
                outcome, covariates, covar_types, rv_types, family, min_n, report_categorical_betas
            )
        else:
            kernel = _make_assoc_kernel(
                outcome, covariates, covar_types, rv_types, family, min_n, report_categorical_betas
            )
        # ONE unpivot covering every variable type: values ride as strings
        # (int->"1", double keeps its repr) and the kernels recover
        # numerics with pd.to_numeric — one scan instead of one per type
        # group, which matters when the table is the expensive input.
        group = [v for v in my_rvs if rv_types[v] in (CONTINUOUS, BINARY, CATEGORICAL)]
        if (
            use_sufficient_stats
            and survey_design_spec is not None
            and family == GAUSSIAN
            and (
                vcov_method == "stata"
                # jackknife replicates are closed-form on per-cluster
                # Grams (wolsagg) — cluster designs only
                or (vcov_method == "jackknife" and survey_design_spec.has_cluster)
            )
            and (
                (
                    survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["clusters"]) <= 16384
                )
                or (
                    not survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["rows_per_strat"]) <= 16384
                )
            )
        ):
            # survey-weighted Gaussian fits for CONTINUOUS variables are
            # closed-form: per-(variable, cluster) weighted sufficient
            # statistics feed both the fit and the linearized sandwich
            # (functions/wolsagg.py) — one mapInPandas scan instead of
            # melting data rows through per-variable Python groups. The
            # accumulator is a sort + segment-sum, O(batch x p) per stat
            # and independent of #clusters; the gate only bounds the
            # DRIVER-side (#clusters x zdim^2) sandwich assembly (16k
            # PSUs x a dozen params ~ MBs; a million-cluster design
            # falls back to the grouped kernel).
            # No-cluster designs (strata-only / weights-only) need
            # per-observation score outer products for the sandwich — a
            # SECOND scan computes per-stratum sums of w^2 e^2 z z'
            # against the pass-1 fit (weighted_gaussian_nocluster_rows).
            from clarite_python_spark.functions.wolsagg import (
                weighted_gaussian_nocluster_rows,
                weighted_gaussian_suffstats_rows,
            )
            from clarite_python_spark.survey.design import (
                CLUST_COL,
                STRAT_COL,
                SUBSET_COL,
                _weight_col,
            )

            wsuff = [v for v in group if rv_types[v] == CONTINUOUS]
            group = [v for v in group if rv_types[v] != CONTINUOUS]
            by_weight: dict = {}
            no_weight_rows: list[dict] = []
            for v in wsuff:
                if weight_info["single_weight"]:
                    by_weight.setdefault(weight_info["weight_name"], []).append(v)
                elif weight_info["weight_names"] is not None:
                    wn = weight_info["weight_names"].get(v)
                    if wn is None:
                        # reference: "No weight found ..." -> all-NaN row
                        no_weight_rows.append(_default_row(v, outcome))
                    else:
                        by_weight.setdefault(wn, []).append(v)
                else:
                    by_weight.setdefault(None, []).append(v)
            w_consts = dict(
                survey_design_spec.constants(),
                drop_unweighted=weight_info["drop_unweighted"],
            )

            # DEFER the per-weight-group suffstats collects instead of
            # running them inline: each is an independent Spark job, and
            # the grouped-kernel tail below is another — submitting them
            # together from a driver thread pool lets the categorical
            # variables' melt/fit job overlap the Gram passes instead of
            # following them (guide §2.6; measured serial: 1.1 s Gram
            # collect + 2.3 s grouped job back-to-back at sf0.1). The
            # closures and the result-frame union order are identical to
            # the serial form; only the scheduling changes.
            def _gauss_job(wn, wvars):
                w_args = (
                    df,
                    outcome,
                    wvars,
                    covariates,
                    covar_types,
                    data.category_levels,
                    min_n,
                    lambda rv: _default_row(rv, outcome),
                    w_consts,
                    _weight_col(wn) if wn is not None else None,
                    weight_info["weight_means"][wn] if wn is not None else 1.0,
                    wn,
                )
                if survey_design_spec.has_cluster:
                    return weighted_gaussian_suffstats_rows(
                        *w_args, STRAT_COL, CLUST_COL, SUBSET_COL,
                        vcov_method=vcov_method,
                    )
                return weighted_gaussian_nocluster_rows(
                    *w_args, STRAT_COL, SUBSET_COL
                )

            deferred_gauss_jobs = [
                (lambda wn=wn, wvars=wvars: _gauss_job(wn, wvars))
                for wn, wvars in by_weight.items()
            ]
            deferred_gauss_rows = list(no_weight_rows)
            if deferred_gauss_jobs or deferred_gauss_rows:
                deferred_gauss_slot = len(results)
                results.append(None)  # filled after the pool resolves
        if (
            use_sufficient_stats
            and survey_design_spec is not None
            and family == BINOMIAL
            and (
                vcov_method == "stata"
                or (vcov_method == "jackknife" and survey_design_spec.has_cluster)
            )
            and (
                (
                    survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["clusters"]) <= 16384
                )
                or (
                    not survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["rows_per_strat"]) <= 16384
                )
            )
            and all(covar_types[c] in (BINARY, CATEGORICAL) for c in covariates)
        ):
            # survey-weighted binomial fits collapse to weighted
            # contingency cells keyed by (value, covariates, outcome,
            # CLUSTER): frequency-weighted IRLS reproduces the kernel's
            # iterates exactly and per-cluster score sums feed the same
            # sandwich algebra (functions/wbinomagg.py) — one codegen
            # count/sum aggregation instead of melting data rows through
            # per-variable Python groups. Discrete-domain variables only
            # (binary/categorical, or genotype-encoded continuous);
            # everything else stays on the grouped kernel below.
            from clarite_python_spark.functions.wbinomagg import (
                weighted_binomial_cells_rows,
            )
            from clarite_python_spark.survey.design import (
                CLUST_COL,
                STRAT_COL,
                SUBSET_COL,
                _weight_col,
            )

            wsuff = [
                v
                for v in group
                if rv_types[v] in (BINARY, CATEGORICAL)
                or (rv_types[v] == CONTINUOUS and v in genotype_cols)
            ]
            group = [v for v in group if v not in set(wsuff)]
            by_weight = {}
            no_weight_rows = []
            for v in wsuff:
                if weight_info["single_weight"]:
                    by_weight.setdefault(weight_info["weight_name"], []).append(v)
                elif weight_info["weight_names"] is not None:
                    wn = weight_info["weight_names"].get(v)
                    if wn is None:
                        no_weight_rows.append(_default_row(v, outcome))
                    else:
                        by_weight.setdefault(wn, []).append(v)
                else:
                    by_weight.setdefault(None, []).append(v)
            w_consts = dict(
                survey_design_spec.constants(),
                drop_unweighted=weight_info["drop_unweighted"],
            )
            w_rows = list(no_weight_rows)
            for wn, wvars in by_weight.items():
                r_rows, fb = weighted_binomial_cells_rows(
                    df,
                    outcome,
                    wvars,
                    rv_types,
                    covariates,
                    covar_types,
                    min_n,
                    report_categorical_betas,
                    lambda rv: _default_row(rv, outcome),
                    w_consts,
                    _weight_col(wn) if wn is not None else None,
                    weight_info["weight_means"][wn] if wn is not None else 1.0,
                    wn,
                    CLUST_COL,
                    SUBSET_COL,
                    strat_col=STRAT_COL,
                    vcov_method=vcov_method,
                )
                w_rows.extend(r_rows)
                group.extend(fb)  # cell blowup -> grouped kernel
            if w_rows:
                results.append(
                    data.df.sparkSession.createDataFrame(w_rows, RESULT_SCHEMA)
                )
        n_wirls_cand = sum(1 for v in group if rv_types[v] == CONTINUOUS)
        if (
            use_sufficient_stats
            and survey_design_spec is not None
            and family == BINOMIAL
            and (
                vcov_method == "stata"
                # jackknife = replicate IRLS fits batched through the
                # same scans (cluster designs only), gated on the
                # (#variables x #clusters) unit budget — see
                # JK_IRLS_MAX_UNITS; past it the grouped kernel's
                # one-scan in-pandas replicates win
                or (
                    vcov_method == "jackknife"
                    and survey_design_spec.has_cluster
                    and n_wirls_cand
                    * len(survey_design_spec.constants()["clusters"])
                    <= JK_IRLS_MAX_UNITS
                )
            )
            and (
                (
                    survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["clusters"]) <= 16384
                )
                or (
                    not survey_design_spec.has_cluster
                    and len(survey_design_spec.constants()["rows_per_strat"]) <= 16384
                )
            )
            and all(covar_types[c] in (BINARY, CATEGORICAL) for c in covariates)
        ):
            # CONTINUOUS variables in a weighted logistic study (incl.
            # wide-domain cell fallbacks routed just above): distributed
            # IRLS — one shuffle-free scan per iteration batched over all
            # unconverged variables, then per-cluster score sums for the
            # linearized sandwich (functions/wbinomirls.py). This closes
            # the last weighted scale cliff: these fits previously melted
            # rows x variables through the grouped kernel.
            from clarite_python_spark.functions.wbinomirls import (
                weighted_binomial_irls_rows,
            )
            from clarite_python_spark.survey.design import (
                CLUST_COL,
                STRAT_COL,
                SUBSET_COL,
                _weight_col,
            )

            wirls = [v for v in group if rv_types[v] == CONTINUOUS]
            group = [v for v in group if v not in set(wirls)]
            data.prefetch_category_levels(
                [c for c in covariates if covar_types[c] in (BINARY, CATEGORICAL)]
            )
            by_weight = {}
            no_weight_rows = []
            for v in wirls:
                if weight_info["single_weight"]:
                    by_weight.setdefault(weight_info["weight_name"], []).append(v)
                elif weight_info["weight_names"] is not None:
                    wn = weight_info["weight_names"].get(v)
                    if wn is None:
                        no_weight_rows.append(_default_row(v, outcome))
                    else:
                        by_weight.setdefault(wn, []).append(v)
                else:
                    by_weight.setdefault(None, []).append(v)
            w_consts = dict(
                survey_design_spec.constants(),
                drop_unweighted=weight_info["drop_unweighted"],
            )
            w_rows = list(no_weight_rows)
            for wn, wvars in by_weight.items():
                w_rows.extend(
                    weighted_binomial_irls_rows(
                        df,
                        outcome,
                        wvars,
                        covariates,
                        covar_types,
                        data.category_levels,
                        min_n,
                        lambda rv: _default_row(rv, outcome),
                        w_consts,
                        _weight_col(wn) if wn is not None else None,
                        weight_info["weight_means"][wn] if wn is not None else 1.0,
                        wn,
                        STRAT_COL,
                        CLUST_COL,
                        SUBSET_COL,
                        vcov_method=vcov_method,
                    )
                )
            if w_rows:
                results.append(
                    data.df.sparkSession.createDataFrame(w_rows, RESULT_SCHEMA)
                )
        if (
            use_sufficient_stats
            and survey_design_spec is None
            and custom_kernel_factory is None
            and family == GAUSSIAN
        ):
            # Every Gaussian fit is closed-form OLS: ONE batched
            # masked-sum pass covers continuous variables (Wald t),
            # binary variables (Wald on the treatment dummy) and
            # categorical variables (LRT vs the restricted sub-block of
            # the same Gram) — no melt, no shuffle of data rows, no
            # Python groups (functions/olsagg.py; ~20x the kernel at the
            # reference's canonical 22.6k x 970 shape). Variables whose
            # complete-case level set differs from the catalog's fall
            # back to the grouped kernel below.
            from clarite_python_spark.functions.olsagg import gaussian_assoc_rows

            cont = [v for v in group if rv_types[v] == CONTINUOUS]
            enc = [v for v in group if rv_types[v] in (BINARY, CATEGORICAL)]
            data.prefetch_category_levels(
                [c for c in covariates if covar_types[c] in (BINARY, CATEGORICAL)]
                + enc
            )
            assoc_rows, group = gaussian_assoc_rows(
                df,
                outcome,
                cont,
                enc,
                rv_types,
                covariates,
                covar_types,
                data.category_levels,
                min_n,
                report_categorical_betas,
                lambda rv: _default_row(rv, outcome),
            )
            if assoc_rows:
                results.append(
                    data.df.sparkSession.createDataFrame(assoc_rows, RESULT_SCHEMA)
                )
        if (
            use_sufficient_stats
            and survey_design_spec is None
            and custom_kernel_factory is None
            and family == BINOMIAL
        ):
            # Binomial fits collapse to contingency cells when the
            # variable and all covariates have small value domains (GWAS
            # genotypes: 3 values) — ONE count aggregation replaces the
            # per-variable melt+shuffle, then frequency-weighted IRLS
            # (identical iterates to the row-level kernel) runs
            # driver-side per variable (functions/binomagg.py). Variables
            # with wide domains or continuous covariates fall back to the
            # grouped kernel below.
            from clarite_python_spark.functions.binomagg import (
                binomial_contingency_rows,
            )

            b_rows, group = binomial_contingency_rows(
                df,
                outcome,
                group,
                rv_types,
                covariates,
                covar_types,
                min_n,
                report_categorical_betas,
                lambda rv: _default_row(rv, outcome),
                known_small=genotype_cols,
            )
            if b_rows:
                results.append(
                    data.df.sparkSession.createDataFrame(b_rows, RESULT_SCHEMA)
                )
        grouped_res = None
        if group:
            long = df.select(
                *id_vars, *[qcol(c).cast("string").alias(c) for c in group]
            ).unpivot(id_vars, group, "variable", "value")
            grouped_res = long.groupBy("variable").applyInPandas(
                kernel, RESULT_SCHEMA
            )
        if deferred_gauss_slot is not None:
            # resolve the deferred suffstats passes, overlapping them
            # with the grouped tail's job (guide §2.6): family jobs are
            # submitted first so FIFO scheduling gives them priority and
            # the grouped job back-fills; the grouped rows come back as
            # a local frame with identical values. Prefetch the shared
            # level cache so concurrent closures don't race it.
            from concurrent.futures import ThreadPoolExecutor

            data.prefetch_category_levels(
                [c for c in covariates if covar_types[c] in (BINARY, CATEGORICAL)]
            )
            spark_sess = data.df.sparkSession
            n_workers = len(deferred_gauss_jobs) + (1 if grouped_res is not None else 0)
            with ThreadPoolExecutor(max_workers=max(1, min(4, n_workers))) as pool:
                futs = [pool.submit(job) for job in deferred_gauss_jobs]
                gfut = (
                    pool.submit(grouped_res.collect)
                    if grouped_res is not None
                    else None
                )
                w_rows = list(deferred_gauss_rows)
                for f in futs:
                    w_rows.extend(f.result())
                grouped_rows = gfut.result() if gfut is not None else None
            if w_rows:
                results[deferred_gauss_slot] = spark_sess.createDataFrame(
                    w_rows, RESULT_SCHEMA
                )
            else:
                results.pop(deferred_gauss_slot)
            if grouped_rows is not None:
                results.append(
                    spark_sess.createDataFrame(grouped_rows, RESULT_SCHEMA)
                )
        elif grouped_res is not None:
            results.append(grouped_res)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    order = [F.asc_nulls_last("pvalue")]
    if report_categorical_betas:
        order.append(F.asc_nulls_last("Beta_pvalue"))
    return out.orderBy(*order)


def ewas(
    outcome: str,
    covariates: Sequence[str],
    data: ClariteFrame,
    **kwargs,
) -> DataFrame:
    """Deprecated alias for :func:`association_study` (reference
    ``clarite/modules/analyze/ewas.py:9-106`` raises the same warning)."""
    warnings.warn(
        "ewas is deprecated; use association_study instead", DeprecationWarning
    )
    return association_study(data=data, outcomes=outcome, covariates=covariates, **kwargs)


# --------------------------------------------------------------------------
# multiple-testing correction (pure window ops)
# --------------------------------------------------------------------------


def add_corrected_pvalues(
    result: DataFrame, pvalue: str = "pvalue", groupby: str | Sequence[str] | None = None
) -> DataFrame:
    """Bonferroni + Benjamini-Hochberg FDR columns
    (reference analyze/utils.py:9-117, statsmodels multipletests :69-74).

    Pure Spark window math — no kernel:
    - m = number of non-NA pvalues (distinct groups when ``groupby``);
    - bonferroni = min(p*m, 1);
    - BH = running min of p*m/rank over descending-p order, with a RANGE
      frame (``Window.orderBy(desc(p)).rangeBetween(unboundedPreceding,
      currentRow)``) so tied p-values are peers sharing one frame: every
      tied row sees the tie group's smallest p*m/rank, matching
      statsmodels ``multipletests`` exactly under ties.

    With ``groupby``, repeated rows of the same group count as ONE test
    (reference :47-58): corrections are computed over the deduplicated
    (group, pvalue) pairs then joined back.

    Scale note: the global windows are single-partition — fine for result
    tables (|variables| rows, ≤10^6), which is the only place this runs.
    """
    if groupby is not None:
        keys = [groupby] if isinstance(groupby, str) else list(groupby)
        base = result.select(*keys, pvalue).dropDuplicates(keys)
        corrected = add_corrected_pvalues(base, pvalue=pvalue, groupby=None)
        return result.join(
            corrected.select(*keys, "pvalue_bonferroni", "pvalue_fdr"), on=keys, how="left"
        ).orderBy(
            F.asc_nulls_last("pvalue_fdr"), F.asc_nulls_last("pvalue_bonferroni")
        )

    non_na = F.when(F.col(pvalue).isNotNull() & ~F.isnan(pvalue), 1).otherwise(0)
    with_m = result.withColumn("__m", F.sum(non_na).over(Window.partitionBy()))
    valid = F.col(pvalue).isNotNull() & ~F.isnan(pvalue)
    # NULLS LAST explicitly: plain asc() sorts nulls FIRST, which would
    # hand rank 1 to a missing pvalue and shift every BH rank by one
    w_rank = Window.orderBy(F.asc_nulls_last(pvalue))  # NaN also sorts last in asc
    # RANGE (not ROWS) frame: peers — rows with a tied pvalue — are always
    # inside each other's frame, so ties deterministically share the cummin.
    w_cummin = Window.orderBy(F.desc_nulls_last(pvalue)).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        with_m.withColumn("__rank", F.row_number().over(w_rank))
        .withColumn(
            "pvalue_bonferroni",
            F.when(valid, F.least(F.col(pvalue) * F.col("__m"), F.lit(1.0))),
        )
        .withColumn(
            "__bh_raw",
            F.when(valid, F.least(F.col(pvalue) * F.col("__m") / F.col("__rank"), F.lit(1.0))),
        )
        .withColumn(
            # invalid pvalues keep a null correction (reference
            # utils.py:47-58 computes over dropna and rejoins)
            "pvalue_fdr",
            F.when(valid, F.min("__bh_raw").over(w_cummin)),
        )
        .drop("__m", "__rank", "__bh_raw")
    )
    return out.orderBy(F.asc_nulls_last("pvalue_fdr"), F.asc_nulls_last("pvalue_bonferroni"))


def get_significant(
    result: DataFrame, pvalue: float = 0.05, method: str = "fdr"
) -> DataFrame:
    """Rows whose corrected pvalue is <= the threshold (reference CLI
    ``analyze get_significant``, cli/commands/analyze.py:299-324).
    ``method`` selects the ``pvalue_fdr`` or ``pvalue_bonferroni`` column
    (run :func:`add_corrected_pvalues` first)."""
    col = {"fdr": "pvalue_fdr", "bonferroni": "pvalue_bonferroni"}.get(method)
    if col is None:
        raise ValueError("method must be 'fdr' or 'bonferroni'")
    if col not in result.columns:
        raise ValueError(f"{col} not found — run add_corrected_pvalues first")
    return result.where(F.col(col) <= pvalue)


# --------------------------------------------------------------------------
# interaction study
# --------------------------------------------------------------------------

INTERACTION_SCHEMA = T.StructType(
    [
        T.StructField("Outcome", T.StringType()),
        T.StructField("Term1", T.StringType()),
        T.StructField("Term2", T.StringType()),
        T.StructField("Parameter", T.StringType()),
        T.StructField("Converged", T.BooleanType()),
        T.StructField("N", T.LongType()),
        T.StructField("LRT_pvalue", T.DoubleType()),
        T.StructField("Red_Var1_beta", T.DoubleType()),
        T.StructField("Red_Var1_SE", T.DoubleType()),
        T.StructField("Red_Var1_Pval", T.DoubleType()),
        T.StructField("Red_Var2_beta", T.DoubleType()),
        T.StructField("Red_Var2_SE", T.DoubleType()),
        T.StructField("Red_Var2_Pval", T.DoubleType()),
        T.StructField("Full_Var1_Var2_beta", T.DoubleType()),
        T.StructField("Full_Var1_Var2_SE", T.DoubleType()),
        T.StructField("Full_Var1_Var2_Pval", T.DoubleType()),
        T.StructField("Full_Var1_beta", T.DoubleType()),
        T.StructField("Full_Var1_SE", T.DoubleType()),
        T.StructField("Full_Var1_Pval", T.DoubleType()),
        T.StructField("Full_Var2_beta", T.DoubleType()),
        T.StructField("Full_Var2_SE", T.DoubleType()),
        T.StructField("Full_Var2_Pval", T.DoubleType()),
        T.StructField("Log", T.StringType()),
    ]
)
# 20-column schema of the reference (interaction_regression.py:143-168).


def _interaction_default(i1: str, i2: str, outcome: str) -> dict:
    d = {f.name: None for f in INTERACTION_SCHEMA.fields}
    d.update(
        Outcome=outcome,
        Term1=i1,
        Term2=i2,
        Parameter=f"{i1}:{i2}",
        Converged=False,
        Log="",
    )
    return d


def interaction_study(
    data: ClariteFrame,
    outcomes: str | Sequence[str],
    interactions: Sequence[tuple[str, str]] | None = None,
    covariates: Sequence[str] | None = None,
    min_n: int = 200,
    report_betas: bool = False,
    encoding: str = "additive",
    edge_encoding_info=None,
    use_sufficient_stats: bool = True,
    pair_batch_size: int = 2000,
) -> DataFrame:
    """Pairwise-interaction LRT (reference interaction_study.py:10-137,
    interaction_regression.py:22-501): restricted =
    ``outcome ~ 1 + v1 + v2 + covars``, full = ``+ v1:v2``;
    ``interactions=None`` means all C(n,2) pairs (ref :111).

    Spark plan: the pair list is generated driver-side; each pair becomes
    one group of a long table built with an Expand
    (``explode(array(struct(t1, t2, v1, v2)))``) — rows x |pairs|, grouped
    by (Term1, Term2) into the numpy GLM kernel. Interaction columns are
    products of the (dummy-encoded) main-effect columns, names
    ``a[:T.x]:b[:T.y]`` matching patsy.

    ``pair_batch_size`` bounds the Expand: the pair list is chunked and
    each chunk becomes its own job, results unioned. All-pairs over
    p=970 variables is ~470k pairs — one Expand of rows x 470k is an
    OOM/shuffle blowup, while 235 bounded jobs stream through the
    cluster (and give per-batch progress). The sufficient-stats path is
    chunked too (bounds the per-agg expression count).
    """
    if isinstance(outcomes, str):
        outcomes = [outcomes]
    covariates = list(covariates or [])
    data = _encode_genotype_variables(
        data,
        [c for c in data.variables if c not in set(outcomes)],
        encoding,
        edge_encoding_info,
    )
    cat = data.catalog
    rv_all = [
        c
        for c in data.variables
        if c not in set(outcomes) | set(covariates) and cat.get(c) in (BINARY, CATEGORICAL, CONTINUOUS)
    ]
    if interactions is None:
        pairs = list(combinations(rv_all, 2))
    else:
        pairs = [tuple(p) for p in interactions]
        for p in pairs:
            if len(p) != 2 or p[0] not in set(rv_all) or p[1] not in set(rv_all):
                raise ValueError(f"invalid interaction {p}")
    covar_types = {c: cat.get(c) for c in covariates}
    var_types = {v: cat.get(v) for v in rv_all}

    results = []
    for outcome in outcomes:
        outcome_type = cat.get(outcome)
        df = _ensure_parallelism(data.df)
        if outcome_type == CONTINUOUS:
            family = GAUSSIAN
            df = df.withColumn(outcome, F.col(outcome).cast("double"))
        elif outcome_type == BINARY:
            family = BINOMIAL
            mapping = _encode_binary_outcome(data.category_levels(outcome))
            expr = F.when(F.col(outcome).isNull(), F.lit(None).cast("double"))
            for k, v in mapping.items():
                expr = expr.when(F.col(outcome).cast("string") == F.lit(str(k)), F.lit(v))
            df = df.withColumn(outcome, expr)
        else:
            raise ValueError(f"outcome {outcome!r} must be continuous or binary")

        my_pairs = list(pairs)
        if use_sufficient_stats and family == GAUSSIAN:
            # continuous x continuous pairs are closed-form OLS: full +
            # restricted + LRT from one sufficient-stats pass (the scale
            # path for pairwise epistasis; functions/olsagg.py)
            from clarite_python_spark.functions.olsagg import gaussian_interaction_rows

            suff_pairs = [
                (a, b)
                for a, b in my_pairs
                if var_types[a] == CONTINUOUS and var_types[b] == CONTINUOUS
            ]
            my_pairs = [p for p in my_pairs if p not in set(suff_pairs)]

            # the chunk aggs are independent jobs over one shared input
            # whose per-job cost is dominated by fixed overhead (plan
            # analysis of ~batch x 20 Gram expressions + job latency) —
            # submit them from a driver thread pool (guide §2.6) instead
            # of serially; pool.map preserves chunk order so the result
            # union is identical. Single-chunk studies (the common
            # p <= pair_batch_size case, incl. the bench query) take the
            # same one-job path as before.
            def _suff_chunk(start: int) -> list[dict]:
                return gaussian_interaction_rows(
                    df,
                    outcome,
                    suff_pairs[start : start + pair_batch_size],
                    covariates,
                    covar_types,
                    data.category_levels,
                    min_n,
                    report_betas,
                    lambda a, b: _interaction_default(a, b, outcome),
                )

            starts = list(range(0, len(suff_pairs), pair_batch_size))
            if len(starts) > 1:
                from concurrent.futures import ThreadPoolExecutor

                data.prefetch_category_levels(
                    [c for c in covariates if covar_types[c] in (BINARY, CATEGORICAL)]
                )
                with ThreadPoolExecutor(max_workers=min(4, len(starts))) as pool:
                    chunk_rows = list(pool.map(_suff_chunk, starts))
            else:
                chunk_rows = [_suff_chunk(s) for s in starts]
            for suff_rows in chunk_rows:
                results.append(
                    data.df.sparkSession.createDataFrame(suff_rows, INTERACTION_SCHEMA)
                )
        if not my_pairs:
            continue

        kernel = _make_interaction_kernel(
            outcome, covariates, covar_types, var_types, family, min_n, report_betas
        )
        for start in range(0, len(my_pairs), pair_batch_size):
            batch = my_pairs[start : start + pair_batch_size]
            structs = [
                F.struct(
                    F.lit(t1).alias("Term1"),
                    F.lit(t2).alias("Term2"),
                    F.col(t1).cast("string").alias("v1"),
                    F.col(t2).cast("string").alias("v2"),
                )
                for t1, t2 in batch
            ]
            long = df.select(
                ID_COL, outcome, *covariates, F.explode(F.array(*structs)).alias("__pair")
            ).select(ID_COL, outcome, *covariates, "__pair.*")
            res = long.groupBy("Term1", "Term2").applyInPandas(kernel, INTERACTION_SCHEMA)
            results.append(res)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy(F.asc_nulls_last("LRT_pvalue"))


def _encode_term(sub: pd.DataFrame, col: str, vtype: str, name: str):
    """Main-effect encoding for one interaction term: continuous -> one
    float column; binary/categorical -> treatment-coded dummies."""
    if vtype == CONTINUOUS:
        return sub[col].to_numpy(dtype=float)[:, None], [name]
    levels = sorted(sub[col].dropna().unique().tolist())
    return dummy_encode(sub[col].to_numpy(), levels, name)


def _make_interaction_kernel(
    outcome: str,
    covariates: list[str],
    covar_types: dict[str, str],
    var_types: dict[str, str],
    family: str,
    min_n: int,
    report_betas: bool,
):
    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t1, t2 = key
        rows: list[dict] = []
        try:
            use_cols = [outcome, *covariates, "v1", "v2"]
            sub = pdf[use_cols].copy()
            # v1/v2 arrive as strings; recover numerics for continuous terms
            for vcol, term in (("v1", t1), ("v2", t2)):
                if var_types[term] == CONTINUOUS:
                    sub[vcol] = pd.to_numeric(sub[vcol], errors="coerce")
            sub = sub.dropna()
            n_complete = len(sub)
            if n_complete < min_n:
                raise ValueError(f"too few complete observations ({n_complete} < {min_n})")
            y = sub[outcome].to_numpy(dtype=float)
            Xc, names_c, _ = _design_matrix(sub, covariates, covar_types)
            m1, n1 = _encode_term(sub, "v1", var_types[t1], t1)
            m2, n2 = _encode_term(sub, "v2", var_types[t2], t2)
            X_r = np.hstack([Xc, m1, m2])
            names_r = names_c + n1 + n2
            inter_cols = []
            inter_names = []
            for i, a in enumerate(n1):
                for j, b in enumerate(n2):
                    inter_cols.append(m1[:, i] * m2[:, j])
                    inter_names.append(f"{a}:{b}")
            X_f = np.hstack([X_r] + [np.column_stack(inter_cols)]) if inter_cols else X_r
            names_f = names_r + inter_names
            res_f = fit_glm(X_f, y, names_f, family)
            res_r = fit_glm(X_r, y, names_r, family)
            if res_f.converged and res_r.converged:
                lrdf = res_r.df_resid - res_f.df_resid
                lrstat = -2.0 * (res_r.llf - res_f.llf)
                if lrdf == 0 and lrstat == 0:
                    row = _interaction_default(t1, t2, outcome)
                    row.update(
                        Converged=True, N=n_complete, Log="Both models are equivalent in terms of fit"
                    )
                    rows.append(row)
                else:
                    lr_p = float(chi2_sf(lrstat, lrdf)) if lrdf > 0 else float("nan")
                    if report_betas:
                        by_f = res_f.by_name()
                        by_r = res_r.by_name()
                        for pname in inter_names:
                            a, b = pname.split(":", 1)
                            row = _interaction_default(t1, t2, outcome)
                            row.update(
                                Parameter=pname,
                                Converged=True,
                                N=n_complete,
                                LRT_pvalue=lr_p,
                                Red_Var1_beta=by_r[a][0],
                                Red_Var1_SE=by_r[a][1],
                                Red_Var1_Pval=by_r[a][2],
                                Red_Var2_beta=by_r[b][0],
                                Red_Var2_SE=by_r[b][1],
                                Red_Var2_Pval=by_r[b][2],
                                Full_Var1_Var2_beta=by_f[pname][0],
                                Full_Var1_Var2_SE=by_f[pname][1],
                                Full_Var1_Var2_Pval=by_f[pname][2],
                                Full_Var1_beta=by_f[a][0],
                                Full_Var1_SE=by_f[a][1],
                                Full_Var1_Pval=by_f[a][2],
                                Full_Var2_beta=by_f[b][0],
                                Full_Var2_SE=by_f[b][1],
                                Full_Var2_Pval=by_f[b][2],
                            )
                            rows.append(row)
                    else:
                        row = _interaction_default(t1, t2, outcome)
                        row.update(Converged=True, N=n_complete, LRT_pvalue=lr_p)
                        rows.append(row)
            else:
                row = _interaction_default(t1, t2, outcome)
                row.update(N=n_complete)
                rows.append(row)
        except Exception as e:
            row = _interaction_default(t1, t2, outcome)
            row["Log"] = str(e)[:200]
            rows = [row]
        out = pd.DataFrame(rows)
        out["N"] = out["N"].astype("Int64")
        return out[[f.name for f in INTERACTION_SCHEMA.fields]]

    return kernel
