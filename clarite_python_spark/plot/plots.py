"""Plotting (reference ``clarite/modules/plot/``).

All reference plots consume small, already-aggregated result tables; the
only data-engine work is the prep — which we do Spark-side:

- manhattan x-position assignment: ``-log10(pvalue)`` + dense-rank over
  (category, variable) (reference ``plot/manhattan.py:58-98``), a pure
  Window op;
- top-k selection for ``top_results`` (reference ``plot/top_results.py:
  79-83``): ``orderBy(...).limit(k)``.

Rendering is driver-side matplotlib/seaborn over ``toPandas()`` of those
(tiny) prepped frames. matplotlib is OPTIONAL: the prep functions always
work; the render functions raise a clear ImportError when it is absent
(this container ships without plotting libs — the Spark plumbing is the
tested surface, mirroring how the reference's plot tests are smoke
tests, ``tests/plot/test_plot.py:32-101``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clarite_python_spark.catalog import BINARY, CATEGORICAL, CONTINUOUS, ClariteFrame, qcol

try:  # pragma: no cover - environment-dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MPL = True
except Exception:  # pragma: no cover
    plt = None
    HAS_MPL = False


def _require_mpl() -> None:
    if not HAS_MPL:
        raise ImportError(
            "matplotlib is required for rendering; install it or use the "
            "*_prep functions to get the plotted data as a DataFrame"
        )


# ---------------------------------------------------------------------------
# Spark-side prep (the data-engine part)
# ---------------------------------------------------------------------------


def manhattan_prep(
    dfs: Mapping[str, DataFrame],
    categories: Mapping[str, str] | None = None,
    pvalue_col: str = "pvalue",
) -> DataFrame:
    """Manhattan-plot input: one row per (dataset, variable) with
    ``-log10(pvalue)`` and an x position assigned by dense rank over
    (category, variable) — the reference's ``ngroup`` trick
    (``plot/manhattan.py:85-98``) as a Window op.

    ``dfs`` maps dataset name -> association_study result frame;
    ``categories`` optionally maps variable -> category label.
    """
    parts = []
    for name, df in dfs.items():
        parts.append(
            df.select(
                F.lit(name).alias("dataset"),
                F.col("Variable").alias("variable"),
                F.col(pvalue_col).cast("double").alias("pvalue"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if categories:
        mapping = F.create_map(
            *[F.lit(x) for kv in categories.items() for x in kv]
        )
        out = out.withColumn(
            "category", F.coalesce(mapping[F.col("variable")], F.lit("unknown"))
        )
    else:
        out = out.withColumn("category", F.lit("unknown"))
    out = out.withColumn(
        "neg_log_pvalue",
        F.when(
            F.col("pvalue").isNotNull() & (F.col("pvalue") > 0),
            -F.log10(F.col("pvalue")),
        ),
    )
    # global window over |variables| rows — result tables only
    w = Window.orderBy("category", "variable")
    return out.withColumn("xpos", F.dense_rank().over(w))


def top_results_prep(
    result: DataFrame,
    pvalue_name: str = "pvalue",
    num_rows: int = 20,
) -> DataFrame:
    """Top-k rows by pvalue for the dot-plot (reference
    top_results.py:79-83): ``orderBy().limit(k)``."""
    if pvalue_name not in ("pvalue", "pvalue_bonferroni", "pvalue_fdr"):
        raise ValueError(
            "pvalue_name must be 'pvalue', 'pvalue_bonferroni', or 'pvalue_fdr'"
        )
    return result.orderBy(F.asc_nulls_last(pvalue_name)).limit(num_rows)


# ---------------------------------------------------------------------------
# driver-side rendering (small pandas frames + matplotlib)
# ---------------------------------------------------------------------------


def histogram(
    data: ClariteFrame,
    column: str,
    figsize: tuple[int, int] = (12, 5),
    title: str | None = None,
    filename: str | None = None,
    bins: int = 100,
    **kwargs,
):
    """Histogram of one variable (reference plot/histogram.py:9-65):
    continuous -> binned counts (bins computed Spark-side via width_bucket,
    only the bin counts reach the driver); binary/categorical -> value
    counts."""
    _require_mpl()
    vtype = data.catalog.get(column)
    fig, ax = plt.subplots(figsize=figsize)
    ax.set_title(title if title is not None else column)
    if vtype in (BINARY, CATEGORICAL):
        counts = (
            data.df.groupBy(qcol(column).alias(column))
            .count()
            .orderBy(column)
            .toPandas()
        )
        ax.bar(counts[column].astype(str), counts["count"], **kwargs)
    elif vtype == CONTINUOUS:
        lo_hi = data.df.agg(
            F.min(qcol(column)).alias("lo"), F.max(qcol(column)).alias("hi")
        ).collect()[0]
        lo, hi = float(lo_hi["lo"]), float(lo_hi["hi"])
        width = (hi - lo) / bins or 1.0
        hist = (
            data.df.where(qcol(column).isNotNull())
            .select(
                F.least(
                    F.floor((qcol(column) - F.lit(lo)) / F.lit(width)),
                    F.lit(bins - 1),
                ).alias("bucket")
            )
            .groupBy("bucket")
            .count()
            .orderBy("bucket")
            .toPandas()
        )
        ax.bar(lo + (hist["bucket"] + 0.5) * width, hist["count"], width=width, **kwargs)
    else:
        raise ValueError(f"histogram not supported for variable type {vtype!r}")
    if filename is not None:
        fig.savefig(filename, bbox_inches="tight")
        plt.close(fig)
    return fig


def distributions(
    data: ClariteFrame,
    filename: str,
    continuous_kind: str = "count",
    nrows: int = 4,
    ncols: int = 3,
    quality: str = "medium",
    variables: Sequence[str] | None = None,
    sort: bool = True,
):
    """Multi-page PDF of per-variable distributions (reference
    plot/distributions.py:19-175). Each page renders nrows*ncols
    histograms from Spark-side counts."""
    _require_mpl()
    from matplotlib.backends.backend_pdf import PdfPages

    dpi = {"low": 72, "medium": 150, "high": 300}.get(quality)
    if dpi is None:
        raise ValueError(f"quality must be low/medium/high, got {quality!r}")
    cols = list(variables) if variables is not None else data.variables
    if sort:
        cols = sorted(cols)
    per_page = nrows * ncols
    with PdfPages(filename) as pdf:
        for start in range(0, len(cols), per_page):
            page_cols = cols[start : start + per_page]
            fig, axes = plt.subplots(nrows=nrows, ncols=ncols, figsize=(11, 8.5), dpi=dpi)
            flat = axes.flatten()
            for ax_idx, c in enumerate(page_cols):
                # reuse histogram logic inline per subplot
                vtype = data.catalog.get(c)
                ax = flat[ax_idx]
                ax.set_title(c, fontsize=8)
                try:
                    if vtype in (BINARY, CATEGORICAL):
                        counts = data.df.groupBy(qcol(c).alias(c)).count().orderBy(c).toPandas()
                        ax.bar(counts[c].astype(str), counts["count"])
                    elif vtype == CONTINUOUS:
                        pdf_vals = (
                            data.df.select(qcol(c).alias(c)).where(qcol(c).isNotNull()).toPandas()
                        )
                        ax.hist(pdf_vals[c], bins=40)
                except Exception:
                    ax.text(0.5, 0.5, "unplottable", ha="center")
            for ax in flat[len(page_cols) :]:
                ax.axis("off")
            pdf.savefig(fig)
            plt.close(fig)


def _manhattan_render(
    dfs: Mapping[str, DataFrame],
    categories: Mapping[str, str] | None,
    cutoffs,
    num_labeled: int,
    label_vars: Sequence[str],
    title: str | None,
    figsize: tuple[int, int],
    filename: str | None,
    pvalue_col: str = "pvalue",
):
    _require_mpl()
    prepped = manhattan_prep(dfs, categories, pvalue_col).toPandas()
    n = len(dfs)
    fig, axes = plt.subplots(n, 1, figsize=figsize, sharex=True, sharey=True, squeeze=False)
    for i, name in enumerate(dfs):
        ax = axes[i][0]
        sub = prepped[prepped.dataset == name]
        for cat_name, cat_df in sub.groupby("category"):
            ax.scatter(cat_df.xpos, cat_df.neg_log_pvalue, s=8, label=str(cat_name))
        ax.set_ylabel("-log10(p value)")
        ax.set_title(name)
        if cutoffs is not None:
            for value, label, color, style in cutoffs[i] if isinstance(cutoffs, list) else cutoffs:
                ax.axhline(y=value, color=color, linestyle=style, label=label)
        top = sub.dropna(subset=["neg_log_pvalue"]).nlargest(num_labeled, "neg_log_pvalue")
        for _, r in top.iterrows():
            ax.annotate(r.variable, (r.xpos, r.neg_log_pvalue), fontsize=6)
        for v in label_vars:
            for _, r in sub[sub.variable == v].iterrows():
                ax.annotate(r.variable, (r.xpos, r.neg_log_pvalue), fontsize=6)
    if title:
        fig.suptitle(title)
    if filename is not None:
        fig.savefig(filename, bbox_inches="tight")
        plt.close(fig)
    return fig


def manhattan(
    dfs: Mapping[str, DataFrame],
    categories: Mapping[str, str] | None = None,
    num_labeled: int = 3,
    label_vars: Sequence[str] = (),
    figsize: tuple[int, int] = (12, 6),
    title: str | None = None,
    figure=None,
    colors: Sequence[str] = ("#53868B", "#4D4D4D"),
    background_colors: Sequence[str] = ("#EBEBEB", "#FFFFFF"),
    filename: str | None = None,
    return_figure: bool = False,
):
    """-log10(p) scatter by category (reference plot/manhattan.py:277-...)."""
    return _manhattan_render(
        dfs, categories, None, num_labeled, label_vars, title, figsize, filename
    )


def manhattan_fdr(dfs, categories=None, cutoff=0.05, **kwargs):
    """Manhattan over FDR-corrected pvalues with a cutoff line."""
    cut = [(-__import__("math").log10(cutoff), f"FDR {cutoff}", "red", "--")]
    return _manhattan_render(
        dfs,
        categories,
        cut,
        kwargs.get("num_labeled", 3),
        kwargs.get("label_vars", ()),
        kwargs.get("title"),
        kwargs.get("figsize", (12, 6)),
        kwargs.get("filename"),
        pvalue_col="pvalue_fdr",
    )


def manhattan_bonferroni(dfs, categories=None, cutoff=0.05, **kwargs):
    """Manhattan over Bonferroni-corrected pvalues with a cutoff line."""
    cut = [(-__import__("math").log10(cutoff), f"Bonferroni {cutoff}", "red", "--")]
    return _manhattan_render(
        dfs,
        categories,
        cut,
        kwargs.get("num_labeled", 3),
        kwargs.get("label_vars", ()),
        kwargs.get("title"),
        kwargs.get("figsize", (12, 6)),
        kwargs.get("filename"),
        pvalue_col="pvalue_bonferroni",
    )


def top_results(
    result: DataFrame,
    pvalue_name: str = "pvalue",
    cutoff: float | None = 0.05,
    num_rows: int = 20,
    figsize: tuple[int, int] | None = None,
    title: str | None = None,
    filename: str | None = None,
):
    """P-value + beta dot-plot of the top-k results (reference
    plot/top_results.py:9-189)."""
    _require_mpl()
    top = top_results_prep(result, pvalue_name, num_rows).toPandas()
    n = len(top)
    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=figsize or (10, max(2, n // 2)), sharey=True
    )
    y = range(n)[::-1]
    import numpy as np

    with np.errstate(divide="ignore"):
        ax1.scatter(-np.log10(top[pvalue_name].astype(float)), list(y))
    ax1.set_yticks(list(y))
    ax1.set_yticklabels(top["Variable"])
    ax1.set_xlabel(f"-log10({pvalue_name})")
    if cutoff is not None:
        ax1.axvline(-np.log10(cutoff), color="red", linestyle="--")
    ax2.scatter(top["Beta"].astype(float), list(y))
    ax2.axvline(0.0, color="grey", linestyle=":")
    ax2.set_xlabel("Beta")
    if title:
        fig.suptitle(title)
    if filename is not None:
        fig.savefig(filename, bbox_inches="tight")
        plt.close(fig)
    return fig
