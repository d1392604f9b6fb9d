"""Command-line interface (reference ``clarite/cli/``).

The reference CLI (`clarite-cli <group> <command>`, click-based,
``clarite/cli/cli.py:8-18``) moves data between commands as a text file +
``.dtypes`` JSON sidecar; each command loads, calls the same module
function, and saves. This CLI keeps the exact same shape with Spark
datasets: a "dataset" argument is a parquet directory (default) or TSV
with the catalog sidecar written by ``sources.io.save``.

Groups: load, modify, describe, analyze, plot — one subcommand per
operator (reference ``clarite/cli/commands/*``). Each invocation is a
fresh process with one SparkSession, mirroring the reference's
process-per-command flow (state lives entirely in the files).

Usage examples::

    python -m clarite_python_spark.cli load from-tsv in.tsv ds1
    python -m clarite_python_spark.cli modify categorize ds1 ds2
    python -m clarite_python_spark.cli describe summarize ds2
    python -m clarite_python_spark.cli analyze association-study ds2 out \
        --outcomes y --covariates age sex --min-n 50
"""

from __future__ import annotations

import argparse
import json
import sys

from clarite_python_spark.catalog import ClariteFrame


def _spark():
    from clarite_python_spark.session import get_spark

    return get_spark("clarite-cli")


def _load(spark, path: str) -> ClariteFrame:
    from clarite_python_spark.sources.io import from_parquet

    return from_parquet(spark, path)


def _save(cf: ClariteFrame, path: str) -> None:
    from clarite_python_spark.sources.io import save

    save(cf, path)
    print(f"saved {path} ({len(cf.variables)} variables)")


def _save_result(df, path: str) -> None:
    df.write.mode("overwrite").parquet(path)
    print(f"saved {path}")


def _add_io(p, result: bool = False) -> None:
    p.add_argument("data", help="input dataset (parquet dir + .dtypes sidecar)")
    p.add_argument("output", help="output path")


def _skip_only(p) -> None:
    p.add_argument("--skip", nargs="*", default=None)
    p.add_argument("--only", nargs="*", default=None)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="clarite-spark")
    groups = ap.add_subparsers(dest="group", required=True)

    # ---- load ----
    g_load = groups.add_parser("load").add_subparsers(dest="command", required=True)
    for name in ("from-tsv", "from-csv"):
        p = g_load.add_parser(name)
        p.add_argument("input")
        p.add_argument("output")
        p.add_argument("--index-col", default=None)

    # ---- modify ----
    g_mod = groups.add_parser("modify").add_subparsers(dest="command", required=True)
    p = g_mod.add_parser("categorize")
    _add_io(p)
    p.add_argument("--cat-min", type=int, default=3)
    p.add_argument("--cat-max", type=int, default=6)
    p.add_argument("--cont-min", type=int, default=15)
    for name in ("make-binary", "make-categorical", "make-continuous", "colfilter",
                 "rowfilter-incomplete-obs", "drop-extra-categories"):
        p = g_mod.add_parser(name)
        _add_io(p)
        _skip_only(p)
    for name, default in (("colfilter-min-n", 200), ("colfilter-min-cat-n", 200)):
        p = g_mod.add_parser(name)
        _add_io(p)
        p.add_argument("--n", type=int, default=default)
        _skip_only(p)
    p = g_mod.add_parser("colfilter-percent-zero")
    _add_io(p)
    p.add_argument("--filter-percent", type=float, default=90.0)
    _skip_only(p)
    p = g_mod.add_parser("rowfilter")
    _add_io(p)
    p.add_argument("--column", required=True)
    p.add_argument("--comparison", required=True, choices=["lt", "lte", "eq", "gte", "gt"])
    p.add_argument("--value", required=True)
    p = g_mod.add_parser("recode-values")
    _add_io(p)
    p.add_argument("--mapping", required=True, help='JSON {"old": "new", ...}')
    _skip_only(p)
    p = g_mod.add_parser("remove-outliers")
    _add_io(p)
    p.add_argument("--method", default="gaussian", choices=["gaussian", "iqr"])
    p.add_argument("--cutoff", type=float, default=3.0)
    _skip_only(p)
    p = g_mod.add_parser("clip-outliers")
    _add_io(p)
    p.add_argument("--method", default="gaussian", choices=["gaussian", "iqr"])
    p.add_argument("--cutoff", type=float, default=3.0)
    _skip_only(p)
    p = g_mod.add_parser("transform")
    _add_io(p)
    p.add_argument("--transform-method", required=True)
    _skip_only(p)
    p = g_mod.add_parser("merge-variables")
    p.add_argument("left")
    p.add_argument("right")
    p.add_argument("output")
    p.add_argument("--how", default="outer", choices=["left", "right", "inner", "outer"])
    p = g_mod.add_parser("merge-observations")
    p.add_argument("top")
    p.add_argument("bottom")
    p.add_argument("output")
    # reference cli/commands/modify.py:400-404
    p = g_mod.add_parser("move-variables")
    p.add_argument("left")
    p.add_argument("right")
    p.add_argument("output_left")
    p.add_argument("output_right")
    _skip_only(p)

    # ---- describe ----
    g_desc = groups.add_parser("describe").add_subparsers(dest="command", required=True)
    for name in ("correlations", "freq-table", "get-types", "percent-na", "skewness"):
        p = g_desc.add_parser(name)
        p.add_argument("data")
        p.add_argument("output")
        if name == "correlations":
            p.add_argument("--threshold", type=float, default=0.75)
    p = g_desc.add_parser("summarize")
    p.add_argument("data")

    # ---- analyze ----
    g_an = groups.add_parser("analyze").add_subparsers(dest="command", required=True)
    p = g_an.add_parser("association-study")
    _add_io(p)
    p.add_argument("--outcomes", nargs="+", required=True)
    p.add_argument("--covariates", nargs="*", default=[])
    p.add_argument("--regression-variables", nargs="*", default=None)
    p.add_argument("--min-n", type=int, default=200)
    p.add_argument("--standardize-data", action="store_true")
    p.add_argument("--report-categorical-betas", action="store_true")
    # survey design flags (reference cli/commands/analyze.py:76-211)
    p.add_argument("--survey-data", default=None, help="dataset with design columns")
    p.add_argument("--strata", default=None)
    p.add_argument("--cluster", default=None)
    p.add_argument("--nest", action="store_true")
    p.add_argument("--weight", default=None, help="single weight column")
    p.add_argument(
        "--weights-file",
        default=None,
        help="TSV of Variable<TAB>Weight for per-variable weights",
    )
    p.add_argument("--fpc", default=None)
    p.add_argument(
        "--single-cluster", default="fail", choices=["fail", "adjust", "average", "certainty"]
    )
    p.add_argument("--drop-unweighted", action="store_true")
    p = g_an.add_parser("add-corrected-pvalues")
    _add_io(p)
    p.add_argument("--pvalue", default="pvalue")
    p.add_argument("--groupby", nargs="*", default=None)
    p = g_an.add_parser("get-significant")
    _add_io(p)
    p.add_argument("--pvalue", type=float, default=0.05)
    p.add_argument(
        "--method", default="fdr", choices=["fdr", "bonferroni"],
    )

    # ---- plot ----
    g_plot = groups.add_parser("plot").add_subparsers(dest="command", required=True)
    p = g_plot.add_parser("manhattan")
    p.add_argument("results", nargs="+")
    p.add_argument("output")
    p = g_plot.add_parser("top-results")
    p.add_argument("result")
    p.add_argument("output")
    p.add_argument("--num-rows", type=int, default=20)
    p = g_plot.add_parser("histogram")
    p.add_argument("data")
    p.add_argument("column")
    p.add_argument("output")
    # reference cli/commands/plot.py:58-75
    p = g_plot.add_parser("distributions")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--kind", default="count", choices=["count", "box", "violin", "qq"])
    p.add_argument("--nrows", type=int, default=4)
    p.add_argument("--ncols", type=int, default=3)
    p.add_argument("--quality", default="medium", choices=["low", "medium", "high"])
    p.add_argument("--no-sort", action="store_true")
    for name in ("manhattan-fdr", "manhattan-bonferroni"):
        p = g_plot.add_parser(name)
        p.add_argument("results", nargs="+")
        p.add_argument("output")
        p.add_argument("--cutoff", type=float, default=0.05)

    # extension group: dataset-pipeline ops over plain parquet (no
    # .dtypes sidecar needed — these are corpus tables, not QC frames)
    g_pipe = groups.add_parser("pipeline").add_subparsers(dest="command", required=True)
    p = g_pipe.add_parser("split")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--fractions", nargs="+", default=["train=0.8", "val=0.1", "test=0.1"],
                   help="name=frac pairs")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p = g_pipe.add_parser("stratified-split")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--fractions", nargs="+", default=["train=0.8", "val=0.1", "test=0.1"],
                   help="name=frac pairs (exact per-stratum quotas)")
    p.add_argument("--by", default="source")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p = g_pipe.add_parser("pmi")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--min-count", type=int, default=5)
    p.add_argument("--text-col", default="text")
    p = g_pipe.add_parser("divergence")
    p.add_argument("data")
    p.add_argument("other", help="second corpus (parquet) to compare against")
    p.add_argument("output")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--text-col", default="text")
    p = g_pipe.add_parser("normalize")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--text-col", default="text")
    p.add_argument("--keep-html", action="store_true")
    p.add_argument("--lowercase", action="store_true")
    p.add_argument("--max-newlines", type=int, default=2)
    p = g_pipe.add_parser("dedup-report")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--by", default="source")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.8)
    p = g_pipe.add_parser("novelty")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--n", type=int, default=3)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("card")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--by", default="source")
    p.add_argument("--approx", action="store_true")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("quantize")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")
    p = g_pipe.add_parser("sample")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--fraction", type=float, default=None)
    p.add_argument("--by", default=None)
    p.add_argument("--fractions", nargs="*", default=None, help="stratum=frac pairs")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p = g_pipe.add_parser("pack")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--max-tokens", type=int, required=True)
    p.add_argument("--by", default="source")
    p.add_argument("--order-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--n-shards", type=int, default=1)
    p.add_argument("--id-col", default="doc_id", help="shard-hash key when --n-shards > 1")
    p = g_pipe.add_parser("chunk")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--chunk-tokens", type=int, required=True)
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("redact")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("dedup")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--method", default="exact", choices=["exact", "minhash", "simhash"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument("--keep", default=None,
                   help="keep the group member with the extreme of this "
                        "column (e.g. n_chars for keep-the-longest) "
                        "instead of the min id")
    p.add_argument("--keep-order", default="max", choices=["max", "min"])
    p.add_argument("--transitive", action="store_true",
                   help="connected-components clustering before choosing "
                        "survivors (near-dup methods)")
    p = g_pipe.add_parser("quality")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("repetition")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("paragraph-dedup")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--sep", default=r"\n")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("line-dedup")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--sep", default=r"\n")
    p.add_argument("--min-repeat", type=int, default=2)
    p.add_argument("--scope-col", default=None,
                   help="count line repeats within this column's groups "
                        "(e.g. source) instead of corpus-wide")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("jaccard-topk")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--min-jaccard", type=float, default=0.0)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("bm25")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--queries", required=True,
                   help="semicolon-separated query strings")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--k1", type=float, default=1.2)
    p.add_argument("--b", type=float, default=0.75)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--postings-dir", default=None,
                   help="stored postings from 'pipeline build-postings'; "
                        "data is then ignored and the corpus is not rescanned")

    p = g_pipe.add_parser("rrf")
    p.add_argument("data", help="first ranked table (query_id, id, rank)")
    p.add_argument("right", help="second ranked table")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--rrf-k", type=int, default=60)
    p.add_argument("--id-col", default="doc_id")

    p = g_pipe.add_parser("build-postings")
    p.add_argument("data")
    p.add_argument("output", help="postings directory for later "
                                  "'pipeline bm25 --postings-dir'")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    p = g_pipe.add_parser("fuzzy-join")
    p.add_argument("data", help="left table")
    p.add_argument("right", help="right table")
    p.add_argument("output")
    p.add_argument("--left-col", required=True)
    p.add_argument("--right-col", required=True)
    p.add_argument("--max-distance", type=int, default=2)
    p.add_argument("--block-left", default=None)
    p.add_argument("--block-right", default=None)

    p = g_pipe.add_parser("table-diff")
    p.add_argument("data", help="old table (or the NEW table with --snapshot-dir)")
    p.add_argument("right", nargs="?", default=None,
                   help="new table (omit when using --snapshot-dir)")
    p.add_argument("output")
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument("--compare", default=None,
                   help="comma-separated columns to compare (default: all shared non-key)")
    p.add_argument("--include-same", action="store_true")
    p.add_argument("--snapshot-dir", default=None,
                   help="diff DATA (as the new side) against the snapshot "
                        "a prior 'pipeline save-snapshot' wrote here")

    p = g_pipe.add_parser("save-snapshot")
    p.add_argument("data")
    p.add_argument("output", help="snapshot directory for later "
                                  "'pipeline table-diff --snapshot-dir'")

    p = g_pipe.add_parser("cc")
    p.add_argument("data", help="edge list")
    p.add_argument("output")
    p.add_argument("--src-col", default="src")
    p.add_argument("--dst-col", default="dst")
    p.add_argument("--sizes", action="store_true",
                   help="emit (component, n_nodes) instead of (node, component)")
    p.add_argument("--max-iter", type=int, default=50)
    p.add_argument("--no-shortcut", action="store_true",
                   help="disable pointer jumping (saves one join per round "
                        "on known-shallow graphs: stars, near-dup cliques)")

    p = g_pipe.add_parser("rank-eval")
    p.add_argument("data", help="ranked results (query_id, doc_id, rank)")
    p.add_argument("right", help="qrels (query_id, doc_id, rel)")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--query-col", default="query_id")
    p.add_argument("--doc-col", default="doc_id")
    p.add_argument("--rank-col", default="rank")
    p.add_argument("--rel-col", default="rel")
    p.add_argument("--macro", action="store_true",
                   help="emit the single-row macro average instead of "
                        "per-query metrics")

    p = g_pipe.add_parser("mmr")
    p.add_argument("data", help="corpus with an embedding column")
    p.add_argument("right", help="queries (query_id, embedding)")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--fetch-k", type=int, default=50)
    p.add_argument("--lambda", dest="lambda_", type=float, default=0.7)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--query-col", default="query_id",
                   help="id column of the queries table")

    p = g_pipe.add_parser("build-binary-index")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output", help="index directory for later "
                                  "'evaluate-retrieval --index-dir'")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--no-store-vectors", action="store_true",
                   help="skip the exact-rerank vectors/ sidecar (index "
                        "stays 1/32 of corpus bytes, but binary_rerank "
                        "then needs the live corpus for stage 2)")

    p = g_pipe.add_parser("evaluate-retrieval")
    p.add_argument("data", help="corpus with an embedding column, or '-' "
                                "to serve fully from --index-dir "
                                "(binary retriever only)")
    p.add_argument("right", help="queries (query_id, embedding)")
    p.add_argument("qrels", help="relevance judgments "
                                 "(query_id, <id-col>, rel)")
    p.add_argument("output", help="rank_eval metrics table")
    p.add_argument("--retriever", default="cosine",
                   choices=["cosine", "ivf", "lsh", "binary"],
                   help="candidate generator (cosine = exact brute force; "
                        "binary = Hamming shortlist + exact rerank)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--fetch-k", type=int, default=0,
                   help="candidate depth fed to --mmr (default 5*k)")
    p.add_argument("--mmr", action="store_true",
                   help="MMR-diversify the candidates before scoring")
    p.add_argument("--lambda", dest="lambda_", type=float, default=0.7)
    p.add_argument("--n-lists", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--assign-impl", default="codegen",
                   choices=["codegen", "pandas"],
                   help="ivf: cell assignment impl (pandas = Arrow-batched "
                        "matmul, for large --n-lists)")
    p.add_argument("--n-planes", type=int, default=8)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--query-col", default="query_id")
    p.add_argument("--rel-col", default="rel")
    p.add_argument("--index-dir", default=None,
                   help="with --retriever binary: serve the Hamming "
                        "stage from a stored 'build-binary-index' dir")
    p.add_argument("--shortlist-k", type=int, default=0,
                   help="binary: Hamming shortlist depth before the exact "
                        "rerank (default 4x the candidate depth) — the "
                        "recall/cost knob; price it with 'pipeline "
                        "ann-recall --method binary'")

    p = g_pipe.add_parser("hash-embed")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--salt", default="fh")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("split-leakage")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--splits", required=True,
                   help='JSON {"train": 0.8, "test": 0.2, ...}')
    p.add_argument("--granularity", default="ngram", choices=["doc", "ngram"])
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument("--salt", default="")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("token-budget")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--budget", type=int, required=True,
                   help="max tokens kept per group")
    p.add_argument("--by", default="source")
    p.add_argument("--order-col", default=None,
                   help="keep the best rows by this column until the "
                        "budget is spent (default: deterministic hash order)")
    p.add_argument("--ascending", action="store_true",
                   help="with --order-col: prefer LOW values")
    p.add_argument("--salt", default="")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("shard-by-tokens")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--tokens-per-shard", type=int, required=True)
    p.add_argument("--by", default="source")
    p.add_argument("--salt", default="")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("weighted-sample")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--weight-col", required=True)
    p.add_argument("--salt", default="")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("perplexity-buckets")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--n-buckets", type=int, default=3)
    p.add_argument("--approx", action="store_true",
                   help="assign buckets from approximate per-language "
                        "cutoffs (no per-language sort — the 100-TB form)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--lang-col", default="lang")
    p = g_pipe.add_parser("contamination")
    p.add_argument("data")
    p.add_argument("benchmark")
    p.add_argument("output")
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument("--fuzzy", action="store_true",
                   help="MinHash near-duplicate matching instead of exact n-grams")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard threshold for --fuzzy")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("incremental-dedup")
    p.add_argument("data", help="the new batch")
    p.add_argument("seen", help="history: documents, or a fingerprint table with --seen-fp-col")
    p.add_argument("output")
    p.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument("--seen-fp-col", default=None,
                   help="column name when 'seen' is a persisted fingerprint table "
                        "(md5 strings for exact, longs for simhash)")
    p = g_pipe.add_parser("decontaminate")
    p.add_argument("data")
    p.add_argument("benchmark")
    p.add_argument("output")
    p.add_argument("--ngram", type=int, default=13,
                   help="window size whose benchmark collisions are cut "
                        "(13 = the GPT-3 appendix-C published n)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("clean")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--languages", nargs="+", default=["en"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--apply", action="store_true",
                   help="write only kept documents instead of the decision table")
    p.add_argument("--max-span-dup-frac", type=float, default=None,
                   help="opt-in Lee-et-al substring-dup stage threshold")
    p.add_argument("--span-ngram", type=int, default=50)
    p.add_argument("--min-quality-prob", type=float, default=None,
                   help="opt-in linear quality-classifier stage threshold")
    p = g_pipe.add_parser("duplicate-spans")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--ngram", type=int, default=50,
                   help="window length in tokens (Lee et al. use 50)")
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("zorder")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--by", nargs="+", required=True,
                   help="numeric columns to cluster on (Z-order curve)")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--bits", type=int, default=10)
    p = g_pipe.add_parser("domain-cap")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--max-docs", type=int, required=True)
    p.add_argument("--by", default="source")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p.add_argument("--prefilter-margin", type=float, default=None,
                   help="bound the per-group sort to ~margin*max_docs rows")
    p = g_pipe.add_parser("mixture")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--tau", type=float, required=True,
                   help="temperature: <1 flattens, 1 proportional, 0 uniform")
    p.add_argument("--target-rows", type=int, required=True)
    p.add_argument("--by", default="source")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p = g_pipe.add_parser("tfidf")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--top-k", type=int, default=3)
    p.add_argument("--min-token-len", type=int, default=3)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("bigram-logprob")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("classify-quality")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--weights", nargs="*", default=None,
                   help="feature=weight overrides for the linear probe")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("lsh-recall")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--sample-fraction", type=float, default=0.5)
    p.add_argument("--salt", default="recall")
    p.add_argument("--hash-family", default="xxhash64", choices=["xxhash64", "md5"])
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("compact")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--sort-by", nargs="*", default=None,
                   help="also range-cluster the compacted files on these columns")
    p = g_pipe.add_parser("source-overlap")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--by", default="source")
    p.add_argument("--granularity", default="doc", choices=["doc", "ngram"])
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p = g_pipe.add_parser("remove-duplicate-spans")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--ngram", type=int, default=50,
                   help="window length in tokens (Lee et al. use 50)")
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    g_ev = groups.add_parser("events").add_subparsers(dest="command", required=True)
    p = g_ev.add_parser("funnel")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--steps", nargs="+", required=True,
                   help="ordered event types, e.g. signup view purchase")
    p.add_argument("--user-col", default="user_id")
    p.add_argument("--type-col", default="event_type")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--counts", action="store_true",
                   help="emit the per-stage cumulative funnel instead of per-user stages")
    p.add_argument("--max-span-seconds", type=float, default=None,
                   help="whole funnel must complete within this span of the first step")
    p.add_argument("--times", action="store_true",
                   help="emit per-(user, stage) times + durations instead of final stages")
    p.add_argument("--max-events-per-user", type=int, default=None,
                   help="drop (bot) users with more step events than this before the scan")
    p = g_ev.add_parser("retention")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--period-days", type=int, default=7)
    p.add_argument("--user-col", default="user_id")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--approx", action="store_true",
                   help="HyperLogLog++ distinct users (O(1)/group state at scale)")
    p.add_argument("--rsd", type=float, default=0.05,
                   help="relative error for --approx")

    p = g_pipe.add_parser("epoch-repeat")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--epochs", type=float, required=True,
                   help="fractional pass count, e.g. 2.5")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")

    p = g_pipe.add_parser("dsir")
    p.add_argument("data")
    p.add_argument("output")
    p.add_argument("--target", required=True,
                   help="parquet of target-domain sample documents")
    p.add_argument("--n", type=int, default=None,
                   help="sample size (Gumbel top-n); omit to emit weights only")
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="dsir")

    p = g_pipe.add_parser("ann-recall")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output")
    p.add_argument(
        "--method",
        choices=[
            "lsh", "lsh_multi", "ivf", "quantized", "truncated", "rp",
            "pq", "ivf_pq", "binary", "hamming",
        ],
        default="lsh_multi",
    )
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-queries", type=int, default=20)
    p.add_argument("--shortlist-k", type=int, default=100,
                   help="binary: Hamming shortlist depth before rerank")
    p.add_argument("--n-planes", type=int, default=4)
    p.add_argument("--n-bands", type=int, default=8)
    p.add_argument("--n-lists", type=int, default=8)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--dim", type=int, default=16, help="truncated/rp output dim")
    p.add_argument("--m", type=int, default=8, help="pq subspaces")
    p.add_argument("--k-sub", type=int, default=16, help="pq centroids/subspace")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")

    p = g_pipe.add_parser("pq-encode")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output")
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--k-sub", type=int, default=16)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")

    p = g_pipe.add_parser("mixture-report")
    p.add_argument("data", help="documents parquet")
    p.add_argument("output")
    p.add_argument("--budget-tokens", type=int, required=True)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--by", default="source")
    p.add_argument("--max-epochs", type=float, default=None)

    p = g_pipe.add_parser("cluster")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output")
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--assign-impl", default="codegen",
                   choices=["codegen", "pandas"],
                   help="cluster assignment: codegen (default, pure JVM) "
                        "or pandas (Arrow-batched matmul — use past ~256 "
                        "clusters)")

    p = g_pipe.add_parser("knn-graph")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output", help="(id, neighbor_id, cosine, rank) parquet")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-lists", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--recall", action="store_true",
                   help="write the recall@k harness row instead of the "
                        "graph (prices the n_lists/n_probe budget vs "
                        "exact brute force)")
    p.add_argument("--assign-impl", default="codegen",
                   choices=["codegen", "pandas"],
                   help="cell assignment: codegen (default, pure JVM) or "
                        "pandas (Arrow-batched matmul — use past ~256 "
                        "lists; see BASELINE.md round 12)")
    p.add_argument("--n-queries", type=int, default=20)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")

    p = g_pipe.add_parser("train-bpe")
    p.add_argument("data", help="documents parquet")
    p.add_argument("output", help="(rank, lhs, rhs, freq) merge table")
    p.add_argument("--n-merges", type=int, default=100)
    p.add_argument("--min-pair-count", type=int, default=2)
    p.add_argument("--no-lowercase", action="store_true")
    p.add_argument("--text-col", default="text")
    p.add_argument("--word-end-marker", default=None)
    p.add_argument(
        "--strategy", choices=["distributed", "driver"], default="distributed",
        help="'driver' = exact incremental pair-delta trainer "
        "(production vocabularies; ~460x less wall per merge)",
    )

    p = g_pipe.add_parser("bpe-encode")
    p.add_argument("data", help="documents parquet")
    p.add_argument("merges", help="merge table from 'pipeline train-bpe'")
    p.add_argument("output", help="(id, tokens, n_tokens) parquet")
    p.add_argument("--no-lowercase", action="store_true")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--word-end-marker", default=None)
    p.add_argument(
        "--encode-impl", choices=["auto", "fold", "pandas"], default="auto"
    )
    p = g_pipe.add_parser("ivf-tune")
    p.add_argument("data", help="embeddings parquet")
    p.add_argument("output")
    p.add_argument("--recall-target", type=float, default=0.9)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-queries", type=int, default=20)
    p.add_argument("--n-lists", type=int, default=8)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")

    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = _spark()
    from clarite_python_spark.operators import analyze, describe, modify
    from pyspark.sql import functions as F

    cmd = (args.group, args.command)
    if args.group == "load":
        from clarite_python_spark.sources.io import from_csv, from_tsv

        idx = args.index_col
        if idx is not None and idx.isdigit():
            idx = int(idx)
        fn = from_tsv if args.command == "from-tsv" else from_csv
        _save(fn(spark, args.input, index_col=idx if idx is not None else 0), args.output)
        return 0

    if args.group == "modify":
        two_frame = {"merge-variables", "merge-observations"}
        if args.command in two_frame:
            if args.command == "merge-variables":
                out = modify.merge_variables(
                    _load(spark, args.left), _load(spark, args.right), how=args.how
                )
            else:
                out = modify.merge_observations(
                    _load(spark, args.top), _load(spark, args.bottom)
                )
            _save(out, args.output)
            return 0
        if args.command == "move-variables":
            new_left, new_right = modify.move_variables(
                _load(spark, args.left),
                _load(spark, args.right),
                skip=args.skip,
                only=args.only,
            )
            _save(new_left, args.output_left)
            _save(new_right, args.output_right)
            return 0
        cf = _load(spark, args.data)
        so = dict(skip=getattr(args, "skip", None), only=getattr(args, "only", None))
        if args.command == "categorize":
            out = modify.categorize(cf, args.cat_min, args.cat_max, args.cont_min)
        elif args.command == "make-binary":
            out = modify.make_binary(cf, **so)
        elif args.command == "make-categorical":
            out = modify.make_categorical(cf, **so)
        elif args.command == "make-continuous":
            out = modify.make_continuous(cf, **so)
        elif args.command == "colfilter":
            out = modify.colfilter(cf, **so)
        elif args.command == "colfilter-min-n":
            out = modify.colfilter_min_n(cf, n=args.n, **so)
        elif args.command == "colfilter-min-cat-n":
            out = modify.colfilter_min_cat_n(cf, n=args.n, **so)
        elif args.command == "colfilter-percent-zero":
            out = modify.colfilter_percent_zero(cf, filter_percent=args.filter_percent, **so)
        elif args.command == "rowfilter-incomplete-obs":
            out = modify.rowfilter_incomplete_obs(cf, **so)
        elif args.command == "drop-extra-categories":
            out = modify.drop_extra_categories(cf, **so)
        elif args.command == "rowfilter":
            value: object = args.value
            try:
                value = float(value) if "." in str(value) else int(value)
            except ValueError:
                pass
            out = modify.rowfilter(cf, args.column, args.comparison, value)
        elif args.command == "recode-values":
            out = modify.recode_values(cf, json.loads(args.mapping), **so)
        elif args.command == "remove-outliers":
            out = modify.remove_outliers(cf, method=args.method, cutoff=args.cutoff, **so)
        elif args.command == "clip-outliers":
            out = modify.clip_outliers(cf, method=args.method, cutoff=args.cutoff, **so)
        elif args.command == "transform":
            out = modify.transform(cf, args.transform_method, **so)
        else:  # pragma: no cover
            raise SystemExit(f"unknown command {cmd}")
        _save(out, args.output)
        return 0

    if args.group == "describe":
        cf = _load(spark, args.data)
        if args.command == "summarize":
            print(json.dumps(describe.summarize(cf)))
            return 0
        fn = {
            "correlations": lambda: describe.correlations(cf, threshold=args.threshold),
            "freq-table": lambda: describe.freq_table(cf),
            "get-types": lambda: describe.get_types(cf),
            "percent-na": lambda: describe.percent_na(cf),
            "skewness": lambda: describe.skewness(cf),
        }[args.command]
        _save_result(fn(), args.output)
        return 0

    if args.group == "analyze":
        if args.command == "association-study":
            cf = _load(spark, args.data)
            design = None
            if args.strata or args.cluster or args.weight or args.weights_file:
                from clarite_python_spark.survey import SurveyDesignSpec

                survey_df = (
                    _load(spark, args.survey_data).df if args.survey_data else cf.df
                )
                weights = args.weight
                if args.weights_file:
                    # TSV of variable -> weight-column name
                    # (reference cli/commands/analyze.py:103-110)
                    import csv

                    with open(args.weights_file) as fh:
                        weights = dict(
                            (row[0], row[1])
                            for row in csv.reader(fh, delimiter="\t")
                            if len(row) >= 2
                        )
                design = SurveyDesignSpec(
                    survey_df,
                    strata=args.strata,
                    cluster=args.cluster,
                    nest=args.nest,
                    weights=weights,
                    fpc=args.fpc,
                    single_cluster=args.single_cluster,
                    drop_unweighted=args.drop_unweighted,
                )
                if not args.survey_data:
                    # design columns came from the data file: exclude them
                    # from the analysis frame (design vars must not appear
                    # in the data, reference survey_design.py:488-550)
                    design_cols = [
                        c
                        for c in (
                            args.strata,
                            args.cluster,
                            args.fpc,
                            *design.unique_weight_names,
                        )
                        if c is not None and c in cf.variables
                    ]
                    if design_cols:
                        cf = modify.colfilter(cf, skip=design_cols)
            res = analyze.association_study(
                cf,
                outcomes=args.outcomes,
                regression_variables=args.regression_variables,
                covariates=args.covariates,
                min_n=args.min_n,
                standardize_data=args.standardize_data,
                report_categorical_betas=args.report_categorical_betas,
                survey_design_spec=design,
            )
            _save_result(res, args.output)
            return 0
        if args.command == "add-corrected-pvalues":
            df = spark.read.parquet(args.data)
            _save_result(
                analyze.add_corrected_pvalues(df, pvalue=args.pvalue, groupby=args.groupby),
                args.output,
            )
            return 0
        if args.command == "get-significant":
            # reference cli/commands/analyze.py:299-324
            df = spark.read.parquet(args.data)
            col = "pvalue_fdr" if args.method == "fdr" else "pvalue_bonferroni"
            _save_result(df.where(F.col(col) <= args.pvalue), args.output)
            return 0

    if args.group == "plot":
        from clarite_python_spark import plot as plot_mod

        if args.command == "manhattan":
            dfs = {p: spark.read.parquet(p) for p in args.results}
            plot_mod.manhattan(dfs, filename=args.output)
        elif args.command == "top-results":
            plot_mod.top_results(
                spark.read.parquet(args.result), num_rows=args.num_rows, filename=args.output
            )
        elif args.command == "histogram":
            plot_mod.histogram(_load(spark, args.data), args.column, filename=args.output)
        elif args.command == "distributions":
            plot_mod.distributions(
                _load(spark, args.data),
                filename=args.output,
                continuous_kind=args.kind,
                nrows=args.nrows,
                ncols=args.ncols,
                quality=args.quality,
                sort=not args.no_sort,
            )
        elif args.command == "manhattan-fdr":
            plot_mod.manhattan_fdr(
                {p: spark.read.parquet(p) for p in args.results},
                cutoff=args.cutoff,
                filename=args.output,
            )
        elif args.command == "manhattan-bonferroni":
            plot_mod.manhattan_bonferroni(
                {p: spark.read.parquet(p) for p in args.results},
                cutoff=args.cutoff,
                filename=args.output,
            )
        print(f"wrote {args.output}")
        return 0

    if args.group == "pipeline":
        from clarite_python_spark.operators import dedup as dedup_mod
        from clarite_python_spark.operators import pipeline as pipe_mod
        from clarite_python_spark.operators import text as text_mod

        # 'evaluate-retrieval - ... --index-dir IDX' runs fully
        # index-resident: no live corpus is mounted; binary stage 1
        # reads the stored bit pack, stage 2 the vectors/ sidecar
        if args.data == "-":
            if getattr(args, "index_dir", None) is None or getattr(
                args, "retriever", None
            ) != "binary":
                print(
                    "DATA '-' (no live corpus) needs --retriever binary "
                    "with --index-dir",
                    file=sys.stderr,
                )
                return 2
            df = None
        else:
            df = spark.read.parquet(args.data)

        def _pairs(items):
            out = {}
            for item in items:
                name, _, frac = item.partition("=")
                out[name] = float(frac)
            return out

        if args.command == "split":
            out = pipe_mod.deterministic_split(
                df, _pairs(args.fractions), id_col=args.id_col, salt=args.salt
            )
        elif args.command == "stratified-split":
            out = pipe_mod.stratified_split(
                df, _pairs(args.fractions), by=args.by,
                id_col=args.id_col, salt=args.salt,
            )
        elif args.command == "pmi":
            out = text_mod.pmi_collocations(
                df, k=args.k, min_count=args.min_count, text_col=args.text_col
            )
        elif args.command == "divergence":
            out = text_mod.corpus_divergence(
                df, spark.read.parquet(args.other),
                text_col=args.text_col, alpha=args.alpha,
            )
        elif args.command == "normalize":
            out = text_mod.normalize_text(
                df, text_col=args.text_col, strip_html=not args.keep_html,
                lowercase=args.lowercase, max_newlines=args.max_newlines,
            )
        elif args.command == "dedup-report":
            out = dedup_mod.dedup_report(
                df, by=args.by, text_col=args.text_col,
                id_col=args.id_col, threshold=args.threshold,
            )
        elif args.command == "novelty":
            out = text_mod.ngram_novelty(
                df, n=args.n, text_col=args.text_col, id_col=args.id_col
            )
        elif args.command == "card":
            out = text_mod.dataset_card(
                df, by=args.by, text_col=args.text_col,
                id_col=args.id_col, exact=not args.approx,
            )
        elif args.command == "quantize":
            from clarite_python_spark.operators import similarity as sim_mod

            out = sim_mod.quantize_embeddings(
                df, id_col=args.id_col, vec_col=args.vec_col, bits=args.bits
            )
        elif args.command == "sample":
            out = pipe_mod.deterministic_sample(
                df,
                fraction=args.fraction,
                by=args.by,
                fractions=_pairs(args.fractions) if args.fractions else None,
                id_col=args.id_col,
                salt=args.salt,
            )
        elif args.command == "pack":
            out = pipe_mod.pack_sequences(
                df,
                args.max_tokens,
                by=args.by,
                order_col=args.order_col,
                text_col=args.text_col,
                n_shards=args.n_shards,
                id_col=args.id_col,
            )
        elif args.command == "chunk":
            out = pipe_mod.chunk_documents(
                df,
                args.chunk_tokens,
                overlap=args.overlap,
                text_col=args.text_col,
                id_col=args.id_col,
            )
        elif args.command == "redact":
            out = text_mod.redact(df, text_col=args.text_col, id_col=args.id_col)
        elif args.command == "dedup":
            kw = {}
            if args.method == "simhash":
                kw["max_hamming"] = args.max_hamming
            elif args.method == "minhash":
                kw["threshold"] = args.threshold
            out = dedup_mod.dedup(
                df, args.method, text_col=args.text_col, id_col=args.id_col,
                keep=args.keep, keep_order=args.keep_order,
                transitive=args.transitive, **kw,
            )
        elif args.command == "quality":
            out = text_mod.gopher_rules(df, text_col=args.text_col, id_col=args.id_col)
        elif args.command == "repetition":
            out = text_mod.repetition_stats(df, text_col=args.text_col, id_col=args.id_col)
        elif args.command == "paragraph-dedup":
            out = dedup_mod.paragraph_dedup(
                df, text_col=args.text_col, id_col=args.id_col, sep=args.sep
            )
        elif args.command == "line-dedup":
            out = dedup_mod.line_dedup(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                sep=args.sep,
                min_repeat=args.min_repeat,
                scope_col=args.scope_col,
            )
        elif args.command == "jaccard-topk":
            out = dedup_mod.jaccard_topk(
                df, k=args.k, text_col=args.text_col, id_col=args.id_col,
                num_hashes=args.num_hashes, bands=args.bands,
                shingle_n=args.shingle_n, min_jaccard=args.min_jaccard,
            )
        elif args.command == "hash-embed":
            out = text_mod.feature_hash_embed(
                df, dim=args.dim, text_col=args.text_col, id_col=args.id_col,
                salt=args.salt, normalize=not args.no_normalize,
            )
        elif args.command == "split-leakage":
            out = pipe_mod.split_leakage(
                df, json.loads(args.splits),
                id_col=args.id_col, text_col=args.text_col, salt=args.salt,
                granularity=args.granularity, n=args.ngram,
            )
        elif args.command == "token-budget":
            out = pipe_mod.token_budget_sample(
                df, args.budget, by=args.by,
                text_col=args.text_col, id_col=args.id_col, salt=args.salt,
                order_col=args.order_col, descending=not args.ascending,
            )
        elif args.command == "shard-by-tokens":
            out = pipe_mod.shard_by_tokens(
                df, args.tokens_per_shard, by=args.by,
                text_col=args.text_col, id_col=args.id_col, salt=args.salt,
            )
        elif args.command == "weighted-sample":
            out = pipe_mod.weighted_sample(
                df, args.n, weight_col=args.weight_col,
                id_col=args.id_col, salt=args.salt,
            )
        elif args.command == "perplexity-buckets":
            out = pipe_mod.perplexity_buckets(
                df,
                n_buckets=args.n_buckets,
                text_col=args.text_col,
                id_col=args.id_col,
                lang_col=args.lang_col,
                exact=not args.approx,
            )
        elif args.command == "contamination":
            bench = spark.read.parquet(args.benchmark)
            if args.fuzzy:
                out = dedup_mod.fuzzy_contamination(
                    df, bench, threshold=args.threshold,
                    text_col=args.text_col, id_col=args.id_col,
                )
            else:
                out = dedup_mod.contamination(
                    df, bench, n=args.ngram, text_col=args.text_col, id_col=args.id_col
                )
        elif args.command == "incremental-dedup":
            seen = spark.read.parquet(args.seen)
            if args.method == "exact":
                out = dedup_mod.incremental_dedup(
                    df, seen, text_col=args.text_col, id_col=args.id_col,
                    seen_fp_col=args.seen_fp_col,
                )
            elif args.method == "simhash":
                out = dedup_mod.incremental_simhash_dedup(
                    df, seen, text_col=args.text_col, id_col=args.id_col,
                    max_hamming=args.max_hamming, seen_fp_col=args.seen_fp_col,
                )
            else:
                out = dedup_mod.incremental_neardup(
                    df, seen, text_col=args.text_col, id_col=args.id_col,
                    threshold=args.threshold,
                )
        elif args.command == "bm25":
            from clarite_python_spark.operators import text as text_mod

            qdf = spark.createDataFrame(
                [(i, s) for i, s in enumerate(args.queries.split(";"))],
                "query_id long, query string",
            )
            out = text_mod.bm25_topk(
                df, qdf, k=args.k, k1=args.k1, b=args.b,
                text_col=args.text_col, id_col=args.id_col,
                postings_dir=args.postings_dir,
            )
        elif args.command == "build-postings":
            from clarite_python_spark.operators import text as text_mod

            text_mod.build_postings(
                df, args.output, text_col=args.text_col, id_col=args.id_col
            )
            return 0
        elif args.command == "rrf":
            from clarite_python_spark.operators import text as text_mod

            right = spark.read.parquet(args.right)
            out = text_mod.rrf_fuse(
                df, right, k=args.k, rrf_k=args.rrf_k, id_col=args.id_col
            )
        elif args.command == "fuzzy-join":
            from clarite_python_spark.operators import joins as joins_mod

            right = spark.read.parquet(args.right)
            if bool(args.block_left) != bool(args.block_right):
                print(
                    "error: --block-left and --block-right must be given "
                    "together (blocking needs a key on BOTH sides; a lone "
                    "flag would silently fall back to the far more "
                    "expensive length-band-only join)",
                    file=sys.stderr,
                )
                raise SystemExit(2)
            block = (
                (args.block_left, args.block_right)
                if args.block_left and args.block_right
                else None
            )
            out = joins_mod.fuzzy_join(
                df, right, args.left_col, args.right_col,
                max_distance=args.max_distance, block_cols=block,
            )
        elif args.command == "table-diff":
            from clarite_python_spark.operators import evaluation as eval_mod

            keys = [c.strip() for c in args.keys.split(",") if c.strip()]
            compare = (
                [c.strip() for c in args.compare.split(",") if c.strip()]
                if args.compare else None
            )
            if args.snapshot_dir is not None and args.right is not None:
                # refuse the ambiguous form instead of silently ignoring
                # RIGHT (the operator itself raises on frame+snapshot_dir;
                # forward that contract to the CLI surface)
                print(
                    "table-diff takes a RIGHT table OR --snapshot-dir, not "
                    "both — drop one",
                    file=sys.stderr,
                )
                return 2
            if args.snapshot_dir is not None:
                out = eval_mod.table_diff(
                    df, keys=keys, compare=compare,
                    include_same=args.include_same,
                    snapshot_dir=args.snapshot_dir,
                )
            else:
                if args.right is None:
                    print("table-diff needs a RIGHT table or --snapshot-dir",
                          file=sys.stderr)
                    return 2
                right = spark.read.parquet(args.right)
                out = eval_mod.table_diff(
                    df, right, keys=keys, compare=compare,
                    include_same=args.include_same,
                )
        elif args.command == "build-binary-index":
            from clarite_python_spark.operators import similarity as sim_mod

            sim_mod.build_binary_index(
                df, args.output, id_col=args.id_col, vec_col=args.vec_col,
                store_vectors=not args.no_store_vectors,
            )
            print(f"wrote {args.output}")
            return 0
        elif args.command == "save-snapshot":
            from clarite_python_spark.operators import evaluation as eval_mod

            eval_mod.save_snapshot(df, args.output)
            print(f"wrote {args.output}")
            return 0
        elif args.command == "cc":
            from clarite_python_spark.operators import graph as graph_mod

            fn = (
                graph_mod.component_sizes if args.sizes
                else graph_mod.connected_components
            )
            out = fn(
                df, args.src_col, args.dst_col, max_iter=args.max_iter,
                shortcut=not args.no_shortcut,
            )
        elif args.command == "rank-eval":
            from clarite_python_spark.operators import evaluation as eval_mod

            right = spark.read.parquet(args.right)
            fn = eval_mod.rank_eval_macro if args.macro else eval_mod.rank_eval
            out = fn(
                df, right, k=args.k, query_col=args.query_col,
                doc_col=args.doc_col, rank_col=args.rank_col,
                rel_col=args.rel_col,
            )
        elif args.command == "mmr":
            from clarite_python_spark.operators import similarity as sim_mod

            right = spark.read.parquet(args.right)
            out = sim_mod.mmr_rerank(
                df, right, k=args.k, fetch_k=args.fetch_k,
                lambda_=args.lambda_, id_col=args.id_col,
                vec_col=args.vec_col, query_id_col=args.query_col,
            )
        elif args.command == "evaluate-retrieval":
            # the end-to-end retrieval-quality loop: retriever ->
            # (optional MMR diversification) -> rank_eval vs qrels —
            # the composition every piece (ann, mmr, rank-eval) exists
            # for, in one command
            from pyspark.sql import functions as F

            from clarite_python_spark.operators import evaluation as eval_mod
            from clarite_python_spark.operators import similarity as sim_mod

            queries_df = spark.read.parquet(args.right)
            qrels = spark.read.parquet(args.qrels)
            fetch = args.fetch_k or (5 * args.k if args.mmr else args.k)
            common = dict(
                id_col=args.id_col, vec_col=args.vec_col,
                query_id_col=args.query_col,
            )
            if args.retriever == "cosine":
                cand = sim_mod.cosine_topk(df, queries_df, k=fetch, **common)
            elif args.retriever == "ivf":
                cand = sim_mod.ivf_topk(
                    df, queries_df, k=fetch,
                    n_lists=args.n_lists, n_probe=args.n_probe,
                    assign_impl=args.assign_impl, **common,
                )
            elif args.retriever == "binary":
                cand = sim_mod.binary_rerank(
                    df, queries_df, k=fetch,
                    shortlist_k=args.shortlist_k or 4 * fetch,
                    index_dir=args.index_dir, **common,
                )
            else:
                cand = sim_mod.lsh_topk(
                    df, queries_df, k=fetch, n_planes=args.n_planes, **common
                )
            if args.mmr:
                # index-resident run: MMR's diversity re-fetch reads the
                # stored vectors/ sidecar instead of a live corpus
                mmr_corpus = (
                    df
                    if df is not None
                    else spark.read.parquet(f"{args.index_dir}/vectors")
                )
                ranked = sim_mod.mmr_rerank(
                    mmr_corpus, queries_df, k=args.k, lambda_=args.lambda_,
                    candidates=cand, score_col="cosine", **common,
                )
            else:
                ranked = cand.where(F.col("rank") <= args.k)
            out = eval_mod.rank_eval(
                ranked, qrels, k=args.k, query_col=args.query_col,
                doc_col=args.id_col, rank_col="rank", rel_col=args.rel_col,
            )
        elif args.command == "decontaminate":
            bench = spark.read.parquet(args.benchmark)
            out = dedup_mod.remove_contaminated_spans(
                df, bench, n=args.ngram,
                text_col=args.text_col, id_col=args.id_col,
            )
        elif args.command == "duplicate-spans":
            out = dedup_mod.duplicate_spans(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                n=args.ngram,
                min_count=args.min_count,
            )
        elif args.command == "zorder":
            from clarite_python_spark.operators import layout as layout_mod

            layout_mod.optimize_layout(
                df, args.by, path=args.output, n_partitions=args.partitions,
                bits=args.bits,
            )
            return 0
        elif args.command == "domain-cap":
            out = pipe_mod.domain_cap(
                df,
                args.max_docs,
                by=args.by,
                id_col=args.id_col,
                salt=args.salt,
                prefilter_margin=args.prefilter_margin,
            )
        elif args.command == "mixture":
            out = pipe_mod.temperature_mixture(
                df,
                args.tau,
                args.target_rows,
                by=args.by,
                id_col=args.id_col,
                salt=args.salt,
            )
        elif args.command == "tfidf":
            out = text_mod.tfidf_top_terms(
                df,
                k=args.top_k,
                text_col=args.text_col,
                id_col=args.id_col,
                min_token_len=args.min_token_len,
            )
        elif args.command == "bigram-logprob":
            out = text_mod.bigram_logprob(
                df, text_col=args.text_col, id_col=args.id_col, alpha=args.alpha
            )
        elif args.command == "classify-quality":
            out = text_mod.quality_classifier(
                df,
                weights=_pairs(args.weights) if args.weights else None,
                threshold=args.threshold,
                text_col=args.text_col,
                id_col=args.id_col,
            )
        elif args.command == "lsh-recall":
            out = dedup_mod.lsh_recall(
                df,
                threshold=args.threshold,
                sample_fraction=args.sample_fraction,
                salt=args.salt,
                text_col=args.text_col,
                id_col=args.id_col,
                hash_family=args.hash_family,
                num_hashes=args.num_hashes,
                bands=args.bands,
            )
        elif args.command == "epoch-repeat":
            out = pipe_mod.epoch_repeat(
                df, args.epochs, id_col=args.id_col, salt=args.salt
            )
        elif args.command == "dsir":
            tgt = spark.read.parquet(args.target)
            kw = dict(
                n_buckets=args.n_buckets, text_col=args.text_col,
                id_col=args.id_col, alpha=args.alpha, salt=args.salt,
            )
            if args.n is None:
                out = pipe_mod.dsir_logweights(df, tgt, **kw)
            else:
                out = pipe_mod.dsir_sample(df, tgt, args.n, **kw)
        elif args.command == "ann-recall":
            from clarite_python_spark.operators import similarity as sim_mod

            kw = {}
            if args.method in ("lsh", "lsh_multi"):
                kw["n_planes"] = args.n_planes
                if args.method == "lsh_multi":
                    kw["n_bands"] = args.n_bands
            elif args.method == "ivf":
                kw["n_lists"] = args.n_lists
                kw["n_probe"] = args.n_probe
            elif args.method == "truncated":
                kw["dim"] = args.dim
            elif args.method == "rp":
                kw["out_dim"] = args.dim
            elif args.method == "pq":
                kw["m"] = args.m
                kw["k_sub"] = args.k_sub
            elif args.method == "ivf_pq":
                kw["m"] = args.m
                kw["k_sub"] = args.k_sub
                kw["n_lists"] = args.n_lists
                kw["n_probe"] = args.n_probe
            elif args.method == "binary":
                kw["shortlist_k"] = args.shortlist_k
            out = sim_mod.ann_recall(
                df,
                k=args.k,
                n_queries=args.n_queries,
                method=args.method,
                id_col=args.id_col,
                vec_col=args.vec_col,
                **kw,
            )
        elif args.command == "cluster":
            from clarite_python_spark.operators import similarity as sim_mod

            out = sim_mod.cluster_embeddings(
                df, k=args.k, id_col=args.id_col, vec_col=args.vec_col,
                assign_impl=args.assign_impl,
            )
        elif args.command == "knn-graph":
            from clarite_python_spark.operators import similarity as sim_mod

            if args.recall:
                out = sim_mod.knn_graph_recall(
                    df, k=args.k, n_queries=args.n_queries,
                    n_lists=args.n_lists, n_probe=args.n_probe,
                    id_col=args.id_col, vec_col=args.vec_col,
                    assign_impl=args.assign_impl,
                )
            else:
                out = sim_mod.knn_graph(
                    df, k=args.k, n_lists=args.n_lists, n_probe=args.n_probe,
                    id_col=args.id_col, vec_col=args.vec_col,
                    assign_impl=args.assign_impl,
                )
        elif args.command == "train-bpe":
            out = text_mod.train_bpe(
                df, n_merges=args.n_merges, text_col=args.text_col,
                lowercase=not args.no_lowercase,
                min_pair_count=args.min_pair_count,
                word_end_marker=args.word_end_marker,
                strategy=args.strategy,
            )
        elif args.command == "bpe-encode":
            out = text_mod.bpe_encode(
                df, spark.read.parquet(args.merges),
                text_col=args.text_col, id_col=args.id_col,
                lowercase=not args.no_lowercase,
                word_end_marker=args.word_end_marker,
                encode_impl=args.encode_impl,
            )
        elif args.command == "pq-encode":
            from clarite_python_spark.operators import similarity as sim_mod

            out = sim_mod.pq_codes(
                df,
                m=args.m,
                k_sub=args.k_sub,
                id_col=args.id_col,
                vec_col=args.vec_col,
            )
        elif args.command == "mixture-report":
            out = pipe_mod.mixture_report(
                df,
                args.budget_tokens,
                tau=args.tau,
                by=args.by,
                max_epochs=args.max_epochs,
            )
        elif args.command == "ivf-tune":
            from clarite_python_spark.operators import similarity as sim_mod

            n_probe, recall = sim_mod.tune_ivf_probe(
                df,
                recall_target=args.recall_target,
                k=args.k,
                n_queries=args.n_queries,
                n_lists=args.n_lists,
                id_col=args.id_col,
                vec_col=args.vec_col,
            )
            print(json.dumps({"n_probe": n_probe, "recall": recall}))
            return 0
        elif args.command == "compact":
            from clarite_python_spark.operators import layout as layout_mod

            res = layout_mod.compact(
                spark, args.data, args.output,
                target_file_mb=args.target_file_mb, sort_by=args.sort_by,
            )
            print(json.dumps(res))
            return 0
        elif args.command == "source-overlap":
            out = dedup_mod.source_overlap(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                by=args.by,
                granularity=args.granularity,
                n=args.ngram,
            )
        elif args.command == "remove-duplicate-spans":
            out = dedup_mod.remove_duplicate_spans(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                n=args.ngram,
                min_count=args.min_count,
            )
        elif args.command == "clean":
            verdicts = pipe_mod.clean_corpus(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                languages=tuple(args.languages),
                max_span_dup_frac=args.max_span_dup_frac,
                span_n=args.span_ngram,
                min_quality_prob=args.min_quality_prob,
            )
            if args.apply:
                out = df.join(
                    verdicts.where("keep").select(args.id_col), args.id_col, "inner"
                )
            else:
                out = verdicts
        _save_result(out, args.output)
        return 0

    if args.group == "events":
        from clarite_python_spark.operators import events as events_mod

        df = spark.read.parquet(args.data)
        if args.command == "funnel":
            fn = events_mod.funnel
            if args.counts:
                fn = events_mod.funnel_counts
            elif args.times:
                fn = events_mod.funnel_times
            out = fn(
                df,
                args.steps,
                user_col=args.user_col,
                type_col=args.type_col,
                ts_col=args.ts_col,
                max_span_seconds=args.max_span_seconds,
                max_events_per_user=args.max_events_per_user,
            )
        elif args.command == "retention":
            out = events_mod.retention_cohorts(
                df,
                user_col=args.user_col,
                ts_col=args.ts_col,
                period_days=args.period_days,
                approx=args.approx,
                rsd=args.rsd,
            )
        _save_result(out, args.output)
        return 0

    raise SystemExit(f"unknown command {cmd}")  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
