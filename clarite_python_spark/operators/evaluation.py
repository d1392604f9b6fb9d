"""Pipeline QA / evaluation operators: retrieval metrics and snapshot
diffing.

These close two loops the rest of the engine opened:

* the retrieval family (``bm25_topk``, ``cosine_topk``, the PQ/IVF ANN
  stack, ``rrf_fuse``) produces ranked lists — :func:`rank_eval` scores
  them against relevance judgments (nDCG@k / recall@k / precision@k /
  MRR@k), which is how you actually tune ``n_probe`` / ``bands`` /
  fusion weights;
* incremental ingest (``incremental_dedup``, ``band_table`` state)
  implies successive snapshots of a table — :func:`table_diff` reports
  exactly what changed between two of them, keyed and column-wise.

No reference counterpart (HallLab/clarite-python has no retrieval or
snapshot surface); extension-surface completeness for the LLM-data
pipeline. All math is JVM-side ``pyspark.sql.functions`` — no Python
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rank_eval", "rank_eval_macro", "save_snapshot", "table_diff"]


def rank_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Score ranked retrieval results against relevance judgments.

    Parameters
    ----------
    results : (query_id, doc_id, rank) — rank 1-based; rows with
        ``rank > k`` are ignored (standard @k cutoff).
    qrels : (query_id, doc_id, rel) — graded relevance, ``rel > 0``
        means relevant. Binary judgments just use rel=1. One row per
        (query, doc) is the contract (the TREC qrels format): duplicate
        judgments would fan out the join and inflate hits/DCG —
        ``dropDuplicates(["query_id", "doc_id"])`` upstream if unsure.
    k : the cutoff for every metric.

    Returns one row per query id appearing in EITHER input:
    ``(query_id, n_rel, hits, precision, recall, mrr, ndcg)`` —

    * ``n_rel``   — total relevant docs judged for the query,
    * ``hits``    — relevant docs retrieved within the top-k,
    * ``precision`` = hits / k, ``recall`` = hits / n_rel,
    * ``mrr``     — 1 / rank of the first relevant hit (0 if none),
    * ``ndcg``    — graded DCG with the (2^rel - 1) / log2(rank + 1)
      gain, normalized by the ideal DCG of the query's top-k judgments.

    All ratios rounded to 6 decimals. Scale: one shuffle per side keyed
    on the query id (the equi-join on (query, doc) and both aggs share
    it); qrels is typically tiny next to the corpus — the join input is
    the already-cut top-k results, never the corpus.
    """
    r = results.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("rank"),
    )
    j = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rel_col).cast("double").alias("rel"),
    )
    hit = (
        r.join(j, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
        .groupBy("query_id")
        .agg(
            F.sum((F.col("rel") > 0).cast("long")).alias("hits"),
            # only rel>0 carries gain: an explicit negative judgment
            # (some qrels mark spam rel=-1) must not SUBTRACT dcg
            F.sum(
                F.when(
                    F.col("rel") > 0,
                    (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                    / F.log2(F.col("rank") + F.lit(1.0)),
                ).otherwise(F.lit(0.0))
            ).alias("dcg"),
            F.coalesce(
                F.max(F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rank"))),
                F.lit(0.0),
            ).alias("mrr"),
        )
    )
    # rank ALL judgments (rel desc) but only rel>0 rows contribute gain
    # and count — a query judged entirely non-relevant (TREC qrels carry
    # explicit rel=0 rows) still yields an output row with zeroed
    # metrics instead of vanishing from the macro-average denominator
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        j.withColumn("irank", F.row_number().over(w))
        .groupBy("query_id")
        .agg(
            F.sum((F.col("rel") > 0).cast("long")).alias("n_rel"),
            F.sum(
                F.when(
                    (F.col("rel") > 0) & (F.col("irank") <= k),
                    (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                    / F.log2(F.col("irank") + F.lit(1.0)),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
    )
    out = hit.join(ideal, "query_id", "full_outer").select(
        "query_id",
        F.coalesce(F.col("n_rel"), F.lit(0).cast("long")).alias("n_rel"),
        F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
        F.round(
            F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.lit(float(k)), 6
        ).alias("precision"),
        F.round(
            F.when(
                F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                / F.col("n_rel"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("recall"),
        F.round(F.coalesce(F.col("mrr"), F.lit(0.0)), 6).alias("mrr"),
        F.round(
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
    )
    return out.orderBy("query_id")


def rank_eval_macro(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Macro-averaged retrieval metrics — the single-row summary a tuning
    loop or leaderboard actually reports: the unweighted mean of every
    per-query :func:`rank_eval` metric (each query counts once, the TREC
    macro convention; queries with zero judged-relevant docs contribute
    their zeroed metrics rather than being dropped — rank_eval already
    guarantees that).

    Returns one row: (n_queries, k, precision, recall, mrr, ndcg), means
    rounded to 6 decimals. Cost: rank_eval's single keyed shuffle plus
    one global agg over O(#queries) rows.
    """
    per_q = rank_eval(results, qrels, k, query_col, doc_col, rank_col, rel_col)
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(int(k)).cast("int").alias("k"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
    )


def save_snapshot(df: DataFrame, path: str) -> None:
    """Persist a table snapshot for a later :func:`table_diff`
    (``snapshot_dir=path``) — the stored-state twin of the dedup
    family's ``band_table`` and the text family's ``build_postings``:
    the daily-ingest QA loop saves today's table once, and tomorrow's
    run diffs the fresh frame against it without recomputing or
    re-reading the producing pipeline.

    Layout under ``path``: ``data/`` (the rows, parquet). Plain parquet
    on purpose — the snapshot is readable by anything, and
    ``table_diff`` needs nothing beyond the rows (keys/compare are the
    DIFF's parameters, not the snapshot's)."""
    df.write.mode("overwrite").parquet(f"{path}/data")


def table_diff(
    old: DataFrame,
    new: DataFrame | None = None,
    keys: list[str] | None = None,
    compare: list[str] | None = None,
    include_same: bool = False,
    snapshot_dir: str | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table.

    Parameters
    ----------
    old, new : the two snapshots; must both contain ``keys`` and the
        ``compare`` columns.
    keys : join key columns (a row is "the same row" iff keys match;
        null keys match null keys).
    compare : value columns to check for changes; default = every
        shared non-key column, in ``old``'s column order.
    include_same : also emit unchanged matched rows (status 'same').
    snapshot_dir : stored-state form — ``table_diff(df, keys=...,
        snapshot_dir=path)`` diffs ``df`` (as the NEW side) against the
        snapshot :func:`save_snapshot` wrote at ``path`` (as the OLD
        side). Mutually exclusive with ``new``; reading the snapshot is
        one parquet scan, so the daily QA loop pays exactly the same
        single full-outer key shuffle as the two-frame form.

    Returns ``keys… , status, n_changed, changed_cols`` where status in
    {'added','removed','changed'[,'same']}, ``n_changed`` counts
    differing compare columns (null-safe inequality) and
    ``changed_cols`` joins their names with ',' in ``compare`` order.

    Scale: one full-outer shuffle join on the keys — the minimum any
    snapshot diff pays. Comparisons are null-safe JVM expressions inside
    the join projection; no second pass, no row hashing (so wide tables
    can restrict ``compare`` to the columns that matter and the scan
    prunes the rest).
    """
    if (new is None) == (snapshot_dir is None):
        raise ValueError(
            "table_diff takes exactly one of new= (two-frame form) or "
            "snapshot_dir= (stored-snapshot form)"
        )
    if snapshot_dir is not None:
        new = old
        old = new.sparkSession.read.parquet(f"{snapshot_dir}/data")
    if not keys:
        raise ValueError(
            "table_diff needs at least one key column — an empty key "
            "list would degenerate to an unconditioned full-outer join"
        )
    if compare is None:
        keyset = set(keys)
        newcols = set(new.columns)
        compare = [
            c for c in old.columns if c not in keyset and c in newcols
        ]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in keys],
        *[F.col(c).alias(f"__ov_{c}") for c in compare],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in keys],
        *[F.col(c).alias(f"__nv_{c}") for c in compare],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for c in keys:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")

    diffs = [
        (~F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))).alias(f"__d_{c}")
        for c in compare
    ]
    joined = joined.select("*", *diffs)
    n_changed = None
    for c in compare:
        t = F.col(f"__d_{c}").cast("int")
        n_changed = t if n_changed is None else (n_changed + t)
    if n_changed is None:
        n_changed = F.lit(0)
    status = (
        F.when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__in_old").isNull(), F.lit("added"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__o_{c}"), F.col(f"__n_{c}")).alias(c)
            for c in keys
        ],
        status.alias("status"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
            n_changed,
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_changed"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
            F.concat_ws(
                ",",
                *[
                    F.when(F.col(f"__d_{c}"), F.lit(c))
                    for c in compare
                ],
            ),
        )
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    if not include_same:
        out = out.where(F.col("status") != "same")
    return out
