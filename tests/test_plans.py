"""Physical-plan quality assertions: filters and projections written
through the operator API must reach the parquet scan (predicate pushdown
+ column pruning) — the properties that make the same code scale to
100 TB."""

from __future__ import annotations

import pytest

from clarite_python_spark.catalog import ClariteFrame
from clarite_python_spark.operators import modify

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def orders_cf(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
        "o_orderkey", "ID"
    )
    return ClariteFrame(df)


def test_rowfilter_pushes_predicate(orders_cf):
    out = modify.rowfilter(orders_cf, "o_totalprice", "gte", 100000.0)
    plan = _formatted_plan(out.df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_totalprice,100000.0)" in plan


def test_colfilter_prunes_scan(orders_cf):
    out = modify.colfilter(orders_cf, only=["o_totalprice", "o_orderstatus"])
    plan = _formatted_plan(out.df)
    # ReadSchema lists only the selected columns (+ID)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_totalprice" in read_schema and "o_orderstatus" in read_schema
    assert "o_orderdate" not in read_schema and "o_custkey" not in read_schema


def test_synthesized_id_has_no_global_window(spark, tmp_path):
    """index_col=None ID synthesis must rank within spark partitions
    (zipWithIndex-style), not sort the whole table in one partition
    (VERDICT r1 item 5): no SinglePartition exchange in the plan, and
    the ids are still exactly 0..n-1 in file order."""
    import pandas as pd

    from clarite_python_spark.sources import io as cio

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": range(100), "b": [f"s{i}" for i in range(100)]}).to_csv(
        p, index=False
    )
    cf = cio.from_csv(spark, str(p), index_col=None)
    plan = _formatted_plan(cf.df)
    assert "SinglePartition" not in plan
    rows = cf.df.orderBy("ID").collect()
    assert [r["ID"] for r in rows] == list(range(100))
    assert [r["a"] for r in rows] == list(range(100))  # file order preserved


def test_sessionized_plan_single_keyed_shuffle(spark):
    """sessionized() must compile to: null filters PUSHED to parquet, a
    3-column pruned scan, map-side partial aggregation, and exactly ONE
    exchange hash-partitioned on the session key (MergingSessions after
    the sort) — the plan that scales to clickstream sizes."""
    from clarite_python_spark.sources.io import load_testdata
    from clarite_python_spark.streaming.events import sessionized

    ev = load_testdata(spark, SF_DIR, ["events"])["events"]
    plan = _formatted_plan(sessionized(ev, gap="4 hours"))
    assert "IsNotNull(ts)" in plan and "IsNotNull(user_id)" in plan  # pushed
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_type" not in read_schema and "props" not in read_schema
    assert plan.count("(5) Exchange") + plan.count("Exchange hashpartitioning") >= 1
    # one data shuffle, keyed on user_id
    exchanges = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert len({e.split("[plan_id")[0] for e in exchanges}) == 1
    assert all("user_id" in e for e in exchanges)
    assert "MergingSessions" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_weighted_binomial_cells_agg_stays_jvm_side(spark):
    """The wbinomagg cell aggregation must be a pure unpivot -> hash
    aggregate (Expand + partial agg, no Python/Arrow eval nodes): the
    only Python in the weighted suffstats path is driver-side IRLS."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("ID"),
            (F.col("o_totalprice") > 150000).cast("double").alias("y"),
            F.col("o_orderstatus").alias("cov"),
            (F.col("o_orderkey") % 10).alias("__g"),
            F.lit(False).alias("__wmiss"),
            F.lit(1.0).alias("__w"),
            F.col("o_orderpriority").alias("v1"),
            F.col("o_orderdate").cast("string").alias("v2"),
        )
    )
    long = df.select(
        "y", "cov", "__g", "__wmiss", "__w",
        *[F.col(v).cast("string").alias(v) for v in ("v1", "v2")],
    ).unpivot(["y", "cov", "__g", "__wmiss", "__w"], ["v1", "v2"], "variable", "value")
    cells = long.groupBy("variable", "value", "y", "cov", "__g", "__wmiss").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__w").alias("__sw"),
        F.sum(F.col("__w") * F.col("__w")).alias("__sw2"),
    )
    plan = _formatted_plan(cells)
    assert "Expand" in plan  # the unpivot
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert bad not in plan


def test_chained_operators_fuse_into_one_scan(orders_cf):
    """QC chain (colfilter -> rowfilter) stays ONE scan with both the
    filter and the pruning applied — lazy frames fuse, unlike the
    reference's eager copy-per-operator pipeline."""
    step1 = modify.colfilter(orders_cf, only=["o_totalprice", "o_orderstatus"])
    step2 = modify.rowfilter(step1, "o_orderstatus", "eq", "O")
    plan = _formatted_plan(step2.df)
    # exactly one scan node (formatted output prints each node twice:
    # once in the tree, once in the details — count the file index)
    assert plan.count("InMemoryFileIndex") == 1
    assert "EqualTo(o_orderstatus,O)" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_custkey" not in read_schema


def test_bucketed_join_and_groupby_skip_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with no Exchange, and a
    groupBy on the bucket key skips its shuffle — the write-once /
    shuffle-never contract of save_bucketed."""
    from pyspark.sql import functions as F

    from clarite_python_spark.sources.io import save_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    save_bucketed(orders, "t_orders_b", "o_orderkey", 8, sort_cols="o_orderkey")
    save_bucketed(li, "t_lineitem_b", "l_orderkey", 8, sort_cols="l_orderkey")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.hint("merge").join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        agg_plan = (
            b.groupBy("l_orderkey")
            .agg(F.sum("l_quantity"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in agg_plan
        # and the result is still correct
        n = joined.count()
        ref = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == ref > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_save_enables_partition_pruning(spark, tmp_path):
    """save(partition_by=...) lays out hive partitions; a filter on the
    partition column reaches the scan as PartitionFilters, pruning
    directories before IO."""
    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.sources.io import from_parquet, save

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumnRenamed(
        "doc_id", "ID"
    )
    dest = str(tmp_path / "docs_by_source")
    save(ClariteFrame(docs), dest, partition_by="source")

    import os

    assert any(d.startswith("source=") for d in os.listdir(dest))
    cf = from_parquet(spark, dest)
    q = cf.df.where("source = 'src3'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "src3" in plan
    assert q.count() == docs.where("source = 'src3'").count() > 0


def test_partitioned_save_applies_to_tsv_too(spark, tmp_path):
    import os

    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.sources.io import save

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumnRenamed(
        "doc_id", "ID"
    )
    dest = str(tmp_path / "docs_tsv_by_source")
    save(ClariteFrame(docs), dest, fmt="tsv", partition_by="source")
    assert any(d.startswith("source=") for d in os.listdir(dest))


def test_contamination_broadcasts_benchmark(spark):
    """The corpus side of the contamination join must not shuffle: the
    benchmark n-gram set rides a broadcast, and the only Exchange in the
    plan is the per-doc count aggregation keyed on the id."""
    from clarite_python_spark.operators.dedup import contamination

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.where("source = 'src0'")
    corpus = docs.where("source != 'src0'")
    plan = _formatted_plan(contamination(corpus, bench, n=5))
    assert "BroadcastExchange" in plan
    # the collision join itself is broadcast, never sort-merge: the only
    # shuffles are the benchmark-side distinct (tiny set) and the
    # per-doc count ("- Exchange (" matches shuffles, not the broadcast)
    assert "SortMergeJoin" not in plan
    # keyed shuffles only: benchmark-side distinct + per-doc count (the
    # round-robin _rebalance exchange is a local-split artifact)
    assert plan.count("Arguments: hashpartitioning") <= 2, plan[:2000]


def test_paragraph_dedup_two_keyed_shuffles(spark):
    """paragraph_dedup promises exactly two keyed shuffles (md5 window +
    doc reassembly) and no join."""
    from clarite_python_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    plan = _formatted_plan(paragraph_dedup(docs, sep="batch"))
    assert plan.count("- Exchange (") == 2, plan[:2000]
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_gopher_rules_is_scan_plus_project(spark):
    """gopher_rules is one codegen projection: no exchange, no join, no
    Python (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    from clarite_python_spark.operators.text import gopher_rules

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _formatted_plan(gopher_rules(docs))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "* Project" in plan  # '*' marks whole-stage-codegen nodes


def test_duplicate_spans_two_keyed_shuffles_no_python(spark):
    """duplicate_spans promises: window text never shuffles (the explode
    emits hashes), exactly two keyed shuffles (gram-hash count window +
    doc-id lag/agg), and no Python in the plan. The per-doc stats branch
    must not re-evaluate the window-hash lambda (xxhash64 appears in one
    Project only)."""
    from clarite_python_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    plan = _formatted_plan(duplicate_spans(docs, n=16))
    assert plan.count("hashpartitioning") >= 2
    assert "EvalPython" not in plan
    # corpus-wide counts are a groupBy (map-side partial agg absorbs
    # boilerplate-gram skew) + semi-join of the small duplicated-gram
    # set — NOT a count window keyed on the hash (no partial agg, heavy
    # key funnels through one reducer)
    assert "LeftSemi" in plan
    import re as _re

    # the count and probe branches each evaluate the window hashes (a
    # deliberate 2x: the probe side stays shuffle-free when AQE
    # broadcasts the dup-gram set); the stats branch derives n_windows
    # arithmetically, so exactly two plan nodes carry the hash lambda
    nodes_with_hash = sum("xxhash64" in blk for blk in _re.split(r"\n\(\d+\) ", plan))
    assert nodes_with_hash == 2, plan[:2000]


def test_round6_operators_no_cartesian_no_python(spark):
    """Round-6 operators: every plan must stay JVM-side (no
    BatchEvalPython/ArrowEvalPython in the data path) and contain no
    cartesian/broadcast-nested-loop product."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators import dedup, pipeline, text
    from clarite_python_spark.operators import events as events_ops
    from clarite_python_spark.sources.io import load_testdata

    t = load_testdata(spark, SF_DIR, ["documents", "events"])
    docs, ev = t["documents"], t["events"]
    plans = {
        "domain_cap": pipeline.domain_cap(docs, 15, prefilter_margin=3.0),
        "temperature_mixture": pipeline.temperature_mixture(docs, 0.5, 300),
        "quality_classifier": text.quality_classifier(docs),
        "tfidf": text.tfidf_top_terms(docs),
        "bigram": text.bigram_logprob(docs),
        "remove_spans": dedup.remove_duplicate_spans(docs, n=16),
        "source_overlap": dedup.source_overlap(docs, granularity="ngram"),
        "funnel": events_ops.funnel(ev, ["signup", "view", "purchase"]),
        "retention": events_ops.retention_cohorts(ev),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in ("temperature_mixture", "tfidf", "bigram"):
            # temperature_mixture / tfidf / bigram legitimately crossJoin
            # a ONE-ROW broadcast (the global normalizer Z / the lazy
            # doc-count N / the lazy vocabulary size V) — the
            # scalar-broadcast idiom, not a product over data
            assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_funnel_single_user_shuffle(spark):
    from clarite_python_spark.operators import events as events_ops
    from clarite_python_spark.sources.io import load_testdata

    ev = load_testdata(spark, SF_DIR, ["events"])["events"]
    plan = (
        events_ops.funnel(ev, ["signup", "view", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one keyed exchange (the user groupBy) — N stages must NOT become
    # N cascaded min-join shuffles
    assert plan.count("Exchange") == 1


def test_quality_classifier_zero_exchange(spark):
    from clarite_python_spark.operators import text
    from clarite_python_spark.sources.io import load_testdata

    docs = load_testdata(spark, SF_DIR, ["documents"])["documents"]
    plan = (
        text.quality_classifier(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 0  # pure codegen projection


def test_tfidf_plan_build_triggers_no_job(spark):
    """tfidf_top_terms must be fully lazy: N rides as a broadcast 1-row
    count aggregate, so CONSTRUCTING (and analyzing) the plan runs zero
    Spark jobs — the eager distinct().count() it replaces forced a full
    id-column scan per composed pipeline at plan-build time."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators import text
    from clarite_python_spark.sources.io import load_testdata

    docs = load_testdata(spark, SF_DIR, ["documents"])["documents"]
    docs.schema  # settle any read-side analysis first

    def n_jobs() -> int:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()

    before = n_jobs()
    plan = text.tfidf_top_terms(docs)
    plan.schema  # force full analysis of the built plan
    bigram = text.bigram_logprob(docs)  # same idiom: V via broadcast agg
    bigram.schema
    unigram = text.unigram_logprob(docs)  # denominator via broadcast agg
    unigram.schema
    assert n_jobs() == before
    # and the idf constant is genuinely in the plan, not a driver literal
    assert plan.where(F.col("rank") == 1).limit(1).count() == 1
    assert bigram.limit(1).count() == 1


def test_round7_operators_no_cartesian_no_python(spark):
    """Round-7 operators: JVM-side plans, no cartesian products; the
    perplexity approx path additionally must not sort, and
    weighted_sample must be a TakeOrderedAndProject (no global sort)."""
    from clarite_python_spark.operators import dedup, pipeline
    from clarite_python_spark.sources.io import load_testdata

    docs = load_testdata(spark, SF_DIR, ["documents"])["documents"]
    plans = {
        "line_dedup": dedup.line_dedup(docs, sep="batch", scope_col="source"),
        "perplexity_exact": pipeline.perplexity_buckets(docs),
        "perplexity_approx": pipeline.perplexity_buckets(docs, exact=False),
        "weighted_sample": pipeline.weighted_sample(docs, 50, weight_col="n_chars"),
        "shard_by_tokens": pipeline.shard_by_tokens(docs, 2000),
        "split_leakage": pipeline.split_leakage(docs, {"a": 0.5, "b": 0.5}),
        "remove_contaminated_spans": dedup.remove_contaminated_spans(
            docs.where("source != 'src0'"), docs.where("source = 'src0'"), n=5
        ),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in ("perplexity_exact", "perplexity_approx"):
            # perplexity's unigram scorer carries its smoothing
            # denominator as the documented ONE-ROW scalar broadcast
            assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name

    approx = plans["perplexity_approx"]._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in approx  # no per-language ntile sort at scale
    ws = plans["weighted_sample"]._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in ws
    assert ws.count("Exchange") == 0  # top-n merges heads, never shuffles


def test_round7_session3_operators_plan_shapes(spark):
    """simhash/keep-policy/novelty additions: JVM-side plans, no
    cartesian products; simhash_candidates carries the fingerprint with
    the bucket rows (no join back to the corpus — exactly one Exchange
    pair for the band shuffle in the pair path)."""
    from clarite_python_spark.operators import dedup, text
    from clarite_python_spark.sources.io import load_testdata

    docs = load_testdata(spark, SF_DIR, ["documents"])["documents"]
    plans = {
        "simhash_candidates": dedup.simhash_candidates(docs),
        "simhash_dedup": dedup.simhash_dedup(docs),
        "incremental_simhash": dedup.incremental_simhash_dedup(
            docs.where("doc_id >= 25"), docs.where("doc_id < 25")
        ),
        "normalize_text": text.normalize_text(docs),
        "keep_longest": dedup.minhash_dedup(
            docs, keep_col="n_chars", transitive=True
        ),
        "ngram_novelty": text.ngram_novelty(docs),
        "dataset_card": text.dataset_card(docs),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name

    # the candidate path never joins back to the corpus for fingerprints:
    # no SortMergeJoin/BroadcastHashJoin anywhere in its plan
    cand = plans["simhash_candidates"]._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in cand and "BroadcastHashJoin" not in cand


def test_round9_pq_plan_shapes(spark):
    """PQ encoding must be a zero-exchange codegen projection (codebooks
    inline as literals — no shuffle, no Python, no join); pq_topk /
    ivf_pq_topk must broadcast the query side and never fall back to a
    cartesian/nested-loop product; ivf_pq_topk's pruning structure is a
    BroadcastHashJoin on the list id."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = similarity.pq_codes(emb, m=4, k_sub=8)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan, bad

    for name, df in {
        "pq_topk": similarity.pq_topk(emb, q, k=5, m=4, k_sub=8),
        "ivf_pq_topk": similarity.ivf_pq_topk(
            emb, q, k=5, n_lists=8, n_probe=2, m=4, k_sub=8
        ),
    }.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    ivf_plan = (
        similarity.ivf_pq_topk(emb, q, k=5, n_lists=8, n_probe=2, m=4, k_sub=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in ivf_plan


def test_round9_retrieval_plan_shapes(spark):
    """bm25_topk and fuzzy_join must never fall back to a cartesian or
    nested-loop product (the whole point of their blocking structures),
    and must keep Python off the hot path."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.joins import fuzzy_join
    from clarite_python_spark.operators.text import bm25_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = spark.createDataFrame(
        [(0, "hash join merge")], "query_id long, query string"
    )
    names = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_name").distinct()
    plans = {
        "bm25_topk": bm25_topk(docs, q, k=5),
        "fuzzy_join": fuzzy_join(names, names, "p_name", "p_name", max_distance=2),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    # fuzzy_join's banding must be a real equi-join, never nested-loop;
    # bm25 legitimately carries ONE BroadcastNestedLoopJoin — the 1-row
    # N/avgdl scalar broadcast (the established crossJoin idiom)
    fj = plans["fuzzy_join"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in fj
    bm = plans["bm25_topk"]._jdf.queryExecution().executedPlan().toString()
    assert bm.count("BroadcastNestedLoopJoin") <= 1


def test_q5_star_join_all_hash_joins(spark):
    """The six-table Q5 star join must resolve to hash joins only —
    no cartesian, no nested loop, no Python. (At gate scale AQE
    broadcasts everything incl. orders; at 100 TB the fact-fact join
    degrades gracefully to a shuffled join, never to a product.)"""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q5_local_supplier_volume"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 5
    # Explicit broadcast hints only on the CONSTANT-size dims (nation=25
    # rows, region=5). customer/supplier scale with SF — forcing them
    # broadcast would be the exact 100-TB scale-killer this query exists
    # to demonstrate avoiding; AQE picks broadcast for them at gate scale
    # on its own.
    logical = df._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 2


def test_round10_operators_plan_shapes(spark):
    """Round-10 additions: table_diff is ONE join with the compare
    subset pruned into the scan; rank_eval is all-JVM with no cartesian;
    mmr_rerank's only Python stage is the documented bounded
    FlatMapGroupsInPandas over per-query candidate groups (its candidate
    generation keeps cosine_topk's broadcast plan); connected_components
    emits no Python stages."""
    from clarite_python_spark.operators import evaluation, graph, similarity
    from clarite_python_spark.sources.io import load_testdata

    t = load_testdata(spark, SF_DIR, ["orders", "embeddings", "customer"])
    orders, emb, cust = t["orders"], t["embeddings"], t["customer"]
    from pyspark.sql import functions as F

    diff = evaluation.table_diff(
        orders.where("o_orderkey % 2 = 0"),
        orders.where("o_orderkey % 3 = 0"),
        keys=["o_orderkey"],
        compare=["o_totalprice"],
    )
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Join") <= 2  # one SMJ (name appears in operator + condition)
    fplan = _formatted_plan(diff)
    read_schema = [ln for ln in fplan.splitlines() if "ReadSchema" in ln]
    for ln in read_schema:  # compare-subset pruning reaches the scan
        assert "o_orderpriority" not in ln and "o_orderdate" not in ln

    qvec = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = similarity.cosine_topk(emb, qvec, k=5)
    qrels = qvec.select("query_id", F.lit(3).alias("vec_id"), F.lit(1.0).alias("rel"))
    ev = evaluation.rank_eval(res, qrels, k=5, doc_col="vec_id")
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    mmr = similarity.mmr_rerank(emb, qvec, k=3, fetch_k=8)
    plan = mmr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python

    edges = cust.where("c_custkey % 5 != 0").select(
        F.col("c_custkey").alias("src"), (F.col("c_custkey") - 1).alias("dst")
    )
    cc = graph.connected_components(edges)
    plan = cc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round11_binary_family_plan_shapes(spark):
    """Round-11 binary family: quantize_binary is a pure projection (no
    exchange, no Python); hamming_topk keeps cosine_topk's broadcast
    plan (the ONE BroadcastNestedLoopJoin is the tiny-query-set
    broadcast, never a corpus cartesian); binary_rerank adds only the
    id-keyed shortlist re-fetch join; nothing drops to Python."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators import similarity
    from clarite_python_spark.sources.io import load_testdata

    emb = load_testdata(spark, SF_DIR, ["embeddings"])["embeddings"]
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    bplan = similarity.quantize_binary(emb, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in bplan and "Join" not in bplan
    assert "BatchEvalPython" not in bplan and "ArrowEvalPython" not in bplan

    hplan = similarity.hamming_topk(emb, q, k=5, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in hplan
    assert hplan.count("BroadcastNestedLoopJoin") == 1  # broadcast query set
    assert "BatchEvalPython" not in hplan and "ArrowEvalPython" not in hplan

    rplan = similarity.binary_rerank(emb, q, k=3, shortlist_k=20, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan


def test_round12_knn_graph_no_broadcast_no_python(spark):
    """knn_graph is the corpus×corpus path: NEITHER side may be
    broadcast (both are SF-proportional) — the cell equi-join must be a
    shuffle join — and the stage-1 per-(cell, vector) window must reuse
    the join's hash partitioning (no exchange between the join and the
    first window; only the stage-2 global top-k re-shuffles, moving
    O(N·k) candidate rows, not O(pairs))."""
    from clarite_python_spark.operators import similarity
    from clarite_python_spark.sources.io import load_testdata

    emb = load_testdata(spark, SF_DIR, ["embeddings"])["embeddings"]
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # AQE off for a stable initial plan; auto-broadcast off because the
    # assertion is about the CODE adding no broadcast hint — the
    # planner's size-threshold pick at sf0.001 is legitimate and
    # degrades to shuffle at scale, a hint would not
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        g = similarity.knn_graph(emb, k=3, n_lists=4, n_probe=2, sample_size=100)
        plan = g._jdf.queryExecution().executedPlan().toString()
        gj = similarity.knn_graph(
            emb, k=3, n_lists=4, n_probe=2, sample_size=100, score_impl="join"
        )
        jplan = gj._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    # default (vectorized cell scorer): one cogroup on the cell id in
    # place of the join+window — still no broadcast of either side, no
    # cartesian, no row-at-a-time Python (the cogroup kernel is the
    # sanctioned vectorized form, guide §4.2)
    for p in (plan, jplan):
        assert "BroadcastExchange" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p
    assert "FlatMapCoGroupsInPandas" in plan
    # join variant keeps the original shape: shuffle equi-join, no
    # Python anywhere, stage-1 window reuses the join's partitioning
    # (sort only, no exchange between them)
    assert "ArrowEvalPython" not in jplan and "FlatMapCoGroupsInPandas" not in jplan
    assert "SortMergeJoin" in jplan or "ShuffledHashJoin" in jplan
    lines = jplan.splitlines()
    w1 = max(
        i for i, ln in enumerate(lines)
        if "Window" in ln and "__list" in ln
    )
    join = min(i for i, ln in enumerate(lines) if "Join" in ln)
    assert all("Exchange" not in ln for ln in lines[w1:join])
