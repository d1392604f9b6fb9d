"""End-to-end corpus pipeline: the README quick-start flow run for real
against the driver testdata — jsonl IO, profiling, cleaning verdicts,
sub-document dedup, exact + fuzzy decontamination, epoch shuffle. Each
stage's output feeds the next, so this catches schema/contract drift
between operators that unit tests miss."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import dedup, pipeline, text
from clarite_python_spark.sources.io import from_jsonl, save_jsonl

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. land as jsonl (the common interchange format), read back
    save_jsonl(raw, f"{tmp_path}/raw", partition_by="source")
    docs = from_jsonl(
        spark,
        f"{tmp_path}/raw",
        schema="doc_id long, text string, lang string, n_chars long",
    )
    assert docs.count() == raw.count()

    # 2. profile
    profile = text.corpus_stats(docs).collect()
    assert sum(r["n_docs"] for r in profile) == raw.count()

    # 3. cleaning verdicts -> keep a permissive subset (synthetic corpus
    # fails strict Gopher rules, so gate only on dedup + repetition)
    verdicts = pipeline.clean_corpus(docs, languages=("en", "es", "de", "fr"))
    keep = verdicts.where("keep_dedup AND keep_repetition").select("doc_id")
    clean = docs.join(keep, "doc_id", "left_semi")
    n_clean = clean.count()
    assert 0 < n_clean <= raw.count()

    # 4. sub-document dedup (re-chunk on a frequent token)
    pd_out = dedup.paragraph_dedup(clean.select("doc_id", "text"), sep="batch")
    assert 0 < pd_out.count() <= n_clean
    assert pd_out.where("n_paras_kept > n_paras_total").count() == 0

    # 5. decontamination vs a benchmark split (first 25 ids)
    bench = docs.where("doc_id < 25")
    corpus = pd_out.join(bench.select("doc_id"), "doc_id", "left_anti")
    exact_flags = dedup.contamination(corpus, bench, n=5)
    fuzzy_flags = dedup.fuzzy_contamination(corpus, bench, threshold=0.5)
    flagged = (
        exact_flags.where("contaminated").select("doc_id")
        .unionByName(fuzzy_flags.select("doc_id"))
        .distinct()
    )
    final = corpus.join(flagged, "doc_id", "left_anti")
    assert final.count() <= corpus.count()

    # 6. epoch shuffle + write
    shards = pipeline.deterministic_shuffle(final, salt="e0", n_shards=4)
    save_jsonl(shards, f"{tmp_path}/out", compression="gzip", partition_by="shard")
    back = from_jsonl(spark, f"{tmp_path}/out")
    assert back.count() == final.count()
    assert back.select("shard").distinct().count() <= 4
    # shuffle is content-addressed: re-deriving the key from the id
    # reproduces the stored one
    rederived = back.withColumn(
        "k2",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("e0"))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    assert rederived.where("k2 != shuffle_key").count() == 0


def test_round7_selection_pipeline_composes(spark):
    """The round-7 assembly flow end-to-end: boilerplate line removal ->
    span decontamination -> perplexity gating -> quality-first token
    budget -> equal-token shards -> weighted subsample. Each stage
    consumes the previous stage's actual output schema."""
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. boilerplate lines (re-chunk on a frequent token, per source)
    ld = dedup.line_dedup(
        raw.select("doc_id", "source", "text"), sep="batch", scope_col="source"
    )
    docs = ld.select("doc_id", "source", "text").join(
        raw.select("doc_id", "lang", "n_chars"), "doc_id"
    )
    assert 0 < docs.count() <= raw.count()

    # 2. span-level decontamination vs the src0 "benchmark"
    bench = raw.where("source = 'src0'")
    dec = dedup.remove_contaminated_spans(
        docs.where("source != 'src0'"), bench, n=5
    )
    docs = (
        dec.where("text_cleaned != ''")
        .select("doc_id", F.col("text_cleaned").alias("text"))
        .join(raw.select("doc_id", "source", "lang", "n_chars"), "doc_id")
    )
    n_dec = docs.count()
    assert n_dec > 0

    # 3. perplexity gating: drop the tail bucket (approx = scale form)
    pb = pipeline.perplexity_buckets(docs, exact=False)
    docs = docs.join(
        pb.where("bucket_label != 'tail'").select("doc_id"), "doc_id", "left_semi"
    )
    n_gated = docs.count()
    assert 0 < n_gated < n_dec  # a tail exists and was cut

    # 4. quality-first token budget per source (n_chars as the score)
    picked = pipeline.token_budget_sample(docs, 2000, order_col="n_chars")
    assert 0 < picked.count() <= n_gated

    # 5. equal-token shards over the winners
    sharded = pipeline.shard_by_tokens(
        picked.drop("n_tokens", "cum_tokens"), 500
    )
    assert sharded.count() == picked.count()
    assert sharded.where("shard < 0").count() == 0

    # 6. deterministic weighted subsample of the sharded corpus
    ws = pipeline.weighted_sample(
        sharded.drop("cum_tokens"), 20, weight_col="n_tokens"
    )
    assert ws.count() == 20


# ---------------------------------------------------------------- round 9


def test_bm25_topk_matches_numpy_reference(spark):
    """Full BM25 replay in Python over the collected corpus."""
    import math

    from clarite_python_spark.operators.text import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = spark.createDataFrame(
        [(0, "hash join merge"), (1, "slow scan filter")],
        "query_id long, query string",
    )
    got = bm25_topk(docs, queries, k=5).collect()

    rows = docs.select("doc_id", "text").collect()
    corpus = {r["doc_id"]: r["text"].lower().split() for r in rows}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    k1, b = 1.2, 0.75

    def score(qtoks, toks):
        s = 0.0
        dl = len(toks)
        for t in set(qtoks):
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return round(s, 6)

    for qid, qtext in [(0, "hash join merge"), (1, "slow scan filter")]:
        want = sorted(
            ((score(qtext.split(), toks), did) for did, toks in corpus.items()),
            key=lambda x: (-x[0], x[1]),
        )
        want = [(d, s) for s, d in want if s > 0][:5]
        rows_q = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [(r["doc_id"], r["bm25"]) for r in rows_q] == want, qid


def test_bm25_topk_rare_term_outranks_common(spark):
    from clarite_python_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common common common"),
            (3, "other words entirely here"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "rare common")], "query_id long, query string")
    rows = bm25_topk(docs, q, k=3).collect()
    assert rows[0]["doc_id"] == 1  # the rare-term doc wins
    # doc 3 shares no query term: absent
    assert all(r["doc_id"] != 3 for r in rows)


def test_bm25_topk_validation(spark):
    import pytest as _pt

    from clarite_python_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "x")], "query_id long, query string")
    with _pt.raises(ValueError):
        bm25_topk(docs, q, k=0)
    with _pt.raises(ValueError):
        bm25_topk(docs, q, b=1.5)


# --------------------------------------------------------------- round 10


def test_bm25_stored_postings_row_for_row_parity(spark, tmp_path):
    """build_postings + bm25_topk(postings_dir=...) must equal the
    inline bm25_topk result row-for-row — the stored artifact is a pure
    amortization, never a semantic change."""
    from clarite_python_spark.operators.text import bm25_topk, build_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = spark.createDataFrame(
        [(0, "hash join merge"), (1, "slow scan filter"), (2, "group by key")],
        "query_id long, query string",
    )
    inline = bm25_topk(docs, queries, k=7).collect()

    pdir = str(tmp_path / "postings")
    build_postings(docs, pdir)
    stored = bm25_topk(None, queries, k=7, postings_dir=pdir).collect()

    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, stored), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, inline), key=lambda t: (t[0], t[2])
    )
    assert len(inline) > 0

    # second query batch against the SAME stored postings — no rebuild
    q2 = spark.createDataFrame([(9, "filter scan")], "query_id long, query string")
    again = bm25_topk(None, q2, k=3, postings_dir=pdir).collect()
    assert {r["query_id"] for r in again} == {9}


def test_bm25_postings_dir_validation(spark, tmp_path):
    from clarite_python_spark.operators.text import bm25_topk, build_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame([(0, "a")], "query_id long, query string")
    with pytest.raises(ValueError, match="corpus DataFrame or postings_dir"):
        bm25_topk(None, q)
    pdir = str(tmp_path / "p2")
    build_postings(docs, pdir)  # built with id_col='doc_id'
    with pytest.raises(ValueError, match="id column"):
        bm25_topk(None, q, postings_dir=pdir, id_col="other_id")


def test_rrf_fuse_hand_computed(spark):
    """RRF on two tiny ranked lists vs hand arithmetic: doc 10 is rank 1
    lexical + rank 2 dense, doc 20 rank 2 + rank 1 (tie on score, id
    breaks), doc 30 lexical-only, doc 40 dense-only."""
    from clarite_python_spark.operators.text import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2), (0, 30, 3)],
        "query_id long, doc_id long, rank int",
    )
    dense = spark.createDataFrame(
        [(0, 20, 1), (0, 10, 2), (0, 40, 3)],
        "query_id long, doc_id long, rank int",
    )
    rows = rrf_fuse(lex, dense, k=10).collect()
    got = {r["doc_id"]: (r["rank"], r["rrf"]) for r in rows}
    both = round(1 / 61 + 1 / 62, 6)
    assert got[10] == (1, both)  # same score as 20; lower id wins rank 1
    assert got[20] == (2, both)
    assert got[30] == (3, round(1 / 63, 6))
    assert got[40] == (4, round(1 / 63, 6))


def test_rrf_fuse_validation(spark):
    from clarite_python_spark.operators.text import rrf_fuse

    df = spark.createDataFrame([(0, 1, 1)], "query_id long, doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse(df, df, k=0)
    with pytest.raises(ValueError):
        rrf_fuse(df, df, rrf_k=0)
