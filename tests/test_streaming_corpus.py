"""Streaming twin of the clean_corpus composite (streaming/corpus.py):
single-batch backfills equal the batch decision table exactly; the
cross-batch fingerprint state flips keep_dedup for re-arrivals."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.pipeline import clean_corpus
from clarite_python_spark.sources.io import load_testdata
from clarite_python_spark.streaming.corpus import stream_clean_corpus

SF_DIR = "/root/testdata/sf0.001"
KW = dict(languages=("en", "unknown"))


@pytest.fixture(scope="module")
def docs(spark):
    return load_testdata(spark, SF_DIR, ["documents"])["documents"]


def _collect(spark, out_dir):
    cols = [
        "doc_id",
        "keep_dedup",
        "keep_quality",
        "keep_repetition",
        "keep_language",
        "keep",
    ]
    return (
        spark.read.parquet(out_dir)
        .select(*cols)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_stream_clean_corpus_single_batch_equals_batch_op(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    q = stream_clean_corpus(spark, src, out, state, **KW)
    q.awaitTermination(180)
    got = _collect(spark, out)
    want = (
        clean_corpus(spark.read.parquet(src), **KW)
        .select(got.columns.tolist())
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_stream_clean_corpus_cross_batch_dedup(spark, docs, tmp_path):
    """Replaying the SAME corpus again must flip keep_dedup (and keep)
    to False for every document of the second pass: their fingerprints
    are in the state table from pass one."""
    src = str(tmp_path / "src2")
    os.makedirs(src, exist_ok=True)
    pdf = docs.toPandas().sort_values("doc_id")
    # pass one = the corpus; pass two = the same texts with shifted ids
    pdf.to_parquet(os.path.join(src, "a.parquet"))
    rep = pdf.copy()
    rep["doc_id"] = rep["doc_id"] + 1_000_000
    out, state = str(tmp_path / "out2"), str(tmp_path / "state2")
    q = stream_clean_corpus(spark, src, out, state, **KW)
    q.awaitTermination(180)
    f = os.path.join(src, "b.parquet")
    rep.to_parquet(f)
    os.utime(f, (time.time() + 5, time.time() + 5))
    q2 = stream_clean_corpus(spark, src, out, state, **KW)
    q2.awaitTermination(180)
    got = _collect(spark, out)
    first = got[got.doc_id < 1_000_000]
    second = got[got.doc_id >= 1_000_000]
    assert len(first) == len(second) == len(pdf)
    # pass one keeps the batch op's verdicts; pass two is all-dup
    assert first["keep_dedup"].sum() == (
        clean_corpus(docs, **KW).where("keep_dedup").count()
    )
    assert not second["keep_dedup"].any()
    assert not second["keep"].any()
    # non-dedup stages are per-document and unchanged by state
    for col in ("keep_quality", "keep_repetition", "keep_language"):
        assert (
            first[col].to_numpy() == second.sort_values("doc_id")[col].to_numpy()
        ).all()


def test_stream_contamination_equals_batch_any_batching(spark, docs, tmp_path):
    from clarite_python_spark.operators.dedup import contamination
    from clarite_python_spark.streaming.dedup import stream_contamination

    # benchmark = 5 real documents' texts -> guaranteed collisions
    bench = docs.orderBy("doc_id").limit(5).select("text")
    src = str(tmp_path / "csrc")
    # three files so maxFilesPerTrigger=1 forces a multi-batch replay
    docs.repartition(3).write.mode("overwrite").parquet(src)

    want = (
        contamination(spark.read.parquet(src), bench, n=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert want["contaminated"].any() and not want["contaminated"].all()

    for tag, mfpt in (("one", None), ("multi", 1)):
        out = str(tmp_path / f"cout_{tag}")
        ckpt = str(tmp_path / f"cckpt_{tag}")
        q = stream_contamination(
            spark, src, bench, out, ckpt, n=5, max_files_per_trigger=mfpt
        )
        q.awaitTermination(180)
        got = (
            spark.read.parquet(out)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_stream_neardup_single_batch_equals_batch_minhash_dedup(spark, docs, tmp_path):
    """One availableNow batch: nothing kept yet, so the stream reduces to
    batch minhash_dedup exactly (same ids survive)."""
    from clarite_python_spark.operators.dedup import minhash_dedup
    from clarite_python_spark.streaming.dedup import stream_neardup

    src = str(tmp_path / "nd_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    out, ckpt = str(tmp_path / "nd_out"), str(tmp_path / "nd_ckpt")
    q = stream_neardup(spark, src, out, ckpt)
    q.awaitTermination(180)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    want = sorted(
        r["doc_id"] for r in minhash_dedup(spark.read.parquet(src)).collect()
    )
    assert got == want and len(got) > 0


def test_stream_neardup_cross_batch_drops_rearrivals(spark, tmp_path):
    """A doc near-duplicating a PREVIOUS batch's survivor is dropped; a
    genuinely new doc passes. State is the kept corpus itself."""
    from clarite_python_spark.streaming.dedup import stream_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    other = "one two three four five six seven eight nine ten " * 4
    src = str(tmp_path / "x_src")
    out, ckpt = str(tmp_path / "x_out"), str(tmp_path / "x_ckpt")

    spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup(spark, src, out, ckpt)
    q.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}

    # batch 2: near-dup of kept doc 1 (dropped) + fresh doc (kept)
    spark.createDataFrame(
        [(10, base + "tail tweak"), (11, other)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup(spark, src, out, ckpt)
    q.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 11}


def test_stream_neardup_band_dir_same_verdicts(spark, tmp_path):
    """The persisted band-table fast path (band_dir) makes identical
    keep/drop decisions as the re-band-every-batch default, and the band
    dir accumulates exactly the kept docs' band rows."""
    from clarite_python_spark.operators.dedup import band_table
    from clarite_python_spark.streaming.dedup import stream_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    other = "one two three four five six seven eight nine ten " * 4
    batches = [
        [(1, base), (2, other)],
        [(10, base + "tiny tweak"), (11, "fresh unseen words entirely new content")],
    ]
    src_a, src_b = str(tmp_path / "a_src"), str(tmp_path / "b_src")
    kept = {}
    for tag, src, extra in [("plain", src_a, {}), ("banded", src_b, {"band_dir": str(tmp_path / "bands")})]:
        out, ckpt = str(tmp_path / f"{tag}_out"), str(tmp_path / f"{tag}_ckpt")
        for batch in batches:
            spark.createDataFrame(batch, "doc_id long, text string").coalesce(
                1
            ).write.mode("append").parquet(src)
            q = stream_neardup(spark, src, out, ckpt, **extra)
            q.awaitTermination(180)
        kept[tag] = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept["plain"] == kept["banded"] == [1, 2, 11]

    kept_docs = spark.read.parquet(str(tmp_path / "banded_out"))
    band_rows = spark.read.parquet(str(tmp_path / "bands"))
    want = band_table(kept_docs)
    assert sorted(map(tuple, band_rows.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_neardup_seen_bands_parity(spark):
    """incremental_neardup(seen_bands=band_table(seen)) == the re-banding
    default, row for row."""
    from clarite_python_spark.operators.dedup import band_table, incremental_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    seen = spark.createDataFrame(
        [(1, base), (2, "history doc with other tokens in it " * 3)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base + "suffix"), (11, "wholly new content never seen before")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, incremental_neardup(new, seen).collect()))
    b = sorted(
        map(tuple, incremental_neardup(new, seen, seen_bands=band_table(seen)).collect())
    )
    assert a == b
    assert [r[0] for r in a] == [11]


def test_stream_simhash_dedup_parity_and_state(spark, docs, tmp_path):
    """Single-batch backfill == batch simhash_dedup exactly; cross-batch
    re-arrivals drop against the fingerprint state; fp_dir holds exactly
    the kept docs' fingerprints."""
    from clarite_python_spark.operators.dedup import (
        simhash_dedup,
        simhash_fingerprints,
    )
    from clarite_python_spark.streaming.dedup import stream_simhash_dedup

    src = str(tmp_path / "sh_src")
    out, ckpt, fpd = (
        str(tmp_path / "sh_out"), str(tmp_path / "sh_ckpt"), str(tmp_path / "sh_fp")
    )
    docs.coalesce(1).write.mode("append").parquet(src)
    q = stream_simhash_dedup(spark, src, out, ckpt, fpd)
    q.awaitTermination(180)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    want = sorted(r["doc_id"] for r in simhash_dedup(spark.read.parquet(src)).collect())
    assert got == want and len(got) > 0

    # fp state == fingerprints of exactly the kept docs
    kept_docs = spark.read.parquet(out)
    fps = {(r["doc_id"], r["fp"]) for r in spark.read.parquet(fpd).collect()}
    want_fps = {(r["doc_id"], r["fp"]) for r in simhash_fingerprints(kept_docs).collect()}
    assert fps == want_fps

    # batch 2: a scale-invariant twin of a KEPT doc drops; fresh doc passes
    base_kept = kept_docs.orderBy("doc_id").limit(1).collect()[0]
    b2 = spark.createDataFrame(
        [(10_000_000, base_kept["text"] + " " + base_kept["text"]),
         (10_000_001, "wholly fresh words never seen in this corpus before now")],
        "doc_id long, text string",
    ).withColumns({c: F.lit(None).cast(kept_docs.schema[c].dataType)
                   for c in kept_docs.columns if c not in ("doc_id", "text")})
    b2.select(*kept_docs.columns).coalesce(1).write.mode("append").parquet(src)
    q = stream_simhash_dedup(spark, src, out, ckpt, fpd)
    q.awaitTermination(180)
    after = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 10_000_001 in after and 10_000_000 not in after


def test_stream_kernels_inherit_staged_language_form(spark):
    """The foreachBatch kernels ARE the batch operators (stream_clean_corpus
    runs clean_corpus; the dedup twins run incremental_neardup /
    incremental_simhash_dedup), so every r13 staged form is inherited by
    construction. Pin the load-bearing one: language_id's per-language
    stopword folds are STAGED as columns (exactly K interpreted
    ``aggregate`` folds in the plan); the pre-r13 best-of-K when-chain
    held ~2^K copies and re-evaluated every fold per row (VERDICT r13
    item 5 asked for this pin)."""
    from clarite_python_spark.operators.text import _LANG_STOPWORDS, language_id

    df = spark.createDataFrame([(1, "the and of a hello")], "doc_id long, text string")
    plan = language_id(df)._jdf.queryExecution().optimizedPlan().toString()
    k = len(_LANG_STOPWORDS)
    assert plan.count("aggregate(") == k, (
        f"expected exactly {k} staged stopword folds, plan has "
        f"{plan.count('aggregate(')} — the when-chain is re-expanding"
    )
