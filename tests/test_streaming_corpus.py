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
