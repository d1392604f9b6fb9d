"""dedup() front-door dispatcher: parity with the method-specific
functions and the uniform survivor-policy vocabulary (round 8 — the
family previously exposed parallel APIs with divergent keep policies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.dedup import (
    dedup,
    exact_dedup,
    incremental_simhash_dedup,
    minhash_dedup,
    simhash_dedup,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Three exact-dup groups with a quality column: text A twice
    (quality 1.0 on id 11, 5.0 on id 12), text B three times (equal
    quality -> min-id tie-break), text C unique."""
    rows = [
        (11, "alpha beta gamma", 1.0),
        (12, "alpha  beta gamma", 5.0),  # same normalized text, higher q
        (21, "delta epsilon zeta", 2.0),
        (22, "delta epsilon zeta", 2.0),
        (23, "delta epsilon zeta", 2.0),
        (31, "unique text here", 0.5),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, q: double")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_exact_parity_with_exact_dedup(spark, dup_docs):
    got = _ids(dedup(dup_docs, "exact"))
    want = _ids(exact_dedup(dup_docs))
    assert got == want == [11, 21, 31]


def test_exact_keep_max_quality(spark, dup_docs):
    # group A: id 12 wins on q; group B: tie -> min id 21
    got = _ids(dedup(dup_docs, "exact", keep="q"))
    assert got == [12, 21, 31]
    # keep_order="min": group A flips back to id 11
    got_min = _ids(dedup(dup_docs, "exact", keep="q", keep_order="min"))
    assert got_min == [11, 21, 31]


def test_exact_keep_preserves_columns(spark, dup_docs):
    out = dedup(dup_docs, "exact", keep="q")
    assert out.columns == dup_docs.columns


@pytest.fixture(scope="module")
def near_docs(spark):
    """A near-dup pair (20 tokens, one swapped) plus an unrelated doc,
    with a length-ish keep column favoring the HIGHER id of the pair."""
    base = [f"w{i}" for i in range(20)]
    rows = [
        (1, " ".join(base), 10.0),
        (2, " ".join(base[:-1] + ["xx"]), 99.0),
        (9, "entirely different text altogether now", 1.0),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, q: double")


def test_minhash_parity(spark, near_docs):
    kw = dict(threshold=0.8, num_hashes=32, bands=8)
    got = _ids(dedup(near_docs, "minhash", **kw))
    want = _ids(minhash_dedup(near_docs, **kw))
    assert got == want == [1, 9]


def test_minhash_keep_forwards(spark, near_docs):
    got = _ids(dedup(near_docs, "minhash", keep="q", threshold=0.8))
    want = _ids(minhash_dedup(near_docs, keep_col="q", threshold=0.8))
    assert got == want == [2, 9]


def test_simhash_parity(spark, near_docs):
    got = _ids(dedup(near_docs, "simhash", max_hamming=10, bands=12, bits=60))
    want = _ids(simhash_dedup(near_docs, max_hamming=10, bands=12, bits=60))
    assert got == want


def test_incremental_exact_history_wins_then_keep(spark, dup_docs):
    seen = spark.createDataFrame(
        [(99, "alpha beta gamma")], "doc_id: long, text: string"
    )
    # group A matches history -> both dropped; group B keeps by q-tie min
    # id; C survives
    got = _ids(dedup(dup_docs, "exact", keep="q", seen=seen))
    assert got == [21, 31]
    # without keep: delegates to incremental_dedup (min-id within batch)
    got2 = _ids(dedup(dup_docs, "exact", seen=seen))
    assert got2 == [21, 31]


def test_incremental_simhash_keep_forwards(spark, near_docs):
    seen = spark.createDataFrame(
        [(50, "entirely different text altogether now")],
        "doc_id: long, text: string",
    )
    kw = dict(max_hamming=10, bands=12, bits=60)
    got = _ids(dedup(near_docs, "simhash", keep="q", seen=seen, **kw))
    want = _ids(
        incremental_simhash_dedup(near_docs, seen, keep_col="q", **kw)
    )
    assert got == want
    assert 9 not in got  # history hit dropped


def test_dispatch_errors(spark, dup_docs):
    with pytest.raises(ValueError, match="method"):
        dedup(dup_docs, "fuzzy")
    with pytest.raises(ValueError, match="transitive"):
        dedup(dup_docs, "exact", transitive=True)
    with pytest.raises(ValueError, match="keep column"):
        dedup(dup_docs, "exact", keep="nope")
    with pytest.raises(ValueError, match="keep_order"):
        dedup(dup_docs, "exact", keep="q", keep_order="best")
    with pytest.raises(TypeError, match="unexpected kwargs"):
        dedup(dup_docs, "exact", keep="q", bands=8)


def test_minhash_dedup_max_bucket_is_the_duplicate_density_lever(spark):
    """max_bucket now reaches minhash_dedup/minhash_clusters (and the
    dedup() front door via kwargs): a 30-member clique is admitted at
    the default cap (collapses to 1 survivor) and dropped when the cap
    sits below the clique size (all 30 survive) — the quadratic guard
    for duplicate-dense corpora."""
    from clarite_python_spark.operators.dedup import dedup as dedup_front
    from clarite_python_spark.operators.dedup import minhash_dedup

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays on"
    )
    docs = spark.createDataFrame(
        [(i, f"{base} copy {i}") for i in range(30)],
        "doc_id long, text string",
    )
    assert minhash_dedup(docs, threshold=0.5).count() == 1
    assert minhash_dedup(docs, threshold=0.5, max_bucket=5).count() == 30
    assert dedup_front(docs, "minhash", threshold=0.5, max_bucket=5).count() == 30
