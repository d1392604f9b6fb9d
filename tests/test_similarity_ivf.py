"""IVF approximate top-k: probing all lists must equal brute force
exactly; partial probes trade recall for the expected n_probe/n_lists
scan fraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.similarity import cosine_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _hits(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def test_full_probe_equals_brute(emb, queries):
    brute = _hits(cosine_topk(emb, queries, k=10))
    ivf = _hits(ivf_topk(emb, queries, k=10, n_lists=8, n_probe=8))
    assert ivf == brute


def test_partial_probe_recall(emb, queries):
    brute = _hits(cosine_topk(emb, queries, k=10))
    ivf = _hits(ivf_topk(emb, queries, k=10, n_lists=8, n_probe=4))
    # note: partial-probe results are NOT a subset of brute top-k — ranks
    # vacated by unprobed true hits are filled from the probed lists;
    # recall of the true top-k is the contract
    recall = len(ivf & brute) / len(brute)
    # seeded quantizer => deterministic; half the lists probed
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_ivf_scores_match_brute_on_shared_hits(emb, queries):
    brute = {
        (r["query_id"], r["vec_id"]): round(r["cosine"], 9)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"]): round(r["cosine"], 9)
        for r in ivf_topk(emb, queries, k=10, n_lists=8, n_probe=4).collect()
    }
    for key, v in ivf.items():
        if key in brute:
            assert v == brute[key]


def test_label_centroids_matches_numpy(spark):
    import numpy as np

    from clarite_python_spark.operators.similarity import label_centroids

    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 4).astype("float32")
    labels = rng.randint(0, 3, 30)
    rows = [(int(l), v.tolist()) for l, v in zip(labels, vecs)]
    df = spark.createDataFrame(rows, "label: int, embedding: array<float>")
    got = {(r["label"], r["pos"]): (r["centroid"], r["n"]) for r in label_centroids(df).collect()}
    for lab in range(3):
        want = vecs[labels == lab].mean(axis=0)
        n = int((labels == lab).sum())
        for pos in range(4):
            c, cn = got[(lab, pos)]
            assert cn == n
            assert abs(c - want[pos]) < 1e-6
