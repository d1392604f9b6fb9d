"""Round-13 operators: assign_impl='pandas' plumbed through the whole
quantizer family (ivf_topk / cluster_embeddings / semantic_dedup /
ivf_pq_topk — the r12 ceiling fix, previously knn_graph-only), the BPE
scale paths, and the round-13 ADVICE fixes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------- pandas assignment across the family --


def test_cluster_embeddings_pandas_matches_codegen(emb):
    a = _rows(similarity.cluster_embeddings(emb, k=8).orderBy("vec_id"))
    b = _rows(
        similarity.cluster_embeddings(emb, k=8, assign_impl="pandas").orderBy(
            "vec_id"
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="assign_impl"):
        similarity.cluster_embeddings(emb, k=8, assign_impl="numpy")


def test_ivf_topk_pandas_matches_codegen(emb):
    q = emb.limit(5).selectExpr("vec_id as query_id", "embedding")
    a = _rows(similarity.ivf_topk(emb, q, k=5, n_lists=8, n_probe=3))
    b = _rows(
        similarity.ivf_topk(
            emb, q, k=5, n_lists=8, n_probe=3, assign_impl="pandas"
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="assign_impl"):
        similarity.ivf_topk(emb, q, assign_impl="numpy")


def test_semantic_dedup_pandas_matches_codegen(emb):
    a = _rows(
        similarity.semantic_dedup(emb, n_clusters=8, threshold=0.2).orderBy(
            "vec_id"
        )
    )
    b = _rows(
        similarity.semantic_dedup(
            emb, n_clusters=8, threshold=0.2, assign_impl="pandas"
        ).orderBy("vec_id")
    )
    assert a == b
    assert 0 < len(a) < emb.count()  # the threshold actually removed rows
    with pytest.raises(ValueError, match="assign_impl"):
        similarity.semantic_dedup(emb, assign_impl="numpy")


@pytest.mark.parametrize("residual", [False, True])
def test_ivf_pq_topk_pandas_matches_codegen(emb, residual):
    q = emb.limit(5).selectExpr("vec_id as query_id", "embedding")
    a = _rows(
        similarity.ivf_pq_topk(
            emb, q, k=5, n_lists=8, n_probe=3, residual=residual
        )
    )
    b = _rows(
        similarity.ivf_pq_topk(
            emb,
            q,
            k=5,
            n_lists=8,
            n_probe=3,
            residual=residual,
            assign_impl="pandas",
        )
    )
    assert a == b


def test_assign_cells_pandas_empty_partition(spark):
    """ADVICE r13: an empty Arrow batch must yield zero rows, not a
    ValueError from the 1-D @ 2-D matmul."""
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(6)]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16)  # 4 rows over 16 partitions -> most are empty
    cents = rng.randn(3, 6)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    out = similarity._assign_cells_pandas(
        df, cents, "vec_id", "embedding", n_probe=2
    ).collect()
    assert len(out) == 4
    assert all(0 <= r["__list"] < 3 and len(r["__probes"]) == 2 for r in out)


def test_train_centroids_skips_null_ids(spark):
    """ADVICE r13: a NULL id in the sample window must not crash the
    driver-side re-sort; null-id rows are excluded from the sample."""
    rng = np.random.RandomState(7)
    rows = [(i if i % 5 else None, [float(x) for x in rng.randn(4)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity._train_centroids(df, "embedding", 3, 42, 100)
    assert cents.shape == (3, 4)
    clean = df.where(F.col("vec_id").isNotNull())
    cents2 = similarity._train_centroids(clean, "embedding", 3, 42, 100)
    assert np.allclose(cents, cents2)
