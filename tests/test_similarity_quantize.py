"""int8 embedding quantization (similarity.quantize_embeddings /
quantized_topk): numpy parity of the quantization rule, scale-invariance
of the quantized ranking, guards, and recall vs the float ranking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _np_quantize(v: np.ndarray, qmax: int = 127):
    amax = np.abs(v).max() if len(v) else 0.0
    scale = amax / qmax if amax > 0 else 1.0
    q = np.clip(np.floor(v / scale + 0.5), -qmax, qmax).astype(np.int64)
    return q, scale


def test_quantize_matches_numpy(spark, emb):
    rows = (
        similarity.quantize_embeddings(emb)
        .join(emb, "vec_id")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    assert len(rows) == 50
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        q, scale = _np_quantize(v)
        assert np.array_equal(np.asarray(r["qvec"], dtype=np.int64), q), r["vec_id"]
        assert abs(r["scale"] - scale) < 1e-9


def test_quantize_output_is_tinyint(spark, emb):
    schema = similarity.quantize_embeddings(emb).schema
    assert schema["qvec"].dataType.simpleString() == "array<tinyint>"
    # 16-bit variant widens the element type
    s16 = similarity.quantize_embeddings(emb, bits=16).schema
    assert s16["qvec"].dataType.simpleString() == "array<smallint>"


def test_quantize_zero_vector_scale_one(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()}
    assert out[0]["scale"] == 1.0
    assert list(out[0]["qvec"]) == [0, 0, 0]
    # max |v| maps to ±127 exactly
    assert out[1]["qvec"][1] == -127


def test_quantize_bits_validation(spark, emb):
    with pytest.raises(ValueError, match="bits"):
        similarity.quantize_embeddings(emb, bits=1)
    with pytest.raises(ValueError, match="bits"):
        similarity.quantize_embeddings(emb, bits=17)


def test_quantized_topk_self_hit_and_recall(spark, emb):
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.quantized_topk(emb, q, k=10).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 10
        top = min(rows, key=lambda r: r["rank"])
        # a vector's own quantized copy is its nearest neighbor
        assert top["vec_id"] == qid
        assert top["cosine_q"] > 0.999
    # int8 keeps the float ranking nearly intact on this corpus
    rec = similarity.ann_recall(emb, k=10, n_queries=20, method="quantized").collect()[0]
    assert rec["recall"] >= 0.9


def test_quantized_ranking_is_scale_invariant(spark):
    # scaling a corpus vector by a power of two (exact in binary fp)
    # leaves its quantized form unchanged — the symmetric per-vector
    # scale cancels; non-power-of-two constants can flip ties at the
    # rounding boundary, which is why recall is measured, not assumed
    base = [(i, [float(i + 1), float(-i), 0.5 * i]) for i in range(8)]
    scaled = [(i, [x * 32.0 for x in v]) for i, v in base]
    a = similarity.quantize_embeddings(
        spark.createDataFrame(base, "vec_id long, embedding array<double>")
    )
    b = similarity.quantize_embeddings(
        spark.createDataFrame(scaled, "vec_id long, embedding array<double>")
    )
    qa = {r["vec_id"]: list(r["qvec"]) for r in a.collect()}
    qb = {r["vec_id"]: list(r["qvec"]) for r in b.collect()}
    assert qa == qb


def test_truncated_topk_full_dim_equals_exact(spark, emb):
    from pyspark.sql import functions as F

    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, q, k=5).select("query_id", "vec_id", "rank")
    trunc = similarity.truncated_topk(emb, q, k=5, dim=64).select(
        "query_id", "vec_id", "rank"
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, trunc.collect()))


def test_truncated_recall_degrades_on_random_features(spark, emb):
    # these synthetic embeddings are NOT front-loaded: half the dims
    # must lose most of the ranking signal (the measured case for NOT
    # assuming the Matryoshka property), while a self-query still wins
    r = similarity.ann_recall(emb, k=10, n_queries=20, method="truncated", dim=16)
    rec = r.collect()[0]["recall"]
    assert rec < 0.7
    with pytest.raises(ValueError):
        similarity.truncated_topk(emb, emb.limit(1).select(
            emb.vec_id.alias("query_id"), "embedding"), dim=0)


def test_rp_topk_self_match_and_backloaded_advantage(spark):
    """rp_topk ranks a query's own vector first; on a BACK-LOADED corpus
    (signal only in the last 16 of 64 dims) the JL projection keeps the
    ranking signal while 16-dim truncation sees only zeros — the case
    that motivates JL over Matryoshka truncation."""
    import numpy as np
    from clarite_python_spark.operators.similarity import (
        cosine_topk,
        rp_topk,
        truncated_topk,
    )

    rng = np.random.RandomState(7)
    # back-loaded signal: first 48 dims are ~0 (1e-6 noise keeps the
    # truncated norm nonzero — an exactly-zero slice is an ANSI
    # divide-by-zero), real structure lives in the last 16
    vecs = 1e-6 * rng.randn(40, 64)
    vecs[:, 48:] = rng.randn(40, 16)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    rp = rp_topk(corpus, queries, k=5, out_dim=16)
    got = {(r["query_id"], r["vec_id"]) for r in rp.collect()}
    # self-match: the query's own vector projects identically -> rank 1
    own = {r["query_id"]: r["vec_id"] for r in rp.where("rank = 1").collect()}
    assert own == {0: 0, 1: 1, 2: 2}
    rp_recall = len(exact & got) / len(exact)
    assert rp_recall >= 0.4  # JL keeps ranking signal (~1/sqrt(16) distortion)

    # truncation to the first 16 dims sees only the 1e-6 noise floor:
    # ranking is random, recall ~ k/n
    tr = truncated_topk(corpus, queries, k=5, dim=16)
    tr_hits = {(r["query_id"], r["vec_id"]) for r in tr.collect()}
    tr_recall = len(exact & tr_hits) / len(exact)
    assert tr_recall < rp_recall  # the separation IS the claim

    import pytest as _pytest
    with _pytest.raises(ValueError, match="out_dim"):
        rp_topk(corpus, queries, k=5, out_dim=0)


def test_cluster_embeddings_assignment_properties(spark):
    """Every vector gets exactly one cluster in [0,k); planted separable
    blobs land in distinct clusters with near-1 centroid cosine; the
    assignment is deterministic across calls."""
    import numpy as np
    from clarite_python_spark.operators.similarity import cluster_embeddings

    rng = np.random.RandomState(3)
    blob_a = rng.randn(30, 16) * 0.05 + np.eye(16)[0] * 5
    blob_b = rng.randn(30, 16) * 0.05 + np.eye(16)[1] * 5
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([blob_a, blob_b]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_embeddings(df, k=2).collect()
    assert len(out) == 60
    assert all(0 <= r["cluster"] < 2 for r in out)
    a_clusters = {r["cluster"] for r in out if r["vec_id"] < 30}
    b_clusters = {r["cluster"] for r in out if r["vec_id"] >= 30}
    assert len(a_clusters) == 1 and len(b_clusters) == 1 and a_clusters != b_clusters
    assert all(r["cosine"] > 0.9 for r in out)  # tight blobs sit on centroids

    again = cluster_embeddings(df, k=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        cluster_embeddings(df, k=0)
