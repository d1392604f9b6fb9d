"""Product quantization (similarity.pq_codes / pq_topk): numpy parity of
the per-subspace k-means training + encoding, packed-code range, ADC
ranking vs a numpy reconstruction brute force, and the recall harness.

PQ has no counterpart in the reference (HallLab/clarite-python); it is
part of the LLM-pipeline extension surface (Jégou et al., PAMI 2011).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, ITERS, SEED = 4, 8, 10, 42


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def mat(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.asarray([r[0] for r in rows])
    M_ = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    return ids, M_


def _np_train_pq(M_, m, k_sub, seed, iters):
    # mirrors similarity._train_pq exactly (same RNG stream, same
    # empty-cluster-keeps-previous rule)
    dim = M_.shape[1]
    dsub = dim // m
    books = []
    for mi in range(m):
        S = M_[:, mi * dsub : (mi + 1) * dsub]
        rng = np.random.RandomState(seed + mi)
        C = S[rng.choice(len(S), size=min(k_sub, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            assign = d2.argmin(axis=1)
            for j in range(len(C)):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append(C)
    return np.asarray(books)


def _np_encode(v, books):
    m, k_sub, dsub = books.shape
    codes = []
    for mi in range(m):
        sub = v[mi * dsub : (mi + 1) * dsub]
        scores = books[mi] @ sub - 0.5 * (books[mi] * books[mi]).sum(axis=1)
        codes.append(int(scores.argmax()))
    return codes


def _np_recon(codes, books):
    return np.concatenate([books[mi][codes[mi]] for mi in range(len(codes))])


def test_pq_codes_numpy_parity(spark, emb, mat):
    ids, M_ = mat
    books = _np_train_pq(M_, M, KSUB, SEED, ITERS)
    got = {
        r["vec_id"]: r
        for r in similarity.pq_codes(emb, m=M, k_sub=KSUB, seed=SEED, iters=ITERS).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        codes = _np_encode(M_[i], books)
        packed = sum(c * KSUB**mi for mi, c in enumerate(codes))
        assert got[vid]["pq_code"] == packed, vid
        recon = _np_recon(codes, books)
        v = M_[i]
        cos = float(v @ recon / (np.linalg.norm(v) * np.linalg.norm(recon)))
        assert abs(got[vid]["recon_cosine"] - round(cos, 6)) < 2e-6, vid


def test_pq_code_packs_into_range(spark, emb):
    out = similarity.pq_codes(emb, m=M, k_sub=KSUB)
    mx = out.agg(F.max("pq_code"), F.min("pq_code")).first()
    assert 0 <= mx[1] and mx[0] < KSUB**M


def test_pq_codes_deterministic(spark, emb):
    a = similarity.pq_codes(emb, m=M, k_sub=KSUB).orderBy("vec_id").collect()
    b = similarity.pq_codes(emb, m=M, k_sub=KSUB).orderBy("vec_id").collect()
    assert a == b


def test_pq_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codes(df, m=2, k_sub=2).collect()


def test_pq_topk_matches_numpy_adc(spark, emb, mat):
    ids, M_ = mat
    books = _np_train_pq(M_, M, KSUB, SEED, ITERS)
    recons = np.asarray([_np_recon(_np_encode(v, books), books) for v in M_])
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.pq_topk(
        emb, queries, k=5, m=M, k_sub=KSUB, seed=SEED, iters=ITERS
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    rn = np.linalg.norm(recons, axis=1)
    for qi in range(3):
        q = M_[list(ids).index(qi)]
        cos = recons @ q / (rn * np.linalg.norm(q))
        # numpy ranking with (cos desc, id asc) tie-break
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:5]
        want = [int(ids[i]) for i in order]
        rows = sorted(by_q[qi], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want, qi
        for r, i in zip(rows, order):
            assert abs(r["cosine_pq"] - cos[i]) < 1e-9


def test_ann_recall_pq_in_unit_interval(spark, emb):
    r = similarity.ann_recall(
        emb, k=10, n_queries=10, method="pq", m=M, k_sub=KSUB
    ).first()
    assert r["n_exact"] == 100
    assert 0.0 <= r["recall"] <= 1.0


def test_ivf_pq_topk_matches_numpy(spark, emb, mat):
    """Full numpy simulation of the composed path: spherical coarse
    k-means (via the engine's own _train_centroids), probe selection
    with the reverse(array_sort) tie-break (d desc, idx desc), PQ
    reconstruction scoring, ties by corpus id."""
    ids, M_ = mat
    cents = similarity._train_centroids(emb, "embedding", 8, 42, 10_000)
    books = _np_train_pq(M_, M, KSUB, SEED, ITERS)
    recons = np.asarray([_np_recon(_np_encode(v, books), books) for v in M_])
    # corpus list assignment: first argmax of normalized centroid dots
    lists = np.asarray([int((cents @ v).argmax()) for v in M_])
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_pq_topk(
        emb, queries, k=5, n_lists=8, n_probe=4, m=M, k_sub=KSUB,
        seed=SEED, iters=ITERS,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    rn = np.linalg.norm(recons, axis=1)
    for qi in range(3):
        q = M_[list(ids).index(qi)]
        d = cents @ q
        # ties: higher centroid id first (reverse of ascending (d, i))
        probe = sorted(range(8), key=lambda i: (-d[i], -i))[:4]
        mask = np.isin(lists, probe)
        cos = recons @ q / (rn * np.linalg.norm(q))
        cand = [i for i in range(len(ids)) if mask[i]]
        order = sorted(cand, key=lambda i: (-cos[i], ids[i]))[:5]
        want = [int(ids[i]) for i in order]
        rows = sorted(by_q[qi], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want, qi
        for r, i in zip(rows, order):
            assert abs(r["cosine_pq"] - cos[i]) < 1e-9


def test_ivf_pq_results_only_from_probed_lists(spark, emb):
    """Every returned candidate must live in one of the query's probed
    lists — the pruning contract."""
    out = similarity.ivf_pq_topk(
        emb,
        emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=50, n_lists=8, n_probe=2, m=M, k_sub=KSUB,
    )
    # with n_probe=2 of 8 lists, candidates are a strict subset: fewer
    # than the full corpus can ever be returned per query at large k
    cnt = out.groupBy("query_id").count().collect()
    n = emb.count()
    assert all(r["count"] <= min(50, n) for r in cnt)
    # and recall vs brute force is measurable, in [0, 1]
    r = similarity.ann_recall(
        emb, k=10, n_queries=5, method="ivf_pq",
        n_lists=8, n_probe=2, m=M, k_sub=KSUB,
    ).first()
    assert 0.0 <= r["recall"] <= 1.0


def test_ivf_pq_residual_topk_matches_numpy(spark, emb, mat):
    """residual=True (classic IVFADC): PQ trains on v - coarse_centroid,
    reconstruction is centroid + decoded residual. Full numpy replay."""
    ids, M_ = mat
    cents = similarity._train_centroids(emb, "embedding", 8, 42, 10_000)
    norms = np.maximum(np.linalg.norm(M_, axis=1, keepdims=True), 1e-12)
    assign = np.argmax((M_ / norms) @ cents.T, axis=1)
    books = _np_train_pq(M_ - cents[assign], M, KSUB, SEED, ITERS)
    lists = np.asarray([int((cents @ v).argmax()) for v in M_])
    recons = np.asarray(
        [
            cents[lists[i]]
            + _np_recon(_np_encode(M_[i] - cents[lists[i]], books), books)
            for i in range(len(M_))
        ]
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_pq_topk(
        emb, queries, k=5, n_lists=8, n_probe=4, m=M, k_sub=KSUB,
        seed=SEED, iters=ITERS, residual=True,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    rn = np.linalg.norm(recons, axis=1)
    for qi in range(3):
        q = M_[list(ids).index(qi)]
        d = cents @ q
        probe = sorted(range(8), key=lambda i: (-d[i], -i))[:4]
        mask = np.isin(lists, probe)
        cos = recons @ q / (rn * np.linalg.norm(q))
        cand = [i for i in range(len(ids)) if mask[i]]
        order = sorted(cand, key=lambda i: (-cos[i], ids[i]))[:5]
        want = [int(ids[i]) for i in order]
        rows = sorted(by_q[qi], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want, qi
        for r, i in zip(rows, order):
            assert abs(r["cosine_pq"] - cos[i]) < 1e-9


def test_ivf_pq_residual_beats_raw_on_clustered_corpus(spark):
    """The regime residual=True exists for: a corpus the coarse
    quantizer explains (residual energy < 1) must see higher recall
    from residual codes than raw codes at the same budget."""
    rng = np.random.RandomState(0)
    dim, n_clu, per = 64, 8, 60
    centers = rng.randn(n_clu, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    V = np.repeat(centers, per, axis=0) + 0.08 * rng.randn(n_clu * per, dim)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    clu = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<double>",
    )
    recalls = {}
    for res in (False, True):
        r = similarity.ann_recall(
            clu, k=10, n_queries=20, method="ivf_pq",
            n_lists=8, n_probe=4, m=4, k_sub=16, residual=res,
        ).first()
        recalls[res] = float(r["recall"])
    assert recalls[True] > recalls[False]
