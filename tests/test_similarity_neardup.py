"""embedding_neardup: exact all-pairs baseline vs numpy, and the
LSH-blocked scale path's subset/recall contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.similarity import embedding_neardup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_matches_numpy(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    expected = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= 0.4:
                expected.add((int(ids[i]), int(ids[j])))
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(emb, threshold=0.4).collect()
    }
    assert got == expected


def test_lsh_blocked_is_subset_with_same_scores(spark, emb):
    brute = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup(emb, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup(emb, threshold=0.3, n_planes=4).collect()
    }
    # LSH blocking may miss pairs (recall < 1) but never invents or rescores
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == brute[k]
