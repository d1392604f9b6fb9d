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
        for r in embedding_neardup(emb, threshold=0.4, exact=True).collect()
    }
    assert got == expected


def test_lsh_blocked_is_subset_with_same_scores(spark, emb):
    brute = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup(emb, threshold=0.3, exact=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup(emb, threshold=0.3, n_planes=4).collect()
    }
    # LSH blocking may miss pairs (recall < 1) but never invents or rescores
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == brute[k]


def test_default_blocked_recall_at_045(spark, emb):
    """Subset + recall contract of the scale-default (banded LSH) path at
    the entry query's threshold. The sf0.001 pairs all sit barely above
    0.45 (cosine 0.45-0.48), where banded-LSH candidate recall is
    theory-bounded at 1-(1-p^6)^8 ~= 0.48 (p = 1-theta/pi); hyperplanes
    are seeded so the measured value is deterministic — pin a floor just
    under it. High-cosine recall (the operator's actual target) is
    asserted in test_blocked_recall_on_planted_dups."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(emb, threshold=0.45, exact=True).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(emb, threshold=0.45).collect()
    }
    assert blocked <= exact
    assert exact, "test data must produce at least one near-dup pair"
    recall = len(blocked) / len(exact)
    assert recall >= 0.4, f"banded-LSH recall {recall:.2f} below floor"


def test_blocked_recall_on_planted_dups(spark):
    """Planted true near-dups (cosine >= ~0.9) must be recovered by the
    default banded-LSH blocking with high recall — this is the regime the
    operator exists for (theory: ~0.98 at cosine 0.9 with 6 planes x 8
    bands)."""
    rng = np.random.RandomState(7)
    base = rng.randn(60, 16)
    dup = base[:25] + 0.15 * rng.randn(25, 16)  # cosine ~0.95 vs original
    M = np.vstack([base, dup])
    rows = [(i, [float(x) for x in M[i]]) for i in range(len(M))]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(df, threshold=0.85, exact=True).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(df, threshold=0.85).collect()
    }
    assert blocked <= exact
    assert len(exact) >= 20, "planting should create >=20 high-cosine pairs"
    recall = len(blocked) / len(exact)
    assert recall >= 0.9, f"high-cosine banded-LSH recall {recall:.2f} < 0.9"


def test_blocked_path_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id: long, embedding: array<double>")
    out = embedding_neardup(empty, threshold=0.5)
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0


def test_exact_guard_refuses_large_corpus(spark, emb):
    with pytest.raises(ValueError, match="max_exact_rows"):
        embedding_neardup(emb, threshold=0.45, exact=True, max_exact_rows=10)
    # explicit override runs the all-pairs plan
    assert (
        embedding_neardup(emb, threshold=0.45, exact=True, max_exact_rows=None)
        .limit(1)
        .count()
        >= 0
    )


def test_semantic_dedup_removes_within_cluster_neardups(spark):
    import numpy as np
    from clarite_python_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(4, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 10, [float(x) for x in v]))
        # a tiny perturbation of each base vector -> cosine ~ 1
        rows.append((i * 10 + 1, [float(x) for x in v + 0.001 * rng.randn(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # one cluster -> reduces to greedy exact near-dup; each
    # near-identical pair deterministically loses its higher id
    out = semantic_dedup(df, n_clusters=1, threshold=0.95, sample_size=100)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [0, 10, 20, 30]
    # with real clustering, removals are a subset (cross-cluster twins
    # are out of SemDeDup's scope by design)
    out4 = semantic_dedup(df, n_clusters=4, threshold=0.95, sample_size=100)
    kept4 = sorted(r["vec_id"] for r in out4.collect())
    assert set(kept) <= set(kept4)
    assert all(v in kept4 for v in (0, 10, 20, 30))


def test_semantic_dedup_cluster_guard(spark):
    import numpy as np
    from clarite_python_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_dedup(df, n_clusters=1, threshold=0.99, sample_size=100, max_cluster_rows=10)


# -------------------------------------------------------------- ann_recall


def test_ann_recall_identical_vectors_full_recall(spark):
    """Clustered corpus: every vector equals one of 2 prototypes, so a
    query's true top-k all share its bucket -> recall 1.0."""
    import numpy as np

    from clarite_python_spark.operators.similarity import ann_recall

    rng = np.random.RandomState(0)
    protos = [rng.randn(8).tolist(), rng.randn(8).tolist()]
    rows = [(i, [float(x) for x in protos[i % 2]]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    r = ann_recall(df, k=5, n_queries=4, method="lsh", n_planes=4).collect()[0]
    assert r["n_queries"] == 4 and r["k"] == 5
    assert r["n_exact"] == 20
    assert r["recall"] == 1.0


def test_ann_recall_ivf_full_probe_is_exact(spark):
    import numpy as np

    from clarite_python_spark.operators.similarity import ann_recall

    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    r = ann_recall(
        df, k=5, n_queries=5, method="ivf", n_lists=4, n_probe=4, sample_size=60
    ).collect()[0]
    assert r["recall"] == 1.0  # probing every list == brute force


def test_ann_recall_validation(spark):
    from clarite_python_spark.operators.similarity import ann_recall

    df = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        ann_recall(df, method="nope")
    with _pytest.raises(ValueError, match="positive"):
        ann_recall(df, k=0)


# ---------------------------------------------------------------- round 9


def test_incremental_embedding_neardup_history_wins(spark):
    """A batch vector near-identical to a history vector is dropped;
    a novel one survives."""
    from clarite_python_spark.operators.similarity import (
        incremental_embedding_neardup,
    )

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(64)
    novel = rng.randn(64)
    hist = spark.createDataFrame(
        [(0, [float(x) for x in base])], "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [
            (10, [float(x) for x in base * 1.001]),  # near-dup of history
            (11, [float(x) for x in novel]),
        ],
        "vec_id long, embedding array<double>",
    )
    kept = incremental_embedding_neardup(batch, hist, threshold=0.9)
    assert sorted(r["vec_id"] for r in kept.collect()) == [11]


def test_incremental_embedding_neardup_within_batch_greedy(spark):
    """Two surviving batch near-dups: the higher id drops."""
    from clarite_python_spark.operators.similarity import (
        incremental_embedding_neardup,
    )

    import numpy as np

    rng = np.random.RandomState(8)
    a = rng.randn(64)
    hist = spark.createDataFrame(
        [(0, [float(x) for x in rng.randn(64)])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, [float(x) for x in a]),
            (11, [float(x) for x in a * 0.999]),
        ],
        "vec_id long, embedding array<double>",
    )
    kept = incremental_embedding_neardup(batch, hist, threshold=0.9)
    assert sorted(r["vec_id"] for r in kept.collect()) == [10]
    # within_batch=False keeps both
    kept2 = incremental_embedding_neardup(
        batch, hist, threshold=0.9, within_batch=False
    )
    assert sorted(r["vec_id"] for r in kept2.collect()) == [10, 11]


def test_incremental_embedding_neardup_matches_two_step(spark):
    """On the real corpus: equals anti-join-vs-history then
    embedding_neardup greedy within batch."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.similarity import (
        embedding_neardup,
        incremental_embedding_neardup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hist = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    got = sorted(
        r["vec_id"]
        for r in incremental_embedding_neardup(
            batch, hist, threshold=0.45
        ).collect()
    )
    # reference: exact two-step with the same machinery
    both = embedding_neardup(emb, threshold=0.45)
    cross_dropped = {
        r["id_b"] if r["id_b"] % 2 == 1 else r["id_a"]
        for r in both.collect()
        if (r["id_a"] % 2 == 0) != (r["id_b"] % 2 == 0)
    }
    survivors = [r["vec_id"] for r in batch.collect() if r["vec_id"] not in cross_dropped]
    within = embedding_neardup(
        emb.where(F.col("vec_id").isin(survivors)), threshold=0.45
    )
    batch_losers = {r["id_b"] for r in within.collect()}
    want = sorted(v for v in survivors if v not in batch_losers)
    assert got == want


def test_exact_vectorized_bit_identical_to_join_plan(spark, emb):
    """The bounded exact path runs the fold-order numpy kernel
    (_exact_neardup_pandas); max_exact_rows=None keeps the legacy
    all-pairs join plan. Every (pair, cosine) double must be EXACTLY
    equal — the kernel accumulates in the JVM fold's index order by
    construction, so this is bit-identity, not tolerance."""
    vec = embedding_neardup(emb, threshold=0.4, exact=True)
    join = embedding_neardup(emb, threshold=0.4, exact=True, max_exact_rows=None)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in vec.collect()}
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in join.collect()}
    assert got == want  # exact float equality, no rounding


def test_exact_vectorized_ragged_dims_falls_back(spark):
    """Mixed-dim corpora return None from the vectorized kernel and
    fall back to the join plan (zip_with semantics: mismatched pair ->
    NULL cosine -> dropped; same-dim pairs still score)."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [1.0, 0.0, 0.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    out = embedding_neardup(df, threshold=0.5, exact=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_exact_vectorized_zero_norm_dropped(spark):
    """A zero vector's cosine is NULL under try_divide in the join plan
    and masked in the kernel — dropped either way."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    out = embedding_neardup(df, threshold=0.0, exact=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(2, 3)}
