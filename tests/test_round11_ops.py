"""Round-11 additions: stored-snapshot table_diff, approx outlier gate,
retrieval-eval CLI composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import evaluation


# ------------------------------------------------ table_diff snapshots --


@pytest.fixture()
def orders_pair(spark):
    old = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    new = (
        old.where("o_orderkey % 3 != 0")
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice")),
        )
    )
    return old, new


def test_table_diff_snapshot_dir_matches_frame_form(spark, tmp_path, orders_pair):
    old, new = orders_pair
    snap = str(tmp_path / "snap")
    evaluation.save_snapshot(old, snap)
    via_frames = evaluation.table_diff(
        old, new, keys=["o_orderkey"], compare=["o_totalprice", "o_orderstatus"]
    )
    via_dir = evaluation.table_diff(
        new, keys=["o_orderkey"], compare=["o_totalprice", "o_orderstatus"],
        snapshot_dir=snap,
    )
    a = sorted(tuple(r) for r in via_frames.collect())
    b = sorted(tuple(r) for r in via_dir.collect())
    assert a == b and len(a) > 0


def test_table_diff_rejects_ambiguous_forms(spark, tmp_path, orders_pair):
    old, new = orders_pair
    with pytest.raises(ValueError, match="exactly one"):
        evaluation.table_diff(old, new, keys=["o_orderkey"], snapshot_dir="x")
    with pytest.raises(ValueError, match="exactly one"):
        evaluation.table_diff(old, keys=["o_orderkey"])


def test_cli_save_snapshot_round_trip(spark, tmp_path):
    from clarite_python_spark import cli

    d = str(tmp_path)
    orders = "/root/testdata/sf0.001/orders.parquet"
    assert cli.main(["pipeline", "save-snapshot", orders, f"{d}/snap"]) == 0
    spark.read.parquet(orders).where("o_orderkey % 2 = 0").selectExpr(
        "o_orderkey", "o_totalprice + 1.0 AS o_totalprice", "o_orderstatus"
    ).write.parquet(f"{d}/new")
    assert cli.main(
        ["pipeline", "table-diff", f"{d}/new", f"{d}/diff",
         "--keys", "o_orderkey", "--compare", "o_totalprice,o_orderstatus",
         "--snapshot-dir", f"{d}/snap"]
    ) == 0
    diff = spark.read.parquet(f"{d}/diff")
    stats = {r["status"] for r in diff.select("status").distinct().collect()}
    # odd keys are only in the snapshot (removed); surviving even keys
    # changed o_totalprice
    assert stats == {"removed", "changed"}
    assert (
        diff.where("status = 'changed'").first()["changed_cols"]
        == "o_totalprice"
    )
    # two-frame positional form still works unchanged
    assert cli.main(
        ["pipeline", "table-diff", f"{d}/snap/data", f"{d}/new", f"{d}/diff2",
         "--keys", "o_orderkey", "--compare", "o_totalprice"]
    ) == 0
    assert (
        spark.read.parquet(f"{d}/diff2").where("status='changed'").count()
        == diff.where("status='changed'").count()
    )


# ------------------------------------------- outlier_bounds_check (approx) --


def test_outlier_bounds_check_verdict_and_exact_bounds(spark):
    import numpy as np

    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.operators import modify

    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.0, size=2000)
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    cf = ClariteFrame(spark.createDataFrame(rows, "ID long, x double"))
    cf = modify.make_continuous(cf, only=["x"])
    out = modify.outlier_bounds_check(cf, method="iqr", cutoff=1.5).collect()
    assert len(out) == 1
    r = out[0]
    q1, q3 = np.percentile(vals, [25, 75])  # linear interpolation = exact
    assert r["lo_exact"] == pytest.approx(q1 - 1.5 * (q3 - q1), abs=1e-3)
    assert r["hi_exact"] == pytest.approx(q3 + 1.5 * (q3 - q1), abs=1e-3)
    assert r["approx_within_tol"] is True


def test_outlier_bounds_check_constant_column_and_validation(spark):
    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.operators import modify

    cf = ClariteFrame(
        spark.createDataFrame(
            [(i, 5.0, float(i)) for i in range(100)], "ID long, c double, x double"
        )
    )
    cf = modify.make_continuous(cf, only=["c", "x"])
    rows = {r["variable"]: r for r in modify.outlier_bounds_check(cf).collect()}
    # zero-width keep-range: sketch returns the constant too -> exact match
    assert rows["c"]["approx_within_tol"] is True
    assert rows["c"]["lo_exact"] == rows["c"]["hi_exact"] == 5.0
    assert rows["x"]["approx_within_tol"] is True
    with pytest.raises(ValueError, match="tol"):
        modify.outlier_bounds_check(cf, tol=1.5)


# --------------------------------------- evaluate-retrieval composition --


def test_cli_evaluate_retrieval_round_trip(spark, tmp_path):
    """Retriever -> MMR -> rank_eval in one command, against label-match
    qrels; verify against composing the operators directly."""
    from clarite_python_spark import cli
    from clarite_python_spark.operators import evaluation, similarity

    d = str(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    spark.read.parquet(emb).where("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding"
    ).write.parquet(f"{d}/q")
    spark.sql(
        "SELECT a.vec_id AS query_id, b.vec_id AS vec_id, 1.0 AS rel "
        f"FROM parquet.`{emb}` a JOIN parquet.`{emb}` b ON a.label = b.label "
        "WHERE a.vec_id < 3"
    ).write.parquet(f"{d}/qrels")

    # plain exact retrieval
    assert cli.main(
        ["pipeline", "evaluate-retrieval", emb, f"{d}/q", f"{d}/qrels",
         f"{d}/ev", "--k", "5"]
    ) == 0
    ev = spark.read.parquet(f"{d}/ev")
    assert ev.count() == 3
    assert set(ev.columns) == {
        "query_id", "n_rel", "hits", "precision", "recall", "mrr", "ndcg"
    }
    # each query is its own top hit -> mrr 1.0 everywhere
    assert all(r["mrr"] == 1.0 for r in ev.collect())

    # ivf + mmr chain
    assert cli.main(
        ["pipeline", "evaluate-retrieval", emb, f"{d}/q", f"{d}/qrels",
         f"{d}/ev2", "--k", "5", "--retriever", "ivf", "--n-lists", "4",
         "--n-probe", "4", "--mmr", "--fetch-k", "20", "--lambda", "0.5"]
    ) == 0
    ev2 = spark.read.parquet(f"{d}/ev2")
    assert ev2.count() == 3

    # parity with the direct operator composition
    corpus = spark.read.parquet(emb)
    q = spark.read.parquet(f"{d}/q")
    cand = similarity.ivf_topk(corpus, q, k=20, n_lists=4, n_probe=4)
    ranked = similarity.mmr_rerank(
        corpus, q, k=5, lambda_=0.5, candidates=cand, score_col="cosine"
    )
    want = evaluation.rank_eval(
        ranked, spark.read.parquet(f"{d}/qrels"), k=5, doc_col="vec_id"
    )
    assert sorted(tuple(r) for r in ev2.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


# ---------------------------------------------- binary embedding family --


def test_quantize_binary_matches_numpy(spark):
    import numpy as np

    from clarite_python_spark.operators import similarity

    rng = np.random.RandomState(5)
    vecs = rng.randn(50, 64)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["bvec"]
        for r in similarity.quantize_binary(df).collect()
    }
    for i, v in enumerate(vecs):
        bits = (v > 0).astype(np.int64)
        want = [
            int(sum(bits[32 * w + j] << j for j in range(32)))
            for w in range(2)
        ]
        assert got[i] == want


def test_hamming_topk_matches_numpy(spark):
    import numpy as np

    from clarite_python_spark.operators import similarity

    rng = np.random.RandomState(9)
    vecs = rng.randn(80, 64)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = [
        (r["query_id"], r["vec_id"], r["hamming"], r["rank"])
        for r in similarity.hamming_topk(df, q, k=5).collect()
    ]
    signs = vecs > 0
    for qid in (0, 1):
        dists = sorted(
            ((int((signs[i] != signs[qid]).sum()), i) for i in range(80))
        )[:5]
        want = [(qid, i, d, rk + 1) for rk, (d, i) in enumerate(dists)]
        assert [g for g in got if g[0] == qid] == want


def test_binary_rerank_full_shortlist_is_exact(spark):
    # shortlist_k >= corpus size -> rerank degenerates to exact cosine
    import numpy as np

    from clarite_python_spark.operators import similarity

    rng = np.random.RandomState(13)
    rows = [(i, rng.randn(64).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = similarity.binary_rerank(df, q, k=5, shortlist_k=60).collect()
    want = similarity.cosine_topk(df, q, k=5).collect()
    assert [(r["query_id"], r["vec_id"], r["rank"]) for r in got] == [
        (r["query_id"], r["vec_id"], r["rank"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["cosine"] == pytest.approx(w["cosine"], abs=1e-12)


def test_ann_recall_binary_dispatch(spark):
    from clarite_python_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    row = similarity.ann_recall(
        emb, k=10, n_queries=5, method="binary", shortlist_k=200
    ).first()
    assert row["n_exact"] == 50
    # 200-deep shortlist on 500 vectors: recall should be high
    assert row["recall"] >= 0.8
    with pytest.raises(ValueError, match="method"):
        similarity.ann_recall(emb, method="nope").first()


def test_quantize_binary_validates_dim(spark):
    from clarite_python_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        similarity.quantize_binary(empty)


def test_binary_index_stored_matches_inline(spark, tmp_path):
    from clarite_python_spark.operators import similarity

    d = str(tmp_path / "bidx")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    similarity.build_binary_index(emb, d)
    inline = similarity.hamming_topk(emb, q, k=7).collect()
    stored = similarity.hamming_topk(None, q, k=7, index_dir=d).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inline]
    # rerank through the stored index too
    ri = similarity.binary_rerank(emb, q, k=5, shortlist_k=40).collect()
    rs = similarity.binary_rerank(
        emb, q, k=5, shortlist_k=40, index_dir=d
    ).collect()
    assert [tuple(r) for r in rs] == [tuple(r) for r in ri]
    # contract errors
    with pytest.raises(ValueError, match="id column"):
        similarity.hamming_topk(None, q, k=3, id_col="nope", index_dir=d)
    with pytest.raises(ValueError, match="corpus"):
        similarity.hamming_topk(None, q, k=3)


def test_cli_build_binary_index_round_trip(spark, tmp_path):
    from clarite_python_spark import cli

    d = str(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    assert cli.main(["pipeline", "build-binary-index", emb, f"{d}/idx"]) == 0
    spark.read.parquet(emb).where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding"
    ).write.parquet(f"{d}/q")
    spark.sql(
        "SELECT a.vec_id AS query_id, b.vec_id AS vec_id, 1.0 AS rel "
        f"FROM parquet.`{emb}` a JOIN parquet.`{emb}` b ON a.label = b.label "
        "WHERE a.vec_id < 2"
    ).write.parquet(f"{d}/qrels")
    assert cli.main(
        ["pipeline", "evaluate-retrieval", emb, f"{d}/q", f"{d}/qrels",
         f"{d}/ev", "--k", "5", "--retriever", "binary",
         "--index-dir", f"{d}/idx"]
    ) == 0
    ev = spark.read.parquet(f"{d}/ev")
    assert ev.count() == 2 and all(r["mrr"] == 1.0 for r in ev.collect())


def test_rank_eval_macro_is_mean_of_per_query(spark):
    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 20, 1), (1, 21, 2)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(0, 10, 1.0), (0, 99, 1.0), (1, 21, 2.0), (2, 30, 1.0)],
        "query_id long, doc_id long, rel double",
    )
    per_q = evaluation.rank_eval(results, qrels, k=2).collect()
    macro = evaluation.rank_eval_macro(results, qrels, k=2).first()
    assert macro["n_queries"] == len(per_q) == 3  # query 2 has no results
    for m in ("precision", "recall", "mrr", "ndcg"):
        mean = sum(r[m] for r in per_q) / len(per_q)
        assert macro[m] == pytest.approx(mean, abs=1e-6)
    assert macro["k"] == 2


def test_binary_rerank_requires_corpus_or_sidecar(spark, tmp_path):
    """Round-12 contract update: an index built with store_vectors=True
    (the default) serves rerank WITHOUT a live corpus; the raise is
    reserved for no-corpus-and-no-usable-sidecar (covered further in
    tests/test_round12_ops.py)."""
    from clarite_python_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    d = str(tmp_path / "idx")
    similarity.build_binary_index(emb, d)
    out = similarity.binary_rerank(None, q, k=3, index_dir=d)
    assert out.count() == 6  # 2 queries x top-3, fully index-resident
    with pytest.raises(ValueError, match="corpus"):
        similarity.binary_rerank(None, q, k=3)


def test_outlier_bounds_check_include_counts_matches_two_step(spark):
    """include_counts (r13) fuses outlier_counts onto the same
    exact-bounds agg; rows must equal the two-operator composition."""
    import numpy as np

    from clarite_python_spark.catalog import ClariteFrame
    from clarite_python_spark.operators import modify

    rng = np.random.RandomState(11)
    rows = [
        (i, float(v), float(w))
        for i, (v, w) in enumerate(
            zip(rng.lognormal(2.0, 1.0, 1500), rng.normal(5.0, 2.0, 1500))
        )
    ]
    cf = ClariteFrame(spark.createDataFrame(rows, "ID long, x double, y double"))
    cf = modify.make_continuous(cf, only=["x", "y"])
    fused = {
        r["variable"]: (r["n_removed"], r["approx_within_tol"])
        for r in modify.outlier_bounds_check(
            cf, method="iqr", cutoff=1.5, include_counts=True
        ).collect()
    }
    counts = {
        r["variable"]: r["n_removed"]
        for r in modify.outlier_counts(cf, method="iqr", cutoff=1.5).collect()
    }
    check = {
        r["variable"]: r["approx_within_tol"]
        for r in modify.outlier_bounds_check(cf, method="iqr", cutoff=1.5).collect()
    }
    assert fused == {v: (counts[v], check[v]) for v in counts}
