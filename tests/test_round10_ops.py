"""Round-10 additions: graph CC, table_diff, rank_eval, mmr_rerank."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from clarite_python_spark.operators import evaluation, graph, similarity


# ---------------------------------------------------------------- graph --


def test_connected_components_paths_and_isolates(spark):
    # two paths (1-2-3-4, 10-11), one isolated edge (20-21), a star (30;31,32,33)
    edges = spark.createDataFrame(
        [
            (1, 2),
            (2, 3),
            (3, 4),
            (10, 11),
            (20, 21),
            (30, 31),
            (30, 32),
            (30, 33),
        ],
        "src long, dst long",
    )
    got = {
        (r["node"], r["component"])
        for r in graph.connected_components(edges).collect()
    }
    want = {
        (1, 1),
        (2, 1),
        (3, 1),
        (4, 1),
        (10, 10),
        (11, 10),
        (20, 20),
        (21, 20),
        (30, 30),
        (31, 30),
        (32, 30),
        (33, 30),
    }
    assert got == want


def test_connected_components_long_chain_iterates(spark):
    # a 40-node path: diameter 39 forces many propagation rounds.
    # shortcut=True (pointer jumping) must converge to the identical
    # labeling in O(log d) rounds; max_iter=12 < 39 proves the jumps
    # actually happen (the plain arm would NOT converge in 12).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 139)], "src long, dst long"
    )
    for kwargs in ({"max_iter": 60, "shortcut": False}, {"max_iter": 12}):
        rows = graph.connected_components(edges, **kwargs).collect()
        assert len(rows) == 40
        assert {r["component"] for r in rows} == {100}


def test_component_sizes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    got = {
        (r["component"], r["n_nodes"])
        for r in graph.component_sizes(edges).collect()
    }
    assert got == {(1, 3), (10, 2)}


def test_connected_components_null_edges_dropped(spark):
    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    rows = graph.connected_components(edges).collect()
    assert {r["node"] for r in rows} == {1, 2}


# ----------------------------------------------------------- table_diff --


def _diff_frames(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),  # same
            (2, "B", 20.0),  # s changed
            (3, "c", 30.0),  # v changed (null -> value)
            (5, "e", 50.0),  # added
        ],
        "k long, s string, v double",
    )
    return old, new


def test_table_diff_statuses(spark):
    old, new = _diff_frames(spark)
    rows = {
        r["k"]: (r["status"], r["n_changed"], r["changed_cols"])
        for r in evaluation.table_diff(old, new, keys=["k"]).collect()
    }
    assert rows == {
        2: ("changed", 1, "s"),
        3: ("changed", 1, "v"),
        4: ("removed", 0, ""),
        5: ("added", 0, ""),
    }


def test_table_diff_include_same_and_compare_subset(spark):
    old, new = _diff_frames(spark)
    rows = {
        r["k"]: r["status"]
        for r in evaluation.table_diff(
            old, new, keys=["k"], compare=["s"], include_same=True
        ).collect()
    }
    # restricting compare to s: row 3's v change is invisible -> 'same'
    assert rows == {
        1: "same",
        2: "changed",
        3: "same",
        4: "removed",
        5: "added",
    }


def test_table_diff_multi_key_and_multi_change(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0, "p"), (1, "y", 2.0, "q")], "k1 long, k2 string, v double, w string"
    )
    new = spark.createDataFrame(
        [(1, "x", 9.0, "P"), (1, "y", 2.0, "q")], "k1 long, k2 string, v double, w string"
    )
    rows = evaluation.table_diff(old, new, keys=["k1", "k2"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k1"], r["k2"], r["status"], r["n_changed"]) == (1, "x", "changed", 2)
    assert r["changed_cols"] == "v,w"


# ------------------------------------------------------------ rank_eval --


def test_rank_eval_hand_computed(spark):
    # query 0: rels {d1: 2, d3: 1, d9: 1}; results top-4 = d1,d2,d3,d4
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 4, 4)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 2.0), (0, 3, 1.0), (0, 9, 1.0)],
        "query_id long, doc_id long, rel double",
    )
    row = evaluation.rank_eval(results, qrels, k=4).collect()[0]
    assert row["n_rel"] == 3 and row["hits"] == 2
    assert row["precision"] == pytest.approx(2 / 4, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["mrr"] == pytest.approx(1.0, abs=1e-6)
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_rank_eval_no_relevant_hits(spark):
    results = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2)], "query_id long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(7, 99, 1.0)], "query_id long, doc_id long, rel double"
    )
    row = evaluation.rank_eval(results, qrels, k=10).collect()[0]
    assert row["hits"] == 0 and row["mrr"] == 0.0 and row["ndcg"] == 0.0
    assert row["n_rel"] == 1


def test_rank_eval_query_only_in_qrels(spark):
    results = spark.createDataFrame(
        [(1, 5, 1)], "query_id long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, 5, 1.0), (2, 6, 1.0)], "query_id long, doc_id long, rel double"
    )
    rows = {r["query_id"]: r for r in evaluation.rank_eval(results, qrels, k=5).collect()}
    assert rows[1]["ndcg"] == pytest.approx(1.0)
    assert rows[2]["hits"] == 0 and rows[2]["n_rel"] == 1


# ----------------------------------------------------------- mmr_rerank --


def _mmr_reference(vecs, qids, qvecs, k, fetch_k, lam):
    """Plain-python replay of the documented greedy (round-6 + min-id)."""
    ids = sorted(vecs)
    V = {i: np.asarray(vecs[i], dtype=np.float64) for i in ids}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    out = []
    for qid, qv in zip(qids, qvecs):
        qv = np.asarray(qv, dtype=np.float64)
        scored = sorted(
            ((cos(V[i], qv), i) for i in ids), key=lambda t: (-t[0], t[1])
        )[:fetch_k]
        cand = [(i, rel) for rel, i in scored]
        cand.sort()
        sel = []
        for step in range(min(k, len(cand))):
            best = None
            for i, rel in cand:
                if any(i == s for s, _ in sel):
                    continue
                if step == 0:
                    score = round(lam * rel, 6)
                else:
                    ms = max(cos(V[i], V[s]) for s, _ in sel)
                    score = round(lam * rel - (1.0 - lam) * ms, 6)
                if best is None or score > best[1]:
                    best = (i, score)
            sel.append(best)
            out.append((qid, best[0], step + 1, best[1]))
    return out


def test_mmr_rerank_matches_reference_and_diversifies(spark):
    rng = np.random.RandomState(42)
    base = rng.randn(4, 8)
    rows = []
    # one tight near-dup cluster of the query + moderately-similar
    # alternatives (cos ~0.7 to the query, mutually less similar)
    vid = 0
    for _ in range(5):
        rows.append((vid, (base[0] + 0.01 * rng.randn(8)).tolist()))
        vid += 1
    for _ in range(10):
        rows.append((vid, (base[0] + rng.randn(8)).tolist()))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, base[0].tolist())], "query_id long, embedding array<double>"
    )
    got = [
        (r["query_id"], r["vec_id"], r["rank"], r["mmr"])
        for r in similarity.mmr_rerank(
            corpus, queries, k=6, fetch_k=12, lambda_=0.3
        ).collect()
    ]
    want = _mmr_reference(
        dict(rows), [0], [base[0].tolist()], k=6, fetch_k=12, lam=0.3
    )
    assert [(q, d, rk) for q, d, rk, _ in got] == [
        (q, d, rk) for q, d, rk, _ in want
    ]
    for (_, _, _, a), (_, _, _, b) in zip(got, want):
        assert a == pytest.approx(b, abs=2e-6)
    # diversification: plain cosine top-6 is dominated by the near-dup
    # cluster (ids < 5); MMR at lambda=0.3 must NOT be
    plain = similarity.cosine_topk(corpus, queries, k=6).collect()
    plain_c0 = sum(1 for r in plain if r["vec_id"] < 5)
    mmr_c0 = sum(1 for q, d, rk, _ in got if d < 5)
    assert plain_c0 == 5 and mmr_c0 < 5


def test_mmr_rerank_lambda_one_is_cosine_order(spark):
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(6).tolist()) for i in range(30)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[7][1])], "query_id long, embedding array<double>"
    )
    mmr = similarity.mmr_rerank(corpus, queries, k=5, fetch_k=10, lambda_=1.0)
    cosine = similarity.cosine_topk(corpus, queries, k=5)
    got = [(r["query_id"], r["vec_id"], r["rank"]) for r in mmr.collect()]
    want = [(r["query_id"], r["vec_id"], r["rank"]) for r in cosine.collect()]
    assert got == want


def test_mmr_rerank_precomputed_candidates(spark):
    # feeding cosine_topk's own output through candidates= must be
    # identical to the default internal fetch — the ANN-composition path
    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(6).tolist()) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, rows[3][1]), (1, rows[9][1])], "query_id long, embedding array<double>"
    )
    cand = similarity.cosine_topk(corpus, queries, k=10)
    via_cand = similarity.mmr_rerank(
        corpus, queries, k=4, lambda_=0.5, candidates=cand
    ).collect()
    default = similarity.mmr_rerank(
        corpus, queries, k=4, fetch_k=10, lambda_=0.5
    ).collect()
    assert [tuple(r) for r in via_cand] == [tuple(r) for r in default]


def test_mmr_rerank_fewer_candidates_than_k(spark):
    rows = [(i, [float(i + 1), 1.0]) for i in range(3)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0])], "query_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank(corpus, queries, k=10, fetch_k=10).collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]


# ------------------------------------------------- review-fix regressions --


def test_connected_components_raises_when_unconverged(spark):
    # diameter 14 path, plain kernel, max_iter=3: fixpoint unreachable ->
    # must raise, never return silently-wrong labels
    # driver_max_edges=0 forces the distributed loop whose convergence
    # proof is under test (small graphs otherwise take the r13 driver
    # union-find shortcut, which has no rounds to bound)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(
            edges, max_iter=3, shortcut=False, driver_max_edges=0
        )
    # the pointer-jumped arm converges within the same tiny budget
    rows = graph.connected_components(
        edges, max_iter=6, shortcut=True, driver_max_edges=0
    ).collect()
    assert {r["component"] for r in rows} == {0}


def test_mmr_rerank_zero_vector_sorts_last(spark):
    # a zero-norm corpus vector yields a null/NaN cosine; it must never
    # win the greedy argmax (NaN would propagate as the max)
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank(corpus, queries, k=3, fetch_k=4, lambda_=0.5).collect()
    assert out[0]["vec_id"] == 1  # exact match wins rank 1
    assert all(r["vec_id"] != 0 for r in out[:2])


def test_rank_eval_keeps_all_zero_rel_queries(spark):
    # TREC qrels carry explicit rel=0 rows; a query judged entirely
    # non-relevant must still appear with zeroed metrics
    results = spark.createDataFrame(
        [(1, 5, 1)], "query_id long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, 5, 1.0), (2, 6, 0.0), (2, 7, 0.0)],
        "query_id long, doc_id long, rel double",
    )
    rows = {r["query_id"]: r for r in evaluation.rank_eval(results, qrels, k=5).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_rel"] == 0 and rows[2]["ndcg"] == 0.0


def test_rank_eval_negative_rel_never_subtracts(spark):
    # spam judgments (rel=-1) in the retrieved list must not produce
    # negative gain (2^-1 - 1 < 0) in dcg
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(0, 1, -1.0), (0, 2, 1.0)], "query_id long, doc_id long, rel double",
    )
    row = evaluation.rank_eval(results, qrels, k=5).collect()[0]
    assert row["hits"] == 1 and row["n_rel"] == 1
    # dcg = 1/log2(3), idcg = 1/log2(2) -> ndcg strictly between 0 and 1
    assert 0.0 < row["ndcg"] < 1.0
    assert row["ndcg"] == pytest.approx((1 / math.log2(3)) / 1.0, abs=1e-6)


def test_table_diff_empty_keys_raises(spark):
    old, new = _diff_frames(spark)
    with pytest.raises(ValueError, match="key column"):
        evaluation.table_diff(old, new, keys=[])


def test_mmr_rerank_null_embedding_rows_are_dropped(spark):
    # a NULL corpus embedding must not crash the pandas greedy stage
    # (np.array on a ragged/None list) — in either path
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    got = similarity.mmr_rerank(corpus, queries, k=4, fetch_k=4).collect()
    assert [r["vec_id"] for r in got] and 2 not in {r["vec_id"] for r in got}
    # candidates path: a candidate id whose corpus vector is NULL
    cand = spark.createDataFrame(
        [(0, 0, 0.9), (0, 2, 0.8), (0, 3, 0.1)],
        "query_id long, vec_id long, cosine double",
    )
    via = similarity.mmr_rerank(
        corpus, queries, k=3, candidates=cand
    ).collect()
    assert {r["vec_id"] for r in via} == {0, 3}
