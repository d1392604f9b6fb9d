"""Round-12 operators: knn_graph (corpus×corpus kNN, no broadcast),
its recall harness, and the CLI contract fixes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(11)
    M = rng.randn(60, 8)
    rows = [(i, [float(x) for x in M[i]]) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), M


# ------------------------------------------------------------- knn_graph --


def test_knn_graph_full_probe_matches_numpy_exact(vec_df):
    """With n_probe == n_lists every cell is probed, so every non-self
    pair is scored — the graph must equal exact brute-force kNN."""
    df, M = vec_df
    out = similarity.knn_graph(df, k=3, n_lists=4, n_probe=4, sample_size=60)
    got = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in out.collect()
    }
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    for i in range(60):
        order = sorted(
            (j for j in range(60) if j != i), key=lambda j: (-S[i, j], j)
        )
        for r, j in enumerate(order[:3], start=1):
            nid, cos = got[(i, r)]
            assert nid == j
            assert abs(cos - S[i, j]) < 1e-9
    assert len(got) == 60 * 3


def test_knn_graph_partial_probe_is_subset_ranked(vec_df):
    """Partial probes return ≤ k neighbors per vector, each scored with
    the TRUE cosine (approximation only prunes candidates, never scores
    approximately), ranks contiguous from 1."""
    df, M = vec_df
    out = similarity.knn_graph(df, k=5, n_lists=4, n_probe=1, sample_size=60)
    rows = out.collect()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    per = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        assert abs(r["cosine"] - S[r["vec_id"], r["neighbor_id"]]) < 1e-9
        per.setdefault(r["vec_id"], []).append(r["rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_knn_graph_recall_full_probe_is_one(vec_df):
    df, _ = vec_df
    row = similarity.knn_graph_recall(
        df, k=5, n_queries=8, n_lists=4, n_probe=4, sample_size=60
    ).collect()[0]
    assert row["n_exact"] == 40
    assert row["n_approx"] == 40
    assert row["recall"] == 1.0


def test_knn_graph_recall_partial_probe_bounded(vec_df):
    df, _ = vec_df
    row = similarity.knn_graph_recall(
        df, k=5, n_queries=8, n_lists=4, n_probe=1, sample_size=60
    ).collect()[0]
    assert 0.0 <= row["recall"] <= 1.0
    assert row["n_hits"] <= row["n_exact"]


def test_knn_graph_validates_args(vec_df):
    df, _ = vec_df
    with pytest.raises(ValueError):
        similarity.knn_graph(df, k=0)
    with pytest.raises(ValueError):
        similarity.knn_graph(df, k=3, n_probe=0)


def test_knn_graph_pandas_assignment_matches_codegen(spark, vec_df):
    """assign_impl='pandas' (Arrow-batched numpy matmul — the path past
    the inlined-centroid ceiling) must produce the same graph as the
    oracle-pinned codegen assignment on the same corpus/quantizer."""
    df, _ = vec_df
    a = similarity.knn_graph(
        df, k=4, n_lists=4, n_probe=2, sample_size=60
    ).collect()
    b = similarity.knn_graph(
        df, k=4, n_lists=4, n_probe=2, sample_size=60, assign_impl="pandas"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = similarity.knn_graph(emb, k=3, n_lists=8, n_probe=3).collect()
    b = similarity.knn_graph(
        emb, k=3, n_lists=8, n_probe=3, assign_impl="pandas"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError, match="assign_impl"):
        similarity.knn_graph(emb, k=3, assign_impl="numpy")


# --------------------------------------------- fold pack at high dims --


@pytest.mark.parametrize("dim", [70, 768])
def test_quantize_binary_fold_matches_numpy_at_dim(spark, dim):
    """The constant-size fold pack (round 12 — the unrolled WHEN-chain
    hits Janino's 64KB method limit at production dims) must reproduce
    the numpy sign-bit packing exactly, including the partial trailing
    word when dim is not a multiple of 32."""
    rng = np.random.RandomState(5)
    M = rng.randn(20, dim)
    M[3, :] = 0.0  # all-nonpositive row -> all-zero words
    rows = [(i, [float(x) for x in M[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["bvec"]
        for r in similarity.quantize_binary(df, dim=dim).collect()
    }
    words = (dim + 31) // 32
    for i in range(20):
        expect = [0] * words
        for j in range(dim):
            if M[i, j] > 0:
                expect[j // 32] |= 1 << (j % 32)
        assert got[i] == expect, f"row {i}"


def test_quantize_binary_compiles_at_dim_4096(spark):
    """dim=4096 is the regime where the unrolled pack threw
    InternalCompilerException (round-12 probe); the fold must run."""
    rng = np.random.RandomState(6)
    rows = [(i, [float(x) for x in rng.randn(4096)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.quantize_binary(df, dim=4096).collect()
    assert len(out) == 4 and len(out[0]["bvec"]) == 128


# ------------------------------------------------------------ train_bpe --


def _py_bpe(texts, n_merges, min_pair_count=2):
    """Independent reference BPE (Sennrich 2016, greedy left-to-right
    merge, (count desc, pair asc) tie-break, no end-of-word marker)."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = []
    for r in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((r, a, b, cnt))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    return merges


def test_train_bpe_matches_reference_python_bpe(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(150)
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _py_bpe(texts, 10)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["freq"])
        for r in text_mod.train_bpe(docs, n_merges=10).orderBy("rank").collect()
    ]
    assert got == expected


def test_train_bpe_overlap_and_early_stop(spark):
    """Greedy left-to-right on runs (aaa -> [aa, a]) and the
    min_pair_count early stop."""
    from clarite_python_spark.operators import text as text_mod

    df = spark.createDataFrame(
        [("aaa aaa aab",), ("aaa b",)], "text string"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["freq"])
        for r in text_mod.train_bpe(df, n_merges=50).orderBy("rank").collect()
    ]
    expected = _py_bpe(["aaa aaa aab", "aaa b"], 50)
    assert got == expected
    assert len(got) < 50  # pairs dry up -> early stop fired
    # rank 1 merges (a,a): 3 'aaa' words contribute 2 each, 'aab' 1 -> 7
    assert got[0] == (1, "a", "a", 7)

    with pytest.raises(ValueError):
        text_mod.train_bpe(df, n_merges=0)
    with pytest.raises(ValueError):
        text_mod.train_bpe(df, n_merges=5, min_pair_count=0)


def test_bpe_encode_matches_reference_and_preserves_text(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_merges = 8
    merges = text_mod.train_bpe(docs, n_merges=n_merges)
    rules = [(r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()]
    got = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in text_mod.bpe_encode(docs, merges).collect()}

    def seg(word):
        syms = list(word)
        for a, b in rules:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    for did, text in texts.items():
        expect = [t for w in text.lower().split() for t in seg(w)]
        toks, n = got[did]
        assert toks == expect, did
        assert n == len(expect)
        # lossless: concatenated tokens reproduce the words
        assert "".join(toks) == "".join(text.lower().split())

    # list-of-pairs form matches the DataFrame form
    alt = {r["doc_id"]: r["tokens"]
           for r in text_mod.bpe_encode(docs, rules).collect()}
    assert alt == {d: t for d, (t, _) in got.items()}


# ------------------------------------- index-resident binary_rerank --


def test_binary_rerank_stored_equals_live(spark, tmp_path):
    """binary_rerank(corpus=None, index_dir=...) against the vectors/
    sidecar must match the live-corpus form row-for-row."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "bidx")
    similarity.build_binary_index(emb, idx, dim=64, store_vectors=True)
    live = similarity.binary_rerank(emb, q, k=6, shortlist_k=30, dim=64).collect()
    stored = similarity.binary_rerank(
        None, q, k=6, shortlist_k=30, index_dir=idx
    ).collect()
    assert [tuple(r) for r in live] == [tuple(r) for r in stored]


def test_binary_rerank_no_sidecar_raises(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "bidx_novec")
    similarity.build_binary_index(emb, idx, dim=64, store_vectors=False)
    with pytest.raises(ValueError, match="vectors/ sidecar"):
        similarity.binary_rerank(None, q, k=3, index_dir=idx)
    with pytest.raises(ValueError, match="corpus DataFrame or an index_dir"):
        similarity.binary_rerank(None, q, k=3)


def test_cli_evaluate_retrieval_index_resident(spark, tmp_path):
    """'-' corpus + --index-dir: the whole retrieval-quality loop runs
    from the stored index with no live corpus mounted."""
    from clarite_python_spark.cli import main as cli_main

    d = str(tmp_path)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rc = cli_main(
        ["pipeline", "build-binary-index",
         f"{SF_DIR}/embeddings.parquet", f"{d}/idx"]
    )
    assert rc == 0
    _write(emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"), f"{d}/q")
    _write(
        emb.where("vec_id < 3").selectExpr(
            "vec_id as query_id", "vec_id", "1 as rel"
        ),
        f"{d}/qrels",
    )
    rc = cli_main(
        ["pipeline", "evaluate-retrieval", "-",
         f"{d}/q", f"{d}/qrels", f"{d}/metrics",
         "--retriever", "binary", "--k", "5", "--index-dir", f"{d}/idx"]
    )
    assert rc == 0
    rows = spark.read.parquet(f"{d}/metrics").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["hits"] == 1  # each query's sole judged doc is itself

    # '-' without --index-dir (or non-binary retriever) is refused
    assert cli_main(
        ["pipeline", "evaluate-retrieval", "-",
         f"{d}/q", f"{d}/qrels", f"{d}/m2", "--retriever", "cosine"]
    ) == 2


def test_cli_bpe_and_knn_graph_round_trip(spark, tmp_path):
    from clarite_python_spark.cli import main as cli_main
    from clarite_python_spark.operators import similarity, text as text_mod

    d = str(tmp_path)
    docs = f"{SF_DIR}/documents.parquet"
    assert cli_main(["pipeline", "train-bpe", docs, f"{d}/merges",
                     "--n-merges", "6"]) == 0
    merges = spark.read.parquet(f"{d}/merges")
    assert merges.count() == 6
    assert cli_main(["pipeline", "bpe-encode", docs, f"{d}/merges",
                     f"{d}/enc"]) == 0
    enc = spark.read.parquet(f"{d}/enc")
    direct = text_mod.bpe_encode(spark.read.parquet(docs), merges)
    assert enc.orderBy("doc_id").collect() == direct.orderBy("doc_id").collect()

    emb = f"{SF_DIR}/embeddings.parquet"
    assert cli_main(["pipeline", "knn-graph", emb, f"{d}/g",
                     "--k", "3", "--n-lists", "4", "--n-probe", "4"]) == 0
    g = spark.read.parquet(f"{d}/g")
    direct_g = similarity.knn_graph(
        spark.read.parquet(emb), k=3, n_lists=4, n_probe=4
    )
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, direct_g.collect()))
    assert cli_main(["pipeline", "knn-graph", emb, f"{d}/r", "--recall",
                     "--k", "5", "--n-lists", "4", "--n-probe", "4",
                     "--n-queries", "6"]) == 0
    row = spark.read.parquet(f"{d}/r").collect()[0]
    assert row["recall"] == 1.0  # full probe -> exact


# ----------------------------------------------------- CC sizing guard --


def test_cc_heap_guard_warns_and_still_runs(spark, monkeypatch):
    """Under-provisioned heap for the edge count -> ResourceWarning with
    the sizing rule; the kernel still runs to the correct answer (guard,
    not gate)."""
    import warnings

    from clarite_python_spark.operators import dedup as dedup_mod
    from clarite_python_spark.operators import graph as graph_mod

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    monkeypatch.setattr(dedup_mod, "_EDGES_PER_GB", 1)  # 3 edges > 1 GB heap
    monkeypatch.setattr(dedup_mod, "_session_heap_gb", lambda s: 1.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = graph_mod.connected_components(edges).collect()
    msgs = [str(x.message) for x in w if x.category is ResourceWarning]
    assert any("sizing rule" in m for m in msgs)
    labels = {r["node"]: r["component"] for r in out}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_heap_guard_silent_when_provisioned(spark):
    import warnings

    from clarite_python_spark.operators import graph as graph_mod

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph_mod.connected_components(edges).collect()
    # filter to the guard's own message — py4j leaks unrelated
    # unclosed-socket ResourceWarnings in-process
    assert not [
        x for x in w
        if x.category is ResourceWarning and "sizing rule" in str(x.message)
    ]


def test_parse_jvm_mem_gb():
    from clarite_python_spark.operators.dedup import _parse_jvm_mem_gb

    assert _parse_jvm_mem_gb("8g") == 8.0
    assert _parse_jvm_mem_gb("512m") == 0.5
    assert _parse_jvm_mem_gb("1t") == 1024.0
    assert abs(_parse_jvm_mem_gb("1048576k") - 1.0) < 1e-9
    assert _parse_jvm_mem_gb("weird") is None
    # bare number = MiB (Spark byteStringAsMb semantics), not bytes
    assert _parse_jvm_mem_gb("4096") == 4.0
    assert _parse_jvm_mem_gb("512mb") == 0.5
    assert _parse_jvm_mem_gb("8gb") == 8.0


# ------------------------------------------------------------ CLI fixes --


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def test_cli_table_diff_rejects_right_plus_snapshot(spark, tmp_path, capsys):
    from clarite_python_spark.cli import main as cli_main
    from clarite_python_spark.operators import evaluation

    d = str(tmp_path)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(50)
    _write(orders, f"{d}/old")
    _write(orders, f"{d}/new")
    evaluation.save_snapshot(orders, f"{d}/snap")
    rc = cli_main(
        ["pipeline", "table-diff", f"{d}/old", f"{d}/new", f"{d}/out",
         "--keys", "o_orderkey", "--snapshot-dir", f"{d}/snap"]
    )
    assert rc == 2
    assert "not both" in capsys.readouterr().err


def test_cli_evaluate_retrieval_shortlist_k(spark, tmp_path):
    """--shortlist-k reaches binary_rerank: a shortlist of 1 can only
    ever surface one candidate per query, so metrics differ from the
    default depth."""
    from clarite_python_spark.cli import main as cli_main

    d = str(tmp_path)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _write(emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"), f"{d}/q")
    qrels = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("vec_id").alias("vec_id2"),
    ).selectExpr("query_id", "query_id as vec_id", "1 as rel")
    _write(qrels, f"{d}/qrels")
    rc = cli_main(
        ["pipeline", "evaluate-retrieval",
         f"{SF_DIR}/embeddings.parquet", f"{d}/q", f"{d}/qrels", f"{d}/m1",
         "--retriever", "binary", "--k", "5", "--shortlist-k", "1"]
    )
    assert rc == 0
    m1 = spark.read.parquet(f"{d}/m1")
    rows = m1.collect()
    assert len(rows) == 3
    # shortlist 1 returns exactly one candidate per query -> the self
    # vector (Hamming 0, rerank cosine 1.0), so precision@5 is 1/5
    for r in rows:
        assert abs(r["precision"] - 0.2) < 1e-9
        assert r["hits"] == 1
