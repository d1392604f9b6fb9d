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


# ------------------------------------------------ BPE scale paths --


def _py_bpe_marker(texts, n_merges, marker=None, min_pair_count=2):
    """Sequential reference BPE (the r12 oracle model) with the
    Sennrich end-of-word-marker option."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    words = {w: list(w) + ([marker] if marker else []) for w in wc}
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


def test_train_bpe_driver_matches_distributed_and_reference(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    texts = [r["text"] for r in docs.select("text").collect()]
    dist = [
        tuple(r)
        for r in text_mod.train_bpe(docs, n_merges=12).orderBy("rank").collect()
    ]
    drv = [
        tuple(r)
        for r in text_mod.train_bpe(docs, n_merges=12, strategy="driver")
        .orderBy("rank")
        .collect()
    ]
    assert drv == dist == _py_bpe_marker(texts, 12)
    with pytest.raises(ValueError, match="strategy"):
        text_mod.train_bpe(docs, n_merges=5, strategy="local")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        text_mod.train_bpe(docs, n_merges=5, strategy="driver", max_vocab_rows=3)


def test_train_bpe_word_end_marker(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _py_bpe_marker(texts, 10, marker="</w>")
    for strategy in ("distributed", "driver"):
        got = [
            tuple(r)
            for r in text_mod.train_bpe(
                docs, n_merges=10, word_end_marker="</w>", strategy=strategy
            )
            .orderBy("rank")
            .collect()
        ]
        assert got == expected, strategy
    # the marker actually participates in merges on natural text
    assert any("</w>" in (l + r) for _, l, r, _ in expected)
    with pytest.raises(ValueError, match="word_end_marker"):
        text_mod.train_bpe(docs, n_merges=5, word_end_marker="")


def test_bpe_encode_pandas_matches_fold(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    merges = text_mod.train_bpe(docs, n_merges=12, strategy="driver")
    fold = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in text_mod.bpe_encode(docs, merges, encode_impl="fold").collect()
    }
    pand = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in text_mod.bpe_encode(docs, merges, encode_impl="pandas").collect()
    }
    assert fold == pand
    # marker round-trip: tokens concat == words + one marker per word
    mm = text_mod.train_bpe(
        docs, n_merges=10, word_end_marker="</w>", strategy="driver"
    )
    for impl in ("fold", "pandas"):
        got = {
            r["doc_id"]: r["tokens"]
            for r in text_mod.bpe_encode(
                docs, mm, word_end_marker="</w>", encode_impl=impl
            ).collect()
        }
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for did, toks in got.items():
            words = texts[did].lower().split()
            assert "".join(toks) == "".join(w + "</w>" for w in words)
    with pytest.raises(ValueError, match="encode_impl"):
        text_mod.bpe_encode(docs, merges, encode_impl="jvm")


def test_bpe_encode_auto_threshold(spark):
    """auto = fold at <=64 rules (the oracle-pinned path), pandas past
    that — checked via the executed plan (ArrowEvalPython/MapInPandas
    present only for the pandas segmenter)."""
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    rules = [(r["lhs"], r["rhs"]) for r in
             text_mod.train_bpe(docs, n_merges=80, strategy="driver",
                                min_pair_count=1).orderBy("rank").collect()]
    assert len(rules) > 64
    small = text_mod.bpe_encode(docs, rules[:10])
    big = text_mod.bpe_encode(docs, rules)
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in small_plan and "ArrowEvalPython" not in small_plan
    assert ("MapInPandas" in big_plan) or ("ArrowEvalPython" in big_plan)
    # and the two impls agree on the big table too
    alt = text_mod.bpe_encode(docs, rules, encode_impl="fold", checkpoint_every=16)
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, alt.collect()))


# ------------------------------------------------- sequence packing --


def test_pack_token_sequences_matches_python(spark):
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    rows = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    stream = []
    for did, txt in rows:
        stream += [(did, t) for t in txt.split()]
    seq_len = 50
    n_full = len(stream) // seq_len
    expected = []
    for c in range(n_full):
        seg = stream[c * seq_len:(c + 1) * seq_len]
        expected.append(
            (c, [t for _, t in seg], seq_len, len({d for d, _ in seg}))
        )
    toks = docs.select(
        "doc_id", text_mod.tokens(F.col("text")).alias("tokens")
    )
    got = [
        (r["seq_id"], list(r["tokens"]), r["n_tokens"], r["n_docs"])
        for r in text_mod.pack_token_sequences(toks, seq_len=seq_len).collect()
    ]
    assert got == expected
    # keep_remainder keeps the final partial chunk with the leftover
    rem = len(stream) % seq_len
    all_chunks = text_mod.pack_token_sequences(
        toks, seq_len=seq_len, drop_remainder=False
    ).collect()
    assert len(all_chunks) == n_full + (1 if rem else 0)
    if rem:
        last = all_chunks[-1]
        assert last["n_tokens"] == rem
        assert list(last["tokens"]) == [t for _, t in stream[n_full * seq_len:]]
    with pytest.raises(ValueError):
        text_mod.pack_token_sequences(toks, seq_len=0)


def test_pack_token_sequences_no_global_single_task_sort(spark):
    """The prefix-sum must NOT compile to a global no-partition window
    (a single-task sort of the corpus): the plan's window sorts are all
    preceded by a range/hash repartitioning on the partition id."""
    from clarite_python_spark.operators import text as text_mod

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        "doc_id", text_mod.tokens(F.col("text")).alias("tokens")
    )
    plan = (
        text_mod.pack_token_sequences(toks, seq_len=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_cli_r13_flags_round_trip(spark, tmp_path):
    """CLI exposure of the r13 scale paths: train-bpe --strategy driver
    --word-end-marker, bpe-encode --encode-impl pandas, cluster
    --assign-impl pandas — each must equal the library call."""
    from clarite_python_spark.cli import main as cli_main
    from clarite_python_spark.operators import similarity, text as text_mod

    d = str(tmp_path)
    docs = f"{SF_DIR}/documents.parquet"
    assert cli_main(["pipeline", "train-bpe", docs, f"{d}/merges",
                     "--n-merges", "6", "--strategy", "driver",
                     "--word-end-marker", "</w>"]) == 0
    merges = spark.read.parquet(f"{d}/merges")
    direct_m = text_mod.train_bpe(
        spark.read.parquet(docs), n_merges=6, strategy="driver",
        word_end_marker="</w>",
    )
    assert (merges.orderBy("rank").collect()
            == direct_m.orderBy("rank").collect())
    assert cli_main(["pipeline", "bpe-encode", docs, f"{d}/merges",
                     f"{d}/enc", "--word-end-marker", "</w>",
                     "--encode-impl", "pandas"]) == 0
    enc = spark.read.parquet(f"{d}/enc")
    direct = text_mod.bpe_encode(
        spark.read.parquet(docs), merges, word_end_marker="</w>",
        encode_impl="pandas",
    )
    assert (enc.orderBy("doc_id").collect()
            == direct.orderBy("doc_id").collect())

    emb = f"{SF_DIR}/embeddings.parquet"
    assert cli_main(["pipeline", "cluster", emb, f"{d}/cl",
                     "--k", "8", "--assign-impl", "pandas"]) == 0
    cl = spark.read.parquet(f"{d}/cl")
    direct_c = similarity.cluster_embeddings(
        spark.read.parquet(emb), k=8, assign_impl="pandas"
    )
    assert (cl.orderBy("vec_id").collect()
            == direct_c.orderBy("vec_id").collect())


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


def test_knn_graph_pandas_scorer_matches_join_exactly(spark):
    """score_impl='pandas' (the default cell-local numpy kernel) must be
    BIT-identical to the join plan — same doubles, same tie-breaks, same
    NULL-cosine handling — on a corpus engineered with duplicate vectors
    (cosine ties at the k boundary) and a zero vector (NULL cosine via
    try_divide)."""
    rng = np.random.RandomState(7)
    M = rng.randn(50, 6)
    M[10] = M[3]  # exact duplicates -> cosine ties broken by neighbor id
    M[20] = M[3]
    rows = [(i, [float(x) for x in M[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = similarity.knn_graph(
        df, k=4, n_lists=3, n_probe=2, sample_size=50, score_impl="join"
    ).collect()
    b = similarity.knn_graph(
        df, k=4, n_lists=3, n_probe=2, sample_size=50, score_impl="pandas"
    ).collect()
    assert a == b
    # NULL-cosine parity (zero-norm vector): the codegen ASSIGNMENT
    # rejects zero vectors outright (ANSI divide in _centroid_dots,
    # pre-existing), so exercise try_divide-NULL semantics through the
    # pandas assignment, join-scored vs kernel-scored
    M[30] = 0.0
    rows = [(i, [float(x) for x in M[i]]) for i in range(50)]
    dfz = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    az = similarity.knn_graph(
        dfz, k=4, n_lists=3, n_probe=2, sample_size=50,
        assign_impl="pandas", score_impl="join",
    ).collect()
    bz = similarity.knn_graph(
        dfz, k=4, n_lists=3, n_probe=2, sample_size=50,
        assign_impl="pandas", score_impl="pandas",
    ).collect()
    assert az == bz
    z = [r for r in bz if r["vec_id"] == 30]
    assert z and all(r["cosine"] is None for r in z)


def test_knn_graph_pandas_scorer_string_ids(spark):
    """Tie-break ordering must hold for string ids too (UTF-8 binary
    order == code-point order, the same total order numpy/pandas use)."""
    rng = np.random.RandomState(3)
    M = rng.randn(30, 5)
    M[7] = M[2]
    rows = [("id%02d" % i, [float(x) for x in M[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    a = similarity.knn_graph(
        df, k=3, n_lists=2, n_probe=1, sample_size=30, score_impl="join"
    ).collect()
    b = similarity.knn_graph(
        df, k=3, n_lists=2, n_probe=1, sample_size=30, score_impl="pandas"
    ).collect()
    assert a == b


def test_cc_driver_shortcut_matches_distributed(spark):
    """The size-guarded driver union-find must produce the identical
    (id, min-label) rows as the distributed propagation loop — deep
    chain + star + singleton-edge shapes, long and string ids."""
    from clarite_python_spark.operators import dedup

    # chain 0-1-...-19 (diameter 19), star 100-(101..110), pair (200, 201)
    edges = (
        [(i, i + 1) for i in range(19)]
        + [(100, j) for j in range(101, 111)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = sorted(
        (r["id"], r["label"])
        for r in dedup._min_label_components(df, 40, shortcut=True).collect()
    )
    b = sorted(
        (r["id"], r["label"])
        for r in dedup._min_label_components(
            df, 40, shortcut=True, driver_max_edges=0
        ).collect()
    )
    assert a == b
    assert all(lbl == 0 for i, lbl in a if i < 20)
    s = spark.createDataFrame(
        [("w%02d" % i, "w%02d" % (i + 1)) for i in range(9)],
        "id_a string, id_b string",
    )
    sa = sorted(
        (r["id"], r["label"])
        for r in dedup._min_label_components(s, 40, shortcut=True).collect()
    )
    sb = sorted(
        (r["id"], r["label"])
        for r in dedup._min_label_components(
            s, 40, shortcut=True, driver_max_edges=0
        ).collect()
    )
    assert sa == sb and all(lbl == "w00" for _, lbl in sa)


def test_language_id_staged_scores_match_direct_chain(spark):
    """r13: language_id stages the per-language stopword scores as
    columns before the best-of-K when-chain (the direct chain
    re-evaluates every fold ~2^K times per row). Rows must match the
    unstaged composition exactly, including CJK override, unknown
    fallback, and fixed-order tie-breaks."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.text import (
        _LANG_STOPWORDS,
        _stopword_hits,
        language_id,
        tokens,
    )

    rows = [
        (1, "the of and to in is it for on that"),          # en
        (2, "der die und von zu das mit sich des auf"),     # de
        (3, "el la de que y en un ser se no"),              # es
        (4, "le de un et est pour que une dans il"),        # fr
        (5, "中文文本在这里"),                                 # CJK override
        (6, "zzz qqq xxx"),                                  # unknown
        (7, ""),                                             # empty
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    # unstaged reference: the pre-r13 composition
    toks = tokens("text")
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    scores = {
        lang: (_stopword_hits(toks, words) / n_tokens)
        for lang, words in _LANG_STOPWORDS.items()
    }
    is_cjk = F.col("text").rlike("[一-鿿]")
    best_lang, best_score = F.lit("unknown"), F.lit(0.0)
    for lang in sorted(_LANG_STOPWORDS):
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    ref = df.select(
        F.col("doc_id"),
        F.when(is_cjk, F.lit("zh")).otherwise(best_lang).alias("lang_pred"),
        F.when(is_cjk, F.lit(1.0)).otherwise(best_score).alias("lang_score"),
    ).orderBy("doc_id").collect()

    got = language_id(df).orderBy("doc_id").collect()
    assert got == ref
