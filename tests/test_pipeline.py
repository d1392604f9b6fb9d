"""Tests for dataset-pipeline ops: deterministic split/sample, sequence
packing, PII redaction."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators import pipeline, text
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


# ---------------------------------------------------------------- split


def test_split_covers_all_rows_and_matches_duckdb(docs):
    out = pipeline.deterministic_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"
    )
    got = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert None not in got  # fractions sum to 1 => no held-out rows
    assert sum(got.values()) == docs.count()
    # engine-portability: DuckDB reproduces the same assignment per id
    want = dict(
        duckdb.sql(
            f"""
        WITH b AS (
          SELECT CASE
            WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT list_sum(list_transform(range(1, 16),
                  k -> (CAST(strpos('0123456789abcdef',
                         substr(md5(doc_id || ':s1'), k, 1)) AS BIGINT) - 1)
                       << ((15 - k) * 4))) % 10000 AS bucket
                FROM '{DOCS}')
        ) SELECT split, count(*) FROM b GROUP BY split
        """
        ).fetchall()
    )
    assert got == want


def test_split_fraction_validation(docs):
    with pytest.raises(ValueError):
        pipeline.deterministic_split(docs, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        pipeline.deterministic_split(docs, {"a": -0.1})


def test_split_remainder_is_null(docs):
    out = pipeline.deterministic_split(docs, {"train": 0.5}, salt="x")
    n_null = out.where(F.col("split").isNull()).count()
    n = docs.count()
    assert 0 < n_null < n
    # roughly half (hash-uniform; 500 docs so allow generous slack)
    assert abs(n_null / n - 0.5) < 0.1


# --------------------------------------------------------------- sample


def test_sample_nesting_property(docs):
    """A higher sampling rate keeps a superset of a lower rate."""
    lo = {r[0] for r in pipeline.deterministic_sample(docs, 0.2, salt="n").select("doc_id").collect()}
    hi = {r[0] for r in pipeline.deterministic_sample(docs, 0.6, salt="n").select("doc_id").collect()}
    assert lo <= hi
    assert len(lo) < len(hi)


def test_sample_is_partitioning_invariant(docs):
    a = {r[0] for r in pipeline.deterministic_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r[0]
        for r in pipeline.deterministic_sample(docs.repartition(17), 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_stratified_mixture_rates(docs):
    fr = {"src0": 1.0, "src1": 0.0}
    out = pipeline.deterministic_sample(docs, by="source", fractions=fr, fraction=0.5)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get("src0") == base["src0"]  # rate 1.0 keeps everything
    assert "src1" not in got  # rate 0.0 drops the stratum
    for s, n in base.items():
        if s not in fr:  # default rate applies to unlisted strata
            assert 0 < got[s] < n


# ----------------------------------------------------------------- pack


def test_pack_sequences_layout(docs):
    out = pipeline.pack_sequences(docs, max_tokens=512).orderBy("source", "doc_id")
    rows = out.select("source", "doc_id", "n_tokens", "seq_id", "seq_offset").collect()
    # recompute the concat-chunk layout in python per source
    run: dict[str, int] = {}
    for r in rows:
        start = run.get(r["source"], 0)
        assert r["seq_id"] == start // 512
        assert r["seq_offset"] == start % 512
        run[r["source"]] = start + r["n_tokens"]


def test_pack_sequences_sharded_determinism(docs):
    """Shard assignment is content-hashed, so results don't depend on
    input partitioning; each (source, shard) packs independently."""
    a = pipeline.pack_sequences(docs, 256, n_shards=4)
    b = pipeline.pack_sequences(docs.repartition(13), 256, n_shards=4)
    cols = ["doc_id", "shard", "seq_id", "seq_offset"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
    assert a.select("shard").distinct().count() == 4


def test_pack_rejects_bad_max():
    with pytest.raises(ValueError):
        pipeline.pack_sequences(None, 0)


# --------------------------------------------------------------- redact


def test_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or +1 (555) 123-4567 ok"),
            (2, "server 10.0.0.1 and 192.168.1.254 up"),
            (3, "clean text, nothing here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in text.redact(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["n_redacted"] == 2
    assert "[email]" in out[1]["text_redacted"] and "[phone]" in out[1]["text_redacted"]
    assert "bob@example.com" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 2 and "[ipv4]" in out[2]["text_redacted"]
    assert out[3]["n_redacted"] == 0 and out[3]["text_redacted"] == "clean text, nothing here"


def test_redact_patterns_portable_to_duckdb(docs):
    """The same pattern strings produce the same counts in DuckDB's RE2."""
    got = (
        text.redact(docs)
        .agg(
            F.sum("n_email").alias("e"),
            F.sum("n_phone").alias("p"),
            F.sum("n_ipv4").alias("i"),
        )
        .collect()[0]
    )
    e, p, i = duckdb.sql(
        f"""
        SELECT sum(len(regexp_extract_all(text, '{text.PII_PATTERNS["email"]}'))),
               sum(len(regexp_extract_all(text, '{text.PII_PATTERNS["phone"]}'))),
               sum(len(regexp_extract_all(text, '{text.PII_PATTERNS["ipv4"]}')))
        FROM '{DOCS}'
        """
    ).fetchone()
    assert (got["e"], got["p"], got["i"]) == (e, p, i)


# ------------------------------------------------------------ top_tokens


def test_top_tokens_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(1, "a", "b b c"), (2, "a", "b c c c"), (3, "z", "d d")],
        ["doc_id", "source", "text"],
    )
    top = {(r["token"], r["n"], r["rank"]) for r in text.top_tokens(df, k=2).collect()}
    assert top == {("c", 4, 1), ("b", 3, 2)}
    grouped = text.top_tokens(df, k=1, by="source").collect()
    got = {(r["source"], r["token"], r["n"]) for r in grouped}
    assert got == {("a", "c", 4), ("z", "d", 2)}


def test_top_tokens_tie_break_lexicographic(spark):
    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    rows = text.top_tokens(df, k=2).orderBy("rank").collect()
    assert [(r["token"], r["rank"]) for r in rows] == [("x", 1), ("y", 2)]


def test_bpe_token_count_semantics(spark):
    df = spark.createDataFrame(
        [(1, "don't stop-me now, x2!"), (2, "  spaced   out  "), (3, "abc123")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", text.bpe_token_count("text").alias("n")).collect()}
    # don|'t| stop|-|me| now|,| x|2|! -> 10
    assert got[1] == 10
    # "  "|spaced|"   "|out|"  " -> runs of ws + words; leading run "  ",
    # "spaced", "   ", "out", "  " = 5
    assert got[2] == 5
    assert got[3] == 2  # abc|123


def test_bpe_pattern_portable_to_duckdb(docs):
    import duckdb

    got = docs.select(F.sum(text.bpe_token_count("text")).alias("n")).collect()[0]["n"]
    pat = text.BPE_ISH_PATTERN.replace("'", "''")
    want = duckdb.sql(
        f"SELECT sum(len(regexp_extract_all(text, '{pat}'))) FROM '{DOCS}'"
    ).fetchone()[0]
    assert got == want


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "A  B   C"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["rolling_fp"] for r in text.rolling_fingerprint(df).collect()}
    assert got[1] != got[2]       # order matters (unlike a set hash)
    assert got[1] == got[3]       # case/whitespace-normalized tokens
    assert got[4] == 0            # empty doc folds to the seed
    # incremental property: fp("a b c d") = (fp("a b c")*B + h(d)) % M
    ext = {r["doc_id"]: r["rolling_fp"] for r in text.rolling_fingerprint(
        spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])).collect()}
    hd = {r["doc_id"]: r["rolling_fp"] for r in text.rolling_fingerprint(
        spark.createDataFrame([(8, "d")], ["doc_id", "text"])).collect()}
    M = (1 << 31) - 1
    assert ext[9] == (got[1] * 131 + hd[8]) % M


def test_null_text_behavior_pinned(spark):
    """NULL text propagates as NULL stats/redactions (pandas-style),
    never crashes, and never perturbs neighbors' packing."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "c d e")], ["doc_id", "text"]
    )
    red = {r["doc_id"]: r["n_redacted"] for r in text.redact(df).collect()}
    assert red[1] == 0 and red[2] is None and red[3] == 0

    packed = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"])
        for r in pipeline.pack_sequences(
            df.withColumn("source", F.lit("s")), max_tokens=4
        ).collect()
    }
    assert packed[1] == (2, 0)
    assert packed[2][0] is None  # null doc contributes nothing
    assert packed[3] == (3, 0)  # neighbor layout unaffected (2+3 <= 4? no:
    # doc3 starts at offset 2 -> seq 0)

    fp = {r["doc_id"]: r["rolling_fp"] for r in text.rolling_fingerprint(df).collect()}
    assert fp[2] is None and fp[1] is not None


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "a b"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens_n"])
        for r in pipeline.chunk_documents(df, chunk_tokens=3, overlap=1).collect()
    }
    # stride 2: [0:3],[2:5],[4:7] — 3 chunks cover all 7 tokens
    assert rows[(1, 0)] == ("t0 t1 t2", 3)
    assert rows[(1, 1)] == ("t2 t3 t4", 3)
    assert rows[(1, 2)] == ("t4 t5 t6", 3)
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ("a b", 2)
    assert not any(d in (3, 4) for d, _ in rows)  # empty/null yield no chunks

    no_overlap = {
        r["chunk_id"]: r["chunk_text"]
        for r in pipeline.chunk_documents(
            df.where("doc_id = 1"), chunk_tokens=4
        ).collect()
    }
    assert no_overlap == {0: "t0 t1 t2 t3", 1: "t4 t5 t6"}

    with pytest.raises(ValueError):
        pipeline.chunk_documents(df, 0)
    with pytest.raises(ValueError):
        pipeline.chunk_documents(df, 4, overlap=4)


def test_winnow_fingerprints_overlap_guarantee(spark):
    """Two docs sharing a run of window+k-1 tokens share >=1 fingerprint;
    disjoint docs share none (here: different token universes)."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = window+k-1 with k=3,w=4
    df = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing stuff here"),
            (2, f"{shared} completely other ending tokens"),
            (3, "unrelated vocabulary entirely distinct everywhere now"),
            (4, "ab"),   # fewer than k tokens -> no fingerprints
        ],
        ["doc_id", "text"],
    )
    fps = {}
    for r in text.winnow_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2]           # shared run detected
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert 4 not in fps
    # density: far fewer fingerprints than grams (selection actually prunes)
    n_grams_doc1 = 10 - 3 + 1
    assert 0 < len(fps[1]) < n_grams_doc1


def test_winnow_fingerprints_case_ws_normalized(spark):
    df = spark.createDataFrame(
        [(1, "One Two Three Four Five"), (2, "one  two   three four five")],
        ["doc_id", "text"],
    )
    fps = {}
    for r in text.winnow_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] == fps[2]


def test_winnow_matches_pairs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing stuff"),
            (2, f"{shared} other ending"),
            (3, "unrelated vocabulary entirely distinct everywhere"),
        ],
        ["doc_id", "text"],
    )
    rows = text.winnow_matches(df, min_shared=1).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


# ---------------------------------------------------------------- gopher


def test_gopher_rules_edge_cases(spark):
    rows = [
        # 60 plain words incl. 'the' and 'of' -> passes everything
        (1, " ".join(["the", "of"] + ["word"] * 58)),
        # bullet-heavy + ellipsis-heavy multiline doc
        (2, "- item one...\n- item two...\n- item three...\nplain tail line"),
        # symbol-dense short doc
        (3, "# # # ... tiny"),
        # numeric-only words fail the alpha rule
        (4, " ".join(["123"] * 60)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text.gopher_rules(df).collect()}

    assert got[1]["gopher_pass"] is True
    assert got[1]["n_stopwords"] == 2 and got[1]["pass_stopwords"] is True

    # doc 2: 4 non-empty lines, 3 bullet-started, 3 ellipsis-ended
    assert got[2]["bullet_frac"] == pytest.approx(0.75)
    assert got[2]["ellipsis_frac"] == pytest.approx(0.75)
    assert got[2]["pass_ellipsis"] is False and got[2]["pass_bullets"] is True

    # doc 3: 5 words, 3 '#' + 1 '...' -> symbol_ratio 0.8
    assert got[3]["symbol_ratio"] == pytest.approx(0.8)
    assert got[3]["pass_symbols"] is False and got[3]["pass_word_count"] is False

    assert got[4]["alpha_frac"] == 0.0
    assert got[4]["pass_alpha"] is False and got[4]["pass_word_count"] is True


def test_repetition_stats_known_values(spark):
    rows = [
        # 'a b' appears twice (6 words, 5 distinct? a,b repeated)
        (1, "a b c a b d"),
        # heavy 3x repetition of 'x y'
        (2, "x y x y x y"),
        # no repetition at all
        (3, "p q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text.repetition_stats(df).collect()}

    # doc 1: 6 words, 4 distinct -> dup 2/6; top 2-gram 'a b' x2, len 3,
    # chars 11 -> 6/11
    assert got[1]["dup_word_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert got[1]["top2_char_frac"] == pytest.approx(6 / 11, abs=1e-6)

    # doc 2: top 2-gram 'x y' x3 (overlapping occurrences counted as
    # distinct start positions), len 3, chars 11 -> 9/11
    assert got[2]["dup_word_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert got[2]["top2_char_frac"] == pytest.approx(9 / 11, abs=1e-6)

    assert got[3]["dup_word_frac"] == 0.0
    # all 2-grams unique -> top one covers len 3 of 7 chars
    assert got[3]["top2_char_frac"] == pytest.approx(3 / 7, abs=1e-6)


def test_clean_corpus_stage_verdicts(spark):
    varied = " ".join(["the", "of"] + [f"word{i}" for i in range(58)])
    rows = [
        (1, varied),                                           # passes all
        (2, varied),                                           # exact dup of 1
        (3, " ".join(["123"] * 60)),                           # fails quality (alpha)
        (4, "the of " + "word word " * 40),                    # fails repetition (top2)
        (5, "el la de que y en un una los las " * 8),          # fails language (es)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pipeline.clean_corpus(df).collect()}

    assert got[1]["keep"] is True
    assert got[2]["keep_dedup"] is False and got[2]["keep"] is False
    assert got[3]["keep_quality"] is False
    assert got[4]["keep_repetition"] is False
    assert got[5]["keep_language"] is False and got[5]["keep_repetition"] is True


def test_deterministic_shuffle_properties(spark, docs):
    out = pipeline.deterministic_shuffle(docs.select("doc_id"), salt="e1", n_shards=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    # shard is key mod n_shards; keys distinct; order within a partition
    # is (shard, key)-sorted
    assert all(r["shard"] == r["shuffle_key"] % 4 for r in rows)
    assert len({r["shuffle_key"] for r in rows}) == len(rows)
    # re-salting permutes: a different epoch salt changes the key set
    other = {r["doc_id"]: r["shuffle_key"]
             for r in pipeline.deterministic_shuffle(
                 docs.select("doc_id"), salt="e2", n_shards=4).collect()}
    same = {r["doc_id"]: r["shuffle_key"] for r in rows}
    assert any(other[i] != same[i] for i in same)


def test_token_budget_sample_budgets_and_nesting(spark, docs):
    out = pipeline.token_budget_sample(docs, {"src0": 1000, "src1": 0}).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert "src1" not in by_src  # zero budget removes the group
    # src0: budget reached but not wildly exceeded (crossing doc kept)
    src0 = sorted(by_src["src0"], key=lambda r: r["cum_tokens"])
    assert src0[-1]["cum_tokens"] >= 1000
    assert src0[-1]["cum_tokens"] - src0[-1]["n_tokens"] < 1000
    # unbudgeted groups keep everything
    total = {r["source"]: 0 for r in docs.select("source").distinct().collect()}
    for r in docs.collect():
        total[r["source"]] += 1
    assert len(by_src["src2"]) == total["src2"]
    # nesting: a bigger budget keeps a superset
    small = {r["doc_id"] for r in pipeline.token_budget_sample(docs, {"src0": 500}).collect()
             if r["source"] == "src0"}
    big = {r["doc_id"] for r in pipeline.token_budget_sample(docs, {"src0": 2000}).collect()
           if r["source"] == "src0"}
    assert small <= big


def test_unigram_logprob_with_external_vocab(spark):
    import math

    vocab = spark.createDataFrame([("common", 90), ("rare", 9)], ["token", "n"])
    df = spark.createDataFrame(
        [(1, "common common"), (2, "rare"), (3, "oov1 oov2")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in text.unigram_logprob(df, vocab=vocab).collect()}
    denom = 99 + 2 + 1  # total + |V| + 1
    assert got[1]["bits_per_token"] == round(-math.log2(91 / denom), 4)
    assert got[2]["bits_per_token"] == round(-math.log2(10 / denom), 4)
    # OOV tokens get the floor probability 1/denom
    assert got[3]["bits_per_token"] == round(-math.log2(1 / denom), 4)
    # ordering: rarer text costs more bits
    assert got[1]["bits_per_token"] < got[2]["bits_per_token"] < got[3]["bits_per_token"]


def test_corpus_stats_dup_rate(spark):
    rows = [
        (1, "s", "a b c"),
        (2, "s", "A  b C"),   # normalized dup of 1
        (3, "s", "d e"),
        (4, "t", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r.asDict() for r in text.corpus_stats(df).collect()}
    s = got["s"]
    assert s["n_docs"] == 3 and s["distinct_docs"] == 2
    assert s["dup_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert s["total_tokens"] == 8 and s["min_tokens"] == 2 and s["max_tokens"] == 3
    assert got["t"]["dup_rate"] == 0.0


def test_corpus_stats_approx_mode(spark, docs):
    exact = {r["source"]: r["distinct_docs"]
             for r in text.corpus_stats(docs).collect()}
    approx = {r["source"]: r["distinct_docs"]
              for r in text.corpus_stats(docs, exact=False).collect()}
    for s, n in exact.items():
        assert abs(approx[s] - n) <= max(3, 0.05 * n)  # HLL ~2% rsd


def test_clean_corpus_optional_span_stage(spark):
    """max_span_dup_frac adds a keep_spans verdict that ANDs into keep;
    default (None) leaves the table unchanged."""
    from clarite_python_spark.operators.pipeline import clean_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    df = spark.createDataFrame(
        [
            (1, base + "one ending here"),       # shares 32+ tokens with 2
            (2, base + "two other close"),
            (3, "totally unique words in this document nothing repeats anywhere at all"),
        ],
        "doc_id long, text string",
    )
    default = clean_corpus(df, languages=("en", "unknown"))
    assert "keep_spans" not in default.columns

    v = {r["doc_id"]: r.asDict() for r in
         clean_corpus(df, languages=("en", "unknown"),
                      max_span_dup_frac=0.5, span_n=8).collect()}
    assert v[1]["keep_spans"] is False and v[2]["keep_spans"] is False
    assert v[3]["keep_spans"] is True
    assert v[1]["keep"] is False and v[2]["keep"] is False


# ------------------------------------------------- domain cap / mixture


def test_domain_cap_bites_and_prefilter_is_lossless(docs):
    exact = pipeline.domain_cap(docs, max_docs=15, salt="cap")
    per_src = {
        r["source"]: r["n"]
        for r in exact.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 15 for n in per_src.values())  # 25 docs/source at sf0.001
    pre = pipeline.domain_cap(docs, max_docs=15, salt="cap", prefilter_margin=3.0)
    a = sorted((r["doc_id"], r["cap_rank"]) for r in exact.collect())
    b = sorted((r["doc_id"], r["cap_rank"]) for r in pre.collect())
    assert a == b  # prefilter preserves both the kept set and the ranks


def test_domain_cap_superset_nesting(docs):
    small = {r["doc_id"] for r in pipeline.domain_cap(docs, 5, salt="cap").collect()}
    big = {r["doc_id"] for r in pipeline.domain_cap(docs, 15, salt="cap").collect()}
    assert small < big


def test_domain_cap_validation(docs):
    with pytest.raises(ValueError, match="max_docs"):
        pipeline.domain_cap(docs, 0)
    with pytest.raises(ValueError, match="margin"):
        pipeline.domain_cap(docs, 5, prefilter_margin=0.5)


def test_temperature_mixture_rates(docs):
    # tau=1 is proportional sampling: every group gets the same rate
    # target/N regardless of size; tau=0 is uniform over sources.
    out1 = pipeline.temperature_mixture(docs, tau=1.0, target_rows=250, salt="t")
    rates = {r["source"]: r["rate_buckets"] for r in out1.select("source", "rate_buckets").distinct().collect()}
    assert set(rates.values()) == {5000}  # 250/500 -> 0.5 -> 5000 buckets
    # skewed frame: small source should be upweighted at tau<1
    skew = docs.withColumn(
        "source", F.when(F.col("doc_id") % 50 == 0, "rare").otherwise("common")
    )
    out = pipeline.temperature_mixture(skew, tau=0.5, target_rows=100, salt="t")
    r = {x["source"]: x["rate_buckets"] for x in out.select("source", "rate_buckets").distinct().collect()}
    assert r["rare"] > r["common"]


def test_temperature_mixture_partitioning_invariant(docs):
    a = {r["doc_id"] for r in pipeline.temperature_mixture(docs, 0.5, 300, salt="tmix").collect()}
    b = {
        r["doc_id"]
        for r in pipeline.temperature_mixture(docs.repartition(13), 0.5, 300, salt="tmix").collect()
    }
    assert a == b and len(a) > 0


def test_temperature_mixture_validation(docs):
    with pytest.raises(ValueError, match="tau"):
        pipeline.temperature_mixture(docs, -0.1, 10)
    with pytest.raises(ValueError, match="target_rows"):
        pipeline.temperature_mixture(docs, 0.5, 0)


# ------------------------------------------------- tfidf / bigram / quality


def test_tfidf_top_terms_planted_keyword(spark):
    rows = [
        (1, "zebra zebra common words here"),
        (2, "common words common words again more"),
        (3, "common words common words again more"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.tfidf_top_terms(df, k=1, min_token_len=3)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # 'zebra': tf=2 and in exactly one document -> tf * idf beats the
    # corpus-wide terms (2*(ln(4/2)+1)=3.39 vs common's 1*1.0 in doc 1)
    assert top[1] == "zebra"
    ranks = [r["rank"] for r in out.collect()]
    assert all(r == 1 for r in ranks)


def test_tfidf_rank_is_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "aaa bbb")], ["doc_id", "text"])
    out = text.tfidf_top_terms(df, k=2).collect()
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == ["aaa", "bbb"]


def test_bigram_logprob_repetition_is_cheaper(spark):
    rows = [
        (1, "a b a b a b a b a b a b"),
        (2, "q w e r t y u i o p z x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.bigram_logprob(df).collect()}
    assert out[1]["n_bigrams"] == 11 and out[2]["n_bigrams"] == 11
    # doc 1's bigrams repeat corpus-wide -> fewer bits than all-unique doc 2
    assert out[1]["bits_per_bigram"] < out[2]["bits_per_bigram"]


def test_bigram_logprob_short_docs_absent(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "two tokens")], ["doc_id", "text"])
    got = {r["doc_id"] for r in text.bigram_logprob(df).collect()}
    assert got == {2}


def test_corpus_divergence_self_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], ["doc_id", "text"]
    )
    r = text.corpus_divergence(df, df).collect()[0]
    assert r["kl_ab"] == 0.0 and r["kl_ba"] == 0.0 and r["js"] == 0.0
    assert r["n_a"] == r["n_b"] == 7 and r["v"] == 4


def test_corpus_divergence_numpy_parity_and_bounds(spark):
    import math

    a_rows = [(1, "x x y z"), (2, "x y y w")]
    b_rows = [(1, "z z q"), (2, "q w w w z")]
    da = spark.createDataFrame(a_rows, ["doc_id", "text"])
    db = spark.createDataFrame(b_rows, ["doc_id", "text"])
    ca: dict = {}
    cb: dict = {}
    for _, t in a_rows:
        for w in t.split():
            ca[w] = ca.get(w, 0) + 1
    for _, t in b_rows:
        for w in t.split():
            cb[w] = cb.get(w, 0) + 1
    vocab = sorted(set(ca) | set(cb))
    v, na, nb = len(vocab), sum(ca.values()), sum(cb.values())
    al = 0.5
    pa = {w: (ca.get(w, 0) + al) / (na + al * v) for w in vocab}
    pb = {w: (cb.get(w, 0) + al) / (nb + al * v) for w in vocab}
    kl_ab = sum(pa[w] * math.log(pa[w] / pb[w]) for w in vocab) / math.log(2)
    js = sum(
        (pa[w] * math.log(pa[w] / ((pa[w] + pb[w]) / 2))
         + pb[w] * math.log(pb[w] / ((pa[w] + pb[w]) / 2))) / 2
        for w in vocab
    ) / math.log(2)
    r = text.corpus_divergence(da, db).collect()[0]
    assert r["v"] == v and r["n_a"] == na and r["n_b"] == nb
    assert abs(r["kl_ab"] - kl_ab) < 1e-5
    assert abs(r["js"] - js) < 1e-5
    # JS in log2 is bounded by 1 bit and symmetric-positive here
    assert 0 < r["js"] <= 1.0
    with pytest.raises(ValueError):
        text.corpus_divergence(da, db, alpha=0.0)


def test_stratified_split_exact_quotas(spark):
    rows = [(i, f"s{i % 4}") for i in range(100)]  # 4 strata x 25 docs
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = pipeline.stratified_split(
        df, {"train": 0.6, "val": 0.2, "test": 0.1}, by="source", salt="t"
    )
    counts = {
        (r["source"], r["split"]): r["count"]
        for r in out.groupBy("source", "split").count().collect()
    }
    for s in ["s0", "s1", "s2", "s3"]:
        # thresholds floor(cum*25 + .5): 15 / 20 / 23 -> 15,5,3 and 2 held out
        assert counts[(s, "train")] == 15
        assert counts[(s, "val")] == 5
        assert counts[(s, "test")] == 3
        assert counts[(s, None)] == 2


def test_stratified_split_deterministic_and_salted(spark):
    rows = [(i, "only") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = {r["doc_id"]: r["split"] for r in pipeline.stratified_split(
        df, {"train": 0.5}, salt="x").collect()}
    b = {r["doc_id"]: r["split"] for r in pipeline.stratified_split(
        df, {"train": 0.5}, salt="x").collect()}
    c = {r["doc_id"]: r["split"] for r in pipeline.stratified_split(
        df, {"train": 0.5}, salt="y").collect()}
    assert a == b
    assert a != c  # different salt draws a different (same-sized) half
    assert sum(v == "train" for v in c.values()) == 20


def test_stratified_split_validation(spark):
    df = spark.createDataFrame([(1, "s")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        pipeline.stratified_split(df, {"a": 0.7, "b": 0.4})
    with pytest.raises(ValueError):
        pipeline.stratified_split(df, {"a": -0.1})


def test_pmi_planted_collocation_ranks_first(spark):
    # "san francisco" always co-occurs; "the" pairs with everything
    rows = [
        (1, "san francisco is big the end the story"),
        (2, "the city of san francisco the bay"),
        (3, "san francisco the fog the hills"),
        (4, "the the the other words entirely here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.pmi_collocations(df, k=5, min_count=3).collect()
    top = min(out, key=lambda r: r["rank"])
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    assert top["c12"] == 3 and top["c1"] == 3 and top["c2"] == 3


def test_pmi_numpy_parity(spark):
    import math

    rows = [(i, t) for i, t in enumerate([
        "a b c a b", "b c a b c", "c a b a b", "a b a b c c",
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = [r[1].split() for r in rows]
    uni: dict = {}
    bi: dict = {}
    for t in toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(t, t[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    u = float(sum(uni.values()))
    b = float(sum(max(len(t) - 1, 0) for t in toks))
    out = text.pmi_collocations(df, k=20, min_count=2).collect()
    assert out, "expected collocations"
    for r in out:
        c12 = bi[(r["w1"], r["w2"])]
        exp = math.log((c12 * u * u) / (b * uni[r["w1"]] * uni[r["w2"]])) / math.log(2.0)
        assert r["c12"] == c12
        assert abs(r["pmi"] - exp) < 1e-5


def test_pmi_min_count_floor_and_validation(spark):
    df = spark.createDataFrame([(1, "x y x y rare pair")], ["doc_id", "text"])
    out = text.pmi_collocations(df, k=10, min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}
    with pytest.raises(ValueError):
        text.pmi_collocations(df, k=0)
    with pytest.raises(ValueError):
        text.pmi_collocations(df, min_count=0)


def test_quality_classifier_orders_prose_above_noise(spark):
    rows = [
        (1, "the cat sat on the mat and it is a fine day for walking"),
        (2, "@@@@ ##### 12345 67890 !!!! %%%% ^^^^ 00000"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.quality_classifier(df).collect()}
    assert out[1]["quality_prob"] > out[2]["quality_prob"]
    assert out[1]["keep"] and not out[2]["keep"]


def test_quality_classifier_weight_override_and_validation(spark):
    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown feature"):
        text.quality_classifier(df, weights={"nope": 1.0})
    hi = text.quality_classifier(df, weights={"bias": 10.0}).collect()[0]
    assert hi["keep"]


def test_domain_cap_and_mixture_refuse_reserved_columns(docs):
    clash = docs.withColumn("__key", F.lit(1))
    with pytest.raises(ValueError, match="__key"):
        pipeline.domain_cap(clash, 5)
    clash2 = docs.withColumn("rate_buckets", F.lit(1))
    with pytest.raises(ValueError, match="rate_buckets"):
        pipeline.temperature_mixture(clash2, 0.5, 10)


def test_clean_corpus_optional_classifier_stage(spark):
    rows = [
        (1, "the cat sat on the mat and it is a fine day for walking out"),
        (2, "@@@@ ##### 12345 67890 !!!! %%%% ^^^^ 00000 still noisy 111"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = pipeline.clean_corpus(df)
    assert "keep_classifier" not in base.columns  # off by default
    out = {r["doc_id"]: r.asDict() for r in pipeline.clean_corpus(
        df, min_quality_prob=0.5
    ).collect()}
    assert out[1]["keep_classifier"] is True
    assert out[2]["keep_classifier"] is False
    assert out[2]["keep"] is False


def test_domain_cap_and_mixture_keep_null_groups(spark):
    rows = [(i, None if i % 2 else "s") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    capped = pipeline.domain_cap(df, 5, salt="n")
    got = {r["source"]: 0 for r in capped.collect()}
    assert None in got and "s" in got  # null group capped, not dropped
    pre = pipeline.domain_cap(df, 5, salt="n", prefilter_margin=3.0)
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, capped.collect()))
    mixed = pipeline.temperature_mixture(df, 0.5, 20, salt="n")
    assert {r["source"] for r in mixed.collect()} == {None, "s"}


def test_domain_cap_prefilter_underdraw_fails_loudly(spark):
    """A prefilter that drops winners must FAIL the job, not silently
    return fewer than max_docs rows. salt='ud0' with ids 0..39 in one
    group at margin=1.0 leaves only 1 survivor under the cut for
    max_docs=2 (found by replaying md5_60bit_py offline) — the
    raise_error folded into cap_rank fires at execution time."""
    df = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit("g").alias("source")
    )
    exact = pipeline.domain_cap(df, max_docs=2, salt="ud0")
    assert exact.count() == 2  # exact path unaffected
    bad = pipeline.domain_cap(df, max_docs=2, salt="ud0", prefilter_margin=1.0)
    with pytest.raises(Exception, match="under-draw"):
        bad.collect()
    # a healthy margin on the same data neither raises nor under-draws
    ok = pipeline.domain_cap(df, max_docs=2, salt="ud0", prefilter_margin=6.0)
    got = sorted((r["doc_id"], r["cap_rank"]) for r in ok.collect())
    want = sorted((r["doc_id"], r["cap_rank"]) for r in exact.collect())
    assert got == want


# ------------------------------------------------- epoch repeat / DSIR


def test_epoch_repeat_counts_and_nesting(docs):
    n0 = docs.count()
    n = pipeline.epoch_repeat(docs, 2.5, salt="e").count()
    assert 2 * n0 <= n <= 3 * n0
    assert abs(n / n0 - 2.5) < 0.2  # md5 coin ~ Binomial(n0, 0.5)
    # integer epochs are exact; fractional nests (bigger ⊇ smaller)
    assert pipeline.epoch_repeat(docs, 2.0, salt="e").count() == 2 * n0
    a = {(r["doc_id"], r["epoch"]) for r in pipeline.epoch_repeat(docs, 1.3, salt="e").collect()}
    b = {(r["doc_id"], r["epoch"]) for r in pipeline.epoch_repeat(docs, 1.7, salt="e").collect()}
    assert a < b
    with pytest.raises(ValueError, match="epochs"):
        pipeline.epoch_repeat(docs, 0)


def test_epoch_repeat_sub_one_drops_rows_cleanly(docs):
    out = pipeline.epoch_repeat(docs, 0.4, salt="e")
    n0 = docs.count()
    kept = out.count()
    assert 0 < kept < n0
    # every emitted row is epoch 0 exactly once (no [0,-1] descending
    # sequence artifact from the zero-copy branch)
    assert out.where("epoch != 0").count() == 0
    assert out.select("doc_id").distinct().count() == kept


def test_dsir_logweights_favor_target_lookalikes(spark):
    """Documents drawn from the target's vocabulary must outscore
    documents from a disjoint vocabulary."""
    target = spark.createDataFrame(
        [(100 + i, f"alpha beta gamma delta token{i % 3}") for i in range(10)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma delta shared words") for i in range(5)]
        + [(50 + i, "totally different unrelated noise stream") for i in range(5)],
        ["doc_id", "text"],
    )
    w = {r["doc_id"]: r["log_weight"] for r in pipeline.dsir_logweights(raw, target).collect()}
    like = min(w[i] for i in range(5))
    unlike = max(w[50 + i] for i in range(5))
    assert like > unlike


def test_dsir_logweights_empty_doc_and_validation(spark):
    target = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    raw = spark.createDataFrame([(1, "a b"), (2, "   ")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in pipeline.dsir_logweights(raw, target).collect()}
    assert rows[2]["n_grams"] == 0 and rows[2]["log_weight"] == 0.0
    with pytest.raises(ValueError, match="n_buckets"):
        pipeline.dsir_logweights(raw, target, n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        pipeline.dsir_logweights(raw, target, alpha=0)


def test_dsir_sample_is_deterministic_and_weighted(docs):
    from pyspark.sql import functions as F

    target = docs.where(F.col("source") == "src0")
    a = [r["doc_id"] for r in pipeline.dsir_sample(docs, target, 50).collect()]
    b = [r["doc_id"] for r in pipeline.dsir_sample(docs, target, 50).collect()]
    assert a == b  # gumbel noise is content-addressed, not random
    # the target's own source must be overrepresented vs uniform
    picked = docs.sparkSession.createDataFrame([(i,) for i in a], ["doc_id"])
    n_src0 = picked.join(docs, "doc_id").where(F.col("source") == "src0").count()
    n_sources = docs.select("source").distinct().count()
    assert n_src0 > 3 * (50 / n_sources)
    with pytest.raises(ValueError, match="n must"):
        pipeline.dsir_sample(docs, target, 0)


# ------------------------------------------------- perplexity buckets


def test_perplexity_buckets_equal_sizes_per_lang(docs):
    out = pipeline.perplexity_buckets(docs).cache()
    sizes = {
        (r["lang"], r["bucket"]): r["n"]
        for r in out.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    # ntile: within each language bucket sizes differ by at most 1
    langs = {k[0] for k in sizes}
    for lang in langs:
        per = [n for (lg, _), n in sizes.items() if lg == lang]
        assert len(per) == 3 and max(per) - min(per) <= 1
    # bucket 1 = head = lowest bits/token: per-lang means must be ordered
    means = {
        (r["lang"], r["bucket"]): r["m"]
        for r in out.groupBy("lang", "bucket")
        .agg(F.avg("bits_per_token").alias("m"))
        .collect()
    }
    for lang in langs:
        assert means[(lang, 1)] <= means[(lang, 2)] <= means[(lang, 3)]
    labels = {r["bucket"]: r["bucket_label"] for r in out.select("bucket", "bucket_label").distinct().collect()}
    assert labels == {1: "head", 2: "middle", 3: "tail"}
    out.unpersist()


def test_perplexity_buckets_approx_agrees_off_boundary(docs):
    exact = {
        r["doc_id"]: r["bucket"] for r in pipeline.perplexity_buckets(docs).collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in pipeline.perplexity_buckets(docs, exact=False).collect()
    }
    assert set(exact) == set(approx)
    # the sketch only misassigns within rounding distance of a cutoff:
    # never by more than one bucket, and for the vast majority not at all
    diffs = [abs(exact[i] - approx[i]) for i in exact]
    assert max(diffs) <= 1
    assert sum(1 for d in diffs if d == 0) >= 0.95 * len(diffs)

    with pytest.raises(ValueError, match="n_buckets"):
        pipeline.perplexity_buckets(docs, n_buckets=1)


def test_weighted_sample_deterministic_and_proportional(docs):
    big = pipeline.weighted_sample(docs, 100, weight_col="n_chars", salt="a")
    a = sorted(r["doc_id"] for r in big.collect())
    b = sorted(r["doc_id"] for r in pipeline.weighted_sample(
        docs, 100, weight_col="n_chars", salt="a").collect())
    assert a == b and len(a) == 100  # content-addressed noise, not random
    c = sorted(r["doc_id"] for r in pipeline.weighted_sample(
        docs, 100, weight_col="n_chars", salt="b").collect())
    assert a != c  # a new salt redraws the sample
    # heavier docs must be overrepresented: mean weight of the sample
    # exceeds the corpus mean (Gumbel-top-k draws ∝ weight)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    samp_mean = big.agg(F.avg("n_chars")).first()[0]
    assert samp_mean > corpus_mean

    with pytest.raises(ValueError, match="n must"):
        pipeline.weighted_sample(docs, 0, weight_col="n_chars")


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, None), (4, -1.0), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in pipeline.weighted_sample(df, 10, weight_col="w").collect()}
    assert got == {1, 5}  # zero/null/negative weights are never drawn


def test_shard_by_tokens_fills_shards(docs):
    out = pipeline.shard_by_tokens(docs, 2000).cache()
    per = (
        out.groupBy("source", "shard")
        .agg(F.sum("n_tokens").alias("tok"), F.max("shard").alias("_"))
        .collect()
    )
    # every shard except a group's last holds >= tokens_per_shard
    last = {
        r["source"]: r["m"]
        for r in out.groupBy("source").agg(F.max("shard").alias("m")).collect()
    }
    for r in per:
        if r["shard"] < last[r["source"]]:
            assert r["tok"] >= 2000
    # shards are contiguous from 0 within each group
    shards = sorted(
        (r["source"], r["shard"]) for r in out.select("source", "shard").distinct().collect()
    )
    by_src: dict = {}
    for s, sh in shards:
        by_src.setdefault(s, []).append(sh)
    for s, got in by_src.items():
        assert got == list(range(len(got)))
    # deterministic: same salt -> same assignment
    again = {
        (r["doc_id"], r["shard"])
        for r in pipeline.shard_by_tokens(docs, 2000).collect()
    }
    assert {(r["doc_id"], r["shard"]) for r in out.collect()} == again
    out.unpersist()

    with pytest.raises(ValueError, match="tokens_per_shard"):
        pipeline.shard_by_tokens(docs, 0)


def test_weighted_sample_nests_in_n(docs):
    """Scores are content-addressed and fixed, so top-n selection NESTS:
    a bigger sample is a superset of a smaller one (the property that
    makes budget increases append-only for a training corpus)."""
    small = {r["doc_id"] for r in pipeline.weighted_sample(
        docs, 40, weight_col="n_chars", salt="nest").collect()}
    big = {r["doc_id"] for r in pipeline.weighted_sample(
        docs, 120, weight_col="n_chars", salt="nest").collect()}
    assert small < big


def test_shard_by_tokens_nests_with_budget_sample(docs):
    """shard_by_tokens and token_budget_sample share the hash order, so
    a group's budget prefix is exactly its first shards: every doc that
    token_budget_sample keeps lands in a shard whose id is below every
    shard id it drops (per group)."""
    from pyspark.sql import functions as F

    sharded = pipeline.shard_by_tokens(docs, 1000)
    kept = pipeline.token_budget_sample(docs, 1000)
    ids_kept = {r["doc_id"] for r in kept.select("doc_id").collect()}
    rows = sharded.select("doc_id", "source", "shard").collect()
    by_src_kept = {}
    by_src_drop = {}
    for r in rows:
        (by_src_kept if r["doc_id"] in ids_kept else by_src_drop).setdefault(
            r["source"], []
        ).append(r["shard"])
    for src, kept_shards in by_src_kept.items():
        dropped = by_src_drop.get(src)
        if dropped:
            assert max(kept_shards) <= min(dropped)


def test_token_budget_sample_order_col_keeps_best_first(docs):
    """order_col flips the budget selection from hash order to
    quality-first: kept docs must dominate dropped docs on the order
    column within every group (modulo the crossing doc)."""
    from pyspark.sql import functions as F

    out = pipeline.token_budget_sample(
        docs, 400, salt="qb", order_col="n_chars", descending=True
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["n_chars"], r["doc_id"]))
    for src, pairs in by_src.items():
        kept_chars = sorted(c for c, i in pairs if i in kept)
        drop_chars = sorted(c for c, i in pairs if i not in kept)
        if kept_chars and drop_chars:
            # every kept doc is >= every dropped doc on n_chars
            # (ties broken by hash may interleave equal values only)
            assert kept_chars[0] >= drop_chars[-1] or kept_chars[0] == drop_chars[-1]
    # selection still nests in the budget for a fixed order
    bigger = {
        r["doc_id"]
        for r in pipeline.token_budget_sample(
            docs, 800, salt="qb", order_col="n_chars", descending=True
        ).select("doc_id").collect()
    }
    assert kept <= bigger
    # ascending flips the preference
    asc = pipeline.token_budget_sample(
        docs, 400, salt="qb", order_col="n_chars", descending=False
    )
    asc_mean = asc.agg(F.avg("n_chars")).first()[0]
    desc_mean = out.agg(F.avg("n_chars")).first()[0]
    assert desc_mean > asc_mean


def test_split_leakage_counts_straddling_fingerprints(spark):
    from pyspark.sql import functions as F

    # force the splits deterministically by overriding with doc granularity:
    # docs 1/2 share identical text, 3 is unique
    df = spark.createDataFrame(
        [(i, "the exact same document text" if i < 2 else f"unique {i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    out = pipeline.split_leakage(
        df, {"a": 0.5, "b": 0.5}, salt="t", granularity="doc"
    ).collect()
    # the duplicated text leaks across splits only if docs 0 and 1
    # landed in different splits; verify against the actual assignment
    assign = {
        r["doc_id"]: r["split"]
        for r in pipeline.deterministic_split(df, {"a": 0.5, "b": 0.5}, salt="t")
        .select("doc_id", "split").collect()
    }
    expect_leak = assign[0] != assign[1]
    shared = {(r["split_a"], r["split_b"]): r["n_shared"] for r in out}
    if expect_leak:
        assert shared.get(("a", "b")) == 1
    else:
        assert shared.get(("a", "b"), 0) == 0

    # held-out rows (NULL split) never appear in the matrix
    part = pipeline.split_leakage(
        df, {"a": 0.3}, salt="t", granularity="doc"
    ).collect()
    assert all({r["split_a"], r["split_b"]} <= {"a"} for r in part)


def test_split_leakage_ngram_gate_corpus(docs):
    """8-gram leakage across a 60/20/20 hash split of the synthetic
    corpus must be non-vacuous (shared grams exist) and symmetric
    (every unordered pair appears at most once)."""
    out = pipeline.split_leakage(
        docs, {"train": 0.6, "val": 0.2, "test": 0.2}, salt="lk"
    ).collect()
    pairs = [(r["split_a"], r["split_b"]) for r in out]
    assert len(pairs) == len(set(pairs)) <= 3
    assert all(a < b for a, b in pairs)
    assert sum(r["n_shared"] for r in out) > 0


# ----------------------------------------------- feature-hash embed


def test_feature_hash_embed_properties(docs, spark):
    import math

    from clarite_python_spark.operators.text import feature_hash_embed

    emb = feature_hash_embed(docs, dim=32).cache()
    rows = emb.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    # normalized: every non-zero vector has unit L2 norm
    for r in rows[:20]:
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(n - 1.0) < 1e-5 or n == 0.0
    # deterministic + salt-sensitive
    again = feature_hash_embed(docs, dim=32).orderBy("doc_id").first()
    first = emb.orderBy("doc_id").first()
    assert list(again["embedding"]) == list(first["embedding"])
    other = feature_hash_embed(docs, dim=32, salt="zz").orderBy("doc_id").first()
    assert list(other["embedding"]) != list(first["embedding"])
    emb.unpersist()

    # empty documents produce no vector; dim validated
    empty = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    assert feature_hash_embed(empty).count() == 0
    with pytest.raises(ValueError, match="dim"):
        feature_hash_embed(docs, dim=0)


def test_feature_hash_embed_drives_similarity(docs):
    """The hashed vectors plug into the similarity family: every doc's
    nearest neighbor under cosine is itself (similarity 1.0)."""
    from clarite_python_spark.operators.similarity import cosine_topk
    from clarite_python_spark.operators.text import feature_hash_embed

    emb = feature_hash_embed(docs.limit(200), dim=32).withColumnRenamed(
        "doc_id", "vec_id"
    ).cache()
    q = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    top1 = cosine_topk(emb, q, k=1)
    hits = {(r["query_id"], r["vec_id"]) for r in top1.collect()}
    assert all(a == b for a, b in hits)
    emb.unpersist()


def test_dataset_card_composes_stats_lang_quality(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    card = {r["source"]: r for r in text.dataset_card(docs).collect()}
    stats = {r["source"]: r for r in text.corpus_stats(docs).collect()}
    assert set(card) == set(stats)
    for s, row in card.items():
        # stats columns agree with corpus_stats exactly
        for c in ("n_docs", "total_tokens", "mean_tokens", "dup_rate"):
            assert row[c] == stats[s][c], (s, c)
        assert 0.0 < row["top_lang_share"] <= 1.0
        assert 0.0 <= row["mean_quality"] <= 1.0
    # mixed-language group: planted spanish docs flip the dominant lang
    es = "el la de que y en un una los las " * 5
    mixed = spark.createDataFrame(
        [(i, es + f"v{i}", "esrc") for i in range(10)],
        ["doc_id", "text", "source"],
    )
    row = text.dataset_card(mixed).collect()[0]
    assert row["top_lang"] == "es" and row["top_lang_share"] == 1.0


def test_ngram_novelty_planted(spark):
    """Twin docs share every gram (novelty 0); a unique doc scores 1;
    hashed and string gram keys agree exactly."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact twin of 1
        (3, "one two three four five six seven"),     # wholly unique
        (4, "alpha beta gamma unrelated tail words"), # shares 1 gram with 1/2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.ngram_novelty(df).collect()}
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0
    # doc 4: grams = 4 distinct; 'alpha beta gamma' also in docs 1/2
    assert got[4]["n_grams"] == 4 and got[4]["n_novel"] == 3
    assert got[4]["novelty"] == 0.75

    a = sorted(map(tuple, text.ngram_novelty(df, hash_grams=True).collect()))
    b = sorted(map(tuple, text.ngram_novelty(df, hash_grams=False).collect()))
    assert a == b


def test_normalize_text_rules(spark):
    raw = "a  <b>bold</b>\ttext\x00with\x1fjunk \n\n\n\n next  line "
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    got = text.normalize_text(df).collect()[0]["text"]
    assert got == "a bold text\x00with\x1fjunk".replace("\x00", "").replace("\x1f", "") + "\n\nnext line"
    # flags off -> rule skipped
    keep_html = text.normalize_text(df, strip_html=False).collect()[0]["text"]
    assert "<b>" in keep_html
    lower = text.normalize_text(df, lowercase=True).collect()[0]["text"]
    assert lower == lower.lower()
    # unlimited newlines
    nl = text.normalize_text(df, max_newlines=None).collect()[0]["text"]
    assert "\n\n\n\n" in nl
    # schema preserved, other columns untouched
    df2 = spark.createDataFrame([(1, raw, "s")], "doc_id long, text string, source string")
    out = text.normalize_text(df2)
    assert out.columns == df2.columns
    assert out.collect()[0]["source"] == "s"
    # idempotent: normalizing twice == once
    once = text.normalize_text(df).collect()[0]["text"]
    twice = text.normalize_text(text.normalize_text(df)).collect()[0]["text"]
    assert once == twice


# ---------------------------------------------------------------- round 9


def test_mixture_report_numpy_parity(docs):
    """Exact replay of the mixture math in numpy over collected counts."""
    import numpy as np

    from clarite_python_spark.operators.text import token_count

    base = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(token_count("text")).alias("tok"),
        )
        .collect()
    )
    tok = {r["source"]: r["tok"] for r in base}
    nd = {r["source"]: r["n"] for r in base}
    tau, budget, cap = 0.7, 1_000_000, 2.0
    z = sum(t**tau for t in tok.values())
    got = {
        r["source"]: r
        for r in pipeline.mixture_report(
            docs, budget, tau=tau, max_epochs=cap
        ).collect()
    }
    assert set(got) == set(tok)
    for s, r in got.items():
        w = tok[s] ** tau / z
        sampled = int(np.floor(w * budget))
        assert r["n_docs"] == nd[s]
        assert r["available_tokens"] == tok[s]
        assert abs(r["weight"] - round(w, 6)) < 2e-6
        assert r["sampled_tokens"] == sampled
        assert abs(r["effective_epochs"] - round(sampled / tok[s], 6)) < 2e-6
        capped = min(sampled, int(np.floor(cap * tok[s])))
        assert r["capped_tokens"] == capped
        assert r["lost_tokens"] == sampled - capped


def test_mixture_report_weights_sum_to_one(docs):
    rows = pipeline.mixture_report(docs, 500_000, tau=1.0).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # tau=1: weight == token share, so sampled tokens ~ budget
    assert sum(r["sampled_tokens"] for r in rows) <= 500_000


def test_mixture_report_tau_zero_uniform(docs):
    rows = pipeline.mixture_report(docs, 100_000, tau=0.0).collect()
    ws = {r["weight"] for r in rows}
    assert len(ws) == 1  # uniform over sources regardless of size


def test_mixture_report_no_cap_columns_without_max_epochs(docs):
    cols = pipeline.mixture_report(docs, 100_000).columns
    assert "capped_tokens" not in cols and "lost_tokens" not in cols


def test_mixture_report_validation(docs):
    import pytest as _pt

    with _pt.raises(ValueError):
        pipeline.mixture_report(docs, 0)
    with _pt.raises(ValueError):
        pipeline.mixture_report(docs, 10, tau=-1)
    with _pt.raises(ValueError):
        pipeline.mixture_report(docs, 10, max_epochs=0)


def test_feature_hash_embed_idf_weighting(docs, spark):
    """idf_weight: exact numpy replay of the sklearn-smoothed idf scaling,
    and the stopword-suppression property (a ubiquitous token's bucket
    shrinks relative to the unweighted form)."""
    import math

    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import feature_hash_embed

    sub = docs.where("doc_id < 40")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in feature_hash_embed(
            sub, dim=16, normalize=False, idf_weight=True
        ).collect()
    }
    rows = sub.select("doc_id", "text").collect()
    n = len(rows)
    corpus = {r["doc_id"]: r["text"].lower().split() for r in rows}
    df_ = {}
    for toks in corpus.values():
        for t in set(toks):
            df_[t] = df_.get(t, 0) + 1
    # replay the md5 bucket/sign through the engine's own hash (tiny vocab)
    vocab = sorted({t for toks in corpus.values() for t in toks})
    hdf = spark.createDataFrame([(t,) for t in vocab], "tok string")
    from pyspark.sql import functions as F

    hrows = hdf.select(
        "tok",
        (md5_60bit(F.concat_ws(":", F.col("tok"), F.lit("fh"))) % 16).alias("b"),
        ((md5_60bit(F.concat_ws(":", F.col("tok"), F.lit("fh#s"))) % 2) * 2 - 1).alias("s"),
    ).collect()
    hb = {r["tok"]: (r["b"], r["s"]) for r in hrows}
    for did, toks in corpus.items():
        want = [0.0] * 16
        for t in toks:
            b, s = hb[t]
            idf = math.log((n + 1) / (df_[t] + 1)) + 1
            want[b] += s * idf
        assert got[did] == pytest.approx(want, abs=1e-4), did


def test_feature_hash_embed_idf_false_unchanged(docs):
    """The default path must stay bit-identical to the pre-idf form
    (integer signed counts)."""
    from clarite_python_spark.operators.text import feature_hash_embed

    out = feature_hash_embed(docs, dim=32, normalize=False).first()
    assert all(float(x) == int(x) for x in out["embedding"])
