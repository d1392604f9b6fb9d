"""minhash_dedup clustering semantics: greedy (drop any doc similar to a
lower-id doc) vs transitive connected-components (one survivor per
cluster), and the min-label propagation kernel itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.dedup import (
    _min_label_components,
    minhash_dedup,
    ngram_jaccard_pairs,
)


def test_min_label_components_chain_and_islands(spark):
    # components: {1,3,5} (chain 1-3, 3-5), {2,4}, singleton edges only
    edges = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "id_a: long, id_b: long"
    )
    got = {
        (r["id"], r["label"]) for r in _min_label_components(edges).collect()
    }
    assert got == {(1, 1), (3, 1), (5, 1), (2, 2), (4, 2)}


def test_min_label_components_long_chain_converges(spark):
    # path 10-9-8-...-0: worst case for propagation (diameter = 10)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a: long, id_b: long"
    )
    labels = {r["id"]: r["label"] for r in _min_label_components(edges).collect()}
    assert set(labels.values()) == {0}


@pytest.fixture(scope="module")
def chain_docs(spark):
    """doc3 is near-dup of doc1 AND doc2, but doc1 !~ doc2 at the chosen
    threshold: base 20 tokens; doc1 swaps the last token, doc2 swaps the
    first, doc3 is the base. 3-gram Jaccard: 1~3 = 2~3 = 17/19 ~ 0.895,
    1~2 = 16/20 = 0.80 < 0.85."""
    base = [f"w{i}" for i in range(20)]
    d1 = " ".join(base[:-1] + ["xx"])
    d2 = " ".join(["yy"] + base[1:])
    d3 = " ".join(base)
    rows = [(1, d1), (2, d2), (3, d3), (9, "entirely different text here ok")]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_verified_pairs_form_the_chain(chain_docs):
    ids = chain_docs.select(F.col("doc_id").alias("id_a")).join(
        chain_docs.select(F.col("doc_id").alias("id_b")),
        F.col("id_a") < F.col("id_b"),
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(chain_docs, ids, threshold=0.85).collect()
    }
    assert pairs == {(1, 3), (2, 3)}


def test_greedy_vs_transitive_on_chain(chain_docs):
    greedy = {
        r["doc_id"] for r in minhash_dedup(chain_docs, threshold=0.85).collect()
    }
    # greedy drops only id_b of each verified pair -> 3 goes, 1 and 2 stay
    assert greedy == {1, 2, 9}
    transitive = {
        r["doc_id"]
        for r in minhash_dedup(chain_docs, threshold=0.85, transitive=True).collect()
    }
    # connected components: cluster {1,2,3} keeps exactly min id 1
    assert transitive == {1, 9}


def test_transitive_noop_without_dups(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four five")],
        "doc_id: long, text: string",
    )
    out = minhash_dedup(docs, threshold=0.8, transitive=True)
    assert out.count() == 2


def test_md5_hash_family_same_dedup_decisions(chain_docs):
    """The portable md5 hash family (oracle-checkable in DuckDB) must
    make the same dedup decisions as the xxhash64 default on the planted
    chain — different buckets, same verified near-dups."""
    got = {
        r["doc_id"]
        for r in minhash_dedup(chain_docs, threshold=0.85, hash_family="md5").collect()
    }
    assert got == {1, 2, 9}


def test_md5_member_is_60_bit_nonnegative(spark):
    from clarite_python_spark.operators.dedup import minhash_signature, shingles

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id: long, text: string"
    )
    sig = docs.select(
        minhash_signature(shingles("text"), 8, hash_family="md5").alias("s")
    ).collect()[0]["s"]
    assert len(sig) == 8
    assert all(0 <= v < (1 << 60) for v in sig)


def test_incremental_dedup_against_history(spark):
    seen = spark.createDataFrame(
        [(1, "old doc one"), (2, "old  doc\ttwo")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "OLD DOC ONE"),       # dup of history (case/ws-normalized)
            (11, "brand new"),
            (12, "brand  NEW"),        # dup within the batch -> min id kept
            (13, "also new"),
        ],
        ["doc_id", "text"],
    )
    from clarite_python_spark.operators.dedup import incremental_dedup

    kept = sorted(r["doc_id"] for r in incremental_dedup(new, seen).collect())
    assert kept == [11, 13]

    # scale form: seen passed as a bare fingerprint table
    from clarite_python_spark.operators import text as text_mod

    fps = text_mod.fingerprint(seen).select("fingerprint")
    kept2 = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, fps, seen_fp_col="fingerprint").collect()
    )
    assert kept2 == kept


def test_paragraph_dedup_first_occurrence_wins(spark):
    from clarite_python_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),        # 'beta' already seen in doc 1
        (3, "ALPHA\n beta "),      # all paras dup (case/ws-insensitive) -> doc dropped
        (4, "epsilon\nepsilon"),   # intra-doc repeat -> first pos kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}

    assert got[1]["text"] == "alpha\nbeta\ngamma"
    assert got[1]["n_paras_kept"] == 3 and got[1]["n_paras_total"] == 3
    assert got[2]["text"] == "delta"
    assert got[2]["n_paras_kept"] == 1 and got[2]["n_paras_total"] == 2
    assert 3 not in got  # every paragraph was a duplicate -> doc removed
    assert got[4]["text"] == "epsilon" and got[4]["n_paras_total"] == 2


def test_contamination_ngram_collisions(spark):
    from clarite_python_spark.operators.dedup import contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram 'the quick brown fox jumps'
            (1, "prefix words the quick brown fox jumps and more tail words"),
            (2, "completely unrelated sentence with no overlap at all here"),
            # exact copy of the benchmark -> every 5-gram collides
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in contamination(corpus, bench, n=5).collect()}
    assert got[1]["contaminated"] is True and got[1]["n_contaminated"] == 1
    assert got[2]["contaminated"] is False and got[2]["n_contaminated"] == 0
    assert got[3]["contaminated"] is True
    assert got[3]["n_contaminated"] == got[3]["n_ngrams"]
    assert got[3]["contamination_frac"] == 1.0


def test_fuzzy_contamination_flags_near_copies(spark):
    from clarite_python_spark.operators.dedup import fuzzy_contamination

    bench_text = "the quick brown fox jumps over the lazy dog every single day"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            # near copy: one word changed -> high Jaccard, flagged
            (1, "the quick brown fox jumps over the lazy cat every single day"),
            # unrelated
            (2, "completely different content with no overlap whatsoever here now"),
            # verbatim copy
            (3, bench_text),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["jaccard"]
           for r in fuzzy_contamination(corpus, bench, threshold=0.5).collect()}
    assert 3 in got and got[3] == 1.0
    assert 1 in got and 0.5 <= got[1] < 1.0
    assert 2 not in got


def test_duplicate_spans_hand_computed(spark):
    """Lee-et-al-style window duplication: overlapping duplicated windows
    merge (coverage = n for the first window in a run + min(n, gap) per
    subsequent), within-doc repetition counts, short docs report zeros."""
    from clarite_python_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # windows abc bcd cde def; abc+bcd shared with doc 2
            (2, "x a b c d y"),        # windows xab abc bcd cdy
            (3, "z z z z z z z z"),    # all 6 windows identical (within-doc dup)
            (4, "q w"),                # shorter than n -> no windows
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in duplicate_spans(df, n=3).collect()}
    assert (got[1]["n_tokens"], got[1]["n_windows"]) == (6, 4)
    assert (got[1]["dup_windows"], got[1]["dup_tokens"]) == (2, 4)
    assert abs(got[1]["dup_fraction"] - round(4 / 6, 6)) < 1e-9
    assert (got[2]["dup_windows"], got[2]["dup_tokens"]) == (2, 4)
    # doc 3: coverage saturates at n_tokens
    assert (got[3]["dup_windows"], got[3]["dup_tokens"]) == (6, 8)
    assert got[3]["dup_fraction"] == 1.0
    assert (got[4]["n_windows"], got[4]["dup_windows"], got[4]["dup_fraction"]) == (0, 0, 0.0)


def test_duplicate_spans_case_insensitive_and_min_count(spark):
    from clarite_python_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "Foo Bar Baz tail1"), (2, "foo bar baz tail2"), (3, "foo bar baz tail3")],
        "doc_id long, text string",
    )
    # n=3: "foo bar baz" occurs 3x (case-folded); the tails are unique
    got = {r["doc_id"]: r.asDict() for r in duplicate_spans(df, n=3).collect()}
    for d in (1, 2, 3):
        assert (got[d]["dup_windows"], got[d]["dup_tokens"]) == (1, 3)
    # raising min_count above the occurrence count clears the flags
    got4 = {r["doc_id"]: r.asDict() for r in duplicate_spans(df, n=3, min_count=4).collect()}
    assert all(got4[d]["dup_windows"] == 0 for d in (1, 2, 3))


def test_incremental_neardup_drops_history_near_copies(spark):
    """Fuzzy daily-ingest: a new doc near-duplicating a HISTORICAL doc is
    dropped, near-dups WITHIN the batch collapse to one representative,
    and genuinely new text survives."""
    from clarite_python_spark.operators.dedup import incremental_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    seen = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (10, base + " lambda"),                     # near-copy of history
            (11, "totally different words entirely here now yes"),
            (12, "totally different words entirely here now yes indeed"),  # near-copy of 11
            (13, "unrelated fresh content nothing shared with others at all"),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in incremental_neardup(new, seen, threshold=0.5).collect()}
    assert 10 not in kept          # matched history
    assert 13 in kept              # fresh survives
    assert len(kept & {11, 12}) == 1  # batch-internal near-dups collapse


def test_exact_dedup_priority_col_prefers_curated_source(spark):
    """With priority_col, the winner is the lowest (priority, id) — a
    curated copy beats an earlier-id crawl copy; ties fall back to id."""
    from clarite_python_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "same text here", 2),   # crawl
            (2, "same text here", 0),   # curated -> wins despite higher id
            (3, "same text here", 2),
            (4, "other text", 1),
        ],
        "doc_id long, text string, prio int",
    )
    kept = {r["doc_id"] for r in exact_dedup(df, priority_col="prio").collect()}
    assert kept == {2, 4}
    # default stays min-id
    kept_default = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert kept_default == {1, 4}


def test_exact_dedup_null_priority_sorts_last(spark):
    """A NULL priority must NOT beat a real one: struct ordering puts
    NULL first, so without the coalesce-to-sentinel a row with no
    priority would silently win over the curated (priority 0) copy."""
    from clarite_python_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "same text here", None),  # unprioritized crawl copy
            (2, "same text here", 0),     # curated -> must win
            (3, "null only text", None),  # all-NULL group: min id wins
            (4, "null only text", None),
        ],
        "doc_id long, text string, prio int",
    )
    kept = {r["doc_id"] for r in exact_dedup(df, priority_col="prio").collect()}
    assert kept == {2, 3}


def test_minhash_clusters_labels_match_transitive_dedup(chain_docs):
    """Cluster labels are the audit view of transitive dedup: component
    {1,2,3} labels as 1; the unrelated doc is not emitted."""
    from clarite_python_spark.operators.dedup import minhash_clusters

    got = {
        (r["doc_id"], r["cluster_label"])
        for r in minhash_clusters(chain_docs, threshold=0.85).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1)}


# ------------------------------------------- remove_duplicate_spans


def test_remove_duplicate_spans_cuts_shared_windows(spark):
    from clarite_python_spark.operators.dedup import remove_duplicate_spans

    rows = [
        (1, "alpha beta gamma delta xray one two three four"),
        (2, "alpha beta gamma delta yankee five six seven eight"),
        (3, "unique tokens only here nothing shared at all now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4, min_count=2).collect()}
    assert out[1]["removed_tokens"] == 4
    assert out[1]["text_cleaned"] == "xray one two three four"
    assert out[2]["text_cleaned"] == "yankee five six seven eight"
    assert out[3]["removed_tokens"] == 0
    assert out[3]["text_cleaned"] == rows[2][1]


def test_remove_duplicate_spans_merges_overlapping_runs(spark):
    from clarite_python_spark.operators.dedup import remove_duplicate_spans

    # the whole 6-token prefix is duplicated: overlapping 4-gram windows
    # at pos 0,1,2 must merge into ONE interval [0, 5], not re-count
    shared = "a b c d e f"
    rows = [(1, f"{shared} tail1 x"), (2, f"{shared} tail2 y")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4, min_count=2).collect()}
    assert out[1]["removed_tokens"] == 6
    assert out[1]["text_cleaned"] == "tail1 x"


def test_remove_duplicate_spans_full_doc_removed(spark):
    from clarite_python_spark.operators.dedup import remove_duplicate_spans

    rows = [(1, "a b c d"), (2, "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4, min_count=2).collect()}
    assert out[1]["text_cleaned"] == "" and out[1]["removed_tokens"] == 4


def test_remove_duplicate_spans_case_insensitive_match_keeps_original(spark):
    from clarite_python_spark.operators.dedup import remove_duplicate_spans

    rows = [(1, "Alpha Beta Gamma Delta keepme"), (2, "alpha beta gamma delta othertail")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4, min_count=2).collect()}
    # matching is lowercased; surviving text preserves ORIGINAL casing
    assert out[1]["text_cleaned"] == "keepme"
    assert out[2]["text_cleaned"] == "othertail"


# ------------------------------------------------- source_overlap


def test_source_overlap_doc_granularity(spark):
    from clarite_python_spark.operators.dedup import source_overlap

    rows = [
        (1, "a", "shared text body here"),
        (2, "b", "shared  TEXT body here"),  # same after normalization
        (3, "b", "only in b"),
        (4, "c", "only in c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["source_a"], r["source_b"]): r.asDict() for r in source_overlap(df).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["n_shared"] == 1 and r["n_a"] == 1 and r["n_b"] == 2


def test_source_overlap_ngram_granularity(spark):
    from clarite_python_spark.operators.dedup import source_overlap

    rows = [
        (1, "a", "one two three four unique-a"),
        (2, "b", "one two three four unique-b"),
        (3, "c", "totally different words entirely here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(df, granularity="ngram", n=4).collect()}
    # the 4-gram "one two three four" is shared by a and b only
    assert out == {("a", "b"): 1}


def test_source_overlap_validation(spark):
    from clarite_python_spark.operators.dedup import source_overlap

    df = spark.createDataFrame([(1, "a", "x")], ["doc_id", "source", "text"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="granularity"):
        source_overlap(df, granularity="nope")


# ------------------------------------------------------------- lsh_recall


def test_lsh_recall_on_planted_neardups(spark):
    from clarite_python_spark.operators.dedup import lsh_recall

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" tail{i}") for i in range(6)]  # 6 mutual near-dups
    rows += [(100 + i, f"totally different text number {i} with unique words {i*7}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = lsh_recall(df, threshold=0.5, sample_fraction=1.0, salt="t").collect()[0]
    assert r["n_sample"] == 12
    assert r["n_true_pairs"] == 15  # C(6,2) planted pairs
    assert r["n_hits"] <= r["n_true_pairs"]
    assert r["n_hits"] <= r["n_candidate_pairs"]
    assert r["recall"] == 1.0  # jaccard ~0.87 pairs: banding must catch all
    assert 0 < r["precision"] <= 1.0


def test_lsh_recall_validation(spark):
    from clarite_python_spark.operators.dedup import lsh_recall

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sample_fraction"):
        lsh_recall(df, sample_fraction=0.0)


def test_lsh_recall_refuses_oversized_sample(spark):
    """The quadratic truth join is guarded: a sample above
    max_sample_rows is refused with the sizing math (the same contract
    as embedding_neardup's max_exact_rows); None forces the plan."""
    from clarite_python_spark.operators.dedup import lsh_recall

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("words for doc number "), F.col("id").cast("string")).alias("text"),
    )
    with pytest.raises(ValueError, match="max_sample_rows"):
        lsh_recall(df, sample_fraction=1.0, max_sample_rows=10)
    # override runs the quadratic plan; small corpus -> fine
    r = lsh_recall(df, sample_fraction=1.0, max_sample_rows=None).collect()[0]
    assert r["n_sample"] == 50


def test_line_dedup_removes_every_occurrence(spark):
    from clarite_python_spark.operators.dedup import line_dedup

    rows = [
        (1, "alpha\nfooter\nbeta"),
        (2, "gamma\nfooter"),        # 'footer' repeats corpus-wide -> gone everywhere
        (3, "FOOTER\n delta "),      # case/ws-insensitive repeat counting
        (4, "footer\nfooter"),       # doc made entirely of boilerplate -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in line_dedup(df).collect()}

    assert got[1]["text"] == "alpha\nbeta"
    assert got[1]["n_lines_kept"] == 2 and got[1]["n_lines_total"] == 3
    assert got[2]["text"] == "gamma"
    assert got[3]["text"] == "delta"
    assert 4 not in got  # all lines were boilerplate -> doc removed


def test_line_dedup_scope_and_threshold(spark):
    from clarite_python_spark.operators.dedup import line_dedup

    rows = [
        (1, "s1", "nav\nbody one"),
        (2, "s1", "nav\nbody two"),
        (3, "s2", "nav\nbody three"),  # 'nav' unique within s2 -> kept there
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in line_dedup(df, scope_col="source").collect()
    }
    assert got[1]["text"] == "body one" and got[2]["text"] == "body two"
    assert got[3]["text"] == "nav\nbody three"

    # min_repeat=3: two repeats are below the bar, everything survives
    loose = {
        r["doc_id"]: r.asDict()
        for r in line_dedup(df, scope_col="source", min_repeat=3).collect()
    }
    assert loose[1]["text"] == "nav\nbody one"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_repeat"):
        line_dedup(df, min_repeat=1)


def test_line_dedup_is_idempotent(spark):
    """Removing all >=min_repeat lines leaves only lines whose corpus
    count is below the bar; a second pass cannot change anything."""
    from clarite_python_spark.operators.dedup import line_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    once = line_dedup(
        docs.select("doc_id", "text"), sep="batch", join_sep="\n"
    ).cache()
    twice = line_dedup(once.select("doc_id", "text"), sep="\n", join_sep="\n")
    a = {(r["doc_id"], r["text"]) for r in once.collect()}
    b = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert a == b
    once.unpersist()


def test_remove_contaminated_spans_cuts_benchmark_overlaps(spark):
    from clarite_python_spark.operators.dedup import remove_contaminated_spans

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta EPSILON zeta eta theta"),
            (2, "unrelated words only here nothing shared at all"),
            (3, "x y alpha beta gamma delta question answer pair z"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "Alpha beta GAMMA delta"),   # case-insensitive 4-gram hit
            (101, "question answer pair"),     # 3 tokens < n -> no window
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_contaminated_spans(corpus, bench, n=4).collect()
    }
    assert got[1]["text_cleaned"] == "EPSILON zeta eta theta"
    assert got[1]["removed_tokens"] == 4
    assert got[2]["removed_tokens"] == 0  # untouched doc passes through
    # doc 3 loses only the colliding span; the sub-n benchmark doc
    # contributes no windows, so 'question answer pair' survives
    assert got[3]["text_cleaned"] == "x y question answer pair z"
    assert len(got) == 3  # fully-contaminated docs would still emit ('' text)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must"):
        remove_contaminated_spans(corpus, bench, n=0)


def test_remove_contaminated_spans_gate_corpus_has_hits(spark):
    """The registered query must exercise real deletions on the
    synthetic corpus, not vacuously pass on zero hits."""
    from pyspark.sql import functions as F

    from clarite_python_spark.operators.dedup import remove_contaminated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    out = remove_contaminated_spans(corpus, bench, n=5)
    assert out.where("removed_tokens > 0").count() > 0


def test_jaccard_topk_retrieves_planted_neighbors(spark):
    from clarite_python_spark.operators.dedup import jaccard_topk

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base + "one"),
        (2, base + "two"),          # near-dup of 1
        (3, "completely different words with no shared shingles at all here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): r
        for r in jaccard_topk(df, k=2, num_hashes=16, bands=8).collect()
    }
    # 1 and 2 retrieve each other at rank 1 with high jaccard
    assert got[(1, 1)]["neighbor_id"] == 2 and got[(1, 1)]["jaccard"] > 0.8
    assert got[(2, 1)]["neighbor_id"] == 1
    # the unrelated doc has no candidates at all
    assert not any(d == 3 for d, _ in got)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        jaccard_topk(df, k=0)


def test_jaccard_topk_rank_ordering_and_k(spark):
    from clarite_python_spark.operators.dedup import jaccard_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = jaccard_topk(docs.select("doc_id", "text"), k=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["jaccard"]))
    assert len(out) > 0
    for _, lst in by_doc.items():
        lst.sort()
        assert [rk for rk, _ in lst] == list(range(1, len(lst) + 1))  # dense ranks
        assert len(lst) <= 3
        jacs = [j for _, j in lst]
        assert jacs == sorted(jacs, reverse=True)  # descending similarity


def test_jaccard_topk_candidate_cap_binds_on_clique(spark):
    """A 40-way near-dup clique with max_candidates=10: every doc still
    gets k high-jaccard neighbors, the candidate fan-out is bounded,
    and results equal the uncapped run when the cap exceeds the clique."""
    from clarite_python_spark.operators.dedup import jaccard_topk

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [(i, base + f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_topk(df, k=5, num_hashes=16, bands=8, max_candidates=10).collect()
    by_doc: dict = {}
    for r in capped:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 40
    for d, lst in by_doc.items():
        assert len(lst) == 5
        assert all(r["jaccard"] > 0.8 for r in lst)  # clique members

    # below the cap, capped == uncapped exactly
    small = spark.createDataFrame(rows[:8], "doc_id long, text string")
    a = sorted(map(tuple, jaccard_topk(small, k=3, num_hashes=16, bands=8,
                                       max_candidates=100).collect()))
    b = sorted(map(tuple, jaccard_topk(small, k=3, num_hashes=16, bands=8,
                                       max_candidates=None).collect()))
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_candidates"):
        jaccard_topk(df, k=5, max_candidates=3)


def test_jaccard_topk_hashed_shingles_match_strings(spark):
    from clarite_python_spark.operators.dedup import jaccard_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, jaccard_topk(
        docs.select("doc_id", "text"), k=3, hash_shingles=True).collect()))
    b = sorted(map(tuple, jaccard_topk(
        docs.select("doc_id", "text"), k=3, hash_shingles=False).collect()))
    assert a == b


def test_simhash_candidates_pigeonhole_exact_recall(spark):
    """With bands > max_hamming and no bucket caps binding, banding must
    find EVERY pair within the hamming threshold (Manku pigeonhole) —
    verified against a brute-force popcount over all fingerprint pairs."""
    from clarite_python_spark.operators.dedup import simhash, simhash_candidates
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    fps = {
        r["doc_id"]: int(r["simhash"], 16)
        for r in simhash(docs, bits=60, hash_family="md5").collect()
    }
    ids = sorted(fps)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidates(
            docs, hash_family="md5", max_bucket=10_000
        ).collect()
    }
    assert got == truth
    assert truth  # non-vacuous: the corpus has hamming-close pairs


def test_simhash_candidates_hamming_values_and_validation(spark):
    from clarite_python_spark.operators.dedup import simhash_candidates
    import pytest as _pytest

    base = "alpha beta gamma delta epsilon zeta eta theta "
    # simhash is scale-invariant: repeating the text scales every bit
    # sum without changing its sign, so 1 and 2 are hamming-0 twins
    rows = [(1, base * 4), (2, base * 9), (3, "wholly unrelated corpus of different words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_candidates(df).collect()}
    assert got.get((1, 2)) == 0
    assert all(3 not in pair for pair in got)

    with _pytest.raises(ValueError, match="divisible"):
        simhash_candidates(df, bits=60, bands=7)
    with _pytest.raises(ValueError, match="<= 62"):
        simhash_candidates(df, bits=64, bands=4)
    with _pytest.raises(ValueError, match="60 bits"):
        simhash_candidates(df, bits=62, bands=2, hash_family="md5")


def test_simhash_dedup_greedy_vs_transitive(spark):
    """A hamming-0 clique (scale-invariance twins): greedy and transitive
    both keep exactly the min-id member; unrelated docs survive."""
    from clarite_python_spark.operators.dedup import simhash_dedup, simhash_candidates

    base = "one two three four five six seven eight nine ten "
    rows = [(i, base * (3 + i)) for i in range(4)]
    rows += [(10, "entirely different text about other topics and words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = simhash_candidates(df).collect()
    assert cand  # the variants are hamming-close
    greedy = {r["doc_id"] for r in simhash_dedup(df).select("doc_id").collect()}
    trans = {r["doc_id"] for r in simhash_dedup(df, transitive=True).select("doc_id").collect()}
    assert greedy == {0, 10} and trans == {0, 10}
    # losers really are gone, survivors keep full rows
    assert simhash_dedup(df).columns == df.columns


def test_dedup_keep_longest_policy(spark):
    """keep_col picks the cluster representative by metric, not min id —
    and ties break to the smaller id. Exercised through both families."""
    from clarite_python_spark.operators.dedup import minhash_dedup, simhash_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (1, base, 10),          # cluster member, short
        (2, base + "x y", 99),  # cluster member, LONGEST -> survivor
        (3, base + "z", 50),
        (9, "totally unrelated different content words here", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")

    kept = {r["doc_id"] for r in minhash_dedup(
        df, keep_col="n_chars", transitive=True).select("doc_id").collect()}
    assert kept == {2, 9}
    # keep_order="min" flips the policy
    kept_min = {r["doc_id"] for r in minhash_dedup(
        df, keep_col="n_chars", keep_order="min").select("doc_id").collect()}
    assert kept_min == {1, 9}
    # default min-id policy differs: 1 survives
    kept_id = {r["doc_id"] for r in minhash_dedup(
        df, transitive=True).select("doc_id").collect()}
    assert kept_id == {1, 9}

    # tie on the metric -> smaller id wins (scale-invariant simhash twins)
    trows = [(5, base * 2, 7), (6, base * 3, 7), (9, "unrelated other words", 1)]
    tdf = spark.createDataFrame(trows, "doc_id long, text string, n_chars long")
    tk = {r["doc_id"] for r in simhash_dedup(
        tdf, keep_col="n_chars").select("doc_id").collect()}
    assert tk == {5, 9}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep_order"):
        minhash_dedup(df, keep_col="n_chars", keep_order="median")


def test_dedup_report_per_group_numbers(spark):
    """Planted: a 3-doc near-dup cluster spanning two sources plus clean
    docs — per-group counts, min-id drop counts, and the GLOBAL size of
    the largest intersecting cluster."""
    from clarite_python_spark.operators.dedup import dedup_report

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (1, base * 2, "A"),
        (2, base * 3, "A"),   # cluster {1,2,3}: two in A, one in B
        (3, base * 4, "B"),
        (4, "unique words entirely different from the others here", "A"),
        (5, "another wholly unrelated document body of text", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in dedup_report(df, threshold=0.5).collect()}

    a, b = got["A"], got["B"]
    assert a["n_docs"] == 3 and b["n_docs"] == 2
    assert a["n_in_clusters"] == 2 and b["n_in_clusters"] == 1
    # min-id policy: 1 survives, 2 (in A) and 3 (in B) drop
    assert a["n_dropped"] == 1 and b["n_dropped"] == 1
    # the single cluster touches both groups -> counted once per group
    assert a["n_clusters"] == 1 and b["n_clusters"] == 1
    # global cluster size reported in every touching group
    assert a["max_cluster"] == 3 and b["max_cluster"] == 3


def test_incremental_simhash_dedup_history_and_fp_table(spark):
    """New docs hamming-close to history drop; fresh docs pass; a batch-
    internal twin collapses; the persisted LONG fingerprint table gives
    identical verdicts to raw history docs."""
    from clarite_python_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_fingerprints,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    other = "one two three four five six seven eight nine ten " * 4
    seen = spark.createDataFrame(
        [(1, base), (2, "history doc with its own words " * 3)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base * 2),   # scale-invariant twin of history doc 1 -> drop
            (11, other),      # fresh -> keep
            (12, other * 3),  # twin of 11 within the batch -> drop (greedy)
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in incremental_simhash_dedup(new, seen).collect())
    assert kept == [11]

    fps = simhash_fingerprints(seen)
    assert fps.schema["fp"].dataType.simpleString() == "bigint"
    kept2 = sorted(
        r["doc_id"]
        for r in incremental_simhash_dedup(new, fps, seen_fp_col="fp").collect()
    )
    assert kept2 == kept

    # empty history: reduces to within-batch simhash_dedup
    empty = seen.limit(0)
    kept3 = sorted(r["doc_id"] for r in incremental_simhash_dedup(new, empty).collect())
    assert kept3 == [10, 11]


def test_simhash_clusters_labels_match_dedup(spark):
    """Cluster labels are the min id of each hamming component and agree
    with simhash_dedup(transitive=True)'s survivor choice; singletons
    are not emitted."""
    from clarite_python_spark.operators.dedup import simhash_clusters, simhash_dedup

    base = "one two three four five six seven eight nine ten "
    rows = [(i, base * (3 + i)) for i in range(3)]          # hamming-0 clique
    rows += [(7, "distinct standalone text with other words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    labels = {r["doc_id"]: r["cluster_label"] for r in simhash_clusters(df).collect()}
    assert labels == {0: 0, 1: 0, 2: 0}  # singleton 7 not emitted
    kept = {r["doc_id"] for r in simhash_dedup(df, transitive=True).collect()}
    assert kept == {0, 7}


# ---------------------------------------------------------------- round 9


def test_containment_pairs_doc_in_doc(spark):
    """A short doc fully contained in a long doc: Jaccard tiny,
    containment from the short side == 1.0."""
    from clarite_python_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = containment_pairs(df, cands, threshold=0.5).first()
    assert row["containment_a_in_b"] == 1.0  # every quote 3-gram in doc 2
    assert row["containment_b_in_a"] < 0.05
    assert row["containment"] == 1.0
    # and Jaccard misses it at the same threshold
    assert ngram_jaccard_pairs(df, cands, threshold=0.5).count() == 0


def test_containment_identical_docs_both_one(spark):
    from clarite_python_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = containment_pairs(df, cands).first()
    assert row["containment_a_in_b"] == 1.0
    assert row["containment_b_in_a"] == 1.0


def test_containment_threshold_filters(spark):
    from clarite_python_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert containment_pairs(df, cands, threshold=0.1).count() == 0


def test_containment_hashed_matches_plain(spark):
    from clarite_python_spark.operators.dedup import containment_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = docs.select("doc_id").where("doc_id < 30")
    from pyspark.sql import functions as F

    cands = ids.select(F.col("doc_id").alias("id_a")).join(
        ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b")
    )
    plain = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, cands, threshold=0.2).collect()
    }
    hashed = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            docs, cands, threshold=0.2, hash_shingles=True
        ).collect()
    }
    assert plain == hashed


def test_min_label_components_validates_max_iter(spark):
    edges = spark.createDataFrame([(1, 2)], "id_a: long, id_b: long")
    with pytest.raises(ValueError, match="max_iter"):
        _min_label_components(edges, max_iter=0)


def test_min_label_components_fixpoint_on_last_round_does_not_raise(spark):
    # path 0-1-2-3-4: diameter 4 -> exactly 4 improving rounds without
    # shortcut; the 5th round only PROVES fixpoint. max_iter=4 must
    # succeed (the proving round is free), max_iter=3 must raise.
    # driver_max_edges=0 forces the distributed loop — the convergence
    # proof under test lives there (small graphs take the r13 driver
    # union-find shortcut, which has no rounds to bound)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a: long, id_b: long"
    )
    labels = {
        r["id"]: r["label"]
        for r in _min_label_components(
            edges, max_iter=4, driver_max_edges=0
        ).collect()
    }
    assert set(labels.values()) == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        _min_label_components(edges, max_iter=3, driver_max_edges=0).collect()


def test_min_label_components_multi_edges_collapse(spark):
    # duplicate and reversed duplicate edges must not change the result
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (3, 4)], "id_a: long, id_b: long"
    )
    got = {
        (r["id"], r["label"]) for r in _min_label_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 3), (4, 3)}


def test_sql_rendered_shingles_and_banding_bit_identical(spark):
    """The round-13 SQL-parse rendering of shingles/_banded must
    reproduce the Column-API expression trees value-exactly (grams,
    signatures, band buckets) — the minhash family's oracle hashes
    depend on every bit."""
    from clarite_python_spark.operators.dedup import _banded, minhash_signature, shingles
    from clarite_python_spark.operators.text import tokens

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "short"),
        (3, ""),
        (4, "a  b\tc   d e f g"),  # irregular whitespace
        (5, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    # Column-API reference build (the pre-round-13 construction)
    def ref_shingles(text_col, n):
        toks = tokens(text_col)
        per_tk = lambda tk: F.when(  # noqa: E731
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", tk)))
        return F.array_distinct(F.get(F.transform(F.array(toks), per_tk), 0))

    for n in (2, 3):
        got = df.select("doc_id", shingles("text", n).alias("s")).collect()
        want = df.select("doc_id", ref_shingles("text", n).alias("s")).collect()
        assert got == want

    for fam in ("xxhash64", "md5"):
        got = df.select(
            "doc_id", minhash_signature(shingles("text", 3), 8, fam).alias("sig")
        ).collect()
        want = df.select(
            "doc_id", minhash_signature(ref_shingles("text", 3), 8, fam).alias("sig")
        ).collect()
        assert got == want

        banded = {
            (r["doc_id"], r["band"], r["bucket"])
            for r in _banded(df, "text", "doc_id", 8, 4, 3, fam).collect()
        }
        # reference banding via the Column-API pieces
        rows_per_band = 2
        sig = minhash_signature(ref_shingles("text", 3), 8, fam)

        def bucket_key(b):
            joined = F.concat_ws(
                ",",
                F.transform(
                    F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
            )
            if fam == "xxhash64":
                return F.xxhash64(joined).cast("string")
            return joined

        ref = {
            (r["doc_id"], r["band"], r["bucket"])
            for r in df.select(F.col("doc_id"), sig.alias("__sig"))
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda b: F.struct(
                            b.alias("band"), bucket_key(b).alias("bucket")
                        ),
                    )
                ).alias("bb"),
            )
            .select("doc_id", "bb.band", "bb.bucket")
            .collect()
        }
        assert banded == ref
