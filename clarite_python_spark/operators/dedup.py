"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (these run over the full corpus, so every shape choice
matters at 100 TB):

- exact dedup is hash-groupBy with map-side combine — one shuffle keyed on
  the fingerprint, never a global window sort;
- MinHash signatures and band hashes are computed entirely with JVM array
  lambdas (``transform``/``array_min``/``xxhash64``) — one narrow pass;
  the only shuffles are the band-bucket groupBy and the candidate-pair
  verification join, both keyed on small values;
- candidate generation caps bucket size (``max_bucket``) so a degenerate
  bucket (all-identical boilerplate) cannot produce O(n^2) pairs — the
  standard LSH guardrail;
- n-gram Jaccard verification joins only candidate pairs back to shingle
  sets (semi-join shaped), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clarite_python_spark.operators.text import tokens

__all__ = [
    "exact_dedup",
    "source_overlap",
    "paragraph_dedup",
    "line_dedup",
    "duplicate_spans",
    "remove_duplicate_spans",
    "remove_contaminated_spans",
    "benchmark_grams",
    "contamination",
    "fuzzy_contamination",
    "incremental_neardup",
    "shingles",
    "minhash_signature",
    "band_table",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "minhash_clusters",
    "dedup_report",
    "simhash",
    "simhash_candidates",
    "simhash_dedup",
    "simhash_clusters",
    "simhash_fingerprints",
    "incremental_simhash_dedup",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "jaccard_topk",
    "lsh_recall",
]


def _norm(text_col: str) -> Column:
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def _rebalance(df: DataFrame) -> DataFrame:
    """Spread compute-heavy per-row work across cores when the scan came in
    too few splits (a local/small-file artifact: MinHash/SimHash cost is in
    interpreted lambda evaluation, not IO). At scale the input arrives in
    many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Keep one representative per exact normalized-text match.

    Single hash-groupBy keyed on the md5 fingerprint with
    ``min_by(struct(*), key)`` — the whole winning row rides the
    aggregation (map-side partial agg), so there is no second scan and
    no self-join. Default winner is the min id; pass ``priority_col``
    (ascending — 0 beats 1) to prefer a curated source when the same
    text appears in several (ties still break by min id). A NULL
    priority sorts LAST (coalesced to +inf-like sentinel): struct
    ordering would otherwise rank NULL first and let an unprioritized
    row silently beat priority 0."""
    keyed = df.withColumn("__fp", F.md5(_norm(text_col)))
    if priority_col is None:
        key = F.col(id_col)
    else:
        pty = F.coalesce(
            F.col(priority_col).cast("double"), F.lit(float("inf"))
        )
        key = F.struct(pty, F.col(id_col))
    return (
        keyed.groupBy("__fp")
        .agg(F.min_by(F.struct(*df.columns), key).alias("__row"))
        .select("__row.*")
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
    granularity: str = "doc",
    n: int = 8,
) -> DataFrame:
    """Cross-source exact-duplicate overlap matrix — which sources copy
    from each other. For every unordered source pair (a < b): how many
    distinct normalized-text fingerprints appear in BOTH, plus each
    side's distinct-fingerprint count (so the caller can turn shared
    counts into containment/Jaccard). The corpus-forensics view that
    decides which feeds to drop before spending near-dup compute.

    ``granularity``: ``"doc"`` fingerprints whole normalized documents
    (verbatim copies); ``"ngram"`` fingerprints distinct word n-grams
    (``n``), catching partial/boilerplate sharing that whole-doc
    hashing misses — on corpora with no verbatim cross-feed copies the
    n-gram view is the one with signal.

    Plan: one distinct over (fingerprint, source) — O(corpus) scan with
    map-side combine — then a self-equi-join on the fingerprint key
    (both sides already hash-partitioned by it) restricted to a < b,
    and a pair-count agg. Nothing quadratic: the join fans out only
    where a fingerprint truly spans sources.
    """
    if granularity == "doc":
        fp = F.md5(_norm(text_col))
        base = df.select(fp.alias("__fp"), F.col(by).alias("__src"))
    elif granularity == "ngram":
        grams = shingles(text_col, n)
        base = df.select(
            F.col(by).alias("__src"), F.explode(grams).alias("__g")
        ).select(F.md5(F.col("__g")).alias("__fp"), "__src")
    else:
        raise ValueError("granularity must be 'doc' or 'ngram'")
    fps = base.distinct()
    sizes = fps.groupBy("__src").agg(F.count(F.lit(1)).alias("__n"))
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), "__fp")
        .where(F.col("a.__src") < F.col("b.__src"))
        .groupBy(
            F.col("a.__src").alias("source_a"), F.col("b.__src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("__src").alias("source_a"), F.col("__n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("__src").alias("source_b"), F.col("__n").alias("n_b"))),
            "source_b",
        )
        .select("source_a", "source_b", "n_shared", "n_a", "n_b")
    )


def incremental_dedup(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seen_fp_col: str | None = None,
) -> DataFrame:
    """Daily-ingest dedup: drop new documents whose fingerprint already
    exists in the historical corpus, then exact-dedup within the batch.

    ``seen`` is either a raw document table (fingerprinted here) or — the
    scale form — a persisted one-column fingerprint table (pass its
    column via ``seen_fp_col``): at 100 TB you keep the md5 set as its
    own (ideally fingerprint-bucketed) table and never re-scan document
    bodies. The plan is one LEFT ANTI join on the fingerprint — shuffles
    only the 16-byte keys of the new batch against the seen set, and
    with both sides bucketed on the fingerprint it is exchange-free —
    plus the within-batch hash-groupBy. This is the batch twin of
    streaming/dedup.py (same md5-of-normalized-text key everywhere, so
    batch, incremental, and streaming dedup agree on what "same" means).
    """
    if seen_fp_col is None:
        seen_fps = seen.select(F.md5(_norm(text_col)).alias("__fp")).distinct()
    else:
        seen_fps = seen.select(F.col(seen_fp_col).alias("__fp")).distinct()
    keyed = new.withColumn("__fp", F.md5(_norm(text_col)))
    fresh = keyed.join(seen_fps, "__fp", "left_anti")
    return (
        fresh.groupBy("__fp")
        .agg(F.min_by(F.struct(*new.columns), F.col(id_col)).alias("__row"))
        .select("__row.*")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n",
    join_sep: str = "\n",
) -> DataFrame:
    """C4-style sub-document dedup: split each document into paragraphs,
    remove every occurrence of a repeated paragraph EXCEPT the first one
    in the corpus (first = smallest ``(id, position)``), and reassemble
    the surviving paragraphs in original order. Documents whose
    paragraphs were all removed drop out entirely (the C4 rule).

    Plan shape: one row-local ``posexplode`` (no shuffle), ONE shuffle
    keyed on the paragraph's md5 for the first-occurrence window (a
    min-struct over each key — no join back, the winner test rides the
    same partitioning), then one shuffle keyed on the doc id to
    reassemble. Paragraph bodies travel through both shuffles once;
    at 100 TB the md5 key spreads boilerplate paragraphs evenly and the
    min-struct window never materializes a pair list.

    Returns (id, text, n_paras_kept, n_paras_total).
    """
    pos, para = "__pos", "__para"
    ex = (
        df.select(F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias(pos, para))
        .withColumn(para, F.trim(F.col(para)))
        .where(F.length(F.col(para)) > 0)
        .withColumn("__k", F.md5(F.lower(F.col(para))))
    )
    first = F.min(F.struct(F.col(id_col).alias("i"), F.col(pos).alias("p"))).over(
        Window.partitionBy("__k")
    )
    # per-doc total BEFORE the winner filter; windowed on the id so the
    # final groupBy reuses the hash partitioning instead of a re-join
    n_total = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    kept = (
        ex.withColumn("__first", first)
        .withColumn("n_paras_total", n_total)
        .where((F.col("__first.i") == F.col(id_col)) & (F.col("__first.p") == F.col(pos)))
    )
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(pos), F.col(para)))),
                lambda s: s[para],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras_kept"),
        F.max("n_paras_total").alias("n_paras_total"),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n",
    join_sep: str = "\n",
    min_repeat: int = 2,
    scope_col: str | None = None,
) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate removal: split each document
    into lines, remove EVERY occurrence of a line that appears at least
    ``min_repeat`` times (corpus-wide, or within ``scope_col`` groups —
    e.g. per source, the natural scope for site chrome like "Sign in"),
    and reassemble the survivors in original order. Documents whose
    lines were all boilerplate drop out entirely.

    This is deliberately NOT :func:`paragraph_dedup` (C4's rule keeps
    the first occurrence); boilerplate removal keeps none — a nav bar
    repeated across a site is noise in all of its occurrences.

    Plan shape: the line array and its per-doc total are computed
    row-locally BEFORE the ``posexplode`` (no counts-only extra scan or
    totals join — the total rides the explode as one int); the repeat
    counts come from a ``groupBy`` on the line's md5 (map-side combine
    collapses a line repeated 10^9 times to at most one row per input
    partition BEFORE the shuffle, so boilerplate skew never
    concentrates); the boilerplate key set then removes its lines via a
    ``left_anti`` join (AQE skew-join splittable). Line text crosses
    exactly one shuffle (the reassembly groupBy) — the count/anti-join
    legs carry only 16-byte keys. Contrast with a ``count() over
    (partition by key)`` window, which would ship every copy of a
    mega-repeated line's text into a single partition.

    Returns (id, [scope], text, n_lines_kept, n_lines_total).
    """
    if min_repeat < 2:
        raise ValueError("min_repeat must be >= 2 (1 would remove every line)")
    pos, line = "__pos", "__line"
    scope = [scope_col] if scope_col is not None else []
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), sep), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in scope],
        F.size(lines_arr).cast("long").alias("n_lines_total"),
        F.posexplode(lines_arr).alias(pos, line),
    ).withColumn("__k", F.md5(F.lower(F.col(line))))
    keys = scope + ["__k"]
    boiler = (
        ex.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__rep"))
        .where(F.col("__rep") >= min_repeat)
        .select(*keys)
    )
    kept = ex.join(boiler, on=keys, how="left_anti")
    return kept.groupBy(id_col, *scope).agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(pos), F.col(line)))),
                lambda s: s[line],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_lines_kept"),
        F.max("n_lines_total").alias("n_lines_total"),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-duplication profile (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 —
    their suffix-array criterion re-expressed as distributed n-token
    windows): every n-token window whose exact text occurs at least
    ``min_count`` times corpus-wide marks its tokens as duplicated;
    per document, report how many tokens sit under at least one
    duplicated window. Feed ``dup_fraction`` into a filter (or
    clean_corpus) to drop boilerplate-heavy documents — the profile
    form of the paper's substring removal.

    Plan shape (100-TB): tokenize + window-hash are row-local JVM
    lambdas staged like winnowing (each array materialized before the
    next lambda references it, so hashes are computed once, not
    re-evaluated per window). The explode emits (id, pos, hash) longs —
    window TEXT never leaves the row. Corpus-wide counts are a groupBy
    on the hash with MAP-SIDE partial aggregation (a boilerplate gram's
    10⁸ occurrences collapse per task instead of funnelling through one
    reducer), and the survivors — only grams that ARE duplicated, the
    boilerplate set — semi-join back against the exploded positions
    (AQE broadcasts it when small). Interval merge of the surviving
    positions is a lag window + groupBy on the id, which the final
    per-doc join reuses. Overlapping windows merge exactly: the first
    duplicated window in a run covers n tokens, each subsequent one
    ``min(n, gap)`` more.

    Counting collides on ``xxhash64`` of the window (8-byte keys, the
    same trade as ``contamination(hash_grams=True)``): two distinct
    n-grams sharing a hash would both count as duplicated — odds
    ~|windows|²/2⁶⁴, vanishing.

    Returns (id, n_tokens, n_windows, dup_windows, dup_tokens,
    dup_fraction) — one row per input document.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    toks = F.transform(tokens(text_col), lambda x: F.lower(x))
    staged = _rebalance(df).select(F.col(id_col), toks.alias("__toks"))
    ntok = F.coalesce(F.size("__toks"), F.lit(0))
    wins = F.when(
        ntok >= n,
        F.transform(
            F.sequence(F.lit(0), ntok - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))),
        ),
    )
    staged = staged.select(
        F.col(id_col), ntok.alias("n_tokens"), wins.alias("__wins")
    )
    # n_windows is arithmetic on n_tokens — the per-doc stats branch must
    # not evaluate the hash lambdas a second time (column pruning drops
    # __wins here, so the corpus is tokenized twice but hashed once)
    docs = staged.select(
        id_col,
        "n_tokens",
        F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).alias("n_windows"),
    )
    ex = staged.select(
        F.col(id_col), F.posexplode("__wins").alias("__pos", "__gh")
    )
    # corpus-wide counts via groupBy, NOT a count window: partial
    # aggregation collapses a boilerplate gram's occurrences map-side
    # (a window keyed on the hash would funnel all of them through one
    # reducer), and the semi-join's right side is only the grams that
    # ARE duplicated — the boilerplate set, tiny next to the corpus
    dup_grams = (
        ex.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= min_count)
        .select("__gh")
    )
    dup = ex.join(dup_grams, "__gh", "left_semi")
    lagp = F.lag("__pos").over(Window.partitionBy(id_col).orderBy("__pos"))
    contrib = F.when(lagp.isNull(), F.lit(n)).otherwise(
        F.least(F.lit(n), F.col("__pos") - lagp)
    )
    cov = (
        dup.withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum("__contrib").alias("dup_tokens"),
        )
    )
    out = docs.join(cov, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce(F.col("dup_windows"), F.lit(0)).alias("dup_windows"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 6)
               ).otherwise(F.lit(0.0)).alias("dup_fraction"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-duplication REMOVAL (the deletion step of Lee et
    al., arXiv:2107.06499, where ``duplicate_spans`` is the profile):
    every token covered by at least one n-token window whose exact
    (lowercased) text occurs >= ``min_count`` times corpus-wide is cut,
    and the document is reassembled from the surviving ORIGINAL tokens,
    single-space joined (removal therefore also normalizes whitespace —
    document that to callers diffing inputs).

    Plan shape: the window-hash explode / map-side count / semi-join
    stages are shared with ``duplicate_spans`` (window text never leaves
    the row; only (id, pos, hash64) longs shuffle). The per-doc covered
    set is first MERGED into disjoint intervals (gaps-and-islands on
    the lag window the profile already uses — O(#dup windows) rows, not
    O(#covered tokens)), collected per doc as an interval array
    (bounded by the doc's own length), and applied row-locally: one
    ``filter``+``exists`` pass over the token array, O(tokens x
    intervals) with intervals few after merging. No token-level join —
    the rebuild costs one broadcast-sized-per-row lambda, not a second
    corpus shuffle.

    Returns (id, n_tokens, removed_tokens, text_cleaned).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    otoks = tokens(text_col)
    ltoks = F.transform(otoks, lambda x: F.lower(x))
    staged = _rebalance(df).select(
        F.col(id_col), otoks.alias("__otoks"), ltoks.alias("__toks")
    )
    ntok = F.coalesce(F.size("__toks"), F.lit(0))
    wins = F.when(
        ntok >= n,
        F.transform(
            F.sequence(F.lit(0), ntok - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))),
        ),
    )
    staged = staged.select(
        F.col(id_col), F.col("__otoks"), ntok.alias("n_tokens"), wins.alias("__wins")
    )
    ex = staged.select(F.col(id_col), F.posexplode("__wins").alias("__pos", "__gh"))
    dup_grams = (
        ex.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= min_count)
        .select("__gh")
    )
    dup = ex.join(dup_grams, "__gh", "left_semi")
    return _delete_covered_windows(staged, dup, id_col, n)


def _delete_covered_windows(
    staged: DataFrame, dup: DataFrame, id_col: str, n: int
) -> DataFrame:
    """Shared deletion machinery for the span-removal family: ``staged``
    is (id, __otoks, n_tokens, __wins), ``dup`` the (id, __pos) windows
    to cut. Merges the covered positions into disjoint intervals
    (gaps-and-islands on a per-doc lag window — O(#dup windows) rows),
    collects them per doc, and rebuilds the text row-locally with one
    filter+exists pass over the original tokens. No token-level join."""
    w = Window.partitionBy(id_col).orderBy("__pos")
    lagp = F.lag("__pos").over(w)
    # windows [pos, pos+n-1]: a new island starts when this window does
    # not overlap/touch the previous one
    new_island = F.when(lagp.isNull() | (F.col("__pos") > lagp + F.lit(n)), 1).otherwise(0)
    islands = (
        dup.withColumn("__grp", F.sum(new_island).over(w))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("__pos").alias("s"),
            (F.max("__pos") + F.lit(n - 1)).alias("e"),
        )
    )
    ivals = islands.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__ivals")
    )
    joined = staged.join(ivals, id_col, "left")
    idx = F.when(
        F.col("n_tokens") > 0, F.sequence(F.lit(0), F.col("n_tokens") - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    covered = lambda i: F.coalesce(  # noqa: E731
        F.exists(
            F.col("__ivals"), lambda v: (i >= v["s"]) & (i <= v["e"])
        ),
        F.lit(False),
    )
    kept = F.filter(idx, lambda i: ~covered(i))
    cleaned = F.array_join(
        F.transform(kept, lambda i: F.element_at(F.col("__otoks"), i + 1)), " "
    )
    return joined.select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") - F.size(kept)).alias("removed_tokens"),
        cleaned.alias("text_cleaned"),
    )


def remove_contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Span-level benchmark DECONTAMINATION (the GPT-3 recipe, Brown et
    al. 2020 appendix C: rather than dropping a contaminated training
    document wholesale, delete exactly the spans that collide with an
    evaluation set — default 13-gram windows, their published n): every
    training token covered by an n-token window whose lowercased text
    occurs anywhere in ``benchmark`` is cut, and the document is
    reassembled from the surviving original tokens (single-space
    joined, as in :func:`remove_duplicate_spans`).

    Plan shape: the corpus side is ``remove_duplicate_spans``' staged
    explode — (id, pos, hash64) longs only, window text never leaves
    the row. The benchmark's distinct window hashes ride a BROADCAST
    semi-join (eval suites are tiny next to a 100-TB corpus — the same
    asymmetry :func:`contamination` exploits), so the corpus never
    shuffles to find its hits; the interval merge + row-local rebuild
    are shared with the dedup deletion. Returns
    (id, n_tokens, removed_tokens, text_cleaned).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    otoks = tokens(text_col)
    ltoks = F.transform(otoks, lambda x: F.lower(x))
    staged = _rebalance(df).select(
        F.col(id_col), otoks.alias("__otoks"), ltoks.alias("__toks")
    )
    ntok = F.coalesce(F.size("__toks"), F.lit(0))
    wins = F.when(
        ntok >= n,
        F.transform(
            F.sequence(F.lit(0), ntok - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))),
        ),
    )
    staged = staged.select(
        F.col(id_col), F.col("__otoks"), ntok.alias("n_tokens"), wins.alias("__wins")
    )
    ex = staged.select(F.col(id_col), F.posexplode("__wins").alias("__pos", "__gh"))
    # stage the benchmark tokens as a real column first — inlining the
    # split inside the per-window lambda re-tokenizes per gram position
    # (the same O(len²) trap the __toks staging above avoids)
    btoks = F.transform(tokens(bench_text_col or text_col), lambda x: F.lower(x))
    bstaged = benchmark.select(btoks.alias("__btoks"))
    bn = F.coalesce(F.size("__btoks"), F.lit(0))
    bwins = F.when(
        bn >= n,
        F.transform(
            F.sequence(F.lit(0), bn - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("__btoks"), i + 1, n))),
        ),
    )
    bench_grams = (
        bstaged.select(F.explode(bwins).alias("__gh")).distinct()
    )
    dup = ex.join(F.broadcast(bench_grams), "__gh", "left_semi")
    return _delete_covered_windows(staged, dup, id_col, n)


def _quote_col(name: str) -> str:
    """Backtick-quote a column reference for SQL rendering. Dots split
    into quoted path segments so a nested-field reference like
    ``meta.text`` keeps the ``F.col`` resolution semantics this render
    replaced (r13) — ``F.col`` also treats dots as struct access."""
    return ".".join(
        "`" + seg.replace("`", "``") + "`" for seg in name.split(".")
    )


def _tokens_sql(col_sql: str) -> str:
    """SQL text of :func:`~clarite_python_spark.operators.text.tokens`:
    whitespace split with empty tokens dropped (identical expression)."""
    return f"filter(split(trim({col_sql}), '\\\\s+'), x -> x != '')"


def _shingles_sql(text_col: str, n: int) -> str:
    """SQL text of :func:`shingles` — the identical expression tree
    rendered as one string so construction is ONE JVM parse instead of
    dozens of py4j round trips per HOF node (the round-13 batch-12
    idiom; measured ~1.3k round trips per minhash_dedup construction,
    most of them here and in the signature/banding folds)."""
    toks = _tokens_sql(_quote_col(text_col))
    gram = f"concat_ws(' ', slice(tk, (i + 1), {n}))"
    per_tk = (
        f"CASE WHEN (size(tk) >= {n}) "
        f"THEN transform(sequence(0, (size(tk) - {n})), i -> {gram}) "
        f"ELSE array(concat_ws(' ', tk)) END"
    )
    return f"array_distinct(get(transform(array({toks}), tk -> {per_tk}), 0))"


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM lambdas).

    The token array is BOUND as a lambda variable (the 1-element-array
    ``transform`` wrapper) before the per-position gram loop: lambda
    bodies get no common-subexpression elimination, so referencing the
    ``tokens()`` split expression directly inside the per-gram lambda
    re-tokenizes the whole document for every gram position — O(len²)
    work per document (measured sf0.1: the shingle projection alone
    5.24 s -> 0.77 s with the binding; identical gram lists).

    Rendered as one SQL parse (:func:`_shingles_sql`); bit-identical to
    the Column-API build (pinned by test_dedup parity)."""
    return F.expr(_shingles_sql(text_col, n))


def benchmark_grams(
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """The benchmark's DISTINCT word n-gram set (one ``__gram`` column,
    xxhash64 longs by default) — the broadcastable probe side of
    :func:`contamination` / :func:`fuzzy_contamination`, exposed so a
    long-lived pipeline (or the streaming twin) can derive it once,
    persist it, and reuse it across scans/micro-batches."""
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: F.col(c))
    return (
        benchmark.select(F.explode(shingles(text_col, n)).alias("__raw"))
        .select(key("__raw").alias("__gram"))
        .distinct()
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
    hash_grams: bool = True,
    bench_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark-contamination detection: flag training documents that
    share word ``n``-grams with an evaluation benchmark (the standard
    decontamination step — GPT-3 App. C / PaLM / Llama all use an
    n-gram collision test of this shape before training).

    ``bench_grams``: optionally pass the pre-built distinct gram set
    (one ``__gram`` column, as produced by :func:`benchmark_grams`) —
    the streaming twin persists it once instead of re-deriving it every
    micro-batch.

    Plan: distinct n-grams per document (row-local JVM lambdas, no
    shuffle), the benchmark's DISTINCT global n-gram set (eval suites
    are tiny next to a 100 TB corpus, so it is broadcast by default —
    the corpus side never shuffles), one left join marking collisions,
    one groupBy(id) count. Corpus cost is a linear scan + one keyed
    aggregation regardless of benchmark count.

    Returns (id, n_ngrams, n_contaminated, contamination_frac,
    contaminated).
    """
    bcol = bench_text_col or text_col
    # hash_grams (default): collide on xxhash64 of the gram instead of
    # the gram string — the broadcast set holds 8-byte longs, not
    # n-token strings (~5x smaller at n=5), and the probe compares
    # longs. Collision odds are ~|grams|^2 / 2^64 (vanishing); pass
    # hash_grams=False for exact string matching.
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: F.col(c))
    grams = (
        _rebalance(df)
        .select(F.col(id_col), F.explode(shingles(text_col, n)).alias("__raw"))
        .select(F.col(id_col), key("__raw").alias("__gram"))
    )
    if bench_grams is None:
        bench_grams = benchmark_grams(benchmark, n, bcol, hash_grams)
    bench = bench_grams.withColumn("__hit", F.lit(1))
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    marked = grams.join(bench, "__gram", "left")
    out = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
    )
    return out.select(
        id_col,
        "n_ngrams",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6).alias("contamination_frac"),
        (F.col("n_contaminated") > 0).alias("contaminated"),
    )


def fuzzy_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
    bench_bands: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy decontamination: corpus documents that NEAR-duplicate a
    benchmark document — the MinHash complement to the exact n-gram
    :func:`contamination` test, catching reformatted or partially-copied
    benchmark items a verbatim n-gram collision misses.

    ``bench_bands`` (optional): a precomputed :func:`band_table` for the
    benchmark side — skips re-banding it this call (the scale form when
    the benchmark/history side is large and stable). The benchmark
    documents themselves are still required for the Jaccard verify of
    matched candidates (O(candidates), not O(benchmark)).

    Both sets are banded with the same MinHash family; a (corpus, bench)
    pair is a candidate iff it collides in at least one band (equi-join
    on (band, bucket) over the union — no cross join), buckets above
    ``max_bucket`` total members are dropped (the standard LSH
    guardrail), and candidates are verified with exact shingle Jaccard
    >= ``threshold`` (0.5 default: decontamination flags partial
    overlap, not just full dups). Shingling for the verify step is
    O(candidates), not O(corpus). Returns (id, bench_id, jaccard).
    """
    bcol = bench_text_col or text_col
    a = _banded(
        _rebalance(df), text_col, id_col, num_hashes, bands, shingle_n, hash_family
    ).select(F.col(id_col).alias("__id"), "band", "bucket", F.lit("c").alias("__side"))
    if bench_bands is None:
        bench_bands = _banded(
            benchmark, bcol, id_col, num_hashes, bands, shingle_n, hash_family
        )
    b = bench_bands.select(
        F.col(id_col).alias("__id"), "band", "bucket", F.lit("b").alias("__side")
    )
    buckets = (
        a.unionByName(b)
        .groupBy("band", "bucket")
        .agg(
            F.collect_list(F.when(F.col("__side") == "c", F.col("__id"))).alias("cids"),
            F.collect_list(F.when(F.col("__side") == "b", F.col("__id"))).alias("bids"),
        )
        .where(
            (F.size("cids") > 0)
            & (F.size("bids") > 0)
            & ((F.size("cids") + F.size("bids")) <= max_bucket)
        )
    )
    pairs = (
        buckets.select(F.explode("cids").alias(id_col), "bids")
        .select(id_col, F.explode("bids").alias("bench_id"))
        .distinct()
        # consumed three times (two id semi-joins + the scoring join):
        # lazily checkpoint so the cross-set banding pass runs once
        .localCheckpoint(eager=False)
    )
    sub_c = df.join(pairs.select(id_col).distinct(), on=id_col, how="left_semi").select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__shc")
    )
    sub_b = benchmark.join(
        pairs.select(F.col("bench_id").alias(id_col)).distinct(), on=id_col, how="left_semi"
    ).select(F.col(id_col).alias("bench_id"), shingles(bcol, shingle_n).alias("__shb"))
    return (
        pairs.join(sub_c, id_col)
        .join(sub_b, "bench_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__shc", "__shb"))
            / F.greatest(F.size(F.array_union("__shc", "__shb")), F.lit(1)),
        )
        .where(F.col("jaccard") >= threshold)
        .select(id_col, "bench_id", "jaccard")
    )


def incremental_neardup(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
    seen_bands: DataFrame | None = None,
    transitive: bool = False,
    keep_col: str | None = None,
    keep_order: str = "max",
) -> DataFrame:
    """Daily-ingest NEAR-duplicate dedup — the fuzzy twin of
    :func:`incremental_dedup`: drop new documents whose shingle Jaccard
    against ANY historical document reaches ``threshold``, then
    minhash-dedup the survivors within the batch.

    The cross-set candidate generation is the same banded machinery as
    :func:`fuzzy_contamination` (equi-join on (band, bucket), no cross
    join). History-side banding cost is O(|seen|) per run — the scale
    form persists the seen set's :func:`band_table` once, appends only
    each day's additions, and passes it via ``seen_bands`` (must share
    this call's num_hashes/bands/shingle_n/hash_family). Returns the
    kept subset of ``new`` with the original columns.

    ``transitive`` / ``keep_col`` / ``keep_order`` apply to the
    WITHIN-BATCH pass only (:func:`minhash_dedup` semantics) — the
    cross-set rule is necessarily greedy (history always wins; a new
    doc can never displace an already-persisted one), so a keep-best
    policy can only choose among the batch's own near-dup clusters.
    """
    hits = fuzzy_contamination(
        new,
        seen,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
        hash_family=hash_family,
        bench_bands=seen_bands,
    )
    fresh = new.join(hits.select(id_col).distinct(), id_col, "left_anti")
    return minhash_dedup(
        fresh,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
        transitive=transitive,
        keep_col=keep_col,
        keep_order=keep_order,
    )


def _md5_member(s: Column, j: Column) -> Column:
    """Portable 60-bit hash-family member: the first 15 hex chars of
    ``md5(shingle:j)`` as a BIGINT.  ~10x slower than xxhash64 (md5 +
    hex conv per member) but bit-for-bit reproducible in DuckDB, which
    has no xxhash64 — this is what makes the md5-family MinHash pipeline
    oracle-checkable end-to-end."""
    from clarite_python_spark.functions.hashing import md5_60bit

    return md5_60bit(F.concat_ws(":", s, j.cast("string")))


def minhash_signature(
    shingle_col: Column, num_hashes: int = 32, hash_family: str = "xxhash64"
) -> Column:
    """MinHash signature: element j = min over shingles of hash-family
    member j.  ``hash_family="xxhash64"`` (default, the scale path):
    Spark-native xxhash64 over the (shingle, j) tuple — JVM-side, no
    UDF.  ``"md5"``: 60-bit md5-derived members (:func:`_md5_member`) —
    slower, but exactly reproducible in DuckDB for oracle checks.

    Built as ONE ``aggregate`` fold over the shingle array so the
    (interpreted — higher-order functions don't codegen) shingling
    expression is evaluated once per row, not once per hash function:
    acc[j] = least(acc[j], member(s, j)). Measured alternatives both
    lose: per-hash ``array_min(transform(...))`` re-derives the shingle
    array num_hashes times (~30x); pre-hashing each string once and
    deriving members from the 8-byte value adds a nested array
    allocation per element that costs more than the string re-hash
    (~2x slower at 32 hashes)."""
    member = F.xxhash64 if hash_family == "xxhash64" else _md5_member
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    max_long = (1 << 63) - 1
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        shingle_col,
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc, F.transform(seeds, lambda j: member(s, j)), lambda a, h: F.least(a, h)
        ),
    )


def _member_sql(hash_family: str, s: str, j: str) -> str:
    """SQL text of one hash-family member — xxhash64(s, j) or the
    60-bit md5 (:func:`_md5_member` /
    :func:`~clarite_python_spark.functions.hashing.md5_60bit`)."""
    if hash_family == "xxhash64":
        return f"xxhash64({s}, {j})"
    return (
        f"CAST(conv(substring(md5(concat_ws(':', {s}, CAST({j} AS STRING))), "
        f"1, 15), 16, 10) AS BIGINT)"
    )


def _minhash_signature_sql(sh_sql: str, num_hashes: int, hash_family: str) -> str:
    """SQL text of :func:`minhash_signature` over the rendered shingle
    expression — the identical aggregate/zip_with/transform fold as one
    JVM parse (construction cost only; the runtime plan is unchanged)."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    max_long = (1 << 63) - 1
    member = _member_sql(hash_family, "s", "j")
    return (
        f"aggregate({sh_sql}, "
        f"array_repeat(CAST({max_long} AS BIGINT), {num_hashes}), "
        f"(acc, s) -> zip_with(acc, "
        f"transform(sequence(0, {num_hashes - 1}), j -> {member}), "
        f"(a, h) -> least(a, h)))"
    )


def _banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    hash_family: str,
) -> DataFrame:
    """(id, band, bucket) band-hash frame shared by the within-corpus
    LSH candidates and the cross-set fuzzy contamination.

    Both the signature fold and the banding transform render as single
    SQL parses — identical expression trees, one py4j round trip each
    instead of one per node (round-13 construction-cost idiom)."""
    rows_per_band = num_hashes // bands
    sig = F.expr(
        _minhash_signature_sql(
            _shingles_sql(text_col, shingle_n), num_hashes, hash_family
        )
    )
    joined = (
        "concat_ws(',', transform("
        f"slice(__sig, ((b * {rows_per_band}) + 1), {rows_per_band}), "
        "v -> CAST(v AS STRING)))"
    )
    bucket = (
        f"CAST(xxhash64({joined}) AS STRING)"
        if hash_family == "xxhash64"
        else joined
    )
    band_structs = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, 'bucket', {bucket}))"
    )

    return df.select(F.col(id_col), sig.alias("__sig")).select(
        id_col,
        F.explode(band_structs).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The persistable LSH index: (id, band, bucket) rows for every
    document — the precomputed form of the banding pass that
    :func:`fuzzy_contamination` / :func:`incremental_neardup` otherwise
    re-run over the full history every call.

    At 100 TB the kept corpus's band table is written once (ideally
    bucketed on (band, bucket)) and only each batch's additions are
    appended — re-banding history costs O(|history|) interpreted
    signature folds per run, the single most expensive part of the
    incremental near-dup plan. Pass the persisted table back via
    ``seen_bands=`` / ``bench_bands=``. MUST be built with the same
    (num_hashes, bands, shingle_n, hash_family) as the probe side —
    bucket keys from different configs never collide correctly."""
    return _banded(
        _rebalance(df), text_col, id_col, num_hashes, bands, shingle_n, hash_family
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    shingle -> minhash -> split signature into ``bands`` bands -> hash
    each band -> explode -> groupBy(band, band_hash) -> pairs from
    buckets. Returns distinct (id_a, id_b) with id_a < id_b.

    ``max_bucket`` drops degenerate buckets to bound pair blowup — and
    it is the quadratic lever on duplicate-HEAVY corpora: every admitted
    bucket contributes up to C(|bucket|, 2) pairs per band, and each
    admitted pair later costs ~2x the doc's gram count in the exact
    verify (measured r10: 500k docs in 100-member near-dup cliques
    admitted 27.3M pairs, whose verify exploded to ~5B (pair, gram)
    rows and ~47 GB of shuffle — bench_minhash_scale.py). When the
    corpus is known duplicate-dense, LOWER max_bucket below the
    expected clique size: dropping a full-clique bucket loses no
    recall that the other bands' sub-buckets don't recover, and the
    verify bill falls quadratically.
    ``hash_family="md5"`` keeps the band key as the raw joined-value
    string (no xxhash64 compaction) so DuckDB reproduces it exactly."""
    banded = _banded(
        _rebalance(df), text_col, id_col, num_hashes, bands, shingle_n, hash_family
    )
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    return pairs


def lsh_recall(
    df: DataFrame,
    threshold: float = 0.5,
    sample_fraction: float = 0.5,
    salt: str = "recall",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 1000,
    max_sample_rows: int | None = 10_000,
) -> DataFrame:
    """Measure, don't guess: candidate RECALL of the banded MinHash-LSH
    against exact ground truth on a deterministic sample. Draws a
    hash-sample of the corpus, computes the TRUE pair set (all-pairs
    shingle Jaccard >= threshold — quadratic, which is why it runs on
    the sample, never the corpus), the LSH candidate set on the same
    sample, and their intersection. One summary row: sample size, true
    pairs, candidate pairs, hits, recall = hits/true, precision =
    hits/candidates (how much verify work the banding wastes).

    Run this before trusting a (num_hashes, bands, threshold) config at
    100 TB — banding recall is 1-(1-t^r)^b in theory; this measures it
    on YOUR corpus. The sample is md5-deterministic, so the number is
    reproducible across runs and engines.

    The quadratic truth join is guarded: the sample is pre-counted and
    refused above ``max_sample_rows`` (called naively with the default
    ``sample_fraction=0.5`` on a 10^9-doc corpus it would otherwise
    attempt a ~10^17-pair nested-loop join). Shrink ``sample_fraction``
    until the sample fits, or pass ``max_sample_rows=None`` to force the
    all-pairs plan — the same refusal contract as
    ``embedding_neardup(exact=True)``'s ``max_exact_rows``.
    """
    from clarite_python_spark.operators.pipeline import deterministic_sample

    if not 0 < sample_fraction <= 1:
        raise ValueError("sample_fraction must be in (0, 1]")
    sample = deterministic_sample(
        df, sample_fraction, id_col=id_col, salt=salt
    )
    if max_sample_rows is not None:
        n = sample.count()
        if n > max_sample_rows:
            raise ValueError(
                f"lsh_recall sample has {n} rows — the exact ground truth "
                f"would score ~{n * (n - 1) // 2} pairs "
                f"(> max_sample_rows={max_sample_rows}). Shrink "
                "sample_fraction, or pass max_sample_rows=None to force "
                "the quadratic truth join."
            )
    # the truth side is all-pairs by construction — exactly the regime
    # the inverted-index strategy exists for, and with candidates=None
    # the O(sample²) pair frame is never even built (measured sf0.1:
    # lsh_recall_documents 109.2 s -> 12.4 s); a non-positive threshold
    # (degenerate: every pair is "true") keeps the explicit-pairs plan
    if threshold > 0:
        truth = ngram_jaccard_pairs(
            sample, None, text_col, id_col, shingle_n, threshold,
            strategy="index",
        ).select("id_a", "id_b")
    else:
        ids = sample.select(id_col)
        allpairs = ids.select(F.col(id_col).alias("id_a")).join(
            ids.select(F.col(id_col).alias("id_b")), F.col("id_a") < F.col("id_b")
        )
        truth = ngram_jaccard_pairs(
            sample, allpairs, text_col, id_col, shingle_n, threshold
        ).select("id_a", "id_b")
    cands = minhash_lsh_candidates(
        sample, text_col, id_col, num_hashes, bands, shingle_n, max_bucket,
        hash_family,
    )
    # ONE full-outer join carries all three pair counts, so the truth
    # and candidate DAGs (each expensive: all-pairs Jaccard / banding)
    # evaluate exactly once instead of once per count aggregation
    j = truth.withColumn("__t", F.lit(1)).join(
        cands.withColumn("__c", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    counts = j.agg(
        F.sum("__t").alias("n_true_pairs"),
        F.sum("__c").alias("n_candidate_pairs"),
        F.sum(F.col("__t") * F.col("__c")).alias("n_hits"),
    ).select(
        F.coalesce("n_true_pairs", F.lit(0)).alias("n_true_pairs"),
        F.coalesce("n_candidate_pairs", F.lit(0)).alias("n_candidate_pairs"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    )
    n_s = sample.agg(F.count(F.lit(1)).alias("n_sample"))
    one = n_s.crossJoin(F.broadcast(counts))
    return one.select(
        "n_sample",
        "n_true_pairs",
        "n_candidate_pairs",
        "n_hits",
        F.when(
            F.col("n_true_pairs") > 0,
            F.round(F.col("n_hits") / F.col("n_true_pairs"), 6),
        ).alias("recall"),
        F.when(
            F.col("n_candidate_pairs") > 0,
            F.round(F.col("n_hits") / F.col("n_candidate_pairs"), 6),
        ).alias("precision"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash_shingles: bool = False,
    strategy: str = "join",
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins each side of the pair to its (distinct) shingle set and computes
    |∩| / |∪| with JVM array ops. Shingles are computed only for documents
    that appear in a candidate pair (semi-join first — the expensive
    interpreted shingling must be O(|candidates|), not O(|corpus|)).

    ``hash_shingles=True`` carries xxhash64 longs instead of n-gram
    strings through the pair join — the set arithmetic is identical
    unless two distinct grams collide in 2^64 (birthday odds ~|grams|²/2^65,
    vanishing), and the per-pair shuffle payload drops ~5-10x (8-byte
    longs vs n-token strings). Measured: the difference between a 1M-doc
    near-dup-clique corpus spilling >50 GB and completing.

    The candidate list is consumed THREE times (both sides of the id
    union below, then the scoring join) — a lazy localCheckpoint
    materializes it at first evaluation so the candidate-generation DAG
    (for minhash_dedup: the whole signature+banding pass) runs once, not
    three times; measured ~1.5x on the sf0.1 headline dedup, identical
    survivors (BASELINE.md round-7 fourth batch).

    ``strategy`` picks the scoring plan — identical jaccard values:

    - ``'join'`` (default): attach each side's full shingle array to
      every candidate pair and compare with ``array_intersect`` /
      ``array_union``. Cost is O(|candidates| · gram-count) pair rows
      each carrying two whole shingle arrays through a shuffle — right
      when candidates are few (the banded-LSH verify).
    - ``'index'``: the classic inverted index. Explode candidate docs
      to distinct (id, gram) rows, self-join on the gram to count
      |A∩B| per colliding pair, and finish with |A∪B| = |A|+|B|−|A∩B|
      from a per-doc gram-count table. Nothing heavier than an 8-byte
      pair row crosses the exchange, and only pairs sharing ≥ 1 gram
      are ever materialized — which loses nobody: a pair with an empty
      intersection has jaccard 0 and cannot clear a positive
      ``threshold``. This is the all-pairs/dense-candidates shape
      (measured sf0.1: the 12.5M-pair ``ngram_jaccard_documents``
      47.7 s -> 4.1 s; its pair budget is the Σ_g df(g)² collision
      count — 1.27M — instead of |candidates|). Requires
      ``threshold > 0`` (a zero threshold would have to emit
      non-intersecting pairs) and ``id_a != id_b`` candidate rows (the
      all-pairs and banded generators both emit strict ``<`` pairs);
      candidate orientation may be arbitrary — scores attach through a
      (least, greatest) normalization.

    ``candidates=None`` (index strategy only) scores EVERY ``id_a <
    id_b`` pair of ``df`` — the all-pairs truth computation — without
    ever materializing the O(n²) candidate frame: the colliding pairs
    the inverted index finds ARE the result set (everything else has
    jaccard 0). The explicit all-pairs frame costs a full nested-loop
    materialization + an O(n²)-row checkpoint + an O(n²)-row join that
    the collision count makes irrelevant (measured sf0.1: 40.6 s with
    the frame vs 4 s without, on 1.27M colliding of 12.5M pairs).
    """
    if strategy not in ("join", "index"):
        raise ValueError("strategy must be 'join' or 'index'")
    if candidates is None and strategy != "index":
        raise ValueError(
            "candidates=None (score all pairs) requires strategy='index'"
        )
    if candidates is not None:
        candidates = candidates.localCheckpoint(eager=False)
    sh_col = shingles(text_col, shingle_n)
    if hash_shingles:
        sh_col = F.transform(sh_col, lambda s: F.xxhash64(s))
    if candidates is None:
        sub = df
    else:
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sub = df.join(cand_ids, on=id_col, how="left_semi")
    if strategy == "index":
        if threshold <= 0:
            raise ValueError(
                "strategy='index' needs threshold > 0: it only materializes "
                "pairs with a nonzero gram intersection"
            )
        # the gram table feeds three consumers (sizes + both self-join
        # sides); materialize the tokenize+shingle pass once
        from pyspark import StorageLevel

        grams = (
            sub.select(F.col(id_col), F.explode(sh_col).alias("__g"))
            .distinct()
            .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        )
        sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
        inter = (
            grams.select(F.col(id_col).alias("__pa"), "__g")
            .join(grams.select(F.col(id_col).alias("__pb"), "__g"), "__g")
            .where(F.col("__pa") < F.col("__pb"))
            .groupBy("__pa", "__pb")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        if candidates is None:
            restricted = inter.select(
                F.col("__pa"), F.col("__pb"),
                F.col("__pa").alias("id_a"), F.col("__pb").alias("id_b"),
                "__c",
            )
        else:
            restricted = candidates.select(
                "id_a",
                "id_b",
                F.least("id_a", "id_b").alias("__pa"),
                F.greatest("id_a", "id_b").alias("__pb"),
            ).join(inter, ["__pa", "__pb"])
        scored = (
            restricted.join(
                sizes.select(F.col(id_col).alias("__pa"), F.col("__n").alias("__na")),
                "__pa",
            )
            .join(
                sizes.select(F.col(id_col).alias("__pb"), F.col("__n").alias("__nb")),
                "__pb",
            )
            # same long/long -> double division as size()/size() below:
            # both ratios are exact-integer quotients, bit-identical
            .withColumn(
                "jaccard",
                F.col("__c") / (F.col("__na") + F.col("__nb") - F.col("__c")),
            )
            .select("id_a", "id_b", "jaccard")
        )
        return scored.where(F.col("jaccard") >= threshold)
    sh = sub.select(F.col(id_col), sh_col.alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    scored = (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return scored.where(F.col("jaccard") >= threshold)


def containment_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Verify candidate pairs with exact ASYMMETRIC n-gram containment:
    C(A|B) = |A \u2229 B| / |A| \u2014 the doc-in-doc detector Jaccard misses. A
    500-word quote embedded in a 50k-word page scores Jaccard ~0.01
    (invisible to ``ngram_jaccard_pairs`` at any sane threshold) but
    containment ~1.0 from the quote's side; this is the RefinedWeb/Lee
    et al. motivation for substring-level dedup, expressed at document
    granularity. Returns both directions plus the symmetric max:
    (id_a, id_b, containment_a_in_b, containment_b_in_a, containment),
    kept where the max clears ``threshold``.

    Same verify-kernel shape as :func:`ngram_jaccard_pairs` (semi-join
    the corpus to candidate ids first, one pair join, JVM set
    arithmetic; ``hash_shingles`` carries 8-byte longs), and the same
    candidate-source contract: feed it banded MinHash candidates for
    same-size near-dups, or fingerprint/gram-collision candidates
    (``source_overlap``'s construction) when the asymmetric case
    matters \u2014 banding recall follows JACCARD, so a tiny-in-huge pair
    can miss banding even though its containment is 1.0; at 100 TB
    generate containment candidates from shared rare-gram collisions,
    not MinHash bands.
    """
    candidates = candidates.localCheckpoint(eager=False)
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sub = df.join(cand_ids, on=id_col, how="left_semi")
    sh_col = shingles(text_col, shingle_n)
    if hash_shingles:
        sh_col = F.transform(sh_col, lambda s: F.xxhash64(s))
    sh = sub.select(F.col(id_col), sh_col.alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    scored = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.greatest(F.size("sh_a"), F.lit(1))).alias(
                "containment_a_in_b"
            ),
            (inter / F.greatest(F.size("sh_b"), F.lit(1))).alias(
                "containment_b_in_a"
            ),
        )
        .withColumn(
            "containment",
            F.greatest("containment_a_in_b", "containment_b_in_a"),
        )
    )
    return scored.where(F.col("containment") >= threshold)


# measured round 11 (SCALE.md): ~1 GB executor heap per this many
# undirected edges per 32-core executor
_EDGES_PER_GB = 7_000_000


def _parse_jvm_mem_gb(s: str) -> float | None:
    """Parse a JVM memory string ('8g', '512m', '16384k', '1t') to GB.
    A bare number is MiB — Spark's byteStringAsMb semantics for
    spark.executor.memory / spark.driver.memory — so '4096' means 4 GB,
    not 4096 bytes."""
    s = s.strip().lower()
    if s.endswith("b") and len(s) > 1 and s[-2] in "kmgt":
        s = s[:-1]  # '512mb' -> '512m'
    mult = {"k": 1 / 1024**2, "m": 1 / 1024, "g": 1.0, "t": 1024.0}
    try:
        if s and s[-1] in mult:
            return float(s[:-1]) * mult[s[-1]]
        return float(s) / 1024  # bare number = MiB
    except ValueError:
        return None


def _session_heap_gb(spark) -> float | None:
    """Executor heap of the session in GB, from spark.executor.memory
    (cluster) falling back to spark.driver.memory (local mode, where
    executors live in the driver JVM). None when neither conf is set
    (a bare session — the guard then stays silent rather than guess)."""
    for key in ("spark.executor.memory", "spark.driver.memory"):
        try:
            gb = _parse_jvm_mem_gb(spark.conf.get(key))
        except Exception:
            gb = None
        if gb is not None:
            return gb
    return None


def _warn_if_heap_short(sym: DataFrame, n_sym: int | None = None) -> None:
    """Pre-flight check for the CC kernel against the measured sizing
    rule (SCALE.md round 11: ~1 GB executor heap per 7M undirected
    edges per 32-core executor — at 100M edges an 8g session aborts
    with UNABLE_TO_ACQUIRE_MEMORY in the first distinct/join stages,
    AFTER burning the edge-materialization cost twice). ``sym`` is the
    already-checkpointed symmetrized edge list, so the count is one
    cheap scan of stored blocks. Warns — never changes behavior — so an
    over-provisioned cluster (where heap-per-executor is what matters,
    not the session total) is not blocked by a local heuristic."""
    import warnings

    heap = _session_heap_gb(sym.sparkSession)
    if heap is None:
        return
    n_edges = (sym.count() if n_sym is None else n_sym) // 2
    need = n_edges / _EDGES_PER_GB
    if need > heap:
        warnings.warn(
            f"connected components over ~{n_edges:,} edges wants "
            f"~{need:.1f} GB executor heap (measured sizing rule: ~1 GB "
            f"per 7M edges per 32-core executor, SCALE.md round 11) but "
            f"this session has {heap:.1f} GB — expect "
            f"UNABLE_TO_ACQUIRE_MEMORY in the first distinct/join "
            f"stages; raise spark.executor.memory/spark.driver.memory "
            f"or shard the edge list",
            ResourceWarning,
            stacklevel=4,
        )


def _driver_components(sym: DataFrame) -> DataFrame:
    """Union-find over a driver-collected (bounded — see caller guard)
    symmetrized edge list. Produces EXACTLY the distributed loop's
    output: one (id, label) row per vertex appearing in an edge, label
    = the component's minimum id (python ``<`` agrees with Spark's
    ordering for the long and UTF-8-string ids these graphs use).
    The same bounded-driver-materialization pattern as the k-means
    training sample and ``train_bpe(strategy='driver')``."""
    rows = sym.select("src", "dst").collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    mins: dict = {}
    for v in parent:
        r = find(v)
        m = mins.get(r)
        if m is None or v < m:
            mins[r] = v
    id_type = sym.schema["src"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id", id_type), StructField("label", id_type)]
    )
    return sym.sparkSession.createDataFrame(
        [(v, mins[find(v)]) for v in parent], schema
    )


def _min_label_components(
    edges: DataFrame,
    max_iter: int = 20,
    shortcut: bool = False,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list (id_a, id_b) by
    iterative min-label propagation: every vertex starts labeled with its
    own id; each round takes the min of its own and its neighbors'
    labels; fixpoint => label == min id of the component.

    ``shortcut=False`` converges in O(component diameter) rounds —
    fine for known-shallow graphs (stars/cliques, diameter 1-2), where
    ``max_iter`` is a safety bound, not a typical cost.

    ``shortcut=True`` adds pointer jumping after each neighbor step:
    ``label(v) <- label(label(v))`` (one label-keyed self-join). Labels
    are always vertex ids of the same component and only decrease, so the
    jump preserves the invariant while doubling the effective propagation
    distance — O(log diameter) rounds on deep graphs (85.7 s -> measured
    in BASELINE.md round-10 for a diameter-19 chain at 1M nodes). Both
    the public graph operator and the dedup survivor policies default to
    this: near-dup graphs are usually shallow (where the jump is
    measured-neutral) but a pathological duplicate chain is O(log d)
    instead of hitting the non-convergence raise.

    Storage discipline (the 100M-edge lesson, r11):

    * the symmetrized DISTINCT edge list is ``localCheckpoint``-ed ONCE
      up front — ``edges`` is usually the tail of an expensive pipeline
      (banded candidates -> exact-Jaccard verify), and without the
      materialization every propagation round re-ran that whole
      pipeline (at 10M docs / 27M verified pairs the r10 stress blew a
      30-min budget exactly this way);
    * every checkpoint in this kernel uses ``StorageLevel.DISK_ONLY``:
      the default MEMORY_AND_DISK level unrolls DESERIALIZED blocks
      through the heap, which OOMed the shipped 8g executor at 54M-row
      edge lists and again at 100M-row label frames (both measured
      r11); DISK_ONLY serializes straight to the executor's disk store
      — one read per round, zero heap unroll;
    * per-round label frames NEED real lineage truncation, not just
      caching: ``labels`` is referenced twice per round (neighbor agg +
      the join back), so the logical plan DOUBLES per round without
      truncation — an 11-round chain OOMed the driver just RENDERING
      the plan tree (measured r11). ``localCheckpoint(storageLevel=
      DISK_ONLY)`` (Spark 4.0+) gives truncation and disk-only blocks
      in one call. Old rounds' blocks are freed by the ContextCleaner
      as references drop; peak disk is O(rounds x vertices) rows in the
      worst case — size executor local storage accordingly (SCALE.md).

    Distinct also collapses multi-edges so each round's neighbor agg
    sees each (src, dst) once. Runs up to ``max_iter`` improving rounds
    plus one final proving round (fixpoint is only PROVEN by a round
    that changes nothing, so proving costs one extra round — a graph
    that converges exactly at round ``max_iter`` must not raise).
    Returns (id, label)."""
    from pyspark import StorageLevel

    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    disk = StorageLevel.DISK_ONLY
    # symmetrize by EXPLODING both directions from each edge row instead
    # of a two-branch union: the union's two selects each re-evaluated
    # the caller's whole edge pipeline (banded candidates -> verify)
    # inside the checkpoint job — the explode reads it once (r13;
    # identical (src, dst) set, same distinct)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
        .localCheckpoint(eager=True, storageLevel=disk)
    )
    # size-guarded driver shortcut (r13): min-label propagation costs
    # O(log diameter) ROUNDS of fixed multi-job latency — measured 12
    # rounds/~11 s on the sf0.1 simhash near-dup graph (496 edges) —
    # while a driver union-find on a small edge list is milliseconds
    # and produces the identical (id, min-id label) rows. The count is
    # a cheap scan of the just-written checkpoint blocks; above the
    # bound the distributed loop below is unchanged (at 100M edges the
    # collect would be the mistake — same guard philosophy as
    # train_bpe's max_vocab_rows).
    n_sym = sym.count()
    # warn BEFORE the path choice: the guard is a pure function of edge
    # count vs session heap (driver-path graphs are <= driver_max_edges,
    # ~0.3 GB by the sizing rule, so a correctly-provisioned session
    # never warns spuriously here)
    _warn_if_heap_short(sym, n_sym)
    if n_sym <= 2 * driver_max_edges:  # sym carries both directions
        return _driver_components(sym)
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    for _ in range(max_iter + 1):
        nbr = (
            sym.join(labels.select(F.col("id").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["src"], "left").select(
            labels["id"],
            F.least(
                labels["label"], F.coalesce(nbr["nbr_label"], labels["label"])
            ).alias("label"),
            labels["label"].alias("__old"),
        )
        if shortcut:
            # materialize once so the self-join below doesn't recompute
            # the neighbor step on both sides — eager, because a lazy
            # checkpoint only guarantees dedup AFTER first evaluation;
            # the self-join's two stages could otherwise race to compute
            # the neighbor step twice before either writes the blocks
            stepped = stepped.localCheckpoint(eager=True, storageLevel=disk)
            l2 = stepped.select(
                F.col("id").alias("__lid"), F.col("label").alias("__llabel")
            )
            stepped = stepped.join(
                l2, stepped["label"] == l2["__lid"], "left"
            ).select(
                stepped["id"],
                F.least(
                    stepped["label"],
                    F.coalesce(F.col("__llabel"), stepped["label"]),
                ).alias("label"),
                stepped["__old"],
            )
        # LAZY checkpoint fused with the convergence collect (r13): the
        # agg below is the sole consumer at materialization time — one
        # job writes the round's label blocks AND returns the change
        # count, instead of an eager-checkpoint job plus a separate
        # collect job. (The shortcut's ``stepped`` checkpoint above must
        # stay EAGER — its self-join has two concurrently-scheduled
        # consumer stages that would race a lazy one; here there is
        # exactly one.) Same blocks, same lineage truncation.
        new = stepped.select(
            "id",
            "label",
            (F.col("label") < F.col("__old")).cast("long").alias("__chg"),
        ).localCheckpoint(eager=False, storageLevel=disk)
        changed = new.agg(F.sum("__chg")).collect()[0][0] or 0
        labels = new.drop("__chg")
        if changed == 0:
            break
    else:
        # all max_iter improving rounds AND the proving round still
        # improved labels, so fixpoint was never PROVEN — returning
        # would hand back silently-wrong components (a >max_iter-hop
        # node keeps a non-min label). Raise instead: this kernel is a
        # public operator over arbitrary graphs now.
        raise RuntimeError(
            f"connected components did not converge within max_iter="
            f"{max_iter} rounds ({changed} labels still improving); "
            "raise max_iter or use shortcut=True (pointer jumping: "
            "O(log diameter) rounds)"
        )
    return labels


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    transitive: bool = False,
    max_iter: int = 20,
    hash_family: str = "xxhash64",
    keep_col: str | None = None,
    keep_order: str = "max",
    max_bucket: int = 1000,
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates -> exact-Jaccard verify
    -> drop duplicates, keeping one representative per group.

    ``transitive=False`` (greedy, the corpus-dedup standard): drop any doc
    similar to a lower-id doc. ``transitive=True``: connected-components
    clustering over the verified pairs (iterative min-label propagation,
    :func:`_min_label_components`), keeping exactly the min-id doc of each
    cluster — A~B~C chains with A!~C resolve to one survivor per cluster
    even when the greedy rule would keep disconnected-looking extras.

    ``keep_col`` picks the cluster representative by a QUALITY metric
    instead of the arbitrary min id — the RefinedWeb/Dolma policy of
    keeping the longest (or highest-scoring) member of each near-dup
    cluster. It implies transitive clustering (a "best of the cluster"
    needs the cluster), keeps the row with the ``keep_order`` extreme of
    ``keep_col`` (``"max"`` default; ties break to the smaller id), and
    adds only an O(#duplicate-docs) metric join + one window over
    cluster-partitioned rows on top of the transitive plan."""
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n,
        max_bucket=max_bucket, hash_family=hash_family,
    )
    dups = ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_n, threshold)
    losers = _dedup_losers(
        df, dups, id_col, transitive, max_iter, keep_col, keep_order
    )
    return df.join(losers, on=id_col, how="left_anti")


def _dedup_losers(
    df: DataFrame,
    dups: DataFrame,
    id_col: str,
    transitive: bool,
    max_iter: int,
    keep_col: str | None,
    keep_order: str,
) -> DataFrame:
    """Shared survivor policy for minhash_dedup / simhash_dedup: greedy
    (drop id_b), transitive min-id, or cluster-best by ``keep_col``."""
    if keep_col is not None:
        if keep_order not in ("max", "min"):
            raise ValueError(f"keep_order must be 'max' or 'min', got {keep_order!r}")
        comp = _min_label_components(dups.select("id_a", "id_b"), max_iter, shortcut=True)
        metric = df.select(F.col(id_col).alias("id"), F.col(keep_col).alias("__keep"))
        order = F.desc("__keep") if keep_order == "max" else F.asc("__keep")
        w = Window.partitionBy("label").orderBy(order, F.asc("id"))
        return (
            comp.join(metric, "id")
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") > 1)
            .select(F.col("id").alias(id_col))
        )
    if transitive:
        comp = _min_label_components(dups.select("id_a", "id_b"), max_iter, shortcut=True)
        return comp.where(F.col("label") != F.col("id")).select(
            F.col("id").alias(id_col)
        )
    return dups.select(F.col("id_b").alias(id_col)).distinct()


def minhash_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_iter: int = 20,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate CLUSTER LABELS instead of survivors: every document
    that belongs to a verified near-dup connected component, labeled by
    the component's min id — the audit view behind
    ``minhash_dedup(transitive=True)`` (same candidates, same verify,
    same min-label propagation). Use it to inspect dup-cluster size
    distributions or pick cluster representatives by a custom policy
    before deleting anything. Returns (id, cluster_label); singleton
    documents (no near-dups) are not emitted.
    """
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n,
        max_bucket=max_bucket, hash_family=hash_family,
    )
    dups = ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_n, threshold)
    comp = _min_label_components(dups.select("id_a", "id_b"), max_iter, shortcut=True)
    return comp.select(F.col("id").alias(id_col), F.col("label").alias("cluster_label"))


def dedup_report(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_iter: int = 20,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-group AUDIT of what near-dup dedup would do — the table a
    training-data org attaches to a dedup run before deleting anything:
    for each ``by`` group, how many documents sit in a near-dup cluster,
    how many the min-id policy would drop, how many distinct clusters
    touch the group, and the largest cluster seen.

    Composes :func:`minhash_clusters` (same candidates, verify, and
    min-label propagation as ``minhash_dedup(transitive=True)``) with
    one O(#duplicate-docs) label join and a per-group aggregation —
    the corpus-sized side contributes only (id, group) pairs. A cluster
    can span groups; ``n_clusters`` counts distinct cluster labels
    PRESENT in the group, so cross-group clusters count once per group
    they touch (the per-group view a mixture owner wants).

    Returns (by, n_docs, n_in_clusters, n_dropped, n_clusters,
    max_cluster) — max_cluster is the GLOBAL size of the largest
    cluster intersecting the group (0 when none).
    """
    labels = minhash_clusters(
        df, text_col, id_col, num_hashes, bands, shingle_n, threshold,
        max_iter, hash_family,
    )
    sizes = labels.groupBy("cluster_label").agg(
        F.count(F.lit(1)).alias("__csize")
    )
    lab = labels.join(sizes, "cluster_label")
    j = df.select(F.col(id_col), F.col(by)).join(lab, id_col, "left")
    return (
        j.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("cluster_label").alias("n_in_clusters"),
            F.coalesce(
                F.sum((F.col("cluster_label") != F.col(id_col)).cast("long")),
                F.lit(0),
            ).alias("n_dropped"),
            F.countDistinct("cluster_label").alias("n_clusters"),
            F.coalesce(F.max("__csize"), F.lit(0)).alias("max_cluster"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint: per token, hash to ``bits`` bits; sum ±1 per
    bit position over tokens; fingerprint bit = sign of the sum.

    One ``aggregate`` lambda with an array accumulator — single narrow
    pass. Returns (id, simhash hex string).  ``hash_family="md5"`` uses
    the portable 60-bit md5 member (requires ``bits <= 60``) so the
    whole fingerprint is reproducible in DuckDB for oracle checks."""
    bits_str = _simhash_bits(text_col, bits, hash_family)
    fp = F.conv(bits_str, 2, 16)
    return _rebalance(df).select(F.col(id_col), fp.alias("simhash"))


def _simhash_bits(text_col: str, bits: int, hash_family: str) -> Column:
    """The SimHash bit-sign pass shared by :func:`simhash` (hex form) and
    :func:`simhash_candidates` (integer form): MSB-first fixed-width
    binary string, one character per fingerprint bit."""
    if hash_family == "md5" and bits > 60:
        raise ValueError("md5 hash family carries 60 bits")
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    if hash_family == "xxhash64":
        member = "xxhash64(t)"
    else:
        member = (
            "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
        )

    # hash each token ONCE, then fold the per-bit ±1 over the hashed
    # longs: higher-order-function lambdas evaluate with no common-
    # subexpression elimination, so `getbit(token_hash(t), b)` inside
    # the per-bit transform recomputes the token hash for every one of
    # the ``bits`` lambda calls — 60 md5 chains per token for the md5
    # family (measured: incremental_simhash_documents sf0.1 66.3 s ->
    # 11.2 s with the hoist; identical fingerprints, the hash values and
    # the ±1 sums are unchanged). ``getbit`` on a ready long is trivial.
    # The whole pass renders as ONE SQL parse (the r13 construction-cost
    # idiom) — the Column-API build of this tree paid ~300 py4j round
    # trips per construction (the `bits` zero literals + 5 lambdas).
    hashed = f"transform({_tokens_sql(_quote_col(text_col))}, t -> {member})"
    zero = "array(" + ", ".join("CAST(0 AS BIGINT)" for _ in range(bits)) + ")"
    counts = (
        f"aggregate({hashed}, {zero}, "
        f"(acc, h) -> zip_with(acc, "
        f"transform(sequence(0, {bits - 1}), "
        f"b -> CAST(CASE WHEN (getbit(h, b) = 1) THEN 1 ELSE -1 END AS BIGINT)), "
        f"(a, x) -> a + x))"
    )
    # bit b of the hash = sign(counts[b]); assemble MSB-first binary
    # (base-converting the string avoids 64-bit signed overflow under
    # ANSI mode). An empty token array leaves every count at 0 => all
    # bits set — empty docs fingerprint identically, by design.
    return F.expr(
        f"concat_ws('', transform(reverse({counts}), "
        f"c -> CASE WHEN (c >= 0) THEN '1' ELSE '0' END))"
    )


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance with banded
    bucketing — the Manku-Jain-Sarma (WWW 2007) web-dedup recipe, the
    token-permutation complement to shingle MinHash-LSH (catches
    reworded bags-of-words MinHash scores low; misses reorderings
    Jaccard catches — run both for belt-and-braces corpus dedup).

    The fingerprint is split into ``bands`` contiguous bit slices; two
    documents are candidates iff at least one slice matches exactly
    (equi-join on (band, slice) — never an all-pairs product), then
    candidates are verified with the exact popcount of the fingerprint
    XOR. With ``bands > max_hamming`` the pigeonhole guarantees EXACT
    recall: <= max_hamming differing bits cannot touch all bands, so
    every qualifying pair shares an untouched band (the default 4/3 is
    the guarantee's minimal shape). ``max_bucket`` drops degenerate
    buckets (e.g. the all-ones empty-doc fingerprint at web scale) to
    bound the per-bucket pair blowup, trading away the guarantee only
    inside dropped buckets.

    Plan: one narrow fingerprint pass (JVM ``aggregate`` fold), one
    explode to ``bands`` rows/doc, one (band, slice) shuffle; the 8-byte
    fingerprint travels WITH the bucket rows so verification needs no
    join back to the corpus. Returns (id_a, id_b, hamming), id_a < id_b.
    """
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    if bits > 62:
        raise ValueError("bits must be <= 62 (fingerprint carried as a signed long)")
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    width = bits // bands
    bits_str = _simhash_bits(text_col, bits, hash_family)
    # stage the binary string ONCE, derive the long from the staged
    # column: putting both conv(bits_str) and bits_str in one projection
    # evaluated the whole fingerprint fold (token hashes + ±1 bit sums)
    # twice per row (no CSE across expressions); CollapseProject keeps
    # the staging projection apart (non-cheap, multi-used ref).
    # Identical __fp/__bs values.
    staged = _rebalance(df).select(F.col(id_col), bits_str.alias("__bs"))
    fps = staged.select(
        F.col(id_col),
        F.conv(F.col("__bs"), 2, 10).cast("long").alias("__fp"),
        F.col("__bs"),
    )
    return _simhash_pairs_from_fps(fps, bits, bands, max_hamming, max_bucket, id_col)


def _simhash_pairs_from_fps(
    fps: DataFrame,
    bits: int,
    bands: int,
    max_hamming: int,
    max_bucket: int,
    id_col: str,
) -> DataFrame:
    """The band/bucket/verify tail of :func:`simhash_candidates` over an
    already-fingerprinted (id, __fp long, __bs binary-string) frame —
    shared with :func:`incremental_simhash_dedup`'s within-batch pass so
    fingerprints are computed (and planned) exactly once per document."""
    width = bits // bands
    band_structs = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"i -> named_struct('band', i, "
        f"'bucket', substring(__bs, ((i * {width}) + 1), {width})))"
    )
    banded = fps.select(
        id_col,
        "__fp",
        F.explode(band_structs).alias("bb"),
    ).select(id_col, "__fp", "bb.band", "bb.bucket")
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("__fp").alias("f"))).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("a"), F.col("ids"))
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a.i") < F.col("b.i"))
        .select(
            F.col("a.i").alias("id_a"),
            F.col("b.i").alias("id_b"),
            F.bit_count(F.col("a.f").bitwiseXOR(F.col("b.f"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
    transitive: bool = False,
    max_iter: int = 20,
    keep_col: str | None = None,
    keep_order: str = "max",
) -> DataFrame:
    """End-to-end SimHash near-dup removal: Hamming-banded candidates
    (:func:`simhash_candidates`) -> drop duplicates keeping one
    representative, with the same survivor policies as
    :func:`minhash_dedup` — greedy (drop any doc within ``max_hamming``
    of a lower-id doc), ``transitive=True`` connected components via
    :func:`_min_label_components` (min-id survivor per cluster), or
    ``keep_col`` cluster-best (keep the ``keep_order`` extreme of
    ``keep_col`` per cluster — the keep-the-longest policy)."""
    dups = simhash_candidates(
        df, text_col, id_col, bits, bands, max_hamming, hash_family, max_bucket
    )
    losers = _dedup_losers(
        df, dups, id_col, transitive, max_iter, keep_col, keep_order
    )
    return df.join(losers, on=id_col, how="left_anti")


def simhash_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
    max_iter: int = 20,
) -> DataFrame:
    """Hamming near-dup CLUSTER LABELS instead of survivors — the
    simhash twin of :func:`minhash_clusters` (same candidates as
    :func:`simhash_candidates`, same min-label propagation), for
    inspecting cluster-size distributions or picking representatives by
    a custom policy before deleting anything. Returns
    (id, cluster_label); singletons are not emitted."""
    dups = simhash_candidates(
        df, text_col, id_col, bits, bands, max_hamming, hash_family, max_bucket
    )
    comp = _min_label_components(dups.select("id_a", "id_b"), max_iter, shortcut=True)
    return comp.select(F.col("id").alias(id_col), F.col("label").alias("cluster_label"))


def incremental_simhash_dedup(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
    seen_fp_col: str | None = None,
    transitive: bool = False,
    keep_col: str | None = None,
    keep_order: str = "max",
) -> DataFrame:
    """Daily-ingest near-dup dedup with SIMHASH state — the cheapest
    incremental form: the whole history is ONE 8-byte fingerprint per
    document (vs :func:`incremental_neardup`'s text access + band
    table), so a 10^12-doc history is an 8 TB fingerprint table a new
    batch equi-joins in one pass. Drop new documents within
    ``max_hamming`` of ANY historical fingerprint, then
    :func:`simhash_dedup` the survivors within the batch.

    ``seen`` is either a raw document table (fingerprinted here) or —
    the scale form — a persisted one-column LONG fingerprint table
    (pass its column via ``seen_fp_col``, the ``incremental_dedup``
    convention); persist ``simhash_fingerprints(new_kept)`` after each
    run to extend it. Cross-set candidates come from the same band-slice
    equi-join as :func:`simhash_candidates` (bands > max_hamming keeps
    the pigeonhole-exact recall), verified by popcount-of-XOR — the
    8-byte payloads make the candidate shuffle ~1000x lighter than a
    shingle-verify. Returns the kept subset of ``new``.

    ``transitive`` / ``keep_col`` / ``keep_order`` apply to the
    WITHIN-BATCH pass only (:func:`simhash_dedup` semantics) — the
    cross-set rule is necessarily greedy (history always wins).
    """
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    if bits > 62:
        raise ValueError("bits must be <= 62 (fingerprint carried as a signed long)")
    from pyspark import StorageLevel

    width = bits // bands
    # the fingerprint expression is built ONCE and reused on both sides
    # (and, via the checkpointed frame, by the within-batch pass): py4j
    # expression construction is a dominant cost of this operator's
    # plan build — measured ~2.4 s per _simhash_bits build at r13
    fp_long = (
        F.conv(_simhash_bits(text_col, bits, hash_family), 2, 10).cast("long")
    )
    # stage COMPUTED fingerprints behind lazy DISK_ONLY checkpoints:
    # CollapseProject would otherwise inline the fingerprint fold into
    # every band substring (and the bucket-cap groupBy + band-join
    # consumers), multiplying the expression tree Catalyst must plan —
    # planning the big hits subtree alone measured 7.2 s at r13. The
    # checkpoint leaf keeps every downstream plan small and computes
    # each fingerprint exactly once at runtime. The persisted-history
    # form (seen_fp_col) is NOT checkpointed: its tree is a trivial
    # column select, and materializing a 10^12-row fingerprint table to
    # local disk would trade multi-TB executor I/O for nothing (its two
    # consumers share the distinct's exchange).
    if seen_fp_col is None:
        seen_fps = (
            _rebalance(seen)
            .select(fp_long.alias("__fp"))
            .distinct()
            .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        )
    else:
        seen_fps = seen.select(F.col(seen_fp_col).alias("__fp")).distinct()

    def banded_fp(df: DataFrame) -> DataFrame:
        # derive the fixed-width binary form from the long (lpad of the
        # base-2 conv) so persisted long fingerprints band identically
        bs = F.lpad(F.conv(F.col("__fp").cast("string"), 10, 2), bits, "0")
        return df.select(
            "*",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda i: F.struct(
                        i.alias("band"),
                        bs.substr(i * width + 1, F.lit(width)).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select(*df.columns, "bb.band", "bb.bucket")

    new_fps = (
        _rebalance(new)
        .select(F.col(id_col), fp_long.alias("__fp"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    nb = banded_fp(new_fps)
    sb = banded_fp(seen_fps).select(
        "band", "bucket", F.col("__fp").alias("__sfp")
    )
    # bucket cap on the SEEN side (the degenerate all-ones empty-doc
    # bucket at web scale), mirroring simhash_candidates' guardrail
    scount = sb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    sb = sb.join(
        scount.where(F.col("__n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
        "left_semi",
    )
    # materialization barrier (guide §1.3): ``fresh`` is consumed
    # multiple times in the within-batch pass (candidates + final
    # anti-join), so without it the band join + popcount verify
    # re-executes per consumer; the checkpoint is ids-only.
    hits = (
        nb.join(sb, ["band", "bucket"])
        .where(
            F.bit_count(F.col("__fp").bitwiseXOR(F.col("__sfp"))) <= max_hamming
        )
        .select(F.col(id_col))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    fresh = new.join(hits, id_col, "left_anti")
    # within-batch pass over the ALREADY-COMPUTED fingerprints: derive
    # the binary-string form from the long exactly as ``banded_fp``
    # does, then reuse simhash_candidates' band/bucket/verify tail and
    # the shared survivor policies — identical pairs and losers to
    # ``simhash_dedup(fresh, ...)``, without a third fingerprint pass
    # over the text (r13).
    fresh_fps = new_fps.join(hits, id_col, "left_anti").select(
        F.col(id_col),
        "__fp",
        F.lpad(F.conv(F.col("__fp").cast("string"), 10, 2), bits, "0").alias(
            "__bs"
        ),
    )
    cands = _simhash_pairs_from_fps(
        fresh_fps, bits, bands, max_hamming, max_bucket, id_col
    )
    losers = _dedup_losers(
        fresh, cands, id_col, transitive, 20, keep_col, keep_order
    )
    return fresh.join(losers, on=id_col, how="left_anti")


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, fp) LONG fingerprints — the persistable 8-byte-per-doc state
    for :func:`incremental_simhash_dedup` (``seen_fp_col="fp"``)."""
    if bits > 62:
        raise ValueError("bits must be <= 62 (fingerprint carried as a signed long)")
    return _rebalance(df).select(
        F.col(id_col),
        F.conv(_simhash_bits(text_col, bits, hash_family), 2, 10)
        .cast("long")
        .alias("fp"),
    )


def jaccard_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
    min_jaccard: float = 0.0,
    max_candidates: int | None = 100,
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-document top-k most similar documents by EXACT n-gram
    Jaccard, candidates from banded MinHash-LSH — the text-side analog
    of ``similarity.cosine_topk`` ("find the documents most like this
    one") at corpus scale: scoring touches only banded candidate pairs,
    never all pairs, and the shingle re-rank is semi-join-first
    (O(candidates), not O(corpus)). Like every banded method, recall is
    bounded by the (num_hashes, bands) curve — measure it with
    ``lsh_recall`` on your corpus before trusting a config.

    ``max_candidates`` bounds each document's candidate list BEFORE the
    exact re-rank (deterministic md5 order over the pair key): a corpus
    with B-way near-duplicate cliques otherwise generates O(B²) pairs
    per clique regardless of ``max_bucket``. Measured on the adversarial
    worst case (1M docs, EVERY doc in a 200-way clique, 8g heap): the
    uncapped string-shingle verify spilled >50 GB and died; the default
    cap of 100 still OOMs there (≥50M pairs each shuffling two ~600-long
    hash arrays); ``max_candidates=20`` (4×k) completes in 850 s — on
    heavy-dup corpora set the cap to 2-4×k. The documented bias: in a
    clique larger than the cap, the k best neighbors are sampled from a
    deterministic subset — in a clique everything is near-equally
    similar, so top-k damage is small; pass ``None`` to disable.
    ``hash_shingles`` (default) carries xxhash64 longs instead of gram
    strings through the verify join — identical scores absent 2^64
    collisions, ~5-10x smaller pair shuffle.

    Each undirected candidate pair contributes in both directions, so a
    document's neighbor list is complete w.r.t. the candidate set.
    Scores are rounded to 6 dp BEFORE ranking (ties then break by
    neighbor id) so the ranking is reproducible across engines.

    Returns (id, neighbor_id, jaccard, rank), rank 1 = most similar.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if max_candidates is not None and max_candidates < k:
        raise ValueError("max_candidates must be >= k")
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n, max_bucket, hash_family
    )
    directed = None
    if max_candidates is not None:
        from clarite_python_spark.functions.hashing import md5_60bit

        # each undirected pair becomes both directed edges in ONE pass
        # (an explode, not a self-union — a union re-evaluates the whole
        # LSH DAG per branch)
        directed = cands.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias(id_col), F.col("id_b").alias("neighbor_id")
                    ),
                    F.struct(
                        F.col("id_b").alias(id_col), F.col("id_a").alias("neighbor_id")
                    ),
                )
            ).alias("e")
        ).select("e.*")
        ckey = md5_60bit(
            F.concat_ws(
                ":",
                F.col(id_col).cast("string"),
                F.col("neighbor_id").cast("string"),
                F.lit("jt"),
            )
        )
        wc = Window.partitionBy(id_col).orderBy(ckey.asc(), F.col("neighbor_id").asc())
        # the capped edge list is reused three times downstream (pair
        # derivation, the verify's id semi-join, the final edge filter);
        # a LAZY localCheckpoint materializes it at first evaluation so
        # the 1M-doc signature/banding pass runs ONCE, not 6-10 times
        directed = (
            directed.withColumn("__cr", F.row_number().over(wc))
            .where(F.col("__cr") <= max_candidates)
            .drop("__cr")
            .localCheckpoint(eager=False)
        )
        cands = directed.select(
            F.least(id_col, "neighbor_id").alias("id_a"),
            F.greatest(id_col, "neighbor_id").alias("id_b"),
        ).distinct()
    scored = ngram_jaccard_pairs(
        df, cands, text_col, id_col, shingle_n,
        threshold=min_jaccard, hash_shingles=hash_shingles,
    ).withColumn("jaccard", F.round("jaccard", 6))
    sym = scored.select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("neighbor_id"), "jaccard"
    ).unionByName(
        scored.select(
            F.col("id_b").alias(id_col), F.col("id_a").alias("neighbor_id"), "jaccard"
        )
    )
    if directed is not None:
        # keep only each doc's capped candidate edges (a pair scored for
        # doc A may have been capped out of doc B's list)
        sym = sym.join(directed, [id_col, "neighbor_id"], "left_semi")
    w = Window.partitionBy(id_col).orderBy(F.desc("jaccard"), F.asc("neighbor_id"))
    return sym.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def dedup(
    df: DataFrame,
    method: str = "exact",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str | None = None,
    keep_order: str = "max",
    transitive: bool = False,
    seen: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """One front door for the whole dedup family — dispatches on
    ``method`` and (when ``seen`` is given) to the incremental twin,
    with ONE survivor-policy vocabulary across all of them.

    ==========  =========================================  ==================
    method      guarantee                                  dominant cost
    ==========  =========================================  ==================
    exact       byte-identical normalized text collapses   1 shuffle of md5
                (md5 fingerprint)                          keys + row payload
    minhash     shingle-Jaccard >= threshold pairs found   signature agg +
                w.p. 1-(1-t^r)^b (banded LSH), verified    banded equi-join +
                by EXACT Jaccard before any drop           shingle verify
    simhash     ALL pairs within max_hamming found         banded equi-join
                (pigeonhole-exact when bands>max_hamming)  on 8-byte fps
    ==========  =========================================  ==================

    Survivor policy (uniform; same words mean the same thing in every
    method): default keeps the MIN-ID member of each duplicate group;
    ``transitive=True`` clusters via connected components first
    (near-dup methods only — exact groups are already transitive);
    ``keep=<col>`` keeps the ``keep_order`` extreme of that column per
    group instead (RefinedWeb keep-the-longest; ties break to min id).

    ``seen`` switches to the incremental form (drop new docs matching
    the history, then dedup within the batch — history always wins, so
    the keep policy applies within the batch only): ``exact`` ->
    :func:`incremental_dedup` (pass ``seen_fp_col`` for a persisted
    fingerprint table), ``minhash`` -> :func:`incremental_neardup`
    (pass ``seen_bands`` for a persisted band table), ``simhash`` ->
    :func:`incremental_simhash_dedup` (pass ``seen_fp_col`` for a
    persisted LONG fingerprint table).

    Extra ``**kwargs`` forward to the dispatched function unchanged
    (num_hashes/bands/threshold/bits/max_hamming/max_bucket/...).
    Returns the kept subset of ``df`` with its original columns.
    """
    methods = ("exact", "minhash", "simhash")
    if method not in methods:
        raise ValueError(f"method must be one of {methods}, got {method!r}")
    if keep_order not in ("max", "min"):
        raise ValueError(f"keep_order must be 'max' or 'min', got {keep_order!r}")
    if keep is not None and keep not in df.columns:
        raise ValueError(f"keep column {keep!r} not in df")

    if method == "exact":
        if transitive:
            raise ValueError(
                "transitive does not apply to exact dedup (identical-text "
                "groups are already equivalence classes)"
            )
        if seen is not None:
            if keep is None:
                return incremental_dedup(
                    df, seen, text_col=text_col, id_col=id_col, **kwargs
                )
            # cross-set anti join (history wins), then within-batch
            # keep-best — same fingerprint key as incremental_dedup
            seen_fp_col = kwargs.pop("seen_fp_col", None)
            if kwargs:
                raise TypeError(f"unexpected kwargs for exact: {sorted(kwargs)}")
            if seen_fp_col is None:
                seen_fps = seen.select(F.md5(_norm(text_col)).alias("__fp")).distinct()
            else:
                seen_fps = seen.select(F.col(seen_fp_col).alias("__fp")).distinct()
            df = df.join(
                df.withColumn("__fp", F.md5(_norm(text_col)))
                .join(seen_fps, "__fp", "left_semi")
                .select(id_col),
                id_col,
                "left_anti",
            )
            seen = None  # fall through to the batch keep-best path
        if keep is None:
            return exact_dedup(df, text_col, id_col, **kwargs)
        if kwargs:
            raise TypeError(f"unexpected kwargs for exact: {sorted(kwargs)}")
        # keep-best per fingerprint group: one window over fp partitions
        # (same shuffle the min_by form pays; groups are duplicate sets,
        # so partitions stay tiny at any corpus size)
        order = F.desc(keep) if keep_order == "max" else F.asc(keep)
        w = Window.partitionBy("__fp").orderBy(order, F.asc(id_col))
        return (
            df.withColumn("__fp", F.md5(_norm(text_col)))
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select(*df.columns)
        )

    if method == "minhash":
        if seen is not None:
            return incremental_neardup(
                df, seen, text_col=text_col, id_col=id_col,
                transitive=transitive, keep_col=keep, keep_order=keep_order,
                **kwargs,
            )
        return minhash_dedup(
            df, text_col=text_col, id_col=id_col,
            transitive=transitive, keep_col=keep, keep_order=keep_order,
            **kwargs,
        )

    if seen is not None:
        return incremental_simhash_dedup(
            df, seen, text_col=text_col, id_col=id_col,
            transitive=transitive, keep_col=keep, keep_order=keep_order,
            **kwargs,
        )
    return simhash_dedup(
        df, text_col=text_col, id_col=id_col,
        transitive=transitive, keep_col=keep, keep_order=keep_order,
        **kwargs,
    )
