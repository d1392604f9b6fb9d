"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure JVM-side column expressions (``pyspark.sql.
functions`` — array/lambda/regex), so it stays inside whole-stage codegen
and scales linearly with no Python in the hot path. These are extensions
beyond the reference surface (SURVEY.md §7 Phase E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_postings",
    "rrf_fuse",
    "tokens",
    "bm25_topk",
    "token_count",
    "text_stats",
    "language_id",
    "fingerprint",
    "quality_score",
    "redact",
    "PII_PATTERNS",
    "top_tokens",
    "winnow_fingerprints",
    "winnow_matches",
    "gopher_rules",
    "GOPHER_STOPWORDS",
    "repetition_stats",
    "unigram_logprob",
    "corpus_stats",
    "tfidf_top_terms",
    "pmi_collocations",
    "corpus_divergence",
    "normalize_text",
    "ngram_novelty",
    "dataset_card",
    "bigram_logprob",
    "quality_classifier",
    "feature_hash_embed",
    "QUALITY_CLASSIFIER_WEIGHTS",
    "train_bpe",
    "bpe_encode",
    "pack_token_sequences",
]

# Tiny per-language function-word lists for the n-gram/stopword language
# heuristic. Deliberately small: the point is the *plumbing* (scoring per
# language as vectorized expressions); swap in real models offline.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization as an array column (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pretokenizer, simplified to the Java-regex ∩ RE2 subset
# (the original's \s+(?!\S) lookahead is dropped; contractions, letter
# runs, digit runs, punctuation runs, residual whitespace remain). The
# count this yields tracks real BPE token counts far better than
# whitespace words on code/punctuation-heavy text.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(col: str | Column) -> Column:
    """Pretokenizer-based token count (``regexp_count`` — one codegen
    expression, no split/array materialization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    """Non-distinct count of tokens in ``words`` (order-stable, matches a
    plain SQL ``sum(case when token in (...))``)."""
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, x: acc + F.when(x.isin(*words), F.lit(1)).otherwise(F.lit(0)),
    )


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document quality statistics: chars, tokens, mean token length,
    punctuation ratio, digit ratio, stopword ratio, uppercase ratio."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
            / F.greatest(n_tokens, F.lit(1))
        ).alias("mean_token_len"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", ""))
            / F.greatest(n_chars, F.lit(1))
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
            / F.greatest(n_chars, F.lit(1))
        ).alias("digit_ratio"),
        (
            _stopword_hits(toks, _LANG_STOPWORDS["en"]) / F.greatest(n_tokens, F.lit(1))
        ).alias("stopword_ratio"),
        *[F.col(c) for c in (keep_cols or [])],
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Composite heuristic quality score in [0, 1]: favors mid-length
    documents with low punctuation/digit density — the standard cheap
    pre-filter before expensive pipeline stages."""
    stats = text_stats(df, text_col, id_col, keep_cols=keep_cols)
    length_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 5.0)
    digit_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("digit_ratio") * 5.0)
    return stats.select(
        id_col,
        ((length_score + punct_penalty + digit_penalty) / 3.0).alias("quality"),
        *[F.col(c) for c in (keep_cols or [])],
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Heuristic language ID: CJK script detection + per-language
    function-word scoring; ties broken by fixed language order. Returns
    (id, lang_pred, lang_score).

    The per-language scores are STAGED as columns before the
    best-of-K when-chain (r13): each chain level references the running
    best twice (condition + otherwise), so chaining directly over the
    score expressions re-evaluates every stopword fold ~2^K times per
    row — interpreted higher-order functions get no common-subexpression
    elimination (measured sf0.1: 4.2 -> 0.7 s; identical rows —
    CollapseProject keeps the staging projection apart because the
    staged refs are non-cheap and multi-used)."""
    toks = tokens(text_col)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    # guard the staging prefix: an input frame already carrying a
    # __lang_<lang> column would make the staged refs below ambiguous
    # (AnalysisException). Dropping is output-neutral — the result only
    # projects id/keep_cols — unless the caller asked for such a column
    # back, which cannot be served unambiguously.
    clash = [c for c in df.columns if c.startswith("__lang_")]
    if any(c in {id_col, text_col, *(keep_cols or [])} for c in clash):
        raise ValueError(
            f"language_id reserves the __lang_* prefix for staged "
            f"scores; rename input column(s) {sorted(clash)}"
        )
    if clash:
        df = df.drop(*clash)
    staged = df.select(
        "*",
        *[
            (_stopword_hits(toks, words) / n_tokens).alias(f"__lang_{lang}")
            for lang, words in _LANG_STOPWORDS.items()
        ],
    )
    is_cjk = F.col(text_col).rlike("[一-鿿]")
    best_lang = F.lit("unknown")
    best_score = F.lit(0.0)
    for lang in sorted(_LANG_STOPWORDS):  # fixed order => deterministic ties
        score = F.col(f"__lang_{lang}")
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return staged.select(
        F.col(id_col),
        F.when(is_cjk, F.lit("zh")).otherwise(best_lang).alias("lang_pred"),
        F.when(is_cjk, F.lit(1.0)).otherwise(best_score).alias("lang_score"),
        *[F.col(c) for c in (keep_cols or [])],
    )


def top_tokens(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    by: str | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary extraction: the ``k`` most frequent tokens (optionally
    per ``by`` group), ties broken lexicographically.

    Plan: explode -> groupBy(token) with map-side partial aggregation (the
    heavy-hitter skew on common tokens is absorbed by the partial
    combine — each task pre-sums its own 'the's before the shuffle), then
    a top-k window over the already-aggregated vocabulary, which is
    |vocab| rows, not |corpus|. Returns (by?, token, n, rank).
    """
    from pyspark.sql import Window

    toks = tokens(text_col)
    tok = F.explode(toks).alias("token")
    keys = [by] if by else []
    ex = df.select(*keys, tok)
    if lowercase:
        ex = ex.withColumn("token", F.lower(F.col("token")))
    grp = ex.groupBy(*keys, "token").agg(F.count(F.lit(1)).alias("n"))
    order = [F.desc("n"), F.asc("token")]
    if keys:
        w = Window.partitionBy(*keys).orderBy(*order)
        return grp.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    # global top-k: orderBy+limit compiles to TakeOrderedAndProject (a
    # per-partition heap + driver merge of k rows), NOT a one-partition
    # sort of the whole vocabulary; the rank window then runs on k rows.
    top = grp.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


# Redaction patterns deliberately restricted to the regex subset shared
# by Java regex (Spark), RE2 (DuckDB/Go) and PCRE: character classes,
# bounded repetition, \b — no lookaround, no backrefs. That keeps one
# pattern table valid across every engine a pipeline might mix.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() .-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    token: str = "[{name}]",
) -> DataFrame:
    """PII scrubbing: replace every match of each named pattern with a
    placeholder token and count the redactions per document.

    One projection — each pattern contributes one ``regexp_count`` on the
    ORIGINAL text (so counts are independent of pattern order) and one
    ``regexp_replace`` applied in name order. Pure codegen expressions;
    linear scan, no shuffle, trivially parallel at any scale.

    Returns (id, text_redacted, n_<name>... , n_redacted).
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    red = F.col(text_col)
    counts = []
    for name in sorted(pats):
        pat = pats[name]
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, token.format(name=name))
    total = None
    for c in sorted(pats):
        n = F.col(f"n_{c}")
        total = n if total is None else total + n
    return df.select(F.col(id_col), red.alias("text_redacted"), *counts).withColumn(
        "n_redacted", total if total is not None else F.lit(0)
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint over whitespace/case-normalized
    text (md5 — engine-portable), the key for exact dedup."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    ``window`` over the hash sequence, keep each window's minimum; the
    distinct kept hashes are the document's fingerprint set.

    Guarantees: any shared run of ``window + k - 1`` tokens between two
    documents shares at least one fingerprint, so matching on the
    exploded (fingerprint -> doc) table finds local overlaps that
    whole-document hashes miss — with density ~2/(window+1) selected
    grams instead of all of them. Complements MinHash (set-resemblance)
    with position-aware substring matching.

    All JVM array lambdas on one row — O(grams × window) comparisons,
    no shuffle; the output explodes to ~2·grams/(window+1) rows per doc.
    Returns (id, fingerprint) — groupBy fingerprint to find cross-doc
    matches, exactly like ``exact_dedup`` but at substring granularity.

    ``hash_family``: ``"xxhash64"`` (default — JVM-native, ~10x faster)
    or ``"md5"`` (the portable 60-bit family, reproducible in DuckDB for
    the oracle — same convention as MinHash/SimHash).
    """
    if k <= 0 or window <= 0:
        raise ValueError("k and window must be positive")
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    from clarite_python_spark.functions.hashing import md5_60bit

    gram_hash = F.xxhash64 if hash_family == "xxhash64" else md5_60bit

    # Each stage MATERIALIZES as a projected column before the next
    # references it: an inlined expression inside a higher-order lambda
    # is re-evaluated per element (the gram array would be rebuilt — all
    # its md5s — once per window position, turning O(n·w) into O(n²)
    # hashes; measured as a hang at 5k docs).
    toks = F.transform(tokens(text_col), lambda x: F.lower(x))
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.coalesce(F.size("__toks"), F.lit(0))
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: gram_hash(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, k))),
        ),
    )
    staged = staged.select(F.col(id_col), grams.alias("__grams"))
    g = F.size("__grams")  # number of k-gram hashes (null if n < k)
    mins = F.when(
        g >= window,
        F.transform(
            F.sequence(F.lit(0), g - window),
            lambda i: F.array_min(F.slice(F.col("__grams"), i + 1, window)),
        ),
    ).otherwise(F.when(g >= 1, F.array(F.array_min("__grams"))))
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


def winnow_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Cross-document overlap detection on winnowing fingerprints:
    (id_a, id_b, n_shared) for every pair sharing ≥ ``min_shared``
    fingerprints (id_a < id_b).

    The pair generation is an equi-SELF-join on the fingerprint — the
    same bucketed shape as MinHash banding, with the same safety valve:
    a fingerprint held by B docs contributes B·(B-1)/2 pairs, so
    ``max_bucket`` drops degenerate buckets (boilerplate shared by
    thousands of docs carries no discriminative signal anyway). Work is
    Σ_buckets B², never |corpus|².
    """
    from pyspark import StorageLevel

    # materialization barrier (guide §1.3): the fingerprint pipeline
    # (per-gram md5/xxhash + windowed mins) feeds the bucket-size agg,
    # the anti-join AND both self-join sides — four evaluations without
    # it (measured sf0.1: winnow_matches 5.7 s -> 1.9 s)
    fps = winnow_fingerprints(
        df, text_col, id_col, k, window, hash_family
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    sizes = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("__b"))
    ok = fps.join(F.broadcast(sizes.where(F.col("__b") > max_bucket)), "fingerprint", "left_anti")
    a = ok.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = ok.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", App. A / the repetition+quality filters reused by
# MassiveText, RefinedWeb and Dolma). Each rule is a pure column
# expression; the thresholds are the published defaults.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher-style document quality rules as one codegen projection.
    ``keep_cols`` carries extra input columns through the projection so
    downstream row-local stages chain into the SAME scan (no re-read,
    no join) — see pipeline.clean_corpus.

    Emits the measured statistics plus one boolean per rule and an
    overall ``gopher_pass``; keeping the per-rule flags (instead of just
    filtering) is deliberate — at pipeline scale you want the rejection
    *reason* distribution before committing to a filter. No shuffle, no
    Python; linear scan at any scale.

    Rules (published Gopher defaults): word count in [50, 100k]; mean
    word length in [3, 10]; '#'/'...' symbol-to-word ratio < 0.1; <90%
    of lines bullet-started; <30% of lines ellipsis-ended; >=80% of
    words contain an alphabetic char; >=2 of the 8 required stopwords
    present.
    """
    toks = tokens(text_col)
    c = F.col(text_col)
    n_words = F.size(toks)
    n_words_f = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)) / n_words_f
    # literal counting via replace-length deltas — identical left-to-right
    # non-overlap semantics in every engine, no regex dialect risk
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = (n_hash + n_ellipsis) / n_words_f
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    n_lines_f = F.greatest(F.size(lines), F.lit(1)).cast("double")
    is_bullet = lambda x: (  # noqa: E731
        F.startswith(F.trim(x), F.lit("-"))
        | F.startswith(F.trim(x), F.lit("*"))
        | F.startswith(F.trim(x), F.lit("•"))
    )
    bullet_frac = (
        F.aggregate(lines, F.lit(0), lambda a, x: a + F.when(is_bullet(x), 1).otherwise(0))
        / n_lines_f
    )
    ends_ellipsis = lambda x: F.endswith(F.trim(x), F.lit("...")) | F.endswith(  # noqa: E731
        F.trim(x), F.lit("…")
    )
    ellipsis_frac = (
        F.aggregate(lines, F.lit(0), lambda a, x: a + F.when(ends_ellipsis(x), 1).otherwise(0))
        / n_lines_f
    )
    alpha_frac = (
        F.aggregate(
            toks, F.lit(0), lambda a, x: a + F.when(x.rlike("[A-Za-z]"), 1).otherwise(0)
        )
        / n_words_f
    )
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = F.when(F.array_contains(toks, w), 1).otherwise(0)
        n_stop = hit if n_stop is None else n_stop + hit
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        *[F.col(c) for c in (keep_cols or [])],
    )
    rules = {
        "pass_word_count": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "pass_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "pass_symbols": F.col("symbol_ratio") < max_symbol_ratio,
        "pass_bullets": F.col("bullet_frac") < max_bullet_frac,
        "pass_ellipsis": F.col("ellipsis_frac") < max_ellipsis_frac,
        "pass_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "pass_stopwords": F.col("n_stopwords") >= min_stopwords,
    }
    overall = None
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        overall = expr if overall is None else overall & expr
    return out.withColumn("gopher_pass", overall)


def _rebalance(df: DataFrame) -> DataFrame:
    """Spread compute-heavy per-row lambda work across cores when the scan
    came in too few splits (a local/small-file artifact). At scale the
    input arrives in many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_sizes: tuple[int, ...] = (2, 3),
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher-style intra-document repetition statistics: the repetition
    filters from Rae et al. 2021 App. A applied per document —
    ``dup_word_frac`` (1 - distinct/total words) and, per requested n,
    ``top{n}_char_frac``: the fraction of the document's characters
    covered by occurrences of its single most frequent word n-gram
    (count x n-gram length / total chars; ties broken by the
    lexicographically smallest gram).

    Plan (r13): ENTIRELY row-local — the statistic is per-document, so
    nothing needs an exchange. The most frequent n-gram is the longest
    run in the row's SORTED gram array, found by one fold (strictly-
    greater updates keep the lexicographically smallest gram on count
    ties — the same (max cnt, min gram) selection the old
    groupBy(doc, gram) + min_by plan computed). The previous plan
    exploded one row per (doc, n, gram) — ~2M rows at sf0.1 — through
    two count/max_by exchanges plus a pivot join for a per-doc scalar
    (measured: 3.6 s -> 1.6 s; identical fractions — same counts, same
    tie-break, same division and rounding).
    """
    toks = tokens(text_col)
    staged = _rebalance(df).select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__chars"),
        toks.alias("__toks"),
        *[F.col(c) for c in (keep_cols or [])],
    )

    def _top_frac(nn: int) -> Column:
        grams = F.when(
            F.size(F.col("__toks")) >= nn,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.col("__toks")) - nn),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__toks"), i + 1, nn)
                    ),
                )
            ),
        )

        def step(acc: Column, g: Column) -> Column:
            newcnt = (
                F.when(g == acc["cur"], acc["cnt"] + F.lit(1).cast("long"))
                .otherwise(F.lit(1).cast("long"))
            )
            return F.struct(
                g.alias("cur"),
                newcnt.alias("cnt"),
                F.when(newcnt > acc["bcnt"], g).otherwise(acc["best"]).alias("best"),
                F.when(newcnt > acc["bcnt"], newcnt)
                .otherwise(acc["bcnt"])
                .alias("bcnt"),
            )

        best = F.aggregate(
            grams,
            F.struct(
                F.lit("").alias("cur"),
                F.lit(0).cast("long").alias("cnt"),
                F.lit("").alias("best"),
                F.lit(0).cast("long").alias("bcnt"),
            ),
            step,
        )
        return F.round(
            best["bcnt"] * F.length(best["best"]) / F.greatest("__chars", F.lit(1)),
            6,
        )

    return staged.select(
        F.col(id_col),
        F.round(
            (F.size("__toks") - F.size(F.array_distinct("__toks")))
            / F.greatest(F.size("__toks"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_word_frac"),
        *[
            F.coalesce(_top_frac(n), F.lit(0.0)).alias(f"top{n}_char_frac")
            for n in ngram_sizes
        ],
        *[F.col(c) for c in (keep_cols or [])],
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    base: int = 131,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """Polynomial rolling-hash fingerprint over lowercased tokens:
    ``h = (h*base + hash(token)) mod M`` folded left-to-right in ONE JVM
    ``aggregate`` expression — order-sensitive (unlike the md5-of-blob
    key) and incrementally extendable: appending text only folds the new
    tokens, which is what makes rolling hashes the right primitive for
    chunked/streamed content.

    Token hashes are the portable 60-bit md5 construction (same family
    as the MinHash/sampling ops) reduced mod M; M = 2^31-1 keeps every
    intermediate under 2^39, safely inside ANSI-mode long arithmetic in
    any engine. Returns (id, rolling_fp).
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    toks = F.transform(tokens(text_col), lambda x: F.lower(x))
    member = lambda t: md5_60bit(t) % mod  # noqa: E731
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + member(x)) % mod,
    )
    return df.select(F.col(id_col), fp.alias("rolling_fp"))


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style language-model quality proxy: per-document mean
    negative log2 unigram probability (bits per token). Low values =
    stereotypical in-distribution text, high = noise/OOV — the cheap
    stand-in for the LM-perplexity filter of CCNet (Wenzek et al. 2020)
    when no LM is available.

    ``vocab`` is (token, n) counts — pass a precomputed/reference
    vocabulary, or omit to build it from the corpus itself (one extra
    token-count aggregation). Probabilities are Laplace-smoothed:
    p = (n + 1) / (total + |V| + 1); out-of-vocabulary tokens get
    1 / (total + |V| + 1).

    Plan: explode -> broadcast-join the vocabulary -> per-doc agg. The
    vocabulary rides a broadcast (token counts are tiny next to the
    corpus); the corpus-side cost is the explode plus one keyed count.
    Returns (id, n_tokens, bits_per_token).
    """
    import math

    toks = tokens(text_col)
    ex = _rebalance(df).select(
        F.col(id_col), F.explode(toks).alias("__tok")
    ).withColumn("__tok", F.lower(F.col("__tok")))
    if vocab is None:
        vocab = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("n"))
    else:
        vocab = vocab.select(F.lower(F.col("token")).alias("__tok"), F.col("n"))
    # fully lazy: the smoothing denominator (total + |V| + 1) rides as a
    # broadcast 1-row aggregate instead of an eager .first() at
    # plan-build time (same idiom as tfidf_top_terms / bigram_logprob)
    totals = vocab.agg(
        (F.sum("n") + F.count(F.lit(1)) + F.lit(1)).cast("double").alias("__denom")
    )
    log2 = math.log(2.0)
    bits = -F.log(
        (F.coalesce(F.col("n"), F.lit(0)) + 1.0) / F.col("__denom")
    ) / F.lit(log2)
    joined = (
        ex.join(F.broadcast(vocab), on="__tok", how="left")
        .crossJoin(F.broadcast(totals))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(bits), 4).alias("bits_per_token"),
        )
    )


def corpus_stats(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """Per-group corpus profile — the summary table a pipeline run
    reports before/after cleaning: document and token counts, length
    moments, and the exact-duplicate rate (1 - distinct fingerprints /
    docs, same md5-of-normalized-text key as exact_dedup so the two
    always agree on what "duplicate" means).

    One groupBy aggregation with map-side combine; ``exact=False``
    switches the fingerprint distinct count to ``approx_count_distinct``
    (HyperLogLog++, ~2% error, mergeable constant-size sketches) — the
    right setting at the 10^12-doc scale where exact per-group hash sets
    would dominate the shuffle.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    n_tok = token_count(text_col)
    distinct = (
        F.countDistinct(F.md5(norm))
        if exact
        else F.approx_count_distinct(F.md5(norm))
    )
    return (
        df.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.round(F.avg(n_tok), 4).alias("mean_tokens"),
            F.min(n_tok).alias("min_tokens"),
            F.max(n_tok).alias("max_tokens"),
            distinct.alias("distinct_docs"),
        )
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("distinct_docs") / F.col("n_docs"), 6),
        )
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    strip_html: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    max_newlines: int | None = 2,
    lowercase: bool = False,
) -> DataFrame:
    """Ingest-time text normalization — the C4/CCNet-style cleaning
    applied BEFORE fingerprinting and dedup so that markup and spacing
    differences don't defeat exact dedup: strip HTML/XML tags, remove
    control characters, collapse horizontal whitespace runs (newlines
    preserved as document structure), cap consecutive newlines at
    ``max_newlines`` (boilerplate padding), optional lowercasing.

    Pure codegen ``regexp_replace`` chain in one projection — linear
    scan, no shuffle, no UDF; the text column is replaced in place and
    every other column passes through unchanged. Unicode normalization
    (NFC/NFKC) is deliberately absent: Spark has no built-in and a
    per-row Python UDF would dominate the scan cost — run ICU
    normalization in the reader if the source needs it.

    Order matters and is fixed: tags out first (so a tag's text never
    survives as content), then control chars, then whitespace — the
    trailing trim means output never has leading/trailing space.
    """
    out = F.col(text_col)
    if strip_html:
        # bounded tag body so a stray '<' can't swallow the document
        out = F.regexp_replace(out, r"<[^>\n]{0,500}>", " ")
    if strip_control:
        out = F.regexp_replace(out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if collapse_whitespace:
        out = F.regexp_replace(out, r"[^\S\n]+", " ")
        out = F.regexp_replace(out, r" ?\n ?", "\n")
    if max_newlines is not None:
        out = F.regexp_replace(
            out, r"\n{" + str(max_newlines + 1) + r",}", "\n" * max_newlines
        )
    if lowercase:
        out = F.lower(out)
    out = F.trim(out)
    return df.withColumn(text_col, out)


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of the document's
    distinct word n-grams that appear in NO other document — the
    uniqueness complement to ``repetition_stats`` (which looks inside a
    document) and ``contamination`` (which looks at a benchmark).
    Boilerplate, templated, and syndicated text scores near 0; original
    prose scores near 1 — a cheap corpus-level quality/diversity signal
    for mixture weighting or dedup triage.

    Plan (round 8 — one shingle pass, joinless novelty attribution):
    the exploded (id, gram-hash) rows are lazily localCheckpointed so
    the shingling scan — the dominant stage at 1M docs, paid TWICE in
    the round-7 plan — materializes once (measured: 67.5 -> 50.9 s on
    the 200x-replica 1M-doc corpus, identical outputs). ``n_grams`` is
    a doc-keyed count over the
    materialized gram rows (shingles are distinct per doc, and the
    rows are still doc-clustered when counted, so the partial agg
    collapses map-side to one row per doc). The gram-keyed count agg
    carries ``min(id)`` alongside the count, exploiting that a df==1
    gram has EXACTLY ONE owner — per-doc novel counts come straight
    off the filtered agg output, with no (doc,gram)-against-dfreq
    probe join at all; the df==1 subset shrinks by the corpus
    duplication factor exactly where novelty is most used. The
    2-exchange window form (count() OVER (PARTITION BY gram)) stays
    rejected: it buffers each gram's full partition, so one stopword
    gram in 10^9 docs becomes a straggler/spill cliff, while the agg
    form partial-aggregates the hot gram map-side (min(id) folds the
    same way). ``hash_grams`` (default) materializes/shuffles 8-byte
    xxhash64 longs instead of n-token strings — identical counts
    absent 2^64 collisions; the oracle counts the raw strings, so a
    collision would surface as a gate hash-mismatch.

    Returns (id, n_grams, n_novel, novelty) — n_grams counts DISTINCT
    grams per document. Every doc yields >= 1 gram (short texts fall
    back to the whole-text gram), so the doc-keyed count loses no rows.
    """
    from clarite_python_spark.operators.dedup import shingles

    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: F.col(c))
    grams = (
        df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("__raw"))
        .select(F.col(id_col), key("__raw").alias("__gram"))
        .localCheckpoint(eager=False)
    )
    per_doc = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    # each doc contributes a gram at most once (shingles are distinct),
    # so count(*) IS document frequency and min(id) is the sole owner
    # whenever that frequency is 1
    novel = (
        grams.groupBy("__gram")
        .agg(
            F.count(F.lit(1)).alias("__df"),
            F.min(id_col).alias(id_col),
        )
        .where(F.col("__df") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        per_doc.join(novel, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )


def dataset_card(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """Per-group dataset card — the one-table summary a training-data
    org attaches to every corpus release (Datasheets for Datasets;
    Dolma's per-source cards): ``corpus_stats``' counts/moments/dup-rate
    plus the dominant language with its share and the mean heuristic
    quality, per ``by`` group.

    Plan: corpus_stats' single map-side-combined agg; one per-doc
    language+quality projection (pure codegen — language_id joined to
    quality_score on the id key) aggregated to (group, lang) counts and
    per-group quality means; a top-1 window over the O(#groups×#langs)
    count table; then joins of three O(#groups) tables (broadcast-sized
    at any corpus scale). ``exact=False`` flips the dup-rate distinct to
    the HyperLogLog++ sketch like corpus_stats.
    """
    stats = corpus_stats(df, by, text_col, exact)
    # quality chained onto the language projection via keep_cols (r13):
    # the id-keyed self-join of two row-local projections over the same
    # corpus cost a second scan + an exchange for identical rows
    perdoc = quality_score(
        language_id(df, text_col, id_col, keep_cols=[by, text_col]),
        text_col,
        id_col,
        keep_cols=[by, "lang_pred"],
    )
    lang_counts = perdoc.groupBy(by, "lang_pred").agg(
        F.count(F.lit(1)).alias("__n_lang")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.desc("__n_lang"), F.asc("lang_pred"))
    top_lang = (
        lang_counts.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(by, F.col("lang_pred").alias("top_lang"), "__n_lang")
    )
    qual = perdoc.groupBy(by).agg(F.round(F.avg("quality"), 6).alias("mean_quality"))
    return (
        stats.join(top_lang, by)
        .join(qual, by)
        .withColumn(
            "top_lang_share", F.round(F.col("__n_lang") / F.col("n_docs"), 6)
        )
        .drop("__n_lang")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
) -> DataFrame:
    """Per-document top-k characteristic terms by smoothed tf-idf — the
    classic keyword/topic fingerprint a corpus pipeline attaches before
    clustering or mixture balancing.

    tf = within-document term count; idf = ln((N + 1) / (df_t + 1)) + 1
    (sklearn's smoothed variant, so unseen-in-no-doc terms can't divide
    by zero and every idf > 0). Ties break lexicographically for a fully
    deterministic top-k.

    Plan: explode tokens -> one (doc, term) count agg -> one (term)
    count agg joined back on term -> per-doc row_number window. The
    document-frequency table is aggregated map-side to O(|vocab|) and
    joins on the term key (a shuffle join: at 100 TB the vocabulary is
    far past broadcast size, and both sides are already keyed by term
    after their aggs, so AQE plans it without an extra exchange); the
    final window partitions by doc_id — the same key the tf agg already
    hashed on. Fully lazy: N (the distinct doc count) rides as a 1-row
    aggregate crossJoin-broadcast into the idf expression — constructing
    the plan triggers NO job (the previous eager ``distinct().count()``
    forced a full id-column scan at plan-BUILD time, once per composed
    pipeline).
    """
    toks = tokens(text_col)
    ex = (
        _rebalance(df)
        .select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(id_col, F.lower(F.col("__tok")).alias("term"))
        .where(F.length("term") >= min_token_len)
    )
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency from the tf table (already one row per
    # (doc, term)), NOT a second distinct over the explode — saves a
    # full rescan + reshuffle of the token stream
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("__n_docs")
    )
    idf = F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Bigram language-model quality proxy: per-document mean negative
    log2 P(w_i | w_{i-1}) under an add-alpha-smoothed bigram model built
    from the corpus itself — one order up from ``unigram_logprob``, the
    cheap stand-in for the KenLM-perplexity filter of CCNet when no
    pretrained LM is shippable.

    P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * (V + 1)) with V
    the unigram vocabulary size (+1 for the unseen event). Documents
    with < 2 tokens have no bigrams and are absent from the output.

    Plan: adjacent-pair extraction is row-local array arithmetic
    (``slice``+``zip_with`` — no posexplode self-join); then one
    (w1,w2) count agg, one (w1) count agg, and the corpus joined back
    on the bigram key. Left joins keep unseen pairs at the smoothing
    floor. All aggregations map-side combine; the heavy side shuffles
    once on the bigram key.
    """
    import math

    toks = F.filter(
        F.transform(tokens(text_col), lambda x: F.lower(x)), lambda x: x != ""
    )
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = _rebalance(df).select(F.col(id_col), pairs.alias("__pairs"))
    ex = base.select(id_col, F.explode("__pairs").alias("bigram")).select(
        id_col,
        "bigram",
        F.split(F.col("bigram"), " ", 2).getItem(0).alias("__w1"),
    )
    bi = ex.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    # context counts and vocabulary derive from the (already aggregated,
    # far smaller) bigram table, not a second pass over the explode:
    # c(w1) = sum of c(w1,*); V = distinct tokens in either position
    bi_w = bi.select(
        "bigram",
        "c2",
        F.split(F.col("bigram"), " ", 2).getItem(0).alias("__w1"),
        F.split(F.col("bigram"), " ", 2).getItem(1).alias("__w2"),
    )
    uni = bi_w.groupBy("__w1").agg(F.sum("c2").alias("c1"))
    # fully lazy: V rides as a broadcast 1-row count aggregate (the same
    # idiom as tfidf_top_terms' N) — the previous eager
    # distinct().count() forced a vocabulary job at plan-BUILD time
    vocab = (
        bi_w.select(F.col("__w1").alias("w"))
        .union(bi_w.select(F.col("__w2").alias("w")))
        .agg(F.count_distinct("w").cast("double").alias("__v"))
    )
    log2 = math.log(2.0)
    joined = (
        ex.join(bi, "bigram", "left")
        .join(uni, "__w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha)))
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + F.lit(float(alpha)) * (F.col("__v") + 1.0)
                    )
                )
                / F.lit(log2)
            ).alias("__bits"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__bits"), 4).alias("bits_per_bigram"),
    )


def corpus_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Unigram-distribution divergence between two corpora — the drift
    monitor for a training mixture: how far has this week's crawl
    drifted from last week's, or a source from the blended corpus?
    Reports add-``alpha``-smoothed KL(A‖B), KL(B‖A) and the symmetric,
    bounded Jensen–Shannon divergence (log2: JS ∈ [0, 1] bit).

    P_a(w) = (c_a(w) + alpha) / (N_a + alpha·V) over the UNION
    vocabulary V (so both distributions share support and every KL term
    is finite); JS = ½KL(P_a‖M) + ½KL(P_b‖M) with M the even mixture.

    Plan: one lowercased token-count agg per corpus (map-side combined
    — the corpus-dominating stopwords collapse per partition), a
    full-outer join on the token key (both sides already keyed by
    token), totals as one broadcast row, and a single sum over the
    |V|-row joined vocabulary. Nothing after the two aggs scales with
    corpus size. Returns one row: (v, n_a, n_b, kl_ab, kl_ba, js).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive (both supports must be smoothed)")

    def counts(d: DataFrame) -> DataFrame:
        toks = F.filter(
            F.transform(tokens(text_col), lambda x: F.lower(x)), lambda x: x != ""
        )
        return (
            _rebalance(d)
            .select(F.explode(toks).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ca = counts(df_a).select("w", F.col("c").alias("ca"))
    cb = counts(df_b).select("w", F.col("c").alias("cb"))
    j = ca.join(cb, "w", "full_outer").select(
        "w",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    totals = j.agg(
        F.count(F.lit(1)).cast("double").alias("__v"),
        F.sum("ca").cast("double").alias("__na"),
        F.sum("cb").cast("double").alias("__nb"),
    )
    a = F.lit(float(alpha))
    pa = (F.col("ca") + a) / (F.col("__na") + a * F.col("__v"))
    pb = (F.col("cb") + a) / (F.col("__nb") + a * F.col("__v"))
    m = (pa + pb) / F.lit(2.0)
    import math

    ln2 = F.lit(math.log(2.0))
    terms = j.crossJoin(F.broadcast(totals)).select(
        "__v",
        "__na",
        "__nb",
        (pa * F.log(pa / pb) / ln2).alias("__t_ab"),
        (pb * F.log(pb / pa) / ln2).alias("__t_ba"),
        ((pa * F.log(pa / m) + pb * F.log(pb / m)) / F.lit(2.0) / ln2).alias("__t_js"),
    )
    return terms.groupBy("__v", "__na", "__nb").agg(
        F.round(F.sum("__t_ab"), 6).alias("kl_ab"),
        F.round(F.sum("__t_ba"), 6).alias("kl_ba"),
        F.round(F.sum("__t_js"), 6).alias("js"),
    ).select(
        F.col("__v").cast("long").alias("v"),
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        "kl_ab",
        "kl_ba",
        "js",
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase detector (Church & Hanks 1990; word2vec's phrase
    pass uses the same count ratio): which adjacent word pairs co-occur
    far more than their unigram frequencies predict ("new york", not
    "of the").

    PMI(w1,w2) = log2( P(w1,w2) / (P(w1)·P(w2)) )
               = log2( (c12 · U · U) / (B · c1 · c2) )
    with c12 the bigram count over B total bigrams and c1/c2 unigram
    counts over U total tokens. ``min_count`` drops rare bigrams first —
    PMI's classic pathology is that a pair seen once between two hapaxes
    scores maximal PMI, so ranking without a count floor surfaces noise.

    Plan: adjacent pairs are row-local ``slice``+``zip_with`` (no
    posexplode self-join); ONE bigram count agg and ONE unigram count
    agg, both map-side combined (a corpus-dominating "of the" collapses
    per partition before the shuffle). The ``min_count`` filter shrinks
    the bigram table BEFORE its two term-keyed joins against the unigram
    counts (both sides already keyed by term — AQE plans them without
    extra exchanges; at 100 TB the vocab is past broadcast size).
    Totals U and B ride as one broadcast 1-row aggregate — fully lazy,
    no job at plan build. Top-k compiles to TakeOrderedAndProject.

    Returns (w1, w2, c12, c1, c2, pmi, rank), rank 1 = highest PMI,
    ties broken by (w1, w2).
    """
    if k <= 0 or min_count < 1:
        raise ValueError("k must be positive and min_count >= 1")
    toks = F.filter(
        F.transform(tokens(text_col), lambda x: F.lower(x)), lambda x: x != ""
    )
    base = _rebalance(df).select(toks.alias("__toks"))
    uni = (
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = F.zip_with(
        F.slice(F.col("__toks"), 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
        F.slice(F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = (
        base.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
        .select(
            F.split(F.col("bigram"), " ", 2).getItem(0).alias("w1"),
            F.split(F.col("bigram"), " ", 2).getItem(1).alias("w2"),
            "c12",
        )
    )
    # totals from the (tiny) aggregated tables, as one broadcast row
    totals = uni.agg(F.sum("c").cast("double").alias("__u")).crossJoin(
        base.select(
            F.greatest(F.size("__toks") - 1, F.lit(0)).alias("__nb")
        ).agg(F.sum("__nb").cast("double").alias("__b"))
    )
    import math

    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    (F.col("c12") * F.col("__u") * F.col("__u"))
                    / (F.col("__b") * F.col("c1") * F.col("c2"))
                )
                / F.lit(math.log(2.0)),
                6,
            ).alias("pmi"),
        )
    )
    order = [F.desc("pmi"), F.asc("w1"), F.asc("w2")]
    top = scored.orderBy(*order).limit(k)
    from pyspark.sql import Window

    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


#: fasttext-style linear quality probe: fixed, documented weights over
#: the text_stats feature vector. The values are illustrative defaults
#: (favor mid-length, stopword-bearing, low-punct/digit prose); swap in
#: offline-trained weights per corpus. Keeping them as DATA (not code)
#: is the point — the operator is the plumbing that scores any linear
#: model over engineered features as pure codegen expressions.
QUALITY_CLASSIFIER_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "log_tokens": 0.55,
    "mean_token_len": 0.18,
    "stopword_ratio": 4.0,
    "punct_ratio": -6.0,
    "digit_ratio": -4.0,
}


def quality_classifier(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear quality classifier over the ``text_stats`` features — the
    shape of a fasttext/logistic quality filter (e.g. the Wikipedia-vs-
    CommonCrawl probes used by GPT-3/LLaMA data pipelines), evaluated as
    vectorized column expressions: score = sigmoid(b + w.x), keep =
    score >= threshold.

    One projection over the text_stats plan (itself one projection) —
    no shuffle, no UDF, fully codegen; at 100 TB this runs at scan
    speed, which is exactly why production pipelines distill their
    quality models to linear probes for the first pass.
    """
    w = dict(QUALITY_CLASSIFIER_WEIGHTS)
    if weights:
        unknown = set(weights) - set(w)
        if unknown:
            raise ValueError(f"unknown feature weights: {sorted(unknown)}")
        w.update(weights)
    stats = text_stats(df, text_col, id_col)
    z = (
        F.lit(w["bias"])
        + F.lit(w["log_tokens"]) * F.log(F.col("n_tokens") + F.lit(1.0))
        + F.lit(w["mean_token_len"]) * F.col("mean_token_len")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["digit_ratio"]) * F.col("digit_ratio")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return stats.select(
        id_col,
        F.round(score, 6).alias("quality_prob"),
        (F.round(score, 6) >= F.lit(float(threshold))).alias("keep"),
    )


def feature_hash_embed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "fh",
    normalize: bool = True,
    idf_weight: bool = False,
) -> DataFrame:
    """Feature-hashing bag-of-words embedding (the hashing trick,
    Weinberger et al. 2009): lowercased word unigrams hash into ``dim``
    buckets, each contributing a +/-1 from an independent sign hash (the
    construction that keeps inner products unbiased), optionally L2
    normalized — a model-free ``array<float>`` document vector that
    plugs straight into the similarity family (``cosine_topk``,
    ``embedding_neardup``, ``semantic_dedup``) when no trained encoder
    is available. Both hashes are the engine-portable 60-bit md5, so
    vectors are reproducible anywhere.

    ``idf_weight=True`` scales every occurrence's +/-1 by the token's
    sklearn-smoothed idf (ln((N+1)/(df+1)) + 1, N = input rows) — the
    stopword-suppression upgrade that makes hashed vectors usable for
    RETRIEVAL, not just dedup: without it "the"-heavy buckets dominate
    every cosine. Costs one distinct (id, token) df agg and one
    token-keyed join on the exploded stream.

    Plan: explode -> (id, bucket) signed-count agg (map-side combined;
    a corpus-dominating stopword collapses per partition before its
    shuffle) -> per-doc sparse map -> dense vector via one row-local
    ``transform`` over [0, dim). Two keyed shuffles, nothing
    O(dim)-per-token. Empty documents drop out (no tokens, no vector).

    Returns (id, embedding array<float>).
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    if dim <= 0:
        raise ValueError("dim must be positive")
    tok = F.explode(tokens(text_col)).alias("__tok")
    ex = _rebalance(df).select(F.col(id_col), tok).select(
        F.col(id_col), F.lower(F.col("__tok")).alias("__tok")
    )
    bucket = md5_60bit(F.concat_ws(":", F.col("__tok"), F.lit(salt))) % dim
    sign = (md5_60bit(F.concat_ws(":", F.col("__tok"), F.lit(salt + "#s"))) % 2) * 2 - 1
    contrib = sign.cast("double")
    if idf_weight:
        dfreq = (
            ex.distinct().groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        )
        n_docs = df.agg(F.count(F.lit(1)).alias("__N"))
        ex = ex.join(dfreq, "__tok").crossJoin(F.broadcast(n_docs))
        idf = (
            F.log((F.col("__N") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0)))
            + F.lit(1.0)
        )
        contrib = sign.cast("double") * idf
    sparse = (
        ex.select(F.col(id_col), bucket.alias("__b"), contrib.alias("__s"))
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
        .groupBy(id_col)
        .agg(F.map_from_arrays(
            F.collect_list("__b"), F.collect_list("__v")
        ).alias("__m"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(
            F.element_at(F.col("__m"), d.cast("long")), F.lit(0)
        ).cast("double"),
    )
    if normalize:
        nrm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda a, x: a + x * x))
        dense = F.when(
            nrm > 0, F.transform(dense, lambda x: x / nrm)
        ).otherwise(dense)
    return sparse.select(
        F.col(id_col),
        F.transform(dense, lambda x: x.cast("float")).alias("embedding"),
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    the standard hybrid-retrieval combiner: given two ranked result
    tables (e.g. :func:`bm25_topk` lexical + ``similarity.cosine_topk``
    dense; align the id columns first), each document scores
    sum over the lists it appears in of 1 / (rrf_k + rank). RRF needs no
    score calibration between the two systems — only ranks — which is
    why it is the default fusion in every hybrid-search stack.

    Plan: both inputs are already O(|queries| x k) top-k tables, so the
    fusion is a full-outer join + window over tiny data — at 100 TB the
    cost lives entirely in the two retrievers, never here. Scores round
    to 6 dp BEFORE ranking (ties by id) so the order is
    engine-replayable. Returns (query_id, id, rank, rrf); documents
    absent from both lists are absent (they have no rank to fuse).
    """
    from pyspark.sql import Window

    if k <= 0 or rrf_k <= 0:
        raise ValueError("k and rrf_k must be positive")
    fa = a.select(
        query_id_col, id_col, F.col(rank_col).alias("__ra")
    )
    fb = b.select(
        query_id_col, id_col, F.col(rank_col).alias("__rb")
    )
    fused = (
        fa.join(fb, [query_id_col, id_col], "full_outer")
        .select(
            query_id_col,
            id_col,
            F.round(
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("__ra")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("__rb")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _postings_frames(
    corpus: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three BM25 corpus artifacts from one tokenize pass:
    ``tf`` (id, __dl, __term, __tf) postings, ``dfreq`` (__term, __df)
    document frequencies, ``stats`` the 1-row (__n, __avgdl)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    base = corpus.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__dl")
    )
    tf = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__term"))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    return tf, dfreq, stats


def build_postings(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Build and persist the BM25 postings artifact — the stored-state
    form of :func:`bm25_topk`, the same pattern as the dedup family's
    ``band_table`` / ``simhash_fingerprints``: pay the corpus shuffle
    ONCE, then every later query batch runs ``bm25_topk(None, queries,
    postings_dir=path)`` at broadcast-join cost with no corpus rescan
    or re-tokenize.

    Layout under ``path``: ``postings/`` (id, __dl, __term, __tf),
    ``df/`` (__term, __df), ``stats/`` (1 row: __n, __avgdl). Postings
    are sorted by term within files so parquet row-group stats compress
    and cluster the hot join column. At 100 TB this is the artifact the
    docstring of bm25_topk prices: the 10M-doc measurement put ~99% of
    inline cost in the postings agg, so a stored-postings re-query pays
    seconds, not minutes (scripts/bench_bm25_postings.py).
    """
    from concurrent.futures import ThreadPoolExecutor

    tf, _dfreq, stats = _postings_frames(corpus, text_col, id_col)
    spark = corpus.sparkSession

    # The three artifacts previously wrote serially, and each write
    # re-ran its full lineage: the corpus was tokenized 3x and the
    # postings agg 2x (dfreq folds off tf). Two fixes, bit-identical
    # artifacts (guide §1.3 / §2.6):
    #  - df/ is derived by reading BACK the just-written postings/
    #    (its rows ARE the tf rows, so the per-term count is identical)
    #    instead of re-running tokenize + explode + agg;
    #  - stats/ cannot come from postings (a zero-token document has no
    #    postings rows but still counts in __n/__avgdl), so it keeps its
    #    own corpus pass — submitted from a driver thread so it overlaps
    #    the postings write instead of following it.
    def _write_tf_then_df() -> None:
        spark.sparkContext.setJobDescription("build_postings: postings")
        tf.sortWithinPartitions("__term").write.mode("overwrite").parquet(
            f"{path}/postings"
        )
        spark.sparkContext.setJobDescription("build_postings: df from stored postings")
        (
            spark.read.parquet(f"{path}/postings")
            .groupBy("__term")
            .agg(F.count(F.lit(1)).alias("__df"))
            .sortWithinPartitions("__term")
            .write.mode("overwrite")
            .parquet(f"{path}/df")
        )
        spark.sparkContext.setJobDescription(None)

    def _write_stats() -> None:
        spark.sparkContext.setJobDescription("build_postings: stats")
        stats.write.mode("overwrite").parquet(f"{path}/stats")
        spark.sparkContext.setJobDescription(None)

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_write_tf_then_df), pool.submit(_write_stats)]
        for f in futs:
            f.result()


def bm25_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    postings_dir: str | None = None,
) -> DataFrame:
    """Okapi BM25 top-k text retrieval — the standard lexical relevance
    ranking (Robertson et al., TREC-3), the retrieval-quality step up
    from :func:`~clarite_python_spark.operators.dedup.jaccard_topk`'s
    set overlap: term frequency saturates at ``k1``, document length
    normalizes at ``b``, and rare terms dominate via
    idf = ln((N - df + 0.5)/(df + 0.5) + 1).

    score(q, d) = sum over distinct query terms present in d of
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Plan: one explode+groupBy builds the (doc, term, tf) postings with
    dl carried row-local; df folds off the postings (map-side combined);
    N/avgdl broadcast as one row; the DISTINCT query terms broadcast
    into the postings join, so the corpus shuffles once (the postings
    agg) regardless of |queries|. Scores round to 6 dp BEFORE ranking
    (ties then by doc id) so the ordering is engine-replayable. Returns
    (query_id, id, rank, bm25) — documents sharing no query term are
    absent, standard sparse-retrieval semantics.

    At 100 TB the postings table is the persistable artifact (build
    once with :func:`build_postings`, serve many query batches via
    ``postings_dir=``) and the per-batch cost is the broadcast join +
    one (query, doc) agg — no corpus rescan when postings are stored.

    Pass EITHER ``corpus`` (inline single-shot: tokenize + postings agg
    happen in this query) OR ``postings_dir`` (the directory a prior
    :func:`build_postings` wrote with the same ``id_col``; ``corpus``
    is ignored and may be None). Both paths score identically
    row-for-row (parity-tested).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError("need k1 >= 0 and 0 <= b <= 1")
    if postings_dir is not None:
        spark = queries.sparkSession
        tf = spark.read.parquet(f"{postings_dir}/postings")
        if id_col not in tf.columns:
            raise ValueError(
                f"stored postings at {postings_dir} carry id column "
                f"{[c for c in tf.columns if not c.startswith('__')]}, "
                f"not {id_col!r} — pass the id_col used at build time"
            )
        dfreq = spark.read.parquet(f"{postings_dir}/df")
        stats = spark.read.parquet(f"{postings_dir}/stats")
    elif corpus is None:
        raise ValueError("need a corpus DataFrame or postings_dir")
    else:
        tf, dfreq, stats = _postings_frames(corpus, text_col, id_col)
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.array_distinct(
                    F.transform(tokens(query_col), lambda t: F.lower(t))
                )
            ).alias("__term"),
        )
        .distinct()
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (
        F.col("__tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), on="__term")
        .join(dfreq, on="__term")
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _train_bpe_driver(
    word_counts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
    word_end_marker: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Exact incremental BPE trainer over an already-aggregated
    (word, count) table — the classic pair-delta algorithm (Sennrich's
    learn_bpe): a lazy max-heap over pair counts picks each merge in
    O(log #pairs) amortized, and applying a merge touches ONLY the
    words that contain the pair (an inverted pair→words index), so the
    per-merge cost is proportional to the pair's support, not to the
    vocabulary. Bit-identical to the distributed sequential path
    (count desc, (lhs, rhs) asc tie-break, greedy left-to-right merge
    application) — parity-pinned in tests."""
    import heapq
    from collections import Counter

    words: list[list[str]] = []
    cnts: list[int] = []
    for w, c in word_counts:
        syms = list(w)
        if word_end_marker:
            syms.append(word_end_marker)
        words.append(syms)
        cnts.append(c)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = cnts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)
    # lazy heap: every count CHANGE pushes a fresh (-count, pair) entry;
    # a top entry whose count no longer matches is stale — pop and skip
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = None
        while heap:
            negc, p = heap[0]
            if pair_counts.get(p, 0) == -negc:
                best = (p, -negc)
                break
            heapq.heappop(heap)
        if best is None or best[1] < min_pair_count:
            break
        (a, b), freq = best
        merges.append((r, a, b, freq))
        ab = a + b
        for i in list(pair_words.get((a, b), ())):
            syms = words[i]
            c = cnts[i]
            old = Counter(zip(syms, syms[1:]))
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            words[i] = out
            new = Counter(zip(out, out[1:]))
            for p in old.keys() | new.keys():
                d = new[p] - old[p]
                if d:
                    nc = pair_counts.get(p, 0) + d * c
                    if nc <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = nc
                        heapq.heappush(heap, (-nc, p))
                if new[p] == 0:
                    s_ = pair_words.get(p)
                    if s_ is not None:
                        s_.discard(i)
                        if not s_:
                            pair_words.pop(p, None)
                elif old[p] == 0:
                    pair_words.setdefault(p, set()).add(i)
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
    word_end_marker: str | None = None,
    strategy: str = "distributed",
    max_vocab_rows: int = 5_000_000,
) -> DataFrame:
    """Distributed byte-pair-encoding vocabulary trainer (Sennrich et
    al. 2016): ``n_merges`` rounds of (adjacent-pair count → pick the
    most frequent pair → merge it everywhere), producing the merge
    table a tokenizer ships with. Returns (rank, lhs, rhs, freq) —
    merge #rank fuses adjacent symbols lhs+rhs, freq is the pair's
    weighted count at merge time. Ties broken by (lhs, rhs) ascending;
    fully deterministic. Stops early when no pair reaches
    ``min_pair_count``.

    Conventions: whitespace pretokenization (:func:`tokens`,
    lowercased by default), symbols start as single characters, merges
    never cross word boundaries. ``word_end_marker`` (e.g. ``'</w>'``)
    appends the Sennrich end-of-word symbol to every word before
    training, so merges can capture suffix structure; use a multi-char
    marker so it cannot collide with a real character. Default None is
    the GPT-style variant.

    ``strategy`` picks where the merge LOOP runs — the corpus-scale
    word-count aggregation is identical either way, and the per-round
    state is the distinct-word table in both:

    - ``'distributed'`` (default, oracle-pinned): each round is one
      map-side-combined pair-count aggregation over the executor-side
      word table + one driver top-1 scalar. Per-round cost is
      independent of corpus size but LINEAR in rounds — right for the
      gate-scale vocabularies the oracles replay, ~8-12 h extrapolated
      at a production 30-50k merges (BASELINE.md round 12).
    - ``'driver'``: collect the (word, count) table once (guarded by
      ``max_vocab_rows`` — the table is the SAME bounded state the
      distributed loop keeps, just held driver-side) and run the exact
      incremental pair-delta algorithm (:func:`_train_bpe_driver`):
      heap-ordered merge selection, only words containing the merged
      pair touched per round. Bit-identical output (parity-pinned);
      measured ~1000× less wall per merge at 10k merges (BASELINE.md
      round 13) — the production-vocabulary path. Raises when the
      vocabulary exceeds the guard instead of silently collecting an
      unbounded table; at web-scale vocabularies prune with
      ``min_word_count`` upstream or fall back to ``'distributed'``.

    Scale shape — the same bounded-iteration discipline as the IRLS and
    connected-components kernels: the corpus is touched ONCE (word-count
    aggregation); every round then runs over the DISTINCT-WORD table
    (|vocab| rows — orders of magnitude smaller than the corpus, and
    the only state that exists between rounds), as one map-side-combined
    pair-count aggregation shuffling #distinct-pairs partial sums, one
    driver-side top-1 scalar (the same single-row collect per round as
    the CC convergence check), and one row-local ``aggregate`` fold that
    applies the merge greedily left-to-right with NO shuffle. The word
    table is eagerly DISK_ONLY-checkpointed every 4th round so plan
    depth stays O(1) instead of nesting n_merges fold expressions into
    one Janino-killing tree (between checkpoints a round re-evaluates
    <= 3 chained folds — cheaper than a materialization job each
    round). Driver state is one (lhs, rhs, freq) triple per round —
    never data.
    """
    from pyspark import StorageLevel

    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    if strategy not in ("distributed", "driver"):
        raise ValueError("strategy must be 'distributed' or 'driver'")
    if word_end_marker == "":
        raise ValueError("word_end_marker must be a non-empty string or None")
    spark = df.sparkSession
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    wc = (
        df.select(F.explode(tokens(txt)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if strategy == "driver":
        # one corpus-scale agg, checkpointed so the guard count and the
        # collect scan stored blocks instead of re-aggregating
        wc = wc.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        n_vocab = wc.count()
        if n_vocab > max_vocab_rows:
            raise ValueError(
                f"train_bpe(strategy='driver'): {n_vocab} distinct words "
                f"exceed max_vocab_rows={max_vocab_rows}; prune rare words "
                "upstream or use strategy='distributed'"
            )
        word_counts = [(r["w"], int(r["cnt"])) for r in wc.collect()]
        merges = _train_bpe_driver(
            word_counts, n_merges, min_pair_count, word_end_marker
        )
        return spark.createDataFrame(
            merges, "rank int, lhs string, rhs string, freq long"
        )
    syms0 = F.split("w", "")
    if word_end_marker:
        syms0 = F.concat(syms0, F.array(F.lit(word_end_marker)))
    words = (
        wc.select(syms0.alias("syms"), "cnt")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    merges: list[tuple[int, str, str, int]] = []
    # round-INVARIANT pair expression, built once; the round-varying
    # merge fold is rendered as ONE SQL parse per round (r13):
    # rebuilding both through the Column API cost ~2.6 s of py4j round
    # trips across 12 rounds (cProfile). Identical trees — the SQL CASE
    # WHEN / aggregate fold is what the Column form compiled to, with
    # the round's lhs/rhs/fused as escaped string literals.
    n = F.size("syms")
    pairs_col = F.explode(
        F.when(
            n > 1,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("lhs"),
                    F.element_at("syms", (i + 1).cast("int")).alias("rhs"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    ).alias("p")

    def _sstr(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    for r in range(1, n_merges + 1):
        pairs = words.select(pairs_col, F.col("cnt"))
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
            .first()
        )
        if best is None or best["c"] < min_pair_count:
            break
        lhs, rhs, freq = best["lhs"], best["rhs"], int(best["c"])
        merges.append((r, lhs, rhs, freq))
        # greedy left-to-right merge: fold symbols into a new array,
        # fusing when the accumulator tail is lhs and the next is rhs
        # (try_element_at: NULL on the empty accumulator, so the WHEN
        # falls through instead of raising under ANSI)
        apply_merge = F.expr(
            "aggregate(syms, cast(array() as array<string>), (acc, s) -> "
            f"CASE WHEN try_element_at(acc, -1) = {_sstr(lhs)} "
            f"AND s = {_sstr(rhs)} "
            "THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array({_sstr(lhs + rhs)})) "
            "ELSE concat(acc, array(s)) END)"
        )
        words = words.select(apply_merge.alias("syms"), "cnt")
        # checkpoint every 4th round, not every round (r13): between
        # checkpoints the next round's pair agg re-evaluates <= 3
        # chained row-local folds over the |vocab|-row table — far
        # cheaper than the eager materialization job it replaces
        # (halves the per-round job count; plan depth stays bounded,
        # results are checkpoint-invariant)
        if r % 4 == 0:
            words = words.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, freq long"
    )


def _bpe_segment_pandas(vocab: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Arrow-batched rank-priority BPE segmenter over the distinct-word
    table: for each word, repeatedly merge (greedy left-to-right, same
    overlap semantics as the JVM fold) the adjacent pair with the
    LOWEST rank until none applies. For a merge table produced by BPE
    training this yields exactly the rank-order-replay segmentation —
    rule i's operands can only be produced by rules < i, so applying
    the lowest-ranked applicable rule first never unlocks an
    earlier-ranked one — in ONE pass over the vocab instead of
    n_merges chained fold projections (the fold path's plan-node and
    checkpoint count at a 30k-rule table). Rules are closure-captured
    driver state: O(n_merges) strings, broadcast once per executor."""
    import pandas as pd

    ranks: dict[tuple[str, str], int] = {}
    for i, p in enumerate(rules):
        ranks.setdefault((p[0], p[1]), i)
    rl = list(rules)

    def seg(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                while len(syms) > 1:
                    best = None
                    for i in range(len(syms) - 1):
                        rk = ranks.get((syms[i], syms[i + 1]))
                        if rk is not None and (best is None or rk < best):
                            best = rk
                    if best is None:
                        break
                    a, b = rl[best]
                    ab = a + b
                    folded: list[str] = []
                    for s in syms:
                        if folded and folded[-1] == a and s == b:
                            folded[-1] = ab
                        else:
                            folded.append(s)
                    syms = folded
                out.append(syms)
            yield pd.DataFrame({"w": pdf["w"], "syms": out})

    return vocab.mapInPandas(seg, schema="w string, syms array<string>")


def bpe_encode(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    checkpoint_every: int = 8,
    word_end_marker: str | None = None,
    encode_impl: str = "auto",
) -> DataFrame:
    """Tokenize text with a trained BPE merge table (the serving half of
    :func:`train_bpe`): whitespace pretokenization, then each word is
    segmented by replaying the merges in rank order. Returns
    (id_col, tokens array<string>, n_tokens) — docs with no words get an
    empty array.

    Scale shape: the merges replay runs over the corpus's DISTINCT-WORD
    table (|vocab| rows), NOT the corpus — one row-local greedy fold per
    merge rule, folds chained as projections and DISK_ONLY-checkpointed
    every ``checkpoint_every`` rules so the expression tree never nests
    past codegen limits. The corpus itself is touched twice: once to
    collect per-doc word lists, once for the final word->tokens
    broadcast-or-shuffle equi-join and positional reassembly. Merge
    rules are O(n_merges) driver state (the merge TABLE is tiny; the
    vocab never leaves the executors).

    ``encode_impl`` picks how the vocab is segmented:

    - ``'fold'`` (oracle-pinned): one row-local JVM ``aggregate`` fold
      per rule, chained projections checkpointed every
      ``checkpoint_every`` rules. Per-word work AND plan size are
      O(n_merges) — right at oracle scale, but a 30k-rule table means
      thousands of plan nodes and ~4k checkpoints.
    - ``'pandas'``: one Arrow-batched mapInPandas pass over the vocab
      running the classic rank-priority segmenter (repeatedly merge
      the lowest-ranked pair present — provably the same segmentation
      as rank-order replay for tables produced by BPE TRAINING, where
      a rule's operands are only producible by lower-ranked rules;
      parity-pinned). One pass, no per-rule plans: per-word work is
      O(len · merges-applied), independent of table size.
    - ``'auto'`` (default): fold up to 64 rules, pandas past that.

    ``word_end_marker`` must match the value used at training time."""
    from pyspark import StorageLevel

    if encode_impl not in ("auto", "fold", "pandas"):
        raise ValueError("encode_impl must be 'auto', 'fold', or 'pandas'")
    if isinstance(merges, DataFrame):
        rules = [
            (r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()
        ]
    else:
        rules = list(merges)
    if encode_impl == "auto":
        encode_impl = "fold" if len(rules) <= 64 else "pandas"
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words_per_doc = df.select(F.col(id_col), tokens(txt).alias("__words"))
    syms0 = F.split("w", "")
    if word_end_marker:
        syms0 = F.concat(syms0, F.array(F.lit(word_end_marker)))
    vocab = (
        words_per_doc.select(F.explode("__words").alias("w"))
        .distinct()
        .select("w", syms0.alias("syms"))
    )
    if encode_impl == "pandas":
        vocab = _bpe_segment_pandas(vocab, rules)
    else:
        def _sstr(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        for j, (lhs, rhs) in enumerate(rules, start=1):
            # one SQL parse per rule instead of a Column-API fold build
            # (r13, same tree + py4j saving as the train_bpe loop)
            apply_merge = F.expr(
                "aggregate(syms, cast(array() as array<string>), "
                "(acc, s) -> "
                f"CASE WHEN try_element_at(acc, -1) = {_sstr(lhs)} "
                f"AND s = {_sstr(rhs)} "
                "THEN concat(slice(acc, 1, size(acc) - 1), "
                f"array({_sstr(lhs + rhs)})) "
                "ELSE concat(acc, array(s)) END)"
            )
            vocab = vocab.select("w", apply_merge.alias("syms"))
            if j % checkpoint_every == 0 and j < len(rules):
                vocab = vocab.localCheckpoint(
                    eager=True, storageLevel=StorageLevel.DISK_ONLY
                )
    ex = words_per_doc.select(
        F.col(id_col), F.posexplode("__words").alias("__pos", "w")
    )
    joined = ex.join(vocab, on="w").groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "syms"))),
                lambda s: s["syms"],
            )
        ).alias("tokens")
    )
    return (
        words_per_doc.select(id_col)
        .join(joined, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
            F.coalesce(F.size("tokens"), F.lit(0)).cast("int").alias("n_tokens"),
        )
    )


def pack_token_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    drop_remainder: bool = True,
) -> DataFrame:
    """Exact fixed-length sequence packing — the concat-and-chunk step a
    pretraining pipeline runs after tokenization: all documents' tokens
    are concatenated in ``id_col`` order into one global stream and cut
    into consecutive ``seq_len``-token sequences (documents crossing a
    boundary are split, nothing is padded). Returns (seq_id, tokens
    array<string>, n_tokens, n_docs) with seq_id = 0-based chunk index
    and n_docs = documents contributing at least one token to the
    chunk; ``drop_remainder`` drops the final partial chunk (the
    standard training convention). Deterministic: the stream order is
    (id, token position), no ties possible.

    Scale shape — the classic distributed prefix-sum instead of a
    global window (``Window.orderBy(id)`` with no partitionBy compiles
    to a SINGLE-task sort — the exact anti-pattern at 100 TB):
    ``repartitionByRange(id)`` gives ordered partition ranges, a
    partition-LOCAL window computes the within-partition running token
    count, and the per-partition totals (one row per partition) are
    collected and broadcast back as absolute offsets. The chunk
    exchange then carries one CONTIGUOUS-SLICE row per (doc, chunk)
    intersection — ~seq_len/doc_len× fewer rows than a per-token
    explode, with the same total token payload (measured r13: the
    per-token explode shuffled 1 row/token and paid a seq_len-element
    struct sort per chunk; the slice plan is identical output, fewer
    exchange rows and ~docs-per-chunk comparator calls); chunks are
    perfectly balanced by construction (exactly seq_len tokens each).
    Documents with zero tokens contribute nothing and are not counted
    in n_docs."""
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = df.sparkSession
    base = df.select(
        F.col(id_col), F.col(tokens_col).alias("__toks")
    ).withColumn("__n", F.coalesce(F.size("__toks"), F.lit(0)))
    n_part = max(
        1, min(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2048)
    )
    from pyspark import StorageLevel

    # eager checkpoint BEFORE anything reads __pid: repartitionByRange
    # picks its bounds by sampling and spark_partition_id is evaluated
    # per job, so the totals collect below and the final chunk job
    # would otherwise re-execute the exchange independently and can
    # disagree on which partition a row landed in (measured: 4086 vs
    # 4229 chunks at sf0.1) — the checkpoint freezes one materialized
    # partitioning that every downstream job reads.
    ranged = (
        base.repartitionByRange(n_part, F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__loc", F.coalesce(F.sum("__n").over(w_loc), F.lit(0))
    )
    # per-partition totals: one row per partition, driver-tiny; range
    # partitioning orders partitions by id, so the absolute offset of
    # partition p is the sum of totals of partitions < p
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum("__n").alias("t")).collect()
    }
    prefix, acc = {}, 0
    for p in sorted(totals):
        prefix[p] = acc
        acc += totals[p] or 0
    total_tokens = acc
    pre = spark.createDataFrame(
        [(p, off) for p, off in prefix.items()] or [(0, 0)],
        "__pid int, __pre long",
    )
    offs = local.join(F.broadcast(pre), on="__pid").withColumn(
        "__off", F.col("__pre") + F.col("__loc")
    )
    # one shuffle row per (doc, chunk) INTERSECTION, not per token: a
    # doc at offset off spanning n tokens touches chunks
    # floor(off/L)..floor((off+n-1)/L); emit the doc's contiguous token
    # slice for each touched chunk, keyed by the slice's starting global
    # position. Chunk reassembly sorts the (start, slice) structs and
    # flattens — slices are non-overlapping and contiguous, so this is
    # exactly the per-token (__gp, __tok) sort of the old plan with
    # ~chunk_len/doc_len× fewer exchange rows and ~doc-count
    # sort-comparator calls per chunk instead of seq_len (measured
    # sf0.1, seq_len=64: 6.35 s -> see OPTIMIZATION_r13.md; identical
    # rows — same tokens, same counts).
    ex = (
        offs.where(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.col("__off"),
            F.explode(
                F.sequence(
                    F.floor(F.col("__off") / seq_len),
                    F.floor((F.col("__off") + F.col("__n") - 1) / seq_len),
                )
            ).alias("seq_id"),
        )
        .withColumn(
            "__start", F.greatest(F.col("__off"), F.col("seq_id") * seq_len)
        )
        .withColumn(
            "__end",
            F.least(
                F.col("__off") + F.size("__toks"),
                (F.col("seq_id") + 1) * seq_len,
            ),
        )
        .select(
            F.col(id_col),
            F.col("seq_id"),
            F.col("__start"),
            F.slice(
                F.col("__toks"),
                (F.col("__start") - F.col("__off") + 1).cast("int"),
                (F.col("__end") - F.col("__start")).cast("int"),
            ).alias("__slice"),
        )
    )
    chunks = ex.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__start"), F.col("__slice")))
                ),
                lambda s: s["__slice"],
            )
        ).alias("tokens"),
        F.sum(F.size("__slice")).cast("int").alias("n_tokens"),
        F.countDistinct(F.col(id_col)).cast("int").alias("n_docs"),
    )
    if drop_remainder:
        # equivalent to n_tokens == seq_len except when the stream ends
        # exactly on a boundary (then the last chunk is complete)
        chunks = chunks.where(
            (F.col("seq_id") + 1) * seq_len <= F.lit(total_tokens)
        )
    return chunks.orderBy("seq_id")
