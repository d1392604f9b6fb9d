"""Dataset-pipeline operators: deterministic sampling/splitting and
sequence packing for large-scale training-data preparation.

Extensions beyond the reference surface (the reference is a QC/EWAS
library; these are the dataset-assembly steps a 100-TB corpus pipeline
needs around it). Everything here is hash arithmetic and window
functions — pure JVM column expressions, no Python in the hot path, no
extra shuffles beyond the declared window partitioning.

Determinism is the design center: `sample()`/`split()` decisions depend
only on (id, salt), never on partitioning, row order, or executor count,
so a re-run on different cluster shapes — or a different engine
entirely — selects the SAME rows. That is what makes training datasets
reproducible and is why these use a portable md5 bucket rather than
Spark's `DataFrame.sample` (whose Bernoulli draw depends on partition
layout and seed plumbing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_split",
    "stratified_split",
    "deterministic_sample",
    "pack_sequences",
    "chunk_documents",
    "clean_corpus",
    "deterministic_shuffle",
    "token_budget_sample",
    "domain_cap",
    "temperature_mixture",
    "epoch_repeat",
    "dsir_logweights",
    "dsir_sample",
    "perplexity_buckets",
    "weighted_sample",
    "shard_by_tokens",
    "split_leakage",
    "mixture_report",
]

#: number of hash buckets fractions are quantized to: fraction 0.8123
#: keeps buckets [0, 8123). 10^4 gives basis-point resolution while
#: keeping every comparison exact-integer (no float portability risk).
BUCKETS = 10_000


def hash_bucket(id_col: str | Column, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5(id:salt).

    Uses the first 15 hex chars (60 bits) parsed via ``conv`` — the same
    engine-portable construction as the md5 MinHash family
    (operators/dedup.py:_md5_member), so DuckDB/any engine reproduces the
    assignment bit-for-bit. 60 bits >> log2(buckets) keeps the modulo
    bias negligible (< 2**-46).
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", c.cast("string"), F.lit(salt))
    return (md5_60bit(key) % F.lit(buckets)).alias("bucket")


def deterministic_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash.

    ``splits`` maps name -> fraction; fractions must sum to <= 1 (any
    remainder is assigned NULL, i.e. "held out"). Assignment is a pure
    per-row map: no shuffle, no sort, fully pushdown-friendly, identical
    on 1 or 1000 executors. Fractions are quantized to 1/10000.
    """
    fracs = list(splits.items())
    if any(f < 0 for _, f in fracs):
        raise ValueError("split fractions must be non-negative")
    total = sum(f for _, f in fracs)
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(id_col, salt)
    expr: Column = F.lit(None).cast("string")
    hi = 0
    for name, frac in fracs:
        lo, hi = hi, hi + int(round(frac * BUCKETS))
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_split(
    df: DataFrame,
    splits: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exact-quota stratified split: within EVERY ``by`` stratum,
    exactly round(cum_frac · n_stratum) rows land in each split,
    chosen in deterministic content-hash order — the split a benchmark
    or eval-holdout pipeline wants when per-stratum proportions must
    hold exactly (``deterministic_split``'s hash-threshold form is only
    proportional in expectation; a 50-doc language can easily draw 40%
    test at a 10% fraction).

    Rows are ranked per stratum by md5(id:salt) (content-addressed —
    stable across runs, partitionings, and engines) and split at the
    cumulative thresholds t_i = floor(cum_i · n + 0.5); fractions
    summing below 1 leave the tail NULL ("held out").

    Plan: ONE shuffle on the stratum key; rank and stratum count are
    two window functions over the same partitioning (no extra
    exchange). A mega-stratum serializes its sort into one task — at
    100 TB split within finer strata (e.g. (lang, hash-prefix)) the
    same way shard_by_tokens documents.
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    fracs = list(splits.items())
    if any(f < 0 for _, f in fracs):
        raise ValueError("split fractions must be non-negative")
    total = sum(f for _, f in fracs)
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    key = md5_60bit(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(by).orderBy(key.asc(), F.col(id_col).asc())
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(Window.partitionBy(by))
    expr: Column | None = None
    cum = 0.0
    for name, frac in fracs:
        cum += frac
        t = F.floor(F.lit(cum) * n + F.lit(0.5))
        cond = rn <= t
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    out = expr.otherwise(F.lit(None).cast("string")) if expr is not None else F.lit(None).cast("string")
    return df.withColumn("split", out)


def _dsir_grams(text_col: str) -> Column:
    """Lowercased word unigrams + bigrams as one array column (the
    hashed feature set of DSIR; row-local)."""
    from clarite_python_spark.operators.text import tokens

    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bi)


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023) —
    per-document importance log-weight log p_target(x) / p_raw(x) under
    hashed-n-gram bucket multinomials: lowercased word unigrams+bigrams
    hash (md5, engine-portable) into ``n_buckets``; each distribution is
    the add-``alpha``-smoothed bucket frequency over its corpus; a
    document's log-weight is the sum of its grams' bucket log-ratios.
    Select pretraining data that LOOKS LIKE the (small) ``target``
    sample — the published recipe behind quality-matched corpus
    selection at scale.

    Plan: two explode+agg passes build the O(n_buckets) count tables
    (map-side combined); the log-ratio table folds into ONE array
    literal-shaped row broadcast to every executor; each document's
    weight is then a row-local ``aggregate`` over its gram array with an
    ``element_at`` lookup — the corpus is scanned once for counts and
    once for weights, with no per-token shuffle or join in the weight
    pass. Fully lazy (the ratio row rides as a crossJoin broadcast).
    """
    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import _rebalance

    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if alpha <= 0:
        raise ValueError("alpha must be positive")

    def bucket(g: Column) -> Column:
        return md5_60bit(F.concat_ws(":", g, F.lit(salt))) % n_buckets

    def bucket_counts(frame: DataFrame) -> DataFrame:
        # rebalance before the per-gram md5 chain: a single-file local
        # scan otherwise runs the whole tokenize+hash pass on ONE task
        # (r13; no-op at scale where the scan arrives in many splits)
        return (
            _rebalance(frame).select(F.explode(_dsir_grams(text_col)).alias("__g"))
            .select(bucket(F.col("__g")).alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    denom = float(alpha) * n_buckets

    def log_probs(counts: DataFrame, name: str) -> DataFrame:
        """One row: array<double> of smoothed log bucket probabilities,
        index b+1 (element_at is 1-based); absent buckets get alpha."""
        full = counts.agg(
            F.sum("__c").alias("__n"),
            F.map_from_arrays(
                F.collect_list("__b"), F.collect_list("__c")
            ).alias("__m"),
        )
        idx = F.sequence(F.lit(0), F.lit(n_buckets - 1))
        arr = F.transform(
            idx,
            lambda b: F.log(
                (
                    F.coalesce(
                        F.element_at(F.col("__m"), b.cast("long")), F.lit(0)
                    ).cast("double")
                    + F.lit(float(alpha))
                )
                / (F.col("__n").cast("double") + F.lit(denom))
            ),
        )
        return full.select(arr.alias(name))

    ratio_row = (
        log_probs(bucket_counts(target), "__lt")
        .crossJoin(log_probs(bucket_counts(df), "__lr"))
        .select(
            F.zip_with(
                F.col("__lt"), F.col("__lr"), lambda t, r: t - r
            ).alias("__ratio")
        )
    )
    weighted = _rebalance(df).select(
        F.col(id_col), _dsir_grams(text_col).alias("__gs")
    ).crossJoin(F.broadcast(ratio_row))
    w = F.aggregate(
        F.col("__gs"),
        F.lit(0.0),
        lambda acc, g: acc + F.element_at(F.col("__ratio"), (bucket(g) + 1).cast("int")),
    )
    return weighted.select(
        id_col,
        F.size("__gs").alias("n_grams"),
        F.round(w, 6).alias("log_weight"),
    )


def dsir_sample(
    df: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    salt: str = "dsir",
    gumbel: bool = True,
) -> DataFrame:
    """DSIR selection: the ``n`` documents with the highest
    ``log_weight + Gumbel noise`` — Gumbel-top-k IS sampling-without-
    replacement proportional to the importance weights (the paper's
    resampling step), and the noise here is deterministic
    (``-ln(-ln(u))`` with u from the md5 key of the id), so the chosen
    set is reproducible across runs, partitionings, and engines.
    ``gumbel=False`` degrades to plain top-n by weight (mode-seeking:
    takes only the most target-like tail). Ties and float-equal scores
    break by id. Plan: the weight projection plus one
    TakeOrderedAndProject — no global sort materializes.
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    if n <= 0:
        raise ValueError("n must be positive")
    weights = dsir_logweights(
        df, target, n_buckets, text_col, id_col, alpha, salt
    )
    score = F.col("log_weight")
    if gumbel:
        u = (
            md5_60bit(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt + ":g"))
            ).cast("double")
            + F.lit(1.0)
        ) / F.lit(float(1 << 60))
        score = score + (-F.log(-F.log(u)))
    return (
        weights.select(
            id_col, "n_grams", "log_weight", F.round(score, 6).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(n)
    )


def epoch_repeat(
    df: DataFrame,
    epochs: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Fractional-epoch upsampling: replicate every row so the corpus is
    seen ``epochs`` times in expectation — the standard move when a
    mixture weight calls for e.g. 2.7 passes over a small high-quality
    source (each doc appears floor(epochs) times, and a deterministic
    md5-bucket coin gives it one extra copy with probability
    frac(epochs), quantized to 1/10000 like ``deterministic_sample`` so
    the decision is an exact-integer comparison in any engine). Output
    adds an ``epoch`` column (0-based copy index); a larger ``epochs``
    value replicates a SUPERSET of a smaller one (same bucket
    nesting as the sampler).

    Plan: pure row-local arithmetic + an explode of a
    ``sequence(0, n_copies-1)`` literal — no shuffle, no join; the
    explode multiplies rows by ~``epochs``, which is the point. Pair
    with ``deterministic_shuffle`` afterwards so the copies don't
    ride adjacent into training shards.
    """
    if epochs <= 0:
        raise ValueError("epochs must be positive")
    base = int(epochs)
    frac_buckets = int(round((epochs - base) * BUCKETS))
    b = hash_bucket(id_col, salt)
    n_copies = F.lit(base) + (b < F.lit(frac_buckets)).cast("int")
    # sequence(0, -1) would emit a DESCENDING [0, -1] — guard the
    # zero-copy case (epochs < 1, coin says drop) with an empty array,
    # which explode elides entirely
    seq = F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(seq))


def deterministic_sample(
    df: DataFrame,
    fraction: float | None = None,
    by: str | None = None,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic (stratified) sampling by hash bucket.

    - ``fraction`` alone: keep ~fraction of all rows.
    - ``by`` + ``fractions``: per-stratum rates — this is also the
      source-mixture weighting step of a corpus pipeline (e.g. keep 100%
      of wiki, 10% of crawl); strata absent from ``fractions`` fall back
      to ``fraction`` (default 0 = drop).

    The filter is a row-local predicate on md5(id) — Catalyst pushes it
    to the scan, and the kept set is independent of partitioning, so
    resampling at a higher rate is a SUPERSET of a lower rate (bucket
    ranges nest). That superset property is what lets a pipeline scale
    a mixture up without re-drawing everything.
    """
    b = hash_bucket(id_col, salt)
    if fractions is not None:
        if by is None:
            raise ValueError("fractions requires `by`")
        default = int(round((fraction or 0.0) * BUCKETS))
        cut: Column = F.lit(default)
        for stratum, frac in sorted(fractions.items()):
            cut = F.when(F.col(by) == stratum, F.lit(int(round(frac * BUCKETS)))).otherwise(cut)
        return df.where(b < cut)
    if fraction is None:
        raise ValueError("need fraction or fractions")
    return df.where(b < int(round(fraction * BUCKETS)))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into (optionally overlapping) windows of
    ``chunk_tokens`` whitespace tokens — the standard context-window
    preprocessing step before embedding or training.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may be short; an
    empty document yields no chunks. Pure JVM array expressions
    (tokenize once, ``sequence`` + ``explode`` the chunk index, slice +
    rejoin) — a row-local flatMap with no shuffle, output rows ≈
    corpus_tokens / stride regardless of document skew. Returns the id
    plus (chunk_id, chunk_text, chunk_tokens_n).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    from clarite_python_spark.operators.text import tokens

    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    # NULL text → size is NULL and greatest() below would ignore it;
    # coalesce to 0 so NULL docs chunk to nothing like empty ones
    n = F.coalesce(F.size(toks), F.lit(0))
    # number of chunks: ceil(max(n - overlap, 1) / stride) for n > 0
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.ceil((F.greatest(n - overlap, F.lit(1))) / F.lit(stride)).cast("int")
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        # sequence(0, -1) would count DOWN; gate on n_chunks > 0 so empty
        # docs explode to nothing instead
        F.explode(F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1))).alias("chunk_id"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("chunk_tokens_n"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str | Column | None = None,
    by: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign each document to a
    training-sequence bin of ``max_tokens`` tokens.

    Documents are laid out end-to-end per ``by`` group in ``order_col``
    order; a document starting at running-token offset ``o`` lands in
    sequence ``floor(o / max_tokens)`` (the standard concat-and-chunk
    layout used for LLM pretraining batches; documents may straddle a
    boundary — the returned ``seq_offset`` is where the doc starts
    within its first sequence).

    Plan: one window (cumulative sum partitioned by the group) — a
    single hash shuffle on the group key then a sort within partitions.
    At 100 TB a per-source window would put one source on one task, so
    ``n_shards > 1`` subdivides each group by a deterministic hash shard
    of ``id_col``: packing stays reproducible (shard assignment is
    content-addressed, not partition-dependent) and each window
    partition is ~group/n_shards rows. Returns the input columns plus
    (n_tokens, shard, seq_id, seq_offset).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if token_col is None:
        from clarite_python_spark.operators.text import token_count

        tok: Column = token_count(text_col)
    else:
        tok = F.col(token_col) if isinstance(token_col, str) else token_col
    out = df.withColumn("n_tokens", tok.cast("long"))
    if n_shards > 1:
        out = out.withColumn("shard", hash_bucket(id_col, "shard", n_shards))
        part = [by, "shard"]
    else:
        out = out.withColumn("shard", F.lit(0))
        part = [by]
    from pyspark.sql import Window

    w = Window.partitionBy(*part).orderBy(order_col)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        out.withColumn("seq_id", F.floor(start / F.lit(max_tokens)))
        .withColumn("seq_offset", start % F.lit(max_tokens))
    )


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    max_dup_word_frac: float = 0.9,
    max_top2_char_frac: float = 0.9,
    gopher_kwargs: dict | None = None,
    max_span_dup_frac: float | None = None,
    span_n: int = 50,
    min_quality_prob: float | None = None,
    classifier_weights: dict | None = None,
) -> DataFrame:
    """End-to-end corpus-cleaning decision table: the standard filter
    stack (exact dedup -> Gopher quality rules -> repetition filters ->
    language ID) composed into one per-document verdict.

    Emits every input document with per-stage booleans
    (``keep_dedup``, ``keep_quality``, ``keep_repetition``,
    ``keep_language``) and the overall ``keep`` — a decision TABLE, not
    a filtered corpus, because at pipeline scale you audit the
    per-stage rejection mix before materializing the cleaned output
    (``.where("keep")`` is the one-liner that follows).

    ``max_span_dup_frac`` (opt-in) adds the Lee-et-al substring-
    duplication stage (:func:`~clarite_python_spark.operators.dedup.
    duplicate_spans` with ``span_n``-token windows): documents whose
    duplicated-window coverage exceeds the threshold fail a
    ``keep_spans`` verdict that joins the table and ANDs into ``keep``.
    Off by default because it is the one stage whose cost is corpus-
    quadratic-in-boilerplate (see BASELINE.md shape table).

    ``min_quality_prob`` (opt-in) adds the linear quality-classifier
    stage (:func:`~clarite_python_spark.operators.text.
    quality_classifier`, optionally with ``classifier_weights``
    overrides): documents scoring below the threshold fail a
    ``keep_classifier`` verdict. Costs one more id-keyed join of a
    scan-speed projection.

    Plan shape (r13): ALL four default stages are computed in ONE scan.
    The quality / language / repetition verdicts are row-local
    projections, chained through each operator's ``keep_cols`` so they
    share a single pass over the text; the exact-dedup verdict
    (``id == min(id) over the normalized-text fingerprint group`` —
    exactly :func:`~clarite_python_spark.operators.dedup.exact_dedup`'s
    default min-id winner) rides a window over the SAME partitioning the
    scan was rebalanced to (hash on the fingerprint), so the whole
    decision table is one scan + one keyed exchange — the previous
    composition paid three scans, a groupBy exchange and two id-keyed
    joins for identical rows, and ran the heavy quality folds on the
    scan's raw (often single-file) split layout instead of the
    rebalanced one.
    """
    from clarite_python_spark.operators.dedup import _norm
    from clarite_python_spark.operators.text import (
        gopher_rules,
        language_id,
        repetition_stats,
    )

    staged = df.withColumn("__fp", F.md5(_norm(text_col)))
    # rebalance ONCE, keyed on the fingerprint: the dedup window below
    # reuses this partitioning (no second exchange), and the heavy
    # quality folds run across all cores even when the scan arrives in
    # one split (same local/small-file rationale as text._rebalance)
    target = df.sparkSession.sparkContext.defaultParallelism
    if staged.rdd.getNumPartitions() < target:
        staged = staged.repartition(target, F.col("__fp"))
    verdicts = language_id(
        gopher_rules(
            repetition_stats(
                staged,
                text_col=text_col,
                id_col=id_col,
                keep_cols=[text_col, "__fp"],
            ),
            text_col=text_col,
            id_col=id_col,
            keep_cols=["dup_word_frac", "top2_char_frac", text_col, "__fp"],
            **(gopher_kwargs or {}),
        ),
        text_col=text_col,
        id_col=id_col,
        keep_cols=["gopher_pass", "dup_word_frac", "top2_char_frac", "__fp"],
    )
    out = verdicts.select(
        F.col(id_col),
        F.col("gopher_pass").alias("keep_quality"),
        F.col("lang_pred").isin(*languages).alias("keep_language"),
        (
            F.col(id_col)
            == F.min(id_col).over(Window.partitionBy("__fp"))
        ).alias("keep_dedup"),
        (
            (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top2_char_frac") <= max_top2_char_frac)
        ).alias("keep_repetition"),
    )
    keep = (
        F.col("keep_dedup")
        & F.col("keep_quality")
        & F.col("keep_repetition")
        & F.col("keep_language")
    )
    if max_span_dup_frac is not None:
        from clarite_python_spark.operators.dedup import duplicate_spans

        spans = duplicate_spans(df, text_col=text_col, id_col=id_col, n=span_n).select(
            F.col(id_col),
            (F.col("dup_fraction") <= max_span_dup_frac).alias("keep_spans"),
        )
        out = out.join(spans, id_col, "left").fillna(True, subset=["keep_spans"])
        keep = keep & F.col("keep_spans")
    if min_quality_prob is not None:
        from clarite_python_spark.operators.text import quality_classifier

        probe = quality_classifier(
            df,
            weights=classifier_weights,
            threshold=min_quality_prob,
            text_col=text_col,
            id_col=id_col,
        ).select(F.col(id_col), F.col("keep").alias("keep_classifier"))
        out = out.join(probe, id_col, "left").fillna(
            False, subset=["keep_classifier"]
        )
        keep = keep & F.col("keep_classifier")
    return out.withColumn("keep", keep)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    n_shards: int = 1,
) -> DataFrame:
    """Content-addressed corpus shuffle for training-order randomization:
    every row gets a ``shuffle_key`` (the portable 60-bit md5 of
    ``id:salt``) and a ``shard`` (key mod ``n_shards``); rows arrive
    hash-partitioned by shard and sorted by key WITHIN each shard.

    This is the scalable form of "shuffle the corpus": no global sort —
    ``repartition(shard)`` + ``sortWithinPartitions`` is one shuffle and
    a parallel per-shard sort, and because key and shard depend only on
    (id, salt) the order is identical on any cluster shape or engine
    (same property as ``deterministic_split``). Re-salting gives a fresh
    epoch order without re-writing ids. A trainer reads shards in
    sequence; global order across shards is key order by construction.
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    key = md5_60bit(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard", (F.col("shuffle_key") % n_shards).cast("int")
    )
    return out.repartition(max(1, n_shards), "shard").sortWithinPartitions(
        "shard", "shuffle_key"
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int] | int,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Source mixing by TOKEN budget rather than document count: within
    each ``by`` group, documents are ordered by their deterministic
    shuffle key and kept while the running token total stays within the
    group's budget (the first document crossing the budget is kept, so
    every non-empty group with a positive budget contributes at least
    one document and the budget is reached, not undershot).

    ``budgets`` is either {group: max_tokens} (missing groups keep
    everything) or a single int applied to every group. One window
    cumsum per group — a single keyed shuffle; the hash order makes the
    selection reproducible and NESTED like deterministic_sample's rates
    (a bigger budget keeps a superset). Returns the rows plus
    (n_tokens, cum_tokens).

    ``order_col`` switches the within-group order from the hash key to
    that column (``descending`` by default) with the hash key as the
    tie-break — "keep the BEST documents until the budget is spent",
    the quality-first selection a filtered-corpus assembly runs with a
    quality/classifier score. Selection still nests in the budget for
    a fixed (order_col, salt).
    """
    from pyspark.sql import Window

    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import token_count

    key = md5_60bit(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    if order_col is not None:
        lead = F.col(order_col).desc() if descending else F.col(order_col).asc()
        w = Window.partitionBy(by).orderBy(lead, "__key")
    else:
        w = Window.partitionBy(by).orderBy("__key")
    out = (
        df.withColumn("__key", key)
        .withColumn("n_tokens", token_count(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
    )
    if isinstance(budgets, int):
        limit = F.lit(budgets)
    else:
        limit = None
        for grp, b in sorted(budgets.items()):
            cond = F.when(F.col(by) == grp, F.lit(b))
            limit = cond if limit is None else limit.when(F.col(by) == grp, F.lit(b))
        limit = F.lit(None).cast("long") if limit is None else limit.otherwise(F.lit(None))
    # keep while the PREVIOUS cumsum is under budget: the crossing doc
    # stays, everything after it goes; NULL limit = no budget = keep all
    return (
        out.where(limit.isNull() | ((F.col("cum_tokens") - F.col("n_tokens")) < limit))
        .drop("__key")
    )



def _guard_reserved(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    """Refuse inputs whose columns collide with an operator's internal
    temp columns — silently clobbering a user column (the layout.py
    __zkey bug class) is worse than an explicit error."""
    hit = [c for c in names if c in df.columns]
    if hit:
        raise ValueError(f"{op} uses internal column(s) {hit}; rename them in the input")


def domain_cap(
    df: DataFrame,
    max_docs: int,
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    prefilter_margin: float | None = None,
) -> DataFrame:
    """Cap the number of documents per ``by`` group (Dolma/RefinedWeb's
    per-domain cap: no single domain may dominate the corpus). Winners
    are the ``max_docs`` rows with the smallest deterministic hash key —
    so the kept set is independent of partitioning and engine, and a
    LARGER cap keeps a superset of a smaller one (ranks are stable).

    Plan: rank = row_number over (partition by group, order by md5 key,
    id) — one keyed shuffle. At 100-TB scale a mega-domain (e.g. one
    crawl host with 10^9 pages) turns that per-key sort into a straggler;
    pass ``prefilter_margin`` (e.g. 3.0) to first drop rows whose 60-bit
    hash KEY already exceeds ``margin * max_docs / n_group`` of the key
    space — a broadcast-joined per-group threshold on the SAME key the
    rank orders by (a prefix of the sort order, so the surviving rows
    are exactly the lowest-keyed ones and their ranks are unchanged).
    That shrinks each group's sorted set to ~margin * max_docs rows
    before the exact rank; the result is identical to the unfiltered
    rank as long as each over-cap group keeps >= max_docs survivors —
    margin trades a vanishing (Chernoff, uniform keys) under-draw
    probability for a bounded per-group sort. Under-draws are not
    silent: a group at its cap whose last rank < max_docs while __n
    exceeds the cap can only arise from an under-drawn prefilter, and
    the parity test pins margin 3.0 against the exact path.

    Returns the surviving rows with their ``cap_rank`` (1-based).
    """
    from pyspark.sql import Window

    from clarite_python_spark.functions.hashing import md5_60bit

    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    _guard_reserved(df, ("__key", "__n", "__cut", "cap_rank"), "domain_cap")
    key = md5_60bit(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    out = df.withColumn("__key", key)
    if prefilter_margin is not None:
        if prefilter_margin < 1.0:
            raise ValueError("prefilter_margin must be >= 1")
        key_space = float(1 << 60)  # md5_60bit range
        counts = out.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
        cut = F.least(
            F.lit(key_space),
            F.ceil(F.lit(float(prefilter_margin * max_docs) * key_space) / F.col("__n")),
        ).cast("long").alias("__cut")
        # __n rides along for the under-draw check below
        rates = counts.select(F.col(by).alias("__capgrp"), cut, F.col("__n"))
        # null-safe join: a NULL group is a real group (groupBy made a
        # row for it) and must not be silently dropped by null != null
        out = (
            out.join(
                F.broadcast(rates), F.col(by).eqNullSafe(F.col("__capgrp"))
            )
            .where(F.col("__key") < F.col("__cut"))
            .drop("__cut", "__capgrp")
        )
    w = Window.partitionBy(by).orderBy(F.col("__key"), F.col(id_col))
    ranked = out.withColumn("cap_rank", F.row_number().over(w)).where(
        F.col("cap_rank") <= max_docs
    )
    if prefilter_margin is not None:
        # Under-draw detection (not silent): a group the prefilter saw as
        # over-cap (__n > max_docs) that ends with max(cap_rank) < max_docs
        # can only mean the prefilter dropped winners — fail the JOB via
        # raise_error folded into cap_rank (an output column, so Catalyst
        # cannot prune the check; the group-max window reuses the rank's
        # partitioning). Limitation: a group the prefilter emptied
        # entirely has no surviving row to carry the check — margin >= 1
        # makes that astronomically unlikely (needs 0 of __n uniform keys
        # under a cut sized for margin*max_docs expected survivors).
        wg = Window.partitionBy(by)
        short = (F.col("__n") > F.lit(max_docs)) & (
            F.max("cap_rank").over(wg) < F.lit(max_docs)
        )
        ranked = ranked.withColumn(
            "cap_rank",
            F.when(
                short,
                F.raise_error(
                    F.concat(
                        F.lit("domain_cap: prefilter under-draw in group '"),
                        F.col(by).cast("string"),
                        F.lit("' — raise prefilter_margin"),
                    )
                ),
            ).otherwise(F.col("cap_rank")),
        )
    return ranked.drop("__key", "__n")


def temperature_mixture(
    df: DataFrame,
    tau: float,
    target_rows: int,
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual-sampling rule
    of mBERT/XLM-R, Conneau et al. 2020, applied to corpus sources):
    with group shares p_s = n_s / N, sampling weights are
    w_s = p_s^tau / sum(p_s^tau); each group is then thinned to rate
    r_s = min(1, w_s * target_rows / n_s) via the same deterministic
    hash-bucket predicate as ``deterministic_sample``. tau < 1 flattens
    the mixture (upweights small sources), tau = 1 is proportional,
    tau = 0 is uniform-over-sources.

    Rates are quantized to integer buckets with floor(r * BUCKETS + 0.5)
    so the accept decision is an exact-integer comparison — identical in
    any engine. Plan: one map-side-combinable count agg, a broadcast
    join of the per-group rate (O(#groups) rows), and a pushdown-capable
    row-local predicate; the corpus itself is never shuffled. Returns
    surviving rows plus the group's ``rate_buckets``.
    """
    if tau < 0:
        raise ValueError("tau must be >= 0")
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    _guard_reserved(df, ("__n", "__Z", "rate_buckets"), "temperature_mixture")
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("__n")).alias("c")
    # tot shares counts' lineage, so qualify every reference (c./t.) —
    # unqualified __n is ambiguous in the self-derived cross join
    tot = counts.agg(
        F.sum(F.pow(F.col("__n"), F.lit(float(tau)))).alias("__Z"),
    ).alias("t")
    # w_s*target/n_s with p_s^tau/Z expanded: n_s^tau/Z * target / n_s
    rate = F.least(
        F.lit(1.0),
        F.pow(F.col("c.__n"), F.lit(float(tau)))
        / F.col("t.__Z")
        * F.lit(float(target_rows))
        / F.col("c.__n"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        F.col(f"c.{by}"),
        F.floor(rate * BUCKETS + F.lit(0.5)).cast("int").alias("rate_buckets"),
    )
    b = hash_bucket(id_col, salt)
    rates = rates.withColumnRenamed(by, "__mixgrp")
    return (
        df.join(F.broadcast(rates), F.col(by).eqNullSafe(F.col("__mixgrp")))
        .where(b < F.col("rate_buckets"))
        .drop("__mixgrp")
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    vocab: DataFrame | None = None,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity partitioning (Wenzek et al. 2020): score
    each document with the unigram LM proxy (``text.unigram_logprob``
    bits/token — the stand-in for CCNet's KenLM perplexity), then split
    each language into ``n_buckets`` equal-count buckets ordered by
    score. Bucket 1 = lowest bits/token = most in-distribution ("head"
    in CCNet's head/middle/tail vocabulary); training pipelines keep
    head+middle and drop or re-sample tail.

    ``exact=True`` ranks with ``ntile`` over a per-language window —
    the pandas/R-parity form, but at 100 TB one language's rows sort in
    a single reducer. ``exact=False`` is the scale form and what CCNet
    itself does: compute approximate bucket cutoffs per language
    (``percentile_approx`` — a mergeable map-side sketch), broadcast
    the O(#langs) cutoff table, and assign buckets with a row-local
    comparison; no global sort, boundary assignments approximate.

    Returns (id, lang, n_tokens, bits_per_token, bucket, bucket_label);
    ``bucket_label`` uses ``labels`` when it has exactly ``n_buckets``
    entries, else the bucket number as a string. Empty documents (zero
    tokens) have no score and drop out, as in unigram_logprob.
    """
    from pyspark.sql import Window

    from clarite_python_spark.operators.text import unigram_logprob

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col, vocab=vocab)
    scored = scored.join(df.select(F.col(id_col), F.col(lang_col)), on=id_col)
    if exact:
        w = Window.partitionBy(lang_col).orderBy("bits_per_token", id_col)
        bucketed = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = scored.groupBy(lang_col).agg(
            F.percentile_approx("bits_per_token", probs).alias("__cuts")
        )
        bucketed = scored.join(F.broadcast(cuts), on=lang_col).withColumn(
            "bucket",
            F.lit(1)
            + F.aggregate(
                F.col("__cuts"),
                F.lit(0),
                lambda acc, c: acc
                + F.when(F.col("bits_per_token") > c, 1).otherwise(0),
            ),
        ).drop("__cuts")
    label = (
        F.element_at(F.array(*[F.lit(x) for x in labels]), F.col("bucket"))
        if len(labels) == n_buckets
        else F.col("bucket").cast("string")
    )
    return bucketed.select(
        id_col,
        lang_col,
        "n_tokens",
        "bits_per_token",
        "bucket",
        label.alias("bucket_label"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement via the
    Gumbel-top-k construction (equivalently Efraimidis & Spirakis 2006
    exponential races): score = ln(w) + Gumbel noise, take the top n.
    The noise is deterministic — ``-ln(-ln(u))`` with u drawn from the
    md5 key of ``(id, salt)`` — so the chosen set is reproducible
    across runs, partitionings, and engines, and changing ``salt``
    redraws the sample. Rows with null or non-positive weight are
    excluded (zero-weight rows must never be drawn).

    This is the generic form of :func:`dsir_sample`'s resampling step,
    for when the caller already has importance weights (quality scores,
    per-domain rates, inverse-propensity corrections).

    Plan: a row-local score projection followed by one
    TakeOrderedAndProject — per-partition top-n then a single merge of
    n-row heads; no global sort materializes. Ties (after rounding to
    6 dp, the cross-engine-stable comparison) break by id.
    """
    from clarite_python_spark.functions.hashing import md5_60bit

    if n <= 0:
        raise ValueError("n must be positive")
    w = F.col(weight_col).cast("double")
    u = (
        md5_60bit(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt + ":ws"))
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    score = F.log(w) + (-F.log(-F.log(u)))
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("sample_score", F.round(score, 6))
        .orderBy(F.desc("sample_score"), F.asc(id_col))
        .limit(n)
    )


def shard_by_tokens(
    df: DataFrame,
    tokens_per_shard: int,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every document to a training shard of ~``tokens_per_shard``
    tokens — the shard-writing step before a training run ("make N-token
    webdataset/arrow files"). Within each ``by`` group documents are
    ordered by their deterministic md5 shuffle key (so shard contents
    are reproducible across runs/engines and pre-shuffled for training)
    and the shard id is the running token total divided by the shard
    size: a shard closes as soon as it crosses the boundary, so every
    shard except a group's last holds at least ``tokens_per_shard``
    tokens and overshoots by at most one document.

    Plan: ONE window cumsum per group — the same single keyed shuffle
    as ``token_budget_sample``, and the same skew caveat: one giant
    group serializes its cumsum in one reducer. At 100 TB shard within
    finer groups (e.g. ``by="shard_prefix"`` = a hash of the id — LLN
    makes per-prefix token totals near-equal) and treat (group, shard)
    as the shard key. Returns rows plus (n_tokens, cum_tokens, shard).
    """
    from pyspark.sql import Window

    from clarite_python_spark.functions.hashing import md5_60bit
    from clarite_python_spark.operators.text import token_count

    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    key = md5_60bit(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(by).orderBy("__key")
    return (
        df.withColumn("__key", key)
        .withColumn("n_tokens", token_count(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        # the shard a doc STARTS in: previous cumsum / size, so the doc
        # that crosses a boundary still belongs to the shard it closes
        .withColumn(
            "shard",
            ((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(tokens_per_shard))
            .cast("long"),
        )
        .drop("__key")
    )


def split_leakage(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    granularity: str = "ngram",
    n: int = 8,
) -> DataFrame:
    """Train/test LEAKAGE audit: assign splits with
    :func:`deterministic_split`, then count the exact fingerprints —
    whole normalized documents (``granularity="doc"``) or word n-grams
    (``"ngram"``, the default: hash-random splits rarely share verbatim
    docs, but shared n-grams measure the soft leakage that inflates
    eval scores) — that straddle two different splits. The audit a
    pipeline runs BEFORE publishing a benchmark split of its own
    corpus; run it after near-dedup too, since hash-splitting after
    dedup is what actually prevents doc-level leakage.

    Returns (split_a, split_b, n_shared, n_a, n_b) per unordered split
    pair — containment/Jaccard are one division away. Rows left
    unassigned by fractional splits (NULL split) are excluded.

    Plan: the split is a row-local hash predicate; the overlap matrix
    is :func:`clarite_python_spark.operators.dedup.source_overlap`
    keyed by the split column (distinct (fingerprint, split) scan +
    fingerprint-keyed self-join — fans out only where a fingerprint
    truly spans splits).
    """
    from clarite_python_spark.operators.dedup import source_overlap

    assigned = deterministic_split(df, splits, id_col, salt).where(
        F.col("split").isNotNull()
    )
    out = source_overlap(
        assigned,
        text_col=text_col,
        id_col=id_col,
        by="split",
        granularity=granularity,
        n=n,
    )
    return (
        out.withColumnRenamed("source_a", "split_a")
        .withColumnRenamed("source_b", "split_b")
    )


def leakage_safe_split(
    df: DataFrame,
    splits: dict[str, float],
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    **kwargs,
) -> DataFrame:
    """Cluster-aware deterministic split: every member of a duplicate /
    near-duplicate cluster lands in the SAME split, preventing
    train-test soft leakage at assignment time (:func:`split_leakage`
    is the after-the-fact audit of a split made without this; splitting
    per-row first and deduping later either leaks or deletes eval
    rows).

    ``method='exact'`` groups byte-identical normalized text — label =
    min id per md5-fingerprint group, one window over the fingerprint
    partitions, no join. ``'minhash'`` / ``'simhash'`` take connected-
    component labels from ``dedup.minhash_clusters`` /
    ``dedup.simhash_clusters`` (verified near-dup pairs; extra
    ``**kwargs`` forward — threshold/bands/max_hamming/...), joined
    back on the id key; documents in no cluster keep their own id as
    the label.

    The assignment itself is :func:`deterministic_split`'s
    hash-threshold rule applied to the CLUSTER LABEL — md5(label:salt)
    bucket, so membership is decided by the cluster, not the row, and
    it stays a pure per-row map downstream of the one cluster join (the
    near-dup clustering is the same banded machinery those operators
    already pay; fractions hold in expectation over clusters).
    Fractions summing below 1 leave the remainder's split NULL ("held
    out"). Returns ``df``'s columns + (cluster_label, split).
    """
    from clarite_python_spark.operators import dedup as dedup_mod

    if method == "exact":
        fp = F.md5(dedup_mod._norm(text_col))
        w = Window.partitionBy(fp)
        labeled = df.withColumn("cluster_label", F.min(id_col).over(w))
    elif method in ("minhash", "simhash"):
        fn = (
            dedup_mod.minhash_clusters
            if method == "minhash"
            else dedup_mod.simhash_clusters
        )
        cl = fn(df, text_col=text_col, id_col=id_col, **kwargs)
        labeled = df.join(cl, id_col, "left").withColumn(
            "cluster_label",
            F.coalesce(F.col("cluster_label"), F.col(id_col)),
        )
    else:
        raise ValueError(
            f"method must be exact, minhash or simhash, got {method!r}"
        )
    return deterministic_split(labeled, splits, id_col="cluster_label", salt=salt)


def mixture_report(
    df: DataFrame,
    budget_tokens: int,
    tau: float = 1.0,
    by: str = "source",
    text_col: str = "text",
    token_col: str | None = None,
    max_epochs: float | None = None,
) -> DataFrame:
    """Plan a training mixture BEFORE sampling it: given a token budget
    and a temperature, report per ``by`` group the available token mass,
    the temperature-scaled mixture weight w_s = t_s^tau / sum(t_s^tau)
    (over token shares, not doc counts), the sampled token allocation
    floor(w_s * budget), and the implied ``effective_epochs`` =
    sampled/available — the number that catches "this mixture reuses
    the small source 14 times" before any data moves. With
    ``max_epochs`` set, also reports the epoch-capped allocation and the
    budget shortfall (``lost_tokens``) the cap creates — the planning
    loop's feedback value for re-tempering.

    This is the read-only twin of :func:`temperature_mixture` (which
    thins rows): report first, sample after the numbers look right.

    Plan: one map-side-combined (count, sum-tokens) agg over the group
    key, a 1-row broadcast crossJoin for the normalizer — O(#groups)
    rows ever shuffle, the corpus is scanned once projection-only.
    Linear at 100 TB by construction.
    """
    from clarite_python_spark.operators.text import token_count

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if tau < 0:
        raise ValueError("tau must be >= 0")
    if max_epochs is not None and max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    toks = F.col(token_col) if token_col else token_count(text_col)
    counts = (
        df.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("bigint").alias("available_tokens"),
        )
        .alias("c")
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("available_tokens"), F.lit(float(tau)))).alias("__Z")
    ).alias("t")
    w = F.pow(F.col("c.available_tokens"), F.lit(float(tau))) / F.col("t.__Z")
    sampled = F.floor(w * F.lit(float(budget_tokens))).cast("bigint")
    out = counts.crossJoin(F.broadcast(tot)).select(
        F.col(f"c.{by}"),
        F.col("n_docs"),
        F.col("c.available_tokens").alias("available_tokens"),
        F.round(w, 6).alias("weight"),
        sampled.alias("sampled_tokens"),
        F.round(sampled / F.col("c.available_tokens"), 6).alias("effective_epochs"),
    )
    if max_epochs is not None:
        cap = F.floor(
            F.lit(float(max_epochs)) * F.col("available_tokens")
        ).cast("bigint")
        out = out.withColumn(
            "capped_tokens", F.least(F.col("sampled_tokens"), cap)
        ).withColumn(
            "lost_tokens", F.col("sampled_tokens") - F.col("capped_tokens")
        )
    return out.orderBy(by)
