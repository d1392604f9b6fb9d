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
    "shingles",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "simhash",
    "ngram_jaccard_pairs",
]


def _norm(text_col: str) -> Column:
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text match.

    hash-groupBy (min is algebraic: map-side partial agg) + semi join —
    no window, no sort; both shuffles key on the md5 fingerprint."""
    keyed = df.withColumn("__fp", F.md5(_norm(text_col)))
    winners = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(winners, on=["__fp", id_col], how="inner").drop("__fp")


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM lambdas)."""
    toks = tokens(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: element j = min over shingles of
    ``xxhash64(shingle, seed=j)``. xxhash64 is Spark-native (JVM, seeded),
    so the whole signature is one vectorized expression — no UDF."""
    return F.array(
        *[F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(j)))) for j in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    shingle -> minhash -> split signature into ``bands`` bands -> hash
    each band -> explode -> groupBy(band, band_hash) -> pairs from
    buckets. Returns distinct (id_a, id_b) with id_a < id_b.

    ``max_bucket`` drops degenerate buckets to bound pair blowup."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(text_col, shingle_n), num_hashes)
    banded = df.select(F.col(id_col), sig.alias("__sig")).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice("__sig", b * rows_per_band + 1, rows_per_band), lambda v: v.cast("string")))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
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


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins each side of the pair to its (distinct) shingle set and computes
    |∩| / |∪| with JVM array ops. Only candidate pairs are scored."""
    sh = df.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
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


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates -> exact-Jaccard verify
    -> keep the min-id representative of each duplicate pair's loser set.

    (Full transitive-closure clustering needs iterative connected
    components — at this stage we drop any doc that is similar to a
    lower-id doc, the greedy standard for corpus dedup.)"""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    dups = ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_n, threshold)
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash fingerprint: per token, hash to ``bits`` bits; sum ±1 per
    bit position over tokens; fingerprint bit = sign of the sum.

    One ``aggregate`` lambda with an array accumulator — single narrow
    pass, no shuffle. Returns (id, simhash bigint)."""
    toks = tokens(text_col)
    zero = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    counts = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.when(
                    F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)).cast("long"),
            ),
            lambda a, x: a + x,
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda c, b: F.when(c >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.select(F.col(id_col), fp.alias("simhash"))
