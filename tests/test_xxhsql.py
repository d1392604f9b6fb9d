"""The SQL XXH64 twin must match Spark's xxhash64 bit-for-bit — on every
length path (empty, tails, exact 32, multi-stripe) and on the chained
(string, long) form the MinHash members use."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from clarite_python_spark.functions import xxhsql

CASES = [
    "",
    "a",
    "abc",
    "hello wo",
    "0123456789abcdef",
    "0123456789abcdefghijklmnopqrstu",   # 31
    "0123456789abcdefghijklmnopqrstuv",  # 32
    "x" * 45,
    "y" * 64,
    "naïve café — utf8 bytes beyond ascii 中文",
    "-123,456,789",  # band-bucket-style joined signature string
]


def _sql_hashes(strings, second_long=None, max_len=96):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for s in strings:
        con.execute("INSERT INTO t VALUES (?)", [s])
    base = "SELECT s, 7::BIGINT AS j FROM t"
    ctes, fin = xxhsql.string_hash_ctes(
        "x", base, "s", ["s"], max_len, second_long=second_long
    )
    sql = "WITH " + ",\n".join(f"{n} AS ({q})" for n, q in ctes) + f" SELECT s, h FROM {fin}"
    return dict(con.sql(sql).fetchall())


def test_matches_spark_single_arg(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    want = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    got = _sql_hashes(CASES)
    assert got == want


def test_matches_spark_string_long_chain(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    want = {
        r["s"]: r["h"]
        for r in df.select(
            "s", F.xxhash64("s", F.lit(7).cast("long")).alias("h")
        ).collect()
    }
    got = _sql_hashes(CASES, second_long="j")
    assert got == want


def test_matches_spark_on_random_strings(spark):
    """200 seeded-random strings across all length regimes (0-100 bytes,
    ASCII + multibyte), one batch comparison."""
    import random

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 ,.-_!é中"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 100)))
        for _ in range(200)
    ]
    cases = list(dict.fromkeys(cases))  # de-dup keys for the dict compare
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    want = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    got = _sql_hashes(cases, max_len=128)
    assert got == want


def test_long_chain_ctes_matches_spark(spark):
    """long_chain_ctes — the deduplicated member-hash form the MinHash
    oracle uses (one bytes-hash per distinct shingle, then per-(s, j)
    hashLong chaining) — must equal Spark's two-arg xxhash64(s, j)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for s in CASES:
        con.execute("INSERT INTO t VALUES (?)", [s])
    h_ctes, h_fin = xxhsql.string_hash_ctes(
        "c1", "SELECT s FROM t", "s", ["s"], max_len=96, out_col="h1"
    )
    base = f"SELECT s, h1, r.range::BIGINT AS j FROM {h_fin} CROSS JOIN range(0, 8) r"
    m_ctes, m_fin = xxhsql.long_chain_ctes("c2", base, "j", "h1", ["s", "j"])
    sql = (
        "WITH " + ",\n".join(f"{n} AS ({q})" for n, q in h_ctes + m_ctes)
        + f" SELECT s, j, h FROM {m_fin}"
    )
    got = {(s, j): h for s, j, h in con.sql(sql).fetchall()}
    rows = [(s, j) for s in CASES for j in range(8)]
    df = spark.createDataFrame(rows, "s string, j long")
    want = {
        (r["s"], r["j"]): r["h"]
        for r in df.select("s", "j", F.xxhash64("s", "j").alias("h")).collect()
    }
    assert got == want
