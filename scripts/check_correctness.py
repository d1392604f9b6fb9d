"""Local replica of the driver's correctness gate — TYPE-STRICT.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same-named SQL on DuckDB over the same
parquet tables; compares row count, column names, **column types** (via
canonicalized Arrow schemas — the driver's value hash is type-sensitive,
so a DuckDB HUGEINT vs a Spark BIGINT is a FAIL even when numerically
equal; see VERDICT.md round 5), and row-order-insensitive values.
Prints one line per query + a JSON summary.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def arrow_canon(t: pa.DataType) -> str:
    """Canonical name for an Arrow type, unifying aliases that hash the
    same (string/large_string) but keeping width + decimal-ness distinct
    (int32 != int64 != decimal128) — the classes the driver's hasher
    distinguishes."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_unsigned_integer(t):
        return f"uint{t.bit_width}"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_canon(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_canon(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{arrow_canon(t.key_type)},{arrow_canon(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_canon(dt) -> str:
    """Canonical name for a Spark SQL type, in the same namespace as
    :func:`arrow_canon` (Spark long <-> Arrow int64, etc.)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_canon(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_canon(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_canon(dt.keyType)},{spark_canon(dt.valueType)}>"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def type_diffs(sdf_schema, duck_arrow_schema: pa.Schema) -> list[str]:
    """Column-by-column canonical-type mismatches (by name; names already
    verified equal-as-sets before this runs)."""
    duck = {f.name: arrow_canon(f.type) for f in duck_arrow_schema}
    diffs = []
    for f in sdf_schema.fields:
        d = duck.get(f.name)
        s = spark_canon(f.dataType)
        if d is not None and d != s:
            diffs.append(f"{f.name}: spark={s} duckdb={d}")
    return diffs


def normalize(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        key = []
        for c in sorted(r):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            key.append((c, v))
        out.append(tuple(key))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the k-means-replay oracles inline seeded init indices that depend
    # on min(10_000, |embeddings|) — export the actual count BEFORE
    # oracle_sql() builds them so the gate is exact at any sf
    import os

    n_emb = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    os.environ["CLARITE_ORACLE_EMBED_ROWS"] = str(min(10_000, int(n_emb)))

    import __spark_entry__ as entry_mod
    from clarite_python_spark.session import get_spark

    spark = get_spark("check-correctness", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    summary = {}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            summary[name] = "spark_error"
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle)")
            summary[name] = f"rows_only:{len(spark_rows)}"
            if len(spark_rows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            cols = tbl.schema.names
            duck_rows = tbl.to_pylist()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            summary[name] = "duckdb_error"
            failures += 1
            continue
        s_cols = sorted(spark_rows[0]) if spark_rows else sorted(sdf.columns)
        d_cols = sorted(cols)
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} duckdb={len(duck_rows)}")
            summary[name] = "rowcount_mismatch"
            failures += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duckdb={d_cols}")
            summary[name] = "schema_mismatch"
            failures += 1
            continue
        diffs = type_diffs(sdf.schema, tbl.schema)
        if diffs:
            print(f"FAIL  {name}: type mismatch: {'; '.join(diffs)}")
            summary[name] = "type_mismatch"
            failures += 1
            continue
        ns, nd = normalize(spark_rows), normalize(duck_rows)
        if ns != nd:
            bad = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            summary[name] = "value_mismatch"
            failures += 1
            continue
        print(f"OK    {name}: {len(spark_rows)} rows match (types strict)")
        summary[name] = "ok"

    print(json.dumps({"sf_dir": sf_dir, "failures": failures, "results": summary}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
