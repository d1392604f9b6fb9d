"""Type sweep over every ``oracle_sql()`` entry — no Spark session.

The driver's value hash is type-sensitive: a DuckDB HUGEINT (what
``list_sum`` / un-cast window ``sum()`` promote to) hashes differently
from Spark's BIGINT even when numerically equal, which cost two
CORRECTNESS_r05 queries (VERDICT.md round 5). This test instantiates
each oracle's result schema in DuckDB with ``LIMIT 0`` over the sf0.001
tables and fails on any column whose Arrow type is outside the set
Spark can emit (decimal128 = HUGEINT/DECIMAL, unsigned ints, ...), so
new oracles can't reintroduce the class.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_correctness import TABLES, arrow_canon  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TYPE_SF_DIR", "/root/testdata/sf0.001")

# Canonical Arrow types Spark DataFrames can emit (and that the pipeline
# actually uses). Anything else — decimal (HUGEINT), uint*, null — is a
# latent driver-hash mismatch.
ALLOWED_SCALARS = {
    "int8",
    "int16",
    "int32",
    "int64",
    "float32",
    "float64",
    "bool",
    "string",
    "binary",
    "date",
    "timestamp",
}


def _allowed(canon: str) -> bool:
    while canon.startswith("list<") and canon.endswith(">"):
        canon = canon[5:-1]
    return canon in ALLOWED_SCALARS


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry_mod

    return entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_result_types(con, name):
    sql = _oracles()[name]
    tbl = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table()
    bad = [
        f"{f.name}: {arrow_canon(f.type)}"
        for f in tbl.schema
        if not _allowed(arrow_canon(f.type))
    ]
    assert not bad, (
        f"oracle '{name}' emits driver-hash-unsafe column types: {bad} "
        f"(CAST to BIGINT/DOUBLE in the SQL twin)"
    )
