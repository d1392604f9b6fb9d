"""Registry-hygiene lint: driver-compatibility constraints on queries().

The driver's correctness harness canonicalizes each result with pandas
``DataFrame.sort_values`` over ALL columns before hashing.  pandas cannot
factorize container values (``TypeError: unhashable type: 'list'``), so a
query that emits an Array/Struct/Map column errors the driver gate even
when its values are correct (round 7: feature_hash_embed_documents and
quantize_int8_embeddings were the only two offenders — both now serialize
the vector to a CSV string).  This lint keeps the constraint enforced for
every future registration: the local checker (scripts/check_correctness.py)
sorts by ``repr`` and would silently pass what the driver rejects.
"""

import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

_CONTAINER = (T.ArrayType, T.StructType, T.MapType)


def _container_cols(schema):
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _CONTAINER)
    ]


def test_no_query_emits_container_columns(spark):
    """Every queries() entry must emit scalar-only columns (driver
    canonicalizer contract).  Schema-only: plans are built, not run."""
    offenders = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        bad = _container_cols(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries() entries emit container-typed columns the driver cannot "
        f"canonicalize: {offenders}"
    )


@pytest.mark.parametrize(
    "name", ["feature_hash_embed_documents", "quantize_int8_embeddings"]
)
def test_round7_offenders_are_scalarized(spark, name):
    """The two round-7 driver-errored registrations now serialize their
    vectors as CSV strings; pin that projection."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert not _container_cols(df.schema)
    csv_col = (
        "embedding_csv" if name.startswith("feature_hash") else "qvec_csv"
    )
    row = df.limit(1).collect()[0]
    parts = row[csv_col].split(",")
    assert len(parts) >= 2 and all(
        p.lstrip("-").isdigit() for p in parts
    ), f"{csv_col} should be a comma-joined integer vector: {row[csv_col]!r}"
