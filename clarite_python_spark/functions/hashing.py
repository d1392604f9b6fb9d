"""The shared engine-portable hash construction.

Every operator that needs a deterministic, cross-engine-reproducible
integer hash (MinHash/SimHash members, sampling buckets, rolling
fingerprints) uses the SAME 60-bit value: the first 15 hex chars of
md5, parsed base-16. One definition here keeps the documented
"same hash family everywhere" agreement — and the DuckDB oracles'
shift-parse twin (``__spark_entry__._md5_bucket`` et al.) — from
drifting per call site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_60bit", "md5_60bit_py"]


def md5_60bit(c: Column) -> Column:
    """First 60 bits of md5(c) as a non-negative BIGINT (c is hashed as
    a string). DuckDB twin: ``list_sum(list_transform(range(1,16), k ->
    (strpos('0123456789abcdef', substr(md5(x),k,1))-1) << ((15-k)*4)))``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_60bit_py(s: str) -> int:
    """Driver-side/python twin of :func:`md5_60bit` (used by tests'
    independent simulations)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
