"""Physical data layout optimization: multi-column Z-order clustering
for data skipping.

Why this exists: at 100 TB the scan is the query. Parquet readers skip
row groups (and whole files, with file-level stats) whose min/max
ranges miss the filter — but min/max are only tight if rows are
CLUSTERED on the filtered columns. A linear sort clusters one column
perfectly and leaves the others striped across every file; a Z-order
(Morton) curve interleaves the bits of several columns' bucket indices
so a k-dimensional box filter touches O(fraction) of files on EVERY
filtered column. This is the same layout step Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite perform,
re-expressed with public Spark primitives:

- bucket index per column = uniform binning of the value between two
  anchors (explicit, or a bounded quantile scan) — plain JVM arithmetic;
- zkey = bitwise interleave of the bucket indices — a sum of
  shift/mask terms, whole-stage-codegen'd, no UDF;
- ``repartitionByRange(zkey)`` (sampled range boundaries, the same
  mechanism Delta uses) + ``sortWithinPartitions(zkey)`` then a
  parquet write.

The write itself is ONE range shuffle — the cost you pay once so every
subsequent selective scan prunes. No driver state beyond the 2k anchor
values (k = #columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "optimize_layout", "compact", "dataset_stats"]


def zorder_key(
    bounds: dict[str, tuple[float, float]],
    bits: int = 10,
) -> Column:
    """Z-order (Morton) key over ``len(bounds)`` numeric columns as a
    pure column expression.

    ``bounds`` maps column name -> (lo, hi) anchors: each value is
    uniformly binned into ``2**bits`` buckets between its anchors
    (values outside clamp to the edge buckets — anchors need only
    cover the bulk of the distribution, e.g. p0.1/p99.9), and bucket
    bits are interleaved column-major: bit b of column j lands at
    position ``b * k + j``. With explicit anchors the key is a
    deterministic function of the row — reproducible across engines
    (the DuckDB oracle recomputes it exactly) and across cluster
    shapes.

    ``bits * len(bounds)`` must stay <= 63 (the key is a BIGINT).
    """
    cols = list(bounds)
    k = len(cols)
    if k == 0:
        raise ValueError("bounds must name at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds a 63-bit key")
    terms = []
    for j, c in enumerate(cols):
        lo, hi = (float(x) for x in bounds[c])
        if not hi > lo:
            raise ValueError(f"bounds for {c!r} must satisfy hi > lo")
        n = 1 << bits
        # uniform bucket with edge clamping; floor() then clamp keeps
        # the arithmetic identical in any engine with IEEE doubles
        raw = F.floor((F.col(c).cast("double") - lo) / (hi - lo) * n)
        bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(bucket, b).bitwiseAND(1), b * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(bounds: dict[str, tuple[float, float]], bits: int = 10) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (same arithmetic, DuckDB /
    any engine) — used by the correctness oracle."""
    cols = list(bounds)
    k = len(cols)
    parts = []
    for j, c in enumerate(cols):
        lo, hi = (float(x) for x in bounds[c])
        n = 1 << bits
        # clamp on the DOUBLE floor result BEFORE the BIGINT cast: an
        # extreme outlier's floor() can exceed int64, and a strict
        # engine (DuckDB) errors on the out-of-range cast where Spark
        # saturates — clamping first keeps the twin portable
        bucket = (
            f"CAST(least(greatest(floor((CAST({c} AS DOUBLE) - {lo!r}) / "
            f"({hi!r} - {lo!r}) * {n}), CAST(0 AS DOUBLE)), "
            f"CAST({n - 1} AS DOUBLE)) AS BIGINT)"
        )
        for b in range(bits):
            parts.append(f"((({bucket} // {1 << b}) % 2) * {1 << (b * k + j)})")
    return "(" + " + ".join(parts) + ")"


def _quantile_bounds(
    df: DataFrame, cols: list[str], lower: float = 0.001, upper: float = 0.999
) -> dict[str, tuple[float, float]]:
    """Anchor discovery: one bounded ``approx_percentile`` scan (the
    mergeable-sketch aggregate — no exact sort), p0.1/p99.9 by default
    so a stray outlier cannot collapse every row into one bucket."""
    aggs = []
    for c in cols:
        aggs.append(
            F.percentile_approx(F.col(c).cast("double"), F.lit(lower)).alias(f"{c}__lo")
        )
        aggs.append(
            F.percentile_approx(F.col(c).cast("double"), F.lit(upper)).alias(f"{c}__hi")
        )
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
        if lo is None or hi is None:
            raise ValueError(f"column {c!r} has no non-null values to anchor on")
        if not hi > lo:  # constant column: widen to a unit interval
            hi = lo + 1.0
        out[c] = (float(lo), float(hi))
    return out


def optimize_layout(
    df: DataFrame,
    cols: list[str],
    path: str | None = None,
    n_partitions: int | None = None,
    bits: int = 10,
    bounds: dict[str, tuple[float, float]] | None = None,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` clustered on the Z-order curve of ``cols``.

    Returns the re-clustered DataFrame (same rows, same schema); if
    ``path`` is given, also writes it as parquet so row-group/file
    min/max stats are tight on every column in ``cols`` — the pay-once
    layout step before repeated selective scans.

    ``bounds`` (per-column anchors) may be passed explicitly for a
    deterministic, engine-portable key; otherwise one
    ``approx_percentile`` scan discovers p0.1/p99.9 anchors.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if bounds is None:
        bounds = _quantile_bounds(df, cols)
    else:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for {missing}")
        bounds = {c: bounds[c] for c in cols}  # order by cols
    key = zorder_key(bounds, bits=bits)
    zkey = "__zkey"
    while zkey in df.columns:  # never clobber a user column of that name
        zkey = "_" + zkey
    clustered = df.withColumn(zkey, key)
    if n_partitions:
        clustered = clustered.repartitionByRange(n_partitions, zkey)
    else:
        clustered = clustered.repartitionByRange(zkey)
    clustered = clustered.sortWithinPartitions(zkey).drop(zkey)
    if path is not None:
        writer = clustered.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(path)
    return clustered


def dataset_stats(path: str) -> dict:
    """Physical health profile of a parquet dataset: file count, bytes,
    row groups, rows — the numbers that decide whether :func:`compact`
    is worth running. Driver-side footer reads only (O(#files) metadata,
    no data IO)."""
    import os

    import pyarrow.parquet as pq

    files = []
    for root, dirs, names in os.walk(path):
        # hive-partitioned datasets nest files under key=value dirs
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        files.extend(
            os.path.join(root, f)
            for f in names
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    files.sort()
    n_rows = n_groups = total = 0
    for f in files:
        total += os.path.getsize(f)
        md = pq.ParquetFile(f).metadata
        n_rows += md.num_rows
        n_groups += md.num_row_groups
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_row_groups": n_groups,
        "n_rows": n_rows,
        "mean_file_bytes": total // max(len(files), 1),
    }


def compact(
    spark,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet dataset into
    ~``target_file_mb`` files — the table-maintenance step (Delta
    ``OPTIMIZE``, Iceberg ``rewrite_data_files``) that a streaming or
    incremental-ingest sink needs periodically, because a reader's task
    scheduling, footer fetches, and (on object stores) per-request
    costs all scale with FILE COUNT, not bytes.

    Target partition count = ceil(on-disk bytes / target) — sized from
    the dataset's own footer metadata, not a guess. Without ``sort_by``
    the rewrite is a plain ``repartition`` (one round-robin shuffle);
    with it, a ``repartitionByRange`` + ``sortWithinPartitions`` so the
    compacted files ALSO carry tight min/max stats on those columns
    (compaction and clustering in the same single shuffle — pay once).
    Writes to ``out_path`` (never in place: a failed in-place rewrite
    would destroy the source; swap directories atomically in the
    caller's catalog/filesystem layer).

    Returns {before: stats, after: stats, target_partitions}.
    """
    if target_file_mb <= 0:
        raise ValueError("target_file_mb must be positive")
    if out_path == path:
        raise ValueError("compact never rewrites in place; pass a different out_path")
    before = dataset_stats(path)
    n_parts = max(1, -(-before["total_bytes"] // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_parts, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode("overwrite").parquet(out_path)
    return {
        "before": before,
        "after": dataset_stats(out_path),
        "target_partitions": n_parts,
    }
