"""Z-order layout: key correctness, row preservation, and the actual
data-skipping effect (file-level min/max stats tighten on EVERY
clustered column, not just the first sort column)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.layout import (
    optimize_layout,
    zorder_key,
    zorder_key_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_key_interleaves_bits(spark):
    # bucket(x)=5 (101b), bucket(y)=3 (011b) with bits=3, k=2:
    # zkey bit layout (column-major, bit b of col j at b*2+j):
    # x bits 1,0,1 -> positions 0,2,4 ; y bits 0,1,1 -> positions 1,3,5
    df = spark.createDataFrame([(5.0, 3.0)], "x double, y double")
    # anchors [0,8) with 8 buckets -> bucket == floor(value)
    key = zorder_key({"x": (0.0, 8.0), "y": (0.0, 8.0)}, bits=3)
    got = df.select(key.alias("z")).collect()[0]["z"]
    want = (1 << 0) + (0 << 2) + (1 << 4) + (1 << 1) + (1 << 3) + (0 << 5)
    assert got == want


def test_zorder_key_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-100.0,), (1e9,)], "x double")
    key = zorder_key({"x": (0.0, 8.0)}, bits=3)
    vals = [r["z"] for r in df.select(key.alias("z")).collect()]
    assert vals == [0, 7]


def test_zorder_key_sql_twin_matches(spark):
    """The SQL twin (used by the DuckDB oracle) computes the identical
    key for every lineitem row."""
    import duckdb

    bounds = {"l_extendedprice": (900.0, 105000.0), "l_quantity": (1.0, 50.0)}
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["z"]
        for r in df.select(
            "l_orderkey", "l_linenumber", zorder_key(bounds, bits=8).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT l_orderkey, l_linenumber, {zorder_key_sql(bounds, bits=8)} AS z "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = {(a, b): z for a, b, z in con.sql(sql).fetchall()}
    assert got == want


def test_optimize_layout_preserves_rows(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = optimize_layout(df, ["l_extendedprice", "l_quantity"], n_partitions=4)
    assert out.columns == df.columns
    def sig(d):
        return d.groupBy().agg(
            F.count("*"),
            F.sum("l_orderkey"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
        ).collect()

    assert sig(df) == sig(out)


def _file_ranges(path: str, cols: list[str]):
    """Per-file [min, max] of each column, from parquet footers — the
    stats a scan planner/reader prunes on."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rng = {}
        for c in cols:
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(names[c]).statistics
                if st is None or not st.has_min_max:  # stats-less group: unprunable
                    continue
                mins.append(st.min)
                maxs.append(st.max)
            if not mins:
                continue
            rng[c] = (min(mins), max(maxs))
        out.append(rng)
    return out


def test_zorder_layout_skips_files_on_both_columns(spark, tmp_path):
    """The point of the curve: after Z-ordering on (price, qty), a box
    filter on EITHER or BOTH columns overlaps far fewer files than under
    a linear sort on an unrelated column (l_orderkey), where price/qty
    are striped across every file."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_extendedprice", "l_quantity"]
    n = df.count()
    per_file = max(n // 16, 1)

    naive_path = str(tmp_path / "naive")
    (
        df.repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.option("maxRecordsPerFile", per_file)
        .parquet(naive_path)
    )
    z_path = str(tmp_path / "zorder")
    optimize_layout(df, cols, path=z_path, n_partitions=4, max_records_per_file=per_file)

    # ~10% box on each dimension (~1% of rows)
    box = {"l_extendedprice": (20000.0, 30000.0), "l_quantity": (10.0, 15.0)}

    def overlapping(path):
        ranges = _file_ranges(path, cols)
        return sum(
            all(r[c][0] <= box[c][1] and box[c][0] <= r[c][1] for c in cols)
            for r in ranges
        ), len(ranges)

    naive_hit, naive_total = overlapping(naive_path)
    z_hit, z_total = overlapping(z_path)
    assert naive_total >= 8 and z_total >= 8  # enough files to mean anything
    # linear sort on an unrelated key leaves both columns striped: the
    # box overlaps (almost) every file
    assert naive_hit >= naive_total * 0.8
    # the curve must prune at least half the files on a 1% box
    assert z_hit <= z_total * 0.5, (z_hit, z_total)


def test_optimize_layout_validates_args(spark):
    df = spark.range(10).withColumn("x", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        optimize_layout(df, [])
    with pytest.raises(ValueError):
        zorder_key({"x": (0.0, 8.0)}, bits=64)
    with pytest.raises(ValueError):
        zorder_key({"x": (8.0, 8.0)}, bits=4)


def test_optimize_layout_keeps_null_valued_rows(spark):
    """Rows with NULL in a clustered column get a NULL key (they sort
    together under range partitioning) but are never dropped."""
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(1, 5.0, 2.0), (2, None, 3.0), (3, 7.0, None), (4, None, None)],
        "id long, x double, y double",
    )
    out = optimize_layout(df, ["x", "y"], n_partitions=2,
                          bounds={"x": (0.0, 8.0), "y": (0.0, 8.0)})
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    assert out.where(SF.col("x").isNull()).count() == 2


# ------------------------------------------------------------ compaction


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    from clarite_python_spark.operators.layout import compact, dataset_stats

    src = str(tmp_path / "frag")
    # a fragmented sink: 64 tiny files
    spark.range(100_000).withColumn("v", F.rand(7)).repartition(64).write.parquet(src)
    assert dataset_stats(src)["n_files"] == 64

    out = str(tmp_path / "compacted")
    res = compact(spark, src, out, target_file_mb=128)
    assert res["after"]["n_files"] < res["before"]["n_files"]
    assert res["after"]["n_rows"] == res["before"]["n_rows"] == 100_000
    a = spark.read.parquet(src).agg(F.sum("id"), F.round(F.sum("v"), 6)).collect()[0]
    b = spark.read.parquet(out).agg(F.sum("id"), F.round(F.sum("v"), 6)).collect()[0]
    assert tuple(a) == tuple(b)


def test_compact_sorted_keeps_stats_tight(spark, tmp_path):
    import pyarrow.parquet as pq
    from clarite_python_spark.operators.layout import compact

    src = str(tmp_path / "frag")
    spark.range(1_000_000).withColumn(
        "k", (F.col("id") * 7919 % 100_000).cast("long")
    ).repartition(32).write.parquet(src)
    out = str(tmp_path / "sorted")
    # ~9 MB of data at 1 MB/file -> ~9 range-partitioned files
    compact(spark, src, out, target_file_mb=1, sort_by=["k"])
    # every compacted file's k-range must be narrow (clustered), unlike
    # the source where each file spans ~the full domain
    import os

    spans = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(names["k"]).statistics
            if st is None or not st.has_min_max:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append(max(maxs) - min(mins))
    assert spans and sum(spans) / len(spans) < 100_000 / 3


def test_compact_validation(spark, tmp_path):
    from clarite_python_spark.operators.layout import compact

    src = str(tmp_path / "x")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="in place"):
        compact(spark, src, src)
    with pytest.raises(ValueError, match="target_file_mb"):
        compact(spark, src, src + "2", target_file_mb=0)


def test_dataset_stats_sees_partitioned_files(spark, tmp_path):
    from clarite_python_spark.operators.layout import dataset_stats

    src = str(tmp_path / "part")
    spark.range(1000).withColumn("p", F.col("id") % 3).write.partitionBy("p").parquet(src)
    st = dataset_stats(src)
    assert st["n_files"] >= 3 and st["n_rows"] == 1000
