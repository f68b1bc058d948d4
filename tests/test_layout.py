"""Z-order layout: interleave correctness on known bit patterns, and
the pruning payoff itself — file-stat overlap under a second-key
predicate, z-ordered vs single-key-sorted, same data and file count."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def test_zvalue_interleave_known_bits(spark):
    from openai_vector_search_demo_spark.operators.layout import zvalue_expr
    cases = [((0, 0), 0), ((1, 0), 1), ((0, 1), 2), ((1, 1), 3),
             ((2, 0), 4), ((0, 2), 8), ((3, 3), 15)]
    df = spark.createDataFrame([(a, b) for (a, b), _ in cases],
                               "x long, y long")
    z = df.select("x", "y", zvalue_expr(
        [F.col("x"), F.col("y")], bits=2).alias("z")).collect()
    got = {(r.x, r.y): r.z for r in z}
    assert got == {k: v for k, v in cases}


def test_zvalue_overflow_guard(spark):
    from openai_vector_search_demo_spark.operators.layout import zvalue_expr
    with pytest.raises(ValueError):
        zvalue_expr([F.lit(0), F.lit(0)], bits=32)  # 64 > 62 bits


def test_constant_column_scales_to_zero(spark):
    from openai_vector_search_demo_spark.operators.layout import with_zvalue
    df = spark.createDataFrame([(7, i) for i in range(4)], "c long, x long")
    rows = with_zvalue(df, ["c", "x"], bits=4).collect()
    # constant col contributes nothing: z == interleave(0, scaled_x)
    assert all(r.zkey % 2 == 0 for r in rows)  # bit 0 (col c) never set


def _file_overlap_count(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] stats overlap [lo,hi], total files)."""
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins and not (max(maxs) < lo or min(mins) > hi):
            hit += 1
    return hit, len(files)


def test_zorder_prunes_second_key(spark, tmp_path):
    """The layout claim itself: with files range-partitioned on
    l_partkey alone, a selective l_suppkey predicate overlaps ~every
    file; z-ordered on (partkey, suppkey) it overlaps a fraction."""
    from openai_vector_search_demo_spark.operators.layout import zorder_write

    li = (spark.read.parquet(os.path.join(SF0001, "lineitem.parquet"))
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"))
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey")
     .write.mode("overwrite").parquet(linear))
    zorder_write(li, zord, ["l_partkey", "l_suppkey"], num_files=8)

    smin, smax = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    mid = (smin + smax) // 2
    band = max(1, (smax - smin) // 16)
    lo, hi = mid - band, mid + band

    lin_hit, lin_n = _file_overlap_count(linear, "l_suppkey", lo, hi)
    z_hit, z_n = _file_overlap_count(zord, "l_suppkey", lo, hi)
    assert lin_n == 8 and z_n == 8
    # partkey-sorted layout can't skip on suppkey; the z-order can
    assert lin_hit == 8
    assert z_hit < lin_hit

    # and the layouts are lossless: same filtered rows from both
    pred = (F.col("l_suppkey") >= lo) & (F.col("l_suppkey") <= hi)
    key = ["l_orderkey", "l_partkey", "l_suppkey"]
    a = sorted(map(tuple, spark.read.parquet(linear).where(pred)
                   .select(*key).collect()))
    b = sorted(map(tuple, spark.read.parquet(zord).where(pred)
                   .select(*key).collect()))
    c = sorted(map(tuple, li.where(pred).select(*key).collect()))
    assert a == b == c
