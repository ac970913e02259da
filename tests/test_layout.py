"""Z-order layout (functions/layout.py): Morton-code correctness vs a
scalar reference, the pruning payoff it exists for, and the production
range-partitioned writer's disjointness guarantee."""

import pytest
from pyspark.sql import Window, functions as F

from extractpdf4j_spark.functions.layout import (
    quantize_minmax, zorder_files, zorder_layout, zvalue)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_scalar_morton(spark):
    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 99, 255)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.withColumn("z", zvalue(["x", "y"], bits=8))
                      .collect()}
    for x, y in pts:
        assert got[(x, y)] == _morton2(x, y, 8), (x, y)


def test_zvalue_rejects_long_overflow(spark):
    with pytest.raises(ValueError):
        zvalue(["a", "b", "c", "d"], bits=16)          # 64 bits


def test_quantize_minmax_exact_integer_buckets(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v: long")
    q = quantize_minmax(df, ["v"], bits=2).collect()   # 4 buckets of 25
    for r in q:
        assert r["v_q"] == (r["v"] * 4) // 100


def test_zorder_files_prunes_both_dims(spark):
    # 32x32 grid: a linear x-sort gives files whose y-range spans the
    # whole domain; the z-order layout must tighten BOTH dimensions.
    pts = [(i, i % 32, i // 32) for i in range(1024)]
    df = spark.createDataFrame(pts, "id: long, x: long, y: long")
    z = zorder_files(df, ["x", "y"], n_files=16, id_col="id", bits=5)
    stats = (z.groupBy("file_id")
             .agg((F.max("x_q") - F.min("x_q")).alias("xs"),
                  (F.max("y_q") - F.min("y_q")).alias("ys"))
             .collect())
    assert len(stats) == 16
    # 1024 rows / 16 files = 64 rows = one 8x8 z-quad: span 7 in each dim
    for r in stats:
        assert r["xs"] <= 7 and r["ys"] <= 7, dict(r.asDict())
    # the x-sorted baseline: every file's y-span is the full 31
    lin = (df.withColumn(
               "file_id",
               F.ntile(16).over(Window.orderBy("x", "id")))
           .groupBy("file_id")
           .agg((F.max("y") - F.min("y")).alias("ys")).collect())
    assert all(r["ys"] == 31 for r in lin)


def test_zorder_layout_partitions_disjoint(spark):
    pts = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(512)]
    df = spark.createDataFrame(pts, "id: long, x: long, y: long")
    out = zorder_layout(df, ["x", "y"], n_files=4, bits=6)
    ranges = (out.withColumn("pid", F.spark_partition_id())
              .groupBy("pid")
              .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"),
                   F.count("*").alias("n"))
              .orderBy("lo").collect())
    assert sum(r["n"] for r in ranges) == 512
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] <= b["lo"], (a, b)      # disjoint z-ranges
