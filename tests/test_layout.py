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


def test_compact_plan_exact_boundaries(spark):
    from extractpdf4j_spark.functions.layout import compact_plan
    files = spark.createDataFrame(
        [(f"f{i}", 40) for i in range(10)], ["path", "bytes"])
    plan = compact_plan(files, target_bytes=100, n_buckets=2).collect()
    # replay: same (bucket, h60, path) order, cum_before // 100
    import hashlib
    rows = sorted(
        ((int(hashlib.md5(r["path"].encode()).hexdigest()[:15], 16) % 2,
          int(hashlib.md5(r["path"].encode()).hexdigest()[:15], 16),
          r["path"]), r) for r in plan)
    cum = 0
    for (_, _, _), r in rows:
        assert r["group"] == cum // 100, r
        cum += r["bytes"]
    # every group holds <= ceil plus the straddling file: with 40-byte
    # files on a 100 target, groups carry 2-3 files
    from collections import Counter
    per = Counter(r["group"] for r in plan)
    assert all(1 <= n <= 3 for n in per.values())


def test_compact_dataset_round_trip(spark, tmp_path):
    from extractpdf4j_spark.functions.layout import compact_dataset
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    df.repartition(16).write.parquet(src)          # 16 small files
    summary = compact_dataset(spark, src, dst, target_bytes=1 << 20)
    assert summary["n_input_files"] == 16
    assert 1 <= summary["n_groups"] < 16           # fewer, bigger files
    back = spark.read.parquet(dst)
    assert back.count() == 2000
    assert back.agg(F.sum("id")).collect()[0][0] == 2000 * 1999 // 2
    import os
    part_files = [f for root, _, fs in os.walk(dst)
                  for f in fs if f.endswith(".parquet")]
    assert len(part_files) == summary["n_groups"]  # ONE file per group


def test_compact_dataset_relative_and_encoded_paths(spark, tmp_path):
    """ADVICE r4: a relative in_dir and a directory with a space (which
    input_file_name() percent-encodes) must not silently drop rows —
    the basename mapping + raise_error guard + footer-count check make
    a mapping miss impossible or loud."""
    import os
    from extractpdf4j_spark.functions.layout import compact_dataset
    src_abs = tmp_path / "sp ace dir" / "src"
    dst = str(tmp_path / "dst2")
    df = spark.range(500).select(F.col("id"))
    df.repartition(4).write.parquet(str(src_abs))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        summary = compact_dataset(spark, "sp ace dir/src", dst,
                                  target_bytes=1 << 20)
    finally:
        os.chdir(cwd)
    assert summary["n_input_files"] == 4
    assert summary["n_rows"] == 500
    back = spark.read.parquet(dst)
    assert back.count() == 500
    assert back.agg(F.sum("id")).collect()[0][0] == 500 * 499 // 2


def _plan_of(df):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_layout_plan_shapes(spark):
    """100 TB shapes: quantize's only exchange is the O(1) stats
    broadcast (never a corpus shuffle); the production writer's single
    corpus exchange is the z-value range partitioning."""
    df = spark.range(0, 1000).selectExpr("id", "id % 97 AS x",
                                         "id % 89 AS y")
    q = _plan_of(quantize_minmax(df, ["x", "y"], bits=8))
    assert "BroadcastExchange" in q
    assert "SortMergeJoin" not in q
    # no corpus-wide repartitioning in the quantize step
    assert "Exchange hashpartitioning(x" not in q

    p = _plan_of(zorder_layout(df, ["x", "y"], 8, bits=8))
    assert "rangepartitioning(zval" in p.replace("RANGE", "range")


def test_rp_and_audit_plan_shapes(spark):
    """rp_project is one mapInPandas pass and embedding_audit a pure
    projection — neither may exchange the corpus."""
    from extractpdf4j_spark.functions.similarity import (
        embedding_audit, rp_project)
    emb = spark.range(0, 64).selectExpr(
        "id AS vec_id",
        "array(CAST(id AS DOUBLE), CAST(id + 1 AS DOUBLE), "
        "CAST(id + 2 AS DOUBLE), CAST(id + 3 AS DOUBLE)) AS embedding")
    rp = _plan_of(rp_project(emb, out_dim=2, dim=4))
    assert "Exchange" not in rp
    assert "ArrowEvalPython" in rp or "MapInPandas" in rp
    au = _plan_of(embedding_audit(emb, dim=4))
    assert "Exchange" not in au
    assert "MapInPandas" not in au        # stays a JVM projection
