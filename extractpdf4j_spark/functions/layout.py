"""Data-layout optimization: z-order (Morton) clustering so written
files carry TIGHT min/max column statistics on SEVERAL columns at once.

Why this is a first-class 100 TB operator: Spark/parquet scan pruning
is driven by per-file (and per-row-group) min/max stats. A corpus
sorted by one column prunes perfectly on that column and not at all on
any other; interleaving the bits of k quantized columns into a single
Morton code and range-partitioning on it gives every output file a
compact hyper-rectangle in all k dimensions — the same technique as
Delta/Iceberg ``OPTIMIZE ZORDER BY``, expressed here as plain codegen
column arithmetic so it works on any DataFrame before any sink.

Pipeline use: ``zorder_layout(df, ["domain_bucket", "quality_bucket"])``
before the training-shard write lets downstream readers that filter on
either column (or both) skip most files.

Everything is exact integer math (quantization is ``div`` on longs,
the code is a 2*bits-term shift/mask sum), so the DuckDB oracle can
replay it verbatim; only the gate's ntile file assignment needs the
usual explicit-id tie-break.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["zvalue", "quantize_minmax", "zorder_files", "zorder_layout",
           "compact_plan", "compact_dataset"]


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    Bit ``b`` of input column ``i`` lands at output bit
    ``b * len(cols) + i``, so equal-prefix z-values share a prefix in
    EVERY dimension. Inputs must already be non-negative ints below
    ``2**bits`` (see :func:`quantize_minmax`). ``len(cols) * bits``
    must stay < 63 to fit a long. The expression is ``len(cols) *
    bits`` shift/mask terms — well under the codegen method limit
    (the repo's measured ceiling is ~512 terms).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a long")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i)
        for b in range(bits)
        for i, c in enumerate(cs)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def quantize_minmax(df: DataFrame, cols: list[str],
                    bits: int = 16) -> DataFrame:
    """Bucket each column into ``[0, 2**bits)`` by its global min/max:
    ``(x - min) * 2**bits div (max - min + 1)`` on longs — exact
    integer arithmetic (no double division, so no 2^53 drift between
    engines; cf. ADVICE round-3 on pack_shards). Adds ``<col>_q``
    columns. One 1-row global aggregate, broadcast-joined — the only
    exchange this op introduces, and it is O(1)-sized.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"_mn_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"_mx_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    scale = 1 << bits
    for c in cols:
        out = out.withColumn(f"{c}_q", F.expr(
            f"((CAST({c} AS BIGINT) - _mn_{c}) * {scale}) "
            f"div (_mx_{c} - _mn_{c} + 1)"))
    return out.drop(*[f"_mn_{c}" for c in cols],
                    *[f"_mx_{c}" for c in cols])


def zorder_files(df: DataFrame, cols: list[str], n_files: int,
                 id_col: str, bits: int = 16) -> DataFrame:
    """DETERMINISTIC z-order file assignment (the gate/report path):
    quantize, Morton-code, then ``ntile(n_files)`` over
    ``(zval, id_col)`` — the explicit tie-break keeps Spark and DuckDB
    assignments identical (verified ntile parity, CLAUDE.md). Returns
    the input plus ``<col>_q``, ``zval`` and ``file_id``.

    This path global-sorts (one range exchange) — correct at any scale
    but the production writer below avoids materializing the rank.
    """
    q = quantize_minmax(df, cols, bits)
    z = q.withColumn("zval", zvalue([f"{c}_q" for c in cols], bits))
    w = Window.orderBy("zval", id_col)
    return z.withColumn("file_id", F.ntile(n_files).over(w).cast("long"))


def zorder_layout(df: DataFrame, cols: list[str], n_files: int,
                  bits: int = 16) -> DataFrame:
    """Production write path: ``repartitionByRange(n_files, zval)`` +
    ``sortWithinPartitions(zval)`` — sampled range boundaries (no
    global sort, no row_number materialization), disjoint z-ranges per
    output task, ready for ``.write.parquet``. Boundaries are sampled,
    so file populations are approximate — use :func:`zorder_files`
    when the assignment itself must be reproducible.
    """
    q = quantize_minmax(df, cols, bits)
    z = q.withColumn("zval", zvalue([f"{c}_q" for c in cols], bits))
    return (z.repartitionByRange(n_files, "zval")
            .sortWithinPartitions("zval"))


def compact_plan(files: DataFrame, target_bytes: int,
                 path_col: str = "path", bytes_col: str = "bytes",
                 n_buckets: int = 4) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE-compaction half next
    to the z-order clustering half): assign every input file to an
    output group of ~``target_bytes``.

    The file-stats table is laid out as one virtual byte stream in the
    deterministic global order ``(bucket, 60-bit path hash, path)`` and
    cut at exact ``target_bytes`` boundaries: ``group = cum_before div
    target`` on longs (pack_shards' integer boundary — no double
    division, no 2^53 drift). A file larger than ``target_bytes``
    simply owns its group(s) alone; following files skip group ids.

    Scale shape: the input here is METADATA — one row per file, ~800k
    rows for 100 TB at 128 MB files — but the prefix sum still uses the
    repo's two-level construction (per-bucket windows + a broadcast
    ``n_buckets``-row offset table), so no stage ever orders more than
    one bucket's rows. Returns the input plus (bucket, group), all
    longs.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from .dedup import _hash60
    h = _hash60(F.col(path_col).cast("string"))
    with_b = (files.withColumn("_h", h)
              .withColumn("bucket", (F.col("_h") % n_buckets).cast("long")))
    w = (Window.partitionBy("bucket")
         .orderBy(F.col("_h").asc(), F.col(path_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_in_bucket = (F.sum(F.col(bytes_col)).over(w)
                     - F.col(bytes_col)).cast("long")
    bw = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (with_b.groupBy("bucket")
               .agg(F.sum(bytes_col).cast("long").alias("_btot"))
               .withColumn("_boff",
                           F.coalesce(F.sum("_btot").over(bw),
                                      F.lit(0)).cast("long"))
               .select("bucket", "_boff"))
    return (with_b
            .withColumn("_cib", cum_in_bucket)
            .join(F.broadcast(offsets), "bucket")
            .withColumn("_cum", (F.col("_boff") + F.col("_cib")))
            .withColumn("group",
                        F.expr(f"_cum div {int(target_bytes)}")
                        .cast("long"))
            .drop("_h", "_cib", "_boff", "_cum"))


def compact_dataset(spark, in_dir: str, out_dir: str, target_bytes: int,
                    n_buckets: int = 4) -> dict:
    """Execute a compaction: list ``in_dir``'s parquet part files, plan
    groups with :func:`compact_plan`, rewrite to ``out_dir`` with ONE
    file per group (``out_dir/_grp=N/part-*.parquet``).

    The rewrite is a single distributed job: rows pick up their file's
    group via a broadcast join on ``input_file_name()``, then
    ``repartition("_grp")`` puts each group wholly in one task and
    ``partitionBy("_grp")`` writes it as one file — hash collisions
    between groups cost parallelism, never correctness or extra files.

    Listing uses the local filesystem (the sandbox's storage); on an
    object store swap the listing for the catalog/manifest query — the
    plan and rewrite are storage-agnostic. Returns
    ``{"n_input_files", "n_groups", "total_bytes"}``.
    """
    import os
    # resolve relative paths PYTHON-side: the JVM resolves a relative
    # URI against its own launch cwd, which need not match os.getcwd()
    in_dir = os.path.abspath(in_dir)
    out_dir = os.path.abspath(out_dir)
    stats = sorted(
        (os.path.abspath(e.path), e.stat().st_size)
        for e in os.scandir(in_dir)
        if e.is_file() and e.name.endswith(".parquet"))
    if not stats:
        raise ValueError(f"no parquet part files under {in_dir}")
    files = spark.createDataFrame(stats, ["path", "bytes"])
    plan = compact_plan(files, target_bytes, n_buckets=n_buckets)
    # Rows are matched to their plan group by part-file BASENAME, not
    # full URI: input_file_name() reports a percent-encoded file:// URI
    # whose scheme/encoding never round-trips reliably against an
    # os.scandir path (relative in_dir, spaces, '#', non-ASCII all
    # break a concat('file://', path) equality). Part names are unique
    # within a dataset (part-NNNNN-<uuid>), so the basename is a safe
    # key; '+' is re-escaped before url_decode because URLDecoder turns
    # a literal '+' into a space while Hadoop's URI keeps it verbatim.
    mapping = plan.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("_name"),
        F.col("group").alias("_grp"))
    raw_name = F.element_at(F.split(F.col("_uri"), "/"), -1)
    dec_name = F.coalesce(
        F.expr(r"try_url_decode(regexp_replace(_raw, '\\+', '%2B'))"),
        F.col("_raw"))
    df = (spark.read.parquet(in_dir)
          .withColumn("_uri", F.input_file_name())
          .withColumn("_raw", raw_name)
          .withColumn("_name", dec_name)
          .join(F.broadcast(mapping), "_name", "left")
          # a join miss must fail the JOB, not silently misplace rows:
          # raise_error fires per-row only on the null-_grp branch
          .withColumn("_grp", F.coalesce(
              F.col("_grp"),
              F.expr("cast(raise_error(concat('compact_dataset: part "
                     "file not in plan: ', _raw)) as bigint)")))
          .drop("_uri", "_raw", "_name"))
    (df.repartition("_grp")
     .write.mode("overwrite").partitionBy("_grp").parquet(out_dir))
    # The summary must describe the WRITTEN data, not the plan. Both
    # counts are parquet-footer metadata reads — no data scan even at
    # 100 TB — and double-check the raise_error guard end to end.
    n_in = spark.read.parquet(in_dir).count()
    n_out = spark.read.parquet(out_dir).count()
    if n_out != n_in:
        raise RuntimeError(
            f"compact_dataset wrote {n_out} rows but input has {n_in}: "
            f"file→group mapping missed part files under {in_dir}")
    agg = plan.agg(F.countDistinct("group").alias("g"),
                   F.sum("bytes").alias("b")).collect()[0]
    return {"n_input_files": len(stats), "n_groups": int(agg["g"]),
            "total_bytes": int(agg["b"]), "n_rows": int(n_out)}
