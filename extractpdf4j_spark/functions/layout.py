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

__all__ = ["zvalue", "quantize_minmax", "zorder_files", "zorder_layout"]


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
