"""Mergeable sketch operators for corpus-scale statistics.

At 100 TB the interesting corpus statistics (distinct URLs, distinct
users, distinct shingles per shard) cannot be computed with
``count(DISTINCT ...)`` — the distinct set itself is the bottleneck.
The standard answer is a mergeable sketch: a tiny fixed-size state
per group that a map-side-combined aggregation builds in one pass and
that unions across shards/days by a cheap element-wise merge.

This module implements HyperLogLog (Flajolet et al. 2007) for distinct
counts and Count-Min (Cormode & Muthukrishnan 2005) for approximate
frequencies, both as plain DataFrame aggregations — no UDF, no UDAF,
no driver state:

* ``hll_registers``  — one ``groupBy(keys, bucket).max(rho)`` builds the
  register table (at most ``2**p`` rows per key, independent of input
  size — THE property that makes it work at 100 TB).
* ``hll_merge``      — union + the same max; registers are
  max-mergeable, so daily/shard sketches fold into totals without
  touching raw data again.
* ``hll_estimate``   — the estimator with the standard small-range
  linear-counting correction.
* ``hll_count_distinct`` — build + estimate composed.

Spark ships ``approx_count_distinct`` (also HLL) — this implementation
exists because (a) the register TABLE is the operator here (persist it,
merge it later, ship it between jobs), which Spark's aggregate never
exposes, and (b) every bit is deterministic and engine-portable: the
hash is the repo-wide 60-bit md5 (`dedup._hash60`), rho comes from
``length(bin(w))`` (both engines return the minimal binary string), and
the register sum is integer-scaled (``shiftleft(1, K - register)``)
so the DuckDB oracle reproduces the estimate exactly — no float-sum
order dependence anywhere.

Determinism notes (mirrored by SQL_HLL in entry_queries):
* bucket = h % m, w = h >> p on the 60-bit hash; rho = (60-p) -
  (length(bin(w)) - 1) for w > 0 else (60-p) + 1.
* S = sum(2^(K - register)) + V * 2^K as BIGINT (K = 61 - p; max term
  2^61, max sum < 2^62 — no overflow for p >= 1).
* raw = alpha * 2^(p+61) / S with alpha and 2^(p+61) inlined as double
  literals; the long->double conversion of S rounds nearest in both
  engines.
* linear counting when raw <= 2.5*m and V > 0: m * ln(m / V).

Reference parity anchor: the reference has no sketch operators (its
tables are single-PDF sized); this extends the engine the way its
scoring/aggregation layer (HybridParser.java:275-322) would have to be
extended for corpus-scale reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _hash60


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_bucket_rho(value, p: int):
    """(bucket, rho) column expressions for one value column — the
    per-row projection both the batch register build and the streaming
    windowed sketch share, so their registers are bit-identical."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    width = 60 - p
    h = _hash60(value.cast("string"))
    w = F.shiftright(h, p)
    rho = (F.when(w == 0, F.lit(width + 1))
           .otherwise(F.lit(width) - (F.length(F.bin(w)) - F.lit(1))))
    return F.pmod(h, F.lit(m)).cast("int"), rho.cast("int")


def hll_registers(df: DataFrame, value_col: str, key_cols=(),
                  p: int = 12) -> DataFrame:
    """Per-key HLL register table: (keys..., bucket int, register int),
    only buckets that saw at least one value (absent bucket == register
    0). One map-side-combined max aggregation; output is at most 2**p
    rows per key regardless of input size."""
    bucket, rho = hll_bucket_rho(F.col(value_col), p)
    keys = [F.col(k) for k in key_cols]
    return (df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*key_cols, "bucket")
            .agg(F.max("rho").alias("register")))


def hll_merge(a: DataFrame, b: DataFrame, key_cols=()) -> DataFrame:
    """Merge two register tables (same p): element-wise max. Exact:
    merge(registers(X), registers(Y)) == registers(X union Y)."""
    return (a.unionByName(b)
            .groupBy(*key_cols, "bucket")
            .agg(F.max("register").alias("register")))


def hll_estimate(regs: DataFrame, key_cols=(), p: int = 12) -> DataFrame:
    """Estimate per-key distinct counts from a register table:
    (keys..., est_distinct double). Integer-exact register sum, then
    one double expression evaluated in a fixed operand order."""
    m = 1 << p
    k_exp = 61 - p  # max rho is (60-p)+1 = K; term for register r is 2^(K-r)
    alpha = _alpha(m)
    numer = alpha * float(2 ** (p + 61))  # alpha * m^2 * 2^K, exact scale
    agg = regs.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("nz"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_exp} - register)"))
         .alias("s_nz"))
    v = (F.lit(m).cast("long") - F.col("nz"))
    s = (F.col("s_nz") + v * F.lit(1 << k_exp).cast("long"))
    raw = F.lit(numer) / s.cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
                 ).otherwise(raw)
    return agg.select(*key_cols, est.alias("est_distinct"))


def hll_count_distinct(df: DataFrame, value_col: str, key_cols=(),
                       p: int = 12) -> DataFrame:
    """Build registers and estimate in one lineage: (keys...,
    est_distinct). The full pipeline is scan -> one partial-max shuffle
    of <= 2**p rows per key -> one tiny final aggregation."""
    return hll_estimate(hll_registers(df, value_col, key_cols, p),
                        key_cols, p)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable approximate
# frequency table. Everything is integer arithmetic — estimates are exact
# cross-engine, and est >= true count always (one-sided error).
# ---------------------------------------------------------------------------

def _cms_cell(row_col, value_col, width: int):
    """Cell column for one (hash row, value): the repo-wide 60-bit md5
    of 'row:value' mod width. Depth-many independent hash rows come from
    the row index salt, the same construction as MinHash's per-component
    salting (dedup.py)."""
    return F.pmod(_hash60(F.concat(row_col.cast("string"), F.lit(":"),
                                   value_col)), F.lit(width))


def cms_build(df: DataFrame, value_col: str, key_cols=(),
              depth: int = 4, width: int = 1024,
              weight_col: str | None = None) -> DataFrame:
    """Per-key Count-Min sketch: (keys..., row int, col int, cnt long),
    only non-empty cells (absent cell == 0). One explode(depth) + one
    map-side-combined sum; output is at most depth*width rows per key
    regardless of input size. ``weight_col`` counts each input row by a
    long weight (e.g. pre-aggregated token counts) instead of 1."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth >= 1 and width >= 1, "
                         f"got {depth}x{width}")
    w = (F.col(weight_col).cast("long") if weight_col else
         F.lit(1).cast("long"))
    rows = df.select(*[F.col(k) for k in key_cols],
                     F.col(value_col).cast("string").alias("_v"),
                     w.alias("_w"),
                     F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
                      .alias("row"))
    return (rows.select(*key_cols, "row",
                        _cms_cell(F.col("row"), F.col("_v"), width)
                        .cast("int").alias("col"),
                        F.col("_w"))
            .groupBy(*key_cols, "row", "col")
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame, key_cols=()) -> DataFrame:
    """Merge two sketches (same depth/width): element-wise sum. Exact:
    merge(cms(X), cms(Y)) == cms(X union Y)."""
    return (a.unionByName(b)
            .groupBy(*key_cols, "row", "col")
            .agg(F.sum("cnt").alias("cnt")))


def cms_join_size(a: DataFrame, b: DataFrame, depth: int,
                  key_cols=()) -> DataFrame:
    """Join-cardinality estimate from two sketches built with the SAME
    depth/width over the two join columns: (keys..., est_join_size
    long). The classic CMS inner product — est = min over the depth
    rows of sum_col(cnt_a * cnt_b) — upper-bounds the true equi-join
    row count |{(x, y) : a.v = b.v}| (collisions only ever add), and
    lets a pipeline decide join strategies from two tiny sketch tables
    without touching the 100 TB inputs. A hash row with no overlapping
    cells proves the join is empty, so missing rows clamp the estimate
    to 0."""
    prod = (a.select(*key_cols, "row", "col",
                     F.col("cnt").alias("_ca"))
            .join(b.select(*key_cols, "row", "col",
                           F.col("cnt").alias("_cb")),
                  [*key_cols, "row", "col"])
            .groupBy(*key_cols, "row")
            .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot")))
    return (prod.groupBy(*key_cols)
            .agg(F.when(F.count("*") < depth, F.lit(0).cast("long"))
                 .otherwise(F.min("_dot")).alias("est_join_size")))


def cms_query(sketch: DataFrame, items: DataFrame, value_col: str,
              key_cols=(), depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-frequency estimates for every row of ``items``: (keys...,
    value_col, est_count long). est = min over the depth rows of the
    addressed cell (missing cell = 0); always >= the true count. The
    sketch side is depth*width rows per key — broadcast it; the items
    side never shuffles."""
    probes = (items.select(*[F.col(k) for k in key_cols],
                           F.col(value_col).cast("string")
                           .alias(value_col))
              .withColumn("row", F.explode(F.sequence(F.lit(0),
                                                      F.lit(depth - 1))))
              .withColumn("col", _cms_cell(F.col("row"), F.col(value_col),
                                           width).cast("int")))
    joined = probes.join(F.broadcast(sketch), [*key_cols, "row", "col"],
                         "left")
    return (joined.groupBy(*key_cols, value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est_count")))


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch-style log buckets, integer-exact)
# ---------------------------------------------------------------------------

QHIST_MANT = 32  # sub-buckets per power of two (~3.1% relative error)


def _qhist_staged(base: DataFrame) -> DataFrame:
    """Stage the bucket columns for a frame carrying ``_v`` (long):
    _bl = bit length, _mant = which of the 32 equal sub-ranges of
    [2^(_bl-1), 2^_bl) holds _v, _lo = the sub-range's lower bound
    (the sketch's representative — a deterministic underestimate
    within 3.1% relative error). All integer arithmetic:
    length(bin(v)) + shiftleft + integer DIV — identical in Spark and
    DuckDB, no log() knife-edge anywhere. Values < 1 pool into the
    (0, 0, lo=0) underflow bucket. For _bl <= 5 the sub-ranges are
    singletons, so small values are EXACT."""
    return (base
            .withColumn("_bl", F.when(F.col("_v") >= 1,
                                      F.length(F.bin("_v")))
                        .otherwise(F.lit(0)))
            .withColumn("_denom", F.expr(
                "shiftleft(CAST(1 AS BIGINT), greatest(_bl - 1, 0))"))
            .withColumn("_step", F.expr(f"_denom DIV {QHIST_MANT}"))
            .withColumn("_mant", F.when(F.col("_bl") == 0,
                                        F.lit(0).cast("long"))
                        .when(F.col("_bl") <= 5,
                              F.col("_v") - F.col("_denom"))
                        .otherwise(F.expr("(_v - _denom) DIV _step")))
            .withColumn("_lo", F.when(F.col("_bl") == 0,
                                      F.lit(0).cast("long"))
                        .when(F.col("_bl") <= 5, F.col("_v"))
                        .otherwise(F.col("_denom")
                                   + F.col("_mant") * F.col("_step"))))


def qhist_build(df: DataFrame, value_col: str, key_cols=()) -> DataFrame:
    """Per-key mergeable quantile sketch: (keys..., bl int, mant long,
    lo long, cnt long) — at most 64*32 non-empty buckets per key
    regardless of input size. The quantile triad's third member next
    to the HLL registers (distinct) and CMS cells (frequency): where
    group_quantiles is exact but carries the full value histogram,
    this caps state at ~2k rows per key with <= 3.1% relative error —
    the artifact you persist per shard/window and fold with
    :func:`qhist_merge` (exact merge). One map-side-combined
    aggregation; bucketing is a pure integer codegen projection
    (length(bin(v)) + shift + integer division — engine-exact, no
    float log anywhere, the repo's knife-edge rule)."""
    keys = list(key_cols)
    v = F.col(value_col).cast("long")
    staged = _qhist_staged(df.select(*keys, v.alias("_v")))
    return (staged.groupBy(*keys, F.col("_bl").alias("bl"),
                           F.col("_mant").cast("long").alias("mant"),
                           F.col("_lo").alias("lo"))
            .agg(F.count("*").cast("long").alias("cnt")))


def qhist_merge(a: DataFrame, b: DataFrame, key_cols=()) -> DataFrame:
    """Merge two quantile sketches: element-wise sum. Exact:
    merge(qhist(X), qhist(Y)) == qhist(X union Y)."""
    return (a.unionByName(b)
            .groupBy(*key_cols, "bl", "mant", "lo")
            .agg(F.sum("cnt").alias("cnt")))


def qhist_quantiles(sketch: DataFrame, key_cols=(),
                    quantiles_bp=(2500, 5000, 7500, 9500)) -> DataFrame:
    """percentile_disc over the sketch: for each quantile (basis
    points), the LO of the smallest bucket whose cumulative count
    reaches it — (keys..., q_bp long, quantile long), within one
    sub-bucket (<= 3.1% relative) of the exact answer. Integer pick
    gate ``cum * 10000 >= q_bp * total`` (no float knife-edge), same
    as statsops.group_quantiles; windows run over the <= 2k-row
    sketch, never raw data."""
    for q in quantiles_bp:
        if not 0 < q <= 10000:
            raise ValueError(f"quantile {q} not in (0, 10000] basis points")
    keys = list(key_cols)
    w_cum = (Window.partitionBy(*keys).orderBy("bl", "mant")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(*keys)
    probe = (sketch
             .withColumn("_cum", F.sum("cnt").over(w_cum))
             .withColumn("_tot", F.sum("cnt").over(w_tot))
             .withColumn("q_bp", F.explode(F.array(
                 *[F.lit(q).cast("long") for q in quantiles_bp]))))
    return (probe
            .filter(F.col("_cum") * 10000 >= F.col("q_bp") * F.col("_tot"))
            .groupBy(*keys, "q_bp")
            .agg(F.min("lo").alias("quantile")))
