"""Distributed temporal/spatial join operators.

The reference's only joins are page-local point-in-interval lookups done
with ``np.searchsorted`` inside the kernels (SURVEY.md §2.6 — glyph→column
``StreamParser.java:131-137``, glyph→cell ``LatticeParser.java:141-156``,
word→column ``OcrStreamParser.java:392-395``). At corpus scale the same
shapes appear BETWEEN tables (events to reference series, coordinates to
region sets), where Spark lacks native as-of / range joins. These are the
Spark-first formulations:

* ``as_of_join`` — one shuffle, no join explosion: union both sides, one
  window pass carrying the last right-side row forward (the standard
  scalable as-of pattern; an equi-join + filter would explode, a range
  join condition would fall back to broadcast-nested-loop).
* ``interval_point_join`` — bucketed equi-join: intervals explode to the
  coarse buckets they cover, points hash to one bucket, the exact
  containment predicate filters after the equi-join. Never a cartesian
  product; shuffle volume is O(points + intervals · avg_span/bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str = "ts", right_ts: str = "ts",
               right_cols: tuple[str, ...] = ()) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same ``key`` (inclusive, LEFT-join
    semantics: unmatched left rows keep nulls).

    Physical plan: tag and union the two inputs, hash-shuffle ONCE on
    ``key``, then ``last(value, ignorenulls)`` over an unbounded-preceding
    window ordered by (ts, right-first-at-ties). Right rows sort before
    left rows at equal timestamps, which is what makes the match
    inclusive. Cost is one exchange + one sort — no row explosion, no
    broadcast-nested-loop, skew bounded by the hottest key (salt the key
    upstream if one entity dominates).

    ``right_cols`` are the right-side payload columns to carry; each
    appears in the output as ``asof_<name>``.

    Caller columns may not collide with the internal/output names
    (``_ts``, ``_right``, ``_lrow``, ``_r_*``, ``asof_*``) — validated
    below. When multiple right rows share ``(key, right_ts)``, which one
    is carried is tie-broken deterministically by the payload values
    (max-last within the tie group); pre-aggregate the right side to one
    row per ``(key, ts)`` if a specific reduction is wanted.
    """
    payload = list(right_cols)
    reserved = {"_ts", "_right", "_lrow"}
    reserved |= {f"_r_{c}" for c in payload}
    reserved |= {f"asof_{c}" for c in payload}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"as_of_join: input columns collide with reserved internal "
            f"names: {sorted(clash)} — rename them before joining")
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(0).alias("_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload])
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(1).alias("_right"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in payload])
    u = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy(key)
         # payload columns as trailing sort keys: right rows tied on
         # (key, ts) resolve deterministically (max payload carried)
         # instead of by shuffle arrival order
         .orderBy(F.col("_ts"), F.col("_right").desc(),
                  *[F.col(f"_r_{c}") for c in payload])
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in payload:
        u = u.withColumn(f"asof_{c}",
                         F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    return (u.filter(F.col("_right") == 0)
            .select(F.col("_lrow.*"),
                    *[F.col(f"asof_{c}") for c in payload]))


def interval_point_join(points: DataFrame, intervals: DataFrame,
                        point_col: str, lo_col: str, hi_col: str,
                        bucket_width: float,
                        max_buckets: int = 10_000) -> DataFrame:
    """Inclusive point-in-interval join (``lo <= x <= hi``) as a bucketed
    equi-join: every interval is exploded to the coarse buckets it
    covers, every point hashes to exactly one bucket, and the exact
    predicate filters after the bucket equi-join.

    ``bucket_width`` trades shuffle volume (intervals replicate once per
    covered bucket) against filter selectivity — set it near the median
    interval span. Long intervals replicate proportionally;
    ``max_buckets`` fails fast (executor-side RAISE_ERROR) on any
    interval spanning more than that many buckets — one malformed or
    huge interval would otherwise generate millions of bucket rows or
    hit Spark's sequence-length limit mid-shuffle. Clamp or split such
    outliers upstream, or raise the guard deliberately. Output columns =
    point columns + interval columns.
    """
    b = float(bucket_width)
    lo_b = F.floor(F.col(lo_col) / b).cast("long")
    hi_b = F.floor(F.col(hi_col) / b).cast("long")
    n_b = hi_b - lo_b + 1
    # n_b must be positive too: a reversed interval (hi < lo) makes n_b
    # negative — it would pass a <=-only check and then F.sequence
    # counts DOWNWARD by default, exploding just as badly
    guarded_hi = F.when(
        (n_b >= 1) & (n_b <= int(max_buckets)), hi_b
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"interval_point_join: interval [{lo_col},{hi_col}]=["),
        F.col(lo_col).cast("string"), F.lit(","),
        F.col(hi_col).cast("string"),
        F.lit(f"] is reversed or spans > max_buckets={max_buckets} "
              f"buckets at bucket_width={bucket_width}; clamp upstream "
              "or widen buckets"))))
    i_bucketed = intervals.withColumn(
        "_bucket", F.explode(F.sequence(lo_b, guarded_hi)))
    p_bucketed = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / b).cast("long"))
    j = p_bucketed.join(i_bucketed, "_bucket")
    return (j.filter((F.col(point_col) >= F.col(lo_col))
                     & (F.col(point_col) <= F.col(hi_col)))
            .drop("_bucket"))


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 16, hot_keys=None,
                how: str = "inner") -> DataFrame:
    """Equi-join with hot-key salting — the remedy
    :func:`~extractpdf4j_spark.functions.statsops.key_skew` diagnoses.
    Semantics are exactly ``left.join(right, on, how)``; physically the
    hot keys' rows spread across ``n_salts`` shuffle partitions instead
    of landing in one straggler task.

    ``hot_keys`` (an iterable of key VALUES, e.g. the head of
    ``key_skew(left, [on])``) confines the treatment: only hot rows get
    a spread salt, and only hot right rows replicate ``n_salts``×; cold
    keys ride salt 0 at 1× cost. ``hot_keys=None`` salts every key —
    uniform ``n_salts``× replication of the right side, only sane when
    the right side is small but too big/fast-changing to broadcast.

    The left salt is deterministic (``xxhash64`` over the whole row, not
    ``rand()``), so retried/speculated tasks and re-runs produce
    identical partitioning — at 100 TB a nondeterministic salt makes
    stage retries recompute different shuffles. ``how`` supports
    ``inner``/``left`` (both sides of a right/full join would need the
    mirrored treatment; reverse the call instead)."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', "
                         f"got {how!r}")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join: input columns collide with the "
                         "reserved internal name '_salt' — rename")
    hot = (F.col(on).isin(list(hot_keys)) if hot_keys is not None
           else F.lit(True))
    lsalt = (F.when(hot, F.pmod(
                 F.xxhash64(*[F.col(c) for c in left.columns]),
                 F.lit(n_salts)).cast("int"))
             .otherwise(F.lit(0)))
    l = left.withColumn("_salt", lsalt)
    rsalts = (F.when(hot, F.sequence(F.lit(0), F.lit(n_salts - 1)))
              .otherwise(F.array(F.lit(0))))
    r = right.withColumn("_salt", F.explode(rsalts))
    return l.join(r, [on, "_salt"], how).drop("_salt")
