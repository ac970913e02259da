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
    """
    payload = list(right_cols)
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
         .orderBy(F.col("_ts"), F.col("_right").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in payload:
        u = u.withColumn(f"asof_{c}",
                         F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    return (u.filter(F.col("_right") == 0)
            .select(F.col("_lrow.*"),
                    *[F.col(f"asof_{c}") for c in payload]))


def interval_point_join(points: DataFrame, intervals: DataFrame,
                        point_col: str, lo_col: str, hi_col: str,
                        bucket_width: float) -> DataFrame:
    """Inclusive point-in-interval join (``lo <= x <= hi``) as a bucketed
    equi-join: every interval is exploded to the coarse buckets it
    covers, every point hashes to exactly one bucket, and the exact
    predicate filters after the bucket equi-join.

    ``bucket_width`` trades shuffle volume (intervals replicate once per
    covered bucket) against filter selectivity — set it near the median
    interval span. Long intervals replicate proportionally; cap outliers
    upstream if the span distribution is heavy-tailed. Output columns =
    point columns + interval columns.
    """
    b = float(bucket_width)
    i_bucketed = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / b).cast("long"),
            F.floor(F.col(hi_col) / b).cast("long"))))
    p_bucketed = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / b).cast("long"))
    j = p_bucketed.join(i_bucketed, "_bucket")
    return (j.filter((F.col(point_col) >= F.col(lo_col))
                     & (F.col(point_col) <= F.col(hi_col)))
            .drop("_bucket"))
