"""Exact distributional statistics over grouped columns.

Spark's exact ``percentile`` aggregate buffers every value of a group in
memory (an OpenHashMap per group in the agg buffer) — at 100 TB a hot
group OOMs the executor. The classic distributed-exact alternative is to
aggregate the VALUE HISTOGRAM first: ``groupBy(keys, value).count()``
collapses the data to (keys x distinct-values) rows with a map-side
combine, and every later step — cumulative counts, quantile picks — runs
over the histogram, whose size is bounded by value cardinality, not row
count. For real corpus metrics (doc lengths, token counts, scores
rounded to fixed precision) cardinality is tiny; for continuous values
it is still never larger than the input.

Quantile semantics are SQL-standard ``percentile_disc``: the smallest
value whose cumulative fraction >= q. The pick comparison is done in
integers — quantiles are specified in BASIS POINTS and the gate is
``cum * 10000 >= q_bp * total`` on longs — so there is no float
knife-edge anywhere and the DuckDB oracle (SQL_QUANTILES in
entry_queries) is value-exact, the same trick the repo uses for the
mix_corpora quota boundary (corpusops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_quantiles(df: DataFrame, value_col: str, key_cols=(),
                    quantiles_bp=(2500, 5000, 7500, 9500),
                    weight_col: str | None = None) -> DataFrame:
    """Exact per-key percentile_disc for each quantile, given in basis
    points (2500 = p25): (keys..., q_bp long, quantile <value type>).

    ``weight_col`` (integer weights, e.g. token counts) switches to
    weighted quantiles — "the doc length below which 95% of TOKENS
    live" — with the same integer pick gate, still knife-edge-free.

    Plan shape: one map-side-combined histogram aggregation over the
    raw rows, then windows over the histogram only (cumulative count
    ordered by value, total per key), then a tiny explode(quantiles) +
    filter + min. Nothing after the first aggregation ever touches a
    row count proportional to the input."""
    for q in quantiles_bp:
        if not 0 < q <= 10000:
            raise ValueError(f"quantile {q} not in (0, 10000] basis points")
    keys = list(key_cols)
    w = (F.sum(F.col(weight_col).cast("long")) if weight_col
         else F.count("*").cast("long"))
    hist = (df.groupBy(*keys, value_col)
            .agg(w.alias("_cnt")))
    w_cum = (Window.partitionBy(*keys).orderBy(value_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(*keys)
    probe = (hist
             .withColumn("_cum", F.sum("_cnt").over(w_cum))
             .withColumn("_tot", F.sum("_cnt").over(w_tot))
             .withColumn("q_bp", F.explode(F.array(
                 *[F.lit(q).cast("long") for q in quantiles_bp]))))
    return (probe
            .filter(F.col("_cum") * 10000 >= F.col("q_bp") * F.col("_tot"))
            .groupBy(*keys, "q_bp")
            .agg(F.min(value_col).alias("quantile")))


def key_skew(df: DataFrame, key_cols, top_n: int = 20) -> DataFrame:
    """Heavy-hitter / skew report for a prospective join or groupBy key:
    the top-N keys by row count with their share of the table and their
    skew ratio (count / mean-count-per-key) — the number that answers
    "does this key need salting / AQE skew handling before I shuffle
    100 TB on it?" (ratio >> 1 on the head keys = salt).

    Returns (keys..., cnt long, rnk long, share double, skew_ratio
    double, total_rows long, n_keys long).

    Plan shape: one map-side-combined key histogram, then a global
    TakeOrderedAndProject for the top-N (per-partition top-N merged on
    the driver — never a full sort of the key space) and a 1-row global
    aggregate broadcast back onto the N survivors. Nothing after the
    first aggregation is proportional to the input; nothing ever holds
    the full key histogram in one place.

    skew_ratio is computed as (cnt / total) * n_keys in DOUBLE — the
    long product cnt * n_keys would overflow at petabyte scale (and
    Spark 4 ANSI mode would throw)."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    keys = list(key_cols)
    hist = df.groupBy(*keys).agg(F.count("*").cast("long").alias("cnt"))
    tot = hist.agg(F.sum("cnt").cast("long").alias("total_rows"),
                   F.count("*").cast("long").alias("n_keys"))
    order = [F.desc("cnt")] + [F.col(k) for k in keys]
    top = (hist.orderBy(*order).limit(top_n)
           .withColumn("rnk", F.row_number().over(
               Window.orderBy(*order)).cast("long")))
    share = F.col("cnt").cast("double") / F.col("total_rows")
    return (top.crossJoin(F.broadcast(tot))
            .select(*keys, "cnt", "rnk",
                    F.round(share, 6).alias("share"),
                    F.round(share * F.col("n_keys"), 6).alias("skew_ratio"),
                    "total_rows", "n_keys"))
