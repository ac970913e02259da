"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive the interleaved span corpus from the
sf0.001 documents table and run the full hybrid extraction pipeline,
returning the flattened extracted spans.

``queries()`` / ``oracle_sql()`` — operator-level correctness gate; each
Spark DataFrame implementation has a DuckDB-ANSI equivalent unless the
operator is not SQL-expressible, which gets a rows-only check. The
flagship path itself is oracle-pinned by ``q_flagship_spans`` /
``q_flagship_metrics`` (entry()'s exact lineage on the SQL-expressible
text-family subset).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid table extraction over the interleaved corpus
    derived from sf0.001, returning flattened extracted spans."""
    from extractpdf4j_spark.config import ExtractConfig
    from extractpdf4j_spark.corpusgen import ensure_fixture_corpus
    from extractpdf4j_spark.pipeline import extract, with_spans

    docs, media = ensure_fixture_corpus(spark, SF0001, limit=200)
    combined = extract(docs, media, ExtractConfig(), num_partitions=8)
    return (with_spans(combined)
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from extractpdf4j_spark.entry_queries import QUERIES
    return QUERIES


def oracle_sql() -> dict[str, str]:
    from extractpdf4j_spark.entry_queries import ORACLES
    return ORACLES
