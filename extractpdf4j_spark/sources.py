"""Table IO seam: parquet paths or catalog (Iceberg) table identifiers.

The north rule's corpus lives in Iceberg tables; this sandbox has no
Iceberg runtime, so all table IO routes through one seam: a reference
that looks like a catalog identifier (``cat.db.documents``) reads/writes
through the session catalog — with Iceberg jars + catalog config that IS
an Iceberg table, and its metadata gives partition pruning and snapshot
isolation for free — while a path reads/writes parquet. The engine code
is identical either way; tests exercise the identifier branch through
Spark's built-in session catalog (same DataFrameWriterV2 API surface
Iceberg implements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(ref: str) -> bool:
    """Catalog identifier vs filesystem path: paths contain '/' or a
    URI scheme; identifiers are dotted names."""
    return not ("/" in ref or "\\" in ref
                or ref.startswith(("s3:", "s3a:", "hdfs:", "file:", "gs:",
                                   "abfs:", "abfss:")))


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read documents/media from a catalog table or a parquet path."""
    if is_table_identifier(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def append_table(df: DataFrame, ref: str) -> None:
    """Append rows to a catalog table (created on first write) or a
    parquet path. ``saveAsTable(mode='append')`` creates-if-missing and
    works against both the built-in v1 session catalog (tests/dev) and
    an Iceberg session catalog (production, where it rides Iceberg's
    transactional commit)."""
    if is_table_identifier(ref):
        df.write.mode("append").saveAsTable(ref)
    else:
        df.write.mode("append").parquet(ref)


def try_read_table(spark: SparkSession, ref: str) -> DataFrame | None:
    """Read for resume: None when the checkpoint target doesn't exist."""
    try:
        return read_table(spark, ref)
    except Exception:
        return None


def write_bucketed(df: DataFrame, ref: str, bucket_col: str,
                   n_buckets: int = 256, sort: bool = True) -> None:
    """Create/replace catalog table ``ref`` bucketed by ``bucket_col`` —
    the table layout that makes the engine's stage-0 equi-joins
    (documents ⋈ media on doc_id / media_ref) shuffle-free, per the
    README scale note.

    Against the v1 session catalog (tests/dev) this is Hive-style
    ``bucketBy``: when both join sides are bucketed on the join key with
    matching bucket counts, Spark's bucketed scan elides BOTH exchanges
    (asserted with plan evidence in
    test_bucketed_join_is_shuffle_free). On an Iceberg catalog the same
    intent is the ``bucket(N, col)`` partition transform plus
    storage-partitioned joins
    (``spark.sql.sources.v2.bucketing.enabled``); the identifier
    routing through this seam is unchanged.
    """
    if not is_table_identifier(ref):
        raise ValueError(
            "bucketed write requires a catalog table identifier, "
            f"got path-like ref {ref!r}")
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(ref)
