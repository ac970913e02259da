"""Output sinks beyond the primary span-table write.

* CSV sink — the reference's CsvExporter/Main multi-table file sink
  (CsvExporter.java:28-49, Main.java:234-271 numbered out-N.csv): here a
  distributed write partitioned by doc_id, with the reference's exact
  quoting rules applied per cell.
* debug artifacts — the reference writes grid overlays/cell crops
  (LatticeParser.java:196-238); our analog is the metrics table plus
  optional sampled span dumps (never on the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tables_as_rows(extracted: DataFrame) -> DataFrame:
    """Flatten documents_extracted spans back into (doc_id, table_idx,
    row_idx, col_idx, value) — pure native ops on the span encoding."""
    s = (extracted.select("doc_id", F.posexplode("spans").alias("pos", "sp")))
    tables = (s.filter(F.col("sp.kind") == "media")
              .select("doc_id", F.col("pos").alias("tstart"),
                      F.col("sp.media_ref").alias("table_ref")))
    w_tables = (tables
                .withColumn("table_idx",
                            F.row_number().over(
                                Window.partitionBy("doc_id")
                                .orderBy("tstart")) - 1))
    cells = (s.filter(F.col("sp.kind") == "text")
             .select("doc_id", F.col("pos").alias("cpos"),
                     F.col("sp.text").alias("value"),
                     F.col("sp.media_ref").alias("cell_ref")))
    j = (cells.join(w_tables, "doc_id")
         .filter(F.col("cpos") > F.col("tstart"))
         .groupBy("doc_id", "cpos", "value", "cell_ref")
         .agg(F.max("tstart").alias("tstart")))
    j = j.join(w_tables, ["doc_id", "tstart"])
    r = F.regexp_extract("cell_ref", r"r(\d+)c(\d+)", 1).cast("int")
    c = F.regexp_extract("cell_ref", r"r(\d+)c(\d+)", 2).cast("int")
    return j.select("doc_id", "table_idx", "table_ref",
                    r.alias("row_idx"), c.alias("col_idx"), "value")


def _csv_quote(col, sep: str):
    needs = (col.contains(sep) | col.contains('"')
             | col.contains("\n"))
    quoted = F.concat(F.lit('"'),
                      F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(needs, quoted).otherwise(col)


def write_tables_csv(extracted: DataFrame, out_dir: str,
                     sep: str = ",") -> None:
    """Serialize each document's tables with the reference's quoting rules
    (CsvExporter.java:38-43) and write text partitioned by doc_id."""
    cells = tables_as_rows(extracted)
    cells = cells.withColumn("cell_csv", _csv_quote(F.col("value"), sep))
    rows = (cells.groupBy("doc_id", "table_idx", "row_idx")
            .agg(F.concat_ws(
                sep, F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("col_idx", "cell_csv"))),
                    lambda s: s.cell_csv)).alias("line")))
    lines = (rows.groupBy("doc_id", "table_idx")
             .agg(F.concat_ws("\n", F.transform(
                 F.array_sort(F.collect_list(F.struct("row_idx", "line"))),
                 lambda s: s.line)).alias("csv")))
    (lines.select("doc_id", "table_idx", "csv")
     .write.mode("overwrite").partitionBy("doc_id").parquet(out_dir))
