"""Structured Streaming surface.

The reference has no streaming (its Spring service is blocking
request/response, PdfExtractController.java:40-44), but a corpus-scale
deployment ingests documents continuously. This wraps the batch pipeline
in the idiomatic Spark shape: ``readStream`` on the documents location →
``foreachBatch`` running the same extraction plan per micro-batch →
append sink, with the stream checkpoint giving exactly-once per-batch
semantics on top of the pipeline's own per-document resume table.

foreachBatch (rather than a stateful operator) is the right altitude:
extraction is per-document (no cross-batch state, no watermarks/late-data
semantics to express), so each micro-batch is simply a small batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import ExtractConfig
from .pipeline import DOCUMENTS_SCHEMA, extract


def stream_extraction(spark: SparkSession, documents_path: str,
                      media: DataFrame | None, cfg: ExtractConfig,
                      out_dir: str, checkpoint_dir: str,
                      trigger_once: bool = True,
                      num_partitions: int | None = None):
    """Start a streaming extraction over a growing parquet directory of
    documents. Returns the StreamingQuery.

    ``media`` is a static (dimension-style) DataFrame joined into every
    micro-batch; a fully streaming media side would arrive pre-joined in
    the documents table instead.
    """
    docs_stream = (spark.readStream
                   .schema(DOCUMENTS_SCHEMA)
                   .parquet(documents_path))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        combined = extract(batch_df, media, cfg, num_partitions)
        combined.write.mode("append").parquet(f"{out_dir}/combined")

    writer = (docs_stream.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(process_batch))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
