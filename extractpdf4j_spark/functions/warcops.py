"""WARC (Web ARChive) ingest — the Common Crawl front door.

Completes the web-curation funnel upstream of ``htmlops``/``urlops``:
crawl archives arrive as WARC files (ISO 28500: records framed by a
``WARC/1.0`` version line, colon-separated WARC headers, a blank line,
then ``Content-Length`` bytes of block — for ``response`` records an
HTTP message whose body is the page). Two parsers, two duties:

* :func:`parse_warc_text` — pure-codegen split/regex parse of WARC
  content already in a string column. Zero Python, zero shuffles (one
  posexplode per record); this is the oracle-gated semantics anchor.
  It assumes record payloads do not themselves contain the
  ``WARC/1.0\\r\\n`` magic (true for text/html crawl data; binary
  payloads need the strict reader below).
* the BINARY front door is :func:`extractpdf4j_spark.sources.read_warc`
  (binaryFile scan, stdlib gzip for whole-file and Common Crawl's
  member-per-record compression, Content-Length-STRICT walk that is
  byte-exact on payloads embedding the magic and resyncs past corrupt
  records) — this module deliberately does NOT duplicate it.

* :func:`warc_to_documents` — adapter: response records become
  ``(doc_id, url, text)`` rows ready for ``htmlops.extract_main_content``
  and the ``curate_web`` funnel; doc_id is ``<file>#<record_idx>`` so
  identity is stable under re-parses.

Scale shape: the WARC FILE is the work unit (exactly how Common Crawl
jobs shard — one ~1 GB archive per task); ``binaryFile`` gives one row
per file, the parser streams records out of one file's bytes, and
everything downstream is per-record rows. No cross-file state, no
shuffle until the consumer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["parse_warc_text", "warc_to_documents", "WARC_MAGIC",
           "WARC_RECORD_SCHEMA"]

WARC_MAGIC = "WARC/1.0\r\n"
# F.split takes a regex — escape the dot; \r\n are literal chars.
_MAGIC_SPLIT_RE = "WARC/1\\.0\r\n"

WARC_RECORD_SCHEMA = ("file_id string, record_idx long, warc_type string, "
                      "target_uri string, warc_date string, "
                      "content_length long, http_status string, "
                      "payload string")

# WARC named-field grammar (RFC-style headers). RE2-safe, mirrored
# verbatim by the DuckDB oracle.
_TYPE_RE = r"WARC-Type: ([^\r\n]+)"
_URI_RE = r"WARC-Target-URI: ([^\r\n]+)"
_DATE_RE = r"WARC-Date: ([^\r\n]+)"
_CLEN_RE = r"Content-Length: ([0-9]+)"
_STATUS_RE = r"^HTTP/1\.[01] ([0-9]{3})"


def parse_warc_text(df: DataFrame, content_col: str = "content",
                    file_col: str = "file_id") -> DataFrame:
    """Parse WARC content held in a string column into record rows.

    Returns ``(file_id, record_idx, warc_type, target_uri, warc_date,
    content_length, http_status, payload)``; ``record_idx`` is the
    0-based split position within the file (the element before the
    leading magic is empty and is dropped, so a well-formed file's
    records number 1..n). ``payload`` is the HTTP body for ``response``
    records (headers stripped, trailing record separators trimmed) and
    the raw block otherwise.

    Everything is codegen ``split``/``split_part``/``regexp_extract``
    projections — one posexplode, no window, no shuffle, no Python.
    """
    crlf2 = "\r\n\r\n"
    recs = (df.select(
                F.col(file_col).alias("file_id"),
                F.posexplode(F.split(F.col(content_col), _MAGIC_SPLIT_RE))
                .alias("record_idx", "_rec"))
            .filter(F.trim(F.col("_rec")) != ""))
    whdr = F.substring_index(F.col("_rec"), crlf2, 1)
    block = F.col("_rec").substr(F.length(whdr) + F.lit(5),
                                 F.length("_rec"))
    recs = (recs
            .withColumn("warc_type", F.regexp_extract(whdr, _TYPE_RE, 1))
            .withColumn("target_uri",
                        F.regexp_extract(whdr, _URI_RE, 1))
            .withColumn("warc_date", F.regexp_extract(whdr, _DATE_RE, 1))
            .withColumn("content_length",
                        F.regexp_extract(whdr, _CLEN_RE, 1)
                        .try_cast("long"))
            .withColumn("_block", block))
    http_hdr = F.substring_index(F.col("_block"), crlf2, 1)
    http_body = F.col("_block").substr(F.length(http_hdr) + F.lit(5),
                                       F.length("_block"))
    is_resp = F.col("warc_type") == "response"
    payload = F.when(is_resp, http_body).otherwise(F.col("_block"))
    return (recs
            .withColumn("http_status",
                        F.when(is_resp,
                               F.regexp_extract(http_hdr, _STATUS_RE, 1))
                        .otherwise(F.lit("")))
            .withColumn("payload",
                        F.regexp_replace(payload, r"(\r\n)+$", ""))
            .select("file_id", F.col("record_idx").cast("long"),
                    "warc_type", "target_uri", "warc_date",
                    "content_length", "http_status", "payload"))


def warc_to_documents(records: DataFrame,
                      min_status: int = 200,
                      max_status: int = 299) -> DataFrame:
    """Response records → ``(doc_id, url, text)`` for the html/curation
    funnel. 2xx only by default; doc_id = ``<file_id>#<record_idx>``
    so identity survives re-parses of the same archive."""
    st = F.col("http_status").try_cast("int")
    return (records
            .filter((F.col("warc_type") == "response")
                    & st.isNotNull()
                    & st.between(min_status, max_status))
            .select(F.concat_ws("#", "file_id",
                                F.col("record_idx").cast("string"))
                    .alias("doc_id"),
                    F.col("target_uri").alias("url"),
                    F.col("payload").alias("text")))
