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
* :func:`read_warc_corpus` — the real front door: ``binaryFile`` scan
  of ``*.warc`` / ``*.warc.gz`` (stdlib ``gzip`` handles both
  whole-file and Common Crawl's per-record member compression — no
  external libs), then a Content-Length-STRICT stdlib parser inside
  ``mapInPandas``. Byte-exact on payloads that embed the magic;
  corrupt framing yields ``warc_type='corrupt'`` rows, never an
  exception (same malformed-input contract as the PDF pipeline).

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

import gzip
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["parse_warc_text", "read_warc_corpus", "warc_to_documents",
           "WARC_MAGIC", "WARC_RECORD_SCHEMA"]

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


def _iter_warc_records(data: bytes) -> Iterator[tuple[int, dict]]:
    """Content-Length-strict record walk over raw WARC bytes.

    Framing errors (missing blank line, bad/absent Content-Length)
    emit a ``corrupt`` record and resync at the next magic — one bad
    record never loses the rest of the file."""
    magic = b"WARC/1.0\r\n"
    pos = data.find(magic)
    idx = 0
    while pos != -1:
        idx += 1
        hdr_start = pos + len(magic)
        hdr_end = data.find(b"\r\n\r\n", hdr_start)
        nxt = data.find(magic, hdr_start)
        if hdr_end == -1 or (nxt != -1 and nxt < hdr_end):
            yield idx, {"warc_type": "corrupt", "headers": b"",
                        "block": data[pos:nxt if nxt != -1 else len(data)]}
            pos = nxt
            continue
        headers = data[hdr_start:hdr_end]
        clen = None
        for line in headers.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                try:
                    clen = int(line.split(b":", 1)[1].strip())
                except ValueError:
                    clen = None
        body_start = hdr_end + 4
        if clen is None or body_start + clen > len(data):
            yield idx, {"warc_type": "corrupt", "headers": headers,
                        "block": b""}
            pos = data.find(magic, body_start)
            continue
        block = data[body_start:body_start + clen]
        yield idx, {"warc_type": None, "headers": headers, "block": block}
        pos = data.find(magic, body_start + clen)


def _parse_header_fields(headers: str) -> dict:
    def one(pat):
        m = re.search(pat, headers)
        return m.group(1) if m else ""
    return {"warc_type": one(_TYPE_RE), "target_uri": one(_URI_RE),
            "warc_date": one(_DATE_RE), "content_length": one(_CLEN_RE)}


def read_warc_corpus(spark: SparkSession, path: str,
                     batch_rows: int = 2048) -> DataFrame:
    """``binaryFile`` scan of ``path`` (``*.warc`` and ``*.warc.gz``)
    parsed record-by-record with the strict Content-Length walk.

    gzip is detected by magic bytes, not extension, and stdlib
    ``gzip.decompress`` consumes multi-member streams — Common Crawl's
    one-member-per-record layout decompresses in one call. Payload
    bytes decode utf-8 with replacement (crawl data is dirty)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def gen(batches):
        rows: list[dict] = []
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = gzip.decompress(data)
                    except OSError:
                        rows.append({"file_id": fpath, "record_idx": 0,
                                     "warc_type": "corrupt",
                                     "target_uri": "", "warc_date": "",
                                     "content_length": None,
                                     "http_status": "", "payload": ""})
                        continue
                for idx, rec in _iter_warc_records(data):
                    if rec["warc_type"] == "corrupt":
                        rows.append({"file_id": fpath, "record_idx": idx,
                                     "warc_type": "corrupt",
                                     "target_uri": "", "warc_date": "",
                                     "content_length": None,
                                     "http_status": "", "payload": ""})
                        continue
                    hdr = _parse_header_fields(
                        rec["headers"].decode("utf-8", "replace"))
                    block = rec["block"]
                    status, payload = "", block
                    if hdr["warc_type"] == "response":
                        sep = block.find(b"\r\n\r\n")
                        if sep != -1:
                            http_hdr = block[:sep].decode("utf-8",
                                                          "replace")
                            m = re.search(_STATUS_RE, http_hdr)
                            status = m.group(1) if m else ""
                            payload = block[sep + 4:]
                    rows.append({
                        "file_id": fpath, "record_idx": idx,
                        "warc_type": hdr["warc_type"],
                        "target_uri": hdr["target_uri"],
                        "warc_date": hdr["warc_date"],
                        "content_length": (int(hdr["content_length"])
                                           if hdr["content_length"]
                                           else None),
                        "http_status": status,
                        "payload": payload.decode("utf-8", "replace")})
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows)
                        rows = []
        if rows:
            yield pd.DataFrame(rows)

    return files.mapInPandas(gen, WARC_RECORD_SCHEMA)


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
