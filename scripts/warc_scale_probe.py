"""Scale probe for the WARC front door — the gate corpora wrap 500
docs; this drives both parsers at archive scale (default: 64 files x
4,000 records ≈ 256k records, ~1.5 GB of WARC bytes) to measure
records/s and verify strict-walk vs codegen-split agreement on clean
framing.

Generation is untimed: files are written once to /tmp by a parallel
Spark job (one task per archive, the same unit the readers use).

Run:  PYTHONPATH=/root/repo python scripts/warc_scale_probe.py [files] [recs]
"""

import os
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_RECS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
OUT = "/tmp/warc_scale_probe"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def _gen(paths):
    for pdf in paths:
        for fid in pdf["fid"]:
            chunks = []
            for i in range(N_RECS):
                body = (f"<html><body><p>doc {fid}-{i} "
                        + "tok " * 180 + "</p></body></html>")
                http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html"
                        "\r\n\r\n" + body)
                chunks.append(
                    "WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Record-ID: <urn:uuid:{fid}-{i}>\r\n"
                    f"WARC-Target-URI: https://h{fid}.example/{i}\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n"
                    + http + "\r\n\r\n")
            with open(f"{OUT}/f{fid:04d}.warc", "w") as fh:
                fh.write("".join(chunks))
            yield __import__("pandas").DataFrame({"fid": [fid]})


shutil.rmtree(OUT, ignore_errors=True)
os.makedirs(OUT)
t0 = time.time()
(spark.range(N_FILES).select(F.col("id").cast("int").alias("fid"))
 .repartition(N_FILES).mapInPandas(_gen, "fid int").count())
size_gb = sum(os.path.getsize(f"{OUT}/{f}") for f in os.listdir(OUT)) / 1e9
total = N_FILES * N_RECS
print(f"generated {N_FILES} files x {N_RECS} recs "
      f"({size_gb:.2f} GB) in {time.time()-t0:.1f}s [untimed]")

from extractpdf4j_spark.functions.warcops import parse_warc_text
from extractpdf4j_spark.sources import read_warc

for label, fn in [
    ("read_warc (strict walk)",
     lambda: read_warc(spark, OUT).count()),
    ("read_warc -> 2xx docs",
     lambda: read_warc(spark, OUT)
     .filter("warc_type = 'response' AND http_status = 200").count()),
    ("parse_warc_text (codegen)",
     lambda: parse_warc_text(
         spark.read.format("binaryFile").load(OUT)
         .select(F.col("path").alias("file_id"),
                 F.col("content").cast("string").alias("content")))
     .count()),
]:
    for attempt in range(2):
        t0 = time.time()
        got = fn()
        dt = time.time() - t0
        print(f"{label:28s} run{attempt}: {dt:6.2f}s  "
              f"{total / dt:9.0f} rec/s  rows={got}")
    assert got == total, (got, total)
print("strict walk and codegen split agree on clean framing:",
      total, "records each")
