"""Scale probe for the decontamination family (decontaminate /
scrub_contaminated) — the gate corpora are 500-doc; this drives the
operators at ~500k docs to verify the broadcast-probe shape holds and
to measure throughput, the same methodology as
perceptual_scale_probe.py.

Corpus: N synthetic 40-token docs built entirely from Spark
expressions (no driver data); every CONTAM_EVERY-th doc embeds a
13-token benchmark sentence drawn from a DISJOINT vocabulary, so the
planted contamination count is exact (no coincidental n-gram overlap
is possible between the qq-vocabulary and the w-vocabulary).

Run:  PYTHONPATH=/root/repo python scripts/decontam_scale_probe.py [N]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
CONTAM_EVERY = 50
BENCH_SENT = " ".join(f"qq{i}" for i in range(13))  # disjoint vocab

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 40 filler tokens w<id%97>_<j> keep docs distinct; the planted sentence
# replaces tokens 15-27 on every CONTAM_EVERY-th doc
filler = F.concat_ws(" ", *[
    F.concat(F.lit(f"w{j}x"), ((F.col("id") * (j + 3)) % 97)
             .cast("string")) for j in range(40)])
toks = F.split(filler, " ")
planted = F.concat_ws(
    " ",
    F.concat_ws(" ", F.slice(toks, 1, 15)),
    F.lit(BENCH_SENT),
    F.concat_ws(" ", F.slice(toks, 28, 13)))
corpus = (spark.range(N)
          .select(F.col("id").cast("string").alias("doc_id"),
                  F.when(F.col("id") % CONTAM_EVERY == 0, planted)
                  .otherwise(filler).alias("text")))
corpus = corpus.localCheckpoint(eager=True)   # generation untimed
evals = spark.createDataFrame([("e0", BENCH_SENT)],
                              "doc_id string, text string")

from extractpdf4j_spark.functions.corpusops import (decontaminate,
                                                    scrub_contaminated)

expected = (N + CONTAM_EVERY - 1) // CONTAM_EVERY

for label, fn in [
    ("decontaminate",
     lambda: decontaminate(corpus, evals, n=13).count()),
    ("scrub_contaminated",
     lambda: scrub_contaminated(corpus, evals, n=13, window=5,
                                min_fragment=5)
     .agg(F.countDistinct("doc_id")).collect()[0][0]),
]:
    for attempt in range(2):                  # 2nd call = steady state
        t0 = time.time()
        got = fn()
        dt = time.time() - t0
        print(f"{label:20s} run{attempt}: {dt:6.2f}s  "
              f"{N / dt:9.0f} docs/s  result={got}")
    if label == "decontaminate":
        assert got == expected, (got, expected)
    else:
        # every doc survives with >=1 fragment (contaminated docs keep
        # their clean prefix/suffix; clean docs pass through whole)
        assert got == N, (got, N)
print(f"planted contamination recovered exactly: {expected}/{expected}")
