"""Scale probe for cross-document EXACT SUBSTRING dedup
(dedup.remove_duplicate_ngrams) — the gate runs ~500 docs; this drives
N docs (default 200k) with a verbatim 12-token boilerplate passage
PLANTED into every 10th document and asserts exact semantics:

* the globally-first occurrence (doc 0) keeps every token,
* every other planted doc drops EXACTLY the 12 passage tokens
  (interior 6-gram windows are duplicated corpus-wide; windows
  straddling passage/context are unique per doc and must NOT drop
  context tokens),
* clean docs are untouched,
* a sampled planted doc's rebuilt text equals its context tokens.

Everything is xxhash64-deterministic — a pass is reproducible.

Run:  PYTHONPATH=/root/repo python scripts/ngram_dedup_scale_probe.py [N]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
TOKENS = 50
P_START, P_LEN = 10, 12          # passage occupies positions 10..21
VOCAB = 50_000

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

planted = F.col("id") % 10 == 0
toks = []
for j in range(TOKENS):
    ctx = F.concat(F.lit("t"), F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                                      F.lit(VOCAB)).cast("string"))
    if P_START <= j < P_START + P_LEN:
        toks.append(F.when(planted, F.lit(f"boiler{j}")).otherwise(ctx))
    elif P_START - 6 < j < P_START + P_LEN + 5:
        # the n-1 context tokens flanking the passage must be unique
        # per doc: a boundary window shares 5 passage tokens, so a
        # SHARED-vocab flank token collides between planted docs at
        # 1/VOCAB per pair — at 20k planted docs the birthday effect
        # makes thousands of boundary windows GENUINELY duplicated
        # (first probe run: 5400 docs dropped 13 tokens, 786 dropped
        # 14 — correct dedup behavior, wrong ground-truth claim).
        toks.append(F.concat(F.lit("u"), F.col("id").cast("string"),
                             F.lit(f"p{j}")))
    else:
        toks.append(ctx)
docs = (spark.range(N)
        .select(F.col("id").cast("long").alias("doc_id"),
                F.concat_ws(" ", *toks).alias("text"))
        .repartition(32)
        .localCheckpoint(eager=True))          # generation untimed

from extractpdf4j_spark.functions.dedup import remove_duplicate_ngrams

t0 = time.time()
out = remove_duplicate_ngrams(docs, n=6).localCheckpoint(eager=True)
n_out = out.count()
dt = time.time() - t0
assert n_out == N, (n_out, N)

agg = (out.withColumn("_p", (F.col("doc_id") % 10 == 0)
                      & (F.col("doc_id") > 0))
       .withColumn("_k", F.when(F.col("doc_id") == 0, F.lit("keeper"))
                   .when(F.col("_p"), F.lit("planted"))
                   .otherwise(F.lit("clean")))
       .groupBy("_k", "n_dropped").count().collect())
got = {(r["_k"], r["n_dropped"]): r["count"] for r in agg}
n_planted = (N - 1) // 10        # ids 10, 20, ... (doc 0 is the keeper)
print(f"remove_duplicate_ngrams over {N} docs: {dt:.2f}s, "
      f"{N / dt:,.0f} docs/s; outcome histogram: {got}")
assert got == {("keeper", 0): 1,
               ("planted", P_LEN): n_planted,
               ("clean", 0): N - 1 - n_planted}, got

# sampled reconstruction: planted doc 10's survivor text == its context
sample = out.filter(F.col("doc_id") == 10).collect()[0]["text"]
ctx_toks = [r["t"] for r in
            docs.filter(F.col("doc_id") == 10)
            .select(F.posexplode(F.split("text", " ")).alias("j", "t"))
            .filter(~F.col("j").between(P_START, P_START + P_LEN - 1))
            .orderBy("j").collect()]
assert sample == " ".join(ctx_toks), sample[:120]
print("exact semantics hold: keeper untouched, planted docs drop "
      f"exactly {P_LEN} tokens, clean docs untouched, rebuild verified")
