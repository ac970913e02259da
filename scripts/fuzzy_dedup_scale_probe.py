"""Scale probe for the composed fuzzy-dedup pass — the gate runs ~500
docs; this drives the full signatures -> LSH -> Jaccard-verify ->
cluster -> remove pipeline over N synthetic documents (default 300k)
with PLANTED near-duplicate groups and asserts EXACT recall/precision:
every planted variant is dropped, every singleton survives.

Construction (deterministic, no RNG): ids where id % 100 in {0,1,2,3}
form a 4-doc group (template = id - id % 100); all other ids are
singletons. Every doc is 60 tokens drawn from xxhash64(group, j) over a
50k vocabulary; variant v (1..3) replaces the token at position 7*v
with a unique token "u<id>". One substituted token out of 60 gives
3-gram-shingle Jaccard ~0.90 between group members — above the 0.8
verify threshold, and at k=16/bands=8 the per-pair LSH candidate
probability is 1-(1-0.9^2)^8 ~ 0.999998, so with three in-group pairs
per variant the planted edges are certain up to hash determinism
(everything is xxhash64/md5 — a pass is reproducible, not lucky).

Run:  PYTHONPATH=/root/repo python scripts/fuzzy_dedup_scale_probe.py [N]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
GROUP_EVERY = 100          # ids 0..3 mod 100 form a group of 4
TOKENS = 60
VOCAB = 50_000

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

variant = F.col("id") % GROUP_EVERY
grp = F.when(variant <= 3, F.col("id") - variant).otherwise(F.col("id"))
toks = []
for j in range(TOKENS):
    base = F.concat(F.lit("t"), F.pmod(F.xxhash64(grp, F.lit(j)),
                                       F.lit(VOCAB)).cast("string"))
    if j % 7 == 0 and 1 <= j // 7 <= 3:
        # position 7v carries the variant-v substitution
        toks.append(F.when((variant >= 1) & (variant == j // 7),
                           F.concat(F.lit("u"), F.col("id").cast("string")))
                    .otherwise(base))
    else:
        toks.append(base)
docs = (spark.range(N)
        .select(F.col("id").cast("long").alias("doc_id"),
                F.concat_ws(" ", *toks).alias("text"))
        .repartition(32)
        .localCheckpoint(eager=True))          # generation untimed

from extractpdf4j_spark.functions.dedup import fuzzy_dedup

t0 = time.time()
survivors = fuzzy_dedup(docs, k=16, bands=8, shingle_n=3,
                        jaccard_threshold=0.8, num_partitions=32)
n_surv = survivors.count()
dt = time.time() - t0

n_templates = (N + GROUP_EVERY - 1) // GROUP_EVERY
n_planted = sum(1 for v in (1, 2, 3) for g in range(0, N, GROUP_EVERY)
                if g + v < N)
expect = N - n_planted
print(f"fuzzy_dedup over {N} docs ({n_planted} planted variants in "
      f"{n_templates} groups): {dt:.2f}s, {N / dt:,.0f} docs/s, "
      f"{n_surv} survivors (expect {expect})")
assert n_surv == expect, (n_surv, expect)

# precision: nothing outside the planted variants was dropped;
# recall: no planted variant survived.  Together these are implied by
# the count only if drops are confined to variants — check directly.
leaked = (survivors
          .filter(((F.col("doc_id") % GROUP_EVERY) >= 1)
                  & ((F.col("doc_id") % GROUP_EVERY) <= 3)).count())
assert leaked == 0, f"{leaked} planted variants survived"
print("exact recall + precision: all planted variants dropped, "
      "all singletons/templates kept")
