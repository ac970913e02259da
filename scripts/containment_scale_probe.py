"""Scale probe for n-gram CONTAINMENT (dedup.containment_pairs) — the
gate runs ~500 docs; this drives N docs (default 200k) and asserts
exact recall AND exact precision on planted subset documents:

* every 100th doc is a CONTAINER: a 40-token page whose positions
  10..25 quote a 16-token SHORT doc (the next doc id) verbatim,
* every doc — planted and clean — opens with the same 6 boilerplate
  tokens, so 4 corpus-wide shingles have doc frequency N. The
  ``max_df`` prune must drop them from candidate generation or the
  shingle self-join goes quadratic (~N²/2 candidate rows at 200k docs
  — the probe would not finish); their exclusion must NOT perturb the
  reported fractions (they are absent from the short docs entirely),
* expected output is EXACTLY the (container, short) pairs with
  na=38, nb=14, ninter=14, cont_b=1.0, cont_a=round(14/38, 6) —
  the short doc's Jaccard vs its container is 14/38 ≈ 0.37, below
  every near-dup banding threshold: the case this operator exists for.

Everything derives from doc ids — a pass is reproducible.

Run:  PYTHONPATH=/root/repo python scripts/containment_scale_probe.py [N]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

is_container = (F.col("id") % 100 == 0) & (F.col("id") + 1 < F.lit(N))
is_short = (F.col("id") % 100 == 1) & (F.col("id") > 0)

toks = []
for j in range(40):
    if j < 6:
        tok = F.lit(f"common{j}")                    # df=N boilerplate
    elif 10 <= j < 26:
        quoted = F.concat(F.lit("q"), F.col("id").cast("string"),
                          F.lit(f"j{j - 10}"))
        tok = F.when(is_container, quoted).otherwise(
            F.concat(F.lit("u"), F.col("id").cast("string"),
                     F.lit(f"p{j}")))
    else:
        tok = F.concat(F.lit("u"), F.col("id").cast("string"),
                       F.lit(f"p{j}"))
    toks.append(tok)
long_text = F.concat_ws(" ", *toks)
short_text = F.concat_ws(" ", *[
    F.concat(F.lit("q"), (F.col("id") - 1).cast("string"),
             F.lit(f"j{j}")) for j in range(16)])

docs = (spark.range(N)
        .select(F.col("id").cast("long").alias("doc_id"),
                F.when(is_short, short_text).otherwise(long_text)
                .alias("text"))
        .repartition(32)
        .localCheckpoint(eager=True))            # generation untimed

from extractpdf4j_spark.functions.dedup import containment_pairs

t0 = time.time()
out = containment_pairs(docs, shingle_n=3, max_df=20,
                        min_containment=0.5).localCheckpoint(eager=True)
n_pairs = out.count()
dt = time.time() - t0

expected = sum(1 for c in range(0, N, 100) if c + 1 < N)
print(f"containment_pairs over {N} docs: {dt:.2f}s, "
      f"{N / dt:,.0f} docs/s; pairs found: {n_pairs} "
      f"(expected {expected})")
assert n_pairs == expected, (n_pairs, expected)

rows = out.collect()
cont_a = round(14 / 38, 6)
bad = [r for r in rows
       if not (r["a"] + 1 == r["b"] and r["a"] % 100 == 0
               and (r["na"], r["nb"], r["ninter"]) == (38, 14, 14)
               and r["cont_b"] == 1.0 and r["cont_a"] == cont_a)]
assert not bad, bad[:5]
print(f"exact recall AND precision: all {expected} planted "
      f"(container, short) pairs, na=38 nb=14 ninter=14 cont_b=1.0; "
      f"zero false positives past the df<={20} prune")
