"""Scale probe for greedy k-center selection — the gate runs k=6 over
2k vectors; this drives k=8 over 500k x 64 synthetic vectors planted
in 8 well-separated clusters, asserting the greedy picks cover ALL 8
clusters (the diversity guarantee) and measuring per-round cost.

Run:  PYTHONPATH=/root/repo python scripts/kcenter_scale_probe.py [N]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
K = 8

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# cluster c -> unit axis e_{8c}; point = axis + tiny deterministic noise
cluster = F.col("id") % K
dims = []
for j in range(64):
    noise = ((F.xxhash64(F.col("id"), F.lit(j)) % 1000)
             .cast("double") / 100000.0)
    dims.append(F.when(cluster * 8 == j, 1.0).otherwise(0.0) + noise)
emb = (spark.range(N)
       .select(F.col("id").alias("vec_id"), F.array(*dims).alias("embedding"))
       .localCheckpoint(eager=True))           # generation untimed

from extractpdf4j_spark.functions.similarity import kcenter_select

t0 = time.time()
picks = kcenter_select(emb, k=K).collect()
dt = time.time() - t0
clusters = sorted(int(r["vec_id"]) % K for r in picks)
print(f"kcenter k={K} over {N} vectors: {dt:.2f}s total, "
      f"{dt / K:.2f}s/round, {N * K / dt:,.0f} row-rounds/s")
print("pick clusters:", clusters)
assert clusters == list(range(K)), clusters
print(f"diversity guarantee holds: {K} picks cover all {K} planted "
      "clusters")
