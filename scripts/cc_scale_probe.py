"""Scale probe for connected components with pointer doubling — the
gate graph (q_dedup_clusters / q_cluster_doubling) has diameter ~7;
this drives the regime the doubling kernel exists for: 500k nodes in
5,000 chains of length 100 (diameter 99, the pathological shape for
min-label propagation, which would need 99 rounds = 99 shuffles +
99 driver barriers).

Asserts EXACT planted ground truth (every node's cluster == its chain
head) under a 12-round budget, and that plain propagation under the
same budget does NOT converge (warns) — the probe is the evidence the
algorithm switch is load-bearing, not cosmetic.

Run:  PYTHONPATH=/root/repo python scripts/cc_scale_probe.py [N_CHAINS] [LEN]
"""

import sys
import time
import warnings

from pyspark.sql import SparkSession, functions as F

N_CHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ROUNDS = 12

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# chain c holds nodes [c*LEN, (c+1)*LEN); edges link consecutive ids
edges = (spark.range(N_CHAINS * LEN)
         .filter((F.col("id") + 1) % LEN != 0)
         .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
         .localCheckpoint(eager=True))          # generation untimed
n_edges = edges.count()

from extractpdf4j_spark.functions.dedup import duplicate_clusters

t0 = time.time()
# check_every=ROUNDS: pure fixed-round budget, one driver count at the
# end (the 100 TB posture) — the final count doubles as the
# convergence assertion because a warning would surface here
with warnings.catch_warnings():
    warnings.simplefilter("error")
    out = duplicate_clusters(edges, max_iter=ROUNDS, check_every=ROUNDS,
                             algorithm="doubling")
    wrong = out.filter(F.col("cluster")
                       != (F.col("node") - F.col("node") % LEN)).count()
dt = time.time() - t0
n = N_CHAINS * LEN
print(f"doubling over {n:,} nodes / {n_edges:,} edges "
      f"(chains of {LEN}, diameter {LEN - 1}): {dt:.2f}s "
      f"within a {ROUNDS}-round budget, {n / dt:,.0f} nodes/s")
assert wrong == 0, f"{wrong} nodes carry a non-head label"
print("exact ground truth: every node labeled with its chain head")

# control: plain propagation cannot converge in the same budget
small = (spark.range(LEN - 1)
         .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b")))
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter("always")
    duplicate_clusters(small, max_iter=ROUNDS, check_every=ROUNDS).collect()
assert any("max_iter" in str(x.message) for x in w), \
    "propagation unexpectedly converged within the budget"
print(f"control: min-label propagation on ONE chain of {LEN} warns "
      f"non-convergence at {ROUNDS} rounds (needs {LEN - 1})")
