#!/usr/bin/env python
"""Follow-up scaling runs: (A) JVM-thread-capped local[32]; (B) local[6]
for the executor-sized 6-vs-24 proxy."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["ATTR_REPO"])
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")
cores = int(os.environ["ATTR_CORES"])
extra = json.loads(os.environ.get("ATTR_EXTRA", "{}"))
from pyspark.sql import SparkSession
sp = max(cores * 2, 8)
b = (SparkSession.builder.master(f"local[{cores}]")
     .config("spark.sql.shuffle.partitions", str(sp))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
     .config("spark.driver.memory", "48g")
     .config("spark.ui.enabled", "false"))
for k, v in extra.items():
    b = b.config(k, v)
spark = b.getOrCreate()
import bench
bench.run_extraction_bench(spark, "/root/testdata/sf0.1", cores, 4)
times = []
for _ in range(3):
    dt, n = bench.run_extraction_bench(spark, "/root/testdata/sf0.1", cores, 4)
    times.append(dt)
print(json.dumps({"cores": cores, "best": round(min(times), 3),
                  "times": [round(t, 3) for t in times]}))
spark.stop()
"""

GC_CAP = {"spark.driver.extraJavaOptions":
          "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"}


def run(cores, extra, label):
    time.sleep(75)
    r = subprocess.run([sys.executable, "-c", RUNNER],
                       capture_output=True, text=True, cwd=REPO,
                       env={**os.environ, "ATTR_CORES": str(cores),
                            "ATTR_REPO": REPO,
                            "ATTR_EXTRA": json.dumps(extra)}, timeout=1800)
    if r.returncode != 0:
        print(label, "FAILED", r.stderr[-800:], flush=True)
        return None
    res = json.loads(r.stdout.strip().splitlines()[-1])
    print(label, json.dumps(res), flush=True)
    return res


def main():
    out = {}
    out["gc32"] = run(32, GC_CAP, "gc32")
    out["six"] = run(6, {}, "six")
    out["gc24"] = run(24, GC_CAP, "gc24")
    with open(os.path.join(REPO, "BENCH", "followup.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
