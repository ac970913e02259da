#!/usr/bin/env python
"""r5 machinery-floor sweep (VERDICT r4 #7): the sf0.1 headline is
bounded by a ~4-4.6 s flat floor (BENCH/attribution.json passthrough
job). This sweep A/Bs the floor's knobs at the REPO PROTOCOL config
(sf0.1, 5k docs, unreplicated) with the thermal discipline the host
demands: fresh JVM per sample, configs INTERLEAVED round-robin so every
config sees a similar mixture of thermal states, >=75 s idle before
each sample, best-of across rounds.

Knobs:
  cores       — executor thread count (attribution.json: local[24] beat
                local[32] on extract; the JVM's scheduler/Arrow/GC
                threads time-slice against 32 python workers)
  batch       — spark.sql.execution.arrow.maxRecordsPerBatch
  stage_parts — stage-1/2 partition count (waves of work per core)

Usage: PYTHONPATH=/root/repo python BENCH/floor_sweep.py
Writes BENCH/floor_sweep.json.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["FS_REPO"])
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")
cores = int(os.environ["FS_CORES"])
batch = os.environ.get("FS_BATCH")
parts = int(os.environ.get("FS_PARTS", "0")) or cores * 2
import bench
from pyspark.sql import SparkSession
b = (SparkSession.builder.master(f"local[{cores}]")
     .appName(f"floor-sweep-{cores}")
     .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.driver.memory", "48g")
     .config("spark.ui.enabled", "false"))
if batch:
    b = b.config("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
spark = b.getOrCreate()
os.environ["SPARK_GRAFT_STAGE_PARTS"] = str(parts)
# one warm-up (absorbs python-worker fork + codegen), then one timed run
bench.run_extraction_bench(spark, "/root/testdata/sf0.1", cores)
dt, n = bench.run_extraction_bench(spark, "/root/testdata/sf0.1", cores)
print(json.dumps({"t": dt, "n": n}))
"""

CONFIGS = [
    # name, cores, arrow batch, stage parts
    ("base_32_b64_p64", 32, "64", 64),
    ("c24_b64_p48", 24, "64", 48),
    ("c32_b128_p64", 32, "128", 64),
    ("c24_b128_p48", 24, "128", 48),
]


def main():
    rounds = int(os.environ.get("FS_ROUNDS", "3"))
    cool = int(os.environ.get("FS_COOL", "75"))
    out = {name: [] for name, *_ in CONFIGS}
    for r in range(rounds):
        for name, cores, batch, parts in CONFIGS:
            time.sleep(cool)
            env = {**os.environ, "FS_REPO": REPO, "FS_CORES": str(cores),
                   "FS_BATCH": batch, "FS_PARTS": str(parts)}
            p = subprocess.run([sys.executable, "-c", RUNNER], env=env,
                               capture_output=True, text=True, cwd=REPO,
                               timeout=1200)
            if p.returncode != 0:
                print(name, "FAILED", p.stderr[-2000:], file=sys.stderr)
                continue
            rec = json.loads(p.stdout.strip().splitlines()[-1])
            out[name].append(round(rec["t"], 3))
            print(json.dumps({"round": r, "config": name, "t": rec["t"]}),
                  flush=True)
    summary = {name: {"times": ts, "best": min(ts) if ts else None}
               for name, ts in out.items()}
    with open(os.path.join(REPO, "BENCH", "floor_sweep.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
