#!/usr/bin/env python
"""One-off config sweep at local[32] on the 20k-doc corpus (cooldown
protocol): finds T32 reductions for the scaling-efficiency work. Each
config runs in a fresh JVM via bench.py machinery."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "baseline": {},
    "nocompress": {"SWEEP_EXTRA": json.dumps({
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false"})},
    "batch128": {"SWEEP_EXTRA": json.dumps({
        "spark.sql.execution.arrow.maxRecordsPerBatch": "128"})},
    "parts96": {"SWEEP_EXTRA": json.dumps({
        "spark.sql.shuffle.partitions": "96"})},
}

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")
from pyspark.sql import SparkSession
extra = json.loads(os.environ.get("SWEEP_EXTRA", "{{}}"))
b = (SparkSession.builder.master("local[32]")
     .config("spark.sql.shuffle.partitions", "64")
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
dt, n = bench.run_extraction_bench(spark, "/root/testdata/sf0.1", 32, 4)
times = []
for _ in range(3):
    dt, n = bench.run_extraction_bench(spark, "/root/testdata/sf0.1", 32, 4)
    times.append(dt)
print(json.dumps({{"best": round(min(times), 3), "times": [round(t,3) for t in times], "n": n}}))
spark.stop()
"""


def main():
    out = {}
    for name, env in CONFIGS.items():
        time.sleep(75)
        r = subprocess.run(
            [sys.executable, "-c", RUNNER.format(repo=REPO)],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, **env}, timeout=1800)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-500:]
        print(name, line, flush=True)
        out[name] = line
    print(json.dumps(out))


if __name__ == "__main__":
    main()
