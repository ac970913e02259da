"""Scale probe: dHash + banded-Hamming pair generation at 200k images.

The gate corpora exercise the perceptual-dedup family at ~100-600
assets, where session fixed costs dominate; this probe measures the
operator itself at 1000x that. Generation is UNTIMED (materialized to
parquet first, exactly the `resize_images` output shape the operators
consume), so the timed region is only:

    read parquet -> image_dhash (codegen projection)
                 -> dhash_pairs (one band shuffle + one pair groupBy)
                 -> count()

Corpus: 200k images, 216-px rows (9x8x3, the standard dHash input).
Every 20-image group carries 2 near-clones of its first member (one
channel nudged by +8*k — below the per-row comparison threshold for
most positions, so the clone lands within a few Hamming bits), the
other 17 i.i.d. uniform — a realistic ~10% near-dup rate with ~20k
true pairs planted.

Run: PYTHONPATH=/root/repo python scripts/perceptual_scale_probe.py
Output: one JSON line {n_images, gen_s, probe_s, images_per_s, pairs}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from extractpdf4j_spark.functions.multimodal import (  # noqa: E402
    image_dhash, dhash_pairs)

N_IMAGES = int(os.environ.get("PROBE_N", "200000"))
OUT = "/tmp/dhash_probe_{}.parquet".format(N_IMAGES)
W, H = 9, 8


def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        rows = []
        for i in ids:
            g, m = divmod(int(i), 20)
            base = g * 20 if m in (1, 2) else int(i)
            rng = np.random.default_rng(base + 7)
            px = rng.integers(0, 256, size=W * H * 3, dtype=np.int64)
            if m in (1, 2):           # near-clone: nudge one channel
                px = px.copy()
                px[3 * m] = min(255, int(px[3 * m]) + 8 * m)
            rows.append((f"img-{i:07d}", f"doc-{g:06d}", px.tolist()))
        yield pd.DataFrame(rows, columns=["asset_id", "doc_id", "pixels"])


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .appName("dhash-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if not os.path.exists(OUT):
        (spark.range(0, N_IMAGES, 1, 64)
         .mapInPandas(_gen, schema="asset_id string, doc_id string, "
                                   "pixels array<long>")
         .write.mode("overwrite").parquet(OUT))
    gen_s = time.time() - t0

    # two passes on fresh plans: pass 1 pays whole-stage-codegen compile
    # (the 64-term dHash projection + band join), pass 2 is steady state
    times, n_pairs = [], 0
    for _ in range(2):
        resized = spark.read.parquet(OUT)
        t1 = time.time()
        hashes = image_dhash(resized, out_w=W, out_h=H)
        # PROBE_BAND_BYTES unset → dhash_pairs' own default, so this
        # probe certifies exactly what a defaults-call ships (r4's trap
        # was a probe default pinned to the unsafe band_bytes=1)
        _bb = os.environ.get("PROBE_BAND_BYTES")
        pairs = dhash_pairs(hashes, max_hamming=6,
                            **({"band_bytes": int(_bb)} if _bb else {}),
                            max_bucket=200)
        n_pairs = pairs.count()
        times.append(time.time() - t1)

    # Exact-recall assertion on the planted ground truth: each 20-image
    # group plants clones at members 1 and 2 of member 0; the +8*m
    # one-channel nudge flips at most ~2 bits of one hash row, so all
    # 3*(N/20) within-triplet pairs are true ≤4-bit pairs and (with
    # 16-bit bands) structurally share ≥3 unchanged bands. r4's probe
    # measured 17,285/30,000 at the old band_bytes=1 default (hot-bucket
    # cap losses) vs 30,000/30,000 at 2 — this assertion pins the
    # DEFAULT-call recall at scale.
    planted = (pairs
               .select(F.col("asset_a").alias("a"),
                       F.col("asset_b").alias("b"))
               .withColumn("ga", F.regexp_extract("a", r"img-(\d+)", 1)
                           .cast("long"))
               .withColumn("gb", F.regexp_extract("b", r"img-(\d+)", 1)
                           .cast("long"))
               .filter((F.expr("ga div 20") == F.expr("gb div 20"))
                       & (F.col("ga") % 20 < 3) & (F.col("gb") % 20 < 3))
               .count())
    expected = 3 * (N_IMAGES // 20)
    assert planted == expected, (
        f"planted-pair recall {planted}/{expected}: the defaults lost "
        "true pairs (band_bytes/max_bucket regression)")

    print(json.dumps({
        "n_images": N_IMAGES, "gen_s": round(gen_s, 2),
        "first_s": round(times[0], 2), "steady_s": round(times[1], 2),
        "images_per_s": round(N_IMAGES / times[1], 1),
        "pairs": n_pairs,
        "planted_recall": f"{planted}/{expected}",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
