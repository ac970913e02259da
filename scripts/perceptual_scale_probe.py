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

    print(json.dumps({
        "n_images": N_IMAGES, "gen_s": round(gen_s, 2),
        "first_s": round(times[0], 2), "steady_s": round(times[1], 2),
        "images_per_s": round(N_IMAGES / times[1], 1),
        "pairs": n_pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
