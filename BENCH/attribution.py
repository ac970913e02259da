#!/usr/bin/env python
"""Scaling attribution experiment (north-rule 8→32 proxy).

Two measurements, cooldown protocol, fresh JVM each:
1. end-to-end extraction at local[8/16/24/32] on the identical 20k-doc
   corpus — locates the saturation knee;
2. the SAME Spark plan with pass-through kernels (decode + trivial
   output, no extraction math) at local[8] and local[32] — isolates the
   Spark+Arrow+shuffle machinery's own scaling from the kernels'.

Combined with the measured pure-kernel multiprocessing ceiling (0.89,
BENCH/BASELINE.md) this attributes the end-to-end efficiency gap.
"""
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
mode = os.environ["ATTR_MODE"]
import bench
spark = bench.make_spark(cores)
if mode == "extract":
    bench.run_extraction_bench(spark, "/root/testdata/sf0.1", cores, 4)
    times = []
    for _ in range(3):
        dt, n = bench.run_extraction_bench(spark, "/root/testdata/sf0.1",
                                           cores, 4)
        times.append(dt)
else:
    # pass-through: identical scan + build_page_work + two mapInPandas
    # stages + the stage-2 shuffle, but the kernels only decode and emit
    # markers — measures the Spark/Arrow machinery's own scaling
    import pandas as pd
    from extractpdf4j_spark.config import ExtractConfig
    from extractpdf4j_spark.corpusgen import ensure_fixture_corpus
    from extractpdf4j_spark.pipeline import (PAGE_RESULT_SCHEMA,
                                             COMBINED_SCHEMA,
                                             build_page_work)
    from extractpdf4j_spark.docmodel import (decode_glyph_blob,
                                             decode_media_payload)
    docs, media = ensure_fixture_corpus(spark, "/root/testdata/sf0.1")
    docs, media = bench._replicate(docs, media, 4)
    docs = docs.cache(); n = docs.count(); media.cache().count()
    pr_cols = [f.name for f in PAGE_RESULT_SCHEMA.fields]
    cb_cols = [f.name for f in COMBINED_SCHEMA.fields]

    def stage1(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                page = int(t.page) if t.page == t.page else -1
                if isinstance(t.glyph_blob, str) and t.glyph_blob:
                    decode_glyph_blob(page, t.glyph_blob)
                if t.payload is not None:
                    decode_media_payload(t.payload)
                rows.append((t.doc_id, page, "_page", "", [], [], 0.0,
                             0, 0, 0, 0))
            yield pd.DataFrame(rows, columns=pr_cols)

    def stage2(batches):
        for pdf in batches:
            out = [{"doc_id": d, "spans_json": "[]", "status": "ok",
                    "strategy": "", "tables_found": 0, "cells_parsed": 0,
                    "ocr_fallbacks": 0, "score": 0.0, "wall_ms": 0,
                    "partition_id": 0}
                   for d in pdf["doc_id"].unique()]
            yield pd.DataFrame(out, columns=cb_cols)

    def run_once():
        t0 = time.perf_counter()
        work = build_page_work(docs, media, ExtractConfig(), cores * 2)
        res = (work.mapInPandas(stage1, schema=PAGE_RESULT_SCHEMA)
               .repartition(cores * 2, "doc_id")
               .mapInPandas(stage2, schema=COMBINED_SCHEMA))
        res.count()
        return time.perf_counter() - t0

    run_once()
    times = [run_once() for _ in range(3)]
print(json.dumps({"cores": cores, "mode": mode,
                  "best": round(min(times), 3),
                  "times": [round(t, 3) for t in times], "n": 20000}))
spark.stop()
"""


def run(cores: int, mode: str) -> dict:
    time.sleep(int(os.environ.get("SPARK_GRAFT_COOLDOWN", "75")))
    r = subprocess.run(
        [sys.executable, "-c", RUNNER],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "ATTR_CORES": str(cores), "ATTR_MODE": mode,
             "ATTR_REPO": REPO},
        timeout=1800)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)
    res = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(res), flush=True)
    return res


def main():
    out = {"passthrough": {}, "extract": {}}
    # hottest-first within each family per the throttling protocol
    for cores in (32, 8):
        out["passthrough"][cores] = run(cores, "passthrough")
    for cores in (32, 24, 16, 8):
        out["extract"][cores] = run(cores, "extract")
    pt8, pt32 = (out["passthrough"][8]["best"],
                 out["passthrough"][32]["best"])
    ex8, ex32 = out["extract"][8]["best"], out["extract"][32]["best"]
    summary = {
        "passthrough_eff_8_32": round((pt8 / pt32) / 4, 3),
        "extract_eff_8_32": round((ex8 / ex32) / 4, 3),
        "extract_eff_8_16": round(
            (ex8 / out["extract"][16]["best"]) / 2, 3),
        "extract_eff_16_32": round(
            (out["extract"][16]["best"] / ex32) / 2, 3),
        "detail": out,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "attribution.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
