"""Corpus-pipeline scale probe (round 7): the webtext axis' analogue
of scripts/scale_probe.py. Runs the heaviest training-data operators
— d30 (quality → dedup → split → mixing → packing) and d31
(incremental cross-corpus MinHash dedup) — over the sf0.1 documents
table replicated K× with deterministically re-keyed, per-replica
perturbed rows (a distinct leading token per replica, so the exact
and prefix fingerprints stay distinct and nothing synthesizes new
external data), and records the 100 TB evidence:

- wall + throughput (docs/s) at 1× / K× — does per-doc cost hold?
- spill + shuffle totals from the status REST API under a
  constrained heap (the claim is "degrades to disk", not "fits")
- AQE evidence from the executed plans

Usage:
  python scripts/corpus_probe.py                  # 1x, 4x, 10x
  python scripts/corpus_probe.py --scales 1 10 --memory 4g
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rest(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 4, 10])
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--memory", default="6g")
    ap.add_argument("--ui-port", type=int, default=4049)
    ap.add_argument("--out", default="bench_runs/r7_corpus_probe.json")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("kblock-corpus-probe")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", args.memory)
        .config("spark.memory.fraction", "0.3")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.ui_port))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from kblock_spark.queries import d30_training_pipeline, d31_incremental_dedup

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = base.count()
    stage_seen = 0

    def stage_delta():
        nonlocal stage_seen
        app_id = spark.sparkContext.applicationId
        stages = rest(args.ui_port, f"applications/{app_id}/stages?status=COMPLETE")
        new = [s for s in stages if s["stageId"] >= stage_seen]
        stage_seen = max((s["stageId"] + 1 for s in stages), default=stage_seen)
        return {
            "memory_spilled_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**20, 1),
            "disk_spilled_mb": round(sum(s.get("diskBytesSpilled", 0) for s in new) / 2**20, 1),
            "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in new) / 2**20, 1),
            "n_stages": len(new),
        }

    runs = []
    for k in args.scales:
        # K deterministic replicas: re-keyed ids, one distinct leading
        # token per replica (fingerprints distinct; NO external data)
        scaled_dir = f"/tmp/kblock_corpus_probe_{k}x"
        if not os.path.exists(scaled_dir):
            reps = [
                base.select(
                    (F.col("doc_id") + F.lit(i * n_base)).alias("doc_id"),
                    F.concat(F.lit(f"r{i} "), F.col("text")).alias("text")
                    if i else F.col("text"),
                    "lang", "source", "n_chars",
                ).select("doc_id", "text", "lang", "source", "n_chars")
                for i in range(k)
            ]
            df = reps[0]
            for r in reps[1:]:
                df = df.unionByName(r)
            df.repartition(args.cpus).write.mode("overwrite").parquet(scaled_dir)
        n_docs = k * n_base
        rec = {"scale": k, "n_docs": n_docs}
        for name, fn in (("d30", d30_training_pipeline), ("d31", d31_incremental_dedup)):
            stage_delta()  # reset the stage window
            t0 = time.time()
            out = fn(spark, _dir_shim(spark, scaled_dir))
            n_out = out.count()
            el = round(time.time() - t0, 2)
            rec[name] = {
                "sec": el,
                "rows_out": n_out,
                "docs_per_sec": round(n_docs / el, 1),
                "stages": stage_delta(),
            }
        runs.append(rec)
        print("CPROBE " + json.dumps(rec), flush=True)

    result = {"probe": "r7_corpus_scale", "cores": args.cpus,
              "heap": args.memory, "memory_fraction": 0.3,
              "base_docs": n_base, "runs": runs}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("CPROBE_FINAL " + json.dumps(result), flush=True)
    spark.stop()


_SHIMS: dict = {}


def _dir_shim(spark, scaled_dir: str) -> str:
    """The registry queries read <sf_dir>/documents.parquet; give the
    scaled parquet that layout via a symlink dir."""
    if scaled_dir in _SHIMS:
        return _SHIMS[scaled_dir]
    shim = scaled_dir + "_sfdir"
    os.makedirs(shim, exist_ok=True)
    link = os.path.join(shim, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(scaled_dir, link)
    _SHIMS[scaled_dir] = shim
    return shim


if __name__ == "__main__":
    main()
