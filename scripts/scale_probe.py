"""10x scale probe (VERDICT r5 task 7): run the flagship
PIP-join + k-complexity DAG at ~10x the bench input (7.2M pages vs
bench.py's 720k) and record the evidence a 100 TB capacity claim
needs:

- wall + throughput at the bigger input (does blocks/s hold or grow?)
- AQE evidence: the executed plan's AQEShuffleRead / coalesced
  partition nodes (adaptive re-planning actually engaged)
- spill evidence: task-level memory/disk spill bytes from the Spark
  status REST API, under a deliberately constrained heap
  (--memory 6g, spark.memory.fraction 0.3) so the shuffle/sort
  actually exceeds execution memory — proving the operators DEGRADE
  TO DISK instead of OOMing when the data outgrows memory

Usage:
  python scripts/scale_probe.py                 # full 10x probe
  python scripts/scale_probe.py --pages 1000000 --memory 4g  # smaller

Writes one JSON record to bench_runs/r6_scale_probe.json.
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
    ap.add_argument("--pages", type=int, default=7_200_000)
    ap.add_argument("--nx", type=int, default=12)
    ap.add_argument("--ny", type=int, default=12)
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--memory", default="6g",
                    help="driver/executor heap — small on purpose to force spill")
    ap.add_argument("--ui-port", type=int, default=4057)
    ap.add_argument("--out", default=os.path.join(REPO, "bench_runs", "r6_scale_probe.json"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("kblock-scale-probe")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", args.memory)
        # constrain execution memory so the big shuffle/sort spills —
        # the capacity claim is "degrades to disk", not "fits in RAM"
        .config("spark.memory.fraction", "0.3")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.ui_port))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import pandas as _pd

    from kblock_spark.io.synth import synth_admin, synth_pages_spark, synth_streets
    from kblock_spark.kernels.blocks import delineate_blocks
    from kblock_spark.kernels.extract import geocoded_points
    from kblock_spark.ops.spatial_join import (
        assign_points_to_polygons,
        suggest_pip_cell_deg,
    )
    from kblock_spark.pipeline import compute_k

    def _warm(it):
        import kblock_spark.geo.delaunay  # noqa: F401
        import kblock_spark.geo.geom  # noqa: F401
        import kblock_spark.kernels.complexity  # noqa: F401

        for _ in it:
            yield _pd.DataFrame({"x": [1]})

    spark.range(0, args.cpus * 4, 1, args.cpus * 4).mapInPandas(_warm, "x long").count()

    phases = {}
    t = time.time()
    admin = spark.createDataFrame(synth_admin(args.nx, args.ny))
    streets = spark.createDataFrame(synth_streets(args.nx, args.ny, args.grid))
    blocks = delineate_blocks(admin, streets).cache()
    n_blocks_total = blocks.count()
    phases["delineate_s"] = round(time.time() - t, 2)

    t = time.time()
    cd = suggest_pip_cell_deg(blocks)
    points = geocoded_points(synth_pages_spark(spark, args.pages), cd).cache()
    n_points = points.count()
    phases["synth_geocode_s"] = round(time.time() - t, 2)

    t0 = time.time()
    assigned = assign_points_to_polygons(
        points, blocks, point_cols=["url", "lon", "lat"],
        poly_key="block_id", poly_cols=["gadm_code"], cell_deg=cd,
        broadcast_polys=True,
    ).cache()
    assigned.count()
    phases["pip_s"] = round(time.time() - t0, 2)

    t = time.time()
    k = compute_k(blocks, assigned, streets, cd)
    n_blocks = k.count()
    phases["compute_k_s"] = round(time.time() - t, 2)
    measured = round(time.time() - t0, 2)

    # AQE evidence from the executed plan of the final job
    plan = k._jdf.queryExecution().executedPlan().toString()
    aqe = {
        "final_plan": "isFinalPlan=true" in plan,
        "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
        "coalesced_reads": plan.count("coalesced"),
    }

    # spill + shuffle totals from the status REST API (all stages)
    app_id = spark.sparkContext.applicationId
    stages = rest(args.ui_port, f"applications/{app_id}/stages?status=COMPLETE")
    totals = {
        "memory_spilled_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in stages) / 2**20, 1),
        "disk_spilled_mb": round(sum(s.get("diskBytesSpilled", 0) for s in stages) / 2**20, 1),
        "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in stages) / 2**20, 1),
        "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 1),
        "n_stages": len(stages),
    }
    rec = {
        "probe": "r6_10x_scale",
        "pages": args.pages,
        "points": n_points,
        "blocks": n_blocks,
        "blocks_total": n_blocks_total,
        "cores": args.cpus,
        "heap": args.memory,
        "memory_fraction": 0.3,
        "measured_sec": measured,
        "blocks_per_sec": round(n_blocks / measured, 1),
        "points_per_sec": round(n_points / measured, 1),
        "phases": phases,
        "aqe": aqe,
        "stage_totals": totals,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("PROBE " + json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
