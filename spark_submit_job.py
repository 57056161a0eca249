"""spark-submit entry point (north rule: run via spark-submit
--py-files at two cluster sizes).

Usage (cluster):
  zip -r kblock_spark.zip kblock_spark
  spark-submit --master <cluster> --py-files kblock_spark.zip \
      spark_submit_job.py --pages 1000000 --nx 8 --ny 8 --grid 5 \
      --out /path/to/out --manifest /path/to/manifest

Sandbox evidence (local two-size scaling): bench.py runs the same
DAG at local[N/4] and local[N] and reports scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60_000)
    ap.add_argument("--nx", type=int, default=5)
    ap.add_argument("--ny", type=int, default=5)
    ap.add_argument("--grid", type=int, default=4)
    ap.add_argument("--master", default=None)
    ap.add_argument("--out", default=None, help="parquet output dir")
    ap.add_argument("--manifest", default=None, help="checkpoint manifest dir")
    ap.add_argument(
        "--table",
        default=None,
        help="snapshot-table dir: commit the k output as an Iceberg-style "
        "append snapshot (io/tableformat.py) instead of a plain write — "
        "downstream consumers read it incrementally by snapshot id",
    )
    args = ap.parse_args(argv)

    from kblock_spark.session import get_spark
    from kblock_spark.pipeline import run_pipeline

    spark = get_spark("kblock-submit", master=args.master)
    t0 = time.time()
    dfs = run_pipeline(
        spark, n_pages=args.pages, nx=args.nx, ny=args.ny, grid=args.grid
    )
    k = dfs["complexity"]
    if args.out and args.manifest:
        # resumable write: one partition per gadm prefix
        from pyspark.sql import functions as F
        from kblock_spark.io.manifest import CheckpointManifest, checkpointed_run

        kk = k.withColumn(
            "part_key", F.substring_index("block_id", "_", 1)
        )
        man = CheckpointManifest(spark, args.manifest)
        n = checkpointed_run(
            spark, kk, "part_key", lambda df: df, args.out, man
        )
        print(json.dumps({"partitions_processed": n, "sec": time.time() - t0}))
    elif args.table:
        from kblock_spark.io.tableformat import append_snapshot

        sid = append_snapshot(k, args.table, stat_cols=["block_id"])
        n_blocks = k.count()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "blocks": n_blocks,
                    "snapshot_id": sid,
                    "sec": round(dt, 2),
                    "blocks_per_sec": round(n_blocks / dt, 2),
                }
            )
        )
    else:
        n_blocks = k.count()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "blocks": n_blocks,
                    "sec": round(dt, 2),
                    "blocks_per_sec": round(n_blocks / dt, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
