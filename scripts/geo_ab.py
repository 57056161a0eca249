"""Interleaved A/B of the two remaining geo-headline constants
(VERDICT r7 #8): the PIP tile-size fraction (suggest_pip_cell_deg)
and the kernel packing partition count (compute_k nparts).

Each sample runs the bench geo pipeline in a FRESH subprocess (same
discipline as bench.py geo_run); variants alternate so host-regime
drift hits all arms equally. Ship a non-default only if >=1.05x.

Usage: python scripts/geo_ab.py [pages] [reps]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 720_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SNIPPET = """
import json, sys, time
sys.path.insert(0, {repo!r})
from kblock_spark.session import get_spark
from kblock_spark.io.synth import synth_admin, synth_streets, synth_pages_spark
from kblock_spark.kernels.blocks import delineate_blocks
from kblock_spark.kernels.extract import geocoded_points
from kblock_spark.ops.spatial_join import assign_points_to_polygons, suggest_pip_cell_deg
from kblock_spark.pipeline import compute_k
import pandas as _pd

cores = {cores}
spark = get_spark("geoab-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=max(cores, 8))
def _warm(it):
    import kblock_spark.kernels.complexity  # noqa: F401
    import kblock_spark.geo.delaunay  # noqa: F401
    import kblock_spark.geo.geom  # noqa: F401
    for _ in it:
        yield _pd.DataFrame({{"x": [1]}})
spark.range(0, cores * 4, 1, cores * 4).mapInPandas(_warm, "x long").count()
admin = spark.createDataFrame(synth_admin(8, 8))
streets = spark.createDataFrame(synth_streets(8, 8, 6))
blocks = delineate_blocks(admin, streets).cache(); blocks.count()
cd = suggest_pip_cell_deg(blocks, fraction={fraction})
points = geocoded_points(synth_pages_spark(spark, {pages}), cd).cache()
n_points = points.count()
t0 = time.time()
assigned = assign_points_to_polygons(
    points, blocks, point_cols=["url", "lon", "lat"],
    poly_key="block_id", poly_cols=["gadm_code"], cell_deg=cd,
    broadcast_polys=True).cache()
assigned.count()
k = compute_k(blocks, assigned, streets, cd, nparts={nparts})
n_blocks = k.count()
elapsed = time.time() - t0
print("GEORESULT " + json.dumps({{
    "blocks": n_blocks, "sec": round(elapsed, 3),
    "bps": round(n_blocks / elapsed, 3)}}))
spark.stop()
"""


def run(fraction, nparts):
    code = SNIPPET.format(
        repo=REPO, cores=CPUS, pages=PAGES, fraction=fraction, nparts=nparts
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("GEORESULT "):
            return json.loads(line[len("GEORESULT "):])
    print(out.stderr[-1500:], file=sys.stderr)
    return None


def burn(seconds=45):
    code = (
        "import numpy as np, time\n"
        "rng = np.random.default_rng(0)\n"
        "t0 = time.time()\n"
        f"while time.time() - t0 < {seconds}:\n"
        "    a = rng.uniform(0, 1, (500, 500)); b = a @ a\n"
    )
    ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(CPUS)]
    for p in ps:
        p.communicate()


def main():
    variants = [
        ("base f=0.25 np=4x", 0.25, CPUS * 4),
        ("f=0.35", 0.35, CPUS * 4),
        ("np=2x", 0.25, CPUS * 2),
        ("f=0.18", 0.18, CPUS * 4),
    ]
    burn(45)
    results = {name: [] for name, *_ in variants}
    for rep in range(REPS):
        for name, f, np_ in variants:
            r = run(f, np_)
            if r:
                results[name].append(r["bps"])
            print(f"rep{rep} {name:18s} {r}", flush=True)
    print("\n== best-of per variant ==")
    for name, vals in results.items():
        if vals:
            print(f"{name:18s} best={max(vals):8.1f} all={vals}")
    with open(os.path.join(REPO, "bench_runs", "r8_geo_ab.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
