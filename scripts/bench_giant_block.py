"""Quantify the compute_k giant-block tail (VERDICT r2 item 4).

The k-kernel is per-block sequential (the layer peel is a BFS over
the block's Delaunay adjacency), so the k-stage critical path is
max(single biggest block kernel wall, total_work / nparts) — LPT
placement removes stragglers from co-location but cannot shrink one
giant block. This script measures the kernel wall as the building
count grows from the bench median (~233 buildings/block at sf0.1) to
10x and 100x, on a fixed-size city block with streets.

Run: python scripts/bench_giant_block.py
Prints one JSON line; numbers are recorded in BASELINE.md.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from kblock_spark.kernels.complexity import compute_k_block  # noqa: E402


def giant_block(n_buildings: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    # ~1.1 km square block at the equator with a boundary street grid
    side = 0.01
    shell = np.array(
        [[0.0, 0.0], [side, 0.0], [side, side], [0.0, side]]
    )
    pts = rng.uniform(0.0005, side - 0.0005, (n_buildings, 2))
    streets = [
        np.array([[0.0, 0.0], [side, 0.0]]),
        np.array([[side, 0.0], [side, side]]),
        np.array([[0.0, 0.0], [0.0, side]]),
        np.array([[0.0, side / 2], [side, side / 2]]),
    ]
    return shell, [], pts, streets


def main():
    out = {}
    for n in (233, 2330, 23300):
        shell, holes, pts, streets = giant_block(n)
        t0 = time.time()
        row = compute_k_block(shell, holes, pts, streets)
        wall = time.time() - t0
        out[str(n)] = {
            "wall_sec": round(wall, 3),
            "k": row["k_complexity"],
            "buildings": n,
        }
        print(f"n={n}: {wall:.2f}s k={row['k_complexity']}", file=sys.stderr)
    r10 = out["2330"]["wall_sec"] / max(out["233"]["wall_sec"], 1e-9)
    r100 = out["23300"]["wall_sec"] / max(out["233"]["wall_sec"], 1e-9)
    out["growth_10x"] = round(r10, 2)
    out["growth_100x"] = round(r100, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
