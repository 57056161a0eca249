"""Quantify the e02 giant-LIST tail (VERDICT r3 item 5).

The exact ε-pair join (ops/similarity.exact_dup_pairs_blocked) does
its quadratic work inside per-(list, split) applyInPandas tasks. A
degenerate corpus where ONE IVF list holds ≥50% of all vectors
concentrates that GEMM in a single task — the vector-side analogue of
the giant geometry block. ``home_splits = S`` shards the list's home
rows across S tasks (replicas duplicated), so the single-task wall
should fall ~1/S while the per-task GEMM tile stays bounded by
_GEMM_TILE_ELEMS regardless of list size.

This script builds such a fixture (one diffuse 60%-of-N blob + 3
satellite clusters, k_lists=4 so k-means cannot split the blob),
measures wall time at S = 1, 2, 4, 8 on the same input, and reports
the realized list-size distribution plus the per-task tile bound.

Run: python scripts/bench_e02_giant_list.py [N] [dim]
Prints one JSON line; numbers are recorded in BASELINE.md.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
THRESHOLD = 0.95
K_LISTS = 4


def build_fixture(spark):
    import pandas as pd

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((4, DIM))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    n_big = int(N * 0.6)
    n_small = (N - n_big) // 3
    parts = [centers[0] + rng.standard_normal((n_big, DIM)) * 0.04]
    for c in range(1, 4):
        parts.append(
            centers[c] + rng.standard_normal((n_small, DIM)) * 0.04
        )
    X = np.vstack(parts)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "embedding": [r.tolist() for r in X]}
    )
    return spark.createDataFrame(pdf).repartition(32).cache()


def main():
    from kblock_spark.ops.similarity import (
        _GEMM_TILE_ELEMS,
        assign_ivf_lists,
        exact_dup_pairs_blocked,
    )
    from kblock_spark.session import get_spark

    spark = get_spark("e02-giant-list", master="local[32]",
                      shuffle_partitions=32)
    emb = build_fixture(spark)
    emb.count()

    from pyspark.sql import functions as F

    assign = assign_ivf_lists(emb, THRESHOLD, k_lists=K_LISTS)
    sizes = (
        assign.groupBy("list_id")
        .agg(
            F.sum(F.when(F.col("is_home"), 1).otherwise(0)).alias("h"),
            F.count("*").alias("r"),
        )
        .collect()
    )
    biggest = max(sizes, key=lambda s: s["r"])
    share = biggest["h"] / N

    out = {
        "n": N, "dim": DIM, "threshold": THRESHOLD, "k_lists": K_LISTS,
        "giant_list_home_share": round(share, 3),
        "giant_list_rows": biggest["r"],
        "gemm_tile_elems_cap": _GEMM_TILE_ELEMS,
        # per-task GEMM matrix is (min(tile, |H_shard|) x |R|) with
        # tile = cap // |R| -> bounded by the cap BY CONSTRUCTION;
        # report the realized bound for the giant list
        "giant_list_max_tile_elems": min(
            max(1, _GEMM_TILE_ELEMS // biggest["r"]) * biggest["r"],
            _GEMM_TILE_ELEMS,
        ),
        "splits": {},
    }
    n_pairs = None
    for S in (1, 2, 4, 8):
        t0 = time.time()
        cnt = exact_dup_pairs_blocked(
            emb, THRESHOLD, k_lists=K_LISTS, home_splits=S
        ).count()
        wall = time.time() - t0
        if n_pairs is None:
            n_pairs = cnt
        assert cnt == n_pairs, f"pair count changed at S={S}: {cnt} != {n_pairs}"
        out["splits"][str(S)] = {"sec": round(wall, 2), "pairs": cnt}
    out["speedup_1_to_8"] = round(
        out["splits"]["1"]["sec"] / out["splits"]["8"]["sec"], 2
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
