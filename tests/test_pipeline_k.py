"""Spark-level end-to-end k-complexity over the synthetic city."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipe(spark):
    dfs = run_pipeline(spark, n_pages=4000, nx=2, ny=2, grid=2)
    dfs["blocks"] = dfs["blocks"].cache()
    dfs["buildings"] = dfs["buildings"].cache()
    dfs["complexity"] = dfs["complexity"].cache()
    return dfs


def test_one_row_per_block(pipe):
    n_blocks = pipe["blocks"].count()
    n_k = pipe["complexity"].count()
    assert n_k == n_blocks
    assert pipe["complexity"].select("block_id").distinct().count() == n_blocks


def test_building_count_conservation(pipe):
    total_assigned = pipe["buildings"].count()
    total_counted = pipe["complexity"].agg(F.sum("building_count")).collect()[0][0]
    assert total_counted == total_assigned


def test_layer_sums_match_counts(pipe):
    bad = (
        pipe["complexity"]
        .withColumn(
            "layer_sum",
            F.aggregate(
                F.transform(F.split("building_layers", ","), lambda s: s.cast("int")),
                F.lit(0),
                lambda a, x: a + x,
            ),
        )
        .where(F.col("layer_sum") != F.col("building_count"))
        .count()
    )
    assert bad == 0


def test_k_values_sane(pipe):
    rows = pipe["complexity"].collect()
    assert all(r["k_complexity"] >= 1 for r in rows)
    assert all(
        r["k_complexity"] == len(r["building_layers"].split(",")) for r in rows
    )
    # streeted city: most populated blocks should be street-adjacent
    pop = [r for r in rows if r["building_count"] > 0]
    assert len(pop) > 10
    # on-network street length positive for blocks in streeted units
    streeted = [
        r for r in rows
        if not r["block_id"].startswith("AAA.2.2_1") and r["building_count"] > 1
    ]
    assert sum(1 for r in streeted if r["on_network_street_length"] > 0) >= len(streeted) * 0.9


def test_deterministic_rerun(spark, pipe):
    k1 = {
        (r["block_id"], r["k_complexity"], r["building_layers"])
        for r in pipe["complexity"].collect()
    }
    dfs2 = run_pipeline(spark, n_pages=4000, nx=2, ny=2, grid=2)
    k2 = {
        (r["block_id"], r["k_complexity"], r["building_layers"])
        for r in dfs2["complexity"].collect()
    }
    assert k1 == k2


def test_giant_block_kernel_bounded():
    """Regression guard for the giant-block tail (BASELINE.md round-3
    measurement): a 10x-median block must stay well under the linear
    extrapolation — a quadratic regression in any kernel phase would
    blow past this generous wall."""
    import sys
    import time

    sys.path.insert(0, "scripts")
    from bench_giant_block import giant_block

    from kblock_spark.kernels.complexity import compute_k_block

    shell, holes, pts, streets = giant_block(2330)
    t0 = time.time()
    row = compute_k_block(shell, holes, pts, streets)
    wall = time.time() - t0
    assert row["building_count"] == 2330
    assert row["k_complexity"] >= 10
    assert wall < 10.0, f"10x-median block took {wall:.1f}s (expected ~0.5s)"
