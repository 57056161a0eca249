"""K2 compute_layers: per-building layer membership consistency with
compute_k."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.pipeline import compute_k, compute_layers, run_pipeline


@pytest.fixture(scope="module")
def city(spark):
    dfs = run_pipeline(spark, n_pages=2500, nx=2, ny=2, grid=2)
    dfs["blocks"] = dfs["blocks"].cache()
    dfs["buildings"] = dfs["buildings"].cache()
    return dfs


def test_layers_match_compute_k(spark, city):
    k = compute_k(city["blocks"], city["buildings"], city["streets"]).cache()
    lay = compute_layers(
        city["blocks"], city["buildings"], city["streets"]
    ).cache()
    # one row per assigned building
    assert lay.count() == city["buildings"].count()
    # per-block layer counts rebuild the building_layers string tail
    agg = (
        lay.groupBy("block_id", "layer")
        .agg(F.count("*").alias("n"))
        .orderBy("block_id", "layer")
        .collect()
    )
    by_block = {}
    for r in agg:
        by_block.setdefault(r["block_id"], {})[r["layer"]] = r["n"]
    k_rows = {r["block_id"]: r for r in k.collect()}
    for bid, counts in by_block.items():
        expect = [int(c) for c in k_rows[bid]["building_layers"].split(",")]
        # layer indices are 1-based positions into the layer string
        for layer_idx, n in counts.items():
            assert expect[layer_idx - 1] == n, (bid, layer_idx)
        # max layer == k
        assert max(counts) == k_rows[bid]["k_complexity"]
    # k_complexity column consistent across rows of a block
    bad = (
        lay.join(k.select("block_id", F.col("k_complexity").alias("k2")), "block_id")
        .where(F.col("k_complexity") != F.col("k2"))
        .count()
    )
    assert bad == 0
