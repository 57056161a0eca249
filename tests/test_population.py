"""Population allocation waterfall: conservation + stage behavior
(FIXTURES.md §7)."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.io.synth import synth_pixels
from kblock_spark.ops.population import allocate_population, rescale_to_target
from kblock_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def popdata(spark):
    dfs = run_pipeline(spark, n_pages=3000, nx=2, ny=2, grid=2)
    blocks = dfs["blocks"].cache()
    # buildings: geocoded pages with a deterministic synthetic area
    buildings = (
        dfs["buildings"]
        .withColumn(
            "building_area",
            (F.pmod(F.xxhash64("url"), F.lit(90)) + F.lit(10)).cast("double"),
        )
        .select("block_id", "gadm_code", "lon", "lat", "building_area")
        .cache()
    )
    pixels = spark.createDataFrame(synth_pixels(2, 2)).cache()
    alloc = allocate_population(pixels, buildings, blocks).cache()
    return pixels, buildings, blocks, alloc


def test_population_conserved(popdata):
    pixels, _, _, alloc = popdata
    total_pix = pixels.agg(F.sum("population")).collect()[0][0]
    total_alloc = alloc.agg(F.sum("allocated_population")).collect()[0][0]
    assert total_alloc == pytest.approx(total_pix, rel=1e-9)


def test_one_row_per_block(popdata):
    _, _, blocks, alloc = popdata
    assert alloc.count() == blocks.count()
    assert alloc.where(F.col("allocated_population") < 0).count() == 0


def test_buildings_attract_population(popdata):
    _, buildings, _, alloc = popdata
    # blocks with buildings should on average get more population
    with_b = buildings.select("block_id").distinct()
    a = alloc.join(with_b, "block_id", "left_semi")
    b = alloc.join(with_b, "block_id", "left_anti")
    avg_with = a.agg(F.avg("allocated_population")).collect()[0][0]
    avg_without = b.agg(F.avg("allocated_population")).collect()[0][0] or 0.0
    assert avg_with > avg_without


def test_rescale_to_target(popdata):
    _, _, _, alloc = popdata
    adj = rescale_to_target(alloc, 12345.0)
    got = adj.agg(F.sum("allocated_population_adj")).collect()[0][0]
    assert got == pytest.approx(12345.0, rel=1e-9)
