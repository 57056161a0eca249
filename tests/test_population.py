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


def test_stage3_per_admin_residual(spark, popdata):
    """batch_3:312-318: when the raster carries an admin assignment,
    each unit's residual pool is shared within that unit — two admin
    units with different residual pools must get different shares,
    NULL-admin pools fall back globally, and conservation still holds
    exactly."""
    pixels, buildings, blocks, _ = popdata
    admins = sorted(
        r["gadm_code"]
        for r in buildings.select("gadm_code").distinct().collect()
    )
    assert len(admins) >= 2
    g0, g1 = admins[0], admins[1]
    # pixels far outside the extent → guaranteed stage-3 residuals,
    # with per-admin pools of very different size + one NULL pool
    extra = spark.createDataFrame(
        [
            (900001, 50.0, 50.0, 50.004, 50.004, 1000.0, g0),
            (900002, 51.0, 51.0, 51.004, 51.004, 10.0, g1),
            (900003, 52.0, 52.0, 52.004, 52.004, 7.0, None),
        ],
        "pixel_id long, xmin double, ymin double, xmax double, ymax double, population double, gadm_code string",
    )
    base = pixels.withColumn("gadm_code", F.lit(None).cast("string"))
    px = base.unionByName(extra)
    alloc = allocate_population(px, buildings, blocks).cache()

    total_pix = px.agg(F.sum("population")).collect()[0][0]
    total_alloc = alloc.agg(F.sum("allocated_population")).collect()[0][0]
    assert total_alloc == pytest.approx(total_pix, rel=1e-9)

    # compare against the all-global allocation: g0's blocks must gain
    # much more than g1's (1000 vs 10 routed INSIDE each unit)
    glob = allocate_population(
        px.drop("gadm_code"), buildings, blocks
    ).withColumnRenamed("allocated_population", "glob_pop")
    d = (
        alloc.join(glob, ["block_id", "gadm_code"])
        .groupBy("gadm_code")
        .agg(F.sum(F.col("allocated_population") - F.col("glob_pop")).alias("delta"))
        .collect()
    )
    delta = {r["gadm_code"]: r["delta"] for r in d}
    # each unit's net gain vs global ≈ its own pool minus its global
    # share of the (1000+10) pool — g0 gains, g1 loses
    assert delta[g0] > 100.0
    assert delta[g1] < 0.0


def test_stage3_orphan_admin_pool_falls_back_globally(spark, popdata):
    """A residual pool keyed to an admin unit with zero building area
    must roll into the global pool, not vanish."""
    pixels, buildings, blocks, _ = popdata
    extra = spark.createDataFrame(
        [(900009, 60.0, 60.0, 60.004, 60.004, 55.0, "ZZZ.404_1")],
        "pixel_id long, xmin double, ymin double, xmax double, ymax double, population double, gadm_code string",
    )
    px = pixels.withColumn("gadm_code", F.lit(None).cast("string")).unionByName(extra)
    alloc = allocate_population(px, buildings, blocks)
    total_pix = px.agg(F.sum("population")).collect()[0][0]
    total_alloc = alloc.agg(F.sum("allocated_population")).collect()[0][0]
    assert total_alloc == pytest.approx(total_pix, rel=1e-9)


def test_zonal_oracle_conserves_population(spark):
    # the hard-oracled waterfall fixture: quantized totals equal the
    # raster total to within one rounding unit per contribution
    from kblock_spark.queries import _ZN_NPX, geo_zonal_oracle

    out = geo_zonal_oracle(spark, "/root/testdata/sf0.001").toPandas()
    total = sum((i * 37 + 11) % 500 + 50 for i in range(_ZN_NPX * _ZN_NPX))
    assert abs(out.pop_e6.sum() / 1e6 - total) < 1.0
    assert len(out) == 32  # every (block, gadm) combo materialized
