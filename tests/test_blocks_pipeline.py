"""End-to-end: synth city → block delineation → page PIP join.

Golden invariants (FIXTURES.md §4-5, north rule): exact block counts
per admin unit, area conservation, every in-extent point assigned to
exactly one block.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kblock_spark.io.synth import (
    ADMIN_SIZE_DEG,
    ORIGIN_LAT,
    ORIGIN_LON,
    synth_admin,
    synth_pages_spark,
    synth_streets,
)
from kblock_spark.kernels.blocks import delineate_blocks
from kblock_spark.kernels.extract import extract_text_udf, geocoded_points
from kblock_spark.ops.spatial_join import assign_points_to_polygons

NX = NY = 2
GRID = 2


@pytest.fixture(scope="module")
def city(spark):
    admin = spark.createDataFrame(synth_admin(NX, NY))
    streets = spark.createDataFrame(synth_streets(NX, NY, GRID))
    blocks = delineate_blocks(admin, streets).cache()
    blocks.count()
    return admin, streets, blocks


def test_block_counts_per_admin(city):
    _, _, blocks = city
    counts = {
        r["gadm_code"]: r["n"]
        for r in blocks.groupBy("gadm_code").agg(F.count("*").alias("n")).collect()
    }
    # each streeted unit: GRID interior lines each way → (GRID+1)^2
    # blocks; the last unit (no streets) → exactly 1 block
    assert counts["AAA.2.2_1"] == 1
    for code in ["AAA.1.1_1", "AAA.1.2_1", "AAA.2.1_1"]:
        assert counts[code] == (GRID + 1) ** 2
    total = (NX * NY - 1) * (GRID + 1) ** 2 + 1
    assert sum(counts.values()) == total


def test_area_conservation(city):
    _, _, blocks = city
    from kblock_spark.geo.mercator import lonlat_to_mercator
    from kblock_spark.geo.geom import ring_area

    # admin total area in mercator m²
    x0, y0 = lonlat_to_mercator(
        np.array([ORIGIN_LON]), np.array([ORIGIN_LAT])
    )
    x1, y1 = lonlat_to_mercator(
        np.array([ORIGIN_LON + NX * ADMIN_SIZE_DEG]),
        np.array([ORIGIN_LAT + NY * ADMIN_SIZE_DEG]),
    )
    admin_area = float((x1 - x0) * (y1 - y0))
    got = blocks.agg(F.sum("block_area")).collect()[0][0]
    assert got == pytest.approx(admin_area, rel=1e-3)


def test_block_ids_deterministic(city):
    _, _, blocks = city
    a = sorted(r["block_id"] for r in blocks.select("block_id").collect())
    b = sorted(r["block_id"] for r in blocks.select("block_id").collect())
    assert a == b and len(a) == len(set(a))
    assert all(bid.startswith("AAA.") for bid in a)


def test_extract_text_byte_identical(spark):
    pages = synth_pages_spark(spark, 500)
    bad = (
        pages.withColumn("ext", extract_text_udf(F.col("html")))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_pip_join_every_point_assigned_once(spark, city):
    _, _, blocks = city
    pages = synth_pages_spark(spark, 3000)
    pts = geocoded_points(pages)
    # restrict to the 2x2 test-city extent (generator uses 3x3)
    pts = pts.where(
        (F.col("lon") < ORIGIN_LON + NX * ADMIN_SIZE_DEG)
        & (F.col("lat") < ORIGIN_LAT + NY * ADMIN_SIZE_DEG)
    ).cache()
    n_pts = pts.count()
    assert n_pts > 500
    joined = assign_points_to_polygons(
        pts, blocks, point_cols=["url", "lon", "lat"], poly_key="block_id",
        poly_cols=["gadm_code"],
    ).cache()
    assert joined.count() == n_pts  # total partition: everyone lands
    assert joined.select("url").distinct().count() == n_pts
    # cell ids consistent: joined rows keep the point's tile id
    assert joined.where(F.col("cell").isNull()).count() == 0
    # correct admin unit: point's coords fall in the gadm square
    wrong = joined.where(
        (
            F.floor((F.col("lon") - F.lit(ORIGIN_LON)) / F.lit(ADMIN_SIZE_DEG))
            + F.lit(1)
        ).cast("int")
        != F.split(F.split("gadm_code", "\\.").getItem(1), "_").getItem(0).cast("int")
    ).count()
    assert wrong == 0


def test_pip_join_shuffled_path_matches_broadcast(spark, city):
    _, _, blocks = city
    pages = synth_pages_spark(spark, 1500)
    pts = geocoded_points(pages).where(
        (F.col("lon") < ORIGIN_LON + NX * ADMIN_SIZE_DEG)
        & (F.col("lat") < ORIGIN_LAT + NY * ADMIN_SIZE_DEG)
    )
    a = assign_points_to_polygons(
        pts, blocks, ["url", "lon", "lat"], broadcast_polys=True
    )
    b = assign_points_to_polygons(
        pts, blocks, ["url", "lon", "lat"], broadcast_polys=False, salt_buckets=4
    )
    pa = {(r["url"], r["block_id"]) for r in a.select("url", "block_id").collect()}
    pb = {(r["url"], r["block_id"]) for r in b.select("url", "block_id").collect()}
    assert pa == pb


def test_pip_auto_mode_switch(spark, city, monkeypatch):
    """broadcast_polys='auto' (the default) must pick the broadcast
    path only when the polygon side fits — the driver-side geometry
    collect must be unreachable at a planetary polygon count. The
    shuffle path is identified by the inlined __ring_sizes geometry
    it ships to the refine kernel."""
    from kblock_spark.ops import spatial_join as SJ

    _, _, blocks = city
    pages = synth_pages_spark(spark, 800)
    pts = geocoded_points(pages).where(
        (F.col("lon") < ORIGIN_LON + NX * ADMIN_SIZE_DEG)
        & (F.col("lat") < ORIGIN_LAT + NY * ADMIN_SIZE_DEG)
    )

    small = SJ.assign_points_to_polygons(pts, blocks, ["url", "lon", "lat"])
    assert "__ring_sizes" not in small._jdf.queryExecution().toString()

    # shrink the limit → the same call auto-routes to the shuffle path
    monkeypatch.setattr(SJ, "BROADCAST_MAX_POLYS", 1)
    big = SJ.assign_points_to_polygons(pts, blocks, ["url", "lon", "lat"])
    assert "__ring_sizes" in big._jdf.queryExecution().toString()

    pa = {(r["url"], r["block_id"]) for r in small.select("url", "block_id").collect()}
    pb = {(r["url"], r["block_id"]) for r in big.select("url", "block_id").collect()}
    assert pa == pb and len(pa) > 100


def test_population_stage2_broadcast_guard(spark, monkeypatch):
    """allocate_population's stage-2 block broadcast must auto-fall
    back to the shuffled cell join when the block side is over the
    limit — and produce identical allocations."""
    from kblock_spark.io.synth import synth_pixels
    from kblock_spark.ops import population as P
    from kblock_spark.ops import spatial_join as SJ
    from kblock_spark.pipeline import run_pipeline

    dfs = run_pipeline(spark, n_pages=2000, nx=2, ny=2)
    blocks = dfs["blocks"].cache()
    buildings = dfs["buildings"].withColumn(
        "building_area",
        (F.pmod(F.xxhash64("url"), F.lit(90)) + F.lit(10)).cast("double"),
    ).select("block_id", "gadm_code", "lon", "lat", "building_area").cache()
    pixels = spark.createDataFrame(synth_pixels(2, 2))

    base = P.allocate_population(pixels, buildings, blocks).collect()
    monkeypatch.setattr(SJ, "BROADCAST_MAX_POLYS", 1)
    guarded = P.allocate_population(pixels, buildings, blocks).collect()
    key = lambda rows: {
        (r["block_id"], round(r["allocated_population"], 9)) for r in rows
    }
    assert key(base) == key(guarded) and len(base) > 5


def test_suggest_pip_cell_deg(spark, city):
    """Derived tile size ≈ ¼ the median block bbox dimension, clamped;
    empty/degenerate inputs fall back to the fixed default."""
    from kblock_spark.geo.tiling import DEFAULT_CELL_DEG
    from kblock_spark.ops.spatial_join import suggest_pip_cell_deg

    _, _, blocks = city
    cd = suggest_pip_cell_deg(blocks)
    assert 1e-5 <= cd <= 1.0
    # sanity: within a decade of median-block-dim/4 for the test city
    import numpy as np

    dims = [
        max(
            max(r["coords"][0::2]) - min(r["coords"][0::2]),
            max(r["coords"][1::2]) - min(r["coords"][1::2]),
        )
        for r in blocks.select("coords").collect()
    ]
    want = float(np.median(dims)) / 4
    assert want / 3 <= cd <= want * 3

    empty = blocks.where("1=0")
    assert suggest_pip_cell_deg(empty) == DEFAULT_CELL_DEG
