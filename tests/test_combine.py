"""Combine + regional rollup (batch-5 semantics) over the full
synthetic pipeline."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.io.synth import synth_pixels
from kblock_spark.ops.combine import combine_blocks, regional_rollup
from kblock_spark.ops.population import allocate_population
from kblock_spark.pipeline import compute_k, run_pipeline


@pytest.fixture(scope="module")
def combined(spark):
    dfs = run_pipeline(spark, n_pages=2500, nx=2, ny=2, grid=2)
    blocks = dfs["blocks"].cache()
    buildings = (
        dfs["buildings"]
        .withColumn(
            "building_area",
            (F.pmod(F.xxhash64("url"), F.lit(90)) + F.lit(10)).cast("double"),
        )
    )
    k = dfs["complexity"]
    pop = allocate_population(
        spark.createDataFrame(synth_pixels(2, 2)),
        buildings.select("block_id", "gadm_code", "lon", "lat", "building_area"),
        blocks,
    )
    return blocks, combine_blocks(blocks, k, pop).cache()


def test_combined_complete(combined):
    blocks, c = combined
    assert c.count() == blocks.count()
    for col in ["k_complexity", "population_density", "k_bucket", "block_area_log"]:
        assert c.where(F.col(col).isNull()).count() == 0


def test_derived_metrics_guarded(combined):
    _, c = combined
    assert c.where(F.col("population_density") < 0).count() == 0
    assert c.where(F.col("block_area_log") < 0).count() == 0
    buckets = {r["k_bucket"] for r in c.select("k_bucket").distinct().collect()}
    assert buckets <= {f"{i:02d}" for i in range(1, 10)} | {"10+"}


def test_regional_rollup_conserves(combined):
    _, c = combined
    roll = regional_rollup(c).cache()
    assert roll.count() == 4  # 2x2 admin units
    total_pop = c.agg(F.sum("allocated_population")).collect()[0][0]
    roll_pop = roll.agg(F.sum("population")).collect()[0][0]
    assert roll_pop == pytest.approx(total_pop, rel=1e-9)
    # pivot columns partition the population
    pivot_cols = [f"pop_k_{i:02d}" for i in range(1, 10)] + ["pop_k_10plus"]
    s = roll.select(
        sum(F.col(p) for p in pivot_cols).alias("pivot_total"), "population"
    ).collect()
    for r in s:
        assert r["pivot_total"] == pytest.approx(r["population"], rel=1e-9)
    # weighted mean within observed k range
    kmin, kmax = c.agg(F.min("k_complexity"), F.max("k_complexity")).collect()[0]
    for r in roll.collect():
        assert kmin <= r["k_weighted_mean"] <= kmax

def test_street_linearity_golden(spark):
    """momepy.Linearity (batch_5:576-595) on hand-computed polylines:
    straight line → 1.0; right-angle L → chord/length = √2/2; the
    group mean is LENGTH-weighted."""
    import math

    import pandas as pd

    from kblock_spark.ops.combine import street_linearity_by_group

    rows = pd.DataFrame(
        {
            "street_id": [0, 1],
            "country_code": ["AAA", "AAA"],
            # straight, length 2
            # L-shape (1,0)->(1,1): length 2, chord sqrt(2)
            "coords": [
                [0.0, 0.0, 2.0, 0.0],
                [0.0, 0.0, 1.0, 0.0, 1.0, 1.0],
            ],
        }
    )
    got = street_linearity_by_group(
        spark.createDataFrame(rows), "country_code"
    ).collect()[0]
    lin_l = math.sqrt(2.0) / 2.0
    want_mean = (1.0 * 2.0 + lin_l * 2.0) / 4.0  # length-weighted
    assert got["n_streets"] == 2
    assert got["total_length"] == pytest.approx(4.0)
    assert got["mean_linearity"] == pytest.approx(want_mean, rel=1e-12)


def test_polyline_length_degenerate(spark):
    """<2-vertex polylines are 0-length (guarded; an unguarded
    F.sequence(0,-1) would read from the array end) and degenerate
    linearity is 1.0."""
    from kblock_spark.ops.combine import linearity_col, polyline_length_col

    df = spark.createDataFrame(
        [([],), ([3.0, 4.0],), ([0.0, 0.0, 3.0, 4.0],)],
        "coords array<double>",
    )
    rows = df.select(
        polyline_length_col("coords").alias("len"),
        linearity_col("coords").alias("lin"),
    ).collect()
    assert [r["len"] for r in rows] == [0.0, 0.0, 5.0]
    assert [r["lin"] for r in rows] == [1.0, 1.0, 1.0]


def test_combine_full_surface(spark, combined):
    """The reference's full 87-column combine surface
    (batch_5:345 all_data_col_list, minus its trailing geometry
    column which lives on the blocks table in this engine): exact
    column order, null-free, and the metric/bin identities."""
    from kblock_spark.ops.combine import (
        BIN_AREA_COL_LIST,
        COMBINE_FULL_COLS,
        combine_full,
    )
    from kblock_spark.ops.crosswalk import full_crosswalk

    dfs = run_pipeline(spark, n_pages=2500, nx=2, ny=2, grid=2)
    blocks = dfs["blocks"].cache()
    buildings = dfs["buildings"].withColumn(
        "building_area",
        (F.pmod(F.xxhash64("url"), F.lit(900)) + F.lit(10)).cast("double"),
    ).cache()
    k = dfs["complexity"]
    pop = allocate_population(
        spark.createDataFrame(synth_pixels(2, 2)),
        buildings.select("block_id", "gadm_code", "lon", "lat", "building_area"),
        blocks,
    ).select(
        "block_id",
        F.col("allocated_population").alias("population"),
        (F.col("allocated_population") * 1.1).alias("population_un"),
    ).cache()

    # minimal crosswalk fixture: one urban core + conurbation + agglo
    import numpy as np

    from kblock_spark.geo.geom import pack_rings
    from kblock_spark.io.synth import ADMIN_SIZE_DEG, ORIGIN_LAT, ORIGIN_LON

    def poly(x0, y0, w, h):
        return pack_rings(
            np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
        )

    sizes, coords = poly(ORIGIN_LON, ORIGIN_LAT, ADMIN_SIZE_DEG, ADMIN_SIZE_DEG)
    urban = spark.createDataFrame(
        [("u1", "Bigville", sizes, coords)],
        "urban_id string, urban_center_name string, "
        "ring_sizes array<int>, coords array<double>",
    )
    sizes2, coords2 = poly(ORIGIN_LON, ORIGIN_LAT, 2 * ADMIN_SIZE_DEG, ADMIN_SIZE_DEG)
    conur = spark.createDataFrame(
        [("c1", "Bigville-Metro-Area", sizes2, coords2)],
        "conurbation_id string, conurbation_area_name string, "
        "ring_sizes array<int>, coords array<double>",
    )
    agglos = spark.createDataFrame(
        [("ag1", "Bigville Agglo", "yes", sizes, coords)],
        "agglosid string, agglosname string, metropole string, "
        "ring_sizes array<int>, coords array<double>",
    )
    countries = spark.createDataFrame(
        [("AAA", "Aaaland", "Africa")],
        "country_code string, country_name string, continent string",
    )
    xwalk = full_crosswalk(blocks, urban, conur, agglos, countries)

    out = combine_full(blocks, k, buildings, pop, pop, xwalk).cache()
    assert out.columns == COMBINE_FULL_COLS
    assert len(out.columns) == 87  # 57 named + 30 bins
    assert out.count() == blocks.count()
    for col in (
        "k_labels", "k_labels_detailed", "building_area_m2",
        "landscan_population_un_log", "urban_layer_code", "area_type",
    ):
        assert out.where(F.col(col).isNull()).count() == 0, col

    # bin identities: per-block bin counts sum to building_count and
    # bin m² sums to building_area_m2 (exact: integer-valued areas)
    bin_count_sum = sum(F.col(f"`{c}`") for c in BIN_AREA_COL_LIST[:15])
    bin_m2_sum = sum(F.col(f"`{c}`") for c in BIN_AREA_COL_LIST[15:])
    bad = out.where(
        (bin_count_sum != F.col("building_count"))
        | (F.abs(bin_m2_sum - F.col("building_area_m2")) > 1e-6)
    ).count()
    assert bad == 0

    # k_labels semantics vs k and the off-network rule
    mism = out.where(
        (F.col("nearest_external_street_meters") < 200)
        & (F.col("k_complexity") < 10)
        & (F.col("k_labels") != F.col("k_complexity").cast("int").cast("string"))
    ).count()
    assert mism == 0
    # parcel identities (one Voronoi parcel per building in the ref)
    assert out.where(F.col("parcel_count") != F.col("building_count")).count() == 0
