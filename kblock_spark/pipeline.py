"""The flagship DAG: pages → geocoded points → blocks → PIP join →
k-complexity. One Spark plan, three shuffles total (by gadm_code for
delineation, by cell for the PIP join when not broadcast, by block_id
for the k kernel).

Mirrors the reference pipeline stages 1b → 2 → 4
(kblock/batch_1b_generate_blocks.py, batch_2_prepare_buildings.py,
batch_4_compute_k.py) as a single declarative dataflow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .geo.geom import sample_polyline
from .geo.tiling import DEFAULT_CELL_DEG, cell_of, expand_cells
from .io.synth import synth_admin, synth_pages_spark, synth_streets
from .kernels.blocks import delineate_blocks
from .kernels.complexity import K_SCHEMA, compute_k_kernel
from .kernels.extract import geocoded_points
from .ops.spatial_join import assign_points_to_polygons, make_covering_cells_udf


def make_line_cells_udf(cell_deg: float = DEFAULT_CELL_DEG):
    """Street line → cells it passes through (sampled at half-cell
    step; the line-side analogue of polygon covering)."""

    @pandas_udf(ArrayType(LongType()))
    def line_cells(coords: pd.Series) -> pd.Series:
        out = []
        for c in coords:
            line = np.asarray(c, dtype=np.float64).reshape(-1, 2)
            samp = sample_polyline(line, cell_deg / 2.0)
            out.append(np.unique(cell_of(samp[:, 0], samp[:, 1], cell_deg)).tolist())
        return pd.Series(out)

    return line_cells


def streets_near_blocks(
    streets: DataFrame, blocks: DataFrame, cell_deg: float = DEFAULT_CELL_DEG
) -> DataFrame:
    """(block_id, s_coords) pairs: streets within one tile ring
    (≥ 2× the 100 m buffer radius) of each block — the distributed
    version of the reference's 100 m-buffered street↔block overlay
    (batch_4:545-549). Tile equi-join, then distinct pairs."""
    lc = make_line_cells_udf(cell_deg)
    s_cells = (
        streets.select("street_id", "coords")
        .withColumn("cell", F.explode(lc("coords")))
        .select("street_id", "cell", F.col("coords").alias("s_coords"))
    )
    cov = make_covering_cells_udf(cell_deg)

    @pandas_udf(ArrayType(LongType()))
    def expanded(ring_sizes: pd.Series, coords: pd.Series) -> pd.Series:
        base = cov.func(ring_sizes, coords)
        return base.map(lambda cs: expand_cells(np.asarray(cs, dtype=np.int64), 1).tolist())

    b_cells = blocks.select(
        "block_id", F.explode(expanded("ring_sizes", "coords")).alias("cell")
    )
    pairs = (
        b_cells.join(s_cells, "cell", "inner")
        .select("block_id", "street_id")
        .distinct()
    )
    return pairs.join(
        streets.select("street_id", F.col("coords").alias("s_coords")), "street_id"
    ).select(F.col("block_id").alias("b_code"), "s_coords")


def compute_k(
    blocks: DataFrame,
    buildings: DataFrame,
    streets: DataFrame,
    cell_deg: float = DEFAULT_CELL_DEG,
) -> DataFrame:
    """k-complexity per block.

    buildings: output of the PIP join — (block_id, lon, lat, ...).
    streets: raw street lines (street_id, coords) INCLUDING footpaths
    excluded from blocking? No — pass the blocking set; the reference
    also feeds compute-k from the streets layer used for delineation
    (batch_4:521-549).
    """
    # One geometry MARKER row per block (lon/lat null) unioned into the
    # buildings side instead of joining geometry onto every building
    # row — a 4k-building block would otherwise ship its polygon 4k×
    # through the Arrow channel.
    bgeom = blocks.select(
        "block_id",
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        "ring_sizes",
        "coords",
    )
    b = buildings.select(
        "block_id",
        "lon",
        "lat",
        F.lit(None).cast("array<int>").alias("ring_sizes"),
        F.lit(None).cast("array<double>").alias("coords"),
    ).unionByName(bgeom)
    s = streets_near_blocks(streets, blocks, cell_deg)
    # Explicit partition count for the kernel stage: AQE coalesces
    # post-shuffle partitions by BYTES, but this shuffle is tiny while
    # each group runs a Python geometry kernel — byte-based coalescing
    # would collapse hundreds of CPU-seconds onto 2 tasks. An explicit
    # repartition(n, key) is exempt from AQE coalescing and satisfies
    # the cogroup's required distribution, so the kernel runs at full
    # parallelism. (The reference hand-balances the same stage with
    # weighted_qcut chunking, batch_4:508-516.)
    spark = blocks.sparkSession
    nparts = spark.sparkContext.defaultParallelism * 2
    b = b.repartition(nparts, "block_id")
    s = s.repartition(nparts, "b_code")
    # every block contributes a geometry marker row, so zero-building
    # blocks flow through the kernel too (k=1, building_count=0 —
    # the reference computes k only for blocks with buildings,
    # batch_4:466-506, and fills the rest in the combine stage; here
    # the kernel's n=0 path also yields their true street lengths)
    return (
        b.groupBy("block_id")
        .cogroup(s.groupBy("b_code"))
        .applyInPandas(compute_k_kernel, K_SCHEMA)
    )


def compute_layers(
    blocks: DataFrame,
    buildings: DataFrame,
    streets: DataFrame,
    cell_deg: float = DEFAULT_CELL_DEG,
) -> DataFrame:
    """Per-building concentric-layer membership (K2,
    batch_4:190-375): (block_id, url, layer, k_complexity)."""
    from .kernels.complexity import LAYERS_SCHEMA, compute_layers_kernel

    bgeom = blocks.select(
        "block_id",
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        "ring_sizes",
        "coords",
    )
    b = buildings.select(
        "block_id",
        "url",
        "lon",
        "lat",
        F.lit(None).cast("array<int>").alias("ring_sizes"),
        F.lit(None).cast("array<double>").alias("coords"),
    ).unionByName(bgeom)
    s = streets_near_blocks(streets, blocks, cell_deg)
    spark = blocks.sparkSession
    nparts = spark.sparkContext.defaultParallelism * 2
    return (
        b.repartition(nparts, "block_id")
        .groupBy("block_id")
        .cogroup(s.repartition(nparts, "b_code").groupBy("b_code"))
        .applyInPandas(compute_layers_kernel, LAYERS_SCHEMA)
    )


def run_pipeline(
    spark: SparkSession,
    n_pages: int = 10_000,
    nx: int = 3,
    ny: int = 3,
    grid: int = 3,
    cell_deg: float = DEFAULT_CELL_DEG,
    broadcast_polys: bool = True,
    cache_intermediate: bool = True,
):
    """Build the full DAG on synthetic inputs; returns dict of
    DataFrames.

    blocks/buildings feed multiple downstream branches (kernel
    cogroup, empty-block anti-join, street assignment) — cache them so
    delineation and the PIP join run once (the reference likewise
    materializes each stage to parquet between batches)."""
    admin = spark.createDataFrame(synth_admin(nx, ny))
    streets = spark.createDataFrame(synth_streets(nx, ny, grid))
    blocks = delineate_blocks(admin, streets)
    if cache_intermediate:
        blocks = blocks.cache()
    pages = synth_pages_spark(spark, n_pages)
    points = geocoded_points(pages, cell_deg)
    assigned = assign_points_to_polygons(
        points,
        blocks,
        point_cols=["url", "lon", "lat"],
        poly_key="block_id",
        poly_cols=["gadm_code"],
        cell_deg=cell_deg,
        broadcast_polys=broadcast_polys,
    )
    if cache_intermediate:
        assigned = assigned.cache()
    complexity = compute_k(blocks, assigned, streets, cell_deg)
    return {
        "admin": admin,
        "streets": streets,
        "blocks": blocks,
        "pages": pages,
        "points": points,
        "buildings": assigned,
        "complexity": complexity,
    }
