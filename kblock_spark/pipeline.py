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
from .kernels.complexity import K_SCHEMA
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


def _pack_blocks(
    blocks: DataFrame,
    buildings: DataFrame,
    streets: DataFrame,
    cell_deg: float,
    nparts: int,
    with_urls: bool = False,
) -> DataFrame:
    """One COMPACT row per block — geometry + packed building points +
    packed nearby street lines — placed onto exactly ``nparts``
    partitions by per-block kernel cost (linear in building count
    after the vectorized kernel).

    Replaces the round-1 cogroup: packing shuffles the same bytes the
    cogroup did, but the resulting one-row-per-block table can be
    placed with :func:`balanced_assign`, so a 12k-building block never
    shares a partition with another heavy block. Hash placement left a
    12 s straggler worker against a 3.7 s mean at local[32]
    (BENCH_r01); sorted-greedy placement bounds the tail by the single
    biggest block. (The reference hand-balances the same stage with
    weighted_qcut chunking, batch_4:508-516.)
    """
    from .ops.partitioning import balanced_tokens

    # collect_lists issued in ONE .agg() consume the identical row
    # stream, so b_lons[i] ↔ b_lats[i] (↔ b_urls[i]) stay pairwise
    # aligned — flat double arrays, no per-building struct/array
    # object churn through the aggregation
    agg = [
        F.collect_list("lon").alias("b_lons"),
        F.collect_list("lat").alias("b_lats"),
    ]
    if with_urls:
        agg.append(F.collect_list("url").alias("b_urls"))
    # the packing aggregate is materialized once (deferred
    # localCheckpoint): the cost map derives building counts from the
    # SAME aggregated table (size of the packed array == count(*)),
    # and the final join reuses it — one pass over the building set
    # instead of two (the count-only subtree this replaces re-scanned
    # all buildings because balanced_tokens eagerly checkpoints its
    # cost input)
    b_packed = (
        buildings.groupBy("block_id").agg(*agg).localCheckpoint(eager=False)
    )
    s_packed = (
        streets_near_blocks(streets, blocks, cell_deg)
        .groupBy("b_code")
        .agg(F.collect_list("s_coords").alias("street_lines"))
        .withColumnRenamed("b_code", "block_id")
    )
    packed = (
        blocks.select("block_id", "ring_sizes", "coords")
        .join(b_packed, "block_id", "left")
        .join(s_packed, "block_id", "left")
    )
    # kernel cost ≈ linear in building count (vectorized kernel) with
    # a fixed floor
    sizes = (
        blocks.select("block_id")
        .join(
            b_packed.select("block_id", F.size("b_lons").alias("__n")),
            "block_id",
            "left",
        )
        .withColumn(
            "__cost", (F.coalesce(F.col("__n"), F.lit(0)) + F.lit(50)).cast("double")
        )
    )
    tok = balanced_tokens(sizes, "__cost", "block_id", nparts)
    return packed.join(tok, "block_id").repartition(nparts, "__part_token")


def _unpack_streets(street_lines) -> list[np.ndarray]:
    if street_lines is None:
        return []
    return [np.asarray(c, dtype=np.float64).reshape(-1, 2) for c in street_lines]


def _packed_k_iter(batches):
    """mapInPandas kernel: one packed block row → one k-complexity
    row. Zero-building blocks flow through too (k=1,
    building_count=0 — the reference computes k only for blocks with
    buildings, batch_4:466-506, and fills the rest in the combine
    stage; here the n=0 path also yields their true street lengths)."""
    import os
    import time

    from .kernels.complexity import K_COLUMNS, compute_k_block
    from .geo.geom import unpack_rings

    mdir = os.environ.get("KBLOCK_KERNEL_METRICS")
    for pdf in batches:
        rows = []
        for block_id, sizes, coords, b_lons, b_lats, street_lines in zip(
            pdf["block_id"], pdf["ring_sizes"], pdf["coords"],
            pdf["b_lons"], pdf["b_lats"], pdf["street_lines"],
        ):
            t0 = time.time()
            shell, holes = unpack_rings(sizes, coords)
            pts = (
                np.stack(
                    [
                        np.asarray(b_lons, dtype=np.float64),
                        np.asarray(b_lats, dtype=np.float64),
                    ],
                    axis=1,
                )
                if b_lons is not None and len(b_lons)
                else np.zeros((0, 2))
            )
            # canonical point order: collect_list order depends on the
            # upstream join/dedupe plan, and the kernel's float sums
            # (centroid, layer peel seeds) are association-order
            # sensitive — lexsort makes every join strategy
            # (broadcast / salted shuffle / local dedupe) bit-identical
            pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
            lines = _unpack_streets(street_lines)
            row = compute_k_block(shell, holes, pts, lines)
            row["block_id"] = block_id
            rows.append(row)
            if mdir:
                os.makedirs(mdir, exist_ok=True)
                with open(f"{mdir}/{os.getpid()}.csv", "a") as f:
                    f.write(
                        f"{block_id},{len(pts)},{len(lines)},"
                        f"{int((time.time() - t0) * 1000)}\n"
                    )
        if rows:
            yield pd.DataFrame(rows)[
                [
                    "block_id", "on_network_street_length",
                    "off_network_street_length", "nearest_external_street",
                    "building_count", "building_layers", "k_complexity",
                ]
            ]


def compute_k(
    blocks: DataFrame,
    buildings: DataFrame,
    streets: DataFrame,
    cell_deg: float = DEFAULT_CELL_DEG,
    nparts: int | None = None,
) -> DataFrame:
    """k-complexity per block.

    buildings: output of the PIP join — (block_id, lon, lat, ...).
    streets: the blocking street set; the reference also feeds
    compute-k from the delineation streets layer (batch_4:521-549).
    """
    spark = blocks.sparkSession
    # 2× cores (was 4×): balanced-greedy placement already bounds the
    # straggler tail by the single biggest block, so halving the task
    # count halves per-task mapInPandas/Arrow overhead without a
    # balance cost — interleaved A/B at 720k pages/32c: 413-449 vs
    # 346-402 blocks/s, np2x won all 5 pairs (bench_runs/r8_geo_ab_np.json)
    nparts = nparts or spark.sparkContext.defaultParallelism * 2
    packed = _pack_blocks(blocks, buildings, streets, cell_deg, nparts)
    return packed.mapInPandas(_packed_k_iter, K_SCHEMA)


def _packed_layers_iter(batches):
    from .kernels.complexity import compute_k_block
    from .geo.geom import unpack_rings

    for pdf in batches:
        outs = []
        for block_id, sizes, coords, b_lons, b_lats, urls, street_lines in zip(
            pdf["block_id"], pdf["ring_sizes"], pdf["coords"],
            pdf["b_lons"], pdf["b_lats"], pdf["b_urls"], pdf["street_lines"],
        ):
            if b_lons is None or len(b_lons) == 0:
                continue
            shell, holes = unpack_rings(sizes, coords)
            pts = np.stack(
                [
                    np.asarray(b_lons, dtype=np.float64),
                    np.asarray(b_lats, dtype=np.float64),
                ],
                axis=1,
            )
            # same canonical order as _packed_k_iter, with urls
            # permuted alongside their points
            order = np.lexsort((pts[:, 1], pts[:, 0]))
            pts = pts[order]
            urls = np.asarray(urls, dtype=object)[order]
            lines = _unpack_streets(street_lines)
            row = compute_k_block(shell, holes, pts, lines)
            outs.append(
                pd.DataFrame(
                    {
                        "block_id": block_id,
                        "url": np.asarray(urls, dtype=object),
                        "layer": row["layer_assignment"].astype(np.int32),
                        "k_complexity": np.int32(row["k_complexity"]),
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)


def compute_layers(
    blocks: DataFrame,
    buildings: DataFrame,
    streets: DataFrame,
    cell_deg: float = DEFAULT_CELL_DEG,
    nparts: int | None = None,
) -> DataFrame:
    """Per-building concentric-layer membership (K2,
    batch_4:190-375): (block_id, url, layer, k_complexity)."""
    from .kernels.complexity import LAYERS_SCHEMA

    spark = blocks.sparkSession
    # same 2×-cores packing as compute_k (see the A/B note there)
    nparts = nparts or spark.sparkContext.defaultParallelism * 2
    packed = _pack_blocks(
        blocks, buildings, streets, cell_deg, nparts, with_urls=True
    )
    return packed.mapInPandas(_packed_layers_iter, LAYERS_SCHEMA)


def run_full_build(
    spark: SparkSession,
    out_dir: str,
    n_pages: int = 10_000,
    nx: int = 3,
    ny: int = 3,
    grid: int = 3,
    cell_deg: float | None = None,
):
    """The reference user's whole per-country job sequence (deploy
    jobs 1b→2→4→3→5) as ONE resumable Spark build: blocks → PIP join →
    k-complexity → dasymetric population → combined block table →
    regional rollup, written as hive-partitioned parquet with a
    checkpoint manifest for the block layer. Returns the output paths.
    """
    from pyspark.sql import functions as F  # noqa: F811

    from .io.manifest import CheckpointManifest, checkpointed_run
    from .io.sinks import write_parquet
    from .io.synth import synth_pixels
    from .ops.combine import combine_blocks, regional_rollup
    from .ops.population import allocate_population
    from .ops.validate import validate_pipeline_outputs

    dfs = run_pipeline(spark, n_pages=n_pages, nx=nx, ny=ny, grid=grid,
                       cell_deg=cell_deg)
    dfs["blocks"] = dfs["blocks"].cache()
    dfs["buildings"] = dfs["buildings"].cache()
    dfs["complexity"] = dfs["complexity"].cache()
    validate_pipeline_outputs(dfs)  # the reference's inline guards

    buildings = dfs["buildings"].withColumn(
        "building_area",
        (F.pmod(F.xxhash64("url"), F.lit(90)) + F.lit(10)).cast("double"),
    ).select("block_id", "gadm_code", "lon", "lat", "building_area")
    pixels = spark.createDataFrame(synth_pixels(nx, ny))
    population = allocate_population(pixels, buildings, dfs["blocks"]).cache()
    combined = combine_blocks(dfs["blocks"], dfs["complexity"], population)
    rollup = regional_rollup(combined)

    paths = {
        "blocks": f"{out_dir}/blocks",
        "combined": f"{out_dir}/combined",
        "rollup": f"{out_dir}/rollup",
    }
    # resumable block layer: per-gadm checkpointed partitions
    man = CheckpointManifest(spark, f"{out_dir}/manifest")
    checkpointed_run(
        spark,
        dfs["blocks"].withColumn("part_key", F.col("gadm_code")),
        "part_key",
        lambda df: df,
        paths["blocks"],
        man,
    )
    write_parquet(combined, paths["combined"], ["gadm_code"])
    write_parquet(rollup, paths["rollup"])
    return paths


def run_pipeline(
    spark: SparkSession,
    n_pages: int = 10_000,
    nx: int = 3,
    ny: int = 3,
    grid: int = 3,
    cell_deg: float | None = None,
    broadcast_polys: bool = True,
    salt_buckets: int = 0,
    cache_intermediate: bool = True,
):
    """Build the full DAG on synthetic inputs; returns dict of
    DataFrames.

    blocks/buildings feed multiple downstream branches (kernel
    cogroup, empty-block anti-join, street assignment) — cache them so
    delineation and the PIP join run once (the reference likewise
    materializes each stage to parquet between batches).

    cell_deg None → derived from the block size distribution
    (ops/spatial_join.suggest_pip_cell_deg): results are exact at any
    cell size, only the candidate ratio changes."""
    from .ops.spatial_join import suggest_pip_cell_deg

    admin = spark.createDataFrame(synth_admin(nx, ny))
    streets = spark.createDataFrame(synth_streets(nx, ny, grid))
    blocks = delineate_blocks(admin, streets)
    if cache_intermediate:
        blocks = blocks.cache()
    if cell_deg is None:
        cell_deg = suggest_pip_cell_deg(blocks)
    pages = synth_pages_spark(spark, n_pages)
    points = geocoded_points(pages, cell_deg)
    assigned = assign_points_to_polygons(
        points,
        blocks,
        point_cols=["url", "lon", "lat"],
        poly_key="block_id",
        poly_cols=["gadm_code"],
        cell_deg=cell_deg,
        salt_buckets=salt_buckets,
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
