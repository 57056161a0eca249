"""Urban crosswalk: label blocks by their dominant overlapping urban
layer (the reference's batch_1c_regions_crosswalk.py): overlay
intersection against urban/peri-urban polygon layers (1c:118-233),
keep the largest-overlap claimant per block (rank-first W1 pattern,
1c:126-146), and fall back to a derived non-urban label
(``'nonurban_' + country_code``, 1c:226-227).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .overlay_ops import intersection_join


def _top1_overlap(blocks: DataFrame, layer: DataFrame, layer_key: str) -> DataFrame:
    """block → (layer id, overlap area) of the largest overlap."""
    ov = intersection_join(
        blocks.select(F.col("block_id").alias("b_key"), "ring_sizes", "coords"),
        layer.select(F.col(layer_key).alias("l_key"), "ring_sizes", "coords"),
        "b_key",
        "l_key",
    )
    # one row per overlap piece → aggregate per pair first
    pair = ov.groupBy("key_a", "key_b").agg(F.max("overlap_area").alias("ov"))
    w = Window.partitionBy("key_a").orderBy(F.desc("ov"), F.asc("key_b"))
    return (
        pair.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("key_a").alias("block_id"),
            F.col("key_b").alias(layer_key),
            F.col("ov").alias(f"{layer_key}_overlap"),
        )
    )


def crosswalk(
    blocks: DataFrame, urban: DataFrame, conurbation: DataFrame
) -> DataFrame:
    """→ (block_id, gadm_code, country_code, urban_id, conurbation_id,
    urban_class, urban_layer_code).

    urban_class: urban (overlaps an urban polygon) > peri-urban
    (overlaps a conurbation only) > non-urban.
    """
    u = _top1_overlap(blocks, urban, "urban_id")
    c = _top1_overlap(blocks, conurbation, "conurbation_id")
    out = (
        blocks.select("block_id", "gadm_code", "country_code")
        .join(u, "block_id", "left")
        .join(c, "block_id", "left")
    )
    urban_class = (
        F.when(F.col("urban_id").isNotNull(), "urban")
        .when(F.col("conurbation_id").isNotNull(), "peri_urban")
        .otherwise("non_urban")
    )
    # derived fallback labels (1c:226-227 fillna with
    # 'nonurban_' + country_code)
    urban_id = F.coalesce(
        F.col("urban_id"), F.concat(F.lit("nonurban_"), F.col("country_code"))
    )
    conurb_id = F.coalesce(
        F.col("conurbation_id"),
        F.concat(F.lit("nonurban_"), F.col("country_code")),
    )
    return out.select(
        "block_id",
        "gadm_code",
        "country_code",
        urban_id.alias("urban_id"),
        conurb_id.alias("conurbation_id"),
        urban_class.alias("urban_class"),
        F.concat_ws("_", urban_class, urban_id).alias("urban_layer_code"),
    )
