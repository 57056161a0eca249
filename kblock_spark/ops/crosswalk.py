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


def _country_composite_labels(
    member_areas: DataFrame, id_col: str, label_col: str, out_col: str
) -> DataFrame:
    """Per id: member labels joined with '–', ordered by summed
    overlap area descending (the reference's groupby-sort-apply(list)
    dictionaries, batch_1c:280-287) — one tiny aggregate + one
    window, deterministic via (area desc, label) ordering."""
    g = member_areas.groupBy(id_col, label_col).agg(
        # all-peri-urban member countries sum NaN→0 in the reference's
        # pandas; coalesce reproduces that (Spark SUM of all-null is
        # null) so ties fall back to the alphabetical tiebreak
        F.coalesce(F.sum("urban_area"), F.lit(0.0)).alias("__a")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.desc("__a"), F.asc(label_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        g.select(
            id_col,
            F.array_join(F.collect_list(label_col).over(w), "–").alias(out_col),
        )
        .dropDuplicates([id_col])
    )


def full_crosswalk(
    blocks: DataFrame,
    urban: DataFrame,
    conurbation: DataFrame,
    agglos: DataFrame,
    countries: DataFrame,
) -> DataFrame:
    """The reference's FULL 23-column crosswalk label surface
    (batch_1c_regions_crosswalk.py:253-349: area_type, the three
    class_* hierarchies via the core/peripheral rank, composite
    '–'-joined multi-country labels, Africapolis agglomeration
    attributes, and every fillna fallback).

    Inputs: ``blocks`` (block_id, block_geohash, gadm_code,
    country_code, ring_sizes, coords); ``urban`` (urban_id,
    urban_center_name, geometry); ``conurbation`` (conurbation_id,
    conurbation_area_name, geometry); ``agglos`` (agglosid,
    agglosname, metropole, geometry); ``countries`` (country_code,
    country_name, continent).

    Spark shape: three overlay top-1 joins (the heavy part — tile
    prefiltered, same machinery as :func:`crosswalk`), then
    broadcast-joined label dims and two TINY aggregates (per-urban_id
    and per-conurbation_id country compositions + the core/peripheral
    rank) — label work never shuffles block-sized data again.

    One reference-matching quirk kept deliberately:
    (a) an Urban block whose urban center overlaps NO conurbation
    falls through to '4 - Non-urban' in the class_* hierarchies (the
    reference's np.select default, batch_1c:310-316 — unreachable in
    its data, where conurbations are built FROM urban buffers so
    urban ⊆ conurbation by construction).

    Weighting matches the reference: the rank and the '–'-joined
    country compositions are weighted by the urban CENTER's own area
    (the ``urban_area`` attribute merged from the urban dim,
    batch_1c:256,273,281 — constant per urban_id, summed over member
    block rows), not by per-block overlap area. Peri-/non-urban rows
    carry a null ``urban_area`` and contribute 0, exactly like the
    reference's NaN under pandas ``sum``."""
    u = _top1_overlap(blocks, urban.select("urban_id", "ring_sizes", "coords"), "urban_id")
    c = _top1_overlap(
        blocks,
        conurbation.select("conurbation_id", "ring_sizes", "coords"),
        "conurbation_id",
    )
    a = _top1_overlap(blocks, agglos.select("agglosid", "ring_sizes", "coords"), "agglosid")

    # urban_area: the urban center polygon's own area (the reference's
    # GHSL attribute, batch_1c:256) — computed from the dim geometry,
    # one tiny mapInPandas over the broadcast-sized urban layer
    import pandas as pd

    from ..geo.geom import polygon_area, unpack_rings

    def _areas(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "urban_id": pdf["urban_id"],
                    "urban_area": [
                        polygon_area(*unpack_rings(s, xy))
                        for s, xy in zip(pdf["ring_sizes"], pdf["coords"])
                    ],
                }
            )

    urban_areas = (
        urban.select("urban_id", "ring_sizes", "coords")
        .mapInPandas(_areas, "urban_id string, urban_area double")
        .groupBy("urban_id")
        .agg(F.sum("urban_area").alias("urban_area"))
    )

    pre = (
        blocks.select("block_id", "block_geohash", "gadm_code", "country_code")
        .join(F.broadcast(countries), "country_code", "left")
        .join(u, "block_id", "left")
        .join(c, "block_id", "left")
        .join(a.select("block_id", "agglosid"), "block_id", "left")
        .withColumn(
            "area_type",
            F.when(F.col("urban_id").isNotNull(), "Urban")
            .when(F.col("conurbation_id").isNotNull(), "Peri-urban")
            .otherwise("Non-urban"),
        )
    )
    # Coerce every conurbation to contain at least one urban-member
    # block (batch_1c:259-261): a conurbation whose overlapping blocks
    # are ALL peri-urban has its id nulled, so those blocks fall back
    # to the 'Rest of <country>' label family below. area_type was
    # fixed above, BEFORE the coercion, like the reference's
    # per-country stage. Shape: a conurbation-sized aggregate +
    # broadcast join (NOT a window over conurbation_id, which would
    # funnel every non-conurbation block into one null partition).
    urbanless = (
        pre.where(F.col("conurbation_id").isNotNull())
        .groupBy("conurbation_id")
        .agg(F.count("urban_id").alias("__n_urban_members"))
        .where(F.col("__n_urban_members") == 0)
        .select("conurbation_id", F.lit(True).alias("__urbanless"))
    )
    pre = (
        pre.join(F.broadcast(urbanless), "conurbation_id", "left")
        .withColumn(
            "conurbation_id",
            F.when(F.col("__urbanless"), F.lit(None).cast("string")).otherwise(
                F.col("conurbation_id")
            ),
        )
        .drop("__urbanless")
    )

    base = (
        pre.join(
            F.broadcast(urban.select("urban_id", "urban_center_name").distinct()),
            "urban_id", "left",
        )
        .join(
            F.broadcast(
                conurbation.select("conurbation_id", "conurbation_area_name").distinct()
            ),
            "conurbation_id", "left",
        )
        .join(
            F.broadcast(
                agglos.select("agglosid", "agglosname", "metropole").distinct()
            ),
            "agglosid", "left",
        )
        .join(F.broadcast(urban_areas), "urban_id", "left")
        # Africapolis fallbacks (batch_1c:240-242)
        .withColumn("agglosid", F.coalesce("agglosid", F.lit("no_agglosid")))
        .withColumn("agglosname", F.coalesce("agglosname", F.lit("Non-urban")))
        .withColumn("metropole", F.coalesce("metropole", F.lit("No")))
    )
    base = base.localCheckpoint(eager=False)

    urban_members = base.where(F.col("urban_id").isNotNull())
    conur_members = base.where(F.col("conurbation_id").isNotNull())
    ucn = _country_composite_labels(
        urban_members, "urban_id", "country_name", "urban_country_name"
    )
    ucc = _country_composite_labels(
        urban_members, "urban_id", "country_code", "urban_country_code"
    )
    ccn = _country_composite_labels(
        conur_members, "conurbation_id", "country_name", "conurbation_country_name"
    )
    ccc = _country_composite_labels(
        conur_members, "conurbation_id", "country_code", "conurbation_country_code"
    )

    # core/peripheral rank: urban centers ranked within their
    # conurbation by total intersected area (batch_1c:304-307;
    # method='first' → row_number, urban_id tiebreak for determinism)
    rank_src = (
        urban_members.groupBy("urban_id", "conurbation_id")
        .agg(F.sum("urban_area").alias("__ua"))
    )
    wr = Window.partitionBy("conurbation_id").orderBy(
        F.desc("__ua"), F.asc("urban_id")
    )
    ranks = rank_src.select(
        "urban_id", "conurbation_id", F.row_number().over(wr).alias("__rank")
    )

    x = (
        base.join(F.broadcast(ucn), "urban_id", "left")
        .join(F.broadcast(ucc), "urban_id", "left")
        .join(F.broadcast(ccn), "conurbation_id", "left")
        .join(F.broadcast(ccc), "conurbation_id", "left")
        .join(F.broadcast(ranks), ["urban_id", "conurbation_id"], "left")
    )

    # conurbation_area_name_short: first two '-'-separated segments
    # (batch_1c:295-297)
    short = F.when(
        F.col("conurbation_area_name").isNotNull(),
        F.array_join(
            F.slice(F.split(F.col("conurbation_area_name"), "-"), 1, 2), "-"
        ),
    )
    x = x.withColumn("conurbation_area_name_short", short)

    hierarchy = (
        F.when((F.col("area_type") == "Urban") & (F.col("__rank") == 1), "1 - Core urban")
        .when((F.col("area_type") == "Urban") & (F.col("__rank") > 1), "2 - Peripheral urban")
        .when(F.col("area_type") == "Peri-urban", "3 - Peri-urban")
        .otherwise("4 - Non-urban")
    )
    x = x.withColumn("class_urban_hierarchy", hierarchy)
    x = x.withColumn(
        "class_urban_periurban_nonurban",
        F.when(
            F.col("class_urban_hierarchy").isin("1 - Core urban", "2 - Peripheral urban"),
            "1 - Core & peripheral urban",
        )
        .when(F.col("class_urban_hierarchy") == "3 - Peri-urban", "2 - Peri-urban")
        .otherwise("3 - Non-urban"),
    )
    x = x.withColumn(
        "class_urban_nonurban",
        F.when(
            F.col("class_urban_hierarchy").isin(
                "1 - Core urban", "2 - Peripheral urban", "3 - Peri-urban"
            ),
            "1 - Core, peripheral, & peri-urban",
        ).otherwise("2 - Non-urban"),
    )

    rest = F.concat(F.lit("Rest of "), F.col("country_name"))
    x = (
        x.withColumn(
            "urban_center_name",
            F.when(
                F.col("urban_center_name").isNull()
                & (F.col("class_urban_hierarchy") == "3 - Peri-urban"),
                F.concat(F.lit("Peri-urban "), F.col("conurbation_area_name_short")),
            )
            .when(F.col("urban_center_name").isNull(), rest)
            .otherwise(F.col("urban_center_name")),
        )
        .withColumn("urban_country_name", F.coalesce("urban_country_name", "country_name"))
        .withColumn("urban_country_code", F.coalesce("urban_country_code", "country_code"))
        .withColumn("conurbation_area_name", F.coalesce("conurbation_area_name", rest))
        .withColumn(
            "conurbation_area_name_short",
            F.coalesce("conurbation_area_name_short", rest),
        )
        .withColumn(
            "conurbation_country_name",
            F.coalesce("conurbation_country_name", "country_name"),
        )
        .withColumn(
            "conurbation_country_code",
            F.coalesce("conurbation_country_code", "country_code"),
        )
    )
    # id fallbacks (batch_1c:226-227 — the reference fills these in
    # its per-country stage, so the full surface never carries a null
    # urban_id/conurbation_id). Applied AFTER the member-filtered
    # aggregates above, which key off the raw nulls.
    nonurban_id = F.concat(F.lit("nonurban_"), F.col("country_code"))
    x = x.withColumn("urban_id", F.coalesce("urban_id", nonurban_id)).withColumn(
        "conurbation_id", F.coalesce("conurbation_id", nonurban_id)
    )
    # batch_1c:347-348 with the ids already filled; null-free variant —
    # a coercion-nulled conurbation_id re-fills to nonurban_<cc> here
    # (the reference's dead-in-practice coercion would leave NaN)
    x = x.withColumn(
        "urban_layer_code",
        F.when(
            F.col("area_type") == "Non-urban",
            F.concat(F.col("country_code"), F.lit("_nonurban")),
        ).otherwise(
            F.concat_ws("_", "country_code", "conurbation_id", "urban_id")
        ),
    )
    return x.select(
        "block_id", "block_geohash", "gadm_code", "country_code",
        "country_name", "continent", "area_type", "class_urban_hierarchy",
        "class_urban_periurban_nonurban", "class_urban_nonurban",
        "urban_id", "urban_center_name", "urban_country_code",
        "urban_country_name", "conurbation_id", "conurbation_area_name",
        "conurbation_area_name_short", "conurbation_country_code",
        "conurbation_country_name", "agglosid", "agglosname", "metropole",
        "urban_layer_code",
    )
