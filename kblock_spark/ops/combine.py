"""Combine stage (the reference's batch_5_combine_data.py): join the
block layers, derive guarded metrics, bucket k, and roll up.

Everything here is plain Catalyst — the reference's np.select /
log-guard / pivot tricks (batch_5:127-161,291-334,403-465) map to
when-chains and conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K_BUCKETS = [
    (1, "01"), (2, "02"), (3, "03"), (4, "04"), (5, "05"),
    (6, "06"), (7, "07"), (8, "08"), (9, "09"),
]


def k_bucket_col(k_col: str = "k_complexity") -> F.Column:
    """k → bucket label ('01'..'09', '10+') — the reference's k-bucket
    np.select chain (batch_5:315-334)."""
    c = F.col(k_col)
    expr = F.when(c >= 10, "10+")
    out = None
    for val, label in K_BUCKETS:
        out = (F.when(c == val, label) if out is None else out.when(c == val, label))
    return out.otherwise("10+").alias("k_bucket")


def safe_log10(col) -> F.Column:
    """log10 with the reference's inf/nan→0, clip-at-0 guards
    (batch_5:127,297-305)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > 1.0, F.log10(c)).otherwise(F.lit(0.0))


def safe_ratio(num, den) -> F.Column:
    """a/b with zero-guard → 0 (batch_5:291-306)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.when(d != 0, n / d).otherwise(F.lit(0.0))


def polyline_length_col(coords_col: str = "coords") -> F.Column:
    """Length of a flat [x0,y0,x1,y1,…] polyline — pure Catalyst
    (aggregate over an index sequence; stays in whole-stage codegen,
    no Python). Degenerate inputs (<2 vertices, i.e. size<4) are 0.0 —
    without the guard F.sequence would descend (0 → −1) and
    element_at would read from the array end."""
    c = F.col(coords_col)
    n_seg = (F.size(c) / F.lit(2)).cast("int") - F.lit(2)

    # explicit dx*dx (not F.pow → Math.pow, only 1-ulp accurate):
    # keeps segment lengths bit-identical to any IEEE engine — the
    # geo_linearity DuckDB oracle mirrors this arithmetic exactly
    def seg(i):
        dx = F.element_at(c, i * 2 + 3) - F.element_at(c, i * 2 + 1)
        dy = F.element_at(c, i * 2 + 4) - F.element_at(c, i * 2 + 2)
        return F.sqrt(dx * dx + dy * dy)

    total = F.aggregate(
        F.sequence(F.lit(0), n_seg),
        F.lit(0.0),
        lambda acc, i: acc + seg(i),
    )
    return F.when(F.size(c) >= 4, total).otherwise(F.lit(0.0))


def linearity_col(coords_col: str = "coords") -> F.Column:
    """momepy.Linearity (batch_5:576-595): straight endpoint chord
    divided by polyline length; 1.0 for degenerate zero-length lines."""
    c = F.col(coords_col)
    sz = F.size(c)
    cdx = F.element_at(c, sz - 1) - F.element_at(c, 1)
    cdy = F.element_at(c, sz) - F.element_at(c, 2)
    chord = F.sqrt(cdx * cdx + cdy * cdy)
    ln = polyline_length_col(coords_col)
    return F.when(ln > 0, chord / ln).otherwise(F.lit(1.0))


def street_linearity_by_group(
    streets: DataFrame, group_col: str = "country_code",
    coords_col: str = "coords",
) -> DataFrame:
    """Length-weighted mean linearity per group — the reference's
    street-linearity aggregate in the combine stage (batch_5:576-595:
    momepy.Linearity per street, then a length-weighted mean)."""
    d = streets.withColumn("__len", polyline_length_col(coords_col)).withColumn(
        "__lin", linearity_col(coords_col)
    )
    return d.groupBy(group_col).agg(
        (F.sum(F.col("__lin") * F.col("__len")) / F.sum("__len")).alias(
            "mean_linearity"
        ),
        F.sum("__len").alias("total_length"),
        F.count("*").alias("n_streets"),
    )


def combine_blocks(
    blocks: DataFrame, complexity: DataFrame, population: DataFrame
) -> DataFrame:
    """Chained left joins on block_id (J13, batch_5:253-259) + derived
    metrics (batch_5:82-346)."""
    df = (
        blocks.select(
            "block_id", "block_geohash", "gadm_code", "country_code",
            "block_area", "block_perimeter",
        )
        .join(complexity, "block_id", "left")
        .join(population.select("block_id", "allocated_population"), "block_id", "left")
    )
    df = df.withColumn(
        "allocated_population", F.coalesce("allocated_population", F.lit(0.0))
    )
    return (
        df.withColumn("block_area_km2", F.col("block_area") / 1e6)
        .withColumn("block_area_log", safe_log10("block_area"))
        .withColumn(
            "population_density",
            safe_ratio("allocated_population", "block_area_km2"),
        )
        .withColumn(
            "buildings_per_km2",
            safe_ratio(F.col("building_count").cast("double"), F.col("block_area_km2")),
        )
        .withColumn("k_bucket", k_bucket_col())
    )


def regional_rollup(combined: DataFrame, region_col: str = "gadm_code") -> DataFrame:
    """Two-level rollup (batch_5:403-465): per-region population and
    block counts per k bucket (conditional-sum pivot) + the
    population-weighted mean k (A12, batch_5:428-429)."""
    pivots = []
    for _, label in K_BUCKETS + [(10, "10+")]:
        pivots.append(
            F.sum(
                F.when(F.col("k_bucket") == label, F.col("allocated_population"))
                .otherwise(0.0)
            ).alias(f"pop_k_{label.replace('+', 'plus')}")
        )
    return combined.groupBy(region_col).agg(
        F.count("*").alias("n_blocks"),
        F.sum("allocated_population").alias("population"),
        F.sum("block_area").alias("area_m2"),
        (
            F.sum(F.col("k_complexity") * F.col("allocated_population"))
            / F.sum("allocated_population")
        ).alias("k_weighted_mean"),
        *pivots,
    )


# the reference's 15 log10-building-area bins (batch_5:129-144)
BIN_AREA_LABELS = [
    "01_0.50__log10_3.2", "02_0.75__log10_5.6", "03_1.00__log10_10",
    "04_1.25__log10_17.8", "05_1.50__log10_31.6", "06_1.75__log10_56.2",
    "07_2.00__log10_100", "08_2.25__log10_177.8", "09_2.50__log10_316.2",
    "10_2.75__log10_562.3", "11_3.00__log10_1000", "12_3.25__log10_1778.3",
    "13_3.50__log10_3162.3", "14_3.75__log10_5623.4", "15_4.00__log10_10000",
]

BIN_AREA_COL_LIST = [
    f"bldg_area_count_bin_{s}" for s in BIN_AREA_LABELS
] + [f"bldg_area_m2_bin_{s}" for s in BIN_AREA_LABELS]


def building_area_bins(buildings: DataFrame) -> DataFrame:
    """block_id → the 30 building-area-bin pivot columns
    (batch_5:125-157: per-building log10-area binned into 15 classes,
    then per-block count and m² sums per bin). The reference's
    get_dummies + multiply + groupby collapses to ONE conditional
    aggregation — a single shuffle with map-side combine, no N×30
    dummy matrix ever materialized."""
    # null area → 0.0 BEFORE binning: a null would land in bin 01 via
    # safe_log10's otherwise(0.0) yet vanish from the m² sum (F.sum
    # skips nulls), breaking the count-vs-m² bin identities
    area = F.coalesce(F.col("building_area"), F.lit(0.0))
    lg = safe_log10(area)
    edges = [0.75 + 0.25 * i for i in range(14)]  # 0.75 .. 4.0
    b = F.when(lg < edges[0], BIN_AREA_LABELS[0])
    for i, e in enumerate(edges[:-1]):
        b = b.when((lg >= e) & (lg < edges[i + 1]), BIN_AREA_LABELS[i + 1])
    bin_col = b.otherwise(BIN_AREA_LABELS[14])
    d = buildings.select(
        "block_id", area.alias("building_area"), bin_col.alias("__bin")
    )
    aggs = []
    for s in BIN_AREA_LABELS:
        aggs.append(
            F.sum(F.when(F.col("__bin") == s, 1).otherwise(0))
            .cast("long").alias(f"bldg_area_count_bin_{s}")
        )
    for s in BIN_AREA_LABELS:
        aggs.append(
            F.sum(
                F.when(F.col("__bin") == s, F.col("building_area")).otherwise(0.0)
            ).alias(f"bldg_area_m2_bin_{s}")
        )
    return d.groupBy("block_id").agg(*aggs)


def k_labels_col(k_col: str = "k_complexity",
                 offnet_col: str = "nearest_external_street_meters"):
    """k_labels / k_labels_detailed (batch_5:313-331): blocks whose
    nearest external street is ≥200 m away are 'Off-network'
    regardless of k. The reference also force-patches two hardcoded
    block-id lists (mokoko/kibera data-fix spots, batch_5:310-312) —
    a data patch, not an operator semantic, deliberately not
    reproduced."""
    k = F.col(k_col)
    offnet = F.col(offnet_col) >= 200.0
    labels = (
        F.when(offnet, "Off-network")
        .when(k >= 10, "10+")
        .otherwise(k.cast("int").cast("string"))
    )
    detailed = (
        F.when(offnet, "Off-network")
        .when(k >= 30, "30+")
        .otherwise(k.cast("int").cast("string"))
    )
    return labels.alias("k_labels"), detailed.alias("k_labels_detailed")


COMBINE_FULL_COLS = [
    "block_id", "block_geohash", "block_area_m2", "block_hectares",
    "block_area_km2", "block_perimeter_meters", "building_area_m2",
    "building_count", "average_building_area_m2",
    "building_to_block_area_ratio", "parcel_count",
    "average_parcel_area_m2", "parcel_layers", "k_complexity", "k_labels",
    "k_labels_detailed", "k_complexity_weighted_landscan_un",
    "k_complexity_weighted_worldpop_un", "landscan_population",
    "landscan_population_un", "landscan_population_un_log",
    "landscan_population_un_density_hectare",
    "landscan_population_un_density_hectare_log",
    "landscan_population_un_per_building_area_m2",
    "landscan_population_un_per_building", "worldpop_population",
    "worldpop_population_un", "worldpop_population_un_log",
    "worldpop_population_un_density_hectare",
    "worldpop_population_un_density_hectare_log",
    "worldpop_population_un_per_building_area_m2",
    "worldpop_population_un_per_building",
    "on_network_street_length_meters", "off_network_street_length_meters",
    "nearest_external_street_meters", "on_network_street_length_na",
    "off_network_street_length_na", "gadm_code", "country_code",
    "country_name", "continent", "area_type", "class_urban_hierarchy",
    "class_urban_periurban_nonurban", "class_urban_nonurban", "urban_id",
    "urban_center_name", "urban_country_code", "urban_country_name",
    "conurbation_id", "conurbation_area_name_short",
    "conurbation_country_code", "conurbation_country_name", "agglosid",
    "agglosname", "metropole", "urban_layer_code",
] + BIN_AREA_COL_LIST


def combine_full(
    blocks: DataFrame,
    complexity: DataFrame,
    buildings: DataFrame,
    landscan: DataFrame,
    worldpop: DataFrame,
    xwalk: DataFrame,
) -> DataFrame:
    """The reference's FULL combine surface (batch_5:253-346,
    ``all_data_col_list``): 57 named columns + the 30 building-area
    bin pivots, in the reference's exact order (its trailing
    ``geometry`` column is the engine's packed ring form and lives on
    the blocks table, not here).

    Inputs: ``blocks`` (block_id, block_geohash, gadm_code,
    country_code, block_area, block_perimeter), ``complexity`` (the
    k output: k_complexity, building_count, building_layers, street
    lengths, nearest_external_street), ``buildings`` (block_id,
    building_area rows), ``landscan``/``worldpop`` (block_id,
    population, population_un), and ``xwalk``
    (:func:`~kblock_spark.ops.crosswalk.full_crosswalk` output).

    Spark shape: everything per-block joins on block_id (chained left
    joins, one shuffle key end to end — co-partitioned under AQE);
    the only aggregates are per-block building sums/bins (map-side
    combine). parcel_count equals building_count by construction in
    the reference too (one Voronoi parcel per building, batch_4), and
    complexity's building_layers string is the reference's
    parcel_layers surface."""
    bsum = buildings.groupBy("block_id").agg(
        F.sum("building_area").alias("building_area_m2")
    )
    bins = building_area_bins(buildings)
    ls = landscan.select(
        "block_id",
        F.col("population").alias("landscan_population"),
        F.col("population_un").alias("landscan_population_un"),
    )
    wp = worldpop.select(
        "block_id",
        F.col("population").alias("worldpop_population"),
        F.col("population_un").alias("worldpop_population_un"),
    )
    x = (
        blocks.select(
            "block_id", "block_geohash", "gadm_code", "country_code",
            F.col("block_area").alias("block_area_m2"),
            F.col("block_perimeter").alias("block_perimeter_meters"),
        )
        .join(
            complexity.select(
                "block_id", "k_complexity", "building_count",
                F.col("building_layers").alias("parcel_layers"),
                F.col("on_network_street_length").alias(
                    "on_network_street_length_meters"
                ),
                F.col("off_network_street_length").alias(
                    "off_network_street_length_meters"
                ),
                F.col("nearest_external_street").alias(
                    "nearest_external_street_meters"
                ),
            ),
            "block_id", "left",
        )
        .join(bsum, "block_id", "left")
        .join(bins, "block_id", "left")
        .join(ls, "block_id", "left")
        .join(wp, "block_id", "left")
        .join(
            xwalk.select(
                "block_id", "country_name", "continent", "area_type",
                "class_urban_hierarchy", "class_urban_periurban_nonurban",
                "class_urban_nonurban", "urban_id", "urban_center_name",
                "urban_country_code", "urban_country_name", "conurbation_id",
                "conurbation_area_name_short", "conurbation_country_code",
                "conurbation_country_name", "agglosid", "agglosname",
                "metropole", "urban_layer_code",
            ),
            "block_id", "left",
        )
    )
    # na flags BEFORE the zero-fills (batch_5:265-266)
    x = x.withColumn(
        "on_network_street_length_na",
        F.col("on_network_street_length_meters").isNull().cast("int"),
    ).withColumn(
        "off_network_street_length_na",
        F.col("off_network_street_length_meters").isNull().cast("int"),
    )
    # k_complexity fills to 1, not 0 (batch_5_combine_data.py:268 —
    # `fillna(value=1)` runs BEFORE the generic zero-fill loop), so a
    # block with no complexity row gets k=1 / k_labels '1' and real
    # weighted metrics, never the out-of-vocabulary label '0'.
    x = x.withColumn("k_complexity", F.coalesce(F.col("k_complexity"), F.lit(1)))
    for c in (
        "building_area_m2", "building_count",
        "landscan_population", "landscan_population_un",
        "worldpop_population", "worldpop_population_un",
        "on_network_street_length_meters", "off_network_street_length_meters",
        "nearest_external_street_meters",
        *BIN_AREA_COL_LIST,
    ):
        # backticks: the bin labels contain dots, which F.col would
        # otherwise parse as struct-field access
        x = x.withColumn(c, F.coalesce(F.col(f"`{c}`"), F.lit(0)))
    x = (
        x.withColumn("block_hectares", F.col("block_area_m2") * 0.0001)
        .withColumn("block_area_km2", F.col("block_area_m2") * 1e-6)
        .withColumn("parcel_count", F.col("building_count"))
        .withColumn(
            "average_building_area_m2",
            safe_ratio("building_area_m2", "building_count"),
        )
        .withColumn(
            "average_parcel_area_m2", safe_ratio("block_area_m2", "parcel_count")
        )
        .withColumn(
            "building_to_block_area_ratio",
            safe_ratio("building_area_m2", "block_area_m2"),
        )
        .withColumn(
            "k_complexity_weighted_landscan_un",
            F.col("k_complexity") * F.col("landscan_population_un"),
        )
        .withColumn(
            "k_complexity_weighted_worldpop_un",
            F.col("k_complexity") * F.col("worldpop_population_un"),
        )
    )
    for src in ("landscan", "worldpop"):
        un = f"{src}_population_un"
        x = (
            x.withColumn(f"{un}_log", safe_log10(un))
            .withColumn(
                f"{un}_density_hectare", safe_ratio(un, "block_hectares")
            )
            .withColumn(
                f"{un}_density_hectare_log", safe_log10(f"{un}_density_hectare")
            )
            .withColumn(
                f"{un}_per_building_area_m2", safe_ratio(un, "building_area_m2")
            )
            .withColumn(f"{un}_per_building", safe_ratio(un, "building_count"))
        )
    kl, kld = k_labels_col()
    x = x.withColumn("k_labels", kl).withColumn("k_labels_detailed", kld)
    return x.select(*[F.col(f"`{c}`") for c in COMBINE_FULL_COLS])
