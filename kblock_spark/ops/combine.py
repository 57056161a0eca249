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
