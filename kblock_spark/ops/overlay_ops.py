"""Distributed overlay operators (J6/J7/K4).

- :func:`intersection_join` — spatial inner join producing clipped
  geometry + area per pair (gpd.overlay(how='intersection'),
  kblock/batch_1b_generate_blocks.py:125,202; batch_1c:118-233).
- :func:`erase` — A minus the union of all overlapping B (the
  difference overlay: water removal / periurban = conurbation − urban,
  batch_1a:185-232, batch_1c:103-384).
- :func:`remove_overlaps` — the reference's K4
  (batch_1b:78-161 / batch_1a:25-108): detect interior overlaps and
  keep the shared region on the LARGEST-area claimant, subtracting it
  from the others.

All use the tile prefilter → per-pair/per-group arrangement overlay in
an Arrow-batched UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geo.geom import pack_rings, polygon_area, unpack_rings
from ..geo.overlay import overlay
from .spatial_join import polygons_with_cells

OVL_SCHEMA = (
    "key_a string, key_b string, ring_sizes array<int>, "
    "coords array<double>, overlap_area double"
)


def _poly_of(sizes, coords):
    return [unpack_rings(sizes, coords)]


def _candidate_pairs(a: DataFrame, b: DataFrame, a_key: str, b_key: str) -> DataFrame:
    pa = polygons_with_cells(a.select(a_key, "ring_sizes", "coords")).select(
        F.col(a_key).alias("key_a"), "cell",
        F.col("ring_sizes").alias("rs_a"), F.col("coords").alias("c_a"),
    )
    pb = polygons_with_cells(b.select(b_key, "ring_sizes", "coords")).select(
        F.col(b_key).alias("key_b"), "cell",
        F.col("ring_sizes").alias("rs_b"), F.col("coords").alias("c_b"),
    )
    return pa.join(pb, "cell", "inner").dropDuplicates(["key_a", "key_b"])


def intersection_join(
    a: DataFrame, b: DataFrame, a_key: str = "key_a", b_key: str = "key_b"
) -> DataFrame:
    """→ (key_a, key_b, clipped geometry, overlap_area) for every pair
    with nonzero interior overlap."""
    cand = _candidate_pairs(a, b, a_key, b_key)

    def refine(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                pa = _poly_of(pdf["rs_a"].iloc[i], pdf["c_a"].iloc[i])
                pb = _poly_of(pdf["rs_b"].iloc[i], pdf["c_b"].iloc[i])
                pieces = overlay(pa, pb, "intersection")
                area = sum(polygon_area(s, h) for s, h in pieces)
                if area <= 0 or not pieces:
                    continue
                # emit the largest piece's rings + the total area (the
                # reference keeps geometry collections; one row per
                # piece would also be fine — keep it single-row/pair)
                for shell, holes in pieces:
                    sizes, coords = pack_rings(shell, holes)
                    rows.append(
                        {
                            "key_a": pdf["key_a"].iloc[i],
                            "key_b": pdf["key_b"].iloc[i],
                            "ring_sizes": sizes,
                            "coords": coords,
                            "overlap_area": area,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return cand.mapInPandas(refine, schema=OVL_SCHEMA)


ERASE_SCHEMA = "key string, ring_sizes array<int>, coords array<double>, kept_area double"


def erase(a: DataFrame, b: DataFrame, a_key: str, b_key: str) -> DataFrame:
    """A − union(overlapping B): one or more rows per A polygon piece
    (polygons untouched by any B pass through unchanged)."""
    cand = _candidate_pairs(a, b, a_key, b_key).select(
        "key_a", "rs_a", "c_a", "rs_b", "c_b"
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pa = _poly_of(pdf["rs_a"].iloc[0], pdf["c_a"].iloc[0])
        pb = [
            unpack_rings(pdf["rs_b"].iloc[i], pdf["c_b"].iloc[i])
            for i in range(len(pdf))
        ]
        pieces = overlay(pa, pb, "difference")
        rows = []
        for shell, holes in pieces:
            sizes, coords = pack_rings(shell, holes)
            rows.append(
                {
                    "key": key[0],
                    "ring_sizes": sizes,
                    "coords": coords,
                    "kept_area": polygon_area(shell, holes),
                }
            )
        return pd.DataFrame(
            rows, columns=["key", "ring_sizes", "coords", "kept_area"]
        )

    clipped = cand.groupBy("key_a").applyInPandas(run, ERASE_SCHEMA)
    untouched = (
        a.join(cand.select(F.col("key_a").alias(a_key)).distinct(), a_key, "left_anti")
        .select(
            F.col(a_key).alias("key"), "ring_sizes", "coords",
        )
    )

    def add_area(batches):
        for pdf in batches:
            areas = [
                polygon_area(*unpack_rings(s, c))
                for s, c in zip(pdf["ring_sizes"], pdf["coords"])
            ]
            pdf = pdf.assign(kept_area=areas)
            yield pdf

    untouched = untouched.mapInPandas(add_area, schema=ERASE_SCHEMA)
    return clipped.unionByName(untouched)


def remove_overlaps(polys: DataFrame, key_col: str, area_col: str) -> DataFrame:
    """K4: interior overlaps are assigned to the largest-area claimant
    (the reference's rank-first-by-area reassignment, batch_1a:74-76 /
    batch_1b:127-129); every other claimant has the shared region
    subtracted. Returns (key, ring_sizes, coords, kept_area)."""
    from .overlaps import detect_overlaps

    pairs = detect_overlaps(polys.select(key_col, "ring_sizes", "coords"), key_col)
    areas = polys.select(
        F.col(key_col).alias("k"), F.col(area_col).alias("ar")
    )
    p = (
        pairs.join(areas.withColumnRenamed("k", "key_a").withColumnRenamed("ar", "area_a"), "key_a")
        .join(areas.withColumnRenamed("k", "key_b").withColumnRenamed("ar", "area_b"), "key_b")
    )
    # loser = smaller area (ties: larger key string loses → determinism)
    loser = F.when(
        (F.col("area_a") < F.col("area_b"))
        | ((F.col("area_a") == F.col("area_b")) & (F.col("key_a") > F.col("key_b"))),
        F.col("key_a"),
    ).otherwise(F.col("key_b"))
    winner = F.when(loser == F.col("key_a"), F.col("key_b")).otherwise(F.col("key_a"))
    lw = p.select(loser.alias("loser"), winner.alias("winner"))
    geom = polys.select(F.col(key_col).alias("g_key"), "ring_sizes", "coords")
    # losers clipped by their winners' geometry
    loser_side = (
        lw.join(geom, lw.loser == geom.g_key)
        .select(
            F.col("loser").alias("e_key"), "winner",
            F.col("ring_sizes").alias("rs_l"), F.col("coords").alias("c_l"),
        )
        .join(geom, F.col("winner") == geom.g_key)
        .select(
            "e_key", "rs_l", "c_l",
            F.col("ring_sizes").alias("rs_w"), F.col("coords").alias("c_w"),
        )
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pa = _poly_of(pdf["rs_l"].iloc[0], pdf["c_l"].iloc[0])
        pb = [
            unpack_rings(pdf["rs_w"].iloc[i], pdf["c_w"].iloc[i])
            for i in range(len(pdf))
        ]
        pieces = overlay(pa, pb, "difference")
        rows = []
        for shell, holes in pieces:
            sizes, coords = pack_rings(shell, holes)
            rows.append(
                {
                    "key": key[0], "ring_sizes": sizes, "coords": coords,
                    "kept_area": polygon_area(shell, holes),
                }
            )
        return pd.DataFrame(rows, columns=["key", "ring_sizes", "coords", "kept_area"])

    clipped = loser_side.groupBy("e_key").applyInPandas(run, ERASE_SCHEMA)
    untouched = polys.join(
        lw.select(F.col("loser").alias(key_col)).distinct(), key_col, "left_anti"
    ).select(F.col(key_col).alias("key"), "ring_sizes", "coords")

    def add_area(batches):
        for pdf in batches:
            areas = [
                polygon_area(*unpack_rings(s, c))
                for s, c in zip(pdf["ring_sizes"], pdf["coords"])
            ]
            yield pdf.assign(kept_area=areas)

    untouched = untouched.mapInPandas(add_area, schema=ERASE_SCHEMA)
    return clipped.unionByName(untouched)
