"""Urban crosswalk labeling (batch-1c semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kblock_spark.geo.geom import pack_rings
from kblock_spark.io.synth import ADMIN_SIZE_DEG, ORIGIN_LAT, ORIGIN_LON, synth_admin, synth_streets
from kblock_spark.kernels.blocks import delineate_blocks
from kblock_spark.ops.crosswalk import crosswalk


def rect(x0, y0, w, h):
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])


def _poly_df(spark, key, geoms):
    rows = []
    for kid, g in geoms:
        sizes, coords = pack_rings(g)
        rows.append({key: kid, "ring_sizes": sizes, "coords": coords})
    return spark.createDataFrame(rows)


def test_crosswalk_labels(spark):
    admin = spark.createDataFrame(synth_admin(2, 2))
    streets = spark.createDataFrame(synth_streets(2, 2, 2))
    blocks = delineate_blocks(admin, streets).cache()
    # urban core over the first admin unit; conurbation covering the
    # first TWO unit columns
    urban = _poly_df(
        spark, "urban_id",
        [("u1", rect(ORIGIN_LON, ORIGIN_LAT, ADMIN_SIZE_DEG, ADMIN_SIZE_DEG))],
    )
    conur = _poly_df(
        spark, "conurbation_id",
        [("c1", rect(ORIGIN_LON, ORIGIN_LAT, ADMIN_SIZE_DEG, 2 * ADMIN_SIZE_DEG))],
    )
    cw = crosswalk(blocks, urban, conur).cache()
    assert cw.count() == blocks.count()
    got = {r["block_id"]: r for r in cw.collect()}
    for bid, r in got.items():
        unit = bid.rsplit("_", 1)[0]  # e.g. AAA.1.1_1
        if unit == "AAA.1.1_1":
            assert r["urban_class"] == "urban" and r["urban_id"] == "u1"
        elif unit == "AAA.1.2_1":
            assert r["urban_class"] == "peri_urban"
            assert r["conurbation_id"] == "c1"
            assert r["urban_id"] == "nonurban_AAA"
        else:
            assert r["urban_class"] == "non_urban"
            assert r["urban_id"] == "nonurban_AAA"
    # layer codes unique per class+id combination, non-null everywhere
    assert cw.where(F.col("urban_layer_code").isNull()).count() == 0