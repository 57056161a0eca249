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

def test_full_crosswalk_23_columns(spark):
    """The reference's full crosswalk surface (batch_1c:253-349): all
    23 columns, the core/peripheral rank, composite country labels,
    agglomeration attach, and every fillna fallback."""
    from kblock_spark.ops.crosswalk import full_crosswalk

    admin = spark.createDataFrame(synth_admin(2, 2))
    streets = spark.createDataFrame(synth_streets(2, 2, 2))
    blocks = delineate_blocks(admin, streets).cache()

    def attr_df(rows, schema):
        return spark.createDataFrame(rows, schema)

    # two urban cores inside one conurbation: u_big covers a full
    # admin unit (core), u_small a half-unit (peripheral)
    u_big = rect(ORIGIN_LON, ORIGIN_LAT, ADMIN_SIZE_DEG, ADMIN_SIZE_DEG)
    u_small = rect(ORIGIN_LON + ADMIN_SIZE_DEG, ORIGIN_LAT,
                   ADMIN_SIZE_DEG / 2, ADMIN_SIZE_DEG)
    urban_geo = _poly_df(spark, "urban_id", [("u1", u_big), ("u2", u_small)])
    urban = urban_geo.join(
        attr_df([("u1", "Bigville"), ("u2", "Smallton")],
                "urban_id string, urban_center_name string"),
        "urban_id",
    )
    conur_geo = _poly_df(
        spark, "conurbation_id",
        [("c1", rect(ORIGIN_LON, ORIGIN_LAT, 2 * ADMIN_SIZE_DEG, ADMIN_SIZE_DEG))],
    )
    conur = conur_geo.join(
        attr_df([("c1", "Bigville-Smallton-Area")],
                "conurbation_id string, conurbation_area_name string"),
        "conurbation_id",
    )
    agg_geo = _poly_df(
        spark, "agglosid",
        [("ag1", rect(ORIGIN_LON, ORIGIN_LAT, ADMIN_SIZE_DEG, ADMIN_SIZE_DEG))],
    )
    agglos = agg_geo.join(
        attr_df([("ag1", "Bigville Agglo", "yes")],
                "agglosid string, agglosname string, metropole string"),
        "agglosid",
    )
    countries = attr_df([("AAA", "Aaaland", "Africa")],
                        "country_code string, country_name string, continent string")

    cw = full_crosswalk(blocks, urban, conur, agglos, countries).cache()
    assert cw.count() == blocks.count()
    assert len(cw.columns) == 23
    assert cw.where(F.col("urban_layer_code").isNull()).count() == 0
    assert cw.where(F.col("country_name").isNull()).count() == 0

    rows = {r["block_id"]: r for r in cw.collect()}
    seen = set()
    for bid, r in rows.items():
        unit = bid.rsplit("_", 1)[0]
        seen.add((unit, r["class_urban_hierarchy"]))
        if unit == "AAA.1.1_1":  # u_big core
            assert r["area_type"] == "Urban"
            assert r["class_urban_hierarchy"] == "1 - Core urban"
            assert r["urban_center_name"] == "Bigville"
            assert r["agglosname"] == "Bigville Agglo"
            assert r["metropole"] == "yes"
            assert r["urban_layer_code"] == "AAA_c1_u1"
        elif unit == "AAA.2.1_1":  # u_small → peripheral (smaller sum)
            assert r["area_type"] == "Urban" or r["area_type"] == "Peri-urban"
            if r["area_type"] == "Urban":
                assert r["class_urban_hierarchy"] == "2 - Peripheral urban"
                assert r["urban_center_name"] == "Smallton"
            else:
                assert r["urban_center_name"] == "Peri-urban Bigville-Smallton"
        else:  # outside urban and conurbation
            assert r["area_type"] == "Non-urban"
            assert r["class_urban_hierarchy"] == "4 - Non-urban"
            assert r["class_urban_nonurban"] == "2 - Non-urban"
            assert r["urban_center_name"] == "Rest of Aaaland"
            assert r["conurbation_area_name"] == "Rest of Aaaland"
            assert r["urban_layer_code"] == "AAA_nonurban"
    # single-country fixture: composite labels collapse to the country
    urb = [r for r in rows.values() if r["area_type"] == "Urban"]
    assert urb and all(r["urban_country_name"] == "Aaaland" for r in urb)
    assert all(r["urban_country_code"] == "AAA" for r in urb)
    # ids are never null on the full surface (batch_1c:226-227 fills)
    assert all(r["urban_id"] is not None for r in rows.values())
    assert all(r["conurbation_id"] is not None for r in rows.values())
    non = [r for r in rows.values() if r["area_type"] == "Non-urban"]
    assert non and all(r["conurbation_id"] == "nonurban_AAA" for r in non)
    # Africapolis fallbacks (batch_1c:240-242)
    assert all(
        r["agglosid"] == "ag1" or r["agglosid"] == "no_agglosid"
        for r in rows.values()
    )
    noag = [r for r in rows.values() if r["agglosid"] == "no_agglosid"]
    assert noag and all(
        r["agglosname"] == "Non-urban" and r["metropole"] == "No" for r in noag
    )
    # the name_short rule: first two '-'-separated segments
    per = [r for r in rows.values() if r["conurbation_id"] == "c1"]
    assert per and all(
        r["conurbation_area_name_short"] == "Bigville-Smallton" for r in per
    )
    # both hierarchy levels realized in the fixture
    classes = {r["class_urban_hierarchy"] for r in rows.values()}
    assert "1 - Core urban" in classes and "4 - Non-urban" in classes
