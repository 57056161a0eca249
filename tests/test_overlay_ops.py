"""Distributed overlay operators: intersection join, erase,
remove_overlaps (K4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kblock_spark.geo.geom import pack_rings
from kblock_spark.ops.overlay_ops import erase, intersection_join, remove_overlaps


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])


def _df(spark, geoms, key="poly_id", extra=None):
    rows = []
    for i, g in enumerate(geoms):
        sizes, coords = pack_rings(g)
        r = {key: f"p{i}", "ring_sizes": sizes, "coords": coords}
        if extra:
            r.update(extra[i])
        rows.append(r)
    return spark.createDataFrame(rows)


def test_intersection_join(spark):
    a = _df(spark, [sq(0, 0, 0.02), sq(1, 1, 0.02)], key="a_id")
    b = _df(spark, [sq(0.01, 0.01, 0.02), sq(5, 5, 0.02)], key="b_id")
    got = intersection_join(a, b, "a_id", "b_id").collect()
    assert len(got) == 1
    r = got[0]
    assert r["key_a"] == "p0" and r["key_b"] == "p0"
    assert r["overlap_area"] == pytest.approx(0.0001, rel=1e-6)


def test_erase(spark):
    a = _df(spark, [sq(0, 0, 0.02), sq(1, 1, 0.02)], key="a_id")
    b = _df(spark, [sq(0.01, 0.01, 0.02)], key="b_id")
    got = {r["key"]: r["kept_area"] for r in erase(a, b, "a_id", "b_id").collect()}
    assert got["p0"] == pytest.approx(0.0004 - 0.0001, rel=1e-6)
    assert got["p1"] == pytest.approx(0.0004, rel=1e-6)  # untouched


def test_remove_overlaps(spark):
    # big square and small overlapping square: small one loses the
    # shared region
    geoms = [sq(0, 0, 0.03), sq(0.02, 0.02, 0.02), sq(1, 1, 0.01)]
    areas = [0.0009, 0.0004, 0.0001]
    df = _df(spark, geoms, extra=[{"area": a} for a in areas])
    out = remove_overlaps(df, "poly_id", "area").collect()
    kept = {}
    for r in out:
        kept[r["key"]] = kept.get(r["key"], 0.0) + r["kept_area"]
    assert kept["p0"] == pytest.approx(0.0009, rel=1e-6)  # winner intact
    assert kept["p1"] == pytest.approx(0.0004 - 0.0001, rel=1e-6)
    assert kept["p2"] == pytest.approx(0.0001, rel=1e-6)
    # total area = union area (no double counting)
    assert sum(kept.values()) == pytest.approx(0.0009 + 0.0003 + 0.0001, rel=1e-6)