"""Dissolve (union-by-group) and overlap-detection operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kblock_spark.geo.geom import pack_rings, polygon_area, ring_area, unpack_rings
from kblock_spark.ops.dissolve import dissolve, dissolve_rings
from kblock_spark.ops.overlaps import detect_overlaps, polygons_overlap


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])


def test_dissolve_rings_grid():
    # 2x2 grid of unit squares → one 2x2 square
    polys = [(_sq(i, j, 1.0), []) for i in range(2) for j in range(2)]
    merged = dissolve_rings(polys)
    assert len(merged) == 1
    shell, holes = merged[0]
    assert polygon_area(shell, holes) == pytest.approx(4.0)
    assert holes == []


def test_dissolve_rings_with_hole():
    # ring of 8 squares around an empty center → square with a hole
    polys = [
        (_sq(i, j, 1.0), [])
        for i in range(3)
        for j in range(3)
        if not (i == 1 and j == 1)
    ]
    merged = dissolve_rings(polys)
    assert len(merged) == 1
    shell, holes = merged[0]
    assert len(holes) == 1
    assert polygon_area(shell, holes) == pytest.approx(8.0)


def test_dissolve_rings_disjoint_parts():
    polys = [(_sq(0, 0, 1.0), []), (_sq(5, 5, 1.0), [])]
    merged = dissolve_rings(polys)
    assert len(merged) == 2
    assert sum(polygon_area(s, h) for s, h in merged) == pytest.approx(2.0)


def test_dissolve_blocks_reconstitutes_admin(spark):
    from kblock_spark.io.synth import synth_admin, synth_streets
    from kblock_spark.kernels.blocks import delineate_blocks

    admin = spark.createDataFrame(synth_admin(2, 2))
    streets = spark.createDataFrame(synth_streets(2, 2, 2))
    blocks = delineate_blocks(admin, streets)
    dis = dissolve(blocks, "gadm_code").collect()
    assert len(dis) == 4  # one merged polygon per admin unit
    for r in dis:
        assert r["n_parts"] == 1
        shell, holes = unpack_rings(r["ring_sizes"], r["coords"])
        # degrees²: admin unit is 0.02° square
        assert polygon_area(shell, holes) == pytest.approx(0.02 * 0.02, rel=1e-6)


def test_polygons_overlap_cases():
    a = _sq(0, 0, 2.0)
    assert polygons_overlap(a, [], _sq(1, 1, 2.0), [])  # corner overlap
    assert polygons_overlap(a, [], _sq(0.5, 0.5, 1.0), [])  # containment
    assert polygons_overlap(a, [], _sq(1, 0, 2.0), [])  # aligned partial
    assert not polygons_overlap(a, [], _sq(2, 0, 2.0), [])  # edge-adjacent
    assert not polygons_overlap(a, [], _sq(5, 5, 1.0), [])  # disjoint


def test_detect_overlaps_spark(spark):
    rows = []
    # 0-1 overlap, 1-2 overlap, 2 only edge-adjacent to 0, 3 disjoint,
    # 4 contains 5
    geoms = [
        _sq(0, 0, 0.01), _sq(0.005, 0.005, 0.01), _sq(0.01, 0, 0.01),
        _sq(1, 1, 0.01), _sq(2, 2, 0.02), _sq(2.005, 2.005, 0.005),
    ]
    for i, g in enumerate(geoms):
        sizes, coords = pack_rings(g)
        rows.append({"poly_id": f"p{i}", "ring_sizes": sizes, "coords": coords})
    df = spark.createDataFrame(rows)
    pairs = {
        (r["key_a"], r["key_b"]) for r in detect_overlaps(df, "poly_id").collect()
    }
    assert pairs == {("p0", "p1"), ("p1", "p2"), ("p4", "p5")}
