"""General polygon overlay via planar arrangement."""

import numpy as np
import pytest

from kblock_spark.geo.geom import polygon_area
from kblock_spark.geo.overlay import overlay, overlay_area


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])


A = [(sq(0, 0, 2.0), [])]
B = [(sq(1, 1, 2.0), [])]


def test_intersection_area():
    assert overlay_area(A, B, "intersection") == pytest.approx(1.0)
    got = overlay(A, B, "intersection")
    assert len(got) == 1
    assert polygon_area(*got[0]) == pytest.approx(1.0)


def test_difference_area():
    assert overlay_area(A, B, "difference") == pytest.approx(3.0)
    assert overlay_area(B, A, "difference") == pytest.approx(3.0)


def test_union_and_symmetric():
    assert overlay_area(A, B, "union") == pytest.approx(7.0)
    assert overlay_area(A, B, "symmetric_difference") == pytest.approx(6.0)


def test_shared_edge_no_overlap():
    C = [(sq(2, 0, 2.0), [])]  # edge-adjacent to A
    assert overlay_area(A, C, "intersection") == pytest.approx(0.0)
    assert overlay_area(A, C, "union") == pytest.approx(8.0)
    assert overlay_area(A, C, "difference") == pytest.approx(4.0)


def test_containment_difference_creates_hole():
    inner = [(sq(0.5, 0.5, 1.0), [])]
    got = overlay(A, inner, "difference")
    assert sum(polygon_area(s, h) for s, h in got) == pytest.approx(3.0)
    assert len(got) == 1 and len(got[0][1]) == 1  # one polygon, one hole


def test_multi_piece_inputs():
    many_b = [(sq(0.5, 0.5, 0.5), []), (sq(1.25, 0.5, 0.5), []), (sq(5, 5, 1), [])]
    assert overlay_area(A, many_b, "intersection") == pytest.approx(0.5)
    assert overlay_area(A, many_b, "difference") == pytest.approx(4.0 - 0.5)


def test_identical_polygons():
    assert overlay_area(A, A, "intersection") == pytest.approx(4.0)
    assert overlay_area(A, A, "difference") == pytest.approx(0.0)
    assert overlay_area(A, A, "union") == pytest.approx(4.0)


def test_difference_with_polygon_having_hole():
    holed = [(sq(0, 0, 2.0), [sq(0.5, 0.5, 1.0)[::-1]])]
    # A minus holed = the hole region
    got_area = overlay_area(A, holed, "difference")
    assert got_area == pytest.approx(1.0)