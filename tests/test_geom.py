"""Unit tests for the pure-numpy geometry kernel."""

import numpy as np
import pytest

from kblock_spark.geo import geom as G
from kblock_spark.geo import tiling as T
from kblock_spark.geo.delaunay import delaunay_edges
from kblock_spark.geo.mercator import lonlat_to_mercator, mercator_to_lonlat
from kblock_spark.geo.polygonize import polygonize, representative_point

SQ = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


def test_ring_area_perimeter_centroid():
    assert G.ring_area(SQ) == pytest.approx(1.0)
    assert G.ring_area(SQ[::-1]) == pytest.approx(-1.0)
    assert G.ring_perimeter(SQ) == pytest.approx(4.0)
    assert G.ring_centroid(SQ) == pytest.approx((0.5, 0.5))


def test_polygon_area_with_hole():
    hole = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])
    assert G.polygon_area(SQ, [hole]) == pytest.approx(1.0 - 0.25)


def test_points_in_ring():
    px = np.array([0.5, 1.5, -0.1, 0.99])
    py = np.array([0.5, 0.5, 0.5, 0.01])
    assert G.points_in_ring(px, py, SQ).tolist() == [True, False, False, True]


def test_points_in_polygon_hole():
    hole = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6]])
    m = G.points_in_polygon(np.array([0.5, 0.2]), np.array([0.5, 0.2]), SQ, [hole])
    assert m.tolist() == [False, True]


def test_min_dist():
    a = np.array([[0.0, 0.0]])
    b = np.array([[1.0, 0.0]])
    d = G.points_to_segments_mindist(np.array([0.5, 2.0]), np.array([1.0, 0.0]), a, b)
    assert d == pytest.approx([1.0, 1.0])


def test_clip_ring_to_box():
    c = G.clip_ring_to_box(SQ * 2.0, 1.0, 1.0, 3.0, 3.0)
    assert abs(G.ring_area(c)) == pytest.approx(1.0)
    assert G.box_polygon_overlap_area(SQ, [], 0.5, 0.5, 2.0, 2.0) == pytest.approx(0.25)


def test_clip_polyline_to_polygon():
    line = np.array([[-1.0, 0.5], [2.0, 0.5]])
    pieces = G.clip_polyline_to_polygon(line, SQ)
    assert sum(G.polyline_length(p) for p in pieces) == pytest.approx(1.0)


def test_pack_unpack():
    hole = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6]])
    sizes, coords = G.pack_rings(SQ, [hole])
    shell2, holes2 = G.unpack_rings(sizes, coords)
    assert np.allclose(shell2, SQ) and np.allclose(holes2[0], hole)


def test_mercator_roundtrip():
    lon = np.array([0.0, 13.4, -77.1, 151.2])
    lat = np.array([0.0, 52.5, 38.9, -33.9])
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)
    # equator scale: 1 deg lon = a * pi/180
    x1, _ = lonlat_to_mercator(np.array([1.0]), np.array([0.0]))
    assert x1[0] == pytest.approx(6378137.0 * np.pi / 180.0)


def test_geohash_known_values():
    # publicly-known geohash: (57.64911, 10.40744) -> 'u4pruydqqvj'
    gh = T.geohash_encode(np.array([10.40744]), np.array([57.64911]), precision=11)
    assert gh[0] == "u4pruydqqvj"
    gh2 = T.geohash_encode(np.array([-5.6]), np.array([42.6]), precision=5)
    assert gh2[0] == "ezs42"


def test_cells_roundtrip_and_kring():
    c = T.cell_of(np.array([10.0]), np.array([50.0]))[0]
    lo0, la0, lo1, la1 = T.cell_bounds(np.array([c]))
    assert lo0[0] <= 10.0 < lo1[0] and la0[0] <= 50.0 < la1[0]
    assert len(T.k_ring(c, 1)) == 9
    assert len(T.ring_only(c, 2)) == 16
    cov = T.cells_covering_bbox(lo0[0], la0[0], lo1[0] + 0.003, la1[0])
    assert c in cov and len(cov) >= 2


def test_cells_covering_polygon_contains_interior_points():
    shell = np.array([[10.0, 50.0], [10.02, 50.0], [10.02, 50.01], [10.0, 50.01]])
    cells = T.cells_covering_polygon(shell)
    pts_lon = np.linspace(10.001, 10.019, 7)
    pts_lat = np.linspace(50.001, 50.009, 7)
    pc = T.cell_of(pts_lon, pts_lat)
    assert np.isin(pc, cells).all()


def test_delaunay_square_grid():
    # 3x3 grid with slight jitter (avoid cocircular degeneracy)
    rng = np.random.default_rng(7)
    xs, ys = np.meshgrid(np.arange(3.0), np.arange(3.0))
    pts = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)
    pts += rng.uniform(-0.01, 0.01, pts.shape)
    edges = delaunay_edges(pts)
    # every point connects to its horizontal/vertical grid neighbor
    def idx(i, j):
        return j * 3 + i
    for i in range(3):
        for j in range(3):
            if i < 2:
                assert (min(idx(i, j), idx(i + 1, j)), max(idx(i, j), idx(i + 1, j))) in edges
            if j < 2:
                assert (min(idx(i, j), idx(i, j + 1)), max(idx(i, j), idx(i, j + 1))) in edges
    # center point must NOT connect to nothing (sanity)
    assert any(idx(1, 1) in e for e in edges)


def test_delaunay_collinear_and_duplicates():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    assert delaunay_edges(pts) == {(0, 1), (1, 2)}
    pts2 = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0]])
    e = delaunay_edges(pts2)
    assert (0, 1) in e  # co-located pair linked


def test_polygonize_unit_square():
    segs = [SQ[[0, 1]], SQ[[1, 2]], SQ[[2, 3]], SQ[[3, 0]]]
    polys = polygonize(segs)
    assert len(polys) == 1
    shell, holes = polys[0]
    assert G.ring_area(shell) == pytest.approx(1.0)
    assert holes == []


def test_polygonize_grid_face_count():
    # (n streets each way inside a boundary square) → (n+1)^2 faces
    n = 3
    segs = []
    for k in range(n + 2):
        t = k / (n + 1)
        segs.append(np.array([[t, 0.0], [t, 1.0]]))
        segs.append(np.array([[0.0, t], [1.0, t]]))
    polys = polygonize(segs)
    assert len(polys) == (n + 1) ** 2
    total = sum(G.polygon_area(s, h) for s, h in polys)
    assert total == pytest.approx(1.0)


def test_polygonize_crossing_unnoded_lines():
    # two crossing diagonals inside a square: noding must split them
    segs = [
        SQ[[0, 1]], SQ[[1, 2]], SQ[[2, 3]], SQ[[3, 0]],
        np.array([[0.0, 0.0], [1.0, 1.0]]),
        np.array([[1.0, 0.0], [0.0, 1.0]]),
    ]
    polys = polygonize(segs)
    assert len(polys) == 4
    assert sum(G.polygon_area(s, h) for s, h in polys) == pytest.approx(1.0)


def test_polygonize_dangle_ignored():
    segs = [
        SQ[[0, 1]], SQ[[1, 2]], SQ[[2, 3]], SQ[[3, 0]],
        np.array([[0.5, 0.5], [0.8, 0.5]]),  # interior dangle
        np.array([[1.0, 0.5], [1.5, 0.5]]),  # exterior dangle
    ]
    polys = polygonize(segs)
    assert len(polys) == 1
    assert G.polygon_area(*polys[0]) == pytest.approx(1.0)


def test_polygonize_island_becomes_hole_and_face():
    inner = SQ * 0.2 + 0.4
    segs = [SQ[[0, 1]], SQ[[1, 2]], SQ[[2, 3]], SQ[[3, 0]],
            inner[[0, 1]], inner[[1, 2]], inner[[2, 3]], inner[[3, 0]]]
    polys = polygonize(segs)
    areas = sorted(G.polygon_area(s, h) for s, h in polys)
    assert len(polys) == 2
    assert areas[0] == pytest.approx(0.04)
    assert areas[1] == pytest.approx(0.96)  # outer face minus hole


def test_representative_point_inside():
    # concave L-shape where centroid is outside
    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], dtype=float)
    px, py = representative_point(L)
    assert G.points_in_ring(np.array([px]), np.array([py]), L)[0]


def test_tiled_pairwise_matches_full_matrix(monkeypatch):
    """segments_mindist_rowmin / segments_pairs_within are tiled
    re-expressions of the full-matrix computation — force a tiny tile
    and check bit-identical results."""
    rng = np.random.default_rng(7)
    a1 = rng.uniform(0, 10, (37, 2))
    b1 = a1 + rng.uniform(-1, 1, (37, 2))
    a2 = rng.uniform(0, 10, (23, 2))
    b2 = a2 + rng.uniform(-1, 1, (23, 2))
    full = G.segments_pairwise_mindist(a1, b1, a2, b2)
    monkeypatch.setattr(G, "_PAIR_TILE_ELEMS", 50)  # ~2 rows per tile
    rm = G.segments_mindist_rowmin(a1, b1, a2, b2)
    np.testing.assert_array_equal(rm, full.min(axis=1))
    r = 0.8
    ii, jj = G.segments_pairs_within(a1, b1, a2, b2, r)
    want_ii, want_jj = np.nonzero(full <= r)
    assert len(want_ii) > 0  # non-vacuous fixture
    np.testing.assert_array_equal(np.sort(ii * 1000 + jj), np.sort(want_ii * 1000 + want_jj))


def test_tiled_pairwise_empty_sides():
    z = np.zeros((0, 2))
    s = np.array([[0.0, 0.0]])
    assert G.segments_mindist_rowmin(z, z, s, s).shape == (0,)
    assert np.isinf(G.segments_mindist_rowmin(s, s, z, z)).all()
    ii, jj = G.segments_pairs_within(z, z, s, s, 1.0)
    assert len(ii) == 0 and len(jj) == 0
