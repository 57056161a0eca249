"""Property-based invariants for the geometry kernel (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kblock_spark.geo import geom as G
from kblock_spark.geo.delaunay import delaunay_edges
from kblock_spark.geo.tiling import cell_of, cell_bounds, cells_covering_polygon

coord = st.floats(-50.0, 50.0, allow_nan=False, allow_infinity=False)


def _convex_polygon(draw):
    n = draw(st.integers(3, 10))
    angles = sorted(draw(st.lists(st.floats(0, 2 * np.pi), min_size=n, max_size=n)))
    if len(set(angles)) < 3:
        angles = [0.0, 2.1, 4.2]
    r = draw(st.floats(0.5, 20.0))
    cx = draw(coord)
    cy = draw(coord)
    return np.array(
        [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in sorted(set(angles))]
    )


convex_poly = st.composite(_convex_polygon)()


@settings(max_examples=40, deadline=None)
@given(convex_poly)
def test_convex_centroid_inside(poly):
    if abs(G.ring_area(poly)) < 1e-3:
        return  # degenerate sliver: centroid may sit on the boundary
    cx, cy = G.ring_centroid(poly)
    assert G.points_in_ring(np.array([cx]), np.array([cy]), poly)[0]


@settings(max_examples=40, deadline=None)
@given(convex_poly, st.floats(-30, 30), st.floats(-30, 30), st.floats(0.5, 30))
def test_clip_area_bounded(poly, x0, y0, s):
    full = abs(G.ring_area(poly))
    clipped = G.box_polygon_overlap_area(poly, [], x0, y0, x0 + s, y0 + s)
    assert -1e-9 <= clipped <= full + 1e-6


@settings(max_examples=40, deadline=None)
@given(convex_poly)
def test_pack_unpack_roundtrip(poly):
    sizes, coords = G.pack_rings(poly, [])
    shell, holes = G.unpack_rings(sizes, coords)
    assert np.allclose(shell, poly) and holes == []


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000), st.integers(4, 40))
def test_delaunay_planarity_and_connectivity(seed, n):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 100, (n, 2))
    edges = delaunay_edges(pts)
    assert len(edges) <= 3 * n - 6 or n < 3
    # connectivity: BFS reaches every vertex
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen = {0}
    stack = [0]
    while stack:
        v = stack.pop()
        for w in adj[v]:
            if w not in seen:
                seen.add(w)
                stack.append(w)
    assert len(seen) == n


@settings(max_examples=30, deadline=None)
@given(st.floats(-170, 170), st.floats(-80, 80))
def test_cell_roundtrip(lon, lat):
    c = cell_of(np.array([lon]), np.array([lat]))[0]
    lo0, la0, lo1, la1 = cell_bounds(np.array([c]))
    assert lo0[0] - 1e-9 <= lon < lo1[0] + 1e-9
    assert la0[0] - 1e-9 <= lat < la1[0] + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 1000))
def test_polygon_cover_contains_samples(seed):
    rng = np.random.default_rng(seed)
    cx, cy = rng.uniform(-10, 10), rng.uniform(-10, 10)
    r = rng.uniform(0.002, 0.02)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
    poly = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    if abs(G.ring_area(poly)) < 1e-9:
        return
    cells = cells_covering_polygon(poly)
    # random interior points must be covered
    pts = rng.uniform(0, 1, (50, 2))
    inner = poly.mean(axis=0) * 0.3 + 0.7 * (
        poly[rng.integers(0, len(poly), 50)] * pts[:, :1]
        + poly.mean(axis=0) * (1 - pts[:, :1])
    )
    mask = G.points_in_ring(inner[:, 0], inner[:, 1], poly)
    pc = cell_of(inner[mask, 0], inner[mask, 1])
    assert np.isin(pc, cells).all()


intcoord = st.integers(1, 99999)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(intcoord, intcoord), min_size=1, max_size=60),
    st.tuples(
        st.integers(0, 40000), st.integers(0, 40000),
        st.integers(1, 5000), st.integers(1, 5000),
    ),
    st.tuples(
        st.integers(5000, 45000), st.integers(5000, 45000),
        st.integers(1, 2500),
    ),
)
def test_ray_cast_matches_closed_forms(points, rect, diamond):
    """The generic even-odd ray cast must agree with closed-form
    membership for axis-aligned rectangles (bbox test) and 45-degree
    diamonds (L1-ball test) on integer inputs — the geo_pip_oracle
    exactness argument, fuzzed: odd points, even rectangle corners,
    even diamond centers with odd radii rule out on-edge ties."""
    px = np.array([2 * x + 1 for x, _ in points], dtype=np.float64)
    py = np.array([2 * y + 1 for _, y in points], dtype=np.float64)

    x0, y0, w, h = (2 * v for v in rect)
    ring = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], float
    )
    got = G.points_in_ring(px, py, ring)
    want = (px > x0) & (px < x0 + w) & (py > y0) & (py < y0 + h)
    assert (got == want).all()

    cx, cy, r = 2 * diamond[0], 2 * diamond[1], 2 * diamond[2] + 1
    dia = np.array(
        [[cx, cy - r], [cx + r, cy], [cx, cy + r], [cx - r, cy]], float
    )
    got = G.points_in_ring(px, py, dia)
    want = np.abs(px - cx) + np.abs(py - cy) < r
    assert (got == want).all()
