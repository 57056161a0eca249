"""Structural + performance validation of the vectorized Delaunay."""

import time

import numpy as np

from kblock_spark.geo.delaunay import delaunay_edges


def _emst_edges(pts: np.ndarray) -> set[tuple[int, int]]:
    """Prim's MST on the complete Euclidean graph (test oracle): the
    EMST is a known subgraph of any Delaunay triangulation."""
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2))
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = d[0].copy()
    parent = np.zeros(n, dtype=int)
    edges = set()
    for _ in range(n - 1):
        j = int(np.argmin(np.where(in_tree, np.inf, best)))
        edges.add((min(j, parent[j]), max(j, parent[j])))
        in_tree[j] = True
        upd = d[j] < best
        best = np.where(upd, d[j], best)
        parent = np.where(upd, j, parent)
    return edges


def test_emst_subset_and_planarity():
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(0, 100, (80, 2))
        edges = delaunay_edges(pts)
        assert _emst_edges(pts) <= edges, f"seed {seed}: EMST edge missing"
        assert len(edges) <= 3 * 80 - 6  # planar bound


def test_nearest_neighbor_edge_present():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 10, (120, 2))
    edges = delaunay_edges(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(d, np.inf)
    for i in range(120):
        j = int(np.argmin(d[i]))
        assert (min(i, j), max(i, j)) in edges


def test_large_block_performance():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 1000, (8000, 2))
    t0 = time.time()
    edges = delaunay_edges(pts)
    dt = time.time() - t0
    assert dt < 30, f"8k-point triangulation took {dt:.1f}s"
    assert len(edges) > 8000  # roughly 3n edges expected
    assert len(edges) <= 3 * 8000 - 6


def test_small_path_matches_numpy_path():
    # the scalar small-input path must stay bit-identical to the
    # vectorized path on both sides of the dispatch threshold
    import numpy as np

    import kblock_spark.geo.delaunay as dl

    rng = np.random.default_rng(99)
    for pts in (
        rng.uniform(0, 1, (233, 2)),
        rng.uniform(-1e7, 1e7, (500, 2)),
        np.stack(np.meshgrid(np.arange(15), np.arange(15)), -1)
        .reshape(-1, 2)
        .astype(float),  # exact cocircular grid
    ):
        u = np.unique(pts.round(9), axis=0)
        a = dl._triangulate_small(u)
        old = dl._SMALL_N
        try:
            dl._SMALL_N = -1
            b = dl._triangulate(u)
        finally:
            dl._SMALL_N = old
        assert np.array_equal(a, b)
