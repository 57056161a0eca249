"""Delaunay triangulation (Bowyer–Watson) → Voronoi adjacency.

The reference peels concentric layers of **Voronoi parcels** with
pygeos.voronoi_polygons + pairwise ``touches`` tests
(kblock/batch_4_compute_k.py:130-176). Two Voronoi cells share a
boundary edge iff their sites are connected by a Delaunay edge, so the
peel is exactly a BFS over the Delaunay graph — that is what
:mod:`kblock_spark.kernels.complexity` runs. This module provides the
triangulation with no external dependency (no scipy/GEOS in this
container); classic public-domain Bowyer–Watson.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(tri_pts: np.ndarray, p: np.ndarray) -> bool:
    """Is p strictly inside the circumcircle of triangle tri_pts (3,2)?
    Robust-enough determinant test (lifted paraboloid)."""
    ax, ay = tri_pts[0] - p
    bx, by = tri_pts[1] - p
    cx, cy = tri_pts[2] - p
    det = (
        (ax * ax + ay * ay) * (bx * cy - cx * by)
        - (bx * bx + by * by) * (ax * cy - cx * ay)
        + (cx * cx + cy * cy) * (ax * by - bx * ay)
    )
    # orientation sign of the (possibly CW) triangle
    o = (tri_pts[1][0] - tri_pts[0][0]) * (tri_pts[2][1] - tri_pts[0][1]) - (
        tri_pts[1][1] - tri_pts[0][1]
    ) * (tri_pts[2][0] - tri_pts[0][0])
    return det * np.sign(o) > 1e-12


def delaunay_edges(points: np.ndarray) -> set[tuple[int, int]]:
    """Bowyer–Watson; returns the set of Delaunay edges (i<j index
    pairs into ``points``). Duplicate points are merged (all indices of
    a duplicate location share the same adjacency). Collinear inputs
    fall back to a sorted chain."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 2:
        return set()
    # merge exact duplicates
    uniq, inv = np.unique(pts.round(9), axis=0, return_inverse=True)
    m = len(uniq)
    if m == 1:
        return set()
    if m == 2:
        reps = [int(np.nonzero(inv == g)[0][0]) for g in range(m)]
        e = _expand_edges({(0, 1)}, inv, reps)
        return e
    # collinear check
    v = uniq - uniq[0]
    cross = v[:, 0] * v[1, 1] - v[:, 1] * v[1, 0]
    if np.all(np.abs(cross) < 1e-12):
        order = np.argsort(v[:, 0] ** 2 + v[:, 1] ** 2)
        chain = {
            (min(order[i], order[i + 1]), max(order[i], order[i + 1]))
            for i in range(m - 1)
        }
        return _expand_edges(chain, inv, None)

    # super-triangle enclosing everything
    cmin = uniq.min(axis=0)
    cmax = uniq.max(axis=0)
    c = (cmin + cmax) / 2.0
    d = max(cmax[0] - cmin[0], cmax[1] - cmin[1]) * 64.0 + 1.0
    sp = np.array([[c[0] - d, c[1] - d], [c[0] + d, c[1] - d], [c[0], c[1] + d]])
    allp = np.vstack([uniq, sp])
    s0, s1, s2 = m, m + 1, m + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    insert_order = np.argsort(
        cell_key := (uniq[:, 0] - cmin[0]) + 1e-7 * (uniq[:, 1] - cmin[1])
    )
    for ip in insert_order:
        p = allp[ip]
        bad = []
        for t in tris:
            if _circumcircle_contains(allp[list(t)], p):
                bad.append(t)
        # boundary of the star-shaped cavity
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, ccount in edge_count.items() if ccount == 1]
        for t in bad:
            tris.remove(t)
        for e in boundary:
            tris.append((e[0], e[1], int(ip)))
    edges: set[tuple[int, int]] = set()
    for t in tris:
        if any(v >= m for v in t):
            continue
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((min(e), max(e)))
    return _expand_edges(edges, inv, None)


def _expand_edges(uedges, inv, _reps):
    """Map unique-point edges back to original indices: every original
    index inherits its unique group's edges; co-located originals are
    also linked to each other (a duplicate site's Voronoi cell is
    degenerate — the reference dedups via geohash rank,
    kblock/batch_2_prepare_buildings.py:216-220; we keep them adjacent
    so the BFS peel treats them as one site)."""
    groups: dict[int, list[int]] = {}
    for orig, g in enumerate(inv):
        groups.setdefault(int(g), []).append(orig)
    out: set[tuple[int, int]] = set()
    for a, b in uedges:
        for i in groups[int(a)]:
            for j in groups[int(b)]:
                out.add((min(i, j), max(i, j)))
    for g, members in groups.items():
        for x in range(len(members) - 1):
            out.add((members[x], members[x + 1]))
    return out


def adjacency_lists(n: int, edges: set[tuple[int, int]]) -> list[list[int]]:
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    return adj
