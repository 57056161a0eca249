"""Planar-arrangement polygonization: line network → face polygons.

The reference's core block-maker is ``pygeos.polygonize_full`` over
the union of OSM street lines and the admin polygon's exterior ring
(kblock/batch_1b_generate_blocks.py:193-195). This is the same
operation built from first principles (classic noding + half-edge face
traversal, a textbook/public algorithm):

1. node all input segments at pairwise intersections,
2. prune dangling chains (GEOS polygonize ignores dangles),
3. build directed half-edges, sort outgoing edges CCW per vertex,
4. trace faces (interior kept on the left); CCW cycles are bounded
   faces, CW cycles are component outer boundaries,
5. assign CW cycles nested inside a bounded face as its holes.

Runs per admin unit inside a grouped-map pandas UDF — embarrassingly
parallel across admin units, exactly how the reference fans out
(batch_1b:340 ``map(build_blocks, gadm_list)``).
"""

from __future__ import annotations

import math

import numpy as np

from .geom import (
    EPS,
    points_in_ring,
    ring_area,
    segment_intersection_params,
)

_SNAP = 1e-9


def _key(pt) -> tuple[float, float]:
    return (round(float(pt[0]) / _SNAP) * _SNAP, round(float(pt[1]) / _SNAP) * _SNAP)


def node_segments(segments: list[np.ndarray]) -> list[tuple[tuple, tuple]]:
    """Split every segment at its intersections with every other.
    Input: list of (2,2) arrays. Output: list of (key_a, key_b) noded
    sub-segments with snapped endpoints, deduplicated."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments if len(s) == 2]
    cuts: list[list[float]] = [[0.0, 1.0] for _ in segs]
    for i in range(len(segs)):
        a1, b1 = segs[i]
        for j in range(i + 1, len(segs)):
            a2, b2 = segs[j]
            # quick bbox reject
            if (
                max(a1[0], b1[0]) < min(a2[0], b2[0]) - EPS
                or max(a2[0], b2[0]) < min(a1[0], b1[0]) - EPS
                or max(a1[1], b1[1]) < min(a2[1], b2[1]) - EPS
                or max(a2[1], b2[1]) < min(a1[1], b1[1]) - EPS
            ):
                continue
            pr = segment_intersection_params(a1, b1, a2, b2)
            if pr is None:
                # collinear overlap: split at each other's endpoints
                for p, lst, aa, bb in (
                    (a2, cuts[i], a1, b1), (b2, cuts[i], a1, b1),
                    (a1, cuts[j], a2, b2), (b1, cuts[j], a2, b2),
                ):
                    d = bb - aa
                    L2 = float(d @ d)
                    if L2 < EPS:
                        continue
                    t = float((p - aa) @ d) / L2
                    if EPS < t < 1 - EPS:
                        perp = abs((p - aa)[0] * d[1] - (p - aa)[1] * d[0]) / math.sqrt(L2)
                        if perp < EPS:
                            lst.append(t)
                continue
            t, u = pr
            if -EPS <= t <= 1 + EPS and -EPS <= u <= 1 + EPS:
                if EPS < t < 1 - EPS:
                    cuts[i].append(t)
                if EPS < u < 1 - EPS:
                    cuts[j].append(u)
    out = set()
    for i, s in enumerate(segs):
        a, b = s
        ts = sorted(set(cuts[i]))
        for k in range(len(ts) - 1):
            p = _key(a + ts[k] * (b - a))
            q = _key(a + ts[k + 1] * (b - a))
            if p != q:
                out.add((min(p, q), max(p, q)))
    return list(out)


def _prune_dangles(edges: list[tuple[tuple, tuple]]) -> list[tuple[tuple, tuple]]:
    """Iteratively drop edges with a degree-1 endpoint (dangles cannot
    bound a face; GEOS polygonize reports them separately)."""
    edges = list(edges)
    while True:
        deg: dict[tuple, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = [e for e in edges if deg[e[0]] > 1 and deg[e[1]] > 1]
        if len(keep) == len(edges):
            return keep
        edges = keep


def polygonize(segments: list[np.ndarray]) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Line segments → list of polygons (shell, holes).

    Shells are returned CCW, holes CW.
    """
    noded = _prune_dangles(node_segments(segments))
    if not noded:
        return []
    # half-edge structure
    out_edges: dict[tuple, list[tuple]] = {}
    for a, b in noded:
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)
    # sort outgoing neighbors CCW by angle
    order: dict[tuple, list[tuple]] = {}
    for v, nbrs in out_edges.items():
        order[v] = sorted(
            set(nbrs), key=lambda w: math.atan2(w[1] - v[1], w[0] - v[0])
        )
    visited: set[tuple[tuple, tuple]] = set()
    cycles: list[list[tuple]] = []
    for a, b in noded:
        for he in ((a, b), (b, a)):
            if he in visited:
                continue
            cycle = []
            cur = he
            while cur not in visited:
                visited.add(cur)
                cycle.append(cur[0])
                u, v = cur
                nbrs = order[v]
                # next outgoing at v: the one clockwise-after the
                # reversed edge (v→u) in CCW order → face kept on left
                i = nbrs.index(u)
                nxt = nbrs[(i - 1) % len(nbrs)]
                cur = (v, nxt)
            cycles.append(cycle)
    shells: list[np.ndarray] = []
    holes_cw: list[np.ndarray] = []
    for cyc in cycles:
        if len(cyc) < 3:
            continue
        ring = np.asarray(cyc, dtype=np.float64)
        a = ring_area(ring)
        if a > EPS:
            shells.append(ring)
        elif a < -EPS:
            holes_cw.append(ring)
    # assign CW cycles as holes of the smallest containing shell
    polys: list[tuple[np.ndarray, list[np.ndarray]]] = [(s, []) for s in shells]
    if holes_cw and shells:
        areas = [ring_area(s) for s in shells]
        for h in holes_cw:
            h_area = abs(ring_area(h))
            best = -1
            best_area = math.inf
            for i, s in enumerate(shells):
                # a true container: strictly larger, and every hole
                # vertex inside the shell (rules out the arrangement's
                # own unbounded outer cycle, whose vertices lie on or
                # outside each bounded face)
                if areas[i] <= h_area or areas[i] >= best_area:
                    continue
                sset = {(_key(p)) for p in s}
                if all(_key(p) in sset for p in h):
                    continue  # the shell's own reversed boundary
                if points_in_ring(h[:, 0], h[:, 1], s).all():
                    best, best_area = i, areas[i]
            if best >= 0:
                polys[best][1].append(h)
    return polys


def representative_point_poly(
    shell: np.ndarray, holes: list[np.ndarray]
) -> tuple[float, float]:
    """A point inside the polygon (shell minus holes)."""
    from .geom import points_in_polygon, ring_centroid

    cx, cy = ring_centroid(shell)
    if points_in_polygon(np.array([cx]), np.array([cy]), shell, holes)[0]:
        return cx, cy
    n = len(shell)
    for i in range(n):
        a = shell[i]
        b = shell[(i + 1) % n]
        mid = (a + b) / 2.0
        nrm = np.array([-(b - a)[1], (b - a)[0]])
        ln = np.sqrt((nrm**2).sum())
        if ln < EPS:
            continue
        for scale in (1e-7, 1e-6, 1e-5, 1e-4):
            p = mid + nrm / ln * scale * max(abs(b - a).max(), 1.0)
            if points_in_polygon(np.array([p[0]]), np.array([p[1]]), shell, holes)[0]:
                return float(p[0]), float(p[1])
    return cx, cy


def representative_point(shell: np.ndarray) -> tuple[float, float]:
    """A point guaranteed inside the ring (centroid with fallback scan,
    analogue of pygeos representative_point, batch_1b:234)."""
    from .geom import ring_centroid

    cx, cy = ring_centroid(shell)
    if points_in_ring(np.array([cx]), np.array([cy]), shell)[0]:
        return cx, cy
    # fan midpoints between edge midpoints and slightly inside
    n = len(shell)
    for i in range(n):
        a = shell[i]
        b = shell[(i + 1) % n]
        mid = (a + b) / 2.0
        nrm = np.array([-(b - a)[1], (b - a)[0]])
        ln = np.sqrt((nrm**2).sum())
        if ln < EPS:
            continue
        for scale in (1e-7, 1e-6, 1e-5):
            p = mid + nrm / ln * scale
            if points_in_ring(np.array([p[0]]), np.array([p[1]]), shell)[0]:
                return float(p[0]), float(p[1])
    return cx, cy
