"""k-complexity: concentric building-layer peeling per block.

Reimplements the reference's ``compute_k``
(kblock/batch_4_compute_k.py:41-188) on first principles:

- The reference tessellates building points into **Voronoi parcels**
  clipped to the block and peels layers with pairwise ``touches``
  tests. Two Voronoi cells share a boundary iff their sites are
  Delaunay-adjacent, so the peel is a **BFS over the Delaunay graph**
  of the building points — computed here with the self-contained
  Bowyer–Watson in :mod:`kblock_spark.geo.delaunay` (no GEOS in this
  container). Corner-only parcel contact (4 cocircular sites) is the
  one case where GEOS ``touches`` and Delaunay adjacency can differ;
  fixtures avoid cocircular degeneracy.
- "Parcel intersects the on-network street buffer" (batch_4:115,131)
  becomes: the parcel's site is the nearest building to some sampled
  point of the on-network streets (a Voronoi cell contains a street
  point iff its site is that point's nearest site).
- On/off-network street classification (batch_4:93-117) is the exact
  graph formulation of the reference's buffer-union construction:
  street pieces clipped to the block are connected when their
  (radius/2)-buffers overlap (distance ≤ radius), connected to the
  exterior zone when within 1.5·radius of the block's exterior ring,
  and a component is on-network when it reaches the exterior zone or
  an exterior-access street (an unclipped street within ``radius`` of
  the exterior ring) passes within radius/2 of one of its pieces.
- Disconnected blocks (no on-network streets) seed the peel with the
  parcels on the block boundary — the same outcome as the reference's
  shrink-by-0.9999 boundary-ring fallback (batch_4:157-168).
- ``bldg_count ∈ {0, 1}`` → k = 1 (batch_4:179-181).

Runs as ``cogroup(buildings_with_block_geom, streets_near_block)
.applyInPandas`` keyed by block_id — one shuffle, then embarrassingly
parallel across blocks, replacing the reference's multiprocessing pool
(batch_4:576-577).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.delaunay import delaunay_edges
from ..geo.geom import (
    clip_polyline_to_polygon,
    convex_hull_indices,
    polyline_length,
    points_to_segments_mindist,
    sample_polyline,
    unpack_rings,
)
from ..geo.mercator import lonlat_to_mercator

BUFFER_RADIUS_M = 100.0  # reference default (batch_4:41)

K_SCHEMA = (
    "block_id string, on_network_street_length double, "
    "off_network_street_length double, nearest_external_street double, "
    "building_count int, building_layers string, k_complexity int"
)

K_COLUMNS = [
    "block_id", "on_network_street_length", "off_network_street_length",
    "nearest_external_street", "building_count", "building_layers",
    "k_complexity",
]


def _merc(coords_deg: np.ndarray) -> np.ndarray:
    x, y = lonlat_to_mercator(coords_deg[:, 0], coords_deg[:, 1])
    return np.stack([x, y], axis=1)


class _GridNN:
    """Exact nearest-site index on a uniform grid hash (cell ≈ mean
    site spacing, expanding ring search) — the in-kernel stand-in for
    the reference's STRtree (batch_2:68-69)."""

    def __init__(self, sites: np.ndarray):
        self.sites = sites
        ns = len(sites)
        lo = sites.min(axis=0)
        hi = sites.max(axis=0)
        span = max(hi[0] - lo[0], hi[1] - lo[1], 1e-9)
        self.lo = lo
        self.cell = max(span / max(np.sqrt(ns), 1.0), 1e-9)
        gx = np.floor((sites[:, 0] - lo[0]) / self.cell).astype(np.int64)
        gy = np.floor((sites[:, 1] - lo[1]) / self.cell).astype(np.int64)
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        order = np.lexsort((gy, gx))
        keys = np.stack([gx[order], gy[order]], axis=1)
        starts = np.flatnonzero(
            np.any(np.diff(keys, axis=0) != 0, axis=1)
        ) + 1
        bounds = np.concatenate([[0], starts, [ns]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e > s:
                self.buckets[(int(keys[s, 0]), int(keys[s, 1]))] = order[s:e]

    def query_one(self, p) -> int:
        gx = int(np.floor((p[0] - self.lo[0]) / self.cell))
        gy = int(np.floor((p[1] - self.lo[1]) / self.cell))
        best_d2 = np.inf
        best_j = 0
        r = 0
        while True:
            cand: list[np.ndarray] = []
            if r == 0:
                b = self.buckets.get((gx, gy))
                if b is not None:
                    cand.append(b)
            else:
                for dx in range(-r, r + 1):
                    for dy in range(-r, r + 1):
                        if max(abs(dx), abs(dy)) == r:
                            b = self.buckets.get((gx + dx, gy + dy))
                            if b is not None:
                                cand.append(b)
            if cand:
                cj = np.concatenate(cand)
                d2 = ((self.sites[cj] - p) ** 2).sum(axis=1)
                k = int(np.argmin(d2))
                if d2[k] < best_d2:
                    best_d2 = d2[k]
                    best_j = int(cj[k])
            if best_d2 <= (r * self.cell) ** 2:  # exact stop condition
                return best_j
            r += 1

    def query(self, pts: np.ndarray) -> np.ndarray:
        return np.array([self.query_one(p) for p in pts], dtype=np.int64)


def _nearest_site(samples: np.ndarray, sites: np.ndarray) -> np.ndarray:
    """Index of nearest site for each sample (exact)."""
    ns = len(sites)
    if ns == 0:
        return np.zeros(0, dtype=np.int64)
    if ns * len(samples) <= 2_000_000:
        out = np.empty(len(samples), dtype=np.int64)
        chunk = max(1, int(4_000_000 / ns))
        for s in range(0, len(samples), chunk):
            e = min(s + chunk, len(samples))
            d2 = ((samples[s:e, None, :] - sites[None, :, :]) ** 2).sum(axis=2)
            out[s:e] = d2.argmin(axis=1)
        return out
    return _GridNN(sites).query(samples)


def _cells_crossed_by_segment(
    a: np.ndarray, b: np.ndarray, nn: "_GridNN", min_len: float = 1e-6
) -> set[int]:
    """EXACT set of sites whose Voronoi cell the segment a→b crosses.

    Voronoi cells are convex, so each cell's ownership along the line
    is one contiguous interval → recursive bisection between
    differing-endpoint owners enumerates every owner without any
    sampling-step heuristic (replaces GEOS's exact
    intersects(parcel, street) test, batch_4:115,131)."""
    out: set[int] = set()
    ia = nn.query_one(a)
    ib = nn.query_one(b)
    out.add(ia)
    out.add(ib)
    stack = [(a, b, ia, ib)]
    while stack:
        p, q, i0, i1 = stack.pop()
        if i0 == i1:
            continue
        d = q - p
        if (d * d).sum() <= min_len * min_len:
            continue
        mpt = (p + q) / 2.0
        im = nn.query_one(mpt)
        out.add(im)
        if im == i0:
            stack.append((mpt, q, im, i1))
        elif im == i1:
            stack.append((p, mpt, i0, im))
        else:
            stack.append((p, mpt, i0, im))
            stack.append((mpt, q, im, i1))
    return out


class _UnionFind:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, a: int) -> int:
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


def _street_networks(
    shell_m: np.ndarray,
    holes_m: list[np.ndarray],
    lines_m: list[np.ndarray],
    radius: float,
):
    """→ (on_len, off_len, nearest_flag_zero, on_pieces)

    on_pieces: list of clipped 2-pt segments classified on-network.
    nearest_flag_zero: True if any street intersects the block.
    """
    pieces: list[np.ndarray] = []
    for line in lines_m:
        for i in range(len(line) - 1):
            pieces.extend(clip_polyline_to_polygon(line[i : i + 2], shell_m, holes_m))
    if not pieces:
        return 0.0, 0.0, False, []
    ring_closed = np.vstack([shell_m, shell_m[:1]])
    ring_a = ring_closed[:-1]
    ring_b = ring_closed[1:]

    def dist_seg_to_ring(seg: np.ndarray) -> float:
        d1 = points_to_segments_mindist(seg[:, 0], seg[:, 1], ring_a, ring_b).min()
        # also ring vertices to the segment
        d2 = points_to_segments_mindist(
            ring_a[:, 0], ring_a[:, 1], seg[:1], seg[1:]
        ).min()
        return min(d1, d2)

    # exterior-access streets: unclipped lines within `radius` of the
    # exterior ring (batch_4:104-105 intersects(streets, external_buffer))
    access: list[np.ndarray] = []
    for line in lines_m:
        samp = sample_polyline(line, radius / 4.0)
        if points_to_segments_mindist(samp[:, 0], samp[:, 1], ring_a, ring_b).min() <= radius:
            access.append(line)

    n = len(pieces)
    EXT = n
    uf = _UnionFind(n + 1)
    mids = np.array([(p[0] + p[1]) / 2.0 for p in pieces])
    ends_a = np.array([p[0] for p in pieces])
    ends_b = np.array([p[1] for p in pieces])
    for i in range(n):
        # piece to exterior zone: internal r/2 buffer meets external r
        # buffer ⇔ distance to exterior ring ≤ 1.5 r
        if dist_seg_to_ring(pieces[i]) <= 1.5 * radius:
            uf.union(i, EXT)
        # piece-piece: r/2 buffers overlap ⇔ distance ≤ r
        si = sample_polyline(pieces[i], radius / 4.0)
        for j in range(i + 1, n):
            d = points_to_segments_mindist(
                si[:, 0], si[:, 1], ends_a[j : j + 1], ends_b[j : j + 1]
            ).min()
            if d <= radius:
                uf.union(i, j)
    kept_roots = set()
    if access:
        kept_roots.add(uf.find(EXT))
        # components whose pieces pass within r/2 of an access street
        acc_samp = np.vstack([sample_polyline(a, radius / 4.0) for a in access])
        for i in range(n):
            d = points_to_segments_mindist(
                acc_samp[:, 0], acc_samp[:, 1], ends_a[i : i + 1], ends_b[i : i + 1]
            ).min()
            if d <= radius / 2.0:
                kept_roots.add(uf.find(i))
    on_pieces = [p for i, p in enumerate(pieces) if uf.find(i) in kept_roots]
    on_len = sum(polyline_length(p) for p in on_pieces)
    total = sum(polyline_length(p) for p in pieces)
    return on_len, total - on_len, True, on_pieces


def compute_k_block(
    shell_deg: np.ndarray,
    holes_deg: list[np.ndarray],
    pts_deg: np.ndarray,
    street_lines_deg: list[np.ndarray],
    buffer_radius: float = BUFFER_RADIUS_M,
) -> dict:
    """Pure per-block kernel (unit-testable without Spark)."""
    shell_m = _merc(shell_deg)
    holes_m = [_merc(h) for h in holes_deg]
    pts_m = _merc(pts_deg) if len(pts_deg) else np.zeros((0, 2))
    # clip street lines to the block bbox expanded by the buffer radius
    # (the reference receives streets clipped to 100 m-buffered blocks,
    # batch_4:545-549; this also introduces the same boundary vertices
    # used by the nearest_external_street vertex distance)
    lines_m = []
    if street_lines_deg:
        bx0, by0 = shell_m.min(axis=0) - 2 * buffer_radius
        bx1, by1 = shell_m.max(axis=0) + 2 * buffer_radius
        bbox_ring = np.array([[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]])
        for line in street_lines_deg:
            lm = _merc(line)
            for i in range(len(lm) - 1):
                for piece in clip_polyline_to_polygon(lm[i : i + 2], bbox_ring, []):
                    lines_m.append(piece)

    n = len(pts_m)
    if lines_m:
        on_len, off_len, intersects, on_pieces = _street_networks(
            shell_m, holes_m, lines_m, buffer_radius
        )
        if intersects and (on_len + off_len) > 0:
            nearest_ext = 0.0
        else:
            # distance from building-cloud centroid to nearest street
            # vertex (batch_4:91-92)
            verts = np.vstack(lines_m)
            if n:
                c = pts_m.mean(axis=0)
                nearest_ext = float(np.sqrt(((verts - c) ** 2).sum(axis=1)).min())
            else:
                nearest_ext = float("nan")
    else:
        on_len, off_len, on_pieces = 0.0, 0.0, []
        nearest_ext = float("nan")

    # ----- peel
    layers, assignment = _peel_layers(
        pts_m, shell_m, holes_m, on_pieces, on_len > 0
    )

    return {
        "on_network_street_length": float(on_len),
        "off_network_street_length": float(off_len),
        "nearest_external_street": float(nearest_ext),
        "building_count": int(n),
        "building_layers": ",".join(layers),
        "k_complexity": int(len(layers)),
        "layer_assignment": assignment,
    }


def _peel_layers(
    pts_m: np.ndarray,
    shell_m: np.ndarray,
    holes_m: list[np.ndarray],
    on_pieces: list[np.ndarray],
    is_connected: bool,
) -> tuple[list[str], np.ndarray]:
    """The Voronoi-layer peel → (layer count strings, per-building
    1-based layer index). Shared by compute_k (counts only,
    batch_4:41-188) and compute_layers (per-parcel membership,
    batch_4:190-375)."""
    n = len(pts_m)
    assignment = np.zeros(n, dtype=np.int64)
    if n <= 1:
        assignment[:] = 1
        return [str(n)], assignment
    edges = delaunay_edges(pts_m)
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nn = _GridNN(pts_m)
    layers: list[str] = []
    seeds: set[int] = set()
    if is_connected and on_pieces:
        # the reference buffers on-network streets by 1 m before the
        # parcel-intersection test (batch_4:115) — a street running
        # along a Voronoi bisector seeds the cells on BOTH sides.
        # Exact cell enumeration along the piece and its ±1 m
        # perpendicular offsets (cells are convex → bisection is
        # exact, no sampling-step heuristics).
        for p in on_pieces:
            d = p[1] - p[0]
            ln = float(np.sqrt((d * d).sum()))
            nrm = np.array([-d[1], d[0]]) / ln if ln > 0 else np.zeros(2)
            for off in (0.0, 1.0, -1.0):
                seeds |= _cells_crossed_by_segment(
                    p[0] + off * nrm, p[1] + off * nrm, nn
                )
    if is_connected and not seeds:
        # reference records a 0-count first layer then falls back
        # to the boundary ring (batch_4:131-137,157-168)
        layers.append("0")
    if not seeds:
        for ring in [shell_m] + holes_m:
            closed = np.vstack([ring, ring[:1]])
            for i in range(len(closed) - 1):
                seeds |= _cells_crossed_by_segment(closed[i], closed[i + 1], nn)
    layers.append(str(len(seeds)))
    depth = len(layers)
    for i in seeds:
        assignment[i] = depth
    remaining = set(range(n)) - seeds
    frontier = seeds
    while remaining:
        nxt = {j for i in frontier for j in adj[i] if j in remaining}
        if not nxt:
            # severed adjacency fallback: boundary cells of the
            # remaining island (reference's shrink-ring detection,
            # batch_4:157-168)
            rem = np.array(sorted(remaining))
            hull = convex_hull_indices(pts_m[rem])
            nxt = {int(rem[h]) for h in hull}
        layers.append(str(len(nxt)))
        depth = len(layers)
        for i in nxt:
            assignment[i] = depth
        remaining -= nxt
        frontier = nxt
    return layers, assignment


LAYERS_SCHEMA = "block_id string, url string, layer int, k_complexity int"


def compute_layers_kernel(
    key, bldg_pdf: pd.DataFrame, street_pdf: pd.DataFrame
) -> pd.DataFrame:
    """Grouped-map UDTF-style kernel: one block group → one row per
    building with its concentric layer index (the reference's
    compute_layers rendering variant, batch_4:190-375 — here emitting
    parcel→layer membership instead of per-layer geometry)."""
    if len(bldg_pdf) == 0:
        return pd.DataFrame(columns=["block_id", "url", "layer", "k_complexity"])
    block_id = key[0]
    is_geom = bldg_pdf["lon"].isna()
    geom_rows = bldg_pdf.loc[is_geom]
    if len(geom_rows) == 0:
        return pd.DataFrame(columns=["block_id", "url", "layer", "k_complexity"])
    shell, holes = unpack_rings(
        geom_rows["ring_sizes"].iloc[0], geom_rows["coords"].iloc[0]
    )
    bldg = bldg_pdf.loc[~is_geom]
    if len(bldg) == 0:
        return pd.DataFrame(columns=["block_id", "url", "layer", "k_complexity"])
    pts = np.stack(
        [bldg["lon"].to_numpy(np.float64), bldg["lat"].to_numpy(np.float64)], axis=1
    )
    lines = [
        np.asarray(c, dtype=np.float64).reshape(-1, 2)
        for c in street_pdf.get("s_coords", pd.Series(dtype=object))
    ]
    row = compute_k_block(shell, holes, pts, lines)
    return pd.DataFrame(
        {
            "block_id": block_id,
            "url": bldg["url"].to_numpy(),
            "layer": row["layer_assignment"].astype(np.int32),
            "k_complexity": np.int32(row["k_complexity"]),
        }
    )


def compute_k_kernel(key, bldg_pdf: pd.DataFrame, street_pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map wrapper: one block group → one row."""
    if len(bldg_pdf) == 0:
        return pd.DataFrame(columns=K_COLUMNS)
    import os
    import time

    t0 = time.time()
    block_id = key[0]
    # geometry marker rows have null lon/lat; building rows null geom
    is_geom = bldg_pdf["lon"].isna()
    geom_rows = bldg_pdf.loc[is_geom]
    if len(geom_rows) == 0:
        return pd.DataFrame(columns=K_COLUMNS)
    sizes = geom_rows["ring_sizes"].iloc[0]
    coords = geom_rows["coords"].iloc[0]
    shell, holes = unpack_rings(sizes, coords)
    bldg_pdf = bldg_pdf.loc[~is_geom]
    pts = np.stack(
        [bldg_pdf["lon"].to_numpy(np.float64), bldg_pdf["lat"].to_numpy(np.float64)],
        axis=1,
    ) if len(bldg_pdf) else np.zeros((0, 2))
    lines = [
        np.asarray(c, dtype=np.float64).reshape(-1, 2)
        for c in street_pdf.get("s_coords", pd.Series(dtype=object))
    ]
    row = compute_k_block(shell, holes, pts, lines)
    row["block_id"] = block_id
    # per-partition kernel metrics (north rule: per-partition lineage +
    # metrics). Opt-in via env: one CSV per python worker.
    mdir = os.environ.get("KBLOCK_KERNEL_METRICS")
    if mdir:
        os.makedirs(mdir, exist_ok=True)
        with open(f"{mdir}/{os.getpid()}.csv", "a") as f:
            f.write(
                f"{block_id},{len(pts)},{len(lines)},"
                f"{int((time.time() - t0) * 1000)}\n"
            )
    return pd.DataFrame([row])[K_COLUMNS]
