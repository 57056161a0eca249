"""Spatial self-join: detect overlapping polygon delineations.

The reference runs ``dask_geopandas.sjoin(df, df, predicate=
"overlaps")`` to find blocks/admin polygons whose interiors overlap
(kblock/batch_1a_prepare_gadm.py:45-47, batch_1b_generate_blocks.py:
98-100), then reassigns the shared region to the largest-area claimant
(W1 rank pattern). Distributed shape here: explode polygons onto
covering tiles, tile self-equi-join (id_a < id_b), exact pairwise
refine in a vectorized UDF.

The refine tests interior overlap via (a) proper edge crossings,
(b) vertex-strictly-inside containment, (c) a bbox-intersection-center
probe for axis-aligned partial overlaps. Exact for crossings and
containment; the probe covers collinear-boundary overlaps of convex
parts (block layers are near-convex faces). A full Greiner–Hormann
clipper is the planned upgrade for clipped-geometry output (J6/J7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geo.geom import (
    EPS,
    points_in_polygon,
    points_to_segments_mindist,
    segment_intersection_params,
    unpack_rings,
)
from .spatial_join import polygons_with_cells


def _ring_edges(ring: np.ndarray):
    return ring, np.roll(ring, -1, axis=0)


def _strictly_inside(px, py, shell, holes, tol) -> np.ndarray:
    """PIP that excludes boundary points: inside AND farther than tol
    from every boundary edge (ray casting alone classifies exact
    boundary points arbitrarily)."""
    m = points_in_polygon(px, py, shell, holes)
    if not m.any():
        return m
    ea = np.vstack([shell] + list(holes or []))
    eb = np.vstack(
        [np.roll(shell, -1, axis=0)] + [np.roll(h, -1, axis=0) for h in holes or []]
    )
    d = points_to_segments_mindist(px, py, ea, eb)
    return m & (d > tol)


def polygons_overlap(shell_a, holes_a, shell_b, holes_b) -> bool:
    a1, a2 = _ring_edges(shell_a)
    b1, b2 = _ring_edges(shell_b)
    # (a) proper edge crossings
    for i in range(len(a1)):
        for j in range(len(b1)):
            pr = segment_intersection_params(a1[i], a2[i], b1[j], b2[j])
            if pr is None:
                continue
            t, u = pr
            if EPS < t < 1 - EPS and EPS < u < 1 - EPS:
                return True
    scale = max(
        shell_a[:, 0].max() - shell_a[:, 0].min(),
        shell_a[:, 1].max() - shell_a[:, 1].min(),
        shell_b[:, 0].max() - shell_b[:, 0].min(),
        shell_b[:, 1].max() - shell_b[:, 1].min(),
        1e-12,
    )
    tol = scale * 1e-9
    # (b) strict containment of some vertex
    if _strictly_inside(shell_a[:, 0], shell_a[:, 1], shell_b, holes_b, tol).any():
        return True
    if _strictly_inside(shell_b[:, 0], shell_b[:, 1], shell_a, holes_a, tol).any():
        return True
    # (c) bbox-intersection center probe (axis-aligned partial overlap)
    x0 = max(shell_a[:, 0].min(), shell_b[:, 0].min())
    x1 = min(shell_a[:, 0].max(), shell_b[:, 0].max())
    y0 = max(shell_a[:, 1].min(), shell_b[:, 1].min())
    y1 = min(shell_a[:, 1].max(), shell_b[:, 1].max())
    if x0 < x1 and y0 < y1:
        cx = np.array([(x0 + x1) / 2.0])
        cy = np.array([(y0 + y1) / 2.0])
        if (
            _strictly_inside(cx, cy, shell_a, holes_a, tol)[0]
            and _strictly_inside(cx, cy, shell_b, holes_b, tol)[0]
        ):
            return True
    return False


def detect_overlaps(polys: DataFrame, key_col: str = "poly_id") -> DataFrame:
    """→ (key_a, key_b) pairs of polygons with interior overlap."""
    pc = polygons_with_cells(polys.select(key_col, "ring_sizes", "coords"))
    a = pc.select(
        F.col(key_col).alias("key_a"),
        F.col("cell"),
        F.col("ring_sizes").alias("rs_a"),
        F.col("coords").alias("c_a"),
    )
    b = pc.select(
        F.col(key_col).alias("key_b"),
        F.col("cell"),
        F.col("ring_sizes").alias("rs_b"),
        F.col("coords").alias("c_b"),
    )
    cand = (
        a.join(b, ["cell"], "inner")
        .where(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )

    def refine(batches):
        for pdf in batches:
            keep = []
            for i in range(len(pdf)):
                sa, ha = unpack_rings(pdf["rs_a"].iloc[i], pdf["c_a"].iloc[i])
                sb, hb = unpack_rings(pdf["rs_b"].iloc[i], pdf["c_b"].iloc[i])
                keep.append(polygons_overlap(sa, ha, sb, hb))
            out = pdf.loc[keep, ["key_a", "key_b"]]
            if len(out):
                yield out

    return cand.mapInPandas(refine, schema="key_a string, key_b string")
