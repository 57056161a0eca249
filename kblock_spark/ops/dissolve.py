"""Geometric dissolve (group-by + union), the reference's
``dissolve(by=...)`` (kblock/batch_1a_prepare_gadm.py:84,145,250;
batch_1c_regions_crosswalk.py:75-387; batch_3_model_population.py:441).

For **coverage polygons** (a planar partition — exactly what the block
layer is, and what the reference's coverage_union_all relies on,
batch_4:149) the union is exact edge cancellation: every edge shared
by two polygons of the group disappears, the survivors re-polygonize
into the dissolved boundary (outer shells + holes). No GEOS needed.

Runs as groupBy(key).applyInPandas — the custom geometry "UDAF".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo.geom import pack_rings, unpack_rings
from ..geo.polygonize import _key, polygonize

DISSOLVE_SCHEMA = (
    "key string, n_parts int, ring_sizes array<int>, coords array<double>"
)


def dissolve_rings(
    polys: list[tuple[np.ndarray, list[np.ndarray]]]
) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Exact union of a coverage polygon set via shared-edge
    cancellation + re-polygonization."""
    count: dict[tuple, int] = {}
    for shell, holes in polys:
        for ring in [shell] + list(holes):
            closed = np.vstack([ring, ring[:1]])
            for i in range(len(closed) - 1):
                a, b = _key(closed[i]), _key(closed[i + 1])
                if a == b:
                    continue
                k = (min(a, b), max(a, b))
                count[k] = count.get(k, 0) + 1
    survivors = [
        np.array([a, b]) for (a, b), c in count.items() if c % 2 == 1
    ]
    faces = polygonize(survivors)
    # drop traced faces not covered by any input polygon (e.g. the
    # open interior of a ring of polygons — it re-polygonizes as a CCW
    # face but is a hole, not part of the union)
    from ..geo.geom import points_in_polygon
    from ..geo.polygonize import representative_point_poly

    out = []
    for shell, holes in faces:
        rx, ry = representative_point_poly(shell, holes)
        px, py = np.array([rx]), np.array([ry])
        if any(
            points_in_polygon(px, py, s, h)[0] for s, h in polys
        ):
            out.append((shell, holes))
    return out


def dissolve_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
    polys = [
        unpack_rings(s, c) for s, c in zip(pdf["ring_sizes"], pdf["coords"])
    ]
    merged = dissolve_rings(polys)
    rows = []
    for shell, holes in merged:
        sizes, coords = pack_rings(shell, holes)
        rows.append(
            {
                "key": key[0],
                "n_parts": len(merged),
                "ring_sizes": sizes,
                "coords": coords,
            }
        )
    return pd.DataFrame(rows, columns=["key", "n_parts", "ring_sizes", "coords"])


def dissolve(df: DataFrame, key_col: str) -> DataFrame:
    """groupBy(key).union(geometry) over (ring_sizes, coords) rows."""
    from pyspark.sql import functions as F

    return (
        df.select(F.col(key_col).alias("key"), "ring_sizes", "coords")
        .groupBy("key")
        .applyInPandas(dissolve_kernel, DISSOLVE_SCHEMA)
    )
