"""Hierarchical quadtree tile index: the engine's analogue of the H3
cell hierarchy (``latlng_to_cell`` at a resolution, ``cell_to_parent``,
``polygon_to_cells`` / polyfill, ``compact_cells``).

The reference chunks geometry work by geohash prefix
(kblock/batch_2_prepare_buildings.py:216-220) — a flat, string-typed
tiling. The north rule instead asks for H3-level-9 tile assignments
over web-scale point sets, which needs a *hierarchy*: coarse tiles for
planning/skew detection, fine tiles for the joins, and exact
parent/child arithmetic between them. The h3 library is not in this
container, so the hierarchy is a quadtree over an affine
``[origin, origin+extent)`` domain: level ``L`` splits each axis into
``2**L`` cells and the parent of ``(ix, iy)`` at ``L`` is
``(ix >> 1, iy >> 1)`` at ``L-1`` — pure int64 arithmetic that
Catalyst, numpy and any SQL engine evaluate identically.

Scale notes (100 TB):
- ``multires_rollup`` aggregates at the finest level FIRST (one
  shuffle with map-side partial aggregation crushes the point set to
  |occupied cells| rows), then derives every coarser level from that
  compacted table — the second shuffle moves only per-cell partials,
  never points.
- ``compact_cells`` runs one tiny hash-aggregate + broadcast anti-join
  per level step over the (already aggregated) cell set.
- ``polyfill`` distributes one polygon per task row via Arrow-batched
  ``mapInPandas`` and enumerates candidate cells in bounded y-stripes,
  so a continent-sized polygon at a fine level streams cells instead
  of materializing a giant meshgrid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "with_quad_cell",
    "multires_rollup",
    "compact_cells",
    "uncompact_cells",
    "polyfill",
    "salt_plan",
    "salted_by_plan",
]


def _axis_ix(col: F.Column, origin: float, extent: float, level: int) -> F.Column:
    """floor((x - origin) / extent * 2**level) as bigint.

    With ``origin``/``extent`` defaulted to the unit square and inputs
    that are dyadic rationals (k / 2**s), every step is exact in IEEE
    doubles, so the result equals the pure-integer ``k >> (s - level)``
    — the property the hard oracles rely on.
    """
    return F.floor(
        (col - F.lit(float(origin))) / F.lit(float(extent)) * F.lit(float(1 << level))
    ).cast("bigint")


def with_quad_cell(
    df: DataFrame,
    level: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    origin: tuple[float, float] = (0.0, 0.0),
    extent: tuple[float, float] = (1.0, 1.0),
    ix_col: str = "ix",
    iy_col: str = "iy",
) -> DataFrame:
    """Add quadtree cell coordinates at ``level`` (h3.latlng_to_cell).

    Pure Catalyst (two floor expressions) — stays inside whole-stage
    codegen; no shuffle, no Python.
    """
    return df.withColumn(
        ix_col, _axis_ix(F.col(lon_col), origin[0], extent[0], level)
    ).withColumn(iy_col, _axis_ix(F.col(lat_col), origin[1], extent[1], level))


def multires_rollup(
    points: DataFrame,
    levels: list[int],
    weight_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    origin: tuple[float, float] = (0.0, 0.0),
    extent: tuple[float, float] = (1.0, 1.0),
) -> DataFrame:
    """Per-cell counts (and optional weight sums) at several levels in
    one pass → DataFrame(level, ix, iy, n_points[, sum_w]).

    ``weight_col`` must be integral — sums are carried as BIGINT so
    the rollup is bit-stable under any partitioning (a float weight
    would be truncated; pre-quantize fractional weights to integer
    units first, the same discipline as the oracle queries).

    Strategy: aggregate once at ``max(levels)`` (the only shuffle that
    touches the point set; map-side combine reduces it to the occupied
    cell count), then derive every coarser level by integer-dividing
    the *aggregated* table's cell coords and re-aggregating the
    partials — the classic hierarchical-rollup shape that survives a
    100x scale-up because stage 2's input is |cells|, not |points|.
    """
    finest = max(levels)
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("sum_w"))
    base = (
        with_quad_cell(points, finest, lon_col, lat_col, origin, extent)
        .groupBy("ix", "iy")
        .agg(*aggs)
    )
    out_cols = ["n_points"] + (["sum_w"] if weight_col is not None else [])
    # one struct per requested level, exploded — NOT a union of
    # re-selects of `base`: Catalyst does not reuse a repeated
    # subplan, so a 3-way union re-scans and re-shuffles the point
    # set 3x, while explode keeps a single point-level shuffle and
    # fans out only the aggregated cell rows (verified via
    # .explain("formatted"): exactly two Exchanges, the second over
    # |levels| * |occupied cells| rows).
    lvl_structs = F.array(
        *[
            F.struct(
                F.lit(lv).cast("int").alias("level"),
                F.expr(f"ix DIV {1 << (finest - lv)}").alias("ix"),
                F.expr(f"iy DIV {1 << (finest - lv)}").alias("iy"),
            )
            for lv in sorted(levels, reverse=True)
        ]
    )
    stacked = base.select(
        F.explode(lvl_structs).alias("c"), *[F.col(c) for c in out_cols]
    ).select("c.level", "c.ix", "c.iy", *out_cols)
    return stacked.groupBy("level", "ix", "iy").agg(
        F.sum("n_points").cast("bigint").alias("n_points"),
        *(
            [F.sum("sum_w").cast("bigint").alias("sum_w")]
            if weight_col is not None
            else []
        ),
    )


def compact_cells(cells: DataFrame, level: int, min_level: int) -> DataFrame:
    """h3.compact_cells: replace every complete 2x2 sibling group with
    its parent, recursively, down to ``min_level`` →
    DataFrame(level, ix, iy) covering exactly the input cell set.

    ``cells`` must be DISTINCT (ix, iy) at ``level`` (e.g. the output
    of :func:`multires_rollup` filtered to one level). Each level step
    is a hash aggregate over the current cell set plus a broadcast
    anti-join (the promoted-parent set is tiny by construction), so
    the whole compaction is |cells| * O(levels) work with no wide
    shuffle after the first aggregation that produced the cells.
    """
    if min_level > level:
        raise ValueError("min_level must be <= level")
    # each level's cell set feeds THREE consumers (the sibling count,
    # the anti-join probe, and — transitively — every deeper union
    # branch); without lineage truncation Catalyst re-derives the
    # whole upstream chain per union branch, re-running the expensive
    # point-level aggregation once per level. A deferred
    # localCheckpoint materializes each (tiny) cell set once.
    cur = cells.select("ix", "iy").localCheckpoint(eager=False)
    parts: list[DataFrame] = []
    for lv in range(level, min_level, -1):
        parent = [
            F.expr("ix DIV 2").alias("px"),
            F.expr("iy DIV 2").alias("py"),
        ]
        done = (
            cur.groupBy(*parent)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == 4)
            .select("px", "py")
            .localCheckpoint(eager=False)
        )
        kept = cur.join(
            F.broadcast(done),
            (F.expr("ix DIV 2") == F.col("px")) & (F.expr("iy DIV 2") == F.col("py")),
            "left_anti",
        )
        parts.append(
            kept.select(F.lit(lv).cast("int").alias("level"), "ix", "iy")
        )
        cur = done.select(F.col("px").alias("ix"), F.col("py").alias("iy"))
    parts.append(
        cur.select(F.lit(min_level).cast("int").alias("level"), "ix", "iy")
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def uncompact_cells(cells: DataFrame, target_level: int) -> DataFrame:
    """h3.uncompact_cells: expand a mixed-level cell cover (columns
    level, ix, iy) back to uniform ``target_level`` →
    DataFrame(level, ix, iy). Inverse of :func:`compact_cells`:
    ``uncompact(compact(S), L) == S`` for any level-L cell set S.

    Pure Catalyst — two ``explode(sequence(...))`` fans per row (one
    per axis), no shuffle at all. Fan-out is 4^(target-level) rows per
    input cell, which is the op's *semantics* (data expansion), so the
    level gap is guarded to keep a single input row from generating
    an unbounded task.
    """
    levels = [r[0] for r in cells.select("level").distinct().collect()]
    if any(lv > target_level for lv in levels):
        raise ValueError("target_level must be >= every input level")
    if any(target_level - lv > 12 for lv in levels):
        raise ValueError(
            "refusing a >12-level uncompact (4^13+ rows per input cell); "
            "uncompact in stages instead"
        )
    f = F.expr(f"shiftleft(1L, {target_level} - level)")
    return (
        cells.select("level", "ix", "iy", f.alias("f"))
        .select(
            F.lit(target_level).cast("int").alias("level"),
            F.explode(
                F.expr("sequence(ix * f, ix * f + f - 1)")
            ).alias("ix"),
            "iy",
            "f",
        )
        .select(
            "level",
            "ix",
            F.explode(
                F.expr("sequence(iy * f, iy * f + f - 1)")
            ).alias("iy"),
        )
    )


def salt_plan(
    rollup: DataFrame, target_per_salt: int, max_salt: int = 64
) -> DataFrame:
    """Measured-load salt factors per cell → DataFrame(ix, iy, salt).

    ``rollup`` is one level of :func:`multires_rollup` (ix, iy,
    n_points). A cell that measured ``n`` points gets
    ``ceil(n / target_per_salt)`` salt buckets (capped): the hot-cell
    mitigation the north rule asks for ('salted-key skew mitigation
    handles dense urban cells'), derived from data instead of a global
    constant — a uniform salt of k multiplies EVERY build-side row k
    times, while a per-cell plan only replicates where the probe side
    is actually dense. Integer arithmetic only (ceil-div via
    (n + t - 1) DIV t), so the plan is exactly reproducible in SQL.
    """
    t = int(target_per_salt)
    return rollup.select(
        "ix",
        "iy",
        F.least(
            F.lit(int(max_salt)),
            F.expr(f"(n_points + {t - 1}) DIV {t}"),
        )
        .cast("int")
        .alias("salt"),
    )


def salted_by_plan(
    points: DataFrame,
    plan: DataFrame,
    row_hash: F.Column,
) -> DataFrame:
    """Attach a plan-driven salt bucket to each point: join the (tiny,
    broadcast) salt plan on the cell and bucket rows by
    ``row_hash % salt``. Downstream joins/aggregations key on
    (ix, iy, salt_bucket) so a hot cell's rows spread over ``salt``
    reducers; cells absent from the plan default to one bucket.
    """
    return points.join(F.broadcast(plan), ["ix", "iy"], "left").withColumn(
        "salt_bucket",
        F.pmod(row_hash, F.coalesce(F.col("salt"), F.lit(1))).cast("int"),
    )


def polyfill(
    polys: DataFrame,
    level: int,
    id_col: str = "poly_id",
    origin: tuple[float, float] = (0.0, 0.0),
    extent: tuple[float, float] = (1.0, 1.0),
    stripe_cells: int = 262_144,
) -> DataFrame:
    """h3.polygon_to_cells: cells whose CENTER lies inside the polygon
    → DataFrame(id_col, level, ix, iy).

    Input rows carry ``(id_col, ring_sizes, coords)`` in the engine's
    packed-ring representation (geo/geom.py pack_rings; first ring is
    the shell, the rest are holes). Center-containment is H3's
    polyfill semantics and makes the op a partition of space: every
    cell belongs to at most one non-overlapping polygon.

    Distribution: one polygon per row via Arrow-batched mapInPandas;
    candidate cells are enumerated from the polygon bbox in y-stripes
    of at most ``stripe_cells`` cells, so memory stays bounded for
    polygons that span millions of cells at a fine level. The
    membership test is the generic even-odd ray cast
    (geo/geom.points_in_polygon) — the same kernel the PIP hot join
    uses, fuzz-verified against closed forms in
    tests/test_property_geom.py.
    """
    from ..geo.geom import bbox, points_in_polygon, unpack_rings

    ox, oy = float(origin[0]), float(origin[1])
    ex, ey = float(extent[0]), float(extent[1])
    ndiv = 1 << level
    cw, ch = ex / ndiv, ey / ndiv
    schema = f"{id_col} bigint, level int, ix bigint, iy bigint"

    def gen(batches):
        for pdf in batches:
            out_pid, out_ix, out_iy = [], [], []
            for pid, sizes, cs in zip(
                pdf[id_col], pdf["ring_sizes"], pdf["coords"]
            ):
                shell, holes = unpack_rings(sizes, cs)
                if len(shell) < 3:
                    continue
                x0, y0, x1, y1 = bbox(shell)
                ix0 = max(0, int(np.floor((x0 - ox) / ex * ndiv)))
                ix1 = min(ndiv - 1, int(np.floor((x1 - ox) / ex * ndiv)))
                iy0 = max(0, int(np.floor((y0 - oy) / ey * ndiv)))
                iy1 = min(ndiv - 1, int(np.floor((y1 - oy) / ey * ndiv)))
                if ix1 < ix0 or iy1 < iy0:
                    continue
                # chunk BOTH axes so one meshgrid never exceeds
                # ~stripe_cells cells even when a single x-row of the
                # bbox is wider than the budget (continent-sized
                # polygon at a fine level)
                xstep = min(ix1 - ix0 + 1, max(1, stripe_cells))
                for xs in range(ix0, ix1 + 1, xstep):
                    xe = min(xs + xstep - 1, ix1)
                    ixs = np.arange(xs, xe + 1, dtype=np.int64)
                    cx = ox + (ixs.astype(np.float64) + 0.5) * cw
                    ystep = max(1, stripe_cells // len(ixs))
                    for ys in range(iy0, iy1 + 1, ystep):
                        ye = min(ys + ystep - 1, iy1)
                        iys = np.arange(ys, ye + 1, dtype=np.int64)
                        cy = oy + (iys.astype(np.float64) + 0.5) * ch
                        gx, gy = np.meshgrid(ixs, iys)
                        px, py = np.meshgrid(cx, cy)
                        mask = points_in_polygon(
                            px.reshape(-1), py.reshape(-1), shell, holes
                        )
                        if mask.any():
                            out_pid.append(
                                np.full(
                                    int(mask.sum()), int(pid), dtype=np.int64
                                )
                            )
                            out_ix.append(gx.reshape(-1)[mask])
                            out_iy.append(gy.reshape(-1)[mask])
            if out_pid:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(out_pid),
                        "level": np.int32(level),
                        "ix": np.concatenate(out_ix),
                        "iy": np.concatenate(out_iy),
                    }
                )

    return polys.mapInPandas(gen, schema)
