"""Interval-containment join: each left POINT row pairs with every
right INTERVAL row whose ``[lo, hi]`` contains it.

The second classic event-pipeline join Spark lacks as a builtin
(next to the as-of join, ops/asof.py; the reference is
batch-geospatial and has no analogue — this belongs to the engine's
beyond-reference event/training-data surface). Expressed naively
(``ON p BETWEEN lo AND hi``) there is no equi-key, so Spark plans a
BroadcastNestedLoopJoin — O(|points| · |intervals|) comparisons the
moment the interval side outgrows a broadcast, a scale-killer at
100 TB.

Spark-first formulation — the TILE equi-join (the 1-D analogue of
the PIP join's spatial tiling, ops/spatial_join.py):

  each interval explodes to the tiles its span covers
  (``sequence(lo DIV T, hi DIV T)``), each point maps to exactly ONE
  tile, and the join becomes a hash equi-join on the tile id with a
  residual ``BETWEEN`` filter. A qualifying pair is emitted exactly
  once — the point's single tile is covered once by the interval's
  tile span — so no dedup pass is needed (dedup would force a
  second shuffle).

Cost: one shuffle on the tile key (or none on the interval side if
it broadcasts) + interval replication of ``span/T + 1``. Pick ``T``
near the typical interval span: replication stays O(1) per interval
while each tile's candidate set stays local. Skewed tiles (a hot
hour) split further via AQE skew-join, which works here precisely
BECAUSE the plan is a plain hash equi-join.

Floor division uses ``(x - pmod(x, T)) DIV T`` — exact floor for
negative coordinates too (SQL ``DIV`` alone truncates toward zero,
which would split tile -0.5 across two ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def _floor_div(col: str, tile: int):
    c = F.col(col)
    t = F.lit(int(tile))
    return ((c - F.pmod(c, t)) / t).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    tile: int,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of ``points`` with ``intervals`` on containment
    ``lo_col <= point_col <= hi_col`` (integer columns; inclusive on
    both ends, matching SQL ``BETWEEN``).

    ``tile`` is the tiling width in the columns' units.
    ``broadcast_intervals`` hints the exploded interval side for
    small dimension tables (the planner's own threshold applies
    otherwise). Column names must be disjoint apart from the join
    being on the internal tile key (pass pre-selected frames).
    Intervals with ``hi < lo`` match nothing and are dropped at the
    explode. NULL endpoints or points never match (SQL semantics).
    """
    if tile <= 0:
        raise ValueError(f"tile must be positive, got {tile}")
    # hi < lo must be filtered BEFORE sequence(): Spark's sequence
    # auto-reverses (sequence(5, 2) = [5,4,3,2]) instead of yielding
    # an empty array, which would resurrect the empty interval
    iv = intervals.where(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(hi_col) >= F.col(lo_col))
    ).withColumn(
        "__tile",
        F.explode(
            F.sequence(
                _floor_div(lo_col, tile), _floor_div(hi_col, tile)
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.where(F.col(point_col).isNotNull()).withColumn(
        "__tile", _floor_div(point_col, tile)
    )
    return (
        pt.join(iv, "__tile")
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__tile")
    )
