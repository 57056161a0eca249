"""Tiled interval-containment join (ops/interval_join.py): parity
with the naive BETWEEN join, exactly-once pair emission, negative
coordinates (floor-div tiling), empty/NULL intervals, and the plan
shape (hash equi-join, no nested loop)."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.interval_join import interval_join


def _pairs(df):
    return {(r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()}


def _naive(points, intervals):
    return {
        (p, i)
        for (p, x) in points
        for (i, lo, hi) in intervals
        if lo <= x <= hi
    }


@pytest.mark.parametrize("tile", [1, 3, 7, 100])
def test_parity_with_naive_between(spark, tile):
    pts = [(p, x) for p, x in enumerate(range(-25, 25, 3))]
    ivs = [
        (0, -30, -20),   # fully negative
        (1, -5, 5),      # spans zero
        (2, 4, 4),       # degenerate single point
        (3, 10, 9),      # empty (hi < lo) — must match nothing
        (4, 0, 100),     # wide
        (5, 7, 23),
    ]
    p = spark.createDataFrame(pts, "pid long, x long")
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    out = interval_join(p, iv, "x", "lo", "hi", tile=tile)
    assert _pairs(out) == _naive(pts, ivs)
    # exactly-once: no duplicate (point, interval) rows at any tile
    assert out.count() == len(_naive(pts, ivs))


def test_null_endpoints_and_points_never_match(spark):
    p = spark.createDataFrame([(1, 5), (2, None)], "pid long, x long")
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, None, 10), (3, 0, None)], "iid long, lo long, hi long"
    )
    out = interval_join(p, iv, "x", "lo", "hi", tile=4)
    assert _pairs(out) == {(1, 1)}


def test_invalid_tile_raises(spark):
    p = spark.createDataFrame([(1, 5)], "pid long, x long")
    with pytest.raises(ValueError, match="tile"):
        interval_join(p, p, "x", "x", "x", tile=0)


def test_plan_is_hash_equi_join(spark):
    """The point of the tiling: the physical plan must be a hash
    equi-join on the tile key, never BroadcastNestedLoopJoin."""
    p = spark.range(1000).select(F.col("id").alias("pid"),
                                 (F.col("id") * 13 % 997).alias("x"))
    iv = spark.range(50).select(
        F.col("iid_src.id").alias("iid") if False else F.col("id").alias("iid"),
        (F.col("id") * 20).alias("lo"),
        (F.col("id") * 20 + 30).alias("hi"),
    )
    out = interval_join(p, iv, "x", "lo", "hi", tile=16,
                        broadcast_intervals=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
