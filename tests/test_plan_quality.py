"""Physical-plan assertions: the declarative plans must actually get
the Catalyst treatment the architecture relies on — filter/column
pushdown into the parquet scan, broadcast joins for small dims,
whole-stage codegen on relational paths (no Python UDFs there)."""

import pytest

from kblock_spark.queries import (
    q01_pricing_summary,
    q04_revenue_by_nation,
    q05_customers_without_orders,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_pruning(spark):
    df = q01_pricing_summary(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan
    # column pruning: html-free narrow read — shipdate/flags/measures only
    assert "l_extendedprice" in plan and "l_orderkey" not in plan.split("ReadSchema")[-1]


def test_q04_broadcasts_dims(spark):
    plan = _plan(q04_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    # (whole-stage-codegen markers only appear in the final AQE plan
    # after materialization; broadcast strategy is the assertion here)


def test_q05_anti_join_strategy(spark):
    plan = _plan(q05_customers_without_orders(spark, SF))
    assert "LeftAnti" in plan


def test_pip_join_broadcasts_polygons(spark):
    from kblock_spark.io.synth import synth_admin, synth_streets, synth_pages_spark
    from kblock_spark.kernels.blocks import delineate_blocks
    from kblock_spark.kernels.extract import geocoded_points
    from kblock_spark.ops.spatial_join import assign_points_to_polygons

    admin = spark.createDataFrame(synth_admin(2, 2))
    streets = spark.createDataFrame(synth_streets(2, 2, 2))
    blocks = delineate_blocks(admin, streets)
    pts = geocoded_points(synth_pages_spark(spark, 200))
    joined = assign_points_to_polygons(pts, blocks, ["url", "lon", "lat"])
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan  # polygon side broadcast
