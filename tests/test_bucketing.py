"""Bucketed co-located joins: pre-bucketing both sides by the join key
removes the shuffle entirely — the 100 TB lever for repeated
block_id-keyed joins (blocks ⋈ buildings ⋈ complexity ⋈ population;
the reference re-reads per-country files instead,
kblock/batch_5_combine_data.py:253-259)."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — use the session default and a
    # throwaway database
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    a = spark.range(0, 10_000).select(
        F.col("id").alias("block_id"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("block_id"), (F.col("id") % 11).alias("w")
    )
    (
        a.write.mode("overwrite").format("parquet")
        .bucketBy(8, "block_id").sortBy("block_id")
        .saveAsTable("bktest.blocks_b")
    )
    (
        b.write.mode("overwrite").format("parquet")
        .bucketBy(8, "block_id").sortBy("block_id")
        .saveAsTable("bktest.bldg_b")
    )
    ta = spark.table("bktest.blocks_b")
    tb = spark.table("bktest.bldg_b")
    # at toy sizes the planner prefers broadcast; force the sort-merge
    # path to show the bucketed scan satisfies the join distribution
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "block_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should be shuffle-free"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert joined.count() == 10_000
    # equivalence with the shuffled plan
    plain = a.join(b, "block_id")
    assert joined.agg(F.sum("v"), F.sum("w")).collect() == plain.agg(
        F.sum("v"), F.sum("w")
    ).collect()
    spark.sql("DROP TABLE bktest.blocks_b")
    spark.sql("DROP TABLE bktest.bldg_b")
