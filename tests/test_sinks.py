"""S8/S10 sinks: CSV with geometry flattening, partitioned parquet."""

from pyspark.sql import functions as F

from kblock_spark.io.sinks import write_csv, write_parquet


def test_csv_sink_flattens_geometry(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("b1", "AAA.1.1_1", [4, 3], [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0,
                                          0.2, 0.2, 0.4, 0.2, 0.3, 0.4], [1, 2, 3]),
        ],
        "block_id string, gadm_code string, ring_sizes array<int>, "
        "coords array<double>, tags array<int>",
    )
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = spark.read.option("header", "true").csv(out).collect()[0]
    assert back["block_id"] == "b1"
    # two |-separated rings, 4 and 3 vertices
    rings = back["geometry_txt"].split("|")
    assert len(rings) == 2
    assert len(rings[0].split(",")) == 4
    assert len(rings[1].split(",")) == 3
    assert rings[1].split(",")[0].strip() == "0.2 0.2"
    assert back["tags"] == "1;2;3"


def test_parquet_sink_partition_pruning(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("country")
    )
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_cols=["country"])
    back = spark.read.parquet(out).where(F.col("country") == "2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 25
    # partition pruning reached the scan
    assert "PartitionFilters: [isnotnull(country" in plan or "country" in plan.split("PartitionFilters")[-1]
