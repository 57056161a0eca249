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


def test_write_spatial_parquet_files_are_prunable(spark, tmp_path):
    """Each output file must cover a DISJOINT geohash range (sorted
    range partitioning) — the property parquet min/max stats need to
    prune a bbox query to the intersecting files."""
    import glob

    from kblock_spark.io.sinks import write_spatial_parquet

    df = spark.range(0, 4000).selectExpr(
        "id", "concat('gh', lpad(cast(id % 997 as string), 4, '0')) as block_geohash"
    )
    out = str(tmp_path / "spatial")
    write_spatial_parquet(df, out, n_files=8)
    ranges = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            {"block_geohash": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg(
            {"block_geohash": "max"}
        ).collect()[0][0]
        ranges.append(pdf)
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, ordered ranges
    # round trip
    back = spark.read.parquet(out)
    assert back.count() == 4000


def test_compact_parquet(spark, tmp_path):
    from kblock_spark.io.sinks import compact_parquet

    src = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    out = str(tmp_path / "compact")
    n = compact_parquet(spark, src, out, target_file_mb=256)
    assert n == 1
    import glob

    assert len(glob.glob(f"{out}/part-*.parquet")) == 1
    assert spark.read.parquet(out).count() == 10_000
