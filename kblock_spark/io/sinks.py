"""Output sinks (SURVEY §2 S8/S10).

The reference writes GeoPackage/CSV/parquet per country
(kblock/batch_1b_generate_blocks.py:390,407; batch_3:556;
batch_5:486,516; batch_1c:358). Spark-native equivalents: parquet is
the primary interchange format (geometry as packed ring arrays); CSV
is provided for the reference's tabular exports, with geometry
columns serialized to WKT-ish text since CSV cannot carry arrays.
GPKG needs OGR (not in this container) — out of scope per SURVEY
§2.1."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _flatten_for_csv(df: DataFrame) -> DataFrame:
    """CSV can't hold array columns: packed rings become a WKT-like
    'x y, x y, …|x y, …' text (rings |-separated), other arrays become
    ';'-joined strings."""
    out = df
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if "ring_sizes" in fields and "coords" in fields:
        # slice coords per ring using ring_sizes offsets (pure Catalyst)
        ring_txt = F.expr(
            """
            array_join(
              transform(ring_sizes, (n, r) ->
                array_join(
                  transform(
                    sequence(1, n),
                    v -> concat(
                      cast(element_at(coords,
                        (aggregate(slice(ring_sizes, 1, r), 0, (a, x) -> a + x)
                         + v - 1) * 2 + 1) as string),
                      ' ',
                      cast(element_at(coords,
                        (aggregate(slice(ring_sizes, 1, r), 0, (a, x) -> a + x)
                         + v - 1) * 2 + 2) as string)
                    )
                  ), ', ')
              ), '|')
            """
        )
        out = out.withColumn("geometry_txt", ring_txt).drop("ring_sizes", "coords")
        fields = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    for name, typ in fields.items():
        if typ.startswith("array"):
            out = out.withColumn(
                name, F.array_join(F.col(name).cast("array<string>"), ";")
            )
    return out


def write_csv(df: DataFrame, path: str, partition_cols: list[str] | None = None):
    """S10: header CSV export (batch_3:556 to_csv equivalent)."""
    w = _flatten_for_csv(df).write.mode("overwrite").option("header", "true")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
):
    """S8: parquet sink, hive-partitioned by e.g. country/gadm so
    downstream reads get partition pruning (the reference's
    per-country directory layout, batch_5:253-259)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_spatial_parquet(
    df: DataFrame,
    path: str,
    geohash_col: str = "block_geohash",
    n_files: int | None = None,
):
    """Spatial-locality parquet layout: range-partition by geohash and
    sort within partitions, so each output file covers one contiguous
    geohash range and parquet min/max column stats prune bbox/prefix
    queries to the files that actually intersect — the Z-order-lite
    that makes a 100 TB block table scannable by region. (The
    reference gets locality for free from one-file-per-country;
    this is the single-table equivalent.)"""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, geohash_col)
        .sortWithinPartitions(geohash_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, path: str, out_path: str, target_file_mb: int = 256
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ~target_file_mb files (the maintenance job any long-running
    ingest needs — thousands of tiny stream/checkpoint outputs
    destroy scan throughput at scale). Returns the file count
    written.

    Sizing walks the dataset through the Hadoop FileSystem API, so
    it resolves the same way Spark reads the path (local, HDFS or
    object store) instead of silently seeing 0 bytes off-driver."""
    import math

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(p, True)  # recursive
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(out_path)
    return n
