"""run_full_build: the whole reference job sequence (1b→2→4→3→5) as
one resumable Spark build producing the reference's output layers."""

from pyspark.sql import functions as F

from kblock_spark.pipeline import run_full_build


def test_full_build_outputs(spark, tmp_path):
    out = str(tmp_path / "country")
    paths = run_full_build(spark, out, n_pages=1200, nx=2, ny=2, grid=2)

    blocks = spark.read.parquet(paths["blocks"])
    combined = spark.read.parquet(paths["combined"])
    rollup = spark.read.parquet(paths["rollup"])
    assert blocks.count() == 28  # 2x2 city golden block count
    assert combined.count() == 28
    assert rollup.count() == 4  # one row per admin unit
    # combined carries the reference's derived metrics
    for col in ("k_complexity", "allocated_population", "k_bucket",
                "population_density", "block_area_km2"):
        assert col in combined.columns, col
    # rollup pivot partitions population (conservation through the
    # whole build)
    pivot_cols = [c for c in rollup.columns if c.startswith("pop_k_")]
    s = rollup.select(
        sum(F.col(c) for c in pivot_cols).alias("pivot"), "population"
    ).collect()
    for r in s:
        assert abs(r["pivot"] - r["population"]) < 1e-6
    # resumability: a second invocation reprocesses nothing
    from kblock_spark.io.manifest import CheckpointManifest, checkpointed_run

    man = CheckpointManifest(spark, f"{out}/manifest")
    blocks2 = spark.read.parquet(paths["blocks"])
    assert blocks2.count() == 28  # per-key overwrite kept it exact
    pending = man.pending(
        blocks2.select(F.col("part_key")).distinct().withColumnRenamed(
            "part_key", "part_key"
        ),
        "part_key",
    )
    assert pending.count() == 0
