"""kblock_table streaming source (Spark 4 Python DataSource API over
the snapshot table): snapshot-id offsets, added-files-only batches,
restart-safe incremental consumption, rewrite rejection."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.io.table_source import register_table_source
from kblock_spark.io.tableformat import (
    append_snapshot,
    compact_data_files,
    delete_where_mor,
    merge_into_mor,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("v")
    )


def _drain(spark, t, out, ck):
    q = (
        spark.readStream.format("kblock_table").option("path", t).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_incremental_stream_with_restart(spark, tmp_path):
    register_table_source(spark)
    t, out, ck = (str(tmp_path / p) for p in ("tbl", "out", "ck"))
    append_snapshot(_df(spark, 0, 100), t)
    append_snapshot(_df(spark, 100, 150), t)
    delete_where_mor(spark, t, "doc_id < 10")  # adds nothing: skipped
    merge_into_mor(spark, t, _df(spark, 140, 160), "doc_id")
    got = _drain(spark, t, out, ck)
    # appends + the upsert batch (CDC delta), NOT final table state
    assert got.count() == 100 + 50 + 20
    # restart: only the new append arrives
    append_snapshot(_df(spark, 500, 520), t)
    got2 = _drain(spark, t, out, ck)
    assert got2.count() == 170 + 20
    assert got2.where("doc_id >= 500").count() == 20


def test_stream_rejects_rewritten_history(spark, tmp_path):
    register_table_source(spark)
    t, out, ck = (str(tmp_path / p) for p in ("tbl", "out", "ck"))
    append_snapshot(_df(spark, 0, 50), t)
    compact_data_files(spark, t, target_files=1)  # replace snapshot
    with pytest.raises(Exception, match="rewritten|replace"):
        _drain(spark, t, out, ck)


def test_stream_from_snapshot_option(spark, tmp_path):
    """from_snapshot=N starts the cursor past history — the backfill
    vs tail control (Kafka's startingOffsets analogue): a consumer
    attaching to a long-lived table skips the bulk-loaded past and
    streams only commits AFTER the named snapshot."""
    register_table_source(spark)
    t, out, ck = (str(tmp_path / p) for p in ("tbl", "out", "ck"))
    append_snapshot(_df(spark, 0, 100), t)      # sid 1: history
    s2 = append_snapshot(_df(spark, 100, 130), t)  # sid 2: history
    append_snapshot(_df(spark, 500, 520), t)    # sid 3: the tail
    q = (
        spark.readStream.format("kblock_table")
        .option("path", t).option("from_snapshot", s2).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 20            # only sid 3's rows
    assert got.agg(F.min("doc_id")).first()[0] == 500
    # the option only seeds a FRESH cursor: after the checkpoint
    # exists, new commits stream normally from the stored offset
    append_snapshot(_df(spark, 900, 910), t)
    q2 = (
        spark.readStream.format("kblock_table")
        .option("path", t).option("from_snapshot", s2).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    got2 = spark.read.parquet(out)
    assert got2.count() == 30
    assert got2.where("doc_id >= 900").count() == 10
