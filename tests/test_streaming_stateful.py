"""applyInPandasWithState: running per-user profiles across
micro-batches must converge to the batch aggregate, and state must
survive a checkpoint resume."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kblock_spark.streaming.stateful import running_user_profiles

SCHEMA = "user_id long, ts timestamp, value double"


def _events_pdf(start, n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, n),
            "ts": pd.to_datetime("2025-01-01") + pd.to_timedelta(
                np.arange(start, start + n), unit="s"
            ),
            "value": np.round(rng.uniform(0, 10, n), 2),
        }
    )


def _drain(spark, src, out_rows, ck):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    prof = running_user_profiles(stream)

    def sink(batch_df, batch_id):
        out_rows.extend(batch_df.collect())

    q = (
        prof.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_profiles_converge_and_resume(spark, tmp_path):
    src = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    d1 = _events_pdf(0, 500, 1)
    spark.createDataFrame(d1).write.mode("overwrite").parquet(src)
    rows: list = []
    _drain(spark, src, rows, ck)
    latest = {r["user_id"]: r for r in rows}  # last emit per user wins

    batch1 = d1.groupby("user_id").agg(
        n=("value", "size"), total=("value", "sum"), last=("ts", "max")
    )
    for uid, want in batch1.iterrows():
        got = latest[uid]
        assert got["n_events"] == want["n"]
        assert got["value_total"] == pytest.approx(float(want["total"]))
        assert pd.Timestamp(got["last_ts"]) == want["last"]

    # second drop → resume from checkpoint; state must CARRY OVER
    d2 = _events_pdf(500, 300, 2)
    spark.createDataFrame(d2).write.mode("append").parquet(src)
    rows2: list = []
    _drain(spark, src, rows2, ck)
    latest2 = {r["user_id"]: r for r in rows2}
    both = pd.concat([d1, d2])
    batch2 = both.groupby("user_id").agg(
        n=("value", "size"), total=("value", "sum"), last=("ts", "max")
    )
    for uid in latest2:
        want = batch2.loc[uid]
        got = latest2[uid]
        assert got["n_events"] == want["n"]  # old state + new rows
        assert got["value_total"] == pytest.approx(float(want["total"]))


def test_idempotent_sink_survives_batch_retry(spark, tmp_path):
    """foreachBatch is at-least-once: Spark re-runs a micro-batch
    after a failure, and a plain append sink would duplicate its rows.
    The idempotent sink must make a retried batch a no-op overwrite of
    its own partition while leaving other batches untouched."""
    from pyspark.sql import functions as F

    from kblock_spark.streaming.ingest import idempotent_parquet_sink

    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out)
    b0 = spark.range(0, 5).select(F.col("id"), (F.col("id") * 10).alias("v"))
    b1 = spark.range(5, 8).select(F.col("id"), (F.col("id") * 10).alias("v"))

    sink(b0, 0)
    sink(b1, 1)
    sink(b0, 0)  # retry of batch 0 (same data, same batch id)

    got = spark.read.parquet(out)
    assert got.count() == 8, "retry duplicated rows"
    assert sorted(r["id"] for r in got.collect()) == list(range(8))
    # the retried batch replaced only its own partition
    assert got.where(F.col("__batch_id") == 0).count() == 5
    assert got.where(F.col("__batch_id") == 1).count() == 3
