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


def test_replayed_batch_does_not_duplicate_sink_rows(spark, tmp_path):
    """True replay semantics: after a crash BETWEEN the sink write and
    the checkpoint commit, Structured Streaming re-executes the last
    micro-batch on restart. Simulated by deleting the newest commit
    marker from the checkpoint; with the idempotent per-batch sink the
    replay overwrites its own partition and the result is identical."""
    import os

    from pyspark.sql import functions as F

    from kblock_spark.streaming.ingest import idempotent_parquet_sink

    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    pdf = _events_pdf(0, 400, 1)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    def drain(ck_path):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
        )
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias("v_e6"),
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ck_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(ck)
    first = sorted(
        tuple(r) for r in spark.read.parquet(out)
        .select("user_id", "n", "v_e6").collect()
    )
    assert first  # non-vacuous

    # crash window: sink wrote, commit marker lost -> batch replays.
    # Spark refuses external edits to a checkpoint it has already
    # used in this session, so the crashed state is a COPY of the
    # checkpoint with the newest commit marker removed.
    ck2 = str(tmp_path / "ck_crashed")
    shutil.copytree(ck, ck2)
    commits = sorted(
        f for f in os.listdir(f"{ck2}/commits") if not f.startswith(".")
    )
    os.remove(f"{ck2}/commits/{commits[-1]}")
    # the copied checkpoint keeps the original queryId; this session
    # already ran that id against the ORIGINAL path, which trips the
    # concurrent-use guard — a fresh metadata file (new queryId) makes
    # the copy a legitimate restarted query. Stale Hadoop .crc
    # sidecars of the removed files must go too or the atomic
    # re-create trips the same guard.
    os.remove(f"{ck2}/metadata")
    for leftover in (
        f"{ck2}/.metadata.crc",
        f"{ck2}/commits/.{commits[-1]}.crc",
    ):
        if os.path.exists(leftover):
            os.remove(leftover)
    drain(ck2)

    second = sorted(
        tuple(r) for r in spark.read.parquet(out)
        .select("user_id", "n", "v_e6").collect()
    )
    assert second == first, "replayed batch changed the sink contents"
