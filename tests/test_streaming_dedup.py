"""Stream-side exact dedup: kept set must be batch-parity, duplicates
in later drops must be suppressed by carried state, and the
watermark-bounded flavor must dedup inside its horizon."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kblock_spark.streaming.dedup import (
    stream_dedup_stateful,
    stream_dedup_within_watermark,
    with_fingerprint,
)

SCHEMA = "doc_id long, text string, warc_ts timestamp"


def _docs_pdf(ids_texts, t0="2025-01-01"):
    return pd.DataFrame(
        {
            "doc_id": [i for i, _ in ids_texts],
            "text": [t for _, t in ids_texts],
            "warc_ts": pd.to_datetime(t0)
            + pd.to_timedelta(range(len(ids_texts)), unit="s"),
        }
    )


def _drain(spark, src, build, ck, rows):
    stream = with_fingerprint(spark.readStream.schema(SCHEMA).parquet(src))
    out = build(stream)

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_dedup_batch_parity_and_resume(spark, tmp_path):
    src = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    d1 = _docs_pdf(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc"), (5, "bb"), (6, "aa")]
    )
    spark.createDataFrame(d1).write.mode("overwrite").parquet(src)
    rows: list = []
    _drain(spark, src, stream_dedup_stateful, ck, rows)

    # batch oracle: GROUP BY fp -> min(doc_id), count-1 dups
    batch = (
        with_fingerprint(spark.createDataFrame(d1))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), (F.count("*") - 1).alias("n_dups"))
        .collect()
    )
    want = {(r["fp"], r["doc_id"], r["n_dups"]) for r in batch}
    got = {(r["fp"], r["doc_id"], r["n_dups"]) for r in rows}
    assert got == want and len(got) == 3

    # drop 2: one old duplicate (suppressed by carried state), one new
    d2 = _docs_pdf([(7, "aa"), (8, "dd")], t0="2025-01-02")
    spark.createDataFrame(d2).write.mode("append").parquet(src)
    rows2: list = []
    _drain(spark, src, stream_dedup_stateful, ck, rows2)
    assert len(rows2) == 1
    assert rows2[0]["doc_id"] == 8 and rows2[0]["n_dups"] == 0


def test_watermark_dedup_kept_set(spark, tmp_path):
    src = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    d1 = _docs_pdf(
        [(1, "xx"), (2, "xx"), (3, "yy"), (4, "zz"), (5, "yy")]
    )
    spark.createDataFrame(d1).write.mode("overwrite").parquet(src)
    rows: list = []
    _drain(
        spark,
        src,
        lambda s: stream_dedup_within_watermark(s, watermark="1 hour"),
        ck,
        rows,
    )
    # kept fingerprints == batch-distinct fingerprints, one row each
    fps = [r["fp"] for r in rows]
    assert len(fps) == 3 and len(set(fps)) == 3
    texts = sorted(r["text"] for r in rows)
    assert texts == ["xx", "yy", "zz"]
