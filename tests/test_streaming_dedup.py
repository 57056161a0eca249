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


def test_keep_row_carries_payload_and_suppresses_across_batches(spark, tmp_path):
    """stream_dedup_keep_row: the min-doc_id row's PAYLOAD survives
    (not just its id), and a fingerprint seen in an earlier
    micro-batch never re-emits — the carried state, not batch-local
    dedup, does the suppression."""
    from kblock_spark.streaming.dedup import stream_dedup_keep_row

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    b1 = pd.DataFrame(
        {
            "doc_id": [5, 3, 9],
            "fp": ["a", "a", "b"],
            "lang": ["en", "fr", "de"],
            "n_toks": [50, 30, 90],
        }
    )
    b2 = pd.DataFrame(  # fp 'a' replays with a SMALLER doc_id: too late
        {
            "doc_id": [1, 7],
            "fp": ["a", "c"],
            "lang": ["es", "it"],
            "n_toks": [10, 70],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, fp string, lang string, n_toks long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_dedup_keep_row(stream, "lang string, n_toks long")
    rows = []

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
    got = {r["fp"]: (r["doc_id"], r["lang"], r["n_toks"]) for r in rows}
    assert len(rows) == 3, rows  # one emit per fingerprint, EVER
    # fp 'a': batch-1 winner doc 3 (min within the emitting batch),
    # with doc 3's payload; the later doc 1 is suppressed by state
    assert got["a"] == (3, "fr", 30)
    assert got["b"] == (9, "de", 90)
    assert got["c"] == (7, "it", 70)


def test_payload_ddl_parse_handles_comma_bearing_types():
    """split(',') mis-split decimal(10,2)/map<k,v>/struct payloads —
    the DDL parser must yield the true field names."""
    from kblock_spark.streaming.dedup import _parse_payload_ddl

    s = _parse_payload_ddl(
        "price decimal(10,2), tags map<string,long>, "
        "meta struct<a:int,b:string>, lang string"
    )
    assert [f.name for f in s.fields] == ["price", "tags", "meta", "lang"]
