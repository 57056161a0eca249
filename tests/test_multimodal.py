"""Multimodal binary-column plumbing: schema, decode batch shape,
frame sampling fan-out, resize planning."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.multimodal import (
    decode_features,
    frame_sample,
    resize_meta,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark, 300).cache()
    df.count()
    return df


def test_media_schema_and_counts(media):
    assert media.count() == 300
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert dict(media.dtypes)["blob"] == "binary"


def test_decode_features_deterministic(media):
    f1 = decode_features(media)
    rows = {r["media_id"]: r for r in f1.collect()}
    assert len(rows) == 300
    r0 = rows[0]
    assert r0["dec_width"] == 32 and 0.0 <= r0["mean_byte"] <= 255.0
    # deterministic: rerun hashes identical
    rows2 = {r["media_id"]: r["content_hash"] for r in decode_features(media).collect()}
    assert all(rows2[k] == v["content_hash"] for k, v in rows.items())


def test_frame_sample_fanout(media):
    fs = frame_sample(media, every_n=8)
    n_videos = media.where(F.col("kind") == "video").count()
    got = fs.groupBy("media_id").count().collect()
    assert len(got) == n_videos
    # fan-out matches ceil(n_frames/8) per video
    meta = {
        r["media_id"]: r["n_frames"]
        for r in media.where(F.col("kind") == "video").collect()
    }
    for r in got:
        expect = (meta[r["media_id"]] + 7) // 8
        assert r["count"] == expect


def test_resize_preserves_aspect(media):
    rs = resize_meta(media, max_dim=100)
    bad = rs.where(
        (F.col("target_width") > 100) | (F.col("target_height") > 100)
    ).count()
    assert bad == 0
    r = rs.where(F.col("media_id") == 1).collect()[0]
    ratio_in = r["width"] / r["height"]
    ratio_out = r["target_width"] / r["target_height"]
    assert ratio_out == pytest.approx(ratio_in, rel=0.05)
