"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over ``mapInPandas``.

The real decoders (Pillow/ffmpeg/etc.) are NOT in this container, so
the decode step is gated: if a decoder library is importable it is
used, otherwise a clearly-marked deterministic fake parses the synth
container format below. The Spark-side plumbing — schema, batch
shape, UDF signatures, partitioning — is real and tested either way.

Synth container format (deterministic, self-describing):
  b"KBLK" + kind(1B: I/A/V) + width(4B LE) + height(4B LE)
  + n_frames(4B LE) + payload bytes (pseudo-random, seeded by key)
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"KBLK"

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, "
    "width int, height int, n_frames int"
)


def make_blob(media_id: int, kind: str, width: int, height: int, n_frames: int) -> bytes:
    """Payload byte j = (D[j mod 16] + j div 16) mod 256, where D is
    the md5 digest of "<media_id>:<kind>" — pseudo-random-looking but
    CLOSED-FORM, so a SQL engine can regenerate the byte stream from
    the hex digest and cross-check the decode features (the round-6
    media_features hard oracle; an RNG payload was uncheckable)."""
    seed = hashlib.md5(f"{media_id}:{kind}".encode()).digest()
    payload_len = min(width * height, 4096)
    d = np.frombuffer(seed, dtype=np.uint8).astype(np.int64)
    j = np.arange(payload_len, dtype=np.int64)
    payload = ((d[j % 16] + j // 16) % 256).astype(np.uint8).tobytes()
    return (
        MAGIC
        + kind[:1].upper().encode()
        + struct.pack("<III", width, height, n_frames)
        + payload
    )


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed synthetic media table (spark.range → mapInPandas)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    def gen(batches):
        kinds = ["image", "audio", "video"]
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                kind = kinds[int(i) % 3]
                w = 32 + (int(i) * 37) % 480
                h = 32 + (int(i) * 53) % 360
                nf = 1 if kind == "image" else 1 + (int(i) % 48)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "blob": make_blob(int(i), kind, w, h, nf),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_header(blob: bytes):
    if blob is None or len(blob) < 17 or blob[:4] != MAGIC:
        return None
    kind = chr(blob[4])
    w, h, nf = struct.unpack("<III", blob[5:17])
    return kind, w, h, nf, blob[17:]


def _have_real_decoder() -> bool:
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_features(media: DataFrame) -> DataFrame:
    """blob → per-item features (mean byte, byte-entropy proxy,
    content hash). Deterministic-fake decode of the synth container;
    a real decoder would produce pixel stats in the same shape."""
    schema = (
        "media_id long, kind string, dec_width int, dec_height int, "
        "mean_byte double, distinct_bytes int, content_hash string"
    )

    def run(batches):
        real = _have_real_decoder()
        for pdf in batches:
            rows = []
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                hdr = _decode_header(bytes(blob))
                if hdr is None:
                    continue
                k, w, h, nf, payload = hdr
                if real and kind == "image":  # pragma: no cover
                    raise NotImplementedError(
                        "real image decode path requires pixel-format "
                        "blobs; only the synth container exists here"
                    )
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "dec_width": int(w),
                        "dec_height": int(h),
                        "mean_byte": float(arr.mean()) if len(arr) else 0.0,
                        "distinct_bytes": int(len(np.unique(arr))),
                        "content_hash": hashlib.md5(payload).hexdigest(),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (UDTF-shaped mapInPandas; the frame 'decode' is the deterministic
    fake — a slice hash of the payload per frame index)."""
    schema = "media_id long, frame_idx int, frame_hash string"

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                hdr = _decode_header(bytes(blob))
                if hdr is None:
                    continue
                kind, w, h, nf, payload = hdr
                if kind != "V":
                    continue
                for f in range(0, nf, every_n):
                    sl = payload[f % max(len(payload), 1) :][:64]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": f,
                            "frame_hash": hashlib.md5(
                                sl + f.to_bytes(4, "little")
                            ).hexdigest(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


def resize_meta(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize planning — pure Catalyst arithmetic on typed metadata
    (no Python): target dims preserving aspect ratio."""
    from pyspark.sql import functions as F

    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.least(F.lit(max_dim), F.ceil(F.col("width") * scale).cast("int")).alias(
            "target_width"
        ),
        F.least(F.lit(max_dim), F.ceil(F.col("height") * scale).cast("int")).alias(
            "target_height"
        ),
    )
