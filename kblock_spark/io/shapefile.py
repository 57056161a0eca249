"""ESRI Shapefile source (SURVEY §2 S4's second half — the reference
reads .shp country extracts via geopandas.read_file,
kblock/batch_2_prepare_buildings.py:186,
batch_1b_generate_blocks.py:317).

Pure-python struct parse of the PUBLIC .shp record format (ESRI
Shapefile Technical Description, 1998): 100-byte header (file code
9994 big-endian, shape type little-endian), then records of
(record-number BE, content-length BE in 16-bit words) followed by a
little-endian shape body. Supported shapes: Null (0), Point (1),
PolyLine (3), Polygon (5), MultiPoint (8) — the types the reference's
ingest actually encounters. A .shp file is one unsplittable binary
blob (record lengths are only discoverable by walking the records),
so — like :mod:`.geojson`'s FeatureCollection path — the unit of
parallelism is the FILE; the reference's layout is likewise one
shapefile per country.

Geometry lands in the engine's packed-ring form (ring_sizes, coords),
ring order preserved from the file (shapefile polygons store the
outer ring first in well-formed data — the same shell-first
convention as geo.geom.pack_rings). The companion .dbf attribute
table is out of scope (the reference's geometry ingest is what S4
covers); feature ids are ``<md5(path)[:8]>:<record_number>`` so they
stay unique across a multi-file load.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHAPEFILE_SCHEMA = (
    "feature_id string, geom_type string, ring_sizes array<int>, "
    "coords array<double>"
)

_SHAPE_NAMES = {1: "Point", 3: "LineString", 5: "Polygon", 8: "MultiPoint"}


def _parse_shp(blob: bytes, path: str) -> list[dict]:
    if len(blob) < 100:
        raise ValueError(f"{path}: truncated shapefile header")
    (code,) = struct.unpack(">i", blob[0:4])
    if code != 9994:
        raise ValueError(f"{path}: bad shapefile magic {code}")
    (file_words,) = struct.unpack(">i", blob[24:28])
    end = min(file_words * 2, len(blob))
    salt = hashlib.md5(path.encode("utf-8")).hexdigest()[:8]
    out: list[dict] = []
    off = 100
    while off + 8 <= end:
        rec_no, content_words = struct.unpack(">ii", blob[off : off + 8])
        body = blob[off + 8 : off + 8 + content_words * 2]
        off += 8 + content_words * 2
        if len(body) < 4:
            continue
        (stype,) = struct.unpack("<i", body[0:4])
        if stype == 0:  # Null shape
            continue
        if stype == 1:  # Point
            x, y = struct.unpack("<dd", body[4:20])
            sizes, flat = [1], [x, y]
        elif stype == 8:  # MultiPoint: bbox, numPoints, points
            (npts,) = struct.unpack("<i", body[36:40])
            pts = struct.unpack(f"<{2 * npts}d", body[40 : 40 + 16 * npts])
            sizes, flat = [npts], list(pts)
        elif stype in (3, 5):  # PolyLine / Polygon: bbox, parts, points
            nparts, npts = struct.unpack("<ii", body[36:44])
            parts = struct.unpack(f"<{nparts}i", body[44 : 44 + 4 * nparts])
            p0 = 44 + 4 * nparts
            pts = struct.unpack(f"<{2 * npts}d", body[p0 : p0 + 16 * npts])
            bounds = list(parts) + [npts]
            sizes = [bounds[i + 1] - bounds[i] for i in range(nparts)]
            flat = list(pts)
        else:
            # unsupported shape (Z/M variants): skip, never guess
            continue
        gt = _SHAPE_NAMES[stype]
        if stype == 3 and len(sizes) > 1:
            gt = "MultiLineString"
        out.append(
            {
                "feature_id": f"{salt}:{rec_no}",
                "geom_type": gt,
                "ring_sizes": sizes,
                "coords": flat,
            }
        )
    return out


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """.shp file(s) → packed-geometry DataFrame (one task per file)."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows = _parse_shp(bytes(blob), str(p))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "feature_id", "geom_type", "ring_sizes", "coords",
                        ],
                    )

    return raw.mapInPandas(parse, SHAPEFILE_SCHEMA)


def write_shapefile(path: str, shapes: list[tuple[int, list[list[float]]]]):
    """Minimal .shp writer (tests + fixture synthesis only): shapes is
    a list of (shape_type, [part, ...]) with each part a flat
    [x0, y0, x1, y1, ...] list. Produces a spec-conformant file the
    reader (and any OGR tool) can parse."""
    recs = []
    for i, (stype, parts) in enumerate(shapes, start=1):
        if stype == 1:
            body = struct.pack("<i", 1) + struct.pack("<dd", parts[0][0], parts[0][1])
        else:
            allpts = [p for part in parts for p in part]
            xs, ys = allpts[0::2], allpts[1::2]
            npts = len(xs)
            offs, acc = [], 0
            for part in parts:
                offs.append(acc)
                acc += len(part) // 2
            body = struct.pack("<i", stype)
            body += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
            body += struct.pack("<ii", len(parts), npts)
            body += struct.pack(f"<{len(offs)}i", *offs)
            body += struct.pack(f"<{2 * npts}d", *allpts)
        recs.append(struct.pack(">ii", i, len(body) // 2) + body)
    content = b"".join(recs)
    total_words = (100 + len(content)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    hdr += struct.pack("<ii", 1000, shapes[0][0] if shapes else 0)
    hdr += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(hdr + content)
