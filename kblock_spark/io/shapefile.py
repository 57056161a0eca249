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
sidecar IS parsed (``_parse_dbf`` below: dBASE III header + field
descriptors, every field decoded as a trimmed string) and joined onto
features when ``with_attributes=True`` — covered by
test_shapefile_dbf_attributes. Feature ids are
``<md5(path)[:8]>:<record_number>`` so they stay unique across a
multi-file load.
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


def _parse_dbf(blob: bytes) -> list[dict]:
    """dBASE III .dbf attribute table (public format: fixed-width
    records after 32-byte header + 32-byte field descriptors) →
    list of {field: string} per active record, in record order
    (record i pairs with .shp record number i+1)."""
    if len(blob) < 32:
        return []
    nrec = struct.unpack("<i", blob[4:8])[0]
    hdr_size, rec_size = struct.unpack("<hh", blob[8:12])
    fields = []
    off = 32
    while off + 32 <= hdr_size and blob[off] != 0x0D:
        raw_name = blob[off : off + 11].split(b"\x00")[0]
        ftype = chr(blob[off + 11])
        flen = blob[off + 16]
        fields.append((raw_name.decode("ascii", "replace"), ftype, flen))
        off += 32
    out = []
    pos = hdr_size
    for _ in range(nrec):
        if pos + rec_size > len(blob):
            break
        rec = blob[pos : pos + rec_size]
        pos += rec_size
        if rec[:1] == b"\x2a":  # deleted
            continue
        vals = {}
        o = 1
        for name, ftype, flen in fields:
            raw = rec[o : o + flen]
            o += flen
            vals[name] = raw.decode("latin-1").strip()
        out.append(vals)
    return out


def read_shapefile(
    spark: SparkSession, path: str, with_attributes: bool = False
) -> DataFrame:
    """.shp file(s) → packed-geometry DataFrame (one task per file).

    with_attributes=True also parses each file's sibling ``.dbf``
    (record i ↔ shape record i+1 — the shapefile spec's pairing) into
    a ``properties map<string,string>`` column, the same schemaless
    wire form the GeoJSON source uses. The sibling is opened through
    the local filesystem (the reference's one-shapefile-per-country
    layout ships sidecars next to the .shp); on an object store, load
    the .dbf table separately and join on the record number instead."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    schema = SHAPEFILE_SCHEMA
    if with_attributes:
        schema += ", properties map<string,string>"

    def parse(batches):
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows = _parse_shp(bytes(blob), str(p))
                if not rows:
                    continue
                out = pd.DataFrame(
                    rows,
                    columns=["feature_id", "geom_type", "ring_sizes", "coords"],
                )
                if with_attributes:
                    local = str(p)
                    if local.startswith("file:"):
                        local = local[5:]
                        while local.startswith("//"):
                            local = local[1:]
                    dbf_path = local.rsplit(".", 1)[0] + ".dbf"
                    attrs: list[dict] = []
                    try:
                        with open(dbf_path, "rb") as f:
                            attrs = _parse_dbf(f.read())
                    except OSError:
                        pass
                    by_rec = {i + 1: a for i, a in enumerate(attrs)}
                    out["properties"] = [
                        by_rec.get(int(fid.split(":")[1]), {})
                        for fid in out["feature_id"]
                    ]
                yield out

    return raw.mapInPandas(parse, schema)


def write_dbf(path: str, records: list[dict], field_len: int = 32):
    """Minimal dBASE III writer (tests only): all fields type C."""
    names = sorted({k for r in records for k in r})
    nf = len(names)
    rec_size = 1 + nf * field_len
    hdr_size = 32 + nf * 32 + 1
    hdr = bytearray(32)
    hdr[0] = 0x03
    hdr[1:4] = b"\x5f\x01\x01"
    hdr[4:8] = struct.pack("<i", len(records))
    hdr[8:12] = struct.pack("<hh", hdr_size, rec_size)
    body = bytearray(bytes(hdr))
    for n in names:
        fd = bytearray(32)
        fd[0:11] = n.encode("ascii")[:11].ljust(11, b"\x00")
        fd[11] = ord("C")
        fd[16] = field_len
        body += fd
    body += b"\x0d"
    for r in records:
        body += b"\x20"
        for n in names:
            body += str(r.get(n, "")).encode("latin-1")[:field_len].ljust(
                field_len, b" "
            )
    body += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(body))


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
