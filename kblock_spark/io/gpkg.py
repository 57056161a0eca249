"""GeoPackage source (SURVEY §2 S4's last piece — the reference reads
GHSL / Africapolis .gpkg via geopandas,
kblock/deploy/0-ingest-data/subjob_ingestion.py:59,95).

A GeoPackage is a sqlite database (public OGC spec) whose feature
tables store geometry as a GPKG blob: 'GP' magic, version, flags
(envelope size + endianness), srs_id, optional envelope, then
standard ISO WKB. Python's stdlib ``sqlite3`` opens the container and
~80 lines of struct parsing decode the WKB — no OGR needed.

Parallelism: one task per FILE (a sqlite db is one unsplittable
binary), matching the reference's one-gpkg-per-dataset layout; the
table's non-geometry columns land in ``properties
map<string,string>`` like the GeoJSON/Shapefile sources. Files are
opened through the local filesystem (sqlite needs a seekable file);
on an object store, localize first.
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GPKG_SCHEMA = (
    "feature_id string, geom_type string, properties map<string,string>, "
    "ring_sizes array<int>, coords array<double>"
)

_WKB_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
}


def _parse_wkb(buf: bytes, off: int = 0):
    """→ (geom_type_name, ring_sizes, flat_coords, new_offset).
    2D geometries of the 6 base types; Z/M variants (type+1000 etc.)
    are rejected explicitly rather than mis-parsed."""
    bo = "<" if buf[off] == 1 else ">"
    (wtype,) = struct.unpack_from(f"{bo}I", buf, off + 1)
    base = wtype & 0xFF
    if wtype not in _WKB_NAMES:
        raise ValueError(f"unsupported WKB type {wtype} (Z/M not supported)")
    off += 5

    def read_points(n, o):
        pts = struct.unpack_from(f"{bo}{2 * n}d", buf, o)
        return list(pts), o + 16 * n

    if base == 1:  # Point
        flat, off = read_points(1, off)
        return "Point", [1], flat, off
    if base == 2:  # LineString
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        flat, off = read_points(n, off + 4)
        return "LineString", [n], flat, off
    if base == 3:  # Polygon
        (nr,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        sizes, flat = [], []
        for _ in range(nr):
            (n,) = struct.unpack_from(f"{bo}I", buf, off)
            pts, off = read_points(n, off + 4)
            sizes.append(n)
            flat.extend(pts)
        return "Polygon", sizes, flat, off
    # Multi*: count then nested full WKB geometries
    (ng,) = struct.unpack_from(f"{bo}I", buf, off)
    off += 4
    sizes, flat = [], []
    for _ in range(ng):
        _t, s, f, off = _parse_wkb(buf, off)
        sizes.extend(s)
        flat.extend(f)
    return _WKB_NAMES[base], sizes, flat, off


def _parse_gpkg_blob(blob: bytes):
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    env_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope code {env_code}")
    return _parse_wkb(blob, 8 + env_len)[:3]


def _read_gpkg_file(path: str, table: str | None):
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        geo_cols = con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns"
        ).fetchall()
        if not geo_cols:
            return []
        by_table = dict(geo_cols)
        if table is None:
            table = geo_cols[0][0]
        geom_col = by_table[table]
        cols = [r[1] for r in con.execute(f'PRAGMA table_info("{table}")')]
        prop_cols = [c for c in cols if c != geom_col]
        sel = ", ".join(f'"{c}"' for c in [geom_col] + prop_cols)
        rows = []
        for rec in con.execute(f'SELECT rowid, {sel} FROM "{table}"'):
            rowid, blob = rec[0], rec[1]
            if blob is None:
                continue
            gt, sizes, flat = _parse_gpkg_blob(bytes(blob))
            props = {
                c: ("" if v is None else str(v))
                for c, v in zip(prop_cols, rec[2:])
            }
            rows.append(
                {
                    "feature_id": f"{table}:{rowid}",
                    "geom_type": gt,
                    "properties": props,
                    "ring_sizes": sizes,
                    "coords": flat,
                }
            )
        return rows
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession, path: str, table: str | None = None
) -> DataFrame:
    """.gpkg file(s) → packed-geometry DataFrame (one task per file)."""
    raw = spark.read.format("binaryFile").load(path).select("path")

    def parse(batches):
        for pdf in batches:
            for p in pdf["path"]:
                local = str(p)
                if local.startswith("file:"):
                    local = local[5:]
                    while local.startswith("//"):
                        local = local[1:]
                rows = _read_gpkg_file(local, table)
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "feature_id", "geom_type", "properties",
                            "ring_sizes", "coords",
                        ],
                    )

    return raw.mapInPandas(parse, GPKG_SCHEMA)


def write_gpkg(path: str, table: str, features: list[tuple[str, list, list, dict]]):
    """Minimal spec-conformant GeoPackage writer (tests only):
    features = [(geom_type, ring_sizes, flat_coords, properties)].
    Geometry is written as little-endian 2D WKB inside a GPKG blob."""
    type_codes = {v: k for k, v in _WKB_NAMES.items()}
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 0x47504B47")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name "
        "TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"
    )
    prop_names = sorted({k for *_, pr in features for k in pr})
    col_ddl = "".join(f', "{c}" TEXT' for c in prop_names)
    con.execute(f'CREATE TABLE "{table}" (geom BLOB{col_ddl})')
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', 4326, 0, 0)",
        (table,),
    )

    def wkb(gt, sizes, flat):
        code = type_codes[gt]
        out = struct.pack("<bI", 1, code)
        if code == 1:
            out += struct.pack("<2d", flat[0], flat[1])
        elif code == 2:
            out += struct.pack("<I", sizes[0])
            out += struct.pack(f"<{2*sizes[0]}d", *flat)
        elif code == 3:
            out += struct.pack("<I", len(sizes))
            o = 0
            for n in sizes:
                out += struct.pack("<I", n)
                out += struct.pack(f"<{2*n}d", *flat[2*o:2*(o+n)])
                o += n
        elif code == 6:  # MultiPolygon: one single-ring polygon per size
            out += struct.pack("<I", len(sizes))
            o = 0
            for n in sizes:
                out += struct.pack("<bII", 1, 3, 1)
                out += struct.pack("<I", n)
                out += struct.pack(f"<{2*n}d", *flat[2*o:2*(o+n)])
                o += n
        else:
            raise ValueError(gt)
        return out

    for gt, sizes, flat, props in features:
        blob = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb(gt, sizes, flat)
        con.execute(
            f'INSERT INTO "{table}" VALUES ({",".join(["?"] * (1 + len(prop_names)))})',
            (blob, *[str(props.get(c, "")) for c in prop_names]),
        )
    con.commit()
    con.close()
