"""GeoPackage source AND sink (SURVEY §2 S4's last piece + S10's
write half — the reference reads GHSL / Africapolis .gpkg via
geopandas, kblock/deploy/0-ingest-data/subjob_ingestion.py:59,95, and
writes per-country block .gpkg at batch_1b_generate_blocks.py:390,407).

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
        # ORDER BY: sqlite gives no row-order guarantee, so the
        # default-layer pick must not depend on storage order in a
        # multi-table package
        geo_cols = con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns"
            " ORDER BY table_name"
        ).fetchall()
        if not geo_cols:
            return []
        by_table = dict(geo_cols)
        if table is None:
            table = geo_cols[0][0]
        if table not in by_table:
            raise ValueError(
                f"gpkg layer {table!r} not found in {path}; "
                f"available layers: {sorted(by_table)}"
            )
        geom_col = by_table[table]
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        # exclude the geometry and the INTEGER PRIMARY KEY (the fid /
        # rowid alias — an identifier, not a feature property; it is
        # surfaced as part of feature_id instead)
        prop_cols = [
            r[1] for r in info
            if r[1] != geom_col
            and not (r[5] and (r[2] or "").upper() == "INTEGER")
        ]
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


def _encode_wkb(gt: str, sizes: list, flat: list) -> bytes:
    """Packed-ring form → little-endian 2D WKB (inverse of
    :func:`_parse_wkb`). Multi* parts are re-grouped one ring per
    part — the packed form keeps ring sizes, not part nesting, so a
    read→write→read cycle reproduces the packed form exactly even
    when the WKB part structure differs from the original file."""
    code = {v: k for k, v in _WKB_NAMES.items()}[gt]
    out = struct.pack("<BI", 1, code)
    if code == 1:  # Point
        return out + struct.pack("<2d", flat[0], flat[1])
    if code == 2:  # LineString
        return out + struct.pack(f"<I{2*sizes[0]}d", sizes[0], *flat)
    if code == 3:  # Polygon
        out += struct.pack("<I", len(sizes))
        o = 0
        for n in sizes:
            out += struct.pack(f"<I{2*n}d", n, *flat[2*o:2*(o+n)])
            o += n
        return out
    # Multi*: one part per packed size entry
    part_code = {4: 1, 5: 2, 6: 3}[code]
    out += struct.pack("<I", len(sizes))
    o = 0
    for n in sizes:
        part = _encode_wkb(
            _WKB_NAMES[part_code],
            [n],
            flat[2*o:2*(o+n)],
        )
        out += part
        o += n
    return out


def _envelope(flat: list) -> tuple:
    """(minx, maxx, miny, maxy) of a flat coord list."""
    xs, ys = flat[0::2], flat[1::2]
    return (min(xs), max(xs), min(ys), max(ys))


def _gpkg_blob(wkb: bytes, env: tuple, srs_id: int) -> bytes:
    """Wrap WKB in a GPKG binary header: magic, version 0, flags
    (little-endian + 32-byte envelope), srs_id, [minx maxx miny maxy]."""
    # flags 0b0000_0011: envelope code 1 (bits 3-1), LE header (bit 0)
    return b"GP\x00\x03" + struct.pack("<i4d", srs_id, *env) + wkb


_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    (
        "WGS 84 geodetic", 4326, "EPSG", 4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
        '6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]]',
        "longitude/latitude on the WGS 84 ellipsoid",
    ),
]


def write_gpkg(
    path: str,
    table: str,
    features: list[tuple[str, list, list, dict]],
    srs_id: int = 4326,
):
    """Spec-conformant GeoPackage writer (S10's write half — the
    reference exports per-country block .gpkg at
    kblock/batch_1b_generate_blocks.py:390,407):
    ``features = [(geom_type, ring_sizes, flat_coords, properties)]``.

    Writes the three required metadata tables (gpkg_spatial_ref_sys,
    gpkg_contents with the dataset bbox, gpkg_geometry_columns) plus
    the feature table (fid INTEGER PRIMARY KEY, GPKG-blob geometry
    with per-feature envelope, property columns as TEXT) — openable
    by OGR/QGIS, round-trips through :func:`read_gpkg`."""
    type_codes = {v: k for k, v in _WKB_NAMES.items()}
    # validate BEFORE touching the destination: raising mid-write
    # would leave a half-written corrupt .gpkg and an open connection
    for fi, (gt, sizes, flat, _props) in enumerate(features):
        if gt not in type_codes:
            raise ValueError(f"unsupported geometry type {gt!r} (feature {fi})")
        if not flat:
            raise ValueError(
                f"feature {fi} ({gt}) has no coordinates — empty "
                "geometries cannot be written to a GeoPackage envelope"
            )
        # sizes/coords consistency: _encode_wkb would otherwise raise
        # (or silently drop coordinates) mid-write, leaving the
        # half-written .gpkg this guard exists to prevent
        if len(flat) % 2:
            raise ValueError(
                f"feature {fi} ({gt}): odd flat-coord length {len(flat)}"
            )
        if gt == "Point":
            if len(flat) != 2:
                raise ValueError(
                    f"feature {fi} (Point): expected exactly 2 flat "
                    f"coords, got {len(flat)}"
                )
            continue
        if not sizes or any(n <= 0 for n in sizes):
            raise ValueError(
                f"feature {fi} ({gt}): ring_sizes must be non-empty "
                f"and positive, got {list(sizes)!r}"
            )
        if 2 * sum(sizes) != len(flat):
            raise ValueError(
                f"feature {fi} ({gt}): ring_sizes sum {sum(sizes)} "
                f"inconsistent with {len(flat)} flat coords "
                f"(expected {2 * sum(sizes)})"
            )
        if gt == "LineString" and len(sizes) != 1:
            raise ValueError(
                f"feature {fi} (LineString): exactly one size entry "
                f"expected, got {len(sizes)}"
            )
        if gt == "MultiPoint" and any(n != 1 for n in sizes):
            raise ValueError(
                f"feature {fi} (MultiPoint): every part size must be "
                f"1, got {list(sizes)!r}"
            )
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 0x47504B47")
    con.execute("PRAGMA user_version = 10300")  # GeoPackage 1.3
    con.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
        "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, "
        "definition TEXT NOT NULL, description TEXT)"
    )
    con.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", _SRS_ROWS
    )
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
        "description TEXT DEFAULT '', last_change TEXT, "
        "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
        "srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "PRIMARY KEY (table_name, column_name))"
    )
    gtypes = {gt for gt, *_ in features}
    gname = gtypes.pop().upper() if len(gtypes) == 1 else "GEOMETRY"
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
        (table, gname, srs_id),
    )
    prop_names = sorted({k for *_, pr in features for k in pr})
    col_ddl = "".join(f', "{c}" TEXT' for c in prop_names)
    con.execute(
        f'CREATE TABLE "{table}" '
        f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, geom BLOB{col_ddl})"
    )
    prop_cols = "".join(', "' + c + '"' for c in prop_names)
    marks = ",".join(["?"] * (1 + len(prop_names)))
    insert_sql = f'INSERT INTO "{table}" (geom{prop_cols}) VALUES ({marks})'
    bbox = [None, None, None, None]  # minx, miny, maxx, maxy
    for gt, sizes, flat, props in features:
        env = _envelope(flat)
        blob = _gpkg_blob(_encode_wkb(gt, sizes, flat), env, srs_id)
        minx, maxx, miny, maxy = env
        for i, v in enumerate((minx, miny, maxx, maxy)):
            if bbox[i] is None or (v < bbox[i] if i < 2 else v > bbox[i]):
                bbox[i] = v
        con.execute(
            insert_sql,
            (blob, *[str(props.get(c, "")) for c in prop_names]),
        )
    con.execute(
        "INSERT INTO gpkg_contents VALUES "
        "(?, 'features', ?, '', '1970-01-01T00:00:00.000Z', ?, ?, ?, ?, ?)",
        (table, table, *bbox, srs_id),
    )
    con.commit()
    con.close()


def write_gpkg_df(
    df: DataFrame, path: str, table: str = "features", srs_id: int = 4326
):
    """DataFrame → GeoPackage sink. A GeoPackage is one sqlite file —
    an inherently single-writer EXPORT format (the reference's
    per-country .gpkg outputs are the same shape), so rows stream to
    the driver with ``toLocalIterator`` (one partition in memory at a
    time) and sqlite3 writes the container; engine-to-engine handoff
    at scale stays parquet (io/sinks.py). Input is the engine's
    packed-geometry schema (geom_type, ring_sizes, coords,
    properties)."""
    feats = (
        (
            r["geom_type"],
            list(r["ring_sizes"]),
            list(r["coords"]),
            dict(r["properties"]) if "properties" in df.columns else {},
        )
        for r in df.toLocalIterator()
    )
    write_gpkg(path, table, list(feats), srs_id=srs_id)
