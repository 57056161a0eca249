"""S4 (final piece): GeoPackage source — stdlib-sqlite3 container +
GPKG-blob/WKB struct parse, round-tripped against the test writer and
fed to the PIP machinery."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.geo.geom import polygon_area, unpack_rings
from kblock_spark.io.gpkg import read_gpkg, write_gpkg

SQ = [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]
HOLE = [0.25, 0.25, 0.25, 0.75, 0.75, 0.75, 0.75, 0.25, 0.25, 0.25]


def test_gpkg_roundtrip(spark, tmp_path):
    p = str(tmp_path / "data.gpkg")
    write_gpkg(
        p,
        "admin",
        [
            ("Polygon", [5, 5], SQ + HOLE, {"name": "unit", "code": "7"}),
            ("MultiPolygon", [5, 5], SQ + [x + 3 for x in SQ], {"name": "two"}),
            ("LineString", [2], [0.0, 0.0, 3.0, 4.0], {}),
            ("Point", [1], [9.0, 9.0], {"name": "pt"}),
        ],
    )
    rows = {r["geom_type"]: r for r in read_gpkg(spark, p).collect()}
    assert set(rows) == {"Polygon", "MultiPolygon", "LineString", "Point"}
    poly = rows["Polygon"]
    assert poly["properties"] == {"name": "unit", "code": "7"}
    shell, holes = unpack_rings(poly["ring_sizes"], poly["coords"])
    assert polygon_area(shell, holes) == 1.0 - 0.25
    assert rows["MultiPolygon"]["ring_sizes"] == [5, 5]
    assert rows["Point"]["coords"] == [9.0, 9.0]
    assert rows["LineString"]["coords"] == [0.0, 0.0, 3.0, 4.0]


def test_gpkg_table_select_and_pip_compat(spark, tmp_path):
    p = str(tmp_path / "multi.gpkg")
    write_gpkg(p, "a", [("Polygon", [5], SQ, {"t": "a"})])
    # second table appended into the same container
    import sqlite3

    con = sqlite3.connect(p)
    con.execute('CREATE TABLE "b" (geom BLOB, "t" TEXT)')
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('b','geom','GEOMETRY',4326,0,0)")
    blob = con.execute('SELECT geom FROM "a"').fetchone()[0]
    con.execute('INSERT INTO "b" VALUES (?, ?)', (blob, "b"))
    con.commit(); con.close()

    rb = read_gpkg(spark, p, table="b").collect()
    assert len(rb) == 1 and rb[0]["properties"]["t"] == "b"

    from kblock_spark.ops.spatial_join import polygons_with_cells

    polys = read_gpkg(spark, p, table="a").select(
        F.col("feature_id").alias("block_id"), "ring_sizes", "coords"
    )
    assert polygons_with_cells(polys, cell_deg=0.5).count() >= 4


def test_gpkg_rejects_zm_wkb(tmp_path):
    """Z/M WKB variants are rejected explicitly, never mis-parsed."""
    import struct

    import pytest

    from kblock_spark.io.gpkg import _parse_wkb

    zpoint = struct.pack("<bI3d", 1, 1001, 1.0, 2.0, 3.0)  # wkbPointZ
    with pytest.raises(ValueError, match="unsupported WKB"):
        _parse_wkb(zpoint)


def test_gpkg_sink_roundtrip_all_types(spark, tmp_path):
    """write_gpkg_df → read_gpkg must reproduce the packed-geometry
    form exactly for all six 2D types, and the written file must
    carry the required GeoPackage metadata (contents row with the
    dataset bbox, geometry column registration, SRS table)."""
    import sqlite3

    from kblock_spark.io.gpkg import read_gpkg, write_gpkg_df

    SQ = [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0, 0.0, 0.0]
    feats = [
        ("f1", "Point", {"name": "pt"}, [1], [9.0, 9.5]),
        ("f2", "LineString", {"name": "ln"}, [3], [0.0, 0.0, 1.0, 1.0, 2.0, 0.5]),
        ("f3", "Polygon", {"name": "pg"}, [5], SQ),
        ("f4", "MultiPoint", {"name": "mp"}, [1, 1], [1.0, 2.0, 3.0, 4.0]),
        ("f5", "MultiLineString", {"name": "ml"}, [2, 2],
         [0.0, 0.0, 1.0, 0.0, 5.0, 5.0, 6.0, 6.0]),
        ("f6", "MultiPolygon", {"name": "mg"}, [5, 5],
         SQ + [x + 5 for x in SQ]),
    ]
    df = spark.createDataFrame(
        feats,
        "feature_id string, geom_type string, "
        "properties map<string,string>, ring_sizes array<int>, "
        "coords array<double>",
    )
    p = str(tmp_path / "sink.gpkg")
    write_gpkg_df(df, p, table="blocks")

    back = {
        r["properties"]["name"]: r for r in read_gpkg(spark, p).collect()
    }
    want = {f[2]["name"]: f for f in feats}
    assert set(back) == set(want)
    for name, f in want.items():
        r = back[name]
        assert r["geom_type"] == f[1]
        assert list(r["ring_sizes"]) == f[3]
        assert list(r["coords"]) == f[4]

    con = sqlite3.connect(p)
    [(tname, dtype, minx, miny, maxx, maxy, srs)] = con.execute(
        "SELECT table_name, data_type, min_x, min_y, max_x, max_y, srs_id "
        "FROM gpkg_contents"
    ).fetchall()
    assert (tname, dtype, srs) == ("blocks", "features", 4326)
    assert (minx, miny, maxx, maxy) == (0.0, 0.0, 9.0, 9.5)
    [(gname,)] = con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns "
        "WHERE table_name='blocks'"
    ).fetchall()
    assert gname == "GEOMETRY"  # mixed-type table
    assert con.execute("SELECT COUNT(*) FROM gpkg_spatial_ref_sys").fetchone()[0] == 3
    con.close()


def test_gpkg_unknown_layer_raises(spark, tmp_path):
    from kblock_spark.io.gpkg import read_gpkg, write_gpkg

    p = str(tmp_path / "one.gpkg")
    write_gpkg(p, "streets", [("Point", [1], [1.0, 2.0], {})])
    with pytest.raises(Exception) as ei:
        read_gpkg(spark, p, table="nope").collect()
    assert "available layers" in str(ei.value)


def test_gpkg_write_rejects_empty_geometry(tmp_path):
    from kblock_spark.io.gpkg import write_gpkg

    with pytest.raises(ValueError, match="no coordinates"):
        write_gpkg(
            str(tmp_path / "bad.gpkg"), "t",
            [("LineString", [0], [], {})],
        )


def test_gpkg_write_rejects_inconsistent_sizes(tmp_path):
    """Pre-validation must catch every sizes/coords mismatch BEFORE the
    destination file is created (a mid-write raise would leave a
    half-written .gpkg behind)."""
    from kblock_spark.io.gpkg import write_gpkg

    dest = tmp_path / "bad.gpkg"
    cases = [
        ("LineString", [], [0.0, 0.0, 1.0, 1.0], "non-empty"),
        ("LineString", [3], [0.0, 0.0, 1.0, 1.0], "inconsistent"),
        ("LineString", [1, 1], [0.0, 0.0, 1.0, 1.0], "one size entry"),
        ("Polygon", [4], [0.0] * 6, "inconsistent"),
        ("Polygon", [0, 2], [0.0, 0.0, 1.0, 1.0], "positive"),
        ("Polygon", [2], [0.0, 0.0, 1.0], "odd flat-coord"),
        ("Point", [1], [0.0, 0.0, 1.0, 1.0], "exactly 2"),
        ("MultiPoint", [2], [0.0, 0.0, 1.0, 1.0], "size must be"),
    ]
    for gt, sizes, flat, msg in cases:
        with pytest.raises(ValueError, match=msg):
            write_gpkg(str(dest), "t", [(gt, sizes, flat, {})])
        assert not dest.exists(), f"{gt}/{sizes}: file created despite raise"
