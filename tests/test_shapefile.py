"""S4 (second half): pure-python ESRI .shp source — round-trip a
synthetic shapefile and feed the packed geometry to a spatial op."""

import numpy as np
from pyspark.sql import functions as F

from kblock_spark.geo.geom import polygon_area, unpack_rings
from kblock_spark.io.shapefile import read_shapefile, write_shapefile

SQUARE = [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]
HOLE = [0.25, 0.25, 0.25, 0.75, 0.75, 0.75, 0.75, 0.25, 0.25, 0.25]
LINE = [0.0, 0.0, 3.0, 4.0]


def test_shapefile_roundtrip(spark, tmp_path):
    p = str(tmp_path / "polys.shp")
    write_shapefile(p, [(5, [SQUARE, HOLE]), (5, [[x + 2 for x in SQUARE[0::1]]])])
    df = read_shapefile(spark, p)
    rows = sorted(df.collect(), key=lambda r: r["feature_id"])
    assert len(rows) == 2
    assert {r["geom_type"] for r in rows} == {"Polygon"}
    with_hole = [r for r in rows if len(r["ring_sizes"]) == 2][0]
    shell, holes = unpack_rings(with_hole["ring_sizes"], with_hole["coords"])
    assert polygon_area(shell, holes) == 1.0 - 0.25


def test_shapefile_lines_and_points(spark, tmp_path):
    write_shapefile(str(tmp_path / "lines.shp"), [(3, [LINE]), (3, [LINE, [x + 1 for x in LINE]])])
    write_shapefile(str(tmp_path / "pts.shp"), [(1, [[7.0, 8.0]])])
    lines = read_shapefile(spark, str(tmp_path / "lines.shp")).collect()
    assert sorted(r["geom_type"] for r in lines) == ["LineString", "MultiLineString"]
    ln = [r for r in lines if r["geom_type"] == "LineString"][0]
    seg = np.asarray(ln["coords"]).reshape(-1, 2)
    assert float(np.hypot(*(seg[1] - seg[0]))) == 5.0
    pts = read_shapefile(spark, str(tmp_path / "pts.shp")).collect()
    assert pts[0]["geom_type"] == "Point" and pts[0]["coords"] == [7.0, 8.0]


def test_shapefile_ids_unique_across_files_and_feeds_pip(spark, tmp_path):
    """Multi-file load: ids must not collide (record numbers restart
    per file), and the packed form must feed the PIP join machinery."""
    write_shapefile(str(tmp_path / "a.shp"), [(5, [SQUARE])])
    write_shapefile(str(tmp_path / "b.shp"), [(5, [[x + 5 for x in SQUARE]])])
    df = read_shapefile(spark, str(tmp_path / "*.shp"))
    ids = [r["feature_id"] for r in df.collect()]
    assert len(ids) == 2 and len(set(ids)) == 2

    from kblock_spark.ops.spatial_join import polygons_with_cells

    polys = df.select(F.col("feature_id").alias("block_id"), "ring_sizes", "coords")
    assert polygons_with_cells(polys, cell_deg=0.5).count() >= 4


def test_shapefile_property_roundtrip(spark, tmp_path):
    """Property round-trip: random multi-part polygons/polylines
    survive write→read bit-exactly (coords are raw little-endian
    doubles — no precision loss is acceptable)."""
    from hypothesis import given, settings, strategies as st

    coord = st.floats(
        min_value=-180.0, max_value=180.0,
        allow_nan=False, allow_infinity=False, width=64,
    )

    def ring(points):
        flat = [c for xy in points for c in xy]
        return flat + flat[:2]  # close the ring

    ring_st = st.lists(
        st.tuples(coord, coord), min_size=3, max_size=8
    ).map(ring)
    shape_st = st.one_of(
        st.tuples(st.just(5), st.lists(ring_st, min_size=1, max_size=3)),
        st.tuples(
            st.just(3),
            st.lists(
                st.lists(st.tuples(coord, coord), min_size=2, max_size=6).map(
                    lambda pts: [c for xy in pts for c in xy]
                ),
                min_size=1,
                max_size=3,
            ),
        ),
    )

    counter = {"i": 0}

    @settings(max_examples=12, deadline=None)
    @given(st.lists(shape_st, min_size=1, max_size=4))
    def check(shapes):
        counter["i"] += 1
        p = str(tmp_path / f"prop_{counter['i']}.shp")
        write_shapefile(p, shapes)
        got = sorted(
            read_shapefile(spark, p).collect(),
            key=lambda r: int(r["feature_id"].split(":")[1]),
        )
        assert len(got) == len(shapes)
        for (stype, parts), row in zip(shapes, got):
            assert row["ring_sizes"] == [len(part) // 2 for part in parts]
            want = [c for part in parts for c in part]
            assert row["coords"] == want  # bit-exact

    check()


def test_shapefile_dbf_attributes(spark, tmp_path):
    """with_attributes joins the sibling .dbf by record number (the
    spec's pairing); missing sidecars degrade to empty maps."""
    from kblock_spark.io.shapefile import write_dbf

    p = str(tmp_path / "c.shp")
    write_shapefile(p, [(5, [SQUARE]), (5, [[x + 2 for x in SQUARE]])])
    write_dbf(
        str(tmp_path / "c.dbf"),
        [{"NAME": "alpha", "POP": "120"}, {"NAME": "beta", "POP": "7"}],
    )
    rows = sorted(
        read_shapefile(spark, p, with_attributes=True).collect(),
        key=lambda r: int(r["feature_id"].split(":")[1]),
    )
    assert rows[0]["properties"] == {"NAME": "alpha", "POP": "120"}
    assert rows[1]["properties"] == {"NAME": "beta", "POP": "7"}

    # no sidecar → empty properties, no crash
    q = str(tmp_path / "lonely.shp")
    write_shapefile(q, [(5, [SQUARE])])
    row = read_shapefile(spark, q, with_attributes=True).collect()[0]
    assert row["properties"] == {}


def test_shapefile_rejects_corrupt_input(spark, tmp_path):
    """Bad magic / truncated headers raise clearly instead of
    mis-parsing silently."""
    import pytest

    from kblock_spark.io.shapefile import _parse_shp

    with pytest.raises(ValueError, match="magic"):
        _parse_shp(b"\x00" * 120, "bad.shp")
    with pytest.raises(ValueError, match="truncated"):
        _parse_shp(b"\x00" * 10, "short.shp")
