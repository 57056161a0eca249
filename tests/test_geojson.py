"""S4 GeoJSON sources: FeatureCollection + newline-delimited, packed
into the engine's ring form and usable by downstream geometry ops."""

import json

import numpy as np
from pyspark.sql import functions as F

from kblock_spark.geo.geom import polygon_area, unpack_rings
from kblock_spark.io.geojson import read_geojson, read_geojson_seq

FEATURES = [
    {
        "type": "Feature",
        "id": "sq",
        "properties": {"name": "unit square", "code": 7},
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]],
                [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]],
            ],
        },
    },
    {
        "type": "Feature",
        "id": "mp",
        "properties": {"name": "two squares"},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[2.0, 0.0], [3.0, 0.0], [3.0, 1.0], [2.0, 1.0], [2.0, 0.0]]],
                [[[4.0, 0.0], [5.0, 0.0], [5.0, 1.0], [4.0, 1.0], [4.0, 0.0]]],
            ],
        },
    },
    {
        "type": "Feature",
        "id": "ln",
        "properties": {},
        "geometry": {"type": "LineString", "coordinates": [[0.0, 0.0], [3.0, 4.0]]},
    },
]


def _check(df):
    rows = {r["feature_id"]: r for r in df.collect()}
    assert set(rows) == {"sq", "mp", "ln"}
    sq = rows["sq"]
    assert sq["geom_type"] == "Polygon"
    assert sq["properties"]["name"] == "unit square"
    assert sq["properties"]["code"] == "7"
    shell, holes = unpack_rings(sq["ring_sizes"], sq["coords"])
    assert polygon_area(shell, holes) == 1.0 - 0.25
    mp = rows["mp"]
    assert mp["ring_sizes"] == [5, 5]
    ln = rows["ln"]
    line = np.asarray(ln["coords"]).reshape(-1, 2)
    assert float(np.hypot(*(line[1] - line[0]))) == 5.0


def test_read_geojson_featurecollection(spark, tmp_path):
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": FEATURES}))
    _check(read_geojson(spark, str(p)))


def test_read_geojson_seq_splittable(spark, tmp_path):
    p = tmp_path / "features.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in FEATURES) + "\n")
    df = read_geojson_seq(spark, str(p))
    _check(df)
    # downstream compatibility: the packed form feeds the PIP join
    from kblock_spark.ops.spatial_join import polygons_with_cells

    polys = df.where(F.col("geom_type") == "Polygon").select(
        F.col("feature_id").alias("block_id"), "ring_sizes", "coords"
    )
    pc = polygons_with_cells(polys, cell_deg=0.5)
    assert pc.count() >= 4


def test_read_geojson_seq_rfc8142_rs(spark, tmp_path):
    """True RFC 8142 GeoJSONSeq prefixes each record with RS (0x1E)."""
    p = tmp_path / "features.geojsons"
    p.write_text("".join("\x1e" + json.dumps(f) + "\n" for f in FEATURES))
    _check(read_geojson_seq(spark, str(p)))


def test_fallback_feature_ids_unique_across_files(spark, tmp_path):
    """Features without an explicit id must not collide across files
    (a per-file positional enumerate restarts at 0)."""
    def feat(x):
        return {
            "type": "Feature",
            "properties": {"x": x},
            "geometry": {"type": "Point", "coordinates": [float(x), 0.0]},
        }

    (tmp_path / "a.geojson").write_text(
        json.dumps({"type": "FeatureCollection", "features": [feat(1)]})
    )
    (tmp_path / "b.geojson").write_text(
        json.dumps({"type": "FeatureCollection", "features": [feat(2)]})
    )
    df = read_geojson(spark, str(tmp_path / "*.geojson"))
    ids = [r["feature_id"] for r in df.collect()]
    assert len(ids) == 2 and len(set(ids)) == 2
