"""GeoJSON sources (SURVEY §2 S4 — the reference reads GeoJSON via
geopandas.read_file, kblock/batch_1b_generate_blocks.py:288,
deploy/0-ingest-data/subjob_ingestion.py).

Two layouts:

- :func:`read_geojson` — classic FeatureCollection documents. A
  FeatureCollection is ONE json value, unsplittable by construction,
  so the unit of parallelism is the FILE (the reference's layout is
  one file per country — same granularity).
- :func:`read_geojson_seq` — newline-delimited features (GeoJSONSeq /
  RFC 8142). Splittable: Spark's text source chunks the file and each
  task parses its lines — the layout to ingest planetary OSM extracts.

Geometry lands in the engine's packed-ring form (ring_sizes, coords);
properties land as a map<string,string> (GeoJSON properties are
schemaless — map avoids a per-dataset inferred schema and keeps one
stable wire schema).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GEOJSON_SCHEMA = (
    "feature_id string, geom_type string, properties map<string,string>, "
    "ring_sizes array<int>, coords array<double>"
)


def _pack_geometry(geom: dict):
    """GeoJSON geometry → (ring_sizes, flat coords). Polygon rings and
    MultiPolygon rings concatenate (shell/hole structure preserved by
    ring order, matching geo.geom pack_rings); LineString/Point pack
    as a single 'ring' of their vertices."""
    t = geom.get("type")
    sizes: list[int] = []
    flat: list[float] = []

    def add_ring(ring):
        sizes.append(len(ring))
        for xy in ring:
            flat.append(float(xy[0]))
            flat.append(float(xy[1]))

    if t == "Polygon":
        for ring in geom["coordinates"]:
            add_ring(ring)
    elif t == "MultiPolygon":
        for poly in geom["coordinates"]:
            for ring in poly:
                add_ring(ring)
    elif t == "LineString":
        add_ring(geom["coordinates"])
    elif t == "MultiLineString":
        for line in geom["coordinates"]:
            add_ring(line)
    elif t == "Point":
        add_ring([geom["coordinates"]])
    else:
        return None, None, None
    return t, sizes, flat


def _fallback_id(feature: dict) -> str:
    """Stable id for features without an explicit ``id``: md5 of the
    canonical-serialized feature. A positional enumerate would restart
    at 0 per file / per text-split and collide across a multi-file
    load; content hashing is deterministic and split-independent."""
    blob = json.dumps(feature, sort_keys=True, separators=(",", ":"))
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def _features_to_pdf(features) -> pd.DataFrame:
    rows = []
    for f in features:
        geom = f.get("geometry") or {}
        t, sizes, flat = _pack_geometry(geom)
        if t is None:
            continue
        props = {
            str(k): ("" if v is None else str(v))
            for k, v in (f.get("properties") or {}).items()
        }
        fid = f.get("id")
        rows.append(
            {
                "feature_id": _fallback_id(f) if fid is None else str(fid),
                "geom_type": t,
                "properties": props,
                "ring_sizes": sizes,
                "coords": flat,
            }
        )
    return pd.DataFrame(
        rows,
        columns=["feature_id", "geom_type", "properties", "ring_sizes", "coords"],
    )


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection file(s) → packed-geometry DataFrame (one task
    per file; see module docstring)."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                doc = json.loads(bytes(blob).decode("utf-8"))
                feats = (
                    doc["features"]
                    if doc.get("type") == "FeatureCollection"
                    else [doc]
                )
                out = _features_to_pdf(feats)
                if len(out):
                    yield out

    return raw.mapInPandas(parse, GEOJSON_SCHEMA)


def read_geojson_seq(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited features → packed-geometry DataFrame
    (splittable text source; the 100 TB-friendly layout)."""
    raw = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            # RFC 8142 prefixes each record with RS (0x1E); newline-
            # delimited GeoJSONL has no separator — strip both forms.
            feats = [
                json.loads(line.lstrip("\x1e"))
                for line in pdf["value"]
                if line and line.lstrip("\x1e").strip()
            ]
            out = _features_to_pdf(feats)
            if len(out):
                yield out

    return raw.mapInPandas(parse, GEOJSON_SCHEMA)
