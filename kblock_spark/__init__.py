"""kblock_spark — a PySpark-native street-block / spatial analytics engine.

A from-scratch reimplementation of the capabilities of
mansueto-institute/kblock (reference at /root/reference), designed
Spark-first:

- geometry travels through DataFrames as plain coordinate arrays /
  WKT-ish structs; all geometry math is vectorized numpy inside
  Arrow-batched pandas UDFs (the container has no shapely/GEOS — the
  kernel in :mod:`kblock_spark.geo` is self-contained numpy),
- spatial joins are tile equi-joins (geohash / fixed-resolution grid
  cells standing in for H3 level 9) with exact point-in-polygon
  refinement, broadcast small sides, and salted-key skew mitigation,
- per-entity geometry kernels (block polygonization, k-complexity
  peeling) run as ``groupBy(...).applyInPandas`` grouped-map UDFs,
- everything else (filters, joins, windows, aggregations, binning,
  dedup, similarity) is the plain declarative DataFrame API so
  Catalyst/AQE handle pushdown, pruning, join strategy and skew.
"""

__version__ = "0.1.0"
