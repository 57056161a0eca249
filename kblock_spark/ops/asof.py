"""As-of join (point-in-time lookup): for each left row, the most
recent right row with the same key whose timestamp is ≤ the left
row's timestamp.

The classic event-pipeline operator Spark lacks as a builtin (the
reference is batch-geospatial and has no analogue; this belongs to
the engine's beyond-reference event/training-data surface next to
sessionization q21). Spark-first formulation — NOT a range join
(whose candidate explosion is O(|L|·|R|) per key at 100 TB):

  union the two sides tagged, sort once per key by (ts, tag), and
  carry the last right row's payload forward with
  ``F.last(ignorenulls=True)`` over a running window.

The payload travels as ONE struct (null on left rows, a non-null
struct — possibly with null fields — on right rows), so every output
payload field comes from the SAME matched right row. Carrying the
columns independently would let a null field in the matched row be
backfilled from an older right row, stitching together an output row
that never existed and diverging from DuckDB ASOF JOIN semantics
(which returns the matched row's null).

One shuffle on the key + one per-partition sort — the same cost as a
groupBy over the combined input, independent of how far back the
matching right row lies. Right rows sort BEFORE left rows at equal
timestamps (tag 0 < 1), giving inclusive ``right_ts <= left_ts``
semantics, and the right side must be unique per (key, ts) — dedupe
upstream (e.g. keep max id) to make the match well-defined, exactly
what DuckDB's native ASOF JOIN (the oracle) expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join; returns all left columns + ``payload`` columns
    from the latest right row with right_ts ≤ left_ts (null when no
    right row precedes the left row)."""
    left_cols = left.columns
    ptype = T.StructType([right.schema[c] for c in payload])
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(ptype).alias("__p"),
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "__tag",
        *left_cols,
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
    )
    return filled.where(F.col("__tag") == 1).select(
        *left_cols,
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )
