"""As-of join (point-in-time lookup): for each left row, the most
recent right row with the same key whose timestamp is ≤ the left
row's timestamp.

The classic event-pipeline operator Spark lacks as a builtin (the
reference is batch-geospatial and has no analogue; this belongs to
the engine's beyond-reference event/training-data surface next to
sessionization q21). Spark-first formulation — NOT a range join
(whose candidate explosion is O(|L|·|R|) per key at 100 TB):

  union the two sides tagged, sort once per key by (ts, tag), and
  carry the last non-null right payload forward with
  ``F.last(ignorenulls=True)`` over a running window.

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
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "__tag",
        *left_cols,
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return filled.where(F.col("__tag") == 1).drop("__tag")
