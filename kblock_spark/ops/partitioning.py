"""Weighted balanced partitioning (the reference's ``weighted_qcut``,
kblock/batch_4_compute_k.py:377-387,508-516): order units by a spatial
key, cumulative-sum their weights, and cut into buckets of ~equal
total weight — the reference uses it to build ~100k-building chunks.

In this engine the *execution* skew control is salting + explicit
kernel-stage partition counts (see pipeline.compute_k), but the
operator itself is part of the surface: one window cumsum, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def weighted_buckets(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row a bucket id such that buckets have ~equal total
    weight when rows are taken in ``order_col`` order.

    bucket = floor(n_buckets · (cumsum - w) / total), clamped — the
    same half-open cut points as pd.cut over a cumulative sum
    (batch_4:381-386).
    """
    w_cum = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = F.sum(F.col(weight_col).cast("decimal(28,4)")).over(w_cum)
    total = F.sum(F.col(weight_col).cast("decimal(28,4)")).over(w_all)
    prev = cum - F.col(weight_col).cast("decimal(28,4)")
    bucket = F.floor(
        F.lit(n_buckets) * prev.cast("double") / total.cast("double")
    ).cast("int")
    return df.withColumn(
        bucket_col,
        F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), bucket)),
    )
