"""No-silent-caps: d06's frequent-shingle cap must be observable via
the d06b companion stats, and the cap must actually drop hot shingles
from candidate generation."""

import pandas as pd
from pyspark.sql import functions as F


def test_dropped_shingle_stats_detects_hot_shingle(spark):
    from kblock_spark.queries import _dropped_shingle_stats

    # 6 docs share one identical 3-token shingle; each also carries a
    # unique shingle
    docs = [
        (i, f"hot shared shingle unique{i} tail{i} end{i}") for i in range(6)
    ]
    d = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    r = _dropped_shingle_stats(d, cap=5).collect()[0]
    assert r["max_df"] == 6          # the hot shingle's doc frequency
    assert r["n_dropped"] == 1       # exactly it is over the cap
    assert r["n_shingles"] > 6

    r2 = _dropped_shingle_stats(d, cap=6).collect()[0]
    assert r2["n_dropped"] == 0      # cap raised → nothing dropped


def test_d06b_registered_with_oracle():
    from kblock_spark.queries import REGISTRY

    fn, sql = REGISTRY["d06b_dropped_shingle_stats"]
    assert sql is not None and "n_dropped" in sql
