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


def test_d13_chunking_multi_chunk_overlap(spark):
    """A 250-token doc must yield ceil((250-20)/80)=3 chunks of sizes
    100/100/90 with a 20-token overlap; a 5-token doc yields 1 chunk.
    (At sf0.01 every synthetic doc fits one window, so this guards the
    multi-chunk path the fixture doesn't exercise.)"""
    import pandas as pd

    from kblock_spark.queries import d13_token_chunking

    long_doc = " ".join(f"w{i}" for i in range(250))
    docs = pd.DataFrame({"doc_id": [0, 1], "text": [long_doc, "a b c d e"]})

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).write.parquet(f"{td}/documents.parquet")
        out = d13_token_chunking(spark, td).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_chunk_tokens"]))
    assert sorted(by_doc[0]) == [(0, 100), (1, 100), (2, 90)]
    assert sorted(by_doc[1]) == [(0, 5)]
