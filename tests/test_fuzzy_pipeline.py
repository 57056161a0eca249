"""d25 fuzzy corpus pipeline: near-duplicates that EXACT dedup misses
must be collapsed to one cluster keeper before the split rollup."""

import pandas as pd
from pyspark.sql import functions as F

from kblock_spark.queries import (
    d22_corpus_pipeline,
    d25_fuzzy_corpus_pipeline,
)


def _corpus(spark, tmp_path):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"  # ~0.95 sim
    uniq = " ".join(f"zz{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "lang": "en", "text": base, "n_chars": len(base)},
        {"doc_id": 2, "lang": "en", "text": base, "n_chars": len(base)},
        {"doc_id": 3, "lang": "en", "text": near, "n_chars": len(near)},
        {"doc_id": 4, "lang": "en", "text": uniq, "n_chars": len(uniq)},
    ]
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_fuzzy_stage_drops_near_dups_exact_keeps(spark, tmp_path):
    sf = _corpus(spark, tmp_path)
    exact = d22_corpus_pipeline(spark, sf).agg(F.sum("n_docs")).first()[0]
    fuzzy = d25_fuzzy_corpus_pipeline(spark, sf).agg(F.sum("n_docs")).first()[0]
    # exact dedup keeps doc 3 (different md5); fuzzy collapses it
    # into doc 1's cluster -> exactly one fewer survivor
    assert exact == 3
    assert fuzzy == 2
