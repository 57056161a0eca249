"""d17 corpus-level exact segment dedup (the C4/RefinedWeb
repeated-lines pass): first corpus occurrence of each 3-token segment
is kept, later exact repeats are dropped, documents are re-assembled
from their survivors."""

from pyspark.sql import functions as F

from kblock_spark.queries import _SEG_S, d17_segment_dedup


def _corpus(spark, tmp_path):
    rows = [
        # doc 0: two distinct segments (6 tokens)
        (0, "alpha beta gamma delta epsilon zeta"),
        # doc 1: exact copy of doc 0 -> every segment drops
        (1, "alpha beta gamma delta epsilon zeta"),
        # doc 2: one segment shared with doc 0, one new
        (2, "alpha beta gamma nu xi omicron"),
        # doc 3: unique, ragged tail (4 tokens -> segments of 3 + 1)
        (3, "pi rho sigma tau"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_first_occurrence_keep_semantics(spark, tmp_path):
    assert _SEG_S == 3  # the fixture's token counts assume this
    sf = _corpus(spark, tmp_path)
    got = {r["doc_id"]: r for r in d17_segment_dedup(spark, sf).collect()}
    assert set(got) == {0, 1, 2, 3}
    # doc 0 is first for all of its segments
    assert (got[0]["n_segments"], got[0]["n_kept"]) == (2, 2)
    # doc 1 duplicates doc 0 entirely
    assert (got[1]["n_segments"], got[1]["n_kept"]) == (2, 0)
    # doc 2 shares its first segment with doc 0, keeps the second
    assert (got[2]["n_segments"], got[2]["n_kept"]) == (2, 1)
    # doc 3 unique; ragged tail still forms a segment
    assert (got[3]["n_segments"], got[3]["n_kept"]) == (2, 2)
    # clean_fp: fully-dropped doc hashes the empty string, identical
    # docs diverge after dedup (doc 1 lost everything doc 0 kept)
    assert got[1]["clean_fp"] != got[0]["clean_fp"]


def test_dedup_is_idempotent_on_clean_corpus(spark, tmp_path):
    """A corpus with no cross-doc repeats keeps every segment."""
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(9))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = d17_segment_dedup(spark, str(tmp_path))
    assert out.where(F.col("n_kept") != F.col("n_segments")).count() == 0


def test_packed_key_bound_is_enforced(spark, tmp_path):
    """doc_id >= 2^41 would overflow the (doc_id, seg_id) packed
    BIGINT and silently select a wrong keeper — it must raise."""
    import pytest

    rows = [(1 << 41, "alpha beta gamma"), (0, "alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(Exception, match="(?i)overflow|assert"):
        d17_segment_dedup(spark, str(tmp_path)).collect()
