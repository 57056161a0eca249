"""d21 cross-corpus boilerplate removal (the CCNet/RefinedWeb
frequent-lines pass): a segment appearing in >= _BOILER_DF distinct
documents is removed from EVERY document — including the first
occurrence, which d17's first-keep dedup would preserve. Document
frequency counts documents, not occurrences."""

from pyspark.sql import functions as F

from kblock_spark.queries import (
    _BOILER_DF,
    _SEG_S,
    d17_segment_dedup,
    d21_boilerplate_removal,
)


def _corpus(spark, tmp_path):
    rows = [
        # "the cookie banner" appears in docs 0,1,2 -> df=3 = boilerplate
        (0, "the cookie banner alpha beta gamma"),
        (1, "the cookie banner delta epsilon zeta"),
        (2, "the cookie banner eta theta iota"),
        # "rare shared phrase" in docs 3,4 only -> df=2, kept everywhere
        (3, "rare shared phrase kappa lambda mu"),
        (4, "rare shared phrase nu xi omicron"),
        # doc 5 repeats the banner TWICE inside itself but is the only
        # other doc pair: within-doc repeats must not inflate df
        (5, "unique pi rho unique pi rho sigma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_boilerplate_df_threshold(spark, tmp_path):
    assert _SEG_S == 3 and _BOILER_DF == 3  # fixture assumes these
    sf = _corpus(spark, tmp_path)
    got = {r["doc_id"]: r for r in d21_boilerplate_removal(spark, sf).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    # the banner segment (df=3) is removed from ALL THREE docs,
    # including doc 0's first occurrence
    for d in (0, 1, 2):
        assert (got[d]["n_segments"], got[d]["n_boiler"]) == (2, 1), d
    # df=2 segments stay (below the boilerplate threshold)
    for d in (3, 4):
        assert (got[d]["n_segments"], got[d]["n_boiler"]) == (2, 0), d
    # doc 5: "unique pi rho" occurs twice within one doc -> df=1, kept
    assert (got[5]["n_segments"], got[5]["n_boiler"]) == (3, 0)


def test_differs_from_first_keep_dedup(spark, tmp_path):
    """d17 keeps doc 0's banner (first occurrence); d21 removes it —
    the two passes disagree exactly on the first copy of boilerplate."""
    sf = _corpus(spark, tmp_path)
    d17 = {r["doc_id"]: r for r in d17_segment_dedup(spark, sf).collect()}
    d21 = {r["doc_id"]: r for r in d21_boilerplate_removal(spark, sf).collect()}
    # d17: doc 0 keeps both segments; d21: doc 0 loses the banner
    assert d17[0]["n_kept"] == 2
    assert d21[0]["n_boiler"] == 1
    assert d17[0]["clean_fp"] != d21[0]["clean_fp"]


def test_clean_corpus_untouched(spark, tmp_path):
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(9))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = d21_boilerplate_removal(spark, str(tmp_path))
    assert out.where(F.col("n_boiler") != 0).count() == 0
