"""Bloom-filter runtime prefilter (ops/bloom.py).

Covers the three properties that make a runtime filter shippable:
exactness under false positives (a deliberately undersized filter
still yields the exact semi-join), real selectivity (the prefilter
drops most probe rows before the exchange), and codegen residency
(the membership test is a pushed data filter, not a post-shuffle
stage)."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
)


@pytest.fixture(scope="module")
def tables(spark):
    fact = spark.range(20000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(40).select((F.col("id") * 7).alias("dk"))
    return fact, dim


def test_no_false_negatives(spark, tables):
    fact, dim = tables
    words, m, k = build_bloom(dim, "dk")
    probe = dim.select(F.col("dk").alias("k"))
    assert probe.where(~might_contain(F.col("k"), words, m, k)).count() == 0


def test_prefilter_is_selective(spark, tables):
    fact, dim = tables
    words, m, k = build_bloom(dim, "dk")
    n_pre = fact.where(might_contain(F.col("k"), words, m, k)).count()
    n_exact = fact.join(
        dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
    ).count()
    assert n_exact <= n_pre  # FPs only ever add
    # ~40/997 keys survive; the filter should remove the bulk
    assert n_pre < fact.count() * 0.2


@pytest.mark.parametrize("exact", ["broadcast", "shuffle", "auto"])
def test_semi_join_exact_under_any_strategy(spark, tables, exact):
    fact, dim = tables
    got = bloom_semi_join(fact, dim, "k", "dk", exact=exact)
    want = fact.join(
        dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_undersized_filter_still_exact(spark, tables):
    """m = 64 bits for 40 keys x 7 hashes saturates the array (FP
    rate near 1) — the degenerate regime where a buggy composition
    would leak false positives into the output."""
    fact, dim = tables
    words, m, k = build_bloom(dim, "dk", m_bits=64, k=7)
    n_pre = fact.where(might_contain(F.col("k"), words, m, k)).count()
    assert n_pre > fact.count() * 0.5  # saturated, mostly useless
    got = bloom_semi_join(fact, dim, "k", "dk", m_bits=64)
    want = fact.join(
        dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_membership_is_pre_shuffle(spark, tables):
    """The bloom test must sit in the probe-side scan stage (a Filter
    under the join, inside WholeStageCodegen), not after an
    Exchange — otherwise the prefilter saves nothing at scale."""
    fact, dim = tables
    words, m, k = build_bloom(dim, "dk")
    pre = fact.where(might_contain(F.col("k"), words, m, k))
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # filter alone: map-side only
    assert "xxhash64" in plan.lower()


def test_word_array_is_driver_metadata_scale(spark):
    dim = spark.range(100000).select(F.col("id").alias("dk"))
    words, m, k = build_bloom(dim, "dk")
    # 16 bits/key target → m = 2^21 for 1e5 keys → 32k longs = 256 KB
    assert m <= 1 << 21
    assert len(words) == m // 64
