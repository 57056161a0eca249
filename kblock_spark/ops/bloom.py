"""Bloom-filter runtime prefilter for semi-joins, pure Catalyst.

The pattern Spark's own runtime row-level filtering implements
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, SPARK-32268),
exposed as an explicit operator so the prefilter applies to ANY join
strategy and its selectivity is measurable: build a Bloom filter over
the build side's join keys, drop probe-side rows whose keys cannot be
in the build side BEFORE they reach the exchange, then run the exact
semi-join on the survivors. At 100 TB the probe side (e.g. lineitem)
dominates the shuffle; a few-KB bit array broadcast as a literal
removes ~(1 - selectivity) of it map-side inside whole-stage codegen
— no Python, no extra shuffle, no plan barrier.

False positives only ever ADD candidate rows, and the exact join
removes them, so the composed operator is value-identical to a plain
semi-join — which is what lets the driver hard-oracle it against
``WHERE key IN (SELECT ...)``.

Sizing: m bits for n keys at k hashes gives FP rate
~(1 - e^(-kn/m))^k; the default m = 16·n rounded to a power of two
with k = 7 lands near the optimum (k ≈ m/n·ln2 ≈ 11; 7 keeps the
probe expression short) and stays ≤ a few MB of literal array up to
~10^6 build keys — past that, raise ``m_bits`` explicitly or feed a
pre-deduplicated key set.

Beyond-reference operator: the reference (mansueto-institute/kblock)
has no runtime-filter layer; its joins rely on geopandas sjoin /
pandas merge single-node semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for a key: xxhash64 seeded by
    the probe index via an extra literal column (xxhash64 is a
    multi-arg hash, so (key, i) re-keys the whole digest)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def build_bloom(
    dim: DataFrame, key: str, m_bits: int | None = None, k: int = 7
) -> tuple[list[int], int, int]:
    """Aggregate the build side into a Bloom bit array.

    Each key sets k bits; bits pack into 64-bit words via a
    ``bit_or`` hash aggregate (map-side combined — the exchange
    carries ≤ m_bits/64 word rows no matter how many keys). Only the
    finished word list is collected: driver-metadata scale, m/8
    bytes. Returns (words, m_bits, k) with ``words`` dense, length
    m_bits // 64.
    """
    if m_bits is None:
        n = dim.select(key).distinct().count()
        m_bits = 1 << max(10, (16 * max(n, 1) - 1).bit_length())
    assert m_bits % 64 == 0
    kdf = dim.select(F.col(key).alias("__k")).distinct()
    pos = F.explode(F.array(*_positions(F.col("__k"), m_bits, k))).alias(
        "__p"
    )
    words = (
        kdf.select(pos)
        .select(
            F.expr("__p DIV 64").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))"
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__b)").alias("__bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["__w"]] = r["__bits"]
    return dense, m_bits, k


def might_contain(
    key: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """Membership test as a pure Catalyst expression over a literal
    array — evaluates inside whole-stage codegen on the probe side,
    before any exchange. Positions are non-negative (< 2^53), so
    word index = int(p / 64) exactly; bit index = p & 63 via getbit
    (takes a Column position, unlike the shiftright wrapper).
    element_at is 1-based."""
    arr = F.lit(words)
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, ((p / 64).cast("int") + F.lit(1)))
        cond = cond & (F.getbit(word, p.bitwiseAND(F.lit(63))) == 1)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int | None = None,
    k: int = 7,
    exact: str = "auto",
) -> DataFrame:
    """fact ⋉ dim with a Bloom prefilter ahead of the exact join.

    ``exact``: 'broadcast' hints the dedup'd dim side broadcastable
    (right for selective dims), 'shuffle' forces a shuffled semi-join
    (dim too big to broadcast — the regime where the Bloom prefilter
    pays the most, because it shrinks the fact exchange), 'auto'
    leaves the strategy to Catalyst/AQE. Result is value-identical to
    a plain semi-join in every mode.
    """
    words, m, kk = build_bloom(dim, dim_key, m_bits, k)
    pre = fact.where(might_contain(F.col(fact_key), words, m, kk))
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if exact == "broadcast":
        keys = F.broadcast(keys)
    elif exact == "shuffle":
        keys = keys.hint("shuffle_hash")
    return pre.join(keys, fact_key, "left_semi")
