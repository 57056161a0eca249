"""Weighted balanced partitioning (the reference's ``weighted_qcut``,
kblock/batch_4_compute_k.py:377-387,508-516): order units by a key,
cumulative-sum their weights, and cut into buckets of ~equal total
weight — the reference uses it to build ~100k-building chunks.

Two scale-safe primitives live here:

- :func:`weighted_buckets` — the relational operator, computed as a
  TWO-PASS prefix sum (range-partition → per-partition partial sums →
  broadcast prefix offsets → local cumsum) instead of one global
  ``Window.orderBy`` whose sort would land the whole table in a single
  task.
- :func:`balanced_assign` — physical placement for per-group Python
  kernels with heavy-tailed group cost: the heavy tail is ranked and
  round-robined across partitions, the light mass is hash-placed, and
  the target partition id is realized EXACTLY through Spark's
  HashPartitioning by mapping each target to a precomputed long token
  whose Murmur3 hash lands on it.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, Window, functions as F


def weighted_buckets(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    n_buckets: int,
    bucket_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """Assign each row a bucket id such that buckets have ~equal total
    weight when rows are taken in ``order_col`` order.

    bucket = floor(n_buckets · (cumsum - w) / total), clamped — the
    same half-open cut points as pd.cut over a cumulative sum
    (batch_4:381-386).

    The cumulative sum is a distributed two-pass prefix sum: ranges of
    ``order_col`` run their window locally, and each range's starting
    offset is the sum of the partial sums before it (a tiny
    per-partition aggregate, broadcast back). No single-partition
    exchange at any size.
    """
    spark = df.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    # the input feeds THREE passes (quantile probe, partial sums, the
    # final windowed plan); materialize it once — without this every
    # pass replays the caller's full upstream pipeline
    df = df.localCheckpoint(eager=False)
    w = F.col(weight_col).cast("decimal(28,4)")
    # deterministic coarse range id from driver-held quantile
    # boundaries (spark_partition_id after repartitionByRange is NOT
    # stable across jobs — its sampled boundaries can differ between
    # the partial-sum job and the final plan)
    probs = [i / parts for i in range(1, parts)]
    bounds = sorted(
        set(df.stat.approxQuantile(order_col, probs, 0.01))
    ) if probs else []
    coarse = F.lit(0)
    for b in bounds:
        coarse = coarse + (F.col(order_col).cast("double") > F.lit(float(b))).cast(
            "int"
        )
    d = df.withColumn("__rid", coarse)
    wloc = (
        Window.partitionBy("__rid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # partial sums come from the PRE-window frame: the per-range total
    # doesn't depend on the cumsum, so this job is a plain map-side
    # combining aggregate — no reliance on Catalyst pruning the unused
    # window (and no per-range sort) in the offsets pass
    partials = (
        d.groupBy("__rid").agg(F.sum(w).alias("__psum")).collect()
    )
    d = d.withColumn("__lcum", F.sum(w).over(wloc))
    psums = {r["__rid"]: r["__psum"] for r in partials}
    if not psums:
        return df.withColumn(bucket_col, F.lit(0))
    total = sum(psums.values())
    offsets = {}
    acc = 0
    for rid in sorted(psums):
        offsets[rid] = acc
        acc += psums[rid]
    off_map = F.create_map(
        *[
            x
            for rid, off in offsets.items()
            for x in (F.lit(rid), F.lit(str(off)))
        ]
    )
    cum = F.element_at(off_map, F.col("__rid")).cast("decimal(28,4)") + F.col(
        "__lcum"
    )
    prev = cum - w
    bucket = F.floor(
        F.lit(n_buckets) * prev.cast("double") / F.lit(float(total))
    ).cast("int")
    return (
        d.withColumn(
            bucket_col,
            F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), bucket)),
        )
        .drop("__rid", "__lcum")
    )


def running_offset(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    out_col: str = "offset",
    partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of integer ``weight_col`` in
    ``order_col`` order (``order_col`` must be unique): row i gets the
    sum of all weights strictly before it — the global token offset a
    sequence-packing planner needs.

    Same distributed two-pass prefix sum as :func:`weighted_buckets`
    (per-range local window + broadcast range offsets; no
    single-partition exchange at any size), but BIGINT-exact: integer
    sums are associative regardless of partitioning, so the result is
    bit-stable under any plan."""
    spark = df.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    # three passes consume the input (quantile, partials, final plan)
    # — materialize once, same as weighted_buckets
    df = df.localCheckpoint(eager=False)
    w = F.col(weight_col).cast("bigint")
    probs = [i / parts for i in range(1, parts)]
    bounds = sorted(
        set(df.stat.approxQuantile(order_col, probs, 0.01))
    ) if probs else []
    coarse = F.lit(0)
    for b in bounds:
        coarse = coarse + (
            F.col(order_col).cast("double") > F.lit(float(b))
        ).cast("int")
    d = df.withColumn("__rid", coarse)
    partials = d.groupBy("__rid").agg(F.sum(w).alias("__psum")).collect()
    offsets = {}
    acc = 0
    for r in sorted(partials, key=lambda r: r["__rid"]):
        offsets[r["__rid"]] = acc
        acc += int(r["__psum"] or 0)
    wloc = (
        Window.partitionBy("__rid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    off_map = F.create_map(
        *[x for rid, off in offsets.items() for x in (F.lit(rid), F.lit(off))]
    )
    cum = F.element_at(off_map, F.col("__rid")).cast("bigint") + F.sum(w).over(
        wloc
    )
    return d.withColumn(out_col, cum - w).drop("__rid")


# ------------------------------------------------ murmur3 token placement

def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def spark_murmur3_long(v: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one LongType value (seed 42) — the
    hash behind both ``F.hash`` and ``HashPartitioning``. Verified
    against ``F.hash`` in tests/test_bucketing.py."""

    def mixk1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = _rotl32(k1, 15)
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mixh1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    v &= 0xFFFFFFFFFFFFFFFF
    h1 = mixh1(seed & 0xFFFFFFFF, mixk1(v & 0xFFFFFFFF))
    h1 = mixh1(h1, mixk1((v >> 32) & 0xFFFFFFFF))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


@lru_cache(maxsize=64)
def partition_tokens(nparts: int) -> tuple[int, ...]:
    """tokens[i] = smallest non-negative long whose Murmur3 hash pmods
    to partition i under HashPartitioning(nparts) — lets a DataFrame
    choose its exact target partition through a plain
    ``repartition(nparts, token_col)``."""
    tokens: list[int | None] = [None] * nparts
    found = 0
    x = 0
    while found < nparts:
        h = spark_murmur3_long(x)
        pid = ((h % nparts) + nparts) % nparts
        if tokens[pid] is None:
            tokens[pid] = x
            found += 1
        x += 1
    return tuple(int(t) for t in tokens)  # type: ignore[arg-type]


def balanced_tokens(
    costs: DataFrame,
    cost_col: str,
    key_col: str,
    nparts: int,
    token_col: str = "__part_token",
) -> DataFrame:
    """(key, token) placement map for heavy-tailed per-group work
    (the distributed form of the reference's weighted_qcut chunking,
    batch_4:508-516).

    Rows with cost ≥ total/(2·nparts) — by construction at most
    2·nparts of them, so the ranking window is bounded, never
    table-sized — are ranked by cost and round-robined across
    partitions (sorted-greedy ≈ LPT). The light mass is hash-placed
    and averages out.

    The cost table is materialized once (localCheckpoint) before the
    three consumers (total, heavy, light) — it is one row per KEY
    (per-group metadata, never per-row data), so this is small at any
    scale, and without it each consumer re-executes the cost
    aggregation over the full input."""
    costs = costs.select(key_col, cost_col).localCheckpoint(eager=True)
    total_row = costs.agg(F.sum(cost_col).alias("__total"))
    d = costs.crossJoin(F.broadcast(total_row))
    thr = F.col("__total") / F.lit(float(2 * nparts))
    heavy = d.where(F.col(cost_col) >= thr)
    light = d.where(F.col(cost_col) < thr)
    wr = Window.orderBy(F.desc(cost_col), key_col)
    heavy = heavy.withColumn(
        "__tgt", ((F.row_number().over(wr) - 1) % nparts).cast("int")
    )
    light = light.withColumn(
        "__tgt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(nparts)).cast("int")
    )
    tokens = partition_tokens(nparts)
    arr = F.array(*[F.lit(t).cast("long") for t in tokens])
    return (
        heavy.unionByName(light)
        .withColumn(token_col, F.element_at(arr, F.col("__tgt") + 1))
        .select(key_col, token_col)
    )


def balanced_assign(
    df: DataFrame,
    cost_col: str,
    key_col: str,
    nparts: int,
    token_col: str = "__part_token",
) -> DataFrame:
    """df repartitioned into exactly ``nparts`` partitions realizing
    the :func:`balanced_tokens` placement (see there for the scheme).
    When the payload rows are expensive to produce, compute the cost
    table separately and join the token map yourself instead."""
    tok = balanced_tokens(
        df.select(key_col, cost_col), cost_col, key_col, nparts, token_col
    )
    return df.join(tok, key_col).repartition(nparts, token_col)
