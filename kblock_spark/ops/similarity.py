"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k via a broadcast cross
  join with integer-quantized dot products (the correctness baseline;
  also exposed as the oracle-checked query e01).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic hyperplanes derived from md5 so runs are
  reproducible), candidates = pairs sharing a bucket in ANY of the
  ``n_tables`` hash tables, then exact cosine rank within candidates.
  At 10^12 rows the bucket join replaces the O(N²) cross join; recall
  is tuned by (n_tables, n_bits).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _quantize(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: F.round(x.cast("double") * 1000).cast("bigint"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _cosine(a, b):
    return _dot(a, b).cast("double") / (
        F.sqrt(_dot(a, a).cast("double")) * F.sqrt(_dot(b, b).cast("double"))
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, cosine)."""
    e = emb.select(F.col(id_col).alias("neighbor_id"), _quantize(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), _quantize(vec_col).alias("qv"))
    scored = (
        q.crossJoin(e)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("qv"), F.col("nv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: str = "kblock-lsh") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (md5-seeded), shape
    (n_tables, n_bits, dim)."""
    out = np.empty((n_tables, n_bits, dim))
    for t in range(n_tables):
        for b in range(n_bits):
            h = hashlib.md5(f"{seed}:{t}:{b}".encode()).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            out[t, b] = rng.standard_normal(dim)
    return out


def make_bucket_udf(dim: int, n_tables: int = 8, n_bits: int = 10):
    planes = _hyperplanes(dim, n_tables, n_bits)

    @pandas_udf(ArrayType(LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        out = []
        # signs: (n, n_tables, n_bits)
        proj = np.einsum("nd,tbd->ntb", mat, planes)
        bits = (proj > 0).astype(np.int64)
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        codes = (bits * weights[None, None, :]).sum(axis=2)  # (n, T)
        table_off = (np.arange(n_tables, dtype=np.int64) << np.int64(32))
        for i in range(len(mat)):
            out.append((codes[i] + table_off).tolist())
        return pd.Series(out)

    return buckets


def _unit_projections(dim: int, n_dirs: int, seed: str = "kblock-dup") -> np.ndarray:
    """Deterministic unit directions (md5-seeded), shape (n_dirs, dim)."""
    out = np.empty((n_dirs, dim))
    for i in range(n_dirs):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        v = rng.standard_normal(dim)
        out[i] = v / np.linalg.norm(v)
    return out


def exact_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    dim: int = 64,
    n_dirs: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL pairs with cosine ≥ threshold — EXACT (zero recall loss),
    with no cross join in the plan.

    For unit vectors, cos(a,b) ≥ t ⇒ ‖a−b‖ ≤ w := √(2−2t), and any
    unit-direction projection contracts distances, so qualifying pairs
    differ by ≤ w along EVERY projection. Bucket each row by
    floor(proj₀/w); one side explodes to its bucket ±1 → the equi-join
    on the bucket provably catches every qualifying pair. Two further
    projections prefilter candidates (|Δprojᵢ| ≤ w), then the exact
    integer-quantized cosine decides. Selectivity grows as the
    threshold does (w=0.45 at t=0.9); the plan shape — explode →
    equi-join → filter — is the 10¹²-row shape, unlike the O(N²)
    cross join this replaces (round-1 e02). The reference's analogue
    is the tile-prefiltered overlap self-join (batch_1b:98-100)."""
    w = float(np.sqrt(max(2.0 - 2.0 * threshold, 1e-12)))
    dirs = _unit_projections(dim, n_dirs)
    # quantized values are ±1000 → smallint halves the Arrow bytes the
    # candidate pairs ship to the cosine kernel
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1000).cast("smallint")
    )
    # widen BEFORE multiplying: smallint·smallint would overflow
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(q, q, lambda x, y: x.cast("bigint") * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).cast("double")
    )
    projs = []
    for i in range(n_dirs):
        lit = F.array(*[F.lit(float(x)) for x in dirs[i]])
        p = F.aggregate(
            F.zip_with(q, lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ) / norm
        projs.append(p.alias(f"p{i}"))
    base = emb.select(F.col(id_col).alias("vid"), q.alias("qv"), *projs)
    bucket = F.floor(F.col("p0") / F.lit(w)).cast("long")
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("qv").alias("qa"),
        *[F.col(f"p{i}").alias(f"pa{i}") for i in range(n_dirs)],
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("qv").alias("qb"),
        *[F.col(f"p{i}").alias(f"pb{i}") for i in range(n_dirs)],
        bucket.alias("bucket"),
    )
    cand = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    for i in range(1, n_dirs):
        cand = cand.where(
            F.abs(F.col(f"pa{i}") - F.col(f"pb{i}")) <= F.lit(w)
        )
    # batched numpy cosine (Arrow): ~3× faster than the per-row
    # Catalyst aggregate at millions of candidates, and EXACT — the
    # integer dot products are ≤ 64·10⁶ ≪ 2⁵³, so float64 sums are
    # order-independent and bit-identical to the oracle's
    # list_dot_product arithmetic.
    @pandas_udf("double")
    def cos_udf(qa: pd.Series, qb: pd.Series) -> pd.Series:
        A = np.stack(qa.to_numpy()).astype(np.float64)
        B = np.stack(qb.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        return pd.Series(
            num
            / (np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1)))
        )

    return (
        cand.select(
            "vec_a", "vec_b",
            cos_udf(F.col("qa"), F.col("qb")).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    dim: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means → (k, dim) centroid matrix.

    Spark-shaped iteration: per-partition partial sums inside ONE
    mapInPandas pass (no posexplode of N·dim rows), partials reduced
    driver-side — driver state is O(partitions·k·dim), independent of
    the row count. Deterministic init: the k rows with the smallest
    xxhash64(id) (a TakeOrdered, no full sort)."""
    sc = emb.sparkSession.sparkContext
    init_rows = (
        emb.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in init_rows])
    vecs = emb.select(vec_col)
    for _ in range(iters):
        bc = sc.broadcast(C)

        def partials(batches):
            cen = bc.value
            sums = np.zeros((len(cen), cen.shape[1]))
            counts = np.zeros(len(cen), dtype=np.int64)
            for pdf in batches:
                X = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
                d2 = ((X[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                np.add.at(sums, a, X)
                np.add.at(counts, a, 1)
            out = pd.DataFrame(
                {
                    "cluster": np.arange(len(cen), dtype=np.int32),
                    "sums": [s.tolist() for s in sums],
                    "n": counts,
                }
            )
            yield out[out["n"] >= 0]

        agg = vecs.mapInPandas(
            partials, "cluster int, sums array<double>, n long"
        ).collect()
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for r in agg:
            sums[r["cluster"]] += np.asarray(r["sums"])
            counts[r["cluster"]] += r["n"]
        nz = counts > 0
        C = np.where(nz[:, None], sums / np.maximum(counts, 1)[:, None], C)
    return C


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors live in their nearest-centroid
    inverted list; each query probes its ``nprobe`` nearest lists;
    exact cosine rerank inside the candidates. The coarse quantizer is
    a plain broadcast (k·dim floats); candidates form an equi-join on
    the list id — the second ANN scale path next to lsh_topk."""
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    def lists_udf(n_lists: int):
        @pandas_udf(ArrayType(LongType()))
        def lists(v: pd.Series) -> pd.Series:
            cen = bc.value
            X = np.stack(v.to_numpy()).astype(np.float64)
            d2 = ((X[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1)[:, :n_lists]
            return pd.Series([row.tolist() for row in order])

        return lists

    e = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _quantize(vec_col).alias("nv"),
        F.explode(lists_udf(1)(F.col(vec_col))).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _quantize(vec_col).alias("qv"),
        F.explode(lists_udf(nprobe)(F.col(vec_col))).alias("list_id"),
    )
    cand = (
        q.join(e, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cosine(F.col("qv"), F.col("nv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
    n_tables: int = 8, n_bits: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via LSH bucket candidates + exact rerank."""
    bud = make_bucket_udf(dim, n_tables, n_bits)
    e = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _quantize(vec_col).alias("nv"),
        F.explode(bud(F.col(vec_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _quantize(vec_col).alias("qv"),
        F.explode(bud(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        q.join(e, "bucket", "inner")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cosine(F.col("qv"), F.col("nv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
