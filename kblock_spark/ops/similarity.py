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


def _quantized_smallint(vec_col: str):
    """±1000-quantized smallint vector (halves the Arrow bytes shipped
    through the shuffle; cosine over these ints is what the DuckDB
    oracle computes too)."""
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1000).cast("smallint")
    )


def assign_ivf_lists(
    emb: DataFrame,
    threshold: float,
    k_lists: int = 16,
    kmeans_iters: int = 3,
    fit_cap: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Triangle-inequality IVF assignment for the exact ε-join:
    (vid, list_id, is_home, qv).

    Fit ``k_lists`` k-means centroids (on a deterministic hash sample
    of the unit-normalized quantized vectors, capped at ``fit_cap``
    rows so the fit is one bounded pass regardless of N). Each vector
    u is HOME in its nearest centroid's list and REPLICATED to every
    list c with d(u,c) ≤ d(u, c_home) + w, where w = √(2−2t) is the
    distance equivalent of the cosine threshold on unit vectors.

    Exactness: take a qualifying pair ‖x−y‖ ≤ w and WLOG
    d(x,c_x) ≤ d(y,c_y) (home distances). Then
    d(y,c_x) ≤ d(y,x) + d(x,c_x) ≤ w + d(y,c_y), so y is replicated
    into x's home list — every qualifying pair co-occurs in at least
    one list as a (home, replica) row pair. Selectivity adapts to the
    data (tight clusters → few replicas) instead of relying on fixed
    projections, whose buckets round-2 measured as vacuous (all
    vectors in 2 buckets → 100% of pairs became candidates)."""
    w = float(np.sqrt(max(2.0 - 2.0 * threshold, 1e-12)))
    sc = emb.sparkSession.sparkContext
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.xxhash64(id_col).alias("__h"),
        _quantized_smallint(vec_col).alias("qv"),
    )
    # FAISS-style coarse-quantizer training: ONE bounded-size job (each
    # partition keeps only its ≤ per_cap smallest-hash rows — a global
    # TakeOrdered would ship #partitions·fit_cap rows to the driver at
    # cluster scale), then Lloyd's in numpy driver-side. The quantizer
    # is just a partitioner: exactness never depends on its quality,
    # so per-iteration distributed passes would buy nothing.
    # (Normalization happens in numpy: a Catalyst transform(x/norm)
    # re-evaluates the norm aggregate per array element — measured 64×
    # slower than this layout.)
    nparts = max(1, base.rdd.getNumPartitions())
    per_cap = max(1, -(-fit_cap // nparts))

    def sample_part(batches):
        hs = np.empty(0)
        qs = None
        for pdf in batches:
            if not len(pdf):
                continue
            bh = pdf["__h"].to_numpy().astype(np.float64)
            bq = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            if qs is None:
                hs, qs = bh, bq
            else:
                hs = np.concatenate([hs, bh])
                qs = np.vstack([qs, bq])
            if len(hs) > per_cap:
                keep = np.argsort(hs, kind="stable")[:per_cap]
                hs, qs = hs[keep], qs[keep]
        if qs is not None:
            yield pd.DataFrame(
                {"__h": hs, "qv": [q.astype(np.int16) for q in qs]}
            )

    sample = (
        base.select("__h", "qv")
        .mapInPandas(sample_part, "__h double, qv array<smallint>")
        .collect()
    )
    sample = sorted(sample, key=lambda r: r["__h"])[:fit_cap]
    if not sample:
        # empty input: no lists, no rows — callers (e.g.
        # exact_dup_pairs_blocked) get an empty assignment instead of
        # an np.stack crash before k-means init
        return emb.sparkSession.createDataFrame(
            [], "vid long, list_id int, is_home boolean, qv array<smallint>"
        )
    k = max(1, min(k_lists, len(sample)))
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in sample])
    X = Q / np.maximum(np.linalg.norm(Q, axis=1), 1e-12)[:, None]
    C = X[:k].copy()  # init: k smallest-hash rows (deterministic)
    x2 = (X * X).sum(axis=1)
    for _ in range(kmeans_iters):
        # GEMM distance form — no (n, k, dim) temporaries
        d2 = x2[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = d2.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    bc = sc.broadcast(np.ascontiguousarray(C, dtype=np.float64))

    def assign(batches):
        cen = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            U = Q / np.maximum(np.linalg.norm(Q, axis=1), 1e-12)[:, None]
            d = np.sqrt(
                np.maximum(
                    (U * U).sum(axis=1)[:, None]
                    - 2.0 * (U @ cen.T)
                    + (cen * cen).sum(axis=1)[None, :],
                    0.0,
                )
            )
            home = d.argmin(axis=1)
            dn = d[np.arange(len(d)), home]
            # 1e-9 slack: float rounding must only ever ADD a replica
            mask = d <= (dn[:, None] + w + 1e-9)
            ii, ll = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy()[ii],
                    "list_id": ll.astype(np.int32),
                    "is_home": ll == home[ii],
                    "qv": pdf["qv"].to_numpy()[ii],
                }
            )

    return base.select("vid", "qv").mapInPandas(
        assign, "vid long, list_id int, is_home boolean, qv array<smallint>"
    )


# cap on one GEMM tile inside the per-list kernel (elements of the
# (h_tile, r) cosine matrix) — bounds task memory for a giant list
_GEMM_TILE_ELEMS = 4_000_000


def exact_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    k_lists: int = 16,
    home_splits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL pairs with cosine ≥ threshold — EXACT (zero recall loss),
    no join in the plan at all.

    Two stages (see :func:`assign_ivf_lists` for the blocking proof):

    1. triangle-inequality IVF assignment — each vector lands in its
       home list plus the replica lists the proof requires;
    2. per-(list, split) ``applyInPandas`` kernel: a tiled float64
       GEMM scores home×replica inside the list and emits only the
       qualifying pairs. Candidate pairs are never materialized as
       shuffle rows — the shuffle carries O(N·replication) vector
       rows, and the quadratic part runs at BLAS speed inside tasks.

    ``home_splits`` > 1 shards a list's home rows across that many
    tasks (replica rows are duplicated to every shard), bounding the
    single-list straggler at planetary list sizes.

    Scale honesty: at thresholds so low that w approaches the data
    diameter (e.g. t=0.5 on isotropic vectors) every exact method
    degenerates to all-pairs work; this plan then degrades to
    distributed per-list GEMM — the exact-arithmetic lower bound —
    instead of an O(N²) pair shuffle. The integer dot products are
    ≤ 64·10⁶ ≪ 2⁵³, so float64 GEMM sums are order-independent and
    bit-identical to the oracle's list_dot_product arithmetic. The
    reference's analogue discipline is the tile-prefiltered overlap
    self-join (batch_1b_generate_blocks.py:98-100)."""
    assign = assign_ivf_lists(
        emb, threshold, k_lists=k_lists, id_col=id_col, vec_col=vec_col
    )
    S = max(1, int(home_splits))
    if S == 1:
        # fast path: H and R are row slices of ONE grouped list — the
        # assignment subtree is consumed once (no union, one shuffle)
        rows = assign.select(
            "vid", "list_id", "qv",
            F.lit(0).alias("split"), F.col("is_home").alias("home_row"),
        )
    else:
        # shard a list's home rows across S tasks; replica rows (the
        # full list) are duplicated to every shard. Two consumers of
        # the assignment subtree → materialize it once.
        assign = assign.localCheckpoint(eager=False)
        hom = assign.where(F.col("is_home")).select(
            "vid", "list_id", "qv",
            F.pmod(F.xxhash64("vid"), F.lit(S)).cast("int").alias("split"),
            F.lit(True).alias("home_row"),
        )
        rep = assign.select(
            "vid", "list_id", "qv",
            F.explode(F.array(*[F.lit(s) for s in range(S)])).alias("split"),
            F.lit(False).alias("home_row"),
        )
        rows = hom.unionByName(rep)
    thr = float(threshold)

    def emit(key, pdf):
        # H = home rows; R = every row of the (list, split) group —
        # home vectors must be scorable on the right side too (a pair
        # homed in the same list has no separate replica row on the
        # S=1 path). Extra H×H rescoring on the S>1 path just re-emits
        # identical pairs, removed by the dedup below.
        H = pdf[pdf["home_row"]]
        R = pdf
        if not len(H) or not len(R):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        Hq = np.stack(H["qv"].to_numpy()).astype(np.float64)
        Rq = np.stack(R["qv"].to_numpy()).astype(np.float64)
        hv = H["vid"].to_numpy()
        rv = R["vid"].to_numpy()
        nh = np.sqrt((Hq * Hq).sum(axis=1))
        nr = np.sqrt((Rq * Rq).sum(axis=1))
        outs = []
        tile = max(1, _GEMM_TILE_ELEMS // max(len(R), 1))
        for s in range(0, len(H), tile):
            e = min(s + tile, len(H))
            cos = (Hq[s:e] @ Rq.T) / (nh[s:e, None] * nr[None, :])
            m = (cos >= thr) & (hv[s:e, None] != rv[None, :])
            ii, jj = np.nonzero(m)
            if len(ii):
                ha = hv[s:e][ii]
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_a": np.minimum(ha, rv[jj]),
                            "vec_b": np.maximum(ha, rv[jj]),
                            "cosine": cos[ii, jj],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = rows.groupBy("list_id", "split").applyInPandas(
        emit, "vec_a long, vec_b long, cosine double"
    )
    # a pair can surface in ≤2 lists (each member's home); cosine is
    # deterministic float64, so dropDuplicates keeps identical values
    return pairs.dropDuplicates(["vec_a", "vec_b"])


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
    # materialize the projected vectors once — each Lloyd's iteration
    # is a full pass, and without this every pass re-runs the upstream
    # scan/projection
    vecs = emb.select(vec_col).localCheckpoint(eager=False)
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


def save_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Persist an IVF index: the coarse quantizer (tiny parquet of
    centroid rows) + the inverted lists (vectors partitioned BY list
    id). Repeated ANN queries then skip the assignment pass and read
    only the probed lists' partitions — partition pruning does the
    candidate selection at the storage layer."""
    spark = emb.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(C)],
        "list_id int, centroid array<double>",
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/centroids")
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        cen = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ cen.T)
                + (cen * cen).sum(axis=1)[None, :]
            )
            pdf = pdf.copy()
            pdf["list_id"] = d2.argmin(axis=1).astype(np.int32)
            yield pdf

    out = emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, {vec_col} array<double>, list_id int"
    )
    # Cluster by list id before the partitioned write: writing from
    # the source partitioning emits up to (#partitions × #lists)
    # files — the classic small-files problem (1000 executors × 1024
    # lists would be a million footers to open per probe). One
    # shuffle keyed on list_id makes each list a handful of full
    # files instead; at planetary list sizes raise the partition
    # count (hash on list_id still co-locates each list's rows).
    out.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")


def load_ivf_index(spark, path: str):
    """→ (centroids ndarray, lists DataFrame). The lists DataFrame is
    hive-partitioned by list_id: a ``.where(list_id IN probes)``
    prunes to the probed partitions at scan time."""
    rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    C = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    return C, spark.read.parquet(f"{path}/lists")


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN over a persisted index: probe partitions by list id (scan
    prunes to them), exact cosine rerank — same semantics as
    :func:`ivf_topk` built fresh."""
    C, lists = load_ivf_index(spark, path)
    bc = spark.sparkContext.broadcast(C)

    def probes_udf(n_lists: int):
        @pandas_udf(ArrayType(LongType()))
        def probes(v: pd.Series) -> pd.Series:
            cen = bc.value
            X = np.stack(v.to_numpy()).astype(np.float64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ cen.T)
                + (cen * cen).sum(axis=1)[None, :]
            )
            order = np.argsort(d2, axis=1)[:, :n_lists]
            return pd.Series([row.tolist() for row in order])

        return probes

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _quantize(vec_col).alias("qv"),
        F.explode(probes_udf(nprobe)(F.col(vec_col))).alias("list_id"),
    )
    # Collect the distinct probed list ids (≤ k_lists values — one
    # tiny job over the query table) and push them as a STATIC filter:
    # the hive-partitioned lists scan then prunes to exactly the
    # probed partitions at planning time (PartitionFilters in the scan
    # node — asserted by test_ivf_index_scan_prunes_partitions), with
    # no reliance on runtime DPP kicking in.
    q = q.localCheckpoint(eager=False)
    probe_ids = sorted(r["list_id"] for r in q.select("list_id").distinct().collect())
    e = lists.where(F.col("list_id").isin(probe_ids)).select(
        F.col(id_col).alias("neighbor_id"),
        _quantize(vec_col).alias("nv"),
        F.col("list_id").cast("long").alias("list_id"),
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


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    fit_cap: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks → (m, ksub, dsub).

    The vector space is cut into ``m`` subspaces of dim/m dims; each
    gets its own ``ksub``-centroid k-means codebook, fit driver-side
    on a deterministic bounded sample (the ``fit_cap`` smallest-hash
    rows — a TakeOrderedAndProject, no full sort; same FAISS-style
    training discipline as :func:`assign_ivf_lists`). Vectors are
    unit-normalized BEFORE splitting so the ADC inner product of
    :func:`pq_topk` approximates cosine directly. Deterministic by
    construction: fixed sample, fixed order, fixed init (first ksub
    sample rows per subspace) — the codebooks never depend on
    partition layout."""
    sample = (
        emb.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(fit_cap)
        .collect()
    )
    if not sample:
        raise ValueError("pq_fit: empty embedding table")
    # dim read off the sample rows — a separate size() probe job was
    # a full extra action for one scalar
    dim = len(sample[0][vec_col])
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    X /= np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
    k = max(1, min(ksub, len(X)))
    books = np.empty((m, k, dsub))
    for s in range(m):
        Xs = np.ascontiguousarray(X[:, s * dsub : (s + 1) * dsub])
        C = Xs[:k].copy()
        x2 = (Xs * Xs).sum(axis=1)
        for _ in range(iters):
            d2 = x2[:, None] - 2.0 * (Xs @ C.T) + (C * C).sum(axis=1)[None, :]
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = Xs[mask].mean(axis=0)
        books[s] = C
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its per-subspace nearest-codeword ids →
    (vec_id, code array<smallint>). One Arrow-batched map pass, no
    shuffle: at dim=64/m=8 the code is 16 bytes against 256 bytes of
    float32 — the 16× memory compression is what makes a 100 TB
    embedding corpus scannable from RAM-resident codes."""
    spark = emb.sparkSession
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    bc = spark.sparkContext.broadcast(books)

    def encode(batches):
        B = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
            codes = np.empty((len(X), m), dtype=np.int16)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                C = B[s]
                d2 = (
                    (Xs * Xs).sum(axis=1)[:, None]
                    - 2.0 * (Xs @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                codes[:, s] = d2.argmin(axis=1).astype(np.int16)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "code": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, code array<smallint>"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank_mult: int = 0,
    emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k — the compressed-domain ANN scale
    path next to :func:`lsh_topk` / :func:`ivf_topk`.

    Each query precomputes an (m, ksub) lookup table of subspace inner
    products against the codebooks; the corpus scan is then pure
    integer-indexed LUT adds over the 16-byte codes — no decode, no
    join, no shuffle of vector data. Every partition emits only its
    LOCAL top-k per query (scores are per-row deterministic, so the
    partial top-k is partition-invariant), and the global rank is a
    window over the #partitions·Q·k survivors.

    ``rerank_mult`` > 0 turns on exact refinement: the top k·mult ADC
    candidates join back to the full-precision vectors (``emb``) for
    an exact integer-quantized cosine, repairing quantization error
    the same way FAISS's IndexRefineFlat does. Returns
    (query_id, neighbor_id, rank, adc[, cosine])."""
    spark = codes.sparkSession
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    qrows = queries.select(id_col, vec_col).collect()  # query-set-sized
    qrows.sort(key=lambda r: r[id_col])
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, adc double"
        )
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    Q /= np.maximum(np.linalg.norm(Q, axis=1), 1e-12)[:, None]
    # LUT[q, s, c] = <query subvector s, codeword c> — ADC score is
    # the sum over s, an approximation of cos(query, vector)
    lut = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), m, dsub), books)
    bc = spark.sparkContext.broadcast((q_ids, np.ascontiguousarray(lut)))
    n_keep = k * rerank_mult if rerank_mult > 0 else k

    def scan(batches):
        ids_, L = bc.value
        nq = len(ids_)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["code"].to_numpy()).astype(np.int64)  # (n, m)
            nids = pdf[id_col].to_numpy()
            scores = np.zeros((nq, len(C)))
            for s in range(m):
                scores += L[:, s, :][:, C[:, s]]
            # self-match → -inf BEFORE the cut: excluding it after
            # truncation would cost the batch holding the query row
            # one real candidate, making the result depend on which
            # partition the query landed in
            scores[ids_[:, None] == nids[None, :]] = -np.inf
            # local top-n_keep per query, ties → smaller neighbor id
            keep = min(n_keep, len(C))
            order = np.lexsort((nids[None, :].repeat(nq, 0), -scores), axis=1)[
                :, :keep
            ]
            qq = np.repeat(ids_, keep)
            nn = nids[order].ravel()
            ss = np.take_along_axis(scores, order, axis=1).ravel()
            sel = np.isfinite(ss)
            yield pd.DataFrame(
                {"query_id": qq[sel], "neighbor_id": nn[sel], "adc": ss[sel]}
            )

    cand = codes.mapInPandas(scan, "query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    if rerank_mult <= 0:
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
    if emb is None:
        raise ValueError("pq_topk: rerank_mult > 0 requires emb")
    short = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= n_keep
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _quantize(vec_col).alias("qv")
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), _quantize(vec_col).alias("nv")
    )
    rescored = (
        short.select("query_id", "neighbor_id", "adc")
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc",
            _cosine(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def save_ivfpq_index(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Persist an IVF-PQ index (the FAISS production architecture,
    composing :func:`save_ivf_index`'s partition-pruned inverted lists
    with :func:`pq_encode`'s compressed codes): each vector stores
    only its list id and its ≤32-byte PQ code, hive-partitioned by
    list id. A probed ANN query then reads a few PRUNED partitions of
    COMPRESSED codes — both the scan surface and the bytes-per-row
    shrink, which is what makes trillion-vector serving storable.
    Codes quantize the unit-normalized vector itself (FAISS
    ``by_residual=False``); coarse assignment uses the raw vector,
    matching the probe side."""
    spark = emb.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    # one metadata table for centroids AND codebooks (kind 0/1): both
    # are driver-held kilobyte tables, so two separate parquet writes
    # (and two collect jobs on the read side) were pure job overhead
    meta = [(0, i, 0, row.tolist()) for i, row in enumerate(C)] + [
        (1, s, c, books[s, c].tolist())
        for s in range(m)
        for c in range(ksub)
    ]
    spark.createDataFrame(
        meta, "kind int, i int, j int, vec array<double>"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/meta")
    bc = spark.sparkContext.broadcast((C, books))

    def assign_encode(batches):
        cen, B = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ cen.T)
                + (cen * cen).sum(axis=1)[None, :]
            )
            lid = d2.argmin(axis=1).astype(np.int32)
            U = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
            codes = np.empty((len(U), m), dtype=np.int16)
            for s in range(m):
                Us = U[:, s * dsub : (s + 1) * dsub]
                Cs = B[s]
                dd = (
                    (Us * Us).sum(axis=1)[:, None]
                    - 2.0 * (Us @ Cs.T)
                    + (Cs * Cs).sum(axis=1)[None, :]
                )
                codes[:, s] = dd.argmin(axis=1).astype(np.int16)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "code": list(codes),
                    "list_id": lid,
                }
            )

    out = emb.select(id_col, vec_col).mapInPandas(
        assign_encode, f"{id_col} long, code array<smallint>, list_id int"
    )
    # cluster before the partitioned write (see save_ivf_index)
    out.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")


def ivfpq_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    rerank_mult: int = 4,
    emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN over a persisted IVF-PQ index: each query probes its
    ``nprobe`` nearest coarse lists; the scan reads ONLY the probed
    hive partitions (static ``list_id IN`` pushed to planning time,
    same discipline as :func:`ivf_topk_from_index`) and scores codes
    by ADC LUT adds; candidacy is PER QUERY (a code row counts for a
    query only if its list is in that query's probe set — batch
    amortization must not silently widen a query's candidate pool);
    exact rerank of the k·rerank_mult shortlist against the
    full-precision vectors repairs quantization error."""
    mrows = spark.read.parquet(f"{path}/meta").collect()  # kB-scale
    crows = sorted((r for r in mrows if r["kind"] == 0), key=lambda r: r["i"])
    C = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in crows])
    brows = [r for r in mrows if r["kind"] == 1]
    m = max(r["i"] for r in brows) + 1
    ksub = max(r["j"] for r in brows) + 1
    dsub = len(brows[0]["vec"])
    books = np.empty((m, ksub, dsub))
    for r in brows:
        books[r["i"], r["j"]] = np.asarray(r["vec"], dtype=np.float64)
    qrows = queries.select(id_col, vec_col).collect()  # query-set-sized
    qrows.sort(key=lambda r: r[id_col])
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, adc double"
        )
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        - 2.0 * (Q @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    probes = np.argsort(d2, axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_ids = sorted({int(x) for x in probes.ravel()})
    U = Q / np.maximum(np.linalg.norm(Q, axis=1), 1e-12)[:, None]
    lut = np.einsum("qsd,scd->qsc", U.reshape(len(U), m, dsub), books)
    bc = spark.sparkContext.broadcast(
        (q_ids, np.ascontiguousarray(lut), probes)
    )
    n_keep = k * rerank_mult if rerank_mult > 0 else k
    lists = spark.read.parquet(f"{path}/lists").where(
        F.col("list_id").isin(probe_ids)
    )

    def scan(batches):
        ids_, L, pr = bc.value
        nq = len(ids_)
        for pdf in batches:
            if not len(pdf):
                continue
            Cc = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            nids = pdf[id_col].to_numpy()
            lids = pdf["list_id"].to_numpy()
            scores = np.zeros((nq, len(Cc)))
            for s in range(L.shape[1]):
                scores += L[:, s, :][:, Cc[:, s]]
            for qi in range(nq):  # per-query probe-set candidacy
                scores[qi, ~np.isin(lids, pr[qi])] = -np.inf
            scores[ids_[:, None] == nids[None, :]] = -np.inf
            keep = min(n_keep, len(Cc))
            order = np.lexsort((nids[None, :].repeat(nq, 0), -scores), axis=1)[
                :, :keep
            ]
            qq = np.repeat(ids_, keep)
            nn = nids[order].ravel()
            ss = np.take_along_axis(scores, order, axis=1).ravel()
            sel = np.isfinite(ss)
            yield pd.DataFrame(
                {"query_id": qq[sel], "neighbor_id": nn[sel], "adc": ss[sel]}
            )

    cand = lists.select(id_col, "code", "list_id").mapInPandas(
        scan, "query_id long, neighbor_id long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    short = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= n_keep
    )
    if rerank_mult <= 0 or emb is None:
        return short.where(F.col("rank") <= k)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _quantize(vec_col).alias("qv")
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), _quantize(vec_col).alias("nv")
    )
    rescored = (
        short.select("query_id", "neighbor_id", "adc")
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc",
            _cosine(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "qv",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-space benchmark decontamination (d16's semantic
    sibling; the reference has no analogue — SURVEY training-data
    additions): flag corpus vectors whose cosine against ANY
    benchmark vector reaches ``threshold``.

    Inputs carry integer-quantized vectors (``_quantize``) so the
    dot products are integer-exact; cosines use the same
    dot / (sqrt(aa)·sqrt(bb)) association as e01's oracle, making the
    floats bit-identical across numpy / Catalyst / DuckDB.

    Scale shape: the benchmark suite is the small side by definition
    (10³–10⁶ vectors — an eval set, not a corpus), so it ships ONCE
    per worker as a python broadcast matrix and the corpus maps
    through one Arrow-batched GEMM pass: no shuffle, no join, corpus
    vectors never leave their partitions. Returns only contaminated
    rows: (vec_id, n_hits, top_benchmark_id, max_cosine).
    """
    spark = corpus.sparkSession
    out_schema = (
        "vec_id long, n_hits long, top_benchmark_id long, max_cosine double"
    )
    rows = benchmark.select("vec_id", vec_col).collect()  # benchmark-sized
    if not rows:
        # empty benchmark: nothing can be contaminated (and np.array of
        # zero vectors has the wrong ndim for the GEMM)
        return spark.createDataFrame([], out_schema)
    rows.sort(key=lambda r: r["vec_id"])
    b_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    B = np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
    b_norm = np.sqrt((B * B).sum(axis=1).astype(np.float64))
    bc = spark.sparkContext.broadcast((b_ids, B, b_norm))
    thr = float(threshold)

    def run(batches):
        ids_, B_, bn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.int64)
            dots = (X @ B_.T).astype(np.float64)  # int64-exact, < 2^53
            xn = np.sqrt((X * X).sum(axis=1).astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (xn[:, None] * bn[None, :])
            n_hits = (cos >= thr).sum(axis=1)
            keep = n_hits > 0
            if not keep.any():
                continue
            # argmax returns the FIRST max; rows of B are sorted by
            # benchmark id, so ties break to the smallest id — the
            # oracle's (cos DESC, bid ASC) row_number order
            top_idx = np.argmax(cos[keep], axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "n_hits": n_hits[keep].astype(np.int64),
                    "top_benchmark_id": ids_[top_idx],
                    "max_cosine": cos[keep][
                        np.arange(int(keep.sum())), top_idx
                    ],
                }
            )

    return corpus.select("vec_id", vec_col).mapInPandas(run, out_schema)


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "qv",
    id_col: str = "vec_id",
) -> DataFrame:
    """EXACT maximum-inner-product top-k (MIPS) — the retrieval
    scoring of dot-product recommender / dual-encoder models. Unlike
    cosine, inner product is not a metric (no triangle inequality),
    so e02's IVF blocking proof does not apply; the textbook
    reduction augments vectors by their norm deficit to turn MIPS
    into NN search, but for EXACT top-k the one-pass blocked GEMM
    with per-partition pruning is both simpler and shuffle-free:

      the query matrix (the small side by definition) broadcasts
      once per worker; each corpus partition computes its dot block
      and emits only its LOCAL top-k per query under the total order
      (dot DESC, id ASC) — the global top-k is a subset of the union
      of local top-k's under the same order, so one bounded window
      over #partitions * nq * k candidate rows finishes exactly.
      Corpus vectors never leave their partitions; the only shuffle
      moves candidate triples.

    Inputs carry integer-quantized vectors (int64 GEMM is exact
    below 2^53), so ``dot`` is a BIGINT and the result hashes
    engine-identically. A corpus row with the same id as a query is
    masked BEFORE local truncation (the e09 lesson: masking after
    would make the result depend on which partition holds it).
    Returns (query_id, neighbor_id, rank, dot)."""
    spark = corpus.sparkSession
    out_schema = "query_id long, neighbor_id long, dot long"
    rows = queries.select(id_col, vec_col).collect()  # query-set-sized
    if not rows:
        return spark.createDataFrame([], out_schema + ", rank int").select(
            "query_id", "neighbor_id", "rank", "dot"
        )
    rows.sort(key=lambda r: r[id_col])
    q_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((q_ids, Q))
    kk = int(k)

    def run(batches):
        ids_, Q_ = bc.value
        nq = len(ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["__cid"].to_numpy()
            X = np.array(pdf["__cvec"].tolist(), dtype=np.int64)
            dots = X @ Q_.T  # (batch, nq) int64-exact
            # self-mask before truncation: a corpus row that IS the
            # query can never be its own neighbor. The mask must push
            # the self row to the END of the local order (NOT occupy a
            # top-k slot), so the sort key — not the dot — is masked:
            # negating an int64.min-masked dot would overflow back to
            # int64.min and sort the self row FIRST, silently evicting
            # a true global top-k candidate from this partition.
            self_m = cids[:, None] == ids_[None, :]
            sortkey = -dots  # dot DESC == -dot ASC; |dot| << 2^53
            if self_m.any():
                sortkey[self_m] = np.iinfo(np.int64).max
            top = min(kk, len(cids))
            # per query column: local top-k by (dot DESC, id ASC)
            order = np.lexsort(
                (cids[:, None].repeat(nq, 1), sortkey), axis=0
            )
            sel = order[:top, :]  # (top, nq) row indices per query
            qcol = np.tile(ids_, top)
            rows_ = sel.ravel()
            cols_ = np.tile(np.arange(nq), top)
            keep = ~self_m[rows_, cols_]
            d = dots[rows_, cols_]
            yield pd.DataFrame(
                {
                    "query_id": qcol[keep],
                    "neighbor_id": cids[rows_][keep],
                    "dot": d[keep],
                }
            )

    cand = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    ).mapInPandas(run, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "rank", "dot")
    )
