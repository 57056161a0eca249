"""ANN: LSH-bucketed top-k vs exact brute force (recall check)."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.similarity import brute_force_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.where(F.col("vec_id") < 30)
    exact = brute_force_topk(emb, queries, k=5)
    # the synthetic embeddings are weakly clustered (exact top-5
    # cosine ≈ 0.26-0.45), so use few bits / many tables; strongly
    # clustered real corpora take more bits (smaller buckets)
    approx = lsh_topk(emb, queries, k=5, dim=64, n_tables=16, n_bits=4)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"
    # every returned neighbor's cosine must equal the exact cosine
    # (rerank is exact; only candidate coverage is approximate)
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine"] == pytest.approx(exact_scores[key], abs=0)


def test_lsh_deterministic(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    a = {(r["query_id"], r["neighbor_id"], r["rank"])
         for r in lsh_topk(emb, queries, k=3).collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rank"])
         for r in lsh_topk(emb, queries, k=3).collect()}
    assert a == b


def test_ivf_recall_on_clustered_data(spark):
    """IVF = distributed k-means coarse quantizer + probed inverted
    lists + exact rerank. On genuinely clustered data (the regime IVF
    targets) recall should be near-perfect with nprobe=2."""
    import numpy as np
    import pandas as pd

    from kblock_spark.ops.similarity import ivf_topk, kmeans_fit

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((6, 16)) * 5
    rows = []
    vid = 0
    for c in range(6):
        for _ in range(60):
            rows.append((vid, (centers[c] + rng.standard_normal(16) * 0.3).tolist()))
            vid += 1
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).cache()
    C = kmeans_fit(emb, k=6, dim=16, iters=4)
    assert C.shape == (6, 16)
    queries = emb.where(F.col("vec_id") % 30 == 0)
    approx = ivf_topk(emb, queries, C, k=5, nprobe=2)
    from kblock_spark.ops.similarity import brute_force_topk

    exact = brute_force_topk(emb, queries, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, f"IVF recall {recall:.2f}"


def test_kmeans_deterministic(spark):
    import numpy as np

    from kblock_spark.ops.similarity import kmeans_fit

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = kmeans_fit(emb, k=4, dim=64, iters=3)
    c2 = kmeans_fit(emb, k=4, dim=64, iters=3)
    assert np.array_equal(c1, c2)


def test_e02_ivf_blocking_actually_prunes(spark):
    """Round-2 regression: the projection buckets put 100% of all
    pairs into the candidate set at BOTH t=0.5 and t=0.9. The IVF
    triangle-inequality blocking must do real pruning on clustered
    data: GEMM work Σ_l h_l·r_l < 20% of N² at t=0.9 — while staying
    EXACT vs the brute-force pair set."""
    import numpy as np
    import pandas as pd

    from kblock_spark.ops.similarity import (
        assign_ivf_lists,
        exact_dup_pairs_blocked,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((12, 32))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    vid = 0
    for c in range(12):
        for _ in range(100):
            v = centers[c] + rng.standard_normal(32) * 0.08
            rows.append((vid, v.tolist()))
            vid += 1
    n = vid
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).cache()

    thr = 0.9
    assign = assign_ivf_lists(emb, thr, k_lists=16)
    per = (
        assign.groupBy("list_id")
        .agg(
            F.sum(F.when(F.col("is_home"), 1).otherwise(0)).alias("h"),
            F.count("*").alias("r"),
        )
        .collect()
    )
    work = sum(r["h"] * r["r"] for r in per)
    assert work < 0.2 * n * n, f"candidate work {work} ≥ 20% of {n*n}"

    # exactness on the same fixture (including home_splits sharding)
    q = np.round(np.array([r[1] for r in rows]) * 1000)
    nrm = np.linalg.norm(q, axis=1)
    C = (q @ q.T) / np.outer(nrm, nrm)
    want = {
        (i, j) for i in range(n) for j in range(i + 1, n) if C[i, j] >= thr
    }
    assert len(want) > 100  # non-vacuous fixture
    for splits in (1, 3):
        got = {
            (r["vec_a"], r["vec_b"])
            for r in exact_dup_pairs_blocked(
                emb, thr, k_lists=16, home_splits=splits
            ).collect()
        }
        assert got == want, f"splits={splits}: {len(got ^ want)} diffs"


def test_ivf_index_persistence_roundtrip(spark, emb, tmp_path):
    """Persisted IVF index: rebuild-free ANN must return EXACTLY what
    the freshly-built ivf_topk returns, and the lists layout must be
    hive-partitioned by list id (partition pruning = candidate
    selection at the storage layer)."""
    import glob

    from kblock_spark.ops.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        kmeans_fit,
        load_ivf_index,
        save_ivf_index,
    )

    C = kmeans_fit(emb, k=4, dim=64, iters=3)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, C, path)
    assert glob.glob(f"{path}/lists/list_id=*"), "expected hive partitions"

    C2, lists = load_ivf_index(spark, path)
    import numpy as np

    assert np.array_equal(C, C2)
    assert lists.count() == emb.count()

    queries = emb.where(F.col("vec_id") < 10)
    fresh = ivf_topk(emb, queries, C, k=5, nprobe=2)
    from_idx = ivf_topk_from_index(spark, path, queries, k=5, nprobe=2)
    a = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in fresh.collect()}
    b = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in from_idx.collect()}
    assert a == b and len(a) == 50


def test_ivf_index_scan_prunes_partitions(spark, emb, tmp_path):
    """The probed read must do candidate selection AT THE STORAGE
    LAYER: the inverted-lists scan node carries a static list_id
    PartitionFilter (probed ids collected and pushed as IN), so at
    100 TB only nprobe/k_lists of the index is ever read — not pruned
    at runtime by luck, pruned at planning time by construction."""
    from kblock_spark.ops.similarity import (
        ivf_topk_from_index,
        kmeans_fit,
        save_ivf_index,
    )

    C = kmeans_fit(emb, k=8, dim=64, iters=3)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, C, path)
    queries = emb.where(F.col("vec_id") < 5)
    df = ivf_topk_from_index(spark, path, queries, k=5, nprobe=2)

    plan = df._jdf.queryExecution().executedPlan().toString()
    # identify the inverted-lists scan by its partition filter (the
    # Location field is truncated for long paths); the only other
    # file scan (the corpus parquet) has empty PartitionFilters
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "PartitionFilters: [list_id" in ln
    ]
    assert scan_lines, (
        "no scan with a list_id PartitionFilter — probed read not "
        f"pruning at planning time:\n{plan[:2000]}"
    )
    assert " IN (" in scan_lines[0].split("PartitionFilters: [")[1].split("]")[0]


def test_exact_dup_pairs_empty_input(spark):
    """An empty embeddings table must yield an empty pair set — not an
    np.stack crash before k-means init (assign_ivf_lists early-returns
    an empty assignment)."""
    from kblock_spark.ops.similarity import exact_dup_pairs_blocked

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert exact_dup_pairs_blocked(empty, threshold=0.5).count() == 0


def test_semantic_decontaminate_empty_benchmark(spark):
    """An empty benchmark set flags nothing (and must not crash the
    broadcast-GEMM path on a zero-row matrix)."""
    from pyspark.sql import functions as F

    from kblock_spark.ops.similarity import _quantize, semantic_decontaminate

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", _quantize("embedding").alias("qv")
    )
    out = semantic_decontaminate(e, e.where(F.lit(False)), threshold=0.4)
    assert out.count() == 0
    assert out.columns == ["vec_id", "n_hits", "top_benchmark_id", "max_cosine"]


def test_pq_recall_and_exact_rerank(spark, emb):
    """PQ ADC shortlist + exact rerank: decent recall on the weakly
    clustered synthetic vectors, and every returned cosine must equal
    the brute-force exact cosine (rerank repairs scores, coverage is
    the only approximation)."""
    import numpy as np

    from kblock_spark.ops.similarity import pq_encode, pq_fit, pq_topk

    queries = emb.where(F.col("vec_id") < 30)
    exact = brute_force_topk(emb, queries, k=5)
    C = np.round(pq_fit(emb, m=16, ksub=32, iters=4), 6)
    codes = pq_encode(emb, C).cache()
    approx = pq_topk(codes, queries, C, k=5, rerank_mult=4, emb=emb)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap_rows = approx.collect()
    ap = {(r["query_id"], r["neighbor_id"]) for r in ap_rows}
    recall = len(ex & ap) / len(ex)
    # measured 0.82 at these settings; 0.6 leaves margin for the
    # near-random synthetic vectors (exact top-5 cosine ~0.26-0.45)
    assert recall >= 0.6, f"PQ recall {recall:.2f} too low"
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    for r in ap_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine"] == pytest.approx(exact_scores[key], abs=0)


def test_pq_partition_invariant(spark, emb):
    """The per-partition partial top-k must not leak partition layout:
    1 partition and 7 partitions give identical (query, neighbor,
    rank) sets."""
    import numpy as np

    from kblock_spark.ops.similarity import pq_encode, pq_fit, pq_topk

    queries = emb.where(F.col("vec_id") < 10)
    C = np.round(pq_fit(emb, m=8, ksub=16, iters=4), 6)
    codes = pq_encode(emb, C)
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk(codes.coalesce(1), queries, C, k=3).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk(codes.repartition(7), queries, C, k=3).collect()
    }
    assert a == b


def test_pq_code_compression_shape(spark, emb):
    """Codes are m smallints — the 16x compression contract at
    dim=64/m=8 — and every code id addresses a real codeword."""
    import numpy as np

    from kblock_spark.ops.similarity import pq_encode, pq_fit

    C = pq_fit(emb, m=8, ksub=16, iters=2)
    assert C.shape == (8, 16, 8)
    codes = pq_encode(emb, C)
    row = codes.select(
        F.size("code").alias("m"),
        F.array_max("code").alias("mx"),
        F.array_min("code").alias("mn"),
    ).agg(
        F.max("m").alias("m_max"), F.min("m").alias("m_min"),
        F.max("mx").alias("c_max"), F.min("mn").alias("c_min"),
    ).first()
    assert row["m_max"] == row["m_min"] == 8
    assert 0 <= row["c_min"] and row["c_max"] <= 15


def test_ivfpq_recall_and_probe_candidacy(spark, emb, tmp_path):
    """IVF-PQ round trip: decent recall with exact rerank scores, and
    per-query candidacy — every returned neighbor must live in one of
    THAT query's probed lists (batch amortization must not widen a
    query's candidate pool)."""
    import numpy as np

    from kblock_spark.ops.similarity import (
        ivfpq_topk_from_index,
        kmeans_fit,
        pq_fit,
        save_ivfpq_index,
    )

    queries = emb.where(F.col("vec_id") < 30)
    C = np.round(kmeans_fit(emb, k=8, dim=64, iters=3), 6)
    B = np.round(pq_fit(emb, m=16, ksub=32, iters=4), 6)
    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(emb, C, B, path)
    out = ivfpq_topk_from_index(
        spark, path, queries, k=5, nprobe=4, rerank_mult=4, emb=emb
    ).collect()
    exact = brute_force_topk(emb, queries, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in out}
    # nprobe=4 of 8 lists: candidate coverage bounds recall
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"IVF-PQ recall {recall:.2f}"
    # rerank scores are exact
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    for r in out:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine"] == pytest.approx(exact_scores[key], abs=0)
    # per-query candidacy: recompute each query's probe set and the
    # index's list assignment; every neighbor must be inside
    rows = spark.read.parquet(f"{path}/lists").select("vec_id", "list_id").collect()
    vec_list = {r["vec_id"]: r["list_id"] for r in rows}
    qrows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
             for r in queries.collect()}
    for r in out:
        q = qrows[r["query_id"]]
        d2 = ((q[None, :] - C) ** 2).sum(axis=1)
        probes = set(np.argsort(d2)[:4].tolist())
        assert vec_list[r["neighbor_id"]] in probes, r


def test_mips_topk_exact_vs_crossjoin(spark, emb):
    """mips_topk (broadcast GEMM + local top-k) must equal the naive
    cross-join MIPS ranking exactly, including when the corpus is
    split so each partition holds fewer than k rows."""
    from kblock_spark.ops.similarity import mips_topk

    e = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint")
        ).alias("qv"),
    )
    qs = e.where(F.col("vec_id") < 10)
    got = mips_topk(e.repartition(16), qs, k=5)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    from pyspark.sql import Window

    pairs = (
        qs.select(F.col("vec_id").alias("query_id"), F.col("qv").alias("q"))
        .crossJoin(e.select(F.col("vec_id").alias("neighbor_id"), "qv"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("q"), F.col("qv")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    want = (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "dot")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_mips_topk_self_never_evicts_candidate(spark):
    """Regression: the self row must not occupy a LOCAL top-k slot.
    One partition holds the query itself plus exactly k rows that are
    ALL in the global top-k; if self eats a slot, the k-th true
    neighbor is lost. (The int64 negation overflow bug did this:
    -int64.min wraps to itself, sorting the masked self row FIRST.)"""
    from kblock_spark.ops.similarity import mips_topk

    # query 0: vector [1, 0]; corpus dots descend with id
    hot = [(0, [1000, 0])] + [(i, [900 - i, 0]) for i in range(1, 4)]  # dots 899..896
    cold = [(i, [10, 0]) for i in range(10, 16)]
    corpus = spark.createDataFrame(
        hot, "vec_id long, qv array<long>"
    ).coalesce(1).union(
        spark.createDataFrame(cold, "vec_id long, qv array<long>").coalesce(1)
    )
    qs = corpus.where(F.col("vec_id") == 0)
    out = mips_topk(corpus, qs, k=3)
    rows = {(r["rank"], r["neighbor_id"]) for r in out.collect()}
    # top-3 must be ids 1,2,3 (self id 0 excluded, no cold row promoted
    # over a hot one, no hot one lost to the self slot)
    assert rows == {(1, 1), (2, 2), (3, 3)}, rows
