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
